"""Shared CLI plumbing for the apps.

Replaces the reference's monolithic argparse config (config.py:6-85) with
preset selection + typed dotted overrides, e.g.:

    python -m mipnerf360_tpu.apps.train --preset garden \
        --set train.batch_size=4096 --set model.num_samples=64
"""
from __future__ import annotations

import argparse
import dataclasses

from ..config import Config, PRESETS, get_config


def add_config_args(ap: argparse.ArgumentParser):
    ap.add_argument("--preset", default="",
                    choices=[""] + sorted(PRESETS.keys()))
    ap.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="dotted config override, e.g. train.batch_size=1024")


def _coerce(current, raw: str):
    t = type(current)
    if t is bool:
        return raw.lower() in ("1", "true", "yes")
    return t(raw) if current is not None else raw


def config_from_args(args) -> Config:
    cfg = get_config(args.preset)
    groups = {}
    for kv in args.set:
        key, _, raw = kv.partition("=")
        group_name, _, field_name = key.partition(".")
        group = getattr(cfg, group_name)
        current = getattr(group, field_name)
        groups.setdefault(group_name, {})[field_name] = _coerce(current, raw)
    for name, overrides in groups.items():
        updated = dataclasses.replace(getattr(cfg, name), **overrides)
        cfg = dataclasses.replace(cfg, **{name: updated})
    return cfg
