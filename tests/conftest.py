"""Test configuration: force an 8-device virtual CPU mesh.

Sharding/collective tests run against this fake backend (SURVEY.md §4:
the distributed-test mechanism the reference lacks).

The session's sitecustomize registers the remote 'axon' TPU platform and
overrides ``jax_platforms`` — tests must run CPU-local, so we override it
back *after* importing jax (env vars alone are not enough) and before any
backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
