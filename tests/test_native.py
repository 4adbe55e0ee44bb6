"""Native C++ batcher (mipnerf360_tpu/native): build, parity with the NumPy
fallback, determinism, and dataset/trainer integration."""
import importlib

import numpy as np
import pytest

from mipnerf360_tpu import native


def test_native_builds_and_loads():
    """The image ships g++; the native path must actually be exercised."""
    assert native.native_available()


def test_indices_native_matches_numpy_fallback(monkeypatch):
    got = native.sample_indices(seed=123, start=7, total=4096, n_rays=1000)
    # Force the NumPy path by pretending the build failed.
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_build_failed", True)
    want = native.sample_indices(seed=123, start=7, total=4096, n_rays=1000)
    np.testing.assert_array_equal(got, want)
    assert got.min() >= 0 and got.max() < 1000


def test_indices_deterministic_and_stream_split():
    a = native.sample_indices(0, 0, 512, 10_000)
    b = native.sample_indices(0, 0, 512, 10_000)
    c = native.sample_indices(1, 0, 512, 10_000)
    d = native.sample_indices(0, 512, 512, 10_000)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert not np.array_equal(a, d)


def test_counter_stream_is_chunk_invariant():
    """Drawing [0, 2B) in one call == two calls of B — the property the
    trainer relies on for resume/chunking independence."""
    whole = native.sample_indices(9, 0, 256, 777)
    first = native.sample_indices(9, 0, 128, 777)
    second = native.sample_indices(9, 128, 128, 777)
    np.testing.assert_array_equal(whole, np.concatenate([first, second]))


def test_indices_roughly_uniform():
    idx = native.sample_indices(3, 0, 200_000, 100)
    counts = np.bincount(idx, minlength=100)
    assert counts.min() > 1500 and counts.max() < 2500  # 2000 expected


def test_fill_batch_stack_matches_manual_gather():
    rng = np.random.default_rng(0)
    arrays = [rng.normal(size=(500, d)).astype(np.float32) for d in (3, 3, 1)]
    outs = native.fill_batch_stack(5, 40, 64, arrays)
    idx = native.sample_indices(5, 40, 64, 500)
    for a, o in zip(arrays, outs):
        np.testing.assert_array_equal(o, a[idx])


def test_fill_batch_stack_numpy_fallback_parity(monkeypatch):
    rng = np.random.default_rng(1)
    arrays = [rng.normal(size=(300, d)).astype(np.float32) for d in (3, 1)]
    got = native.fill_batch_stack(2, 0, 128, arrays)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_build_failed", True)
    want = native.fill_batch_stack(2, 0, 128, arrays)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_dataset_batch_stack_shapes_and_determinism():
    from mipnerf360_tpu.config import DataConfig
    from mipnerf360_tpu.data import get_dataset

    ds = get_dataset(DataConfig(dataset="synthetic", synthetic_resolution=8,
                                synthetic_views=2), "train")
    rays, pix = ds.batch_stack(4, 16, seed=0, start_step=0)
    assert rays.origins.shape == (4, 16, 3)
    assert pix.shape == (4, 16, 3)
    rays2, pix2 = ds.batch_stack(4, 16, seed=0, start_step=0)
    np.testing.assert_array_equal(pix, pix2)
    # chunk-invariance across dispatch boundaries
    r_a, p_a = ds.batch_stack(2, 16, seed=0, start_step=0)
    r_b, p_b = ds.batch_stack(2, 16, seed=0, start_step=2)
    np.testing.assert_array_equal(
        np.concatenate([p_a, p_b]), pix)
    np.testing.assert_array_equal(
        np.concatenate([r_a.origins, r_b.origins]), rays.origins)


def test_batch_stack_local_shards_reassemble_global():
    """Per-process staging shards (batch_stack_local) concatenated along the
    batch axis reproduce batch_stack bit-for-bit — the invariant the
    multi-host trainer path relies on (parallel/mesh.shard_batch_stack_local)."""
    from mipnerf360_tpu.config import DataConfig
    from mipnerf360_tpu.data import get_dataset

    ds = get_dataset(DataConfig(dataset="synthetic", synthetic_resolution=8,
                                synthetic_views=2), "train")
    k, b, nproc = 3, 16, 4
    rays_g, pix_g = ds.batch_stack(k, b, seed=7, start_step=5)
    shards = [ds.batch_stack_local(k, b, 7, 5, p, nproc) for p in range(nproc)]
    pix_cat = np.concatenate([s[1] for s in shards], axis=1)
    np.testing.assert_array_equal(pix_cat, pix_g)
    for field in range(len(rays_g)):
        cat = np.concatenate([s[0][field] for s in shards], axis=1)
        np.testing.assert_array_equal(cat, rays_g[field])
