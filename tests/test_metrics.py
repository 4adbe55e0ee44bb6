"""PSNR/SSIM metrics (utils/metrics.py) against independent oracles."""
import numpy as np
import pytest

from mipnerf360_tpu.utils.metrics import _filter2, _gaussian_kernel, psnr, ssim


def naive_ssim(x, y, max_val=1.0, size=11, sigma=1.5, k1=0.01, k2=0.03):
    """Direct dense-window implementation (O(HWk^2)) as the oracle."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    if x.ndim == 2:
        x, y = x[..., None], y[..., None]
    k1d = _gaussian_kernel(size, sigma)
    win = np.outer(k1d, k1d)
    H, W, C = x.shape
    vals = []
    c1, c2 = (k1 * max_val) ** 2, (k2 * max_val) ** 2
    for i in range(H - size + 1):
        for j in range(W - size + 1):
            for c in range(C):
                px = x[i:i + size, j:j + size, c]
                py = y[i:i + size, j:j + size, c]
                mx, my = np.sum(win * px), np.sum(win * py)
                vx = np.sum(win * px * px) - mx**2
                vy = np.sum(win * py * py) - my**2
                vxy = np.sum(win * px * py) - mx * my
                vals.append(((2 * mx * my + c1) * (2 * vxy + c2))
                            / ((mx**2 + my**2 + c1) * (vx + vy + c2)))
    return float(np.mean(vals))


def test_psnr_known_value():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(psnr(a, b), -10 * np.log10(0.01), rtol=1e-6)


def test_ssim_identity_is_one():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (16, 16, 3))
    assert ssim(img, img) == pytest.approx(1.0, abs=1e-9)


def test_ssim_degrades_with_noise():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (24, 24, 3))
    light = np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1)
    heavy = np.clip(img + rng.normal(0, 0.3, img.shape), 0, 1)
    s_light, s_heavy = ssim(light, img), ssim(heavy, img)
    assert 1.0 > s_light > s_heavy > 0.0


def test_ssim_matches_naive_oracle():
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (14, 15))
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1)
    np.testing.assert_allclose(ssim(x, y), naive_ssim(x, y), atol=1e-10)


def test_separable_filter_matches_outer_product():
    rng = np.random.default_rng(3)
    img = rng.normal(size=(13, 17, 2))
    k = _gaussian_kernel(5, 1.0)
    got = _filter2(img, k)
    win = np.outer(k, k)
    want = np.zeros((9, 13, 2))
    for i in range(9):
        for j in range(13):
            want[i, j] = np.tensordot(win, img[i:i + 5, j:j + 5], axes=2)
    np.testing.assert_allclose(got, want, atol=1e-12)


class TestLPIPS:
    """LPIPS forward machinery (utils/lpips.py) with random_weights — real
    scores need the pretrained npz (tools/export_lpips_weights.py), absent
    in this egress-free environment by design."""

    @pytest.fixture(scope="class")
    def weights(self):
        import jax

        from mipnerf360_tpu.utils.lpips import random_weights

        return random_weights(jax.random.PRNGKey(0))

    def test_identity_is_zero(self, weights):
        from mipnerf360_tpu.utils.lpips import lpips

        rng = np.random.default_rng(0)
        x = rng.random((32, 32, 3), np.float32)
        assert float(lpips(x, x, weights)) < 1e-6

    def test_symmetric_and_positive(self, weights):
        from mipnerf360_tpu.utils.lpips import lpips

        rng = np.random.default_rng(1)
        x = rng.random((32, 32, 3), np.float32)
        y = rng.random((32, 32, 3), np.float32)
        dxy = float(lpips(x, y, weights))
        dyx = float(lpips(y, x, weights))
        assert dxy > 0
        np.testing.assert_allclose(dxy, dyx, rtol=1e-5)

    def test_noise_monotone(self, weights):
        from mipnerf360_tpu.utils.lpips import lpips

        rng = np.random.default_rng(2)
        x = rng.random((32, 32, 3), np.float32)
        n = rng.normal(size=x.shape).astype(np.float32)
        d_small = float(lpips(x, np.clip(x + 0.05 * n, 0, 1), weights))
        d_large = float(lpips(x, np.clip(x + 0.3 * n, 0, 1), weights))
        assert d_large > d_small

    def test_vgg_tap_shapes(self, weights):
        import jax.numpy as jnp

        from mipnerf360_tpu.utils.lpips import vgg16_features

        taps = vgg16_features(jnp.zeros((1, 64, 64, 3)), weights)
        shapes = [t.shape for t in taps]
        assert shapes == [(1, 64, 64, 64), (1, 32, 32, 128),
                          (1, 16, 16, 256), (1, 8, 8, 512), (1, 4, 4, 512)]

    def test_npz_roundtrip(self, weights, tmp_path):
        import numpy as onp

        from mipnerf360_tpu.utils.lpips import load_weights, lpips

        path = tmp_path / "w.npz"
        onp.savez(path, **{k: onp.asarray(v) for k, v in weights.items()})
        loaded = load_weights(str(path))
        rng = np.random.default_rng(3)
        x = rng.random((16, 16, 3), np.float32)
        y = rng.random((16, 16, 3), np.float32)
        np.testing.assert_allclose(float(lpips(x, y, weights)),
                                   float(lpips(x, y, loaded)), rtol=1e-6)
