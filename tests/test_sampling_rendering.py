"""Tests for sampling, resampling, encoding, and volume rendering."""
import jax
import jax.numpy as jnp
import numpy as np

from mipnerf360_tpu.core import (
    POS_ENC_DIM,
    blur_weights,
    integrated_pos_enc,
    resample_along_rays,
    sample_along_rays,
    sorted_piecewise_constant_pdf,
    viewdir_enc,
    volumetric_rendering,
)


class TestSampling:
    def test_deterministic_edges_hit_near_far(self):
        near = jnp.full((3, 1), 2.0)
        far = jnp.full((3, 1), 6.0)
        t = sample_along_rays(jax.random.PRNGKey(0), near, far, 16, randomized=False)
        assert t.shape == (3, 17)
        np.testing.assert_allclose(t[:, 0], 2.0, rtol=1e-4)
        np.testing.assert_allclose(t[:, -1], 6.0, rtol=1e-4)
        assert bool(jnp.all(jnp.diff(t, axis=-1) > 0))

    def test_randomized_stays_sorted_in_range(self):
        near = jnp.full((8, 1), 0.5)
        far = jnp.full((8, 1), 50.0)
        t = sample_along_rays(jax.random.PRNGKey(1), near, far, 64, randomized=True)
        assert bool(jnp.all(jnp.diff(t, axis=-1) >= 0))
        assert bool(jnp.all(t >= 0.49)) and bool(jnp.all(t <= 50.01))

    def test_disparity_spacing_concentrates_near(self):
        # in s-space sampling, more than half the samples land in the near
        # half of the metric range for an unbounded-ish far
        near = jnp.full((1, 1), 1.0)
        far = jnp.full((1, 1), 100.0)
        t = sample_along_rays(jax.random.PRNGKey(0), near, far, 64, randomized=False)
        frac_near = float(jnp.mean(t < 50.0))
        assert frac_near > 0.9


class TestInverseCDF:
    def test_uniform_weights_give_uniform_samples(self):
        bins = jnp.linspace(0.0, 1.0, 9)[None].repeat(4, 0)
        w = jnp.ones((4, 8))
        s = sorted_piecewise_constant_pdf(jax.random.PRNGKey(0), bins, w, 128,
                                          randomized=False)
        np.testing.assert_allclose(np.asarray(s[0]),
                                   np.linspace(0, 1, 128), atol=0.02)

    def test_concentrated_weights_concentrate_samples(self):
        bins = jnp.linspace(0.0, 1.0, 9)[None]
        w = jnp.zeros((1, 8)).at[0, 3].set(1.0)
        s = sorted_piecewise_constant_pdf(jax.random.PRNGKey(0), bins, w, 64,
                                          randomized=True)
        inside = jnp.mean(((s >= 3 / 8.0) & (s <= 4 / 8.0)).astype(jnp.float32))
        assert float(inside) > 0.95

    def test_zero_weights_dont_nan(self):
        bins = jnp.linspace(0.0, 1.0, 9)[None]
        w = jnp.zeros((1, 8))
        s = sorted_piecewise_constant_pdf(jax.random.PRNGKey(0), bins, w, 32,
                                          randomized=True)
        assert bool(jnp.all(jnp.isfinite(s)))

    def test_statistics_match_histogram(self):
        # inverse-CDF sampler statistics vs the source histogram (SURVEY §4)
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.uniform(0.1, 1.0, (1, 16)).astype(np.float32))
        bins = jnp.linspace(0.0, 1.0, 17)[None]
        s = sorted_piecewise_constant_pdf(jax.random.PRNGKey(3), bins, w, 4096,
                                          randomized=True)
        hist, _ = np.histogram(np.asarray(s[0]), bins=np.linspace(0, 1, 17))
        target = np.asarray(w[0] / jnp.sum(w))
        np.testing.assert_allclose(hist / 4096.0, target, atol=0.02)

    def test_u_typo_quirk_piles_samples_into_tail(self):
        """u_typo=True reproduces the reference's ``u = 2u + noise``
        (ray.py:33): the upper half of the stratified grid clamps to 1-eps,
        so with uniform weights ~half the samples land in the LAST interval;
        the correct draw puts ~1/N there."""
        n = 64
        bins = jnp.linspace(0.0, 1.0, n + 1)[None].repeat(8, 0)
        w = jnp.ones((8, n))
        typo = sorted_piecewise_constant_pdf(
            jax.random.PRNGKey(0), bins, w, n, randomized=True, u_typo=True)
        ok = sorted_piecewise_constant_pdf(
            jax.random.PRNGKey(0), bins, w, n, randomized=True, u_typo=False)
        last_edge = 1.0 - 1.0 / n
        frac_typo = float(jnp.mean((typo >= last_edge).astype(jnp.float32)))
        frac_ok = float(jnp.mean((ok >= last_edge).astype(jnp.float32)))
        assert frac_typo > 0.4, frac_typo
        assert frac_ok < 0.05, frac_ok

    def test_sorted_output(self):
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.uniform(0, 1, (16, 64)).astype(np.float32))
        bins = jnp.sort(jnp.asarray(rng.uniform(0, 10, (16, 65)).astype(np.float32)), axis=-1)
        s = sorted_piecewise_constant_pdf(jax.random.PRNGKey(4), bins, w, 65,
                                          randomized=True)
        assert bool(jnp.all(jnp.diff(s, axis=-1) >= -1e-6))


class TestResample:
    def test_blur_widens_histogram(self):
        w = jnp.zeros((1, 8)).at[0, 4].set(1.0)
        b = blur_weights(w)
        assert float(b[0, 3]) > 0 and float(b[0, 5]) > 0

    def test_resample_no_grad(self):
        t_vals = jnp.linspace(1.0, 6.0, 9)[None]
        w = jnp.ones((1, 8))

        def f(w):
            out = resample_along_rays(jax.random.PRNGKey(0), t_vals, w, False, 0.01)
            return jnp.sum(out)

        grad = jax.grad(f)(w)
        np.testing.assert_allclose(grad, 0.0, atol=1e-8)

    def test_resample_shape_matches_input_edges(self):
        # nerf level sees the same number of bin edges as the proposal level
        # (reference ray.py:147 resamples t_vals.shape[-1] points)
        t_vals = jnp.linspace(1.0, 6.0, 65)[None].repeat(2, 0)
        w = jnp.ones((2, 64))
        out = resample_along_rays(jax.random.PRNGKey(0), t_vals, w, True, 0.01)
        assert out.shape == (2, 65)


class TestEncoding:
    def test_ipe_dim_and_attenuation_monotonic(self):
        mean = jnp.array([[0.3, -0.2, 0.5]])
        small = jnp.eye(3)[None] * 1e-4
        large = jnp.eye(3)[None] * 10.0
        e_small = integrated_pos_enc(mean, small)
        e_large = integrated_pos_enc(mean, large)
        assert e_small.shape == (1, POS_ENC_DIM)
        # larger variance => stronger attenuation
        assert float(jnp.sum(e_large**2)) < float(jnp.sum(e_small**2))

    def test_ipe_zero_cov_equals_pe(self):
        mean = jnp.array([[0.3, -0.2, 0.5]])
        zero = jnp.zeros((1, 3, 3))
        np.testing.assert_allclose(
            integrated_pos_enc(mean, zero), integrated_pos_enc(mean, None),
            atol=1e-6)

    def test_viewdir_enc_dim(self):
        v = jnp.array([[0.0, 0.0, 1.0], [0.3, 0.4, 0.866]])
        e = viewdir_enc(v, 0, 4)
        assert e.shape == (2, 16)
        assert bool(jnp.all(jnp.isfinite(e)))


class TestVolumetricRendering:
    def _setup(self, density_val, B=4, N=16):
        rgb = jnp.ones((B, N, 3)) * 0.5
        density = jnp.full((B, N), density_val)
        t_vals = jnp.linspace(2.0, 6.0, N + 1)[None].repeat(B, 0)
        dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (B, 1))
        return rgb, density, t_vals, dirs

    def test_weight_conservation(self):
        rgb, density, t_vals, dirs = self._setup(5.0)
        _, _, acc, weights = volumetric_rendering(rgb, density, t_vals, dirs, False)
        np.testing.assert_allclose(jnp.sum(weights, -1), acc, rtol=1e-5)
        assert bool(jnp.all(acc <= 1.0 + 1e-5))

    def test_opaque_volume_returns_rgb(self):
        rgb, density, t_vals, dirs = self._setup(1000.0)
        comp, dist, acc, _ = volumetric_rendering(rgb, density, t_vals, dirs, False)
        np.testing.assert_allclose(comp, 0.5, atol=1e-3)
        np.testing.assert_allclose(acc, 1.0, atol=1e-3)
        # all mass at the first interval -> distance near t0
        assert bool(jnp.all(dist < 2.3))

    def test_empty_volume_white_background(self):
        rgb, density, t_vals, dirs = self._setup(0.0)
        comp, dist, acc, _ = volumetric_rendering(rgb, density, t_vals, dirs, True)
        np.testing.assert_allclose(comp, 1.0, atol=1e-5)
        np.testing.assert_allclose(acc, 0.0, atol=1e-5)
        # distance is clamped into [t0, tN] even with zero acc
        assert bool(jnp.all(dist >= t_vals[..., 0])) and bool(jnp.all(dist <= t_vals[..., -1]))

    def test_scaled_direction_scales_optical_depth(self):
        rgb, density, t_vals, dirs = self._setup(0.5)
        _, _, acc1, _ = volumetric_rendering(rgb, density, t_vals, dirs, False)
        _, _, acc2, _ = volumetric_rendering(rgb, density, t_vals, dirs * 2.0, False)
        assert float(acc2[0]) > float(acc1[0])

    def test_tiny_density_keeps_alpha_and_gradients_alive(self):
        # Regression: 1-exp(-dd) underflows to exact 0 at dd ~ 3e-8 (raw
        # density ~ -16), permanently zeroing gradients through alpha. The
        # expm1 form keeps both alive down to denormals so a collapsed model
        # can recover (core/rendering.py).
        from mipnerf360_tpu.core.rendering import compute_alpha_weights

        rgb, _, t_vals, dirs = self._setup(0.0)
        for sigma in [1e-8, 1e-20, 1e-30]:
            density = jnp.full((4, 16), sigma)
            w, _ = compute_alpha_weights(density, t_vals, dirs)
            assert float(jnp.min(w)) > 0.0, f"weights dead at sigma={sigma}"

            def acc_of(d):
                ww, _ = compute_alpha_weights(d, t_vals, dirs)
                return jnp.sum(ww)

            g = jax.grad(acc_of)(density)
            assert float(jnp.min(jnp.abs(g))) > 0.0, f"grads dead at {sigma}"

    def test_pallas_composite_matches_jnp_at_tiny_density(self):
        # The Pallas kernel's manual Taylor-branch 1-exp(-dd) (Mosaic has no
        # expm1) must agree with the jnp path in relative terms at densities
        # where the naive form underflows. Interpret mode runs on CPU.
        from mipnerf360_tpu.ops.pallas.composite import _one_minus_exp_neg

        dd = jnp.array([1e-30, 1e-12, 1e-8, 1e-4, 5e-3, 1e-2, 0.5, 5.0])
        got = _one_minus_exp_neg(dd)
        want = -jnp.expm1(-dd)
        np.testing.assert_allclose(got, want, rtol=1e-6)
