"""Unit tests for the L1 geometry core (SURVEY.md §4 test strategy)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mipnerf360_tpu.core import (
    contract,
    contract_gaussian,
    contract_jacobian,
    conical_frustum_to_gaussian,
    cylinder_to_gaussian,
    g,
    lift_gaussian,
    s_to_t,
    t_to_s,
    cast_rays,
)


class TestSpacing:
    def test_s_t_roundtrip(self):
        near = jnp.full((4, 1), 0.5)
        far = jnp.full((4, 1), 100.0)
        t = jnp.linspace(0.5, 100.0, 32)[None, :].repeat(4, 0)
        s = t_to_s(t, near, far)
        t2 = s_to_t(s, near, far)
        # g's eps regularization costs ~eps*t^2 of absolute error at t=100
        np.testing.assert_allclose(t2, t, rtol=1e-3)

    def test_s_range(self):
        near = jnp.full((1, 1), 2.0)
        far = jnp.full((1, 1), 6.0)
        assert abs(float(t_to_s(near, near, far)[0, 0])) < 1e-5
        assert abs(float(t_to_s(far, near, far)[0, 0]) - 1.0) < 1e-5

    def test_g_is_pure(self):
        x = jnp.array([2.0])
        _ = g(x)
        # the reference's g() mutates its argument (+eps per call); ours must not
        assert float(x[0]) == 2.0


class TestContract:
    def test_identity_inside_unit_ball(self):
        x = np.random.default_rng(0).uniform(-0.57, 0.57, (100, 3)).astype(np.float32)
        np.testing.assert_allclose(contract(jnp.asarray(x)), x, atol=1e-7)

    def test_norm_bounded_by_two(self):
        x = np.random.default_rng(1).normal(scale=100.0, size=(500, 3)).astype(np.float32)
        c = np.asarray(contract(jnp.asarray(x)))
        norms = np.linalg.norm(c, axis=-1)
        assert np.all(norms < 2.0)

    def test_radial_formula(self):
        x = jnp.array([[3.0, 0.0, 0.0]])
        c = contract(x)
        np.testing.assert_allclose(c, [[2.0 - 1.0 / 3.0, 0.0, 0.0]], rtol=1e-6)

    def test_continuity_at_boundary(self):
        lo = contract(jnp.array([[1.0 - 1e-4, 0.0, 0.0]]))
        hi = contract(jnp.array([[1.0 + 1e-4, 0.0, 0.0]]))
        np.testing.assert_allclose(lo, hi, atol=1e-3)

    def test_jacobian_matches_autodiff(self):
        rng = np.random.default_rng(2)
        # avoid the non-differentiable sphere boundary
        xs = np.concatenate([
            rng.uniform(-0.5, 0.5, (50, 3)),
            rng.normal(scale=5.0, size=(50, 3)) + np.array([2.0, 0, 0]),
        ]).astype(np.float32)
        xs = xs[np.abs(np.linalg.norm(xs, axis=-1) - 1.0) > 0.05]
        analytic = np.asarray(contract_jacobian(jnp.asarray(xs)))
        auto = np.asarray(jax.vmap(jax.jacfwd(lambda p: contract(p)))(jnp.asarray(xs)))
        np.testing.assert_allclose(analytic, auto, rtol=1e-4, atol=1e-5)

    def test_contract_gaussian_shrinks_far_covariance(self):
        mean = jnp.array([[50.0, 0.0, 0.0]])
        cov = jnp.eye(3)[None] * 4.0
        _, new_cov = contract_gaussian(mean, cov)
        # far-field covariance must contract strongly (radial eigval ~ 1/n^2)
        assert float(jnp.linalg.norm(new_cov)) < float(jnp.linalg.norm(cov)) * 0.1

    def test_contract_gaussian_identity_inside(self):
        mean = jnp.array([[0.1, 0.2, 0.1]])
        cov = jnp.eye(3)[None] * 0.01
        new_mean, new_cov = contract_gaussian(mean, cov)
        np.testing.assert_allclose(new_mean, mean, atol=1e-7)
        np.testing.assert_allclose(new_cov, cov, atol=1e-7)


class TestFrustumGaussians:
    def test_stable_matches_unstable_oracle(self):
        # The closed-form unstable moments (reference parameterization.py:108-113)
        # are an independent oracle for the stable path when t0, t1 are benign.
        t0 = jnp.linspace(1.0, 5.0, 16)[None]
        t1 = t0 + 0.3
        r = jnp.full((1, 1), 0.01)
        m_s, v_s, r_s = conical_frustum_to_gaussian(t0, t1, r, stable=True)
        m_u, v_u, r_u = conical_frustum_to_gaussian(t0, t1, r, stable=False)
        np.testing.assert_allclose(m_s, m_u, rtol=1e-4)
        np.testing.assert_allclose(v_s, v_u, rtol=1e-2)
        np.testing.assert_allclose(r_s, r_u, rtol=1e-4)

    def test_cylinder_moments(self):
        t0 = jnp.array([[1.0]])
        t1 = jnp.array([[3.0]])
        r = jnp.array([[0.5]])
        m, v, rv = cylinder_to_gaussian(t0, t1, r)
        assert float(m[0, 0]) == pytest.approx(2.0)
        assert float(v[0, 0]) == pytest.approx(4.0 / 12.0)
        assert float(rv[0, 0]) == pytest.approx(0.25 / 4.0)

    def test_lift_gaussian_full_vs_diag(self):
        d = jnp.array([[0.0, 0.0, 1.0]])
        t_mean = jnp.array([[2.0]])
        t_var = jnp.array([[0.1]])
        r_var = jnp.array([[0.01]])
        mean_f, cov_f = lift_gaussian(d, t_mean, t_var, r_var, diag=False)
        mean_d, cov_d = lift_gaussian(d, t_mean, t_var, r_var, diag=True)
        np.testing.assert_allclose(mean_f, mean_d, atol=1e-7)
        np.testing.assert_allclose(
            jnp.diagonal(cov_f, axis1=-2, axis2=-1), cov_d, atol=1e-7)

    def test_cast_rays_shapes_and_symmetry(self):
        B, N = 4, 8
        t_vals = jnp.linspace(1.0, 6.0, N + 1)[None].repeat(B, 0)
        origins = jnp.zeros((B, 3))
        dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (B, 1))
        radii = jnp.full((B, 1), 0.01)
        means, covs = cast_rays(t_vals, origins, dirs, radii)
        assert means.shape == (B, N, 3)
        assert covs.shape == (B, N, 3, 3)
        np.testing.assert_allclose(covs, jnp.swapaxes(covs, -1, -2), atol=1e-6)
        assert bool(jnp.all(jnp.isfinite(means))) and bool(jnp.all(jnp.isfinite(covs)))
