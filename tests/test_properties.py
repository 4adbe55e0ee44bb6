"""Property-based tests (hypothesis) over the core math invariants.

These complement the fixed-seed oracle tests: hypothesis explores the input
space (degenerate intervals, extreme norms, near-zero weights) where
hand-picked cases miss regressions. CPU, small shapes, bounded examples.
"""
import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st
from hypothesis.extra import numpy as hnp

from mipnerf360_tpu.core.contract import contract, contract_gaussian, contract_jacobian
from mipnerf360_tpu.core.rendering import compute_alpha_weights
from mipnerf360_tpu.core.sampling import sorted_piecewise_constant_pdf
from mipnerf360_tpu.core.spacing import s_to_t, t_to_s
from mipnerf360_tpu.losses.distortion import (distortion_loss,
                                              distortion_loss_quadratic)

_SET = settings(max_examples=25, deadline=None)

finite_f = st.floats(min_value=-50.0, max_value=50.0, allow_nan=False,
                     width=32)


@_SET
@given(hnp.arrays(np.float32, (4, 3), elements=finite_f))
def test_contract_norm_bounded_and_fixed_inside(x):
    y = np.asarray(contract(jnp.asarray(x)))
    norms = np.linalg.norm(x, axis=-1)
    out_norms = np.linalg.norm(y, axis=-1)
    assert np.all(out_norms <= 2.0 + 1e-4)
    inside = norms <= 1.0
    np.testing.assert_allclose(y[inside], x[inside], rtol=1e-6)


@_SET
@given(hnp.arrays(np.float32, (3, 3),
                  elements=st.floats(min_value=-8, max_value=8, width=32)))
def test_contract_jacobian_matches_autodiff(x):
    # keep away from the unit-sphere kink where the derivative jumps
    n = np.linalg.norm(x, axis=-1)
    x = np.where((np.abs(n - 1.0) < 0.05)[..., None], x * 1.2 + 0.1, x)
    xj = jnp.asarray(x)
    want = jax.vmap(jax.jacfwd(contract))(xj)
    got = contract_jacobian(xj)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


@_SET
@given(st.floats(min_value=0.0625, max_value=10, width=32),
       st.floats(min_value=0.125, max_value=100, width=32),
       hnp.arrays(np.float32, (5,),
                  elements=st.floats(min_value=0, max_value=1, width=32)))
def test_s_t_roundtrip(near, span, s):
    near_a = np.full((1, 1), near, np.float32)
    far_a = np.full((1, 1), near + span, np.float32)
    t = s_to_t(jnp.asarray(s)[None], near_a, far_a)
    s2 = t_to_s(t, near_a, far_a)
    # Both transforms are written in cancellation-free form (differences of
    # original magnitudes, never of reciprocals), so the round trip holds to
    # a few ulp of the interval even when span << near.
    np.testing.assert_allclose(np.asarray(s2)[0], s, atol=1e-5)


def test_s_t_roundtrip_narrow_interval_regression():
    # Round-1 hypothesis counterexample: near=8.0, far=8.125, s=0. The old
    # g(g(near)) form applied eps twice and the g(far)-g(near) denominator
    # cancelled catastrophically, giving |s2| ~ 6e-5 and t < near.
    near = np.full((1, 1), 8.0, np.float32)
    far = np.full((1, 1), 8.125, np.float32)
    s = jnp.asarray([0.0, 0.5, 1.0], np.float32)[None]
    t = s_to_t(s, near, far)
    np.testing.assert_allclose(np.asarray(t)[0, 0], 8.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t)[0, 2], 8.125, atol=1e-5)
    s2 = t_to_s(t, near, far)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s), atol=1e-5)


@_SET
@given(hnp.arrays(np.float32, (2, 6),
                  elements=st.floats(min_value=0, max_value=5, width=32)),
       st.integers(min_value=0, max_value=2**31 - 1),
       st.booleans())
def test_inverse_cdf_sorted_and_in_range(w, seed, randomized):
    bins = jnp.asarray(np.linspace(1.0, 3.0, 7, dtype=np.float32))
    bins = jnp.broadcast_to(bins, (2, 7))
    out = np.asarray(sorted_piecewise_constant_pdf(
        jax.random.PRNGKey(seed), bins, jnp.asarray(w), 8, randomized))
    assert np.all(np.diff(out, axis=-1) >= -1e-6)
    assert np.all(out >= 1.0 - 1e-6) and np.all(out <= 3.0 + 1e-6)


@_SET
@given(hnp.arrays(np.float32, (3, 5),
                  elements=st.floats(min_value=0, max_value=20, width=32)),
       hnp.arrays(np.float32, (3, 3),
                  elements=st.floats(min_value=-2, max_value=2, width=32)))
def test_weights_conserve_and_bounded(density, dirs):
    t = jnp.broadcast_to(jnp.linspace(0.5, 4.0, 6), (3, 6))
    w, trans = compute_alpha_weights(jnp.asarray(density), t, jnp.asarray(dirs))
    w = np.asarray(w)
    assert np.all(w >= -1e-6)
    assert np.all(np.sum(w, axis=-1) <= 1.0 + 1e-5)


@_SET
@given(hnp.arrays(np.float32, (2, 7),
                  elements=st.floats(min_value=0, max_value=1, width=32)))
def test_distortion_linear_equals_quadratic(w):
    s = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 8), (2, 8))
    a = float(distortion_loss(s, jnp.asarray(w)))
    b = float(distortion_loss_quadratic(s, jnp.asarray(w)))
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


@_SET
@given(hnp.arrays(np.float32, (4, 3),
                  elements=st.floats(min_value=-10, max_value=10, width=32)))
def test_contracted_covariance_stays_psd_diag(mean):
    """Diagonal of J Sigma J^T must stay non-negative for PSD Sigma."""
    cov = jnp.broadcast_to(0.1 * jnp.eye(3), (4, 3, 3))
    _, new_cov = contract_gaussian(jnp.asarray(mean), cov)
    diag = np.asarray(jnp.diagonal(new_cov, axis1=-2, axis2=-1))
    assert np.all(diag >= -1e-6)
