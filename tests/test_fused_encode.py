"""factored_ipe must match the general cast_rays + integrated_pos_enc path
(values AND gradients) for both ray shapes, inside and outside the unit ball."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mipnerf360_tpu.core.encoding import integrated_pos_enc
from mipnerf360_tpu.core.fused_encode import factored_ipe
from mipnerf360_tpu.core.gaussians import cast_rays


def make_inputs(seed=0, B=32, N=16, spread=8.0):
    """Rays whose sample points straddle the unit ball (origins near 0,
    t up to `spread`), plus strictly-inside and far-outside regimes."""
    rng = np.random.default_rng(seed)
    origins = rng.normal(0, 0.1, (B, 3)).astype(np.float32)
    directions = rng.normal(size=(B, 3)).astype(np.float32)
    radii = rng.uniform(0.001, 0.05, (B, 1)).astype(np.float32)
    t = np.sort(rng.uniform(0.05, spread, (B, N + 1)), axis=-1).astype(np.float32)
    return (jnp.asarray(t), jnp.asarray(origins), jnp.asarray(directions),
            jnp.asarray(radii))


def reference_path(t_vals, origins, directions, radii, ray_shape):
    means, covs = cast_rays(t_vals, origins, directions, radii, ray_shape)
    return integrated_pos_enc(means, covs)


@pytest.mark.parametrize("ray_shape", ["cone", "cylinder"])
@pytest.mark.parametrize("spread", [0.5, 8.0, 200.0])
def test_values_match_general_path(ray_shape, spread):
    args = make_inputs(spread=spread)
    want = reference_path(*args, ray_shape)
    got = factored_ipe(*args, ray_shape=ray_shape)
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("ray_shape", ["cone", "cylinder"])
def test_gradients_match_general_path(ray_shape):
    t_vals, origins, directions, radii = make_inputs(seed=3)

    def loss_general(tv, o, d):
        return jnp.sum(jnp.cos(reference_path(tv, o, d, radii, ray_shape)))

    def loss_factored(tv, o, d):
        return jnp.sum(jnp.cos(factored_ipe(tv, o, d, radii,
                                            ray_shape=ray_shape)))

    g1 = jax.grad(loss_general, argnums=(0, 1, 2))(t_vals, origins, directions)
    g2 = jax.grad(loss_factored, argnums=(0, 1, 2))(t_vals, origins, directions)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(b, a, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("ray_shape", ["cone", "cylinder"])
def test_gradient_finite_when_sample_mean_hits_origin(ray_shape):
    """A ray through the contraction center (mu = 0 for one sample) must not
    produce NaN gradients: the outside-branch division feeding jnp.where has
    to use the eps-clamped norm or its inf poisons the backward pass."""
    t = jnp.array([[1.9, 2.1]])          # cylinder t_mean = exactly 2.0
    o = jnp.array([[-2.0, 0.0, 0.0]])    # => mean = o + 2.0*d = origin
    d = jnp.array([[1.0, 0.0, 0.0]])
    r = jnp.array([[0.01]])

    def loss(o):
        return jnp.sum(factored_ipe(t, o, d, r, ray_shape=ray_shape))

    g = jax.grad(loss)(o)
    assert bool(jnp.all(jnp.isfinite(g))), g


def test_rejects_unknown_ray_shape():
    args = make_inputs()
    with pytest.raises(ValueError):
        factored_ipe(*args, ray_shape="prism")


def test_jittable_and_batched():
    args = make_inputs(B=8, N=4)
    out = jax.jit(factored_ipe)(*args)
    assert out.shape == (8, 4, 42)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.parametrize("ray_shape", ["cone", "cylinder"])
@pytest.mark.parametrize("degs", [(0, 3), (1, 5)])
def test_multiscale_matches_general_path(ray_shape, degs):
    """Multi-scale IPE (2^i frequency scaling of the P basis — the paper's
    encoding the reference dropped, README.md:7): factored == general, and
    the per-scale blocks obey phase 2^i*gamma / attenuation 4^i*sigma."""
    lo, hi = degs
    args = make_inputs(seed=5)
    means, covs = cast_rays(*args, ray_shape)
    want = integrated_pos_enc(means, covs, lo, hi)
    got = factored_ipe(*args, ray_shape=ray_shape, min_deg=lo, max_deg=hi)
    assert got.shape[-1] == 42 * (hi - lo)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_single_scale_is_default():
    """max_deg=1 (the parity default) must equal the scale-free encoding."""
    args = make_inputs(seed=6)
    base = factored_ipe(*args, ray_shape="cone")
    explicit = factored_ipe(*args, ray_shape="cone", min_deg=0, max_deg=1)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(explicit))
