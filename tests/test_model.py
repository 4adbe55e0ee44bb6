"""Model-level tests: shapes, determinism, gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mipnerf360_tpu.config import ModelConfig
from mipnerf360_tpu.core.rays import dummy_rays, rays_to_device
from mipnerf360_tpu.models import (
    init_model,
    nerf_forward,
    prop_forward,
    render_image,
    render_rays,
)


@pytest.fixture(scope="module")
def small_cfg():
    return ModelConfig(num_samples=8, hidden_proposal=16, hidden_nerf=32,
                       nerf_depth=2, compute_dtype="float32")


@pytest.fixture(scope="module")
def params(small_cfg):
    return init_model(jax.random.PRNGKey(0), small_cfg)


@pytest.fixture(scope="module")
def rays():
    return rays_to_device(dummy_rays(16))


class TestForward:
    def test_prop_shapes(self, params, small_cfg, rays):
        t, w = prop_forward(params, small_cfg, rays, jax.random.PRNGKey(1), True)
        assert t.shape == (16, 9)
        assert w.shape == (16, 8)
        assert bool(jnp.all(w >= 0)) and bool(jnp.all(jnp.sum(w, -1) <= 1 + 1e-5))

    def test_nerf_shapes(self, params, small_cfg, rays):
        t, w = prop_forward(params, small_cfg, rays, jax.random.PRNGKey(1), True)
        out = nerf_forward(params, small_cfg, rays, t, w,
                           jax.random.PRNGKey(2), True)
        assert out["rgb"].shape == (16, 3)
        assert out["distance"].shape == (16,)
        assert out["acc"].shape == (16,)
        assert out["t_vals"].shape == (16, 9)
        assert out["weights"].shape == (16, 8)
        assert out["s_vals"].shape == (16, 9)
        for v in out.values():
            assert bool(jnp.all(jnp.isfinite(v)))

    def test_deterministic_when_not_randomized(self, params, small_cfg, rays):
        o1 = render_rays(params, small_cfg, rays, jax.random.PRNGKey(1), False)
        o2 = render_rays(params, small_cfg, rays, jax.random.PRNGKey(2), False)
        np.testing.assert_allclose(o1["rgb"], o2["rgb"], atol=1e-6)

    def test_randomized_varies_with_key(self, params, small_cfg, rays):
        o1 = render_rays(params, small_cfg, rays, jax.random.PRNGKey(1), True)
        o2 = render_rays(params, small_cfg, rays, jax.random.PRNGKey(2), True)
        assert not np.allclose(np.asarray(o1["rgb"]), np.asarray(o2["rgb"]))

    def test_rgb_within_padded_range(self, params, small_cfg, rays):
        out = render_rays(params, small_cfg, rays, jax.random.PRNGKey(0), False)
        p = small_cfg.rgb_padding
        # composite of per-sample rgb in [-p, 1+p], plus background
        assert bool(jnp.all(out["rgb"] >= -p - 1e-5))
        assert bool(jnp.all(out["rgb"] <= 1 + p + 1e-5))

    def test_gradients_flow_to_all_params(self, params, small_cfg, rays):
        target = jnp.ones((16, 3)) * 0.5

        def loss(p):
            out = render_rays(p, small_cfg, rays, jax.random.PRNGKey(0), True)
            return jnp.mean((out["rgb"] - target) ** 2)

        grads = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(grads["nerf"])
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
        assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)

    def test_render_image_chunking_padding(self, params, small_cfg):
        # 100 rays with chunk 32 -> padding path
        rays = rays_to_device(dummy_rays(100))
        rgb, dist, acc = render_image(params, small_cfg, rays, chunk=32)
        assert rgb.shape == (100, 3)
        assert dist.shape == (100,)
        # chunked render must equal unchunked
        out = render_rays(params, small_cfg, rays, jax.random.PRNGKey(0), False)
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(out["rgb"]),
                                   atol=1e-5)

    def test_input_dim_is_58_for_defaults(self):
        assert ModelConfig().input_dim == 58  # reference model.py:39


class TestPadInputLanes:
    """ModelConfig.pad_input_lanes: lane-aligned first matmul, function
    preserved up to f32 reduction order — the padded dot tiles its reduction
    differently, reassociating the SAME nonzero terms (~1e-7 drift).
    (DESIGN.md §7c — measured 2.7% slower on v5e, shipped off by default as
    the recorded alignment experiment.)"""

    def test_padded_input_dim(self):
        cfg = ModelConfig(ipe_max_deg=5)  # quality encoding: 226 wide
        assert cfg.input_dim == 226 and cfg.padded_input_dim == 226
        padded = ModelConfig(ipe_max_deg=5, pad_input_lanes=True)
        assert padded.padded_input_dim == 256
        # already aligned -> unchanged
        assert ModelConfig(pad_input_lanes=True).padded_input_dim == 128

    def test_function_preserved(self):
        kw = dict(num_samples=8, hidden_proposal=16, hidden_nerf=32,
                  nerf_depth=2, compute_dtype="float32")
        cfg0 = ModelConfig(**kw)
        cfg1 = ModelConfig(**kw, pad_input_lanes=True)
        p0 = init_model(jax.random.PRNGKey(0), cfg0)
        p1 = init_model(jax.random.PRNGKey(0), cfg1)
        # pad rows are zero; real rows identical to the unpadded draw
        w0 = p0["nerf"]["trunk"]["layers"][0]["w"]
        w1 = p1["nerf"]["trunk"]["layers"][0]["w"]
        assert w1.shape[0] == cfg1.padded_input_dim
        np.testing.assert_array_equal(np.asarray(w1[: w0.shape[0]]), np.asarray(w0))
        assert float(jnp.max(jnp.abs(w1[w0.shape[0]:]))) == 0.0
        r = rays_to_device(dummy_rays(16))
        o0 = render_rays(p0, cfg0, r, jax.random.PRNGKey(1), True)
        o1 = render_rays(p1, cfg1, r, jax.random.PRNGKey(1), True)
        for k in ("rgb", "distance", "acc"):
            np.testing.assert_allclose(np.asarray(o0[k]), np.asarray(o1[k]),
                                       atol=1e-5)

    def test_pad_rows_stay_zero_after_update(self):
        from mipnerf360_tpu.config import (Config, DataConfig, MeshConfig,
                                           TrainConfig)
        from mipnerf360_tpu.train.state import init_train_state
        from mipnerf360_tpu.train.step import make_train_step

        cfg = Config(
            model=ModelConfig(num_samples=8, hidden_proposal=16,
                              hidden_nerf=32, nerf_depth=2,
                              compute_dtype="float32", pad_input_lanes=True),
            train=TrainConfig(batch_size=8, cadence="joint"),
            data=DataConfig(), mesh=MeshConfig(data=1, model=1))
        state = init_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
        step = make_train_step(cfg, None, donate=False)
        pix = jnp.full((8, 3), 0.5, jnp.float32)
        r = rays_to_device(dummy_rays(8))
        for _ in range(2):
            state, _ = step(state, r, pix)
        d = cfg.model.input_dim
        w = state.params["nerf"]["trunk"]["layers"][0]["w"]
        assert float(jnp.max(jnp.abs(w[d:]))) == 0.0
