"""Data-pipeline tests: loaders against fabricated on-disk datasets,
ray generation, pose paths, synthetic scene, viz helpers."""
import json
import os

import numpy as np
import pytest

from mipnerf360_tpu.config import DataConfig
from mipnerf360_tpu.data import get_dataset
from mipnerf360_tpu.data.base import RayDataset
from mipnerf360_tpu.data.pose import (
    look_at,
    poses_avg,
    recenter_poses,
    spherical_path,
    spiral_path,
)
from mipnerf360_tpu.data.rays_gen import ndc_rays, pinhole_rays
from mipnerf360_tpu.data.synthetic import synthetic_dataset
from mipnerf360_tpu.data.viz import (
    depth_to_normals,
    to8b,
    to_float,
    visualize_depth,
    visualize_normals,
)


def _write_png(path, arr_u8):
    from PIL import Image

    Image.fromarray(arr_u8).save(path)


@pytest.fixture
def blender_dir(tmp_path):
    """Fabricate a minimal Blender-format dataset (transforms + RGBA PNGs)."""
    rng = np.random.default_rng(0)
    frames = []
    for split in ["train", "test"]:
        os.makedirs(tmp_path / split, exist_ok=True)
        frames = []
        for i in range(3):
            img = rng.integers(0, 255, (16, 16, 4), dtype=np.uint8)
            _write_png(tmp_path / split / f"r_{i}.png", img)
            c2w = np.eye(4)
            c2w[:3, 3] = [0, 0, 4 + i]
            frames.append({"file_path": f"{split}/r_{i}",
                           "transform_matrix": c2w.tolist()})
        with open(tmp_path / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.69, "frames": frames}, f)
    return str(tmp_path)


@pytest.fixture
def llff_dir(tmp_path):
    """Fabricate a minimal LLFF dataset (images_4 + poses_bounds.npy)."""
    rng = np.random.default_rng(1)
    img_dir = tmp_path / "images_4"
    os.makedirs(img_dir)
    n = 10
    for i in range(n):
        _write_png(img_dir / f"img_{i:03d}.png",
                   rng.integers(0, 255, (12, 16, 3), dtype=np.uint8))
    poses_bounds = np.zeros((n, 17), np.float64)
    for i in range(n):
        th = 0.1 * i
        c2w = look_at(np.array([np.sin(th) * 0.1, 0, 1.0]),
                      np.array([0, 1.0, 0]),
                      np.array([np.sin(th), 0.05 * i, 0.0]))
        hwf = np.array([[48.0], [64.0], [50.0]])
        # stored convention: [down, right, back] rows (inverse of loader swap)
        m = np.concatenate([c2w, hwf], 1)
        m = np.concatenate([-m[:, 1:2], m[:, 0:1], m[:, 2:]], 1)
        poses_bounds[i, :15] = m.reshape(-1)
        poses_bounds[i, 15:] = [1.0, 6.0]
    np.save(tmp_path / "poses_bounds.npy", poses_bounds)
    return str(tmp_path)


class TestBlenderLoader:
    def test_loads_and_flattens(self, blender_dir):
        cfg = DataConfig(dataset="blender", base_dir=blender_dir, factor=1)
        ds = get_dataset(cfg, "train")
        assert isinstance(ds, RayDataset)
        assert ds.n_images == 3
        assert ds.h == ds.w == 16
        assert ds.n_rays == 3 * 16 * 16
        assert ds.pixels.shape == (ds.n_rays, 3)
        assert np.all(np.isfinite(ds.rays.origins))

    def test_downsample(self, blender_dir):
        cfg = DataConfig(dataset="blender", base_dir=blender_dir, factor=2)
        ds = get_dataset(cfg, "train")
        assert ds.h == ds.w == 8

    def test_white_bkgd_compositing(self, blender_dir):
        cfg = DataConfig(dataset="blender", base_dir=blender_dir, factor=1)
        ds = get_dataset(cfg, "train")
        assert ds.pixels.min() >= 0.0 and ds.pixels.max() <= 1.0

    def test_render_split_spiral_path(self, blender_dir):
        # Reference supports split="render" on blender scenes via the base
        # class's synthesized path (dataset.py:75-89); no image files are
        # read. Default path is spiral (Blender ctor spherify=False).
        cfg = DataConfig(dataset="blender", base_dir=blender_dir,
                         n_render_poses=5, render_h=8, render_w=8)
        ds = get_dataset(cfg, "render")
        assert ds.pixels is None
        assert ds.n_images == 5
        assert ds.h == ds.w == 8
        assert ds.n_rays == 5 * 8 * 8
        assert np.all(np.isfinite(ds.rays.origins))
        dirs = ds.rays.viewdirs
        np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0,
                                   atol=1e-5)

    def test_render_split_spherical_path(self, blender_dir):
        cfg = DataConfig(dataset="blender", base_dir=blender_dir,
                         n_render_poses=6, render_spherify=True,
                         render_radius=4.0, render_h=8, render_w=8)
        ds = get_dataset(cfg, "render")
        assert ds.n_images == 6
        # camera centers lie on the configured orbit radius
        origins = ds.rays.origins.reshape(6, -1, 3)[:, 0]
        np.testing.assert_allclose(np.linalg.norm(origins, axis=-1), 4.0,
                                   rtol=1e-5)


class TestSyntheticRenderSplit:
    def test_spherical_orbit_at_scene_resolution(self):
        cfg = DataConfig(dataset="synthetic", synthetic_resolution=8,
                         synthetic_views=4, render_radius=4.0)
        ds = get_dataset(cfg, "render")
        assert ds.pixels is None
        assert ds.n_images == 4
        assert ds.h == ds.w == 8
        origins = ds.rays.origins.reshape(4, -1, 3)[:, 0]
        np.testing.assert_allclose(np.linalg.norm(origins, axis=-1), 4.0,
                                   rtol=1e-5)


class TestLLFFLoader:
    def test_train_test_split(self, llff_dir):
        cfg = DataConfig(dataset="llff", base_dir=llff_dir, factor=4,
                         near=0.0, far=1.0)
        train = get_dataset(cfg, "train")
        test = get_dataset(cfg, "test")
        # every-8th holdout: 10 images -> 2 test (idx 0, 8), 8 train
        assert test.n_images == 2
        assert train.n_images == 8
        assert train.near == 0.0 and train.far == 1.0

    def test_ndc_rays_bounded(self, llff_dir):
        cfg = DataConfig(dataset="llff", base_dir=llff_dir, factor=4,
                         near=0.0, far=1.0)
        ds = get_dataset(cfg, "train")
        # NDC origins should be bounded (projection into the unit frustum)
        assert np.all(np.abs(ds.rays.origins[:, 2]) <= 1.0 + 1e-4)
        assert np.all(np.isfinite(ds.rays.directions))

    def test_render_split_spiral(self, llff_dir):
        cfg = DataConfig(dataset="llff", base_dir=llff_dir, factor=4,
                         near=0.0, far=1.0)
        ds = get_dataset(cfg, "render")
        assert ds.pixels is None
        assert ds.n_images == 120

    def test_ndc_free_metric_bounds(self, llff_dir):
        """use_ndc=False keeps metric-space rays with near/far derived from
        poses_bounds depth bounds (BASELINE configs[2]): fixture bds [1, 6]
        rescaled by 1/(1*0.75) -> near = 0.9*4/3 = 1.2, far = 8."""
        cfg = DataConfig(dataset="llff", base_dir=llff_dir, factor=4,
                         use_ndc=False)
        ds = get_dataset(cfg, "train")
        assert ds.near == pytest.approx(1.2, rel=1e-5)
        assert ds.far == pytest.approx(8.0, rel=1e-5)
        np.testing.assert_allclose(ds.rays.near, ds.near, rtol=1e-6)
        np.testing.assert_allclose(ds.rays.far, ds.far, rtol=1e-6)
        # metric rays: origins at real camera centers (NOT projected into the
        # unit frustum), footprint radii positive/finite
        ndc = get_dataset(DataConfig(dataset="llff", base_dir=llff_dir,
                                     factor=4, near=0.0, far=1.0), "train")
        assert not np.allclose(ds.rays.origins, ndc.rays.origins)
        assert np.all(ds.rays.radii > 0) and np.all(np.isfinite(ds.rays.radii))

    def test_ndc_free_end_to_end(self, llff_dir):
        """NDC-free contract() path end-to-end: s-spacing sane at metric
        near/far, one train step, and a chunked render — all on fabricated
        poses_bounds geometry (VERDICT r3 item 2 done-criterion)."""
        import jax
        import jax.numpy as jnp

        from mipnerf360_tpu.config import (Config, MeshConfig, ModelConfig,
                                           TrainConfig)
        from mipnerf360_tpu.core.rays import rays_to_device
        from mipnerf360_tpu.core.sampling import sample_along_rays
        from mipnerf360_tpu.models.mipnerf360 import render_image
        from mipnerf360_tpu.parallel.mesh import (make_mesh, shard_batch,
                                                  shard_params)
        from mipnerf360_tpu.train import init_train_state, make_train_step

        cfg = Config(
            model=ModelConfig(num_samples=8, hidden_proposal=16,
                              hidden_nerf=32, nerf_depth=2,
                              compute_dtype="float32", ray_shape="cylinder"),
            train=TrainConfig(max_steps=2, batch_size=32, cadence="joint"),
            data=DataConfig(dataset="llff", base_dir=llff_dir, factor=4,
                            use_ndc=False),
            mesh=MeshConfig(data=1, model=1))
        ds = get_dataset(cfg.data, "train")

        # s-spacing: sampled t-edges live in [near, far], monotone per ray
        rays_np, pix_np = next(ds.batches(32, seed=0))
        t = sample_along_rays(jax.random.PRNGKey(0),
                              jnp.asarray(rays_np.near),
                              jnp.asarray(rays_np.far), 8, randomized=True)
        t = np.asarray(t)
        assert np.all(t >= ds.near - 1e-4) and np.all(t <= ds.far + 1e-4)
        assert np.all(np.diff(t, axis=-1) > 0)

        mesh = make_mesh(1, 1)
        state = init_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
        state = state._replace(params=shard_params(mesh, state.params))
        step_fn = make_train_step(cfg, mesh)
        rays, pixels = shard_batch(mesh, rays_np, pix_np)
        state, aux = step_fn(state, rays, pixels)
        assert np.isfinite(float(jax.device_get(aux["loss"])))

        rgb, dist, acc = render_image(
            state.params, cfg.model, rays_to_device(rays_np), chunk=32)
        rgb, dist = np.asarray(rgb), np.asarray(dist)
        assert np.all(np.isfinite(rgb)) and np.all(np.isfinite(dist))
        # rendered distance respects the metric bounds (renderer clamps to
        # [t0, far])
        assert np.all(dist >= ds.near - 1e-3) and np.all(dist <= ds.far + 1e-3)

    def test_nerf360_render_split_spherified(self, llff_dir):
        cfg = DataConfig(dataset="nerf_360", base_dir=llff_dir, factor=4,
                         near=0.0, far=1.0)
        ds = get_dataset(cfg, "render")
        assert ds.pixels is None
        assert ds.n_images == 120


class TestRayGen:
    def test_pinhole_directions_through_pixels(self):
        c2w = np.eye(4)[None, :3, :4].astype(np.float32)
        rays = pinhole_rays(c2w, 8, 8, 10.0, 2.0, 6.0)
        assert rays.origins.shape == (1, 8, 8, 3)
        # center pixels look along -z in camera frame
        assert rays.directions[0, 4, 4, 2] < 0
        # viewdirs unit norm
        n = np.linalg.norm(rays.viewdirs, axis=-1)
        np.testing.assert_allclose(n, 1.0, atol=1e-5)
        assert np.all(rays.radii > 0)

    def test_batches_iterator(self):
        ds = synthetic_dataset(DataConfig(synthetic_resolution=8,
                                          synthetic_views=2))
        it = ds.batches(32, seed=0)
        rays, pix = next(it)
        assert rays.origins.shape == (32, 3)
        assert pix.shape == (32, 3)
        rays2, _ = next(it)
        assert not np.array_equal(rays.origins, rays2.origins)

    def test_image_accessor(self):
        ds = synthetic_dataset(DataConfig(synthetic_resolution=8,
                                          synthetic_views=2))
        rays, pix = ds.image(1)
        assert rays.origins.shape == (64, 3)
        assert pix.shape == (64, 3)


class TestPosePaths:
    def test_spiral_path_shape(self):
        p = spiral_path(np.array([1.0, 1.0, 1.0]), 5.0, 30)
        assert p.shape == (30, 3, 4)
        # rotations orthonormal
        r = p[:, :3, :3]
        rtr = np.einsum("nij,nkj->nik", r, r)
        np.testing.assert_allclose(
            rtr, np.broadcast_to(np.eye(3), rtr.shape), atol=1e-5)

    def test_spherical_path_radius(self):
        p = spherical_path(4.0, 20)
        d = np.linalg.norm(p[:, :3, 3], axis=-1)
        np.testing.assert_allclose(d, 4.0, rtol=1e-5)

    def test_recenter_poses_centers(self):
        rng = np.random.default_rng(0)
        poses = np.zeros((5, 3, 5), np.float32)
        for i in range(5):
            poses[i, :, :4] = look_at(
                rng.normal(size=3), np.array([0, 1.0, 0]), rng.normal(size=3))
            poses[i, :, 4] = [10, 10, 5]
        rec = recenter_poses(poses)
        avg = poses_avg(rec)
        np.testing.assert_allclose(avg[:3, 3], 0.0, atol=1e-5)
        np.testing.assert_allclose(avg[:3, :3], np.eye(3), atol=1e-4)


class TestViz:
    def test_to8b_roundtrip(self):
        x = np.array([[0.0, 0.5], [1.0, 2.0]])
        u8 = to8b(x)
        assert u8.dtype == np.uint8
        assert u8[1, 1] == 255  # clipped
        np.testing.assert_allclose(to_float(u8)[0, 1], 0.5, atol=0.01)

    def test_depth_to_normals_flat_plane(self):
        n = depth_to_normals(np.ones((8, 8)))
        np.testing.assert_allclose(n[2:-2, 2:-2, 2], 1.0, atol=1e-6)

    def test_visualize_depth_shapes(self):
        depth = np.linspace(1, 5, 64).reshape(8, 8)
        acc = np.ones((8, 8))
        vis = visualize_depth(depth, acc, near=1.0, far=5.0)
        assert vis.shape == (8, 8, 3)
        assert vis.min() >= 0.0 and vis.max() <= 1.0

    def test_visualize_normals_shapes(self):
        depth = np.linspace(1, 5, 64).reshape(8, 8)
        vis = visualize_normals(depth, np.ones((8, 8)))
        assert vis.shape == (8, 8, 3)


class TestLLFFExportStandIn:
    """tools/parity_psnr.export_llff_scene -> data/llff loader roundtrip.

    The exported procedural scene is the stand-in for the llff_fern_quality
    and bicycle_multihost_quality live validations (PRESET_VALIDATION_r5);
    a pose-convention error in the export (reference dataset.py:212-241
    defines the on-disk [down, right, back] columns) would silently train on
    inconsistent geometry, so assert consistency after the loader's
    axis-swap/rescale/recenter."""

    def test_center_rays_converge_on_scene_center(self, tmp_path):
        import os
        import sys

        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools"))
        from parity_psnr import export_llff_scene

        out = export_llff_scene(str(tmp_path / "scene"), res=32, n_views=16)
        cfg = DataConfig(dataset="nerf_360", base_dir=out, factor=1,
                         use_ndc=False)
        ds = get_dataset(cfg, "train")
        assert ds.h == ds.w == 32
        assert ds.n_images == 14  # every-8th of 16 held out
        test_ds = get_dataset(cfg, "test")
        assert test_ds.n_images == 2
        # Every camera looks AT the sphere, so per-view center-pixel rays
        # must (nearly) intersect at one common point — the recentered,
        # rescaled sphere center. Solve the least-squares intersection and
        # bound each ray's distance to it; axis/sign errors in the export
        # convention scatter the rays and blow this up by orders of
        # magnitude.
        per = ds.h * ds.w
        ctr = (ds.h // 2) * ds.w + ds.w // 2
        o = ds.rays.origins[ctr::per]
        d = ds.rays.viewdirs[ctr::per]
        A = np.zeros((3, 3))
        b = np.zeros(3)
        for oi, di in zip(o, d):
            P = np.eye(3) - np.outer(di, di)
            A += P
            b += P @ oi
        p = np.linalg.solve(A, b)
        miss = [float(np.linalg.norm((np.eye(3) - np.outer(di, di)) @ (p - oi)))
                for oi, di in zip(o, d)]
        cam_dist = np.linalg.norm(o - np.asarray(p), axis=-1)
        assert max(miss) < 0.05 * float(cam_dist.min()), (max(miss), cam_dist)
        # metric bounds bracket the scene: the convergence point's depth lies
        # strictly inside [near, far] on every center ray
        depth = np.einsum("ij,ij->i", np.asarray(p) - o, d)
        assert np.all(depth > ds.near) and np.all(depth < ds.far)


class TestLazyRenderSplit:
    def test_lazy_image_matches_materialized_slice(self):
        """LazyRenderDataset.image(i) must equal rows [i*H*W, (i+1)*H*W) of
        the materialized .rays — lazy generation changes memory behavior,
        not values (the video renderer consumes image(); tests consume
        .rays)."""
        cfg = DataConfig(dataset="synthetic", synthetic_resolution=8,
                         synthetic_views=3, render_radius=4.0)
        ds = get_dataset(cfg, "render")
        full = ds.rays
        per = ds.h * ds.w
        assert ds.n_rays == 3 * per
        for i in range(ds.n_images):
            rays_i, pix = ds.image(i)
            assert pix is None
            for a, b in zip(list(rays_i), list(full)):
                np.testing.assert_array_equal(a, b[i * per:(i + 1) * per])


class TestVisualizeAlias:
    def test_blender_visualize_alias(self, blender_dir):
        """Reference split alias: test.py renders split="visualize"
        (dataset.py:22-24); blender maps it onto the test split."""
        cfg = DataConfig(dataset="blender", base_dir=blender_dir, factor=1)
        viz = get_dataset(cfg, "visualize")
        test = get_dataset(cfg, "test")
        assert viz.n_images == test.n_images
        np.testing.assert_array_equal(viz.pixels, test.pixels)


class TestBackgroundRegime:
    """get_dataset plumbs the MODEL's background regime into the loaders
    (r5 review: the reference couples dataset and model compositing through
    one white_bkgd flag; dropping the coupling silently trained white
    targets against black empty space — the degenerate regime
    data/synthetic.py documents)."""

    def test_synthetic_background_follows_model_regime(self):
        cfg = DataConfig(dataset="synthetic", synthetic_resolution=16,
                         synthetic_views=4)
        white = get_dataset(cfg, "train")  # historical default stays white
        black = get_dataset(cfg, "train", white_bkgd=False)
        diff = ~np.isclose(white.pixels, black.pixels).all(-1)
        assert diff.any()  # background pixels exist
        # Exactly the background flips 1 -> 0; sphere pixels are identical.
        np.testing.assert_allclose(white.pixels[diff], 1.0)
        np.testing.assert_allclose(black.pixels[diff], 0.0)

    def test_blender_compositing_follows_model_regime(self, blender_dir):
        cfg = DataConfig(dataset="blender", base_dir=blender_dir, factor=1)
        white = get_dataset(cfg, "train", white_bkgd=True)
        raw = get_dataset(cfg, "train", white_bkgd=False)
        # RGBA fixture with partial alpha: compositing must change pixels.
        assert not np.allclose(white.pixels, raw.pixels)


class TestSpherifyFrames:
    def test_spherified_orbit_frame_per_regime(self, llff_dir):
        """NDC parity keeps the reference's reset-frame orbit (cameras on a
        UNIT sphere in a rotated/rescaled frame — dataset.py:285-335); the
        NDC-free metric regime maps the orbit back into the frame the model
        trains in, with near/far still the metric bds (r5 review finding)."""
        kw = dict(dataset="nerf_360", base_dir=llff_dir, factor=4,
                  n_render_poses=12)
        parity = get_dataset(
            DataConfig(**kw, use_ndc=True, near=0.0, far=1.0), "render")
        norms = np.linalg.norm(parity.poses[:, :3, 3], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)

        world = get_dataset(DataConfig(**kw, use_ndc=False), "render")
        train = get_dataset(DataConfig(dataset="nerf_360", base_dir=llff_dir,
                                       factor=4, use_ndc=False), "train")
        # Frames differ: the world-frame orbit is NOT the unit sphere.
        wnorms = np.linalg.norm(world.poses[:, :3, 3], axis=-1)
        assert not np.allclose(wnorms, 1.0, atol=1e-4)
        # The orbit lives in the training frame's neighborhood...
        n_img, per = train.n_images, train.h * train.w
        cam = train.rays.origins.reshape(n_img, per, 3)[:, 0]
        scale = np.linalg.norm(cam - cam.mean(0), axis=-1).mean() + 1e-6
        d = np.linalg.norm(world.poses[:, :3, 3] - cam.mean(0), axis=-1)
        assert np.all(np.isfinite(d)) and d.max() < 50 * scale
        # ...and its ray bounds are the same metric bds the train split uses.
        assert world.near == train.near and world.far == train.far
