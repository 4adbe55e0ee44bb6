"""Tests for the loss layer: distortion, distillation, photometric."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mipnerf360_tpu.losses import (
    distillation_loss,
    distortion_loss,
    distortion_loss_quadratic,
    mse_to_psnr,
    photometric_loss,
    proposal_loss,
    weight_bounds,
)


def _naive_distortion(s_vals, weights):
    """Direct transcription of the reference's O(N^2) loop
    (regularization.py:13-17) as a NumPy oracle."""
    s = np.asarray(s_vals)
    w = np.asarray(weights)
    mids = (s[..., :-1] + s[..., 1:]) / 2
    total = 0.0
    n = w.shape[-1]
    for i in range(n):
        for j in range(n):
            total += np.sum(w[..., i] * w[..., j] * np.abs(mids[..., i] - mids[..., j]))
    total += np.sum(w**2 * (s[..., 1:] - s[..., :-1])) / 3
    return total


class TestDistortion:
    def test_matches_naive_oracle(self):
        rng = np.random.default_rng(0)
        s = np.sort(rng.uniform(0, 1, (8, 17)).astype(np.float32), axis=-1)
        w = rng.uniform(0, 0.2, (8, 16)).astype(np.float32)
        fast = float(distortion_loss(jnp.asarray(s), jnp.asarray(w)))
        quad = float(distortion_loss_quadratic(jnp.asarray(s), jnp.asarray(w)))
        naive = _naive_distortion(s, w)
        np.testing.assert_allclose(fast, naive, rtol=1e-4)
        np.testing.assert_allclose(quad, naive, rtol=1e-4)

    def test_concentrated_weights_minimize(self):
        s = jnp.linspace(0, 1, 17)[None]
        w_spread = jnp.ones((1, 16)) / 16
        w_tight = jnp.zeros((1, 16)).at[0, 8].set(1.0)
        assert float(distortion_loss(s, w_tight)) < float(distortion_loss(s, w_spread))

    def test_gradient_flows(self):
        s = jnp.linspace(0, 1, 17)[None]
        w = jnp.ones((1, 16)) / 16
        g = jax.grad(lambda w: distortion_loss(s, w))(w)
        assert bool(jnp.any(g != 0)) and bool(jnp.all(jnp.isfinite(g)))

    def test_unknown_reduction_rejected(self):
        # A typo'd train.dist_loss_reduction must fail loudly, not silently
        # fall back to "sum" (batch-size-scaled, 4096x stronger per ray).
        s = jnp.linspace(0, 1, 17)[None]
        w = jnp.ones((1, 16)) / 16
        with pytest.raises(ValueError, match="mean.*sum"):
            distortion_loss(s, w, reduction="Mean")


def _naive_bounds(t_fine, w_fine, t_coarse):
    """Per-ray brute-force overlap oracle (the *corrected* semantics of
    reference distillation.py:4-33 — per ray, not batch-collapsed)."""
    t0 = t_fine[..., :-1]
    t1 = t_fine[..., 1:]
    B = np.zeros_like(w_fine)
    for b in range(w_fine.shape[0]):
        for i in range(w_fine.shape[-1]):
            L, R = t_coarse[b, i], t_coarse[b, i + 1]
            mask = ~((t0[b] > R) | (t1[b] < L))
            B[b, i] = np.sum(w_fine[b][mask])
    return B


class TestDistillation:
    def test_bounds_match_bruteforce(self):
        rng = np.random.default_rng(1)
        B, N = 6, 16
        t_f = np.sort(rng.uniform(1, 6, (B, N + 1)).astype(np.float32), axis=-1)
        t_c = np.sort(rng.uniform(1, 6, (B, N + 1)).astype(np.float32), axis=-1)
        w_f = rng.uniform(0, 0.2, (B, N)).astype(np.float32)
        ours = np.asarray(weight_bounds(jnp.asarray(t_f), jnp.asarray(w_f), jnp.asarray(t_c)))
        oracle = _naive_bounds(t_f, w_f, t_c)
        np.testing.assert_allclose(ours, oracle, rtol=1e-5)

    def test_banded_matches_einsum_oracle(self):
        """The banded prefix-sum form vs the O(Nc*Nf) overlap-mask einsum,
        on asymmetric grids (Nc != Nf) including exact touching edges."""
        from mipnerf360_tpu.losses.distillation import (weight_bounds_banded,
                                                        weight_bounds_einsum)

        rng = np.random.default_rng(7)
        B, Nc, Nf = 5, 12, 20
        t_f = np.sort(rng.uniform(1, 6, (B, Nf + 1)).astype(np.float32), -1)
        t_c = np.sort(rng.uniform(1, 6, (B, Nc + 1)).astype(np.float32), -1)
        # force touching edges: coarse edge exactly equals a fine edge
        t_c[:, 3] = t_f[:, 5]
        t_c = np.sort(t_c, -1)
        w_f = rng.uniform(0, 0.2, (B, Nf)).astype(np.float32)
        banded = np.asarray(jax.jit(weight_bounds_banded)(
            jnp.asarray(t_f), jnp.asarray(w_f), jnp.asarray(t_c)))
        oracle = np.asarray(weight_bounds_einsum(
            jnp.asarray(t_f), jnp.asarray(w_f), jnp.asarray(t_c)))
        np.testing.assert_allclose(banded, oracle, rtol=1e-5, atol=1e-6)

    def test_weight_bounds_dispatch(self):
        """The production wrapper uses the MXU einsum while the [.., Nc, Nf]
        overlap transient fits the HBM byte budget — batch dims INCLUDED
        (advisor r3: a per-ray-pair threshold let a ~4 GiB transient through
        at B=4096, Nc=Nf=512) — and the banded form above it."""
        from mipnerf360_tpu.losses import distillation as d

        calls = []
        orig_e, orig_b = d.weight_bounds_einsum, d.weight_bounds_banded
        d.weight_bounds_einsum = lambda *a: calls.append("einsum")
        d.weight_bounds_banded = lambda *a: calls.append("banded")
        try:
            def dispatch(batch, n):
                t = jnp.linspace(1, 6, n + 1)[None].repeat(batch, 0)
                w = jnp.ones((batch, n), jnp.float32) * 0.01
                d.weight_bounds(t, w, t)

            dispatch(4096, 64)    # flagship: 64 MiB transient -> einsum
            dispatch(1, 1024)     # big-N, tiny batch: 4 MiB -> still einsum
            dispatch(1024, 512)   # 1 GiB: einsum (measured 1.7x faster)
            dispatch(4096, 512)   # 4 GiB transient (> 2 GiB cap) -> banded
        finally:
            d.weight_bounds_einsum, d.weight_bounds_banded = orig_e, orig_b
        assert calls == ["einsum", "einsum", "einsum", "banded"], calls

    def test_collapsed_quirk_matches_reference_loop_semantics(self):
        """collapsed=True must reproduce the reference's batch-collapse
        (distillation.py:27-29) EXACTLY: each bound is the sum over the WHOLE
        batch of the per-ray overlap sums, broadcast to every ray."""
        from mipnerf360_tpu.losses.distillation import (distillation_loss,
                                                        proposal_loss)

        rng = np.random.default_rng(3)
        B, N = 5, 12
        t_f = np.sort(rng.uniform(1, 6, (B, N + 1)).astype(np.float32), -1)
        t_c = np.sort(rng.uniform(1, 6, (B, N + 1)).astype(np.float32), -1)
        w_f = rng.uniform(0, 0.2, (B, N)).astype(np.float32)
        w_c = rng.uniform(0, 0.2, (B, N)).astype(np.float32)
        # reference-semantics oracle: B[i] = sum_b sum_j overlap(b,j,i) w[b,j]
        collapsed_oracle = _naive_bounds(t_f, w_f, t_c).sum(0, keepdims=True)
        want = proposal_loss(jnp.asarray(w_c),
                             jnp.broadcast_to(jnp.asarray(collapsed_oracle),
                                              w_c.shape))
        got = distillation_loss(jnp.asarray(t_f), jnp.asarray(w_f),
                                jnp.asarray(t_c), jnp.asarray(w_c),
                                collapsed=True)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
        # and differs from the per-ray default
        per_ray = distillation_loss(jnp.asarray(t_f), jnp.asarray(w_f),
                                    jnp.asarray(t_c), jnp.asarray(w_c))
        assert float(got) != float(per_ray)

    def test_banded_disjoint_grids_zero(self):
        """Coarse intervals entirely outside the fine grid bound to zero."""
        t_f = jnp.linspace(1.0, 2.0, 9)[None]
        w_f = jnp.ones((1, 8)) * 0.1
        t_c = jnp.linspace(5.0, 6.0, 5)[None]
        np.testing.assert_allclose(
            np.asarray(weight_bounds(t_f, w_f, t_c)), 0.0, atol=0)

    def test_bounds_stop_gradient(self):
        t = jnp.linspace(1, 6, 9)[None]
        w = jnp.ones((1, 8)) * 0.1
        g = jax.grad(lambda w: jnp.sum(weight_bounds(t, w, t)))(w)
        np.testing.assert_allclose(g, 0.0, atol=1e-8)

    def test_envelope_satisfied_gives_zero_loss(self):
        t = jnp.linspace(1, 6, 9)[None]
        w_fine = jnp.ones((1, 8)) * 0.05
        w_coarse = jnp.ones((1, 8))  # proposal envelope well above the bound
        assert float(distillation_loss(t, w_fine, t, w_coarse)) == 0.0

    def test_violated_envelope_penalized(self):
        t = jnp.linspace(1, 6, 9)[None]
        w_fine = jnp.ones((1, 8)) * 0.1
        w_coarse = jnp.zeros((1, 8))
        assert float(distillation_loss(t, w_fine, t, w_coarse)) > 0.0

    def test_grads_into_proposal_only(self):
        t = jnp.linspace(1, 6, 9)[None]
        w_fine = jnp.ones((1, 8)) * 0.1
        w_coarse = jnp.ones((1, 8)) * 0.01

        g_coarse = jax.grad(
            lambda wc: distillation_loss(t, w_fine, t, wc))(w_coarse)
        g_fine = jax.grad(
            lambda wf: distillation_loss(t, wf, t, w_coarse))(w_fine)
        assert bool(jnp.any(g_coarse != 0))
        np.testing.assert_allclose(g_fine, 0.0, atol=1e-8)


class TestPhotometric:
    def test_perfect_prediction(self):
        x = jnp.ones((4, 3)) * 0.5
        loss, psnr = photometric_loss(x, x)
        assert float(psnr) > 60.0
        assert float(loss) < -30.0  # 30 - big psnr

    def test_psnr_formula(self):
        assert float(mse_to_psnr(jnp.asarray(0.01))) == 20.0

    def test_matches_reference_scaling(self):
        # MSE summed over channels, averaged over rays (loss.py:34-35)
        pred = jnp.zeros((2, 3))
        tgt = jnp.ones((2, 3)) * 0.1
        loss, psnr = photometric_loss(pred, tgt)
        mse = 3 * 0.01  # summed over 3 channels
        np.testing.assert_allclose(float(psnr), float(mse_to_psnr(jnp.asarray(mse))), rtol=1e-5)
