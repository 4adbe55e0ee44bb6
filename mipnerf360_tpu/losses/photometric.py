"""Photometric reconstruction loss and PSNR.

Counterpart of /root/reference/intern/loss.py:23-58. The reference's trained
quantity is ``30 - PSNR`` — a log-MSE reparameterization that it reports speeds
up training (loss.py:37-38); we reproduce it, with plain MSE available too.
"""
from __future__ import annotations

import jax.numpy as jnp


def mse_to_psnr(mse):
    return -10.0 * jnp.log10(mse)


def psnr_to_mse(psnr):
    return jnp.power(10.0, -psnr / 10.0)


def photometric_loss(pred_rgb, target_rgb):
    """Returns (train_loss = 30 - PSNR, psnr).

    MSE is summed over channels and averaged over rays (loss.py:34-35).
    NOTE the returned ``psnr`` is therefore computed from a CHANNEL-SUMMED
    MSE (3x the per-element mean), so it reads 10*log10(3) ~= 4.77 dB BELOW
    the standard image PSNR (utils/metrics.psnr, the eval/psnr_image metric).
    Kept as-is for reference parity — the trained loss must match loss.py —
    and surfaced only under the noise-flagged eval/psnr_batch_noisy metric;
    do not compare it against image PSNRs.
    """
    batch = pred_rgb.shape[0]
    mse = jnp.sum((pred_rgb[..., :3] - target_rgb[..., :3]) ** 2) / batch
    psnr = mse_to_psnr(mse)
    return 30.0 - psnr, psnr
