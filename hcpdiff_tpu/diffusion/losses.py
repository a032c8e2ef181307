"""Training losses (reference hcpdiff/loss/min_snr_loss.py:5-51).

All return per-element losses (reduction='none') so per-pixel attention
masks and per-dataset loss weights apply before the mean
(reference train_ac.py:506-515).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .schedules import NoiseSchedule


class MSELoss:
    need_timesteps = False

    def __init__(self, **_):
        pass

    def __call__(self, pred, target, timesteps=None):
        return (pred - target) ** 2


class MinSNRLoss(MSELoss):
    """MSE × min(γ/SNR, 1) (arXiv 2303.09556)."""
    need_timesteps = True

    def __init__(self, noise_scheduler: NoiseSchedule, gamma: float = 2.0, **_):
        self.gamma = float(gamma)
        self.snr = noise_scheduler.snr  # [T]

    def weight(self, timesteps):
        snr = self.snr[timesteps]
        return jnp.minimum(self.gamma / snr, 1.0)

    def __call__(self, pred, target, timesteps):
        w = self.weight(timesteps).reshape((-1,) + (1,) * (pred.ndim - 1))
        return w * (pred - target) ** 2


class SoftMinSNRLoss(MinSNRLoss):
    """weight = snr·γ²/(snr² + γ²) smooth variant of Min-SNR."""

    def weight(self, timesteps):
        snr = self.snr[timesteps]
        g2 = self.gamma ** 2
        return snr * g2 / (snr ** 2 + g2)


class KDiffMinSNRLoss(MinSNRLoss):
    """k-diffusion style weighting: snr-reciprocal soft min."""

    def weight(self, timesteps):
        snr = self.snr[timesteps]
        g = self.gamma
        return 4 * (snr * g ** 2) / (snr + g ** 2) ** 2


class EDMLoss(MinSNRLoss):
    """EDM (arXiv 2206.00364) sigma weighting mapped onto discrete SNR."""
    need_timesteps = True

    def __init__(self, noise_scheduler: NoiseSchedule, sigma_data: float = 0.5, **_):
        super().__init__(noise_scheduler, gamma=1.0)
        self.sigma_data = float(sigma_data)

    def weight(self, timesteps):
        snr = self.snr[timesteps]
        sigma2 = 1.0 / jnp.maximum(snr, 1e-8)
        sd2 = self.sigma_data ** 2
        return (sigma2 + sd2) / (sigma2 * sd2)


LOSSES = {
    'mse': MSELoss,
    'min_snr': MinSNRLoss,
    'soft_min_snr': SoftMinSNRLoss,
    'kdiff_min_snr': KDiffMinSNRLoss,
    'edm': EDMLoss,
}
