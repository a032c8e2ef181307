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
    """MSE × min(γ/SNR, 1) (arXiv 2303.09556).

    Matches reference hcpdiff/loss/min_snr_loss.py:5-25 exactly, including
    the gamma=1.0 default."""
    need_timesteps = True

    def __init__(self, noise_scheduler: NoiseSchedule, gamma: float = 1.0, **_):
        self.gamma = float(gamma)
        self.snr = noise_scheduler.snr  # [T]
        # sigma = sqrt(1 - alpha_bar), reference's self.sigma table
        self.sigma = jnp.sqrt(1.0 - noise_scheduler.alphas_cumprod)

    def weight(self, timesteps):
        snr = self.snr[timesteps]
        return jnp.minimum(self.gamma / snr, 1.0)

    def __call__(self, pred, target, timesteps):
        w = self.weight(timesteps).reshape((-1,) + (1,) * (pred.ndim - 1))
        return w * (pred - target) ** 2


class SoftMinSNRLoss(MinSNRLoss):
    """weight = γ³/(snr² + γ³) smooth variant
    (reference min_snr_loss.py:28-35; typical gamma=2)."""

    def weight(self, timesteps):
        snr = self.snr[timesteps]
        g3 = self.gamma ** 3
        return g3 / (snr ** 2 + g3)


class KDiffMinSNRLoss(MinSNRLoss):
    """k-diffusion style weighting: 4·(γ·snr)²/(snr² + γ²)²
    (reference min_snr_loss.py:37-43)."""

    def weight(self, timesteps):
        snr = self.snr[timesteps]
        g = self.gamma
        return 4 * (g * snr) ** 2 / (snr ** 2 + g ** 2) ** 2


class EDMLoss(MinSNRLoss):
    """EDM (arXiv 2206.00364) weighting: (σ² + γ²)/(snr·(σ·γ)²) where γ
    plays the sigma_data role (reference min_snr_loss.py:45-52)."""
    need_timesteps = True

    def __init__(self, noise_scheduler: NoiseSchedule, gamma: float = 1.0, **kw):
        super().__init__(noise_scheduler, gamma=kw.get('sigma_data', gamma))

    def weight(self, timesteps):
        snr = self.snr[timesteps]
        sigma = self.sigma[timesteps]
        g = self.gamma
        return (sigma ** 2 + g ** 2) / (snr * (sigma * g) ** 2)


LOSSES = {
    'mse': MSELoss,
    'min_snr': MinSNRLoss,
    'soft_min_snr': SoftMinSNRLoss,
    'kdiff_min_snr': KDiffMinSNRLoss,
    'edm': EDMLoss,
}
