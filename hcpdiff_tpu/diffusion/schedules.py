"""Noise schedules (beta tables) + training-side utilities.

Replaces the diffusers scheduler objects the reference trains against
(hcpdiff/train_ac.py:437-447 make_noise, hcpdiff/noise/zero_terminal.py:5).
Everything is a precomputed fp32 table + pure functions — jit/scan friendly.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    betas: jnp.ndarray               # [T]
    alphas_cumprod: jnp.ndarray      # [T]
    num_train_timesteps: int
    prediction_type: str = 'epsilon'  # epsilon | v_prediction | sample

    @classmethod
    def make(cls, num_train_timesteps: int = 1000,
             beta_start: float = 0.00085, beta_end: float = 0.012,
             beta_schedule: str = 'scaled_linear',
             prediction_type: str = 'epsilon',
             zero_terminal_snr: bool = False) -> 'NoiseSchedule':
        if beta_schedule == 'scaled_linear':   # SD default
            betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                                num_train_timesteps, dtype=np.float64) ** 2
        elif beta_schedule == 'linear':
            betas = np.linspace(beta_start, beta_end, num_train_timesteps,
                                dtype=np.float64)
        elif beta_schedule == 'squaredcos_cap_v2':
            t = np.arange(num_train_timesteps + 1, dtype=np.float64) / num_train_timesteps
            f = np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
            betas = np.clip(1 - f[1:] / f[:-1], 0, 0.999)
        else:
            raise ValueError(beta_schedule)
        acp = np.cumprod(1.0 - betas)
        if zero_terminal_snr:
            acp, betas = _rescale_zero_terminal_snr(acp)
        return cls(betas=jnp.asarray(betas, jnp.float32),
                   alphas_cumprod=jnp.asarray(acp, jnp.float32),
                   num_train_timesteps=num_train_timesteps,
                   prediction_type=prediction_type)

    # ---- training-side ----
    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray,
                  t: jnp.ndarray) -> jnp.ndarray:
        a = self.alphas_cumprod[t]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        return (jnp.sqrt(a).reshape(shape) * x0
                + jnp.sqrt(1.0 - a).reshape(shape) * noise)

    def get_velocity(self, x0: jnp.ndarray, noise: jnp.ndarray,
                     t: jnp.ndarray) -> jnp.ndarray:
        a = self.alphas_cumprod[t]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        return (jnp.sqrt(a).reshape(shape) * noise
                - jnp.sqrt(1.0 - a).reshape(shape) * x0)

    def target(self, x0: jnp.ndarray, noise: jnp.ndarray,
               t: jnp.ndarray) -> jnp.ndarray:
        if self.prediction_type == 'epsilon':
            return noise
        if self.prediction_type == 'v_prediction':
            return self.get_velocity(x0, noise, t)
        if self.prediction_type == 'sample':
            return x0
        raise ValueError(self.prediction_type)

    @property
    def snr(self) -> jnp.ndarray:
        """Signal-to-noise ratio table for Min-SNR weighting
        (reference hcpdiff/loss/min_snr_loss.py:5-21)."""
        a = self.alphas_cumprod
        return a / (1.0 - a)

    def pred_to_x0_eps(self, model_out: jnp.ndarray, sample: jnp.ndarray,
                       t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Convert model output under prediction_type into (x0, eps)."""
        a = self.alphas_cumprod[t]
        shape = (-1,) + (1,) * (sample.ndim - 1)
        sa, sb = jnp.sqrt(a).reshape(shape), jnp.sqrt(1 - a).reshape(shape)
        if self.prediction_type == 'epsilon':
            eps = model_out
            x0 = (sample - sb * eps) / sa
        elif self.prediction_type == 'v_prediction':
            x0 = sa * sample - sb * model_out
            eps = sa * model_out + sb * sample
        elif self.prediction_type == 'sample':
            x0 = model_out
            eps = (sample - sa * x0) / sb
        else:
            raise ValueError(self.prediction_type)
        return x0, eps


def _rescale_zero_terminal_snr(acp: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Zero-terminal-SNR beta rescale (arXiv 2305.08891; reference
    hcpdiff/noise/zero_terminal.py:5-29): shift+scale sqrt(acp) so the last
    step has SNR 0 while step 0 keeps its SNR."""
    s = np.sqrt(acp)
    s0, sT = s[0], s[-1]
    s = s - sT
    s = s * s0 / (s0 - sT)
    acp2 = s ** 2
    alphas = np.concatenate([acp2[:1], acp2[1:] / acp2[:-1]])
    betas = 1.0 - alphas
    return acp2, betas


def pyramid_noise(rng: jax.Array, shape: Tuple[int, ...],
                  discount: float = 0.9, levels: int = 6) -> jnp.ndarray:
    """Multi-scale (pyramid) noise, reference hcpdiff/noise/pyramid_noise.py:9:
    sum of upsampled gaussians at decreasing resolutions, renormalized."""
    B, H, W, C = shape
    rngs = jax.random.split(rng, levels)
    noise = jax.random.normal(rngs[0], shape)
    for i in range(1, levels):
        h, w = max(1, H // (2 ** i)), max(1, W // (2 ** i))
        n = jax.random.normal(rngs[i], (B, h, w, C))
        n = jax.image.resize(n, shape, method='bilinear')
        noise = noise + (discount ** i) * n
        if h == 1 and w == 1:
            break
    return noise / jnp.std(noise)
