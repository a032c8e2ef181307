"""AutoencoderKL (SD VAE) in flax — NHWC, TPU-native.

Replaces the reference's diffusers AutoencoderKL (hcpdiff/train_ac.py:209,
latent caching hcpdiff/data/pair_dataset.py:60-79). Encode produces a
DiagonalGaussian (mean, logvar); ``scaling_factor`` (0.18215 for SD) is
applied by callers. Slicing/tiling knobs of the reference's low-VRAM path
(hcpdiff/visualizer.py:58-79) are unnecessary on TPU HBM; batch the work
instead.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import attention
from .layers import GroupNorm

Dtype = Any


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215

    @classmethod
    def sd(cls) -> 'VAEConfig':
        return cls()

    @classmethod
    def sdxl(cls) -> 'VAEConfig':
        return cls(scaling_factor=0.13025)

    @classmethod
    def tiny(cls, **kw) -> 'VAEConfig':
        base = dict(block_out_channels=(16, 32), layers_per_block=1,
                    norm_num_groups=4)
        base.update(kw)
        return cls(**base)


def _conv(features, kernel, dtype, name, stride=1, padding='SAME'):
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=padding, dtype=dtype, param_dtype=jnp.float32, name=name)


class VAEResnet(nn.Module):
    out_channels: int
    groups: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_c = x.shape[-1]
        h = GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype,
                      fused_silu=True, name='norm1')(x)
        h = _conv(self.out_channels, 3, self.dtype, 'conv1')(h)
        h = GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype,
                      fused_silu=True, name='norm2')(h)
        h = _conv(self.out_channels, 3, self.dtype, 'conv2')(h)
        if in_c != self.out_channels:
            x = _conv(self.out_channels, 1, self.dtype, 'conv_shortcut')(x)
        return x + h


class VAEAttention(nn.Module):
    channels: int
    groups: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        h = GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype, name='group_norm')(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name='to_q')(h)
        k = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name='to_k')(h)
        v = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name='to_v')(h)
        o = attention(q[:, None], k[:, None], v[:, None])[:, 0]
        o = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name='to_out')(o)
        return x + o.reshape(B, H, W, C)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        x = _conv(c.block_out_channels[0], 3, self.dtype, 'conv_in')(x)
        for bi, out_c in enumerate(c.block_out_channels):
            for li in range(c.layers_per_block):
                x = VAEResnet(out_c, c.norm_num_groups, dtype=self.dtype,
                              name=f'down_{bi}_res_{li}')(x)
            if bi < len(c.block_out_channels) - 1:
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = _conv(out_c, 3, self.dtype, f'down_{bi}_downsample',
                          stride=2, padding='VALID')(x)
        mid_c = c.block_out_channels[-1]
        x = VAEResnet(mid_c, c.norm_num_groups, dtype=self.dtype, name='mid_res_0')(x)
        x = VAEAttention(mid_c, c.norm_num_groups, dtype=self.dtype, name='mid_attn')(x)
        x = VAEResnet(mid_c, c.norm_num_groups, dtype=self.dtype, name='mid_res_1')(x)
        x = GroupNorm(c.norm_num_groups, epsilon=1e-6, dtype=self.dtype,
                      fused_silu=True, name='conv_norm_out')(x)
        return _conv(2 * c.latent_channels, 3, self.dtype, 'conv_out')(x)


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        mid_c = c.block_out_channels[-1]
        x = _conv(mid_c, 3, self.dtype, 'conv_in')(z)
        x = VAEResnet(mid_c, c.norm_num_groups, dtype=self.dtype, name='mid_res_0')(x)
        x = VAEAttention(mid_c, c.norm_num_groups, dtype=self.dtype, name='mid_attn')(x)
        x = VAEResnet(mid_c, c.norm_num_groups, dtype=self.dtype, name='mid_res_1')(x)
        rev = list(reversed(c.block_out_channels))
        for bi, out_c in enumerate(rev):
            for li in range(c.layers_per_block + 1):
                x = VAEResnet(out_c, c.norm_num_groups, dtype=self.dtype,
                              name=f'up_{bi}_res_{li}')(x)
            if bi < len(rev) - 1:
                B, H, W, C = x.shape
                x = jax.image.resize(x, (B, H * 2, W * 2, C), method='nearest')
                x = _conv(out_c, 3, self.dtype, f'up_{bi}_upsample')(x)
        x = GroupNorm(c.norm_num_groups, epsilon=1e-6, dtype=self.dtype,
                      fused_silu=True, name='conv_norm_out')(x)
        return _conv(c.out_channels, 3, self.dtype, 'conv_out')(x)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.encoder = Encoder(self.cfg, dtype=self.dtype)
        self.decoder = Decoder(self.cfg, dtype=self.dtype)
        self.quant_conv = _conv(2 * self.cfg.latent_channels, 1, self.dtype, 'quant_conv')
        self.post_quant_conv = _conv(self.cfg.latent_channels, 1, self.dtype,
                                     'post_quant_conv')

    def encode(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """image [B,H,W,3] in [-1,1] -> (mean, logvar) each [B,H/8,W/8,4]."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z.astype(self.dtype))).astype(jnp.float32)

    def __call__(self, x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        mean, logvar = self.encode(x)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        return self.decode(z)


def sample_latent(mean: jnp.ndarray, logvar: jnp.ndarray, rng: jax.Array,
                  scaling_factor: float) -> jnp.ndarray:
    return (mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
            ) * scaling_factor
