"""Shared NN building blocks (flax.linen, NHWC, bf16-friendly).

Everything here is written for XLA:TPU: static shapes, channels-last convs
(MXU-tileable), fp32 normalization statistics with bf16 activations.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0,
                       scale: float = 1.0) -> jnp.ndarray:
    """Sinusoidal timestep embeddings (diffusers Timesteps parity: SD uses
    flip_sin_to_cos=True, downscale_freq_shift=0). fp32 for precision."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
        / (half - downscale_freq_shift))
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = scale * jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


class GroupNorm(nn.Module):
    """GroupNorm over channel-last tensors with fp32 statistics.

    ``fused_silu=True`` routes through the fused Pallas GroupNorm+SiLU
    kernel on TPU (ops/groupnorm.py), one HBM round-trip instead of two."""
    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    fused_silu: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
        from ..ops.groupnorm import group_norm_silu
        return group_norm_silu(x, scale, bias, self.num_groups, self.epsilon,
                               apply_silu=self.fused_silu)


class Conv(nn.Module):
    """3x3/1x1 conv, NHWC, SAME padding by default (diffusers Conv2d parity
    for stride-1; stride-2 downsample uses explicit asymmetric padding)."""
    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: Any = 'SAME'
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(self.features, self.kernel, strides=self.stride,
                       padding=self.padding, dtype=self.dtype,
                       param_dtype=jnp.float32, name='conv')(x)


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                        param_dtype=jnp.float32)(x)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class GroupLinear(nn.Module):
    """Batched grouped matmul (reference models/layers.py:16-80 GroupLinear,
    minus its latent bugs): input [B, G, in] -> [B, G, out] with per-group
    weights — one einsum on the MXU instead of a loop of small matmuls."""
    groups: int
    out_features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        G, in_f = self.groups, x.shape[-1]
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (G, in_f, self.out_features), jnp.float32)
        y = jnp.einsum('bgi,gio->bgo', x, w.astype(self.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
        if self.use_bias:
            b = self.param('bias', nn.initializers.zeros,
                           (G, self.out_features), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


ACT = {
    'silu': jax.nn.silu,
    'swish': jax.nn.silu,
    'gelu': lambda x: jax.nn.gelu(x, approximate=False),
    'quick_gelu': quick_gelu,
    'relu': jax.nn.relu,
    'mish': lambda x: x * jnp.tanh(jax.nn.softplus(x)),
}
