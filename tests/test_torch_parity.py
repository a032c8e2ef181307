"""Numerical parity of UNet building blocks vs torch equivalents.

Builds the same computation in torch.nn with weights copied from the flax
params — validates conv layout/padding, GroupNorm eps, timestep embedding
convention, GEGLU, and the stride-2 downsample's asymmetric padding.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch
import torch.nn as nn
import torch.nn.functional as F

from hcpdiff_tpu.models.layers import timestep_embedding
from hcpdiff_tpu.models.unet import (Downsample2D, GEGLUFeedForward,
                                     ResnetBlock2D, Upsample2D)


def _t(x):
    return torch.tensor(np.asarray(x))


def _conv_w(p):
    return _t(p['kernel']).permute(3, 2, 0, 1)


def test_timestep_embedding_matches_diffusers_convention():
    # diffusers get_timestep_embedding(flip_sin_to_cos=True, shift=0)
    t = np.array([0, 10, 500, 999], np.int64)
    dim, half = 32, 16
    exponent = -math.log(10000) * np.arange(half) / half
    freqs = np.exp(exponent)
    arg = t[:, None] * freqs[None]
    ref = np.concatenate([np.cos(arg), np.sin(arg)], axis=-1)  # flipped
    ours = np.asarray(timestep_embedding(jnp.asarray(t), dim))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_resnet_block_matches_torch():
    rng = jax.random.PRNGKey(0)
    block = ResnetBlock2D(out_channels=16, groups=4, dtype=jnp.float32)
    x = jax.random.normal(rng, (1, 8, 8, 8))
    temb = jax.random.normal(jax.random.PRNGKey(1), (1, 12))
    params = block.init(jax.random.PRNGKey(2), x, temb)['params']
    out = block.apply({'params': params}, x, temb)

    with torch.no_grad():
        xt = _t(x).permute(0, 3, 1, 2)
        tt = _t(temb)
        h = F.group_norm(xt, 4, _t(params['norm1']['scale']),
                         _t(params['norm1']['bias']))
        h = F.silu(h)
        h = F.conv2d(h, _conv_w(params['conv1']), _t(params['conv1']['bias']),
                     padding=1)
        tproj = F.linear(F.silu(tt), _t(params['time_emb_proj']['kernel']).T,
                         _t(params['time_emb_proj']['bias']))
        h = h + tproj[:, :, None, None]
        h = F.group_norm(h, 4, _t(params['norm2']['scale']),
                         _t(params['norm2']['bias']))
        h = F.silu(h)
        h = F.conv2d(h, _conv_w(params['conv2']), _t(params['conv2']['bias']),
                     padding=1)
        sc = F.conv2d(xt, _conv_w(params['conv_shortcut']),
                      _t(params['conv_shortcut']['bias']))
        ref = (sc + h).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_downsample_asymmetric_padding_matches_torch():
    ds = Downsample2D(channels=8, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 9, 9, 8))
    params = ds.init(jax.random.PRNGKey(1), x)['params']
    out = ds.apply({'params': params}, x)
    with torch.no_grad():
        xt = _t(x).permute(0, 3, 1, 2)
        xt = F.pad(xt, (0, 1, 0, 1))  # diffusers (0,1,0,1) pad
        ref = F.conv2d(xt, _conv_w(params['conv']), _t(params['conv']['bias']),
                       stride=2).permute(0, 2, 3, 1).numpy()
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_upsample_matches_torch():
    us = Upsample2D(channels=8, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 8))
    params = us.init(jax.random.PRNGKey(1), x)['params']
    out = us.apply({'params': params}, x)
    with torch.no_grad():
        xt = _t(x).permute(0, 3, 1, 2)
        xt = F.interpolate(xt, scale_factor=2, mode='nearest')
        ref = F.conv2d(xt, _conv_w(params['conv']), _t(params['conv']['bias']),
                       padding=1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_geglu_matches_torch():
    ff = GEGLUFeedForward(dim=16, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16))
    params = ff.init(jax.random.PRNGKey(1), x)['params']
    out = ff.apply({'params': params}, x)
    with torch.no_grad():
        xt = _t(x)
        h = F.linear(xt, _t(params['proj']['kernel']).T, _t(params['proj']['bias']))
        a, gate = h.chunk(2, dim=-1)
        h = a * F.gelu(gate)
        ref = F.linear(h, _t(params['out']['kernel']).T,
                       _t(params['out']['bias'])).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)
