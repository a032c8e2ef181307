"""ControlNet — explicit residual-tap module (TPU-native).

The reference implements ControlNet as a MultiPluginBlock that deep-copies
UNet submodules and injects via forward hooks at down/mid/up taps
(hcpdiff/models/controlnet.py:11-187). Here the UNet already *accepts*
``down_residuals``/``mid_residual`` (models/unet.py), so ControlNet is just
a sibling network: a copy of the UNet's down+mid path with
zero-initialized 1x1 output convs per tap and a conditioning encoder.
Zero-init preserves the base model at step 0 (reference zero_module
semantics).

``init_from_unet`` copies the matching UNet params (the reference's
deepcopy-from-host, controlnet.py:95-115).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import GroupNorm, timestep_embedding
from .unet import (Downsample2D, ResnetBlock2D, Transformer2D, UNetConfig,
                   _conv, _dense)


class ControlNetConditioningEmbedding(nn.Module):
    """Encode the cond image (e.g. canny/pose, full res) down to latent res.
    ``stages`` stride-2 convs bridge image->latent resolution
    (3 for the SD /8 VAE)."""
    out_channels: int
    stages: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, cond: jnp.ndarray) -> jnp.ndarray:
        chans = tuple(min(16 * 2 ** i if i < 2 else 96 if i == 2 else 256, 256)
                      for i in range(self.stages + 1))
        x = _conv(chans[0], 3, self.dtype, 'conv_in')(cond)
        x = jax.nn.silu(x)
        for i in range(self.stages):
            x = _conv(chans[i], 3, self.dtype, f'blocks_{2 * i}')(x)
            x = jax.nn.silu(x)
            x = _conv(chans[i + 1], 3, self.dtype, f'blocks_{2 * i + 1}',
                      stride=2)(x)
            x = jax.nn.silu(x)
        return nn.Conv(self.out_channels, (3, 3), padding='SAME',
                       dtype=self.dtype, param_dtype=jnp.float32,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros, name='conv_out')(x)


class ControlNet(nn.Module):
    """Down+mid copy of the UNet producing per-skip residuals + mid residual."""
    cfg: UNetConfig
    dtype: Any = jnp.bfloat16
    cond_stages: int = 3   # stride-2 stages in the cond embedding (= log2 vae_scale)

    @nn.compact
    def __call__(self, sample: jnp.ndarray, timesteps: jnp.ndarray,
                 encoder_hidden_states: jnp.ndarray, cond: jnp.ndarray,
                 conditioning_scale: float = 1.0
                 ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
        c = self.cfg
        ctx = encoder_hidden_states.astype(self.dtype)

        tdim = c.block_out_channels[0] * 4
        if jnp.ndim(timesteps) == 0:
            timesteps = jnp.full((sample.shape[0],), timesteps)
        temb = timestep_embedding(timesteps, c.block_out_channels[0])
        temb = _dense(tdim, jnp.float32, 'time_embedding_linear_1')(temb)
        temb = _dense(tdim, jnp.float32, 'time_embedding_linear_2')(jax.nn.silu(temb))
        temb = temb.astype(self.dtype)

        x = _conv(c.block_out_channels[0], 3, self.dtype, 'conv_in')(sample.astype(self.dtype))
        x = x + ControlNetConditioningEmbedding(
            c.block_out_channels[0], stages=self.cond_stages, dtype=self.dtype,
            name='cond_embedding')(cond.astype(self.dtype))

        def zero_conv(ch, name):
            return nn.Conv(ch, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                           kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros, name=name)

        residuals: List[jnp.ndarray] = [zero_conv(x.shape[-1], 'zero_0')(x)]
        zi = 1
        n_blocks = len(c.block_out_channels)
        for bi, (btype, out_c) in enumerate(zip(c.down_block_types,
                                                c.block_out_channels)):
            for li in range(c.layers_per_block):
                x = ResnetBlock2D(out_c, c.norm_num_groups, dtype=self.dtype,
                                  name=f'down_{bi}_res_{li}')(x, temb)
                if btype == 'CrossAttnDownBlock2D':
                    x = Transformer2D(out_c, c.num_heads[bi],
                                      c.transformer_layers_per_block[bi],
                                      c.cross_attention_dim, c.norm_num_groups,
                                      dtype=self.dtype,
                                      name=f'down_{bi}_attn_{li}')(x, ctx)
                residuals.append(zero_conv(out_c, f'zero_{zi}')(x))
                zi += 1
            if bi < n_blocks - 1:
                x = Downsample2D(out_c, dtype=self.dtype,
                                 name=f'down_{bi}_downsample')(x)
                residuals.append(zero_conv(out_c, f'zero_{zi}')(x))
                zi += 1

        mid_c = c.block_out_channels[-1]
        x = ResnetBlock2D(mid_c, c.norm_num_groups, dtype=self.dtype,
                          name='mid_res_0')(x, temb)
        if c.mid_cross_attn:
            x = Transformer2D(mid_c, c.num_heads[-1],
                              c.transformer_layers_per_block[-1],
                              c.cross_attention_dim, c.norm_num_groups,
                              dtype=self.dtype, name='mid_attn')(x, ctx)
        x = ResnetBlock2D(mid_c, c.norm_num_groups, dtype=self.dtype,
                          name='mid_res_1')(x, temb)
        mid = zero_conv(mid_c, 'zero_mid')(x)

        s = jnp.asarray(conditioning_scale, self.dtype)
        return [r * s for r in residuals], mid * s


def build_controlnet(rng, unet_cfg: UNetConfig, unet_params: Dict[str, Any],
                     vae_scale: int = 8, dtype: Any = jnp.bfloat16,
                     cross_attention_dim: Optional[int] = None,
                     **_) -> Tuple['ControlNet', Dict[str, Any]]:
    """Trainable-plugin builder protocol (the generic make_plugin dispatch,
    reference hcpdiff/utils/cfg_net_tools.py:130-225): any plugin class the
    Trainer's ``plugin_unet`` config names must expose a module-level
    ``build_<name>``/classmethod ``from_unet(rng, unet_cfg, unet_params,
    vae_scale, dtype, **spec) -> (module, params)``; its ``apply(params, x,
    t, ctx, cond)`` then feeds residual taps into the train step."""
    import math
    cn = ControlNet(unet_cfg, dtype=dtype,
                    cond_stages=int(math.log2(vae_scale)))
    lat = vae_scale
    params = cn.init(rng,
                     jnp.zeros((1, 8, 8, unet_cfg.in_channels)),
                     jnp.array([0]),
                     jnp.zeros((1, 77, cross_attention_dim
                                or unet_cfg.cross_attention_dim)),
                     jnp.zeros((1, 8 * lat, 8 * lat, 3)))['params']
    params = init_from_unet(jax.device_get(params), jax.device_get(unet_params))
    return cn, jax.tree_util.tree_map(jnp.asarray, params)


ControlNet.from_unet = staticmethod(build_controlnet)


def init_from_unet(cn_params: Dict[str, Any], unet_params: Dict[str, Any]
                   ) -> Dict[str, Any]:
    """Copy shared-submodule weights from a trained UNet into a fresh
    ControlNet (reference deepcopy-from-host)."""
    out = {}
    for k, v in cn_params.items():
        if k in unet_params and not k.startswith(('zero_', 'cond_embedding')):
            out[k] = jax.tree_util.tree_map(lambda a: a, unet_params[k])
        else:
            out[k] = v
    return out
