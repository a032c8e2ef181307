"""UNet2DCondition (SD1.5 / SD2.x / SDXL) in flax — TPU-native.

Design notes vs the reference (which delegates to diffusers' torch UNet,
hcpdiff/train_ac.py:199-236):
- NHWC layout everywhere (XLA:TPU conv-native; converters transpose OIHW).
- ControlNet is NOT hook-based (reference hcpdiff/models/controlnet.py:11-187
  uses MultiPluginBlock hooks); the UNet forward takes explicit
  ``down_residuals``/``mid_residual`` taps, which is both simpler and
  jit-friendly (SURVEY.md §7 translation decision).
- optional ``remat`` per block trades FLOPs for HBM (grad checkpointing,
  reference train_ac.py:44-47 monkeypatch).
- attention (self + cross) routes through ops.attention (Pallas flash kernel
  on TPU).
- SDXL 'text_time' additional embedding (pooled text + crop/size time_ids)
  per hcpdiff/models/wrapper.py:57-96.

One config class covers all three model families plus tiny test models.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import attention
from .layers import GroupNorm, timestep_embedding

Dtype = Any


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = ('CrossAttnDownBlock2D',) * 3 + ('DownBlock2D',)
    up_block_types: Tuple[str, ...] = ('UpBlock2D',) + ('CrossAttnUpBlock2D',) * 3
    layers_per_block: int = 2
    transformer_layers_per_block: Tuple[int, ...] = (1, 1, 1, 1)
    num_heads: Tuple[int, ...] = (8, 8, 8, 8)
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    addition_embed_type: Optional[str] = None       # 'text_time' for SDXL
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816
    mid_cross_attn: bool = True
    # biased attention q/k/v projections. SD declares these bias-free; the
    # flag exists for loading pre-0.9 reference LoRAs that carry bias
    # deltas (reference lora_base_patch.py:150-170 reparameterization
    # creates the host bias at collapse time — here the host is rebuilt
    # with zero-init biases and the delta adds onto them).
    qkv_bias: bool = False
    # Megatron-style tensor parallelism over a named mesh axis (inference
    # latency scaling; beyond-reference — the torch reference has no TP).
    # tp>1 is only valid inside shard_map/with a bound ``tp_axis``: each
    # member computes heads/tp attention heads and inner/tp FF columns from
    # the REPLICATED global params (sliced by lax.axis_index — weights are
    # small next to activations at diffusion scales, so replicate-and-slice
    # avoids resharded checkpoints), with one psum per sublayer at the
    # row-parallel output projections. Convs/norms are replicated compute.
    # See parallel/tp.py for the shard_map driver + divisibility checks.
    tp: int = 1
    tp_axis: str = 'model'

    @classmethod
    def sd15(cls) -> 'UNetConfig':
        return cls()

    @classmethod
    def sd21(cls) -> 'UNetConfig':
        return cls(cross_attention_dim=1024, num_heads=(5, 10, 20, 20))

    @classmethod
    def sdxl(cls) -> 'UNetConfig':
        return cls(block_out_channels=(320, 640, 1280),
                   down_block_types=('DownBlock2D', 'CrossAttnDownBlock2D', 'CrossAttnDownBlock2D'),
                   up_block_types=('CrossAttnUpBlock2D', 'CrossAttnUpBlock2D', 'UpBlock2D'),
                   transformer_layers_per_block=(1, 2, 10),
                   num_heads=(5, 10, 20),
                   cross_attention_dim=2048,
                   addition_embed_type='text_time',
                   projection_class_embeddings_input_dim=2816)

    @classmethod
    def tiny(cls, cross_attention_dim: int = 32, **kw) -> 'UNetConfig':
        base = dict(block_out_channels=(32, 64),
                    down_block_types=('CrossAttnDownBlock2D', 'DownBlock2D'),
                    up_block_types=('UpBlock2D', 'CrossAttnUpBlock2D'),
                    layers_per_block=1,
                    transformer_layers_per_block=(1, 1),
                    num_heads=(2, 4),
                    cross_attention_dim=cross_attention_dim,
                    norm_num_groups=8)
        base.update(kw)
        return cls(**base)

    @classmethod
    def tiny_sdxl(cls, **kw) -> 'UNetConfig':
        base = dict(block_out_channels=(32, 64),
                    down_block_types=('DownBlock2D', 'CrossAttnDownBlock2D'),
                    up_block_types=('CrossAttnUpBlock2D', 'UpBlock2D'),
                    layers_per_block=1,
                    transformer_layers_per_block=(1, 1),
                    num_heads=(2, 4),
                    cross_attention_dim=32,
                    norm_num_groups=8,
                    addition_embed_type='text_time',
                    addition_time_embed_dim=8,
                    projection_class_embeddings_input_dim=8 * 6 + 32)
        base.update(kw)
        return cls(**base)


def _dense(features, dtype, name, use_bias=True):
    return nn.Dense(features, use_bias=use_bias, dtype=dtype,
                    param_dtype=jnp.float32, name=name)


def _conv(features, kernel, dtype, name, stride=1, padding='SAME'):
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=padding, dtype=dtype, param_dtype=jnp.float32,
                   name=name)


def _pallas_conv() -> bool:
    """Pallas 3x3 conv routing for the resblocks (ops/conv.py): the conv
    gets its own high-MFU schedule instead of XLA's ~40 TF/s conv+GN-stats
    multi-output fusions, and the time-embedding add / skip add fuse into
    its epilogue. Opt-in (HCP_PALLAS_CONV=1) until measured."""
    return (os.environ.get('HCP_PALLAS_CONV', '0') == '1'
            and _pallas_backend())


class _ConvParams(nn.Module):
    """kernel+bias params matching ``nn.Conv`` paths/init exactly, for
    routing 3x3 convs through the Pallas conv kernel."""
    features: int
    ksize: int = 3

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param('kernel', nn.initializers.lecun_normal(),
                       (self.ksize, self.ksize, in_features, self.features),
                       jnp.float32)
        b = self.param('bias', nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class ResnetBlock2D(nn.Module):
    out_channels: int
    groups: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        in_c = x.shape[-1]
        h = GroupNorm(self.groups, dtype=self.dtype, fused_silu=True,
                      name='norm1')(x)
        t = _dense(self.out_channels, self.dtype, 'time_emb_proj')(jax.nn.silu(temb))
        if _pallas_conv():
            from ..ops.conv import conv3x3
            k1, b1 = _ConvParams(self.out_channels, name='conv1')(h.shape[-1])
            # time-embedding add fused into conv1's epilogue (row_bias)
            h = conv3x3(h.astype(self.dtype), k1.astype(self.dtype),
                        b1.astype(self.dtype), row_bias=t)
            h = GroupNorm(self.groups, dtype=self.dtype, fused_silu=True,
                          name='norm2')(h)
            k2, b2 = _ConvParams(self.out_channels, name='conv2')(h.shape[-1])
            if in_c != self.out_channels:
                x = _conv(self.out_channels, 1, self.dtype, 'conv_shortcut')(x)
            # skip add fused into conv2's epilogue (res)
            return conv3x3(h, k2.astype(self.dtype), b2.astype(self.dtype),
                           res=x.astype(self.dtype))
        h = _conv(self.out_channels, 3, self.dtype, 'conv1')(h)
        h = h + t[:, None, None, :]
        h = GroupNorm(self.groups, dtype=self.dtype, fused_silu=True,
                      name='norm2')(h)
        h = _conv(self.out_channels, 3, self.dtype, 'conv2')(h)
        if in_c != self.out_channels:
            x = _conv(self.out_channels, 1, self.dtype, 'conv_shortcut')(x)
        return x + h


class _DenseKernel(nn.Module):
    """Registers a Dense-compatible ``kernel`` param (same path, shape, and
    lecun-normal init as ``nn.Dense(use_bias=False)``) and returns it, so
    several projections can fuse into ONE matmul while checkpoints/LoRA
    selectors keep seeing separate to_q/to_k/to_v weights."""
    features: int

    @nn.compact
    def __call__(self, in_features: int) -> jnp.ndarray:
        return self.param('kernel', nn.initializers.lecun_normal(),
                          (in_features, self.features), jnp.float32)


class _DenseParams(nn.Module):
    """kernel+bias params matching ``nn.Dense`` paths/init exactly, for
    routing the matmul through the Pallas projection GEMM (ops/matmul.py)
    while checkpoints/LoRA selectors see an ordinary Dense module."""
    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param('kernel', nn.initializers.lecun_normal(),
                       (in_features, self.features), jnp.float32)
        b = self.param('bias', nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


def _pallas_backend() -> bool:
    """Pallas GEMM routing needs the TPU backend; HCP_PALLAS_FORCE=1 lets
    CPU tests exercise the routing under pltpu.force_tpu_interpret_mode()."""
    return (jax.default_backend() == 'tpu'
            or os.environ.get('HCP_PALLAS_FORCE', '0') == '1')


def _pallas_proj() -> bool:
    return os.environ.get('HCP_PALLAS_PROJ', '0') == '1' and _pallas_backend()


def _pallas_ff() -> bool:
    """ff Pallas routing (geglu + ff.out) — default ON for TPU: measured
    2.99 vs 2.94 img/s whole-loop, and trace-timed kernels beat XLA's
    ff.out fusions ~3x at level 0 (ROUND_NOTES round-3). HCP_PALLAS_FF=0
    disables; HCP_PALLAS_PROJ=1 additionally routes proj_in/out + to_out."""
    return _pallas_proj() or (os.environ.get('HCP_PALLAS_FF', '1') == '1'
                              and _pallas_backend())


def _int8() -> bool:
    """Dynamic w8a8 int8 MXU routing for the transformer projections/FF
    (ops/int8.py) — inference experiment raising the ceiling above the
    bf16 roofline (v5e int8 peak is 2x bf16). Opt-in HCP_INT8=1; takes
    precedence over the Pallas bf16 GEMM routing for the layers it
    covers (qkv, to_out, ff proj/out, proj_in/out). The LN-fused path
    (HCP_PALLAS_LN) keeps the qkv projections in bf16 if both are set."""
    return os.environ.get('HCP_INT8', '0') == '1'


def _pallas_ln() -> bool:
    """LayerNorm-fused projection kernels (ln+qkv, ln+q, ln+geglu): the
    sublayer LN runs in the GEMM prologue, so neither the normalized
    activation (HBM round-trip) nor — for self-attention — two of the
    three q/k/v input reads ever touch HBM. Three separate output buffers
    avoid the strided-split copies that sank the one-matmul fused-QKV
    experiment (ROUND2_NOTES). Opt-in (HCP_PALLAS_LN=1) until measured."""
    return (os.environ.get('HCP_PALLAS_LN', '0') == '1'
            and _pallas_backend())


class _LNParams(nn.Module):
    """scale+bias params matching ``nn.LayerNorm`` paths/init exactly, for
    folding the norm into a Pallas GEMM prologue while checkpoints keep
    seeing an ordinary LayerNorm module."""

    @nn.compact
    def __call__(self, features: int):
        g = self.param('scale', nn.initializers.ones, (features,),
                       jnp.float32)
        b = self.param('bias', nn.initializers.zeros, (features,),
                       jnp.float32)
        return g, b


def _proj_dense(x, features, dtype, name, res=None):
    """Dense with bias, Pallas-GEMM-routed when HCP_PALLAS_PROJ=1.

    ``res`` (same shape as the output) is a residual added to the result —
    inside the Pallas epilogue when routed (a separate add over the opaque
    pallas_call boundary costs a full HBM round-trip), as a plain XLA add
    otherwise (where the compiler fuses it into the producer)."""
    if _int8():
        from ..ops.int8 import int8_dense
        k, b = _DenseParams(features, name=name)(x.shape[-1])
        return int8_dense(x.astype(dtype), k, b, res=res)
    if _pallas_proj():
        from ..ops.matmul import fused_dense
        k, b = _DenseParams(features, name=name)(x.shape[-1])
        return fused_dense(x.astype(dtype), k.astype(dtype), b.astype(dtype),
                           res=res)
    out = _dense(features, dtype, name)(x)
    return out if res is None else out + res


class CrossAttention(nn.Module):
    """to_q/to_k/to_v/to_out naming mirrors diffusers for converter parity."""
    query_dim: int
    heads: int
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.bfloat16
    qkv_bias: bool = False
    tp: int = 1                 # tensor parallelism (see UNetConfig.tp)
    tp_axis: str = 'model'

    def _tp_call(self, x, ctx, bias, res):
        """Megatron-style head-parallel attention: q/k/v column-parallel
        (this member's heads/tp head slice of the replicated kernels),
        to_out row-parallel with ONE psum over ``tp_axis``. Param tree is
        byte-identical to the tp=1 module — slicing happens at apply time
        via lax.axis_index, so standard checkpoints load unchanged."""
        B, S, _ = x.shape
        Sk = ctx.shape[1]
        h, d = self.heads, self.query_dim // self.heads
        if h % self.tp:
            raise ValueError(f'heads={h} not divisible by tp={self.tp}')
        if self.qkv_bias:
            raise NotImplementedError('tp>1 with qkv_bias is unsupported')
        idx = jax.lax.axis_index(self.tp_axis)
        ltp = self.query_dim // self.tp
        wq = _DenseKernel(self.query_dim, name='to_q')(x.shape[-1])
        wk = _DenseKernel(self.query_dim, name='to_k')(ctx.shape[-1])
        wv = _DenseKernel(self.query_dim, name='to_v')(ctx.shape[-1])

        def cols(w):
            return jax.lax.dynamic_slice_in_dim(w.astype(self.dtype),
                                                idx * ltp, ltp, axis=1)

        xb, cb = x.astype(self.dtype), ctx.astype(self.dtype)
        q = (xb @ cols(wq)).reshape(B, S, h // self.tp, d).transpose(0, 2, 1, 3)
        k = (cb @ cols(wk)).reshape(B, Sk, h // self.tp, d).transpose(0, 2, 1, 3)
        v = (cb @ cols(wv)).reshape(B, Sk, h // self.tp, d).transpose(0, 2, 1, 3)
        o = attention(q, k, v, bias=bias)
        o = o.transpose(0, 2, 1, 3).reshape(B, S, ltp)
        ko, bo = _DenseParams(self.query_dim, name='to_out')(self.query_dim)
        kol = jax.lax.dynamic_slice_in_dim(ko.astype(self.dtype),
                                           idx * ltp, ltp, axis=0)
        out = jax.lax.psum(o @ kol, self.tp_axis) + bo.astype(self.dtype)
        return out if res is None else out + res

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None,
                 bias: Optional[jnp.ndarray] = None,
                 res: Optional[jnp.ndarray] = None,
                 ln: Optional[tuple] = None) -> jnp.ndarray:
        ctx = x if context is None else context
        if self.tp > 1:
            if ln is not None:
                raise NotImplementedError('tp>1 with HCP_PALLAS_LN fusion '
                                          'is unsupported')
            return self._tp_call(x, ctx, bias, res)
        B, S, _ = x.shape
        Sk = ctx.shape[1]
        h = self.heads
        d = self.query_dim // h
        if ln is not None:
            # LayerNorm fused into the projection prologue (HCP_PALLAS_LN):
            # x arrives UN-normalized; ln = (scale, bias) from _LNParams.
            # eps matches nn.LayerNorm's flax default (1e-6).
            from ..ops.matmul import ln_dense, ln_qkv
            g_ln, b_ln = ln
            wq = _DenseKernel(self.query_dim, name='to_q')(x.shape[-1])
            wk = _DenseKernel(self.query_dim, name='to_k')(ctx.shape[-1])
            wv = _DenseKernel(self.query_dim, name='to_v')(ctx.shape[-1])
            xb = x.astype(self.dtype)
            if context is None:
                q, k, v = ln_qkv(xb, g_ln, b_ln, wq.astype(self.dtype),
                                 wk.astype(self.dtype),
                                 wv.astype(self.dtype), eps=1e-6)
            else:
                q = ln_dense(xb, g_ln, b_ln, wq.astype(self.dtype), eps=1e-6)
                cb = ctx.astype(self.dtype)
                k = cb @ wk.astype(self.dtype)
                v = cb @ wv.astype(self.dtype)
        elif os.environ.get('HCP_FUSED_QKV', '0') == '1' and not self.qkv_bias:
            # one matmul reads x once instead of three times (self-attn), or
            # ctx once for k/v (cross-attn). Measured SLOWER whole-loop on
            # v5e (2.833 vs 2.929 img/s): the fused [B,S,3C] output splits
            # into strided slices XLA materializes as copies, losing more
            # than the saved activation reads. Off by default; kept for
            # re-evaluation at other shapes (HCP_FUSED_QKV=1).
            wq = _DenseKernel(self.query_dim, name='to_q')(x.shape[-1])
            wk = _DenseKernel(self.query_dim, name='to_k')(ctx.shape[-1])
            wv = _DenseKernel(self.query_dim, name='to_v')(ctx.shape[-1])
            if context is None:
                w = jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
                q, k, v = jnp.split(x.astype(self.dtype) @ w, 3, axis=-1)
            else:
                q = x.astype(self.dtype) @ wq.astype(self.dtype)
                wkv = jnp.concatenate([wk, wv], axis=1).astype(self.dtype)
                k, v = jnp.split(ctx.astype(self.dtype) @ wkv, 2, axis=-1)
        elif _int8() and not self.qkv_bias:
            from ..ops.int8 import int8_dense
            wq = _DenseKernel(self.query_dim, name='to_q')(x.shape[-1])
            wk = _DenseKernel(self.query_dim, name='to_k')(ctx.shape[-1])
            wv = _DenseKernel(self.query_dim, name='to_v')(ctx.shape[-1])
            xb = x.astype(self.dtype)
            cb = ctx.astype(self.dtype)
            q = int8_dense(xb, wq)
            k = int8_dense(cb, wk)
            v = int8_dense(cb, wv)
        else:
            ub = self.qkv_bias
            q = _dense(self.query_dim, self.dtype, 'to_q', use_bias=ub)(x)
            k = _dense(self.query_dim, self.dtype, 'to_k', use_bias=ub)(ctx)
            v = _dense(self.query_dim, self.dtype, 'to_v', use_bias=ub)(ctx)
        q = q.reshape(B, S, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(B, Sk, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, Sk, h, d).transpose(0, 2, 1, 3)
        o = attention(q, k, v, bias=bias)
        o = o.transpose(0, 2, 1, 3).reshape(B, S, self.query_dim)
        return _proj_dense(o, self.query_dim, self.dtype, 'to_out', res=res)


class GEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Dtype = jnp.bfloat16
    tp: int = 1                 # tensor parallelism (see UNetConfig.tp)
    tp_axis: str = 'model'

    def _tp_call(self, x, res):
        """Column-parallel GEGLU (this member's inner/tp slice of BOTH the
        value and gate halves of the replicated proj kernel) + row-parallel
        out projection with ONE psum. Param tree identical to tp=1."""
        inner = self.dim * self.mult
        li = inner // self.tp
        idx = jax.lax.axis_index(self.tp_axis)
        k, b = _DenseParams(inner * 2, name='proj')(x.shape[-1])
        kd, bd = k.astype(self.dtype), b.astype(self.dtype)
        # proj kernel columns are [value | gate]; take matching li-slices of
        # each half so the local geglu pairs value_i with gate_i
        kv = jax.lax.dynamic_slice_in_dim(kd, idx * li, li, axis=1)
        kg = jax.lax.dynamic_slice_in_dim(kd, inner + idx * li, li, axis=1)
        bv = jax.lax.dynamic_slice_in_dim(bd, idx * li, li, axis=0)
        bg = jax.lax.dynamic_slice_in_dim(bd, inner + idx * li, li, axis=0)
        xb = x.astype(self.dtype)
        hloc = (xb @ kv + bv) * jax.nn.gelu(xb @ kg + bg, approximate=False)
        ko, bo = _DenseParams(self.dim, name='out')(inner)
        kol = jax.lax.dynamic_slice_in_dim(ko.astype(self.dtype),
                                           idx * li, li, axis=0)
        out = jax.lax.psum(hloc @ kol, self.tp_axis) + bo.astype(self.dtype)
        return out if res is None else out + res

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 res: Optional[jnp.ndarray] = None,
                 ln: Optional[tuple] = None) -> jnp.ndarray:
        if self.tp > 1:
            if ln is not None:
                raise NotImplementedError('tp>1 with HCP_PALLAS_LN fusion '
                                          'is unsupported')
            return self._tp_call(x, res)
        inner = self.dim * self.mult
        if ln is not None:
            # norm3 + GEGLU + out-projection (+ block residual), all Pallas
            from ..ops.matmul import fused_dense, ln_geglu
            g_ln, b_ln = ln
            k, b = _DenseParams(inner * 2, name='proj')(x.shape[-1])
            h = ln_geglu(x.astype(self.dtype), g_ln, b_ln,
                         k.astype(self.dtype), b.astype(self.dtype),
                         eps=1e-6)
            ko, bo = _DenseParams(self.dim, name='out')(h.shape[-1])
            return fused_dense(h, ko.astype(self.dtype),
                               bo.astype(self.dtype), res=res)
        if _int8():
            # int8 GEMMs; the geglu gate runs as a plain XLA elementwise
            # epilogue on the dequantized halves (fused into the dequant).
            from ..ops.int8 import int8_dense
            k, b = _DenseParams(inner * 2, name='proj')(x.shape[-1])
            h = int8_dense(x.astype(self.dtype), k, b)
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * jax.nn.gelu(gate, approximate=False)
            ko, bo = _DenseParams(self.dim, name='out')(h.shape[-1])
            return int8_dense(h, ko, bo, res=res)
        if _pallas_ff() or os.environ.get('HCP_PALLAS_GEGLU', '0') == '1':
            # Both halves through pallas: geglu's h*gelu(gate) fused into the
            # GEMM epilogue (the [.., 2*inner] intermediate never reaches
            # HBM), then the narrow-N out GEMM K-resident (XLA emits it with
            # a transposed {1,2,0} layout at ~38 TF/s vs our ~157 TF/s).
            # Measured 3.06 img/s vs 2.94 XLA vs 2.87 pallas-out-only —
            # splitting the pair reintroduces layout copies at the boundary.
            # The block residual rides the out-GEMM epilogue (res=).
            from ..ops.matmul import fused_dense, geglu_dense
            k, b = _DenseParams(inner * 2, name='proj')(x.shape[-1])
            h = geglu_dense(x.astype(self.dtype), k.astype(self.dtype),
                            b.astype(self.dtype))
            if _pallas_ff():
                ko, bo = _DenseParams(self.dim, name='out')(h.shape[-1])
                return fused_dense(h, ko.astype(self.dtype),
                                   bo.astype(self.dtype), res=res)
            out = _dense(self.dim, self.dtype, 'out')(h)
            return out if res is None else out + res
        h = _dense(inner * 2, self.dtype, 'proj')(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * jax.nn.gelu(gate, approximate=False)
        out = _dense(self.dim, self.dtype, 'out')(h)
        return out if res is None else out + res


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    context_dim: int
    dtype: Dtype = jnp.bfloat16
    qkv_bias: bool = False
    tp: int = 1                 # tensor parallelism (see UNetConfig.tp)
    tp_axis: str = 'model'

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray,
                 context_bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # the LN-fused q/k/v GEMMs are bias-free by construction; biased
        # hosts (pre-0.9 LoRA compat) take the standard path; tp>1 slices
        # kernels at apply time, incompatible with the LN-fused prologues
        if _pallas_ln() and not self.qkv_bias and self.tp == 1:
            # LNs fold into the projection prologues; params declared via
            # _LNParams so the tree matches nn.LayerNorm exactly
            g1, b1 = _LNParams(name='norm1')(self.dim)
            x = CrossAttention(self.dim, self.heads, dtype=self.dtype,
                               name='attn1')(x, res=x, ln=(g1, b1))
            g2, b2 = _LNParams(name='norm2')(self.dim)
            x = CrossAttention(self.dim, self.heads, self.context_dim,
                               dtype=self.dtype,
                               name='attn2')(x, context, bias=context_bias,
                                             res=x, ln=(g2, b2))
            g3, b3 = _LNParams(name='norm3')(self.dim)
            x = GEGLUFeedForward(self.dim, dtype=self.dtype,
                                 name='ff')(x, res=x, ln=(g3, b3))
            return x
        ln = lambda name: nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name=name)
        # block residuals ride the output-projection epilogues (res=):
        # math is identical to `x + sublayer(ln(x))`, but the Pallas-routed
        # projections absorb the add so it never crosses the HBM boundary
        x = CrossAttention(self.dim, self.heads, dtype=self.dtype,
                           qkv_bias=self.qkv_bias, tp=self.tp,
                           tp_axis=self.tp_axis,
                           name='attn1')(ln('norm1')(x), res=x)
        x = CrossAttention(self.dim, self.heads, self.context_dim, dtype=self.dtype,
                           qkv_bias=self.qkv_bias, tp=self.tp,
                           tp_axis=self.tp_axis,
                           name='attn2')(ln('norm2')(x), context,
                                         bias=context_bias, res=x)
        x = GEGLUFeedForward(self.dim, dtype=self.dtype, tp=self.tp,
                             tp_axis=self.tp_axis,
                             name='ff')(ln('norm3')(x), res=x)
        return x


class Transformer2D(nn.Module):
    channels: int
    heads: int
    depth: int
    context_dim: int
    groups: int
    dtype: Dtype = jnp.bfloat16
    qkv_bias: bool = False
    tp: int = 1                 # tensor parallelism (see UNetConfig.tp)
    tp_axis: str = 'model'

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray,
                 context_bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        B, H, W, C = x.shape
        residual = x
        h = GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype, name='norm')(x)
        if _int8():
            from ..ops.int8 import int8_dense
            k, b = _DenseParams(self.channels, name='proj_in')(C)
            h = int8_dense(h.astype(self.dtype), k, b).reshape(B, H * W, C)
        elif _pallas_proj():
            h = _proj_dense(h.reshape(B, H * W, C), self.channels,
                            self.dtype, 'proj_in')
        elif os.environ.get('HCP_TFM_4D', '1') == '1':
            # run proj_in/proj_out on the NHWC tensor so the conv<->sequence
            # relayout happens inside the projection fusion instead of as a
            # standalone reshape copy (measured -93ms on the 20-step loop)
            h = _dense(self.channels, self.dtype, 'proj_in')(h)
            h = h.reshape(B, H * W, C)
        else:
            h = _dense(self.channels, self.dtype, 'proj_in')(h.reshape(B, H * W, C))
        for i in range(self.depth):
            h = BasicTransformerBlock(self.channels, self.heads, self.context_dim,
                                      dtype=self.dtype, qkv_bias=self.qkv_bias,
                                      tp=self.tp, tp_axis=self.tp_axis,
                                      name=f'transformer_blocks_{i}')(h, context, context_bias)
        if _int8():
            from ..ops.int8 import int8_dense
            k, b = _DenseParams(self.channels, name='proj_out')(self.channels)
            h = int8_dense(h.astype(self.dtype), k, b,
                           res=residual.reshape(B, H * W, C))
            return h.reshape(B, H, W, C)
        if _pallas_proj():
            # NHWC->[B,HW,C] reshape is a free contiguous merge, so the
            # spatial residual can ride the proj_out epilogue too
            h = _proj_dense(h, self.channels, self.dtype, 'proj_out',
                            res=residual.reshape(B, H * W, C))
            return h.reshape(B, H, W, C)
        if os.environ.get('HCP_TFM_4D', '1') == '1':
            h = _dense(self.channels, self.dtype, 'proj_out')(h.reshape(B, H, W, C))
            return h + residual
        h = _dense(self.channels, self.dtype, 'proj_out')(h)
        return h.reshape(B, H, W, C) + residual


class Downsample2D(nn.Module):
    channels: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # diffusers pads (0,1,0,1) then uses VALID stride-2 conv
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return _conv(self.channels, 3, self.dtype, 'conv', stride=2, padding='VALID')(x)


class Upsample2D(nn.Module):
    channels: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method='nearest')
        return _conv(self.channels, 3, self.dtype, 'conv')(x)


class UNet2DCondition(nn.Module):
    cfg: UNetConfig
    dtype: Dtype = jnp.bfloat16
    remat: bool = False

    def _maybe_remat(self, cls):
        if not self.remat:
            return cls
        # HCP_REMAT_POLICY=flash (default): selective remat — save the named
        # flash forward outputs (ops/flash_attention.py tags 'flash_out'/
        # 'flash_lse' in its custom_vjp fwd) so the backward pass reuses them
        # instead of re-running the flash forward kernel; everything else in
        # the block still rematerializes. Costs the saved o/lse HBM (~0.4 GB
        # at 512px b8), buys one flash forward per attention per step.
        # Round-5 A/B on-chip: 39.43 vs 37.33 samples/s (+5.6%) at the 512px
        # LoRA bench. HCP_REMAT_POLICY=full restores whole-block remat (the
        # escape hatch if the saved activations don't fit).
        if os.environ.get('HCP_REMAT_POLICY', 'flash') == 'flash':
            policy = jax.checkpoint_policies.save_only_these_names(
                'flash_out', 'flash_lse')
            return nn.remat(cls, policy=policy)
        return nn.remat(cls)

    @nn.compact
    def __call__(self, sample: jnp.ndarray, timesteps: jnp.ndarray,
                 encoder_hidden_states: jnp.ndarray,
                 pooled_text_emb: Optional[jnp.ndarray] = None,
                 time_ids: Optional[jnp.ndarray] = None,
                 encoder_attention_mask: Optional[jnp.ndarray] = None,
                 down_residuals: Optional[Sequence[jnp.ndarray]] = None,
                 mid_residual: Optional[jnp.ndarray] = None,
                 deep_cache: Optional[jnp.ndarray] = None,
                 return_deep: bool = False):
        """Standard full forward, plus the DeepCache protocol (arXiv
        2312.00858-style; retrieved as PAPERS.md 'Cache Me if You Can'):

        - ``return_deep=True``: also return the deep feature entering the
          LAST up level (after the previous level's upsample) — everything
          below the shallowest resolution summarized in one tensor.
        - ``deep_cache=<that tensor>``: recompute ONLY the shallowest down
          level and the last up level, splicing the cached deep feature in
          place of levels >= 1 + mid. Temporal redundancy of deep UNet
          features across denoise steps makes this nearly lossless for
          small reuse intervals (opt-in, changes outputs — see
          docs/en/performance.md).

        Both modes keep the exact same param tree as the full pass."""
        c = self.cfg
        Res = self._maybe_remat(ResnetBlock2D)
        Tfm = self._maybe_remat(Transformer2D)
        if getattr(c, 'tp', 1) > 1:
            Tfm = functools.partial(Tfm, tp=c.tp, tp_axis=c.tp_axis)

        ctx = encoder_hidden_states.astype(self.dtype)
        ctx_bias = None
        if encoder_attention_mask is not None:
            neg = jnp.finfo(jnp.float32).min
            ctx_bias = jnp.where(encoder_attention_mask[:, None, None, :].astype(bool),
                                 0.0, neg)

        # --- time embedding (fp32 trig, cast after the MLP) ---
        tdim = c.block_out_channels[0] * 4
        if jnp.ndim(timesteps) == 0:
            timesteps = jnp.full((sample.shape[0],), timesteps)
        temb = timestep_embedding(timesteps, c.block_out_channels[0])
        temb = _dense(tdim, jnp.float32, 'time_embedding_linear_1')(temb)
        temb = _dense(tdim, jnp.float32, 'time_embedding_linear_2')(jax.nn.silu(temb))

        if c.addition_embed_type == 'text_time':
            assert pooled_text_emb is not None and time_ids is not None, \
                'SDXL needs pooled_text_emb and time_ids'
            t_emb = timestep_embedding(time_ids.reshape(-1), c.addition_time_embed_dim)
            t_emb = t_emb.reshape(sample.shape[0], -1)
            add = jnp.concatenate([pooled_text_emb.astype(jnp.float32), t_emb], axis=-1)
            add = _dense(tdim, jnp.float32, 'add_embedding_linear_1')(add)
            add = _dense(tdim, jnp.float32, 'add_embedding_linear_2')(jax.nn.silu(add))
            temb = temb + add
        temb = temb.astype(self.dtype)

        x = sample.astype(self.dtype)
        x = _conv(c.block_out_channels[0], 3, self.dtype, 'conv_in')(x)

        shallow_only = deep_cache is not None
        if shallow_only and (down_residuals is not None
                             or mid_residual is not None):
            # a real error, not an assert: under `python -O` an assert
            # would be stripped and reuse steps would silently drop the
            # ControlNet conditioning (taps live in the deep branch)
            raise ValueError(
                'deep_cache is incompatible with ControlNet residual taps')

        # --- down blocks ---
        skips = [x]
        n_blocks = len(c.block_out_channels)
        for bi, (btype, out_c) in enumerate(zip(c.down_block_types, c.block_out_channels)):
            if shallow_only and bi > 0:
                break
            for li in range(c.layers_per_block):
                x = Res(out_c, c.norm_num_groups, dtype=self.dtype,
                        name=f'down_{bi}_res_{li}')(x, temb)
                if btype == 'CrossAttnDownBlock2D':
                    x = Tfm(out_c, c.num_heads[bi],
                            c.transformer_layers_per_block[bi],
                            c.cross_attention_dim, c.norm_num_groups,
                            dtype=self.dtype, qkv_bias=c.qkv_bias,
                            name=f'down_{bi}_attn_{li}')(x, ctx, ctx_bias)
                skips.append(x)
            if bi < n_blocks - 1 and not shallow_only:
                x = Downsample2D(out_c, dtype=self.dtype, name=f'down_{bi}_downsample')(x)
                skips.append(x)

        rev_channels = list(reversed(c.block_out_channels))
        deep_out = None
        if not shallow_only:
            # ControlNet taps: residuals added to every skip + mid
            if down_residuals is not None:
                skips = [s + r.astype(s.dtype) for s, r in zip(skips, down_residuals)]
                x = skips[-1] if len(down_residuals) == len(skips) else x

            # --- mid ---
            mid_c = c.block_out_channels[-1]
            x = Res(mid_c, c.norm_num_groups, dtype=self.dtype, name='mid_res_0')(x, temb)
            if c.mid_cross_attn:
                x = Tfm(mid_c, c.num_heads[-1],
                        c.transformer_layers_per_block[-1],
                        c.cross_attention_dim, c.norm_num_groups,
                        dtype=self.dtype, qkv_bias=c.qkv_bias,
                        name='mid_attn')(x, ctx, ctx_bias)
            x = Res(mid_c, c.norm_num_groups, dtype=self.dtype, name='mid_res_1')(x, temb)
            if mid_residual is not None:
                x = x + mid_residual.astype(x.dtype)

            # --- deep up blocks (all but the last level) ---
            for bi, btype in enumerate(c.up_block_types[:-1]):
                out_c = rev_channels[bi]
                for li in range(c.layers_per_block + 1):
                    skip = skips.pop()
                    x = jnp.concatenate([x, skip], axis=-1)
                    x = Res(out_c, c.norm_num_groups, dtype=self.dtype,
                            name=f'up_{bi}_res_{li}')(x, temb)
                    if btype == 'CrossAttnUpBlock2D':
                        x = Tfm(out_c, c.num_heads[len(rev_channels) - 1 - bi],
                                c.transformer_layers_per_block[len(rev_channels) - 1 - bi],
                                c.cross_attention_dim, c.norm_num_groups,
                                dtype=self.dtype, qkv_bias=c.qkv_bias,
                                name=f'up_{bi}_attn_{li}')(x, ctx, ctx_bias)
                x = Upsample2D(out_c, dtype=self.dtype, name=f'up_{bi}_upsample')(x)
            deep_out = x
        else:
            x = deep_cache.astype(self.dtype)

        # --- last up level (always recomputed; consumes the level-0 skips) ---
        bi = len(c.up_block_types) - 1
        btype = c.up_block_types[bi]
        out_c = rev_channels[bi]
        for li in range(c.layers_per_block + 1):
            skip = skips.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = Res(out_c, c.norm_num_groups, dtype=self.dtype,
                    name=f'up_{bi}_res_{li}')(x, temb)
            if btype == 'CrossAttnUpBlock2D':
                x = Tfm(out_c, c.num_heads[len(rev_channels) - 1 - bi],
                        c.transformer_layers_per_block[len(rev_channels) - 1 - bi],
                        c.cross_attention_dim, c.norm_num_groups,
                        dtype=self.dtype, qkv_bias=c.qkv_bias,
                        name=f'up_{bi}_attn_{li}')(x, ctx, ctx_bias)

        x = GroupNorm(c.norm_num_groups, dtype=self.dtype, fused_silu=True,
                      name='conv_norm_out')(x)
        x = _conv(c.out_channels, 3, self.dtype, 'conv_out')(x)
        out = x.astype(jnp.float32)
        if return_deep:
            return out, deep_out
        return out
