"""Tensor-parallel (+ data-parallel) multi-chip INFERENCE for the UNet.

Beyond-reference: the torch reference serves on one GPU (its accelerate
integration covers training only, reference train_ac.py; visualizer.py is
single-device). Here a ('data','model') mesh scales the denoise step:

- 'data'  — batch parallelism (the CFG-doubled batch splits across it);
  zero communication, the throughput axis.
- 'model' — Megatron-style tensor parallelism inside every transformer
  sublayer (models/unet.py CrossAttention._tp_call / GEGLUFeedForward
  ._tp_call): q/k/v and the GEGLU proj are column-parallel (each member
  computes heads/tp heads and inner/tp FF columns), to_out and ff.out are
  row-parallel, and XLA rides ONE psum per sublayer over ICI. The latency
  axis: it shrinks time-to-first-image when the batch can't grow.

Design choice — replicate-and-slice, not resharded checkpoints: SD-scale
UNet weights (0.9–5 GB) are small next to activations, so every member
holds the full param tree (standard checkpoints, LoRA overlays, and layer
selectors keep working unchanged) and slices its kernel shard at apply
time via ``lax.axis_index``. Convs/norms/time-embedding are replicated
compute — the transformer interior dominates at SD/SDXL shapes (S^2
attention + 4x FF), so TP still cuts the step critical path; a spatial
(H-sharded) conv axis is a possible later extension.

Typical use::

    mesh = make_tp_mesh(tp=4, data=2)                 # 8 chips
    unet = UNet2DCondition(dataclasses.replace(cfg, tp=4), dtype=...)
    apply_fn = tp_unet_apply(unet, mesh)
    pipe = DiffusionPipeline(unet_apply=apply_fn, ...)  # batch % 2 == 0
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8 top-level, older under experimental
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ['make_tp_mesh', 'tp_unet_apply', 'tp_unet_config']


def make_tp_mesh(tp: int, data: int = -1,
                 devices: Optional[Sequence] = None) -> Mesh:
    """('data', 'model') mesh; data=-1 fills the remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        data = n // tp
    if data * tp != n:
        raise ValueError(f'mesh {data}x{tp} != {n} devices')
    return Mesh(np.asarray(devices).reshape(data, tp), ('data', 'model'))


def tp_unet_config(cfg, tp: int):
    """UNetConfig with tensor parallelism degree ``tp``; validates the
    per-level head counts divide (SD1.5: 8 heads everywhere -> tp in
    {2,4,8}; SDXL: (5,10,20) -> tp in {5,...}; SD2.1: (5,10,20,20))."""
    bad = [h for h in cfg.num_heads if h % tp]
    if bad:
        raise ValueError(
            f'tp={tp} does not divide num_heads={cfg.num_heads}; '
            f'choose tp from the common divisors of {set(cfg.num_heads)}')
    return dataclasses.replace(cfg, tp=tp)


def tp_unet_apply(model, mesh: Mesh, data_axis: str = 'data',
                  tp_axis: str = 'model'):
    """shard_map-wrapped ``model.apply`` over a ('data','model') mesh.

    Returns ``fn(params, sample, t, ctx, **extras)`` with the same
    signature as a plain ``model.apply`` partial (extras: pooled_text_emb,
    time_ids, encoder_attention_mask — anything batch-leading). Params are
    replicated; every array argument is batch-sharded over ``data_axis``;
    the batch must divide the data-axis size. The result is a global
    batch-sharded array, safe to feed the DenoiseLoop/DiffusionPipeline.
    """
    if model.cfg.tp != mesh.shape[tp_axis]:
        raise ValueError(
            f'model cfg.tp={model.cfg.tp} != mesh {tp_axis} axis size '
            f'{mesh.shape[tp_axis]}')
    if model.cfg.tp_axis != tp_axis:
        raise ValueError(f'cfg.tp_axis={model.cfg.tp_axis} != {tp_axis!r}')

    def fn(params, sample, t, ctx, **extras):
        names = tuple(sorted(extras))
        vals = tuple(extras[k] for k in names)

        def body(params, sample, t, ctx, *vals):
            kw = dict(zip(names, vals))
            return model.apply({'params': params}, sample, t, ctx, **kw)

        n_arr = 3 + len(vals)
        wrapped = shard_map(
            body, mesh=mesh,
            in_specs=(P(),) + (P(data_axis),) * n_arr,
            out_specs=P(data_axis),
            check_vma=False)
        return wrapped(params, sample, t, ctx, *vals)

    return fn
