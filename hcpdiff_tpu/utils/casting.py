"""Memory-safe dtype casts for SDXL-scale param pytrees.

A whole-tree ``jax.jit(cast, donate_argnums=0)`` cannot alias fp32
buffers to their bf16 outputs (donation needs matching byte sizes), so
both trees are live during the cast — at SDXL-training scale that is
~13.6G fp32 + ~6.8G bf16 > a 16G v5e, and the failure surfaces
ASYNCHRONOUSLY at the next sync point (dispatch is async), which makes
it look like an unrelated trace-time error. Casting in bounded-size
groups with per-group donation frees each fp32 group as its convert
completes, so the peak overhead is one group (default 512MB).
"""
import jax
import jax.numpy as jnp

__all__ = ['cast_tree_bf16']

_GROUP_BYTES = 512 * 1024 * 1024


def cast_tree_bf16(tree, group_bytes: int = _GROUP_BYTES):
    """fp32 leaves -> bf16 in donated groups of <= group_bytes (peak HBM
    overhead = one group); non-fp32 leaves pass through untouched."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    idx = [i for i, x in enumerate(leaves)
           if getattr(x, 'dtype', None) == jnp.float32]
    cast = jax.jit(lambda xs: [x.astype(jnp.bfloat16) for x in xs],
                   donate_argnums=0)
    group, size = [], 0
    for i in idx:
        group.append(i)
        size += leaves[i].size * 4
        if size >= group_bytes:
            for j, y in zip(group, cast([leaves[j] for j in group])):
                leaves[j] = y
            group, size = [], 0
    if group:
        for j, y in zip(group, cast([leaves[j] for j in group])):
            leaves[j] = y
    return jax.tree_util.tree_unflatten(treedef, leaves)
