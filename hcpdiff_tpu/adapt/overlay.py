"""Parameter-overlay engine — the TPU-native replacement for the reference's
plugin/hook kernel (hcpdiff/models/plugin.py) and LoRA patch containers
(hcpdiff/models/lora_base_patch.py:20-195).

Core idea (SURVEY.md §7): adapters are *separate pytrees overlaid on the base
params*. The model's apply function receives ``merge_overlays(params, loras)``
— one functional transform, fully jit-fusable; "collapse to host"
(reparameterization_to_host) is literally the same merge saved back.

Layer targeting reproduces the reference selector semantics
(hcpdiff/utils/cfg_net_tools.py:24-75): ``re:<regex>`` patterns, exact
paths, and class filters map onto flattened param-pytree paths.
"""
from __future__ import annotations

import math
import re
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PathDict = Dict[str, Any]


# ---------------------------------------------------------------- paths ----

def flatten_params(params: Any) -> Dict[str, jnp.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for kp, v in flat:
        key = '.'.join(getattr(k, 'key', str(getattr(k, 'idx', k))) for k in kp)
        out[key] = v
    return out


def module_paths(params: Any) -> List[str]:
    """All module paths that look like a Dense/Conv (have a 'kernel' leaf)."""
    return sorted({k[:-len('.kernel')] for k in flatten_params(params)
                   if k.endswith('.kernel')})


def _ancestors(path: str) -> List[str]:
    parts = path.split('.')
    return ['.'.join(parts[:i]) for i in range(1, len(parts) + 1)]


def get_match_layers(patterns: Iterable[str], candidates: Sequence[str],
                     aliases: Optional[Dict[str, str]] = None) -> List[str]:
    """Resolve config layer patterns -> ordered unique kernel-module paths.

    Reference-selector parity (hcpdiff/utils/cfg_net_tools.py:24-75 +
    WrapablePlugin.wrap_model plugin.py:60-105):
    - ``re:<regex>``: regex search over module paths AND their ancestors;
      a hit on a parent module (e.g. ``re:.*\\.ff$``) expands to every
      kernel-bearing (Linear/Conv) descendant — matching the reference's
      "wrap every wrapable child" behavior.
    - plain string: exact/prefix match, same expansion.
    - ``aliases``: {flax_path: reference_torch_path}; patterns written
      against the reference's diffusers module names (all shipped yamls)
      match through the alias, so reference configs run unmodified
      (SURVEY.md §7 hard part 3).
    """
    if isinstance(patterns, str):
        patterns = [patterns]
    aliases = aliases or {}
    # every name (flax + alias) that can match, mapped back to kernel paths
    name_to_kernels: Dict[str, List[str]] = {}
    for c in candidates:
        names = set(_ancestors(c))
        alias = aliases.get(c)
        if alias:
            names.update(_ancestors(alias))
        for n in names:
            name_to_kernels.setdefault(n, []).append(c)
    all_names = sorted(name_to_kernels)

    out: List[str] = []
    for pat in patterns:
        if pat.startswith('pre_hook:'):
            pat = pat[len('pre_hook:'):]
        if pat.startswith('re:'):
            rx = re.compile(pat[3:])
            hit_names = [n for n in all_names if rx.search(n)]
        else:
            hit_names = [n for n in all_names if n == pat]
            if not hit_names:
                hit_names = [n for n in all_names if n.startswith(pat + '.')]
        for n in hit_names:
            for k in name_to_kernels[n]:
                if k not in out:
                    out.append(k)
    return out


def _get_path(tree: Any, path: str) -> Any:
    node = tree
    for part in path.split('.'):
        node = node[part]
    return node


def _set_path(tree: dict, path: str, value: Any) -> None:
    parts = path.split('.')
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


# ----------------------------------------------------------------- LoRA ----

def init_lora_layer(rng: jax.Array, kernel_shape: Tuple[int, ...], rank: int,
                    alpha: float = 1.0) -> Dict[str, jnp.ndarray]:
    """LoRA factors for a Dense [in,out] or Conv [kh,kw,in,out] kernel.

    down: [fan_in, r] kaiming-uniform, up: [r, out] zeros (reference
    hcpdiff/models/lora_layers_patch.py:21-60) so ΔW starts at 0.
    """
    if len(kernel_shape) == 2:
        fan_in, fan_out = kernel_shape
    elif len(kernel_shape) == 4:
        kh, kw, cin, fan_out = kernel_shape
        fan_in = kh * kw * cin
    else:
        raise ValueError(f'unsupported kernel shape {kernel_shape}')
    bound = math.sqrt(3.0) * math.sqrt(2.0) / math.sqrt(fan_in)  # kaiming a=sqrt(5) ~ gain sqrt(2)/...
    down = jax.random.uniform(rng, (fan_in, rank), jnp.float32, -bound, bound)
    up = jnp.zeros((rank, fan_out), jnp.float32)
    return {'down': down, 'up': up, 'alpha': jnp.asarray(alpha, jnp.float32)}


def resolve_rank(rank, fan_out: int) -> int:
    """float rank = fraction of out_features (reference lora_base_patch.py
    dim semantics); int rank used as-is."""
    if isinstance(rank, float) and rank < 1.0:
        return max(1, round(fan_out * rank))
    return int(rank)


def make_lora_overlay(rng: jax.Array, params: Any, layer_specs: Sequence[dict],
                      candidates: Optional[Sequence[str]] = None,
                      aliases: Optional[Dict[str, str]] = None
                      ) -> Tuple[PathDict, Dict[str, float]]:
    """Build a LoRA overlay pytree from config specs.

    Each spec: {layers: [...], rank: int|float, alpha: float, scale: float}
    (mirrors cfgs lora_unet/lora_text_encoder items,
    reference hcpdiff/utils/cfg_net_tools.py:90-128).
    Returns (overlay pytree {path: {down, up, alpha}}, {path: scale}).
    """
    candidates = candidates or module_paths(params)
    overlay: PathDict = {}
    scales: Dict[str, float] = {}
    for spec in layer_specs:
        layers = get_match_layers(spec.get('layers', []), candidates, aliases)
        rank = spec.get('rank', 8)
        alpha = float(spec.get('alpha', 1.0))
        scale = float(spec.get('scale', 1.0))
        for lp in layers:
            kshape = _get_path(params, lp)['kernel'].shape
            r = resolve_rank(rank, kshape[-1])
            rng, sub = jax.random.split(rng)
            overlay[lp] = init_lora_layer(sub, kshape, r, alpha)
            scales[lp] = scale
    return overlay, scales


def lora_delta(entry: Dict[str, jnp.ndarray], kernel_shape: Tuple[int, ...],
               scale: float | jnp.ndarray = 1.0) -> jnp.ndarray:
    """ΔW = scale * (alpha/rank) * down @ up, reshaped to the kernel layout."""
    down, up, alpha = entry['down'], entry['up'], entry['alpha']
    rank = down.shape[-1]
    delta = (down @ up) * (alpha / rank) * scale
    return delta.reshape(kernel_shape)


def merge_overlays(params: Any, overlays: Sequence[PathDict],
                   scales: Optional[Sequence[Dict[str, Any]]] = None) -> Any:
    """W_eff = W + Σ_i ΔW_i — weight-merged compute, ONE matmul per layer at
    runtime, exactly the reference's LoraPatchContainer strategy
    (hcpdiff/models/lora_base_patch.py:20-35) and ideal for the MXU.

    Stacked overlays on one layer sum. Pure function of pytrees: safe and
    cheap inside jit (XLA fuses the rank-r matmuls; they're negligible next
    to the conv/matmul they feed).
    """
    if not overlays:
        return params
    scales = scales or [{}] * len(overlays)
    merged = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy

    def copy_on_write(tree, path):
        parts = path.split('.')
        node = tree
        for p in parts:
            parent = node
            child = dict(node[p]) if isinstance(node[p], dict) else node[p]
            parent[p] = child
            node = child
        return node

    merged = _deep_dict(merged)
    for ov, sc in zip(overlays, scales):
        for path, entry in ov.items():
            leaf = copy_on_write(merged, path)
            k = leaf['kernel']
            s = sc.get(path, 1.0) if isinstance(sc, dict) else sc
            leaf['kernel'] = k + lora_delta(entry, k.shape, s).astype(k.dtype)
            if 'bias' in entry:
                # pre-0.9 reference LoRA layers carry an up-projection bias
                # (tools/convert_old_lora.py:9-10); it adds to the host bias
                # with the same alpha/rank/scale factor as the kernel delta
                if 'bias' not in leaf:
                    # flax silently IGNORES params the module does not
                    # declare, so synthesizing a bias here would silently
                    # drop the delta. The supported path (matching the
                    # reference's reparameterization_to_host creating the
                    # host bias, lora_base_patch.py:150-170) is to rebuild
                    # the host with declared biases first — the Visualizer
                    # does this automatically via attach_host_biases +
                    # UNetConfig(qkv_bias=True).
                    raise ValueError(
                        f'LoRA at {path!r} has a bias but the host layer is '
                        'bias-free (SD attention projections are '
                        'use_bias=False). Rebuild the host with '
                        'UNetConfig(qkv_bias=True) + attach_host_biases() '
                        '(the Visualizer merge path does this '
                        'automatically), or strip the bias with '
                        'strip_overlay_bias(...) to apply the kernel-only '
                        'part.')
                rank = entry['down'].shape[-1]
                db = entry['bias'] * (entry['alpha'] / rank) * s
                leaf['bias'] = leaf['bias'] + db.astype(leaf['bias'].dtype)
    return merged


def attach_host_biases(params: Any, paths: Iterable[str]) -> Any:
    """Create zero host biases at the given kernel-module paths — the
    functional analog of the reference's ``reparameterization_to_host``
    creating ``host.bias`` when collapsing a biased LoRA into a bias-free
    layer (hcpdiff/models/lora_base_patch.py:150-170). The caller must
    also rebuild the host module so it READS the bias (our flax UNet:
    ``UNetConfig(qkv_bias=True)``) — flax silently ignores params the
    module does not declare."""
    out = _deep_dict(params)
    for path in paths:
        leaf = _get_path(out, path)
        if 'bias' in leaf:
            continue
        k = leaf['kernel']
        leaf['bias'] = jnp.zeros((k.shape[-1],), k.dtype)
    return out


def overlay_bias_paths(overlays: Sequence[PathDict], params: Any) -> List[str]:
    """Paths where an overlay carries a bias delta but the host params
    have no bias leaf (pre-0.9 reference biased LoRAs onto SD's bias-free
    attention projections)."""
    out: List[str] = []
    for ov in overlays:
        for path, entry in ov.items():
            if 'bias' in entry and path not in out:
                try:
                    host = _get_path(params, path)
                except (KeyError, TypeError):
                    continue
                if 'bias' not in host:
                    out.append(path)
    return out


def strip_overlay_bias(overlay: PathDict, warn: bool = True) -> PathDict:
    """Drop bias deltas from a (pre-0.9 reference format) LoRA overlay so it
    can be merged into bias-free hosts. The kernel deltas are kept intact;
    see merge_overlays for why the bias cannot be attached."""
    out = {}
    dropped = []
    for path, entry in overlay.items():
        if 'bias' in entry:
            entry = {k: v for k, v in entry.items() if k != 'bias'}
            dropped.append(path)
        out[path] = entry
    if dropped and warn:
        import warnings
        warnings.warn(
            f'stripped LoRA bias deltas at {len(dropped)} layers '
            f'({dropped[:3]}...) — bias-free hosts cannot represent them',
            stacklevel=2)
    return out


def _deep_dict(tree: Any) -> Any:
    if isinstance(tree, dict):
        return {k: _deep_dict(v) for k, v in tree.items()}
    return tree


def collapse_overlay(params: Any, overlay: PathDict,
                     scales: Optional[Dict[str, float]] = None) -> Any:
    """reparameterization_to_host (reference lora_base_patch.py:120-140):
    permanently fold ΔW into the base weights."""
    return merge_overlays(params, [overlay], [scales or {}])


# ----------------------------------------------------- trainable masking ----

def trainable_mask(params: Any, train_patterns: Sequence[str],
                   aliases: Optional[Dict[str, str]] = None) -> Any:
    """Boolean pytree: True where the param is trainable (layer-wise
    fine-tune config, reference cfg_net_tools make_hcpdiff 'train' items)."""
    candidates = module_paths(params)
    selected = set(get_match_layers(train_patterns, candidates, aliases))
    flat = flatten_params(params)
    mask_flat = {}
    for key in flat:
        mod = key.rsplit('.', 1)[0]
        mask_flat[key] = any(mod == s or mod.startswith(s + '.') or mod in selected
                             for s in selected)
    out: dict = {}
    for key, v in mask_flat.items():
        _set_path(out, key, v)
    return out
