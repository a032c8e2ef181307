"""Assemble effective model params from (frozen base, trainable pack).

The trainable pack is a flat dict of adaptation pytrees — the functional
equivalent of the reference's param_groups built by make_hcpdiff
(hcpdiff/utils/cfg_net_tools.py:90-225):

    'unet_ft'       subset of unet params (layer-wise fine-tune)
    'te_ft'         subset of text-encoder params
    'lora_unet'     LoRA overlay {path: {down, up, alpha}}
    'lora_te'       LoRA overlay on the TE
    'lora_unet_neg' / 'lora_te_neg'   DreamArtist negative-branch overlays
    'emb'           prompt-tuning embedding extension rows [n_ext, D]
    'emb_neg'       DreamArtist negative embeddings

``assemble`` merges: base (stop-gradient) <- ft subsets <- lora deltas.
Gradients then flow ONLY into the pack. Pure function — safe under jit,
and XLA fuses the rank-r delta matmuls into nothing measurable.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..adapt.overlay import merge_overlays


def merge_subset(full: Any, subset: Any) -> Any:
    """Deep-merge trained leaves over the (stop-gradient) base tree."""
    if isinstance(full, dict):
        out = {}
        for k, v in full.items():
            if isinstance(subset, dict) and k in subset:
                out[k] = merge_subset(v, subset[k])
            else:
                out[k] = v
        return out
    return subset  # leaf present in subset -> trained value wins


def extract_subset(full: Any, mask: Any) -> Any:
    """Pull the True-masked leaves out of a full tree into a subset tree."""
    if isinstance(mask, dict):
        out = {}
        for k, m in mask.items():
            sub = extract_subset(full[k], m)
            if sub is not None:
                out[k] = sub
        return out or None
    return full if mask else None


def assemble(frozen_unet: Any, frozen_te: Any, pack: Dict[str, Any],
             lora_scales: Optional[Dict[str, Dict[str, float]]] = None,
             branch: str = 'pos') -> Tuple[Any, Any, Optional[jnp.ndarray]]:
    """-> (unet_params_eff, te_params_eff, emb_ext or None).

    ``branch``: 'pos' uses lora_unet/lora_te/emb; 'neg' uses the *_neg
    overlays (DreamArtist dual-branch, reference
    hcpdiff/models/lora_layers_patch.py:102-133 DAPPPatchContainer).
    """
    lora_scales = lora_scales or {}
    sg = jax.lax.stop_gradient
    unet_p = sg(frozen_unet)
    te_p = sg(frozen_te)

    if 'unet_ft' in pack:
        unet_p = merge_subset(unet_p, pack['unet_ft'])
    if 'te_ft' in pack:
        te_p = merge_subset(te_p, pack['te_ft'])

    suffix = '' if branch == 'pos' else '_neg'
    lu = pack.get('lora_unet' + suffix)
    if lu:
        unet_p = merge_overlays(unet_p, [lu], [lora_scales.get('lora_unet' + suffix, {})])
    lt = pack.get('lora_te' + suffix)
    if lt:
        te_p = merge_overlays(te_p, [lt], [lora_scales.get('lora_te' + suffix, {})])

    emb_key = 'emb' + suffix
    emb_ext = pack.get(emb_key, pack.get('emb'))
    return unet_p, te_p, emb_ext


def assemble_te2(frozen_te2: Any, pack: Dict[str, Any],
                 lora_scales: Optional[Dict[str, Dict[str, float]]] = None,
                 branch: str = 'pos') -> Any:
    """SDXL second text encoder: base <- te2_ft <- lora_te2 (the composed-TE
    half of reference SDXLTextEncoder training, models/compose/*)."""
    lora_scales = lora_scales or {}
    te2 = jax.lax.stop_gradient(frozen_te2)
    if 'te2_ft' in pack:
        te2 = merge_subset(te2, pack['te2_ft'])
    suffix = '' if branch == 'pos' else '_neg'
    lt = pack.get('lora_te2' + suffix)
    if lt:
        te2 = merge_overlays(te2, [lt],
                             [lora_scales.get('lora_te2' + suffix, {})])
    return te2
