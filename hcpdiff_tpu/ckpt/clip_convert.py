"""transformers CLIPTextModel state_dict  ->  hcpdiff_tpu flax params.

Key-map converter (torch [out,in] Dense weights transpose to flax [in,out]).
Accepts both numpy arrays and torch tensors as values.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _np(v: Any) -> np.ndarray:
    if hasattr(v, 'detach'):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def clip_text_torch_to_params(sd: Dict[str, Any], num_layers: int) -> Dict[str, Any]:
    """Convert a transformers CLIPTextModel(.text_model) state_dict."""
    # strip optional prefixes
    pref = ''
    for p in ('text_model.', 'transformer.text_model.'):
        if any(k.startswith(p) for k in sd):
            pref = p
            break
    g = lambda k: _np(sd[pref + k])

    params: Dict[str, Any] = {
        'token_embedding': g('embeddings.token_embedding.weight'),
        'position_embedding': g('embeddings.position_embedding.weight'),
        'final_layer_norm': {'scale': g('final_layer_norm.weight'),
                             'bias': g('final_layer_norm.bias')},
    }
    for i in range(num_layers):
        lp = f'encoder.layers.{i}.'
        layer = {
            'layer_norm1': {'scale': g(lp + 'layer_norm1.weight'),
                            'bias': g(lp + 'layer_norm1.bias')},
            'layer_norm2': {'scale': g(lp + 'layer_norm2.weight'),
                            'bias': g(lp + 'layer_norm2.bias')},
            'self_attn': {},
            'fc1': {'kernel': g(lp + 'mlp.fc1.weight').T,
                    'bias': g(lp + 'mlp.fc1.bias')},
            'fc2': {'kernel': g(lp + 'mlp.fc2.weight').T,
                    'bias': g(lp + 'mlp.fc2.bias')},
        }
        for proj in ('q_proj', 'k_proj', 'v_proj', 'out_proj'):
            layer['self_attn'][proj] = {
                'kernel': g(lp + f'self_attn.{proj}.weight').T,
                'bias': g(lp + f'self_attn.{proj}.bias'),
            }
        params[f'layers_{i}'] = layer
    tp = pref + '..' if False else None
    for key in ('text_projection.weight',):
        full = key if key in sd else (pref + key if pref + key in sd else None)
        if full is not None:
            params['text_projection'] = {'kernel': _np(sd[full]).T}
    return params
