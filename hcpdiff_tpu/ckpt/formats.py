"""Checkpoint dict formats — bit-compatible with the reference's layouts
(SURVEY.md §7 hard part 1).

- nested<->flat fold/unfold with ':'-joined keys for safetensors
  (reference ckpt_manager/ckpt_safetensor.py:17-63)
- the ``.___.`` plugin/LoRA key scheme: state keys are
  ``<host_layer_path>.___.<param_path>`` with the plugin name erased for
  portability (reference models/plugin.py:317-348 PluginGroup.state_dict)
- webui embedding format: {'string_to_param': {'*': tensor}, 'name': ...}
  (reference utils/net_utils.py:145-170 load_emb/save_emb)
- kohya/webui LoRA key conversion incl. alpha rescale
  (reference tools/lora_convert.py:9-246)
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

SEP = ':'
PLACEHOLDER = '.___.'


# ---------------------------------------------------------- fold/unfold ----

def unfold_dict(nested: Dict[str, Any], sep: str = SEP) -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f'{prefix}{sep}{k}' if prefix else str(k))
        else:
            flat[prefix] = np.ascontiguousarray(np.asarray(node))

    walk(nested, '')
    return flat


def fold_dict(flat: Dict[str, Any], sep: str = SEP) -> Dict[str, Any]:
    nested: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split(sep)
        node = nested
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(v)
    return nested


# ----------------------------------------------------- safetensors io ----

def save_safetensors(flat: Dict[str, np.ndarray], path: str,
                     metadata: Optional[Dict[str, str]] = None) -> None:
    from safetensors.numpy import save_file
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in flat.items()}, path,
              metadata=metadata)


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file
    return load_file(path)


# ---------------------------------------------------- lora <-> hcp keys ----

def lora_overlay_to_state(overlay: Dict[str, dict], host_prefix: str = '',
                          aliases: Optional[Dict[str, str]] = None,
                          conv_shapes: Optional[Dict[str, tuple]] = None
                          ) -> Dict[str, np.ndarray]:
    """Our overlay {layer_path: {down, up, alpha}} -> reference-style state
    dict with ``.___.`` placeholder keys.

    - keys: flax paths map to the reference's diffusers module paths when
      ``aliases`` ({flax: torch}) is given — saved checkpoints then
      interchange with reference tooling.
    - tensors: dense W_down [r, in], W_up [out, r] (ours are transposed);
      conv LoRA exports 4-D OIHW-style factors (W_down [r, cin, kh, kw],
      W_up [out, r, 1, 1]) matching the reference conv-LoRA layout.
      ``conv_shapes``: {flax_path: (kh, kw, cin, cout)} for conv hosts
      (from the host model's kernel shapes).
    """
    aliases = aliases or {}
    conv_shapes = conv_shapes or {}
    sd: Dict[str, np.ndarray] = {}
    for path, entry in overlay.items():
        host = aliases.get(path, path)
        host = (host_prefix + host) if host_prefix else host
        down = np.asarray(entry['down'])   # [fan_in, r]
        up = np.asarray(entry['up'])       # [r, out]
        kshape = conv_shapes.get(path)
        if kshape is not None and len(kshape) == 4:
            kh, kw, cin, _ = kshape
            r = down.shape[-1]
            # [kh*kw*cin, r] -> [r, cin, kh, kw]
            down_t = down.reshape(kh, kw, cin, r).transpose(3, 2, 0, 1)
            up_t = up.T[:, :, None, None]   # [out, r, 1, 1]
        else:
            down_t, up_t = down.T, up.T
        sd[f'{host}{PLACEHOLDER}layer.W_down'] = np.ascontiguousarray(down_t)
        sd[f'{host}{PLACEHOLDER}layer.W_up'] = np.ascontiguousarray(up_t)
        sd[f'{host}{PLACEHOLDER}alpha'] = np.asarray(entry['alpha'], np.float32)
        if 'bias' in entry:   # reference layer.bias (convert_old_lora.py:9-10)
            sd[f'{host}{PLACEHOLDER}layer.bias'] = np.asarray(entry['bias'])
    return sd


def lora_state_to_overlay(sd: Dict[str, np.ndarray], host_prefix: str = '',
                          aliases: Optional[Dict[str, str]] = None
                          ) -> Dict[str, dict]:
    """Inverse; ``aliases`` = {flax: torch} (reversed internally).

    Accepts both the current reference layout (``layer.W_down``/``W_up``/
    ``layer.bias``) and the pre-0.9 one (``layer.lora_down.weight``/
    ``layer.lora_up.weight``/``layer.lora_up.bias``) — the rename the
    reference ships as tools/convert_old_lora.py:4-13; tensor layouts are
    identical between the two."""
    rev = {v: k for k, v in (aliases or {}).items()}
    overlay: Dict[str, dict] = {}
    for key, v in sd.items():
        if PLACEHOLDER not in key:
            continue
        host, param = key.split(PLACEHOLDER, 1)
        if host_prefix:
            if not host.startswith(host_prefix):
                continue
            host = host[len(host_prefix):]
        host = rev.get(host, host)
        e = overlay.setdefault(host, {})
        v = np.asarray(v)
        if param.endswith('W_down') or param.endswith('lora_down.weight'):
            if v.ndim == 4:   # conv: [r, cin, kh, kw] -> [kh*kw*cin, r]
                r, cin, kh, kw = v.shape
                e['down'] = np.ascontiguousarray(
                    v.transpose(2, 3, 1, 0).reshape(kh * kw * cin, r))
            else:
                e['down'] = v.T
        elif param.endswith('W_up') or param.endswith('lora_up.weight'):
            if v.ndim == 4:   # [out, r, 1, 1]
                e['up'] = np.ascontiguousarray(v[:, :, 0, 0].T)
            else:
                e['up'] = v.T
        elif param.endswith('alpha'):
            e['alpha'] = np.asarray(v, np.float32).reshape(())
        elif param.endswith('bias'):   # layer.bias / layer.lora_up.bias
            e['bias'] = v.reshape(-1)
    for host, e in overlay.items():
        e.setdefault('alpha', np.asarray(1.0, np.float32))
    return overlay


# ------------------------------------------------------ webui embedding ----

def save_webui_embedding(path: str, vectors: np.ndarray, name: str,
                         step: Optional[int] = None) -> None:
    """webui .pt format via torch (reference net_utils.py save_emb)."""
    import torch
    obj = {'string_to_param': {'*': torch.tensor(np.asarray(vectors))},
           'name': name, 'step': step}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(obj, path)


def load_webui_embedding(path: str) -> Tuple[str, np.ndarray]:
    import torch
    try:
        # tensors-only unpickler: no arbitrary-code deserialization
        obj = torch.load(path, map_location='cpu', weights_only=True)
    except Exception:
        # legacy webui .pt files can carry non-tensor metadata classes;
        # only fall back when explicitly allowed (local trusted files)
        if os.environ.get('HCP_UNSAFE_PICKLE') != '1':
            raise ValueError(
                f'{path}: not loadable with weights_only=True; set '
                'HCP_UNSAFE_PICKLE=1 to allow full pickle for trusted files')
        obj = torch.load(path, map_location='cpu', weights_only=False)
    if 'string_to_param' in obj:
        t = obj['string_to_param']['*']
        name = obj.get('name') or os.path.splitext(os.path.basename(path))[0]
    elif 'emb_params' in obj:
        t = obj['emb_params']
        name = os.path.splitext(os.path.basename(path))[0]
    else:  # bare tensor
        t = obj
        name = os.path.splitext(os.path.basename(path))[0]
    return name, t.detach().cpu().float().numpy()


# -------------------------------------------------- kohya/webui LoRA ----

def _kohya_module_name(layer_path: str, prefix: str) -> str:
    """our flax layer path -> kohya module name (diffusers torch path with
    dots->underscores, 'lora_unet_' / 'lora_te_' prefix)."""
    return prefix + layer_path.replace('.', '_')


def overlay_to_kohya(overlay: Dict[str, dict], torch_paths: Dict[str, str],
                     prefix: str = 'lora_unet',
                     conv_shapes: Optional[Dict[str, tuple]] = None
                     ) -> Dict[str, np.ndarray]:
    """overlay + {flax_path: torch_module_path} -> kohya-format state dict
    (lora_down.weight [r,in] (or [r,cin,kh,kw] for conv), lora_up.weight
    [out,r] (or [out,r,1,1]), alpha)."""
    conv_shapes = conv_shapes or {}
    sd: Dict[str, np.ndarray] = {}
    biased = [p for p, e in overlay.items() if 'bias' in e]
    if biased:
        # the kohya layout has no bias slot (lora_down/lora_up/alpha only);
        # exporting would silently drop part of the adapter
        raise ValueError(
            'overlay_to_kohya: kohya format cannot represent LoRA bias '
            f'deltas (pre-0.9 reference layers) present at {biased[:3]}; '
            'export with lora_overlay_to_state (HCP format) instead, or '
            'strip the biases explicitly first')
    for path, entry in overlay.items():
        tp = torch_paths.get(path, path)
        base = f'{prefix}_{tp.replace(".", "_")}'
        down = np.asarray(entry['down'])
        up = np.asarray(entry['up'])
        ks = conv_shapes.get(path)
        if ks is not None and len(ks) == 4:
            kh, kw, cin, _ = ks
            r = down.shape[-1]
            sd[f'{base}.lora_down.weight'] = np.ascontiguousarray(
                down.reshape(kh, kw, cin, r).transpose(3, 2, 0, 1))
            sd[f'{base}.lora_up.weight'] = np.ascontiguousarray(
                up.T[:, :, None, None])
        else:
            sd[f'{base}.lora_down.weight'] = down.T
            sd[f'{base}.lora_up.weight'] = up.T
        sd[f'{base}.alpha'] = np.asarray(entry['alpha'], np.float32)
    return sd


def kohya_to_overlay(sd: Dict[str, np.ndarray], flax_paths: Dict[str, str],
                     prefix: str = 'lora_unet') -> Dict[str, dict]:
    """Inverse: kohya keys -> overlay using {torch_module_path: flax_path}."""
    tmp: Dict[str, dict] = {}
    for key, v in sd.items():
        if not key.startswith(prefix + '_'):
            continue
        rest = key[len(prefix) + 1:]
        for suffix, field in (('.lora_down.weight', 'down'),
                              ('.lora_up.weight', 'up'), ('.alpha', 'alpha')):
            if rest.endswith(suffix):
                mod = rest[:-len(suffix)]
                e = tmp.setdefault(mod, {})
                e[field] = np.asarray(v)
    out: Dict[str, dict] = {}
    und2torch = {tp.replace('.', '_'): fp for tp, fp in flax_paths.items()}
    for mod, e in tmp.items():
        fp = und2torch.get(mod)
        if fp is None:
            continue
        down, up = e['down'], e['up']
        if down.ndim == 4:   # conv lora
            r, cin, kh, kw = down.shape
            down = np.ascontiguousarray(
                down.transpose(2, 3, 1, 0).reshape(kh * kw * cin, r))
            up = np.ascontiguousarray(up[:, :, 0, 0].T)
        else:
            down, up = down.T, up.T
        entry = {'down': down, 'up': up,
                 'alpha': np.asarray(e.get('alpha', down.shape[-1]),
                                     np.float32).reshape(())}
        out[fp] = entry
    return out
