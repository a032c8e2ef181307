"""Checkpoint managers (reference hcpdiff/ckpt_manager/*).

Two interchange backends with the reference's ckpt dict layout
``{base, base_ema, lora, lora_ema, plugin, plugin_ema}``
(reference ckpt_pkl.py:22-138):

- CkptManagerSafe: safetensors with ':'-folded keys (ckpt_safetensor.py)
- CkptManagerPKL: torch-pickle .ckpt (torch is host-side only here)

plus OrbaxCkptManager: full TrainState (params + optimizer + step) for
real resume — a strict improvement over the reference, which restores
weights only (SURVEY.md §5.4).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from .formats import (PLACEHOLDER, fold_dict, load_safetensors,
                      lora_overlay_to_state, lora_state_to_overlay,
                      save_safetensors, save_webui_embedding, unfold_dict)


def _to_numpy_tree(tree):
    import jax
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CkptManagerBase:
    ext = '.safetensors'

    def __init__(self, ckpt_dir: Optional[str] = None, **kw):
        self.ckpt_dir = ckpt_dir

    def set_save_dir(self, d: str):
        self.ckpt_dir = d
        os.makedirs(d, exist_ok=True)

    # --- serialization backend (flat str->ndarray dict) ---
    def _write(self, flat: Dict[str, np.ndarray], path: str):
        raise NotImplementedError

    def _read(self, path: str) -> Dict[str, np.ndarray]:
        raise NotImplementedError

    # --- reference-layout save/load ---
    def save_model_with_lora(self, path: str, base: Optional[dict] = None,
                             lora_overlay: Optional[dict] = None,
                             base_ema: Optional[dict] = None,
                             lora_ema: Optional[dict] = None,
                             plugin: Optional[dict] = None,
                             plugin_ema: Optional[dict] = None,
                             host_prefix: str = '',
                             aliases: Optional[Dict[str, str]] = None,
                             conv_shapes: Optional[Dict[str, tuple]] = None
                             ) -> None:
        """``aliases`` ({flax: torch module path}) makes saved keys match
        the reference's diffusers naming for interop."""
        ckpt: Dict[str, Any] = {}
        if base:
            ckpt['base'] = _to_numpy_tree(base)
        if base_ema:
            ckpt['base_ema'] = _to_numpy_tree(base_ema)
        if lora_overlay:
            ckpt['lora'] = lora_overlay_to_state(_to_numpy_tree(lora_overlay),
                                                 host_prefix, aliases,
                                                 conv_shapes)
        if lora_ema:
            ckpt['lora_ema'] = lora_overlay_to_state(_to_numpy_tree(lora_ema),
                                                     host_prefix, aliases,
                                                     conv_shapes)
        if plugin:
            ckpt['plugin'] = _to_numpy_tree(plugin)
        if plugin_ema:
            ckpt['plugin_ema'] = _to_numpy_tree(plugin_ema)
        self._write(unfold_dict(ckpt), path)

    def load_ckpt(self, path: str,
                  aliases: Optional[Dict[str, str]] = None) -> Dict[str, Any]:
        nested = fold_dict(self._read(path))
        out: Dict[str, Any] = dict(nested)
        for k in ('lora', 'lora_ema'):
            if k in nested:
                # refold the .___.-keyed flat lora state
                flat = unfold_dict(nested[k], sep=':')
                flat = {kk.replace(':', '.'): v for kk, v in flat.items()}
                out[k] = lora_state_to_overlay(flat, aliases=aliases)
        return out

    def save_plugins(self, path: str, plugins: Dict[str, dict]) -> None:
        """plugin states saved with erased names (``.___.`` scheme)."""
        sd = {}
        for host, state in plugins.items():
            for pkey, v in unfold_dict(state).items():
                sd[f'{host}{PLACEHOLDER}{pkey.replace(":", ".")}'] = np.asarray(v)
        self._write(sd, path)

    def load_plugins(self, path: str, unet_cfg=None) -> Dict[str, Any]:
        """-> {plugin_slot: nested param tree} from a ``.___.``-keyed plugin
        ckpt (reference load_plugin semantics, cfg_net_tools.py:294-315).
        webui ControlNet ckpts ('control_model.*' keys) are converted via
        ldm_convert.controlnet_ldm_to_ours for drop-in interop."""
        flat = self._read(path)
        grouped: Dict[str, Dict[str, np.ndarray]] = {}
        for k, v in flat.items():
            if PLACEHOLDER not in k:
                continue
            host, pkey = k.split(PLACEHOLDER, 1)
            grouped.setdefault(host, {})[pkey.replace('.', ':')] = v
        if not grouped and any(k.startswith('control_model.') for k in flat):
            from .ldm_convert import controlnet_ldm_to_ours
            return {'controlnet1': controlnet_ldm_to_ours(flat, unet_cfg)}
        return {h: fold_dict(d, sep=':') for h, d in grouped.items()}

    def save_embedding(self, path: str, vectors, name: str,
                       step: Optional[int] = None) -> None:
        save_webui_embedding(path, np.asarray(vectors), name, step)


class CkptManagerSafe(CkptManagerBase):
    ext = '.safetensors'

    def _write(self, flat, path):
        save_safetensors(flat, path)

    def _read(self, path):
        return load_safetensors(path)


class CkptManagerPKL(CkptManagerBase):
    """torch-pickle .ckpt interchange (reference ckpt_pkl.py)."""
    ext = '.ckpt'

    def _write(self, flat, path):
        import torch
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        torch.save({k: torch.tensor(np.ascontiguousarray(v)) for k, v in flat.items()}, path)

    def _read(self, path):
        import torch
        obj = torch.load(path, map_location='cpu', weights_only=False)
        return {k: (v.detach().cpu().numpy() if hasattr(v, 'detach') else np.asarray(v))
                for k, v in obj.items()}


class CkptManagerDiffusers(CkptManagerSafe):
    """Save a merged model as a diffusers-layout directory
    (reference ckpt_manager/ckpt_diffusers.py)."""

    def save_pipeline(self, out_dir: str, unet_params, unet_cfg,
                      vae_params=None, vae_cfg=None,
                      te_params=None, te_num_layers: int = 12,
                      te_cfg=None) -> None:
        import dataclasses
        import json
        from .sd_convert import (unet_params_to_torch, vae_params_to_torch,
                                 clip_params_to_torch)
        from .formats import save_safetensors

        def write(sub, sd, cfg_dict, fname):
            d = os.path.join(out_dir, sub)
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, 'config.json'), 'w') as f:
                json.dump(cfg_dict, f, indent=2)
            save_safetensors({k: np.asarray(v) for k, v in sd.items()},
                             os.path.join(d, fname))

        ucfg_d = dataclasses.asdict(unet_cfg)
        ucfg_d['_class_name'] = 'UNet2DConditionModel'
        ucfg_d['attention_head_dim'] = list(unet_cfg.num_heads)
        write('unet', unet_params_to_torch(_to_numpy_tree(unet_params), unet_cfg),
              ucfg_d, 'diffusion_pytorch_model.safetensors')
        if vae_params is not None and vae_cfg is not None:
            vcfg_d = dataclasses.asdict(vae_cfg)
            vcfg_d['_class_name'] = 'AutoencoderKL'
            write('vae', vae_params_to_torch(_to_numpy_tree(vae_params), vae_cfg),
                  vcfg_d, 'diffusion_pytorch_model.safetensors')
        if te_params is not None:
            if te_cfg is not None:
                te_num_layers = te_cfg.num_hidden_layers
                tcfg_d = dataclasses.asdict(te_cfg)
                tcfg_d['architectures'] = ['CLIPTextModel']
            else:
                tcfg_d = {'architectures': ['CLIPTextModel'],
                          'num_hidden_layers': te_num_layers}
            write('text_encoder',
                  clip_params_to_torch(_to_numpy_tree(te_params), te_num_layers),
                  tcfg_d, 'model.safetensors')


class CkptManagerWebui(CkptManagerSafe):
    """Load a webui/LDM single-file checkpoint into our params
    (reference ckpt_manager/ckpt_webui.py)."""

    @staticmethod
    def load_webui_parts(path: str) -> Dict[str, Dict[str, np.ndarray]]:
        from .ldm_convert import split_ldm_checkpoint
        if path.endswith('.safetensors'):
            from .formats import load_safetensors
            sd = load_safetensors(path)
        else:
            import torch
            obj = torch.load(path, map_location='cpu', weights_only=False)
            sd = {k: v.detach().cpu().numpy()
                  for k, v in obj.get('state_dict', obj).items()
                  if hasattr(v, 'detach')}
        return split_ldm_checkpoint(sd)


def auto_manager(path_or_ext: str) -> CkptManagerBase:
    """Extension dispatch (reference ckpt_manager/__init__.py:4)."""
    ext = os.path.splitext(path_or_ext)[1] or path_or_ext
    if 'safetensors' in ext:
        return CkptManagerSafe()
    return CkptManagerPKL()


class OrbaxCkptManager:
    """Full train-state checkpointing for resume (orbax)."""

    def __init__(self, ckpt_dir: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp
        self.dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.dir, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.dir, options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, step: int, state: Any) -> None:
        import orbax.checkpoint as ocp
        self.mngr.save(step, args=ocp.args.StandardSave(state))
        self.mngr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        import orbax.checkpoint as ocp
        step = step if step is not None else self.mngr.latest_step()
        if template is not None:
            return self.mngr.restore(step, args=ocp.args.StandardRestore(template))
        return self.mngr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()
