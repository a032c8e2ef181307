"""LoRA format converter CLI (reference tools/lora_convert.py:9-246):
ours/HCP ``.___.``-keyed safetensors <-> kohya/webui ``lora_unet_*`` format.

usage:
  python -m hcpdiff_tpu.tools.lora_convert --to_webui --lora_path unet.safetensors \
      [--lora_path_TE te.safetensors] --dump_path out.safetensors
  python -m hcpdiff_tpu.tools.lora_convert --from_webui --lora_path kohya.safetensors \
      --dump_path out_dir/ [--sdxl]
"""
from __future__ import annotations

import argparse
import os
from typing import Dict, Optional

import numpy as np

from ..ckpt.formats import (kohya_to_overlay, load_safetensors,
                            lora_overlay_to_state, lora_state_to_overlay,
                            overlay_to_kohya, save_safetensors, unfold_dict,
                            fold_dict)
from ..ckpt.manager import auto_manager
from ..models.factory import unet_alias_map, clip_alias_map
from ..models.unet import UNetConfig
from ..models.clip import CLIPTextConfig


def hcp_to_webui(unet_path: Optional[str], te_path: Optional[str],
                 dump_path: str, sdxl: bool = False) -> None:
    out: Dict[str, np.ndarray] = {}
    ucfg = UNetConfig.sdxl() if sdxl else UNetConfig.sd15()
    if unet_path:
        ck = auto_manager(unet_path).load_ckpt(unet_path)
        overlay = ck.get('lora', {})
        out.update(overlay_to_kohya(overlay, unet_alias_map(ucfg), 'lora_unet'))
    if te_path:
        ck = auto_manager(te_path).load_ckpt(te_path)
        overlay = ck.get('lora', {})
        tcfg = CLIPTextConfig.sd15()
        prefix = 'lora_te1' if sdxl else 'lora_te'
        out.update(overlay_to_kohya(overlay, clip_alias_map(tcfg), prefix))
    save_safetensors(out, dump_path)


def webui_to_hcp(lora_path: str, dump_dir: str, sdxl: bool = False) -> None:
    sd = load_safetensors(lora_path)
    ucfg = UNetConfig.sdxl() if sdxl else UNetConfig.sd15()
    flax_paths_u = {v: k for k, v in unet_alias_map(ucfg).items()}
    overlay_u = kohya_to_overlay(sd, flax_paths_u, 'lora_unet')
    os.makedirs(dump_dir, exist_ok=True)
    if overlay_u:
        auto_manager('.safetensors').save_model_with_lora(
            os.path.join(dump_dir, 'unet.safetensors'), lora_overlay=overlay_u)
    tcfg = CLIPTextConfig.sd15()
    flax_paths_t = {v: k for k, v in clip_alias_map(tcfg).items()}
    for prefix, name in (('lora_te', 'text_encoder'), ('lora_te1', 'text_encoder'),
                         ('lora_te2', 'text_encoder_2')):
        overlay_t = kohya_to_overlay(sd, flax_paths_t, prefix)
        if overlay_t:
            auto_manager('.safetensors').save_model_with_lora(
                os.path.join(dump_dir, f'{name}.safetensors'),
                lora_overlay=overlay_t)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--to_webui', action='store_true')
    p.add_argument('--from_webui', action='store_true')
    p.add_argument('--lora_path', required=True)
    p.add_argument('--lora_path_TE', default=None)
    p.add_argument('--dump_path', required=True)
    p.add_argument('--sdxl', action='store_true')
    a = p.parse_args()
    if a.to_webui:
        hcp_to_webui(a.lora_path, a.lora_path_TE, a.dump_path, a.sdxl)
    elif a.from_webui:
        webui_to_hcp(a.lora_path, a.dump_path, a.sdxl)
    else:
        raise SystemExit('specify --to_webui or --from_webui')


if __name__ == '__main__':
    main()
