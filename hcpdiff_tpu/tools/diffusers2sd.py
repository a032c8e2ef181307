"""diffusers-layout directory -> webui/LDM single-file checkpoint
(reference tools/diffusers2sd.py).

usage:
  python -m hcpdiff_tpu.tools.diffusers2sd --model_path models/my-sd \
      --checkpoint_path out/model.safetensors
"""
from __future__ import annotations

import argparse
import os
from typing import Dict

import numpy as np

from ..ckpt.formats import save_safetensors
from ..ckpt.ldm_convert import (TE_LDM_PREFIX, unet_diffusers_to_ldm,
                                vae_diffusers_to_ldm)
from ..models.factory import _load_torch_sd


def convert(model_path: str, checkpoint_path: str) -> None:
    out: Dict[str, np.ndarray] = {}
    out.update(unet_diffusers_to_ldm(_load_torch_sd(os.path.join(model_path, 'unet'))))
    out.update(vae_diffusers_to_ldm(_load_torch_sd(os.path.join(model_path, 'vae'))))
    te = _load_torch_sd(os.path.join(model_path, 'text_encoder'))
    out.update({TE_LDM_PREFIX + k: v for k, v in te.items()})
    if checkpoint_path.endswith('.safetensors'):
        save_safetensors(out, checkpoint_path)
    else:
        import torch
        torch.save({'state_dict': {k: torch.tensor(np.ascontiguousarray(v))
                                   for k, v in out.items()}}, checkpoint_path)
    print(f'wrote {checkpoint_path}')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--model_path', required=True)
    p.add_argument('--checkpoint_path', required=True)
    a = p.parse_args()
    convert(a.model_path, a.checkpoint_path)


if __name__ == '__main__':
    main()
