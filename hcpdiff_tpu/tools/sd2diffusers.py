"""webui/LDM single-file checkpoint -> diffusers-layout directory
(reference tools/sd2diffusers.py).

usage:
  python -m hcpdiff_tpu.tools.sd2diffusers --checkpoint_path sd15.safetensors \
      --dump_path models/my-sd --original_config_file v1-inference.yaml
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Dict

import numpy as np

from ..ckpt.formats import load_safetensors, save_safetensors
from ..ckpt.ldm_convert import split_ldm_checkpoint

SD15_UNET_CONFIG = {
    '_class_name': 'UNet2DConditionModel',
    'in_channels': 4, 'out_channels': 4,
    'block_out_channels': [320, 640, 1280, 1280],
    'down_block_types': ['CrossAttnDownBlock2D', 'CrossAttnDownBlock2D',
                         'CrossAttnDownBlock2D', 'DownBlock2D'],
    'up_block_types': ['UpBlock2D', 'CrossAttnUpBlock2D',
                       'CrossAttnUpBlock2D', 'CrossAttnUpBlock2D'],
    'layers_per_block': 2, 'cross_attention_dim': 768,
    'attention_head_dim': 8, 'norm_num_groups': 32, 'sample_size': 64,
}
SD_VAE_CONFIG = {
    '_class_name': 'AutoencoderKL',
    'in_channels': 3, 'out_channels': 3, 'latent_channels': 4,
    'block_out_channels': [128, 256, 512, 512], 'layers_per_block': 2,
    'norm_num_groups': 32, 'scaling_factor': 0.18215,
}
SD15_TE_CONFIG = {
    'architectures': ['CLIPTextModel'], 'vocab_size': 49408,
    'hidden_size': 768, 'intermediate_size': 3072, 'num_hidden_layers': 12,
    'num_attention_heads': 12, 'max_position_embeddings': 77,
    'hidden_act': 'quick_gelu', 'bos_token_id': 49406, 'eos_token_id': 49407,
}


def _load_any(path: str) -> Dict[str, np.ndarray]:
    if path.endswith('.safetensors'):
        return load_safetensors(path)
    import torch
    obj = torch.load(path, map_location='cpu', weights_only=False)
    sd = obj.get('state_dict', obj)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, 'detach')}


def convert(checkpoint_path: str, dump_path: str) -> None:
    sd = _load_any(checkpoint_path)
    parts = split_ldm_checkpoint(sd)
    for sub, cfg in (('unet', SD15_UNET_CONFIG), ('vae', SD_VAE_CONFIG),
                     ('text_encoder', SD15_TE_CONFIG)):
        d = os.path.join(dump_path, sub)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, 'config.json'), 'w') as f:
            json.dump(cfg, f, indent=2)
        fname = ('diffusion_pytorch_model.safetensors' if sub != 'text_encoder'
                 else 'model.safetensors')
        save_safetensors(parts[sub], os.path.join(d, fname))
    print(f'wrote diffusers layout to {dump_path}')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--checkpoint_path', required=True)
    p.add_argument('--dump_path', required=True)
    p.add_argument('--original_config_file', default=None)  # accepted, unused
    p.add_argument('--vae_path', default=None)
    a = p.parse_args()
    convert(a.checkpoint_path, a.dump_path)


if __name__ == '__main__':
    main()
