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
SD2_UNET_CONFIG = dict(SD15_UNET_CONFIG, cross_attention_dim=1024,
                       attention_head_dim=[5, 10, 20, 20], sample_size=96)
SD2_TE_CONFIG = dict(SD15_TE_CONFIG, hidden_size=1024,
                     intermediate_size=4096, num_hidden_layers=23,
                     num_attention_heads=16, hidden_act='gelu')


def _load_any(path: str) -> Dict[str, np.ndarray]:
    if path.endswith('.safetensors'):
        return load_safetensors(path)
    import torch
    obj = torch.load(path, map_location='cpu', weights_only=False)
    sd = obj.get('state_dict', obj)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, 'detach')}


def convert_vae_only(vae_pt_path: str, dump_path: str) -> None:
    """Standalone VAE .pt/.safetensors -> diffusers vae dir (reference
    sd_vae_to_diffuser, tools/sd2diffusers.py:195-209)."""
    from ..ckpt.ldm_convert import vae_ldm_to_diffusers
    sd = _load_any(vae_pt_path)
    # standalone vae files may or may not carry the first_stage prefix
    if not any(k.startswith('first_stage_model.') for k in sd):
        sd = {'first_stage_model.' + k: v for k, v in sd.items()}
    os.makedirs(dump_path, exist_ok=True)
    with open(os.path.join(dump_path, 'config.json'), 'w') as f:
        json.dump(SD_VAE_CONFIG, f, indent=2)
    save_safetensors(vae_ldm_to_diffusers(sd),
                     os.path.join(dump_path,
                                  'diffusion_pytorch_model.safetensors'))
    print(f'wrote diffusers vae to {dump_path}')


def convert(checkpoint_path: str, dump_path: str, half: bool = False,
            prediction_type: str = None) -> None:
    from ..ckpt.ldm_convert import is_sd2_checkpoint
    sd = _load_any(checkpoint_path)
    sd2 = is_sd2_checkpoint(sd)
    parts = split_ldm_checkpoint(sd)
    if half:
        parts = {s_: {k: v.astype(np.float16) for k, v in d.items()}
                 for s_, d in parts.items()}
    unet_cfg = SD2_UNET_CONFIG if sd2 else SD15_UNET_CONFIG
    te_cfg = SD2_TE_CONFIG if sd2 else SD15_TE_CONFIG
    # minimal scheduler + index so the directory is a loadable pipeline
    sched = {'_class_name': 'DDIMScheduler', 'beta_start': 0.00085,
             'beta_end': 0.012, 'beta_schedule': 'scaled_linear',
             'num_train_timesteps': 1000, 'steps_offset': 1,
             'prediction_type': prediction_type
             or ('v_prediction' if sd2 else 'epsilon')}
    os.makedirs(os.path.join(dump_path, 'scheduler'), exist_ok=True)
    with open(os.path.join(dump_path, 'scheduler',
                           'scheduler_config.json'), 'w') as f:
        json.dump(sched, f, indent=2)
    with open(os.path.join(dump_path, 'model_index.json'), 'w') as f:
        json.dump({'_class_name': 'StableDiffusionPipeline',
                   'unet': ['diffusers', 'UNet2DConditionModel'],
                   'vae': ['diffusers', 'AutoencoderKL'],
                   'text_encoder': ['transformers', 'CLIPTextModel'],
                   'scheduler': ['diffusers', sched['_class_name']]},
                  f, indent=2)
    for sub, cfg in (('unet', unet_cfg), ('vae', SD_VAE_CONFIG),
                     ('text_encoder', te_cfg)):
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
    p.add_argument('--checkpoint_path', default=None)
    p.add_argument('--dump_path', required=True)
    p.add_argument('--original_config_file', default=None)  # accepted, unused
    p.add_argument('--vae_path', default=None)
    p.add_argument('--vae_pt_path', default=None,
                   help='convert a standalone VAE instead of a full ckpt')
    p.add_argument('--half', action='store_true')
    p.add_argument('--prediction_type', default=None,
                   choices=[None, 'epsilon', 'v_prediction'])
    a = p.parse_args()
    if a.vae_pt_path:
        convert_vae_only(a.vae_pt_path, a.dump_path)
        return
    assert a.checkpoint_path, '--checkpoint_path or --vae_pt_path required'
    convert(a.checkpoint_path, a.dump_path, half=a.half,
            prediction_type=a.prediction_type)


if __name__ == '__main__':
    main()
