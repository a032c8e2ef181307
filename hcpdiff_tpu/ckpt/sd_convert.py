"""Bidirectional weight converters: diffusers-torch state_dict <-> our flax
params (UNet / VAE / CLIP).

Used to load real SD1.5/SD2.x/SDXL checkpoints (diffusers layout) into the
TPU models and to export back — the interop surface the reference gets from
diffusers + its own tools/sd2diffusers.py / tools/diffusers2sd.py (C57).
Layout rules: torch Linear [out,in] -> flax kernel [in,out] (transpose);
torch Conv OIHW -> flax HWIO (transpose 2,3,1,0); GroupNorm/LayerNorm
weight/bias -> scale/bias.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

from ..models.unet import UNetConfig
from ..models.vae import VAEConfig


def _np(v):
    if hasattr(v, 'detach'):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


# map builders return [(torch_prefix, flax_path, kind)] where kind in
# {'linear','conv','norm'}; suffixes are appended per kind.

def _unet_key_map(cfg: UNetConfig) -> List[Tuple[str, str, str]]:
    m: List[Tuple[str, str, str]] = [
        ('conv_in', 'conv_in', 'conv'),
        ('time_embedding.linear_1', 'time_embedding_linear_1', 'linear'),
        ('time_embedding.linear_2', 'time_embedding_linear_2', 'linear'),
        ('conv_norm_out', 'conv_norm_out', 'norm'),
        ('conv_out', 'conv_out', 'conv'),
    ]
    if cfg.addition_embed_type == 'text_time':
        m += [('add_embedding.linear_1', 'add_embedding_linear_1', 'linear'),
              ('add_embedding.linear_2', 'add_embedding_linear_2', 'linear')]

    def resnet(tp, fp):
        return [(f'{tp}.norm1', f'{fp}.norm1', 'norm'),
                (f'{tp}.conv1', f'{fp}.conv1', 'conv'),
                (f'{tp}.time_emb_proj', f'{fp}.time_emb_proj', 'linear'),
                (f'{tp}.norm2', f'{fp}.norm2', 'norm'),
                (f'{tp}.conv2', f'{fp}.conv2', 'conv'),
                (f'{tp}.conv_shortcut', f'{fp}.conv_shortcut', 'conv')]

    def transformer(tp, fp, depth):
        out = [(f'{tp}.norm', f'{fp}.norm', 'norm'),
               (f'{tp}.proj_in', f'{fp}.proj_in', 'linear_or_conv1x1'),
               (f'{tp}.proj_out', f'{fp}.proj_out', 'linear_or_conv1x1')]
        for k in range(depth):
            b, fb = f'{tp}.transformer_blocks.{k}', f'{fp}.transformer_blocks_{k}'
            for a in ('attn1', 'attn2'):
                out += [(f'{b}.{a}.to_q', f'{fb}.{a}.to_q', 'linear'),
                        (f'{b}.{a}.to_k', f'{fb}.{a}.to_k', 'linear'),
                        (f'{b}.{a}.to_v', f'{fb}.{a}.to_v', 'linear'),
                        (f'{b}.{a}.to_out.0', f'{fb}.{a}.to_out', 'linear')]
            out += [(f'{b}.ff.net.0.proj', f'{fb}.ff.proj', 'linear'),
                    (f'{b}.ff.net.2', f'{fb}.ff.out', 'linear'),
                    (f'{b}.norm1', f'{fb}.norm1', 'norm'),
                    (f'{b}.norm2', f'{fb}.norm2', 'norm'),
                    (f'{b}.norm3', f'{fb}.norm3', 'norm')]
        return out

    n_blocks = len(cfg.block_out_channels)
    for bi, btype in enumerate(cfg.down_block_types):
        for li in range(cfg.layers_per_block):
            m += resnet(f'down_blocks.{bi}.resnets.{li}', f'down_{bi}_res_{li}')
            if btype == 'CrossAttnDownBlock2D':
                m += transformer(f'down_blocks.{bi}.attentions.{li}',
                                 f'down_{bi}_attn_{li}',
                                 cfg.transformer_layers_per_block[bi])
        if bi < n_blocks - 1:
            m += [(f'down_blocks.{bi}.downsamplers.0.conv',
                   f'down_{bi}_downsample.conv', 'conv')]

    m += resnet('mid_block.resnets.0', 'mid_res_0')
    if cfg.mid_cross_attn:
        m += transformer('mid_block.attentions.0', 'mid_attn',
                         cfg.transformer_layers_per_block[-1])
    m += resnet('mid_block.resnets.1', 'mid_res_1')

    rev = list(reversed(range(n_blocks)))
    for bi, btype in enumerate(cfg.up_block_types):
        for li in range(cfg.layers_per_block + 1):
            m += resnet(f'up_blocks.{bi}.resnets.{li}', f'up_{bi}_res_{li}')
            if btype == 'CrossAttnUpBlock2D':
                m += transformer(f'up_blocks.{bi}.attentions.{li}',
                                 f'up_{bi}_attn_{li}',
                                 cfg.transformer_layers_per_block[rev[bi]])
        if bi < len(cfg.up_block_types) - 1:
            m += [(f'up_blocks.{bi}.upsamplers.0.conv',
                   f'up_{bi}_upsample.conv', 'conv')]
    return m


def _vae_key_map(cfg: VAEConfig) -> List[Tuple[str, str, str]]:
    def resnet(tp, fp):
        return [(f'{tp}.norm1', f'{fp}.norm1', 'norm'),
                (f'{tp}.conv1', f'{fp}.conv1', 'conv'),
                (f'{tp}.norm2', f'{fp}.norm2', 'norm'),
                (f'{tp}.conv2', f'{fp}.conv2', 'conv'),
                (f'{tp}.conv_shortcut', f'{fp}.conv_shortcut', 'conv')]

    def attn(tp, fp):
        return [(f'{tp}.group_norm', f'{fp}.group_norm', 'norm'),
                (f'{tp}.to_q', f'{fp}.to_q', 'linear'),
                (f'{tp}.to_k', f'{fp}.to_k', 'linear'),
                (f'{tp}.to_v', f'{fp}.to_v', 'linear'),
                (f'{tp}.to_out.0', f'{fp}.to_out', 'linear')]

    m: List[Tuple[str, str, str]] = [
        ('encoder.conv_in', 'encoder.conv_in', 'conv'),
        ('encoder.conv_norm_out', 'encoder.conv_norm_out', 'norm'),
        ('encoder.conv_out', 'encoder.conv_out', 'conv'),
        ('decoder.conv_in', 'decoder.conv_in', 'conv'),
        ('decoder.conv_norm_out', 'decoder.conv_norm_out', 'norm'),
        ('decoder.conv_out', 'decoder.conv_out', 'conv'),
        ('quant_conv', 'quant_conv', 'conv'),
        ('post_quant_conv', 'post_quant_conv', 'conv'),
    ]
    n = len(cfg.block_out_channels)
    for bi in range(n):
        for li in range(cfg.layers_per_block):
            m += resnet(f'encoder.down_blocks.{bi}.resnets.{li}',
                        f'encoder.down_{bi}_res_{li}')
        if bi < n - 1:
            m += [(f'encoder.down_blocks.{bi}.downsamplers.0.conv',
                   f'encoder.down_{bi}_downsample', 'conv')]
    m += resnet('encoder.mid_block.resnets.0', 'encoder.mid_res_0')
    m += attn('encoder.mid_block.attentions.0', 'encoder.mid_attn')
    m += resnet('encoder.mid_block.resnets.1', 'encoder.mid_res_1')
    m += resnet('decoder.mid_block.resnets.0', 'decoder.mid_res_0')
    m += attn('decoder.mid_block.attentions.0', 'decoder.mid_attn')
    m += resnet('decoder.mid_block.resnets.1', 'decoder.mid_res_1')
    for bi in range(n):
        for li in range(cfg.layers_per_block + 1):
            m += resnet(f'decoder.up_blocks.{bi}.resnets.{li}',
                        f'decoder.up_{bi}_res_{li}')
        if bi < n - 1:
            m += [(f'decoder.up_blocks.{bi}.upsamplers.0.conv',
                   f'decoder.up_{bi}_upsample', 'conv')]
    return m


def _set(tree: dict, path: str, val) -> None:
    parts = path.split('.')
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = val


def _get(tree: dict, path: str):
    node = tree
    for p in path.split('.'):
        node = node[p]
    return node


def torch_to_flax(sd: Dict[str, Any], key_map) -> Dict[str, Any]:
    params: dict = {}
    for tp, fp, kind in key_map:
        w_key, b_key = tp + '.weight', tp + '.bias'
        if w_key not in sd:
            continue
        w = _np(sd[w_key])
        if kind == 'norm':
            _set(params, fp + '.scale', w)
            if b_key in sd:
                _set(params, fp + '.bias', _np(sd[b_key]))
            continue
        if kind == 'conv' or (kind == 'linear_or_conv1x1' and w.ndim == 4):
            k = w.transpose(2, 3, 1, 0)
            if kind == 'linear_or_conv1x1':
                k = k[0, 0]  # 1x1 conv -> dense kernel [in,out]
        else:
            k = w.T
        _set(params, fp + '.kernel', k)
        if b_key in sd:
            _set(params, fp + '.bias', _np(sd[b_key]))
    return params


def flax_to_torch(params: Dict[str, Any], key_map,
                  conv1x1_as_conv: bool = True) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    for tp, fp, kind in key_map:
        try:
            leaf = _get(params, fp)
        except (KeyError, TypeError):
            continue
        if kind == 'norm':
            sd[tp + '.weight'] = _np(leaf['scale'])
            if 'bias' in leaf:
                sd[tp + '.bias'] = _np(leaf['bias'])
            continue
        k = _np(leaf['kernel'])
        if kind == 'conv':
            w = k.transpose(3, 2, 0, 1)
        elif kind == 'linear_or_conv1x1' and conv1x1_as_conv:
            w = k.T[:, :, None, None]  # back to OIHW 1x1
        else:
            w = k.T
        sd[tp + '.weight'] = w
        if 'bias' in leaf:
            sd[tp + '.bias'] = _np(leaf['bias'])
    return sd


def unet_torch_to_params(sd, cfg: UNetConfig):
    return torch_to_flax(sd, _unet_key_map(cfg))


def unet_params_to_torch(params, cfg: UNetConfig, conv1x1_proj: bool = True):
    return flax_to_torch(params, _unet_key_map(cfg), conv1x1_proj)


def vae_torch_to_params(sd, cfg: VAEConfig):
    return torch_to_flax(sd, _vae_key_map(cfg))


def vae_params_to_torch(params, cfg: VAEConfig):
    return flax_to_torch(params, _vae_key_map(cfg))


def clip_params_to_torch(params: Dict[str, Any], num_layers: int,
                         prefix: str = 'text_model.') -> Dict[str, np.ndarray]:
    """Inverse of clip_convert.clip_text_torch_to_params."""
    sd: Dict[str, np.ndarray] = {}
    sd[prefix + 'embeddings.token_embedding.weight'] = _np(params['token_embedding'])
    sd[prefix + 'embeddings.position_embedding.weight'] = _np(params['position_embedding'])
    sd[prefix + 'final_layer_norm.weight'] = _np(params['final_layer_norm']['scale'])
    sd[prefix + 'final_layer_norm.bias'] = _np(params['final_layer_norm']['bias'])
    for i in range(num_layers):
        lp = f'{prefix}encoder.layers.{i}.'
        layer = params[f'layers_{i}']
        for proj in ('q_proj', 'k_proj', 'v_proj', 'out_proj'):
            sd[lp + f'self_attn.{proj}.weight'] = _np(layer['self_attn'][proj]['kernel']).T
            sd[lp + f'self_attn.{proj}.bias'] = _np(layer['self_attn'][proj]['bias'])
        sd[lp + 'mlp.fc1.weight'] = _np(layer['fc1']['kernel']).T
        sd[lp + 'mlp.fc1.bias'] = _np(layer['fc1']['bias'])
        sd[lp + 'mlp.fc2.weight'] = _np(layer['fc2']['kernel']).T
        sd[lp + 'mlp.fc2.bias'] = _np(layer['fc2']['bias'])
        for ln in ('layer_norm1', 'layer_norm2'):
            sd[lp + f'{ln}.weight'] = _np(layer[ln]['scale'])
            sd[lp + f'{ln}.bias'] = _np(layer[ln]['bias'])
    if 'text_projection' in params:
        sd['text_projection.weight'] = _np(params['text_projection']['kernel']).T
    return sd
