"""LDM/webui single-file checkpoint <-> diffusers-layout key conversion.

Independent implementation of the standard Stable-Diffusion key maps
(capability parity with reference tools/sd2diffusers.py and
tools/diffusers2sd.py). Works on SD1.x-shaped UNets (4 blocks, 2 layers)
and the SD VAE; CLIP TE passes through with a prefix strip. SD2.x
open_clip TE conversion is handled for the common penultimate layout.

All functions operate on flat {key: ndarray} dicts — combine with
sd_convert.torch_to_flax to reach our params.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

UNET_LDM_PREFIX = 'model.diffusion_model.'
VAE_LDM_PREFIX = 'first_stage_model.'
TE_LDM_PREFIX = 'cond_stage_model.transformer.'
TE_LDM_PREFIX_V2 = 'cond_stage_model.model.'


def _resnet_map(ldm: str, dif: str):
    return [(f'{ldm}.in_layers.0', f'{dif}.norm1'),
            (f'{ldm}.in_layers.2', f'{dif}.conv1'),
            (f'{ldm}.emb_layers.1', f'{dif}.time_emb_proj'),
            (f'{ldm}.out_layers.0', f'{dif}.norm2'),
            (f'{ldm}.out_layers.3', f'{dif}.conv2'),
            (f'{ldm}.skip_connection', f'{dif}.conv_shortcut')]


def unet_ldm_to_diffusers_map(num_blocks: int = 4, layers_per_block: int = 2,
                              attn_blocks=(True, True, True, False)
                              ) -> Dict[str, str]:
    """{ldm_module: diffusers_module} for an SD1.x UNet."""
    m: Dict[str, str] = {
        'time_embed.0': 'time_embedding.linear_1',
        'time_embed.2': 'time_embedding.linear_2',
        'input_blocks.0.0': 'conv_in',
        'out.0': 'conv_norm_out',
        'out.2': 'conv_out',
        'middle_block.1': 'mid_block.attentions.0',
    }
    pairs = []
    per = layers_per_block + 1  # resnets + downsample slot per block
    i = 1
    for b in range(num_blocks):
        for l in range(layers_per_block):
            pairs += _resnet_map(f'input_blocks.{i}.0',
                                 f'down_blocks.{b}.resnets.{l}')
            if attn_blocks[b]:
                m[f'input_blocks.{i}.1'] = f'down_blocks.{b}.attentions.{l}'
            i += 1
        if b < num_blocks - 1:
            m[f'input_blocks.{i}.0.op'] = f'down_blocks.{b}.downsamplers.0.conv'
            i += 1
    pairs += _resnet_map('middle_block.0', 'mid_block.resnets.0')
    pairs += _resnet_map('middle_block.2', 'mid_block.resnets.1')
    i = 0
    for b in range(num_blocks):
        ab = attn_blocks[num_blocks - 1 - b]
        for l in range(layers_per_block + 1):
            pairs += _resnet_map(f'output_blocks.{i}.0',
                                 f'up_blocks.{b}.resnets.{l}')
            if ab:
                m[f'output_blocks.{i}.1'] = f'up_blocks.{b}.attentions.{l}'
            if b < num_blocks - 1 and l == layers_per_block:
                up_idx = 2 if ab else 1
                m[f'output_blocks.{i}.{up_idx}.conv'] = \
                    f'up_blocks.{b}.upsamplers.0.conv'
            i += 1
    m.update(dict(pairs))
    return m


def _vae_resnet_map(ldm: str, dif: str):
    return [(f'{ldm}.norm1', f'{dif}.norm1'), (f'{ldm}.conv1', f'{dif}.conv1'),
            (f'{ldm}.norm2', f'{dif}.norm2'), (f'{ldm}.conv2', f'{dif}.conv2'),
            (f'{ldm}.nin_shortcut', f'{dif}.conv_shortcut')]


def vae_ldm_to_diffusers_map(num_blocks: int = 4, layers_per_block: int = 2
                             ) -> Tuple[Dict[str, str], Dict[str, str]]:
    """Returns (module_map, attn_map). attn_map entries are 1x1-conv ->
    linear attention projections needing squeeze."""
    m: Dict[str, str] = {
        'encoder.conv_in': 'encoder.conv_in',
        'encoder.norm_out': 'encoder.conv_norm_out',
        'encoder.conv_out': 'encoder.conv_out',
        'decoder.conv_in': 'decoder.conv_in',
        'decoder.norm_out': 'decoder.conv_norm_out',
        'decoder.conv_out': 'decoder.conv_out',
        'quant_conv': 'quant_conv',
        'post_quant_conv': 'post_quant_conv',
    }
    pairs = []
    for b in range(num_blocks):
        for l in range(layers_per_block):
            pairs += _vae_resnet_map(f'encoder.down.{b}.block.{l}',
                                     f'encoder.down_blocks.{b}.resnets.{l}')
        if b < num_blocks - 1:
            m[f'encoder.down.{b}.downsample.conv'] = \
                f'encoder.down_blocks.{b}.downsamplers.0.conv'
    for side in ('encoder', 'decoder'):
        pairs += _vae_resnet_map(f'{side}.mid.block_1',
                                 f'{side}.mid_block.resnets.0')
        pairs += _vae_resnet_map(f'{side}.mid.block_2',
                                 f'{side}.mid_block.resnets.1')
    for b in range(num_blocks):
        ldm_b = num_blocks - 1 - b  # decoder.up is reversed vs diffusers
        for l in range(layers_per_block + 1):
            pairs += _vae_resnet_map(f'decoder.up.{ldm_b}.block.{l}',
                                     f'decoder.up_blocks.{b}.resnets.{l}')
        if b < num_blocks - 1:
            m[f'decoder.up.{ldm_b}.upsample.conv'] = \
                f'decoder.up_blocks.{b}.upsamplers.0.conv'
    m.update(dict(pairs))
    attn = {}
    for side in ('encoder', 'decoder'):
        a = f'{side}.mid.attn_1'
        d = f'{side}.mid_block.attentions.0'
        attn.update({f'{a}.norm': f'{d}.group_norm', f'{a}.q': f'{d}.to_q',
                     f'{a}.k': f'{d}.to_k', f'{a}.v': f'{d}.to_v',
                     f'{a}.proj_out': f'{d}.to_out.0'})
    return m, attn


def _convert_by_module_map(sd: Dict[str, np.ndarray], module_map: Dict[str, str],
                           prefix: str, reverse: bool = False
                           ) -> Dict[str, np.ndarray]:
    mm = ({v: k for k, v in module_map.items()} if reverse else module_map)
    # longest-prefix module matching on '<module>.<param>' keys
    out: Dict[str, np.ndarray] = {}
    for key, v in sd.items():
        if not reverse:
            if not key.startswith(prefix):
                continue
            key2 = key[len(prefix):]
        else:
            key2 = key
        mod, _, param = key2.rpartition('.')
        # attention transformer blocks map at the module level (same inner
        # naming in ldm and diffusers), so try shrinking prefixes
        cur = mod
        rest = ''
        while cur:
            if cur in mm:
                new_mod = mm[cur] + rest
                new_key = f'{new_mod}.{param}' if new_mod else param
                if reverse:
                    new_key = prefix + new_key
                out[new_key] = v
                break
            cur, _, tail = cur.rpartition('.')
            rest = f'.{tail}{rest}'
    return out


def unet_ldm_to_diffusers(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return _convert_by_module_map(sd, unet_ldm_to_diffusers_map(),
                                  UNET_LDM_PREFIX)


def unet_diffusers_to_ldm(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return _convert_by_module_map(sd, unet_ldm_to_diffusers_map(),
                                  UNET_LDM_PREFIX, reverse=True)


def vae_ldm_to_diffusers(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    mod_map, attn_map = vae_ldm_to_diffusers_map()
    out = _convert_by_module_map(sd, mod_map, VAE_LDM_PREFIX)
    for lk, dk in attn_map.items():
        for suffix in ('weight', 'bias'):
            key = f'{VAE_LDM_PREFIX}{lk}.{suffix}'
            if key in sd:
                v = sd[key]
                if suffix == 'weight' and v.ndim == 4:
                    v = v[:, :, 0, 0]  # 1x1 conv -> linear
                out[f'{dk}.{suffix}'] = v
    return out


def vae_diffusers_to_ldm(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    mod_map, attn_map = vae_ldm_to_diffusers_map()
    out = _convert_by_module_map(sd, mod_map, VAE_LDM_PREFIX, reverse=True)
    for lk, dk in attn_map.items():
        for suffix in ('weight', 'bias'):
            key = f'{dk}.{suffix}'
            if key in sd:
                v = sd[key]
                if suffix == 'weight' and v.ndim == 2:
                    v = v[:, :, None, None]
                out[f'{VAE_LDM_PREFIX}{lk}.{suffix}'] = v
    return out


def te_ldm_to_diffusers(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """SD1.x CLIP TE: strip the ldm prefix (same transformers naming)."""
    return {k[len(TE_LDM_PREFIX):]: v for k, v in sd.items()
            if k.startswith(TE_LDM_PREFIX)}


def is_sd2_checkpoint(sd: Dict[str, np.ndarray]) -> bool:
    """SD2.x ships an open_clip text tower (combined qkv in_proj)."""
    return any(k.startswith(TE_LDM_PREFIX_V2 + 'transformer.resblocks.')
               for k in sd)


def te_openclip_to_diffusers(sd: Dict[str, np.ndarray]
                             ) -> Dict[str, np.ndarray]:
    """SD2.x open_clip text tower -> transformers CLIPTextModel keys
    (reference tools/sd2diffusers.py convert_ldm_clip_checkpoint_0_18
    capability; independent programmatic mapping). The combined
    attn.in_proj_{weight,bias} splits into q/k/v projections."""
    pre = TE_LDM_PREFIX_V2
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if not k.startswith(pre):
            continue
        k = k[len(pre):]
        if k == 'token_embedding.weight':
            out['text_model.embeddings.token_embedding.weight'] = v
        elif k == 'positional_embedding':
            out['text_model.embeddings.position_embedding.weight'] = v
        elif k.startswith('ln_final.'):
            out['text_model.final_layer_norm.' + k.split('.', 1)[1]] = v
        elif k.startswith('transformer.resblocks.'):
            rest = k[len('transformer.resblocks.'):]
            i, sub = rest.split('.', 1)
            base = f'text_model.encoder.layers.{i}.'
            if sub.startswith('ln_1.'):
                out[base + 'layer_norm1.' + sub.split('.', 1)[1]] = v
            elif sub.startswith('ln_2.'):
                out[base + 'layer_norm2.' + sub.split('.', 1)[1]] = v
            elif sub.startswith('mlp.c_fc.'):
                out[base + 'mlp.fc1.' + sub.split('.')[-1]] = v
            elif sub.startswith('mlp.c_proj.'):
                out[base + 'mlp.fc2.' + sub.split('.')[-1]] = v
            elif sub in ('attn.in_proj_weight', 'attn.in_proj_bias'):
                kind = sub.rsplit('_', 1)[1]  # weight | bias
                q, kk, vv = np.split(v, 3, axis=0)
                out[base + f'self_attn.q_proj.{kind}'] = q
                out[base + f'self_attn.k_proj.{kind}'] = kk
                out[base + f'self_attn.v_proj.{kind}'] = vv
            elif sub.startswith('attn.out_proj.'):
                out[base + 'self_attn.out_proj.' + sub.split('.')[-1]] = v
        # text_projection / logit_scale: CLIP-contrastive heads, unused by
        # the SD2 conditioning path — dropped (reference does the same)
    return out


def split_ldm_checkpoint(sd: Dict[str, np.ndarray]) -> Dict[str, Dict[str, np.ndarray]]:
    """One webui .ckpt/.safetensors -> {'unet', 'vae', 'text_encoder'}
    diffusers-format dicts (SD1.x and SD2.x text towers auto-detected)."""
    te = (te_openclip_to_diffusers(sd) if is_sd2_checkpoint(sd)
          else te_ldm_to_diffusers(sd))
    return {'unet': unet_ldm_to_diffusers(sd),
            'vae': vae_ldm_to_diffusers(sd),
            'text_encoder': te}


CONTROL_LDM_PREFIX = 'control_model.'


def controlnet_ldm_to_ours(sd: Dict[str, np.ndarray], unet_cfg=None):
    """webui/LDM ControlNet ckpt ('control_model.*') -> our flax ControlNet
    param tree (models/controlnet.py) for drop-in plugin interop with
    reference-trained ControlNets (reference converts via
    tools/sd2diffusers.py convert_controlnet).

    The shared down/mid submodules reuse the unet LDM->diffusers module map
    and the diffusers->flax converter; zero convs and the conditioning
    ('input_hint_block') convs map positionally — our
    ControlNetConditioningEmbedding has the identical conv ladder
    (3->16->16->32->32->96->96->256->C0)."""
    from .sd_convert import unet_torch_to_params, _set
    from ..models.unet import UNetConfig
    unet_cfg = unet_cfg or UNetConfig.sd15()

    body = {k[len(CONTROL_LDM_PREFIX):]: v for k, v in sd.items()
            if k.startswith(CONTROL_LDM_PREFIX)}
    # shared submodules: ldm names -> diffusers names (up-block entries in
    # the map simply find no keys) -> flax
    mod_map = unet_ldm_to_diffusers_map(
        len(unet_cfg.block_out_channels), unet_cfg.layers_per_block,
        tuple('CrossAttn' in t for t in unet_cfg.down_block_types))
    dif = _convert_by_module_map(
        {UNET_LDM_PREFIX + k: v for k, v in body.items()},
        mod_map, UNET_LDM_PREFIX)
    params = unet_torch_to_params(dif, unet_cfg)

    def put_conv(dst: str, w: np.ndarray, b: np.ndarray):
        _set(params, dst + '.kernel', w.transpose(2, 3, 1, 0))
        _set(params, dst + '.bias', b)

    n_zero = 0
    while f'zero_convs.{n_zero}.0.weight' in body:
        put_conv(f'zero_{n_zero}',
                 body[f'zero_convs.{n_zero}.0.weight'],
                 body[f'zero_convs.{n_zero}.0.bias'])
        n_zero += 1
    if 'middle_block_out.0.weight' in body:
        put_conv('zero_mid', body['middle_block_out.0.weight'],
                 body['middle_block_out.0.bias'])
    # hint block convs sit at even indices (SiLU between)
    hint_targets = ['cond_embedding.conv_in'] + \
        [f'cond_embedding.blocks_{i}' for i in range(6)] + \
        ['cond_embedding.conv_out']
    for i, tgt in enumerate(hint_targets):
        wk = f'input_hint_block.{2 * i}.weight'
        if wk in body:
            put_conv(tgt, body[wk], body[f'input_hint_block.{2 * i}.bias'])
    return params
