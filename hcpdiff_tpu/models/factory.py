"""Model factory: build SD model families + load pretrained weights.

Replaces the reference's ``build_unet_and_TE`` + diffusers ``from_pretrained``
(hcpdiff/train_ac.py:199-236, auto SDXL detect utils/net_utils.py:85-123):
reads a local diffusers-layout directory (config.json + safetensors/bin per
submodel), converts to flax params, and exposes flax<->torch module-path
alias maps so reference layer-selector regexes work unmodified.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ckpt.clip_convert import clip_text_torch_to_params
from ..ckpt.sd_convert import (_unet_key_map, _vae_key_map,
                               unet_torch_to_params, vae_torch_to_params)
from .clip import CLIPTextConfig, CLIPTextModel
from .unet import UNetConfig, UNet2DCondition
from .vae import VAEConfig, AutoencoderKL


def unet_alias_map(cfg: UNetConfig) -> Dict[str, str]:
    """{flax_module_path: diffusers_torch_module_path} for kernel modules."""
    out = {}
    for tp, fp, kind in _unet_key_map(cfg):
        if kind != 'norm':
            out[fp] = tp
    return out


def vae_alias_map(cfg: VAEConfig) -> Dict[str, str]:
    return {fp: tp for tp, fp, kind in _vae_key_map(cfg) if kind != 'norm'}


def clip_alias_map(cfg: CLIPTextConfig) -> Dict[str, str]:
    out = {}
    for i in range(cfg.num_hidden_layers):
        fb, tb = f'layers_{i}', f'text_model.encoder.layers.{i}'
        for p in ('q_proj', 'k_proj', 'v_proj', 'out_proj'):
            out[f'{fb}.self_attn.{p}'] = f'{tb}.self_attn.{p}'
        out[f'{fb}.fc1'] = f'{tb}.mlp.fc1'
        out[f'{fb}.fc2'] = f'{tb}.mlp.fc2'
    return out


def _load_torch_sd(model_dir: str) -> Dict[str, np.ndarray]:
    """Load a diffusers submodel dir's weights (safetensors preferred)."""
    st = [f for f in os.listdir(model_dir) if f.endswith('.safetensors')]
    if st:
        from safetensors.numpy import load_file
        sd: Dict[str, np.ndarray] = {}
        for f in sorted(st):
            sd.update(load_file(os.path.join(model_dir, f)))
        return sd
    bins = [f for f in os.listdir(model_dir) if f.endswith('.bin')]
    if bins:
        import torch
        sd = {}
        for f in sorted(bins):
            obj = torch.load(os.path.join(model_dir, f), map_location='cpu',
                             weights_only=False)
            sd.update({k: v.detach().cpu().numpy() for k, v in obj.items()})
        return sd
    raise FileNotFoundError(f'no weights in {model_dir}')


def _unet_cfg_from_json(d: dict) -> UNetConfig:
    heads = d.get('num_attention_heads') or d.get('attention_head_dim', 8)
    if isinstance(heads, int):
        heads = (heads,) * len(d['block_out_channels'])
    tl = d.get('transformer_layers_per_block', 1)
    if isinstance(tl, int):
        tl = (tl,) * len(d['block_out_channels'])
    return UNetConfig(
        in_channels=d.get('in_channels', 4),
        out_channels=d.get('out_channels', 4),
        block_out_channels=tuple(d['block_out_channels']),
        down_block_types=tuple(d['down_block_types']),
        up_block_types=tuple(d['up_block_types']),
        layers_per_block=d.get('layers_per_block', 2),
        transformer_layers_per_block=tuple(tl),
        num_heads=tuple(heads),
        cross_attention_dim=d.get('cross_attention_dim', 768),
        norm_num_groups=d.get('norm_num_groups', 32),
        addition_embed_type=d.get('addition_embed_type'),
        addition_time_embed_dim=d.get('addition_time_embed_dim', 256),
        projection_class_embeddings_input_dim=d.get(
            'projection_class_embeddings_input_dim', 2816),
    )


def _vae_cfg_from_json(d: dict) -> VAEConfig:
    return VAEConfig(
        in_channels=d.get('in_channels', 3),
        out_channels=d.get('out_channels', 3),
        latent_channels=d.get('latent_channels', 4),
        block_out_channels=tuple(d['block_out_channels']),
        layers_per_block=d.get('layers_per_block', 2),
        norm_num_groups=d.get('norm_num_groups', 32),
        scaling_factor=d.get('scaling_factor', 0.18215),
    )


def _clip_cfg_from_json(d: dict) -> CLIPTextConfig:
    return CLIPTextConfig(
        vocab_size=d.get('vocab_size', 49408),
        hidden_size=d.get('hidden_size', 768),
        intermediate_size=d.get('intermediate_size', 3072),
        num_hidden_layers=d.get('num_hidden_layers', 12),
        num_attention_heads=d.get('num_attention_heads', 12),
        max_position_embeddings=d.get('max_position_embeddings', 77),
        hidden_act=d.get('hidden_act', 'quick_gelu'),
        eos_token_id=d.get('eos_token_id', 49407),
        bos_token_id=d.get('bos_token_id', 49406),
        projection_dim=(d.get('projection_dim')
                        if d.get('architectures', [''])[0].endswith('WithProjection')
                        else None),
    )


def is_sdxl_dir(path: str) -> bool:
    """SDXL auto-detect: presence of a second text encoder
    (reference utils/net_utils.py:85-123)."""
    return os.path.isdir(os.path.join(path, 'text_encoder_2'))


def build_models(pretrained: Optional[str] = None,
                 unet_cfg: Optional[UNetConfig] = None,
                 te_cfg: Optional[CLIPTextConfig] = None,
                 vae_cfg: Optional[VAEConfig] = None,
                 dtype: Any = jnp.bfloat16, seed: int = 0,
                 remat: bool = False) -> Dict[str, Any]:
    """-> {unet, unet_params, unet_cfg, te, te_params, te_cfg, vae,
    vae_params, vae_cfg, tokenizer, aliases:{unet, te, vae}, sdxl:bool,
    [te2...]}  (params fp32; compute dtype per model)."""
    rng = jax.random.PRNGKey(seed)
    r1, r2, r3 = jax.random.split(rng, 3)
    out: Dict[str, Any] = {'sdxl': False}

    def j(path):
        with open(path) as f:
            return json.load(f)

    te2_cfg = None
    if pretrained in ('tiny', 'tiny_sdxl'):
        # self-contained tiny world for tests/smoke runs (no weights needed)
        from ..utils.clip_tokenizer import CLIPTokenizer
        tk = CLIPTokenizer.tiny(words=['cat', 'dog', 'photo', 'painting'])
        te_cfg = te_cfg or CLIPTextConfig.tiny(vocab_size=tk.vocab_size,
                                               eos_token_id=tk.eos_token_id,
                                               bos_token_id=tk.bos_token_id)
        if pretrained == 'tiny_sdxl':
            # dual-TE world: ctx = 32 + 48; pooled = TE2 projection (48)
            te2_cfg = CLIPTextConfig.tiny(vocab_size=tk.vocab_size,
                                          hidden_size=48, num_attention_heads=4,
                                          eos_token_id=tk.eos_token_id,
                                          bos_token_id=tk.bos_token_id,
                                          projection_dim=48)
            unet_cfg = unet_cfg or UNetConfig.tiny_sdxl(
                cross_attention_dim=te_cfg.hidden_size + te2_cfg.hidden_size,
                projection_class_embeddings_input_dim=8 * 6 + 48)
            out['sdxl'] = True
        unet_cfg = unet_cfg or UNetConfig.tiny(cross_attention_dim=te_cfg.hidden_size)
        vae_cfg = vae_cfg or VAEConfig.tiny()
        out['_tiny_tokenizer'] = tk
        pretrained = None
    if pretrained and os.path.isdir(pretrained):
        out['sdxl'] = is_sdxl_dir(pretrained)
        unet_cfg = _unet_cfg_from_json(j(os.path.join(pretrained, 'unet', 'config.json')))
        vae_cfg = _vae_cfg_from_json(j(os.path.join(pretrained, 'vae', 'config.json')))
        te_cfg = _clip_cfg_from_json(j(os.path.join(pretrained, 'text_encoder', 'config.json')))
    unet_cfg = unet_cfg or UNetConfig.sd15()
    vae_cfg = vae_cfg or VAEConfig.sd()
    te_cfg = te_cfg or CLIPTextConfig.sd15()

    unet = UNet2DCondition(unet_cfg, dtype=dtype, remat=remat)
    vae = AutoencoderKL(vae_cfg, dtype=dtype)
    te = CLIPTextModel(te_cfg, dtype=jnp.float32)

    if pretrained and os.path.isdir(pretrained):
        unet_params = unet_torch_to_params(_load_torch_sd(os.path.join(pretrained, 'unet')),
                                           unet_cfg)
        vae_params = vae_torch_to_params(_load_torch_sd(os.path.join(pretrained, 'vae')),
                                         vae_cfg)
        te_params = clip_text_torch_to_params(
            _load_torch_sd(os.path.join(pretrained, 'text_encoder')),
            te_cfg.num_hidden_layers)
        tok_dir = os.path.join(pretrained, 'tokenizer')
        from ..utils.clip_tokenizer import CLIPTokenizer
        tokenizer = (CLIPTokenizer.from_pretrained(tok_dir)
                     if os.path.isdir(tok_dir) else CLIPTokenizer.tiny())
        if out['sdxl']:
            te2_cfg = _clip_cfg_from_json(j(os.path.join(pretrained, 'text_encoder_2',
                                                         'config.json')))
            te2 = CLIPTextModel(te2_cfg, dtype=jnp.float32)
            te2_params = clip_text_torch_to_params(
                _load_torch_sd(os.path.join(pretrained, 'text_encoder_2')),
                te2_cfg.num_hidden_layers)
            out.update(te2=te2, te2_params=te2_params, te2_cfg=te2_cfg)
    else:
        dummy_ctx = jnp.zeros((1, 77, unet_cfg.cross_attention_dim))
        kw = {}
        if unet_cfg.addition_embed_type == 'text_time':
            pooled_dim = (unet_cfg.projection_class_embeddings_input_dim
                          - unet_cfg.addition_time_embed_dim * 6)
            kw = dict(pooled_text_emb=jnp.zeros((1, pooled_dim)),
                      time_ids=jnp.zeros((1, 6)))
        # jitted init off-CPU: eager flax init dispatches thousands of tiny
        # ops, which over the axon TPU tunnel costs ~10 min for a full-size
        # UNet; one compiled (persistent-cached) program takes seconds. On
        # CPU (tests, tiny worlds) eager avoids per-config compile overhead.
        jinit = jax.jit if jax.default_backend() != 'cpu' else (lambda f: f)
        unet_params = jinit(unet.init)(
            r1, jnp.zeros((1, 8, 8, unet_cfg.in_channels)),
            jnp.array([0]), dummy_ctx, **kw)['params']
        vae_params = jinit(vae.init)(r2, jnp.zeros((1, 32, 32, 3)),
                                     jax.random.PRNGKey(0))['params']
        te_params = jinit(te.init)(r3, jnp.zeros((1, 77), jnp.int32))['params']
        if te2_cfg is not None:
            te2 = CLIPTextModel(te2_cfg, dtype=jnp.float32)
            te2_params = jinit(te2.init)(jax.random.PRNGKey(seed + 11),
                                         jnp.zeros((1, 77), jnp.int32))['params']
            out.update(te2=te2, te2_params=te2_params, te2_cfg=te2_cfg)
        tokenizer = out.pop('_tiny_tokenizer', None)
        if tokenizer is None:
            from ..utils.clip_tokenizer import CLIPTokenizer
            tokenizer = CLIPTokenizer.tiny(words=['cat', 'dog', 'photo'])
            if te_cfg.vocab_size != tokenizer.vocab_size:
                tokenizer = None  # caller supplies one

    out.update(unet=unet, unet_params=unet_params, unet_cfg=unet_cfg,
               vae=vae, vae_params=vae_params, vae_cfg=vae_cfg,
               te=te, te_params=te_params, te_cfg=te_cfg,
               tokenizer=tokenizer,
               aliases={'unet': unet_alias_map(unet_cfg),
                        'te': clip_alias_map(te_cfg),
                        'vae': vae_alias_map(vae_cfg)})
    if 'te2_cfg' in out:
        out['aliases']['te2'] = clip_alias_map(out['te2_cfg'])
    return out
