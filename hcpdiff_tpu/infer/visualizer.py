"""Config-driven inference — the ``Visualizer`` entry point
(reference hcpdiff/visualizer.py:21-265).

Covers: auto pipeline pick (t2i/i2i/inpaint), model merge at load
(part α-blend + LoRA attach + plugin state, reference
utils/cfg_net_tools.py:227-321 HCPModelLoader), prompt attention parsing,
batched neg+pos text encoding, seed-per-image generators, per-image
reproduction yaml, save_model (collapse LoRAs into base and export).

The reference's VRAM offload engine (visualizer.py:112-147) is intentionally
absent: TPU HBM holds SD1.5/SDXL whole; the jitted loop keeps weights
resident across calls.

CLI: python -m hcpdiff_tpu.visualizer --cfg cfgs/infer/text2img.yaml k=v
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..adapt.overlay import (collapse_overlay, make_lora_overlay,
                             merge_overlays, module_paths)
from ..config import Cfg, load, save_config, to_plain
from ..ckpt.manager import auto_manager
from ..diffusion.schedules import NoiseSchedule
from ..models.factory import build_models
from ..models.text_frontend import TextEncoderFrontend
from ..trainer.assemble import merge_subset
from .pipeline import DiffusionPipeline
from .interfaces import DiskInterface, BaseInterface


class ModelMerger:
    """HCPModelLoader equivalent: recipe = base*α + Σ lora_i·scale_i
    + Σ part_k (reference cfgs/infer/text2img.yaml recipe comment;
    load_all semantics utils/cfg_net_tools.py:227-321 incl. the ``layers``
    filter and the ``load_ema`` flag)."""

    def __init__(self, params: Any, aliases: Dict[str, str]):
        self.params = params
        self.aliases = aliases
        self.overlays: List[dict] = []
        self.scales: List[dict] = []

    def _selected(self, layers) -> Optional[set]:
        """-> set of selected module paths, or None for 'all'."""
        if layers is None or layers == 'all':
            return None
        from ..adapt.overlay import get_match_layers
        return set(get_match_layers(list(layers), module_paths(self.params),
                                    self.aliases))

    def load_part(self, ckpt_path: str, alpha: float = 1.0,
                  layers='all', load_ema: bool = False,
                  base_alpha: float = None):
        """w = base_alpha*old + alpha*new (reference load_part semantics,
        cfg_net_tools.py:233-247 with the group-level base_model_alpha);
        base_alpha defaults to 1-alpha (a convex blend)."""
        ck = auto_manager(ckpt_path).load_ckpt(ckpt_path)
        base = (ck.get('base_ema') if load_ema else None) or ck.get('base')
        ba = (1 - alpha) if base_alpha is None else float(base_alpha)
        if base:
            sel = self._selected(layers)
            sub = jax.tree_util.tree_map(lambda v: jnp.asarray(v), base)

            def blend(full, part, path=''):
                if isinstance(part, dict):
                    return {k: (blend(full[k], part[k],
                                      f'{path}.{k}' if path else k)
                                if k in part else full[k])
                            for k in full}
                mod = path.rsplit('.', 1)[0]  # strip kernel/bias leaf
                if sel is not None and not any(
                        mod == s or mod.startswith(s + '.') for s in sel):
                    return full
                return full * ba + part * alpha

            self.params = blend(self.params, sub)
        return self

    def load_lora(self, ckpt_path: str, alpha: float = 1.0,
                  layers='all', load_ema: bool = False):
        ck = auto_manager(ckpt_path).load_ckpt(ckpt_path, aliases=self.aliases)
        overlay = (ck.get('lora_ema') if load_ema else None) or ck.get('lora')
        if overlay:
            sel = self._selected(layers)
            if sel is not None:
                overlay = {p: v for p, v in overlay.items()
                           if any(p == s or p.startswith(s + '.') for s in sel)}
            if overlay:
                overlay = jax.tree_util.tree_map(jnp.asarray, overlay)
                self.overlays.append(overlay)
                self.scales.append({p: alpha for p in overlay})
        return self

    def merged(self) -> Any:
        return merge_overlays(self.params, self.overlays, self.scales)


class Visualizer:
    def __init__(self, cfgs: Cfg):
        from ..config.legacy import InferCFGConverter
        cfgs = InferCFGConverter().convert(cfgs)
        self.cfgs = cfgs
        mcfg = cfgs.get('model') or Cfg()
        self.dtype = jnp.bfloat16 if str(cfgs.get('dtype', 'bf16')) in (
            'fp16', 'bf16', 'amp') else jnp.float32
        world = build_models(cfgs.get('pretrained_model') or
                             mcfg.get('pretrained_model_name_or_path'),
                             dtype=self.dtype)
        self.world = world
        self.tokenizer = world['tokenizer']
        ns_cfg = cfgs.get('infer_args') or Cfg()
        self.schedule = NoiseSchedule.make()
        self._apply_new_components(cfgs.get('new_components'))

        self._build_merged()

        self.sdxl = bool(world.get('sdxl'))
        if self.sdxl:
            from ..models.compose.sdxl_te import SDXLTextEncoderFrontend
            self.frontend = SDXLTextEncoderFrontend(
                self.tokenizer, world['te'], self.te_params,
                world['te2'], world['te2_params'],
                n_repeats=int(mcfg.get('tokenizer_repeats', 1)),
                clip_skip=int(mcfg.get('clip_skip', 1)),
                clip_final_norm=bool(mcfg.get('clip_final_norm', False)))
        else:
            self.frontend = TextEncoderFrontend(
                self.tokenizer, world['te'], self.te_params,
                n_repeats=int(mcfg.get('tokenizer_repeats', 1)),
                clip_skip=int(mcfg.get('clip_skip', 0)),
                clip_final_norm=bool(mcfg.get('clip_final_norm', True)))

        viser = self

        def unet_apply(p, x, t, ctx, cond=None, **extra):
            # read through world so a merge-time host rebuild (qkv_bias for
            # biased LoRAs) or a reloadable hot-swap stays in effect
            unet = viser.world['unet']
            # ControlNet residual taps (reference MultiPluginBlock injection,
            # hcpdiff/models/controlnet.py:69-88): with a loaded plugin and a
            # cond image, add scaled residuals at the UNet skip/mid points.
            if cond is not None and viser.plugins:
                down_acc, mid_acc = None, None
                for pl in viser.plugins.values():
                    d, m = viser._controlnet.apply({'params': pl['params']},
                                                   x, t, ctx, cond)
                    s = pl['scale']
                    d = [r * s for r in d]
                    m = m * s
                    if down_acc is None:
                        down_acc, mid_acc = d, m
                    else:
                        down_acc = [a + b for a, b in zip(down_acc, d)]
                        mid_acc = mid_acc + m
                extra = dict(extra, down_residuals=down_acc,
                             mid_residual=mid_acc)
            return unet.apply({'params': p}, x, t, ctx, **extra)

        self.pipe = DiffusionPipeline(
            unet_apply, self.unet_params, world['vae'], world['vae_params'],
            self.frontend, schedule=self.schedule,
            text_time=(world['unet_cfg'].addition_embed_type == 'text_time'))
        self.pipe.unet_params_neg = self.unet_params_neg
        self.pipe.use_encoder_attention_mask = bool(
            cfgs.get('encoder_attention_mask', False))

        # output interfaces
        self.interfaces: List[BaseInterface] = []
        for item in (cfgs.get('interface') or []):
            spec = dict(item)
            tgt = str(spec.pop('_target_', 'disk')).lower()
            spec.pop('_partial_', None)
            kwargs = dict(save_root=spec.get('save_root', 'output/'),
                          image_type=spec.get('image_type', 'png'))
            if 'anim' in tgt or spec.get('show_steps'):
                from .interfaces import DiskAnimInterface
                self.interfaces.append(DiskAnimInterface(**kwargs))
            elif 'webui' in tgt:
                from .interfaces import WebUIInterface
                self.interfaces.append(WebUIInterface())
            elif 'disk' in tgt:
                self.interfaces.append(DiskInterface(**kwargs))
        if not self.interfaces:
            self.interfaces = [DiskInterface(cfgs.get('output_dir', 'output/'))]

    # -------------------------------------------------- new_components ----
    # diffusers scheduler class -> our sampler name
    # insertion order matters: longer/more-specific class fragments first
    # (kdpm2ancestral before kdpm2, dpmsolversde before dpmsolver...)
    _SCHED_MAP = {'eulerancestral': 'euler_a', 'eulerdiscrete': 'euler',
                  'dpmsolversde': 'dpm++_sde',
                  'dpmsolversinglestep': 'dpm++_sde',
                  'dpmsolvermultistep': 'dpm++_2m', 'unipcmultistep': 'unipc',
                  'kdpm2ancestral': 'dpm2_a', 'kdpm2': 'dpm2',
                  'heun': 'heun', 'lms': 'lms', 'deis': 'deis',
                  'pndm': 'pndm', 'ddim': 'ddim', 'ddpm': 'ddpm'}

    def _apply_new_components(self, nc):
        """reference 'new_components' block: swap the scheduler and/or VAE
        without retouching the rest of the config (cfgs/infer/euler_a.yaml,
        change_vae.yaml)."""
        if not nc:
            return
        sch = nc.get('scheduler')
        if sch:
            tgt = str(sch.get('_target_', '')).lower().replace('discretescheduler', 'discrete')
            for key, name in self._SCHED_MAP.items():
                if key in tgt or key.replace('discrete', '') in tgt:
                    # DPMSolverMultistep with algorithm_type sde-dpmsolver++
                    # is the 'DPM++ 2M SDE' sampler
                    if name == 'dpm++_2m' and 'sde' in str(
                            sch.get('algorithm_type', '')).lower():
                        name = 'dpm++_2m_sde'
                    ia = self.cfgs.get('infer_args') or Cfg()
                    ia['sampler'] = name
                    if key == 'dpmsolversinglestep':
                        # deterministic singlestep 2S = DPM++ SDE at eta=0
                        kwz = dict(ia.get('sampler_kwargs') or {})
                        kwz['eta'] = 0.0
                        ia['sampler_kwargs'] = kwz
                    if sch.get('use_karras_sigmas'):
                        kwz = dict(ia.get('sampler_kwargs') or {})
                        kwz['use_karras_sigmas'] = True
                        ia['sampler_kwargs'] = kwz
                    self.cfgs['infer_args'] = ia
                    break
            else:
                # reference configs can name ANY diffusers scheduler class
                # (visualizer.py:99-110); silently keeping the default
                # sampler would generate with the wrong method
                raise ValueError(
                    f'new_components.scheduler {sch.get("_target_")!r} has '
                    'no sampler mapping; supported: '
                    + ', '.join(sorted(set(self._SCHED_MAP.values()))))
            kw = {k: sch[k] for k in ('beta_start', 'beta_end',
                                      'beta_schedule', 'prediction_type')
                  if k in sch}
            if kw:
                self.schedule = NoiseSchedule.make(**kw)
        vae_cfg = nc.get('vae')
        if vae_cfg:
            path = vae_cfg.get('pretrained_model_name_or_path')
            if path and os.path.isdir(path):
                import json as _json
                from ..models.factory import (_load_torch_sd,
                                              _vae_cfg_from_json)
                from ..models.vae import AutoencoderKL
                from ..ckpt.sd_convert import vae_torch_to_params
                sub = (os.path.join(path, 'vae')
                       if os.path.isdir(os.path.join(path, 'vae')) else path)
                with open(os.path.join(sub, 'config.json')) as f:
                    vcfg = _vae_cfg_from_json(_json.load(f))
                self.world['vae_cfg'] = vcfg
                self.world['vae'] = AutoencoderKL(vcfg, dtype=self.dtype)
                self.world['vae_params'] = vae_torch_to_params(
                    _load_torch_sd(sub), vcfg)

    # ----------------------------------------------------------- merge ----
    def _build_merged(self):
        """Run the merge recipe + embeddings dir. Shared by __init__ and
        VisualizerReloadable._remerge so hot-reload keeps the DreamArtist
        negative branch, the bf16 cast and the embedding table in sync."""
        cfgs, world = self.cfgs, self.world
        mcfg = cfgs.get('model') or Cfg()
        self.emb_ext = None
        merge_cfg = cfgs.get('merge')
        unet_merger = ModelMerger(world['unet_params'], world['aliases']['unet'])
        te_merger = ModelMerger(world['te_params'], world['aliases']['te'])
        neg_merger = ModelMerger(world['unet_params'], world['aliases']['unet'])
        has_neg = False
        self.plugins: Dict[str, dict] = {}
        if merge_cfg:
            load_ema = bool(merge_cfg.get('load_ema', False))
            for group_name, group in merge_cfg.items():
                if not isinstance(group, dict):
                    continue
                if group_name == 'plugin_cfg':
                    continue  # plugin architecture derives from the UNet cfg
                gtype = group.get('type', 'unet')
                tgt = unet_merger if 'unet' in gtype else te_merger
                for item in group.get('lora', []) or []:
                    kw = dict(alpha=float(item.get('alpha', 1.0)),
                              layers=item.get('layers', 'all'),
                              load_ema=load_ema)
                    # DreamArtist: 'branch: n' loras go to the uncond half.
                    # Reference configs mark branches with batch-mask ranges
                    # instead (mask [0,0.5]=neg half, [0.5,1]=pos half,
                    # cfgs/infer/text2img_DA++.yaml) — map them.
                    branch = item.get('branch', 'p')
                    mask = item.get('mask')
                    if mask is not None and float(mask[0]) == 0.0 \
                            and float(mask[-1]) <= 0.5:
                        branch = 'n'
                    if 'unet' in gtype and branch == 'n':
                        neg_merger.load_lora(item['path'], **kw)
                        has_neg = True
                    else:
                        tgt.load_lora(item['path'], **kw)
                for item in group.get('part', []) or []:
                    tgt.load_part(item['path'],
                                  alpha=float(item.get('alpha', 1.0)),
                                  layers=item.get('layers', 'all'),
                                  load_ema=load_ema,
                                  base_alpha=group.get('base_model_alpha'))
                # plugin state (ControlNet): reference cfg_net_tools.py:294-315
                for pname, item in dict(group.get('plugin') or {}).items():
                    states = auto_manager(item['path']).load_plugins(
                        item['path'], unet_cfg=world['unet_cfg'])
                    st = states.get(pname)
                    if st is None and states:
                        st = next(iter(states.values()))
                    if st is not None:
                        self.plugins[pname] = {
                            'params': jax.tree_util.tree_map(jnp.asarray, st),
                            'scale': float(item.get('alpha', 1.0))}
        # pre-0.9 biased LoRAs: the reference creates the host bias at
        # reparameterization time (lora_base_patch.py:150-170). Functional
        # analog: rebuild the UNet with declared q/k/v biases
        # (UNetConfig.qkv_bias) and attach zero host biases so the deltas
        # apply onto them.
        from ..adapt.overlay import attach_host_biases, overlay_bias_paths
        need_bias = overlay_bias_paths(
            unet_merger.overlays + neg_merger.overlays, unet_merger.params)
        if need_bias:
            import dataclasses
            not_qkv = [p for p in need_bias
                       if p.rsplit('.', 1)[-1] not in ('to_q', 'to_k', 'to_v')]
            if not_qkv:
                raise ValueError(
                    f'LoRA bias deltas target bias-free non-attention '
                    f'layers {not_qkv[:3]} — no host rebuild is available '
                    'for these; strip them with strip_overlay_bias(...)')
            ucfg = dataclasses.replace(world['unet_cfg'], qkv_bias=True)
            old = world['unet']
            world['unet_cfg'] = ucfg
            world['unet'] = type(old)(ucfg, dtype=old.dtype, remat=old.remat)
            qkv = [p for p in module_paths(unet_merger.params)
                   if p.rsplit('.', 1)[-1] in ('to_q', 'to_k', 'to_v')]
            unet_merger.params = attach_host_biases(unet_merger.params, qkv)
            neg_merger.params = attach_host_biases(neg_merger.params, qkv)
        self.unet_params = unet_merger.merged()
        self.unet_params_neg = neg_merger.merged() if has_neg else None
        self.te_params = te_merger.merged()
        if self.dtype == jnp.bfloat16:
            # inference weight cast: halves HBM weight traffic per UNet
            # call. Grouped donated casts keep the fp32+bf16 peak bounded
            # (an eager tree_map holds both full trees live and OOMs a
            # 16G chip at SDXL scale — see utils/casting.py).
            from ..utils.casting import cast_tree_bf16 as cast
            self.unet_params = cast(self.unet_params)
            if self.unet_params_neg is not None:
                self.unet_params_neg = cast(self.unet_params_neg)
            world['vae_params'] = cast(world['vae_params'])

        # --- embeddings dir ---
        emb_dir = (cfgs.get('emb_dir') or mcfg.get('emb_dir'))
        rows = []
        if emb_dir and os.path.isdir(emb_dir):
            from ..ckpt.formats import load_webui_embedding
            for f in sorted(os.listdir(emb_dir)):
                if f.endswith('.pt'):
                    name, vecs = load_webui_embedding(os.path.join(emb_dir, f))
                    self.tokenizer.add_word(name, n_vectors=vecs.shape[0])
                    rows.append(vecs)
        if rows:
            flat = np.concatenate(rows, axis=0)
            if world.get('sdxl'):
                # SDXL embeddings are the concat of both encoders' vectors
                from ..models.compose.sdxl_te import split_sdxl_embedding
                dim_l = world['te_cfg'].hidden_size
                parts = split_sdxl_embedding(flat, dim_l=dim_l)
                self.emb_ext = {k: jnp.asarray(v) for k, v in parts.items()}
            else:
                self.emb_ext = jnp.asarray(flat)

        # plugin (ControlNet) module shared by all loaded plugin states
        self._controlnet = None
        if self.plugins:
            import math
            from ..models.controlnet import ControlNet
            vae_scale = 2 ** (len(world['vae_cfg'].block_out_channels) - 1)
            self._controlnet = ControlNet(world['unet_cfg'], dtype=self.dtype,
                                          cond_stages=int(math.log2(vae_scale)))

    # ------------------------------------------------------------- run ----
    def _load_image(self, path: str, width: int, height: int) -> jnp.ndarray:
        from PIL import Image
        from ..data.utils import to_model_input
        img = Image.open(path).convert('RGB').resize((width, height),
                                                     Image.BICUBIC)
        return jnp.asarray(to_model_input(img))[None]

    def vis_images(self, prompt, negative_prompt='', **kw) -> np.ndarray:
        ia = dict(self.cfgs.get('infer_args') or {})
        ia.update(kw)
        seed = ia.pop('seed', self.cfgs.get('seed'))
        if seed is None:
            seed = int(time.time()) % (1 << 31)
        mode = str(self.cfgs.get('mode', 't2i')).lower()
        want_hist = bool(ia.pop('return_x0_history', False))
        width, height = int(ia.get('width', 512)), int(ia.get('height', 512))
        common = dict(num_steps=int(ia.get('inference_steps',
                                           ia.get('num_steps', 20))),
                      guidance_scale=float(ia.get('guidance_scale', 7.5)),
                      sampler=str(ia.get('sampler', 'dpm++_2m')),
                      seed=int(seed), emb_ext=self.emb_ext)
        skw = dict(ia.get('sampler_kwargs') or {})
        if ia.get('karras') or ia.get('use_karras_sigmas'):
            skw['use_karras_sigmas'] = True
        if skw:
            common['sampler_kwargs'] = skw
        if ia.get('deep_cache_interval') and mode in ('t2i', 'txt2img'):
            # DeepCache acceleration (infer_args.deep_cache_interval: N —
            # deep UNet levels run every Nth step; opt-in, approximate).
            # Incompatible with the DreamArtist dual branch and ControlNet
            # residual taps — drop it with a warning instead of erroring
            # deep inside the jitted loop.
            ex_in = self.cfgs.get('ex_input')
            if (self.pipe.unet_params_neg is not None
                    or (ex_in and ex_in.get('cond') is not None)):
                import logging
                logging.getLogger('hcpdiff_tpu').warning(
                    'deep_cache_interval ignored: incompatible with '
                    'DreamArtist/ControlNet generation')
            else:
                common['deep_cache_interval'] = int(ia['deep_cache_interval'])
        # ControlNet condition image (reference ex_input + ControlNetProcessor,
        # visualizer.py:180-183)
        ex_input = self.cfgs.get('ex_input')
        if ex_input and ex_input.get('cond') is not None:
            from ..config.instantiate import instantiate
            from ..data.processor import ControlNetProcessor
            node = ex_input['cond']
            proc = (instantiate(node) if isinstance(node, dict)
                    else ControlNetProcessor(node))
            bs = int(self.cfgs.get('bs', 1))
            cond = jnp.asarray(proc(width=width, height=height, batch_size=bs))
            use_cfg = (float(common['guidance_scale']) > 1.0
                       or self.pipe.unet_params_neg is not None)
            if use_cfg:
                cond = jnp.concatenate([cond, cond], axis=0)
            common['extra_cond'] = dict(common.get('extra_cond') or {},
                                        cond=cond)
        if mode in ('i2i', 'img2img', 'inpaint') and self.cfgs.get('init_image'):
            init = self._load_image(self.cfgs['init_image'], width, height)
            init_lat = self.pipe.encode(init)
            strength = float(ia.get('strength', 0.75))
            if mode == 'inpaint' and self.cfgs.get('mask_image'):
                from PIL import Image
                m = Image.open(self.cfgs['mask_image']).convert('L')
                m = m.resize((init_lat.shape[2], init_lat.shape[1]))
                mask = (jnp.asarray(np.asarray(m), jnp.float32) / 255.0
                        )[None, :, :, None]
                return self.pipe.inpaint(init_lat, mask, prompt,
                                         negative_prompt, strength=strength,
                                         **common)
            return self.pipe.img2img(init_lat, prompt, negative_prompt,
                                     strength=strength, **common)
        return self.pipe.txt2img(prompt, negative_prompt, width=width,
                                 height=height,
                                 batch_size=int(self.cfgs.get('bs', 1)),
                                 return_x0_history=want_hist, **common)

    def vis_to_dir(self, prompt=None, negative_prompt=None, num: int = 1, **kw):
        prompt = prompt if prompt is not None else self.cfgs.get('prompt', '')
        negative_prompt = (negative_prompt if negative_prompt is not None
                           else self.cfgs.get('neg_prompt', ''))
        all_imgs = []
        base_seed = self.cfgs.get('seed')
        want_inter = any(getattr(i, 'need_inter_imgs', False)
                         for i in self.interfaces)
        for i in range(num):
            seed = (int(base_seed) + i) if base_seed is not None else None
            kw2 = dict(kw, seed=seed) if seed is not None else dict(kw)
            if want_inter:
                out = self.vis_images(prompt, negative_prompt,
                                      return_x0_history=True, **kw2)
                imgs, x0s = out
                n_steps = x0s.shape[0]
                for si in range(n_steps):
                    frame = self.pipe.decode(x0s[si])
                    for itf in self.interfaces:
                        itf.on_inter_step(si, n_steps, None, x0s[si], frame)
            else:
                imgs = self.vis_images(prompt, negative_prompt, **kw2)
            info = {'prompt': prompt, 'negative_prompt': negative_prompt,
                    'seed': seed, **to_plain(self.cfgs.get('infer_args') or {})}
            for itf in self.interfaces:
                itf.on_infer_finish(imgs, info)
            all_imgs.append(imgs)
        return np.concatenate(all_imgs, axis=0)

    # ------------------------------------------------------- save_model ----
    def save_model(self, path: str):
        """Collapse merged LoRAs into base weights and export a full
        diffusers-layout pipeline (reference visualizer.py:81-97)."""
        from ..ckpt.manager import CkptManagerDiffusers
        CkptManagerDiffusers().save_pipeline(
            path,
            unet_params=jax.device_get(self.unet_params),
            unet_cfg=self.world['unet_cfg'],
            vae_params=jax.device_get(self.world['vae_params']),
            vae_cfg=self.world['vae_cfg'],
            te_params=jax.device_get(self.te_params),
            te_cfg=self.world['te_cfg'])


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument('--cfg', required=True)
    args, unknown = p.parse_known_args()
    cfgs = load(args.cfg, unknown)
    viser = Visualizer(cfgs)
    viser.vis_to_dir(num=int(cfgs.get('num', 1)))


if __name__ == '__main__':
    main()
