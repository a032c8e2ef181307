"""Workflow actions (reference hcpdiff/workflow/{io,text,diffusion,vae,
model,utils}.py) — the yaml-graph vocabulary.

Dataflow convention: ``states`` carries latents/embeddings/timesteps;
``memory`` holds models (unet_apply, params, vae, frontend, sampler...).
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import BasicAction, MemoryMixin
from ..diffusion.samplers import make_sampler
from ..diffusion.schedules import NoiseSchedule


# ----------------------------------------------------------------- io ----

class LoadModelsAction(BasicAction, MemoryMixin):
    """Build models into memory (reference workflow/io.py:13)."""

    def __init__(self, pretrained_model: Optional[str] = None, dtype: str = 'bf16',
                 **kw):
        super().__init__(**kw)
        self.pretrained = pretrained_model
        self.dtype = jnp.bfloat16 if dtype in ('bf16', 'fp16', 'amp') else jnp.float32

    def __call__(self, memory=None, **states):
        from ..models.factory import build_models
        from ..models.text_frontend import TextEncoderFrontend
        world = build_models(self.pretrained, dtype=self.dtype)
        memory.update(world)
        unet = world['unet']
        memory['unet_apply'] = lambda p, x, t, ctx, **e: unet.apply(
            {'params': p}, x, t, ctx, **e)
        memory['frontend'] = TextEncoderFrontend(world['tokenizer'] or
                                                 _tiny_tokenizer(),
                                                 world['te'], world['te_params'])
        memory['schedule'] = NoiseSchedule.make()
        return states


def _tiny_tokenizer():
    from ..utils.clip_tokenizer import CLIPTokenizer
    return CLIPTokenizer.tiny(words=['cat', 'dog', 'photo'])


class BuildModelLoaderAction(BasicAction, MemoryMixin):
    def __call__(self, memory=None, **states):
        from ..infer.visualizer import ModelMerger
        memory['model_loader'] = ModelMerger(memory['unet_params'],
                                             memory['aliases']['unet'])
        return states


class LoadLoraAction(BasicAction, MemoryMixin):
    def __init__(self, path: str, alpha: float = 1.0, **kw):
        super().__init__(**kw)
        self.path, self.alpha = path, float(alpha)

    def __call__(self, memory=None, **states):
        loader = memory['model_loader']
        loader.load_lora(self.path, self.alpha)
        memory['unet_params'] = loader.merged()
        return states


class LoadPartAction(BasicAction, MemoryMixin):
    def __init__(self, path: str, alpha: float = 1.0, **kw):
        super().__init__(**kw)
        self.path, self.alpha = path, float(alpha)

    def __call__(self, memory=None, **states):
        loader = memory['model_loader']
        loader.load_part(self.path, self.alpha)
        memory['unet_params'] = loader.merged()
        return states


class RemoveLoraAction(BasicAction, MemoryMixin):
    def __call__(self, memory=None, **states):
        loader = memory['model_loader']
        loader.overlays.clear()
        loader.scales.clear()
        memory['unet_params'] = loader.merged()
        return states


def _plugin_unet_apply(memory):
    """Wrap the base unet_apply so loaded plugins inject residual taps when
    a ``cond`` kwarg is present (reference workflow/io.py LoadPluginAction +
    MultiPluginBlock injection, hcpdiff/models/controlnet.py:69-88)."""
    base = memory['unet_apply_base']
    plugins = memory['plugins']

    def apply_fn(p, x, t, ctx, cond=None, **extra):
        if cond is not None and plugins:
            down_acc, mid_acc = None, None
            for cn, cp, scale in plugins.values():
                d, m = cn.apply({'params': cp}, x, t, ctx, cond)
                d = [r * scale for r in d]
                m = m * scale
                if down_acc is None:
                    down_acc, mid_acc = d, m
                else:
                    down_acc = [a + b for a, b in zip(down_acc, d)]
                    mid_acc = mid_acc + m
            extra = dict(extra, down_residuals=down_acc, mid_residual=mid_acc)
        return base(p, x, t, ctx, **extra)

    return apply_fn


class LoadPluginAction(BasicAction, MemoryMixin):
    """Load a ControlNet plugin ckpt and hook it into unet_apply
    (reference workflow/io.py:13-150 LoadPluginAction)."""

    def __init__(self, path: str, name: str = 'controlnet1',
                 alpha: float = 1.0, **kw):
        super().__init__(**kw)
        self.path, self.name, self.alpha = path, name, float(alpha)

    def __call__(self, memory=None, **states):
        import math
        from ..ckpt.manager import auto_manager
        from ..models.controlnet import ControlNet
        all_states = auto_manager(self.path).load_plugins(
            self.path, unet_cfg=memory['unet_cfg'])
        st = all_states.get(self.name)
        if st is None and all_states:
            st = next(iter(all_states.values()))
        vae_scale = 2 ** (len(memory['vae_cfg'].block_out_channels) - 1)
        cn = ControlNet(memory['unet_cfg'], dtype=jnp.float32,
                        cond_stages=int(math.log2(vae_scale)))
        params = jax.tree_util.tree_map(jnp.asarray, st)
        memory.setdefault('unet_apply_base', memory['unet_apply'])
        memory.setdefault('plugins', {})[self.name] = (cn, params, self.alpha)
        memory['unet_apply'] = _plugin_unet_apply(memory)
        return states


class RemovePluginAction(BasicAction, MemoryMixin):
    def __init__(self, name: str = 'controlnet1', **kw):
        super().__init__(**kw)
        self.name = name

    def __call__(self, memory=None, **states):
        # keep the wrapper (it is inert with no plugins and still swallows a
        # stray ``cond`` kwarg); just drop the plugin state
        (memory.get('plugins') or {}).pop(self.name, None)
        return states


class BuildPluginAction(BasicAction, MemoryMixin):
    """Build a FRESH plugin (no trained state) and hook it into unet_apply
    (reference workflow/io.py BuildPluginAction + make_plugin). ``cfg`` may
    be a ``_target_`` dict (generic plugin dispatch, same protocol as the
    Trainer) or omitted for a default ControlNet initialized from the UNet
    encoder weights."""

    def __init__(self, name: str = 'controlnet1', alpha: float = 1.0,
                 cfg: Optional[dict] = None, **kw):
        super().__init__(**kw)
        self.name, self.alpha, self.cfg = name, float(alpha), cfg

    def __call__(self, memory=None, **states):
        from ..config.instantiate import locate
        from ..models.controlnet import build_controlnet
        vae_scale = 2 ** (len(memory['vae_cfg'].block_out_channels) - 1)
        spec = dict(self.cfg or {})
        tgt = str(spec.pop('_target_', ''))
        spec.pop('_partial_', None)
        if tgt:
            # an explicit _target_ must resolve — a typo'd plugin class
            # silently building the default ControlNet would train/infer
            # the wrong plugin (same dispatch contract as the Trainer,
            # trainer.py build_trainables)
            try:
                cls = locate(tgt)
            except Exception as e:
                raise ValueError(
                    f'BuildPluginAction: cannot resolve plugin _target_ '
                    f'{tgt!r}: {e}') from e
            builder = getattr(cls, 'from_unet', None)
            if builder is None and 'ControlNet' in tgt:
                builder = build_controlnet
            if builder is None:
                raise ValueError(
                    f'BuildPluginAction: {tgt!r} has no from_unet builder '
                    '(see models/controlnet.py build_controlnet protocol)')
        else:
            builder = build_controlnet   # no cfg: default ControlNet
        plugin, params = builder(jax.random.PRNGKey(0), memory['unet_cfg'],
                                 memory['unet_params'], vae_scale=vae_scale,
                                 **spec)
        memory.setdefault('unet_apply_base', memory['unet_apply'])
        memory.setdefault('plugins', {})[self.name] = (plugin, params, self.alpha)
        memory['unet_apply'] = _plugin_unet_apply(memory)
        return states


class InputFeederAction(BasicAction, MemoryMixin):
    """Feed extra inputs (ControlNet cond image...) into the diffusion
    states (reference workflow/diffusion.py:19-31 InputFeederAction — there
    it pushes to plugin input_feeders; here downstream NoisePredAction reads
    ``states['cond']``). ``cond`` may be an image path / array / processor
    ``_target_`` dict."""

    def __init__(self, ex_inputs: Dict[str, Any], width: int = 512,
                 height: int = 512, **kw):
        super().__init__(**kw)
        self.ex_inputs = ex_inputs
        self.w, self.h = int(width), int(height)

    def __call__(self, memory=None, bs: int = 1, **states):
        out = dict(states)
        for key, node in self.ex_inputs.items():
            if key == 'cond':
                from ..config.instantiate import instantiate
                from ..data.processor import ControlNetProcessor
                if isinstance(node, dict):
                    node = instantiate(node)
                if not isinstance(node, ControlNetProcessor) and not hasattr(node, 'ndim'):
                    node = ControlNetProcessor(node)
                if isinstance(node, ControlNetProcessor):
                    node = node(width=self.w, height=self.h, batch_size=bs)
                out['cond'] = jnp.asarray(node)
            else:
                out[key] = node
        out['bs'] = bs
        return out


class SaveImageAction(BasicAction):
    def __init__(self, save_root: str = 'output/', image_type: str = 'png', **kw):
        super().__init__(**kw)
        self.save_root, self.image_type = save_root, image_type

    def forward(self, images=None, **states):
        from ..infer.interfaces import DiskInterface
        DiskInterface(self.save_root, self.image_type).on_infer_finish(images)
        return {'images': images, **states}


# --------------------------------------------------------------- text ----

class TextHookAction(BasicAction, MemoryMixin):
    """Configure N_repeats / clip_skip on the frontend (workflow/text.py:11)."""

    def __init__(self, N_repeats: int = 1, clip_skip: int = 0,
                 clip_final_norm: bool = True, **kw):
        super().__init__(**kw)
        self.n, self.skip, self.fn = int(N_repeats), int(clip_skip), bool(clip_final_norm)

    def __call__(self, memory=None, **states):
        fe = memory['frontend']
        fe.n_repeats, fe.clip_skip, fe.clip_final_norm = self.n, self.skip, self.fn
        return states


class TextEncodeAction(BasicAction, MemoryMixin):
    def __init__(self, prompt: Optional[str] = None, negative_prompt: str = '',
                 bs: int = 1, **kw):
        super().__init__(**kw)
        self.prompt, self.neg, self.bs = prompt, negative_prompt, int(bs)

    def __call__(self, memory=None, prompt=None, negative_prompt=None, **states):
        prompt = prompt if prompt is not None else self.prompt
        neg = negative_prompt if negative_prompt is not None else self.neg
        fe = memory['frontend']
        hidden, pooled = fe.encode([neg] * self.bs + [prompt] * self.bs,
                                   emb_ext=memory.get('emb_ext'))
        return {'text_emb': hidden, 'pooled': pooled, 'bs': self.bs, **states}


class AttnMultTextEncodeAction(TextEncodeAction):
    """Same as TextEncode (attention multipliers always parsed by the
    frontend's {w:x} syntax, workflow/text.py:48)."""


# ---------------------------------------------------------- diffusion ----

class SeedAction(BasicAction):
    def __init__(self, seed: Optional[int] = None, **kw):
        super().__init__(**kw)
        self.seed = seed

    def forward(self, **states):
        import time
        seed = self.seed if self.seed is not None else int(time.time()) % (1 << 31)
        return {'rng': jax.random.PRNGKey(seed), **states}


class PrepareDiffusionAction(BasicAction, MemoryMixin):
    def __init__(self, dtype: str = 'bf16', **kw):
        super().__init__(**kw)

    def __call__(self, memory=None, **states):
        memory.setdefault('schedule', NoiseSchedule.make())
        return states


class MakeTimestepsAction(BasicAction, MemoryMixin):
    def __init__(self, N_steps: int = 20, sampler: str = 'dpm++_2m',
                 strength: Optional[float] = None, **kw):
        super().__init__(**kw)
        self.n, self.sampler_name, self.strength = int(N_steps), sampler, strength

    def __call__(self, memory=None, **states):
        sampler = make_sampler(self.sampler_name, memory['schedule'], self.n)
        memory['sampler'] = sampler
        ts = list(range(self.n))
        if self.strength is not None:
            start = self.n - int(self.n * self.strength)
            ts = ts[start:]
        return {'timesteps': ts, **states}


class MakeLatentAction(BasicAction, MemoryMixin):
    def __init__(self, width: int = 512, height: int = 512, **kw):
        super().__init__(**kw)
        self.w, self.h = int(width), int(height)

    def __call__(self, memory=None, rng=None, bs: int = 1, **states):
        scale = 2 ** (len(memory['vae'].cfg.block_out_channels) - 1)
        rng, sub = jax.random.split(rng)
        lat = jax.random.normal(sub, (bs, self.h // scale, self.w // scale, 4))
        lat = lat * memory['sampler'].init_noise_sigma
        state = memory['sampler'].init_state(lat.shape)
        return {'latents': lat, 'sampler_state': state, 'rng': rng, 'bs': bs,
                **states}


class NoisePredAction(BasicAction, MemoryMixin):
    def __init__(self, guidance_scale: float = 7.5, **kw):
        super().__init__(**kw)
        self.g = float(guidance_scale)

    def __call__(self, memory=None, latents=None, t=None, text_emb=None,
                 sampler_state=None, **states):
        sampler = memory['sampler']
        i = jnp.asarray(t)
        x_in = sampler.scale_model_input(sampler_state, latents, i)
        ts = sampler.timesteps[i]
        B = latents.shape[0]
        x2 = jnp.concatenate([x_in, x_in], axis=0)
        kw = {}
        cond = states.get('cond')
        if cond is not None:
            kw['cond'] = jnp.concatenate([cond, cond], axis=0)  # CFG-doubled
        eps = memory['unet_apply'](memory['unet_params'], x2,
                                   jnp.full((2 * B,), ts), text_emb, **kw)
        e_n, e_p = jnp.split(eps, 2, axis=0)
        pred = e_n + self.g * (e_p - e_n)
        return {'noise_pred': pred, 'latents': latents, 't': t,
                'text_emb': text_emb, 'sampler_state': sampler_state, **states}


class SampleAction(BasicAction, MemoryMixin):
    def __call__(self, memory=None, latents=None, noise_pred=None, t=None,
                 sampler_state=None, rng=None, **states):
        sampler = memory['sampler']
        rng, sub = jax.random.split(rng)
        latents, sampler_state, x0 = sampler.step(sampler_state, noise_pred,
                                                  jnp.asarray(t), latents, sub)
        return {'latents': latents, 'sampler_state': sampler_state, 'rng': rng,
                'x0_pred': x0, **states}


class DiffusionStepAction(BasicAction, MemoryMixin):
    """NoisePred + Sample fused (reference workflow/diffusion.py:192-201)."""

    def __init__(self, guidance_scale: float = 7.5, **kw):
        super().__init__(**kw)
        self.pred = NoisePredAction(guidance_scale=guidance_scale)
        self.sample = SampleAction()

    def __call__(self, memory=None, **states):
        states = self.pred(memory=memory, **states)
        return self.sample(memory=memory, **states)


class X0PredAction(BasicAction):
    def forward(self, x0_pred=None, **states):
        return {'latents': x0_pred, 'x0_pred': x0_pred, **states}


# ----------------------------------------------------------------- vae ----

class EncodeAction(BasicAction, MemoryMixin):
    def __call__(self, memory=None, images=None, rng=None, **states):
        vae = memory['vae']
        mean, logvar = vae.apply({'params': memory['vae_params']},
                                 jnp.asarray(images), method='encode')
        lat = mean * vae.cfg.scaling_factor
        return {'latents': lat, 'rng': rng, **states}


class VaeOptimizeAction(BasicAction, MemoryMixin):
    """VAE decode memory knobs (reference workflow/vae.py:8-23
    VaeOptimizeAction). ``slicing`` decodes in per-sample chunks so peak
    activation HBM is bounded by one image instead of the whole batch —
    the TPU analog of diffusers ``enable_slicing``. Spatial ``tiling`` is
    not supported (HBM-resident design; a 1024px decode fits v5e)."""

    def __init__(self, slicing: bool = True, tiling: bool = False, **kw):
        super().__init__(**kw)
        if tiling:
            raise NotImplementedError(
                'VAE spatial tiling is not supported on the TPU backend; '
                'use slicing (per-sample decode chunks) instead')
        self.slicing = bool(slicing)

    def __call__(self, memory=None, **states):
        memory['vae_slicing'] = self.slicing
        return states


class DecodeAction(BasicAction, MemoryMixin):
    def __call__(self, memory=None, latents=None, **states):
        vae = memory['vae']
        dec = lambda z: vae.apply({'params': memory['vae_params']},
                                  z / vae.cfg.scaling_factor, method='decode')
        if memory.get('vae_slicing') and latents.shape[0] > 1:
            img = jnp.concatenate([dec(latents[i:i + 1])
                                   for i in range(latents.shape[0])], axis=0)
        else:
            img = dec(latents)
        img = np.asarray(jnp.clip(img * 0.5 + 0.5, 0, 1))
        return {'images': img, 'latents': latents, **states}


# --------------------------------------------------------------- utils ----

class LatentResizeAction(BasicAction):
    """highres-fix latent upscale (reference workflow/utils.py:8)."""

    def __init__(self, width: int = 1024, height: int = 1024, scale: int = 8,
                 method: str = 'bilinear', **kw):
        super().__init__(**kw)
        self.w, self.h, self.scale, self.method = width, height, scale, method

    def forward(self, latents=None, **states):
        B, _, _, C = latents.shape
        out = jax.image.resize(latents, (B, self.h // self.scale,
                                         self.w // self.scale, C), self.method)
        return {'latents': out, **states}


class ImageResizeAction(BasicAction):
    def __init__(self, width: int = 1024, height: int = 1024,
                 method: str = 'bilinear', **kw):
        super().__init__(**kw)
        self.w, self.h, self.method = width, height, method

    def forward(self, images=None, **states):
        B, _, _, C = np.asarray(images).shape
        out = jax.image.resize(jnp.asarray(images), (B, self.h, self.w, C),
                               self.method)
        return {'images': np.asarray(out), **states}
