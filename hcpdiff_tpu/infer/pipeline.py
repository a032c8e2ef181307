"""Inference pipelines: jit-compiled CFG denoise loop + VAE codecs.

The reference runs a python denoise loop through hooked diffusers pipelines
(hcpdiff/utils/pipe_hook.py:33-171 T2I, :173 I2I, :322 Inpaint) with
xFormers attention and an optional stable-fast compile (viser_fast.py).
Here the WHOLE loop — CFG batch doubling, UNet, guidance combine, sampler
step — is one ``lax.scan`` under ``jit``: compiled once per
(resolution, steps, sampler) and pinned on-device. x0 previews come back as
scan outputs, so step callbacks read them host-side without re-entering the
device (reference callback protocol pipe_hook.py:140-153).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.samplers import BaseSampler, make_sampler
from ..diffusion.schedules import NoiseSchedule


class DenoiseLoop:
    """Compiled CFG denoise loop for one (sampler, steps) setting.

    ``deep_cache_interval > 1`` enables DeepCache-style acceleration
    (PAPERS.md 'Cache Me if You Can' / DeepCache): the UNet's deep levels
    run only every Nth step; in between, the cached deep feature is
    spliced in and only the shallowest down level + last up level
    recompute (models/unet.py deep_cache protocol). Both step variants
    live in one ``lax.cond`` inside the scan, so the whole accelerated
    loop is still a single compiled program. Opt-in — outputs change
    (slightly) vs the exact loop."""

    def __init__(self, unet_apply: Callable, sampler: BaseSampler,
                 return_x0_every: int = 0, deep_cache_interval: int = 0):
        self.unet_apply = unet_apply
        self.sampler = sampler
        self.return_x0_every = return_x0_every
        self.deep_cache_interval = int(deep_cache_interval)
        self._jitted = jax.jit(self._run, static_argnames=('cfg_batch',))

    def _run(self, unet_params, latents, ctx, rng, guidance_scale,
             extra_cond: Optional[Dict[str, jnp.ndarray]] = None,
             unet_params_neg=None, cfg_batch: bool = True):
        """ctx: [2B or B, S, D] (neg||pos when cfg_batch).
        extra_cond: dict of additional UNet kwargs already CFG-doubled
        (SDXL pooled/time_ids, inpaint channels, controlnet cond...).
        unet_params_neg: DreamArtist negative-branch params applied to the
        uncond half (reference DreamArtistPTContext,
        hcpdiff/models/cfg_context.py:12-38)."""
        sampler = self.sampler
        B = latents.shape[0]
        latents = latents * sampler.init_noise_sigma
        state = sampler.init_state(latents.shape)
        extra = extra_cond or {}

        dc = self.deep_cache_interval
        if dc > 1 and unet_params_neg is not None:
            raise ValueError('deep_cache_interval is incompatible with the '
                             'DreamArtist dual-branch loop')

        def guidance(out):
            if cfg_batch:
                e_neg, e_pos = jnp.split(out, 2, axis=0)
                return e_neg + guidance_scale * (e_pos - e_neg)
            return out

        def model_in(x_in, t):
            if cfg_batch:
                return (jnp.concatenate([x_in, x_in], axis=0),
                        jnp.full((2 * B,), t))
            return x_in, jnp.full((B,), t)

        def body(carry, i):
            lat, st, r = carry
            r, sub = jax.random.split(r)
            x_in = sampler.scale_model_input(st, lat, i)
            t = sampler.timesteps[i]
            if cfg_batch and unet_params_neg is not None:
                ctx_n, ctx_p = jnp.split(ctx, 2, axis=0)
                tB = jnp.full((B,), t)
                # extra_cond arrives CFG-doubled; the DA branch runs the
                # halves separately, so split matching leading dims
                def half(e, idx):
                    return {k: (jnp.split(v, 2, axis=0)[idx]
                                if hasattr(v, 'ndim') and v.ndim > 0
                                and v.shape[0] == 2 * B else v)
                            for k, v in e.items()}
                e_neg = self.unet_apply(unet_params_neg, x_in, tB, ctx_n,
                                        **half(extra, 0))
                e_pos = self.unet_apply(unet_params, x_in, tB, ctx_p,
                                        **half(extra, 1))
                eps = e_neg + guidance_scale * (e_pos - e_neg)
            else:
                x2, t2 = model_in(x_in, t)
                eps = guidance(self.unet_apply(unet_params, x2, t2, ctx,
                                               **extra))
            lat, st, x0 = sampler.step(st, eps, i, lat, sub)
            return (lat, st, r), x0 if self.return_x0_every else jnp.zeros((0,))

        def body_dc(carry, i):
            lat, st, r, cache = carry
            r, sub = jax.random.split(r)
            x_in = sampler.scale_model_input(st, lat, i)
            t = sampler.timesteps[i]
            x2, t2 = model_in(x_in, t)

            def full_step(x2, t2, cache):
                out, deep = self.unet_apply(unet_params, x2, t2, ctx,
                                            return_deep=True, **extra)
                return out, deep.astype(cache.dtype)

            def reuse_step(x2, t2, cache):
                out = self.unet_apply(unet_params, x2, t2, ctx,
                                      deep_cache=cache, **extra)
                return out, cache

            out, cache = jax.lax.cond(i % dc == 0, full_step, reuse_step,
                                      x2, t2, cache)
            eps = guidance(out)
            lat, st, x0 = sampler.step(st, eps, i, lat, sub)
            return (lat, st, r, cache), (x0 if self.return_x0_every
                                         else jnp.zeros((0,)))

        if dc > 1:
            # deep-feature shape via abstract evaluation (no FLOPs)
            x2s, t2s = model_in(latents, sampler.timesteps[0])
            _, deep_s = jax.eval_shape(
                lambda p, x, t, c: self.unet_apply(p, x, t, c,
                                                   return_deep=True, **extra),
                unet_params, x2s, t2s, ctx)
            cache0 = jnp.zeros(deep_s.shape, deep_s.dtype)
            (latents, _, _, _), x0s = jax.lax.scan(
                body_dc, (latents, state, rng, cache0),
                jnp.arange(sampler.num_steps))
            return latents, x0s

        (latents, _, _), x0s = jax.lax.scan(
            body, (latents, state, rng), jnp.arange(sampler.num_steps))
        return latents, x0s

    def __call__(self, unet_params, latents, ctx, rng, guidance_scale,
                 extra_cond=None, unet_params_neg=None, cfg_batch: bool = True):
        return self._jitted(unet_params, latents, ctx, rng,
                            jnp.asarray(guidance_scale, jnp.float32),
                            extra_cond, unet_params_neg, cfg_batch=cfg_batch)


class DiffusionPipeline:
    """txt2img / img2img / inpaint over (unet, vae, text frontend).

    ``unet_apply(params, x, t, ctx, **extra)`` is any callable — the plain
    model apply or an overlay-merged apply (LoRA/plugins), so adapters don't
    change the pipeline.
    """

    def __init__(self, unet_apply: Callable, unet_params: Any,
                 vae, vae_params: Any, te_frontend,
                 schedule: Optional[NoiseSchedule] = None,
                 latent_channels: int = 4, vae_scale: Optional[int] = None,
                 text_time: bool = False):
        if vae_scale is None:
            vae_scale = 2 ** (len(vae.cfg.block_out_channels) - 1)
        self.text_time = text_time  # SDXL pooled + crop-info conditioning
        self.unet_apply = unet_apply
        self.unet_params = unet_params
        self.unet_params_neg = None   # DreamArtist negative branch (optional)
        self.vae = vae
        self.vae_params = vae_params
        self.te = te_frontend
        self.schedule = schedule or NoiseSchedule.make()
        self.latent_channels = latent_channels
        self.vae_scale = vae_scale
        self._loops: Dict[Tuple, DenoiseLoop] = {}
        self._decode = jax.jit(lambda p, z: self.vae.apply(
            {'params': p}, z / self.vae.cfg.scaling_factor, method='decode'))
        self._encode = jax.jit(lambda p, x: self.vae.apply(
            {'params': p}, x, method='encode'))

    def _loop(self, sampler_name: str, steps: int, return_x0: bool = False,
              deep_cache_interval: int = 0, **kw) -> DenoiseLoop:
        key = (sampler_name, steps, return_x0, deep_cache_interval,
               tuple(sorted(kw.items())))
        if key not in self._loops:
            sampler = make_sampler(sampler_name, self.schedule, steps, **kw)
            self._loops[key] = DenoiseLoop(
                self.unet_apply, sampler, return_x0_every=int(return_x0),
                deep_cache_interval=deep_cache_interval)
        return self._loops[key]

    use_encoder_attention_mask: bool = False

    # ---- prompt handling ----
    def encode_prompts(self, prompts: Sequence[str], negative_prompts: Sequence[str],
                       emb_ext=None):
        """One TE pass for neg+pos (reference visualizer.py:201-208)."""
        texts = list(negative_prompts) + list(prompts)
        hidden, pooled = self.te.encode(texts, emb_ext=emb_ext)
        if self.use_encoder_attention_mask and hasattr(self.te, 'attention_mask'):
            ids, _ = self.te.tokenize_batch(texts)
            self._last_ctx_mask = jnp.asarray(self.te.attention_mask(ids))
        else:
            self._last_ctx_mask = None
        return hidden, pooled

    # ---- generation ----
    def txt2img(self, prompt, negative_prompt='', width=512, height=512,
                num_steps=20, guidance_scale=7.5, sampler='dpm++_2m',
                seed: int = 0, batch_size: int = 1, emb_ext=None,
                extra_cond=None, sampler_kwargs: Optional[dict] = None,
                return_latents: bool = False,
                return_x0_history: bool = False,
                deep_cache_interval: int = 0):
        prompts = [prompt] * batch_size if isinstance(prompt, str) else list(prompt)
        negs = ([negative_prompt] * len(prompts)
                if isinstance(negative_prompt, str) else list(negative_prompt))
        B = len(prompts)
        use_cfg = float(guidance_scale) > 1.0 or self.unet_params_neg is not None
        if use_cfg:
            ctx, pooled = self.encode_prompts(prompts, negs, emb_ext)
        else:
            # guidance 1.0: skip the negative branch entirely (half the work)
            ctx, pooled = self.encode_prompts(prompts, [], emb_ext)
        if getattr(self, '_last_ctx_mask', None) is not None:
            extra_cond = dict(extra_cond or {},
                              encoder_attention_mask=self._last_ctx_mask)
        if self.text_time and (extra_cond is None
                               or 'pooled_text_emb' not in extra_cond):
            # SDXL conditioning: pooled text emb + [orig_h, orig_w, crop_y,
            # crop_x, tgt_h, tgt_w] time_ids, CFG-doubled like ctx
            tid = jnp.asarray([height, width, 0, 0, height, width],
                              jnp.float32)
            n_cond = 2 * B if use_cfg else B
            extra_cond = dict(extra_cond or {}, pooled_text_emb=pooled,
                              time_ids=jnp.tile(tid[None], (n_cond, 1)))
        h, w = height // self.vae_scale, width // self.vae_scale
        rng = jax.random.PRNGKey(seed)
        rng, r_init, r_loop = jax.random.split(rng, 3)
        latents = jax.random.normal(r_init, (B, h, w, self.latent_channels))
        loop = self._loop(sampler, num_steps, return_x0=return_x0_history,
                          deep_cache_interval=int(deep_cache_interval),
                          **(sampler_kwargs or {}))
        latents, x0s = loop(self.unet_params, latents, ctx, r_loop,
                            guidance_scale, extra_cond=extra_cond,
                            unet_params_neg=self.unet_params_neg,
                            cfg_batch=use_cfg)
        if return_x0_history:
            return (latents if return_latents else self.decode(latents)), x0s
        if return_latents:
            return latents
        return self.decode(latents)

    def img2img(self, init_latents, prompt, negative_prompt='', strength=0.75,
                num_steps=20, guidance_scale=7.5, sampler='dpm++_2m',
                seed: int = 0, emb_ext=None, extra_cond=None,
                return_latents: bool = False,
                sampler_kwargs: Optional[dict] = None):
        """init_latents: [B,h,w,4] scaled latents (use ``encode`` to make)."""
        B = init_latents.shape[0]
        prompts = [prompt] * B if isinstance(prompt, str) else list(prompt)
        negs = [negative_prompt] * B if isinstance(negative_prompt, str) else list(negative_prompt)
        ctx, _ = self.encode_prompts(prompts, negs, emb_ext)

        t_start = max(num_steps - int(num_steps * strength), 0)
        # partial loop: slice the (possibly staggered multi-eval) plan at a
        # transfer boundary — the scheduler-agnostic get_timesteps slicing
        # of reference utils/pipe_hook.py:173; heun/dpm2/dpm2_a/dpm++_2s_a/
        # dpm++_sde slice at a stage-0 plan index (samplers.py
        # TwoStageKSampler.slice_for_partial). Only pndm(prk_warmup=True)
        # still refuses (mid-RK entry is ill-defined).
        sampler_obj = make_sampler(sampler, self.schedule, num_steps,
                                   **(sampler_kwargs or {}))
        sub = sampler_obj.slice_for_partial(t_start)
        rng = jax.random.PRNGKey(seed)
        rng, r_n, r_loop = jax.random.split(rng, 3)
        noise = jax.random.normal(r_n, init_latents.shape)
        noised = self.schedule.add_noise(init_latents, noise,
                                         jnp.full((B,), sub, jnp.int32))
        part_loop = DenoiseLoop(self.unet_apply, sampler_obj)
        # DenoiseLoop multiplies by init_noise_sigma, which is exactly the
        # VP->k-space change of variables (1/sqrt(acp) for k-samplers, 1 for
        # DDIM/DDPM), so VP-noised latents go in unscaled.
        latents, _ = part_loop(self.unet_params, noised, ctx, r_loop,
                               guidance_scale, extra_cond=extra_cond)
        if return_latents:
            return latents
        return self.decode(latents)

    def inpaint(self, init_latents, mask_latent, prompt, negative_prompt='',
                strength=0.75, inpaint_model: bool = False, **kw):
        """Inpainting, two modes (reference utils/pipe_hook.py HookPipe_Inpaint
        + legacy utils/inpaint_pipe.py):

        - ``inpaint_model=True``: a 9-channel inpaint UNet — the extra
          channels carry [mask, masked_image_latents] as CFG-doubled extra
          conditioning concatenated to the latent input.
        - legacy: img2img on the full latent, final blend of the kept region.
        mask_latent: [B,h,w,1], 1 = inpaint region."""
        if inpaint_model:
            masked = init_latents * (1 - mask_latent)
            extra = jnp.concatenate([mask_latent, masked], axis=-1)
            B = init_latents.shape[0]
            extra2 = jnp.concatenate([extra, extra], axis=0)  # CFG doubled
            base_apply = self.unet_apply

            def apply_with_cond(p, x, t, ctx, **e):
                n = extra2 if x.shape[0] == 2 * B else extra
                return base_apply(p, jnp.concatenate([x, n.astype(x.dtype)],
                                                     axis=-1), t, ctx, **e)

            prompts = [prompt] * B if isinstance(prompt, str) else list(prompt)
            negs = ([negative_prompt] * B if isinstance(negative_prompt, str)
                    else list(negative_prompt))
            ctx, _ = self.encode_prompts(prompts, negs)
            sampler_name = kw.get('sampler', 'dpm++_2m')
            steps = int(kw.get('num_steps', 20))
            sampler = make_sampler(sampler_name, self.schedule, steps)
            loop = DenoiseLoop(apply_with_cond, sampler)
            rng = jax.random.PRNGKey(int(kw.get('seed', 0)))
            r0, r1 = jax.random.split(rng)
            latents = jax.random.normal(r0, init_latents.shape)
            out, _ = loop(self.unet_params, latents, ctx, r1,
                          float(kw.get('guidance_scale', 7.5)))
            return self.decode(out)
        # legacy: img2img on the full latent, then blend kept region
        out = self.img2img(init_latents, prompt, negative_prompt,
                           strength=strength, return_latents=True, **kw)
        blended = mask_latent * out + (1 - mask_latent) * init_latents
        return self.decode(blended)

    # ---- VAE ----
    def decode(self, latents) -> np.ndarray:
        img = self._decode(self.vae_params, latents)
        img = np.asarray(jnp.clip(img * 0.5 + 0.5, 0, 1))
        return img

    def encode(self, images, rng=None) -> jnp.ndarray:
        mean, logvar = self._encode(self.vae_params, jnp.asarray(images))
        if rng is None:
            z = mean
        else:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        return z * self.vae.cfg.scaling_factor
