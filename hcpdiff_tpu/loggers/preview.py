"""Training-time image previewer (reference
hcpdiff/loggers/preview/image_previewer.py:17-149): builds an inference
pipeline over the LIVE training parameters (base + current overlay pack) and
samples preview images every image_log_step.

No VAE offload dance needed on TPU — the jitted preview loop shares the
resident weights.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..infer.pipeline import DiffusionPipeline
from ..trainer.assemble import assemble


class ImagePreviewer:
    def __init__(self, trainer, prompt: str = '', negative_prompt: str = '',
                 width: int = 256, height: int = 256, num_steps: int = 20,
                 guidance_scale: float = 7.5, sampler: str = 'ddim',
                 seed: int = 42, **kw):
        self.trainer = trainer
        self.prompt = prompt or (trainer.cfgs.get('vis_info') or {}).get('prompt') or 'a photo'
        self.negative_prompt = negative_prompt
        self.width, self.height = int(width), int(height)
        self.num_steps = int(num_steps)
        self.guidance_scale = float(guidance_scale)
        self.sampler = sampler
        self.seed = int(seed)

    def preview_dict(self) -> Dict[str, np.ndarray]:
        t = self.trainer
        pack = jax.device_get(t.state.pack)
        unet_p, te_p, emb_ext = assemble(t.unet_params, t.te_params, pack,
                                         t.lora_scales)
        unet = t.unet
        frontend = t.frontend
        old_params = frontend.params
        frontend.params = te_p
        try:
            pipe = DiffusionPipeline(
                lambda p, x, ts, ctx, **e: unet.apply({'params': p}, x, ts, ctx, **e),
                unet_p, t.vae, t.vae_params, frontend,
                schedule=t.noise_schedule)
            img = pipe.txt2img(self.prompt, self.negative_prompt,
                               width=self.width, height=self.height,
                               num_steps=self.num_steps,
                               guidance_scale=self.guidance_scale,
                               sampler=self.sampler, seed=self.seed,
                               emb_ext=emb_ext)
        finally:
            frontend.params = old_params
        return {'preview': img[0]}
