"""Shared tiny-model fixtures for end-to-end tests."""
import jax
import jax.numpy as jnp

from hcpdiff_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from hcpdiff_tpu.models.unet import UNetConfig, UNet2DCondition
from hcpdiff_tpu.models.vae import VAEConfig, AutoencoderKL
from hcpdiff_tpu.models.text_frontend import TextEncoderFrontend
from hcpdiff_tpu.utils.clip_tokenizer import CLIPTokenizer
from hcpdiff_tpu.diffusion.schedules import NoiseSchedule
from hcpdiff_tpu.infer.pipeline import DiffusionPipeline


def tiny_world(seed=0, n_repeats=1, clip_skip=0, dtype=jnp.float32):
    """Build a tiny but complete SD world: tokenizer, TE, UNet, VAE."""
    rng = jax.random.PRNGKey(seed)
    r1, r2, r3 = jax.random.split(rng, 3)

    tk = CLIPTokenizer.tiny(words=['cat', 'dog', 'photo', 'painting'])
    te_cfg = CLIPTextConfig.tiny(vocab_size=tk.vocab_size,
                                 eos_token_id=tk.eos_token_id,
                                 bos_token_id=tk.bos_token_id)
    te = CLIPTextModel(te_cfg, dtype=dtype)
    te_params = te.init(r1, jnp.zeros((1, 77), jnp.int32))['params']

    unet_cfg = UNetConfig.tiny(cross_attention_dim=te_cfg.hidden_size)
    unet = UNet2DCondition(unet_cfg, dtype=dtype)
    unet_params = unet.init(r2, jnp.zeros((1, 8, 8, 4)), jnp.array([0]),
                            jnp.zeros((1, 77, te_cfg.hidden_size)))['params']

    vae_cfg = VAEConfig.tiny()
    vae = AutoencoderKL(vae_cfg, dtype=dtype)
    vae_params = vae.init(r3, jnp.zeros((1, 32, 32, 3)), jax.random.PRNGKey(0))['params']

    frontend = TextEncoderFrontend(tk, te, te_params, n_repeats=n_repeats,
                                   clip_skip=clip_skip)
    return dict(tokenizer=tk, te=te, te_params=te_params, te_cfg=te_cfg,
                unet=unet, unet_params=unet_params, unet_cfg=unet_cfg,
                vae=vae, vae_params=vae_params, vae_cfg=vae_cfg,
                frontend=frontend)


def make_pipeline(world, schedule=None):
    unet = world['unet']

    def unet_apply(params, x, t, ctx, **extra):
        return unet.apply({'params': params}, x, t, ctx, **extra)

    return DiffusionPipeline(unet_apply, world['unet_params'],
                             world['vae'], world['vae_params'],
                             world['frontend'],
                             schedule=schedule or NoiseSchedule.make())
