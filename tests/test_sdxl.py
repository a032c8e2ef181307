"""SDXL composition: dual-TE frontend, pooled/time_ids conditioning, e2e."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hcpdiff_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from hcpdiff_tpu.models.compose.sdxl_te import (SDXLTextEncoderFrontend,
                                                concat_sdxl_embedding,
                                                make_sdxl_time_ids,
                                                split_sdxl_embedding)
from hcpdiff_tpu.models.unet import UNetConfig, UNet2DCondition
from hcpdiff_tpu.models.vae import VAEConfig, AutoencoderKL
from hcpdiff_tpu.utils.clip_tokenizer import CLIPTokenizer
from hcpdiff_tpu.infer.pipeline import DiffusionPipeline


@pytest.fixture(scope='module')
def sdxl_world():
    tk = CLIPTokenizer.tiny(words=['cat', 'photo'])
    c1 = CLIPTextConfig.tiny(vocab_size=tk.vocab_size, hidden_size=32,
                             eos_token_id=tk.eos_token_id,
                             bos_token_id=tk.bos_token_id)
    c2 = CLIPTextConfig.tiny(vocab_size=tk.vocab_size, hidden_size=48,
                             eos_token_id=tk.eos_token_id,
                             bos_token_id=tk.bos_token_id,
                             projection_dim=48)
    te1 = CLIPTextModel(c1)
    te2 = CLIPTextModel(c2)
    p1 = te1.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))['params']
    p2 = te2.init(jax.random.PRNGKey(1), jnp.zeros((1, 77), jnp.int32))['params']

    ucfg = UNetConfig.tiny_sdxl(
        cross_attention_dim=32 + 48,
        projection_class_embeddings_input_dim=8 * 6 + 48)
    unet = UNet2DCondition(ucfg, dtype=jnp.float32)
    up = unet.init(jax.random.PRNGKey(2), jnp.zeros((1, 8, 8, 4)),
                   jnp.array([0]), jnp.zeros((1, 77, 80)),
                   pooled_text_emb=jnp.zeros((1, 48)),
                   time_ids=jnp.zeros((1, 6)))['params']
    vcfg = VAEConfig.tiny()
    vae = AutoencoderKL(vcfg, dtype=jnp.float32)
    vp = vae.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)),
                  jax.random.PRNGKey(0))['params']
    fe = SDXLTextEncoderFrontend(tk, te1, p1, te2, p2)
    return dict(tk=tk, unet=unet, up=up, ucfg=ucfg, vae=vae, vp=vp, fe=fe)


def test_dual_te_concat(sdxl_world):
    w = sdxl_world
    hidden, pooled = w['fe'].encode(['a photo of cat'])
    assert hidden.shape[-1] == 80  # 32 + 48
    assert pooled.shape[-1] == 48  # projected TE2 pooled
    assert np.isfinite(np.asarray(hidden)).all()


def test_sdxl_txt2img_e2e(sdxl_world):
    w = sdxl_world

    def unet_apply(p, x, t, ctx, **extra):
        return w['unet'].apply({'params': p}, x, t, ctx, **extra)

    pipe = DiffusionPipeline(unet_apply, w['up'], w['vae'], w['vp'], w['fe'],
                             text_time=True)
    img = pipe.txt2img('a photo of cat', 'blurry', width=32, height=32,
                       num_steps=2, sampler='euler', seed=1)
    assert img.shape == (1, 32, 32, 3)
    assert np.isfinite(img).all()


def test_embedding_split_concat():
    v = np.random.default_rng(0).normal(size=(3, 768 + 1280)).astype(np.float32)
    parts = split_sdxl_embedding(v)
    assert parts['clip_L'].shape == (3, 768)
    assert parts['clip_bigG'].shape == (3, 1280)
    np.testing.assert_array_equal(concat_sdxl_embedding(parts), v)


def test_time_ids():
    tid = make_sdxl_time_ids((512, 768), (10, 20), (1024, 1024))
    assert tid.tolist() == [768, 512, 20, 10, 1024, 1024]
