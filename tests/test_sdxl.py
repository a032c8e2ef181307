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


# ---------------------------------------------------------- training ----

@pytest.fixture(scope='module')
def sdxl_proj(tmp_path_factory):
    import json
    from PIL import Image
    d = tmp_path_factory.mktemp('sdxl_proj')
    imgs = d / 'imgs'
    imgs.mkdir()
    rng = np.random.default_rng(0)
    caps = {}
    for i in range(4):
        arr = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(imgs / f'img_{i}.png')
        caps[f'img_{i}'] = f'a photo of cat {i}'
    with open(imgs / 'captions.json', 'w') as f:
        json.dump(caps, f)
    return d


def _sdxl_train_cfg(proj, **over):
    from hcpdiff_tpu.config import containerize, merge
    base = {
        'exp_dir': str(proj / 'exp_sdxl'),
        'mixed_precision': 'fp32',
        'seed': 1,
        'ckpt_type': 'safetensors',
        'train': {
            'train_steps': 2, 'save_step': 2,
            'gradient_accumulation_steps': 1, 'max_grad_norm': 1.0,
            'cfg_scale': '1.0',
            'loss': {'criterion': {'_target_': 'mse'}},
            'optimizer': {'_target_': 'optim.adamw'},
            'scheduler': {'name': 'constant', 'num_warmup_steps': 0,
                          'num_training_steps': 2},
        },
        'model': {'pretrained_model_name_or_path': 'tiny_sdxl',
                  'clip_skip': 1, 'clip_final_norm': False,
                  'tokenizer_repeats': 1, 'gradient_checkpointing': False},
        'logger': [{'_target_': 'CLILogger', 'log_step': 1}],
        'lora_unet': [{'lr': 1e-3, 'rank': 2,
                       'layers': ['re:.*attn1\\.to_q$']}],
        'lora_text_encoder': [{'lr': 1e-4, 'rank': 2,
                               'layers': ['re:.*self_attn\\.q_proj$']}],
        'data': {'dataset1': {
            '_target_': 'hcpdiff.data.CropInfoPairDataset',
            'batch_size': 2, 'cache_latents': True,
            'source': {'s1': {'img_root': str(proj / 'imgs'),
                              'caption_file': str(proj / 'imgs' / 'captions.json')}},
            'bucket': {'_target_': 'FixedBucket', 'target_size': 32},
        }},
        'tokenizer_pt': {'emb_dir': None, 'train': None},
    }
    cfg = containerize(base)
    return merge(cfg, containerize(over)) if over else cfg


def test_sdxl_training_e2e(sdxl_proj):
    """SDXL LoRA training end-to-end: dual-TE LoRA groups, crop-info
    time_ids, pooled conditioning, reference-format ckpts (closes
    VERDICT.md missing item 2; reference wrapper.py:57-96 +
    crop_info_dataset.py:21)."""
    import os
    from hcpdiff_tpu.trainer.trainer import Trainer
    cfg = _sdxl_train_cfg(sdxl_proj)
    t = Trainer(cfg)
    assert t.sdxl
    assert 'lora_te2' in t.pack      # both encoder halves get LoRA
    assert 'lora_te' in t.pack
    assert 'te2' in t.frozen
    assert t.datasets[0].with_crop_info
    batch = t.datasets[0].get_batch(0)
    assert 'time_ids' in batch and batch['time_ids'].shape[-1] == 6
    final = t.train()
    assert final == 2
    ext = t.ckpt_manager.ext
    for name in ('unet-2', 'text_encoder-2', 'text_encoder_2-2'):
        assert os.path.exists(os.path.join(cfg.exp_dir, 'ckpts', name + ext)), name


def test_sdxl_time_ids_affect_loss(sdxl_proj):
    """The crop-info conditioning must be live in the compiled graph:
    different time_ids -> different loss for the same rng/batch."""
    import jax.numpy as jnp
    from hcpdiff_tpu.trainer.trainer import Trainer
    cfg = _sdxl_train_cfg(sdxl_proj, exp_dir=str(sdxl_proj / 'exp_sdxl2'))
    t = Trainer(cfg)
    batch = {k: v for k, v in t.datasets[0].get_batch(0).items()
             if k != 'prompts'}
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)

    def run(tid_scale):
        b = dict(batch, time_ids=jnp.full_like(batch['time_ids'], tid_scale))
        st = jax.tree_util.tree_map(jnp.copy, t.state)
        fz = jax.tree_util.tree_map(jnp.copy, t.frozen)
        _, m = t._train_step(st, fz, b, rng)
        return float(m['loss'])

    l0, l1 = run(0.0), run(512.0)
    assert np.isfinite(l0) and np.isfinite(l1)
    assert abs(l0 - l1) > 1e-8  # conditioning is not constant-folded away


def test_sdxl_visualizer_e2e(tmp_path):
    """SDXL inference through the Visualizer with the tiny_sdxl world:
    dual-TE encode, pooled/time_ids conditioning, image out."""
    from hcpdiff_tpu.config import containerize
    from hcpdiff_tpu.infer.visualizer import Visualizer
    cfg = containerize({
        'pretrained_model': 'tiny_sdxl', 'dtype': 'fp32',
        'prompt': 'a photo of cat', 'neg_prompt': 'dog',
        'seed': 3, 'bs': 1, 'output_dir': str(tmp_path / 'o'),
        'infer_args': {'width': 32, 'height': 32, 'inference_steps': 2,
                       'sampler': 'euler'},
        'interface': [],
    })
    v = Visualizer(cfg)
    assert v.sdxl
    imgs = v.vis_images('a photo of cat')
    assert imgs.shape == (1, 32, 32, 3)
    assert np.isfinite(imgs).all()
