"""ControlNet training + ZeRO-1 sharding + plugin checkpointing."""
import json
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp


@pytest.fixture(scope='module')
def proj(tmp_path_factory):
    d = tmp_path_factory.mktemp('cn_proj')
    (d / 'imgs').mkdir()
    (d / 'cond').mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        arr = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / 'imgs' / f'i{i}.png')
        Image.fromarray(255 - arr).save(d / 'cond' / f'i{i}.png')
    return d


def test_controlnet_training_e2e(proj):
    from hcpdiff_tpu.config import containerize
    from hcpdiff_tpu.trainer.trainer import Trainer
    cfg = containerize({
        'exp_dir': str(proj / 'exp_cn'),
        'mixed_precision': 'fp32', 'seed': 1, 'ckpt_type': 'safetensors',
        'train': {'train_steps': 4, 'save_step': 4,
                  'loss': {'criterion': {'_target_': 'mse'}},
                  'optimizer': {'_target_': 'optim.adamw'},
                  'scheduler': {'name': 'constant', 'num_training_steps': 4}},
        'model': {'pretrained_model_name_or_path': 'tiny',
                  'gradient_checkpointing': False},
        'plugin_unet': {'controlnet1': {
            '_target_': 'hcpdiff_tpu.models.controlnet.ControlNet',
            'lr': 1e-4}},
        'data': {'dataset1': {
            'batch_size': 2, 'cache_latents': False,
            '_target_': 'hcpdiff_tpu.data.dataset.TextImageCondPairDataset',
            'source': {'s1': {
                '_target_': 'hcpdiff_tpu.data.sources.Text2ImageCondSource',
                'img_root': str(proj / 'imgs'),
                'cond_root': str(proj / 'cond')}},
            'bucket': {'_target_': 'FixedBucket', 'target_size': 16},
        }},
        'tokenizer_pt': {'emb_dir': None, 'train': None},
        'logger': [{'_target_': 'CLILogger', 'log_step': 1}],
    })
    t = Trainer(cfg)
    assert 'controlnet' in t.pack
    zm0 = np.asarray(jax.device_get(
        t.pack['controlnet']['zero_mid']['kernel'])).copy()
    ce0 = np.asarray(jax.device_get(
        t.pack['controlnet']['cond_embedding']['conv_out']['kernel'])).copy()
    t.train()
    # zero heads get gradients immediately; the cond embedding unblocks once
    # the zero convs become nonzero (step 2+)
    zm1 = np.asarray(jax.device_get(t.state.pack['controlnet']['zero_mid']['kernel']))
    ce1 = np.asarray(jax.device_get(
        t.state.pack['controlnet']['cond_embedding']['conv_out']['kernel']))
    assert not np.allclose(zm0, zm1)
    assert not np.allclose(ce0, ce1)
    assert os.path.exists(os.path.join(cfg['exp_dir'], 'ckpts',
                                       'plugin-4.safetensors'))


def test_cond_source_dataset_batches(proj):
    from hcpdiff_tpu.data.buckets import FixedBucket
    from hcpdiff_tpu.data.dataset import TextImageCondPairDataset
    from hcpdiff_tpu.data.sources import Text2ImageCondSource
    from helpers import tiny_world
    w = tiny_world()
    src = Text2ImageCondSource(str(proj / 'imgs'), cond_root=str(proj / 'cond'))
    ds = TextImageCondPairDataset(src, FixedBucket(16), frontend=w['frontend'],
                                  vae_scale=2)
    ds.build(bs=2)
    b = ds.get_batch(0)
    assert 'cond' in b and b['cond'].shape == (2, 16, 16, 3)
    assert b['cond'].min() >= -0.01 and b['cond'].max() <= 1.01


def test_zero1_sharded_update_matches(tmp_path):
    """ZeRO-1: optimizer state sharded over 'data' gives identical updates."""
    import optax
    from hcpdiff_tpu.adapt.overlay import make_lora_overlay
    from hcpdiff_tpu.parallel.mesh import (make_mesh, replicate, shard_batch,
                                           zero1_shardings)
    from hcpdiff_tpu.trainer.step import StepConfig, build_train_step, init_train_state
    from hcpdiff_tpu.diffusion.losses import MSELoss
    from hcpdiff_tpu.diffusion.schedules import NoiseSchedule
    from helpers import tiny_world

    w = tiny_world()
    overlay, _ = make_lora_overlay(jax.random.PRNGKey(0), w['unet_params'],
                                   [{'layers': ['re:.*attn1\\.to_q$'], 'rank': 2}])
    pack = {'lora_unet': overlay}
    tx = optax.adam(1e-2)

    def unet_apply(p, x, t, ctx, **e):
        return w['unet'].apply({'params': p}, x, t, ctx, **e)

    def te_encode(p, ids, tm, ext):
        return w['frontend'].encode_ids(p, ids, tm, ext)

    step = jax.jit(build_train_step(unet_apply, te_encode, NoiseSchedule.make(),
                                    MSELoss(), tx, None, StepConfig()))
    frozen = {'unet': w['unet_params'], 'te': w['te_params']}
    ids, mult = w['frontend'].tokenize_batch(['cat'] * 8)
    batch = {'latents': jnp.zeros((8, 8, 8, 4)),
             'input_ids': jnp.asarray(ids), 'token_mult': jnp.asarray(mult)}
    rng = jax.random.PRNGKey(3)

    s0 = init_train_state(pack, tx)
    ref, m_ref = step(s0, frozen, batch, rng)

    mesh = make_mesh()
    s1 = replicate(init_train_state(pack, tx), mesh)
    s1 = s1.replace(opt_state=jax.device_put(
        jax.device_get(s1.opt_state), zero1_shardings(s1.opt_state, mesh)))
    out, m_out = step(s1, replicate(frozen, mesh), shard_batch(batch, mesh), rng)
    np.testing.assert_allclose(float(m_ref['loss']), float(m_out['loss']), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ref.pack),
                    jax.tree_util.tree_leaves(out.pack)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_fsdp_sharded_params_match(tmp_path):
    """FSDP axis: frozen params sharded over 'fsdp' -> same step results
    (XLA inserts the all-gathers; covers ZeRO-3/Gemini-style placement)."""
    import optax
    from hcpdiff_tpu.adapt.overlay import make_lora_overlay
    from hcpdiff_tpu.parallel.mesh import (fsdp_shardings, make_mesh,
                                           replicate, shard_batch)
    from hcpdiff_tpu.trainer.step import (StepConfig, build_train_step,
                                          init_train_state)
    from hcpdiff_tpu.diffusion.losses import MSELoss
    from hcpdiff_tpu.diffusion.schedules import NoiseSchedule
    from helpers import tiny_world

    w = tiny_world()
    overlay, _ = make_lora_overlay(jax.random.PRNGKey(0), w['unet_params'],
                                   [{'layers': ['re:.*attn1\\.to_q$'], 'rank': 2}])
    pack = {'lora_unet': overlay}
    tx = optax.adam(1e-2)

    def unet_apply(p, x, t, ctx, **e):
        return w['unet'].apply({'params': p}, x, t, ctx, **e)

    def te_encode(p, ids, tm, ext):
        return w['frontend'].encode_ids(p, ids, tm, ext)

    step = jax.jit(build_train_step(unet_apply, te_encode, NoiseSchedule.make(),
                                    MSELoss(), tx, None, StepConfig()))
    frozen = {'unet': w['unet_params'], 'te': w['te_params']}
    ids, mult = w['frontend'].tokenize_batch(['cat'] * 4)
    batch = {'latents': jnp.zeros((4, 8, 8, 4)),
             'input_ids': jnp.asarray(ids), 'token_mult': jnp.asarray(mult)}
    rng = jax.random.PRNGKey(3)

    ref, m_ref = step(init_train_state(pack, tx), frozen, batch, rng)

    mesh = make_mesh(data=4, fsdp=2)
    fz = jax.device_put(jax.device_get(frozen), fsdp_shardings(frozen, mesh))
    st = replicate(init_train_state(pack, tx), mesh)
    out, m_out = step(st, fz, shard_batch(batch, mesh), rng)
    np.testing.assert_allclose(float(m_ref['loss']), float(m_out['loss']),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ref.pack),
                    jax.tree_util.tree_leaves(out.pack)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_trainer_grad_accum_e2e(proj, tmp_path):
    from hcpdiff_tpu.config import containerize
    from hcpdiff_tpu.trainer.trainer import Trainer
    cfg = containerize({
        'exp_dir': str(tmp_path / 'exp_ga'),
        'mixed_precision': 'fp32', 'seed': 1, 'ckpt_type': 'safetensors',
        'lora_unet': [{'lr': 1e-3, 'rank': 2, 'layers': ['re:.*attn1\\.to_q$']}],
        'train': {'train_steps': 2, 'save_step': 2,
                  'gradient_accumulation_steps': 2,
                  'loss': {'criterion': {'_target_': 'mse'}},
                  'optimizer': {'_target_': 'optim.adamw'},
                  'scheduler': {'name': 'constant', 'num_training_steps': 2}},
        'model': {'pretrained_model_name_or_path': 'tiny',
                  'gradient_checkpointing': False},
        'data': {'dataset1': {
            'batch_size': 2, 'cache_latents': True,
            'source': {'s1': {'img_root': str(proj / 'imgs')}},
            'bucket': {'_target_': 'FixedBucket', 'target_size': 16}}},
        'tokenizer_pt': {'emb_dir': None, 'train': None},
        'logger': [{'_target_': 'CLILogger', 'log_step': 1}],
    })
    t = Trainer(cfg)
    final = t.train()
    assert final == 2


def test_previewer_generates(proj, tmp_path):
    from hcpdiff_tpu.config import containerize
    from hcpdiff_tpu.trainer.trainer import Trainer
    cfg = containerize({
        'exp_dir': str(tmp_path / 'exp_pv'),
        'mixed_precision': 'fp32', 'seed': 1, 'ckpt_type': 'safetensors',
        'lora_unet': [{'lr': 1e-3, 'rank': 2, 'layers': ['re:.*attn1\\.to_q$']}],
        'train': {'train_steps': 1, 'save_step': 5,
                  'loss': {'criterion': {'_target_': 'mse'}},
                  'optimizer': {'_target_': 'optim.adamw'},
                  'scheduler': {'name': 'constant', 'num_training_steps': 1}},
        'model': {'pretrained_model_name_or_path': 'tiny',
                  'gradient_checkpointing': False},
        'previewer': {'image_log_step': 1, 'prompt': 'a photo of cat',
                      'width': 32, 'height': 32, 'num_steps': 2,
                      'sampler': 'euler'},
        'data': {'dataset1': {
            'batch_size': 2, 'cache_latents': True,
            'source': {'s1': {'img_root': str(proj / 'imgs')}},
            'bucket': {'_target_': 'FixedBucket', 'target_size': 16}}},
        'tokenizer_pt': {'emb_dir': None, 'train': None},
        'logger': [{'_target_': 'CLILogger', 'log_step': 1}],
    })
    t = Trainer(cfg)
    d = t.previewer.preview_dict()
    assert 'preview' in d and d['preview'].shape == (32, 32, 3)
    assert np.isfinite(np.asarray(d['preview'])).all()


def test_multi_bucket_shapes_train(proj, tmp_path):
    """ARB buckets: one compiled step per bucket resolution (SURVEY.md §7
    hard part 5) — a run over mixed-ratio data completes with multiple
    jit shape specializations."""
    import numpy as np
    from PIL import Image
    from hcpdiff_tpu.config import containerize
    from hcpdiff_tpu.trainer.trainer import Trainer
    d = tmp_path / 'arb_imgs'
    d.mkdir()
    rng = np.random.default_rng(0)
    for i, (w, h) in enumerate([(64, 32), (64, 32), (32, 64), (32, 64)]):
        Image.fromarray(rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
                        ).save(d / f'i{i}.png')
    cfg = containerize({
        'exp_dir': str(tmp_path / 'exp_arb'),
        'mixed_precision': 'fp32', 'seed': 1, 'ckpt_type': 'safetensors',
        'lora_unet': [{'lr': 1e-3, 'rank': 2, 'layers': ['re:.*attn1\\.to_q$']}],
        'train': {'train_steps': 2, 'save_step': 10,
                  'loss': {'criterion': {'_target_': 'mse'}},
                  'optimizer': {'_target_': 'optim.adamw'},
                  'scheduler': {'name': 'constant', 'num_training_steps': 2}},
        'model': {'pretrained_model_name_or_path': 'tiny',
                  'gradient_checkpointing': False},
        'data': {'dataset1': {
            'batch_size': 2, 'cache_latents': True,
            'source': {'s1': {'img_root': str(d)}},
            'bucket': {'_target_': 'RatioBucket.from_files',
                       'target_area': 32 * 32, 'num_bucket': 2,
                       'step_size': 16}}},
        'tokenizer_pt': {'emb_dir': None, 'train': None},
        'logger': [{'_target_': 'CLILogger', 'log_step': 1}],
    })
    t = Trainer(cfg)
    sizes = {t.datasets[0].bucket[i][1] for i in range(len(t.datasets[0]))}
    assert len(sizes) >= 2  # genuinely multi-resolution
    assert t.train() == 2


def test_training_determinism(proj, tmp_path):
    """Same seed -> bit-identical loss sequence (SURVEY.md §5.2: the
    reference only has determinism knobs; we assert it)."""
    from hcpdiff_tpu.config import containerize
    from hcpdiff_tpu.trainer.trainer import Trainer

    def run(exp):
        cfg = containerize({
            'exp_dir': str(tmp_path / exp),
            'mixed_precision': 'fp32', 'seed': 7, 'ckpt_type': 'safetensors',
            'lora_unet': [{'lr': 1e-3, 'rank': 2,
                           'layers': ['re:.*attn1\\.to_q$']}],
            'train': {'train_steps': 2, 'save_step': 10,
                      'loss': {'criterion': {'_target_': 'mse'}},
                      'optimizer': {'_target_': 'optim.adamw'},
                      'scheduler': {'name': 'constant',
                                    'num_training_steps': 2}},
            'model': {'pretrained_model_name_or_path': 'tiny',
                      'gradient_checkpointing': False},
            'data': {'dataset1': {
                'batch_size': 2, 'cache_latents': True,
                'source': {'s1': {'img_root': str(proj / 'imgs')}},
                'bucket': {'_target_': 'FixedBucket', 'target_size': 16}}},
            'tokenizer_pt': {'emb_dir': None, 'train': None},
            'logger': [{'_target_': 'CLILogger', 'log_step': 1}],
        })
        t = Trainer(cfg)
        t.train()
        return jax.device_get(t.state.pack)

    a = run('det_a')
    b = run('det_b')
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
