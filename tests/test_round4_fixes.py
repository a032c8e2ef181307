"""Regression tests for the round-4 fixes (VERDICT.md round-3 items):
unknown source/bucket _target_ raise instead of silently defaulting,
img2img/inpaint reject staggered multi-eval samplers (mis-sliced partial
loops), true DPM++ SDE singlestep, biased-LoRA compatibility collapse,
preemption-safe training."""
import json

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from helpers import tiny_world, make_pipeline


@pytest.fixture(scope='module')
def proj(tmp_path_factory):
    d = tmp_path_factory.mktemp('proj_r4')
    imgs = d / 'imgs'
    imgs.mkdir()
    rng = np.random.default_rng(0)
    caps = {}
    for i in range(4):
        arr = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(imgs / f'img_{i}.png')
        caps[f'img_{i}'] = f'a photo, of cat, number {i}'
    with open(imgs / 'captions.json', 'w') as f:
        json.dump(caps, f)
    return d


def _train_cfg(proj, **over):
    from hcpdiff_tpu.config import containerize, merge
    base = {
        'exp_dir': str(proj / 'exp'),
        'mixed_precision': 'fp32',
        'seed': 1,
        'ckpt_type': 'safetensors',
        'train': {
            'train_steps': 1, 'save_step': 50,
            'gradient_accumulation_steps': 1, 'max_grad_norm': 1.0,
            'cfg_scale': '1.0',
            'loss': {'criterion': {'_target_': 'mse'}},
            'optimizer': {'_target_': 'optim.adamw'},
            'scheduler': {'name': 'constant', 'num_warmup_steps': 0,
                          'num_training_steps': 1},
        },
        'model': {'pretrained_model_name_or_path': 'tiny',
                  'tokenizer_repeats': 1, 'gradient_checkpointing': False},
        'logger': [{'_target_': 'CLILogger', 'log_step': 1}],
        'data': {'dataset1': {
            'batch_size': 2, 'cache_latents': False,
            'source': {'s1': {'img_root': str(proj / 'imgs'),
                              'caption_file': str(proj / 'imgs' / 'captions.json')}},
            'bucket': {'_target_': 'FixedBucket', 'target_size': 32},
        }},
        'tokenizer_pt': {'emb_dir': None, 'train': None},
        'lora_unet': [{'lr': 1e-3, 'rank': 2, 'layers': ['re:.*attn1\\.to_q$']}],
    }
    cfg = containerize(base)
    return merge(cfg, containerize(over)) if over else cfg


# ------------------------------------------- silent config fallbacks --------

def test_unknown_source_target_raises(proj):
    """A misspelled source _target_ must not silently become
    Text2ImageSource (reference hydra raises on bad _target_)."""
    from hcpdiff_tpu.trainer.trainer import Trainer
    cfg = _train_cfg(proj, data={'dataset1': {'source': {'s1': {
        '_target_': 'hcpdiff.data.source.Text2ImageSorce',  # typo
        'img_root': str(proj / 'imgs'),
        'caption_file': str(proj / 'imgs' / 'captions.json')}}}})
    with pytest.raises(ValueError, match="unknown _target_ 'Text2ImageSorce'"):
        Trainer(cfg)


def test_known_source_target_dotted_path_ok(proj):
    from hcpdiff_tpu.trainer.trainer import Trainer
    cfg = _train_cfg(proj, data={'dataset1': {'source': {'s1': {
        '_target_': 'hcpdiff.data.source.Text2ImageSource',
        'img_root': str(proj / 'imgs'),
        'caption_file': str(proj / 'imgs' / 'captions.json')}}}})
    t = Trainer(cfg)
    assert len(t.datasets) == 1


def test_unknown_bucket_target_raises():
    from hcpdiff_tpu.trainer.trainer import Trainer
    with pytest.raises(ValueError, match='unknown _target_'):
        Trainer._build_bucket({'_target_': 'hcpdiff.data.RatioBucet',
                               'target_area': 256 * 256})


def test_bucket_plain_kwargs_still_ratio():
    """A bucket block with kwargs but no _target_ keeps the reference
    default (RatioBucket)."""
    from hcpdiff_tpu.data.buckets import RatioBucket
    from hcpdiff_tpu.trainer.trainer import Trainer
    b = Trainer._build_bucket({'target_area': 256 * 256, 'num_bucket': 2})
    assert isinstance(b, RatioBucket)


# -------------------------------------- img2img multi-eval sampler guard ----

@pytest.fixture(scope='module')
def pipe():
    return make_pipeline(tiny_world())


@pytest.mark.parametrize('name', ['heun', 'dpm2', 'dpm2_a', 'dpm++_2s_a'])
def test_img2img_two_eval_sampler_works(pipe, name):
    # round 5 replaced the round-4 guard (raise) with stage-0-boundary plan
    # slicing — see slice_for_partial + tests/test_partial_loop.py parity
    init = jnp.zeros((1, 4, 4, 4))
    img = pipe.img2img(init, 'a painting', strength=0.5, num_steps=6,
                       sampler=name, seed=0)
    assert np.isfinite(img).all()


def test_img2img_single_eval_still_works(pipe):
    init = jnp.zeros((1, 4, 4, 4))
    img = pipe.img2img(init, 'a painting', strength=0.5, num_steps=4,
                       sampler='dpm++_2m', seed=0)
    assert np.isfinite(img).all()


def test_inpaint_legacy_two_eval_works(pipe):
    init = jnp.zeros((1, 4, 4, 4))
    mask = jnp.ones((1, 4, 4, 1))
    img = pipe.inpaint(init, mask, 'cat', strength=0.5, num_steps=6,
                       sampler='heun')
    assert np.isfinite(img).all()


# ------------------------------------------- biased-LoRA host rebuild -------

def test_biased_lora_visualizer_qkv_rebuild(tmp_path):
    """A pre-0.9 biased LoRA targeting SD's bias-free attention projections
    must LOAD (VERDICT round-3 item 7): the Visualizer rebuilds the UNet
    with UNetConfig(qkv_bias=True) and attaches zero host biases, matching
    the reference's reparameterization_to_host creating the host bias
    (hcpdiff/models/lora_base_patch.py:150-170)."""
    from hcpdiff_tpu.adapt.overlay import _get_path, module_paths
    from hcpdiff_tpu.ckpt.manager import CkptManagerSafe
    from hcpdiff_tpu.config import containerize
    from hcpdiff_tpu.infer.visualizer import Visualizer
    from hcpdiff_tpu.models.factory import build_models

    world = build_models('tiny', dtype=jnp.float32)
    path = next(p for p in module_paths(world['unet_params'])
                if p.endswith('attn1.to_q'))
    kshape = _get_path(world['unet_params'], path)['kernel'].shape
    rank = 2
    rng = np.random.default_rng(0)
    overlay = {path: {
        'down': rng.normal(size=(kshape[0], rank)).astype(np.float32) * 0.01,
        'up': rng.normal(size=(rank, kshape[1])).astype(np.float32) * 0.01,
        'alpha': np.asarray(1.0, np.float32),
        'bias': np.full((kshape[1],), 0.5, np.float32)}}
    ck = str(tmp_path / 'biased_lora.safetensors')
    CkptManagerSafe().save_model_with_lora(ck, lora_overlay=overlay)

    out = tmp_path / 'out'
    v = Visualizer(containerize({
        'pretrained_model': 'tiny', 'dtype': 'fp32',
        'prompt': 'a photo of cat', 'neg_prompt': '', 'seed': 5, 'bs': 1,
        'output_dir': str(out),
        'infer_args': {'width': 32, 'height': 32, 'inference_steps': 2,
                       'sampler': 'ddim'},
        'merge': {'group1': {'type': 'unet',
                             'lora': [{'path': ck, 'alpha': 1.0}]}},
        'interface': [],
    }))
    # host rebuilt with declared q/k/v biases
    assert v.world['unet_cfg'].qkv_bias
    # the targeted layer got bias = 0 + delta = bias * (alpha/rank) * scale
    got = np.asarray(_get_path(v.unet_params, path)['bias'])
    np.testing.assert_allclose(got, np.full((kshape[1],), 0.5 / rank),
                               atol=1e-6)
    # every other q/k/v has a zero bias and the model applies cleanly
    other = next(p for p in module_paths(v.unet_params)
                 if p.endswith('to_k') and 'attn1' in p)
    np.testing.assert_allclose(
        np.asarray(_get_path(v.unet_params, other)['bias']), 0.0)
    imgs = v.vis_to_dir(num=1)
    assert np.isfinite(imgs).all()

    # the bias delta changes the output vs the stripped-kernel-only load
    from hcpdiff_tpu.adapt.overlay import strip_overlay_bias
    ck2 = str(tmp_path / 'stripped_lora.safetensors')
    with pytest.warns(UserWarning):
        CkptManagerSafe().save_model_with_lora(
            ck2, lora_overlay=strip_overlay_bias(overlay))
    v2 = Visualizer(containerize({
        'pretrained_model': 'tiny', 'dtype': 'fp32',
        'prompt': 'a photo of cat', 'neg_prompt': '', 'seed': 5, 'bs': 1,
        'output_dir': str(tmp_path / 'out2'),
        'infer_args': {'width': 32, 'height': 32, 'inference_steps': 2,
                       'sampler': 'ddim'},
        'merge': {'group1': {'type': 'unet',
                             'lora': [{'path': ck2, 'alpha': 1.0}]}},
        'interface': [],
    }))
    assert not v2.world['unet_cfg'].qkv_bias
    imgs2 = v2.vis_to_dir(num=1)
    assert not np.allclose(imgs, imgs2, atol=1e-5)
