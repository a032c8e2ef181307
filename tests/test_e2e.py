"""End-to-end smoke tests: Trainer / Visualizer / workflow on tiny models
(the BASELINE.json config classes, CPU-runnable — SURVEY.md §4)."""
import json
import os

import numpy as np
import pytest
from PIL import Image

import jax


@pytest.fixture(scope='module')
def proj(tmp_path_factory):
    d = tmp_path_factory.mktemp('proj')
    imgs = d / 'imgs'
    imgs.mkdir()
    rng = np.random.default_rng(0)
    caps = {}
    for i in range(4):
        arr = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(imgs / f'img_{i}.png')
        caps[f'img_{i}'] = f'a photo of cat {i}'
    with open(imgs / 'captions.json', 'w') as f:
        json.dump(caps, f)
    return d


def _train_cfg(proj, **over):
    from hcpdiff_tpu.config import containerize, merge, resolve
    base = {
        'exp_dir': str(proj / 'exp'),
        'mixed_precision': 'fp32',
        'seed': 1,
        'ckpt_type': 'safetensors',
        'train': {
            'train_steps': 3, 'save_step': 3,
            'gradient_accumulation_steps': 1, 'max_grad_norm': 1.0,
            'cfg_scale': '1.0',
            'loss': {'criterion': {'_target_': 'mse'}},
            'optimizer': {'_target_': 'optim.adamw', 'weight_decay': 1e-3},
            'scheduler': {'name': 'constant', 'num_warmup_steps': 0,
                          'num_training_steps': 3},
        },
        'model': {'pretrained_model_name_or_path': 'tiny',
                  'tokenizer_repeats': 1, 'gradient_checkpointing': False},
        'logger': [{'_target_': 'CLILogger', 'log_step': 1}],
        'data': {'dataset1': {
            'batch_size': 2, 'cache_latents': True,
            'source': {'s1': {'img_root': str(proj / 'imgs'),
                              'caption_file': str(proj / 'imgs' / 'captions.json')}},
            'bucket': {'_target_': 'FixedBucket', 'target_size': 32},
        }},
        'tokenizer_pt': {'emb_dir': None, 'train': None},
    }
    cfg = containerize(base)
    return merge(cfg, containerize(over)) if over else cfg


def test_trainer_lora_e2e(proj):
    from hcpdiff_tpu.trainer.trainer import Trainer
    cfg = _train_cfg(proj, lora_unet=[
        {'lr': 1e-3, 'rank': 2, 'layers': ['re:.*attn1\\.to_q$']}])
    t = Trainer(cfg)
    final = t.train()
    assert final == 3
    ck = os.path.join(cfg.exp_dir, 'ckpts', 'unet-3.safetensors')
    assert os.path.exists(ck)
    loaded = t.ckpt_manager.load_ckpt(ck)
    assert 'lora' in loaded and len(loaded['lora']) > 0


def test_trainer_reference_style_regex(proj):
    """Reference-yaml regexes (torch module names) select our layers."""
    from hcpdiff_tpu.trainer.trainer import Trainer
    cfg = _train_cfg(proj, lora_unet=[
        {'lr': 1e-3, 'rank': 2, 'layers': ['re:.*\\.attn.?$', 're:.*\\.ff$']}])
    t = Trainer(cfg)
    n_layers = len(t.pack['lora_unet'])
    assert n_layers >= 8  # attn q/k/v/out + ff proj/out across blocks


def test_visualizer_e2e(proj, tmp_path):
    from hcpdiff_tpu.config import containerize
    from hcpdiff_tpu.infer.visualizer import Visualizer
    out = tmp_path / 'out'
    cfg = containerize({
        'pretrained_model': 'tiny',
        'prompt': 'a photo of cat',
        'neg_prompt': 'dog',
        'seed': 42, 'bs': 1, 'dtype': 'fp32',
        'output_dir': str(out),
        'infer_args': {'width': 32, 'height': 32, 'inference_steps': 3,
                       'guidance_scale': 7.5, 'sampler': 'ddim'},
        'interface': [{'_target_': 'disk', 'save_root': str(out)}],
    })
    v = Visualizer(cfg)
    imgs = v.vis_to_dir(num=1)
    assert imgs.shape[-1] == 3
    files = os.listdir(out)
    assert any(f.endswith('.png') for f in files)
    assert any(f.endswith('.yaml') for f in files)  # reproduction yaml


def test_workflow_e2e(tmp_path):
    from hcpdiff_tpu.config import containerize
    from hcpdiff_tpu.workflow import WorkflowRunner
    out = tmp_path / 'wf_out'
    cfg = containerize({
        'memory': {},
        'prepare': [
            {'_target_': 'hcpdiff_tpu.workflow.LoadModelsAction',
             'pretrained_model': 'tiny', 'dtype': 'fp32'},
            {'_target_': 'hcpdiff_tpu.workflow.PrepareDiffusionAction'},
        ],
        'actions': [
            {'_target_': 'hcpdiff_tpu.workflow.TextHookAction', 'N_repeats': 1},
            {'_target_': 'hcpdiff_tpu.workflow.AttnMultTextEncodeAction',
             'prompt': 'a photo of cat', 'negative_prompt': '', 'bs': 1},
            {'_target_': 'hcpdiff_tpu.workflow.SeedAction', 'seed': 7},
            {'_target_': 'hcpdiff_tpu.workflow.MakeTimestepsAction',
             'N_steps': 3, 'sampler': 'ddim'},
            {'_target_': 'hcpdiff_tpu.workflow.MakeLatentAction',
             'width': 32, 'height': 32},
            {'_target_': 'hcpdiff_tpu.workflow.LoopAction',
             'loop_value': {'timesteps': 't'},
             'actions': [{'_target_': 'hcpdiff_tpu.workflow.DiffusionStepAction',
                          'guidance_scale': 7.5}]},
            {'_target_': 'hcpdiff_tpu.workflow.DecodeAction'},
            {'_target_': 'hcpdiff_tpu.workflow.SaveImageAction',
             'save_root': str(out)},
        ],
    })
    runner = WorkflowRunner(cfg)
    states = runner.start()
    assert 'images' in states
    assert np.isfinite(states['images']).all()
    assert len(os.listdir(out)) >= 1


def test_trainer_prompt_tuning(proj, tmp_path):
    """Textual-Inversion class config: train only embedding vectors."""
    from hcpdiff_tpu.ckpt.formats import save_webui_embedding
    from hcpdiff_tpu.trainer.trainer import Trainer
    emb_dir = tmp_path / 'embs'
    emb_dir.mkdir()
    save_webui_embedding(str(emb_dir / 'pt-cat1.pt'),
                         np.random.default_rng(0).normal(size=(2, 32)).astype(np.float32) * 0.01,
                         'pt-cat1')
    cfg = _train_cfg(proj)
    cfg['tokenizer_pt'] = {'emb_dir': str(emb_dir), 'replace': False,
                           'train': [{'name': 'pt-cat1', 'lr': 1e-2}]}
    cfg['exp_dir'] = str(tmp_path / 'exp_pt')
    t = Trainer(cfg)
    assert 'emb' in t.pack
    t.train()
    saved = [f for f in os.listdir(os.path.join(cfg['exp_dir'], 'ckpts'))
             if f.startswith('pt-cat1')]
    assert saved


def test_train_then_infer_roundtrip(proj, tmp_path):
    """The full user journey: LoRA training -> ckpt -> merge recipe ->
    generation (reference workflow: train_ac then visualizer with merge)."""
    from hcpdiff_tpu.trainer.trainer import Trainer
    from hcpdiff_tpu.infer.visualizer import Visualizer
    from hcpdiff_tpu.config import containerize

    exp = str(tmp_path / 'exp_rt')
    cfg = _train_cfg(proj, lora_unet=[
        {'lr': 5e-2, 'rank': 2, 'layers': ['re:.*attn1\\.to_q$']}])
    cfg['exp_dir'] = exp
    t = Trainer(cfg)
    t.train()
    ck = os.path.join(exp, 'ckpts', 'unet-3.safetensors')
    assert os.path.exists(ck)

    out = tmp_path / 'rt_out'
    vcfg = containerize({
        'pretrained_model': 'tiny', 'dtype': 'fp32',
        'prompt': 'a photo of cat', 'neg_prompt': '', 'seed': 3, 'bs': 1,
        'output_dir': str(out),
        'infer_args': {'width': 32, 'height': 32, 'inference_steps': 2,
                       'sampler': 'euler'},
        'merge': {'group1': {'type': 'unet',
                             'lora': [{'path': ck, 'alpha': 1.0}]}},
        'interface': [{'_target_': 'disk', 'save_root': str(out)}],
    })
    v = Visualizer(vcfg)
    # trained lora keys resolved through the alias map back onto flax paths
    assert len(v.pipe.unet_params) > 0
    imgs = v.vis_to_dir(num=1)
    assert np.isfinite(imgs).all()

    # merged output differs from base (lora had effect)
    vcfg2 = containerize({k: v2 for k, v2 in vcfg.items() if k != 'merge'})
    vcfg2['merge'] = None
    vcfg2['output_dir'] = str(tmp_path / 'rt_out2')
    vcfg2['interface'] = []
    v2 = Visualizer(vcfg2)
    imgs2 = v2.vis_to_dir(num=1)
    assert not np.allclose(imgs, imgs2, atol=1e-5)


def test_trainer_save_merged_pipeline(proj, tmp_path):
    """Train LoRA -> export merged diffusers pipeline -> reload and verify
    the LoRA delta is baked into the weights."""
    from hcpdiff_tpu.trainer.trainer import Trainer
    from hcpdiff_tpu.models.factory import build_models
    import jax.numpy as jnp

    cfg = _train_cfg(proj, lora_unet=[
        {'lr': 5e-2, 'rank': 2, 'layers': ['re:.*attn1\\.to_q$']}])
    cfg['exp_dir'] = str(tmp_path / 'exp_sm')
    t = Trainer(cfg)
    t.train()
    out = str(tmp_path / 'merged')
    t.save_merged(out)

    world2 = build_models(out, dtype=jnp.float32)
    # merged to_q differs from the original base (LoRA folded in)
    path = next(iter(t.pack['lora_unet']))
    node_m = world2['unet_params']
    node_b = jax.device_get(t.unet_params)
    for part in path.split('.'):
        node_m = node_m[part]
        node_b = node_b[part]
    assert not np.allclose(np.asarray(node_m['kernel']),
                           np.asarray(node_b['kernel']), atol=1e-7)


def test_trainer_two_datasets_dreambooth(proj, tmp_path):
    """DreamBooth with a regularization dataset: two datasets per step,
    each with its own batch size / loss weight (reference DataGroup,
    data/__init__.py:9-27 + regularization_dataset.yaml)."""
    from hcpdiff_tpu.trainer.trainer import Trainer
    cfg = _train_cfg(proj, exp_dir=str(tmp_path / 'exp_db'), lora_unet=[
        {'lr': 1e-3, 'rank': 2, 'layers': ['re:.*attn1\\.to_q$']}])
    cfg['data']['dataset_class'] = {
        'batch_size': 1, 'cache_latents': True, 'loss_weight': 0.5,
        'source': {'s1': {'img_root': str(proj / 'imgs'),
                          'caption_file': str(proj / 'imgs' / 'captions.json')}},
        'bucket': {'_target_': 'FixedBucket', 'target_size': 32},
    }
    t = Trainer(cfg)
    assert len(t.datasets) == 2
    assert t.datasets[1].loss_weight == 0.5
    final = t.train()
    assert final == 3
