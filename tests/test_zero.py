"""ZeRO-2/3 analog tests (VERDICT round-2 item 5; reference
cfgs/zero2.json / zero3.json via train_deepspeed.py): trainable-pack and
gradient sharding over the 'data' axis of the 8-device virtual mesh."""
import json
import os

import numpy as np
import pytest
from PIL import Image

import jax


@pytest.fixture(scope='module')
def proj(tmp_path_factory):
    d = tmp_path_factory.mktemp('proj_zero')
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


def _ft_cfg(proj, zero, name):
    from hcpdiff_tpu.config import containerize
    return containerize({
        'exp_dir': str(proj / name),
        'mixed_precision': 'fp32', 'seed': 1, 'ckpt_type': 'safetensors',
        'train': {
            'train_steps': 1, 'save_step': 1, 'zero': zero,
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
        # FULL fine-tune: the whole UNet is the trainable pack — the case
        # zero3 exists for (SDXL-scale full FT replicating pack+grads)
        'unet': [{'lr': 1e-5, 'layers': ['re:.*']}],
        'data': {'dataset1': {
            'batch_size': 2, 'cache_latents': True,
            'source': {'s1': {'img_root': str(proj / 'imgs'),
                              'caption_file': str(proj / 'imgs' / 'captions.json')}},
            'bucket': {'_target_': 'FixedBucket', 'target_size': 32},
        }},
        'tokenizer_pt': {'emb_dir': None, 'train': None},
    })


def _sharded_leaves(tree):
    out = []
    for x in jax.tree_util.tree_leaves(tree):
        if hasattr(x, 'sharding') and hasattr(x, 'shape') and x.size > 64:
            shard = x.sharding.shard_shape(x.shape)
            if tuple(shard) != tuple(x.shape):
                out.append((x.shape, shard))
    return out


def test_zero3_shards_trainable_pack(proj):
    from hcpdiff_tpu.trainer.trainer import Trainer
    t = Trainer(_ft_cfg(proj, zero=3, name='exp_z3'))
    assert t.zero_level == 3
    assert 'unet_ft' in t.pack
    sh_pack = _sharded_leaves(t.state.pack)
    sh_opt = _sharded_leaves(t.state.opt_state)
    assert sh_pack, 'zero3 must shard the trainable pack over data'
    assert sh_opt, 'zero3 must shard the optimizer state'
    # per-device shard is a fraction of the global array
    shape, shard = max(sh_pack, key=lambda p: np.prod(p[0]))
    assert np.prod(shard) <= np.prod(shape) // 2
    final = t.train()        # one step + the multi-host-safe save path
    assert final == 1
    files = os.listdir(os.path.join(t.exp_dir, 'ckpts'))
    assert any(f.startswith('unet-1') for f in files), files


def test_zero2_trains(proj):
    from hcpdiff_tpu.trainer.trainer import Trainer
    t = Trainer(_ft_cfg(proj, zero=2, name='exp_z2'))
    assert t.zero_level == 2
    # zero2: opt state sharded, pack replicated
    assert _sharded_leaves(t.state.opt_state)
    assert not _sharded_leaves(t.state.pack)
    assert t.train() == 1


def test_zero1_backcompat_flag(proj):
    from hcpdiff_tpu.config import containerize, merge
    from hcpdiff_tpu.trainer.trainer import Trainer
    cfg = _ft_cfg(proj, zero=0, name='exp_z1')
    cfg = merge(cfg, containerize({'train': {'zero1': True}}))
    t = Trainer(cfg)
    assert t.zero_level == 1
    assert _sharded_leaves(t.state.opt_state)
    assert not _sharded_leaves(t.state.pack)


def test_zero3_resume_reapplies_sharding(proj):
    """Auto-resume must restore the zero3 layout, not silently replicate
    (round-2 restore dropped zero1 sharding)."""
    from hcpdiff_tpu.config import containerize, merge
    from hcpdiff_tpu.trainer.trainer import Trainer
    cfg = _ft_cfg(proj, zero=3, name='exp_z3')   # reuse exp_z3's orbax dir
    cfg = merge(cfg, containerize({'train': {'resume': {'auto': True}}}))
    t = Trainer(cfg)
    assert t.start_step == 1
    assert _sharded_leaves(t.state.pack), 'restore dropped zero3 sharding'
