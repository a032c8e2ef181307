import functools
import os

import pytest

from hcpdiff_tpu.config import (Cfg, apply_dotlist, instantiate, load,
                                load_config_with_cli, merge, remove_deleted,
                                resolve, containerize)


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_merge_and_delete_sentinel():
    base = containerize({'a': {'x': 1, 'y': 2}, 'b': [1, 2]})
    over = containerize({'a': {'y': 3, 'z': '---'}, 'b': [9]})
    m = remove_deleted(merge(base, over))
    assert m.a.x == 1 and m.a.y == 3
    assert 'z' not in m.a
    assert m.b == [9]


def test_base_inheritance(tmp_path):
    _write(tmp_path, 'base.yaml', 'model:\n  lr: 1e-4\n  name: unet\ntrain:\n  steps: 100\n')
    child = _write(tmp_path, 'child.yaml',
                   '_base_: [base.yaml]\nmodel:\n  lr: 2e-4\ntrain:\n  steps: "---"\n')
    cfg = load(child)
    assert cfg.model.lr == pytest.approx(2e-4)
    assert cfg.model.name == 'unet'
    assert 'steps' not in cfg.train


def test_cli_overrides(tmp_path):
    p = _write(tmp_path, 'c.yaml', 'train:\n  lr: 1e-4\n  tags: [a, b]\n')
    cfg = load(p, ['train.lr=5e-5', 'train.new_key=hello', 'train.flag=true'])
    assert cfg.train.lr == pytest.approx(5e-5)
    assert cfg.train.new_key == 'hello'
    assert cfg.train.flag is True


def test_interpolation_and_resolvers(tmp_path):
    p = _write(tmp_path, 'i.yaml', (
        'size: 512\n'
        'area: ${hcp.eval:"512*512"}\n'
        'mirror: ${size}\n'
        'msg: "img-${size}px"\n'
        'dt: ${hcp.dtype:bf16}\n'
    ))
    cfg = load(p)
    import jax.numpy as jnp
    assert cfg.area == 512 * 512
    assert cfg.mirror == 512
    # keys shadowing dict methods remain reachable via item access
    assert cfg['size'] == 512
    assert cfg.msg == 'img-512px'
    assert cfg.dt == jnp.bfloat16


def test_deferred_from_memory(tmp_path):
    p = _write(tmp_path, 'w.yaml', 'unet: ${hcp.from_memory:unet}\n')
    cfg = load(p)
    assert cfg.unet == '${hcp.from_memory:unet}'


def test_instantiate_target_and_partial():
    node = containerize({
        'opt': {'_target_': 'functools.partial', '_args_': [], '_partial_': False},
    })
    spec = containerize({'_target_': 'collections.OrderedDict', 'a': 1, 'b': {'c': 2}})
    obj = instantiate(spec)
    from collections import OrderedDict
    assert isinstance(obj, OrderedDict)
    assert obj['a'] == 1 and obj['b'].c == 2

    part = instantiate(containerize({'_target_': 'collections.OrderedDict', '_partial_': True, 'a': 1}))
    assert isinstance(part, functools.partial)
    assert part()['a'] == 1


def test_legacy_target_remap():
    spec = containerize({'_target_': 'hcpdiff_tpu.config.node.Cfg'})
    assert isinstance(instantiate(spec), Cfg)


def test_reference_target_paths_instantiate():
    """Reference yaml _target_ strings resolve through the compat remap."""
    from hcpdiff_tpu.config.instantiate import locate
    from hcpdiff_tpu.data.buckets import RatioBucket
    from hcpdiff_tpu.data.dataset import TextImagePairDataset
    from hcpdiff_tpu.data.transforms import TagShuffle
    assert locate('hcpdiff.data.bucket.RatioBucket.from_files').__self__ is RatioBucket
    assert locate('hcpdiff.data.TextImagePairDataset') is TextImagePairDataset
    assert locate('hcpdiff.utils.caption_tools.TagShuffle') is TagShuffle
    assert locate('hcpdiff.loggers.CLILogger') is not None
