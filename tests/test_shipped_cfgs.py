"""Every shipped yaml must load + resolve (catches schema typos)."""
import glob
import os

import pytest

from hcpdiff_tpu.config import load

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), '..'))
ALL_CFGS = sorted(glob.glob(os.path.join(ROOT, 'cfgs', '**', '*.yaml'),
                            recursive=True))


@pytest.mark.parametrize('path', ALL_CFGS, ids=lambda p: os.path.relpath(p, ROOT))
def test_cfg_loads(path):
    cfg = load(path)
    assert isinstance(cfg, dict) and cfg


def test_example_lora_schema():
    cfg = load(os.path.join(ROOT, 'cfgs/train/examples/lora_conventional.yaml'))
    assert cfg.lora_unet[0]['rank'] == 8
    assert cfg.train.scheduler.name == 'constant_with_warmup'
    assert cfg.data.dataset1.bucket['_target_'].endswith('RatioBucket.from_files')
    assert cfg.data.dataset1.bucket.target_area == 512 * 512


def test_dreamartist_schema():
    cfg = load(os.path.join(ROOT, 'cfgs/train/examples/DreamArtist++.yaml'))
    branches = {s.get('branch') for s in cfg.lora_unet}
    assert branches == {'p', 'n'}
    assert cfg.train.cfg_scale == '1.0-3.0:cos'
    wn = cfg.data.dataset1.source.data_source1.word_names['pt1']
    assert isinstance(wn, list) and len(wn) == 2
