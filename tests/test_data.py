import json
import os

import numpy as np
import pytest
from PIL import Image

from hcpdiff_tpu.data.buckets import FixedBucket, RatioBucket, LongEdgeBucket
from hcpdiff_tpu.data.captions import (JsonCaptionLoader, TXTCaptionLoader,
                                       YamlCaptionLoader, auto_caption_loader)
from hcpdiff_tpu.data.dataset import CycleData, DataGroup, TextImagePairDataset
from hcpdiff_tpu.data.img_size import get_image_size
from hcpdiff_tpu.data.sources import T2IFolderClassSource, Text2ImageSource
from hcpdiff_tpu.data.transforms import (TagDropout, TagErase, TagShuffle,
                                         TemplateFill)
from hcpdiff_tpu.data.utils import resize_crop_fix


@pytest.fixture(scope='module')
def img_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp('imgs')
    rng = np.random.default_rng(0)
    sizes = [(64, 64), (64, 64), (128, 64), (64, 128), (96, 64), (64, 96)]
    caps = {}
    for i, (w, h) in enumerate(sizes):
        arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        name = f'img_{i}'
        Image.fromarray(arr).save(d / f'{name}.png')
        caps[name] = f'caption {i}, tag{i}, common'
    with open(d / 'captions.json', 'w') as f:
        json.dump(caps, f)
    return str(d)


def test_img_size_headers(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
    for ext in ['png', 'jpg', 'bmp', 'gif', 'webp']:
        p = str(tmp_path / f'x.{ext}')
        Image.fromarray(arr).save(p)
        assert get_image_size(p) == (64, 48), ext


def test_caption_loaders(img_dir, tmp_path):
    caps = JsonCaptionLoader(os.path.join(img_dir, 'captions.json'))()
    assert caps['img_0'].startswith('caption 0')
    auto = auto_caption_loader(os.path.join(img_dir, 'captions.json'))
    assert isinstance(auto, JsonCaptionLoader)
    (tmp_path / 'a.txt').write_text('hello txt')
    caps2 = TXTCaptionLoader(str(tmp_path))()
    assert caps2['a'] == 'hello txt'


def test_text_transforms():
    rng = np.random.default_rng(0)
    t = TagShuffle()('a, b, c', rng)
    assert sorted(x.strip() for x in t.split(',')) == ['a', 'b', 'c']
    assert TagDropout(p=1.0)('a, b, c', rng).count(',') == 0  # keeps >=1 tag
    assert TagErase(p=1.0)('abc', rng) == ''
    tf = TemplateFill({'pt1': 'my-word'})
    assert tf('a photo of {pt1}', 'cap') == 'a photo of my-word, cap'
    tfd = TemplateFill({'pt1': ('neg-w', 'pos-w')})
    pair = tfd('a {pt1}', None)
    assert pair == ['a neg-w', 'a pos-w']


def test_fixed_bucket_padding():
    b = FixedBucket(64)
    infos = [(f'f{i}', (64, 64)) for i in range(5)]
    b.build(infos, bs=2, world_size=2)
    assert len(b.order) % 4 == 0
    idx, size = b[0]
    assert len(idx) == 2 and size == (64, 64)


def test_ratio_bucket_deterministic(img_dir):
    infos = [(f'f{i}', s) for i, s in
             enumerate([(512, 512), (768, 512), (512, 768), (640, 512)] * 3)]
    b1 = RatioBucket.from_files(target_area=512 * 512, num_bucket=3)
    b1.build(infos, bs=2)
    b2 = RatioBucket.from_files(target_area=512 * 512, num_bucket=3)
    b2.build(infos, bs=2)
    assert b1.sizes == b2.sizes
    b1.rest(3)
    b2.rest(3)
    for i in range(len(b1)):
        np.testing.assert_array_equal(b1[i][0], b2[i][0])
        assert b1[i][1] == b2[i][1]
    b2.rest(4)
    diff = any(not np.array_equal(b1[i][0], b2[i][0]) or b1[i][1] != b2[i][1]
               for i in range(min(len(b1), len(b2))))
    assert diff  # different epoch -> different order


def test_ratio_bucket_batch_same_size(img_dir):
    infos = [(f'f{i}', s) for i, s in
             enumerate([(512, 512), (1024, 512)] * 4)]
    b = RatioBucket.from_files(target_area=256 * 256, num_bucket=2, step_size=8)
    b.build(infos, bs=2)
    for i in range(len(b)):
        idx, size = b[i]
        assert len(idx) == 2
        assert size[0] % 8 == 0 and size[1] % 8 == 0
        area = size[0] * size[1]
        assert 0.6 * 256 * 256 < area < 1.6 * 256 * 256


def test_long_edge_bucket():
    infos = [('a', (1000, 500)), ('b', (500, 1000)), ('c', (800, 800))]
    b = LongEdgeBucket(target_edge=512, num_bucket=3)
    b.build(infos, bs=1)
    for w, h in b.sizes:
        assert max(w, h) <= 512 + 8


def test_resize_crop_fix():
    img = Image.new('RGB', (100, 50))
    out, info = resize_crop_fix(img, (64, 64))
    assert out.size == (64, 64)
    assert info['original_size'] == (100, 50)


def test_dataset_end_to_end(img_dir):
    from helpers import tiny_world
    world = tiny_world()
    src = Text2ImageSource(img_dir, caption_file=os.path.join(img_dir, 'captions.json'),
                           prompt_template='a photo of {caption}')
    ds = TextImagePairDataset(src, RatioBucket.from_files(target_area=64 * 64,
                                                          num_bucket=2),
                              frontend=world['frontend'], vae_scale=2)
    ds.build(bs=2, world_size=1)
    assert len(ds) >= 3
    batch = ds.get_batch(0)
    assert 'images' in batch and batch['images'].ndim == 4
    assert batch['input_ids'].shape[0] == 2
    assert np.isfinite(batch['images']).all()
    assert batch['images'].min() >= -1.001 and batch['images'].max() <= 1.001


def test_latent_caching(img_dir, tmp_path):
    from helpers import tiny_world
    world = tiny_world()
    src = Text2ImageSource(img_dir, caption_file=os.path.join(img_dir, 'captions.json'))
    ds = TextImagePairDataset(src, FixedBucket(32), frontend=world['frontend'],
                              vae_scale=2, cache_latents=True,
                              cache_dir=str(tmp_path))
    ds.build(bs=2)

    def fake_encode(imgs):
        return imgs[:, ::2, ::2, :3][..., :1].repeat(4, axis=-1) * 0.1

    ds.cache_all_latents(fake_encode)
    b = ds.get_batch(0)
    assert 'latents' in b and 'images' not in b
    assert b['latents'].shape[1:] == (16, 16, 4)

    # disk cache round-trip
    ds2 = TextImagePairDataset(src, FixedBucket(32), frontend=world['frontend'],
                               vae_scale=2, cache_latents=True,
                               cache_dir=str(tmp_path))
    ds2.build(bs=2)
    assert ds2.load_latent_cache()
    b2 = ds2.get_batch(0)
    np.testing.assert_allclose(b['latents'], b2['latents'], atol=1e-6)


def test_folder_class_source(tmp_path):
    d = tmp_path / 'db'
    (d / '2_cute dog').mkdir(parents=True)
    arr = np.zeros((32, 32, 3), np.uint8)
    Image.fromarray(arr).save(d / '2_cute dog' / 'a.png')
    src = T2IFolderClassSource(str(d), prompt_template='a {caption}')
    files = src.get_image_list()
    assert len(files) == 2  # repeat=2
    assert files[0][1]['class_word'] == 'cute dog'


def test_datagroup_cycles(img_dir):
    from helpers import tiny_world
    world = tiny_world()
    src = Text2ImageSource(img_dir)
    ds = TextImagePairDataset(src, FixedBucket(32), frontend=world['frontend'],
                              vae_scale=2)
    ds.build(bs=2)
    group = DataGroup([ds], prefetch=0)
    it = iter(group)
    seen = [next(it) for _ in range(len(ds) + 2)]  # crosses an epoch boundary
    assert all(isinstance(b, list) and len(b) == 1 for b in seen)


def test_host_sliced_batches(tmp_path):
    """Multi-host data loading: each host's stride slice unions to the full
    batch with no overlap (torch DistributedSampler semantics)."""
    import json
    import numpy as np
    from PIL import Image
    from hcpdiff_tpu.data.buckets import FixedBucket
    from hcpdiff_tpu.data.dataset import TextImagePairDataset
    from hcpdiff_tpu.data.sources import Text2ImageSource

    imgs = tmp_path / 'imgs'
    imgs.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(imgs / f'i{i}.png')
    src = Text2ImageSource(str(imgs))
    ds = TextImagePairDataset(src, FixedBucket(32))
    ds.build(4, world_size=1)

    full = ds.get_batch(0)
    parts = []
    for rank in range(2):
        ds.host_rank, ds.host_count = rank, 2
        b = ds.get_batch(0)
        assert b['images'].shape[0] == 2  # bs 4 / 2 hosts
        parts.append(b['images'])
    ds.host_rank, ds.host_count = 0, 1
    merged = np.empty_like(full['images'])
    merged[0::2], merged[1::2] = parts[0], parts[1]
    np.testing.assert_array_equal(merged, full['images'])
