import numpy as np
import pytest
from PIL import Image

from hcpdiff_tpu.utils import native


@pytest.fixture(scope='module')
def lib_ok():
    if not native.available():
        pytest.skip('native image ops unavailable (no toolchain)')
    return True


def test_resize_matches_pil(lib_ok):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(80, 120, 3), dtype=np.uint8)
    out = native.resize_crop_normalize(img, resize_wh=(64, 48),
                                       crop_xy=(0, 0), target_wh=(64, 48))
    ref = np.asarray(Image.fromarray(img).resize((64, 48), Image.BICUBIC),
                     np.float32) / 127.5 - 1.0
    # PIL rounds to uint8 between the two resampling passes; ours keeps
    # float32 throughout (higher fidelity), so allow a small quantization gap
    diff = np.abs(out - ref)
    assert diff.mean() < 1.0 / 127.5
    assert diff.max() < 6.0 / 127.5


def test_crop_offsets(lib_ok):
    img = np.zeros((64, 64, 3), np.uint8)
    img[:, 32:] = 255
    out = native.resize_crop_normalize(img, resize_wh=(64, 64),
                                       crop_xy=(32, 0), target_wh=(32, 64))
    assert out.min() > 0.9  # right half only


def test_batch_threads(lib_ok):
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, size=(50 + i, 70, 3), dtype=np.uint8)
            for i in range(8)]
    out = native.batch_resize_crop_normalize(
        imgs, [(32, 32)] * 8, [(0, 0)] * 8, (32, 32), num_threads=4)
    assert out.shape == (8, 32, 32, 3)
    assert np.isfinite(out).all()
    # batch path equals single path
    single = native.resize_crop_normalize(imgs[0], (32, 32), (0, 0), (32, 32))
    np.testing.assert_allclose(out[0], single, atol=1e-6)
