import os

import numpy as np
import pytest

from helpers import tiny_world, make_pipeline


def test_x0_history_and_animation(tmp_path):
    from hcpdiff_tpu.infer.interfaces import DiskAnimInterface
    world = tiny_world()
    pipe = make_pipeline(world)
    img, x0s = pipe.txt2img('cat', width=32, height=32, num_steps=3,
                            sampler='ddim', seed=1, return_x0_history=True)
    assert x0s.shape[0] == 3
    assert img.shape == (1, 32, 32, 3)

    itf = DiskAnimInterface(save_root=str(tmp_path))
    for i in range(3):
        itf.on_inter_step(i, 3, None, x0s[i], pipe.decode(x0s[i]))
    itf.on_infer_finish(img, {'prompt': 'cat'})
    files = os.listdir(tmp_path)
    assert any(f.endswith('.webp') for f in files)
    assert any(f.endswith('.png') for f in files)
    assert any(f.endswith('.yaml') for f in files)
