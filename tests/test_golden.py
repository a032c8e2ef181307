"""Golden-value regression tests: pinned outputs of the tiny models.

BASELINE.json's parity target (per-step latents vs diffusers, atol 1e-3)
needs real SD weights which this image lacks; these goldens serve the same
purpose across rounds — any unintended numerical drift in the denoise path,
CLIP encoder, or scheduler tables fails here. Goldens are generated once
(committed) and compared thereafter.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(__file__), 'golden')


def _check_or_create(name, value, atol=5e-5):
    os.makedirs(GOLDEN, exist_ok=True)
    path = os.path.join(GOLDEN, f'{name}.npz')
    value = np.asarray(value, np.float32)
    if not os.path.exists(path):
        np.savez_compressed(path, value=value)
        pytest.skip(f'golden {name} created')
    ref = np.load(path)['value']
    np.testing.assert_allclose(value, ref, atol=atol,
                               err_msg=f'numerical drift vs golden {name}')


def test_schedule_tables_golden():
    from hcpdiff_tpu.diffusion.schedules import NoiseSchedule
    s = NoiseSchedule.make()
    _check_or_create('alphas_cumprod', np.asarray(s.alphas_cumprod)[::100])


def test_ddim_latents_golden():
    from helpers import tiny_world, make_pipeline
    w = tiny_world()
    pipe = make_pipeline(w)
    lat = pipe.txt2img('a photo of cat', 'dog', width=32, height=32,
                       num_steps=5, sampler='ddim', seed=123,
                       return_latents=True)
    _check_or_create('ddim5_latents', np.asarray(lat), atol=1e-4)


def test_clip_hidden_golden():
    from helpers import tiny_world
    w = tiny_world()
    hidden, pooled = w['frontend'].encode(['a photo of cat'])
    _check_or_create('clip_hidden', np.asarray(hidden)[:, ::7, ::5], atol=1e-4)


def test_euler_a_latents_golden():
    from helpers import tiny_world, make_pipeline
    w = tiny_world()
    pipe = make_pipeline(w)
    lat = pipe.txt2img('painting', '', width=32, height=32,
                       num_steps=4, sampler='euler_a', seed=7,
                       return_latents=True)
    _check_or_create('euler_a4_latents', np.asarray(lat), atol=1e-4)
