"""End-to-end UNet + denoise-loop numerical parity vs the independent torch
reference (tests/torch_ref.py) — the BASELINE.json north star: per-step
latent parity atol 1e-3 against a reference implementation running the
same weights (VERDICT.md missing item 4; reference loop
hcpdiff/utils/pipe_hook.py:118-153)."""
import numpy as np
import os
import pytest

import jax
import jax.numpy as jnp

from hcpdiff_tpu.models.unet import UNetConfig, UNet2DCondition
from tests.torch_ref import torch_unet_forward


def _build(cfg, seed=0):
    unet = UNet2DCondition(cfg, dtype=jnp.float32)
    params = unet.init(jax.random.PRNGKey(seed),
                       jnp.zeros((1, 8, 8, cfg.in_channels)), jnp.array([0]),
                       jnp.zeros((1, 77, cfg.cross_attention_dim)))['params']
    # non-degenerate weights: inits give zeros for some biases; perturb all
    # leaves deterministically so parity covers every parameter
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rngs = jax.random.split(jax.random.PRNGKey(seed + 1), len(leaves))
    leaves = [l + 0.02 * jax.random.normal(r, l.shape)
              for l, r in zip(leaves, rngs)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    return unet, params


def test_full_unet_forward_matches_torch_tiny():
    cfg = UNetConfig.tiny()
    unet, params = _build(cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (2, 77, cfg.cross_attention_dim))
    t = jnp.array([500, 10])
    ours = np.asarray(unet.apply({'params': params}, x, t, ctx))
    ref = torch_unet_forward(jax.device_get(params), cfg, x, t, ctx)
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_denoise_loop_per_step_latents_match_torch():
    """Per-step latent parity through a 5-step DDIM CFG loop (atol 1e-3)."""
    from hcpdiff_tpu.diffusion.samplers import make_sampler
    from hcpdiff_tpu.diffusion.schedules import NoiseSchedule
    cfg = UNetConfig.tiny()
    unet, params = _build(cfg)
    params_np = jax.device_get(params)
    schedule = NoiseSchedule.make()
    sampler = make_sampler('ddim', schedule, 5)
    B, g = 1, 7.5
    ctx = jax.random.normal(jax.random.PRNGKey(3), (2 * B, 77,
                                                    cfg.cross_attention_dim))
    lat0 = jax.random.normal(jax.random.PRNGKey(4), (B, 8, 8, 4))

    def eps_ours(x, t):
        x2 = jnp.concatenate([x, x], axis=0)
        out = unet.apply({'params': params}, x2,
                         jnp.full((2 * B,), t), ctx)
        e_n, e_p = jnp.split(out, 2, axis=0)
        return e_n + g * (e_p - e_n)

    def eps_ref(x, t):
        x2 = np.concatenate([x, x], axis=0)
        out = torch_unet_forward(params_np, cfg, x2,
                                 np.full((2 * B,), int(t)), ctx)
        e_n, e_p = out[:B], out[B:]
        return e_n + g * (e_p - e_n)

    x_a = lat0 * sampler.init_noise_sigma
    x_b = np.asarray(x_a)
    st_a = st_b = sampler.init_state(x_a.shape)
    for i in range(5):
        t = sampler.timesteps[i]
        xa_in = sampler.scale_model_input(st_a, x_a, jnp.asarray(i))
        xb_in = sampler.scale_model_input(st_b, jnp.asarray(x_b), jnp.asarray(i))
        x_a, st_a, _ = sampler.step(st_a, eps_ours(xa_in, t), jnp.asarray(i),
                                    x_a)
        x_b_j, st_b, _ = sampler.step(st_b, jnp.asarray(eps_ref(np.asarray(xb_in), t)),
                                      jnp.asarray(i), jnp.asarray(x_b))
        x_b = np.asarray(x_b_j)
        np.testing.assert_allclose(np.asarray(x_a), x_b, atol=1e-3,
                                   err_msg=f'step {i}')


def test_full_unet_forward_matches_torch_tiny_sdxl():
    """SDXL text_time conditioning parity: pooled_text_emb + time_ids
    through add_embedding (reference: diffusers UNet add_embedding reached
    via hcpdiff models/compose SDXL wrappers)."""
    cfg = UNetConfig.tiny_sdxl()
    unet = UNet2DCondition(cfg, dtype=jnp.float32)
    B = 2
    pooled0 = jnp.zeros((1, 24))
    tid0 = jnp.zeros((1, 6))
    params = unet.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 8, 8, cfg.in_channels)), jnp.array([0]),
                       jnp.zeros((1, 77, cfg.cross_attention_dim)),
                       pooled_text_emb=pooled0, time_ids=tid0)['params']
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rngs = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    leaves = [l + 0.02 * jax.random.normal(r, l.shape)
              for l, r in zip(leaves, rngs)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    x = jax.random.normal(jax.random.PRNGKey(2), (B, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (B, 77, cfg.cross_attention_dim))
    t = jnp.array([500, 10])
    pooled = jax.random.normal(jax.random.PRNGKey(4), (B, 24))
    time_ids = jnp.asarray([[128., 128., 0., 0., 128., 128.],
                            [64., 64., 8., 8., 64., 64.]])
    ours = np.asarray(unet.apply({'params': params}, x, t, ctx,
                                 pooled_text_emb=pooled, time_ids=time_ids))
    ref = torch_unet_forward(jax.device_get(params), cfg, x, t, ctx,
                             pooled_text_emb=pooled, time_ids=time_ids)
    np.testing.assert_allclose(ours, ref, atol=5e-4)


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get('HCP_RUN_SLOW') != '1',
                    reason='>20 min of single-CPU compile+compute on this '
                           'host; run with HCP_RUN_SLOW=1 (tiny-graph and '
                           'per-step loop parity above cover the same math '
                           'in every run)')
def test_full_unet_forward_matches_torch_sd15():
    """Full-size SD1.5 graph parity at 512px latents, fp32, atol 1e-3."""
    cfg = UNetConfig.sd15()
    unet = UNet2DCondition(cfg, dtype=jnp.float32)
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 4)),
                       jnp.array([0]), jnp.zeros((1, 77, 768)))['params']
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 77, 768))
    t = jnp.array([500])
    ours = np.asarray(unet.apply({'params': params}, x, t, ctx))
    ref = torch_unet_forward(jax.device_get(params), cfg, x, t, ctx)
    np.testing.assert_allclose(ours, ref, atol=1e-3)
