import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hcpdiff_tpu.adapt.overlay import (collapse_overlay, flatten_params,
                                       get_match_layers, init_lora_layer,
                                       lora_delta, make_lora_overlay,
                                       merge_overlays, module_paths,
                                       resolve_rank, trainable_mask)
from helpers import tiny_world


@pytest.fixture(scope='module')
def world():
    return tiny_world()


def test_module_paths_and_regex(world):
    paths = module_paths(world['unet_params'])
    assert any('attn1.to_q' in p for p in paths)
    hits = get_match_layers(['re:.*attn1\\.to_q$'], paths)
    assert hits and all(p.endswith('attn1.to_q') for p in hits)
    # exact-prefix selection
    pref = hits[0].rsplit('.', 1)[0]
    sub = get_match_layers([pref], paths)
    assert set(sub) >= {hits[0]}


def test_lora_zero_init_is_identity(world):
    params = world['unet_params']
    rng = jax.random.PRNGKey(0)
    overlay, scales = make_lora_overlay(rng, params,
                                        [{'layers': ['re:.*to_q$'], 'rank': 4}])
    assert len(overlay) > 0
    merged = merge_overlays(params, [overlay], [scales])
    a = flatten_params(params)
    b = flatten_params(merged)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]), atol=1e-7)


def test_lora_delta_math():
    rng = jax.random.PRNGKey(1)
    entry = init_lora_layer(rng, (8, 16), rank=4, alpha=2.0)
    entry['up'] = jax.random.normal(jax.random.PRNGKey(2), (4, 16))
    d = lora_delta(entry, (8, 16), scale=0.5)
    expect = (np.asarray(entry['down']) @ np.asarray(entry['up'])) * (2.0 / 4) * 0.5
    np.testing.assert_allclose(np.asarray(d), expect, rtol=1e-5)


def test_conv_lora_shape():
    rng = jax.random.PRNGKey(1)
    entry = init_lora_layer(rng, (3, 3, 8, 16), rank=4)
    entry['up'] = jax.random.normal(jax.random.PRNGKey(2), (4, 16))
    d = lora_delta(entry, (3, 3, 8, 16))
    assert d.shape == (3, 3, 8, 16)


def test_collapse_equals_merged_forward(world):
    unet, params, cfg = world['unet'], world['unet_params'], world['unet_cfg']
    rng = jax.random.PRNGKey(0)
    overlay, scales = make_lora_overlay(rng, params,
                                        [{'layers': ['re:.*attn[12]\\.to_(q|k|v)$'],
                                          'rank': 2, 'alpha': 4.0}])
    # give the lora nonzero effect
    overlay = jax.tree_util.tree_map(
        lambda x: x + 0.01 if x.ndim == 2 else x, overlay)

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, cfg.cross_attention_dim))
    t = jnp.array([10])

    merged = merge_overlays(params, [overlay], [scales])
    collapsed = collapse_overlay(params, overlay, scales)
    out_m = unet.apply({'params': merged}, x, t, ctx)
    out_c = unet.apply({'params': collapsed}, x, t, ctx)
    out_0 = unet.apply({'params': params}, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_c), atol=1e-6)
    assert not np.allclose(np.asarray(out_m), np.asarray(out_0), atol=1e-6)


def test_merge_does_not_mutate_base(world):
    params = world['unet_params']
    before = {k: np.asarray(v).copy() for k, v in flatten_params(params).items()}
    overlay, scales = make_lora_overlay(jax.random.PRNGKey(0), params,
                                        [{'layers': ['re:.*to_q$'], 'rank': 2}])
    overlay = jax.tree_util.tree_map(lambda x: x + 1.0 if x.ndim == 2 else x, overlay)
    merge_overlays(params, [overlay], [scales])
    after = flatten_params(params)
    for k in before:
        np.testing.assert_array_equal(before[k], np.asarray(after[k]))


def test_float_rank_resolution():
    assert resolve_rank(0.5, 64) == 32
    assert resolve_rank(8, 64) == 8
    assert resolve_rank(0.1, 7) == 1


def test_stacked_overlays_sum(world):
    params = world['unet_params']
    o1, s1 = make_lora_overlay(jax.random.PRNGKey(0), params,
                               [{'layers': ['re:.*to_q$'], 'rank': 2}])
    o2, s2 = make_lora_overlay(jax.random.PRNGKey(1), params,
                               [{'layers': ['re:.*to_q$'], 'rank': 2}])
    o1 = jax.tree_util.tree_map(lambda x: jnp.ones_like(x), o1)
    o2 = jax.tree_util.tree_map(lambda x: jnp.ones_like(x), o2)
    m12 = merge_overlays(params, [o1, o2], [s1, s2])
    m1 = merge_overlays(params, [o1], [s1])
    m2 = merge_overlays(params, [o2], [s2])
    f12, f1, f2, f0 = map(flatten_params, (m12, m1, m2, params))
    for k in f12:
        np.testing.assert_allclose(np.asarray(f12[k]),
                                   np.asarray(f1[k] + f2[k] - f0[k]), rtol=1e-5)


def test_trainable_mask(world):
    params = world['unet_params']
    mask = trainable_mask(params, ['re:.*attn1.*'])
    flat_m = flatten_params(mask)
    flat_p = flatten_params(params)
    assert set(flat_m) == set(flat_p)
    assert any(v for v in flat_m.values())
    for k, v in flat_m.items():
        if 'attn1' in k:
            assert v, k
    assert not flat_m[[k for k in flat_m if 'conv_in' in k][0]]
