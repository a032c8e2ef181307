"""Regression tests for the round-5 VERDICT/ADVICE fixes:

1. ADVICE r4 medium — with HCP_FLASH_NOMAX=1 (the default) the Pallas
   backward must recompute p from the SAME clamped logits the forward
   used; logits above the clamp (~55 natural units) previously made
   backward p >> forward p and exploded gradients.
2. VERDICT r4 weak #7 — a default-on Pallas kernel failing to
   trace/compile must warn ONCE (naming kernel + exception) instead of
   silently degrading to the XLA path.
3. VERDICT r4 weak #2 — SDXL-1024 VAE attention (D=512) must route to
   the flash kernel with DEFAULT env flags (no HCP_FLASH_VAE needed).
"""
import warnings

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def _clamped_reference(q, k, v, scale, clamp_nat):
    """Softmax with the no-max upper clamp — the function the nomax
    forward actually computes (flash_attention.py NOMAX_CLAMP)."""
    s = jnp.einsum('bhqd,bhkd->bhqk', q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    u = jnp.minimum(s, clamp_nat)
    p = jnp.exp(u - jax.scipy.special.logsumexp(u, axis=-1, keepdims=True))
    return jnp.einsum('bhqk,bhkd->bhqd', p, v.astype(jnp.float32))


def test_nomax_backward_matches_clamped_forward(monkeypatch):
    """Gradients with logits ABOVE the clamp: flash backward must equal
    autodiff of the clamped forward (previously used unclamped s)."""
    from hcpdiff_tpu.ops.flash_attention import (LN2, NOMAX_CLAMP,
                                                 flash_attention)
    monkeypatch.setenv('HCP_FLASH_NOMAX', '1')
    monkeypatch.setenv('HCP_FLASH_EXP2', '1')
    rng = jax.random.PRNGKey(11)
    r1, r2, r3 = jax.random.split(rng, 3)
    D, S = 40, 256
    # scale q so a meaningful fraction of logits exceed the ~55.4-nat clamp
    q = jax.random.normal(r1, (1, 2, S, D)) * 16.0
    k = jax.random.normal(r2, (1, 2, S, D))
    v = jax.random.normal(r3, (1, 2, S, D))
    scale = D ** -0.5
    s_max = float(jnp.max(jnp.einsum('bhqd,bhkd->bhqk', q, k)) * scale)
    assert s_max > NOMAX_CLAMP * LN2, 'fixture must engage the clamp'

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(
            _clamped_reference(q, k, v, scale, NOMAX_CLAMP * LN2) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    # boundary elements (s within an ulp of the clamp) differ between the
    # fwd (log2 domain, scale folded into q) and bwd (natural units) paths;
    # the pre-fix bug produced orders-of-magnitude explosions, so this
    # tolerance still catches it
    for a, b, name in zip(gf, gr, 'qkv'):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                   rtol=2e-2, err_msg=f'd{name}')


def test_nomax_backward_normal_range(monkeypatch):
    """Ordinary logit ranges (clamp never engages): the clamp-aware
    backward must stay exactly equal to the unclamped reference."""
    from hcpdiff_tpu.ops.flash_attention import flash_attention, _xla_reference
    monkeypatch.setenv('HCP_FLASH_NOMAX', '1')
    rng = jax.random.PRNGKey(12)
    r1, r2, r3 = jax.random.split(rng, 3)
    D, S = 40, 256
    q = jax.random.normal(r1, (1, 2, S, D))
    k = jax.random.normal(r2, (1, 2, S, D))
    v = jax.random.normal(r3, (1, 2, S, D))
    scale = D ** -0.5

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_reference(q, k, v, False, scale) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, 'qkv'):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   err_msg=f'd{name}')


@pytest.mark.parametrize('D,S,causal', [(40, 512, False), (64, 512, False),
                                         (80, 256, False), (40, 512, True)])
def test_flash_tq_matches_reference(monkeypatch, D, S, causal):
    """Transposed-layout kernel (HCP_FLASH_TQ — PV rides the sublane dim
    to defeat the 128-lane pad at D=40/64/80) must match the XLA softmax
    reference bit-for-bit at CPU-interpret precision."""
    from hcpdiff_tpu.ops import flash_attention as fa
    monkeypatch.setenv('HCP_FLASH_NOMAX', '1')
    monkeypatch.setenv('HCP_FLASH_TQ', '1')
    fa._make_flash.cache_clear()
    assert fa._use_tq(D, True)
    rng = jax.random.PRNGKey(3)
    r1, r2, r3 = jax.random.split(rng, 3)
    q = jax.random.normal(r1, (2, 3, S, D), jnp.float32)
    k = jax.random.normal(r2, (2, 3, S, D), jnp.float32)
    v = jax.random.normal(r3, (2, 3, S, D), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = fa._flash_forward_tq(q, k, v, causal, D ** -0.5,
                                   fa._pick_block(S, 256),
                                   fa._pick_block(S, 128))
    ref = fa._xla_reference(q, k, v, causal, D ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_tq_routing():
    """_use_tq: on for lane-padded head dims, off where D is lane-exact
    (VAE D=512 / D=128) or when nomax is disabled."""
    from hcpdiff_tpu.ops.flash_attention import _use_tq
    import os
    old = os.environ.get('HCP_FLASH_TQ')
    os.environ['HCP_FLASH_TQ'] = '1'
    try:
        assert _use_tq(40, True) and _use_tq(64, True) and _use_tq(80, True)
        assert not _use_tq(128, True)
        assert not _use_tq(512, True)
        assert not _use_tq(40, False)           # nomax off -> classic kernel
        os.environ['HCP_FLASH_TQ'] = '0'
        assert not _use_tq(40, True)
    finally:
        if old is None:
            os.environ.pop('HCP_FLASH_TQ', None)
        else:
            os.environ['HCP_FLASH_TQ'] = old


def test_pallas_fallback_warns_once(monkeypatch):
    """Forced kernel failure -> exactly one RuntimeWarning naming the
    kernel and the exception; subsequent calls stay silent; the XLA
    fallback result is still returned and correct."""
    from hcpdiff_tpu.ops import attention as attn_mod
    from hcpdiff_tpu.ops import flash_attention as fa_mod

    def boom(*a, **kw):
        raise ValueError('forced kernel failure for test')

    monkeypatch.setattr(fa_mod, 'flash_attention', boom)
    monkeypatch.setattr(attn_mod, '_warned_fallbacks', set())
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (1, 1, 128, 32))
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter('always')
        out = attn_mod.attention(q, q, q, use_flash=True)
        msgs = [w for w in rec if issubclass(w.category, RuntimeWarning)]
    assert len(msgs) == 1, [str(w.message) for w in rec]
    assert 'flash_attention' in str(msgs[0].message)
    assert 'forced kernel failure' in str(msgs[0].message)
    ref = attn_mod._xla_attention(q, q, q, None, False, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    with warnings.catch_warnings(record=True) as rec2:
        warnings.simplefilter('always')
        attn_mod.attention(q, q, q, use_flash=True)
        msgs2 = [w for w in rec2 if issubclass(w.category, RuntimeWarning)]
    assert not msgs2, 'fallback warning must fire only once per kernel'


def test_vae_d512_routes_to_flash_by_default(monkeypatch):
    """SDXL-1024 decode shape (H=1, D=512) must pick the flash kernel with
    default env flags — the XLA path materializes ~4.3GB logits and OOMs.
    Verified by interception: the dispatcher must CALL flash_attention."""
    from hcpdiff_tpu.ops import attention as attn_mod
    from hcpdiff_tpu.ops import flash_attention as fa_mod
    for var in ('HCP_FLASH_VAE', 'HCP_FLASH_ATTN'):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
    called = {}

    def spy(q, k, v, causal=False, scale=None):
        called['yes'] = True
        return v  # shape-compatible stand-in; no kernel run on CPU

    monkeypatch.setattr(fa_mod, 'flash_attention', spy)
    q = jnp.zeros((1, 1, 2048, 512), jnp.bfloat16)
    attn_mod.attention(q, q, q)
    assert called.get('yes'), 'D=512 self-attention must route to flash'
    # escape hatch restores the old D<=256 gate
    called.clear()
    monkeypatch.setenv('HCP_FLASH_VAE', '0')
    attn_mod.attention(q, q, q)
    assert not called, 'HCP_FLASH_VAE=0 must restore the XLA route'


def test_frozen_base_dtype_bf16(tmp_path):
    """model.frozen_base_dtype: bf16 stores the frozen base in bf16 (the
    SDXL-1024 single-chip memory fix) while trainable masters stay fp32;
    training still converges to finite losses."""
    import json

    from PIL import Image

    from hcpdiff_tpu.config import containerize
    from hcpdiff_tpu.trainer.trainer import Trainer

    imgs = tmp_path / 'imgs'
    imgs.mkdir()
    rng = np.random.default_rng(0)
    caps = {}
    for i in range(2):
        arr = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(imgs / f'img_{i}.png')
        caps[f'img_{i}'] = f'a photo of cat {i}'
    with open(imgs / 'captions.json', 'w') as f:
        json.dump(caps, f)

    cfg = containerize({
        'exp_dir': str(tmp_path / 'exp'),
        'mixed_precision': 'bf16',
        'seed': 1,
        'ckpt_type': 'safetensors',
        'train': {
            'train_steps': 2, 'save_step': 2,
            'gradient_accumulation_steps': 1, 'max_grad_norm': 1.0,
            'cfg_scale': '1.0',
            'loss': {'criterion': {'_target_': 'mse'}},
            'optimizer': {'_target_': 'optim.adamw', 'weight_decay': 1e-3},
            'scheduler': {'name': 'constant', 'num_warmup_steps': 0,
                          'num_training_steps': 2},
        },
        'model': {'pretrained_model_name_or_path': 'tiny',
                  'tokenizer_repeats': 1, 'gradient_checkpointing': False,
                  'frozen_base_dtype': 'bf16'},
        'logger': [],
        'data': {'dataset1': {
            'batch_size': 2, 'cache_latents': True,
            'source': {'s1': {'img_root': str(imgs),
                              'caption_file': str(imgs / 'captions.json')}},
            'bucket': {'_target_': 'FixedBucket', 'target_size': 32},
        }},
        'tokenizer_pt': {'emb_dir': None, 'train': None},
        'lora_unet': [{'lr': 1e-3, 'rank': 2,
                       'layers': ['re:.*attn1\\.to_q$']}],
    })
    t = Trainer(cfg)
    frozen_dtypes = {x.dtype for x in jax.tree_util.tree_leaves(t.frozen)}
    assert jnp.dtype(jnp.bfloat16) in frozen_dtypes
    assert jnp.dtype(jnp.float32) not in frozen_dtypes
    # trainable LoRA masters stay fp32
    pack_dtypes = {x.dtype for x in jax.tree_util.tree_leaves(t.pack)}
    assert pack_dtypes == {jnp.dtype(jnp.float32)}
    assert t.train() == 2


def test_cast_tree_bf16_groups():
    """Grouped donated cast: fp32 leaves -> bf16 (values preserved),
    non-fp32 leaves untouched, group packing covers multi-group trees."""
    from hcpdiff_tpu.utils.casting import cast_tree_bf16
    tree = {'a': jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
            'b': {'c': jnp.ones((8,), jnp.float32) * 0.5,
                  'd': jnp.arange(4, dtype=jnp.int32),
                  'e': jnp.ones((2,), jnp.bfloat16)}}
    out = cast_tree_bf16(tree, group_bytes=16)  # force several groups
    assert out['a'].dtype == jnp.bfloat16
    assert out['b']['c'].dtype == jnp.bfloat16
    assert out['b']['d'].dtype == jnp.int32
    assert out['b']['e'].dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out['a'], np.float32),
                               np.arange(12, dtype=np.float32).reshape(3, 4))
    np.testing.assert_allclose(np.asarray(out['b']['c'], np.float32), 0.5)
