import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hcpdiff_tpu.ckpt.formats import (fold_dict, kohya_to_overlay,
                                      load_webui_embedding,
                                      lora_overlay_to_state,
                                      lora_state_to_overlay, overlay_to_kohya,
                                      save_webui_embedding, unfold_dict)
from hcpdiff_tpu.ckpt.manager import (CkptManagerPKL, CkptManagerSafe,
                                      OrbaxCkptManager, auto_manager)
from hcpdiff_tpu.ckpt.sd_convert import (clip_params_to_torch,
                                         unet_params_to_torch,
                                         unet_torch_to_params,
                                         vae_params_to_torch,
                                         vae_torch_to_params)
from hcpdiff_tpu.ckpt.clip_convert import clip_text_torch_to_params


def _tree_eq(a, b, atol=0):
    fa, fb = unfold_dict(a), unfold_dict(b)
    assert set(fa) == set(fb), (set(fa) ^ set(fb))
    for k in fa:
        np.testing.assert_allclose(fa[k], fb[k], atol=atol, err_msg=k)


def test_fold_unfold_roundtrip():
    nested = {'a': {'b': np.ones((2, 2)), 'c': np.zeros(3)}, 'd': np.arange(4)}
    flat = unfold_dict(nested)
    assert set(flat) == {'a:b', 'a:c', 'd'}
    _tree_eq(fold_dict(flat), nested)


def test_lora_state_roundtrip():
    overlay = {'down_0.attn.to_q': {'down': np.random.randn(8, 4).astype(np.float32),
                                    'up': np.random.randn(4, 16).astype(np.float32),
                                    'alpha': np.float32(2.0)}}
    sd = lora_overlay_to_state(overlay)
    assert 'down_0.attn.to_q.___.layer.W_down' in sd
    assert sd['down_0.attn.to_q.___.layer.W_down'].shape == (4, 8)  # [r, in]
    back = lora_state_to_overlay(sd)
    _tree_eq(back, overlay)


def test_kohya_roundtrip():
    overlay = {'down_0_attn_0.transformer_blocks_0.attn1.to_q':
               {'down': np.random.randn(8, 4).astype(np.float32),
                'up': np.random.randn(4, 16).astype(np.float32),
                'alpha': np.float32(4.0)}}
    torch_paths = {'down_0_attn_0.transformer_blocks_0.attn1.to_q':
                   'down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q'}
    sd = overlay_to_kohya(overlay, torch_paths)
    key = 'lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q'
    assert f'{key}.lora_down.weight' in sd
    assert sd[f'{key}.lora_down.weight'].shape == (4, 8)
    flax_paths = {v: k for k, v in torch_paths.items()}
    back = kohya_to_overlay(sd, flax_paths)
    _tree_eq(back, overlay)


def test_webui_embedding_roundtrip(tmp_path):
    vecs = np.random.randn(3, 16).astype(np.float32)
    p = str(tmp_path / 'myword.pt')
    save_webui_embedding(p, vecs, 'myword', step=100)
    name, back = load_webui_embedding(p)
    assert name == 'myword'
    np.testing.assert_allclose(back, vecs)


@pytest.mark.parametrize('mgr_cls', [CkptManagerSafe, CkptManagerPKL])
def test_ckpt_manager_roundtrip(tmp_path, mgr_cls):
    mgr = mgr_cls()
    base = {'conv_in': {'kernel': np.random.randn(3, 3, 4, 8).astype(np.float32)}}
    overlay = {'attn.to_q': {'down': np.random.randn(8, 2).astype(np.float32),
                             'up': np.random.randn(2, 8).astype(np.float32),
                             'alpha': np.float32(1.0)}}
    p = str(tmp_path / ('m' + mgr.ext))
    mgr.save_model_with_lora(p, base=base, lora_overlay=overlay)
    ckpt = mgr.load_ckpt(p)
    _tree_eq(ckpt['base'], base)
    _tree_eq(ckpt['lora'], overlay)


def test_auto_manager():
    assert isinstance(auto_manager('x.safetensors'), CkptManagerSafe)
    assert isinstance(auto_manager('x.ckpt'), CkptManagerPKL)


def test_unet_torch_roundtrip():
    from hcpdiff_tpu.models.unet import UNetConfig, UNet2DCondition
    cfg = UNetConfig.tiny()
    model = UNet2DCondition(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                        jnp.array([0]), jnp.zeros((1, 77, 32)))['params']
    sd = unet_params_to_torch(params, cfg)
    assert len(sd) > 50
    back = unet_torch_to_params(sd, cfg)
    _tree_eq(back, jax.tree_util.tree_map(np.asarray, params), atol=1e-6)


def test_vae_torch_roundtrip():
    from hcpdiff_tpu.models.vae import VAEConfig, AutoencoderKL
    cfg = VAEConfig.tiny()
    model = AutoencoderKL(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                        jax.random.PRNGKey(1))['params']
    sd = vae_params_to_torch(params, cfg)
    back = vae_torch_to_params(sd, cfg)
    _tree_eq(back, jax.tree_util.tree_map(np.asarray, params), atol=1e-6)


def test_clip_torch_roundtrip():
    from hcpdiff_tpu.models.clip import CLIPTextConfig, CLIPTextModel
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))['params']
    sd = clip_params_to_torch(params, cfg.num_hidden_layers)
    back = clip_text_torch_to_params(sd, cfg.num_hidden_layers)
    _tree_eq(back, jax.tree_util.tree_map(np.asarray, params), atol=1e-6)


def test_orbax_train_state_resume(tmp_path):
    state = {'step': jnp.asarray(5), 'w': jnp.ones((4, 4)) * 3.0}
    mgr = OrbaxCkptManager(str(tmp_path / 'orbax'))
    mgr.save(5, state)
    assert mgr.latest_step() == 5
    restored = mgr.restore(template=jax.tree_util.tree_map(np.zeros_like, state))
    np.testing.assert_allclose(np.asarray(restored['w']), 3.0)


def test_conv_lora_state_roundtrip():
    from hcpdiff_tpu.ckpt.formats import (lora_overlay_to_state,
                                          lora_state_to_overlay)
    kh, kw, cin, cout, r = 3, 3, 8, 16, 4
    overlay = {'down_0_res_0.conv1': {
        'down': np.random.randn(kh * kw * cin, r).astype(np.float32),
        'up': np.random.randn(r, cout).astype(np.float32),
        'alpha': np.float32(1.0)}}
    aliases = {'down_0_res_0.conv1': 'down_blocks.0.resnets.0.conv1'}
    conv_shapes = {'down_0_res_0.conv1': (kh, kw, cin, cout)}
    sd = lora_overlay_to_state(overlay, aliases=aliases, conv_shapes=conv_shapes)
    key = 'down_blocks.0.resnets.0.conv1.___.layer.W_down'
    assert key in sd and sd[key].shape == (r, cin, kh, kw)  # reference layout
    assert sd['down_blocks.0.resnets.0.conv1.___.layer.W_up'].shape == (cout, r, 1, 1)
    back = lora_state_to_overlay(sd, aliases=aliases)
    assert set(back) == {'down_0_res_0.conv1'}
    np.testing.assert_allclose(back['down_0_res_0.conv1']['down'],
                               overlay['down_0_res_0.conv1']['down'], atol=1e-6)
    np.testing.assert_allclose(back['down_0_res_0.conv1']['up'],
                               overlay['down_0_res_0.conv1']['up'], atol=1e-6)


def test_conv_lora_kohya_roundtrip():
    from hcpdiff_tpu.ckpt.formats import kohya_to_overlay, overlay_to_kohya
    kh, kw, cin, cout, r = 3, 3, 4, 8, 2
    overlay = {'p.conv1': {
        'down': np.random.randn(kh * kw * cin, r).astype(np.float32),
        'up': np.random.randn(r, cout).astype(np.float32),
        'alpha': np.float32(2.0)}}
    tp = {'p.conv1': 'down_blocks.0.resnets.0.conv1'}
    sd = overlay_to_kohya(overlay, tp, conv_shapes={'p.conv1': (kh, kw, cin, cout)})
    key = 'lora_unet_down_blocks_0_resnets_0_conv1'
    assert sd[f'{key}.lora_down.weight'].shape == (r, cin, kh, kw)
    back = kohya_to_overlay(sd, {v: k for k, v in tp.items()})
    np.testing.assert_allclose(back['p.conv1']['down'], overlay['p.conv1']['down'],
                               atol=1e-6)
    np.testing.assert_allclose(back['p.conv1']['up'], overlay['p.conv1']['up'],
                               atol=1e-6)


def test_old_lora_state_loads():
    """Pre-0.9 key layout (layer.lora_down.weight / lora_up.weight /
    lora_up.bias) loads identically to the current one — reference
    tools/convert_old_lora.py:4-13 is a pure key rename."""
    down_t = np.random.randn(4, 8).astype(np.float32)   # [r, in]
    up_t = np.random.randn(16, 4).astype(np.float32)    # [out, r]
    bias = np.random.randn(16).astype(np.float32)
    old = {'unet.to_q.___.layer.lora_down.weight': down_t,
           'unet.to_q.___.layer.lora_up.weight': up_t,
           'unet.to_q.___.layer.lora_up.bias': bias,
           'unet.to_q.___.alpha': np.float32(2.0)}
    new = {'unet.to_q.___.layer.W_down': down_t,
           'unet.to_q.___.layer.W_up': up_t,
           'unet.to_q.___.layer.bias': bias,
           'unet.to_q.___.alpha': np.float32(2.0)}
    _tree_eq(lora_state_to_overlay(old), lora_state_to_overlay(new))
    e = lora_state_to_overlay(old)['unet.to_q']
    assert e['down'].shape == (8, 4) and e['up'].shape == (4, 16)
    np.testing.assert_array_equal(e['bias'], bias)


def test_convert_old_lora_tool(tmp_path):
    from hcpdiff_tpu.tools.convert_old_lora import convert_state
    flat = {'lora:h.___.layer.lora_down.weight': np.zeros((4, 8), np.float32),
            'lora:h.___.layer.lora_up.weight': np.zeros((16, 4), np.float32),
            'lora:h.___.layer.lora_up.bias': np.zeros(16, np.float32),
            'lora:h.___.alpha': np.float32(1.0),
            'base:w.kernel': np.ones((2, 2), np.float32)}
    out = convert_state(flat)
    assert set(out) == {'lora:h.___.layer.W_down', 'lora:h.___.layer.W_up',
                        'lora:h.___.layer.bias', 'lora:h.___.alpha',
                        'base:w.kernel'}
    # CLI round-trip through safetensors
    src, dst = str(tmp_path / 'old.safetensors'), str(tmp_path / 'new.safetensors')
    auto_manager(src)._write(flat, src)
    import subprocess, sys
    subprocess.run([sys.executable, '-m', 'hcpdiff_tpu.tools.convert_old_lora',
                    src, dst], check=True)
    re_read = auto_manager(dst)._read(dst)
    assert 'lora:h.___.layer.W_down' in re_read


def test_lora_bias_merge():
    """An overlay entry with a bias folds into the host bias with the same
    alpha/rank/scale factor as the kernel delta."""
    from hcpdiff_tpu.adapt.overlay import merge_overlays
    params = {'lin': {'kernel': jnp.ones((8, 16)), 'bias': jnp.zeros((16,))}}
    entry = {'down': jnp.zeros((8, 4)), 'up': jnp.zeros((4, 16)),
             'alpha': jnp.float32(2.0), 'bias': jnp.ones((16,))}
    merged = merge_overlays(params, [{'lin': entry}], [{'lin': 3.0}])
    np.testing.assert_allclose(np.asarray(merged['lin']['bias']),
                               np.full(16, 3.0 * 2.0 / 4), atol=1e-6)
    # host without bias -> explicit error, not silent drop
    with pytest.raises(ValueError):
        merge_overlays({'lin': {'kernel': jnp.ones((8, 16))}},
                       [{'lin': entry}], [{'lin': 1.0}])
