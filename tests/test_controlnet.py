import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hcpdiff_tpu.models.controlnet import ControlNet, init_from_unet
from hcpdiff_tpu.models.unet import UNetConfig, UNet2DCondition


@pytest.fixture(scope='module')
def setup():
    cfg = UNetConfig.tiny()
    unet = UNet2DCondition(cfg, dtype=jnp.float32)
    cn = ControlNet(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.array([5])
    ctx = jnp.zeros((1, 77, cfg.cross_attention_dim))
    cond = jnp.zeros((1, 64, 64, 3))  # cond image at 8x latent res
    unet_params = unet.init(jax.random.PRNGKey(0), x, t, ctx)['params']
    cn_params = cn.init(jax.random.PRNGKey(1), x, t, ctx, cond)['params']
    return cfg, unet, cn, unet_params, cn_params


def test_zero_init_is_identity(setup):
    """Fresh ControlNet must not change the UNet output (zero heads)."""
    cfg, unet, cn, unet_params, cn_params = setup
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 77, cfg.cross_attention_dim))
    t = jnp.array([10])
    cond = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 64, 3))

    down_res, mid_res = cn.apply({'params': cn_params}, x, t, ctx, cond)
    base = unet.apply({'params': unet_params}, x, t, ctx)
    tapped = unet.apply({'params': unet_params}, x, t, ctx,
                        down_residuals=down_res, mid_residual=mid_res)
    for r in down_res + [mid_res]:
        assert float(jnp.abs(r).max()) == 0.0
    np.testing.assert_allclose(np.asarray(base), np.asarray(tapped), atol=1e-6)


def test_residual_shapes_match_skips(setup):
    cfg, unet, cn, unet_params, cn_params = setup
    x = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 77, cfg.cross_attention_dim))
    cond = jnp.zeros((1, 64, 64, 3))
    down_res, mid_res = cn.apply({'params': cn_params}, x, jnp.array([1]), ctx, cond)
    # skips: conv_in + per-layer + downsamples = 1 + 2*1 + 1 = 4 for tiny cfg
    assert len(down_res) == 1 + len(cfg.block_out_channels) * cfg.layers_per_block \
        + (len(cfg.block_out_channels) - 1)
    assert mid_res.shape[-1] == cfg.block_out_channels[-1]


def test_trained_head_changes_output(setup):
    cfg, unet, cn, unet_params, cn_params = setup
    import jax.tree_util as jtu
    # nudge the mid zero-conv away from zero
    cn_params2 = jax.device_get(cn_params)
    cn_params2['zero_mid']['kernel'] = np.ones_like(
        np.asarray(cn_params2['zero_mid']['kernel'])) * 0.1
    # cond-embedding head is also zero-init; open it so the cond image flows
    cn_params2['cond_embedding']['conv_out']['kernel'] = np.full_like(
        np.asarray(cn_params2['cond_embedding']['conv_out']['kernel']), 0.1)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 77, cfg.cross_attention_dim))
    cond = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 64, 3))
    t = jnp.array([10])
    down_res, mid_res = cn.apply({'params': cn_params2}, x, t, ctx, cond)
    base = unet.apply({'params': unet_params}, x, t, ctx)
    tapped = unet.apply({'params': unet_params}, x, t, ctx,
                        down_residuals=down_res, mid_residual=mid_res)
    assert not np.allclose(np.asarray(base), np.asarray(tapped), atol=1e-6)
    # cond image matters
    down2, mid2 = cn.apply({'params': cn_params2}, x, t, ctx, cond * 0)
    assert not np.allclose(np.asarray(mid_res), np.asarray(mid2), atol=1e-7)


def test_init_from_unet_copies_shared(setup):
    cfg, unet, cn, unet_params, cn_params = setup
    merged = init_from_unet(jax.device_get(cn_params), jax.device_get(unet_params))
    np.testing.assert_array_equal(
        np.asarray(merged['down_0_res_0']['conv1']['kernel']),
        np.asarray(unet_params['down_0_res_0']['conv1']['kernel']))
    # zero convs untouched
    assert float(np.abs(np.asarray(merged['zero_mid']['kernel'])).max()) == 0.0


# ------------------------------------------------- inference (round 2) ----

def test_controlnet_inference_e2e(tmp_path):
    """Plugin ckpt -> merge recipe 'plugin:' -> cond image via ex_input ->
    residual taps visibly change the output (closes VERDICT.md missing
    item 3; reference cfg_net_tools.py:294-315 + visualizer.py:180-183)."""
    import math
    import os
    import numpy as np
    from PIL import Image
    import jax
    import jax.numpy as jnp

    from hcpdiff_tpu.config import containerize
    from hcpdiff_tpu.ckpt.manager import CkptManagerSafe
    from hcpdiff_tpu.infer.visualizer import Visualizer
    from hcpdiff_tpu.models.controlnet import ControlNet
    from hcpdiff_tpu.models.factory import build_models

    world = build_models('tiny', dtype=jnp.float32)
    lat = 2 ** (len(world['vae_cfg'].block_out_channels) - 1)
    cn = ControlNet(world['unet_cfg'], dtype=jnp.float32,
                    cond_stages=int(math.log2(lat)))
    cn_params = cn.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 8, 4)), jnp.array([0]),
                        jnp.zeros((1, 77, world['unet_cfg'].cross_attention_dim)),
                        jnp.zeros((1, 8 * lat, 8 * lat, 3)))['params']
    # make the zero heads non-zero so the plugin visibly changes the output
    cn_params = jax.tree_util.tree_map(
        lambda x: x + 0.05 * jnp.ones_like(x), cn_params)
    ck = str(tmp_path / 'plugin.safetensors')
    CkptManagerSafe().save_plugins(ck, {'controlnet1': jax.device_get(cn_params)})

    cond_path = str(tmp_path / 'cond.png')
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(cond_path)

    base = {
        'pretrained_model': 'tiny', 'dtype': 'fp32',
        'prompt': 'a photo of cat', 'neg_prompt': '', 'seed': 5, 'bs': 1,
        'output_dir': str(tmp_path / 'o1'),
        'infer_args': {'width': 32, 'height': 32, 'inference_steps': 2,
                       'sampler': 'ddim'},
        'interface': [],
    }
    v_plain = Visualizer(containerize(dict(base)))
    img_plain = v_plain.vis_images('a photo of cat')

    cfg = dict(base)
    cfg['ex_input'] = {'cond': {
        '_target_': 'hcpdiff.data.data_processor.ControlNetProcessor',
        'image': cond_path}}
    cfg['merge'] = {'group1': {'type': 'unet', 'plugin': {
        'controlnet1': {'path': ck, 'alpha': 1.0, 'layers': 'all'}}}}
    v = Visualizer(containerize(cfg))
    assert 'controlnet1' in v.plugins
    img_cn = v.vis_images('a photo of cat')
    assert np.isfinite(img_cn).all()
    assert not np.allclose(img_plain, img_cn, atol=1e-4)

    # plugin scale 0 must reproduce the no-plugin output exactly
    cfg0 = dict(cfg)
    cfg0['merge'] = {'group1': {'type': 'unet', 'plugin': {
        'controlnet1': {'path': ck, 'alpha': 0.0, 'layers': 'all'}}}}
    v0 = Visualizer(containerize(cfg0))
    img_zero = v0.vis_images('a photo of cat')
    np.testing.assert_allclose(np.asarray(img_zero), np.asarray(img_plain),
                               atol=1e-5)


def test_workflow_load_plugin_actions(tmp_path):
    """LoadPlugin/RemovePlugin workflow actions (reference workflow/io.py)."""
    import math
    import numpy as np
    import jax
    import jax.numpy as jnp
    from hcpdiff_tpu.ckpt.manager import CkptManagerSafe
    from hcpdiff_tpu.models.controlnet import ControlNet
    from hcpdiff_tpu.models.factory import build_models
    from hcpdiff_tpu.workflow import (LoadModelsAction, LoadPluginAction,
                                      RemovePluginAction)

    world = build_models('tiny', dtype=jnp.float32)
    lat = 2 ** (len(world['vae_cfg'].block_out_channels) - 1)
    cn = ControlNet(world['unet_cfg'], dtype=jnp.float32,
                    cond_stages=int(math.log2(lat)))
    cn_params = cn.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 8, 4)), jnp.array([0]),
                        jnp.zeros((1, 77, world['unet_cfg'].cross_attention_dim)),
                        jnp.zeros((1, 8 * lat, 8 * lat, 3)))['params']
    cn_params = jax.tree_util.tree_map(
        lambda x: x + 0.05 * jnp.ones_like(x), cn_params)
    ck = str(tmp_path / 'plugin.safetensors')
    CkptManagerSafe().save_plugins(ck, {'controlnet1': jax.device_get(cn_params)})

    memory = {}
    LoadModelsAction(pretrained_model='tiny', dtype='fp32')(memory=memory)
    base_apply = memory['unet_apply']
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.array([10])
    ctx = jnp.zeros((1, 77, world['unet_cfg'].cross_attention_dim))
    cond = jnp.ones((1, 8 * lat, 8 * lat, 3)) * 0.5
    out_base = base_apply(memory['unet_params'], x, t, ctx)

    LoadPluginAction(path=ck, name='controlnet1')(memory=memory)
    out_plugin = memory['unet_apply'](memory['unet_params'], x, t, ctx,
                                      cond=cond)
    assert not np.allclose(np.asarray(out_base), np.asarray(out_plugin))
    # without cond the plugin is inert
    out_nocond = memory['unet_apply'](memory['unet_params'], x, t, ctx)
    np.testing.assert_allclose(np.asarray(out_base), np.asarray(out_nocond))

    RemovePluginAction(name='controlnet1')(memory=memory)
    out_removed = memory['unet_apply'](memory['unet_params'], x, t, ctx,
                                       cond=cond)
    np.testing.assert_allclose(np.asarray(out_base), np.asarray(out_removed))


def test_controlnet_workflow_graph(tmp_path):
    """The shipped text2img_controlnet workflow graph runs end-to-end on
    tiny models (tiny plugin ckpt + cond image substituted via CLI-style
    overrides)."""
    import math
    import numpy as np
    from PIL import Image
    import jax
    import jax.numpy as jnp
    from hcpdiff_tpu.config import load
    from hcpdiff_tpu.ckpt.manager import CkptManagerSafe
    from hcpdiff_tpu.models.controlnet import ControlNet
    from hcpdiff_tpu.models.factory import build_models
    from hcpdiff_tpu.workflow import WorkflowRunner

    world = build_models('tiny', dtype=jnp.float32)
    lat = 2 ** (len(world['vae_cfg'].block_out_channels) - 1)
    cn = ControlNet(world['unet_cfg'], dtype=jnp.float32,
                    cond_stages=int(math.log2(lat)))
    cn_params = cn.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 8, 4)), jnp.array([0]),
                        jnp.zeros((1, 77, world['unet_cfg'].cross_attention_dim)),
                        jnp.zeros((1, 8 * lat, 8 * lat, 3)))['params']
    ck = str(tmp_path / 'plugin.safetensors')
    CkptManagerSafe().save_plugins(ck, {'controlnet1': jax.device_get(cn_params)})
    cond = str(tmp_path / 'cond.png')
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(cond)

    cfg = load('cfgs/workflow/text2img_controlnet.yaml', [
        f'memory.plugin_path={ck}', f'memory.cond_image={cond}',
        'prepare.0.pretrained_model=tiny', 'prepare.0.dtype=fp32',
        'actions.3.N_steps=2', 'actions.3.sampler=euler',
        'actions.4.width=32', 'actions.4.height=32',
        ("actions.5.prog=import hcpdiff_tpu.data.processor as _p; "
         "states['cond'] = _p.ControlNetProcessor(memory['cond_image'])"
         "(32, 32, 1)"),
        f'actions.8.save_root={tmp_path}/out/',
    ])
    runner = WorkflowRunner(cfg)
    runner.start()
    import os
    assert any(f.endswith('.png') for f in os.listdir(tmp_path / 'out'))


def test_build_plugin_and_input_feeder_actions(tmp_path):
    """BuildPluginAction creates a fresh zero-head ControlNet (inert by
    construction) and InputFeederAction routes a cond image into states
    (reference workflow/io.py BuildPluginAction + diffusion.py:19
    InputFeederAction)."""
    import numpy as np
    from PIL import Image
    import jax.numpy as jnp
    from hcpdiff_tpu.workflow import (BuildPluginAction, InputFeederAction,
                                      LoadModelsAction, RemovePluginAction)

    memory = {}
    LoadModelsAction(pretrained_model='tiny', dtype='fp32')(memory=memory)
    lat = 2 ** (len(memory['vae_cfg'].block_out_channels) - 1)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.array([10])
    ctx = jnp.zeros((1, 77, memory['unet_cfg'].cross_attention_dim))
    cond = jnp.ones((1, 8 * lat, 8 * lat, 3)) * 0.5
    out_base = memory['unet_apply'](memory['unet_params'], x, t, ctx)

    BuildPluginAction(name='cn')(memory=memory)
    assert 'cn' in memory['plugins']
    # zero-init heads -> fresh plugin leaves the output unchanged
    out_fresh = memory['unet_apply'](memory['unet_params'], x, t, ctx,
                                     cond=cond)
    np.testing.assert_allclose(np.asarray(out_base), np.asarray(out_fresh),
                               atol=1e-6)
    RemovePluginAction(name='cn')(memory=memory)

    img = str(tmp_path / 'cond.png')
    Image.fromarray((np.ones((16, 16, 3)) * 128).astype(np.uint8)).save(img)
    states = InputFeederAction({'cond': img, 'tag': 7}, width=8 * lat,
                               height=8 * lat)(memory=memory, bs=2)
    assert states['cond'].shape == (2, 8 * lat, 8 * lat, 3)
    assert states['tag'] == 7


def test_vae_optimize_sliced_decode():
    """VaeOptimizeAction(slicing) chunks the decode per sample with
    identical output (reference workflow/vae.py VaeOptimizeAction)."""
    import numpy as np
    import pytest
    import jax
    import jax.numpy as jnp
    from hcpdiff_tpu.workflow import (DecodeAction, LoadModelsAction,
                                      VaeOptimizeAction)

    memory = {}
    LoadModelsAction(pretrained_model='tiny', dtype='fp32')(memory=memory)
    lat = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 8, 4))
    plain = DecodeAction()(memory=memory, latents=lat)['images']
    VaeOptimizeAction(slicing=True)(memory=memory)
    sliced = DecodeAction()(memory=memory, latents=lat)['images']
    np.testing.assert_allclose(plain, sliced, atol=1e-5)
    with pytest.raises(NotImplementedError):
        VaeOptimizeAction(tiling=True)
