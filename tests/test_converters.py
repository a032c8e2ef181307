"""LDM/webui <-> diffusers converter round-trips on synthetic state dicts."""
import numpy as np

from hcpdiff_tpu.ckpt.ldm_convert import (unet_diffusers_to_ldm,
                                          unet_ldm_to_diffusers,
                                          unet_ldm_to_diffusers_map,
                                          vae_diffusers_to_ldm,
                                          vae_ldm_to_diffusers,
                                          te_ldm_to_diffusers)


def _synth_unet_diffusers():
    """Minimal synthetic diffusers UNet state dict hitting every map class."""
    rng = np.random.default_rng(0)
    sd = {}
    mods = ['conv_in', 'time_embedding.linear_1', 'time_embedding.linear_2',
            'conv_norm_out', 'conv_out',
            'down_blocks.0.resnets.0.norm1', 'down_blocks.0.resnets.0.conv1',
            'down_blocks.0.resnets.0.time_emb_proj',
            'down_blocks.0.resnets.0.conv_shortcut',
            'down_blocks.0.attentions.0.proj_in',
            'down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q',
            'down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj',
            'down_blocks.0.downsamplers.0.conv',
            'mid_block.resnets.0.conv1', 'mid_block.attentions.0.proj_out',
            'mid_block.resnets.1.norm2',
            'up_blocks.0.resnets.2.conv2', 'up_blocks.0.upsamplers.0.conv',
            'up_blocks.3.resnets.0.conv1',
            'up_blocks.3.attentions.1.transformer_blocks.0.attn2.to_k']
    for m in mods:
        sd[f'{m}.weight'] = rng.normal(size=(4, 4)).astype(np.float32)
        sd[f'{m}.bias'] = rng.normal(size=(4,)).astype(np.float32)
    return sd


def test_unet_ldm_roundtrip():
    sd = _synth_unet_diffusers()
    ldm = unet_diffusers_to_ldm(sd)
    assert all(k.startswith('model.diffusion_model.') for k in ldm)
    back = unet_ldm_to_diffusers(ldm)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k])


def test_unet_map_is_bijective():
    m = unet_ldm_to_diffusers_map()
    assert len(set(m.values())) == len(m)


def test_vae_ldm_roundtrip():
    rng = np.random.default_rng(1)
    sd = {}
    mods = ['encoder.conv_in', 'encoder.conv_norm_out', 'encoder.conv_out',
            'encoder.down_blocks.0.resnets.0.conv1',
            'encoder.down_blocks.0.downsamplers.0.conv',
            'encoder.mid_block.resnets.0.norm1',
            'decoder.up_blocks.0.resnets.1.conv2',
            'decoder.up_blocks.0.upsamplers.0.conv',
            'quant_conv', 'post_quant_conv']
    for m in mods:
        sd[f'{m}.weight'] = rng.normal(size=(4, 4)).astype(np.float32)
        sd[f'{m}.bias'] = rng.normal(size=(4,)).astype(np.float32)
    # attention projections (linear in diffusers)
    for p in ('group_norm', 'to_q', 'to_k', 'to_v', 'to_out.0'):
        sd[f'encoder.mid_block.attentions.0.{p}.weight'] = \
            rng.normal(size=(4, 4)).astype(np.float32)
        sd[f'encoder.mid_block.attentions.0.{p}.bias'] = \
            rng.normal(size=(4,)).astype(np.float32)
    ldm = vae_diffusers_to_ldm(sd)
    assert all(k.startswith('first_stage_model.') for k in ldm)
    back = vae_ldm_to_diffusers(ldm)
    for k in sd:
        if 'attentions' in k and 'group_norm' not in k and k.endswith('.weight'):
            np.testing.assert_array_equal(back[k], sd[k])
        else:
            assert k in back, k
            np.testing.assert_array_equal(back[k], sd[k])


def test_te_prefix_strip():
    sd = {'cond_stage_model.transformer.text_model.embeddings.token_embedding.weight':
          np.zeros((10, 4), np.float32)}
    out = te_ldm_to_diffusers(sd)
    assert 'text_model.embeddings.token_embedding.weight' in out


def test_decoder_up_reversal():
    """decoder.up.3 (ldm) == up_blocks.0 (diffusers)."""
    sd = {'decoder.up_blocks.0.resnets.0.conv1.weight':
          np.ones((2, 2), np.float32)}
    ldm = vae_diffusers_to_ldm(sd)
    assert 'first_stage_model.decoder.up.3.block.0.conv1.weight' in ldm


def test_webui_manager_loads_single_file(tmp_path):
    """CkptManagerWebui: synthetic LDM single-file -> diffusers parts."""
    from hcpdiff_tpu.ckpt.formats import save_safetensors
    from hcpdiff_tpu.ckpt.manager import CkptManagerWebui
    sd = _synth_unet_diffusers()
    ldm = unet_diffusers_to_ldm(sd)
    ldm['first_stage_model.encoder.conv_in.weight'] = \
        np.zeros((4, 4), np.float32)
    ldm['cond_stage_model.transformer.text_model.embeddings.token_embedding.weight'] = \
        np.zeros((10, 4), np.float32)
    p = str(tmp_path / 'model.safetensors')
    save_safetensors(ldm, p)
    parts = CkptManagerWebui.load_webui_parts(p)
    assert set(parts) == {'unet', 'vae', 'text_encoder'}
    assert set(parts['unet']) == set(sd)
    assert 'text_model.embeddings.token_embedding.weight' in parts['text_encoder']


def test_openclip_te_conversion_roundtrip():
    """SD2.x open_clip text tower -> transformers CLIPTextModel keys:
    combined in_proj splits into q/k/v; layer/embedding names map."""
    import numpy as np
    from hcpdiff_tpu.ckpt.ldm_convert import (is_sd2_checkpoint,
                                              te_openclip_to_diffusers)
    D = 8
    rng = np.random.default_rng(0)
    pre = 'cond_stage_model.model.'
    sd = {
        pre + 'token_embedding.weight': rng.normal(size=(10, D)),
        pre + 'positional_embedding': rng.normal(size=(77, D)),
        pre + 'ln_final.weight': np.ones(D), pre + 'ln_final.bias': np.zeros(D),
        pre + 'text_projection': rng.normal(size=(D, D)),
        pre + 'logit_scale': np.asarray(1.0),
    }
    for i in range(2):
        b = pre + f'transformer.resblocks.{i}.'
        sd.update({
            b + 'ln_1.weight': np.ones(D), b + 'ln_1.bias': np.zeros(D),
            b + 'ln_2.weight': np.ones(D), b + 'ln_2.bias': np.zeros(D),
            b + 'attn.in_proj_weight': rng.normal(size=(3 * D, D)),
            b + 'attn.in_proj_bias': rng.normal(size=(3 * D,)),
            b + 'attn.out_proj.weight': rng.normal(size=(D, D)),
            b + 'attn.out_proj.bias': rng.normal(size=(D,)),
            b + 'mlp.c_fc.weight': rng.normal(size=(4 * D, D)),
            b + 'mlp.c_fc.bias': rng.normal(size=(4 * D,)),
            b + 'mlp.c_proj.weight': rng.normal(size=(D, 4 * D)),
            b + 'mlp.c_proj.bias': rng.normal(size=(D,)),
        })
    assert is_sd2_checkpoint(sd)
    out = te_openclip_to_diffusers(sd)
    assert 'text_model.embeddings.token_embedding.weight' in out
    assert 'text_model.final_layer_norm.weight' in out
    w = sd[pre + 'transformer.resblocks.0.attn.in_proj_weight']
    np.testing.assert_array_equal(
        out['text_model.encoder.layers.0.self_attn.q_proj.weight'], w[:D])
    np.testing.assert_array_equal(
        out['text_model.encoder.layers.0.self_attn.v_proj.weight'], w[2 * D:])
    assert 'text_projection' not in out  # contrastive head dropped
    assert out['text_model.encoder.layers.1.mlp.fc1.weight'].shape == (4 * D, D)


def test_controlnet_ldm_roundtrip():
    """webui control_model.* ckpt -> our flax ControlNet params: shared
    submodules via the unet maps, zero convs + hint block positionally."""
    import math
    import numpy as np
    import jax
    import jax.numpy as jnp
    from hcpdiff_tpu.models.controlnet import ControlNet
    from hcpdiff_tpu.models.unet import UNetConfig
    from hcpdiff_tpu.ckpt.sd_convert import flax_to_torch, _unet_key_map
    from hcpdiff_tpu.ckpt.ldm_convert import (UNET_LDM_PREFIX,
                                              _convert_by_module_map,
                                              controlnet_ldm_to_ours,
                                              unet_ldm_to_diffusers_map)

    cfg = UNetConfig.tiny()
    cn = ControlNet(cfg, dtype=jnp.float32, cond_stages=3)
    params = cn.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                     jnp.array([0]), jnp.zeros((1, 77, 32)),
                     jnp.zeros((1, 64, 64, 3)))['params']
    params = jax.tree_util.tree_map(
        lambda x: np.random.default_rng(0).normal(size=x.shape).astype(np.float32),
        jax.device_get(params))

    # synthesize the webui layout from our params (inverse mapping)
    shared = {k: v for k, v in params.items()
              if not k.startswith(('zero_', 'cond_embedding'))}
    dif = flax_to_torch(shared, _unet_key_map(cfg))
    mod_map = unet_ldm_to_diffusers_map(
        len(cfg.block_out_channels), cfg.layers_per_block,
        tuple('CrossAttn' in t for t in cfg.down_block_types))
    ldm = _convert_by_module_map(dif, mod_map, UNET_LDM_PREFIX, reverse=True)
    sd = {'control_model.' + k[len(UNET_LDM_PREFIX):]: v for k, v in ldm.items()}
    zi = 0
    while f'zero_{zi}' in params:
        sd[f'control_model.zero_convs.{zi}.0.weight'] = \
            params[f'zero_{zi}']['kernel'].transpose(3, 2, 0, 1)
        sd[f'control_model.zero_convs.{zi}.0.bias'] = params[f'zero_{zi}']['bias']
        zi += 1
    sd['control_model.middle_block_out.0.weight'] = \
        params['zero_mid']['kernel'].transpose(3, 2, 0, 1)
    sd['control_model.middle_block_out.0.bias'] = params['zero_mid']['bias']
    ce = params['cond_embedding']
    names = ['conv_in'] + [f'blocks_{i}' for i in range(6)] + ['conv_out']
    for i, n in enumerate(names):
        sd[f'control_model.input_hint_block.{2 * i}.weight'] = \
            ce[n]['kernel'].transpose(3, 2, 0, 1)
        sd[f'control_model.input_hint_block.{2 * i}.bias'] = ce[n]['bias']

    out = controlnet_ldm_to_ours(sd, cfg)
    flat_in, _ = jax.tree_util.tree_flatten_with_path(params)
    missing = []
    for path, v in flat_in:
        node = out
        try:
            for part in path:
                node = node[part.key]
            np.testing.assert_allclose(node, v, atol=1e-6)
        except KeyError:
            missing.append(jax.tree_util.keystr(path))
    assert not missing, missing[:10]
