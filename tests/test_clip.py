import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hcpdiff_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from hcpdiff_tpu.ckpt.clip_convert import clip_text_torch_to_params


@pytest.fixture(scope='module')
def torch_clip():
    import torch
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModel as HFModel
    torch.manual_seed(0)
    hf_cfg = HFCfg(vocab_size=1000, hidden_size=32, intermediate_size=64,
                   num_hidden_layers=2, num_attention_heads=4,
                   max_position_embeddings=77, hidden_act='quick_gelu',
                   bos_token_id=998, eos_token_id=999)
    model = HFModel(hf_cfg).eval()
    return model


def test_parity_vs_transformers(torch_clip):
    import torch
    cfg = CLIPTextConfig.tiny()
    params = clip_text_torch_to_params(torch_clip.state_dict(), cfg.num_hidden_layers)
    model = CLIPTextModel(cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 900, size=(2, 77))
    ids[:, 0] = cfg.bos_token_id
    ids[:, -1] = cfg.eos_token_id

    with torch.no_grad():
        out = torch_clip(torch.tensor(ids), output_hidden_states=True)
    last_t = out.last_hidden_state.numpy()
    pooled_t = out.pooler_output.numpy()

    last_j, pooled_j, hs = model.apply({'params': params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(last_j), last_t, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled_j), pooled_t, atol=2e-5)
    assert len(hs) == cfg.num_hidden_layers + 1

    # clip_skip=1: penultimate hidden state matches transformers hidden_states[-2]
    np.testing.assert_allclose(np.asarray(hs[-2]), out.hidden_states[-2].numpy(), atol=2e-5)


def test_embedding_extension(torch_clip):
    cfg = CLIPTextConfig.tiny()
    params = clip_text_torch_to_params(torch_clip.state_dict(), cfg.num_hidden_layers)
    model = CLIPTextModel(cfg)
    ids = np.full((1, 77), 5, dtype=np.int32)
    ids[0, 0] = cfg.bos_token_id
    ids[0, -1] = cfg.eos_token_id
    ids[0, 3] = cfg.vocab_size  # prompt-tuning token 0
    ext = jnp.asarray(np.random.default_rng(1).normal(size=(2, 32)), dtype=jnp.float32)
    out_ext, _, _ = model.apply({'params': params}, jnp.asarray(ids), emb_ext=ext)
    out_base, _, _ = model.apply({'params': params}, jnp.asarray(np.where(ids >= cfg.vocab_size, 5, ids)))
    assert not np.allclose(np.asarray(out_ext), np.asarray(out_base), atol=1e-4)


def test_attention_multiplier_changes_output(torch_clip):
    cfg = CLIPTextConfig.tiny()
    params = clip_text_torch_to_params(torch_clip.state_dict(), cfg.num_hidden_layers)
    model = CLIPTextModel(cfg)
    ids = np.full((1, 77), 7, dtype=np.int32)
    mult = np.ones((1, 77), np.float32)
    mult[0, 2:5] = 1.5
    a, _, _ = model.apply({'params': params}, jnp.asarray(ids))
    b, _, _ = model.apply({'params': params}, jnp.asarray(ids), embedding_multiplier=jnp.asarray(mult))
    assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)
