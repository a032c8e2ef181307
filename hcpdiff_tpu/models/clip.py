"""CLIP text encoder (SD1.5 CLIP-L / SD2.x OpenCLIP-H / SDXL bigG) in flax.

TPU-native rebuild of the reference's text stack:
- clip_skip + optional final_layer_norm   (hcpdiff/models/textencoder_ex.py:61-81)
- prompt-tuning embedding extension rows  (hcpdiff/models/text_emb_ex.py:21-93):
  instead of forward-hook splicing, extra embedding rows are passed as a
  separate ``emb_ext`` pytree; token ids >= vocab_size gather from it. The
  trigger-word -> id-range mapping happens at tokenization time (pure python).
- pooled output at the EOS position (SDXL TE2 text_projection).

Module names mirror transformers' CLIPTextModel so the safetensors converter
is a mechanical key map.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import attention
from .layers import ACT


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    hidden_act: str = 'quick_gelu'
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407
    bos_token_id: int = 49406
    projection_dim: Optional[int] = None   # set for SDXL TE2 pooled projection

    @classmethod
    def sd15(cls) -> 'CLIPTextConfig':
        return cls()

    @classmethod
    def sd2(cls) -> 'CLIPTextConfig':
        return cls(hidden_size=1024, intermediate_size=4096,
                   num_hidden_layers=23, num_attention_heads=16,
                   hidden_act='gelu')

    @classmethod
    def sdxl_big_g(cls) -> 'CLIPTextConfig':
        return cls(hidden_size=1280, intermediate_size=5120,
                   num_hidden_layers=32, num_attention_heads=20,
                   hidden_act='gelu', projection_dim=1280)

    @classmethod
    def tiny(cls, **kw) -> 'CLIPTextConfig':
        base = dict(vocab_size=1000, hidden_size=32, intermediate_size=64,
                    num_hidden_layers=2, num_attention_heads=4,
                    max_position_embeddings=77, eos_token_id=999, bos_token_id=998)
        base.update(kw)
        return cls(**base)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias: Optional[jnp.ndarray]) -> jnp.ndarray:
        c = self.cfg
        h, d = c.num_attention_heads, c.hidden_size // c.num_attention_heads
        B, S, _ = x.shape

        def split(y):
            return y.reshape(B, S, h, d).transpose(0, 2, 1, 3)

        q = split(nn.Dense(c.hidden_size, dtype=self.dtype, param_dtype=jnp.float32, name='q_proj')(x))
        k = split(nn.Dense(c.hidden_size, dtype=self.dtype, param_dtype=jnp.float32, name='k_proj')(x))
        v = split(nn.Dense(c.hidden_size, dtype=self.dtype, param_dtype=jnp.float32, name='v_proj')(x))
        o = attention(q, k, v, bias=bias, causal=True)
        o = o.transpose(0, 2, 1, 3).reshape(B, S, c.hidden_size)
        return nn.Dense(c.hidden_size, dtype=self.dtype, param_dtype=jnp.float32, name='out_proj')(o)


class CLIPLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias: Optional[jnp.ndarray]) -> jnp.ndarray:
        c = self.cfg
        r = x
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         param_dtype=jnp.float32, name='layer_norm1')(x)
        x = r + CLIPAttention(c, dtype=self.dtype, name='self_attn')(x, bias)
        r = x
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         param_dtype=jnp.float32, name='layer_norm2')(x)
        x = nn.Dense(c.intermediate_size, dtype=self.dtype, param_dtype=jnp.float32, name='fc1')(x)
        x = ACT[c.hidden_act](x)
        x = nn.Dense(c.hidden_size, dtype=self.dtype, param_dtype=jnp.float32, name='fc2')(x)
        return r + x


class CLIPTextModel(nn.Module):
    """Returns (last_hidden, pooled, all_hidden_states tuple).

    ``emb_ext``: optional [n_extra, hidden] extension rows for prompt-tuning
    tokens (ids in [vocab_size, vocab_size+n_extra)).
    ``embedding_multiplier``: optional [B, S] per-token scale (word attention
    weighting, reference hcpdiff/models/textencoder_ex.py:87-97).
    """
    cfg: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None,
                 emb_ext: Optional[jnp.ndarray] = None,
                 embedding_multiplier: Optional[jnp.ndarray] = None,
                 position_ids: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, Tuple[jnp.ndarray, ...]]:
        c = self.cfg
        B, S = input_ids.shape
        tok_table = self.param('token_embedding',
                               nn.initializers.normal(0.02),
                               (c.vocab_size, c.hidden_size), jnp.float32)
        pos_table = self.param('position_embedding',
                               nn.initializers.normal(0.02),
                               (c.max_position_embeddings, c.hidden_size),
                               jnp.float32)
        if emb_ext is not None and emb_ext.shape[0] > 0:
            base_ids = jnp.clip(input_ids, 0, c.vocab_size - 1)
            ext_ids = jnp.clip(input_ids - c.vocab_size, 0, emb_ext.shape[0] - 1)
            x = jnp.where((input_ids < c.vocab_size)[..., None],
                          jnp.take(tok_table, base_ids, axis=0),
                          jnp.take(emb_ext.astype(jnp.float32), ext_ids, axis=0))
        else:
            x = jnp.take(tok_table, jnp.clip(input_ids, 0, c.vocab_size - 1), axis=0)

        if embedding_multiplier is not None:
            # scale rows then renormalize to keep the sequence mean
            # (reference TEEXHook mult_attn semantics)
            mean_pre = jnp.mean(jnp.abs(x), axis=(1, 2), keepdims=True)
            x = x * embedding_multiplier[..., None].astype(x.dtype)
            mean_post = jnp.mean(jnp.abs(x), axis=(1, 2), keepdims=True)
            x = x * (mean_pre / jnp.maximum(mean_post, 1e-9))

        if position_ids is None:
            position_ids = jnp.arange(S)[None, :]
        x = x + jnp.take(pos_table, position_ids, axis=0)
        x = x.astype(self.dtype)

        bias = None
        if attention_mask is not None:
            neg = jnp.finfo(jnp.float32).min
            bias = jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, neg)

        hidden_states = [x]
        for i in range(c.num_hidden_layers):
            x = CLIPLayer(c, dtype=self.dtype, name=f'layers_{i}')(x, bias)
            hidden_states.append(x)

        last = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                            param_dtype=jnp.float32, name='final_layer_norm')(x)

        eos_pos = jnp.argmax((input_ids == c.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = jnp.take_along_axis(last, eos_pos[:, None, None].repeat(last.shape[-1], -1),
                                     axis=1)[:, 0]
        if c.projection_dim is not None:
            pooled = nn.Dense(c.projection_dim, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                           name='text_projection')(pooled)
        return last, pooled, tuple(hidden_states)

    def apply_final_norm(self, variables, x: jnp.ndarray) -> jnp.ndarray:
        """Apply only the final LayerNorm (for clip_skip + final-norm mode,
        reference hcpdiff/models/textencoder_ex.py:74-78)."""
        ln = variables['params']['final_layer_norm']
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        xf = (xf - mu) * jax.lax.rsqrt(var + self.cfg.layer_norm_eps)
        return (xf * ln['scale'] + ln['bias']).astype(x.dtype)
