"""SDXL dual text encoder composition (reference hcpdiff/models/compose/*:
ComposeTextEncoder concat of clip_L + clip_bigG hidden states,
ComposeTokenizer, SDXLTextEncoder/SDXLTokenizer, per-encoder embedding
splits via ParameterGroup).

TPU design: both encoders run in one jit; hidden states concat on the
feature axis (768 + 1280 = 2048 = SDXL cross_attention_dim); pooled output
comes from TE2's projected EOS embedding. Prompt-tuning embeddings carry a
separate extension table per encoder (``emb_ext`` dict).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..clip import CLIPTextModel
from ..text_frontend import TextEncoderFrontend
from ...utils.clip_tokenizer import CLIPTokenizer


class SDXLTokenizer:
    """Two tokenizers driven with the same text (reference ComposeTokenizer
    concat semantics: same prompt, two vocabularies — in practice both are
    CLIP BPE with the same vocab, so we reuse one and mirror ids)."""

    def __init__(self, tokenizer_l: CLIPTokenizer,
                 tokenizer_g: Optional[CLIPTokenizer] = None):
        self.tokenizer_l = tokenizer_l
        self.tokenizer_g = tokenizer_g or tokenizer_l

    def __getattr__(self, name):
        return getattr(self.tokenizer_l, name)


class SDXLTextEncoderFrontend:
    """Encode once per sub-encoder; concat features; pooled from TE2."""

    def __init__(self, tokenizer: SDXLTokenizer | CLIPTokenizer,
                 te1: CLIPTextModel, te1_params: Any,
                 te2: CLIPTextModel, te2_params: Any,
                 n_repeats: int = 1, clip_skip: int = 1,
                 clip_final_norm: bool = False):
        tk = tokenizer if isinstance(tokenizer, SDXLTokenizer) else SDXLTokenizer(tokenizer)
        self.tokenizer = tk
        # SDXL convention: clip_skip=1 (penultimate), no final norm
        self.fe1 = TextEncoderFrontend(tk.tokenizer_l, te1, te1_params,
                                       n_repeats, clip_skip, clip_final_norm)
        self.fe2 = TextEncoderFrontend(tk.tokenizer_g, te2, te2_params,
                                       n_repeats, clip_skip, clip_final_norm)
        self.n_repeats = n_repeats

    def tokenize_batch(self, texts: Sequence[str]):
        return self.fe1.tokenize_batch(texts)

    def encode_ids_dual(self, te1_params: Any, te2_params: Any,
                        input_ids: jnp.ndarray,
                        token_mult: Optional[jnp.ndarray] = None,
                        emb_ext: Optional[Dict[str, jnp.ndarray]] = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """jit-safe dual encode with explicit params (training path:
        trainer/step.py te_encode; the reference trains through
        SDXLTEUnetWrapper, hcpdiff/models/wrapper.py:57-96)."""
        ext = emb_ext or {}
        h1, _ = self.fe1.encode_ids(te1_params, input_ids, token_mult,
                                    emb_ext=ext.get('clip_L'))
        h2, pooled = self.fe2.encode_ids(te2_params, input_ids, token_mult,
                                         emb_ext=ext.get('clip_bigG'))
        return jnp.concatenate([h1, h2], axis=-1), pooled

    def encode(self, texts: Sequence[str],
               emb_ext: Optional[Dict[str, jnp.ndarray]] = None,
               use_attn_mult: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        emb_ext = emb_ext or {}
        ids, mult = self.fe1.tokenize_batch(texts)
        m = jnp.asarray(mult) if use_attn_mult else None
        h1, _ = self.fe1.encode_ids(self.fe1.params, jnp.asarray(ids), m,
                                    emb_ext=emb_ext.get('clip_L'))
        h2, pooled = self.fe2.encode_ids(self.fe2.params, jnp.asarray(ids), m,
                                         emb_ext=emb_ext.get('clip_bigG'))
        hidden = jnp.concatenate([h1, h2], axis=-1)
        return hidden, pooled


def split_sdxl_embedding(vectors: np.ndarray, dim_l: int = 768
                         ) -> Dict[str, np.ndarray]:
    """Split a concatenated SDXL embedding [n, 768+1280] into per-encoder
    tables (reference tools/embedding_convert.py semantics)."""
    return {'clip_L': vectors[:, :dim_l], 'clip_bigG': vectors[:, dim_l:]}


def concat_sdxl_embedding(parts: Dict[str, np.ndarray]) -> np.ndarray:
    return np.concatenate([parts['clip_L'], parts['clip_bigG']], axis=-1)


def make_sdxl_time_ids(original_size=(1024, 1024), crop_coord=(0, 0),
                       target_size=(1024, 1024)) -> np.ndarray:
    """[h_orig, w_orig, h_crop, w_crop, h_tgt, w_tgt] conditioning vector
    (reference hcpdiff/models/wrapper.py:57-96 crop_info)."""
    return np.asarray([original_size[1], original_size[0],
                       crop_coord[1], crop_coord[0],
                       target_size[1], target_size[0]], np.float32)
