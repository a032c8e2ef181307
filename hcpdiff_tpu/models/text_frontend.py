"""Prompt parsing + text encoding front-end.

Covers the reference's TokenizerHook + TEEXHook surface:
- ``parse_attn_mult``: ``{text}`` / ``{text:1.5}`` nested attention-weight
  syntax -> (clean_text, per-word multipliers)
  (reference hcpdiff/models/tokenizer_ex.py:14-77)
- ``TextEncoderFrontend.encode``: tokenize with N_repeats window packing,
  run CLIP per window under one jit (windows folded into batch), re-join
  window hidden states with a single BOS/EOS, clip_skip selection
  (reference hcpdiff/models/textencoder_ex.py:34-97)
- token-level multiplier expansion from word-level weights.
"""
from __future__ import annotations

import dataclasses
import re
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.clip_tokenizer import CLIPTokenizer
from .clip import CLIPTextModel

DEFAULT_EMPHASIS = 1.1


def parse_attn_mult(text: str, emphasis: float = DEFAULT_EMPHASIS
                    ) -> Tuple[str, List[Tuple[str, float]]]:
    """Parse nested ``{...}`` emphasis syntax.

    Returns (clean_text, segments) where segments is a list of
    (text_fragment, multiplier). ``{a {b:1.5}}`` gives a→1.1, b→1.5·1.1.
    """
    segments: List[Tuple[str, float]] = []
    stack: List[float] = [1.0]
    buf = ''
    i = 0
    n = len(text)

    def flush():
        nonlocal buf
        if buf:
            segments.append((buf, stack[-1]))
            buf = ''

    while i < n:
        ch = text[i]
        if ch == '{':
            flush()
            stack.append(stack[-1] * emphasis)
            i += 1
        elif ch == ':' and len(stack) > 1:
            # explicit weight: read number until '}'
            j = i + 1
            while j < n and text[j] not in '}':
                j += 1
            try:
                w = float(text[i + 1:j].strip())
                flush_weight = stack[-2] * w
                if buf:
                    segments.append((buf, flush_weight))
                    buf = ''
                i = j
                # replace implicit with explicit for this level
                stack[-1] = flush_weight
            except ValueError:
                buf += ch
                i += 1
        elif ch == '}':
            flush()
            if len(stack) > 1:
                stack.pop()
            i += 1
        else:
            buf += ch
            i += 1
    flush()
    clean = ''.join(s for s, _ in segments)
    return clean, segments


@dataclasses.dataclass
class EncodedPrompt:
    input_ids: np.ndarray        # [n_windows * L]
    token_mult: np.ndarray       # [n_windows * L]


class TextEncoderFrontend:
    """Tokenizer + CLIP text model + window merge + clip_skip."""

    def __init__(self, tokenizer: CLIPTokenizer, model: CLIPTextModel,
                 params: Any, n_repeats: int = 1, clip_skip: int = 0,
                 clip_final_norm: bool = True):
        self.tokenizer = tokenizer
        self.model = model
        self.params = params
        self.n_repeats = int(n_repeats)
        self.clip_skip = int(clip_skip)
        self.clip_final_norm = bool(clip_final_norm)

    # ---- tokenization (host-side, pure python) ----
    def tokenize(self, text: str) -> EncodedPrompt:
        clean, segments = parse_attn_mult(text)
        tk = self.tokenizer
        L = tk.model_max_length
        content = L - 2
        ids: List[int] = []
        mults: List[float] = []
        for frag, w in segments:
            frag_ids = tk.tokenize_words(frag)
            ids.extend(frag_ids)
            mults.extend([w] * len(frag_ids))
        total = content * self.n_repeats
        ids, mults = ids[:total], mults[:total]
        win_ids: List[int] = []
        win_mult: List[float] = []
        for w in range(self.n_repeats):
            chunk = ids[w * content:(w + 1) * content]
            m = mults[w * content:(w + 1) * content]
            pad = L - 2 - len(chunk)
            win_ids.extend([tk.bos_token_id] + chunk + [tk.eos_token_id]
                           + [tk.pad_token_id] * pad)
            win_mult.extend([1.0] + m + [1.0] * (pad + 1))
        return EncodedPrompt(np.asarray(win_ids, np.int32),
                             np.asarray(win_mult, np.float32))

    def tokenize_batch(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        enc = [self.tokenize(t) for t in texts]
        return (np.stack([e.input_ids for e in enc]),
                np.stack([e.token_mult for e in enc]))

    def attention_mask(self, input_ids: np.ndarray) -> np.ndarray:
        """[B, R*L] ids -> [B, R*(L-2)+2] mask over the MERGED sequence:
        1 up to (and including) each window's first EOS, 0 for padding
        (reference pad_attn_bias, hcpdiff/utils/utils.py:154-162)."""
        tk = self.tokenizer
        L, R = tk.model_max_length, self.n_repeats
        B = input_ids.shape[0]
        ids = input_ids.reshape(B, R, L)
        eos_pos = np.argmax(ids == tk.eos_token_id, axis=-1)  # [B, R]
        pos = np.arange(L)[None, None, :]
        win_mask = (pos <= eos_pos[..., None]).astype(np.float32)
        if R == 1:
            return win_mask[:, 0]
        bos = win_mask[:, 0, :1]
        eos = win_mask[:, -1, L - 1:]
        content = win_mask[:, :, 1:L - 1].reshape(B, R * (L - 2))
        return np.concatenate([bos, content, eos], axis=1)

    # ---- encoding (jittable) ----
    def encode_ids(self, params: Any, input_ids: jnp.ndarray,
                   token_mult: Optional[jnp.ndarray] = None,
                   emb_ext: Optional[jnp.ndarray] = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[B, n_repeats*L] ids -> (hidden [B, n_repeats*(L-2)+2, D], pooled).

        Windows fold into the batch axis (one CLIP call, MXU-friendly),
        then hidden states re-join: first window's BOS + per-window content
        + last window's EOS (reference textencoder_ex.py:61-81).
        """
        B = input_ids.shape[0]
        L = self.tokenizer.model_max_length
        R = self.n_repeats
        ids = input_ids.reshape(B * R, L)
        mult = token_mult.reshape(B * R, L) if token_mult is not None else None
        last, pooled, hs = self.model.apply({'params': params}, ids,
                                            emb_ext=emb_ext,
                                            embedding_multiplier=mult)
        if self.clip_skip > 0:
            h = hs[-(self.clip_skip + 1)]
            if self.clip_final_norm:
                h = self.model.apply_final_norm({'params': params}, h)
        else:
            h = last
        D = h.shape[-1]
        h = h.reshape(B, R, L, D)
        if R == 1:
            merged = h[:, 0]
        else:
            bos = h[:, 0, :1]
            eos = h[:, -1, L - 1:]
            content = h[:, :, 1:L - 1].reshape(B, R * (L - 2), D)
            merged = jnp.concatenate([bos, content, eos], axis=1)
        pooled = pooled.reshape(B, R, -1)[:, 0]
        return merged, pooled

    def encode(self, texts: Sequence[str], emb_ext: Optional[jnp.ndarray] = None,
               use_attn_mult: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ids, mult = self.tokenize_batch(texts)
        return self.encode_ids(self.params, jnp.asarray(ids),
                               jnp.asarray(mult) if use_attn_mult else None,
                               emb_ext=emb_ext)
