"""Create prompt-tuning embeddings (reference tools/create_embedding.py:13-109
PTCreator).

- init from text: encode init words through the token embedding table and
  average/tile to n_word vectors
- ``*[sigma,len]`` random slots: append ``len`` random vectors with std sigma

usage:
  python -m hcpdiff_tpu.tools.create_embedding <pretrained_or_tiny> <name> <n_word> \
      [--init_text 'a photo of cat'] [--root embs/] [--replace]
"""
from __future__ import annotations

import argparse
import os
import re
from typing import Optional

import numpy as np

from ..ckpt.formats import save_webui_embedding
from ..models.factory import build_models

RANDOM_SLOT = re.compile(r'\*\[([0-9.]+),\s*(\d+)\]')


class PTCreator:
    def __init__(self, pretrained: str = 'tiny', root: str = 'embs/'):
        world = build_models(pretrained)
        self.tokenizer = world['tokenizer']
        self.table = np.asarray(world['te_params']['token_embedding'])
        self.dim = self.table.shape[1]
        self.root = root

    def creat_word_pt(self, name: str, n_word: int,
                      init_text: Optional[str] = None, replace: bool = False,
                      seed: int = 42) -> str:
        path = os.path.join(self.root, f'{name}.pt')
        if os.path.exists(path) and not replace:
            raise FileExistsError(f'{path} exists (use replace=True)')
        rng = np.random.default_rng(seed)
        vectors = []
        if init_text:
            rest = init_text
            for m in RANDOM_SLOT.finditer(init_text):
                sigma, n = float(m.group(1)), int(m.group(2))
                vectors.append(rng.normal(0, sigma, size=(n, self.dim)))
            rest = RANDOM_SLOT.sub(' ', init_text).strip()
            if rest:
                ids = [i for i in self.tokenizer.tokenize_words(rest)
                       if i < self.table.shape[0]]
                if ids:
                    vectors.append(self.table[ids])
        if vectors:
            init = np.concatenate(vectors, axis=0)
        else:
            init = rng.normal(0, 0.017, size=(n_word, self.dim))
        # tile/trim to n_word
        if init.shape[0] < n_word:
            reps = int(np.ceil(n_word / init.shape[0]))
            init = np.tile(init, (reps, 1))
        init = init[:n_word].astype(np.float32)
        os.makedirs(self.root, exist_ok=True)
        save_webui_embedding(path, init, name, step=0)
        return path


def main():
    p = argparse.ArgumentParser()
    p.add_argument('pretrained')
    p.add_argument('name')
    p.add_argument('n_word', type=int)
    p.add_argument('--init_text', default=None)
    p.add_argument('--root', default='embs/')
    p.add_argument('--replace', action='store_true')
    a = p.parse_args()
    path = PTCreator(a.pretrained, a.root).creat_word_pt(
        a.name, a.n_word, a.init_text, a.replace)
    print(f'created {path}')


if __name__ == '__main__':
    main()
