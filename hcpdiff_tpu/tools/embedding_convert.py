"""Embedding format converter (reference tools/embedding_convert.py):
webui <-> hcp, incl. SDXL concat/split across the two encoders.

usage:
  python -m hcpdiff_tpu.tools.embedding_convert --from_webui --path e.pt --dump_path out.pt [--sdxl]
  python -m hcpdiff_tpu.tools.embedding_convert --to_webui --path e.pt --dump_path out.pt [--sdxl]
"""
from __future__ import annotations

import argparse

import numpy as np

from ..ckpt.formats import load_webui_embedding, save_webui_embedding


def convert(path: str, dump_path: str, sdxl: bool = False,
            to_webui: bool = False) -> None:
    import torch
    obj = torch.load(path, map_location='cpu', weights_only=False)
    if sdxl and isinstance(obj, dict) and ('clip_l' in obj or 'clip_g' in obj):
        # webui SDXL format: separate clip_l/clip_g tensors -> concat
        l = obj['clip_l'].float().numpy()
        g = obj['clip_g'].float().numpy()
        vec = np.concatenate([l, g], axis=-1)
        name = path.rsplit('/', 1)[-1].rsplit('.', 1)[0]
        save_webui_embedding(dump_path, vec, name)
        return
    name, vec = load_webui_embedding(path)
    if sdxl and to_webui:
        torch.save({'clip_l': torch.tensor(vec[:, :768]),
                    'clip_g': torch.tensor(vec[:, 768:])}, dump_path)
        return
    save_webui_embedding(dump_path, vec, name)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--from_webui', action='store_true')
    p.add_argument('--to_webui', action='store_true')
    p.add_argument('--path', required=True)
    p.add_argument('--dump_path', required=True)
    p.add_argument('--sdxl', action='store_true')
    a = p.parse_args()
    convert(a.path, a.dump_path, a.sdxl, a.to_webui)


if __name__ == '__main__':
    main()
