"""Per-image .txt captions -> one captions.json
(reference tools/convert_caption_txt2json.py).

usage: python -m hcpdiff_tpu.tools.convert_caption_txt2json --data_root imgs/
"""
from __future__ import annotations

import argparse
import glob
import json
import os


def convert(data_root: str, out_file: str = None) -> str:
    caps = {}
    for p in sorted(glob.glob(os.path.join(data_root, '*.txt'))):
        stem = os.path.splitext(os.path.basename(p))[0]
        with open(p, encoding='utf-8') as f:
            caps[stem] = f.read().strip()
    out_file = out_file or os.path.join(data_root, 'image_captions.json')
    with open(out_file, 'w', encoding='utf-8') as f:
        json.dump(caps, f, ensure_ascii=False, indent=2)
    return out_file


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data_root', required=True)
    p.add_argument('--out_file', default=None)
    a = p.parse_args()
    print(convert(a.data_root, a.out_file))


if __name__ == '__main__':
    main()
