"""Bulk dataset generation from a prompt list (regularization images for
DreamBooth, reference tools/gen_from_ptlist.py:12).

Reads prompts from a parquet/csv/txt file and generates N images per prompt
through the Visualizer pipeline.

usage:
  python -m hcpdiff_tpu.tools.gen_from_ptlist --cfg cfgs/infer/text2img.yaml \
      --prompt_file prompts.txt --out_dir imgs_reg/ --num_per_prompt 2
"""
from __future__ import annotations

import argparse
import os


def load_prompts(path: str):
    if path.endswith('.parquet'):
        try:
            import pandas as pd
            df = pd.read_parquet(path)
            col = 'prompt' if 'prompt' in df.columns else df.columns[0]
            return list(df[col].astype(str))
        except ImportError:
            raise SystemExit('pandas unavailable; use .txt/.csv prompt files')
    if path.endswith('.csv'):
        import csv
        with open(path, newline='', encoding='utf-8') as f:
            return [row[0] for row in csv.reader(f) if row]
    with open(path, encoding='utf-8') as f:
        return [l.strip() for l in f if l.strip()]


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--cfg', required=True)
    p.add_argument('--prompt_file', required=True)
    p.add_argument('--out_dir', default='imgs_reg/')
    p.add_argument('--num_per_prompt', type=int, default=1)
    a, unknown = p.parse_known_args()

    from ..config import load
    from ..infer.visualizer import Visualizer
    from ..infer.interfaces import DiskInterface

    cfgs = load(a.cfg, unknown)
    viser = Visualizer(cfgs)
    viser.interfaces = [DiskInterface(a.out_dir)]
    prompts = load_prompts(a.prompt_file)
    for i, prompt in enumerate(prompts):
        for k in range(a.num_per_prompt):
            viser.vis_to_dir(prompt=prompt, num=1)
    print(f'generated {len(prompts) * a.num_per_prompt} images in {a.out_dir}')


if __name__ == '__main__':
    main()
