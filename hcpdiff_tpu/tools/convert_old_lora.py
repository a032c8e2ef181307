"""Convert a pre-0.9 HCP LoRA checkpoint to the current key layout
(reference hcpdiff/tools/convert_old_lora.py:4-13 ``convert_state``):

  <host>.___.layer.lora_down.weight -> <host>.___.layer.W_down
  <host>.___.layer.lora_up.weight   -> <host>.___.layer.W_up
  <host>.___.layer.lora_up.bias     -> <host>.___.layer.bias
  <host>.___.alpha                  -> unchanged

Tensor layouts are identical between the two formats, so this is a pure
key rename (any ``lora:``-style section prefixes are preserved). Note the
loader (`ckpt.formats.lora_state_to_overlay`) also accepts old keys
directly; this tool exists for writing back interchange files.

usage:
  python -m hcpdiff_tpu.tools.convert_old_lora old_lora.safetensors new_lora.safetensors
"""
from __future__ import annotations

import argparse
from typing import Any, Dict

from ..ckpt.manager import auto_manager

_RENAMES = (
    ('layer.lora_down.weight', 'layer.W_down'),
    ('layer.lora_up.weight', 'layer.W_up'),
    ('layer.lora_up.bias', 'layer.bias'),
)


def convert_state(state: Dict[str, Any]) -> Dict[str, Any]:
    """Rename old-format key suffixes in a flat state dict."""
    out = {}
    for k, v in state.items():
        for old, new in _RENAMES:
            if k.endswith(old):
                k = k[: -len(old)] + new
                break
        out[k] = v
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('src', help='old-format LoRA checkpoint')
    ap.add_argument('dst', help='output path (format from extension)')
    args = ap.parse_args()
    flat = auto_manager(args.src)._read(args.src)
    auto_manager(args.dst)._write(convert_state(flat), args.dst)
    print(f'converted {args.src} -> {args.dst}')


if __name__ == '__main__':
    main()
