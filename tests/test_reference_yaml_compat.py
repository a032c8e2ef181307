"""A train config written in HCP-Diffusion's own style — torch targets,
diffusers module regexes, reference key names — runs unmodified
(SURVEY.md §7 hard part 3: the API-compat crux)."""
import os

import numpy as np
import pytest
from PIL import Image

REFERENCE_STYLE_YAML = """
exp_dir: {exp_dir}
mixed_precision: 'fp16'          # maps to bf16 on TPU
seed: 114514
ckpt_type: 'safetensors'

train:
  train_steps: 2
  gradient_accumulation_steps: 1
  max_grad_norm: 1.0
  save_step: 2
  cfg_scale: '1.0'

  loss:
    criterion:
      _target_: torch.nn.MSELoss      # reference target path
      _partial_: True
      reduction: 'none'
    type: 'eps'

  optimizer:
    _target_: torch.optim.AdamW       # reference target path
    _partial_: True
    weight_decay: 1e-3

  optimizer_pt:
    _target_: torch.optim.AdamW
    _partial_: True
    weight_decay: 5e-4

  scale_lr: False
  scheduler:
    name: 'constant_with_warmup'
    num_warmup_steps: 1
    num_training_steps: 2
  scheduler_pt: ${{.scheduler}}

model:
  pretrained_model_name_or_path: 'tiny'
  tokenizer_repeats: 1
  ema_unet: 0                      # legacy ema key
  gradient_checkpointing: False
  clip_skip: 0

lora_unet:
  - lr: 1e-4
    rank: 2
    layers:
      - 're:.*\\.attn.?$'            # reference diffusers-path regexes
      - 're:.*\\.ff$'

lora_text_encoder:
  - lr: 1e-5
    rank: 2
    layers:
      - 're:.*self_attn$'
      - 're:.*mlp$'

tokenizer_pt:
  emb_dir: null
  train: null

logger:
  - _target_: hcpdiff.loggers.CLILogger   # legacy module path
    _partial_: True
    log_step: 1

data:
  dataset1:
    _target_: hcpdiff.data.TextImagePairDataset   # legacy module path
    _partial_: True
    batch_size: 2
    cache_latents: True
    loss_weight: 1.0

    source:
      data_source1:
        _target_: hcpdiff.data.source.Text2ImageSource
        img_root: '{img_root}'
        prompt_template: null
        caption_file: null
        word_names: {{}}

    bucket:
      _target_: hcpdiff.data.bucket.FixedBucket
      target_size: 16
"""


def test_reference_style_yaml_trains(tmp_path):
    from hcpdiff_tpu.config import load
    from hcpdiff_tpu.trainer.trainer import Trainer

    img_root = tmp_path / 'imgs'
    img_root.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(img_root / f'i{i}.png')

    yml = tmp_path / 'ref_style.yaml'
    yml.write_text(REFERENCE_STYLE_YAML.format(
        exp_dir=str(tmp_path / 'exp'), img_root=str(img_root)))

    cfgs = load(str(yml), ['train.train_steps=2'])  # CLI override too
    t = Trainer(cfgs)
    assert len(t.pack['lora_unet']) >= 6   # attn + ff layers matched
    assert 'lora_te' in t.pack
    final = t.train()
    assert final == 2
    assert os.path.exists(os.path.join(str(tmp_path / 'exp'), 'ckpts',
                                       'unet-2.safetensors'))
