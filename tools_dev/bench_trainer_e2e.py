"""End-to-end Trainer throughput: the REAL config-driven `hcp-train` hot
loop (Trainer._train_loop — data iterator, shape-keyed accumulation
queues, device-resident loss buffering, preemption poll), not the bare
jitted step bench_train.py times. VERDICT r4 weak #4 / next #5: the gap
between the two is the Trainer's loop overhead, and nobody had measured
it.

Setup mirrors bench_train.py's raw-step workload so the numbers are
directly comparable: full SD1.5 UNet (random weights), 512px cached
latents, batch 8, LoRA rank 8 over attn qkv/out + ff, Min-SNR loss,
AdamW + clip, bf16 + remat.

Timing rides the loop's own log boundaries: `loggers.log(...)` fires
right after the buffered device losses are fetched (a device sync), so
window deltas measure completed steps. The first window (contains the
jit compile) is discarded.

Prints ONE JSON line like bench.py; records the BASELINE.md "Trainer
e2e" row. Done-criterion: within ~5% of bench_train.py's raw-step
samples/s.
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
    import numpy as np
    from PIL import Image

    tiny = os.environ.get('BENCH_TINY', '0') == '1'  # CPU smoke of the rig
    B = int(os.environ.get('BENCH_BATCH', '2' if tiny else '8'))
    size = int(os.environ.get('BENCH_SIZE', '32' if tiny else '512'))
    steps = int(os.environ.get('BENCH_STEPS', '60'))
    log_step = int(os.environ.get('BENCH_LOG_STEP', '10'))

    root = tempfile.mkdtemp(prefix='bench_trainer_')
    imgs = os.path.join(root, 'imgs')
    os.makedirs(imgs)
    rng = np.random.default_rng(0)
    caps = {}
    for i in range(2 * B):
        arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(imgs, f'img_{i}.png'))
        caps[f'img_{i}'] = f'a photo of cat {i}'
    with open(os.path.join(imgs, 'captions.json'), 'w') as f:
        json.dump(caps, f)

    from hcpdiff_tpu.config import containerize
    from hcpdiff_tpu.trainer.trainer import Trainer

    cfg = containerize({
        'exp_dir': os.path.join(root, 'exp'),
        'mixed_precision': 'bf16',
        'seed': 1,
        'ckpt_type': 'safetensors',
        'train': {
            'train_steps': steps, 'save_step': 10 ** 9,  # save only at end
            'gradient_accumulation_steps': 1, 'max_grad_norm': 1.0,
            'loss': {'criterion': {'_target_': 'min_snr', 'gamma': 5.0}},
            'optimizer': {'_target_': 'optim.adamw', 'weight_decay': 1e-3},
            'scheduler': {'name': 'constant', 'num_warmup_steps': 0,
                          'num_training_steps': steps},
        },
        # full-size SD1.5, random init (throughput is weight-independent)
        'model': {'pretrained_model_name_or_path': 'tiny' if tiny else None,
                  'tokenizer_repeats': 1, 'gradient_checkpointing': True},
        'logger': [{'_target_': 'CLILogger', 'log_step': log_step}],
        'lora_unet': [{'lr': 1e-4, 'rank': 8,
                       'layers': ['re:.*attn[12]\\.to_(q|k|v|out)$',
                                  're:.*ff\\.(proj|out)$']}],
        'data': {'dataset1': {
            'batch_size': B, 'cache_latents': True,
            'source': {'s1': {
                'img_root': imgs,
                'caption_file': os.path.join(imgs, 'captions.json')}},
            'bucket': {'_target_': 'FixedBucket', 'target_size': size},
        }},
        'tokenizer_pt': {'emb_dir': None, 'train': None},
    })

    t = Trainer(cfg)

    # ride the loop's log boundaries (device-synced by the loss fetch)
    marks = []
    orig_log = t.loggers.log

    def timed_log(datas, step=0):
        marks.append((step, time.perf_counter()))
        return orig_log(datas, step)

    t.loggers.log = timed_log
    t.train()

    if len(marks) < 3:
        raise SystemExit('not enough log windows — raise BENCH_STEPS')
    # drop the first window (jit compile + latent caching)
    (s0, t0), (s1, t1) = marks[1], marks[-1]
    sps = B * (s1 - s0) / (t1 - t0)
    print(json.dumps({
        'metric': f'SD1.5 {size}px LoRA Trainer e2e (config-driven hot loop)',
        'value': round(sps, 4), 'unit': 'samples/sec/chip',
        'windows_used': len(marks) - 1,
        'vs_baseline': round(sps / 6.0, 4)}))


if __name__ == '__main__':
    main()
