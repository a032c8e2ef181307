"""Worker for the preemption (SIGTERM -> save -> auto-resume) test.

Launched by tests/test_preemption.py as:
    python preempt_worker.py <workdir>

Phase 1: starts a long tiny training run (train_steps huge, save_step
huge so NO regular checkpoint can exist), with a watchdog thread that
waits until the train loop has demonstrably made progress (>= 2 step
lines in exp/train.log) and then delivers a REAL SIGTERM to this
process. The Trainer must save the full state and return cleanly with
``preempted == True``.

Phase 2: a fresh Trainer with ``train.resume.auto`` must resume exactly
at the preempted step, proving the save was complete.
"""
import json
import os
import signal
import sys
import threading
import time


def make_cfg(workdir, resume=False):
    from hcpdiff_tpu.config import containerize
    cfg = {
        'exp_dir': os.path.join(workdir, 'exp'),
        'mixed_precision': 'fp32', 'seed': 1, 'ckpt_type': 'safetensors',
        'train': {
            'train_steps': 100000, 'save_step': 100000,
            'gradient_accumulation_steps': 1, 'max_grad_norm': 1.0,
            'cfg_scale': '1.0',
            'preemption': ['SIGTERM'],
            'loss': {'criterion': {'_target_': 'mse'}},
            'optimizer': {'_target_': 'optim.adamw'},
            'scheduler': {'name': 'constant', 'num_warmup_steps': 0,
                          'num_training_steps': 100000},
        },
        'model': {'pretrained_model_name_or_path': 'tiny',
                  'tokenizer_repeats': 1, 'gradient_checkpointing': False},
        'logger': [{'_target_': 'CLILogger', 'log_step': 1}],
        'data': {'dataset1': {
            'batch_size': 2, 'cache_latents': True,
            'source': {'s1': {'img_root': os.path.join(workdir, 'imgs'),
                              'caption_file': os.path.join(workdir, 'imgs',
                                                           'captions.json')}},
            'bucket': {'_target_': 'FixedBucket', 'target_size': 32},
        }},
        'tokenizer_pt': {'emb_dir': None, 'train': None},
        'lora_unet': [{'lr': 1e-3, 'rank': 2,
                       'layers': ['re:.*attn1\\.to_q$']}],
    }
    if resume:
        cfg['train']['resume'] = {'auto': True}
    return containerize(cfg)


def main():
    workdir = sys.argv[1]
    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ.pop('XLA_FLAGS', None)
    # The env var alone is NOT enough here: this environment's sitecustomize
    # re-pins jax to the axon TPU platform, and phase 1 then hangs waiting on
    # the (single, possibly busy) real chip. Pin via jax.config BEFORE any
    # backend init, exactly as tests/multihost_worker.py does.
    import jax
    jax.config.update('jax_platforms', 'cpu')

    # dataset fixture
    import numpy as np
    from PIL import Image
    imgs = os.path.join(workdir, 'imgs')
    os.makedirs(imgs, exist_ok=True)
    rng = np.random.default_rng(0)
    caps = {}
    for i in range(4):
        arr = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(imgs, f'img_{i}.png'))
        caps[f'img_{i}'] = f'a photo of cat {i}'
    with open(os.path.join(imgs, 'captions.json'), 'w') as f:
        json.dump(caps, f)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from hcpdiff_tpu.trainer.trainer import Trainer

    # -------- phase 1: train until a real SIGTERM lands mid-loop ----------
    log_file = os.path.join(workdir, 'exp', 'train.log')

    def watchdog():
        # wait for >= 2 completed steps, then SIGTERM this process
        deadline = time.time() + 600
        while time.time() < deadline:
            try:
                with open(log_file) as f:
                    if sum('step ' in ln for ln in f) >= 2:
                        break
            except OSError:
                pass
            time.sleep(0.2)
        os.kill(os.getpid(), signal.SIGTERM)

    t = Trainer(make_cfg(workdir))
    threading.Thread(target=watchdog, daemon=True).start()
    final = t.train()
    assert t.preempted, 'SIGTERM did not trigger the preemption path'
    assert 1 <= final < 100000, final
    assert t.orbax.latest_step() == final, (t.orbax.latest_step(), final)

    # -------- phase 2: fresh trainer auto-resumes the preempted state -----
    t2 = Trainer(make_cfg(workdir, resume=True))
    assert t2.start_step == final, (t2.start_step, final)
    import jax.tree_util as jtu
    from hcpdiff_tpu.parallel.mesh import gather_to_host
    a = dict(jtu.tree_flatten_with_path(gather_to_host(t.state.pack))[0])
    b = dict(jtu.tree_flatten_with_path(gather_to_host(t2.state.pack))[0])
    for k, v in a.items():
        np.testing.assert_allclose(v, b[k], atol=1e-6)

    with open(os.path.join(workdir, 'ok'), 'w') as f:
        json.dump({'preempted_at': final}, f)
    print(f'PASS preempted_at={final}', flush=True)


if __name__ == '__main__':
    main()
