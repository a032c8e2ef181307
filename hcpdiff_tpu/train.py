"""CLI: python -m hcpdiff_tpu.train --cfg cfgs/train/examples/X.yaml k=v
(reference: python -m hcpdiff.train_ac / train_ac_single)."""
from .trainer.trainer import main

if __name__ == '__main__':
    main()
