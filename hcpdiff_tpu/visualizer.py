"""CLI: python -m hcpdiff_tpu.visualizer --cfg cfgs/infer/X.yaml k=v
(reference: python -m hcpdiff.visualizer)."""
from .infer.visualizer import main

if __name__ == '__main__':
    main()
