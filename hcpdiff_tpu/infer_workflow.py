"""CLI: python -m hcpdiff_tpu.infer_workflow --cfg cfgs/workflow/X.yaml
(reference hcpdiff/infer_workflow.py)."""
from .config import load
from .workflow import WorkflowRunner


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument('--cfg', required=True)
    args, unknown = p.parse_known_args()
    cfgs = load(args.cfg, unknown)
    WorkflowRunner(cfgs).start()


if __name__ == '__main__':
    main()
