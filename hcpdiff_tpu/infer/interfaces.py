"""Output interfaces (reference hcpdiff/vis/*).

DiskInterface: numbered image saves + per-image reproduction yaml
(reference vis/disk_interface.py:9-50). WebUIInterface: machine-readable
progress lines (vis/webui_interface.py:4).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np
import yaml


class BaseInterface:
    need_inter_imgs = False

    def __init__(self, show_steps: int = 0, **kw):
        self.show_steps = int(show_steps)

    def on_inter_step(self, i, num_steps, t, latents, images):
        pass

    def on_infer_finish(self, images, info: Optional[Dict[str, Any]] = None):
        pass


class DiskInterface(BaseInterface):
    def __init__(self, save_root: str = 'output/', image_type: str = 'png',
                 quality: int = 95, save_cfg: bool = True, **kw):
        super().__init__(**kw)
        self.save_root = save_root
        self.image_type = image_type
        self.quality = int(quality)
        self.save_cfg = bool(save_cfg)
        os.makedirs(save_root, exist_ok=True)
        self.counter = len([f for f in os.listdir(save_root)
                            if f.endswith(image_type)])

    def on_infer_finish(self, images, info: Optional[Dict[str, Any]] = None):
        from PIL import Image
        arr = np.asarray(images)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        paths = []
        for img in arr:
            name = f'{self.counter}-img'
            p = os.path.join(self.save_root, f'{name}.{self.image_type}')
            Image.fromarray(img).save(p, quality=self.quality)
            if self.save_cfg and info is not None:
                with open(os.path.join(self.save_root, f'{name}.yaml'), 'w') as f:
                    yaml.safe_dump(info, f, sort_keys=False)
            paths.append(p)
            self.counter += 1
        return paths


class DiskAnimInterface(DiskInterface):
    """Also saves the intermediate-step x0 previews as an animated webp
    (reference vis/disk_interface.py intermediate-step animation)."""
    need_inter_imgs = True

    def __init__(self, *a, frame_ms: int = 150, **kw):
        super().__init__(*a, **kw)
        self.frame_ms = int(frame_ms)
        self._frames = []

    def on_inter_step(self, i, num_steps, t, latents, images):
        if images is not None:
            self._frames.append(np.asarray(images))

    def on_infer_finish(self, images, info=None):
        from PIL import Image
        paths = super().on_infer_finish(images, info)
        if self._frames:
            for b in range(self._frames[0].shape[0]):
                frames = [Image.fromarray(
                    (np.clip(f[b], 0, 1) * 255).astype(np.uint8))
                    for f in self._frames]
                frames[0].save(
                    os.path.join(self.save_root, f'{self.counter - 1}-steps.webp'),
                    save_all=True, append_images=frames[1:],
                    duration=self.frame_ms, loop=0)
            self._frames = []
        return paths


class WebUIInterface(BaseInterface):
    need_inter_imgs = False

    def on_inter_step(self, i, num_steps, t, latents, images):
        print(f'[hcp-progress] {i}/{num_steps} t={t}', flush=True)

    def on_infer_finish(self, images, info=None):
        print(f'[hcp-finish] n={len(images)}', flush=True)
