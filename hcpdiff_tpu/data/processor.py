"""Inference-time condition-image processing (reference
hcpdiff/data/data_processor.py ControlNetProcessor, used
visualizer.py:180-183): load + normalize the ControlNet cond image into the
``ex_input`` the pipeline feeds through the plugin."""
from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np
from PIL import Image


class ControlNetProcessor:
    def __init__(self, image: Union[str, Image.Image, np.ndarray],
                 size: Optional[Tuple[int, int]] = None):
        self.image = image
        self.size = size

    def __call__(self, width: int = 512, height: int = 512,
                 batch_size: int = 1) -> np.ndarray:
        img = self.image
        if isinstance(img, str):
            img = Image.open(img)
        if isinstance(img, Image.Image):
            img = img.convert('RGB').resize((width, height), Image.BICUBIC)
            arr = np.asarray(img, np.float32) / 255.0
        else:
            arr = np.asarray(img, np.float32)
            if arr.max() > 1.5:
                arr = arr / 255.0
        if arr.ndim == 3:
            arr = arr[None]
        return np.repeat(arr, batch_size, axis=0) if arr.shape[0] == 1 else arr
