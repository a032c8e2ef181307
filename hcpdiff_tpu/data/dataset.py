"""Datasets + loader + DataGroup (reference hcpdiff/data/pair_dataset.py,
cond_dataset.py, crop_info_dataset.py, data/__init__.py:9-27).

Host-side, torch-free, fully deterministic given (seed, epoch, step):
- bucket picks the batch's (w,h); the dataset loads+crops+tokenizes
- ``cache_latents`` pre-encodes every image through the VAE once (optionally
  persisted to disk as .npz) so the train loop never touches the VAE
  (reference pair_dataset.py:60-79)
- DreamArtist collate lays prompts out [neg..., pos...]
  (reference pair_dataset.py:109-146)
- CycleData re-shuffles buckets per epoch; DataGroup zips several datasets
  with their own bs/loss_weight per step.
"""
from __future__ import annotations

import hashlib
import os
import threading
import queue as queue_mod
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .buckets import BaseBucket, FixedBucket
from .sources import DataSource, Text2ImageAttMapSource, Text2ImageCondSource
from .utils import resize_crop_fix, to_model_input


class TextImagePairDataset:
    def __init__(self, source: DataSource, bucket: Optional[BaseBucket] = None,
                 frontend=None, vae_scale: int = 8,
                 cache_latents: bool = False, cache_dir: Optional[str] = None,
                 loss_weight: float = 1.0, random_crop: bool = True,
                 dream_artist: bool = False, with_crop_info: bool = False):
        self.source = source
        self.bucket = FixedBucket(512) if bucket is None else bucket
        self.frontend = frontend
        self.vae_scale = vae_scale
        self.want_cache = cache_latents
        self.cache_dir = cache_dir
        self.loss_weight = float(loss_weight)
        self.random_crop = random_crop
        self.dream_artist = dream_artist
        self.with_crop_info = with_crop_info
        self._latent_cache: Dict[int, np.ndarray] = {}
        self._crop_cache: Dict[Any, dict] = {}  # (i, size) -> crop geometry
        self.files: List[Tuple[str, Dict[str, Any]]] = []

    # ---- build ----
    def build(self, bs: int, world_size: int = 1) -> 'TextImagePairDataset':
        self.bs = bs
        self.files = self.source.get_image_list()
        infos = [(p, self.source.size_of(p)) for p, _ in self.files]
        self.bucket.build(infos, bs, world_size)
        return self

    def __len__(self) -> int:
        return len(self.bucket)

    # ---- latent caching ----
    def cache_all_latents(self, encode_fn: Callable[[np.ndarray], np.ndarray],
                          batch_size: int = 8) -> None:
        """encode_fn: [N,H,W,3] in [-1,1] -> [N,h,w,4] scaled latents.
        Caches per (item, bucket-size) pair; disk cache keyed by file hash."""
        for bi in range(len(self.bucket)):
            idx, size = self.bucket[bi]
            for start in range(0, len(idx), batch_size):
                chunk = [i for i in idx[start:start + batch_size]
                         if (int(i), size) not in self._latent_cache]
                chunk = list(dict.fromkeys(int(i) for i in chunk))
                if not chunk:
                    continue
                imgs, metas = zip(*[self._load_image(i, size, rng=None)
                                    for i in chunk])
                lat = np.asarray(encode_fn(np.stack(imgs)))
                for i, l, ci in zip(chunk, lat, metas):
                    self._latent_cache[(i, size)] = l
                    # keep crop geometry for SDXL time_ids (cached latents
                    # use the deterministic center crop, rng=None)
                    self._crop_cache[(i, size)] = ci
        if self.cache_dir:
            os.makedirs(self.cache_dir, exist_ok=True)
            key = hashlib.md5(str([p for p, _ in self.files]).encode()).hexdigest()[:12]
            np.savez(os.path.join(self.cache_dir, f'latents_{key}.npz'),
                     **{f'{i}_{s[0]}x{s[1]}': v
                        for (i, s), v in self._latent_cache.items()})

    def load_latent_cache(self) -> bool:
        if not self.cache_dir:
            return False
        key = hashlib.md5(str([p for p, _ in self.files]).encode()).hexdigest()[:12]
        path = os.path.join(self.cache_dir, f'latents_{key}.npz')
        if not os.path.exists(path):
            return False
        z = np.load(path)
        for k in z.files:
            i, wh = k.rsplit('_', 1)
            w, h = wh.split('x')
            self._latent_cache[(int(i), (int(w), int(h)))] = z[k]
        return True

    # ---- item assembly ----
    def _load_image(self, i: int, size: Tuple[int, int],
                    rng: Optional[np.random.Generator]):
        path, meta = self.files[i]
        src = meta.get('source', self.source)
        img = src.load_image(path)
        r = rng if self.random_crop else None
        from .utils import resize_crop_fix_native
        arr, crop_info = resize_crop_fix_native(img, size, r)
        if arr is not None:
            return arr, crop_info
        # fall back to PIL with the SAME geometry (no extra rng draws)
        w0, h0 = img.size
        tw, th = size
        scale = max(tw / w0, th / h0)
        nw, nh = round(w0 * scale), round(h0 * scale)
        x0, y0 = crop_info['crop_coord']
        img = img.resize((nw, nh)).crop((x0, y0, x0 + tw, y0 + th))
        return to_model_input(img), crop_info

    # multi-host: each process loads only its stride slice of the global
    # batch (torch DistributedSampler indices[rank::world] semantics,
    # reference train_ac.py:319); shard_batch reassembles the global array
    # from per-host shards. Defaults = single host, full batch.
    host_rank: int = 0
    host_count: int = 1

    def get_batch(self, bi: int, epoch: int = 0, step_seed: int = 0
                  ) -> Dict[str, np.ndarray]:
        idx, size = self.bucket[bi]
        if self.host_count > 1:
            idx = list(idx)[self.host_rank::self.host_count]
        rng = np.random.default_rng((epoch * 1_000_003 + step_seed * 7919 + bi))
        w, h = size
        lw, lh = w // self.vae_scale, h // self.vae_scale

        latents, images, prompts, att_masks, crop_infos, conds = [], [], [], [], [], []
        for i in idx:
            i = int(i)
            path, meta = self.files[i]
            src = meta.get('source', self.source)
            cached = self._latent_cache.get((i, size))
            crop_info = None
            if cached is not None:
                latents.append(cached)
                crop_info = self._crop_cache.get((i, size))
            else:
                img, crop_info = self._load_image(i, size, rng)
                images.append(img)
            # prompt
            if hasattr(src, 'make_prompt'):
                pr = src.make_prompt(path, rng) if 'class_word' not in meta else \
                    src.make_prompt(path, rng, meta.get('class_word'))
            else:
                pr = src.get_caption(path) or ''
            prompts.append(pr)
            # attention map
            if isinstance(src, Text2ImageAttMapSource):
                am = src.get_att_map(path)
                if am is not None:
                    am = am.resize((lw, lh))
                    att_masks.append(src.att_map_to_weight(np.asarray(am)))
            # cond image
            if isinstance(src, Text2ImageCondSource):
                cimg = src.get_cond_image(path)
                cimg, _ = resize_crop_fix(cimg, size, None)
                conds.append(to_model_input(cimg) * 0.5 + 0.5)
            if self.with_crop_info:
                if crop_info is not None:
                    ci = crop_info
                    crop_infos.append([ci['original_size'][1],
                                       ci['original_size'][0],
                                       ci['crop_coord'][1],
                                       ci['crop_coord'][0], h, w])
                else:
                    # geometry unknown (e.g. disk cache without crop meta):
                    # default to uncropped-at-target conditioning
                    crop_infos.append([h, w, 0, 0, h, w])

        batch: Dict[str, Any] = {'loss_weight': np.float32(self.loss_weight)}
        if latents and not images:
            batch['latents'] = np.stack(latents)
        elif images:
            batch['images'] = np.stack(images)

        # tokenization (DreamArtist prompts are [neg,pos] pairs)
        if self.frontend is not None:
            if self.dream_artist and prompts:
                # the train step splits input_ids into [neg..., pos...]
                # halves; a source without pair word_names still must feed
                # the doubled layout (neg == pos then), or the UNet
                # cross-attention batch mismatches the latents
                pairs = [p if isinstance(p, (list, tuple)) else (p, p)
                         for p in prompts]
                negs = [p[0] for p in pairs]
                poss = [p[1] for p in pairs]
                ids, mult = self.frontend.tokenize_batch(negs + poss)
            else:
                flat = [p if isinstance(p, str) else p[-1] for p in prompts]
                ids, mult = self.frontend.tokenize_batch(flat)
            batch['input_ids'] = ids
            batch['token_mult'] = mult
        else:
            batch['prompts'] = prompts

        if att_masks:
            batch['att_mask'] = np.stack(att_masks).astype(np.float32)
        if conds:
            batch['cond'] = np.stack(conds).astype(np.float32)
        if crop_infos:
            batch['time_ids'] = np.asarray(crop_infos, np.float32)
        return batch


class TextImageCondPairDataset(TextImagePairDataset):
    """ControlNet training dataset — cond image rides in batch['cond']
    (reference cond_dataset.py:16). Logic lives in get_batch above via
    Text2ImageCondSource detection."""


class CropInfoPairDataset(TextImagePairDataset):
    """SDXL dataset with crop-info time_ids (reference crop_info_dataset.py:21)."""

    def __init__(self, *a, **kw):
        kw.setdefault('with_crop_info', True)
        super().__init__(*a, **kw)


class CycleData:
    """Infinite epoch iterator: bucket.rest(epoch) each pass
    (reference data/utils.py:66-80)."""

    def __init__(self, dataset: TextImagePairDataset):
        self.dataset = dataset

    def __iter__(self):
        epoch = 0
        while True:
            self.dataset.bucket.rest(epoch)
            for bi in range(len(self.dataset)):
                yield self.dataset.get_batch(bi, epoch=epoch, step_seed=bi)
            epoch += 1


class DataGroup:
    """Zip N datasets, one batch from each per step, each with its own bs and
    loss weight (reference data/__init__.py:9-27)."""

    def __init__(self, datasets: Sequence[TextImagePairDataset] | dict,
                 prefetch: int = 2):
        if isinstance(datasets, dict):
            datasets = list(datasets.values())
        self.datasets = list(datasets)
        self.prefetch = prefetch

    def __iter__(self):
        iters = [iter(CycleData(d)) for d in self.datasets]
        if self.prefetch <= 0:
            while True:
                yield [next(it) for it in iters]

        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                while not stop.is_set():
                    q.put([next(it) for it in iters])
            except Exception as e:  # pragma: no cover
                q.put(e)

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()

    def __len__(self):
        return min(len(d) for d in self.datasets)
