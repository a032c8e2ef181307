"""VisualizerReloadable — interactive server mode with partial hot-reload
(reference hcpdiff/visualizer_reloadable.py:12-237).

The overlay design makes hot-swap nearly free: changing LoRAs/merge recipe
rebuilds one merged params pytree (no model reload); changing the sampler
picks a different compiled loop from the pipeline cache; only a change of
the pretrained base rebuilds models.
"""
from __future__ import annotations

from typing import Any, Optional

from ..config import Cfg, to_plain
from .visualizer import Visualizer


def _differs(a: Any, b: Any) -> bool:
    return to_plain(a) != to_plain(b)


class VisualizerReloadable(Visualizer):
    def __init__(self, cfgs: Cfg):
        super().__init__(cfgs)
        self._cfg_snapshot = to_plain(cfgs)

    def check_reload(self, new_cfgs: Cfg) -> bool:
        """Diff old vs new config; reload only the changed parts.
        Returns True if a full rebuild happened."""
        old = self._cfg_snapshot
        new = to_plain(new_cfgs)

        base_changed = (old.get('pretrained_model')
                        != new.get('pretrained_model'))
        if base_changed:
            self.__init__(new_cfgs)
            return True

        if old.get('merge') != new.get('merge') or old.get('emb_dir') != new.get('emb_dir'):
            # re-run merge recipe + embeddings only
            self.cfgs = new_cfgs
            self._remerge()
        if old.get('infer_args') != new.get('infer_args'):
            self.cfgs['infer_args'] = new_cfgs.get('infer_args')
        if old.get('interface') != new.get('interface'):
            self.cfgs['interface'] = new_cfgs.get('interface')
        mold, mnew = old.get('model') or {}, new.get('model') or {}
        for key in ('tokenizer_repeats', 'clip_skip', 'clip_final_norm'):
            if mold.get(key) != mnew.get(key):
                setattr(self.frontend,
                        {'tokenizer_repeats': 'n_repeats',
                         'clip_skip': 'clip_skip',
                         'clip_final_norm': 'clip_final_norm'}[key],
                        mnew.get(key))
        self._cfg_snapshot = new
        return False

    def _remerge(self):
        # shared with __init__: keeps the DreamArtist negative branch, the
        # bf16 cast and the embedding table in sync on hot-reload
        self._build_merged()
        self.pipe.unet_params = self.unet_params
        self.pipe.unet_params_neg = self.unet_params_neg
        self.frontend.params = self.te_params
