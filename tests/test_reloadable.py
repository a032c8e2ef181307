import numpy as np

from hcpdiff_tpu.config import containerize, resolve


def _cfg(**over):
    base = {
        'pretrained_model': 'tiny', 'dtype': 'fp32',
        'prompt': 'a photo of cat', 'neg_prompt': '', 'seed': 1, 'bs': 1,
        'infer_args': {'width': 32, 'height': 32, 'inference_steps': 2,
                       'sampler': 'euler'},
        'interface': [],
        'merge': None,
    }
    base.update(over)
    return resolve(containerize(base))


def test_reload_infer_args_only():
    from hcpdiff_tpu.infer.reloadable import VisualizerReloadable
    v = VisualizerReloadable(_cfg())
    params_before = v.unet_params
    full = v.check_reload(_cfg(infer_args={'width': 32, 'height': 32,
                                           'inference_steps': 3,
                                           'sampler': 'euler'}))
    assert full is False              # partial reload only
    assert v.unet_params is params_before  # model untouched
    assert v.cfgs['infer_args']['inference_steps'] == 3


def test_reload_frontend_knobs():
    from hcpdiff_tpu.infer.reloadable import VisualizerReloadable
    v = VisualizerReloadable(_cfg(model={'tokenizer_repeats': 1,
                                         'clip_skip': 0}))
    v.check_reload(_cfg(model={'tokenizer_repeats': 1, 'clip_skip': 1}))
    assert v.frontend.clip_skip == 1
