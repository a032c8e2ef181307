import numpy as np

from hcpdiff_tpu.workflow.base import (BasicAction, ExecAction, LoopAction,
                                       MemoryMixin, resolve_from_memory)


def test_from_memory_resolution():
    mem = {'unet': {'params': 42}, 'name': 'x'}
    assert resolve_from_memory('${hcp.from_memory:unet.params}', mem) == 42
    spec = {'a': '${hcp.from_memory:name}', 'b': ['${hcp.from_memory:unet.params}']}
    out = resolve_from_memory(spec, mem)
    assert out == {'a': 'x', 'b': [42]}
    # non-matching strings pass through
    assert resolve_from_memory('plain ${other}', mem) == 'plain ${other}'


def test_exec_action():
    act = ExecAction(prog="states['y'] = states['x'] * 2\nmemory['seen'] = True")
    mem = {}
    states = act(memory=mem, x=21)
    assert states['y'] == 42 and mem['seen'] is True


def test_loop_action_iterates():
    class Add(BasicAction):
        def forward(self, acc=0, t=None, **states):
            return {'acc': acc + t, **states}

    loop = LoopAction(loop_value={'timesteps': 't'}, actions=[Add()])
    states = loop(memory={}, timesteps=[1, 2, 3], acc=0)
    assert states['acc'] == 6
    assert 't' not in states
