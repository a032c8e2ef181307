"""Workflow engine core (reference hcpdiff/workflow/base.py).

yaml-programmable inference graphs: a workflow is a list of actions; each
action transforms a ``states`` dict; ``MemoryMixin`` actions also access a
persistent ``memory`` dict; ``LoopAction`` iterates sub-actions over
timesteps (reference base.py:41-59); ``ExecAction`` runs arbitrary python
(base.py:33).

``${hcp.from_memory:key}`` placeholders in configs resolve against the
memory at runtime (reference workflow/__init__.py:12-15).
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

_FROM_MEMORY = re.compile(r'^\$\{hcp\.from_memory:([^}]+)\}$')


def resolve_from_memory(value: Any, memory: Dict[str, Any]) -> Any:
    if isinstance(value, str):
        m = _FROM_MEMORY.match(value.strip())
        if m:
            key = m.group(1).strip()
            node: Any = memory
            for part in key.split('.'):
                node = node[part] if isinstance(node, dict) else getattr(node, part)
            return node
    if isinstance(value, dict):
        return {k: resolve_from_memory(v, memory) for k, v in value.items()}
    if isinstance(value, list):
        return [resolve_from_memory(v, memory) for v in value]
    return value


class BasicAction:
    def __init__(self, **kw):
        self.kw = kw

    def forward(self, **states) -> Dict[str, Any]:
        raise NotImplementedError

    def __call__(self, memory=None, **states) -> Dict[str, Any]:
        if isinstance(self, MemoryMixin):
            return self.forward(memory=memory, **states)
        return self.forward(**states)


class MemoryMixin:
    """Actions that read/write the persistent memory dict."""


class ExecAction(BasicAction):
    """Run arbitrary python against states/memory (reference base.py:33)."""

    def __init__(self, prog: str, **kw):
        super().__init__(**kw)
        self.prog = prog

    def __call__(self, memory=None, **states):
        scope = {'states': states, 'memory': memory}
        exec(self.prog, scope)
        return scope['states']


class LoopAction(BasicAction, MemoryMixin):
    """Iterate sub-actions over a states list key (timesteps)
    (reference base.py:41-59)."""

    def __init__(self, loop_value: Dict[str, str], actions: List[Any], **kw):
        super().__init__(**kw)
        self.loop_value = loop_value  # {states_key: loop_var_name}
        self.actions = actions

    def __call__(self, memory=None, **states):
        loop_keys = list(self.loop_value.keys())
        seqs = [states.pop(k) for k in loop_keys]
        names = [self.loop_value[k] for k in loop_keys]
        for values in zip(*seqs):
            for name, v in zip(names, values):
                states[name] = v
            for act in self.actions:
                states = act(memory=memory, **states) if isinstance(act, MemoryMixin) \
                    else act(**states)
        for name in names:
            states.pop(name, None)
        return states


class WorkflowRunner:
    """Run a workflow config: prepare actions, then main actions
    (reference hcpdiff/infer_workflow.py:12-57)."""

    def __init__(self, cfgs):
        from ..config.instantiate import instantiate
        self.cfgs = cfgs
        self.memory: Dict[str, Any] = dict(cfgs.get('memory') or {})

    def _build_actions(self, cfg_list) -> List[Any]:
        from ..config.instantiate import instantiate
        out = []
        for item in (cfg_list or []):
            spec = resolve_from_memory(item, self.memory)
            out.append(instantiate(spec))
        return out

    def run(self, actions: List[Any], states: Optional[Dict[str, Any]] = None):
        states = dict(states or {})
        for act in actions:
            if isinstance(act, (MemoryMixin,)) or isinstance(act, ExecAction):
                states = act(memory=self.memory, **states)
            else:
                states = act(**states)
        return states

    def start(self):
        prepare = self._build_actions(self.cfgs.get('prepare'))
        states = self.run(prepare, {})
        actions = self._build_actions(self.cfgs.get('actions'))
        return self.run(actions, states)
