from .node import Cfg, containerize, to_plain, merge, remove_deleted, apply_dotlist
from .interp import register_resolver, resolve
from .loader import load, load_config, load_config_with_cli, save_config
from .instantiate import instantiate, locate, register

__all__ = [
    'Cfg', 'containerize', 'to_plain', 'merge', 'remove_deleted', 'apply_dotlist',
    'register_resolver', 'resolve',
    'load', 'load_config', 'load_config_with_cli', 'save_config',
    'instantiate', 'locate', 'register',
]
