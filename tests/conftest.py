import os
import sys

# Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
# exercised without TPU hardware (SURVEY.md §4 distributed test strategy).
# jax is pre-imported by the environment's sitecustomize with a TPU backend
# registered, so the platform must be overridden via jax.config (the backend
# itself is still uninitialized at conftest time).
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
try:  # persistent compile cache makes suite reruns much faster
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_cpu')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
