"""Dev helper: dump the optimized HLO of the bench denoise loop so trace
fusion names (e.g. convert_reduce_fusion.225) can be matched to their HLO
definitions/shapes.

usage: python tools_dev/dump_hlo.py [/tmp/loop_hlo.txt]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp

from hcpdiff_tpu.diffusion.samplers import make_sampler
from hcpdiff_tpu.diffusion.schedules import NoiseSchedule
from hcpdiff_tpu.infer.pipeline import DenoiseLoop
from hcpdiff_tpu.models.unet import UNetConfig, UNet2DCondition


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/loop_hlo.txt'
    batch = int(os.environ.get('BENCH_BATCH', '8'))
    steps = int(os.environ.get('BENCH_STEPS', '20'))
    lat = int(os.environ.get('BENCH_SIZE', '512')) // 8

    dtype = jnp.bfloat16
    ucfg = UNetConfig.sd15()
    unet = UNet2DCondition(ucfg, dtype=dtype)
    unet_params = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, lat, lat, 4), dtype),
        jnp.array([0]), jnp.zeros((1, 77, 768), dtype))['params']
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, t)
    unet_params = cast(unet_params)

    def unet_apply(p, x, t, ctx):
        return unet.apply({'params': p}, x, t, ctx)

    loop = DenoiseLoop(unet_apply,
                       make_sampler('dpm++_2m', NoiseSchedule.make(), steps))
    ctx = jnp.zeros((2 * batch, 77, 768), dtype)
    latents = jnp.zeros((batch, lat, lat, 4))
    lowered = loop._jitted.lower(
        unet_params, latents, ctx, jax.random.PRNGKey(0),
        jnp.asarray(7.5, jnp.float32), None, None, cfg_batch=True)
    compiled = lowered.compile()
    with open(out, 'w') as f:
        f.write(compiled.as_text())
    print('wrote', out, os.path.getsize(out), 'bytes')


if __name__ == '__main__':
    main()
