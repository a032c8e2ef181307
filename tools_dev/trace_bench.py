"""Dev helper: capture a jax profiler trace of one bench generation.

usage: python tools_dev/trace_bench.py [/tmp/trace_dir]
Then:  python -m hcpdiff_tpu.tools.analyze_trace /tmp/trace_dir 30
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
from hcpdiff_tpu.models.vae import VAEConfig, AutoencoderKL
from hcpdiff_tpu.utils.profiling import trace


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/trace_dir'
    batch = int(os.environ.get('BENCH_BATCH', '8'))
    steps = int(os.environ.get('BENCH_STEPS', '20'))
    lat = int(os.environ.get('BENCH_SIZE', '512')) // 8

    dtype = jnp.bfloat16
    ucfg = UNetConfig.sd15()
    unet = UNet2DCondition(ucfg, dtype=dtype)
    unet_params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, lat, lat, 4), dtype),
                            jnp.array([0]), jnp.zeros((1, 77, 768), dtype))['params']
    vcfg = VAEConfig.sd()
    vae = AutoencoderKL(vcfg, dtype=dtype)
    vae_params = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)),
                          jax.random.PRNGKey(2))['params']
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, t)
    unet_params = cast(unet_params)
    vae_params = cast(vae_params)

    def unet_apply(p, x, t, ctx):
        return unet.apply({'params': p}, x, t, ctx)

    loop = DenoiseLoop(unet_apply, make_sampler('dpm++_2m', NoiseSchedule.make(), steps))
    decode = jax.jit(lambda p, z: vae.apply(
        {'params': p}, z / vcfg.scaling_factor, method='decode'))

    ctx = jax.random.normal(jax.random.PRNGKey(3), (2 * batch, 77, 768)).astype(dtype)
    latents = jax.random.normal(jax.random.PRNGKey(4), (batch, lat, lat, 4))

    def one_gen(seed):
        out, _ = loop(unet_params, latents, ctx, jax.random.PRNGKey(seed), 7.5)
        return decode(vae_params, out)

    one_gen(0).block_until_ready()   # compile
    with trace(out_dir):
        one_gen(1).block_until_ready()
    print('trace written to', out_dir)


if __name__ == '__main__':
    main()
