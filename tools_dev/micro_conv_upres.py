"""Micro A/B: the up-block res conv1 hot shapes (trace round-4: the
conv+GN-stats mega-fusions run ~120 TF/s vs ~195 for pure convs).

Timing is scan-amortized INSIDE one jit (per-dispatch timing through the
axon tunnel is unreliable): each iteration perturbs the input, and only a
scalar survives, so nothing can be CSE'd/hoisted while HBM traffic stays
realistic.

Compares, per shape:
  a) XLA pure conv (no stats consumer)        — the speed-of-light row
  b) XLA conv + fp32 GN-stats consumer        — reproduces the mega-fusion
  c) Pallas conv3x3 (+row_bias) + XLA stats   — candidate selective route

usage: python tools_dev/micro_conv_upres.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hcpdiff_tpu.ops.conv import conv3x3

ITERS = 30

SHAPES = [
    # (B, H, W, Cin, Cout)  — trace round-4 hot sites (concat inputs)
    (16, 64, 64, 960, 320),   # up_3_res_0 conv1: 3.03 ms/step in-loop
    (16, 64, 64, 640, 320),   # up_3_res_1/2 conv1: 1.99 ms/step
    (16, 32, 32, 1280, 640),  # up_2_res_0 conv1
    (16, 64, 64, 320, 320),   # plain level-0 conv2
]


def make_loop(core):
    """core(x, w, b, rb) -> y [B,H,W,Cout]; returns jitted scan-chained
    scalar so the conv must run every iteration."""

    @jax.jit
    def run(x, w, b, rb):
        def body(carry, i):
            xi = x + (i * 1e-6).astype(x.dtype)
            y = core(xi, w, b, rb)
            return carry + jnp.sum(y.astype(jnp.float32)), ()

        s, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(ITERS, dtype=jnp.float32))
        return s

    return run


def bench(run, *args):
    # block_until_ready through the axon tunnel does not reliably wait;
    # a host transfer (float()) is the only trustworthy barrier here.
    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / ITERS


def main():
    for B, H, W, Cin, Cout in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, Cin)
                              ).astype(jnp.bfloat16)
        w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, Cin, Cout))
             * 0.02).astype(jnp.bfloat16)
        b = jnp.zeros((Cout,), jnp.bfloat16)
        rb = jax.random.normal(jax.random.PRNGKey(2), (B, Cout)
                               ).astype(jnp.bfloat16)
        flops = 2 * B * H * W * 9 * Cin * Cout

        def xla_conv(xi, w, b, rb):
            y = jax.lax.conv_general_dilated(
                xi, w, (1, 1), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.bfloat16)
            return y + b + rb[:, None, None, :]

        def xla_pure(xi, w, b, rb):
            return xla_conv(xi, w, b, rb)

        def xla_stats(xi, w, b, rb):
            y = xla_conv(xi, w, b, rb)
            yf = y.astype(jnp.float32)
            s1 = jnp.sum(yf, axis=(1, 2))
            s2 = jnp.sum(yf * yf, axis=(1, 2))
            return y + (s1 + s2)[:, None, None, :].astype(y.dtype)

        def pallas_stats(xi, w, b, rb):
            y = conv3x3(xi, w, b, row_bias=rb)
            yf = y.astype(jnp.float32)
            s1 = jnp.sum(yf, axis=(1, 2))
            s2 = jnp.sum(yf * yf, axis=(1, 2))
            return y + (s1 + s2)[:, None, None, :].astype(y.dtype)

        rows = []
        for name, core in [('xla_pure', xla_pure), ('xla_stats', xla_stats),
                           ('pallas_stats', pallas_stats)]:
            try:
                dt = bench(make_loop(core), x, w, b, rb)
                rows.append(f'{name} {dt*1e3:7.3f}ms {flops/dt/1e12:6.1f} TF/s')
            except Exception as e:  # noqa: BLE001
                rows.append(f'{name} FAILED {type(e).__name__}: {str(e)[:120]}')
        print(f'[{B},{H},{W},{Cin}->{Cout}] ' + ' | '.join(rows), flush=True)


if __name__ == '__main__':
    main()
