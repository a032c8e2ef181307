import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from hcpdiff_tpu.ops.groupnorm import group_norm_silu


def _ref(x, scale, bias, groups, eps=1e-5, silu=True):
    import torch
    import torch.nn.functional as F
    xt = torch.tensor(np.asarray(x)).permute(0, 3, 1, 2)
    y = F.group_norm(xt, groups, torch.tensor(np.asarray(scale)),
                     torch.tensor(np.asarray(bias)), eps)
    if silu:
        y = F.silu(y)
    return y.permute(0, 2, 3, 1).numpy()


def test_gn_silu_matches_torch_xla_path():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 8, 64))
    scale = jnp.linspace(0.5, 1.5, 64)
    bias = jnp.linspace(-0.1, 0.1, 64)
    out = group_norm_silu(x, scale, bias, groups=8, use_pallas=False)
    ref = _ref(x, scale, bias, 8)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_gn_silu_pallas_interpret():
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (2, 4, 4, 128))
    scale = jnp.ones(128)
    bias = jnp.zeros(128)
    with pltpu.force_tpu_interpret_mode():
        out = group_norm_silu(x, scale, bias, groups=32, use_pallas=True)
    ref = _ref(x, scale, bias, 32)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_gn_no_silu():
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 32))
    out = group_norm_silu(x, jnp.ones(32), jnp.zeros(32), groups=4,
                          apply_silu=False, use_pallas=False)
    ref = _ref(x, np.ones(32, np.float32), np.zeros(32, np.float32), 4, silu=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_gn_streaming_interpret():
    from hcpdiff_tpu.ops.groupnorm import _gn_silu_streaming_raw, _gn_silu_xla
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (2, 16, 16, 320))  # C=320, S=256
    scale = jnp.linspace(0.5, 1.5, 320)
    bias = jnp.linspace(-0.1, 0.1, 320)
    with pltpu.force_tpu_interpret_mode():
        out = _gn_silu_streaming_raw(x, scale, bias, 32, 1e-5, True,
                                     S=256, C=320, tile_s=64)
    ref = _gn_silu_xla(x, scale, bias, 32, 1e-5, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
