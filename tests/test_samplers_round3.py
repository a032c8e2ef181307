"""Round-3 sampler breadth tests.

Two layers of verification (diffusers is not installed in this image, so
cross-implementation parity vs diffusers CPU schedulers is impossible —
instead):

1. Oracle point-mass convergence (same harness as test_samplers.py): every
   sampler fed the exact denoiser must land on x*.
2. Probability-flow-ODE accuracy on a two-point Gaussian-mixture oracle,
   where the exact denoiser E[x0|x_s] = m*tanh(m*x/s^2) is nonlinear — a
   20k-step Euler fine solve is the independent reference. This checks the
   ORDER of each method (2nd-order samplers must beat Euler by a wide
   margin at equal NFE), which a transliterated reference could not.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hcpdiff_tpu.diffusion.samplers import SAMPLERS, make_sampler
from hcpdiff_tpu.diffusion.schedules import NoiseSchedule

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from test_samplers import run_sampler  # noqa: E402


NEW_SAMPLERS = ['dpm++_2m_sde', 'heun', 'lms', 'deis', 'dpm2', 'dpm2_a',
                'dpm++_2s_a', 'dpm++_sde']


@pytest.mark.parametrize('name', NEW_SAMPLERS)
def test_new_sampler_converges_to_point_mass(name):
    x, x0 = run_sampler(name, 50)
    assert np.isfinite(x).all(), name
    np.testing.assert_allclose(x, 0.7, atol=0.08, err_msg=name)


@pytest.mark.parametrize('name', NEW_SAMPLERS)
def test_new_sampler_karras_variant(name):
    sched = NoiseSchedule.make()
    s = make_sampler(name, sched, 20, use_karras_sigmas=True)
    assert np.isfinite(np.asarray(s.sigmas)).all()


def test_sampler_registry_names():
    for alias in ['dpm++_sde', 'dpmpp_sde', 'dpm++_2m_sde', 'heun', 'lms',
                  'deis', 'dpm2', 'dpm2_a', 'dpm++_2s_a']:
        assert alias in SAMPLERS


# ------------------------------------------------- ODE-order verification ---

M = 1.0          # mixture modes at +-M


def _oracle_x0(x, s):
    """Exact denoiser for data ~ 0.5 delta(-M) + 0.5 delta(+M) in k-space
    (x = x0 + s*eps): posterior mean m*tanh(m*x/s^2)."""
    return M * jnp.tanh(M * x / jnp.maximum(s * s, 1e-12))


def _run_k_sampler(name, num_steps, x_init, stop_frac=0.5, **kw):
    """Run a sigma-space sampler on the mixture oracle, stopping
    MID-schedule (sigma ~ 1.4): near sigma=0 the flow collapses onto the
    modes and washes out accuracy differences. Ancestral samplers are
    excluded by callers — without noise they track the sigma_down path,
    not the nominal grid. Returns (x_at_s_stop, s_stop)."""
    from hcpdiff_tpu.diffusion.samplers import TwoStageKSampler
    sched = NoiseSchedule.make()
    sampler = make_sampler(name, sched, num_steps, **kw)
    k_stop = max(2, int(num_steps * stop_frac))
    iters = (2 * k_stop if isinstance(sampler, TwoStageKSampler) else k_stop)
    x = jnp.asarray(x_init, jnp.float32)
    state = sampler.init_state(x.shape)
    for i in range(iters):
        s_i = sampler.sigmas[i]
        x0 = _oracle_x0(x, s_i)
        eps = (x - x0) / jnp.maximum(s_i, 1e-12)
        x, state, _ = sampler.step(state, eps, jnp.asarray(i), x, None)
    return np.asarray(x), float(sampler.sigmas[iters])


def _fine_reference(x_init, s_from, s_to, n=20000):
    """20k-step Euler on dx/ds = (x - x0_hat(x,s))/s (log-s grid)."""
    xs = np.asarray(x_init, np.float64)
    grid = np.exp(np.linspace(np.log(s_from), np.log(s_to), n + 1))
    for a, b in zip(grid[:-1], grid[1:]):
        x0 = M * np.tanh(M * xs / (a * a))
        xs = xs + (xs - x0) / a * (b - a)
    return xs


@pytest.fixture(scope='module')
def mixture_setup():
    sched = NoiseSchedule.make()
    probe = make_sampler('euler', sched, 12)
    s0 = float(probe.sigmas[0])
    x_init = np.linspace(-2.0, 2.0, 9) * s0 * 0.25 + 0.37
    return x_init, s0


@pytest.mark.parametrize('name', ['dpm++_2m', 'dpm++_2m_sde', 'heun', 'lms',
                                  'deis', 'dpm2', 'unipc', 'dpm++_sde'])
def test_second_order_beats_euler(mixture_setup, name):
    """At 12 solver steps each 2nd-order sampler must be substantially more
    accurate than Euler against the fine ODE solve (order check — catches
    wrong coefficients that still converge). Calibrated margins: measured
    errors 0.002-0.019 vs euler 0.041."""
    x_init, s0 = mixture_setup
    x_e, s_stop = _run_k_sampler('euler', 12, x_init)
    ref = _fine_reference(x_init, s0, s_stop)
    err_e = np.abs(x_e - ref).max()
    kw = {'eta': 0.0} if 'sde' in name else {}
    x_s, s_stop2 = _run_k_sampler(name, 12, x_init, **kw)
    assert abs(s_stop2 - s_stop) < 1e-5   # same endpoint
    err_s = np.abs(x_s - ref).max()
    assert err_s < err_e * 0.55, (name, err_s, err_e)


def test_euler_first_order_convergence(mixture_setup):
    """Doubling steps must shrink Euler's error (monotone convergence;
    endpoints differ slightly between schedules so only a loose ratio)."""
    x_init, s0 = mixture_setup
    e = {}
    for n in (12, 24):
        x, s_stop = _run_k_sampler('euler', n, x_init)
        ref = _fine_reference(x_init, s0, s_stop)   # reference per endpoint
        e[n] = np.abs(x - ref).max()
    assert e[24] < e[12] * 0.75, e


def test_dpm2_matches_heun_class_accuracy(mixture_setup):
    """dpm2 (midpoint) and heun (trapezoid) are both order 2 — errors must
    be within an order of magnitude of each other."""
    x_init, s0 = mixture_setup
    xh, s_stop = _run_k_sampler('heun', 12, x_init)
    xd, _ = _run_k_sampler('dpm2', 12, x_init)
    ref = _fine_reference(x_init, s0, s_stop)
    eh, ed = np.abs(xh - ref).max(), np.abs(xd - ref).max()
    assert ed < 10 * eh and eh < 10 * ed, (eh, ed)


@pytest.mark.parametrize('sname', ['dpm++_2m_sde', 'dpm++_sde'])
def test_sde_sampler_noise_is_applied(sname):
    """SDE samplers with eta=1 must actually inject noise (different seeds
    -> different results), and eta=0 must be deterministic."""
    sched = NoiseSchedule.make()
    outs = {}
    for eta in (1.0, 0.0):
        res = []
        for seed in (0, 1):
            sampler = make_sampler(sname, sched, 10, eta=eta)
            x = jnp.full((4,), 2.0)
            st = sampler.init_state(x.shape)
            rng = jax.random.PRNGKey(seed)
            for i in range(sampler.num_steps):
                s_i = sampler.sigmas[i]
                eps = (x - _oracle_x0(x, s_i)) / jnp.maximum(s_i, 1e-12)
                rng, sub = jax.random.split(rng)
                x, st, _ = sampler.step(st, eps, jnp.asarray(i), x, sub)
            res.append(np.asarray(x))
        outs[eta] = res
    assert not np.allclose(outs[1.0][0], outs[1.0][1])
    np.testing.assert_allclose(outs[0.0][0], outs[0.0][1])


def test_dpmpp_sde_marginal_statistics():
    """Noise-statistics check for the singlestep SDE: for data = point mass
    at 0 the exact denoiser is x0=0 and the k-space marginal at every eval
    sigma is N(0, sigma^2). With eta=1 the sampler's two-stage ancestral
    splits must preserve exactly that marginal at every plan position —
    wrong sd/su tables (e.g. midpointing toward sigma_down, or reusing one
    noise draw across stages) break it."""
    sched = NoiseSchedule.make()
    sampler = make_sampler('dpm++_sde', sched, 8, eta=1.0)
    n = 8192
    rng = jax.random.PRNGKey(0)
    rng, r0 = jax.random.split(rng)
    sig = np.asarray(sampler.sigmas)
    x = jax.random.normal(r0, (n,)) * sig[0]
    st = sampler.init_state((n,))
    for i in range(sampler.num_steps):
        np.testing.assert_allclose(float(jnp.std(x)), sig[i], rtol=0.06,
                                   err_msg=f'plan position {i}')
        eps = x / jnp.maximum(sig[i], 1e-12)      # x0 oracle = 0
        rng, sub = jax.random.split(rng)
        x, st, _ = sampler.step(st, eps, jnp.asarray(i), x, sub)
    assert float(jnp.abs(x).max()) < 1e-3         # collapses onto the data


def test_dpmpp_sde_eta0_matches_2s_structure():
    """eta=0 dpm++_sde is the deterministic 2S midpoint method — it must
    beat Euler on the mixture oracle (covered parametrically above) and its
    transfer grid must hit the nominal sigmas (sd2 == s_next)."""
    sched = NoiseSchedule.make()
    s = make_sampler('dpm++_sde', sched, 10, eta=0.0)
    sig_nominal = np.asarray(make_sampler('euler', sched, 10).sigmas)
    np.testing.assert_allclose(np.asarray(s._s_to), sig_nominal[1:], rtol=1e-6)
    assert np.asarray(s._s_up).max() == 0.0
    assert np.asarray(s._su1_np).max() == 0.0


def test_visualizer_singlestep_maps_to_eta0():
    from hcpdiff_tpu.infer.visualizer import Visualizer
    assert Visualizer._SCHED_MAP['dpmsolversinglestep'] == 'dpm++_sde'


def test_dpmpp_sde_brownian_weights_unit_variance():
    """The Brownian-bridge combination must keep the stage-1 noise a UNIT
    normal: bw0^2 + bw1^2 == 1 on every noisy transfer (the final transfer
    is noise-free; its weights are arbitrary)."""
    sched = NoiseSchedule.make()
    s = make_sampler('dpm++_sde', sched, 8, eta=1.0)
    bw0, bw1 = np.asarray(s._bw0), np.asarray(s._bw1)
    su2 = np.asarray(s._s_up)
    noisy = su2 > 0
    assert noisy.any()
    np.testing.assert_allclose((bw0 ** 2 + bw1 ** 2)[noisy], 1.0, rtol=1e-6)
    # both stages genuinely contribute on interior transfers
    assert (bw0[noisy] > 0).all() and (bw1[noisy] > 0).all()


def test_dpmpp_sde_brownian_stage1_reuses_stage0_draw():
    """Brownian mode (default): the stage-1 noise of transfer k is the
    normalized Brownian increment over [s_next, s_k] = bridge of stage 0's
    OWN draw z0 (carried through the scan state) with a fresh z1. Verified
    against an independent-draws run: the two stage-1 outputs must differ
    by exactly su2 * ((bw0*z0 + bw1*z1) - z1)."""
    sched = NoiseSchedule.make()
    shape = (2, 8, 8, 4)
    s_br = make_sampler('dpm++_sde', sched, 6, eta=1.0)
    s_ind = make_sampler('dpm++_sde', sched, 6, eta=1.0, brownian=False)
    assert s_br.brownian and not s_ind.brownian

    x = jax.random.normal(jax.random.PRNGKey(0), shape) * s_br.sigmas[0]
    eps = jnp.zeros(shape)
    rng0, rng1 = jax.random.PRNGKey(10), jax.random.PRNGKey(11)

    # stage 0 (plan index 0) — identical in both modes, stores z0 in state
    st = s_br.init_state(shape)
    x1_br, st_br, _ = s_br.step(st, eps, jnp.asarray(0), x, rng0)
    x1_ind, st_ind, _ = s_ind.step(st, eps, jnp.asarray(0), x, rng0)
    np.testing.assert_allclose(np.asarray(x1_br), np.asarray(x1_ind))
    r0a, _ = jax.random.split(rng0)
    z0 = jax.random.normal(r0a, shape)
    np.testing.assert_allclose(np.asarray(st_br[2]), np.asarray(z0))

    # stage 1 (plan index 1) from the same carried state
    x2_br, st2_br, _ = s_br.step(st_br, eps, jnp.asarray(1), x1_br, rng1)
    x2_ind, _, _ = s_ind.step(st_ind, eps, jnp.asarray(1), x1_ind, rng1)
    _, r1b = jax.random.split(rng1)
    z1 = jax.random.normal(r1b, shape)
    su2 = float(s_br._s_up[0])
    assert su2 > 0
    expected_delta = su2 * ((float(s_br._bw0[0]) * z0
                             + float(s_br._bw1[0]) * z1) - z1)
    np.testing.assert_allclose(np.asarray(x2_br - x2_ind),
                               np.asarray(expected_delta),
                               rtol=1e-5, atol=1e-6)
    # the carried z0 survives the stage-1 step unchanged
    np.testing.assert_allclose(np.asarray(st2_br[2]), np.asarray(z0))


def test_lms_coefficients_sum_to_dt():
    """LMS Lagrange-basis integrals must sum to sigma_{i+1} - sigma_i
    (partition of unity) — catches integration bugs."""
    sched = NoiseSchedule.make()
    s = make_sampler('lms', sched, 15)
    sig = np.asarray(s.sigmas)
    coeffs = np.asarray(s._coeffs)
    for i in range(15):
        np.testing.assert_allclose(coeffs[i].sum(), sig[i + 1] - sig[i],
                                   rtol=1e-4, atol=1e-7)


def test_scheduler_map_covers_new_samplers():
    from hcpdiff_tpu.infer.visualizer import Visualizer
    m = Visualizer._SCHED_MAP
    assert m['dpmsolversde'] == 'dpm++_sde'
    assert m['heun'] == 'heun'
    assert m['lms'] == 'lms'
    assert m['deis'] == 'deis'
    assert m['kdpm2ancestral'] == 'dpm2_a'
    assert list(m).index('kdpm2ancestral') < list(m).index('kdpm2')
    assert list(m).index('dpmsolversde') < list(m).index('dpmsolvermultistep')
