"""Cross-parametrization parity for the headline sampler (DPM++ 2M).

Our DPMpp2MSampler works in k-space (x = x0 + sigma_k * eps, k-diffusion
style). The independent check below implements DPM-Solver++(2M) in the
variance-preserving parametrization used by diffusers'
DPMSolverMultistepScheduler (algorithm_type='dpmsolver++', solver_order=2,
lower_order_final) — x_vp = alpha_t x0 + sigma_t eps, lambda = log(alpha/
sigma) — written directly from the DPM-Solver++ paper's multistep update
(eq. 4.4), NOT from our sampler. The two parametrizations relate by
x_vp = alpha_t * x_k with identical model inputs (x_k/sqrt(sk^2+1) ==
x_vp), so per-step latents must agree to fp tolerance.

diffusers itself is not installed in this image (BASELINE.md); this is the
strongest available independent check of the update rule, complementing
the mixture-oracle ODE-order harness in tests/test_samplers_round3.py.
Reference counterpart: hcpdiff reaches DPMSolverMultistepScheduler via
_target_ (reference visualizer.py:99-110, cfgs/infer/*.yaml).
"""
import numpy as np

import jax
import jax.numpy as jnp

from hcpdiff_tpu.diffusion.samplers import make_sampler
from hcpdiff_tpu.diffusion.schedules import NoiseSchedule


def _vp_dpmpp_2m(eps_fn, x_vp, timesteps, acp, steps):
    """Independent numpy DPM-Solver++(2M), VP parametrization.

    eps_fn(x_model_input, t) -> eps prediction; x_vp: [.., D] initial
    noisy sample (vp-space); timesteps: int array [N] descending; acp:
    alphas_cumprod table [T]. Returns the list of per-step vp latents.
    """
    alpha = np.sqrt(acp)                       # alpha_t
    sigma = np.sqrt(1.0 - acp)                 # sigma_t (vp)
    lam = np.log(alpha) - np.log(sigma)        # lambda_t
    xs = []
    x0_prev = None
    h_prev = None
    for i in range(steps):
        t = int(timesteps[i])
        a_t, s_t, l_t = alpha[t], sigma[t], lam[t]
        # model input: diffusers scales by 1/sqrt(sigma_k^2+1) == alpha_t
        eps = eps_fn(x_vp, t)
        x0 = (x_vp - s_t * eps) / a_t
        if i + 1 < steps:
            tn = int(timesteps[i + 1])
            a_n, s_n, l_n = alpha[tn], sigma[tn], lam[tn]
            h = l_n - l_t
            if x0_prev is None:
                D = x0
            else:
                r = h_prev / h
                D = (1 + 1 / (2 * r)) * x0 - (1 / (2 * r)) * x0_prev
            x_vp = (s_n / s_t) * x_vp - a_n * np.expm1(-h) * D
            h_prev = h
        else:
            x_vp = x0        # final step: sigma_next == 0
        x0_prev = x0
        xs.append(x_vp.copy())
    return xs


def test_dpmpp_2m_matches_independent_vp_formulation():
    schedule = NoiseSchedule.make()
    steps = 12
    sampler = make_sampler('dpm++_2m', schedule, steps)
    acp = np.asarray(schedule.alphas_cumprod, np.float64)
    ts = np.asarray(sampler.timesteps)
    alpha = np.sqrt(acp)

    rng = np.random.default_rng(0)
    A = rng.normal(size=(8, 8)) * 0.3

    def eps_fn(x_model, t):
        # deterministic nonlinear pseudo-model shared by both sides
        return np.tanh(x_model @ A) + 0.01 * t / 1000.0

    # ---- ours (k-space) ----
    x_k = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32) \
        * sampler.init_noise_sigma
    st = sampler.init_state(x_k.shape)
    ours_vp = []
    for i in range(steps):
        xin = sampler.scale_model_input(st, x_k, jnp.asarray(i))
        eps = jnp.asarray(eps_fn(np.asarray(xin, np.float64),
                                 int(ts[i])), jnp.float32)
        x_k, st, _ = sampler.step(st, eps, jnp.asarray(i), x_k)
        # convert to vp space at the NEXT node (alpha of t_{i+1}; final
        # step lands at x0 where alpha := 1)
        a_next = alpha[int(ts[i + 1])] if i + 1 < steps else 1.0
        ours_vp.append(np.asarray(x_k, np.float64) * a_next)

    # ---- independent (vp-space): same initial sample, x_vp = alpha_t0*x_k0
    rng2 = np.random.default_rng(0)
    _ = rng2.normal(size=(8, 8))                 # consume A draw
    x_k0 = rng2.normal(size=(4, 8)) * sampler.init_noise_sigma
    x_vp = x_k0 * alpha[int(ts[0])]
    ref_vp = _vp_dpmpp_2m(eps_fn, x_vp, ts, acp, steps)

    for i, (a, b) in enumerate(zip(ours_vp, ref_vp)):
        np.testing.assert_allclose(a, b, atol=2e-4,
                                   err_msg=f'step {i}')


def test_dpmpp_2m_karras_matches_independent_vp_formulation():
    """Same check with karras sigma spacing (timesteps remapped by the
    log-interp; the vp side consumes the remapped table so the update
    rule is what's under test)."""
    schedule = NoiseSchedule.make()
    steps = 10
    sampler = make_sampler('dpm++_2m', schedule, steps,
                           use_karras_sigmas=True)
    acp = np.asarray(schedule.alphas_cumprod, np.float64)
    ts = np.asarray(sampler.timesteps)
    alpha = np.sqrt(acp)

    rng = np.random.default_rng(1)
    A = rng.normal(size=(6, 6)) * 0.25

    def eps_fn(x_model, t):
        return np.tanh(x_model @ A) - 0.02

    x_k0 = rng.normal(size=(3, 6))
    # NOTE: with karras sigmas our sampler's sigma table is the karras ramp,
    # not exactly sigma_k(ts) (ts are the nearest-rounded timesteps). The
    # vp reference must therefore run on the SAME sigma grid: build acp'
    # from the sampler's sigmas (acp = 1/(1+sk^2)) at synthetic indices.
    sig_k = np.asarray(sampler.sigmas, np.float64)[:steps]

    x_k = jnp.asarray(x_k0, jnp.float32) * sampler.init_noise_sigma
    st = sampler.init_state(x_k.shape)
    ours_vp = []
    for i in range(steps):
        xin = sampler.scale_model_input(st, x_k, jnp.asarray(i))
        eps = jnp.asarray(eps_fn(np.asarray(xin, np.float64), int(ts[i])),
                          jnp.float32)
        x_k, st, _ = sampler.step(st, eps, jnp.asarray(i), x_k)
        a_next = (1.0 / np.sqrt(1.0 + sig_k[i + 1] ** 2)
                  if i + 1 < steps else 1.0)
        ours_vp.append(np.asarray(x_k, np.float64) * a_next)

    alpha_g = 1.0 / np.sqrt(1.0 + sig_k ** 2)
    x_vp = (x_k0 * sampler.init_noise_sigma) * alpha_g[0]
    ref_vp = _vp_dpmpp_2m_grid(eps_fn, x_vp, ts, sig_k, steps)
    for i, (a, b) in enumerate(zip(ours_vp, ref_vp)):
        np.testing.assert_allclose(a, b, atol=2e-4, err_msg=f'step {i}')


def _vp_dpmpp_2m_grid(eps_fn, x_vp, model_ts, sig_k, steps):
    """VP DPM++ 2M on an explicit k-sigma grid (for karras spacing)."""
    alpha = 1.0 / np.sqrt(1.0 + sig_k ** 2)
    sigma = sig_k * alpha
    lam = np.log(alpha) - np.log(sigma)
    xs = []
    x0_prev = None
    h_prev = None
    for i in range(steps):
        a_t, s_t, l_t = alpha[i], sigma[i], lam[i]
        eps = eps_fn(x_vp, int(model_ts[i]))
        x0 = (x_vp - s_t * eps) / a_t
        if i + 1 < steps and sig_k[i + 1] > 0:
            a_n = alpha[i + 1]
            s_n, l_n = sigma[i + 1], lam[i + 1]
            h = l_n - l_t
            if x0_prev is None:
                D = x0
            else:
                r = h_prev / h
                D = (1 + 1 / (2 * r)) * x0 - (1 / (2 * r)) * x0_prev
            x_vp = (s_n / s_t) * x_vp - a_n * np.expm1(-h) * D
            h_prev = h
        else:
            x_vp = x0
        x0_prev = x0
        xs.append(x_vp.copy())
    return xs


# ---------------------------------------------------------------- UniPC ----

def _vp_unipc_bh2(eps_fn, x_vp, ts, acp, steps):
    """Independent numpy UniPC (bh2, order 2, data prediction, corrector
    enabled), VP parametrization — written from the UniPC paper's B(h)
    tables / diffusers UniPCMultistepScheduler semantics (model_outputs
    list + one corrector per step), NOT from our sampler. Final step uses
    the same x0 clamp our sampler (and k-diffusion) applies at sigma=0.

    Returns per-step vp latents."""
    alpha = np.sqrt(acp)
    sigma = np.sqrt(1.0 - acp)
    lam = np.log(alpha) - np.log(sigma)
    xs = []
    m_list = []          # x0 predictions at visited nodes
    t_list = []
    last_sample = None
    for i in range(steps):
        t = int(ts[i])
        a_t, s_t, l_t = alpha[t], sigma[t], lam[t]
        eps = eps_fn(x_vp, t)
        m_t = (x_vp - s_t * eps) / a_t

        # ---- corrector on the current sample (uni_c, order<=2) ----
        if last_sample is not None:
            s0 = t_list[-1]
            a0, sg0, l0 = alpha[s0], sigma[s0], lam[s0]
            h = l_t - l0
            hh = -h
            phi1 = np.expm1(hh)
            B_h = phi1                       # bh2
            m0 = m_list[-1]
            d1_t = m_t - m0
            if len(m_list) >= 2:
                s1 = t_list[-2]
                r1 = (lam[s1] - l0) / h
                d1_prev = (m_list[-2] - m0) / r1
                phi2 = phi1 / hh - 1.0
                phi3 = phi2 / hh - 0.5
                b0 = phi2 / B_h
                b1 = 2.0 * phi3 / B_h
                # solve [[1,1],[r1,1]] rhos = [b0,b1]
                rho0 = (b0 - b1) / (1.0 - r1)
                rho1 = b0 - rho0
                corr = rho0 * d1_prev + rho1 * d1_t
            else:
                corr = 0.5 * d1_t
            x_vp = ((s_t / sg0) * last_sample - a_t * phi1 * m0
                    - a_t * B_h * corr)
            # recompute x0 at the corrected sample? diffusers does NOT:
            # the corrector only refines the sample; m_t stays.

        m_list.append(m_t)
        t_list.append(t)
        last_sample = x_vp

        # ---- predictor to the next node (uni_p, order<=2) ----
        if i + 1 < steps:
            tn = int(ts[i + 1])
            a_n, s_n, l_n = alpha[tn], sigma[tn], lam[tn]
            h = l_n - l_t
            hh = -h
            phi1 = np.expm1(hh)
            x_pred = (s_n / s_t) * x_vp - a_n * phi1 * m_t
            if len(m_list) >= 2:
                s1 = t_list[-2]
                r1 = (lam[s1] - l_t) / h
                d1 = (m_list[-2] - m_t) / r1
                x_pred = x_pred - a_n * phi1 * 0.5 * d1   # bh2 order-2
            x_vp = x_pred
        else:
            x_vp = m_t      # sigma -> 0 clamp (matches our sampler)
        xs.append(x_vp.copy())
    return xs


def test_unipc_matches_independent_vp_formulation():
    schedule = NoiseSchedule.make()
    steps = 12
    sampler = make_sampler('unipc', schedule, steps)
    acp = np.asarray(schedule.alphas_cumprod, np.float64)
    ts = np.asarray(sampler.timesteps)
    alpha = np.sqrt(acp)

    rng = np.random.default_rng(2)
    A = rng.normal(size=(8, 8)) * 0.3

    def eps_fn(x_model, t):
        return np.tanh(x_model @ A) + 0.01 * t / 1000.0

    x_k0 = rng.normal(size=(4, 8))
    x_k = jnp.asarray(x_k0, jnp.float32) * sampler.init_noise_sigma
    st = sampler.init_state(x_k.shape)
    ours_vp = []
    for i in range(steps):
        xin = sampler.scale_model_input(st, x_k, jnp.asarray(i))
        eps = jnp.asarray(eps_fn(np.asarray(xin, np.float64), int(ts[i])),
                          jnp.float32)
        x_k, st, _ = sampler.step(st, eps, jnp.asarray(i), x_k)
        a_next = alpha[int(ts[i + 1])] if i + 1 < steps else 1.0
        ours_vp.append(np.asarray(x_k, np.float64) * a_next)

    x_vp = (x_k0 * sampler.init_noise_sigma) * alpha[int(ts[0])]
    ref_vp = _vp_unipc_bh2(eps_fn, x_vp, ts, acp, steps)
    for i, (a, b) in enumerate(zip(ours_vp, ref_vp)):
        np.testing.assert_allclose(a, b, atol=3e-4, err_msg=f'step {i}')
