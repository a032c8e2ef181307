"""Inference samplers — pure-jnp steppers usable inside ``lax.scan``.

Stand-ins for the diffusers schedulers the reference's pipelines call
(hcpdiff/utils/pipe_hook.py:118-153 denoise loop). Each sampler exposes:

- ``timesteps(num_steps)``      -> int32 [N] descending timesteps
- ``init_state(num_steps, shape)`` -> fixed-shape pytree carried through scan
- ``scale_model_input(state, x, i)``
- ``step(state, model_out, i, x, rng)`` -> (x_prev, new_state, x0_pred)

``x0_pred`` feeds the preview callback (reference pipe_hook x0 approx at
utils/pipe_hook.py:140-146). All math fp32; timestep indexing is static
under scan (gathers from precomputed tables).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import NoiseSchedule


def _bshape(x: jnp.ndarray, ndim: int) -> jnp.ndarray:
    return x.reshape((-1,) + (1,) * (ndim - 1))


class BaseSampler:
    """Common: schedule + prediction-type conversion."""

    def __init__(self, schedule: NoiseSchedule, num_steps: int,
                 spacing: str = 'leading', steps_offset: int = 1):
        self.schedule = schedule
        self.num_steps = int(num_steps)
        T = schedule.num_train_timesteps
        if spacing == 'leading':
            ratio = T // self.num_steps
            ts = (np.arange(0, self.num_steps) * ratio).round()[::-1].astype(np.int64)
            ts = ts + steps_offset
        elif spacing == 'linspace':
            ts = np.linspace(0, T - 1, self.num_steps).round()[::-1].astype(np.int64)
        elif spacing == 'trailing':
            ts = np.arange(T, 0, -T / self.num_steps).round().astype(np.int64) - 1
        else:
            raise ValueError(spacing)
        self.timesteps = jnp.asarray(np.clip(ts, 0, T - 1), jnp.int32)
        # t -> t_prev stride. Stored at construction so partial loops
        # (img2img slicing timesteps/num_steps) keep the full-schedule
        # stride, matching diffusers' set_timesteps-then-slice behavior.
        self.step_stride = max(T // self.num_steps, 1)

    # helpers
    def _acp(self, t: jnp.ndarray) -> jnp.ndarray:
        return self.schedule.alphas_cumprod[t]

    def _x0_eps(self, model_out, x, t):
        return self.schedule.pred_to_x0_eps(model_out, x, t)

    def init_state(self, shape: Tuple[int, ...]) -> Any:
        return ()

    def scale_model_input(self, state: Any, x: jnp.ndarray, i: jnp.ndarray) -> jnp.ndarray:
        return x

    @property
    def init_noise_sigma(self) -> float:
        return 1.0


class DDIMSampler(BaseSampler):
    """eta=0 deterministic DDIM."""

    def __init__(self, schedule, num_steps, eta: float = 0.0, **kw):
        super().__init__(schedule, num_steps, **kw)
        self.eta = float(eta)

    def step(self, state, model_out, i, x, rng=None):
        t = self.timesteps[i]
        t_prev = t - self.step_stride
        a_t = self._acp(t)
        a_prev = jnp.where(t_prev >= 0, self._acp(jnp.maximum(t_prev, 0)), 1.0)
        x0, eps = self._x0_eps(model_out, x, t)
        nd = x.ndim
        if self.eta > 0.0 and rng is not None:
            var = (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
            sigma = self.eta * jnp.sqrt(var)
            noise = jax.random.normal(rng, x.shape)
        else:
            sigma = jnp.zeros(())
            noise = jnp.zeros_like(x)
        dir_xt = jnp.sqrt(jnp.maximum(1 - a_prev - sigma ** 2, 0.0)) * eps
        x_prev = (_bshape(jnp.sqrt(a_prev)[None], nd) * x0 + dir_xt
                  + _bshape(sigma[None], nd) * noise)
        return x_prev, state, x0


class DDPMSampler(BaseSampler):
    def step(self, state, model_out, i, x, rng):
        t = self.timesteps[i]
        t_prev = t - self.step_stride
        a_t = self._acp(t)
        a_prev = jnp.where(t_prev >= 0, self._acp(jnp.maximum(t_prev, 0)), 1.0)
        x0, eps = self._x0_eps(model_out, x, t)
        cur_alpha = a_t / a_prev
        cur_beta = 1 - cur_alpha
        coef_x0 = jnp.sqrt(a_prev) * cur_beta / (1 - a_t)
        coef_xt = jnp.sqrt(cur_alpha) * (1 - a_prev) / (1 - a_t)
        mean = _bshape(coef_x0[None], x.ndim) * x0 + _bshape(coef_xt[None], x.ndim) * x
        var = jnp.clip((1 - a_prev) / (1 - a_t) * cur_beta, 1e-20)
        noise = jax.random.normal(rng, x.shape)
        has_noise = (t_prev >= 0).astype(jnp.float32)
        x_prev = mean + has_noise * _bshape(jnp.sqrt(var)[None], x.ndim) * noise
        return x_prev, state, x0


class KSamplerBase(BaseSampler):
    """Karras-style sigma-space samplers (Euler, Euler-a, DPM++)."""

    def __init__(self, schedule, num_steps, use_karras_sigmas: bool = False,
                 spacing: str = 'linspace', **kw):
        super().__init__(schedule, num_steps, spacing=spacing, **kw)
        acp = np.asarray(schedule.alphas_cumprod)
        all_sigmas = np.sqrt((1 - acp) / acp)
        ts = np.asarray(self.timesteps)
        if use_karras_sigmas:
            smin, smax = all_sigmas[ts[-1]], all_sigmas[ts[0]]
            rho = 7.0
            ramp = np.linspace(0, 1, self.num_steps)
            sig = (smax ** (1 / rho) + ramp * (smin ** (1 / rho) - smax ** (1 / rho))) ** rho
            # map back to nearest timesteps (diffusers _sigma_to_t log-interp)
            log_all = np.log(all_sigmas)
            new_ts = np.interp(np.log(sig), log_all, np.arange(len(all_sigmas))).round()
            self.timesteps = jnp.asarray(new_ts.astype(np.int64), jnp.int32)
            sigmas = sig
        else:
            sigmas = all_sigmas[ts]
        self.sigmas = jnp.asarray(np.append(sigmas, 0.0), jnp.float32)
        self._init_noise_sigma = float(np.sqrt(float(sigmas[0]) ** 2 + 1))

    @property
    def init_noise_sigma(self) -> float:
        return self._init_noise_sigma

    def scale_model_input(self, state, x, i):
        s = self.sigmas[i]
        return x / jnp.sqrt(s ** 2 + 1)

    def _to_x0(self, model_out, x, i):
        """x here is in k-space (x = x0 + sigma*eps)."""
        s = _bshape(self.sigmas[i][None], x.ndim)
        pt = self.schedule.prediction_type
        if pt == 'epsilon':
            return x - s * model_out
        if pt == 'v_prediction':
            # v-pred in sigma space: x0 = x/(s^2+1) - v*s/sqrt(s^2+1)
            return x / (s ** 2 + 1) - model_out * s / jnp.sqrt(s ** 2 + 1)
        if pt == 'sample':
            return model_out
        raise ValueError(pt)


class EulerSampler(KSamplerBase):
    def step(self, state, model_out, i, x, rng=None):
        s, s_next = self.sigmas[i], self.sigmas[i + 1]
        x0 = self._to_x0(model_out, x, i)
        d = (x - x0) / jnp.maximum(s, 1e-12)
        x_prev = x + d * (s_next - s)
        return x_prev, state, x0


class EulerAncestralSampler(KSamplerBase):
    def step(self, state, model_out, i, x, rng=None):
        s, s_next = self.sigmas[i], self.sigmas[i + 1]
        x0 = self._to_x0(model_out, x, i)
        sigma_up = jnp.sqrt(jnp.maximum(
            s_next ** 2 * (s ** 2 - s_next ** 2) / jnp.maximum(s ** 2, 1e-12), 0.0))
        sigma_down = jnp.sqrt(jnp.maximum(s_next ** 2 - sigma_up ** 2, 0.0))
        d = (x - x0) / jnp.maximum(s, 1e-12)
        x_prev = x + d * (sigma_down - s)
        if rng is not None:
            x_prev = x_prev + jax.random.normal(rng, x.shape) * sigma_up
        return x_prev, state, x0


class DPMpp2MSampler(KSamplerBase):
    """DPM-Solver++ 2M (multistep, deterministic)."""

    def init_state(self, shape):
        return jnp.zeros(shape, jnp.float32)  # previous x0 prediction

    def step(self, state, model_out, i, x, rng=None):
        s, s_next = self.sigmas[i], self.sigmas[i + 1]
        x0 = self._to_x0(model_out, x, i)
        t_fn = lambda sig: -jnp.log(jnp.maximum(sig, 1e-12))
        t, t_next = t_fn(s), t_fn(s_next)
        h = t_next - t
        is_first = (i == 0)
        s_prev = self.sigmas[jnp.maximum(i - 1, 0)]
        h_last = t - t_fn(s_prev)
        r = h_last / jnp.where(h == 0, 1.0, h)
        denom = jnp.where(is_first | (r == 0), 1.0, 2.0 * r)
        x0_mix = jnp.where(is_first, x0,
                           (1 + 1 / denom) * x0 - (1 / denom) * state)
        ratio = s_next / jnp.maximum(s, 1e-12)
        x_prev = ratio * x - jnp.expm1(-h) * x0_mix
        x_prev = jnp.where(s_next == 0, x0, x_prev)
        return x_prev, x0, x0


class PNDMSampler(BaseSampler):
    """PNDM: PLMS multistep, with an optional Runge-Kutta (prk) warmup.

    Default (``prk_warmup=False``) is the skip-prk variant SD pipelines use
    (plms from step 0 with an eps history). With ``prk_warmup=True`` the
    first 3 transfers run the pseudo-RK4 warmup from the PNDM paper
    (arXiv 2202.09778): each RK transfer is 4 sequential model evals, which
    map onto 4 scan iterations (one eval each) — ``num_steps`` grows by 9
    and ``timesteps`` becomes the staggered eval plan."""

    # stage codes: 0..3 = RK stages k1..k4, 4 = plms
    def __init__(self, schedule, num_steps, prk_warmup: bool = False, **kw):
        super().__init__(schedule, num_steps, **kw)
        self.prk_warmup = bool(prk_warmup) and self.num_steps >= 4
        if self.prk_warmup:
            ts = np.asarray(self.timesteps)
            d = self.step_stride
            eval_t, base_t, stage = [], [], []
            for k in range(3):
                t = int(ts[k])
                mid, tp = max(t - d // 2, 0), max(t - d, 0)
                eval_t += [t, mid, mid, tp]
                base_t += [t] * 4
                stage += [0, 1, 2, 3]
            for k in range(3, len(ts)):
                eval_t.append(int(ts[k]))
                base_t.append(int(ts[k]))
                stage.append(4)
            self.timesteps = jnp.asarray(eval_t, jnp.int32)
            self._base_t = jnp.asarray(base_t, jnp.int32)
            self._stage = jnp.asarray(stage, jnp.int32)
            self.num_steps = len(eval_t)

    def init_state(self, shape):
        ets = jnp.zeros((4,) + shape, jnp.float32)
        count = jnp.zeros((), jnp.int32)
        if not self.prk_warmup:
            return (ets, count)
        # + RK carry: cur_sample (x at the transfer base), accumulated eps
        return (ets, count, jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32))

    def _transfer(self, x, eps, t, t_prev):
        """PNDM transfer formula (the paper's phi)."""
        a_t, a_prev = self._acp(t), self._acp(t_prev)
        return (jnp.sqrt(a_prev / a_t) * x
                - (a_prev - a_t) * eps
                / (jnp.sqrt(a_t) * (jnp.sqrt((1 - a_prev) * a_t)
                                    + jnp.sqrt((1 - a_t) * a_prev))))

    def _plms_eps(self, ets, count):
        e1 = ets[-1]
        e2 = (3 * ets[-1] - ets[-2]) / 2
        e3 = (23 * ets[-1] - 16 * ets[-2] + 5 * ets[-3]) / 12
        e4 = (55 * ets[-1] - 59 * ets[-2] + 37 * ets[-3] - 9 * ets[-4]) / 24
        return jnp.where(count >= 4, e4, jnp.where(count == 3, e3,
                         jnp.where(count == 2, e2, e1)))

    def step(self, state, model_out, i, x, rng=None):
        t_eval = self.timesteps[i]
        _, eps = self._x0_eps(model_out, x, t_eval)
        x0 = (x - jnp.sqrt(1 - self._acp(t_eval)) * eps) \
            / jnp.sqrt(self._acp(t_eval))

        if not self.prk_warmup:
            ets, count = state
            t_prev = jnp.maximum(t_eval - self.step_stride, 0)
            ets = jnp.concatenate([ets[1:], eps[None]], axis=0)
            count = count + 1
            x_prev = self._transfer(x, self._plms_eps(ets, count),
                                    t_eval, t_prev)
            return x_prev, (ets, count), x0

        ets, count, cur_sample, cur_mo = state
        stage = self._stage[i]
        t = self._base_t[i]
        d = self.step_stride
        mid = jnp.maximum(t - d // 2, 0)
        tp = jnp.maximum(t - d, 0)

        is_plms = stage == 4
        # plms path
        ets_p = jnp.concatenate([ets[1:], eps[None]], axis=0)
        count_p = count + 1
        x_plms = self._transfer(x, self._plms_eps(ets_p, count_p), t, tp)
        # RK stages (k1: record base sample + push e1; k4: combine)
        cur_sample_n = jnp.where(stage == 0, x, cur_sample)
        cur_mo_n = jnp.where(stage == 0, eps / 6,
                    jnp.where((stage == 1) | (stage == 2), cur_mo + eps / 3,
                              cur_mo))
        ets_rk = jnp.where(stage == 0,
                           jnp.concatenate([ets[1:], eps[None]], axis=0), ets)
        tgt = jnp.where(stage <= 1, mid, tp)
        eps_rk = jnp.where(stage == 3, cur_mo_n + eps / 6, eps)
        x_rk = self._transfer(cur_sample_n, eps_rk, t, tgt)
        count_rk = jnp.where(stage == 0, count + 1, count)

        x_next = jnp.where(is_plms, x_plms, x_rk)
        new_state = (jnp.where(is_plms, ets_p, ets_rk),
                     jnp.where(is_plms, count_p, count_rk),
                     cur_sample_n,
                     jnp.where(stage == 3, jnp.zeros_like(cur_mo), cur_mo_n))
        return x_next, new_state, x0


class UniPCSampler(KSamplerBase):
    """UniPC (arXiv 2302.04867), bh2 variant, order 2, data prediction —
    matching diffusers' UniPCMultistepScheduler defaults the reference
    exposes through its pipelines.

    One model eval per step: at step i the corrector first refines the
    CURRENT sample (predicted at step i-1) using the fresh model output,
    then the bh2 predictor advances to sigma_{i+1}. Runs in our k-space
    (x = x0 + sigma*eps, alpha==1), where lambda = -log(sigma)."""

    def init_state(self, shape):
        # (last_sample x_{i-1}, m0 = x0-pred @ x_{i-1}, m1 = x0-pred @ x_{i-2})
        z = jnp.zeros(shape, jnp.float32)
        return (z, z, z)

    def _lam(self, i):
        return -jnp.log(jnp.maximum(self.sigmas[i], 1e-12))

    def step(self, state, model_out, i, x, rng=None):
        last_sample, m0_last, m1_last = state
        m_t = self._to_x0(model_out, x, i)

        lam_im1 = self._lam(jnp.maximum(i - 1, 0))
        lam_im2 = self._lam(jnp.maximum(i - 2, 0))
        lam_i = self._lam(i)
        lam_ip1 = self._lam(i + 1)

        # ---- corrector (uni_c) on the current sample: s0 = i-1, t = i ----
        h_c = lam_i - lam_im1
        hh_c = -h_c
        phi1_c = jnp.expm1(hh_c)
        b_h_c = phi1_c                               # bh2
        # b coefficients: b0 = phi_2/B_h, b1 = 2*phi_3/B_h (phi_k recursions)
        phi2 = phi1_c / hh_c - 1.0
        phi3 = phi2 / hh_c - 0.5
        b0 = phi2 / b_h_c
        b1 = 2.0 * phi3 / b_h_c
        r1_c = (lam_im2 - lam_im1) / jnp.where(h_c == 0, 1.0, h_c)
        # order-2 solve of [[1,1],[r1,1]] rhos = [b0,b1]
        denom = jnp.where(r1_c == 1.0, 1.0, 1.0 - r1_c)
        rho0_2 = (b0 - b1) / denom
        rho1_2 = b0 - rho0_2
        # order-1 corrector: rhos = [0.5]
        use_o2 = i >= 2
        rho_d1 = jnp.where(use_o2, rho0_2, 0.0)      # weight on prev D1
        rho_dt = jnp.where(use_o2, rho1_2, 0.5)      # weight on D1_t
        d1_prev = (m1_last - m0_last) / jnp.where(r1_c == 0, 1.0, r1_c)
        d1_t = m_t - m0_last
        ratio_c = self.sigmas[i] / jnp.maximum(self.sigmas[jnp.maximum(i - 1, 0)], 1e-12)
        x_corr = (ratio_c * last_sample - phi1_c * m0_last
                  - b_h_c * (rho_d1 * d1_prev + rho_dt * d1_t))
        x_cur = jnp.where(i >= 1, x_corr, x)

        # ---- predictor (uni_p) to sigma_{i+1}: s0 = i, t = i+1 ----
        s_next = self.sigmas[i + 1]
        h_p = lam_ip1 - lam_i
        hh_p = -h_p
        phi1_p = jnp.expm1(hh_p)
        r1_p = (lam_im1 - lam_i) / jnp.where(h_p == 0, 1.0, h_p)
        d1_p = (m0_last - m_t) / jnp.where(r1_p == 0, 1.0, r1_p)
        ratio_p = s_next / jnp.maximum(self.sigmas[i], 1e-12)
        x_pred = ratio_p * x_cur - phi1_p * m_t
        # bh2 order-2 predictor: rhos_p = [0.5] on D1
        x_pred = x_pred - jnp.where(i >= 1, 0.5, 0.0) * phi1_p * d1_p
        x_next = jnp.where(s_next == 0, m_t, x_pred)

        return x_next, (x_cur, m_t, m0_last), m_t


SAMPLERS = {
    'ddim': DDIMSampler,
    'ddpm': DDPMSampler,
    'euler': EulerSampler,
    'euler_a': EulerAncestralSampler,
    'dpm++_2m': DPMpp2MSampler,
    'dpmpp_2m': DPMpp2MSampler,
    'pndm': PNDMSampler,
    'unipc': UniPCSampler,
}


def make_sampler(name: str, schedule: NoiseSchedule, num_steps: int, **kw):
    return SAMPLERS[name.lower()](schedule, num_steps, **kw)
