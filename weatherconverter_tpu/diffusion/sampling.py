"""Scan-based DDPM/DDIM samplers.

TPU-first re-design of the reference's Python sampling loops
(reference: diffusion_model/sample_ddpm.py:23-53 and
sample_integrated.py:40-67): instead of 1000 sequential Python iterations each
launching its own kernels, the whole reverse process is ONE `jax.lax.scan`
with the UNet inlined in the body, compiled once by XLA. The per-step
randomness is threaded functionally by pre-splitting the key inside the scan.

Three samplers:
  - `ddpm_sample`        : ancestral sampling with the modern eps-UNet and the
                           true-posterior variance (reference sample_ddpm.py:35-44).
  - `ddpm_sample_legacy` : the `sample_integrated.py` variant — legacy UNet
                           conditioned on one_minus_cum_prod[t] (reference
                           sample_integrated.py:57-64) and sigma^2 = beta_t
                           (scheduler `sample_prev_timestep2`, reference
                           linear_noise_scheduler.py:63-77).
  - `ddim_sample`        : framework extension — strided deterministic/eta
                           sampling (Song et al. 2020) for fast inference.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from weatherconverter_tpu.diffusion.schedule import (
    NoiseSchedule,
    VarianceMode,
    _bcast,
    ddpm_step,
    posterior_mean,
    posterior_sigma,
    predict_x0,
)

# apply_fn(xt, t) -> eps_hat; params already closed over (e.g. via
# functools.partial(model.apply, {'params': params})).
ApplyFn = Callable[[jax.Array, jax.Array], jax.Array]


def strided_taus(T: int, S: int) -> tuple[jax.Array, jax.Array]:
    """(taus, tau_prev) for an S-step subsequence of [0, T): taus descend
    from T-1 (the chain STARTS at the top of the span — linspace alone
    yields [0] at S=1, which would treat the N(0, I) init as x_{t=0})."""
    if S >= 2:
        taus = jnp.linspace(0, T - 1, S).round().astype(jnp.int32)[::-1]
    else:
        taus = jnp.array([T - 1], dtype=jnp.int32)
    tau_prev = jnp.concatenate([taus[1:], jnp.array([-1], dtype=jnp.int32)])
    return taus, tau_prev


def strided_posterior_step(
    sched: NoiseSchedule,
    xt: jax.Array,
    eps: jax.Array,
    t: jax.Array,
    tp: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    """Generalized ancestral transition q(x_tp | x_t, x0-pred) for a strided
    subsequence (eta=1 DDIM variance, no x0 clipping — reduces exactly to
    the DDPM posterior step at stride 1). ONE implementation shared by the
    strided samplers; the math is subtle enough that hand-copies drift."""
    acp_t = sched.alpha_cum_prod[t]
    acp_p = jnp.where(tp >= 0, sched.alpha_cum_prod[jnp.maximum(tp, 0)], 1.0)
    x0 = predict_x0(sched, xt, eps, t)
    sigma2 = (1 - acp_p) / (1 - acp_t) * jnp.maximum(1 - acp_t / acp_p, 0.0)
    mean = (
        jnp.sqrt(acp_p) * x0
        + jnp.sqrt(jnp.maximum(1.0 - acp_p - sigma2, 0.0)) * eps
    )
    return mean + jnp.where(tp >= 0, jnp.sqrt(sigma2) * noise, 0.0)


def ddpm_sample(
    apply_fn: ApplyFn,
    sched: NoiseSchedule,
    key: jax.Array,
    shape: Sequence[int],
    num_steps: int | None = None,
    mode: VarianceMode = "posterior",
    return_trajectory_every: int = 0,
) -> jax.Array:
    """Full ancestral reverse process as one lax.scan.

    Equivalent to `sample` (reference: sample_ddpm.py:23-53): start from
    xt ~ N(0, I), run T steps of eps-prediction + posterior step, adding
    sigma*z for t > 0. Returns x0 in [-1, 1] (UNCLAMPED — the reference
    clamps at the PIL boundary, sample_ddpm.py:47; use `to_uint8` for that).

    `num_steps < T` runs a STRIDED subsequence with the generalized
    ancestral transition q(x_{tau_prev} | x_tau, x0-pred) — NOT a truncated
    chain: starting N(0, I) at timestep num_steps-1 of the full schedule
    would be the wrong marginal (caught in review), so the taus stride the
    full [0, T) span exactly like ddim_sample's grid (eta=1 semantics,
    without the DDIM path's x0 clipping, matching this sampler's math at
    stride 1).

    With `return_trajectory_every = k > 0`, also returns every k-th
    intermediate (the reference's visualizer strips, visualizer.py:74-109).
    Frames are written into a (ceil(S/k), ...) buffer INSIDE the scan — the
    previous stack-everything-then-stride materialized the full S-step
    trajectory (1.5 GiB at T=1000, B=8, 128px).
    """
    T = sched.T
    S = num_steps if num_steps is not None else T
    key, init_key = jax.random.split(key)
    xt = jax.random.normal(init_key, tuple(shape), dtype=jnp.float32)

    strided = S != T
    if strided and mode != "posterior":
        raise ValueError(
            f"strided ddpm_sample (num_steps={S} != T={T}) defines its own "
            f"subsequence posterior; variance mode {mode!r} is only "
            "meaningful at stride 1"
        )
    if strided:
        taus, tau_prev = strided_taus(T, S)
    else:
        taus = jnp.arange(T - 1, -1, -1)
        tau_prev = taus - 1

    k = int(return_trajectory_every)
    n_frames = -(-S // k) if k else 0
    buf0 = jnp.zeros((n_frames,) + tuple(shape), jnp.float32) if k else None

    def step_fn(xt, eps, t, tp, noise):
        if not strided:
            return ddpm_step(sched, xt, eps, t, noise, mode=mode)
        return strided_posterior_step(sched, xt, eps, t, tp, noise)

    def body(carry, scan_in):
        t, tp, i = scan_in
        if k:
            xt, key, buf = carry
        else:
            xt, key = carry
        key, nkey = jax.random.split(key)
        eps = apply_fn(xt, jnp.full((xt.shape[0],), t, dtype=jnp.int32))
        noise = jax.random.normal(nkey, xt.shape, dtype=xt.dtype)
        xt = step_fn(xt, eps, t, tp, noise)
        if not k:
            return (xt, key), None
        idx = i // k
        cur = jax.lax.dynamic_index_in_dim(buf, idx, 0, keepdims=False)
        buf = jax.lax.dynamic_update_index_in_dim(
            buf, jnp.where(i % k == 0, xt, cur), idx, 0
        )
        return (xt, key, buf), None

    scan_in = (taus, tau_prev, jnp.arange(S))
    if k:
        (x0, _, traj), _ = jax.lax.scan(body, (xt, key, buf0), scan_in)
        return x0, traj
    (x0, _), _ = jax.lax.scan(body, (xt, key), scan_in)
    return x0


def ddpm_sample_legacy(
    apply_fn: ApplyFn,
    sched: NoiseSchedule,
    key: jax.Array,
    shape: Sequence[int],
    num_steps: int | None = None,
) -> jax.Array:
    """Legacy-checkpoint sampling loop (reference: sample_integrated.py:40-67):
    the model is conditioned on the scalar one_minus_cum_prod[t] (fed as an
    image-plane embedding inside LegacyUNet) and the reverse step uses
    sigma^2 = beta_t (`sample_prev_timestep2`).

    `num_steps < T` strides the full span like `ddpm_sample` (the
    alpha-bar-plane conditioning is valid at any t; the transition uses the
    generalized subsequence posterior since beta-variance has no strided
    form) — NOT a truncated chain, which would start N(0, I) at the wrong
    marginal."""
    T = sched.T
    S = num_steps if num_steps is not None else T
    key, init_key = jax.random.split(key)
    xt = jax.random.normal(init_key, tuple(shape), dtype=jnp.float32)
    strided = S != T
    if strided:
        taus, tau_prev = strided_taus(T, S)
    else:
        taus = jnp.arange(T - 1, -1, -1)
        tau_prev = taus - 1

    def body(carry, tpair):
        xt, key = carry
        t, tp = tpair
        key, nkey = jax.random.split(key)
        cond = jnp.full((xt.shape[0],), sched.one_minus_cum_prod[t], dtype=jnp.float32)
        eps = apply_fn(xt, cond)
        noise = jax.random.normal(nkey, xt.shape, dtype=xt.dtype)
        if not strided:
            xt = ddpm_step(sched, xt, eps, t, noise, mode="beta")
        else:
            xt = strided_posterior_step(sched, xt, eps, t, tp, noise)
        return (xt, key), None

    (x0, _), _ = jax.lax.scan(body, (xt, key), (taus, tau_prev))
    return x0


def ddim_sample(
    apply_fn: ApplyFn,
    sched: NoiseSchedule,
    key: jax.Array,
    shape: Sequence[int],
    num_steps: int = 50,
    eta: float = 0.0,
) -> jax.Array:
    """Strided DDIM sampler (framework extension; no reference equivalent).

    tau is an even stride over [0, T); eta = 0 gives the deterministic DDIM
    ODE, eta = 1 recovers ancestral-DDPM-like variance on the subsequence.
    """
    T = sched.T
    taus, tau_prev = strided_taus(T, num_steps)
    key, init_key = jax.random.split(key)
    xt = jax.random.normal(init_key, tuple(shape), dtype=jnp.float32)

    def body(carry, tpair):
        xt, key = carry
        t, tp = tpair
        key, nkey = jax.random.split(key)
        eps = apply_fn(xt, jnp.full((xt.shape[0],), t, dtype=jnp.int32))
        acp_t = sched.alpha_cum_prod[t]
        acp_p = jnp.where(tp >= 0, sched.alpha_cum_prod[jnp.maximum(tp, 0)], 1.0)
        x0 = predict_x0(sched, xt, eps, t)
        x0 = jnp.clip(x0, -1.0, 1.0)
        sigma = eta * jnp.sqrt((1 - acp_p) / (1 - acp_t)) * jnp.sqrt(1 - acp_t / acp_p)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - acp_p - sigma**2, 0.0)) * eps
        noise = jax.random.normal(nkey, xt.shape, dtype=xt.dtype)
        xt = jnp.sqrt(acp_p) * x0 + dir_xt + sigma * noise
        return (xt, key), None

    (x0, _), _ = jax.lax.scan(body, (xt, key), (taus, tau_prev))
    return x0


def dpm_2m_update(
    sched: NoiseSchedule,
    xt: jax.Array,
    x0: jax.Array,
    x0_prev: jax.Array,
    h_prev: jax.Array,
    t: jax.Array,
    tp: jax.Array,
    use_2m: jax.Array,
):
    """ONE DPM-Solver++(2M) transition x_t -> x_tp in data-prediction form
    (Lu et al. 2022, arXiv:2211.01095), shared by the unconditional sampler
    and the guided translate path — the solver math is subtle enough that
    hand-copies drift (same rule as strided_posterior_step).

    logSNR lambda = log(alpha/sigma), h = lambda_tp - lambda_t:
        D    = (1 + 1/(2r)) x0 - 1/(2r) x0_prev,    r = h_prev / h
        x_tp = (sigma_tp/sigma_t) x_t - alpha_tp (e^{-h} - 1) D
    `use_2m=False` (first step, or terminal step where sigma_tp = 0 drives
    h -> inf) gives the first-order update (= DDIM eta=0), the standard
    `lower_order_final` rule. Returns (x_tp, h) with h finite only where
    used (a clamped stand-in at the terminal step — callers carry it into
    the NEXT step's r, and there is no next step after terminal)."""
    acp_t = sched.alpha_cum_prod[t]
    acp_p = jnp.where(tp >= 0, sched.alpha_cum_prod[jnp.maximum(tp, 0)], 1.0)
    a_t, s_t = jnp.sqrt(acp_t), jnp.sqrt(1.0 - acp_t)
    a_p = jnp.sqrt(acp_p)
    s_p = jnp.sqrt(jnp.maximum(1.0 - acp_p, 0.0))

    lam_t = 0.5 * jnp.log(acp_t / (1.0 - acp_t))
    lam_p = 0.5 * jnp.log(acp_p / jnp.maximum(1.0 - acp_p, 1e-20))
    h = lam_p - lam_t
    r = h_prev / jnp.where(h == 0.0, 1.0, h)

    coef = jnp.where(use_2m, 1.0 / (2.0 * jnp.where(r == 0.0, 1.0, r)), 0.0)
    D = (1.0 + coef) * x0 - coef * x0_prev

    e_mh = (s_p * a_t) / (a_p * s_t)  # e^{-h}; exactly 0 at the last step
    x_next = (s_p / s_t) * xt - a_p * (e_mh - 1.0) * D
    return x_next, h


def dpm_solver_pp_2m_sample(
    apply_fn: ApplyFn,
    sched: NoiseSchedule,
    key: jax.Array,
    shape: Sequence[int],
    num_steps: int = 20,
) -> jax.Array:
    """DPM-Solver++(2M) (Lu et al. 2022, arXiv:2211.01095) — deterministic
    second-order multistep sampler in data-prediction form (framework
    extension; PAPERS.md). One UNet eval per step like DDIM, but the
    half-logSNR-extrapolated x0 ("2M" term) cancels the first-order
    discretization error, so 10-25 steps reach quality DDIM needs 2-5x the
    steps for (convergence-order test in tests/test_sampling.py).

    Update (logSNR lambda = log(alpha/sigma), h = lambda_next - lambda_t):
        D    = (1 + 1/(2r)) x0_t - 1/(2r) x0_prev,   r = h_prev / h
        x_tp = (sigma_tp/sigma_t) x_t - alpha_tp (e^{-h} - 1) D
    First step and the final (sigma_tp = 0) step fall back to first order
    (= DDIM eta=0), the standard `lower_order_final` rule that keeps the
    extrapolation bounded as h -> inf at the terminal step."""
    T = sched.T
    taus, tau_prev = strided_taus(T, num_steps)
    key, init_key = jax.random.split(key)
    xt = jax.random.normal(init_key, tuple(shape), dtype=jnp.float32)

    def body(carry, tpair):
        xt, x0_prev, h_prev, idx = carry
        t, tp = tpair
        eps = apply_fn(xt, jnp.full((xt.shape[0],), t, dtype=jnp.int32))
        x0 = jnp.clip(predict_x0(sched, xt, eps, t), -1.0, 1.0)
        use_2m = (idx > 0) & (tp >= 0)
        x_next, h = dpm_2m_update(sched, xt, x0, x0_prev, h_prev, t, tp, use_2m)
        return (x_next, x0, h, idx + 1), None

    init = (xt, jnp.zeros_like(xt), jnp.float32(1.0), jnp.int32(0))
    (x0, _, _, _), _ = jax.lax.scan(body, init, (taus, tau_prev))
    return x0


def partial_forward_then_reverse(
    apply_fn: ApplyFn,
    sched: NoiseSchedule,
    key: jax.Array,
    x0: jax.Array,
    start_t: int,
    mode: VarianceMode = "posterior",
) -> jax.Array:
    """q-sample x0 to a fixed t, then run the reverse chain from there — the
    skeleton of `sample_with_sgg` without guidance (reference:
    translation.py:63-74 forward-diffuses the input to a random t < N then
    denoises). `start_t` is static (the reference draws it on the host)."""
    key, nkey = jax.random.split(key)
    noise = jax.random.normal(nkey, x0.shape, dtype=x0.dtype)
    sac = sched.sqrt_alpha_cum_prod[start_t]
    soc = sched.sqrt_one_minus_alpha_cum_prod[start_t]
    xt = sac * x0 + soc * noise
    ts = jnp.arange(start_t, -1, -1)

    def body(carry, t):
        xt, key = carry
        key, nkey = jax.random.split(key)
        eps = apply_fn(xt, jnp.full((xt.shape[0],), t, dtype=jnp.int32))
        z = jax.random.normal(nkey, xt.shape, dtype=xt.dtype)
        xt = ddpm_step(sched, xt, eps, t, z, mode=mode)
        return (xt, key), None

    (out, _), _ = jax.lax.scan(body, (xt, key), ts)
    return out


def to_uint8(x: jax.Array) -> jax.Array:
    """[-1,1] -> uint8 [0,255] (the reference's clamp + (x+1)/2 rescale,
    sample_ddpm.py:47-48)."""
    x = jnp.clip(x, -1.0, 1.0)
    return ((x + 1.0) * 127.5).astype(jnp.uint8)
