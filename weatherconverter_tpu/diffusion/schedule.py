"""DDPM noise schedules as pure, jit-friendly table + function pairs.

TPU-first re-design of the reference `LinearNoiseScheduler`
(reference: diffusion_model/scheduler/linear_noise_scheduler.py:6-116):
instead of a stateful class with device-pinned buffers, the schedule is an
immutable pytree of precomputed tables, and the forward/reverse operations are
pure functions of (tables, arrays, t). This makes them trivially traceable
inside `jax.lax.scan` sampling loops and shardable under pjit.

Numerical parity targets (all verified by tests/test_schedule.py):
  - betas = linspace(beta_start, beta_end, T)           (ref scheduler:16)
  - alphas, alpha_cum_prod, sqrt_*, one_minus_*          (ref scheduler:17-21)
  - q_sample == add_noise/add_noise2                     (ref scheduler:30-61)
  - posterior mean                                        (ref scheduler:96-100)
  - variance 'posterior': (1-acp[t-1])/(1-acp[t]) * beta (ref scheduler:107-108)
  - variance 'beta':      beta[t]                        (ref scheduler:74)
"""

from __future__ import annotations

import math
from typing import Literal

import jax
import jax.numpy as jnp
from flax import struct

VarianceMode = Literal["posterior", "beta"]


@struct.dataclass
class NoiseSchedule:
    """Precomputed DDPM tables (all shape (T,), float32)."""

    betas: jax.Array
    alphas: jax.Array
    alpha_cum_prod: jax.Array
    sqrt_alpha_cum_prod: jax.Array
    one_minus_cum_prod: jax.Array
    sqrt_one_minus_alpha_cum_prod: jax.Array
    num_timesteps: int = struct.field(pytree_node=False)

    @property
    def T(self) -> int:
        return self.num_timesteps


def linear_schedule(
    num_timesteps: int = 1000, beta_start: float = 1e-4, beta_end: float = 0.02
) -> NoiseSchedule:
    """Linear beta schedule (reference: linear_noise_scheduler.py:16-21)."""
    betas = jnp.linspace(beta_start, beta_end, num_timesteps, dtype=jnp.float32)
    return _from_betas(betas, num_timesteps)


def cosine_schedule(num_timesteps: int = 1000, s: float = 0.008) -> NoiseSchedule:
    """Cosine schedule (Nichol & Dhariwal 2021) — framework extension; the
    BASELINE.json north-star names "linear/cosine beta" as required schedules."""
    steps = jnp.arange(num_timesteps + 1, dtype=jnp.float32)
    f = jnp.cos(((steps / num_timesteps) + s) / (1 + s) * math.pi / 2) ** 2
    acp = f / f[0]
    betas = jnp.clip(1.0 - acp[1:] / acp[:-1], 0.0, 0.999)
    return _from_betas(betas, num_timesteps)


def make_schedule(
    schedule: str = "linear",
    num_timesteps: int = 1000,
    beta_start: float = 1e-4,
    beta_end: float = 0.02,
) -> NoiseSchedule:
    if schedule == "linear":
        return linear_schedule(num_timesteps, beta_start, beta_end)
    if schedule == "cosine":
        return cosine_schedule(num_timesteps)
    raise ValueError(f"unknown schedule {schedule!r}")


def _from_betas(betas: jax.Array, num_timesteps: int) -> NoiseSchedule:
    alphas = 1.0 - betas
    acp = jnp.cumprod(alphas)
    return NoiseSchedule(
        betas=betas,
        alphas=alphas,
        alpha_cum_prod=acp,
        sqrt_alpha_cum_prod=jnp.sqrt(acp),
        one_minus_cum_prod=1.0 - acp,
        sqrt_one_minus_alpha_cum_prod=jnp.sqrt(1.0 - acp),
        num_timesteps=num_timesteps,
    )


def _bcast(table_at_t: jax.Array, like: jax.Array) -> jax.Array:
    """Reshape a (B,) or scalar gather to broadcast over `like`'s trailing dims
    (the reference's unsqueeze loop, linear_noise_scheduler.py:52-55)."""
    if table_at_t.ndim == 0:
        return table_at_t
    return table_at_t.reshape(table_at_t.shape + (1,) * (like.ndim - table_at_t.ndim))


def q_sample(
    sched: NoiseSchedule, x0: jax.Array, noise: jax.Array, t: jax.Array
) -> jax.Array:
    """Forward q(x_t | x_0) sample.

    Equivalent to both `add_noise` (reference scheduler:37-61) and `add_noise2`
    (reference scheduler:30-35) — they compute the same expression.
    `t` may be a scalar or a (B,) batch of per-example timesteps.
    """
    sac = _bcast(sched.sqrt_alpha_cum_prod[t], x0)
    soc = _bcast(sched.sqrt_one_minus_alpha_cum_prod[t], x0)
    return sac * x0 + soc * noise


def predict_x0(
    sched: NoiseSchedule, xt: jax.Array, eps: jax.Array, t: jax.Array
) -> jax.Array:
    """x0 estimate from the eps-prediction (reference scheduler:89-92,
    commented out there; provided because samplers/metrics want it)."""
    soc = _bcast(sched.sqrt_one_minus_alpha_cum_prod[t], xt)
    sac = _bcast(sched.sqrt_alpha_cum_prod[t], xt)
    return (xt - soc * eps) / sac


def posterior_mean(
    sched: NoiseSchedule, xt: jax.Array, eps: jax.Array, t: jax.Array
) -> jax.Array:
    """mu(x_t, eps, t) = (x_t - beta_t/sqrt(1-acp_t) * eps) / sqrt(alpha_t)
    (reference scheduler:96-100, identical in sample_prev_timestep2:68-69)."""
    beta = _bcast(sched.betas[t], xt)
    soc = _bcast(sched.sqrt_one_minus_alpha_cum_prod[t], xt)
    alpha = _bcast(sched.alphas[t], xt)
    mean = xt - beta * eps / soc
    return mean / jnp.sqrt(alpha)


def posterior_sigma(
    sched: NoiseSchedule, t: jax.Array, mode: VarianceMode = "posterior"
) -> jax.Array:
    """Reverse-step standard deviation.

    mode='posterior': true posterior variance (1-acp[t-1])/(1-acp[t]) * beta_t
      (reference scheduler:107-108; used by sample_ddpm.py / translation.py).
    mode='beta': variance = beta_t (reference scheduler:74; used by
      sample_integrated.py via sample_prev_timestep2).

    At t == 0 the reference returns mean only (scheduler:102-103) — callers
    use `ddpm_step` which zeroes the noise there. For mode='posterior' at t=0
    the acp[t-1] gather would wrap; we guard it to 0 variance.
    """
    t = jnp.asarray(t)
    if mode == "beta":
        var = sched.betas[t]
    else:
        prev = sched.alpha_cum_prod[jnp.maximum(t - 1, 0)]
        var = (1.0 - prev) / (1.0 - sched.alpha_cum_prod[t]) * sched.betas[t]
        var = jnp.where(t > 0, var, 0.0)
    return jnp.sqrt(var)


def ddpm_step(
    sched: NoiseSchedule,
    xt: jax.Array,
    eps: jax.Array,
    t: jax.Array,
    noise: jax.Array,
    mode: VarianceMode = "posterior",
) -> jax.Array:
    """One ancestral reverse step: x_{t-1} = mu + sigma * z, with z suppressed
    at t == 0 (reference: sample_ddpm.py:41-44). `t` scalar (as in the
    reference's python loop) or per-example (B,)."""
    mean = posterior_mean(sched, xt, eps, t)
    sigma = _bcast(posterior_sigma(sched, t, mode), xt)
    use_noise = _bcast(jnp.asarray(t) > 0, xt)
    return mean + jnp.where(use_noise, sigma * noise, 0.0)
