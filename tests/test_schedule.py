"""Golden-value tests for the DDPM schedule against the closed-form formulas
the reference implements (reference: diffusion_model/scheduler/
linear_noise_scheduler.py:16-21,37-61,63-116)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weatherconverter_tpu.diffusion import schedule as S


@pytest.fixture(scope="module")
def sched():
    return S.linear_schedule(1000, 1e-4, 0.02)


def test_tables_match_closed_form(sched):
    betas = np.linspace(1e-4, 0.02, 1000, dtype=np.float32)
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    np.testing.assert_allclose(sched.betas, betas, rtol=1e-6)
    np.testing.assert_allclose(sched.alphas, alphas, rtol=1e-6)
    np.testing.assert_allclose(sched.alpha_cum_prod, acp, rtol=1e-5)
    np.testing.assert_allclose(sched.sqrt_alpha_cum_prod, np.sqrt(acp), rtol=1e-5)
    np.testing.assert_allclose(sched.one_minus_cum_prod, 1 - acp, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(
        sched.sqrt_one_minus_alpha_cum_prod, np.sqrt(1 - acp), rtol=1e-4, atol=1e-7
    )


def test_q_sample_formula(sched, rng):
    k1, k2 = jax.random.split(rng)
    x0 = jax.random.normal(k1, (4, 8, 8, 3))
    noise = jax.random.normal(k2, (4, 8, 8, 3))
    t = jnp.array([0, 10, 500, 999])
    out = S.q_sample(sched, x0, noise, t)
    acp = np.cumprod(1 - np.linspace(1e-4, 0.02, 1000, dtype=np.float32))
    for i, ti in enumerate([0, 10, 500, 999]):
        expected = np.sqrt(acp[ti]) * np.asarray(x0[i]) + np.sqrt(
            1 - acp[ti]
        ) * np.asarray(noise[i])
        np.testing.assert_allclose(out[i], expected, rtol=1e-4, atol=1e-5)


def test_q_sample_scalar_t(sched, rng):
    x0 = jax.random.normal(rng, (2, 8, 8, 3))
    noise = jnp.ones_like(x0)
    out_scalar = S.q_sample(sched, x0, noise, jnp.asarray(5))
    out_batch = S.q_sample(sched, x0, noise, jnp.array([5, 5]))
    np.testing.assert_allclose(out_scalar, out_batch, rtol=1e-6)


def test_posterior_mean_formula(sched, rng):
    k1, k2 = jax.random.split(rng)
    xt = jax.random.normal(k1, (1, 8, 8, 3))
    eps = jax.random.normal(k2, (1, 8, 8, 3))
    t = 100
    mean = S.posterior_mean(sched, xt, eps, jnp.asarray(t))
    betas = np.linspace(1e-4, 0.02, 1000, dtype=np.float32)
    acp = np.cumprod(1 - betas)
    expected = (
        np.asarray(xt) - betas[t] * np.asarray(eps) / np.sqrt(1 - acp[t])
    ) / np.sqrt(1 - betas[t])
    np.testing.assert_allclose(mean, expected, rtol=1e-4, atol=1e-5)


def test_posterior_sigma_two_variants(sched):
    betas = np.linspace(1e-4, 0.02, 1000, dtype=np.float32)
    acp = np.cumprod(1 - betas)
    t = 100
    # 'posterior' variant (reference scheduler:107-108)
    var_post = (1 - acp[t - 1]) / (1 - acp[t]) * betas[t]
    np.testing.assert_allclose(
        S.posterior_sigma(sched, jnp.asarray(t), "posterior"),
        np.sqrt(var_post),
        rtol=1e-4,
    )
    # 'beta' variant (reference scheduler:74)
    np.testing.assert_allclose(
        S.posterior_sigma(sched, jnp.asarray(t), "beta"), np.sqrt(betas[t]), rtol=1e-5
    )


def test_sigma_zero_at_t0(sched):
    assert float(S.posterior_sigma(sched, jnp.asarray(0), "posterior")) == 0.0


def test_ddpm_step_t0_is_mean_only(sched, rng):
    xt = jax.random.normal(rng, (1, 8, 8, 3))
    eps = jnp.zeros_like(xt)
    noise = jnp.ones_like(xt) * 100.0  # would blow up if applied at t=0
    out = S.ddpm_step(sched, xt, eps, jnp.asarray(0), noise)
    mean = S.posterior_mean(sched, xt, eps, jnp.asarray(0))
    np.testing.assert_allclose(out, mean, rtol=1e-6)


def test_predict_x0_roundtrip(sched, rng):
    """q_sample then predict_x0 with the true noise must recover x0."""
    k1, k2 = jax.random.split(rng)
    x0 = jax.random.normal(k1, (2, 8, 8, 3))
    noise = jax.random.normal(k2, (2, 8, 8, 3))
    t = jnp.array([123, 857])
    xt = S.q_sample(sched, x0, noise, t)
    rec = S.predict_x0(sched, xt, noise, t)
    np.testing.assert_allclose(rec, x0, rtol=1e-2, atol=1e-3)


def test_cosine_schedule_monotone():
    cs = S.cosine_schedule(1000)
    acp = np.asarray(cs.alpha_cum_prod)
    assert np.all(np.diff(acp) < 0)
    assert acp[0] < 1.0 and acp[-1] > 0.0
    assert np.all(np.asarray(cs.betas) <= 0.999)


def test_make_schedule_dispatch():
    assert S.make_schedule("linear", 10).num_timesteps == 10
    assert S.make_schedule("cosine", 10).num_timesteps == 10
    with pytest.raises(ValueError):
        S.make_schedule("nope")
