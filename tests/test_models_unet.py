"""Shape/behavior tests for the diffusion UNets (tiny configs; the production
config [64,128,256,512,768]@128px is exercised on TPU by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weatherconverter_tpu.core.config import UnetModelConfig
from weatherconverter_tpu.models.unet import Unet
from weatherconverter_tpu.models.unet_legacy import LegacyUNet


def tiny_cfg(**kw):
    base = dict(
        im_channels=3,
        im_size=32,
        down_channels=[16, 32, 48, 64],
        mid_channels=[64, 64, 48],
        down_sample=[True, True, False],
        time_emb_dim=32,
        num_down_layers=1,
        num_mid_layers=1,
        num_up_layers=1,
        num_heads=4,
        attn_resolutions=[8, 16],
    )
    base.update(kw)
    return UnetModelConfig(**base)


@pytest.fixture(scope="module")
def unet_and_params():
    cfg = tiny_cfg()
    model = Unet(config=cfg, fused=False)
    x = jnp.zeros((2, 32, 32, 3))
    t = jnp.array([0, 10])
    params = model.init(jax.random.PRNGKey(0), x, t)
    return model, params


def test_unet_output_shape(unet_and_params):
    model, params = unet_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out = model.apply(params, x, jnp.array([5, 999]))
    assert out.shape == (2, 32, 32, 3)
    assert out.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(out)))


def test_unet_scalar_t_broadcast(unet_and_params):
    """The reference sampler passes a scalar step index
    (reference: sample_ddpm.py:39)."""
    model, params = unet_and_params
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    out_scalar = model.apply(params, x, jnp.asarray(7))
    out_batch = model.apply(params, x, jnp.array([7, 7]))
    np.testing.assert_allclose(out_scalar, out_batch, rtol=1e-5, atol=1e-5)


def test_unet_time_dependence(unet_and_params):
    model, params = unet_and_params
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 3))
    o1 = model.apply(params, x, jnp.asarray(0))
    o2 = model.apply(params, x, jnp.asarray(500))
    assert float(jnp.max(jnp.abs(o1 - o2))) > 1e-6


def test_unet_fused_matches_unfused():
    """The Pallas-fused path (interpret mode on CPU) must be numerically
    equivalent to the jnp path."""
    cfg = tiny_cfg(down_channels=[8, 16, 24, 32], mid_channels=[32, 32, 24])
    x = jnp.linspace(-1, 1, 2 * 16 * 16 * 3).reshape(2, 16, 16, 3)
    cfg = tiny_cfg(
        im_size=16,
        down_channels=[8, 16, 24, 32],
        mid_channels=[32, 32, 24],
        attn_resolutions=[4, 8],
    )
    m_plain = Unet(config=cfg, fused=False)
    m_fused = Unet(config=cfg, fused=True)
    params = m_plain.init(jax.random.PRNGKey(0), x, jnp.array([1, 2]))
    o1 = m_plain.apply(params, x, jnp.array([1, 2]))
    o2 = m_fused.apply(params, x, jnp.array([1, 2]))
    np.testing.assert_allclose(o1, o2, rtol=1e-3, atol=1e-4)


def test_unet_jit_and_grad(unet_and_params):
    model, params = unet_and_params
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 3))
    t = jnp.array([3, 4])

    @jax.jit
    def loss_fn(p):
        out = model.apply(p, x, t)
        return jnp.mean(out**2)

    g = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(leaf))) for leaf in flat)
    assert any(float(jnp.max(jnp.abs(leaf))) > 0 for leaf in flat)


def test_legacy_unet_shapes():
    model = LegacyUNet(image_size=32)
    x = jnp.zeros((2, 32, 32, 3))
    t = jnp.array([0.5, 0.1]).reshape(2, 1, 1, 1)
    variables = model.init(jax.random.PRNGKey(0), x, t)
    assert "batch_stats" in variables  # legacy blocks use BatchNorm
    out = model.apply(variables, x, t)
    assert out.shape == (2, 32, 32, 3)
    assert model.requires_alpha_hat_timestep


def test_legacy_unet_alpha_conditioning_changes_output():
    model = LegacyUNet(image_size=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.ones((1, 1, 1, 1)))
    o1 = model.apply(variables, x, jnp.full((1, 1, 1, 1), 0.9))
    o2 = model.apply(variables, x, jnp.full((1, 1, 1, 1), 0.1))
    assert float(jnp.max(jnp.abs(o1 - o2))) > 1e-6
