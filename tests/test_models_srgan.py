"""Swift-SRGAN generator/discriminator tests (reference: srgan_model/models.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weatherconverter_tpu.models.srgan import Discriminator, Generator, PReLU

torch = pytest.importorskip("torch")


def test_generator_4x_shape_and_range():
    model = Generator(num_channels=16, num_blocks=2, upscale_factor=4)
    x = jnp.zeros((1, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3)))
    assert out.shape == (1, 64, 64, 3)
    # (tanh + 1) / 2 output range (reference: srgan_model/models.py:92)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_generator_2x_shape():
    model = Generator(num_channels=8, num_blocks=1, upscale_factor=2)
    x = jnp.zeros((2, 8, 8, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 16, 16, 3)


def test_discriminator_shape():
    model = Discriminator(features=(8, 8, 16, 16))
    x = jnp.zeros((2, 48, 48, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 1)
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0


def test_prelu_matches_torch():
    x = jnp.linspace(-2, 2, 12).reshape(1, 2, 2, 3)
    prelu = PReLU(3)
    variables = prelu.init(jax.random.PRNGKey(0), x)
    variables = {"params": {"alpha": jnp.array([0.1, 0.25, 0.5])}}
    out = prelu.apply(variables, x)
    tp = torch.nn.PReLU(num_parameters=3)
    with torch.no_grad():
        tp.weight.copy_(torch.tensor([0.1, 0.25, 0.5]))
    tx = torch.from_numpy(np.asarray(x.transpose(0, 3, 1, 2)))
    ref = tp(tx).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_separable_conv_matches_torch():
    """SeparableConv == torch depthwise+pointwise with converted weights
    (reference: srgan_model/models.py:5-21)."""
    from weatherconverter_tpu.models.srgan import SeparableConv

    cin, cout, k = 4, 6, 3
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, cin))
    mod = SeparableConv(cout, k, 1, 1)
    variables = mod.init(jax.random.PRNGKey(1), x)

    tdw = torch.nn.Conv2d(cin, cin, k, 1, 1, groups=cin)
    tpw = torch.nn.Conv2d(cin, cout, 1)
    # copy jax params into torch: flax depthwise kernel (k, k, 1, cin)
    dw = np.asarray(variables["params"]["depthwise"]["kernel"])  # (k,k,1,cin)
    pw = np.asarray(variables["params"]["pointwise"]["kernel"])  # (1,1,cin,cout)
    with torch.no_grad():
        tdw.weight.copy_(torch.from_numpy(dw.transpose(3, 2, 0, 1)))  # (cin,1,k,k)
        tdw.bias.copy_(torch.from_numpy(np.asarray(variables["params"]["depthwise"]["bias"])))
        tpw.weight.copy_(torch.from_numpy(pw.transpose(3, 2, 0, 1)))
        tpw.bias.copy_(torch.from_numpy(np.asarray(variables["params"]["pointwise"]["bias"])))
    out = mod.apply(variables, x)
    tx = torch.from_numpy(np.asarray(x.transpose(0, 3, 1, 2)))
    ref = tpw(tdw(tx)).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_separable_conv_shift_packed_matches_factorized():
    """The shift-packed dense tail (wide-in/narrow-out big-kernel path,
    srgan.py SeparableConv._shift_packed) == factorized depthwise+pointwise
    from the SAME params; and non-divisible shapes fall back cleanly."""
    from weatherconverter_tpu.models.srgan import SeparableConv, _TAIL_PACK

    cin, cout, k = 64, 3, 9
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 24, cin))
    assert x.shape[1] % _TAIL_PACK[0] == 0 and x.shape[2] % _TAIL_PACK[1] == 0
    mod = SeparableConv(cout, k, 1, k // 2)
    variables = mod.init(jax.random.PRNGKey(1), x)
    out = mod.apply(variables, x)  # shift-packed branch (cin>=32, cout<=8)

    p = variables["params"]
    h = jax.lax.conv_general_dilated(
        x, p["depthwise"]["kernel"], (1, 1), ((4, 4), (4, 4)),
        feature_group_count=cin, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["depthwise"]["bias"]
    ref = jax.lax.conv_general_dilated(
        h, p["pointwise"]["kernel"], (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["pointwise"]["bias"]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    # ragged spatial shape -> factorized fallback, same answer path
    x2 = jax.random.normal(jax.random.PRNGKey(2), (1, 15, 17, cin))
    v2 = mod.init(jax.random.PRNGKey(1), x2)
    assert mod.apply(v2, x2).shape == (1, 15, 17, cout)
