"""Torch-checkpoint bridge parity tests.

These instantiate the REFERENCE torch modules (imported from
/root/reference, CPU, random weights), convert their state dicts with
compat/torch_import, and assert output parity against the flax models on the
same inputs — the strongest possible check that both the converter and the
re-designed architectures are numerically faithful.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

REF = "/root/reference"


@pytest.fixture(scope="module", autouse=True)
def ref_on_path():
    sys.path.insert(0, REF)
    # reference hardcodes .cuda() in Unet.forward (unet_base.py:461); neutralize
    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    yield
    torch.Tensor.cuda = orig
    sys.path.remove(REF)


def tiny_ref_model_config():
    from diffusion_model.config.models import ModelConfig

    return ModelConfig(
        name="ddpm",
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


def test_unet_import_output_parity():
    from diffusion_model.models.unet_base import Unet as TorchUnet

    from weatherconverter_tpu.compat.torch_import import convert_unet
    from weatherconverter_tpu.core.config import UnetModelConfig
    from weatherconverter_tpu.models.unet import Unet

    torch.manual_seed(0)
    ref_cfg = tiny_ref_model_config()
    tmodel = TorchUnet(ref_cfg).eval()

    our_cfg = UnetModelConfig(**{k: getattr(ref_cfg, k) for k in (
        "im_channels", "im_size", "down_channels", "mid_channels",
        "down_sample", "time_emb_dim", "num_down_layers", "num_mid_layers",
        "num_up_layers", "num_heads", "attn_resolutions")})
    model = Unet(config=our_cfg, fused=False)
    params = convert_unet(tmodel.state_dict(), our_cfg)

    x = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
    t = np.array([7, 511])
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    got = model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t)
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_srgan_generator_import_output_parity():
    from srgan_model.models import Generator as TorchGen

    from weatherconverter_tpu.compat.torch_import import convert_srgan_generator
    from weatherconverter_tpu.models.srgan import Generator

    torch.manual_seed(1)
    tgen = TorchGen(in_channels=3, num_channels=8, num_blocks=2).eval()
    params, stats = convert_srgan_generator(tgen.state_dict(), num_blocks=2)
    gen = Generator(in_channels=3, num_channels=8, num_blocks=2, upscale_factor=4)

    x = np.random.RandomState(1).rand(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        want = tgen(torch.from_numpy(x)).numpy()
    got = gen.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_conv_transpose_matches_torch_module():
    from weatherconverter_tpu.compat.torch_import import convt_w
    from weatherconverter_tpu.models.layers import conv_transpose_torch

    torch.manual_seed(2)
    tconv = torch.nn.ConvTranspose2d(6, 4, 4, 2, 1)
    x = np.random.RandomState(2).randn(2, 6, 8, 8).astype(np.float32)
    with torch.no_grad():
        want = tconv(torch.from_numpy(x)).numpy()
    got = conv_transpose_torch(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(convt_w(tconv.weight)),
        jnp.asarray(tconv.bias.detach().numpy()),
        2,
        1,
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-5
    )


# note: the reference cannot build resnet18/34 DeepLab variants at all (its
# torchvision-clone BasicBlock raises on dilation, resnet.py:49), so parity
# is checked on the bottleneck resnets it actually supports; both head types
# are covered.
@pytest.mark.parametrize("arch", ["deeplabv3plus_resnet50", "deeplabv3_resnet50"])
def test_deeplab_import_output_parity(arch):
    import seg_model.network.modeling as ref_modeling

    from weatherconverter_tpu.compat.torch_import import convert_deeplab_resnet
    from weatherconverter_tpu.models.factory import make_seg_model

    torch.manual_seed(3)
    builder = getattr(ref_modeling, arch)
    tmodel = builder(num_classes=6, output_stride=16, pretrained_backbone=False)
    tmodel.eval()

    backbone = arch.split("_")[1]
    params, stats = convert_deeplab_resnet(tmodel.state_dict(), backbone)
    model = make_seg_model(arch, num_classes=6, output_stride=16, train=False)

    x = np.random.RandomState(4).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_legacy_unet_import_output_parity():
    """Output parity vs the reference old_modules.UNet — the architecture of
    the only shipped diffusion checkpoint (reference old_modules.py:230-360,
    loaded at sample_integrated.py:89). The torch module hardcodes its
    attention plane sizes for 128px inputs (old_modules.py:255-270), so
    parity runs at the real 128px, batch 1."""
    from diffusion_model.models.old_modules import UNet as TorchLegacyUNet

    from weatherconverter_tpu.compat.torch_import import convert_legacy_unet
    from weatherconverter_tpu.models.unet_legacy import LegacyUNet

    torch.manual_seed(0)
    tmodel = TorchLegacyUNet(block_depth=3).eval()

    model = LegacyUNet(image_size=128, train=False)
    params, stats = convert_legacy_unet(tmodel.state_dict())

    x = np.random.RandomState(1).randn(1, 3, 128, 128).astype(np.float32)
    # alpha-bar-style scalar conditioning, shape (B,1,1,1)
    # (reference sample_integrated.py:57-64)
    t = np.full((1, 1, 1, 1), 0.286, dtype=np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t.reshape(1)),
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_cli_sample_legacy_loads_torch_ckpt(tmp_path):
    """`sample --sampler legacy --checkpoint <torch .ckpt>` end-to-end: the
    flagship 'run the shipped reference weights' path (reference
    sample_integrated.py:89 loads old_model/1000-checkpoint.ckpt)."""
    from diffusion_model.models.old_modules import UNet as TorchLegacyUNet

    from weatherconverter_tpu.cli.main import main

    torch.manual_seed(1)
    tmodel = TorchLegacyUNet(block_depth=3)
    ckpt = tmp_path / "1000-checkpoint.ckpt"
    torch.save({"model_state_dict": tmodel.state_dict()}, ckpt)

    out = tmp_path / "legacy.png"
    rc = main([
        "sample", "--sampler", "legacy", "--checkpoint", str(ckpt),
        "--steps", "2", "--batch", "1", "--out", str(out), "--seed", "0",
    ])
    assert rc == 0
    assert out.exists()
