"""Spatial parallelism (parallel/spatial.py): H-sharded high-resolution
compute over a ('data', 'space') mesh must be numerically identical to
single-device execution — XLA SPMD inserts the conv halo exchanges and the
cross-shard reductions (ASPP global pool) that make that true."""

import jax
import jax.numpy as jnp
import numpy as np

from weatherconverter_tpu.guidance.sgg import seg_input_gradients
from weatherconverter_tpu.models.factory import make_seg_model
from weatherconverter_tpu.parallel.spatial import (
    make_spatial_mesh,
    shard_spatial,
    spatial_image_sharding,
)

B, HW, C = 2, 64, 5


def _seg_and_inputs():
    seg = make_seg_model("deeplabv3_resnet18", num_classes=C, train=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, HW, HW, 3))
    v = jax.jit(seg.init)(jax.random.PRNGKey(1), x)
    gt = jax.random.randint(jax.random.PRNGKey(2), (B, HW, HW), 0, C)
    return seg, v, x, gt


def test_spatial_sharded_seg_forward_matches_single_device():
    seg, v, x, gt = _seg_and_inputs()
    ref = jax.jit(seg.apply)(v, x)

    mesh = make_spatial_mesh(data=2, space=4)
    xs = shard_spatial(mesh, x)
    out = jax.jit(
        seg.apply, out_shardings=spatial_image_sharding(mesh)
    )(v, xs)
    # the output must actually live sharded over the mesh
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4
    )


def test_spatial_sharded_input_gradient_matches_single_device():
    seg, v, x, gt = _seg_and_inputs()
    grad_fn = lambda img: seg_input_gradients(lambda im: seg.apply(v, im), img, gt)
    ref = jax.jit(grad_fn)(x)

    mesh = make_spatial_mesh(data=1, space=8)
    xs = shard_spatial(mesh, x)
    g = jax.jit(grad_fn)(xs)
    # tolerance note: ASPP's global-pool partial sums reassociate under the
    # sharded reduction and the deviation amplifies linearly through the
    # backward (~2.5e-4 absolute measured, identical with the packed and
    # plain stem paths) — fp reassociation, not a partitioning defect
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), atol=1e-3, rtol=5e-3)


def test_translate_with_spatial_mesh_matches_unsharded():
    """sample_with_sgg(spatial_mesh=...) — the HR half of every guided step
    runs H-sharded; the translated output must match the single-device run."""
    from weatherconverter_tpu.core.config import UnetModelConfig
    from weatherconverter_tpu.diffusion.schedule import linear_schedule
    from weatherconverter_tpu.guidance.translate import sample_with_sgg
    from weatherconverter_tpu.models.srgan import Generator
    from weatherconverter_tpu.models.unet import Unet

    H, SR = 16, 2
    HR = H * SR
    ucfg = UnetModelConfig(
        im_size=H, down_channels=[8, 16, 24], mid_channels=[24, 24, 16],
        down_sample=[True, False], time_emb_dim=16, num_down_layers=1,
        num_mid_layers=1, num_up_layers=1, num_heads=2, attn_resolutions=[8],
    )
    unet = Unet(config=ucfg, fused=False)
    sched = linear_schedule(20)
    uparams = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, H, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]
    seg = make_seg_model("deeplabv3_resnet18", num_classes=C, train=False)
    seg_vars = jax.jit(seg.init)(jax.random.PRNGKey(3), jnp.zeros((1, HR, HR, 3)))
    gen = Generator(num_channels=8, num_blocks=1, upscale_factor=SR)
    gvars = jax.jit(gen.init)(jax.random.PRNGKey(4), jnp.zeros((1, H, H, 3)))
    gt = jax.random.randint(jax.random.PRNGKey(6), (B, HR, HR), 0, C)
    inp = jax.random.normal(jax.random.PRNGKey(8), (B, H, H, 3)) * 0.2

    def run(mesh):
        fn = lambda: sample_with_sgg(
            lambda xt, tt: unet.apply({"params": uparams}, xt, tt),
            sched,
            lambda im: seg.apply(seg_vars, im),
            lambda im: gen.apply(gvars, im),
            inp, gt, jax.random.PRNGKey(5),
            lam=10.0, num_steps=4, num_classes=C, mode="fixed",
            start_t=3, guidance_style="gsg", spatial_mesh=mesh,
        )
        return jax.jit(fn)()

    ref = run(None)
    out = run(make_spatial_mesh(data=1, space=8))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_spatial_mesh_alternate_shape():
    """(data=4, space=2) also partitions correctly (different halo split)."""
    seg, v, x, gt = _seg_and_inputs()
    ref = jax.jit(seg.apply)(v, x)
    mesh = make_spatial_mesh(data=2, space=2, devices=jax.devices()[:4])
    xs = shard_spatial(mesh, x)
    out = jax.jit(seg.apply)(v, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)
