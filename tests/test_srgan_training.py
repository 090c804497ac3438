"""SRGAN training-step tests (capability the reference lacks: it defines the
Discriminator but never trains it, srgan_model/models.py:95-138)."""

import jax
import jax.numpy as jnp
import numpy as np

from weatherconverter_tpu.models.srgan import Discriminator, Generator
from weatherconverter_tpu.training.srgan import (
    create_srgan_states,
    make_gan_step,
    make_pretrain_step,
)


def setup_states():
    gen = Generator(num_channels=8, num_blocks=1, upscale_factor=2, train=True)
    disc = Discriminator(features=(8, 8), train=True)
    gs, ds = create_srgan_states(
        gen, disc, jax.random.PRNGKey(0), lr_size=8, upscale=2
    )
    return gs, ds


def test_pretrain_step_descends():
    gs, _ = setup_states()
    step = make_pretrain_step()
    lr_img = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3))
    hr = jnp.repeat(jnp.repeat(lr_img, 2, 1), 2, 2)
    losses = []
    for _ in range(6):
        gs, loss = step(gs, lr_img, hr)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_gan_step_updates_both_players():
    gs, ds = setup_states()
    step = make_gan_step()
    lr_img = jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 8, 3))
    hr = jnp.repeat(jnp.repeat(lr_img, 2, 1), 2, 2)
    g0 = jax.tree_util.tree_leaves(gs.params)[0].copy()
    d0 = jax.tree_util.tree_leaves(ds.params)[0].copy()
    gs, ds, g_loss, d_loss = step(gs, ds, lr_img, hr)
    assert np.isfinite(float(g_loss)) and np.isfinite(float(d_loss))
    assert not np.allclose(np.asarray(jax.tree_util.tree_leaves(gs.params)[0]), np.asarray(g0))
    assert not np.allclose(np.asarray(jax.tree_util.tree_leaves(ds.params)[0]), np.asarray(d0))
