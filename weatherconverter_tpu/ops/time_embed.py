"""Sinusoidal timestep embeddings.

Parity with the reference's two distinct embeddings:
  - `timestep_embedding`: 10000^(i/(d/2)) sin/cos over integer timesteps
    (reference: diffusion_model/models/unet_base.py:7-30).
  - `alpha_plane_embedding`: log-spaced frequency embedding of a *scalar*
    (an alpha-bar value), broadcast to an image plane — the legacy model's
    conditioning (reference: diffusion_model/models/old_modules.py:283-307).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    """(B,) int timesteps -> (B, dim) sin/cos embedding.

    factor = 10000 ** (arange(dim//2) / (dim//2)); emb = [sin(t/f), cos(t/f)]
    (reference: unet_base.py:22-30).
    """
    assert dim % 2 == 0, "time embedding dimension must be divisible by 2"
    half = dim // 2
    factor = 10000.0 ** (jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] / factor[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def alpha_plane_embedding(value: jax.Array, image_size: int, dim: int = 32) -> jax.Array:
    """Embed a (B,1,1,1)-shaped scalar (e.g. 1-alpha_bar[t]) into a
    (B, image_size, image_size, dim) plane, NHWC.

    Frequencies are exp(linspace(log 1.0, log 1000.0, dim/2)) scaled by 2*pi
    (reference: old_modules.py:293-307); nearest-neighbor upsample of a 1x1
    plane is a broadcast (reference: old_modules.py:249,315).
    """
    half = dim // 2
    freqs = jnp.exp(
        jnp.linspace(math.log(1.0), math.log(1000.0), half, dtype=jnp.float32)
    )
    angular = 2.0 * math.pi * freqs
    v = value.reshape(value.shape[0], 1, 1, 1).astype(jnp.float32)
    ang = angular[None, None, None, :] * v
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # (B,1,1,dim)
    return jnp.broadcast_to(emb, (value.shape[0], image_size, image_size, dim))
