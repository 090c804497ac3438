"""Seeded functional RNG utilities.

Replaces the reference's global `torch.manual_seed` / `np.random.seed` /
`random.seed` trio (reference: diffusion_model/train_ddpm.py:32-34) with
explicit `jax.random` key threading: every stochastic component receives a key
derived from a single run seed, so runs are reproducible and the RNG state is
part of the functional program (required for jit/scan on TPU).
"""

from __future__ import annotations

from typing import Iterator

import jax


def run_key(seed: int) -> jax.Array:
    """Root key for a run (reference seeds at train_ddpm.py:32-34)."""
    return jax.random.PRNGKey(seed)


def split_named(key: jax.Array, *names: str) -> dict[str, jax.Array]:
    """Split a key into named sub-keys (stable: order of names matters)."""
    keys = jax.random.split(key, len(names))
    return {name: k for name, k in zip(names, keys)}


def epoch_keys(key: jax.Array, num_epochs: int) -> jax.Array:
    """One key per epoch, shape (num_epochs, 2)."""
    return jax.random.split(key, num_epochs)


def key_stream(key: jax.Array) -> Iterator[jax.Array]:
    """Infinite stream of fresh keys (host-side convenience; do not use
    inside jit — thread keys explicitly there)."""
    while True:
        key, sub = jax.random.split(key)
        yield sub
