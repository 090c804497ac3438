"""Image grid / strip utilities and the process visualizer.

Parity targets:
  - `make_grid` / `save_images`: torchvision make_grid + PIL save
    (reference: diffusion_model/utils.py:43-56, sample_ddpm.py:47-53).
  - forward/backward process strips (reference: diffusion_model/
    visualizer.py:39-109): q-sample snapshots every k steps and reverse
    trajectory snapshots, tiled into one PNG.
All compute is jnp; PIL is used only at the file boundary.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from weatherconverter_tpu.diffusion.schedule import NoiseSchedule, q_sample


def to_uint8_image(x: jax.Array, from_range: str = "pm1") -> np.ndarray:
    """(H, W, C) or (B, H, W, C) float -> uint8. from_range: 'pm1' ([-1,1],
    the diffusion convention) or 'unit' ([0,1])."""
    x = jnp.asarray(x)
    if from_range == "pm1":
        x = (jnp.clip(x, -1.0, 1.0) + 1.0) / 2.0
    else:
        x = jnp.clip(x, 0.0, 1.0)
    return np.asarray((x * 255.0).astype(jnp.uint8))


def make_grid(images: np.ndarray, nrow: int = 4, pad: int = 2) -> np.ndarray:
    """(B, H, W, C) uint8 -> tiled grid (torchvision.utils.make_grid
    semantics used at reference utils.py:50-52)."""
    b, h, w, c = images.shape
    ncol = nrow  # torchvision: `nrow` = images per row
    nrows = (b + ncol - 1) // ncol
    grid = np.zeros(
        (nrows * (h + pad) + pad, ncol * (w + pad) + pad, c), dtype=np.uint8
    )
    for i in range(b):
        r, col = divmod(i, ncol)
        y = r * (h + pad) + pad
        x = col * (w + pad) + pad
        grid[y : y + h, x : x + w] = images[i]
    return grid


def save_images(
    images: jax.Array, path: str, nrow: int = 4, from_range: str = "pm1"
) -> str:
    """Grid-save a batch (reference: utils.py:49-56 / sample_ddpm.py:47-53)."""
    from PIL import Image

    arr = to_uint8_image(images, from_range)
    if arr.ndim == 3:
        arr = arr[None]
    grid = make_grid(arr, nrow=nrow)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(grid.squeeze()).save(path)
    return path


def forward_process_strip(
    sched: NoiseSchedule,
    x0: jax.Array,
    key: jax.Array,
    every: int = 100,
) -> jax.Array:
    """Snapshots of q(x_t|x_0) every `every` steps (reference:
    visualizer.py:39-71 calls add_noise2 at t = 0, 100, ..., T-1).
    Returns (S, H, W, C) for a single image x0 (H, W, C)."""
    ts = jnp.arange(0, sched.T, every)
    noise = jax.random.normal(key, x0.shape, dtype=x0.dtype)

    def snap(t):
        return q_sample(sched, x0, noise, t)

    return jax.vmap(snap)(ts)


def backward_process_strip(traj: jax.Array, index: int = 0) -> jax.Array:
    """Select one sample's reverse-trajectory snapshots from a sampler run
    with return_trajectory_every=k (reference: visualizer.py:74-109)."""
    return traj[:, index]


def save_strip(images: jax.Array, path: str, from_range: str = "pm1") -> str:
    """Save a (S, H, W, C) strip as one horizontal PNG row."""
    from PIL import Image

    arr = to_uint8_image(images, from_range)
    s, h, w, c = arr.shape
    row = arr.transpose(1, 0, 2, 3).reshape(h, s * w, c)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(row.squeeze()).save(path)
    return path


def augmentation_galleries(image: "jax.Array", key: "jax.Array") -> dict:
    """Photometric + geometric augmentation galleries of one [0,1] HWC image
    (reference: visualizer.py:160-191 builds the same two panels with
    torchvision ColorJitter / RandomAffine; here every variant is the
    on-device transform the training pipelines actually use). Returns
    {'photometric': (N,H,W,3) strip, 'geometric': (N,H,W,3) strip}, each
    leading with the original."""
    import jax
    import jax.numpy as jnp

    from weatherconverter_tpu.data.transforms import (
        apply_affine,
        color_jitter,
        hue_jitter,
    )

    x = jnp.asarray(image)[None]  # (1, H, W, 3)
    ks = jax.random.split(key, 4)
    photo = [
        x,
        color_jitter(ks[0], x, brightness=0.5, contrast=0.0, saturation=0.0),
        color_jitter(ks[1], x, brightness=0.0, contrast=0.5, saturation=0.0),
        color_jitter(ks[2], x, brightness=0.0, contrast=0.0, saturation=0.5),
        hue_jitter(ks[3], x, hue=0.3),
    ]
    geo = [
        x,
        apply_affine(x, angle=30.0)[0],
        apply_affine(x, translate=(0.2, 0.2))[0],
        apply_affine(x, scale=1.5)[0],
        apply_affine(x, shear=50.0)[0],
    ]
    return {
        "photometric": jnp.concatenate(photo, axis=0),
        "geometric": jnp.concatenate(geo, axis=0),
    }
