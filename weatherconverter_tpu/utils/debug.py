"""Tensor debugging dumps — TPU-native analog of the reference's
`debug_tensor` (translation.py:17-39) and its commented-out per-step chain
dumps (translation.py:58-92: input / gt / noised xt / per-step xt / final).

The reference prints stats and saves a PNG from INSIDE the Python sampling
loop — free there, because every torch iteration already crosses the device
boundary. Our chain is ONE jitted `lax.scan`; a host callback per step would
serialize the pipeline and destroy the headline throughput. The TPU-native
design instead rides the bit-identical chain segmentation that already
exists for execution-time-bounded backends (guidance/translate.py
xt_init/t_offset, tests/test_guidance.py equivalence test): run the chain in
K-step jitted segments and dump the carried latent between calls. Snapshot
cadence costs only segment-dispatch overhead; the sampled trajectory is
step-for-step identical to the single-call program.

Wired into CLI `translate --debug-dir DIR [--debug-every K]`.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def debug_tensor(
    arr, path: str, title: Optional[str] = None, from_range: str = "pm1"
) -> str:
    """Print stats and save a visualization of `arr` to `path`.

    Reference parity (translation.py:17-39): prints shape/min/max/device;
    float image-like tensors are clamped to [-1, 1] and rescaled; integer
    label maps get their unique values printed. Divergences, each an
    upgrade: label maps are saved COLORIZED via the Cityscapes train-id
    palette (the reference saves a barely-visible raw 0-18 grayscale), and
    non-image shapes fall back to an .npy dump instead of crashing
    ToPILImage.

    Returns the path actually written (may swap the extension to .npy).
    """
    from PIL import Image

    from weatherconverter_tpu.data.labels import decode_target
    from weatherconverter_tpu.utils.images import make_grid, to_uint8_image

    x = np.asarray(arr)
    if title:
        print(title)
    print(f"Tensor shape: {tuple(x.shape)}")
    if x.size:
        print(f"Tensor min: {x.min()}")
        print(f"Tensor max: {x.max()}")
    print(f"Tensor dtype: {x.dtype}")

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    is_label = np.issubdtype(x.dtype, np.integer) or np.issubdtype(
        x.dtype, np.bool_
    )
    if is_label and x.ndim in (2, 3):
        # (H, W) or (B, H, W) encoded train-ids (reference's gt branch prints
        # unique values, translation.py:31-33)
        uniq = np.unique(x)
        print(f"Tensor unique values: {uniq.tolist()[:32]}")
        rgb = decode_target(x)
        if rgb.ndim == 3:
            rgb = rgb[None]
        grid = make_grid(rgb.astype(np.uint8), nrow=min(4, rgb.shape[0]))
        Image.fromarray(grid).save(path)
    elif not is_label and (
        (x.ndim in (3, 4) and x.shape[-1] in (1, 3))
    ):
        # image-like float: clamp [-1,1] -> [0,1] like the reference
        # (from_range='unit' for tensors already in [0,1], e.g. SRGAN output)
        arr8 = to_uint8_image(x.astype(np.float32), from_range)
        if arr8.ndim == 3:
            arr8 = arr8[None]
        grid = make_grid(arr8, nrow=min(4, arr8.shape[0]))
        Image.fromarray(grid.squeeze()).save(path)
    else:
        path = os.path.splitext(path)[0] + ".npy"
        np.save(path, x)

    print(f"Image saved to {path}")
    print("-" * 50)
    return path
