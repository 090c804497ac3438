"""Filesystem datasets: image-glob (diffusion flavor) and paired
image+label (segmentation flavor).

The reference ships two DIFFERENT classes both named ACDCDataset
(reference: diffusion_model/dataloader.py:9-48 — image-only, and
seg_model/datasets/acdc.py:86-173 — paired). Here they are two explicit
classes with the same discovery semantics:

  - `DiffusionImageDataset` globs {root}/{condition}/{train,val,test}/**/
    *.jpg|png recursively (reference dataloader.py:20-27) and can merge
    extra BDD/DAWN-style trees via `add_images` (reference 29-34).
  - `SegPairedDataset` pairs rgb_anon/{cond}/{split}/**/*_rgb_anon.* with
    gt/.../*_gt_labelIds.* (reference acdc.py:117-133), encoding labels to
    train ids via the 256-entry LUT (data/labels.py).

Host-side decode only (PIL); all randomized augmentation runs ON DEVICE in
batched jitted form (data/transforms.py) — the TPU-first split of work. The
host resize produces the fixed static shape XLA needs.
"""

from __future__ import annotations

import glob
import os
from pathlib import Path
from typing import Callable, Optional, Sequence

import numpy as np
from PIL import Image

from weatherconverter_tpu.data.labels import encode_target


def _glob_images(folder: str) -> list[str]:
    """Recursive *.jpg/*.png discovery (reference: dataloader.py:24-26 uses
    the '*.[jp][pn]g' character-class pattern)."""
    pattern = os.path.join(folder, "**", "*.[jp][pn]g")
    return sorted(glob.glob(pattern, recursive=True))


def load_image_resized(
    path: str, smaller_side: int, out_wh: Optional[tuple[int, int]] = None
) -> np.ndarray:
    """Decode + bilinear resize with the smallest side pinned and aspect
    kept — torchvision Resize(int) semantics (reference: dataloader.py:57-58).

    With `out_wh` = (H, W), additionally center-crop/edge-pad to that fixed
    box so batches STACK with a static shape (XLA requirement; the reference
    crops per-sample on the host instead, train_ddpm.py:150-155, so it never
    needs a fixed pre-crop box). Returns HWC uint8.
    """
    img = Image.open(path).convert("RGB")
    w, h = img.size
    if h <= w:
        nh, nw = smaller_side, max(1, round(w * smaller_side / h))
    else:
        nw, nh = smaller_side, max(1, round(h * smaller_side / w))
    img = img.resize((nw, nh), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.uint8)
    if out_wh is None:
        return arr
    th, tw = out_wh
    # center-crop any excess, edge-pad any deficit (rare: near-square inputs)
    y0 = max(0, (arr.shape[0] - th) // 2)
    x0 = max(0, (arr.shape[1] - tw) // 2)
    arr = arr[y0 : y0 + th, x0 : x0 + tw]
    pad_h, pad_w = th - arr.shape[0], tw - arr.shape[1]
    if pad_h or pad_w:
        arr = np.pad(arr, ((0, pad_h), (0, pad_w), (0, 0)), mode="edge")
    return arr


def load_image_exact(path: str, hw: tuple[int, int], resample=Image.BILINEAR) -> np.ndarray:
    img = Image.open(path).convert("RGB")
    img = img.resize((hw[1], hw[0]), resample)
    return np.asarray(img, dtype=np.uint8)


class DiffusionImageDataset:
    """Image-only dataset (reference: diffusion_model/dataloader.py:9-48).

    Yields HWC uint8 at a fixed pre-crop size (smallest side = `resize_to`,
    center-padded/cropped to `resize_to x resize_to * WIDE` handled by the
    device-side random crop). The [-1,1] scaling and all randomness happen
    on device.
    """

    def __init__(
        self,
        root_dir: str,
        selected_conditions: Sequence[str] = ("rain", "fog", "night"),
        splits: Sequence[str] = ("train", "val", "test"),
        resize_to: int = 128,
        aspect: float = 16 / 9,
    ):
        self.root_dir = root_dir
        self.selected_conditions = list(selected_conditions)
        self.resize_to = resize_to
        # fixed pre-crop box (H, W): static shapes let batches stack and the
        # random 128x128 crop run on device (data/transforms.py)
        self.out_wh = (resize_to, int(round(resize_to * aspect)))
        self.img_paths: list[str] = []
        for condition in self.selected_conditions:
            for split in splits:
                self.img_paths.extend(
                    _glob_images(os.path.join(root_dir, condition, split))
                )

    def add_images(self, image_dir: str) -> None:
        """Merge a BDD/DAWN-style tree: {dir}/{condition}/**.png
        (reference: dataloader.py:29-34)."""
        for condition in self.selected_conditions:
            self.img_paths.extend(_glob_images(os.path.join(image_dir, condition)))

    def __len__(self) -> int:
        return len(self.img_paths)

    def __getitem__(self, idx: int) -> np.ndarray:
        from weatherconverter_tpu.data import native

        arr = native.decode_box(self.img_paths[idx], self.resize_to, self.out_wh)
        if arr is not None:
            return arr
        return load_image_resized(self.img_paths[idx], self.resize_to, self.out_wh)

    def get_batch(self, indices):
        """Batch fast-path: one native call decodes all files on C++ threads
        (data/native.py). Returns None when the native decoder is
        unavailable so the DataLoader falls back to its Python worker POOL —
        decoding serially here would bypass num_workers entirely."""
        from weatherconverter_tpu.data import native

        paths = [self.img_paths[i] for i in indices]
        return native.decode_box_batch(paths, self.resize_to, self.out_wh)


class SegPairedDataset:
    """Paired image+label dataset (reference: seg_model/datasets/acdc.py:86-173).

    Yields (image HWC uint8, train-id label HW uint8) at a fixed resize
    resolution (the reference's ExtResize step); further paired random
    crops/flips run on device.
    """

    def __init__(
        self,
        root_dir: str,
        split: str = "train",
        weather: Sequence[str] | str = "all",
        images_dir: str = "rgb_anon",
        labels_dir: str = "gt",
        resize_hw: tuple[int, int] = (270, 480),
    ):
        self.root_dir = Path(root_dir)
        self.resize_hw = resize_hw
        if weather == "all":
            conditions = ["fog", "night", "rain", "snow"]
        elif isinstance(weather, str):
            # a bare condition name; list('rain') would explode into chars
            # and silently discover zero pairs
            conditions = [weather]
        else:
            conditions = list(weather)

        self.image_paths: list[Path] = []
        self.label_paths: list[Path] = []
        for condition in conditions:
            rgb_dir = self.root_dir / images_dir / condition / split
            gt_dir = self.root_dir / labels_dir / condition / split
            for image_path in sorted(rgb_dir.glob("**/*_rgb_anon.*")):
                rel = image_path.relative_to(rgb_dir)
                label_name = image_path.name.replace("_rgb_anon", "_gt_labelIds")
                label_path = gt_dir / rel.parent / label_name
                if label_path.exists():
                    self.image_paths.append(image_path)
                    self.label_paths.append(label_path)

    def __len__(self) -> int:
        return len(self.image_paths)

    def __getitem__(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        from weatherconverter_tpu.data import native

        h, w = self.resize_hw
        img = native.decode_exact(str(self.image_paths[idx]), (h, w))
        if img is None:
            img = load_image_exact(str(self.image_paths[idx]), (h, w))
        # labels stay on the PIL path: id maps must resize NEAREST and the
        # native decoder normalizes to RGB
        lbl = Image.open(self.label_paths[idx])
        # labels resize with NEAREST always (reference ExtResize 'just_label'
        # semantics, ext_transforms.py — never interpolate ids)
        lbl = lbl.resize((w, h), Image.NEAREST)
        lbl = encode_target(np.asarray(lbl, dtype=np.uint8))
        return img, lbl
