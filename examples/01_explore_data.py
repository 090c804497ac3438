"""Dataset exploration walkthrough — analog of the reference's
additionals/eda.ipynb.

The notebook walks an ACDC `rgb_anon/` tree, plots a random image, builds
an ad-hoc dataset + DataLoader, inspects batch shapes, peeks at a
Cityscapes color label, and prototypes per-class mask filtering
(`filter_class` / `get_class_mask`). This script does the same through the
framework's real APIs: `DiffusionImageDataset` / `SegPairedDataset`
discovery, the threaded `DataLoader`, the Cityscapes label LUTs
(data/labels.py), and class masking via `ClassWiseMasking`'s underlying
comparison.

Run on a real tree:   python examples/01_explore_data.py --data-root /data/acdc
Run self-contained:   python examples/01_explore_data.py   (synthetic world)
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_synthetic_acdc_tree(root: str, conditions=("rain", "fog"), n_per=6) -> None:
    """A miniature ACDC layout: rgb_anon/{cond}/train/scene/x_rgb_anon.png
    paired with gt/{cond}/train/scene/x_gt_labelIds.png (raw Cityscapes ids)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    for cond in conditions:
        img_dir = os.path.join(root, "rgb_anon", cond, "train", "scene0")
        gt_dir = os.path.join(root, "gt", cond, "train", "scene0")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(gt_dir, exist_ok=True)
        for i in range(n_per):
            img = rng.integers(0, 255, (54, 96, 3), dtype=np.uint8)
            # blocks of raw Cityscapes ids: road(7), building(11), sky(23)
            ids = rng.choice([7, 11, 23], size=(6, 12)).astype(np.uint8)
            lbl = np.repeat(np.repeat(ids, 9, axis=0), 8, axis=1)
            Image.fromarray(img).save(os.path.join(img_dir, f"im{i}_rgb_anon.png"))
            Image.fromarray(lbl).save(os.path.join(gt_dir, f"im{i}_gt_labelIds.png"))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", default=None, help="ACDC root (rgb_anon/ + gt/)")
    ap.add_argument("--out", default="outputs/examples/01_explore_data")
    ap.add_argument("--conditions", nargs="+", default=["rain", "fog"])
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from weatherconverter_tpu.data.datasets import (
        DiffusionImageDataset,
        SegPairedDataset,
    )
    from weatherconverter_tpu.data.labels import decode_target, encode_target
    from weatherconverter_tpu.data.loader import DataLoader
    from weatherconverter_tpu.utils.images import save_images

    os.makedirs(args.out, exist_ok=True)
    tmp = None
    root = args.data_root
    if root is None:
        tmp = tempfile.TemporaryDirectory()
        root = tmp.name
        make_synthetic_acdc_tree(root, conditions=args.conditions)
        print(f"[synthetic] built a miniature ACDC tree at {root}")

    # --- 1. diffusion-flavor discovery + a batch grid (eda.ipynb cells 1-6) ---
    dds = DiffusionImageDataset(
        os.path.join(root, "rgb_anon"),
        selected_conditions=args.conditions,
        splits=("train",),
        resize_to=48,
    )
    print(f"diffusion dataset: {len(dds)} images across {args.conditions}")
    loader = DataLoader(dds, batch_size=args.batch, shuffle=True, seed=0)
    batch = next(iter(loader))
    print(f"  batch shape {batch.shape} dtype {batch.dtype} "
          f"range [{batch.min()}, {batch.max()}]")
    grid_path = save_images(
        batch.astype(np.float32) / 255.0,
        os.path.join(args.out, "image_batch.png"),
        nrow=2,
        from_range="unit",
    )
    print(f"  grid -> {grid_path}")

    # --- 2. paired seg discovery + label encode/decode (eda.ipynb CityScapes
    # cells: raw label ids -> train ids -> colors) ---
    sds = SegPairedDataset(root, split="train", weather=list(args.conditions),
                           resize_hw=(54, 96))
    print(f"seg dataset: {len(sds)} (image, label) pairs")
    img, lbl = sds[0]
    raw_ids = np.unique(np.asarray(lbl))
    print(f"  image {img.shape} | train-id label {lbl.shape}, ids {raw_ids}")
    color = decode_target(lbl)  # train ids -> RGB (train_segmentor.ipynb colors)
    from PIL import Image

    Image.fromarray(color.astype(np.uint8)).save(
        os.path.join(args.out, "label_colorized.png"))
    # round-trip sanity the notebook does by eye: encode(decode) is identity
    # on valid ids only at the LUT level; show the mapping table instead
    raw = np.arange(34, dtype=np.uint8)
    print(f"  raw id -> train id LUT (34 Cityscapes entries): "
          f"{encode_target(raw).tolist()}")

    # --- 3. per-class masking (eda.ipynb filter_class / get_class_mask) ---
    first_class = int(lbl[lbl != 255][0]) if (lbl != 255).any() else 0
    mask = (lbl == first_class)[..., None]
    masked = np.where(mask, img, 0)
    Image.fromarray(masked.astype(np.uint8)).save(
        os.path.join(args.out, f"class_{first_class}_masked.png"))
    print(f"  class {first_class} covers {mask.mean():.1%} of the image "
          f"-> class_{first_class}_masked.png")

    print(f"done: artifacts in {args.out}")
    if tmp is not None:
        tmp.cleanup()


if __name__ == "__main__":
    main()
