"""Segmentation training walkthrough — analog of the reference's
additionals/train_segmentor.ipynb.

The notebook builds a Cityscapes pipeline by hand (void-class encoding,
color decoding, normalization constants), wraps a torchvision FCN in a
pytorch-lightning module, trains with fp16 + best-val checkpointing, and
finally colorizes predictions. This script walks the same arc through the
framework: label LUTs (data/labels.py), a DeepLab factory model, the real
jitted train step (training/segmentation.py — the same one CLI `train-seg`
composes), streaming mIoU validation (metrics/stream.py), best-mIoU
checkpoint selection (core/checkpoint.py), and colorized predictions.

The full-featured entry point (PolyLR, 0.1x backbone LR groups, resume,
FSDP, multi-host) is `python -m weatherconverter_tpu train-seg --config ...`;
this example keeps every moving part visible in ~100 lines instead.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="outputs/examples/04_train_segmentor")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--steps-per-epoch", type=int, default=10)
    ap.add_argument("--size", type=int, default=32)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from PIL import Image

    from weatherconverter_tpu.core.checkpoint import save_pytree_npz
    from weatherconverter_tpu.data.labels import decode_target
    from weatherconverter_tpu.metrics.stream import StreamSegMetrics
    from weatherconverter_tpu.models.factory import make_seg_model
    from weatherconverter_tpu.training.losses import cross_entropy_loss
    from weatherconverter_tpu.training.segmentation import (
        create_seg_state,
        make_seg_train_step,
    )

    os.makedirs(args.out, exist_ok=True)
    HR, C = args.size, 5
    # the first five Cityscapes train-id classes, so decode_target colorizes
    colors = jnp.asarray(
        [[0.50, 0.25, 0.50], [0.95, 0.15, 0.90], [0.27, 0.27, 0.27],
         [0.40, 0.40, 0.60], [0.75, 0.60, 0.70]], dtype=jnp.float32)

    def world(key, n):
        """Color-block scenes with 255-ignore borders (the notebook's
        encode_segmap maps void classes to ignore_index=255)."""
        k1, k2 = jax.random.split(key)
        blocks = jax.random.randint(k1, (n, 4, 4), 0, C)
        labels = jnp.repeat(jnp.repeat(blocks, HR // 4, axis=1), HR // 4, axis=2)
        imgs = jnp.clip(colors[labels] + 0.05 * jax.random.normal(k2, (n, HR, HR, 3)),
                        0.0, 1.0)
        labels = labels.at[:, :2, :].set(255)  # void band, like rectification
        return imgs, labels

    # --- model + state + the production train step ---
    seg_t = make_seg_model("deeplabv3plus_resnet18", num_classes=C, train=True)
    seg_e = make_seg_model("deeplabv3plus_resnet18", num_classes=C, train=False)
    state = create_seg_state(seg_t, jax.random.PRNGKey(0), optax.adam(2e-3),
                             input_hw=(HR, HR))
    step = make_seg_train_step(cross_entropy_loss, input_grad=False, donate=False)

    val_imgs, val_labels = world(jax.random.PRNGKey(999), 16)
    metrics = StreamSegMetrics(C)
    best_miou, best_path = -1.0, os.path.join(args.out, "best_model.npz")
    key = jax.random.PRNGKey(1)

    for epoch in range(args.epochs):
        for _ in range(args.steps_per_epoch):
            key, k = jax.random.split(key)
            imgs, labels = world(k, 8)
            state, loss, _ = step(state, imgs, labels)

        # --- validation epoch: streaming confusion -> mIoU (the notebook's
        # val loop; ignore-255 pixels are excluded by confusion_update) ---
        seg_vars = {"params": state.params, "batch_stats": state.batch_stats}
        preds = jnp.argmax(seg_e.apply(seg_vars, val_imgs), axis=-1)
        metrics.reset()
        metrics.update(val_labels, preds)
        results = metrics.get_results()
        miou = results["Mean IoU"]
        print(f"epoch {epoch}: train CE {float(loss):.4f} | val mIoU {miou:.4f} "
              f"| acc {results['Overall Acc']:.4f}")
        if miou > best_miou:  # ModelCheckpoint(save_top_k=1) analog
            best_miou = miou
            save_pytree_npz(best_path, seg_vars)
            print(f"  new best -> {best_path}")

    # --- colorized prediction panel (the notebook's final cells) ---
    seg_vars = {"params": state.params, "batch_stats": state.batch_stats}
    pred = np.asarray(jnp.argmax(seg_e.apply(seg_vars, val_imgs[:1]), axis=-1)[0])
    gt = np.asarray(val_labels[0])
    panel = np.concatenate(
        [np.asarray(val_imgs[0] * 255, np.uint8),
         decode_target(gt).astype(np.uint8),
         decode_target(pred).astype(np.uint8)], axis=1)
    Image.fromarray(panel).save(os.path.join(args.out, "img_gt_pred.png"))
    print(f"best val mIoU {best_miou:.4f}; panel -> img_gt_pred.png "
          f"(input | gt | prediction)")
    print(f"done: artifacts in {args.out}")


if __name__ == "__main__":
    main()
