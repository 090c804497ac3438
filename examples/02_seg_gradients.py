"""Segmentation input-gradient walkthrough — analog of the reference's
additionals/seg_experiments.ipynb.

The notebook loads a DeepLab checkpoint, runs inference, back-propagates
the CE loss to the INPUT image, visualizes the gradient magnitude, then
prototypes the three ways of mapping a 512px gradient field back to 128px
latents (avg-pool / max-pool / interpolation) and a thresholded +
class-masked view ("sky gradients"). Those experiments became the
reference's sgg.py; here each step runs through the framework API that
shipped from them: `seg_input_gradients`, `gradient_magnitude`,
`guidance_field` (guidance/sgg.py).

Everything runs on a tiny deeplabv3_resnet18 briefly trained on a
synthetic color-block world so the gradients are meaningful; pass
--steps 0 to skip training and probe a random-init model.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def save_heat(mag: np.ndarray, path: str) -> str:
    """(H, W) nonneg -> grayscale PNG, normalized like the notebook's
    plt.imshow(..., cmap='gray')."""
    from PIL import Image

    m = np.asarray(mag, dtype=np.float32)
    m = (m - m.min()) / max(float(m.max() - m.min()), 1e-12)
    Image.fromarray((m * 255).astype(np.uint8)).save(path)
    return path


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="outputs/examples/02_seg_gradients")
    ap.add_argument("--steps", type=int, default=30, help="tiny-train steps")
    ap.add_argument("--size", type=int, default=32, help="HR image size")
    ap.add_argument("--pool", type=int, default=4, help="HR->latent factor")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from weatherconverter_tpu.guidance.sgg import (
        gradient_magnitude,
        guidance_field,
        seg_input_gradients,
    )
    from weatherconverter_tpu.models.factory import make_seg_model
    from weatherconverter_tpu.ops.image import avg_pool
    from weatherconverter_tpu.training.losses import cross_entropy_loss
    from weatherconverter_tpu.training.segmentation import (
        create_seg_state,
        make_seg_train_step,
    )

    os.makedirs(args.out, exist_ok=True)
    HR, C = args.size, 5
    colors = jnp.asarray(
        [[0.9, 0.1, 0.1], [0.1, 0.9, 0.1], [0.1, 0.2, 0.9],
         [0.9, 0.9, 0.1], [0.5, 0.1, 0.8]], dtype=jnp.float32)

    def world(key, n):
        k1, k2 = jax.random.split(key)
        blocks = jax.random.randint(k1, (n, 4, 4), 0, C)
        labels = jnp.repeat(jnp.repeat(blocks, HR // 4, axis=1), HR // 4, axis=2)
        imgs = jnp.clip(colors[labels] + 0.05 * jax.random.normal(k2, (n, HR, HR, 3)),
                        0.0, 1.0)
        return imgs, labels

    # --- 1. (tiny-)train the segmentor the notebook loads from disk ---
    seg_t = make_seg_model("deeplabv3_resnet18", num_classes=C, train=True)
    seg_e = make_seg_model("deeplabv3_resnet18", num_classes=C, train=False)
    state = create_seg_state(seg_t, jax.random.PRNGKey(0), optax.adam(2e-3),
                             input_hw=(HR, HR))
    step = make_seg_train_step(cross_entropy_loss, input_grad=False, donate=False)
    key = jax.random.PRNGKey(1)
    loss = float("nan")
    for _ in range(args.steps):
        key, k = jax.random.split(key)
        imgs, labels = world(k, 8)
        state, loss, _ = step(state, imgs, labels)
    print(f"tiny-train: {args.steps} steps, final CE {float(loss):.4f}")
    seg_vars = {"params": state.params, "batch_stats": state.batch_stats}
    seg_fn = lambda x: seg_e.apply(seg_vars, x)

    # --- 2. inference + colorized prediction (notebook 'inference' section) ---
    imgs, labels = world(jax.random.PRNGKey(42), 1)
    pred = jnp.argmax(seg_fn(imgs), axis=-1)
    acc = float(jnp.mean(pred == labels))
    print(f"inference: pixel acc {acc:.3f} on a held-out scene")
    save_heat(np.asarray(pred[0], np.float32), os.path.join(args.out, "pred.png"))

    # --- 3. CE input-gradient + magnitude (compute_gradient_magnitude cell) ---
    grads = seg_input_gradients(seg_fn, imgs, labels)
    mag = gradient_magnitude(grads, denormalize=True)  # (1, HR, HR, 1)
    print(f"input-grad: shape {grads.shape}, |g| max {float(mag.max()):.3e}")
    save_heat(np.asarray(mag[0, ..., 0]), os.path.join(args.out, "grad_magnitude.png"))

    # --- 4. thresholded + class-masked gradients (sky-mask cells) ---
    thr = 0.3 * mag.max()
    save_heat(np.asarray(jnp.where(mag > thr, mag, 0.0)[0, ..., 0]),
              os.path.join(args.out, "grad_thresholded.png"))
    cls = int(labels[0, 0, 0])
    cls_mask = (pred == cls).astype(jnp.float32)[..., None]
    save_heat(np.asarray((mag * cls_mask)[0, ..., 0]),
              os.path.join(args.out, f"grad_class{cls}_masked.png"))

    # --- 5. mapping gradients back to latent res: the notebook's avg-pool vs
    # max-pool vs interpolation comparison (its conclusion — avg-pool — is
    # what sgg.py:18 ships and guidance_field reproduces) ---
    p = args.pool
    g_avg = avg_pool(grads, p, p)
    g_max = jax.lax.reduce_window(grads, -jnp.inf, jax.lax.max, (1, p, p, 1),
                                  (1, p, p, 1), "VALID")
    g_interp = jax.image.resize(grads, (1, HR // p, HR // p, 3), "bilinear")
    field = guidance_field(seg_fn, imgs, labels, pool=p)  # the shipped pipeline
    for name, g in [("avg", g_avg), ("max", g_max), ("interp", g_interp)]:
        m = gradient_magnitude(g, denormalize=True)
        save_heat(np.asarray(m[0, ..., 0]), os.path.join(args.out, f"latent_{name}.png"))
        print(f"  latent map [{name:6s}] mean |g| {float(m.mean()):.3e}")
    np.testing.assert_allclose(
        np.asarray(gradient_magnitude(g_avg, denormalize=True)),
        np.asarray(field), rtol=1e-5, atol=1e-7)
    print("guidance_field == avg-pool path (the notebook's chosen mapping)")
    print(f"done: artifacts in {args.out}")


if __name__ == "__main__":
    main()
