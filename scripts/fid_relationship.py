"""Backbone-FID vs Inception-FID relationship on one dataset (VERDICT r1 item 7).

The quality gate's default feature extractor is the frozen random-init seg
backbone ("backbone-FID": cheap, always available, valid for RELATIVE
tracking only). The canonical metric is InceptionV3-pool3 FID, which the CLI
supports via `quality --inception-checkpoint` (importer output-parity-tested
vs an independent torch oracle). This script measures how the two relate on
the gate's structured synthetic world — and documents the measured limit:

  * Backbone-FID (ResNet-18 random features, 18 layers): input-SENSITIVE
    (per-dim std across a batch ~O(0.1)) and strictly monotone in corruption
    strength — the property the gate's monotone-in-lambda checks rely on.
  * Inception pool3 on RANDOM weights (90+ conv/BN/ReLU layers): input-
    INVARIANT — per-dim std across a batch ~3e-8, in BOTH the independent
    torch oracle and the imported JAX graph (bit-level agreement that itself
    re-confirms importer parity at full depth), with or without BN-statistic
    calibration. Depth washes out the input signal; FID is then a constant
    ~0 at every corruption level. Inception-FID is therefore only meaningful
    with TRAINED torchvision weights (not shipped in this image or by the
    reference) — supply them via `quality --inception-checkpoint`.

Run: python scripts/fid_relationship.py [n_per_set]   (CPU, ~2-4 min)
Writes outputs/fid_relationship.json; summarized in PROFILE.md round 4.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from quality_gate import HR, make_world_batch  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_losses_metrics import _torch_inception_v3_features

    from weatherconverter_tpu.compat.torch_import import convert_inception_v3
    from weatherconverter_tpu.metrics.fid import fid_from_batches
    from weatherconverter_tpu.models.factory import make_seg_model
    from weatherconverter_tpu.models.inception import InceptionV3, fid_input_resize

    key = jax.random.PRNGKey(0)
    _, hr_ref, _ = make_world_batch(key, n)

    # corruption ladder: additive gaussian noise + a channel shift of the kind
    # strong guidance induces (the gate's lam=60 setting shifts colors)
    def corrupt(x, sigma, shift, k):
        y = x + sigma * jax.random.normal(k, x.shape)
        y = y + jnp.asarray([shift, -shift / 2, shift / 3])
        return jnp.clip(y, 0.0, 1.0)

    levels = [(0.02, 0.0), (0.08, 0.05), (0.2, 0.15), (0.45, 0.35)]
    sets = [
        corrupt(hr_ref, s, sh, jax.random.fold_in(key, i + 1))
        for i, (s, sh) in enumerate(levels)
    ]

    # --- extractor 1: frozen random-init seg backbone, pooled (gate default)
    seg = make_seg_model("deeplabv3plus_resnet18", num_classes=5, train=False)
    seg_vars = jax.jit(seg.init)(jax.random.PRNGKey(3), jnp.zeros((1, HR, HR, 3)))
    backbone_fn = jax.jit(
        lambda x: jnp.mean(
            seg.apply(seg_vars, x, method=lambda m, im: m.backbone(im))["out"],
            axis=(1, 2),
        ).astype(jnp.float32)
    )

    # --- extractor 2: InceptionV3 pool3 via the torch-layout importer, with
    # BN running stats calibrated on in-distribution data (random weights)
    tm = _torch_inception_v3_features().train()
    with torch.no_grad():
        for i in range(4):
            xb = np.asarray(
                corrupt(hr_ref, 0.1, 0.1, jax.random.fold_in(key, 100 + i))
            )
            xb = np.repeat(np.repeat(xb, 10, axis=1), 10, axis=2)  # ~299px
            tm(torch.from_numpy(np.transpose(xb, (0, 3, 1, 2))) * 2.0 - 1.0)
    tm.eval()
    ip, istats = convert_inception_v3(tm.state_dict())
    inc = InceptionV3()
    ivars = {
        "params": jax.tree.map(jnp.asarray, ip),
        "batch_stats": jax.tree.map(jnp.asarray, istats),
    }
    inception_fn = jax.jit(lambda x: inc.apply(ivars, fid_input_resize(x)))

    # input sensitivity: mean per-dimension std across one batch of images
    sens_backbone = float(np.asarray(backbone_fn(hr_ref)).std(0).mean())
    sens_inception = float(np.asarray(inception_fn(hr_ref)).std(0).mean())

    rows = []
    for (sigma, shift), xs in zip(levels, sets):
        fb = float(fid_from_batches(backbone_fn, [hr_ref], [xs]))
        fi = float(fid_from_batches(inception_fn, [hr_ref], [xs]))
        rows.append(
            {"sigma": sigma, "shift": shift,
             "fid_backbone": round(fb, 4), "fid_inception_pool3": round(fi, 4)}
        )
        print(rows[-1], flush=True)

    fb_seq = [r["fid_backbone"] for r in rows]
    backbone_monotone = all(b2 > b1 for b1, b2 in zip(fb_seq, fb_seq[1:]))
    out = {
        "dataset": f"quality-gate structured synthetic world, n={n}/set, {HR}px",
        "inception_weights": (
            "synthetic (torchvision layout, random-init, BN-calibrated)"
        ),
        "input_sensitivity_std_per_dim": {
            "backbone_resnet18_pooled": sens_backbone,
            "inception_pool3_random": sens_inception,
        },
        "levels": rows,
        "backbone_fid_monotone_in_corruption": backbone_monotone,
        "conclusion": (
            "random-weight inception pool3 is input-invariant (90-layer "
            "collapse; torch oracle agrees to 3e-8) -> inception-FID needs "
            "trained weights, supplied via quality --inception-checkpoint; "
            "backbone-FID stays input-sensitive and monotone in corruption, "
            "which is what the gate's relative checks use"
        ),
    }
    os.makedirs(os.path.join(REPO, "outputs"), exist_ok=True)
    path = os.path.join(REPO, "outputs", "fid_relationship.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(
        f"wrote {path}: backbone_monotone={backbone_monotone} "
        f"sens(backbone)={sens_backbone:.3g} sens(inception)={sens_inception:.3g}"
    )


if __name__ == "__main__":
    main()
