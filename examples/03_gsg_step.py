"""Single guided-reverse-step walkthrough — analog of the reference's
additionals/sgg_experiments.ipynb.

The notebook loads a seg model plus a dumped `mu_sigma_499.pt` / `sr_xt` /
`gt` from a debug translation run, re-implements `apply_gsg` in a cell, and
plots the gradient field and the guided latent. This script does the same
end-to-end with the framework's shipped pieces: the DDPM posterior
(diffusion/schedule.py) produces mu/sigma, a tiny-pretrained Swift-SRGAN
produces `sr_xt`, and `apply_gsg` (guidance/sgg.py — the production
implementation of the notebook's prototype cell) applies the guidance in
both `reference` and `fixed` modes so their difference (the xt-overwrite
defect, translation.py:90) is visible in numbers.

Chain intermediates from a REAL run can be probed instead of the synthetic
latent: `python -m weatherconverter_tpu translate --debug-dir DIR` dumps
xt snapshots (the analog of the notebook's debug/*.pt), and
`--debug-dir DIR --snapshot N` here loads `xt_N.png` back as the latent.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="outputs/examples/03_gsg_step")
    ap.add_argument("--t", type=int, default=40, help="reverse step to probe")
    ap.add_argument("--steps", type=int, default=50, help="chain length T")
    ap.add_argument("--lam", type=float, default=60.0)
    ap.add_argument("--seg-steps", type=int, default=30)
    ap.add_argument("--srgan-steps", type=int, default=20)
    ap.add_argument("--debug-dir", default=None,
                    help="translate --debug-dir output to load a real latent from")
    ap.add_argument("--snapshot", type=int, default=None,
                    help="xt_<N>.png index inside --debug-dir")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from weatherconverter_tpu.diffusion.schedule import (
        linear_schedule,
        posterior_mean,
        posterior_sigma,
        predict_x0,
        q_sample,
    )
    from weatherconverter_tpu.guidance.sgg import apply_gsg, guidance_field
    from weatherconverter_tpu.models.factory import make_seg_model
    from weatherconverter_tpu.models.srgan import Generator
    from weatherconverter_tpu.training.losses import cross_entropy_loss
    from weatherconverter_tpu.training.segmentation import (
        create_seg_state,
        make_seg_train_step,
    )
    from weatherconverter_tpu.training.srgan import SRGANState, make_pretrain_step
    from weatherconverter_tpu.utils.images import save_images

    os.makedirs(args.out, exist_ok=True)
    H, SR, C = 16, 2, 5
    HR = H * SR
    colors = jnp.asarray(
        [[0.9, 0.1, 0.1], [0.1, 0.9, 0.1], [0.1, 0.2, 0.9],
         [0.9, 0.9, 0.1], [0.5, 0.1, 0.8]], dtype=jnp.float32)

    def world(key, n):
        k1, k2 = jax.random.split(key)
        blocks = jax.random.randint(k1, (n, 4, 4), 0, C)
        labels = jnp.repeat(jnp.repeat(blocks, HR // 4, axis=1), HR // 4, axis=2)
        hr = jnp.clip(colors[labels] + 0.05 * jax.random.normal(k2, (n, HR, HR, 3)),
                      0.0, 1.0)
        lr = hr.reshape(n, H, SR, H, SR, 3).mean(axis=(2, 4))
        return lr * 2.0 - 1.0, hr, labels

    # --- tiny-train the two models the notebook loads from checkpoints ---
    seg_t = make_seg_model("deeplabv3_resnet18", num_classes=C, train=True)
    seg_e = make_seg_model("deeplabv3_resnet18", num_classes=C, train=False)
    sstate = create_seg_state(seg_t, jax.random.PRNGKey(0), optax.adam(2e-3),
                              input_hw=(HR, HR))
    sstep = make_seg_train_step(cross_entropy_loss, input_grad=False, donate=False)
    key = jax.random.PRNGKey(1)
    for _ in range(args.seg_steps):
        key, k = jax.random.split(key)
        _, hr, labels = world(k, 8)
        sstate, sl, _ = sstep(sstate, hr, labels)
    seg_vars = {"params": sstate.params, "batch_stats": sstate.batch_stats}
    seg_fn = lambda x: seg_e.apply(seg_vars, x)
    print(f"seg: {args.seg_steps} steps, CE {float(sl):.4f}")

    gen = Generator(num_channels=16, num_blocks=2, upscale_factor=SR)
    gv = gen.init(jax.random.PRNGKey(2), jnp.zeros((1, H, H, 3)))
    gstate = SRGANState.create(apply_fn=gen.apply, params=gv["params"],
                               batch_stats=gv.get("batch_stats", {}),
                               tx=optax.adam(2e-3))
    gstep = make_pretrain_step("l1")
    for _ in range(args.srgan_steps):
        key, k = jax.random.split(key)
        lr, hr, _ = world(k, 8)
        gstate, gl = gstep(gstate, lr, hr)
    gvars = {"params": gstate.params, "batch_stats": gstate.batch_stats}
    print(f"srgan: {args.srgan_steps} steps, L1 {float(gl):.4f}")

    # --- the probed latent: q-sampled synthetic scene, or a real chain
    # snapshot from translate --debug-dir (the notebook's debug/*.pt) ---
    sched = linear_schedule(args.steps, beta_end=0.05)
    lr_in, hr_in, labels = world(jax.random.PRNGKey(42), 1)
    t = jnp.full((1,), args.t, dtype=jnp.int32)
    if args.debug_dir:
        from PIL import Image

        idx = args.snapshot if args.snapshot is not None else args.t
        snap = os.path.join(args.debug_dir, f"xt_{idx}.png")
        arr = np.asarray(Image.open(snap), dtype=np.float32) / 255.0
        xt = jnp.asarray(arr * 2.0 - 1.0)[None]
        # grids pad by 2px; a single-image dump is the raw image inside it
        xt = xt[:, 2 : 2 + H, 2 : 2 + H, :]
        print(f"loaded chain snapshot {snap} -> latent {xt.shape}")
    else:
        noise = jax.random.normal(jax.random.PRNGKey(3), lr_in.shape)
        xt = q_sample(sched, lr_in, noise, t)

    # --- mu/sigma exactly as the sampler computes them (the notebook loads
    # these from mu_sigma_499.pt; here: eps-oracle -> posterior) ---
    eps_hat = jax.random.normal(jax.random.PRNGKey(4), xt.shape)  # stand-in UNet output
    x0_hat = predict_x0(sched, xt, eps_hat, t)
    mu = posterior_mean(sched, xt, eps_hat, t)
    sigma = posterior_sigma(sched, t).reshape(-1, 1, 1, 1)
    del x0_hat  # shown for the notebook's x0-estimate cell; mu uses eps directly
    print(f"mu {mu.shape} range [{float(mu.min()):.3f}, {float(mu.max()):.3f}] | "
          f"sigma {float(sigma.reshape(-1)[0]):.4f}")

    # --- the notebook's core cell: sr_xt -> seg CE input-grad -> field ---
    sr_xt = gen.apply(gvars, xt)  # [0,1] HR, reference translation.py:81
    field = guidance_field(seg_fn, sr_xt, labels, pool=SR)
    print(f"guidance field: mean {float(field.mean()):.3e} "
          f"max {float(field.max()):.3e}")

    guided_fixed = apply_gsg(seg_fn, mu, sigma, sr_xt, labels, lam=args.lam,
                             noise=jnp.zeros_like(mu), mode="fixed")
    guided_ref = apply_gsg(seg_fn, mu, sigma, sr_xt, labels, lam=args.lam,
                           mode="reference")
    # reference mode == fixed(z=0) + sigma: the +sigma-without-noise defect
    drift = float(jnp.abs(guided_ref - guided_fixed).mean())
    print(f"|reference - fixed(z=0)| mean = {drift:.4f} "
          f"(== sigma {float(sigma.reshape(-1)[0]):.4f}: the translation.py:90 "
          "+sigma-without-noise defect, reproduced bit-for-bit)")

    save_images(xt, os.path.join(args.out, "xt.png"), nrow=1)
    save_images(sr_xt, os.path.join(args.out, "sr_xt.png"), nrow=1,
                from_range="unit")
    fnorm = field / jnp.maximum(field.max(), 1e-12)
    save_images(jnp.repeat(fnorm, 3, axis=-1) * 2.0 - 1.0,
                os.path.join(args.out, "guidance_field.png"), nrow=1)
    save_images(guided_fixed, os.path.join(args.out, "mu_guided.png"), nrow=1)
    print(f"done: artifacts in {args.out}")


if __name__ == "__main__":
    main()
