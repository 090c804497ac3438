"""Discriminating quality gate on NON-RANDOM weights (VERDICT r1 items 3-4).

Builds a structured synthetic world (5 classes, each with a distinct color),
tiny-trains all three models with the framework's real train steps —
DDPM on the LR image distribution, DeepLabV3/ResNet-18 seg on (HR image,
label) pairs, Swift-SRGAN on (LR, HR) pairs — then runs the guided
translation pipeline across guidance settings and scores each with the
quality gates (metrics/quality.consistency_gap + metrics/fid):

    lam=0 (guidance off), lam=15 (the round-3 regression), lam=60 (the
    reference's production value, translation.py:55), mode='reference'
    (guidance output discarded — the reproduced upstream bug).

The gate DISCRIMINATES iff every setting separates from its neighbors
beyond 2 pooled sigmas of seed noise AND the three regression probes fire:
guidance-off (lam60 vs lam0 FID), the round-3 "lam=15 instead of 60" bug
(lam60 vs lam15 FID), and the reference-overwrite mode (mIoU collapse).
Measured signature at the 5-seed budget (2026-08-18): FID by lambda is
U-SHAPED, not monotone — 19.6 (lam0) -> 10.3 (lam15, z=-2.5) -> 324.6
(lam60, z=+11.5). Moderate guidance pulls the translated backbone features
TOWARD the original's layout (lowering FID-to-original); at production
lambda the added CE-gradient-MAGNITUDE energy (sgg.py:21-23 adds a
non-negative brightness field) dominates and shifts the distribution away.
Every pairwise gap clears 2 sigma, so the settings remain fully
distinguishable — which is what catching a mis-set lambda requires.

Run:  python scripts/quality_gate.py [--fast]      (CPU 8-dev mesh, ~10 min)
Writes outputs/quality_r05.json (mean±std over --seeds chain seeds). tests/test_quality_gate.py runs the same
machinery with a smaller budget.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

# world geometry: 16px latents, 2x SR, 32px HR, 5 classes
H, SR, C = 16, 2, 5
HR = H * SR

CLASS_COLORS = None  # set lazily (needs jnp)


def _colors(jnp):
    global CLASS_COLORS
    if CLASS_COLORS is None:
        CLASS_COLORS = jnp.asarray(
            [
                [0.9, 0.1, 0.1],
                [0.1, 0.9, 0.1],
                [0.1, 0.2, 0.9],
                [0.9, 0.9, 0.1],
                [0.5, 0.1, 0.8],
            ],
            dtype=jnp.float32,
        )
    return CLASS_COLORS


def make_world_batch(key, n):
    """(lr in [-1,1] (n,H,H,3), hr in [0,1] (n,HR,HR,3), labels (n,HR,HR))."""
    import jax
    import jax.numpy as jnp

    k1, k2 = jax.random.split(key)
    blocks = jax.random.randint(k1, (n, 4, 4), 0, C)
    labels = jnp.repeat(jnp.repeat(blocks, HR // 4, axis=1), HR // 4, axis=2)
    hr = _colors(jnp)[labels]  # (n, HR, HR, 3)
    hr = jnp.clip(hr + 0.05 * jax.random.normal(k2, hr.shape), 0.0, 1.0)
    lr = hr.reshape(n, H, SR, H, SR, 3).mean(axis=(2, 4))  # box downsample
    return lr * 2.0 - 1.0, hr, labels


def tiny_train(budget: dict, seed: int = 0, log=print):
    """Train all three models on the world; returns (models, variables)."""
    import jax
    import jax.numpy as jnp
    import optax

    from weatherconverter_tpu.core.config import UnetModelConfig
    from weatherconverter_tpu.diffusion.schedule import linear_schedule
    from weatherconverter_tpu.models.factory import make_seg_model
    from weatherconverter_tpu.models.srgan import Generator
    from weatherconverter_tpu.models.unet import Unet
    from weatherconverter_tpu.training.diffusion import (
        create_ddpm_state,
        make_train_step,
    )
    from weatherconverter_tpu.training.losses import cross_entropy_loss
    from weatherconverter_tpu.training.segmentation import (
        create_seg_state,
        make_seg_train_step,
    )
    from weatherconverter_tpu.training.srgan import (
        SRGANState,
        make_pretrain_step,
    )

    key = jax.random.PRNGKey(seed)
    ucfg = UnetModelConfig(
        im_size=H, down_channels=[16, 32, 48], mid_channels=[48, 48, 32],
        down_sample=[True, False], time_emb_dim=32, num_down_layers=1,
        num_mid_layers=1, num_up_layers=1, num_heads=2, attn_resolutions=[8],
    )
    unet = Unet(config=ucfg, fused=False)
    # beta_end scaled so alpha_bar(T) ~ 0.08: the translate chain must
    # actually DESTROY content (like the reference's t<=500-of-1000 span
    # does) or guidance has nothing to recover and the gate cannot separate
    sched = linear_schedule(budget["T"], beta_end=0.05)

    # --- DDPM on LR images ---
    dstate = create_ddpm_state(unet, jax.random.PRNGKey(1), im_size=H, lr=2e-3)
    dstep = make_train_step(sched, donate=False)
    for i in range(budget["ddpm_steps"]):
        key, k1, k2 = jax.random.split(key, 3)
        lr_imgs, _, _ = make_world_batch(k1, budget["batch"])
        dstate, dl = dstep(dstate, lr_imgs, k2)
    log(f"ddpm: {budget['ddpm_steps']} steps, final loss {float(dl):.4f}")

    # --- seg on (HR, labels) ---
    seg_t = make_seg_model("deeplabv3_resnet18", num_classes=C, train=True)
    seg_e = make_seg_model("deeplabv3_resnet18", num_classes=C, train=False)
    sstate = create_seg_state(
        seg_t, jax.random.PRNGKey(2), optax.adam(2e-3), input_hw=(HR, HR)
    )
    sstep = make_seg_train_step(cross_entropy_loss, input_grad=False, donate=False)
    for i in range(budget["seg_steps"]):
        key, k1 = jax.random.split(key)
        _, hr_imgs, labels = make_world_batch(k1, budget["batch"])
        sstate, sl, _ = sstep(sstate, hr_imgs, labels)
    log(f"seg: {budget['seg_steps']} steps, final loss {float(sl):.4f}")
    seg_vars = {"params": sstate.params, "batch_stats": sstate.batch_stats}

    # --- SRGAN pretrain on (LR, HR) ---
    gen = Generator(num_channels=16, num_blocks=2, upscale_factor=SR)
    gv = gen.init(jax.random.PRNGKey(3), jnp.zeros((1, H, H, 3)))
    gstate = SRGANState.create(
        apply_fn=gen.apply, params=gv["params"],
        batch_stats=gv.get("batch_stats", {}), tx=optax.adam(2e-3),
    )
    gstep = make_pretrain_step("l1")
    for i in range(budget["srgan_steps"]):
        key, k1 = jax.random.split(key)
        lr_imgs, hr_imgs, _ = make_world_batch(k1, budget["batch"])
        gstate, gl = gstep(gstate, lr_imgs, hr_imgs)
    log(f"srgan: {budget['srgan_steps']} steps, final L1 {float(gl):.4f}")
    gvars = {"params": gstate.params, "batch_stats": gstate.batch_stats}

    return dict(
        unet=unet, sched=sched, uparams=dstate.params,
        seg=seg_e, seg_vars=seg_vars, gen=gen, gvars=gvars,
    )


def evaluate_settings(models, n_eval: int, num_steps: int, seed: int = 100,
                      n_seeds: int = 5, log=print):
    """Translate n_eval scenes under each guidance setting, `n_seeds` times
    each with independent chain-noise keys (the eval world is FIXED so the
    per-setting spread is pure sampling noise — the floor every separation
    claim is tested against; VERDICT r2 item 3: two seeds were not a
    distribution). Returns {setting: {stat: {mean, std, values}}}."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from weatherconverter_tpu.guidance.translate import sample_with_sgg
    from weatherconverter_tpu.metrics.fid import fid_from_batches
    from weatherconverter_tpu.metrics.quality import consistency_gap

    unet, sched = models["unet"], models["sched"]
    seg, seg_vars = models["seg"], models["seg_vars"]
    gen, gvars = models["gen"], models["gvars"]
    uparams = models["uparams"]

    key = jax.random.PRNGKey(seed)
    lr_in, hr_in, labels = make_world_batch(key, n_eval)

    # mode is STATIC python control flow inside sample_with_sgg; lam is a
    # plain array argument, so all lam settings share ONE compiled program
    def make_translate(mode):
        @jax.jit
        def translate(up, sv, gv, i_, g_, k_, lam):
            return sample_with_sgg(
                lambda xt, tt: unet.apply({"params": up}, xt, tt), sched,
                lambda im: seg.apply(sv, im),
                lambda im: gen.apply(gv, im),
                i_, g_, k_, lam=lam, num_steps=num_steps, num_classes=C,
                mode=mode, guidance_style="alternate",
                start_t=num_steps - 1,  # hardest translation: full span
            )
        return translate

    translate_fixed = make_translate("fixed")
    translate_ref = make_translate("reference")

    seg_fn = lambda x: seg.apply(seg_vars, x)
    feature_fn = lambda x: jnp.mean(
        seg.apply(seg_vars, x, method=lambda m, im: m.backbone(im))["out"],
        axis=(1, 2),
    ).astype(jnp.float32)

    settings = [
        ("lam0", 0.0, False),
        ("lam15", 15.0, False),
        ("lam60", 60.0, False),
        ("lam60_reference_mode", 60.0, True),
    ]
    report = {}
    for name, lam, is_ref in settings:
        tr = translate_ref if is_ref else translate_fixed
        fids, mious, gaps = [], [], []
        for s in range(n_seeds):
            out = tr(
                uparams, seg_vars, gvars, lr_in, labels,
                jax.random.PRNGKey(7 + 16 * s), jnp.float32(lam),
            )
            gap = consistency_gap(seg_fn, [(hr_in, labels)], [(out, labels)], C)
            fids.append(float(fid_from_batches(feature_fn, [hr_in], [out])))
            mious.append(gap["translated_miou"])
            gaps.append(gap["miou_consistency_gap"])

        def stat(vals):
            a = np.asarray(vals, dtype=np.float64)
            return {
                "mean": round(float(a.mean()), 4),
                # ddof=1: these ARE sample stds of a small sample
                "std": round(float(a.std(ddof=1)), 4),
                "values": [round(float(v), 4) for v in a],
            }

        report[name] = {
            "fid_backbone": stat(fids),
            "miou_translated": stat(mious),
            "miou_gap": stat(gaps),
            "n_seeds": n_seeds,
        }
        log(f"{name}: fid={report[name]['fid_backbone']['mean']:.2f}"
            f"±{report[name]['fid_backbone']['std']:.2f} "
            f"miou_tr={report[name]['miou_translated']['mean']:.4f}"
            f"±{report[name]['miou_translated']['std']:.4f}")
    return report


def _sep_z(hi: dict, lo: dict) -> float:
    """Gap between two settings in units of their POOLED per-seed std —
    the separation statistic every 'catches_X' claim must clear at 2."""
    import math

    pooled = math.sqrt((hi["std"] ** 2 + lo["std"] ** 2) / 2.0)
    return (hi["mean"] - lo["mean"]) / max(pooled, 1e-9)


def discrimination(report: dict) -> dict:
    """The gate's verdicts: does the report's SIGNATURE separate guidance
    settings beyond the measured seed-noise distribution (VERDICT r2 item 3:
    every claim must clear 2 pooled stds, not a one-seed point estimate)?

    Which statistic is lambda-sensitive follows from the algorithm itself:
    the reference's guidance adds the CE-gradient MAGNITUDE (a non-negative
    brightness field, sgg.py:21-23), not a signed descent direction — so
    mIoU-consistency is NOT monotone in lambda. FID(original, translated)
    is the lambda probe, and at 5 seeds it is measured U-SHAPED, not
    monotone: moderate lambda pulls backbone features toward the original's
    layout (FID 19.6 -> 10.3, z=-2.5), production lambda's magnitude energy
    shifts the distribution away (-> 324.6, z=+11.5). Discrimination needs
    every pairwise gap to clear 2 pooled sigmas — direction is reported but
    not assumed. mIoU-consistency is the MODE probe: the reference-overwrite
    bug (translation.py:90) collapses it outright."""
    m = {k: v["miou_translated"] for k, v in report.items()}
    f = {k: v["fid_backbone"] for k, v in report.items()}
    z_15_0 = _sep_z(f["lam15"], f["lam0"])
    z_60_15 = _sep_z(f["lam60"], f["lam15"])
    z_60_0 = _sep_z(f["lam60"], f["lam0"])
    z_mode = _sep_z(m["lam60"], m["lam60_reference_mode"])
    return {
        "fid_by_lambda": [f["lam0"]["mean"], f["lam15"]["mean"],
                          f["lam60"]["mean"]],
        "fid_std_by_lambda": [f["lam0"]["std"], f["lam15"]["std"],
                              f["lam60"]["std"]],
        "miou_lam60_minus_reference_mode": round(
            m["lam60"]["mean"] - m["lam60_reference_mode"]["mean"], 4
        ),
        # separation z-scores (gap / pooled per-seed std); claims need > 2
        "z_fid_lam15_vs_lam0": round(z_15_0, 2),
        "z_fid_lam60_vs_lam15": round(z_60_15, 2),
        "z_fid_lam60_vs_lam0": round(z_60_0, 2),
        "z_miou_fixed_vs_reference_mode": round(z_mode, 2),
        "fid_monotone_in_lambda": bool(
            f["lam0"]["mean"] < f["lam15"]["mean"] < f["lam60"]["mean"]
        ),
        # monotonicity is a MEASURED property, not a requirement: at 5 seeds
        # it is significantly FALSE (U-shape, lam15 below lam0 at z=-2.5 —
        # see the module docstring). Both fields stay for the record.
        "fid_monotone_beyond_2sigma": bool(z_15_0 > 2.0 and z_60_15 > 2.0),
        # what discrimination DOES require of the lam15 leg: it must be
        # distinguishable from lam0 beyond 2 sigma in EITHER direction
        "fid_lam15_separates_from_lam0": bool(abs(z_15_0) > 2.0),
        # the round-3 bug shipped lam=15 where 60 was intended: caught iff
        # lam60 separates from lam15 beyond 2 sigma of seed noise
        "catches_lam15_regression": bool(z_60_15 > 2.0),
        "catches_guidance_off": bool(z_60_0 > 2.0),
        "catches_reference_overwrite": bool(
            z_mode > 2.0
            and m["lam60"]["mean"] > m["lam60_reference_mode"]["mean"] + 0.05
        ),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--seeds", type=int, default=5,
                    help="independent chain-noise seeds per setting (>=5 for "
                         "the committed artifact; every claim needs 2 sigma)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))

    budget = (
        dict(T=100, ddpm_steps=120, seg_steps=120, srgan_steps=150, batch=16)
        if args.fast
        else dict(T=100, ddpm_steps=600, seg_steps=800, srgan_steps=500, batch=16)
    )
    models = tiny_train(budget)
    report = evaluate_settings(models, n_eval=16, num_steps=50,
                               n_seeds=args.seeds)
    disc = discrimination(report)

    out = {
        "data": f"structured synthetic world ({C} color-coded classes, "
                f"{H}px latents, {SR}x SR)",
        "weights": "tiny-TRAINED with the framework's real train steps "
                   "(ddpm eps-MSE, seg CE, srgan L1) — not random-init",
        "budget": budget,
        "translate_steps": 50,
        "n_seeds_per_setting": args.seeds,
        "settings": report,
        "discrimination": disc,
    }
    os.makedirs(os.path.join(REPO, "outputs"), exist_ok=True)
    path = os.path.join(REPO, "outputs", "quality_r05.json")
    with open(path, "w") as fjson:
        json.dump(out, fjson, indent=2)
    print(f"wrote {path}")
    print(json.dumps(disc))
    ok = (
        disc["catches_guidance_off"]
        and disc["catches_reference_overwrite"]
        and disc["catches_lam15_regression"]
        and disc["fid_lam15_separates_from_lam0"]
    )  # monotonicity is NOT required — it is measured-false at 5 seeds
    # (U-shape, module docstring). Discrimination = the three regression
    # probes fire AND every lambda setting separates from its neighbor
    # beyond 2 pooled sigmas (VERDICT r2 item 3: claims need error bars).
    print("GATE DISCRIMINATES" if ok else "GATE DOES NOT DISCRIMINATE")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
