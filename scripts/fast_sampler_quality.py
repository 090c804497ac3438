"""Fast-sampler quality: DPM-Solver++(2M) vs DDIM at serving budgets.

Reuses the quality gate's tiny-TRAINED world (scripts/quality_gate.py):
trains ddpm/seg/srgan with the framework's real train steps, then runs
guided translation with each fast sampler at its serving default —
DDIM at 50 steps, DPM at 20 steps — plus the full DDPM chain as the quality
anchor, and scores each with the gate's metrics (backbone-FID vs the
original images + mIoU-consistency).

The claim under test: DPM-Solver++(2M) at 20 steps is in the same quality
band as DDIM at 50 (its convergence-order advantage is already isolated in
tests/test_sampling.py; this measures the composed guided pipeline).

Statistics (VERDICT r2 item 4): every setting runs --seeds independent
chain-noise seeds; the lam=0 solver comparison is stated either as a >2
pooled-sigma separation or as a bounded equivalence band (mean gap ± 2
sigma), never from one seed. --budget full uses the gate's full training
budget when the fast one cannot resolve the solvers.

Run:  python scripts/fast_sampler_quality.py [--seeds 5] [--budget fast|full]
Writes outputs/fast_sampler_quality.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

from quality_gate import HR, make_world_batch, tiny_train  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", default="fast", choices=["fast", "full"])
    ap.add_argument("--n-eval", type=int, default=16)
    ap.add_argument("--seeds", type=int, default=5,
                    help="independent chain-noise seeds per setting")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")

    from weatherconverter_tpu.guidance.translate import (
        sample_with_sgg,
        sample_with_sgg_ddim,
        sample_with_sgg_dpm,
    )
    from weatherconverter_tpu.metrics.fid import fid_from_batches
    from weatherconverter_tpu.metrics.quality import consistency_gap

    budget = (
        dict(T=100, ddpm_steps=120, seg_steps=120, srgan_steps=150, batch=16)
        if args.budget == "fast"
        else dict(T=100, ddpm_steps=600, seg_steps=800, srgan_steps=500, batch=16)
    )
    m = tiny_train(budget, log=print)
    unet, uparams, sched = m["unet"], m["uparams"], m["sched"]
    seg, seg_vars, gen, gvars = m["seg"], m["seg_vars"], m["gen"], m["gvars"]

    key = jax.random.PRNGKey(100)
    lr, hr, labels = make_world_batch(key, args.n_eval)

    diff_fn = lambda x, t: unet.apply({"params": uparams}, x, t)
    seg_fn = lambda x: seg.apply(seg_vars, x)
    sr_fn = lambda x: gen.apply(gvars, x)
    # fixed per-kind key indices (NOT hash(): Python string hashing is
    # per-process randomized, which made runs irreproducible — review r4)
    KIND_IDX = {"ddpm": 1, "ddim": 2, "dpm": 3}

    def translate(kind, steps, lam, seed):
        common = dict(lam=lam, num_classes=5, mode="fixed", guidance_style="gsg")
        k = jax.random.fold_in(key, KIND_IDX[kind] + 16 * seed)
        if kind == "ddpm":
            f = lambda: sample_with_sgg(
                diff_fn, sched, seg_fn, sr_fn, lr, labels, k,
                num_steps=steps, start_t=steps - 1, **common)
        elif kind == "ddim":
            f = lambda: sample_with_sgg_ddim(
                diff_fn, sched, seg_fn, sr_fn, lr, labels, k,
                num_steps=steps, span_t=sched.T // 2, **common)
        else:
            f = lambda: sample_with_sgg_dpm(
                diff_fn, sched, seg_fn, sr_fn, lr, labels, k,
                num_steps=steps, span_t=sched.T // 2, **common)
        return jax.jit(f)()

    backbone_fn = jax.jit(
        lambda x: jnp.mean(
            seg.apply(seg_vars, x, method=lambda m, im: m.backbone(im))["out"],
            axis=(1, 2),
        ).astype(jnp.float32)
    )

    report = {"budget": budget, "n_eval": args.n_eval,
              "n_seeds": args.seeds, "settings": {}, "note": (
        "lam=60 rows measure the GUIDED pipeline (FID grows with total "
        "guidance dose, i.e. with step count — the gate's lambda-monotone "
        "property along the step axis); lam=0 rows isolate SOLVER fidelity "
        "(pure denoise of the q-sampled source: lower FID = better ODE "
        "solution at that step budget)")}
    runs = [("ddpm_full", "ddpm", 50, 60.0), ("ddim_50", "ddim", 50, 60.0),
            ("ddim_20", "ddim", 20, 60.0), ("dpm_20", "dpm", 20, 60.0),
            ("dpm_10", "dpm", 10, 60.0),
            ("lam0_ddim_50", "ddim", 50, 0.0), ("lam0_ddim_20", "ddim", 20, 0.0),
            ("lam0_dpm_20", "dpm", 20, 0.0), ("lam0_dpm_10", "dpm", 10, 0.0)]
    def stat(vals):
        a = np.asarray(vals, dtype=np.float64)
        return {"mean": round(float(a.mean()), 4),
                "std": round(float(a.std(ddof=1)), 4),
                "values": [round(float(v), 4) for v in a]}

    for name, kind, steps, lam in runs:
        fids, mious, gaps = [], [], []
        for sd in range(args.seeds):
            out = translate(kind, steps, lam, sd)
            fids.append(float(fid_from_batches(backbone_fn, [hr], [out])))
            gap = consistency_gap(
                seg_fn, [(hr, labels)], [(out, labels)], num_classes=5
            )
            mious.append(gap["translated_miou"])
            gaps.append(gap["miou_consistency_gap"])
        report["settings"][name] = {
            "steps": steps,
            "fid_backbone": stat(fids),
            "miou_translated": stat(mious),
            "miou_gap": stat(gaps),
        }
        print(name, report["settings"][name], flush=True)

    s = report["settings"]

    def z_and_band(a, b):
        """Separation of a vs b in pooled sigmas + the 2-sigma equivalence
        band on the mean gap (VERDICT r2 item 4: separate or bound, never
        one-seed ordering)."""
        import math

        pooled = math.sqrt((a["std"] ** 2 + b["std"] ** 2) / 2.0)
        gap = a["mean"] - b["mean"]
        return {
            "mean_gap": round(gap, 4),
            "pooled_std": round(pooled, 4),
            "z": round(gap / max(pooled, 1e-9), 2),
            "separates_2sigma": bool(abs(gap) > 2.0 * pooled),
            "equivalence_band_2sigma": [round(gap - 2 * pooled, 4),
                                        round(gap + 2 * pooled, 4)],
        }

    # solver-fidelity comparisons (lam=0 rows): positive gap = DPM worse
    report["solver_dpm20_vs_ddim50"] = z_and_band(
        s["lam0_dpm_20"]["fid_backbone"], s["lam0_ddim_50"]["fid_backbone"])
    report["solver_dpm20_vs_ddim20"] = z_and_band(
        s["lam0_dpm_20"]["fid_backbone"], s["lam0_ddim_20"]["fid_backbone"])
    report["solver_dpm10_vs_ddim50"] = z_and_band(
        s["lam0_dpm_10"]["fid_backbone"], s["lam0_ddim_50"]["fid_backbone"])

    d50 = report["solver_dpm20_vs_ddim50"]
    if d50["separates_2sigma"]:
        verdict = ("dpm20 is measurably {} than ddim50 at lam=0 "
                   "(z={})").format(
                       "worse" if d50["mean_gap"] > 0 else "better", d50["z"])
    else:
        verdict = ("dpm20 and ddim50 are equivalent within the 2-sigma band "
                   f"{d50['equivalence_band_2sigma']} backbone-FID at lam=0; "
                   "the serving recommendation (dpm at 20 steps, 2.5x fewer "
                   "model calls than ddim-50) stands on the bounded band "
                   "plus the analytic-oracle convergence advantage "
                   "(tests/test_sampling.py)")
    report["conclusion"] = verdict
    path = os.path.join(REPO, "outputs", "fast_sampler_quality.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
