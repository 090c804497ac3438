"""Training numerics policy check: bf16 activations vs f32 on the tiny world.

VERDICT r3 item 8. The framework's training precision policy (also stated in
PROFILE.md "Training numerics"):

  * params, optimizer state, EMA: float32 always (flax param_dtype default;
    Adam moments and the EMA buffer live in f32 — torch-checkpoint parity
    and bitwise-stable resume depend on it).
  * activations: the model `dtype` argument. Library default f32 (matches
    the reference's fp32 torch training); the TPU bench and the documented
    production recipe use bf16 activations (MXU native rate). Gradients are
    produced per-param in f32 (cotangents accumulate into the param dtype).
  * loss + metrics: f32 (the eps-MSE reduction upcasts, training/diffusion.py).

This script adjudicates the bf16-activation option the way the parity gate
adjudicates guidance levers: train the tiny-world DDPM with (a) f32 seeds
0..N-1 and (b) bf16 seed 0, and require the bf16-vs-f32 same-seed gap in
held-out eps-MSE to sit within the f32 seed-to-seed spread (|z| <= 2).

Usage: python scripts/numerics_check.py [--seeds 3] [--steps 300]
                                        [--json outputs/numerics_r06.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["JAX_PLATFORMS"] = "cpu"

H = 16  # tiny-world image size (quality_gate.py scale)


def train_one(seed: int, steps: int, dtype_name: str) -> dict:
    import jax
    import jax.numpy as jnp

    from weatherconverter_tpu.core.config import UnetModelConfig
    from weatherconverter_tpu.diffusion.schedule import linear_schedule
    from weatherconverter_tpu.models.unet import Unet
    from weatherconverter_tpu.training.diffusion import (
        create_ddpm_state,
        make_train_step,
    )

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    ucfg = UnetModelConfig(
        im_size=H, down_channels=[16, 32, 48], mid_channels=[48, 48, 32],
        down_sample=[True, False], time_emb_dim=32, num_down_layers=1,
        num_mid_layers=1, num_up_layers=1, num_heads=2, attn_resolutions=[8],
    )
    unet = Unet(config=ucfg, fused=False, dtype=dtype)
    sched = linear_schedule(100, beta_end=0.05)
    state = create_ddpm_state(unet, jax.random.PRNGKey(1000 + seed), im_size=H, lr=2e-3)
    step = make_train_step(sched, donate=False)

    key = jax.random.PRNGKey(seed)
    data_key = jax.random.PRNGKey(7)  # SAME data stream for every run
    losses = []
    for i in range(steps):
        dk = jax.random.fold_in(data_key, i)
        imgs = jax.random.uniform(dk, (8, H, H, 3), minval=-1.0, maxval=1.0)
        key, k2 = jax.random.split(key)
        state, loss = step(state, imgs, k2)
        losses.append(float(loss))

    # held-out eps-MSE at a fixed (batch, t, noise): the quality scalar
    ek = jax.random.PRNGKey(999)
    e1, e2, e3 = jax.random.split(ek, 3)
    imgs = jax.random.uniform(e1, (16, H, H, 3), minval=-1.0, maxval=1.0)
    noise = jax.random.normal(e2, imgs.shape)
    t = jax.random.randint(e3, (16,), 0, 100)
    from weatherconverter_tpu.diffusion.schedule import q_sample

    xt = q_sample(sched, imgs, noise, t)
    pred = state.apply_fn({"params": state.params}, xt, t)
    mse = float(jnp.mean((pred.astype(jnp.float32) - noise) ** 2))
    return {
        "seed": seed, "dtype": dtype_name,
        "final_train_loss_mean50": round(sum(losses[-50:]) / 50, 5),
        "heldout_eps_mse": round(mse, 5),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    runs = []
    for s in range(args.seeds):
        r = train_one(s, args.steps, "f32")
        print(r)
        runs.append(r)
    b = train_one(0, args.steps, "bf16")
    print(b)

    f32_mses = [r["heldout_eps_mse"] for r in runs]
    mu = statistics.mean(f32_mses)
    sigma = statistics.stdev(f32_mses) if len(f32_mses) > 1 else float("nan")
    z = (b["heldout_eps_mse"] - mu) / sigma if sigma and sigma > 0 else float("inf")
    verdict = "PASS" if abs(z) <= 2.0 else "FAIL"
    out = {
        "method": "tiny-world DDPM (quality_gate.py scale), identical data "
                  "stream, %d steps; bf16 = bf16 activations with f32 "
                  "params/opt/EMA (the TPU bench and production-recipe "
                  "configuration); criterion |z| <= 2 vs the f32 "
                  "seed-to-seed spread" % args.steps,
        "f32_runs": runs,
        "bf16_run": b,
        "f32_heldout_mu": round(mu, 5),
        "f32_heldout_sigma": round(sigma, 5),
        "bf16_z": round(z, 3),
        "verdict": verdict,
    }
    print(json.dumps({k: out[k] for k in ("f32_heldout_mu", "f32_heldout_sigma", "bf16_z", "verdict")}))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
