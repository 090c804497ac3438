"""Preemption worker (spawned by test_preempt.py).

Phase `run`: starts an effectively-unbounded tiny DDPM training run (1000
epochs, save_interval far beyond them, so the ONLY checkpoint that can
exist is a preemption flush). The parent waits for step lines in
metrics.jsonl, delivers SIGTERM, and this process must flush a checkpoint
through the loop's PreemptionGuard path and exit 0 printing the final
state digest.

Phase `resume`: restores from the flushed checkpoint (standalone restore —
digest must be BIT-IDENTICAL to what the preempted process printed), then
continues training for two more steps through the normal resume path.

Usage: python tests/preempt_worker.py <workdir> run|resume [loop=ddpm|seg]
"""

import hashlib
import os
import sys

workdir, phase = sys.argv[1], sys.argv[2]
loop_kind = sys.argv[3] if len(sys.argv) > 3 else "ddpm"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def digest(tree) -> str:
    leaves = jax.tree_util.tree_flatten_with_path(jax.device_get(tree))[0]
    h = hashlib.md5()
    for kp, leaf in sorted(leaves, key=lambda t: str(t[0])):
        h.update(str(kp).encode())
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    return h.hexdigest()


class FakeImages:
    def __init__(self, n=64, hw=(16, 16)):
        self.n, self.hw = n, hw

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.random.RandomState(i).randint(0, 255, self.hw + (3,), dtype=np.uint8)


class FakePairs(FakeImages):
    def __getitem__(self, i):
        rng = np.random.RandomState(i)
        img = rng.randint(0, 255, self.hw + (3,), dtype=np.uint8)
        lbl = rng.randint(0, 5, self.hw).astype(np.uint8)
        return img, lbl


if loop_kind == "ddpm":
    from weatherconverter_tpu.core.config import DiffusionConfig
    from weatherconverter_tpu.training import loop_diffusion as L

    def make_cfg(resume: bool):
        return DiffusionConfig(**{
            "model": {
                "im_size": 16, "down_channels": [8, 16, 24],
                "mid_channels": [24, 24, 16], "down_sample": [True, False],
                "time_emb_dim": 16, "num_down_layers": 1, "num_mid_layers": 1,
                "num_up_layers": 1, "num_heads": 2, "attn_resolutions": [8],
            },
            "diffusion": {"num_timesteps": 20},
            "training": {
                "epochs": 1000, "batch_size": 2, "log_interval": 1,
                "save_interval": 10_000, "num_workers": 1,
                "resume_training": resume,
                "resume_checkpoint": (
                    os.path.join(workdir, "out", "0", "checkpoints") if resume else ""
                ),
            },
            "folders": {"output": os.path.join(workdir, "out")},
        })

    dataset = FakeImages()
    train = lambda cfg, max_steps=None: L.train(cfg, max_steps=max_steps, dataset=dataset)

    def fresh_state():
        import jax.numpy as jnp

        from weatherconverter_tpu.models.unet import Unet
        from weatherconverter_tpu.training.diffusion import create_ddpm_state

        cfg = make_cfg(False)
        model = Unet(config=cfg.model, fused=False, dtype=jnp.float32)
        return create_ddpm_state(
            model, jax.random.PRNGKey(0), im_size=cfg.model.im_size, lr=cfg.training.lr
        )
else:
    from weatherconverter_tpu.core.config import SegConfig
    from weatherconverter_tpu.training import loop_segmentation as L

    def make_cfg(resume: bool):
        return SegConfig(**{
            "model": {"name": "deeplabv3_resnet18", "num_classes": 5, "output_stride": 16},
            "training": {
                "epochs": 1000, "batch_size": 2, "log_interval": 1,
                "save_interval": 10_000, "num_workers": 1,
                "resume_training": resume,
                "resume_checkpoint": (
                    os.path.join(workdir, "out", "0", "checkpoints") if resume else ""
                ),
            },
            "data": {"transform": {"target_resolution": [16, 16],
                                   "resize_resolution": [16, 16]}},
            "folders": {"output": os.path.join(workdir, "out")},
        })

    dataset = (FakePairs(), FakePairs(4))
    train = lambda cfg, max_steps=None: L.train(cfg, max_steps=max_steps, datasets=dataset)
    fresh_state = None  # ddpm-only standalone-restore check

if phase == "run":
    state = train(make_cfg(False))
    print(f"FINAL step={int(jax.device_get(state.step))} digest={digest(state.params)}",
          flush=True)
elif phase == "resume":
    ckpt_dir = os.path.join(workdir, "out", "0", "checkpoints")
    if fresh_state is not None:
        st = L.ckpt_restore_into(ckpt_dir, fresh_state())
        print(f"RESUMED step={int(jax.device_get(st.step))} digest={digest(st.params)}",
              flush=True)
        target = int(jax.device_get(st.step)) + 2
    else:
        from weatherconverter_tpu.core.checkpoint import CheckpointManager

        mgr = CheckpointManager(ckpt_dir)
        target = None  # seg derives steps from the manager's latest
        latest = mgr.latest_step()
        mgr.close()
        print(f"RESUMED latest={latest}", flush=True)
        target = latest + 2
    state = train(make_cfg(True), max_steps=target)
    print(f"FINAL step={int(jax.device_get(state.step))} digest={digest(state.params)}",
          flush=True)
else:
    raise SystemExit(f"unknown phase {phase!r}")
