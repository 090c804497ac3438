"""Multi-host DP worker (spawned by test_distributed_multihost.py).

Runs ONE DP-sharded DDPM train step over the GLOBAL mesh spanning all
processes, through the framework's real multi-host path:
maybe_initialize_distributed (env-var config) -> make_mesh over global
devices -> global_batch_from_local (per-host data) -> make_train_step
(gradient all-reduce over the collective fabric). Prints the step loss —
the parent asserts all processes agree and match a single-process run.

Usage: python tests/mh_ddpm_worker.py <process_id> <num_processes> <port> [local_devices=4]
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
ndev = int(sys.argv[4]) if len(sys.argv) > 4 else 4
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={ndev}"
).strip()
os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["JAX_NUM_PROCESSES"] = str(nproc)
os.environ["JAX_PROCESS_ID"] = str(pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from weatherconverter_tpu.parallel.distributed import (
    global_batch_from_local,
    is_primary,
    maybe_initialize_distributed,
)

assert maybe_initialize_distributed(), "env-configured init should trigger"
assert jax.process_count() == nproc

import numpy as np

from weatherconverter_tpu.core.config import UnetModelConfig
from weatherconverter_tpu.diffusion.schedule import linear_schedule
from weatherconverter_tpu.models.unet import Unet
from weatherconverter_tpu.parallel.sharding import make_mesh, replicate
from weatherconverter_tpu.training.diffusion import create_ddpm_state, make_train_step

cfg = UnetModelConfig(
    im_size=16, down_channels=[8, 16, 24], mid_channels=[24, 24, 16],
    down_sample=[True, False], time_emb_dim=16, num_down_layers=1,
    num_mid_layers=1, num_up_layers=1, num_heads=2, attn_resolutions=[8],
)
model = Unet(config=cfg, fused=False)
sched = linear_schedule(16)
mesh = make_mesh()  # global devices across all processes

state = create_ddpm_state(model, jax.random.PRNGKey(0), im_size=16, lr=1e-3)
state = replicate(mesh, state)
step = make_train_step(sched, mesh=mesh, donate=False)

# deterministic GLOBAL batch: every process materializes the full batch and
# contributes its own slice (per-host loading in real runs)
global_batch = 2 * jax.device_count()
rng = np.random.RandomState(0)
full = rng.randn(global_batch, 16, 16, 3).astype(np.float32)
per_proc = global_batch // nproc
local = full[pid * per_proc : (pid + 1) * per_proc]
images = global_batch_from_local(mesh, local)
key = replicate(mesh, jax.random.PRNGKey(2))

state, loss = step(state, images, key)
print(f"MHLOSS {float(loss):.8f} primary={is_primary()}", flush=True)
