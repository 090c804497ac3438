"""Multi-host worker #2 (spawned by test_distributed_multihost.py): the
FLAGSHIP guided-translate scan + checkpoint save/restore under multi-process.

Covers what mh_ddpm_worker.py does not (VERDICT r1 item 5): per reverse step
the DP-sharded guided translation (UNet + SRGAN + seg input-grad, reference
translation.py:100-164) runs over the GLOBAL mesh with per-host batch
assembly; then a DP train step is checkpointed by the primary host, every
process restores it, and training resumes — restored continuation must be
bit-identical to the uninterrupted one on every host.

Prints:  MHTRANS <sum>            (guided translate digest, in-graph reduce)
         MHRESUME <cont> <restored>  (next-step losses)

Usage: python tests/mh_translate_worker.py <pid> <nproc> <port> <ckpt_dir> [ndev=4]
"""

import os
import sys

pid, nproc, port, ckdir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)
ndev = int(sys.argv[5]) if len(sys.argv) > 5 else 4
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

assert maybe_initialize_distributed()

import jax.numpy as jnp
import numpy as np

from weatherconverter_tpu.core.config import UnetModelConfig
from weatherconverter_tpu.diffusion.schedule import linear_schedule
from weatherconverter_tpu.guidance.translate import sample_with_sgg
from weatherconverter_tpu.models.factory import make_seg_model
from weatherconverter_tpu.models.srgan import Generator
from weatherconverter_tpu.models.unet import Unet
from weatherconverter_tpu.parallel.sharding import make_mesh, replicate
from weatherconverter_tpu.training.diffusion import create_ddpm_state, make_train_step

H, SR, C = 16, 2, 5
HR = H * SR
cfg = UnetModelConfig(
    im_size=H, down_channels=[8, 16, 24], mid_channels=[24, 24, 16],
    down_sample=[True, False], time_emb_dim=16, num_down_layers=1,
    num_mid_layers=1, num_up_layers=1, num_heads=2, attn_resolutions=[8],
)
model = Unet(config=cfg, fused=False)
sched = linear_schedule(16)
mesh = make_mesh()  # global mesh across all processes

# identical params on every process (same seed, deterministic CPU init)
uparams = model.init(
    jax.random.PRNGKey(0), jnp.zeros((1, H, H, 3)), jnp.zeros((1,), jnp.int32)
)["params"]
seg = make_seg_model("deeplabv3_resnet18", num_classes=C, train=False)
seg_vars = seg.init(jax.random.PRNGKey(1), jnp.zeros((1, HR, HR, 3)))
gen = Generator(num_channels=8, num_blocks=1, upscale_factor=SR)
gvars = gen.init(jax.random.PRNGKey(2), jnp.zeros((1, H, H, 3)))

uparams_r = replicate(mesh, uparams)
seg_vars_r = replicate(mesh, seg_vars)
gvars_r = replicate(mesh, gvars)

# ---- 1. DP guided translate over the global mesh, per-host batch assembly
global_batch = jax.device_count()  # 1 image/device
rng = np.random.RandomState(0)
full_inp = (rng.randn(global_batch, H, H, 3) * 0.2).astype(np.float32)
full_gt = rng.randint(0, C, (global_batch, HR, HR)).astype(np.int32)
per = global_batch // nproc
inp = global_batch_from_local(mesh, full_inp[pid * per : (pid + 1) * per])
gt = global_batch_from_local(mesh, full_gt[pid * per : (pid + 1) * per])
key = replicate(mesh, jax.random.PRNGKey(3))


@jax.jit
def translate_digest(up, sv, gv, i_, g_, k_):
    out = sample_with_sgg(
        lambda xt, tt: model.apply({"params": up}, xt, tt),
        sched,
        lambda im: seg.apply(sv, im),
        lambda im: gen.apply(gv, im),
        i_, g_, k_, lam=10.0, num_steps=3, num_classes=C,
        mode="fixed", start_t=2, guidance_style="alternate",
    )
    # reduce IN-GRAPH: the scalar result is replicated on every process,
    # so float() works without a cross-host gather of the sharded output
    return jnp.sum(out.astype(jnp.float32)), out.shape

digest, shape = translate_digest(uparams_r, seg_vars_r, gvars_r, inp, gt, key)
assert tuple(shape) == (global_batch, HR, HR, 3)
print(f"MHTRANS {float(digest):.6f}", flush=True)

# ---- 2. checkpoint save (primary) -> restore (all) -> resume equivalence
state = replicate(mesh, create_ddpm_state(model, jax.random.PRNGKey(4), im_size=H, lr=1e-3))
step = make_train_step(sched, mesh=mesh, donate=False)
images = global_batch_from_local(
    mesh,
    rng.randn(global_batch, H, H, 3).astype(np.float32)[pid * per : (pid + 1) * per],
)
tkey = replicate(mesh, jax.random.PRNGKey(5))
state, _ = step(state, images, tkey)


def local_full(tree):
    """Fully-replicated global arrays -> host numpy via the local shard."""
    return jax.tree_util.tree_map(
        lambda a: np.asarray(a.addressable_shards[0].data)
        if isinstance(a, jax.Array) else a,
        tree,
    )

from jax.experimental import multihost_utils

from weatherconverter_tpu.core.checkpoint import CheckpointManager, restore_auto

# EVERY process constructs the manager and calls save — orbax coordinates
# internally (its own global barriers; the primary writes). Gating on
# is_primary() deadlocks those barriers — the training loops already follow
# this all-processes pattern (loop_diffusion.py:115).
ck = CheckpointManager(ckdir)
ck.save(1, local_full(state))
ck.wait()
ck.close()
multihost_utils.sync_global_devices("ckpt_saved")
assert is_primary() == (pid == 0)

# uninterrupted continuation
tkey2 = replicate(mesh, jax.random.PRNGKey(6))
_, loss_cont = step(state, images, tkey2)

# restore into a FRESH state (different init seed — every leaf must come
# from the checkpoint) on every process, then resume
fresh = create_ddpm_state(model, jax.random.PRNGKey(99), im_size=H, lr=1e-3)
restored = restore_auto(ckdir, jax.device_get(fresh), prefer_best=False)
restored = replicate(mesh, restored)
_, loss_res = step(restored, images, tkey2)
print(f"MHRESUME {float(loss_cont):.8f} {float(loss_res):.8f}", flush=True)
