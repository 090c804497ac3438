"""Multi-host DP: two REAL processes (4 virtual CPU devices each) run the
framework's DP train step over one global 8-device mesh, with cross-process
gradient all-reduce (Gloo on CPU; ICI/DCN on TPU slices). Both processes
must compute the identical loss, and it must match a single-process 8-device
run of the same step — proving the multi-host path (env-configured
jax.distributed init + per-host batch assembly) is semantics-preserving.
SURVEY.md §2.4/§5: the reference has no distributed story at all."""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "mh_ddpm_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(nproc: int, port: int):
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX_")}
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(nproc), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(nproc)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    return outs


def _loss(out: str) -> float:
    m = re.search(r"MHLOSS ([0-9.]+)", out)
    assert m, f"no loss line in:\n{out[-2000:]}"
    return float(m.group(1))


TRANSLATE_WORKER = os.path.join(ROOT, "tests", "mh_translate_worker.py")


def _run_translate_workers(nproc: int, port: int, ckdir: str, ndev: int = 4):
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX_")}
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, TRANSLATE_WORKER, str(i), str(nproc), str(port),
             ckdir, str(ndev)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(nproc)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    return outs


def _field(out: str, tag: str):
    m = re.search(rf"{tag} ([-0-9. ]+)", out)
    assert m, f"no {tag} line in:\n{out[-2000:]}"
    return [float(v) for v in m.group(1).split()]


def test_two_process_guided_translate_and_checkpoint_resume(tmp_path):
    """The flagship guided-translate scan runs data-parallel across TWO real
    processes over one global 8-device mesh with per-host batch assembly,
    and checkpoint save (primary) -> restore (all hosts) -> resume is
    bit-identical to the uninterrupted run (VERDICT r1 item 5; reference
    anchor: translation.py:100-164 — strictly single-process there)."""
    outs = _run_translate_workers(2, _free_port(), str(tmp_path / "ck"))
    digests = [_field(o, "MHTRANS")[0] for o in outs]
    assert abs(digests[0] - digests[1]) < 1e-4, f"processes disagree: {digests}"

    for o in outs:
        cont, res = _field(o, "MHRESUME")
        np.testing.assert_allclose(
            cont, res, rtol=0, atol=0,
            err_msg="restored-state continuation diverged from uninterrupted run",
        )

    # single-process 8-device run: the SAME global program must produce the
    # same translate digest (multi-process DP is semantics-preserving)
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX_")}
    env.pop("XLA_FLAGS", None)
    ref = subprocess.run(
        [sys.executable, TRANSLATE_WORKER, "0", "1", str(_free_port()),
         str(tmp_path / "ck1"), "8"],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert ref.returncode == 0, ref.stdout[-3000:]
    np.testing.assert_allclose(
        digests[0], _field(ref.stdout, "MHTRANS")[0], rtol=2e-5, atol=1e-3
    )


def test_two_process_dp_step_matches_single_process():
    outs = _run_workers(2, _free_port())
    losses = [_loss(o) for o in outs]
    assert abs(losses[0] - losses[1]) < 1e-7, f"processes disagree: {losses}"
    # exactly one primary (checkpoint/log writer election)
    primaries = [("primary=True" in o) for o in outs]
    assert sorted(primaries) == [False, True]

    # single-process reference over the SAME 8-device global mesh
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX_")}
    env.pop("XLA_FLAGS", None)
    ref_out = subprocess.run(
        [sys.executable, WORKER, "0", "1", str(_free_port()), "8"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert ref_out.returncode == 0, ref_out.stdout[-3000:]
    ref = _loss(ref_out.stdout)
    np.testing.assert_allclose(losses[0], ref, atol=1e-6, rtol=1e-6)
