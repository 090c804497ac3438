"""Preemption-safe training (VERDICT r4 item 8; SURVEY §5 failure
detection): SIGTERM to a REAL training process must flush a checkpoint and
exit cleanly, and a resume must restore that checkpoint bit-identically and
continue. Reference anchor: the epoch-cadence-only torch.save + resume
(diffusion_model/train_ddpm.py:81-84,140-141) — the reference loses all
mid-epoch progress on preemption."""

import os
import signal
import subprocess
import sys
import time

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "preempt_worker.py")


def _spawn(workdir: str, phase: str, loop_kind: str) -> subprocess.Popen:
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # single-device is enough; 8 virtual devs slow compiles
    return subprocess.Popen(
        [sys.executable, WORKER, workdir, phase, loop_kind],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
    )


def _wait_for_steps(workdir: str, n: int, timeout: float, proc) -> None:
    metrics = os.path.join(workdir, "out", "0", "metrics.jsonl")
    deadline = time.time() + timeout
    while time.time() < deadline:
        if proc.poll() is not None:
            raise AssertionError(
                f"worker exited early (rc={proc.returncode}):\n{proc.stdout.read()}"
            )
        try:
            with open(metrics) as f:
                if sum(1 for _ in f) >= n:
                    return
        except FileNotFoundError:
            pass
        time.sleep(0.2)
    proc.kill()
    raise AssertionError(f"no {n} logged steps within {timeout}s:\n" + (
        open(metrics).read() if os.path.exists(metrics) else "<no metrics file>"))


def _parse(line_prefix: str, text: str) -> dict:
    for line in text.splitlines():
        if line.startswith(line_prefix):
            return dict(kv.split("=", 1) for kv in line.split()[1:])
    raise AssertionError(f"no {line_prefix!r} line in output:\n{text}")


@pytest.mark.parametrize("loop_kind", ["ddpm", "seg"])
def test_sigterm_flushes_checkpoint_and_resume_continues(tmp_path, loop_kind):
    wd = str(tmp_path)
    proc = _spawn(wd, "run", loop_kind)
    try:
        _wait_for_steps(wd, 3, timeout=600, proc=proc)
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, f"preempted worker crashed (rc={proc.returncode}):\n{out}"
    final = _parse("FINAL", out)
    assert "preempted" in out and "checkpoint flushed" in out, out

    ckpt_dir = os.path.join(wd, "out", "0", "checkpoints")
    steps = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
    assert steps, f"no checkpoint flushed under {ckpt_dir}"
    # save_interval is 10k: the ONLY possible checkpoint is the preempt flush
    assert int(max(steps, key=int)) >= int(final.get("step", 1)) or loop_kind == "seg"

    r = _spawn(wd, "resume", loop_kind)
    out2, _ = r.communicate(timeout=900)
    assert r.returncode == 0, f"resume worker crashed (rc={r.returncode}):\n{out2}"
    if loop_kind == "ddpm":
        resumed = _parse("RESUMED", out2)
        # bit-identical restore of the preempt-flushed state
        assert resumed["digest"] == final["digest"], out2
        assert resumed["step"] == final["step"], out2
        final2 = _parse("FINAL", out2)
        assert int(final2["step"]) == int(resumed["step"]) + 2, out2
        assert final2["digest"] != resumed["digest"]  # training actually advanced
    else:
        final2 = _parse("FINAL", out2)
        assert int(final2["step"]) >= int(final["step"]) + 2, out2


def test_preemption_guard_latches_and_restores_handler():
    """Unit: the guard latches SIGTERM into a flag without raising, and
    __exit__ restores the previous handler."""
    from weatherconverter_tpu.core.preempt import PreemptionGuard

    seen = []
    prev = signal.signal(signal.SIGTERM, lambda s, f: seen.append(s))
    try:
        with PreemptionGuard() as g:
            assert not g.triggered
            signal.raise_signal(signal.SIGTERM)
            assert g.triggered and g.received == signal.SIGTERM
            assert seen == []  # our handler intercepted, not the outer one
        signal.raise_signal(signal.SIGTERM)
        assert seen == [signal.SIGTERM]  # outer handler restored
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_preempt_save_index_monotonic(tmp_path):
    from weatherconverter_tpu.core.checkpoint import CheckpointManager
    from weatherconverter_tpu.core.preempt import preempt_save_index

    mgr = CheckpointManager(str(tmp_path / "ck"))
    assert preempt_save_index(mgr, 7) == 7
    assert preempt_save_index(mgr, 0) == 1
    mgr.save(9, {"a": 1})
    mgr.wait()
    assert preempt_save_index(mgr, 7) == 10  # never below the latest save
    mgr.close()
