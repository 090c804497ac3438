"""Smoke tests for the examples/ walkthroughs (the reference's
additionals/*.ipynb analogs): each script must run end-to-end on CPU with a
minimal budget and produce its documented artifacts."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")


def _run(script, *extra, tmp_path):
    out = str(tmp_path / script.split("_")[0])
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # single-device is enough and faster here
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script), "--out", out, *extra],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, f"{script} failed:\n{proc.stdout}\n{proc.stderr}"
    return out, proc.stdout


def test_example_01_explore_data(tmp_path):
    out, stdout = _run("01_explore_data.py", tmp_path=tmp_path)
    for f in ("image_batch.png", "label_colorized.png"):
        assert os.path.exists(os.path.join(out, f))
    assert "raw id -> train id LUT" in stdout


@pytest.mark.slow
def test_example_02_seg_gradients(tmp_path):
    out, stdout = _run("02_seg_gradients.py", "--steps", "2", tmp_path=tmp_path)
    for f in ("pred.png", "grad_magnitude.png", "grad_thresholded.png",
              "latent_avg.png", "latent_max.png", "latent_interp.png"):
        assert os.path.exists(os.path.join(out, f))
    assert "guidance_field == avg-pool path" in stdout


@pytest.mark.slow
def test_example_03_gsg_step(tmp_path):
    out, stdout = _run("03_gsg_step.py", "--seg-steps", "2", "--srgan-steps", "2",
                       tmp_path=tmp_path)
    for f in ("xt.png", "sr_xt.png", "guidance_field.png", "mu_guided.png"):
        assert os.path.exists(os.path.join(out, f))
    # the +sigma-without-noise defect replication is the script's key claim
    assert "+sigma-without-noise defect" in stdout


@pytest.mark.slow
def test_example_04_train_segmentor(tmp_path):
    out, stdout = _run("04_train_segmentor.py", "--epochs", "1",
                       "--steps-per-epoch", "2", tmp_path=tmp_path)
    assert os.path.exists(os.path.join(out, "best_model.npz"))
    assert os.path.exists(os.path.join(out, "img_gt_pred.png"))
    assert "val mIoU" in stdout
