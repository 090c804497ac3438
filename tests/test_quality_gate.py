"""Quality-gate discrimination (VERDICT r1 items 3-4): on tiny-TRAINED
(non-random) weights over a structured synthetic world, the gate's report
must separate guidance settings beyond noise — guidance-off, the round-3
lam=15 regression, and the reference-overwrite mode all land far outside
the blessed lam=60/'fixed' band. The lambda probe is FID (the reference's
magnitude-style guidance shifts the image distribution proportionally to
lambda); the mode probe is mIoU-consistency (the overwrite bug collapses
it). scripts/quality_gate.py runs the same machinery at full budget for the
committed outputs/quality_r04.json."""

import os
import sys

import pytest

SCRIPTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
)
if SCRIPTS not in sys.path:
    sys.path.insert(0, SCRIPTS)


@pytest.fixture(scope="module")
def gate_report():
    # The budget must match scripts/quality_gate.py --fast (the committed
    # outputs/quality_r05.json): a probe at half this budget (60/80/100
    # steps, batch 8, 30 translate steps) measured FID 15.2/14.9/17.5 for
    # lam 0/15/60 — NO separation; the weakly-trained seg model's CE
    # gradients are noise, so lambda shifts nothing. Discrimination needs
    # the trained models, not just the machinery. n_seeds=3 bounds test
    # time; the committed artifact uses >=5 (VERDICT r2 item 3).
    from quality_gate import evaluate_settings, tiny_train

    budget = dict(T=100, ddpm_steps=120, seg_steps=120, srgan_steps=150, batch=16)
    models = tiny_train(budget, log=lambda *a: None)
    return evaluate_settings(models, n_eval=16, num_steps=50, n_seeds=3,
                             log=lambda *a: None)


def test_gate_catches_guidance_off_and_lam15(gate_report):
    """The separation criterion itself (VERDICT r2 item 3): each regression
    claim must clear 2 POOLED per-seed stds, not a point estimate."""
    from quality_gate import discrimination

    disc = discrimination(gate_report)
    f = {k: v["fid_backbone"] for k, v in gate_report.items()}
    assert disc["catches_guidance_off"], (disc, f)
    assert disc["z_fid_lam60_vs_lam0"] > 2.0, disc
    assert disc["catches_lam15_regression"], (disc, f)
    assert disc["z_fid_lam60_vs_lam15"] > 2.0, disc


def test_gate_reports_seed_noise_distribution(gate_report):
    """Every setting carries a per-seed distribution (mean, std, values) —
    the floor the z-scores are computed against."""
    for name, stats in gate_report.items():
        fid = stats["fid_backbone"]
        assert len(fid["values"]) == stats["n_seeds"] >= 3, (name, fid)
        assert fid["std"] >= 0.0


def test_gate_catches_reference_overwrite(gate_report):
    from quality_gate import discrimination

    disc = discrimination(gate_report)
    assert disc["catches_reference_overwrite"], gate_report
    assert disc["z_miou_fixed_vs_reference_mode"] > 2.0, disc


def test_translation_is_faithful_at_production_settings(gate_report):
    """Sanity: at the blessed setting the translated images remain
    segmentable — mIoU-consistency does not collapse the way the
    reference-overwrite mode does (catastrophe guard, not a parity claim)."""
    m60 = gate_report["lam60"]["miou_translated"]["mean"]
    mref = gate_report["lam60_reference_mode"]["miou_translated"]["mean"]
    assert m60 > 2 * mref or m60 - mref > 0.05, (m60, mref)
