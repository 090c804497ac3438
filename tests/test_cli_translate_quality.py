"""End-to-end CLI tests for `translate` and `quality` on tiny configs —
these exercise the four-model assembly path (reference translation.py:100-164)
and the FID + mIoU-consistency quality gates (BASELINE.md north-star)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from weatherconverter_tpu.cli.main import main

TINY_YAML = """
diffusion:
  model:
    im_size: 16
    down_channels: [8, 16, 24]
    mid_channels: [24, 24, 16]
    down_sample: [true, false]
    time_emb_dim: 16
    num_down_layers: 1
    num_mid_layers: 1
    num_up_layers: 1
    num_heads: 2
    attn_resolutions: [8]
  diffusion:
    num_timesteps: 50
    beta_start: 0.0001
    beta_end: 0.02

seg:
  model:
    name: deeplabv3plus_resnet18
    num_classes: 5
    output_stride: 16

srgan:
  in_channels: 3
  num_channels: 8
  num_blocks: 1
  upscale_factor: 2

guidance:
  lambda: 10.0
  num_steps: 4
  mode: fixed
"""


@pytest.fixture()
def tiny_cfg(tmp_path):
    p = tmp_path / "translation.yaml"
    p.write_text(TINY_YAML)
    return str(p)


def test_cli_translate_end_to_end(tiny_cfg, tmp_path):
    rng = np.random.RandomState(0)
    img = tmp_path / "in.png"
    Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)).save(img)
    lbl = tmp_path / "gt.png"
    Image.fromarray(rng.randint(0, 34, (40, 40), dtype=np.uint8)).save(lbl)
    out = tmp_path / "translated.png"
    rc = main([
        "translate", "--config", tiny_cfg, "--image", str(img),
        "--label", str(lbl), "--steps", "3", "--out", str(out),
    ])
    assert rc == 0 and out.exists()


def test_cli_translate_lcg_present_k_auto_bit_exact(tiny_cfg, tmp_path):
    """--lcg-present-k auto (the default) resolves a covering K from the
    concrete label host-side and must be BIT-IDENTICAL to the full sweep
    ('off'); a truncating K (fewer than the present classes) must change
    the output; bad values are refused loudly."""
    rng = np.random.RandomState(1)
    img = tmp_path / "in.png"
    Image.fromarray(rng.randint(0, 255, (16, 16, 3), dtype=np.uint8)).save(img)
    lbl = tmp_path / "gt.png"
    plane = np.zeros((32, 32), np.uint8)
    plane[:16, :16] = 7   # road -> train-id 0
    plane[:16, 16:] = 8   # sidewalk -> 1
    plane[16:, :] = 11    # building -> 2
    Image.fromarray(plane).save(lbl)

    outs = {}
    for name, k in (("auto", "auto"), ("off", "off"), ("trunc", "2")):
        out = tmp_path / f"{name}.png"
        rc = main([
            "translate", "--config", tiny_cfg, "--image", str(img),
            "--label", str(lbl), "--steps", "4", "--seed", "3",
            "--lcg-present-k", k, "--out", str(out),
        ])
        assert rc == 0 and out.exists()
        outs[name] = np.asarray(Image.open(out))
    np.testing.assert_array_equal(outs["auto"], outs["off"])
    assert not np.array_equal(outs["trunc"], outs["off"])

    with pytest.raises(SystemExit, match="lcg-present-k"):
        main([
            "translate", "--config", tiny_cfg, "--image", str(img),
            "--label", str(lbl), "--lcg-present-k", "nope",
        ])


def test_cli_quality_synthetic_report(tiny_cfg, tmp_path):
    out = tmp_path / "quality.json"
    rc = main([
        "quality", "--config", tiny_cfg, "--synthetic", "4", "--batch", "2",
        "--steps", "3", "--out", str(out),
    ])
    assert rc == 0
    report = json.loads(out.read_text())
    assert "fid_original_vs_translated" in report
    assert np.isfinite(report["fid_original_vs_translated"])
    for k in ("miou_original", "miou_translated", "miou_consistency_gap"):
        assert np.isfinite(report[k])
    assert report["fid_kind"].startswith("seg_backbone")


def test_cli_quality_with_inception_checkpoint(tiny_cfg, tmp_path):
    """Real-FID wired end-to-end (VERDICT r1 item 7): `quality
    --inception-checkpoint <torchvision-layout .pth>` loads the checkpoint
    through compat.torch_import.convert_inception_v3 and reports
    inception_v3_pool3 FID instead of the backbone fallback. The weights are
    synthetic (random-init in the exact torchvision state-dict layout — the
    importer itself has random-weight output parity vs an independent torch
    oracle in test_losses_metrics.py); the test proves the CLI path, not a
    published-FID number."""
    import torch
    from test_losses_metrics import _torch_inception_v3_features

    pth = tmp_path / "inception_synthetic.pth"
    torch.save(_torch_inception_v3_features().state_dict(), str(pth))

    out = tmp_path / "quality_inception.json"
    rc = main([
        "quality", "--config", tiny_cfg, "--synthetic", "4", "--batch", "2",
        "--steps", "2", "--inception-checkpoint", str(pth), "--out", str(out),
    ])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["fid_kind"] == "inception_v3_pool3"
    # random-weight inception pool3 features are near input-invariant (the
    # 90-layer collapse measured in scripts/fid_relationship.py), so the FID
    # VALUE is ~0 here — the assertion is that the path runs and is finite;
    # discriminative FID needs trained weights via --inception-checkpoint
    assert np.isfinite(report["fid_original_vs_translated"])


def test_cli_super_resolve(tmp_path):
    """`super-resolve` upscales one image by the config factor (reference:
    srgan_model/inference.py standalone entry)."""
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(TINY_YAML)
    img = tmp_path / "in.png"
    Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (20, 24, 3), dtype=np.uint8)
    ).save(img)
    out = tmp_path / "sr.png"
    rc = main([
        "super-resolve", "--config", str(cfg), "--image", str(img),
        "--out", str(out),
    ])
    assert rc == 0
    sr = Image.open(out)
    assert sr.size == (48, 40)  # 2x of (24, 20) in PIL (W, H) order


def test_cli_translate_ddim(tmp_path):
    """`translate --sampler ddim --steps 4`: the fast guided path through
    the CLI."""
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(TINY_YAML)
    img = tmp_path / "in.png"
    lbl = tmp_path / "lbl.png"
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)).save(img)
    Image.fromarray(rng.randint(0, 5, (32, 32), dtype=np.uint8)).save(lbl)
    out = tmp_path / "out.png"
    rc = main([
        "translate", "--config", str(cfg), "--image", str(img),
        "--label", str(lbl), "--sampler", "ddim", "--steps", "4",
        "--out", str(out),
    ])
    assert rc == 0 and out.exists()


def test_cli_translate_dpm(tmp_path):
    """`translate --sampler dpm --steps 4`: the second-order fast guided
    path (DPM-Solver++(2M)) through the CLI."""
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(TINY_YAML)
    img = tmp_path / "in.png"
    lbl = tmp_path / "lbl.png"
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)).save(img)
    Image.fromarray(rng.randint(0, 5, (32, 32), dtype=np.uint8)).save(lbl)
    out = tmp_path / "out.png"
    rc = main([
        "translate", "--config", str(cfg), "--image", str(img),
        "--label", str(lbl), "--sampler", "dpm", "--steps", "4",
        "--out", str(out),
    ])
    assert rc == 0 and out.exists()


def test_cli_sample_dpm(tmp_path):
    """`sample --sampler dpm`: DPM-Solver++(2M) unconditional sampling."""
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(TINY_YAML)
    out = tmp_path / "s.png"
    rc = main([
        "sample", "--config", str(cfg), "--sampler", "dpm", "--steps", "4",
        "--batch", "2", "--out", str(out),
    ])
    assert rc == 0 and out.exists()


def test_cli_export_hlo(tmp_path):
    """`export-hlo`: the full guided-translate program exports as StableHLO
    text (deployment artifact for compile-once serving; params are module
    ARGUMENTS, not baked constants) — and `--program sample` too."""
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(TINY_YAML)
    out = tmp_path / "translate.mlir"
    rc = main([
        "export-hlo", "--config", str(cfg), "--steps", "3", "--batch", "2",
        "--out", str(out),
    ])
    assert rc == 0
    text = out.read_text()
    assert "stablehlo" in text and "func.func public @main" in text
    # params arrive as arguments: the main signature must carry many tensors
    sig = text.split("func.func public @main")[1].split("{")[0]
    assert sig.count("tensor<") > 20, "params appear baked, not arguments"

    out2 = tmp_path / "sample.mlir"
    rc = main([
        "export-hlo", "--config", str(cfg), "--program", "sample",
        "--steps", "3", "--batch", "2", "--out", str(out2),
    ])
    assert rc == 0 and "stablehlo" in out2.read_text()


def test_cli_translate_debug_dir_dumps_and_matches_plain(tiny_cfg, tmp_path):
    """--debug-dir dumps the reference's debug_tensor set (translation.py:
    17-39,58-92: input/gt/noised xt/xt snapshots/final SR + pred) AND the
    final image is bit-identical to the plain un-segmented run with the same
    seed — the dumps ride the chain-segmentation contract, they must not
    perturb the trajectory."""
    rng = np.random.RandomState(1)
    img = tmp_path / "in.png"
    Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)).save(img)
    lbl = tmp_path / "gt.png"
    Image.fromarray(rng.randint(0, 34, (40, 40), dtype=np.uint8)).save(lbl)
    out_plain = tmp_path / "plain.png"
    out_dbg = tmp_path / "dbg.png"
    dbg = tmp_path / "debug"
    base = [
        "translate", "--config", tiny_cfg, "--image", str(img),
        "--label", str(lbl), "--steps", "5", "--seed", "3",
    ]
    assert main(base + ["--out", str(out_plain)]) == 0
    rc = main(base + [
        "--out", str(out_dbg), "--debug-dir", str(dbg), "--debug-every", "2",
    ])
    assert rc == 0
    for name in (
        "input.png", "gt.png", "xt_5_noised.png", "xt_4.png", "xt_2.png",
        "xt_0.png", "sr_x0.png", "sr_x0_pred.png",
    ):
        assert (dbg / name).exists(), name
    a = np.asarray(Image.open(out_plain))
    b = np.asarray(Image.open(out_dbg))
    assert (a == b).all()


def test_cli_translate_debug_dir_refuses_fast_samplers(tiny_cfg, tmp_path):
    rng = np.random.RandomState(0)
    img, lbl = tmp_path / "in.png", tmp_path / "lbl.png"
    Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)).save(img)
    Image.fromarray(rng.randint(0, 5, (32, 32), dtype=np.uint8)).save(lbl)
    with pytest.raises(SystemExit, match="segment"):
        main([
            "translate", "--config", tiny_cfg, "--image", str(img),
            "--label", str(lbl), "--sampler", "ddim", "--steps", "2",
            "--debug-dir", str(tmp_path / "d"),
            "--out", str(tmp_path / "o.png"),
        ])


def test_cli_translate_fast_sampler_refuses_reference_mode(tmp_path):
    """--sampler ddim/dpm + --mode reference would silently produce unguided
    output; the CLI must refuse like serving does (ADVICE r2)."""
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(TINY_YAML)
    img, lbl = tmp_path / "in.png", tmp_path / "lbl.png"
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)).save(img)
    Image.fromarray(rng.randint(0, 5, (32, 32), dtype=np.uint8)).save(lbl)
    for sampler in ("ddim", "dpm"):
        with pytest.raises(SystemExit, match="fast-solver"):
            main([
                "translate", "--config", str(cfg), "--image", str(img),
                "--label", str(lbl), "--sampler", sampler, "--steps", "2",
                "--mode", "reference", "--out", str(tmp_path / "o.png"),
            ])


def test_discover_pairs_by_stem_not_sorted_order(tmp_path):
    """rgb/+gt/ pairing matches basename stems; equal counts with disjoint
    stems REFUSE instead of silently zipping mispaired files (ADVICE r2)."""
    from weatherconverter_tpu.cli.commands import _discover_image_label_pairs

    rgb = tmp_path / "rgb"
    gt = tmp_path / "gt"
    rgb.mkdir(), gt.mkdir()
    blank = Image.fromarray(np.zeros((4, 4), dtype=np.uint8))
    # same stems listed in DIFFERENT sorted order vs pair order: sorted-zip
    # would pair a.png<->a.png only by luck; add a decoy proving stems win
    for name in ("scene_b.png", "scene_a.png"):
        blank.save(rgb / name)
        blank.save(gt / name)
    pairs = _discover_image_label_pairs(str(tmp_path))
    assert sorted(pairs) == [
        (str(rgb / "scene_a.png"), str(gt / "scene_a.png")),
        (str(rgb / "scene_b.png"), str(gt / "scene_b.png")),
    ]

    # unequal counts: the matched subset is used, extras skipped
    blank.save(gt / "orphan_label.png")
    assert len(_discover_image_label_pairs(str(tmp_path))) == 2

    # equal counts but disagreeing stems: refuse loudly
    (gt / "orphan_label.png").unlink()
    (gt / "scene_a.png").rename(gt / "scene_c.png")
    with pytest.raises(SystemExit, match="stems match"):
        _discover_image_label_pairs(str(tmp_path))


def test_cli_quality_with_image_directory(tiny_cfg, tmp_path):
    """`quality --images <dir>`: the dataset mode runs the gates on real
    paired files (rgb/ + gt/ layout; ACDC *_rgb_anon naming also supported)
    instead of the synthetic fallback."""
    rng = np.random.RandomState(0)
    (tmp_path / "data" / "rgb").mkdir(parents=True)
    (tmp_path / "data" / "gt").mkdir(parents=True)
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)).save(
            tmp_path / "data" / "rgb" / f"{i:02d}.png")
        Image.fromarray(rng.randint(0, 34, (40, 40), dtype=np.uint8)).save(
            tmp_path / "data" / "gt" / f"{i:02d}.png")
    out = tmp_path / "q.json"
    rc = main([
        "quality", "--config", tiny_cfg, "--images", str(tmp_path / "data"),
        "--batch", "2", "--steps", "2", "--out", str(out),
    ])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["data"] == str(tmp_path / "data")
    assert np.isfinite(report["fid_original_vs_translated"])
    for k in ("miou_original", "miou_translated", "miou_consistency_gap"):
        assert np.isfinite(report[k])


def test_cli_infer_seg_six_panel(tmp_path):
    """`infer-seg --label` emits the reference's full debugging surface
    (inference.py:155-200 visualize_samples): pred + gradient magnitude +
    the 6-panel comparison strip (original, denormalized input, colorized
    pred, gradient magnitude, encoded train-id plane, gt colorized) —
    VERDICT r4 item 6. Panels are H x 6W x 3 uint8 in reference order."""
    cfg = tmp_path / "seg.yaml"
    cfg.write_text(
        """
model:
  name: deeplabv3plus_resnet18
  num_classes: 5
  output_stride: 16
data:
  transform:
    target_resolution: [32, 32]
"""
    )
    rng = np.random.RandomState(0)
    img = tmp_path / "in.png"
    Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)).save(img)
    lbl = tmp_path / "gt.png"
    Image.fromarray(rng.randint(0, 34, (40, 40), dtype=np.uint8)).save(lbl)
    out = tmp_path / "seg_out"
    rc = main([
        "infer-seg", "--config", str(cfg), "--image", str(img),
        "--label", str(lbl), "--out", str(out),
    ])
    assert rc == 0
    for name in ("pred.png", "gradient_magnitude.png", "panels.png"):
        assert (out / name).exists(), name
    panels = np.asarray(Image.open(out / "panels.png"))
    assert panels.shape == (32, 32 * 6, 3)
    # panel 6 (gt colorized) must differ from panel 5 (raw id plane) — the
    # strip is 6 distinct views, not one image tiled
    assert not np.array_equal(panels[:, 4 * 32:5 * 32], panels[:, 5 * 32:])
