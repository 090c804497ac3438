"""PyTorch -> JAX checkpoint bridge.

The reference's shipped artifacts are torch.save dicts (SURVEY.md §5):
  - diffusion: {'model_state_dict', 'optimizer_state_dict', 'epoch'}
    (reference: diffusion_model/train_ddpm.py:56-60)
  - seg:       adds 'scheduler_state_dict', 'loss' (seg train.py:94-100)
  - srgan:     {'model': generator state} (srgan inference.py:13)
  - legacy:    old_model/1000-checkpoint.ckpt (sample_integrated.py:89)

This module converts those state dicts into the flax param/batch-stats trees
of the corresponding weatherconverter_tpu models, with the layout changes a
NCHW->NHWC port needs:
  - Conv2d weight (O, I, kh, kw)        -> kernel (kh, kw, I, O)
  - Depthwise conv (C, 1, kh, kw)       -> kernel (kh, kw, 1, C)
  - ConvTranspose2d weight (I, O, kh, kw) -> kernel (kh, kw, O, I)
  - Linear weight (O, I)                -> kernel (I, O)
  - BatchNorm running_mean/var          -> batch_stats collection
  - MultiheadAttention in_proj_weight (3C, C) -> qkv kernel (C, 3C)

All converters are validated by output-parity tests that instantiate the
reference torch modules on CPU (tests/test_compat.py).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


# ---------------------------------------------------------------------------
# Generic helpers
# ---------------------------------------------------------------------------


def to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def conv_w(t) -> np.ndarray:
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return to_np(t).transpose(2, 3, 1, 0)


def depthwise_w(t) -> np.ndarray:
    """(C, 1, kh, kw) -> (kh, kw, 1, C) (flax feature_group_count layout)."""
    return to_np(t).transpose(2, 3, 1, 0)


def convt_w(t) -> np.ndarray:
    """(I, O, kh, kw) -> (kh, kw, O, I) — the layout conv_transpose_torch
    expects (models/layers.py)."""
    return to_np(t).transpose(2, 3, 1, 0)


def linear_w(t) -> np.ndarray:
    return to_np(t).transpose()


def load_torch_checkpoint(path: str) -> dict:
    """torch.load on CPU, unwrapping the reference's wrapper dicts."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("model_state_dict", "state_dict", "model"):
            if key in obj and isinstance(obj[key], dict):
                return obj[key]
    return obj


def strip_prefix(sd: Mapping[str, Any], prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _gn(sd, name):
    return {"scale": to_np(sd[f"{name}.weight"]), "bias": to_np(sd[f"{name}.bias"])}


def _conv(sd, name, transposed=False, depthwise=False):
    w = sd[f"{name}.weight"]
    if transposed:
        kernel = convt_w(w)
    elif depthwise:
        kernel = depthwise_w(w)
    else:
        kernel = conv_w(w)
    out = {"kernel": kernel}
    if f"{name}.bias" in sd:
        out["bias"] = to_np(sd[f"{name}.bias"])
    return out


def _linear(sd, name):
    out = {"kernel": linear_w(sd[f"{name}.weight"])}
    if f"{name}.bias" in sd:
        out["bias"] = to_np(sd[f"{name}.bias"])
    return out


def _bn(sd, name):
    """Returns (params, stats) for flax nn.BatchNorm."""
    params = {
        "scale": to_np(sd[f"{name}.weight"]),
        "bias": to_np(sd[f"{name}.bias"]),
    }
    stats = {
        "mean": to_np(sd[f"{name}.running_mean"]),
        "var": to_np(sd[f"{name}.running_var"]),
    }
    return params, stats


def _mha(sd, name):
    """torch nn.MultiheadAttention -> {qkv, out} Dense params
    (SelfAttention2D layout, models/layers.py)."""
    return {
        "qkv": {
            "kernel": linear_w(sd[f"{name}.in_proj_weight"]),
            "bias": to_np(sd[f"{name}.in_proj_bias"]),
        },
        "out": {
            "kernel": linear_w(sd[f"{name}.out_proj.weight"]),
            "bias": to_np(sd[f"{name}.out_proj.bias"]),
        },
    }


# ---------------------------------------------------------------------------
# Modern DDPM UNet (reference: unet_base.py:378-449 attribute names)
# ---------------------------------------------------------------------------


def convert_unet(sd: Mapping[str, Any], config) -> dict:
    """torch Unet state_dict -> flax params for models.unet.Unet.

    Block-list naming parity: downs.{i} -> down{i}, mids.{i} -> mid{i},
    ups.{i} -> up{i}; inside a block resnet_conv_first.{j}.0 is the GN,
    .1 the conv, etc. (reference: unet_base.py:87-129,187-228,293-334).
    """
    p: dict[str, Any] = {}
    p["t_proj1"] = _linear(sd, "t_proj.0")
    p["t_proj2"] = _linear(sd, "t_proj.2")
    p["conv_in"] = _conv(sd, "conv_in")
    p["norm_out"] = _gn(sd, "norm_out")
    p["conv_out"] = _conv(sd, "conv_out")

    n_down = len(config.down_channels) - 1
    n_mid = len(config.mid_channels) - 1

    def res_block(prefix, j, t_idx=None):
        t_idx = j if t_idx is None else t_idx
        # Sequential(GN, SiLU, Conv) -> indices .0 (GN) and .2 (Conv)
        # (reference: unet_base.py:89-96)
        return {
            "norm1": _gn(sd, f"{prefix}.resnet_conv_first.{j}.0"),
            "conv1": _conv(sd, f"{prefix}.resnet_conv_first.{j}.2"),
            "time_proj": _linear(sd, f"{prefix}.t_emb_layers.{t_idx}.1"),
            "norm2": _gn(sd, f"{prefix}.resnet_conv_second.{j}.0"),
            "conv2": _conv(sd, f"{prefix}.resnet_conv_second.{j}.2"),
            "residual": _conv(sd, f"{prefix}.residual_input_conv.{j}"),
        }

    def attn_block(prefix, j):
        return {
            "norm": _gn(sd, f"{prefix}.attention_norms.{j}"),
            **_mha(sd, f"{prefix}.attentions.{j}"),
        }

    for i in range(n_down):
        prefix = f"downs.{i}"
        blk: dict[str, Any] = {}
        use_attn = f"{prefix}.attentions.0.in_proj_weight" in sd
        for j in range(config.num_down_layers):
            blk[f"res{j}"] = res_block(prefix, j)
            if use_attn:
                blk[f"attn{j}"] = attn_block(prefix, j)
        if f"{prefix}.down_sample_conv.weight" in sd:
            blk["down"] = _conv(sd, f"{prefix}.down_sample_conv")
        p[f"down{i}"] = blk

    for i in range(n_mid):
        prefix = f"mids.{i}"
        blk = {"res0": res_block(prefix, 0)}
        use_attn = f"{prefix}.attentions.0.in_proj_weight" in sd
        for j in range(config.num_mid_layers):
            if use_attn:
                blk[f"attn{j}"] = attn_block(prefix, j)
            blk[f"res{j+1}"] = res_block(prefix, j + 1)
        p[f"mid{i}"] = blk

    for i in range(n_down):
        prefix = f"ups.{i}"
        blk = {}
        if f"{prefix}.up_sample_conv.weight" in sd:
            blk["up"] = _conv(sd, f"{prefix}.up_sample_conv", transposed=True)
        use_attn = f"{prefix}.attentions.0.in_proj_weight" in sd
        for j in range(config.num_up_layers):
            blk[f"res{j}"] = res_block(prefix, j)
            if use_attn:
                blk[f"attn{j}"] = attn_block(prefix, j)
        p[f"up{i}"] = blk

    return p


# ---------------------------------------------------------------------------
# Swift-SRGAN generator/discriminator (reference: srgan_model/models.py)
# ---------------------------------------------------------------------------


def _sep_conv(sd, name):
    """SeperableConv2d: depthwise + pointwise (reference models.py:5-21)."""
    return {
        "depthwise": _conv(sd, f"{name}.depthwise", depthwise=True),
        "pointwise": _conv(sd, f"{name}.pointwise"),
    }


def convert_srgan_generator(sd: Mapping[str, Any], num_blocks: int = 16) -> tuple[dict, dict]:
    """Returns (params, batch_stats) for models.srgan.Generator.

    Reference layout (srgan_model/models.py:65-92): initial (ConvBlock
    use_bn=False + PReLU), residuals.{i} (two ConvBlocks w/ BN), convblock
    (BN, no act), upsampler.{i} (sep conv + PReLU), final_conv.
    """
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    def conv_block(name, use_bn=True, use_act=True):
        blk = {"cnn": _sep_conv(sd, f"{name}.cnn")}
        st = {}
        if use_bn:
            bp, bs = _bn(sd, f"{name}.bn")
            blk["bn"] = bp
            st["bn"] = bs
        if use_act and f"{name}.act.weight" in sd:
            blk["act"] = {"alpha": to_np(sd[f"{name}.act.weight"])}
        return blk, st

    b, _ = conv_block("initial", use_bn=False)
    params["initial"] = b
    for i in range(num_blocks):
        b1, s1 = conv_block(f"residual.{i}.block1")
        b2, s2 = conv_block(f"residual.{i}.block2", use_act=False)
        params[f"residual{i}"] = {"block1": b1, "block2": b2}
        stats[f"residual{i}"] = {"block1": s1, "block2": s2}
    b, s = conv_block("convblock", use_act=False)
    params["convblock"], stats["convblock"] = b, s
    # upsamplers: conv + pixelshuffle + prelu (models.py:38-48)
    i = 0
    while f"upsampler.{i}.conv.depthwise.weight" in sd:
        params[f"upsampler{i}"] = {
            "conv": _sep_conv(sd, f"upsampler.{i}.conv"),
            "act": {"alpha": to_np(sd[f"upsampler.{i}.act.weight"])},
        }
        i += 1
    params["final_conv"] = _sep_conv(sd, "final_conv")
    return params, stats


# ---------------------------------------------------------------------------
# Legacy alpha-plane UNet (reference: old_modules.py:230-360)
# ---------------------------------------------------------------------------


def _legacy_res_block(sd, name, residual):
    """ResidualBlock (reference old_modules.py:126-160): double_conv =
    Sequential(BN .0, Conv .1, SiLU, Conv .3); `res` 1x1 conv. Torch creates
    `res` unconditionally but only applies it when residual=True
    (old_modules.py:146,154-156) — non-residual blocks' res weights are dead
    parameters and are skipped here."""
    bn_p, bn_s = _bn(sd, f"{name}.double_conv.0")
    params = {
        "bn": bn_p,
        "conv1": _conv(sd, f"{name}.double_conv.1"),
        "conv2": _conv(sd, f"{name}.double_conv.3"),
    }
    if residual:
        params["res"] = _conv(sd, f"{name}.res")
    return params, {"bn": bn_s}


def _legacy_attn(sd, name):
    """SelfAttention (reference old_modules.py:73-94): ln -> torch MHA ->
    +x -> ff_self(LN .0, Linear .1, GELU, Linear .3) -> +."""
    return {
        "ln": {"scale": to_np(sd[f"{name}.ln.weight"]), "bias": to_np(sd[f"{name}.ln.bias"])},
        **_mha(sd, f"{name}.mha"),
        "ff_ln": {
            "scale": to_np(sd[f"{name}.ff_self.0.weight"]),
            "bias": to_np(sd[f"{name}.ff_self.0.bias"]),
        },
        "ff1": _linear(sd, f"{name}.ff_self.1"),
        "ff2": _linear(sd, f"{name}.ff_self.3"),
    }


def convert_legacy_unet(sd: Mapping[str, Any], block_depth: int = 3) -> tuple[dict, dict]:
    """torch old_modules.UNet state_dict -> (params, batch_stats) for
    models.unet_legacy.LegacyUNet.

    Architecture map (reference old_modules.py:230-360):
      pre_conv -> pre_conv; down{1..4}.residual_blocks.{i} -> down{n}/res{i}
      (first block residual, rest plain — old_modules.py:181-185);
      attn_down3/attn_down4/attn_bottleneck/attn_up1/attn_up2 -> same names;
      bottleneck1/2 -> same; up{1..4}.residual_blocks.{i} -> up{n}/res{i}
      (all residual — old_modules.py:216-220); output -> output.
    Validated by output-parity vs the torch module
    (tests/test_compat.py::test_legacy_unet_import_output_parity).
    """
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    params["pre_conv"] = _conv(sd, "pre_conv")
    params["output"] = _conv(sd, "output")

    for n in range(1, 5):
        blk_p: dict[str, Any] = {}
        blk_s: dict[str, Any] = {}
        for i in range(block_depth):
            p, s = _legacy_res_block(sd, f"down{n}.residual_blocks.{i}", residual=(i == 0))
            blk_p[f"res{i}"] = p
            blk_s[f"res{i}"] = s
        params[f"down{n}"] = blk_p
        stats[f"down{n}"] = blk_s

    for n in range(1, 5):
        blk_p = {}
        blk_s = {}
        for i in range(block_depth):
            p, s = _legacy_res_block(sd, f"up{n}.residual_blocks.{i}", residual=True)
            blk_p[f"res{i}"] = p
            blk_s[f"res{i}"] = s
        params[f"up{n}"] = blk_p
        stats[f"up{n}"] = blk_s

    for name in ("bottleneck1", "bottleneck2"):
        p, s = _legacy_res_block(sd, name, residual=True)
        params[name] = p
        stats[name] = s

    for name in ("attn_down3", "attn_down4", "attn_bottleneck", "attn_up1", "attn_up2"):
        params[name] = _legacy_attn(sd, name)

    return params, stats


# ---------------------------------------------------------------------------
# DeepLabV3 / V3+ with ResNet backbones
# (reference: seg_model/network/modeling.py + backbone/resnet.py; the
# checkpointed production config is deeplabv3plus_resnet101,
# seg config.yaml:65)
# ---------------------------------------------------------------------------

RESNET_LAYERS = {
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
    # grouped/wide variants (reference resnet.py:285-348): the grouped 3x3
    # conv2 weight (O, I/groups, 3, 3) maps to flax HWIO (3, 3, I/groups, O)
    # by the same _conv transpose — groups are implied by the shapes
    "resnext50_32x4d": (3, 4, 6, 3),
    "resnext101_32x8d": (3, 4, 23, 3),
    "wide_resnet50_2": (3, 4, 6, 3),
    "wide_resnet101_2": (3, 4, 23, 3),
}
RESNET_BASIC = {"resnet18", "resnet34"}


def _conv_bn(sd, conv_name, bn_name):
    """-> ({conv, bn params}, {bn stats}) for a ConvBNReLU-style module."""
    bp, bs = _bn(sd, bn_name)
    return {"conv": _conv(sd, conv_name), "bn": bp}, {"bn": bs}


def convert_deeplab_resnet(sd: Mapping[str, Any], backbone_name: str, include_head: bool = True) -> tuple[dict, dict]:
    """torch DeepLabV3(+)-ResNet state_dict -> (params, batch_stats) for
    models.factory.make_seg_model('deeplabv3[plus]_<resnet>').

    Backbone naming: torch `backbone.layerL.i.convK/bnK` (+ downsample.0/1)
    -> flax `backbone/layerL_i/convK/{conv,bn}` (+ downsample). Head naming
    mapped per the dumps in tests/test_compat.py.
    """
    params: dict[str, Any] = {"backbone": {}, "head": {}}
    stats: dict[str, Any] = {"backbone": {}, "head": {}}

    # stem
    bp, bs = _bn(sd, "backbone.bn1")
    params["backbone"]["stem"] = {"conv": _conv(sd, "backbone.conv1"), "bn": bp}
    stats["backbone"]["stem"] = {"bn": bs}

    nconvs = 2 if backbone_name in RESNET_BASIC else 3
    for L, blocks in enumerate(RESNET_LAYERS[backbone_name], start=1):
        for i in range(blocks):
            t = f"backbone.layer{L}.{i}"
            name = f"layer{L}_{i}"
            bparams: dict[str, Any] = {}
            bstats: dict[str, Any] = {}
            for k in range(1, nconvs + 1):
                p, s = _conv_bn(sd, f"{t}.conv{k}", f"{t}.bn{k}")
                bparams[f"conv{k}"] = p
                bstats[f"conv{k}"] = s
            if f"{t}.downsample.0.weight" in sd:
                p, s = _conv_bn(sd, f"{t}.downsample.0", f"{t}.downsample.1")
                bparams["downsample"] = p
                bstats["downsample"] = s
            params["backbone"][name] = bparams
            stats["backbone"][name] = bstats

    if include_head:
        hp, hs = _convert_deeplab_head(sd)
        params["head"], stats["head"] = hp, hs
    return params, stats


def _convert_deeplab_head(sd: Mapping[str, Any]) -> tuple[dict, dict]:
    """DeepLabHead / DeepLabHeadV3Plus + ASPP (shared across every backbone;
    reference _deeplab.py:28-59,133-162)."""
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    is_plus = "classifier.project.0.weight" in sd
    aspp_prefix = "classifier.aspp" if is_plus else "classifier.classifier.0"

    def put(dst_p, dst_s, name, conv_name, bn_name):
        p, s = _conv_bn(sd, conv_name, bn_name)
        dst_p[name] = p
        dst_s[name] = s

    aspp_p: dict[str, Any] = {}
    aspp_s: dict[str, Any] = {}
    put(aspp_p, aspp_s, "conv1x1", f"{aspp_prefix}.convs.0.0", f"{aspp_prefix}.convs.0.1")
    for j in range(3):
        put(aspp_p, aspp_s, f"atrous{j}", f"{aspp_prefix}.convs.{j+1}.0", f"{aspp_prefix}.convs.{j+1}.1")
    put(aspp_p, aspp_s, "pool_conv", f"{aspp_prefix}.convs.4.1", f"{aspp_prefix}.convs.4.2")
    put(aspp_p, aspp_s, "project", f"{aspp_prefix}.project.0", f"{aspp_prefix}.project.1")
    params["aspp"] = aspp_p
    stats["aspp"] = aspp_s

    if is_plus:
        put(params, stats, "project", "classifier.project.0", "classifier.project.1")
        put(params, stats, "classifier0", "classifier.classifier.0", "classifier.classifier.1")
        params["classifier1"] = _conv(sd, "classifier.classifier.3")
    else:
        put(params, stats, "classifier0", "classifier.classifier.1", "classifier.classifier.2")
        params["classifier1"] = _conv(sd, "classifier.classifier.4")
    return params, stats


# ---------------------------------------------------------------------------
# InceptionV3 (torchvision layout) — FID feature extractor
# ---------------------------------------------------------------------------


def convert_inception_v3(sd: Mapping[str, Any]) -> tuple[dict, dict]:
    """torchvision `inception_v3` state_dict -> (params, batch_stats) for
    models.inception.InceptionV3.

    The flax module mirrors torchvision's attribute names exactly
    (Conv2d_1a_3x3 ... Mixed_7c, every branch a BasicConv2d with conv/bn), so
    the mapping is mechanical: each `<path>.conv.weight` + `<path>.bn.*`
    becomes `<path>/{conv,bn}`; `fc` maps to the optional classifier head;
    `AuxLogits.*` (train-time head, unused at inference) is skipped.
    Accepts both torchvision ImageNet weights and the pytorch-fid port of the
    original TF-inception FID weights (same layout)."""

    def put(tree: dict, path: list[str], leaf_name: str, value):
        node = tree
        for part in path:
            node = node.setdefault(part, {})
        node[leaf_name] = value

    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    for key in sd:
        if key.startswith("AuxLogits.") or key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        if parts[-2:] == ["conv", "weight"]:
            put(params, parts[:-1], "kernel", conv_w(sd[key]))
        elif parts[-2] == "bn":
            field = parts[-1]
            if field == "weight":
                put(params, parts[:-1], "scale", to_np(sd[key]))
            elif field == "bias":
                put(params, parts[:-1], "bias", to_np(sd[key]))
            elif field == "running_mean":
                put(stats, parts[:-1], "mean", to_np(sd[key]))
            elif field == "running_var":
                put(stats, parts[:-1], "var", to_np(sd[key]))
        elif parts[0] == "fc":
            if parts[-1] == "weight":
                put(params, ["fc"], "kernel", linear_w(sd[key]))
            else:
                put(params, ["fc"], "bias", to_np(sd[key]))
    return params, stats


# ---------------------------------------------------------------------------
# DeepLabV3(+) with MobileNetV2 / Xception / HRNetV2 backbones
# (reference: modeling.py:84-110 mobilenet, :60-81 xception, :10-30 hrnet)
# ---------------------------------------------------------------------------

# mobilenet feature indices: 0 = stem ConvBNReLU, 1..17 = InvertedResidual,
# 18 = final ConvBNReLU(1280) (dropped by the factory, modeling.py:93-95).
_MOBILENET_BLOCK_RANGES = {"low_level_features": (0, 4), "high_level_features": (4, 18)}


def _mobilenet_inverted_residual(sd, prefix, has_expand):
    """InvertedResidual.conv Sequential (reference mobilenetv2.py:60-73):
    with expand: [ConvBNReLU pw, ConvBNReLU dw, Conv pw-linear, BN];
    without:    [ConvBNReLU dw, Conv pw-linear, BN]."""
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    base = 0
    if has_expand:
        bp, bs = _bn(sd, f"{prefix}.conv.0.1")
        params["expand"] = {"conv": _conv(sd, f"{prefix}.conv.0.0"), "bn": bp}
        stats["expand"] = {"bn": bs}
        base = 1
    bp, bs = _bn(sd, f"{prefix}.conv.{base}.1")
    params["depthwise"] = {
        "conv": _conv(sd, f"{prefix}.conv.{base}.0", depthwise=True), "bn": bp
    }
    stats["depthwise"] = {"bn": bs}
    bp, bs = _bn(sd, f"{prefix}.conv.{base + 2}")
    params["project"] = {"conv": _conv(sd, f"{prefix}.conv.{base + 1}"), "bn": bp}
    stats["project"] = {"bn": bs}
    return params, stats


def convert_deeplab_mobilenet(sd: Mapping[str, Any], include_head: bool = True) -> tuple[dict, dict]:
    """torch DeepLabV3(+)-MobileNetV2 state_dict -> (params, batch_stats)
    for make_seg_model('deeplabv3[plus]_mobilenet'). The factory splits
    features into low_level_features (0:4) and high_level_features (4:-1)
    and nn.Sequential slicing renumbers from 0 (modeling.py:92-95)."""
    params: dict[str, Any] = {"backbone": {}, "head": {}}
    stats: dict[str, Any] = {"backbone": {}, "head": {}}

    # NOTE: torch nn.Sequential slicing PRESERVES the original child indices,
    # so high_level_features carries keys .4 .. .17, not .0 .. .13.
    for attr, (start, stop) in _MOBILENET_BLOCK_RANGES.items():
        for feature_idx in range(start, stop):
            t = f"backbone.{attr}.{feature_idx}"
            if feature_idx == 0:  # stem ConvBNReLU
                bp, bs = _bn(sd, f"{t}.1")
                params["backbone"]["stem"] = {"conv": _conv(sd, f"{t}.0"), "bn": bp}
                stats["backbone"]["stem"] = {"bn": bs}
                continue
            has_expand = f"{t}.conv.1.0.weight" in sd and f"{t}.conv.3.weight" in sd
            bp, bs = _mobilenet_inverted_residual(sd, t, has_expand)
            params["backbone"][f"block{feature_idx}"] = bp
            stats["backbone"][f"block{feature_idx}"] = bs

    if include_head:
        hp, hs = _convert_deeplab_head(sd)
        params["head"], stats["head"] = hp, hs
    return params, stats


def _xception_sep(sd, prefix):
    """SeparableConv2d: conv1 (depthwise) + pointwise (xception.py:45-55)."""
    return {
        "conv1": _conv(sd, f"{prefix}.conv1", depthwise=True),
        "pointwise": _conv(sd, f"{prefix}.pointwise"),
    }


def convert_deeplab_xception(sd: Mapping[str, Any], include_head: bool = True) -> tuple[dict, dict]:
    """torch DeepLabV3(+)-Xception state_dict -> (params, batch_stats) for
    make_seg_model('deeplabv3[plus]_xception'). Block rep Sequentials carry
    [ReLU] SepConv BN triplets (+ trailing MaxPool); sep convs are located by
    their `conv1.weight` keys and renumbered sep0/bn0, sep1/bn1, ...
    (reference xception.py:58-105)."""
    params: dict[str, Any] = {"backbone": {}, "head": {}}
    stats: dict[str, Any] = {"backbone": {}, "head": {}}
    bb_p = params["backbone"]
    bb_s = stats["backbone"]

    for name in ("conv1", "conv2"):
        bb_p[name] = _conv(sd, f"backbone.{name}")
    for name in ("bn1", "bn2", "bn3"):
        bp, bs = _bn(sd, f"backbone.{name}")
        bb_p[name] = bp
        bb_s[name] = bs
    bb_p["conv3"] = _xception_sep(sd, "backbone.conv3")
    bb_p["conv4"] = _xception_sep(sd, "backbone.conv4")
    # bn4/fc exist in the torch tree but sit past the 'out' tap
    # (modeling.py:74; our XceptionFeatures stops at conv4) — skipped.

    for n in range(1, 13):
        t = f"backbone.block{n}"
        blk_p: dict[str, Any] = {}
        blk_s: dict[str, Any] = {}
        sep_positions = sorted(
            int(k.split(".")[3])
            for k in sd
            if k.startswith(f"{t}.rep.") and k.endswith(".conv1.weight")
        )
        for idx, pos in enumerate(sep_positions):
            blk_p[f"sep{idx}"] = _xception_sep(sd, f"{t}.rep.{pos}")
            bp, bs = _bn(sd, f"{t}.rep.{pos + 1}")
            blk_p[f"bn{idx}"] = bp
            blk_s[f"bn{idx}"] = bs
        if f"{t}.skip.weight" in sd:
            blk_p["skip"] = _conv(sd, f"{t}.skip")
            bp, bs = _bn(sd, f"{t}.skipbn")
            blk_p["skipbn"] = bp
            blk_s["skipbn"] = bs
        bb_p[f"block{n}"] = blk_p
        bb_s[f"block{n}"] = blk_s

    if include_head:
        hp, hs = _convert_deeplab_head(sd)
        params["head"], stats["head"] = hp, hs
    return params, stats


def convert_deeplab_hrnet(sd: Mapping[str, Any], num_blocks=(1, 4, 3), include_head: bool = True) -> tuple[dict, dict]:
    """torch DeepLabV3(+)-HRNetV2 state_dict -> (params, batch_stats) for
    make_seg_model('deeplabv3[plus]_hrnetv2_{32,48}')
    (reference hrnetv2.py:173-290, modeling.py:10-30)."""
    params: dict[str, Any] = {"backbone": {}, "head": {}}
    stats: dict[str, Any] = {"backbone": {}, "head": {}}
    bb_p = params["backbone"]
    bb_s = stats["backbone"]

    def conv_bn(conv_name, bn_name):
        bp, bs = _bn(sd, bn_name)
        return {"conv": _conv(sd, conv_name), "bn": bp}, {"bn": bs}

    bb_p["stem1"], bb_s["stem1"] = conv_bn("backbone.conv1", "backbone.bn1")
    bb_p["stem2"], bb_s["stem2"] = conv_bn("backbone.conv2", "backbone.bn2")

    for i in range(4):
        t = f"backbone.layer1.{i}"
        blk_p: dict[str, Any] = {}
        blk_s: dict[str, Any] = {}
        for k in (1, 2, 3):
            blk_p[f"conv{k}"], blk_s[f"conv{k}"] = conv_bn(f"{t}.conv{k}", f"{t}.bn{k}")
        if f"{t}.downsample.0.weight" in sd:
            blk_p["downsample"], blk_s["downsample"] = conv_bn(
                f"{t}.downsample.0", f"{t}.downsample.1"
            )
        bb_p[f"layer1_{i}"] = blk_p
        bb_s[f"layer1_{i}"] = blk_s

    # transition1.1 is double-wrapped Sequential (hrnetv2.py:206 comment)
    bb_p["transition1_0"], bb_s["transition1_0"] = conv_bn(
        "backbone.transition1.0.0", "backbone.transition1.0.1"
    )
    bb_p["transition1_1"], bb_s["transition1_1"] = conv_bn(
        "backbone.transition1.1.0.0", "backbone.transition1.1.0.1"
    )
    bb_p["transition2"], bb_s["transition2"] = conv_bn(
        "backbone.transition2.0", "backbone.transition2.1"
    )
    bb_p["transition3"], bb_s["transition3"] = conv_bn(
        "backbone.transition3.0", "backbone.transition3.1"
    )

    for stage, n_branches, blocks in (
        (2, 2, num_blocks[0]), (3, 3, num_blocks[1]), (4, 4, num_blocks[2])
    ):
        for b in range(blocks):
            t = f"backbone.stage{stage}.{b}"
            mod_p: dict[str, Any] = {}
            mod_s: dict[str, Any] = {}
            for i in range(n_branches):
                for blk in range(4):
                    bt = f"{t}.branches.{i}.{blk}"
                    bp: dict[str, Any] = {}
                    bs: dict[str, Any] = {}
                    for k in (1, 2):
                        bp[f"conv{k}"], bs[f"conv{k}"] = conv_bn(f"{bt}.conv{k}", f"{bt}.bn{k}")
                    mod_p[f"branch{i}_block{blk}"] = bp
                    mod_s[f"branch{i}_block{blk}"] = bs
            for o in range(n_branches):
                for i in range(n_branches):
                    ft = f"{t}.fuse_layers.{o}.{i}"
                    if i == o:
                        continue
                    if i > o:  # 1x1 conv + bn (+ nearest upsample in fwd)
                        mod_p[f"fuse{o}_{i}"], mod_s[f"fuse{o}_{i}"] = conv_bn(
                            f"{ft}.0", f"{ft}.1"
                        )
                    else:  # chain of stride-2 (conv,bn[,relu]) Sequentials
                        n_down = o - i
                        for sdx in range(n_down - 1):
                            name = f"fuse{o}_{i}_down{sdx}"
                            mod_p[name], mod_s[name] = conv_bn(
                                f"{ft}.{sdx}.0", f"{ft}.{sdx}.1"
                            )
                        name = f"fuse{o}_{i}_down_last"
                        mod_p[name], mod_s[name] = conv_bn(
                            f"{ft}.{n_down - 1}.0", f"{ft}.{n_down - 1}.1"
                        )
            bb_p[f"stage{stage}_{b}"] = mod_p
            bb_s[f"stage{stage}_{b}"] = mod_s

    if include_head:
        hp, hs = _convert_deeplab_head(sd)
        params["head"], stats["head"] = hp, hs
    return params, stats


def convert_deeplab(sd: Mapping[str, Any], model_name: str) -> tuple[dict, dict]:
    """Dispatch on the factory model name (reference modeling.py:112-124):
    every deeplabv3{,plus}_{resnet*,mobilenet,xception,hrnetv2_*} imports."""
    backbone = model_name.split("_", 1)[1]
    if backbone.startswith(("resnet", "resnext", "wide_resnet")):
        return convert_deeplab_resnet(sd, backbone)
    if backbone == "mobilenet":
        return convert_deeplab_mobilenet(sd)
    if backbone == "xception":
        return convert_deeplab_xception(sd)
    if backbone.startswith("hrnetv2"):
        return convert_deeplab_hrnet(sd)
    raise ValueError(f"unknown deeplab backbone in {model_name!r}")



# ---------------------------------------------------------------------------
# Pretrained-backbone initialization (reference: backbones download ImageNet
# weights from torch.hub — resnet.py:14-24, mobilenetv2 model_urls, hrnet
# check_pth, xception pretrained_settings; this environment has no egress,
# so these accept a user-supplied classification-checkpoint .pth)
# ---------------------------------------------------------------------------


def convert_backbone(sd: Mapping[str, Any], model_name: str) -> tuple[dict, dict]:
    """Standalone classification checkpoint (torchvision/HRNet layout, keys
    WITHOUT the 'backbone.' prefix) -> (params, batch_stats) for just the seg
    model's backbone subtree."""
    backbone = model_name
    for arch in ("deeplabv3plus_", "deeplabv3_"):
        # strip only a leading arch prefix — bare multi-underscore backbone
        # names (resnext50_32x4d, wide_resnet50_2, hrnetv2_32) must survive
        if model_name.startswith(arch):
            backbone = model_name[len(arch):]
            break
    if backbone == "mobilenet" or backbone.startswith("mobilenet"):
        # torchvision mobilenet_v2 keys are features.{i}; the deeplab wrapper
        # splits them into low/high level attrs keeping the indices
        # (modeling.py:92-95); features.18 (ConvBNReLU 1280) and classifier.*
        # are dropped by the factory
        remapped = {
            (f"backbone.{'low_level_features' if int(k.split('.')[1]) < 4 else 'high_level_features'}."
             + k.split(".", 1)[1]): v
            for k, v in sd.items()
            if k.startswith("features.") and int(k.split(".")[1]) < 18
        }
        full = convert_deeplab_mobilenet(remapped, include_head=False)
    elif backbone.startswith(("resnet", "resnext", "wide_resnet")):
        remapped = {f"backbone.{k}": v for k, v in sd.items() if not k.startswith("fc.")}
        full = convert_deeplab_resnet(remapped, backbone, include_head=False)
    elif backbone == "xception":
        remapped = {f"backbone.{k}": v for k, v in sd.items() if not k.startswith("fc.")}
        full = convert_deeplab_xception(remapped, include_head=False)
    elif backbone.startswith("hrnetv2"):
        remapped = {
            f"backbone.{k}": v for k, v in sd.items()
            if not k.startswith("bn_classifier.")
        }
        full = convert_deeplab_hrnet(remapped, include_head=False)
    else:
        raise ValueError(f"unknown backbone {model_name!r}")
    params, stats = full
    return params["backbone"], stats["backbone"]


def resolve_backbone_checkpoint(spec: str, model_name: str) -> str:
    """Fetch-by-name convenience for pretrained backbones, offline.

    The reference downloads ImageNet weights by name from torch.hub
    (resnet.py:14-24 model_urls, mobilenetv2/hrnetv2/xception equivalents);
    this environment has no egress, so `pretrained_backbone` accepts either
    a direct .pth path (returned as-is) or the name token 'imagenet' /
    'auto', which resolves the torchvision/HRNet checkpoint FILE for the
    model's backbone from the standard local caches, in order:

        $WCTPU_PRETRAINED_DIR, $TORCH_HOME/hub/checkpoints,
        ~/.cache/torch/hub/checkpoints, ./pretrained

    Matching is by canonical filename prefix (e.g. resnet101-*.pth — the
    torch.hub cache layout), so any torch-hub-downloaded checkpoint is found
    without hardcoding content hashes."""
    import glob
    import os

    if spec not in ("auto", "imagenet", "hub"):
        if not os.path.exists(spec):
            raise FileNotFoundError(
                f"pretrained_backbone {spec!r} is neither an existing file "
                "nor the token 'imagenet'/'auto'"
            )
        return spec

    backbone = model_name
    for arch in ("deeplabv3plus_", "deeplabv3_"):
        if model_name.startswith(arch):
            backbone = model_name[len(arch):]
            break
    # canonical public checkpoint filename prefixes (torch.hub cache names)
    if backbone.startswith("mobilenet"):
        patterns = ["mobilenet_v2-*.pth", "mobilenet_v2*.pth"]
    elif backbone.startswith("hrnetv2_"):
        w = backbone.split("_")[-1]
        patterns = [f"hrnetv2_w{w}*.pth", f"hrnet_w{w}*.pth",
                    f"*hrnetv2_w{w}*.pth"]
    elif backbone == "xception":
        patterns = ["xception-*.pth", "xception*.pth"]
    else:  # resnet / resnext / wide_resnet families share the layout
        patterns = [f"{backbone}-*.pth", f"{backbone}.pth"]

    search = [
        os.environ.get("WCTPU_PRETRAINED_DIR", ""),
        os.path.join(os.environ.get("TORCH_HOME", ""), "hub", "checkpoints")
        if os.environ.get("TORCH_HOME") else "",
        os.path.expanduser("~/.cache/torch/hub/checkpoints"),
        "pretrained",
    ]
    tried = []
    for d in search:
        if not d or not os.path.isdir(d):
            continue
        for pat in patterns:
            hits = sorted(glob.glob(os.path.join(d, pat)))
            if hits:
                return hits[0]
        tried.append(d)
    raise FileNotFoundError(
        f"no cached ImageNet checkpoint for backbone {backbone!r} "
        f"(patterns {patterns}) in {tried or search}; download one with "
        "torch.hub on a connected machine or set WCTPU_PRETRAINED_DIR"
    )


def load_pretrained_backbone(variables: dict, sd: Mapping[str, Any], model_name: str) -> dict:
    """Replace the backbone subtree of freshly-initialized seg `variables`
    with weights imported from a classification checkpoint — the TPU-native
    equivalent of the reference's `pretrained_backbone=True` factory flag
    (modeling.py:128-222)."""
    bp, bs = convert_backbone(sd, model_name)
    out = {
        "params": dict(variables["params"]),
        "batch_stats": dict(variables.get("batch_stats", {})),
    }
    out["params"]["backbone"] = bp
    out["batch_stats"]["backbone"] = bs
    return out
