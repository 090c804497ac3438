"""Segmentation model factory — string-dispatch parity with the reference
(reference: seg_model/network/modeling.py:112-222): every
deeplabv3{,plus}_{resnet50,resnet101,mobilenet,xception,hrnetv2_32,hrnetv2_48}
name resolves to an assembled DeepLabV3 flax module with the same
output_stride -> (replace_stride_with_dilation, aspp_dilate) mapping
(reference: modeling.py:32-39 for resnet, 60-66 for xception, 84-88 for
mobilenet, 10-19 for hrnet)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from weatherconverter_tpu.models.backbones import hrnetv2, mobilenetv2, resnet, xception
from weatherconverter_tpu.models.deeplab import DeepLabHead, DeepLabHeadV3Plus, DeepLabV3


def _resnet_cfg(output_stride: int):
    if output_stride == 8:
        return (False, True, True), (12, 24, 36)
    return (False, False, True), (6, 12, 18)


def _xception_cfg(output_stride: int):
    if output_stride == 8:
        return (False, False, True, True), (12, 24, 36)
    return (False, False, False, True), (6, 12, 18)


def _aspp_for(output_stride: int):
    return (12, 24, 36) if output_stride == 8 else (6, 12, 18)


def make_seg_model(
    name: str,
    num_classes: int = 19,
    output_stride: int = 16,
    train: bool = False,
    deterministic: bool = True,
    dtype: Any = jnp.float32,
    bn_momentum: float | None = None,
    separable: bool = False,
) -> DeepLabV3:
    """Dispatch equivalent of `network.modeling.__dict__[name](...)`
    (reference: seg_model/inference.py:28-29, train.py:284-285).

    `bn_momentum` (torch convention) replicates the reference's
    `set_bn_momentum(model.backbone, 0.01)` (seg train.py:285 +
    utils.py:31-34): it becomes a DeepLabV3 module attribute and is pinned
    at each train-mode TRACE of this model — backbone at `bn_momentum`,
    head at the torch default 0.1, exactly the reference's backbone-only
    scoping. Trace-entry pinning (not construction-time) makes momentum
    per-model: building other seg models in between — e.g. the loop's eval
    model right after its train model — cannot change what this model
    trains with (a construction-time global pin regressed exactly that;
    round-4 review), and nothing leaks across models (the round-4
    order-dependent gate flake).
    """
    if name.startswith("deeplabv3plus_"):
        arch, backbone_name = "deeplabv3plus", name[len("deeplabv3plus_"):]
    elif name.startswith("deeplabv3_"):
        arch, backbone_name = "deeplabv3", name[len("deeplabv3_"):]
    else:
        raise NotImplementedError(f"unknown model name {name!r}")

    kw = dict(train=train, dtype=dtype)
    if backbone_name.startswith(("resnet", "resnext", "wide_resnet")):
        rswd, aspp = _resnet_cfg(output_stride)
        ctor = getattr(resnet, backbone_name, None)
        if ctor is None:
            raise NotImplementedError(f"unknown resnet variant {backbone_name!r}")
        backbone = ctor(replace_stride_with_dilation=rswd, **kw)
    elif backbone_name == "mobilenet":
        aspp = _aspp_for(output_stride)
        backbone = mobilenetv2.MobileNetV2Features(output_stride=output_stride, **kw)
    elif backbone_name == "xception":
        rswd, aspp = _xception_cfg(output_stride)
        backbone = xception.XceptionFeatures(replace_stride_with_dilation=rswd, **kw)
    elif backbone_name in ("hrnetv2_32", "hrnetv2_48"):
        # HRNet ASPP rates follow the reference default (modeling.py:19)
        aspp = (12, 24, 36)
        c = int(backbone_name.split("_")[-1])
        backbone = hrnetv2.HRNetV2Features(c=c, **kw)
    else:
        raise NotImplementedError(f"unknown backbone {backbone_name!r}")

    head_cls = DeepLabHeadV3Plus if arch == "deeplabv3plus" else DeepLabHead
    head = head_cls(
        num_classes=num_classes,
        aspp_dilate=aspp,
        train=train,
        deterministic=deterministic,
        separable=separable,
        dtype=dtype,
    )
    return DeepLabV3(
        backbone=backbone, head=head, train=train, bn_momentum=bn_momentum
    )


SUPPORTED_MODELS = [
    f"{arch}_{bb}"
    for arch in ("deeplabv3", "deeplabv3plus")
    for bb in ("resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
               "resnext50_32x4d", "resnext101_32x8d",
               "wide_resnet50_2", "wide_resnet101_2",
               "mobilenet", "xception", "hrnetv2_32", "hrnetv2_48")
]
