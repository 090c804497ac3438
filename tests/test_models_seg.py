"""Segmentation model family tests: factory dispatch, output shapes at
output_stride 8/16, backbone feature shapes (reference:
seg_model/network/modeling.py + backbones)."""

import jax
import jax.numpy as jnp
import pytest

from weatherconverter_tpu.models.factory import SUPPORTED_MODELS, make_seg_model


def _init_and_apply(name, size=64, os_=16, num_classes=19):
    model = make_seg_model(name, num_classes=num_classes, output_stride=os_)
    x = jnp.zeros((1, size, size, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    return out, variables


@pytest.mark.parametrize("name", ["deeplabv3plus_resnet50", "deeplabv3_resnet18"])
def test_resnet_models_output_shape(name):
    out, _ = _init_and_apply(name, size=64)
    assert out.shape == (1, 64, 64, 19)


def test_resnet_output_stride8():
    out, _ = _init_and_apply("deeplabv3plus_resnet18", size=64, os_=8)
    assert out.shape == (1, 64, 64, 19)


def test_mobilenet_model():
    out, _ = _init_and_apply("deeplabv3plus_mobilenet", size=64)
    assert out.shape == (1, 64, 64, 19)


def test_xception_model():
    # The reference xception stem uses padding=0 convs (xception.py:130,134),
    # so tiny inputs collapse to zero-size maps; 128px is the minimum regime.
    out, _ = _init_and_apply("deeplabv3plus_xception", size=128)
    assert out.shape == (1, 128, 128, 19)


def test_hrnet_model():
    out, _ = _init_and_apply("deeplabv3plus_hrnetv2_32", size=64)
    assert out.shape == (1, 64, 64, 19)


def test_factory_rejects_unknown():
    with pytest.raises(NotImplementedError):
        make_seg_model("deeplabv3plus_vgg")
    with pytest.raises(NotImplementedError):
        make_seg_model("fcn_resnet50")


def test_supported_models_list():
    assert "deeplabv3plus_resnet101" in SUPPORTED_MODELS
    assert "deeplabv3_hrnetv2_48" in SUPPORTED_MODELS
    assert "deeplabv3plus_resnext50_32x4d" in SUPPORTED_MODELS
    assert "deeplabv3_wide_resnet101_2" in SUPPORTED_MODELS
    assert len(SUPPORTED_MODELS) == 26


def test_resnet_backbone_feature_channels():
    from weatherconverter_tpu.models.backbones.resnet import resnet50

    bb = resnet50()
    x = jnp.zeros((1, 64, 64, 3))
    variables = bb.init(jax.random.PRNGKey(0), x)
    feats = bb.apply(variables, x)
    # low_level 256ch at stride 4; out 2048ch at stride 16 (os16 dilation)
    assert feats["low_level"].shape == (1, 16, 16, 256)
    assert feats["out"].shape == (1, 4, 4, 2048)


def test_mobilenet_feature_channels():
    from weatherconverter_tpu.models.backbones.mobilenetv2 import MobileNetV2Features

    bb = MobileNetV2Features(output_stride=16)
    x = jnp.zeros((1, 64, 64, 3))
    variables = bb.init(jax.random.PRNGKey(0), x)
    feats = bb.apply(variables, x)
    assert feats["low_level"].shape[-1] == 24
    assert feats["out"].shape[-1] == 320


def test_hrnet_feature_channels():
    from weatherconverter_tpu.models.backbones.hrnetv2 import HRNetV2Features

    bb = HRNetV2Features(c=32)
    x = jnp.zeros((1, 64, 64, 3))
    variables = bb.init(jax.random.PRNGKey(0), x)
    feats = bb.apply(variables, x)
    assert feats["low_level"].shape[-1] == 256
    # sum of 32 * 2^i for i in 0..3 = 480 (reference: modeling.py:16-17)
    assert feats["out"].shape[-1] == 480


def test_seg_model_grad_wrt_input():
    """The SGG engine differentiates the CE loss w.r.t. the model INPUT
    (reference: seg_model/inference.py:118-152) — the whole guidance design
    rests on this path being differentiable."""
    model = make_seg_model("deeplabv3plus_resnet18", num_classes=19)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    labels = jnp.zeros((1, 32, 32), dtype=jnp.int32)

    def loss_fn(inp):
        logits = model.apply(variables, inp)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[..., None], axis=-1))

    g = jax.grad(loss_fn)(x)
    assert g.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_separable_head_variant():
    """make_seg_model(separable=True) — the convert_to_separable_conv
    capability (reference: _deeplab.py:166-178) as a construction option."""
    import jax
    import jax.numpy as jnp

    from weatherconverter_tpu.models.factory import make_seg_model

    m = make_seg_model("deeplabv3_resnet18", num_classes=4, separable=True)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    # head 3x3 convs are depthwise+pointwise pairs now
    assert "depthwise" in v["params"]["head"]["classifier0"]
    assert "depthwise" in v["params"]["head"]["aspp"]["atrous0"]
    out = m.apply(v, jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, 32, 32, 4)


def test_bn_momentum_is_per_model_and_backbone_scoped():
    """BN momentum semantics (round-4 review): (a) a train-mode model's
    configured bn_momentum governs ITS trace even when another seg model is
    constructed in between (the loop builds its eval model after the train
    model but before the first trace — a construction-time global pin
    silently trained at the 0.1 default); (b) the momentum applies to the
    BACKBONE only, head BNs keep the torch default — exactly the reference's
    set_bn_momentum(model.backbone, 0.01) scoping (seg train.py:285).
    Observable: running-stat deltas scale with torch momentum m
    (new = (1-m) old + m batch)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from weatherconverter_tpu.models.factory import make_seg_model

    x = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 32, 3))

    def stat_deltas(momentum):
        m = make_seg_model("deeplabv3_resnet18", num_classes=4, train=True,
                           bn_momentum=momentum)
        # constructing ANOTHER model before the first trace must not matter
        make_seg_model("deeplabv3_resnet18", num_classes=4)
        v = m.init(jax.random.PRNGKey(0), x)
        _, upd = m.apply(v, x, mutable=["batch_stats"])

        def delta(tree_old, tree_new):
            leaves_o = jax.tree_util.tree_leaves(tree_old)
            leaves_n = jax.tree_util.tree_leaves(tree_new)
            return float(sum(np.abs(np.asarray(a) - np.asarray(b)).sum()
                             for a, b in zip(leaves_o, leaves_n)))

        bs_old, bs_new = v["batch_stats"], upd["batch_stats"]
        return (delta(bs_old["backbone"], bs_new["backbone"]),
                delta(bs_old["head"], bs_new["head"]))

    bb_small, head_small = stat_deltas(0.01)
    bb_big, head_big = stat_deltas(0.5)
    # backbone delta scales ~linearly with the configured momentum (50x)
    ratio = bb_big / max(bb_small, 1e-12)
    assert 25.0 < ratio < 100.0, (bb_small, bb_big, ratio)
    # head stays at the torch default 0.1 in BOTH models (reference scoping)
    np.testing.assert_allclose(head_small, head_big, rtol=1e-5)
