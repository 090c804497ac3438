"""Unit tests for the ops layer: attention (Pallas vs reference), fused
GroupNorm+SiLU, time embeddings, and image primitives — checked against
closed-form math and torch CPU where torch defines the semantics we must
match (PixelShuffle, avg_pool2d, GroupNorm, MHA)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weatherconverter_tpu.ops import attention as A
from weatherconverter_tpu.ops import groupnorm as G
from weatherconverter_tpu.ops import image as I
from weatherconverter_tpu.ops import time_embed as TE

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# time embeddings
# ---------------------------------------------------------------------------


def test_timestep_embedding_formula():
    """Matches reference formula (unet_base.py:22-30)."""
    t = jnp.array([0, 1, 100, 999])
    dim = 128
    emb = TE.timestep_embedding(t, dim)
    assert emb.shape == (4, 128)
    half = dim // 2
    factor = 10000.0 ** (np.arange(half) / half)
    for i, ti in enumerate([0, 1, 100, 999]):
        args = ti / factor
        # float32 sin/cos of args up to 999 rad vs float64 numpy: ~5e-4 abs
        np.testing.assert_allclose(emb[i, :half], np.sin(args), atol=2e-3)
        np.testing.assert_allclose(emb[i, half:], np.cos(args), atol=2e-3)


def test_alpha_plane_embedding_shape_and_values():
    v = jnp.array([0.5, 0.1]).reshape(2, 1, 1, 1)
    emb = TE.alpha_plane_embedding(v, image_size=16, dim=32)
    assert emb.shape == (2, 16, 16, 32)
    # constant over the plane
    np.testing.assert_allclose(emb[0, 0, 0], emb[0, 7, 9], rtol=1e-6)
    # expected computed through the same float32 pipeline (args up to ~3141 rad
    # make float64 comparison meaningless)
    freqs = np.exp(np.linspace(np.log(1.0), np.log(1000.0), 16).astype(np.float32))
    ang = (2.0 * np.pi * freqs).astype(np.float32) * np.float32(0.5)
    np.testing.assert_allclose(emb[0, 0, 0, :16], np.sin(ang), atol=2e-3)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------


def test_attention_reference_vs_torch(rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    b, h, n, d = 2, 4, 64, 16
    q = jax.random.normal(k1, (b, h, n, d))
    k = jax.random.normal(k2, (b, h, n, d))
    v = jax.random.normal(k3, (b, h, n, d))
    out = A.attention_reference(q, k, v)
    tq, tk, tv = (torch.from_numpy(np.asarray(x)) for x in (q, k, v))
    ref = torch.nn.functional.scaled_dot_product_attention(tq, tk, tv)
    np.testing.assert_allclose(out, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_flash_attention_matches_reference(rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    b, h, n, d = 2, 2, 256, 32
    q = jax.random.normal(k1, (b, h, n, d))
    k = jax.random.normal(k2, (b, h, n, d))
    v = jax.random.normal(k3, (b, h, n, d))
    out = A.flash_attention(q, k, v)
    ref = A.attention_reference(q, k, v)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_flash_attention_grad_matches(rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    b, h, n, d = 1, 1, 32, 8
    q = jax.random.normal(k1, (b, h, n, d))
    k = jax.random.normal(k2, (b, h, n, d))
    v = jax.random.normal(k3, (b, h, n, d))

    g1 = jax.grad(lambda q_: jnp.sum(A.flash_attention(q_, k, v) ** 2))(q)
    g2 = jax.grad(lambda q_: jnp.sum(A.attention_reference(q_, k, v) ** 2))(q)
    np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-4)


def test_pick_blocks_respects_scoped_vmem_budget():
    """Block picks must keep the tuned optimum at the production shapes
    (bq=512 fwd / 128 bwd at N<=4096, D=64) and SHRINK at larger N so the
    (bq, N) score tiles fit Mosaic's 16 MiB scoped-VMEM limit — at N=16384
    (256px latents, the hbm_envelope hires row) bq=512 implies a 32 MiB f32
    tile and crashes the server-side Mosaic compiler."""
    for n in (1024, 2048, 4096):
        assert A._pick_blocks(n, 64) == (512, 512), n
        assert A._pick_bwd_block(n, 64) == 128, n
    for n in (8192, 16384):
        bq, bk = A._pick_blocks(n, 64)
        assert bq == bk and n % bq == 0
        assert bq * n * 6 + 4 * n * 64 <= 14 * 2**20, (n, bq)
        bw = A._pick_bwd_block(n, 64)
        assert n % bw == 0 and bw <= 128
    # past the resident kernels' VMEM reach both pickers signal the
    # streaming dispatch with None (fixed K/V [+ dK/dV] cost alone
    # overflows the 14 MiB budget)
    assert A._pick_bwd_block(32768, 64) is None
    assert A._pick_blocks(65536, 64) is None
    assert A._bwd_streams(32768, 64) and not A._bwd_streams(4096, 64)


def test_multi_head_attention_dispatch(rng):
    q = jax.random.normal(rng, (1, 2, 100, 8))  # 100 not divisible by 8 -> fallback
    out = A.multi_head_attention(q, q, q)
    ref = A.attention_reference(q, q, q)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_flash_attention_int8_qk_matches_reference(rng, monkeypatch):
    """The inference-only int8-QK^T flash path (WCTPU_ATTN_QK_INT8=1, the
    shipped translate/sample configuration) stays within quantization
    tolerance of exact attention at the production shape class (N>=1024,
    D=64 — the UNet's 64^2 resolution heads)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    b, h, n, d = 1, 2, 1024, 64
    q = jax.random.normal(k1, (b, h, n, d), dtype=jnp.float32)
    k = jax.random.normal(k2, (b, h, n, d), dtype=jnp.float32)
    v = jax.random.normal(k3, (b, h, n, d), dtype=jnp.float32)
    ref = A.attention_reference(q, k, v)

    monkeypatch.setenv("WCTPU_ATTN_QK_INT8", "1")
    out = A.multi_head_attention(q, k, v)
    # int8 scores perturb softmax logits by ~ (max|q|max|k|/127^2)*D/sqrt(D);
    # outputs are convex combinations of v so the error stays bounded (N(0,1)
    # inputs are the worst case — learned projections concentrate |q|,|k|)
    err = float(jnp.max(jnp.abs(out - ref)))
    scale = float(jnp.std(ref))
    assert err < 0.25 * scale, (err, scale)
    assert float(jnp.mean(jnp.abs(out - ref))) < 0.03 * scale

    monkeypatch.setenv("WCTPU_ATTN_QK_INT8", "0")
    exact = A.multi_head_attention(q, k, v)
    np.testing.assert_allclose(exact, A.flash_attention(q, k, v), rtol=0, atol=0)


# ---------------------------------------------------------------------------
# groupnorm
# ---------------------------------------------------------------------------


def test_group_norm_matches_torch(rng):
    n, h, w, c = 2, 8, 8, 32
    x = jax.random.normal(rng, (n, h, w, c))
    gamma = jnp.linspace(0.5, 1.5, c)
    beta = jnp.linspace(-0.2, 0.2, c)
    out = G.group_norm_reference(x, gamma, beta, num_groups=8)
    tx = torch.from_numpy(np.asarray(x.transpose(0, 3, 1, 2)))
    gn = torch.nn.GroupNorm(8, c)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(np.asarray(gamma)))
        gn.bias.copy_(torch.from_numpy(np.asarray(beta)))
    ref = gn(tx).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_fused_gn_silu_matches_composition(rng):
    n, h, w, c = 2, 16, 16, 64
    x = jax.random.normal(rng, (n, h, w, c))
    gamma = jnp.ones(c)
    beta = jnp.zeros(c)
    fused = G.group_norm_silu(x, gamma, beta, 8, 1e-5, True)
    ref = G.group_norm_reference(x, gamma, beta, 8, silu=True)
    np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-5)


def test_fused_gn_silu_grad(rng):
    n, h, w, c = 1, 4, 4, 16
    x = jax.random.normal(rng, (n, h, w, c))
    gamma = jnp.ones(c)
    beta = jnp.zeros(c)
    g1 = jax.grad(lambda x_: jnp.sum(G.group_norm_silu(x_, gamma, beta, 8, 1e-5, True)))(x)
    g2 = jax.grad(
        lambda x_: jnp.sum(G.group_norm_reference(x_, gamma, beta, 8, silu=True))
    )(x)
    np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# image ops
# ---------------------------------------------------------------------------


def test_avg_pool_matches_torch(rng):
    x = jax.random.normal(rng, (1, 16, 16, 3))
    out = I.avg_pool(x, 4, 4)
    tx = torch.from_numpy(np.asarray(x.transpose(0, 3, 1, 2)))
    ref = torch.nn.functional.avg_pool2d(tx, 4, 4).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_pixel_shuffle_matches_torch(rng):
    x = jax.random.normal(rng, (2, 4, 4, 16))
    out = I.pixel_shuffle(x, 2)
    tx = torch.from_numpy(np.asarray(x.transpose(0, 3, 1, 2)))
    ref = torch.nn.functional.pixel_shuffle(tx, 2).numpy().transpose(0, 2, 3, 1)
    assert out.shape == (2, 8, 8, 4)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_resize_bilinear_matches_torch(rng):
    x = jax.random.uniform(rng, (1, 8, 8, 3))
    out = I.resize_bilinear(x, (16, 16))
    tx = torch.from_numpy(np.asarray(x.transpose(0, 3, 1, 2)))
    ref = (
        torch.nn.functional.interpolate(
            tx, size=(16, 16), mode="bilinear", align_corners=False
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_center_crop():
    x = jnp.arange(1 * 6 * 6 * 1, dtype=jnp.float32).reshape(1, 6, 6, 1)
    out = I.center_crop(x, (4, 4))
    assert out.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(out[0, 0, 0, 0], x[0, 1, 1, 0])


def test_normalize_denormalize_roundtrip(rng):
    x = jax.random.uniform(rng, (1, 4, 4, 3))
    mean, std = [0.485, 0.456, 0.406], [0.229, 0.224, 0.225]
    y = I.normalize(x, mean, std)
    back = I.denormalize(y, mean, std)
    np.testing.assert_allclose(back, x, rtol=1e-5, atol=1e-6)


def test_adaptive_avg_pool_matches_torch(rng):
    x = jax.random.normal(rng, (1, 13, 13, 4))
    out = I.adaptive_avg_pool(x, (6, 6))
    tx = torch.from_numpy(np.asarray(x.transpose(0, 3, 1, 2)))
    ref = torch.nn.functional.adaptive_avg_pool2d(tx, (6, 6)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_global_avg_pool(rng):
    x = jax.random.normal(rng, (2, 5, 7, 3))
    np.testing.assert_allclose(
        I.global_avg_pool(x, keepdims=False), np.asarray(x).mean(axis=(1, 2)), rtol=1e-5
    )


def test_flash_attention_backward_matches_reference_vjp():
    """The Pallas flash BACKWARD (VMEM-blockwise, no (N,N) in HBM) must match
    jnp autodiff of the reference attention (VERDICT r1 item 9)."""
    from weatherconverter_tpu.ops.attention import attention_reference, flash_attention

    B, H, N, D = 2, 2, 256, 32
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (B, H, N, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, N, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, N, D), jnp.float32)
    g = jax.random.normal(kg, (B, H, N, D), jnp.float32)

    out_f, vjp_f = jax.vjp(flash_attention, q, k, v)
    out_r, vjp_r = jax.vjp(attention_reference, q, k, v)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r), atol=2e-5, rtol=1e-4)
    for got, want, name in zip(vjp_f(g), vjp_r(g), "qkv"):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-5, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


def test_flash_attention_backward_bf16_path():
    from weatherconverter_tpu.ops.attention import attention_reference, flash_attention

    B, H, N, D = 1, 2, 256, 32
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, N, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, N, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, N, D), jnp.bfloat16)

    def loss_f(q, k, v):
        return jnp.sum(flash_attention(q, k, v).astype(jnp.float32) ** 2)

    def loss_r(q, k, v):
        return jnp.sum(attention_reference(q, k, v).astype(jnp.float32) ** 2)

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got, dtype=np.float32), np.asarray(want, dtype=np.float32),
            atol=0.15, rtol=0.1, err_msg=f"d{name} mismatch",
        )


def test_flash_attention_backward_tile_override(monkeypatch):
    """WCTPU_ATTN_BWD_BQ (the scripts/ab_train.py backward-tile sweep knob)
    must only re-tile the grid: gradients at every legal block_q agree with
    the default pick to f32 accumulation-order tolerance, and an illegal
    (non-dividing) value is ignored rather than crashing."""
    from weatherconverter_tpu.ops.attention import flash_attention

    B, H, N, D = 1, 2, 256, 32
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(kq, (B, H, N, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, N, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, N, D), jnp.float32)
    loss = lambda q_, k_, v_: jnp.sum(flash_attention(q_, k_, v_) ** 2)

    base = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for bq in ("32", "64", "128", "256", "96"):  # 96 does not divide 256
        monkeypatch.setenv("WCTPU_ATTN_BWD_BQ", bq)
        got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        for g, b, name in zip(got, base, "qkv"):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(b), atol=1e-4, rtol=1e-4,
                err_msg=f"d{name} mismatch at bq={bq}",
            )


def test_stem_conv_packed_backward_matches_autodiff():
    """ops/packed_conv.stem_conv: forward identical to the plain XLA conv;
    custom parity-decomposed + shift-packed data-grad and the filter-grad
    both match XLA autodiff (the op sits inside jax.grad on the SGG guidance
    hot path, reference sgg.py:16 + seg stem resnet.py:121-130)."""
    from weatherconverter_tpu.ops.packed_conv import stem_conv

    def plain(x, w, s, p):
        return jax.lax.conv_general_dilated(
            x, w, (s, s), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    cases = [
        (7, 2, 3, 32, 3, 64),  # the ResNet RGB stem shape family
        (7, 2, 3, 30, 3, 64),  # odd output parity
        (3, 2, 1, 16, 3, 32),  # HRNet-style stem
        (3, 2, 1, 17, 3, 32),  # ragged spatial size
        (7, 2, 3, 33, 4, 8),   # non-3 narrow cin, narrow cout
        (3, 2, 0, 34, 3, 32),  # VALID stems (Xception conv1 / MobileNet)
        (3, 2, 0, 33, 3, 32),  # VALID + ragged
    ]
    for k, s, p, hw, ci, co in cases:
        kx, kw_, kg = jax.random.split(jax.random.PRNGKey(k * 100 + hw), 3)
        x = jax.random.normal(kx, (2, hw, hw, ci))
        w = jax.random.normal(kw_, (k, k, ci, co)) * 0.1
        np.testing.assert_allclose(
            stem_conv(x, w, s, p), plain(x, w, s, p), atol=1e-5, rtol=1e-5
        )
        ct = jax.random.normal(kg, plain(x, w, s, p).shape)
        gx_new = jax.grad(lambda xx: jnp.sum(stem_conv(xx, w, s, p) * ct))(x)
        gx_ref = jax.grad(lambda xx: jnp.sum(plain(xx, w, s, p) * ct))(x)
        np.testing.assert_allclose(gx_new, gx_ref, atol=2e-5, rtol=1e-4)
        gw_new = jax.grad(lambda ww: jnp.sum(stem_conv(x, ww, s, p) * ct))(w)
        gw_ref = jax.grad(lambda ww: jnp.sum(plain(x, ww, s, p) * ct))(w)
        np.testing.assert_allclose(gw_new, gw_ref, atol=2e-5, rtol=1e-4)


def test_resnet_stem_grad_unchanged_by_packed_path():
    """The ResNet-backed DeepLab seg input-gradient (the GSG operator's
    core) is numerically unchanged by the packed stem backward."""
    from weatherconverter_tpu.guidance.sgg import seg_input_gradients
    from weatherconverter_tpu.models.factory import make_seg_model
    from weatherconverter_tpu.models.backbones import resnet as rn

    seg = make_seg_model("deeplabv3_resnet18", num_classes=7, train=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    v = seg.init(jax.random.PRNGKey(1), x)
    gt = jax.random.randint(jax.random.PRNGKey(2), (1, 32, 32), 0, 7)
    g_packed = seg_input_gradients(lambda im: seg.apply(v, im), x, gt)

    rn._PACKED_STEM_BWD = False
    try:
        g_plain = seg_input_gradients(lambda im: seg.apply(v, im), x, gt)
    finally:
        rn._PACKED_STEM_BWD = True
    np.testing.assert_allclose(
        np.asarray(g_packed), np.asarray(g_plain), atol=1e-5, rtol=1e-4
    )


def test_flash_attention_underflow_rows_stay_finite():
    """A row whose scores all sit far below zero must not produce NaN: the
    two-sided exp clamp keeps the softmax denominator positive (one-sided
    clamping underflowed every exp to 0 -> 0/0; review round 3)."""
    from weatherconverter_tpu.ops.attention import flash_attention

    B, H, N, D = 1, 1, 256, 32
    q = jnp.full((B, H, N, D), 30.0, jnp.float32)
    k = jnp.full((B, H, N, D), -30.0, jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(0), (B, H, N, D))
    out = flash_attention(q, k, v)
    assert bool(jnp.all(jnp.isfinite(out)))
    # scores are uniform (-sqrt(D)*900 everywhere, clamped) -> softmax is
    # uniform -> output is the mean of V
    np.testing.assert_allclose(
        np.asarray(out[0, 0, 0]), np.asarray(jnp.mean(v[0, 0], axis=0)),
        atol=1e-3, rtol=1e-3,
    )
    g = jax.grad(lambda vv: jnp.sum(flash_attention(q, k, vv) ** 2))(v)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_narrow_out_conv_matches_plain_and_falls_back():
    """ops/packed_conv.narrow_out_conv: shift-packed SAME conv == plain XLA
    conv for divisible shapes; ragged shapes take the plain path."""
    from weatherconverter_tpu.ops.packed_conv import narrow_out_conv

    kx, kw_ = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (2, 16, 24, 32))
    w = jax.random.normal(kw_, (3, 3, 32, 3)) * 0.1
    bias = jnp.array([0.1, -0.2, 0.3])
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias
    out = narrow_out_conv(x, w, bias)  # 16%4==0, 24%8==0 -> packed
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)

    x2 = jax.random.normal(kx, (1, 15, 17, 32))
    ref2 = jax.lax.conv_general_dilated(
        x2, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias
    out2 = narrow_out_conv(x2, w, bias)  # ragged -> plain path
    np.testing.assert_allclose(out2, ref2, atol=1e-5, rtol=1e-5)


def test_flash_attention_backward_v2_adversarial_magnitudes(monkeypatch):
    """ADVICE r4: the v2 backward kernel (WCTPU_ATTN_BWD_V2) keeps the
    UN-normalized probs p (up to e^60 ~ 1e26) and m = p*(dpn - Dv) in bf16
    for its matmuls — a far larger dynamic range than v1's normalized
    pn <= 1. Before any default promotion it must survive adversarially
    large dO/V magnitudes: grads finite and matching the f32 reference VJP
    (moderate scores) and matching v1 bit-for-tolerance when the scores sit
    at the +-CLAMP rails."""
    from weatherconverter_tpu.ops.attention import attention_reference, flash_attention

    B, H, N, D = 1, 2, 256, 32
    kq, kk, kv, kg = jax.random.split(jax.random.PRNGKey(11), 4)

    def grads(q, k, v, g):
        return jax.vjp(flash_attention, q, k, v)[1](g)

    # --- case A: moderate scores, dO/V at 1e3 (1e6 products in the softmax
    # VJP core) — compare against the f32 reference autodiff
    q = jax.random.normal(kq, (B, H, N, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, N, D), jnp.bfloat16)
    v = (jax.random.normal(kv, (B, H, N, D)) * 1e3).astype(jnp.bfloat16)
    g = (jax.random.normal(kg, (B, H, N, D)) * 1e3).astype(jnp.bfloat16)
    monkeypatch.setenv("WCTPU_ATTN_BWD_V2", "1")
    got = grads(q, k, v, g)
    f32 = lambda t: t.astype(jnp.float32)
    ref = jax.vjp(attention_reference, f32(q), f32(k), f32(v))[1](f32(g))
    for a, r, name in zip(got, ref, "qkv"):
        a = np.asarray(a, np.float32)
        r = np.asarray(r, np.float32)
        assert np.all(np.isfinite(a)), f"d{name} non-finite in v2 kernel"
        scale = np.abs(r).max() + 1e-30
        np.testing.assert_allclose(
            a / scale, r / scale, atol=0.02,
            err_msg=f"d{name} mismatch vs f32 reference (v2, large dO/V)",
        )

    # --- case B: scores driven onto the +-CLAMP rails (unnormalized p at
    # its e^60 ceiling) AND large dO/V — v2 must agree with v1 (identical
    # clamped-softmax semantics; the reference has no clamp so it is not
    # the oracle here) and stay finite
    q = (jax.random.normal(kq, (B, H, N, D)) * 8).astype(jnp.bfloat16)
    k = (jax.random.normal(kk, (B, H, N, D)) * 8).astype(jnp.bfloat16)
    got = grads(q, k, v, g)
    monkeypatch.delenv("WCTPU_ATTN_BWD_V2")
    base = grads(q, k, v, g)
    for a, b, name in zip(got, base, "qkv"):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.all(np.isfinite(a)), f"d{name} non-finite in v2 kernel (rails)"
        scale = np.abs(b).max() + 1e-30
        np.testing.assert_allclose(
            a / scale, b / scale, atol=0.02,
            err_msg=f"d{name} v2-vs-v1 mismatch at the clamp rails",
        )


def test_flash_attention_streaming_matches_reference(monkeypatch):
    """The streaming (KV-blocked) kernels — the N >= ~20K regime where the
    resident kernels' full-K/V-in-VMEM layout cannot fit the scoped-VMEM
    limit (256px+ latent training) — must match the f32 reference VJP and
    the resident kernels bit-for-tolerance. Forced on at a CPU-tractable N
    via WCTPU_ATTN_STREAM (same trace-time-env rules as the other A/B
    knobs: fresh jit per variant here because the aval set is identical)."""
    from weatherconverter_tpu.ops import attention as A

    B, H, N, D = 1, 2, 1024, 32
    kq, kk, kv, kg = jax.random.split(jax.random.PRNGKey(5), 4)
    q = jax.random.normal(kq, (B, H, N, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, N, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, N, D), jnp.float32)
    g = jax.random.normal(kg, (B, H, N, D), jnp.float32)

    # resident baselines (env unset)
    out_res, vjp_res = jax.vjp(A.flash_attention, q, k, v)
    grads_res = vjp_res(g)

    monkeypatch.setenv("WCTPU_ATTN_STREAM", "1")
    out_s, vjp_s = jax.vjp(A.flash_attention, q, k, v)
    grads_s = vjp_s(g)

    ref_out, vjp_ref = jax.vjp(A.attention_reference, q, k, v)
    grads_ref = vjp_ref(g)

    np.testing.assert_allclose(out_s, ref_out, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(out_s, out_res, atol=2e-5, rtol=2e-5)
    for gs, gr, gres, name in zip(grads_s, grads_ref, grads_res, "qkv"):
        np.testing.assert_allclose(
            gs, gr, atol=3e-4, rtol=3e-4, err_msg=f"d{name} vs reference"
        )
        np.testing.assert_allclose(
            gs, gres, atol=3e-4, rtol=3e-4, err_msg=f"d{name} vs resident"
        )


def test_flash_attention_streaming_bf16_finite_and_close():
    """Streaming path on the training dtype (bf16 in/out, f32 accumulation):
    outputs and grads finite and within bf16 tolerance of the f32 reference."""
    import os as _os

    from weatherconverter_tpu.ops import attention as A

    _os.environ["WCTPU_ATTN_STREAM"] = "1"
    try:
        B, H, N, D = 1, 1, 1024, 32
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(9), 3)
        q = jax.random.normal(kq, (B, H, N, D), jnp.bfloat16)
        k = jax.random.normal(kk, (B, H, N, D), jnp.bfloat16)
        v = jax.random.normal(kv, (B, H, N, D), jnp.bfloat16)

        def loss(q_, k_, v_):
            return jnp.sum(A.flash_attention(q_, k_, v_).astype(jnp.float32) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    finally:
        del _os.environ["WCTPU_ATTN_STREAM"]
    f32 = lambda t: t.astype(jnp.float32)
    ref = jax.grad(
        lambda q_, k_, v_: jnp.sum(A.attention_reference(q_, k_, v_) ** 2),
        argnums=(0, 1, 2),
    )(f32(q), f32(k), f32(v))
    for a, r, name in zip(grads, ref, "qkv"):
        a = np.asarray(a, np.float32)
        r = np.asarray(r, np.float32)
        assert np.all(np.isfinite(a)), name
        scale = np.abs(r).max() + 1e-30
        np.testing.assert_allclose(a / scale, r / scale, atol=0.02, err_msg=name)


def test_bwd_vmem_profile_selects_v2_bq256_and_matches():
    """The shipped train profile (attention.bwd_vmem_profile(32768), paired
    with train_compiler_options() on the jit) must pick bq=256 + the v2
    kernel — the round-8 in-situ sweep winner — and produce gradients equal
    to the default profile up to fp reassociation."""
    from weatherconverter_tpu.ops import attention as A

    # picker: raised limit admits 256 at the production N; default keeps 128
    assert A._pick_bwd_block(4096, 64, A._RAISED_VMEM_KIB) == 256
    assert A._pick_bwd_block(4096, 64) == 128

    B, H, N, D = 1, 2, 1024, 32
    kq, kk, kv, kg = jax.random.split(jax.random.PRNGKey(13), 4)
    q = jax.random.normal(kq, (B, H, N, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, N, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, N, D), jnp.float32)
    g = jax.random.normal(kg, (B, H, N, D), jnp.float32)

    _, vjp_default = jax.vjp(A.flash_attention, q, k, v)
    grads_default = vjp_default(g)
    with A.bwd_vmem_profile(A._RAISED_VMEM_KIB):
        assert A._pick_bwd_block(N, D, A._bwd_vmem_kib) == 256
        _, vjp_prof = jax.vjp(A.flash_attention, q, k, v)
        grads_prof = vjp_prof(g)
    assert A._bwd_vmem_kib == A._DEFAULT_VMEM_KIB  # context restored
    for a, b, name in zip(grads_prof, grads_default, "qkv"):
        np.testing.assert_allclose(a, b, atol=3e-4, rtol=3e-4, err_msg=name)
