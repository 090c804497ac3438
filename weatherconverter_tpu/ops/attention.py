"""Multi-head self-attention over flattened image tokens.

The reference uses `nn.MultiheadAttention` over h*w <= 64*64 = 4096 tokens
(reference: diffusion_model/models/unet_base.py:114-120,153-161). Here the hot
path is a Pallas blockwise (flash) attention kernel that never materializes
the (N, N) score matrix in HBM — in EITHER direction: the backward is its own
Pallas kernel that recomputes score blocks in VMEM and accumulates dK/dV
across q-blocks on-chip (round-1 fell back to the jnp reference backward,
which paid a 2 GiB HBM score tensor per layer at N=4096 training). A pure-jnp
fallback provides the reference semantics everywhere else (CPU tests run both
kernels in interpret mode).

Layout: (B, H, N, D) with D = channels // num_heads. Non-causal, no mask —
image self-attention.
"""

from __future__ import annotations

import contextlib
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Inference-only int8 path for the flash kernel's QK^T contraction. v5e's
# MXU runs int8 contractions at 2x the bf16 rate — exactly where the UNet's
# D=64 heads fill only half the 128-deep contraction (PROFILE.md round 4:
# 25.43 -> 25.02 ms/step in situ). FORWARD ONLY — the i8 pallas_call has no
# VJP, so training paths must leave the flag unset (the loops never set it;
# bench.py/CLI set it for translate/sample). Quality: over a 1000-step
# guided chain the int8 trajectory diverges exactly at the CHAOS FLOOR of a
# same-scale innocuous input perturbation, measured as a DISTRIBUTION over 5
# perturbation seeds (VERDICT r2 item 3): corr 0.98850 vs floor
# 0.98837+-0.00009, seg agreement 0.99723 vs floor 0.99711+-0.00021 — int8
# sits INSIDE the floor distribution on both statistics
# (outputs/int8_quality_r05.json, scripts/int8_quality_check.py), i.e. no
# systematic error beyond the quantization noise scale. PV-int8 was
# measured slower with 10x the error and is kept only for A/B
# (scripts/ab_translate.py).
#
# Quantization stays OUTSIDE the kernel (XLA per-tensor scales): an in-kernel
# per-row variant (quantize q/k + rank-1 dequant of the score tile inside the
# kernel) measured 28.17 ms/step in situ vs 25.04 — the extra VPU passes on
# the (block_q, N) tile cost 3x what the saved HBM passes are worth. Deleted
# rather than shipped dark (PROFILE.md round-4 log; git history has it).
def _qk_int8() -> bool:
    return os.environ.get("WCTPU_ATTN_QK_INT8", "0") == "1"


def _pv_int8() -> bool:
    return os.environ.get("WCTPU_ATTN_PV_INT8", "0") == "1"


# A bf16-exp variant of the i8 kernel (softmax exp on the (bq, N) tile in
# bf16 for 2x VPU lanes) measured 26.0 ms/step in situ vs 25.0 — Mosaic
# lowers bf16 exp through f32, so it only added converts. Deleted
# (PROFILE.md round-4 log; git history has it).

# f32 exp is exact-softmax-safe to ~88; the clamp replaces a per-row max pass
# (see _flash_kernel). Forward and backward must agree on this constant.
_CLAMP = 60.0


def attention_reference(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Plain softmax(QK^T / sqrt(D)) V, matching torch MHA math
    (scale = D^-0.5, reference: unet_base.py:42,55)."""
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=jnp.float32))
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", probs, v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float):
    """One (batch*head, q-block) program with the FULL K/V resident in VMEM.

    Image attention is short-sequence / small-head (N <= 4096, D <= 192 in
    the reference UNet), so K/V for a whole head fit on-chip (4096 x 32 bf16
    = 256 KiB) and the (block_q, N) score tile (<= 4 MiB f32) never touches
    HBM. That removes the need for the online-softmax recurrence entirely —
    one QK^T, one row softmax, one PV — while HBM traffic drops to the
    q/k/v/o tensors themselves. Profiling on v5e showed the alternatives
    losing badly here: XLA materializes 2 GiB f32 score tensors (~3 ms per
    layer), and the shipped flash kernel pays its multi-block machinery at
    D=32 (~15 ms per layer). `block_k` is kept for signature stability; the
    kernel reads K/V in full.
    """
    # Keep q/k/v in their storage dtype (bf16 on the hot path): the MXU runs
    # bf16 x bf16 -> f32 at twice the f32 x f32 rate, and f32 accumulation
    # via preferred_element_type preserves the softmax numerics.
    q = q_ref[0]  # (block_q, D)
    k = k_ref[0]  # (N, D)
    v = v_ref[0]  # (N, D)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale  # (block_q, N) f32
    # Stability: a row-max subtraction costs a full extra (block_q, N) reduce
    # + subtract pass (~15% of the kernel, measured on v5e). In f32, exp is
    # exact-softmax-safe for s <= ~88; GN-prenormed image tokens keep scores
    # orders of magnitude below that, so a one-op two-sided clamp replaces
    # the max pass (identical softmax whenever no element clamps, which is
    # always in practice). The LOW clamp matters for robustness: a row whose
    # scores all sit below ~-88 would underflow every exp to 0 and yield
    # 0/0 = NaN; clamping to -_CLAMP keeps l >= N*e^-60 > 0 (such rows
    # degrade gracefully to near-uniform attention, which is also what a
    # row-max softmax gives for uniformly tiny scores).
    p = jnp.exp(jnp.clip(s, -_CLAMP, _CLAMP))
    l = jnp.sum(p, axis=-1, keepdims=True)
    # Normalize AFTER the PV matmul: dividing the (block_q, D) output costs
    # N/D times less VPU work than dividing the (block_q, N) probs, and the
    # bf16 cast of p carries the same relative precision either way.
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _flash_kernel_qk_i8(
    q_ref, k_ref, v_ref, sc_ref, o_ref, *, block_k: int, pv_int8: bool
):
    """Flash forward with the QK^T contraction in int8 (per-tensor scales).

    q/k arrive pre-quantized (symmetric round-to-nearest, scale = max|x|/127
    over the whole tensor — computed outside the kernel where XLA fuses it
    into the projection epilogue). The int32 score is rescaled by the single
    f32 factor qs*ks*D^-0.5 read from SMEM; softmax is unchanged.

    pv_int8 additionally runs the PV matmul in int8: p is quantized per ROW
    (scale = row max, so the dominant probabilities keep ~7 bits; entries
    below max/254 truncate to zero, which the softmax tail tolerates), v
    per tensor (sc_ref[1]); the row scale and 1/l fold into the single
    (block_q, D) output rescale."""
    q = q_ref[0]  # (block_q, D) int8
    k = k_ref[0]  # (N, D) int8
    v = v_ref[0]  # (N, D) bf16 or int8
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    s = s.astype(jnp.float32) * sc_ref[0]  # (block_q, N)
    p = jnp.exp(jnp.clip(s, -_CLAMP, _CLAMP))
    l = jnp.sum(p, axis=-1, keepdims=True)
    if pv_int8:
        pmax = jnp.max(p, axis=-1, keepdims=True)  # (block_q, 1), > 0
        p8 = jnp.round(p * (127.0 / pmax)).astype(jnp.int8)
        o = jax.lax.dot_general(
            p8, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        o = o * (pmax * (sc_ref[1] / 127.0) / l)
    else:
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o = o / l
    o_ref[0] = o.astype(o_ref.dtype)


def _flash_attention_fwd_i8_impl(
    q: jax.Array, k: jax.Array, v: jax.Array, *, block_q: int, interpret: bool,
    pv_int8: bool = False,
) -> jax.Array:
    b, h, n, d = q.shape
    bh = b * h
    qr = q.reshape(bh, n, d).astype(jnp.float32)
    kr = k.reshape(bh, n, d).astype(jnp.float32)
    vr = v.reshape(bh, n, d)
    # symmetric per-tensor quantization; scales stay dynamic (traced)
    qs = jnp.maximum(jnp.max(jnp.abs(qr)), 1e-6) / 127.0
    ks = jnp.maximum(jnp.max(jnp.abs(kr)), 1e-6) / 127.0
    q8 = jnp.round(qr / qs).astype(jnp.int8)
    k8 = jnp.round(kr / ks).astype(jnp.int8)
    if pv_int8:
        vsc = jnp.maximum(jnp.max(jnp.abs(vr.astype(jnp.float32))), 1e-6) / 127.0
        vin = jnp.round(vr.astype(jnp.float32) / vsc).astype(jnp.int8)
    else:
        vsc = jnp.float32(1.0)
        vin = vr
    scale = jnp.stack(
        [(qs * ks / (d**0.5)).astype(jnp.float32), vsc.astype(jnp.float32)]
    )

    grid = (bh, n // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel_qk_i8, block_k=block_q, pv_int8=pv_int8),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), v.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2,), lambda i, j: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(q8, k8, vin, scale)
    return out.reshape(b, h, n, d)


def _flash_attention_fwd_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    block_q: int,
    block_k: int,
    interpret: bool,
) -> jax.Array:
    b, h, n, d = q.shape
    bh = b * h
    qr = q.reshape(bh, n, d)
    kr = k.reshape(bh, n, d)
    vr = v.reshape(bh, n, d)
    scale = float(1.0 / (d**0.5))

    grid = (bh, n // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(qr, kr, vr)
    return out.reshape(b, h, n, d)


def _flash_bwd_kernel(
    q_ref, k_ref, v_ref, o_ref, do_ref, dq_ref, dk_ref, dv_ref,
    *, scale: float,
):
    """Backward for one (batch*head, q-block) program.

    Recomputes the (block_q, N) score block in VMEM (flash recompute — the
    scores never existed in HBM), forms the softmax VJP with the row-sum
    trick D = rowsum(dO * O), and emits dQ for this block while accumulating
    dK/dV into their output blocks (same block index across the inner grid
    dimension -> the accumulator stays resident in VMEM and flushes once).
    """
    j = pl.program_id(1)
    nq = pl.num_programs(1)
    q = q_ref[0]          # (bq, D)
    k = k_ref[0]          # (N, D)
    v = v_ref[0]          # (N, D)
    o = o_ref[0].astype(jnp.float32)   # (bq, D)
    do = do_ref[0].astype(jnp.float32)  # (bq, D)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (bq, N)
    p = jnp.exp(jnp.clip(s, -_CLAMP, _CLAMP))
    l = jnp.sum(p, axis=-1, keepdims=True)
    pn = p / l  # softmax probs

    # dpn = dO V^T ; ds = pn * (dpn - rowsum(dO * O)) * scale, with the
    # exp-clamp gradient mask folded in (zero where s clamped, either side)
    dpn = jax.lax.dot_general(
        do.astype(v.dtype), v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    Dv = jnp.sum(do * o, axis=-1, keepdims=True)  # (bq, 1)
    ds = pn * (dpn - Dv)
    ds = jnp.where((s <= _CLAMP) & (s >= -_CLAMP), ds, 0.0) * scale
    ds_lp = ds.astype(q.dtype)

    dq = jax.lax.dot_general(
        ds_lp, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(j == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += jax.lax.dot_general(
        ds_lp, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)
    dv_ref[0] += jax.lax.dot_general(
        pn.astype(do_ref.dtype), do.astype(do_ref.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)


def _flash_bwd_kernel_v2(
    q_ref, k_ref, v_ref, o_ref, do_ref, dq_ref, dk_ref, dv_ref,
    *, scale: float,
):
    """VPU-leaner variant of `_flash_bwd_kernel` (same math, reassociated).

    The v1 kernel normalizes the probs (`p / l`) and applies `* scale` on the
    full (block_q, N) tile — 2 wide VPU passes. Here the softmax 1/l and the
    QK scale fold OUT of the wide tile into (block_q, D)-shaped operands
    instead (the same trick the forward uses to normalize after the PV
    matmul): dq picks up `scale/l` after its matmul, dk folds it into the
    q rows, dv folds 1/l into the dO rows. Exact same gradients up to fp
    reassociation; selected by WCTPU_ATTN_BWD_V2 for in-situ A/B
    (scripts/ab_train.py) before any default change."""
    j = pl.program_id(1)
    q = q_ref[0]          # (bq, D)
    k = k_ref[0]          # (N, D)
    v = v_ref[0]          # (N, D)
    o = o_ref[0].astype(jnp.float32)   # (bq, D)
    do = do_ref[0].astype(jnp.float32)  # (bq, D)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (bq, N) — identical recompute to the forward kernel
    p = jnp.exp(jnp.clip(s, -_CLAMP, _CLAMP))
    linv = 1.0 / jnp.sum(p, axis=-1, keepdims=True)  # (bq, 1)
    # Cast p for the dv matmul EARLY so the f32 p tile dies at `m` below —
    # keeping it live to the end put the kernel 712 KB over the 16 MiB
    # scoped-VMEM limit at the D=16 layers (measured, r7)
    p_lp = p.astype(do_ref.dtype)

    dpn = jax.lax.dot_general(
        do.astype(v.dtype), v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    Dv = jnp.sum(do * o, axis=-1, keepdims=True)  # (bq, 1)
    # m = l * ds / scale: the un-normalized, un-scaled softmax VJP core —
    # the only (bq, N) elementwise work besides exp/clip/mask
    m = p * (dpn - Dv)
    m = jnp.where((s <= _CLAMP) & (s >= -_CLAMP), m, 0.0)
    m_lp = m.astype(q.dtype)

    dq = jax.lax.dot_general(
        m_lp, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[0] = (dq * (scale * linv)).astype(dq_ref.dtype)

    @pl.when(j == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    qh = (q.astype(jnp.float32) * (scale * linv)).astype(q.dtype)
    dk_ref[0] += jax.lax.dot_general(
        m_lp, qh, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)
    doh = (do * linv).astype(do_ref.dtype)
    dv_ref[0] += jax.lax.dot_general(
        p_lp, doh,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)


def _bwd_v2() -> bool:
    return os.environ.get("WCTPU_ATTN_BWD_V2", "0") == "1"


# ---------------------------------------------------------------------------
# Backward VMEM profile (the shipped train-step optimization, round 8).
#
# The in-situ sweep on the real bench.py train program (scripts/ab_train.py,
# fresh process per variant, PROFILE.md round-8 table) found the v2 backward
# kernel at block_q=256 under a RAISED 32 MiB scoped-VMEM limit wins 4.9%
# end-to-end (54.2/54.3 ms/step vs 57.0 base, reproduced); neither piece
# wins alone (v2@bq128 can't compile under the default 16 MiB limit, the
# raised limit with the v1 kernel measured neutral). The limit is a per-jit
# compiler option (xla_tpu_scoped_vmem_limit_kib) the backward trace cannot
# introspect, so the SAME choice is carried by this explicit trace-time
# context: make_train_step passes `train_compiler_options()` to its jit and
# enters `bwd_vmem_profile(32768)` around every call (only the trace-time
# hit matters; calls after tracing are free). This is a programmatic
# contract, not an env flag — the WCTPU_ATTN_BWD_* envs remain A/B-only
# overrides (CLAUDE.md rule 3).
# ---------------------------------------------------------------------------

_DEFAULT_VMEM_KIB = 16384
_RAISED_VMEM_KIB = 32768
_bwd_vmem_kib = _DEFAULT_VMEM_KIB


@contextlib.contextmanager
def bwd_vmem_profile(kib: int):
    """Declare the scoped-VMEM limit the surrounding jit compiles under, so
    the flash backward picks matching kernel/tile variants at trace time.
    Pair with `train_compiler_options()` on the jit itself."""
    global _bwd_vmem_kib
    prev = _bwd_vmem_kib
    _bwd_vmem_kib = int(kib)
    try:
        yield
    finally:
        _bwd_vmem_kib = prev


def train_compiler_options() -> dict | None:
    """jit compiler_options for training programs that differentiate through
    flash_attention: the raised scoped-VMEM limit the shipped v2@bq256
    backward needs. None off-TPU (the option is TPU-only)."""
    if not _on_tpu():
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": str(_RAISED_VMEM_KIB)}


# ---------------------------------------------------------------------------
# Streaming (KV-blocked) kernels — the N >= ~20K regime.
#
# The resident kernels above keep the FULL K/V (and, backward, the f32 dK/dV
# accumulators) in VMEM per (batch*head) program: a fixed 12*N*D bytes that
# outgrows Mosaic's 16 MiB scoped-VMEM limit near N~20K at D=64 (256px+
# latent training, PROFILE.md HBM-envelope section). The streaming variants
# tile BOTH sequence axes — every VMEM buffer is (block, D) or
# (block_q, block_k), so any N that fits HBM compiles. Two properties keep
# them simple and exact:
#   * the clamp-softmax (see _CLAMP) has no row-max recurrence, so partial
#     exp sums accumulate directly — no online rescaling;
#   * all per-row 1/l and `scale` factors fold OUT of the kernels into
#     whole-tensor elementwise ops (the same reassociation the v2 resident
#     kernel A/B'd): the forward normalizes o = o_acc / l after the kernel,
#     the backward pre-scales qh = q*scale/l, doh = do/l and post-scales dq.
# Gradients are exact up to fp reassociation vs the resident kernels (same
# clamp semantics, f32 accumulation throughout).
# ---------------------------------------------------------------------------


def _stream_forced() -> bool:
    return os.environ.get("WCTPU_ATTN_STREAM", "0") == "1"


def _pick_stream_block(n: int) -> int:
    """(block_q, block_k) tile edge: 256 keeps the handful of live f32
    (bq, bk) tiles under ~2 MiB at any N; dispatch guarantees n % 128 == 0."""
    for b in (256, 128):
        if n % b == 0:
            return b
    return n


def _flash_kernel_stream_fwd(q_ref, k_ref, v_ref, o_ref, l_ref, *, scale: float):
    """One (batch*head, q-block, k-block) program: accumulates the
    UN-normalized PV partial and the exp row-sum; the caller divides."""
    jk = pl.program_id(2)
    q = q_ref[0]  # (bq, D)
    k = k_ref[0]  # (bk, D)
    v = v_ref[0]  # (bk, D)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (bq, bk)
    p = jnp.exp(jnp.clip(s, -_CLAMP, _CLAMP))

    @pl.when(jk == 0)
    def _init():
        o_ref[0] = jnp.zeros_like(o_ref[0])
        l_ref[0] = jnp.zeros_like(l_ref[0])

    o_ref[0] += jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # l is laid out (bh, n, 1): the trailing singleton keeps the block
    # shape (1, bq, 1) legal for Mosaic (last dim equals the array dim,
    # bq sits in the /8 sublane slot)
    l_ref[0] += jnp.sum(p, axis=-1, keepdims=True)


def _flash_stream_fwd_impl(
    q: jax.Array, k: jax.Array, v: jax.Array, *, interpret: bool
) -> tuple[jax.Array, jax.Array]:
    """Returns (o, l): normalized output in q.dtype and the f32 exp row-sums
    shaped (B, H, N, 1) for reuse by the streaming backward."""
    b, h, n, d = q.shape
    bh = b * h
    bq = bk = _pick_stream_block(n)
    scale = float(1.0 / (d**0.5))
    rs = lambda x: x.reshape(bh, n, d)
    grid = (bh, n // bq, n // bk)
    qspec = pl.BlockSpec((1, bq, d), lambda i, jq, jk: (i, jq, 0), memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, bk, d), lambda i, jq, jk: (i, jk, 0), memory_space=pltpu.VMEM)
    o_acc, l = pl.pallas_call(
        functools.partial(_flash_kernel_stream_fwd, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, n, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[qspec, kspec, kspec],
        out_specs=(
            qspec,
            pl.BlockSpec((1, bq, 1), lambda i, jq, jk: (i, jq, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(rs(q), rs(k), rs(v))
    o = (o_acc / l).astype(q.dtype)
    return o.reshape(b, h, n, d), l.reshape(b, h, n, 1)


def _stream_bwd_core(q, k, v, o, do, *, scale: float):
    """Shared (bq, bk) softmax-VJP core: the un-normalized, un-scaled
    m = p * (dpn - Dv) with the clamp-gradient mask, plus p for dV."""
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (bq, bk)
    p = jnp.exp(jnp.clip(s, -_CLAMP, _CLAMP))
    dpn = jax.lax.dot_general(
        do.astype(v.dtype), v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bk)
    Dv = jnp.sum(do * o, axis=-1, keepdims=True)  # (bq, 1)
    m = p * (dpn - Dv)
    m = jnp.where((s <= _CLAMP) & (s >= -_CLAMP), m, 0.0)
    return p, m


def _flash_bwd_dq_kernel_stream(
    q_ref, k_ref, v_ref, o_ref, do_ref, dq_ref, *, scale: float
):
    """dQ pass: grid (bh, q-block, k-block), dq accumulates across k-blocks.
    Emits the UN-scaled sum_j m_ij k_j; the caller applies scale/l per row."""
    jk = pl.program_id(2)
    _, m = _stream_bwd_core(
        q_ref[0], k_ref[0], v_ref[0],
        o_ref[0].astype(jnp.float32), do_ref[0].astype(jnp.float32), scale=scale,
    )

    @pl.when(jk == 0)
    def _init():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    dq_ref[0] += jax.lax.dot_general(
        m.astype(q_ref.dtype), k_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _flash_bwd_dkv_kernel_stream(
    q_ref, k_ref, v_ref, o_ref, do_ref, qh_ref, doh_ref, dk_ref, dv_ref,
    *, scale: float,
):
    """dK/dV pass: grid (bh, k-block, q-block), dk/dv accumulate across
    q-blocks. The per-row scale/l factors arrive pre-folded into
    qh = q * scale/l and doh = do/l (computed outside, XLA-fused)."""
    jq = pl.program_id(2)
    p, m = _stream_bwd_core(
        q_ref[0], k_ref[0], v_ref[0],
        o_ref[0].astype(jnp.float32), do_ref[0].astype(jnp.float32), scale=scale,
    )

    @pl.when(jq == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += jax.lax.dot_general(
        m.astype(q_ref.dtype), qh_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dv_ref[0] += jax.lax.dot_general(
        p.astype(doh_ref.dtype), doh_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _flash_stream_bwd_impl(q, k, v, o, do, l, *, interpret: bool):
    b, h, n, d = q.shape
    bh = b * h
    bq = bk = _pick_stream_block(n)
    scale = float(1.0 / (d**0.5))
    rs = lambda x: x.reshape(bh, n, d)
    linv = (1.0 / l).astype(jnp.float32)  # (B, H, N, 1)
    qh = rs((q.astype(jnp.float32) * (scale * linv)).astype(q.dtype))
    doh = rs((do.astype(jnp.float32) * linv).astype(do.dtype))
    qspec = pl.BlockSpec((1, bq, d), lambda i, jq, jk: (i, jq, 0), memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, bk, d), lambda i, jq, jk: (i, jk, 0), memory_space=pltpu.VMEM)

    dq_acc = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel_stream, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), jnp.float32),
        grid=(bh, n // bq, n // bk),
        in_specs=[qspec, kspec, kspec, qspec, qspec],
        out_specs=qspec,
        interpret=interpret,
    )(rs(q), rs(k), rs(v), rs(o), rs(do))
    dq = (dq_acc.reshape(b, h, n, d) * (scale * linv)).astype(q.dtype)

    # dkv grid: k-blocks in the middle, q-blocks innermost (accumulation dim)
    qspec2 = pl.BlockSpec((1, bq, d), lambda i, jk, jq: (i, jq, 0), memory_space=pltpu.VMEM)
    kspec2 = pl.BlockSpec((1, bk, d), lambda i, jk, jq: (i, jk, 0), memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel_stream, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, n, d), jnp.float32),
        ),
        grid=(bh, n // bk, n // bq),
        in_specs=[qspec2, kspec2, kspec2, qspec2, qspec2, qspec2, qspec2],
        out_specs=(kspec2, kspec2),
        interpret=interpret,
    )(rs(q), rs(k), rs(v), rs(o), rs(do), qh, doh)
    un = lambda x: x.reshape(b, h, n, d)
    return dq, un(dk).astype(k.dtype), un(dv).astype(v.dtype)


def _env_block_override(name: str, n: int) -> int | None:
    """Tolerantly parse an A/B-only block-size override env var.

    These knobs (WCTPU_ATTN_BWD_BQ / WCTPU_ATTN_I8_BQ) exist solely for the
    fresh-process A/B harnesses (scripts/ab_train.py, scripts/ab_translate.py)
    and are trace-time reads — a leaked value silently changes the compiled
    program, so a malformed one must never crash or half-apply: non-numeric,
    <= 0, or non-dividing values are ignored (ADVICE r4)."""
    raw = os.environ.get(name)
    if not raw:
        return None
    try:
        bq = int(raw)
    except ValueError:
        return None
    if bq <= 0 or n % bq != 0:
        return None
    return bq


def _flash_attention_bwd_impl(q, k, v, o, do, *, block_q: int, interpret: bool):
    b, h, n, d = q.shape
    bh = b * h
    rs = lambda x: x.reshape(bh, n, d)
    scale = float(1.0 / (d**0.5))
    grid = (bh, n // block_q)
    qspec = pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    # v2 is the default under the raised train profile (the in-situ sweep
    # winner; it cannot compile under the default 16 MiB limit at bq=128).
    # WCTPU_ATTN_BWD_V2 stays as the A/B-only force (scripts/ab_train.py).
    use_v2 = _bwd_v2() or _bwd_vmem_kib >= _RAISED_VMEM_KIB
    kernel = _flash_bwd_kernel_v2 if use_v2 else _flash_bwd_kernel
    dq, dk, dv = pl.pallas_call(
        functools.partial(kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            # dK/dV accumulate across q-blocks in f32 for exactness
            jax.ShapeDtypeStruct((bh, n, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, n, d), jnp.float32),
        ),
        grid=grid,
        in_specs=[qspec, kspec, kspec, qspec, qspec],
        out_specs=(qspec, kspec, kspec),
        interpret=interpret,
    )(rs(q), rs(k), rs(v), rs(o), rs(do))
    un = lambda x: x.reshape(b, h, n, d)
    return un(dq), un(dk).astype(k.dtype), un(dv).astype(v.dtype)


def _pick_blocks(n: int, d: int = 64) -> tuple[int, int]:
    """block_q capped at 512: the (block_q, N) f32 score tile must fit VMEM
    alongside full K/V (512 x 4096 x 4 = 8 MiB + bf16 probs 4 MiB + K/V
    ~2 MiB at the UNet's largest map, D=64). Measured on v5e: bq=512 shaves
    ~3% off the N=4096 layer vs bq=256 (fewer grid programs, same traffic).

    The cap also SHRINKS with N so the tiles always fit Mosaic's 16 MiB
    scoped-VMEM limit: score f32 + probs bf16 are 6 bytes/element, K/V
    bf16 another 4*n*d, so bq*n*6 + 4*n*d <= 14 MiB (2 MiB headroom for
    q/out blocks and spills). At N=4096 this leaves bq=512 (the tuned
    optimum, 13 MiB) untouched; at N=16384 (256px latents — the
    hbm_envelope hires row) bq=512 would need a 32 MiB f32 tile and
    crashes the server-side Mosaic compiler, so the budget picks 64.
    Returns None when even the smallest block overflows (N ~ 58K+ at
    D=64): that regime dispatches to the streaming kernels."""
    budget = 14 * 2**20 - 4 * n * d
    for b in (512, 256, 128, 64, 32, 16, 8):
        if n % b == 0 and b <= n and b * n * 6 <= budget:
            return b, b
    return None


def _pick_bwd_block(n: int, d: int = 64, vmem_kib: int = _DEFAULT_VMEM_KIB) -> int | None:
    """The backward holds ~3 (block_q, N) f32 tiles live (scores, dpn, ds):
    cap block_q at 128 so 3 x 128 x 4096 x 4 = 6 MiB fits VMEM with K/V and
    the f32 dK/dV accumulators. Like _pick_blocks, the cap shrinks with N
    against the scoped-VMEM limit (fixed cost: K/V bf16 + dK/dV f32
    accumulators = 12*n*d bytes; tiles 12*bq*n; 2 MiB headroom). Under the
    default 16 MiB limit this yields the long-standing bq=128 at N=4096;
    under the raised train profile (bwd_vmem_profile) bq=256 fits — the
    in-situ sweep winner. Returns None when nothing fits (N ~ 20K+ at
    D=64, default limit): that regime dispatches to the streaming backward
    (_flash_stream_bwd_impl), which tiles both sequence axes."""
    budget = (vmem_kib - 2048) * 1024 - 12 * n * d
    # bq=256 is only admitted under the raised profile: it is the variant
    # the sweep measured there; under the default limit the tuned (and
    # shipped) cap remains 128 at every N.
    candidates = (256, 128, 64, 32, 16, 8) if vmem_kib > _DEFAULT_VMEM_KIB else (128, 64, 32, 16, 8)
    for b in candidates:
        if n % b == 0 and b <= n and 12 * b * n <= budget:
            return b
    return None


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _bwd_streams(n: int, d: int) -> bool:
    """Streaming backward when the resident one cannot fit scoped VMEM
    (or forced via WCTPU_ATTN_STREAM for tests/A/B)."""
    return _stream_forced() or _pick_bwd_block(n, d, _bwd_vmem_kib) is None


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Blockwise attention, Pallas on TPU, interpret-mode elsewhere.
    Forward AND backward keep the (N, N) scores on-chip (custom_vjp below);
    past the resident kernels' VMEM reach the streaming variants take over,
    so any N that fits HBM compiles."""
    n, d = q.shape[2], q.shape[3]
    blocks = None if _stream_forced() else _pick_blocks(n, d)
    if blocks is None:
        o, _ = _flash_stream_fwd_impl(q, k, v, interpret=not _on_tpu())
        return o
    return _flash_attention_fwd_impl(
        q, k, v, block_q=blocks[0], block_k=blocks[1], interpret=not _on_tpu()
    )


def _fa_fwd(q, k, v):
    n, d = q.shape[2], q.shape[3]
    if _bwd_streams(n, d):
        # streaming backward reuses the forward's exp row-sums: take the
        # forward through the streaming kernel so l comes out for free
        o, l = _flash_stream_fwd_impl(q, k, v, interpret=not _on_tpu())
        return o, (q, k, v, o, l)
    o = flash_attention(q, k, v)
    return o, (q, k, v, o, None)


def _fa_bwd(res, g):
    q, k, v, o, l = res
    if l is not None:
        return _flash_stream_bwd_impl(
            q, k, v, o, g.astype(q.dtype), l, interpret=not _on_tpu()
        )
    bq = _pick_bwd_block(q.shape[2], q.shape[3], _bwd_vmem_kib)
    # A/B-only override, same convention as WCTPU_ATTN_I8_BQ (scripts/
    # ab_train.py sweeps the backward tile on the real train program)
    bq = _env_block_override("WCTPU_ATTN_BWD_BQ", q.shape[2]) or bq
    return _flash_attention_bwd_impl(
        q, k, v, o, g.astype(q.dtype),
        block_q=bq, interpret=not _on_tpu(),
    )


flash_attention.defvjp(_fa_fwd, _fa_bwd)


# Above this sequence length the (N, N) f32 score matrix dominates HBM
# traffic and must never be materialized: profiling the production UNet scan
# on v5e showed the N=4096 attention fusions (8x4x4096x4096 f32 = 2 GiB)
# costing ~3 ms/layer/step — the single largest line item. The flash kernel
# keeps scores on-chip. At N <= 512 the matrix is small enough that XLA's
# fused dot-softmax-dot wins on launch overhead.
FLASH_MIN_SEQ = 1024


def multi_head_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, use_pallas: bool = True
) -> jax.Array:
    """(B, H, N, D) attention dispatch.

    TPU: XLA fused attention for N < FLASH_MIN_SEQ (every resolution of the
    reference UNet — h*w <= 4096, unet_base.py:153-161); the flash kernel for
    longer sequences. Elsewhere: the blockwise kernels run in interpret mode
    so CPU tests exercise the flash code path (forward and backward)."""
    n, d = q.shape[2], q.shape[3]
    if not use_pallas or n % 128 != 0 or n < FLASH_MIN_SEQ:
        return attention_reference(q, k, v)
    if _qk_int8():
        # forward-only path (sampling/translation); training keeps bf16.
        # block_q swept in situ for the i8 kernel specifically (PROFILE.md
        # r4): 512 (the bf16 optimum) stands; WCTPU_ATTN_I8_BQ for A/B.
        blocks = _pick_blocks(n, d)
        if blocks is not None:
            bq = _env_block_override("WCTPU_ATTN_I8_BQ", n) or blocks[0]
            return _flash_attention_fwd_i8_impl(
                q, k, v, block_q=bq, interpret=not _on_tpu(), pv_int8=_pv_int8()
            )
        # resident tiles can't fit at this N: fall through to the bf16
        # streaming forward (no i8 streaming variant — that regime is
        # HBM-bound, not MXU-bound)
    return flash_attention(q, k, v)
