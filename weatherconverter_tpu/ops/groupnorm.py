"""Fused GroupNorm(+SiLU) for NHWC activations.

The reference's ResNet blocks open with GroupNorm(8) -> SiLU -> Conv3x3
(reference: diffusion_model/models/unet_base.py:87-96). On TPU the GN+SiLU
pair is memory-bound; fusing them into one Pallas kernel halves the HBM
traffic of the pre-conv stage. The backward pass falls back to jnp autodiff
of the reference implementation (custom_vjp), so training remains exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def group_norm_reference(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    num_groups: int,
    eps: float = 1e-5,
    silu: bool = False,
) -> jax.Array:
    """NHWC GroupNorm matching torch nn.GroupNorm semantics (per-sample,
    per-group statistics over (H, W, C//G))."""
    n, h, w, c = x.shape
    g = num_groups
    xf = x.astype(jnp.float32).reshape(n, h * w, g, c // g)
    # single-pass stats (sum + sum-of-squares fuse into ONE read of x; the
    # mean-then-centered-var form costs an extra full pass — measured as the
    # convert_reduce hotspot in the v5e sampler profile)
    count = h * w * (c // g)
    s1 = jnp.sum(xf, axis=(1, 3), keepdims=True)
    s2 = jnp.sum(xf * xf, axis=(1, 3), keepdims=True)
    mean = s1 / count
    var = jnp.maximum(s2 / count - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    # fold gamma/inv and beta/mean into one affine so the normalize pass is a
    # single fused multiply-add over x
    gamma_f = gamma.astype(jnp.float32).reshape(1, 1, g, c // g)
    beta_f = beta.astype(jnp.float32).reshape(1, 1, g, c // g)
    scale = inv * gamma_f
    shift = beta_f - mean * scale
    out = (xf * scale + shift).reshape(n, h, w, c)
    if silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(x.dtype)


def _gn_silu_kernel(
    x_ref, gamma_ref, beta_ref, mask_ref, o_ref, sum_ref, sq_ref,
    *, count: float, eps: float, silu: bool,
):
    """Two-phase blocked kernel, grid (N, 2, HW/blk).

    Phase 0 streams spatial blocks and accumulates per-group sum / sum-of-
    squares into VMEM scratch; phase 1 re-streams the blocks and applies
    normalize+affine(+SiLU). Each phase touches HBM once, which is the same
    traffic GroupNorm fundamentally needs (stats pass + normalize pass), but
    the affine and SiLU ride along for free and only one spatial block
    (~1 MiB) is ever resident in VMEM — the original single-slab version
    OOMed VMEM at 128px x 128ch.

    Group statistics use (C, G) one-hot matmuls instead of a (HW, G, C/G)
    reshape — Mosaic rejects that shape cast, and the matmul rides the MXU.
    """
    phase = pl.program_id(1)
    j = pl.program_id(2)
    mask = mask_ref[:].astype(jnp.float32)  # (C, G), one-hot channel->group

    @pl.when((phase == 0) & (j == 0))
    def _init():
        sum_ref[...] = jnp.zeros_like(sum_ref)
        sq_ref[...] = jnp.zeros_like(sq_ref)

    @pl.when(phase == 0)
    def _accumulate():
        x = x_ref[0].astype(jnp.float32)  # (blk, C)
        col_sum = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
        col_sq = jnp.sum(x * x, axis=0, keepdims=True)
        sum_ref[...] += jnp.dot(col_sum, mask, preferred_element_type=jnp.float32)
        sq_ref[...] += jnp.dot(col_sq, mask, preferred_element_type=jnp.float32)

    @pl.when(phase == 1)
    def _normalize():
        x = x_ref[0].astype(jnp.float32)
        mean_g = sum_ref[...] / count
        var_g = sq_ref[...] / count - mean_g * mean_g
        inv_g = jax.lax.rsqrt(var_g + eps)
        # Scatter group stats back to channels: (1, G) x (C, G)^T -> (1, C)
        mean_c = jax.lax.dot_general(
            mean_g, mask, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        inv_c = jax.lax.dot_general(
            inv_g, mask, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        out = (x - mean_c) * inv_c
        out = out * gamma_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
        if silu:
            out = out * jax.nn.sigmoid(out)
        o_ref[0] = out.astype(o_ref.dtype)


def _group_mask(c: int, num_groups: int) -> jax.Array:
    """(C, G) one-hot matrix mapping channel -> group (contiguous groups,
    torch GroupNorm channel ordering)."""
    cg = c // num_groups
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // cg
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    return (ch == grp).astype(jnp.float32)


def _pick_spatial_block(hw: int, c: int) -> int:
    """Largest power-of-two block of rows with block bytes (f32) <= ~1 MiB."""
    blk = hw
    while blk > 8 and blk * c * 4 > (1 << 20):
        blk //= 2
    return blk


def _gn_silu_fwd_impl(x, gamma, beta, num_groups, eps, silu, interpret):
    n, h, w, c = x.shape
    hw = h * w
    blk = _pick_spatial_block(hw, c)
    if hw % blk != 0:
        return group_norm_reference(x, gamma, beta, num_groups, eps, silu)
    xr = x.reshape(n, hw, c)
    count = float(hw * (c // num_groups))
    out = pl.pallas_call(
        functools.partial(_gn_silu_kernel, count=count, eps=eps, silu=silu),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        grid=(n, 2, hw // blk),
        in_specs=[
            pl.BlockSpec((1, blk, c), lambda i, p, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, p, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, p, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, num_groups), lambda i, p, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, blk, c), lambda i, p, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((1, num_groups), jnp.float32),
            pltpu.VMEM((1, num_groups), jnp.float32),
        ],
        interpret=interpret,
    )(xr, gamma.reshape(1, c), beta.reshape(1, c), _group_mask(c, num_groups))
    return out.reshape(n, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def group_norm_silu(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    num_groups: int = 8,
    eps: float = 1e-5,
    silu: bool = True,
) -> jax.Array:
    """GroupNorm(num_groups) [+ SiLU].

    Default path is the jnp implementation: GN+SiLU is reduction+elementwise
    work that XLA fuses into adjacent ops, and measurement on v5e showed the
    hand-written Mosaic kernel is strictly worse there (293s kernel compile
    and numerical miscompare on hardware; the jnp path is bandwidth-optimal).
    The blocked two-phase Pallas kernel is kept behind WCTPU_PALLAS_GN=1 for
    future Mosaic tuning and is exercised in interpret mode by CPU tests.
    """
    import os

    if os.environ.get("WCTPU_PALLAS_GN") == "1" or jax.default_backend() != "tpu":
        interpret = jax.default_backend() != "tpu"
        return _gn_silu_fwd_impl(x, gamma, beta, num_groups, eps, silu, interpret)
    return group_norm_reference(x, gamma, beta, num_groups, eps, silu)


def _gns_fwd(x, gamma, beta, num_groups, eps, silu):
    return group_norm_silu(x, gamma, beta, num_groups, eps, silu), (x, gamma, beta)


def _gns_bwd(num_groups, eps, silu, res, g):
    x, gamma, beta = res
    _, vjp = jax.vjp(
        lambda a, b, c: group_norm_reference(a, b, c, num_groups, eps, silu),
        x,
        gamma,
        beta,
    )
    return vjp(g)


group_norm_silu.defvjp(_gns_fwd, _gns_bwd)
