"""GroupNorm(+SiLU) for NHWC activations.

The reference's ResNet blocks open with GroupNorm(8) -> SiLU -> Conv3x3
(reference: diffusion_model/models/unet_base.py:87-96).

Implementation decision (round 2): the jnp form below IS the shipped kernel.
GroupNorm is fundamentally two passes over the activation (one reduction
read for the statistics, one read+write for normalize+affine), and XLA
already fuses the affine+SiLU into the normalize pass and the statistics
into neighbouring producers — measured bandwidth-optimal on v5e. A
hand-written two-phase Mosaic kernel shipped in round 1 had the same HBM
traffic by construction, compiled 293 s, and MISCOMPARED on hardware; per
review it has been deleted rather than carried behind a flag ("a kernel that
miscompares on its target hardware is not a shipped kernel"). Git history
(round 1) preserves it for future Mosaic archaeology.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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


# Back-compat alias: the "fused" entry point now IS the XLA-fused jnp form
# (see module docstring for why the Pallas variant was removed).
def group_norm_silu(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    num_groups: int = 8,
    eps: float = 1e-5,
    silu: bool = True,
) -> jax.Array:
    return group_norm_reference(x, gamma, beta, num_groups, eps, silu)
