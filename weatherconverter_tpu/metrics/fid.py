"""Frechet Inception Distance — the quality gate BASELINE.md names for the
translation pipeline ("FID ... parity", BASELINE.md north-star row).

The reference repository computes no FID (SURVEY.md §6: no published
metrics); this module *introduces* the capability, TPU-first:

  - feature statistics stream on-device (sum / outer-product accumulators in
    f64-free form: f32 sums with mean-centering at finalize)
  - the Frechet distance uses an eigendecomposition-based PSD matrix sqrt
    (jnp.linalg.eigh) instead of scipy.linalg.sqrtm — no host round-trip,
    differentiable, and exact for the symmetric PSD product form

      FID = |mu_a - mu_b|^2 + tr(S_a + S_b - 2 (S_a^1/2 S_b S_a^1/2)^1/2)

    using the symmetric rearrangement of sqrtm(S_a S_b) (equal trace).

Feature extractors are pluggable (`feature_fn`): the standard choice is
InceptionV3 pool3 (2048-d) via models/inception.py + the torchvision-layout
importer in compat/torch_import.py (this image ships no pretrained weights,
so wiring accepts any user-supplied torchvision inception .pth); any
embedding model works for relative comparisons (e.g. the project's own
ResNet seg-backbone global features — documented as "backbone-FID", NOT
comparable to published FID numbers).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class FeatureStats(NamedTuple):
    """Streaming first/second-moment accumulator for FID statistics."""

    n: jax.Array  # () f32 count
    s1: jax.Array  # (D,) sum of features
    s2: jax.Array  # (D, D) sum of outer products

    @staticmethod
    def init(dim: int) -> "FeatureStats":
        return FeatureStats(
            n=jnp.zeros((), jnp.float32),
            s1=jnp.zeros((dim,), jnp.float32),
            s2=jnp.zeros((dim, dim), jnp.float32),
        )

    def update(self, feats: jax.Array) -> "FeatureStats":
        """feats: (B, D). Jit/scan-friendly pure update."""
        f = feats.astype(jnp.float32)
        return FeatureStats(
            n=self.n + f.shape[0],
            s1=self.s1 + jnp.sum(f, axis=0),
            s2=self.s2 + f.T @ f,
        )

    def finalize(self) -> tuple[jax.Array, jax.Array]:
        """-> (mu (D,), cov (D, D)) with Bessel correction (matches
        np.cov / the standard FID implementations)."""
        mu = self.s1 / self.n
        cov = (self.s2 - jnp.outer(mu, self.s1)) / jnp.maximum(self.n - 1.0, 1.0)
        return mu, cov


def _psd_sqrt(m: jax.Array, eps: float = 1e-10) -> jax.Array:
    """Matrix square root of a symmetric PSD matrix via eigh (clamped)."""
    w, v = jnp.linalg.eigh((m + m.T) / 2.0)
    w = jnp.sqrt(jnp.clip(w, eps, None))
    return (v * w[None, :]) @ v.T


def frechet_distance(
    mu_a: jax.Array, cov_a: jax.Array, mu_b: jax.Array, cov_b: jax.Array
) -> jax.Array:
    """Exact Frechet distance between two Gaussians, symmetric-PSD form."""
    a_sqrt = _psd_sqrt(cov_a)
    mid = _psd_sqrt(a_sqrt @ cov_b @ a_sqrt)
    diff = mu_a - mu_b
    return jnp.dot(diff, diff) + jnp.trace(cov_a) + jnp.trace(cov_b) - 2.0 * jnp.trace(mid)


def compute_fid(feats_a: jax.Array, feats_b: jax.Array) -> jax.Array:
    """FID between two feature sets (N_a, D), (N_b, D)."""
    sa = FeatureStats.init(feats_a.shape[-1]).update(feats_a)
    sb = FeatureStats.init(feats_b.shape[-1]).update(feats_b)
    return frechet_distance(*sa.finalize(), *sb.finalize())


def fid_from_batches(
    feature_fn: Callable[[jax.Array], jax.Array],
    batches_a,
    batches_b,
) -> float:
    """Stream two iterables of image batches through `feature_fn`
    ((B,H,W,3) -> (B,D)) and return the FID. Accumulation happens on device;
    only the final scalar crosses to host."""
    stats_a = stats_b = None
    upd = jax.jit(lambda s, x: s.update(feature_fn(x)))
    for xb in batches_a:
        if stats_a is None:
            d = int(jax.eval_shape(feature_fn, jax.ShapeDtypeStruct(xb.shape, jnp.float32)).shape[-1])
            stats_a = FeatureStats.init(d)
        stats_a = upd(stats_a, xb)
    for xb in batches_b:
        if stats_b is None:
            d = int(jax.eval_shape(feature_fn, jax.ShapeDtypeStruct(xb.shape, jnp.float32)).shape[-1])
            stats_b = FeatureStats.init(d)
        stats_b = upd(stats_b, xb)
    mu_a, cov_a = stats_a.finalize()
    mu_b, cov_b = stats_b.finalize()
    return float(frechet_distance(mu_a, cov_a, mu_b, cov_b))
