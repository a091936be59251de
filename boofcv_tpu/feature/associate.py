"""Descriptor association.

Reference analog: boofcv-feature alg/feature/associate/AssociateGreedy.java
:46,65 (brute-force greedy with backwards validation), ScoreAssociation
implementations (DescriptorDistance.java:37-164), EnsureUniqueAssociation.

TPU design (SURVEY §2.3): the all-pairs score matrix is ONE matmul
(euclidean-sq via the |a|^2+|b|^2-2ab expansion rides the MXU), and
greedy-with-backwards-validation becomes mutual-nearest-neighbor: row
argmin + col argmin agreeing — order-independent and equivalent in effect.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax


class Matches(NamedTuple):
    """Fixed-capacity association set (analog of FastQueue<AssociatedIndex>)."""
    src: jnp.ndarray     # [N] int32 index into source set
    dst: jnp.ndarray     # [N] int32 index into destination set
    score: jnp.ndarray   # [N] f32 fit score (lower better)
    valid: jnp.ndarray   # [N] bool


def score_euclidean_sq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[Na, D] x [Nb, D] -> [Na, Nb] squared euclidean, MXU-shaped."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=1, keepdims=True)
    ab = jnp.dot(a, b.T, precision=lax.Precision.HIGHEST)
    return jnp.maximum(a2 + b2.T - 2.0 * ab, 0.0)


def score_sad(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Sum of absolute differences (DescriptorDistance.sad)."""
    return jnp.sum(jnp.abs(a[:, None, :] - b[None, :, :]), axis=-1)


def score_ncc(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Negative NCC as a *distance* (lower = better), for zero-mean
    descriptors (NccFeature convention: mean/sigma stored separately in the
    reference; here descriptors are pre-normalized)."""
    am = a - jnp.mean(a, axis=1, keepdims=True)
    bm = b - jnp.mean(b, axis=1, keepdims=True)
    an = am / (jnp.linalg.norm(am, axis=1, keepdims=True) + eps)
    bn = bm / (jnp.linalg.norm(bm, axis=1, keepdims=True) + eps)
    return -jnp.dot(an, bn.T, precision=lax.Precision.HIGHEST)


def score_hamming(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamming distance between packed-int descriptor rows [N, W] int32."""
    x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    pc = (x * 0x01010101) >> 24
    return jnp.sum(pc, axis=-1).astype(jnp.float32)


def associate_mutual(scores: jnp.ndarray,
                     valid_a: jnp.ndarray | None = None,
                     valid_b: jnp.ndarray | None = None,
                     max_error: float = jnp.inf) -> Matches:
    """Mutual-nearest-neighbor association from a [Na, Nb] score matrix.

    Equivalent to AssociateGreedy with backwardsValidation=true: src i and
    dst j match iff j = argmin_j S[i, j] and i = argmin_i S[i, j] and
    S[i, j] <= max_error.  Output capacity = Na (one candidate per source).
    """
    na, nb = scores.shape
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    s = scores.astype(jnp.float32)
    if valid_a is not None:
        s = jnp.where(valid_a[:, None], s, big)
    if valid_b is not None:
        s = jnp.where(valid_b[None, :], s, big)
    best_j = jnp.argmin(s, axis=1)               # [Na]
    best_i = jnp.argmin(s, axis=0)               # [Nb]
    row_min = jnp.min(s, axis=1)                 # [Na]
    mutual = best_i[best_j] == jnp.arange(na)
    ok = mutual & (row_min <= max_error) & (row_min < big)
    return Matches(
        src=jnp.arange(na, dtype=jnp.int32),
        dst=best_j.astype(jnp.int32),
        score=row_min,
        valid=ok,
    )


def associate_greedy(scores: jnp.ndarray, max_error: float = jnp.inf,
                     backwards: bool = True) -> Matches:
    """AssociateGreedy semantics; with backwards validation this equals
    mutual-NN (the reference's forward pass picks each row's min; the
    backward pass keeps pairs that are also the column min)."""
    if backwards:
        return associate_mutual(scores, max_error=max_error)
    na = scores.shape[0]
    best_j = jnp.argmin(scores, axis=1)
    row_min = jnp.min(scores, axis=1)
    return Matches(jnp.arange(na, dtype=jnp.int32), best_j.astype(jnp.int32),
                   row_min, row_min <= max_error)


def associate_ratio_test(scores: jnp.ndarray, ratio: float = 0.8,
                         max_error: float = jnp.inf) -> Matches:
    """Lowe ratio-test association (ScoreRatioAssociation analog)."""
    na = scores.shape[0]
    neg = -scores
    top2, idx2 = lax.top_k(neg, 2)               # [Na, 2] best (least) scores
    best = -top2[:, 0]
    second = -top2[:, 1]
    ok = (best <= ratio * second) & (best <= max_error)
    return Matches(jnp.arange(na, dtype=jnp.int32), idx2[:, 0].astype(jnp.int32),
                   best, ok)


def associate_mutual_2d(scores: jnp.ndarray, xy_a: jnp.ndarray,
                        xy_b: jnp.ndarray, max_distance: float,
                        valid_a=None, valid_b=None,
                        max_error: float = jnp.inf) -> Matches:
    """Mutual-NN with a 2D image-distance gate
    (AssociateDescription2D / AssociateMaxDistanceNaive analog): pairs
    farther apart than ``max_distance`` pixels are never matched.  The
    gate folds into the score matrix as an additive mask, so the whole
    association stays one matmul-shaped pass."""
    d2 = (jnp.sum((xy_a[:, None, :] - xy_b[None, :, :]) ** 2, -1)
          .astype(jnp.float32))
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    gated = jnp.where(d2 <= jnp.float32(max_distance) ** 2,
                      scores.astype(jnp.float32), big)
    return associate_mutual(gated, valid_a, valid_b, max_error=max_error)
