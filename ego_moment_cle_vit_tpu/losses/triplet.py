"""Triplet losses for CLE-ViT instance-level contrastive learning.

Capability parity with /root/reference/src/losses/triplet_loss.py (TripletLoss
:14-80, HardTripletLoss :83-173, MultiViewTripletLoss :176-324) and the
model-inlined roll-negative triplet (ego_moment_clevit.py:246-276).

All mining is fully vectorized with masked min/max reductions — the
reference's per-anchor Python loops (triplet_loss.py:142-161) become one
[B, B] masked reduction, which is both mathematically identical and the only
form that stays on-device under ``jit``.

Functional API: losses are pure functions (no parameters to hold), which is
the idiomatic JAX shape for a loss library.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_BIG = 1e9


def _l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


def _reduce(loss: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "none":
        return loss
    raise ValueError(f"Unknown reduction: {reduction}")


def triplet_loss(
    anchor: jnp.ndarray,
    positive: jnp.ndarray,
    negative: jnp.ndarray,
    margin: float = 1.0,
    normalize: bool = True,
    squared: bool = False,
    reduction: str = "mean",
) -> jnp.ndarray:
    """max(d(a,p) - d(a,n) + margin, 0).

    ``squared=False`` uses Euclidean distances (reference TripletLoss
    :69-73); ``squared=True`` uses squared distances as the model-inlined
    variant does (ego_moment_clevit.py:271-275).
    """
    if normalize:
        anchor = _l2_normalize(anchor)
        positive = _l2_normalize(positive)
        negative = _l2_normalize(negative)
    pos_sq = jnp.sum(jnp.square(anchor - positive), axis=-1)
    neg_sq = jnp.sum(jnp.square(anchor - negative), axis=-1)
    if squared:
        pos_d, neg_d = pos_sq, neg_sq
    else:
        pos_d, neg_d = jnp.sqrt(pos_sq + 1e-12), jnp.sqrt(neg_sq + 1e-12)
    loss = jnp.maximum(pos_d - neg_d + margin, 0.0)
    return _reduce(loss, reduction)


def roll_negative_triplet_loss(
    anchor: jnp.ndarray,
    positive: jnp.ndarray,
    margin: float = 0.3,
) -> jnp.ndarray:
    """CLE-ViT style in-batch negative sampling: negative = anchor rolled by
    one (reference ego_moment_clevit.py:233), squared distances, L2-normalized
    features (:266-276)."""
    negative = jnp.roll(anchor, shift=1, axis=0)
    return triplet_loss(
        anchor, positive, negative, margin=margin, normalize=True, squared=True
    )


def hard_triplet_loss(
    embeddings: jnp.ndarray,
    labels: jnp.ndarray,
    margin: float = 1.0,
    normalize: bool = True,
    hard_positive: bool = False,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Online hard-negative mining over a batch.

    Per anchor i: positive statistic = max (hard) or mean of same-class
    distances; negative statistic = min of different-class distances
    (reference HardTripletLoss :110-173, vectorized).  Anchors with no
    positive or no negative in the batch are excluded from the mean.
    """
    if normalize:
        embeddings = _l2_normalize(embeddings)
    # pairwise Euclidean distances
    sq = jnp.sum(jnp.square(embeddings), axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * embeddings @ embeddings.T
    dist = jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-12)

    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(labels.shape[0], dtype=bool)
    pos_mask = same & ~eye
    neg_mask = ~same

    if hard_positive:
        pos_stat = jnp.max(jnp.where(pos_mask, dist, -_BIG), axis=1)
    else:
        pos_count = jnp.sum(pos_mask, axis=1)
        pos_stat = jnp.sum(jnp.where(pos_mask, dist, 0.0), axis=1) / jnp.maximum(
            pos_count, 1
        )
    neg_stat = jnp.min(jnp.where(neg_mask, dist, _BIG), axis=1)

    valid = (jnp.sum(pos_mask, axis=1) > 0) & (jnp.sum(neg_mask, axis=1) > 0)
    per_anchor = jnp.maximum(pos_stat - neg_stat + margin, 0.0)
    per_anchor = jnp.where(valid, per_anchor, 0.0)

    if reduction == "mean":
        return jnp.sum(per_anchor) / jnp.maximum(jnp.sum(valid), 1)
    return _reduce(per_anchor, reduction)


def multiview_triplet_loss(
    anchor: jnp.ndarray,
    positive: jnp.ndarray,
    labels: jnp.ndarray,
    margin: float = 1.0,
    normalize: bool = True,
    negative_sampling: str = "hard",
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Triplet loss with one or K positive views and batched negative mining.

    ``positive`` is [B, D] or [B, K, D] (reference MultiViewTripletLoss
    :242-324).  Strategies:
      'random'    — negative drawn uniformly from different-class samples
                    (requires ``key``)
      'hard'      — closest different-class sample
      'semi-hard' — closest negative inside (furthest_pos - margin,
                    furthest_pos); falls back to hard when none exists
    """
    if positive.ndim == 2:
        positive = positive[:, None, :]
    if normalize:
        anchor = _l2_normalize(anchor)
        positive = _l2_normalize(positive)

    b, k = anchor.shape[0], positive.shape[1]
    sq = jnp.sum(jnp.square(anchor), axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * anchor @ anchor.T
    dist_aa = jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-12)  # [B, B]
    # anchor -> positive-view distances, [B, B, K]
    dist_ap = jnp.sqrt(
        jnp.sum(jnp.square(anchor[:, None, None, :] - positive[None]), axis=-1)
        + 1e-12
    )
    # mining runs over the 2B concatenated [anchor; positive-view-k] set,
    # exactly like the reference's cat([anchor, pos_view]) dist matrix
    # (triplet_loss.py:276-280): a different-class POSITIVE VIEW can be
    # the mined negative
    dist2 = jnp.concatenate(
        [jnp.broadcast_to(dist_aa[:, :, None], (b, b, k)), dist_ap], axis=1
    )  # [B, 2B, K]

    neg_mask = labels[:, None] != labels[None, :]  # [B, B]
    neg_mask2 = jnp.concatenate([neg_mask, neg_mask], axis=1)  # [B, 2B]
    has_neg = jnp.sum(neg_mask, axis=1) > 0

    if negative_sampling == "random":
        if key is None:
            raise ValueError("negative_sampling='random' requires a PRNG key")
        gumbel = jax.random.gumbel(key, (b, 2 * b, k))
        scores = jnp.where(neg_mask2[:, :, None], gumbel, -_BIG)
        idx = jnp.argmax(scores, axis=1)  # [B, K]
        neg_d = jnp.take_along_axis(dist2, idx[:, None, :], axis=1)[:, 0]
    elif negative_sampling == "hard":
        neg_d = jnp.min(jnp.where(neg_mask2[:, :, None], dist2, _BIG), axis=1)
    elif negative_sampling == "semi-hard":
        same = labels[:, None] == labels[None, :]
        # same-class others among anchors; ALL same-class positive views
        # (the reference's arange(len) != i excludes only the anchor itself)
        pos_mask2 = jnp.concatenate(
            [same & ~jnp.eye(b, dtype=bool), same], axis=1
        )
        furthest_pos = jnp.max(
            jnp.where(pos_mask2[:, :, None], dist2, -_BIG), axis=1
        )  # [B, K]
        semi = (
            neg_mask2[:, :, None]
            & (dist2 > (furthest_pos - margin)[:, None])
            & (dist2 < furthest_pos[:, None])
        )
        semi_d = jnp.min(jnp.where(semi, dist2, _BIG), axis=1)
        hard_d = jnp.min(jnp.where(neg_mask2[:, :, None], dist2, _BIG), axis=1)
        neg_d = jnp.where(jnp.any(semi, axis=1), semi_d, hard_d)
    else:
        raise ValueError(f"Unknown negative sampling strategy: {negative_sampling}")

    # distance to each positive view: [B, K]
    pos_d = jnp.sqrt(
        jnp.sum(jnp.square(anchor[:, None, :] - positive), axis=-1) + 1e-12
    )
    per = jnp.maximum(pos_d - neg_d + margin, 0.0)  # [B, K]
    per = jnp.where(has_neg[:, None], per, 0.0)
    denom = jnp.maximum(jnp.sum(has_neg) * k, 1)
    return jnp.sum(per) / denom
