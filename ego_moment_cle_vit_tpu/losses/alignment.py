"""Kernel-alignment losses for graph regularization.

Capability parity with /root/reference/src/losses/kernel_alignment.py
(KernelAlignmentLoss :14-195, ContrastiveAlignmentLoss :198-268,
HierarchicalAlignmentLoss :271-362) and the model-inlined alignment MSE
(ego_moment_clevit.py:278-316).

Divergences (SURVEY.md §7 bug ledger):
* #6 — the reference's O(B²) Python pair loops (kernel_alignment.py:250-263,
  ego_moment_clevit.py:304-308) are replaced by outer products / masked
  means; mathematically identical.
* #7 — the reference's HierarchicalAlignmentLoss strided-slices the *batch*
  dimension when pooling (kernel_alignment.py:336, a real indexing bug);
  here the pooling correctly averages spatial blocks of the [N, N] graph.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def label_similarity_matrix(
    labels: jnp.ndarray, normalize: bool = True
) -> jnp.ndarray:
    """Y[i,j] = 1 if labels match else 0; optionally unit-Frobenius
    (reference kernel_alignment.py:48-75)."""
    sim = (labels[:, None] == labels[None, :]).astype(jnp.float32)
    if normalize:
        fro = jnp.sqrt(jnp.sum(jnp.square(sim)))
        sim = jnp.where(fro > 0, sim / fro, sim)
    return sim


def graph_global_similarity(graph: jnp.ndarray) -> jnp.ndarray:
    """Collapse [B, N, N] relation graphs to a [B, B] sample-similarity
    matrix via per-sample mean activation outer product
    (reference kernel_alignment.py:77-106).  A [B, B] input passes through.
    """
    if graph.ndim == 2:
        return graph
    if graph.ndim == 3:
        g = jnp.mean(graph, axis=(1, 2))  # [B]
        return jnp.outer(g, g)
    raise ValueError(f"Unsupported graph rank: {graph.ndim}")


def _centered_alignment(k1: jnp.ndarray, k2: jnp.ndarray) -> jnp.ndarray:
    """CKA between two [B, B] kernels (reference :108-141)."""
    b = k1.shape[0]
    h = jnp.eye(b) - jnp.ones((b, b)) / b
    k1c = h @ k1 @ h
    k2c = h @ k2 @ h
    num = jnp.sum(k1c * k2c)  # trace(K1c K2c) for symmetric kernels
    den = jnp.sqrt(jnp.sum(k1c * k1c) * jnp.sum(k2c * k2c))
    return jnp.where(den > 0, num / den, 0.0)


def kernel_alignment_loss(
    graph: jnp.ndarray,
    labels: jnp.ndarray,
    alignment_type: str = "centered",
) -> jnp.ndarray:
    """1 - alignment(graph similarity, label similarity)
    (reference kernel_alignment.py:143-195)."""
    graph_sim = graph_global_similarity(graph)
    label_sim = label_similarity_matrix(labels, normalize=True)

    if alignment_type == "centered":
        return 1.0 - _centered_alignment(graph_sim, label_sim)
    if alignment_type == "normalized":
        gn = jnp.sqrt(jnp.sum(jnp.square(graph_sim)))
        ln = jnp.sqrt(jnp.sum(jnp.square(label_sim)))
        ok = (gn > 0) & (ln > 0)
        align = jnp.sum((graph_sim / jnp.maximum(gn, 1e-12)) *
                        (label_sim / jnp.maximum(ln, 1e-12)))
        return jnp.where(ok, 1.0 - align, 1.0)
    if alignment_type == "cosine":
        gf = graph_sim.reshape(-1)
        lf = label_sim.reshape(-1)
        cos = jnp.dot(gf, lf) / jnp.maximum(
            jnp.linalg.norm(gf) * jnp.linalg.norm(lf), 1e-12
        )
        return 1.0 - cos
    raise ValueError(f"Unknown alignment type: {alignment_type}")


def graph_alignment_mse_loss(
    graph: jnp.ndarray, labels: jnp.ndarray
) -> jnp.ndarray:
    """The model-inlined alignment loss: MSE between sigmoid of the
    mean-activation outer product and the binary label-similarity matrix
    (reference ego_moment_clevit.py:278-316, vectorized per ledger #6)."""
    label_sim = (labels[:, None] == labels[None, :]).astype(jnp.float32)
    g = jnp.mean(graph, axis=(1, 2))  # [B]
    sim = jax.nn.sigmoid(jnp.outer(g, g))
    return jnp.mean(jnp.square(sim - label_sim))


def contrastive_alignment_loss(
    graph: jnp.ndarray,
    labels: jnp.ndarray,
    margin: float = 0.5,
    positive_weight: float = 1.0,
    negative_weight: float = 1.0,
) -> jnp.ndarray:
    """Margin push/pull on pairwise products of per-sample graph means,
    averaged over unordered pairs i<j (reference kernel_alignment.py:225-268,
    vectorized)."""
    if graph.ndim == 3:
        g = jnp.mean(graph, axis=(1, 2))
    else:
        g = jnp.diagonal(graph)
    b = g.shape[0]
    sim = jnp.outer(g, g)  # [B, B]
    same = labels[:, None] == labels[None, :]
    iu = jnp.triu_indices(b, k=1)
    sim_pairs = sim[iu]
    same_pairs = same[iu]

    pos = jnp.maximum(margin - sim_pairs, 0.0) * positive_weight
    neg = jnp.maximum(sim_pairs - (1.0 - margin), 0.0) * negative_weight
    per_pair = jnp.where(same_pairs, pos, neg)
    num_pairs = sim_pairs.shape[0]
    return jnp.sum(per_pair) / max(num_pairs, 1)


def _pool_graph(graph: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Average-pool a [B, N, N] spatial relation graph by ``scale`` in each
    spatial axis (N must be a perfect square; otherwise pass through, as the
    reference intends).  This FIXES ledger #7 — the reference pools the
    batch dim by mistake (kernel_alignment.py:336)."""
    if scale == 1:
        return graph
    b, n, _ = graph.shape
    h = int(round(n**0.5))
    if h * h != n or h % scale != 0:
        return graph
    ph = h // scale
    g = graph.reshape(b, ph, scale, ph, scale, ph, scale, ph, scale)
    g = g.mean(axis=(2, 4, 6, 8))
    return g.reshape(b, ph * ph, ph * ph)


def hierarchical_alignment_loss(
    graph: jnp.ndarray,
    labels: jnp.ndarray,
    scales: Sequence[int] = (1, 2, 4),
    scale_weights: Optional[Sequence[float]] = None,
    alignment_type: str = "centered",
) -> jnp.ndarray:
    """Weighted sum of alignment losses over pooled graph scales
    (reference kernel_alignment.py:340-362)."""
    if scale_weights is None:
        scale_weights = [1.0] * len(scales)
    total = 0.0
    for scale, weight in zip(scales, scale_weights):
        pooled = _pool_graph(graph, scale)
        total = total + weight * kernel_alignment_loss(
            pooled, labels, alignment_type
        )
    return total
