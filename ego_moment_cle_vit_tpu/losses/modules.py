"""Class-style loss wrappers, mirroring the reference's nn.Module loss API
(/root/reference/src/losses/__init__.py:21-31) for drop-in migration.

Each class holds its configuration and is callable with the same argument
shapes as the reference modules; internally they delegate to the functional
implementations in .triplet / .alignment (the single source of truth).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax

from . import alignment as A
from . import triplet as T


@dataclasses.dataclass
class TripletLoss:
    """max(d(a,p) - d(a,n) + margin, 0); reference triplet_loss.py:14-80."""

    margin: float = 1.0
    p_norm: int = 2
    normalize: bool = True
    reduction: str = "mean"

    def __call__(self, anchor, positive, negative):
        return T.triplet_loss(
            anchor,
            positive,
            negative,
            margin=self.margin,
            normalize=self.normalize,
            reduction=self.reduction,
        )


@dataclasses.dataclass
class HardTripletLoss:
    """Online hard-negative mining; reference triplet_loss.py:83-173."""

    margin: float = 1.0
    normalize: bool = True
    hard_positive: bool = False
    reduction: str = "mean"

    def __call__(self, embeddings, labels):
        return T.hard_triplet_loss(
            embeddings,
            labels,
            margin=self.margin,
            normalize=self.normalize,
            hard_positive=self.hard_positive,
            reduction=self.reduction,
        )


@dataclasses.dataclass
class MultiViewTripletLoss:
    """Multiple positives + negative-sampling strategies; reference
    triplet_loss.py:176-324."""

    margin: float = 1.0
    normalize: bool = True
    num_positives: int = 1
    negative_sampling: str = "random"
    temperature: float = 0.1

    def __call__(self, anchor, positive, labels, key: Optional[jax.Array] = None):
        if key is None and self.negative_sampling == "random":
            key = jax.random.PRNGKey(0)
        return T.multiview_triplet_loss(
            anchor,
            positive,
            labels,
            margin=self.margin,
            normalize=self.normalize,
            negative_sampling=self.negative_sampling,
            key=key,
        )


@dataclasses.dataclass
class KernelAlignmentLoss:
    """1 - alignment(graph, labels); reference kernel_alignment.py:14-195."""

    alignment_type: str = "centered"
    temperature: float = 1.0
    reduction: str = "mean"

    def __call__(self, graph, labels):
        return A.kernel_alignment_loss(graph, labels, self.alignment_type)


@dataclasses.dataclass
class ContrastiveAlignmentLoss:
    """Margin push/pull on pairwise graph-mean products; reference
    kernel_alignment.py:198-268."""

    temperature: float = 0.1
    margin: float = 0.5
    positive_weight: float = 1.0
    negative_weight: float = 1.0

    def __call__(self, graph, labels):
        return A.contrastive_alignment_loss(
            graph,
            labels,
            margin=self.margin,
            positive_weight=self.positive_weight,
            negative_weight=self.negative_weight,
        )


@dataclasses.dataclass
class HierarchicalAlignmentLoss:
    """Multi-scale alignment; reference kernel_alignment.py:271-362
    (with the batch-dim pooling bug fixed — ledger #7)."""

    scales: Sequence[int] = (1, 2, 4)
    scale_weights: Optional[Sequence[float]] = None
    alignment_type: str = "centered"

    def __call__(self, graph, labels):
        return A.hierarchical_alignment_loss(
            graph,
            labels,
            scales=self.scales,
            scale_weights=self.scale_weights,
            alignment_type=self.alignment_type,
        )
