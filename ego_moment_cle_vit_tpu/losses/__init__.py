"""Loss library: triplet losses and kernel-alignment losses.

Single source of truth — the main model wires these in directly, fixing the
reference's split between ``src/losses`` and the inlined copies inside the
model (SURVEY.md §2 caveat; reference train.py:31 vs ego_moment_clevit.py:
203-316).
"""

from .triplet import (
    triplet_loss,
    hard_triplet_loss,
    multiview_triplet_loss,
    roll_negative_triplet_loss,
)
from .alignment import (
    kernel_alignment_loss,
    contrastive_alignment_loss,
    hierarchical_alignment_loss,
    graph_alignment_mse_loss,
    label_similarity_matrix,
    graph_global_similarity,
)
from .modules import (
    TripletLoss,
    HardTripletLoss,
    MultiViewTripletLoss,
    KernelAlignmentLoss,
    ContrastiveAlignmentLoss,
    HierarchicalAlignmentLoss,
)

__all__ = [
    "triplet_loss",
    "hard_triplet_loss",
    "multiview_triplet_loss",
    "roll_negative_triplet_loss",
    "kernel_alignment_loss",
    "contrastive_alignment_loss",
    "hierarchical_alignment_loss",
    "graph_alignment_mse_loss",
    "label_similarity_matrix",
    "graph_global_similarity",
    "TripletLoss",
    "HardTripletLoss",
    "MultiViewTripletLoss",
    "KernelAlignmentLoss",
    "ContrastiveAlignmentLoss",
    "HierarchicalAlignmentLoss",
]
