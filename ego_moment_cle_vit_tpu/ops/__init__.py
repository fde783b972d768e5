"""Pure-function math core.

Everything here is a jit-able, batch-first JAX function with no Python loops
over the batch dimension. These are the numerical contracts of the framework;
the Flax modules in ``..models`` are thin parameter-holding wrappers around
them, and the Pallas kernels in ``.pallas`` are drop-in fused replacements
dispatched on TPU.
"""

from .graph import (
    cosine_similarity_graph,
    dot_similarity_graph,
    token_similarity_graph,
    hadamard_power,
    gpf_fuse,
    symmetrize,
    normalize_graph,
    compute_graph_statistics,
    batch_trace,
    batch_logdet,
    cosine_similarity_matrix,
)
from .moments import (
    newton_schulz_isqrt,
    newton_schulz_sqrt,
    matrix_power_eigen,
    check_psd,
    ensure_psd,
    half_vectorize,
    graph_weighted_mean,
    graph_weighted_covariance,
    degree_weighted_centered_mean,
)
from .sketch import (
    make_sketch_params,
    count_sketch,
    tensor_sketch_3,
)

__all__ = [
    "cosine_similarity_graph",
    "dot_similarity_graph",
    "token_similarity_graph",
    "hadamard_power",
    "gpf_fuse",
    "symmetrize",
    "normalize_graph",
    "compute_graph_statistics",
    "batch_trace",
    "batch_logdet",
    "cosine_similarity_matrix",
    "newton_schulz_isqrt",
    "newton_schulz_sqrt",
    "matrix_power_eigen",
    "check_psd",
    "ensure_psd",
    "half_vectorize",
    "graph_weighted_mean",
    "graph_weighted_covariance",
    "degree_weighted_centered_mean",
    "make_sketch_params",
    "count_sketch",
    "tensor_sketch_3",
]
