"""Token-similarity graphs and Graph Polynomial Fusion (GPF) math.

Capability parity with the reference GPF module
(/root/reference/src/models/gpf_kernel.py:15-176) and the graph helpers in
/root/reference/src/utils/ops.py:238-381, re-expressed as batch-first JAX.

All functions take/return ``jnp`` arrays, run entirely on the VPU/MXU under
``jit``, and contain no data-dependent Python control flow.  The polynomial
term loop is over *static* degrees (P, Q <= ~3) and therefore unrolls at trace
time into a fused elementwise chain that XLA compiles to a handful of VPU
passes over the [B, N, N] tiles.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-6) -> jnp.ndarray:
    """L2-normalize with a torch.nn.functional.normalize-compatible floor.

    torch computes ``x / max(||x||, eps)``; we match that (rather than
    ``x / sqrt(sum + eps)``) so golden tests agree to float tolerance.
    """
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def cosine_similarity_graph(tokens: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Pairwise cosine-similarity Gram matrix over tokens.

    Args:
      tokens: [B, N, D] token features.
    Returns:
      [B, N, N] similarity (reference gpf_kernel.py:85-88 semantics).
    """
    t = _l2_normalize(tokens, axis=-1, eps=eps)
    return jnp.einsum("bnd,bmd->bnm", t, t, preferred_element_type=jnp.float32)


def dot_similarity_graph(tokens: jnp.ndarray) -> jnp.ndarray:
    """Raw dot-product Gram matrix (reference gpf_kernel.py:89-90)."""
    return jnp.einsum(
        "bnd,bmd->bnm", tokens, tokens, preferred_element_type=jnp.float32
    )


def token_similarity_graph(
    tokens: jnp.ndarray, similarity: str = "cosine", eps: float = 1e-6
) -> jnp.ndarray:
    """Dispatch on similarity kind ('cosine' | 'dot')."""
    if similarity == "cosine":
        return cosine_similarity_graph(tokens, eps=eps)
    if similarity == "dot":
        return dot_similarity_graph(tokens)
    raise ValueError(f"Unknown similarity function: {similarity}")


def hadamard_power(matrix: jnp.ndarray, power: int) -> jnp.ndarray:
    """Elementwise power with the reference's conventions.

    p == 0 -> all-ones (Hadamard identity); p == 1 -> matrix unchanged
    (NOT clamped); p >= 2 -> clamp(min=0) then integer power
    (reference gpf_kernel.py:96-115).  ``power`` must be a static int.
    """
    if power == 0:
        return jnp.ones_like(matrix)
    if power == 1:
        return matrix
    clamped = jnp.maximum(matrix, 0.0)
    # Integer powers by repeated multiply — exact, cheap, and avoids
    # transcendental pow() on the VPU.
    out = clamped
    for _ in range(power - 1):
        out = out * clamped
    return out


def symmetrize(matrix: jnp.ndarray) -> jnp.ndarray:
    """0.5 * (G + G^T) over the trailing two dims."""
    return 0.5 * (matrix + jnp.swapaxes(matrix, -1, -2))


def gpf_fuse(
    r_anchor: jnp.ndarray,
    r_positive: jnp.ndarray,
    coeffs: jnp.ndarray,
    *,
    symmetric_enforce: bool = True,
) -> jnp.ndarray:
    """Learnable polynomial fusion  G = sum_pq A[p,q] * Ra^{.p} ⊙ Rp^{.q}.

    ``coeffs`` is the already-nonnegative [P+1, Q+1] coefficient matrix
    (callers apply softplus to the raw parameter).  Matches reference
    gpf_kernel.py:117-159: accumulate, optional symmetrize, clamp >= 0.

    Implementation note (TPU): instead of materialising each Ra^p and Rp^q
    per term, we accumulate running Hadamard powers — the whole expansion is
    (P+1)(Q+1) fused multiply-adds over the resident [B, N, N] tile, which
    XLA fuses into a single VPU loop.  See ops/pallas/gpf.py for the
    single-kernel VMEM-resident version.
    """
    P = coeffs.shape[0] - 1
    Q = coeffs.shape[1] - 1
    ra_clamped = jnp.maximum(r_anchor, 0.0)
    rp_clamped = jnp.maximum(r_positive, 0.0)

    fused = jnp.zeros_like(r_anchor)
    ra_pow = jnp.ones_like(r_anchor)  # Ra^0
    for p in range(P + 1):
        rp_pow = jnp.ones_like(r_positive)  # Rp^0
        for q in range(Q + 1):
            fused = fused + coeffs[p, q] * (ra_pow * rp_pow)
            # next Rp power: ^1 uses the raw matrix, >=2 uses the clamped one
            rp_pow = rp_pow * (r_positive if q == 0 else rp_clamped)
        ra_pow = ra_pow * (r_anchor if p == 0 else ra_clamped)

    if symmetric_enforce:
        fused = symmetrize(fused)
    return jnp.maximum(fused, 0.0)


def normalize_graph(
    graph: jnp.ndarray, method: str = "symmetric", eps: float = 1e-8
) -> jnp.ndarray:
    """Degree-normalize an adjacency/affinity matrix.

    'symmetric': D^{-1/2} A D^{-1/2}; 'random_walk': D^{-1} A
    (reference utils/ops.py:238-271 semantics).
    """
    degrees = jnp.sum(graph, axis=-1)  # [..., N]
    if method == "symmetric":
        inv_sqrt = jax.lax.rsqrt(jnp.maximum(degrees, eps))
        return graph * inv_sqrt[..., :, None] * inv_sqrt[..., None, :]
    if method == "random_walk":
        inv = 1.0 / jnp.maximum(degrees, eps)
        return graph * inv[..., :, None]
    raise ValueError(f"Unknown normalization method: {method}")


def batch_trace(matrices: jnp.ndarray) -> jnp.ndarray:
    """Trace over the trailing two dims: [..., D, D] -> [...]."""
    return jnp.trace(matrices, axis1=-2, axis2=-1)


def batch_logdet(matrices: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Stable log-determinant via Cholesky of M + eps*I.

    Reference utils/ops.py:329-352 uses slogdet with jitter; Cholesky is the
    TPU-friendly equivalent for the PSD matrices this framework produces.
    """
    dim = matrices.shape[-1]
    jittered = matrices + eps * jnp.eye(dim, dtype=matrices.dtype)
    chol = jnp.linalg.cholesky(jittered)
    diag = jnp.diagonal(chol, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(jnp.maximum(diag, eps)), axis=-1)


def cosine_similarity_matrix(
    x: jnp.ndarray, y: jnp.ndarray | None = None, eps: float = 1e-8
) -> jnp.ndarray:
    """Pairwise cosine similarity between rows of x (and optionally y).

    [N, D] (, [M, D]) -> [N, M].  Reference utils/ops.py:355-381.
    """
    if y is None:
        y = x
    xn = _l2_normalize(x, axis=-1, eps=eps)
    yn = _l2_normalize(y, axis=-1, eps=eps)
    return xn @ yn.T


def compute_graph_statistics(graph: jnp.ndarray, eps: float = 1e-8) -> dict:
    """Diagnostics for a batch of graphs: symmetry error, eigen-spectrum
    summary, sparsity (reference utils/ops.py:274-313).

    Returns a dict of [B]-shaped arrays (host-friendly; not meant for the
    hot path).
    """
    sym_err = jnp.max(
        jnp.abs(graph - jnp.swapaxes(graph, -1, -2)), axis=(-2, -1)
    )
    sym_graph = symmetrize(graph)
    eigvals = jnp.linalg.eigvalsh(sym_graph)
    sparsity = jnp.mean(jnp.abs(graph) < eps, axis=(-2, -1))
    degrees = jnp.sum(graph, axis=-1)
    return {
        "symmetry_error": sym_err,
        "min_eigenvalue": eigvals[..., 0],
        "max_eigenvalue": eigvals[..., -1],
        "mean_degree": jnp.mean(degrees, axis=-1),
        "sparsity": sparsity,
        "frobenius_norm": jnp.sqrt(jnp.sum(jnp.square(graph), axis=(-2, -1))),
    }
