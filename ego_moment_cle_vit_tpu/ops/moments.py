"""Graph-weighted moment pooling math: weighted mean/covariance, Newton–Schulz
matrix square roots, half-vectorization, PSD utilities.

Capability parity with the reference moment head math
(/root/reference/src/models/moment_head.py:15-322) and the matrix helpers in
/root/reference/src/utils/ops.py:100-235.

TPU notes
---------
* Newton–Schulz is the latency target (O(B * k * D^3) batched matmuls on the
  MXU).  It is numerically fragile in low precision, so these functions PIN
  fp32 internally regardless of the input dtype (the reference disables CUDA
  autocast around it for the same reason, moment_head_optimized.py:212) and
  cast back at the end.
* The iteration is a ``lax.fori_loop``-free static unroll: ``num_iterations``
  is a small static int (3-7), so unrolling lets XLA overlap the four batched
  matmuls per step and keep Y/Z resident.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Newton–Schulz iterations
# ---------------------------------------------------------------------------


def newton_schulz_isqrt(
    matrix: jnp.ndarray,
    num_iterations: int = 3,
    eps: float = 1e-5,
    assume_symmetric: bool = True,
) -> jnp.ndarray:
    """Coupled Newton–Schulz iteration for M^{-1/2} (iSQRT-COV).

    Matches reference moment_head.py:28-70: trace-normalize, Y0 = I, Z0 = M,
    k steps of  Y <- 0.5 * Y (3I - ZY),  Z <- 0.5 * (3I - YZ) Z,
    then rescale by 1/sqrt(trace).

    TPU optimization: for symmetric M (always true for the covariance M2),
    Y and Z stay symmetric through the iteration, so YZ = (ZY)^T and each
    step needs THREE batched matmuls instead of four — a 25% FLOP cut on
    the O(B k D^3) latency target with identical math.
    ``assume_symmetric=False`` recovers the general 4-matmul form.

    Args:
      matrix: [B, D, D] (or [..., D, D]) PSD matrices.
    Returns:
      [..., D, D] approximate inverse square roots, in the input dtype.
    """
    in_dtype = matrix.dtype
    m = matrix.astype(jnp.float32)
    dim = m.shape[-1]

    trace = jnp.trace(m, axis1=-2, axis2=-1)[..., None, None]  # [..., 1, 1]
    m = m / (trace + eps)

    eye = jnp.eye(dim, dtype=jnp.float32)
    y = jnp.broadcast_to(eye, m.shape)
    z = m
    for _ in range(num_iterations):
        zy = jnp.matmul(z, y, preferred_element_type=jnp.float32)
        if assume_symmetric:
            yz = jnp.swapaxes(zy, -1, -2)
        else:
            yz = jnp.matmul(y, z, preferred_element_type=jnp.float32)
        y = 0.5 * (
            3.0 * y - jnp.matmul(y, zy, preferred_element_type=jnp.float32)
        )
        z = 0.5 * (
            3.0 * z - jnp.matmul(yz, z, preferred_element_type=jnp.float32)
        )

    isqrt = y / jnp.sqrt(trace + eps)
    return isqrt.astype(in_dtype)


def newton_schulz_sqrt(
    matrix: jnp.ndarray, num_iterations: int = 10, eps: float = 1e-6
) -> jnp.ndarray:
    """Coupled Newton–Schulz iteration for the +1/2 power M^{1/2}.

    Matches reference utils/ops.py:122-165 (which returns Y * sqrt(trace)).
    """
    in_dtype = matrix.dtype
    m = matrix.astype(jnp.float32)
    dim = m.shape[-1]

    trace = jnp.trace(m, axis1=-2, axis2=-1)[..., None, None]
    m = m / (trace + eps)

    eye = jnp.eye(dim, dtype=jnp.float32)
    y = m
    z = jnp.broadcast_to(eye, m.shape)
    for _ in range(num_iterations):
        t = 0.5 * (3.0 * eye - jnp.matmul(z, y, preferred_element_type=jnp.float32))
        y = jnp.matmul(y, t, preferred_element_type=jnp.float32)
        z = jnp.matmul(t, z, preferred_element_type=jnp.float32)

    sqrt_m = y * jnp.sqrt(trace + eps)
    return sqrt_m.astype(in_dtype)


def matrix_power_eigen(
    matrix: jnp.ndarray, power: float, eps: float = 1e-8
) -> jnp.ndarray:
    """Arbitrary matrix power via eigendecomposition of a symmetric matrix.

    Eigenvalues are clamped to >= eps before the (possibly negative /
    fractional) power, as in reference utils/ops.py:168-194.  Not a hot-path
    op on TPU (eigh is expensive); used for tests and diagnostics.
    """
    sym = 0.5 * (matrix + jnp.swapaxes(matrix, -1, -2))
    eigvals, eigvecs = jnp.linalg.eigh(sym.astype(jnp.float32))
    eigvals = jnp.maximum(eigvals, eps) ** power
    out = jnp.einsum("...ij,...j,...kj->...ik", eigvecs, eigvals, eigvecs)
    return out.astype(matrix.dtype)


def check_psd(matrix: jnp.ndarray, tol: float = -1e-6) -> jnp.ndarray:
    """Boolean per-matrix PSD check via min eigenvalue >= tol
    (reference utils/ops.py:197-213)."""
    sym = 0.5 * (matrix + jnp.swapaxes(matrix, -1, -2))
    eigvals = jnp.linalg.eigvalsh(sym.astype(jnp.float32))
    return eigvals[..., 0] >= tol


def ensure_psd(matrix: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Project to the PSD cone by clamping eigenvalues
    (reference utils/ops.py:216-235)."""
    sym = 0.5 * (matrix + jnp.swapaxes(matrix, -1, -2))
    eigvals, eigvecs = jnp.linalg.eigh(sym.astype(jnp.float32))
    eigvals = jnp.maximum(eigvals, eps)
    out = jnp.einsum("...ij,...j,...kj->...ik", eigvecs, eigvals, eigvecs)
    return out.astype(matrix.dtype)


# ---------------------------------------------------------------------------
# Half-vectorization
# ---------------------------------------------------------------------------


def _vech_slices(matrix: jnp.ndarray) -> jnp.ndarray:
    """vech via D static row slices + one concat: pure contiguous copies."""
    dim = matrix.shape[-1]
    flat = matrix.reshape(*matrix.shape[:-2], dim * dim)
    pieces = [flat[..., i * dim + i : (i + 1) * dim] for i in range(dim)]
    return jnp.concatenate(pieces, axis=-1)


def _unvech_upper(vec: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Inverse structure: [..., D(D+1)/2] -> [..., D, D] upper-triangular
    (zeros below), also as static slices + one concat."""
    pieces = []
    off = 0
    zero_shape = vec.shape[:-1]
    for i in range(dim):
        if i > 0:
            pieces.append(jnp.zeros((*zero_shape, i), vec.dtype))
        pieces.append(vec[..., off : off + dim - i])
        off += dim - i
    flat = jnp.concatenate(pieces, axis=-1)
    return flat.reshape(*zero_shape, dim, dim)


@jax.custom_vjp
def _half_vectorize_fast(matrix: jnp.ndarray) -> jnp.ndarray:
    return _vech_slices(matrix)


def _hv_fwd(matrix):
    return _vech_slices(matrix), matrix.shape[-1]


def _hv_bwd(dim, g):
    # d vech / d M: cotangent lands on the upper triangle only.  Built with
    # the same slice+concat structure as the forward — XLA autodiff of the
    # slicing would instead emit D full-size pad+add accumulations (measured
    # 8x slower on TPU).
    return (_unvech_upper(g, dim),)


_half_vectorize_fast.defvjp(_hv_fwd, _hv_bwd)


def half_vectorize_paired(matrix: jnp.ndarray) -> jnp.ndarray:
    """Packed upper triangle in PAIRED order — O(1) tensor ops, no gathers.

    Exploits two identities: (a) padding flat row-major [D*D] by D and
    reshaping to [D, D+1] puts upper-triangle row i at T[i, :D-i]
    (since i*D + i == i*(D+1)); (b) rows i and D-1-i have D+1 upper
    elements together, so right-aligning the reversed partner row packs the
    triangle into exactly [D/2, D+1] == D(D+1)/2 positions.

    The result is a FIXED PERMUTATION of the row-major vech (see
    ``paired_vech_permutation``); consumers that feed it into a Dense layer
    are order-agnostic, and reference checkpoints are converted by permuting
    kernel rows.  D must be even (all supported backbone dims are).

    Why it exists: the row-major packing needs either a gather (slow on the
    VPU) or D concatenated slices (compile-time explosion); this version is
    pad+reshape+mask+flip+add — constant op count, fast in both directions
    under plain autodiff.
    """
    dim = matrix.shape[-1]
    if dim % 2 != 0:
        return _half_vectorize_fast(matrix)  # rare; slice fallback
    batch_shape = matrix.shape[:-2]
    flat = matrix.reshape(*batch_shape, dim * dim)
    padded = jnp.pad(flat, [(0, 0)] * len(batch_shape) + [(0, dim)])
    t = padded.reshape(*batch_shape, dim, dim + 1)
    # triangular validity mask: row i keeps cols < D - i
    rows = jax.lax.broadcasted_iota(jnp.int32, (dim, dim + 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (dim, dim + 1), 1)
    u = jnp.where(cols < dim - rows, t, 0)
    top = u[..., : dim // 2, :]  # rows 0..D/2-1, prefix lengths D..D/2+1
    bottom = jnp.flip(u[..., dim // 2 :, :], axis=-2)  # rows D-1..D/2
    packed = top + jnp.flip(bottom, axis=-1)  # right-align reversed partner
    return packed.reshape(*batch_shape, dim * (dim + 1) // 2)


def paired_vech_permutation(dim: int):
    """numpy index array ``perm`` with
    ``half_vectorize_paired(M)[..., k] == half_vectorize(M)[..., perm[k]]``
    — used to permute reference-checkpoint projection kernels."""
    import numpy as _np

    if dim % 2 != 0:
        # half_vectorize_paired falls back to plain row-major vech for odd
        # dims, so the conversion permutation is the identity (returning an
        # un-filled buffer here previously scrambled odd-dim conversions)
        return _np.arange(dim * (dim + 1) // 2, dtype=_np.int64)

    # row-major vech index of (i, j), i <= j
    def k_ref(i, j):
        return i * dim - i * (i - 1) // 2 + (j - i)

    perm = _np.empty(dim * (dim + 1) // 2, dtype=_np.int64)
    width = dim + 1
    for pr in range(dim // 2):
        for col in range(width):
            k_paired = pr * width + col
            if col < dim - pr:
                i, j = pr, pr + col  # top part: M[pr, pr+col]
            else:
                i = dim - 1 - pr
                j = 2 * dim - 1 - pr - col  # bottom part (reversed)
                i, j = min(i, j), max(i, j)
            perm[k_paired] = k_ref(i, j)
    return perm


def half_vectorize(matrix: jnp.ndarray, method: str = "slices") -> jnp.ndarray:
    """Upper-triangle (incl. diagonal) of a symmetric matrix, row-major.

    [..., D, D] -> [..., D*(D+1)/2], ordered (0,0),(0,1)..(0,D-1),(1,1),...
    — the same ordering as torch.triu_indices, so projections trained against
    the reference line up (reference moment_head.py:202-220,
    utils/ops.py:100-119).

    method='slices' (default): D static row slices + one concat in BOTH
    directions (custom VJP) — pure contiguous copies, no gather/scatter
    (generic gathers are slow on the TPU VPU, and the autodiff backward of
    slicing degenerates into full-size pad+add chains).
    method='gather': single flat constant-index gather (reference-shaped).
    """
    dim = matrix.shape[-1]
    if method == "gather":
        rows, cols = jnp.triu_indices(dim)
        flat = matrix.reshape(*matrix.shape[:-2], dim * dim)
        return flat[..., rows * dim + cols]
    return _half_vectorize_fast(matrix)


def half_vectorize_dim(dim: int) -> int:
    """Length of the half-vectorized representation: D*(D+1)/2."""
    return dim * (dim + 1) // 2


# ---------------------------------------------------------------------------
# Graph-weighted statistics
# ---------------------------------------------------------------------------


def graph_weighted_mean(
    tokens: jnp.ndarray, weights: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """mu = (Z^T W 1) / tr(W)   (reference moment_head.py:222-244).

    Args:
      tokens:  [B, N, D]
      weights: [B, N, N] normalized graph weights.
    Returns:
      [B, D] weighted means.
    """
    row_sums = jnp.sum(weights, axis=-1)  # [B, N] == W @ 1
    weighted_sum = jnp.einsum(
        "bnd,bn->bd", tokens, row_sums, preferred_element_type=jnp.float32
    )
    trace_w = jnp.trace(weights, axis1=-2, axis2=-1)[..., None]  # [B, 1]
    return (weighted_sum / (trace_w + eps)).astype(tokens.dtype)


def graph_weighted_covariance(
    tokens: jnp.ndarray,
    weights: jnp.ndarray,
    mean: jnp.ndarray | None = None,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """M2 = (Z - mu)^T W (Z - mu)  (reference moment_head.py:288-293).

    Returns (M2 [B, D, D], centered tokens [B, N, D]).  Accumulates the two
    batched matmuls in fp32 on the MXU.
    """
    if mean is None:
        mean = graph_weighted_mean(tokens, weights, eps=eps)
    centered = tokens - mean[:, None, :]
    weighted = jnp.einsum(
        "bnm,bmd->bnd", weights, centered, preferred_element_type=jnp.float32
    )
    m2 = jnp.einsum(
        "bnd,bne->bde",
        centered.astype(jnp.float32),
        weighted,
        preferred_element_type=jnp.float32,
    )
    return m2.astype(tokens.dtype), centered


def isqrt_cov_subspace(
    centered: jnp.ndarray,
    weighted: jnp.ndarray,
    num_iterations: int = 3,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Newton–Schulz iSQRT of M2 = Zc^T (W Zc), run in the N-dim token
    subspace — O(B(N^2 D + k N^3)) instead of O(B k D^3).

    Why it is exact: for symmetric M2 every coupled-NS iterate is a
    polynomial in M2 (Y_0 = I, Z_0 = M2, everything commutes), and for
    M2 = A^T B̂ any polynomial satisfies p(A^T B̂) = p(0) I + A^T q(B̂ A^T) B̂.
    So the whole iteration runs on S = B̂ A^T — an [N, N] matrix (N=49 for
    the Swin flagship vs D=1024):

        Y_k = a_k I + A^T G_k B̂,   a_{k+1} = 1.5 a_k,  a_0 = 1,  G_0 = 0
        H_k = a_k^2 I + S (2 a_k G_k + G_k S G_k)
        G_{k+1} = 1.5 G_k - 0.5 (a_k H_k + G_k S H_k)

    with B̂ = (W Zc) / (tr(M2) + eps) — the same trace normalization and
    final 1/sqrt(trace + eps) rescale as :func:`newton_schulz_isqrt`
    (reference moment_head.py:28-70 semantics).  This replaces 3k batched
    [D, D] matmuls with 5k batched [N, N] matmuls plus two [N, D^2]
    reconstruction matmuls — ~70x fewer FLOPs at the flagship shapes, and
    plain autodiff through it stays subspace-sized too.

    Args:
      centered: [B, N, D] centered tokens Zc.
      weighted: [B, N, D] graph-weighted tokens W @ Zc.
    Returns:
      [B, D, D] approximate M2^{-1/2}, in the input dtype.
    """
    in_dtype = centered.dtype
    a = centered.astype(jnp.float32)
    b = weighted.astype(jnp.float32)
    n = a.shape[-2]
    d = a.shape[-1]

    trace = jnp.sum(a * b, axis=(-2, -1))[..., None, None]  # tr(A^T B)
    bh = b / (trace + eps)
    s = jnp.einsum(
        "bnd,bmd->bnm", bh, a, preferred_element_type=jnp.float32
    )  # S = B̂ A^T  [B, N, N]

    eye = jnp.eye(n, dtype=jnp.float32)
    mm = partial(jnp.matmul, preferred_element_type=jnp.float32)
    a_k = 1.0
    g = jnp.zeros_like(s)
    for _ in range(num_iterations):
        sg = mm(s, g)
        h = (a_k * a_k) * eye + mm(s, 2.0 * a_k * g + mm(g, sg))
        g = 1.5 * g - 0.5 * (a_k * h + mm(g, mm(s, h)))
        a_k = 1.5 * a_k

    # reconstruct Y_K / sqrt(trace + eps) = (a_K I + A^T G_K B̂) / sqrt(...)
    gb = mm(g, bh)  # [B, N, D]
    low = jnp.einsum(
        "bnd,bne->bde", a, gb, preferred_element_type=jnp.float32
    )  # A^T (G B̂)  [B, D, D]
    out = low + a_k * jnp.eye(d, dtype=jnp.float32)
    out = out / jnp.sqrt(trace + eps)
    return out.astype(in_dtype)


def degree_weighted_centered_mean(
    centered: jnp.ndarray, weights: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """Third-order input vector: sum_n Zc[n] * rowsum(W)[n] / (tr W).

    Matches reference moment_head.py:304-311 (``W @ ones`` broadcasts the row
    sums over the feature dim; we compute the row sums directly).
    """
    row_sums = jnp.sum(weights, axis=-1)  # [B, N]
    weighted = jnp.einsum(
        "bnd,bn->bd", centered, row_sums, preferred_element_type=jnp.float32
    )
    trace_w = jnp.trace(weights, axis1=-2, axis2=-1)[..., None]
    return (weighted / (trace_w + eps)).astype(centered.dtype)
