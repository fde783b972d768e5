"""VMEM-resident Newton–Schulz iSQRT Pallas kernel.

The iteration is the framework's latency target (O(B k D^3); BASELINE.md).
Under XLA each of the k x 3 batched matmuls round-trips its [D, D] operands
through HBM; this kernel keeps Y, Z and the product tile resident in VMEM
for the whole iteration — per batch element the HBM traffic drops from
~3k x 3 x D^2 words to exactly one read of M and one write of the result.

Uses the symmetric 3-matmul form (YZ = (ZY)^T for symmetric M — see
ops.moments.newton_schulz_isqrt), fp32 throughout (numerics pinned).

VMEM budget per program: M/out + Y + Z + T  =  4 x D^2 fp32.
``newton_schulz_available`` gates on D (<= 896 keeps us under ~13 MB).

Gradients: custom_vjp recomputing through the identical pure-XLA iteration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..moments import newton_schulz_isqrt


def _ns_kernel(m_ref, out_ref, y_scr, z_scr, t_scr, *, num_iterations, eps):
    m = m_ref[0].astype(jnp.float32)  # [D, D]
    dim = m.shape[0]
    trace = jnp.sum(jnp.diagonal(m)) + eps
    z_scr[:] = m / trace
    y_scr[:] = jnp.eye(dim, dtype=jnp.float32)

    for _ in range(num_iterations):
        # zy = Z @ Y
        t_scr[:] = jax.lax.dot_general(
            z_scr[:], y_scr[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # Y <- 1.5 Y - 0.5 (Y @ zy)
        y_new = 1.5 * y_scr[:] - 0.5 * jax.lax.dot_general(
            y_scr[:], t_scr[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # Z <- 1.5 Z - 0.5 (zy^T @ Z)   [= (3I - YZ) Z / 2 for symmetric M]
        z_new = 1.5 * z_scr[:] - 0.5 * jax.lax.dot_general(
            t_scr[:], z_scr[:], (((0,), (0,)), ((), ())),  # zy^T @ z
            preferred_element_type=jnp.float32,
        )
        y_scr[:] = y_new
        z_scr[:] = z_new

    out_ref[0] = (y_scr[:] / jnp.sqrt(trace)).astype(out_ref.dtype)


def _forward(matrix, num_iterations, eps):
    b, d, _ = matrix.shape
    kernel = partial(_ns_kernel, num_iterations=num_iterations, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, d, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, d, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, d, d), matrix.dtype),
        scratch_shapes=[
            pltpu.VMEM((d, d), jnp.float32),
            pltpu.VMEM((d, d), jnp.float32),
            pltpu.VMEM((d, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * num_iterations * 3 * 2 * d**3,
            bytes_accessed=b * 2 * d * d * 4,
            transcendentals=0,
        ),
    )(matrix)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def newton_schulz_isqrt_pallas(matrix, num_iterations: int = 5, eps: float = 1e-5):
    """[B, D, D] symmetric PSD -> M^{-1/2}, VMEM-resident iteration."""
    return _forward(matrix, num_iterations, eps)


def _fwd(matrix, num_iterations, eps):
    return _forward(matrix, num_iterations, eps), matrix


def _bwd(num_iterations, eps, matrix, g):
    _, vjp = jax.vjp(
        lambda m: newton_schulz_isqrt(
            m, num_iterations=num_iterations, eps=eps, assume_symmetric=True
        ),
        matrix,
    )
    return vjp(g)


newton_schulz_isqrt_pallas.defvjp(_fwd, _bwd)


def newton_schulz_available(d: int, platform: str | None = None) -> bool:
    if platform is None:
        platform = jax.default_backend()
    if platform not in ("tpu",):
        return False
    # M(in block) + out block + 3 scratch tiles, fp32, double-buffered I/O
    return (5 * d * d * 4) < 13 * 1024 * 1024  # d <= ~800; 768 passes
