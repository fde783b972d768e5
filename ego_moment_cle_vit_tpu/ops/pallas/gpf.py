"""Fused GPF Pallas kernel: dual Gram + polynomial fusion in one pass.

One kernel program per batch element computes BOTH token-similarity Gram
matrices on the MXU and immediately runs the (P+1)(Q+1)-term Hadamard
polynomial + symmetrize + clamp on the VPU while the [N, N] tiles are still
resident in VMEM — the similarity matrices never round-trip to HBM
(the reference materializes R_a, R_p and ~9 full intermediates in HBM,
gpf_kernel.py:129-150).

VMEM budget per program: 2 x [N, D] tokens + ~4 x [N, N] working tiles.
For N=196, D=1536 fp32 that is ~3.1 MB — far under the ~16 MB/core limit.

Gradients: ``jax.custom_vjp`` recomputes the backward through the pure-XLA
composition (ops.graph.token_similarity_graph + ops.gpf_fuse), which is the
same function — gradients are exact, at the cost of one forward recompute
in the backward pass (the usual remat trade).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..graph import gpf_fuse, token_similarity_graph


def _gpf_kernel(
    ta_ref,
    tp_ref,
    coeffs_ref,
    out_ref,
    *,
    similarity: str,
    eps: float,
    degree_p: int,
    degree_q: int,
    symmetric_enforce: bool,
):
    ta = ta_ref[0].astype(jnp.float32)  # [N, D]
    tp = tp_ref[0].astype(jnp.float32)

    if similarity == "cosine":
        ta = ta / jnp.maximum(
            jnp.sqrt(jnp.sum(ta * ta, axis=-1, keepdims=True)), eps
        )
        tp = tp / jnp.maximum(
            jnp.sqrt(jnp.sum(tp * tp, axis=-1, keepdims=True)), eps
        )

    r_a = jax.lax.dot_general(
        ta, ta, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [N, N]
    r_p = jax.lax.dot_general(
        tp, tp, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    ra_clamped = jnp.maximum(r_a, 0.0)
    rp_clamped = jnp.maximum(r_p, 0.0)

    fused = jnp.zeros_like(r_a)
    ra_pow = jnp.ones_like(r_a)
    for p in range(degree_p + 1):
        rp_pow = jnp.ones_like(r_p)
        for q in range(degree_q + 1):
            fused = fused + coeffs_ref[p, q] * (ra_pow * rp_pow)
            rp_pow = rp_pow * (r_p if q == 0 else rp_clamped)
        ra_pow = ra_pow * (r_a if p == 0 else ra_clamped)

    if symmetric_enforce:
        fused = 0.5 * (fused + fused.T)
    out_ref[0] = jnp.maximum(fused, 0.0).astype(out_ref.dtype)


def _forward(tokens_a, tokens_p, coeffs, *, similarity, eps, symmetric_enforce):
    b, n, d = tokens_a.shape
    degree_p = coeffs.shape[0] - 1
    degree_q = coeffs.shape[1] - 1
    kernel = partial(
        _gpf_kernel,
        similarity=similarity,
        eps=eps,
        degree_p=degree_p,
        degree_q=degree_q,
        symmetric_enforce=symmetric_enforce,
    )
    flops_gram = 2 * 2 * n * n * d
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (degree_p + 1, degree_q + 1),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=b * flops_gram,
            bytes_accessed=b * (2 * n * d + n * n) * 4,
            transcendentals=0,
        ),
    )(tokens_a, tokens_p, coeffs.astype(jnp.float32))


def _xla_reference(tokens_a, tokens_p, coeffs, *, similarity, eps, symmetric_enforce):
    r_a = token_similarity_graph(tokens_a, similarity, eps)
    r_p = token_similarity_graph(tokens_p, similarity, eps)
    return gpf_fuse(r_a, r_p, coeffs, symmetric_enforce=symmetric_enforce)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_gpf_pallas(
    tokens_a, tokens_p, coeffs, similarity="cosine", eps=1e-6, symmetric_enforce=True
):
    """tokens [B, N, D] x2 + coeffs [P+1, Q+1] -> fused graph [B, N, N]."""
    return _forward(
        tokens_a,
        tokens_p,
        coeffs,
        similarity=similarity,
        eps=eps,
        symmetric_enforce=symmetric_enforce,
    )


def _fwd(tokens_a, tokens_p, coeffs, similarity, eps, symmetric_enforce):
    out = _forward(
        tokens_a,
        tokens_p,
        coeffs,
        similarity=similarity,
        eps=eps,
        symmetric_enforce=symmetric_enforce,
    )
    return out, (tokens_a, tokens_p, coeffs)


def _bwd(similarity, eps, symmetric_enforce, residuals, g):
    tokens_a, tokens_p, coeffs = residuals
    _, vjp = jax.vjp(
        lambda a, p, c: _xla_reference(
            a,
            p,
            c,
            similarity=similarity,
            eps=eps,
            symmetric_enforce=symmetric_enforce,
        ),
        tokens_a,
        tokens_p,
        coeffs,
    )
    return vjp(g)


fused_gpf_pallas.defvjp(_fwd, _bwd)


def fused_gpf_available(n: int, d: int, platform: str | None = None) -> bool:
    """Use the kernel when on TPU and the working set fits VMEM."""
    if platform is None:
        platform = jax.default_backend()
    if platform not in ("tpu",):
        return False
    vmem_bytes = (2 * n * d + 6 * n * n) * 4
    return vmem_bytes < 12 * 1024 * 1024
