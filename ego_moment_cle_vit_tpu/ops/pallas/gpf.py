"""Fused GPF Pallas kernel: dual Gram + polynomial fusion in one pass.

One kernel program per batch element computes BOTH token-similarity Gram
matrices on the MXU and immediately runs the (P+1)(Q+1)-term Hadamard
polynomial + symmetrize + clamp on the VPU while the [N, N] tiles are still
resident in VMEM — the similarity matrices never round-trip to HBM
(the reference materializes R_a, R_p and ~9 full intermediates in HBM,
gpf_kernel.py:129-150).

VMEM budget per program: 2 x [N, D] tokens + ~4 x [N, N] working tiles.
For N=196, D=1536 fp32 that is ~3.1 MB — far under the ~16 MB/core limit.

Gradients: a SECOND fused kernel computes the exact analytic VJP in one
pass — Gram recompute, elementwise polynomial derivative chain
(A_p = R·clamp(R)^{p-1}  =>  A'_p = p·clamp(R)^{p-1}), the dR -> dtokens
matmuls, and the cosine-normalization backward all stay in VMEM.  The
pure-XLA fallback VJP re-materializes ~(P+1)(Q+1)+2 full [B, N, N]
intermediates in HBM; the fused backward reads tokens + the output
cotangent and writes dtokens + per-batch dcoeffs, nothing else.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..graph import gpf_fuse, token_similarity_graph



def _interpret_default() -> bool:
    """Interpret mode off-TPU (same rule as window_attention): lets the
    shard_map dispatch path and the CPU-mesh dryrun execute these kernels
    without the force_tpu_interpret_mode context."""
    return jax.default_backend() != "tpu"

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
        interpret=_interpret_default(),
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


def _gpf_bwd_kernel(
    ta_ref,
    tp_ref,
    coeffs_ref,
    g_ref,
    dta_ref,
    dtp_ref,
    dc_ref,
    *,
    similarity: str,
    eps: float,
    degree_p: int,
    degree_q: int,
    symmetric_enforce: bool,
):
    a = ta_ref[0].astype(jnp.float32)  # [N, D]
    p_ = tp_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)  # [N, N] output cotangent

    if similarity == "cosine":
        sa = jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True))
        sp = jnp.sqrt(jnp.sum(p_ * p_, axis=-1, keepdims=True))
        ma = jnp.maximum(sa, eps)
        mp = jnp.maximum(sp, eps)
        ah = a / ma
        ph = p_ / mp
    else:
        ah, ph = a, p_

    r_a = jax.lax.dot_general(
        ah, ah, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    r_p = jax.lax.dot_general(
        ph, ph, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    rac = jnp.maximum(r_a, 0.0)
    rpc = jnp.maximum(r_p, 0.0)

    # powers A_p = R_a * rac^(p-1) (p>=1), A_0 = 1; derivative A'_p = p*rac^(p-1)
    ones = jnp.ones_like(r_a)

    def powers(r, rc, degree):
        vals, grads = [ones], [jnp.zeros_like(r)]
        rc_pow = ones  # rc^(p-1)
        for k in range(1, degree + 1):
            vals.append(r * rc_pow)
            grads.append(k * rc_pow)
            rc_pow = rc_pow * rc
        return vals, grads

    a_vals, a_grads = powers(r_a, rac, degree_p)
    b_vals, b_grads = powers(r_p, rpc, degree_q)

    # forward recompute of the pre-ReLU fused graph (for the ReLU mask)
    fused = jnp.zeros_like(r_a)
    for p in range(degree_p + 1):
        for q in range(degree_q + 1):
            fused = fused + coeffs_ref[p, q] * (a_vals[p] * b_vals[q])
    if symmetric_enforce:
        fused = 0.5 * (fused + fused.T)

    df = g * (fused > 0.0).astype(jnp.float32)
    if symmetric_enforce:
        df = 0.5 * (df + df.T)

    dra = jnp.zeros_like(r_a)
    drp = jnp.zeros_like(r_p)
    dc_rows = []
    for p in range(degree_p + 1):
        dc_row = []
        for q in range(degree_q + 1):
            c = coeffs_ref[p, q]
            term = df * c
            dra = dra + term * (a_grads[p] * b_vals[q])
            drp = drp + term * (a_vals[p] * b_grads[q])
            dc_row.append(jnp.sum(df * (a_vals[p] * b_vals[q])))
        dc_rows.append(jnp.stack(dc_row))
    dc_ref[0] = jnp.stack(dc_rows)

    # Gram backward: R = X X^T  =>  dX = (dR + dR^T) X
    dah = jax.lax.dot_general(
        dra + dra.T, ah, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dph = jax.lax.dot_general(
        drp + drp.T, ph, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    if similarity == "cosine":
        # x̂ = x / max(‖x‖, eps): dx = (dx̂ - 1[‖x‖>eps] x̂ (x̂·dx̂)) / max(‖x‖, eps)
        proj_a = jnp.sum(ah * dah, axis=-1, keepdims=True)
        proj_p = jnp.sum(ph * dph, axis=-1, keepdims=True)
        da = (dah - jnp.where(sa > eps, 1.0, 0.0) * ah * proj_a) / ma
        dp = (dph - jnp.where(sp > eps, 1.0, 0.0) * ph * proj_p) / mp
    else:
        da, dp = dah, dph

    dta_ref[0] = da.astype(dta_ref.dtype)
    dtp_ref[0] = dp.astype(dtp_ref.dtype)


def _backward(
    tokens_a, tokens_p, coeffs, g, *, similarity, eps, symmetric_enforce
):
    b, n, d = tokens_a.shape
    degree_p = coeffs.shape[0] - 1
    degree_q = coeffs.shape[1] - 1
    kernel = partial(
        _gpf_bwd_kernel,
        similarity=similarity,
        eps=eps,
        degree_p=degree_p,
        degree_q=degree_q,
        symmetric_enforce=symmetric_enforce,
    )
    dta, dtp, dc = pl.pallas_call(
        kernel,
        interpret=_interpret_default(),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (degree_p + 1, degree_q + 1),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, degree_p + 1, degree_q + 1),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d), tokens_a.dtype),
            jax.ShapeDtypeStruct((b, n, d), tokens_p.dtype),
            jax.ShapeDtypeStruct((b, degree_p + 1, degree_q + 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * 4 * 2 * n * n * d,
            bytes_accessed=b * (4 * n * d + n * n) * 4,
            transcendentals=0,
        ),
    )(tokens_a, tokens_p, coeffs.astype(jnp.float32), g)
    return dta, dtp, jnp.sum(dc, axis=0).astype(coeffs.dtype)


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
    return _backward(
        tokens_a,
        tokens_p,
        coeffs,
        g,
        similarity=similarity,
        eps=eps,
        symmetric_enforce=symmetric_enforce,
    )


fused_gpf_pallas.defvjp(_fwd, _bwd)


def fused_gpf_available(
    n: int,
    d: int,
    platform: str | None = None,
    n_devices: int | None = None,
) -> bool:
    """Use the kernel on a SINGLE-device TPU process when the working set
    fits VMEM.

    The single-device requirement mirrors ``models.swin._single_tpu``:
    GSPMD cannot auto-partition ``pallas_call``, so a sharded multi-chip jit
    must either take the pure-XLA fallback or go through the ``shard_map``
    dispatch path (``parallel.shard_kernels`` + the ``fused_gpf_fits``
    per-shard gate — models/gpf.py wires it).  Without this check a real
    >1-chip TPU run would trace the kernel inside a GSPMD-partitioned
    program and fail at compile time (the capability the reference's own
    spec flags, /root/reference/docs/spec.md:199-202).
    """
    if platform is None:
        platform = jax.default_backend()
    if n_devices is None:
        n_devices = len(jax.devices())
    if platform not in ("tpu",) or n_devices != 1:
        return False
    return fused_gpf_fits(n, d)


def fused_gpf_fits(n: int, d: int) -> bool:
    """Shape-only VMEM check for ONE device — the per-shard gate for the
    ``shard_map`` dispatch path (parallel.shard_kernels), where each mesh
    device runs the kernel on its local batch block."""
    vmem_bytes = (2 * n * d + 6 * n * n) * 4
    return vmem_bytes < 12 * 1024 * 1024
