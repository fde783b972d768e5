"""VMEM-resident Newton–Schulz iSQRT Pallas kernel.

The iteration is the framework's latency target (O(B k D^3); BASELINE.md).
Under XLA each of the k x 3 batched matmuls round-trips its [D, D] operands
through HBM; this kernel keeps Y, Z and the product tile resident in VMEM
for the whole iteration — per batch element the HBM traffic drops from
~3k x 3 x D^2 words to exactly one read of M and one write of the result.

Uses the symmetric 3-matmul form (YZ = (ZY)^T for symmetric M — see
ops.moments.newton_schulz_isqrt), fp32 throughout (numerics pinned).

VMEM budget per program: M/out + Y + Z + T  =  4 x D^2 fp32, which caps the
fp32 variant at D ~ 800.  For 800 < D <= 1024 (the Swin-Base flagship head)
a second kernel stores Y/Z/T as bf16 with fp32 MXU accumulation — the
iteration is contractive (zero derivative at the fixed point) so per-step
rounding does not compound; trace normalization/rescale stay fp32 outside.
``newton_schulz_available`` gates the dispatch; D ~ 1536 (swin_large)
uses a two-buffer variant that streams M from HBM in column tiles
(``_ns_kernel_bf16_streamed``).

Gradients: custom_vjp recomputing through the identical pure-XLA iteration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..moments import newton_schulz_isqrt



def _interpret_default() -> bool:
    """Interpret mode off-TPU (same rule as window_attention): lets the
    shard_map dispatch path and the CPU-mesh dryrun execute these kernels
    without the force_tpu_interpret_mode context."""
    return jax.default_backend() != "tpu"

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
        interpret=_interpret_default(),
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


def _ns_kernel_bf16(
    m_hbm, out_hbm, m_buf, y_scr, t1_scr, t2_scr, sem_in, sem_out, *, num_iterations
):
    """bf16-storage iteration on a PRE-NORMALIZED matrix (trace ~ 1).

    VMEM strategy for D=1024 (4 MB/matrix fp32 doesn't fit 16 MB with
    double-buffered blocks):
    * single-matrix form — for symmetric M all iterates are polynomials in
      M, so Z_k == M @ Y_k exactly and the coupled iteration collapses to
      Y <- Y (3I - M Y^2) / 2 (same 3 matmuls/step, one less live matrix);
    * manual HBM<->VMEM DMA (ANY memory space) — no pipelined in/out
      blocks, just 4 x D^2 bf16 buffers = 8 MB at D=1024;
    * row-halved matmuls — each dot materializes at most a [D/2, D] fp32
      stack temp before the bf16 store (MXU still accumulates fp32).

    The iteration map has zero derivative at its fixed point, so per-step
    bf16 rounding does not compound.
    """
    i = pl.program_id(0)
    copy_in = pltpu.make_async_copy(m_hbm.at[i], m_buf, sem_in)
    copy_in.start()

    dim = m_buf.shape[-1]
    half = dim // 2
    y_scr[:] = jnp.eye(dim, dtype=jnp.bfloat16)
    copy_in.wait()

    def halved_matmul(out_ref, lhs_ref, rhs_ref, combine=None):
        # out[h] = lhs[h] @ rhs  (full-K contraction), one row-half at a time
        for h in (0, 1):
            sl = pl.ds(h * half, half)
            prod = jax.lax.dot_general(
                lhs_ref[sl, :], rhs_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if combine is not None:
                prod = combine(out_ref[sl, :], prod)
            out_ref[sl, :] = prod.astype(jnp.bfloat16)

    for _ in range(num_iterations):
        # T1 = Y @ Y ; T2 = M @ T1 ; Y <- 1.5 Y - 0.5 (Y @ T2)
        halved_matmul(t1_scr, y_scr, y_scr)
        halved_matmul(t2_scr, m_buf, t1_scr)
        # in-place row-half update is safe: row-half h of the product reads
        # only rows h of Y (and all of T2)
        halved_matmul(
            y_scr,
            y_scr,
            t2_scr,
            combine=lambda y_old, prod: 1.5 * y_old.astype(jnp.float32)
            - 0.5 * prod,
        )

    copy_out = pltpu.make_async_copy(y_scr, out_hbm.at[i], sem_out)
    copy_out.start()
    copy_out.wait()


def _ns_kernel_bf16_streamed(
    m_hbm, out_hbm, y_scr, p_scr, m_tile, sem_m, sem_out, *, num_iterations
):
    """bf16 iteration for D ~ 1536 (swin_large): only TWO resident [D, D]
    buffers.

    The D=1024 kernel holds four D^2 bf16 buffers (M, Y, T1, T2) — 18.9 MB
    at D=1536, over the ~16 MB VMEM.  This variant regroups the update

        Y <- 1.5 Y - 0.5 * Y M Y^2   (all iterates commute: polynomials in M)

    as P = (Y @ M), P <- P @ Y, Y <- 1.5 Y - 0.5 P @ Y, with:
    * M streamed from HBM in column tiles once per iteration (P[:, j] =
      Y @ M[:, j] touches only column block j of M) — 5 x D^2 bf16 reads
      total instead of a resident buffer;
    * P <- P @ Y updated in-place by ROW quarters (row r of the product
      reads only row r of P);
    * Y <- 1.5 Y - 0.5 P @ Y updated in-place by COLUMN tiles (column j of
      both terms reads only column j of Y).

    Budget at D=1536: Y + P (9.4 MB bf16) + one M column tile (1.2 MB) +
    a [D, D/4] fp32 product temp (2.4 MB) ~ 13 MB.
    """
    i = pl.program_id(0)
    dim = y_scr.shape[-1]
    cw = m_tile.shape[-1]  # column-tile width
    qr = dim // 4  # row quarter

    y_scr[:] = jnp.eye(dim, dtype=jnp.bfloat16)

    for _ in range(num_iterations):
        # P = Y @ M, column-tiled with M streamed from HBM
        for j in range(dim // cw):
            cp = pltpu.make_async_copy(
                m_hbm.at[i, :, pl.ds(j * cw, cw)], m_tile, sem_m
            )
            cp.start()
            cp.wait()
            prod = jax.lax.dot_general(
                y_scr[:], m_tile[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p_scr[:, pl.ds(j * cw, cw)] = prod.astype(jnp.bfloat16)
        # P <- P @ Y, in-place by row quarters
        for r in range(4):
            sl = pl.ds(r * qr, qr)
            prod = jax.lax.dot_general(
                p_scr[sl, :], y_scr[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p_scr[sl, :] = prod.astype(jnp.bfloat16)
        # Y <- 1.5 Y - 0.5 P @ Y, in-place by column tiles
        for j in range(dim // cw):
            sl = pl.ds(j * cw, cw)
            prod = jax.lax.dot_general(
                p_scr[:], y_scr[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y_scr[:, sl] = (
                1.5 * y_scr[:, sl].astype(jnp.float32) - 0.5 * prod
            ).astype(jnp.bfloat16)

    copy_out = pltpu.make_async_copy(y_scr, out_hbm.at[i], sem_out)
    copy_out.start()
    copy_out.wait()


def _forward_bf16(matrix, num_iterations, eps, force_streamed=False):
    """fp32 [B, D, D] -> fp32-normalized result via the bf16-VMEM kernel.

    Trace normalization and the 1/sqrt(trace) rescale stay fp32 in XLA;
    only the contractive iteration itself runs in bf16 storage.
    """
    b, d, _ = matrix.shape
    m32 = matrix.astype(jnp.float32)
    trace = jnp.trace(m32, axis1=-2, axis2=-1)[:, None, None] + eps
    mn = (m32 / trace).astype(jnp.bfloat16)
    if _bf16_resident_fits(d) and not force_streamed:
        kernel = partial(_ns_kernel_bf16, num_iterations=num_iterations)
        scratch = [
            pltpu.VMEM((d, d), jnp.bfloat16),  # M
            pltpu.VMEM((d, d), jnp.bfloat16),  # Y
            pltpu.VMEM((d, d), jnp.bfloat16),  # T1
            pltpu.VMEM((d, d), jnp.bfloat16),  # T2
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
    else:
        kernel = partial(_ns_kernel_bf16_streamed, num_iterations=num_iterations)
        scratch = [
            pltpu.VMEM((d, d), jnp.bfloat16),  # Y
            pltpu.VMEM((d, d), jnp.bfloat16),  # P
            pltpu.VMEM((d, d // 4), jnp.bfloat16),  # streamed M column tile
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
    y = pl.pallas_call(
        kernel,
        interpret=_interpret_default(),
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((b, d, d), jnp.bfloat16),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=b * num_iterations * 3 * 2 * d**3,
            bytes_accessed=b * 2 * d * d * 2,
            transcendentals=0,
        ),
    )(mn)
    return (y.astype(jnp.float32) / jnp.sqrt(trace)).astype(matrix.dtype)


def _dispatch(matrix, num_iterations, eps):
    d = matrix.shape[-1]
    if _fp32_fits(d):
        return _forward(matrix, num_iterations, eps)
    if _bf16_resident_fits(d) or _bf16_streamed_fits(d):
        return _forward_bf16(matrix, num_iterations, eps)
    # mirror newton_schulz_available: sizes no kernel variant supports get
    # the pure-XLA iteration instead of an opaque Mosaic failure
    return newton_schulz_isqrt(
        matrix, num_iterations=num_iterations, eps=eps, assume_symmetric=True
    )


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def newton_schulz_isqrt_pallas(matrix, num_iterations: int = 5, eps: float = 1e-5):
    """[B, D, D] symmetric PSD -> M^{-1/2}, VMEM-resident iteration.

    D <= ~800: fully fp32 in VMEM.  800 < D <= 1024 (the Swin-Base flagship
    head): bf16 VMEM storage with fp32 MXU accumulation (numerics note in
    ``_ns_kernel_bf16``).  Larger D falls back to pure XLA upstream
    (``newton_schulz_available``).
    """
    return _dispatch(matrix, num_iterations, eps)


def _fwd(matrix, num_iterations, eps):
    return _dispatch(matrix, num_iterations, eps), matrix


def _bwd(num_iterations, eps, matrix, g):
    _, vjp = jax.vjp(
        lambda m: newton_schulz_isqrt(
            m, num_iterations=num_iterations, eps=eps, assume_symmetric=True
        ),
        matrix,
    )
    return vjp(g)


newton_schulz_isqrt_pallas.defvjp(_fwd, _bwd)


def _fp32_fits(d: int) -> bool:
    # M(in block) + out block + 3 scratch tiles, fp32, double-buffered I/O
    return (5 * d * d * 4) < 13 * 1024 * 1024  # d <= ~800; 768 passes


def _bf16_resident_fits(d: int) -> bool:
    # 4 resident bf16 buffers (M, Y, T1, T2) + halved fp32 product temp
    return (7 * d * d * 2) < 15 * 1024 * 1024  # d <= ~1060; 1024 passes


def _bf16_streamed_fits(d: int) -> bool:
    # Y + P resident, M streamed in D/4 column tiles, [D, D/4] fp32 temp;
    # the in-place tiling needs D % 512 == 0 (quarter tiles on a 128 grid)
    if d % 512 != 0:
        return False
    return (2 * d * d * 2 + d * (d // 4) * (2 + 4)) < 14 * 1024 * 1024
    # d <= ~1664; covers D=1536 (swin_large)


def newton_schulz_available(
    d: int,
    platform: str | None = None,
    n_devices: int | None = None,
) -> bool:
    """Kernel dispatch gate: single-device TPU process + a fitting variant.

    Single-device because GSPMD cannot auto-partition ``pallas_call`` — a
    sharded multi-chip jit must use the XLA Newton–Schulz fallback OR the
    ``shard_map`` dispatch path (``parallel.shard_kernels`` +
    ``newton_schulz_fits``; models/moment_head.py wires it).
    """
    if platform is None:
        platform = jax.default_backend()
    if n_devices is None:
        n_devices = len(jax.devices())
    if platform not in ("tpu",) or n_devices != 1:
        return False
    return newton_schulz_fits(d)


def newton_schulz_fits(d: int) -> bool:
    """Shape-only check for ONE device — the per-shard gate for the
    ``shard_map`` dispatch path (parallel.shard_kernels)."""
    return _fp32_fits(d) or _bf16_resident_fits(d) or _bf16_streamed_fits(d)
