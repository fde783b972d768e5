"""Fused (flash-style) shifted-window attention Pallas kernel.

Replaces the XLA ``einsum -> add bias/mask -> softmax -> einsum`` chain in
``models/swin.py:WindowAttention`` with one VMEM-resident kernel: the
``[*, T, T]`` attention logits/probabilities never touch HBM.  On v5e the
XLA path's fp32 logit traffic dominates the whole Swin backbone (a
dual-view batch-64 stage0 block sweeps ~3.8 GB of HBM through the logits
alone — see docs/PERFORMANCE.md); the kernel reduces per-block attention
traffic to the qkv read + output write.

The kernel consumes the qkv Dense output directly in its natural
``[B, W, T, 3C]`` layout (``W`` = packed window groups per image,
``T`` = pack * window_size**2 tokens).  q/k/v are carved out with
lane-aligned static slices (C is a multiple of 128 for every Swin stage).

Custom VJP: backward recomputes logits+probs in VMEM from the saved qkv
(flash-attention style — the only residuals are the kernel *inputs*),
then emits dqkv in one pass and accumulates the relative-position-bias
gradient into a constant-index output block that stays VMEM-resident
across the whole grid.  This supersedes the ``attn_logits``/``attn_probs``
remat policy: with the kernel on, training memory holds no [*, T, T]
tensors at all.

Reference being beaten: the timm window attention wrapped by the
reference at /root/reference/src/models/cle_vit_backbone.py:198-204
(the torch path materializes logits in HBM exactly like our XLA path).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "flash_window_attention",
    "window_attention_available",
]


def _vmem_estimate(nb: int, t: int, c: int, h: int, backward: bool) -> int:
    """Rough VMEM bytes for one grid cell (double-buffered inputs).

    Mosaic keeps the unrolled per-head temporaries live across the whole
    head loop (measured: the stage3 backward at dual-view 128 allocated
    ~16 MB where a reuse-aware model predicts ~5 MB), so every per-head
    buffer is charged x H.  The [*, T, d] pieces pad their 32-lane minor
    dim to the full 128-lane tile; [*, T, T] temps pad T likewise.
    """
    tp = max(t, 128)
    qkv = nb * t * 3 * c * 2 * 2          # bf16 block, double-buffered
    # per-head f32 temps: logits+probs fwd (dp/ds too in backward), plus
    # the f32 q/k/v slices and the padded output pieces
    per_head = (
        (4 if backward else 2) * nb * t * tp * 4
        + (3 if backward else 1) * nb * t * 128 * (4 + 2)
    )
    out = nb * t * c * 2 * 2
    bias = h * t * t * 4 + t * t * 4
    return qkv + h * per_head + out + bias


def _pick_nb(b: int, t: int, c: int, h: int, backward: bool,
             budget: int = 40 * 1024 * 1024) -> int:
    for nb in (16, 8, 4, 2, 1):
        if b % nb == 0 and _vmem_estimate(nb, t, c, h, backward) <= budget:
            return nb
    return 1


def window_attention_available(t: int, c: int, num_heads: int) -> bool:
    """The kernel needs lane-aligned head slices and a VMEM-sized tile."""
    if c % 128 != 0 or c % num_heads != 0:
        return False
    return _vmem_estimate(1, t, c, num_heads, backward=True) <= 40 * 1024 * 1024


def _bdot(a, b, ca: int, cb: int):
    """Batched matmul with ONE batch dim (Mosaic `tpu.matmul` limit).

    a: [G, M, K?], b: [G, N, K?] — contracts a-dim ``ca`` with b-dim ``cb``.
    """
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _head_slices(x, c: int, d: int, h: int):
    """f32 q,k,v for head ``h`` from the raw [NB, T, 3C] block."""
    q = x[:, :, h * d : (h + 1) * d].astype(jnp.float32)
    k = x[:, :, c + h * d : c + (h + 1) * d].astype(jnp.float32)
    v = x[:, :, 2 * c + h * d : 2 * c + (h + 1) * d].astype(jnp.float32)
    return q, k, v


def _fwd_kernel(qkv_ref, bias_ref, mask_ref, out_ref, *, nheads, scale):
    nb, _, t, c3 = qkv_ref.shape
    c = c3 // 3
    d = c // nheads
    x = qkv_ref[:, 0]  # [NB, T, 3C]
    mask = mask_ref[0][None]  # [1, T, T]
    outs = []
    # static per-head unroll: Mosaic matmuls take one batch dim, and lane
    # reshapes [.., H*d] -> [.., H, d] are unsupported — per-head static
    # lane slices instead
    nb_heads_bias = bias_ref.shape[0]  # H, or 1 for a head-shared bias
    for h in range(nheads):
        q, k, v = _head_slices(x, c, d, h)
        logits = _bdot(q * scale, k, 2, 2)  # [NB, T, T] f32
        logits = logits + bias_ref[h % nb_heads_bias][None] + mask
        probs = jax.nn.softmax(logits, axis=-1)
        outs.append(_bdot(probs, v, 2, 1).astype(out_ref.dtype))
    out_ref[:, 0] = jnp.concatenate(outs, axis=-1)


def _bwd_kernel(qkv_ref, bias_ref, mask_ref, do_ref, dqkv_ref, dbias_ref, *,
                nheads, scale):
    nb, _, t, c3 = qkv_ref.shape
    c = c3 // 3
    d = c // nheads
    x = qkv_ref[:, 0]  # [NB, T, 3C]
    doh = do_ref[:, 0]  # [NB, T, C]
    mask = mask_ref[0][None]

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    dqs, dks, dvs = [], [], []
    for h in range(nheads):
        q, k, v = _head_slices(x, c, d, h)
        qs = q * scale
        logits = _bdot(qs, k, 2, 2) + bias_ref[h % bias_ref.shape[0]][None] + mask
        probs = jax.nn.softmax(logits, axis=-1)  # [NB, T, S] f32
        do = doh[:, :, h * d : (h + 1) * d].astype(jnp.float32)  # [NB, T, d]

        # dv[s] = sum_t p[t,s] do[t];   dp[t,s] = do[t] . v[s]
        dv = _bdot(probs, do, 1, 1)  # [NB, S, d]
        dp = _bdot(do, v, 2, 2)  # [NB, T, S]
        ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
        dbias_ref[h % dbias_ref.shape[0]] += jnp.sum(ds, axis=0)

        # dq[t] = scale * sum_s ds[t,s] k[s];  dk[s] = sum_t ds[t,s] qs[t]
        dq = scale * _bdot(ds, k, 2, 1)  # [NB, T, d]
        dk = _bdot(ds, qs, 1, 1)  # [NB, S, d]
        odt = dqkv_ref.dtype
        dqs.append(dq.astype(odt))
        dks.append(dk.astype(odt))
        dvs.append(dv.astype(odt))

    dqkv_ref[:, 0] = jnp.concatenate(dqs + dks + dvs, axis=-1)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _mask_spec(t: int, w_mask: int):
    if w_mask == 1:
        return pl.BlockSpec((1, t, t), lambda bb, wg: (0, 0, 0))
    return pl.BlockSpec((1, t, t), lambda bb, wg: (wg, 0, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_window_attention(
    qkv: jnp.ndarray,
    bias: jnp.ndarray,
    mask: jnp.ndarray,
    num_heads: int,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Windowed MHSA over packed windows, logits resident in VMEM.

    Args:
      qkv:  [B, W, T, 3C] — qkv projection output (window groups ``W``
            per image, ``T`` tokens per group).
      bias: [H, T, T] (or head-shared [1, T, T]) fp32 — relative-position
            bias expanded to the packed token grid (cross-window positions
            already sealed with -100); pass zeros for bias-free attention.
      mask: [W, T, T] or [1, T, T] fp32 — additive shift/pad mask per
            window group (zeros when nothing needs masking).
      num_heads: attention heads H; C % H == 0, C % 128 == 0.

    Returns: [B, W, T, C] in qkv.dtype.
    """
    out, _ = _fwd(qkv, bias, mask, num_heads, interpret)
    return out


def _fwd(qkv, bias, mask, num_heads, interpret):
    b, w, t, c3 = qkv.shape
    c = c3 // 3
    scale = (c // num_heads) ** -0.5
    nb = _pick_nb(b, t, c, num_heads, backward=False)
    interp = _interpret_default() if interpret is None else interpret
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, nheads=num_heads, scale=scale),
        grid=(b // nb, w),
        in_specs=[
            pl.BlockSpec((nb, 1, t, c3), lambda bb, wg: (bb, wg, 0, 0)),
            pl.BlockSpec((bias.shape[0], t, t), lambda bb, wg: (0, 0, 0)),
            _mask_spec(t, mask.shape[0]),
        ],
        out_specs=pl.BlockSpec((nb, 1, t, c), lambda bb, wg: (bb, wg, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, w, t, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # Mosaic keeps the unrolled per-head temporaries live, so the
            # true stack exceeds the conservative _vmem_estimate; raise the
            # per-kernel cap well past the 16 MB scoped default (physical
            # VMEM is far larger — same setting as jax's TPU flash kernels)
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interp,
    )(qkv, bias, mask)
    return out, (qkv, bias, mask)


def _bwd(num_heads, interpret, res, dout):
    qkv, bias, mask = res
    b, w, t, c3 = qkv.shape
    c = c3 // 3
    scale = (c // num_heads) ** -0.5
    nb = _pick_nb(b, t, c, num_heads, backward=True)
    interp = _interpret_default() if interpret is None else interpret
    dqkv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, nheads=num_heads, scale=scale),
        grid=(b // nb, w),
        in_specs=[
            pl.BlockSpec((nb, 1, t, c3), lambda bb, wg: (bb, wg, 0, 0)),
            pl.BlockSpec((bias.shape[0], t, t), lambda bb, wg: (0, 0, 0)),
            _mask_spec(t, mask.shape[0]),
            pl.BlockSpec((nb, 1, t, c), lambda bb, wg: (bb, wg, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((nb, 1, t, c3), lambda bb, wg: (bb, wg, 0, 0)),
            pl.BlockSpec((bias.shape[0], t, t), lambda bb, wg: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, w, t, c3), qkv.dtype),
            jax.ShapeDtypeStruct(bias.shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interp,
    )(qkv, bias, mask, dout)
    return dqkv, dbias.astype(bias.dtype), jnp.zeros_like(mask)


flash_window_attention.defvjp(_fwd, _bwd)
