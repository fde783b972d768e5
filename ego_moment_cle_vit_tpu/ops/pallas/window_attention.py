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
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Shift-free softmax (EMCT_ATTN_FAST_SOFTMAX=1): softmax is invariant to a
# constant shift, so the standard per-row max subtraction is purely an
# overflow guard — two extra VPU passes over every [T, T] tile (a reduce
# and a subtract) in both forward and backward.  Window-attention logits
# are f32 and bounded far below exp's ~88 overflow in practice; the clamp
# keeps pathological activations finite (changing results only where
# softmax already saturates one-hot), and the denominator epsilon turns an
# all-underflow row (e.g. garbage pad tokens at a -100 mask floor) into a
# zero row instead of NaN.  Default OFF (opt-in): the per-block wins are
# real (round 4 measured -0.81 ms/blk at stage0, -0.17 at stage2, dual-view
# 128) but the full-step delta (232.35 vs 231.5 img/s) sat inside the ±1%
# session variance — a default numerics divergence (saturation behavior
# changes) needs a default-visible win, and this one doesn't clear the bar
# (VERDICT r4 item 7).  Parity-tested in both modes incl. the all-underflow
# row; set EMCT_ATTN_FAST_SOFTMAX=1 to opt in.
_FAST_SOFTMAX = os.environ.get("EMCT_ATTN_FAST_SOFTMAX", "0") == "1"


def _softmax(logits):
    if not _FAST_SOFTMAX:
        return jax.nn.softmax(logits, axis=-1)
    e = jnp.exp(jnp.minimum(logits, 60.0))
    return e / (jnp.sum(e, axis=-1, keepdims=True) + 1e-30)

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
    """q,k,v for head ``h`` from the raw [NB, T, 3C] block.

    Kept in the INPUT dtype: the MXU contracts bf16 operands natively with
    f32 accumulation (``preferred_element_type`` in ``_bdot``), so casting
    to f32 here would halve matmul rate and double the per-head relayout
    work for zero accuracy gain — the XLA path the kernel replaces also
    feeds bf16 operands (models/swin.py WindowAttention casts probs to the
    module dtype before the PV einsum)."""
    q = x[:, :, h * d : (h + 1) * d]
    k = x[:, :, c + h * d : c + (h + 1) * d]
    v = x[:, :, 2 * c + h * d : 2 * c + (h + 1) * d]
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
        # dtype-native matmul, f32 accumulate; scale folded into the f32
        # logits (exact — no bf16 rounding of q)
        logits = _bdot(q, k, 2, 2) * scale  # [NB, T, T] f32
        logits = logits + bias_ref[h % nb_heads_bias][None] + mask
        probs = _softmax(logits)
        outs.append(_bdot(probs.astype(x.dtype), v, 2, 1).astype(out_ref.dtype))
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
    dt = x.dtype
    for h in range(nheads):
        q, k, v = _head_slices(x, c, d, h)
        logits = _bdot(q, k, 2, 2) * scale
        logits = logits + bias_ref[h % bias_ref.shape[0]][None] + mask
        probs = _softmax(logits)  # [NB, T, S] f32
        do = doh[:, :, h * d : (h + 1) * d]  # [NB, T, d] dtype-native

        # dv[s] = sum_t p[t,s] do[t];   dp[t,s] = do[t] . v[s]
        probs_c = probs.astype(dt)
        dv = _bdot(probs_c, do, 1, 1)  # [NB, S, d] f32
        dp = _bdot(do, v, 2, 2)  # [NB, T, S] f32
        ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
        dbias_ref[h % dbias_ref.shape[0]] += jnp.sum(ds, axis=0)

        # dq[t] = scale * sum_s ds[t,s] k[s];  dk[s] = scale * sum_t ds[t,s] q[t]
        ds_c = ds.astype(dt)
        dq = _bdot(ds_c, k, 2, 1) * scale  # [NB, T, d]
        dk = _bdot(ds_c, q, 1, 1) * scale  # [NB, S, d]
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


# ---------------------------------------------------------------------------
# Spatial-layout variant: the window partition/reverse happens IN THE BLOCK
# DMA instead of as XLA transpose copies.
# ---------------------------------------------------------------------------
#
# The XLA path around the packed kernel spends 4 full HBM sweeps of the
# activation per block on `_window_partition` / `_window_reverse` transposes
# (models/swin.py:243-257) — pure data movement.  Here the kernel reads the
# qkv tensor in its natural spatial layout [B, Hp, Wp, 3C]: each grid cell's
# BlockSpec fetches a [ws, pack*ws] spatial tile (= ``pack`` horizontally
# adjacent windows), and the flatten to packed attention tokens happens on
# VMEM-resident data.  The output is written back spatially the same way, so
# partition+reverse vanish from HBM entirely.  This is the "narrower fusion"
# redesign that docs/PERFORMANCE.md prescribes after the full half-block
# fusion measured slower: attention stays the only Mosaic matmul, every
# projection stays in XLA.


def _flatten_windows(x, ws: int, p: int):
    """[NB, ws, p*ws, F] -> [NB, p*ws*ws, F] (window-major token order)."""
    nb = x.shape[0]
    f = x.shape[-1]
    parts = [
        x[:, :, j * ws : (j + 1) * ws, :].reshape(nb, ws * ws, f)
        for j in range(p)
    ]
    return parts[0] if p == 1 else jnp.concatenate(parts, axis=1)


def _group_windows(x, ws: int, tile_pack: int, mm_pack: int):
    """[NB, ws, tile_pack*ws, F] -> list of [NB, mm_pack*ws*ws, F].

    The DMA tile covers a full row of ``tile_pack`` windows (Mosaic's
    block-shape rule), but the attention MATMULS run per group of
    ``mm_pack`` windows — the flatten produces per-window pieces anyway,
    so grouping them into packed problems costs nothing and avoids the
    O(tile_pack/mm_pack)x wasted cross-window logits a dense
    [tile_pack*ws*ws]^2 attention would compute."""
    nb = x.shape[0]
    f = x.shape[-1]
    parts = [
        x[:, :, j * ws : (j + 1) * ws, :].reshape(nb, ws * ws, f)
        for j in range(tile_pack)
    ]
    groups = []
    for g in range(tile_pack // mm_pack):
        sub = parts[g * mm_pack : (g + 1) * mm_pack]
        groups.append(sub[0] if mm_pack == 1 else jnp.concatenate(sub, axis=1))
    return groups


def _unflatten_windows(t, ws: int, p: int):
    """[NB, p*ws*ws, F] -> [NB, ws, p*ws, F]."""
    nb = t.shape[0]
    f = t.shape[-1]
    n = ws * ws
    parts = [
        t[:, j * n : (j + 1) * n, :].reshape(nb, ws, ws, f) for j in range(p)
    ]
    return parts[0] if p == 1 else jnp.concatenate(parts, axis=2)


def _fwd_kernel_spatial(qkv_ref, bias_ref, mask_ref, out_ref, *, nheads,
                        scale, ws, tile_pack, mm_pack):
    c3 = qkv_ref.shape[-1]
    c = c3 // 3
    d = c // nheads
    groups = _group_windows(qkv_ref[...], ws, tile_pack, mm_pack)
    shared_mask = mask_ref.shape[0] == 1
    out_groups = []
    for gi, x in enumerate(groups):
        mask = mask_ref[0 if shared_mask else gi][None]
        outs = []
        for h in range(nheads):
            q, k, v = _head_slices(x, c, d, h)
            logits = _bdot(q, k, 2, 2) * scale
            logits = logits + bias_ref[h % bias_ref.shape[0]][None] + mask
            probs = _softmax(logits)
            outs.append(
                _bdot(probs.astype(x.dtype), v, 2, 1).astype(out_ref.dtype)
            )
        out = jnp.concatenate(outs, axis=-1)  # [NB, Tmm, C]
        out_groups.append(_unflatten_windows(out, ws, mm_pack))
    out_ref[...] = (
        out_groups[0]
        if len(out_groups) == 1
        else jnp.concatenate(out_groups, axis=2)
    )


def _bwd_kernel_spatial(qkv_ref, bias_ref, mask_ref, do_ref, dqkv_ref,
                        dbias_ref, *, nheads, scale, ws, tile_pack, mm_pack):
    c3 = qkv_ref.shape[-1]
    c = c3 // 3
    d = c // nheads
    groups = _group_windows(qkv_ref[...], ws, tile_pack, mm_pack)
    do_groups = _group_windows(do_ref[...], ws, tile_pack, mm_pack)
    shared_mask = mask_ref.shape[0] == 1

    first = jnp.logical_and(
        jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0),
        pl.program_id(2) == 0,
    )

    @pl.when(first)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    dqkv_groups = []
    for gi, (x, doh) in enumerate(zip(groups, do_groups)):
        mask = mask_ref[0 if shared_mask else gi][None]
        dqs, dks, dvs = [], [], []
        dt = x.dtype
        for h in range(nheads):
            q, k, v = _head_slices(x, c, d, h)
            logits = _bdot(q, k, 2, 2) * scale
            logits = logits + bias_ref[h % bias_ref.shape[0]][None] + mask
            probs = _softmax(logits)
            do = doh[:, :, h * d : (h + 1) * d]
            probs_c = probs.astype(dt)
            dv = _bdot(probs_c, do, 1, 1)
            dp = _bdot(do, v, 2, 2)
            ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
            dbias_ref[h % dbias_ref.shape[0]] += jnp.sum(ds, axis=0)
            ds_c = ds.astype(dt)
            dq = _bdot(ds_c, k, 2, 1) * scale
            dk = _bdot(ds_c, q, 1, 1) * scale
            odt = dqkv_ref.dtype
            dqs.append(dq.astype(odt))
            dks.append(dk.astype(odt))
            dvs.append(dv.astype(odt))
        dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)  # [NB, Tmm, 3C]
        dqkv_groups.append(_unflatten_windows(dqkv, ws, mm_pack))
    dqkv_ref[...] = (
        dqkv_groups[0]
        if len(dqkv_groups) == 1
        else jnp.concatenate(dqkv_groups, axis=2)
    )


def _vmem_estimate_spatial(
    nb: int, ws: int, tile_pack: int, mm: int, c: int, h: int, backward: bool
) -> int:
    """VMEM bytes for one spatial grid cell: the DMA tile holds
    ``tile_pack`` windows, while the per-head attention temporaries are
    sized by the ``mm``-window matmul groups.  Mosaic keeps the unrolled
    group x head temporaries live, so they are charged fully."""
    t = mm * ws * ws
    tile_tokens = ws * tile_pack * ws
    groups = tile_pack // mm
    qkv = nb * tile_tokens * 3 * c * 2 * 2  # bf16 tile, double-buffered
    per_head = (
        (4 if backward else 2) * nb * t * max(t, 128) * 4
        + (3 if backward else 1) * nb * t * 128 * (4 + 2)
    )
    out = nb * tile_tokens * (3 * c if backward else c) * 2 * 2
    bias = h * t * t * 4 + groups * t * t * 4
    return qkv + groups * h * per_head + out + bias


def _pick_nb_spatial(
    b: int, ws: int, tile_pack: int, mm: int, c: int, h: int, backward: bool
) -> int:
    # 64 MB budget (vs the packed kernel's 40): mm-group temporaries are
    # small, and larger batch blocks measurably amortize per-cell overhead
    # (stage0 f+b 8.47 -> 7.63 ms, stage2 4.18 -> 3.97 at nb 16/8 vs 8/4)
    for nb in (32, 16, 8, 4, 2, 1):
        if b % nb == 0 and _vmem_estimate_spatial(
            nb, ws, tile_pack, mm, c, h, backward
        ) <= 64 * 1024 * 1024:
            return nb
    return 1


def spatial_window_attention_available(
    hp: int, wp: int, ws: int, c: int, num_heads: int, pack: int,
    mm_pack: int | None = None,
) -> bool:
    """Spatial-layout dispatch: same lane rules as the packed kernel plus
    a Mosaic-legal spatial tile.

    Mosaic requires the last two dims of a block shape to be divisible by
    (8, 128) or EQUAL to the full array dims; the qkv block is
    [nb, ws, pack*ws, 3C], so the width tile ``pack*ws`` must equal Wp or
    be a multiple of 8 (with ws=7 that means pack covering the full row —
    the caller picks ``pack = Wp // ws``).  ``mm_pack`` (default = pack)
    sets the in-kernel attention group size and must divide pack."""
    mm = pack if mm_pack is None else mm_pack
    if hp % ws != 0 or wp % (pack * ws) != 0 or pack % mm != 0:
        return False
    if pack * ws != wp and (pack * ws) % 8 != 0:
        return False
    if c % 128 != 0 or c % num_heads != 0:
        return False
    return _vmem_estimate_spatial(
        1, ws, pack, mm, c, num_heads, backward=True
    ) <= 64 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def flash_window_attention_spatial(
    qkv: jnp.ndarray,
    bias: jnp.ndarray,
    mask: jnp.ndarray,
    num_heads: int,
    window_size: int,
    pack: int = 1,
    mm_pack: Optional[int] = None,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Windowed MHSA straight from the spatial qkv map.

    Args:
      qkv:  [B, Hp, Wp, 3C] — qkv projection output in image layout
            (already shifted/padded by the caller when applicable).
      bias: [H, T, T] fp32 packed relative-position bias (T = mm*ws*ws).
      mask: [nW/mm, T, T] or [1, T, T] fp32 additive mask.
      num_heads / window_size / pack: DMA-tile geometry; Hp % ws == 0 and
            Wp % (pack*ws) == 0 (see ``spatial_window_attention_available``).
      mm_pack: windows per attention MATMUL group (default = pack).  The
            DMA tile still spans ``pack`` windows — Mosaic's block-shape
            rule — but the logits are computed per mm_pack-window group,
            so a full-row tile no longer pays dense cross-window FLOPs.
      scale: logit scale override (default (C/H)^-1/2).  Head-PADDED
            dispatch (models/swin.py: C=192 widened to 384 with zero
            lanes so the lane rules hold) passes the TRUE head dim's
            scale here, since C/H then reflects the padded slot.

    Returns: [B, Hp, Wp, C] in qkv.dtype — window partition AND reverse are
    absorbed into the kernel's block DMA.
    """
    out, _ = _fwd_spatial(
        qkv, bias, mask, num_heads, window_size, pack, mm_pack, scale,
        interpret,
    )
    return out


def _spatial_mask_spec(t: int, w_mask: int, gpt: int, nwxg: int):
    """Mask block per grid cell: the cell's ``gpt`` consecutive window
    groups (block-unit index = the cell's flat tile index)."""
    if w_mask == 1:
        return pl.BlockSpec((1, t, t), lambda bb, wy, wxg: (0, 0, 0))
    return pl.BlockSpec(
        (gpt, t, t), lambda bb, wy, wxg: (wy * nwxg + wxg, 0, 0)
    )


def _fwd_spatial(qkv, bias, mask, num_heads, ws, pack, mm_pack, scale,
                 interpret):
    b, hp, wp, c3 = qkv.shape
    c = c3 // 3
    mm = pack if mm_pack is None else mm_pack
    t = mm * ws * ws
    gpt = pack // mm  # mask groups per DMA tile
    if scale is None:
        scale = (c // num_heads) ** -0.5
    nwy = hp // ws
    nwxg = wp // (pack * ws)
    nb = _pick_nb_spatial(b, ws, pack, mm, c, num_heads, backward=False)
    interp = _interpret_default() if interpret is None else interpret
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel_spatial, nheads=num_heads, scale=scale, ws=ws,
            tile_pack=pack, mm_pack=mm,
        ),
        grid=(b // nb, nwy, nwxg),
        in_specs=[
            pl.BlockSpec(
                (nb, ws, pack * ws, c3), lambda bb, wy, wxg: (bb, wy, wxg, 0)
            ),
            pl.BlockSpec(
                (bias.shape[0], t, t), lambda bb, wy, wxg: (0, 0, 0)
            ),
            _spatial_mask_spec(t, mask.shape[0], gpt, nwxg),
        ],
        out_specs=pl.BlockSpec(
            (nb, ws, pack * ws, c), lambda bb, wy, wxg: (bb, wy, wxg, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interp,
    )(qkv, bias, mask)
    return out, (qkv, bias, mask)


def _bwd_spatial(num_heads, ws, pack, mm_pack, scale, interpret, res, dout):
    qkv, bias, mask = res
    b, hp, wp, c3 = qkv.shape
    c = c3 // 3
    mm = pack if mm_pack is None else mm_pack
    t = mm * ws * ws
    gpt = pack // mm
    if scale is None:
        scale = (c // num_heads) ** -0.5
    nwy = hp // ws
    nwxg = wp // (pack * ws)
    nb = _pick_nb_spatial(b, ws, pack, mm, c, num_heads, backward=True)
    interp = _interpret_default() if interpret is None else interpret
    dqkv, dbias = pl.pallas_call(
        functools.partial(
            _bwd_kernel_spatial, nheads=num_heads, scale=scale, ws=ws,
            tile_pack=pack, mm_pack=mm,
        ),
        grid=(b // nb, nwy, nwxg),
        in_specs=[
            pl.BlockSpec(
                (nb, ws, pack * ws, c3), lambda bb, wy, wxg: (bb, wy, wxg, 0)
            ),
            pl.BlockSpec(
                (bias.shape[0], t, t), lambda bb, wy, wxg: (0, 0, 0)
            ),
            _spatial_mask_spec(t, mask.shape[0], gpt, nwxg),
            pl.BlockSpec(
                (nb, ws, pack * ws, c), lambda bb, wy, wxg: (bb, wy, wxg, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (nb, ws, pack * ws, c3), lambda bb, wy, wxg: (bb, wy, wxg, 0)
            ),
            pl.BlockSpec(
                (bias.shape[0], t, t), lambda bb, wy, wxg: (0, 0, 0)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hp, wp, c3), qkv.dtype),
            jax.ShapeDtypeStruct(bias.shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interp,
    )(qkv, bias, mask, dout)
    return dqkv, dbias.astype(bias.dtype), jnp.zeros_like(mask)


flash_window_attention_spatial.defvjp(_fwd_spatial, _bwd_spatial)
