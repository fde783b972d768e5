"""Fused attention-half Pallas kernel for bandwidth-bound Swin stages.

One VMEM pass per spatial tile computes the ENTIRE attention half of a
SwinBlock:

    y = x + proj(window_attention(qkv(LN(x))))

At stage0/1 (C=128/256) the block is HBM-sweep-bound, not MXU-bound: the
qkv GEMM at C=128 writes a 308 MB [B, 56, 56, 384] tensor that the
attention kernel immediately reads back, LN materializes another full
activation, and proj/residual sweep it all again — ~1.5 GB of HBM traffic
per dual-view-128 block whose matmul FLOPs would take <1 ms on the MXU.
This kernel reads x once and writes y once (~206 MB): LN statistics, the
qkv/proj GEMMs, the per-group attention, and the residual all happen on
the VMEM-resident tile.

This deliberately revisits the round-2 "keep projections in XLA" lesson
(docs/PERFORMANCE.md): that lesson was measured at stage2 (C=512,
MXU-bound, where in-kernel matmul + relayout overhead exceeded the saved
sweeps).  At C<=256 the tradeoff inverts — the saved sweeps are ~85% of
the block's attention-half time.  Dispatch gates this kernel to the
bandwidth-bound widths and falls back to the spatial attention kernel
elsewhere.

Backward is a flash-style custom VJP: residuals are the kernel INPUTS
only; the backward kernel recomputes LN/qkv/probs in VMEM and emits dx in
one pass while accumulating all weight gradients (wqkv, bqkv, wproj,
bproj, LN scale/bias, relative-position bias) into constant-index output
blocks that stay VMEM-resident across the grid (same pattern as the
spatial kernel's dbias).

Reference being beaten: the torch/timm attention half the reference wraps
(/root/reference/src/models/cle_vit_backbone.py:198-204) — per-op HBM
round trips on every line.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window_attention import (
    _bdot,
    _group_windows,
    _head_slices,
    _interpret_default,
    _softmax,
    _spatial_mask_spec,
    _unflatten_windows,
)

__all__ = [
    "fused_attn_half_spatial",
    "attn_half_available",
]


def _ln_fwd(x32, g, b, eps):
    """LayerNorm over the last dim, fp32 in/out.  Returns (xn, mu, rstd)."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xn = xc * rstd * g + b
    return xn, xc, rstd


def _fwd_kernel(
    x_ref, lng_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    bias_ref, mask_ref, out_ref, *, nheads, scale, ws, tile_pack, mm_pack,
    ln_eps,
):
    nb, _, pws, c = x_ref.shape
    m = nb * ws * pws
    dt = x_ref.dtype

    x32 = x_ref[...].astype(jnp.float32)
    xn, _, _ = _ln_fwd(
        x32,
        lng_ref[...].astype(jnp.float32).reshape(1, 1, 1, c),
        lnb_ref[...].astype(jnp.float32).reshape(1, 1, 1, c),
        ln_eps,
    )
    xn = xn.astype(dt)

    # qkv GEMM on the VMEM tile: [M, C] @ [C, 3C]
    qkv = jax.lax.dot_general(
        xn.reshape(m, c), wqkv_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + bqkv_ref[...].astype(jnp.float32)
    qkv = qkv.astype(dt).reshape(nb, ws, pws, 3 * c)

    groups = _group_windows(qkv, ws, tile_pack, mm_pack)
    shared_mask = mask_ref.shape[0] == 1
    d = c // nheads
    out_groups = []
    for gi, xg in enumerate(groups):
        mask = mask_ref[0 if shared_mask else gi][None]
        outs = []
        for h in range(nheads):
            q, k, v = _head_slices(xg, c, d, h)
            logits = _bdot(q, k, 2, 2) * scale
            logits = logits + bias_ref[h % bias_ref.shape[0]][None] + mask
            probs = _softmax(logits)
            outs.append(_bdot(probs.astype(dt), v, 2, 1).astype(dt))
        out_groups.append(
            _unflatten_windows(jnp.concatenate(outs, axis=-1), ws, mm_pack)
        )
    om = (
        out_groups[0]
        if len(out_groups) == 1
        else jnp.concatenate(out_groups, axis=2)
    )  # [nb, ws, pws, C]

    # proj GEMM + residual, still in VMEM
    y = jax.lax.dot_general(
        om.reshape(m, c), wproj_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + bproj_ref[...].astype(jnp.float32)
    out_ref[...] = (x32 + y.reshape(nb, ws, pws, c)).astype(out_ref.dtype)


def _bwd_kernel(
    x_ref, lng_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    bias_ref, mask_ref, dy_ref,
    dx_ref, dlng_ref, dlnb_ref, dwqkv_ref, dbqkv_ref, dwproj_ref,
    dbproj_ref, dbias_ref,
    *, nheads, scale, ws, tile_pack, mm_pack, ln_eps,
):
    nb, _, pws, c = x_ref.shape
    m = nb * ws * pws
    dt = x_ref.dtype
    d = c // nheads

    first = jnp.logical_and(
        jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0),
        pl.program_id(2) == 0,
    )

    @pl.when(first)
    def _init():
        dlng_ref[...] = jnp.zeros_like(dlng_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwproj_ref[...] = jnp.zeros_like(dwproj_ref)
        dbproj_ref[...] = jnp.zeros_like(dbproj_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    # ---- recompute forward to probs (flash style) ----
    x32 = x_ref[...].astype(jnp.float32)
    g32 = lng_ref[...].astype(jnp.float32).reshape(1, 1, 1, c)
    xn32, xc, rstd = _ln_fwd(
        x32, g32, lnb_ref[...].astype(jnp.float32).reshape(1, 1, 1, c), ln_eps
    )
    xn = xn32.astype(dt)
    qkv = jax.lax.dot_general(
        xn.reshape(m, c), wqkv_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + bqkv_ref[...].astype(jnp.float32)
    qkv = qkv.astype(dt).reshape(nb, ws, pws, 3 * c)
    groups = _group_windows(qkv, ws, tile_pack, mm_pack)
    shared_mask = mask_ref.shape[0] == 1

    dy = dy_ref[...].astype(jnp.float32)  # [nb, ws, pws, C]
    # residual: dx gets dy directly (accumulated at the end)

    # proj backward: dom = dy @ wproj^T; dwproj += om^T dy; dbproj += sum dy
    # (om recomputed per group below, so dwproj accumulates per group)
    dy2 = dy.reshape(m, c).astype(dt)
    dom = jax.lax.dot_general(
        dy2, wproj_ref[...],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(nb, ws, pws, c)
    dbproj_ref[...] += jnp.sum(dy, axis=(0, 1, 2))[None]

    dom_groups = _group_windows(dom.astype(dt), ws, tile_pack, mm_pack)

    dqkv_groups = []
    om_parts = []
    for gi, (xg, domg) in enumerate(zip(groups, dom_groups)):
        mask = mask_ref[0 if shared_mask else gi][None]
        dqs, dks, dvs, outs = [], [], [], []
        for h in range(nheads):
            q, k, v = _head_slices(xg, c, d, h)
            logits = _bdot(q, k, 2, 2) * scale
            logits = logits + bias_ref[h % bias_ref.shape[0]][None] + mask
            probs = _softmax(logits)
            probs_c = probs.astype(dt)
            outs.append(_bdot(probs_c, v, 2, 1).astype(dt))  # om for dwproj
            do = domg[:, :, h * d : (h + 1) * d]
            dv = _bdot(probs_c, do, 1, 1)
            dp = _bdot(do, v, 2, 2)
            ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
            dbias_ref[h % dbias_ref.shape[0]] += jnp.sum(ds, axis=0)
            ds_c = ds.astype(dt)
            dq = _bdot(ds_c, k, 2, 1) * scale
            dk = _bdot(ds_c, q, 1, 1) * scale
            dqs.append(dq.astype(dt))
            dks.append(dk.astype(dt))
            dvs.append(dv.astype(dt))
        dqkv_groups.append(
            _unflatten_windows(
                jnp.concatenate(dqs + dks + dvs, axis=-1), ws, mm_pack
            )
        )
        om_parts.append(
            _unflatten_windows(jnp.concatenate(outs, axis=-1), ws, mm_pack)
        )
    dqkv = (
        dqkv_groups[0]
        if len(dqkv_groups) == 1
        else jnp.concatenate(dqkv_groups, axis=2)
    )  # [nb, ws, pws, 3C]
    om = (
        om_parts[0] if len(om_parts) == 1 else jnp.concatenate(om_parts, axis=2)
    )

    dwproj_ref[...] += jax.lax.dot_general(
        om.reshape(m, c), dy2,
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )

    # qkv backward
    dqkv2 = dqkv.reshape(m, 3 * c)
    dbqkv_ref[...] += jnp.sum(dqkv2.astype(jnp.float32), axis=0)[None]
    dwqkv_ref[...] += jax.lax.dot_general(
        xn.reshape(m, c), dqkv2,
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dxn = jax.lax.dot_general(
        dqkv2, wqkv_ref[...],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(nb, ws, pws, c)

    # LayerNorm backward (fp32): xhat = xc * rstd
    xhat = xc * rstd
    dlng_ref[...] += jnp.sum(dxn * xhat, axis=(0, 1, 2))[None]
    dlnb_ref[...] += jnp.sum(dxn, axis=(0, 1, 2))[None]
    dxhat = dxn * g32
    mean_dxhat = jnp.mean(dxhat, axis=-1, keepdims=True)
    mean_dxhat_xhat = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - mean_dxhat - xhat * mean_dxhat_xhat)

    dx_ref[...] = (dy + dx_ln).astype(dx_ref.dtype)


def _vmem_estimate(nb, ws, tile_pack, mm, c, h, backward) -> int:
    """Charged like the spatial kernel's estimate plus the GEMM tiles."""
    t = mm * ws * ws
    tile_tokens = ws * tile_pack * ws
    groups = tile_pack // mm
    x = nb * tile_tokens * c * (4 + 2) * 2  # f32 copy + bf16, in/out
    qkv = nb * tile_tokens * 3 * c * (2 + 4)  # bf16 tile + f32 GEMM temp
    per_head = (
        (4 if backward else 2) * nb * t * max(t, 128) * 4
        + (3 if backward else 1) * nb * t * 128 * (4 + 2)
    )
    weights = c * 3 * c * 2 + c * c * 2 + (c * 3 * c + c * c) * (4 if backward else 0)
    bias = h * t * t * 4 * (2 if backward else 1) + groups * t * t * 4
    extra_bwd = nb * tile_tokens * (3 * c + 2 * c) * 4 if backward else 0
    return x + qkv + groups * h * per_head + weights + bias + extra_bwd


def _pick_nb(b, ws, tile_pack, mm, c, h, backward) -> int:
    for nb in (16, 8, 4, 2, 1):
        if b % nb == 0 and _vmem_estimate(
            nb, ws, tile_pack, mm, c, h, backward
        ) <= 64 * 1024 * 1024:
            return nb
    return 1


def attn_half_available(
    hp: int, wp: int, ws: int, c: int, num_heads: int, pack: int, mm: int
) -> bool:
    """Same geometry rules as the spatial kernel, plus the bandwidth-bound
    width gate: the fused GEMMs only win where the block is HBM-bound
    (C <= 256 measured; at C >= 512 the round-2 half-block lesson stands)."""
    if c > 256:
        return False
    if hp % ws != 0 or wp % (pack * ws) != 0 or pack % mm != 0:
        return False
    if pack * ws != wp and (pack * ws) % 8 != 0:
        return False
    if c % 128 != 0 or c % num_heads != 0:
        return False
    return _vmem_estimate(1, ws, pack, mm, c, num_heads, True) <= 64 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def fused_attn_half_spatial(
    x: jnp.ndarray,
    ln_g: jnp.ndarray,
    ln_b: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wproj: jnp.ndarray,
    bproj: jnp.ndarray,
    bias: jnp.ndarray,
    mask: jnp.ndarray,
    num_heads: int,
    window_size: int,
    pack: int = 1,
    mm_pack: Optional[int] = None,
    ln_eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """y = x + proj(window_attn(qkv(LN(x)))) in one VMEM pass.

    Args mirror ``flash_window_attention_spatial`` plus the LN/qkv/proj
    parameters; ``x`` is the PRE-LN activation in image layout
    [B, Hp, Wp, C] (padded and/or rolled by the caller when applicable).
    """
    out, _ = _fwd(
        x, ln_g, ln_b, wqkv, bqkv, wproj, bproj, bias, mask,
        num_heads, window_size, pack, mm_pack, ln_eps, interpret,
    )
    return out


def _specs(b, nb, ws, pack, c, h, t, gpt, nwxg, w_mask):
    """Common in_specs for x-tile + params + bias/mask."""
    return [
        pl.BlockSpec(
            (nb, ws, pack * ws, c), lambda bb, wy, wxg: (bb, wy, wxg, 0)
        ),
        pl.BlockSpec((1, c), lambda bb, wy, wxg: (0, 0)),
        pl.BlockSpec((1, c), lambda bb, wy, wxg: (0, 0)),
        pl.BlockSpec((c, 3 * c), lambda bb, wy, wxg: (0, 0)),
        pl.BlockSpec((1, 3 * c), lambda bb, wy, wxg: (0, 0)),
        pl.BlockSpec((c, c), lambda bb, wy, wxg: (0, 0)),
        pl.BlockSpec((1, c), lambda bb, wy, wxg: (0, 0)),
        pl.BlockSpec((h, t, t), lambda bb, wy, wxg: (0, 0, 0)),
        _spatial_mask_spec(t, w_mask, gpt, nwxg),
    ]


def _fwd(x, ln_g, ln_b, wqkv, bqkv, wproj, bproj, bias, mask,
         num_heads, ws, pack, mm_pack, ln_eps, interpret):
    b, hp, wp, c = x.shape
    mm = pack if mm_pack is None else mm_pack
    t = mm * ws * ws
    gpt = pack // mm
    scale = (c // num_heads) ** -0.5
    nwy = hp // ws
    nwxg = wp // (pack * ws)
    nb = _pick_nb(b, ws, pack, mm, c, num_heads, backward=False)
    interp = _interpret_default() if interpret is None else interpret
    args2d = (
        ln_g.reshape(1, c), ln_b.reshape(1, c), wqkv, bqkv.reshape(1, 3 * c),
        wproj, bproj.reshape(1, c),
    )
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, nheads=num_heads, scale=scale, ws=ws,
            tile_pack=pack, mm_pack=mm, ln_eps=ln_eps,
        ),
        grid=(b // nb, nwy, nwxg),
        in_specs=_specs(b, nb, ws, pack, c, num_heads, t, gpt, nwxg,
                        mask.shape[0]),
        out_specs=pl.BlockSpec(
            (nb, ws, pack * ws, c), lambda bb, wy, wxg: (bb, wy, wxg, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interp,
    )(x, *args2d, bias, mask)
    return out, (x, ln_g, ln_b, wqkv, bqkv, wproj, bproj, bias, mask)


def _bwd(num_heads, ws, pack, mm_pack, ln_eps, interpret, res, dy):
    x, ln_g, ln_b, wqkv, bqkv, wproj, bproj, bias, mask = res
    b, hp, wp, c = x.shape
    mm = pack if mm_pack is None else mm_pack
    t = mm * ws * ws
    gpt = pack // mm
    scale = (c // num_heads) ** -0.5
    nwy = hp // ws
    nwxg = wp // (pack * ws)
    nb = _pick_nb(b, ws, pack, mm, c, num_heads, backward=True)
    interp = _interpret_default() if interpret is None else interpret
    args2d = (
        ln_g.reshape(1, c), ln_b.reshape(1, c), wqkv, bqkv.reshape(1, 3 * c),
        wproj, bproj.reshape(1, c),
    )
    const = lambda shape: pl.BlockSpec(shape, lambda bb, wy, wxg: (0,) * len(shape))
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, nheads=num_heads, scale=scale, ws=ws,
            tile_pack=pack, mm_pack=mm, ln_eps=ln_eps,
        ),
        grid=(b // nb, nwy, nwxg),
        in_specs=_specs(b, nb, ws, pack, c, num_heads, t, gpt, nwxg,
                        mask.shape[0])
        + [
            pl.BlockSpec(
                (nb, ws, pack * ws, c), lambda bb, wy, wxg: (bb, wy, wxg, 0)
            )
        ],
        out_specs=[
            pl.BlockSpec(
                (nb, ws, pack * ws, c), lambda bb, wy, wxg: (bb, wy, wxg, 0)
            ),
            const((1, c)),
            const((1, c)),
            const((c, 3 * c)),
            const((1, 3 * c)),
            const((c, c)),
            const((1, c)),
            const((bias.shape[0], t, t)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hp, wp, c), x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct(bias.shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interp,
    )(x, *args2d, bias, mask, dy)
    dx, dlng, dlnb, dwqkv, dbqkv, dwproj, dbproj, dbias = outs
    return (
        dx,
        dlng.reshape(ln_g.shape).astype(ln_g.dtype),
        dlnb.reshape(ln_b.shape).astype(ln_b.dtype),
        dwqkv.astype(wqkv.dtype),
        dbqkv.reshape(bqkv.shape).astype(bqkv.dtype),
        dwproj.astype(wproj.dtype),
        dbproj.reshape(bproj.shape).astype(bproj.dtype),
        dbias.astype(bias.dtype),
        jnp.zeros_like(mask),
    )


fused_attn_half_spatial.defvjp(_fwd, _bwd)
