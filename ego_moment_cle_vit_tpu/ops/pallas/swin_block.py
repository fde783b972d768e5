"""Fused Swin attention half-block Pallas kernel (v2 of the flash kernel).

Fuses ``LN1 -> qkv projection -> windowed attention -> output projection
-> residual add`` into one VMEM pass over the (rolled, padded) feature
map.  Compared to the attention-only kernel (window_attention.py) this
additionally eliminates, per block: the LN1 read+write, the window
partition/reverse copies, the qkv Dense output round-trip (write + read:
the single biggest remaining sweep), and the proj/residual sweeps.  The
MLP half of the block stays in XLA (it is MXU-bound).

Layout: x is the post-roll padded map [B, HP, WP, C]; the grid is
(B/NB, HP/ws) — one row of windows per cell, so window partition becomes
an in-VMEM transpose.  Window packing (pack=2 along W) matches the XLA
path's pairing of raster-adjacent windows.

Backward (custom VJP, flash-style): recomputes LN/qkv/probs in VMEM from
the saved inputs and accumulates ALL parameter gradients (dWqkv, dbqkv,
dWproj, dbproj, dLN-scale, dLN-bias, d-relative-bias) into constant-index
output blocks that stay VMEM-resident across the whole grid.

STATUS — experimental opt-in (``attn_kernel='fused'``), correct but not
the default, and measured SLOWER than the production path at stage2
(13.97 vs 9.87 ms fwd+bwd at dual-view 128): Mosaic's in-kernel qkv/proj
matmuls and the window-layout relayouts cost more than the HBM sweeps
they eliminate at C>=512, and the backward is a very large Mosaic
program whose remote compiles ran 20+ minutes per stage variant (the
stage0 variant OOM-killed the compile helper twice).  A future version
should keep the projections in XLA and fuse only the
LN1+partition+attention+reverse band, or split the backward into a
recompute kernel plus XLA matmul grads.  The attention-only kernel
(window_attention.py) remains the production path.

Reference being beaten: the torch/timm SwinTransformerBlock as wrapped at
/root/reference/src/models/cle_vit_backbone.py:198-204 (every stage of it
round-trips HBM).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_window_block", "fused_window_block_available"]


def _budget() -> int:
    return 40 * 1024 * 1024


def _vmem_estimate(nb: int, ws: int, wp: int, c: int, h: int,
                   backward: bool) -> int:
    """Conservative per-cell VMEM model (per-head temps stay live)."""
    tokens = nb * ws * wp
    t = 2 * ws * ws if (wp // ws) % 2 == 0 else ws * ws
    x = tokens * c * 2 * 2            # bf16 in block, double buffered
    f32maps = tokens * c * 4 * (6 if backward else 4)  # ln/qkv/proj temps
    qkv = tokens * 3 * c * 4
    nwg = max((wp // ws) // 2, 1)
    g = nb * nwg
    perhead = h * ((4 if backward else 2) * g * t * max(t, 128) * 4
                   + (3 if backward else 1) * g * t * 128 * 6)
    weights = (c * 3 * c + c * c) * 2 * (3 if backward else 1)
    bias = h * t * t * 4 + nwg * t * t * 4
    return x + f32maps + qkv + perhead + weights + bias


def _pick_nb(b: int, ws: int, wp: int, c: int, h: int, backward: bool) -> int:
    for nb in (16, 8, 4, 2, 1):
        if b % nb == 0 and _vmem_estimate(nb, ws, wp, c, h, backward) <= _budget():
            return nb
    return 1


def fused_window_block_available(hp: int, wp: int, ws: int, c: int,
                                 num_heads: int) -> bool:
    """Shapes the fused kernel supports: lane-aligned C, whole window rows,
    and a VMEM-sized working set even at NB=1."""
    if c % 128 != 0 or c % num_heads != 0:
        return False
    if hp % ws != 0 or wp % ws != 0:
        return False
    return _vmem_estimate(1, ws, wp, c, num_heads, True) <= _budget()


def _layer_norm_f32(x, scale, bias, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    xhat = (x - mu) * jax.lax.rsqrt(var + eps)
    return xhat * scale + bias, xhat, jax.lax.rsqrt(var + eps)


def _to_windows(a, nb, ws, wp, p, dim):
    """[NB, ws, WP, dim] -> [NB*nwg, T, dim] with pack-p raster grouping."""
    nw = wp // ws
    nwg = nw // p
    a = a.reshape(nb, ws, nwg, p, ws, dim)
    a = a.transpose(0, 2, 3, 1, 4, 5)  # [NB, nwg, p, ws, ws, dim]
    return a.reshape(nb * nwg, p * ws * ws, dim)


def _from_windows(a, nb, ws, wp, p, dim):
    nw = wp // ws
    nwg = nw // p
    a = a.reshape(nb, nwg, p, ws, ws, dim)
    a = a.transpose(0, 3, 1, 2, 4, 5)  # [NB, ws, nwg, p, ws, dim]
    return a.reshape(nb, ws, wp, dim)


def _attention(qkv, bias_ref, mask, nheads, scale, g, t, c, out_dtype):
    """qkv: [G, T, 3C] f32 -> [G, T, C] attention output (out_dtype).

    mask: f32 [G, 1?, T, T]-broadcastable additive term (already sliced).
    """
    d = c // nheads
    nbh = bias_ref.shape[0]
    outs = []
    for h in range(nheads):
        q = qkv[:, :, h * d:(h + 1) * d]
        k = qkv[:, :, c + h * d: c + (h + 1) * d]
        v = qkv[:, :, 2 * c + h * d: 2 * c + (h + 1) * d]
        logits = jax.lax.dot_general(
            q * scale, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        logits = logits + bias_ref[h % nbh][None] + mask
        probs = jax.nn.softmax(logits, axis=-1)
        outs.append(
            jax.lax.dot_general(
                probs, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(out_dtype)
        )
    return jnp.concatenate(outs, axis=-1)


def _fwd_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, bias_ref,
                mask_ref, wproj_ref, bproj_ref, out_ref, *,
                nheads, ws, pack, eps):
    nb, _, wp, c = x_ref.shape
    nw = wp // ws
    p = pack if nw % pack == 0 else 1
    nwg = nw // p
    t = p * ws * ws

    x = x_ref[...].astype(jnp.float32)  # [NB, ws, WP, C]
    ln, _, _ = _layer_norm_f32(x, lns_ref[...], lnb_ref[...], eps)
    tokens = nb * ws * wp
    qkv = jax.lax.dot_general(
        ln.reshape(tokens, c), wqkv_ref[...].astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + bqkv_ref[...].astype(jnp.float32)
    qkv = _to_windows(qkv.reshape(nb, ws, wp, 3 * c), nb, ws, wp, p, 3 * c)

    g = nb * nwg
    scale = (c // nheads) ** -0.5
    # mask_ref: [nwg, T, T] (this window-row's groups); broadcast over NB
    mask = mask_ref[...][None]  # [1, nwg, T, T]
    mask = jnp.broadcast_to(mask, (nb, nwg, t, t)).reshape(g, t, t)
    attn = _attention(qkv, bias_ref, mask, nheads, scale, g, t, c,
                      jnp.float32)
    attn = _from_windows(attn, nb, ws, wp, p, c)  # [NB, ws, WP, C] f32

    proj = jax.lax.dot_general(
        attn.reshape(tokens, c), wproj_ref[...].astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + bproj_ref[...].astype(jnp.float32)
    out = x + proj.reshape(nb, ws, wp, c)
    out_ref[...] = out.astype(out_ref.dtype)


def _bwd_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, bias_ref,
                mask_ref, wproj_ref, bproj_ref, do_ref,
                dx_ref, dlns_ref, dlnb_ref, dwqkv_ref, dbqkv_ref, dbias_ref,
                dwproj_ref, dbproj_ref, *, nheads, ws, pack, eps):
    nb, _, wp, c = x_ref.shape
    nw = wp // ws
    p = pack if nw % pack == 0 else 1
    nwg = nw // p
    t = p * ws * ws
    d = c // nheads
    tokens = nb * ws * wp
    g = nb * nwg
    scale = d ** -0.5

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dlns_ref[...] = jnp.zeros_like(dlns_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)
        dwproj_ref[...] = jnp.zeros_like(dwproj_ref)
        dbproj_ref[...] = jnp.zeros_like(dbproj_ref)

    # ---- recompute forward pieces ----
    x = x_ref[...].astype(jnp.float32)
    lns = lns_ref[...]
    ln, xhat, rsig = _layer_norm_f32(x, lns, lnb_ref[...], eps)
    ln2d = ln.reshape(tokens, c)
    qkv2d = jax.lax.dot_general(
        ln2d, wqkv_ref[...].astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + bqkv_ref[...].astype(jnp.float32)
    qkvw = _to_windows(qkv2d.reshape(nb, ws, wp, 3 * c), nb, ws, wp, p, 3 * c)

    mask = mask_ref[...][None]
    mask = jnp.broadcast_to(mask, (nb, nwg, t, t)).reshape(g, t, t)

    do = do_ref[...].astype(jnp.float32)  # [NB, ws, WP, C]
    do2d = do.reshape(tokens, c)

    # ---- proj backward ----
    # attn_out (merged) is needed for dWproj: recompute attention
    nbh = bias_ref.shape[0]
    dattn_w = jax.lax.dot_general(  # dproj_in = do @ Wproj^T
        do2d, wproj_ref[...].astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dattn = _to_windows(
        dattn_w.reshape(nb, ws, wp, c), nb, ws, wp, p, c
    )  # [G, T, C]

    attn_pieces = []
    dqkv_pieces_q, dqkv_pieces_k, dqkv_pieces_v = [], [], []
    for h in range(nheads):
        q = qkvw[:, :, h * d:(h + 1) * d]
        k = qkvw[:, :, c + h * d: c + (h + 1) * d]
        v = qkvw[:, :, 2 * c + h * d: 2 * c + (h + 1) * d]
        qs = q * scale
        logits = jax.lax.dot_general(
            qs, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) + bias_ref[h % nbh][None] + mask
        probs = jax.nn.softmax(logits, axis=-1)
        attn_pieces.append(
            jax.lax.dot_general(
                probs, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
        doh = dattn[:, :, h * d:(h + 1) * d]
        dv = jax.lax.dot_general(
            probs, doh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            doh, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
        dbias_ref[h % dbias_ref.shape[0]] += jnp.sum(ds, axis=0)
        dq = scale * jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds, qs, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkv_pieces_q.append(dq)
        dqkv_pieces_k.append(dk)
        dqkv_pieces_v.append(dv)

    attn_merged = jnp.concatenate(attn_pieces, axis=-1)  # [G, T, C]
    attn_map = _from_windows(attn_merged, nb, ws, wp, p, c)
    dwproj_ref[...] += jax.lax.dot_general(  # attn^T @ do
        attn_map.reshape(tokens, c), do2d,
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dbproj_ref[...] += jnp.sum(do2d, axis=0)

    dqkv = jnp.concatenate(
        dqkv_pieces_q + dqkv_pieces_k + dqkv_pieces_v, axis=-1
    )  # [G, T, 3C]
    dqkv_map = _from_windows(dqkv, nb, ws, wp, p, 3 * c)
    dqkv2d = dqkv_map.reshape(tokens, 3 * c)

    dwqkv_ref[...] += jax.lax.dot_general(  # ln^T @ dqkv
        ln2d, dqkv2d, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbqkv_ref[...] += jnp.sum(dqkv2d, axis=0)

    dln = jax.lax.dot_general(  # dqkv @ Wqkv^T
        dqkv2d, wqkv_ref[...].astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(nb, ws, wp, c)

    xhat_ = xhat
    dlns_ref[...] += jnp.sum(dln * xhat_, axis=(0, 1, 2))
    dlnb_ref[...] += jnp.sum(dln, axis=(0, 1, 2))

    dxh = dln * lns  # upstream through the affine
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat_, axis=-1, keepdims=True)
    dx_ln = rsig * (dxh - m1 - xhat_ * m2)

    dx_ref[...] = (do + dx_ln).astype(dx_ref.dtype)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _specs(nb, ws, wp, c, h, nwg, t, w_mask):
    x_spec = pl.BlockSpec((nb, ws, wp, c), lambda bb, r: (bb, r, 0, 0))
    const = lambda *shape: pl.BlockSpec(shape, lambda bb, r: (0,) * len(shape))
    if w_mask == 1:
        mask_spec = pl.BlockSpec((1, t, t), lambda bb, r: (0, 0, 0))
    else:
        mask_spec = pl.BlockSpec((nwg, t, t), lambda bb, r: (r, 0, 0))
    return x_spec, const, mask_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def fused_window_block(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    bias: jnp.ndarray,
    mask: jnp.ndarray,
    wproj: jnp.ndarray,
    bproj: jnp.ndarray,
    num_heads: int,
    window_size: int,
    pack: int,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """x + Proj(WindowAttention(LN(x) @ Wqkv)) in one VMEM pass.

    Args:
      x: [B, HP, WP, C] rolled+padded feature map (HP % ws == WP % ws == 0).
      ln_scale, ln_bias: [C] LayerNorm affine.
      wqkv: [C, 3C]; bqkv: [3C]; wproj: [C, C]; bproj: [C].
      bias: [H or 1, T, T] fp32 — relative-position bias on the packed
        grid, cross-window blocks sealed (see window_attention.py).
      mask: [nH*nwg, T, T] fp32 per-window-group additive mask in raster
        order, or [1, T, T] (shared; zeros when nothing needs masking).
      num_heads/window_size/pack: static ints.  T = pack * ws**2.

    Returns [B, HP, WP, C] in x.dtype.
    """
    out, _ = _fwd(x, ln_scale, ln_bias, wqkv, bqkv, bias, mask, wproj,
                  bproj, num_heads, window_size, pack, eps, interpret)
    return out


def _grid_info(x, mask, num_heads, window_size, pack, backward):
    b, hp, wp, c = x.shape
    ws = window_size
    nw = wp // ws
    p = pack if nw % pack == 0 else 1
    nwg = nw // p
    t = p * ws * ws
    nb = _pick_nb(b, ws, wp, c, num_heads, backward)
    nrows = hp // ws
    return b, hp, wp, c, ws, p, nwg, t, nb, nrows


def _fwd(x, ln_scale, ln_bias, wqkv, bqkv, bias, mask, wproj, bproj,
         num_heads, window_size, pack, eps, interpret):
    b, hp, wp, c, ws, p, nwg, t, nb, nrows = _grid_info(
        x, mask, num_heads, window_size, pack, False
    )
    interp = _interpret_default() if interpret is None else interpret
    x_spec, const, mask_spec = _specs(nb, ws, wp, c, num_heads, nwg, t,
                                      mask.shape[0])
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, nheads=num_heads, ws=ws, pack=p,
                          eps=eps),
        grid=(b // nb, nrows),
        in_specs=[
            x_spec,
            const(c), const(c),
            const(c, 3 * c), const(3 * c),
            const(*bias.shape),
            mask_spec,
            const(c, c), const(c),
        ],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interp,
    )(x, ln_scale, ln_bias, wqkv, bqkv, bias, mask, wproj, bproj)
    return out, (x, ln_scale, ln_bias, wqkv, bqkv, bias, mask, wproj, bproj)


def _bwd(num_heads, window_size, pack, eps, interpret, res, dout):
    (x, ln_scale, ln_bias, wqkv, bqkv, bias, mask, wproj, bproj) = res
    b, hp, wp, c, ws, p, nwg, t, nb, nrows = _grid_info(
        x, mask, num_heads, window_size, pack, True
    )
    interp = _interpret_default() if interpret is None else interpret
    x_spec, const, mask_spec = _specs(nb, ws, wp, c, num_heads, nwg, t,
                                      mask.shape[0])
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, nheads=num_heads, ws=ws, pack=p,
                          eps=eps),
        grid=(b // nb, nrows),
        in_specs=[
            x_spec,
            const(c), const(c),
            const(c, 3 * c), const(3 * c),
            const(*bias.shape),
            mask_spec,
            const(c, c), const(c),
            x_spec,
        ],
        out_specs=[
            x_spec,
            const(c), const(c),
            const(c, 3 * c), const(3 * c),
            const(*bias.shape),
            const(c, c), const(c),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((c,), f32),
            jax.ShapeDtypeStruct((c,), f32),
            jax.ShapeDtypeStruct((c, 3 * c), f32),
            jax.ShapeDtypeStruct((3 * c,), f32),
            jax.ShapeDtypeStruct(bias.shape, f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c,), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interp,
    )(x, ln_scale, ln_bias, wqkv, bqkv, bias, mask, wproj, bproj, dout)
    dx, dlns, dlnb, dwqkv, dbqkv, dbias, dwproj, dbproj = outs
    return (dx, dlns.astype(ln_scale.dtype), dlnb.astype(ln_bias.dtype),
            dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
            dbias.astype(bias.dtype), jnp.zeros_like(mask),
            dwproj.astype(wproj.dtype), dbproj.astype(bproj.dtype))


fused_window_block.defvjp(_fwd, _bwd)
