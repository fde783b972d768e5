"""Q-tiled flash attention for long token sequences (ViT at 448+ inputs).

``window_attention.flash_window_attention`` holds one whole [T, T] logits
tile per head in VMEM and unrolls the head loop — fine for Swin windows
(T <= 98) and ViT at 224 (T = 197), but at ViT-L/448 (T = 785) the per-head
f32 logits alone are ~2.5 MB and Mosaic keeps every unrolled head's
temporaries live (measured; see window_attention._vmem_estimate), so the
backward wants >150 MB of VMEM.  This kernel restructures the problem the
flash way:

* heads become a GRID dimension (no unrolled per-head liveness),
* queries are processed in 128-row tiles ([tq, T] logits, ~0.45 MB f32),
* K/V for the whole sequence stay VMEM-resident per program (their block
  index is constant across the q-tile grid axis, so Mosaic fetches them
  once per (batch, head) cell).

The head split ([B, N, 3C] -> per-head [B*H, N, d]) happens OUTSIDE the
kernel in XLA — a cheap HBM relayout that sidesteps Mosaic's unsupported
lane-splitting reshapes.  No bias/mask support: this path serves the plain
ViT attention (zero bias, no windows); padding tokens are masked with an
additive lane mask built here.

Backward is a flash-style custom VJP: probs are recomputed per q-tile from
the saved q/k/v, dK/dV accumulate into constant-index f32 output blocks
across the q-tile axis.  Residuals are the kernel inputs only — no [T, T]
tensor ever reaches HBM in either direction.

Reference being beaten: the same timm/torch attention as
window_attention.py (reference cle_vit_backbone.py:198-204) at the
448-input configuration of BASELINE.json configs[4].
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "flash_attention_tiled",
    "flash_attention_tiled_available",
]

_TQ = 128  # query rows per tile


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def flash_attention_tiled_available(
    t: int, c: int, num_heads: int, platform: str | None = None
) -> bool:
    """Shapes the q-tiled kernel supports: head dim sublane-aligned and the
    resident K/V + one logits tile within a conservative VMEM budget."""
    if platform is None:
        platform = jax.default_backend()
    if platform not in ("tpu",):
        return False
    if c % num_heads != 0:
        return False
    d = c // num_heads
    if d % 8 != 0:
        return False
    nk = -(-t // 128) * 128
    # f32: k, v, dk, dv resident + logits/probs/dp/ds tiles + q/do/dq rows
    vmem = 4 * nk * d * 4 + 4 * _TQ * nk * 4 + 6 * _TQ * d * 4
    return vmem <= 40 * 1024 * 1024


def _fwd_kernel(q_ref, k_ref, v_ref, kmask_ref, out_ref, *, scale):
    # dtype-native matmuls (bf16 operands on the MXU, f32 accumulate);
    # scale folded into the f32 logits — same convention as
    # window_attention.py
    q = q_ref[0]  # [tq, d]
    k = k_ref[0]  # [nk, d]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [tq, nk]
    logits = logits + kmask_ref[0][None, :]
    probs = jax.nn.softmax(logits, axis=-1)
    out_ref[0] = jax.lax.dot_general(
        probs.astype(q.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _bwd_kernel(
    q_ref, k_ref, v_ref, kmask_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale
):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    dt = q.dtype

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + kmask_ref[0][None, :]
    probs = jax.nn.softmax(logits, axis=-1)  # [tq, nk] f32

    # dv += probs^T do ;  dp = do v^T ;  ds = probs*(dp - rowsum(dp*probs))
    dv_ref[0] += jax.lax.dot_general(
        probs.astype(dt), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    ds_c = ds.astype(dt)
    # dq = scale * ds k ;  dk += scale * ds^T q
    dq_ref[0] = (
        jax.lax.dot_general(
            ds_c, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    ).astype(dq_ref.dtype)
    dk_ref[0] += (
        jax.lax.dot_general(
            ds_c, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_core(q, k, v, kmask, scale: float, interpret: Optional[bool]):
    """q [G, Nq, d] (Nq % tq == 0), k/v [G, Nk, d] (Nk % 128 == 0),
    kmask [1, Nk] additive f32 -> out [G, Nq, d]."""
    out, _ = _core_fwd(q, k, v, kmask, scale, interpret)
    return out


def _core_fwd(q, k, v, kmask, scale, interpret):
    g, nq, d = q.shape
    nk = k.shape[1]
    interp = _interpret_default() if interpret is None else interpret
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(g, nq // _TQ),
        in_specs=[
            pl.BlockSpec((1, _TQ, d), lambda gg, qt: (gg, qt, 0)),
            pl.BlockSpec((1, nk, d), lambda gg, qt: (gg, 0, 0)),
            pl.BlockSpec((1, nk, d), lambda gg, qt: (gg, 0, 0)),
            pl.BlockSpec((1, nk), lambda gg, qt: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _TQ, d), lambda gg, qt: (gg, qt, 0)),
        out_shape=jax.ShapeDtypeStruct((g, nq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interp,
    )(q, k, v, kmask)
    return out, (q, k, v, kmask)


def _core_bwd(scale, interpret, res, dout):
    q, k, v, kmask = res
    g, nq, d = q.shape
    nk = k.shape[1]
    interp = _interpret_default() if interpret is None else interpret
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(g, nq // _TQ),
        in_specs=[
            pl.BlockSpec((1, _TQ, d), lambda gg, qt: (gg, qt, 0)),
            pl.BlockSpec((1, nk, d), lambda gg, qt: (gg, 0, 0)),
            pl.BlockSpec((1, nk, d), lambda gg, qt: (gg, 0, 0)),
            pl.BlockSpec((1, nk), lambda gg, qt: (0, 0)),
            pl.BlockSpec((1, _TQ, d), lambda gg, qt: (gg, qt, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, _TQ, d), lambda gg, qt: (gg, qt, 0)),
            # dk/dv: constant index over the q-tile axis -> VMEM-resident
            # accumulators, initialized at qt == 0
            pl.BlockSpec((1, nk, d), lambda gg, qt: (gg, 0, 0)),
            pl.BlockSpec((1, nk, d), lambda gg, qt: (gg, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, nq, d), q.dtype),
            jax.ShapeDtypeStruct((g, nk, d), jnp.float32),
            jax.ShapeDtypeStruct((g, nk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interp,
    )(q, k, v, kmask, dout)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), jnp.zeros_like(kmask)


_flash_core.defvjp(_core_fwd, _core_bwd)


def flash_attention_tiled(
    qkv: jnp.ndarray, num_heads: int, interpret: Optional[bool] = None
) -> jnp.ndarray:
    """Plain (bias-free, unwindowed) MHSA from a fused qkv projection.

    Args:
      qkv: [B, N, 3C] — the qkv Dense output.
      num_heads: H with C % H == 0 and (C/H) % 8 == 0.

    Returns: [B, N, C] in qkv.dtype.
    """
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    scale = d**-0.5

    # XLA-side head split: [B, N, 3C] -> 3 x [B*H, N, d]
    x = qkv.reshape(b, n, 3, num_heads, d)
    q = x[:, :, 0].transpose(0, 2, 1, 3).reshape(b * num_heads, n, d)
    k = x[:, :, 1].transpose(0, 2, 1, 3).reshape(b * num_heads, n, d)
    v = x[:, :, 2].transpose(0, 2, 1, 3).reshape(b * num_heads, n, d)

    nq = -(-n // _TQ) * _TQ
    nk = -(-n // 128) * 128
    if nq > n:
        q = jnp.pad(q, ((0, 0), (0, nq - n), (0, 0)))
    if nk > n:
        k = jnp.pad(k, ((0, 0), (0, nk - n), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, nk - n), (0, 0)))
    kmask = jnp.where(
        jnp.arange(nk) < n, 0.0, -1e9
    ).astype(jnp.float32)[None, :]

    out = _flash_core(q, k, v, kmask, scale, interpret)  # [BH, Nq, d]
    out = out[:, :n].reshape(b, num_heads, n, d).transpose(0, 2, 1, 3)
    return out.reshape(b, n, c)
