"""Swin Transformer backbone in Flax.

TPU-native stand-in for the reference's timm Swin backbones (the flagship
config uses ``swin_large_patch4_window7_224``; /root/reference/configs/
ufg_base.yaml:7, wrapped via cle_vit_backbone.py:198-204).  The wrapper in
``backbone.py`` mean-pools our [B, N, D] output for the global feature,
matching the reference's Swin path (cle_vit_backbone.py:238-248).

Architecture follows Liu et al. 2021: 4 stages of shifted-window attention
with relative position bias, patch merging between stages.

TPU notes
---------
* Window partition/reverse are pure reshapes/transposes — zero-copy layout
  changes under XLA.
* The shifted-window attention mask is computed with numpy at trace time
  (static resolutions) and baked into the graph as a constant.
* All attention is batched over (batch x windows) so the MXU sees one large
  [B*nW, 49, 49] einsum per block.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ego_moment_cle_vit_tpu.ops.pallas.attn_half import (
    attn_half_available,
    fused_attn_half_spatial,
)
from ego_moment_cle_vit_tpu.ops.pallas.window_attention import (
    flash_window_attention,
    flash_window_attention_spatial,
    spatial_window_attention_available,
    window_attention_available,
)
Dtype = Any


def _single_tpu() -> bool:
    return jax.default_backend() == "tpu" and len(jax.devices()) == 1


# spatial-layout attention kernel (window partition/reverse absorbed into
# the kernel's block DMA — ops/pallas/window_attention.py spatial variant).
# True: 'auto' prefers it over the packed-layout kernel where it wins.
_SPATIAL_IN_AUTO = True

# Mosaic's block-shape rule forces the spatial DMA tile to a FULL row of
# windows (tile pack = Wp/ws).  The attention MATMULS inside the kernel run
# per mm_pack-window group (mm_pack = 2 when the row divides evenly) — the
# same problem size as the packed-layout kernel — so the full-row tile no
# longer pays dense cross-window logits, and the partition/reverse DMA
# savings are profit at every stage.  _SPATIAL_MAX_PACK bounds the MATMUL
# group (mm_pack); env override EMCT_SPATIAL_MAX_PACK for on-chip A/Bs
# (larger groups trade wasted cross-window FLOPs for fewer, better-utilized
# matmul/softmax problems).
import os as _os

_SPATIAL_MAX_PACK = int(_os.environ.get("EMCT_SPATIAL_MAX_PACK", "2"))


def _spatial_mm_pack(tile_pack: int) -> int:
    """Attention matmul group size for the spatial kernel: the largest
    divisor of ``tile_pack`` that is <= ``_SPATIAL_MAX_PACK`` (so the A/B
    hook genuinely bounds the matmul group both ways — raising it above 2
    selects bigger groups when the row divides, values < 1 clamp to 1).
    Default 2: pairs match the packed kernel's raster-pack FLOPs."""
    cap = max(1, _SPATIAL_MAX_PACK)
    mm = 1
    for d in range(2, tile_pack + 1):
        if tile_pack % d == 0 and d <= cap:
            mm = d
    return mm


def _use_spatial_kernel(mode: str, hp: int, wp: int, ws: int, c: int,
                        num_heads: int, pack: int, mm: int,
                        batch: int | None = None) -> str | None:
    """'spatial' forces the spatial-layout kernel; 'auto' picks it on a
    single-device TPU where it measured faster, or — under a multi-device
    mesh with SPMD kernel dispatch on (parallel.shard_kernels) — via a
    per-shard ``shard_map`` wrap.  Returns 'direct', 'spmd', or None."""
    if mode == "spatial":
        if not spatial_window_attention_available(
            hp, wp, ws, c, num_heads, pack, mm
        ):
            raise ValueError(
                "attn_kernel='spatial' requested but the spatial kernel does "
                f"not support this block (hp={hp}, wp={wp}, ws={ws}, C={c}, "
                f"heads={num_heads}, pack={pack}, mm={mm}): C must be a "
                "multiple of 128 and of num_heads, Wp a multiple of pack*ws, "
                "mm must divide pack, and the tile must fit VMEM"
            )
        return _kernel_dispatch_kind(batch, forced=True)
    if mode != "auto" or not _SPATIAL_IN_AUTO:
        return None
    if not spatial_window_attention_available(hp, wp, ws, c, num_heads, pack, mm):
        return None
    return _kernel_dispatch_kind(batch, forced=False)


# fused attention-half kernel (LN1 + qkv + attention + proj + residual in
# one VMEM pass, ops/pallas/attn_half.py) at the bandwidth-bound widths
# (C <= 256).  EMCT_FUSED_HALF gates its 'auto' participation.
_FUSED_HALF_IN_AUTO = _os.environ.get("EMCT_FUSED_HALF", "0") == "1"


def _use_fused_half(mode: str, hp: int, wp: int, ws: int, c: int,
                    num_heads: int, pack: int, mm: int,
                    batch: int | None = None) -> str | None:
    """'fused_half' selects the fused attention-half kernel on every block
    it supports (C<=256) and falls back to the regular 'auto' dispatch on
    the rest — so the mode is usable for a whole model whose deep stages
    exceed the width gate.  Round-4 measurement: the fused kernel WINS
    forward-only (stage0 9.51 vs 9.88 ms/blk) but loses fwd+bwd (25.33 vs
    24.33) — its in-kernel dW GEMM chain schedules worse than XLA's — so
    'auto' keeps it OFF for training (EMCT_FUSED_HALF=1 overrides) and the
    mode is the serving-path knob.  Returns 'direct', 'spmd', or None."""
    if mode == "fused_half":
        if attn_half_available(hp, wp, ws, c, num_heads, pack, mm):
            return _kernel_dispatch_kind(batch, forced=True)
        return None
    if mode != "auto" or not _FUSED_HALF_IN_AUTO:
        return None
    if not attn_half_available(hp, wp, ws, c, num_heads, pack, mm):
        return None
    return _kernel_dispatch_kind(batch, forced=False)


def _kernel_dispatch_kind(batch: int | None, forced: bool) -> str | None:
    """'direct' on a single-device TPU (or for a forced mode off-mesh, e.g.
    CPU interpret parity runs), 'spmd' when the shard_map dispatch applies,
    else None ('auto' falls back to XLA)."""
    from ..parallel.shard_kernels import spmd_kernels_enabled

    if batch is not None and spmd_kernels_enabled(batch) is not None:
        return "spmd"
    if _single_tpu() or forced:
        return "direct"
    return None


def _use_attn_kernel(mode: str, t: int, c: int, num_heads: int,
                     batch: int | None = None) -> str | None:
    """Resolve the attn_kernel config ('auto'|'on'|'off') for one block:
    'direct', 'spmd' (per-shard kernel via shard_map under a mesh —
    parallel.shard_kernels), or None (XLA path).

    'auto' engages the kernel on a single-device TPU process or under an
    SPMD-enabled mesh; bare multi-device GSPMD keeps the XLA path (it
    cannot partition ``pallas_call``).
    """
    if mode == "off":
        return None
    if mode == "on":
        # fail loudly on non-qualifying shapes instead of handing Mosaic an
        # unsupported problem (opaque compile error / silent interpret run)
        if not window_attention_available(t, c, num_heads):
            raise ValueError(
                "attn_kernel='on' requested but the flash window-attention "
                f"kernel does not support this block (T={t}, C={c}, "
                f"heads={num_heads}): C must be a multiple of 128 and of "
                "num_heads and the per-window tile must fit VMEM; use "
                "'auto' to fall back to the XLA path on such blocks"
            )
        return _kernel_dispatch_kind(batch, forced=True)
    if mode != "auto" or not window_attention_available(t, c, num_heads):
        return None
    return _kernel_dispatch_kind(batch, forced=False)


def _build_bias_bd(table: jnp.ndarray, ws: int, p: int, num_heads: int):
    """[table, H] param -> [H, pN, pN] fp32 bias with pack cross-seal.

    One-hot matmul instead of a gather (gathers are ~100x slower than
    matmuls on this TPU and would be replayed in remat backwards).

    The one-hot is built IN-GRAPH from the tiny [n*n] int index (iota
    compare, fused by XLA) rather than materialized host-side: a baked
    [2401, 169] f32 literal is ~1.6 MB of HLO text PER BLOCK (~78 MB over
    24 Swin blocks), which the axon remote-compile service must ingest on
    every cold compile — measured as the dominant cause of the 12-50 min
    cold compiles and mid-compile transport faults (round-5 diagnosis).
    Same 0/1 values, bit-identical matmul.
    """
    n = ws * ws
    idx = jnp.asarray(_relative_position_index(ws).reshape(-1), jnp.int32)
    onehot = (
        idx[:, None] == jnp.arange((2 * ws - 1) ** 2, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)
    bias = (onehot @ table.astype(jnp.float32)).reshape(n, n, num_heads)
    bias = bias.transpose(2, 0, 1)  # [H, N, N]
    if p > 1:
        eye = jnp.eye(p, dtype=jnp.float32)
        bias = jnp.einsum("pq,hnm->hpnqm", eye, bias).reshape(
            num_heads, p * n, p * n
        )
        cross = -100.0 * (
            1.0 - jnp.repeat(jnp.repeat(eye, n, axis=0), n, axis=1)
        )
        bias = bias + cross[None]
    return bias


def _blockdiag_mask(mask: jnp.ndarray, p: int):
    """[nW, N, N] -> [nW/p, pN, pN] block-diagonal pack expansion."""
    if p == 1:
        return mask
    nw, n, _ = mask.shape
    m = mask.reshape(nw // p, p, n, n)
    eye = jnp.eye(p, dtype=jnp.float32)
    return jnp.einsum("gpnm,pq->gpnqm", m, eye).reshape(
        nw // p, p * n, p * n
    )


class _DenseParams(nn.Module):
    """Raw nn.Dense-compatible parameters (kernel + bias) without the op —
    kernel paths consume them directly; tree paths match nn.Dense."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_dim, self.out_dim)
        )
        b = self.param("bias", nn.initializers.zeros_init(), (self.out_dim,))
        return k, b


class _LNParams(nn.Module):
    """Raw nn.LayerNorm-compatible parameters (scale + bias) without the op —
    the fused attention-half kernel consumes them directly; tree paths match
    nn.LayerNorm."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones_init(), (self.dim,))
        b = self.param("bias", nn.initializers.zeros_init(), (self.dim,))
        return s, b


class _AttnParams(nn.Module):
    """WindowAttention-compatible parameter set consumed by the
    spatial-layout attention kernel path; tree paths match WindowAttention."""

    dim: int
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self):
        wqkv, bqkv = _DenseParams(self.dim, 3 * self.dim, name="qkv")()
        wproj, bproj = _DenseParams(self.dim, self.dim, name="proj")()
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, self.num_heads),
        )
        return wqkv, bqkv, wproj, bproj, table

# profiling ablation hooks (scripts/profile_swin.py); both off in production
_PROFILE_NOSHIFT = False
_PROFILE_PACK1 = False


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    img_size: int = 224
    patch_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    layer_norm_eps: float = 1e-5
    # rematerialization granularity: 'attn' recomputes only the [*, N, N]
    # attention logits/probs in backward (cheapest recompute; enough for
    # B<=32 at 224^2); 'block' recomputes whole blocks from their inputs
    # (max memory headroom for large batch); 'none' saves everything.
    remat: str = "attn"
    # fused Pallas window attention ('auto' = on TPU when shapes qualify).
    # When active it supersedes the 'attn' remat policy: the [*, pN, pN]
    # logits/probs live only in VMEM, forward and backward.
    attn_kernel: str = "auto"

    @property
    def num_features(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)

    def num_output_tokens(self, img_size: int | None = None) -> int:
        s = img_size or self.img_size
        out = s // self.patch_size // 2 ** (len(self.depths) - 1)
        return out * out


SWIN_CONFIGS = {
    # micro config for mesh dryruns / CI: full Swin machinery (window
    # partition + shift masks + relative bias + kernel dispatch) at
    # CPU-mesh-friendly size; stage0 C=128/heads=4 matches the spatial
    # kernel's lane gate, and the final stage emits the flagship's N=49
    "swin_micro_patch4_window7_56": SwinConfig(
        img_size=56, embed_dim=128, depths=(1, 1), num_heads=(4, 8)
    ),
    "swin_tiny_patch4_window7_224": SwinConfig(
        embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)
    ),
    "swin_small_patch4_window7_224": SwinConfig(
        embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)
    ),
    "swin_base_patch4_window7_224": SwinConfig(
        embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)
    ),
    "swin_large_patch4_window7_224": SwinConfig(
        embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48)
    ),
    # timm tag aliases used by the reference config (ufg_base.yaml:7)
    "swin_large_patch4_window7_224.ms_in22k_ft_in1k": SwinConfig(
        embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48)
    ),
}


def _window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, ws*ws, C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def _window_reverse(windows: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """[B*nW, ws*ws, C] -> [B, H, W, C]."""
    nw = (h // ws) * (w // ws)
    b = windows.shape[0] // nw
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    """Static [ws*ws, ws*ws] index into the (2ws-1)^2 bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")
    )  # [2, ws, ws]
    coords_flat = coords.reshape(2, -1)
    relative = coords_flat[:, :, None] - coords_flat[:, None, :]  # [2, N, N]
    relative = relative.transpose(1, 2, 0) + (ws - 1)
    return relative[..., 0] * (2 * ws - 1) + relative[..., 1]


def _attn_mask(
    h: int, w: int, hp: int, wp: int, ws: int, shift: int
) -> np.ndarray | None:
    """Static attention mask for (padded and/or shifted) windows.

    Region ids follow the standard 3x3 shifted-window scheme on the padded
    canvas; pad positions get a sentinel id so real tokens never attend pad
    tokens.  Returns [nW, ws*ws, ws*ws] additive mask (0 / -100), or None
    when nothing needs masking.
    """
    if shift == 0 and hp == h and wp == w:
        return None
    ids = np.zeros((hp, wp), dtype=np.float32)
    if shift > 0:
        # Region labels are defined directly in the SHIFTED frame — the
        # canonical Swin/timm construction applies these slices to the
        # already-rolled map and never rolls the ids themselves.  (An
        # earlier version labeled the original frame and then rolled,
        # which displaced the region boundaries and over-masked up to
        # ~37% of valid pairs at 14x14 — caught by review, fixed with a
        # numeric check against the canonical construction.)
        cnt = 1
        for hs in (slice(0, hp - ws), slice(hp - ws, hp - shift), slice(hp - shift, hp)):
            for wsl in (
                slice(0, wp - ws),
                slice(wp - ws, wp - shift),
                slice(wp - shift, wp),
            ):
                ids[hs, wsl] = cnt
                cnt += 1
    # pad positions live in the ORIGINAL frame and travel with the roll
    pad = np.zeros((hp, wp), dtype=bool)
    pad[h:, :] = True
    pad[:, w:] = True
    if shift > 0:
        pad = np.roll(pad, (-shift, -shift), axis=(0, 1))
    ids[pad] = -1.0
    idw = (
        ids.reshape(hp // ws, ws, wp // ws, ws)
        .transpose(0, 2, 1, 3)
        .reshape(-1, ws * ws)
    )
    diff = idw[:, None, :] - idw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """Windowed MHSA with relative position bias and window PACKING.

    TPU note: a lone 49-token window pads its attention matmuls to the
    128-lane MXU tile (~7% utilization — measured as the dominant Swin cost
    on v5e).  When the per-image window count is even, two windows are
    packed into one 98-token attention problem with a block-diagonal mask:
    same math, ~4x better MXU utilization on the attention einsums.
    """

    num_heads: int
    window_size: int
    pack: int = 1  # windows fused into one attention problem
    num_windows: int = 1  # windows per image (for the kernel-path layout)
    use_kernel: str | None = None  # None | 'direct' | 'spmd'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        """x: [B*nW, N, C]; mask: [nW, N, N] or None (additive, per window)."""
        bnw, n, c = x.shape
        head_dim = c // self.num_heads
        ws = self.window_size
        p = self.pack if (bnw % self.pack == 0) else 1

        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, self.num_heads),
        )
        # Pre-combine bias + pack cross-mask (and, on the XLA path, the
        # shift/pad mask) into ONE additive tensor so the big [*, pN, pN]
        # logits see a single fused add before softmax (each separate add
        # is a full HBM sweep of the logits — measured as the dominant
        # Swin cost on v5e).
        bias = _build_bias_bd(bias_table, ws, p, self.num_heads)
        m = _blockdiag_mask(mask, p) if mask is not None else None

        if self.use_kernel:
            # Fused Pallas path: qkv in its natural [B, W, pN, 3C] layout
            # (row index = b*nW + w, pack groups p consecutive windows —
            # identical grouping to the XLA reshape below), logits VMEM-only.
            t = p * n
            wg = self.num_windows // p
            qkv4 = qkv.reshape(bnw // self.num_windows, wg, t, 3 * c)
            madd = m if m is not None else jnp.zeros((1, t, t), jnp.float32)
            fn = lambda q, bb, mm_: flash_window_attention(
                q, bb, mm_, self.num_heads
            )
            if self.use_kernel == "spmd":
                # per-shard kernel under a mesh (parallel.shard_kernels)
                from ..parallel.shard_kernels import maybe_shard_map_batch

                wrapped = maybe_shard_map_batch(
                    fn, qkv4.shape[0], (True, False, False)
                )
                fn = wrapped if wrapped is not None else fn
            out = fn(qkv4, bias, madd)
            out = out.reshape(bnw, n, c)
            return nn.Dense(c, dtype=self.dtype, name="proj")(out)

        qkv = qkv.reshape(bnw // p, p * n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        scale = head_dim**-0.5
        attn = jnp.einsum(
            "bnhd,bmhd->bhnm", q * scale, k, preferred_element_type=jnp.float32
        )  # [B*nW/p, H, p*N, p*N]
        # named for the remat policy: the [*, pN, pN] logits/probs are the
        # dominant training-memory cost (fp32, ~200 MB/block at B=64) and are
        # cheap to recompute in backward (one einsum + softmax)
        attn = checkpoint_name(attn, "attn_logits")

        if m is not None:
            groups = m.shape[0]
            combined = bias[None] + m[:, None]  # [groups, H, pN, pN]
            attn = attn.reshape(
                bnw // p // groups, groups, self.num_heads, p * n, p * n
            )
            attn = attn + combined[None]
            attn = attn.reshape(bnw // p, self.num_heads, p * n, p * n)
        else:
            attn = attn + bias[None]

        attn = jax.nn.softmax(attn, axis=-1)
        attn = checkpoint_name(attn, "attn_probs")
        attn = attn.astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(bnw, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float
    input_resolution: Tuple[int, int]
    layer_norm_eps: float = 1e-5
    remat: str = "attn"
    attn_kernel: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, H*W, C]."""
        h, w = self.input_resolution
        b, n, c = x.shape
        # Clamp window to the resolution and pad up to a multiple of it, so
        # any input size works (224 divides evenly; e.g. 448 -> 112 needs
        # window-7 padding at no stage; 64 -> 16 pads to 21).  Shift is
        # disabled when a single window covers the whole map.
        ws = min(self.window_size, h, w)
        shift = self.shift_size if (self.shift_size > 0 and min(h, w) > ws) else 0
        if _PROFILE_NOSHIFT:
            shift = 0
        if shift >= ws:
            shift = ws // 2
        hp = -(-h // ws) * ws
        wp = -(-w // ws) * ws

        mask_np = _attn_mask(h, w, hp, wp, ws, shift)
        mask = jnp.asarray(mask_np) if mask_np is not None else None
        num_windows = (hp // ws) * (wp // ws)
        pack = 2 if num_windows % 2 == 0 else 1
        if _PROFILE_PACK1:
            pack = 1
        # full row of windows per grid cell: the qkv block's width tile must
        # equal Wp (Mosaic block-shape rule — see
        # spatial_window_attention_available); attention matmuls inside the
        # kernel run per mm-window group (packed-kernel problem size)
        spatial_pack = wp // ws
        spatial_mm = _spatial_mm_pack(spatial_pack)
        # head-PADDED dispatch (round 4): widths where C % 128 != 0 (e.g.
        # swin_large stage0, C=192, H=6, d=32) widen each head slot to
        # ``pad_d`` lanes so the kernel's lane rules hold — q/k/v pad lanes
        # are ZERO (padded weights), so logits and outputs are exact; the
        # true d^-1/2 scale is passed explicitly.  Costs a 2x-wider qkv
        # tensor; replaces the XLA path's [*, T, T] logit HBM sweeps.
        d_head = c // self.num_heads
        cp = c
        if c % 128 != 0:
            for dp in (64, 128):
                if dp >= d_head and (self.num_heads * dp) % 128 == 0:
                    cp = self.num_heads * dp
                    break
        use_fused = _use_fused_half(
            self.attn_kernel, hp, wp, ws, c, self.num_heads, spatial_pack,
            spatial_mm, batch=b,
        )
        # blocks the fused mode does not support dispatch like 'auto'
        eff_mode = "auto" if self.attn_kernel == "fused_half" else self.attn_kernel
        use_spatial = None if use_fused else _use_spatial_kernel(
            eff_mode, hp, wp, ws, cp, self.num_heads, spatial_pack,
            spatial_mm, batch=b,
        )

        if use_fused:
            # Fused attention-half kernel: LN1 + qkv + attention + proj +
            # residual in ONE VMEM pass (ops/pallas/attn_half.py) — at
            # C<=256 the block is HBM-sweep-bound and this removes the LN
            # materialization, the qkv tensor round trip, and the proj/
            # residual sweeps.  Only pad/roll remain XLA data movement.
            # Parameter tree matches the other paths (norm1/{scale,bias},
            # attn/{qkv,proj,relative_position_bias_table}).
            lng, lnb = _LNParams(c, name="norm1")()
            wqkv, bqkv, wproj, bproj, table = _AttnParams(
                c, self.num_heads, ws, name="attn"
            )()
            dt = self.dtype
            xm = x.reshape(b, h, w, c).astype(dt)
            if hp != h or wp != w:
                xm = jnp.pad(xm, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
            if shift > 0:
                xm = jnp.roll(xm, shift=(-shift, -shift), axis=(1, 2))
            t = spatial_mm * ws * ws
            bias_bd = _build_bias_bd(table, ws, spatial_mm, self.num_heads)
            madd = (
                _blockdiag_mask(mask, spatial_mm)
                if mask is not None
                else jnp.zeros((1, t, t), jnp.float32)
            )
            fn = lambda xx, lg, lb, wq, bq, wpr, bpr, bb, mm_: (
                fused_attn_half_spatial(
                    xx, lg, lb, wq, bq, wpr, bpr, bb, mm_,
                    self.num_heads, ws, spatial_pack, spatial_mm,
                    self.layer_norm_eps,
                )
            )
            if use_fused == "spmd":
                from ..parallel.shard_kernels import maybe_shard_map_batch

                wrapped = maybe_shard_map_batch(
                    fn, b,
                    (True, False, False, False, False, False, False, False,
                     False),
                )
                fn = wrapped if wrapped is not None else fn
            ym = fn(
                xm, lng, lnb, wqkv.astype(dt), bqkv.astype(dt),
                wproj.astype(dt), bproj.astype(dt), bias_bd, madd,
            )
            if shift > 0:
                ym = jnp.roll(ym, shift=(shift, shift), axis=(1, 2))
            if hp != h or wp != w:
                ym = ym[:, :h, :w]
            x = ym.reshape(b, n, c)  # residual already applied in-kernel
        elif use_spatial:
            # Spatial-layout kernel: LN1 + qkv + proj stay XLA (they fuse
            # into adjacent ops); the window partition AND reverse transposes
            # are absorbed by the kernel's block DMA, saving 4 HBM sweeps of
            # the activation per block vs the packed-layout path.  Parameter
            # tree matches WindowAttention exactly (attn/{qkv,proj,
            # relative_position_bias_table}).
            shortcut = x
            xn = nn.LayerNorm(
                epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm1"
            )(x)
            wqkv, bqkv, wproj, bproj, table = _AttnParams(
                c, self.num_heads, ws, name="attn"
            )()
            if cp != c:
                # head-padded weights: each head's d lanes sit in a dp-wide
                # zero slot; logits/outputs are exact (zero q/k/v pads), the
                # true scale goes via the kernel's explicit override
                hh, dd, dp = self.num_heads, d_head, cp // self.num_heads
                wqkv = jnp.pad(
                    wqkv.reshape(c, 3, hh, dd),
                    ((0, 0), (0, 0), (0, 0), (0, dp - dd)),
                ).reshape(c, 3 * cp)
                bqkv = jnp.pad(
                    bqkv.reshape(3, hh, dd), ((0, 0), (0, 0), (0, dp - dd))
                ).reshape(3 * cp)
                wproj = jnp.pad(
                    wproj.reshape(hh, dd, c), ((0, 0), (0, dp - dd), (0, 0))
                ).reshape(cp, c)
            dt = self.dtype
            xm = xn.reshape(b, h, w, c)
            if hp != h or wp != w:
                xm = jnp.pad(xm, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
            if shift > 0:
                xm = jnp.roll(xm, shift=(-shift, -shift), axis=(1, 2))
            qkv = xm.astype(dt) @ wqkv.astype(dt) + bqkv.astype(dt)
            t = spatial_mm * ws * ws
            bias_bd = _build_bias_bd(table, ws, spatial_mm, self.num_heads)
            madd = (
                _blockdiag_mask(mask, spatial_mm)
                if mask is not None
                else jnp.zeros((1, t, t), jnp.float32)
            )
            attn_fn = lambda q, bb, mm_: flash_window_attention_spatial(
                q, bb, mm_, self.num_heads, ws, spatial_pack, spatial_mm,
                d_head**-0.5,
            )
            if use_spatial == "spmd":
                from ..parallel.shard_kernels import maybe_shard_map_batch

                wrapped = maybe_shard_map_batch(attn_fn, b, (True, False, False))
                attn_fn = wrapped if wrapped is not None else attn_fn
            om = attn_fn(qkv, bias_bd, madd)
            om = om.astype(dt) @ wproj.astype(dt) + bproj.astype(dt)
            if shift > 0:
                om = jnp.roll(om, shift=(shift, shift), axis=(1, 2))
            if hp != h or wp != w:
                om = om[:, :h, :w]
            x = shortcut + om.reshape(b, n, c)
        else:
            shortcut = x
            x = nn.LayerNorm(
                epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm1"
            )(x)
            x = x.reshape(b, h, w, c)
            if hp != h or wp != w:
                x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
            if shift > 0:
                x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))

            windows = _window_partition(x, ws)  # [B*nW, ws*ws, C]
            use_kernel = _use_attn_kernel(
                eff_mode, pack * ws * ws, c, self.num_heads, batch=b
            )
            # flash-attention-style remat: everything in the attention module
            # is saveable EXCEPT the named [*, pN, pN] logits/probs, which
            # backward recomputes — trades one extra QK einsum + softmax per
            # block for O(N^2)-per-window training memory.  The Pallas kernel
            # supersedes this: its backward recomputes logits in VMEM.
            if self.remat == "attn" and not use_kernel:
                Attn = nn.remat(
                    WindowAttention,
                    policy=jax.checkpoint_policies.save_anything_except_these_names(
                        "attn_logits", "attn_probs"
                    ),
                )
            else:
                Attn = WindowAttention
            attn_out = Attn(
                self.num_heads,
                ws,
                pack=pack,
                num_windows=num_windows,
                use_kernel=use_kernel,
                dtype=self.dtype,
                name="attn",
            )(windows, mask)
            x = _window_reverse(attn_out, ws, hp, wp)

            if shift > 0:
                x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
            if hp != h or wp != w:
                x = x[:, :h, :w]

            x = shortcut + x.reshape(b, n, c)

        y = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    """Downsample 2x: [B, H*W, C] -> [B, H/2*W/2, 2C]."""

    input_resolution: Tuple[int, int]
    layer_norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = self.input_resolution
        b, n, c = x.shape
        x = x.reshape(b, h, w, c)
        # gather the 2x2 neighborhood (order matches the original Swin impl:
        # x0=(0::2,0::2), x1=(1::2,0::2), x2=(0::2,1::2), x3=(1::2,1::2))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1).reshape(b, n // 4, 4 * c)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype, name="reduction")(x)


class Swin(nn.Module):
    """Swin Transformer returning final-stage tokens [B, N, D]."""

    config: SwinConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, images: jnp.ndarray, *, deterministic: bool = True
    ) -> jnp.ndarray:
        cfg = self.config
        x = nn.Conv(
            cfg.embed_dim,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed_proj",
        )(images.astype(self.dtype))
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="patch_embed_norm"
        )(x)
        if cfg.drop_rate > 0:
            x = nn.Dropout(cfg.drop_rate)(x, deterministic=deterministic)

        # 'block' remat saves only each block's input and recomputes the
        # whole block in backward — needed at large batch where even the
        # attn-only policy's transient recompute temps exceed HBM
        BlockCls = nn.remat(SwinBlock) if cfg.remat == "block" else SwinBlock
        res = (h, w)
        for stage, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
            for blk in range(depth):
                shift = 0 if blk % 2 == 0 else cfg.window_size // 2
                x = BlockCls(
                    num_heads=heads,
                    window_size=cfg.window_size,
                    shift_size=shift,
                    mlp_ratio=cfg.mlp_ratio,
                    input_resolution=res,
                    layer_norm_eps=cfg.layer_norm_eps,
                    remat="none" if cfg.remat == "block" else cfg.remat,
                    attn_kernel=cfg.attn_kernel,
                    dtype=self.dtype,
                    name=f"stage{stage}_block{blk}",
                )(x)
            if stage < len(cfg.depths) - 1:
                x = PatchMerging(
                    res,
                    layer_norm_eps=cfg.layer_norm_eps,
                    dtype=self.dtype,
                    name=f"stage{stage}_downsample",
                )(x)
                res = (res[0] // 2, res[1] // 2)

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="norm")(x)
        return x  # [B, N, D]
