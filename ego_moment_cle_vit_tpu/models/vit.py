"""Vision Transformer backbone (CLS-token family) in Flax.

TPU-native stand-in for the reference's timm ViT/DeiT backbones
(/root/reference/src/models/cle_vit_backbone.py:170-269 wraps
``timm.create_model``; the CLS-token path at :232-236 splits token 0 as the
global feature and the rest as patch tokens).  This module implements the
standard pre-LN ViT so that:

* ``forward_features`` returns the full [B, 1+N, D] token sequence (CLS
  first), matching timm's ``forward_features`` contract for CLS-token ViTs;
* timm checkpoints (vit_*/deit_*) can be ported weight-for-weight by
  ``utils/port_weights.py``.

Design notes (TPU):
* All shapes static; attention is one fused einsum chain on the MXU.
* ``dtype`` controls activation precision (bf16 for speed); parameters and
  LayerNorm statistics stay fp32.
* No data-dependent control flow; dropout handled via deterministic flag.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    layer_norm_eps: float = 1e-6
    remat: str = "attn"  # 'none' | 'attn' | 'block' (see swin.SwinConfig)
    attn_kernel: str = "auto"  # fused Pallas attention ('auto' = TPU + shapes ok)

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2


# Named configs mirroring the timm model names the reference uses
# (test_implementation.py uses vit_tiny_patch16_224; BASELINE.json configs[0]
# names DeiT-small).
VIT_CONFIGS = {
    # micro config for committed golden-logit fixtures and fast tests: small
    # enough that a full-model checkpoint fits in the repo (~1 MB)
    "vit_micro_patch16_64": ViTConfig(
        img_size=64, embed_dim=64, depth=2, num_heads=2
    ),
    "vit_tiny_patch16_224": ViTConfig(embed_dim=192, depth=12, num_heads=3),
    "vit_small_patch16_224": ViTConfig(embed_dim=384, depth=12, num_heads=6),
    "deit_tiny_patch16_224": ViTConfig(embed_dim=192, depth=12, num_heads=3),
    "deit_small_patch16_224": ViTConfig(embed_dim=384, depth=12, num_heads=6),
    "vit_base_patch16_224": ViTConfig(embed_dim=768, depth=12, num_heads=12),
    "deit_base_patch16_224": ViTConfig(embed_dim=768, depth=12, num_heads=12),
    "vit_large_patch16_224": ViTConfig(embed_dim=1024, depth=24, num_heads=16),
}


class PatchEmbed(nn.Module):
    """Non-overlapping conv patch embedding: [B,H,W,3] -> [B,N,D]."""

    patch_size: int
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="proj",
        )(x)
        b, h, w, d = x.shape
        return x.reshape(b, h * w, d)


def _resolve_attn_path(
    mode: str, t: int, c: int, num_heads: int, batch: int | None = None
) -> str:
    """Pick the ViT attention implementation: 'window' (the fused
    whole-[T,T] kernel, T <= ~200), 'tiled' (q-tiled flash for long
    sequences, e.g. T=785 at 448 inputs), or 'none' (XLA fallback).

    Same dispatch rules as swin._use_attn_kernel: 'auto' engages kernels on
    a single-device TPU process, or — under an SPMD-enabled mesh
    (parallel.shard_kernels) — via the per-shard shard_map wrap applied at
    the Attention call site; 'on' forces whichever kernel supports the
    shape and raises when neither does.
    """
    from ..ops.pallas.flash_attention import flash_attention_tiled_available
    from ..ops.pallas.window_attention import window_attention_available

    from .swin import _kernel_dispatch_kind

    if mode == "off":
        return "none"
    if mode == "on":
        if window_attention_available(t, c, num_heads):
            return "window"
        if flash_attention_tiled_available(t, c, num_heads, platform="tpu"):
            return "tiled"
        raise ValueError(
            "attn_kernel='on' requested but neither attention kernel "
            f"supports this shape (T={t}, C={c}, heads={num_heads})"
        )
    if mode == "auto" and _kernel_dispatch_kind(batch, forced=False) is not None:
        if window_attention_available(t, c, num_heads):
            return "window"
        if flash_attention_tiled_available(t, c, num_heads, platform="tpu"):
            return "tiled"
    return "none"


class Attention(nn.Module):
    num_heads: int
    kernel_path: str = "none"  # 'none' | 'window' | 'tiled'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, d = x.shape
        head_dim = d // self.num_heads
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(x)
        if self.kernel_path == "tiled":
            # q-tiled flash kernel: long sequences (ViT at 448: T=785).
            # Under an SPMD-enabled mesh the call is shard_map-wrapped so
            # each device runs the kernel on its local batch block.
            from ego_moment_cle_vit_tpu.ops.pallas.flash_attention import (
                flash_attention_tiled,
            )
            from ego_moment_cle_vit_tpu.parallel.shard_kernels import (
                maybe_shard_map_batch,
            )

            fn = lambda q: flash_attention_tiled(q, self.num_heads)
            fn = maybe_shard_map_batch(fn, b, (True,)) or fn
            out = fn(qkv)
            return nn.Dense(d, dtype=self.dtype, name="proj")(out)
        if self.kernel_path == "window":
            # same fused VMEM-resident kernel as Swin (W=1, zero bias/mask):
            # the [B, H, N, N] logits never touch HBM, and its flash-style
            # custom VJP replaces the attn remat policy
            from ego_moment_cle_vit_tpu.ops.pallas.window_attention import (
                flash_window_attention,
            )
            from ego_moment_cle_vit_tpu.parallel.shard_kernels import (
                maybe_shard_map_batch,
            )

            zeros = jnp.zeros((1, n, n), jnp.float32)
            fn = lambda q, bb, mm_: flash_window_attention(
                q, bb, mm_, self.num_heads
            )
            fn = maybe_shard_map_batch(fn, b, (True, False, False)) or fn
            out = fn(qkv.reshape(b, 1, n, 3 * d), zeros, zeros).reshape(b, n, d)
            return nn.Dense(d, dtype=self.dtype, name="proj")(out)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B,N,H,hd]
        scale = head_dim**-0.5
        attn = jnp.einsum(
            "bnhd,bmhd->bhnm", q * scale, k, preferred_element_type=jnp.float32
        )
        attn = checkpoint_name(attn, "attn_logits")
        attn = jax.nn.softmax(attn, axis=-1)
        attn = checkpoint_name(attn, "attn_probs").astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, d)
        return nn.Dense(d, dtype=self.dtype, name="proj")(out)


class MlpBlock(nn.Module):
    mlp_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        x = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(d, dtype=self.dtype, name="fc2")(x)


class TransformerBlock(nn.Module):
    num_heads: int
    mlp_ratio: float
    layer_norm_eps: float = 1e-6
    remat: str = "attn"
    attn_kernel: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        y = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm1")(x)
        kernel_path = _resolve_attn_path(
            self.attn_kernel, x.shape[1], d, self.num_heads, batch=x.shape[0]
        )
        if self.remat == "attn" and kernel_path == "none":
            # remat the [B, H, N, N] logits/probs only (see swin.py)
            Attn = nn.remat(
                Attention,
                policy=jax.checkpoint_policies.save_anything_except_these_names(
                    "attn_logits", "attn_probs"
                ),
            )
        else:
            Attn = Attention
        x = x + Attn(
            self.num_heads, kernel_path=kernel_path, dtype=self.dtype, name="attn"
        )(y)
        y = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm2")(x)
        x = x + MlpBlock(int(d * self.mlp_ratio), dtype=self.dtype, name="mlp")(y)
        return x


class ViT(nn.Module):
    """CLS-token ViT returning the full token sequence.

    ``__call__`` returns [B, 1+N, D] (CLS first) after the final LayerNorm,
    matching timm's ``forward_features`` for this family.
    """

    config: ViTConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, images: jnp.ndarray, *, deterministic: bool = True
    ) -> jnp.ndarray:
        cfg = self.config
        x = PatchEmbed(cfg.patch_size, cfg.embed_dim, dtype=self.dtype, name="patch_embed")(
            images.astype(self.dtype)
        )
        b, n, d = x.shape

        cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, d)
        )
        pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02), (1, 1 + cfg.num_patches, d)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(self.dtype), (b, 1, d)), x], axis=1
        )
        x = x + pos_embed.astype(self.dtype)
        if cfg.drop_rate > 0:
            x = nn.Dropout(cfg.drop_rate)(x, deterministic=deterministic)

        BlockCls = (
            nn.remat(TransformerBlock) if cfg.remat == "block" else TransformerBlock
        )
        for i in range(cfg.depth):
            x = BlockCls(
                cfg.num_heads,
                cfg.mlp_ratio,
                cfg.layer_norm_eps,
                remat="none" if cfg.remat == "block" else cfg.remat,
                attn_kernel=cfg.attn_kernel,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x)

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="norm")(x)
        return x
