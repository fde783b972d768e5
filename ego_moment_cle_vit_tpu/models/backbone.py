"""CLE-ViT backbone wrapper and dual-stream module.

Capability parity with /root/reference/src/models/cle_vit_backbone.py:170-316:

* ``CLEViTBackbone`` wraps a registered vision backbone and extracts
  ``patch_tokens [B, N, D]`` + ``global_features [B, D]``.  CLS-token models
  use token 0 as global (reference :232-236); pooled-token models (Swin
  family) mean-pool the patch tokens (reference :238-248).
* ``CLEViTDualStream`` runs anchor and positive views through the *shared*
  backbone.  The reference does two sequential passes (:313-314); here the
  two views are concatenated into one [2B] batch for a single pass — with
  per-sample normalization (LayerNorm) this is numerically identical and
  doubles MXU utilization per dispatch.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .vit import ViT, ViTConfig, VIT_CONFIGS
from .swin import Swin, SwinConfig, SWIN_CONFIGS

Dtype = Any


def backbone_num_features(model_name: str) -> int:
    """Feature dim D for a registered backbone name."""
    if model_name in VIT_CONFIGS:
        return VIT_CONFIGS[model_name].embed_dim
    if model_name in SWIN_CONFIGS:
        return SWIN_CONFIGS[model_name].num_features
    raise ValueError(
        f"Unknown backbone '{model_name}'. Registered: "
        f"{sorted(VIT_CONFIGS) + sorted(SWIN_CONFIGS)}"
    )


def backbone_num_patches(model_name: str, img_size: int | None = None) -> int:
    """Number of patch tokens N the backbone emits."""
    if model_name in VIT_CONFIGS:
        cfg = VIT_CONFIGS[model_name]
        if img_size is not None and img_size != cfg.img_size:
            return (img_size // cfg.patch_size) ** 2
        return cfg.num_patches
    if model_name in SWIN_CONFIGS:
        return SWIN_CONFIGS[model_name].num_output_tokens(img_size)
    raise ValueError(f"Unknown backbone '{model_name}'")


class CLEViTBackbone(nn.Module):
    """Wraps a registered backbone; returns patch tokens + global features."""

    model_name: str = "vit_small_patch16_224"
    drop_rate: float = 0.0
    img_size: int | None = None
    remat: str = "attn"
    attn_kernel: str = "auto"  # Swin-only: fused Pallas window attention
    dtype: Dtype = jnp.float32

    def setup(self):
        import dataclasses

        if self.model_name in VIT_CONFIGS:
            cfg = VIT_CONFIGS[self.model_name]
            cfg = dataclasses.replace(
                cfg,
                img_size=self.img_size or cfg.img_size,
                drop_rate=self.drop_rate,
                remat=self.remat,
                attn_kernel=self.attn_kernel,
            )
            self.net = ViT(cfg, dtype=self.dtype, name="vit")
            self.has_cls_token = True
            self.num_features = cfg.embed_dim
        elif self.model_name in SWIN_CONFIGS:
            cfg = SWIN_CONFIGS[self.model_name]
            cfg = dataclasses.replace(
                cfg,
                img_size=self.img_size or cfg.img_size,
                drop_rate=self.drop_rate,
                remat=self.remat,
                attn_kernel=self.attn_kernel,
            )
            self.net = Swin(cfg, dtype=self.dtype, name="swin")
            self.has_cls_token = False
            self.num_features = cfg.num_features
        else:
            raise ValueError(
                f"Unknown backbone '{self.model_name}'. Registered: "
                f"{sorted(VIT_CONFIGS) + sorted(SWIN_CONFIGS)}"
            )

    def __call__(
        self, images: jnp.ndarray, *, deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        """[B, H, W, 3] -> {'patch_tokens': [B,N,D], 'global_features': [B,D]}."""
        features = self.net(images, deterministic=deterministic)
        if self.has_cls_token:
            # token 0 = CLS (global), rest = patches (reference :232-236)
            global_features = features[:, 0]
            patch_tokens = features[:, 1:]
        else:
            patch_tokens = features  # Swin module already emits [B, N, D]
            global_features = jnp.mean(patch_tokens, axis=1)
        return {
            "patch_tokens": patch_tokens,
            "global_features": global_features,
        }


class CLEViTDualStream(nn.Module):
    """Shared-weight dual-stream: anchor + positive through one backbone.

    The two views are fused into a single [2B] batch — one backbone dispatch
    instead of the reference's two sequential passes (cle_vit_backbone.py:
    313-314) — then split back.  Also exposes ``forward_single`` for the
    specialized single-view inference path (SURVEY.md §3.5).
    """

    model_name: str = "vit_small_patch16_224"
    drop_rate: float = 0.0
    img_size: int | None = None
    remat: str = "attn"
    attn_kernel: str = "auto"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.backbone = CLEViTBackbone(
            model_name=self.model_name,
            drop_rate=self.drop_rate,
            img_size=self.img_size,
            remat=self.remat,
            attn_kernel=self.attn_kernel,
            dtype=self.dtype,
        )
        self.num_features = self.backbone.num_features

    def __call__(
        self,
        anchor: jnp.ndarray,
        positive: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        b = anchor.shape[0]
        stacked = jnp.concatenate([anchor, positive], axis=0)  # [2B, H, W, 3]
        feats = self.backbone(stacked, deterministic=deterministic)
        anchor_features = {
            "patch_tokens": feats["patch_tokens"][:b],
            "global_features": feats["global_features"][:b],
        }
        positive_features = {
            "patch_tokens": feats["patch_tokens"][b:],
            "global_features": feats["global_features"][b:],
        }
        return anchor_features, positive_features

    def forward_single(
        self, images: jnp.ndarray, *, deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        """One backbone pass for inference (anchor == positive)."""
        return self.backbone(images, deterministic=deterministic)
