"""Classifier heads fusing global (CLS) features with moment features.

Capability parity with /root/reference/src/models/classifier_head.py:
``ClassifierHead`` (:14-152, fusion types concat/add/bilinear + 2-layer MLP),
``MultiScaleClassifierHead`` (:155-241) and ``AdaptiveClassifierHead``
(:244-311).

Same norm-layer policy as the moment head: norm='batch' gives reference
BatchNorm1d parity, default 'layer' is batch-size-independent and avoids
cross-device syncs under data parallelism.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class _Norm(nn.Module):
    kind: str = "layer"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, use_running_average: bool = True):
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=use_running_average,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.axis_name,
                dtype=jnp.float32,
            )(x)
        if self.kind == "layer":
            return nn.LayerNorm(dtype=jnp.float32)(x)
        return x


class ClassifierHead(nn.Module):
    """Fuse [B, d_cls] global + [B, d_moment] moment features -> logits.

    fusion_type:
      'concat'   — concatenation (reference :50-51, :116-118)
      'add'      — projections to d_moment then elementwise add when dims
                   differ (:52-59, :120-127)
      'bilinear' — low-level bilinear form x^T W y + b (:60-62, :71-72,
                   :129-131; torch nn.Bilinear semantics)
    MLP: Linear(hidden) -> Norm -> GELU -> Drop -> Linear(hidden/2) -> Norm
    -> GELU -> Drop -> Linear(num_classes)  (:75-103).
    """

    d_cls: int
    d_moment: int
    num_classes: int
    hidden_dim: Optional[int] = None
    dropout: float = 0.1
    fusion_type: str = "concat"
    norm: str = "layer"
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    def _fusion_dim(self) -> int:
        if self.fusion_type == "concat":
            return self.d_cls + self.d_moment
        if self.fusion_type == "add":
            return self.d_moment if self.d_cls != self.d_moment else self.d_cls
        if self.fusion_type == "bilinear":
            return self.d_cls * self.d_moment
        raise ValueError(f"Unknown fusion type: {self.fusion_type}")

    def _hidden(self) -> int:
        if self.hidden_dim is not None:
            return self.hidden_dim
        if self.fusion_type == "bilinear":
            # the reference's auto formula (fusion_dim // 2) would make the
            # bilinear kernel [d_cls*d_moment/2, d_cls, d_moment] — ~0.5 PB
            # at flagship dims; use a sane auto size instead (documented
            # divergence: the reference OOMs here)
            return max((self.d_cls + self.d_moment) // 2, 256)
        # auto: max(fusion_dim // 2, 256) (reference :67-68)
        return max(self._fusion_dim() // 2, 256)

    @nn.compact
    def __call__(
        self,
        cls_features: jnp.ndarray,
        moment_features: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        hidden = self._hidden()

        if self.fusion_type == "concat":
            fused = jnp.concatenate([cls_features, moment_features], axis=-1)
        elif self.fusion_type == "add":
            if self.d_cls != self.d_moment:
                c = nn.Dense(self.d_moment, dtype=self.dtype, name="cls_proj")(
                    cls_features
                )
                m = nn.Dense(self.d_moment, dtype=self.dtype, name="moment_proj")(
                    moment_features
                )
                fused = c + m
            else:
                fused = cls_features + moment_features
        elif self.fusion_type == "bilinear":
            # x^T W y + b, W: [hidden, d_cls, d_moment] (torch nn.Bilinear)
            w = self.param(
                "bilinear_kernel",
                nn.initializers.lecun_normal(batch_axis=(0,)),
                (hidden, self.d_cls, self.d_moment),
            )
            b = self.param("bilinear_bias", nn.initializers.zeros, (hidden,))
            fused = (
                jnp.einsum(
                    "bc,hcm,bm->bh",
                    cls_features,
                    w.astype(self.dtype),
                    moment_features,
                    preferred_element_type=jnp.float32,
                ).astype(self.dtype)
                + b.astype(self.dtype)
            )
        else:
            raise ValueError(f"Unknown fusion type: {self.fusion_type}")

        x = nn.Dense(hidden, dtype=self.dtype, name="fc1")(fused)
        x = _Norm(self.norm, self.axis_name, name="norm1")(
            x, use_running_average=deterministic
        )
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)

        x = nn.Dense(hidden // 2, dtype=self.dtype, name="fc2")(x)
        x = _Norm(self.norm, self.axis_name, name="norm2")(
            x, use_running_average=deterministic
        )
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)

        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc_out")(x)


class MultiScaleClassifierHead(nn.Module):
    """Multi-scale projections + per-scale MLPs + attention over scale logits
    (reference classifier_head.py:155-241)."""

    d_cls: int
    d_moment: int
    num_classes: int
    num_scales: int = 3
    dropout: float = 0.1
    norm: str = "layer"
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        cls_features: jnp.ndarray,
        moment_features: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        scale_logits = []
        for i in range(self.num_scales):
            c = nn.Dense(self.d_cls // (2**i), dtype=self.dtype, name=f"cls_proj_{i}")(
                cls_features
            )
            m = nn.Dense(
                self.d_moment // (2**i), dtype=self.dtype, name=f"moment_proj_{i}"
            )(moment_features)
            x = jnp.concatenate([c, m], axis=-1)
            dim = x.shape[-1]
            x = nn.Dense(dim // 2, dtype=self.dtype, name=f"scale_fc_{i}")(x)
            x = _Norm(self.norm, self.axis_name, name=f"scale_norm_{i}")(
                x, use_running_average=deterministic
            )
            x = nn.gelu(x, approximate=False)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            scale_logits.append(
                nn.Dense(self.num_classes, dtype=self.dtype, name=f"scale_out_{i}")(x)
            )

        stacked = jnp.stack(scale_logits, axis=1)  # [B, S, C]
        attended = nn.MultiHeadDotProductAttention(
            num_heads=1, dtype=self.dtype, name="scale_attention"
        )(stacked, stacked)
        return jnp.mean(attended, axis=1)


class AdaptiveClassifierHead(nn.Module):
    """Squeeze-and-excitation gated fusion + 3-layer MLP
    (reference classifier_head.py:244-311)."""

    d_cls: int
    d_moment: int
    num_classes: int
    reduction_ratio: int = 16
    dropout: float = 0.1
    norm: str = "layer"
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        cls_features: jnp.ndarray,
        moment_features: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        fused = jnp.concatenate([cls_features, moment_features], axis=-1)
        fusion_dim = fused.shape[-1]

        # SE gating
        g = nn.Dense(
            fusion_dim // self.reduction_ratio, dtype=self.dtype, name="se_fc1"
        )(fused)
        g = nn.relu(g)
        g = nn.Dense(fusion_dim, dtype=self.dtype, name="se_fc2")(g)
        g = nn.sigmoid(g)
        weighted = fused * g

        x = nn.Dense(fusion_dim // 2, dtype=self.dtype, name="fc1")(weighted)
        x = _Norm(self.norm, self.axis_name, name="norm1")(
            x, use_running_average=deterministic
        )
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)

        x = nn.Dense(fusion_dim // 4, dtype=self.dtype, name="fc2")(x)
        x = _Norm(self.norm, self.axis_name, name="norm2")(
            x, use_running_average=deterministic
        )
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)

        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc_out")(x)
