"""EGOMomentCLEViT — the composition root.

Capability parity with /root/reference/src/models/ego_moment_clevit.py:26-331:
dual-stream backbone -> GPF -> MomentHead -> ClassifierHead, plus the
auxiliary per-view linear classifier and the 5-term loss dictionary
(3x cross-entropy + roll-negative triplet + graph-alignment MSE).

Differences by design:
* Loss assembly uses the shared ``losses`` package (single source of truth,
  ledger #8) and is fully vectorized (ledger #6).
* ``apply_single`` implements the specialized single-view inference path:
  one backbone pass and one Gram matrix instead of two (SURVEY.md §3.5 —
  provably identical outputs since anchor == positive at inference).
* ``return_features`` is a static Python flag — under ``jit`` it selects the
  traced outputs at compile time, no runtime cost.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .backbone import CLEViTDualStream
from .gpf import AdaptiveGraphPolynomialFusion, GraphPolynomialFusion
from .moment_head import MomentHead, SimplifiedMomentHead
from .classifier_head import (
    AdaptiveClassifierHead,
    ClassifierHead,
    MultiScaleClassifierHead,
)
from ..losses import roll_negative_triplet_loss, graph_alignment_mse_loss

Dtype = Any


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


class EGOMomentCLEViT(nn.Module):
    """Main model.  Call signature mirrors the reference forward
    (ego_moment_clevit.py:121-201): (anchor, positive, labels=None,
    return_features=False) -> dict of logits / losses / features."""

    num_classes: int
    backbone_name: str = "swin_base_patch4_window7_224"
    img_size: Optional[int] = None
    gpf_degree_p: int = 2
    gpf_degree_q: int = 2
    gpf_similarity: str = "cosine"
    gpf_symmetric_enforce: bool = True
    gpf_coeff_init: str = "uniform"
    # None -> static-coefficient GPF; 'global'|'spatial'|'attention' selects
    # AdaptiveGraphPolynomialFusion (reference exports it as part of the
    # public model API, src/models/__init__.py:40-63 / gpf_kernel.py:179-217;
    # BASELINE.json configs[3] names adaptive-degree GPF as a target config)
    gpf_adaptive_type: Optional[str] = None
    # 'full' (canonical MomentHead) | 'simplified' (SimplifiedMomentHead,
    # reference moment_head_simple.py:15-164)
    moment_variant: str = "full"
    moment_d_out: int = 1024
    use_third_order: bool = True
    isqrt_iterations: int = 5
    sketch_dim: int = 4096
    sketch_mode: str = "fft"
    classifier_type: str = "standard"  # 'standard'|'multiscale'|'adaptive'
    classifier_fusion: str = "concat"
    classifier_hidden: Optional[int] = None
    lambda_triplet: float = 1.0
    lambda_align: float = 0.1
    margin: float = 0.3
    dropout: float = 0.1
    norm: str = "layer"  # 'batch' for reference BatchNorm parity
    backbone_remat: str = "attn"  # 'none' | 'attn' | 'block'
    backbone_attn_kernel: str = "auto"  # 'auto' | 'on' | 'off' (Swin only)
    moment_remat: bool = False
    moment_bf16_params: bool = False  # bf16-store the vech projection
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    def setup(self):
        self.backbone = CLEViTDualStream(
            model_name=self.backbone_name,
            drop_rate=self.dropout,
            img_size=self.img_size,
            remat=self.backbone_remat,
            attn_kernel=self.backbone_attn_kernel,
            dtype=self.dtype,
        )
        backbone_dim = self.backbone.num_features

        if self.gpf_adaptive_type is not None:
            self.gpf = AdaptiveGraphPolynomialFusion(
                degree_p=self.gpf_degree_p,
                degree_q=self.gpf_degree_q,
                similarity=self.gpf_similarity,
                symmetric_enforce=self.gpf_symmetric_enforce,
                coeff_init=self.gpf_coeff_init,
                adaptive_type=self.gpf_adaptive_type,
            )
        else:
            self.gpf = GraphPolynomialFusion(
                degree_p=self.gpf_degree_p,
                degree_q=self.gpf_degree_q,
                similarity=self.gpf_similarity,
                symmetric_enforce=self.gpf_symmetric_enforce,
                coeff_init=self.gpf_coeff_init,
            )
        if self.moment_variant == "simplified":
            self.moment_head = SimplifiedMomentHead(
                d_in=backbone_dim,
                d_out=self.moment_d_out,
                use_third_order=self.use_third_order,
                isqrt_iterations=self.isqrt_iterations,
                dropout=self.dropout,
                dtype=self.dtype,
            )
        elif self.moment_variant == "full":
            self.moment_head = MomentHead(
                d_in=backbone_dim,
                d_out=self.moment_d_out,
                use_third_order=self.use_third_order,
                isqrt_iterations=self.isqrt_iterations,
                sketch_dim=self.sketch_dim,
                sketch_mode=self.sketch_mode,
                dropout=self.dropout,
                norm=self.norm,
                axis_name=self.axis_name,
                remat=self.moment_remat,
                bf16_params=self.moment_bf16_params,
                dtype=self.dtype,
            )
        else:
            raise ValueError(
                f"Unknown moment variant: {self.moment_variant!r} "
                "(expected 'full' or 'simplified')"
            )
        # classifier variant (reference exports all three heads,
        # classifier_head.py:14-311; configs[4] uses the multi-scale one)
        if self.classifier_type == "multiscale":
            self.classifier = MultiScaleClassifierHead(
                d_cls=backbone_dim,
                d_moment=self.moment_d_out,
                num_classes=self.num_classes,
                dropout=self.dropout,
                norm=self.norm,
                axis_name=self.axis_name,
                dtype=self.dtype,
            )
        elif self.classifier_type == "adaptive":
            self.classifier = AdaptiveClassifierHead(
                d_cls=backbone_dim,
                d_moment=self.moment_d_out,
                num_classes=self.num_classes,
                dropout=self.dropout,
                norm=self.norm,
                axis_name=self.axis_name,
                dtype=self.dtype,
            )
        else:
            self.classifier = ClassifierHead(
                d_cls=backbone_dim,
                d_moment=self.moment_d_out,
                num_classes=self.num_classes,
                hidden_dim=self.classifier_hidden,
                dropout=self.dropout,
                fusion_type=self.classifier_fusion,
                norm=self.norm,
                axis_name=self.axis_name,
                dtype=self.dtype,
            )
        # per-view CLE-ViT auxiliary classifier (reference :112)
        self.cls_only_classifier = nn.Dense(
            self.num_classes, dtype=self.dtype, name="cls_only_classifier"
        )

    def __call__(
        self,
        anchor: jnp.ndarray,
        positive: jnp.ndarray,
        labels: Optional[jnp.ndarray] = None,
        return_features: bool = False,
        *,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        anchor_features, positive_features = self.backbone(
            anchor, positive, deterministic=deterministic
        )
        anchor_tokens = anchor_features["patch_tokens"]
        positive_tokens = positive_features["patch_tokens"]
        anchor_global = anchor_features["global_features"]
        positive_global = positive_features["global_features"]

        fused_graph = self.gpf(anchor_tokens, positive_tokens)
        moment_features = self.moment_head(
            anchor_tokens, fused_graph, deterministic=deterministic
        )
        main_logits = self.classifier(
            anchor_global, moment_features, deterministic=deterministic
        )
        anchor_logits = self.cls_only_classifier(anchor_global)
        positive_logits = self.cls_only_classifier(positive_global)

        output: Dict[str, Any] = {
            "logits": main_logits,
            "logits_anchor": anchor_logits,
            "logits_positive": positive_logits,
        }

        if labels is not None:
            loss_dict = self._compute_losses(
                main_logits=main_logits,
                anchor_logits=anchor_logits,
                positive_logits=positive_logits,
                anchor_global=anchor_global,
                positive_global=positive_global,
                fused_graph=fused_graph,
                labels=labels,
            )
            output["loss_dict"] = loss_dict
            output["loss"] = sum(loss_dict.values())

        if return_features:
            output["features"] = {
                "anchor_tokens": anchor_tokens,
                "positive_tokens": positive_tokens,
                "anchor_global": anchor_global,
                "positive_global": positive_global,
                "fused_graph": fused_graph,
                "moment_features": moment_features,
                "gpf_coefficients": jax.nn.softplus(
                    self.gpf.variables["params"]["alpha_coeffs"]
                ),
            }
        return output

    def _compute_losses(
        self,
        main_logits,
        anchor_logits,
        positive_logits,
        anchor_global,
        positive_global,
        fused_graph,
        labels,
    ) -> Dict[str, jnp.ndarray]:
        """Reference loss assembly (ego_moment_clevit.py:203-244):
        3x CE + lambda_t * roll-negative triplet + lambda_a * alignment."""
        loss_dict = {
            "loss_main_ce": cross_entropy_loss(main_logits, labels),
            "loss_anchor_ce": cross_entropy_loss(anchor_logits, labels),
            "loss_positive_ce": cross_entropy_loss(positive_logits, labels),
        }
        # trace-time gating (like lambda_align below): a zero-weight term
        # must cost zero compute, not a multiply-by-zero subgraph
        if self.lambda_triplet > 0:
            loss_dict["loss_triplet"] = self.lambda_triplet * (
                roll_negative_triplet_loss(
                    anchor_global.astype(jnp.float32),
                    positive_global.astype(jnp.float32),
                    margin=self.margin,
                )
            )
        if self.lambda_align > 0:
            loss_dict["loss_align"] = self.lambda_align * graph_alignment_mse_loss(
                fused_graph.astype(jnp.float32), labels
            )
        return loss_dict

    def ablation_forward(
        self, anchor: jnp.ndarray, positive: jnp.ndarray, mode: str = "full"
    ) -> jnp.ndarray:
        """Checkpoint-compatible ablations (the reference's eval.py declares
        an ablation study but stubs it out, eval.py:401-411; these run for
        real on trained weights):

        'full'           — standard forward.
        'no_gpf'         — identity relation graph instead of the fused one.
        'uniform_graph'  — all-ones graph (pure unweighted moment pooling).
        'cls_only'       — bypass moments; logits from the auxiliary
                           per-view classifier.
        """
        if mode == "cls_only":
            feats = self.backbone.forward_single(anchor, deterministic=True)
            return self.cls_only_classifier(feats["global_features"])

        anchor_features, positive_features = self.backbone(
            anchor, positive, deterministic=True
        )
        tokens = anchor_features["patch_tokens"]
        global_features = anchor_features["global_features"]
        b, n, _ = tokens.shape
        if mode == "no_gpf":
            graph = jnp.broadcast_to(jnp.eye(n, dtype=tokens.dtype), (b, n, n))
        elif mode == "uniform_graph":
            graph = jnp.ones((b, n, n), tokens.dtype)
        elif mode == "full":
            graph = self.gpf(tokens, positive_features["patch_tokens"])
        else:
            raise ValueError(f"Unknown ablation mode: {mode}")
        moment_features = self.moment_head(tokens, graph, deterministic=True)
        return self.classifier(global_features, moment_features, deterministic=True)

    def inference(self, images: jnp.ndarray) -> jnp.ndarray:
        """Single-view inference: ONE backbone pass, R_p := R_a.

        Identical logits to ``__call__(images, images)`` — at inference
        anchor == positive implies equal Grams, so the dual pass is wasted
        work (reference ego_moment_clevit.py:318-331 runs it anyway)."""
        feats = self.backbone.forward_single(images, deterministic=True)
        tokens = feats["patch_tokens"]
        global_features = feats["global_features"]
        fused_graph = self.gpf(tokens, tokens)
        moment_features = self.moment_head(tokens, fused_graph, deterministic=True)
        return self.classifier(global_features, moment_features, deterministic=True)


def create_model(config: Dict[str, Any], num_classes: int) -> EGOMomentCLEViT:
    """Build the model from a config dict shaped like configs/ufg_base.yaml
    (section model.{gpf,moment,classifier}; reference train.py:267-331)."""
    mcfg = config.get("model", {})
    gpf = mcfg.get("gpf", {})
    moment = mcfg.get("moment", {})
    classifier = mcfg.get("classifier", {})
    loss = config.get("training", {}).get("loss", {})
    data = config.get("data", {})

    return EGOMomentCLEViT(
        num_classes=num_classes,
        backbone_name=mcfg.get("backbone_name", "swin_base_patch4_window7_224"),
        img_size=data.get("input_size"),
        gpf_degree_p=gpf.get("degree_p", 2),
        gpf_degree_q=gpf.get("degree_q", 2),
        gpf_similarity=gpf.get("similarity", "cosine"),
        gpf_symmetric_enforce=gpf.get("symmetric_enforce", True),
        gpf_coeff_init=gpf.get("coeff_init", "uniform"),
        gpf_adaptive_type=gpf.get("adaptive_type"),
        moment_variant=moment.get("variant", "full"),
        moment_d_out=moment.get("d_out", 1024),
        use_third_order=moment.get("use_third_order", True),
        isqrt_iterations=moment.get("isqrt_iterations", 5),
        sketch_dim=moment.get("sketch_dim", 4096),
        sketch_mode=moment.get("sketch_mode", "fft"),
        classifier_type=classifier.get("type", "standard"),
        classifier_fusion=classifier.get("fusion_type", "concat"),
        classifier_hidden=classifier.get("hidden_dim"),
        lambda_triplet=loss.get("lambda_triplet", 1.0),
        lambda_align=loss.get("lambda_align", 0.1),
        margin=loss.get("margin", 0.3),
        dropout=classifier.get("dropout", 0.1),
        norm=mcfg.get("norm", "layer"),
        backbone_remat=mcfg.get("backbone_remat", "attn"),
        backbone_attn_kernel=mcfg.get("backbone_attn_kernel", "auto"),
        moment_remat=moment.get("remat", False),
        moment_bf16_params=moment.get("bf16_params", False),
        dtype=jnp.bfloat16 if mcfg.get("bf16", False) else jnp.float32,
    )
