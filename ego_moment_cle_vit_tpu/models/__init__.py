"""Flax model modules: backbones, GPF, moment heads, classifier heads, and
the EGOMomentCLEViT composition.

Export surface mirrors the reference's model package
(/root/reference/src/models/__init__.py:40-63).
"""

from .vit import ViT, ViTConfig, VIT_CONFIGS
from .swin import Swin, SwinConfig, SWIN_CONFIGS
from .backbone import (
    CLEViTBackbone,
    CLEViTDualStream,
    backbone_num_features,
    backbone_num_patches,
)
from .gpf import GraphPolynomialFusion, AdaptiveGraphPolynomialFusion
from .moment_head import MomentHead, SimplifiedMomentHead
from .classifier_head import (
    ClassifierHead,
    MultiScaleClassifierHead,
    AdaptiveClassifierHead,
)
from .ego_moment_clevit import EGOMomentCLEViT, create_model

__all__ = [
    "ViT",
    "ViTConfig",
    "VIT_CONFIGS",
    "Swin",
    "SwinConfig",
    "SWIN_CONFIGS",
    "CLEViTBackbone",
    "CLEViTDualStream",
    "backbone_num_features",
    "backbone_num_patches",
    "GraphPolynomialFusion",
    "AdaptiveGraphPolynomialFusion",
    "MomentHead",
    "SimplifiedMomentHead",
    "ClassifierHead",
    "MultiScaleClassifierHead",
    "AdaptiveClassifierHead",
    "EGOMomentCLEViT",
    "create_model",
]
