"""YAML config system, compatible with the reference's configs/ufg_base.yaml
layout (7 sections: model/training/data/dataset/experiment/evaluation/
ablation; reference train.py:542-546 loads it with yaml.safe_load and applies
CLI overrides at :563-568)."""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Dict, Optional

import yaml


def load_config(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def save_config(config: Dict[str, Any], path: str) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(config, f, sort_keys=False)


def merge_overrides(
    config: Dict[str, Any],
    *,
    batch_size: Optional[int] = None,
    lr: Optional[float] = None,
    epochs: Optional[int] = None,
    dataset: Optional[str] = None,
    backbone: Optional[str] = None,
    seed: Optional[int] = None,
) -> Dict[str, Any]:
    """Apply the CLI overrides the reference supports (train.py:563-568),
    plus a few this framework adds."""
    cfg = copy.deepcopy(config)
    if batch_size is not None:
        cfg.setdefault("training", {})["batch_size"] = batch_size
    if lr is not None:
        cfg.setdefault("training", {}).setdefault("optimizer", {})["lr"] = lr
    if epochs is not None:
        cfg.setdefault("training", {})["epochs"] = epochs
    if dataset is not None:
        cfg.setdefault("dataset", {})["name"] = dataset
    if backbone is not None:
        cfg.setdefault("model", {})["backbone_name"] = backbone
    if seed is not None:
        cfg.setdefault("experiment", {})["seed"] = seed
    return cfg
