"""Utilities: config loading, seeding, model introspection, visualization."""

from .config import load_config, save_config, merge_overrides
from .ops import set_seed, count_parameters, get_model_info, print_model_info

__all__ = [
    "load_config",
    "save_config",
    "merge_overrides",
    "set_seed",
    "count_parameters",
    "get_model_info",
    "print_model_info",
]
