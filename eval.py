#!/usr/bin/env python
"""Evaluation CLI.

Same surface as the reference (/root/reference/eval.py:443-448):
``python eval.py --config configs/ufg_base.yaml --checkpoint PATH``
— except this one actually runs (the reference's eval.py has broken imports
and collate handling; SURVEY.md §3.2 / ledger #3).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Evaluate EGO-Moment-CLE-ViT (TPU)")
    parser.add_argument("--config", default="configs/ufg_base.yaml")
    parser.add_argument("--checkpoint", default=None, help="checkpoint dir/path")
    parser.add_argument("--no-viz", action="store_true")
    parser.add_argument("--no-ablation", action="store_true")
    parser.add_argument("--dataset", default=None)
    parser.add_argument(
        "--device", default=None, choices=["tpu", "cpu", "axon"]
    )
    args = parser.parse_args(argv)

    from ego_moment_cle_vit_tpu.utils.ops import apply_device_override

    apply_device_override(args.device)

    from ego_moment_cle_vit_tpu.utils import load_config, merge_overrides
    from ego_moment_cle_vit_tpu.train import Evaluator

    config = merge_overrides(load_config(args.config), dataset=args.dataset)
    evaluator = Evaluator(config, args.checkpoint)
    evaluator.evaluate(
        visualize=not args.no_viz, ablation=not args.no_ablation
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
