#!/usr/bin/env python
"""End-to-end orchestrator.

Capability parity with /root/reference/setup_and_run.py: dependency check ->
dataset availability/download -> derived quick-start config generation ->
training subprocess -> optional evaluation on the best checkpoint ->
results summary.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent


def check_dependencies() -> bool:
    print("=== Checking dependencies ===")
    ok = True
    for mod in ("jax", "flax", "optax", "orbax.checkpoint", "yaml", "numpy"):
        try:
            __import__(mod)
            print(f"  [ok] {mod}")
        except ImportError:
            print(f"  [MISSING] {mod}")
            ok = False
    return ok


def ensure_dataset(name: str, root: str) -> bool:
    if name == "synthetic":
        print("  synthetic dataset: nothing to download")
        return True
    print(f"=== Ensuring dataset {name} ===")
    rc = subprocess.call(
        [sys.executable, str(HERE / "download_dataset.py"), "--dataset", name,
         "--root", root],
    )
    return rc == 0


def generate_quickstart_config(
    dataset: str, epochs: int, batch_size: int, out_path: Path,
    root: str = "./data",
) -> Path:
    """Derive a reduced config from ufg_base.yaml (reference
    setup_and_run.py:126-163 generates a quick-start YAML the same way)."""
    from ego_moment_cle_vit_tpu.utils import load_config, save_config

    cfg = load_config(str(HERE / "configs" / "ufg_base.yaml"))
    cfg["dataset"]["name"] = dataset
    cfg["dataset"]["root"] = root  # the dir --root downloaded into
    cfg["training"]["epochs"] = epochs
    cfg["training"]["batch_size"] = batch_size
    cfg["training"]["save_frequency"] = max(1, epochs // 2)
    cfg["model"]["backbone_name"] = "swin_tiny_patch4_window7_224"
    cfg["model"]["moment"]["d_out"] = 512
    cfg["model"]["moment"]["sketch_dim"] = 2048
    cfg["experiment"]["name"] = f"quickstart_{dataset}"
    save_config(cfg, str(out_path))
    print(f"  wrote {out_path}")
    return out_path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Set up and run a quick training")
    parser.add_argument("--dataset", default="cotton80")
    parser.add_argument("--root", default="./data")
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--skip-eval", action="store_true")
    parser.add_argument("--device", default=None, choices=["tpu", "cpu", "axon"])
    args = parser.parse_args(argv)
    # resolve --root against the LAUNCH cwd once: the download subprocess
    # inherits our cwd but train/eval run with cwd=HERE, so a relative root
    # would point the generated config at HERE/<root> while the data landed
    # in $PWD/<root>
    args.root = str(Path(args.root).resolve())

    if not check_dependencies():
        return 1
    if not ensure_dataset(args.dataset, args.root):
        print("dataset setup failed")
        return 1

    cfg_path = generate_quickstart_config(
        args.dataset, args.epochs, args.batch_size,
        HERE / "configs" / "quickstart.yaml", root=args.root,
    )

    print("=== Training ===")
    train_cmd = [sys.executable, str(HERE / "train.py"), "--config", str(cfg_path)]
    if args.device:
        train_cmd += ["--device", args.device]
    # anchor the subprocess at the repo: the config's relative save/output
    # dirs (./checkpoints, ./outputs) must line up with the HERE-anchored
    # paths the eval/summary steps read below
    if subprocess.call(train_cmd, cwd=HERE) != 0:
        print("training failed")
        return 1

    if not args.skip_eval:
        print("=== Evaluation ===")
        ckpt = HERE / "checkpoints" / "best_model"
        eval_cmd = [
            sys.executable,
            str(HERE / "eval.py"),
            "--config",
            str(cfg_path),
            "--checkpoint",
            str(ckpt),
        ]
        if args.device:
            eval_cmd += ["--device", args.device]
        if subprocess.call(eval_cmd, cwd=HERE) != 0:
            print("evaluation failed")
            return 1
        results = HERE / "outputs" / "evaluation" / "results.json"
        if results.exists():
            payload = json.loads(results.read_text())
            print("=== Summary ===")
            print(json.dumps(payload.get("metrics", {}), indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
