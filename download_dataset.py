#!/usr/bin/env python
"""UFG dataset downloader CLI.

Capability parity with /root/reference/download_dataset.py:33-401:
``--list``, ``--info NAME``, ``--dataset NAME [NAME...]``, ``--all``,
``--force``, ``--no-verify``, ``--root DIR``, fuzzy-name suggestions, and
post-download verification by instantiating the dataset and loading
sample 0.  (The reference also ships an ASCII-only clone,
download_simple.py, for Windows consoles; this CLI is ASCII-only already.)
"""

from __future__ import annotations

import argparse
import difflib
import sys
from pathlib import Path


def _suggest(name: str, choices) -> str:
    close = difflib.get_close_matches(name, choices, n=3, cutoff=0.4)
    return f" Did you mean: {', '.join(close)}?" if close else ""


def cmd_list() -> int:
    from ego_moment_cle_vit_tpu.data import UFGVCDataset

    print("Available UFG datasets:")
    for name, desc in UFGVCDataset.list_available_datasets().items():
        print(f"  - {name}: {desc}")
    return 0


def cmd_info(name: str, root: str) -> int:
    from ego_moment_cle_vit_tpu.data import DATASETS, UFGVCDataset

    if name not in DATASETS:
        print(f"Unknown dataset '{name}'.{_suggest(name, DATASETS)}")
        return 1
    cfg = DATASETS[name]
    print(f"Dataset: {name}")
    print(f"  description: {cfg['description']}")
    print(f"  url: {cfg['url']}")
    print(f"  file: {cfg['filename']}")
    local = Path(root) / cfg["filename"]
    if local.exists():
        print(f"  local: {local} ({local.stat().st_size / 1e6:.1f} MB)")
        splits = UFGVCDataset.get_dataset_splits(name, root)
        print(f"  splits: {splits}")
    else:
        print("  local: not downloaded")
    return 0


def _verify(name: str, root: str) -> bool:
    """Instantiate the dataset and decode sample 0 (reference
    download_dataset.py:220-242)."""
    from ego_moment_cle_vit_tpu.data import UFGVCDataset

    try:
        splits = UFGVCDataset.get_dataset_splits(name, root)
        split = splits[0] if splits else "train"
        ds = UFGVCDataset(
            dataset_name=name, root=root, split=split, download=False
        )
        img, label = ds[0]
        print(
            f"  verify OK: {len(ds)} samples, {ds.num_classes} classes, "
            f"sample0 {getattr(img, 'shape', getattr(img, 'size', '?'))} label={label}"
        )
        return True
    except Exception as exc:
        print(f"  verify FAILED: {exc}")
        return False


def cmd_download(names, root: str, force: bool, verify: bool) -> int:
    from ego_moment_cle_vit_tpu.data import DATASETS, UFGVCDataset

    rc = 0
    for name in names:
        if name not in DATASETS:
            print(f"Unknown dataset '{name}'.{_suggest(name, DATASETS)}")
            rc = 1
            continue
        target = Path(root) / DATASETS[name]["filename"]
        if target.exists() and not force:
            print(f"{name}: already present at {target} (use --force to redo)")
        else:
            if target.exists():
                target.unlink()
            try:
                UFGVCDataset(
                    dataset_name=name, root=root, split="train", download=True
                )
            except Exception as exc:
                print(f"{name}: download failed: {exc}")
                rc = 1
                continue
        if verify and not _verify(name, root):
            rc = 1
    return rc


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Download UFG datasets")
    parser.add_argument("--list", action="store_true", help="list datasets")
    parser.add_argument("--info", metavar="NAME", help="show dataset info")
    parser.add_argument("--dataset", nargs="+", help="dataset name(s) to fetch")
    parser.add_argument("--all", action="store_true", help="fetch all datasets")
    parser.add_argument("--force", action="store_true", help="re-download")
    parser.add_argument("--no-verify", action="store_true")
    parser.add_argument("--root", default="./data")
    args = parser.parse_args(argv)

    if args.list:
        return cmd_list()
    if args.info:
        return cmd_info(args.info, args.root)

    from ego_moment_cle_vit_tpu.data import DATASETS

    names = list(DATASETS) if args.all else (args.dataset or [])
    if not names:
        parser.print_help()
        return 1
    return cmd_download(names, args.root, args.force, not args.no_verify)


if __name__ == "__main__":
    sys.exit(main())
