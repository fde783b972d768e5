#!/usr/bin/env python
"""Inference CLI — single-view serving path.

Loads a checkpoint and classifies images (files or a dataset split) using
the specialized single-pass inference graph (one backbone pass, R_p := R_a —
provably identical to the dual forward; SURVEY.md §3.5.  The reference has
no serving entry point; its ``model.inference`` runs the full dual pass,
ego_moment_clevit.py:318-331).

Usage:
  python predict.py --config configs/ufg_base.yaml --checkpoint CKPT \
      --images img1.jpg img2.jpg [--topk 5]
  python predict.py --config ... --checkpoint ... --dataset-split test --limit 32
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="EGO-Moment-CLE-ViT inference")
    parser.add_argument("--config", default="configs/ufg_base.yaml")
    parser.add_argument("--checkpoint", required=False, default=None)
    parser.add_argument("--images", nargs="*", default=None, help="image files")
    parser.add_argument("--dataset-split", default=None, help="classify a split")
    parser.add_argument("--limit", type=int, default=16)
    parser.add_argument("--topk", type=int, default=5)
    parser.add_argument("--device", default=None, choices=["tpu", "cpu", "axon"])
    args = parser.parse_args(argv)

    from ego_moment_cle_vit_tpu.utils.ops import apply_device_override

    apply_device_override(args.device)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ego_moment_cle_vit_tpu.utils import load_config
    from ego_moment_cle_vit_tpu.models import create_model
    from ego_moment_cle_vit_tpu.train.state import restore_checkpoint
    from ego_moment_cle_vit_tpu.train.trainer import _augment_config, _make_dataset
    from ego_moment_cle_vit_tpu.data.augment import center_crop, normalize

    config = load_config(args.config)
    aug_cfg = _augment_config(config)

    # resolve classes + model
    num_classes = None
    class_names = None
    if args.checkpoint:
        bundle = restore_checkpoint(args.checkpoint)
        ckpt_cfg = bundle.get("config") or {}
        for key, val in ckpt_cfg.get("model", {}).items():
            config.setdefault("model", {}).setdefault(key, val)
        num_classes = ckpt_cfg.get("model", {}).get("num_classes")
    if num_classes is None:
        ds = _make_dataset(config, "train")
        class_names = ds.classes
        num_classes = len(class_names)

    model = create_model(config, num_classes)
    if args.checkpoint:
        variables = {"params": bundle["params"]}
        if bundle.get("batch_stats") is not None:
            variables["batch_stats"] = bundle["batch_stats"]
        if bundle.get("constants") is not None:
            variables["constants"] = bundle["constants"]
    else:
        print("note: no --checkpoint given; using random weights (smoke mode)")
        size = aug_cfg.input_size
        dummy = jnp.zeros((1, size, size, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dummy)

    # params as a jit ARGUMENT (closed-over params lower as HLO literals:
    # ~3 GB of program text at flagship size — pathological on the TPU
    # remote-compile path)
    @jax.jit
    def _infer(variables, images_u8):
        imgs = images_u8.astype(jnp.float32) / 255.0
        imgs = jax.vmap(lambda i: center_crop(i, aug_cfg.input_size))(imgs)
        imgs = normalize(imgs, aug_cfg)
        return model.apply(variables, imgs, method=model.inference)

    def infer(images_u8):
        return _infer(variables, images_u8)

    # gather inputs
    batches = []
    names = []
    if args.images:
        from PIL import Image

        arrs = []
        for path in args.images:
            img = Image.open(path).convert("RGB").resize(
                (aug_cfg.resize_size, aug_cfg.resize_size)
            )
            arrs.append(np.asarray(img, np.uint8))
            names.append(path)
        batches.append(np.stack(arrs))
    elif args.dataset_split:
        ds = _make_dataset(config, args.dataset_split)
        class_names = ds.classes
        take = min(args.limit, len(ds))
        samples = [ds[i] for i in range(take)]  # one decode per sample
        arrs = [img for img, _ in samples]
        names = [
            f"{args.dataset_split}[{i}] (true={lbl})"
            for i, (_, lbl) in enumerate(samples)
        ]
        batches.append(np.stack(arrs))
    else:
        print("error: pass --images or --dataset-split")
        return 1

    for batch in batches:
        logits = np.asarray(infer(jnp.asarray(batch)))
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        topk = np.argsort(-probs, axis=-1)[:, : args.topk]
        for name, idxs, p in zip(names, topk, probs):
            labels = [
                class_names[i] if class_names else str(i) for i in idxs
            ]
            pretty = ", ".join(
                f"{l} ({p[i]:.3f})" for l, i in zip(labels, idxs)
            )
            print(f"{name}: {pretty}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
