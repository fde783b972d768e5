#!/usr/bin/env python
"""Quick-start demo.

Capability parity with /root/reference/quick_start.py: requirement check,
architecture printout, and a forward-pass smoke demo — all runnable in
seconds with random tensors, no dataset or pretrained weights.
"""

from __future__ import annotations

import argparse
import sys


def check_requirements() -> bool:
    print("=== Requirement check ===")
    ok = True
    for mod in ("jax", "flax", "optax", "orbax.checkpoint", "numpy", "yaml"):
        try:
            __import__(mod)
            print(f"  [ok] {mod}")
        except ImportError as exc:
            print(f"  [MISSING] {mod}: {exc}")
            ok = False
    if ok:
        import jax

        print(f"  backend: {jax.default_backend()} x{len(jax.devices())}")
    return ok


def print_architecture() -> None:
    print("\n=== EGO-Moment-CLE-ViT architecture ===")
    print(
        """
  anchor img --+                          +-- global feats --+
               |-- shared backbone (2B) --|                  +-- ClassifierHead -- logits
  positive  ---+        |                 +-- patch tokens --+        |
  (masked+shuffled,     |                        |                    |
   generated ON DEVICE) |                        v                    |
                        |            GraphPolynomialFusion            |
                        |      G = sum softplus(a_pq) Ra^p . Rp^q     |
                        |                        |                    |
                        |                        v                    |
                        +----------------> MomentHead ----------------+
                             W = D^-1/2 G D^-1/2 ; M2 = Zc^T W Zc
                             iSQRT-COV (Newton-Schulz, fp32)
                             + 3rd-order FFT Tensor-Sketch
  losses: CE(main) + CE(anchor) + CE(positive)
          + lambda_t * triplet(anchor, positive, roll-negatives)
          + lambda_a * CKA graph alignment
"""
    )


def forward_demo(batch: int = 2) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ego_moment_cle_vit_tpu.models import EGOMomentCLEViT
    from ego_moment_cle_vit_tpu.utils.ops import get_model_info

    print("\n=== Forward-pass demo (vit_tiny @ 64px, random tensors) ===")
    model = EGOMomentCLEViT(
        num_classes=10,
        backbone_name="vit_tiny_patch16_224",
        img_size=64,
        moment_d_out=64,
        use_third_order=True,
        isqrt_iterations=3,
        sketch_dim=256,
        classifier_hidden=32,
    )
    rng = np.random.default_rng(0)
    anchor = jnp.asarray(rng.standard_normal((batch, 64, 64, 3)), jnp.float32)
    positive = jnp.asarray(rng.standard_normal((batch, 64, 64, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 10, (batch,)), jnp.int32)

    variables = model.init(jax.random.PRNGKey(0), anchor, positive, labels)
    info = get_model_info(variables["params"])
    print(f"  params: {info['total_parameters']:,}")

    out = model.apply(variables, anchor, positive, labels, return_features=True)
    print(f"  logits: {out['logits'].shape}")
    print("  losses:")
    for k, v in out["loss_dict"].items():
        print(f"    {k}: {float(v):.4f}")
    print(f"  total loss: {float(out['loss']):.4f}")
    feats = out["features"]
    print(f"  fused graph: {feats['fused_graph'].shape}")
    print(f"  moment features: {feats['moment_features'].shape}")
    print("\nDemo complete. Next steps:")
    print("  python download_dataset.py --dataset cotton80")
    print("  python train.py --config configs/ufg_base.yaml")
    print("  python eval.py --config configs/ufg_base.yaml --checkpoint checkpoints/best_model")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="EGO-Moment-CLE-ViT quick start")
    parser.add_argument("--device", default=None, choices=["tpu", "cpu", "axon"])
    parser.add_argument("--skip-demo", action="store_true")
    args = parser.parse_args(argv)
    from ego_moment_cle_vit_tpu.utils.ops import apply_device_override

    apply_device_override(args.device)
    if not check_requirements():
        return 1
    print_architecture()
    if not args.skip_demo:
        forward_demo()
    return 0


if __name__ == "__main__":
    sys.exit(main())
