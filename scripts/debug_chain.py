#!/usr/bin/env python
"""Minimal GPF -> MomentHead -> full-model chain with tiny dims — the
quick repro harness (capability parity with the reference's debug_test.py).

Run: PYTHONPATH=.:/root/.axon_site python scripts/debug_chain.py [--device cpu]
"""

from __future__ import annotations

import argparse


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--device", default=None, choices=["tpu", "cpu", "axon"])
    args = parser.parse_args()
    import jax

    if args.device:
        jax.config.update(
            "jax_platforms", "axon" if args.device == "tpu" else args.device
        )

    import numpy as np
    import jax.numpy as jnp

    from ego_moment_cle_vit_tpu.models import (
        EGOMomentCLEViT,
        GraphPolynomialFusion,
        MomentHead,
    )

    rng = np.random.default_rng(0)
    b, n, d = 2, 16, 24
    tokens = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))

    print("1) GPF...")
    gpf = GraphPolynomialFusion(degree_p=1, degree_q=1)
    gv = gpf.init(jax.random.PRNGKey(0), tokens, tokens)
    graph = gpf.apply(gv, tokens, tokens)
    print(f"   graph {graph.shape}, range [{float(graph.min()):.3f}, {float(graph.max()):.3f}]")

    print("2) MomentHead...")
    head = MomentHead(d_in=d, d_out=32, isqrt_iterations=2)
    hv = head.init(jax.random.PRNGKey(0), tokens, graph)
    moments = head.apply(hv, tokens, graph)
    print(f"   moments {moments.shape}, finite={bool(jnp.all(jnp.isfinite(moments)))}")

    print("3) full model fwd+bwd...")
    model = EGOMomentCLEViT(
        num_classes=5,
        backbone_name="vit_tiny_patch16_224",
        img_size=32,
        moment_d_out=32,
        use_third_order=False,
        isqrt_iterations=2,
        classifier_hidden=16,
    )
    imgs = jnp.asarray(rng.standard_normal((b, 32, 32, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, (b,)))
    mv = model.init(jax.random.PRNGKey(0), imgs, imgs, labels)
    grads = jax.grad(
        lambda p: model.apply({**mv, "params": p}, imgs, imgs, labels)["loss"]
    )(mv["params"])
    gnorm = sum(float(jnp.sum(g.astype(jnp.float32) ** 2)) for g in jax.tree_util.tree_leaves(grads)) ** 0.5
    print(f"   grad norm {gnorm:.4f}")
    print("chain OK")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
