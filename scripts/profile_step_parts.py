#!/usr/bin/env python
"""Cheap marginal-cost probes for the non-backbone step sections.

Times three standalone jitted programs (fast compiles, unlike the ablated
full-step method in profile_sections.py):

  aug        — dual_view_train_batch at the bench batch
  optimizer  — apply_gradients on flagship-shaped params with unit grads
  moment     — GPF + MomentHead fwd+bwd on [2B, 49, 1024] tokens

Run: PYTHONPATH=.:/root/.axon_site python scripts/profile_step_parts.py --batch 32
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def timed(fn, *fargs, iters=20):
    import jax.numpy as jnp

    def fence(out):
        leaf = out
        while isinstance(leaf, (tuple, list, dict)):
            leaf = (
                next(iter(leaf.values())) if isinstance(leaf, dict) else leaf[0]
            )
        float(jnp.sum(leaf).astype(jnp.float32))

    fence(fn(*fargs))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*fargs)
    fence(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32)
    args = parser.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(__import__("pathlib").Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import jax.numpy as jnp

    from ego_moment_cle_vit_tpu.data import AugmentConfig, dual_view_train_batch

    rng = np.random.default_rng(0)
    b = args.batch

    # ---- augmentation ---------------------------------------------------
    aug_cfg = AugmentConfig(input_size=224, resize_size=256)
    images_u8 = jnp.asarray(rng.integers(0, 256, (b, 256, 256, 3), dtype=np.uint8))

    @jax.jit
    def aug(images_u8, key):
        return dual_view_train_batch(images_u8, key, aug_cfg)

    t_aug = timed(aug, images_u8, jax.random.PRNGKey(0))
    print(f"augmentation (B={b} dual view): {t_aug:7.2f} ms", flush=True)

    # ---- optimizer ------------------------------------------------------
    from ego_moment_cle_vit_tpu.models import create_model
    from ego_moment_cle_vit_tpu.train.state import create_train_state

    config = {
        "model": {
            "backbone_name": "swin_base_patch4_window7_224",
            "norm": "layer",
            "bf16": True,
            "gpf": {"degree_p": 2, "degree_q": 2, "similarity": "dot"},
            "moment": {
                "d_out": 1024,
                "use_third_order": True,
                "isqrt_iterations": 5,
                "sketch_dim": 4096,
            },
            "classifier": {"fusion_type": "add"},
        },
        "training": {
            "batch_size": b,
            "optimizer": {"lr": 3e-4},
            "scheduler": {"warmup_epochs": 0},
            "loss": {"lambda_triplet": 0.6, "lambda_align": 0.1, "margin": 0.3},
            "epochs": 1,
        },
        "data": {"input_size": 224, "resize_size": 256},
    }
    model = create_model(config, num_classes=80)
    dummy = jnp.zeros((2, 224, 224, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), dummy, dummy, jnp.zeros((2,), jnp.int32)
    )
    for factored in (True, False):
        config["training"]["optimizer"]["factored_large_leaves"] = factored
        state = create_train_state(model, variables, config, steps_per_epoch=100)

        @jax.jit
        def opt_step(state):
            grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
            return state.apply_gradients(grads=grads)

        t_opt = timed(lambda s: opt_step(s).params, state, iters=10)
        print(
            f"optimizer update (factored={factored}): {t_opt:7.2f} ms",
            flush=True,
        )

    # ---- GPF + moment head ----------------------------------------------
    from ego_moment_cle_vit_tpu.models.gpf import GraphPolynomialFusion
    from ego_moment_cle_vit_tpu.models.moment_head import MomentHead

    class Chain:
        pass

    import flax.linen as nn

    class MomentChain(nn.Module):
        @nn.compact
        def __call__(self, tokens):
            # anchor/positive halves of the fused [2B] token batch
            bb = tokens.shape[0] // 2
            g = GraphPolynomialFusion(degree_p=2, degree_q=2, similarity="dot")(
                tokens[:bb], tokens[bb:]
            )
            return MomentHead(
                d_in=tokens.shape[-1],
                d_out=1024,
                use_third_order=True,
                isqrt_iterations=5,
                sketch_dim=4096,
            )(tokens[:bb], g)

    chain = MomentChain()
    tokens = jnp.asarray(
        rng.standard_normal((2 * b, 49, 1024)), jnp.bfloat16
    )
    cvars = chain.init(jax.random.PRNGKey(0), tokens[:4])

    @jax.jit
    def moment_fwdbwd(v, t):
        def loss(tt):
            return jnp.sum(chain.apply(v, tt).astype(jnp.float32))

        l, g = jax.value_and_grad(loss)(t)
        return l + jnp.sum(g).astype(jnp.float32)

    t_m = timed(moment_fwdbwd, cvars, tokens, iters=10)
    print(f"GPF+moment fwd+bwd (2B={2*b} tokens): {t_m:7.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
