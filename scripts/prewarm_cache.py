#!/usr/bin/env python
"""Pre-warm the persistent XLA compile cache (.jax_cache) for the flagship
train + inference programs, so first `bench.py` / serving runs don't hit the
axon remote-compile tunnel's 10-30 min cold compile (or its connection
timeout — the known Swin-Base infer first-compile failure).

AOT-compiles (lower().compile()) without executing, so it is safe to run
while nothing else holds the chip. Staged prints flush progress.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/prewarm_cache.py
Env: PREWARM_BATCHES="16,64" (train batch sizes), PREWARM_MODES="train,infer"
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import jax.numpy as jnp
    import numpy as np

    from ego_moment_cle_vit_tpu.data import (
        AugmentConfig,
        dual_view_eval_batch,
        dual_view_train_batch,
    )
    from ego_moment_cle_vit_tpu.models import create_model
    from ego_moment_cle_vit_tpu.train.state import create_train_state

    batches = [
        int(b) for b in os.environ.get("PREWARM_BATCHES", "16,64").split(",")
    ]
    modes = os.environ.get("PREWARM_MODES", "train,infer").split(",")

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
            "batch_size": batches[0],
            "optimizer": {"lr": 3e-4},
            "scheduler": {"warmup_epochs": 0},
            "loss": {"lambda_triplet": 0.6, "lambda_align": 0.1, "margin": 0.3},
            "epochs": 1,
        },
        "data": {"input_size": 224, "resize_size": 256},
    }
    aug_cfg = AugmentConfig(input_size=224, resize_size=256)
    model = create_model(config, num_classes=80)

    dummy = jnp.zeros((2, 224, 224, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), dummy, dummy, jnp.zeros((2,), jnp.int32)
    )
    print(f"model built; devices={jax.devices()}", flush=True)

    if "train" in modes:
        state = create_train_state(model, variables, config, steps_per_epoch=100)

        def train_step(state, images_u8, labels, key):
            aug_key, dropout_key = jax.random.split(
                jax.random.fold_in(key, state.step)
            )
            anchor, positive = dual_view_train_batch(images_u8, aug_key, aug_cfg)

            def loss_fn(params):
                vs = {"params": params}
                if state.constants is not None:
                    vs["constants"] = state.constants
                out = model.apply(
                    vs,
                    anchor,
                    positive,
                    labels,
                    deterministic=False,
                    rngs={"dropout": dropout_key},
                )
                return out["loss"]

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads=grads), loss

        jitted = jax.jit(train_step, donate_argnums=(0,))
        for batch in batches:
            imgs = jax.ShapeDtypeStruct((batch, 256, 256, 3), jnp.uint8)
            labels = jax.ShapeDtypeStruct((batch,), jnp.int32)
            t0 = time.perf_counter()
            print(f"compiling train step B={batch} ...", flush=True)
            jitted.lower(state, imgs, labels, jax.random.PRNGKey(0)).compile()
            print(
                f"  train B={batch} compiled in {time.perf_counter() - t0:.0f}s",
                flush=True,
            )

    if "infer" in modes:

        def infer(images_u8):
            anchor, _ = dual_view_eval_batch(images_u8, aug_cfg)
            return model.apply(variables, anchor, method=model.inference)

        jitted = jax.jit(infer)
        for batch in batches:
            imgs = jax.ShapeDtypeStruct((batch, 256, 256, 3), jnp.uint8)
            t0 = time.perf_counter()
            print(f"compiling infer step B={batch} ...", flush=True)
            jitted.lower(imgs).compile()
            print(
                f"  infer B={batch} compiled in {time.perf_counter() - t0:.0f}s",
                flush=True,
            )

    print("prewarm complete", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
