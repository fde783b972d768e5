#!/usr/bin/env python
"""Probe: per-step dispatch overhead through the remote-TPU tunnel.

Compares the flagship train step executed as (a) K individual jit
dispatches (the classic loop; donation, async dispatch) against (b) ONE
jitted ``lax.scan`` over K steps with the batch gathered on device from an
HBM-resident split (the ``DeviceDatasetCache`` production path).

If the tunnel serializes per-step dispatch (observed: full train steps are
host-sensitive through the per-step donation round-trip —
docs/PROFILE_FLAGSHIP_R3.md), the scan form removes every inter-step gap
and its win is the dispatch overhead we can harvest with a
``steps_per_dispatch`` trainer knob.

Usage: PYTHONPATH=. python scripts/probe_scan.py [--batch 64] [--steps 20]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--backbone", default="swin_base_patch4_window7_224")
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(__import__("pathlib").Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from ego_moment_cle_vit_tpu.data import AugmentConfig, dual_view_train_batch
    from ego_moment_cle_vit_tpu.models import create_model
    from ego_moment_cle_vit_tpu.train.state import create_train_state

    batch, steps = args.batch, args.steps
    config = {
        "model": {
            "backbone_name": args.backbone,
            "norm": "layer",
            "bf16": True,
            "backbone_remat": "attn" if batch <= 64 else "block",
            "gpf": {"degree_p": 2, "degree_q": 2, "similarity": "dot"},
            "moment": {
                "d_out": 1024,
                "use_third_order": True,
                "isqrt_iterations": 5,
                "sketch_dim": 4096,
                "bf16_params": True,
            },
            "classifier": {"fusion_type": "add"},
        },
        "training": {
            "batch_size": batch,
            "optimizer": {"lr": 3e-4, "factored_large_leaves": True},
            "scheduler": {"warmup_epochs": 0},
            "loss": {"lambda_triplet": 0.6, "lambda_align": 0.1, "margin": 0.3},
            "epochs": 1,
        },
        "data": {"input_size": 224, "resize_size": 256},
    }

    model = create_model(config, num_classes=80)
    aug_cfg = AugmentConfig(input_size=224, resize_size=256)

    rng = np.random.default_rng(0)
    # HBM-resident "split": 4 batches worth of images, gathered per step
    pool = batch * 4
    images_pool = jnp.asarray(
        rng.integers(0, 256, (pool, 256, 256, 3), dtype=np.uint8)
    )
    labels_pool = jnp.asarray(rng.integers(0, 80, (pool,)), jnp.int32)

    dummy = jnp.zeros((2, 224, 224, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), dummy, dummy, jnp.zeros((2,), jnp.int32)
    )
    state = create_train_state(model, variables, config, steps_per_epoch=100)

    def one_step(state, images_u8, labels, key):
        aug_key, dropout_key = jax.random.split(jax.random.fold_in(key, state.step))
        anchor, positive = dual_view_train_batch(images_u8, aug_key, aug_cfg)

        def loss_fn(params):
            vs = {"params": params}
            if state.constants is not None:
                vs["constants"] = state.constants
            out = model.apply(
                vs, anchor, positive, labels,
                deterministic=False, rngs={"dropout": dropout_key},
            )
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    step = jax.jit(one_step, donate_argnums=(0,))

    def mega(state, idx, key):
        """idx: [K, B] int32 — scan over K steps, gathering each batch from
        the HBM-resident pool (the DeviceDatasetCache path, in-scan)."""

        def body(state, idx_k):
            images = jnp.take(images_pool, idx_k, axis=0)
            labels = jnp.take(labels_pool, idx_k, axis=0)
            state, loss = one_step(state, images, labels, key)
            return state, loss

        state, losses = jax.lax.scan(body, state, idx)
        return state, losses[-1]

    megastep = jax.jit(mega, donate_argnums=(0,))

    key = jax.random.PRNGKey(0)
    images_u8 = images_pool[:batch]
    labels = labels_pool[:batch]
    idx = jnp.asarray(
        rng.integers(0, pool, (steps, batch)), jnp.int32
    )

    # compile both
    t0 = time.perf_counter()
    state, loss = step(state, images_u8, labels, key)
    float(loss)
    print(f"# step compile {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    state, loss = megastep(state, idx, key)
    float(loss)
    print(f"# megastep compile {time.perf_counter()-t0:.0f}s", flush=True)

    for r in range(args.repeats):
        # loop form
        t0 = time.perf_counter()
        for _ in range(steps):
            state, loss = step(state, images_u8, labels, key)
        float(loss)
        loop_s = time.perf_counter() - t0
        # scan form
        t0 = time.perf_counter()
        state, loss = megastep(state, idx, key)
        float(loss)
        scan_s = time.perf_counter() - t0
        print(
            f"rep{r}: loop {loop_s/steps*1e3:.1f} ms/step "
            f"({batch*steps/loop_s:.1f} img/s) | scan {scan_s/steps*1e3:.1f} ms/step "
            f"({batch*steps/scan_s:.1f} img/s) | dispatch overhead "
            f"{(loop_s-scan_s)/steps*1e3:.1f} ms/step",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
