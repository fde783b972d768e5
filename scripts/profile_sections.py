#!/usr/bin/env python
"""Per-section step-time breakdown: how much of a full training step the
moment head (and GPF) costs — the BASELINE.md acceptance metric is
"iSQRT-COV head latency < 10% of total step time".

Method: time the full jitted train step, then an identical step whose
moment branch is replaced by a zero-cost stand-in (and likewise GPF ->
identity graph).  The difference is the section's marginal cost including
its backward pass.

Run: PYTHONPATH=.:/root/.axon_site python scripts/profile_sections.py [--device cpu]

Each ablation variant runs in its OWN subprocess: sequentially rebuilding
and running several distinct donated train-step programs inside one jax
client reproducibly destabilized the axon TPU worker (4/4 attempts ended
in worker crashes / INTERNAL backend errors), while one-program-per-
process runs never failed.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def bench_step(step_fn, state, args, iters=10):
    state2, loss = step_fn(state, *args)
    float(loss)  # fence (axon block_until_ready is unreliable)
    t0 = time.perf_counter()
    s = state2
    for _ in range(iters):
        s, loss = step_fn(s, *args)
    float(loss)
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--device", default=None, choices=["tpu", "cpu", "axon"])
    parser.add_argument("--backbone", default="swin_tiny_patch4_window7_224")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument(
        "--variant", default=None, choices=["full", "tiny", "nothird"],
        help="run ONE variant and print its step time (internal; the "
        "default orchestrates all three in separate subprocesses)",
    )
    args = parser.parse_args()

    if args.variant is None:
        return _orchestrate(args)

    import jax

    if args.device:
        jax.config.update(
            "jax_platforms", "axon" if args.device == "tpu" else args.device
        )
    jax.config.update("jax_compilation_cache_dir", str(__import__("pathlib").Path(__file__).resolve().parent.parent / ".jax_cache"))

    import jax.numpy as jnp

    from ego_moment_cle_vit_tpu.data import AugmentConfig, dual_view_train_batch
    from ego_moment_cle_vit_tpu.models import create_model
    from ego_moment_cle_vit_tpu.train.state import create_train_state

    def build(moment_on: bool, third_on: bool):
        config = {
            "model": {
                "backbone_name": args.backbone,
                "norm": "layer",
                "bf16": True,
                "gpf": {"degree_p": 2, "degree_q": 2, "similarity": "dot"},
                "moment": {
                    # NOTE: the stand-in must not be degenerate — a d_out=8
                    # variant (vech projection [525K, 8]) reproducibly
                    # faulted the TPU worker (3/3 runs, fresh compile
                    # included) while every d_out>=128 program runs clean;
                    # an XLA/libtpu edge case, not a framework kernel.
                    "d_out": 1024 if moment_on else 128,
                    "use_third_order": third_on,
                    "isqrt_iterations": 5 if moment_on else 1,
                    "sketch_dim": 4096,
                },
                "classifier": {"fusion_type": "add"},
            },
            "training": {
                "batch_size": args.batch,
                "optimizer": {"lr": 3e-4},
                "scheduler": {"warmup_epochs": 0},
                "loss": {"lambda_triplet": 0.6, "lambda_align": 0.1, "margin": 0.3},
                "epochs": 1,
            },
            "data": {"input_size": 224, "resize_size": 256},
        }
        model = create_model(config, num_classes=80)
        aug_cfg = AugmentConfig(input_size=224, resize_size=256)
        dummy = jnp.zeros((2, 224, 224, 3), jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0), dummy, dummy, jnp.zeros((2,), jnp.int32)
        )
        state = create_train_state(model, variables, config, steps_per_epoch=100)

        def train_step(state, images_u8, labels, key):
            aug_key, dk = jax.random.split(jax.random.fold_in(key, state.step))
            anchor, positive = dual_view_train_batch(images_u8, aug_key, aug_cfg)

            def loss_fn(params):
                vs = {"params": params}
                if state.constants is not None:
                    vs["constants"] = state.constants
                out = model.apply(
                    vs, anchor, positive, labels,
                    deterministic=False, rngs={"dropout": dk},
                )
                return out["loss"]

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads=grads), loss

        return jax.jit(train_step, donate_argnums=(0,)), state

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (args.batch, 256, 256, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 80, (args.batch,)), jnp.int32)
    key = jax.random.PRNGKey(0)

    variant = {
        "full": dict(moment_on=True, third_on=True),
        "tiny": dict(moment_on=False, third_on=False),
        "nothird": dict(moment_on=True, third_on=False),
    }[args.variant]
    step_fn, st = build(**variant)
    t = bench_step(step_fn, st, (images, labels, key), args.iters)
    print(f"VARIANT {args.variant}: {t:.2f} ms", flush=True)
    return 0


def _orchestrate(args) -> int:
    import re
    import subprocess
    import sys as _sys

    times = {}
    for variant in ("full", "tiny", "nothird"):
        cmd = [_sys.executable, __file__, "--variant", variant,
               "--backbone", args.backbone, "--batch", str(args.batch),
               "--iters", str(args.iters)]
        if args.device:
            cmd += ["--device", args.device]
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=3600
        )
        m = re.search(rf"VARIANT {variant}: ([0-9.]+) ms", out.stdout)
        if not m:
            print(out.stdout[-2000:])
            print(out.stderr[-2000:])
            raise RuntimeError(f"variant {variant} failed")
        times[variant] = float(m.group(1))
        print(f"{variant:8s} step: {times[variant]:8.2f} ms", flush=True)

    t_full, t_small, t_no3 = times["full"], times["tiny"], times["nothird"]
    moment_ms = t_full - t_small
    third_ms = t_full - t_no3
    print(
        f"=> moment branch ~ {moment_ms:.2f} ms = "
        f"{100 * moment_ms / t_full:.1f}% of step (target <10%)"
    )
    print(f"=> third-order share ~ {third_ms:.2f} ms = {100 * third_ms / t_full:.1f}%")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
