#!/usr/bin/env python
"""Full in-step attribution of the flagship train step (VERDICT r2 item 1a).

Round 2 left ~60 ms (~18%) of the 324 ms step "unattributed" because the
backbone number came from an ISOLATED measurement (per-block dispatch
fences inflate it) and the section costs were standalone programs scaled
across batch sizes.  This script instead measures EVERY non-backbone
section as a chip-exclusive, in-step ablation delta at the exact flagship
config (swin_base dual-view 224 bf16, B=64): the remainder after all
deltas IS the backbone's in-step cost — nothing is left unattributed.

    t(full)      - t(variant) = that section's marginal in-step cost
    t(full)      - sum(deltas) = backbone + jit dispatch (the remainder)

Each variant runs in its OWN subprocess (sequentially rebuilding donated
train-step programs in one jax client reproducibly destabilized the axon
TPU worker — see profile_sections.py).

Variants:
  full        the exact bench.py step (cache-shared with bench.py)
  fwdonly     forward + loss only (no grad, no update)  -> bwd+opt share
  noaug       augmented views precomputed outside the step -> aug share
  noauxloss   lambda_triplet=0, lambda_align=0           -> aux-loss share
  sgd         plain SGD, no clip, no finite-check        -> optimizer share
  noclip      AdamW but grad_clip=0, no finite-check     -> clip/check share
  tinymoment  d_out=128, 1 NS iter stand-in              -> moment share

Run: PYTHONPATH=. python scripts/profile_attribution.py [--variants full,noaug]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

# self-contained: runnable as `python scripts/profile_attribution.py` from
# anywhere (subprocess variants re-exec this file)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

VARIANTS = (
    "full",
    "fwdonly",
    "noaug",
    "noauxloss",
    "sgd",
    "noopt",
    "noclip",
    "tinymoment",
)
# noopt (round 4): all gradients computed and fenced but NO optimizer
# update / clip — full minus noopt is the (optimizer + clip) share with
# the steady-state methodology, replacing the faulting `sgd` variant
# (VERDICT r3 item 9); subtract the noclip delta for the optimizer alone.


def bench_step(step_fn, carry, args, iters):
    out = step_fn(carry, *args) if carry is not None else step_fn(*args)
    loss = out[1] if isinstance(out, tuple) else out
    float(loss)  # fence (axon block_until_ready is unreliable)
    c = out[0] if isinstance(out, tuple) else None
    best = None
    # two loops, keep the faster: the first ~20 executions of a freshly
    # loaded program run above steady state (see bench.py)
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step_fn(c, *args) if c is not None else step_fn(*args)
            if isinstance(out, tuple):
                c = out[0]
        loss = out[1] if isinstance(out, tuple) else out
        float(loss)
        took = (time.perf_counter() - t0) / iters * 1e3
        best = took if best is None else min(best, took)
    return best


def run_variant(variant: str, batch: int, iters: int) -> float:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(__import__("pathlib").Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import jax.numpy as jnp
    import optax

    from ego_moment_cle_vit_tpu.data import AugmentConfig, dual_view_train_batch
    from ego_moment_cle_vit_tpu.models import create_model
    from ego_moment_cle_vit_tpu.train.state import EMCTrainState, create_train_state

    tiny_moment = variant == "tinymoment"
    config = {
        "model": {
            "backbone_name": "swin_base_patch4_window7_224",
            "norm": "layer",
            "bf16": True,
            "backbone_remat": "attn",
            "gpf": {"degree_p": 2, "degree_q": 2, "similarity": "dot"},
            "moment": {
                # d_out=128 stand-in, NOT 8: the [525K, 8] projection
                # reproducibly faults the TPU worker (profile_sections.py)
                "d_out": 128 if tiny_moment else 1024,
                "use_third_order": not tiny_moment,
                "isqrt_iterations": 1 if tiny_moment else 5,
                "sketch_dim": 4096,
            },
            "classifier": {"fusion_type": "add"},
        },
        "training": {
            "batch_size": batch,
            "optimizer": {"lr": 3e-4, "factored_large_leaves": True},
            "scheduler": {"warmup_epochs": 0},
            "loss": {
                "lambda_triplet": 0.0 if variant == "noauxloss" else 0.6,
                "lambda_align": 0.0 if variant == "noauxloss" else 0.1,
                "margin": 0.3,
            },
            "epochs": 1,
        },
        "data": {"input_size": 224, "resize_size": 256},
    }
    if variant == "noclip":
        config["training"]["grad_clip"] = 0.0
        config["training"]["skip_nonfinite_updates"] = False

    model = create_model(config, num_classes=80)
    aug_cfg = AugmentConfig(input_size=224, resize_size=256)

    rng = np.random.default_rng(0)
    images_u8 = jnp.asarray(
        rng.integers(0, 256, (batch, 256, 256, 3), dtype=np.uint8)
    )
    labels = jnp.asarray(rng.integers(0, 80, (batch,)), jnp.int32)
    dummy = jnp.zeros((2, 224, 224, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), dummy, dummy, jnp.zeros((2,), jnp.int32)
    )

    if variant == "sgd":
        state = EMCTrainState.create(
            apply_fn=model.apply,
            params=variables["params"],
            tx=optax.sgd(3e-4),
            batch_stats=variables.get("batch_stats"),
            constants=variables.get("constants"),
        )
    else:
        state = create_train_state(model, variables, config, steps_per_epoch=100)

    key = jax.random.PRNGKey(0)

    if variant == "fwdonly":
        anchor0, positive0 = None, None  # aug stays in-step for parity w/ full

        def fwd(params_etc, images_u8, labels, key):
            aug_key, dk = jax.random.split(key)
            anchor, positive = dual_view_train_batch(images_u8, aug_key, aug_cfg)
            vs = {"params": params_etc["params"]}
            if params_etc.get("constants") is not None:
                vs["constants"] = params_etc["constants"]
            out = model.apply(
                vs, anchor, positive, labels, deterministic=False,
                rngs={"dropout": dk},
            )
            return out["loss"]

        packed = {"params": state.params, "constants": state.constants}
        step = jax.jit(fwd)
        t0 = time.perf_counter()
        loss = step(packed, images_u8, labels, key)
        float(loss)
        compile_s = time.perf_counter() - t0
        ms = None
        for _ in range(2):  # steady-state: keep the faster loop
            t0 = time.perf_counter()
            for _ in range(iters):
                loss = step(packed, images_u8, labels, key)
            float(loss)
            took = (time.perf_counter() - t0) / iters * 1e3
            ms = took if ms is None else min(ms, took)
        print(f"VARIANT {variant}: {ms:.2f} ms (compile {compile_s:.0f}s)", flush=True)
        return ms

    if variant == "noaug":
        anchor, positive = jax.jit(
            lambda im, k: dual_view_train_batch(im, k, aug_cfg)
        )(images_u8, key)
        anchor = jax.block_until_ready(anchor)

        def train_step(state, anchor, positive, labels, key):
            _, dk = jax.random.split(jax.random.fold_in(key, state.step))

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

        step = jax.jit(train_step, donate_argnums=(0,))
        args = (anchor, positive, labels, key)
    elif variant == "noopt":

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
            # fence EVERY gradient leaf into the scalar so no dW is DCE'd;
            # the optimizer update itself is skipped
            gsum = sum(
                jnp.sum(g.astype(jnp.float32))
                for g in jax.tree_util.tree_leaves(grads)
            )
            # nonzero coefficient: 0.0 * gsum would constant-fold and DCE
            # the whole backward
            return state, loss + 1e-12 * gsum

        step = jax.jit(train_step, donate_argnums=(0,))
        args = (images_u8, labels, key)
    else:

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

        step = jax.jit(train_step, donate_argnums=(0,))
        args = (images_u8, labels, key)

    t0 = time.perf_counter()
    state2, loss = step(state, *args)
    float(loss)
    compile_s = time.perf_counter() - t0
    ms = bench_step(step, state2, args, iters)
    print(f"VARIANT {variant}: {ms:.2f} ms (compile {compile_s:.0f}s)", flush=True)
    return ms


def orchestrate(variants, batch, iters) -> int:
    times = {}
    for v in variants:
        cmd = [sys.executable, __file__, "--variant", v,
               "--batch", str(batch), "--iters", str(iters)]
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        m = re.search(rf"VARIANT {v}: ([0-9.]+) ms", out.stdout)
        if not m:
            print(out.stdout[-3000:])
            print(out.stderr[-3000:])
            print(f"!! variant {v} failed; continuing", flush=True)
            continue
        times[v] = float(m.group(1))
        print(f"{v:12s} step: {times[v]:8.2f} ms", flush=True)

    if "full" in times:
        t = times["full"]
        report = {"step_ms": {k: round(v, 2) for k, v in times.items()}}
        deltas = {}
        for v, name in [
            ("noaug", "augmentation"),
            ("noauxloss", "aux_losses"),
            ("sgd", "optimizer_total"),
            ("noclip", "clip_and_finite_check"),
            ("tinymoment", "gpf_moment_branch"),
        ]:
            if v in times:
                deltas[name] = round(t - times[v], 2)
        if "fwdonly" in times:
            deltas["backward_plus_update"] = round(t - times["fwdonly"], 2)
        known = sum(
            deltas.get(k, 0.0)
            for k in ("augmentation", "aux_losses", "optimizer_total",
                      "gpf_moment_branch")
        )
        deltas["remainder_backbone_plus_dispatch"] = round(t - known, 2)
        report["in_step_deltas_ms"] = deltas
        print(json.dumps(report, indent=2))
    return 0


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--variant", default=None, choices=VARIANTS)
    parser.add_argument("--variants", default=",".join(VARIANTS))
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()

    if args.variant is not None:
        run_variant(args.variant, args.batch, args.iters)
        return 0
    return orchestrate(
        [v.strip() for v in args.variants.split(",") if v.strip()],
        args.batch,
        args.iters,
    )


if __name__ == "__main__":
    sys.exit(main())
