#!/usr/bin/env python
"""On-device dual-view augmentation cost decomposition (bench flagship:
B=64, resize 256 -> crop 224).

Variants toggle one section each via AugmentConfig, isolating marginal
costs: rotation (3-shear FFT), color jitter (affine segments + HSV hue),
and the whole chain vs the uint8 decode+crop+normalize floor.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_aug.py
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(__import__("pathlib").Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from ego_moment_cle_vit_tpu.data import AugmentConfig, dual_view_train_batch

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (args.batch, 256, 256, 3), dtype=np.uint8)
    )
    key = jax.random.PRNGKey(0)

    base = AugmentConfig(input_size=224, resize_size=256)
    variants = {
        "full": base,
        "norotate": dataclasses.replace(base, rotation_degrees=0.0),
        "nojitter": dataclasses.replace(
            base, brightness=0.0, contrast=0.0, saturation=0.0, hue=0.0
        ),
        "nohue": dataclasses.replace(base, hue=0.0),
        "bare": dataclasses.replace(
            base, rotation_degrees=0.0, brightness=0.0, contrast=0.0,
            saturation=0.0, hue=0.0, hflip_prob=0.0,
        ),
    }

    def timed(cfg):
        fn = jax.jit(lambda im, k: tuple(
            jnp.sum(v.astype(jnp.float32)) for v in dual_view_train_batch(im, k, cfg)
        ))
        out = fn(images, key)
        float(out[0])
        best = None
        # two loops, keep the faster: the first ~20 executions of a fresh
        # program through the tunnel run well above steady state
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(images, key)
            float(out[0] + out[1])
            took = (time.perf_counter() - t0) / args.iters * 1e3
            best = took if best is None else min(best, took)
        return best

    results = {}
    for name, cfg in variants.items():
        results[name] = timed(cfg)
        print(f"{name:10s} {results[name]:7.2f} ms", flush=True)

    full = results["full"]
    for name in ("norotate", "nojitter", "nohue"):
        print(f"{name[2:]:10s} marginal: {full - results[name]:.2f} ms")
    print(f"geometry floor (bare): {results['bare']:.2f} ms")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
