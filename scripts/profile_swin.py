#!/usr/bin/env python
"""Swin backbone cost decomposition on the real chip.

The backbone is the dominant step cost (docs/PERFORMANCE.md). This script
isolates where its time goes by timing ablated variants of the swin-base
dual-view fwd+bwd at the bench batch:

  full         — as benched (shifted windows, pack=2, attn remat)
  noshift      — shift_size forced 0 everywhere (removes jnp.roll pairs
                 and the shifted-window masks; isolates roll/mask cost)
  pack1        — window packing disabled (isolates the packing win)
  fwd          — forward only (splits fwd vs bwd)

Run: PYTHONPATH=. python scripts/profile_swin.py --batch 32
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32)  # dual-view of B=16
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--backbone", default="swin_base_patch4_window7_224")
    parser.add_argument("--remat", default="attn")
    parser.add_argument("--variants", default=None,
                        help="comma list: full,spatial,noshift,pack1")
    args = parser.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(__import__("pathlib").Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import jax.numpy as jnp

    from ego_moment_cle_vit_tpu.models import swin as swin_mod

    base_cfg = swin_mod.SWIN_CONFIGS[args.backbone]

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((args.batch, 224, 224, 3)), jnp.float32
    )

    def timed(fn, *fargs):
        out = fn(*fargs)
        float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out))
        best = None
        # two loops, keep the faster (first-loop tunnel ramp; see bench.py)
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(*fargs)
            float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out))
            took = (time.perf_counter() - t0) / args.iters * 1e3
            best = took if best is None else min(best, took)
        return best

    import dataclasses

    results = {}

    # --- variants ------------------------------------------------------
    variants = {
        "full": dict(),
        "spatial": dict(attn_kernel="spatial"),
        "noshift": dict(noshift=True),
        "pack1": dict(pack1=True),
    }
    if args.variants:
        wanted = {v.strip() for v in args.variants.split(",")}
        variants = {k: v for k, v in variants.items() if k in wanted}

    for name, flags in variants.items():
        # patch SwinBlock behavior through module-level globals
        swin_mod._PROFILE_NOSHIFT = flags.get("noshift", False)
        swin_mod._PROFILE_PACK1 = flags.get("pack1", False)
        cfg = dataclasses.replace(
            base_cfg,
            remat=args.remat,
            attn_kernel=flags.get("attn_kernel", "auto"),
        )
        model = swin_mod.Swin(cfg, dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), images[:2])

        @jax.jit
        def fwd(v, x, model=model):
            return jnp.sum(model.apply(v, x).astype(jnp.float32))

        @jax.jit
        def fwdbwd(v, x, model=model):
            def loss(xx):
                return jnp.sum(model.apply(v, xx).astype(jnp.float32))

            l, g = jax.value_and_grad(loss)(x)
            return l + jnp.sum(g)

        @jax.jit
        def fwdbwd_p(v, x, model=model):
            def loss(params):
                return jnp.sum(
                    model.apply({"params": params}, x).astype(jnp.float32)
                )

            l, g = jax.value_and_grad(loss)(v["params"])
            leaves = jax.tree_util.tree_leaves(g)
            return l + sum(jnp.sum(t).astype(jnp.float32) for t in leaves)

        results[f"{name}/fwd"] = timed(fwd, variables, images)
        results[f"{name}/fwd+bwd"] = timed(fwdbwd, variables, images)
        results[f"{name}/fwd+bwd(p)"] = timed(fwdbwd_p, variables, images)
        print(
            f"{name:10s} fwd {results[f'{name}/fwd']:7.2f} ms   "
            f"fwd+bwd {results[f'{name}/fwd+bwd']:7.2f} ms   "
            f"fwd+bwd(dparams) {results[f'{name}/fwd+bwd(p)']:7.2f} ms",
            flush=True,
        )

    swin_mod._PROFILE_NOSHIFT = False
    swin_mod._PROFILE_PACK1 = False

    if "full/fwd+bwd" in results:
        full = results["full/fwd+bwd"]
        if "noshift/fwd+bwd" in results:
            print(f"\nroll/shift-mask marginal: "
                  f"{full - results['noshift/fwd+bwd']:.2f} ms")
        if "pack1/fwd+bwd" in results:
            print(f"window-packing win:       "
                  f"{results['pack1/fwd+bwd'] - full:.2f} ms")
        if "spatial/fwd+bwd" in results:
            print(f"spatial-kernel marginal:  "
                  f"{full - results['spatial/fwd+bwd']:.2f} ms "
                  f"(positive = spatial wins)")
        print(f"bwd share of full:        {full - results['full/fwd']:.2f} ms")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
