#!/usr/bin/env python
"""Stage2 block cost decomposition (the 18 C=512 blocks dominate the
Swin-Base backbone — docs/PROFILE_FLAGSHIP_R2.md per-stage table).

Variants, each an isolated jitted program on [B, 196, 512] tokens:

  full    — 18 real SwinBlocks (alternating shift), grad wrt input
            (comparable to profile_swin.py's 9.9 ms/block number)
  fullp   — same, grad wrt PARAMS (adds the dW GEMMs — the honest
            in-step backward cost)
  mlp     — LN2 + fc1 + GELU + fc2 + residual only, x18
  gemm    — the four GEMMs only (qkv/proj/fc1/fc2 + residuals), x18 —
            the MXU floor for the block stack

attn half ~= full - mlp; non-GEMM overhead ~= full - gemm.

Run: PYTHONPATH=.:/root/.axon_site python scripts/profile_stage2.py
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)  # dual-view of B=64
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--blocks", type=int, default=18)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--res", type=int, default=14)
    p.add_argument("--variants", default="full,fullp,mlp,gemm")
    p.add_argument("--spatial-max-pack", type=int, default=None,
                   help="override swin._SPATIAL_MAX_PACK (e.g. 100 to force "
                        "the spatial-layout kernel at every stage)")
    p.add_argument("--noshift", action="store_true",
                   help="disable the shifted-window roll (ablation: the "
                        "full-vs-noshift delta is the roll's HBM cost)")
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(__import__("pathlib").Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import flax.linen as nn
    import jax.numpy as jnp

    from ego_moment_cle_vit_tpu.models import swin as swin_mod
    from ego_moment_cle_vit_tpu.models.swin import SwinBlock

    if args.spatial_max_pack is not None:
        swin_mod._SPATIAL_MAX_PACK = args.spatial_max_pack
    if args.noshift:
        swin_mod._PROFILE_NOSHIFT = True

    B, N, C, H = args.batch, args.res * args.res, args.dim, args.heads
    K = args.blocks
    dt = jnp.bfloat16

    class FullStack(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(K):
                x = SwinBlock(
                    num_heads=H,
                    window_size=7,
                    shift_size=0 if i % 2 == 0 else 3,
                    mlp_ratio=4.0,
                    input_resolution=(args.res, args.res),
                    remat="attn",
                    attn_kernel="auto",
                    dtype=dt,
                    name=f"b{i}",
                )(x)
            return x

    class MLPStack(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(K):
                y = nn.LayerNorm(epsilon=1e-5, dtype=dt, name=f"ln{i}")(x)
                y = nn.Dense(4 * C, dtype=dt, name=f"fc1_{i}")(y)
                y = nn.gelu(y, approximate=False)
                y = nn.Dense(C, dtype=dt, name=f"fc2_{i}")(y)
                x = x + y
            return x

    class GemmStack(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(K):
                a = nn.Dense(3 * C, use_bias=False, dtype=dt, name=f"qkv{i}")(x)
                # collapse 3C -> C so shapes chain (stands in for attention's
                # value contraction; keeps the GEMM count at 4/block)
                a = a[..., :C] + a[..., C : 2 * C] + a[..., 2 * C :]
                x = x + nn.Dense(C, use_bias=False, dtype=dt, name=f"proj{i}")(a)
                y = nn.Dense(4 * C, use_bias=False, dtype=dt, name=f"fc1_{i}")(x)
                x = x + nn.Dense(C, use_bias=False, dtype=dt, name=f"fc2_{i}")(y)
            return x

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, C)) * 0.1, dt)

    def timed(fn, *fargs):
        out = fn(*fargs)
        float(jnp.sum(out if not isinstance(out, tuple) else out[0]).astype(jnp.float32))
        best = None
        # two loops, keep the faster (first-loop tunnel ramp, see bench.py)
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(*fargs)
            float(jnp.sum(out if not isinstance(out, tuple) else out[0]).astype(jnp.float32))
            took = (time.perf_counter() - t0) / args.iters * 1e3
            best = took if best is None else min(best, took)
        return best

    wanted = {v.strip() for v in args.variants.split(",")}
    results = {}
    for name, Mod in (("full", FullStack), ("mlp", MLPStack), ("gemm", GemmStack)):
        if name not in wanted and not (name == "full" and "fullp" in wanted):
            continue
        model = Mod()
        variables = model.init(jax.random.PRNGKey(0), x[:2])

        if name in wanted:
            @jax.jit
            def fwd(v, xx, model=model):
                return model.apply(v, xx)

            @jax.jit
            def fwdbwd(v, xx, model=model):
                def loss(z):
                    return jnp.sum(model.apply(v, z).astype(jnp.float32))

                l, g = jax.value_and_grad(loss)(xx)
                return l + jnp.sum(g).astype(jnp.float32)

            f = timed(fwd, variables, x)
            fb = timed(fwdbwd, variables, x)
            results[name] = (f, fb)
            print(
                f"{name:6s} fwd {f:7.2f} ms ({f/K:5.2f}/blk)   "
                f"fwd+bwd(dx) {fb:7.2f} ms ({fb/K:5.2f}/blk)",
                flush=True,
            )

        if name == "full" and "fullp" in wanted:
            @jax.jit
            def fwdbwd_p(v, xx, model=model):
                def loss(params):
                    return jnp.sum(model.apply({"params": params}, xx).astype(jnp.float32))

                l, g = jax.value_and_grad(loss)(v["params"])
                leaves = jax.tree_util.tree_leaves(g)
                return l + sum(jnp.sum(t).astype(jnp.float32) for t in leaves)

            fbp = timed(fwdbwd_p, variables, x)
            results["fullp"] = (None, fbp)
            print(
                f"fullp  fwd+bwd(dparams) {fbp:7.2f} ms ({fbp/K:5.2f}/blk)",
                flush=True,
            )

    if "full" in results and "mlp" in results:
        print(f"\nattn half (full - mlp, f+b): "
              f"{(results['full'][1] - results['mlp'][1])/K:.2f} ms/blk")
    if "full" in results and "gemm" in results:
        print(f"non-GEMM overhead (full - gemm, f+b): "
              f"{(results['full'][1] - results['gemm'][1])/K:.2f} ms/blk")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
