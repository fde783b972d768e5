#!/usr/bin/env python
"""Microbenchmark: Pallas kernels vs pure-XLA for the hot pipeline ops on
the real TPU chip.  Prints a small table; used to validate the dispatch
thresholds in ops/pallas.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_pallas.py
"""

from __future__ import annotations

import time

import numpy as np


def timeit(fn, *args, iters=20):
    out = fn(*args)
    # host-fetch fence (axon block_until_ready is unreliable)
    np.asarray(jax.tree_util.tree_leaves(out)[0])[..., 0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])[..., 0]
    return (time.perf_counter() - t0) / iters * 1e3  # ms


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from ego_moment_cle_vit_tpu.ops import (
        gpf_fuse,
        newton_schulz_isqrt,
        token_similarity_graph,
    )
    from ego_moment_cle_vit_tpu.ops.pallas import (
        fused_gpf_pallas,
        newton_schulz_isqrt_pallas,
    )

    print(f"backend: {jax.default_backend()} {jax.devices()}")
    rng = np.random.default_rng(0)

    for b, n, d in ((16, 196, 384), (16, 196, 768), (16, 49, 1024)):
        ta = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
        tp = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
        coeffs = jnp.asarray(rng.uniform(0, 1, (3, 3)).astype(np.float32))

        xla = jax.jit(
            lambda a, p, c: gpf_fuse(
                token_similarity_graph(a, "cosine"),
                token_similarity_graph(p, "cosine"),
                c,
            )
        )
        pls = jax.jit(
            lambda a, p, c: fused_gpf_pallas(a, p, c, "cosine", 1e-6, True)
        )
        t_xla = timeit(xla, ta, tp, coeffs)
        t_pls = timeit(pls, ta, tp, coeffs)
        # correctness cross-check on device
        diff = float(
            jnp.max(jnp.abs(xla(ta, tp, coeffs) - pls(ta, tp, coeffs)))
        )
        print(
            f"GPF  B{b} N{n} D{d}:  xla {t_xla:7.3f} ms   pallas {t_pls:7.3f} ms "
            f"  speedup {t_xla / t_pls:4.2f}x   maxdiff {diff:.2e}"
        )

    for b, d in ((16, 384), (16, 768)):
        a = rng.standard_normal((b, d, d)).astype(np.float32)
        m = jnp.asarray(a @ a.transpose(0, 2, 1) / d + 0.5 * np.eye(d, dtype=np.float32))
        xla = jax.jit(lambda x: newton_schulz_isqrt(x, 5, assume_symmetric=True))
        pls = jax.jit(lambda x: newton_schulz_isqrt_pallas(x, 5, 1e-5))
        t_xla = timeit(xla, m)
        t_pls = timeit(pls, m)
        diff = float(jnp.max(jnp.abs(xla(m) - pls(m))))
        print(
            f"NS5  B{b} D{d}:      xla {t_xla:7.3f} ms   pallas {t_pls:7.3f} ms "
            f"  speedup {t_xla / t_pls:4.2f}x   maxdiff {diff:.2e}"
        )
