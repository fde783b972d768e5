#!/usr/bin/env python
"""Device-memory highwater report for the moment head configurations.

Capability parity with the reference's memory benchmarking
(/root/reference/test_memory_usage.py, CUDA peak-memory probes over
B in {2,4,8}, N=196, D=768, third-order on/off): reports live/peak HBM per
configuration via jax.live_arrays + device memory stats where the platform
exposes them, plus analytic activation sizing.

Run: PYTHONPATH=.:/root/.axon_site python scripts/memory_report.py [--device cpu]
"""

from __future__ import annotations

import argparse
import gc


def device_mem_stats():
    import jax

    dev = jax.devices()[0]
    try:
        stats = dev.memory_stats()
        if stats:
            return {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            }
    except Exception:
        pass
    return None


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--device", default=None, choices=["tpu", "cpu", "axon"])
    args = parser.parse_args()
    import jax

    if args.device:
        jax.config.update(
            "jax_platforms", "axon" if args.device == "tpu" else args.device
        )

    import jax.numpy as jnp
    import numpy as np

    from ego_moment_cle_vit_tpu.models import MomentHead
    from ego_moment_cle_vit_tpu.ops.moments import half_vectorize_dim

    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    n, d = 196, 768

    for batch in (2, 4, 8):
        for third in (False, True):
            gc.collect()
            tokens = jnp.asarray(
                rng.standard_normal((batch, n, d)).astype(np.float32)
            )
            g = rng.standard_normal((batch, n, n)).astype(np.float32)
            graph = jnp.asarray(np.abs(g @ g.transpose(0, 2, 1)))

            head = MomentHead(
                d_in=d,
                d_out=1024 if third else 512,
                use_third_order=third,
                isqrt_iterations=5,
                sketch_dim=2048,
            )
            variables = head.init(jax.random.PRNGKey(0), tokens, graph)
            out = jax.jit(lambda v, t, gr: head.apply(v, t, gr))(
                variables, tokens, graph
            )
            np.asarray(out)  # sync

            live = sum(
                int(np.prod(a.shape)) * a.dtype.itemsize
                for a in jax.live_arrays()
            )
            analytic = (
                batch * (n * d + n * n + 3 * d * d + half_vectorize_dim(d)) * 4
            )
            stats = device_mem_stats()
            peak = (
                f" peak={stats['peak_bytes_in_use'] / 1e6:.1f}MB"
                if stats and stats.get("peak_bytes_in_use")
                else ""
            )
            print(
                f"B={batch} third={int(third)}: out={tuple(out.shape)} "
                f"live={live / 1e6:7.1f}MB analytic_act={analytic / 1e6:6.1f}MB{peak}"
            )
            del tokens, graph, variables, out
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
