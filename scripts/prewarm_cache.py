#!/usr/bin/env python
"""Pre-warm the persistent XLA compile cache (.jax_cache) for every program
`bench.py` runs, so a driver-captured bench never pays the axon
remote-compile cold path (round-2 measured 949 s; round-4's driver bench
timed out on exactly that).

Strategy: run `bench.py` itself in subprocesses with BENCH_STEPS=2 and all
long extras disabled.  The bench process traces/compiles the EXACT programs
the real run uses (same config dict, same step function, same donation
signature) and writes them to .jax_cache — an AOT re-implementation here
would silently drift from bench.py's config (it did: an older version of
this script omitted backbone_remat / moment.bf16_params /
optimizer.factored_large_leaves and warmed a program the bench never runs).

Warms, in order:
1. full preset train step (swin-base B=64) + its serving/infer program
2. large preset train step (swin_large B=64, remat=attn)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/prewarm_cache.py
Env: PREWARM_TARGETS="full,large" to select.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BENCH = str(REPO / "bench.py")


def _run(name: str, env_overrides: dict[str, str]) -> int:
    env = dict(
        os.environ,
        BENCH_STEPS="2",
        BENCH_E2E="0",
        BENCH_E2E_STREAM="0",
        BENCH_LARGE="0",
        BENCH_BUDGET_S=os.environ.get("PREWARM_BUDGET_S", "3000"),
    )
    env.update(env_overrides)  # overrides win (dict(**kw) raises on dupes)
    t0 = time.perf_counter()
    print(f"prewarming {name} ...", flush=True)
    proc = subprocess.run([sys.executable, BENCH], env=env)
    print(
        f"  {name}: rc={proc.returncode} in {time.perf_counter() - t0:.0f}s",
        flush=True,
    )
    return proc.returncode


def main() -> int:
    targets = os.environ.get("PREWARM_TARGETS", "all").split(",")
    rc = 0
    if "all" in targets:
        # bench.py runs its extras IN-PROCESS since round 5: ONE run with
        # extras on compiles the swin-base train step, the single-pass
        # serving program, AND the swin_large train step — one device init
        # instead of three.  BENCH_E2E stays off (it reuses the train-step
        # program).  Falls through to the standalone targets below only
        # when selected explicitly (fault isolation).
        rc |= _run(
            "all (swin-base train + infer + swin_large, one process)",
            {"BENCH_PRESET": "full", "BENCH_LARGE": "1", "BENCH_INFER": "1"},
        )
    if "full" in targets:
        # one bench run compiles the train step AND (BENCH_INFER=1 default)
        # the single-pass serving program
        rc |= _run("full train+infer (swin-base B=64)", {"BENCH_PRESET": "full"})
    if "infer" in targets:
        # standalone serving-program warm (BENCH_MODE=infer skips the train
        # step entirely) — covers the case where the full run's in-line
        # infer sub-bench died to an axon transport fault mid-compile
        rc |= _run(
            "infer only (swin-base B=64 single-pass)",
            {"BENCH_PRESET": "full", "BENCH_MODE": "infer"},
        )
    if "large" in targets:
        # match bench.py's BENCH_LARGE sub-bench defaults (B=32 attn —
        # B=64+attn OOMs at compile on the 16G chip, 2026-08-19)
        rc |= _run(
            "large train (swin_large B=32 remat=attn)",
            {
                "BENCH_PRESET": "large",
                "BENCH_BATCH": "32",
                "BENCH_REMAT": "attn",
                "BENCH_INFER": "0",
            },
        )
    print("prewarm complete" if rc == 0 else f"prewarm finished rc={rc}", flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
