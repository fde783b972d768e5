#!/usr/bin/env python
"""Validate the spatial-attention VMEM gate against the real compiler.

``_vmem_estimate_spatial`` is a heuristic and the sole availability gate
for the spatial-layout kernel; an underestimate at a new geometry would
surface as a runtime Mosaic VMEM failure instead of a clean XLA fallback
(ADVICE r3).  This script walks every Swin stage geometry x batch preset
that the gate ACCEPTS and actually COMPILES the kernel (forward and
backward) on the attached TPU, reporting pass/fail per case — run it after
touching the kernel, the picker, or the budget.

Run: PYTHONPATH=.:/root/.axon_site python scripts/validate_vmem_gate.py
"""

from __future__ import annotations

import sys
import traceback


def main() -> int:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(__import__("pathlib").Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import jax.numpy as jnp

    from ego_moment_cle_vit_tpu.ops.pallas.window_attention import (
        flash_window_attention_spatial,
        spatial_window_attention_available,
    )
    from ego_moment_cle_vit_tpu.models.swin import _spatial_mm_pack

    if jax.default_backend() != "tpu":
        print("no TPU attached; nothing to validate")
        return 0

    # (hp, wp, C, H) for swin_base and swin_large stages at 224 and 448;
    # dual-view batches for both bench presets
    stages = []
    for embed, heads in ((128, (4, 8, 16, 32)), (192, (6, 12, 24, 48))):
        for img in (224, 448):
            res = img // 4
            for s in range(4):
                stages.append((res >> s, res >> s, embed << s, heads[s]))
    batches = (64, 128)
    ws = 7

    failures = []
    for hp, wp, c, h in sorted(set(stages)):
        hp_p = -(-hp // ws) * ws
        wp_p = -(-wp // ws) * ws
        pack = wp_p // ws
        mm = _spatial_mm_pack(pack)
        if not spatial_window_attention_available(hp_p, wp_p, ws, c, h, pack, mm):
            print(f"SKIP  hp={hp_p:3d} wp={wp_p:3d} C={c:4d} H={h:2d} "
                  f"pack={pack} mm={mm}  (gate refuses)")
            continue
        t = mm * ws * ws
        for b in batches:
            qkv = jnp.zeros((b, hp_p, wp_p, 3 * c), jnp.bfloat16)
            bias = jnp.zeros((h, t, t), jnp.float32)
            mask = jnp.zeros((1, t, t), jnp.float32)

            def fwd(q):
                return jnp.sum(
                    flash_window_attention_spatial(
                        q, bias, mask, h, ws, pack, mm
                    ).astype(jnp.float32)
                )

            for tag, fn in (("fwd", fwd), ("bwd", jax.grad(fwd))):
                try:
                    jax.jit(fn).lower(qkv).compile()
                    print(f"OK    hp={hp_p:3d} wp={wp_p:3d} C={c:4d} H={h:2d} "
                          f"pack={pack} mm={mm} B={b:3d} {tag}", flush=True)
                except Exception as exc:  # noqa: BLE001 — report, keep walking
                    failures.append((hp_p, wp_p, c, h, b, tag, str(exc)[:200]))
                    print(f"FAIL  hp={hp_p:3d} wp={wp_p:3d} C={c:4d} H={h:2d} "
                          f"pack={pack} mm={mm} B={b:3d} {tag}: "
                          f"{str(exc)[:160]}", flush=True)

    if failures:
        print(f"\n{len(failures)} gate-accepted geometries FAILED to compile")
        return 1
    print("\nall gate-accepted geometries compile (fwd+bwd)")
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception:
        traceback.print_exc()
        sys.exit(2)
