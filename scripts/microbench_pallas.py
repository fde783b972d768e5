#!/usr/bin/env python
"""Microbenchmark: Pallas kernels + subspace ops vs pure-XLA for the hot
pipeline ops on the real TPU chip.  Prints a small table; used to validate
the dispatch thresholds in ops/pallas and the moment-head iSQRT gate.

Covers (each with correctness cross-check on device):
* GPF forward: fused Pallas kernel vs XLA composition
* GPF TRAIN-MODE round trip (forward + backward): fused analytic-VJP
  kernel pair vs XLA autodiff
* Newton-Schulz iSQRT: VMEM kernel (fp32 D<=800, bf16 D=1024) vs XLA
* iSQRT-COV at flagship shapes: token-subspace form vs dense NS

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_pallas.py
"""

from __future__ import annotations

import time

import numpy as np


def timeit_scalar(fn, *args, iters=20):
    """fn must return a scalar; host fetch is the only reliable axon fence."""
    out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


if __name__ == "__main__":
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(__import__("pathlib").Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import jax.numpy as jnp

    from ego_moment_cle_vit_tpu.ops import (
        gpf_fuse,
        newton_schulz_isqrt,
        token_similarity_graph,
    )
    from ego_moment_cle_vit_tpu.ops.moments import isqrt_cov_subspace
    from ego_moment_cle_vit_tpu.ops.pallas import (
        fused_gpf_pallas,
        newton_schulz_isqrt_pallas,
    )

    print(f"backend: {jax.default_backend()} {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    def gpf_xla(a, p, c):
        return gpf_fuse(
            token_similarity_graph(a, "cosine"),
            token_similarity_graph(p, "cosine"),
            c,
        )

    def gpf_pls(a, p, c):
        return fused_gpf_pallas(a, p, c, "cosine", 1e-6, True)

    for b, n, d in ((16, 196, 384), (16, 196, 768), (16, 49, 1024)):
        ta = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
        tp = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
        coeffs = jnp.asarray(rng.uniform(0, 1, (3, 3)).astype(np.float32))

        # --- forward ---
        f_xla = jax.jit(lambda a, p, c: jnp.sum(gpf_xla(a, p, c)))
        f_pls = jax.jit(lambda a, p, c: jnp.sum(gpf_pls(a, p, c)))
        t_xla = timeit_scalar(f_xla, ta, tp, coeffs)
        t_pls = timeit_scalar(f_pls, ta, tp, coeffs)
        diff = float(
            jnp.max(
                jnp.abs(
                    jax.jit(gpf_xla)(ta, tp, coeffs)
                    - jax.jit(gpf_pls)(ta, tp, coeffs)
                )
            )
        )
        print(
            f"GPF fwd   B{b} N{n} D{d}:  xla {t_xla:7.3f} ms   pallas {t_pls:7.3f} ms "
            f"  speedup {t_xla / t_pls:4.2f}x   maxdiff {diff:.2e}",
            flush=True,
        )

        # --- train-mode round trip (forward + backward) ---
        def loss_xla(a, p, c):
            return jnp.sum(gpf_xla(a, p, c) ** 2)

        def loss_pls(a, p, c):
            return jnp.sum(gpf_pls(a, p, c) ** 2)

        g_xla = jax.jit(
            lambda a, p, c: sum(
                jnp.sum(x) for x in jax.grad(loss_xla, argnums=(0, 1, 2))(a, p, c)
            )
        )
        g_pls = jax.jit(
            lambda a, p, c: sum(
                jnp.sum(x) for x in jax.grad(loss_pls, argnums=(0, 1, 2))(a, p, c)
            )
        )
        t_xla = timeit_scalar(g_xla, ta, tp, coeffs)
        t_pls = timeit_scalar(g_pls, ta, tp, coeffs)
        diff = float(jnp.abs(g_xla(ta, tp, coeffs) - g_pls(ta, tp, coeffs)))
        print(
            f"GPF f+b   B{b} N{n} D{d}:  xla {t_xla:7.3f} ms   pallas {t_pls:7.3f} ms "
            f"  speedup {t_xla / t_pls:4.2f}x   graddiff {diff:.2e}",
            flush=True,
        )

    for b, d in ((16, 384), (16, 768), (16, 1024)):
        a = rng.standard_normal((b, d, 64)).astype(np.float32)
        m = jnp.asarray(
            a @ a.transpose(0, 2, 1) / 64 + 0.5 * np.eye(d, dtype=np.float32)
        )
        f_xla = jax.jit(
            lambda x: jnp.sum(newton_schulz_isqrt(x, 5, assume_symmetric=True))
        )
        f_pls = jax.jit(lambda x: jnp.sum(newton_schulz_isqrt_pallas(x, 5, 1e-5)))
        t_xla = timeit_scalar(f_xla, m)
        t_pls = timeit_scalar(f_pls, m)
        diff = float(jnp.abs(f_xla(m) - f_pls(m))) / (d * d * b)
        kind = "fp32" if d <= 800 else "bf16"
        print(
            f"NS5 {kind}  B{b} D{d}:      xla {t_xla:7.3f} ms   pallas {t_pls:7.3f} ms "
            f"  speedup {t_xla / t_pls:4.2f}x   meandiff {diff:.2e}",
            flush=True,
        )

    # flagship iSQRT-COV: subspace vs dense (fwd and train-mode round trip)
    for b, n, d in ((16, 49, 1024), (16, 196, 768), (64, 49, 1024)):
        c = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
        w0 = rng.standard_normal((b, n, n)).astype(np.float32)
        w = jnp.asarray(np.abs(w0 @ w0.transpose(0, 2, 1)))

        def dense(c):
            wc = jnp.einsum("bnm,bmd->bnd", w, c)
            m2 = jnp.einsum("bnd,bne->bde", c, wc)
            return newton_schulz_isqrt(m2, 5, assume_symmetric=True)

        def sub(c):
            wc = jnp.einsum("bnm,bmd->bnd", w, c)
            return isqrt_cov_subspace(c, wc, 5)

        f_dense = jax.jit(lambda c: jnp.sum(dense(c)))
        f_sub = jax.jit(lambda c: jnp.sum(sub(c)))
        t_dense = timeit_scalar(f_dense, c)
        t_sub = timeit_scalar(f_sub, c)
        g_dense = jax.jit(jax.grad(lambda c: jnp.sum(dense(c) ** 2)))
        g_sub = jax.jit(jax.grad(lambda c: jnp.sum(sub(c) ** 2)))
        tg_dense = timeit_scalar(lambda c: jnp.sum(g_dense(c)), c)
        tg_sub = timeit_scalar(lambda c: jnp.sum(g_sub(c)), c)
        diff = float(jnp.abs(f_dense(c) - f_sub(c))) / (d * d * b)
        print(
            f"iSQRT-COV B{b} N{n} D{d}: dense {t_dense:7.3f} ms  subspace {t_sub:7.3f} ms "
            f" ({t_dense / t_sub:5.2f}x) | f+b dense {tg_dense:7.3f} ms  subspace "
            f"{tg_sub:7.3f} ms ({tg_dense / tg_sub:5.2f}x)  meandiff {diff:.2e}",
            flush=True,
        )

    # flash window attention: fused kernel vs the XLA einsum/softmax chain
    # (flagship Swin-Base stage shapes at dual-view batch 64)
    from ego_moment_cle_vit_tpu.ops.pallas import flash_window_attention

    def wa_xla(qkv, bias, mask, h):
        b_, w_, t_, c3 = qkv.shape
        c_ = c3 // 3
        d_ = c_ // h
        q, k, v = [
            qkv[..., i * c_ : (i + 1) * c_]
            .astype(jnp.float32)
            .reshape(b_, w_, t_, h, d_)
            for i in range(3)
        ]
        logits = jnp.einsum("bwthd,bwshd->bwhts", q * d_**-0.5, k)
        logits = logits + bias[None, None] + mask[None, :, None]
        p = jax.nn.softmax(logits, -1)
        out = jnp.einsum("bwhts,bwshd->bwthd", p, v).reshape(b_, w_, t_, c_)
        return out.astype(qkv.dtype)

    for tag, b, w, t, c, h in (
        ("stage0", 64, 32, 98, 128, 4),
        ("stage2", 64, 2, 98, 512, 16),
        ("stage3", 64, 1, 49, 1024, 32),
    ):
        qkv = jnp.asarray(
            rng.standard_normal((b, w, t, 3 * c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        bias = jnp.asarray(rng.standard_normal((h, t, t)).astype(np.float32)) * 0.1
        mask = jnp.zeros((1, t, t), jnp.float32)

        f_x = jax.jit(lambda q: jnp.sum(wa_xla(q, bias, mask, h).astype(jnp.float32)))
        f_p = jax.jit(
            lambda q: jnp.sum(
                flash_window_attention(q, bias, mask, h).astype(jnp.float32)
            )
        )
        t_x = timeit_scalar(f_x, qkv)
        t_p = timeit_scalar(f_p, qkv)
        g_x = jax.jit(jax.grad(lambda q: f_x(q).astype(jnp.float32)))
        g_p = jax.jit(jax.grad(lambda q: f_p(q).astype(jnp.float32)))
        tg_x = timeit_scalar(lambda q: jnp.sum(g_x(q).astype(jnp.float32)), qkv)
        tg_p = timeit_scalar(lambda q: jnp.sum(g_p(q).astype(jnp.float32)), qkv)
        diff = float(jnp.abs(f_x(qkv) - f_p(qkv))) / (b * w * t * c)
        print(
            f"WINATTN {tag} B{b} W{w} T{t} C{c} H{h}: fwd xla {t_x:7.3f} ms  pallas "
            f"{t_p:7.3f} ms ({t_x / t_p:4.2f}x) | f+b xla {tg_x:7.3f} ms  pallas "
            f"{tg_p:7.3f} ms ({tg_x / tg_p:4.2f}x)  meandiff {diff:.2e}",
            flush=True,
        )

    # q-tiled flash attention: long-sequence ViT shapes the whole-[T,T]
    # window kernel cannot hold (T=785 = ViT-L/16 at 448, BASELINE
    # configs[4]) vs the XLA einsum/softmax chain
    from ego_moment_cle_vit_tpu.ops.pallas import flash_attention_tiled

    def fa_xla(qkv, h):
        b_, n_, c3 = qkv.shape
        c_ = c3 // 3
        d_ = c_ // h
        q, k, v = [
            qkv[..., i * c_ : (i + 1) * c_]
            .astype(jnp.float32)
            .reshape(b_, n_, h, d_)
            for i in range(3)
        ]
        logits = jnp.einsum("bthd,bshd->bhts", q * d_**-0.5, k)
        p = jax.nn.softmax(logits, -1)
        out = jnp.einsum("bhts,bshd->bthd", p, v).reshape(b_, n_, c_)
        return out.astype(qkv.dtype)

    for tag, b, n, c, h in (
        ("vit224", 64, 197, 768, 12),
        ("vitL448", 8, 785, 1024, 16),
    ):
        qkv = jnp.asarray(
            rng.standard_normal((b, n, 3 * c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        f_x = jax.jit(lambda q: jnp.sum(fa_xla(q, h).astype(jnp.float32)))
        f_p = jax.jit(
            lambda q: jnp.sum(flash_attention_tiled(q, h).astype(jnp.float32))
        )
        t_x = timeit_scalar(f_x, qkv)
        t_p = timeit_scalar(f_p, qkv)
        g_x = jax.jit(jax.grad(lambda q: f_x(q).astype(jnp.float32)))
        g_p = jax.jit(jax.grad(lambda q: f_p(q).astype(jnp.float32)))
        tg_x = timeit_scalar(lambda q: jnp.sum(g_x(q).astype(jnp.float32)), qkv)
        tg_p = timeit_scalar(lambda q: jnp.sum(g_p(q).astype(jnp.float32)), qkv)
        diff = float(jnp.abs(f_x(qkv) - f_p(qkv))) / (b * n * c)
        print(
            f"FLASHTILED {tag} B{b} T{n} C{c} H{h}: fwd xla {t_x:7.3f} ms  pallas "
            f"{t_p:7.3f} ms ({t_x / t_p:4.2f}x) | f+b xla {tg_x:7.3f} ms  pallas "
            f"{tg_p:7.3f} ms ({tg_x / tg_p:4.2f}x)  meandiff {diff:.2e}",
            flush=True,
        )
