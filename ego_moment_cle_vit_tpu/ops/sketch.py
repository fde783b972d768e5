"""Tensor-Sketch third-order moment approximation.

Capability parity with the reference TensorSketch
(/root/reference/src/models/moment_head.py:73-133), with two deliberate
divergences, both documented in SURVEY.md §7 ("bug ledger"):

1. **OOB fix** — the reference draws hash indices in ``[0, sketch_dim)`` using
   the *argument* while sizing the output with ``min(sketch_dim, 4*d_in)``,
   which makes ``scatter_add_`` go out of bounds whenever ``4*d_in <
   sketch_dim`` (moment_head.py:85 vs :91-93).  Here hashes are always drawn
   in ``[0, effective_sketch_dim)``.
2. **FFT-correct mode (default)** — true Tensor-Sketch convolves the
   count-sketches in the FFT domain (Pham & Pagh 2013); the reference takes a
   plain elementwise product (moment_head.py:125-131).  ``mode='fft'`` is the
   correct estimator; ``mode='faithful'`` reproduces the reference.

TPU note: there is no fast scatter-add path on TPU, so the count-sketch is
recast as a dense one-hot matmul ``x_signed @ S`` with a precomputed
[D, K] sketch matrix — an MXU-native op.  For D=768, K=3072 the three sketch
matrices are ~28 MB fp32 of *constant* weights in HBM, and the per-step cost
is three [B, D] x [D, K] matmuls, negligible next to the backbone.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SketchParams(NamedTuple):
    """Fixed (non-trainable) count-sketch hash state.

    ``matrices``: [3, D, K] dense one-hot sign matrices S_i with
    S_i[d, h_i(d)] = s_i(d) and zeros elsewhere.
    """

    matrices: jnp.ndarray  # [3, D, K] float32
    input_dim: int
    sketch_dim: int


def effective_sketch_dim(
    input_dim: int, sketch_dim: int, cap_ratio: int = 4
) -> int:
    """Cap the sketch dimension at cap_ratio*D — 4 as the canonical head does
    (moment_head.py:85), 2 for the reference's CompactTensorSketch variant
    (moment_head_optimized.py:78-123) — then round up to a lane-aligned
    multiple of 128 so the one-hot matmul tiles cleanly onto the MXU."""
    k = min(sketch_dim, input_dim * cap_ratio)
    return ((k + 127) // 128) * 128


def make_sketch_params(
    key: jax.Array, input_dim: int, sketch_dim: int = 2048, cap_ratio: int = 4
) -> SketchParams:
    """Draw the three hash/sign pairs and materialize dense sketch matrices.

    The reference fixes its hashes with ``torch.manual_seed(42)``
    (moment_head.py:88-98); we fix them with an explicit JAX PRNG key so the
    sketch is deterministic given the key.  (Exact RNG-stream parity with
    torch is impossible and not required — parity tests fix the hash tensors,
    not the seeds.)
    """
    k = effective_sketch_dim(input_dim, sketch_dim, cap_ratio)
    keys = jax.random.split(key, 6)
    mats = []
    for i in range(3):
        hashes = jax.random.randint(keys[2 * i], (input_dim,), 0, k)
        signs = jax.random.randint(keys[2 * i + 1], (input_dim,), 0, 2) * 2 - 1
        onehot = jax.nn.one_hot(hashes, k, dtype=jnp.float32)
        mats.append(onehot * signs[:, None].astype(jnp.float32))
    return SketchParams(
        matrices=jnp.stack(mats), input_dim=input_dim, sketch_dim=k
    )


def sketch_params_from_hashes(
    hashes: jnp.ndarray, signs: jnp.ndarray, sketch_dim: int
) -> SketchParams:
    """Build SketchParams from explicit hash/sign tensors ([3, D] each) —
    used for checkpoint conversion and golden-parity tests."""
    input_dim = hashes.shape[-1]
    onehot = jax.nn.one_hot(hashes, sketch_dim, dtype=jnp.float32)  # [3, D, K]
    mats = onehot * signs[..., None].astype(jnp.float32)
    return SketchParams(matrices=mats, input_dim=input_dim, sketch_dim=sketch_dim)


def count_sketch(x: jnp.ndarray, sketch_matrix: jnp.ndarray) -> jnp.ndarray:
    """Count-sketch of x: [..., D] @ [D, K] -> [..., K].

    Equivalent to the reference's sign-multiply + scatter_add_
    (moment_head.py:100-112) but expressed as an MXU matmul.
    """
    return jnp.matmul(
        x.astype(jnp.float32), sketch_matrix, preferred_element_type=jnp.float32
    )


def tensor_sketch_3(
    x: jnp.ndarray, params: SketchParams, mode: str = "fft"
) -> jnp.ndarray:
    """Approximate the third-order moment features of x ([..., D] -> [..., K]).

    mode='fft'       IFFT(FFT(s1) * FFT(s2) * FFT(s3)).real — the correct
                     Tensor-Sketch estimator of <x⊗x⊗x, ·>.
    mode='faithful'  s1 * s2 * s3 elementwise, bit-matching the reference
                     estimator (moment_head.py:125-131).
    """
    in_dtype = x.dtype
    s1 = count_sketch(x, params.matrices[0])
    s2 = count_sketch(x, params.matrices[1])
    s3 = count_sketch(x, params.matrices[2])
    if mode == "faithful":
        out = s1 * s2 * s3
    elif mode == "fft":
        f = jnp.fft.rfft(s1, axis=-1) * jnp.fft.rfft(s2, axis=-1) * jnp.fft.rfft(
            s3, axis=-1
        )
        out = jnp.fft.irfft(f, n=params.sketch_dim, axis=-1)
    else:
        raise ValueError(f"Unknown tensor-sketch mode: {mode}")
    return out.astype(in_dtype)
