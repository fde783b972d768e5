"""Graph-weighted high-order moment pooling heads (Flax).

Capability parity with /root/reference/src/models/moment_head.py:136-322
(MomentHead), moment_head_optimized.py:126-285 (MemoryOptimizedMomentHead)
and moment_head_simple.py:15-164 (SimplifiedMomentHead), unified into one
module with flags instead of three near-duplicate classes:

* ``MomentHead``             — canonical pipeline (normalize graph, weighted
                               mean, centered covariance, Newton–Schulz
                               iSQRT, half-vectorize, MLP; optional 3rd-order
                               Tensor-Sketch branch).
* ``remat=True``             — wraps the iSQRT in ``jax.checkpoint`` (the
                               reference's "memory-optimized" variant uses
                               torch.utils.checkpoint the same way).
* ``SimplifiedMomentHead``   — row-normalized weights, single-matrix NS, and
                               random-projection third order, matching the
                               reference's "simplified" variant semantics but
                               vectorized (no per-sample Python loop).

Divergences (SURVEY.md §7 bug ledger):
* norm='batch' reproduces the reference's BatchNorm1d; the default is
  'layer' because BatchNorm breaks batch-1 inference (ledger #10) and costs
  a cross-device sync in data-parallel training.  Set norm='batch' for
  strict parity.
* The third-order sketch defaults to the FFT-correct estimator
  (``sketch_mode='fft'``); ``'faithful'`` reproduces the reference.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.moments import (
    graph_weighted_covariance,
    graph_weighted_mean,
    degree_weighted_centered_mean,
    half_vectorize,
    half_vectorize_paired,
    isqrt_cov_subspace,
    newton_schulz_isqrt,
)
from ..ops.graph import normalize_graph
from ..ops.sketch import SketchParams, make_sketch_params, effective_sketch_dim, tensor_sketch_3

Dtype = Any


class _Norm(nn.Module):
    """BatchNorm/LayerNorm switch used by the head MLPs."""

    kind: str = "layer"  # 'layer' | 'batch' | 'none'
    axis_name: Optional[str] = None  # cross-device sync axis for batchnorm

    @nn.compact
    def __call__(self, x, *, use_running_average: bool = True):
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=use_running_average,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.axis_name,
                dtype=jnp.float32,
            )(x)
        if self.kind == "layer":
            return nn.LayerNorm(dtype=jnp.float32)(x)
        return x


class MomentHead(nn.Module):
    """Canonical graph-weighted moment pooling head.

    [B, N, D] tokens + [B, N, N] fused graph -> [B, d_out] moment features.
    Pipeline parity: reference moment_head.py:268-322.
    """

    d_in: int
    d_out: int = 512
    use_third_order: bool = False
    isqrt_iterations: int = 3
    sketch_dim: int = 2048
    sketch_mode: str = "fft"  # 'fft' | 'faithful'
    sketch_compact: bool = False  # cap sketch at 2*d_in (reference
    # CompactTensorSketch variant, moment_head_optimized.py:78-123)
    sketch_seed: int = 42
    eps: float = 1e-5
    dropout: float = 0.1
    norm: str = "layer"  # 'layer' | 'batch' (reference parity) | 'none'
    axis_name: Optional[str] = None
    remat: bool = False  # checkpoint the iSQRT (memory-optimized variant)
    use_pallas: bool = True  # VMEM-resident NS kernel when available
    isqrt_subspace: bool = True  # N<D token-subspace NS (exact; ~70x FLOPs cut)
    bf16_params: bool = False  # store the huge vech projection in bf16
    # (fp32 master kept by the optimizer — train.state.master_weights);
    # halves every HBM sweep of the ~269M-param second_proj kernel
    dtype: Dtype = jnp.float32

    @property
    def d_second(self) -> int:
        return self.d_out // 2 if self.use_third_order else self.d_out

    @property
    def d_third(self) -> int:
        return self.d_out - self.d_second if self.use_third_order else 0

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,
        graph: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        # 1) symmetric degree normalization  W = D^{-1/2} G D^{-1/2}
        w = normalize_graph(graph, "symmetric", eps=self.eps)
        # 2-4) weighted mean, centering, graph-weighted tokens W Zc
        mu = graph_weighted_mean(tokens, w, eps=self.eps)
        centered = tokens - mu[:, None, :]
        weighted = jnp.einsum(
            "bnm,bmd->bnd", w, centered, preferred_element_type=jnp.float32
        ).astype(tokens.dtype)

        # 5) iSQRT-COV of M2 = Zc^T W Zc (fp32 inside).  When N < D (every
        # flagship config: Swin N=49 vs D>=1024) the NS iterates collapse
        # into the N-dim token subspace — M2 is never even materialized and
        # the O(B k D^3) matmul chain becomes O(B(N^2 D + k N^3)); see
        # ops.moments.isqrt_cov_subspace.  Dense fallback keeps the
        # VMEM-resident Pallas kernel / XLA path for N >= D.
        n_tok, d_tok = tokens.shape[-2], tokens.shape[-1]
        if self.isqrt_subspace and n_tok < d_tok:
            isqrt_fn = lambda c, v: isqrt_cov_subspace(
                c, v, self.isqrt_iterations, self.eps
            )
        else:
            ns = None
            if self.use_pallas:
                from ..ops.pallas import (
                    newton_schulz_available,
                    newton_schulz_isqrt_pallas,
                )
                from ..ops.pallas.newton_schulz import newton_schulz_fits
                from ..parallel.shard_kernels import maybe_shard_map_batch

                kern = lambda m: newton_schulz_isqrt_pallas(
                    m, self.isqrt_iterations, self.eps
                )
                if newton_schulz_available(d_tok):
                    ns = kern
                elif newton_schulz_fits(d_tok):
                    # multi-device mesh: per-shard kernel via shard_map
                    # (parallel.shard_kernels)
                    ns = maybe_shard_map_batch(
                        kern, tokens.shape[0], (True,)
                    )
            if ns is None:
                ns = lambda m: newton_schulz_isqrt(
                    m, num_iterations=self.isqrt_iterations, eps=self.eps
                )

            def isqrt_fn(c, v, _ns=ns):
                m2 = jnp.einsum(
                    "bnd,bne->bde",
                    c.astype(jnp.float32),
                    v.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                ).astype(c.dtype)
                return _ns(m2)

        if self.remat:
            isqrt_fn = jax.checkpoint(isqrt_fn)
        m2_normalized = isqrt_fn(centered, weighted)

        # 6) half-vectorize upper triangle -> [B, D(D+1)/2].  Paired packing:
        # O(1) tensor ops (the row-major packing needs gathers or a D-way
        # concat — both pathological on TPU).  The ordering is a fixed
        # permutation of the reference's vech; second_proj kernel rows from
        # reference checkpoints convert via ops.moments.paired_vech_permutation.
        m2_vec = half_vectorize_paired(m2_normalized).astype(self.dtype)

        # 7) second-order projection: Linear -> Norm -> GELU -> Dropout
        x = nn.Dense(
            self.d_second,
            dtype=self.dtype,
            param_dtype=jnp.bfloat16 if self.bf16_params else jnp.float32,
            name="second_proj",
        )(m2_vec)
        x = _Norm(self.norm, self.axis_name, name="second_norm")(
            x, use_running_average=deterministic
        )
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        features = [x]

        # 8) optional third-order branch
        if self.use_third_order:
            sketch_params = self._sketch_params()
            weighted_centered = degree_weighted_centered_mean(
                centered, w, eps=self.eps
            )
            third = tensor_sketch_3(
                weighted_centered, sketch_params, mode=self.sketch_mode
            ).astype(self.dtype)
            y = nn.Dense(self.d_third, dtype=self.dtype, name="third_proj")(third)
            y = _Norm(self.norm, self.axis_name, name="third_norm")(
                y, use_running_average=deterministic
            )
            y = nn.gelu(y, approximate=False)
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            features.append(y)

        return jnp.concatenate(features, axis=-1)

    def _sketch_params(self) -> SketchParams:
        """Fixed (non-trainable) count-sketch matrices, stored as a
        'constants' collection so they ride checkpoints but take no grads."""
        cap = 2 if self.sketch_compact else 4
        k = effective_sketch_dim(self.d_in, self.sketch_dim, cap)

        def init():
            return make_sketch_params(
                jax.random.PRNGKey(self.sketch_seed),
                self.d_in,
                self.sketch_dim,
                cap,
            ).matrices

        mats = self.variable("constants", "sketch_matrices", init)
        return SketchParams(
            matrices=mats.value, input_dim=self.d_in, sketch_dim=k
        )


class SimplifiedMomentHead(nn.Module):
    """Lightweight variant: row-normalized weights (W = G / degree), single
    -matrix Newton–Schulz, random-projection third order, no norm layers.

    Semantics parity with reference moment_head_simple.py:15-164, but fully
    vectorized (the reference loops over the batch in Python :117-124).
    """

    d_in: int
    d_out: int = 512
    use_third_order: bool = False
    isqrt_iterations: int = 3
    eps: float = 1e-5
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,
        graph: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        d_second = self.d_out // 2 if self.use_third_order else self.d_out
        d_third = self.d_out - d_second

        # Row normalization: W = G / rowsum(G)  (simple variant :103-105)
        w = normalize_graph(graph, "random_walk", eps=self.eps)
        mu = graph_weighted_mean(tokens, w, eps=self.eps)
        m2, centered = graph_weighted_covariance(tokens, w, mean=mu, eps=self.eps)

        # Single-matrix NS iteration (no Z coupling): Y <- 0.5 Y (3I - Y^2)
        # on the trace-normalized matrix, then de-normalize by sqrt(trace).
        m32 = m2.astype(jnp.float32)
        dim = m32.shape[-1]
        trace = jnp.trace(m32, axis1=-2, axis2=-1)[..., None, None]
        a = m32 / (trace + self.eps)
        eye = jnp.eye(dim, dtype=jnp.float32)
        y = a
        for _ in range(self.isqrt_iterations):
            y2 = jnp.matmul(y, y, preferred_element_type=jnp.float32)
            y = 0.5 * jnp.matmul(y, 3.0 * eye - y2, preferred_element_type=jnp.float32)
        sqrt_m = (y * jnp.sqrt(trace + self.eps)).astype(self.dtype)

        m2_vec = half_vectorize(sqrt_m)
        x = nn.Dense(d_second, dtype=self.dtype, name="second_proj")(m2_vec)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        features = [x]

        if self.use_third_order:
            # random projection + elementwise cube (simple variant :150-162)
            pooled = degree_weighted_centered_mean(centered, w, eps=self.eps)
            proj = nn.Dense(d_third, use_bias=False, dtype=self.dtype, name="third_rp")(
                pooled
            )
            y3 = proj**3
            y3 = nn.Dropout(self.dropout)(y3, deterministic=deterministic)
            features.append(y3)

        return jnp.concatenate(features, axis=-1)
