"""Graph Polynomial Fusion Flax modules.

Parameter-holding wrappers over :mod:`..ops.graph`.  Capability parity with
/root/reference/src/models/gpf_kernel.py:15-217 (GraphPolynomialFusion and
the AdaptiveGraphPolynomialFusion subclass).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.graph import gpf_fuse, token_similarity_graph

Dtype = Any


def _init_coefficients(init_method: str, degree_p: int, degree_q: int):
    """Raw-coefficient initializers matching reference gpf_kernel.py:58-73."""
    shape = (degree_p + 1, degree_q + 1)

    def init(key, _shape=shape, dtype=jnp.float32):
        if init_method == "uniform":
            return jax.random.uniform(key, _shape, dtype, 0.0, 0.1)
        if init_method == "xavier":
            # xavier_uniform over a [P+1, Q+1] "weight": U(-a, a),
            # a = sqrt(6 / (fan_in + fan_out))
            a = (6.0 / (shape[0] + shape[1])) ** 0.5
            return jax.random.uniform(key, _shape, dtype, -a, a)
        if init_method == "identity":
            base = jnp.full(_shape, 0.01, dtype)
            base = base.at[0, 0].set(0.5)
            if degree_p >= 1 and degree_q >= 1:
                base = base.at[1, 1].set(0.5)
            return base
        raise ValueError(f"Unknown initialization method: {init_method}")

    return init


class GraphPolynomialFusion(nn.Module):
    """Learnable polynomial fusion of dual-view similarity graphs.

    G = sum_pq softplus(alpha_pq) * R_a^{.p} ⊙ R_p^{.q}, symmetrized and
    clamped >= 0 (reference gpf_kernel.py:117-159).
    """

    degree_p: int = 2
    degree_q: int = 2
    similarity: str = "cosine"
    eps: float = 1e-6
    symmetric_enforce: bool = True
    coeff_init: str = "uniform"
    use_pallas: bool = True  # use the fused TPU kernel when available

    @nn.compact
    def __call__(
        self, tokens_anchor: jnp.ndarray, tokens_positive: jnp.ndarray
    ) -> jnp.ndarray:
        alpha = self.param(
            "alpha_coeffs",
            _init_coefficients(self.coeff_init, self.degree_p, self.degree_q),
        )
        coeffs = jax.nn.softplus(alpha)

        if self.use_pallas:
            from ..ops.pallas import fused_gpf_available, fused_gpf_pallas
            from ..ops.pallas.gpf import fused_gpf_fits
            from ..parallel.shard_kernels import maybe_shard_map_batch

            b, n, d = tokens_anchor.shape

            def kernel(a, p, c):
                return fused_gpf_pallas(
                    a, p, c, self.similarity, self.eps, self.symmetric_enforce
                )

            if fused_gpf_available(n, d):
                return kernel(tokens_anchor, tokens_positive, coeffs)
            if fused_gpf_fits(n, d):
                # multi-device mesh: each shard runs the kernel on its local
                # batch block via shard_map (parallel.shard_kernels); the
                # replicated coeffs' grad psums over the data axis — same
                # reduction XLA autodiff performs on the fallback path
                wrapped = maybe_shard_map_batch(kernel, b, (True, True, False))
                if wrapped is not None:
                    return wrapped(tokens_anchor, tokens_positive, coeffs)

        r_a = token_similarity_graph(tokens_anchor, self.similarity, self.eps)
        r_p = token_similarity_graph(tokens_positive, self.similarity, self.eps)
        return gpf_fuse(
            r_a, r_p, coeffs, symmetric_enforce=self.symmetric_enforce
        )

    @staticmethod
    def coefficient_matrix(params) -> jnp.ndarray:
        """A_pq = softplus(alpha_pq) (reference gpf_kernel.py:161-163)."""
        return jax.nn.softplus(params["alpha_coeffs"])

    @staticmethod
    def sparsity_loss(params, lambda_sparse: float = 0.01) -> jnp.ndarray:
        """L1 penalty on the nonneg coefficients (gpf_kernel.py:165-176)."""
        coeffs = jax.nn.softplus(params["alpha_coeffs"])
        return lambda_sparse * jnp.sum(jnp.abs(coeffs))


class AdaptiveGraphPolynomialFusion(nn.Module):
    """Adaptive-coefficient GPF.

    The reference declares 'global' / 'spatial' / 'attention' variants but
    only 'global' is implemented (its forward falls through to the base class
    for the rest; gpf_kernel.py:211-217).  Here all three are real:
    'global' matches the base module; 'attention' modulates the coefficients
    per sample from the pooled token statistics of both views; 'spatial'
    learns a per-token-position coefficient delta table (the "separate
    coefficients for each spatial position" the reference's docstring
    promises, gpf_kernel.py:181-182,206-209).

    Dispatch note: the adaptive variants do NOT use the fused GPF Pallas
    kernel (its coefficients are a single [P+1, Q+1] table); 'attention'
    vmaps the per-sample fusion and 'spatial' runs the row-modulated
    polynomial in XLA.  See docs/PERFORMANCE.md.
    """

    degree_p: int = 2
    degree_q: int = 2
    similarity: str = "cosine"
    eps: float = 1e-6
    symmetric_enforce: bool = True
    coeff_init: str = "uniform"
    adaptive_type: str = "global"  # 'global' | 'spatial' | 'attention'

    @nn.compact
    def __call__(
        self, tokens_anchor: jnp.ndarray, tokens_positive: jnp.ndarray
    ) -> jnp.ndarray:
        num_terms = (self.degree_p + 1) * (self.degree_q + 1)
        alpha = self.param(
            "alpha_coeffs",
            _init_coefficients(self.coeff_init, self.degree_p, self.degree_q),
        )
        r_a = token_similarity_graph(tokens_anchor, self.similarity, self.eps)
        r_p = token_similarity_graph(tokens_positive, self.similarity, self.eps)

        if self.adaptive_type == "attention":
            # Per-sample modulation: delta_pq(b) from pooled dual-view stats.
            pooled = jnp.concatenate(
                [jnp.mean(tokens_anchor, axis=1), jnp.mean(tokens_positive, axis=1)],
                axis=-1,
            )  # [B, 2D]
            delta = nn.Dense(num_terms, name="coeff_mod")(pooled)  # [B, terms]
            delta = delta.reshape(-1, self.degree_p + 1, self.degree_q + 1)
            coeffs = jax.nn.softplus(alpha[None] + 0.1 * delta)  # [B, P+1, Q+1]
            # vmap the static-coefficient fusion over per-sample coefficients
            fuse = lambda ra, rp, c: gpf_fuse(
                ra[None], rp[None], c, symmetric_enforce=self.symmetric_enforce
            )[0]
            return jax.vmap(fuse)(r_a, r_p, coeffs)

        if self.adaptive_type == "spatial":
            # Per-token-position coefficients: c_pq(i) = softplus(alpha_pq
            # + 0.1 * delta[i, pq]) modulates the polynomial along the row
            # (query-token) axis; the row/column asymmetry this introduces
            # is folded back by the symmetrize step.  Running Hadamard
            # powers as in gpf_fuse — no [B, terms, N, N] materialization,
            # just (P+1)(Q+1) fused multiply-adds with a row-broadcast
            # coefficient vector.
            n = tokens_anchor.shape[1]
            delta = self.param(
                "spatial_coeffs",
                nn.initializers.zeros,
                (n, self.degree_p + 1, self.degree_q + 1),
            )
            coeffs = jax.nn.softplus(alpha[None] + 0.1 * delta)  # [N, P+1, Q+1]
            ra_c = jnp.maximum(r_a, 0.0)
            rp_c = jnp.maximum(r_p, 0.0)
            fused = jnp.zeros_like(r_a)
            ra_pow = jnp.ones_like(r_a)
            for p in range(self.degree_p + 1):
                rp_pow = jnp.ones_like(r_p)
                for q in range(self.degree_q + 1):
                    fused = fused + coeffs[None, :, None, p, q] * (ra_pow * rp_pow)
                    rp_pow = rp_pow * (r_p if q == 0 else rp_c)
                ra_pow = ra_pow * (r_a if p == 0 else ra_c)
            if self.symmetric_enforce:
                fused = 0.5 * (fused + jnp.swapaxes(fused, -1, -2))
            return jnp.maximum(fused, 0.0)

        if self.adaptive_type != "global":
            raise ValueError(
                f"Unknown adaptive_type: {self.adaptive_type!r} "
                "(expected 'global', 'spatial', or 'attention')"
            )
        coeffs = jax.nn.softplus(alpha)
        return gpf_fuse(r_a, r_p, coeffs, symmetric_enforce=self.symmetric_enforce)
