"""Unit tests for the graph ops core, with independent numpy golden models.

Golden models are written directly from the math (not from the reference
code); tolerances are float32-level.  Reference behaviors covered:
gpf_kernel.py similarity/fusion semantics, utils/ops.py graph helpers.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ego_moment_cle_vit_tpu.ops import (
    cosine_similarity_graph,
    dot_similarity_graph,
    hadamard_power,
    gpf_fuse,
    symmetrize,
    normalize_graph,
    batch_trace,
    batch_logdet,
    compute_graph_statistics,
    cosine_similarity_matrix,
)

B, N, D = 2, 12, 16


def _np_cosine_graph(tokens, eps=1e-6):
    norm = np.sqrt((tokens**2).sum(-1, keepdims=True))
    t = tokens / np.maximum(norm, eps)
    return t @ t.transpose(0, 2, 1)


def _np_gpf(ra, rp, coeffs, symmetric=True):
    P, Q = coeffs.shape[0] - 1, coeffs.shape[1] - 1
    out = np.zeros_like(ra)

    def hpow(m, p):
        if p == 0:
            return np.ones_like(m)
        if p == 1:
            return m
        return np.clip(m, 0.0, None) ** p

    for p in range(P + 1):
        for q in range(Q + 1):
            out = out + coeffs[p, q] * hpow(ra, p) * hpow(rp, q)
    if symmetric:
        out = 0.5 * (out + out.transpose(0, 2, 1))
    return np.clip(out, 0.0, None)


@pytest.fixture
def tokens(rng):
    return rng.standard_normal((B, N, D)).astype(np.float32)


def test_cosine_graph_matches_numpy(tokens):
    got = np.asarray(cosine_similarity_graph(jnp.asarray(tokens)))
    want = _np_cosine_graph(tokens)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # diagonal of a cosine Gram is 1
    np.testing.assert_allclose(
        np.diagonal(got, axis1=1, axis2=2), 1.0, atol=1e-5
    )


def test_dot_graph_matches_numpy(tokens):
    got = np.asarray(dot_similarity_graph(jnp.asarray(tokens)))
    want = tokens @ tokens.transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_hadamard_power_conventions(rng):
    m = rng.standard_normal((B, N, N)).astype(np.float32)
    jm = jnp.asarray(m)
    np.testing.assert_allclose(np.asarray(hadamard_power(jm, 0)), 1.0)
    np.testing.assert_allclose(np.asarray(hadamard_power(jm, 1)), m)
    # p >= 2 clamps first (reference gpf_kernel.py:113-115)
    np.testing.assert_allclose(
        np.asarray(hadamard_power(jm, 3)),
        np.clip(m, 0, None) ** 3,
        atol=1e-5,
    )


@pytest.mark.parametrize("P,Q", [(2, 2), (1, 1), (3, 2), (0, 0)])
def test_gpf_fuse_matches_golden(rng, P, Q):
    ra = rng.standard_normal((B, N, N)).astype(np.float32)
    rp = rng.standard_normal((B, N, N)).astype(np.float32)
    coeffs = rng.uniform(0.0, 1.0, (P + 1, Q + 1)).astype(np.float32)
    got = np.asarray(gpf_fuse(jnp.asarray(ra), jnp.asarray(rp), jnp.asarray(coeffs)))
    want = _np_gpf(ra, rp, coeffs)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_gpf_fused_graph_is_symmetric_psd_on_cosine_inputs(tokens, rng):
    """With cosine Gram inputs and nonneg coeffs the fused graph must be
    symmetric; eigenvalues bounded below near 0 (clamped)."""
    ra = cosine_similarity_graph(jnp.asarray(tokens))
    rp = cosine_similarity_graph(jnp.asarray(tokens[:, ::-1]))
    coeffs = jnp.asarray(rng.uniform(0, 0.5, (3, 3)).astype(np.float32))
    g = np.asarray(gpf_fuse(ra, rp, coeffs))
    np.testing.assert_allclose(g, g.transpose(0, 2, 1), atol=1e-5)
    assert g.min() >= 0.0


def test_normalize_graph_symmetric(rng):
    g = np.abs(rng.standard_normal((B, N, N))).astype(np.float32)
    g = 0.5 * (g + g.transpose(0, 2, 1))
    got = np.asarray(normalize_graph(jnp.asarray(g), "symmetric"))
    deg = g.sum(-1)
    inv = 1.0 / np.sqrt(np.maximum(deg, 1e-8))
    want = g * inv[:, :, None] * inv[:, None, :]
    np.testing.assert_allclose(got, want, atol=1e-5)
    # random-walk rows sum to ~1
    rw = np.asarray(normalize_graph(jnp.asarray(g), "random_walk"))
    np.testing.assert_allclose(rw.sum(-1), 1.0, atol=1e-4)


def test_batch_trace_and_logdet(rng):
    a = rng.standard_normal((B, 8, 8)).astype(np.float32)
    psd = a @ a.transpose(0, 2, 1) + 0.5 * np.eye(8, dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(batch_trace(jnp.asarray(psd))),
        np.trace(psd, axis1=1, axis2=2),
        rtol=1e-5,
    )
    got = np.asarray(batch_logdet(jnp.asarray(psd)))
    want = np.linalg.slogdet(psd)[1]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_cosine_similarity_matrix(rng):
    x = rng.standard_normal((5, D)).astype(np.float32)
    got = np.asarray(cosine_similarity_matrix(jnp.asarray(x)))
    xn = x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
    np.testing.assert_allclose(got, xn @ xn.T, atol=1e-5)


def test_graph_statistics_keys(tokens):
    g = cosine_similarity_graph(jnp.asarray(tokens))
    stats = compute_graph_statistics(g)
    for key in (
        "symmetry_error",
        "min_eigenvalue",
        "max_eigenvalue",
        "mean_degree",
        "sparsity",
        "frobenius_norm",
    ):
        assert stats[key].shape == (B,)
    assert float(jnp.max(stats["symmetry_error"])) < 1e-5


def test_gpf_fuse_is_jittable_and_differentiable(rng):
    ra = jnp.asarray(rng.standard_normal((B, N, N)).astype(np.float32))
    rp = jnp.asarray(rng.standard_normal((B, N, N)).astype(np.float32))
    coeffs = jnp.asarray(rng.uniform(0, 1, (3, 3)).astype(np.float32))

    def loss(c):
        return jnp.sum(gpf_fuse(ra, rp, c))

    g = jax.jit(jax.grad(loss))(coeffs)
    assert g.shape == coeffs.shape
    assert bool(jnp.all(jnp.isfinite(g)))
