"""Unit tests for moment-pooling math: Newton–Schulz, weighted stats,
half-vectorization, tensor sketch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ego_moment_cle_vit_tpu.ops import (
    newton_schulz_isqrt,
    newton_schulz_sqrt,
    matrix_power_eigen,
    check_psd,
    ensure_psd,
    half_vectorize,
    graph_weighted_mean,
    graph_weighted_covariance,
    degree_weighted_centered_mean,
    normalize_graph,
    make_sketch_params,
    count_sketch,
    tensor_sketch_3,
)
from ego_moment_cle_vit_tpu.ops.sketch import (
    effective_sketch_dim,
    sketch_params_from_hashes,
)

B, N, D = 2, 10, 12


def _rand_psd(rng, b, d, jitter=0.5):
    a = rng.standard_normal((b, d, d)).astype(np.float32)
    return a @ a.transpose(0, 2, 1) / d + jitter * np.eye(d, dtype=np.float32)


def test_newton_schulz_isqrt_converges(rng):
    m = _rand_psd(rng, B, D)
    isqrt = np.asarray(newton_schulz_isqrt(jnp.asarray(m), num_iterations=15))
    # M^{-1/2} M M^{-1/2} ~= I
    recon = isqrt @ m @ isqrt
    np.testing.assert_allclose(
        recon, np.broadcast_to(np.eye(D), recon.shape), atol=5e-2
    )


def test_newton_schulz_isqrt_matches_eigen_reference(rng):
    m = _rand_psd(rng, B, D, jitter=1.0)
    got = np.asarray(newton_schulz_isqrt(jnp.asarray(m), num_iterations=20))
    want = np.asarray(matrix_power_eigen(jnp.asarray(m), -0.5))
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)


def test_newton_schulz_sqrt_reconstruction(rng):
    m = _rand_psd(rng, B, D)
    s = np.asarray(newton_schulz_sqrt(jnp.asarray(m), num_iterations=15))
    np.testing.assert_allclose(s @ s, m, atol=5e-2, rtol=5e-2)


def test_newton_schulz_pins_fp32_under_bf16(rng):
    m = _rand_psd(rng, B, D)
    out = newton_schulz_isqrt(jnp.asarray(m, dtype=jnp.bfloat16), num_iterations=10)
    assert out.dtype == jnp.bfloat16  # cast back to input dtype
    # Internal fp32 keeps it close to the fp32 result
    ref = np.asarray(newton_schulz_isqrt(jnp.asarray(m), num_iterations=10))
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), ref, atol=0.15, rtol=0.15
    )


def test_check_and_ensure_psd(rng):
    psd = _rand_psd(rng, B, D)
    assert bool(jnp.all(check_psd(jnp.asarray(psd))))
    not_psd = psd.copy()
    not_psd[0] -= 5.0 * np.eye(D, dtype=np.float32)
    flags = np.asarray(check_psd(jnp.asarray(not_psd)))
    assert not flags[0] and flags[1]
    fixed = ensure_psd(jnp.asarray(not_psd))
    assert bool(jnp.all(check_psd(fixed)))


def test_half_vectorize_ordering(rng):
    m = rng.standard_normal((B, 4, 4)).astype(np.float32)
    m = 0.5 * (m + m.transpose(0, 2, 1))
    got = np.asarray(half_vectorize(jnp.asarray(m)))
    rows, cols = np.triu_indices(4)
    want = m[:, rows, cols]  # row-major (0,0),(0,1)...(torch.triu_indices order)
    np.testing.assert_allclose(got, want)
    assert got.shape == (B, 10)


def test_graph_weighted_mean_and_cov_golden(rng):
    tokens = rng.standard_normal((B, N, D)).astype(np.float32)
    g = np.abs(rng.standard_normal((B, N, N))).astype(np.float32)
    g = 0.5 * (g + g.transpose(0, 2, 1))
    w = np.asarray(normalize_graph(jnp.asarray(g), "symmetric", eps=1e-5))

    eps = 1e-5
    # golden: mu = Z^T W 1 / (tr W + eps)
    ones = np.ones((B, N, 1), np.float32)
    mu_want = (tokens.transpose(0, 2, 1) @ (w @ ones)).squeeze(-1)
    tr = np.trace(w, axis1=1, axis2=2)[:, None]
    mu_want = mu_want / (tr + eps)
    mu_got = np.asarray(graph_weighted_mean(jnp.asarray(tokens), jnp.asarray(w)))
    np.testing.assert_allclose(mu_got, mu_want, atol=1e-4)

    zc = tokens - mu_want[:, None, :]
    m2_want = zc.transpose(0, 2, 1) @ (w @ zc)
    m2_got, centered = graph_weighted_covariance(jnp.asarray(tokens), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(m2_got), m2_want, atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(centered), zc, atol=1e-4)

    # third-order input: sum_n zc[n] * rowsum(W)[n] / (trW + eps)
    rowsum = w.sum(-1)
    third_want = (zc * rowsum[:, :, None]).sum(1) / (tr + eps)
    third_got = np.asarray(
        degree_weighted_centered_mean(jnp.asarray(zc), jnp.asarray(w))
    )
    np.testing.assert_allclose(third_got, third_want, atol=1e-4)


# ---------------------------------------------------------------------------
# Tensor sketch
# ---------------------------------------------------------------------------


def test_effective_sketch_dim_caps_and_aligns():
    assert effective_sketch_dim(768, 4096) == 3072  # capped at 4*768
    assert effective_sketch_dim(768, 2048) == 2048
    assert effective_sketch_dim(100, 2048) == 512  # 400 -> rounded to 512


def test_count_sketch_matches_scatter_golden(rng):
    d_in, k = 32, 128
    hashes = rng.integers(0, k, (3, d_in))
    signs = rng.integers(0, 2, (3, d_in)) * 2 - 1
    params = sketch_params_from_hashes(jnp.asarray(hashes), jnp.asarray(signs), k)
    x = rng.standard_normal((B, d_in)).astype(np.float32)

    got = np.asarray(count_sketch(jnp.asarray(x), params.matrices[0]))
    want = np.zeros((B, k), np.float32)
    for d in range(d_in):
        want[:, hashes[0, d]] += signs[0, d] * x[:, d]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_tensor_sketch_faithful_mode_matches_golden(rng):
    d_in, k = 32, 128
    hashes = rng.integers(0, k, (3, d_in))
    signs = rng.integers(0, 2, (3, d_in)) * 2 - 1
    params = sketch_params_from_hashes(jnp.asarray(hashes), jnp.asarray(signs), k)
    x = rng.standard_normal((B, d_in)).astype(np.float32)

    sketches = []
    for i in range(3):
        s = np.zeros((B, k), np.float32)
        for d in range(d_in):
            s[:, hashes[i, d]] += signs[i, d] * x[:, d]
        sketches.append(s)
    want = sketches[0] * sketches[1] * sketches[2]
    got = np.asarray(tensor_sketch_3(jnp.asarray(x), params, mode="faithful"))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_tensor_sketch_fft_estimates_inner_product():
    """The FFT tensor sketch is an unbiased estimator of <x^{⊗3}, y^{⊗3}> =
    <x, y>^3.  The estimator's relative std for the *self* inner product of a
    unit vector is ~sqrt(2/K), so test <sk(x), sk(x)> ~= ||x||^6 = 1 averaged
    over independent sketches.  (The reference's non-FFT elementwise product
    has no such guarantee — that's exactly the deviation we fixed.)"""
    local_rng = np.random.default_rng(7)
    d_in, k = 16, 1024
    x = local_rng.standard_normal(d_in).astype(np.float32)
    x /= np.linalg.norm(x)  # ||x||^6 == 1

    estimates = []
    for seed in range(10):
        params = make_sketch_params(jax.random.PRNGKey(seed), d_in, k)
        sx = tensor_sketch_3(jnp.asarray(x)[None], params, mode="fft")[0]
        estimates.append(float(jnp.dot(sx, sx)))
    est = float(np.mean(estimates))
    assert abs(est - 1.0) < 0.25, estimates


def test_tensor_sketch_differentiable(rng):
    params = make_sketch_params(jax.random.PRNGKey(0), 32, 256)
    x = jnp.asarray(rng.standard_normal((B, 32)).astype(np.float32))

    def loss(v):
        return jnp.sum(tensor_sketch_3(v, params, mode="fft") ** 2)

    g = jax.jit(jax.grad(loss))(x)
    assert g.shape == x.shape and bool(jnp.all(jnp.isfinite(g)))


def test_isqrt_cov_subspace_equals_dense(rng):
    """The token-subspace NS (polynomials in M2 collapse onto S = B̂ A^T)
    must equal the dense D-space iteration exactly — values AND gradients."""
    import jax
    import jax.numpy as jnp

    from ego_moment_cle_vit_tpu.ops.moments import (
        isqrt_cov_subspace,
        newton_schulz_isqrt,
    )

    B, N, D = 3, 12, 48
    c = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    w0 = rng.standard_normal((B, N, N)).astype(np.float32)
    w = jnp.asarray(np.abs(w0 @ w0.transpose(0, 2, 1)))
    weighted = jnp.einsum("bnm,bmd->bnd", w, c)
    m2 = jnp.einsum("bnd,bne->bde", c, weighted)

    for iters in (3, 5):
        dense = newton_schulz_isqrt(m2, iters, assume_symmetric=True)
        sub = isqrt_cov_subspace(c, weighted, iters)
        rel = float(jnp.linalg.norm(sub - dense) / jnp.linalg.norm(dense))
        assert rel < 1e-5, (iters, rel)

    def loss_dense(c):
        wc = jnp.einsum("bnm,bmd->bnd", w, c)
        m2 = jnp.einsum("bnd,bne->bde", c, wc)
        return jnp.sum(newton_schulz_isqrt(m2, 5, assume_symmetric=True) ** 2)

    def loss_sub(c):
        wc = jnp.einsum("bnm,bmd->bnd", w, c)
        return jnp.sum(isqrt_cov_subspace(c, wc, 5) ** 2)

    gd = jax.grad(loss_dense)(c)
    gs = jax.grad(loss_sub)(c)
    rel = float(jnp.linalg.norm(gs - gd) / jnp.linalg.norm(gd))
    assert rel < 1e-5, rel


def test_paired_vech_permutation_odd_dim_is_identity():
    """half_vectorize_paired falls back to row-major vech for odd dims, so
    the conversion permutation must be the identity (it previously returned
    uninitialized memory)."""
    from ego_moment_cle_vit_tpu.ops.moments import (
        half_vectorize,
        half_vectorize_paired,
        paired_vech_permutation,
    )

    d = 7
    rng = np.random.default_rng(0)
    m = rng.standard_normal((d, d)).astype(np.float32)
    m = (m + m.T) / 2
    hp = np.asarray(half_vectorize_paired(jnp.asarray(m)[None])[0])
    hv = np.asarray(half_vectorize(jnp.asarray(m)[None])[0])
    perm = paired_vech_permutation(d)
    np.testing.assert_allclose(hp, hv[perm])
