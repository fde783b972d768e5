"""Numerical parity against the actual PyTorch reference implementation.

These tests import the reference modules READ-ONLY from /root/reference
(skipped wherever that checkout is absent) and compare our JAX ops against
them on identical inputs/parameters.  This is the strongest parity evidence
available: same tensors in, allclose out.

Covered: GPF forward, Newton-Schulz iSQRT, graph normalization + weighted
mean/covariance, half-vectorize ordering, count-sketch (faithful mode, same
hash buffers), triplet + alignment losses.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout not available"
)

torch = pytest.importorskip("torch")

if REF.exists():
    sys.path.insert(0, str(REF / "src"))
    # the reference package imports timm at module scope; stub it (none of
    # the components under test instantiate a timm model)
    if "timm" not in sys.modules:
        import types

        fake_timm = types.ModuleType("timm")

        def _no_timm(*args, **kwargs):  # pragma: no cover
            raise RuntimeError("timm stub: not available in this environment")

        fake_timm.create_model = _no_timm
        sys.modules["timm"] = fake_timm
    if "torchvision" not in sys.modules:
        import types

        fake_tv = types.ModuleType("torchvision")
        fake_tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = fake_tv
        sys.modules["torchvision.transforms"] = fake_tv.transforms

import jax
import jax.numpy as jnp

B, N, D = 2, 12, 16


@pytest.fixture(scope="module")
def ref_models():
    from models.gpf_kernel import GraphPolynomialFusion as RefGPF
    from models.moment_head import MomentHead as RefMomentHead
    from models.moment_head import NewtonSchulzSqrtm as RefNS
    from models.moment_head import TensorSketch as RefSketch

    return {
        "GPF": RefGPF,
        "MomentHead": RefMomentHead,
        "NS": RefNS,
        "Sketch": RefSketch,
    }


def test_gpf_forward_parity(rng, ref_models):
    from ego_moment_cle_vit_tpu.ops import gpf_fuse, token_similarity_graph

    tokens_a = rng.standard_normal((B, N, D)).astype(np.float32)
    tokens_p = rng.standard_normal((B, N, D)).astype(np.float32)

    for similarity in ("cosine", "dot"):
        ref = ref_models["GPF"](degree_p=2, degree_q=2, similarity=similarity)
        alpha = np.asarray(ref.alpha_coeffs.detach().numpy())
        with torch.no_grad():
            want = ref(
                torch.from_numpy(tokens_a), torch.from_numpy(tokens_p)
            ).numpy()

        coeffs = jax.nn.softplus(jnp.asarray(alpha))
        got = gpf_fuse(
            token_similarity_graph(jnp.asarray(tokens_a), similarity),
            token_similarity_graph(jnp.asarray(tokens_p), similarity),
            coeffs,
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


def test_newton_schulz_parity(rng, ref_models):
    from ego_moment_cle_vit_tpu.ops import newton_schulz_isqrt

    a = rng.standard_normal((B, D, D)).astype(np.float32)
    m = a @ a.transpose(0, 2, 1) / D + 0.3 * np.eye(D, dtype=np.float32)

    for iters in (3, 5):
        ref = ref_models["NS"](num_iterations=iters, eps=1e-5)
        with torch.no_grad():
            want = ref(torch.from_numpy(m.copy())).numpy()
        got = newton_schulz_isqrt(jnp.asarray(m), num_iterations=iters, eps=1e-5)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-3)


def test_graph_weighting_and_halfvec_parity(rng, ref_models):
    """Drive the reference MomentHead's internal normalize/mean/halfvec
    helpers directly against our ops."""
    from ego_moment_cle_vit_tpu.ops import (
        graph_weighted_mean,
        half_vectorize,
        normalize_graph,
    )

    head = ref_models["MomentHead"](d_in=D, d_out=32, use_third_order=False)
    tokens = rng.standard_normal((B, N, D)).astype(np.float32)
    g = rng.standard_normal((B, N, N)).astype(np.float32)
    g = np.abs(g @ g.transpose(0, 2, 1)).astype(np.float32)

    with torch.no_grad():
        w_ref = head._normalize_weight_matrix(torch.from_numpy(g)).numpy()
        mu_ref = head._graph_weighted_mean(
            torch.from_numpy(tokens), torch.from_numpy(w_ref)
        ).numpy()
        sym = 0.5 * (g + g.transpose(0, 2, 1))
        hv_ref = head._half_vectorize(torch.from_numpy(sym)).numpy()

    w = normalize_graph(jnp.asarray(g), "symmetric", eps=head.eps)
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-5)
    mu = graph_weighted_mean(jnp.asarray(tokens), jnp.asarray(w_ref), eps=head.eps)
    np.testing.assert_allclose(np.asarray(mu), mu_ref, atol=1e-5)
    hv = half_vectorize(jnp.asarray(sym))
    np.testing.assert_allclose(np.asarray(hv), hv_ref, atol=0)


def test_count_sketch_parity_with_reference_hashes(rng, ref_models):
    """Faithful-mode tensor sketch must match the reference bit-for-bit when
    given the reference's own hash/sign buffers (and the reference avoids
    its OOB bug because sketch_dim <= 4*d_in here)."""
    from ego_moment_cle_vit_tpu.ops.sketch import (
        sketch_params_from_hashes,
        tensor_sketch_3,
    )

    d_in, sketch_dim = 32, 64
    ref = ref_models["Sketch"](input_dim=d_in, sketch_dim=sketch_dim)
    assert ref.sketch_dim == sketch_dim

    hashes = np.stack(
        [ref.hash1.numpy(), ref.hash2.numpy(), ref.hash3.numpy()]
    )
    signs = np.stack(
        [ref.sign1.numpy(), ref.sign2.numpy(), ref.sign3.numpy()]
    )
    x = rng.standard_normal((B, d_in)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    params = sketch_params_from_hashes(
        jnp.asarray(hashes), jnp.asarray(signs), sketch_dim
    )
    got = tensor_sketch_3(jnp.asarray(x), params, mode="faithful")
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_triplet_loss_parity(rng):
    from losses.triplet_loss import TripletLoss as RefTriplet

    from ego_moment_cle_vit_tpu.losses import triplet_loss

    a = rng.standard_normal((8, D)).astype(np.float32)
    p = rng.standard_normal((8, D)).astype(np.float32)
    n = rng.standard_normal((8, D)).astype(np.float32)

    ref = RefTriplet(margin=0.7, normalize=True, reduction="mean")
    with torch.no_grad():
        want = float(
            ref(torch.from_numpy(a), torch.from_numpy(p), torch.from_numpy(n))
        )
    got = float(
        triplet_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n), margin=0.7)
    )
    assert got == pytest.approx(want, abs=1e-5)


def test_model_inline_triplet_parity(rng):
    """Our roll-negative triplet must match the model-inlined reference
    triplet (squared distances path, ego_moment_clevit.py:246-276)."""
    import torch.nn.functional as F

    from ego_moment_cle_vit_tpu.losses import roll_negative_triplet_loss

    a = rng.standard_normal((8, D)).astype(np.float32)
    p = rng.standard_normal((8, D)).astype(np.float32)

    ta, tp = torch.from_numpy(a), torch.from_numpy(p)
    tn = ta.roll(shifts=1, dims=0)
    an, pn, nn_ = (
        F.normalize(ta, p=2, dim=1),
        F.normalize(tp, p=2, dim=1),
        F.normalize(tn, p=2, dim=1),
    )
    pos = (an - pn).pow(2).sum(1)
    neg = (an - nn_).pow(2).sum(1)
    want = float(torch.clamp(pos - neg + 0.3, min=0.0).mean())

    got = float(roll_negative_triplet_loss(jnp.asarray(a), jnp.asarray(p), margin=0.3))
    assert got == pytest.approx(want, abs=1e-5)


def test_kernel_alignment_parity(rng):
    from losses.kernel_alignment import KernelAlignmentLoss as RefKA

    from ego_moment_cle_vit_tpu.losses import kernel_alignment_loss

    g = rng.standard_normal((6, 8, 8)).astype(np.float32)
    g = (g @ g.transpose(0, 2, 1)).astype(np.float32)
    labels = np.array([0, 0, 1, 1, 2, 2])

    for atype in ("centered", "normalized", "cosine"):
        ref = RefKA(alignment_type=atype)
        with torch.no_grad():
            want = float(ref(torch.from_numpy(g), torch.from_numpy(labels)))
        got = float(
            kernel_alignment_loss(jnp.asarray(g), jnp.asarray(labels), atype)
        )
        assert got == pytest.approx(want, abs=1e-4), atype
