"""Torch-reference parity of the moment chain at FLAGSHIP dimensions.

tests/test_reference_parity.py and tests/test_head_chain_parity.py prove
math identity at toy dims (B=2..4, N=12, D=16..32) — shape-independent, but
accumulation-order and eps effects at the real operating point are exactly
where fp32 drift would hide (VERDICT r4 item 6).  This file runs the SAME
transplant methodology once at the flagship moment-chain operating point:

  N=49 tokens (Swin 224^2 final stage: 7x7), D=1024 (swin-base channels),
  5 Newton-Schulz iterations, third-order Tensor-Sketch at sketch_dim=4096
  (BASELINE.json configs[2] / configs/ufg_base.yaml moment settings).

d_out is kept small (16) so the vech(1024)=524,800-row projection stays
CPU-sized (~4.2M params); d_out scales only the projection's output dim and
has no effect on the accumulation depth under test (the covariance sums N
products per entry, NS multiplies 1024x1024 matrices 5 times, the sketch
FFT-convolves 4096-bins — all at full flagship size here).

Chain under test vs /root/reference: GPF polynomial graph
(src/models/gpf_kernel.py:117-159) -> graph-weighted covariance + NS-iSQRT
+ paired vech (moment_head.py:150-266) -> third-order count-sketch
(moment_head.py:15-117, faithful mode, the reference's own hash buffers)
-> projections + BatchNorm (eval stats).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = [
    pytest.mark.skipif(not REF.exists(), reason="reference checkout absent"),
]

torch = pytest.importorskip("torch")

if REF.exists():
    sys.path.insert(0, str(REF / "src"))
    if "timm" not in sys.modules:
        import types

        fake_timm = types.ModuleType("timm")
        fake_timm.create_model = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("timm stub")
        )
        sys.modules["timm"] = fake_timm
    if "torchvision" not in sys.modules:
        import types

        fake_tv = types.ModuleType("torchvision")
        fake_tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = fake_tv
        sys.modules["torchvision.transforms"] = fake_tv.transforms

import jax
import jax.numpy as jnp

B, N, D = 2, 49, 1024  # flagship: Swin-Base stage-3 tokens
D_OUT = 16  # projection out-dim only; accumulation dims are N/D/SKETCH
SKETCH = 4096  # flagship sketch_dim (configs/ufg_base.yaml)
NS_ITERS = 5  # flagship isqrt_iterations


def _set(tree, path, value):
    node = tree
    for key in path[:-1]:
        node = node[key]
    node[path[-1]] = jnp.asarray(value)


@pytest.fixture(scope="module")
def chain():
    from models.gpf_kernel import GraphPolynomialFusion as RefGPF
    from models.moment_head import MomentHead as RefMomentHead

    from ego_moment_cle_vit_tpu.models.gpf import GraphPolynomialFusion
    from ego_moment_cle_vit_tpu.models.moment_head import MomentHead
    from ego_moment_cle_vit_tpu.ops.moments import paired_vech_permutation
    from ego_moment_cle_vit_tpu.ops.sketch import sketch_params_from_hashes

    torch.manual_seed(11)
    ref_gpf = RefGPF(degree_p=2, degree_q=2, similarity="cosine")
    ref_head = RefMomentHead(
        d_in=D,
        d_out=D_OUT,
        use_third_order=True,
        isqrt_iterations=NS_ITERS,
        sketch_dim=SKETCH,
    )
    assert ref_head.tensor_sketch.sketch_dim == SKETCH

    gpf = GraphPolynomialFusion(
        degree_p=2, degree_q=2, similarity="cosine", use_pallas=False
    )
    head = MomentHead(
        d_in=D,
        d_out=D_OUT,
        use_third_order=True,
        isqrt_iterations=NS_ITERS,
        sketch_dim=SKETCH,
        sketch_mode="faithful",
        norm="batch",
        dropout=0.0,
        use_pallas=False,
    )

    rng = np.random.default_rng(5)
    ta = rng.standard_normal((B, N, D)).astype(np.float32)
    tp = rng.standard_normal((B, N, D)).astype(np.float32)

    key = jax.random.PRNGKey(0)
    gpf_vars = jax.tree_util.tree_map(
        np.asarray,
        jax.device_get(gpf.init(key, jnp.asarray(ta), jnp.asarray(tp))),
    )
    dummy_graph = jnp.abs(jnp.asarray(ta @ ta.transpose(0, 2, 1)))
    head_vars = jax.tree_util.tree_map(
        np.asarray,
        jax.device_get(
            head.init(key, jnp.asarray(ta), dummy_graph, deterministic=True)
        ),
    )

    gpf_vars["params"]["alpha_coeffs"] = jnp.asarray(
        ref_gpf.alpha_coeffs.detach().numpy()
    )

    perm = paired_vech_permutation(D)
    w2 = ref_head.second_net[0].weight.detach().numpy()
    _set(head_vars, ("params", "second_proj", "kernel"), w2.T[perm])
    _set(
        head_vars,
        ("params", "second_proj", "bias"),
        ref_head.second_net[0].bias.detach().numpy(),
    )
    w3 = ref_head.third_net[0].weight.detach().numpy()
    _set(head_vars, ("params", "third_proj", "kernel"), w3.T)
    _set(
        head_vars,
        ("params", "third_proj", "bias"),
        ref_head.third_net[0].bias.detach().numpy(),
    )
    for ref_bn, name in (
        (ref_head.second_net[1], "second_norm"),
        (ref_head.third_net[1], "third_norm"),
    ):
        _set(
            head_vars,
            ("params", name, "BatchNorm_0", "scale"),
            ref_bn.weight.detach().numpy(),
        )
        _set(
            head_vars,
            ("params", name, "BatchNorm_0", "bias"),
            ref_bn.bias.detach().numpy(),
        )
        _set(
            head_vars,
            ("batch_stats", name, "BatchNorm_0", "mean"),
            ref_bn.running_mean.numpy(),
        )
        _set(
            head_vars,
            ("batch_stats", name, "BatchNorm_0", "var"),
            ref_bn.running_var.numpy(),
        )

    ts = ref_head.tensor_sketch
    hashes = np.stack([ts.hash1.numpy(), ts.hash2.numpy(), ts.hash3.numpy()])
    signs = np.stack([ts.sign1.numpy(), ts.sign2.numpy(), ts.sign3.numpy()])
    sp = sketch_params_from_hashes(jnp.asarray(hashes), jnp.asarray(signs), SKETCH)
    _set(head_vars, ("constants", "sketch_matrices"), sp.matrices)

    return {
        "ref": (ref_gpf, ref_head),
        "jax": (gpf, head),
        "vars": (
            jax.tree_util.tree_map(jnp.asarray, gpf_vars),
            jax.tree_util.tree_map(jnp.asarray, head_vars),
        ),
        "inputs": (ta, tp),
    }


def test_flagship_dim_moment_chain_parity(chain):
    """Same tensors through both full chains at N=49/D=1024/5 NS iters.

    Tolerance pinned for fp32 at this depth: the dominant drift source is
    the 1024x1024 Newton-Schulz iteration chain (5 x 3 matmuls) where
    torch/XLA accumulation orders differ; measured max|diff| on this seed
    is ~1e-5 absolute on unit-scale outputs — 1e-3/1e-4 gives 10-100x
    headroom without masking a real semantic break (any eps/ordering bug
    shifts results by >1e-2 at this depth)."""
    ref_gpf, ref_head = chain["ref"]
    gpf, head = chain["jax"]
    gpf_vars, head_vars = chain["vars"]
    ta, tp = chain["inputs"]

    for mod in (ref_gpf, ref_head):
        mod.eval()
        for m in mod.modules():
            if isinstance(m, torch.nn.Dropout):
                m.p = 0.0

    with torch.no_grad():
        ref_graph = ref_gpf(torch.from_numpy(ta), torch.from_numpy(tp))
        want = ref_head(torch.from_numpy(ta), ref_graph).numpy()

    graph = gpf.apply(gpf_vars, jnp.asarray(ta), jnp.asarray(tp))
    got = np.asarray(
        head.apply(head_vars, jnp.asarray(ta), graph, deterministic=True)
    )

    assert got.shape == want.shape == (B, D_OUT)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_flagship_dim_isqrt_parity(chain):
    """The Newton-Schulz inverse-sqrt alone at D=1024 x 5 iterations — the
    deepest accumulation in the chain — against the reference's
    NewtonSchulzSqrtm on an identical well-conditioned covariance."""
    from models.moment_head import NewtonSchulzSqrtm as RefNS

    from ego_moment_cle_vit_tpu.ops import newton_schulz_isqrt

    rng = np.random.default_rng(9)
    x = rng.standard_normal((B, 4 * D, D)).astype(np.float32) / np.sqrt(4 * D)
    cov = np.einsum("bnd,bne->bde", x, x) + 1e-5 * np.eye(D, dtype=np.float32)

    ref = RefNS(num_iterations=NS_ITERS, eps=1e-5)
    with torch.no_grad():
        want = ref(torch.from_numpy(cov.copy())).numpy()
    got = np.asarray(
        newton_schulz_isqrt(jnp.asarray(cov), num_iterations=NS_ITERS, eps=1e-5)
    )

    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
