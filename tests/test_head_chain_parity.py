"""End-to-end golden parity of the composed head chain vs the torch reference.

Transplants one set of weights into the reference's composed
``GPF -> MomentHead -> ClassifierHead`` chain
(/root/reference/src/models/gpf_kernel.py:117-159 + moment_head.py:268-322 +
classifier_head.py:106-151) and into ours, then asserts that on identical
inputs the LOGITS and the INPUT GRADIENTS (through the whole chain, including
Newton-Schulz and the tensor sketch) agree.  Configuration chosen for strict
reference semantics: norm='batch', sketch_mode='faithful', the reference's own
hash/sign buffers, and the paired-vech kernel-row permutation.

This is the strongest feasible parity evidence without network egress (full-
model parity including the timm backbone is blocked: no pretrained weights
can be downloaded here — see BASELINE.md).
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

B, N, D = 4, 12, 32
D_OUT = 16  # -> d_second = d_third = 8
SKETCH = 128  # == 4*D, inside the reference's OOB-safe range
CLASSES = 5


def _set(tree, path, value):
    """Functionally set tree[path[0]]...[path[-1]] = value (dicts)."""
    node = tree
    for key in path[:-1]:
        node = node[key]
    node[path[-1]] = jnp.asarray(value)


@pytest.fixture(scope="module")
def chains():
    """Build reference + JAX chains with transplanted weights."""
    from models.classifier_head import ClassifierHead as RefClassifier
    from models.gpf_kernel import GraphPolynomialFusion as RefGPF
    from models.moment_head import MomentHead as RefMomentHead

    from ego_moment_cle_vit_tpu.models.classifier_head import ClassifierHead
    from ego_moment_cle_vit_tpu.models.gpf import GraphPolynomialFusion
    from ego_moment_cle_vit_tpu.models.moment_head import MomentHead
    from ego_moment_cle_vit_tpu.ops.moments import paired_vech_permutation
    from ego_moment_cle_vit_tpu.ops.sketch import sketch_params_from_hashes

    torch.manual_seed(7)
    ref_gpf = RefGPF(degree_p=2, degree_q=2, similarity="cosine")
    ref_head = RefMomentHead(
        d_in=D,
        d_out=D_OUT,
        use_third_order=True,
        isqrt_iterations=3,
        sketch_dim=SKETCH,
    )
    ref_clf = RefClassifier(
        d_cls=D,
        d_moment=D_OUT,
        num_classes=CLASSES,
        fusion_type="concat",
        use_batch_norm=True,
    )
    assert ref_head.tensor_sketch.sketch_dim == SKETCH

    gpf = GraphPolynomialFusion(
        degree_p=2, degree_q=2, similarity="cosine", use_pallas=False
    )
    head = MomentHead(
        d_in=D,
        d_out=D_OUT,
        use_third_order=True,
        isqrt_iterations=3,
        sketch_dim=SKETCH,
        sketch_mode="faithful",
        norm="batch",
        dropout=0.0,
        use_pallas=False,
    )
    clf = ClassifierHead(
        d_cls=D,
        d_moment=D_OUT,
        num_classes=CLASSES,
        fusion_type="concat",
        norm="batch",
        dropout=0.0,
    )

    rng = np.random.default_rng(0)
    ta = rng.standard_normal((B, N, D)).astype(np.float32)
    tp = rng.standard_normal((B, N, D)).astype(np.float32)
    cls_feat = rng.standard_normal((B, D)).astype(np.float32)

    key = jax.random.PRNGKey(0)
    gpf_vars = jax.tree_util.tree_map(
        np.asarray, jax.device_get(gpf.init(key, jnp.asarray(ta), jnp.asarray(tp)))
    )
    dummy_graph = jnp.abs(jnp.asarray(ta @ ta.transpose(0, 2, 1)))
    head_vars = jax.device_get(
        head.init(key, jnp.asarray(ta), dummy_graph, deterministic=True)
    )
    head_vars = jax.tree_util.tree_map(np.asarray, head_vars)
    clf_vars = jax.device_get(
        clf.init(key, jnp.asarray(cls_feat), jnp.zeros((B, D_OUT), jnp.float32))
    )
    clf_vars = jax.tree_util.tree_map(np.asarray, clf_vars)

    # ---- transplant: GPF ----
    gpf_vars["params"]["alpha_coeffs"] = jnp.asarray(
        ref_gpf.alpha_coeffs.detach().numpy()
    )

    # ---- transplant: MomentHead ----
    perm = paired_vech_permutation(D)
    w2 = ref_head.second_net[0].weight.detach().numpy()  # [d_second, vech]
    b2 = ref_head.second_net[0].bias.detach().numpy()
    _set(head_vars, ("params", "second_proj", "kernel"), w2.T[perm])
    _set(head_vars, ("params", "second_proj", "bias"), b2)
    bn2 = ref_head.second_net[1]
    _set(
        head_vars,
        ("params", "second_norm", "BatchNorm_0", "scale"),
        bn2.weight.detach().numpy(),
    )
    _set(
        head_vars,
        ("params", "second_norm", "BatchNorm_0", "bias"),
        bn2.bias.detach().numpy(),
    )
    _set(
        head_vars,
        ("batch_stats", "second_norm", "BatchNorm_0", "mean"),
        bn2.running_mean.numpy(),
    )
    _set(
        head_vars,
        ("batch_stats", "second_norm", "BatchNorm_0", "var"),
        bn2.running_var.numpy(),
    )

    w3 = ref_head.third_net[0].weight.detach().numpy()  # [d_third, SKETCH]
    b3 = ref_head.third_net[0].bias.detach().numpy()
    _set(head_vars, ("params", "third_proj", "kernel"), w3.T)
    _set(head_vars, ("params", "third_proj", "bias"), b3)
    bn3 = ref_head.third_net[1]
    _set(
        head_vars,
        ("params", "third_norm", "BatchNorm_0", "scale"),
        bn3.weight.detach().numpy(),
    )
    _set(
        head_vars,
        ("params", "third_norm", "BatchNorm_0", "bias"),
        bn3.bias.detach().numpy(),
    )
    _set(
        head_vars,
        ("batch_stats", "third_norm", "BatchNorm_0", "mean"),
        bn3.running_mean.numpy(),
    )
    _set(
        head_vars,
        ("batch_stats", "third_norm", "BatchNorm_0", "var"),
        bn3.running_var.numpy(),
    )

    # sketch constants: the reference's own hash/sign buffers
    ts = ref_head.tensor_sketch
    hashes = np.stack([ts.hash1.numpy(), ts.hash2.numpy(), ts.hash3.numpy()])
    signs = np.stack([ts.sign1.numpy(), ts.sign2.numpy(), ts.sign3.numpy()])
    sp = sketch_params_from_hashes(
        jnp.asarray(hashes), jnp.asarray(signs), SKETCH
    )
    _set(head_vars, ("constants", "sketch_matrices"), sp.matrices)

    # ---- transplant: ClassifierHead ----
    # reference classifier Sequential: [Linear, BN, GELU, Drop, Linear, BN,
    # GELU, Drop, Linear]
    seq = ref_clf.classifier
    for t_idx, (name, norm_name) in (
        (0, ("fc1", "norm1")),
        (4, ("fc2", "norm2")),
    ):
        lin, bn = seq[t_idx], seq[t_idx + 1]
        _set(clf_vars, ("params", name, "kernel"), lin.weight.detach().numpy().T)
        _set(clf_vars, ("params", name, "bias"), lin.bias.detach().numpy())
        _set(
            clf_vars,
            ("params", norm_name, "BatchNorm_0", "scale"),
            bn.weight.detach().numpy(),
        )
        _set(
            clf_vars,
            ("params", norm_name, "BatchNorm_0", "bias"),
            bn.bias.detach().numpy(),
        )
        _set(
            clf_vars,
            ("batch_stats", norm_name, "BatchNorm_0", "mean"),
            bn.running_mean.numpy(),
        )
        _set(
            clf_vars,
            ("batch_stats", norm_name, "BatchNorm_0", "var"),
            bn.running_var.numpy(),
        )
    _set(clf_vars, ("params", "fc_out", "kernel"), seq[8].weight.detach().numpy().T)
    _set(clf_vars, ("params", "fc_out", "bias"), seq[8].bias.detach().numpy())

    gpf_vars = jax.tree_util.tree_map(jnp.asarray, gpf_vars)
    head_vars = jax.tree_util.tree_map(jnp.asarray, head_vars)
    clf_vars = jax.tree_util.tree_map(jnp.asarray, clf_vars)

    return {
        "ref": (ref_gpf, ref_head, ref_clf),
        "jax_modules": (gpf, head, clf),
        "jax_vars": (gpf_vars, head_vars, clf_vars),
        "inputs": (ta, tp, cls_feat),
    }


def _torch_chain(chains, ta, tp, cls_feat, train_bn=False):
    ref_gpf, ref_head, ref_clf = chains["ref"]
    for mod in (ref_gpf, ref_head, ref_clf):
        mod.train(train_bn)
        for m in mod.modules():
            if isinstance(m, torch.nn.Dropout):
                m.p = 0.0
    graph = ref_gpf(ta, tp)
    moment = ref_head(ta, graph)
    return ref_clf(cls_feat, moment)


def _jax_chain(chains, ta, tp, cls_feat, train_bn=False):
    gpf, head, clf = chains["jax_modules"]
    gpf_vars, head_vars, clf_vars = chains["jax_vars"]
    graph = gpf.apply(gpf_vars, ta, tp)
    # deterministic only gates dropout (0 here); BN mode rides
    # use_running_average == (not train_bn) via deterministic
    kwargs = dict(deterministic=not train_bn)
    mutable = ["batch_stats"] if train_bn else False
    moment = head.apply(head_vars, ta, graph, mutable=mutable, **kwargs)
    if train_bn:
        moment = moment[0]
    logits = clf.apply(clf_vars, cls_feat, moment, mutable=mutable, **kwargs)
    if train_bn:
        logits = logits[0]
    return logits


@pytest.mark.parametrize("train_bn", [False, True], ids=["eval_bn", "train_bn"])
def test_head_chain_logits_parity(chains, train_bn):
    ta, tp, cls_feat = chains["inputs"]
    with torch.no_grad():
        want = _torch_chain(
            chains,
            torch.from_numpy(ta),
            torch.from_numpy(tp),
            torch.from_numpy(cls_feat),
            train_bn=train_bn,
        ).numpy()
    got = np.asarray(
        _jax_chain(
            chains,
            jnp.asarray(ta),
            jnp.asarray(tp),
            jnp.asarray(cls_feat),
            train_bn=train_bn,
        )
    )
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_head_chain_input_gradient_parity(chains):
    """d(sum(logits * V))/d{tokens_a, tokens_p, cls} through the WHOLE chain
    (GPF polynomial, graph normalize, covariance, Newton-Schulz, vech
    permutation, tensor sketch, classifier MLP) must match torch autograd."""
    ta, tp, cls_feat = chains["inputs"]
    rng = np.random.default_rng(3)
    cotangent = rng.standard_normal((B, CLASSES)).astype(np.float32)

    tta = torch.from_numpy(ta.copy()).requires_grad_(True)
    ttp = torch.from_numpy(tp.copy()).requires_grad_(True)
    tcls = torch.from_numpy(cls_feat.copy()).requires_grad_(True)
    logits = _torch_chain(chains, tta, ttp, tcls, train_bn=False)
    (logits * torch.from_numpy(cotangent)).sum().backward()

    def scalar(ta_, tp_, cls_):
        logits = _jax_chain(chains, ta_, tp_, cls_, train_bn=False)
        return jnp.sum(logits * jnp.asarray(cotangent))

    g_ta, g_tp, g_cls = jax.grad(scalar, argnums=(0, 1, 2))(
        jnp.asarray(ta), jnp.asarray(tp), jnp.asarray(cls_feat)
    )
    np.testing.assert_allclose(
        np.asarray(g_cls), tcls.grad.numpy(), atol=3e-4, rtol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(g_tp), ttp.grad.numpy(), atol=3e-4, rtol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(g_ta), tta.grad.numpy(), atol=3e-4, rtol=3e-4
    )


def test_paired_vech_permutation_property(rng):
    """half_vectorize_paired(M)[k] == half_vectorize(M)[perm[k]] exactly."""
    from ego_moment_cle_vit_tpu.ops.moments import (
        half_vectorize,
        half_vectorize_paired,
        paired_vech_permutation,
    )

    for dim in (4, 12, 32):
        m = rng.standard_normal((2, dim, dim)).astype(np.float32)
        m = m + m.transpose(0, 2, 1)
        paired = np.asarray(half_vectorize_paired(jnp.asarray(m)))
        rowmajor = np.asarray(half_vectorize(jnp.asarray(m)))
        perm = paired_vech_permutation(dim)
        np.testing.assert_array_equal(paired, rowmajor[:, perm])
