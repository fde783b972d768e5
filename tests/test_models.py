"""Model-level smoke + shape tests, mirroring the reference's component
checks in test_implementation.py (GPF/MomentHead/backbone shapes, model
forward, loss dict keys, backward coverage) — CPU-runnable, random tensors,
tiny configs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ego_moment_cle_vit_tpu.models import (
    ViT,
    VIT_CONFIGS,
    Swin,
    SWIN_CONFIGS,
    CLEViTBackbone,
    CLEViTDualStream,
    GraphPolynomialFusion,
    AdaptiveGraphPolynomialFusion,
    MomentHead,
    SimplifiedMomentHead,
    ClassifierHead,
    MultiScaleClassifierHead,
    AdaptiveClassifierHead,
    EGOMomentCLEViT,
)

B = 2


# ---------------------------------------------------------------------------
# GPF module
# ---------------------------------------------------------------------------


def test_gpf_module_symmetric_psd(rng):
    tokens_a = jnp.asarray(rng.standard_normal((B, 16, 24)).astype(np.float32))
    tokens_p = jnp.asarray(rng.standard_normal((B, 16, 24)).astype(np.float32))
    gpf = GraphPolynomialFusion(degree_p=2, degree_q=2, similarity="cosine")
    params = gpf.init(jax.random.PRNGKey(0), tokens_a, tokens_p)
    g = gpf.apply(params, tokens_a, tokens_p)
    assert g.shape == (B, 16, 16)
    gn = np.asarray(g)
    np.testing.assert_allclose(gn, gn.transpose(0, 2, 1), atol=1e-5)
    assert gn.min() >= 0.0
    # coefficient matrix is nonneg with the right shape
    coeffs = GraphPolynomialFusion.coefficient_matrix(params["params"])
    assert coeffs.shape == (3, 3) and float(jnp.min(coeffs)) > 0
    # sparsity loss is a nonneg scalar
    sp = GraphPolynomialFusion.sparsity_loss(params["params"])
    assert float(sp) > 0


@pytest.mark.parametrize("init", ["uniform", "xavier", "identity"])
def test_gpf_coeff_inits(rng, init):
    tokens = jnp.asarray(rng.standard_normal((B, 9, 8)).astype(np.float32))
    gpf = GraphPolynomialFusion(coeff_init=init)
    params = gpf.init(jax.random.PRNGKey(1), tokens, tokens)
    alpha = params["params"]["alpha_coeffs"]
    assert alpha.shape == (3, 3)
    if init == "identity":
        assert float(alpha[0, 0]) == pytest.approx(0.5)
        assert float(alpha[1, 1]) == pytest.approx(0.5)


def test_attn_kernel_on_rejects_unsupported_shapes():
    """attn_kernel='on' must raise a descriptive error for shapes the flash
    kernel cannot compile (mirrors the 'fused' mode; ADVICE r2)."""
    from ego_moment_cle_vit_tpu.models.swin import _use_attn_kernel

    with pytest.raises(ValueError, match="attn_kernel='on'"):
        _use_attn_kernel("on", 49, 192, 3)  # C=192 not a multiple of 128
    # qualifying shape: honored without raising ('direct' dispatch here —
    # no mesh registered, forced mode)
    assert _use_attn_kernel("on", 98, 512, 16) == "direct"
    assert _use_attn_kernel("off", 98, 512, 16) is None


def test_adaptive_gpf_spatial_variant(rng):
    """'spatial' learns a per-token-position coefficient table (the variant
    the reference declares but stubs, gpf_kernel.py:206-217)."""
    tokens_a = jnp.asarray(rng.standard_normal((B, 16, 24)).astype(np.float32))
    tokens_p = jnp.asarray(rng.standard_normal((B, 16, 24)).astype(np.float32))
    gpf = AdaptiveGraphPolynomialFusion(adaptive_type="spatial")
    params = gpf.init(jax.random.PRNGKey(0), tokens_a, tokens_p)
    assert params["params"]["spatial_coeffs"].shape == (16, 3, 3)
    g = gpf.apply(params, tokens_a, tokens_p)
    assert g.shape == (B, 16, 16)
    gn = np.asarray(g)
    np.testing.assert_allclose(gn, gn.transpose(0, 2, 1), atol=1e-5)
    assert gn.min() >= 0.0

    # with a zero delta table the spatial variant must equal the base GPF
    base = GraphPolynomialFusion()
    base_params = {"params": {"alpha_coeffs": params["params"]["alpha_coeffs"]}}
    g_base = base.apply(base_params, tokens_a, tokens_p)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_base), atol=1e-5)

    # a nonzero delta on one row must change the fused graph
    delta = params["params"]["spatial_coeffs"].at[3].add(5.0)
    params2 = {"params": {**params["params"], "spatial_coeffs": delta}}
    g2 = gpf.apply(params2, tokens_a, tokens_p)
    assert not np.allclose(np.asarray(g2), np.asarray(g))

    # gradients flow into the spatial table
    def loss(p):
        return jnp.sum(gpf.apply({"params": p}, tokens_a, tokens_p) ** 2)

    grads = jax.grad(loss)(params2["params"])
    assert float(jnp.abs(grads["spatial_coeffs"]).sum()) > 0


def test_adaptive_gpf_unknown_type_raises(rng):
    tokens = jnp.zeros((1, 4, 8), jnp.float32)
    gpf = AdaptiveGraphPolynomialFusion(adaptive_type="nope")
    with pytest.raises(ValueError, match="adaptive_type"):
        gpf.init(jax.random.PRNGKey(0), tokens, tokens)


def test_adaptive_gpf_attention_variant(rng):
    tokens_a = jnp.asarray(rng.standard_normal((B, 16, 24)).astype(np.float32))
    tokens_p = jnp.asarray(rng.standard_normal((B, 16, 24)).astype(np.float32))
    gpf = AdaptiveGraphPolynomialFusion(adaptive_type="attention")
    params = gpf.init(jax.random.PRNGKey(0), tokens_a, tokens_p)
    g = gpf.apply(params, tokens_a, tokens_p)
    assert g.shape == (B, 16, 16)
    gn = np.asarray(g)
    np.testing.assert_allclose(gn, gn.transpose(0, 2, 1), atol=1e-5)
    assert gn.min() >= 0.0


# ---------------------------------------------------------------------------
# Moment heads
# ---------------------------------------------------------------------------


def _psd_graph(rng, b, n):
    g = rng.standard_normal((b, n, n)).astype(np.float32)
    g = g @ g.transpose(0, 2, 1)
    return jnp.asarray(0.5 * (g + g.transpose(0, 2, 1)))


@pytest.mark.parametrize("third", [False, True])
def test_moment_head_shapes(rng, third):
    n, d, d_out = 16, 24, 64
    tokens = jnp.asarray(rng.standard_normal((B, n, d)).astype(np.float32))
    graph = _psd_graph(rng, B, n)
    head = MomentHead(d_in=d, d_out=d_out, use_third_order=third, sketch_dim=128)
    variables = head.init(jax.random.PRNGKey(0), tokens, graph)
    out = head.apply(variables, tokens, graph)
    assert out.shape == (B, d_out)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_moment_head_remat_matches(rng):
    n, d = 16, 24
    tokens = jnp.asarray(rng.standard_normal((B, n, d)).astype(np.float32))
    graph = _psd_graph(rng, B, n)
    base = MomentHead(d_in=d, d_out=32, remat=False)
    rem = MomentHead(d_in=d, d_out=32, remat=True)
    v = base.init(jax.random.PRNGKey(0), tokens, graph)
    out_base = base.apply(v, tokens, graph)
    out_rem = rem.apply(v, tokens, graph)
    np.testing.assert_allclose(
        np.asarray(out_base), np.asarray(out_rem), atol=1e-5
    )


def test_simplified_moment_head(rng):
    n, d = 16, 24
    tokens = jnp.asarray(rng.standard_normal((B, n, d)).astype(np.float32))
    # nonnegative graph: the simplified head row-normalizes by degree, which
    # (as in the reference) assumes GPF's clamped >= 0 output — a PSD graph
    # with negative entries can have ~zero row sums and blow up.
    graph = jnp.abs(_psd_graph(rng, B, n))
    head = SimplifiedMomentHead(d_in=d, d_out=64, use_third_order=True)
    v = head.init(jax.random.PRNGKey(0), tokens, graph)
    out = head.apply(v, tokens, graph)
    assert out.shape == (B, 64) and bool(jnp.all(jnp.isfinite(out)))


def test_moment_head_batch_one_inference(rng):
    """Ledger #10: the reference's BatchNorm1d breaks batch-1 inference; the
    default LayerNorm head must handle B=1."""
    tokens = jnp.asarray(rng.standard_normal((1, 16, 24)).astype(np.float32))
    graph = _psd_graph(rng, 1, 16)
    head = MomentHead(d_in=24, d_out=32)
    v = head.init(jax.random.PRNGKey(0), tokens, graph)
    out = head.apply(v, tokens, graph)
    assert out.shape == (1, 32)


# ---------------------------------------------------------------------------
# Classifier heads
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("fusion", ["concat", "add", "bilinear"])
def test_classifier_head_fusions(rng, fusion):
    d_cls, d_moment, classes = 24, 32, 10
    cls_f = jnp.asarray(rng.standard_normal((B, d_cls)).astype(np.float32))
    mom_f = jnp.asarray(rng.standard_normal((B, d_moment)).astype(np.float32))
    head = ClassifierHead(
        d_cls=d_cls, d_moment=d_moment, num_classes=classes, fusion_type=fusion,
        hidden_dim=16,
    )
    v = head.init(jax.random.PRNGKey(0), cls_f, mom_f)
    out = head.apply(v, cls_f, mom_f)
    assert out.shape == (B, classes)


def test_classifier_auto_hidden_dim():
    head = ClassifierHead(d_cls=768, d_moment=1024, num_classes=10)
    assert head._hidden() == (768 + 1024) // 2  # max(fusion//2, 256)
    small = ClassifierHead(d_cls=8, d_moment=8, num_classes=10)
    assert small._hidden() == 256


def test_multiscale_and_adaptive_heads(rng):
    d_cls, d_moment, classes = 24, 32, 10
    cls_f = jnp.asarray(rng.standard_normal((B, d_cls)).astype(np.float32))
    mom_f = jnp.asarray(rng.standard_normal((B, d_moment)).astype(np.float32))
    ms = MultiScaleClassifierHead(d_cls=d_cls, d_moment=d_moment, num_classes=classes)
    v = ms.init(jax.random.PRNGKey(0), cls_f, mom_f)
    assert ms.apply(v, cls_f, mom_f).shape == (B, classes)
    ad = AdaptiveClassifierHead(
        d_cls=d_cls, d_moment=d_moment, num_classes=classes, reduction_ratio=4
    )
    v = ad.init(jax.random.PRNGKey(0), cls_f, mom_f)
    assert ad.apply(v, cls_f, mom_f).shape == (B, classes)


# ---------------------------------------------------------------------------
# Backbones
# ---------------------------------------------------------------------------

TINY_VIT = "vit_tiny_patch16_224"


def test_vit_backbone_shapes(rng):
    imgs = jnp.asarray(rng.standard_normal((B, 64, 64, 3)).astype(np.float32))
    bb = CLEViTBackbone(model_name=TINY_VIT, img_size=64)
    v = bb.init(jax.random.PRNGKey(0), imgs)
    out = bb.apply(v, imgs)
    n = (64 // 16) ** 2
    assert out["patch_tokens"].shape == (B, n, 192)
    assert out["global_features"].shape == (B, 192)


def test_swin_backbone_shapes(rng):
    imgs = jnp.asarray(rng.standard_normal((B, 64, 64, 3)).astype(np.float32))
    bb = CLEViTBackbone(model_name="swin_tiny_patch4_window7_224", img_size=64)
    v = bb.init(jax.random.PRNGKey(0), imgs)
    out = bb.apply(v, imgs)
    # 64/4 = 16 -> /2/2/2 = 2 -> N = 4, D = 96*8 = 768
    assert out["patch_tokens"].shape == (B, 4, 768)
    assert out["global_features"].shape == (B, 768)
    # swin path global = mean of tokens
    np.testing.assert_allclose(
        np.asarray(out["global_features"]),
        np.asarray(out["patch_tokens"]).mean(axis=1),
        atol=1e-5,
    )


def test_dual_stream_equals_two_passes(rng):
    imgs_a = jnp.asarray(rng.standard_normal((B, 64, 64, 3)).astype(np.float32))
    imgs_p = jnp.asarray(rng.standard_normal((B, 64, 64, 3)).astype(np.float32))
    ds = CLEViTDualStream(model_name=TINY_VIT, img_size=64)
    v = ds.init(jax.random.PRNGKey(0), imgs_a, imgs_p)
    fa, fp = ds.apply(v, imgs_a, imgs_p)
    # batched-2B pass must equal two independent passes (weight sharing)
    single = ds.apply(v, imgs_a, method=ds.forward_single)
    np.testing.assert_allclose(
        np.asarray(fa["patch_tokens"]), np.asarray(single["patch_tokens"]), atol=1e-5
    )


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


def _tiny_model(**kw):
    defaults = dict(
        num_classes=10,
        backbone_name=TINY_VIT,
        img_size=64,
        moment_d_out=64,
        use_third_order=True,
        isqrt_iterations=3,
        sketch_dim=256,
        classifier_hidden=32,
    )
    defaults.update(kw)
    return EGOMomentCLEViT(**defaults)


def test_full_model_forward_and_losses(rng):
    model = _tiny_model()
    anchor = jnp.asarray(rng.standard_normal((B, 64, 64, 3)).astype(np.float32))
    positive = jnp.asarray(rng.standard_normal((B, 64, 64, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 10, (B,)))
    variables = model.init(jax.random.PRNGKey(0), anchor, positive, labels)
    out = model.apply(variables, anchor, positive, labels, return_features=True)

    assert out["logits"].shape == (B, 10)
    assert out["logits_anchor"].shape == (B, 10)
    assert out["logits_positive"].shape == (B, 10)
    for k in (
        "loss_main_ce",
        "loss_anchor_ce",
        "loss_positive_ce",
        "loss_triplet",
        "loss_align",
    ):
        assert k in out["loss_dict"], k
        assert np.isfinite(float(out["loss_dict"][k])), k
    feats = out["features"]
    n = (64 // 16) ** 2
    assert feats["fused_graph"].shape == (B, n, n)
    assert feats["moment_features"].shape == (B, 64)
    assert feats["gpf_coefficients"].shape == (3, 3)


def test_model_lambda_align_zero_drops_term(rng):
    model = _tiny_model(lambda_align=0.0)
    anchor = jnp.asarray(rng.standard_normal((B, 64, 64, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 10, (B,)))
    variables = model.init(jax.random.PRNGKey(0), anchor, anchor, labels)
    out = model.apply(variables, anchor, anchor, labels)
    assert "loss_align" not in out["loss_dict"]


def test_model_lambda_triplet_zero_drops_term(rng):
    model = _tiny_model(lambda_triplet=0.0)
    anchor = jnp.asarray(rng.standard_normal((B, 64, 64, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 10, (B,)))
    variables = model.init(jax.random.PRNGKey(0), anchor, anchor, labels)
    out = model.apply(variables, anchor, anchor, labels)
    assert "loss_triplet" not in out["loss_dict"]
    assert np.isfinite(float(out["loss"]))


def test_model_gradients_cover_all_params(rng):
    model = _tiny_model(use_third_order=False, moment_d_out=32)
    anchor = jnp.asarray(rng.standard_normal((B, 64, 64, 3)).astype(np.float32))
    positive = jnp.asarray(rng.standard_normal((B, 64, 64, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 10, (B,)))
    variables = model.init(jax.random.PRNGKey(0), anchor, positive, labels)

    def loss_fn(params):
        out = model.apply(
            {**variables, "params": params}, anchor, positive, labels,
            deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return out["loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    # every parameter receives a gradient signal somewhere in the tree
    nonzero = sum(float(jnp.sum(jnp.abs(g))) > 0 for g in leaves)
    assert nonzero / len(leaves) > 0.9, f"{nonzero}/{len(leaves)} grads nonzero"


def test_model_batchnorm_parity_mode(rng):
    """norm='batch' (reference BatchNorm1d parity) must init batch_stats and
    run with mutable stats in training mode."""
    model = _tiny_model(norm="batch", use_third_order=False, moment_d_out=32)
    anchor = jnp.asarray(rng.standard_normal((4, 64, 64, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 10, (4,)))
    variables = model.init(jax.random.PRNGKey(0), anchor, anchor, labels)
    assert "batch_stats" in variables
    out, mutated = model.apply(
        variables,
        anchor,
        anchor,
        labels,
        deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(float(out["loss"]))
    assert "batch_stats" in mutated


def test_inference_matches_dual_forward(rng):
    """The specialized single-pass inference path must match the full dual
    forward with anchor == positive (SURVEY.md §3.5)."""
    model = _tiny_model(use_third_order=False, moment_d_out=32)
    images = jnp.asarray(rng.standard_normal((B, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), images, images)
    dual = model.apply(variables, images, images)["logits"]
    single = model.apply(variables, images, method=model.inference)
    np.testing.assert_allclose(np.asarray(dual), np.asarray(single), atol=1e-4)
