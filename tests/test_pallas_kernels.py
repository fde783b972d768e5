"""Pallas kernel correctness vs the pure-XLA reference ops (interpret mode
on CPU; the same kernels compile natively on TPU — microbenchmarked by
scripts/microbench_pallas.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ego_moment_cle_vit_tpu.ops import (
    gpf_fuse,
    newton_schulz_isqrt,
    token_similarity_graph,
)

B, N, D = 2, 24, 32


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("similarity", ["cosine", "dot"])
def test_fused_gpf_matches_xla(similarity):
    from ego_moment_cle_vit_tpu.ops.pallas import fused_gpf_pallas

    rng = np.random.default_rng(11)
    ta = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    tp = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    coeffs = jnp.asarray(rng.uniform(0, 1, (3, 3)).astype(np.float32))

    got = fused_gpf_pallas(ta, tp, coeffs, similarity, 1e-6, True)
    want = gpf_fuse(
        token_similarity_graph(ta, similarity),
        token_similarity_graph(tp, similarity),
        coeffs,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-2, rtol=1e-4)


@pytest.mark.parametrize("similarity", ["cosine", "dot"])
def test_fused_gpf_gradients_match_xla(similarity):
    """The fused analytic backward kernel must match XLA autodiff exactly
    (tokens AND coefficient grads, both similarity modes)."""
    from ego_moment_cle_vit_tpu.ops.pallas import fused_gpf_pallas

    rng = np.random.default_rng(11)
    ta = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    tp = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    coeffs = jnp.asarray(rng.uniform(0, 1, (3, 3)).astype(np.float32))

    def loss_pallas(a, p, c):
        return jnp.sum(fused_gpf_pallas(a, p, c, similarity, 1e-6, True) ** 2)

    def loss_xla(a, p, c):
        g = gpf_fuse(
            token_similarity_graph(a, similarity),
            token_similarity_graph(p, similarity),
            c,
        )
        return jnp.sum(g**2)

    ga = jax.grad(loss_pallas, argnums=(0, 1, 2))(ta, tp, coeffs)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(ta, tp, coeffs)
    for a, b in zip(ga, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)


def test_pallas_newton_schulz_matches_xla():
    from ego_moment_cle_vit_tpu.ops.pallas import newton_schulz_isqrt_pallas

    rng = np.random.default_rng(12)
    a = rng.standard_normal((B, D, D)).astype(np.float32)
    m = a @ a.transpose(0, 2, 1) / D + 0.5 * np.eye(D, dtype=np.float32)
    got = newton_schulz_isqrt_pallas(jnp.asarray(m), 5, 1e-5)
    want = newton_schulz_isqrt(jnp.asarray(m), 5, assume_symmetric=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-2, rtol=1e-4)


def test_pallas_newton_schulz_grad_matches():
    from ego_moment_cle_vit_tpu.ops.pallas import newton_schulz_isqrt_pallas

    rng = np.random.default_rng(12)
    a = rng.standard_normal((B, 16, 16)).astype(np.float32)
    m = jnp.asarray(a @ a.transpose(0, 2, 1) / 16 + 0.5 * np.eye(16, dtype=np.float32))

    gp = jax.grad(lambda x: jnp.sum(newton_schulz_isqrt_pallas(x, 5, 1e-5) ** 2))(m)
    gx = jax.grad(
        lambda x: jnp.sum(newton_schulz_isqrt(x, 5, assume_symmetric=True) ** 2)
    )(m)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-3, rtol=1e-3)


def test_pallas_newton_schulz_bf16_variant_close_to_fp32():
    """The bf16-VMEM kernel (D>800 dispatch) tracks the fp32 XLA iteration
    to bf16 rounding accuracy — the iteration is contractive, so per-step
    rounding must not compound."""
    from ego_moment_cle_vit_tpu.ops.pallas.newton_schulz import _forward_bf16

    rng = np.random.default_rng(13)
    d = 64
    a = rng.standard_normal((B, d, d)).astype(np.float32)
    m = a @ a.transpose(0, 2, 1) / d + 0.5 * np.eye(d, dtype=np.float32)
    got = np.asarray(_forward_bf16(jnp.asarray(m), 5, 1e-5))
    want = np.asarray(newton_schulz_isqrt(jnp.asarray(m), 5, assume_symmetric=True))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 2e-2, rel


def test_availability_predicates():
    from ego_moment_cle_vit_tpu.ops.pallas import (
        fused_gpf_available,
        newton_schulz_available,
    )

    # CPU platform -> never
    assert not fused_gpf_available(196, 768, platform="cpu")
    assert not newton_schulz_available(768, platform="cpu")
    # TPU, single device: sized by VMEM budget
    assert fused_gpf_available(196, 1536, platform="tpu", n_devices=1)
    assert newton_schulz_available(768, platform="tpu", n_devices=1)
    # flagship D=1024 now covered by the bf16-storage variant
    assert newton_schulz_available(1024, platform="tpu", n_devices=1)
    # swin_large D=1536 covered by the streamed two-buffer variant
    assert newton_schulz_available(1536, platform="tpu", n_devices=1)
    # far-larger D still falls back to XLA
    assert not newton_schulz_available(4096, platform="tpu", n_devices=1)


def test_availability_gates_multi_device():
    """GSPMD cannot partition pallas_call: on a >1-device TPU process every
    kernel gate must choose the XLA fallback (same rule as the attention
    kernel's _single_tpu check, models/swin.py).  Regression for the
    multi-chip dispatch hole flagged in VERDICT round 2."""
    from ego_moment_cle_vit_tpu.ops.pallas import (
        fused_gpf_available,
        newton_schulz_available,
    )

    # shapes that DO qualify on one device must be refused on a mesh
    assert not fused_gpf_available(196, 1536, platform="tpu", n_devices=8)
    assert not newton_schulz_available(768, platform="tpu", n_devices=8)
    assert not newton_schulz_available(1536, platform="tpu", n_devices=2)

    # defaulted n_devices reads the live process (8 virtual CPU devices
    # here): combined with platform="tpu" it must still refuse
    assert not fused_gpf_available(196, 1536, platform="tpu")
    assert not newton_schulz_available(768, platform="tpu")

    from ego_moment_cle_vit_tpu.ops.pallas import window_attention_available

    # all four Swin-Base stage shapes qualify
    assert window_attention_available(98, 128, 4)
    assert window_attention_available(98, 256, 8)
    assert window_attention_available(98, 512, 16)
    assert window_attention_available(49, 1024, 32)
    # ViT-small/base/large at 224 qualify; vit_tiny (C=192) does not
    assert window_attention_available(197, 384, 6)
    assert window_attention_available(197, 768, 12)
    assert window_attention_available(197, 1024, 16)
    assert not window_attention_available(197, 192, 3)
    # 448-input ViT (T=785) exceeds the single-tile budget -> XLA fallback
    assert not window_attention_available(785, 768, 12)


def _ref_window_attention(qkv, bias, mask, h):
    """Plain-jnp reference for the fused kernel (same math as the XLA path
    in models/swin.py:WindowAttention)."""
    b, w, t, c3 = qkv.shape
    c = c3 // 3
    d = c // h
    q, k, v = [
        qkv[..., i * c : (i + 1) * c]
        .astype(jnp.float32)
        .reshape(b, w, t, h, d)
        for i in range(3)
    ]
    logits = jnp.einsum("bwthd,bwshd->bwhts", q * d**-0.5, k)
    logits = logits + bias[None, None] + mask[None, :, None]
    p = jax.nn.softmax(logits, -1)
    return jnp.einsum("bwhts,bwshd->bwthd", p, v).reshape(b, w, t, c)


@pytest.mark.parametrize(
    "b,w,t,c,h,masked",
    [
        (4, 8, 98, 128, 4, True),   # stage0-like, shifted
        (2, 2, 98, 512, 16, True),  # stage2-like
        (2, 1, 49, 1024, 32, False),  # stage3-like, no mask
    ],
)
def test_flash_window_attention_matches_reference(b, w, t, c, h, masked):
    from ego_moment_cle_vit_tpu.ops.pallas import flash_window_attention

    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, w, t, 3 * c), jnp.float32)
    bias = jax.random.normal(jax.random.PRNGKey(1), (h, t, t), jnp.float32) * 0.1
    mask = (
        jnp.where(
            jax.random.bernoulli(jax.random.PRNGKey(2), 0.2, (w, t, t)),
            -100.0,
            0.0,
        )
        if masked
        else jnp.zeros((1, t, t), jnp.float32)
    )
    got = flash_window_attention(qkv, bias, mask, h)
    want = _ref_window_attention(qkv, bias, mask, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_flash_window_attention_gradients_match():
    from ego_moment_cle_vit_tpu.ops.pallas import flash_window_attention

    b, w, t, c, h = 2, 4, 98, 128, 4
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, w, t, 3 * c), jnp.float32)
    bias = jax.random.normal(jax.random.PRNGKey(1), (h, t, t), jnp.float32) * 0.1
    mask = jnp.where(
        jax.random.bernoulli(jax.random.PRNGKey(2), 0.2, (w, t, t)), -100.0, 0.0
    )

    def loss(fn):
        return lambda qkv, bias: jnp.sum(jnp.sin(fn(qkv, bias, mask, h)))

    gk = jax.grad(loss(flash_window_attention), (0, 1))(qkv, bias)
    gr = jax.grad(
        loss(lambda q, b, m, hh: _ref_window_attention(q, b, m, hh)), (0, 1)
    )(qkv, bias)
    for a, bb in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-4)


def test_swin_attn_kernel_path_matches_xla_path():
    """Full Swin forward+grad with the fused attention kernel vs without."""
    from ego_moment_cle_vit_tpu.models.swin import Swin, SwinConfig

    kw = dict(img_size=56, embed_dim=128, depths=(2,), num_heads=(4,))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 56, 56, 3), jnp.float32)
    m_off = Swin(SwinConfig(attn_kernel="off", **kw))
    m_on = Swin(SwinConfig(attn_kernel="on", **kw))
    params = m_off.init(jax.random.PRNGKey(1), x)
    y0 = m_off.apply(params, x)
    y1 = m_on.apply(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-4)
    g0 = jax.grad(lambda p: jnp.sum(jnp.sin(m_off.apply(p, x))))(params)
    g1 = jax.grad(lambda p: jnp.sum(jnp.sin(m_on.apply(p, x))))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_pallas_newton_schulz_streamed_variant_close_to_fp32():
    """The two-buffer streamed-M kernel (swin_large D-range) matches the
    fp32 XLA iteration to bf16 rounding accuracy at a reduced D."""
    from ego_moment_cle_vit_tpu.ops.pallas.newton_schulz import _forward_bf16

    rng = np.random.default_rng(17)
    d = 512  # smallest D satisfying the streamed kernel's tiling grid
    a = rng.standard_normal((B, d, 96)).astype(np.float32)
    m = a @ a.transpose(0, 2, 1) / 96 + 0.5 * np.eye(d, dtype=np.float32)
    got = np.asarray(_forward_bf16(jnp.asarray(m), 5, 1e-5, force_streamed=True))
    want = np.asarray(newton_schulz_isqrt(jnp.asarray(m), 5, assume_symmetric=True))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 2e-2, rel


def test_vit_attn_kernel_path_matches_xla_path():
    """ViT reuses the fused kernel with W=1 and zero bias/mask."""
    from ego_moment_cle_vit_tpu.models.vit import ViT, ViTConfig

    kw = dict(img_size=64, patch_size=16, embed_dim=128, depth=2, num_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3), jnp.float32)
    m_off = ViT(ViTConfig(attn_kernel="off", **kw))
    m_on = ViT(ViTConfig(attn_kernel="on", **kw))
    params = m_off.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(
        np.asarray(m_off.apply(params, x)),
        np.asarray(m_on.apply(params, x)),
        atol=2e-4,
    )
    g0 = jax.grad(lambda p: jnp.sum(jnp.sin(m_off.apply(p, x))))(params)
    g1 = jax.grad(lambda p: jnp.sum(jnp.sin(m_on.apply(p, x))))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def _ref_plain_attention(qkv, num_heads):
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    x = qkv.reshape(b, n, 3, num_heads, d).astype(jnp.float32)
    q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]  # [B,N,H,d]
    logits = jnp.einsum("bnhd,bmhd->bhnm", q * d**-0.5, k)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs, v)
    return out.reshape(b, n, c).astype(qkv.dtype)


@pytest.mark.parametrize("n,c,h", [(197, 256, 4), (785, 128, 2)])
def test_flash_attention_tiled_parity(n, c, h):
    """The q-tiled flash kernel (interpret mode on CPU) matches plain MHSA
    for both a ViT-224 shape and the long T=785 (448-input) shape —
    forward AND input gradients (flash-style custom VJP)."""
    from ego_moment_cle_vit_tpu.ops.pallas.flash_attention import (
        flash_attention_tiled,
    )

    rng = np.random.default_rng(5)
    qkv = jnp.asarray(rng.standard_normal((2, n, 3 * c)).astype(np.float32))
    got = flash_attention_tiled(qkv, h)
    want = _ref_plain_attention(qkv, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def loss(fn):
        return lambda x: jnp.sum(jnp.sin(fn(x, h) * 0.3))

    gk = jax.grad(loss(flash_attention_tiled))(qkv)
    gr = jax.grad(loss(_ref_plain_attention))(qkv)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=2e-4)


def test_flash_attention_tiled_availability():
    from ego_moment_cle_vit_tpu.ops.pallas import flash_attention_tiled_available

    # the BASELINE configs[4] stretch shape: ViT-L/16 at 448 -> T=785
    assert flash_attention_tiled_available(785, 1024, 16, platform="tpu")
    # ViT-224 shapes qualify too (window kernel is preferred by dispatch)
    assert flash_attention_tiled_available(197, 768, 12, platform="tpu")
    # head dim not sublane-aligned -> refuse
    assert not flash_attention_tiled_available(197, 192, 16, platform="tpu")
    # non-TPU -> refuse
    assert not flash_attention_tiled_available(785, 1024, 16, platform="cpu")


def test_vit_resolve_attn_path_dispatch():
    from ego_moment_cle_vit_tpu.models.vit import _resolve_attn_path

    # 'on' prefers the window kernel where it fits, tiled for long T
    assert _resolve_attn_path("on", 197, 256, 4) == "window"
    assert _resolve_attn_path("on", 785, 1024, 16) == "tiled"
    assert _resolve_attn_path("off", 197, 256, 4) == "none"
    with pytest.raises(ValueError, match="neither attention kernel"):
        _resolve_attn_path("on", 197, 68, 17)  # d=4, not sublane-aligned


def test_vit_tiled_kernel_matches_xla_at_448_shape():
    """Full ViT block path with the tiled kernel vs the XLA path at a long
    sequence (reduced width, T=785 real token count)."""
    from ego_moment_cle_vit_tpu.models.vit import ViT, ViTConfig

    cfg = dict(
        img_size=448, patch_size=16, embed_dim=64, depth=1, num_heads=2
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 448, 448, 3), jnp.float32)
    m_off = ViT(ViTConfig(attn_kernel="off", **cfg))
    m_on = ViT(ViTConfig(attn_kernel="on", **cfg))
    params = m_off.init(jax.random.PRNGKey(1), x)
    y0 = m_off.apply(params, x)
    y1 = m_on.apply(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-4)
    g0 = jax.grad(lambda p: jnp.mean(jnp.sin(m_off.apply(p, x))))(params)
    g1 = jax.grad(lambda p: jnp.mean(jnp.sin(m_on.apply(p, x))))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_swin_spatial_kernel_path_matches_xla_path():
    """The spatial-layout kernel (partition/reverse absorbed into block DMA)
    must match the XLA path exactly — forward and every parameter gradient,
    including shifted blocks (mask routing via the grid index map)."""
    from ego_moment_cle_vit_tpu.models.swin import Swin, SwinConfig

    for kw, shape in [
        (dict(img_size=56, embed_dim=128, depths=(2,), num_heads=(4,)),
         (2, 56, 56, 3)),
        (dict(img_size=64, embed_dim=128, depths=(2,), num_heads=(4,)),
         (2, 64, 64, 3)),  # 16x16 map pads to 21 -> exercises pad masks
        (dict(img_size=224, embed_dim=128, depths=(2,), num_heads=(4,)),
         (1, 224, 224, 3)),  # 56x56 map: full-row tile 8, mm groups of 2
    ]:
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
        m_off = Swin(SwinConfig(attn_kernel="off", **kw))
        m_sp = Swin(SwinConfig(attn_kernel="spatial", **kw))
        params = m_off.init(jax.random.PRNGKey(1), x)
        # identical parameter trees (checkpoint/porting compatibility)
        assert jax.tree_util.tree_structure(
            params
        ) == jax.tree_util.tree_structure(m_sp.init(jax.random.PRNGKey(1), x))
        y0 = m_off.apply(params, x)
        y1 = m_sp.apply(params, x)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-4)
        g0 = jax.grad(lambda p: jnp.sum(jnp.sin(m_off.apply(p, x))))(params)
        g1 = jax.grad(lambda p: jnp.sum(jnp.sin(m_sp.apply(p, x))))(params)
        for a, b in zip(
            jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_spatial_kernel_availability_and_forcing_errors():
    from ego_moment_cle_vit_tpu.models.swin import _use_spatial_kernel
    from ego_moment_cle_vit_tpu.ops.pallas.window_attention import (
        spatial_window_attention_available,
    )

    # every Swin-Base 224 stage qualifies at full-row pack (pack*ws == Wp,
    # the Mosaic block-shape rule — width tile must equal Wp or be %8)
    assert spatial_window_attention_available(56, 56, 7, 128, 4, 8)
    assert spatial_window_attention_available(14, 14, 7, 512, 16, 2)
    assert spatial_window_attention_available(7, 7, 7, 1024, 32, 1)
    # partial-row tile 2*7=14 of Wp=56: neither ==Wp nor %8 -> Mosaic-illegal
    assert not spatial_window_attention_available(56, 56, 7, 128, 4, 2)
    # Wp not a multiple of pack*ws -> refuse
    assert not spatial_window_attention_available(14, 21, 7, 512, 16, 2)
    # matmul group must divide the tile pack
    assert spatial_window_attention_available(56, 56, 7, 128, 4, 8, 2)
    assert not spatial_window_attention_available(56, 56, 7, 128, 4, 8, 3)
    with pytest.raises(ValueError, match="attn_kernel='spatial'"):
        _use_spatial_kernel("spatial", 14, 14, 7, 192, 3, 2, 2)  # C=192


def test_spatial_kernel_mm_pack_matches_dense_pack():
    """mm_pack groups (packed-problem-size matmuls inside a full-row DMA
    tile) must agree with the dense full-tile attention: same math, the
    cross-window logits the dense form masks off are simply never
    computed."""
    from ego_moment_cle_vit_tpu.ops.pallas.window_attention import (
        flash_window_attention_spatial,
    )

    b, hp, wp, ws, c, h = 2, 14, 28, 7, 128, 4
    tile = wp // ws  # 4
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, hp, wp, 3 * c), jnp.float32)

    def run(mm):
        t = mm * ws * ws
        n = ws * ws
        bias1 = jax.random.normal(jax.random.PRNGKey(1), (h, n, n), jnp.float32) * 0.1
        # expand the per-window bias to the mm-packed grid with cross seal
        eye = jnp.eye(mm)
        bias = jnp.einsum("pq,hnm->hpnqm", eye, bias1).reshape(h, t, t)
        bias = bias + (-100.0) * (
            1.0 - jnp.repeat(jnp.repeat(eye, n, axis=0), n, axis=1)
        )[None]
        mask = jnp.zeros((1, t, t), jnp.float32)
        out = flash_window_attention_spatial(qkv, bias, mask, h, ws, tile, mm)
        return out

    np.testing.assert_allclose(
        np.asarray(run(2)), np.asarray(run(4)), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(run(1)), np.asarray(run(2)), atol=2e-4
    )

    # gradients agree too (dense pack-4 vs paired pack-2)
    def loss(mm):
        return lambda q: jnp.sum(jnp.sin(run_g(q, mm)))

    def run_g(q, mm):
        t = mm * ws * ws
        bias = jnp.zeros((h, t, t), jnp.float32) + (-100.0) * (
            1.0
            - jnp.repeat(
                jnp.repeat(jnp.eye(mm), ws * ws, axis=0), ws * ws, axis=1
            )
        )[None]
        mask = jnp.zeros((1, t, t), jnp.float32)
        return flash_window_attention_spatial(q, bias, mask, h, ws, tile, mm)

    g2 = jax.grad(loss(2))(qkv)
    g4 = jax.grad(loss(4))(qkv)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g4), atol=2e-3)


def test_flash_window_attention_bf16_gradient_parity():
    """bf16-input gradient path: the backward kernels cast the f32 softmax
    probs and ds to the INPUT dtype before the dv/dq/dk matmuls (dtype-native
    MXU).  The f32-input parity tests make those casts no-ops, so this test
    pins the accepted bf16 gradient error against the f32 XLA reference:
    relative L2 error must stay under 2% per gradient leaf (bf16 has ~3
    decimal digits; the attention chain is contractive so rounding must not
    compound past one bf16 ulp-scale).  Covers both the packed-layout and
    spatial-layout kernels (ADVICE round 3, window_attention.py:437)."""
    from ego_moment_cle_vit_tpu.ops.pallas import flash_window_attention
    from ego_moment_cle_vit_tpu.ops.pallas.window_attention import (
        flash_window_attention_spatial,
    )

    b, w, t, c, h = 2, 4, 98, 128, 4
    ws = 7
    qkv32 = jax.random.normal(jax.random.PRNGKey(0), (b, w, t, 3 * c), jnp.float32)
    qkv16 = qkv32.astype(jnp.bfloat16)
    bias = jax.random.normal(jax.random.PRNGKey(1), (h, t, t), jnp.float32) * 0.1
    mask = jnp.where(
        jax.random.bernoulli(jax.random.PRNGKey(2), 0.2, (w, t, t)), -100.0, 0.0
    )

    def rel_err(a, b):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)

    # packed-layout kernel: bf16 grads vs f32 XLA reference grads
    def loss_kernel(q):
        return jnp.sum(jnp.sin(flash_window_attention(q, bias, mask, h)
                               .astype(jnp.float32)))

    def loss_ref(q):
        return jnp.sum(jnp.sin(_ref_window_attention(q, bias, mask, h)))

    g16 = jax.grad(loss_kernel)(qkv16)
    gref = jax.grad(loss_ref)(qkv32)
    assert g16.dtype == jnp.bfloat16
    e = rel_err(g16, gref)
    assert e < 2e-2, f"packed bf16 grad rel err {e}"

    # spatial-layout kernel at a 2-window-row geometry (hp=14, wp=14)
    hp = wp = 14
    tile = wp // ws  # 2
    qkv_sp32 = jax.random.normal(
        jax.random.PRNGKey(3), (b, hp, wp, 3 * c), jnp.float32
    )
    qkv_sp16 = qkv_sp32.astype(jnp.bfloat16)
    n = ws * ws
    t2 = tile * n
    bias2 = jax.random.normal(jax.random.PRNGKey(4), (h, t2, t2), jnp.float32) * 0.1
    mask2 = jnp.zeros((1, t2, t2), jnp.float32)

    def loss_sp(q):
        return jnp.sum(jnp.sin(
            flash_window_attention_spatial(q, bias2, mask2, h, ws, tile, tile)
            .astype(jnp.float32)
        ))

    gs16 = jax.grad(loss_sp)(qkv_sp16)
    gs32 = jax.grad(loss_sp)(qkv_sp32)
    assert gs16.dtype == jnp.bfloat16
    e = rel_err(gs16, gs32)
    assert e < 2e-2, f"spatial bf16 grad rel err {e}"


def test_fast_softmax_parity_and_underflow_safety(monkeypatch):
    """The shift-free softmax (EMCT_ATTN_FAST_SOFTMAX) must match the
    shifted softmax to f32 rounding for sane logits, and an all-underflow
    row (garbage pad tokens at a mask floor) must yield a ZERO row, not
    NaN — forward and through the backward's ds chain."""
    from ego_moment_cle_vit_tpu.ops.pallas import window_attention as wa

    monkeypatch.setattr(wa, "_FAST_SOFTMAX", True)

    b, w, t, c, h = 2, 2, 98, 128, 4
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, w, t, 3 * c), jnp.float32)
    bias = jax.random.normal(jax.random.PRNGKey(1), (h, t, t), jnp.float32) * 0.1
    mask = jnp.where(
        jax.random.bernoulli(jax.random.PRNGKey(2), 0.2, (w, t, t)), -100.0, 0.0
    )
    got = wa.flash_window_attention(qkv, bias, mask, h)
    want = _ref_window_attention(qkv, bias, mask, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    g = jax.grad(
        lambda q: jnp.sum(jnp.sin(wa.flash_window_attention(q, bias, mask, h)))
    )(qkv)
    gr = jax.grad(
        lambda q: jnp.sum(jnp.sin(_ref_window_attention(q, bias, mask, h)))
    )(qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=2e-4)

    # all-underflow row: every logit below exp's f32 underflow
    deep_mask = jnp.full((1, t, t), -200.0, jnp.float32)
    out = wa.flash_window_attention(qkv, jnp.zeros_like(bias), deep_mask, h)
    assert np.all(np.isfinite(np.asarray(out)))
    assert float(jnp.max(jnp.abs(out))) == 0.0
    g2 = jax.grad(
        lambda q: jnp.sum(
            wa.flash_window_attention(q, jnp.zeros_like(bias), deep_mask, h)
        )
    )(qkv)
    assert np.all(np.isfinite(np.asarray(g2)))


def test_swin_head_padded_spatial_kernel_c192():
    """Head-PADDED dispatch (round 4): a C=192 / H=6 stage (swin_large
    stage0 — d=32, C not a multiple of 128) runs the spatial kernel with
    each head slot zero-widened to 64 lanes and an explicit d^-1/2 scale.
    Forward and all parameter gradients must match the XLA path exactly
    (zero pad lanes contribute nothing)."""
    from ego_moment_cle_vit_tpu.models.swin import Swin, SwinConfig

    kw = dict(img_size=56, embed_dim=192, depths=(2,), num_heads=(6,))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 56, 56, 3), jnp.float32)
    m_off = Swin(SwinConfig(attn_kernel="off", **kw))
    m_sp = Swin(SwinConfig(attn_kernel="spatial", **kw))
    params = m_off.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        m_sp.init(jax.random.PRNGKey(1), x)
    )
    y0 = m_off.apply(params, x)
    y1 = m_sp.apply(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-4)
    g0 = jax.grad(lambda p: jnp.sum(jnp.sin(m_off.apply(p, x))))(params)
    g1 = jax.grad(lambda p: jnp.sum(jnp.sin(m_sp.apply(p, x))))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
