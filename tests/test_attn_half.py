"""Fused attention-half kernel (LN1 + qkv + window attention + proj +
residual in one VMEM pass — ops/pallas/attn_half.py) vs the XLA path.

Interpret mode on CPU; the same kernel compiles natively on TPU where the
dispatch gates it to the bandwidth-bound stages (C <= 256)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _assert_swin_paths_match(kw, shape, atol_fwd=2e-4, atol_grad=2e-3):
    from ego_moment_cle_vit_tpu.models.swin import Swin, SwinConfig

    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    m_off = Swin(SwinConfig(attn_kernel="off", **kw))
    m_f = Swin(SwinConfig(attn_kernel="fused_half", **kw))
    params = m_off.init(jax.random.PRNGKey(1), x)
    # identical parameter trees (checkpoint compatibility across paths)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        m_f.init(jax.random.PRNGKey(1), x)
    )
    y0 = m_off.apply(params, x)
    y1 = m_f.apply(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=atol_fwd)
    g0 = jax.grad(lambda p: jnp.sum(jnp.sin(m_off.apply(p, x))))(params)
    g1 = jax.grad(lambda p: jnp.sum(jnp.sin(m_f.apply(p, x))))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol_grad)


def test_fused_half_matches_xla_stage0_geometry():
    """56x56 map, C=128, 2 blocks (one shifted) — the stage0 shape the
    kernel targets; includes shift masks and the in-kernel residual."""
    _assert_swin_paths_match(
        dict(img_size=56, embed_dim=128, depths=(2,), num_heads=(4,)),
        (2, 56, 56, 3),
    )


def test_fused_half_matches_xla_padded_geometry():
    """64x64 input -> 16x16 map pads to 21: exercises pad masks + the
    pad-region slice-off with the in-kernel residual."""
    _assert_swin_paths_match(
        dict(img_size=64, embed_dim=128, depths=(2,), num_heads=(4,)),
        (2, 64, 64, 3),
    )


def test_fused_half_matches_xla_full_row_tile():
    """224 input -> 56x56 map: full-row tile pack 8, mm groups of 2."""
    _assert_swin_paths_match(
        dict(img_size=224, embed_dim=128, depths=(2,), num_heads=(4,)),
        (1, 224, 224, 3),
    )


def test_fused_half_bf16_close_to_f32_path():
    """bf16 production dtype: the fused path must track the XLA bf16 path
    within bf16 tolerance (LN stays fp32 inside the kernel)."""
    from ego_moment_cle_vit_tpu.models.swin import Swin, SwinConfig

    kw = dict(img_size=56, embed_dim=128, depths=(2,), num_heads=(4,))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 56, 56, 3), jnp.float32)
    m_off = Swin(SwinConfig(attn_kernel="off", **kw), dtype=jnp.bfloat16)
    m_f = Swin(SwinConfig(attn_kernel="fused_half", **kw), dtype=jnp.bfloat16)
    params = m_off.init(jax.random.PRNGKey(1), x)
    y0 = np.asarray(m_off.apply(params, x), np.float32)
    y1 = np.asarray(m_f.apply(params, x), np.float32)
    rel = np.linalg.norm(y0 - y1) / max(np.linalg.norm(y0), 1e-9)
    assert rel < 2e-2, rel


def test_attn_half_availability_gate():
    from ego_moment_cle_vit_tpu.ops.pallas.attn_half import attn_half_available

    # stage0/1 shapes qualify
    assert attn_half_available(56, 56, 7, 128, 4, 8, 2)
    assert attn_half_available(28, 28, 7, 256, 8, 4, 2)
    # C >= 512: the round-2 lesson stands, kernel refuses (spatial kernel
    # handles those stages)
    assert not attn_half_available(14, 14, 7, 512, 16, 2, 2)
    # lane rule
    assert not attn_half_available(56, 56, 7, 192, 6, 8, 2)
    # geometry rules
    assert not attn_half_available(56, 56, 7, 128, 4, 8, 3)  # mm !| pack


def test_fused_half_mode_dispatch():
    """'fused_half' selects the kernel where supported and silently falls
    back (None -> regular auto dispatch) on wider blocks, so the mode is
    usable for a whole model."""
    from ego_moment_cle_vit_tpu.models.swin import _use_fused_half

    assert _use_fused_half("fused_half", 14, 14, 7, 512, 16, 2, 2) is None
    assert _use_fused_half("fused_half", 56, 56, 7, 128, 4, 8, 2) == "direct"
    assert _use_fused_half("off", 56, 56, 7, 128, 4, 8, 2) is None


def test_fused_half_mode_full_model_mixed_stages():
    """A 2-stage Swin under 'fused_half' (both stages within the C<=256
    gate here; wider stages dispatch like 'auto' per
    test_fused_half_mode_dispatch) — outputs must match the all-XLA
    path."""
    from ego_moment_cle_vit_tpu.models.swin import Swin, SwinConfig

    kw = dict(img_size=56, embed_dim=128, depths=(1, 1), num_heads=(4, 8))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 56, 56, 3), jnp.float32)
    m_off = Swin(SwinConfig(attn_kernel="off", **kw))
    m_f = Swin(SwinConfig(attn_kernel="fused_half", **kw))
    params = m_off.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(
        np.asarray(m_off.apply(params, x)),
        np.asarray(m_f.apply(params, x)),
        atol=2e-4,
    )
