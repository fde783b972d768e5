"""Weight-porting tests: a timm-convention torch ViT forward (implemented
here from the architecture definition) must match our flax ViT given
converted weights — this is the golden-parity check for pretrained-backbone
porting (SURVEY.md §7 hard-part #5)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ego_moment_cle_vit_tpu.models.vit import ViT, ViTConfig
from ego_moment_cle_vit_tpu.utils.port_weights import (
    convert_vit_state_dict,
    convert_swin_state_dict,
)

B, IMG, PATCH, DIM, DEPTH, HEADS = 2, 32, 8, 16, 2, 2


def _make_timm_style_vit_sd(rng):
    """Random state_dict with timm ViT names/shapes (torch conventions)."""
    g = torch.Generator().manual_seed(42)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    n = (IMG // PATCH) ** 2
    sd = {
        "cls_token": t(1, 1, DIM),
        "pos_embed": t(1, n + 1, DIM),
        "patch_embed.proj.weight": t(DIM, 3, PATCH, PATCH),
        "patch_embed.proj.bias": t(DIM),
        "norm.weight": 1 + 0.1 * t(DIM),
        "norm.bias": 0.1 * t(DIM),
    }
    for i in range(DEPTH):
        p = f"blocks.{i}"
        sd.update(
            {
                f"{p}.norm1.weight": 1 + 0.1 * t(DIM),
                f"{p}.norm1.bias": 0.1 * t(DIM),
                f"{p}.norm2.weight": 1 + 0.1 * t(DIM),
                f"{p}.norm2.bias": 0.1 * t(DIM),
                f"{p}.attn.qkv.weight": t(3 * DIM, DIM),
                f"{p}.attn.qkv.bias": t(3 * DIM),
                f"{p}.attn.proj.weight": t(DIM, DIM),
                f"{p}.attn.proj.bias": t(DIM),
                f"{p}.mlp.fc1.weight": t(4 * DIM, DIM),
                f"{p}.mlp.fc1.bias": t(4 * DIM),
                f"{p}.mlp.fc2.weight": t(DIM, 4 * DIM),
                f"{p}.mlp.fc2.bias": t(DIM),
            }
        )
    return sd


def _torch_vit_forward(sd, x):
    """timm-convention ViT forward in raw torch ops (pre-LN, erf GELU)."""
    import torch.nn.functional as F

    x = F.conv2d(
        x, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"], stride=PATCH
    )  # [B, D, h, w]
    b, d, h, w = x.shape
    x = x.flatten(2).transpose(1, 2)  # [B, N, D]
    cls = sd["cls_token"].expand(b, -1, -1)
    x = torch.cat([cls, x], dim=1) + sd["pos_embed"]

    head_dim = DIM // HEADS
    for i in range(DEPTH):
        p = f"blocks.{i}"
        y = F.layer_norm(
            x, (DIM,), sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"], eps=1e-6
        )
        qkv = F.linear(y, sd[f"{p}.attn.qkv.weight"], sd[f"{p}.attn.qkv.bias"])
        qkv = qkv.reshape(b, -1, 3, HEADS, head_dim).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [B, H, N, hd]
        attn = (q @ k.transpose(-2, -1)) * head_dim**-0.5
        attn = attn.softmax(dim=-1)
        y = (attn @ v).transpose(1, 2).reshape(b, -1, DIM)
        x = x + F.linear(y, sd[f"{p}.attn.proj.weight"], sd[f"{p}.attn.proj.bias"])
        y = F.layer_norm(
            x, (DIM,), sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"], eps=1e-6
        )
        y = F.linear(y, sd[f"{p}.mlp.fc1.weight"], sd[f"{p}.mlp.fc1.bias"])
        y = F.gelu(y)  # erf form
        y = F.linear(y, sd[f"{p}.mlp.fc2.weight"], sd[f"{p}.mlp.fc2.bias"])
        x = x + y
    return F.layer_norm(x, (DIM,), sd["norm.weight"], sd["norm.bias"], eps=1e-6)


def test_vit_conversion_matches_torch_forward(rng):
    sd = _make_timm_style_vit_sd(rng)
    params = convert_vit_state_dict(sd)

    cfg = ViTConfig(
        img_size=IMG, patch_size=PATCH, embed_dim=DIM, depth=DEPTH, num_heads=HEADS
    )
    model = ViT(cfg)

    x_np = rng.standard_normal((B, IMG, IMG, 3)).astype(np.float32)
    out_jax = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x_np),
    )

    with torch.no_grad():
        out_torch = _torch_vit_forward(
            sd, torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        ).numpy()

    np.testing.assert_allclose(np.asarray(out_jax), out_torch, atol=2e-4, rtol=2e-4)


def test_vit_conversion_shapes_match_init(rng):
    """Converted tree must match the flax-initialized tree leaf-for-leaf."""
    sd = _make_timm_style_vit_sd(rng)
    params = convert_vit_state_dict(sd)
    cfg = ViTConfig(
        img_size=IMG, patch_size=PATCH, embed_dim=DIM, depth=DEPTH, num_heads=HEADS
    )
    init = ViT(cfg).init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)))[
        "params"
    ]
    flat_a = jax.tree_util.tree_leaves_with_path(init)
    flat_b = dict(
        (jax.tree_util.keystr(p), l)
        for p, l in jax.tree_util.tree_leaves_with_path(params)
    )
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        key = jax.tree_util.keystr(path)
        assert key in flat_b, key
        assert tuple(leaf.shape) == tuple(flat_b[key].shape), key


def test_pos_embed_interpolation(rng):
    """224->448-style porting: pos embed grid resamples, CLS preserved."""
    from ego_moment_cle_vit_tpu.utils.port_weights import interpolate_pos_embed

    d = 8
    pe = rng.standard_normal((1, 1 + 16, d)).astype(np.float32)  # 4x4 grid
    out = interpolate_pos_embed(pe, 64)  # -> 8x8 grid
    assert out.shape == (1, 65, d)
    np.testing.assert_array_equal(out[:, 0], pe[:, 0])  # CLS untouched
    # identity when sizes match
    np.testing.assert_array_equal(interpolate_pos_embed(pe, 16), pe)
    with pytest.raises(ValueError, match="non-square"):
        interpolate_pos_embed(pe, 15)


def test_swin_conversion_maps_names(rng):
    """Swin converter: name/shape mapping for a minimal 2-stage state dict
    (downsample at start-of-next-stage, newer-timm style)."""
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g)

    dim, heads, ws = 8, 2, 4
    sd = {
        "patch_embed.proj.weight": t(dim, 3, 4, 4),
        "patch_embed.proj.bias": t(dim),
        "patch_embed.norm.weight": t(dim),
        "patch_embed.norm.bias": t(dim),
        "norm.weight": t(2 * dim),
        "norm.bias": t(2 * dim),
    }
    for s, d in ((0, dim), (1, 2 * dim)):
        sd.update(
            {
                f"layers.{s}.blocks.0.norm1.weight": t(d),
                f"layers.{s}.blocks.0.norm1.bias": t(d),
                f"layers.{s}.blocks.0.norm2.weight": t(d),
                f"layers.{s}.blocks.0.norm2.bias": t(d),
                f"layers.{s}.blocks.0.attn.qkv.weight": t(3 * d, d),
                f"layers.{s}.blocks.0.attn.qkv.bias": t(3 * d),
                f"layers.{s}.blocks.0.attn.proj.weight": t(d, d),
                f"layers.{s}.blocks.0.attn.proj.bias": t(d),
                f"layers.{s}.blocks.0.attn.relative_position_bias_table": t(
                    (2 * ws - 1) ** 2, heads
                ),
                f"layers.{s}.blocks.0.mlp.fc1.weight": t(4 * d, d),
                f"layers.{s}.blocks.0.mlp.fc1.bias": t(4 * d),
                f"layers.{s}.blocks.0.mlp.fc2.weight": t(d, 4 * d),
                f"layers.{s}.blocks.0.mlp.fc2.bias": t(d),
            }
        )
    sd.update(
        {
            "layers.1.downsample.norm.weight": t(4 * dim),
            "layers.1.downsample.norm.bias": t(4 * dim),
            "layers.1.downsample.reduction.weight": t(2 * dim, 4 * dim),
        }
    )
    params = convert_swin_state_dict(sd)
    assert "stage0_block0" in params and "stage1_block0" in params
    assert "stage0_downsample" in params
    assert params["stage0_downsample"]["reduction"]["kernel"].shape == (
        4 * dim,
        2 * dim,
    )
    assert params["stage0_block0"]["attn"][
        "relative_position_bias_table"
    ].shape == ((2 * ws - 1) ** 2, heads)
    assert params["patch_embed_proj"]["kernel"].shape == (4, 4, 3, dim)


def test_swin_conversion_older_timm_layout(rng):
    """Older-timm layout keeps the PatchMerging at the END of each stage
    (layers.{s}.downsample).  The converter must detect the layout globally
    — a per-stage candidate preference previously mapped these one stage
    off — and must never emit a downsample for the final stage."""
    g = torch.Generator().manual_seed(1)

    def t(*shape):
        return torch.randn(*shape, generator=g)

    dim, heads, ws = 8, 2, 4
    sd = {
        "patch_embed.proj.weight": t(dim, 3, 4, 4),
        "patch_embed.proj.bias": t(dim),
        "patch_embed.norm.weight": t(dim),
        "patch_embed.norm.bias": t(dim),
        "norm.weight": t(4 * dim),
        "norm.bias": t(4 * dim),
    }
    for s, d in ((0, dim), (1, 2 * dim), (2, 4 * dim)):
        sd.update(
            {
                f"layers.{s}.blocks.0.norm1.weight": t(d),
                f"layers.{s}.blocks.0.norm1.bias": t(d),
                f"layers.{s}.blocks.0.norm2.weight": t(d),
                f"layers.{s}.blocks.0.norm2.bias": t(d),
                f"layers.{s}.blocks.0.attn.qkv.weight": t(3 * d, d),
                f"layers.{s}.blocks.0.attn.qkv.bias": t(3 * d),
                f"layers.{s}.blocks.0.attn.proj.weight": t(d, d),
                f"layers.{s}.blocks.0.attn.proj.bias": t(d),
                f"layers.{s}.blocks.0.attn.relative_position_bias_table": t(
                    (2 * ws - 1) ** 2, heads
                ),
                f"layers.{s}.blocks.0.mlp.fc1.weight": t(4 * d, d),
                f"layers.{s}.blocks.0.mlp.fc1.bias": t(4 * d),
                f"layers.{s}.blocks.0.mlp.fc2.weight": t(d, 4 * d),
                f"layers.{s}.blocks.0.mlp.fc2.bias": t(d),
            }
        )
    # OLDER layout: downsample at the END of stages 0 and 1 (indexed by the
    # stage it closes), nothing on the last stage
    for s, d in ((0, dim), (1, 2 * dim)):
        sd.update(
            {
                f"layers.{s}.downsample.norm.weight": t(4 * d),
                f"layers.{s}.downsample.norm.bias": t(4 * d),
                f"layers.{s}.downsample.reduction.weight": t(2 * d, 4 * d),
            }
        )
    params = convert_swin_state_dict(sd)
    # boundary s keeps boundary-s weights (stage0: 4*dim -> 2*dim)
    assert params["stage0_downsample"]["reduction"]["kernel"].shape == (
        4 * dim,
        2 * dim,
    )
    assert params["stage1_downsample"]["reduction"]["kernel"].shape == (
        8 * dim,
        4 * dim,
    )
    np.testing.assert_allclose(
        params["stage0_downsample"]["norm"]["scale"],
        sd["layers.0.downsample.norm.weight"].numpy(),
    )
    # no spurious final-stage downsample
    assert "stage2_downsample" not in params
