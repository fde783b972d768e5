"""Swin numerical parity: our flax Swin with converted weights must match an
independently written timm-convention torch forward — covering window
attention with relative position bias, SHIFTED windows with masking, and
patch merging (the hard parts of flagship weight porting, SURVEY.md §7 #5).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ego_moment_cle_vit_tpu.models.swin import Swin, SwinConfig
from ego_moment_cle_vit_tpu.utils.port_weights import convert_swin_state_dict

B = 2
IMG, PATCH, WS = 32, 4, 4
DIM, HEADS = 8, 2
DEPTHS = (2, 1)  # stage0: plain + shifted block; stage1 after merge
HEADS_PER_STAGE = (2, 4)


def _t(g, *shape):
    return torch.randn(*shape, generator=g) * 0.05


def make_sd():
    g = torch.Generator().manual_seed(1)
    sd = {
        "patch_embed.proj.weight": _t(g, DIM, 3, PATCH, PATCH),
        "patch_embed.proj.bias": _t(g, DIM),
        "patch_embed.norm.weight": 1 + 0.1 * _t(g, DIM),
        "patch_embed.norm.bias": 0.1 * _t(g, DIM),
        "norm.weight": 1 + 0.1 * _t(g, 2 * DIM),
        "norm.bias": 0.1 * _t(g, 2 * DIM),
    }
    for s, (depth, heads) in enumerate(zip(DEPTHS, HEADS_PER_STAGE)):
        d = DIM * 2**s
        for b in range(depth):
            p = f"layers.{s}.blocks.{b}"
            sd.update(
                {
                    f"{p}.norm1.weight": 1 + 0.1 * _t(g, d),
                    f"{p}.norm1.bias": 0.1 * _t(g, d),
                    f"{p}.norm2.weight": 1 + 0.1 * _t(g, d),
                    f"{p}.norm2.bias": 0.1 * _t(g, d),
                    f"{p}.attn.qkv.weight": _t(g, 3 * d, d),
                    f"{p}.attn.qkv.bias": _t(g, 3 * d),
                    f"{p}.attn.proj.weight": _t(g, d, d),
                    f"{p}.attn.proj.bias": _t(g, d),
                    f"{p}.attn.relative_position_bias_table": _t(
                        g, (2 * WS - 1) ** 2, heads
                    ),
                    f"{p}.mlp.fc1.weight": _t(g, 4 * d, d),
                    f"{p}.mlp.fc1.bias": _t(g, 4 * d),
                    f"{p}.mlp.fc2.weight": _t(g, d, 4 * d),
                    f"{p}.mlp.fc2.bias": _t(g, d),
                }
            )
    sd.update(
        {
            "layers.1.downsample.norm.weight": 1 + 0.1 * _t(g, 4 * DIM),
            "layers.1.downsample.norm.bias": 0.1 * _t(g, 4 * DIM),
            "layers.1.downsample.reduction.weight": _t(g, 2 * DIM, 4 * DIM),
        }
    )
    return sd


# --------------------------------------------------------------------------
# independent torch golden
# --------------------------------------------------------------------------


def rel_index(ws):
    coords = torch.stack(
        torch.meshgrid(torch.arange(ws), torch.arange(ws), indexing="ij")
    ).flatten(1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.permute(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).long()


def window_attn(x, sd, prefix, heads, mask=None):
    """x: [nW*B, N, C] -> same. timm window attention semantics."""
    bnw, n, c = x.shape
    hd = c // heads
    qkv = F.linear(x, sd[f"{prefix}.qkv.weight"], sd[f"{prefix}.qkv.bias"])
    qkv = qkv.reshape(bnw, n, 3, heads, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q @ k.transpose(-2, -1)) * hd**-0.5
    bias = sd[f"{prefix}.relative_position_bias_table"][rel_index(WS).flatten()]
    bias = bias.reshape(n, n, heads).permute(2, 0, 1)
    attn = attn + bias[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.view(bnw // nw, nw, heads, n, n) + mask[None, :, None]
        attn = attn.view(bnw, heads, n, n)
    attn = attn.softmax(-1)
    out = (attn @ v).transpose(1, 2).reshape(bnw, n, c)
    return F.linear(out, sd[f"{prefix}.proj.weight"], sd[f"{prefix}.proj.bias"])


def shift_mask(h, w, ws, shift):
    # canonical Swin/timm: region slices are defined in the SHIFTED frame,
    # the ids are NOT rolled (verified against the official construction
    # in /tmp probe; an earlier golden replicated the rolled-ids bug)
    ids = torch.zeros(h, w)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            ids[hs, wsl] = cnt
            cnt += 1
    idw = ids.view(h // ws, ws, w // ws, ws).permute(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = idw[:, None, :] - idw[:, :, None]
    return torch.where(diff != 0, torch.tensor(-100.0), torch.tensor(0.0))


def swin_block(x, sd, prefix, heads, res, shift):
    h, w = res
    b, n, c = x.shape
    shortcut = x
    x = F.layer_norm(x, (c,), sd[f"{prefix}.norm1.weight"], sd[f"{prefix}.norm1.bias"], eps=1e-5)
    x = x.view(b, h, w, c)
    if shift:
        x = torch.roll(x, (-shift, -shift), dims=(1, 2))
        mask = shift_mask(h, w, WS, shift)
    else:
        mask = None
    windows = (
        x.view(b, h // WS, WS, w // WS, WS, c)
        .permute(0, 1, 3, 2, 4, 5)
        .reshape(-1, WS * WS, c)
    )
    attn = window_attn(windows, sd, f"{prefix}.attn", heads, mask)
    x = (
        attn.view(b, h // WS, w // WS, WS, WS, c)
        .permute(0, 1, 3, 2, 4, 5)
        .reshape(b, h, w, c)
    )
    if shift:
        x = torch.roll(x, (shift, shift), dims=(1, 2))
    x = shortcut + x.reshape(b, n, c)
    y = F.layer_norm(x, (c,), sd[f"{prefix}.norm2.weight"], sd[f"{prefix}.norm2.bias"], eps=1e-5)
    y = F.linear(y, sd[f"{prefix}.mlp.fc1.weight"], sd[f"{prefix}.mlp.fc1.bias"])
    y = F.gelu(y)
    y = F.linear(y, sd[f"{prefix}.mlp.fc2.weight"], sd[f"{prefix}.mlp.fc2.bias"])
    return x + y


def torch_swin_forward(sd, x):
    x = F.conv2d(x, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"], stride=PATCH)
    b, c, h, w = x.shape
    x = x.flatten(2).transpose(1, 2)
    x = F.layer_norm(x, (c,), sd["patch_embed.norm.weight"], sd["patch_embed.norm.bias"], eps=1e-5)

    res = (h, w)
    for s, (depth, heads) in enumerate(zip(DEPTHS, HEADS_PER_STAGE)):
        for blk in range(depth):
            shift = 0 if blk % 2 == 0 or min(res) <= WS else WS // 2
            x = swin_block(x, sd, f"layers.{s}.blocks.{blk}", heads, res, shift)
        if s < len(DEPTHS) - 1:
            hh, ww = res
            cc = x.shape[-1]
            xs = x.view(b, hh, ww, cc)
            x0 = xs[:, 0::2, 0::2]
            x1 = xs[:, 1::2, 0::2]
            x2 = xs[:, 0::2, 1::2]
            x3 = xs[:, 1::2, 1::2]
            x = torch.cat([x0, x1, x2, x3], -1).view(b, hh * ww // 4, 4 * cc)
            x = F.layer_norm(
                x, (4 * cc,),
                sd["layers.1.downsample.norm.weight"],
                sd["layers.1.downsample.norm.bias"],
                eps=1e-5,
            )
            x = F.linear(x, sd["layers.1.downsample.reduction.weight"])
            res = (hh // 2, ww // 2)
    c_out = x.shape[-1]
    return F.layer_norm(x, (c_out,), sd["norm.weight"], sd["norm.bias"], eps=1e-5)


def test_swin_conversion_matches_torch_forward(rng):
    sd = make_sd()
    params = convert_swin_state_dict(sd)

    cfg = SwinConfig(
        img_size=IMG,
        patch_size=PATCH,
        embed_dim=DIM,
        depths=DEPTHS,
        num_heads=HEADS_PER_STAGE,
        window_size=WS,
    )
    model = Swin(cfg)
    x_np = rng.standard_normal((B, IMG, IMG, 3)).astype(np.float32)

    out_jax = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.asarray(x_np)
    )
    with torch.no_grad():
        out_torch = torch_swin_forward(
            sd, torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        ).numpy()

    assert out_jax.shape == out_torch.shape == (B, 16, 2 * DIM)
    np.testing.assert_allclose(np.asarray(out_jax), out_torch, atol=3e-4, rtol=3e-4)
