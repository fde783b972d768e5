"""timm -> flax checkpoint translation for the backbone families.

The reference gets pretrained backbones from ``timm.create_model(...,
pretrained=True)`` (/root/reference/src/models/cle_vit_backbone.py:198-204).
This environment has no timm and no network egress, so porting is a
file-based translation: save a timm model's ``state_dict()`` (torch.save)
anywhere, then

    from ego_moment_cle_vit_tpu.utils.port_weights import load_torch_backbone
    params = load_torch_backbone("vit_small_patch16_224", "weights.pth")

and pass the resulting tree as the backbone params.  Name mapping notes:

* ViT family: timm ``blocks.{i}.attn.qkv`` etc. -> ``blocks_{i}/attn/qkv``;
  torch Linear kernels are [out, in] and transpose to [in, out].
* Swin family: timm places ``layers.{i}.downsample`` at the START of stage i
  (newer timm) or the END (older); both map onto our ``stage{k}_downsample``
  which sits between stages k and k+1.  Relative-position bias tables map
  name-for-name.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def _t(x) -> np.ndarray:
    """torch tensor / array -> numpy."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _linear(sd, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _norm(sd, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _t(sd[f"{prefix}.weight"]),
        "bias": _t(sd[f"{prefix}.bias"]),
    }


def _conv(sd, prefix: str) -> Dict[str, np.ndarray]:
    # torch conv kernel [O, I, kh, kw] -> flax [kh, kw, I, O]
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def convert_vit_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm ViT/DeiT state_dict -> params for models.vit.ViT."""
    depth = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"blocks\.(\d+)\.", k))
    )
    params: Dict[str, Any] = {
        "patch_embed": {"proj": _conv(sd, "patch_embed.proj")},
        "cls_token": _t(sd["cls_token"]),
        "pos_embed": _t(sd["pos_embed"]),
        "norm": _norm(sd, "norm"),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        params[f"blocks_{i}"] = {
            "norm1": _norm(sd, f"{p}.norm1"),
            "norm2": _norm(sd, f"{p}.norm2"),
            "attn": {
                "qkv": _linear(sd, f"{p}.attn.qkv"),
                "proj": _linear(sd, f"{p}.attn.proj"),
            },
            "mlp": {
                "fc1": _linear(sd, f"{p}.mlp.fc1"),
                "fc2": _linear(sd, f"{p}.mlp.fc2"),
            },
        }
    return params


def convert_swin_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm Swin state_dict -> params for models.swin.Swin."""
    stage_depths: Dict[int, int] = {}
    for k in sd:
        m = re.match(r"layers\.(\d+)\.blocks\.(\d+)\.", k)
        if m:
            s, b = int(m.group(1)), int(m.group(2))
            stage_depths[s] = max(stage_depths.get(s, 0), b + 1)
    num_stages = len(stage_depths)

    params: Dict[str, Any] = {
        "patch_embed_proj": _conv(sd, "patch_embed.proj"),
        "patch_embed_norm": _norm(sd, "patch_embed.norm"),
        "norm": _norm(sd, "norm"),
    }
    for s in range(num_stages):
        for b in range(stage_depths[s]):
            p = f"layers.{s}.blocks.{b}"
            params[f"stage{s}_block{b}"] = {
                "norm1": _norm(sd, f"{p}.norm1"),
                "norm2": _norm(sd, f"{p}.norm2"),
                "attn": {
                    "qkv": _linear(sd, f"{p}.attn.qkv"),
                    "proj": _linear(sd, f"{p}.attn.proj"),
                    "relative_position_bias_table": _t(
                        sd[f"{p}.attn.relative_position_bias_table"]
                    ),
                },
                "mlp_fc1": _linear(sd, f"{p}.mlp.fc1"),
                "mlp_fc2": _linear(sd, f"{p}.mlp.fc2"),
            }
    # downsample: newer timm keeps it at the START of stage s+1; older timm
    # at the END of stage s.  Ours sits between s and s+1 as
    # stage{s}_downsample.  Detect the layout ONCE globally — a per-stage
    # candidate preference would map older-layout weights one stage off
    # (layers.1.downsample exists in BOTH layouts but belongs to different
    # boundaries), and would emit a spurious stage{last}_downsample.
    older_layout = "layers.0.downsample.norm.weight" in sd
    for s in range(num_stages - 1):
        cand = f"layers.{s}.downsample" if older_layout else f"layers.{s + 1}.downsample"
        if f"{cand}.norm.weight" in sd:
            params[f"stage{s}_downsample"] = {
                "norm": _norm(sd, f"{cand}.norm"),
                "reduction": {"kernel": _t(sd[f"{cand}.reduction.weight"]).T},
            }
    return params


def interpolate_pos_embed(
    pos_embed: np.ndarray, target_num_patches: int
) -> np.ndarray:
    """Resize a ViT position embedding [1, 1+N, D] to a new patch count by
    bicubic-resampling the spatial grid (CLS token kept) — the standard
    recipe for porting 224px checkpoints to e.g. 448px inputs
    (BASELINE.json configs[4])."""
    cls_tok, grid = pos_embed[:, :1], pos_embed[:, 1:]
    n_old = grid.shape[1]
    side_old = int(round(n_old**0.5))
    side_new = int(round(target_num_patches**0.5))
    if side_old * side_old != n_old or side_new * side_new != target_num_patches:
        raise ValueError(
            f"non-square patch grids: {n_old} -> {target_num_patches}"
        )
    if side_old == side_new:
        return pos_embed
    import jax
    import jax.numpy as jnp

    d = grid.shape[-1]
    g = jnp.asarray(grid.reshape(1, side_old, side_old, d))
    g = jax.image.resize(g, (1, side_new, side_new, d), method="cubic")
    g = np.asarray(g).reshape(1, side_new * side_new, d)
    return np.concatenate([cls_tok, g], axis=1)


def load_torch_backbone(model_name: str, checkpoint_path: str) -> Dict[str, Any]:
    """Load a torch state_dict file and convert it for the named backbone.

    Returns the params subtree to splice under
    ``params['backbone']['backbone']['vit' | 'swin']``.
    """
    import torch

    sd = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if model_name.startswith(("vit", "deit")):
        return convert_vit_state_dict(sd)
    if model_name.startswith("swin"):
        return convert_swin_state_dict(sd)
    raise ValueError(f"No converter for backbone family of '{model_name}'")


def splice_backbone_params(model_params: Dict[str, Any], backbone_params: Dict[str, Any], family: str) -> Dict[str, Any]:
    """Return a copy of the full model param tree with the backbone subtree
    replaced (shapes validated leaf-by-leaf)."""
    import jax

    tree = jax.tree_util.tree_map(lambda x: x, model_params)  # shallow copy
    slot = tree["backbone"]["backbone"][family]

    # auto-interpolate ViT position embeddings when the input size differs
    if (
        family == "vit"
        and "pos_embed" in backbone_params
        and tuple(np.asarray(backbone_params["pos_embed"]).shape)
        != tuple(slot["pos_embed"].shape)
    ):
        backbone_params = dict(backbone_params)
        backbone_params["pos_embed"] = interpolate_pos_embed(
            np.asarray(backbone_params["pos_embed"]),
            slot["pos_embed"].shape[1] - 1,
        )

    def check(path, old, new):
        if tuple(old.shape) != tuple(np.asarray(new).shape):
            raise ValueError(
                f"shape mismatch at {path}: model {old.shape} vs ckpt "
                f"{np.asarray(new).shape}"
            )

    for key in slot:
        if key not in backbone_params:
            raise ValueError(f"converted checkpoint missing '{key}'")
    flat_old = jax.tree_util.tree_leaves_with_path(slot)
    for path, leaf in flat_old:
        node = backbone_params
        for k in path:
            node = node[k.key]
        check(path, leaf, node)
    tree["backbone"]["backbone"][family] = jax.tree_util.tree_map(
        np.asarray, backbone_params
    )
    return tree
