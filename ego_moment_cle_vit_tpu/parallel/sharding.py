"""Sharding rules: batch over 'data', big projections over 'model'.

Where the tensor parallelism pays off (SURVEY.md §7 hard-part #2): the
moment head's ``second_proj`` kernel is [D(D+1)/2, d_second] — 1.18M x 512
(~605M params) for the swin_large config.  We shard its *input* dimension
over the model axis; XLA then reduces the partial matmul products with one
psum over ICI.  The classifier's fc1 (fan-in d_cls + d_moment) and the
third-order projection get the same treatment.  Everything else (backbone,
small heads) is replicated — its per-param cost is negligible and
replication keeps the backbone's collective count at zero.
"""

from __future__ import annotations

import re
from typing import Any, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex over 'path/to/param', PartitionSpec) — first match wins.
DEFAULT_RULES: Tuple[Tuple[str, P], ...] = (
    # moment head: giant half-vec projection, shard the fan-in
    (r".*moment_head/second_proj/kernel$", P("model", None)),
    (r".*moment_head/third_proj/kernel$", P("model", None)),
    # classifier first layer has fan-in d_cls + d_moment
    (r".*classifier/fc1/kernel$", P("model", None)),
    # everything else replicated
    (r".*", P()),
)


def param_sharding_rules(
    path: str, rules: Sequence[Tuple[str, P]] = DEFAULT_RULES
) -> P:
    for pattern, spec in rules:
        if re.fullmatch(pattern, path):
            return spec
    return P()


def _spec_fits(leaf, spec: P, mesh: Mesh | None) -> bool:
    """A spec applies only if the leaf has enough rank and every partitioned
    dimension divides evenly by its mesh axis size."""
    if len(spec) > getattr(leaf, "ndim", 0):
        return False
    if mesh is not None:
        axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            size = axis_sizes.get(axis, 1)
            if size > 1 and leaf.shape[dim] % size != 0:
                return False
    return True


def _tree_paths_and_specs(tree: Any, rules, mesh: Mesh | None = None) -> Any:
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)

    def path_str(kp) -> str:
        parts = []
        for k in kp:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        return "/".join(parts)

    specs = []
    for kp, leaf in flat:
        spec = param_sharding_rules(path_str(kp), rules)
        if spec != P() and not _spec_fits(leaf, spec, mesh):
            spec = P()
        specs.append(spec)
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params(params: Any, mesh: Mesh, rules=DEFAULT_RULES) -> Any:
    """Place a parameter PyTree on the mesh per the rules."""
    specs = _tree_paths_and_specs(params, rules, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def param_spec_tree(params: Any, mesh: Mesh, rules=DEFAULT_RULES) -> Any:
    """NamedSharding PyTree matching ``params`` (for jit in/out shardings)."""
    specs = _tree_paths_and_specs(params, rules, mesh)
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a PyTree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Batch-dim sharding for an ndim-rank array."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))
