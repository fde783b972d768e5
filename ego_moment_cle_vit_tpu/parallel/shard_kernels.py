"""Pallas kernels under a multi-device mesh, via ``jax.shard_map``.

GSPMD cannot auto-partition ``pallas_call``: a kernel traced inside a
sharded jit fails at compile time.  Round 2/3 solved correctness by gating
every kernel OFF under >1 device (XLA fallback) — which meant a real pod
would run the backbone/GPF/NS at pre-kernel throughput.  This module is the
escape hatch those gates' docstrings promised (ops/pallas/gpf.py,
models/swin.py): wrap the kernel call site in ``shard_map`` over the mesh
data axis so each device runs the kernel on its LOCAL batch block.  All
three kernel families are batch-parallel (their grids lead with the batch
dim), so per-shard execution is exactly the single-device kernel on B/dp
samples; replicated operands (coefficients, bias tables, masks) transpose
to a ``psum`` over the data axis in backward — the same cross-batch
reduction the XLA path's autodiff performs.

Capability context: the reference's own spec names cross-device batch
collectives as the missing multi-GPU piece (/root/reference/docs/
spec.md:199-202); its only device parallelism is ``nn.DataParallel``
(train.py:297-299).

Dispatch policy (``kernel_spmd_mode``):
  * ``auto`` (default) — shard_map kernel path only on TPU platforms.
  * ``force``          — also on CPU (interpret-mode kernels; used by the
                         mesh-parity tests and the driver dryrun).
  * ``off``            — never; XLA fallback under any mesh.

The mesh is discovered from (in order) an explicit ``set_kernel_mesh`` /
``kernel_mesh(...)`` registration (what Trainer and dryrun_multichip do),
else the legacy ``with mesh:`` thread-resources context.
"""

from __future__ import annotations

import contextlib
import os
import threading
import warnings
from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = [
    "active_kernel_mesh",
    "kernel_mesh",
    "kernel_spmd_mode",
    "maybe_shard_map_batch",
    "set_kernel_mesh",
    "shard_map_batch",
    "spmd_kernels_enabled",
]

_STATE = threading.local()


def set_kernel_mesh(mesh: Optional[Mesh]) -> None:
    """Register (or clear, with None) the mesh kernels shard over."""
    _STATE.mesh = mesh


@contextlib.contextmanager
def kernel_mesh(mesh: Optional[Mesh]):
    prev = getattr(_STATE, "mesh", None)
    _STATE.mesh = mesh
    try:
        yield
    finally:
        _STATE.mesh = prev


def active_kernel_mesh(axis: str = "data") -> Optional[Mesh]:
    """The concrete mesh kernel dispatch should shard over, or None.

    Explicit registration wins; otherwise fall back to the legacy
    ``with mesh:`` context (what ``__graft_entry__`` and older callers use).
    Returns None for single-device meshes and meshes without ``axis``.
    """
    mesh = getattr(_STATE, "mesh", None)
    if mesh is None:
        try:
            from jax.interpreters import pxla

            with warnings.catch_warnings():
                warnings.simplefilter("ignore", DeprecationWarning)
                ambient = pxla.thread_resources.env.physical_mesh
            if not ambient.empty:
                mesh = ambient
        except Exception:
            mesh = None
    if mesh is None or axis not in mesh.axis_names or mesh.size <= 1:
        return None
    return mesh


def kernel_spmd_mode() -> str:
    mode = os.environ.get("EMCT_KERNEL_SPMD", "auto").lower()
    if mode not in ("auto", "force", "off"):
        raise ValueError(
            f"EMCT_KERNEL_SPMD={mode!r} (expected auto|force|off)"
        )
    return mode


def spmd_kernels_enabled(
    batch: int, axis: str = "data", platform: Optional[str] = None
) -> Optional[Mesh]:
    """The mesh to shard_map kernels over, or None for XLA fallback.

    Conditions: spmd mode on for this platform, a registered/ambient mesh
    with a >1 ``axis``, and a batch divisible by it (shard_map needs equal
    local blocks)."""
    mode = kernel_spmd_mode()
    if mode == "off":
        return None
    if platform is None:
        platform = jax.default_backend()
    if mode == "auto" and platform != "tpu":
        return None
    mesh = active_kernel_mesh(axis)
    if mesh is None:
        return None
    dp = int(mesh.shape[axis])
    if dp <= 1 or batch % dp != 0:
        return None
    return mesh


def shard_map_batch(
    fn,
    mesh: Mesh,
    batch_args: Sequence[bool],
    axis: str = "data",
):
    """Wrap ``fn(*tensors)`` in shard_map: args flagged True in
    ``batch_args`` shard their LEADING dim over ``axis``; the rest are
    replicated (their cotangents psum over ``axis`` in transpose, matching
    the XLA path's batch reduction).  Every other mesh axis is replicated —
    model-axis devices redo the same local-batch kernel, which is exactly
    what the replicated XLA fallback did, minus the kernel speedup."""
    in_specs = tuple(P(axis) if b else P() for b in batch_args)
    out_specs = P(axis)
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )


def maybe_shard_map_batch(fn, batch: int, batch_args, axis: str = "data"):
    """Return ``shard_map``-wrapped fn if SPMD kernel dispatch applies,
    else None (caller falls back)."""
    mesh = spmd_kernels_enabled(batch, axis)
    if mesh is None:
        return None
    return shard_map_batch(fn, mesh, batch_args, axis)
