"""Seeding and model introspection.

Capability parity with /root/reference/src/utils/ops.py:17-97 (set_seed,
count_parameters, get_model_info, print_model_info).  The matrix/graph math
that the reference also keeps here lives in :mod:`..ops` (the compute core);
re-exported below so ``utils.ops`` remains a one-stop import like the
reference's.
"""

from __future__ import annotations

import random
from typing import Any, Dict

import jax
import numpy as np

# re-export the math helpers (reference utils/ops.py:100-381 equivalents)
from ..ops.moments import (  # noqa: F401
    half_vectorize as half_vectorize_symmetric,
    newton_schulz_sqrt as matrix_sqrt_newton_schulz,
    matrix_power_eigen,
    check_psd,
    ensure_psd,
)
from ..ops.graph import (  # noqa: F401
    normalize_graph,
    compute_graph_statistics,
    batch_trace,
    batch_logdet,
    cosine_similarity_matrix,
)


def set_seed(seed: int) -> jax.Array:
    """Seed python/numpy and return the root JAX PRNG key.

    JAX randomness is explicitly keyed (no global state), so 'deterministic
    mode' is the default — the reference needs cudnn.deterministic toggles
    (utils/ops.py:17-30); here reproducibility falls out of the design.
    """
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def count_parameters(params: Any) -> Dict[str, int]:
    """Total/trainable counts for a parameter PyTree."""
    leaves = jax.tree_util.tree_leaves(params)
    total = sum(int(np.prod(l.shape)) for l in leaves)
    return {"total": total, "trainable": total}


def get_model_info(params: Any, extra: Dict[str, Any] | None = None) -> Dict[str, Any]:
    counts = count_parameters(params)
    info = {
        "total_parameters": counts["total"],
        "trainable_parameters": counts["trainable"],
        "parameter_memory_mb": counts["total"] * 4 / 1024**2,
        "num_param_tensors": len(jax.tree_util.tree_leaves(params)),
    }
    if extra:
        info.update(extra)
    return info


def print_model_info(params: Any, name: str = "model") -> None:
    info = get_model_info(params)
    print(f"=== {name} ===")
    print(f"  parameters: {info['total_parameters']:,}")
    print(f"  fp32 memory: {info['parameter_memory_mb']:.1f} MB")
    print(f"  tensors: {info['num_param_tensors']}")


def apply_device_override(device: str | None) -> None:
    """Resolve the --device CLI flag to a jax platform ('tpu' -> the axon
    backend on this environment); one shared implementation for all CLIs."""
    if not device:
        return
    import jax

    jax.config.update("jax_platforms", "axon" if device == "tpu" else device)
