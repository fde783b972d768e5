"""Device-mesh construction.

The reference's only multi-device path is ``nn.DataParallel``
(/root/reference/train.py:297-299).  The TPU-native replacement is a
``jax.sharding.Mesh`` over ICI with a ``data`` axis (batch parallelism) and
an optional ``model`` axis used to shard the moment head's huge
half-vectorized projection (SURVEY.md §7 hard-part #2: ~605M params at
D=1536) and the classifier fan-in.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def local_device_count() -> int:
    """Devices attached to THIS host (multi-host slices have more globally;
    size per-host batches with this, global batches with len(jax.devices()))."""
    return jax.local_device_count()


def create_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh.

    Defaults: all visible devices on the data axis, model axis 1 (pure DP).
    ``data * model`` must equal the device count used.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(
            f"mesh {data}x{model} != {n} devices; pass matching sizes"
        )
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))
