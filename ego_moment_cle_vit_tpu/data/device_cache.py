"""HBM-resident dataset cache: upload once, gather batches on device.

Ultra-fine-grained visual categorization datasets are SMALL — the seven UFG
splits range from 240 to a few thousand images (reference ufgvc.py:28-64),
i.e. 0.25-3 GB at 600x600 uint8 and far less at bench resolutions.  A TPU
v5e has 16 GB of HBM; the entire split fits next to the model with room to
spare.  So instead of re-shipping every batch across the host-device link
(the reference re-decodes JPEGs per epoch in 8 torch workers and pays the
PCIe copy per step, /root/reference/train.py:241-257), this module uploads
the decoded uint8 split ONCE and assembles each batch with an on-device
gather — per-step host traffic drops to a 64-int32 index vector.

This is the difference between ~60 img/s and the full device rate on a
remote-attached TPU (measured: the axon tunnel moves ~26 MB/s of batch
data and does not overlap transfers with compute), and it removes the
host pipeline from the critical path on any topology.

Augmentation stays per-step and on-device (``.augment``): caching the
decoded source images does not freeze the views — every epoch still sees
fresh crops/jitter/masking, exactly like the host-loader path.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import numpy as np

__all__ = ["DeviceDatasetCache", "device_cache_fits"]


def device_cache_fits(
    num_samples: int,
    image_size: int,
    budget_bytes: int = 6 * 1024**3,
) -> bool:
    """Whether a decoded uint8 split fits the HBM budget we are willing to
    spend on data (default 6 GB — leaves >half of a v5e for the model)."""
    return num_samples * image_size * image_size * 3 <= budget_bytes


class DeviceDatasetCache:
    """Iterable over device-resident (images_u8 [B,S,S,3], labels [B]).

    Same iteration surface as ``BatchLoader`` (len / set_epoch / iter,
    epoch-seeded deterministic shuffle, drop_last static shapes), but the
    batches it yields already live in HBM: construction uploads the whole
    split once; ``__iter__`` dispatches one tiny jitted gather per batch.

    The gather runs as its own jit program (not inside the train step), so
    the cached path feeds the SAME compiled step as the host-loader path —
    switching ``data.device_cache`` on/off never recompiles the model.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_workers: int = 8,
        mesh=None,
        data_axis: str = "data",
    ):
        import jax
        import jax.numpy as jnp

        # the gather OUTPUT is sharded over the mesh data axis, so its batch
        # dim must divide it: round the batch up and wrap-pad (same policy
        # as the tail batch below).  Hit in practice by small real splits —
        # e.g. a 6-sample val split on an 8-device mesh.
        if mesh is not None:
            axis = int(mesh.shape[data_axis])
            if batch_size % axis:
                batch_size = -(-batch_size // axis) * axis
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0

        # host-side one-time load (threaded decode, like BatchLoader)
        n = len(dataset)
        with ThreadPoolExecutor(max(1, num_workers)) as pool:
            samples = list(pool.map(dataset.__getitem__, range(n)))
        images = np.stack([s[0] for s in samples])
        labels = np.asarray([s[1] for s in samples], np.int32)

        if mesh is not None:
            # replicate the cache; the gather reshards its OUTPUT onto the
            # data axis so the step sees the same sharding as shard_batch
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            self._images = jax.device_put(images, rep)
            self._labels = jax.device_put(labels, rep)
            out_img = NamedSharding(mesh, P(data_axis, None, None, None))
            out_lbl = NamedSharding(mesh, P(data_axis))
            self._gather = jax.jit(
                lambda imgs, lbls, idx: (
                    jnp.take(imgs, idx, axis=0),
                    jnp.take(lbls, idx, axis=0),
                ),
                out_shardings=(out_img, out_lbl),
            )
        else:
            self._images = jax.device_put(images)
            self._labels = jax.device_put(labels)
            self._gather = jax.jit(
                lambda imgs, lbls, idx: (
                    jnp.take(imgs, idx, axis=0),
                    jnp.take(lbls, idx, axis=0),
                )
            )
        self._n = n

    @property
    def nbytes(self) -> int:
        return int(self._images.size) + 4 * int(self._labels.size)

    def __len__(self) -> int:
        if self.drop_last:
            return self._n // self.batch_size
        return -(-self._n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[Tuple["object", "object"]]:
        import jax.numpy as jnp

        if self.shuffle:
            rng = np.random.default_rng([self.seed, self.epoch])
            order = rng.permutation(self._n)
        else:
            order = np.arange(self._n)
        for b in range(len(self)):
            idx = order[b * self.batch_size : (b + 1) * self.batch_size]
            if len(idx) < self.batch_size:
                # static shapes for XLA: pad the tail batch by wrapping
                # (np.resize cycles `order`, so splits SMALLER than the
                # batch pad correctly too)
                idx = np.concatenate(
                    [idx, np.resize(order, self.batch_size - len(idx))]
                )
            yield self._gather(
                self._images, self._labels, jnp.asarray(idx, jnp.int32)
            )
