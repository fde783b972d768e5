"""Host-side input pipeline: parallel decode -> batched uint8 -> device.

The reference feeds a torch DataLoader with 8 CPU workers doing full PIL
augmentation per sample (SURVEY.md §3.1 hot path).  Here the host only
decodes + resizes (the parts that genuinely need the CPU); batching,
augmentation, and normalization are on-device XLA (see .augment).

``BatchLoader`` is a minimal deterministic sampler/loader:
  * epoch-seeded shuffling (``numpy`` Philox — reproducible across runs),
  * thread-pool decode (JPEG decode releases the GIL inside PIL),
  * drop_last for static batch shapes (XLA requires them),
  * an optional background prefetch of the next batch.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import numpy as np

# --- process-pool decode workers ------------------------------------------
# JPEG decode mostly releases the GIL inside PIL, but the surrounding
# Python (BytesIO, resize bookkeeping, np.asarray) does not — measured on
# the streaming bench the thread pool tops out well below the H2D link
# bound (PROFILE_FLAGSHIP_R4: 91-116 img/s vs a 190+ link).  A fork-start
# process pool sidesteps the GIL entirely; the dataset lands in children
# via copy-on-write, and only the decoded uint8 batches cross the pipe.
# Children run pure numpy/PIL — they never touch jax, so the live TPU
# client in the parent is not forked into use.

_WORKER_DATASET = None


def _pool_get(idx: int):  # pragma: no cover - runs in child
    return _WORKER_DATASET[int(idx)]


def _spawn_init(dataset):  # pragma: no cover - runs in child
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _fork_pool(dataset, num_workers: int):
    """Process pool whose children serve ``dataset[idx]``.

    Start method (``EMCT_POOL_START``, default ``fork``):

    * ``fork`` — children see the dataset via copy-on-write (the parent
      global is set immediately before the fork — NOT passed through
      initargs, which would pickle a potentially hundreds-of-MB parquet
      byte column once per worker).  CAVEAT: forking a parent that already
      runs a multithreaded JAX client can deadlock a child on an inherited
      lock (observed on the TPU streaming bench) — prefer ``spawn`` when a
      live device client exists and the dataset pickles cheaply.
    * ``spawn`` — fresh children, dataset delivered once per worker via the
      initializer (pickled); immune to the fork-after-threads deadlock.
      Standard multiprocessing rules apply: the calling script's module
      level must be import-safe (``if __name__ == "__main__":`` guard),
      because spawn re-executes ``__main__`` in every worker.  Workers
      pay one package import each (~2 s); verified live on the TPU
      streaming drive (2026-08-20).
    """
    import multiprocessing as mp

    method = os.environ.get("EMCT_POOL_START", "fork")
    if method == "spawn":
        ctx = mp.get_context("spawn")
        return ctx.Pool(
            max(1, num_workers), initializer=_spawn_init, initargs=(dataset,)
        )

    global _WORKER_DATASET
    _WORKER_DATASET = dataset
    ctx = mp.get_context("fork")
    pool = ctx.Pool(max(1, num_workers))
    _WORKER_DATASET = None
    return pool


class BatchLoader:
    """Iterates (images_u8 [B, S, S, 3], labels [B]) numpy batches."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_workers: int = 8,
        prefetch: int = 2,
        worker_type: str = "thread",
        process_index: int | None = None,
        process_count: int | None = None,
    ):
        """``batch_size`` is the PER-HOST batch.  In a multi-host run each
        process sees a disjoint stride of the (identically seeded) global
        shuffle — set process_index/process_count, or leave None to read
        them from jax.process_index()/process_count() lazily.

        ``worker_type``: 'thread' (default — fine when __getitem__ releases
        the GIL or the dataset is an in-memory cache) or 'process' (fork
        pool; decodes scale past the GIL — the torch-DataLoader-equivalent
        mode for heavy PIL decode chains, reference train.py:241-257)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        if worker_type not in ("thread", "process"):
            raise ValueError(f"worker_type: {worker_type!r}")
        self.worker_type = worker_type
        self.epoch = 0
        self._pidx = process_index
        self._pcount = process_count

    def _process(self):
        if self._pidx is not None:
            return self._pidx, max(self._pcount or 1, 1)
        try:
            import jax

            return jax.process_index(), jax.process_count()
        except Exception:
            return 0, 1

    def __len__(self) -> int:
        _, pcount = self._process()
        n = len(self.dataset) // pcount
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        """Reseed the shuffle per epoch (deterministic resume)."""
        self.epoch = epoch

    def _order(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng([self.seed, self.epoch])
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        pidx, pcount = self._process()
        if pcount > 1:
            order = order[pidx::pcount]
        return order

    def _load_batch(self, idxs: np.ndarray, pool):
        if self.worker_type == "process":
            samples = pool.map(_pool_get, [int(i) for i in idxs])
        else:
            samples = list(pool.map(self.dataset.__getitem__, idxs))
        images = np.stack([s[0] for s in samples])
        labels = np.asarray([s[1] for s in samples], np.int32)
        return images, labels

    def _make_pool(self):
        if self.worker_type == "process":
            return _fork_pool(self.dataset, self.num_workers)
        return ThreadPoolExecutor(self.num_workers)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = self._order()
        nb = len(self)
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(nb)
        ]
        with self._make_pool() as pool:
            if self.prefetch <= 0:
                for idxs in batches:
                    yield self._load_batch(idxs, pool)
                return

            q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
            stop = object()
            abandoned = threading.Event()  # consumer quit the generator early

            def put(item) -> bool:
                # bounded-queue put that gives up once the consumer is gone,
                # so an abandoned epoch can never wedge the producer thread
                while not abandoned.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        return True
                    except queue.Full:
                        continue
                return False

            def producer():
                # exceptions must surface in the consumer — a silently dead
                # producer would truncate the epoch with no error
                try:
                    for idxs in batches:
                        if not put(self._load_batch(idxs, pool)):
                            return
                except BaseException as e:  # noqa: BLE001 — re-raised below
                    put(e)
                finally:
                    put(stop)

            t = threading.Thread(target=producer, daemon=True)
            t.start()
            try:
                while True:
                    item = q.get()
                    if item is stop:
                        break
                    if isinstance(item, BaseException):
                        t.join()
                        raise item
                    yield item
                t.join()
            finally:
                abandoned.set()


class HostDecodedCache:
    """Decode the whole dataset ONCE into a host-RAM uint8 array; after
    that every ``__getitem__`` is a memcpy-cheap view.

    The middle tier of the cache hierarchy for datasets too large for the
    HBM-resident ``DeviceDatasetCache`` but small enough for host RAM
    (a 600^2 split decoded at resize 256 costs ~196 KB/sample — 50k samples
    ≈ 10 GB).  With this wrapper the streaming path's steady-state cost is
    batch assembly + H2D transfer only: the decode bottleneck
    (PROFILE_FLAGSHIP_R4: thread-pool PIL capped at 91-116 img/s) is paid
    once per run instead of once per epoch.

    Same access surface as the wrapped dataset (``__len__``/``__getitem__``/
    ``classes``/``class_to_idx``/``num_classes``/``image_size``), so it
    drops into ``BatchLoader`` unchanged.
    """

    def __init__(self, dataset, num_workers: int = 8,
                 worker_type: str = "process", verbose: bool = False):
        n = len(dataset)
        first_img, first_lbl = dataset[0]
        first_img = np.asarray(first_img, np.uint8)
        self.images = np.empty((n,) + first_img.shape, np.uint8)
        self.labels = np.empty((n,), np.int32)
        self.images[0] = first_img
        self.labels[0] = first_lbl

        idxs = list(range(1, n))
        t0 = None
        if verbose:
            import time as _t

            t0 = _t.perf_counter()
        if worker_type == "process" and n > 64:
            with _fork_pool(dataset, num_workers) as pool:
                for i, (img, lbl) in zip(
                    idxs, pool.imap(_pool_get, idxs, chunksize=32)
                ):
                    self.images[i] = img
                    self.labels[i] = lbl
        else:
            with ThreadPoolExecutor(max(1, num_workers)) as pool:
                for i, (img, lbl) in zip(
                    idxs, pool.map(dataset.__getitem__, idxs)
                ):
                    self.images[i] = img
                    self.labels[i] = lbl
        if verbose and t0 is not None:
            import time as _t

            print(
                f"HostDecodedCache: {n} samples "
                f"({self.images.nbytes / 1e6:.0f} MB) decoded in "
                f"{_t.perf_counter() - t0:.1f}s"
            )

        # surface passthrough
        self.dataset_name = getattr(dataset, "dataset_name", "unknown")
        self.split = getattr(dataset, "split", None)
        self.classes = getattr(dataset, "classes", None)
        self.class_to_idx = getattr(dataset, "class_to_idx", None)
        self.num_classes = getattr(
            dataset, "num_classes", len(self.classes or [])
        )
        self.image_size = self.images.shape[1]
        self._info = getattr(dataset, "get_dataset_info", None)

    @property
    def nbytes(self) -> int:
        return self.images.nbytes + self.labels.nbytes

    def __len__(self) -> int:
        return len(self.labels)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, int]:
        return self.images[idx], int(self.labels[idx])

    def get_dataset_info(self) -> dict:
        if self._info is not None:
            return self._info()
        return {"dataset_name": self.dataset_name, "total_samples": len(self)}


def host_cache_fits(
    num_samples: int, image_size: int, budget_bytes: int
) -> bool:
    """Whether a decoded split fits the host-RAM cache budget."""
    return num_samples * image_size * image_size * 3 <= budget_bytes


class DevicePrefetcher:
    """Overlap host->device transfer with device compute.

    Wraps a host batch iterator; a dedicated transfer thread pulls batches
    and stages them onto the device (``shard_batch``) up to ``depth`` ahead,
    so the H2D copy of batch N+1 rides under the device compute of batch N.
    This matters enormously on remote-attached devices where a synchronous
    per-batch ``device_put`` costs hundreds of ms of round-trip: measured on
    the axon TPU tunnel, the flagship e2e throughput went from 64 img/s
    (inline transfer: the step waits for the copy every batch) to within a
    few percent of the device-only rate.

    The reference has no equivalent — its torch DataLoader stops at pinned
    host memory and the CUDA copy happens inline in the step loop
    (/root/reference/train.py:333-349).

    Usage::

        for dev_batch in DevicePrefetcher(loader, mesh, depth=2):
            state, loss = step(state, *dev_batch)
    """

    def __init__(self, host_iter, mesh=None, depth: int = 2,
                 data_axis: str = "data"):
        self.host_iter = host_iter
        self.mesh = mesh
        self.depth = max(1, depth)
        self.data_axis = data_axis

    def _put(self, batch):
        if self.mesh is not None:
            return shard_batch(batch, self.mesh, self.data_axis)
        import jax

        return jax.tree_util.tree_map(jax.device_put, batch)

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        stop = object()
        abandoned = threading.Event()

        def put(item) -> bool:
            while not abandoned.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def transfer():
            try:
                for batch in self.host_iter:
                    if not put(self._put(batch)):
                        return
            except BaseException as e:  # noqa: BLE001 — re-raised below
                put(e)
            finally:
                put(stop)

        t = threading.Thread(target=transfer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, BaseException):
                    t.join()
                    raise item
                yield item
            t.join()
        finally:
            abandoned.set()


def create_multi_loaders(
    dataset_names,
    root: str = "./data",
    batch_size: int = 32,
    num_workers: int = 4,
    resize_size: int = 600,
    download: bool = True,
):
    """BatchLoaders for multiple datasets and all their available splits.

    Capability parity with the reference's ``create_multi_dataloaders``
    (ufgvc.py:256-314): returns {dataset_name: {split: BatchLoader}}.
    """
    from .ufgvc import UFGVCDataset

    all_loaders = {}
    for name in dataset_names:
        loaders = {}
        splits = UFGVCDataset.get_dataset_splits(name, root) or [
            "train",
            "val",
            "test",
        ]
        for split in splits:
            try:
                ds = UFGVCDataset(
                    dataset_name=name,
                    root=root,
                    split=split,
                    resize_size=resize_size,
                    download=download,
                )
            except (ValueError, FileNotFoundError) as exc:
                print(f"Warning: no loader for {name}-{split}: {exc}")
                continue
            loaders[split] = BatchLoader(
                ds,
                batch_size=batch_size,
                shuffle=(split == "train"),
                num_workers=num_workers,
            )
        if loaders:
            all_loaders[name] = loaders
    return all_loaders


def shard_batch(batch, mesh, data_axis: str = "data"):
    """Place a host batch onto the mesh, sharded over the data axis.

    Works for single- and multi-device meshes; with one device this is a
    plain device_put.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        spec = P(data_axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)
