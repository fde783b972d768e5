"""Data layer: UFG parquet datasets, on-device dual-view augmentation, and
the host->device input pipeline."""

from .ufgvc import UFGVCDataset, SyntheticUFGDataset, DATASETS, compare_datasets
from .augment import (
    AugmentConfig,
    dual_view_train_batch,
    dual_view_eval_batch,
    random_rect_mask,
    grid_shuffle,
    color_jitter,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from .device_cache import DeviceDatasetCache, device_cache_fits
from .pipeline import (
    BatchLoader,
    DevicePrefetcher,
    HostDecodedCache,
    create_multi_loaders,
    host_cache_fits,
    shard_batch,
)

__all__ = [
    "UFGVCDataset",
    "SyntheticUFGDataset",
    "DATASETS",
    "compare_datasets",
    "AugmentConfig",
    "dual_view_train_batch",
    "dual_view_eval_batch",
    "random_rect_mask",
    "grid_shuffle",
    "color_jitter",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "BatchLoader",
    "DevicePrefetcher",
    "DeviceDatasetCache",
    "device_cache_fits",
    "HostDecodedCache",
    "host_cache_fits",
    "create_multi_loaders",
    "shard_batch",
]
