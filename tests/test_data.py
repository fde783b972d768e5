"""Data layer tests: on-device augmentation distributional/structural
properties, synthetic dataset, batch loader determinism."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ego_moment_cle_vit_tpu.data import (
    AugmentConfig,
    BatchLoader,
    SyntheticUFGDataset,
    dual_view_train_batch,
    dual_view_eval_batch,
    grid_shuffle,
    random_rect_mask,
    IMAGENET_MEAN,
    IMAGENET_STD,
)

CFG = AugmentConfig(input_size=32, resize_size=48, grid_size=4)


def test_train_batch_shapes_and_range(rng):
    imgs = jnp.asarray(rng.integers(0, 256, (4, 48, 48, 3), dtype=np.uint8))
    anchor, positive = dual_view_train_batch(imgs, jax.random.PRNGKey(0), CFG)
    assert anchor.shape == (4, 32, 32, 3)
    assert positive.shape == (4, 32, 32, 3)
    # normalized range stays within (0-mean)/std .. (1-mean)/std
    lo = (0 - max(IMAGENET_MEAN)) / min(IMAGENET_STD)
    hi = (1 - min(IMAGENET_MEAN)) / min(IMAGENET_STD)
    assert float(jnp.min(anchor)) >= lo - 1e-3
    assert float(jnp.max(anchor)) <= hi + 1e-3


def test_eval_batch_is_deterministic_and_dual_equal(rng):
    imgs = jnp.asarray(rng.integers(0, 256, (2, 48, 48, 3), dtype=np.uint8))
    a1, p1 = dual_view_eval_batch(imgs, CFG)
    a2, p2 = dual_view_eval_batch(imgs, CFG)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))
    np.testing.assert_allclose(np.asarray(a1), np.asarray(p1))  # positive == anchor
    # center crop of a 48 -> 32: offset 8
    img0 = np.asarray(imgs[0], np.float32) / 255.0
    want = (img0[8:40, 8:40] - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(np.asarray(a1[0]), want, atol=1e-5)


def test_same_key_reproducible_different_keys_differ(rng):
    imgs = jnp.asarray(rng.integers(0, 256, (2, 48, 48, 3), dtype=np.uint8))
    a1, p1 = dual_view_train_batch(imgs, jax.random.PRNGKey(7), CFG)
    a2, p2 = dual_view_train_batch(imgs, jax.random.PRNGKey(7), CFG)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))
    a3, _ = dual_view_train_batch(imgs, jax.random.PRNGKey(8), CFG)
    assert not np.allclose(np.asarray(a1), np.asarray(a3))


def test_color_jitter_per_sample_random_order(rng):
    """torchvision ColorJitter applies the enabled adjustments in a random
    order per sample (fn_idx = randperm(4)); ours must sample the order
    too, not use a fixed chain.  With only brightness+hue enabled the
    output must equal one of the two possible op orders for that key's
    factors, and across keys BOTH orders must occur."""
    from ego_moment_cle_vit_tpu.data.augment import (
        _adjust_brightness,
        _adjust_hue,
        color_jitter,
    )

    cfg = AugmentConfig(
        input_size=32, resize_size=48,
        brightness=0.8, contrast=0.0, saturation=0.0, hue=0.4,
    )
    img = jnp.asarray(rng.random((8, 8, 3)).astype(np.float32))
    seen = set()
    for seed in range(12):
        key = jax.random.PRNGKey(seed)
        kb, kc, ks, kh, korder = jax.random.split(key, 5)
        fb = jax.random.uniform(kb, (), minval=1 - cfg.brightness,
                                maxval=1 + cfg.brightness)
        sh = jax.random.uniform(kh, (), minval=-cfg.hue, maxval=cfg.hue)
        got = np.asarray(color_jitter(img, key, cfg))
        b_then_h = np.asarray(_adjust_hue(_adjust_brightness(img, fb), sh))
        h_then_b = np.asarray(_adjust_brightness(_adjust_hue(img, sh), fb))
        if np.allclose(got, b_then_h, atol=1e-5):
            seen.add("bh")
        elif np.allclose(got, h_then_b, atol=1e-5):
            seen.add("hb")
        else:
            raise AssertionError(f"seed {seed}: output matches neither order")
    assert seen == {"bh", "hb"}, seen


def test_color_jitter_disabled_ops_and_determinism(rng):
    from ego_moment_cle_vit_tpu.data.augment import color_jitter

    img = jnp.asarray(rng.random((8, 8, 3)).astype(np.float32))
    off = AugmentConfig(input_size=32, resize_size=48, brightness=0.0,
                        contrast=0.0, saturation=0.0, hue=0.0)
    np.testing.assert_allclose(
        np.asarray(color_jitter(img, jax.random.PRNGKey(0), off)),
        np.asarray(img),
    )
    cfg = AugmentConfig(input_size=32, resize_size=48)
    a = color_jitter(img, jax.random.PRNGKey(3), cfg)
    b = color_jitter(img, jax.random.PRNGKey(3), cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert a.shape == img.shape


def test_color_jitter_matches_sequential_chain_all_four_ops(rng):
    """The composed-affine implementation must equal the exact sequential
    per-op chain in the sampled permutation order whenever no pixel
    saturates mid-chain (the only documented divergence is clamp
    placement).  Uses a mid-range image and the default (small) jitter
    strengths so no clamp fires."""
    from ego_moment_cle_vit_tpu.data.augment import (
        _adjust_brightness,
        _adjust_contrast,
        _adjust_hue,
        _adjust_saturation,
        color_jitter,
    )

    cfg = AugmentConfig(
        input_size=32, resize_size=48,
        brightness=0.2, contrast=0.2, saturation=0.2, hue=0.1,
    )
    img = jnp.asarray((0.35 + 0.3 * rng.random((8, 8, 3))).astype(np.float32))
    seq_ops = {
        0: _adjust_brightness,
        1: _adjust_contrast,
        2: _adjust_saturation,
        3: _adjust_hue,
    }
    matched = set()
    for seed in range(10):
        key = jax.random.PRNGKey(seed)
        kb, kc, ks, kh, korder = jax.random.split(key, 5)
        factors = {
            0: jax.random.uniform(kb, (), minval=0.8, maxval=1.2),
            1: jax.random.uniform(kc, (), minval=0.8, maxval=1.2),
            2: jax.random.uniform(ks, (), minval=0.8, maxval=1.2),
            3: jax.random.uniform(kh, (), minval=-0.1, maxval=0.1),
        }
        perm = np.asarray(jax.random.permutation(korder, 4))
        ref = img
        for code in perm:
            ref = seq_ops[int(code)](ref, factors[int(code)])
        got = np.asarray(color_jitter(img, key, cfg))
        np.testing.assert_allclose(got, np.asarray(ref), atol=2e-5)
        matched.add(tuple(perm.tolist()))
    assert len(matched) >= 3, f"permutation variety too low: {matched}"


def test_anchor_and_positive_views_differ(rng):
    imgs = jnp.asarray(rng.integers(0, 256, (2, 48, 48, 3), dtype=np.uint8))
    anchor, positive = dual_view_train_batch(imgs, jax.random.PRNGKey(0), CFG)
    assert not np.allclose(np.asarray(anchor), np.asarray(positive))


def test_fft_rotate_matches_gather_reference():
    """The FFT 3-shear rotation must match the bilinear gather rotation in
    the interior (different interpolants; edges/fill differ slightly)."""
    from ego_moment_cle_vit_tpu.data.augment import rotate, rotate_gather

    s = 64
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
    img = jnp.asarray(
        np.stack(
            [np.sin(yy / 6) + np.cos(xx / 9), np.cos(yy / 11), (yy + xx) / s / 2],
            -1,
        ).astype(np.float32)
    )
    for angle in (10.0, -7.3):
        ref = rotate_gather(img, jnp.float32(angle))
        got = rotate(img, jnp.float32(angle))
        inner = (slice(16, -16), slice(16, -16), slice(None))
        assert float(jnp.max(jnp.abs(ref[inner] - got[inner]))) < 0.06
    # zero rotation is the identity for both
    np.testing.assert_allclose(
        np.asarray(rotate(img, jnp.float32(0.0))), np.asarray(img), atol=1e-4
    )


def test_rect_mask_area_fraction(rng):
    """Masked-away fraction must land in ~[0.15, 0.45] (area-ratio law,
    reference cle_vit_backbone.py:61-71)."""
    img = jnp.ones((64, 64, 3), jnp.float32)
    fracs = []
    for seed in range(30):
        masked = random_rect_mask(
            img, jax.random.PRNGKey(seed), (0.15, 0.45), 0.0
        )
        fracs.append(1.0 - float(jnp.mean(masked)))
    fracs = np.asarray(fracs)
    # floor() quantization can undershoot slightly at small sizes
    assert fracs.min() >= 0.10 and fracs.max() <= 0.50, fracs
    assert 0.2 <= fracs.mean() <= 0.4


def test_grid_shuffle_is_permutation(rng):
    """Tile shuffle must preserve the multiset of pixels and move tiles as
    units (reference cle_vit_backbone.py:73-95)."""
    img = jnp.asarray(rng.standard_normal((32, 32, 3)).astype(np.float32))
    out = grid_shuffle(img, jax.random.PRNGKey(3), 4)
    # same multiset of pixel values
    np.testing.assert_allclose(
        np.sort(np.asarray(out).ravel()), np.sort(np.asarray(img).ravel()), atol=0
    )
    # each 8x8 output tile equals SOME input tile exactly
    tiles_in = np.asarray(img).reshape(4, 8, 4, 8, 3).transpose(0, 2, 1, 3, 4).reshape(16, -1)
    tiles_out = np.asarray(out).reshape(4, 8, 4, 8, 3).transpose(0, 2, 1, 3, 4).reshape(16, -1)
    for t in tiles_out:
        assert any(np.array_equal(t, s) for s in tiles_in)


def test_synthetic_dataset_interface():
    ds = SyntheticUFGDataset(num_classes=5, samples_per_class=3, image_size=48)
    assert len(ds) == 15
    img, label = ds[0]
    assert img.shape == (48, 48, 3) and img.dtype == np.uint8
    assert 0 <= label < 5
    img2, _ = ds[0]
    np.testing.assert_array_equal(img, img2)  # deterministic
    info = ds.get_dataset_info()
    assert info["current_classes"] == 5
    assert ds.classes == sorted(ds.classes)


def test_batch_loader_determinism_and_shapes():
    ds = SyntheticUFGDataset(num_classes=4, samples_per_class=5, image_size=48)
    loader = BatchLoader(ds, batch_size=8, shuffle=True, seed=1, num_workers=2)
    assert len(loader) == 2  # 20 // 8 with drop_last
    b1 = [lbl.copy() for _, lbl in loader]
    loader.set_epoch(0)
    b2 = [lbl.copy() for _, lbl in loader]
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x, y)  # same epoch -> same order
    loader.set_epoch(1)
    b3 = np.concatenate([lbl for _, lbl in loader])
    assert not np.array_equal(np.concatenate(b1), b3)  # reshuffled
    imgs, labels = next(iter(loader))
    assert imgs.shape == (8, 48, 48, 3) and imgs.dtype == np.uint8
    assert labels.shape == (8,) and labels.dtype == np.int32


def test_loader_no_prefetch_path():
    ds = SyntheticUFGDataset(num_classes=2, samples_per_class=4, image_size=32)
    loader = BatchLoader(ds, batch_size=4, prefetch=0, num_workers=1)
    batches = list(loader)
    assert len(batches) == 2


def test_batch_loader_multihost_sharding_disjoint():
    """Per-process stride: two hosts see disjoint halves of one global
    shuffle (multi-host input pipeline; SURVEY.md §7 step 7)."""
    ds = SyntheticUFGDataset(num_classes=4, samples_per_class=6, image_size=32)
    loaders = [
        BatchLoader(
            ds, batch_size=4, seed=3, num_workers=1, prefetch=0,
            process_index=i, process_count=2,
        )
        for i in range(2)
    ]
    assert len(loaders[0]) == 3  # 24 samples / 2 hosts / batch 4
    seen = []
    for loader in loaders:
        loader.set_epoch(0)
        idxs = [tuple(lbl) for _, lbl in loader]
        seen.append(idxs)
    # same epoch, different host -> different batches
    assert seen[0] != seen[1]


def test_batch_loader_abandoned_iterator_does_not_wedge():
    """Abandoning the prefetching generator mid-epoch must release the
    producer thread promptly (ADVICE r2: the bounded-queue put could block
    forever once the consumer was gone)."""
    import threading
    import time

    ds = SyntheticUFGDataset(num_classes=4, samples_per_class=32,
                             resize_size=8, split="train")
    loader = BatchLoader(ds, batch_size=4, num_workers=2, prefetch=1)
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # abandon mid-epoch; queue is full at this point
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_ufgvc_rejects_unknown_dataset():
    from ego_moment_cle_vit_tpu.data import UFGVCDataset

    with pytest.raises(ValueError, match="not found"):
        UFGVCDataset(dataset_name="nope", download=False)


def test_grid_shuffle_non_divisible_size():
    """input_size % grid_size != 0 leaves the remainder strip un-shuffled
    (the reference's integer-division tile loop never touches it) instead
    of crashing at trace time."""
    from ego_moment_cle_vit_tpu.data.augment import grid_shuffle

    img = jnp.asarray(np.random.default_rng(0).random((450, 450, 3)), jnp.float32)
    out = grid_shuffle(img, jax.random.PRNGKey(0), 4)
    assert out.shape == img.shape
    np.testing.assert_array_equal(np.asarray(out[448:]), np.asarray(img[448:]))
    np.testing.assert_array_equal(np.asarray(out[:, 448:]), np.asarray(img[:, 448:]))
    # the shuffled region is a permutation of the original tiles
    np.testing.assert_allclose(
        np.sort(np.asarray(out[:448, :448]).ravel()),
        np.sort(np.asarray(img[:448, :448]).ravel()),
    )


def test_device_prefetcher_matches_inline_transfer():
    """DevicePrefetcher yields the same batches as inline shard_batch, in
    order, and surfaces producer exceptions."""
    import jax
    import numpy as np

    from ego_moment_cle_vit_tpu.data import (
        BatchLoader,
        DevicePrefetcher,
        SyntheticUFGDataset,
    )

    ds = SyntheticUFGDataset(num_classes=4, samples_per_class=4, resize_size=32)
    loader = BatchLoader(ds, batch_size=4, shuffle=False, num_workers=2)
    inline = [(np.asarray(i), np.asarray(l)) for i, l in loader]
    pre = list(DevicePrefetcher(loader, depth=2))
    assert len(pre) == len(inline)
    for (ii, il), (pi, pl) in zip(inline, pre):
        assert isinstance(pi, jax.Array)
        np.testing.assert_array_equal(ii, np.asarray(pi))
        np.testing.assert_array_equal(il, np.asarray(pl))

    # abandoning mid-iteration must not wedge (transfer thread gives up)
    it = iter(DevicePrefetcher(loader, depth=1))
    next(it)
    it.close()

    # producer exceptions surface at the consumer
    class Boom:
        def __iter__(self):
            yield (np.zeros((1, 8, 8, 3), np.uint8), np.zeros((1,), np.int32))
            raise RuntimeError("boom")

    import pytest

    with pytest.raises(RuntimeError, match="boom"):
        list(DevicePrefetcher(Boom(), depth=1))


def test_device_dataset_cache_matches_batch_loader():
    """Cache yields the same epoch-seeded shuffle order and batch contents
    as BatchLoader, and set_epoch changes the order deterministically."""
    import numpy as np

    from ego_moment_cle_vit_tpu.data import (
        BatchLoader,
        DeviceDatasetCache,
        SyntheticUFGDataset,
    )

    ds = SyntheticUFGDataset(num_classes=5, samples_per_class=5, resize_size=24)
    loader = BatchLoader(ds, batch_size=8, shuffle=True, seed=3, num_workers=2)
    cache = DeviceDatasetCache(ds, batch_size=8, shuffle=True, seed=3, num_workers=2)
    assert len(cache) == len(loader)
    for epoch in (0, 1):
        loader.set_epoch(epoch)
        cache.set_epoch(epoch)
        for (hi, hl), (ci, cl) in zip(loader, cache):
            np.testing.assert_array_equal(hi, np.asarray(ci))
            np.testing.assert_array_equal(hl, np.asarray(cl))

    # different epochs -> different order
    cache.set_epoch(0)
    first0 = np.asarray(next(iter(cache))[1])
    cache.set_epoch(1)
    first1 = np.asarray(next(iter(cache))[1])
    assert not np.array_equal(first0, first1)


def test_device_dataset_cache_mesh_sharding():
    """Under a mesh the cache's gather emits data-axis-sharded batches —
    the same placement shard_batch produces."""
    import jax
    import numpy as np

    from ego_moment_cle_vit_tpu.data import (
        DeviceDatasetCache,
        SyntheticUFGDataset,
        shard_batch,
    )
    from ego_moment_cle_vit_tpu.parallel import create_mesh

    mesh = create_mesh(data=len(jax.devices()))
    ds = SyntheticUFGDataset(num_classes=4, samples_per_class=4, resize_size=16)
    cache = DeviceDatasetCache(
        ds, batch_size=8, shuffle=False, num_workers=2, mesh=mesh
    )
    imgs, lbls = next(iter(cache))
    ref_imgs, _ = shard_batch(
        (np.stack([ds[i][0] for i in range(8)]), np.arange(8)), mesh
    )
    assert imgs.sharding == ref_imgs.sharding
    np.testing.assert_array_equal(np.asarray(imgs), np.asarray(ref_imgs))


def test_trainer_device_cache_auto(tmp_path):
    """data.device_cache auto engages the HBM cache for a tiny synthetic
    split and trains an epoch end-to-end on it."""
    import numpy as np

    from ego_moment_cle_vit_tpu.data import DeviceDatasetCache
    from ego_moment_cle_vit_tpu.train.trainer import Trainer
    from ego_moment_cle_vit_tpu.utils.config import load_config

    cfg = load_config("configs/smoke_synthetic.yaml")
    cfg["experiment"]["output_dir"] = str(tmp_path / "outputs")
    cfg["experiment"]["save_dir"] = str(tmp_path / "ckpts")
    cfg["experiment"]["log_dir"] = str(tmp_path / "logs")
    cfg.setdefault("data", {})["device_cache"] = "auto"
    trainer = Trainer(cfg)
    trainer.setup_data()
    trainer.setup_model()
    assert isinstance(trainer.train_loader, DeviceDatasetCache)
    metrics = trainer.train_epoch(0)
    assert np.isfinite(metrics["loss"])


def test_host_decoded_cache_matches_dataset():
    """HostDecodedCache: identical samples, passthrough surface, and the
    BatchLoader stream over it equals the stream over the raw dataset."""
    from ego_moment_cle_vit_tpu.data import HostDecodedCache, host_cache_fits

    ds = SyntheticUFGDataset(
        num_classes=3, samples_per_class=6, image_size=32, learnable=True
    )
    cache = HostDecodedCache(ds, num_workers=2, worker_type="thread")
    assert len(cache) == len(ds)
    assert cache.classes == ds.classes
    assert cache.num_classes == ds.num_classes
    assert cache.image_size == 32
    assert cache.nbytes == cache.images.nbytes + cache.labels.nbytes
    for i in (0, 5, len(ds) - 1):
        img, lbl = ds[i]
        cimg, clbl = cache[i]
        np.testing.assert_array_equal(cimg, img)
        assert clbl == lbl

    raw = list(BatchLoader(ds, batch_size=4, shuffle=True, seed=3, num_workers=2))
    cached = list(
        BatchLoader(cache, batch_size=4, shuffle=True, seed=3, num_workers=2)
    )
    for (ri, rl), (ci, cl) in zip(raw, cached):
        np.testing.assert_array_equal(ri, ci)
        np.testing.assert_array_equal(rl, cl)

    assert host_cache_fits(100, 32, 100 * 32 * 32 * 3)
    assert not host_cache_fits(100, 32, 100 * 32 * 32 * 3 - 1)


def test_host_decoded_cache_process_pool():
    """The fork-pool decode path fills the cache identically."""
    from ego_moment_cle_vit_tpu.data import HostDecodedCache

    ds = SyntheticUFGDataset(
        num_classes=2, samples_per_class=40, image_size=24, learnable=True
    )  # n=80 > the 64-sample process-pool threshold
    thread = HostDecodedCache(ds, num_workers=2, worker_type="thread")
    proc = HostDecodedCache(ds, num_workers=2, worker_type="process")
    np.testing.assert_array_equal(proc.images, thread.images)
    np.testing.assert_array_equal(proc.labels, thread.labels)


def test_spawn_pool_matches_fork(monkeypatch):
    """EMCT_POOL_START=spawn (the fork-after-threads-safe mode bench.py
    selects when a live JAX client exists) decodes identically to fork."""
    from ego_moment_cle_vit_tpu.data import HostDecodedCache

    ds = SyntheticUFGDataset(
        num_classes=2, samples_per_class=40, image_size=24, learnable=True
    )
    fork = HostDecodedCache(ds, num_workers=2, worker_type="process")
    monkeypatch.setenv("EMCT_POOL_START", "spawn")
    spawn = HostDecodedCache(ds, num_workers=2, worker_type="process")
    np.testing.assert_array_equal(spawn.images, fork.images)
    np.testing.assert_array_equal(spawn.labels, fork.labels)


def test_batch_loader_process_workers_match_threads():
    """worker_type='process' yields bit-identical batches to the thread
    pool (same shuffle seed drives both)."""
    ds = SyntheticUFGDataset(
        num_classes=3, samples_per_class=8, image_size=24, learnable=True
    )
    t = list(
        BatchLoader(
            ds, batch_size=6, shuffle=True, seed=11, num_workers=2,
            worker_type="thread",
        )
    )
    p = list(
        BatchLoader(
            ds, batch_size=6, shuffle=True, seed=11, num_workers=2,
            worker_type="process",
        )
    )
    assert len(t) == len(p) == 4
    for (ti, tl), (pi, pl) in zip(t, p):
        np.testing.assert_array_equal(ti, pi)
        np.testing.assert_array_equal(tl, pl)
