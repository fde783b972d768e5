"""Trainer engine.

Capability parity with the reference Trainer (/root/reference/train.py:95-539):
logging/seeding/dirs/wandb setup, data + model setup, the epoch loop with
train/validate/checkpoint cadence, grad clipping, LR scheduling, resume.

TPU-native differences:
* ONE jitted train step contains the on-device dual-view augmentation, the
  fused dual-stream forward, loss, backward, and the optimizer update —
  the host only feeds uint8 batches and reads back scalar metrics.
* Scale-out is a ('data', 'model') mesh: batches shard over 'data', the
  moment-head projection shards over 'model' (see ..parallel.sharding).
* The LR schedule is per-step warmup-cosine (fixing ledger #4's
  step-before-epoch quirk and implementing the warmup keys the reference
  ignores, ledger #5).
"""

from __future__ import annotations

import logging
import time
from functools import partial
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import (
    AugmentConfig,
    BatchLoader,
    DeviceDatasetCache,
    DevicePrefetcher,
    HostDecodedCache,
    host_cache_fits,
    SyntheticUFGDataset,
    UFGVCDataset,
    device_cache_fits,
    dual_view_eval_batch,
    dual_view_train_batch,
    shard_batch,
)
from ..models import create_model
from ..parallel import create_mesh, shard_params
from ..utils.ops import set_seed, get_model_info
from .state import (
    EMCTrainState,
    create_learning_rate_schedule,
    create_train_state,
    restore_checkpoint,
    save_checkpoint,
)


def _make_dataset(config: Dict[str, Any], split: str):
    dcfg = config.get("dataset", {})
    data = config.get("data", {})
    resize = int(data.get("resize_size", 600))
    name = dcfg.get("name", "cotton80")
    if name == "synthetic" or dcfg.get("synthetic", False):
        return SyntheticUFGDataset(
            num_classes=int(dcfg.get("num_classes", 80)),
            samples_per_class=int(dcfg.get("samples_per_class", 9)),
            image_size=resize,
            split=split,
            seed=int(config.get("experiment", {}).get("seed", 42)),
            learnable=bool(dcfg.get("learnable", False)),
        )
    return UFGVCDataset(
        dataset_name=name,
        root=dcfg.get("root", "./data"),
        split=split,
        resize_size=resize,
        download=bool(dcfg.get("download", True)),
    )


def _augment_config(config: Dict[str, Any]) -> AugmentConfig:
    data = config.get("data", {})
    jitter = data.get("color_jitter", {}) or {}
    return AugmentConfig(
        input_size=int(data.get("input_size", 448)),
        resize_size=int(data.get("resize_size", 600)),
        hflip_prob=float(data.get("horizontal_flip", 0.5)),
        brightness=float(jitter.get("brightness", 0.2)),
        contrast=float(jitter.get("contrast", 0.2)),
        saturation=float(jitter.get("saturation", 0.2)),
        hue=float(jitter.get("hue", 0.1)),
        rotation_degrees=float(data.get("rotation", 10.0)),
        mask_ratio=tuple(data.get("mask_ratio", (0.15, 0.45))),
        grid_size=int(data.get("grid_size", 4)),
        mean=tuple(data.get("mean", (0.485, 0.456, 0.406))),
        std=tuple(data.get("std", (0.229, 0.224, 0.225))),
    )


class Trainer:
    """Config-driven training engine (same lifecycle as the reference:
    ``Trainer(config).setup_data(); setup_model(); train()``)."""

    def __init__(self, config: Dict[str, Any]):
        self.config = config
        exp = config.get("experiment", {})
        self.exp_name = exp.get("name", "ego_moment_clevit")
        self.output_dir = Path(exp.get("output_dir", "./outputs"))
        self.ckpt_dir = Path(exp.get("save_dir", "./checkpoints"))
        self.log_dir = Path(exp.get("log_dir", "./logs"))
        for d in (self.output_dir, self.ckpt_dir, self.log_dir):
            d.mkdir(parents=True, exist_ok=True)

        self.logger = self._setup_logging()
        self.seed = int(exp.get("seed", 42))
        self.root_key = set_seed(self.seed)
        self.aug_cfg = _augment_config(config)

        mesh_cfg = exp.get("mesh", {})
        self.mesh = create_mesh(
            data=mesh_cfg.get("data"), model=int(mesh_cfg.get("model", 1))
        )
        self.logger.info(
            "devices=%d mesh=%s", len(jax.devices()), dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        )
        # register the mesh for SPMD kernel dispatch: on a >1-device TPU
        # mesh the Pallas kernels run per-shard via shard_map
        # (parallel.shard_kernels) instead of falling back to XLA
        if self.mesh.size > 1:
            from ..parallel import set_kernel_mesh

            set_kernel_mesh(self.mesh)

        self.wandb_run = self._setup_wandb()
        self.state: Optional[EMCTrainState] = None
        self.best_val_acc = 0.0
        self.start_epoch = 0
        self.history: Dict[str, list] = {
            "train_loss": [],
            "train_acc": [],
            "val_loss": [],
            "val_acc": [],
            "lr": [],
        }

    # -- setup ---------------------------------------------------------------

    def _setup_logging(self) -> logging.Logger:
        logger = logging.getLogger(f"emct.{self.exp_name}")
        logger.setLevel(logging.INFO)
        if not logger.handlers:
            fh = logging.FileHandler(self.log_dir / f"{self.exp_name}.log")
            ch = logging.StreamHandler()
            fmt = logging.Formatter(
                "%(asctime)s %(name)s %(levelname)s %(message)s"
            )
            fh.setFormatter(fmt)
            ch.setFormatter(fmt)
            logger.addHandler(fh)
            logger.addHandler(ch)
        return logger

    def _setup_wandb(self):
        wcfg = self.config.get("experiment", {}).get("wandb", {})
        if not wcfg.get("enabled", False):
            return None
        try:
            import wandb

            return wandb.init(
                project=wcfg.get("project", "ego-moment-clevit"),
                entity=wcfg.get("entity"),
                name=self.exp_name,
                config=self.config,
            )
        except Exception as exc:  # pragma: no cover - wandb optional
            self.logger.warning("wandb unavailable: %s", exc)
            return None

    def setup_data(self) -> None:
        tcfg = self.config.get("training", {})
        batch_size = int(tcfg.get("batch_size", 64))
        self.train_dataset = _make_dataset(self.config, "train")
        try:
            self.val_dataset = _make_dataset(self.config, "val")
        except ValueError:
            self.logger.warning("no val split; falling back to test")
            self.val_dataset = _make_dataset(self.config, "test")

        dcfg = self.config.get("data", {})
        workers = int(dcfg.get("num_workers", 8))
        # device-side prefetch depth (batches staged onto the device ahead
        # of compute); data.device_prefetch=0 restores inline transfer
        self._device_prefetch = int(dcfg.get("device_prefetch", 2))
        # clamp the val batch to the split size: with drop_last (static
        # XLA shapes) a split smaller than the train batch would otherwise
        # yield ZERO val batches and best_val_acc would never update
        val_batch = max(1, min(batch_size, len(self.val_dataset)))

        # HBM-resident dataset cache (data.device_cache: auto|true|false).
        # UFG splits are small; uploading the decoded split once and
        # gathering batches on device removes per-step H2D entirely —
        # data/device_cache.py.  'auto' caches each split that fits the
        # budget; multi-process (multi-host) runs keep the host loader,
        # which already strides the global shuffle per process.
        cache_mode = str(dcfg.get("device_cache", "auto")).lower()
        budget = int(
            float(dcfg.get("device_cache_budget_gb", 6.0)) * 1024**3
        )
        multi_host = jax.process_count() > 1

        # host-RAM decoded cache for splits that miss the HBM budget
        # (data.host_cache: auto|true|false): decode once, stream memcpy
        # batches after — removes the per-epoch PIL decode bottleneck
        # (the reference re-decodes every epoch in its DataLoader workers,
        # train.py:241-257).  data.worker_type: thread|process picks the
        # decode pool for the streaming path (process = GIL-free, the
        # torch-worker equivalent).
        host_cache_mode = str(dcfg.get("host_cache", "auto")).lower()
        host_budget = int(
            float(dcfg.get("host_cache_budget_gb", 16.0)) * 1024**3
        )
        worker_type = str(dcfg.get("worker_type", "thread"))

        def make_loader(dataset, bsz, shuffle):
            img_size = getattr(dataset, "image_size", None) or int(
                dcfg.get("resize_size", 600)
            )
            fits = device_cache_fits(len(dataset), img_size, budget)
            use_cache = cache_mode == "true" or (
                cache_mode == "auto" and fits and not multi_host
            )
            if use_cache:
                if not fits:
                    self.logger.warning(
                        "device_cache=true but split (%d x %d^2) exceeds the "
                        "%d GB budget; caching anyway as requested",
                        len(dataset), img_size, budget // 1024**3,
                    )
                loader = DeviceDatasetCache(
                    dataset,
                    batch_size=bsz,
                    shuffle=shuffle,
                    seed=self.seed,
                    num_workers=workers,
                    mesh=self.mesh,
                )
                self.logger.info(
                    "device cache: %d samples (%.0f MB) resident in HBM",
                    len(dataset), loader.nbytes / 1e6,
                )
                return loader
            host_fits = host_cache_fits(len(dataset), img_size, host_budget)
            if host_cache_mode == "true" or (
                host_cache_mode == "auto" and host_fits
            ):
                dataset = HostDecodedCache(
                    dataset, num_workers=workers, worker_type="process"
                )
                self.logger.info(
                    "host decoded cache: %d samples (%.0f MB) in RAM",
                    len(dataset), dataset.nbytes / 1e6,
                )
            return BatchLoader(
                dataset,
                batch_size=bsz,
                shuffle=shuffle,
                seed=self.seed,
                num_workers=workers,
                worker_type=worker_type,
            )

        self.train_loader = make_loader(self.train_dataset, batch_size, True)
        self.val_loader = make_loader(self.val_dataset, val_batch, False)
        # inject num_classes from the dataset (reference train.py:260)
        self.num_classes = len(self.train_dataset.classes)
        self.config.setdefault("model", {})["num_classes"] = self.num_classes
        self.logger.info(
            "data: train=%d val=%d classes=%d batch=%d",
            len(self.train_dataset),
            len(self.val_dataset),
            self.num_classes,
            batch_size,
        )

    def setup_model(self) -> None:
        self.model = create_model(self.config, self.num_classes)
        tcfg = self.config.get("training", {})
        batch_size = int(tcfg.get("batch_size", 64))
        in_size = self.aug_cfg.input_size

        init_key, self.train_key = jax.random.split(self.root_key)
        dummy = jnp.zeros((2, in_size, in_size, 3), jnp.float32)
        dummy_labels = jnp.zeros((2,), jnp.int32)
        # jitted: eager flax init dispatches each initializer op through a
        # remote-dispatch TPU path one RTT at a time (see train/state.py
        # create_train_state for the same pathology on tx.init)
        variables = jax.jit(self.model.init)(init_key, dummy, dummy, dummy_labels)

        # pretrained backbone splice (timm state_dict file; see
        # utils/port_weights.py — the reference's timm.create_model(...,
        # pretrained=True) equivalent in a zero-egress world)
        mcfg = self.config.get("model", {})
        ckpt = mcfg.get("timm_checkpoint")
        if mcfg.get("pretrained") and ckpt:
            from ..utils.port_weights import (
                load_torch_backbone,
                splice_backbone_params,
            )

            name = mcfg.get("backbone_name", "")
            family = "swin" if name.startswith("swin") else "vit"
            backbone_params = load_torch_backbone(name, ckpt)
            variables = dict(variables)
            variables["params"] = splice_backbone_params(
                variables["params"], backbone_params, family
            )
            self.logger.info("loaded pretrained backbone from %s", ckpt)
        elif mcfg.get("pretrained"):
            self.logger.warning(
                "model.pretrained=true but no model.timm_checkpoint path "
                "given — training from scratch"
            )

        steps_per_epoch = max(len(self.train_loader), 1)
        self.state = create_train_state(
            self.model, variables, self.config, steps_per_epoch
        )
        # host-side copy of the LR schedule for logging (reference logs lr
        # per step to wandb and into the curves, train.py:402-408,:509-517)
        self.lr_schedule = create_learning_rate_schedule(
            self.config, steps_per_epoch
        )
        # the schedule runs on the optimizer-update clock; state.step counts
        # micro-batches (flax increments per apply_gradients call)
        self._lr_accum = max(
            int(self.config.get("training", {}).get("accumulation_steps", 1)),
            1,
        )
        # place parameters on the mesh (replicated / model-sharded per rules)
        self.state = self.state.replace(
            params=shard_params(self.state.params, self.mesh),
        )
        info = get_model_info(self.state.params)
        self.logger.info(
            "model: %s params=%s (%.1f MB fp32)",
            self.config["model"].get("backbone_name"),
            f"{info['total_parameters']:,}",
            info["parameter_memory_mb"],
        )
        self._build_steps()

    def resume(self, ckpt_path: str) -> None:
        target = {
            "params": jax.device_get(self.state.params),
            "opt_state": jax.device_get(self.state.opt_state),
        }
        if self.state.batch_stats is not None:
            target["batch_stats"] = jax.device_get(self.state.batch_stats)
        if self.state.constants is not None:
            target["constants"] = jax.device_get(self.state.constants)
        bundle = restore_checkpoint(ckpt_path, target=target)
        self.state = self.state.replace(
            params=bundle["params"],
            opt_state=bundle["opt_state"],
            batch_stats=bundle.get("batch_stats"),
            constants=bundle.get("constants"),
            step=bundle["step"],
        )
        self.start_epoch = bundle["epoch"] + 1
        self.best_val_acc = bundle.get("best_val_acc", 0.0)
        self.logger.info(
            "resumed from %s at epoch %d (best %.4f)",
            ckpt_path,
            self.start_epoch,
            self.best_val_acc,
        )

    # -- jitted steps ----------------------------------------------------------

    def _build_steps(self) -> None:
        model = self.model
        aug_cfg = self.aug_cfg
        has_bn = self.state.batch_stats is not None

        def train_step(state: EMCTrainState, images_u8, labels, key):
            step_key = jax.random.fold_in(key, state.step)
            aug_key, dropout_key = jax.random.split(step_key)
            anchor, positive = dual_view_train_batch(images_u8, aug_key, aug_cfg)

            def loss_fn(params):
                variables = {"params": params}
                if state.constants is not None:
                    variables["constants"] = state.constants
                if has_bn:
                    variables["batch_stats"] = state.batch_stats
                out = model.apply(
                    variables,
                    anchor,
                    positive,
                    labels,
                    deterministic=False,
                    rngs={"dropout": dropout_key},
                    mutable=["batch_stats"] if has_bn else False,
                )
                if has_bn:
                    out, mutated = out
                    return out["loss"], (out, mutated.get("batch_stats"))
                return out["loss"], (out, None)

            (loss, (out, new_bn)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            state = state.apply_gradients(grads=grads)
            if has_bn:
                state = state.replace(batch_stats=new_bn)
            acc = jnp.mean(
                (jnp.argmax(out["logits"], axis=-1) == labels).astype(jnp.float32)
            )
            metrics = {"loss": loss, "accuracy": acc}
            for k, v in out["loss_dict"].items():
                metrics[k] = v
            return state, metrics

        def eval_step(state: EMCTrainState, images_u8, labels):
            anchor, positive = dual_view_eval_batch(images_u8, aug_cfg)
            variables = {"params": state.params}
            if state.constants is not None:
                variables["constants"] = state.constants
            if has_bn:
                variables["batch_stats"] = state.batch_stats
            out = model.apply(variables, anchor, positive, labels)
            acc = jnp.mean(
                (jnp.argmax(out["logits"], axis=-1) == labels).astype(jnp.float32)
            )
            return {"loss": out["loss"], "accuracy": acc}

        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        self._eval_step = jax.jit(eval_step)

    # -- loops ----------------------------------------------------------------

    def _device_batches(self, loader):
        """Device-resident batches; data.device_prefetch=0 restores the
        inline per-batch transfer (debugging aid)."""
        if isinstance(loader, DeviceDatasetCache):
            return iter(loader)  # batches are already in HBM
        if self._device_prefetch > 0:
            return DevicePrefetcher(
                loader, self.mesh, depth=self._device_prefetch
            )
        return (shard_batch(b, self.mesh) for b in loader)

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        self.train_loader.set_epoch(epoch)
        exp = self.config.get("experiment", {})
        log_freq = int(exp.get("log_frequency", 100))
        # jax.profiler trace (SURVEY.md §5: the reference has no profiler
        # integration at all; here experiment.profile_steps captures a trace
        # of the first N steps of epoch 0 into log_dir/profile)
        profile_steps = int(exp.get("profile_steps", 0))
        if profile_steps > 0 and epoch == self.start_epoch:
            jax.profiler.start_trace(str(self.log_dir / "profile"))
        totals_dev = None
        count = 0
        t0 = time.perf_counter()
        images_seen = 0
        # stage batches onto the device ahead of compute: the H2D copy of
        # batch N+1 overlaps the step on batch N (measured 3x e2e on the
        # remote-attached TPU vs inline shard_batch)
        for i, (images, labels) in enumerate(
            self._device_batches(self.train_loader)
        ):
            if profile_steps > 0 and epoch == self.start_epoch and i == profile_steps:
                jax.profiler.stop_trace()
                profile_steps = 0
                self.logger.info("profiler trace written to %s", self.log_dir / "profile")
            self.state, metrics = self._train_step(
                self.state, images, labels, self.train_key
            )
            count += 1
            images_seen += labels.shape[0]
            # accumulate ON DEVICE: a float() per metric per micro-step is a
            # full device sync that defeats async dispatch (host blocks
            # before the next step is even enqueued)
            if totals_dev is None:
                totals_dev = dict(metrics)
            else:
                totals_dev = {k: totals_dev[k] + v for k, v in metrics.items()}
            if (i + 1) % log_freq == 0:
                lr = float(
                    self.lr_schedule(int(self.state.step) // self._lr_accum)
                )
                self.logger.info(
                    "epoch %d step %d loss=%.4f acc=%.4f lr=%.2e",
                    epoch,
                    i + 1,
                    float(totals_dev["loss"]) / count,
                    float(totals_dev["accuracy"]) / count,
                    lr,
                )
                # per-step wandb parity (reference train.py:402-408)
                if self.wandb_run is not None:
                    self.wandb_run.log(
                        {
                            "step": int(self.state.step),
                            "train/step_loss": float(metrics["loss"]),
                            "train/step_acc": float(metrics["accuracy"]),
                            "lr": lr,
                        }
                    )
        if profile_steps > 0 and epoch == self.start_epoch:
            jax.profiler.stop_trace()
            self.logger.info("profiler trace written to %s", self.log_dir / "profile")
        totals = (
            {k: float(v) for k, v in totals_dev.items()} if totals_dev else {}
        )
        elapsed = time.perf_counter() - t0
        avg = {k: v / max(count, 1) for k, v in totals.items()}
        avg["images_per_sec"] = images_seen / max(elapsed, 1e-9)
        return avg

    def validate(self) -> Dict[str, float]:
        totals = {"loss": 0.0, "accuracy": 0.0}
        count = 0
        for images, labels in self._device_batches(self.val_loader):
            metrics = self._eval_step(self.state, images, labels)
            count += 1
            for k in totals:
                totals[k] += float(metrics[k])
        return {k: v / max(count, 1) for k, v in totals.items()}

    def train(self) -> Dict[str, Any]:
        tcfg = self.config.get("training", {})
        epochs = int(tcfg.get("epochs", 100))
        val_freq = int(tcfg.get("val_frequency", 1))
        save_freq = int(tcfg.get("save_frequency", 10))

        for epoch in range(self.start_epoch, epochs):
            train_metrics = self.train_epoch(epoch)
            epoch_lr = float(
                self.lr_schedule(int(self.state.step) // self._lr_accum)
            )
            self.history["train_loss"].append(train_metrics["loss"])
            self.history["train_acc"].append(train_metrics["accuracy"])
            self.history["lr"].append(epoch_lr)
            # per-term loss curves (loss_main_ce, loss_triplet, loss_align,
            # ...): already computed on-device by the step's loss_dict; the
            # learning tests assert the auxiliary terms actually decrease
            for k, v in train_metrics.items():
                if k.startswith("loss_"):
                    self.history.setdefault(f"train_{k}", []).append(v)
            self.logger.info(
                "epoch %d done: loss=%.4f acc=%.4f lr=%.2e (%.1f img/s)",
                epoch,
                train_metrics["loss"],
                train_metrics["accuracy"],
                epoch_lr,
                train_metrics["images_per_sec"],
            )

            val_metrics = None
            if (epoch + 1) % val_freq == 0:
                val_metrics = self.validate()
                self.history["val_loss"].append(val_metrics["loss"])
                self.history["val_acc"].append(val_metrics["accuracy"])
                self.logger.info(
                    "epoch %d val: loss=%.4f acc=%.4f",
                    epoch,
                    val_metrics["loss"],
                    val_metrics["accuracy"],
                )
                if val_metrics["accuracy"] > self.best_val_acc:
                    self.best_val_acc = val_metrics["accuracy"]
                    save_checkpoint(
                        str(self.ckpt_dir),
                        self.state,
                        epoch,
                        self.best_val_acc,
                        self.config,
                        best=True,
                    )
            if self.wandb_run is not None:
                # epoch-level wandb parity incl. val + lr (train.py:509-517)
                payload = {
                    "epoch": epoch,
                    "lr": epoch_lr,
                    **{f"train/{k}": v for k, v in train_metrics.items()},
                }
                if val_metrics is not None:
                    payload.update(
                        {f"val/{k}": v for k, v in val_metrics.items()}
                    )
                    payload["val/best_acc"] = self.best_val_acc
                self.wandb_run.log(payload)
            if (epoch + 1) % save_freq == 0:
                save_checkpoint(
                    str(self.ckpt_dir),
                    self.state,
                    epoch,
                    self.best_val_acc,
                    self.config,
                )

        # final training curves (reference train.py:529-537)
        try:
            from ..utils.viz import plot_training_curves

            plot_training_curves(
                self.history, str(self.output_dir / "training_curves.png")
            )
        except Exception as exc:  # pragma: no cover - matplotlib optional
            self.logger.warning("could not plot curves: %s", exc)

        return {"best_val_acc": self.best_val_acc, "history": self.history}
