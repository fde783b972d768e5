"""Train state, optimizer/schedule factory, and checkpointing.

Capability parity with the reference's training plumbing:
* AdamW + cosine schedule (reference train.py:309-324) — and unlike the
  reference, the ``scheduler.warmup_epochs`` / ``warmup_lr`` /
  ``accumulation_steps`` config keys are actually implemented (ledger #5;
  the reference reads none of them, train.py never references warmup).
* Checkpoints carry ``{step, epoch, params, batch_stats, constants,
  opt_state, best_val_acc, config}`` — the same logical contents as the
  reference's ``save_checkpoint`` dict (train.py:448-470) — via orbax.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state


class EMCTrainState(train_state.TrainState):
    """TrainState + BatchNorm stats + non-trainable constants (sketch
    hashes) so one object carries everything a step needs."""

    batch_stats: Any = None
    constants: Any = None


class _MasterWeightsState(struct.PyTreeNode):
    master: Any
    inner: Any


def master_weights(inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """fp32 master copy for low-precision (bf16-stored) parameters.

    The inner transform runs entirely on an fp32 master tree (grads are
    upcast); the emitted update is ``bf16(new_master) - param`` cast back to
    the update dtype (matching dtypes with ``apply_if_finite``'s zero
    branch), so ``optax.apply_updates`` lands the parameter on
    ``bf16(new_master)`` to within one bf16 ulp — and since each step's
    update is recomputed against the CURRENT param, that rounding never
    accumulates.  Used for the moment head's ~269 M-param vech projection
    when ``model.moment.bf16_params`` is on: parameter reads in fwd/bwd and
    the gradient sweeps halve, while update math keeps fp32 precision
    (docs/PERFORMANCE.md "bf16 parameter storage" lever).
    """

    def init_fn(params):
        master = jax.tree_util.tree_map(
            lambda p: jnp.asarray(p, jnp.float32), params
        )
        return _MasterWeightsState(master=master, inner=inner.init(master))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("master_weights requires params")
        u32 = jax.tree_util.tree_map(
            lambda u: u.astype(jnp.float32), updates
        )
        inner_up, inner_state = inner.update(u32, state.inner, state.master)
        new_master = optax.apply_updates(state.master, inner_up)
        emitted = jax.tree_util.tree_map(
            lambda nm, p, u: (
                nm.astype(p.dtype).astype(jnp.float32) - p.astype(jnp.float32)
            ).astype(u.dtype),
            new_master,
            params,
            updates,
        )
        return emitted, _MasterWeightsState(master=new_master, inner=inner_state)

    return optax.GradientTransformation(init_fn, update_fn)


class _ClipCheckState(struct.PyTreeNode):
    notfinite_count: Any
    total_notfinite: Any
    inner: Any


def clip_and_skip_nonfinite(
    max_norm: Optional[float],
    inner: optax.GradientTransformation,
    max_consecutive_errors: int = 10,
) -> optax.GradientTransformation:
    """Global-norm clip + non-finite-step containment in ONE gradient sweep.

    ``optax.chain(clip_by_global_norm, ...)`` inside
    ``optax.apply_if_finite`` reads the full gradient tree twice before the
    optimizer even starts: once for the norm, once for the tree-wide
    isfinite check.  But the second read is redundant — the fp32 global
    norm is finite iff every leaf is finite (inf/nan propagate through the
    squared sum; a squared-sum OVERFLOW on astronomically large finite
    grads also reads as non-finite, which is the safe direction: such a
    step is diverged and should be skipped anyway).  Measured in-step at
    the flagship config (B=64): 17.8 ms for the chained form
    (docs/PROFILE_FLAGSHIP_R3.md) — this fused form removes one full-tree
    read and one cond boundary from that budget.

    Semantics mirror ``apply_if_finite`` (non-finite: zero updates, inner
    state untouched, consecutive-error count incremented; after
    ``max_consecutive_errors`` consecutive bad steps the updates are
    poisoned with NaN so training fails loudly) with the clip folded in.
    ``max_norm=None`` keeps the containment but never rescales.
    """

    def init_fn(params):
        return _ClipCheckState(
            notfinite_count=jnp.zeros([], jnp.int32),
            total_notfinite=jnp.zeros([], jnp.int32),
            inner=inner.init(params),
        )

    def update_fn(updates, state, params=None):
        sq = sum(
            jnp.sum(jnp.square(u.astype(jnp.float32)))
            for u in jax.tree_util.tree_leaves(updates)
        )
        g_norm = jnp.sqrt(sq)
        isfin = jnp.isfinite(g_norm)
        if max_norm is not None:
            scale = jnp.minimum(max_norm / jnp.maximum(g_norm, 1e-16), 1.0)
        else:
            scale = jnp.float32(1.0)
        # non-finite: zero the updates entering the inner transform so every
        # intermediate it computes stays finite (its outputs are discarded
        # by the selects below regardless — the per-element where, unlike
        # `u * 0`, maps inf/nan gradients to true zeros)
        clipped = jax.tree_util.tree_map(
            lambda u: jnp.where(
                isfin, u.astype(jnp.float32) * scale, 0.0
            ).astype(u.dtype),
            updates,
        )

        # Branchless skip: run the inner transform unconditionally and
        # select between its results and the untouched state per leaf.  A
        # ``lax.cond`` here is a fusion boundary — XLA must materialize the
        # full clipped gradient tree to HBM as the branch operand and the
        # inner transform re-reads it (~2 full sweeps of a 357 M-param tree
        # at the flagship config).  With elementwise selects the
        # scalar-broadcast clip multiply fuses into the optimizer's own
        # gradient read and the selects fuse into its state writes; the
        # non-finite path costs one wasted (rare) update computation.
        new_updates, new_inner = inner.update(clipped, state.inner, params)
        new_updates = jax.tree_util.tree_map(
            lambda u: jnp.where(isfin, u, jnp.zeros_like(u)), new_updates
        )
        new_inner = jax.tree_util.tree_map(
            lambda n, o: jnp.where(isfin, n, o) if hasattr(n, "dtype") else n,
            new_inner,
            state.inner,
        )
        notfin = jnp.where(isfin, 0, state.notfinite_count + 1)
        # poison after the limit: a persistent non-finite stream must fail
        # loudly, not silently freeze training (apply_if_finite parity)
        poisoned = notfin > max_consecutive_errors
        new_updates = jax.tree_util.tree_map(
            lambda u: jnp.where(poisoned, jnp.nan, u.astype(jnp.float32)).astype(
                u.dtype
            ),
            new_updates,
        )
        return new_updates, _ClipCheckState(
            notfinite_count=notfin,
            total_notfinite=state.total_notfinite + jnp.where(isfin, 0, 1),
            inner=new_inner,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def clip_by_global_norm_f32(max_norm: float) -> optax.GradientTransformation:
    """optax.clip_by_global_norm with the norm accumulated in fp32.

    Needed once any gradient leaf is bf16 (stock ``optax.global_norm``
    reduces in the leaf dtype — a 269 M-element bf16 sum is garbage);
    identical semantics for all-fp32 trees.
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        sq = sum(
            jnp.sum(jnp.square(u.astype(jnp.float32)))
            for u in jax.tree_util.tree_leaves(updates)
        )
        g_norm = jnp.sqrt(sq)
        trigger = jnp.minimum(max_norm / jnp.maximum(g_norm, 1e-16), 1.0)
        updates = jax.tree_util.tree_map(
            lambda u: (u.astype(jnp.float32) * trigger).astype(u.dtype), updates
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def create_learning_rate_schedule(
    config: Dict[str, Any], steps_per_epoch: int
) -> optax.Schedule:
    """Warmup-cosine from the config's training.{optimizer,scheduler} keys.

    warmup: linear warmup_lr -> lr over warmup_epochs;
    then cosine decay lr -> min_lr over the remaining epochs.
    """
    tcfg = config.get("training", {})
    opt = tcfg.get("optimizer", {})
    sched = tcfg.get("scheduler", {})
    lr = float(opt.get("lr", 3e-4))
    epochs = int(tcfg.get("epochs", 100))
    warmup_epochs = int(sched.get("warmup_epochs", 0))
    warmup_lr = float(sched.get("warmup_lr", 1e-6))
    min_lr = float(sched.get("min_lr", 1e-6))
    name = sched.get("name", "cosine")

    # With gradient accumulation the inner optimizer (under
    # optax.MultiSteps) advances its count once per UPDATE, i.e. once per
    # ``accumulation_steps`` micro-batches — build the schedule on the
    # update clock or warmup/decay horizons stretch by that factor.
    accum = max(int(tcfg.get("accumulation_steps", 1)), 1)
    # global floor, not per-epoch ceil: MultiSteps carries its micro-step
    # counter ACROSS epochs, so total updates = floor(total_micro / k)
    warmup_steps = warmup_epochs * steps_per_epoch // accum
    total_steps = max(epochs * steps_per_epoch // accum, warmup_steps + 1, 1)

    if name == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=warmup_lr if warmup_steps > 0 else lr,
            peak_value=lr,
            warmup_steps=warmup_steps,
            decay_steps=total_steps,
            end_value=min_lr,
        )
    if name == "constant":
        if warmup_steps > 0:
            return optax.join_schedules(
                [
                    optax.linear_schedule(warmup_lr, lr, warmup_steps),
                    optax.constant_schedule(lr),
                ],
                [warmup_steps],
            )
        return optax.constant_schedule(lr)
    raise ValueError(f"Unknown scheduler: {name}")


def create_optimizer(
    config: Dict[str, Any], steps_per_epoch: int
) -> optax.GradientTransformation:
    """AdamW + global-norm clip + optional gradient accumulation.

    Huge 2-D leaves (default: >=32M params — the moment head's vech
    projection is ~269M at D=1024) use a factored second moment (adafactor
    statistics) with bf16 momentum instead of dense AdamW state: the AdamW
    m/v read-modify-write on that one kernel otherwise dominates optimizer
    HBM traffic (~25% of the whole step at B=16; docs/PERFORMANCE.md).
    Disable with ``training.optimizer.factored_large_leaves: false`` for
    strict reference-AdamW semantics (docs/DIVERGENCES.md).
    """
    tcfg = config.get("training", {})
    opt = tcfg.get("optimizer", {})
    betas = opt.get("betas", [0.9, 0.999])
    schedule = create_learning_rate_schedule(config, steps_per_epoch)

    adamw = optax.adamw(
        learning_rate=schedule,
        b1=float(betas[0]),
        b2=float(betas[1]),
        eps=float(opt.get("eps", 1e-8)),
        weight_decay=float(opt.get("weight_decay", 0.05)),
    )
    factored_threshold = int(opt.get("factored_threshold", 32_000_000))
    factored_on = bool(opt.get("factored_large_leaves", True))
    # AdamW-shaped chain with a factored second moment: rms-rescale ->
    # bf16 momentum -> DECOUPLED weight decay -> lr scale.  (Stock
    # optax.adafactor applies weight_decay_rate AFTER the lr scaling,
    # i.e. an lr-independent 5%/step shrink — not AdamW semantics.)
    # NOTE on decay semantics: scale_by_factored_rms's ``decay_rate`` is
    # the EXPONENT of adafactor's time-dependent schedule
    # 1 - t**(-decay_rate), NOT a constant beta2 — the factored leaf's
    # second moment adapts faster early in training than dense AdamW's
    # 0.999 (intended: adafactor statistics; recorded in
    # docs/DIVERGENCES.md).
    factored = optax.chain(
        optax.scale_by_factored_rms(
            factored=True,
            decay_rate=float(betas[1]),
            epsilon=float(opt.get("eps", 1e-8)) ** 2,
        ),
        optax.ema(
            float(betas[0]), debias=False, accumulator_dtype=jnp.bfloat16
        ),
        optax.add_decayed_weights(float(opt.get("weight_decay", 0.05))),
        optax.scale_by_learning_rate(schedule),
    )

    def label(params):
        # bf16-stored parameters (model.moment.bf16_params) get an fp32
        # master wrapped around their size-class transform
        def one(p):
            big = factored_on and p.ndim == 2 and p.size >= factored_threshold
            base = "factored" if big else "dense"
            if p.dtype == jnp.bfloat16:
                return base + "_master"
            return base

        return jax.tree_util.tree_map(one, params)

    inner = optax.multi_transform(
        {
            "dense": adamw,
            "factored": factored,
            "dense_master": master_weights(adamw),
            "factored_master": master_weights(factored),
        },
        label,
    )

    grad_clip = float(tcfg.get("grad_clip", 1.0))
    skip_nonfinite = bool(tcfg.get("skip_nonfinite_updates", True))
    max_bad = int(tcfg.get("max_nonfinite_steps", 10))
    # failure containment: skip non-finite updates instead of corrupting the
    # train state (the reference has no failure detection at all —
    # SURVEY.md §5); poison after ``max_nonfinite_steps`` bad steps.  The
    # clip and the finite check share one gradient sweep
    # (clip_and_skip_nonfinite); grad_clip <= 0 disables rescaling.
    if skip_nonfinite:
        tx = clip_and_skip_nonfinite(
            grad_clip if grad_clip > 0 else None, inner, max_bad
        )
    elif grad_clip > 0:
        tx = optax.chain(clip_by_global_norm_f32(grad_clip), inner)
    else:
        tx = inner
    accum = int(tcfg.get("accumulation_steps", 1))
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def create_train_state(
    model,
    variables: Dict[str, Any],
    config: Dict[str, Any],
    steps_per_epoch: int,
) -> EMCTrainState:
    tx = create_optimizer(config, steps_per_epoch)

    # jit the whole state construction: eager tx.init dispatches one tiny
    # zeros_like/cast op PER PARAM LEAF, which on a remote-dispatch TPU path
    # (axon tunnel) costs an RTT each — hundreds of round trips.  As one
    # compiled program it is a single dispatch (and persists in the
    # compilation cache).  Values are identical either way.  The variables
    # are DONATED so unchanged leaves alias through instead of doubling the
    # params in HBM (a flagship-sized copy OOMed the 16G chip); callers must
    # not reuse them — none do, the init->state handoff is the universal
    # pattern (donation is a no-op on CPU).
    def _make(variables):
        return EMCTrainState.create(
            apply_fn=model.apply,
            params=variables["params"],
            tx=tx,
            batch_stats=variables.get("batch_stats"),
            constants=variables.get("constants"),
        )

    return jax.jit(_make, donate_argnums=(0,))(variables)


# ---------------------------------------------------------------------------
# Checkpointing (orbax)
# ---------------------------------------------------------------------------


def _ckpt_dir(path: str) -> Path:
    p = Path(path).resolve()
    p.mkdir(parents=True, exist_ok=True)
    return p


def save_checkpoint(
    ckpt_dir: str,
    state: EMCTrainState,
    epoch: int,
    best_val_acc: float,
    config: Dict[str, Any],
    keep: int = 5,
    best: bool = False,
) -> None:
    """Persist the full training bundle; mirrors the reference checkpoint
    contract (train.py:448-470: model/optimizer/scheduler state + epoch +
    best_val_acc + embedded config)."""
    import json

    import orbax.checkpoint as ocp

    path = _ckpt_dir(ckpt_dir)
    # arrays go through orbax; config + scalar metadata ride as JSON
    # (StandardCheckpointer rejects strings)
    arrays = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
    }
    if state.batch_stats is not None:
        arrays["batch_stats"] = jax.device_get(state.batch_stats)
    if state.constants is not None:
        arrays["constants"] = jax.device_get(state.constants)

    ckptr = ocp.StandardCheckpointer()
    name = "best_model" if best else f"checkpoint_epoch_{epoch}"
    target = path / name
    if target.exists():
        import shutil

        shutil.rmtree(target)
    ckptr.save(target, arrays)
    ckptr.wait_until_finished()
    meta = {
        "step": int(state.step),
        "epoch": int(epoch),
        "best_val_acc": float(best_val_acc),
        "config": config,
    }
    # sibling file: orbax owns the checkpoint dir's contents
    (path / f"{name}.meta.json").write_text(
        json.dumps(meta, indent=2, default=str)
    )

    if not best:
        # prune old epoch checkpoints, keep the most recent ``keep``
        epochs = sorted(
            int(p.name.rsplit("_", 1)[1])
            for p in path.glob("checkpoint_epoch_*")
            if p.name.rsplit("_", 1)[1].isdigit()
        )
        for old in epochs[:-keep]:
            import shutil

            shutil.rmtree(path / f"checkpoint_epoch_{old}", ignore_errors=True)
            (path / f"checkpoint_epoch_{old}.meta.json").unlink(missing_ok=True)


def latest_checkpoint_step(ckpt_dir: str) -> Optional[int]:
    path = Path(ckpt_dir)
    if not path.exists():
        return None
    epochs = [
        int(p.name.rsplit("_", 1)[1])
        for p in path.glob("checkpoint_epoch_*")
        if p.name.rsplit("_", 1)[1].isdigit()
    ]
    return max(epochs) if epochs else None


def restore_checkpoint(ckpt_path: str, target: Any = None) -> Dict[str, Any]:
    """Load a checkpoint bundle saved by :func:`save_checkpoint`.

    ``target`` (optional) is an abstract PyTree with the same structure as
    the saved arrays — REQUIRED to restore ``opt_state`` into its optax
    NamedTuple containers (orbax alone restores plain dicts).  Without it,
    params/constants still come back fine (plain dict trees).

    Returns a flat dict with params/opt_state/batch_stats/constants plus the
    JSON metadata (step/epoch/best_val_acc/config)."""
    import json

    import orbax.checkpoint as ocp

    path = Path(ckpt_path).resolve()
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape")
            else x,
            target,
        )
        bundle = dict(ckptr.restore(path, abstract))
    else:
        bundle = dict(ckptr.restore(path))
    meta_file = path.parent / f"{path.name}.meta.json"
    if meta_file.exists():
        bundle.update(json.loads(meta_file.read_text()))
    bundle.setdefault("batch_stats", None)
    bundle.setdefault("constants", None)
    return bundle
