"""End-to-end engine tests on the 8-device virtual CPU mesh: full Trainer
loop on synthetic data, checkpoint save/resume, Evaluator with ablations,
schedule/optimizer factory."""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from ego_moment_cle_vit_tpu.utils import load_config

CFG_PATH = Path(__file__).resolve().parent.parent / "configs" / "smoke_synthetic.yaml"


@pytest.fixture
def smoke_config(tmp_path):
    cfg = load_config(str(CFG_PATH))
    cfg["experiment"]["output_dir"] = str(tmp_path / "outputs")
    cfg["experiment"]["save_dir"] = str(tmp_path / "ckpts")
    cfg["experiment"]["log_dir"] = str(tmp_path / "logs")
    return cfg


def test_schedule_factory_warmup_and_decay(smoke_config):
    from ego_moment_cle_vit_tpu.train import create_learning_rate_schedule

    sched = create_learning_rate_schedule(smoke_config, steps_per_epoch=10)
    lr0 = float(sched(0))
    lr_peak = float(sched(10))  # after 1 warmup epoch
    lr_end = float(sched(20))
    assert lr0 == pytest.approx(1e-6, rel=0.2)
    assert lr_peak == pytest.approx(1e-3, rel=0.05)
    assert lr_end < lr_peak


def test_trainer_full_loop_and_resume(smoke_config, tmp_path):
    from ego_moment_cle_vit_tpu.train import Trainer

    trainer = Trainer(smoke_config)
    trainer.setup_data()
    trainer.setup_model()
    results = trainer.train()

    hist = results["history"]
    assert len(hist["train_loss"]) == 2
    assert len(hist["val_acc"]) == 2
    assert all(np.isfinite(v) for v in hist["train_loss"])

    # checkpoints exist (per-epoch cadence 1 + best)
    ckpts = list(Path(smoke_config["experiment"]["save_dir"]).iterdir())
    names = {p.name for p in ckpts}
    assert any(n.startswith("checkpoint_epoch_") for n in names)

    # resume from the last epoch checkpoint and continue one more epoch
    last = sorted(
        [
            n
            for n in names
            if n.startswith("checkpoint_epoch_") and n.rsplit("_", 1)[1].isdigit()
        ],
        key=lambda n: int(n.rsplit("_", 1)[1]),
    )[-1]
    smoke_config["training"]["epochs"] = 3
    trainer2 = Trainer(smoke_config)
    trainer2.setup_data()
    trainer2.setup_model()
    trainer2.resume(str(Path(smoke_config["experiment"]["save_dir"]) / last))
    assert trainer2.start_epoch == 2
    results2 = trainer2.train()
    assert len(results2["history"]["train_loss"]) == 1  # epochs 2..3
    # lr history populated per epoch (reference logs lr, train.py:509-517)
    assert len(results2["history"]["lr"]) == 1
    assert results2["history"]["lr"][0] > 0

    # training curves artifact written
    assert (Path(smoke_config["experiment"]["output_dir"]) / "training_curves.png").exists()


def test_evaluator_end_to_end(smoke_config, tmp_path):
    from ego_moment_cle_vit_tpu.train import Evaluator

    smoke_config["evaluation"] = {
        "tta": {"enabled": True, "scales": [0.9, 1.0]},
        "save_predictions": True,
        "save_features": True,
    }
    evaluator = Evaluator(smoke_config, checkpoint_path=None)
    out = evaluator.evaluate(visualize=True, ablation=True)
    m = out["metrics"]
    assert 0.0 <= m["top1_accuracy"] <= 1.0
    assert m["top5_accuracy"] >= m["top1_accuracy"]
    assert "mean_per_class_recall" in m
    assert "tta_top1_accuracy" in m  # evaluation.tta actually runs here
    assert set(out["ablations"]) == {"no_gpf", "uniform_graph", "cls_only"}
    eval_dir = Path(smoke_config["experiment"]["output_dir"]) / "evaluation"
    assert (eval_dir / "results.json").exists()
    assert (eval_dir / "predictions.npz").exists()
    assert (eval_dir / "features.npz").exists()
    # eval viz parity (reference eval.py:334): graph-weight 4-panel +
    # moment-feature analysis must actually render
    assert (eval_dir / "graph_weights.png").exists()
    assert (eval_dir / "moment_analysis.png").exists()
    payload = json.loads((eval_dir / "results.json").read_text())
    assert "metrics" in payload and "ablations" in payload


def test_multichip_mesh_sharding(smoke_config):
    """Params shard over the ('data','model') mesh; one step executes with a
    model-sharded moment projection on the 8-device CPU mesh."""
    import jax

    assert len(jax.devices()) == 8
    smoke_config["experiment"]["mesh"] = {"data": 4, "model": 2}
    from ego_moment_cle_vit_tpu.train import Trainer

    trainer = Trainer(smoke_config)
    trainer.setup_data()
    trainer.setup_model()
    metrics = trainer.train_epoch(0)
    assert np.isfinite(metrics["loss"])

    # the big half-vec projection must actually be sharded over 'model'
    kernel = trainer.state.params["moment_head"]["second_proj"]["kernel"]
    spec = kernel.sharding.spec
    assert spec[0] == "model", spec


def test_lr_schedule_runs_on_update_clock_under_accumulation():
    """With optax.MultiSteps the inner optimizer advances once per UPDATE
    (= accumulation_steps micro-batches), and its counter carries across
    epochs — the schedule horizon must be floor(total_micro / k)."""
    from ego_moment_cle_vit_tpu.train.state import (
        create_learning_rate_schedule,
    )

    cfg = {
        "training": {
            "optimizer": {"lr": 1e-3},
            "scheduler": {
                "name": "cosine",
                "warmup_epochs": 2,
                "warmup_lr": 1e-6,
                "min_lr": 1e-6,
            },
            "epochs": 10,
            "accumulation_steps": 4,
        }
    }
    steps_per_epoch = 10
    sched = create_learning_rate_schedule(cfg, steps_per_epoch)
    total_updates = 10 * steps_per_epoch // 4  # 25
    warmup_updates = 2 * steps_per_epoch // 4  # 5
    # peak reached exactly at the end of warmup (on the update clock)
    assert abs(float(sched(warmup_updates)) - 1e-3) < 1e-9
    # decayed to min_lr by the true number of optimizer updates — with the
    # old micro-step horizon (100) this would still be mid-cosine
    assert float(sched(total_updates)) < 2e-6


def test_master_weights_accumulates_below_bf16_resolution():
    """bf16 storage alone loses updates smaller than the parameter's ulp
    (~0.0078 at 1.0); the fp32 master must accumulate them and the bf16
    param must track bf16(master) bit-exactly."""
    import jax
    import jax.numpy as jnp
    import optax

    from ego_moment_cle_vit_tpu.train.state import master_weights

    tx = master_weights(optax.sgd(1.0))
    params = {"w": jnp.ones((4,), jnp.bfloat16)}
    state = tx.init(params)
    grad = {"w": jnp.full((4,), 1e-4, jnp.bfloat16)}
    for _ in range(100):
        updates, state = tx.update(grad, state, params)
        params = optax.apply_updates(params, updates)
    # master: 1.0 - 100 * 1e-4 = 0.99 (fp32); param == bf16(master)
    master = state.master["w"]
    np.testing.assert_allclose(np.asarray(master), 0.99, rtol=1e-3)
    assert params["w"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(params["w"]), np.asarray(master.astype(jnp.bfloat16))
    )
    # control: plain bf16 SGD loses every one of these updates
    p = jnp.ones((4,), jnp.bfloat16)
    p2 = optax.apply_updates(p, jnp.full((4,), -1e-4, jnp.bfloat16))
    assert float(p2[0]) == 1.0  # 1.0 + (-1e-4) rounds back to 1.0 in bf16


def test_clip_by_global_norm_f32_matches_optax_on_fp32():
    import jax
    import jax.numpy as jnp
    import optax

    from ego_moment_cle_vit_tpu.train.state import clip_by_global_norm_f32

    rng = np.random.default_rng(0)
    tree = {
        "a": jnp.asarray(rng.standard_normal((7, 5)).astype(np.float32)),
        "b": jnp.asarray(rng.standard_normal((11,)).astype(np.float32) * 3),
    }
    ours = clip_by_global_norm_f32(0.5)
    ref = optax.clip_by_global_norm(0.5)
    got, _ = ours.update(tree, ours.init(tree))
    want, _ = ref.update(tree, ref.init(tree))
    for k in tree:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-6
        )


def test_bf16_param_storage_trains_end_to_end():
    """model.moment.bf16_params stores the vech projection in bf16; the
    optimizer must label it *_master, keep an fp32 master, and the full
    train step must stay finite and actually move the projection."""
    import jax
    import jax.numpy as jnp

    from ego_moment_cle_vit_tpu.data import AugmentConfig, dual_view_train_batch
    from ego_moment_cle_vit_tpu.models import create_model
    from ego_moment_cle_vit_tpu.train.state import create_train_state

    config = {
        "model": {
            "backbone_name": "vit_tiny_patch16_224",
            "norm": "layer",
            "bf16": False,
            "gpf": {"degree_p": 1, "degree_q": 1},
            "moment": {
                "d_out": 64,
                "use_third_order": False,
                "isqrt_iterations": 2,
                "sketch_dim": 128,
                "bf16_params": True,
            },
            "classifier": {"fusion_type": "concat", "hidden_dim": 32},
        },
        "training": {
            "batch_size": 4,
            "optimizer": {"lr": 1e-2, "factored_threshold": 1000},
            "scheduler": {"warmup_epochs": 0},
            "loss": {"lambda_triplet": 0.6, "lambda_align": 0.1, "margin": 0.3},
            "epochs": 1,
        },
        "data": {"input_size": 64, "resize_size": 80},
    }
    model = create_model(config, num_classes=4)
    aug_cfg = AugmentConfig(input_size=64, resize_size=80)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (4, 80, 80, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 4, (4,)), jnp.int32)
    dummy = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), dummy, dummy, jnp.zeros((2,), jnp.int32)
    )
    proj = variables["params"]["moment_head"]["second_proj"]["kernel"]
    assert proj.dtype == jnp.bfloat16
    state = create_train_state(model, variables, config, steps_per_epoch=10)

    def train_step(state, images_u8, labels, key):
        aug_key, dk = jax.random.split(jax.random.fold_in(key, state.step))
        anchor, positive = dual_view_train_batch(images_u8, aug_key, aug_cfg)

        def loss_fn(params):
            vs = {"params": params}
            if state.constants is not None:
                vs["constants"] = state.constants
            out = model.apply(
                vs, anchor, positive, labels,
                deterministic=False, rngs={"dropout": dk},
            )
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    step = jax.jit(train_step)
    before = np.asarray(
        state.params["moment_head"]["second_proj"]["kernel"], np.float32
    )
    for i in range(3):
        state, loss = step(state, images, labels, jax.random.PRNGKey(i))
    assert np.isfinite(float(loss)), float(loss)
    after_p = state.params["moment_head"]["second_proj"]["kernel"]
    assert after_p.dtype == jnp.bfloat16
    assert not np.allclose(np.asarray(after_p, np.float32), before)


def test_clip_and_skip_nonfinite_matches_chained_form():
    """The fused clip+finite-check transform must be step-for-step
    equivalent to chain(clip_by_global_norm, inner) inside apply_if_finite:
    identical updates on finite grads, zero updates + untouched inner state
    on non-finite grads, NaN poisoning after the consecutive limit."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ego_moment_cle_vit_tpu.train.state import (
        clip_and_skip_nonfinite,
        clip_by_global_norm_f32,
    )

    params = {
        "a": jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)), jnp.float32),
        "b": jnp.asarray(np.random.default_rng(1).normal(size=(16,)), jnp.float32),
    }
    inner = optax.adam(1e-2)

    fused = clip_and_skip_nonfinite(0.5, inner, max_consecutive_errors=2)
    chained = optax.apply_if_finite(
        optax.chain(clip_by_global_norm_f32(0.5), inner),
        max_consecutive_errors=2,
    )
    sf = fused.init(params)
    sc = chained.init(params)

    rng = np.random.default_rng(7)
    for i in range(4):
        # big grads on step 1 so the clip actually triggers
        mag = 10.0 if i == 1 else 0.1
        g = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.normal(size=p.shape) * mag, jnp.float32),
            params,
        )
        uf, sf = fused.update(g, sf, params)
        uc, sc = chained.update(g, sc, params)
        for a, b in zip(
            jax.tree_util.tree_leaves(uf), jax.tree_util.tree_leaves(uc)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # non-finite grads: zero updates, inner state untouched
    bad = jax.tree_util.tree_map(lambda p: jnp.full_like(p, jnp.nan), params)
    inner_before = jax.tree_util.tree_leaves(sf.inner)
    uf, sf = fused.update(bad, sf, params)
    assert all(not np.any(np.asarray(u)) for u in jax.tree_util.tree_leaves(uf))
    for a, b in zip(inner_before, jax.tree_util.tree_leaves(sf.inner)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(sf.notfinite_count) == 1 and int(sf.total_notfinite) == 1

    # a finite step resets the consecutive count
    good = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 0.01), params)
    _, sf = fused.update(good, sf, params)
    assert int(sf.notfinite_count) == 0 and int(sf.total_notfinite) == 1

    # past the limit: updates are poisoned so training fails loudly
    for _ in range(3):
        uf, sf = fused.update(bad, sf, params)
    assert all(
        np.all(np.isnan(np.asarray(u))) for u in jax.tree_util.tree_leaves(uf)
    )


def test_clip_and_skip_nonfinite_bf16_master_leaves():
    """Fused transform composes with bf16-stored leaves + master_weights:
    norm accumulates in fp32 and emitted updates keep leaf dtypes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ego_moment_cle_vit_tpu.train.state import (
        clip_and_skip_nonfinite,
        master_weights,
    )

    params = {"w": jnp.ones((64, 8), jnp.bfloat16)}
    tx = clip_and_skip_nonfinite(1.0, master_weights(optax.adam(1e-2)))
    s = tx.init(params)
    g = {"w": jnp.full((64, 8), 0.25, jnp.bfloat16)}
    u, s = tx.update(g, s, params)
    assert u["w"].dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(u["w"], np.float32)))


def test_eval_programs_do_not_embed_params_as_literals(smoke_config):
    """Program-size contract: every jitted eval/serving step takes the
    variables as an ARGUMENT.  Closing over them lowers the full param set
    as HLO dense literals — ~3 GB of program text at flagship size
    (measured 2026-08-19) — which cripples cold compiles on TPU
    remote-compile paths.  Guard: lowered text must be far smaller than a
    params-inlined program could ever be (>= ~8 chars per float)."""
    import jax
    import numpy as np

    from ego_moment_cle_vit_tpu.train import Evaluator

    evaluator = Evaluator(smoke_config, checkpoint_path=None)
    evaluator.setup_data()
    evaluator.load_model()
    n_param_floats = sum(
        int(np.prod(l.shape))
        for l in jax.tree_util.tree_leaves(evaluator.variables)
    )
    assert n_param_floats > 1e5  # the bound below is only meaningful then

    batch = np.zeros((2, 64, 64, 3), np.uint8)
    labels = np.zeros((2,), np.int32)
    step = evaluator._eval_step  # functools.partial(jitted, variables)
    txt = step.func.lower(*step.args, batch, labels).as_text()
    # params-inlined text would be >= 8 * n_param_floats chars just for the
    # literals; the arg-passing program is O(model depth), not O(params)
    assert len(txt) < 4 * n_param_floats, (
        f"eval_step HLO text {len(txt)} chars looks param-inlined "
        f"({n_param_floats} param floats)"
    )
