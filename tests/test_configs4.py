"""BASELINE.json configs[4] composition: ViT @ 448 with pos-embed
interpolation + MultiScaleClassifierHead + data-parallel over the 8-device
mesh, one full train step.

The full-size variant (vit_large_patch16_224) is too slow to compile in the
CPU test suite (~5 min XLA compile); `scripts/dryrun_configs4.py` runs it
verbatim and its committed log is the configs[4] artifact.  This test runs
the SAME composition — 448 input via the interpolate_pos_embed splice path,
classifier.type='multiscale', dp=8 mesh, full loss + backward + update — on
the ViT-Tiny config at 320px (196 -> 400-patch interpolation, the same
splice path as 448) so it stays in the suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ego_moment_cle_vit_tpu.data import (
    AugmentConfig,
    dual_view_train_batch,
    shard_batch,
)
from ego_moment_cle_vit_tpu.models import create_model
from ego_moment_cle_vit_tpu.parallel import create_mesh, shard_params
from ego_moment_cle_vit_tpu.train.state import create_train_state


def _config(backbone="vit_tiny_patch16_224"):
    return {
        "model": {
            "backbone_name": backbone,
            "norm": "layer",
            "gpf": {"degree_p": 2, "degree_q": 2, "similarity": "cosine"},
            "moment": {
                "d_out": 64,
                "use_third_order": False,
                "isqrt_iterations": 3,
            },
            "classifier": {"type": "multiscale"},
        },
        "training": {
            "batch_size": 8,
            "optimizer": {"lr": 1e-3},
            "scheduler": {"warmup_epochs": 0},
            "loss": {"lambda_triplet": 0.6, "lambda_align": 0.1, "margin": 0.3},
            "epochs": 1,
        },
        "data": {"input_size": 320, "resize_size": 384},
    }


def test_configs4_interp_multiscale_dp(rng):
    config = _config()
    model = create_model(config, num_classes=10)
    mesh = create_mesh(data=8, model=1)
    aug = AugmentConfig(input_size=320, resize_size=384)

    dummy = jnp.zeros((2, 320, 320, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), dummy, dummy, jnp.zeros((2,), jnp.int32)
    )
    params_448 = variables["params"]

    # --- 448 pos-embed interpolation splice (utils/port_weights.py:134-208):
    # treat a 224-resolution init as the "pretrained checkpoint" and splice
    # its backbone (196-patch pos embed) into the 784-patch model.
    config_224 = _config()
    config_224["data"] = {"input_size": 224, "resize_size": 256}
    model_224 = create_model(config_224, num_classes=10)
    d224 = jnp.zeros((2, 224, 224, 3), jnp.float32)
    vars_224 = model_224.init(
        jax.random.PRNGKey(1), d224, d224, jnp.zeros((2,), jnp.int32)
    )
    from ego_moment_cle_vit_tpu.utils.port_weights import splice_backbone_params

    ckpt_backbone = jax.tree_util.tree_map(
        np.asarray, vars_224["params"]["backbone"]["backbone"]["vit"]
    )
    assert ckpt_backbone["pos_embed"].shape[1] == 197
    spliced = splice_backbone_params(params_448, ckpt_backbone, "vit")
    assert spliced["backbone"]["backbone"]["vit"]["pos_embed"].shape[1] == 401
    variables = {**variables, "params": spliced}

    # --- one data-parallel train step over the 8-device mesh ---
    state = create_train_state(model, variables, config, steps_per_epoch=10)
    state = state.replace(params=shard_params(state.params, mesh))

    def train_step(state, images_u8, labels, key):
        aug_key, dk = jax.random.split(jax.random.fold_in(key, state.step))
        anchor, positive = dual_view_train_batch(images_u8, aug_key, aug)

        def loss_fn(params):
            vs = {"params": params}
            if state.constants is not None:
                vs["constants"] = state.constants
            out = model.apply(
                vs,
                anchor,
                positive,
                labels,
                deterministic=False,
                rngs={"dropout": dk},
            )
            return out["loss"], out["logits"]

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return state.apply_gradients(grads=grads), loss, logits

    imgs = rng.integers(0, 256, (8, 384, 384, 3)).astype(np.uint8)
    labels = rng.integers(0, 10, (8,)).astype(np.int32)
    step = jax.jit(train_step, donate_argnums=(0,))
    with mesh:
        batch = shard_batch((imgs, labels), mesh)
        state, loss, logits = step(
            state, batch[0], batch[1], jax.random.PRNGKey(2)
        )
    assert np.isfinite(float(loss))
    assert logits.shape == (8, 10)
    # multiscale head actually in the graph: its per-scale outputs exist
    assert "scale_out_0" in jax.tree_util.tree_map(
        lambda x: x, state.params
    )["classifier"]
