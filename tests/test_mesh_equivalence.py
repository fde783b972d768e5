"""Full-step mesh-vs-single-device numerical equivalence (VERDICT r4 item 4).

Kernel-level shard_map parity is covered by tests/test_shard_map_kernels.py
and the dryrun runs one sharded step — this closes the remaining layer: the
SAME batch, params, and RNG key must produce the same loss and gradients on
a 1-device mesh and on the full 8-device CPU mesh, for pure data-parallel
(8x1) and dp x tp (4x2) layouts.  This is the actual multi-chip correctness
contract (the reference names cross-device batch semantics as its open
question, /root/reference/docs/spec.md:199-202; its only multi-device path
is nn.DataParallel, train.py:297-299).

The 1-device run takes the pure-XLA kernel path (the SPMD gates require a
>1 data axis); the 8-device runs force interpret-mode Pallas kernels via
shard_map (EMCT_KERNEL_SPMD=force).  Passing therefore certifies the
composition end to end: sharded kernels + GSPMD partitioning + psum'd
gradient collectives reproduce the single-device program, not just each
kernel in isolation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ego_moment_cle_vit_tpu.data import (
    AugmentConfig,
    dual_view_train_batch,
    shard_batch,
)
from ego_moment_cle_vit_tpu.models import create_model
from ego_moment_cle_vit_tpu.parallel import (
    create_mesh,
    shard_params,
    shard_kernels as sk,
)
from ego_moment_cle_vit_tpu.train.state import create_train_state

B, SIZE, RESIZE, NUM_CLASSES = 8, 64, 80, 4


def _config():
    return {
        "model": {
            "backbone_name": "vit_tiny_patch16_224",
            "norm": "layer",
            "bf16": False,
            "gpf": {"degree_p": 2, "degree_q": 2, "similarity": "cosine"},
            "moment": {
                "d_out": 64,
                "use_third_order": True,
                "isqrt_iterations": 3,
                "sketch_dim": 256,
            },
            "classifier": {"fusion_type": "concat", "hidden_dim": 32},
        },
        "training": {
            "batch_size": B,
            "optimizer": {"lr": 1e-3},
            "scheduler": {"warmup_epochs": 0},
            "loss": {"lambda_triplet": 0.6, "lambda_align": 0.1, "margin": 0.3},
            "epochs": 1,
        },
        "data": {"input_size": SIZE, "resize_size": RESIZE},
    }


def _run_one_step(data_axis: int, model_axis: int, monkeypatch):
    """One full train step (aug + fwd + loss + grads) on a data x model mesh.

    Returns (loss, grads) fetched to host.  Params/batch/keys are bit-
    identical across calls: model init and jax.random streams are counter-
    based and sharding-independent.
    """
    n = data_axis * model_axis
    mesh = create_mesh(
        data=data_axis, model=model_axis, devices=jax.devices()[:n]
    )
    monkeypatch.setenv("EMCT_KERNEL_SPMD", "force")
    sk.set_kernel_mesh(mesh)
    try:
        config = _config()
        model = create_model(config, num_classes=NUM_CLASSES)
        aug_cfg = AugmentConfig(input_size=SIZE, resize_size=RESIZE)

        dummy = jnp.zeros((2, SIZE, SIZE, 3), jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0), dummy, dummy, jnp.zeros((2,), jnp.int32)
        )
        state = create_train_state(model, variables, config, steps_per_epoch=10)
        state = state.replace(params=shard_params(state.params, mesh))

        rng = np.random.default_rng(7)
        images_u8 = rng.integers(0, 256, (B, RESIZE, RESIZE, 3), dtype=np.uint8)
        labels = rng.integers(0, NUM_CLASSES, (B,)).astype(np.int32)

        def step(state, images_u8, labels, key):
            aug_key, dropout_key = jax.random.split(
                jax.random.fold_in(key, state.step)
            )
            anchor, positive = dual_view_train_batch(images_u8, aug_key, aug_cfg)

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
                    rngs={"dropout": dropout_key},
                )
                return out["loss"]

            return jax.value_and_grad(loss_fn)(state.params)

        with mesh:
            imgs, lbls = shard_batch((images_u8, labels), mesh)
            loss, grads = jax.jit(step)(state, imgs, lbls, jax.random.PRNGKey(3))
        return float(loss), jax.device_get(grads)
    finally:
        sk.set_kernel_mesh(None)


@pytest.fixture(scope="module")
def single_device_reference():
    """The 1x1-mesh run every multi-device layout is compared against.

    Computed once (module scope) — it is the pure-XLA single-device program,
    identical in role to a one-chip TPU run.
    """

    class _NoopPatch:  # monkeypatch is function-scoped; env var via os
        @staticmethod
        def setenv(k, v):
            import os

            os.environ[k] = v

    import os

    prev = os.environ.get("EMCT_KERNEL_SPMD")
    try:
        return _run_one_step(1, 1, _NoopPatch())
    finally:
        if prev is None:
            os.environ.pop("EMCT_KERNEL_SPMD", None)
        else:
            os.environ["EMCT_KERNEL_SPMD"] = prev


def _assert_grads_close(ref_grads, got_grads, rtol, atol):
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(ref_grads)
    flat_got = dict(jax.tree_util.tree_flatten_with_path(got_grads)[0])
    assert len(flat_ref) == len(flat_got)
    for path, ref_leaf in flat_ref:
        got_leaf = flat_got[path]
        np.testing.assert_allclose(
            np.asarray(got_leaf),
            np.asarray(ref_leaf),
            rtol=rtol,
            atol=atol,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.parametrize(
    "data_axis,model_axis", [(8, 1), (4, 2)], ids=["dp8", "dp4xtp2"]
)
def test_mesh_equivalence(
    data_axis, model_axis, monkeypatch, single_device_reference
):
    ref_loss, ref_grads = single_device_reference
    loss, grads = _run_one_step(data_axis, model_axis, monkeypatch)

    # fp32 end to end; differences = reduction order (psum vs fused sums)
    # + interpret-mode kernel vs XLA epsilon, both O(ulp)-scale
    np.testing.assert_allclose(loss, ref_loss, rtol=1e-5, atol=1e-6)
    _assert_grads_close(ref_grads, grads, rtol=5e-4, atol=1e-5)
