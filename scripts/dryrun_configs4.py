#!/usr/bin/env python
"""BASELINE.json configs[4] dryrun: ViT-L/16 at 448px, MultiScaleClassifier
head, data-parallel over an 8-device mesh — one full train step (on-device
dual-view augmentation + dual-stream forward + 5-term loss + backward +
AdamW), with the 224->448 pos-embed interpolation splice exercised.

Runs on a virtual CPU mesh (no multi-chip hardware here); takes ~10-15 min,
dominated by XLA CPU compile of the 307M-param model.  The committed log
`outputs/dryrun_configs4.log` is the configs[4] artifact; the in-suite
equivalent at ViT-Tiny scale is tests/test_configs4.py.

Usage: python scripts/dryrun_configs4.py
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    t00 = time.time()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import jax.numpy as jnp
    import numpy as np

    from ego_moment_cle_vit_tpu.data import (
        AugmentConfig,
        dual_view_train_batch,
        shard_batch,
    )
    from ego_moment_cle_vit_tpu.models import create_model
    from ego_moment_cle_vit_tpu.parallel import create_mesh, shard_params
    from ego_moment_cle_vit_tpu.train.state import create_train_state
    from ego_moment_cle_vit_tpu.utils.port_weights import (
        splice_backbone_params,
    )

    config = {
        "model": {
            "backbone_name": "vit_large_patch16_224",
            "norm": "layer",
            "gpf": {"degree_p": 2, "degree_q": 2, "similarity": "cosine"},
            "moment": {
                "d_out": 128,
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
        "data": {"input_size": 448, "resize_size": 512},
    }
    model = create_model(config, num_classes=10)
    mesh = create_mesh(data=8, model=1)
    aug = AugmentConfig(input_size=448, resize_size=512)
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}", flush=True)

    t0 = time.time()
    dummy = jnp.zeros((2, 448, 448, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), dummy, dummy, jnp.zeros((2,), jnp.int32)
    )
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(variables["params"])
    )
    print(f"init: {time.time() - t0:.1f}s params={n_params / 1e6:.1f}M", flush=True)

    # 224->448 pos-embed interpolation splice: a 224-res init acts as the
    # "pretrained checkpoint" (no egress for real timm weights here)
    t0 = time.time()
    cfg224 = {**config, "data": {"input_size": 224, "resize_size": 256}}
    model224 = create_model(cfg224, num_classes=10)
    d224 = jnp.zeros((1, 224, 224, 3), jnp.float32)
    v224 = model224.init(
        jax.random.PRNGKey(1), d224, d224, jnp.zeros((1,), jnp.int32)
    )
    bb = jax.tree_util.tree_map(
        np.asarray, v224["params"]["backbone"]["backbone"]["vit"]
    )
    assert bb["pos_embed"].shape[1] == 197
    spliced = splice_backbone_params(variables["params"], bb, "vit")
    assert spliced["backbone"]["backbone"]["vit"]["pos_embed"].shape[1] == 785
    variables = {**variables, "params": spliced}
    print(f"splice 197->785 pos embed: {time.time() - t0:.1f}s", flush=True)

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
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return state.apply_gradients(grads=grads), loss, acc

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (8, 512, 512, 3), dtype=np.uint8)
    labels = rng.integers(0, 10, (8,)).astype(np.int32)
    step = jax.jit(train_step, donate_argnums=(0,))
    with mesh:
        batch = shard_batch((imgs, labels), mesh)
        t0 = time.time()
        state, loss, acc = step(state, batch[0], batch[1], jax.random.PRNGKey(2))
        loss1 = float(loss)
        print(f"compile+step1: {time.time() - t0:.1f}s loss={loss1:.4f}", flush=True)
        # NOTE: one step only — XLA:CPU in-process collectives are flaky
        # under back-to-back dispatch at this model size (rendezvous
        # timeout); one full compiled step proves the composition.
    assert np.isfinite(loss1)
    print(
        f"dryrun_configs4 OK: vit_large_patch16_224 @448 multiscale dp8 "
        f"({time.time() - t00:.0f}s total)",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
