"""Jitted-program factories for the benchmark harness.

These live INSIDE the package (not in bench.py) for a measured reason:
the persistent-compile-cache key covers the Mosaic/Pallas custom-call
payloads, which embed the defining function's module identity and source
path — metadata the outer ``strip-debuginfo`` canonicalization cannot
reach.  A ``train_step`` closure defined in bench.py therefore produced a
DIFFERENT cache key per invocation mode (``python bench.py`` vs
``python /abs/path/bench.py`` vs ``import bench`` vs runpy: four stable
but distinct keys, measured 2026-08-20), so a prewarmed cache could miss
for the driver's run.  Functions defined here trace with the canonical
package path regardless of how the caller was launched — one program,
one key.  (``jax.jit(model.init)`` never had the problem: flax code is
already package-resident.)

The TRAINING program built here is the bench's contract: the same
dual-view augment chain, loss, and optimizer update the Trainer runs
(train/trainer.py), with the state donated so the step is in-place on
device.  Reference loss semantics: /root/reference/src/models/
ego_moment_clevit.py:333-377 (5-term loss dict; we return the scalar).
"""

from __future__ import annotations

import jax


def make_train_step(model, aug_cfg):
    """One full flagship train step: on-device dual-view augmentation,
    forward, 5-term loss, backward, optimizer update.  Donates the state.
    """
    from ego_moment_cle_vit_tpu.data import dual_view_train_batch

    def train_step(state, images_u8, labels, key):
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

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    return jax.jit(train_step, donate_argnums=(0,))


def make_infer_fn(model, aug_cfg):
    """Single-pass serving program (one backbone pass + one Gram; the
    reference duplicates the image through a dual pass,
    ego_moment_clevit.py:318-331).

    ``variables`` MUST be a jit argument, not a closure: closed-over
    params are lowered as HLO literals — ~3 GB of program text for the
    88M-param flagship (measured 2026-08-19), which the axon
    remote-compile service must ingest per cold compile.  As an argument
    the program is ~4 M chars.
    """
    from ego_moment_cle_vit_tpu.data import dual_view_eval_batch

    @jax.jit
    def infer(variables, images_u8):
        anchor, _ = dual_view_eval_batch(images_u8, aug_cfg)
        return model.apply(variables, anchor, method=model.inference)

    return infer
