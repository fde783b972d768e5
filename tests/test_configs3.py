"""BASELINE.json configs[3] composition: adaptive-degree GPF + third-order
Tensor-Sketch moments, selected purely from the config dict (VERDICT r4
item 2 — the variant zoo must be reachable from the config/CLI surface the
reference exports publicly, /root/reference/src/models/__init__.py:40-63).

One full train step (forward + backward + optimizer update) per adaptive
type, plus the SimplifiedMomentHead variant (reference
moment_head_simple.py:15-164) through the same ``model.moment.variant`` key.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ego_moment_cle_vit_tpu.data import AugmentConfig, dual_view_train_batch
from ego_moment_cle_vit_tpu.models import create_model
from ego_moment_cle_vit_tpu.models.gpf import AdaptiveGraphPolynomialFusion
from ego_moment_cle_vit_tpu.train.state import create_train_state


def _config(adaptive_type=None, moment_variant="full"):
    cfg = {
        "model": {
            "backbone_name": "vit_tiny_patch16_224",
            "norm": "layer",
            "gpf": {"degree_p": 2, "degree_q": 2, "similarity": "cosine"},
            "moment": {
                "d_out": 64,
                # configs[3]: third-order moments via Tensor-Sketch
                "use_third_order": True,
                "isqrt_iterations": 3,
                "sketch_dim": 128,
                "variant": moment_variant,
            },
            "classifier": {"fusion_type": "concat"},
        },
        "training": {
            "batch_size": 4,
            "optimizer": {"lr": 1e-3},
            "scheduler": {"warmup_epochs": 0},
            "loss": {"lambda_triplet": 0.6, "lambda_align": 0.1, "margin": 0.3},
            "epochs": 1,
        },
        "data": {"input_size": 224, "resize_size": 256},
    }
    if adaptive_type is not None:
        cfg["model"]["gpf"]["adaptive_type"] = adaptive_type
    return cfg


def _one_train_step(config, rng, num_classes=6):
    model = create_model(config, num_classes=num_classes)
    aug = AugmentConfig(input_size=224, resize_size=256)
    dummy = jnp.zeros((2, 224, 224, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), dummy, dummy, jnp.zeros((2,), jnp.int32)
    )
    state = create_train_state(model, variables, config, steps_per_epoch=10)

    def train_step(state, images_u8, labels, key):
        aug_key, dk = jax.random.split(jax.random.fold_in(key, state.step))
        anchor, positive = dual_view_train_batch(images_u8, aug_key, aug)

        def loss_fn(params):
            vs = {"params": params}
            if state.constants is not None:
                vs["constants"] = state.constants
            out = model.apply(
                vs, anchor, positive, labels,
                deterministic=False, rngs={"dropout": dk},
            )
            return out["loss"], out["logits"]

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return state.apply_gradients(grads=grads), loss, logits, grads

    imgs = jnp.asarray(rng.integers(0, 256, (4, 256, 256, 3)).astype(np.uint8))
    labels = jnp.asarray(rng.integers(0, num_classes, (4,)).astype(np.int32))
    step = jax.jit(train_step)
    state, loss, logits, grads = step(state, imgs, labels, jax.random.PRNGKey(2))
    return model, state, float(loss), logits, grads


@pytest.mark.parametrize("adaptive_type", ["global", "spatial", "attention"])
def test_configs3_adaptive_gpf_third_order(rng, adaptive_type):
    """configs[3]: adaptive-degree GPF (every exported variant) + 3rd-order
    sketch, one full train step driven purely by the config dict."""
    model, state, loss, logits, grads = _one_train_step(
        _config(adaptive_type=adaptive_type), rng
    )
    assert model.gpf_adaptive_type == adaptive_type
    assert np.isfinite(loss)
    assert logits.shape == (4, 6)
    # the adaptive module is actually in the graph: its extra parameters
    # exist and received nonzero gradient signal where applicable
    gpf_params = state.params["gpf"]
    assert "alpha_coeffs" in gpf_params
    if adaptive_type == "attention":
        assert "coeff_mod" in gpf_params
        g = grads["gpf"]["coeff_mod"]["kernel"]
        assert np.isfinite(np.asarray(g)).all()
    elif adaptive_type == "spatial":
        assert "spatial_coeffs" in gpf_params
        g = grads["gpf"]["spatial_coeffs"]
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0.0


def test_simplified_moment_variant_from_config(rng):
    """model.moment.variant='simplified' selects SimplifiedMomentHead through
    create_model (reference exports it publicly, moment_head_simple.py)."""
    model, state, loss, logits, _ = _one_train_step(
        _config(moment_variant="simplified"), rng
    )
    assert model.moment_variant == "simplified"
    assert np.isfinite(loss)
    # simplified head's parameter names (second_proj / third_rp), not the
    # canonical head's (vech projection + norm stacks)
    mh = state.params["moment_head"]
    assert "second_proj" in mh and "third_rp" in mh


def test_create_model_rejects_unknown_variant():
    cfg = _config(moment_variant="bogus")
    model = create_model(cfg, num_classes=6)
    dummy = jnp.zeros((1, 224, 224, 3), jnp.float32)
    with pytest.raises(ValueError, match="moment variant"):
        model.init(jax.random.PRNGKey(0), dummy, dummy, jnp.zeros((1,), jnp.int32))


def test_adaptive_global_matches_static_gpf(rng):
    """adaptive_type='global' must reduce to the base GPF math (the reference
    base-class fallthrough, gpf_kernel.py:211-217) given equal coefficients."""
    tokens_a = jnp.asarray(rng.normal(size=(2, 12, 16)).astype(np.float32))
    tokens_p = jnp.asarray(rng.normal(size=(2, 12, 16)).astype(np.float32))
    from ego_moment_cle_vit_tpu.models.gpf import GraphPolynomialFusion

    base = GraphPolynomialFusion(use_pallas=False)
    adap = AdaptiveGraphPolynomialFusion(adaptive_type="global")
    vb = base.init(jax.random.PRNGKey(3), tokens_a, tokens_p)
    out_base = base.apply(vb, tokens_a, tokens_p)
    out_adap = adap.apply(vb, tokens_a, tokens_p)
    np.testing.assert_allclose(
        np.asarray(out_base), np.asarray(out_adap), rtol=1e-6, atol=1e-6
    )
