#!/usr/bin/env python
"""Sequential implementation smoke suite with a pass/fail summary.

Capability parity with /root/reference/test_implementation.py (the 8-check
install validator users run first): imports, config sections, seed
determinism + model info, component shape checks (GPF/MomentHead/backbone),
loss smoke, model creation, forward shapes, feature-dict keys.  CPU-runnable
with random tensors — no dataset or pretrained weights.

The pytest suite in tests/ is the real test surface; this script is the
quick "is my install sane?" entry point.
"""

from __future__ import annotations

import sys
import traceback

RESULTS = []


def check(name):
    def deco(fn):
        RESULTS.append((name, fn))
        return fn

    return deco


@check("imports")
def _imports():
    import jax  # noqa
    import flax  # noqa
    import optax  # noqa

    import ego_moment_cle_vit_tpu
    from ego_moment_cle_vit_tpu import data, losses, models, ops, parallel, train, utils  # noqa

    return f"package v{ego_moment_cle_vit_tpu.__version__}"


@check("config file")
def _config():
    from ego_moment_cle_vit_tpu.utils import load_config

    cfg = load_config("configs/ufg_base.yaml")
    for section in ("model", "training", "data", "dataset", "experiment", "evaluation"):
        assert section in cfg, f"missing config section {section}"
    return f"{len(cfg)} sections"


@check("seed determinism")
def _seed():
    import jax
    import jax.numpy as jnp

    from ego_moment_cle_vit_tpu.utils import set_seed

    k1 = set_seed(42)
    k2 = set_seed(42)
    a = jax.random.normal(k1, (4, 4))
    b = jax.random.normal(k2, (4, 4))
    assert bool(jnp.all(a == b))
    return "reproducible"


@check("GPF component")
def _gpf():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ego_moment_cle_vit_tpu.models import GraphPolynomialFusion

    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal((2, 16, 24)).astype(np.float32))
    gpf = GraphPolynomialFusion()
    v = gpf.init(jax.random.PRNGKey(0), t, t)
    g = gpf.apply(v, t, t)
    assert g.shape == (2, 16, 16)
    gn = np.asarray(g)
    assert np.allclose(gn, gn.transpose(0, 2, 1), atol=1e-5) and gn.min() >= 0
    return "symmetric, nonneg"


@check("MomentHead component")
def _moment():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ego_moment_cle_vit_tpu.models import MomentHead

    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal((2, 16, 24)).astype(np.float32))
    g = rng.standard_normal((2, 16, 16)).astype(np.float32)
    g = jnp.asarray(np.abs(g @ g.transpose(0, 2, 1)))
    head = MomentHead(d_in=24, d_out=32, use_third_order=True, sketch_dim=128)
    v = head.init(jax.random.PRNGKey(0), t, g)
    out = head.apply(v, t, g)
    assert out.shape == (2, 32) and bool(jnp.all(jnp.isfinite(out)))
    return "finite [2, 32]"


@check("backbone component")
def _backbone():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ego_moment_cle_vit_tpu.models import CLEViTBackbone

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    bb = CLEViTBackbone(model_name="vit_tiny_patch16_224", img_size=64)
    v = bb.init(jax.random.PRNGKey(0), x)
    out = bb.apply(v, x)
    assert out["patch_tokens"].shape == (2, 16, 192)
    assert out["global_features"].shape == (2, 192)
    return "tokens + global ok"


@check("loss library")
def _losses():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ego_moment_cle_vit_tpu.losses import (
        HardTripletLoss,
        KernelAlignmentLoss,
        TripletLoss,
    )

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    p = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    n = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, (8,)))
    g = rng.standard_normal((8, 5, 5)).astype(np.float32)
    g = jnp.asarray(g @ g.transpose(0, 2, 1))

    l1 = float(TripletLoss(margin=1.0)(a, p, n))
    l2 = float(HardTripletLoss(margin=1.0)(a, labels))
    l3 = float(KernelAlignmentLoss("centered")(g, labels))
    assert all(np.isfinite(x) for x in (l1, l2, l3))
    return f"triplet={l1:.3f} hard={l2:.3f} align={l3:.3f}"


@check("full model forward + features + backward")
def _model():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ego_moment_cle_vit_tpu.models import EGOMomentCLEViT

    rng = np.random.default_rng(0)
    model = EGOMomentCLEViT(
        num_classes=10,
        backbone_name="vit_tiny_patch16_224",
        img_size=64,
        moment_d_out=64,
        use_third_order=True,
        sketch_dim=256,
        classifier_hidden=32,
    )
    a = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    p = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, (2,)))
    v = model.init(jax.random.PRNGKey(0), a, p, y)
    out = model.apply(v, a, p, y, return_features=True)
    assert out["logits"].shape == (2, 10)
    for key in ("loss_main_ce", "loss_anchor_ce", "loss_positive_ce", "loss_triplet"):
        assert key in out["loss_dict"]
    for key in ("fused_graph", "moment_features", "gpf_coefficients"):
        assert key in out["features"]

    grads = jax.grad(
        lambda params: model.apply({**v, "params": params}, a, p, y)["loss"]
    )(v["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    return f"loss={float(out['loss']):.3f}, {len(leaves)} grad tensors"


def main() -> int:
    print("=" * 64)
    print("EGO-Moment-CLE-ViT (TPU) implementation check")
    print("=" * 64)
    passed = 0
    for name, fn in RESULTS:
        try:
            detail = fn()
            print(f"  [PASS] {name}: {detail}")
            passed += 1
        except Exception as exc:
            print(f"  [FAIL] {name}: {exc}")
            traceback.print_exc()
    total = len(RESULTS)
    print("-" * 64)
    print(f"{passed}/{total} checks passed")
    return 0 if passed == total else 1


if __name__ == "__main__":
    sys.exit(main())
