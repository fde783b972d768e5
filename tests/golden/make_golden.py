"""Generate the committed full-model golden fixture.

Builds the micro flagship-shaped model (vit_micro backbone + GPF + full
MomentHead with third-order FFT sketch + classifier — every branch of the
composition root, ego_moment_clevit.py semantics per reference
ego_moment_clevit.py:121-201), initializes it once, and freezes:

  * the full parameter tree (flattened, ~1 MB npz)
  * fixed inputs (seeded synthetic)
  * the forward logits, total loss, per-term loss dict, and the single-view
    inference logits

``tests/test_golden_model.py`` replays the forward from the frozen weights
and pins the outputs — so refactors (kernel fusions, op rewrites) cannot
silently shift the model.  Regenerate ONLY for a deliberate,
documented semantic change:  python tests/golden/make_golden.py
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np  # noqa: E402

GOLDEN = Path(__file__).resolve().parent / "full_model_golden.npz"

CONFIG = {
    "model": {
        "backbone_name": "vit_micro_patch16_64",
        "norm": "layer",
        "bf16": False,
        "gpf": {"degree_p": 2, "degree_q": 2, "similarity": "cosine"},
        "moment": {
            "d_out": 64,
            "use_third_order": True,
            "isqrt_iterations": 3,
            "sketch_dim": 128,
            "sketch_mode": "fft",
        },
        "classifier": {"fusion_type": "concat", "hidden_dim": 32},
    },
    "training": {
        "loss": {"lambda_triplet": 0.6, "lambda_align": 0.1, "margin": 0.3}
    },
    "data": {"input_size": 64},
}
NUM_CLASSES = 5
BATCH = 4


def build():
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict

    jax.config.update("jax_platforms", "cpu")

    from ego_moment_cle_vit_tpu.models import create_model

    model = create_model(CONFIG, NUM_CLASSES)
    rng = np.random.default_rng(1234)
    anchor = jnp.asarray(
        rng.standard_normal((BATCH, 64, 64, 3)).astype(np.float32)
    )
    positive = jnp.asarray(
        rng.standard_normal((BATCH, 64, 64, 3)).astype(np.float32)
    )
    labels = jnp.asarray(rng.integers(0, NUM_CLASSES, (BATCH,)), jnp.int32)

    variables = model.init(jax.random.PRNGKey(0), anchor, positive, labels)
    out = model.apply(variables, anchor, positive, labels)
    infer_logits = model.apply(variables, anchor, method=model.inference)

    payload = {}
    for coll, tree in variables.items():
        for path, leaf in flatten_dict(tree).items():
            payload[f"var::{coll}::" + "/".join(path)] = np.asarray(leaf)
    payload["in::anchor"] = np.asarray(anchor)
    payload["in::positive"] = np.asarray(positive)
    payload["in::labels"] = np.asarray(labels)
    payload["out::logits"] = np.asarray(out["logits"])
    payload["out::logits_anchor"] = np.asarray(out["logits_anchor"])
    payload["out::logits_positive"] = np.asarray(out["logits_positive"])
    payload["out::loss"] = np.asarray(out["loss"])
    for k, v in out["loss_dict"].items():
        payload[f"loss::{k}"] = np.asarray(v)
    payload["out::infer_logits"] = np.asarray(infer_logits)
    return payload


if __name__ == "__main__":
    payload = build()
    np.savez_compressed(GOLDEN, **payload)
    n_params = sum(
        v.size for k, v in payload.items() if k.startswith("var::")
    )
    print(
        f"wrote {GOLDEN} ({GOLDEN.stat().st_size / 1e6:.2f} MB, "
        f"{n_params:,} params), loss={float(payload['out::loss']):.6f}"
    )
