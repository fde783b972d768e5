"""End-to-end LEARNING sanity: on a learnable synthetic dataset the full
training loop must push accuracy well above chance.  This is the strongest
cheap evidence that gradients, augmentation, losses, schedule, and update
actually cohere (a step that merely runs can still be silently broken)."""

from pathlib import Path

import numpy as np
import pytest

from ego_moment_cle_vit_tpu.utils import load_config

CFG_PATH = Path(__file__).resolve().parent.parent / "configs" / "smoke_synthetic.yaml"


@pytest.mark.slow
def test_training_learns_above_chance(tmp_path):
    cfg = load_config(str(CFG_PATH))
    cfg["experiment"]["output_dir"] = str(tmp_path / "outputs")
    cfg["experiment"]["save_dir"] = str(tmp_path / "ckpts")
    cfg["experiment"]["log_dir"] = str(tmp_path / "logs")
    cfg["dataset"].update({"learnable": True, "num_classes": 4, "samples_per_class": 16})
    cfg["training"].update({"epochs": 4, "batch_size": 16})
    cfg["training"]["optimizer"]["lr"] = 3e-3
    cfg["training"]["scheduler"]["warmup_epochs"] = 0
    # keep augmentation mild so the class signal survives
    cfg["data"].update({"rotation": 0, "mask_ratio": [0.1, 0.2]})

    from ego_moment_cle_vit_tpu.train import Trainer

    trainer = Trainer(cfg)
    trainer.setup_data()
    trainer.setup_model()
    results = trainer.train()

    accs = results["history"]["val_acc"]
    # chance is 0.25 for 4 classes; demand a clear margin by the end
    assert max(accs) > 0.4, accs  # chance = 0.25
