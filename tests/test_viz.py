"""Visualization suite smoke tests: every plot function (reference viz.py
parity surface) renders and saves headlessly."""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from ego_moment_cle_vit_tpu.utils import viz


@pytest.fixture
def outdir(tmp_path):
    return tmp_path


def test_plot_similarity_matrix(rng, outdir):
    path = outdir / "sim.png"
    viz.plot_similarity_matrix(
        rng.standard_normal((16, 16)), save_path=str(path)
    )
    assert path.exists() and path.stat().st_size > 0


def test_plot_graph_weights_spatial_and_non_square(rng, outdir):
    g = rng.standard_normal((16, 16))
    g = g @ g.T
    path = outdir / "gw.png"
    viz.plot_graph_weights(g, save_path=str(path))
    assert path.exists()
    # non-square token count falls back to bar/line panels
    g2 = rng.standard_normal((10, 10))
    path2 = outdir / "gw2.png"
    viz.plot_graph_weights(g2 @ g2.T, save_path=str(path2))
    assert path2.exists()


def test_plot_polynomial_coefficients(rng, outdir):
    path = outdir / "coef.png"
    viz.plot_polynomial_coefficients(
        np.abs(rng.standard_normal((3, 3))), save_path=str(path)
    )
    assert path.exists()


@pytest.mark.parametrize("method", ["pca", "tsne"])
def test_plot_feature_embeddings(rng, outdir, method):
    path = outdir / f"emb_{method}.png"
    viz.plot_feature_embeddings(
        rng.standard_normal((40, 16)),
        rng.integers(0, 4, 40),
        method=method,
        save_path=str(path),
    )
    assert path.exists()


def test_plot_training_curves(outdir):
    path = outdir / "curves.png"
    viz.plot_training_curves(
        {
            "train_loss": [3, 2, 1],
            "val_loss": [3.2, 2.4, 1.5],
            "train_acc": [0.2, 0.5, 0.7],
            "val_acc": [0.15, 0.4, 0.6],
        },
        save_path=str(path),
    )
    assert path.exists()


def test_plot_confusion_matrix(rng, outdir):
    labels = rng.integers(0, 5, 100)
    preds = rng.integers(0, 5, 100)
    path = outdir / "cm.png"
    viz.plot_confusion_matrix(
        labels, preds, class_names=[f"c{i}" for i in range(5)], save_path=str(path)
    )
    assert path.exists()


def test_visualize_moment_features(rng, outdir):
    path = outdir / "mom.png"
    viz.visualize_moment_features(
        rng.standard_normal((30, 24)), rng.integers(0, 3, 30), save_path=str(path)
    )
    assert path.exists()
