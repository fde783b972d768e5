"""CLI surface tests (subprocess-driven, like the reference's
test_cli_tools.py — but bounded to fast paths: --help, --list, --info,
error handling)."""

import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


def run(args, timeout=60):
    return subprocess.run(
        [sys.executable, *args],
        cwd=ROOT,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.mark.parametrize(
    "script",
    ["train.py", "eval.py", "download_dataset.py", "quick_start.py", "setup_and_run.py"],
)
def test_help(script):
    r = run([script, "--help"])
    assert r.returncode == 0, r.stderr
    assert "usage" in r.stdout.lower()


def test_downloader_list():
    r = run(["download_dataset.py", "--list"])
    assert r.returncode == 0
    for name in ("cotton80", "soybean", "soy_ageing_r1"):
        assert name in r.stdout


def test_downloader_info_known_and_unknown():
    r = run(["download_dataset.py", "--info", "cotton80"])
    assert r.returncode == 0
    assert "cotton80_dataset.parquet" in r.stdout

    r = run(["download_dataset.py", "--info", "coton80"])
    assert r.returncode == 1
    assert "Did you mean" in r.stdout


def test_downloader_unknown_dataset_fails():
    r = run(["download_dataset.py", "--dataset", "not_a_dataset"])
    assert r.returncode == 1


def test_train_missing_config_fails():
    r = run(["train.py", "--config", "configs/does_not_exist.yaml", "--device", "cpu"])
    assert r.returncode != 0
