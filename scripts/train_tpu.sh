#!/bin/bash
# Single-host TPU training job (the reference ships PBS scripts for
# A100/V100 nodes, scripts/train_a100.sh — this is the TPU equivalent).
set -euo pipefail
cd "$(dirname "$0")/.."

CONFIG="${1:-configs/ufg_base.yaml}"
python train.py --config "$CONFIG" "${@:2}"
