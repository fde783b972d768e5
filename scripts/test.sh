#!/bin/bash
# Smoke-test job (the reference's scripts/test.sh runs its script-based
# checks on a GPU node; ours runs the pytest suite on the virtual CPU mesh
# plus the synthetic end-to-end config).
set -euo pipefail
cd "$(dirname "$0")/.."

python -m pytest tests/ -q
python train.py --config configs/smoke_synthetic.yaml --device cpu --epochs 1
