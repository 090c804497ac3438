#!/bin/bash
# One-command reproduce-training entry — the analog of the reference's
# run_train.sh (reference: run_train.sh:1-5, which runs
# diffusion_model/train_ddpm.py with the hardcoded config at
# diffusion_model/config/config.yaml). configs/diffusion.yaml carries the
# reference's exact hyperparameters (batch 4, lr 1e-4, 200 epochs, seed 3455,
# T=1000 linear β 1e-4..0.02 — reference config.yaml:30-37) plus the
# TPU-first extensions (bf16 compute, DP mesh axis, async Orbax ckpt).
#
#   ./run_train.sh                 # DDPM on the reference config
#   ./run_train.sh --max-steps 50  # bounded smoke
#
# The seg and SRGAN loops have the same shape:
#   python -m weatherconverter_tpu.cli.main train-seg   --config configs/segmentation.yaml
#   python -m weatherconverter_tpu.cli.main train-srgan
set -euo pipefail
cd "$(dirname "$0")"
exec python -m weatherconverter_tpu.cli.main train-ddpm \
  --config configs/diffusion.yaml "$@"
