#!/usr/bin/env bash
# CI-style proof of the trained-model registry chain (VERDICT r3 item 4):
#
#   train -> bless (configs/models.yaml) -> vdm4cdm-generate NAME -> calc_ss
#
# mirroring how a reference user goes from a configs.yaml entry to campaign
# statistics (reference generate_3D.py:24-41 + calc_SS.py). The blessed entry
# VDM_GRF_c_c_32 trains on the synthetic GRF substrate (no CAMELS data in
# this environment); its checkpoint is committed so generate/calc_ss run
# registry-only. Re-running this script reproduces every artifact.
#
# Usage: tools/blessed_chain.sh [out_dir]   (default campaigns/VDM_GRF_c_c_32)
set -euo pipefail
cd "$(dirname "$0")/.."

NAME=VDM_GRF_c_c_32
OUT=${1:-campaigns/$NAME}

if [ ! -d runs/$NAME/checkpoints ]; then
  echo "[chain] training $NAME (no blessed checkpoint yet)"
  python -m vdm4cdm_tpu.cli.train --preset $NAME
fi

echo "[chain] generating CV_12_12 campaign from the registry entry"
python -m vdm4cdm_tpu.cli.generate $NAME "$OUT/CV_12_12" CV_12_12 \
  --reps-per-batch 12 --n-sampling-steps 250

echo "[chain] summary statistics"
python -m vdm4cdm_tpu.cli.calc_ss $NAME --data-dir "$OUT"

echo "[chain] acceptance gate"
python -m pytest tests/test_acceptance.py -q

echo "[chain] done: $OUT/summary.pkl"
