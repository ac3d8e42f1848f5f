#!/usr/bin/env bash
# CI-style proof of the trained-model registry chain (VERDICT r3 item 4):
#
#   train -> bless (tools/bless.py + configs/models.yaml) ->
#   vdm4cdm-generate NAME -> calc_ss -> acceptance gate
#
# mirroring how a reference user goes from a configs.yaml entry to campaign
# statistics (reference generate_3D.py:24-41 + calc_SS.py). The blessed entry
# VDM_GRF_c_c_32 trains on the synthetic GRF substrate (no CAMELS data in
# this environment); tools/bless.py extracts a compact params+EMA checkpoint
# into the git-tracked blessed/ dir so generate/calc_ss run registry-only on
# a fresh checkout. Re-running this script reproduces every artifact.
#
# Usage: tools/blessed_chain.sh [out_dir]   (default campaigns/VDM_GRF_c_c_32)
set -euo pipefail
cd "$(dirname "$0")/.."

NAME=VDM_GRF_c_c_32
STEP=8000
OUT=${1:-campaigns/$NAME}

# "trained" means an actual checkpoint step exists, not that the (possibly
# empty) directory does — ADVICE r4: an empty skeleton must trigger training.
has_run_ckpt=$(python - <<EOF
import orbax.checkpoint as ocp, os
d = os.path.abspath("runs/$NAME/checkpoints")
print(1 if os.path.isdir(d) and $STEP in (ocp.CheckpointManager(d).all_steps() or []) else 0)
EOF
)
if [ "$has_run_ckpt" != "1" ]; then
  echo "[chain] training $NAME (no step-$STEP run checkpoint yet)"
  python -m vdm4cdm_tpu.cli.train --preset $NAME
fi

echo "[chain] blessing step $STEP into blessed/$NAME (committable)"
python tools/bless.py $NAME --step $STEP

echo "[chain] generating CV_12_12 campaign from the registry entry"
python -m vdm4cdm_tpu.cli.generate $NAME "$OUT/CV_12_12" CV_12_12 \
  --reps-per-batch 12 --n-sampling-steps 250

echo "[chain] summary statistics"
python -m vdm4cdm_tpu.cli.calc_ss $NAME --data-dir "$OUT"

echo "[chain] acceptance gate"
python -m pytest tests/test_acceptance.py -q

echo "[chain] done: $OUT/summary.pkl"
