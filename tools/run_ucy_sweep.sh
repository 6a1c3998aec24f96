#!/bin/bash
# UCY collision-weight sweep (VERDICT r2 item 7): GC-style grid from the
# shared ucy0 pretrained checkpoint; sequential (one TPU process at a time).
#
# val_coll_weight=30 (the reference's main.py default; the UCY grid yaml
# lowered it to 10) — with 10 the early-stopping rule selects the pretrained
# weights for any strong collision_loss_weight (measured: cw100h2), so the
# sweep could never trace the low-collision frontier it exists to find.
set -u
cd "$(dirname "$0")/.."

run_one() {
  local suffix=$1 w=$2 hp=$3
  cp -f "saved_model/piml-ucy_ucy0" "saved_model/piml-ucy_${suffix}"
  echo "=== UCY sweep ${suffix}: w=${w} hp=${hp} ==="
  python tools/run_ucy_experiment.py --stage finetune \
    --state "ucy_${suffix}.json" \
    --set model_name_suffix="${suffix}" \
    --set collision_loss_weight="${w}" \
    --set hard_collision_penalty="${hp}" \
    --set val_coll_weight=30 || echo "FAILED ${suffix}"
}

run_one cw200h5v30 200 5
run_one cw500h2v30 500 2
run_one cw500h5v30 500 5
run_one cw1kh5v30 1000 5
run_one cw1kh20v30 1000 20
echo "UCY sweep done"
