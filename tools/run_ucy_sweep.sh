#!/bin/bash
# UCY collision-weight sweep (VERDICT r2 item 7): GC-style grid from the
# shared ucy0 pretrained checkpoint; sequential (one TPU process at a time).
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
    --set hard_collision_penalty="${hp}" || echo "FAILED ${suffix}"
}

run_one cw100h2 100 2
run_one cw500h2 500 2
run_one cw500h5 500 5
run_one cw1kh5 1000 5
run_one cw1kh20 1000 20
echo "UCY sweep done"
