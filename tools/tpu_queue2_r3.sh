#!/bin/bash
# Round-3 TPU queue, part 2 — runs after tools/tpu_queue_r3.sh completes.
#  1. UCY operating-point: higher finetune LR variants (the paper's
#     lr*0.02 = 4e-6 cannot restructure collision behavior; measured: every
#     w in 100..1000 leaves val collisions rising and selection returns the
#     pretrained weights)
#  2. bench.py (full headline bench incl. new regimes)
#  3. TPU perf regression guard
set -u
cd "$(dirname "$0")/.."

while ! grep -q "TPU queue done" /tmp/tpu_queue.log 2>/dev/null; do
  sleep 60
done

run_ucy() {
  local suffix=$1 w=$2 hp=$3 lrd=$4
  cp -f "saved_model/piml-ucy_ucy0" "saved_model/piml-ucy_${suffix}"
  echo "=== UCY lr-variant ${suffix}: w=${w} hp=${hp} lrd=${lrd} ==="
  python tools/run_ucy_experiment.py --stage finetune \
    --state "ucy_${suffix}.json" \
    --set model_name_suffix="${suffix}" \
    --set collision_loss_weight="${w}" \
    --set hard_collision_penalty="${hp}" \
    --set finetune_lr_decay="${lrd}" \
    --set val_coll_weight=30 || echo "FAILED ${suffix}"
}

run_ucy cw1kh5lr1 1000 5 0.1
run_ucy cw1kh5lr5 1000 5 0.5

echo "=== bench.py ==="
timeout 3000 python bench.py || echo "FAILED bench"

echo "=== TPU perf guard ==="
PIML_RUN_TPU_GUARDS=1 timeout 900 python -m pytest tests/test_perf_guard.py -q \
  || echo "FAILED perf guard"

echo "TPU queue2 done"
