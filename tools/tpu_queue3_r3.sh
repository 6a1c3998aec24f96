#!/bin/bash
# Round-3 TPU queue, part 3 — after queue2: retry the iter0v quirk-free
# pretrain (first attempt hung on a tunnel futex; timeout converts hangs to
# failures, then retry once) + the joint vector SR fit, then re-measure the
# scaling rows that the compile helper rejected at C=512, at C=128.
set -u
cd "$(dirname "$0")/.."

while ! grep -q "TPU queue2 done" /tmp/tpu_queue2.log 2>/dev/null; do
  sleep 60
done

iter0v() {
  timeout 1200 python tools/run_gc_experiment.py --stage pretrain --epochs 1000 \
    --state gc_iter0v.json \
    --set model_name_suffix=iter0v \
    --set data_config="$(pwd)/configs/data_configs/gc_iter0_pretrain.yaml" \
    --set pinnsf_interaction=loss --set iter_flag=true \
    --set sf_dv_from_velocity=true \
    --set compat_unweighted_coll_pred=false \
    --set val_on_train_objective=true
}

echo "=== iter0v quirk-free pretrain (retry) ==="
iter0v || { echo "iter0v attempt 1 failed; retrying"; sleep 30; iter0v; } \
  || echo "FAILED iter0v pretrain"

echo "=== vector SR fit on iter0v ==="
timeout 1200 python tools/run_symbolic_regression.py --suffix iter0v --finetuned 0 \
  --data gc_iter0_pretrain --vector 1 --gp 0 \
  --out sr_gc_vector.json || echo "FAILED vector SR"

echo "TPU queue3 done"
