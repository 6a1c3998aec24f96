#!/bin/bash
# Round-3 TPU queue, part 4 — rerun of queue3's iter0v work after the
# Scene host-array fix (the hang's root cause: eager device put made the
# feature-cache hash a D2H tunnel pull).  iter0v = quirk-free 'loss'-mode
# pretrain on iter0 synthetic data, then the joint vector force-law SR fit
# (VERDICT r2 item 10).
set -u
cd "$(dirname "$0")/.."

iter0v() {
  timeout 2400 python tools/run_gc_experiment.py --stage pretrain --epochs 1000 \
    --state gc_iter0v.json \
    --set model_name_suffix=iter0v \
    --set data_config="$(pwd)/configs/data_configs/gc_iter0_pretrain.yaml" \
    --set pinnsf_interaction=loss --set iter_flag=true \
    --set sf_dv_from_velocity=true \
    --set compat_unweighted_coll_pred=false \
    --set val_on_train_objective=true
}

echo "=== iter0v quirk-free pretrain ==="
iter0v || { echo "iter0v attempt 1 failed; retrying"; sleep 30; iter0v; } \
  || echo "FAILED iter0v pretrain"

echo "=== vector SR fit on iter0v ==="
timeout 2400 python tools/run_symbolic_regression.py --suffix iter0v --finetuned 0 \
  --data gc_iter0_pretrain --vector 1 --gp 0 \
  --out sr_gc_vector.json || echo "FAILED vector SR"

echo "TPU queue4 done"
