#!/bin/bash
# Round-3 TPU work queue — strictly sequential (one TPU process at a time).
# Waits for the UCY sweep to release the chip, then:
#  1. GC shared-budget mirror run (same epoch caps as the torch reference
#     accuracy run: pretrain<=60 swapped-patience-5, finetune<=6)
#  2. quirk-free iter0 pretrain (sf_dv_from_velocity) + joint vector SR fit
#  3. train-step scaling sweep
set -u
cd "$(dirname "$0")/.."

while ! grep -q "UCY sweep done" /tmp/ucy_sweep2.log 2>/dev/null; do
  sleep 60
done

echo "=== GC shared-budget mirror: pretrain (cap 60) ==="
python tools/run_gc_experiment.py --stage pretrain --epochs 60 \
  --state gc_sharedbudget.json \
  --set model_name_suffix=shared0 || echo "FAILED shared pretrain"

echo "=== GC shared-budget mirror: finetune (cap 6) ==="
python tools/run_gc_experiment.py --stage finetune --epochs 6 \
  --state gc_sharedbudget.json \
  --set model_name_suffix=shared0 || echo "FAILED shared finetune"

echo "=== iter0v quirk-free pretrain ==="
python tools/run_gc_experiment.py --stage pretrain --epochs 1000 \
  --state gc_iter0v.json \
  --set model_name_suffix=iter0v \
  --set data_config="$(pwd)/configs/data_configs/gc_iter0_pretrain.yaml" \
  --set pinnsf_interaction=loss --set iter_flag=true \
  --set sf_dv_from_velocity=true \
  --set compat_unweighted_coll_pred=false \
  --set val_on_train_objective=true || echo "FAILED iter0v pretrain"

echo "=== vector SR fit on iter0v ==="
python tools/run_symbolic_regression.py --suffix iter0v --finetuned 0 \
  --data gc_iter0_pretrain --vector 1 --gp 0 \
  --out sr_gc_vector.json || echo "FAILED vector SR"

echo "=== train-step scaling sweep ==="
timeout 1800 python tools/train_step_scaling.py || echo "FAILED scaling"

echo "TPU queue done"
