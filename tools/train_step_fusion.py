"""Measure the finetune train-step latency under (remat, unroll) variants.

The paper-size step (C=32, 10 BPTT frames, 122 agent slots) is dispatch-
latency-bound (~200 small kernels); two XLA-level levers attack that
without touching the math:

- ``remat_features=False``: skip jax.checkpoint on the rollout step —
  memory is tiny at this size, so recomputing forward in backward only
  adds kernels;
- ``bptt_unroll=10``: unroll the 10-frame BPTT scan so XLA fuses across
  time steps instead of launching each frame's kernel chain separately.

Writes train_step_fusion.json; run on the real TPU chip.
"""

import json
import sys

sys.path.insert(0, ".")

import bench  # noqa: E402


def main():
    roundtrip = bench.measure_roundtrip()
    out = {"tunnel_roundtrip_ms": roundtrip * 1e3, "variants": {}}
    for remat, unroll in [(True, 1), (False, 1), (True, 10), (False, 10)]:
        key = f"remat={int(remat)},unroll={unroll}"
        try:
            r = bench.bench_train_step(roundtrip, remat=remat, unroll=unroll)
            out["variants"][key] = {
                "s_per_step": r["s_per_step"],
                "steps_per_sec": r["steps_per_sec"],
                "mfu_vs_bf16_peak": r["mfu_vs_bf16_peak"],
            }
            print(f"{key}: {r['s_per_step']*1e3:.3f} ms/step")
        except Exception as e:  # isolate per-variant failures
            out["variants"][key] = {"error": repr(e)}
            print(f"{key}: FAILED {e!r}")
    with open("train_step_fusion.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote train_step_fusion.json")


if __name__ == "__main__":
    main()
