"""Windows-axis train-step sweep (VERDICT r3 item 3).

BENCH_r03: the finetune train step achieved 24.1 TFLOP/s at 32 windows but
17.4 at 128 — quadrupling the batch LOWERED achieved FLOPs.  This tool
sweeps the windows axis under each schedule (auto policy, forced unrolled
no-remat, forced scanned+remat) and dtype so the cause is measurable:
if the unrolled live-activation program stops fitting the on-chip working
set the unrolled curve should fall off while the scanned one keeps
scaling; if the step simply goes HBM-bound both fall together.

Writes train_step_windows_sweep.json.  Run on the TPU tunnel (~10 min).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    rt = bench.measure_roundtrip()
    print(f"roundtrip {rt*1e3:.1f} ms", flush=True)
    rows = []
    for dtype in ("float32", "bfloat16"):
        for c in (32, 64, 96, 128, 192, 256):
            for label, remat, unroll, batched in (
                ("auto", None, 0, None),
                ("unrolled", False, 10, None),
                ("scanned_remat", True, 1, None),
                # channel-batched BPTT: scan over TIME with the channel
                # vmap inside each step — one (C*N, d) matmul per layer
                # per frame instead of C separate (N, d) ones
                ("batched_time_scan", False, 1, True),
            ):
                if label != "auto" and c not in (32, 128):
                    continue  # schedule A/B only at the two bench points
                try:
                    r = bench.bench_train_step(
                        rt, batch_windows=c, remat=remat, unroll=unroll,
                        dtype=dtype, steps=10, batched=batched)
                except Exception as e:  # compile blowups at large unrolls
                    r = {"error": repr(e)[:200]}
                row = {"dtype": dtype, "windows": c, "schedule": label, **r}
                rows.append(row)
                keep = {k: row.get(k) for k in
                        ("dtype", "windows", "schedule", "s_per_step",
                         "achieved_tflops", "windows_per_sec",
                         "hbm_demand_vs_819GBps", "error")}
                print(json.dumps(keep), flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "train_step_windows_sweep.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
