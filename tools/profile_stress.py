"""Trace-backed breakdown of the dense 12,685-agent stress step.

Runs the same rollout as bench.py's dense regime under jax.profiler, then
summarizes per-op device time from the trace so the frame cost is fully
accounted (VERDICT round-1: ~10 ms top_k + ~11 ms unaccounted).

Usage: python tools/profile_stress.py [--frames 20] [--no-group]
Writes /tmp/piml_trace/ and prints the top ops by self time.
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_run(group: int):
    import jax
    import jax.numpy as jnp

    from bench import _model_and_cfg
    from piml_tpu.engine import EngineConfig, init_state, rollout
    from piml_tpu.engine.rollout import SpawnFrame
    from piml_tpu.physics import NeighborConfig, relative_features

    n, T = 12685, 20
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 4)
    pos = jax.random.uniform(ks[0], (n, 2)) * 200.0
    vel = jax.random.normal(ks[1], (n, 2))
    acc = jnp.zeros((n, 2))
    wp = jax.random.uniform(ks[2], (1, n, 2)) * 200.0
    obstacles = jax.random.uniform(ks[3], (4096, 2)) * 200.0
    ds = jnp.full((n, 1), 1.34)

    ncfg = NeighborConfig(topk_group=group)
    cfg, params, raw_apply = _model_and_cfg((6, 6, 7), 0.08)

    # same bounded dynamics as bench.py's dense regime: unclamped random
    # weights fling agents kilometres out by frame ~12, which both empties
    # the crowd and forces the banded kernel's dense fallback — the trace
    # would profile the wrong regime
    def apply_fn(pr, pf, of, sf):
        out = raw_apply(pr, pf, of, sf)
        return out._replace(pred_acc=jnp.clip(out.pred_acc, -5.0, 5.0))

    ecfg = EngineConfig(neighbor=ncfg, time_unit=0.08, lagged=True,
                        retire_on_arrival=True, remat=False)

    pf, of, df = relative_features(pos, vel, acc, wp[0], obstacles, ncfg)
    sf = jnp.concatenate([df, vel, acc, ds], axis=-1)
    state = init_state(pos, vel, acc, wp[0], jnp.zeros(n, jnp.int32),
                       pf, of, sf)
    zeros2 = jnp.zeros((T, n, 2))
    spawns = SpawnFrame(
        new=jnp.zeros((T, n)), p=zeros2, v=zeros2, a=zeros2, dest=zeros2,
        dest_idx=jnp.zeros((T, n), jnp.int32), hist_v=jnp.zeros((T, n, 2)),
    )
    run = jax.jit(lambda p, s, sp: jnp.nansum(rollout(
        p, apply_fn, ecfg, s, sp, wp, jnp.ones(n, jnp.int32), obstacles, ds
    )[1].p))
    return run, (params, state, spawns), T


def summarize_trace(trace_dir: str, frames: int):
    """Aggregate self-times from the trace-viewer JSON events."""
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace json found under", trace_dir)
        return
    op_time = defaultdict(float)
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    pid_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        args = ev.get("args", {}) or {}
        label = ev.get("name", "?")
        src = args.get("tf_op") or args.get("long_name") or ""
        if src:
            label = f"{label}  [{str(src)[:80]}]"
        op_time[label] += ev.get("dur", 0.0)
    total = sum(op_time.values())
    print(f"\ndevice ops total {total/1e3:.2f} ms over {frames} frames "
          f"({total/1e3/frames:.3f} ms/frame)")
    for name, us in sorted(op_time.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {us/1e3/frames:8.3f} ms/frame  {100*us/total:5.1f}%  {name[:100]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--group", type=int, default=0,
                    help="topk_group for the XLA fallback path (0 = plain "
                         "wide lax.top_k); the default NeighborConfig now "
                         "routes the hot path through the banded cell-list "
                         "kernel regardless, so traces reflect production")
    ap.add_argument("--trace_dir", default="/tmp/piml_trace")
    cli = ap.parse_args()

    import jax

    run, args, T = build_run(cli.group)
    # compile + warm
    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    warm = time.perf_counter() - t0
    print(f"warm run: {warm*1e3:.1f} ms total, {warm/T*1e3:.2f} ms/frame "
          f"(topk_group={cli.group})")

    os.makedirs(cli.trace_dir, exist_ok=True)
    with jax.profiler.trace(cli.trace_dir):
        float(run(*args))
    summarize_trace(cli.trace_dir, T)


if __name__ == "__main__":
    main()
