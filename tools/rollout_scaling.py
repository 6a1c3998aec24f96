"""Single-chip scale ceiling of the closed-loop rollout (VERDICT r4 item 6).

Extends the scaling table past N = 102,400 toward 1M agents/frame: constant
GC density (box side grows with sqrt N), full engine step per frame — banded
cell-list pair pass, model forward, lagged Euler, waypoint advance — with
the trained finetuned fixture weights (bounded dynamics, no clamp).  Each N
is attempted independently; a failure records the limiting error (HBM OOM /
VMEM overflow / compile-helper rejection) instead of killing the sweep.

    python tools/rollout_scaling.py [--ns 12685,102400,262144,524288,1048576]

Writes rollout_scaling.json at the repo root.
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE_N = 12685
BASE_EXTENT = 200.0


def run_one(n: int, frames: int, roundtrip: float):
    import jax
    import jax.numpy as jnp

    from bench import _load_trained_params, _model_and_cfg
    from piml_tpu.engine import EngineConfig, init_state, rollout
    from piml_tpu.engine.rollout import SpawnFrame
    from piml_tpu.ops.banded import banded_params
    from piml_tpu.physics import NeighborConfig, relative_features

    extent = BASE_EXTENT * math.sqrt(n / BASE_N)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    pos = jax.random.uniform(ks[0], (n, 2)) * extent
    vel = jax.random.normal(ks[1], (n, 2))
    acc = jnp.zeros((n, 2))
    wp = jax.random.uniform(ks[2], (1, n, 2)) * extent
    obstacles = jax.random.uniform(ks[3], (4096, 2)) * extent
    ds = jnp.full((n, 1), 1.34)

    ncfg = NeighborConfig()
    _, params, apply_fn = _model_and_cfg((6, 6, 7), 0.08)
    trained = _load_trained_params(params)
    if trained is not None:
        params = trained
    ecfg = EngineConfig(neighbor=ncfg, time_unit=0.08, lagged=True,
                        retire_on_arrival=True, remat=False)

    pf, of, df = relative_features(pos, vel, acc, wp[0], obstacles, ncfg)
    sf = jnp.concatenate([df, vel, acc, ds], axis=-1)
    state = init_state(pos, vel, acc, wp[0], jnp.zeros(n, jnp.int32),
                       pf, of, sf)
    zeros2 = jnp.zeros((frames, n, 2))
    spawns = SpawnFrame(
        new=jnp.zeros((frames, n)), p=zeros2, v=zeros2, a=zeros2, dest=zeros2,
        dest_idx=jnp.zeros((frames, n), jnp.int32),
        hist_v=jnp.zeros((frames, n, 2)),
    )
    run = jax.jit(lambda p, s, sp, w, dn, ob, dsx: jnp.nansum(rollout(
        p, apply_fn, ecfg, s, sp, w, dn, ob, dsx)[1].p))
    dest_num = jnp.ones(n, jnp.int32)

    t0 = time.perf_counter()
    out = float(run(params, state, spawns, wp, dest_num, obstacles, ds))
    compile_and_first_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(params, state, spawns, wp, dest_num, obstacles, ds))
        best = min(best, time.perf_counter() - t0)
    dt = max(best - roundtrip, 1e-6)
    g, w = banded_params(n, n, ncfg.topk_ped, fine=True)
    return {
        "n_agents": n,
        "frames": frames,
        "extent_m": round(extent, 1),
        "ms_per_frame": round(dt / frames * 1e3, 3),
        "agent_steps_per_sec": round(frames * n / dt, 1),
        "compile_and_first_run_s": round(compile_and_first_s, 1),
        "banded_grid_dim": g,
        "banded_window": w,
        "finite": math.isfinite(out),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", default="12685,25600,51200,102400,204800,"
                                    "409600,524288,1048576")
    ap.add_argument("--frames", type=int, default=20)
    cli = ap.parse_args()

    from bench import measure_roundtrip

    roundtrip = measure_roundtrip()
    rows = []
    for n in (int(s) for s in cli.ns.split(",")):
        frames = cli.frames if n <= 200000 else max(5, cli.frames // 4)
        print(f"[scaling] N={n} ...", flush=True)
        try:
            row = run_one(n, frames, roundtrip)
        except Exception as e:
            row = {"n_agents": n, "error": repr(e)[:400]}
        rows.append(row)
        print(f"[scaling] {row}", flush=True)
        with open(os.path.join(ROOT, "rollout_scaling.json"), "w") as f:
            json.dump({"tunnel_roundtrip_ms": roundtrip * 1e3,
                       "rows": rows}, f, indent=2)
    print("wrote rollout_scaling.json")


if __name__ == "__main__":
    main()
