"""Headline benchmark: closed-loop GC-concourse rollout throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N}

Two regimes:

1. **GC window (headline)** — the shipped GC scene (60 s window of the
   12,685-pedestrian recording; ~122 concurrent tracked agents).  The rollout
   is the reference's inference hot loop (src/models/simulators.py:595-652):
   per frame — pinnsf_bm forward over neighbor features, lagged-Euler
   integration, waypoint advance, arrival retirement, ground-truth spawn-in,
   full O(N²) neighbor rebuild.  One jitted ``lax.scan`` on TPU,
   ``vs_baseline`` against the torch-CPU per-frame loop at the SAME N
   (tools/measure_reference_baseline.py → BASELINE_MEASURED.json).
2. **Dense 12,685-agent stress** — a synthetic scene with 12,685 concurrent
   agents exercising the full O(N²) matmul neighbor pass at dataset scale
   (reported in "extra"; the reference architecture cannot materialize its
   dense (N, N, 6) tensors at this N).
"""

import json
import os
import time

GC_SCENE = (
    "/root/reference/data/GC_Dataset/"
    "GC_Dataset_ped1-12685_time1000-1060_interp9_xrange5-25_yrange15-35.npy"
)
BASELINE_FILE = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
ROLL_FRAMES = 250
STRESS_N = 12685
STRESS_FRAMES = 10


def _model_and_cfg(data_dims, time_unit):
    import jax

    from piml_tpu.config import PIMLConfig
    from piml_tpu.models import ModelSpec, build_model

    p, o, s = data_dims
    cfg = PIMLConfig(
        model="pinnsf_bm", dataset_name="gc2344", dropout=0.0, skip_frames=25,
        ped_feature_dim=p, obs_feature_dim=o, self_feature_dim=s,
        time_unit=time_unit,
    )
    spec = ModelSpec.from_config(cfg)
    model = build_model(spec)
    import jax.numpy as jnp

    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((4, 6, p)), jnp.zeros((4, 10, o)),
        jnp.zeros((4, s)),
    )
    apply_fn = lambda pr, pf, of, sf: model.apply(pr, pf, of, sf)
    return cfg, params, apply_fn


def bench_gc_window():
    import jax
    import jax.numpy as jnp

    from piml_tpu.data import make_time_indexed
    from piml_tpu.engine import engine_config, eval_rollout
    from piml_tpu.scene import Scene
    from piml_tpu.config import PIMLConfig

    scene = Scene.load(GC_SCENE)
    cfg0 = PIMLConfig(model="pinnsf_bm", dataset_name="gc2344", dropout=0.0,
                      skip_frames=25)
    data = make_time_indexed(cfg0, scene)
    cfg, params, apply_fn = _model_and_cfg(data.feature_dims, data.time_unit)
    ecfg = engine_config(cfg, retire=True, track_collisions=False,
                         track_labels=False)

    t_start = cfg.skip_frames
    total = data.num_frames
    window = min(ROLL_FRAMES, total - t_start)
    sliced = jax.tree_util.tree_map(
        lambda x: x[: t_start + window]
        if hasattr(x, "shape") and x.shape and x.shape[0] == total else x,
        data,
    )

    res = eval_rollout(params, apply_fn, ecfg, sliced, t_start)  # compile
    jax.block_until_ready(res.position)

    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        res = eval_rollout(params, apply_fn, ecfg, sliced, t_start)
        jax.block_until_ready(res.position)
    dt = (time.perf_counter() - t0) / reps

    n_slots = res.position.shape[1]
    present = float(jnp.sum(res.mask_p[t_start:]))
    return {
        "n_agents": n_slots,
        "frames": window,
        "wall_s": dt,
        "slot_steps_per_sec": window * n_slots / dt,
        "present_steps_per_sec": present / dt,
    }


def bench_dense_stress():
    import jax
    import jax.numpy as jnp

    from piml_tpu.engine import EngineConfig, init_state, rollout
    from piml_tpu.engine.rollout import SpawnFrame
    from piml_tpu.physics import NeighborConfig, relative_features

    n = STRESS_N
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 4)
    pos = jax.random.uniform(ks[0], (n, 2)) * 200.0
    vel = jax.random.normal(ks[1], (n, 2))
    acc = jnp.zeros((n, 2))
    wp = (jax.random.uniform(ks[2], (1, n, 2)) * 200.0)
    dest = wp[0]
    obstacles = jax.random.uniform(ks[3], (4096, 2)) * 200.0
    ds = jnp.full((n, 1), 1.34)

    ncfg = NeighborConfig()
    cfg, params, apply_fn = _model_and_cfg((6, 6, 7), 0.08)
    ecfg = EngineConfig(neighbor=ncfg, time_unit=0.08, lagged=True,
                        retire_on_arrival=True, remat=False)

    pf, of, df = relative_features(pos[None], vel[None], acc[None],
                                   dest[None], obstacles, ncfg)
    sf = jnp.concatenate([df[0], vel, acc, ds], axis=-1)
    state = init_state(pos, vel, acc, dest, jnp.zeros(n, jnp.int32),
                       pf[0], of[0], sf)
    zeros2 = jnp.zeros((STRESS_FRAMES, n, 2))
    spawns = SpawnFrame(
        new=jnp.zeros((STRESS_FRAMES, n)), p=zeros2, v=zeros2, a=zeros2,
        dest=zeros2, dest_idx=jnp.zeros((STRESS_FRAMES, n), jnp.int32),
        hist_v=jnp.zeros((STRESS_FRAMES, n, 2)),
    )

    # everything enters as arguments — closure-captured device arrays become
    # XLA constants pinned to slow memory on this backend
    run = jax.jit(lambda p, s, sp, w, dn, ob, dsx: rollout(
        p, apply_fn, ecfg, s, sp, w, dn, ob, dsx
    )[1].p)
    dest_num = jnp.ones(n, jnp.int32)
    out = run(params, state, spawns, wp, dest_num, obstacles, ds)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = run(params, state, spawns, wp, dest_num, obstacles, ds)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    dt = best
    return {
        "n_agents": n,
        "frames": STRESS_FRAMES,
        "wall_s": dt,
        "slot_steps_per_sec": STRESS_FRAMES * n / dt,
    }


def main():
    gc = bench_gc_window()
    stress = bench_dense_stress()

    vs_baseline = None
    stress_vs = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)
        ref = base.get("gc_window", {}).get("agent_steps_per_sec") or \
            base.get("agent_steps_per_sec")
        if ref:
            vs_baseline = gc["slot_steps_per_sec"] / ref
        ref_big = base.get("dense_12685", {}).get("agent_steps_per_sec")
        if ref_big:
            stress_vs = stress["slot_steps_per_sec"] / ref_big

    print(json.dumps({
        "metric": "GC-window closed-loop rollout agent-steps/sec",
        "value": round(gc["slot_steps_per_sec"], 1),
        "unit": "agent-steps/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "extra": {
            "gc_window": {k: round(v, 4) for k, v in gc.items()},
            "dense_12685_stress": {k: round(v, 4) for k, v in stress.items()},
            "dense_12685_vs_baseline": round(stress_vs, 2) if stress_vs else None,
        },
    }))


if __name__ == "__main__":
    main()
