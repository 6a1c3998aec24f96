"""Headline benchmark: closed-loop rollout throughput on the GC concourse
scene (12,685 tracked pedestrians, Δt = 0.08 s).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N}

The rollout is the reference's inference hot loop
(src/models/simulators.py:595-652): per frame — model forward over neighbor
features, lagged-Euler integration, waypoint advance, arrival retirement,
ground-truth spawn-in, full O(N²) neighbor rebuild.  Here the whole loop is
one jitted ``lax.scan`` on TPU.

``vs_baseline`` compares against the reference's PyTorch per-frame Python
loop measured by ``tools/measure_reference_baseline.py`` (cached in
``BASELINE_MEASURED.json``); the driver's north-star target is ≥100×.
"""

import json
import os
import time

GC_SCENE = (
    "/root/reference/data/GC_Dataset/"
    "GC_Dataset_ped1-12685_time1000-1060_interp9_xrange5-25_yrange15-35.npy"
)
BASELINE_FILE = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
ROLL_FRAMES = 250  # benchmark window (frames rolled after warmup)


def build_gc_data(cfg):
    from piml_tpu.data import make_time_indexed
    from piml_tpu.scene import Scene

    scene = Scene.load(GC_SCENE)
    return make_time_indexed(cfg, scene)


def main():
    import jax
    import jax.numpy as jnp

    from piml_tpu.config import PIMLConfig
    from piml_tpu.engine import engine_config, eval_rollout
    from piml_tpu.models import ModelSpec, build_model

    cfg = PIMLConfig(
        model="pinnsf_bm", dataset_name="gc2344", dropout=0.0,
        skip_frames=25,
    )
    data = build_gc_data(cfg)
    cfg = cfg.replace(
        ped_feature_dim=int(data.ped_features.shape[-1]),
        obs_feature_dim=int(data.obs_features.shape[-1]),
        self_feature_dim=int(data.self_features.shape[-1]),
        time_unit=data.time_unit,
    )

    spec = ModelSpec.from_config(cfg)
    model = build_model(spec)
    params = model.init(
        jax.random.PRNGKey(0), data.ped_features[0, :8],
        data.obs_features[0, :8], data.self_features[0, :8],
    )
    apply_fn = lambda p, pf, of, sf: model.apply(p, pf, of, sf)
    ecfg = engine_config(cfg, retire=True, track_collisions=False,
                         track_labels=False)

    t_start = cfg.skip_frames
    # cap the rolled window for a stable timing loop
    total = data.num_frames
    window = min(ROLL_FRAMES, total - t_start)
    sliced = jax.tree_util.tree_map(
        lambda x: x[: t_start + window]
        if hasattr(x, "shape") and x.shape and x.shape[0] == total else x,
        data,
    )

    # warmup / compile
    res = eval_rollout(params, apply_fn, ecfg, sliced, t_start)
    jax.block_until_ready(res.position)

    t0 = time.perf_counter()
    res = eval_rollout(params, apply_fn, ecfg, sliced, t_start)
    jax.block_until_ready(res.position)
    dt = time.perf_counter() - t0

    present_steps = float(jnp.sum(res.mask_p[t_start:]))
    n_slots = res.position.shape[1]
    # Both sides process all N dense slots per frame (the reference keeps all
    # 12,685 agents in its dense tensors too), so slots·frames/s is the
    # apples-to-apples architecture metric; present-agent throughput is
    # reported alongside.
    value = window * n_slots / dt

    vs_baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)
        if base.get("agent_steps_per_sec"):
            vs_baseline = value / base["agent_steps_per_sec"]

    print(json.dumps({
        "metric": "GC-12685 closed-loop rollout agent-steps/sec",
        "value": round(value, 1),
        "unit": "agent-steps/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "extra": {
            "frames": window,
            "agent_slots": n_slots,
            "wall_s": round(dt, 3),
            "present_agent_steps_per_sec": round(present_steps / dt, 1),
        },
    }))


if __name__ == "__main__":
    main()
