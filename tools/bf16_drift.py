"""bf16 rollout experiment (TODO.md): run the GC-window closed-loop rollout
with the NN branches in bfloat16 (params, goal force, integration stay f32)
and measure trajectory drift + speed vs the full-f32 path.

This is a TPU-native precision split the torch reference cannot express:
the edge MLPs ride the bf16 MXU while the physics stays f32.

Usage: python tools/bf16_drift.py  (TPU; ~2 min warm)
Writes bf16_drift.json at the repo root.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from piml_tpu.config import PIMLConfig
from piml_tpu.data import make_time_indexed
from piml_tpu.engine import engine_config
from piml_tpu.engine.simulator import eval_rollout
from piml_tpu.models import ModelSpec, build_model
from piml_tpu.scene import Scene
from piml_tpu.train import checkpoint_path, load_params

GC_SCENE = (
    "/root/reference/data/GC_Dataset/"
    "GC_Dataset_ped1-12685_time2344-2404_interp9_xrange5-25_yrange15-35.npy"
)
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FRAMES = 250


def build(compute_dtype: str):
    cfg = PIMLConfig(
        model="pinnsf_bm", dataset_name="gc2344", dropout=0.0, skip_frames=25,
        compute_dtype=compute_dtype,
        exp_name="piml-gc-paper", model_name_suffix="paper0",
        save_dir=os.path.join(ROOT, "saved_model"),
    )
    scene = Scene.load(GC_SCENE)
    data = make_time_indexed(cfg, scene)
    cfg = cfg.replace(
        ped_feature_dim=data.feature_dims[0],
        obs_feature_dim=data.feature_dims[1],
        self_feature_dim=data.feature_dims[2],
        time_unit=data.time_unit,
    )
    model = build_model(ModelSpec.from_config(cfg))
    return cfg, data, model


def run(compute_dtype: str, params=None):
    cfg, data, model = build(compute_dtype)
    if params is None:
        template = model.init(
            jax.random.PRNGKey(0), data.ped_features[:1, 0],
            data.obs_features[:1, 0], data.self_features[:1, 0],
        )
        ckpt = checkpoint_path(cfg, finetuned=False)
        if os.path.exists(ckpt):  # trained GC checkpoint when available
            params = load_params(ckpt, template)
        else:
            params = template
    apply_fn = lambda p, pf, of, sf: model.apply(p, pf, of, sf)
    ecfg = engine_config(cfg, retire=True, track_collisions=False,
                         track_labels=False)
    t_start = cfg.skip_frames
    total = data.num_frames
    window = min(FRAMES, total - t_start)
    sliced = jax.tree_util.tree_map(
        lambda x: x[: t_start + window]
        if hasattr(x, "shape") and x.shape and x.shape[0] == total else x,
        data,
    )

    roll = jax.jit(lambda p, d: eval_rollout(p, apply_fn, ecfg, d,
                                             t_start).position)
    out = np.asarray(roll(params, sliced))

    # timing: scan REPS whole rollouts into one host-synced scalar (a single
    # rollout costs less than the tunnel round trip)
    REPS = 20

    @jax.jit
    def timed(p, d):
        def body(c, _):
            pp = jax.tree_util.tree_map(lambda x: x + c * 1e-12, p)
            return c + 1.0, jnp.nansum(
                eval_rollout(pp, apply_fn, ecfg, d, t_start).position)
        _, outs = jax.lax.scan(body, 0.0, None, length=REPS)
        return jnp.sum(outs)

    float(timed(params, sliced))  # compile
    t0 = time.perf_counter()
    float(timed(params, sliced))
    dt = (time.perf_counter() - t0) / REPS
    return params, out, dt, window


def main():
    params, pos32, t32, window = run("")
    _, pos16, t16, _ = run("bfloat16", params=params)

    both = np.isfinite(pos32[..., 0]) & np.isfinite(pos16[..., 0])
    drift = np.linalg.norm(np.where(both[..., None], pos32 - pos16, 0.0),
                           axis=-1)
    mean_drift = float(drift[both].mean()) if both.any() else 0.0
    max_drift = float(drift[both].max()) if both.any() else 0.0
    presence_mismatch = int(
        (np.isfinite(pos32[..., 0]) != np.isfinite(pos16[..., 0])).sum()
    )

    result = {
        "frames": int(window),
        "mean_drift_m": mean_drift,
        "max_drift_m": max_drift,
        "presence_mismatch_cells": presence_mismatch,
        "f32_wall_s": t32,
        "bf16_wall_s": t16,
        "speedup": t32 / max(t16, 1e-9),
    }
    with open(os.path.join(ROOT, "bf16_drift.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
