"""Characterize the finetune train step's latency/compute regimes on the TPU
(VERDICT r2 item 3).

Sweeps channel-batch width C (windows per step), remat on/off, and model
width at fixed GC-window data, reporting s/step, windows/s and achieved
TFLOP/s from XLA cost analysis.  The paper step (C=32, enc128) is latency-
bound; this maps where the engine becomes compute-bound.

Writes train_step_scaling.json at the repo root.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GC_SCENE = (
    "/root/reference/data/GC_Dataset/"
    "GC_Dataset_ped1-12685_time2104-2164_interp9_xrange5-25_yrange15-35.npy"
)
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "train_step_scaling.json")
V5E_PEAK_BF16 = 197e12


def measure_roundtrip():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda v: jnp.sum(v) * 2)
    x = jnp.ones(8)
    float(f(x))
    t0 = time.perf_counter()
    for _ in range(10):
        float(f(x))
    return (time.perf_counter() - t0) / 10


def bench_one(data, C, width, remat, roundtrip_s, steps=10, reps=3,
              dtype="float32", probe_cache=None):
    import jax
    import jax.numpy as jnp
    import optax

    from piml_tpu.config import PIMLConfig
    from piml_tpu.data.views import to_channeled
    from piml_tpu.engine.simulator import training_rollout_loss
    from piml_tpu.models import ModelSpec, build_finetune_model
    from piml_tpu.train.trainer import make_optimizer

    cfg = PIMLConfig(
        model="pinnsf_bm", dataset_name="gc2344", dropout=0.0, skip_frames=25,
        valid_steps=10, ft_batch_size=C, learning_rate=2e-4,
        weight_decay=1e-6, finetune_lr_decay=0.02,
        collision_pred_weight=5e-2, collision_loss_weight=200.0,
        collision_focus_weight=1.0, hard_collision_penalty=2.0,
        time_decay=0.9, reg_weight=1e-2, collision_loss_version="v2",
        encoder_hidden_size=width, processor_hidden_size=width,
        decoder_hidden_size=width // 2,
        remat_features=remat, compute_dtype=dtype,
        ped_feature_dim=data.feature_dims[0],
        obs_feature_dim=data.feature_dims[1],
        self_feature_dim=data.feature_dims[2],
        time_unit=data.time_unit,
    )
    ch = to_channeled(data, cfg.valid_steps, "slice")
    idx = np.arange(C) % ch.num_channels
    batch = ch.slice_channels(idx)

    model = build_finetune_model(ModelSpec.from_config(cfg))
    params = model.init(
        jax.random.PRNGKey(0), batch.ped_features[0, 0],
        batch.obs_features[0, 0], batch.self_features[0, 0],
    )
    apply_fn = lambda p, pf, of, sf: model.apply(p, pf, of, sf)
    tx = make_optimizer(cfg, finetune=True)
    opt_state = tx.init(params)

    def step(params, opt_state, b):
        def loss_fn(p):
            return training_rollout_loss(p, apply_fn, cfg, b).loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def run(params, opt_state, b):
        def body(carry, _):
            p, o = carry
            p, o, loss = step(p, o, b)
            return (p, o), loss

        (_, _), losses = jax.lax.scan(body, (params, opt_state), None,
                                      length=steps)
        return jnp.sum(losses)

    # XLA cost_analysis counts a scan body once (and DCEs the backward pass
    # at trip count 1), so cost-analyze a single un-scanned step with the
    # BPTT rollout fully unrolled — the algorithmic flops of one train step
    probe_cfg = cfg.replace(remat_features=False,
                            bptt_unroll=int(batch.num_frames))

    def probe_step(params, opt_state, b):
        def loss_fn(p):
            return training_rollout_loss(p, apply_fn, probe_cfg, b).loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, o = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), o, loss

    # algorithmic flops are exactly linear in C, so a failed probe compile
    # (the tunnel compile helper dies on very large unrolled programs)
    # falls back to scaling from a smaller-C probe of the same model
    pkey = (width, dtype)
    try:
        cost = (jax.jit(probe_step).lower(params, opt_state, batch)
                .compile().cost_analysis())
        flops_step = float(cost.get("flops", 0.0)) if cost else 0.0
        if probe_cache is not None and flops_step:
            probe_cache.setdefault(pkey, (C, flops_step))
    except Exception as e:
        base = (probe_cache or {}).get(pkey)
        if base is None:
            raise
        flops_step = base[1] * C / base[0]
        print(f"  (probe compile failed at C={C}: {e!r:.120}; "
              f"scaled flops from C={base[0]})", flush=True)
    flops_total = flops_step * steps

    float(run(params, opt_state, batch))  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(params, opt_state, batch))
        best = min(best, time.perf_counter() - t0)
    dt = max(best - roundtrip_s, 1e-6)
    per_step = dt / steps
    fps = flops_total / dt
    return {
        "C": C, "width": width, "remat": remat, "dtype": dtype,
        "s_per_step": per_step,
        "windows_per_s": C / per_step,
        "flops_per_step": flops_total / steps,
        "achieved_tflops": fps / 1e12,
        "mfu_vs_bf16_peak": fps / V5E_PEAK_BF16,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    cli = ap.parse_args()

    from piml_tpu.config import PIMLConfig
    from piml_tpu.data import make_time_indexed
    from piml_tpu.scene import Scene

    rt = measure_roundtrip()
    print(f"roundtrip {rt*1e3:.1f} ms", flush=True)

    scene = Scene.load(GC_SCENE)
    data = make_time_indexed(
        PIMLConfig(model="pinnsf_bm", dataset_name="gc2344", skip_frames=25),
        scene)

    grid = [
        (32, 128, True, "float32"),    # paper step (round-2 bench point)
        (32, 128, False, "float32"),   # remat off
        (128, 128, False, "float32"),
        (512, 128, False, "float32"),  # compute-dense batch
        (32, 512, False, "float32"),   # wide model (also the probe anchor
                                       # for the C=512 wide rows below)
        (512, 512, False, "float32"),  # compute-dense batch + wide model
        (32, 512, False, "bfloat16"),  # bf16 probe anchor
        (512, 512, False, "bfloat16"),  # + bf16 MXU path
    ]
    if cli.quick:
        grid = grid[:2]

    rows = []
    probe_cache = {}
    for C, width, remat, dtype in grid:
        try:
            r = bench_one(data, C, width, remat, rt, dtype=dtype,
                          probe_cache=probe_cache)
        except Exception as e:  # keep the sweep alive past one bad config
            r = {"C": C, "width": width, "remat": remat, "dtype": dtype,
                 "error": repr(e)[:300]}
        rows.append(r)
        print(json.dumps(r), flush=True)

    with open(os.path.abspath(OUT), "w") as f:
        json.dump({"roundtrip_ms": rt * 1e3, "rows": rows}, f, indent=2)
    print("wrote", os.path.abspath(OUT))


if __name__ == "__main__":
    main()
