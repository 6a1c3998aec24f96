"""A/B: channel-batched BPTT loop nesting at dense N (real TPU).

A (status quo): vmap(scan(step)) with the grid selector disabled — what
training_rollout_loss did for every channeled batch before
`channel_batched_bptt` (a per-channel lax.cond would degrade to select
under vmap, executing both the banded kernel AND its dense fallback).

B (new): scan(vmap(dynamics)) + one batched feature rebuild per frame
(engine.rollout.batched_rollout) — the banded O(N) selector's exactness
cond hoists above the channel axis, so the channeled differentiable
rollout gets the cell-list kernels.

Both sides run value_and_grad through the full BPTT window (the finetune
hot loop, reference src/models/simulators.py:659-832) on the synthetic
dense crowd used by bench.py's stress regime (bounded dynamics so the
crowd stays at GC density and the banded path stays on its exact branch).

Usage: python tools/ab_batched_bptt.py [--channels 4] [--frames 10]
Writes one JSON line; run on TPU (the tunnel round trip is amortized by
timing REPS identical grad steps inside one jitted scan).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=4)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--n", type=int, default=12685)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _model_and_cfg, measure_roundtrip
    from piml_tpu.engine import EngineConfig, init_state, rollout
    from piml_tpu.engine.rollout import SpawnFrame, batched_rollout
    from piml_tpu.physics import NeighborConfig, relative_features

    n, C, T = args.n, args.channels, args.frames
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 4)
    pos = jax.random.uniform(ks[0], (C, n, 2)) * 200.0
    vel = jax.random.normal(ks[1], (C, n, 2))
    acc = jnp.zeros((C, n, 2))
    wp = jax.random.uniform(ks[2], (1, n, 2)) * 200.0
    obstacles = jax.random.uniform(ks[3], (4096, 2)) * 200.0
    ds = jnp.full((n, 1), 1.34)
    dest_num = jnp.ones(n, jnp.int32)

    _, params, raw_apply = _model_and_cfg((6, 6, 7), 0.08)

    def apply_fn(pr, pf, of, sf):
        out = raw_apply(pr, pf, of, sf)
        return out._replace(pred_acc=jnp.clip(out.pred_acc, -5.0, 5.0))

    # training semantics: no retirement, remat on (the dense auto policy);
    # collision tracking off to isolate the feature/loop-nesting cost
    def ecfg(grid):
        return EngineConfig(
            neighbor=NeighborConfig(use_grid_topk=grid),
            time_unit=0.08, lagged=True, retire_on_arrival=False, remat=True,
        )

    # seed features channel-by-channel: a (C, N, M) dense batched pass
    # would materialize several multi-GB temporaries eagerly
    ncfg0 = NeighborConfig(use_grid_topk=False)
    seed = [relative_features(pos[i], vel[i], acc[i], wp[0], obstacles,
                              ncfg0) for i in range(C)]
    pf, of, df = (jnp.stack([s[j] for s in seed]) for j in range(3))
    sf = jnp.concatenate(
        [df, vel, acc, jnp.broadcast_to(ds[None], (C, n, 1))], axis=-1)
    states0 = jax.vmap(init_state)(
        pos, vel, acc, jnp.broadcast_to(wp[0][None], (C, n, 2)),
        jnp.zeros((C, n), jnp.int32), pf, of, sf)
    zeros2 = jnp.zeros((C, T, n, 2))
    spawns = SpawnFrame(
        new=jnp.zeros((C, T, n)), p=zeros2, v=zeros2, a=zeros2, dest=zeros2,
        dest_idx=jnp.zeros((C, T, n), jnp.int32),
        hist_v=jnp.zeros((C, T, n, 2)),
    )
    shared = (wp, dest_num, obstacles, ds)

    def loss_vmapped(p):
        outs = jax.vmap(
            lambda s, sp: rollout(p, apply_fn, ecfg(False), s, sp, *shared)[1]
        )(states0, spawns)
        return jnp.nansum(outs.p ** 2) * 1e-6

    def loss_batched(p):
        outs = batched_rollout(p, apply_fn, ecfg(True), states0, spawns,
                               *shared)[1]
        return jnp.nansum(outs.p ** 2) * 1e-6

    roundtrip = measure_roundtrip()
    results = {}
    for name, loss_fn in [("vmapped_dense", loss_vmapped),
                          ("batched_banded", loss_batched)]:
        @jax.jit
        def run(p, loss_fn=loss_fn):
            def body(c, _):
                l, g = jax.value_and_grad(loss_fn)(p)
                gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
                return c + l + gsum, None
            return jax.lax.scan(body, 0.0, None, length=args.reps)[0]

        t0 = time.time()
        v0 = float(run(params))
        compile_s = time.time() - t0
        t0 = time.time()
        float(run(params))
        dt = max(time.time() - t0 - roundtrip, 1e-6)
        results[name] = {
            "s_per_grad_step": dt / args.reps,
            "loss_plus_gsum": v0,
            "compile_s": compile_s,
        }

    a = results["vmapped_dense"]["s_per_grad_step"]
    b = results["batched_banded"]["s_per_grad_step"]
    out = {
        "n_agents": n, "channels": C, "bptt_frames": T,
        "vmapped_dense_s": a, "batched_banded_s": b,
        "speedup": a / b,
        "note": "grad step through T-frame BPTT; collision tracking off; "
                "bounded dynamics (bench.py stress regime)",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
