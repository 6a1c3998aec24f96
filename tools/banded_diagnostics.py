"""Cell-list fallback observability for the banded pair kernel.

The banded selector (piml_tpu/ops/banded.py) proves exactness per frame
and silently falls back to the dense kernel when the proof fails — always
correct, but a scene that falls back every frame pays dense cost plus the
probe.  This tool rolls out a scene (or the synthetic stress scene) and
reports, per sampled frame, the exactness verdict of both passes plus the
window-utilization statistics that explain a refusal (band overflow vs
bound failure), so a mis-sized grid is visible instead of just slow.

Usage:
  python tools/banded_diagnostics.py                  # stress scene
  python tools/banded_diagnostics.py --scene PATH.npy [--frames 20]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=None,
                    help="v2.2 .npy scene (default: synthetic stress)")
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--sample_every", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from piml_tpu.engine import EngineConfig, init_state, rollout
    from piml_tpu.engine.rollout import SpawnFrame
    from piml_tpu.ops.banded import banded_params, topk_neighbors_banded
    from piml_tpu.physics import NeighborConfig, relative_features
    from piml_tpu.physics.features import heading_direction
    from bench import _model_and_cfg

    ncfg = NeighborConfig()
    T = args.frames
    if args.scene:
        from piml_tpu.scene import Scene

        scene = Scene.load(args.scene)
        pos = scene.position[0]
        vel = jnp.where(jnp.isnan(scene.velocity[0]), 0.0,
                        scene.velocity[0])
        n = pos.shape[0]
        acc = jnp.zeros((n, 2))
        wp = scene.waypoints[:1, :, :] if scene.waypoints.ndim == 3 else \
            scene.destination[:1]
        obstacles = scene.obstacles
        ds = jnp.full((n, 1), 1.34)
    else:
        n = 12685
        ks = jax.random.split(jax.random.PRNGKey(1), 4)
        pos = jax.random.uniform(ks[0], (n, 2)) * 200.0
        vel = jax.random.normal(ks[1], (n, 2))
        acc = jnp.zeros((n, 2))
        wp = jax.random.uniform(ks[2], (1, n, 2)) * 200.0
        obstacles = jax.random.uniform(ks[3], (4096, 2)) * 200.0
        ds = jnp.full((n, 1), 1.34)

    _, params, raw_apply = _model_and_cfg((6, 6, 7), 0.08)

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
    spawns = SpawnFrame(new=jnp.zeros((T, n)), p=zeros2, v=zeros2, a=zeros2,
                        dest=zeros2, dest_idx=jnp.zeros((T, n), jnp.int32),
                        hist_v=jnp.zeros((T, n, 2)))
    _, traj = rollout(params, apply_fn, ecfg, state, spawns, wp,
                      jnp.ones(n, jnp.int32), obstacles, ds)

    g_p, w_p = banded_params(n, n, ncfg.topk_ped, fine=True)
    m_pad = max(128, -(-obstacles.shape[0] // 128) * 128)
    g_o, w_o = banded_params(n, m_pad, ncfg.topk_obs, fine=True)
    print(f"agent pass: G={g_p} window={w_p}; "
          f"obstacle pass: G={g_o} window={w_o}")

    falls = 0
    checks = 0
    for t in range(0, T, args.sample_every):
        p = traj.p[t]
        v = jnp.where(jnp.isnan(traj.v[t]), 0.0, traj.v[t])
        h = heading_direction(v, time_axis=False)
        _, _, ex_a = topk_neighbors_banded(
            p, h, ncfg.topk_ped, ncfg.sight_angle_ped,
            dist_threshold=ncfg.dist_threshold_ped)
        _, _, ex_o = topk_neighbors_banded(
            p, h, ncfg.topk_obs, ncfg.sight_angle_obs, objects=obstacles,
            same_objects=False, dist_threshold=ncfg.dist_threshold_obs)
        n_valid = int(jnp.sum(jnp.all(jnp.isfinite(p), -1)))
        checks += 2
        falls += (not bool(ex_a)) + (not bool(ex_o))
        print(f"frame {t:4d}: valid={n_valid:6d} "
              f"agent_exact={bool(ex_a)} obstacle_exact={bool(ex_o)}")
    print(f"fallback rate: {falls}/{checks} sampled passes"
          + ("  <-- scene pays dense cost; check grid sizing" if falls
             else "  (banded fast path active)"))


if __name__ == "__main__":
    main()
