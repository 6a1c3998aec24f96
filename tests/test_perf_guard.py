"""TPU performance regression guards (VERDICT r2 item 9).

These tests only run on a real TPU backend (the CI/virtual-CPU mesh skips
them): they pin the measured dense-stress rollout cost so edits to the
Pallas pair kernel / engine cannot silently regress the headline numbers.
Run manually with:  PIML_RUN_TPU_GUARDS=1 python -m pytest tests/test_perf_guard.py
(outside the CPU-forced conftest env, i.e. JAX_PLATFORMS unset).
"""

import os
import time

import pytest

# round-3 measured 1.98 ms/frame at N=12,685 (banded cell-list kernel,
# fine grid; 5.3 ms on the dense-kernel path); guard at ~2x headroom for
# tunnel noise
STRESS_MS_PER_FRAME_LIMIT = 4.0


def _on_tpu():
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    os.environ.get("PIML_RUN_TPU_GUARDS") != "1" or not _on_tpu(),
    reason="TPU perf guard: needs PIML_RUN_TPU_GUARDS=1 and a TPU backend",
)


def test_dense_stress_ms_per_frame_guard():
    import jax
    import jax.numpy as jnp

    from piml_tpu.engine import EngineConfig, init_state, rollout
    from piml_tpu.engine.rollout import SpawnFrame
    from piml_tpu.physics import NeighborConfig, relative_features

    n, T = 12685, 20
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    pos = jax.random.uniform(ks[0], (n, 2)) * 200.0
    vel = jax.random.normal(ks[1], (n, 2))
    acc = jnp.zeros((n, 2))
    wp = jax.random.uniform(ks[2], (1, n, 2)) * 200.0
    obstacles = jax.random.uniform(ks[3], (4096, 2)) * 200.0
    ds = jnp.full((n, 1), 1.34)

    ncfg = NeighborConfig()
    ecfg = EngineConfig(neighbor=ncfg, time_unit=0.08, lagged=True,
                        retire_on_arrival=True, remat=False)

    from bench import _model_and_cfg, measure_roundtrip

    _, params, raw_apply = _model_and_cfg((6, 6, 7), 0.08)

    # same bounded dynamics as bench.py's dense regime: untrained weights
    # diverge and empty the arena, which is the opposite of a dense stress
    def apply_fn(pr, pf, of, sf):
        out = raw_apply(pr, pf, of, sf)
        return out._replace(pred_acc=jnp.clip(out.pred_acc, -5.0, 5.0))
    pf, of, df = relative_features(pos, vel, acc, wp[0], obstacles, ncfg)
    sf = jnp.concatenate([df, vel, acc, ds], axis=-1)
    state = init_state(pos, vel, acc, wp[0], jnp.zeros(n, jnp.int32),
                       pf, of, sf)
    zeros2 = jnp.zeros((T, n, 2))
    spawns = SpawnFrame(new=jnp.zeros((T, n)), p=zeros2, v=zeros2, a=zeros2,
                        dest=zeros2, dest_idx=jnp.zeros((T, n), jnp.int32),
                        hist_v=jnp.zeros((T, n, 2)))

    run = jax.jit(lambda p, s: jnp.nansum(rollout(
        p, apply_fn, ecfg, s, spawns, wp, jnp.ones(n, jnp.int32),
        obstacles, ds)[1].p))
    rt = measure_roundtrip()
    float(run(params, state))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, state))
        best = min(best, time.perf_counter() - t0)
    ms_per_frame = max(best - rt, 1e-6) / T * 1e3
    assert ms_per_frame < STRESS_MS_PER_FRAME_LIMIT, (
        f"dense stress regressed: {ms_per_frame:.2f} ms/frame "
        f"(limit {STRESS_MS_PER_FRAME_LIMIT})"
    )


# round-3 measured 10.8 ms/step f32 (auto-fused BPTT at paper size);
# guard at ~2x headroom for tunnel noise
TRAIN_STEP_S_LIMIT = 0.022


def test_finetune_train_step_guard():
    from bench import bench_train_step, measure_roundtrip

    rt = measure_roundtrip()
    r = bench_train_step(rt)
    assert r["s_per_step"] < TRAIN_STEP_S_LIMIT, (
        f"finetune train step regressed: {r['s_per_step']*1e3:.2f} ms/step "
        f"(limit {TRAIN_STEP_S_LIMIT*1e3:.0f})"
    )


def test_banded_kernel_matches_dense_kernel_compiled():
    """Compiled (Mosaic, not interpret) banded cell-list vs dense kernel:
    identical arithmetic ⇒ threshold-masked results must be bit-identical,
    and the exactness flag must hold on the dense uniform scene."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from piml_tpu.ops.banded import topk_neighbors_banded
    from piml_tpu.ops.pairwise import topk_neighbors_pallas

    n = 12685
    ks = jax.random.split(jax.random.PRNGKey(3), 2)
    pos = jax.random.uniform(ks[0], (n, 2)) * 200.0
    h = jax.random.normal(ks[1], (n, 2))
    h = h / jnp.linalg.norm(h, axis=-1, keepdims=True)
    d_b, i_b, exact = topk_neighbors_banded(pos, h, 6, 90.0,
                                            dist_threshold=4.0)
    assert bool(exact)
    d_p, i_p = topk_neighbors_pallas(pos, h, 6, 90.0)
    d_b, i_b = np.asarray(d_b), np.asarray(i_b)
    d_p, i_p = np.asarray(d_p), np.asarray(i_p)
    in_thr = d_p <= 4.0
    assert ((d_b <= 4.0) == in_thr).all()
    assert (np.where(in_thr, d_b, 0) == np.where(in_thr, d_p, 0)).all()
    np.testing.assert_array_equal(i_b[in_thr], i_p[in_thr])
