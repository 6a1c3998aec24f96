"""Child process for test_distributed: one simulated host of a 2-process
JAX runtime (4 virtual CPU devices each → global 8-device mesh), running
the SAME DP finetune step the single-host path uses.

Usage: python _dist_child.py <process_id> <coordinator_port>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["PIML_NO_COMPILE_CACHE"] = "1"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    pid, port = int(sys.argv[1]), int(sys.argv[2])
    import jax

    jax.config.update("jax_platforms", "cpu")

    from piml_tpu.parallel.distributed import init_distributed, is_multi_host

    assert init_distributed(f"127.0.0.1:{port}", 2, pid)
    assert is_multi_host()
    assert jax.process_count() == 2
    assert jax.device_count() == 8
    assert jax.local_device_count() == 4

    import __graft_entry__ as ge
    from piml_tpu.models import ModelSpec, build_finetune_model
    from piml_tpu.parallel import (
        make_dp_finetune_step,
        make_mesh,
        replicate,
        shard_channeled_batch,
    )
    from piml_tpu.train.trainer import make_optimizer

    cfg = ge._tiny_cfg().replace(ft_batch_size=8)
    mesh = make_mesh(8)
    key = jax.random.PRNGKey(0)
    batch = ge._tiny_batchdata(cfg, key)
    spec = ModelSpec.from_config(cfg)
    model = build_finetune_model(spec)
    params = model.init(key, batch.ped_features[0, 0],
                        batch.obs_features[0, 0], batch.self_features[0, 0])
    tx = make_optimizer(cfg, finetune=True)
    opt_state = tx.init(params)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    batch = shard_channeled_batch(batch, mesh)
    apply_fn = lambda p, pf, of, sf: model.apply(p, pf, of, sf)  # noqa: E731
    step = make_dp_finetune_step(cfg, apply_fn, tx, mesh)
    params2, _, out = step(params, opt_state, batch)
    jax.block_until_ready(params2)
    print(f"DIST_LOSS {pid} {float(out.loss)!r}", flush=True)

    # the agent-axis ring pair pass (multi-chip rollout path): ppermute
    # rides the cross-process backend; must match the local dense pass
    import jax.numpy as jnp

    from piml_tpu.data.views import neighbor_config
    from piml_tpu.parallel import sharded_relative_features
    from piml_tpu.physics.features import heading_direction, relative_features

    n = 64
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    pos = jax.random.normal(keys[0], (n, 2)) * 5
    vel = jax.random.normal(keys[1], (n, 2))
    acc = jax.random.normal(keys[2], (n, 2)) * 0.2
    dest = jax.random.normal(keys[3], (n, 2)) * 8
    obstacles = jnp.full((4, 2), 1e4)
    ncfg = neighbor_config(cfg)
    heading = heading_direction(vel, time_axis=False)
    ped_1, _, _ = relative_features(pos, vel, acc, dest, obstacles, ncfg,
                                    heading=heading)
    ped_n, _, _ = sharded_relative_features(pos, vel, acc, dest, obstacles,
                                            ncfg, mesh, axis="dp")
    err = float(jnp.max(jnp.abs(jnp.sort(ped_n, axis=1)
                                - jnp.sort(ped_1, axis=1))))
    print(f"DIST_RING_ERR {pid} {err!r}", flush=True)


if __name__ == "__main__":
    main()
