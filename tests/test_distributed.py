"""Multi-host (multi-process) data-parallel training, simulated with two
local processes of 4 virtual CPU devices each (SURVEY §5 distributed item).

The reference is strictly single-node (nn.DataParallel); piml_tpu's
multi-host path is ``parallel/distributed.py::init_distributed`` +
the SAME mesh/sharding helpers used single-host — XLA's collectives ride
the gloo cross-process backend here exactly as they would ride DCN on a
pod.  The test asserts the 2-process global-mesh finetune step produces
the SAME loss as the single-process 8-device mesh."""

import os
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
CHILD = os.path.join(HERE, "_dist_child.py")


def _scrubbed_env():
    """Reuse the dry-run entry's scrub (one maintained poison-var list)."""
    sys.path.insert(0, os.path.dirname(HERE))
    import __graft_entry__ as ge

    env = ge._scrubbed_cpu_env(4)
    # children of this test manage their own platform/flag setup
    for k in ("JAX_PLATFORMS", "XLA_FLAGS", "PIML_NO_COMPILE_CACHE",
              "PIML_DRYRUN_CHILD"):
        env.pop(k, None)
    return env


def _single_process_loss():
    """The same step on this process's own 8-device virtual mesh."""
    import jax

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
    model = build_finetune_model(ModelSpec.from_config(cfg))
    params = model.init(key, batch.ped_features[0, 0],
                        batch.obs_features[0, 0], batch.self_features[0, 0])
    tx = make_optimizer(cfg, finetune=True)
    opt_state = tx.init(params)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    batch = shard_channeled_batch(batch, mesh)
    apply_fn = lambda p, pf, of, sf: model.apply(p, pf, of, sf)  # noqa: E731
    step = make_dp_finetune_step(cfg, apply_fn, tx, mesh)
    _, _, out = step(params, opt_state, batch)
    return float(out.loss)


@pytest.mark.slow
def test_two_process_dp_matches_single_process():
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")

    port = 9300 + os.getpid() % 500
    env = _scrubbed_env()
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(pid), str(port)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    losses, ring_errs = {}, {}
    for pid, proc in enumerate(procs):
        out, err = proc.communicate(timeout=600)
        assert proc.returncode == 0, (
            f"distributed child {pid} failed:\n{out}\n{err}"
        )
        for line in out.splitlines():
            if line.startswith("DIST_LOSS"):
                _, p, v = line.split()
                losses[int(p)] = float(v)
            elif line.startswith("DIST_RING_ERR"):
                _, p, v = line.split()
                ring_errs[int(p)] = float(v)
    assert set(losses) == {0, 1}, f"missing child losses: {losses}"
    # cross-process ring-sharded pair pass matches the dense local pass
    assert set(ring_errs) == {0, 1} and max(ring_errs.values()) < 1e-4, (
        f"ring pair pass diverged across processes: {ring_errs}"
    )
    # both processes hold the identical replicated result
    assert losses[0] == losses[1]
    np.testing.assert_allclose(losses[0], _single_process_loss(), rtol=1e-6)
