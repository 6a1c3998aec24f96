"""The driver's multichip dry run must survive a hostile caller environment
(VERDICT r2 item 1): JAX already initialized in-process, JAX_PLATFORMS
poisoned toward a TPU plugin, stale compile-cache knobs set.  The entry
re-execs into a scrubbed CPU-only subprocess, so all of that must be
inert."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_scrubbed_env_strips_tpu_state():
    sys.path.insert(0, REPO)
    import __graft_entry__ as entry

    os.environ["PIML_TEST_LIBTPU_INIT_ARGS"] = "poison"
    try:
        env = entry._scrubbed_cpu_env(8)
    finally:
        del os.environ["PIML_TEST_LIBTPU_INIT_ARGS"]
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["XLA_FLAGS"] == "--xla_force_host_platform_device_count=8"
    assert env["PIML_DRYRUN_CHILD"] == "1"
    assert "PIML_TEST_LIBTPU_INIT_ARGS" not in env
    assert "JAX_COMPILATION_CACHE_DIR" not in env


@pytest.mark.slow
def test_dryrun_survives_poisoned_ambient_env():
    """Simulate the driver's worst case: the calling process has a live JAX
    backend (pytest initialized CPU long ago) AND the environment points
    JAX at a nonexistent TPU plugin with a poisoned compile cache.  The
    re-exec'd child must still come up on the virtual CPU mesh and pass."""
    import jax

    jax.devices()  # ensure a backend is live in THIS process

    saved = {k: os.environ.get(k) for k in
             ("JAX_PLATFORMS", "JAX_COMPILATION_CACHE_DIR", "TPU_CHIPS")}
    os.environ["JAX_PLATFORMS"] = "tpu"  # would fail: no TPU here
    os.environ["JAX_COMPILATION_CACHE_DIR"] = "/nonexistent/poisoned"
    os.environ["TPU_CHIPS"] = "8"
    try:
        sys.path.insert(0, REPO)
        import __graft_entry__ as entry

        entry.dryrun_multichip(8)  # raises on failure
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


@pytest.mark.slow
def test_dryrun_cli_matches_driver_invocation():
    """The driver invokes dryrun_multichip via a fresh interpreter; exercise
    that exact call shape end-to-end."""
    code = ("import sys; sys.path.insert(0, %r); import __graft_entry__; "
            "__graft_entry__.dryrun_multichip(8)") % REPO
    proc = subprocess.run([sys.executable, "-c", code], timeout=900,
                          capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ok" in proc.stdout
