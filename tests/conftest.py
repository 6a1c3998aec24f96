"""Test config: run JAX on a virtual 8-device CPU mesh so sharding paths are
exercised without TPU hardware (the driver separately dry-runs multichip)."""

import os

TPU_GUARDS = os.environ.get("PIML_RUN_TPU_GUARDS") == "1"

os.environ["PIML_FEATURE_CACHE"] = "0"  # tests always rebuild features
if not TPU_GUARDS:
    os.environ["JAX_PLATFORMS"] = "cpu"  # force off any ambient TPU platform
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_GUARDS:
    # The axon plugin overrides JAX_PLATFORMS at import; force CPU
    # programmatically so the 8-device virtual mesh is available.  The CPU
    # test cache is kept separate from the TPU cache (CPU AOT entries are
    # machine-feature-sensitive).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/piml_jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

TOY = "/root/reference/data/GC_Dataset/GC_Dataset_toy1.npy"


def pytest_collection_modifyitems(config, items):
    """PIML_RUN_TPU_GUARDS=1 points the session at the live TPU chip — it is
    only meant for `pytest tests/test_perf_guard.py`.  Refuse to run the
    rest of the suite against the chip (8-device tests would skip and a
    concurrent TPU experiment could be stalled)."""
    if TPU_GUARDS:
        offenders = {i.fspath.basename for i in items
                     if i.fspath.basename != "test_perf_guard.py"}
        if offenders:
            raise pytest.UsageError(
                "PIML_RUN_TPU_GUARDS=1 runs tests on the real TPU; invoke "
                "it only with tests/test_perf_guard.py (collected: "
                + ", ".join(sorted(offenders)) + ")"
            )


@pytest.fixture(scope="session")
def toy_path():
    if not os.path.exists(TOY):
        pytest.skip("reference toy dataset not available")
    return TOY


@pytest.fixture(scope="session")
def toy_paths():
    base = "/root/reference/data/GC_Dataset"
    if not os.path.isdir(base):
        pytest.skip("reference toy dataset not available")
    return [os.path.join(base, f"GC_Dataset_toy{i}.npy") for i in (1, 2, 3)]


@pytest.fixture()
def rng():
    return np.random.RandomState(0)
