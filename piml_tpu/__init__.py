"""piml_tpu — a TPU-native (JAX/XLA/Pallas) physics-infused crowd-simulation framework.

Re-designed from scratch with the capabilities of tsinghua-fib-lab/PIML
(KDD'22 "Physics-infused Machine Learning for Crowd Simulation"):

- ``scene``    — the v2.2 ``.npy`` scene codec and the fixed-capacity masked
                 :class:`~piml_tpu.scene.Scene` pytree (replaces the reference's
                 NaN-encoded dynamically grown torch tensors,
                 reference: src/data/data.py).
- ``physics``  — pure-function feature kernels: heading fill, pairwise relative
                 features with field-of-view top-k selection, collision
                 detection / labels, polar transforms, analytic social forces
                 (reference: src/data/data.py:343-601, src/utils/utils.py:31-100).
- ``models``   — the model zoo: MLP/ResDNN blocks, the PINNSF family, the
                 GNS-style Base* ablations and the discovered MLAPM symbolic
                 model (reference: src/models/model.py, src/models/mlapm.py).
- ``engine``   — the single jitted rollout engine: one ``lax.scan`` step shared
                 by training, evaluation and synthetic generation
                 (reference: src/models/simulators.py:556-832).
- ``train``    — optax training loops for pointwise pretraining and
                 differentiable multi-step finetuning with the full loss stack.
- ``data``     — dataset views (time-indexed / pointwise / channeled) and the
                 YAML-driven dataset orchestration (reference: src/data/dataset.py).
- ``metrics``  — masked MAE, jitted log-domain Sinkhorn OT, multi-kernel MMD,
                 collision counts (reference: src/functions/metrics.py).
- ``gen``      — procedural scenario library and the social-force synthetic
                 data generator (reference: src/data/scenarios.py).
- ``sr``       — symbolic-regression pipeline: message extraction, filtering
                 and force-law fitting (reference: src/symbolic_regression.py).
- ``exp``      — CLI entry points, YAML grid search, sweep runner with retry
                 (reference: src/main.py, src/run_experiments.py).
"""

__version__ = "0.2.0"

import os as _os

# PIML_PLATFORM=cpu|tpu|axon forces the JAX platform.  Needed because the
# ambient axon plugin re-sets jax_platforms at interpreter start, so the
# plain JAX_PLATFORMS env var cannot select CPU for CLI runs.
if _os.environ.get("PIML_PLATFORM"):
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["PIML_PLATFORM"])
    except Exception:
        pass

# Persistent XLA compilation cache: first compiles through the TPU tunnel run
# 10-500 s; cached reloads are instant.  Enabled by default only for TPU-like
# platforms (CPU AOT entries are machine-feature-sensitive and can SIGILL when
# reloaded on a different host).  Opt out with PIML_NO_COMPILE_CACHE=1 or
# force a dir with PIML_COMPILE_CACHE.
# Effective platform: PIML_PLATFORM wins (it overrides the plugin above), so
# a CPU-forced run must not touch the TPU cache (CPU AOT entries are
# machine-feature-sensitive and can SIGILL when reloaded elsewhere).
_platform = _os.environ.get("PIML_PLATFORM") or _os.environ.get("JAX_PLATFORMS", "")
if not _os.environ.get("PIML_NO_COMPILE_CACHE") and (
    _os.environ.get("PIML_COMPILE_CACHE")
    or any(p in _platform for p in ("tpu", "axon"))
):
    try:
        import jax as _jax

        # Key the cache dir by the client libtpu version: a rolling libtpu
        # upgrade otherwise serves stale AOT executables that the terminal
        # rejects with FAILED_PRECONDITION (seen in round 1's multichip run).
        try:
            from importlib.metadata import version as _pkg_version

            _libtpu = "libtpu" + _pkg_version("libtpu").replace(".", "_")
        except Exception:
            _libtpu = "libtpu_unknown"
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get(
                "PIML_COMPILE_CACHE", f"/tmp/piml_jax_cache_tpu_{_libtpu}"
            ),
        )
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        # persist EVERYTHING: on the axon tunnel even a sub-second compile
        # pays a ~0.5-1 s remote round trip, and a CLI run dispatches ~150
        # small one-off programs (stacking gathers, eager scalar ops) — at
        # the default 1.0 s threshold none of them were ever cached, so
        # every run re-paid ~60-100 s (compile_attrib_warm.json, round 5)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

from piml_tpu.config import PIMLConfig  # noqa: F401
