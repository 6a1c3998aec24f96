"""Compile-cost attribution via jax.monitoring events.

The finetune wall at the GC paper shape was ~90% one-time setup/compile
(epoch_breakdown.json: steady epoch 2.9 s vs first epoch 105.9 s).  This
module attributes that term into the phases the monitoring stream exposes:

- ``/jax/core/compile/jaxpr_trace_duration``          — Python tracing
- ``/jax/core/compile/jaxpr_to_mlir_module_duration``  — jaxpr -> StableHLO
- ``/jax/core/compile/backend_compile_duration``       — XLA compile proper
  (on the axon platform this includes the tunnel compile-helper round trip)
- ``/jax/compilation_cache/cache_hits`` / ``cache_misses`` — persistent-cache
  behavior per program
- ``/jax/compilation_cache/cache_retrieval_time_sec``   — deserialize cost of
  each persistent-cache hit

Everything not covered by those events (device transfers, host-side numpy,
checkpoint IO) shows up as the residual against the wall clock.

Usage::

    from piml_tpu.utils.compile_attrib import CompileAttribution
    with CompileAttribution() as attrib:
        ...build + run jitted programs...
    print(attrib.summary())

The listener API is global in JAX, so nesting is not supported; the
collector is cheap enough to leave installed for a whole CLI run.
"""

from __future__ import annotations

import threading
import time
from typing import Any, Dict, Optional

from jax import monitoring

_TRACE = "/jax/core/compile/jaxpr_trace_duration"
_LOWER = "/jax/core/compile/jaxpr_to_mlir_module_duration"
_COMPILE = "/jax/core/compile/backend_compile_duration"
_RETRIEVE = "/jax/compilation_cache/cache_retrieval_time_sec"
_HIT = "/jax/compilation_cache/cache_hits"
_MISS = "/jax/compilation_cache/cache_misses"


class CompileAttribution:
    """Accumulates compile-phase durations + persistent-cache counters."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.durations: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        # per-program: {fun_name: {event: seconds}}
        self.per_program: Dict[str, Dict[str, float]] = {}
        self.phases: Dict[str, Dict[str, Any]] = {}
        self._phase_base: Dict[str, float] = {}
        self._phase_t0 = 0.0
        self._t0 = 0.0
        self.wall_s = 0.0
        self._installed = False

    # -- listeners ---------------------------------------------------------
    def _on_duration(self, event: str, duration: float, **kw: Any) -> None:
        with self._lock:
            self.durations[event] = self.durations.get(event, 0.0) + duration
            self.counts[event] = self.counts.get(event, 0) + 1
            name = kw.get("fun_name")
            if name:
                prog = self.per_program.setdefault(str(name), {})
                prog[event] = prog.get(event, 0.0) + duration

    def _on_event(self, event: str, **kw: Any) -> None:
        with self._lock:
            self.counts[event] = self.counts.get(event, 0) + 1

    # -- lifecycle ---------------------------------------------------------
    def __enter__(self) -> "CompileAttribution":
        global _ACTIVE
        monitoring.register_event_duration_secs_listener(self._on_duration)
        monitoring.register_event_listener(self._on_event)
        self._installed = True
        self._t0 = self._phase_t0 = time.time()
        _ACTIVE = self
        return self

    def __exit__(self, *exc: Any) -> None:
        global _ACTIVE
        self.wall_s = time.time() - self._t0
        if self._installed:
            monitoring.unregister_event_duration_listener(self._on_duration)
            monitoring.unregister_event_listener(self._on_event)
            self._installed = False
        if _ACTIVE is self:
            _ACTIVE = None

    # -- phase marks --------------------------------------------------------
    def mark(self, name: str) -> Dict[str, Any]:
        """Close the current phase under ``name``: record the delta of every
        duration/count since the previous mark plus the phase wall time."""
        now = time.time()
        with self._lock:
            delta_d = {k: round(v - self._phase_base.get("d:" + k, 0.0), 3)
                       for k, v in self.durations.items()
                       if v - self._phase_base.get("d:" + k, 0.0) > 1e-4}
            delta_c = {k: v - int(self._phase_base.get("c:" + k, 0))
                       for k, v in self.counts.items()
                       if v - self._phase_base.get("c:" + k, 0)}
            phase = {"wall_s": round(now - self._phase_t0, 3),
                     "durations": delta_d, "counts": delta_c}
            self.phases[name] = phase
            self._phase_base = {**{"d:" + k: v for k, v in self.durations.items()},
                                **{"c:" + k: v for k, v in self.counts.items()}}
            self._phase_t0 = now
        return phase

    # -- report ------------------------------------------------------------
    def snapshot(self) -> Dict[str, Any]:
        with self._lock:
            return {"durations": dict(self.durations),
                    "counts": dict(self.counts)}

    def summary(self) -> Dict[str, Any]:
        d, c = self.durations, self.counts
        wall = self.wall_s or (time.time() - self._t0)
        attributed = (d.get(_TRACE, 0.0) + d.get(_LOWER, 0.0)
                      + d.get(_COMPILE, 0.0))
        return {
            "wall_s": round(wall, 3),
            "trace_s": round(d.get(_TRACE, 0.0), 3),
            "lower_s": round(d.get(_LOWER, 0.0), 3),
            "backend_compile_s": round(d.get(_COMPILE, 0.0), 3),
            "cache_retrieval_s": round(d.get(_RETRIEVE, 0.0), 3),
            "n_programs_traced": c.get(_TRACE, 0),
            "n_backend_compiles": c.get(_COMPILE, 0),
            "cache_hits": c.get(_HIT, 0),
            "cache_misses": c.get(_MISS, 0),
            "unattributed_s": round(wall - attributed, 3),
            "phases": dict(self.phases),
            "per_program": {
                name: {k.rsplit("/", 1)[-1]: round(v, 3)
                       for k, v in evs.items()}
                for name, evs in sorted(
                    self.per_program.items(),
                    key=lambda kv: -sum(kv[1].values()))[:20]
            },
        }


# Module-level active collector: the trainer phase-marks through this so
# instrumentation is zero-cost when no collector is installed.
_ACTIVE: Optional[CompileAttribution] = None


def mark(name: str) -> None:
    if _ACTIVE is not None:
        _ACTIVE.mark(name)
