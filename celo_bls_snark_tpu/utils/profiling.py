"""Stage timing + metrics registry (SURVEY.md §5 "tracing / profiling").

The reference leans on env_logger + criterion for its timing story
(crates/epoch-snark/examples/proof.rs:42-67 prints per-stage wall-clocks);
the TPU equivalent is (a) `stage(name)` wall-clock scopes that also sync
the device so a stage's time includes its dispatched work, and (b) an
optional `jax.profiler` trace for XProf when Config.profile_trace_dir is
set — that is the tool that shows MXU occupancy per kernel.

Metrics accumulate in a process-global registry; `report()` snapshots it
(bench.py-style JSON friendly).
"""

import json
import time
from contextlib import contextmanager

from .config import get_config

_METRICS: dict = {}


@contextmanager
def stage(name: str, sync=None, log: bool = False):
    """Time a named stage. `sync` (optional pytree) is block_until_ready'd
    before the clock stops so device work dispatched inside the scope is
    charged to it — on axon, prefer np.asarray on an output leaf instead."""
    cfg = get_config()
    trace_ctx = None
    if cfg.profile_trace_dir is not None:
        import jax.profiler

        trace_ctx = jax.profiler.TraceAnnotation(name)
        trace_ctx.__enter__()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        if trace_ctx is not None:
            trace_ctx.__exit__(None, None, None)
        ent = _METRICS.setdefault(name, {"calls": 0, "total_s": 0.0})
        ent["calls"] += 1
        ent["total_s"] += dt
        if log or cfg.profile:
            print(f"# stage {name}: {dt:.3f}s", flush=True)


def device_sync(tree) -> None:
    """Force completion of dispatched device work before a stage's clock
    stops. jax.block_until_ready RETURNS EARLY on the axon backend
    (measured round 5: 0.00s after dispatching a 1s MSM), silently
    charging device time to whatever host stage runs next; fetching one
    element of an output leaf does wait. Transfers 4 bytes."""
    import jax
    import numpy as np

    leaf = jax.tree.leaves(tree)[0]
    np.asarray(leaf[(slice(0, 1),) * leaf.ndim])


@contextmanager
def device_trace():
    """Whole-program XProf trace (Config.profile_trace_dir)."""
    cfg = get_config()
    if cfg.profile_trace_dir is None:
        yield
        return
    import jax.profiler

    with jax.profiler.trace(cfg.profile_trace_dir):
        yield


def add_metric(name: str, value: float) -> None:
    _METRICS[name] = {"value": value}


def report() -> dict:
    return {k: dict(v) for k, v in _METRICS.items()}


def report_json() -> str:
    return json.dumps(report(), sort_keys=True)


def reset() -> None:
    _METRICS.clear()
