"""Timing utilities matching the reference's benchmark methodology.

Conventions preserved so numbers are comparable (SURVEY §5 tracing):
* epoch wallclock with warmup-skip (3 epochs full-graph
  ``main_dgl_citation_sage.py:211-222``; 5 for sampling
  ``ns-sage-dgl.py:181-182``),
* phase-split timers (load/forward/backward, ``cluster-sage/dgl/main.py:126-165``),
* op timers with cold-start skip (``kernel/utils.py:18-34``).

On TPU, async dispatch means wallclock must bracket ``block_until_ready``
(the analogue of the reference's ``th.cuda.synchronize``).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List

import jax

__all__ = ["EpochTimer", "PhaseTimer", "op_time", "time_fn", "chip_health_ms",
           "warm_readback"]


def warm_readback() -> float:
    """Establish the device→host readback path with one tiny fetch; returns
    the seconds it took.

    The shared-pool tunnel charges ~60 s for a process's FIRST readback when
    it lands after a queued dispatch burst — which is exactly where a
    training driver's first ``float(loss)`` sits — but only ~1.3 s for an
    immediate tiny fetch at startup (measured 2026-08-20: tiny-first 1.3 s
    then post-burst fetch 1.1 s, vs no-warm first fetch 58 s). Call once
    right after backend selection and before any real dispatch: it prepays
    the tax outside the timed region and defuses the pool's
    ``readback hang`` kill mode (DESIGN_NOTES §7a) for the big rows."""
    import jax.numpy as jnp

    t0 = time.time()
    float(jnp.asarray(1.0) + 1.0)
    return time.time() - t0


def chip_health_ms(reps: int = 5) -> float:
    """Known-cost reference op (4k bf16 matmul ≈ 1ms on a healthy v5e) —
    the shared TPU pool behind this environment's tunnel degrades up to
    ~100× under contention, so benchmarks gate on this probe."""
    import jax.numpy as jnp

    a = jnp.ones((4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda a, c: jnp.sum((a + c) @ a) * 1e-30 + c)
    c = mm(a, jnp.bfloat16(0))
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(reps):
        c = mm(a, c)
    float(jnp.asarray(c, jnp.float32))
    return (time.perf_counter() - t0) / reps * 1000


class EpochTimer:
    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.durations: List[float] = []
        self._epoch = 0
        self._t0 = None

    def start(self):
        if self._epoch >= self.warmup:
            self._t0 = time.perf_counter()

    def stop(self, *sync_arrays):
        for a in sync_arrays:
            jax.block_until_ready(a)
        if self._t0 is not None:
            self.durations.append(time.perf_counter() - self._t0)
            self._t0 = None
        self._epoch += 1

    @property
    def mean(self) -> float:
        return sum(self.durations) / max(len(self.durations), 1)


class PhaseTimer:
    """Accumulate wallclock per named phase within an epoch loop."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)

    @contextlib.contextmanager
    def phase(self, name: str, *sync_on_exit):
        t0 = time.perf_counter()
        yield
        for a in sync_on_exit:
            jax.block_until_ready(a)
        self.totals[name] += time.perf_counter() - t0

    def summary(self) -> str:
        return ", ".join(f"{k}: {v:.4f}s" for k, v in self.totals.items())


@contextlib.contextmanager
def op_time(out: List[float]):
    """Context manager appending elapsed seconds (device-synced) to ``out``."""
    t0 = time.perf_counter()
    holder = {}
    yield holder
    if "result" in holder:
        jax.block_until_ready(holder["result"])
    out.append(time.perf_counter() - t0)


def time_fn(fn, *args, reps: int = 10, warmup: int = 2) -> float:
    """Average seconds per call, cold-start skipped (``kernel/dgl-new.py:18-23``)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps
