"""Shared-host contention canary for benchmarks.

The bench container shares a physical host. Round 4 observed repeated
multi-minute windows where EVERY host-driven phase — host-path queries,
serialization, and device timings too, since the dispatch loop is
host-driven — ran 3–50× slow, while the in-container load average read
~0. Numbers taken in such a window are upper bounds, not measurements.

``wait_for_quiet_host`` gates a benchmark's timed section on a fixed
host workload (min-of-5 1500² f32 numpy matmul, ~45–60 ms on this host
class when quiet): wait in 120 s steps while the canary exceeds
:data:`QUIET_CANARY_MS`, bounded by ``budget_s``, then proceed either
way — a logged degraded number beats no number. Callers print the
returned reading next to their results so a reviewer can judge
comparability.
"""

from __future__ import annotations

import time

import numpy as np

#: See module docstring; ~2× the quiet reading, so only gross (3×+)
#: contention trips it.
QUIET_CANARY_MS = 90.0


def host_canary_ms() -> float:
    """Min-of-5 wall time of a fixed host matmul, in ms."""
    a = np.random.default_rng(0).standard_normal((1500, 1500))
    a = a.astype(np.float32)
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        _ = a @ a
        best = min(best, time.time() - t0)
    return best * 1e3


def wait_for_quiet_host(budget_s: float = 1200.0, log=print) -> float:
    """Waits (bounded) for host contention to clear; returns the last
    canary reading in ms."""
    t0 = time.time()
    while True:
        c = host_canary_ms()
        if c <= QUIET_CANARY_MS or time.time() - t0 > budget_s:
            state = ("quiet" if c <= QUIET_CANARY_MS else
                     "DEGRADED — numbers are not comparable run to run")
            log(f"host canary: {c:.0f} ms ({state})")
            return c
        log(f"host canary {c:.0f} ms > {QUIET_CANARY_MS:.0f} ms "
            "(shared-host contention); waiting 120 s")
        time.sleep(120)
