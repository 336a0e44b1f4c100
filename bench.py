"""Headline benchmark: the reference's build-random workload on TPU.

Reference numbers (BASELINE.md, README.md:136-140): building the IVF-PQ
database for 100,000 × 1536-d f32 random vectors (P=100, D=12, C=256) takes
**906.5 s** on an M1 Pro CPU. Driver target: <10 s on one v5e chip.

Prints exactly ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}
``vs_baseline`` is the speedup factor (reference_seconds / ours).
Diagnostics go to stderr.

Round-2 cold-start fixes (VERDICT.md "What's weak" #2):
* data prep runs ON DEVICE (`jax.random.normal` + normalize): host RNG for
  614 MB took 5–80 s depending on host load, plus a 614 MB device_put
  through the axon tunnel; the TPU generates and normalizes the corpus in
  milliseconds and the data never crosses the wire;
* every fence fetches a tiny device-side slice (`np.asarray(x[:1, :4])`),
  never the full array — a whole-array fetch through the tunnel previously
  stalled the benchmark for minutes;
* the JAX persistent compilation cache is enabled, so any process after the
  first skips XLA compilation entirely (the 86 s "compile+first build" was
  dominated by a cold XLA compile through the axon remote-compile tunnel).
"""

import functools
import json
import os
import sys
import time

import numpy as np

N, M, P, D, C = 100_000, 1536, 100, 12, 256
BASELINE_S = 906.5
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def wait_for_quiet_host() -> float:
    """Shared-host contention gate (see ``utils/quiet.py``): bounded
    wait until a fixed host matmul canary reads quiet, then proceed —
    a logged degraded number beats no number."""
    from flechasdb_tpu.utils.quiet import wait_for_quiet_host as go
    return go(log=log)


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: the second process pays ~0 compile.

    Applied before any compilation (shared helper: ``utils/cache.py``).
    """
    from flechasdb_tpu.utils.cache import enable_compilation_cache as go
    go(CACHE_DIR)


def main() -> None:
    import jax

    enable_compilation_cache()

    import jax.numpy as jnp

    from flechasdb_tpu.parallel.build import _build_step

    # First contact with the device pays tunnel/backend warm-up (observed
    # 30-100 s through axon on a loaded host); do it on a tiny op so the
    # phase timers below measure the workload, not the plumbing. The
    # remote TPU worker also goes UNAVAILABLE for minutes after a crash
    # (HBM OOM recovery ~10 min) — wait it out instead of failing the
    # whole benchmark on a transient.
    # jax caches a failed backend init for the life of the process, so the
    # availability probe runs in fresh subprocesses; the main process only
    # touches the device once a probe has succeeded. A failed init can
    # itself block ~25 min before raising UNAVAILABLE, so grant a minimum
    # attempt count rather than a pure deadline (and never kill a probe
    # mid-init — that wedges the tunnel further).
    import subprocess
    probe = [sys.executable, "-c",
             "import jax, numpy as np;"
             " np.asarray(jax.numpy.ones((8, 8)).sum())"]
    t0 = time.time()
    # Budget-based, not attempt-based: a probe against a wedged tunnel
    # itself blocks up to ~25 min before raising UNAVAILABLE, and worker
    # recovery after a crash has been observed to take over an hour —
    # keep probing until the budget is spent, then let the real op fail.
    PROBE_BUDGET_S = 45 * 60
    attempt = 0
    while True:
        attempt += 1
        r = subprocess.run(probe, capture_output=True)
        if r.returncode == 0:
            break
        elapsed = time.time() - t0
        if elapsed > PROBE_BUDGET_S:
            log(f"backend still unavailable after {elapsed:.0f}s "
                f"({attempt} probes); proceeding — the first op will "
                "surface the real error")
            break
        log(f"backend unavailable (probe attempt {attempt}, "
            f"{elapsed:.0f}s elapsed); retrying in 60s")
        time.sleep(60)
    # Proceed regardless: if the backend is still down, the tiny op below
    # surfaces the real error.
    t0 = time.time()
    _ = np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    log(f"backend warm-up (tiny op): {time.time() - t0:.2f}s")
    log(f"backend: {jax.default_backend()}  devices: {len(jax.devices())}")

    wait_for_quiet_host()

    # NOTE: sync points use host fetches of TINY device-side slices
    # (np.asarray(x[:1, :4])), not block_until_ready — the axon PJRT
    # plugin's block_until_ready does not actually block, and fetching a
    # full array pulls the whole buffer through the tunnel.
    @jax.jit
    def _prepare(key):
        v = jax.random.normal(key, (N, M), dtype=jnp.float32)
        return v / jnp.linalg.norm(v, axis=1, keepdims=True)

    t0 = time.time()
    xd = _prepare(jax.random.key(42))
    _ = np.asarray(xd[:1, :4])
    prep_s = time.time() - t0
    log(f"prepare {N}x{M} on device (incl. RNG compile): {prep_s:.2f}s "
        f"(reference host prep 0.912s)")

    # Warm-up compile on identical shapes. With the persistent cache this is
    # a disk hit after the first-ever run; cold it is one XLA compile
    # (production builds amortize it — the reference baseline likewise
    # excludes `cargo build`).
    t0 = time.time()
    warm = _build_step(xd, jax.random.key(1), p=P, d=D, c=C)
    _ = np.asarray(warm.partition_indices)
    compile_s = time.time() - t0
    log(f"compile+first build: {compile_s:.2f}s "
        f"(persistent cache at {CACHE_DIR})")

    # Median of 3 warm builds (VERDICT round-3 #2): a single sample cannot
    # distinguish tunnel variance from a real regression; the median of
    # three is robust to one bad dispatch while keeping the run short.
    samples = []
    for i in range(3):
        t0 = time.time()
        built = _build_step(xd, jax.random.key(42), p=P, d=D, c=C)
        pops = np.unique(np.asarray(built.partition_indices)).size
        samples.append(time.time() - t0)
        log(f"build[{i}]: {samples[-1]:.3f}s  ({pops}/{P} partitions "
            f"populated; reference 906.5s)")
    build_s = sorted(samples)[1]
    log(f"build median-of-3: {build_s:.3f}s  (samples: "
        + ", ".join(f"{s:.3f}" for s in samples) + ")")

    # Secondary diagnostics: warm batched query latency (k=10, nprobe=5)
    # through the production serving path (bucketed + Pallas lookup).
    from flechasdb_tpu.ops.bucketed import bucketize, query_bucketed
    q = xd[:64]
    buckets = bucketize(np.asarray(built.codes),
                        np.asarray(built.partition_indices), P)
    dists, rows, _ = query_bucketed(
        q, built.partition_centroids, built.codebooks, buckets,
        k=10, nprobe=5)
    _ = np.asarray(dists)
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        dists, rows, _ = query_bucketed(
            q, built.partition_centroids, built.codebooks, buckets,
            k=10, nprobe=5)
    _ = np.asarray(dists)  # dispatches pipeline; one fence at the end
    per_batch = (time.time() - t0) / reps
    log(f"warm query batch=64: {per_batch * 1e3:.2f} ms "
        f"({64 / per_batch:.0f} qps; "
        f"reference warm single query 1.48 ms)")

    # Single-query latency (VERDICT.md round-2 #5): batch=1 through the
    # production bucketed path — the number a serverless user comparing
    # against the reference README's 1.48 ms warm / 7.80 ms cold looks
    # for. "Cold" here is first dispatch of the compiled program with a
    # fresh query (no device-side caches warm); each rep fences.
    q1 = xd[:1]
    d1, _, _ = query_bucketed(q1, built.partition_centroids,
                              built.codebooks, buckets, k=10, nprobe=5)
    cold_1 = None
    t0 = time.time()
    _ = np.asarray(d1)
    cold_1 = time.time() - t0  # first-result fetch after warm compile
    lat = []
    for i in range(20):
        qi = xd[i:i + 1]
        t0 = time.time()
        di, _, _ = query_bucketed(qi, built.partition_centroids,
                                  built.codebooks, buckets, k=10, nprobe=5)
        _ = np.asarray(di)      # fence per query: true request latency
        lat.append(time.time() - t0)
    lat.sort()
    log(f"warm query batch=1: p50 {lat[len(lat)//2]*1e3:.2f} ms, "
        f"min {lat[0]*1e3:.2f} ms (reference warm 1.48 ms); "
        f"first-dispatch fetch {cold_1*1e3:.2f} ms "
        f"(reference cold 7.80 ms)")

    # Device-serial batch=1: the per-request fence above is dominated by
    # the axon tunnel round-trip (~26 ms), which the reference (measured
    # in-process on the serving host) never pays. Chain CHAIN dependent
    # single queries inside ONE program — query i+1 is perturbed by
    # (result i) * 1e-38, forcing serial on-device execution — so the
    # tunnel is crossed once and total/CHAIN is the true on-chip
    # single-query service time.
    CHAIN = 256
    qs = xd[:CHAIN]

    @functools.partial(jax.jit, static_argnames=("k", "nprobe"))
    def _serial_chain(qs, centroids, codebooks, buckets, *, k, nprobe):
        def body(carry, qi):
            di, ri, _ = query_bucketed(
                qi[None] + carry * 1e-38, centroids, codebooks, buckets,
                k=k, nprobe=nprobe)
            fin = jnp.sum(jnp.where(jnp.isfinite(di), di, 0.0))
            return fin, (di[0], ri[0])
        _, outs = jax.lax.scan(body, jnp.float32(0), qs)
        return outs

    outs = _serial_chain(qs, built.partition_centroids, built.codebooks,
                         buckets, k=10, nprobe=5)
    _ = np.asarray(outs[0][:1, :4])
    t0 = time.time()
    outs = _serial_chain(qs, built.partition_centroids, built.codebooks,
                         buckets, k=10, nprobe=5)
    _ = np.asarray(outs[0][:1, :4])
    per_q = (time.time() - t0) / CHAIN
    log(f"device-serial batch=1 ({CHAIN} chained queries, one dispatch): "
        f"{per_q*1e3:.3f} ms/query (reference warm 1.48 ms)")

    print(json.dumps({
        "metric": f"build {N//1000}k x {M} IVF-PQ (P={P}, D={D}, C={C})",
        "value": round(build_s, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / build_s, 1),
    }))


if __name__ == "__main__":
    main()
