"""Sharded paths on REAL TPU hardware (1-device mesh).

Only one physical chip is attached to this container, so multi-chip
speedups cannot be measured — but a 1-device ``jax.sharding.Mesh`` still
exercises the EXACT sharded programs (`shard_map` + `psum`/`all_gather`)
with the Mosaic kernels lowered for real hardware, which the virtual
CPU mesh (`benchmarks/deep_sharded.py`) cannot do. This answers the one
question the CPU mesh leaves open: does the sharded build actually run
the fused Pallas Lloyd kernel on TPU at single-chip speed, or silently
fall back to the 15×-slower XLA formulation? (VERDICT round-2 #1
done-criterion.)

Workload: the headline shape (100k × 1536, P=100, D=12, C=256 —
`bench.py`, reference 906.5 s). Prints JSON lines to stdout:
  single-chip build, sharded build (1-dev mesh), sharded/unsharded ratio,
  sharded bucketed warm query vs single-chip warm query.

Usage: python benchmarks/sharded_tpu.py [--n 100000] [--m 1536]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def fence(x) -> None:
    """Host-fetch a tiny slice — block_until_ready does not block on axon."""
    arr = x
    while getattr(arr, "ndim", 0) > 1:
        arr = arr[0]                      # drop one axis per step
    np.asarray(arr[:1] if getattr(arr, "ndim", 0) else arr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--m", type=int, default=1536)
    ap.add_argument("--p", type=int, default=100)
    ap.add_argument("--d", type=int, default=12)
    ap.add_argument("--c", type=int, default=256)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    n, m, p, d, c = args.n, args.m, args.p, args.d, args.c

    import jax

    if jax.default_backend() == "tpu":
        # TPU-only: the shared cache dir holds XLA:CPU AOT entries
        # compiled on a different host (machine-feature mismatch spews
        # loader errors and can SIGILL a CPU smoke run).
        from flechasdb_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache"))

    import jax.numpy as jnp

    from flechasdb_tpu.ops.bucketed import bucketize, query_bucketed
    from flechasdb_tpu.parallel import build_sharded, corpus_mesh
    from flechasdb_tpu.parallel.bucketed import (query_bucketed_sharded,
                                                 shard_buckets)
    from flechasdb_tpu.parallel.build import _build_step

    t0 = time.time()
    fence(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    print(f"warm-up: {time.time() - t0:.1f}s  backend="
          f"{jax.default_backend()}", file=sys.stderr, flush=True)

    @jax.jit
    def _prepare(key):
        v = jax.random.normal(key, (n, m), dtype=jnp.float32)
        return v / jnp.linalg.norm(v, axis=1, keepdims=True)

    xd = _prepare(jax.random.key(42))
    fence(xd)

    # --- single-chip build (the bench.py program), warm ---
    built = _build_step(xd, jax.random.key(1), p=p, d=d, c=c)
    fence(built.partition_indices)
    t0 = time.time()
    built = _build_step(xd, jax.random.key(42), p=p, d=d, c=c)
    fence(built.partition_indices)
    single_s = time.time() - t0
    print(json.dumps({"metric": f"single-chip build {n}x{m}",
                      "value": round(single_s, 3), "unit": "s"}),
          flush=True)

    # --- sharded build on a 1-device REAL-TPU mesh, warm ---
    mesh = corpus_mesh(jax.devices()[:1])
    sb = build_sharded(xd, p, d, c, jax.random.key(1), mesh=mesh)
    fence(sb.partition_indices)
    t0 = time.time()
    sb = build_sharded(xd, p, d, c, jax.random.key(42), mesh=mesh)
    fence(sb.partition_indices)
    sharded_s = time.time() - t0
    print(json.dumps({"metric": f"sharded build {n}x{m} (1-dev TPU mesh)",
                      "value": round(sharded_s, 3), "unit": "s",
                      "vs_single_chip": round(sharded_s / single_s, 2)}),
          flush=True)

    pops = np.unique(np.asarray(sb.partition_indices)).size
    agree = float(np.mean(np.asarray(sb.partition_indices)
                          == np.asarray(built.partition_indices)))
    print(json.dumps({"metric": "sharded vs single assignment agreement",
                      "value": round(agree, 4), "unit": "frac",
                      "partitions_populated": int(pops)}), flush=True)

    # --- sharded bucketed serving on the 1-device mesh, warm ---
    pidx = np.asarray(sb.partition_indices)
    buckets = bucketize(np.asarray(sb.codes), pidx, p)
    sbuckets = shard_buckets(mesh, buckets)
    q = xd[:64]
    kq, nprobe = 10, 5

    dist_u, _, _ = query_bucketed(q, sb.partition_centroids, sb.codebooks,
                                  buckets, k=kq, nprobe=nprobe)
    fence(dist_u)
    t0 = time.time()
    for _ in range(args.reps):
        dist_u, _, _ = query_bucketed(q, sb.partition_centroids,
                                      sb.codebooks, buckets,
                                      k=kq, nprobe=nprobe)
    fence(dist_u)
    unsharded_ms = (time.time() - t0) / args.reps * 1e3

    dist_s, rows_s, _ = query_bucketed_sharded(
        q, sb.partition_centroids, sb.codebooks, sbuckets,
        mesh=mesh, k=kq, nprobe=nprobe)
    fence(dist_s)
    t0 = time.time()
    for _ in range(args.reps):
        dist_s, rows_s, _ = query_bucketed_sharded(
            q, sb.partition_centroids, sb.codebooks, sbuckets,
            mesh=mesh, k=kq, nprobe=nprobe)
    fence(dist_s)
    sharded_ms = (time.time() - t0) / args.reps * 1e3
    print(json.dumps({
        "metric": "warm query batch=64 (bucketed)",
        "single_chip_ms": round(unsharded_ms, 2),
        "sharded_1dev_ms": round(sharded_ms, 2), "unit": "ms"}),
        flush=True)

    same = bool(np.array_equal(np.sort(np.asarray(rows_s), axis=1),
                               np.sort(np.asarray(
                                   query_bucketed(
                                       q, sb.partition_centroids,
                                       sb.codebooks, buckets,
                                       k=kq, nprobe=nprobe)[1]), axis=1)))
    print(json.dumps({"metric": "sharded query rows == unsharded",
                      "value": same}), flush=True)


if __name__ == "__main__":
    main()
