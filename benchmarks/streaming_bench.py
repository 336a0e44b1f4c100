"""Out-of-core (streamed) build benchmark — corpus on disk, never in RAM.

Builds an IVF-PQ database from an on-disk ``np.memmap`` through
``StreamingDatabaseBuilder`` (``flechasdb_tpu/streaming.py``): training on
bounded samples, encoding streamed in fixed row chunks. The interesting
numbers are (a) wall-clock vs the in-HBM ``build_staged`` at the same
shape — the streaming overhead is the chunked host→device transfer — and
(b) the peak memory independence: the corpus array is memory-mapped, so
RSS stays ~(sample + one chunk) regardless of N.

Usage: python benchmarks/streaming_bench.py [--n 2000000] [--m 96]
       [--p 1024] [--d 8] [--c 256] [--chunk-rows 0 (auto)]
Emits one JSON line per measurement.
"""

import argparse
import json
import resource
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(obj):
    print(json.dumps(obj), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--m", type=int, default=96)
    ap.add_argument("--p", type=int, default=1024)
    ap.add_argument("--d", type=int, default=8)
    ap.add_argument("--c", type=int, default=256)
    ap.add_argument("--chunk-rows", type=int, default=0)
    ap.add_argument("--mesh", action="store_true",
                    help="shard the streamed encode over all devices")
    args = ap.parse_args()

    import jax.numpy as jnp

    from flechasdb_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import flechasdb_tpu as fdb

    t0 = time.time()
    _ = np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    log({"metric": "backend warm-up (tiny op)",
         "value": round(time.time() - t0, 1), "unit": "s"})

    with tempfile.TemporaryDirectory() as td:
        t0 = time.time()
        mm = np.lib.format.open_memmap(
            td + "/corpus.npy", mode="w+", dtype=np.float32,
            shape=(args.n, args.m))
        rng = np.random.default_rng(0)
        step = 250_000
        for lo in range(0, args.n, step):
            hi = min(args.n, lo + step)
            mm[lo:hi] = rng.standard_normal((hi - lo, args.m),
                                            dtype=np.float32)
        mm.flush()
        log({"metric": f"write {args.n}x{args.m} corpus to disk (memmap)",
             "value": round(time.time() - t0, 1), "unit": "s"})

        b = fdb.StreamingDatabaseBuilder(mm) \
            .with_partitions(args.p).with_divisions(args.d) \
            .with_clusters(args.c).with_seed(5)
        if args.chunk_rows:
            b = b.with_chunk_rows(args.chunk_rows)
        if args.mesh:
            mesh = fdb.parallel.corpus_mesh()
            b = b.with_mesh(mesh)
            log({"metric": "encode mesh devices",
                 "value": int(mesh.devices.size), "unit": "devices"})
        t0 = time.time()
        db = b.build()
        log({"metric": (f"streamed build {args.n}x{args.m} "
                        f"(P={args.p}, D={args.d}, C={args.c})"),
             "value": round(time.time() - t0, 1), "unit": "s"})
        log({"metric": "peak RSS (whole process)",
             "value": round(resource.getrusage(
                 resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
             "unit": "GB"})

        pops = np.unique(db.partition_indices).size
        log({"metric": "partitions populated",
             "value": int(pops), "unit": f"of {args.p}"})
        q = np.asarray(mm[7])
        res = db.query(q, k=10, nprobe=8)
        assert res[0].vector_id == db.vector_ids[7], "self-query must hit"
        log({"metric": "self-query sanity (top-1 is the row itself)",
             "value": 1, "unit": "bool"})


if __name__ == "__main__":
    main()
