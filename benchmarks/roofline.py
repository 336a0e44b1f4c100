"""HBM roofline for the SERVING kernels (VERDICT round-3 #4).

The training kernels have an MFU table (`RESULTS.md`); the serving scan
kernels are memory-bound, so the honest utilization anchor is achieved
HBM bandwidth — compulsory bytes (each input read once + output written
once, the `pl.CostEstimate.bytes_accessed` convention) divided by
measured time — against the v5e HBM peak (~819 GB/s). A relative number
("40× over XLA gather") cannot catch an absolute regression; GB/s can.

Kernels measured (reference analogue: the per-member scalar scan,
db/stored.rs:549-598):
  * `adc_lookup_indexed` at SIFT serving shape (P=1024, D=8 unpacked,
    L=1280) — scalar-prefetched in-place bucket scan;
  * `adc_lookup_indexed` at Deep10M serving shape (P=4096, D=8 PACKED
    → 2 words/row, L=8960);
  * `adc_lookup` (pre-gathered codes) at the SIFT shape, for the copy
    cost comparison;
  * `exact_topk` brute-force rerank scan over 1M × 128 (reads the whole
    corpus per query batch).

Usage: python benchmarks/roofline.py [--reps 50]
Emits one JSON line per kernel: {..., "gbps": N, "pct_peak": N}.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

#: v5e HBM peak bandwidth, GB/s (public spec: 819 GB/s).
HBM_PEAK_GBPS = 819.0


def log(obj):
    print(json.dumps(obj), flush=True)


def fence(x):
    np.asarray(x[:1, :1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flechasdb_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from flechasdb_tpu.ops.pallas_scan import adc_lookup, adc_lookup_indexed
    from flechasdb_tpu.ops.exact import exact_topk

    t0 = time.time()
    _ = np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    log({"metric": "backend warm-up (tiny op)",
         "value": round(time.time() - t0, 1), "unit": "s",
         "backend": jax.default_backend()})

    key = jax.random.key(0)

    def bench(name, fn, in_arrays, bytes_touched, reps):
        out = fn(*in_arrays)                     # compile + warm
        fence(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*in_arrays)                 # pipelined dispatch
        fence(out)                               # one fence at the end
        dt = (time.time() - t0) / reps
        gbps = bytes_touched / dt / 1e9
        log({"metric": name, "ms": round(dt * 1e3, 3),
             "bytes_mb": round(bytes_touched / 1e6, 1),
             "gbps": round(gbps, 1),
             "pct_peak": round(100 * gbps / HBM_PEAK_GBPS, 1)})

    # --- adc_lookup_indexed, SIFT shape: B=64 queries x nprobe=10 --------
    p, d, c, l, g = 1024, 8, 256, 1280, 640
    k1, k2, k3 = jax.random.split(key, 3)
    bcodes = jax.random.randint(k1, (p, d, l), 0, c, dtype=jnp.int32)
    ftab = jax.random.normal(k2, (g, d * c), dtype=jnp.float32)
    bidx = jax.random.randint(k3, (g,), 0, p, dtype=jnp.int32)
    nbytes = g * d * l * 4 + ftab.size * 4 + g * l * 4
    bench(f"adc_lookup_indexed SIFT (P={p} D={d} L={l} G={g})",
          adc_lookup_indexed, (bcodes, ftab, bidx), nbytes, args.reps)

    # --- adc_lookup (pre-gathered codes), same shape ---------------------
    codes_g = jnp.take(bcodes, bidx, axis=0)     # the HBM copy the indexed
    fence(codes_g[0])                            # kernel avoids (untimed)
    bench(f"adc_lookup pre-gathered SIFT (G={g} D={d} L={l})",
          adc_lookup, (codes_g, ftab), nbytes, args.reps)

    # --- adc_lookup_indexed, Deep10M shape: PACKED codes -----------------
    p, d, c, l = 4096, 8, 256, 8960
    words = -(-d // 4)                           # 2 packed words per column
    g = 2048                                     # B=64 x nprobe=32
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    bcodes_p = jax.random.randint(
        k1, (p, words, l), -(2 ** 31), 2 ** 31 - 1, dtype=jnp.int32)
    ftab = jax.random.normal(k2, (g, d * c), dtype=jnp.float32)
    bidx = jax.random.randint(k3, (g,), 0, p, dtype=jnp.int32)
    import functools
    nbytes = g * words * l * 4 + ftab.size * 4 + g * l * 4
    bench(f"adc_lookup_indexed Deep10M packed (P={p} words={words} "
          f"L={l} G={g})",
          functools.partial(adc_lookup_indexed, d=d),
          (bcodes_p, ftab, bidx), nbytes, max(args.reps // 5, 5))

    # --- exact rerank scan: brute-force top-k over 1M x 128 --------------
    n, m, b, kk = 1_000_000, 128, 64, 10
    k1, k2 = jax.random.split(jax.random.key(2))
    x = jax.random.normal(k1, (n, m), dtype=jnp.float32)
    q = jax.random.normal(k2, (b, m), dtype=jnp.float32)
    nbytes = n * m * 4 + b * m * 4 + b * kk * 8  # corpus + queries + out

    def exact_fn(qq, xx):
        dists, rows = exact_topk(qq, xx, k=kk)
        return dists

    bench(f"exact_topk rerank scan ({n // 1000}k x {m}, B={b})",
          exact_fn, (q, x), nbytes, max(args.reps // 5, 5))


if __name__ == "__main__":
    main()
