"""Lloyd-round kernel shootout at Deep10M-like shape (real TPU).

One Lloyd round = centroid update (cluster sums) + reassignment. At
n=10M, k=4096, m=96 both stages are HBM-bound, not FLOP-bound:

* the one-hot cluster-sum matmul materializes ``[n, k+1]`` f32 tiles —
  41x the corpus bytes (~164 GB written+read per round);
* the assignment distance tile is ``[n, k]`` f32 — another ~164 GB.

This script times alternatives on the real chip so the production kernel
choice is measured, not guessed:

  fused:  ops/pallas_kmeans.lloyd_round (assignment + sums, one pass,
          tiles stay in VMEM) — the production TPU kernel; this race is
          why (measured n=2M k=4096 m=96: 114 ms vs 73 + 1873 ms below)
  update: onehot-f32 | onehot-bf16 | segment_sum | sort-cumsum
  assign: f32 tile   | bf16 tile

Usage: python benchmarks/kmeans_micro.py [--n 2000000] [--k 4096] [--m 96]

Orientation note (round 3): the transposed ``[K, T]`` distance tile that
won 237 → 163 ms on the grouped sub-lane kernel was measured on the MAIN
kernel across four production shapes and is a wash or a regression
(bench-coarse K=100/M=1536: 6.9 → 10.2 ms; deep-coarse fast_math:
86.5 → 96.6 ms; sift-coarse equal) — full-width tiles are VPU-bound on
the argmin/select chain whose per-element op count is orientation-
independent (~85 ms floor at n=2M, K=4096), so the row-major form was
kept. The grouped kernel's win came from eliminating per-division
narrow-lane masking, not from the transpose per se.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def fence(x):
    import jax.numpy as jnp
    return np.asarray(jnp.ravel(x)[:1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--m", type=int, default=96)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    n, k, m = args.n, args.k, args.m

    import functools

    import jax
    import jax.numpy as jnp

    from flechasdb_tpu.ops.distance import assign_chunked, sqdist

    key = jax.random.key(0)
    kx, ki, kc = jax.random.split(key, 3)
    x = jax.random.normal(kx, (n, m), jnp.float32)
    idx = jax.random.randint(ki, (n,), 0, k)
    cents = jax.random.normal(kc, (k, m), jnp.float32)
    fence(x), fence(idx), fence(cents)

    def bench(name, fn, *a, **kw):
        out = fn(*a, **kw)
        fence(out[0] if isinstance(out, tuple) else out)
        t0 = time.time()
        for _ in range(args.reps):
            out = fn(*a, **kw)
        fence(out[0] if isinstance(out, tuple) else out)
        dt = (time.time() - t0) / args.reps
        print(f"{name:24s} {dt * 1e3:9.1f} ms", flush=True)
        return out

    # ---- fused production kernel (assignment + sums in one pass) ---------

    from flechasdb_tpu.ops.pallas_kmeans import lloyd_round

    bench("fused lloyd_round", lambda a, b: lloyd_round(a[None], b[None]),
          x, cents)
    bench("fused lloyd_round fast", lambda a, b: lloyd_round(
        a[None], b[None], fast_math=True), x, cents)

    # ---- update variants: cluster sums + counts --------------------------

    CHUNK = max(128, (1 << 25) // (k + 1))

    @functools.partial(jax.jit, static_argnames=("dtype",))
    def upd_onehot(x, idx, dtype=jnp.float32):
        chunk = min(n, CHUNK)
        steps = -(-n // chunk)

        def body(i, carry):
            sums, counts = carry
            start = jnp.minimum(i * chunk, jnp.maximum(n - chunk, 0))
            xi = jax.lax.dynamic_slice_in_dim(x, start, chunk, axis=0)
            ii = jax.lax.dynamic_slice_in_dim(idx, start, chunk, axis=0)
            fresh = (start + jnp.arange(chunk)) >= i * chunk
            oh = jax.nn.one_hot(ii, k + 1, dtype=dtype)
            oh = oh * fresh[:, None].astype(dtype)
            sums = sums + jnp.matmul(
                oh.T, xi.astype(dtype),
                precision=jax.lax.Precision.HIGH
                if dtype == jnp.float32 else jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
            counts = counts + jnp.sum(oh, axis=0, dtype=jnp.float32)
            return sums, counts

        init = (jnp.zeros((k + 1, m), jnp.float32),
                jnp.zeros((k + 1,), jnp.float32))
        return jax.lax.fori_loop(0, steps, body, init)

    @jax.jit
    def upd_segsum(x, idx):
        sums = jax.ops.segment_sum(x, idx, num_segments=k + 1)
        counts = jax.ops.segment_sum(
            jnp.ones((n,), jnp.float32), idx, num_segments=k + 1)
        return sums, counts

    @jax.jit
    def upd_sortcumsum(x, idx):
        order = jnp.argsort(idx)
        xs = jnp.take(x, order, axis=0)
        cs = jnp.cumsum(xs.astype(jnp.float32), axis=0)
        sidx = jnp.take(idx, order)
        # boundaries: first row of each segment
        starts = jnp.searchsorted(sidx, jnp.arange(k + 1))
        ends = jnp.searchsorted(sidx, jnp.arange(1, k + 2))
        zero = jnp.zeros((1, m), jnp.float32)
        cs0 = jnp.concatenate([zero, cs], axis=0)
        sums = jnp.take(cs0, ends, axis=0) - jnp.take(cs0, starts, axis=0)
        counts = (ends - starts).astype(jnp.float32)
        return sums, counts

    s_ref, c_ref = bench("update onehot f32", upd_onehot, x, idx)
    s_bf, c_bf = bench("update onehot bf16", upd_onehot, x, idx,
                       dtype=jnp.bfloat16)
    try:
        s_seg, c_seg = bench("update segment_sum", upd_segsum, x, idx)
    except Exception as e:
        print(f"segment_sum failed: {type(e).__name__}: {e}")
        s_seg = None
    try:
        s_srt, c_srt = bench("update sort+cumsum", upd_sortcumsum, x, idx)
    except Exception as e:
        print(f"sort+cumsum failed: {type(e).__name__}: {e}")
        s_srt = None

    ref = np.asarray(s_ref[:k])
    for name, s in (("bf16", s_bf), ("segsum", s_seg), ("cumsum", s_srt)):
        if s is None:
            continue
        got = np.asarray(s[:k])
        rel = (np.linalg.norm(got - ref)
               / max(np.linalg.norm(ref), 1e-9))
        print(f"  {name} rel err vs f32 onehot: {rel:.2e}")

    # ---- assignment variants ---------------------------------------------

    def assign_f32(x, c):
        return assign_chunked(x[None], c[None], k=k)[0]

    @jax.jit
    def assign_bf16(x, c):
        chunk = 16384
        steps = -(-n // chunk)

        def body(i, idx0):
            start = jnp.minimum(i * chunk, n - chunk)
            xi = jax.lax.dynamic_slice_in_dim(x, start, chunk, axis=0)
            d = sqdist(xi.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
                       precision=jax.lax.Precision.DEFAULT)
            return jax.lax.dynamic_update_slice_in_dim(
                idx0, jnp.argmin(d, axis=-1).astype(jnp.int32), start,
                axis=0)

        return jax.lax.fori_loop(0, steps, body, jnp.zeros((n,), jnp.int32))

    a_ref = bench("assign f32 (HIGH)", assign_f32, x, cents)
    a_bf = bench("assign bf16 tile", assign_bf16, x, cents)
    agree = float(np.mean(np.asarray(a_ref[0]) == np.asarray(a_bf)))
    print(f"  assignment agreement bf16 vs f32: {agree:.4f}")


def grouped_main():
    """GIST-PQ-shape shootout: the division-grouped fused round vs the
    two-pass XLA formulation (``python benchmarks/kmeans_micro.py
    --grouped [--b 60 --n 1000000 --m 16 --k 256]``).

    Round-3 history at the default shape (v5e): row-major grouped kernel
    237 ms (VPU-bound), transposed [g·K, T] orientation 163 ms, XLA
    two-pass 206 ms, fast_math 97 ms; regroup once-cost ~55 ms.
    """
    ap = argparse.ArgumentParser()
    ap.add_argument("--grouped", action="store_true")
    ap.add_argument("--b", type=int, default=60)
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    b, n, m, k = args.b, args.n, args.m, args.k

    import functools

    import jax
    import jax.numpy as jnp

    from flechasdb_tpu.ops import kmeans
    from flechasdb_tpu.ops.pallas_kmeans import (lloyd_round_grouped,
                                                 regroup_divisions)

    def fence3(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return np.asarray(leaf[(0,) * (leaf.ndim - 1)][:1])

    x = jax.random.normal(jax.random.key(0), (b, n, m), jnp.float32)
    cents = jax.random.normal(jax.random.key(1), (b, k, m), jnp.float32)
    fence3(x), fence3(cents)

    def bench(name, fn):
        fence3(fn())
        t0 = time.time()
        out = None
        for _ in range(args.reps):
            out = fn()
        fence3(out)
        print(f"{name:28s} {(time.time() - t0) / args.reps * 1e3:9.1f} ms",
              flush=True)

    xg = jax.jit(regroup_divisions)(x)
    fence3(xg)
    bench("grouped lloyd_round", lambda: lloyd_round_grouped(xg, cents))
    bench("grouped lloyd_round fast",
          lambda: lloyd_round_grouped(xg, cents, fast_math=True))
    xla = jax.jit(functools.partial(kmeans._fused_round, impl="xla", k=k))
    bench("xla two-pass round", lambda: xla(x, cents))


if __name__ == "__main__":
    if "--grouped" in sys.argv:
        grouped_main()
    else:
        main()
