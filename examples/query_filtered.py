"""Attribute-filtered search (EXTENSION — no reference analogue).

Builds a small database with per-vector attributes, then runs filtered
queries through the fused device kernels: the predicate compiles to one
boolean row mask applied before top-k, so each query returns the exact k
nearest MATCHING vectors reachable via the probed partitions.

Usage: python examples/query_filtered.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import flechasdb_tpu as fdb

N, M, P, D, C = 20_000, 128, 32, 8, 64
K, NPROBE = 10, 8


def main() -> None:
    rng = np.random.default_rng(7)
    x = rng.standard_normal((N, M)).astype(np.float32)

    t = time.time()
    db = (fdb.DatabaseBuilder(x)
          .with_partitions(P).with_divisions(D).with_clusters(C)
          .with_seed(1).build())
    print(f"built {N}x{M} in {time.time() - t:.2f} s")

    colors = ["red", "green", "blue"]
    for i in range(N):
        db.set_attribute_at(i, ("color", colors[i % 3]))
        db.set_attribute_at(i, ("price", int(rng.integers(0, 1000))))

    q = x[:64]

    t = time.time()
    plain = db.query_batch(q, K, NPROBE)
    print(f"unfiltered batch of {len(q)}: {time.time() - t:.3f} s")

    t = time.time()
    cheap_red = db.query_batch(
        q, K, NPROBE,
        where=fdb.Eq("color", "red") & fdb.Range("price", hi=250))
    print(f"filtered batch of {len(q)}:   {time.time() - t:.3f} s")

    r0 = cheap_red[0]
    print(f"query 0: {len(plain[0])} unfiltered, {len(r0)} filtered hits")
    for i, res in enumerate(r0[:5]):
        print(f"\t{i}: color={db.get_attribute(res.vector_id, 'color')!r}"
              f" price={db.get_attribute(res.vector_id, 'price')}"
              f" distance²={res.squared_distance:.3f}")


if __name__ == "__main__":
    main()
