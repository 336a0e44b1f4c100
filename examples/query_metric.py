"""Metrics, range search, and labels (EXTENSIONS — reference is L2 k-NN).

Builds one corpus three ways — L2 (the reference's metric), maximum
inner product ("dot"), cosine — queries each, runs a radius search, and
publishes the MIPS index under a named label so a stateless reader can
find the current root without knowing its hash.

Usage: python examples/query_metric.py
"""

import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import flechasdb_tpu as fdb

N, M, P, D, C = 20_000, 128, 32, 8, 64
K, NPROBE = 5, 8


def main() -> None:
    rng = np.random.default_rng(11)
    x = rng.standard_normal((N, M)).astype(np.float32)
    q = x[123] + 0.05 * rng.standard_normal(M).astype(np.float32)

    for metric in ("l2", "dot", "cosine"):
        t = time.time()
        db = (fdb.DatabaseBuilder(x)
              .with_partitions(P).with_divisions(D).with_clusters(C)
              .with_seed(1).with_metric(metric).build())
        res = db.query(q, K, NPROBE)
        print(f"{metric:>6}: built in {time.time() - t:.2f} s; "
              f"top hit row-ish {res[0].vector_index} "
              f"key={res[0].squared_distance:+.4f}"
              + ("  (= -<q,x>)" if metric == "dot" else "")
              + ("  (= 2-2cos)" if metric == "cosine" else ""))

    # Range search: everything within a radius of the query (same key
    # semantics as squared_distance), composable with filters/limits.
    db = (fdb.DatabaseBuilder(x).with_partitions(P).with_divisions(D)
          .with_clusters(C).with_seed(1).build())
    radius = db.query(q, K, NPROBE)[2].squared_distance  # 3rd-hit key
    near = db.query_range(q, radius, NPROBE)
    print(f"range: {len(near)} vectors within key {radius:.2f}")

    # Labels: publish the current root; readers resolve by name.
    with tempfile.TemporaryDirectory() as td:
        fs = fdb.LocalFileSystem(td)
        root = fdb.save_database(db, fs)
        fdb.publish_label(fs, root)                  # labels/latest
        sdb = fdb.load_labeled(fs)                   # no hash needed
        got = sdb.query(q, K, NPROBE)
        assert [r.vector_id for r in got] == \
            [r.vector_id for r in db.query(q, K, NPROBE)]
        print(f"published + resolved label 'latest' -> {root[:12]}…; "
              "stored query matches in-memory")


if __name__ == "__main__":
    main()
