"""Load a stored database and query it synchronously.

Python rendition of the reference walkthrough (``examples/query-sync``):
two rounds show cold (lazy partition loads from disk) vs warm latency;
attribute fetches incur additional reads on the first round.

Usage: python examples/query_sync.py <path-to-root.binpb>
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from flechasdb_tpu import LocalFileSystem, load_database

K, NPROBE = 10, 5


def main(db_path: str) -> None:
    p = pathlib.Path(db_path)
    t = time.time()
    db = load_database(LocalFileSystem(p.parent), p.name)
    print(f"loaded database in {time.time() - t:.6f} s")

    rng = np.random.default_rng()
    qv = rng.random(db.vector_size, dtype=np.float32)
    for r in range(2):  # second round should run faster
        t = time.time()
        results = db.query(qv, K, NPROBE)
        print(f"[{r}] queried k-NN in {time.time() - t:.6f} s")
        t = time.time()
        for i, result in enumerate(results):
            attr = result.get_attribute("datum_id")
            print(f"\t{i}: partition={result.partition_index},"
                  f" approx. distance²={result.squared_distance},"
                  f" datum_id={attr!r}")
        print(f"[{r}] printed results in {time.time() - t:.6f} s")


if __name__ == "__main__":
    main(sys.argv[1])
