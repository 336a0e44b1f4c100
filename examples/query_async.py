"""Load a stored database and query it with asyncio.

Python rendition of the reference walkthrough (``examples/query-async``):
partition fetches overlap on the event loop — the serverless design point —
and per-result attribute fetches run concurrently via ``asyncio.gather``.

Usage: python examples/query_async.py <path-to-root.binpb>
"""

import asyncio
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from flechasdb_tpu.asyncdb import AsyncLocalFileSystem, load_database

K, NPROBE = 10, 5


async def main(db_path: str) -> None:
    p = pathlib.Path(db_path)
    t = time.time()
    db = await load_database(AsyncLocalFileSystem(p.parent), p.name)
    print(f"loaded database in {time.time() - t:.6f} s")

    rng = np.random.default_rng()
    qv = rng.random(db.vector_size, dtype=np.float32)
    for r in range(2):  # second round should run faster
        t = time.time()
        results = await db.query(qv, K, NPROBE)
        print(f"[{r}] queried k-NN in {time.time() - t:.6f} s")
        t = time.time()
        attrs = await asyncio.gather(
            *(res.get_attribute("datum_id") for res in results))
        for i, (result, attr) in enumerate(zip(results, attrs)):
            print(f"\t{i}: partition={result.partition_index},"
                  f" approx. distance²={result.squared_distance},"
                  f" datum_id={attr!r}")
        print(f"[{r}] printed results in {time.time() - t:.6f} s")


if __name__ == "__main__":
    asyncio.run(main(sys.argv[1]))
