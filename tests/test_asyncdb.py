"""Async read-path tests (``src/asyncdb/`` behaviors).

The reference's async e2e coverage is the ``test-async`` binary
(``src/bin/test-async.rs``): load → query → concurrent attribute fetch; plus
the async path's stricter verification (it verifies partition centroids and
attribute logs where the sync path does not, SURVEY.md §5).
"""

import asyncio
import pathlib

import numpy as np
import pytest

import flechasdb_tpu as fdb
from flechasdb_tpu import events as ev
from flechasdb_tpu.asyncdb import AsyncLocalFileSystem, load_database


@pytest.fixture(scope="module")
def saved_db(tmp_path_factory):
    rng = np.random.default_rng(7)
    x = rng.standard_normal((300, 32)).astype(np.float32)
    db = (fdb.DatabaseBuilder(x).with_partitions(6).with_divisions(4)
          .with_clusters(8).with_seed(11).build())
    for i in range(0, 300, 2):
        db.set_attribute_at(i, ("datum_id", i))
        db.set_attribute_at(i, ("label", f"even-{i}"))
    td = tmp_path_factory.mktemp("adb")
    root = fdb.save_database(db, fdb.LocalFileSystem(td))
    return td, root, db, x


def test_async_load_and_query_matches_sync(saved_db):
    td, root, db, x = saved_db
    sync_db = fdb.load_database(fdb.LocalFileSystem(td), f"{root}.binpb")
    sync_res = sync_db.query(x[10], k=5, nprobe=3)

    async def go():
        adb = await load_database(AsyncLocalFileSystem(td), f"{root}.binpb")
        return await adb.query(x[10], k=5, nprobe=3)

    async_res = asyncio.run(go())
    assert len(async_res) == len(sync_res)
    for a, s in zip(async_res, sync_res):
        assert a.vector_id == s.vector_id
        assert a.partition_index == s.partition_index
        assert a.vector_index == s.vector_index
        assert a.squared_distance == pytest.approx(s.squared_distance,
                                                   rel=1e-6)


def test_async_concurrent_attribute_fetch(saved_db):
    td, root, db, x = saved_db

    async def go():
        adb = await load_database(AsyncLocalFileSystem(td), f"{root}.binpb")
        res = await adb.query(x[0], k=10, nprobe=6)
        # concurrent fetch over all results (test-async.rs:10-123)
        attrs = await asyncio.gather(
            *(r.get_attribute("datum_id") for r in res))
        return res, attrs

    res, attrs = asyncio.run(go())
    for r, a in zip(res, attrs):
        idx = db.vector_ids.index(r.vector_id)
        if idx % 2 == 0:
            assert a == idx
        else:
            assert a is None


def test_async_events_sequence(saved_db):
    td, root, db, x = saved_db
    seen = []

    async def go():
        adb = await load_database(AsyncLocalFileSystem(td), f"{root}.binpb")
        await adb.query_with_events(x[0], 3, 2, seen.append)
        # second query: warm caches, no load events
        warm = []
        await adb.query_with_events(x[1], 3, 2, warm.append)
        return warm

    warm = asyncio.run(go())
    types = [type(e) for e in seen]
    assert ev.StartingCodebookLoad in types
    assert ev.StartingPartitionCentroidsLoad in types
    assert ev.StartingPartitionLoad in types
    assert ev.StartingPartitionQuery in types
    assert ev.StartingResultSelection in types
    assert types.index(ev.StartingCodebookLoad) < \
        types.index(ev.StartingPartitionSelection)
    warm_types = {type(e) for e in warm}
    assert ev.StartingCodebookLoad not in warm_types
    assert ev.StartingPartitionCentroidsLoad not in warm_types


def test_async_verifies_partition_centroids(saved_db, tmp_path):
    """Async verifies what sync skips (asyncdb/stored.rs:284 vs
    db/stored.rs:732-754)."""
    td, root, db, x = saved_db
    import shutil
    dst = tmp_path / "copy"
    shutil.copytree(td, dst)

    # Corrupt the partition-centroids file: it's the one partitions/ file
    # that is NOT named in partition_ids (it is the uncompressed VectorSet).
    sync_db = fdb.load_database(fdb.LocalFileSystem(dst), f"{root}.binpb")
    cent_id = sync_db.root.partition_centroids_id
    path = dst / "partitions" / f"{cent_id}.binpb"
    data = bytearray(path.read_bytes())
    data[-1] ^= 0x01
    path.write_bytes(bytes(data))

    # Sync path (quirk parity): no verification on centroids — query works.
    res = sync_db.query(x[0], k=3, nprobe=2)
    assert len(res) == 3

    async def go():
        adb = await load_database(AsyncLocalFileSystem(dst), f"{root}.binpb")
        await adb.query(x[0], k=3, nprobe=2)

    with pytest.raises(fdb.VerificationFailure):
        asyncio.run(go())


def test_async_unknown_vector_id(saved_db):
    td, root, db, x = saved_db
    import uuid

    async def go():
        adb = await load_database(AsyncLocalFileSystem(td), f"{root}.binpb")
        await adb.get_attribute(uuid.uuid4(), "datum_id")

    with pytest.raises(fdb.InvalidArgs):
        asyncio.run(go())


def test_async_query_validation(saved_db):
    td, root, db, x = saved_db

    async def go(k, nprobe):
        adb = await load_database(AsyncLocalFileSystem(td), f"{root}.binpb")
        await adb.query(x[0], k=k, nprobe=nprobe)

    with pytest.raises(fdb.InvalidArgs):
        asyncio.run(go(0, 1))
    with pytest.raises(fdb.InvalidArgs):
        asyncio.run(go(3, 999))


# ------------------------------------------------------ async save ----


def test_async_save_identical_tree(tmp_path):
    """asyncdb.save_database (concurrent writes — beyond the reference's
    unchecked 'save asynchronously' box) must produce the exact artifact
    set the sync saver does: content addressing makes the trees
    byte-identical, so the file inventories and root hash must match."""
    import flechasdb_tpu as fdb
    from flechasdb_tpu.asyncdb import save_database as save_async

    rng = np.random.default_rng(5)
    x = rng.standard_normal((300, 16)).astype(np.float32)
    db = (fdb.DatabaseBuilder(x).with_partitions(5).with_divisions(4)
          .with_clusters(8).with_seed(2).build())
    for i in range(0, 300, 7):
        db.set_attribute_at(i, ("datum", i))

    sync_dir = tmp_path / "sync"
    async_dir = tmp_path / "async"
    root_sync = fdb.save_database(db, fdb.LocalFileSystem(sync_dir))
    root_async = asyncio.run(
        save_async(db, fdb.LocalFileSystem(async_dir)))
    assert root_sync == root_async

    def inventory(base):
        return sorted(p.relative_to(base).as_posix()
                      for p in base.rglob("*.binpb"))

    assert inventory(sync_dir) == inventory(async_dir)

    db2 = fdb.load_database(fdb.LocalFileSystem(async_dir),
                            f"{root_async}.binpb")
    got = db2.query(x[0], k=3, nprobe=5)
    assert got[0].vector_id == db.vector_ids[0]
    assert got[0].get_attribute("datum") == 0


def test_async_save_objectstore(tmp_path):
    """Concurrent save onto an fsspec object store (memory://) and async
    load back — the serverless S3 write path, end to end."""
    import flechasdb_tpu as fdb
    from flechasdb_tpu.asyncdb import load_database as load_async
    from flechasdb_tpu.asyncdb import save_database as save_async
    from flechasdb_tpu.objectstore import (AsyncFsspecFileSystem,
                                           FsspecFileSystem)

    rng = np.random.default_rng(6)
    x = rng.standard_normal((200, 8)).astype(np.float32)
    db = (fdb.DatabaseBuilder(x).with_partitions(4).with_divisions(2)
          .with_clusters(8).with_seed(3).build())

    store = FsspecFileSystem("memory://asave-test")
    root = asyncio.run(save_async(db, store, max_concurrency=8))

    async def roundtrip():
        adb = await load_async(AsyncFsspecFileSystem("memory://asave-test"),
                               f"{root}.binpb")
        return await adb.query(x[0], k=3, nprobe=4)

    got = asyncio.run(roundtrip())
    assert got[0].vector_id == db.vector_ids[0]


def test_async_concurrent_first_queries(saved_db):
    """Many overlapping FIRST queries on one AsyncStoredDatabase: the
    memoized-Task once-loads must hand every coroutine the same artifacts
    (single-flight), and results must match a serial baseline."""
    import asyncio

    import numpy as np

    from flechasdb_tpu.asyncdb import AsyncLocalFileSystem, load_database

    base, root, db, x = saved_db
    want = [r.vector_id for r in db.query(x[5], k=5, nprobe=3)]

    class CountingFS(AsyncLocalFileSystem):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.opens = {}

        async def open_hashed_file(self, path, compressed=False):
            self.opens[path] = self.opens.get(path, 0) + 1
            return await super().open_hashed_file(path, compressed)

    async def run():
        fs = CountingFS(base)
        adb = await load_database(fs, f"{root}.binpb")
        outs = await asyncio.gather(*[
            adb.query(x[5], k=5, nprobe=3) for _ in range(32)])
        for res in outs:
            assert [r.vector_id for r in res] == want
        # single-flight: despite 32 racing queries, every artifact
        # (root + centroids + codebooks + probed partitions) was opened
        # exactly once — the memoized Tasks deduplicated the loads.
        dup = {p: c for p, c in fs.opens.items() if c != 1}
        assert not dup, f"artifacts opened more than once: {dup}"

    asyncio.run(run())


def test_async_save_phase1_concurrent(tmp_path):
    """Phase-1 artifacts (partitions, centroids, codebooks, rotation) must
    be in flight TOGETHER: on a 40 ms-latency store, save wall-clock must
    be far below the serial sum (regression for the create_task wrap —
    bare coroutines serialized centroids/codebooks behind the partition
    gather)."""
    import asyncio
    import time

    from flechasdb_tpu.asyncdb import save_database as asave
    from flechasdb_tpu.io import LocalFileSystem

    rng = np.random.default_rng(31)
    x = rng.standard_normal((200, 24)).astype(np.float32)
    db = (fdb.DatabaseBuilder(x).with_partitions(4).with_divisions(3)
          .with_clusters(8).with_seed(13).build())

    class SlowFS(LocalFileSystem):
        def create_hashed_file(self, subdir, compress=False):
            time.sleep(0.04)
            return super().create_hashed_file(subdir, compress=compress)

    # 4 partitions + centroids + 3 codebooks = 8 phase-1 PUTs, then
    # 4 attr logs, then the root: serial = 13 x 40 ms = 520 ms+.
    t0 = time.perf_counter()
    root = asyncio.run(asave(db, SlowFS(tmp_path)))
    wall = time.perf_counter() - t0
    assert wall < 0.40, f"phase-1 writes serialized: {wall:.3f}s"

    sdb = fdb.load_database(LocalFileSystem(tmp_path), f"{root}.binpb")
    got = sdb.query(x[1], k=3, nprobe=4)
    want = db.query(x[1], k=3, nprobe=4)
    assert [r.vector_id for r in got] == [r.vector_id for r in want]


def test_async_overlap_beats_sync_under_object_store_latency():
    """WHY the async path exists (``asyncdb/stored/query.rs:208-356``):
    against a high-latency object store, the overlapped query coroutine
    must amortize per-object latency that the sync path pays serially.
    With an injected per-open delay, a cold sync query at nprobe=10
    pays ~(1 centroids + D codebooks + nprobe partitions) delays
    back-to-back; the async query overlaps them into a few dependency
    rounds. Asserts the measured overlap factor, not just ordering."""
    import time

    from flechasdb_tpu.memfs import AsyncMemoryFileSystem, MemoryFileSystem

    delay = 0.03
    rng = np.random.default_rng(5)
    x = rng.standard_normal((400, 32)).astype(np.float32)
    db = (fdb.DatabaseBuilder(x).with_partitions(12).with_divisions(4)
          .with_clusters(8).with_seed(3).build())
    store: dict = {}
    fs = MemoryFileSystem(store)
    root = fdb.save_database(db, fs)

    class SlowFS(MemoryFileSystem):
        def open_hashed_file(self, path, compressed=False):
            time.sleep(delay)
            return super().open_hashed_file(path, compressed)

    class SlowAsyncFS(AsyncMemoryFileSystem):
        async def open_hashed_file(self, path, compressed=False):
            await asyncio.sleep(delay)
            return await super().open_hashed_file(path, compressed)

    # Warm the jit caches on a zero-latency store so only IO differs.
    warm = fdb.load_database(MemoryFileSystem(store), f"{root}.binpb")
    warm_res = warm.query(x[3], k=5, nprobe=10)

    async def warm_async():
        adb = await load_database(AsyncMemoryFileSystem(store),
                                  f"{root}.binpb")
        return await adb.query(x[3], k=5, nprobe=10)

    asyncio.run(warm_async())

    async def cold_async():
        adb = await load_database(SlowAsyncFS(store), f"{root}.binpb")
        t0 = time.perf_counter()
        res = await adb.query(x[3], k=5, nprobe=10)
        return res, time.perf_counter() - t0

    # The overlap RATIO is wall-clock and can flake under host load
    # (asyncio jitter on a 1-vCPU CI host): best-of-2 before judging.
    best = None
    for _ in range(2):
        sdb = fdb.load_database(SlowFS(store), f"{root}.binpb")
        t0 = time.perf_counter()
        sync_res = sdb.query(x[3], k=5, nprobe=10)
        sync_s = time.perf_counter() - t0
        async_res, async_s = asyncio.run(cold_async())
        assert [r.vector_id for r in async_res] == \
            [r.vector_id for r in sync_res] == \
            [r.vector_id for r in warm_res]
        # Sync pays >= 15 serial delays (1 + D + nprobe); the
        # coroutine's dependency depth is a handful.
        assert sync_s >= 14 * delay, \
            f"sync path too fast ({sync_s:.3f}s) — did loads stop " \
            "going through the store?"
        best = max(best or 0.0, sync_s / async_s)
        if best >= 3.0:
            break
    assert best >= 3.0, best
