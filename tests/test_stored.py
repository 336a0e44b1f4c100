"""End-to-end persistence tests: build → save → load → query equivalence.

The reference has no such tests (SURVEY §4); these are the acceptance tests
for phases 4-5: a stored database must return exactly the same results as
the in-memory database it was serialized from, attributes must replay
through the set-op log, and corruption must surface as VerificationFailure.
"""

import uuid
import zlib
from pathlib import Path

import numpy as np
import pytest

from flechasdb_tpu import (
    DatabaseBuilder,
    InvalidArgs,
    InvalidData,
    LocalFileSystem,
    VerificationFailure,
    load_database,
    save_database,
)


@pytest.fixture(scope="module")
def saved(tmp_path_factory):
    rng = np.random.default_rng(21)
    x = rng.standard_normal((300, 12)).astype(np.float32)
    db = (DatabaseBuilder(x).with_partitions(6).with_divisions(3)
          .with_clusters(8).with_seed(77).build())
    # attributes on even vectors only (mirrors main.rs:97-101 coverage of
    # attribute-less vectors)
    for i in range(0, 300, 2):
        db.set_attribute_at(i, ("datum_id", i))
        db.set_attribute_at(i, ("label", f"v{i}"))
    base = tmp_path_factory.mktemp("db")
    fs = LocalFileSystem(base)
    root = save_database(db, fs)
    return x, db, base, root


def test_tree_layout(saved):
    x, db, base, root = saved
    assert (base / f"{root}.binpb").exists()
    # partitions dir: P compressed code files + 1 uncompressed centroid file
    assert len(list((base / "partitions").iterdir())) == 7
    assert len(list((base / "codebooks").iterdir())) == 3
    assert len(list((base / "attributes").iterdir())) <= 6  # dedup possible
    # every file name is its content hash
    for p in base.rglob("*.binpb"):
        import flechasdb_tpu.io as fio
        assert fio.content_hash(p.read_bytes()) == p.stem


def test_load_and_query_matches_inmemory(saved):
    x, db, base, root = saved
    stored = load_database(LocalFileSystem(base), f"{root}.binpb")
    assert stored.vector_size == 12
    assert stored.num_partitions == 6
    assert stored.num_divisions == 3
    assert stored.num_codes == 8
    rng = np.random.default_rng(1)
    for _ in range(4):
        v = rng.standard_normal(12).astype(np.float32)
        got = stored.query(v, k=8, nprobe=3)
        want = db.query(v, k=8, nprobe=3)
        assert [r.vector_id for r in got] == [r.vector_id for r in want]
        assert [r.partition_index for r in got] == \
            [r.partition_index for r in want]
        assert [r.vector_index for r in got] == \
            [r.vector_index for r in want]
        for g, w in zip(got, want):
            assert g.squared_distance == pytest.approx(
                w.squared_distance, rel=1e-4)


def test_warm_device_path_matches_cold(saved):
    x, db, base, root = saved
    stored = load_database(LocalFileSystem(base), f"{root}.binpb")
    v = np.random.default_rng(2).standard_normal(12).astype(np.float32)
    cold = stored.query(v, k=5, nprobe=2)
    stored.preload()
    warm = stored.query(v, k=5, nprobe=2)
    assert [r.vector_id for r in cold] == [r.vector_id for r in warm]
    batch = stored.query_batch(np.stack([v, v]), k=5, nprobe=2)
    assert [r.vector_id for r in batch[0]] == [r.vector_id for r in cold]
    assert [r.vector_id for r in batch[1]] == [r.vector_id for r in cold]


def test_attributes_via_query_results(saved):
    x, db, base, root = saved
    stored = load_database(LocalFileSystem(base), f"{root}.binpb")
    v = x[10]  # even vector: has attributes
    results = stored.query(v, k=3, nprobe=6)
    top = results[0]
    # nearest neighbor of an indexed vector should be itself (PQ permitting);
    # regardless, attribute fetch must work on every result
    for r in results:
        val = r.get_attribute("datum_id")
        lab = r.get_attribute("label")
        i = db.vector_ids.index(r.vector_id)
        if i % 2 == 0:
            assert val == i and lab == f"v{i}"
        else:
            assert val is None and lab is None
    assert top.get_attribute("nonexistent") is None


def test_get_attribute_unknown_vector(saved):
    x, db, base, root = saved
    stored = load_database(LocalFileSystem(base), f"{root}.binpb")
    with pytest.raises(InvalidArgs):
        stored.get_attribute(uuid.uuid4(), "datum_id")


def test_get_attribute_direct_loads_all(saved):
    x, db, base, root = saved
    stored = load_database(LocalFileSystem(base), f"{root}.binpb")
    vid = db.vector_ids[4]
    assert stored.get_attribute(vid, "datum_id") == 4
    vid3 = db.vector_ids[3]
    assert stored.get_attribute(vid3, "datum_id") is None


def test_lazy_loading_touches_only_probed_partitions(saved):
    x, db, base, root = saved
    stored = load_database(LocalFileSystem(base), f"{root}.binpb")
    v = np.random.default_rng(5).standard_normal(12).astype(np.float32)
    stored.query(v, k=3, nprobe=2)
    loaded = sum(p is not None for p in stored._partitions)
    assert loaded == 2  # serverless contract: nprobe partitions only


def test_corrupt_partition_detected(saved):
    x, db, base, root = saved
    import shutil
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        shutil.copytree(base, Path(tmp) / "db")
        broken = Path(tmp) / "db"
        stored = load_database(LocalFileSystem(broken), f"{root}.binpb")
        # corrupt one partition file (keep it valid zlib so hashing is what
        # fails, not decompression)
        target = sorted((broken / "partitions").glob("*.binpb"),
                        key=lambda p: p.stat().st_size)[-1]
        inner = zlib.decompress(target.read_bytes())
        target.write_bytes(zlib.compress(inner + b"\x00"))
        with pytest.raises((VerificationFailure, InvalidData)):
            for pi in range(stored.num_partitions):
                stored.get_partition(pi)


def test_corrupt_root_detected(saved):
    x, db, base, root = saved
    import shutil
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        shutil.copytree(base, Path(tmp) / "db")
        broken = Path(tmp) / "db"
        rootfile = broken / f"{root}.binpb"
        inner = zlib.decompress(rootfile.read_bytes())
        rootfile.write_bytes(zlib.compress(inner[:-1]))
        with pytest.raises((VerificationFailure, InvalidData)):
            load_database(LocalFileSystem(broken), f"{root}.binpb")


def test_nprobe_exceeds_partitions(saved):
    x, db, base, root = saved
    stored = load_database(LocalFileSystem(base), f"{root}.binpb")
    with pytest.raises(InvalidArgs):
        stored.query(np.zeros(12, np.float32), k=3, nprobe=7)


def _build_and_save(rng, tmp_path):
    import flechasdb_tpu as fdb
    x = rng.standard_normal((300, 32)).astype(np.float32)
    db = (fdb.DatabaseBuilder(x).with_partitions(6).with_divisions(4)
          .with_clusters(8).with_seed(11).build())
    root = fdb.save_database(db, fdb.LocalFileSystem(tmp_path))
    return fdb.load_database(fdb.LocalFileSystem(tmp_path),
                             f"{root}.binpb"), x


def test_sync_query_event_order(rng, tmp_path):
    """Event sequence parity with the reference sync path
    (db/stored.rs:513-532): init -> selection -> per-partition -> results,
    with init events only on the cold call."""
    from flechasdb_tpu import events as ev

    sdb, x = _build_and_save(rng, tmp_path)
    cold, warm = [], []
    sdb.query_with_events(x[0], 3, 2, cold.append)
    sdb.query_with_events(x[1], 3, 2, warm.append)

    types = [type(e) for e in cold]
    assert types[0] is ev.StartingQueryInitialization
    assert types[1] is ev.FinishedQueryInitialization
    assert types.index(ev.FinishedPartitionSelection) < \
        types.index(ev.StartingPartitionQuery)
    assert types[-1] is ev.FinishedResultSelection
    pq = [e.partition_index for e in cold
          if isinstance(e, ev.StartingPartitionQuery)]
    assert len(pq) == 2

    # warm path still initializes lazily-noop but emits the same sequence
    warm_types = [type(e) for e in warm]
    assert warm_types.count(ev.StartingPartitionQuery) == 2


def test_stored_query_fuzz_matches_inmemory(tmp_path):
    """Randomized differential check across adversarial shapes: duplicated
    vectors (exact distance ties on the stable merge), clustered data with
    more partitions than natural clusters (near-empty partitions),
    k larger than the candidate pool, nprobe=P, and queries far outside
    the corpus. Stored sync + async must match the in-memory DB result-
    for-result (this drives both the batched native fast path and the
    cnt<k merge fallback, stored.py query_with_events)."""
    import asyncio

    import flechasdb_tpu as fdb
    from flechasdb_tpu.asyncdb import AsyncLocalFileSystem
    from flechasdb_tpu.asyncdb import load_database as aload

    configs = [
        # (n, m, p, d, c, k, nprobe, clusters_in_data, dup, metric)
        (400, 16, 8, 4, 8, 5, 3, None, True, "l2"),    # heavy exact ties
        (256, 24, 16, 4, 16, 40, 16, 2, False, "dot"),  # near-empty parts
        (96, 8, 4, 2, 4, 96, 4, None, False, "cosine"),  # k == N
        (500, 32, 10, 8, 16, 10, 10, 3, True, "dot"),  # nprobe=P + ties
        (400, 16, 8, 4, 8, 5, 3, None, True, "cosine"),  # dup ties, cosine
    ]
    for ci, (n, m, p, d, c, k, nprobe, nat, dup, metric) \
            in enumerate(configs):
        rng = np.random.default_rng(100 + ci)
        if nat:
            centers = rng.standard_normal((nat, m)).astype(np.float32) * 4
            x = (centers[rng.integers(0, nat, n)]
                 + rng.standard_normal((n, m)).astype(np.float32) * 0.05)
        else:
            x = rng.standard_normal((n, m)).astype(np.float32)
        if dup:
            x[n // 2:] = x[: n - n // 2]        # exact duplicate rows
        db = (DatabaseBuilder(x).with_partitions(p).with_divisions(d)
              .with_clusters(c).with_seed(1000 + ci)
              .with_metric(metric).build())
        base = tmp_path / f"fuzz{ci}"
        base.mkdir()
        root = save_database(db, LocalFileSystem(base))
        sdb = load_database(LocalFileSystem(base), f"{root}.binpb")
        queries = [x[0], x[-1],
                   rng.standard_normal(m).astype(np.float32) * 10]

        async def arun():
            adb = await aload(AsyncLocalFileSystem(base), f"{root}.binpb")
            for q in queries:
                want = db.query(q, k=k, nprobe=nprobe)
                for got in (sdb.query(q, k=k, nprobe=nprobe),
                            sdb.query(q, k=k, nprobe=nprobe),  # warm rerun
                            await adb.query(q, k=k, nprobe=nprobe)):
                    assert ([r.vector_id for r in got]
                            == [r.vector_id for r in want]), \
                        f"config {ci}: result id mismatch"
                    for g, w in zip(got, want):
                        assert g.squared_distance == pytest.approx(
                            w.squared_distance, rel=1e-4, abs=1e-5)

        asyncio.run(arun())


def test_concurrent_stored_queries_thread_safe(tmp_path):
    """8 threads hammering one StoredDatabase (cold caches shared) must all
    see the same results as a serial baseline — the partition/codebook
    caches are filled concurrently (GIL-atomic slot writes + the native
    load lock) and the batched scan path must not share mutable state."""
    from concurrent.futures import ThreadPoolExecutor

    import flechasdb_tpu as fdb

    rng = np.random.default_rng(77)
    x = rng.standard_normal((2000, 32)).astype(np.float32)
    db = (DatabaseBuilder(x).with_partitions(16).with_divisions(4)
          .with_clusters(16).with_seed(9).build())
    root = save_database(db, LocalFileSystem(tmp_path))
    queries = [x[i] for i in range(0, 200, 5)]

    baseline = fdb.load_database(LocalFileSystem(tmp_path), f"{root}.binpb")
    want = [[r.vector_id for r in baseline.query(q, k=5, nprobe=4)]
            for q in queries]

    sdb = fdb.load_database(LocalFileSystem(tmp_path), f"{root}.binpb")

    def worker(seed: int):
        order = np.random.default_rng(seed).permutation(len(queries))
        out = {}
        for qi in order:
            res = sdb.query(queries[qi], k=5, nprobe=4)
            out[int(qi)] = [r.vector_id for r in res]
        return out

    with ThreadPoolExecutor(8) as ex:
        for got in ex.map(worker, range(8)):
            for qi, ids in got.items():
                assert ids == want[qi], f"thread result diverged at q{qi}"


def test_concurrent_first_attribute_fetch_no_loss(tmp_path):
    """Two threads doing their FIRST attribute fetch on partitions A and B
    simultaneously must both land their replays in the shared table — the
    check-then-create of the attribute table used to let one thread's
    assignment discard the other's just-replayed entries while the loaded
    flag stuck, permanently losing that partition's attributes. A barrier
    inside the attributes/ read holds both threads at the widest point of
    the old race window."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    import flechasdb_tpu as fdb

    rng = np.random.default_rng(55)
    x = rng.standard_normal((400, 16)).astype(np.float32)
    db = (DatabaseBuilder(x).with_partitions(8).with_divisions(4)
          .with_clusters(8).with_seed(2).build())
    for i in range(len(x)):
        db.set_attribute_at(i, ("datum_id", i))
    root = save_database(db, LocalFileSystem(tmp_path))

    # Two query vectors whose winners live in different partitions.
    picks = []
    for i in range(40):
        r = db.query(x[i], k=1, nprobe=8)[0]
        if not picks or picks[0][1] != r.partition_index:
            picks.append((x[i], r.partition_index, r.vector_id))
        if len(picks) == 2:
            break
    assert len(picks) == 2, "corpus degenerate: one partition won all"

    barrier = threading.Barrier(2, timeout=10)
    armed = False

    class BarrierFS(LocalFileSystem):
        def open_hashed_file(self, path, compressed=False):
            if armed and str(path).startswith("attributes/"):
                try:
                    barrier.wait()
                except threading.BrokenBarrierError:
                    pass
            return super().open_hashed_file(path, compressed)

    for _ in range(5):   # repeat: the residual window is scheduler-timed
        sdb = load_database(BarrierFS(tmp_path), f"{root}.binpb")
        barrier.reset()
        armed = True

        def fetch(pick):
            qv, _, vid = pick
            res = sdb.query(qv, k=1, nprobe=8)[0]
            assert res.vector_id == vid
            return res.get_attribute("datum_id")

        with ThreadPoolExecutor(2) as ex:
            got = list(ex.map(fetch, picks))
        armed = False   # the serial load-all below must not wait
        assert all(g is not None for g in got), got
        # Both partitions' replays must persist: every vector of each
        # probed partition is resolvable afterwards.
        for qv, _, vid in picks:
            assert sdb.get_attribute(vid, "datum_id") is not None
