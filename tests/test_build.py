"""Builder + in-memory database tests.

Exact-semantics checks vs a NumPy brute-force oracle (SURVEY §7 phase 3):
the fused masked-scan query must return exactly what the reference algorithm
(per-partition ADC table + scan + global merge) computes.
"""

import numpy as np
import pytest

from flechasdb_tpu import events as ev
from flechasdb_tpu.build import Database, DatabaseBuilder, QueryResult
from flechasdb_tpu.errors import InvalidArgs


@pytest.fixture(scope="module")
def db():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((500, 16)).astype(np.float32)
    return x, (DatabaseBuilder(x)
               .with_partitions(8)
               .with_divisions(4)
               .with_clusters(8)
               .with_seed(123)
               .build())


def _oracle_query(db: Database, v, k, nprobe):
    """Reference algorithm in NumPy (db/build.rs:307-382, 521-565)."""
    v = np.asarray(v, np.float32)
    cents = db.partition_centroids
    coarse = ((v[None] - cents) ** 2).sum(-1)
    probed = np.argsort(coarse, kind="stable")[:nprobe]
    m_sub = db.subvector_size
    out = []
    for pi in probed:
        local = v - cents[pi]
        # ADC table [D, C]
        table = np.stack([
            ((local[d * m_sub:(d + 1) * m_sub][None]
              - db.codebooks[d]) ** 2).sum(-1)
            for d in range(db.num_divisions)
        ])
        members = np.nonzero(db.partition_indices == pi)[0]
        for lv, vi in enumerate(members):
            dist = sum(table[d, db.codes[vi, d]]
                       for d in range(db.num_divisions))
            out.append((float(dist), int(pi), int(vi), lv))
    out.sort(key=lambda t: t[0])
    return out[:k]


def test_build_shapes(db):
    x, d = db
    assert d.num_vectors == 500
    assert d.partition_centroids.shape == (8, 16)
    assert d.codebooks.shape == (4, 8, 4)
    assert d.codes.shape == (500, 4)
    assert d.codes.max() < 8
    assert len(set(d.vector_ids)) == 500
    # every partition non-empty (reference asserts this during Lloyd's)
    assert len(np.unique(d.partition_indices)) == 8


def test_residue_reconstruction(db):
    x, d = db
    for i in [0, 17, 499]:
        assert np.allclose(d.reconstruct(i), x[i], rtol=1e-4, atol=1e-5)


def test_query_matches_oracle(db):
    x, d = db
    rng = np.random.default_rng(3)
    for _ in range(5):
        v = rng.standard_normal(16).astype(np.float32)
        got = d.query(v, k=10, nprobe=3)
        want = _oracle_query(d, v, 10, 3)
        assert len(got) == len(want)
        for g, (dist, pi, vi, lv) in zip(got, want):
            assert g.squared_distance == pytest.approx(dist, rel=1e-4)
            assert g.partition_index == pi
            assert g.vector_id == d.vector_ids[vi]
            assert g.vector_index == lv


def test_query_batch_matches_single(db):
    x, d = db
    rng = np.random.default_rng(5)
    vs = rng.standard_normal((6, 16)).astype(np.float32)
    batched = d.query_batch(vs, k=5, nprobe=2)
    for b, v in enumerate(vs):
        single = d.query(v, k=5, nprobe=2)
        assert [r.vector_id for r in single] == \
            [r.vector_id for r in batched[b]]


def test_nprobe_full_equals_exhaustive_pq(db):
    """nprobe = P must rank all vectors by PQ distance."""
    x, d = db
    v = np.zeros(16, np.float32)
    got = d.query(v, k=500, nprobe=8)
    assert len(got) == 500
    dists = [r.squared_distance for r in got]
    assert dists == sorted(dists)


def test_recall_vs_exact_knn(db):
    """PQ recall@10 against exact brute force should be substantially
    better than chance (SURVEY §4: the reference has no recall tests)."""
    x, d = db
    rng = np.random.default_rng(11)
    hits = total = 0
    for _ in range(20):
        v = rng.standard_normal(16).astype(np.float32)
        exact = np.argsort(((x - v) ** 2).sum(-1))[:10]
        exact_ids = {d.vector_ids[i] for i in exact}
        got = {r.vector_id for r in d.query(v, k=10, nprobe=8)}
        hits += len(exact_ids & got)
        total += 10
    assert hits / total > 0.3  # coarse PQ (D=4, C=8) on random data


def test_query_validation(db):
    x, d = db
    with pytest.raises(InvalidArgs):
        d.query(np.zeros(16, np.float32), k=5, nprobe=9)  # nprobe > P
    with pytest.raises(InvalidArgs):
        d.query(np.zeros(16, np.float32), k=0, nprobe=1)
    with pytest.raises(InvalidArgs):
        d.query(np.zeros(8, np.float32), k=5, nprobe=1)  # wrong size


def test_attributes_roundtrip(db):
    x, d = db
    d.set_attribute_at(0, ("datum_id", 42))
    d.set_attribute_at(0, ("label", "hello"))
    d.set_attribute_at(0, ("datum_id", 43))  # overwrite
    vid = d.vector_ids[0]
    assert d.get_attribute(vid, "datum_id") == 43
    assert d.get_attribute(vid, "label") == "hello"
    assert d.get_attribute(vid, "missing") is None
    with pytest.raises(InvalidArgs):
        d.get_attribute(__import__("uuid").uuid4(), "x")
    with pytest.raises(InvalidArgs):
        d.set_attribute_at(1000, ("k", 1))
    with pytest.raises(InvalidArgs):
        d.set_attribute_at(0, ("k", -1))


def test_builder_validation():
    x = np.zeros((10, 8), np.float32)
    with pytest.raises(InvalidArgs):
        DatabaseBuilder(x).with_partitions(11).build()   # N < P
    with pytest.raises(InvalidArgs):
        DatabaseBuilder(x).with_divisions(3).with_partitions(2) \
            .with_clusters(2).build()                     # M % D != 0
    with pytest.raises(InvalidArgs):
        DatabaseBuilder(x).with_partitions(0)


def test_build_determinism():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((100, 8)).astype(np.float32)
    d1 = (DatabaseBuilder(x).with_partitions(4).with_divisions(2)
          .with_clusters(4).with_seed(9).build())
    d2 = (DatabaseBuilder(x).with_partitions(4).with_divisions(2)
          .with_clusters(4).with_seed(9).build())
    assert d1.vector_ids == d2.vector_ids
    assert np.array_equal(d1.codes, d2.codes)
    assert np.array_equal(d1.partition_centroids, d2.partition_centroids)


def test_build_events_order():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((60, 8)).astype(np.float32)
    seen = []
    (DatabaseBuilder(x).with_partitions(3).with_divisions(2)
     .with_clusters(4).with_seed(1).build(seen.append))
    kinds = [type(e).__name__ for e in seen]
    for name in ["StartingIdAssignment", "FinishedIdAssignment",
                 "StartingPartitioning", "FinishedPartitioning",
                 "StartingSubvectorDivision", "FinishedSubvectorDivision",
                 "StartingQuantization", "FinishedQuantization"]:
        assert name in kinds
    assert kinds.index("StartingPartitioning") < \
        kinds.index("StartingSubvectorDivision")
    assert any(isinstance(e, ev.ClusterEvent) for e in seen)


def test_query_k_exceeds_corpus(rng):
    """k > N returns every reachable vector, not an error
    (the reference truncates results the same way, build.rs:334-337)."""
    import flechasdb_tpu as fdb
    x = rng.standard_normal((40, 16)).astype(np.float32)
    db = (fdb.DatabaseBuilder(x).with_partitions(4).with_divisions(4)
          .with_clusters(8).with_seed(13).build())
    res = db.query(x[0], k=100, nprobe=4)
    assert len(res) == 40
    assert res[0].vector_id == db.vector_ids[0]
    # pruned path with k exceeding one partition's bucket too
    res1 = db.query(x[0], k=100, nprobe=1)
    assert 0 < len(res1) <= 40


def test_with_fast_math_builds_working_db():
    """with_fast_math() must produce a serveable database of normal
    quality (self-neighbor recovered) and refuse the f64 oracle path."""
    rng = np.random.default_rng(11)
    x = rng.standard_normal((400, 16)).astype(np.float32)
    fdb = (DatabaseBuilder(x).with_partitions(8).with_divisions(4)
           .with_clusters(8).with_seed(5).with_fast_math().build())
    hits = 0
    for i in range(10):
        res = fdb.query(x[i], k=1, nprobe=8)
        hits += res[0].vector_id == fdb.vector_ids[i]
    assert hits >= 9, hits

    with pytest.raises(InvalidArgs, match="fast_math"):
        (DatabaseBuilder(x.astype(np.float64), dtype=np.float64)
         .with_partitions(4).with_divisions(4).with_clusters(4)
         .with_fast_math().build())


def test_with_residues_false_skips_retention(rng):
    """`.with_residues(False)` drops the N×M residual retention (and the
    full-corpus device→host fetch behind it, build.py round 4); queries
    and save/load still work, while the two residue-backed conveniences
    raise like any reference database (which stores only codes)."""
    x = rng.standard_normal((300, 16)).astype(np.float32)
    db = (DatabaseBuilder(x).with_partitions(4).with_divisions(4)
          .with_clusters(8).with_seed(3).with_residues(False).build())
    assert db.residues is None
    res = db.query(x[5], k=3, nprobe=2)
    assert len(res) == 3
    with pytest.raises(InvalidArgs, match="residues"):
        db.reconstruct(0)
    with pytest.raises(InvalidArgs, match="residues"):
        db.query_batch(x[5:6], k=3, nprobe=2, rerank=10)

    import tempfile

    import flechasdb_tpu as fdb

    with tempfile.TemporaryDirectory() as td:
        root = fdb.save_database(db, fdb.LocalFileSystem(td))
        db2 = fdb.load_database(fdb.LocalFileSystem(td), f"{root}.binpb")
        res2 = db2.query(x[5], k=3, nprobe=2)
        assert [r.vector_id for r in res] == [r.vector_id for r in res2]

    # default (and explicit True) keeps round-3 behavior
    db3 = (DatabaseBuilder(x).with_partitions(4).with_divisions(4)
           .with_clusters(8).with_seed(3).with_residues(True).build())
    assert db3.residues is not None and db3.residues.shape == x.shape
    np.testing.assert_allclose(db3.reconstruct(0), x[0], rtol=1e-4,
                               atol=1e-4)
