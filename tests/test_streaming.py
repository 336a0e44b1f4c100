"""Streaming (out-of-core) build — ``flechasdb_tpu/streaming.py``.

The corpus source is only ever touched through bounded row slices, so
builds scale past device and host memory. These tests pin: bounded access
(the source never materializes more than a sample/chunk at once), quality
parity with the in-memory builder, end-to-end save/load/query, memmap
sources, determinism, and the error surface.
"""

import numpy as np
import pytest

import flechasdb_tpu as fdb
from flechasdb_tpu import events as ev
from flechasdb_tpu.streaming import StreamingDatabaseBuilder


class TrackingSource:
    """ndarray wrapper that records the largest row batch ever requested
    (and rejects whole-array reads), proving the build stays out-of-core."""

    def __init__(self, x):
        self._x = x
        self.shape = x.shape
        self.max_rows = 0

    def __getitem__(self, key):
        got = self._x[key]
        if got.ndim == 2:
            self.max_rows = max(self.max_rows, got.shape[0])
        return got


def _lowdim(rng, w, n):
    z = rng.standard_normal((n, w.shape[0])).astype(np.float32)
    noise = 0.05 * rng.standard_normal((n, w.shape[1])).astype(np.float32)
    return (z @ w + noise).astype(np.float32)


def _exact_topk(x, q, k):
    d = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    return np.argsort(d, axis=1, kind="stable")[:, :k]


def _recall(db, q, gt):
    id_to_row = {vid: i for i, vid in enumerate(db.vector_ids)}
    hits = 0
    res = db.query_batch(q, k=10, nprobe=4)
    for b, rs in enumerate(res):
        got = {id_to_row[r.vector_id] for r in rs}
        hits += len(got & set(gt[b].tolist()))
    return hits / (len(q) * 10)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    w = rng.standard_normal((4, 32)).astype(np.float32)
    x = _lowdim(rng, w, 6000)
    q = _lowdim(rng, w, 50)
    return x, q, _exact_topk(x, q, 10)


def test_streamed_build_bounded_access_and_quality(corpus):
    """Caps + small chunks engaged: the source is only read in bounded
    slices, and recall matches the full in-memory build within noise."""
    x, q, gt = corpus
    src = TrackingSource(x)
    db = (StreamingDatabaseBuilder(src)
          .with_partitions(16).with_divisions(4).with_clusters(32)
          .with_seed(7)
          .with_training_caps(coarse_cap=2048, pq_cap=2048)
          .with_chunk_rows(512)
          .build())
    # Bounded: the training gather (<= 2048 unique sampled rows) and the
    # 512-row encode chunks are the only reads.
    assert src.max_rows <= 2048
    assert db.num_vectors == len(x)
    assert db.residues is None
    assert db.codes.shape == (len(x), 4)
    assert set(np.unique(db.partition_indices)) <= set(range(16))

    ref = (fdb.DatabaseBuilder(x)
           .with_partitions(16).with_divisions(4).with_clusters(32)
           .with_seed(7).build())
    r_stream, r_mem = _recall(db, q, gt), _recall(ref, q, gt)
    assert r_stream > r_mem - 0.05, (r_stream, r_mem)

    # Reconstruction/rerank need retained originals — gated, not wrong.
    with pytest.raises(fdb.InvalidArgs):
        db.reconstruct(0)
    with pytest.raises(fdb.InvalidArgs):
        db.query_batch(q[:2], k=5, nprobe=4, rerank=10)


def test_streamed_save_load_query_roundtrip(corpus, tmp_path):
    x, _, _ = corpus
    db = (StreamingDatabaseBuilder(x[:2000])
          .with_partitions(8).with_divisions(4).with_clusters(16)
          .with_seed(3).with_chunk_rows(300).build())
    for i in range(100):
        db.set_attribute_at(i, ("tag", f"v{i}"))
    root = fdb.save_database(db, fdb.LocalFileSystem(tmp_path))
    sdb = fdb.load_database(fdb.LocalFileSystem(tmp_path), f"{root}.binpb")
    want = db.query(x[5], k=5, nprobe=8)
    got = sdb.query(x[5], k=5, nprobe=8)
    assert [r.vector_id for r in got] == [r.vector_id for r in want]
    assert got[0].vector_id == db.vector_ids[5]
    assert got[0].get_attribute("tag") == "v5"


def test_streamed_memmap_source(corpus, tmp_path):
    """An on-disk .npy memmap — the intended >RAM source — works and
    matches the same build from the in-RAM copy of the same data."""
    x, _, _ = corpus
    mm = np.lib.format.open_memmap(
        tmp_path / "corpus.npy", mode="w+", dtype=np.float32,
        shape=x[:1500].shape)
    mm[:] = x[:1500]
    mm.flush()
    build = lambda src: (StreamingDatabaseBuilder(src)
                         .with_partitions(8).with_divisions(4)
                         .with_clusters(16).with_seed(9)
                         .with_chunk_rows(256).build())
    db_mm, db_ram = build(mm), build(x[:1500])
    np.testing.assert_array_equal(db_mm.codes, db_ram.codes)
    np.testing.assert_array_equal(db_mm.partition_indices,
                                  db_ram.partition_indices)


def test_streamed_slice_only_source(corpus):
    """Sources without fancy indexing (contiguous slices only) use the
    grouped-range fallback gather and produce the identical database."""
    x, _, _ = corpus

    class SliceOnly:
        shape = x[:1500].shape

        def __getitem__(self, key):
            if not isinstance(key, slice):
                raise TypeError("slices only")
            return x[:1500][key]

    build = lambda src: (StreamingDatabaseBuilder(src)
                         .with_partitions(8).with_divisions(4)
                         .with_clusters(16).with_seed(9)
                         .with_training_caps(coarse_cap=600, pq_cap=600)
                         .with_chunk_rows(256).build())
    db_s, db_a = build(SliceOnly()), build(x[:1500])
    np.testing.assert_array_equal(db_s.codes, db_a.codes)
    np.testing.assert_array_equal(db_s.partition_indices,
                                  db_a.partition_indices)


def test_streamed_deterministic_and_events(corpus):
    x, _, _ = corpus
    seen = []
    build = lambda h: (StreamingDatabaseBuilder(x[:1200])
                       .with_partitions(8).with_divisions(4)
                       .with_clusters(16).with_seed(21)
                       .with_chunk_rows(500).build_with_events(h))
    db1 = build(seen.append)
    db2 = build(lambda e: None)
    assert db1.vector_ids == db2.vector_ids
    np.testing.assert_array_equal(db1.codes, db2.codes)
    kinds = [type(e) for e in seen]
    # Reference phase pairs (build.rs:132-153), in order.
    for klass in (ev.StartingIdAssignment, ev.StartingPartitioning,
                  ev.StartingSubvectorDivision, ev.StartingQuantization):
        assert klass in kinds
    assert kinds.index(ev.StartingPartitioning) \
        < kinds.index(ev.StartingSubvectorDivision)
    assert any(isinstance(e, ev.ClusterEvent) for e in seen)


def test_streamed_opq_rotation(corpus):
    x, q, gt = corpus
    db = (StreamingDatabaseBuilder(x)
          .with_partitions(16).with_divisions(4).with_clusters(32)
          .with_seed(7).with_opq(iters=2)
          .with_training_caps(coarse_cap=2048, pq_cap=2048)
          .with_chunk_rows(2000).build())
    assert db.rotation is not None and db.rotation.shape == (32, 32)
    # R orthogonal
    np.testing.assert_allclose(db.rotation @ db.rotation.T, np.eye(32),
                               atol=1e-4)
    assert _recall(db, q, gt) > 0.4


def test_streamed_errors():
    x = np.zeros((10, 8), np.float32)
    with pytest.raises(fdb.InvalidArgs):
        StreamingDatabaseBuilder(np.zeros((0, 8), np.float32))
    with pytest.raises(fdb.InvalidArgs):
        StreamingDatabaseBuilder(x).with_partitions(0)
    with pytest.raises(fdb.InvalidArgs):
        StreamingDatabaseBuilder(x).with_chunk_rows(0)
    with pytest.raises(fdb.InvalidArgs):   # m % d != 0
        StreamingDatabaseBuilder(x).with_divisions(3).with_clusters(4) \
            .with_partitions(2).build()
    with pytest.raises(fdb.InvalidArgs):   # n < p
        StreamingDatabaseBuilder(x).with_partitions(11).build()


def test_streamed_build_serves_sharded(corpus, tmp_path):
    """Composition: a streamed (out-of-core) build saves, loads, and
    serves SPMD over the 8-device CPU mesh with results identical to
    single-device serving — the >HBM build feeds the mesh serving path."""
    import jax

    from flechasdb_tpu.parallel import corpus_mesh

    x, _, _ = corpus
    db = (StreamingDatabaseBuilder(x[:2000])
          .with_partitions(8).with_divisions(4).with_clusters(16)
          .with_seed(13).with_chunk_rows(700).build())
    root = fdb.save_database(db, fdb.LocalFileSystem(tmp_path))

    single = fdb.load_database(fdb.LocalFileSystem(tmp_path),
                               f"{root}.binpb")
    single.preload()
    sharded = fdb.load_database(fdb.LocalFileSystem(tmp_path),
                                f"{root}.binpb")
    sharded.preload(mesh=corpus_mesh(jax.devices("cpu")))
    assert sharded._dev[0].layout.startswith("sharded")

    a = single.query_batch(x[:8], k=5, nprobe=4)
    b = sharded.query_batch(x[:8], k=5, nprobe=4)
    for ra, rb in zip(a, b):
        assert [r.vector_id for r in ra] == [r.vector_id for r in rb]


def test_streamed_build_floor_tight_caps():
    """A sample budget that floors at exactly num_partitions rows must
    still train: the without-replacement draw guarantees the cluster-count
    floor is met (a with-replacement draw deduped through unique used to
    come up short and k-means rejected a valid corpus)."""
    import flechasdb_tpu as fdb

    rng = np.random.default_rng(0)
    x = rng.standard_normal((20000, 8)).astype(np.float32)
    db = (fdb.StreamingDatabaseBuilder(x).with_partitions(1024)
          .with_divisions(2).with_clusters(16).with_seed(5)
          .with_training_caps(sample_bytes=1).build())
    assert db.num_partitions == 1024
    assert len(db.vector_ids) == 20000
    # dense-sample branch: budget floors at c but 2*s >= n
    y = rng.standard_normal((24, 4)).astype(np.float32)
    db2 = (fdb.StreamingDatabaseBuilder(y).with_partitions(2)
           .with_divisions(2).with_clusters(16).with_seed(5)
           .with_training_caps(coarse_cap=16, pq_cap=16).build())
    assert len(db2.vector_ids) == 24


def test_streamed_build_sharded_encode_matches():
    """with_mesh shards the streamed encode row-wise over the device mesh;
    per-row math is unchanged, so partition indices and codes must be
    bit-identical to the unsharded streamed build (same seed), and the
    result must serve like any other database."""
    from flechasdb_tpu.parallel import corpus_mesh

    rng = np.random.default_rng(17)
    x = rng.standard_normal((3000, 32)).astype(np.float32)

    def build(mesh):
        b = (StreamingDatabaseBuilder(x).with_partitions(16)
             .with_divisions(4).with_clusters(16).with_seed(11)
             .with_chunk_rows(700))      # 5 chunks, last padded; 700 % 8 != 0
        if mesh is not None:
            b = b.with_mesh(mesh)
        return b.build()

    base = build(None)
    sharded = build(corpus_mesh())       # 8 virtual CPU devices
    np.testing.assert_array_equal(base.partition_indices,
                                  sharded.partition_indices)
    np.testing.assert_array_equal(base.codes, sharded.codes)
    assert base.vector_ids == sharded.vector_ids     # same seed, same ids

    got = sharded.query(x[5], k=3, nprobe=16)
    want = base.query(x[5], k=3, nprobe=16)
    assert [r.vector_id for r in got] == [r.vector_id for r in want]
