"""Distance-metric extension tests (metrics.py: "l2" | "dot" | "cosine").

The reference is squared-L2 only; these pin the extension's contract:
dot (MIPS) ranks by the exact negated inner product through every query
path, cosine is bit-identical to L2 over normalized vectors, and the
metric round-trips through the wire format (root extension field 21).
"""

import asyncio
import uuid as _uuid

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flechasdb_tpu as fdb
from flechasdb_tpu.errors import InvalidArgs, InvalidData
from flechasdb_tpu.metrics import check_metric, normalize_rows
from flechasdb_tpu.ops.adc import query_masked_scan
from flechasdb_tpu.ops.bucketed import bucketize, query_bucketed
from flechasdb_tpu.ops.exact import exact_topk


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2000, 32), dtype=np.float32)
    q = rng.standard_normal((5, 32), dtype=np.float32)
    return x, q


@pytest.fixture(scope="module")
def dot_db(corpus):
    x, _ = corpus
    return (fdb.DatabaseBuilder(x).with_partitions(8).with_divisions(4)
            .with_clusters(16).with_seed(1).with_metric("dot").build())


def _dot_adc_oracle(q, cents, cbs, codes, pidx):
    """−⟨q, x̂⟩ for every corpus row, straight from the definition."""
    d, c, sub = cbs.shape
    qd = q.reshape(len(q), d, sub)
    tab = np.einsum("bds,dcs->bdc", qd, cbs)            # [B, D, C]
    percode = tab[:, np.arange(d)[None, :], codes]      # [B, N, D]
    return -(q @ cents[pidx].T) - percode.sum(-1)       # [B, N]


# -- validation ------------------------------------------------------------

def test_check_metric():
    assert check_metric("") == "l2"
    assert check_metric("dot") == "dot"
    with pytest.raises(InvalidArgs):
        check_metric("euclidean")
    with pytest.raises(InvalidArgs):
        fdb.DatabaseBuilder(np.zeros((4, 4), np.float32)).with_metric("ip")


def test_cosine_rejects_zero_vectors(corpus):
    x, _ = corpus
    bad = x[:64].copy()
    bad[13] = 0.0
    with pytest.raises(InvalidArgs, match="zero norm"):
        (fdb.DatabaseBuilder(bad).with_partitions(4).with_divisions(4)
         .with_clusters(8).with_metric("cosine").build())


def test_cosine_rejects_zero_query(corpus):
    x, _ = corpus
    db = (fdb.DatabaseBuilder(x[:256]).with_partitions(4).with_divisions(4)
          .with_clusters(8).with_seed(3).with_metric("cosine").build())
    with pytest.raises(InvalidArgs, match="zero norm"):
        db.query(np.zeros(32, np.float32), k=3, nprobe=4)


# -- kernel exactness --------------------------------------------------------

def test_dot_kernels_match_numpy_oracle(corpus, dot_db):
    x, q = corpus
    db = dot_db
    cents, cbs = db.partition_centroids, db.codebooks
    codes, pidx = db.codes.astype(np.int32), db.partition_indices
    oracle = _dot_adc_oracle(q, cents, cbs, codes, pidx)
    want_d = np.sort(oracle, axis=1)[:, :10]
    want_r = np.argsort(oracle, axis=1)[:, :10]

    dm, rm, _ = query_masked_scan(
        jnp.asarray(q), jnp.asarray(cents), jnp.asarray(cbs),
        jnp.asarray(codes), jnp.asarray(pidx), k=10, nprobe=8,
        metric="dot")
    np.testing.assert_allclose(np.asarray(dm), want_d, atol=1e-5)
    assert (np.sort(np.asarray(rm), 1) == np.sort(want_r, 1)).all()

    buck = bucketize(codes, pidx, 8, pack="auto")
    db_, rb, _ = query_bucketed(
        jnp.asarray(q), jnp.asarray(cents), jnp.asarray(cbs), buck,
        k=10, nprobe=8, metric="dot")
    np.testing.assert_allclose(np.asarray(db_), want_d, atol=1e-5)
    assert (np.sort(np.asarray(rb), 1) == np.sort(want_r, 1)).all()


def test_dot_kernels_with_opq_rotation(corpus):
    """⟨q, x⟩ decomposition under an orthogonal rotation stays exact."""
    x, q = corpus
    db = (fdb.DatabaseBuilder(x).with_partitions(8).with_divisions(4)
          .with_clusters(16).with_seed(2).with_metric("dot")
          .with_opq(iters=3).build())
    cents, cbs, rot = db.partition_centroids, db.codebooks, db.rotation
    codes, pidx = db.codes.astype(np.int32), db.partition_indices
    oracle = _dot_adc_oracle(q @ rot, cents @ rot, cbs, codes, pidx)
    # coarse term uses the UNROTATED inner product; rotation is orthogonal
    # so ⟨q, c⟩ == ⟨qR, cR⟩ and the rotated oracle is the same quantity.
    dm, rm, _ = query_masked_scan(
        jnp.asarray(q), jnp.asarray(cents), jnp.asarray(cbs),
        jnp.asarray(codes), jnp.asarray(pidx), jnp.asarray(rot),
        k=10, nprobe=8, metric="dot")
    np.testing.assert_allclose(
        np.asarray(dm), np.sort(oracle, axis=1)[:, :10], atol=1e-4)


def test_exact_topk_dot(corpus):
    x, q = corpus
    d, r = exact_topk(jnp.asarray(q), jnp.asarray(x), k=10, metric="dot")
    want = np.sort(-(q @ x.T), axis=1)[:, :10]
    np.testing.assert_allclose(np.asarray(d), want, atol=1e-4)


# -- cosine == L2 over unit vectors ------------------------------------------

def test_cosine_is_l2_on_normalized(corpus):
    x, q = corpus
    xn = normalize_rows(x)
    dbc = (fdb.DatabaseBuilder(x).with_partitions(8).with_divisions(4)
           .with_clusters(16).with_seed(1).with_metric("cosine").build())
    dbl = (fdb.DatabaseBuilder(xn).with_partitions(8).with_divisions(4)
           .with_clusters(16).with_seed(1).build())
    # cosine is scale-invariant in the query
    rc = dbc.query(q[0] * 7.5, k=5, nprobe=8)
    rl = dbl.query(q[0] / np.linalg.norm(q[0]), k=5, nprobe=8)
    assert [r.vector_index for r in rc] == [r.vector_index for r in rl]
    np.testing.assert_allclose([r.squared_distance for r in rc],
                               [r.squared_distance for r in rl], atol=1e-5)
    # key = 2 − 2·cos ⇒ recoverable similarity in [−1, 1]
    sims = [1.0 - r.squared_distance / 2.0 for r in rc]
    assert all(-1.0001 <= s <= 1.0001 for s in sims)


# -- in-memory paths ---------------------------------------------------------

def test_dot_keys_are_negated_inner_products(corpus, dot_db):
    x, q = corpus
    db = dot_db
    res = db.query_batch(q, k=5, nprobe=8, rerank=64)
    row_of = {vid: i for i, vid in enumerate(db.vector_ids)}
    for b in range(len(q)):
        for r in res[b]:
            ip = float(q[b] @ x[row_of[r.vector_id]])
            assert abs(r.squared_distance + ip) < 1e-3
    # negative keys must survive (no L2 clamp under dot)
    assert any(r.squared_distance < 0 for rs in res for r in rs)


def test_dot_rerank_improves_recall(corpus, dot_db):
    x, q = corpus
    db = dot_db
    exact = np.argsort(-(q @ x.T), axis=1)[:, :5]
    want = [{db.vector_ids[i] for i in exact[b]} for b in range(len(q))]

    def recall(res):
        return np.mean([
            len({r.vector_id for r in res[b]} & want[b]) / 5
            for b in range(len(q))])

    plain = recall(db.query_batch(q, k=5, nprobe=8))
    rer = recall(db.query_batch(q, k=5, nprobe=8, rerank=400))
    assert rer >= plain
    assert rer >= 0.8   # 400 exact re-scores out of 2000 rows


def test_dot_with_filters(corpus, dot_db):
    x, q = corpus
    db = dot_db
    for i in range(0, db.num_vectors, 2):
        db.set_attribute_at(i, ("parity", 0))
    res = db.query(q[0], k=5, nprobe=8, where=fdb.Eq("parity", 0))
    assert res
    row_of = {vid: i for i, vid in enumerate(db.vector_ids)}
    assert all(row_of[r.vector_id] % 2 == 0 for r in res)


# -- persistence -------------------------------------------------------------

def test_metric_roundtrip_and_parity(tmp_path, corpus, dot_db):
    x, q = corpus
    db = dot_db
    fs = fdb.LocalFileSystem(str(tmp_path))
    root = fdb.save_database(db, fs)
    sdb = fdb.load_database(fs, f"{root}.binpb")
    assert sdb.metric == "dot"
    mem = db.query(q[0], k=5, nprobe=8)

    cold = sdb.query(q[0], k=5, nprobe=8)
    assert [r.vector_id for r in cold] == [r.vector_id for r in mem]
    np.testing.assert_allclose([r.squared_distance for r in cold],
                               [r.squared_distance for r in mem], atol=1e-4)

    warm_db = fdb.load_database(fs, f"{root}.binpb")
    warm_db.preload()
    warm = warm_db.query(q[0], k=5, nprobe=8)
    assert [r.vector_id for r in warm] == [r.vector_id for r in mem]
    # keys too: a warm-path clamp/sign regression must not hide behind
    # identical ranking (dot keys are negative inner products)
    np.testing.assert_allclose([r.squared_distance for r in warm],
                               [r.squared_distance for r in mem], atol=1e-4)

    # to_database keeps the metric (update story)
    mat = sdb.to_database()
    assert mat.metric == "dot"
    again = mat.query(q[0], k=5, nprobe=8)
    assert [r.vector_id for r in again] == [r.vector_id for r in mem]


def test_metric_roundtrip_async(tmp_path, corpus, dot_db):
    from flechasdb_tpu.asyncdb import io as aio
    from flechasdb_tpu.asyncdb import stored as astored

    x, q = corpus
    db = dot_db
    fs = fdb.LocalFileSystem(str(tmp_path))
    root = fdb.save_database(db, fs)
    mem = db.query(q[0], k=5, nprobe=8)

    async def go():
        afs = aio.AsyncLocalFileSystem(str(tmp_path))
        adb = await astored.load_database(afs, f"{root}.binpb")
        assert adb.metric == "dot"
        return await adb.query(q[0], k=5, nprobe=8)

    res = asyncio.run(go())
    assert [r.vector_id for r in res] == [r.vector_id for r in mem]
    np.testing.assert_allclose([r.squared_distance for r in res],
                               [r.squared_distance for r in mem], atol=1e-4)


def test_async_save_keeps_metric(tmp_path, dot_db):
    """The concurrent saver writes the same root (incl. field 21) as the
    sync one — byte-identical tree for a dot-metric database."""
    from flechasdb_tpu.asyncdb.save import save_database as async_save

    sync_dir, async_dir = tmp_path / "s", tmp_path / "a"
    root_s = fdb.save_database(dot_db, fdb.LocalFileSystem(str(sync_dir)))
    root_a = asyncio.run(async_save(
        dot_db, fdb.LocalFileSystem(str(async_dir))))
    assert root_a == root_s
    sdb = fdb.load_database(fdb.LocalFileSystem(str(async_dir)),
                            f"{root_a}.binpb")
    assert sdb.metric == "dot"


def test_l2_root_stays_reference_compatible(tmp_path, corpus):
    """An L2 database writes NO metric field — byte-level reference
    compatibility is pinned by test_golden.py; here: absent field reads
    back as 'l2'."""
    x, _ = corpus
    db = (fdb.DatabaseBuilder(x[:256]).with_partitions(4).with_divisions(4)
          .with_clusters(8).with_seed(3).build())
    fs = fdb.LocalFileSystem(str(tmp_path))
    root = fdb.save_database(db, fs)
    sdb = fdb.load_database(fs, f"{root}.binpb")
    assert sdb.metric == "l2"
    assert getattr(sdb.root, "metric", "") == ""


def test_unknown_metric_rejected_at_load():
    from flechasdb_tpu.protos.messages import PDatabase
    from flechasdb_tpu.stored import validate_root

    root = PDatabase(vector_size=8, num_partitions=1, num_divisions=1,
                     num_codes=1, partition_ids=["a"], codebook_ids=["b"],
                     metric="hamming")
    with pytest.raises(InvalidData, match="unknown metric"):
        validate_root(root)


# -- sharded (8-device CPU mesh) ----------------------------------------------

def test_sharded_dot_matches_single_device(corpus, dot_db):
    from flechasdb_tpu.serving import DeviceIndex, ShardedIndex
    from flechasdb_tpu.parallel import corpus_mesh

    x, q = corpus
    db = dot_db
    mesh = corpus_mesh(jax.devices("cpu"))
    args = (db.partition_centroids, db.codebooks,
            db.codes.astype(np.int32), db.partition_indices)
    for layout in ("bucketed", "masked"):
        single = DeviceIndex(*args, layout=layout, metric="dot")
        sharded = ShardedIndex(*args, layout=layout, metric="dot",
                               mesh=mesh)
        sd, sr, _ = single.query(q, k=10, nprobe=5)
        md, mr, _ = sharded.query(q, k=10, nprobe=5)
        np.testing.assert_allclose(md, sd, atol=1e-5)
        assert (np.sort(mr, 1) == np.sort(sr, 1)).all()


def test_sharded_exact_dot(corpus):
    from flechasdb_tpu.parallel import corpus_mesh, exact_sharded, shard_flat

    x, q = corpus
    mesh = corpus_mesh(jax.devices("cpu"))
    xs, n = shard_flat(mesh, x)
    sd, sr = exact_sharded(jnp.asarray(q), xs, mesh=mesh, k=9, n=n,
                           metric="dot")
    want = np.sort(-(q @ x.T), axis=1)[:, :9]
    np.testing.assert_allclose(np.asarray(sd), want, atol=1e-4)


# -- flat tier ----------------------------------------------------------------

def test_flat_dot_and_cosine(tmp_path, corpus):
    x, q = corpus
    xs = x[:512]
    flat = fdb.FlatDatabase(xs, seed=5, metric="dot")
    res = flat.query(q[0], k=5)
    want = np.argsort(-(q[0] @ xs.T))[:5]
    assert [r.vector_index for r in res] == want.tolist()
    np.testing.assert_allclose(
        [r.squared_distance for r in res],
        np.sort(-(q[0] @ xs.T))[:5], atol=1e-4)

    # save → load keeps the metric; stored query matches
    fs = fdb.LocalFileSystem(str(tmp_path))
    root = fdb.save_flat_database(flat, fs)
    stored = fdb.load_flat_database(fs, f"{root}.binpb")
    assert stored.metric == "dot"
    sres = stored.query(q[0], k=5)
    assert [r.vector_index for r in sres] == want.tolist()
    assert stored.to_database().metric == "dot"

    async def go():
        from flechasdb_tpu.asyncdb.io import AsyncLocalFileSystem
        adb = await fdb.load_flat_database_async(
            AsyncLocalFileSystem(str(tmp_path)), f"{root}.binpb")
        return await adb.query(q[0], k=5)

    ares = asyncio.run(go())
    assert [r.vector_index for r in ares] == want.tolist()

    # cosine flat: ranking == exact cosine similarity ranking
    fc = fdb.FlatDatabase(xs, seed=5, metric="cosine")
    rc = fc.query(q[0] * 4.0, k=5)
    xn = xs / np.linalg.norm(xs, axis=1, keepdims=True)
    qn = q[0] / np.linalg.norm(q[0])
    assert [r.vector_index for r in rc] == \
        np.argsort(-(qn @ xn.T))[:5].tolist()


# -- streaming builder ---------------------------------------------------------

def test_flat_cosine_resave_is_byte_identical(tmp_path, corpus):
    """to_database must NOT re-normalize the already-unit cosine corpus:
    f32 unit norms are ~0.99999994, so a second normalize flips mantissa
    bits and every artifact re-hashes — breaking the O(touched) update
    contract. Save → load → materialize → save must add zero files."""
    import os

    x, _ = corpus
    flat = fdb.FlatDatabase(x[:512], seed=5, metric="cosine")
    fs = fdb.LocalFileSystem(str(tmp_path))
    root1 = fdb.save_flat_database(flat, fs)
    files1 = sorted(str(p) for p in tmp_path.rglob("*") if p.is_file())
    stored = fdb.load_flat_database(fs, f"{root1}.binpb")
    mat = stored.to_database()
    assert mat.metric == "cosine"
    root2 = fdb.save_flat_database(mat, fs)
    files2 = sorted(str(p) for p in tmp_path.rglob("*") if p.is_file())
    assert root2 == root1
    assert files2 == files1
    # and appends still normalize under the carried metric
    mat.append(np.full((1, 32), 3.0, np.float32))
    np.testing.assert_allclose(np.linalg.norm(mat.vectors[-1]), 1.0,
                               atol=1e-6)


def test_streaming_metric_parity(corpus):
    x, q = corpus
    sdb = (fdb.StreamingDatabaseBuilder(x).with_partitions(8)
           .with_divisions(4).with_clusters(16).with_seed(1)
           .with_metric("dot").build())
    assert sdb.metric == "dot"
    # same ADC oracle contract as the in-memory builder
    oracle = _dot_adc_oracle(q, sdb.partition_centroids, sdb.codebooks,
                             sdb.codes.astype(np.int32),
                             sdb.partition_indices)
    res = sdb.query(q[0], k=5, nprobe=8)
    np.testing.assert_allclose([r.squared_distance for r in res],
                               np.sort(oracle[0])[:5], atol=1e-4)

    # cosine: streamed rows normalize chunk by chunk — the index's
    # reconstructions must be unit vectors (centroid + codebook decode of
    # every row's code lands near the unit sphere).
    c1 = (fdb.StreamingDatabaseBuilder(x).with_partitions(8)
          .with_divisions(4).with_clusters(16).with_seed(1)
          .with_chunk_rows(300).with_metric("cosine").build())
    assert c1.metric == "cosine"
    d, _, sub = c1.codebooks.shape
    decoded = (c1.partition_centroids[c1.partition_indices]
               + c1.codebooks[np.arange(d)[None, :],
                              c1.codes.astype(np.int64)]
               .reshape(len(x), -1))
    norms = np.linalg.norm(decoded, axis=1)
    assert 0.5 < norms.mean() < 1.5      # unit corpus, quantization noise
    # and the query is normalized on entry: scale invariance holds
    r_a = c1.query(q[0], k=5, nprobe=8)
    r_b = c1.query(q[0] * 100.0, k=5, nprobe=8)
    assert [r.vector_index for r in r_a] == [r.vector_index for r in r_b]


def test_add_vectors_normalizes_under_cosine(corpus):
    x, q = corpus
    db = (fdb.DatabaseBuilder(x[:512]).with_partitions(4).with_divisions(4)
          .with_clusters(8).with_seed(3).with_metric("cosine").build())
    new = np.full((2, 32), 9.0, np.float32)
    ids = db.add_vectors(new)
    rows = [db.vector_ids.index(i) for i in ids]
    np.testing.assert_allclose(
        np.linalg.norm(db.residues[rows]
                       + db.partition_centroids[
                           db.partition_indices[rows]], axis=1),
        1.0, atol=1e-5)
