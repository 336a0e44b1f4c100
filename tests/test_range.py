"""Range-search extension tests (query_range on every tier).

No reference analogue (it is k-NN only); the contract: every vector in
the probed partitions whose ranking key is <= radius, ascending, with
the same key semantics as QueryResult.squared_distance per metric
(metrics.py), composed with filters, limits, and all three metrics.
"""

import asyncio

import numpy as np
import pytest

import flechasdb_tpu as fdb
from flechasdb_tpu.errors import InvalidArgs


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1500, 32), dtype=np.float32)
    q = x[100] + 0.05 * rng.standard_normal(32).astype(np.float32)
    return x, q


@pytest.fixture(scope="module")
def db(corpus):
    x, _ = corpus
    return (fdb.DatabaseBuilder(x).with_partitions(8).with_divisions(4)
            .with_clusters(16).with_seed(1).build())


def _adc_keys(db, q):
    """Host oracle: every row's ADC key (L2), probe-independent."""
    cents, cbs = db.partition_centroids, db.codebooks
    codes, pidx = db.codes.astype(np.int64), db.partition_indices
    d, c, sub = cbs.shape
    resid = q[None] - cents                              # [P, M]
    rd = resid.reshape(len(cents), d, sub)
    tab = np.einsum("pds,dcs->pdc", rd, cbs)
    t = (np.einsum("pds,pds->pd", rd, rd)[:, :, None]
         + np.einsum("dcs,dcs->dc", cbs, cbs)[None] - 2.0 * tab)
    t = np.maximum(t, 0.0)                               # [P, D, C]
    return t[pidx[:, None], np.arange(d)[None, :], codes].sum(-1)


def test_range_matches_full_probe_oracle(corpus, db):
    x, q = corpus
    keys = _adc_keys(db, q)
    for radius in (np.percentile(keys, 1), np.percentile(keys, 10)):
        got = db.query_range(q, float(radius), nprobe=8)
        want = np.nonzero(keys <= radius)[0]
        got_rows = {db.vector_ids.index(r.vector_id) for r in got}
        assert got_rows == set(want.tolist())
        ks = [r.squared_distance for r in got]
        assert ks == sorted(ks)
        np.testing.assert_allclose(sorted(ks), np.sort(keys[want]),
                                   atol=1e-4)


def test_range_respects_nprobe_and_limit(corpus, db):
    x, q = corpus
    keys = _adc_keys(db, q)
    radius = float(np.percentile(keys, 20))
    full = db.query_range(q, radius, nprobe=8)
    pruned = db.query_range(q, radius, nprobe=2)
    # pruned results are a subset drawn from <= 2 partitions
    assert len({r.partition_index for r in pruned}) <= 2
    full_ids = {r.vector_id for r in full}
    assert all(r.vector_id in full_ids for r in pruned)
    lim = db.query_range(q, radius, nprobe=8, limit=3)
    assert len(lim) == min(3, len(full))
    assert [r.vector_id for r in lim] == [r.vector_id for r in full[:3]]


def test_range_with_filter(corpus, db):
    x, q = corpus
    for i in range(0, db.num_vectors, 3):
        db.set_attribute_at(i, ("mod3", 0))
    keys = _adc_keys(db, q)
    radius = float(np.percentile(keys, 10))
    got = db.query_range(q, radius, nprobe=8, where=fdb.Eq("mod3", 0))
    rows = [db.vector_ids.index(r.vector_id) for r in got]
    assert rows and all(r % 3 == 0 for r in rows)
    want = {r for r in np.nonzero(keys <= radius)[0].tolist() if r % 3 == 0}
    assert set(rows) == want


def test_range_validation(corpus, db):
    x, q = corpus
    with pytest.raises(InvalidArgs):
        db.query_range(q, np.inf, nprobe=2)
    with pytest.raises(InvalidArgs):
        db.query_range(q, 1.0, nprobe=0)
    with pytest.raises(InvalidArgs):
        db.query_range(q, 1.0, nprobe=999)


def test_range_masked_layout_parity(corpus, db):
    """Both device layouts return identical range sets."""
    from flechasdb_tpu.serving import DeviceIndex

    x, q = corpus
    keys = _adc_keys(db, q)
    radius = float(np.percentile(keys, 10))
    args = (db.partition_centroids, db.codebooks,
            db.codes.astype(np.int32), db.partition_indices)
    out = {}
    for layout in ("bucketed", "masked"):
        idx = DeviceIndex(*args, layout=layout)
        (rows, ks), = idx.query_range(q[None], radius, nprobe=5)
        out[layout] = (rows.tolist(), np.round(ks, 5).tolist())
    assert out["bucketed"] == out["masked"]


def test_range_stored_sync_and_async(tmp_path, corpus, db):
    x, q = corpus
    keys = _adc_keys(db, q)
    radius = float(np.percentile(keys, 10))
    mem = db.query_range(q, radius, nprobe=8)
    fs = fdb.LocalFileSystem(str(tmp_path))
    root = fdb.save_database(db, fs)

    sdb = fdb.load_database(fs, f"{root}.binpb")
    cold = sdb.query_range(q, radius, nprobe=8)
    assert [r.vector_id for r in cold] == [r.vector_id for r in mem]
    np.testing.assert_allclose([r.squared_distance for r in cold],
                               [r.squared_distance for r in mem], atol=1e-4)
    # attributes fetch through the lazy log
    assert cold[0].get_attribute("nope") is None
    # limit
    assert len(sdb.query_range(q, radius, nprobe=8, limit=2)) <= 2

    from flechasdb_tpu.asyncdb import io as aio
    from flechasdb_tpu.asyncdb import stored as astored

    async def go():
        adb = await astored.load_database(
            aio.AsyncLocalFileSystem(str(tmp_path)), f"{root}.binpb")
        return await adb.query_range(q, radius, nprobe=8)

    ares = asyncio.run(go())
    assert [r.vector_id for r in ares] == [r.vector_id for r in mem]


def test_range_dot_metric(corpus):
    x, q = corpus
    db = (fdb.DatabaseBuilder(x).with_partitions(8).with_divisions(4)
          .with_clusters(16).with_seed(1).with_metric("dot").build())
    # radius = −min_ip: ask for approximate IP >= t with full probe
    res = db.query_range(q, radius=-1.0, nprobe=8)
    assert all(r.squared_distance <= -1.0 for r in res)
    ks = [r.squared_distance for r in res]
    assert ks == sorted(ks)
    # flat (exact) dot range agrees with brute force
    flat = fdb.FlatDatabase(x, seed=2, metric="dot")
    exact = flat.query_range(q, radius=-3.0)
    want = np.nonzero(-(q @ x.T) <= -3.0)[0]
    assert {r.vector_index for r in exact} == set(want.tolist())


def test_range_cosine_flat(corpus):
    x, q = corpus
    flat = fdb.FlatDatabase(x, seed=2, metric="cosine")
    # similarity floor 0.5 ⇒ radius 2 − 2·0.5 = 1.0
    res = flat.query_range(q * 2.0, radius=1.0)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    want = np.nonzero(qn @ xn.T >= 0.5)[0]
    assert {r.vector_index for r in res} == set(want.tolist())


def test_range_flat_stored(tmp_path, corpus):
    x, q = corpus
    flat = fdb.FlatDatabase(x[:400], seed=4)
    flat.set_attribute_at(7, ("tag", 1))
    fs = fdb.LocalFileSystem(str(tmp_path))
    root = fdb.save_flat_database(flat, fs)
    stored = fdb.load_flat_database(fs, f"{root}.binpb")
    d2 = np.sum((x[:400] - q) ** 2, axis=1)
    radius = float(np.percentile(d2, 5))
    want = np.nonzero(d2 <= radius)[0]
    got = stored.query_range(q, radius)
    assert {r.vector_index for r in got} == set(want.tolist())
    mem = flat.query_range(q, radius)
    assert [r.vector_index for r in mem] == [r.vector_index for r in got]
    # filter composes
    assert all(r.vector_index == 7
               for r in stored.query_range(q, 1e9, where=fdb.Eq("tag", 1)))
