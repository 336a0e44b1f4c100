"""Flat (exact-search) database tests — the reference roadmap item."""

import numpy as np
import pytest

import flechasdb_tpu as fdb
from flechasdb_tpu.flat import (
    FlatDatabase,
    load_flat_database,
    save_flat_database,
)


@pytest.fixture
def db(rng):
    x = rng.standard_normal((500, 24)).astype(np.float32)
    db = FlatDatabase(x, seed=1)
    for i in range(0, 500, 3):
        db.set_attribute_at(i, ("datum_id", i))
    return db, x


def test_exact_query_matches_numpy(db, rng):
    db, x = db
    q = rng.standard_normal((7, 24)).astype(np.float32)
    res = db.query_batch(q, k=5)
    d = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d, axis=1, kind="stable")[:, :5]
    for b in range(7):
        got = [r.vector_index for r in res[b]]
        # rows agree up to exact-distance ties
        for gi, ri in zip(gt[b], got):
            if gi != ri:
                assert d[b, gi] == pytest.approx(d[b, ri], rel=1e-6)


def test_self_query_is_exact(db):
    db, x = db
    res = db.query(x[42], k=1)
    assert res[0].vector_index == 42
    assert res[0].squared_distance == pytest.approx(0.0, abs=1e-3)
    assert res[0].get_attribute("datum_id") == 42


def test_append_extends_corpus(db, rng):
    db, x = db
    new = rng.standard_normal((10, 24)).astype(np.float32)
    ids = db.append(new)
    assert db.num_vectors == 510
    res = db.query(new[3], k=1)
    assert res[0].vector_id == ids[3]
    with pytest.raises(fdb.InvalidArgs):
        db.append(rng.standard_normal((3, 7)).astype(np.float32))


def test_save_load_roundtrip(db, tmp_path, rng):
    db, x = db
    fs = fdb.LocalFileSystem(tmp_path)
    root = save_flat_database(db, fs)
    sdb = load_flat_database(fdb.LocalFileSystem(tmp_path),
                             f"{root}.binpb")
    assert sdb.vector_size == 24
    assert sdb.num_vectors == 500
    q = rng.standard_normal(24).astype(np.float32)
    got = sdb.query(q, k=5)
    want = db.query(q, k=5)
    assert [r.vector_id for r in got] == [r.vector_id for r in want]
    for g, w in zip(got, want):
        assert g.squared_distance == pytest.approx(w.squared_distance,
                                                   rel=1e-5)
        assert g.get_attribute("datum_id") == w.get_attribute("datum_id")


def test_save_load_multichunk(tmp_path, rng):
    """Corpora larger than CHUNK_ROWS span several content-addressed
    chunks."""
    import flechasdb_tpu.flat as flat
    old = flat.CHUNK_ROWS
    flat.CHUNK_ROWS = 128
    try:
        x = rng.standard_normal((300, 8)).astype(np.float32)
        db = FlatDatabase(x, seed=2)
        db.set_attribute_at(250, ("tag", "late-chunk"))
        fs = fdb.LocalFileSystem(tmp_path)
        root = save_flat_database(db, fs)
        sdb = load_flat_database(fdb.LocalFileSystem(tmp_path),
                                 f"{root}.binpb")
        assert len(sdb.root.chunk_ids) == 3
        res = sdb.query(x[250], k=1)
        assert res[0].vector_id == db.vector_ids[250]
        assert res[0].get_attribute("tag") == "late-chunk"
    finally:
        flat.CHUNK_ROWS = old


def test_corrupt_chunk_detected(db, tmp_path, rng):
    db, x = db
    fs = fdb.LocalFileSystem(tmp_path)
    root = save_flat_database(db, fs)
    chunk = next((tmp_path / "chunks").iterdir())
    data = bytearray(chunk.read_bytes())
    data[3] ^= 0xFF
    chunk.write_bytes(bytes(data))
    sdb = load_flat_database(fdb.LocalFileSystem(tmp_path),
                             f"{root}.binpb")
    with pytest.raises((fdb.VerificationFailure, fdb.IOError_)):
        sdb.query(x[0], k=3)


def test_async_flat_load_and_query(tmp_path, rng):
    import asyncio

    from flechasdb_tpu.asyncdb import AsyncLocalFileSystem
    from flechasdb_tpu.flat import load_flat_database_async

    x = rng.standard_normal((200, 16)).astype(np.float32)
    db = FlatDatabase(x, seed=5)
    root = save_flat_database(db, fdb.LocalFileSystem(tmp_path))

    async def go():
        adb = await load_flat_database_async(
            AsyncLocalFileSystem(tmp_path), f"{root}.binpb")
        return await adb.query(x[33], k=3)

    res = asyncio.run(go())
    assert res[0].vector_id == db.vector_ids[33]
    assert res[0].squared_distance == pytest.approx(0.0, abs=1e-3)


def test_async_flat_attrs_filters_range(tmp_path, rng):
    """Async flat tier parity with the sync one: awaitable attribute
    fetch (concurrent log loads), where= filters, query_range — across a
    multi-chunk store (id slices per chunk must line up with the
    saver's CHUNK_ROWS layout)."""
    import asyncio

    from flechasdb_tpu import flat
    from flechasdb_tpu.asyncdb import AsyncLocalFileSystem
    from flechasdb_tpu.flat import load_flat_database_async

    x = rng.standard_normal((250, 16)).astype(np.float32)
    db = FlatDatabase(x, seed=5)
    for i in range(0, 250, 2):
        db.set_attribute_at(i, ("parity", 0))
    db.set_attribute_at(249, ("tag", "last"))
    old = flat.CHUNK_ROWS
    flat.CHUNK_ROWS = 100          # 3 chunks
    try:
        root = save_flat_database(db, fdb.LocalFileSystem(tmp_path))
    finally:
        flat.CHUNK_ROWS = old

    async def go():
        adb = await load_flat_database_async(
            AsyncLocalFileSystem(tmp_path), f"{root}.binpb")
        # attribute in the LAST (short) chunk: slice alignment
        assert await adb.get_attribute(db.vector_ids[249], "tag") == "last"
        assert await adb.get_attribute(db.vector_ids[1], "parity") is None
        filt = await adb.query(x[10], k=5, where=fdb.Eq("parity", 0))
        assert filt and all(
            db.vector_ids.index(r.vector_id) % 2 == 0 for r in filt)
        assert filt[0].vector_id == db.vector_ids[10]
        # range: exact keys <= radius, matches the sync tier
        d2 = np.sum((x - x[10]) ** 2, axis=1)
        radius = float(np.percentile(d2, 5))
        rr = await adb.query_range(x[10], radius)
        want = set(np.nonzero(d2 <= radius)[0].tolist())
        assert {r.vector_index for r in rr} == want
        return True

    assert asyncio.run(go())


def test_async_flat_attrs_follow_actual_chunk_sizes(tmp_path, rng):
    """The wire format does not pin a chunk size: a store written with a
    DIFFERENT chunking (foreign writer, changed CHUNK_ROWS) must still
    replay attribute logs against the right id slices — the replay must
    derive slices from the loaded chunks, never the loader's constant."""
    import asyncio

    from flechasdb_tpu import flat
    from flechasdb_tpu.asyncdb import AsyncLocalFileSystem
    from flechasdb_tpu.flat import load_flat_database_async

    x = rng.standard_normal((250, 16)).astype(np.float32)
    db = FlatDatabase(x, seed=5)
    db.set_attribute_at(249, ("tag", "last"))
    old = flat.CHUNK_ROWS
    flat.CHUNK_ROWS = 200          # foreign chunking: [200, 50]
    try:
        root = save_flat_database(db, fdb.LocalFileSystem(tmp_path))
    finally:
        flat.CHUNK_ROWS = old      # loader runs with the default (4096)

    async def go():
        adb = await load_flat_database_async(
            AsyncLocalFileSystem(tmp_path), f"{root}.binpb")
        assert await adb.get_attribute(db.vector_ids[249], "tag") == "last"
        assert await adb.get_attribute(db.vector_ids[10], "tag") is None
        return True

    assert asyncio.run(go())


def test_flat_mesh_preload_matches_single(db, rng, tmp_path):
    """FlatDatabase/StoredFlatDatabase with preload(mesh=) answer
    query/query_batch/query_range (incl. filters) identically to the
    single-device exact scan — the flat tier's SPMD serving mode."""
    import jax

    from flechasdb_tpu.io import LocalFileSystem
    from flechasdb_tpu.parallel import corpus_mesh

    db, x = db
    mesh = corpus_mesh(jax.devices("cpu"))
    q = rng.standard_normal((6, 24)).astype(np.float32)

    ref = db.query_batch(q, k=5, where=fdb.Eq("datum_id", 42))
    ref_plain = db.query_batch(q, k=5)
    radius = float(np.median([r.squared_distance
                              for rs in ref_plain for r in rs]))
    ref_range = db.query_range(q[0], radius)

    db.preload(mesh=mesh)
    got = db.query_batch(q, k=5, where=fdb.Eq("datum_id", 42))
    got_plain = db.query_batch(q, k=5)
    got_range = db.query_range(q[0], radius)
    for a, b in ((ref, got), (ref_plain, got_plain)):
        for ra, rb in zip(a, b):
            assert [r.vector_id for r in ra] == [r.vector_id for r in rb]
    assert ([r.vector_index for r in ref_range]
            == [r.vector_index for r in got_range])

    # Stored tier: same mesh mode after save/load.
    root = save_flat_database(db, LocalFileSystem(tmp_path))
    sdb = load_flat_database(LocalFileSystem(tmp_path), f"{root}.binpb")
    sdb.preload(mesh=mesh)
    sgot = sdb.query_batch(q, k=5, where=fdb.Eq("datum_id", 42))
    for ra, rb in zip(ref, sgot):
        assert [r.vector_id for r in ra] == [r.vector_id for r in rb]
    srange = sdb.query_range(q[0], radius)
    assert ([r.vector_index for r in ref_range]
            == [r.vector_index for r in srange])
