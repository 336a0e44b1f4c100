"""Golden fixture for the EXTENSION root fields (20: rotation, 21: metric).

``tests/fixtures/extgolden`` is a checked-in tree produced from
hand-constructed arrays (no clustering, no device RNG — fully
deterministic), saved with ``metric="dot"`` and an OPQ rotation. It pins
the extension-field wire encoding across rounds the same way
``goldendb`` pins the reference-compatible core format: every artifact's
filename is its content hash, so one byte of drift in how fields 20/21
(or anything else) encode fails verification on load.
"""

import asyncio
import uuid
from pathlib import Path

import numpy as np
import pytest

import flechasdb_tpu as fdb

FIXTURES = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def golden():
    root = (FIXTURES / "extgolden_root.txt").read_text().strip()
    q = np.load(FIXTURES / "extgolden_query.npy")
    db = fdb.load_database(fdb.LocalFileSystem(FIXTURES / "extgolden"),
                           f"{root}.binpb")
    return db, q, root


def test_ext_golden_metric_and_rotation(golden):
    db, q, _ = golden
    assert db.metric == "dot"
    rot = db._load_rotation()
    assert rot is not None and rot.shape == (16, 16)
    # orthogonality survived the f32 round trip
    np.testing.assert_allclose(rot @ rot.T, np.eye(16), atol=1e-5)


def test_ext_golden_query_matches_recorded(golden):
    db, q, _ = golden
    expected = [
        line.split(",")
        for line in (FIXTURES / "extgolden_expected.txt")
        .read_text().splitlines()
    ]
    res = db.query(q, k=4, nprobe=db.num_partitions)
    assert len(res) == len(expected)
    for r, (vid, pi, vi, dist) in zip(res, expected):
        assert r.vector_id == uuid.UUID(vid)
        assert r.partition_index == int(pi)
        assert r.vector_index == int(vi)
        assert r.squared_distance == pytest.approx(float(dist), abs=1e-4)
    # negated inner products: keys are negative for these hits
    assert all(r.squared_distance < 0 for r in res)


def test_ext_golden_async_and_attributes(golden):
    db, q, root = golden
    from flechasdb_tpu.asyncdb import io as aio
    from flechasdb_tpu.asyncdb import stored as astored

    async def go():
        adb = await astored.load_database(
            aio.AsyncLocalFileSystem(str(FIXTURES / "extgolden")),
            f"{root}.binpb")
        assert adb.metric == "dot"
        return await adb.query(q, k=4, nprobe=adb.num_partitions)

    ares = asyncio.run(go())
    want = db.query(q, k=4, nprobe=db.num_partitions)
    assert [r.vector_id for r in ares] == [r.vector_id for r in want]
    vid0 = uuid.UUID("12345678-90ab-cdef-0000-000000000001")
    assert db.query(q, k=1, nprobe=3)  # warm cache path also fine
    assert db._get_attribute_in_partition(
        int(db_partition_of(db, vid0)), vid0, "name") == "zero"


def db_partition_of(db, vid):
    """Partition index of a vector id via the attribute machinery's own
    partition walk (fixture is tiny: scan all partitions)."""
    for pi in range(db.num_partitions):
        part = db.get_partition(pi)
        if vid in part.vector_ids:
            return pi
    raise AssertionError(f"{vid} not found")


def test_ext_golden_resave_is_byte_identical(golden, tmp_path):
    """Materialize → re-save must reproduce the exact tree (hash-for-hash),
    pinning the ENCODE side of the extension fields, not just decode."""
    db, _, root = golden
    mat = db.to_database()
    assert mat.metric == "dot"
    root2 = fdb.save_database(mat, fdb.LocalFileSystem(str(tmp_path)))
    assert root2 == root
    src = {p.relative_to(FIXTURES / "extgolden").as_posix()
           for p in (FIXTURES / "extgolden").rglob("*.binpb")}
    dst = {p.relative_to(tmp_path).as_posix()
           for p in tmp_path.rglob("*.binpb")}
    assert dst == src
