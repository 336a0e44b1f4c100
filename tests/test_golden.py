"""Golden stored-database fixture.

``tests/fixtures/goldendb`` was produced by this framework's serializer and
is checked into the repo. Loading and querying it pins the on-disk format:
any accidental change to the protobuf layout, compression, hashing, or
attribute-log replay breaks these tests (the content hash of every artifact
is its filename, so even a one-byte format drift fails verification).
"""

import uuid
from pathlib import Path

import numpy as np
import pytest

import flechasdb_tpu as fdb

FIXTURES = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def golden():
    root = (FIXTURES / "goldendb_root.txt").read_text().strip()
    x = np.load(FIXTURES / "goldendb_vectors.npy")
    db = fdb.load_database(fdb.LocalFileSystem(FIXTURES / "goldendb"),
                           f"{root}.binpb")
    return db, x


def test_golden_loads_and_validates(golden):
    db, x = golden
    assert db.vector_size == 16
    assert db.num_partitions == 4
    assert db.num_divisions == 4
    assert db.num_codes == 8
    assert db.attribute_names == ["datum_id", "label"]


def test_golden_query_matches_recorded_results(golden):
    db, x = golden
    expected = [
        line.split(",")
        for line in (FIXTURES / "goldendb_expected.txt")
        .read_text().splitlines()
    ]
    res = db.query(x[10], k=5, nprobe=4)
    assert len(res) == len(expected)
    for r, (vid, pi, vi, dist) in zip(res, expected):
        assert r.vector_id == uuid.UUID(vid)
        assert r.partition_index == int(pi)
        assert r.vector_index == int(vi)
        assert r.squared_distance == pytest.approx(float(dist), abs=1e-4)


def test_golden_attributes_replay(golden):
    db, x = golden
    res = db.query(x[10], k=5, nprobe=4)
    for r in res:
        datum = r.get_attribute("datum_id")
        label = r.get_attribute("label")
        if datum is not None:
            assert datum % 2 == 0
            assert label == f"even-{datum}"


def test_golden_async_load(golden):
    import asyncio

    from flechasdb_tpu.asyncdb import AsyncLocalFileSystem, load_database

    db, x = golden
    root = (FIXTURES / "goldendb_root.txt").read_text().strip()

    async def go():
        adb = await load_database(
            AsyncLocalFileSystem(FIXTURES / "goldendb"), f"{root}.binpb")
        return await adb.query(x[10], k=5, nprobe=4)

    res_async = asyncio.run(go())
    res_sync = db.query(x[10], k=5, nprobe=4)
    assert [r.vector_id for r in res_async] == \
        [r.vector_id for r in res_sync]
