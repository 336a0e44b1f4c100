"""The FileSystem extension seam: a full alternative backend must work
end-to-end (the in-tree analogue of the reference's flechasdb-s3)."""

import asyncio

import numpy as np
import pytest

import flechasdb_tpu as fdb
from flechasdb_tpu.memfs import AsyncMemoryFileSystem, MemoryFileSystem


def test_memory_fs_end_to_end(rng):
    x = rng.standard_normal((200, 16)).astype(np.float32)
    db = (fdb.DatabaseBuilder(x).with_partitions(4).with_divisions(4)
          .with_clusters(8).with_seed(3).build())
    db.set_attribute_at(7, ("datum_id", 7))

    fs = MemoryFileSystem()
    root = fdb.save_database(db, fs)
    assert any(k.startswith("partitions/") for k in fs.objects)
    assert any(k.startswith("codebooks/") for k in fs.objects)

    sdb = fdb.load_database(fs, f"{root}.binpb")
    res = sdb.query(x[7], k=3, nprobe=4)
    assert res[0].vector_id == db.vector_ids[7]
    assert res[0].get_attribute("datum_id") == 7

    # async view over the same objects
    async def go():
        from flechasdb_tpu.asyncdb import load_database
        adb = await load_database(AsyncMemoryFileSystem(fs.objects),
                                  f"{root}.binpb")
        return await adb.query(x[7], k=3, nprobe=4)

    ares = asyncio.run(go())
    assert [r.vector_id for r in ares] == [r.vector_id for r in res]


def test_memory_fs_missing_object(rng):
    fs = MemoryFileSystem()
    with pytest.raises(fdb.IOError_):
        fs.open_hashed_file("nope.binpb")


def test_memory_fs_corruption_detected(rng):
    x = rng.standard_normal((100, 8)).astype(np.float32)
    db = (fdb.DatabaseBuilder(x).with_partitions(2).with_divisions(2)
          .with_clusters(4).with_seed(4).build())
    fs = MemoryFileSystem()
    root = fdb.save_database(db, fs)
    key = next(k for k in fs.objects if k.startswith("codebooks/"))
    fs.objects[key] = fs.objects[key][:-1] + b"\x00"
    sdb = fdb.load_database(fs, f"{root}.binpb")
    with pytest.raises(fdb.VerificationFailure):
        sdb.query(x[0], k=2, nprobe=1)
