"""fsspec object-store backend + streaming async reads.

No egress in this image, so the backend runs over ``file://`` and
``memory://`` — the protocol client is fsspec's job, exactly as the S3 SDK
is the job of the reference's out-of-tree ``flechasdb-s3`` crate
(``README.md:76``)."""

import asyncio

import numpy as np
import pytest

import flechasdb_tpu as fdb
from flechasdb_tpu.asyncdb import AsyncLocalFileSystem
from flechasdb_tpu.asyncdb import load_database as load_async
from flechasdb_tpu.asyncdb.io import AsyncStreamingHashedFileReader
from flechasdb_tpu.objectstore import AsyncFsspecFileSystem, FsspecFileSystem

fsspec = pytest.importorskip("fsspec")


@pytest.fixture(scope="module")
def db():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((300, 16)).astype(np.float32)
    d = (fdb.DatabaseBuilder(x).with_partitions(6).with_divisions(4)
         .with_clusters(8).with_seed(1).build())
    for i in range(0, 300, 3):
        d.set_attribute_at(i, ("datum_id", i))
    return x, d


@pytest.mark.parametrize("proto", ["file", "memory"])
def test_save_load_query_roundtrip(db, tmp_path, proto):
    x, d = db
    url = f"file://{tmp_path}" if proto == "file" else "memory://fdbtest"
    fs = FsspecFileSystem(url)
    root = fdb.save_database(d, fs)

    sdb = fdb.load_database(fs, f"{root}.binpb")
    v = x[9]
    got = sdb.query(v, k=5, nprobe=6)
    want = d.query(v, k=5, nprobe=6)
    assert [r.vector_id for r in got] == [r.vector_id for r in want]
    assert got[0].get_attribute("datum_id") == d.get_attribute(
        want[0].vector_id, "datum_id")


def test_async_fsspec(db, tmp_path):
    x, d = db
    fs = FsspecFileSystem(f"file://{tmp_path}")
    root = fdb.save_database(d, fs)

    async def run():
        adb = await load_async(
            AsyncFsspecFileSystem(f"file://{tmp_path}"), f"{root}.binpb")
        got = await adb.query(x[9], 5, 6)
        want = d.query(x[9], k=5, nprobe=6)
        assert [r.vector_id for r in got] == [r.vector_id for r in want]

    asyncio.run(run())


def test_missing_object_is_ioerror(tmp_path):
    fs = FsspecFileSystem(f"file://{tmp_path}")
    with pytest.raises(fdb.IOError_):
        fs.open_hashed_file("nope.binpb")


def test_crash_leaves_no_final_file(tmp_path):
    # file protocol: write goes to a temp name, then moves — a finished
    # artifact under its hash name is always complete.
    fs = FsspecFileSystem(f"file://{tmp_path}")
    f = fs.create_hashed_file(compress=True)
    f.write(b"payload")
    h = f.persist("binpb")
    files = list(tmp_path.iterdir())
    assert [p.name for p in files] == [f"{h}.binpb"]


def test_streaming_reader_full_db(db, tmp_path):
    """streaming_threshold=0 forces the incremental reader on every
    artifact; the whole async path must still load, verify, and query."""
    x, d = db
    root = fdb.save_database(d, fdb.LocalFileSystem(tmp_path))

    async def run():
        fs = AsyncLocalFileSystem(tmp_path, streaming_threshold=0)
        f = await fs.open_hashed_file(f"{root}.binpb", compressed=True)
        assert isinstance(f, AsyncStreamingHashedFileReader)
        with pytest.raises(fdb.IOError_):
            f.verify()                      # before read: nothing hashed
        adb = await load_async(fs, f"{root}.binpb")
        got = await adb.query(x[9], 5, 6)
        want = d.query(x[9], k=5, nprobe=6)
        assert [r.vector_id for r in got] == [r.vector_id for r in want]

    asyncio.run(run())


def test_streaming_reader_detects_corruption(db, tmp_path):
    x, d = db
    root = fdb.save_database(d, fdb.LocalFileSystem(tmp_path))
    target = tmp_path / f"{root}.binpb"
    raw = bytearray(target.read_bytes())
    raw[-1] ^= 0x01                        # keep zlib mostly parseable
    target.write_bytes(bytes(raw))

    async def run():
        fs = AsyncLocalFileSystem(tmp_path, streaming_threshold=0)
        f = await fs.open_hashed_file(f"{root}.binpb", compressed=True)
        try:
            await f.read()
        except fdb.IOError_:
            return                          # corrupt deflate stream: fine
        with pytest.raises(fdb.VerificationFailure):
            f.verify()

    asyncio.run(run())
