"""Content-addressed IO tests (src/io.rs semantics)."""

import zlib
from pathlib import Path

import pytest

from flechasdb_tpu.errors import IOError_, VerificationFailure
from flechasdb_tpu.io import LocalFileSystem, content_hash


def test_hash_is_urlsafe_b64_sha256_no_pad():
    # SHA-256("") = e3b0c442... ; URL-safe base64 without padding = 43 chars
    h = content_hash(b"")
    assert h == "47DEQpj8HBSa-_TImW-5JCeuQeRkm5NMpJWZG3hSuFU"
    assert len(h) == 43 and "=" not in h


def test_write_read_verify_uncompressed(tmp_path):
    fs = LocalFileSystem(tmp_path)
    f = fs.create_hashed_file("sub")
    f.write(b"hello ")
    f.write(b"world")
    h = f.persist("binpb")
    path = tmp_path / "sub" / f"{h}.binpb"
    assert path.read_bytes() == b"hello world"
    r = fs.open_hashed_file(f"sub/{h}.binpb")
    assert r.read() == b"hello world"
    r.verify()


def test_compressed_hash_covers_compressed_bytes(tmp_path):
    """io.rs:126-128 — the hash is over what hits the disk (zlib stream)."""
    fs = LocalFileSystem(tmp_path)
    f = fs.create_hashed_file(compress=True)
    f.write(b"payload" * 100)
    h = f.persist("binpb")
    stored = (tmp_path / f"{h}.binpb").read_bytes()
    assert content_hash(stored) == h
    assert zlib.decompress(stored) == b"payload" * 100
    r = fs.open_hashed_file(f"{h}.binpb", compressed=True)
    assert r.read() == b"payload" * 100
    r.verify()


def test_corruption_detected(tmp_path):
    fs = LocalFileSystem(tmp_path)
    f = fs.create_hashed_file()
    f.write(b"data")
    h = f.persist("binpb")
    p = tmp_path / f"{h}.binpb"
    p.write_bytes(b"dat4")
    r = fs.open_hashed_file(f"{h}.binpb")
    r.read()
    with pytest.raises(VerificationFailure):
        r.verify()


def test_missing_file_raises(tmp_path):
    fs = LocalFileSystem(tmp_path)
    with pytest.raises(IOError_):
        fs.open_hashed_file("nope.binpb")


def test_no_temp_residue(tmp_path):
    fs = LocalFileSystem(tmp_path)
    for _ in range(3):
        f = fs.create_hashed_file("x", compress=True)
        f.write(b"abc")
        f.persist("binpb")
    files = list((tmp_path / "x").iterdir())
    assert len(files) == 1  # content-addressed: identical bytes dedupe
    assert all(p.suffix == ".binpb" for p in files)


def test_double_persist_rejected(tmp_path):
    fs = LocalFileSystem(tmp_path)
    f = fs.create_hashed_file()
    f.write(b"abc")
    f.persist("binpb")
    with pytest.raises(IOError_):
        f.persist("binpb")


def test_read_without_hash_then_verify(rng):
    """read(need_hash=False) skips the SHA pass but a later verify() still
    checks correctly (it re-hashes the kept raw bytes)."""
    import pytest

    from flechasdb_tpu.errors import VerificationFailure
    from flechasdb_tpu.io import HashedFileReader, content_hash

    payload = rng.bytes(5000)
    import zlib
    stored = zlib.compress(payload, 6)
    name = f"{content_hash(stored)}.binpb"
    r = HashedFileReader(stored, name, compressed=True)
    assert r.read(need_hash=False) == payload
    r.verify()                                   # recomputes from raw
    # uncompressed artifact: read is zero-copy, verify still exact
    name2 = f"{content_hash(payload)}.binpb"
    r2 = HashedFileReader(payload, name2, compressed=False)
    assert r2.read(need_hash=False) == payload
    r2.verify()
    bad = HashedFileReader(payload, "WrongName.binpb", compressed=False)
    assert bad.read(need_hash=False) == payload
    with pytest.raises(VerificationFailure):
        bad.verify()


def test_interrupted_save_leaves_old_tree_intact(tmp_path):
    """Crash consistency: the root manifest is written LAST, so a save
    that dies on any earlier artifact leaves the previous root fully
    servable — the store only ever grows by unreferenced files (which
    ``gc`` reaps), never breaks."""
    import numpy as np

    from flechasdb_tpu import (DatabaseBuilder, load_database,
                               save_database)
    from flechasdb_tpu.__main__ import main

    rng = np.random.default_rng(8)
    x = rng.standard_normal((150, 16)).astype(np.float32)
    db = (DatabaseBuilder(x).with_partitions(4).with_divisions(4)
          .with_clusters(8).with_seed(5).build())
    fs = LocalFileSystem(tmp_path)
    root = save_database(db, fs)
    before = {p: p.read_bytes() for p in tmp_path.rglob("*.binpb")}

    class Dying(LocalFileSystem):
        def __init__(self, base, die_after):
            super().__init__(base)
            self.left = die_after

        def create_hashed_file(self, subdir="", compress=False):
            if self.left <= 0:
                raise IOError_("disk died")
            self.left -= 1
            return super().create_hashed_file(subdir, compress)

    mem = load_database(fs, f"{root}.binpb").to_database()
    mem.add_vectors(rng.standard_normal((9, 16)).astype(np.float32))
    # Die at every artifact position up to the root write
    # (4 partitions + 1 centroids + 4 codebooks + 4 attr logs + root).
    for die_after in range(0, 20):
        dying = Dying(tmp_path, die_after)
        try:
            save_database(mem, dying)
            break                      # save completed: root was last
        except IOError_:
            pass
        # old root still byte-identical and servable
        for p, blob in before.items():
            assert p.read_bytes() == blob, p
        sdb = load_database(fs, f"{root}.binpb")
        assert len(sdb.query(x[0], k=3, nprobe=4)) == 3
    else:
        raise AssertionError("save never completed")
    # a completed save plus gc returns the store to a verified state
    (tmp_path / f"{root}.binpb").unlink()
    assert main(["gc", str(tmp_path)]) == 0
    assert main(["verify", str(tmp_path)]) == 0


def test_save_skips_stale_attribute_entries(tmp_path):
    """An attribute_table entry whose vector no longer exists must be
    silently skipped by the per-partition log writer (the pre-round-4
    per-corpus walk skipped it implicitly; the indexed walk must not
    KeyError mid-save and strand a partial tree)."""
    import uuid

    import numpy as np

    import flechasdb_tpu as fdb

    rng = np.random.default_rng(3)
    x = rng.standard_normal((60, 16)).astype(np.float32)
    db = (fdb.DatabaseBuilder(x).with_partitions(3).with_divisions(2)
          .with_clusters(4).with_seed(1).build())
    db.set_attribute_at(0, ("keep", "yes"))
    db.attribute_table[uuid.uuid4()] = {"stale": "entry"}
    root = fdb.save_database(db, fdb.LocalFileSystem(tmp_path))
    sdb = fdb.load_database(fdb.LocalFileSystem(tmp_path), f"{root}.binpb")
    assert sdb.get_attribute(db.vector_ids[0], "keep") == "yes"
    # the stale id was not serialized: the stored tier has never heard
    # of it (unknown-id contract), rather than resurrecting the entry
    import pytest

    stale = next(vid for vid in db.attribute_table
                 if vid not in db.vector_ids)
    with pytest.raises(fdb.InvalidArgs):
        sdb.get_attribute(stale, "stale")
