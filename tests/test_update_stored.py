"""Stored-tier update path: load → to_database → add/remove → re-save.

The reference leaves "Update database" open (``README.md:73``); this repo
implements it in-memory (`Database.add_vectors/remove_vectors`) and — via
`StoredDatabase.to_database` — on stored trees. The invariant these tests
pin: a materialized database re-serializes untouched partitions to
BYTE-IDENTICAL artifacts (same content hash, same file), so re-saving an
updated database into the same store writes only touched partitions plus
the root manifest, and the content store skips files that already exist.
"""

import uuid

import numpy as np
import pytest

from flechasdb_tpu import (
    DatabaseBuilder,
    InvalidArgs,
    LocalFileSystem,
    load_database,
    save_database,
)


@pytest.fixture(scope="module")
def saved(tmp_path_factory):
    rng = np.random.default_rng(5)
    x = rng.standard_normal((240, 16)).astype(np.float32)
    db = (DatabaseBuilder(x).with_partitions(5).with_divisions(4)
          .with_clusters(8).with_seed(9).build())
    for i in range(0, 240, 3):
        db.set_attribute_at(i, ("tag", i))
    base = tmp_path_factory.mktemp("db")
    fs = LocalFileSystem(base)
    root = save_database(db, fs)
    return x, db, base, root


def _load(base, root):
    return load_database(LocalFileSystem(base), f"{root}.binpb")


def test_to_database_query_parity(saved):
    x, db, base, root = saved
    mem = _load(base, root).to_database()
    assert mem.num_vectors == db.num_vectors
    assert mem.vector_size == db.vector_size
    for qi in (0, 57, 120):
        got = mem.query(x[qi], k=5, nprobe=5)
        want = db.query(x[qi], k=5, nprobe=5)
        assert [r.vector_id for r in got] == [r.vector_id for r in want]
        np.testing.assert_allclose(
            [r.squared_distance for r in got],
            [r.squared_distance for r in want], rtol=1e-5)


def test_to_database_attributes_survive(saved):
    x, db, base, root = saved
    mem = _load(base, root).to_database()
    for i in range(0, 240, 3):
        assert mem.get_attribute(db.vector_ids[i], "tag") == i
    # attribute-less vector: same as on the original in-memory builder —
    # InvalidArgs (db/build.rs:228-245), not the stored tier's None
    with pytest.raises(InvalidArgs):
        mem.get_attribute(db.vector_ids[1], "tag")
    with pytest.raises(InvalidArgs):
        db.get_attribute(db.vector_ids[1], "tag")


def test_to_database_resave_is_byte_identical(saved):
    """Materialize → re-save: every artifact re-hashes identically."""
    x, db, base, root = saved
    mem = _load(base, root).to_database()
    root2 = save_database(mem, LocalFileSystem(base))
    assert root2 == root


def test_resave_skips_existing_files(saved):
    """The content store never rewrites a file whose name exists."""
    x, db, base, root = saved
    before = {p: p.stat().st_mtime_ns for p in base.rglob("*.binpb")}
    mem = _load(base, root).to_database()
    save_database(mem, LocalFileSystem(base))
    after = {p: p.stat().st_mtime_ns for p in base.rglob("*.binpb")}
    assert after == before


def test_add_vectors_then_resave_touches_only_their_partitions(saved):
    x, db, base, root = saved
    stored = _load(base, root)
    mem = stored.to_database()
    rng = np.random.default_rng(11)
    added = mem.add_vectors(rng.standard_normal((7, 16)).astype(np.float32),
                            seed=3)
    touched = set(np.asarray(mem.partition_indices[-7:]).tolist())
    assert touched  # at least one partition got a new member

    root2 = save_database(mem, LocalFileSystem(base))
    assert root2 != root
    s1, s2 = _load(base, root), _load(base, root2)
    for pi in range(5):
        same = s1.root.partition_ids[pi] == s2.root.partition_ids[pi]
        assert same == (pi not in touched), (pi, touched)

    # the updated tree serves the new vectors
    mem2 = s2.to_database()
    assert set(added) <= set(mem2.vector_ids)
    res = mem2.query(rng.standard_normal(16).astype(np.float32),
                     k=5, nprobe=5)
    assert len(res) == 5


def test_remove_vectors_then_resave_touches_only_their_partitions(saved):
    x, db, base, root = saved
    mem = _load(base, root).to_database()
    victims = [mem.vector_ids[10], mem.vector_ids[200]]
    lost = {int(mem.partition_indices[10]),
            int(mem.partition_indices[200])}
    assert mem.remove_vectors(victims) == 2

    root2 = save_database(mem, LocalFileSystem(base))
    s1, s2 = _load(base, root), _load(base, root2)
    for pi in range(5):
        same = s1.root.partition_ids[pi] == s2.root.partition_ids[pi]
        assert same == (pi not in lost), (pi, lost)
    mem2 = s2.to_database()
    assert victims[0] not in set(mem2.vector_ids)
    with pytest.raises(InvalidArgs):
        mem2.get_attribute(victims[0], "tag")


def test_materialized_database_cannot_reconstruct(saved):
    x, db, base, root = saved
    mem = _load(base, root).to_database()
    with pytest.raises(InvalidArgs):
        mem.reconstruct(0)


# -- flat tier ---------------------------------------------------------------


def test_flat_to_database_append_resave(tmp_path, monkeypatch):
    import flechasdb_tpu.flat as flat
    from flechasdb_tpu import (FlatDatabase, load_flat_database,
                               save_flat_database)

    monkeypatch.setattr(flat, "CHUNK_ROWS", 32)  # several chunks at N=100
    rng = np.random.default_rng(2)
    x = rng.standard_normal((100, 8)).astype(np.float32)
    db = FlatDatabase(x, seed=1)
    db.set_attribute_at(3, ("tag", 3))
    fs = LocalFileSystem(tmp_path)
    root = save_flat_database(db, fs)

    mem = load_flat_database(fs, f"{root}.binpb").to_database()
    assert mem.vector_ids == db.vector_ids
    np.testing.assert_array_equal(mem.vectors, x)
    assert mem.get_attribute(db.vector_ids[3], "tag") == 3

    # identity re-save: byte-identical root
    assert save_flat_database(mem, fs) == root

    # append: full chunks keep their hashes; tail chunk + root change
    mem.append(rng.standard_normal((5, 8)).astype(np.float32))
    root2 = save_flat_database(mem, fs)
    s1 = load_flat_database(fs, f"{root}.binpb")
    s2 = load_flat_database(fs, f"{root2}.binpb")
    assert s2.num_vectors == 105
    assert s1.root.chunk_ids[:3] == s2.root.chunk_ids[:3]  # 96 rows
    assert s1.root.chunk_ids[3] != s2.root.chunk_ids[3]    # tail grew
    got = s2.query(x[7], k=1)
    assert got[0].vector_id == db.vector_ids[7]


def test_resave_repairs_truncated_artifact(tmp_path):
    """Write-skip must not trust a SHORT file under a valid hash name: a
    truncated artifact (interrupted copy, disk fault) is overwritten on
    the next save — the store stays self-healing."""
    rng = np.random.default_rng(11)
    x = rng.standard_normal((120, 8)).astype(np.float32)
    db = (DatabaseBuilder(x).with_partitions(3).with_divisions(2)
          .with_clusters(4).with_seed(2).build())
    fs = LocalFileSystem(tmp_path)
    root = save_database(db, fs)
    victim = next(p for p in tmp_path.rglob("*.binpb")
                  if p.stem != root and p.parent.name == "partitions")
    good = victim.read_bytes()
    victim.write_bytes(good[: len(good) // 2])
    save_database(db, fs)              # re-save: skip everywhere EXCEPT
    assert victim.read_bytes() == good  # the damaged file gets rewritten
    sdb = load_database(fs, f"{root}.binpb")
    got = sdb.query(x[0], k=3, nprobe=3)
    assert len(got) == 3


def test_resave_repairs_truncated_object(tmp_path):
    """Same self-healing contract on the fsspec object store."""
    pytest.importorskip("fsspec")
    from flechasdb_tpu.objectstore import FsspecFileSystem

    rng = np.random.default_rng(12)
    x = rng.standard_normal((90, 8)).astype(np.float32)
    db = (DatabaseBuilder(x).with_partitions(3).with_divisions(2)
          .with_clusters(4).with_seed(3).build())
    fs = FsspecFileSystem(f"file://{tmp_path}")
    root = save_database(db, fs)
    victim = next(p for p in tmp_path.rglob("*.binpb")
                  if p.stem != root and p.parent.name == "partitions")
    good = victim.read_bytes()
    victim.write_bytes(good[: len(good) // 2])
    save_database(db, fs)
    assert victim.read_bytes() == good
