"""Root-label tests (catalog.py — named pointers into the content store).

EXTENSION: content addressing pins bytes; labels answer "which root is
current?". Contract: publish is atomic and refuses dangling targets,
resolve round-trips across backends, gc never reaps labels but warns
when they dangle, and the CLI follows labels/latest.
"""

import subprocess
import sys

import numpy as np
import pytest

import flechasdb_tpu as fdb
from flechasdb_tpu.errors import InvalidArgs
from flechasdb_tpu.memfs import MemoryFileSystem


@pytest.fixture(scope="module")
def db():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((300, 16), dtype=np.float32)
    return (fdb.DatabaseBuilder(x).with_partitions(4).with_divisions(4)
            .with_clusters(8).with_seed(2).build())


def test_publish_resolve_local(tmp_path, db):
    fs = fdb.LocalFileSystem(str(tmp_path))
    root = fdb.save_database(db, fs)
    fdb.publish_label(fs, root)
    assert fdb.resolve_label(fs) == root
    sdb = fdb.load_labeled(fs)
    assert sdb.num_partitions == db.num_partitions

    # republish to a new root: one atomic pointer flip
    db2 = db
    db2.add_vectors(np.ones((1, 16), np.float32))
    root2 = fdb.save_database(db2, fs)
    fdb.publish_label(fs, root2)
    assert fdb.resolve_label(fs) == root2
    # named labels coexist
    fdb.publish_label(fs, root, name="v1")
    assert fdb.resolve_label(fs, "v1") == root


def test_publish_validation(tmp_path, db):
    fs = fdb.LocalFileSystem(str(tmp_path))
    root = fdb.save_database(db, fs)
    with pytest.raises(fdb.IOError_):
        fdb.publish_label(fs, "A" * 43)        # root never persisted
    for bad in ("", "../x", "a/b", ".hidden", "x" * 65):
        with pytest.raises(InvalidArgs):
            fdb.publish_label(fs, root, name=bad)
    with pytest.raises(InvalidArgs):
        fdb.resolve_label(fs, "nope")


def test_labels_on_memory_backend(db):
    fs = MemoryFileSystem()
    root = fdb.save_database(db, fs)
    fdb.publish_label(fs, root, name="prod")
    assert fdb.resolve_label(fs, "prod") == root
    assert fdb.load_labeled(fs, "prod").num_partitions == db.num_partitions


def test_labels_on_fsspec_backend(tmp_path, db):
    pytest.importorskip("fsspec")
    fs = fdb.FsspecFileSystem(f"file://{tmp_path}")
    root = fdb.save_database(db, fs)
    fdb.publish_label(fs, root)
    assert fdb.resolve_label(fs) == root


def test_readonly_backend_rejects_labels():
    from flechasdb_tpu.io import FileSystem

    class RO(FileSystem):
        def create_hashed_file(self, subdir="", compress=False):
            raise NotImplementedError

        def open_hashed_file(self, path, compressed=False):
            raise NotImplementedError

    with pytest.raises(fdb.InvalidContext):
        RO().write_named("labels/x", b"y")


def test_cli_publish_resolve_load_and_gc_warning(tmp_path, db):
    fs = fdb.LocalFileSystem(str(tmp_path))
    root1 = fdb.save_database(db, fs)
    db.add_vectors(np.full((1, 16), 2.0, np.float32))
    root2 = fdb.save_database(db, fs)

    env = {"PYTHONPATH": "/root/repo", "JAX_PLATFORMS": "cpu",
           "PATH": "/usr/bin:/bin"}

    def cli(*args):
        return subprocess.run(
            [sys.executable, "-m", "flechasdb_tpu", *args],
            capture_output=True, text=True, env=env)

    r = cli("publish", str(tmp_path), root2)
    assert r.returncode == 0 and root2 in r.stdout
    r = cli("resolve", str(tmp_path))
    assert r.returncode == 0 and r.stdout.strip() == root2

    # `load <dir>` follows labels/latest even with two roots present
    r = cli("load", str(tmp_path))
    assert r.returncode == 0, r.stderr

    # labels listing shows name -> target
    r = cli("labels", str(tmp_path))
    assert r.returncode == 0 and f"latest -> {root2}" in r.stdout
    assert "dangling" not in r.stdout

    # gc keeps labels; deleting the labeled root makes gc warn
    (tmp_path / f"{root2}.binpb").unlink()
    r = cli("gc", "--dry-run", str(tmp_path))
    assert r.returncode == 0
    assert "dangles" in r.stderr
    r = cli("labels", str(tmp_path))
    assert "(dangling)" in r.stdout
    assert (tmp_path / "labels" / "latest").is_file()
    # the v1-era root is still resolvable after pointing latest back
    fdb.publish_label(fs, root1)
    assert fdb.resolve_label(fs) == root1
