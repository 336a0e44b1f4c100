"""CLI `verify` subcommand: whole-tree hash + decode audit.

Extension ops tool (the reference CLI is generate/load only,
``src/main.rs:18-29``; its sync reader never verifies two artifact kinds
— this checks every file like the async tier does).
"""

import numpy as np
import pytest

from flechasdb_tpu import (
    DatabaseBuilder,
    FlatDatabase,
    LocalFileSystem,
    save_database,
    save_flat_database,
)
from flechasdb_tpu.__main__ import main


@pytest.fixture()
def tree(tmp_path):
    rng = np.random.default_rng(4)
    x = rng.standard_normal((120, 16)).astype(np.float32)
    db = (DatabaseBuilder(x).with_partitions(4).with_divisions(4)
          .with_clusters(8).with_seed(1).build())
    db.set_attribute_at(0, ("tag", 7))
    root = save_database(db, LocalFileSystem(tmp_path))
    return tmp_path, root


def test_verify_clean_tree(tree, capsys):
    base, root = tree
    assert main(["verify", str(base)]) == 0
    out = capsys.readouterr().out
    assert "all artifacts verified" in out
    assert out.count("ok    ") >= 1 + 4 + 1 + 4 + 4  # root+parts+cent+cb+logs


def test_verify_detects_corruption(tree, capsys):
    base, root = tree
    victim = next(p for p in (base / "partitions").glob("*.binpb"))
    blob = bytearray(victim.read_bytes())
    blob[len(blob) // 2] ^= 0xFF
    victim.write_bytes(bytes(blob))
    assert main(["verify", str(base)]) == 1
    assert "FAIL" in capsys.readouterr().out


def test_verify_detects_short_file_under_valid_name(tree, capsys):
    """Hash matches only full content: truncation FAILs."""
    base, root = tree
    victim = next(p for p in (base / "codebooks").glob("*.binpb"))
    victim.write_bytes(victim.read_bytes()[:-3])
    assert main(["verify", str(base)]) == 1


def test_verify_flat_tree(tmp_path, capsys):
    rng = np.random.default_rng(5)
    db = FlatDatabase(rng.standard_normal((50, 8)).astype(np.float32),
                      seed=2)
    db.set_attribute_at(1, ("k", "v"))
    save_flat_database(db, LocalFileSystem(tmp_path))
    assert main(["verify", str(tmp_path)]) == 0
    assert "flat root" in capsys.readouterr().out


def test_verify_rejects_ambiguous_dir(tmp_path, capsys):
    (tmp_path / "a.binpb").write_bytes(b"x")
    (tmp_path / "b.binpb").write_bytes(b"y")
    assert main(["verify", str(tmp_path)]) == 1


def test_gc_keeps_everything_with_live_roots(tree, capsys):
    """Two roots referencing overlapping trees: nothing is orphaned."""
    base, root = tree
    from flechasdb_tpu import load_database

    mem = load_database(LocalFileSystem(base), f"{root}.binpb").to_database()
    rng = np.random.default_rng(9)
    mem.add_vectors(rng.standard_normal((5, 16)).astype(np.float32))
    save_database(mem, LocalFileSystem(base))
    before = sorted(p.name for p in base.rglob("*.binpb"))
    assert main(["gc", str(base)]) == 0
    assert sorted(p.name for p in base.rglob("*.binpb")) == before
    assert "0 orphaned" in capsys.readouterr().out


def test_gc_reaps_after_root_removal(tree, capsys):
    base, root = tree
    from flechasdb_tpu import load_database

    mem = load_database(LocalFileSystem(base), f"{root}.binpb").to_database()
    rng = np.random.default_rng(10)
    mem.add_vectors(rng.standard_normal((5, 16)).astype(np.float32))
    root2 = save_database(mem, LocalFileSystem(base))
    (base / f"{root}.binpb").unlink()        # retire the old root

    # dry run: reports the old root's touched partitions, deletes nothing
    before = sorted(str(p) for p in base.rglob("*.binpb"))
    assert main(["gc", "--dry-run", str(base)]) == 0
    out = capsys.readouterr().out
    assert "would delete" in out
    assert sorted(str(p) for p in base.rglob("*.binpb")) == before

    assert main(["gc", str(base)]) == 0
    out = capsys.readouterr().out
    assert "deleted" in out and "0 orphaned" not in out

    # the surviving tree is intact and serves queries
    assert main(["verify", str(base)]) == 0
    sdb = load_database(LocalFileSystem(base), f"{root2}.binpb")
    res = sdb.query(np.zeros(16, np.float32), k=3, nprobe=4)
    assert len(res) == 3
    # idempotent: second gc finds nothing
    assert main(["gc", str(base)]) == 0
    assert "0 orphaned" in capsys.readouterr().out


def test_gc_flat_tree(tmp_path, capsys):
    from flechasdb_tpu import load_flat_database

    rng = np.random.default_rng(6)
    db = FlatDatabase(rng.standard_normal((40, 8)).astype(np.float32),
                      seed=3)
    fs = LocalFileSystem(tmp_path)
    root = save_flat_database(db, fs)
    mem = load_flat_database(fs, f"{root}.binpb").to_database()
    mem.append(rng.standard_normal((4, 8)).astype(np.float32))
    save_flat_database(mem, fs)
    (tmp_path / f"{root}.binpb").unlink()
    assert main(["gc", str(tmp_path)]) == 0
    assert main(["verify", str(tmp_path)]) == 0
