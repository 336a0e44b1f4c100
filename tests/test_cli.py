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
