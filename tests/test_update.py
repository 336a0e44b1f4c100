"""Update-database tests (reference roadmap item README.md:73).

Covers encode-against-existing-index, query visibility of added vectors,
attribute assignment on them, and the content-addressing property that makes
re-saves incremental: untouched partitions keep their file hashes.
"""

import numpy as np
import pytest

import flechasdb_tpu as fdb
from flechasdb_tpu.memfs import MemoryFileSystem


@pytest.fixture
def built(rng):
    x = rng.standard_normal((1000, 32)).astype(np.float32)
    db = (fdb.DatabaseBuilder(x).with_partitions(8).with_divisions(4)
          .with_clusters(16).with_seed(21).build())
    return db, x


def test_added_vectors_are_queryable(built, rng):
    db, x = built
    new = rng.standard_normal((20, 32)).astype(np.float32)
    ids = db.add_vectors(new, seed=1)
    assert db.num_vectors == 1020
    res = db.query(new[3], k=5, nprobe=8)
    assert ids[3] in [r.vector_id for r in res]
    # attributes work on added vectors
    db.set_attribute_at(1003, ("datum_id", 1003))
    assert db.get_attribute(ids[3], "datum_id") == 1003


def test_added_vectors_encoding_matches_build_encoding(built, rng):
    """Encoding a vector the builder already indexed must reproduce its
    partition and codes (same centroids/codebooks, same argmin)."""
    from flechasdb_tpu.ops.encode import encode
    import jax.numpy as jnp

    db, x = built
    pidx, codes = encode(jnp.asarray(x[:50]),
                         jnp.asarray(db.partition_centroids),
                         jnp.asarray(db.codebooks))
    np.testing.assert_array_equal(np.asarray(pidx),
                                  db.partition_indices[:50])
    np.testing.assert_array_equal(np.asarray(codes),
                                  db.codes[:50].astype(np.int32))


def test_incremental_resave_reuses_untouched_partitions(built, rng):
    db, x = built
    fs1 = MemoryFileSystem()
    fdb.save_database(db, fs1)
    before = set(fs1.objects)

    # Add vectors that land in ONE partition (clones of one existing vector)
    target_row = 17
    new = np.repeat(x[target_row:target_row + 1], 5, axis=0)
    db.add_vectors(new, seed=2)
    touched = db.partition_indices[target_row]

    fs2 = MemoryFileSystem()
    fdb.save_database(db, fs2)
    after = set(fs2.objects)

    partition_files_before = {k for k in before
                              if k.startswith("partitions/")}
    shared = partition_files_before & after
    # all partitions except the touched one (plus the centroids file, which
    # is unchanged) must reuse their exact content hash
    assert len(shared) >= len(partition_files_before) - 1, (
        f"only {len(shared)} of {len(partition_files_before)} partition "
        f"files reused (touched partition {touched})")


def test_stored_roundtrip_after_update(built, rng, tmp_path):
    db, x = built
    new = rng.standard_normal((10, 32)).astype(np.float32)
    ids = db.add_vectors(new, seed=3)
    root = fdb.save_database(db, fdb.LocalFileSystem(tmp_path))
    sdb = fdb.load_database(fdb.LocalFileSystem(tmp_path), f"{root}.binpb")
    res = sdb.query(new[7], k=1, nprobe=8)
    assert res[0].vector_id == ids[7]


def test_add_vectors_validation(built, rng):
    db, x = built
    with pytest.raises(fdb.InvalidArgs):
        db.add_vectors(rng.standard_normal((3, 7)).astype(np.float32))
    with pytest.raises(fdb.InvalidArgs):
        db.add_vectors(rng.standard_normal((3, 32)).astype(np.float32),
                       vector_ids=[])
