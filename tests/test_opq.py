"""OPQ training: the learned rotation must reduce quantization error."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flechasdb_tpu.ops import kmeans
from flechasdb_tpu.ops.opq import fit_opq, quantization_error


@pytest.fixture(scope="module")
def correlated():
    """Data whose covariance straddles division boundaries — the case plain
    PQ handles worst."""
    rng = np.random.default_rng(11)
    w = rng.standard_normal((6, 48)).astype(np.float32)
    z = rng.standard_normal((4000, 6)).astype(np.float32)
    return (z @ w + 0.02 * rng.standard_normal((4000, 48))).astype(
        np.float32)


def test_rotation_is_orthogonal(correlated):
    res = fit_opq(jnp.asarray(correlated), 8, 32, jax.random.key(0),
                  iters=4, inner_rounds=10, final_rounds=25)
    r = np.asarray(res.rotation)
    np.testing.assert_allclose(r @ r.T, np.eye(48), atol=1e-4)


def test_opq_reduces_quantization_error(correlated):
    x = jnp.asarray(correlated)
    d, c = 8, 32
    key = jax.random.key(0)

    # Plain PQ baseline (identity rotation).
    divided = x.reshape(len(correlated), d, -1).transpose(1, 0, 2)
    pq0 = kmeans.fit(divided, c, key, max_rounds=25)
    base = quantization_error(x, jnp.eye(48), pq0, d=d)

    res = fit_opq(x, d, c, key, iters=4, inner_rounds=10, final_rounds=25)
    opq = quantization_error(x, res.rotation, res.pq, d=d)
    assert opq < base * 0.9, (
        f"OPQ error {opq:.4f} not clearly below PQ error {base:.4f}")


def test_rotation_preserves_distances(correlated):
    res = fit_opq(jnp.asarray(correlated[:500]), 8, 16, jax.random.key(1),
                  iters=2, inner_rounds=5, final_rounds=10)
    r = np.asarray(res.rotation)
    a, b = correlated[0], correlated[1]
    d0 = ((a - b) ** 2).sum()
    d1 = (((a - b) @ r) ** 2).sum()
    assert d1 == pytest.approx(d0, rel=1e-4)


def test_opq_end_to_end(correlated, tmp_path):
    """OPQ database: build -> query -> save -> load -> query on sync and
    async paths; recall must beat the plain-PQ database at equal memory."""
    import asyncio

    import flechasdb_tpu as fdb
    from flechasdb_tpu.asyncdb import AsyncLocalFileSystem
    from flechasdb_tpu.asyncdb import load_database as aload

    x = correlated
    q = x[:50]
    d_exact = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d_exact, axis=1, kind="stable")[:, :10]

    def recall(db):
        id_to_row = {vid: i for i, vid in enumerate(db.vector_ids)}
        res = db.query_batch(q, k=10, nprobe=8)
        return np.mean([
            len({id_to_row[r.vector_id] for r in rs} & set(gt[b].tolist()))
            / 10 for b, rs in enumerate(res)])

    plain = (fdb.DatabaseBuilder(x).with_partitions(8).with_divisions(8)
             .with_clusters(32).with_seed(7).build())
    opq = (fdb.DatabaseBuilder(x).with_partitions(8).with_divisions(8)
           .with_clusters(32).with_seed(7).with_opq(iters=4).build())
    assert opq.rotation is not None
    r_plain, r_opq = recall(plain), recall(opq)
    assert r_opq >= r_plain - 0.02, (r_plain, r_opq)

    root = fdb.save_database(opq, fdb.LocalFileSystem(tmp_path))
    sdb = fdb.load_database(fdb.LocalFileSystem(tmp_path), f"{root}.binpb")
    # cold host path and warm device path agree with the in-memory DB
    want = opq.query(x[10], k=5, nprobe=8)
    cold = sdb.query(x[10], k=5, nprobe=8)
    assert [r.vector_id for r in cold] == [r.vector_id for r in want]
    sdb.preload()
    warm = sdb.query(x[10], k=5, nprobe=8)
    assert [r.vector_id for r in warm] == [r.vector_id for r in want]

    async def go():
        adb = await aload(AsyncLocalFileSystem(tmp_path), f"{root}.binpb")
        return await adb.query(x[10], 5, 8)

    ares = asyncio.run(go())
    assert [r.vector_id for r in ares] == [r.vector_id for r in want]


def test_opq_add_vectors_consistent(correlated):
    """add_vectors on an OPQ database encodes in the rotated space."""
    import flechasdb_tpu as fdb
    from flechasdb_tpu.ops.encode import encode
    import jax.numpy as jnp

    x = correlated
    db = (fdb.DatabaseBuilder(x).with_partitions(8).with_divisions(8)
          .with_clusters(32).with_seed(7).with_opq(iters=3).build())
    pidx, codes = encode(
        jnp.asarray(x[:30]), jnp.asarray(db.partition_centroids),
        jnp.asarray(db.codebooks), jnp.asarray(db.rotation))
    np.testing.assert_array_equal(np.asarray(pidx),
                                  db.partition_indices[:30])
    np.testing.assert_array_equal(np.asarray(codes),
                                  db.codes[:30].astype(np.int32))
