"""Recall vs exact brute-force k-NN.

The reference validates quality only by eyeballing README outputs
(SURVEY.md §4); these tests pin it: recall@k must improve with nprobe and
clear a floor at full probe (where the only loss is PQ quantization).
"""

import numpy as np
import pytest

import flechasdb_tpu as fdb


def _lowdim(rng, w, n):
    """Data on a low-intrinsic-dimension manifold — the regime where PQ is
    informative (high-entropy isotropic data drowns neighbor gaps in
    quantization noise for ANY PQ implementation)."""
    z = rng.standard_normal((n, w.shape[0])).astype(np.float32)
    noise = 0.05 * rng.standard_normal((n, w.shape[1])).astype(np.float32)
    return (z @ w + noise).astype(np.float32)


def _exact_topk(x, q, k):
    d = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    return np.argsort(d, axis=1, kind="stable")[:, :k]


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((4, 64)).astype(np.float32)
    x = _lowdim(rng, w, 8000)
    q = _lowdim(rng, w, 100)
    db = (fdb.DatabaseBuilder(x).with_partitions(16).with_divisions(8)
          .with_clusters(256).with_seed(5).build())
    gt = _exact_topk(x, q, 10)
    return x, q, db, gt


def _recall(db, x, q, gt, nprobe):
    res = db.query_batch(q, k=10, nprobe=nprobe)
    hits = 0
    id_to_row = {vid: i for i, vid in enumerate(db.vector_ids)}
    for b, rs in enumerate(res):
        got = {id_to_row[r.vector_id] for r in rs}
        hits += len(got & set(gt[b].tolist()))
    return hits / (len(q) * 10)


def test_recall_improves_with_nprobe(corpus):
    x, q, db, gt = corpus
    r1 = _recall(db, x, q, gt, 1)
    r4 = _recall(db, x, q, gt, 4)
    r16 = _recall(db, x, q, gt, 16)
    assert r1 <= r4 + 0.02
    assert r4 <= r16 + 0.02
    assert r16 > r1
    assert r1 >= 0.5, f"recall@10 at nprobe=1 too low: {r1:.3f}"


def test_recall_floor_at_full_probe(corpus):
    """At nprobe=P the only loss is PQ quantization; on 4-d-intrinsic data
    with 8x256 codebooks recall@10 must clear a comfortable floor."""
    x, q, db, gt = corpus
    r = _recall(db, x, q, gt, 16)
    assert r >= 0.65, f"recall@10 at full probe too low: {r:.3f}"


def test_recall_top1_self_query(corpus):
    """Querying with corpus vectors: top-1 at full probe should be the
    vector itself for the vast majority."""
    x, q, db, gt = corpus
    res = db.query_batch(x[:200], k=1, nprobe=16)
    hits = sum(
        1 for i, rs in enumerate(res)
        if rs and rs[0].vector_id == db.vector_ids[i])
    assert hits >= 180


def test_rerank_improves_recall(corpus):
    """Exact re-ranking of the top-R ADC candidates must not hurt recall
    and should materially improve it at full probe."""
    x, q, db, gt = corpus
    base = _recall(db, x, q, gt, 16)

    res = db.query_batch(q, k=10, nprobe=16, rerank=100)
    id_to_row = {vid: i for i, vid in enumerate(db.vector_ids)}
    hits = 0
    for b, rs in enumerate(res):
        got = {id_to_row[r.vector_id] for r in rs}
        hits += len(got & set(gt[b].tolist()))
    reranked = hits / (len(q) * 10)
    assert reranked >= base
    assert reranked >= 0.9, f"rerank recall too low: {reranked:.3f}"
    # reranked distances are exact
    d0 = ((q[0] - x[id_to_row[res[0][0].vector_id]]) ** 2).sum()
    assert res[0][0].squared_distance == pytest.approx(float(d0), rel=1e-4)


def test_rerank_validation(corpus):
    x, q, db, gt = corpus
    import flechasdb_tpu as fdb
    with pytest.raises(fdb.InvalidArgs):
        db.query_batch(q[:2], k=10, nprobe=4, rerank=5)   # rerank < k
