"""Pruned bucketed query must agree exactly with the masked full scan."""

import jax.numpy as jnp
import numpy as np
import pytest

from flechasdb_tpu.ops.adc import query_masked_scan
from flechasdb_tpu.ops.bucketed import Buckets, bucketize, query_bucketed


def _random_index(rng, n=700, m=64, p=9, d=4, c=16):
    centroids = rng.standard_normal((p, m)).astype(np.float32)
    codebooks = rng.standard_normal((d, c, m // d)).astype(np.float32)
    codes = rng.integers(0, c, (n, d)).astype(np.int32)
    pidx = rng.integers(0, p, n).astype(np.int32)
    return centroids, codebooks, codes, pidx


def test_bucketize_roundtrip(rng):
    _, _, codes, pidx = _random_index(rng)
    b = bucketize(codes, pidx, 9)
    assert b.codes.shape[2] % 128 == 0
    lengths = np.asarray(b.lengths)
    np.testing.assert_array_equal(lengths, np.bincount(pidx, minlength=9))
    rows = np.asarray(b.rows)
    # every corpus row appears exactly once, in its own partition's bucket
    flat = rows[rows >= 0]
    assert sorted(flat.tolist()) == list(range(len(codes)))
    for pi in range(9):
        members = rows[pi][rows[pi] >= 0]
        assert np.all(pidx[members] == pi)
        np.testing.assert_array_equal(
            np.asarray(b.codes)[pi, :, :len(members)].T, codes[members])


@pytest.mark.parametrize("nprobe", [1, 3, 9])
def test_bucketed_matches_masked_scan(rng, nprobe):
    centroids, codebooks, codes, pidx = _random_index(rng)
    q = rng.standard_normal((6, centroids.shape[1])).astype(np.float32)
    buckets = bucketize(codes, pidx, centroids.shape[0])

    ref_d, ref_r, ref_p = query_masked_scan(
        jnp.asarray(q), jnp.asarray(centroids), jnp.asarray(codebooks),
        jnp.asarray(codes), jnp.asarray(pidx), k=10, nprobe=nprobe)
    got_d, got_r, got_p = query_bucketed(
        jnp.asarray(q), jnp.asarray(centroids), jnp.asarray(codebooks),
        buckets, k=10, nprobe=nprobe)

    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d),
                               rtol=1e-5, atol=1e-5)
    # row agreement modulo exact-distance ties
    rd, gd = np.asarray(ref_d), np.asarray(got_d)
    rr, gr = np.asarray(ref_r), np.asarray(got_r)
    for b in range(len(q)):
        diff = rr[b] != gr[b]
        if diff.any():
            np.testing.assert_allclose(rd[b][diff], gd[b][diff], rtol=1e-6)


def test_bucketed_small_partition_padding(rng):
    """Fewer reachable vectors than k ⇒ +inf tail, no pad rows returned."""
    centroids, codebooks, codes, pidx = _random_index(rng, n=40, p=8)
    q = rng.standard_normal((2, centroids.shape[1])).astype(np.float32)
    buckets = bucketize(codes, pidx, 8)
    d, r, _ = query_bucketed(
        jnp.asarray(q), jnp.asarray(centroids), jnp.asarray(codebooks),
        buckets, k=30, nprobe=1)
    d, r = np.asarray(d), np.asarray(r)
    for b in range(2):
        finite = np.isfinite(d[b])
        assert np.all(r[b][finite] >= 0)
        assert np.all(r[b][finite] < 40)
        assert finite.sum() < 30  # one partition can't hold 30 of 40 rows


def test_pallas_lookup_matches_gather(rng):
    """The Pallas ADC lookup kernel (interpret mode on CPU) must agree with
    the XLA gather implementation."""
    centroids, codebooks, codes, pidx = _random_index(rng, n=600, p=5)
    q = rng.standard_normal((4, centroids.shape[1])).astype(np.float32)
    buckets = bucketize(codes, pidx, 5)
    ref = query_bucketed(
        jnp.asarray(q), jnp.asarray(centroids), jnp.asarray(codebooks),
        buckets, k=8, nprobe=3, impl="gather")
    got = query_bucketed(
        jnp.asarray(q), jnp.asarray(centroids), jnp.asarray(codebooks),
        buckets, k=8, nprobe=3, impl="pallas")
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(ref[2]))


def test_pallas_lookup_c_not_lane_multiple(rng):
    """C below/above one 128-lane vreg (the CLI's C=25, and C=300) must
    lane-pad the table correctly in the gather kernel."""
    from flechasdb_tpu.ops.pallas_scan import adc_lookup

    for c in (25, 300):
        g, d, l = 6, 4, 256
        codes = rng.integers(0, c, (g, d, l)).astype(np.int32)
        tab = rng.standard_normal((g, d, c)).astype(np.float32)
        out = np.asarray(adc_lookup(jnp.asarray(codes),
                                    jnp.asarray(tab.reshape(g, d * c))))
        ref = tab[np.arange(g)[:, None, None],
                  np.arange(d)[None, :, None], codes].sum(1)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("d", [4, 5, 8, 2])
def test_packed_buckets_match_unpacked(rng, d):
    """Packed buckets (4 byte codes per word) must produce identical
    query results through both impls, including D not a multiple of 4."""
    m = d * 8
    centroids, codebooks, codes, pidx = _random_index(
        rng, n=500, m=m, p=7, d=d, c=200)
    q = rng.standard_normal((5, m)).astype(np.float32)
    plain = bucketize(codes, pidx, 7)
    packed = bucketize(codes, pidx, 7, pack=True)
    assert packed.codes.shape[1] == -(-d // 4)
    args = (jnp.asarray(q), jnp.asarray(centroids), jnp.asarray(codebooks))
    ref = query_bucketed(*args, plain, k=10, nprobe=3)
    for impl in ("gather", "pallas"):
        got = query_bucketed(*args, packed, k=10, nprobe=3, impl=impl)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(got[1]),
                                      np.asarray(ref[1]))


def test_bucketize_pack_validation(rng):
    codes = np.full((10, 4), 300, np.int32)   # codes >= 256: unpackable
    pidx = np.zeros(10, np.int32)
    with pytest.raises(ValueError):
        bucketize(codes, pidx, 2, pack=True)
    b = bucketize(codes, pidx, 2, pack="auto")   # falls back silently
    assert b.codes.shape[1] == 4


def test_adc_lookup_l_tiled(rng):
    """Buckets larger than one L tile (2048) stream through a tiled grid;
    results must match the small-bucket path slot for slot."""
    from flechasdb_tpu.ops.pallas_scan import adc_lookup

    g, d, c, l = 2, 4, 64, 4352          # l > _L_TILE, not a tile multiple
    codes = rng.integers(0, c, (g, d, l)).astype(np.int32)
    tab = rng.standard_normal((g, d, c)).astype(np.float32)
    out = np.asarray(adc_lookup(jnp.asarray(codes),
                                jnp.asarray(tab.reshape(g, d * c))))
    ref = tab[np.arange(g)[:, None, None],
              np.arange(d)[None, :, None], codes].sum(1)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cells", [1, 3, 8])
def test_adc_lookup_cells_per_step_parity(rng, cells):
    """Every cells_per_step grouping must produce identical results —
    the knob only re-blocks the grid (round 4)."""
    from flechasdb_tpu.ops.pallas_scan import adc_lookup

    g, d, c, l = 13, 4, 64, 256
    codes = rng.integers(0, c, (g, d, l)).astype(np.int32)
    tab = rng.standard_normal((g, d, c)).astype(np.float32)
    out = np.asarray(adc_lookup(jnp.asarray(codes),
                                jnp.asarray(tab.reshape(g, d * c)),
                                cells_per_step=cells))
    ref = tab[np.arange(g)[:, None, None],
              np.arange(d)[None, :, None], codes].sum(1)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_adc_lookup_multi_block_padding(rng):
    """G spanning several cell-group blocks with a ragged tail (round-4
    multi-cell grid steps, ``pallas_scan._CELLS_PER_STEP``): the pad
    cells' garbage rows must be sliced off and every real cell must
    match the per-cell reference."""
    from flechasdb_tpu.ops.pallas_scan import adc_lookup

    g, d, c, l = 21, 4, 64, 256          # gp=3 blocks of 8, pad 3
    codes = rng.integers(0, c, (g, d, l)).astype(np.int32)
    tab = rng.standard_normal((g, d, c)).astype(np.float32)
    out = np.asarray(adc_lookup(jnp.asarray(codes),
                                jnp.asarray(tab.reshape(g, d * c))))
    assert out.shape == (g, l)
    ref = tab[np.arange(g)[:, None, None],
              np.arange(d)[None, :, None], codes].sum(1)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pack", [False, True])
def test_adc_lookup_indexed_matches_direct(rng, pack):
    """The scalar-prefetch (in-place bucket) lookup must equal gathering
    the bucket first and running the plain lookup."""
    from flechasdb_tpu.ops.pallas_scan import adc_lookup, adc_lookup_indexed

    p, d, c, l, g = 6, 8, 256, 384, 10
    bcodes = rng.integers(0, c, (p, d, l)).astype(np.int32)
    if pack:
        dp = -(-d // 4)
        packed = np.zeros((p, dp, l), np.int32)
        for di in range(d):
            w, bb = divmod(di, 4)
            packed[:, w] |= bcodes[:, di] << (8 * bb)
        resident = packed
    else:
        resident = bcodes
    ftab = rng.standard_normal((g, d * c)).astype(np.float32)
    bidx = rng.integers(0, p, (g,)).astype(np.int32)

    got = np.asarray(adc_lookup_indexed(
        jnp.asarray(resident), jnp.asarray(ftab), jnp.asarray(bidx), d=d))
    ref = np.asarray(adc_lookup(
        jnp.asarray(resident[bidx]), jnp.asarray(ftab), d=d))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def _pack_codes(bcodes, d):
    p, _, l = bcodes.shape
    dp = -(-d // 4)
    packed = np.zeros((p, dp, l), np.int32)
    for di in range(d):
        w, bb = divmod(di, 4)
        packed[:, w] |= bcodes[:, di] << (8 * bb)
    return packed


@pytest.mark.parametrize("pack", [False, True])
@pytest.mark.parametrize("cells,bufs", [(1, 2), (3, 4), (8, 4)])
def test_adc_lookup_indexed_dma_pipeline(rng, pack, cells, bufs):
    """The round-5 manual-DMA pipeline kernel (``pipeline="dma"``) must
    match the XLA fallback for every (cells_per_step, pipe_bufs)
    grouping, packed and unpacked, including a padded ragged G tail.
    Off-TPU it runs under the pallas interpreter — the manual
    ``make_async_copy`` pipeline simulates fine (unlike scalar
    prefetch), so the pipeline logic is covered on CPU."""
    from flechasdb_tpu.ops.pallas_scan import adc_lookup_indexed

    p, d, c, l, g = 6, 8, 256, 384, 11
    bcodes = rng.integers(0, c, (p, d, l)).astype(np.int32)
    resident = _pack_codes(bcodes, d) if pack else bcodes
    ftab = rng.standard_normal((g, d * c)).astype(np.float32)
    bidx = rng.integers(0, p, (g,)).astype(np.int32)

    args = (jnp.asarray(resident), jnp.asarray(ftab), jnp.asarray(bidx))
    got = np.asarray(adc_lookup_indexed(
        *args, d=d, pipeline="dma", cells_per_step=cells, pipe_bufs=bufs,
        interpret=True))
    ref = np.asarray(adc_lookup_indexed(*args, d=d))   # XLA fallback
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_adc_lookup_indexed_dma_multi_tile(rng):
    """An L too large for one tile under the unroll cap must stream
    through several exact L-tiles (nj > 1) — the pipeline's table ring
    is only re-fetched at each cell-group's first tile."""
    from flechasdb_tpu.ops.pallas_scan import adc_lookup_indexed

    p, d, c, l, g = 3, 4, 64, 4608, 5    # gb=8: lt=2304, nj=2
    bcodes = rng.integers(0, c, (p, d, l)).astype(np.int32)
    ftab = rng.standard_normal((g, d * c)).astype(np.float32)
    bidx = rng.integers(0, p, (g,)).astype(np.int32)
    args = (jnp.asarray(bcodes), jnp.asarray(ftab), jnp.asarray(bidx))
    got = np.asarray(adc_lookup_indexed(*args, pipeline="dma",
                                        interpret=True))
    ref = np.asarray(adc_lookup_indexed(*args))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_adc_lookup_indexed_dma_rejects_tileless_l():
    """pipeline="dma" on an L whose only exact tiles blow the budgets
    must raise (the default path falls back to the blocked kernel)."""
    from flechasdb_tpu.ops.pallas_scan import adc_lookup_indexed, _LANE

    p, d, c, g = 2, 4, 64, 2
    l = 509 * _LANE   # prime tile count: whole-L blows the unroll cap,
    #                   and the only other divisor (128 lanes) is under
    #                   the minimum-tile floor
    bcodes = jnp.zeros((p, d, l), jnp.int32)
    ftab = jnp.zeros((g, d * c), jnp.float32)
    bidx = jnp.zeros((g,), jnp.int32)
    with pytest.raises(ValueError, match="no DMA-pipeline-compatible"):
        adc_lookup_indexed(bcodes, ftab, bidx, pipeline="dma",
                           interpret=True)
    # rows neither <= 8 nor 8-aligned (the headline's D=12): Mosaic
    # cannot DMA-slice the tiled operand — must fall back, and a forced
    # "dma" must say so rather than fail at Mosaic compile
    bc12 = jnp.zeros((2, 12, 256), jnp.int32)
    ft12 = jnp.zeros((2, 12 * 64), jnp.float32)
    with pytest.raises(ValueError, match="no DMA-pipeline-compatible"):
        adc_lookup_indexed(bc12, ft12, bidx, pipeline="dma",
                           interpret=True)


@pytest.mark.skipif(
    __import__("flechasdb_tpu.ops.bucketed", fromlist=["_platform"])
    ._platform() != "tpu",
    reason="real-TPU Mosaic lowering of the DMA pipeline")
@pytest.mark.parametrize("cells", [2, 8])
def test_adc_lookup_indexed_dma_on_tpu(rng, cells):
    """TPU-gated parity of the Mosaic-lowered DMA pipeline against the
    blocked kernel (ADVICE r4: the prefetch/pipeline path must be
    covered by any real-TPU run, not only benchmarks)."""
    from flechasdb_tpu.ops.pallas_scan import adc_lookup_indexed

    p, d, c, l, g = 12, 8, 256, 512, 19
    bcodes = rng.integers(0, c, (p, d, l)).astype(np.int32)
    ftab = rng.standard_normal((g, d * c)).astype(np.float32)
    bidx = rng.integers(0, p, (g,)).astype(np.int32)
    args = (jnp.asarray(bcodes), jnp.asarray(ftab), jnp.asarray(bidx))
    got = np.asarray(adc_lookup_indexed(*args, pipeline="dma",
                                        cells_per_step=cells))
    ref = np.asarray(adc_lookup_indexed(*args, pipeline="blocked"))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("pack", [False, True])
def test_adc_lookup_indexed_fused_length_mask(rng, pack):
    """``lengths`` must +inf-mask slots >= the per-cell fill count
    identically on every path: the DMA pipeline fuses it in-register;
    the fallbacks apply the same mask on the result."""
    from flechasdb_tpu.ops.pallas_scan import adc_lookup_indexed

    p, d, c, l, g = 6, 8, 256, 384, 11
    bcodes = rng.integers(0, c, (p, d, l)).astype(np.int32)
    resident = _pack_codes(bcodes, d) if pack else bcodes
    ftab = rng.standard_normal((g, d * c)).astype(np.float32)
    bidx = rng.integers(0, p, (g,)).astype(np.int32)
    lens = rng.integers(0, l + 1, (g,)).astype(np.int32)
    lens[0] = 0                      # fully masked cell
    lens[1] = l                      # fully live cell

    args = (jnp.asarray(resident), jnp.asarray(ftab), jnp.asarray(bidx),
            jnp.asarray(lens))
    plain = np.asarray(adc_lookup_indexed(args[0], args[1], args[2], d=d))
    want = np.where(np.arange(l)[None, :] < lens[:, None], plain, np.inf)
    # XLA fallback (default off-TPU)
    got_xla = np.asarray(adc_lookup_indexed(*args, d=d))
    np.testing.assert_allclose(got_xla, want, rtol=1e-6, atol=1e-6)
    # interpreted DMA pipeline (in-register mask)
    got_dma = np.asarray(adc_lookup_indexed(*args, d=d, pipeline="dma",
                                            interpret=True))
    np.testing.assert_allclose(got_dma, want, rtol=1e-6, atol=1e-6)


def test_query_bucketed_approx_kwarg_off_tpu(rng):
    """``approx=True`` must be accepted everywhere and fall back to the
    EXACT top-k off-TPU (approx_max_k has no fast CPU lowering):
    results are bit-identical to the default path there."""
    centroids, codebooks, codes, pidx = _random_index(rng, n=600, p=5)
    q = rng.standard_normal((4, centroids.shape[1])).astype(np.float32)
    buckets = bucketize(codes, pidx, 5)
    a = query_bucketed(jnp.asarray(q), jnp.asarray(centroids),
                       jnp.asarray(codebooks), buckets, k=8, nprobe=3)
    b = query_bucketed(jnp.asarray(q), jnp.asarray(centroids),
                       jnp.asarray(codebooks), buckets, k=8, nprobe=3,
                       approx=True)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_adc_lookup_indexed_dma_randomized_shapes(rng):
    """Randomized-shape parity fuzz for the DMA pipeline (interpret
    mode): packed/unpacked × ragged G × assorted L-tilings × lengths,
    against the XLA fallback. The pipeline has shape-dependent paths
    (tile choice, sublane gates, pad rows, dead-tile skip) that a few
    hand-picked shapes undersample."""
    from flechasdb_tpu.ops.pallas_scan import adc_lookup_indexed

    for trial in range(6):
        d = int(rng.choice([2, 4, 5, 8, 9, 16]))
        c = int(rng.choice([16, 64, 256]))
        l = 128 * int(rng.choice([1, 2, 3, 4, 6, 8]))
        p = int(rng.integers(2, 9))
        g = int(rng.integers(1, 20))
        pack = bool(rng.integers(0, 2)) and c <= 256 and d > 1
        raw = rng.integers(0, c, (p, d, l)).astype(np.int32)
        resident = _pack_codes(raw, d) if pack else raw
        ftab = rng.standard_normal((g, d * c)).astype(np.float32)
        bidx = rng.integers(0, p, (g,)).astype(np.int32)
        lens = (rng.integers(0, l + 1, (g,)).astype(np.int32)
                if rng.integers(0, 2) else None)
        args = [jnp.asarray(resident), jnp.asarray(ftab),
                jnp.asarray(bidx)]
        if lens is not None:
            args.append(jnp.asarray(lens))
        ref = np.asarray(adc_lookup_indexed(*args, d=d))  # XLA fallback
        try:
            got = np.asarray(adc_lookup_indexed(
                *args, d=d, pipeline="dma", interpret=True))
        except ValueError:
            continue   # shape legitimately pipeline-incompatible
        np.testing.assert_array_equal(np.isinf(got), np.isinf(ref),
                                      err_msg=str((d, c, l, p, g, pack)))
        fin = np.isfinite(ref)
        np.testing.assert_allclose(got[fin], ref[fin], rtol=1e-5,
                                   atol=1e-5,
                                   err_msg=str((d, c, l, p, g, pack)))
