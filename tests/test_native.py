"""Native IO runtime parity (``flechasdb_tpu/native/fastio.cc`` vs Python zlib/hashlib).

The content-addressing contract requires byte-identical deflate output and
identical SHA-256 naming regardless of which runtime produced a file — a
database written with the native path must verify with the fallback and
vice versa.
"""

import base64
import hashlib
import zlib

import pytest

from flechasdb_tpu import _native

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="native IO runtime not built")


def _py_hash(data: bytes) -> str:
    return base64.urlsafe_b64encode(
        hashlib.sha256(data).digest()).decode().rstrip("=")


@pytest.mark.parametrize("size", [0, 1, 55, 56, 64, 65, 4096, 1 << 20])
def test_hash_parity(size, rng):
    data = rng.bytes(size)
    assert _native.hash_name(data) == _py_hash(data)


def test_pack_deflate_byte_identical(rng):
    data = rng.bytes(100_000)
    stored, h = _native.pack(data, True)
    assert stored == zlib.compress(data, 6)
    assert h == _py_hash(stored)


def test_pack_uncompressed(rng):
    data = rng.bytes(1000)
    stored, h = _native.pack(data, False)
    assert stored == data
    assert h == _py_hash(data)


def test_unpack_roundtrip(rng):
    data = rng.bytes(50_000)
    stored, h = _native.pack(data, True)
    payload, h2 = _native.unpack(stored, True)
    assert payload == data
    assert h2 == h


def test_unpack_corrupt_stream_raises(rng):
    stored, _ = _native.pack(rng.bytes(1000), True)
    with pytest.raises(ValueError):
        _native.unpack(stored[:-3] + b"xyz", True)


def test_cross_runtime_verify(tmp_path, rng):
    """A DB artifact written natively verifies through the Python path and
    vice versa (they share the hash/deflate contract)."""
    from flechasdb_tpu.io import HashedFileReader, content_hash

    payload = rng.bytes(10_000)
    stored, h = _native.pack(payload, True)
    # python-side reader over natively-written bytes
    r = HashedFileReader(stored, f"{h}.binpb", compressed=True)
    assert r.read() == payload
    r.verify()
    # python-written bytes hash to the same name natively
    py_stored = zlib.compress(payload, 6)
    assert _native.hash_name(py_stored) == content_hash(py_stored) == h


# ---------------------------------------------------------- host query path


@pytest.mark.parametrize("n,k", [(1000, 10), (50, 10), (1000, 1), (7, 7)])
def test_topk_parity(n, k, rng):
    """fio_topk_f32 == stable argsort prefix, incl. heavy ties and inf."""
    import numpy as np

    d = rng2 = np.random.default_rng(n * 31 + k)
    d = rng2.standard_normal(n).astype(np.float32)
    d[rng2.integers(0, n, n // 7 + 1)] = np.inf
    dt = np.round(d, 1)                       # force tie groups
    for arr in (d, dt):
        got = _native.topk_f32(arr, k)
        ref = np.argsort(arr, kind="stable")[:k]
        assert (got == ref).all()


def test_topk_stable_numpy_fallback_parity(rng):
    """The numpy partition+repair fallback must match stable argsort too
    (boundary ties are the tricky case)."""
    import numpy as np

    from flechasdb_tpu import stored as st

    rng2 = np.random.default_rng(3)
    d = np.round(rng2.standard_normal(500), 1).astype(np.float32)
    ref = np.argsort(d, kind="stable")[:25]
    # bypass native: exercise the partition path on an f64 copy (native is
    # f32-only by design) with identical ordering semantics
    got64 = st.topk_stable(d.astype(np.float64), 25)
    assert (got64 == ref).all()


def test_adc_sum_parity(rng):
    import numpy as np

    rng2 = np.random.default_rng(9)
    d_, c_, rows = 12, 256, 777
    table = rng2.standard_normal((d_, c_)).astype(np.float32)
    codes = rng2.integers(0, c_, (rows, d_)).astype(np.uint32)
    got = _native.adc_sum(table, codes)
    ref = table[np.arange(d_)[None, :], codes].sum(1)
    # even/odd accumulator split reorders the f32 sum (see fio_adc_sum)
    assert np.allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_adc_topk_parity(rng):
    """Fused scan+top-k == the two-step path: same indices (stable ties),
    same selected distances, across k < L, k == L, k > L."""
    import numpy as np

    from flechasdb_tpu import stored as st

    rng2 = np.random.default_rng(17)
    d_, c_ = 8, 64
    table = np.round(
        rng2.standard_normal((d_, c_)), 1).astype(np.float32)  # tie groups
    for rows, k in [(777, 10), (25, 25), (5, 10), (1, 1)]:
        codes = rng2.integers(0, c_, (rows, d_)).astype(np.uint32)
        qnorm = float(rng2.standard_normal())
        got = _native.adc_topk(table, qnorm, codes, k)
        assert got is not None
        order, dsel = got
        ref_order, ref_dists = st.adc_scan_with_table(
            table, qnorm, codes, k)
        np.testing.assert_array_equal(order, ref_order)
        np.testing.assert_allclose(dsel, ref_dists[ref_order],
                                   rtol=1e-6, atol=1e-6)
        # the public wrapper routes through the fused path transparently
        w_order, w_dsel = st.adc_scan_topk(table, qnorm, codes, k)
        np.testing.assert_array_equal(w_order, ref_order)

    assert _native.adc_topk(table.astype(np.float64), 0.0,
                            np.zeros((3, d_), np.uint32), 2) is None


def test_adc_topk_batch_parity(rng):
    """One batched crossing == n independent adc_topk calls, including
    short partitions (rows < k) via the count column."""
    import numpy as np

    rng2 = np.random.default_rng(23)
    n, d_, c_, k = 5, 8, 64, 10
    tables = np.round(
        rng2.standard_normal((n, d_, c_)), 1).astype(np.float32)
    qnorms = rng2.standard_normal(n).astype(np.float32)
    codes_list = [
        rng2.integers(0, c_, (rows, d_)).astype(np.uint32)
        for rows in (300, 7, 1, 150, 10)]
    got = _native.adc_topk_batch(tables, qnorms, codes_list, k)
    assert got is not None
    idxb, distb, cntb = got
    for i in range(n):
        ref = _native.adc_topk(tables[i], float(qnorms[i]),
                               codes_list[i], k)
        order, dsel = ref
        assert int(cntb[i]) == len(order)
        np.testing.assert_array_equal(idxb[i, :len(order)], order)
        np.testing.assert_allclose(distb[i, :len(order)], dsel)

    bad = [codes_list[0].astype(np.int64)] + codes_list[1:]
    assert _native.adc_topk_batch(tables, qnorms, bad, k) is None


def test_varint_u32_parity(rng):
    """Native packed-varint decode == the numpy decoder, across the whole
    u32 range; malformed payloads return None (caller falls back)."""
    import numpy as np

    from flechasdb_tpu.protos import wire

    rng2 = np.random.default_rng(21)
    vals = np.concatenate([
        rng2.integers(0, 1 << 7, 50), rng2.integers(0, 1 << 14, 50),
        rng2.integers(0, 1 << 21, 50), rng2.integers(0, 1 << 32, 50),
        [0, 127, 128, (1 << 32) - 1]]).astype(np.uint64)
    payload = wire.encode_packed_u32(vals)
    got = _native.varint_u32(payload)
    assert got is not None and got.dtype == np.uint32
    np.testing.assert_array_equal(got, vals.astype(np.uint32))
    # decode_packed_u32 routes through the native path transparently
    np.testing.assert_array_equal(wire.decode_packed_u32(payload),
                                  vals.astype(np.uint32))

    assert _native.varint_u32(b"\x80") is None           # truncated
    assert _native.varint_u32(b"\xff" * 11 + b"\x01") is None  # too long
    over = wire.encode_packed_u32(np.asarray([1 << 32], np.uint64))
    assert _native.varint_u32(over) is None              # u32 overflow
    assert len(_native.varint_u32(b"")) == 0


def test_adc_sum_rejects_wrong_dtype(rng):
    import numpy as np

    table = np.zeros((2, 4), np.float64)
    codes = np.zeros((3, 2), np.uint32)
    assert _native.adc_sum(table, codes) is None   # caller falls back


def test_bind_stale_library_returns_none(tmp_path):
    """_bind on a library missing the fio_* symbols (e.g. a stale cached
    .so from an older source) must return None so _load can rebuild or
    fall back — not raise AttributeError out of the first query."""
    import ctypes.util

    from flechasdb_tpu import _native as nat

    zlib_path = ctypes.util.find_library("z")
    assert zlib_path is not None
    assert nat._bind(type(nat._LIB_PATH)(zlib_path)) is None
    # and the real library still binds
    assert nat._bind(nat._LIB_PATH) is not None
