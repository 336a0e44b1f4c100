"""Native IO runtime parity (``native/fastio.cc`` vs Python zlib/hashlib).

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
