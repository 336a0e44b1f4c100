"""Adversarial decode robustness.

Arbitrary, corrupted, or malicious bytes through every wire decoder must
either parse or raise the framework's typed error family (FlechasError:
ProtobufError / InvalidData / IOError_ / VerificationFailure) — never an
implementation exception (UnicodeDecodeError, OverflowError, IndexError,
numpy ValueError, MemoryError-by-allocation...). The reference gets this
for free from rust-protobuf's typed ``ProtobufError`` on any malformed
input (``src/error.rs:17``, ``src/protos/mod.rs:44-65``); content
addressing narrows but does not close the window — the sync stored path
deliberately skips verification of partition-centroids and attribute
logs (``db/stored.rs:732-754``, quirk parity), and a valid hash proves
integrity, not well-formedness.

No device work: everything here is the host decode path.
"""

import zlib

import numpy as np
import pytest

from flechasdb_tpu.errors import FlechasError
from flechasdb_tpu.io import HashedFileReader, LocalFileSystem, content_hash
from flechasdb_tpu.protos import messages as pm
from flechasdb_tpu.protos import wire

DECODERS = [
    pm.PUuid.decode,
    pm.PVectorSet.decode,
    pm.PEncodedVectorSet.decode,
    pm.PPartition.decode,
    pm.PAttributeValue.decode,
    pm.POperationSetAttribute.decode,
    pm.PAttributesLog.decode,
    pm.PDatabase.decode,
    pm.PFlatChunk.decode,
    pm.PFlatDatabase.decode,
]


def _decode_fully(fn, buf):
    """Decode + touch lazy surfaces (ids materialization, utf-8 strings)."""
    m = fn(buf)
    for attr in ("vector_ids", "partition_ids", "codebook_ids",
                 "attributes_log_ids", "attribute_names", "chunk_ids",
                 "entries", "value", "partition_centroids_id",
                 "partition_id", "rotation_id"):
        getattr(m, attr, None)
    return m


def _assert_clean(fn, buf):
    try:
        _decode_fully(fn, buf)
    except FlechasError:
        pass  # the contract: typed errors only
    except Exception as e:  # noqa: BLE001 — the point of the test
        pytest.fail(
            f"{fn.__qualname__} leaked {type(e).__name__}: {e!r} "
            f"on input {buf[:40]!r}{'...' if len(buf) > 40 else ''}")


def test_random_bytes_every_decoder():
    rng = np.random.default_rng(0xFEED)
    for _ in range(150):
        n = int(rng.integers(0, 200))
        buf = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        for fn in DECODERS:
            _assert_clean(fn, buf)


def _valid_corpus():
    """One realistic encoded message per decoder (attack surface = all
    field types: strings, packed floats, varints, nested messages, uuid
    record tails)."""
    ids = [pm.PUuid(upper=(i + 1) << 32, lower=i + 7) for i in range(5)]
    evs = pm.PEncodedVectorSet(vector_size=4,
                               data=np.arange(20, dtype=np.uint32) * 37)
    part = pm.PPartition(
        vector_size=8, num_divisions=4,
        centroid=np.linspace(-1, 1, 8, dtype=np.float32),
        encoded_vectors=evs, vector_ids=ids)
    log = pm.PAttributesLog(
        partition_id="abc123", entries=[
            pm.POperationSetAttribute(
                vector_id=ids[0], name_index=1,
                value=pm.PAttributeValue("héllo")),
            pm.POperationSetAttribute(
                vector_id=ids[1], name_index=0,
                value=pm.PAttributeValue(2**63)),
        ])
    db = pm.PDatabase(
        vector_size=8, num_partitions=2, num_divisions=4, num_codes=16,
        partition_ids=["p" * 43, "q" * 43],
        partition_centroids_id="c" * 43,
        codebook_ids=["k" * 43] * 4,
        attributes_log_ids=["a" * 43, "b" * 43],
        attribute_names=["name", "datum_id"])
    flat = pm.PFlatDatabase(vector_size=8, num_vectors=10,
                            chunk_ids=["x" * 43], attribute_names=["n"])
    chunk = pm.PFlatChunk(
        vector_size=8,
        vectors=pm.PVectorSet(vector_size=8,
                              data=np.ones(80, np.float32)),
        vector_ids=ids)
    return [
        (pm.PPartition.decode, part.encode()),
        (pm.PAttributesLog.decode, log.encode()),
        (pm.PDatabase.decode, db.encode()),
        (pm.PFlatDatabase.decode, flat.encode()),
        (pm.PFlatChunk.decode, chunk.encode()),
    ]


def test_single_byte_mutations():
    """Flip every byte of valid messages to every-other of 8 values."""
    for fn, buf in _valid_corpus():
        arr = bytearray(buf)
        for pos in range(len(arr)):
            orig = arr[pos]
            for flip in (0x00, 0xFF, 0x80, orig ^ 0x0F):
                if flip == orig:
                    continue
                arr[pos] = flip
                _assert_clean(fn, bytes(arr))
            arr[pos] = orig


def test_truncations_and_extensions():
    for fn, buf in _valid_corpus():
        for cut in range(len(buf)):
            _assert_clean(fn, buf[:cut])
        _assert_clean(fn, buf + b"\xff" * 7)
        _assert_clean(fn, buf + buf)


def test_invalid_utf8_in_string_fields():
    """Invalid UTF-8 where the schema says string → ProtobufError, not
    UnicodeDecodeError. Covers both the run decoder (same-length records)
    and the serial fallback (odd lengths)."""
    from flechasdb_tpu.errors import ProtobufError
    bad = b"\xff\xfe\x80"
    for field in (10, 11, 12, 13, 14, 20):
        w = wire.Writer()
        w.len_field(field, bad)
        w.len_field(field, bad)        # a run of two, same length
        _assert_clean(pm.PDatabase.decode, w.getvalue())
        with pytest.raises(ProtobufError):
            _decode_fully(pm.PDatabase.decode, w.getvalue())
    w = wire.Writer()
    w.len_field(1, bad)
    with pytest.raises(ProtobufError):
        _decode_fully(pm.PAttributeValue.decode, w.getvalue())
    for field in (10, 11, 12):
        w = wire.Writer()
        w.len_field(field, bad)
        with pytest.raises(ProtobufError):
            _decode_fully(pm.PFlatDatabase.decode, w.getvalue())


def test_unpacked_varint_overflow():
    """An unpacked uint32 element > 2^32-1 must be a ProtobufError, not a
    numpy OverflowError."""
    from flechasdb_tpu.errors import ProtobufError
    w = wire.Writer()
    w.varint_field(1, 4)
    w.raw(wire.tag(10, wire.WT_VARINT))
    w.raw(wire.encode_varint(2**40))
    with pytest.raises(ProtobufError):
        pm.PEncodedVectorSet.decode(w.getvalue())


def test_packed_u32_native_matches_numpy(monkeypatch):
    """The native varint walk and the production numpy fallback must
    agree on adversarial payloads: same values, or both reject (native
    signals malformed by returning None; numpy raises ProtobufError).
    The fallback is exercised THROUGH ``wire.decode_packed_u32`` with the
    native hook disabled, so this check tracks the real code path."""
    from flechasdb_tpu import _native
    from flechasdb_tpu.errors import ProtobufError
    if not _native.available():
        pytest.skip("native IO unavailable")
    rng = np.random.default_rng(77)
    cases = [rng.integers(0, 256, int(rng.integers(1, 64)),
                          dtype=np.uint8).tobytes() for _ in range(300)]
    cases += [
        b"\x80",                      # truncated
        b"\xff" * 10 + b"\x01",       # too long
        b"\xff\xff\xff\xff\x7f",      # 2^35-1: uint32 overflow
        b"\xff\xff\xff\xff\x0f",      # 2^32-1: max valid
        b"\x00" * 50,                 # fifty zeros
    ]
    native_results = [_native.varint_u32(p) for p in cases]
    monkeypatch.setattr(wire._native, "varint_u32", lambda payload: None)
    for payload, got in zip(cases, native_results):
        try:
            expect = wire.decode_packed_u32(payload)
        except ProtobufError:
            expect = None
        if expect is None:
            assert got is None, payload
        else:
            assert got is not None and np.array_equal(got, expect), payload


def test_garbage_under_valid_hash(tmp_path):
    """A file whose NAME matches its (garbage) content passes
    verification but must still fail decode with a typed error — hash
    checks integrity, not well-formedness."""
    from flechasdb_tpu.stored import load_database
    rng = np.random.default_rng(3)
    base = tmp_path / "db"
    base.mkdir()
    for raw in (b"", b"\x00", rng.bytes(64),
                zlib.compress(rng.bytes(64))):
        name = content_hash(raw)
        (base / f"{name}.binpb").write_bytes(raw)
        try:
            load_database(LocalFileSystem(str(base)), f"{name}.binpb")
        except FlechasError:
            pass
        except Exception as e:  # noqa: BLE001
            pytest.fail(f"load_database leaked {type(e).__name__}: {e!r}")


def test_reader_rejects_corrupt_deflate():
    from flechasdb_tpu.errors import IOError_
    r = HashedFileReader(b"\x00\x01\x02not-deflate", "x.binpb",
                         compressed=True)
    with pytest.raises(IOError_):
        r.read()
