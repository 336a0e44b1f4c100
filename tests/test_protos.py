"""Wire-format tests.

Round-trips through our codec, plus a cross-check against the official
protobuf runtime: a schema with the reference's field numbers/types is
compiled with protoc at test time, and bytes must parse identically in both
directions. This is the wire-compatibility guarantee that reference-built
databases load unchanged (SURVEY §7 phase 4 acceptance).
"""

import importlib.util
import subprocess
import sys
import uuid

import numpy as np
import pytest

from flechasdb_tpu.errors import ProtobufError
from flechasdb_tpu.protos import (
    PAttributesLog,
    PAttributeValue,
    PDatabase,
    PEncodedVectorSet,
    POperationSetAttribute,
    PPartition,
    PUuid,
    PVectorSet,
)
from flechasdb_tpu.protos import wire

# Field layout of the reference schema (src/protos/database.proto) — this is
# the on-disk format contract.
_SCHEMA = """
syntax = "proto3";
package fdbtest;
message Database {
  uint32 vector_size = 1;
  uint32 num_partitions = 2;
  uint32 num_divisions = 3;
  uint32 num_codes = 4;
  repeated string partition_ids = 10;
  string partition_centroids_id = 11;
  repeated string codebook_ids = 12;
  repeated string attributes_log_ids = 13;
  repeated string attribute_names = 14;
}
message Partition {
  uint32 vector_size = 1;
  uint32 num_divisions = 2;
  repeated float centroid = 10;
  EncodedVectorSet encoded_vectors = 11;
  repeated Uuid vector_ids = 12;
}
message VectorSet {
  uint32 vector_size = 1;
  repeated float data = 10;
}
message EncodedVectorSet {
  uint32 vector_size = 1;
  repeated uint32 data = 10;
}
message AttributeValue {
  oneof value {
    string string_value = 1;
    uint64 uint64_value = 2;
  }
}
message AttributesLog {
  string partition_id = 1;
  repeated OperationSetAttribute entries = 10;
}
message OperationSetAttribute {
  Uuid vector_id = 1;
  uint32 name_index = 2;
  AttributeValue value = 3;
}
message Uuid {
  fixed64 upper = 1;
  fixed64 lower = 2;
}
"""


@pytest.fixture(scope="module")
def pb2(tmp_path_factory):
    """Compiles the schema with protoc and imports the generated module."""
    d = tmp_path_factory.mktemp("protoc")
    (d / "fdbtest.proto").write_text(_SCHEMA)
    try:
        subprocess.run(
            ["protoc", f"--proto_path={d}", f"--python_out={d}",
             "fdbtest.proto"],
            check=True, capture_output=True)
    except (FileNotFoundError, subprocess.CalledProcessError) as e:
        pytest.skip(f"protoc unavailable: {e}")
    spec = importlib.util.spec_from_file_location(
        "fdbtest_pb2", d / "fdbtest_pb2.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["fdbtest_pb2"] = mod
    spec.loader.exec_module(mod)
    return mod


# --- varint / packed primitives ---------------------------------------------

@pytest.mark.parametrize("v", [0, 1, 127, 128, 300, 2**21, 2**32 - 1, 2**63])
def test_varint_roundtrip(v):
    buf = wire.encode_varint(v)
    got, pos = wire.decode_varint(buf, 0)
    assert got == v and pos == len(buf)


def test_packed_u32_roundtrip(rng):
    for arr in [
        np.zeros(0, np.uint32),
        np.array([0], np.uint32),
        np.array([127, 128, 255, 256, 2**32 - 1], np.uint32),
        rng.integers(0, 2**32, 10000, dtype=np.uint32),
        rng.integers(0, 256, 10000, dtype=np.uint32),
    ]:
        assert np.array_equal(
            wire.decode_packed_u32(wire.encode_packed_u32(arr)), arr)


def test_packed_u32_truncated_rejected():
    with pytest.raises(ProtobufError):
        wire.decode_packed_u32(b"\x80")  # continuation bit, no next byte


def test_packed_floats_roundtrip(rng):
    arr = rng.standard_normal(1000).astype(np.float32)
    assert np.array_equal(
        wire.decode_packed_floats(wire.encode_packed_floats(arr)), arr)


# --- message round-trips -----------------------------------------------------

def _sample_partition(rng):
    return PPartition(
        vector_size=8,
        num_divisions=2,
        centroid=rng.standard_normal(8).astype(np.float32),
        encoded_vectors=PEncodedVectorSet(
            vector_size=2,
            data=rng.integers(0, 256, 20, dtype=np.uint32)),
        vector_ids=[PUuid.from_uuid(uuid.uuid4()) for _ in range(10)],
    )


def test_uuid_u64_pair_mapping():
    # Uuid splits into most/least significant u64 halves (protos/mod.rs:21-42)
    u = uuid.UUID("a1a2a3a4-b1b2-c1c2-d1d2-d3d4d5d6d7d8")
    p = PUuid.from_uuid(u)
    assert p.upper == 0xA1A2A3A4B1B2C1C2
    assert p.lower == 0xD1D2D3D4D5D6D7D8
    assert p.to_uuid() == u


def test_partition_roundtrip(rng):
    p = _sample_partition(rng)
    q = PPartition.decode(p.encode())
    assert q.vector_size == 8 and q.num_divisions == 2
    assert np.allclose(q.centroid, p.centroid)
    assert np.array_equal(q.encoded_vectors.data, p.encoded_vectors.data)
    assert [u.to_uuid() for u in q.vector_ids] == \
        [u.to_uuid() for u in p.vector_ids]


def test_database_roundtrip():
    d = PDatabase(
        vector_size=16, num_partitions=2, num_divisions=4, num_codes=8,
        partition_ids=["p1", "p2"], partition_centroids_id="pc",
        codebook_ids=["c1", "c2", "c3", "c4"],
        attributes_log_ids=["a1", "a2"],
        attribute_names=["datum_id", "label"])
    q = PDatabase.decode(d.encode())
    assert q == d


def test_attributes_log_roundtrip():
    vid = PUuid.from_uuid(uuid.uuid4())
    log = PAttributesLog(partition_id="pp", entries=[
        POperationSetAttribute(vector_id=vid, name_index=0,
                               value=PAttributeValue("hello")),
        POperationSetAttribute(vector_id=vid, name_index=1,
                               value=PAttributeValue(42)),
        # oneof member at default value must still serialize
        POperationSetAttribute(vector_id=vid, name_index=0,
                               value=PAttributeValue(0)),
        POperationSetAttribute(vector_id=vid, name_index=0,
                               value=PAttributeValue("")),
    ])
    q = PAttributesLog.decode(log.encode())
    assert q.partition_id == "pp"
    assert [e.value.value for e in q.entries] == ["hello", 42, 0, ""]


# --- wire compatibility with the official runtime ---------------------------

def test_ours_parses_in_protobuf(pb2, rng):
    p = _sample_partition(rng)
    g = pb2.Partition()
    g.ParseFromString(p.encode())
    assert g.vector_size == 8 and g.num_divisions == 2
    assert np.allclose(np.array(g.centroid, np.float32), p.centroid)
    assert list(g.encoded_vectors.data) == list(p.encoded_vectors.data)
    assert [u.upper for u in g.vector_ids] == \
        [u.upper for u in p.vector_ids]


def test_protobuf_parses_in_ours(pb2, rng):
    g = pb2.Partition()
    g.vector_size = 8
    g.num_divisions = 2
    g.centroid.extend(rng.standard_normal(8).astype(np.float32).tolist())
    g.encoded_vectors.vector_size = 2
    g.encoded_vectors.data.extend([1, 200, 70000, 0])
    u = g.vector_ids.add()
    u.upper, u.lower = 123, 456
    p = PPartition.decode(g.SerializeToString())
    assert p.vector_size == 8
    assert np.allclose(p.centroid, np.array(g.centroid, np.float32))
    assert list(p.encoded_vectors.data) == [1, 200, 70000, 0]
    assert p.vector_ids[0].upper == 123 and p.vector_ids[0].lower == 456


def test_database_bytes_identical_to_protobuf(pb2):
    """Canonical proto3 encoders should agree byte-for-byte here."""
    d = PDatabase(
        vector_size=16, num_partitions=2, num_divisions=4, num_codes=8,
        partition_ids=["p1", "p2"], partition_centroids_id="pc",
        codebook_ids=["c1", "c2", "c3", "c4"],
        attributes_log_ids=["a1", "a2"],
        attribute_names=["datum_id"])
    g = pb2.Database(
        vector_size=16, num_partitions=2, num_divisions=4, num_codes=8,
        partition_ids=["p1", "p2"], partition_centroids_id="pc",
        codebook_ids=["c1", "c2", "c3", "c4"],
        attributes_log_ids=["a1", "a2"],
        attribute_names=["datum_id"])
    assert d.encode() == g.SerializeToString()


def test_attribute_log_bytes_identical_to_protobuf(pb2):
    ours = PAttributesLog(partition_id="pid", entries=[
        POperationSetAttribute(
            vector_id=PUuid(upper=1, lower=2), name_index=3,
            value=PAttributeValue("v")),
    ])
    g = pb2.AttributesLog(partition_id="pid")
    e = g.entries.add()
    e.vector_id.upper, e.vector_id.lower = 1, 2
    e.name_index = 3
    e.value.string_value = "v"
    assert ours.encode() == g.SerializeToString()


def test_vector_set_bytes_identical_to_protobuf(pb2, rng):
    data = rng.standard_normal(64).astype(np.float32)
    ours = PVectorSet(vector_size=8, data=data)
    g = pb2.VectorSet(vector_size=8, data=data.tolist())
    assert ours.encode() == g.SerializeToString()


def test_unknown_fields_skipped():
    # a future writer may add fields; parsers must skip them
    extra = (wire.tag(99, wire.WT_VARINT) + wire.encode_varint(7)
             + wire.tag(98, wire.WT_LEN) + wire.encode_varint(3) + b"abc"
             + wire.tag(97, wire.WT_FIXED32) + b"\x01\x02\x03\x04")
    d = PDatabase(vector_size=4, num_partitions=1, num_divisions=2,
                  num_codes=2, partition_ids=["x"],
                  partition_centroids_id="y", codebook_ids=["a", "b"])
    q = PDatabase.decode(d.encode() + extra)
    assert q.vector_size == 4 and q.partition_ids == ["x"]


def test_bulk_uuid_records_byte_identical(rng):
    """wire.encode_uuid_records == the per-message Writer loop."""
    ids = [uuid.uuid4() for _ in range(257)]
    raw = np.frombuffer(b"".join(u.bytes for u in ids),
                        np.uint8).reshape(-1, 16)
    bulk = wire.encode_uuid_records(12, raw)
    w = wire.Writer()
    for u in ids:
        w.message_field(12, PUuid.from_uuid(u))
    assert bulk == w.getvalue()


def test_partition_payload_zero_half_uuid_fallback():
    """A zero 64-bit half must take the per-message path (proto3 skips
    zero scalars, shrinking that record)."""
    from flechasdb_tpu.serialize import _partition_payload
    from flechasdb_tpu.build import Database

    weird = uuid.UUID(int=(0 << 64) | 5)           # upper == 0
    normal = uuid.uuid4()
    db = Database(
        vector_size=4,
        num_partitions=1,
        num_divisions=2,
        num_clusters=1,
        vector_ids=[weird, normal],
        partition_centroids=np.zeros((1, 4), np.float32),
        partition_indices=np.zeros(2, np.int32),
        codebooks=np.zeros((2, 1, 2), np.float32),
        codes=np.zeros((2, 2), np.uint32),
    )
    raw = np.frombuffer(b"".join(u.bytes for u in db.vector_ids),
                        np.uint8).reshape(-1, 16)
    assert (_partition_payload(db, 0, raw)
            == _partition_payload(db, 0, None))
    got = PPartition.decode(_partition_payload(db, 0, raw))
    assert [u.to_uuid() for u in got.vector_ids] == [weird, normal]


def test_database_string_run_decode_variants():
    """PDatabase.decode's bulk string-run path must match the generic
    field walk for uniform runs, mixed lengths, >127-char strings,
    non-ASCII names, and empty strings."""
    m = PDatabase(
        vector_size=96, num_partitions=4, num_divisions=2, num_codes=8,
        partition_ids=["A" * 43] * 4,
        partition_centroids_id="C" * 43,
        codebook_ids=["B" * 43, "b" * 43],
        attributes_log_ids=["D" * 43] * 4,
        attribute_names=["", "tag", "naïve-名前", "x" * 200, "y"],
        rotation_id="R" * 43,
    )
    got = PDatabase.decode(m.encode())
    for f in ("vector_size", "num_partitions", "num_divisions",
              "num_codes", "partition_ids", "partition_centroids_id",
              "codebook_ids", "attributes_log_ids", "attribute_names",
              "rotation_id"):
        assert getattr(got, f) == getattr(m, f), f


def test_string_run_stops_at_prefix_change():
    """A run must end exactly where the (tag, length) prefix changes —
    the serial cursor handles the rest."""
    w = wire.Writer()
    for s in ["aa", "bb", "c", "dd"]:       # length change mid-run
        w.string_field(10, s, force=True)
    w.string_field(11, "root")
    got = PDatabase.decode(w.getvalue())
    assert got.partition_ids == ["aa", "bb", "c", "dd"]
    assert got.partition_centroids_id == "root"


def test_flat_chunk_bulk_ids_byte_identical(rng):
    """PFlatChunk bulk ids_raw encode == per-message encode; decode
    recovers the same ids either way."""
    from flechasdb_tpu.protos import PFlatChunk

    ids = [uuid.uuid4() for _ in range(100)]
    raw = np.frombuffer(b"".join(u.bytes for u in ids),
                        np.uint8).reshape(-1, 16)
    vs = PVectorSet(vector_size=4,
                    data=rng.standard_normal(400).astype(np.float32))
    bulk = PFlatChunk(vector_size=4, vectors=vs, ids_raw=raw).encode()
    slow = PFlatChunk(vector_size=4, vectors=vs,
                      vector_ids=[PUuid.from_uuid(u) for u in ids]).encode()
    assert bulk == slow
    got = PFlatChunk.decode(bulk)
    assert got.ids_raw is not None          # bulk tail path engaged
    assert [u.to_uuid() for u in got.vector_ids] == ids


def test_flat_chunk_zero_half_fallback():
    """Zero-half uuids force the per-message path end to end."""
    from flechasdb_tpu.protos import PFlatChunk

    ids = [uuid.UUID(int=7), uuid.uuid4()]   # upper half of first is 0
    vs = PVectorSet(vector_size=2, data=np.zeros(4, np.float32))
    enc = PFlatChunk(vector_size=2, vectors=vs,
                     vector_ids=[PUuid.from_uuid(u) for u in ids]).encode()
    got = PFlatChunk.decode(enc)
    assert [u.to_uuid() for u in got.vector_ids] == ids


# --- proto3 merge semantics (occurrences concatenate, never replace) --------
# rust-protobuf concatenates repeated-field occurrences and merges repeated
# occurrences of a singular message field; decode(a.encode() + b.encode())
# must therefore equal the field-wise merge of a and b.

def test_repeated_u32_segments_concatenate():
    a = PEncodedVectorSet(vector_size=4,
                          data=np.array([1, 2, 3, 4], np.uint32))
    b = PEncodedVectorSet(data=np.array([5, 6], np.uint32))
    got = PEncodedVectorSet.decode(a.encode() + b.encode())
    assert np.array_equal(got.data, [1, 2, 3, 4, 5, 6])
    assert got.vector_size == 4


def test_repeated_u32_packed_unpacked_mix():
    w = wire.Writer()
    w.len_field(10, wire.encode_packed_u32(np.array([1, 2], np.uint32)))
    w.raw(wire.tag(10, wire.WT_VARINT))
    w.raw(wire.encode_varint(9))
    w.len_field(10, wire.encode_packed_u32(np.array([4], np.uint32)))
    got = PEncodedVectorSet.decode(w.getvalue())
    assert np.array_equal(got.data, [1, 2, 9, 4])


def test_repeated_float_segments_concatenate():
    a = PVectorSet(vector_size=2,
                   data=np.array([1.5, -2.0], np.float32))
    b = PVectorSet(data=np.array([0.25], np.float32))
    got = PVectorSet.decode(a.encode() + b.encode())
    assert np.array_equal(got.data, [1.5, -2.0, 0.25])


def test_repeated_float_unpacked_scalars():
    w = wire.Writer()
    w.len_field(10, wire.encode_packed_floats(
        np.array([1.0], np.float32)))
    w.raw(wire.tag(10, wire.WT_FIXED32))
    w.raw(np.float32(3.5).tobytes())
    got = PVectorSet.decode(w.getvalue())
    assert np.array_equal(got.data, [1.0, 3.5])


def test_partition_centroid_and_nested_merge(rng):
    """Split centroid across two packed segments plus one unpacked
    element, and the encoded_vectors message across two occurrences."""
    cent = rng.standard_normal(8).astype(np.float32)
    codes = rng.integers(0, 16, 12, dtype=np.uint32)
    w = wire.Writer()
    w.varint_field(1, 8)
    w.varint_field(2, 2)
    w.len_field(10, wire.encode_packed_floats(cent[:5]))
    w.len_field(10, wire.encode_packed_floats(cent[5:7]))
    w.raw(wire.tag(10, wire.WT_FIXED32))
    w.raw(cent[7:8].tobytes())
    ev = PEncodedVectorSet(vector_size=2, data=codes)
    evb = ev.encode()
    cut = len(evb) // 2
    # two occurrences of field 11 whose payloads concatenate to evb; any
    # split point is valid since merge == parse-of-concatenation
    w.len_field(11, evb[:cut])
    w.len_field(11, evb[cut:])
    got = PPartition.decode(w.getvalue())
    assert np.array_equal(got.centroid, cent)
    assert got.encoded_vectors.vector_size == 2
    assert np.array_equal(got.encoded_vectors.data, codes)


def test_flat_chunk_vectors_merge(rng):
    from flechasdb_tpu.protos import PFlatChunk

    data = rng.standard_normal(8).astype(np.float32)
    w = wire.Writer()
    w.varint_field(1, 4)
    w.len_field(10, PVectorSet(vector_size=4, data=data[:6]).encode())
    w.len_field(10, PVectorSet(data=data[6:]).encode())
    got = PFlatChunk.decode(w.getvalue())
    assert got.vectors.vector_size == 4
    assert np.array_equal(got.vectors.data, data)


def test_operation_nested_message_merge():
    u = uuid.uuid4()
    op = POperationSetAttribute(
        vector_id=PUuid.from_uuid(u), name_index=1,
        value=PAttributeValue("x"))
    # a second value occurrence switches the oneof: last write wins
    w = wire.Writer()
    w.raw(op.encode())
    w.message_field(3, PAttributeValue(42))
    got = POperationSetAttribute.decode(w.getvalue())
    assert got.vector_id.to_uuid() == u
    assert got.value.value == 42
