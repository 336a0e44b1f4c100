"""Wire compatibility against an independent protobuf codec.

Compiles ``tests/fixtures/wire_check.proto`` with the system ``protoc`` and
cross-checks the hand-rolled codec (``protos/wire.py``/``messages.py``) both
directions:

* bytes we ENCODE must parse identically through the protoc codec (so the
  Rust reference, which uses the official protobuf runtime, reads our DBs);
* bytes the protoc codec encodes must parse identically through OUR decoder
  (so we read reference-written DBs).

This is the acceptance test SURVEY.md §7 phase 4 calls for, implementable
without a Rust toolchain.
"""

import importlib.util
import shutil
import subprocess
import sys
import uuid
from pathlib import Path

import numpy as np
import pytest

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

FIXTURES = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def wc(tmp_path_factory):
    """The protoc-generated independent codec module."""
    if shutil.which("protoc") is None:
        pytest.skip("protoc not available")
    out = tmp_path_factory.mktemp("gen")
    try:
        subprocess.run(
            ["protoc", f"--proto_path={FIXTURES}",
             f"--python_out={out}", "wire_check.proto"],
            check=True, capture_output=True)
    except subprocess.CalledProcessError as e:  # pragma: no cover
        pytest.skip(f"protoc failed: {e.stderr.decode()}")
    spec = importlib.util.spec_from_file_location(
        "wire_check_pb2", out / "wire_check_pb2.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["wire_check_pb2"] = mod
    try:
        spec.loader.exec_module(mod)
    except Exception as e:  # pragma: no cover - runtime/gencode mismatch
        pytest.skip(f"generated code unusable: {e}")
    return mod


def test_database_ours_to_protoc(wc):
    ours = PDatabase(
        vector_size=128, num_partitions=2, num_divisions=4, num_codes=16,
        partition_ids=["pa", "pb"], partition_centroids_id="cent",
        codebook_ids=["c0", "c1", "c2", "c3"],
        attributes_log_ids=["a0", "a1"], attribute_names=["datum_id", "x"])
    theirs = wc.Database()
    theirs.ParseFromString(ours.encode())
    assert theirs.vector_size == 128
    assert theirs.num_partitions == 2
    assert theirs.num_divisions == 4
    assert theirs.num_codes == 16
    assert list(theirs.partition_ids) == ["pa", "pb"]
    assert theirs.partition_centroids_id == "cent"
    assert list(theirs.codebook_ids) == ["c0", "c1", "c2", "c3"]
    assert list(theirs.attributes_log_ids) == ["a0", "a1"]
    assert list(theirs.attribute_names) == ["datum_id", "x"]


def test_database_protoc_to_ours(wc):
    theirs = wc.Database(
        vector_size=64, num_partitions=1, num_divisions=2, num_codes=8,
        partition_ids=["p"], partition_centroids_id="c",
        codebook_ids=["k0", "k1"], attributes_log_ids=["l0"],
        attribute_names=["n"])
    ours = PDatabase.decode(theirs.SerializeToString())
    assert ours.vector_size == 64
    assert ours.partition_ids == ["p"]
    assert ours.codebook_ids == ["k0", "k1"]
    assert ours.attribute_names == ["n"]


def test_vector_set_roundtrip_both_ways(wc, rng):
    data = rng.standard_normal(64).astype(np.float32)
    ours = PVectorSet(vector_size=8, data=data)
    theirs = wc.VectorSet()
    theirs.ParseFromString(ours.encode())
    assert theirs.vector_size == 8
    np.testing.assert_array_equal(np.array(theirs.data, np.float32), data)

    back = PVectorSet.decode(theirs.SerializeToString())
    assert back.vector_size == 8
    np.testing.assert_array_equal(back.data, data)


def test_partition_roundtrip_both_ways(wc, rng):
    vids = [uuid.uuid4() for _ in range(3)]
    codes = rng.integers(0, 16, (3, 4)).astype(np.uint32)
    ours = PPartition(
        vector_size=8, num_divisions=4,
        centroid=rng.standard_normal(8).astype(np.float32),
        encoded_vectors=PEncodedVectorSet(vector_size=4,
                                          data=codes.reshape(-1)),
        vector_ids=[PUuid.from_uuid(v) for v in vids])
    theirs = wc.Partition()
    theirs.ParseFromString(ours.encode())
    assert theirs.vector_size == 8
    assert theirs.encoded_vectors.vector_size == 4
    assert list(theirs.encoded_vectors.data) == codes.reshape(-1).tolist()
    got_ids = [uuid.UUID(int=(u.upper << 64) | u.lower)
               for u in theirs.vector_ids]
    assert got_ids == vids

    back = PPartition.decode(theirs.SerializeToString())
    assert [u.to_uuid() for u in back.vector_ids] == vids
    np.testing.assert_array_equal(
        back.encoded_vectors.data, codes.reshape(-1))
    np.testing.assert_allclose(back.centroid, ours.centroid)


def test_attributes_log_roundtrip_both_ways(wc):
    vid = uuid.uuid4()
    ours = PAttributesLog(
        partition_id="part0",
        entries=[
            POperationSetAttribute(
                vector_id=PUuid.from_uuid(vid), name_index=1,
                value=PAttributeValue(value="hello")),
            POperationSetAttribute(
                vector_id=PUuid.from_uuid(vid), name_index=0,
                value=PAttributeValue(value=0)),  # oneof default must encode
        ])
    theirs = wc.AttributesLog()
    theirs.ParseFromString(ours.encode())
    assert theirs.partition_id == "part0"
    assert theirs.entries[0].value.string_value == "hello"
    assert theirs.entries[1].value.WhichOneof("value") == "uint64_value"
    assert theirs.entries[1].value.uint64_value == 0

    back = PAttributesLog.decode(theirs.SerializeToString())
    assert back.entries[0].value.value == "hello"
    assert back.entries[1].value.value == 0


def test_uuid_fixed64_both_ways(wc):
    u = uuid.UUID("0123456789abcdef0123456789abcdef")
    ours = PUuid.from_uuid(u)
    theirs = wc.Uuid()
    theirs.ParseFromString(ours.encode())
    assert theirs.upper == u.int >> 64
    assert theirs.lower == u.int & ((1 << 64) - 1)
    assert PUuid.decode(theirs.SerializeToString()).to_uuid() == u


def test_unpacked_repeated_scalars_accepted(wc, rng):
    """proto2-style unpacked encodings of repeated scalars must parse
    (parsers are required to accept both forms)."""
    from flechasdb_tpu.protos import wire
    w = wire.Writer()
    w.varint_field(1, 3)
    for v in (1.5, -2.0, 0.25):
        w.raw(wire.tag(10, wire.WT_FIXED32))
        w.raw(np.float32(v).tobytes())
    vs = PVectorSet.decode(w.getvalue())
    assert vs.vector_size == 3
    np.testing.assert_array_equal(vs.data,
                                  np.array([1.5, -2.0, 0.25], np.float32))


def test_randomized_partitions_both_ways(wc, rng):
    """Randomized sweep: 8 random partitions (varied sizes, zero-half and
    max-value UUIDs, empty code sets) must survive ours→protoc and
    protoc→ours byte-level round-trips — the proto3 zero-scalar skip on
    Uuid halves is the regression this guards."""
    rng2 = np.random.default_rng(99)
    specials = [
        uuid.UUID(int=0),                               # both halves zero
        uuid.UUID(int=1),                               # upper zero
        uuid.UUID(int=1 << 64),                         # lower zero
        uuid.UUID(int=(1 << 128) - 1),                  # max
    ]
    for trial in range(8):
        n_rows = int(rng2.integers(0, 6))
        d = int(rng2.integers(1, 5))
        vids = [specials[int(rng2.integers(0, 4))] if rng2.random() < 0.5
                else uuid.uuid4() for _ in range(n_rows)]
        codes = rng2.integers(0, 1 << 31, (n_rows, d)).astype(np.uint32)
        ours = PPartition(
            vector_size=d * 2, num_divisions=d,
            centroid=rng2.standard_normal(d * 2).astype(np.float32),
            encoded_vectors=PEncodedVectorSet(vector_size=d,
                                              data=codes.reshape(-1)),
            vector_ids=[PUuid.from_uuid(v) for v in vids])
        theirs = wc.Partition()
        theirs.ParseFromString(ours.encode())
        got = [uuid.UUID(int=(u.upper << 64) | u.lower)
               for u in theirs.vector_ids]
        assert got == vids, f"trial {trial}: ours->protoc ids"
        assert list(theirs.encoded_vectors.data) == \
            codes.reshape(-1).tolist()
        back = PPartition.decode(theirs.SerializeToString())
        assert [u.to_uuid() for u in back.vector_ids] == vids, \
            f"trial {trial}: protoc->ours ids"
        np.testing.assert_array_equal(back.encoded_vectors.data,
                                      codes.reshape(-1))


def test_merge_semantics_match_official_runtime(wc, rng):
    """Concatenated encodes must merge identically in both codecs:
    repeated scalars concatenate, nested messages field-merge, singular
    scalars last-write-wins (the official runtime defines the contract;
    rust-protobuf implements the same)."""
    cent = rng.standard_normal(8).astype(np.float32)
    codes = rng.integers(0, 99, 10, dtype=np.uint32)
    a = PPartition(
        vector_size=8, num_divisions=2, centroid=cent[:5],
        encoded_vectors=PEncodedVectorSet(vector_size=2, data=codes[:6]),
        vector_ids=[PUuid.from_uuid(uuid.uuid4())])
    b = PPartition(
        vector_size=8, num_divisions=2, centroid=cent[5:],
        encoded_vectors=PEncodedVectorSet(data=codes[6:]),
        vector_ids=[PUuid.from_uuid(uuid.uuid4())])
    blob = a.encode() + b.encode()

    theirs = wc.Partition()
    theirs.ParseFromString(blob)
    ours = PPartition.decode(blob)

    np.testing.assert_array_equal(
        np.array(theirs.centroid, np.float32), ours.centroid)
    np.testing.assert_array_equal(cent, ours.centroid)
    assert list(theirs.encoded_vectors.data) == \
        ours.encoded_vectors.data.tolist() == codes.tolist()
    assert theirs.encoded_vectors.vector_size == \
        ours.encoded_vectors.vector_size == 2
    assert [uuid.UUID(int=(u.upper << 64) | u.lower)
            for u in theirs.vector_ids] == \
        [u.to_uuid() for u in ours.vector_ids]
