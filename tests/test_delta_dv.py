"""Deletion-vector codec + external-reader DV application tests.

The codec half pins EXACT bytes (hand-computed from the published
specs — ZeroMQ 32/Z85's own test vector, the RoaringFormatSpec
portable layout, the Delta protocol's DV magic/file framing) so a
symmetric encode/decode bug cannot hide behind a round trip.  The
reader half hand-builds foreign ``_delta_log`` fixtures carrying
``deletionVector`` descriptors in all three storage modes and proves
deleted rows stay deleted (and reappear under time travel to a
pre-delete version).
"""

from __future__ import annotations

import json
import os
import struct
import uuid
import zlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_lakehouse_project_spark.operators import dv as dvmod
from data_lakehouse_project_spark.operators.delta_reader import (
    UnsupportedDeltaFeature,
    read_delta_snapshot,
    read_delta_table,
)
from data_lakehouse_project_spark.operators.dv import (
    dv_relative_path,
    rbm_array_deserialize,
    rbm_array_serialize,
    read_dv_file_entry,
    resolve_dv_positions,
    write_dv_file,
    z85_decode,
    z85_encode,
)

# ------------------------------------------------------------------- codec


def test_z85_spec_vector():
    # The reference vector from the ZeroMQ 32/Z85 spec itself.
    assert z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])) == "HelloWorld"
    assert z85_decode("HelloWorld") == bytes(
        [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]
    )


def test_z85_errors():
    with pytest.raises(ValueError):
        z85_encode(b"abc")  # not a multiple of 4
    with pytest.raises(ValueError):
        z85_decode("abcd")  # not a multiple of 5
    with pytest.raises(ValueError):
        z85_decode('abcd"')  # invalid character


def test_rbm_pinned_bytes_small():
    """[1,2,3] -> one bucket, one array container; every byte below is
    hand-derived from the specs (Delta magic 1681511377 = 0x6439D3D1,
    roaring no-run cookie 12346 = 0x303A, offset header points past
    8+4+4 = 16 bytes)."""
    blob = rbm_array_serialize([1, 2, 3])
    expected = bytes.fromhex(
        "d1d33964"  # magic, u32 LE
        "0100000000000000"  # 1 bucket, u64 LE
        "00000000"  # bucket key 0, u32 LE
        "3a300000"  # cookie 12346
        "01000000"  # 1 container
        "0000" "0200"  # container key 0, cardinality-1 = 2
        "10000000"  # offset of container payload = 16
        "010002000300"  # values 1,2,3 u16 LE
    )
    assert blob == expected
    assert rbm_array_deserialize(blob) == [1, 2, 3]


def test_rbm_round_trip_array_and_bitset():
    # bitset container (cardinality > 4096) + a second sparse bucket
    vals = sorted(set(range(0, 20000, 3)) | {1 << 33, (1 << 33) + 5})
    blob = rbm_array_serialize(vals)
    assert rbm_array_deserialize(blob) == vals


def test_rbm_multi_container_within_bucket():
    vals = [5, 0x10000 + 7, 0x10000 + 9, 0x7FFF0001]
    blob = rbm_array_serialize(vals)
    assert rbm_array_deserialize(blob) == vals


def test_rbm_pad4_tolerated():
    vals = [1, 2, 3]
    blob = rbm_array_serialize(vals, pad4=True)
    assert len(blob) % 4 == 0
    assert rbm_array_deserialize(blob) == vals
    # non-zero trailing garbage must NOT be tolerated
    with pytest.raises(ValueError):
        rbm_array_deserialize(rbm_array_serialize(vals) + b"\x01")


def test_rbm_run_container_decode():
    """The encoder never emits run containers; hand-build cookie-12347
    bytes per the RoaringFormatSpec and decode: runs [10..14] and
    [100..100] in bucket 0."""
    rb32 = (
        struct.pack("<HH", 12347, 0)  # cookie + (containers-1)=0
        + bytes([0b1])  # run flag bitset: container 0 is a run
        + struct.pack("<HH", 0, 5)  # key 0, cardinality-1 = 5
        # < NO_OFFSET_THRESHOLD containers -> no offset header
        + struct.pack("<H", 2)  # 2 runs
        + struct.pack("<HH", 10, 4)  # start 10, length-1 = 4
        + struct.pack("<HH", 100, 0)  # start 100, length-1 = 0
    )
    blob = struct.pack("<IQI", dvmod.MAGIC, 1, 0) + rb32
    assert rbm_array_deserialize(blob) == [10, 11, 12, 13, 14, 100]


def test_rbm_bad_magic_and_order():
    with pytest.raises(ValueError):
        rbm_array_deserialize(b"\x00" * 12)
    with pytest.raises(ValueError):
        rbm_array_serialize([3, 2])


# ---------------------------------------------------------------- DV files


def test_dv_file_round_trip(tmp_path):
    path = str(tmp_path / "deletion_vector_test.bin")
    frags = write_dv_file(path, [[1, 5, 9], list(range(100))])
    assert [f["cardinality"] for f in frags] == [3, 100]
    for frag, want in zip(frags, [[1, 5, 9], list(range(100))]):
        blob = read_dv_file_entry(path, frag["offset"], frag["sizeInBytes"])
        assert rbm_array_deserialize(blob) == want


def test_dv_file_crc_and_version_guards(tmp_path):
    path = str(tmp_path / "dv.bin")
    frags = write_dv_file(path, [[1, 2]])
    raw = bytearray(open(path, "rb").read())
    # flip one payload byte -> CRC must catch it
    tampered = bytearray(raw)
    tampered[frags[0]["offset"] + 4 + 13] ^= 0xFF
    open(path, "wb").write(bytes(tampered))
    with pytest.raises(ValueError, match="checksum"):
        read_dv_file_entry(path, frags[0]["offset"], frags[0]["sizeInBytes"])
    # bad version byte
    raw[0] = 9
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="version"):
        read_dv_file_entry(path, frags[0]["offset"], frags[0]["sizeInBytes"])


def test_dv_uuid_path_materialization():
    u = uuid.UUID("00112233-4455-6677-8899-aabbccddeeff")
    enc = z85_encode(u.bytes)
    assert len(enc) == 20
    prefix, name = dv_relative_path("ab/" + enc)
    assert prefix == "ab/"
    assert name == f"deletion_vector_{u}.bin"
    assert dv_relative_path(enc) == ("", name)


def test_resolve_inline_and_cardinality_guard(tmp_path):
    blob = rbm_array_serialize([2, 4], pad4=True)
    desc = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(blob),
        "sizeInBytes": len(blob),
        "cardinality": 2,
    }
    assert resolve_dv_positions(desc, str(tmp_path)) == [2, 4]
    with pytest.raises(ValueError, match="cardinality"):
        resolve_dv_positions({**desc, "cardinality": 3}, str(tmp_path))


# ------------------------------------------------- foreign-table fixtures

SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _write_data(table, name, ids, vs):
    path = os.path.join(table, name)
    pq.write_table(
        pa.table(
            {"id": pa.array(ids, pa.int64()), "v": pa.array(vs, pa.string())}
        ),
        path,
    )
    return os.path.getsize(path)


def _commit(table, version, actions):
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _protocol_dv():
    return {
        "protocol": {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"],
        }
    }


def _meta():
    return {
        "metaData": {
            "id": "dv-fixture-0001",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": SCHEMA,
            "partitionColumns": [],
            "configuration": {},
            "createdTime": 1700000000000,
        }
    }


def _add(path, size, n, dv=None):
    a = {
        "path": path,
        "partitionValues": {},
        "size": size,
        "modificationTime": 1700000001000,
        "dataChange": True,
        "stats": json.dumps({"numRecords": n}),
    }
    if dv is not None:
        a["deletionVector"] = dv
    return {"add": a}


@pytest.fixture()
def dv_table(tmp_path):
    """v0: two files, 5 + 4 rows.  v1: file A gains an INLINE DV
    deleting rows 1 and 3; file B gains an on-disk 'u' DV deleting
    row 0.  Expected surviving ids: A {10, 12, 14}, B {21, 22, 23}."""
    table = str(tmp_path / "dv_delta")
    os.makedirs(table)
    s_a = _write_data(table, "A.parquet", [10, 11, 12, 13, 14], list("abcde"))
    s_b = _write_data(table, "B.parquet", [20, 21, 22, 23], list("wxyz"))
    _commit(
        table,
        0,
        [
            _protocol_dv(),
            _meta(),
            _add("A.parquet", s_a, 5),
            _add("B.parquet", s_b, 4),
            {"commitInfo": {"timestamp": 1700000001000, "operation": "WRITE"}},
        ],
    )
    inline_blob = rbm_array_serialize([1, 3], pad4=True)
    u = uuid.uuid5(uuid.NAMESPACE_URL, "dv-fixture")
    frags = write_dv_file(
        os.path.join(table, f"deletion_vector_{u}.bin"), [[0]]
    )
    _commit(
        table,
        1,
        [
            {
                "remove": {
                    "path": "A.parquet",
                    "deletionTimestamp": 1700000002000,
                    "dataChange": True,
                }
            },
            _add(
                "A.parquet",
                s_a,
                5,
                dv={
                    "storageType": "i",
                    "pathOrInlineDv": z85_encode(inline_blob),
                    "sizeInBytes": len(inline_blob),
                    "cardinality": 2,
                },
            ),
            {
                "remove": {
                    "path": "B.parquet",
                    "deletionTimestamp": 1700000002000,
                    "dataChange": True,
                }
            },
            _add(
                "B.parquet",
                s_b,
                4,
                dv={
                    "storageType": "u",
                    "pathOrInlineDv": z85_encode(u.bytes),
                    "offset": frags[0]["offset"],
                    "sizeInBytes": frags[0]["sizeInBytes"],
                    "cardinality": 1,
                },
            ),
            {"commitInfo": {"timestamp": 1700000002000, "operation": "DELETE"}},
        ],
    )
    return table


def test_dv_snapshot_keeps_descriptors(dv_table):
    snap = read_delta_snapshot(dv_table)
    dvs = {
        f["path"]: f.get("foreign_dv") for f in snap.files
    }
    assert dvs["A.parquet"]["storageType"] == "i"
    assert dvs["B.parquet"]["storageType"] == "u"


def test_dv_rows_deleted_and_time_travel(spark, dv_table):
    ids = sorted(
        r.id for r in read_delta_table(spark, dv_table).select("id").collect()
    )
    assert ids == [10, 12, 14, 21, 22, 23]
    # pre-delete snapshot still shows every row
    ids0 = sorted(
        r.id
        for r in read_delta_table(spark, dv_table, version=0)
        .select("id")
        .collect()
    )
    assert ids0 == [10, 11, 12, 13, 14, 20, 21, 22, 23]


def test_dv_with_absolute_path_storage(spark, tmp_path):
    table = str(tmp_path / "dv_p")
    os.makedirs(table)
    s = _write_data(table, "C.parquet", [1, 2, 3], list("abc"))
    dv_path = str(tmp_path / "elsewhere.bin")
    frags = write_dv_file(dv_path, [[2]])
    _commit(
        table,
        0,
        [
            _protocol_dv(),
            _meta(),
            _add(
                "C.parquet",
                s,
                3,
                dv={
                    "storageType": "p",
                    "pathOrInlineDv": dv_path,
                    "offset": frags[0]["offset"],
                    "sizeInBytes": frags[0]["sizeInBytes"],
                    "cardinality": 1,
                },
            ),
            {"commitInfo": {"timestamp": 1700000001000, "operation": "WRITE"}},
        ],
    )
    ids = sorted(
        r.id for r in read_delta_table(spark, table).select("id").collect()
    )
    assert ids == [1, 2]


def test_internal_dv_tag_still_refused(tmp_path):
    """The internal writer's lakehouse.dv tag is NOT protocol roaring
    data; the spec-path reader must refuse it even though the
    deletionVectors feature is now supported."""
    table = str(tmp_path / "internal_dv")
    os.makedirs(table)
    s = _write_data(table, "D.parquet", [1], ["a"])
    add = _add("D.parquet", s, 1)
    add["add"]["tags"] = {"lakehouse.dv": json.dumps({"positions": [0]})}
    _commit(
        table,
        0,
        [
            _protocol_dv(),
            _meta(),
            add,
            {"commitInfo": {"timestamp": 1700000001000, "operation": "WRITE"}},
        ],
    )
    with pytest.raises(UnsupportedDeltaFeature, match="lakehouse.dv"):
        read_delta_snapshot(table)


def test_unknown_reader_feature_still_refused(tmp_path):
    table = str(tmp_path / "widen")
    os.makedirs(table)
    s = _write_data(table, "E.parquet", [1], ["a"])
    _commit(
        table,
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors", "catalogManaged"],
                    "writerFeatures": [],
                }
            },
            _meta(),
            _add("E.parquet", s, 1),
            {"commitInfo": {"timestamp": 1700000001000, "operation": "WRITE"}},
        ],
    )
    with pytest.raises(UnsupportedDeltaFeature, match="catalogManaged"):
        read_delta_snapshot(table)


def test_dv_applied_under_uri_hostile_paths(spark, tmp_path):
    """ADVICE r6: Spark's ``_metadata.file_path`` is a Hadoop URI that
    percent-encodes space/%% but keeps ``+`` and non-ASCII raw; a key
    mismatch would silently RESURRECT deleted rows.  Table and data
    file names here hit every encoding class — the anti-join must
    still drop exactly the DV'd positions."""
    table = str(tmp_path / "dv tab%le+é")
    os.makedirs(table)
    fname = "part a%b+c é.parquet"
    s = _write_data(table, fname, [10, 11, 12, 13, 14], list("abcde"))
    blob = rbm_array_serialize([1, 3], pad4=True)
    _commit(
        table,
        0,
        [
            _protocol_dv(),
            _meta(),
            _add(
                fname,
                s,
                5,
                dv={
                    "storageType": "i",
                    "pathOrInlineDv": z85_encode(blob),
                    "sizeInBytes": len(blob),
                    "cardinality": 2,
                },
            ),
            {"commitInfo": {"timestamp": 1700000001000, "operation": "WRITE"}},
        ],
    )
    snap = read_delta_snapshot(table)
    assert snap.num_rows == 3  # 5 physical - 2 DV-deleted
    ids = sorted(r.id for r in read_delta_table(spark, table).collect())
    assert ids == [10, 12, 14]


# ---------------------------------------------------------- hypothesis fuzz

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:

    _positions = st.sets(
        st.one_of(
            st.integers(min_value=0, max_value=1 << 20),
            # bucket boundaries: low-32-bit edges and >32-bit values
            st.integers(min_value=0xFFFF_FFF0, max_value=0x1_0000_0010),
            st.integers(
                min_value=(7 << 32) - 4, max_value=(7 << 32) + 4
            ),
        ),
        max_size=6000,
    )

    @settings(max_examples=60, deadline=None)
    @given(_positions)
    def test_rbm_roundtrip_property(vals):
        """Any sorted distinct u64 set round-trips the portable
        RoaringBitmapArray codec, across array/bitset containers and
        32-bit bucket boundaries."""
        ordered = sorted(vals)
        blob = rbm_array_serialize(ordered)
        assert rbm_array_deserialize(blob) == ordered
        # Z85 inline transport (padded) decodes to the same positions
        padded = blob + b"\x00" * ((-len(blob)) % 4)
        assert rbm_array_deserialize(
            z85_decode(z85_encode(padded))[: len(blob)]
        ) == ordered

    @settings(max_examples=60, deadline=None)
    @given(_positions, st.integers(min_value=0, max_value=64))
    def test_rbm_truncation_never_misreads(vals, cut):
        """Truncating a serialized bitmap must raise ValueError (or
        reproduce the exact positions when the cut only removes
        padding) — never silently return a DIFFERENT position set,
        which would resurrect or over-delete rows."""
        ordered = sorted(vals)
        blob = rbm_array_serialize(ordered)
        trunc = blob[: max(0, len(blob) - cut)]
        try:
            got = rbm_array_deserialize(trunc)
        except (ValueError, IndexError):
            return
        assert got == ordered
