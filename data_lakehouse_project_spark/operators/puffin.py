"""Puffin file format (iceberg.apache.org/puffin-spec) — the v3
container for deletion-vector blobs and sketches.

Layout (per the public spec):

* File: ``Magic Blob₁ … Blobₙ Footer``
* Footer: ``Magic FooterPayload FooterPayloadSize(4B LE) Flags(4B)
  Magic`` — FooterPayload is UTF-8 JSON (optionally lz4-compressed;
  bit 0 of the first flag byte — compressed footers are REFUSED, not
  mis-read).
* Magic: ``0x50 0x46 0x41 0x31`` ("PFA1").
* FooterPayload JSON: ``{"blobs": [{"type", "fields", "snapshot-id",
  "sequence-number", "offset", "length", "properties"}...],
  "properties": {...}}``.

Deletion-vector blob (``deletion-vector-v1``, Iceberg v3 spec
"Deletion Vectors"): 4-byte big-endian combined length of magic +
vector, the 4-byte magic ``D1 D3 39 64``, the vector in the 64-bit
"portable" Roaring serialization, and a 4-byte big-endian CRC-32 of
magic + vector.  That magic+vector byte string is EXACTLY the Delta
``RoaringBitmapArray`` portable format (the v3 spec adopted Delta's
DV layout; ``D1 D3 39 64`` little-endian == Delta's magic
``1681511377``), so the codec in ``operators/dv.py`` is reused
verbatim — one serialization, two table formats.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

from .dv import rbm_array_deserialize, rbm_array_serialize

MAGIC = b"PFA1"
DV_BLOB_TYPE = "deletion-vector-v1"


class CorruptPuffinFile(ValueError):
    """The file violates Puffin spec invariants."""


def read_puffin_footer(path: str) -> dict:
    """Parse the footer payload JSON ({"blobs": [...], ...})."""
    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        if fh.read(4) != MAGIC:
            raise CorruptPuffinFile(f"{path}: missing head magic")
        fh.seek(size - 8)
        tail = fh.read(8)
        if tail[4:] != MAGIC:
            raise CorruptPuffinFile(f"{path}: missing foot magic")
        flags = tail[:4]
        if flags[0] & 1:
            raise CorruptPuffinFile(
                f"{path}: lz4-compressed footer payload is not "
                "supported (refusing, not mis-reading)"
            )
        fh.seek(size - 12)
        (payload_size,) = struct.unpack("<i", fh.read(4))
        fh.seek(size - 12 - payload_size)
        payload = fh.read(payload_size)
    try:
        return json.loads(payload.decode("utf-8"))
    except ValueError as exc:
        raise CorruptPuffinFile(
            f"{path}: footer payload is not JSON: {exc}"
        ) from None


def decode_dv_blob(path: str, offset: int, length: int) -> list[int]:
    """Deleted row positions from one ``deletion-vector-v1`` blob."""
    with open(path, "rb") as fh:
        fh.seek(offset)
        data = fh.read(length)
    if len(data) < 12:
        raise CorruptPuffinFile(f"{path}: DV blob shorter than header")
    (combined_len,) = struct.unpack(">i", data[:4])
    body = data[4 : 4 + combined_len]  # magic + vector
    if body[:4] != b"\xd1\xd3\x39\x64":
        raise CorruptPuffinFile(
            f"{path}: DV blob magic {body[:4]!r} != D1 D3 39 64"
        )
    (crc,) = struct.unpack(
        ">I", data[4 + combined_len : 8 + combined_len]
    )
    if zlib.crc32(body) & 0xFFFFFFFF != crc:
        raise CorruptPuffinFile(f"{path}: DV blob CRC mismatch")
    # magic+vector IS the Delta RoaringBitmapArray portable layout
    return rbm_array_deserialize(body)


def encode_dv_blob(positions: list[int]) -> bytes:
    body = rbm_array_serialize(sorted(set(int(p) for p in positions)))
    return (
        struct.pack(">i", len(body))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


def write_puffin_dv_file(
    path: str,
    dvs: list[tuple[str, list[int]]],
    snapshot_id: int,
    sequence_number: int,
) -> list[dict]:
    """Write one Puffin file holding a ``deletion-vector-v1`` blob per
    ``(referenced data file, positions)``; returns per-blob dicts
    ``{"referenced_data_file", "content_offset",
    "content_size_in_bytes", "cardinality"}`` for manifest entries."""
    blobs_meta = []
    out_blobs = []
    offset = 4  # after head magic
    for ref, positions in dvs:
        blob = encode_dv_blob(positions)
        out_blobs.append(blob)
        blobs_meta.append(
            {
                "type": DV_BLOB_TYPE,
                "fields": [],
                "snapshot-id": int(snapshot_id),
                "sequence-number": int(sequence_number),
                "offset": offset,
                "length": len(blob),
                "properties": {
                    "referenced-data-file": ref,
                    "cardinality": str(len(set(positions))),
                },
            }
        )
        offset += len(blob)
    payload = json.dumps({"blobs": blobs_meta, "properties": {}}).encode()
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        for blob in out_blobs:
            fh.write(blob)
        fh.write(MAGIC)
        fh.write(payload)
        fh.write(struct.pack("<i", len(payload)))
        fh.write(b"\x00\x00\x00\x00")  # flags: uncompressed
        fh.write(MAGIC)
    return [
        {
            "referenced_data_file": m["properties"][
                "referenced-data-file"
            ],
            "content_offset": m["offset"],
            "content_size_in_bytes": m["length"],
            "cardinality": int(m["properties"]["cardinality"]),
        }
        for m in blobs_meta
    ]


def dv_positions_of_entry(table_path: str, df_: dict) -> list[int]:
    """Deleted positions for one manifest DV entry (v3: content==1,
    file_format PUFFIN, referenced_data_file + content_offset/size)."""
    p = df_["file_path"]
    for pref in ("file://", "file:"):
        if p.startswith(pref):
            p = p[len(pref):]
    if not os.path.isabs(p):
        p = os.path.join(table_path, p)
    off = df_.get("content_offset")
    size = df_.get("content_size_in_bytes")
    if off is None or size is None:
        # locate via the footer (spec allows readers to use either)
        footer = read_puffin_footer(p)
        want = df_.get("referenced_data_file")
        for b in footer.get("blobs", []):
            if b.get("type") != DV_BLOB_TYPE:
                continue
            if b.get("properties", {}).get(
                "referenced-data-file"
            ) == want:
                return decode_dv_blob(p, b["offset"], b["length"])
        raise CorruptPuffinFile(
            f"{p}: no {DV_BLOB_TYPE} blob references {want}"
        )
    return decode_dv_blob(p, int(off), int(size))
