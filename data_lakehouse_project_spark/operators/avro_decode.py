"""Pure-Python Apache Avro CONTAINER-FILE decoder (read-only).

Iceberg metadata (manifest lists, manifests) is avro; decoding it
through py4j one field at a time costs a JVM round trip per value —
at a 10k-file manifest that is ~10^5 driver round trips, the single
biggest cost in foreign-snapshot reconstruction (probed in
``tools/probe_foreign_readers.py``).  This module decodes the
container format directly from the published Avro 1.11 specification
(avro.apache.org/docs — Object Container Files + binary encoding):

* header: magic ``Obj\\x01``, file-metadata map (``avro.schema``
  JSON, ``avro.codec``), 16-byte sync marker
* blocks: record count, byte length, payload (null or deflate codec),
  sync marker (verified)
* binary encoding: zigzag-varint int/long, little-endian IEEE
  float/double, length-prefixed bytes/string, records in field order,
  unions by branch index, arrays/maps in count-prefixed blocks
  (negative count = block-size form), enum by symbol index, fixed by
  declared size

Named-type references (``"type": "r102"``) resolve through a names
registry as the spec requires.  The write path stays on the JVM
library (``operators/iceberg_export.py``), so every fixture decoded
here in tests was produced by the REFERENCE implementation — the two
codecs cross-validate.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

_MAGIC = b"Obj\x01"
_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}


class AvroDecodeError(ValueError):
    """The file violates the Avro container/binary spec."""


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, data: bytes):
        self.buf = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = self.buf[self.pos : self.pos + n]
        if len(out) != n:
            raise AvroDecodeError(
                f"truncated avro data: wanted {n} bytes at {self.pos}"
            )
        self.pos += n
        return out

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)

    # ---- primitives (spec: binary encoding) ----

    def long(self) -> int:
        shift = 0
        acc = 0
        while True:
            if self.pos >= len(self.buf):
                raise AvroDecodeError(
                    f"truncated avro varint at {self.pos}"
                )
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 70:
                raise AvroDecodeError("varint too long")
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def bytes_(self) -> bytes:
        n = self.long()
        if n < 0:
            raise AvroDecodeError("negative bytes length")
        return self.read(n)

    def string(self) -> str:
        return self.bytes_().decode("utf-8")


def _resolve(schema, names: dict):
    """Inline a named-type reference; register new named types."""
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return schema
        if schema in names:
            return names[schema]
        raise AvroDecodeError(f"unknown avro type reference {schema!r}")
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed"):
            name = schema.get("name")
            ns = schema.get("namespace")
            full = f"{ns}.{name}" if ns and "." not in name else name
            names[full] = schema
            if name != full:
                names[name] = schema
    return schema


def _decode(r: _Reader, schema, names: dict):
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union: branch index then value
        idx = r.long()
        if not 0 <= idx < len(schema):
            raise AvroDecodeError(f"union branch {idx} out of range")
        return _decode(r, schema[idx], names)
    if isinstance(schema, str):
        t = schema
    else:
        t = schema["type"]
        if isinstance(t, (list, dict)):  # {"type": <complex>} wrapper
            return _decode(r, t, names)
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) != b"\x00"
    if t in ("int", "long"):
        return r.long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.bytes_()
    if t == "string":
        return r.string()
    if t == "fixed":
        return r.read(int(schema["size"]))
    if t == "enum":
        return schema["symbols"][r.long()]
    if t == "record":
        return {
            f["name"]: _decode(r, f["type"], names)
            for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:  # block-size form
                n = -n
                r.long()  # byte size (skippable hint)
            for _ in range(n):
                out.append(_decode(r, schema["items"], names))
    if t == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.long()
            for _ in range(n):
                k = r.string()
                out[k] = _decode(r, schema["values"], names)
    raise AvroDecodeError(f"unsupported avro type {t!r}")


def read_avro_file(path: str) -> tuple[list[dict], dict]:
    """Decode an avro container file -> (records, file_metadata) with
    non-``avro.``-prefixed metadata values utf-8-decoded (the same
    contract the JVM-backed reader exposes)."""
    with open(path, "rb") as fh:
        data = fh.read()
    r = _Reader(data)
    if r.read(4) != _MAGIC:
        raise AvroDecodeError(f"{path} is not an avro container file")
    raw_meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            k = r.string()
            raw_meta[k] = r.bytes_()
    sync = r.read(16)
    if "avro.schema" not in raw_meta:
        raise AvroDecodeError("container header carries no avro.schema")
    schema = json.loads(raw_meta["avro.schema"])
    codec = raw_meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise AvroDecodeError(f"unsupported avro codec {codec!r}")
    names: dict = {}
    _resolve(schema, names)
    records: list[dict] = []
    while not r.at_end():
        count = r.long()
        size = r.long()
        payload = r.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)  # raw deflate
        br = _Reader(payload)
        for _ in range(count):
            records.append(_decode(br, schema, names))
        if not br.at_end():
            raise AvroDecodeError("trailing bytes in avro block")
        if r.read(16) != sync:
            raise AvroDecodeError("sync-marker mismatch (torn block)")
    meta = {
        k: v.decode()
        for k, v in raw_meta.items()
        if not k.startswith("avro.")
    }
    return records, meta
