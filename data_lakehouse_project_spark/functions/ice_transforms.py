"""Iceberg partition transforms — spec-exact, on both sides of the
engine:

* driver-side Python twins (predicate literals, manifest pruning),
* JVM column expressions (write staging at data scale).

The bucket transform is the spec's ``murmur3_x86_32`` (seed 0) over
the value's single-value binary serialization — int/long/date/
time/timestamp hash their 8-byte little-endian long form, strings
hash UTF-8 bytes — then ``(hash & Integer.MAX_VALUE) % N``.  The
column path is an Arrow-batched pandas UDF (numpy-vectorized over the
8-byte family; a pure-column murmur3 was measured to explode the
expression tree — every mix stage duplicates operand subtrees) and is
used ONLY in write staging; pruning literals always use the Python
twin.

Temporal transforms (year/month/day/hour) and truncate are
order-preserving integer arithmetic on both sides.

Parity with the spec is pinned in tests/test_ice_transforms.py
against the reference vectors of Iceberg's Appendix B (murmur3 of int
34 = 2017239379, of string "iceberg" = 1210000089, of date 2017-11-16
= -653330422, of timestamp 2017-11-16T22:31:08 = -2047944441).
"""

from __future__ import annotations

import datetime

import pandas as pd  # module-level: pandas_udf resolves the string
# annotations (PEP 563 above) in THIS module's namespace

_EPOCH = datetime.date(1970, 1, 1)
_EPOCH_TS = datetime.datetime(1970, 1, 1)

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 returning a SIGNED 32-bit int (Iceberg/Guava
    convention)."""
    h = seed & _M32
    n = len(data)
    i = 0
    while i + 4 <= n:
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
        i += 4
    tail = data[i:]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def _long_for_bucket(v, iceberg_type: str) -> int | None:
    """The long the spec serializes before hashing, for the 8-byte-LE
    family (int/long/date/timestamp)."""
    if v is None:
        return None
    t = iceberg_type
    if t in ("int", "long"):
        return int(v)
    if t == "date":
        if isinstance(v, datetime.date) and not isinstance(
            v, datetime.datetime
        ):
            return (v - _EPOCH).days
        if isinstance(v, str):
            return (datetime.date.fromisoformat(v) - _EPOCH).days
        return int(v)
    if t in ("timestamp", "timestamptz"):
        if isinstance(v, datetime.datetime):
            base = v
            if base.tzinfo is not None:
                base = base.astimezone(datetime.timezone.utc).replace(
                    tzinfo=None
                )
            return int((base - _EPOCH_TS).total_seconds() * 1_000_000)
        if isinstance(v, str):
            return int(
                (
                    datetime.datetime.fromisoformat(v) - _EPOCH_TS
                ).total_seconds()
                * 1_000_000
            )
        return int(v)
    raise ValueError(f"bucket transform does not hash {t!r} as a long")


def bucket_value(v, iceberg_type: str, n: int) -> int | None:
    """Spec ``bucket[N]`` of one Python value (None stays None)."""
    if v is None:
        return None
    if iceberg_type in ("string",):
        h = murmur3_32(str(v).encode("utf-8"))
    elif iceberg_type in ("binary", "fixed"):
        h = murmur3_32(bytes(v))
    else:
        lv = _long_for_bucket(v, iceberg_type)
        h = murmur3_32(
            (lv & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
        )
    return (h & 0x7FFFFFFF) % int(n)


def truncate_value(v, iceberg_type: str, w: int):
    """Spec ``truncate[W]``: floor-to-width for int/long, prefix for
    string (codepoints)."""
    if v is None:
        return None
    if iceberg_type in ("int", "long"):
        iv = int(v)
        return iv - (((iv % w) + w) % w)
    if iceberg_type == "string":
        return str(v)[:w]
    raise ValueError(f"truncate transform unsupported for {iceberg_type!r}")


def temporal_value(transform: str, v, iceberg_type: str) -> int | None:
    """Spec year/month/day/hour of one Python date/datetime/str value
    — ints (day counts days from epoch, matching the avro date
    encoding)."""
    if v is None:
        return None
    if isinstance(v, str):
        v = (
            datetime.datetime.fromisoformat(v)
            if iceberg_type.startswith("timestamp") or len(v) > 10
            else datetime.date.fromisoformat(v)
        )
    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    if transform == "year":
        return v.year - 1970
    if transform == "month":
        return (v.year - 1970) * 12 + (v.month - 1)
    d = v.date() if isinstance(v, datetime.datetime) else v
    days = (d - _EPOCH).days
    if transform == "day":
        return days
    if transform == "hour":
        hh = v.hour if isinstance(v, datetime.datetime) else 0
        return days * 24 + hh
    raise ValueError(f"unknown temporal transform {transform!r}")


def transform_literal(transform: str, v, iceberg_type: str):
    """Driver-side transform of a predicate literal / staged value."""
    if transform == "identity":
        return v
    if transform.startswith("bucket["):
        return bucket_value(v, iceberg_type, int(transform[7:-1]))
    if transform.startswith("truncate["):
        return truncate_value(v, iceberg_type, int(transform[9:-1]))
    if transform in ("year", "month", "day", "hour"):
        return temporal_value(transform, v, iceberg_type)
    if transform == "void":
        return None
    raise ValueError(f"unknown partition transform {transform!r}")


# --------------------------------------------------------------------------
# Column expressions (write staging)
# --------------------------------------------------------------------------


def _murmur3_u64_numpy(v):
    """Vectorized murmur3_x86_32 over the 8-byte little-endian form of
    a uint64 numpy array (the spec's int/long/date/timestamp bucket
    hash).  numpy uint32 arithmetic wraps mod 2**32 natively, so the
    whole batch hashes in a handful of SIMD passes — no per-row
    Python.  Returns uint32."""
    import numpy as np

    def rotl(x, r):
        return (x << np.uint32(r)) | (x >> np.uint32(32 - r))

    c1 = np.uint32(_C1)
    c2 = np.uint32(_C2)
    h = np.zeros(v.shape, dtype=np.uint32)
    for blk in (
        (v & np.uint64(0xFFFFFFFF)).astype(np.uint32),  # low LE block
        (v >> np.uint64(32)).astype(np.uint32),  # high LE block
    ):
        k = blk * c1
        k = rotl(k, 15)
        k = k * c2
        h ^= k
        h = rotl(h, 13)
        h = h * np.uint32(5) + np.uint32(0xE6546B64)
    h ^= np.uint32(8)  # length
    h ^= h >> np.uint32(16)
    h = h * np.uint32(0x85EBCA6B)
    h ^= h >> np.uint32(13)
    h = h * np.uint32(0xC2B2AE35)
    h ^= h >> np.uint32(16)
    return h


def bucket_col(col, iceberg_type: str, n: int):
    """Spec ``bucket[N]`` as a Column, via an Arrow-batched pandas UDF
    (numpy-vectorized murmur3 for the 8-byte-LE family, a tight
    per-string loop for strings).  A pure-column murmur3 is possible
    but its expression tree explodes (every mix stage duplicates its
    operand subtrees — ~10**4 nodes, codegen blowup), so the batched
    UDF is the deliberate choice; this runs ONLY in the write-staging
    path — read-side pruning literals use :func:`bucket_value`."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    nn = int(n)

    if iceberg_type in ("int", "long", "date", "timestamp",
                        "timestamptz"):

        @pandas_udf("int")
        def _bucket_long(s: pd.Series) -> pd.Series:
            import numpy as np

            # input is never null (JVM-side coalesce below keeps the
            # Arrow batch int64 — a single null would coerce pandas to
            # float64 and silently round longs past 2**53)
            v = s.to_numpy(dtype=np.int64).view(np.uint64)
            h = _murmur3_u64_numpy(v)
            return pd.Series(
                ((h & np.uint32(0x7FFFFFFF)) % np.uint32(nn)).astype(
                    np.int32
                )
            )

        if iceberg_type == "date":
            lv = F.datediff(col, F.lit("1970-01-01")).cast("long")
        elif iceberg_type.startswith("timestamp"):
            # epoch micros, UTC (timestamptz stores UTC instants)
            lv = F.unix_micros(col.cast("timestamp"))
        else:
            lv = col.cast("long")
        return F.when(
            col.isNull(), F.lit(None).cast("int")
        ).otherwise(_bucket_long(F.coalesce(lv, F.lit(0))))

    if iceberg_type == "string":

        @pandas_udf("int")
        def _bucket_str(s: pd.Series) -> pd.Series:
            return s.map(
                lambda x: None
                if x is None
                else (murmur3_32(str(x).encode("utf-8")) & 0x7FFFFFFF)
                % nn
            ).astype("Int32")

        return _bucket_str(col)

    raise ValueError(f"bucket transform unsupported for {iceberg_type!r}")


def transform_col(transform: str, col, iceberg_type: str):
    """Spec transform of a source Column -> the partition-value
    Column (result types per the spec table: temporal/bucket -> int,
    truncate/identity -> source type)."""
    from pyspark.sql import functions as F

    if transform == "identity":
        return col
    if transform.startswith("bucket["):
        return bucket_col(col, iceberg_type, int(transform[7:-1]))
    if transform.startswith("truncate["):
        w = int(transform[9:-1])
        if iceberg_type in ("int", "long"):
            t = "int" if iceberg_type == "int" else "long"
            return (col - F.pmod(col, F.lit(w))).cast(t)
        if iceberg_type == "string":
            return F.substring(col, 1, w)
        raise ValueError(
            f"truncate transform unsupported for {iceberg_type!r}"
        )
    if transform == "year":
        return (F.year(col) - F.lit(1970)).cast("int")
    if transform == "month":
        return (
            (F.year(col) - F.lit(1970)) * F.lit(12)
            + F.month(col)
            - F.lit(1)
        ).cast("int")
    if transform == "day":
        return F.datediff(
            col.cast("date"), F.lit("1970-01-01")
        ).cast("int")
    if transform == "hour":
        return (
            F.datediff(col.cast("date"), F.lit("1970-01-01"))
            * F.lit(24)
            + F.hour(col)
        ).cast("int")
    if transform == "void":
        return F.lit(None).cast("int")
    raise ValueError(f"unknown partition transform {transform!r}")
