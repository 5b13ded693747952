"""Time-series visualization downsampling: M4 and LTOB.

The reference has no time-series reduction surface; these are the two
published shapes an analytics engine serves dashboards with:

- **M4** (Jugel et al., VLDB 2014, "M4: A Visualization-Oriented Time
  Series Data Aggregation"): per pixel-column (time bucket) keep the
  first, last, min and max points — the minimal set that renders the
  same line. Pure one-pass groupBy aggregation: lexicographic
  struct-min/max picks deterministic representatives, so the whole
  operator is ONE partial+final hash aggregate — the ideal 100 TB shape
  (map-side combine, no window, no join).

- **LTOB** (Steinarsson 2013, "Largest-Triangle-One-Bucket" from the
  downsampling thesis that introduced LTTB): per bucket keep the point
  with the largest deviation-from-bucket-mean (the per-bucket-
  independent member of the largest-triangle family — unlike LTTB it
  has no sequential cross-bucket dependency, so it parallelizes
  embarrassingly). Implemented as one window pass over bucketed rows.

Both emit plain rows (bucket, ts, value, which/…) so they compose with
any downstream plot/rollup, and both run verbatim as the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def epoch_bucket(df: DataFrame, ts_col: str, width_s: int):
    """floor(epoch/width)·width as a timestamp — origin-free bucketing
    that is bit-identical across engines (unlike F.window/time_bucket,
    whose default origins differ). NTZ wall clocks are measured against
    an NTZ epoch literal (same convention as streaming/events.py —
    ``unix_*`` would shift them through the session zone)."""
    from pyspark.sql.types import TimestampNTZType

    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        e0 = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        secs = F.timestamp_diff("SECOND", e0, F.col(ts_col))
        return F.timestamp_add(
            "SECOND", (F.floor(secs / width_s) * width_s).cast("long"), e0
        )
    return F.timestamp_seconds(
        F.floor(F.unix_seconds(F.col(ts_col)) / width_s) * width_s
    )


def m4_downsample(
    df: DataFrame,
    ts_col: str = "ts",
    val_col: str = "value",
    bucket: str = "1 hour",
    group_cols: tuple[str, ...] = (),
    bucket_col=None,
) -> DataFrame:
    """M4: per time bucket, the (first, last, min, max) points.

    One hash aggregate. Representatives are deterministic under ties:
    first/last tie-break on value (lexicographic struct order), min/max
    tie-break on ts. Pass ``bucket_col`` (any Column) to override the
    default ``F.window`` bucketing (e.g. :func:`epoch_bucket` for
    cross-engine-exact buckets).

    Output: group_cols + (bucket_start, first_ts, first_v, last_ts,
    last_v, min_ts, min_v, max_ts, max_v).
    """
    b = (
        bucket_col.alias("bucket_start")
        if bucket_col is not None
        else F.window(ts_col, bucket)["start"].alias("bucket_start")
    )
    ts_v = F.struct(F.col(ts_col).alias("t"), F.col(val_col).alias("v"))
    v_ts = F.struct(F.col(val_col).alias("v"), F.col(ts_col).alias("t"))
    agg = (
        df.groupBy(*group_cols, b)
        .agg(
            F.min(ts_v).alias("_first"),
            F.max(ts_v).alias("_last"),
            F.min(v_ts).alias("_min"),
            F.max(v_ts).alias("_max"),
        )
        .select(
            *group_cols,
            "bucket_start",
            F.col("_first.t").alias("first_ts"),
            F.col("_first.v").alias("first_v"),
            F.col("_last.t").alias("last_ts"),
            F.col("_last.v").alias("last_v"),
            F.col("_min.t").alias("min_ts"),
            F.col("_min.v").alias("min_v"),
            F.col("_max.t").alias("max_ts"),
            F.col("_max.v").alias("max_v"),
        )
    )
    return agg


def ltob_downsample(
    df: DataFrame,
    ts_col: str = "ts",
    val_col: str = "value",
    bucket: str = "1 hour",
    group_cols: tuple[str, ...] = (),
    bucket_col=None,
) -> DataFrame:
    """LTOB: per bucket, the point deviating most from the bucket mean.

    Two window functions over ONE shuffle (both partition by the bucket
    key): avg, then row_number ordered by |v - avg| desc with (ts, v)
    tie-break. Selecting 1 row per bucket caps the output at the bucket
    count regardless of input volume.

    Output: group_cols + (bucket_start, ts, value, bucket_avg).
    """
    b = (
        bucket_col.alias("bucket_start")
        if bucket_col is not None
        else F.window(ts_col, bucket)["start"].alias("bucket_start")
    )
    keys = [*group_cols, "bucket_start"]
    w = Window.partitionBy(*keys)
    bucketed = df.select(*group_cols, b, F.col(ts_col), F.col(val_col))
    with_avg = bucketed.withColumn("bucket_avg", F.avg(val_col).over(w))
    rn = F.row_number().over(
        w.orderBy(
            F.abs(F.col(val_col) - F.col("bucket_avg")).desc(),
            F.col(ts_col).asc(),
            F.col(val_col).asc(),
        )
    )
    return (
        with_avg.withColumn("_rn", rn)
        .where(F.col("_rn") == 1)
        .select(*keys, ts_col, val_col, "bucket_avg")
    )
