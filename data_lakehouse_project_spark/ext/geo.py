"""Geospatial neighbor search: haversine distance + grid-binned
radius self-join.

The reference engine has no spatial surface (SURVEY §2 carries none);
this is north-star capability for an analytics engine — "find all pairs
of points within R km" over billions of rows. The naive plan is an
all-pairs cross join (O(n²) — dead at 100 TB); the scale shape is the
classic fixed-grid bin join:

1. assign every point to one grid cell sized so that any two points
   within R km are guaranteed to fall in the same or an adjacent cell
   (cell height = R in latitude degrees; cell width = R in longitude
   degrees at the WORST-CASE supported latitude, so the guarantee holds
   everywhere in band);
2. explode ONE side to its 3×3 cell neighborhood (9 rows — a constant
   fan-out, not data-dependent);
3. equi-join on cell id (one hash shuffle, candidate count bounded by
   Σ|cell|·|neighborhood|, never n²);
4. verify candidates with the exact haversine predicate JVM-side.

Each unordered pair is emitted exactly once (``id_a < id_b`` and the
un-exploded side contributes its single home cell, so a candidate pair
meets in exactly one cell).

All expressions are built-in column functions (radians/sin/cos/asin/
sqrt) — whole-stage-codegen, zero Python on rows. The same formula runs
verbatim in the DuckDB oracle, which uses the O(n²) join at sf0.01 as
the ground truth.

Cited capability precedent: grid/bin spatial joins in Sedona-style
Spark extensions; implemented here from scratch on plain DataFrame ops.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

EARTH_RADIUS_KM = 6371.0
#: km per degree of latitude (and of longitude at the equator)
KM_PER_DEG = 111.32
#: widest latitude band the fixed grid guarantees correctness for;
#: cos(60°) = 0.5 so a longitude degree is at least ~55.7 km in band
MAX_ABS_LAT = 60.0


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km between two (degree) coordinates.

    Pure built-in math expressions — codegen'd, portable (the DuckDB
    oracle runs the identical formula text).
    """
    dphi = F.radians(lat2 - lat1) / 2.0
    dlmb = F.radians(lon2 - lon1) / 2.0
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlmb)
        * F.sin(dlmb)
    )
    # clamp for float noise at antipodes before asin
    return 2.0 * EARTH_RADIUS_KM * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The identical formula as ANSI SQL text for oracle parity."""
    return (
        f"2.0 * {EARTH_RADIUS_KM} * ASIN(SQRT(LEAST(1.0, "
        f"POW(SIN(RADIANS(({lat2}) - ({lat1})) / 2.0), 2) "
        f"+ COS(RADIANS({lat1})) * COS(RADIANS({lat2})) "
        f"* POW(SIN(RADIANS(({lon2}) - ({lon1})) / 2.0), 2))))"
    )


def _cell_sizes(radius_km: float) -> tuple[float, float]:
    """(dlat, dlon) cell size in degrees such that any two points within
    ``radius_km`` and |lat| <= MAX_ABS_LAT are in the same or adjacent
    cells on both axes."""
    dlat = radius_km / KM_PER_DEG
    dlon = radius_km / (KM_PER_DEG * math.cos(math.radians(MAX_ABS_LAT)))
    return dlat, dlon


def neighbor_pairs_grid(
    points: DataFrame,
    radius_km: float,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """All unordered point pairs within ``radius_km`` of each other.

    Grid-binned self-join: one shuffle on the cell key; the left side is
    exploded to its 3×3 neighborhood (constant ×9), the right side keeps
    its single home cell, so every qualifying pair is produced exactly
    once and the candidate set is Σ over cells of |cell|·|3×3 ring| —
    never all-pairs. Candidates are verified with the exact haversine
    predicate. Requires |lat| <= MAX_ABS_LAT (the fixed grid's
    correctness band); violating rows raise at plan level via an
    ANSI-safe filter assert is NOT done — callers clamp upstream.

    Output: (id_a, id_b, dist_km) with id_a < id_b.
    """
    dlat, dlon = _cell_sizes(radius_km)
    # longitude cells WRAP at the ±180 antimeridian: a pair straddling
    # it (lon -179.9 vs +179.9 is ~22 km at the equator) must meet in
    # adjacent cells, so the x index is modular over the full circle.
    # The cell count is FLOOR(360/dlon) with uniform width 360/n ≥
    # dlon — a ceil'd grid leaves a narrower seam cell, and a pair
    # within r can then straddle it two index-steps apart, silently
    # missed (the adjacency guarantee needs every cell at least
    # r-degrees wide).
    n_lon_cells = int(360.0 // dlon)
    if n_lon_cells < 3:
        raise ValueError(
            f"radius {radius_km} km needs < 3 longitude cells — grid "
            "binning degenerates; use a direct pairwise join instead"
        )
    dlon_eff = 360.0 / n_lon_cells
    pts = points.select(
        F.col(id_col).alias("_gid"),
        F.col(lat_col).cast("double").alias("_lat"),
        F.col(lon_col).cast("double").alias("_lon"),
        F.floor(F.col(lat_col) / dlat).cast("long").alias("_cy"),
        F.pmod(
            F.floor((F.col(lon_col) + 180.0) / dlon_eff),
            F.lit(n_lon_cells),
        ).cast("long").alias("_cx"),
    )

    # left: exploded to the 9-cell neighborhood (x wraps modulo the
    # lon cell count so the ring crosses the antimeridian)
    offsets = F.array(
        *[
            F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    left = (
        pts.withColumn("_o", F.explode(offsets))
        .select(
            F.col("_gid").alias("id_a"),
            F.col("_lat").alias("lat_a"),
            F.col("_lon").alias("lon_a"),
            (F.col("_cy") + F.col("_o.dy")).alias("_jy"),
            F.pmod(
                F.col("_cx") + F.col("_o.dx"), F.lit(n_lon_cells)
            ).alias("_jx"),
        )
    )
    right = pts.select(
        F.col("_gid").alias("id_b"),
        F.col("_lat").alias("lat_b"),
        F.col("_lon").alias("lon_b"),
        F.col("_cy").alias("_jy"),
        F.col("_cx").alias("_jx"),
    )
    dist = haversine_km(
        F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
    )
    return (
        left.join(right, ["_jy", "_jx"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("dist_km", dist)
        .where(F.col("dist_km") <= radius_km)
        .select("id_a", "id_b", "dist_km")
    )
