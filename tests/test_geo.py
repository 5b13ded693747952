"""Grid-binned geo radius join (ext/geo.py).

The correctness anchor is brute force: on a seeded random point set the
grid join must return EXACTLY the pairs the O(n²) cross join returns —
including pairs that straddle cell boundaries (that is what the 3×3
neighborhood explode is for)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext import geo


def _haversine_py(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dphi = (p2 - p1) / 2
    dlmb = math.radians(lon2 - lon1) / 2
    a = math.sin(dphi) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dlmb) ** 2
    return 2 * geo.EARTH_RADIUS_KM * math.asin(math.sqrt(min(a, 1.0)))


def _points(n, seed=7):
    rng = random.Random(seed)
    return [
        (i, rng.uniform(-60.0, 60.0), rng.uniform(-180.0, 180.0))
        for i in range(n)
    ]


def test_haversine_known_distance(spark):
    # Paris (48.8566, 2.3522) ↔ London (51.5074, -0.1278) ≈ 343.5 km
    df = spark.createDataFrame(
        [(48.8566, 2.3522, 51.5074, -0.1278)], "a double, b double, c double, d double"
    )
    km = df.select(
        geo.haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("km")
    ).head()["km"]
    assert abs(km - 343.5) < 1.0
    # zero distance for identical points
    z = df.select(
        geo.haversine_km(F.col("a"), F.col("b"), F.col("a"), F.col("b")).alias("km")
    ).head()["km"]
    assert z == pytest.approx(0.0, abs=1e-9)


def test_grid_join_equals_brute_force(spark):
    pts = _points(400)
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    radius = 500.0

    got = {
        (r.id_a, r.id_b)
        for r in geo.neighbor_pairs_grid(df, radius).collect()
    }
    want = {
        (a[0], b[0])
        for i, a in enumerate(pts)
        for b in pts[i + 1:]
        if _haversine_py(a[1], a[2], b[1], b[2]) <= radius
    }
    assert want, "fixture must produce at least one pair"
    assert got == want


def test_grid_join_catches_boundary_pair(spark):
    # two points 0.9·R apart, deliberately in ADJACENT grid cells:
    # straddling a cell wall is the case a naive same-cell join misses
    radius = 100.0
    dlat, _ = geo._cell_sizes(radius)
    lat_a = (math.floor(10.0 / dlat) + 1) * dlat - 0.001  # just below wall
    lat_b = lat_a + 0.9 * radius / geo.KM_PER_DEG  # crosses the wall
    df = spark.createDataFrame(
        [(1, lat_a, 5.0), (2, lat_b, 5.0)], "id long, lat double, lon double"
    )
    rows = geo.neighbor_pairs_grid(df, radius).collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(1, 2)]
    assert rows[0].dist_km <= radius


def test_no_duplicate_pairs(spark):
    pts = _points(200, seed=11)
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    out = geo.neighbor_pairs_grid(df, 800.0)
    n = out.count()
    assert out.select("id_a", "id_b").distinct().count() == n
    assert out.where(F.col("id_a") >= F.col("id_b")).count() == 0


def test_antimeridian_pair_found(spark):
    # lon -179.9 vs +179.9 at lat 10 is ~22 km apart but sits at the
    # two ends of a non-wrapping grid — the modular lon cells must
    # bring the pair together
    df = spark.createDataFrame(
        [(1, 10.0, -179.9), (2, 10.0, 179.9), (3, 10.0, 0.0)],
        "id long, lat double, lon double",
    )
    rows = geo.neighbor_pairs_grid(df, 100.0).collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(1, 2)]
    assert rows[0].dist_km < 25.0


def test_brute_force_parity_with_dateline_band(spark):
    # concentrate points near the antimeridian so straddling pairs are
    # guaranteed, then demand exact brute-force parity
    rng = random.Random(23)
    pts = [
        (
            i,
            rng.uniform(-20.0, 20.0),
            ((180.0 + rng.uniform(-5.0, 5.0) + 180.0) % 360.0) - 180.0,
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    radius = 400.0
    got = {
        (r.id_a, r.id_b)
        for r in geo.neighbor_pairs_grid(df, radius).collect()
    }
    want = {
        (a[0], b[0])
        for i, a in enumerate(pts)
        for b in pts[i + 1:]
        if _haversine_py(a[1], a[2], b[1], b[2]) <= radius
    }
    straddling = [
        (a, b)
        for (a, b) in want
        if abs(pts[a][2] - pts[b][2]) > 180.0
    ]
    assert straddling, "fixture must include antimeridian pairs"
    assert got == want
