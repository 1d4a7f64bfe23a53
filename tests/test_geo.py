"""Geo radius join (operators/geo.py): exact-equality vs a brute-force
all-pairs haversine (the recall proof for the grid expansion), the
documented miss classes (antimeridian wrap, |lat| beyond max_abs_lat),
and the plan shape that makes it 100 TB-safe (hash join on the cell
key, never a nested loop)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sendas_spark.operators.geo import (
    KM_PER_DEG_LAT,
    haversine_km,
    radius_join,
)


def _points(spark, n=400, lat_span=12.0, lat0=40.0, lon_span=12.0, lon0=0.0):
    return spark.range(0, n).select(
        F.col("id").alias("pid"),
        (F.lit(lat0) + (F.col("id") * 37 % 1000) / F.lit(1000.0 / lat_span)).alias(
            "lat"
        ),
        (F.lit(lon0) + (F.col("id") * 91 % 1000) / F.lit(1000.0 / lon_span)).alias(
            "lon"
        ),
    )


def _brute(left, right, radius):
    l2 = left.select(
        F.col("pid").alias("pid_l"),
        F.col("lat").alias("lat_l"),
        F.col("lon").alias("lon_l"),
    )
    r2 = right.select(
        F.col("pid").alias("pid_r"),
        F.col("lat").alias("lat_r"),
        F.col("lon").alias("lon_r"),
    )
    return (
        l2.crossJoin(r2)
        .withColumn(
            "distance_km",
            F.round(
                haversine_km(
                    F.col("lat_l"), F.col("lon_l"), F.col("lat_r"), F.col("lon_r")
                ),
                6,
            ),
        )
        .filter(F.col("distance_km") <= radius)
    )


def test_radius_join_equals_brute_force(spark):
    pts = _points(spark)
    left = pts.filter("pid % 2 = 0")
    right = pts.filter("pid % 2 = 1")
    out = radius_join(left, right, 120.0, max_abs_lat=52.0)
    got = {(r["pid_l"], r["pid_r"], r["distance_km"]) for r in out.collect()}
    exp = {
        (r["pid_l"], r["pid_r"], r["distance_km"])
        for r in _brute(left, right, 120.0).collect()
    }
    assert got == exp and len(exp) > 50


def test_radius_join_pairs_unique_and_symmetric_roles(spark):
    pts = _points(spark, n=200)
    out = radius_join(pts, pts, 80.0, max_abs_lat=52.0).collect()
    keys = [(r["pid_l"], r["pid_r"]) for r in out]
    # exactly-once per pair: the join matches on the right point's own
    # cell, so the 3x3 expansion cannot double-produce
    assert len(keys) == len(set(keys))
    # self-pairs at distance 0 present (caller filters if unwanted)
    assert all(
        r["distance_km"] == 0.0 for r in out if r["pid_l"] == r["pid_r"]
    )


def test_radius_join_plan_has_no_nested_loop(spark):
    pts = _points(spark)
    out = radius_join(pts.filter("pid % 2 = 0"), pts.filter("pid % 2 = 1"), 100.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_radius_join_documented_miss_classes(spark):
    # (1) antimeridian: two points 0.2 deg apart across lon=±180 are
    # ~15 km apart on the sphere but land in non-adjacent grid cells
    a = spark.createDataFrame([(0, 10.0, 179.9)], "pid long, lat double, lon double")
    b = spark.createDataFrame([(1, 10.0, -179.9)], "pid long, lat double, lon double")
    assert radius_join(a, b, 50.0).count() == 0  # documented miss
    # (2) |lat| beyond max_abs_lat: cells too narrow, pairs can vanish;
    # with the bound passed correctly the same pair IS found
    hi_a = spark.createDataFrame([(0, 70.0, 10.0)], "pid long, lat double, lon double")
    hi_b = spark.createDataFrame([(1, 70.0, 11.2)], "pid long, lat double, lon double")
    found = radius_join(hi_a, hi_b, 50.0, max_abs_lat=71.0).count()
    assert found == 1


def test_radius_join_validates_radius(spark):
    pts = _points(spark, n=4)
    with pytest.raises(ValueError, match="radius_km"):
        radius_join(pts, pts, 0.0)


def test_haversine_known_distance(spark):
    # Paris (48.8566, 2.3522) — London (51.5074, -0.1278) ≈ 343.5 km
    df = spark.createDataFrame(
        [(48.8566, 2.3522, 51.5074, -0.1278)], "a double, b double, c double, d double"
    ).select(
        haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("km")
    )
    km = df.collect()[0]["km"]
    assert abs(km - 343.5) < 1.0
    # degree-of-latitude constant consistent with the radius in use
    assert abs(KM_PER_DEG_LAT - 111.195) < 0.001


def test_radius_join_banded_equals_brute_force_wide_latitudes(spark):
    """Latitude-banded cells: exact brute-force equality on a cloud
    spanning -70..83 deg (southern hemisphere, equator crossing, and
    near-polar bands all exercised), pairs produced exactly once."""
    from etl_sendas_spark.operators.geo import radius_join_banded

    pts = spark.range(0, 3000).select(
        F.col("id").alias("pid"),
        ((F.col("id") * 37 % 1530) / 10.0 - 70.0).alias("lat"),
        ((F.col("id") * 91 % 500) / 10.0).alias("lon"),
    )
    left = pts.filter("pid % 2 = 0")
    right = pts.filter("pid % 2 = 1")
    out = radius_join_banded(left, right, 200.0)
    rows = out.collect()
    keys = [(r["pid_l"], r["pid_r"]) for r in rows]
    assert len(keys) == len(set(keys))
    got = {(r["pid_l"], r["pid_r"], r["distance_km"]) for r in rows}
    exp = {
        (r["pid_l"], r["pid_r"], r["distance_km"])
        for r in _brute(left, right, 200.0).collect()
    }
    assert got == exp and len(exp) > 1000
    # same answer as the fixed grid given a correct max_abs_lat bound
    fixed = {
        (r["pid_l"], r["pid_r"], r["distance_km"])
        for r in radius_join(left, right, 200.0, max_abs_lat=84.0).collect()
    }
    assert fixed == exp
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_radius_join_banded_antimeridian_wraparound(spark):
    """A ±180°-straddling cloud: the banded grid's modular, evenly
    tiled longitude cells must find every seam-crossing pair — exact
    brute-force equality (haversine itself is periodic in Δλ, so the
    brute truth includes wrapped pairs), produced exactly once. Also
    pins the single-pair seam case the fixed grid documents as a miss,
    and a near-polar band where < 3 lon cells exist (the modular ±1
    expansion collides and must be de-duplicated)."""
    from etl_sendas_spark.operators.geo import radius_join_banded

    # lon in [176, 184) mapped onto [-180, 180): half the cloud sits
    # just west of the seam, half just east
    pts = spark.range(0, 2000).select(
        F.col("id").alias("pid"),
        ((F.col("id") * 37 % 900) / 10.0 - 45.0).alias("lat"),
        (
            F.when(
                (F.col("id") * 91 % 80) / 10.0 + 176.0 >= 180.0,
                (F.col("id") * 91 % 80) / 10.0 - 184.0,
            ).otherwise((F.col("id") * 91 % 80) / 10.0 + 176.0)
        ).alias("lon"),
    )
    left = pts.filter("pid % 2 = 0")
    right = pts.filter("pid % 2 = 1")
    rows = radius_join_banded(left, right, 150.0).collect()
    keys = [(r["pid_l"], r["pid_r"]) for r in rows]
    assert len(keys) == len(set(keys))
    got = {(r["pid_l"], r["pid_r"], r["distance_km"]) for r in rows}
    exp = {
        (r["pid_l"], r["pid_r"], r["distance_km"])
        for r in _brute(left, right, 150.0).collect()
    }
    assert got == exp and len(exp) > 200
    # seam pairs actually present in the truth set (not a vacuous pass)
    seam = left.filter("lon > 170").crossJoin(
        right.selectExpr("pid AS rp", "lon AS rlon").filter("rlon < -170")
    )
    assert seam.count() > 0

    # the exact single pair the fixed grid misses (test above) is found
    a = spark.createDataFrame([(0, 10.0, 179.9)], "pid long, lat double, lon double")
    b = spark.createDataFrame([(1, 10.0, -179.9)], "pid long, lat double, lon double")
    assert radius_join_banded(a, b, 50.0).count() == 1

    # near-polar band: a 500 km radius at 89.x° latitude leaves < 3
    # longitude cells; exactly-once must survive the modular collision
    pa = spark.createDataFrame(
        [(0, 89.3, 10.0), (1, 89.3, -170.0)], "pid long, lat double, lon double"
    )
    polar = radius_join_banded(pa, pa, 500.0).collect()
    pkeys = [(r["pid_l"], r["pid_r"]) for r in polar]
    assert len(pkeys) == len(set(pkeys)) == 4  # both cross pairs + selves


def test_radius_join_numpy_backend_equals_column_path(spark):
    """backend='numpy' (Arrow-batched trig prune over candidates) must
    return the exact pair set AND rounded distances of the default
    Column path (HALF_UP rounding unified via similarity.round_half_up)
    for both the fixed-grid and banded joins, including seam-crossing
    pairs; the backend arg is rejected if unknown."""
    import pytest as _pytest

    from etl_sendas_spark.operators.geo import radius_join_banded

    pts = _points(spark, n=600, lat_span=20.0, lat0=30.0, lon_span=20.0, lon0=170.0)
    # wrap half the lons past the seam
    pts = pts.withColumn(
        "lon", F.when(F.col("lon") >= 180.0, F.col("lon") - 360.0).otherwise(F.col("lon"))
    )
    left = pts.filter("pid % 2 = 0")
    right = pts.filter("pid % 2 = 1")

    for join_fn, kw in (
        (radius_join, {"max_abs_lat": 51.0}),
        (radius_join_banded, {}),
    ):
        exact = {
            (r["pid_l"], r["pid_r"], r["distance_km"])
            for r in join_fn(left, right, 150.0, **kw).collect()
        }
        vec = {
            (r["pid_l"], r["pid_r"], r["distance_km"])
            for r in join_fn(left, right, 150.0, backend="numpy", **kw).collect()
        }
        assert vec == exact and len(exact) > 100, join_fn.__name__

    with _pytest.raises(ValueError, match="backend"):
        radius_join(left, right, 10.0, backend="arrow").collect()


def test_radius_join_banded_poleward_partner_boundary(spark):
    """ADVICE r7: a band's lon cell width must be sized at the farthest
    latitude a PARTNER point can have — the band's far edge plus one
    more dlat (probes match ±1 band) — not the band's own edge. The
    hardcoded pair below was found by replaying the grid math offline:
    distance 199.41 km < 200, but under the old sizing the build
    point's cell sits TWO (modular) cells from the probe's base cell in
    the build band, outside the ±1 expansion — a silent miss. Plus a
    dense near-polar cloud brute-force equality sweep."""
    from etl_sendas_spark.operators.geo import radius_join_banded

    left = spark.createDataFrame(
        [(0, 88.7021653493165, -0.006)], ["pid", "lat", "lon"]
    )
    right = spark.createDataFrame(
        [(1, 87.95365305885184, 60.0)], ["pid", "lat", "lon"]
    )
    out = radius_join_banded(left, right, 200.0).collect()
    assert len(out) == 1 and out[0]["distance_km"] <= 200.0

    # randomized near-polar cloud (83°..89.9°, full lon range): exact
    # brute-force equality, pairs exactly once
    pts = spark.range(0, 1200).select(
        F.col("id").alias("pid"),
        (F.lit(83.0) + (F.col("id") * 37 % 1000) / F.lit(1000.0 / 6.9)).alias(
            "lat"
        ),
        ((F.col("id") * 91 % 1000) * F.lit(0.36) - F.lit(180.0)).alias("lon"),
    )
    l, r = pts.filter("pid % 2 = 0"), pts.filter("pid % 2 = 1")
    got = radius_join_banded(l, r, 200.0).collect()
    keys = [(x["pid_l"], x["pid_r"]) for x in got]
    assert len(keys) == len(set(keys))
    exp = {
        (x["pid_l"], x["pid_r"], x["distance_km"])
        for x in _brute(l, r, 200.0).collect()
    }
    assert {(x["pid_l"], x["pid_r"], x["distance_km"]) for x in got} == exp
    assert len(exp) > 100
