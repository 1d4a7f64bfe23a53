#!/usr/bin/env python
"""Density-constant scaling experiment for the grid-bucketed radius
join (operators/geo.radius_join).

Row replication (tools/scale_bench.py) is the WRONG scaling model for
spatial joins: replicating points into a fixed region grows density,
so the qualifying-pair count — the output itself — grows
quadratically, benchmarking the data generator, not the engine (the
same reason content-dedup queries are excluded there). Real geo data
grows by covering more AREA at roughly constant density, so this
harness scales the region with n: points spread over a square whose
side grows with sqrt(n), keeping pairs-per-point constant.

    python tools/geo_bench.py [n ...]          # default 200000 2000000
    python tools/geo_bench.py --wide-lat [n]   # fixed vs banded cells
                                               # on a 20..83 deg cloud

``--wide-lat`` reproduces the round-6 cell-sizing lesson as a same-
session A/B: points spread over latitudes 20..83 deg, fixed-grid cells
(sized at cos 84 deg, 10x over-wide at the data's real latitudes) vs
``radius_join_banded`` (per-band widths). Count+checksum asserted
identical between the variants.

For each n it times (warm min-of-2, noop sink / fetchall, same
discipline as scale_bench):

- Spark ``radius_join`` (grid cells + 3x3 expansion + exact haversine),
- the DuckDB mirror of the SAME grid algorithm (fair: both engines run
  the sub-quadratic plan),
- DuckDB brute-force all-pairs at the smallest n only, as the O(n²)
  reference the grid path exists to avoid.

Both sides reduce the pair stream to the same one-row aggregate
(pair count + 2-dp-bucketed distance checksum) so neither engine is
charged for materializing tens of millions of output rows the other
side never produces.

Prints one JSON line:
``{"radius_km": r, "runs": {n: {spark, duckdb_grid, ratio, pairs, ...}}}``.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_sendas_spark.operators.geo import (  # noqa: E402
    KM_PER_DEG_LAT,
    radius_join,
)
from etl_sendas_spark.session import get_spark  # noqa: E402

RADIUS_KM = 25.0
BASE_N = 200_000
BASE_SPAN_DEG = 20.0  # lon span at BASE_N; grows linearly with n
LAT_SPAN = 20.0  # lat span FIXED: region grows east-west only, so the
LAT0 = 20.0  # lon-cell width (sized at max|lat| = 40) stays tight —
# letting latitude grow toward the pole over-sizes every cell for the
# whole dataset (measured 10x candidate inflation, BASELINE.md round 6)


def timed(fn, runs: int = 2) -> float:
    best = math.inf
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def build_points(spark, n: int, path: str) -> float:
    """n deterministic points at constant density: a fixed 20-deg
    latitude band whose LONGITUDE span grows linearly with n (real geo
    corpora grow by covering more ground, not by stacking density).
    Returns the lon span. Coordinates are integer-derived doubles so
    the DuckDB side reads identical values from parquet."""
    lon_span = BASE_SPAN_DEG * (n / BASE_N)
    cells = 100_000  # lattice resolution per axis
    pts = spark.range(0, n).select(
        F.col("id").alias("pid"),
        (
            F.lit(LAT0) + (F.col("id") * 7919 % cells) * F.lit(LAT_SPAN / cells)
        ).alias("lat"),
        ((F.col("id") * 104729 % cells) * F.lit(lon_span / cells)).alias("lon"),
    )
    pts.write.mode("overwrite").parquet(path)
    return lon_span


def grid_sql(radius: float, max_abs_lat: float) -> str:
    """DuckDB mirror of radius_join's plan: bucket right side, expand
    left side to the 3x3 neighborhood, equi-join, exact haversine."""
    dlat = radius / KM_PER_DEG_LAT
    dlon = radius / (KM_PER_DEG_LAT * math.cos(math.radians(max_abs_lat)))
    return f"""
WITH l AS (SELECT pid, lat, lon FROM pts WHERE pid % 2 = 0),
r AS (SELECT pid, lat, lon,
             CAST(floor(lon / {dlon!r}) AS BIGINT) AS cx,
             CAST(floor(lat / {dlat!r}) AS BIGINT) AS cy
      FROM pts WHERE pid % 2 = 1),
le AS (SELECT l.pid, l.lat, l.lon,
              CAST(floor(l.lon / {dlon!r}) AS BIGINT) + dx.d AS cx,
              CAST(floor(l.lat / {dlat!r}) AS BIGINT) + dy.d AS cy
       FROM l, (VALUES (-1),(0),(1)) dx(d), (VALUES (-1),(0),(1)) dy(d)),
d AS (
  SELECT ROUND((2.0 * 6371.0088) * ASIN(SQRT(
        SIN(RADIANS(r.lat - le.lat) / 2.0) * SIN(RADIANS(r.lat - le.lat) / 2.0)
        + COS(RADIANS(le.lat)) * COS(RADIANS(r.lat))
          * SIN(RADIANS(r.lon - le.lon) / 2.0) * SIN(RADIANS(r.lon - le.lon) / 2.0)
      )), 6) AS dist
  FROM le JOIN r USING (cx, cy)
)
SELECT COUNT(*) AS pairs, SUM(CAST(floor(dist * 100.0) AS BIGINT)) AS checksum
FROM d WHERE dist <= {RADIUS_KM!r}
"""


def brute_sql() -> str:
    return f"""
WITH l AS (SELECT pid, lat, lon FROM pts WHERE pid % 2 = 0),
r AS (SELECT pid, lat, lon FROM pts WHERE pid % 2 = 1)
SELECT COUNT(*) AS pairs FROM l CROSS JOIN r
WHERE (2.0 * 6371.0088) * ASIN(SQRT(
        SIN(RADIANS(r.lat - l.lat) / 2.0) * SIN(RADIANS(r.lat - l.lat) / 2.0)
        + COS(RADIANS(l.lat)) * COS(RADIANS(r.lat))
          * SIN(RADIANS(r.lon - l.lon) / 2.0) * SIN(RADIANS(r.lon - l.lon) / 2.0)
      )) <= {RADIUS_KM!r}
"""


def wide_lat_points(spark, n: int, path: str) -> None:
    """The cell-sizing-lesson config: lat AND lon spread 20..83.25."""
    cells = 100_000
    pts = spark.range(0, n).select(
        F.col("id").alias("pid"),
        (F.lit(20.0) + (F.col("id") * 7919 % cells) * F.lit(63.25 / cells)).alias("lat"),
        ((F.col("id") * 104729 % cells) * F.lit(63.25 / cells)).alias("lon"),
    )
    pts.write.mode("overwrite").parquet(path)


def run_wide_lat(n: int) -> int:
    from etl_sendas_spark.operators.geo import radius_join_banded

    spark = get_spark(app_name="geo_bench_wide_lat")
    path = f"/tmp/geo_bench_widelat_{n}"
    wide_lat_points(spark, n, path)
    pts = spark.read.parquet(path)
    left = pts.filter("pid % 2 = 0")
    right = pts.filter("pid % 2 = 1")

    def agg(df):
        return df.agg(
            F.count("*").alias("pairs"),
            F.sum(F.floor(F.col("distance_km") * 100.0).cast("long")).alias(
                "checksum"
            ),
        )

    fixed = radius_join(left, right, RADIUS_KM, max_abs_lat=84.0)
    banded = radius_join_banded(left, right, RADIUS_KM)
    fr, br = agg(fixed).collect()[0], agg(banded).collect()[0]
    assert (fr["pairs"], fr["checksum"]) == (br["pairs"], br["checksum"]), (
        fr,
        br,
    )
    out = {
        "n": n,
        "pairs": fr["pairs"],
        "fixed_s": timed(
            lambda: agg(fixed).write.format("noop").mode("overwrite").save()
        ),
        "banded_s": timed(
            lambda: agg(banded).write.format("noop").mode("overwrite").save()
        ),
    }
    print(json.dumps({"mode": "wide_lat", "radius_km": RADIUS_KM, **out}))
    spark.stop()
    return 0


def main() -> int:
    args = sys.argv[1:]
    if args and args[0] == "--wide-lat":
        return run_wide_lat(int(args[1]) if args[1:] else 2_000_000)
    sizes = [int(a) for a in args] or [200_000, 2_000_000]
    spark = get_spark(app_name="geo_bench")
    out: dict = {}
    for n in sizes:
        path = f"/tmp/geo_bench_pts_{n}"
        span = build_points(spark, n, path)
        max_abs_lat = LAT0 + LAT_SPAN
        pts = spark.read.parquet(path)
        left = pts.filter("pid % 2 = 0")
        right = pts.filter("pid % 2 = 1")

        def agg_df():
            return radius_join(
                left, right, RADIUS_KM, max_abs_lat=max_abs_lat
            ).agg(
                F.count("*").alias("pairs"),
                F.sum(
                    F.floor(F.col("distance_km") * 100.0).cast("long")
                ).alias("checksum"),
            )

        def run_spark():
            agg_df().write.format("noop").mode("overwrite").save()

        srow = agg_df().collect()[0]
        pairs, checksum = srow["pairs"], srow["checksum"]
        run_spark()
        entry = {"span_deg": round(span, 2), "pairs": pairs}
        entry["spark"] = timed(run_spark)

        con = duckdb.connect()
        con.execute(f"CREATE VIEW pts AS SELECT * FROM '{path}/*.parquet'")
        gsql = grid_sql(RADIUS_KM, max_abs_lat)
        dpairs, dsum = con.execute(gsql).fetchone()
        assert (dpairs, dsum) == (pairs, checksum), (dpairs, dsum, pairs, checksum)
        entry["duckdb_grid"] = timed(lambda: con.execute(gsql).fetchall())
        entry["ratio"] = round(entry["spark"] / entry["duckdb_grid"], 2)
        if n == min(sizes):
            con.execute(brute_sql()).fetchone()  # warmup
            entry["duckdb_brute"] = timed(
                lambda: con.execute(brute_sql()).fetchall()
            )
        out[n] = entry
        print(f"# n={n}: {entry}", file=sys.stderr, flush=True)
    print(json.dumps({"radius_km": RADIUS_KM, "runs": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
