"""Geospatial primitives: haversine distance and a grid-bucketed
radius join (point-in-radius pairing without an all-pairs scan).

The reference pipeline has no geo surface (capital_sendas.py is a
finance ETL); this module extends the engine the way the dedup/ANN
families do — a spatial *join* is the same scale problem as a
similarity join, and the same cure applies: bucket both sides into
cells sized so every qualifying pair is at most one cell apart, expand
one side to its 3×3 cell neighborhood, equi-join on the cell key, then
apply the exact predicate. The cross product never materializes; the
shuffle carries each row once (bucketed side) or nine times (expanded
side), and Catalyst runs a plain hash join on the cell key — the
GeoSpark/Apache Sedona partitioning idea reduced to pure DataFrame ops.

All distance math is plain Column trigonometry (JVM codegen,
SQL-replayable in the DuckDB oracle); no UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius
KM_PER_DEG_LAT = 111.19492664455873  # EARTH_RADIUS_KM * pi / 180


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km — the canonical haversine form
    ``2R·asin(sqrt(sin²(Δφ/2) + cosφ1·cosφ2·sin²(Δλ/2)))``, kept as a
    single expression tree so an ANSI-SQL oracle replays the identical
    IEEE sequence."""
    dphi = F.radians(lat2 - lat1) / 2.0
    dlam = F.radians(lon2 - lon1) / 2.0
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlam)
        * F.sin(dlam)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geo_cells(lat: Column, lon: Column, dlat_deg: float, dlon_deg: float):
    """Grid cell indices (cx, cy) for a point: floor(lon/dlon),
    floor(lat/dlat). With dlat/dlon sized ≥ the search radius' angular
    extent, any two points within the radius differ by at most 1 in
    each index — the invariant the 3×3 neighbor expansion relies on."""
    return (
        F.floor(lon / F.lit(dlon_deg)).cast("long"),
        F.floor(lat / F.lit(dlat_deg)).cast("long"),
    )


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 66.0,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """All (left, right) pairs within ``radius_km`` great-circle km.

    Scale shape: ``right`` is bucketed into grid cells once; ``left``
    is exploded to its 3×3 cell neighborhood (9 rows per point) and
    hash-joined on the cell key, then the exact haversine predicate
    prunes the candidates. Total work is O(|left|·9 + |right| +
    |candidates|) — never |left|·|right| — and the join is a plain
    shuffled/broadcast hash join Catalyst and AQE already know how to
    size and skew-split. Each qualifying pair is produced exactly once
    (the join matches on the RIGHT point's own cell, which is unique).

    Cell sizing: dlat = radius/KM_PER_DEG_LAT; dlon = radius /
    (KM_PER_DEG_LAT·cos(max_abs_lat)) — longitude degrees shrink with
    latitude, so the cell width is sized at the highest latitude the
    data may contain. ``max_abs_lat`` defaults to 66° (polar caps
    excluded); pass the true data bound for tighter cells. Feeding points with |lat| > max_abs_lat is a contract
    violation whose failure mode is missed pairs (cells too narrow at
    that latitude) — stated here and pinned by a test, the same
    honesty discipline as lsh_cosine_topk's documented miss class.

    Output: left columns suffixed ``_l``, right suffixed ``_r``, plus
    ``distance_km`` rounded to 6 decimals (cross-engine hash-stable).
    """
    import math

    if radius_km <= 0:
        raise ValueError(f"radius_join: radius_km must be > 0, got {radius_km}")
    dlat = radius_km / KM_PER_DEG_LAT
    dlon = radius_km / (KM_PER_DEG_LAT * math.cos(math.radians(max_abs_lat)))

    sl, sr = suffixes
    lrenamed = left.select(
        *[F.col(c).alias(c + sl) for c in left.columns]
    )
    rrenamed = right.select(
        *[F.col(c).alias(c + sr) for c in right.columns]
    )

    rcx, rcy = geo_cells(F.col(lat_col + sr), F.col(lon_col + sr), dlat, dlon)
    rbucketed = rrenamed.withColumn("__cx", rcx).withColumn("__cy", rcy)

    lcx, lcy = geo_cells(F.col(lat_col + sl), F.col(lon_col + sl), dlat, dlon)
    neighbor_cells = F.explode(
        F.array(
            *[
                F.struct(
                    (lcx + F.lit(dx)).alias("cx"), (lcy + F.lit(dy)).alias("cy")
                )
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    )
    lexpanded = lrenamed.withColumn("__n", neighbor_cells).select(
        "*", F.col("__n.cx").alias("__cx"), F.col("__n.cy").alias("__cy")
    ).drop("__n")

    dist = F.round(
        haversine_km(
            F.col(lat_col + sl),
            F.col(lon_col + sl),
            F.col(lat_col + sr),
            F.col(lon_col + sr),
        ),
        6,
    )
    # bounding-box prefilter: |Δlat| ≤ dlat and |Δlon| ≤ dlon are
    # NECESSARY for any pair within radius_km (degree sizes bounded at
    # max_abs_lat), so this rejects no qualifying pair — it just spares
    # the 5-trig haversine on candidates the cell join over-admits
    # (measured 1.6× at 1e9 candidates, BASELINE.md round 6)
    bbox = (
        F.abs(F.col(lat_col + sl) - F.col(lat_col + sr)) <= F.lit(dlat)
    ) & (F.abs(F.col(lon_col + sl) - F.col(lon_col + sr)) <= F.lit(dlon))
    return (
        lexpanded.join(rbucketed, ["__cx", "__cy"])
        .filter(bbox)
        .withColumn("distance_km", dist)
        .filter(F.col("distance_km") <= F.lit(radius_km))
        .drop("__cx", "__cy")
    )
