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


def _exact_prune(
    cand: DataFrame,
    radius_km: float,
    lat_col: str,
    lon_col: str,
    suffixes: tuple[str, str],
    backend: str,
) -> DataFrame:
    """Exact haversine prune of cell-join candidates, shared by
    :func:`radius_join` and :func:`radius_join_banded`.

    ``backend="exact"`` (default, the oracle path): one Column
    expression tree — SQL-replayable, stays inside whole-stage codegen.
    ``backend="numpy"``: the same trig vectorized over Arrow batches
    (``mapInPandas``), rounding unified through
    :func:`..similarity.round_half_up` — the similarity-module backend
    pattern applied to the r6 finding that the radius join is
    output-bound at ≈250 ns/pair of JVM row-pipeline constant. Not the
    oracle default: numpy's libm need not be bit-identical to the
    JVM's, so a pair landing EXACTLY on the radius or a rounding
    boundary could flip (property-pinned equal on grid-derived data).

    MEASURED NEGATIVE RESULT (round 7, BASELINE.md): at n=2M /
    ~40M output pairs the numpy path is 3.7× SLOWER than the Column
    path (41.9 s vs 11.3 s) — precisely BECAUSE the workload is
    output-bound: the similarity backends win by collapsing many rows
    into k results inside the Arrow stage, while here survivors ≈
    candidates, so the Arrow round-trip serializes the whole pair
    stream both ways to save five trig calls per row. The Column path
    stays the default AND the recommendation; the 2M-scale mirror
    residual is confirmed JVM row-pipeline floor, not filter math
    (same verdict as the r6 chord prefilter, now from the opposite
    direction).
    """
    sl, sr = suffixes
    if backend == "exact":
        dist = F.round(
            haversine_km(
                F.col(lat_col + sl),
                F.col(lon_col + sl),
                F.col(lat_col + sr),
                F.col(lon_col + sr),
            ),
            6,
        )
        return cand.withColumn("distance_km", dist).filter(
            F.col("distance_km") <= F.lit(radius_km)
        )
    if backend != "numpy":
        raise ValueError(f"radius join backend must be exact|numpy, got {backend!r}")

    from pyspark.sql.types import DoubleType, StructField, StructType

    from .similarity import round_half_up

    out_schema = StructType(
        cand.schema.fields + [StructField("distance_km", DoubleType())]
    )
    latl, lonl = lat_col + sl, lon_col + sl
    latr, lonr = lat_col + sr, lon_col + sr
    r2 = 2.0 * EARTH_RADIUS_KM

    def prune(batches):
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            lat1 = np.radians(pdf[latl].to_numpy(dtype=np.float64))
            lat2 = np.radians(pdf[latr].to_numpy(dtype=np.float64))
            dphi = (
                np.radians(
                    pdf[latr].to_numpy(dtype=np.float64)
                    - pdf[latl].to_numpy(dtype=np.float64)
                )
                / 2.0
            )
            dlam = (
                np.radians(
                    pdf[lonr].to_numpy(dtype=np.float64)
                    - pdf[lonl].to_numpy(dtype=np.float64)
                )
                / 2.0
            )
            a = np.sin(dphi) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlam) ** 2
            d = round_half_up(r2 * np.arcsin(np.sqrt(a)), 6)
            keep = d <= radius_km
            if not keep.any():
                continue
            out = pdf.loc[keep].copy()
            out["distance_km"] = d[keep]
            yield out

    return cand.mapInPandas(prune, out_schema)


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 66.0,
    suffixes: tuple[str, str] = ("_l", "_r"),
    backend: str = "exact",
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

    # bounding-box prefilter: |Δlat| ≤ dlat and |Δlon| ≤ dlon are
    # NECESSARY for any pair within radius_km (degree sizes bounded at
    # max_abs_lat), so this rejects no qualifying pair — it just spares
    # the 5-trig haversine on candidates the cell join over-admits
    # (measured 1.6× at 1e9 candidates, BASELINE.md round 6)
    bbox = (
        F.abs(F.col(lat_col + sl) - F.col(lat_col + sr)) <= F.lit(dlat)
    ) & (F.abs(F.col(lon_col + sl) - F.col(lon_col + sr)) <= F.lit(dlon))
    cand = (
        lexpanded.join(rbucketed, ["__cx", "__cy"])
        .filter(bbox)
        .drop("__cx", "__cy")
    )
    return _exact_prune(cand, radius_km, lat_col, lon_col, suffixes, backend)


# ---------------------------------------------------------------------------
# latitude-banded radius join — tight cells at every latitude
# ---------------------------------------------------------------------------


def _band_lon_grid(
    band: Column, dlat_deg: float, radius_km: float
) -> tuple[Column, Column]:
    """(cell width, cell count) of a latitude band's longitude grid.

    The raw width is the radius' lon-extent at the farthest latitude a
    PARTNER point matched against this band can sit: the band's far
    edge plus one more dlat, because the probe expansion admits
    neighbors from ±1 band. (Sizing at the band's own edge alone is
    subtly lossy: for a pair with latitudes φ1 in the band and φ2 up
    to dlat poleward, the qualifying Δlon bound is
    R/(K·sqrt(cosφ1·cosφ2)), which can exceed the band-edge extent —
    and even tiling can leave near-zero slack, so such a pair could
    straddle two cell boundaries at high latitude and be missed.)
    The EFFECTIVE width then snaps
    UP so an integer number of cells tiles the full 360°:
    ``ncells = max(1, floor(360/raw))``, ``width = 360/ncells``. Even
    tiling is what makes the antimeridian seam safe — cells indexed
    ``pmod(floor((lon+180)/width), ncells)`` wrap, and any |Δlon| ≤ raw
    ≤ width spans at most one (modular) cell boundary. With uneven
    tiling the leftover sliver cell at the seam can be narrower than
    the radius, putting a qualifying pair two cells apart. A polar band
    degenerates to ncells = 1 (one wrap-around cell)."""
    edge1 = band.cast("double") * F.lit(dlat_deg)
    edge2 = (band.cast("double") + F.lit(1.0)) * F.lit(dlat_deg)
    max_abs = F.greatest(F.abs(edge1), F.abs(edge2))
    # + dlat_deg: partner points come from ±1 band; past the pole
    # cos goes ≤ 0 and the clamp degenerates the band to ncells = 1
    cosm = F.greatest(
        F.cos(F.radians(max_abs + F.lit(dlat_deg))), F.lit(1e-9)
    )
    raw = F.lit(radius_km) / (F.lit(KM_PER_DEG_LAT) * cosm)
    ncells = F.greatest(F.lit(1).cast("long"), F.floor(F.lit(360.0) / raw))
    return F.lit(360.0) / ncells.cast("double"), ncells


def _lon_cell(lon: Column, width: Column, ncells: Column) -> Column:
    """Modular longitude cell index: wraps ±180 onto the same seam."""
    return F.pmod(F.floor((lon + F.lit(180.0)) / width).cast("long"), ncells)


def radius_join_banded(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    suffixes: tuple[str, str] = ("_l", "_r"),
    backend: str = "exact",
) -> DataFrame:
    """:func:`radius_join` with LATITUDE-BANDED cells — the fix for the
    fixed grid's measured failure mode (BASELINE.md round 6: one global
    ``max_abs_lat`` over-sizes every lon cell for low-latitude data —
    10× candidate inflation on a 20°–83° dataset).

    Each latitude band (height dlat = radius' lat-extent) gets its OWN
    longitude cell width, sized at the band edge farther from the
    equator — the H3/S2 idea reduced to two pure Columns. Build side:
    key = (band, floor(lon / dlon(band))). Probe side explodes to 9
    keys — for each of the 3 reachable bands b' (|Δlat| ≤ dlat ⇒
    neighbor's band ∈ {b−1,b,b+1}), the 3 lon cells around
    floor(lon / dlon(b')), computed with THAT band's width, so probe
    and build keys always agree. A neighbor within the radius satisfies
    |Δlon| ≤ dlon(b') (its own band bounds its lon-degree size), hence
    sits within ±1 of the probe's base cell in its band: no false
    negatives, no ``max_abs_lat`` parameter to get wrong.

    Longitude cells tile the globe evenly and are indexed MODULO the
    band's cell count (:func:`_band_lon_grid`), so pairs straddling the
    ±180° antimeridian land in adjacent (wrapped) cells — the seam is
    no longer a miss class (haversine itself is already periodic in
    Δλ). Probe keys are de-duplicated per row (``array_distinct``): in
    a near-polar band with < 3 lon cells the modular ±1 expansion
    collides with itself, and exactly-once output survives only if the
    collided keys explode once. Output schema identical to
    :func:`radius_join`.
    """
    if radius_km <= 0:
        raise ValueError(
            f"radius_join_banded: radius_km must be > 0, got {radius_km}"
        )
    dlat = radius_km / KM_PER_DEG_LAT

    sl, sr = suffixes
    lrenamed = left.select(*[F.col(c).alias(c + sl) for c in left.columns])
    rrenamed = right.select(*[F.col(c).alias(c + sr) for c in right.columns])

    rband = F.floor(F.col(lat_col + sr) / F.lit(dlat)).cast("long")
    rwidth, rncells = _band_lon_grid(rband, dlat, radius_km)
    rbucketed = rrenamed.withColumn("__band", rband).withColumn(
        "__cell", _lon_cell(F.col(lon_col + sr), rwidth, rncells)
    )

    lband = F.floor(F.col(lat_col + sl) / F.lit(dlat)).cast("long")
    probes = []
    for db in (-1, 0, 1):
        band_p = lband + F.lit(db)
        width_p, ncells_p = _band_lon_grid(band_p, dlat, radius_km)
        base = F.floor(
            (F.col(lon_col + sl) + F.lit(180.0)) / width_p
        ).cast("long")
        for dc in (-1, 0, 1):
            probes.append(
                F.struct(
                    band_p.alias("band"),
                    F.pmod(base + F.lit(dc), ncells_p).alias("cell"),
                )
            )
    lexpanded = (
        lrenamed.withColumn(
            "__n", F.explode(F.array_distinct(F.array(*probes)))
        )
        .select(
            "*",
            F.col("__n.band").alias("__band"),
            F.col("__n.cell").alias("__cell"),
        )
        .drop("__n")
    )

    # |Δlat| bound is latitude-independent, so it is always a valid
    # (necessary) prefilter; the lon bound varies per pair, so banded
    # mode leaves lon pruning to the cells themselves
    cand = (
        lexpanded.join(rbucketed, ["__band", "__cell"])
        .filter(
            F.abs(F.col(lat_col + sl) - F.col(lat_col + sr)) <= F.lit(dlat)
        )
        .drop("__band", "__cell")
    )
    return _exact_prune(cand, radius_km, lat_col, lon_col, suffixes, backend)
