"""Physical-layout operators: Z-order (Morton) clustering for
multi-column data skipping.

The 100 TB problem: parquet min/max footer stats prune files only on
columns the data is SORTED by. A linear sort on (a) gives perfect
pruning on `a` and none on `b`; queries filtering `b` scan everything.
Interleaving the bits of several rank-scaled columns into one Morton
key and range-partitioning + sorting by it gives every interleaved
column *partial* locality — a box predicate on any subset of the
columns overlaps only the files whose z-range intersects the box
(Morton 1966; the technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`).

Everything here is pure Column expressions (JVM codegen, no UDFs): the
min/max frame is a 1-row broadcast crossJoin, the interleave is a sum
of shift-and-mask terms, and the layout is repartitionByRange + an
intra-partition sort — exactly the shuffle a cluster write would pay,
no more.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _scaled(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Rank-free linear scaling of a numeric column into [0, 2^bits-1].

    floor((x - lo) / (hi - lo) * (2^bits - 1)); NULLs and a degenerate
    (lo == hi) domain map to cell 0. The multiplier is 2^bits - 1 (not
    2^bits) so x == hi lands in the top cell without clamping — the
    identical expression is mirrored by the SQL oracle, so the IEEE
    double sequence (subtract, divide, multiply, floor) matches
    bit-for-bit across engines.
    """
    span = hi.cast("double") - lo.cast("double")
    ratio = (col.cast("double") - lo.cast("double")) / span
    cell = F.floor(ratio * F.lit(float((1 << bits) - 1)))
    return F.when(col.isNull() | (span == 0), F.lit(0)).otherwise(cell)


def zorder_key(cells: list[Column], bits: int) -> Column:
    """Morton-interleave pre-scaled integer cells: bit i of column j
    lands at position i * ncols + j. ncols * bits must fit in 63 bits."""
    ncols = len(cells)
    assert ncols * bits <= 63, "interleaved key must fit a signed long"
    terms = [
        F.shiftleft(F.shiftright(cells[j], i).bitwiseAND(F.lit(1)), i * ncols + j)
        for i in range(bits)
        for j in range(ncols)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 10, out_col: str = "zval"
) -> DataFrame:
    """Add the Morton key for ``cols`` as ``out_col``.

    The per-column domains come from one aggregate row broadcast back
    onto the frame (crossJoin of a 1-row frame — Catalyst turns it into
    a BroadcastNestedLoopJoin with a single build row): fully lazy, no
    driver collect, two scans total when the layout is written.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    stats = df.agg(*aggs)
    with_stats = df.crossJoin(F.broadcast(stats))
    cells = [
        _scaled(F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits) for c in cols
    ]
    return with_stats.withColumn(out_col, zorder_key(cells, bits)).drop(
        *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols]
    )


def zorder_layout(
    df: DataFrame, cols: list[str], bits: int = 10, num_files: int = 16
) -> DataFrame:
    """Cluster ``df`` for multi-column skipping: Morton key →
    range-partition into ``num_files`` → sort within partitions.

    Writing the result with one file per partition gives parquet
    footers whose per-file min/max on EVERY interleaved column is
    narrow — the skip-proof test in tests/test_layout.py measures
    files-touched under box predicates vs a linear sort layout.
    """
    z = zorder_value(df, cols, bits)
    return z.repartitionByRange(num_files, "zval").sortWithinPartitions("zval")


def footer_stat_min_max(col_meta) -> tuple:
    """(min, max) from one parquet column-chunk's statistics, robust
    to the types pyarrow cannot convert (round 12 — date/decimal zone
    maps previously CRASHED the commit harvest):

    - decimals stored on INT32/INT64 physicals raise
      ArrowNotImplementedError from ``.min``/``.max``, but the raw
      order-preserving unscaled ints plus the logical type's scale
      reconstruct the exact ``Decimal`` bounds (FIXED_LEN_BYTE_ARRAY
      decimals convert fine on the normal path);
    - INT96 timestamps carry no usable stats → ``(None, None)``,
      which the caller records as "no zone map" — pruning keeps the
      file, correctness never depends on a bound existing."""
    s = col_meta.statistics
    if s is None or not s.has_min_max:
        return None, None
    try:
        return s.min, s.max
    except Exception:
        lt = s.logical_type
        if lt is not None and str(lt.type).upper() == "DECIMAL":
            import decimal
            import json as _json

            scale = _json.loads(lt.to_json())["scale"]
            if isinstance(s.min_raw, int) and isinstance(s.max_raw, int):
                return (
                    decimal.Decimal(s.min_raw).scaleb(-scale),
                    decimal.Decimal(s.max_raw).scaleb(-scale),
                )
        return None, None


def footer_stat_nulls(col_meta) -> int | None:
    """Null count from one parquet column-chunk's statistics, or None
    when the writer did not record it — the caller treats unknown as
    'no null zone map' and keeps the file (round 12: Delta-style
    IS NULL / IS NOT NULL file skipping)."""
    s = col_meta.statistics
    if s is None or not s.has_null_count:
        return None
    return int(s.null_count)


def parquet_file_minmax(path: str, cols: list[str]) -> list[dict]:
    """Per-file [min, max] ranges from parquet footers (no data read) —
    exactly the stats a scan planner prunes with. Local pyarrow walk;
    on a cluster the same numbers come from the catalog/manifest."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        rng: dict = {"file": name}
        for c in cols:
            lo, hi = None, None
            # a file with NO chunk for c stores the column ABSENT
            # (reads all-NULL) — that must stay "unknown", not "0
            # nulls", or an IS NULL probe would wrongly skip it
            nulls, nulls_known, seen = 0, True, False
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema != c or col.statistics is None:
                        continue
                    seen = True
                    n = footer_stat_nulls(col)
                    if n is None:
                        nulls_known = False
                    else:
                        nulls += n
                    clo, chi = footer_stat_min_max(col)
                    if clo is None:
                        continue
                    lo = clo if lo is None else min(lo, clo)
                    hi = chi if hi is None else max(hi, chi)
            rng[c] = (lo, hi)
            if seen and nulls_known:
                rng[f"{c}__nulls"] = nulls
        out.append(rng)
    return out


def files_touched(stats: list[dict], box: dict[str, tuple]) -> int:
    """How many files a box predicate must read, by footer overlap."""
    n = 0
    for f in stats:
        hit = True
        for c, (qlo, qhi) in box.items():
            lo, hi = f[c]
            if lo is None or hi < qlo or lo > qhi:
                hit = False
                break
        n += hit
    return n
