"""Sinks S5–S6 of the reference, Spark-first.

Reference: DuckDB ``COPY ... TO 'capital_sendas.xlsx' (FORMAT GDAL)``
and ``COPY ... TO 'comprobar.csv'`` (capital_sendas.py:600,603).

Engine-native sinks are Parquet (analytics) and CSV (interchange);
Excel is an audit-report convenience for driver-sized results only —
written via openpyxl when installed, else via the dependency-free
stdlib codec in :mod:`.xlsx`.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def zorder_value(bucket_cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each bucket column into one
    Morton (Z-curve) key. Rows close in EVERY dimension get close keys,
    so range-partitioning + sorting by the key clusters the file layout
    in all dimensions at once — multi-column data skipping, where a
    single-column sort only prunes on its leading column."""
    z = F.lit(0).cast("long")
    n = len(bucket_cols)
    for b in range(bits):
        for j, c in enumerate(bucket_cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + j))
    return z


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    sort_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
    zorder_files: int | None = None,
) -> None:
    """Parquet sink. ``partition_by`` gives hive directories (partition
    pruning); ``sort_by`` sorts WITHIN each output task before writing,
    which makes every row group's min/max statistics on those columns
    tight and non-overlapping — the layout that lets any reader (Spark,
    DuckDB, Trino) skip whole row groups on a pushed-down range filter.
    At 100 TB this is the difference between scanning a day's row
    groups and scanning the table; it costs one in-memory sort per
    task, no extra shuffle (pair with ``repartition(range)`` upstream
    when global clustering is wanted).

    ``zorder_by`` clusters the layout on SEVERAL columns at once
    (mutually exclusive with ``sort_by``): each column is min/max
    bucketed to 16 bits (numeric/timestamp columns; one tiny driver-side
    min/max agg), the buckets are Morton-interleaved, and the data is
    range-partitioned + sorted by the Z key. A query filtering any
    subset of the Z columns then skips the files/row groups whose
    multi-dim tile misses the predicate box — the Delta/Iceberg OPTIMIZE
    ZORDER layout, as one exchange + local sort. Uniform bucketing is
    the right default for time/id dimensions; for heavily skewed
    columns, pre-bucket equi-depth (approxQuantile) and Z-order the
    bucket ids instead."""
    if sort_by and zorder_by:
        raise ValueError("sort_by and zorder_by are mutually exclusive")
    drop_col = None
    if zorder_by:
        numeric = [
            F.col(c).cast("double").alias(f"__zn_{i}")
            for i, c in enumerate(zorder_by)
        ]
        stats = df.select(
            *[
                s
                for i, c in enumerate(numeric)
                for s in (F.min(c).alias(f"lo{i}"), F.max(c).alias(f"hi{i}"))
            ]
        ).collect()[0]
        buckets = []
        nb = 1 << 16
        for i in range(len(zorder_by)):
            lo, hi = stats[f"lo{i}"], stats[f"hi{i}"]
            span = (hi - lo) or 1.0
            raw = F.floor(
                (F.col(zorder_by[i]).cast("double") - F.lit(lo))
                / F.lit(span)
                * F.lit(nb)
            )
            buckets.append(F.least(F.greatest(raw, F.lit(0)), F.lit(nb - 1)))
        drop_col = "__zorder"
        df = df.withColumn(drop_col, zorder_value(buckets))
        n_files = zorder_files or df.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "32"
        )
        df = df.repartitionByRange(int(n_files), drop_col).sortWithinPartitions(
            drop_col
        )
        df = df.drop(drop_col)
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False) -> None:
    """CSV sink (reference S6). ``single_file`` coalesces to one part —
    only for audit-report-sized outputs; never at scale."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", "true").csv(path)


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_mb: int = 128,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target) evenly-sized files. Returns the target
    file count.

    The chronic 100 TB ops problem: streaming sinks and fine-grained
    partition appends accumulate thousands of KB-sized files, and scan
    planning + NameNode/object-store metadata dominate query time. One
    ``repartition(n)`` round-robin exchange is the standard fix; sizing
    n from the actual on-disk bytes (not row counts) keeps output files
    near the target regardless of schema width. Run per partition
    directory when compacting a partitioned layout, so only the
    appended partitions rewrite.
    """
    total = 0
    for root, _dirs, files in os.walk(src_dir):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if not f.startswith(("_", "."))
        )
    n = max(1, -(-total // (target_file_mb * 1024 * 1024)))
    spark.read.parquet(src_dir).repartition(n).write.mode(
        "overwrite"
    ).parquet(dst_dir)
    return n


def write_excel(df: DataFrame, path: str, max_rows: int = 1_048_576) -> None:
    """Excel sink (reference S5, capital_sendas.py:600) — driver-side,
    audit-sized output only. Uses openpyxl when installed; otherwise the
    stdlib xlsx codec writes the same byte-stream format (all cells as
    inline strings — the reference reads its own exports ``dtype=str``).

    The ``toPandas()`` is the point of this sink (one driver-side .xlsx
    file), but nothing else bounds it, so a caller pointing it at a fact
    table would OOM the driver. ``max_rows`` (default = Excel's own
    per-sheet row limit) is enforced with the same fused limit(cap+1)
    trick as ``embedding_near_dup_pairs``'s exact-path guard: one job,
    driver memory bounded by the cap even when the input is over it,
    exact below it.
    """
    pdf = df.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise ValueError(
            f"write_excel materializes the frame on the driver and the "
            f"input exceeds max_rows={max_rows} (Excel's sheet limit is "
            f"1,048,576). Use write_parquet/write_csv for fact-table "
            f"outputs, or pass an explicit max_rows if you really mean it."
        )
    try:
        import openpyxl  # noqa: F401

        pdf.to_excel(path, index=False)  # pragma: no cover - env-dependent
    except ImportError:
        from .xlsx import write_xlsx

        write_xlsx(pdf, path)
