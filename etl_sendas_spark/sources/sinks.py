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

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    sort_by: list[str] | None = None,
) -> None:
    """Parquet sink. ``partition_by`` gives hive directories (partition
    pruning); ``sort_by`` sorts WITHIN each output task before writing,
    which makes every row group's min/max statistics on those columns
    tight and non-overlapping — the layout that lets any reader (Spark,
    DuckDB, Trino) skip whole row groups on a pushed-down range filter.
    At 100 TB this is the difference between scanning a day's row
    groups and scanning the table; it costs one in-memory sort per
    task, no extra shuffle (pair with ``repartition(range)`` upstream
    when global clustering is wanted)."""
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


def write_excel(df: DataFrame, path: str) -> None:
    """Excel sink (reference S5, capital_sendas.py:600) — driver-side,
    audit-sized output only. Uses openpyxl when installed; otherwise the
    stdlib xlsx codec writes the same byte-stream format (all cells as
    inline strings — the reference reads its own exports ``dtype=str``).
    """
    pdf = df.toPandas()
    try:
        import openpyxl  # noqa: F401

        pdf.to_excel(path, index=False)  # pragma: no cover - env-dependent
    except ImportError:
        from .xlsx import write_xlsx

        write_xlsx(pdf, path)
