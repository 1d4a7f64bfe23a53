"""Native Spark DataSource for the txlog table format (PySpark 4's
Python DataSource API): after ``register_txlog_source(spark)``,

    spark.read.format("txlog").load(path)                  # batch
    spark.readStream.format("txlog").load(path)            # streaming

— the Delta streaming-source analogue for the from-scratch format.
Offsets ARE commit versions, so exactly-once delivery rides the
engine's own checkpointing: a micro-batch covers the commits
``(start, end]``, one input partition per data file those commits
added, and each executor task reads its file as Arrow record batches
(pyarrow → Spark's Arrow ingest path, never row-at-a-time Python).

Semantics match Delta's default streaming source: APPEND-ONLY. The
initial batch is the table's version-0 snapshot (or
``startingVersion``); any commit carrying a remove-set (overwrite,
compact, DML, vacuum rewrites) fails the stream loudly — delivering a
compaction's re-added files would duplicate every row silently, and a
consumer that needs update/delete semantics should read the change
feed (:meth:`..sources.txlog.TxLogTable.change_feed` or the
``txlog_cdf_consumer_step`` pipeline) instead.

Scale notes: the driver touches only commit metadata (versions,
added-file lists); data I/O is one pyarrow scan per file on the
executors, so a micro-batch's parallelism equals the files the commits
added. Schema comes from the NEWEST live file's parquet footer (widest
under add-only evolution); older files' missing columns backfill NULL
per batch. v1 bound: partitioned tables (hive path columns) are
rejected at plan time — their partition values live outside the files.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from .txlog import TxLogTable


def _arrow_to_ddl(t) -> str:
    """Arrow type → Spark SQL DDL type (the subset the format writes)."""
    import pyarrow as pa

    if pa.types.is_int64(t):
        return "bigint"
    if pa.types.is_int32(t):
        return "int"
    if pa.types.is_int16(t):
        return "smallint"
    if pa.types.is_int8(t):
        return "tinyint"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{_arrow_to_ddl(t.value_type)}>"
    raise ValueError(f"txlog source: unsupported arrow type {t}")


def _table_schema_ddl(root: str) -> tuple[str, list[str]]:
    """(DDL schema string, column names) from the newest live file's
    footer — widest schema under the format's add-only evolution."""
    import pyarrow.parquet as pq

    t = TxLogTable(root)
    if t._partition_cols():
        raise ValueError(
            "txlog source: partitioned tables are not supported yet "
            "(partition values live in paths, not files); read via "
            "TxLogTable.read instead"
        )
    files = t.live_files()
    best, best_n = None, -1
    for f in (files[0], files[-1]):
        sch = pq.ParquetFile(f).schema_arrow
        if len(sch) > best_n:
            best, best_n = sch, len(sch)
    ddl = ", ".join(f"{f.name} {_arrow_to_ddl(f.type)}" for f in best)
    return ddl, [f.name for f in best]


class _FilePartition(InputPartition):
    def __init__(self, path: str, columns: list[str]):
        self.path = path
        self.columns = columns


def _read_file_batches(path: str, columns: list[str]):
    """One file → padded/ordered Arrow record batches (executor-side)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    have = set(pf.schema_arrow.names)
    for batch in pf.iter_batches():
        tbl = pa.Table.from_batches([batch])
        arrays, fields = [], []
        for name in columns:
            if name in have:
                col = tbl.column(name)
                arrays.append(col)
                fields.append(tbl.schema.field(name))
            else:
                arrays.append(pa.nulls(len(tbl)))
                fields.append(pa.field(name, pa.null()))
        out = pa.Table.from_arrays(arrays, schema=pa.schema(fields))
        yield from out.to_batches()


class _TxLogBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options["path"]
        _ddl, self.columns = _table_schema_ddl(self.root)

    def partitions(self):
        return [
            _FilePartition(f, self.columns)
            for f in TxLogTable(self.root).live_files()
        ]

    def read(self, partition):
        yield from _read_file_batches(partition.path, partition.columns)


class _TxLogStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.root = options["path"]
        self.starting = int(options.get("startingversion", 0))
        _ddl, self.columns = _table_schema_ddl(self.root)

    def initialOffset(self) -> dict:
        # offsets are "last delivered version"; the first batch then
        # covers (starting-1, head] = the snapshot at startingVersion
        # plus everything after it
        return {"version": self.starting - 1}

    def latestOffset(self) -> dict:
        return {"version": TxLogTable(self.root).latest_version()}

    def partitions(self, start: dict, end: dict):
        t = TxLogTable(self.root)
        parts: list[_FilePartition] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            meta = t.commit_meta(v)
            if meta.get("remove"):
                raise ValueError(
                    f"txlog streaming source is append-only: version {v} "
                    f"(op={meta.get('op')}) removed files — consume the "
                    f"change feed for update/delete semantics"
                )
            parts.extend(
                _FilePartition(os.path.join(self.root, rel), self.columns)
                for rel in meta.get("add", [])
            )
        return parts

    def read(self, partition):
        yield from _read_file_batches(partition.path, partition.columns)

    def commit(self, end: dict) -> None:
        pass  # progress lives in the engine's checkpoint

    def stop(self) -> None:
        pass


class TxLogDataSource(DataSource):
    """``format("txlog")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "txlog"

    def schema(self) -> str:
        ddl, _cols = _table_schema_ddl(self.options["path"])
        return ddl

    def reader(self, schema):
        return _TxLogBatchReader(self.options)

    def streamReader(self, schema):
        return _TxLogStreamReader(self.options)


def register_txlog_source(spark) -> None:
    """Register ``format("txlog")`` on this session (Python data
    sources are per-session; idempotent to call again)."""
    spark.dataSource.register(TxLogDataSource)
