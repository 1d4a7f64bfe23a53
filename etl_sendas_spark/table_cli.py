"""Table-maintenance CLI for the transaction-log format — the
operational companion to :mod:`.sources.txlog` (what ``delta-rs``'s
CLI or ``OPTIMIZE``/``VACUUM``/``DESCRIBE HISTORY`` SQL are to Delta):

    python -m etl_sendas_spark.table_cli history  PATH [--limit N]
    python -m etl_sendas_spark.table_cli describe PATH
    python -m etl_sendas_spark.table_cli read     PATH --out DIR
        [--version N] [--format parquet|csv]
    python -m etl_sendas_spark.table_cli compact  PATH
        [--target-files N] [--zorder col1,col2]
    python -m etl_sendas_spark.table_cli vacuum   PATH
        [--retain N] [--min-age-s S]
    python -m etl_sendas_spark.table_cli change-feed PATH --keys k1,k2
        --from-version N [--to-version M] --out DIR
    python -m etl_sendas_spark.table_cli restore  PATH
        (--version N | --as-of TS)
    python -m etl_sendas_spark.table_cli delete   PATH --where SQL
    python -m etl_sendas_spark.table_cli update   PATH --where SQL
        --set "col=expr[,col=expr...]"

Every subcommand is a thin wrapper over the TxLogTable methods, so the
conflict rules, age guards, and replay semantics are exactly the
library's; the CLI adds only argument parsing and human-readable
output. ``history``/``describe`` never start Spark (pure log reads);
the data-touching commands share one session.
"""

from __future__ import annotations

import argparse
import json
import sys


def _table(path: str):
    from .sources.txlog import TxLogTable

    t = TxLogTable(path)
    if not t.versions():
        print(f"no txlog table at {path}", file=sys.stderr)
        raise SystemExit(2)
    return t


def cmd_history(args) -> int:
    t = _table(args.path)
    versions = t.versions()[-args.limit :] if args.limit else t.versions()
    from datetime import datetime

    for v in versions:
        meta = t.commit_meta(v)
        extra = {
            k: meta[k]
            for k in meta
            if k
            not in (
                "version", "op", "add", "remove", "stats", "stat_cols",
                "parts", "partition_by", "ts",
            )
        }
        ts = meta.get("ts")
        when = (
            datetime.fromtimestamp(ts).isoformat(timespec="seconds")
            if ts
            else "-"
        )
        print(
            f"v{v:06d}  {when}  op={meta.get('op', '?'):9s} "
            f"+{len(meta.get('add', [])):4d} files "
            f"-{len(meta.get('remove', [])):4d} files"
            + (f"  {json.dumps(extra)}" if extra else "")
        )
    return 0


def cmd_describe(args) -> int:
    t = _table(args.path)
    head = t.latest_version()
    live = t.live_files(head)
    print(f"path:      {args.path}")
    print(f"head:      v{head} ({len(t.versions())} resolvable versions)")
    print(f"live:      {len(live)} data files")
    print(f"rows:      {t.row_count(head)} (metadata-only)")
    print(f"stat_cols: {t._stat_cols() or '(none)'}")
    trs = t._partition_transforms()
    if trs:
        shown = [
            (
                f"{x['fn']}({x['n']}, {x['src']})"
                if x["n"] is not None
                else f"{x['fn']}({x['src']})"
            )
            for x in trs
        ]
        plain = [
            c
            for c in t._partition_cols()
            if c not in {x["name"] for x in trs}
        ]
        print(f"partition: {plain + shown} (transforms hidden from schema)")
    else:
        print(f"partition: {t._partition_cols() or '(none)'}")
    m = t._column_mapping()
    if m:
        renames = {
            log: phys for log, phys in m["map"].items() if log != phys
        }
        if renames:
            print(f"mapping:   {renames} (logical -> storage name)")
        if m.get("retired"):
            print(f"retired:   {m['retired']} (dropped storage columns)")
    if t._widened():
        print("widened:   yes (mixed-width files upcast on read)")
    cons = t._constraints()
    if cons:
        for n, e in sorted(cons.items()):
            print(f"check:     {n}: {e}")
    if t.versions() and t.versions()[0] == 0:
        c0 = t.commit_meta(0)
        if c0.get("op") == "clone":
            print(
                f"clone of:  {c0.get('source')}"
                f"@v{c0.get('source_version')}"
            )
    from .session import get_spark

    spark = get_spark(app_name="txlog_describe")
    for f in t.read(spark).schema.fields:
        print(f"  {f.name}: {f.dataType.simpleString()}")
    return 0


def cmd_read(args) -> int:
    from .session import get_spark

    t = _table(args.path)
    spark = get_spark(app_name="txlog_read")
    df = t.read(spark, version=args.version, as_of=args.as_of)
    if args.format == "csv":
        df.coalesce(1).write.mode("overwrite").option("header", True).csv(args.out)
    else:
        df.write.mode("overwrite").parquet(args.out)
    print(f"v{args.version if args.version is not None else t.latest_version()}"
          f" -> {args.out} ({df.count()} rows)")
    return 0


def cmd_compact(args) -> int:
    from .session import get_spark

    t = _table(args.path)
    spark = get_spark(app_name="txlog_compact")
    zorder = args.zorder.split(",") if args.zorder else None
    v = t.compact(spark, target_files=args.target_files, zorder_by=zorder)
    print(f"compacted -> v{v}" + (f" (zorder by {zorder})" if zorder else ""))
    return 0


def cmd_bin_pack(args) -> int:
    from .session import get_spark

    t = _table(args.path)
    spark = get_spark(app_name="txlog_bin_pack")
    head = t.latest_version()
    v = t.bin_pack(spark, target_mb=args.target_mb)
    print(
        "nothing to pack" if v == head else f"bin-packed -> v{v}"
    )
    return 0


def cmd_vacuum(args) -> int:
    t = _table(args.path)
    out = t.vacuum(retain_versions=args.retain, min_age_s=args.min_age_s)
    print(
        f"cutoff v{out['cutoff']}: deleted {out['deleted_files']} data files, "
        f"{out['deleted_commits']} commits"
    )
    return 0


def cmd_change_feed(args) -> int:
    from .session import get_spark

    t = _table(args.path)
    spark = get_spark(app_name="txlog_change_feed")
    feed = t.change_feed(
        spark,
        keys=args.keys.split(","),
        from_version=args.from_version,
        to_version=args.to_version,
    )
    feed.write.mode("overwrite").parquet(args.out)
    print(f"change feed v{args.from_version}.. -> {args.out} ({feed.count()} rows)")
    return 0


def cmd_restore(args) -> int:
    t = _table(args.path)
    v = t.restore(version=args.version, as_of=args.as_of)
    print(f"restored to v{t.commit_meta(v)['restored_version']} -> v{v}")
    return 0


def cmd_delete(args) -> int:
    from .session import get_spark

    t = _table(args.path)
    spark = get_spark(app_name="txlog_delete")
    head = t.latest_version()
    v = t.delete_where(spark, args.where, mode=args.mode)
    print("no rows matched" if v == head else f"deleted -> v{v}")
    return 0


def _split_assignments(specs: list[str]) -> dict[str, str]:
    """col=expr assignments from repeated --set flags, each flag
    holding one or more comma-separated assignments. Commas inside
    parentheses/brackets or string literals do NOT split (ADVICE r8:
    a naive split mangled ``price=greatest(a,b)``), and a doubled
    quote inside a literal is the SQL escape, not a closer."""
    sets: dict[str, str] = {}
    for spec in specs:
        depth, quote, start = 0, None, 0
        pieces: list[str] = []
        i = 0
        while i < len(spec):
            ch = spec[i]
            if quote:
                if ch == quote:
                    if i + 1 < len(spec) and spec[i + 1] == quote:
                        i += 1
                    else:
                        quote = None
            elif ch in ("'", '"'):
                quote = ch
            elif ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            elif ch == "," and depth == 0:
                pieces.append(spec[start:i])
                start = i + 1
            i += 1
        pieces.append(spec[start:])
        for kv in pieces:
            if "=" not in kv:
                raise SystemExit(
                    f"--set expects col=expr assignments, got {kv!r}"
                )
            k, v = kv.split("=", 1)
            sets[k.strip()] = v
    return sets


def cmd_merge(args) -> int:
    """MERGE a parquet source into the table (upsert; optionally the
    full Delta grammar: conditional delete arm, snapshot-sync)."""
    from .session import get_spark

    t = _table(args.path)
    spark = get_spark(app_name="txlog_merge")
    src = spark.read.parquet(args.source)
    v = t.merge_into(
        spark,
        src,
        [k.strip() for k in args.on.split(",")],
        delete_when=args.delete_when,
        when_not_matched_by_source=(
            "delete" if args.sync_deletes else None
        ),
    )
    print(f"merged {args.source} -> v{v}")
    return 0


def cmd_update(args) -> int:
    from .session import get_spark

    t = _table(args.path)
    spark = get_spark(app_name="txlog_update")
    sets = _split_assignments(args.set)
    head = t.latest_version()
    v = t.update_where(spark, sets, args.where, mode=args.mode)
    print("no rows matched" if v == head else f"updated -> v{v}")
    return 0


def cmd_replace_where(args) -> int:
    from .session import get_spark

    t = _table(args.path)
    spark = get_spark(app_name="txlog_replace_where")
    df = spark.read.parquet(args.src)
    v = t.replace_where(spark, df, args.where)
    print(f"replaced scope {args.where!r} -> v{v}")
    return 0


def cmd_rename_column(args) -> int:
    t = _table(args.path)
    v = t.rename_column(args.old, args.new)
    print(f"renamed {args.old} -> {args.new} at v{v} (metadata-only)")
    return 0


def cmd_widen_column(args) -> int:
    t = _table(args.path)
    v = t.widen_column(args.name, args.new_type)
    print(f"widened {args.name} -> {args.new_type} at v{v} (metadata-only)")
    return 0


def cmd_drop_column(args) -> int:
    t = _table(args.path)
    v = t.drop_column(args.name)
    print(f"dropped {args.name} at v{v} (metadata-only)")
    return 0


def cmd_add_constraint(args) -> int:
    from .session import get_spark

    t = _table(args.path)
    spark = get_spark(app_name="txlog_constraint")
    v = t.add_constraint(spark, args.name, args.expr)
    print(f"constraint {args.name} added at v{v} (writes now validate)")
    return 0


def cmd_drop_constraint(args) -> int:
    t = _table(args.path)
    v = t.drop_constraint(args.name)
    print(f"constraint {args.name} dropped at v{v}")
    return 0


def cmd_clone(args) -> int:
    t = _table(args.path)
    t.clone(args.dest, version=args.version)
    v = t.latest_version() if args.version is None else args.version
    print(
        f"shallow clone of {args.path}@v{v} -> {args.dest} "
        "(zero data copied; clone evolves independently — run "
        "'compact' on it to materialize)"
    )
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="etl_sendas_spark.table_cli", description=__doc__
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("history", help="one line per resolvable commit")
    p.add_argument("path")
    p.add_argument("--limit", type=int, default=0)
    p.set_defaults(fn=cmd_history)

    p = sub.add_parser("describe", help="head, live files, stat cols, schema")
    p.add_argument("path")
    p.set_defaults(fn=cmd_describe)

    p = sub.add_parser(
        "read",
        help="export a snapshot (time travel via --version or --as-of)",
    )
    p.add_argument("path")
    p.add_argument("--out", required=True)
    p.add_argument("--version", type=int, default=None)
    p.add_argument(
        "--as-of", default=None,
        help="ISO-8601 timestamp: read the snapshot as of this instant",
    )
    p.add_argument("--format", choices=("parquet", "csv"), default="parquet")
    p.set_defaults(fn=cmd_read)

    p = sub.add_parser("compact", help="rewrite the live set (OPTIMIZE [ZORDER BY])")
    p.add_argument("path")
    p.add_argument("--target-files", type=int, default=1)
    p.add_argument("--zorder", default=None, help="comma-separated columns")
    p.set_defaults(fn=cmd_compact)

    p = sub.add_parser(
        "bin-pack",
        help="OPTIMIZE-style incremental compaction of small files only",
    )
    p.add_argument("path")
    p.add_argument("--target-mb", type=int, default=128)
    p.set_defaults(fn=cmd_bin_pack)

    p = sub.add_parser("vacuum", help="GC dead files + truncate the log")
    p.add_argument("path")
    p.add_argument("--retain", type=int, default=2)
    p.add_argument("--min-age-s", type=float, default=3600.0)
    p.set_defaults(fn=cmd_vacuum)

    p = sub.add_parser("change-feed", help="per-commit I/U/D rows to parquet")
    p.add_argument("path")
    p.add_argument("--keys", required=True, help="comma-separated key columns")
    p.add_argument("--from-version", type=int, required=True)
    p.add_argument("--to-version", type=int, default=None)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_change_feed)

    p = sub.add_parser("restore", help="head content = a past snapshot (metadata-only)")
    p.add_argument("path")
    p.add_argument("--version", type=int, default=None)
    p.add_argument("--as-of", default=None)
    p.set_defaults(fn=cmd_restore)

    p = sub.add_parser("delete", help="DELETE WHERE (copy-on-write or dv)")
    p.add_argument("path")
    p.add_argument("--where", required=True)
    p.add_argument(
        "--mode", choices=["cow", "dv"], default="cow",
        help="dv = merge-on-read deletion vector (no file rewritten)",
    )
    p.set_defaults(fn=cmd_delete)

    p = sub.add_parser(
        "replace-where",
        help="atomic scoped overwrite: swap WHERE-matching rows for a "
        "parquet source (the backfill primitive)",
    )
    p.add_argument("path")
    p.add_argument("--src", required=True, help="parquet path of new rows")
    p.add_argument("--where", required=True)
    p.set_defaults(fn=cmd_replace_where)

    p = sub.add_parser(
        "merge", help="MERGE a parquet source (upsert / snapshot sync)"
    )
    p.add_argument("path")
    p.add_argument("source", help="parquet path with the source rows")
    p.add_argument(
        "--on", required=True, help="comma-separated merge key columns"
    )
    p.add_argument(
        "--delete-when", default=None,
        help="WHEN MATCHED AND <pred> THEN DELETE (over source rows)",
    )
    p.add_argument(
        "--sync-deletes", action="store_true",
        help="WHEN NOT MATCHED BY SOURCE THEN DELETE (snapshot sync)",
    )
    p.set_defaults(fn=cmd_merge)

    p = sub.add_parser(
        "rename-column",
        help="ALTER TABLE RENAME COLUMN (metadata-only, zero rewrite)",
    )
    p.add_argument("path")
    p.add_argument("old")
    p.add_argument("new")
    p.set_defaults(fn=cmd_rename_column)

    p = sub.add_parser(
        "widen-column",
        help="ALTER TABLE widen a column type (metadata-only, zero rewrite)",
    )
    p.add_argument("path")
    p.add_argument("name")
    p.add_argument("new_type")
    p.set_defaults(fn=cmd_widen_column)

    p = sub.add_parser(
        "drop-column",
        help="ALTER TABLE DROP COLUMN (metadata-only, zero rewrite)",
    )
    p.add_argument("path")
    p.add_argument("name")
    p.set_defaults(fn=cmd_drop_column)

    p = sub.add_parser(
        "add-constraint",
        help="ALTER TABLE ADD CONSTRAINT (CHECK; validates existing "
        "rows, then every write)",
    )
    p.add_argument("path")
    p.add_argument("name")
    p.add_argument("expr")
    p.set_defaults(fn=cmd_add_constraint)

    p = sub.add_parser(
        "drop-constraint", help="ALTER TABLE DROP CONSTRAINT"
    )
    p.add_argument("path")
    p.add_argument("name")
    p.set_defaults(fn=cmd_drop_constraint)

    p = sub.add_parser(
        "clone",
        help="SHALLOW CLONE: zero-copy branch referencing the "
        "source's files (metadata-only)",
    )
    p.add_argument("path")
    p.add_argument("dest")
    p.add_argument("--version", type=int, default=None)
    p.set_defaults(fn=cmd_clone)

    p = sub.add_parser("update", help="UPDATE SET ... WHERE (cow or dv)")
    p.add_argument("path")
    p.add_argument("--where", required=True)
    p.add_argument(
        "--mode", choices=["cow", "dv"], default="cow",
        help="dv = vector pre-images, append only the post-update rows",
    )
    p.add_argument(
        "--set",
        required=True,
        action="append",
        help="col=expr[,col=expr...]; repeatable — commas inside "
        "parens/quotes do not split",
    )
    p.set_defaults(fn=cmd_update)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
