"""CLI entry point: the reference's month-end run as one command.

Mirrors the reference's script entry path (capital_sendas.py:80-90
filename-based month selection, :96-125 multi-file ingest with
cross-file dedup, :600-603 exports) on the Spark engine:

    python -m etl_sendas_spark \
        --produccion '/data/produccion_*.parquet' \
        --codigos /dims/codigos.parquet \
        --tipologia /dims/tipologia.parquet \
        --anexos /dims/anexos.parquet \
        --bases /dims/bases.parquet \
        --out-dir /out [--mes 9] [--format csv]

Inputs may be Parquet, CSV (header), or Excel (where openpyxl is
available); the month defaults to the max AnoMes parsed from the
produccion file names, exactly like the reference. Outputs are the
``capital_sendas`` result and the ``comprobar`` unmatched-patients side
table, written under --out-dir in the chosen format.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

from pyspark.sql import DataFrame, SparkSession

from .plans.capital_sendas import run_pipeline
from .session import get_spark
from .sources.readers import (
    latest_partition_files,
    load_fact_files,
    read_csv,
    read_excel_dim,
)
from .sources.sinks import write_csv, write_excel, write_parquet


def _read_any(spark: SparkSession, path: str) -> DataFrame:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".parquet":
        return spark.read.parquet(path)
    if ext == ".csv":
        return read_csv(spark, path)
    if ext in (".xlsx", ".xls"):
        return read_excel_dim(spark, path)
    raise ValueError(f"unsupported input format: {path}")


def _write_any(df: DataFrame, out_dir: str, name: str, fmt: str) -> str:
    path = os.path.join(out_dir, name)
    if fmt == "parquet":
        write_parquet(df, path)
    elif fmt == "csv":
        write_csv(df, path, single_file=True)
    elif fmt == "excel":
        write_excel(df, path + ".xlsx")
    else:
        raise ValueError(f"unsupported output format: {fmt}")
    return path


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="etl_sendas_spark", description=__doc__)
    ap.add_argument("--produccion", required=True,
                    help="glob of produccion_* fact files (parquet/csv/xlsx)")
    ap.add_argument("--codigos", required=True)
    ap.add_argument("--tipologia", required=True)
    ap.add_argument("--anexos", required=True)
    ap.add_argument("--bases", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--mes", type=int, default=None,
                    help="billing month 1-12; default: derived from the max "
                         "AnoMes in the produccion file names (reference :82-90)")
    ap.add_argument("--format", choices=("csv", "parquet", "excel"), default="csv")
    ap.add_argument("--parse-js-dates", action="store_true",
                    help="parse FECHA_FACT/FEC_SERVICIO from JS-style text "
                         "with the +5h fix (reference :137-139); default "
                         "expects typed date columns")
    args = ap.parse_args(argv)

    files = sorted(glob.glob(args.produccion))
    if not files:
        print(f"no files match {args.produccion}", file=sys.stderr)
        return 2
    picked, mes_from_name = latest_partition_files(files)
    if not picked:  # names don't follow produccion_AAAAMMDD_*: take all
        picked = files
    mes = args.mes if args.mes is not None else mes_from_name
    if not 1 <= mes <= 12:
        print(f"cannot derive --mes from file names ({mes}); pass --mes",
              file=sys.stderr)
        return 2

    spark = get_spark(app_name="capital_sendas")
    frames = [_read_any(spark, f) for f in picked]
    fact = load_fact_files(spark, frames)
    out, check = run_pipeline(
        fact,
        _read_any(spark, args.codigos),
        _read_any(spark, args.tipologia),
        _read_any(spark, args.anexos),
        _read_any(spark, args.bases),
        mes=mes,
        parse_dates=args.parse_js_dates,
    )
    os.makedirs(args.out_dir, exist_ok=True)
    p1 = _write_any(out, args.out_dir, "capital_sendas", args.format)
    p2 = _write_any(check, args.out_dir, "comprobar", args.format)
    # the pipeline's spec artifact, like the reference ships
    # grafo_sendas.html next to its outputs (grafo_sendas.html:586-587)
    from .plans.lineage import emit_lineage_html, emit_lineage_json

    p3 = os.path.join(args.out_dir, "lineage.html")
    emit_lineage_html(p3)
    emit_lineage_json(os.path.join(args.out_dir, "lineage.json"))
    print(f"capital_sendas -> {p1}")
    print(f"comprobar      -> {p2}")
    print(f"lineage        -> {p3} (+ lineage.json)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
