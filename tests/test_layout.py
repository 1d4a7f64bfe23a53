"""Z-order layout: the skip-proof. Writes the same table under a
linear sort and a Morton clustering, then prunes with REAL parquet
footer stats (operators/layout.parquet_file_minmax — the numbers a
scan planner uses) and asserts the z-layout touches fewer files on the
secondary dimension while remaining a pure permutation of the data."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sendas_spark.operators.layout import (
    files_touched,
    parquet_file_minmax,
    zorder_layout,
    zorder_value,
)
from etl_sendas_spark.sources.readers import read_table

SF = "/root/testdata/sf0.01"
N_FILES = 16


def test_zorder_layout_skips_files_linear_sort_cannot(spark, tmp_path):
    ev = read_table(spark, SF, "events").select("event_id", "user_id", "value")

    z_dir = str(tmp_path / "zorder")
    lin_dir = str(tmp_path / "linear")
    zorder_layout(ev, ["user_id", "value"], bits=10, num_files=N_FILES).write.mode(
        "overwrite"
    ).parquet(z_dir)
    ev.repartitionByRange(N_FILES, "user_id").sortWithinPartitions(
        "user_id"
    ).write.mode("overwrite").parquet(lin_dir)

    z_stats = parquet_file_minmax(z_dir, ["user_id", "value"])
    lin_stats = parquet_file_minmax(lin_dir, ["user_id", "value"])
    assert len(z_stats) == N_FILES and len(lin_stats) == N_FILES

    lo, hi, lou, hiu = ev.agg(
        F.min("value"), F.max("value"), F.min("user_id"), F.max("user_id")
    ).first()
    span = hi - lo

    # 5% box on the SECONDARY dim (value): the linear-by-user layout
    # cannot prune it at all; the z-layout must.
    vbox = {"value": (lo + 0.40 * span, lo + 0.45 * span)}
    z_v, lin_v = files_touched(z_stats, vbox), files_touched(lin_stats, vbox)
    assert lin_v == N_FILES, "linear layout unexpectedly pruned the value dim"
    assert z_v < lin_v, (z_v, lin_v)

    # box on the PRIMARY dim: linear prunes perfectly; z-order must
    # still prune meaningfully (partial locality on every dim).
    uspan = hiu - lou
    ubox = {"user_id": (lou + 0.40 * uspan, lou + 0.45 * uspan)}
    assert files_touched(lin_stats, ubox) <= 2
    assert files_touched(z_stats, ubox) < N_FILES

    # 2-D box: z-order prunes on BOTH dims at once.
    both = {**vbox, **ubox}
    assert files_touched(z_stats, both) <= files_touched(z_stats, vbox)

    # the layout is a permutation, never a transformation
    back = spark.read.parquet(z_dir)
    assert back.count() == ev.count()
    assert (
        back.select(F.sum(F.hash("event_id", "user_id")).alias("h")).first()["h"]
        == ev.select(F.sum(F.hash("event_id", "user_id")).alias("h")).first()["h"]
    )


def test_zorder_value_cell_edges_and_nulls(spark):
    """Scaling edges: min lands in cell 0, max in the top cell, NULL
    and degenerate domains in cell 0; the interleave stays within
    2*bits bits."""
    df = spark.createDataFrame(
        [(1, 0.0, 10), (2, 100.0, 10), (3, None, 10), (4, 50.0, 10)],
        ["id", "x", "y"],
    )
    out = {
        r["id"]: r["zval"]
        for r in zorder_value(df, ["x", "y"], bits=4).collect()
    }
    # y is constant -> degenerate domain -> cell 0 -> contributes no bits;
    # zval is then just the spread bits of x's cell
    def spread_even(v):
        return sum(((v >> i) & 1) << (2 * i) for i in range(4))

    assert out[1] == spread_even(0)
    assert out[2] == spread_even(15)
    assert out[3] == spread_even(0)
    assert out[4] == spread_even(7)  # floor(0.5 * 15) = 7
    assert all(0 <= v < (1 << 8) for v in out.values())
