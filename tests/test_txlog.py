"""Transaction-log table format (sources/txlog.py): version replay,
time travel, atomic O_EXCL commit claims, per-op conflict rules, and
composition with the CDC operators (snapshot_diff between versions +
the merge round-trip law)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_sendas_spark.sources.txlog import (
    CommitConflict,
    TxLogTable,
    _commit_path,
)


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(tag).alias("v")
    )


def test_create_append_overwrite_time_travel(spark, tmp_path):
    root = str(tmp_path / "t1")
    t = TxLogTable.create(root, _df(spark, 0, 5, "v0"))
    t.append(_df(spark, 5, 8, "v1"), spark)
    t.overwrite(_df(spark, 100, 103, "v2"))

    assert t.versions() == [0, 1, 2]
    assert {r["k"] for r in t.read(spark, 0).collect()} == set(range(5))
    assert {r["k"] for r in t.read(spark, 1).collect()} == set(range(8))
    assert {r["k"] for r in t.read(spark, 2).collect()} == {100, 101, 102}
    # latest == explicit head
    assert sorted(t.read(spark).collect()) == sorted(t.read(spark, 2).collect())
    with pytest.raises(ValueError, match="version 9"):
        t.read(spark, 9)


def test_compact_preserves_rows_and_shrinks_files(spark, tmp_path):
    root = str(tmp_path / "t2")
    t = TxLogTable.create(root, _df(spark, 0, 50, "a").repartition(8))
    t.append(_df(spark, 50, 100, "b").repartition(8), spark)
    before = sorted((r["k"], r["v"]) for r in t.read(spark).collect())
    n_before = len(t.live_files())
    v = t.compact(spark, target_files=1)
    after = sorted((r["k"], r["v"]) for r in t.read(spark).collect())
    assert after == before  # layout-only
    assert len(t.live_files()) < n_before
    # time travel still reaches the pre-compact layout
    assert len(t.live_files(v - 1)) == n_before


def test_append_retries_past_concurrent_commit(spark, tmp_path):
    root = str(tmp_path / "t3")
    t = TxLogTable.create(root, _df(spark, 0, 3, "x"))
    # a concurrent writer claims version 1 out from under this append
    assert t._try_commit(1, {"op": "append", "add": []})
    v = t.append(_df(spark, 3, 6, "y"), spark)
    assert v == 2  # landed AFTER the interloper, nothing lost
    assert {r["k"] for r in t.read(spark).collect()} == set(range(6))


def test_overwrite_conflict_recomputes_remove_set(spark, tmp_path):
    root = str(tmp_path / "t4")
    t = TxLogTable.create(root, _df(spark, 0, 3, "x"))
    t.append(_df(spark, 3, 6, "y"), spark)
    t.overwrite(_df(spark, 9, 10, "z"))
    # the final content is exactly the overwrite, all prior files dead
    assert {(r["k"], r["v"]) for r in t.read(spark).collect()} == {(9, "z")}
    # every pre-overwrite file is still on disk (time travel) but dead
    assert len(t.live_files()) < len(t.live_files(1))
    assert {r["k"] for r in t.read(spark, 1).collect()} == set(range(6))


def test_compact_occ_append_is_disjoint(spark, tmp_path, monkeypatch):
    """Layout OCC (round 11): an append landing mid-compaction is
    disjoint from a rewrite of PRE-EXISTING files — both commits
    survive (the appended file just stays uncompacted this round);
    live rows exact."""
    root = str(tmp_path / "t5")
    t = TxLogTable.create(root, _df(spark, 0, 10, "x"))
    orig = t._write_data
    fired = []

    def raced(df, stat_cols=None, partition_by=None):
        out = orig(df, stat_cols, partition_by)
        if not fired:
            fired.append(1)
            files, _, _ = orig(
                _df(spark, 10, 13, "new").coalesce(1), None, None
            )
            assert t._try_commit(
                t.latest_version() + 1, {"op": "append", "add": files}
            )
        return out

    monkeypatch.setattr(t, "_write_data", raced)
    v = t.compact(spark, target_files=1)
    assert v == t.latest_version()
    assert {r["k"] for r in t.read(spark).collect()} == set(range(13))
    # the interloper's file survived the compaction's remove set
    assert len(t.live_files()) == 2


def test_compact_occ_concurrent_remove_aborts(spark, tmp_path, monkeypatch):
    """Layout OCC (round 11): a concurrent DELETE that rewrote a file
    the compaction is also rewriting is a true overlap — committing
    the stale snapshot would resurrect the deleted rows; abort."""
    root = str(tmp_path / "t5b")
    t = TxLogTable.create(root, _df(spark, 0, 10, "x"))
    orig = t._write_data
    fired = []

    def raced(df, stat_cols=None, partition_by=None):
        out = orig(df, stat_cols, partition_by)
        if not fired:
            fired.append(1)
            t.delete_where(spark, "k < 3")
        return out

    monkeypatch.setattr(t, "_write_data", raced)
    with pytest.raises(CommitConflict, match="both touch"):
        t.compact(spark)
    # the delete won; the table is uncorrupted
    assert {r["k"] for r in t.read(spark).collect()} == set(range(3, 10))


def test_bin_pack_occ_append_is_disjoint(spark, tmp_path, monkeypatch):
    """Layout OCC (round 11): bin_pack's rule mirrors compact — a
    concurrent append's debris waits for the next pass, both commits
    survive."""
    root = str(tmp_path / "t5c")
    t = TxLogTable.create(root, _df(spark, 0, 5, "a").repartition(3))
    t.append(_df(spark, 5, 10, "b").repartition(2), spark)
    orig = t._write_data
    fired = []

    def raced(df, stat_cols=None, partition_by=None):
        out = orig(df, stat_cols, partition_by)
        if not fired:
            fired.append(1)
            files, _, _ = orig(_df(spark, 10, 12, "c"), None, None)
            assert t._try_commit(
                t.latest_version() + 1, {"op": "append", "add": files}
            )
        return out

    monkeypatch.setattr(t, "_write_data", raced)
    v = t.bin_pack(spark, target_mb=128, min_files=2)
    assert v == t.latest_version()
    assert {r["k"] for r in t.read(spark).collect()} == set(range(12))


def test_schema_mismatch_raises_and_create_twice_raises(spark, tmp_path):
    root = str(tmp_path / "t6")
    t = TxLogTable.create(root, _df(spark, 0, 3, "x"))
    bad = spark.range(3).select(F.col("id").alias("other"))
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(bad, spark)
    with pytest.raises(FileExistsError):
        TxLogTable.create(root, _df(spark, 0, 3, "x"))


def test_cdc_between_versions_merge_round_trip(spark, tmp_path):
    """snapshot_diff(read(v0), read(v1)) is a change feed; merging it
    back onto v0 reproduces v1 exactly — txlog + CDC compose."""
    from etl_sendas_spark.operators.relational import merge_changes, snapshot_diff

    root = str(tmp_path / "t7")
    t = TxLogTable.create(root, _df(spark, 0, 6, "old"))
    new = (
        _df(spark, 0, 4, "old")  # 4,5 deleted
        .union(_df(spark, 3, 4, "upd").limit(0))
        .union(_df(spark, 6, 8, "new"))  # inserts
    )
    t.overwrite(new)
    old_snap, new_snap = t.read(spark, 0), t.read(spark, 1)
    diff = snapshot_diff(old_snap, new_snap, keys=["k"])
    merged = merge_changes(old_snap, diff, keys=["k"])
    assert sorted((r["k"], r["v"]) for r in merged.collect()) == sorted(
        (r["k"], r["v"]) for r in new_snap.collect()
    )


def test_zone_map_file_skipping(spark, tmp_path):
    """Data skipping from logged footer stats: a range-clustered table
    reads a strict subset of files under a range prune, results are
    identical to filter-after-full-read, and pruning a column with no
    stats is a safe no-op."""
    root = str(tmp_path / "t8")
    # 8 files, k range-clustered so zone maps are tight per file
    base = (
        spark.range(0, 8000)
        .select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
        .repartitionByRange(8, "k")
        .sortWithinPartitions("k")
    )
    t = TxLogTable.create(root, base, stat_cols=["k"])

    full = t.read(spark)
    pruned = t.read(spark, prune={"k": (1000, 1999)})
    # file-level skip actually happened
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    # range split points are sampled, so the 1000-row band straddles
    # at most 3 of the 8 files
    assert len(pruned.inputFiles()) <= 3
    # metadata pruning never changes filtered results
    exp = sorted(r["k"] for r in full.filter("k between 1000 and 1999").collect())
    got = sorted(r["k"] for r in pruned.filter("k between 1000 and 1999").collect())
    assert got == exp and len(exp) == 1000
    # stats survive append + compact replay
    t.append(
        spark.range(20000, 21000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        ),
        spark,
    )
    pruned2 = t.read(spark, prune={"k": (20000, 20010)})
    assert len(pruned2.inputFiles()) < len(t.read(spark).inputFiles())
    assert pruned2.filter("k <= 20010").count() == 11
    # unknown-stats column: keep everything (safe)
    assert len(t.read(spark, prune={"v": (0, 0)}).inputFiles()) == len(
        t.read(spark).inputFiles()
    )
    # every file pruned: empty frame, table schema
    nothing = t.read(spark, prune={"k": (10**9, 10**9 + 1)})
    assert nothing.count() == 0 and nothing.columns == ["k", "v"]


def test_log_checkpointing_bounds_replay(spark, tmp_path):
    """Checkpoints written every CHECKPOINT_EVERY commits hold the full
    live-set + zone-map state: reads at/after a checkpoint never touch
    older commit files (proven by deleting them), time travel BEFORE
    the checkpoint still replays from commit 0, and pruning works from
    checkpointed stats."""
    import os as _os

    from etl_sendas_spark.sources.txlog import CHECKPOINT_EVERY, _log_dir

    root = str(tmp_path / "t9")
    t = TxLogTable.create(root, _df(spark, 0, 10, "c0"), stat_cols=["k"])
    for i in range(1, 12):
        t.append(_df(spark, i * 10, i * 10 + 10, f"c{i}"), spark)
    assert t._checkpoints() == [CHECKPOINT_EVERY]
    assert {r["k"] for r in t.read(spark).collect()} == set(range(120))

    # delete pre-checkpoint commit files: post-checkpoint reads are
    # unaffected (replay starts at the checkpoint), pre-checkpoint
    # time travel now fails loudly
    for v in range(1, CHECKPOINT_EVERY):
        _os.remove(_os.path.join(_log_dir(root), f"{v:08d}.json"))
    assert {r["k"] for r in t.read(spark).collect()} == set(range(120))
    assert {r["k"] for r in t.read(spark, CHECKPOINT_EVERY).collect()} == set(
        range(110)
    )
    with pytest.raises(ValueError, match="version 5"):
        t.read(spark, 5)
    # zone maps flow through the checkpoint: prune still skips files
    pruned = t.read(spark, prune={"k": (115, 116)})
    assert len(pruned.inputFiles()) < len(t.read(spark).inputFiles())
    assert pruned.filter("k between 115 and 116").count() == 2


def test_vacuum_deletes_dead_files_and_truncates_log(spark, tmp_path):
    """VACUUM: files dead in every retained version are physically
    removed, retained reads (incl. zone-map pruning) are unaffected,
    pre-cutoff time travel fails loudly at version resolution, and the
    age guard protects freshly-written unreferenced files."""
    import glob
    import os as _os

    root = str(tmp_path / "t10")
    t = TxLogTable.create(root, _df(spark, 0, 10, "a"), stat_cols=["k"])
    t.overwrite(_df(spark, 10, 20, "b"))
    t.overwrite(_df(spark, 20, 30, "c"))
    t.overwrite(_df(spark, 30, 40, "d"))
    n_files_before = len(glob.glob(f"{root}/data/*/*.parquet"))

    # age guard: the log truncates, but no file young enough to belong
    # to an in-flight writer is deleted
    res = t.vacuum(retain_versions=2, min_age_s=3600)
    assert res["cutoff"] == 2
    assert res["deleted_files"] == 0 and res["deleted_commits"] == 2

    res = t.vacuum(retain_versions=2, min_age_s=0)
    assert res["cutoff"] == 2
    assert res["deleted_files"] > 0 and res["deleted_commits"] == 0
    assert len(glob.glob(f"{root}/data/*/*.parquet")) < n_files_before

    # retained window fully functional
    assert t.versions() == [2, 3]
    assert {r["k"] for r in t.read(spark).collect()} == set(range(30, 40))
    assert {r["k"] for r in t.read(spark, 2).collect()} == set(range(20, 30))
    pruned = t.read(spark, prune={"k": (35, 36)})
    assert pruned.filter("k between 35 and 36").count() == 2
    # pre-cutoff time travel fails at resolution, not mid-scan
    with pytest.raises(ValueError, match="version 0"):
        t.read(spark, 0)
    # the table still accepts writes after vacuum
    t.append(_df(spark, 40, 45, "e"), spark)
    assert {r["k"] for r in t.read(spark).collect()} == set(range(30, 45))


def test_compact_zorder_restores_multi_column_pruning(spark, tmp_path):
    """OPTIMIZE ZORDER BY for the txlog: ingest-ordered appends leave
    every file's zone maps spanning the full domain of both query
    columns (pruning reads everything); compact(zorder_by=[a, b]) must
    (1) preserve content exactly, (2) make read()-time pruning on EACH
    of the two columns drop files, and (3) record the clustering in the
    commit payload."""
    root = str(tmp_path / "tz")
    # two independent uniform columns, appended in id order: every
    # ingest file spans ~the full (a, b) domain
    def wave(lo, hi):
        return (
            spark.range(lo, hi)
            .select(
                F.col("id").alias("k"),
                (F.col("id") * 7919 % 1000).alias("a"),
                (F.col("id") * 104729 % 1000).alias("b"),
            )
            .repartition(4)
        )

    t = TxLogTable.create(root, wave(0, 4000), stat_cols=["a", "b"])
    t.append(wave(4000, 8000), spark)
    before = t.read(spark)
    n_before = len(before.inputFiles())
    # ingest layout: a box prune on either column keeps every file
    assert len(t.read(spark, prune={"a": (0, 99)}).inputFiles()) == n_before
    assert len(t.read(spark, prune={"b": (0, 99)}).inputFiles()) == n_before
    exp = sorted((r["k"], r["a"], r["b"]) for r in before.collect())

    v = t.compact(spark, target_files=16, zorder_by=["a", "b"])
    assert t.commit_meta(v)["zorder_by"] == ["a", "b"]
    after = t.read(spark)
    assert sorted((r["k"], r["a"], r["b"]) for r in after.collect()) == exp
    n_after = len(after.inputFiles())
    # z-clustered layout: the same box prunes files on BOTH columns
    pr_a = len(t.read(spark, prune={"a": (0, 99)}).inputFiles())
    pr_b = len(t.read(spark, prune={"b": (0, 99)}).inputFiles())
    assert pr_a < n_after and pr_b < n_after, (pr_a, pr_b, n_after)
    # and pruned reads stay value-correct
    got = sorted(
        r["k"]
        for r in t.read(spark, prune={"a": (0, 99)})
        .filter("a between 0 and 99")
        .collect()
    )
    assert got == sorted(r["k"] for r in before.filter("a between 0 and 99").collect())


def test_change_feed_per_commit_and_replay(spark, tmp_path):
    """change_feed: per-commit I/U/D rows tagged _commit_version;
    create emits pure inserts, merging each commit's feed in order
    replays every snapshot, bad ranges fail loudly."""
    from etl_sendas_spark.operators.relational import merge_changes

    root = str(tmp_path / "tcf")
    t = TxLogTable.create(root, _df(spark, 0, 5, "v0"))
    t.overwrite(_df(spark, 0, 4, "v0").union(_df(spark, 6, 8, "v1")))  # del 4, ins 6,7
    t.overwrite(
        _df(spark, 0, 3, "v0").union(_df(spark, 3, 4, "UPD")).union(_df(spark, 6, 8, "v1"))
    )  # update k=3

    feed = t.change_feed(spark, keys=["k"], from_version=0)
    rows = feed.collect()
    by_v = {}
    for r in rows:
        by_v.setdefault(r["_commit_version"], []).append((r["op"], r["k"]))
    assert sorted(by_v[0]) == [("I", k) for k in range(5)]
    assert sorted(by_v[1]) == [("D", 4), ("I", 6), ("I", 7)]
    assert sorted(by_v[2]) == [("U", 3)]

    # replay law: folding each commit's feed reproduces each snapshot
    state = spark.createDataFrame([], t.read(spark, 0).schema)
    for v in [0, 1, 2]:
        changes = feed.filter(F.col("_commit_version") == v).drop("_commit_version")
        state = merge_changes(state, changes, keys=["k"])
        assert sorted((r["k"], r["v"]) for r in state.collect()) == sorted(
            (r["k"], r["v"]) for r in t.read(spark, v).collect()
        ), v

    # partial window + loud failure on unresolvable versions
    assert {r["_commit_version"] for r in t.change_feed(spark, ["k"], 1, 2).collect()} == {1, 2}
    with pytest.raises(ValueError, match="change_feed"):
        t.change_feed(spark, ["k"], 1, 9)


def test_change_feed_normalized_drives_ivm(spark, tmp_path):
    """Composition law: change_feed(normalize_updates=True) — every U
    rewritten as D(pre-image) + I(post-image), the Delta CDF idea
    flattened to the {I, D} alphabet — must drive
    incremental_agg_update so that folding each commit's feed into the
    v0 aggregate state reproduces aggregate_state(read(v)) exactly at
    every version, updates included."""
    from etl_sendas_spark.operators.ivm import (
        aggregate_state,
        incremental_agg_update,
    )

    root = str(tmp_path / "tivm")

    def rows(lo, hi, mult):
        return spark.range(lo, hi).selectExpr(
            "id AS k",
            "CAST(id % 3 AS BIGINT) AS grp",
            f"CAST(id * {mult} AS DOUBLE) AS x",
        )

    t = TxLogTable.create(root, rows(0, 60, 1))
    t.overwrite(rows(0, 40, 1).union(rows(100, 120, 1)))  # deletes + inserts
    t.overwrite(rows(0, 40, 3).union(rows(100, 120, 1)))  # updates x for k<40

    feed = t.change_feed(
        spark, keys=["k"], from_version=1, normalize_updates=True
    )
    # normalized alphabet is exactly {I, D}
    assert {r["op"] for r in feed.select("op").distinct().collect()} <= {"I", "D"}
    # the update commit (v2) contains pre-image deletes AND post-image
    # inserts for the same keys
    v2 = feed.filter("_commit_version = 2")
    # k=0 is x-invariant under *3 (0 == 0), so 39 keys actually change
    assert v2.filter("op = 'D'").count() == 39
    assert v2.filter("op = 'I'").count() == 39
    pre = {(r["k"], r["x"]) for r in v2.filter("op = 'D'").collect()}
    post = {(r["k"], r["x"]) for r in v2.filter("op = 'I'").collect()}
    assert pre == {(k, float(k)) for k in range(1, 40)}  # old x
    assert post == {(k, float(k * 3)) for k in range(1, 40)}  # new x

    state = aggregate_state(t.read(spark, 0), keys=["grp"], sum_cols=["x"])
    for v in (1, 2):
        changes = feed.filter(F.col("_commit_version") == v).drop(
            "_commit_version"
        )
        state = incremental_agg_update(state, changes, keys=["grp"], sum_cols=["x"])
        expect = aggregate_state(t.read(spark, v), keys=["grp"], sum_cols=["x"])
        got = sorted(map(tuple, state.collect()))
        want = sorted(map(tuple, expect.collect()))
        assert got == want, f"v{v}"


def test_schema_evolution_add_column(spark, tmp_path):
    """Delta-style evolution: append(merge_schema=True) may ADD columns
    (old files backfill NULL on every read path, including time travel
    and pruned reads); dropping a column fails loudly with or without
    the flag; the default strict mode still rejects any name drift."""
    root = str(tmp_path / "tse")
    t = TxLogTable.create(
        root,
        spark.range(0, 50).selectExpr("id AS k", "id * 2 AS a"),
        stat_cols=["k"],
    )
    wide = spark.range(50, 100).selectExpr(
        "id AS k", "id * 2 AS a", "CAST(id AS STRING) AS tag"
    )
    # strict mode refuses the new column, evolution accepts it
    with pytest.raises(ValueError, match="merge_schema"):
        t.append(wide, spark)
    t.append(wide, spark, merge_schema=True)

    latest = t.read(spark)
    assert set(latest.columns) == {"k", "a", "tag"}
    assert latest.count() == 100
    # old rows backfill NULL, new rows carry values
    assert latest.filter("k < 50 AND tag IS NULL").count() == 50
    assert latest.filter("k >= 50 AND tag IS NOT NULL").count() == 50
    # time travel at the pre-evolution version keeps the narrow schema
    assert set(t.read(spark, 0).columns) == {"k", "a"}
    # zone-map pruning still works across mixed-schema files
    pruned = t.read(spark, prune={"k": (0, 10)})
    assert len(pruned.inputFiles()) < len(latest.inputFiles())
    assert pruned.filter("k <= 10").count() == 11

    # dropping a column is never allowed
    with pytest.raises(ValueError, match="drop"):
        t.append(
            spark.range(100, 110).selectExpr("id AS k", "id * 2 AS a"),
            spark,
            merge_schema=True,
        )


def test_read_changes_since_poll_consumption(spark, tmp_path):
    """Poll-based incremental consumption: first poll delivers all
    history, committed progress advances the watermark, a crash before
    commit_progress redelivers the same window (at-least-once), caught
    up returns (None, head), and a VACUUM past the consumer's
    watermark fails loudly instead of skipping history."""
    root = str(tmp_path / "tpoll")
    state = str(tmp_path / "consumer.json")
    t = TxLogTable.create(root, _df(spark, 0, 5, "v0"))
    t.append(_df(spark, 5, 8, "v1"), spark)

    feed, head = t.read_changes_since(spark, ["k"], state)
    assert head == 1
    assert {r["_commit_version"] for r in feed.collect()} == {0, 1}
    # crash before commit: repoll redelivers the identical window
    feed2, head2 = t.read_changes_since(spark, ["k"], state)
    assert head2 == 1
    assert sorted(map(tuple, feed2.collect())) == sorted(map(tuple, feed.collect()))

    TxLogTable.commit_progress(state, head)
    none_feed, head3 = t.read_changes_since(spark, ["k"], state)
    assert none_feed is None and head3 == 1  # caught up

    t.append(_df(spark, 8, 10, "v2"), spark)
    t.overwrite(_df(spark, 0, 3, "v3"))
    feed3, head4 = t.read_changes_since(spark, ["k"], state)
    assert head4 == 3
    assert {r["_commit_version"] for r in feed3.collect()} == {2, 3}
    TxLogTable.commit_progress(state, head4)

    # consumer falls behind a vacuum: loud failure, no silent skip
    for i in range(4, 9):
        t.append(_df(spark, i * 10, i * 10 + 2, f"v{i}"), spark)
    t.vacuum(retain_versions=2, min_age_s=0.0)
    lagging = str(tmp_path / "lagging.json")
    TxLogTable.commit_progress(lagging, 3)  # saw up to v3 only
    with pytest.raises(ValueError, match="change_feed"):
        t.read_changes_since(spark, ["k"], lagging)


def test_change_feed_vacuum_boundary_raises(spark, tmp_path):
    """ADVICE r7 (high): a consumer whose watermark is exactly
    cutoff-1 passes the resolvability check (from_version == cutoff IS
    a live version) but the diff for the cutoff version needs the
    VACUUMED cutoff-1 snapshot. An empty base there would re-emit the
    entire cutoff snapshot as inserts and corrupt downstream IVM /
    replication — it must fail loudly instead, and v == 0 stays the
    only legitimate empty-base case."""
    root = str(tmp_path / "tvb")
    t = TxLogTable.create(root, _df(spark, 0, 5, "v0"))
    for i in range(1, 6):
        t.append(_df(spark, i * 10, i * 10 + 2, f"v{i}"), spark)
    res = t.vacuum(retain_versions=2, min_age_s=0.0)
    cutoff = res["cutoff"]
    assert t.versions() == [cutoff, cutoff + 1]

    # watermark == cutoff-1: from_version = cutoff resolves, but its
    # diff base is gone -> loud failure, never duplicated inserts
    with pytest.raises(ValueError, match="vacuum-truncated"):
        t.change_feed(spark, ["k"], from_version=cutoff)
    state = str(tmp_path / "boundary.json")
    TxLogTable.commit_progress(state, cutoff - 1)
    with pytest.raises(ValueError, match="vacuum-truncated"):
        t.read_changes_since(spark, ["k"], state)

    # one version later the base survives: the feed works and carries
    # only genuine changes for that commit (2 inserted keys)
    feed = t.change_feed(spark, ["k"], from_version=cutoff + 1)
    rows = feed.collect()
    assert {r["_commit_version"] for r in rows} == {cutoff + 1}
    assert sorted((r["op"], r["k"]) for r in rows) == [("I", 50), ("I", 51)]


def test_schema_evolution_type_change_rejected(spark, tmp_path):
    """ADVICE r7: merge_schema=True must also reject a same-named
    column arriving with a DIFFERENT type — otherwise the append
    commits fine and every subsequent read blows up inside Spark's
    mergeSchema footer merge, far from the offending write."""
    root = str(tmp_path / "tst")
    t = TxLogTable.create(
        root, spark.range(0, 5).selectExpr("id AS k", "id * 2 AS a")
    )
    bad = spark.range(5, 10).selectExpr("id AS k", "CAST(id AS STRING) AS a")
    with pytest.raises(ValueError, match="change column types"):
        t.append(bad, spark, merge_schema=True)
    # the table is untouched and still readable
    assert t.versions() == [0]
    assert t.read(spark).count() == 5


def test_partitioned_table_lifecycle(spark, tmp_path):
    """Partition spec (round 8): create(partition_by=...) writes
    hive-style col=value files, records per-file partition values in
    the commit log, and read() re-attaches the (path-only) partition
    column typed. read(prune=) consults partition values BEFORE zone
    maps and provably skips files; appends inherit the spec; compact
    preserves rows and stays partitioned; vacuum collects the nested
    files; time travel still resolves."""
    root = str(tmp_path / "tpart")

    def rows(lo, hi):
        return spark.range(lo, hi).selectExpr(
            "id AS k", "CAST(id % 4 AS INT) AS p", "id * 2 AS x"
        )

    t = TxLogTable.create(
        root, rows(0, 400).repartition(4, "k"),
        stat_cols=["k"], partition_by=["p"],
    )
    t.append(rows(400, 600).repartition(2, "k"), spark)

    full = t.read(spark)
    assert set(full.columns) == {"k", "p", "x"}
    assert full.count() == 600
    assert dict(full.dtypes)["p"] == "int"  # typed from the path
    got = sorted((r["k"], r["p"], r["x"]) for r in full.collect())
    assert got == [(k, k % 4, k * 2) for k in range(600)]

    # partition pruning: only p=2 files scanned, results exact
    pr = t.read(spark, prune={"p": (2, 2)})
    assert len(pr.inputFiles()) < len(full.inputFiles())
    assert {r["p"] for r in pr.collect()} == {2}
    assert pr.count() == 150
    # combined partition + zone-map prune shrinks further
    pz = t.read(spark, prune={"p": (2, 2), "k": (0, 50)})
    assert len(pz.inputFiles()) < len(pr.inputFiles())
    assert pz.filter("k <= 50").count() == 13  # p==2, k in 2..50

    # spec is table-level metadata: commit log carries parts; appended
    # files inherited the spec
    assert t._partition_cols() == ["p"]
    assert all("p=" in f for f in t.live_files())

    # column order of an append doesn't matter (partition cols
    # re-attach at the END of a partitioned read)
    t.append(
        spark.range(600, 610).selectExpr(
            "CAST(id % 4 AS INT) AS p", "id AS k", "id * 2 AS x"
        ),
        spark,
    )
    assert t.read(spark).count() == 610

    # compact: layout-only, stays partitioned, still prunes
    before = sorted(map(tuple, t.read(spark).select("k", "p", "x").collect()))
    n_files = len(t.live_files())
    v = t.compact(spark, target_files=1)
    after = sorted(map(tuple, t.read(spark).select("k", "p", "x").collect()))
    assert after == before
    assert len(t.live_files()) < n_files
    assert all("p=" in f for f in t.live_files())
    pr2 = t.read(spark, prune={"p": (1, 1)})
    assert len(pr2.inputFiles()) < len(t.read(spark).inputFiles())
    # time travel to the pre-compact version still resolves
    assert t.read(spark, v - 1).count() == 610

    # vacuum walks the nested hive layout
    res = t.vacuum(retain_versions=1, min_age_s=0.0)
    assert res["deleted_files"] > 0
    assert t.read(spark).count() == 610


def test_partitioned_table_rejects_bad_specs(spark, tmp_path):
    df = spark.range(0, 10).selectExpr("id AS k", "CAST(id % 2 AS INT) AS p")
    with pytest.raises(ValueError, match="not in frame"):
        TxLogTable.create(str(tmp_path / "b1"), df, partition_by=["nope"])
    with pytest.raises(ValueError, match="both partition_by and"):
        TxLogTable.create(
            str(tmp_path / "b2"), df, stat_cols=["p"], partition_by=["p"]
        )


def test_delete_where_copy_on_write(spark, tmp_path):
    """DELETE with file-level copy-on-write (round 8): only files
    containing matching rows rewrite; untouched files stay live under
    their old paths (the Delta DML mechanic). NULL predicates keep
    their rows; no match is a no-op version-wise."""
    root = str(tmp_path / "tdel")
    df = spark.range(0, 400).selectExpr(
        "id AS k",
        "CASE WHEN id % 10 = 0 THEN NULL ELSE id * 2 END AS x",
    )
    t = TxLogTable.create(
        root, df.repartitionByRange(8, "k"), stat_cols=["k"]
    )
    before = set(t.live_files())

    v = t.delete_where(spark, "k BETWEEN 100 AND 149")
    assert v == 1
    after = set(t.live_files())
    # CoW: the files NOT containing k in 100..149 survive by path
    assert len(before & after) > 0
    assert len(before & after) < len(before)
    got = sorted(r["k"] for r in t.read(spark).collect())
    assert got == [k for k in range(400) if not (100 <= k <= 149)]
    # NULL predicate rows are kept (x IS NULL for k % 10 == 0)
    t.delete_where(spark, "x > 100000")  # matches nothing, x NULL rows kept
    assert t.latest_version() == 1  # no-op did not commit
    assert t.read(spark).count() == 350

    # time travel still reaches the pre-delete snapshot
    assert t.read(spark, 0).count() == 400


def test_update_where_and_partition_move(spark, tmp_path):
    """UPDATE with copy-on-write; assignments see PRE-update values;
    updating a partition column moves rows to their new hive dir."""
    root = str(tmp_path / "tupd")
    t = TxLogTable.create(
        root,
        spark.range(0, 100).selectExpr(
            "id AS k", "CAST(id % 4 AS INT) AS p", "id * 1.0 AS x"
        ).repartitionByRange(4, "k"),
        stat_cols=["k"],
        partition_by=["p"],
    )
    with pytest.raises(ValueError, match="unknown columns"):
        t.update_where(spark, {"nope": "1"}, "k < 5")

    # swap semantics: both assignments read the old row
    t.update_where(spark, {"x": "x + k", "k": "k + 1000"}, "k < 10")
    rows = {r["k"]: r["x"] for r in t.read(spark).collect()}
    for k in range(10):
        assert rows[k + 1000] == float(k) + k  # x saw OLD k
    assert all(k in rows for k in range(10, 100))

    # partition-column update moves rows across hive dirs
    t.update_where(spark, {"p": "3"}, "k = 1005")
    moved = t.read(spark).filter("k = 1005").collect()
    assert moved[0]["p"] == 3
    pr = t.read(spark, prune={"p": (3, 3)})
    assert 1005 in {r["k"] for r in pr.collect()}


def test_merge_into_upsert_and_delete(spark, tmp_path):
    """MERGE with copy-on-write: matched rows replaced by source,
    inserts ride the same commit, only key-containing files rewrite;
    delete mode removes matches; duplicate source keys and schema
    drift fail loudly."""
    root = str(tmp_path / "tmerge")
    t = TxLogTable.create(
        root, _df(spark, 0, 100, "old").repartitionByRange(8, "k"),
    )
    before = set(t.live_files())

    src = _df(spark, 95, 110, "new")  # 5 updates + 10 inserts
    v = t.merge_into(spark, src, keys=["k"])
    assert v == 1
    after = set(t.live_files())
    assert len(before & after) > 0  # CoW: untouched files survive
    got = {(r["k"], r["v"]) for r in t.read(spark).collect()}
    assert got == {(k, "old") for k in range(95)} | {
        (k, "new") for k in range(95, 110)
    }

    # delete mode
    t.merge_into(spark, _df(spark, 0, 5, "x"), keys=["k"], when_matched="delete")
    assert sorted(r["k"] for r in t.read(spark).collect()) == list(range(5, 110))

    # pure-insert merge (no matches) still lands in one commit
    t.merge_into(spark, _df(spark, 500, 503, "ins"), keys=["k"])
    assert t.read(spark).filter("k >= 500").count() == 3

    with pytest.raises(ValueError, match="duplicate keys"):
        t.merge_into(spark, _df(spark, 0, 3, "d").union(_df(spark, 0, 1, "d")), keys=["k"])
    with pytest.raises(ValueError, match="source columns"):
        t.merge_into(spark, spark.range(3).selectExpr("id AS k"), keys=["k"])


def test_dml_conflict_raises(spark, tmp_path, monkeypatch):
    """True-overlap conflicts still abort (round-10 OCC refinement):
    a concurrent append whose rows MATCH the delete predicate lands
    between snapshot and claim — committing the stale remove set would
    silently miss those rows, so the delete raises; the interloper's
    rows survive."""
    root = str(tmp_path / "tdmlc")
    t = TxLogTable.create(root, _df(spark, 0, 20, "x"))
    orig = t._write_data
    fired = []

    def raced(df, stat_cols=None, partition_by=None):
        out = orig(df, stat_cols, partition_by)
        if not fired:
            fired.append(1)
            files, _, _ = orig(_df(spark, 0, 3, "zz"), None, None)
            assert t._try_commit(
                t.latest_version() + 1, {"op": "append", "add": files}
            )
        return out

    monkeypatch.setattr(t, "_write_data", raced)
    with pytest.raises(CommitConflict, match="matched"):
        t.delete_where(spark, "k < 5")
    got = [r["k"] for r in t.read(spark).collect()]
    assert sorted(got) == sorted(list(range(20)) + [0, 1, 2])


def test_dml_conflict_overlapping_remove_aborts(spark, tmp_path, monkeypatch):
    """A concurrent commit that removes files this DML plans to
    rewrite is a true overlap: committing would resurrect the
    concurrently-removed rows — abort, never retry."""
    root = str(tmp_path / "tdmlo")
    t = TxLogTable.create(root, _df(spark, 0, 20, "x"))
    all_rel = [os.path.relpath(p, root) for p in t.live_files()]
    orig = t._write_data
    fired = []

    def raced(df, stat_cols=None, partition_by=None):
        out = orig(df, stat_cols, partition_by)
        if not fired:
            fired.append(1)
            assert t._try_commit(
                t.latest_version() + 1,
                {"op": "overwrite", "add": [], "remove": all_rel},
            )
        return out

    monkeypatch.setattr(t, "_write_data", raced)
    with pytest.raises(CommitConflict, match="both touch"):
        t.delete_where(spark, "k < 5")
    assert t.live_files() == []  # the overwrite won


def test_dml_disjoint_concurrent_append_retries(spark, tmp_path, monkeypatch):
    """The Delta OCC rule (round 10): a concurrent blind append of
    NON-matching rows is disjoint from the delete's remove set — the
    delete re-validates and commits at the next version instead of
    aborting; both writers' effects survive."""
    root = str(tmp_path / "tdmld")
    t = TxLogTable.create(root, _df(spark, 0, 20, "x"))
    orig = t._write_data
    fired = []

    def raced(df, stat_cols=None, partition_by=None):
        out = orig(df, stat_cols, partition_by)
        if not fired:
            fired.append(1)
            files, _, _ = orig(_df(spark, 100, 103, "y"), None, None)
            assert t._try_commit(
                t.latest_version() + 1, {"op": "append", "add": files}
            )
        return out

    monkeypatch.setattr(t, "_write_data", raced)
    v = t.delete_where(spark, "k < 5")
    got = sorted(r["k"] for r in t.read(spark).collect())
    assert got == sorted(list(range(5, 20)) + [100, 101, 102])
    # the delete slid past the interloper's version
    assert v == t.latest_version() and v >= 2


def test_merge_disjoint_and_overlapping_concurrent_commits(
    spark, tmp_path, monkeypatch
):
    """merge_into's OCC validation is key-based: a concurrent append
    with DISJOINT keys slides the merge to the next version; one
    whose keys intersect the source aborts (the merge would insert a
    duplicate key)."""
    root = str(tmp_path / "tmocc")
    t = TxLogTable.create(
        root, spark.createDataFrame([(1, "a"), (2, "b")], "k LONG, v STRING")
    )
    orig = t._write_data

    def race_with(rows):
        fired = []

        def raced(df, stat_cols=None, partition_by=None):
            out = orig(df, stat_cols, partition_by)
            if not fired:
                fired.append(1)
                files, _, _ = orig(
                    spark.createDataFrame(rows, "k LONG, v STRING"),
                    None,
                    None,
                )
                assert t._try_commit(
                    t.latest_version() + 1,
                    {"op": "append", "add": files},
                )
            return out

        return raced

    src = spark.createDataFrame([(2, "B"), (3, "C")], "k LONG, v STRING")
    # disjoint concurrent key -> retry succeeds, all rows present
    monkeypatch.setattr(t, "_write_data", race_with([(9, "z")]))
    t.merge_into(spark, src, ["k"])
    got = sorted((r["k"], r["v"]) for r in t.read(spark).collect())
    assert got == [(1, "a"), (2, "B"), (3, "C"), (9, "z")]
    # overlapping concurrent key -> abort
    src2 = spark.createDataFrame([(5, "E")], "k LONG, v STRING")
    monkeypatch.setattr(t, "_write_data", race_with([(5, "dup")]))
    with pytest.raises(CommitConflict, match="matched"):
        t.merge_into(spark, src2, ["k"])


def test_replace_where_disjoint_backfills_both_commit(
    spark, tmp_path, monkeypatch
):
    """The verdict's two-writers scenario: two backfills of DIFFERENT
    key ranges interleave — the second's commit claim loses the race
    but re-validates as disjoint and lands at the next version; both
    backfills' rows are present afterward."""
    root = str(tmp_path / "trwd")
    t = TxLogTable.create(root, _df(spark, 0, 20, "x"))
    orig = t._write_data
    fired = []

    def raced(df, stat_cols=None, partition_by=None):
        out = orig(df, stat_cols, partition_by)
        if not fired:
            fired.append(1)
            # writer B backfills k >= 100 (no current rows match:
            # pure-insert replace_where -> empty remove set)
            files, _, _ = orig(_df(spark, 100, 105, "B"), None, None)
            assert t._try_commit(
                t.latest_version() + 1,
                {"op": "replace_where", "add": files, "remove": []},
            )
        return out

    monkeypatch.setattr(t, "_write_data", raced)
    # writer A backfills k in [0, 5) with fresh rows
    t.replace_where(spark, _df(spark, 0, 5, "A"), "k < 5")
    got = sorted((r["k"], r["v"]) for r in t.read(spark).collect())
    exp = sorted(
        [(k, "A") for k in range(5)]
        + [(k, "x") for k in range(5, 20)]
        + [(k, "B") for k in range(100, 105)]
    )
    assert got == exp


def test_timestamp_time_travel(spark, tmp_path):
    """TIMESTAMP AS OF (round 8): read(as_of=ts) resolves to the
    latest commit at or before ts; pre-history timestamps and
    version+as_of together fail loudly; ISO strings accepted."""
    import time
    from datetime import datetime

    root = str(tmp_path / "tts")
    t = TxLogTable.create(root, _df(spark, 0, 5, "v0"))
    time.sleep(0.05)
    between_01 = time.time()
    time.sleep(0.05)
    t.append(_df(spark, 5, 8, "v1"), spark)
    time.sleep(0.05)
    t.overwrite(_df(spark, 100, 103, "v2"))

    assert t.version_at(between_01) == 0
    assert t.version_at(time.time()) == 2
    assert t.read(spark, as_of=between_01).count() == 5
    # ISO string form
    iso = datetime.fromtimestamp(between_01).isoformat()
    assert t.read(spark, as_of=iso).count() == 5
    # exact boundary: a commit's own ts resolves to that commit
    ts0 = t.commit_meta(0)["ts"]
    assert t.version_at(ts0) == 0

    with pytest.raises(ValueError, match="no version at or before"):
        t.version_at(ts0 - 10.0)
    with pytest.raises(ValueError, match="not both"):
        t.read(spark, version=1, as_of=between_01)


def test_restore_to_version_is_metadata_only(spark, tmp_path):
    """RESTORE (round 8): head content equals the target snapshot via
    a pure file-list-diff commit — no data files written; the restore
    is itself history (undoable); zone maps of re-added files survive;
    restoring past a vacuum fails loudly with the missing paths."""
    import os as _os

    root = str(tmp_path / "trst")
    t = TxLogTable.create(
        root,
        spark.range(0, 100).selectExpr("id AS k", "id * 2 AS x")
        .repartitionByRange(4, "k"),
        stat_cols=["k"],
    )
    t.delete_where(spark, "k BETWEEN 10 AND 19")
    t.append(
        spark.range(100, 120).selectExpr("id AS k", "id * 2 AS x"), spark
    )
    assert t.read(spark).count() == 110

    def data_files():
        n = 0
        for dp, _d, names in _os.walk(_os.path.join(root, "data")):
            n += sum(1 for f in names if f.endswith(".parquet"))
        return n

    before = data_files()
    v = t.restore(version=0)
    assert data_files() == before  # metadata-only: nothing written
    assert sorted(r["k"] for r in t.read(spark).collect()) == list(range(100))
    assert t.commit_meta(v)["restored_version"] == 0
    # zone maps came back with the re-added files
    pruned = t.read(spark, prune={"k": (0, 10)})
    assert len(pruned.inputFiles()) < len(t.read(spark).inputFiles())
    # undo: restore to the pre-restore head
    t.restore(version=v - 1)
    assert t.read(spark).count() == 110
    # timestamp form resolves through version_at
    t.restore(as_of=t.commit_meta(0)["ts"])
    assert t.read(spark).count() == 100

    with pytest.raises(ValueError, match="exactly one"):
        t.restore()
    with pytest.raises(ValueError, match="exactly one"):
        t.restore(version=0, as_of=1.0)

    # vacuumed target: loud failure (version resolution or missing
    # files, depending on what the vacuum truncated)
    for i in range(6):
        t.overwrite(_df(spark, i * 10, i * 10 + 3, f"w{i}").selectExpr(
            "k", "CAST(k AS BIGINT) AS x"
        ))
    t.vacuum(retain_versions=2, min_age_s=0.0)
    with pytest.raises(ValueError, match="version 0 does not exist"):
        t.restore(version=0)


def test_prune_half_open_and_membership_specs(spark, tmp_path):
    """read(prune=) accepts half-open ranges ((lo, None) / (None, hi) —
    what the DataSource's strict-comparison pushdown produces) and
    IN-lists; pruning is metadata-only so filtered results always
    equal filter-after-full-read."""
    root = str(tmp_path / "thp")
    t = TxLogTable.create(
        root,
        spark.range(0, 4000)
        .selectExpr("id AS k", "CAST(id % 5 AS INT) AS p")
        .repartitionByRange(8, "k")
        .sortWithinPartitions("k"),
        stat_cols=["k"],
    )
    full = t.read(spark)
    n_full = len(full.inputFiles())

    lo_open = t.read(spark, prune={"k": (3000, None)})
    assert len(lo_open.inputFiles()) < n_full
    assert lo_open.filter("k >= 3000").count() == 1000

    hi_open = t.read(spark, prune={"k": (None, 499)})
    assert len(hi_open.inputFiles()) < n_full
    assert hi_open.filter("k <= 499").count() == 500

    member = t.read(spark, prune={"k": [10, 3990]})
    assert len(member.inputFiles()) < n_full
    assert member.filter("k IN (10, 3990)").count() == 2
    # empty IN-list matches nothing, schema preserved
    none = t.read(spark, prune={"k": []})
    assert none.count() == 0 and none.columns == ["k", "p"]


def test_prune_incomparable_types_keep_files(spark, tmp_path):
    """Pruning must never fail or change results (ADVICE r8 low): a
    prune bound whose Python type cannot compare with the logged
    partition value / zone-map value (datetime.date vs the partition
    path STRING; date vs string stats) keeps the file instead of
    raising TypeError — results equal filter-after-full-read."""
    import datetime

    root = str(tmp_path / "tinc")
    t = TxLogTable.create(
        root,
        spark.range(0, 100).selectExpr(
            "id AS k",
            "CAST(date_add(DATE'2024-01-01', CAST(id % 4 AS INT)) "
            "AS STRING) AS d",
        ),
        partition_by=["d"],
        stat_cols=["k"],
    )
    lo = datetime.date(2024, 1, 2)
    # date bounds against string-logged partition values: incomparable
    # in the range branch -> every file kept, read succeeds
    got = t.read(spark, prune={"d": (lo, None)})
    assert got.count() == 100
    # membership with a date against string zone maps on a data column
    got2 = t.read(spark, prune={"k": [datetime.date(2024, 1, 1)]})
    assert got2.count() == 100
    # sane types still prune (the guard must not disable pruning)
    full_files = len(t.read(spark).inputFiles())
    pruned = t.read(spark, prune={"d": ["2024-01-03"]})
    assert len(pruned.inputFiles()) < full_files
    assert pruned.filter("d = '2024-01-03'").count() == 25


def _dv_rows(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS k", "CAST(id * 2 AS DOUBLE) AS x"
    )


def test_delete_where_dv_merge_on_read(spark, tmp_path):
    """delete_where(mode='dv') — merge-on-read deletion vectors
    (VERDICT r8 #3): the commit writes NO data file and removes none
    (files-rewritten == 0), every logical read anti-applies the
    vector, content equals the same delete in CoW mode, repeated
    vectors accumulate without re-deleting, and time travel still sees
    the pre-delete snapshot."""
    root_dv = str(tmp_path / "dv")
    root_cow = str(tmp_path / "cow")
    for r in (root_dv, root_cow):
        t = TxLogTable.create(r, _dv_rows(spark, 0, 100).repartition(4))
        t.append(_dv_rows(spark, 100, 200).repartition(4), spark)
    tdv, tcow = TxLogTable(root_dv), TxLogTable(root_cow)

    files_before = set(tdv.live_files())
    v = tdv.delete_where(spark, "k % 10 = 3", mode="dv")
    assert v == 2
    # files untouched: no rewrite, no remove, no add
    assert set(tdv.live_files()) == files_before
    meta = tdv.commit_meta(v)
    assert not meta.get("add") and not meta.get("remove")
    assert meta["dv_rows"] == 20 and meta["op"] == "delete"

    tcow.delete_where(spark, "k % 10 = 3", mode="cow")
    got = sorted(map(tuple, tdv.read(spark).collect()))
    assert got == sorted(map(tuple, tcow.read(spark).collect()))
    assert len(got) == 180
    # time travel: pre-delete snapshot intact
    assert tdv.read(spark, 1).count() == 200

    # second vector unions with the first; re-deleting vectored rows
    # is a no-op (vector does not grow)
    v2 = tdv.delete_where(spark, "k < 5", mode="dv")
    assert tdv.read(spark).count() == 176  # only k in {0,1,2,4} newly gone
    assert sum(len(p) for p in tdv._replay_dvs().values()) == 24
    v3 = tdv.delete_where(spark, "k < 5", mode="dv")
    assert v3 == v2  # nothing newly matched -> no commit

    # no-match delete no-ops too
    assert tdv.delete_where(spark, "k > 1000000000", mode="dv") == v2

    # CoW UPDATE of vectored files must not resurrect deleted rows
    tdv.update_where(spark, {"x": "x + 1000"}, "k = 10")
    assert tdv.read(spark).filter("k IN (3, 13)").count() == 0
    assert tdv.read(spark).filter("k = 10").collect()[0]["x"] == 1020.0
    # the rewrite absorbed the rewritten files' vectors: every
    # remaining vector still points at a live file
    live_rel = {os.path.relpath(p, root_dv) for p in tdv.live_files()}
    assert set(tdv._replay_dvs()).issubset(live_rel)

    # compact absorbs ALL vectors back into data files
    n_before = tdv.read(spark).count()
    content = sorted(map(tuple, tdv.read(spark).collect()))
    tdv.compact(spark, target_files=2)
    assert tdv._replay_dvs() == {}
    assert sorted(map(tuple, tdv.read(spark).collect())) == content
    assert tdv.read(spark).count() == n_before

    # max_dv_rows guard points at CoW
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mode='cow'"):
        tdv.delete_where(spark, "k >= 0", mode="dv", max_dv_rows=10)


def test_dv_restore_vacuum_and_change_feed(spark, tmp_path):
    """DV state composes with the rest of the lifecycle: RESTORE
    across a vector commit restores content in both directions
    (dv_snapshot replay), VACUUM's checkpoint carries vectors past log
    truncation, and the change feed emits the vector delete as D
    rows."""
    root = str(tmp_path / "t")
    t = TxLogTable.create(root, _dv_rows(spark, 0, 50).repartition(2))
    t.append(_dv_rows(spark, 50, 100).repartition(2), spark)  # v1
    v_dv = t.delete_where(spark, "k < 10", mode="dv")  # v2
    assert t.read(spark).count() == 90

    # change feed over the vector commit: 10 pure deletes
    feed = t.change_feed(spark, keys=["k"], from_version=v_dv)
    assert feed.filter("op = 'D'").count() == 10
    assert feed.filter("op != 'D'").count() == 0

    # restore BACK before the vector: content is the full table again
    t.restore(version=1)  # v3
    assert t.read(spark).count() == 100
    # restore FORWARD to the vector version: vector state reapplies
    t.restore(version=v_dv)  # v4
    assert t.read(spark).count() == 90
    assert t.read(spark).filter("k < 10").count() == 0

    # vacuum truncates the log below the cutoff; the checkpoint at the
    # cutoff must carry the vectors
    for i in range(5):
        t.append(_dv_rows(spark, 100 + i * 10, 110 + i * 10), spark)
    t.vacuum(retain_versions=2, min_age_s=0.0)
    assert t._replay_dvs() != {}
    assert t.read(spark).filter("k < 10").count() == 0
    assert t.read(spark).count() == 140


def test_bloom_file_index_point_lookups(spark, tmp_path):
    """Per-file Bloom index (VERDICT r8 #6): zone maps prune ranges
    but admit EVERY file on a high-cardinality equality probe over an
    unclustered column (each file's [min,max] spans the domain). With
    bloom_cols, an equality/IN prune consults the per-file filter:
    strict file subset, result parity, never a false negative; absorbed
    commits (append/compact/CoW rewrite) harvest blooms for their new
    files; checkpoints carry the index past VACUUM."""
    root = str(tmp_path / "t")
    # UNCLUSTERED: hash-partitioned so every file spans the key domain
    base = (
        spark.range(0, 20000)
        .selectExpr("id AS k", "CAST(id % 97 AS DOUBLE) AS x")
        .repartition(16, "k")
    )
    t = TxLogTable.create(root, base, stat_cols=["k"], bloom_cols=["k"])
    n_all = len(t.read(spark).inputFiles())
    assert n_all == 16

    # zone maps alone are blind here: every file spans [0, 20000)
    # (bloom_rejects is what shrinks the list); equality via (v, v)
    # range and via IN-list both probe the index
    import random

    rnd = random.Random(7)
    for probe in [rnd.randrange(20000) for _ in range(10)]:
        got = t.read(spark, prune={"k": (probe, probe)})
        n = len(got.inputFiles())
        assert n < n_all, f"bloom did not prune for k={probe}"
        # no false negative: the row is in the kept subset
        assert got.filter(f"k = {probe}").count() == 1
    got = t.read(spark, prune={"k": [3, 19999]})
    assert len(got.inputFiles()) < n_all
    assert got.filter("k IN (3, 19999)").count() == 2

    # absent values: typically prunes everything (FP rate applies);
    # parity holds regardless
    miss = t.read(spark, prune={"k": (777777, 777777)})
    assert miss.filter("k = 777777").count() == 0

    # appends harvest blooms for their files too
    t.append(
        spark.range(100000, 101000).selectExpr(
            "id AS k", "CAST(0.0 AS DOUBLE) AS x"
        ).repartition(2, "k"),
        spark,
    )
    got2 = t.read(spark, prune={"k": (100500, 100500)})
    assert len(got2.inputFiles()) <= 3  # old files bloom-pruned
    assert got2.filter("k = 100500").count() == 1

    # pushFilters consults the index through format("txlog")
    from etl_sendas_spark.sources.txlog_source import register_txlog_source

    register_txlog_source(spark)
    full = spark.read.format("txlog").load(root)
    # file skipping from pushed filters is opt-in (engine-side scan
    # reuse makes it unsafe on reused DataFrames — see pushFilters)
    sel = (
        spark.read.format("txlog")
        .option("manifestPruning", "true")
        .load(root)
        .filter("k = 12345")
    )
    assert (
        sel._jdf.rdd().getNumPartitions()
        < full._jdf.rdd().getNumPartitions()
    )
    assert sel.count() == 1

    # compact re-harvests; vacuum's checkpoint carries the index
    t.compact(spark, target_files=4)
    t.vacuum(retain_versions=1, min_age_s=0.0)
    assert t._replay_blooms() != {}
    got3 = t.read(spark, prune={"k": (12345, 12345)})
    assert len(got3.inputFiles()) < 4 + 1
    assert got3.filter("k = 12345").count() == 1

    # measured FP behavior, documented: count files kept for absent
    # probes (expected ~ n_files * (1 - e^{-kn/m})^k; with n=1250/file,
    # m=63*1024 bits, k=3 -> ~0.04% per file)
    kept = sum(
        len(
            t.read(
                spark, prune={"k": (probe + 10**9, probe + 10**9)}
            ).inputFiles()
        )
        for probe in [rnd.randrange(10**9) for _ in range(20)]
    )
    assert kept <= 4  # 20 absent probes x 4-5 files: FPs are rare


def test_bin_pack_rewrites_only_small_files(spark, tmp_path):
    """Incremental OPTIMIZE (round 9): bin_pack rewrites only
    sub-threshold files — right-sized files stay live BY PATH (the
    scale property: cost tracks the debris, not the table) — packs
    within partition values, absorbs the packed files' deletion
    vectors, and preserves content exactly."""
    root = str(tmp_path / "t")
    # one big file + a trickle of small appends (streaming-sink shape)
    big = spark.range(0, 200000).selectExpr(
        "id AS k", "repeat(uuid(), 8) AS pad"
    ).coalesce(1)
    t = TxLogTable.create(root, big)
    big_files = set(t.live_files())
    for i in range(6):
        t.append(
            spark.range(200000 + i * 10, 200000 + i * 10 + 10).selectExpr(
                "id AS k", "repeat(uuid(), 8) AS pad"
            ).coalesce(1),
            spark,
        )
    # a vector on one small file, absorbed by the pack
    t.delete_where(spark, "k = 200001", mode="dv")
    n_live = len(t.live_files())
    content = sorted(r["k"] for r in t.read(spark).collect())

    v = t.bin_pack(spark, target_mb=8)
    assert v == t.latest_version()
    live_after = set(t.live_files())
    assert big_files <= live_after, "right-sized file must stay by path"
    assert len(live_after) < n_live
    assert sorted(r["k"] for r in t.read(spark).collect()) == content
    assert t._replay_dvs() == {}  # packed files' vectors absorbed
    # idempotent: nothing small left in numbers worth packing
    assert t.bin_pack(spark, target_mb=8) == v

    # partitioned: packs within partition values only
    root2 = str(tmp_path / "tp")
    t2 = TxLogTable.create(
        root2,
        spark.range(0, 40).selectExpr("id AS k", "CAST(id % 2 AS INT) AS p"),
        partition_by=["p"],
    )
    for i in range(4):
        t2.append(
            spark.range(40 + i, 41 + i).selectExpr(
                "id AS k", "CAST(id % 2 AS INT) AS p"
            ),
            spark,
        )
    before = sorted((r["k"], r["p"]) for r in t2.read(spark).collect())
    t2.bin_pack(spark, target_mb=64)
    after = sorted((r["k"], r["p"]) for r in t2.read(spark).collect())
    assert after == before
    # every live file still lives under exactly one p=value dir
    for f in t2.live_files():
        assert "/p=" in f


def test_update_where_dv_merge_on_read(spark, tmp_path):
    """update_where(mode='dv'): one commit vectors the pre-images and
    appends files holding ONLY the post-update rows — prior live files
    untouched by path, content parity with the same update in CoW
    mode, standard UPDATE semantics (assignments see old values), and
    the change feed shows position-exact D plus the appended I."""
    root_dv = str(tmp_path / "dv")
    root_cow = str(tmp_path / "cow")
    for r in (root_dv, root_cow):
        TxLogTable.create(r, _dv_rows(spark, 0, 1000).repartition(4))
    tdv, tcow = TxLogTable(root_dv), TxLogTable(root_cow)

    before = set(tdv.live_files())
    v = tdv.update_where(
        spark, {"x": "x + k", "k": "k + 100000"}, "k % 100 = 7",
        mode="dv",
    )
    after = set(tdv.live_files())
    assert before <= after, "dv update must not remove files"
    added = after - before
    assert added, "dv update appends post-image files"
    meta = tdv.commit_meta(v)
    assert meta["dv_rows"] == 10 and meta["add"]

    tcow.update_where(
        spark, {"x": "x + k", "k": "k + 100000"}, "k % 100 = 7",
    )
    assert sorted(map(tuple, tdv.read(spark).collect())) == sorted(
        map(tuple, tcow.read(spark).collect())
    )
    # assignments saw the OLD k (x = old_x + old_k, k moved after)
    row = tdv.read(spark).filter("k = 100007").collect()[0]
    assert row["x"] == 7 * 2.0 + 7

    # change feed: 10 D (pre-images) + 10 I (post-images)
    feed = tdv.change_feed(spark, keys=["k"], from_version=v)
    assert feed.filter("op = 'D'").count() == 10
    assert feed.filter("op = 'I'").count() == 10

    # no-match and guard behave like the dv delete
    assert tdv.update_where(
        spark, {"x": "0.0"}, "k > 2000000000", mode="dv"
    ) == v
    with pytest.raises(ValueError, match="mode='cow'"):
        tdv.update_where(
            spark, {"x": "0.0"}, "k >= 0", mode="dv", max_dv_rows=5
        )

    # compact absorbs the update's vectors too
    tdv.compact(spark, target_files=2)
    assert tdv._replay_dvs() == {}
    assert sorted(map(tuple, tdv.read(spark).collect())) == sorted(
        map(tuple, tcow.read(spark).collect())
    )


def test_merge_into_delete_when_arm(spark, tmp_path):
    """WHEN MATCHED AND cond THEN DELETE (round 9): one merge commit
    updates, inserts, AND deletes — source rows satisfying delete_when
    remove their matches and never insert; composes with update mode
    only; extra metadata rides the same commit."""
    import pytest
    from pyspark.sql import functions as F

    from etl_sendas_spark.sources.txlog import TxLogTable

    root = str(tmp_path / "t")
    t = TxLogTable.create(
        root,
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30)], "k LONG, n LONG"
        ),
    )
    src = spark.createDataFrame(
        [(2, 25), (3, 0), (4, 40), (5, 0)], "k LONG, n LONG"
    )
    v = t.merge_into(
        spark, src, ["k"], delete_when="n = 0", extra={"wm": 7}
    )
    got = sorted(map(tuple, t.read(spark).collect()))
    # k=1 untouched, k=2 updated, k=3 deleted, k=4 inserted,
    # k=5 delete-flagged + unmatched -> nothing
    assert got == [(1, 10), (2, 25), (4, 40)]
    assert int(t.commit_meta(v)["wm"]) == 7

    with pytest.raises(ValueError, match="delete_when"):
        t.merge_into(
            spark, src, ["k"], when_matched="delete", delete_when="n = 0"
        )


def test_replace_where_partition_backfill(spark, tmp_path):
    """replaceWhere (round 9): a partition backfill swaps exactly the
    matching rows in ONE commit — discovery prunes to the partition's
    files (remove-set strictly under its hive dir), non-matching rows
    of affected files survive, NULL-predicate rows are kept, and a df
    row outside the scope fails loudly before anything commits."""
    import pytest
    from pyspark.sql import functions as F

    from etl_sendas_spark.sources.txlog import TxLogTable

    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "ab"[i % 2], float(i)) for i in range(100)]
        + [(900, None, 0.5)],
        "k LONG, part STRING, v DOUBLE",
    )
    t = TxLogTable.create(
        root, df.repartition(4, "k"), partition_by=["part"]
    )

    new_b = spark.createDataFrame(
        [(1000 + i, "b", -1.0) for i in range(10)],
        "k LONG, part STRING, v DOUBLE",
    )
    v = t.replace_where(
        spark, new_b, "part = 'b'", prune={"part": ["b"]}
    )
    rec = t._read_commit(v)
    assert rec["op"] == "replace_where"
    assert rec["remove"] and all("part=b/" in f for f in rec["remove"])
    got = t.read(spark)
    assert got.filter(F.col("part") == "b").count() == 10
    assert got.filter((F.col("part") == "b") & (F.col("v") >= 0)).count() == 0
    assert got.filter(F.col("part") == "a").count() == 50  # untouched
    assert got.filter(F.col("part").isNull()).count() == 1  # NULL kept

    # scope-violation: a row outside the predicate fails loudly
    leak = spark.createDataFrame(
        [(1, "a", 0.0)], "k LONG, part STRING, v DOUBLE"
    )
    head = t.latest_version()
    with pytest.raises(ValueError, match="leak"):
        t.replace_where(spark, leak, "part = 'b'")
    assert t.latest_version() == head  # nothing committed

    # change feed of the backfill: D for every replaced row, I for new
    feed = t.change_feed(spark, keys=["k"], from_version=v, to_version=v)
    ops = {r["op"] for r in feed.collect()}
    assert ops == {"I", "D"}
    assert feed.filter((F.col("op") == "D") & (F.col("part") != "b")).count() == 0


def test_row_count_is_metadata_only_and_dml_exact(spark, tmp_path):
    """Stats-based COUNT(*) (round 9): row_count() equals the scanned
    count at every point of a DML ladder — create, append, CoW delete,
    dv delete (vector positions subtract), merge, compact, and time
    travel to every version — while reading zero data pages (pinned by
    deleting the data files' pages... structurally: the method takes
    no SparkSession at all)."""
    from pyspark.sql import functions as F

    from etl_sendas_spark.sources.txlog import TxLogTable

    root = str(tmp_path / "t")
    t = TxLogTable.create(
        root,
        spark.range(1000).selectExpr("id AS k", "id % 7 AS g"),
    )
    t.append(spark.range(1000, 1300).selectExpr("id AS k", "id % 7 AS g"), spark)
    t.delete_where(spark, "k % 10 = 3")
    t.delete_where(spark, "k % 17 = 5", mode="dv")
    t.merge_into(
        spark,
        spark.range(2000, 2050).selectExpr("id AS k", "id % 7 AS g"),
        ["k"],
    )
    t.compact(spark, target_files=2)
    for v in t.versions():
        assert t.row_count(v) == t.read(spark, v).count(), f"v{v}"


def test_merge_into_delete_when_null_falls_through_to_update(spark, tmp_path):
    """Delta NULL semantics for the delete arm (round-10 ADVICE fix):
    a source row whose delete_when predicate evaluates to NULL is NOT
    a delete — it falls through to the update arm and replaces its
    matched target row, rather than silently vanishing."""
    from etl_sendas_spark.sources.txlog import TxLogTable

    root = str(tmp_path / "t")
    t = TxLogTable.create(
        root,
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30)], "k LONG, n LONG"
        ),
    )
    # n NULL for k=2 -> predicate "n = 0" is NULL -> update, not delete
    src = spark.createDataFrame(
        [(2, None), (3, 0)], "k LONG, n LONG"
    )
    t.merge_into(spark, src, ["k"], delete_when="n = 0")
    got = sorted(
        (r["k"], r["n"]) for r in t.read(spark).collect()
    )
    # k=1 untouched, k=2 UPDATED to NULL (not lost), k=3 deleted
    assert got == [(1, 10), (2, None)]


def test_merge_into_insert_heavy_keeps_source_parallelism(spark, tmp_path):
    """An insert-heavy merge touching zero existing files must not
    funnel the whole write through one task (round-10 ADVICE fix):
    the commit's add-set carries at least as many files as the source
    had non-empty partitions, up to the coalesce bound."""
    from etl_sendas_spark.sources.txlog import TxLogTable

    root = str(tmp_path / "t")
    t = TxLogTable.create(
        root, spark.createDataFrame([(0, 0)], "k LONG, n LONG")
    )
    src = (
        spark.range(1, 4001)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("n"))
        .repartition(4)
    )
    v = t.merge_into(spark, src, ["k"])
    adds = t._read_commit(v)["add"]
    assert len(adds) >= 4, (
        f"insert-heavy merge wrote {len(adds)} file(s); expected the "
        "source's 4 partitions to write in parallel"
    )
    assert t.read(spark).count() == 4001


def test_bloom_auto_sizing_and_sidecars_at_scale(spark, tmp_path):
    """Round-10 ×10 finding: a FIXED bloom spec saturates once files
    outgrow it (kn/m >> 1 -> FP -> 1 -> zero skipping). Filters are
    now auto-sized per file from the file's row count, big word maps
    go to _txlog/bloom/ sidecars with only {m,k,ref} in the commit,
    and vacuum GCs sidecars no retained version references."""
    import json as _json

    root = str(tmp_path / "tb")
    n = 200_000
    df = spark.range(n).selectExpr(
        "id AS event_id", "CAST(id % 997 AS BIGINT) AS user_id"
    ).repartition(4, "user_id")
    t = TxLogTable.create(
        root, df, stat_cols=["event_id"], bloom_cols=["event_id"]
    )

    # commit carries sidecar refs, not inline word maps
    blooms = t._read_commit(0)["blooms"]
    recs = [rec for colmap in blooms.values() for rec in colmap.values()]
    assert recs and all("ref" in r and "w" not in r for r in recs)
    assert all(int(r["m"]) > 1024 for r in recs), "auto-sizing inactive"
    ref_path = os.path.join(root, "_txlog", recs[0]["ref"])
    assert os.path.exists(ref_path)
    side = _json.load(open(ref_path))
    assert any("w" in c.get("event_id", {}) for c in side.values())

    # skipping works at this file size (the saturation regression)
    probes = [17, 50_017, 150_017]
    full = set(t.read(spark).inputFiles())
    pruned = set(t.read(spark, prune={"event_id": probes}).inputFiles())
    assert pruned < full and pruned
    got = sorted(
        r["event_id"]
        for r in t.read(spark, prune={"event_id": probes})
        .filter(F.col("event_id").isin(probes))
        .collect()
    )
    assert got == probes

    # overwrite, then vacuum: the old commit's sidecar is unreferenced
    # and GC'd (age guard zeroed), the new one survives
    t.overwrite(df.limit(10))
    v = t.latest_version()
    t.append(df.limit(5), spark)  # another commit so cutoff > 0
    import time as _time

    old_sidecars = set(os.listdir(os.path.join(root, "_txlog", "bloom")))
    t.vacuum(retain_versions=1, min_age_s=0.0)
    left = set(os.listdir(os.path.join(root, "_txlog", "bloom")))
    assert left < old_sidecars or not left, (
        "unreferenced sidecars must be GC'd"
    )
    # retained reads still prune through whatever sidecars remain
    t.read(spark, prune={"event_id": [1]}).count()


def test_partition_transforms_hidden_partitioning(spark, tmp_path):
    """Iceberg-style partition transforms (round 10): day(ts) +
    bucket(N, user_id) derive hive partition values at every write
    while staying OUT of the logical schema; predicates on the SOURCE
    columns prune at the manifest (range -> day range, equality ->
    bucket); DML, append, change feed, and compaction all re-derive
    and never leak the hidden columns; spec errors are loud."""
    root = str(tmp_path / "tp")
    ev = spark.createDataFrame(
        [
            (i, f"2024-01-{(i % 10) + 1:02d} 08:30:00", i % 50, float(i))
            for i in range(1000)
        ],
        "event_id LONG, ts STRING, user_id LONG, value DOUBLE",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "value"
    ).repartition(4)
    t = TxLogTable.create(
        root, ev, stat_cols=["event_id"],
        partition_by=["day(ts)", "bucket(8, user_id)"],
    )

    df = t.read(spark)
    assert sorted(df.columns) == ["event_id", "ts", "user_id", "value"]
    full = set(df.inputFiles())

    # range on the SOURCE column prunes to the matching day dirs
    pr = t.read(spark, prune={"ts": ("2024-01-03", "2024-01-05")})
    pf = set(pr.inputFiles())
    assert pf and pf < full
    for f in pf:
        assert any(f"ts_day=2024-01-0{d}" in f for d in (3, 4, 5)), f
    want = df.filter("ts >= '2024-01-03' AND ts < '2024-01-06'").count()
    assert pr.filter(
        "ts >= '2024-01-03' AND ts < '2024-01-06'"
    ).count() == want

    # equality on the bucket source prunes to one bucket's dirs
    pu = t.read(spark, prune={"user_id": [17]})
    uf = set(pu.inputFiles())
    assert uf and uf < full
    import hashlib as _h

    kb = int(_h.md5(b"17").hexdigest()[:15], 16) % 8
    for f in uf:
        assert f"user_id_bucket={kb}" in f, f
    assert pu.filter("user_id = 17").count() == df.filter(
        "user_id = 17"
    ).count()

    # DML + append + compact keep deriving; schema stays clean
    t.delete_where(spark, "user_id = 17")
    t.append(ev.filter("event_id < 7"), spark)
    t.compact(spark, target_files=4)
    out = t.read(spark)
    assert sorted(out.columns) == ["event_id", "ts", "user_id", "value"]
    assert out.filter("user_id = 17").count() == 0
    assert out.count() == 1000 - 20 + 7
    feed = t.change_feed(spark, keys=["event_id"], from_version=1, to_version=2)
    assert "ts_day" not in feed.columns

    # loud spec errors
    with pytest.raises(ValueError, match="unsupported partition transform"):
        TxLogTable.create(
            str(tmp_path / "bad1"), ev, partition_by=["century(ts)"]
        )
    with pytest.raises(ValueError, match="source columns"):
        TxLogTable.create(
            str(tmp_path / "bad2"), ev, partition_by=["day(nope)"]
        )
    with pytest.raises(ValueError, match="collide"):
        TxLogTable.create(
            str(tmp_path / "bad3"),
            ev.withColumn("ts_day", F.lit("x")),
            partition_by=["day(ts)"],
        )


def test_merge_when_not_matched_by_source_snapshot_sync(spark, tmp_path):
    """The full Delta merge grammar (round 10): merging a dimension's
    NEW SNAPSHOT with when_not_matched_by_source='delete' updates
    matched keys, inserts new ones, and drops vanished ones in ONE
    commit; composes with delete_when; refuses prune (scoped swaps
    are replace_where's job)."""
    root = str(tmp_path / "tsync")
    t = TxLogTable.create(
        root,
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k LONG, v STRING"
        ),
    )
    snap = spark.createDataFrame(
        [(2, "B"), (4, "d")], "k LONG, v STRING"
    )
    t.merge_into(
        spark, snap, ["k"], when_not_matched_by_source="delete"
    )
    got = sorted((r["k"], r["v"]) for r in t.read(spark).collect())
    assert got == [(2, "B"), (4, "d")]  # 1,3 dropped; 2 updated; 4 new

    with pytest.raises(ValueError, match="replace_where"):
        t.merge_into(
            spark, snap, ["k"],
            when_not_matched_by_source="delete", prune={"k": [1]},
        )
    with pytest.raises(ValueError, match="update"):
        t.merge_into(
            spark, snap, ["k"], when_matched="delete",
            when_not_matched_by_source="delete",
        )


# ---------------------------------------------------------------- r11
# Regression tests for the five round-10 ADVICE defects.


def test_merge_into_hidden_partitioned_table(spark, tmp_path):
    """ADVICE r10 (medium): merge_into repartitioned the replacement
    on _partition_cols(), which for a transform-partitioned table
    names hidden derived columns (ts_day) absent from the
    replacement -> unresolved-column error. Now it repartitions on
    the transform EXPRESSION over the source column."""
    root = str(tmp_path / "tmergehp")
    ev = spark.createDataFrame(
        [
            (i, f"2024-01-{(i % 5) + 1:02d} 08:30:00", float(i))
            for i in range(100)
        ],
        "event_id LONG, ts STRING, value DOUBLE",
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    t = TxLogTable.create(root, ev, partition_by=["day(ts)"])
    upd = t.read(spark).filter("event_id < 10").withColumn(
        "value", F.col("value") + 1000.0
    )
    ins = spark.createDataFrame(
        [(200, "2024-02-01 09:00:00", 7.0)],
        "event_id LONG, ts STRING, value DOUBLE",
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    t.merge_into(spark, upd.unionByName(ins), ["event_id"])
    out = t.read(spark)
    assert out.count() == 101
    assert out.filter("event_id < 10 AND value < 1000").count() == 0
    assert out.filter("event_id = 200").count() == 1
    # the derived dir keeps routing: new row landed under its day
    f = set(
        t.read(spark, prune={"ts": ("2024-02-01", "2024-02-01")})
        .inputFiles()
    )
    assert f and all("ts_day=2024-02-01" in p for p in f)
    assert sorted(out.columns) == ["event_id", "ts", "value"]


def test_transform_py_rejects_malformed_bounds(spark, tmp_path):
    """ADVICE r10 (medium): unpadded string bounds like '2024-1-5'
    were blindly sliced into lexicographically-broken derived bounds
    that silently excluded every day directory. Now strings parse via
    fromisoformat (None on failure keeps pruning advisory)."""
    from etl_sendas_spark.sources.txlog import _transform_py

    tr = {"name": "ts_day", "fn": "day", "src": "ts", "n": None}
    assert _transform_py(tr, "2024-01-05") == "2024-01-05"
    assert _transform_py(tr, "2024-01-05T08:30:00") == "2024-01-05"
    assert _transform_py(tr, "2024-1-5") is None
    assert _transform_py(tr, "not a date") is None
    trh = {"name": "ts_hour", "fn": "hour", "src": "ts", "n": None}
    assert _transform_py(trh, "2024-01-05 08:30:00") == "2024-01-05-08"

    # end-to-end: a malformed bound keeps every file (advisory), so
    # the filtered count is still exact
    root = str(tmp_path / "tmal")
    ev = spark.createDataFrame(
        [
            (i, f"2024-01-{(i % 5) + 1:02d} 08:30:00", float(i))
            for i in range(100)
        ],
        "event_id LONG, ts STRING, value DOUBLE",
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    t = TxLogTable.create(root, ev, partition_by=["day(ts)"])
    full = set(t.read(spark).inputFiles())
    pr = t.read(spark, prune={"ts": ("2024-1-2", "2024-1-4")})
    assert set(pr.inputFiles()) == full  # untranslatable -> no prune
    # well-formed bounds still prune
    pr2 = t.read(spark, prune={"ts": ("2024-01-02", "2024-01-04")})
    assert set(pr2.inputFiles()) < full


def test_sql_in_condition_escapes_backslashes(spark, tmp_path):
    """ADVICE r10 (low): a value ending in a backslash escaped the
    closing quote under escapedStringLiterals=false, changing the
    predicate's scope. Backslashes are now doubled."""
    from etl_sendas_spark.sources.txlog import sql_in_condition

    root = str(tmp_path / "tbsl")
    t = TxLogTable.create(
        root,
        spark.createDataFrame(
            [("a\\", 1), ("a", 2), ("b'c\\", 3), ("d", 4)],
            "doc_id STRING, n LONG",
        ),
    )
    cond = sql_in_condition("doc_id", ["a\\", "b'c\\"])
    t.delete_where(spark, cond)
    got = sorted(r["doc_id"] for r in t.read(spark).collect())
    assert got == ["a", "d"]


def test_merge_when_not_matched_by_source_update(spark, tmp_path):
    """Round-11: the other Delta by-source arm — target rows absent
    from the source get not_matched_by_source_set applied (soft
    delete) instead of dropping; matched rows update, new rows insert,
    all one commit. Composition rules mirror the delete arm."""
    root = str(tmp_path / "tsoft")
    t = TxLogTable.create(
        root,
        spark.createDataFrame(
            [(1, "a", True), (2, "b", True), (3, "c", True)],
            "k LONG, v STRING, active BOOLEAN",
        ),
    )
    snap = spark.createDataFrame(
        [(2, "B", True), (4, "d", True)], "k LONG, v STRING, active BOOLEAN"
    )
    v = t.merge_into(
        spark, snap, ["k"],
        when_not_matched_by_source="update",
        not_matched_by_source_set={"active": "false"},
    )
    got = sorted(
        (r["k"], r["v"], r["active"]) for r in t.read(spark).collect()
    )
    assert got == [
        (1, "a", False),  # vanished -> soft-deleted
        (2, "B", True),   # matched -> updated
        (3, "c", False),  # vanished -> soft-deleted
        (4, "d", True),   # new -> inserted
    ]
    assert v == t.latest_version()

    # composition rules mirrored from the delete arm
    with pytest.raises(ValueError, match="requires"):
        t.merge_into(spark, snap, ["k"], when_not_matched_by_source="update")
    with pytest.raises(ValueError, match="key columns"):
        t.merge_into(
            spark, snap, ["k"], when_not_matched_by_source="update",
            not_matched_by_source_set={"k": "k + 100"},
        )
    with pytest.raises(ValueError, match="unknown columns"):
        t.merge_into(
            spark, snap, ["k"], when_not_matched_by_source="update",
            not_matched_by_source_set={"nope": "1"},
        )
    with pytest.raises(ValueError, match="replace_where"):
        t.merge_into(
            spark, snap, ["k"], when_not_matched_by_source="update",
            not_matched_by_source_set={"active": "false"},
            prune={"k": [1]},
        )
    with pytest.raises(ValueError, match="update"):
        t.merge_into(
            spark, snap, ["k"], when_matched="delete",
            when_not_matched_by_source="update",
            not_matched_by_source_set={"active": "false"},
        )
    with pytest.raises(ValueError, match="requires"):
        t.merge_into(
            spark, snap, ["k"],
            not_matched_by_source_set={"active": "false"},
        )

    # SET expression can reference the target row itself
    snap2 = spark.createDataFrame(
        [(2, "B2", True)], "k LONG, v STRING, active BOOLEAN"
    )
    t.merge_into(
        spark, snap2, ["k"],
        when_not_matched_by_source="update",
        not_matched_by_source_set={"v": "concat(v, '!')", "active": "false"},
    )
    got = sorted(
        (r["k"], r["v"], r["active"]) for r in t.read(spark).collect()
    )
    assert got == [
        (1, "a!", False),
        (2, "B2", True),
        (3, "c!", False),
        (4, "d!", False),
    ]


def test_column_mapping_rename_is_metadata_only(spark, tmp_path):
    """Delta-style column mapping (VERDICT r10 #3): RENAME COLUMN is
    one JSON commit — ZERO data files rewritten (on 100 TB the rename
    costs nothing), time travel below the rename shows the OLD name,
    and zone-map + Bloom pruning keep working on the renamed column
    because stats stay keyed by the unchanged PHYSICAL name and prune
    specs translate through the mapping."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    df = spark.range(2000).select(
        F.col("id"),
        F.concat(F.lit("v"), F.col("id")).alias("txt"),
    ).repartition(4)
    t = TxLogTable.create(root, df, stat_cols=["id"], bloom_cols=["txt"])
    t.append(df.withColumn("id", F.col("id") + 2000), spark)
    files_before = sorted(t.live_files())

    v = t.rename_column("txt", "body")
    # metadata-only: the live file set is bit-identical
    assert sorted(t.live_files()) == files_before
    assert t.read(spark).columns == ["id", "body"]
    # time travel below the rename shows the old name
    assert t.read(spark, v - 1).columns == ["id", "txt"]
    # content unchanged under the new name (both appends carry v7)
    assert t.read(spark).filter(F.col("body") == "v7").count() == 2

    # zone maps prune by the NEW logical name (id untouched here,
    # body probes the bloom sidecars through the mapping)
    rel, stats, parts = t._replay(None)
    blooms = t._replay_blooms(None)
    kept = t._pruned_rel(rel, stats, parts, {"body": ["v7"]}, blooms=blooms)
    assert len(kept) < len(rel)
    kept2 = t._pruned_rel(rel, stats, parts, {"id": (100, 110)})
    assert len(kept2) < len(rel)

    # appends and DML speak the new name; files stay physical
    t.append(
        spark.range(5).select(
            (F.col("id") + 9000).alias("id"),
            F.lit("fresh").alias("body"),
        ),
        spark,
    )
    t.update_where(spark, {"body": "'patched'"}, "id = 3")
    t.delete_where(spark, "id = 4")
    got = t.read(spark)
    assert got.filter(F.col("body") == "patched").count() == 1
    assert got.filter(F.col("id") == 4).count() == 0
    assert got.filter(F.col("body") == "fresh").count() == 5
    # physical name in the files is still the original
    import pyarrow.parquet as pq

    newest = sorted(t.live_files())[-1]
    cols_in_file = set(pq.ParquetFile(newest).schema_arrow.names)
    assert "txt" in cols_in_file and "body" not in cols_in_file

    # refusals: partition columns are layout-bearing
    root2 = str(tmp_path / "tp")
    t2 = TxLogTable.create(
        root2,
        spark.range(20).selectExpr("id", "CAST(id % 2 AS INT) AS p"),
        partition_by=["p"],
    )
    with pytest.raises(ValueError, match="partition"):
        t2.rename_column("p", "q")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("id", "body")
    with pytest.raises(ValueError, match="physical"):
        t.rename_column("id", "txt")  # collides with retained physical


def test_column_mapping_drop_and_readd(spark, tmp_path):
    """DROP COLUMN is metadata-only (the physical column retires in
    place — reads project it away, old snapshots still show it), and
    re-adding the same logical name via merge_schema gets a FRESH
    physical so the dropped column's dead bytes can never resurrect
    under the new name."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    t = TxLogTable.create(
        root,
        spark.range(100).selectExpr(
            "id", "id % 7 AS k", "concat('v', id) AS body"
        ),
    )
    files_before = sorted(t.live_files())
    v_drop = t.drop_column("k")
    assert sorted(t.live_files()) == files_before
    assert t.read(spark).columns == ["id", "body"]
    # time travel below the drop still shows the column
    assert "k" in t.read(spark, v_drop - 1).columns

    # re-add the same logical name: fresh physical, NULL history
    t.append(
        spark.range(3).selectExpr(
            "id + 500 AS id", "'x' AS body", "CAST(9 AS BIGINT) AS k"
        ),
        spark,
        merge_schema=True,
    )
    got = t.read(spark)
    assert got.filter((F.col("id") < 500) & F.col("k").isNotNull()).count() == 0
    assert got.filter(F.col("k") == 9).count() == 3
    m = t._column_mapping()
    assert m["map"]["k"] != "k" and "k" in m["retired"]

    # change feed over the whole ladder speaks the END schema
    cf = t.change_feed(spark, keys=["id"], from_version=0)
    assert set(cf.columns) >= {"id", "body", "k", "op", "_commit_version"}
    assert cf.filter("op = 'I'").count() >= 103

    # compaction rewrites only live logical columns (dead bytes gone)
    t.compact(spark)
    import pyarrow.parquet as pq

    for f in t.live_files():
        names = set(pq.ParquetFile(f).schema_arrow.names)
        assert "k" not in names  # retired physical absorbed
    # guard-rails
    with pytest.raises(ValueError, match="only column"):
        TxLogTable.create(
            str(tmp_path / "one"), spark.range(3)
        ).drop_column("id")


def test_column_mapping_native_source_parity(spark, tmp_path):
    """The format('txlog') native reader returns the SAME schema and
    rows as TxLogTable.read on a column-mapped table (renamed +
    dropped + re-added columns), and the native writer lands frames
    with logical names as physical file columns."""
    from pyspark.sql import functions as F

    from etl_sendas_spark.sources.txlog_source import (
        register_txlog_source,
    )

    register_txlog_source(spark)
    root = str(tmp_path / "t")
    t = TxLogTable.create(
        root,
        spark.range(50).selectExpr(
            "id", "id % 5 AS k", "concat('v', id) AS body0"
        ),
    )
    t.rename_column("body0", "body")
    t.drop_column("k")
    t.append(
        spark.range(4).selectExpr(
            "id + 100 AS id", "'n' AS body", "CAST(1 AS BIGINT) AS k"
        ),
        spark,
        merge_schema=True,
    )
    want = t.read(spark)
    got = spark.read.format("txlog").load(root)
    assert got.columns == want.columns
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # native writer: logical frame → physical file columns
    spark.createDataFrame(
        [(200, "w", 2)], "id LONG, body STRING, k LONG"
    ).write.format("txlog").mode("append").save(root)
    after = t.read(spark)
    assert after.filter(
        (F.col("id") == 200) & (F.col("body") == "w") & (F.col("k") == 2)
    ).count() == 1


def test_native_source_pushdown_state_never_leaks(spark, tmp_path):
    """Regression (round 11): Spark 4.1's Python-DataSource planning
    caches the last planned scan per loaded DataFrame and reuses it
    for filter-less re-queries WITHOUT re-entering Python — so
    manifest pruning from pushed filters must be opt-in, or a
    .filter() probe followed by a full scan of the SAME DataFrame
    silently drops the pruned files' rows (measured before the fix).
    Default: full row set survives any query order; opt-in load:
    fewer planned partitions under a filter."""
    from etl_sendas_spark.sources.txlog_source import (
        register_txlog_source,
    )

    register_txlog_source(spark)
    root = str(tmp_path / "t")
    TxLogTable.create(
        root,
        spark.range(4000)
        .selectExpr("id AS k", "id * 2 AS x")
        .repartitionByRange(8, "k")
        .sortWithinPartitions("k"),
        stat_cols=["k"],
    )
    df = spark.read.format("txlog").load(root)
    assert df.count() == 4000
    assert df.filter("k < 500").count() == 500  # would prune if opted in
    # the poisoning sequence: full scan AFTER the filtered action
    assert df.count() == 4000
    assert len(df.collect()) == 4000

    # opt-in load prunes planned partitions under a filter
    opt = (
        spark.read.format("txlog")
        .option("manifestPruning", "true")
        .load(root)
    )
    full_parts = df._jdf.rdd().getNumPartitions()
    sel_parts = (
        opt.filter("k BETWEEN 100 AND 199")._jdf.rdd().getNumPartitions()
    )
    assert sel_parts < full_parts
    assert opt.filter("k BETWEEN 100 AND 199").count() == 100

    # round 12: the default is VERSION-GATED (opt-in on the
    # scan-cache-buggy <=4.1 line, default-on from 4.2 — see
    # docs/spark_python_dsv2_scan_cache.md). This test runs the
    # poisoning sequence above UNDER THE DEFAULT, so on a 4.2+ engine
    # that still reuses stale scans it fails loudly instead of losing
    # rows. Pin that the gate and the resolved default agree, and
    # that an explicit option overrides the gate in both directions.
    import pyspark

    from etl_sendas_spark.sources.txlog_source import (
        _TxLogBatchReader,
        _engine_replans_filterless,
    )

    gate = _engine_replans_filterless()
    assert gate == (
        tuple(int(x) for x in pyspark.__version__.split(".")[:2])
        >= (4, 2)
    )
    assert _TxLogBatchReader({"path": root}).pruning is gate
    assert _TxLogBatchReader(
        {"path": root, "manifestpruning": "false"}
    ).pruning is False
    assert _TxLogBatchReader(
        {"path": root, "manifestpruning": "true"}
    ).pruning is True


def test_catalog_multi_table_transaction(spark, tmp_path):
    """Catalog (VERDICT r10 #4): {table → version} pins published as
    ONE atomic record; a reader resolving pins once cannot see
    cross-table skew no matter how table commits interleave; the
    conditional publish (CAS on the catalog head) makes racing
    publishers lose loudly instead of overwriting each other."""
    from etl_sendas_spark.sources.txlog import Catalog, CommitConflict

    a_root = str(tmp_path / "a")
    b_root = str(tmp_path / "b")
    ta = TxLogTable.create(a_root, spark.range(10).selectExpr("id", "id AS va"))
    tb = TxLogTable.create(b_root, spark.range(10).selectExpr("id", "id AS vb"))
    cat = Catalog(str(tmp_path / "_catalog"))
    v0 = cat.publish({"a": 0, "b": 0}, expected=-1)
    assert v0 == 0 and cat.pins() == {"a": 0, "b": 0}

    # writer advances table a but crashes before publishing: the new
    # commit is INVISIBLE through the catalog (no torn (1, 0) read)
    ta.append(spark.range(5).selectExpr("id + 10 AS id", "id AS va"), spark)
    snap = cat.snapshot(spark, {"a": a_root, "b": b_root})
    assert snap["a"].count() == 10 and snap["b"].count() == 10

    # redelivery finishes table b and publishes BOTH moves atomically
    vb = tb.append(
        spark.range(5).selectExpr("id + 10 AS id", "id AS vb"), spark
    )
    cat.publish({"a": 1, "b": vb}, expected=0)
    snap2 = cat.snapshot(spark, {"a": a_root, "b": b_root})
    assert snap2["a"].count() == 15 and snap2["b"].count() == 15

    # partial publish merges over previous pins
    ta.append(spark.range(1).selectExpr("id + 99 AS id", "id AS va"), spark)
    cat.publish({"a": 2})
    assert cat.pins() == {"a": 2, "b": vb}
    # historical pin view (time travel over the catalog itself)
    assert cat.pins(version=0) == {"a": 0, "b": 0}

    # CAS: stale expected head loses loudly
    with pytest.raises(CommitConflict, match="expected head"):
        cat.publish({"a": 0}, expected=0)
    # unpinned table fails loudly instead of reading its head
    with pytest.raises(KeyError, match="no pin"):
        cat.snapshot(spark, {"zzz": a_root})


def test_column_mapping_survives_vacuum_and_merge(spark, tmp_path):
    """The mapping record rides checkpoints, so VACUUM's log
    truncation below the rename cannot lose it (reads after vacuum
    still map physicals to the current logical names); merge_into
    speaks the post-rename logical schema end to end."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    t = TxLogTable.create(
        root,
        spark.range(60).selectExpr("id AS k", "concat('v', id) AS txt"),
    )
    t.rename_column("txt", "body")
    # MERGE under the new name: update one, insert one
    t.merge_into(
        spark,
        spark.createDataFrame(
            [(5, "merged"), (999, "inserted")], "k LONG, body STRING"
        ),
        ["k"],
    )
    got = t.read(spark)
    assert got.filter(F.col("body") == "merged").count() == 1
    assert got.filter(F.col("k") == 999).count() == 1

    # push the log past a checkpoint, then truncate below the rename
    for i in range(12):
        t.append(
            spark.range(1).selectExpr(
                f"CAST(2000 + {i} AS BIGINT) AS k", "'x' AS body"
            ),
            spark,
        )
    t.vacuum(retain_versions=2, min_age_s=0.0)
    assert not os.path.exists(_commit_path(root, 0))  # log truncated
    after = t.read(spark)
    assert after.columns == ["k", "body"]
    assert after.filter(F.col("body") == "merged").count() == 1
    m = t._column_mapping()
    assert m is not None and m["map"]["body"] == "txt"


def test_type_widening_is_metadata_only(spark, tmp_path):
    """Delta-style type widening (round 11): int->bigint and
    float->double are metadata-only commits — zero files rewritten,
    old files upcast on read through the explicit wide schema, time
    travel below the widen shows the narrow type, zone maps keep
    pruning, DML and compaction work across mixed-width files, and
    the native reader returns the widened schema with identical
    rows. Narrowing and lossy pairs refuse."""
    from etl_sendas_spark.sources.txlog_source import (
        register_txlog_source,
    )

    root = str(tmp_path / "t")
    df = spark.range(50).select(
        F.col("id").cast("int").alias("k"),
        F.rand(7).cast("float").alias("x"),
        F.concat(F.lit("v"), F.col("id")).alias("s"),
    )
    t = TxLogTable.create(root, df, stat_cols=["k"])
    files0 = sorted(t.live_files())
    v1 = t.widen_column("k", "bigint")
    t.widen_column("x", "double")
    assert sorted(t.live_files()) == files0
    cur = t.read(spark)
    assert {
        f.name: f.dataType.simpleString() for f in cur.schema.fields
    } == {"k": "bigint", "x": "double", "s": "string"}
    old = t.read(spark, v1 - 1)
    assert [f.dataType.simpleString() for f in old.schema.fields] == [
        "int", "float", "string",
    ]

    # wide append + DML across mixed-width files
    t.append(
        spark.range(5).select(
            (F.col("id") + 100).alias("k"),
            F.lit(1.25).alias("x"),
            F.lit("new").alias("s"),
        ),
        spark,
    )
    t.update_where(spark, {"s": "'patched'"}, "k = 3")
    t.delete_where(spark, "k = 4")
    got = t.read(spark)
    assert got.filter("s = 'patched'").count() == 1
    assert got.filter("k = 4").count() == 0

    # zone maps prune across the widen
    rel, stats, parts = t._replay(None)
    assert len(t._pruned_rel(rel, stats, parts, {"k": (100, 200)})) < len(rel)

    for bad in [("k", "int"), ("s", "bigint"), ("x", "float")]:
        with pytest.raises(ValueError):
            t.widen_column(*bad)

    # native parity + widen/rename composition + compaction
    register_txlog_source(spark)
    nd = spark.read.format("txlog").load(root)
    assert nd.schema["k"].dataType.simpleString() == "bigint"
    assert sorted((r.k, r.s) for r in nd.select("k", "s").collect()) == sorted(
        (r.k, r.s) for r in got.select("k", "s").collect()
    )
    t.rename_column("k", "key")
    assert t.read(spark).schema["key"].dataType.simpleString() == "bigint"
    pre = sorted((r.key, r.s) for r in t.read(spark).select("key", "s").collect())
    t.compact(spark)
    assert sorted(
        (r.key, r.s) for r in t.read(spark).select("key", "s").collect()
    ) == pre
    # the widen survives checkpoint + vacuum truncation
    for i in range(12):
        t.append(
            spark.range(1).selectExpr(
                f"CAST(900 + {i} AS BIGINT) AS key",
                "CAST(0.5 AS DOUBLE) AS x", "'z' AS s",
            ),
            spark,
        )
    t.vacuum(retain_versions=2, min_age_s=0.0)
    assert t._widened() is True
    assert t.read(spark).schema["key"].dataType.simpleString() == "bigint"


def test_merge_schema_append_refuses_concurrent_rename(spark, tmp_path):
    """A merge-schema append carries a schema record computed BEFORE
    its commit claim; a rename landing in between would be silently
    REVERTED by that stale record. The append's retry loop must detect
    the intervening schema commit and raise CommitConflict instead —
    and the rename must survive."""
    root = str(tmp_path / "t")
    t = TxLogTable.create(
        root, spark.range(20).selectExpr("id AS k", "concat('v', id) AS s")
    )
    wide = spark.range(3).selectExpr(
        "id + 100 AS k", "concat('n', id) AS s", "CAST(1 AS BIGINT) AS extra"
    )

    orig = TxLogTable._try_commit
    injected = [False]

    def racing(self, version, payload):
        if (
            payload.get("op") == "append"
            and "schema" in payload
            and not injected[0]
        ):
            injected[0] = True
            # a second writer renames between the append's schema
            # computation and its claim (separate handle, original
            # commit path so the injection does not recurse)
            TxLogTable._try_commit = orig
            try:
                TxLogTable(self.root).rename_column("s", "body")
            finally:
                TxLogTable._try_commit = racing
        return orig(self, version, payload)

    TxLogTable._try_commit = racing
    try:
        with pytest.raises(CommitConflict, match="schema change"):
            t.append(wide, spark, merge_schema=True)
    finally:
        TxLogTable._try_commit = orig

    # the rename survived; the table is consistent and re-runnable
    t2 = TxLogTable(root)
    assert t2.read(spark).columns == ["k", "body"]
    t2.append(
        spark.range(3).selectExpr(
            "id + 100 AS k", "concat('n', id) AS body",
            "CAST(1 AS BIGINT) AS extra",
        ),
        spark,
        merge_schema=True,
    )
    got = t2.read(spark)
    assert set(got.columns) == {"k", "body", "extra"}
    assert got.filter("extra = 1").count() == 3


def test_catalog_checkpoint_bounds_resolution_reads(tmp_path, monkeypatch):
    """Round-12 (VERDICT r11 #3): the Catalog checkpoints its merged
    pin view every CHECKPOINT_INTERVAL publishes, so pins() replays
    checkpoint + tail — a 1000-publish catalog resolves from a
    bounded number of JSON record reads (spied via MetaLog.read), not
    O(#publishes); vacuum() truncates below the newest checkpoint and
    resolution below the horizon raises loudly."""
    from etl_sendas_spark.sources.txlog import Catalog, MetaLog

    cat = Catalog(str(tmp_path / "_catalog"))
    n_pub = 1000
    for i in range(n_pub):
        cat.publish({f"t{i % 7}": i})
    head = cat.versions()[-1]
    assert head == n_pub - 1

    # ground truth: merged view over the whole history
    want = {}
    for i in range(n_pub):
        want[f"t{i % 7}"] = i
    want = {k: want[k] for k in want}

    reads: list[int] = []
    real_read = MetaLog.read

    def spy(self, version):
        reads.append(version)
        return real_read(self, version)

    monkeypatch.setattr(MetaLog, "read", spy)
    got = cat.pins()
    assert got == want
    # hint read (1) + checkpoint (1) + tail (< interval): bounded,
    # independent of the 1000-record history
    assert len(reads) <= Catalog.CHECKPOINT_INTERVAL + 2, reads

    # historical resolution below the newest checkpoint also bounded:
    # arithmetic ladder finds the nearest lower checkpoint
    reads.clear()
    mid = 555
    got_mid = cat.pins(version=mid)
    assert got_mid["t0"] == max(i for i in range(mid + 1) if i % 7 == 0)
    assert len(reads) <= 2 * Catalog.CHECKPOINT_INTERVAL + 4, reads
    monkeypatch.undo()

    # CAS publishes checkpoint too (the enrichment rides both paths)
    ck_rec = cat.read((head // Catalog.CHECKPOINT_INTERVAL)
                      * Catalog.CHECKPOINT_INTERVAL)
    assert ck_rec.get("ckpt") is True
    assert len(ck_rec["pins"]) == 7  # full merged view, not the delta

    # vacuum: everything below the newest checkpoint goes; pins()
    # unchanged; resolution below the horizon raises loudly
    removed = cat.vacuum()
    assert removed and min(cat.versions()) % Catalog.CHECKPOINT_INTERVAL == 0
    assert cat.pins() == want
    with pytest.raises(ValueError, match="vacuum horizon"):
        cat.pins(version=3)


def test_catalog_checkpoint_cas_path_and_pre_checkpoint_catalogs(tmp_path):
    """The CAS publish path writes the same checkpoint enrichment as
    blind appends, and a catalog written before checkpoints existed
    (records only, no ckpt flags, no hint) still resolves correctly
    through the arithmetic-fallback scan."""
    import json as _json
    import os as _os

    from etl_sendas_spark.sources.txlog import Catalog

    cat = Catalog(str(tmp_path / "_cas"))
    cat.publish({"a": 0}, expected=-1)
    for i in range(1, 12):
        cat.publish({"a": i}, expected=i - 1)
    rec10 = cat.read(10)
    assert rec10.get("ckpt") is True and rec10["pins"] == {"a": 10}
    assert cat.pins() == {"a": 11}

    # legacy catalog: hand-written records, no checkpoints, no hint
    legacy = Catalog(str(tmp_path / "_legacy"))
    _os.makedirs(legacy.root)
    for i in range(25):
        with open(legacy._path(i), "w") as f:
            _json.dump({"version": i, "pins": {"x": i}}, f)
    assert legacy.pins() == {"x": 24}
    assert legacy.pins(version=7) == {"x": 7}
    assert legacy.vacuum() == []  # no checkpoint -> no-op


def test_type_widening_decimal_and_date(spark, tmp_path):
    """Round-12 lattice extension (VERDICT r11 #4): decimal precision
    growth at the same scale and date->timestamp_ntz are metadata-only
    widenings — zero files rewritten, mixed-width files upcast on
    read, time travel below the widen shows the narrow types, the
    native reader agrees, DML works across the widths. The near-miss
    pairs refuse FINALLY with the reason in the error: decimal scale
    change (Bloom restringification), date->timestamp LTZ (no zone to
    interpret the stored day), and date->timestamp_ntz on a
    Bloom-indexed column."""
    from etl_sendas_spark.sources.txlog_source import (
        register_txlog_source,
    )

    root = str(tmp_path / "t")
    df = spark.sql(
        "SELECT CAST(id AS INT) AS k, "
        "CAST(id + 0.25 AS DECIMAL(10,2)) AS d, "
        "DATE_ADD(DATE'2024-01-01', CAST(id AS INT)) AS dt, "
        "concat('v', id) AS s FROM range(40)"
    )
    t = TxLogTable.create(root, df, stat_cols=["k"])
    files0 = sorted(t.live_files())
    v1 = t.widen_column("d", "decimal(14, 2)")  # space-tolerant
    t.widen_column("dt", "timestamp_ntz")
    assert sorted(t.live_files()) == files0  # zero rewrites
    cur = t.read(spark)
    types = {f.name: f.dataType.simpleString() for f in cur.schema.fields}
    assert types["d"] == "decimal(14,2)" and types["dt"] == "timestamp_ntz"
    # values upcast losslessly: the date reads as its midnight
    row = cur.filter("k = 3").collect()[0]
    assert str(row.d) == "3.25"
    assert row.dt.isoformat() == "2024-01-04T00:00:00"
    # time travel below the widen: narrow types
    old = t.read(spark, v1 - 1)
    otypes = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    assert otypes["d"] == "decimal(10,2)" and otypes["dt"] == "date"

    # wide append beyond the old precision + sub-day timestamps,
    # then DML across mixed-width files
    t.append(
        spark.sql(
            "SELECT CAST(1000 AS INT) AS k, "
            "CAST(123456789012.50 AS DECIMAL(14,2)) AS d, "
            "TIMESTAMP_NTZ'2025-06-01 12:34:56' AS dt, 'wide' AS s"
        ),
        spark,
    )
    t.update_where(spark, {"s": "'patched'"}, "k = 7")
    t.delete_where(spark, "k = 8")
    got = t.read(spark)
    assert got.count() == 40  # 40 + 1 - 1
    wide = got.filter("k = 1000").collect()[0]
    assert str(wide.d) == "123456789012.50"
    assert wide.dt.isoformat() == "2025-06-01T12:34:56"
    assert got.filter("s = 'patched'").count() == 1

    # native reader parity over the mixed files
    register_txlog_source(spark)
    nd = spark.read.format("txlog").load(root)
    ntypes = {f.name: f.dataType.simpleString() for f in nd.schema.fields}
    assert ntypes["d"] == "decimal(14,2)" and ntypes["dt"] == "timestamp_ntz"
    assert sorted((r.k, str(r.d), r.dt.isoformat()) for r in
                  nd.select("k", "d", "dt").collect()) == sorted(
        (r.k, str(r.d), r.dt.isoformat()) for r in
        got.select("k", "d", "dt").collect()
    )

    # FINAL refusals, each with its reason in the message
    with pytest.raises(ValueError, match="SCALE"):
        t.widen_column("d", "decimal(20,4)")
    with pytest.raises(ValueError, match="precision"):
        t.widen_column("d", "decimal(12,2)")  # narrower than current 14
    with pytest.raises(ValueError, match="decimal\\(38\\)"):
        t.widen_column("d", "decimal(40,2)")
    with pytest.raises(ValueError, match="LTZ"):
        TxLogTable.create(
            str(tmp_path / "ltz"),
            spark.sql("SELECT DATE'2024-01-01' AS dt"),
        ).widen_column("dt", "timestamp")

    # Bloom-indexed date column refuses date->timestamp_ntz
    # (restringification would false-skip old files' sidecars)
    tb = TxLogTable.create(
        str(tmp_path / "bl"),
        spark.sql(
            "SELECT DATE_ADD(DATE'2024-01-01', CAST(id AS INT)) AS dt, "
            "id FROM range(10)"
        ),
        bloom_cols=["dt"],
    )
    with pytest.raises(ValueError, match="Bloom-indexed"):
        tb.widen_column("dt", "timestamp_ntz")

    # decimal widening on a Bloom-indexed column is FINE at the same
    # scale (stringified form is width-invariant) — and the sidecar
    # still prunes correctly after the widen
    tc = TxLogTable.create(
        str(tmp_path / "bd"),
        spark.sql(
            "SELECT CAST(id + 0.25 AS DECIMAL(10,2)) AS d, id "
            "FROM range(10)"
        ),
        bloom_cols=["d"],
    )
    tc.widen_column("d", "decimal(16,2)")
    assert tc.read(spark).schema["d"].dataType.simpleString() == "decimal(16,2)"


def test_rename_of_partition_transform_source(spark, tmp_path):
    """Round-12 (VERDICT r11 #8): renaming a partition TRANSFORM's
    source column is a pure metadata commit — the hive paths carry the
    DERIVED name (ts_day), and the spec's src is the PHYSICAL name
    (immutable), so no spec rewrite is needed: writes derive transform
    values AFTER the logical->physical select, and prune specs
    translate to physical BEFORE the transform expansion. Pins:
    zero-rewrite rename, post-rename append routed to the right hive
    dirs, pruning by the NEW logical name, replace_where's transform
    repartition on a logical frame, time travel below the rename, and
    the surviving refusals (drop/widen of the source, plain partition
    columns)."""
    root = str(tmp_path / "tp")
    ev = spark.createDataFrame(
        [
            (i, f"2024-01-{(i % 10) + 1:02d} 08:30:00", i % 50, float(i))
            for i in range(500)
        ],
        "event_id LONG, ts STRING, user_id LONG, value DOUBLE",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "value"
    ).repartition(4)
    t = TxLogTable.create(
        root, ev, stat_cols=["event_id"],
        partition_by=["day(ts)", "bucket(8, user_id)"],
    )
    full0 = sorted(t.live_files())

    v = t.rename_column("ts", "event_ts")
    assert sorted(t.live_files()) == full0  # zero rewrites
    c = t.commit_meta(v)
    assert not c.get("add") and not c.get("remove")
    assert "ts" in t.read(spark, v - 1).columns  # time travel: old name
    assert sorted(t.read(spark).columns) == [
        "event_id", "event_ts", "user_id", "value",
    ]

    # post-rename append (logical name) derives the SAME hive layout
    extra = spark.createDataFrame(
        [(9001, "2024-01-03 09:00:00", 17, 1.0)],
        "event_id LONG, event_ts STRING, user_id LONG, value DOUBLE",
    ).selectExpr(
        "event_id", "CAST(event_ts AS TIMESTAMP) AS event_ts",
        "user_id", "value",
    )
    t.append(extra, spark)
    newest = sorted(t.live_files(), key=lambda p: os.path.getmtime(p))[-1]
    assert "ts_day=2024-01-03" in newest  # derived name unchanged
    import hashlib as _h

    kb = int(_h.md5(b"17").hexdigest()[:15], 16) % 8
    assert f"user_id_bucket={kb}" in newest

    # pruning by the NEW logical name routes through the transform
    df = t.read(spark)
    full = set(df.inputFiles())
    pr = t.read(spark, prune={"event_ts": ("2024-01-03", "2024-01-03")})
    pf = set(pr.inputFiles())
    assert pf and pf < full
    for f in pf:
        assert "ts_day=2024-01-03" in f, f

    # replace_where repartitions the (logical) replacement frame by
    # the transform expr — the physical->logical translation site
    repl = df.filter("user_id = 17").withColumn("value", F.lit(0.0))
    t.replace_where(spark, repl, "user_id = 17")
    got = t.read(spark)
    assert got.filter("user_id = 17 AND value <> 0.0").count() == 0
    assert got.filter("user_id = 17").count() == df.filter(
        "user_id = 17"
    ).count()

    # DML under the renamed source keeps deriving
    t.delete_where(spark, "event_ts >= '2024-01-10'")
    assert t.read(spark).filter("event_ts >= '2024-01-10'").count() == 0

    # surviving refusals: drop/widen of the source (by its NEW name),
    # rename of a plain partition column elsewhere
    with pytest.raises(ValueError, match="transform's source"):
        t.drop_column("event_ts")
    with pytest.raises(ValueError, match="transform's source"):
        t.widen_column("event_ts", "timestamp_ntz")


def test_zone_maps_on_date_decimal_columns(spark, tmp_path):
    """Round-12: date/decimal stat columns previously CRASHED the
    commit harvest (pyarrow cannot convert INT32/INT64-backed decimal
    stats — recovered from the raw unscaled ints — and date bounds are
    not JSON-serializable — stored as ISO strings, coerced back at
    prune time). Pins: create works, pruning by Decimal / date /
    ISO-string probes skips files and never loses rows, timestamp
    stat cols degrade to no-stats (INT96 footers) instead of crashing,
    and the decimal zone map keeps pruning after a precision widen."""
    import datetime
    from decimal import Decimal

    root = str(tmp_path / "t")
    df = spark.sql(
        "SELECT CAST(id AS INT) AS k, "
        "CAST(id + 0.25 AS DECIMAL(10,2)) AS d, "
        "DATE_ADD(DATE'2024-01-01', CAST(id AS INT)) AS dt, "
        "TIMESTAMP'2024-01-01 00:00:00' "
        "  + make_interval(0,0,0,0,CAST(id AS INT),0,0) AS ts "
        "FROM range(400)"
    ).repartitionByRange(8, "k").sortWithinPartitions("k")
    t = TxLogTable.create(root, df, stat_cols=["d", "dt", "ts"])
    rel, stats, parts = t._replay(None)
    assert len(rel) == 8
    # bounds landed JSON-safe and exact
    some = next(iter(stats.values()))
    assert isinstance(some["d"][0], str) and isinstance(some["dt"][0], str)

    # Decimal range probe prunes, and the pruned read loses no rows
    pruned = t._pruned_rel(
        rel, stats, parts, {"d": (Decimal("100.00"), Decimal("149.99"))}
    )
    assert 0 < len(pruned) < len(rel)
    got = t.read(
        spark, prune={"d": (Decimal("100.00"), Decimal("149.99"))}
    ).filter("d BETWEEN 100.00 AND 149.99")
    assert got.count() == 50

    # date probe (typed) and ISO-string probe both prune
    lo, hi = datetime.date(2024, 3, 1), datetime.date(2024, 3, 10)
    p_date = t._pruned_rel(rel, stats, parts, {"dt": (lo, hi)})
    p_str = t._pruned_rel(
        rel, stats, parts, {"dt": ("2024-03-01", "2024-03-10")}
    )
    assert 0 < len(p_date) < len(rel) and p_date == p_str
    assert t.read(spark, prune={"dt": (lo, hi)}).filter(
        "dt BETWEEN '2024-03-01' AND '2024-03-10'"
    ).count() == 10

    # membership probe on dates
    p_in = t._pruned_rel(
        rel, stats, parts, {"dt": [datetime.date(2024, 2, 1)]}
    )
    assert 0 < len(p_in) < len(rel)

    # timestamp column: INT96 footers carry no usable stats — the
    # harvest records nothing and a ts probe keeps every file (safe)
    if "ts" not in some:
        p_ts = t._pruned_rel(
            rel, stats, parts,
            {"ts": (datetime.datetime(2024, 1, 1), None)},
        )
        assert p_ts == rel

    # decimal zone map keeps pruning across a precision widen
    t.widen_column("d", "decimal(14,2)")
    rel2, stats2, parts2 = t._replay(None)
    p2 = t._pruned_rel(
        rel2, stats2, parts2,
        {"d": (Decimal("100.00"), Decimal("149.99"))},
    )
    assert 0 < len(p2) < len(rel2)

    # garbage probe type against the string bounds: kept, not crashed
    assert t._pruned_rel(
        rel2, stats2, parts2, {"dt": (object(), None)}
    ) == rel2


def test_shallow_clone_zero_copy(spark, tmp_path):
    """Round-12 SHALLOW CLONE: version 0 of the clone references the
    source's live files absolutely — zero data copied — and the clone
    then evolves independently: append, CoW DML (rewrites land under
    the clone, the external reference is removed by its absolute
    path — the _logref law), compact materializes the clone fully,
    and the clone's vacuum never deletes source files. Cloned
    metadata: schema, zone maps (pruning works through external
    refs), deletion vectors, bloom sidecars, stat cols."""
    src_root = str(tmp_path / "src")
    df = spark.range(400).selectExpr(
        "id AS k", "id * 2 AS x", "concat('v', id) AS s"
    ).repartitionByRange(4, "k").sortWithinPartitions("k")
    src = TxLogTable.create(
        src_root, df, stat_cols=["k"], bloom_cols=["s"]
    )
    src.delete_where(spark, "k = 7", mode="dv")  # a DV to inherit

    clone_root = str(tmp_path / "clone")
    cl = src.clone(clone_root)

    # zero copy: no data files under the clone
    assert not os.path.isdir(os.path.join(clone_root, "data")) or not any(
        f.endswith(".parquet")
        for _, _, fs in os.walk(os.path.join(clone_root, "data"))
        for f in fs
    )
    got = cl.read(spark)
    assert got.count() == 399  # DV inherited
    assert got.filter("k = 7").count() == 0
    assert sorted(got.columns) == ["k", "s", "x"]

    # zone maps prune through external refs; bloom sidecars resolve
    rel, stats, parts = cl._replay(None)
    assert all(os.path.isabs(p) for p in rel)
    pruned = cl._pruned_rel(rel, stats, parts, {"k": (0, 50)})
    assert 0 < len(pruned) < len(rel)
    b = cl._pruned_rel(
        rel, stats, parts, {"s": ["v123"]},
        blooms=cl._replay_blooms(None),
    )
    assert 0 < len(b) < len(rel)

    # independent evolution: append + CoW update on the clone
    cl.append(
        spark.createDataFrame([(9001, 2, "new")], "k LONG, x LONG, s STRING"),
        spark,
    )
    cl.update_where(spark, {"s": "'patched'"}, "k = 100")
    got2 = cl.read(spark)
    assert got2.count() == 400  # 399 + 1
    assert got2.filter("s = 'patched'").count() == 1
    # no duplicate rows: the external file's absolute ref was removed
    assert got2.filter("k = 100").count() == 1
    # source untouched by the clone's DML
    sgot = src.read(spark)
    assert sgot.filter("s = 'patched'").count() == 0
    assert sgot.count() == 399

    # source evolves independently of the clone
    src.delete_where(spark, "k < 200")
    assert cl.read(spark).filter("k < 100").count() > 0

    # compact fully materializes: no external refs remain, rows equal
    before = sorted(map(tuple, cl.read(spark).collect()))
    cl.compact(spark)
    rel3, _, _ = cl._replay(None)
    assert all(not os.path.isabs(p) for p in rel3)
    assert sorted(map(tuple, cl.read(spark).collect())) == before

    # clone's vacuum never deleted source files (source still reads
    # its full post-delete content: 399 - 199 rows with k in 0..199)
    cl.vacuum(retain_versions=1, min_age_s=0.0)
    assert TxLogTable(src_root).read(spark).count() == 200

    # refusal: clone onto an existing table
    with pytest.raises(FileExistsError):
        src.clone(clone_root)


def test_shallow_clone_partitioned_table(spark, tmp_path):
    """Clone of a hidden-partitioned table: the partitioned scan
    groups external absolute refs by their SOURCE commit dir (the
    basePath ancestor), partition values re-attach, source-column
    pruning routes through the transform, and DML on the clone
    rewrites only the clone's files."""
    src_root = str(tmp_path / "src")
    ev = spark.createDataFrame(
        [
            (i, f"2024-01-{(i % 5) + 1:02d} 08:00:00", float(i))
            for i in range(300)
        ],
        "event_id LONG, ts STRING, value DOUBLE",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "value"
    ).repartition(3)
    src = TxLogTable.create(
        src_root, ev, stat_cols=["event_id"], partition_by=["day(ts)"]
    )
    cl = src.clone(str(tmp_path / "clone"))
    got = cl.read(spark)
    assert got.count() == 300
    assert sorted(got.columns) == ["event_id", "ts", "value"]

    # transform pruning through external refs
    full = set(got.inputFiles())
    pr = cl.read(spark, prune={"ts": ("2024-01-02", "2024-01-02")})
    pf = set(pr.inputFiles())
    assert pf and pf < full
    assert pr.filter(
        "ts >= '2024-01-02' AND ts < '2024-01-03'"
    ).count() == 60

    # CoW delete on the clone: source unchanged, clone correct
    cl.delete_where(spark, "event_id % 3 = 0")
    assert cl.read(spark).count() == 200
    assert src.read(spark).count() == 300


def test_type_widening_int_to_double_and_decimal(spark, tmp_path):
    """Round-12 lattice completion: int-family -> double and
    int-family -> decimal(p,0) are metadata-only widenings (Delta
    parity), with the minimum decimal precision following the PHYSICAL
    storage type (int32-stored needs p>=10, int64-stored p>=20 —
    probed against Spark 4.1's vectorized reader). bigint -> double
    refuses finally (past 2^53 rounds); int -> double refuses on a
    Bloom-indexed column ('5' vs '5.0' restringification); native
    reader upcasts both axes."""
    from etl_sendas_spark.sources.txlog_source import (
        register_txlog_source,
    )

    root = str(tmp_path / "t")
    df = spark.sql(
        "SELECT CAST(id AS INT) AS a, CAST(id AS INT) AS b, "
        "id AS l, concat('v', id) AS s FROM range(30)"
    )
    t = TxLogTable.create(root, df, stat_cols=["a"])
    files0 = sorted(t.live_files())
    t.widen_column("a", "double")
    t.widen_column("b", "decimal(12,0)")
    t.widen_column("l", "decimal(20,0)")
    assert sorted(t.live_files()) == files0
    types = {
        f.name: f.dataType.simpleString()
        for f in t.read(spark).schema.fields
    }
    assert types == {
        "a": "double", "b": "decimal(12,0)", "l": "decimal(20,0)",
        "s": "string",
    }
    row = t.read(spark).filter("b = 7").collect()[0]
    assert row.a == 7.0 and str(row.b) == "7" and str(row.l) == "7"

    # mixed-width append + DML + native parity
    t.append(
        spark.sql(
            "SELECT CAST(100.5 AS DOUBLE) AS a, "
            "CAST(123456789012 AS DECIMAL(12,0)) AS b, "
            "CAST(99999999999999999999 AS DECIMAL(20,0)) AS l, "
            "'wide' AS s"
        ),
        spark,
    )
    t.delete_where(spark, "s = 'v3'")
    assert t.read(spark).count() == 30
    register_txlog_source(spark)
    nd = spark.read.format("txlog").load(root)
    assert nd.schema["l"].dataType.simpleString() == "decimal(20,0)"
    assert sorted((r.a, str(r.b)) for r in nd.select("a", "b").collect()) == \
        sorted((r.a, str(r.b)) for r in t.read(spark).select("a", "b").collect())

    # refusals with reasons
    t2 = TxLogTable.create(
        str(tmp_path / "t2"),
        spark.sql("SELECT id AS l, CAST(id AS INT) AS i FROM range(5)"),
        bloom_cols=["i"],
    )
    with pytest.raises(ValueError, match="2\\^53"):
        t2.widen_column("l", "double")
    with pytest.raises(ValueError, match="precision >= 20"):
        t2.widen_column("l", "decimal(19,0)")
    with pytest.raises(ValueError, match="Bloom-indexed"):
        t2.widen_column("i", "double")
    with pytest.raises(ValueError, match="SCALE"):
        t2.widen_column("i", "decimal(12,2)")
    # int -> decimal(p,0) on a Bloom-indexed column is FINE: the
    # stringified form is width-invariant
    t2.widen_column("i", "decimal(10,0)")
    assert t2.read(spark).schema["i"].dataType.simpleString() == "decimal(10,0)"


def test_check_constraints(spark, tmp_path):
    """Round-12 Delta-style CHECK constraints: declared with a scan of
    existing rows (an already-violated invariant refuses), enforced on
    every write path (append, CoW update post-image) with SQL CHECK
    NULL semantics (NULL passes, only strict FALSE violates), one
    combined validation job for N constraints, checkpoint+vacuum
    survival, clone inheritance, and the rename/drop guard on
    referenced columns."""
    root = str(tmp_path / "t")
    t = TxLogTable.create(
        root,
        spark.sql(
            "SELECT id AS k, CAST(id * 2 AS DOUBLE) AS amt, "
            "CASE WHEN id % 5 = 0 THEN NULL "
            "ELSE concat('u', id) END AS who FROM range(50)"
        ),
    )
    t.add_constraint(spark, "amt_nonneg", "amt >= 0")
    t.add_constraint(spark, "k_range", "k < 1000000")
    assert sorted(t._constraints()) == ["amt_nonneg", "k_range"]

    # declaring over violating data refuses with the evidence
    with pytest.raises(ValueError, match="existing rows violate"):
        t.add_constraint(spark, "impossible", "k < 10")
    # duplicate name refuses
    with pytest.raises(ValueError, match="already"):
        t.add_constraint(spark, "k_range", "k < 5")

    # valid append passes; NULL result passes (SQL CHECK semantics)
    t.append(
        spark.sql(
            "SELECT CAST(1000 AS BIGINT) AS k, "
            "CAST(NULL AS DOUBLE) AS amt, 'x' AS who"
        ),
        spark,
    )
    assert t.read(spark).count() == 51

    # violating append fails loudly, named, and commits NOTHING
    head = t.latest_version()
    with pytest.raises(ValueError, match="amt_nonneg"):
        t.append(
            spark.sql(
                "SELECT CAST(2000 AS BIGINT) AS k, "
                "CAST(-5.0 AS DOUBLE) AS amt, 'y' AS who"
            ),
            spark,
        )
    assert t.latest_version() == head
    assert t.read(spark).filter("amt < 0").count() == 0

    # CoW update post-image validates too
    with pytest.raises(ValueError, match="amt_nonneg"):
        t.update_where(spark, {"amt": "-amt - 1"}, "k = 3")
    assert t.latest_version() == head

    # rename/drop of a referenced column refuses; unreferenced is fine
    with pytest.raises(ValueError, match="amt_nonneg"):
        t.rename_column("amt", "amount")
    with pytest.raises(ValueError, match="k_range"):
        t.drop_column("k")
    t.rename_column("who", "user_name")

    # constraints survive checkpoint + vacuum truncation
    for i in range(12):
        t.append(
            spark.sql(
                f"SELECT CAST(5000 + {i} AS BIGINT) AS k, "
                "CAST(1.0 AS DOUBLE) AS amt, 'z' AS user_name"
            ),
            spark,
        )
    t.vacuum(retain_versions=2, min_age_s=0.0)
    assert sorted(t._constraints()) == ["amt_nonneg", "k_range"]
    with pytest.raises(ValueError, match="amt_nonneg"):
        t.append(
            spark.sql(
                "SELECT CAST(1 AS BIGINT) AS k, "
                "CAST(-1.0 AS DOUBLE) AS amt, 'w' AS user_name"
            ),
            spark,
        )

    # clone inherits the constraint set; drop releases enforcement
    cl = t.clone(str(tmp_path / "clone"))
    assert sorted(cl._constraints()) == ["amt_nonneg", "k_range"]
    cl.drop_constraint("amt_nonneg")
    cl.append(
        spark.sql(
            "SELECT CAST(1 AS BIGINT) AS k, "
            "CAST(-1.0 AS DOUBLE) AS amt, 'w' AS user_name"
        ),
        spark,
    )
    assert cl.read(spark).filter("amt < 0").count() == 1
    # the source still enforces (clone divergence is metadata too)
    assert sorted(t._constraints()) == ["amt_nonneg", "k_range"]
    with pytest.raises(ValueError, match="no constraint"):
        cl.drop_constraint("amt_nonneg")


def test_null_count_zone_maps(spark, tmp_path):
    """Round-12 null zone maps (Delta's nullCount skipping): per-file
    null counts ride the stats map, PRUNE_IS_NULL drops zero-null
    files, PRUNE_NOT_NULL drops all-null files, unknown stays kept,
    results are exact vs the unpruned read, a hive NULL partition
    value acts as the exact all-null marker, and the native source
    pushes IsNull/IsNotNull when pruning is opted in."""
    from etl_sendas_spark.sources.txlog import (
        PRUNE_IS_NULL,
        PRUNE_NOT_NULL,
        TxLogTable,
    )
    from etl_sendas_spark.sources.txlog_source import (
        register_txlog_source,
    )

    root = str(tmp_path / "t")
    # 3 appends -> 3 file groups: all-null / no-null / mixed "opt"
    t = TxLogTable.create(
        root,
        spark.sql(
            "SELECT id AS k, CAST(NULL AS STRING) AS opt FROM range(100)"
        ).coalesce(1),
        stat_cols=["k", "opt"],
    )
    t.append(
        spark.sql(
            "SELECT id + 100 AS k, concat('v', id) AS opt "
            "FROM range(100)"
        ).coalesce(1),
        spark,
    )
    t.append(
        spark.sql(
            "SELECT id + 200 AS k, CASE WHEN id % 2 = 0 THEN 'x' END "
            "AS opt FROM range(100)"
        ).coalesce(1),
        spark,
    )
    rel, stats, parts = t._replay(None)
    assert len(rel) == 3
    nulls = sorted(s.get("opt__nulls") for s in stats.values())
    assert nulls == [0, 50, 100]

    pn = t._pruned_rel(rel, stats, parts, {"opt": PRUNE_NOT_NULL})
    assert len(pn) == 2  # all-null file dropped
    pi = t._pruned_rel(rel, stats, parts, {"opt": PRUNE_IS_NULL})
    assert len(pi) == 2  # zero-null file dropped
    # exactness: pruned read + row filter == unpruned read + filter
    got = t.read(spark, prune={"opt": PRUNE_NOT_NULL}).filter(
        "opt IS NOT NULL"
    )
    assert got.count() == 150
    assert t.read(spark, prune={"opt": PRUNE_IS_NULL}).filter(
        "opt IS NULL"
    ).count() == 150

    # hive NULL partition value = exact all-null marker
    proot = str(tmp_path / "p")
    pt = TxLogTable.create(
        proot,
        spark.sql(
            "SELECT id AS k, CASE WHEN id < 50 THEN 'a' END AS grp "
            "FROM range(100)"
        ),
        partition_by=["grp"],
    )
    prel, pstats, pparts = pt._replay(None)
    keep_nn = pt._pruned_rel(prel, pstats, pparts, {"grp": PRUNE_NOT_NULL})
    assert keep_nn and all(
        pparts[p].get("grp") != "__HIVE_DEFAULT_PARTITION__"
        for p in keep_nn
    )
    keep_in = pt._pruned_rel(prel, pstats, pparts, {"grp": PRUNE_IS_NULL})
    assert keep_in and all(
        pparts[p].get("grp") == "__HIVE_DEFAULT_PARTITION__"
        for p in keep_in
    )

    # native source: IsNotNull/IsNull prune planned partitions (opt-in)
    register_txlog_source(spark)
    opt_df = (
        spark.read.format("txlog")
        .option("manifestPruning", "true")
        .load(root)
    )
    full_parts = (
        spark.read.format("txlog").load(root)._jdf.rdd().getNumPartitions()
    )
    nn_parts = (
        opt_df.filter("opt IS NOT NULL")._jdf.rdd().getNumPartitions()
    )
    assert nn_parts < full_parts
    assert opt_df.filter("opt IS NOT NULL").count() == 150
    isn_parts = (
        spark.read.format("txlog")
        .option("manifestPruning", "true")
        .load(root)
        .filter("opt IS NULL")
        ._jdf.rdd()
        .getNumPartitions()
    )
    assert isn_parts < full_parts
