"""Operator inventory: named queries over the driver testdata tables.

Each entry maps one operator family from SURVEY.md §2 onto the
TPC-H-ish synthetic tables and pairs the Spark implementation with an
ANSI-SQL DuckDB oracle (see ``__spark_entry__.py``). Numeric outputs
follow one discipline so the order-insensitive value hash matches:

- exact where possible: sums of prices go through DECIMAL(18,6) so
  accumulation order cannot perturb low-order bits; counts stay BIGINT;
- otherwise both engines compute the identical double expression and
  round to a fixed scale (6 for ratios/cosines, 4 for averages);
- timestamps are emitted as formatted strings, never raw timestamps.

Every Spark query aliases its computed columns to the same names the
oracle uses (driver compares columns sorted by name).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.dates import edad_unidad, edad_valor, parse_js_timestamp
from ..functions.strings import split_full_name
from ..functions.text import (
    PII_PATTERNS,
    doc_fingerprint,
    lang_id,
    normalized_text,
    pii_counts,
    pii_redact,
    quality_features,
    repeated_ngram_ratio,
    token_count,
)
from ..operators.dedupe import (
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from ..operators.marking import capped_group_mark, gap_anchor_mark, sessionize
from ..operators.multimodal import extract_features
from ..operators.relational import first_flag, keep_first
from ..operators.sampling import stratified_sample
from ..operators.similarity import cosine_topk, ivf_cosine_topk, lsh_cosine_topk
from ..sources.readers import ROW_ID, load_fact_files
from .sendas_driver_query import SENDAS_FULL_SQL, sendas_full_pipeline
from .tpch import TPCH_ORACLES, TPCH_QUERIES


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.readers import read_table

    return read_table(spark, sf_dir, name)


def _dec_sum(col, scale: int = 6):
    """Order-insensitive exact sum: cast each term to DECIMAL, sum, back
    to double. DuckDB mirror: SUM(CAST(x AS DECIMAL(18,6)))::DOUBLE."""
    return F.sum(col.cast("decimal(18,6)")).cast("double")



# The inventory is split by era/family (round-6 item 9); this module
# owns the registries and the DRIVER_WINDOW literal, the inv_* parts
# own the query definitions. Star imports re-export every query
# function so `from .inventory import <query>` keeps working.
from .inv_relational import *  # noqa: E402,F401,F403
from .inv_corpus import *  # noqa: E402,F401,F403
# underscore helpers star-import skips but tests/tools import by name
from .inv_corpus import (  # noqa: E402,F401
    _BPE_PRETOK,
    _PACK_BUDGET,
    _stream_events,
)

# ===========================================================================
# registry
# ===========================================================================

# The driver's correctness gate checks exactly the 50 queries named in
# DRIVER_WINDOW (the single literal at the END of this module — the
# registries below are rebuilt from it at import time, so membership
# HERE is provisional). One window row per distinct operator machinery,
# every streaming/ANN/embedding/multimodal path included;
# near-duplicate variants whose machinery an in-window sibling already
# pins live in EXTRA_QUERIES — same oracle discipline, verified by
# tests/test_oracle_parity.py instead of the driver.
QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "a_grouping_sets_events": a_grouping_sets_events,
    "j9_update_then_merge": j9_update_then_merge,
    "p_filter_project": p_filter_project,
    "j_broadcast_enrich": j_broadcast_enrich,
    "j_anti_all_columns": j_anti_all_columns,
    "j_semi_membership": j_semi_membership,
    "d1_keep_first": d1_keep_first,
    "a4_first_flag": a4_first_flag,
    "u_union_dedup_files": u_union_dedup_files,
    "o_topk_per_group": o_topk_per_group,
    "a1_latest_partition": a1_latest_partition,
    "s1_excel_dim": s1_excel_dim,
    "s3_filename_partition": s3_filename_partition,
    "s5_sink_compact_roundtrip": s5_sink_compact_roundtrip,
    "f1_priority_pick": f1_priority_pick,
    "r2_dual_key_mark": r2_dual_key_mark,
    "w_window_frames": w_window_frames,
    "j_asof_events": j_asof_events,
    "j_range_bucketed": j_range_bucketed,
    "scalar_dates_ages": scalar_dates_ages,
    "scalar_name_split": scalar_name_split,
    "r1_capped_mark": r1_capped_mark,
    "r7_gap_mark": r7_gap_mark,
    "r4_invoice_zeroing": r4_invoice_zeroing,
    "sendas_full_pipeline": sendas_full_pipeline,
    "text_features": text_features,
    "sample_stratified_docs": sample_stratified_docs,
    "corpus_training_manifest": corpus_training_manifest,
    "pii_redact_docs": pii_redact_docs,
    "quality_repeated_ngrams": quality_repeated_ngrams,
    "scalar_bpe_tokens": scalar_bpe_tokens,
    "chunk_documents": chunk_documents,
    "dedup_exact_docs": dedup_exact_docs,
    "dedup_ngram_jaccard_docs": dedup_ngram_jaccard_docs,
    "dedup_minhash_lsh_docs": dedup_minhash_lsh_docs,
    "dedup_simhash_docs": dedup_simhash_docs,
    "dedup_cluster_docs": dedup_cluster_docs,
    "embedding_near_dup": embedding_near_dup,
    "embedding_near_dup_bucketed": embedding_near_dup_bucketed,
    "ann_cosine_topk": ann_cosine_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "pack_training_sequences": pack_training_sequences,
    "multimodal_features": multimodal_features,
    "streaming_tumbling_counts": streaming_tumbling_counts,
    "streaming_session_windows": streaming_session_windows,
    "streaming_gap_anchor_mark": streaming_gap_anchor_mark,
    "streaming_dedup_events": streaming_dedup_events,
    "streaming_enriched_counts": streaming_enriched_counts,
}

# Variants outside the driver window: machinery-redundant with an
# in-window sibling (noted per entry), still fully oracle-checked by
# tests/test_oracle_parity.py at every SF.
EXTRA_QUERIES = {
    "a_rollup_revenue": a_rollup_revenue,          # Expand agg → a_grouping_sets_events
    "a_exact_percentiles": a_exact_percentiles,    # agg-ext family → a_grouping_sets_events
    "a_pivot_revenue": a_pivot_revenue,            # agg-ext family → a_grouping_sets_events
    "o_global_topk": o_global_topk,                # TakeOrdered → o_topk_per_group + plan test
    "corpus_prep_pipeline": corpus_prep_pipeline,  # prefix of corpus_training_manifest
    "sessionize_events": sessionize_events,        # session windows → streaming_session_windows
    "d_keep_first_salted": d_keep_first_salted,    # keep-first → d1_keep_first + plan test
    "j_bucketed_colocated": j_bucketed_colocated,  # joins → j_broadcast_enrich + plan test
    "scalar_json_extract": scalar_json_extract,    # scalar fns → scalar_dates_ages/name_split
    "j9_update_by_row_id": j9_update_by_row_id,    # half of j9_update_then_merge
    "j_merge_upsert": j_merge_upsert,              # half of j9_update_then_merge
    "w_running_sum": w_running_sum,                # half of w_window_frames
    "w_trailing_range_sum": w_trailing_range_sum,  # half of w_window_frames
    "s5_partitioned_sink_roundtrip": s5_partitioned_sink_roundtrip,  # half of s5_sink_compact_roundtrip
    "s6_compact_roundtrip": s6_compact_roundtrip,  # half of s5_sink_compact_roundtrip
    "streaming_interval_join": streaming_interval_join,  # §2.10 ext beyond the driver window
    "j_snapshot_diff": j_snapshot_diff,  # CDC-generation ext beyond the driver window
    "ann_lsh_topk": ann_lsh_topk,  # scoring kernel → ann_cosine_topk; bucket join → embedding_near_dup_bucketed
    "streaming_sliding_counts": streaming_sliding_counts,  # windowed agg → streaming_tumbling_counts
    "multimodal_pointer_features": multimodal_pointer_features,  # blob-store pointer resolution ext
    "video_frame_sample": video_frame_sample,  # uncompressed-AVI frame sampling ext
    "sketch_distinct_kmv": sketch_distinct_kmv,  # mergeable KMV cardinality rollup (round 4)
    "quality_model_filter": quality_model_filter,  # linear quality classifier, IEEE-exact logit
    "quantize_embeddings_q8": quantize_embeddings_q8,  # int8 embedding quantization
    "s8_jsonl_roundtrip": s8_jsonl_roundtrip,  # JSONL interchange roundtrip
    "sample_temperature_mixture": sample_temperature_mixture,  # share^alpha corpus re-balancing
    "vocab_top_tokens": vocab_top_tokens,  # tokenizer-seed vocab induction
    "dedup_incremental_docs": dedup_incremental_docs,  # ingest-wave dedup vs fingerprint index
    "sample_stratified_exact_k": sample_stratified_exact_k,  # exact-k eval-set carving
    "sketch_corpus_overlap": sketch_corpus_overlap,  # KMV set algebra: corpus-vs-corpus overlap
    "streaming_distinct_users": streaming_distinct_users,  # chained stateful dedup -> windowed count
    "q5_local_supplier_revenue": q5_local_supplier_revenue,  # six-table join tree (TPC-H Q5 shape)
    "q17_small_quantity_revenue": q17_small_quantity_revenue,  # correlated subquery -> window decorrelation
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "a_grouping_sets_events": A_GROUPING_SETS_SQL,
    "j9_update_then_merge": J9_MERGE_CHAIN_SQL,
    "p_filter_project": P_FILTER_SQL,
    "j_broadcast_enrich": J_BROADCAST_SQL,
    "j_anti_all_columns": J_ANTI_SQL,
    "j_semi_membership": J_SEMI_SQL,
    "d1_keep_first": D1_SQL,
    "a4_first_flag": A4_SQL,
    "u_union_dedup_files": U_UNION_SQL,
    "o_topk_per_group": O_TOPK_SQL,
    "a1_latest_partition": A1_SQL,
    "s1_excel_dim": S1_EXCEL_SQL,
    "s3_filename_partition": S3_SQL,
    "s5_sink_compact_roundtrip": S5_SINK_COMPACT_SQL,
    "f1_priority_pick": F1_SQL,
    "r2_dual_key_mark": R2_SQL,
    "w_window_frames": W_FRAMES_SQL,
    "j_asof_events": J_ASOF_SQL,
    "j_range_bucketed": J_RANGE_SQL,
    "scalar_dates_ages": SCALAR_DATES_SQL,
    "scalar_name_split": SCALAR_NAME_SQL,
    "r1_capped_mark": R1_SQL,
    "r7_gap_mark": R7_SQL,
    "r4_invoice_zeroing": R4_SQL,
    "sendas_full_pipeline": SENDAS_FULL_SQL,
    "text_features": TEXT_FEATURES_SQL,
    "sample_stratified_docs": SAMPLE_STRATIFIED_SQL,
    "corpus_training_manifest": CORPUS_MANIFEST_SQL,
    "pii_redact_docs": PII_REDACT_SQL,
    "quality_repeated_ngrams": REPEATED_NGRAM_SQL,
    "scalar_bpe_tokens": SCALAR_BPE_SQL,
    "chunk_documents": CHUNK_DOCS_SQL,
    "dedup_exact_docs": DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard_docs": DEDUP_NGRAM_SQL,
    "dedup_minhash_lsh_docs": DEDUP_MINHASH_SQL,
    "dedup_simhash_docs": SIMHASH_SQL,
    "dedup_cluster_docs": DEDUP_CLUSTER_SQL,
    "embedding_near_dup": EMB_NEAR_DUP_SQL,
    "embedding_near_dup_bucketed": EMB_NEAR_DUP_BUCKETED_SQL,
    "ann_cosine_topk": ANN_TOPK_SQL,
    "ann_ivf_topk": ANN_IVF_SQL,
    "pack_training_sequences": PACK_SEQUENCES_SQL,
    "multimodal_features": MULTIMODAL_SQL,
    "streaming_tumbling_counts": STREAM_TUMBLING_SQL,
    "streaming_session_windows": STREAM_SESSION_SQL,
    "streaming_gap_anchor_mark": R7_SQL,
    "streaming_dedup_events": STREAM_DEDUP_SQL,
    "streaming_enriched_counts": STREAM_ENRICHED_SQL,
}

EXTRA_ORACLES = {
    "a_rollup_revenue": A_ROLLUP_SQL,
    "a_exact_percentiles": A_PCTL_SQL,
    "a_pivot_revenue": A_PIVOT_SQL,
    "o_global_topk": O_GLOBAL_TOPK_SQL,
    "corpus_prep_pipeline": CORPUS_PREP_SQL,
    "sessionize_events": SESSIONIZE_SQL,
    "d_keep_first_salted": D_SALTED_SQL,
    "j_bucketed_colocated": J_BUCKETED_SQL,
    "scalar_json_extract": SCALAR_JSON_SQL,
    "j9_update_by_row_id": J9_UPDATE_SQL,
    "j_merge_upsert": J_MERGE_SQL,
    "w_running_sum": W_RUNNING_SQL,
    "w_trailing_range_sum": W_TRAILING_RANGE_SQL,
    "s5_partitioned_sink_roundtrip": S5_SINK_SQL,
    "s6_compact_roundtrip": S6_COMPACT_SQL,
    "streaming_interval_join": STREAM_INTERVAL_JOIN_SQL,
    "j_snapshot_diff": J_SNAPSHOT_DIFF_SQL,
    "ann_lsh_topk": ANN_LSH_SQL,
    "streaming_sliding_counts": STREAM_SLIDING_SQL,
    "multimodal_pointer_features": MULTIMODAL_SQL,
    "video_frame_sample": VIDEO_FRAME_SQL,
    "sketch_distinct_kmv": SKETCH_KMV_SQL,
    "quality_model_filter": QUALITY_MODEL_SQL,
    "quantize_embeddings_q8": QUANTIZE_Q8_SQL,
    "s8_jsonl_roundtrip": S8_JSONL_SQL,
    "sample_temperature_mixture": SAMPLE_MIXTURE_SQL,
    "vocab_top_tokens": VOCAB_TOPK_SQL,
    "dedup_incremental_docs": DEDUP_INCREMENTAL_SQL,
    "sample_stratified_exact_k": SAMPLE_EXACT_K_SQL,
    "sketch_corpus_overlap": SKETCH_OVERLAP_SQL,
    "streaming_distinct_users": STREAM_DISTINCT_USERS_SQL,
    "q5_local_supplier_revenue": Q5_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
}

# TPC-H completion (plans/tpch.py): with q1/q3/q5/q17 above, all 22
# TPC-H shapes are implemented and oracle-paired — adapted to the
# testdata schema (no partsupp; see the module docstring).
EXTRA_QUERIES.update(TPCH_QUERIES)
EXTRA_ORACLES.update(TPCH_ORACLES)

# Corpus-hygiene ladder (plans/corpus_quality.py): eval-set
# decontamination, segment-level boilerplate dedup, Gopher rule panel.
from .corpus_quality import CORPUS_QUALITY_ORACLES, CORPUS_QUALITY_QUERIES  # noqa: E402

EXTRA_QUERIES.update(CORPUS_QUALITY_QUERIES)
EXTRA_ORACLES.update(CORPUS_QUALITY_ORACLES)


from . import inv_round4 as _inv_round4  # noqa: E402
from . import inv_round5 as _inv_round5  # noqa: E402
from . import inv_round6 as _inv_round6  # noqa: E402
from . import inv_round7 as _inv_round7  # noqa: E402
from . import inv_round8 as _inv_round8  # noqa: E402
from . import inv_round9 as _inv_round9  # noqa: E402
from . import inv_round10 as _inv_round10  # noqa: E402
from . import inv_round11 as _inv_round11  # noqa: E402
from . import inv_round12 as _inv_round12  # noqa: E402
from .inv_round4 import *  # noqa: E402,F401,F403
from .inv_round5 import *  # noqa: E402,F401,F403
from .inv_round6 import *  # noqa: E402,F401,F403
from .inv_round7 import *  # noqa: E402,F401,F403
from .inv_round8 import *  # noqa: E402,F401,F403
from .inv_round9 import *  # noqa: E402,F401,F403

EXTRA_QUERIES.update(_inv_round4.PART_QUERIES)
EXTRA_ORACLES.update(_inv_round4.PART_ORACLES)
EXTRA_QUERIES.update(_inv_round5.PART_QUERIES)
EXTRA_ORACLES.update(_inv_round5.PART_ORACLES)
EXTRA_QUERIES.update(_inv_round6.PART_QUERIES)
EXTRA_ORACLES.update(_inv_round6.PART_ORACLES)
EXTRA_QUERIES.update(_inv_round7.PART_QUERIES)
EXTRA_ORACLES.update(_inv_round7.PART_ORACLES)
EXTRA_QUERIES.update(_inv_round8.PART_QUERIES)
EXTRA_ORACLES.update(_inv_round8.PART_ORACLES)
EXTRA_QUERIES.update(_inv_round9.PART_QUERIES)
EXTRA_ORACLES.update(_inv_round9.PART_ORACLES)
EXTRA_QUERIES.update(_inv_round10.PART_QUERIES)
EXTRA_ORACLES.update(_inv_round10.PART_ORACLES)
EXTRA_QUERIES.update(_inv_round11.PART_QUERIES)
EXTRA_ORACLES.update(_inv_round11.PART_ORACLES)
EXTRA_QUERIES.update(_inv_round12.PART_QUERIES)
EXTRA_ORACLES.update(_inv_round12.PART_ORACLES)

# ===========================================================================
# driver window — SINGLE definition site
# ===========================================================================
# The driver's correctness gate checks exactly the queries in QUERIES;
# everything else holds the identical oracle bar in EXTRA_QUERIES via
# tests/test_oracle_parity.py. Earlier rounds rotated the window with
# sequential swap blocks, which made the effective window unauditable
# without executing the module (VERDICT r4 item 8) — the list below is
# now the one literal that decides membership. To rotate a query in or
# out, edit this list; the rebuild underneath repartitions the
# registries mechanically. Rationale for each past rotation lives in
# git history; the standing policy: one in-window row per distinct
# operator machinery, near-duplicate variants stay in EXTRA.
# Round-5 rotation: substring-span dedup, the PIT/SCD2 interval join,
# HITS, and MIN/MAX IVM enter (each is new machinery: global-first
# canonical spans, as-of≡interval equivalence, alternating mat-vec,
# affected-key recompute); j_semi_membership (window-flag semi-join
# pinned by r4_invoice_zeroing), a4_first_flag (first-flag pinned by
# f1_priority_pick + the pipeline), dedup_ngram_jaccard_docs
# (posting-join machinery pinned by fuzzy_match_part_names), and
# chunk_documents (array/window reshaping pinned by
# pack_training_sequences) hold the same oracle bar in EXTRA.
# Round-5 second-session rotation: dedup_semantic_docs (cluster-bounded
# pair generation — a third family no in-window row covers),
# j_bloom_prefilter (bit-level sketch membership, shuffle-free probe),
# and search_hybrid_rrf_docs (its oracle replays BOTH the full BM25
# pipeline and the brute-cosine kernel plus the rank fusion) enter;
# search_bm25_docs and ann_cosine_topk leave because hybrid's oracle
# contains each of them whole, and dedup_exact_docs leaves because the
# fingerprint-groupBy machinery is driver-pinned inside
# corpus_training_manifest's exact-dedup stage.
# Round-6 rotation (the r5 verdict's item 10 plus the new machinery):
# IN — search_hybrid_rrf_ivf_docs (the IVF index INSIDE the rank
# fusion; its oracle replays BM25 + centroid sample + cluster probing
# + fusion end-to-end), graph_triangle_counts (wedge-join O(m^1.5)
# machinery, nothing else covers it), a_association_rules
# (support/confidence/lift over pinned baskets), sample_group_split_docs
# (leakage-safe group-hash split), dq_psi_drift (binned-distribution
# drift). OUT, each still holding the identical oracle bar in EXTRA:
# search_hybrid_rrf_docs (the brute variant; BM25 + fusion stay
# driver-covered by the IVF variant, the brute-cosine kernel keeps its
# pytest parity row), graph_pagerank_entities (iterative mat-vec
# driver-pinned by graph_hits_entities), ivm_incremental_agg
# (incremental_agg_update driver-pinned inside streaming_matview_counts),
# r2_dual_key_mark (windowed first-flag machinery driver-pinned by
# f1_priority_pick and r1_capped_mark), sample_stratified_docs
# (per-stratum hash-rank sampling; the sampling family's driver row is
# now the group split, stratified keeps the pytest bar).
# Round-6 second-session rotation (new machinery from this session):
# IN — dedup_minhash_incremental_docs (wave-vs-index probe; its oracle
# and implementation contain the banded-LSH family + exact-Jaccard
# verification whole), a_heavy_hitters_events (Misra-Gries candidate
# pass + exact recount — no other row touches bounded-candidate
# aggregation), layout_zorder_events (Morton interleave + broadcast
# min/max scaling — the layout family's first row). OUT, each keeping
# the identical oracle bar in EXTRA: dedup_minhash_lsh_docs (batch
# banded LSH — the incremental row drives the same _band_buckets and
# verification machinery plus the probe), q3_shipping_priority (its
# dim join / agg / top-k machinery is driver-pinned by
# j_broadcast_enrich, q1_pricing_summary and o_topk_per_group),
# embedding_near_dup_bucketed (sign-LSH bucket join; embedding-space
# dedup stays driver-covered by dedup_semantic_docs, and the Hamming
# bucket machinery by multimodal_features' fingerprint path).
# Round-6 third-session rotation (new machinery from this session):
# IN — bpe_pair_counts_docs (the corpus→word-vocab reduction + symbol
# pair stats behind tokenizer training — no other row aggregates over
# exploded symbol arrays), geo_radius_join_events (spatial cell-bucket
# join; oracle is brute-force all-pairs, so the driver hash proves the
# grid expansion's recall), quality_entropy_docs (37-term
# length-difference counting — the one bit-identical float-summation
# oracle), dq_profile_events (stacked one-scan profile; modal
# min-over-struct tiebreak). OUT, each keeping the identical oracle bar
# in EXTRA: scalar_name_split (Arrow struct-scalar machinery
# driver-pinned inside multimodal_features' decode UDFs),
# s3_filename_partition (filename-derived columns driver-pinned inside
# u_union_dedup_files + a1_latest_partition), j_bloom_prefilter
# (bit-level sketch membership had its r5 driver outing; sketch-family
# coverage stays via a_heavy_hitters_events), dedup_segments_docs
# (line-level token reshaping driver-pinned by dedup_substring_spans_docs
# and pack_training_sequences; segment dedup keeps its pytest bar).
# Round-7 rotation (executes the r6 queue + gives the txlog its first
# driver outing): IN — txlog_time_travel_events (transaction-log table
# format: version replay, time travel, overwrite remove-sets, zone-map
# file pruning — the round-6 flagship surface had no driver row),
# langid_ngram_docs (trained-model rank-displacement scoring),
# a_exact_quantile_histogram (iterative value-domain selection; its
# ADVICE-flagged FP bucket-edge membership was fixed + boundary-planted
# test BEFORE rotating in). OUT, each keeping the identical oracle bar
# in EXTRA after a green r6 outing: quality_entropy_docs (bit-identical
# float-sum machinery; text-quality family stays driver-pinned by
# text_features + langid), a_heavy_hitters_events (bounded-candidate
# aggregation; sketch-family driver coverage moves to the exact
# quantile's histogram selection), layout_zorder_events (Morton
# interleave; the at-rest layout family's scale story — manifest-level
# file skipping — is now driver-hashed end-to-end inside
# txlog_time_travel_events, which asserts the pruned scan read fewer
# files). Streaming rows (5) and Sendas rule rows untouched per the
# keep-the-window-honest rule.
# Round-8 rotation (executes the r7 queue verbatim): IN —
# ann_ivfpq_topk (product quantization: codebook sampling + subspace
# argmin encoding + ADC — no other row scores candidates without their
# vectors; runs the production numpy encode against the exact-math
# oracle), crawl_ingest_pipeline (WARC transport + HTML strip chain +
# quality gate end-to-end; subsumes html_extract_docs and
# s9_warc_roundtrip), txlog_change_feed_events (per-commit
# snapshot-diff composition; the lifecycle row pins the format, this
# one pins the CDC read path). OUT, each after green driver outings
# (r7) and keeping the identical oracle bar in EXTRA:
# graph_triangle_counts (bucket self-join + count machinery — the
# graph family's driver row stays the iterative graph_hits_entities,
# and bucket self-joins stay driver-pinned by the minhash and fuzzy
# rows), dq_profile_events (wide per-column aggregation; the DQ
# family's driver row stays dq_psi_drift, and wide-agg machinery stays
# pinned by a_grouping_sets_events + a_exact_quantile_histogram),
# j_range_bucketed (bucketed range join; the time-conditional join
# family keeps TWO driver rows — j_asof_events for as-of backward
# search and j_pit_scd2_enrich for point-in-time interval predicates).
# Streaming rows (5) and Sendas rule rows untouched per the
# keep-the-window-honest rule.
# Round-9 rotation (executes the r8 queue verbatim): IN —
# txlog_dml_events (file-level copy-on-write DELETE→UPDATE→MERGE with
# an in-query CoW assertion — no other row exercises row-level DML),
# streaming_txlog_source_ingest (the native format("txlog")
# DataSource: version offsets, Arrow ingest, checkpointed exactly-once
# drain — no other row exercises the Python DataSource API),
# txlog_partitioned_prune_events (partition-first + zone-map pruning
# asserted in-query via inputFiles). OUT, each after green driver
# outings (r7/r8) and keeping the identical oracle bar in EXTRA:
# txlog_time_travel_events (version replay + zone-map pruning both
# re-pinned inside the partitioned and DML rows), w_window_frames and
# d1_keep_first (the two single-shuffle window-family rows whose plan
# shapes — single Exchange / map-side WindowGroupLimit — stay pinned
# in test_plan_shapes:70,157,247; the window family keeps
# o_topk_per_group as its driver row, and keep-first machinery stays
# driver-exercised inside sendas_full_pipeline's D1 stage).
# Streaming rows (5) and Sendas rule rows untouched per the
# keep-the-window-honest rule.
# Round-10 rotation (executes the r9 verdict's item 1 verbatim —
# all ELEVEN late round-9 rows in). IN: txlog_dml_dv_events
# (merge-on-read deletion vectors: dv delete + dv update +
# CoW-over-dv + compaction absorption), streaming_txlog_cdf_ivm_events
# (readChangeFeed DataSource draining a DML ladder through engine
# checkpoints into incremental_agg_update), dsir_select_docs
# (hashed-bin importance weights + Gumbel-top-k), ivm_join_view_events
# (bilinear join-IVM delta algebra), quality_lsq_classifier_docs (the
# registry's one TRAINED model — integer moments + Cramer under the
# hash), search_bm25_index_at_rest_docs (at-rest inverted index with
# in-query partition-prune assertion), corpus_refresh_incremental_docs
# (idempotent nightly-refresh composite with planted poisoned wave),
# txlog_bloom_probe_events (Bloom file-index point lookups),
# privacy_k_anonymize_events (k-anonymity suppression gate),
# quality_mad_outliers_events (median/MAD outlier gate),
# ts_resample_ffill_events (grid resample + gaps-and-islands fill).
# OUT, each after >=1 green driver outing and keeping the identical
# oracle bar in EXTRA (verdict's sibling-pins rule):
# txlog_dml_events (CoW delete/update re-pinned inside the DV ladder;
# MERGE stays in EXTRA + j9_update_then_merge stays driver),
# txlog_change_feed_events (CDF read path re-pinned by the CDF-IVM
# streaming row), ivm_minmax_incremental (IVM update algebra pinned by
# join-IVM + CDF-IVM rows), sample_group_split_docs (sampling slot
# passes to DSIR; group split keeps EXTRA oracle + property tests),
# dedup_substring_spans_docs (fingerprint-join machinery pinned by the
# minhash family), j_pit_scd2_enrich (interval-predicate joins pinned
# by j_asof_events), a_association_rules, graph_hits_entities,
# dq_psi_drift (quality family's driver slots pass to MAD + LSQ),
# langid_ngram_docs (text family keeps text_features),
# streaming_dedup_events (streaming family keeps 5 driver rows incl.
# the incoming CDF-IVM row; dedup-in-stream keeps its EXTRA oracle).
# Round-11 rotation (executes the r10 verdict's item 1 verbatim —
# the three queued r10 rows in). IN: search_index_refresh_docs
# (CDF-driven at-rest index maintenance — delete/update/append ladder
# on the indexed corpus, one atomic replace_where sync, in-query
# watermark/no-op assertions), txlog_hidden_partition_events
# (Iceberg-style partition transforms: day+bucket hidden partitioning
# with in-query scan-routing assertions), ivm_count_distinct_events
# (the COUNT DISTINCT support-state algebra no other row covers).
# OUT, each after green driver outings and keeping the identical
# oracle bar in EXTRA (verdict's sibling-pins rule):
# txlog_partitioned_prune_events (partition-first pruning re-pinned
# inside the hidden-partitioning row), search_bm25_index_at_rest_docs
# (index build+probe machinery re-pinned inside the refresh row,
# which composes it with DML), dedup_minhash_incremental_docs
# (incremental near-dup stays driver-pinned inside
# corpus_refresh_incremental_docs's wave ladder).
# Round-12 rotation QUEUE (candidates built+strict-audited in r11,
# to be swapped in next round after their EXTRA outing): IN —
# txlog_column_mapping_events (Delta-style metadata-only RENAME/DROP
# mid-DML-ladder with zone-map-through-rename and no-resurrection
# assertions; no other row exercises the name→physical mapping),
# catalog_snapshot_events (the multi-table Catalog's atomic pins:
# torn-state-invisible + pointer-CAS asserted in-query); third
# candidate txlog_type_widening_events (metadata-only type promotion
# with mixed-width upcast reads) if a third slot opens. OUT
# candidates, each with a sibling pinning its machinery:
# txlog_bloom_probe_events (bloom sidecar probing re-pinned inside
# txlog_column_mapping_events's pruned-read assertion and the
# format-level pruning tests), txlog_dml_dv_events (dv ladder keeps
# its EXTRA oracle; CoW DML is re-pinned by the column-mapping row's
# update/delete-under-rename ladder).
# Round-12 rotation (executes the r11 verdict's item 2 verbatim —
# the three r11 rows in, after their strict-audited EXTRA outing).
# IN: txlog_column_mapping_events (metadata-only RENAME/DROP
# mid-DML-ladder, zone-maps translating through the mapping,
# no-resurrection + time-travel-across-rename assertions),
# catalog_snapshot_events (multi-table Catalog pins: CAS publish,
# torn-state-invisible snapshot isolation asserted in-query),
# txlog_type_widening_events (metadata-only int-family/float→double
# promotion with mixed-width upcast reads — round 12 adds decimal
# precision growth and date→timestamp to the lattice). OUT, each
# after green driver outings (bloom r10+r11, dv r10+r11, MAD
# r10+r11) and keeping the identical oracle bar in EXTRA
# (verdict's sibling-pins rule): txlog_bloom_probe_events (bloom
# sidecar probing re-pinned inside the column-mapping row's
# pruned-read-through-rename assertion + format-level pruning
# tests), txlog_dml_dv_events (DV ladder keeps its EXTRA oracle;
# CoW row-level DML re-pinned by the column-mapping row's
# update/delete-under-rename ladder), quality_mad_outliers_events
# (its ×100 perf watch CLOSED at 0.68× in r11 so it no longer needs
# a driver reading — unlike privacy_k_anonymize_events which stays
# in-window for its watch; exact-quantile machinery stays driver-
# pinned by a_exact_quantile_histogram and the quality family keeps
# quality_lsq_classifier_docs).
# Round-13 rotation QUEUE (candidates built+oracle-green in r12 EXTRA,
# to be swapped in after their outing): IN — txlog_clone_events
# (shallow-clone reference isolation + CoW remove-by-absolute law; no
# other row exercises cross-table file references),
# txlog_date_zone_map_events (typed date/decimal zone-map bounds
# through the JSON log with in-query strict-subset pruning). OUT
# candidates, each with a sibling pinning its machinery:
# ivm_count_distinct_events (IVM family keeps ivm_join_view_events +
# streaming_txlog_cdf_ivm_events driver rows), ts_resample_ffill_events
# (gaps-and-islands window machinery pinned by r7_gap_mark +
# sessionize family; its own oracle stays in EXTRA).
# Round-13 rotation (executes the r12 queue above verbatim, per
# VERDICT r12 item 8): IN — txlog_clone_events,
# txlog_date_zone_map_events (both green through their r12 EXTRA
# outing). OUT to EXTRA, identical oracle bar kept —
# ivm_count_distinct_events, ts_resample_ffill_events.
DRIVER_WINDOW = [
    "q1_pricing_summary",
    "a_exact_quantile_histogram",
    "a_grouping_sets_events",
    "j9_update_then_merge",
    "p_filter_project",
    "j_broadcast_enrich",
    "j_anti_all_columns",
    "u_union_dedup_files",
    "o_topk_per_group",
    "a1_latest_partition",
    "s1_excel_dim",
    "geo_radius_join_events",
    "s5_sink_compact_roundtrip",
    "f1_priority_pick",
    "j_asof_events",
    "scalar_dates_ages",
    "r1_capped_mark",
    "r7_gap_mark",
    "r4_invoice_zeroing",
    "sendas_full_pipeline",
    "text_features",
    "corpus_training_manifest",
    "search_hybrid_rrf_ivf_docs",
    "fuzzy_match_part_names",
    "dedup_semantic_docs",
    "search_index_refresh_docs",
    "decontaminate_docs",
    "dedup_cluster_docs",
    "bpe_pair_counts_docs",
    "streaming_txlog_source_ingest",
    "txlog_hidden_partition_events",
    "ann_ivfpq_topk",
    "crawl_ingest_pipeline",
    "pack_training_sequences",
    "multimodal_features",
    "streaming_matview_counts",
    "streaming_session_windows",
    "streaming_gap_anchor_mark",
    "streaming_enriched_counts",
    "txlog_column_mapping_events",
    "dsir_select_docs",
    "ivm_join_view_events",
    "quality_lsq_classifier_docs",
    "txlog_clone_events",
    "corpus_refresh_incremental_docs",
    "catalog_snapshot_events",
    "streaming_txlog_cdf_ivm_events",
    "privacy_k_anonymize_events",
    "txlog_type_widening_events",
    "txlog_date_zone_map_events",
]

_ALL_QUERIES = {**QUERIES, **EXTRA_QUERIES}
_ALL_ORACLES = {**ORACLES, **EXTRA_ORACLES}
assert len(DRIVER_WINDOW) == 50, f"driver window is {len(DRIVER_WINDOW)}, not 50"
assert len(set(DRIVER_WINDOW)) == 50, "duplicate names in DRIVER_WINDOW"
_unknown = [k for k in DRIVER_WINDOW if k not in _ALL_QUERIES]
assert not _unknown, f"DRIVER_WINDOW names not in any registry: {_unknown}"
_no_oracle = [k for k in DRIVER_WINDOW if k not in _ALL_ORACLES]
assert not _no_oracle, f"DRIVER_WINDOW entries without an oracle: {_no_oracle}"

QUERIES = {k: _ALL_QUERIES[k] for k in DRIVER_WINDOW}
ORACLES = {k: _ALL_ORACLES[k] for k in DRIVER_WINDOW}
EXTRA_QUERIES = {k: v for k, v in _ALL_QUERIES.items() if k not in QUERIES}
EXTRA_ORACLES = {k: v for k, v in _ALL_ORACLES.items() if k not in QUERIES}
