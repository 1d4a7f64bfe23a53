from .sessions import (
    tumbling_counts,
    sliding_counts,
    session_window_agg,
    gap_anchor_mark_stream,
    run_stream_to_memory,
    stream_to_partitioned_parquet,
)

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "session_window_agg",
    "gap_anchor_mark_stream",
    "run_stream_to_memory",
    "stream_to_partitioned_parquet",
]
