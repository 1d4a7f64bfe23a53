from .relational import (
    keep_first,
    first_flag,
    update_by_row_id,
    anti_join_all_columns,
    invoices_containing,
)
from .marking import capped_group_mark, gap_anchor_mark
from .dedupe import (
    exact_dedup,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_candidates,
    simhash_fingerprints,
    embedding_near_dup_pairs,
)
from .similarity import cosine_topk, lsh_cosine_topk

__all__ = [
    "keep_first",
    "first_flag",
    "update_by_row_id",
    "anti_join_all_columns",
    "invoices_containing",
    "capped_group_mark",
    "gap_anchor_mark",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "simhash_fingerprints",
    "embedding_near_dup_pairs",
    "cosine_topk",
    "lsh_cosine_topk",
]
