from .dates import parse_js_timestamp, edad_valor, edad_unidad, date_to_text
from .strings import split_full_name, NAME_PARTS_SCHEMA
from .text import (
    token_count,
    quality_features,
    lang_id,
    doc_fingerprint,
    normalized_text,
    pii_redact,
    pii_counts,
    repeated_ngram_ratio,
)

__all__ = [
    "parse_js_timestamp",
    "edad_valor",
    "edad_unidad",
    "date_to_text",
    "split_full_name",
    "NAME_PARTS_SCHEMA",
    "token_count",
    "quality_features",
    "lang_id",
    "doc_fingerprint",
    "normalized_text",
    "pii_redact",
    "pii_counts",
    "repeated_ngram_ratio",
]
