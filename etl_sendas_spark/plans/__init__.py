from .capital_sendas import (
    parse_and_filter_month,
    enrich,
    apply_rules,
    comprobar,
    finalize,
    run_pipeline,
    OUTPUT_COLUMNS,
)

__all__ = [
    "parse_and_filter_month",
    "enrich",
    "apply_rules",
    "comprobar",
    "finalize",
    "run_pipeline",
    "OUTPUT_COLUMNS",
]
