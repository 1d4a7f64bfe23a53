"""String scalar library — the F2 name splitter (SURVEY.md §2.9).

Reference semantics (capital_sendas.py:277-315): tokenize a full name
on whitespace, glue the Spanish particles ``DE DEL LA LOS`` onto the
token that follows them, then assign ``(nombre1, nombre2, apellido1,
apellido2)`` positionally by token count:

- 4 tokens  → n1, n2, a1, a2
- >4 tokens → n1, middle-joined-as-n2, a1=second-to-last, a2=last
- 3 tokens  → n1, '',  a1, a2
- 2 tokens  → n1, '',  a1, ''
- 1 token   → n1, '',  '',  ''

This is genuinely procedural (variable token counts + particle glue),
so it is the one scalar that stays a pandas UDF — Arrow-vectorized,
not row-at-a-time. Everything else in the engine is a Column expr.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

PARTICLES = frozenset({"DE", "DEL", "LA", "LOS"})

NAME_PARTS_SCHEMA = T.StructType(
    [
        T.StructField("nombre1", T.StringType()),
        T.StructField("nombre2", T.StringType()),
        T.StructField("apellido1", T.StringType()),
        T.StructField("apellido2", T.StringType()),
    ]
)


def split_name_py(full_name: str) -> tuple[str, str, str, str]:
    """Pure-Python splitter (unit-testable; the UDF vectorizes over it)."""
    raw = str(full_name).split()
    units: list[str] = []
    pending = ""
    for tok in raw:
        if tok in PARTICLES:
            # particle binds to the NEXT token, joined with a space
            pending += tok + " "
        else:
            units.append(pending + tok)
            pending = ""
    # NOTE: a trailing particle with no following token is dropped,
    # matching the reference (its `parte` is never flushed).
    n = len(units)
    if n == 0:
        return ("", "", "", "")
    if n == 1:
        return (units[0], "", "", "")
    if n == 2:
        return (units[0], "", units[1], "")
    if n == 3:
        return (units[0], "", units[1], units[2])
    if n == 4:
        return (units[0], units[1], units[2], units[3])
    return (units[0], " ".join(units[1:-2]), units[-2], units[-1])


@F.pandas_udf(NAME_PARTS_SCHEMA)
def _split_full_name_udf(names: pd.Series) -> pd.DataFrame:
    parts = names.astype(str).map(split_name_py)
    return pd.DataFrame(
        parts.tolist(),
        columns=["nombre1", "nombre2", "apellido1", "apellido2"],
        index=names.index,
    )


def split_full_name(col: Column | str) -> Column:
    """Struct-returning vectorized splitter; use ``.select(expr("s.*"))`` to flatten."""
    c = F.col(col) if isinstance(col, str) else col
    return _split_full_name_udf(c)
