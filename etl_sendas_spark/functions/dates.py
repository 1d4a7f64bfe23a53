"""Date/time scalar library (SURVEY.md §2.8) — pure Column expressions.

Reference semantics being re-expressed (capital_sendas.py):
- :137-139  JS-style text timestamps ``"Wed Sep 10 2024 07:40:00 GMT-0500
            (hora estándar de Colombia)"`` parsed from the first 24 chars
            with ``%a %b %d %Y %H:%M:%S``, errors coerced to null, then
            +5 hours (n8n timezone fix).
- :165-168  age derivation from a day-difference: value (years if >=365
            days, else months if >=30, else days) and unit label.
- :575-578  dates re-stringified as ``yyyy/MM/dd`` with nulls preserved.

All JVM-side — no UDFs, fully codegen'd, pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Java DateTimeFormatter equivalent of the reference's "%a %b %d %Y %H:%M:%S",
# minus the weekday token: Spark's post-3.0 parser forbids day-of-week
# fields in PARSE patterns, and in the reference the weekday is pure
# validation (parse errors coerce to null anyway), so we parse from
# char 5 of the 24-char slice — "MMM d yyyy HH:mm:ss".
JS_TEXT_FORMAT = "MMM d yyyy HH:mm:ss"


def parse_js_timestamp(col: Column | str, add_hours: int = 5) -> Column:
    """Parse a JS ``Date.toString()``-style text timestamp.

    ``try_to_timestamp`` reproduces pandas' ``errors='coerce'`` (null on
    garbage instead of failing the job) and ``+ INTERVAL h HOURS``
    reproduces the fixed offset correction. Deviation from the
    reference recorded above: the weekday token is skipped, not
    validated (capital_sendas.py:137-139 would null out a row whose
    weekday name is garbled; we accept it).
    """
    c = F.col(col) if isinstance(col, str) else col
    parsed = F.try_to_timestamp(
        F.substring(c, 5, 20), F.lit(JS_TEXT_FORMAT)
    )
    if add_hours:
        parsed = parsed + F.expr(f"INTERVAL {int(add_hours)} HOURS")
    return parsed


def _age_days(fec_servicio: Column | str, fec_nacimiento: Column | str) -> Column:
    a = F.col(fec_servicio) if isinstance(fec_servicio, str) else fec_servicio
    b = F.col(fec_nacimiento) if isinstance(fec_nacimiento, str) else fec_nacimiento
    return F.datediff(F.to_date(a), F.to_date(b))


def edad_valor(fec_servicio: Column | str, fec_nacimiento: Column | str) -> Column:
    """Age value: years if >=365 days, months if >=30 days, else days.

    Integer floor-division semantics match the reference's ``days//365``
    / ``days//30`` (capital_sendas.py:165-166) including negative-day
    behavior via ``floor`` of a true division.
    """
    days = _age_days(fec_servicio, fec_nacimiento)
    return (
        F.when(days >= 365, F.floor(days / 365))
        .when(days >= 30, F.floor(days / 30))
        .otherwise(days)
        .cast("long")
    )


def edad_unidad(fec_servicio: Column | str, fec_nacimiento: Column | str) -> Column:
    """Age unit label: 'Años' / 'Meses' / 'Días' (capital_sendas.py:167-168)."""
    days = _age_days(fec_servicio, fec_nacimiento)
    return (
        F.when(days >= 365, F.lit("Años"))
        .when(days >= 30, F.lit("Meses"))
        .otherwise(F.lit("Días"))
    )


def date_to_text(col: Column | str, fmt: str = "yyyy/MM/dd") -> Column:
    """Stringify a date, preserving nulls (capital_sendas.py:575-578)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, fmt)
