"""HTML → text extraction (functions/html.py): subtree drops, block
boundaries, entity decoding order, link density, and graceful
degradation on malformed input — all pure Column regex chains, so
these hand cases are the engine-side truth the generated DuckDB oracle
(html_extract_docs) is held to on the corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sendas_spark.functions.html import (
    html_link_density,
    html_title,
    html_to_text,
)


def _one(spark, html):
    df = spark.createDataFrame([(html,)], "h string")
    r = df.select(
        html_to_text(F.col("h")).alias("x"),
        html_title(F.col("h")).alias("t"),
        html_link_density(F.col("h")).alias("ld"),
    ).collect()[0]
    return r["x"], r["t"], r["ld"]


def test_html_drops_noncontent_subtrees_and_keeps_blocks(spark):
    x, t, ld = _one(
        spark,
        '<html><head><title>T &amp; U</title><style>p{x:1}</style>'
        '<script>var s = "<p>leak</p>";</script></head>'
        "<body><!-- c --><h1>Head</h1><p>One &lt;two&gt;.</p>"
        "<p>Three.</p><ul><li>a</li><li>b</li></ul></body></html>",
    )
    assert x == "Head\nOne <two>.\nThree.\na\nb"
    assert t == "T & U"
    assert "leak" not in x and "x:1" not in x  # script/style gone
    assert ld == 0.0


def test_html_entity_decode_order_no_double_decode(spark):
    # &amp;lt; must decode to the LITERAL text "&lt;", never to "<"
    x, _, _ = _one(spark, "<p>&amp;lt; &amp; &nbsp;ok</p>")
    assert x == "&lt; & ok"


def test_html_link_density_signal(spark):
    # nav-heavy fragment: most visible text is anchor text
    x, _, ld = _one(
        spark,
        '<body><a href="/a">Home</a> <a href="/b">About <b>us</b></a> y</body>',
    )
    assert x == "Home About us y"
    assert abs(ld - (len("HomeAbout us") / len("Home About us y"))) < 1e-6


def test_html_malformed_and_degenerate_inputs(spark):
    assert _one(spark, "plain text, no markup")[0] == "plain text, no markup"
    assert _one(spark, "<p>unclosed <b>bold")[0] == "unclosed bold"
    x, t, ld = _one(spark, "")
    assert x == "" and t == "" and ld == 0.0
    df = spark.createDataFrame([(None,)], "h string")
    r = df.select(
        html_to_text(F.col("h")).alias("x"),
        html_link_density(F.col("h")).alias("ld"),
    ).collect()[0]
    assert r["x"] is None and r["ld"] is None


def test_html_extraction_is_scan_local(spark):
    """The extraction is a single projection over the scan — no
    exchange, no UDF (the property that makes it a viable first pass
    over a 100 TB crawl)."""
    df = spark.range(0, 100).select(
        F.concat(F.lit("<p>doc "), F.col("id"), F.lit("</p>")).alias("h")
    )
    out = df.select(html_to_text(F.col("h")).alias("x"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
