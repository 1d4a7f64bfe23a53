"""HTML → text extraction as pure Column expressions.

A web-crawl corpus (the canonical 100 TB training-data source) starts
from HTML; the extraction step is the first full-corpus pass, so it
must be JVM-side and oracle-replayable, not a per-row Python parser.
Everything here is a chain of ``regexp_replace``/``regexp_extract``
projections — whole-stage codegen, no UDF, and the same regexes run
verbatim in the DuckDB oracle (simple RE2-compatible patterns: inline
``(?is)`` flags, lazy quantifiers, no backreferences).

Scope is the trafilatura/jusText PROBLEM at the readability-heuristic
tier, not a DOM parser: drop non-content subtrees (script/style/
head/comments), convert block boundaries to newlines, strip remaining
tags, decode the common entities, normalize whitespace. Link density
(anchor-text chars / total text chars) is the classic boilerplate
signal for downstream filtering. Malformed HTML degrades gracefully —
unmatched tags just strip; nothing throws.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# (pattern, replacement) chain shared by the Spark path and the SQL
# oracle generator — ORDER MATTERS (subtree drops before tag strips).
HTML_STRIP_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script\b[^>]*>.*?</script>", " "),  # executable subtrees
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?is)<head\b[^>]*>.*?</head>", " "),  # title handled separately
    (r"(?s)<!--.*?-->", " "),  # comments
    # block-level boundaries become newlines so paragraphs survive
    (r"(?i)<(?:/p|br[^>]*|/div|/li|/h[1-6]|/tr)>", "\n"),
    (r"(?s)<[^>]*>", " "),  # every remaining tag
]

HTML_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # LAST: otherwise &amp;lt; would double-decode
]


def html_to_text(col: Column) -> Column:
    """Visible text of an HTML document: non-content subtrees dropped,
    block boundaries preserved as newlines, tags stripped, common
    entities decoded, whitespace runs collapsed (newlines kept so
    paragraph structure survives for chunkers), trimmed."""
    out = col
    for pat, repl in HTML_STRIP_STEPS:
        out = F.regexp_replace(out, pat, repl)
    for ent, ch in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    out = F.regexp_replace(out, r"[ \t\r\f]+", " ")  # spaces within lines
    out = F.regexp_replace(out, r" ?\n ?", "\n")  # tidy line edges
    out = F.regexp_replace(out, r"\n{2,}", "\n")  # collapse blank lines
    # trim() strips only spaces; edge newlines need the regex form
    return F.regexp_replace(out, r"(?s)^\s+|\s+$", "")


def html_title(col: Column) -> Column:
    """<title> content (entities decoded, trimmed); '' when absent —
    the one head-subtree field worth keeping per document."""
    out = F.regexp_extract(col, r"(?is)<title\b[^>]*>(.*?)</title>", 1)
    for ent, ch in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(out)


def html_link_density(col: Column) -> Column:
    """Anchor-text chars / total visible-text chars, rounded to 6 dp —
    the classic jusText/readability boilerplate signal (navigation and
    footers are link-dense, body prose is not). 0.0 for documents with
    no visible text."""
    anchors = F.regexp_extract_all(col, F.lit(r"(?is)<a\b[^>]*>(.*?)</a>"), 1)
    anchor_text = F.aggregate(
        anchors,
        F.lit(""),
        lambda acc, a: F.concat(acc, a),
    )
    anchor_len = F.length(html_to_text(anchor_text))
    total_len = F.length(html_to_text(col))
    return (
        F.when(col.isNull(), F.lit(None).cast("double"))
        .when(total_len > 0, F.round(anchor_len / total_len, 6))
        .otherwise(F.lit(0.0))
    )
