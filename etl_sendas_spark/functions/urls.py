"""URL canonicalization: the scalar prerequisite of web-corpus dedup.

Web-scale pipelines dedup and aggregate by *canonical* URL/host: the
same page arrives as ``HTTPS://WWW.Site.com:443/a/?utm_source=x`` and
``https://site.com/a``, and treating those as distinct inflates the
corpus and splits per-domain statistics. These helpers normalize with
pure JVM ``regexp_extract`` / ``regexp_replace`` chains — zero Python
in the hot path, whole-stage-codegen friendly, and every pattern is
RE2-safe (no backreferences/lookaround) so the DuckDB oracle can run
the byte-identical regexes.

Canonicalization rules (each an explicit, testable step):
- scheme case-folded away (``http``/``https`` only; others left as-is
  upstream of the caller's filter),
- host lowercased, leading ``www.`` stripped, default ports ``:80`` /
  ``:443`` stripped,
- fragment dropped,
- tracking params (``utm_*``) dropped from the query, ``&`` runs
  re-normalized, empty query dropped,
- trailing ``/`` stripped from non-root paths.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme://host[:port][/path][?query][#fragment]
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def url_host(url: Column) -> Column:
    """Canonical host: lowercased, ``www.`` and default port stripped."""
    h = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    h = F.regexp_replace(h, r"^www\.", "")
    return F.regexp_replace(h, r":(80|443)$", "")


def url_path(url: Column) -> Column:
    """Path with a trailing slash stripped (root ``/`` preserved);
    empty path canonicalized to ``/``."""
    p = F.regexp_extract(url, _PATH_RE, 1)
    p = F.when(p == "", F.lit("/")).otherwise(p)
    return F.when(p == "/", p).otherwise(F.regexp_replace(p, r"/$", ""))


def url_query_clean(url: Column) -> Column:
    """Query string with ``utm_*`` tracking params removed and ``&``
    runs/edges re-normalized; NULL when nothing survives."""
    q = F.regexp_extract(url, _QUERY_RE, 1)
    q = F.regexp_replace(q, r"(^|&)utm_[^&]*", "$1")
    q = F.regexp_replace(q, r"&&+", "&")
    q = F.regexp_replace(q, r"^&|&$", "")
    return F.when(q == "", F.lit(None).cast("string")).otherwise(q)


def canonical_url(url: Column) -> Column:
    """Reassembled canonical form: ``https://host/path[?query]``.

    Scheme is folded to ``https`` (http/https duplicates of one page
    are the single most common near-dup pair in a web crawl); callers
    who must distinguish keep the original column alongside.
    """
    host, path, q = url_host(url), url_path(url), url_query_clean(url)
    return F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(q.isNotNull(), F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
