"""URL canonicalization for web-corpus curation.

The first step of every web-scale training-data pipeline (CommonCrawl
style) is collapsing the many spellings of the same resource into one
canonical key — scheme/host case, ``www.`` prefixes, default ports,
trailing slashes, fragments, tracking parameters, and query-parameter
order are all presentation noise that fragments URL-level dedup and
per-site statistics.

Everything here is a pure Spark SQL expression (codegen'd, zero UDF,
zero shuffle) built from ``regexp_extract`` / ``regexp_replace`` /
higher-order array functions, and each step is reproducible in ANSI
SQL so a DuckDB oracle can independently verify the collapsed output.

Canonical form produced::

    scheme://host[:port]path[?k=v&...]

with: scheme and host lowercased; a leading ``www.`` dropped (optional);
the scheme's default port (``:80`` http / ``:443`` https) dropped;
repeated/trailing slashes in the path trimmed; the fragment dropped;
tracking parameters (``utm_*``, ``gclid``, ``fbclid``, ``ref``,
``mc_eid``, ``igshid``, ``msclkid``) dropped; surviving parameters
byte-sorted. Percent-encoding is NOT normalized (a lossy rewrite; out
of scope for a dedup key).

Reference behavior modeled on the URL hygiene the Aiven pipeline
tutorial leaves to the reader (its click events carry raw URLs); the
operator family itself is driver-brief surface, not reference surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Query parameters that never identify the resource (analytics/session
# tracking). One alternation, valid in both Java regex and RE2 so the
# DuckDB oracle can reuse it verbatim.
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|ref|mc_eid|igshid|msclkid)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def canonical_url(col: Column | str, *, strip_www: bool = True) -> Column:
    """Canonical dedup key for a URL column (see module docstring).

    Pure codegen — safe in the innermost map stage of a 100 TB scan.
    URLs without a ``scheme://`` prefix pass through lowercase-trimmed
    (a best-effort key is still a stable key).
    """
    raw = F.trim(_c(col))
    u = F.regexp_replace(raw, r"#.*$", "")  # fragment never survives
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")

    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    if strip_www:
        hostport = F.regexp_replace(hostport, r"^www\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )

    path_query = F.regexp_extract(rest, r"^[^/?]*(.*)$", 1)
    path = F.regexp_extract(path_query, r"^([^?]*)", 1)
    path = F.regexp_replace(F.regexp_replace(path, r"//+", "/"), r"/+$", "")

    query = F.regexp_extract(path_query, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qjoin = F.array_join(params, "&")

    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qjoin != "", F.concat(F.lit("?"), qjoin)).otherwise(""),
    )
    return F.when(scheme == "", F.lower(raw)).otherwise(canon)


def url_host(col: Column | str, *, strip_www: bool = True) -> Column:
    """Registrable-host-ish grouping key (lowercased authority, no port,
    optional ``www.`` strip) — the unit of per-site corpus statistics
    and robots/blocklist joins."""
    rest = F.regexp_replace(F.trim(_c(col)), _SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    host = F.regexp_replace(hostport, r":[0-9]+$", "")
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    return host
