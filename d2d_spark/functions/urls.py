"""URL normalization — the canonicalization step in front of URL-level
dedup in every crawl pipeline (CommonCrawl/RefinedWeb drop exact-URL
revisits before any content pass). Pure Column expressions, zero UDFs:
at 100 TB this runs inside the scan's codegen stage like any other
string function.

Canonical form produced by `normalize_url`:

- scheme and host lowercased; default ports (:80 http, :443 https)
  stripped; optional leading ``www.`` stripped;
- fragment dropped;
- trailing slashes trimmed from the path;
- query string split on ``&``: empty pairs and tracking parameters
  dropped (utm_*, fbclid, gclid, msclkid, mc_cid, mc_eid, ref),
  remaining pairs SORTED so parameter order can't defeat dedup, then
  rejoined (``?`` omitted when nothing survives).

Inputs that don't parse as ``scheme://authority...`` pass through
trimmed-only — garbage in, recognizable garbage out, never NULL (a
NULL would silently vanish from a dedup groupBy).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tracking parameters dropped during normalization (lowercased keys)
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "mc_cid", "mc_eid", "ref")

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"


def _clean_query(q: Column) -> Column:
    """Drop empty + tracking pairs, sort the rest, rejoin."""
    pairs = F.filter(
        F.split(q, "&"),
        lambda p: (p != "")
        & ~F.lower(F.substring_index(p, "=", 1)).startswith("utm_")
        & ~F.lower(F.substring_index(p, "=", 1)).isin(*TRACKING_PARAMS),
    )
    return F.array_join(F.array_sort(pairs), "&")


def normalize_url(col: Column, strip_www: bool = True) -> Column:
    """Canonicalize a URL column (see module docstring). Deterministic,
    idempotent, and mirrored 1:1 by the SQL in the registered driver
    query."""
    u = F.trim(col)
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    host0 = F.lower(F.regexp_extract(u, _URL_RE, 2))
    path0 = F.regexp_extract(u, _URL_RE, 3)
    query0 = F.regexp_extract(u, _URL_RE, 4)

    # strip default port per scheme
    host1 = (
        F.when((scheme == "http"), F.regexp_replace(host0, ":80$", ""))
        .when((scheme == "https"), F.regexp_replace(host0, ":443$", ""))
        .otherwise(host0)
    )
    if strip_www:
        host1 = F.regexp_replace(host1, r"^www\.", "")
    path1 = F.regexp_replace(path0, "/+$", "")
    q1 = _clean_query(query0)
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host1,
        path1,
        F.when(q1 != "", F.concat(F.lit("?"), q1)).otherwise(F.lit("")),
    )
    return F.when(scheme != "", rebuilt).otherwise(u)


def url_host(col: Column, strip_www: bool = True) -> Column:
    """Registrable-host-ish key for per-domain stats/quotas (domain
    mixing, per-site caps): lowercased authority without port or
    leading www. Unparseable inputs yield ''."""
    host = F.lower(F.regexp_extract(F.trim(col), _URL_RE, 2))
    host = F.regexp_replace(host, ":[0-9]+$", "")
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    return host
