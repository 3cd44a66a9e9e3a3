"""URL canonicalization — the crawl-frontier / document-dedup key every
web-scale pipeline needs before exact dedup can work (mirror pages differ
only in tracking params, fragment anchors, host case, default ports).

Pure column expressions (regex + split/filter/sort), no UDF:

- scheme and host lowercase; ``www.`` prefix dropped,
- default ports stripped (``:80`` http, ``:443`` https),
- fragment dropped,
- query parameters sorted, tracking params (``utm_*``, ``fbclid``,
  ``gclid``, ``ref``, ``spm``) removed; ``?`` dropped when nothing
  survives,
- trailing slash normalized off non-root paths.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tracking parameters stripped during canonicalization
TRACKING_PARAMS = ("utm_", "fbclid", "gclid", "ref", "spm")


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL (NULL passes through)."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.regexp_replace(
        F.regexp_replace(hostport, r"^www\.", ""),
        r":(80|443)$",
        "",
    )
    # strip the default port only when it matches the scheme
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(F.regexp_replace(hostport, r"^www\.", ""), ":80$", ""),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(F.regexp_replace(hostport, r"^www\.", ""), ":443$", ""),
    ).otherwise(F.regexp_replace(hostport, r"^www\.", ""))

    path_raw = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    trimmed = F.regexp_replace(path_raw, r"/+$", "")
    path = F.when(trimmed == "", F.lit("/")).otherwise(trimmed)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~F.lower(p).startswith("utm_")
            & ~F.lower(p).rlike(r"^(fbclid|gclid|ref|spm)="),
        )
    )
    qs = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(F.lit(""))
    return F.when(
        url.isNotNull() & (scheme != ""),
        F.concat(scheme, F.lit("://"), host, path, qs),
    )
