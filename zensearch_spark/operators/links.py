"""Link extraction + crawl-frontier filters (SURVEY §2 S4, upgraded
from shape-only in round 4).

Reference semantics (cited, not copied): the crawler pulls every
anchor's href from the rendered DOM, normalizes it against the origin
(strip #fragment, resolve host), skips already-visited URLs, and
optionally keeps only same-host links
(reference: web-crawler/internal/utilities/page_navigator.go:118-160,
origin_url.go — the Selenium DOM walk; here the DOM is an HTML string
column and the frontier is a DataFrame, so the whole step is one
declarative plan instead of a per-page driver loop).

All JVM-side (regexp_extract_all + string ops — no Python UDF); the
visited filter is a LEFT ANTI join, exactly the membership shape the
index uses elsewhere (P2). At 100 TB the anti join shuffles on url —
a uniform key — and the extraction itself is embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HREF_RE = r'href="([^"]+)"'
_HOST_RE = r"^https?://([^/]+)"


def extract_links(
    pages: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    visited: DataFrame | None = None,
    same_host_as: str | None = None,
) -> DataFrame:
    """(page id, url, host) for every href in ``html_col``, fragment
    stripped, de-duplicated per page.

    ``visited``: optional frontier table with a ``url`` column —
    already-crawled URLs are anti-joined out (reference visited-set
    check). ``same_host_as``: optional column name on ``pages``
    holding the page's own host — keeps only same-host links
    (reference same-origin crawl policy)."""
    cols = [F.col(id_col), F.col(html_col)]
    if same_host_as is not None:
        cols.append(F.col(same_host_as))
    links = pages.select(*cols).select(
        F.col(id_col),
        *( [F.col(same_host_as)] if same_host_as is not None else [] ),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(_HREF_RE), 1)
        ).alias("raw_url"),
    )
    no_frag = F.substring_index(F.col("raw_url"), "#", 1)
    out = links.select(
        F.col(id_col),
        *( [F.col(same_host_as)] if same_host_as is not None else [] ),
        no_frag.alias("url"),
        F.regexp_extract(no_frag, _HOST_RE, 1).alias("host"),
    )
    if same_host_as is not None:
        out = out.filter(F.col("host") == F.col(same_host_as)).drop(
            same_host_as
        )
    out = out.distinct()
    if visited is not None:
        # no broadcast hint: a real frontier's visited set is corpus-
        # sized — let the planner/AQE pick broadcast only when small
        out = out.join(visited.select("url").distinct(), "url", "left_anti")
    return out.select(id_col, "url", "host")
