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
    base_host: str | None = None,
) -> DataFrame:
    """(page id, url, host) for every href in ``html_col``, resolved
    against the page origin, fragment stripped, de-duplicated per page.

    ``visited``: optional frontier table with a ``url`` column —
    already-crawled URLs are anti-joined out (reference visited-set
    check). ``same_host_as``: optional column name on ``pages``
    holding the page's own host — keeps only same-host links
    (reference same-origin crawl policy). ``base_host``: optional
    column name on ``pages`` holding the page's host, used to resolve
    scheme-relative (``//h/p``), root-relative (``/p``) and bare
    relative hrefs against the page origin before the host/visited
    checks — the reference crawler resolves relative links the same
    way (page_navigator.go origin resolution). Defaults to
    ``same_host_as`` when that is given; with NEITHER set, relative
    hrefs cannot be resolved and are emitted with host='' (and thus
    dropped by a same-host policy) — absolute-URL extraction only.
    Bare relative paths resolve against the origin root (the page's
    directory is not carried in this column model)."""
    if base_host is None:
        base_host = same_host_as
    aux = list(dict.fromkeys(c for c in (same_host_as, base_host) if c is not None))
    links = pages.select(F.col(id_col), F.col(html_col), *map(F.col, aux)).select(
        F.col(id_col),
        *map(F.col, aux),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(_HREF_RE), 1)
        ).alias("raw_url"),
    )
    raw = F.col("raw_url")
    if base_host is not None:
        base = F.col(base_host)
        resolved = (
            F.when(raw.rlike(r"^https?://"), raw)
            .when(raw.startswith("//"), F.concat(F.lit("https:"), raw))
            .when(raw.startswith("/"), F.concat(F.lit("https://"), base, raw))
            .otherwise(F.concat(F.lit("https://"), base, F.lit("/"), raw))
        )
    else:
        resolved = raw
    no_frag = F.substring_index(resolved, "#", 1)
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
