"""S4 link extraction: href harvest, fragment strip, visited
anti-join, same-host crawl policy (operators/links.py) — the declared
reference semantics on handcrafted HTML with the edge cases a DOM walk
hits (duplicate links, fragment-only difference, cross-host anchors).
"""

from __future__ import annotations


def test_extract_links_full_semantics(spark):
    from zensearch_spark.operators.links import extract_links

    pages = spark.createDataFrame(
        [
            (
                1,
                '<a href="https://a.com/x#top">x</a>'
                '<a href="https://a.com/x#bottom">x again</a>'  # same after strip
                '<a href="https://a.com/y">y</a>'
                '<a href="https://b.com/z">cross-host</a>'
                '<a class="k" href="https://a.com/visited">old</a>',
                "a.com",
            ),
            (2, "<p>no links at all</p>", "a.com"),
        ],
        "doc_id long, html string, my_host string",
    )
    visited = spark.createDataFrame([("https://a.com/visited",)], "url string")

    got = {
        (r["doc_id"], r["url"], r["host"])
        for r in extract_links(pages, visited=visited).collect()
    }
    assert got == {
        (1, "https://a.com/x", "a.com"),
        (1, "https://a.com/y", "a.com"),
        (1, "https://b.com/z", "b.com"),
    }

    same_host = {
        (r["doc_id"], r["url"])
        for r in extract_links(
            pages, visited=visited, same_host_as="my_host"
        ).collect()
    }
    assert same_host == {
        (1, "https://a.com/x"),
        (1, "https://a.com/y"),
    }


def test_relative_hrefs_resolve_against_page_origin(spark):
    """Scheme-relative, root-relative and bare relative hrefs resolve
    against the page's host before the host/visited checks (round-4
    ADVICE: they previously emitted host='' and were silently dropped
    under a same-host policy — the reference crawler resolves them
    against the page origin)."""
    from zensearch_spark.operators.links import extract_links

    pages = spark.createDataFrame(
        [
            (
                1,
                '<a href="/abs/path#frag">root-rel</a>'
                '<a href="rel/page">bare-rel</a>'
                '<a href="//cdn.com/x">scheme-rel</a>'
                '<a href="https://a.com/full">abs</a>',
                "a.com",
            ),
        ],
        "doc_id long, html string, my_host string",
    )
    got = {
        (r["url"], r["host"])
        for r in extract_links(pages, base_host="my_host").collect()
    }
    assert got == {
        ("https://a.com/abs/path", "a.com"),
        ("https://a.com/rel/page", "a.com"),
        ("https://cdn.com/x", "cdn.com"),
        ("https://a.com/full", "a.com"),
    }
    # same-host policy now KEEPS resolved relative links (they are by
    # construction same-host) and drops the cross-host one
    same = {
        r["url"]
        for r in extract_links(pages, same_host_as="my_host").collect()
    }
    assert same == {
        "https://a.com/abs/path",
        "https://a.com/rel/page",
        "https://a.com/full",
    }
