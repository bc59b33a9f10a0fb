"""Span extraction tests: the (kind, text, media_ref, order) round-trip
invariant over the synthetic corpus + hand fixtures mirroring the reference
extraction semantics (parse_html_scrapy.py)."""

from __future__ import annotations

from searchgov_spider_spark.operators.extraction import extract_spans, parse_page
from searchgov_spider_spark.testing.graph import generate_graph, graph_to_dfs, render_html


def test_parse_page_basic():
    html = b"""<html lang="en-US"><head>
      <title>My  Title</title>
      <meta name="description" content="A desc">
      <meta property="og:title" content="OG Title">
      <style>p {color: red}</style>
      <script>var x = 1;</script>
    </head><body>
      <p>Hello world</p>
      <a href="/rel/page">anchor text ignored</a>
      <button>click me</button>
      <p>Second <b>bold</b> para</p>
      <img src="/img/pic.png">
      <a href="https://x.gov/file.zip">zip link</a>
      <area href="https://x.gov/area">
      <va-link href="https://x.gov/va"></va-link>
    </body></html>"""
    r = parse_page("https://x.gov/base/", html)
    kinds = [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
    assert kinds == [
        ("text", "Hello world", None),
        ("link", None, "https://x.gov/rel/page"),
        ("text", "Second", None),
        ("text", "bold", None),
        ("text", "para", None),
        ("media", None, "https://x.gov/img/pic.png"),
        ("media", None, "https://x.gov/file.zip"),  # zip ⇒ media-classified link
        ("link", None, "https://x.gov/area"),
        ("link", None, "https://x.gov/va"),
    ]
    assert [s["offset"] for s in r["spans"]] == list(range(len(kinds)))
    # out_links: link-kind only, unique, in order; zip excluded (deny ext)
    assert r["out_links"] == ["https://x.gov/rel/page", "https://x.gov/area", "https://x.gov/va"]
    assert r["title"] == "My Title"
    assert r["html_lang"] == "en-US"
    assert r["meta"]["description"] == "A desc"
    assert r["meta"]["og:title"] == "OG Title"


def test_parse_page_edge_cases():
    # empty / malformed / non-utf8 bodies never raise
    assert parse_page("https://x.gov/", None)["spans"] == []
    assert parse_page("https://x.gov/", b"")["spans"] == []
    assert parse_page("https://x.gov/", b"<a href='x")["out_links"] == []
    r = parse_page("https://x.gov/", "caf\xe9 <p>ok</p>".encode("latin-1"))
    assert any(s["text"] and "ok" in s["text"] for s in r["spans"])
    # duplicate links deduped in out_links but both spans kept
    r2 = parse_page("https://x.gov/", b'<a href="/a">1</a><a href="/a">2</a>')
    assert len(r2["spans"]) == 2
    assert r2["out_links"] == ["https://x.gov/a"]


def test_roundtrip_synthetic_corpus():
    """Generator renders HTML from golden spans; the parser must recover the
    exact span sequence — the BASELINE per-row invariant."""
    graph = generate_graph(n_pages=200, seed=11)
    checked = 0
    for p in graph["pages"]:
        if not p.content_type.startswith("text/html"):
            continue
        r = parse_page(p.url, p.body)
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        want = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in p.spans]
        assert got == want, f"span mismatch for {p.url}"
        assert r["out_links"] == p.out_links
        checked += 1
    assert checked > 150


def test_extract_spans_dataframe(spark):
    """The mapInPandas stage returns identical spans to the pure parser."""
    graph = generate_graph(n_pages=60, seed=3)
    pages_df, _, _ = graph_to_dfs(spark, graph)
    html_pages = pages_df.filter("content_type like 'text/html%'")
    out = extract_spans(
        html_pages.select("url", "body"), keep_cols=["url"]
    ).collect()
    golden = {p.url: p for p in graph["pages"]}
    assert len(out) == html_pages.count()
    for row in out:
        p = golden[row["url"]]
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]]
        want = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in p.spans]
        assert got == want
        assert list(row["out_links"]) == p.out_links


def test_render_title_roundtrip():
    spans = [{"kind": "text", "text": "hello", "media_ref": None, "offset": 0}]
    r = parse_page("https://x.gov/", render_html("T & T", "en", spans))
    assert r["title"] == "T & T"
    assert r["html_lang"] == "en"
