"""Parse-stage unit tests: span interleaving, links, media scoring, tables,
metadata, determinism (mirrors the reference's scraping-strategy tests and
test_consistent_output at tests/async/test_content_filter_prune.py:161)."""

import json

import pyarrow as pa

from crawl4ai_ray.stages.parse import parse_html, parse_html_batch

URL = "http://site.test/page"


def test_basic_text_and_heading():
    r = parse_html("<html><body><h1>Title</h1><p>Hello world</p></body></html>", URL)
    kinds = [s["kind"] for s in r["spans"]]
    assert kinds == ["text"]
    assert "# Title" in r["spans"][0]["text"]
    assert "Hello world" in r["spans"][0]["text"]


def test_interleaved_spans_order():
    html = (
        "<body><p>before</p>"
        '<img src="/a.png" alt="pic one" width="300" height="300">'
        "<p>middle</p>"
        '<img src="/b.jpg" alt="pic two" width="300" height="300">'
        "<p>after</p></body>"
    )
    r = parse_html(html, URL)
    kinds = [s["kind"] for s in r["spans"]]
    assert kinds == ["text", "image", "text", "image", "text"]
    assert [s["offset"] for s in r["spans"]] == [0, 1, 2, 3, 4]
    assert r["spans"][1]["media_ref"] == "http://site.test/a.png"
    assert r["spans"][1]["text"] == "pic one"
    assert "before" in r["spans"][0]["text"]
    assert "middle" in r["spans"][2]["text"]


def test_image_scoring_threshold():
    # tiny icon without alt scores below default threshold 3 → dropped
    html = '<body><img src="/icon16.png" width="16" height="16"><p>t</p></body>'
    r = parse_html(html, URL)
    assert [s["kind"] for s in r["spans"]] == ["text"]
    # big jpg with alt + srcset passes
    html2 = ('<body><img src="/x.jpg" alt="a" width="200" height="200" '
             'srcset="/x@2x.jpg 2x"></body>')
    r2 = parse_html(html2, URL)
    assert [s["kind"] for s in r2["spans"]] == ["image"]


def test_base64_src_stripped():
    html = '<body><img src="data:image/png;base64,AAAA" alt="x" width="500" height="500"></body>'
    r = parse_html(html, URL)
    assert r["spans"] == []


def test_links_extraction_and_dedupe():
    html = (
        '<body><a href="/a">A</a> <a href="/a">A again</a> '
        '<a href="http://other.com/x" title="ext">X</a> '
        '<a href="mailto:x@y.z">mail</a> <a href="#frag">frag</a></body>'
    )
    r = parse_html(html, URL)
    hrefs = [l["href"] for l in r["links"]]
    assert hrefs == ["http://site.test/a", "http://other.com/x"]
    assert r["links"][0]["internal"] is True
    assert r["links"][1]["internal"] is False
    assert r["links"][1]["title"] == "ext"


def test_base_href():
    html = '<head><base href="http://cdn.test/root/"></head><body><a href="x">l</a></body>'
    r = parse_html(html, URL)
    assert r["links"][0]["href"] == "http://cdn.test/root/x"
    # internal/external judged vs page url, not base
    assert r["links"][0]["internal"] is False


def test_script_style_removed():
    html = "<body><script>var x=1;</script><style>.a{}</style><p>keep</p></body>"
    r = parse_html(html, URL)
    assert "var x" not in r["markdown"]
    assert ".a{}" not in r["markdown"]
    assert "keep" in r["markdown"]


def test_metadata():
    html = (
        "<head><title>T1</title>"
        '<meta name="description" content="D1">'
        '<meta property="og:title" content="OT">'
        "</head><body><p>b</p></body>"
    )
    r = parse_html(html, URL)
    assert r["metadata"]["title"] == "T1"
    assert r["metadata"]["description"] == "D1"
    assert r["metadata"]["og:title"] == "OT"
    assert r["title"] == "T1"


def test_data_table_extracted():
    html = (
        "<body><table><caption>stats</caption>"
        "<thead><tr><th>a</th><th>b</th><th>c</th></tr></thead>"
        "<tbody><tr><td>1</td><td>2</td><td>3</td></tr>"
        "<tr><td>4</td><td>5</td><td>6</td></tr></tbody></table></body>"
    )
    r = parse_html(html, URL)
    tables = [s for s in r["spans"] if s["kind"] == "table"]
    assert len(tables) == 1
    payload = json.loads(tables[0]["text"])
    assert payload["headers"] == ["a", "b", "c"]
    assert payload["rows"] == [["1", "2", "3"], ["4", "5", "6"]]
    assert payload["caption"] == "stats"


def test_layout_table_skipped():
    html = ('<body><table role="presentation"><tr><td>x</td></tr></table>'
            "<p>t</p></body>")
    r = parse_html(html, URL)
    assert all(s["kind"] != "table" for s in r["spans"])


def test_colspan_expansion():
    html = (
        "<body><table>"
        "<thead><tr><th>a</th><th>b</th><th>c</th></tr></thead>"
        '<tbody><tr><td colspan="2">x</td><td>y</td></tr></tbody>'
        "<caption>c</caption></table></body>"
    )
    r = parse_html(html, URL)
    tables = [s for s in r["spans"] if s["kind"] == "table"]
    assert len(tables) == 1
    payload = json.loads(tables[0]["text"])
    assert payload["rows"] == [["x", "x", "y"]]


def test_citations_mode():
    html = '<body><p><a href="/a">Alpha</a> and <a href="/b">Beta</a> and <a href="/a">Alpha2</a></p></body>'
    r = parse_html(html, URL, citations=True)
    text = r["markdown"]
    assert "Alpha⟨1⟩" in text and "Beta⟨2⟩" in text and "Alpha2⟨1⟩" in text
    assert "## References" in text
    assert "⟨1⟩ http://site.test/a" in text


def test_video_audio():
    html = ('<body><video src="/v.mp4" title="vid"></video>'
            '<audio><source src="/a.mp3"></audio></body>')
    r = parse_html(html, URL)
    kinds = [(s["kind"], s["media_ref"]) for s in r["spans"]]
    assert ("video", "http://site.test/v.mp4") in kinds
    assert ("audio", "http://site.test/a.mp3") in kinds


def test_deterministic():
    html = ('<body><h2>H</h2><p>text <a href="/l">link</a></p>'
            '<img src="/i.png" alt="i" width="200" height="200"></body>')
    r1 = parse_html(html, URL)
    r2 = parse_html(html, URL)
    assert r1 == r2


def test_batch_udf_arrow_roundtrip():
    batch = pa.table(
        {
            "url": ["http://a.test/1", "http://a.test/2"],
            "html": [
                "<body><p>one</p></body>",
                '<body><a href="/x">two</a></body>',
            ],
        }
    )
    out = parse_html_batch(batch)
    assert out.num_rows == 2
    assert {"spans", "links", "markdown", "title", "metadata"} <= set(
        out.column_names
    )
    spans = out.column("spans").to_pylist()
    assert spans[0][0]["kind"] == "text"
    links = out.column("links").to_pylist()
    assert links[1][0]["href"] == "http://a.test/x"


def test_malformed_html_no_crash():
    r = parse_html("<div><p>unclosed <b>bold<table><tr><td>x", URL)
    assert isinstance(r["spans"], list)
    r2 = parse_html("", URL)
    assert r2["spans"] == []


# -- code-review r2 regressions ---------------------------------------------


def test_selfclosing_skip_tag_does_not_swallow_document():
    r = parse_html('<p>before</p><iframe src="x"/><p>after content</p>',
                   "http://a.com/")
    assert "after content" in r["markdown"]
    r2 = parse_html('<p>a</p><svg/><p>b</p>', "http://a.com/")
    assert "b" in r2["markdown"]


def test_missing_head_close_keeps_body():
    r = parse_html('<html><head><title>T</title><body><p>hello world</p>'
                   "</body></html>", "http://a.com/")
    assert r["title"] == "T" and "hello world" in r["markdown"]


def test_link_inside_table_cell():
    r = parse_html('<table><tr><th>h</th></tr><tr><td>'
                   '<a href="/x">Click</a></td></tr></table>',
                   "http://a.com/page")
    assert r["links"] and r["links"][0]["text"] == "Click"
    # the rendered link lands inside the table cell, not as a stray
    # text span before the table
    assert not any(s["kind"] == "text" and "](http" in s["text"]
                   for s in r["spans"])


def test_unclosed_anchor_autocloses():
    r = parse_html('<p><a href="/x">first<a href="/y">second</a></p>',
                   "http://a.com/")
    hrefs = [l["href"] for l in r["links"]]
    assert "http://a.com/x" in hrefs and "http://a.com/y" in hrefs
    assert "first" in r["markdown"] and "second" in r["markdown"]


# ---------------------------------------------------------------------------
# fast-tokenizer differential gate: the single-shot event loop in
# stages/parse.py (_fast_feed) must be byte-equal to the stdlib-driven
# parser on every document it accepts, and must actually accept the
# synthetic corpus (a silent bail would regress parse throughput 1.5x).
# ---------------------------------------------------------------------------

_QUIRKS = [
    '<a href=x disabled>t</a>', '<a href="a&amp;b">x</a>', 'a &lt; b',
    '<br/>', '<A HREF="X">u</A>', 'x < y', '<img src=a.png />',
    '<img src=a.png/>', '<script>if (a<b) {}</script>after', '< notag>',
    '<a href = "q" >z</a>', '<em/>t', '<a b="1"b2="2">j</a>',
    "<p class='q'>k", '<a =>v</a>', '<!DOCTYPE html><p>hi</p>',
    '<!-- c --><p>d</p>', '<?xml version="1.0"?><p>e</p>',
    '<a href=x/ >y</a>', '<a href=x/>y</a>', '<a href=x//>y', '<br / >',
    '<input value=5/3>', '<a b=/>x', '</a >', '</a b>', '</ a>',
    '<a href="x>z"">q</a>', '<hr/ >', '<p>a<p>b', '<td>x</td>',
    '<STYLE>p{}</STYLE>ok', '<script>x</SCRIPT>y',
    '<title>A &amp; B</title>', '<p>tail', '<p>&', '<p>&amp',
    '<p>a&#65;b', '<p><', 'x<', '<>', '<p data-x data-y="1">z</p>',
    '<video><source src="v.mp4"></video>',
    '<base href="/sub/"><a href="rel">r</a>', '<a href="#f">f</a>',
    '<ul><li>a<li>b</ul>', '<pre>a\n  b</pre>', '<code>c</code>',
    '<table summary="s"><tr><th>h</th></tr>'
    '<tr><td colspan="2">c</td></tr></table>',
]


def _synth_corpus(limit=120):
    from crawl4ai_ray.sources.synthetic_web import SiteConfig
    from crawl4ai_ray.stages.fetch import SyntheticFetcher

    f = SyntheticFetcher(SiteConfig(n_hosts=4))
    pages, seen = [], set()
    frontier = [f"http://h{k:04d}.test/" for k in range(4)]
    seen.update(frontier)
    while frontier and len(pages) < limit:
        u = frontier.pop(0)
        pg = f.fetch_one(u)
        if pg["status"] != 200:
            continue
        pages.append((pg["html"], u))
        for link in parse_html(pg["html"], u)["links"]:
            if link["internal"] and link["href"] not in seen:
                seen.add(link["href"])
                frontier.append(link["href"])
    return pages


def test_fast_tokenizer_differential():
    docs = _synth_corpus()
    docs += [(q, "http://h0000.test/quirk") for q in _QUIRKS]
    docs += [("<html><head><title>T</title></head><body>%s</body></html>" % q,
              "http://h0000.test/quirk2") for q in _QUIRKS]
    for cite in (False, True):
        for h, u in docs:
            a = parse_html(h, u, fast=True, citations=cite)
            b = parse_html(h, u, fast=False, citations=cite)
            assert json.dumps(a, sort_keys=True) == \
                json.dumps(b, sort_keys=True), (u, h[:120], cite)


def test_fast_tokenizer_accepts_synthetic_corpus():
    from crawl4ai_ray.stages.parse import SpanHTMLParser, _fast_feed

    for h, u in _synth_corpus(limit=60):
        _fast_feed(SpanHTMLParser(u), h)  # must not raise (no bail)


def test_fast_tokenizer_bails_to_stdlib_not_empty():
    # a marked section forces a bail; output must equal the stdlib result
    h = "<p>a</p><![CDATA[x > y]]><p>b</p>"
    assert json.dumps(parse_html(h, "http://a.com/", fast=True),
                      sort_keys=True) == \
        json.dumps(parse_html(h, "http://a.com/", fast=False),
                   sort_keys=True)
