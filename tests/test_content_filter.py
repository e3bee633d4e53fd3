"""Fit-markdown content filters (Pruning + BM25) — mirrors the behaviors
the reference pins in tests/async/test_content_filter_prune.py:67-161 and
test_content_filter_bm25.py, plus this engine's fit_markdown contract."""

import pytest

from crawl4ai_ray.functions.content_filter import (
    BM25ContentFilter,
    PruningContentFilter,
    _BM25Okapi,
    clean_tokens,
    extract_page_query,
    extract_text_chunks,
    fit_markdown_from_html,
    parse_tree,
)

BASIC_HTML = """
    <html>
        <body>
            <article>
                <h1>Main Article</h1>
                <p>This is a high-quality paragraph with substantial text content. It contains enough words to pass the threshold and has good text density without too many links. This kind of content should survive the pruning process.</p>
                <div class="sidebar">Low quality sidebar content</div>
                <div class="social-share">Share buttons</div>
            </article>
        </body>
    </html>
    """

MIXED_HTML = """
    <html>
        <body>
            <article>
                <h1>Article Title</h1>
                <p class="summary">Short summary.</p>
                <div class="content">
                    <p>Long high-quality paragraph with substantial content that should definitely survive the pruning process. This content has good text density and proper formatting which makes it valuable for retention.</p>
                </div>
                <div class="comments">
                    <p>Short comment 1</p>
                    <p>Short comment 2</p>
                </div>
            </article>
        </body>
    </html>
    """

LINK_HEAVY_HTML = """
    <html>
        <body>
            <div class="content">
                <p>Good content paragraph that should remain.</p>
                <div class="links">
                    <a href="#">Link 1</a>
                    <a href="#">Link 2</a>
                    <a href="#">Link 3</a>
                    <a href="#">Link 4</a>
                </div>
            </div>
        </body>
    </html>
    """


class TestPruning:
    def test_basic_pruning(self):
        f = PruningContentFilter(min_word_threshold=5)
        combined = " ".join(f.filter_content(BASIC_HTML)).lower()
        assert "high-quality paragraph" in combined
        assert "sidebar content" not in combined
        assert "share buttons" not in combined

    def test_min_word_threshold(self):
        f = PruningContentFilter(min_word_threshold=10)
        combined = " ".join(f.filter_content(MIXED_HTML)).lower()
        assert "short summary" not in combined
        assert "long high-quality paragraph" in combined
        assert "short comment" not in combined

    def test_link_density_impact(self):
        f = PruningContentFilter(threshold_type="dynamic")
        contents = f.filter_content(LINK_HEAVY_HTML)
        assert "good content paragraph" in " ".join(contents).lower()
        assert len([c for c in contents if "href" in c]) < 2

    def test_tag_importance(self):
        f = PruningContentFilter(threshold_type="dynamic")
        contents = f.filter_content(MIXED_HTML)
        assert any("article" in c.lower() or "h1" in c.lower()
                   for c in contents)

    def test_dynamic_link_ratio_raises_threshold(self):
        """Dynamic law: link_ratio > 0.6 multiplies the threshold by 1.2,
        so a borderline link-heavy block is removed under dynamic but kept
        under fixed at the same base threshold."""
        html = ('<html><body><div>'
                '<a href="#">all of this text lives inside one link</a>'
                ' x</div></body></html>')
        body = parse_tree(html)
        div = body.find("div")
        f = PruningContentFilter(threshold_type="fixed", threshold=0.0)

        def score_of(node):
            text_len = len(node.get_text(strip=True))
            link_len = sum(
                len(s.strip()) for s in
                (a.string for a in node.find_all("a", recursive=False))
                if s)
            return f._composite_score(node, text_len,
                                      len(node.inner_html()), link_len)

        # both body and div are link-heavy here → dynamic multiplier is
        # 1.2 (link_ratio) × 0.9 (text_ratio) = 1.08; pick a base below
        # both scores (fixed keeps everything) but where ×1.08 crosses the
        # weaker node (dynamic prunes it)
        lo = min(score_of(body), score_of(div))
        base = lo * 1.02 / 1.08
        kept_fixed = PruningContentFilter(
            threshold_type="fixed", threshold=base).filter_content(html)
        kept_dyn = PruningContentFilter(
            threshold_type="dynamic", threshold=base).filter_content(html)
        assert kept_fixed and kept_fixed != kept_dyn

    @pytest.mark.parametrize("threshold,expected_max",
                             [(0.3, 4), (0.48, 2), (0.7, 1)])
    def test_threshold_levels(self, threshold, expected_max):
        f = PruningContentFilter(threshold_type="fixed",
                                 threshold=threshold)
        assert len(f.filter_content(MIXED_HTML)) <= expected_max

    def test_empty_and_malformed(self):
        f = PruningContentFilter()
        assert f.filter_content("") == []
        assert f.filter_content(None) == []
        out = f.filter_content("<div>Unclosed div<p>Nested<span>x</div>")
        assert isinstance(out, list)

    def test_consistent_output(self):
        f = PruningContentFilter()
        assert f.filter_content(BASIC_HTML) == f.filter_content(BASIC_HTML)


class TestBM25:
    def test_query_fallbacks(self):
        body = parse_tree(BASIC_HTML)
        q = extract_page_query(body)
        assert "Main Article" in q        # h1 fallback (no title/meta)
        assert extract_page_query(body, "user words") == "user words"

    def test_chunking_blocks_vs_inline(self):
        body = parse_tree("<body><p>alpha <b>beta</b> gamma</p>"
                          "<h2>header text here</h2></body>")
        chunks = extract_text_chunks(body)
        texts = [c[1] for c in chunks]
        # reference quirk (content_filter_strategy.py:236-244): strings are
        # stripped BEFORE the "".join, so words across inline boundaries
        # concatenate — one chunk per block, not per inline element
        assert "alphabetagamma" in texts
        assert len([t for t in texts if "alpha" in t]) == 1
        kinds = {c[1]: c[2] for c in chunks}
        assert kinds.get("header text here") == "header"

    def test_filter_selects_relevant(self):
        f = BM25ContentFilter(user_query="substantial text content quality")
        blocks = f.filter_content(BASIC_HTML)
        assert any("high-quality" in b for b in blocks)
        # empty page → no query → no blocks
        assert BM25ContentFilter().filter_content("<body></body>") == []

    def test_clean_tokens(self):
        assert clean_tokens(["the", "and", "signal", "up", "↑x", "of"]) \
            == ["signal"]

    def test_bm25_okapi_ordering(self):
        corpus = [["apple", "banana"], ["apple", "apple", "apple"],
                  ["cherry", "date"]]
        bm = _BM25Okapi(corpus)
        scores = bm.get_scores(["apple"])
        assert scores[1] > scores[0] > scores[2] == 0.0

    def test_clean_element_strips_class_id(self):
        f = BM25ContentFilter(user_query="survive pruning process "
                                         "substantial")
        blocks = f.filter_content(BASIC_HTML)
        assert blocks and all("class=" not in b for b in blocks)


def test_fit_markdown_contract():
    r = fit_markdown_from_html(BASIC_HTML)
    assert r["n_blocks"] >= 1
    assert "high-quality paragraph" in r["fit_markdown"]
    assert r["fit_html"].startswith("<")
    # deterministic
    assert fit_markdown_from_html(BASIC_HTML) == r
