"""Table-driven URL canonicalization cases, mirroring the reference's
tests/test_normalize_url.py style (hand-derived expected values from the
documented semantics of normalize_url_for_deep_crawl / normalize_url)."""

from crawl4ai_ray.functions import urlkit


BASE = "http://example.com/dir/page.html"


def test_canonicalize_relative():
    assert urlkit.canonicalize("sub/x.html", BASE) == \
        "http://example.com/dir/sub/x.html"
    assert urlkit.canonicalize("/abs", BASE) == "http://example.com/abs"
    assert urlkit.canonicalize("../up", BASE) == "http://example.com/up"


def test_canonicalize_case_and_slash():
    assert urlkit.canonicalize("HTTP://ExAmPle.COM/Path/", BASE) == \
        "http://example.com/Path"
    # all trailing slashes stripped; root becomes empty path
    assert urlkit.canonicalize("http://example.com/", BASE) == \
        "http://example.com"
    assert urlkit.canonicalize("http://example.com/a///", BASE) == \
        "http://example.com/a"


def test_canonicalize_fragment_dropped():
    assert urlkit.canonicalize("http://example.com/a#sec", BASE) == \
        "http://example.com/a"


def test_canonicalize_tracking_params():
    # the deep-crawl normalizer drops utm_source/utm_medium/utm_campaign/
    # ref/fbclid but KEEPS utm_term etc. (smaller list than normalize_url)
    assert urlkit.canonicalize(
        "http://example.com/a?utm_source=x&q=1&ref=y", BASE
    ) == "http://example.com/a?q=1"
    assert urlkit.canonicalize(
        "http://example.com/a?utm_term=kept&q=1", BASE
    ) == "http://example.com/a?utm_term=kept&q=1"


def test_canonicalize_query_order_preserved():
    # parse_qs preserves first-occurrence order; no sorting in this variant
    assert urlkit.canonicalize("http://example.com/a?b=2&a=1", BASE) == \
        "http://example.com/a?b=2&a=1"


def test_canonicalize_blank_values_dropped():
    # parse_qs default drops blank values
    assert urlkit.canonicalize("http://example.com/a?x=&y=2", BASE) == \
        "http://example.com/a?y=2"


def test_canonicalize_empty():
    assert urlkit.canonicalize("", BASE) is None
    assert urlkit.canonicalize(None, BASE) is None


def test_normalize_url_sorts_and_lowercases_keys():
    assert urlkit.normalize_url("http://example.com/a?B=2&a=1", BASE) == \
        "http://example.com/a?a=1&b=2"
    assert urlkit.normalize_url(
        "http://example.com/a?gclid=z&q=1", BASE
    ) == "http://example.com/a?q=1"


def test_normalize_url_trailing_slash_single():
    assert urlkit.normalize_url("http://example.com/a/", BASE) == \
        "http://example.com/a"
    assert urlkit.normalize_url("http://example.com/", BASE) == \
        "http://example.com/"


def test_valid_crawl_url():
    assert urlkit.is_valid_crawl_url("http://a.com/x")
    assert urlkit.is_valid_crawl_url("https://a.co.uk")
    assert not urlkit.is_valid_crawl_url("ftp://a.com")
    assert not urlkit.is_valid_crawl_url("http://localhost/x")  # no dot
    assert not urlkit.is_valid_crawl_url("not a url")


def test_base_domain():
    assert urlkit.base_domain("http://www.example.com/a") == "example.com"
    assert urlkit.base_domain("http://a.b.example.co.uk/x") == "example.co.uk"
    assert urlkit.base_domain("http://example.com") == "example.com"


def test_is_external():
    assert not urlkit.is_external("http://www.example.com/a",
                                  "http://example.com/")
    assert urlkit.is_external("http://other.com/a", "http://example.com/")


def test_hash64_stable():
    h = urlkit.hash64("http://example.com/a")
    assert h == urlkit.hash64("http://example.com/a")
    assert h != urlkit.hash64("http://example.com/b")
    assert 0 <= h < 2 ** 64
    arr = urlkit.hash64_batch(["x", "y", "x"])
    assert arr[0] == arr[2] != arr[1]
