"""Property-based tests (hypothesis): canonicalization idempotence, parser
robustness on arbitrary input, span-offset contiguity, chunker coverage."""

from hypothesis import given, settings, strategies as st

from crawl4ai_ray.functions.chunking import (
    FixedLengthWordChunking,
    OverlappingWindowChunking,
)
from crawl4ai_ray.functions.urlkit import canonicalize, hash64
from crawl4ai_ray.stages.parse import parse_html

_url_path = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd"),
                           whitelist_characters="/-._~"),
    max_size=40,
)


@settings(max_examples=200, deadline=None)
@given(path=_url_path, query=st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd"),
                           whitelist_characters="=&"), max_size=20))
def test_canonicalize_idempotent(path, query):
    url = f"http://example.com/{path}" + (f"?{query}" if query else "")
    c1 = canonicalize(url, url)
    if c1 is None:
        return
    c2 = canonicalize(c1, c1)
    assert c2 == c1, (url, c1, c2)


@settings(max_examples=100, deadline=None)
@given(s=st.text(max_size=50))
def test_hash64_range(s):
    h = hash64(s)
    assert 0 <= h < 2 ** 64


@settings(max_examples=150, deadline=None)
@given(html=st.text(max_size=400))
def test_parse_never_crashes_and_offsets_contiguous(html):
    r = parse_html(html, "http://t.test/p")
    offsets = [s["offset"] for s in r["spans"]]
    assert offsets == list(range(len(offsets)))
    for s in r["spans"]:
        assert s["kind"] in ("text", "image", "video", "audio", "table")


@settings(max_examples=100, deadline=None)
@given(words=st.lists(st.text(
    alphabet=st.characters(whitelist_categories=("Ll",)), min_size=1,
    max_size=8), max_size=300),
    size=st.integers(min_value=1, max_value=50))
def test_fixed_chunker_covers_all_words(words, size):
    text = " ".join(words)
    chunks = FixedLengthWordChunking(size).chunk(text)
    assert " ".join(chunks).split() == text.split()


@settings(max_examples=50, deadline=None)
@given(n=st.integers(min_value=0, max_value=500),
       window=st.integers(min_value=2, max_value=100),
       overlap=st.integers(min_value=0, max_value=50))
def test_overlapping_chunker_terminates_and_starts_right(n, window, overlap):
    overlap = min(overlap, window - 1)
    text = " ".join(f"w{i}" for i in range(n))
    chunks = OverlappingWindowChunking(window, overlap).chunk(text)
    joined = set(" ".join(chunks).split())
    assert joined == set(text.split())
