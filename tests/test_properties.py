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


@settings(max_examples=50, deadline=None)
@given(vals=st.lists(st.integers(min_value=-10**6, max_value=10**6),
                     min_size=1, max_size=3000),
       q=st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9, 0.99]))
def test_tdigest_rank_error_bound_property(vals, q):
    import numpy as np

    from crawl4ai_ray.pipelines.sketches import (
        tdigest_compress,
        tdigest_quantile,
    )

    # integer-valued floats: denormal-magnitude atoms make midpoint
    # interpolation land on ranks no quantile summary can bound
    v = np.array(vals, dtype=np.float64)
    m, w = tdigest_compress(v, np.ones(len(v)), delta=100)
    assert w.sum() == len(v)
    est = tdigest_quantile(m, w, q)
    exact = np.sort(v)
    lo = np.searchsorted(exact, est, side="left") / len(v)
    hi = np.searchsorted(exact, est, side="right") / len(v)
    # the estimate's rank interval must come within ~3/delta of q,
    # plus a 2/n term for tiny or atom-heavy streams where midpoint
    # interpolation between duplicate-valued centroids dominates
    tol = 0.03 + 2.0 / len(v)
    assert lo - tol <= q <= hi + tol, (q, est, lo, hi)


@settings(max_examples=50, deadline=None)
@given(keys=st.lists(st.integers(min_value=-2**62, max_value=2**62),
                     min_size=1, max_size=2000, unique=True))
def test_bloom_never_false_negative_property(keys):
    import numpy as np

    from crawl4ai_ray.pipelines.sketches import (
        _bloom_indices,
        bloom_params,
        bloom_probe_mask,
    )

    m, k = bloom_params(len(keys), 0.01)
    arr = np.array(keys, dtype=np.int64)
    bits = np.zeros(m // 8, dtype=np.uint8)
    idx = _bloom_indices(arr, m, k).ravel()
    np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                     (1 << (idx & np.uint64(7))).astype(np.uint8))
    assert bloom_probe_mask(arr, bits, m, k).all()


@settings(max_examples=40, deadline=None)
@given(stream=st.lists(st.sampled_from(list("abcdefghij")),
                       max_size=2000),
       cap=st.integers(min_value=2, max_value=12))
def test_misra_gries_bound_property(stream, cap):
    import collections

    from crawl4ai_ray.pipelines.sketches import mg_summarize

    s = mg_summarize(stream, cap)
    true = collections.Counter(stream)
    assert len(s) <= cap
    for t, c in s.items():
        assert 0 < c <= true[t]
        assert true[t] - c <= len(stream) // (cap + 1)


# ---------------------------------------------------------------------------
# r4: authkit JWT laws (HS256 round-trip, tamper/expiry rejection)
# ---------------------------------------------------------------------------


@given(st.text(min_size=1, max_size=40),
       st.text(alphabet="abcdefghij@._-", min_size=1, max_size=30))
@settings(max_examples=60, deadline=None)
def test_authkit_roundtrip_and_tamper(secret, sub):
    from crawl4ai_ray.functions.authkit import (AuthError,
                                                create_access_token,
                                                verify_token)

    tok = create_access_token({"sub": sub}, secret)
    assert verify_token(tok, secret)["sub"] == sub
    # a different secret must fail
    try:
        verify_token(tok, secret + "x")
        raise AssertionError("wrong secret must fail")
    except AuthError:
        pass
    # flipping a payload char must fail (either signature or decode)
    h, b, s_ = tok.split(".")
    bad = h + "." + ("A" if b[0] != "A" else "B") + b[1:] + "." + s_
    try:
        verify_token(bad, secret)
        raise AssertionError("tampered token must fail")
    except AuthError:
        pass


def test_authkit_expiry():
    from crawl4ai_ray.functions.authkit import (AuthError,
                                                create_access_token,
                                                verify_token)

    tok = create_access_token({"sub": "x"}, "k", expires_minutes=-1)
    try:
        verify_token(tok, "k")
        raise AssertionError("expired must fail")
    except AuthError:
        pass


# ---- edit-distance join kernels (dedup.edit_distance_join) ----

def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(st.text(max_size=12), st.text(max_size=12)),
                min_size=1, max_size=20))
def test_lev_batch_matches_reference(pairs):
    from crawl4ai_ray.pipelines.dedup import _lev_batch
    sa = [p[0] for p in pairs]
    sb = [p[1] for p in pairs]
    got = _lev_batch(sa, sb)
    for x, y, g in zip(sa, sb, got):
        assert g == _lev_ref(x, y)


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="ab#", max_size=10),
       st.text(alphabet="ab#", max_size=10),
       st.integers(min_value=1, max_value=2))
def test_symmetric_delete_blocking_complete(a, b, d):
    """FastSS completeness: any pair within edit distance d shares a
    member of their up-to-d-deletions neighborhoods — the lemma
    edit_distance_join's candidate generation relies on."""
    from crawl4ai_ray.pipelines.dedup import _del_variants
    if _lev_ref(a, b) <= d:
        assert _del_variants(a, d) & _del_variants(b, d)
