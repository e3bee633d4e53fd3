"""Robustness fixture: parse the reference repo's saved real-world page
(tests/async/sample_wikipedia.html — used as INPUT DATA only) through the
span parser. Mirrors the reference's own fixture-based testing strategy
(SURVEY.md §5). Skipped if the reference checkout is absent."""

import os

import pytest

SAMPLE = "/root/reference/tests/async/sample_wikipedia.html"


@pytest.mark.skipif(not os.path.exists(SAMPLE),
                    reason="reference fixture not available")
def test_parse_real_wikipedia_page():
    from crawl4ai_ray.stages.parse import parse_html

    with open(SAMPLE, encoding="utf-8", errors="replace") as f:
        html = f.read()
    r = parse_html(html, "https://en.wikipedia.org/wiki/Test")
    # structural sanity on a large real page
    assert len(r["markdown"]) > 1000
    assert len(r["links"]) > 50
    assert any(not l["internal"] for l in r["links"])
    assert any(l["internal"] for l in r["links"])
    kinds = {s["kind"] for s in r["spans"]}
    assert "text" in kinds
    offsets = [s["offset"] for s in r["spans"]]
    assert offsets == list(range(len(offsets)))
    assert r["title"] != ""
    # deterministic
    r2 = parse_html(html, "https://en.wikipedia.org/wiki/Test")
    assert r2["spans"] == r["spans"]


@pytest.mark.skipif(not os.path.exists(SAMPLE),
                    reason="reference fixture not available")
def test_real_page_through_batch_stage():
    import pyarrow as pa

    from crawl4ai_ray.stages.parse import parse_html_batch

    with open(SAMPLE, encoding="utf-8", errors="replace") as f:
        html = f.read()
    batch = pa.table({"url": ["https://en.wikipedia.org/wiki/Test"],
                      "html": [html]})
    out = parse_html_batch(batch)
    assert out.num_rows == 1
    assert len(out.column("spans").to_pylist()[0]) > 0
