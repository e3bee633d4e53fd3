"""JSON-CSS extraction (M26) + scalar text utils (§2.8, M24) tests."""

import pyarrow as pa

from crawl4ai_ray.functions.json_css import JsonCssExtractor, extract
from crawl4ai_ray.functions.selectors import parse_dom, select
from crawl4ai_ray.functions.textutils import (
    calculate_link_intrinsic_score,
    chunk_documents,
    clean_tokens,
    escape_json_string,
    sanitize_input_encode,
    split_and_parse_json_objects,
)

HTML = """
<html><body>
<div id="store">
  <div class="product" data-sku="A1">
    <h2 class="name">Widget <em>Pro</em></h2>
    <span class="price">$9.99</span>
    <a class="buy" href="/buy/a1">Buy now</a>
  </div>
  <div class="product" data-sku="B2">
    <h2 class="name">Gadget</h2>
    <span class="price">$19.50</span>
    <a class="buy" href="/buy/b2">Buy now</a>
  </div>
</div>
<ul><li class="tag">x</li><li class="tag">y</li></ul>
</body></html>
"""


def test_selectors():
    dom = parse_dom(HTML)
    assert len(select(dom, ".product")) == 2
    assert len(select(dom, "div.product")) == 2
    assert select(dom, "#store") != []
    assert len(select(dom, "div.product > h2")) == 2
    assert len(select(dom, "[data-sku=A1]")) == 1
    assert len(select(dom, ".name, .price")) == 4
    assert select(dom, ".product .buy")[0].attrs["href"] == "/buy/a1"
    assert select(dom, "ul > li.tag")[1].text() == "y"


def test_json_css_extract():
    schema = {
        "name": "products",
        "baseSelector": "div.product",
        "fields": [
            {"name": "sku", "type": "attribute", "attribute": "data-sku"},
            {"name": "title", "selector": "h2.name", "type": "text"},
            {"name": "price", "selector": ".price", "type": "regex",
             "pattern": r"\$([\d.]+)"},
            {"name": "link", "selector": "a.buy", "type": "attribute",
             "attribute": "href"},
            {"name": "missing", "selector": ".nope", "type": "text",
             "default": "n/a"},
        ],
    }
    items = extract(HTML, schema)
    assert items == [
        {"sku": "A1", "title": "Widget Pro", "price": "9.99",
         "link": "/buy/a1", "missing": "n/a"},
        {"sku": "B2", "title": "Gadget", "price": "19.50",
         "link": "/buy/b2", "missing": "n/a"},
    ]


def test_json_css_nested_and_list():
    schema = {
        "baseSelector": "#store",
        "fields": [
            {"name": "products", "type": "list", "selector": ".product",
             "fields": [
                 {"name": "title", "selector": ".name", "type": "text"},
             ]},
            {"name": "first", "type": "nested", "selector": ".product",
             "fields": [
                 {"name": "sku", "type": "attribute",
                  "attribute": "data-sku"},
             ]},
        ],
    }
    items = extract(HTML, schema)
    assert items[0]["products"] == [{"title": "Widget Pro"},
                                    {"title": "Gadget"}]
    assert items[0]["first"] == {"sku": "A1"}


def test_json_css_batch_stage():
    batch = pa.table({"url": ["u1"], "html": [HTML]})
    out = JsonCssExtractor({"baseSelector": ".product",
                            "fields": [{"name": "t", "selector": ".name",
                                        "type": "text"}]})(batch)
    assert out.num_rows == 2
    assert out.column("doc_key").to_pylist() == ["u1", "u1"]


def test_chunk_documents():
    docs = ["one two three four five six seven eight"]
    chunks = list(chunk_documents(docs, chunk_token_threshold=3, overlap=0,
                                  word_token_rate=1.0))
    assert chunks == ["one two three", "four five six", "seven eight"]
    # overlap re-queues tail tokens
    chunks2 = list(chunk_documents(docs, chunk_token_threshold=4, overlap=1,
                                   word_token_rate=1.0))
    joined = " ".join(chunks2).split()
    assert set(joined) == set(docs[0].split())


def test_sanitizers_and_json_split():
    assert sanitize_input_encode("") == ""
    assert sanitize_input_encode("héllo") == "héllo"
    assert escape_json_string('a"b\nc') == 'a\\"b\\nc'
    parsed, bad = split_and_parse_json_objects(
        '[{"a": 1}, {"b": 2}, {broken]'
    )
    assert parsed == [{"a": 1}, {"b": 2}]
    assert len(bad) == 0 or len(bad) == 1


def test_clean_tokens():
    out = clean_tokens(["The", "quick", "brown", "fox", "a", "!", "and"])
    assert out == ["quick", "brown", "fox"]


def test_link_intrinsic_score():
    good = calculate_link_intrinsic_score(
        "http://a.com/docs/guide.html", "Complete installation guide",
        context="installation docs", page_keywords=["installation"])
    bad = calculate_link_intrinsic_score(
        "http://a.com/x/y/z/w/v/u/t/file.zip?q=1#f", "click here")
    assert good > bad
    assert 0.0 <= bad < good <= 10.0


# -- XPath extraction variant (M26; extraction_strategy.py:1612-1674) -------

XPATH_HTML = """
<html><body>
  <div class="products">
    <div class="item" data-sku="A1">
      <h2>Widget <b>Pro</b></h2>
      <span class="price">$9.99</span>
      <ul><li>red</li><li>blue</li></ul>
      <div class="meta"><span class="brand">Acme</span></div>
    </div>
    <div class="item" data-sku="B2">
      <h2>Gadget</h2>
      <span class="price">$19.50</span>
      <ul><li>green</li></ul>
      <div class="meta"><span class="brand">Globex</span></div>
    </div>
  </div>
</body></html>"""


def test_xpath_extract_nested_list_attr_regex_position():
    from crawl4ai_ray.functions.json_css import extract_xpath

    schema = {
        "name": "products",
        "baseSelector": "//div[@class='item']",
        "fields": [
            {"name": "title", "selector": ".//h2", "type": "text"},
            {"name": "sku", "selector": ".", "type": "attribute",
             "attribute": "data-sku"},
            {"name": "price", "selector": ".//span[@class='price']",
             "type": "regex", "pattern": r"\$([\d.]+)"},
            {"name": "colors", "selector": ".//li", "type": "list"},
            {"name": "meta", "selector": ".//div[@class='meta']",
             "type": "nested",
             "fields": [{"name": "brand",
                         "selector": ".//span[contains(@class,'brand')]",
                         "type": "text"}]},
            {"name": "first_li", "selector": ".//ul/li[1]", "type": "text"},
            {"name": "missing", "selector": ".//em", "type": "text",
             "default": "n/a"},
        ],
    }
    rows = extract_xpath(XPATH_HTML, schema)
    assert rows == [
        {"title": "Widget Pro", "sku": "A1", "price": "9.99",
         "colors": ["red", "blue"], "meta": {"brand": "Acme"},
         "first_li": "red", "missing": "n/a"},
        {"title": "Gadget", "sku": "B2", "price": "19.50",
         "colors": ["green"], "meta": {"brand": "Globex"},
         "first_li": "green", "missing": "n/a"},
    ]


def test_xpath_css_fallback_matches_css_engine():
    """Selectors without '/' run through the reference's naive CSS→XPath
    conversion (extraction_strategy.py:1645-1658): plain tag and
    descendant-space forms agree with the CSS engine."""
    from crawl4ai_ray.functions.json_css import extract, extract_xpath

    schema = {
        "name": "p", "baseSelector": "//div[@class='item']",
        "fields": [
            {"name": "t", "selector": "h2", "type": "text"},
            {"name": "b", "selector": "div span", "type": "text"},
        ],
    }
    xp = extract_xpath(XPATH_HTML, schema)
    assert [r["t"] for r in xp] == ["Widget Pro", "Gadget"]
    assert [r["b"] for r in xp] == ["Acme", "Globex"]


def test_xpath_predicates():
    from crawl4ai_ray.functions.selectors import parse_dom, xpath_select

    dom = parse_dom(XPATH_HTML)
    assert len(xpath_select(dom, "//div[@class='item']")) == 2
    assert len(xpath_select(dom, "//span[@class]")) == 4
    assert [n.text() for n in
            xpath_select(dom, "//div[@data-sku='B2']//h2")] == ["Gadget"]
    assert [n.text() for n in
            xpath_select(dom, "//li[contains(text(),'re')]")] == \
        ["red", "green"]
    assert [n.text() for n in
            xpath_select(dom, "//ul/li[2]")] == ["blue"]
    assert xpath_select(dom, "//nothing") == []


def test_xpath_positional_binds_per_parent():
    """Code-review r2 regression: //p[1] returns the FIRST p OF EVERY
    PARENT (lxml semantics), not the first of the pooled descendants."""
    from crawl4ai_ray.functions.selectors import parse_dom, xpath_select

    dom = parse_dom("<div><p>a</p><p>b</p></div>"
                    "<div><p>c</p><p>d</p></div>")
    assert [n.text() for n in xpath_select(dom, "//p[1]")] == ["a", "c"]
    assert [n.text() for n in xpath_select(dom, "//p[2]")] == ["b", "d"]
    assert [n.text() for n in xpath_select(dom, "//div[1]/p[1]")] == ["a"]
