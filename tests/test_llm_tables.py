"""LLMTableExtraction chunking/merge laws (reference
table_extraction.py:320-1396) — structure quirks, greedy chunking,
merge completeness, validation/format normalization, CSS selection,
and the Ray stage."""

import json

import pytest

from crawl4ai_ray.functions.llm_tables import (
    FakeTableLLMClient,
    LLMTableExtraction,
    estimate_tokens,
    llm_extract_tables,
    sanitize_html,
    synth_table_html,
)


def make_table(n_rows, *, thead=True, tfoot=False, cells=2, pad=""):
    head = ("<thead><tr>" + "".join(f"<th>h{i}</th>" for i in range(cells))
            + "</tr></thead>") if thead else ""
    body = "".join(
        "<tr>" + "".join(f"<td>r{r}c{c}{pad}</td>" for c in range(cells))
        + "</tr>" for r in range(n_rows))
    foot = ("<tfoot><tr>" + "".join(f"<td>f{i}</td>" for i in range(cells))
            + "</tr></tfoot>") if tfoot else ""
    return f"<table>{head}<tbody>{body}</tbody>{foot}</table>"


# -- structure law (:923-982) -------------------------------------------------

def test_structure_thead_tbody_tfoot():
    s = LLMTableExtraction()
    h, b, f, has = s._extract_table_structure(
        make_table(4, thead=True, tfoot=True))
    assert (len(h), len(b), len(f), has) == (1, 4, 1, True)


def test_structure_leading_th_rows():
    html = ("<table><tr><th>a</th></tr><tr><th>b</th></tr>"
            "<tr><td>1</td></tr><tr><th>late</th></tr></table>")
    s = LLMTableExtraction()
    h, b, f, has = s._extract_table_structure(html)
    # leading run of th rows only; the late th row stays in the body
    assert (len(h), len(b), has) == (2, 2, True)


def test_structure_no_header_no_tbody_footer_duplicated():
    # QUIRK (:978-980): body = ALL rows, so the tfoot row appears in both
    html = ("<table><tr><td>1</td></tr><tr><td>2</td></tr>"
            "<tfoot><tr><td>f</td></tr></tfoot></table>")
    s = LLMTableExtraction()
    h, b, f, has = s._extract_table_structure(html)
    assert not has and len(f) == 1
    assert len(b) == 3  # 2 data rows + the footer row again


def test_structure_first_table_only():
    html = make_table(2) + make_table(9)
    s = LLMTableExtraction()
    _, b, _, _ = s._extract_table_structure(html)
    assert len(b) == 2


# -- chunk laws (:892-1083) ----------------------------------------------------

def test_needs_chunking_threshold_strict():
    s = LLMTableExtraction(chunk_token_threshold=10)
    assert not s._needs_chunking("x" * 40)   # 40//4 == 10, not > 10
    assert s._needs_chunking("x" * 44)


def test_smart_chunks_greedy_law():
    html = make_table(20, tfoot=True)
    s = LLMTableExtraction(chunk_token_threshold=30)
    chunks, has = s._create_smart_chunks(html)
    assert has and len(chunks) > 1
    # replay the greedy law
    hdr, body, foot, _ = s._extract_table_structure(html)
    header_html = "<thead>" + "".join(r.html() for r in hdr) + "</thead>"
    expect, cur, tok = 1, 1, estimate_tokens(header_html)
    first = True
    for r in body:
        rt = estimate_tokens(r.html())
        if not first and tok + rt > 30:
            expect += 1
            tok = estimate_tokens(header_html) + rt
        else:
            tok += rt
            first = False
        first = False
    assert len(chunks) == expect
    # header in every chunk; footer only in the last
    assert all("<thead>" in c for c in chunks)
    assert "<tfoot>" in chunks[-1]
    assert all("<tfoot>" not in c for c in chunks[:-1])
    # every chunk is a complete table
    assert all(c.startswith("<table>") and c.endswith("</table>")
               for c in chunks)


def test_chunk_always_holds_one_row():
    # a row alone exceeds the threshold: the law still emits it
    html = make_table(3, pad="y" * 400)
    s = LLMTableExtraction(chunk_token_threshold=20)
    chunks, _ = s._create_smart_chunks(html)
    assert len(chunks) == 3


def test_rebalance_is_noop():
    s = LLMTableExtraction(min_rows_per_chunk=50)
    chunks = ["<table>a</table>", "<table>b</table>"]
    assert s._rebalance_chunks(chunks, 50) == chunks


# -- merge law (:1172-1206) ------------------------------------------------------

def test_merge_concat_and_metadata():
    s = LLMTableExtraction()
    mk = lambda i, rows, hdrs: {
        "chunk_index": i,
        "table": {"headers": hdrs, "rows": rows,
                  "caption": f"cap{i}", "summary": "",
                  "metadata": {"row_count": len(rows)}}}
    out = s._merge_chunk_results([
        mk(2, [["e"], ["f"]], ["late"]),
        mk(0, [["a"], ["b"]], ["first"]),
        {"chunk_index": 1, "table": None},   # failed chunk dropped
        mk(3, [["g"]], ["x"]),
    ])
    assert len(out) == 1
    t = out[0]
    assert t["headers"] == ["first"]         # first valid chunk's headers win
    assert t["caption"] == "cap0"
    assert t["rows"] == [["a"], ["b"], ["e"], ["f"], ["g"]]
    assert t["metadata"]["row_count"] == 5
    assert t["metadata"]["chunked"] is True
    assert t["metadata"]["chunk_count"] == 3


def test_merge_all_failed():
    s = LLMTableExtraction()
    assert s._merge_chunk_results([{"chunk_index": 0, "table": None}]) == []


# -- unwrap + validate + format (:816-836, 1304-1396) ----------------------------

def test_unwrap_wrapper_keys_and_nesting():
    u = LLMTableExtraction._unwrap
    t = {"headers": ["a"], "rows": []}
    assert u({"result": [t]}) == [t]
    assert u({"tables": [t]}) == [t]
    assert u({"data": [t]}) == [t]
    assert u(t) == [t]                        # bare dict wrapped
    assert u([[t]]) == [t]                    # nested list flattened
    # 'result' wins over 'tables' (elif order)
    assert u({"result": [t], "tables": []}) == [t]


def test_validate_flattens_nested():
    t = {"headers": [["a", "b"]], "rows": [[["1", "2"]], ["3", "4"]]}
    assert LLMTableExtraction._validate_table_structure(t)
    assert t["headers"] == ["a", "b"]
    assert t["rows"] == [["1", "2"], ["3", "4"]]
    assert not LLMTableExtraction._validate_table_structure({"rows": []})
    assert not LLMTableExtraction._validate_table_structure(
        {"headers": ["a"], "rows": "nope"})
    assert not LLMTableExtraction._validate_table_structure(
        {"headers": ["a"], "rows": ["not-a-list"]})


def test_ensure_format_pads_and_truncates():
    t = LLMTableExtraction._ensure_table_format(
        {"headers": ["a", "b", "c"],
         "rows": [["1"], ["1", "2", "3", "4"]]})
    assert t["rows"] == [["1", "", ""], ["1", "2", "3"]]
    assert t["metadata"]["row_count"] == 2
    assert t["metadata"]["column_count"] == 3
    assert t["metadata"]["has_headers"] is True
    assert t["caption"] == "" and t["summary"] == ""


# -- CSS selection (:1259-1302) ---------------------------------------------------

def test_css_selector_paths():
    html = ('<div id="keep">' + make_table(2) + "</div>"
            '<div class="other">' + make_table(5) + "</div>")
    assert LLMTableExtraction(css_selector="#keep") \
        .extract_tables(html)[0]["metadata"]["row_count"] == 2
    assert LLMTableExtraction(css_selector=".other") \
        .extract_tables(html)[0]["metadata"]["row_count"] == 5
    assert LLMTableExtraction(css_selector="div.other") \
        .extract_tables(html)[0]["metadata"]["row_count"] == 5
    assert LLMTableExtraction(css_selector="#absent") \
        .extract_tables(html) == []
    # substring class matching, as the reference's contains() does
    html2 = '<div class="otherish">' + make_table(1) + "</div>"
    assert LLMTableExtraction(css_selector=".other") \
        .extract_tables(html2)[0]["metadata"]["row_count"] == 1


def test_no_table_returns_empty():
    assert LLMTableExtraction().extract_tables("<div>plain</div>") == []


# -- end-to-end with the stub client ---------------------------------------------

def test_single_extraction_grid_expansion():
    html = ("<table><caption>cap</caption>"
            "<thead><tr><th>Cat</th><th>Item</th></tr></thead><tbody>"
            '<tr><td rowspan="2">A</td><td>i1</td></tr>'
            "<tr><td>i2</td></tr>"
            '<tr><td colspan="2">wide</td></tr>'
            "</tbody></table>")
    out = LLMTableExtraction(enable_chunking=False).extract_tables(html)
    assert len(out) == 1
    t = out[0]
    assert t["caption"] == "cap"
    assert t["headers"] == ["Cat", "Item"]
    assert t["rows"] == [["A", "i1"], ["A", "i2"], ["wide", "wide"]]
    assert t["metadata"]["has_merged_cells"] is True


def test_chunked_equals_unchunked_rows():
    html = make_table(40, tfoot=True)
    whole = LLMTableExtraction(enable_chunking=False).extract_tables(html)
    chunked = LLMTableExtraction(chunk_token_threshold=40) \
        .extract_tables(html)
    assert len(whole) == 1 and len(chunked) == 1
    assert chunked[0]["metadata"]["chunked"] is True
    assert chunked[0]["metadata"]["chunk_count"] > 1
    assert chunked[0]["rows"] == whole[0]["rows"]
    assert chunked[0]["headers"] == whole[0]["headers"]


def test_headerless_chunked_rows_complete():
    html = ("<table>" + "".join(f"<tr><td>v{r}</td></tr>"
                                for r in range(30)) + "</table>")
    out = LLMTableExtraction(chunk_token_threshold=25).extract_tables(html)
    assert len(out) == 1
    assert out[0]["headers"] == []
    assert [r[0] for r in out[0]["rows"]] == [f"v{r}" for r in range(30)]


def test_usage_accounting():
    s = LLMTableExtraction(chunk_token_threshold=40)
    s.extract_tables(make_table(40))
    assert s.total_usage.total_tokens > 0
    assert (s.total_usage.total_tokens
            == s.total_usage.prompt_tokens + s.total_usage.completion_tokens)


def test_sanitize_html_quotes_roundtrip():
    html = '<td data-x="a\'b">v</td>'
    assert sanitize_html(html) == '<td data-x=\\"a\\\'b\\">v</td>'


def test_bad_client_returns_empty():
    class Bad:
        def complete(self, prompt):
            from crawl4ai_ray.functions.llm_extract import LLMResponse
            return LLMResponse("not json at all")

    assert LLMTableExtraction(client=Bad(), max_tries=2) \
        .extract_tables(make_table(2)) == []


# -- Ray stage ------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_llm_extract_tables_query(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(6)], pa.string()),
        "text": pa.array(
            ["alpha beta gamma delta"] * 3
            + [" ".join(f"w{j}" for j in range(600))] * 3, pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = llm_extract_tables(str(tmp_path)).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 6
    # caption survives only on the unchunked path: chunk HTML is rebuilt
    # from header/body/footer (:1056-1074), so <caption> never reaches
    # the model for chunked tables — reference behavior
    assert list(out["caption"]) == ["d0", "d1", "d2", "", "", ""]
    # short docs: 4 words → 2 rows of 3 cols (padded); long docs chunked
    assert all(out["row_count"][:3] == 2)
    assert all(out["row_count"][3:] == 200)
    assert not any(out["chunked"][:3]) and all(out["chunked"][3:])
    assert all(out["chunk_count"][3:] > 1)
    # byte-parity with the driver-side strategy on the same synth html
    strat = LLMTableExtraction(chunk_token_threshold=300)
    t = strat.extract_tables(
        synth_table_html("d5", " ".join(f"w{j}" for j in range(600))))[0]
    row5 = out[out["doc_id"] == "d5"].iloc[0]
    assert row5["row_count"] == t["metadata"]["row_count"]
    assert row5["first_cell"] == t["rows"][0][0]
    assert row5["last_cell"] == t["rows"][-1][-1]
