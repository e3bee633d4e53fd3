"""PDF pipeline: subset reader round-trips, cleanup-law goldens (byte
equality vs outputs of the reference's clean_pdf_text/_to_html), image/
link/metadata extraction, malformed-input resilience, and the Ray stage
end to end."""

import base64
import json
import zlib

import pyarrow as pa
import pytest

from crawl4ai_ray.functions.pdfkit import (
    PdfDocument,
    apply_png_predictor,
    parse_pdf_date,
    pdf_text_to_html,
    pdf_text_to_markdown,
    png_encode,
)
from crawl4ai_ray.sources.pdf_fixture import doc_text_to_pdf, make_pdf
from crawl4ai_ray.stages.pdf import PdfProcessStage, process_pdf_bytes

GOLDENS = "tests/golden/pdf_clean/goldens.json"


# -- cleanup laws vs reference goldens --------------------------------------


def test_cleanup_laws_match_reference_goldens():
    g = json.load(open(GOLDENS))
    for key, want in g["goldens"].items():
        name, p, kind = key.split("|")
        text = g["cases"][name]
        page = int(p[1:])
        got = pdf_text_to_markdown(page, text) if kind == "md" \
            else pdf_text_to_html(page, text)
        assert got == want, key


# -- reader round-trips ------------------------------------------------------


def test_text_roundtrip_multipage():
    buf = make_pdf([
        {"lines": ["First page line one.", "And line two."]},
        {"lines": ["Second page only line."]},
    ])
    doc = PdfDocument(buf)
    pages = doc.pages()
    assert len(pages) == 2
    t1, layout = doc.page_text(pages[0])
    assert t1 == "First page line one.\nAnd line two."
    assert [op["text"] for op in layout] == ["First page line one.",
                                             "And line two."]
    t2, _ = doc.page_text(pages[1])
    assert t2 == "Second page only line."


def test_text_roundtrip_uncompressed_and_special_chars():
    line = r"Parens () and backslash \ here."
    buf = make_pdf([{"lines": [line]}], compress=False)
    t, _ = PdfDocument(buf).page_text(PdfDocument(buf).pages()[0])
    assert t == line


def test_links_and_metadata():
    buf = make_pdf(
        [{"lines": ["x"], "links": ["https://a.test/1", "https://b.test"]}],
        title="My Title", author="An Author",
        created="D:20230504120000")
    doc = PdfDocument(buf)
    assert doc.page_links(doc.pages()[0]) == ["https://a.test/1",
                                              "https://b.test"]
    info = doc.info()
    assert info["title"] == "My Title"
    assert info["author"] == "An Author"
    assert info["created"] == "2023-05-04 12:00:00"
    assert not doc.encrypted


def test_image_extraction_png():
    raster = bytes(range(27))  # 3x3 RGB
    buf = make_pdf([{"lines": ["x"], "images": [
        {"width": 3, "height": 3, "mode": "RGB", "raster": raster}]}])
    doc = PdfDocument(buf)
    imgs = doc.page_images(doc.pages()[0])
    assert len(imgs) == 1
    img = imgs[0]
    assert (img["format"], img["width"], img["height"]) == ("png", 3, 3)
    png = base64.b64decode(img["data"])
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # IDAT decompresses back to filter-0 scanlines of the raster
    idat = png[png.index(b"IDAT") + 4:png.index(b"IEND") - 8]
    lines = zlib.decompress(idat)
    got = b"".join(lines[i * 10 + 1:(i + 1) * 10] for i in range(3))
    assert got == raster


def test_png_predictor_roundtrip():
    # filter type 2 (Up): encode then decode
    w, h, ch = 4, 3, 3
    raster = bytes((i * 7) % 256 for i in range(w * h * ch))
    stride = w * ch
    rows = [raster[i * stride:(i + 1) * stride] for i in range(h)]
    enc = bytearray()
    prev = b"\x00" * stride
    for r in rows:
        enc.append(2)
        enc.extend((r[j] - prev[j]) % 256 for j in range(stride))
        prev = r
    assert apply_png_predictor(bytes(enc), w, 8, ch) == raster


def test_parse_pdf_date_invalid():
    assert parse_pdf_date("D:20231301120000") is None   # month 13
    assert parse_pdf_date("garbage") is None
    assert parse_pdf_date(None) is None


def test_encrypted_flag():
    buf = make_pdf([{"lines": ["secret"]}])
    # splice /Encrypt into the trailer
    buf = buf.replace(b"trailer\n<<", b"trailer\n<< /Encrypt 99 0 R")
    doc = PdfDocument(buf)
    assert doc.encrypted
    rows = process_pdf_bytes(1, buf)
    assert rows[0]["encrypted"] and rows[0]["raw_text"] == ""


def test_malformed_inputs_degrade():
    assert process_pdf_bytes(1, b"not a pdf at all") == []
    truncated = make_pdf([{"lines": ["hello there"]}])[:80]
    assert isinstance(process_pdf_bytes(1, truncated), list)
    # damaged xref is survivable (objects found by scan)
    buf = make_pdf([{"lines": ["resilient text"]}])
    damaged = buf.replace(b"xref", b"xrEf", 1)
    rows = process_pdf_bytes(1, damaged)
    assert rows and "resilient text" in rows[0]["raw_text"]


# -- Ray stage ---------------------------------------------------------------


def test_pdf_stage_end_to_end(ray_session):
    import ray.data as rd

    docs = [
        (1, "A Nice Short Title\nBody paragraph one flows here.\n"),
        (2, "Another doc entirely. " * 50),
        (3, ""),
    ]
    t = pa.table({
        "doc_id": pa.array([d[0] for d in docs], type=pa.int64()),
        "pdf": pa.array([doc_text_to_pdf(d[0], d[1]) for d in docs],
                        type=pa.large_binary()),
    })
    out = rd.from_arrow(t).map_batches(
        PdfProcessStage, batch_format="pyarrow", batch_size=2,
        concurrency=2,
    ).to_pandas().sort_values(["doc_id", "page_number"])
    assert set(out["doc_id"]) == {1, 2, 3}
    first = out[out["doc_id"] == 1].iloc[0]
    assert first["n_images"] == 1 and first["image_formats"][0] == "png"
    assert list(first["links"]) == ["https://docs.example/1"]
    assert first["title"] == "doc-1"
    # markdown law applied (title line becomes an H2 on page 1)
    assert first["markdown"].startswith("## ")


def test_pdf_pages_query(ray_session):
    from crawl4ai_ray.pipelines.analysis import pdf_pages

    out = pdf_pages("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert (out["page_number"] >= 1).all()
    assert (out.groupby("doc_id")["n_pages"].first()
            == out.groupby("doc_id")["page_number"].max()).all()
    # first page of every doc carries the fixture link + image
    firsts = out[out["page_number"] == 1]
    assert (firsts["n_links"] == 1).all()
    assert (firsts["n_images"] == 1).all()
    # deterministic: same input → same output
    again = pdf_pages("/root/testdata/sf0.001").to_pandas()
    assert out.sort_values(["doc_id", "page_number"]).reset_index(drop=True) \
        .equals(again.sort_values(["doc_id", "page_number"])
                .reset_index(drop=True))
