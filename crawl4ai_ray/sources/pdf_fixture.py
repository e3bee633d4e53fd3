"""Deterministic classic-PDF writer for fixtures and the pdf_pages query.

No PDF library exists in this environment, so test inputs are generated
here: well-formed classic-xref PDFs with Flate-compressed content
streams, per-line text operators, URI link annotations, Flate image
XObjects and an Info dictionary — the exact subset
``functions/pdfkit.PdfDocument`` reads. Pure function of its inputs
(no clocks, no randomness) so fixtures are reproducible byte for byte.
"""

from __future__ import annotations

import zlib


def _esc(s: str) -> bytes:
    return (
        s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        .encode("latin-1", "replace")
    )


def make_pdf(pages: list[dict], *, title: str | None = None,
             author: str | None = None, producer: str = "crawl4ai_ray",
             created: str = "D:20240102030405",
             compress: bool = True) -> bytes:
    """Build a PDF. Each page dict: ``{"lines": [str, ...],
    "links": [url, ...], "images": [{"width", "height", "mode",
    "raster"}]}`` — one text line per Td-advance, links as URI
    annotations, images as FlateDecode XObjects."""
    objects: list[bytes] = []   # bodies, 1-indexed

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    page_ids: list[int] = []
    pages_id_placeholder = None
    page_bodies: list[tuple] = []
    for page in pages:
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for i, line in enumerate(page.get("lines", [])):
            if i > 0:
                ops.append(b"0 -14 Td")
            ops.append(b"(" + _esc(line) + b") Tj")
        ops.append(b"ET")
        content = b"\n".join(ops)
        if compress:
            z = zlib.compress(content)
            cid = add(b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                      % len(z) + z + b"\nendstream")
        else:
            cid = add(b"<< /Length %d >>\nstream\n" % len(content)
                      + content + b"\nendstream")

        annot_ids = []
        for url in page.get("links", []):
            aid = add(
                b"<< /Type /Annot /Subtype /Link /Rect [0 0 100 20] "
                b"/A << /Type /Action /S /URI /URI ("
                + _esc(url) + b") >> >>")
            annot_ids.append(aid)

        xobj_entries = []
        for j, img in enumerate(page.get("images", [])):
            raster = img["raster"]
            mode = img.get("mode", "RGB")
            z = zlib.compress(raster)
            iid = add(
                b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                b"/ColorSpace /%s /BitsPerComponent 8 /Filter "
                b"/FlateDecode /Length %d >>\nstream\n"
                % (img["width"], img["height"],
                   b"DeviceRGB" if mode == "RGB" else b"DeviceGray",
                   len(z))
                + z + b"\nendstream")
            xobj_entries.append(b"/Im%d %d 0 R" % (j, iid))

        page_bodies.append((cid, annot_ids, xobj_entries))

    pages_id_placeholder = len(objects) + len(page_bodies) + 1
    for cid, annot_ids, xobj_entries in page_bodies:
        extra = b""
        if annot_ids:
            extra += b" /Annots [" + b" ".join(
                b"%d 0 R" % a for a in annot_ids) + b"]"
        res = b"/Font << /F1 %d 0 R >>" % font
        if xobj_entries:
            res += b" /XObject << " + b" ".join(xobj_entries) + b" >>"
        page_ids.append(add(
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
            b"/Resources << %s >> /Contents %d 0 R%s >>"
            % (pages_id_placeholder, res, cid, extra)))

    pages_id = add(
        b"<< /Type /Pages /Kids ["
        + b" ".join(b"%d 0 R" % p for p in page_ids)
        + b"] /Count %d >>" % len(page_ids))
    assert pages_id == pages_id_placeholder
    catalog = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_id)
    info_parts = [b"/Producer (" + _esc(producer) + b")",
                  b"/CreationDate (" + created.encode() + b")",
                  b"/ModDate (" + created.encode() + b")"]
    if title:
        info_parts.insert(0, b"/Title (" + _esc(title) + b")")
    if author:
        info_parts.insert(1, b"/Author (" + _esc(author) + b")")
    info = add(b"<< " + b" ".join(info_parts) + b" >>")

    # serialize with a classic xref table
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root %d 0 R /Info %d 0 R >>\n"
            b"startxref\n%d\n%%%%EOF\n"
            % (len(objects) + 1, catalog, info, xref_pos))
    return bytes(out)


def doc_text_to_pdf(doc_id: int, text: str, *, lines_per_page: int = 40,
                    width: int = 86) -> bytes:
    """Deterministic document→PDF fixture: wrap text into fixed-width
    lines, paginate, add a per-doc link and a tiny gradient image on the
    first page (pure function of (doc_id, text))."""
    import textwrap

    lines = []
    for para in (text or "").split("\n"):
        wrapped = textwrap.wrap(para, width=width) or [""]
        lines.extend(wrapped)
    pages = [
        {"lines": lines[i:i + lines_per_page]}
        for i in range(0, max(len(lines), 1), lines_per_page)
    ]
    pages[0]["links"] = [f"https://docs.example/{doc_id}"]
    w = h = 4
    raster = bytes(
        ((doc_id + x + y * w) * 37) % 256
        for y in range(h) for x in range(w) for _ in range(3)
    )
    pages[0]["images"] = [{"width": w, "height": h, "mode": "RGB",
                           "raster": raster}]
    return make_pdf(
        pages, title=f"doc-{doc_id}", author="Synthetic Corpus",
        created=f"D:202401{(doc_id % 28) + 1:02d}120000",
    )
