"""PDF processing stage — the reference's NaivePDFProcessorStrategy
(processors/pdf/processor.py:57-487) as a Ray Data batch transform.

The reference processes one PDF at a time with a thread pool over pages
(processor.py:123-201 process_batch). Ray-Data-first, the unit of
parallelism is the *document batch*: ``map_batches(PdfProcessStage)``
fans PDFs across the cluster and each task emits one row per page —
page-level parallelism falls out of document-level parallelism without
threads. The stage is a callable class (actor pool) so per-actor setup
cost stays off the per-batch path; per-page work uses
``functions/pdfkit`` (the stdlib-subset reader — PyPDF2/PIL are absent
in this environment; the reader is real, not a stub).

Output schema (one row per page):
  doc_id int64 | page_number int32 | n_pages int32 | raw_text |
  markdown | html | n_images int32 | image_formats list<string> |
  links list<string> | title | author | producer | created | encrypted
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.pdfkit import (
    PdfDocument,
    pdf_text_to_html,
    pdf_text_to_markdown,
)

PDF_PAGE_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("page_number", pa.int32()),
    ("n_pages", pa.int32()),
    ("raw_text", pa.large_string()),
    ("markdown", pa.large_string()),
    ("html", pa.large_string()),
    ("n_images", pa.int32()),
    ("image_formats", pa.list_(pa.string())),
    ("links", pa.list_(pa.string())),
    ("title", pa.string()),
    ("author", pa.string()),
    ("producer", pa.string()),
    ("created", pa.string()),
    ("encrypted", pa.bool_()),
])


def process_pdf_bytes(doc_id: int, buf: bytes,
                      extract_images: bool = True) -> list[dict]:
    """One PDF → page rows (processor.py:204-223 _process_page law:
    raw text via the visitor, markdown/html via the cleanup laws,
    images, links)."""
    try:
        doc = PdfDocument(buf)
    except Exception:
        return []
    info = doc.info()
    meta = {
        "title": info.get("title"),
        "author": info.get("author"),
        "producer": info.get("producer"),
        "created": info.get("created"),
        "encrypted": doc.encrypted,
    }
    if doc.encrypted:
        return [{"doc_id": doc_id, "page_number": 0, "n_pages": 0,
                 "raw_text": "", "markdown": "", "html": "",
                 "n_images": 0, "image_formats": [], "links": [],
                 **meta}]
    pages = doc.pages()
    rows = []
    for i, page in enumerate(pages):
        try:
            raw_text, _layout = doc.page_text(page)
        except Exception:
            raw_text = ""
        images = doc.page_images(page) if extract_images else []
        rows.append({
            "doc_id": doc_id,
            "page_number": i + 1,
            "n_pages": len(pages),
            "raw_text": raw_text,
            "markdown": pdf_text_to_markdown(i + 1, raw_text),
            "html": pdf_text_to_html(i + 1, raw_text),
            "n_images": len(images),
            "image_formats": [im["format"] for im in images],
            "links": doc.page_links(page),
            **meta,
        })
    return rows


class PdfProcessStage:
    """Actor-pool stage: batches of (doc_id, pdf binary) → page rows.
    Use with ``map_batches(PdfProcessStage, concurrency=N,
    batch_size=B)``; B should be small for large PDFs (binary payload ×
    batch must fit a worker heap — the multimodal sizing rule)."""

    def __init__(self, *, extract_images: bool = True,
                 pdf_column: str = "pdf", id_column: str = "doc_id"):
        self.extract_images = extract_images
        self.pdf_column = pdf_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        ids = batch.column(self.id_column).to_pylist()
        bufs = batch.column(self.pdf_column).to_pylist()
        for doc_id, buf in zip(ids, bufs):
            rows.extend(process_pdf_bytes(
                int(doc_id), buf, extract_images=self.extract_images))
        if not rows:
            return PDF_PAGE_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=PDF_PAGE_SCHEMA)
