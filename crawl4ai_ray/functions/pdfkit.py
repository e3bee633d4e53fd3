"""Minimal-subset PDF reader + the reference's page-text cleanup laws.

The reference's PDF pipeline (processors/pdf/processor.py:1-487,
processors/pdf/utils.py:1-350) is built on PyPDF2 + PIL, neither of which
exists in this environment. This module implements the same data-plane
semantics from scratch on the stdlib:

- ``PdfDocument``: a from-scratch reader for the classic-PDF subset —
  indirect objects found by a full-file scan (robust to damaged xref
  tables), literal/hex strings, dicts/arrays/names/refs, FlateDecode
  streams (zlib) with PNG predictors, page tree walk, content-stream
  text extraction (BT/ET, Tj/TJ/'/", Td/TD/T*/Tm line tracking — each
  y-movement emits a newline, like PyPDF2's visitor), image XObjects
  (Flate→PNG via the built-in encoder below, DCT/CCITT/JPX raw
  passthrough — processor.py:233-399), link annotations
  (/Annots→/A→/URI, processor.py:404-414), Info-dict metadata with
  D:YYYYMMDDHHMMSS dates (processor.py:416-460).
- ``pdf_text_to_markdown`` / ``pdf_text_to_html``: behavioral ports of
  clean_pdf_text / clean_pdf_text_to_html (utils.py:71-350): title/
  numbered-header/author/affiliation/email/section/quote line
  classification, hyphen joining, citation and punctuation fixups.
- ``png_encode``: minimal RGB8/L8 PNG writer (zlib + CRC) replacing the
  reference's PIL round-trip for FlateDecode images.

Encrypted PDFs are flagged (metadata.encrypted) and their content
skipped. Unsupported constructs degrade to empty text rather than
raising — a corpus-scale ingest must survive malformed documents.
"""

from __future__ import annotations

import html as _html
import re
import struct
import zlib
from dataclasses import dataclass, field


# ---------------------------------------------------------------------------
# object model
# ---------------------------------------------------------------------------


class Name(str):
    """A PDF name token (/Type ...) — distinct from strings."""


@dataclass(frozen=True)
class Ref:
    num: int
    gen: int


@dataclass
class StreamObj:
    meta: dict
    raw: bytes

    def data(self) -> bytes:
        """Stream bytes after non-image filters (FlateDecode incl. PNG
        predictors). Image codec filters (DCT/CCITT/JPX) pass through —
        the consumer decides (processor.py keeps them encoded too)."""
        filters = self.meta.get("Filter", [])
        if not isinstance(filters, list):
            filters = [filters]
        out = self.raw
        for f in filters:
            if f == "FlateDecode":
                out = zlib.decompress(out)
                parms = self.meta.get("DecodeParms") or {}
                if isinstance(parms, list):
                    parms = parms[0] if parms else {}
                pred = parms.get("Predictor", 1)
                if pred >= 10:
                    out = apply_png_predictor(
                        out,
                        int(parms.get("Columns", 1)),
                        int(parms.get("BitsPerComponent", 8)),
                        int(parms.get("Colors", 1)),
                    )
            else:
                break  # image codec or unsupported: keep encoded
        return out


def apply_png_predictor(data: bytes, width: int, bits: int,
                        color_channels: int) -> bytes:
    """PNG predictor decode (PDF 1.5 filter; utils.py:3-54 semantics),
    vectorized where the filter type allows."""
    import numpy as np

    bpp = (bits * color_channels) // 8
    if (bits * color_channels) % 8:
        bpp += 1
    stride = width * bpp
    scan = stride + 1
    if len(data) % scan:
        raise ValueError("Invalid scanline structure")
    n = len(data) // scan
    arr = np.frombuffer(data, dtype=np.uint8).reshape(n, scan)
    ftypes = arr[:, 0]
    rows = arr[:, 1:].astype(np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    out = np.empty((n, stride), dtype=np.uint8)
    for i in range(n):
        ft, row = int(ftypes[i]), rows[i]
        if ft == 0:
            dec = row
        elif ft == 1:
            dec = row.copy()
            for j in range(bpp, stride):
                dec[j] = (dec[j] + dec[j - bpp]) & 0xFF
        elif ft == 2:
            dec = (row + prev) & 0xFF
        elif ft == 3:
            dec = row.copy()
            for j in range(stride):
                left = dec[j - bpp] if j >= bpp else 0
                dec[j] = (dec[j] + (left + prev[j]) // 2) & 0xFF
        elif ft == 4:
            dec = row.copy()
            for j in range(stride):
                a = dec[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc
                                                          else c)
                dec[j] = (dec[j] + pred) & 0xFF
        else:
            raise ValueError(f"Unsupported filter type: {ft}")
        out[i] = dec.astype(np.uint8)
        prev = dec
    return out.tobytes()


# ---------------------------------------------------------------------------
# lexer / object parser
# ---------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def _skip_ws(self):
        buf, i = self.buf, self.pos
        while i < len(buf):
            c = buf[i:i + 1]
            if c in (b"\x00", b"\t", b"\n", b"\x0c", b"\r", b" "):
                i += 1
            elif c == b"%":  # comment to EOL
                while i < len(buf) and buf[i:i + 1] not in (b"\r", b"\n"):
                    i += 1
            else:
                break
        self.pos = i

    def parse_object(self):
        self._skip_ws()
        buf, i = self.buf, self.pos
        if i >= len(buf):
            raise ValueError("eof")
        c = buf[i:i + 1]
        if c == b"/":
            return self._parse_name()
        if c == b"(":
            return self._parse_literal_string()
        if buf[i:i + 2] == b"<<":
            return self._parse_dict()
        if c == b"<":
            return self._parse_hex_string()
        if c == b"[":
            return self._parse_array()
        if buf[i:i + 4] == b"true":
            self.pos = i + 4
            return True
        if buf[i:i + 5] == b"false":
            self.pos = i + 5
            return False
        if buf[i:i + 4] == b"null":
            self.pos = i + 4
            return None
        return self._parse_number_or_ref()

    def _parse_name(self) -> Name:
        buf, i = self.buf, self.pos + 1
        start = i
        while i < len(buf) and buf[i] not in _WS and buf[i] not in _DELIM:
            i += 1
        raw = buf[start:i]
        # #xx escapes
        raw = re.sub(rb"#([0-9A-Fa-f]{2})",
                     lambda m: bytes([int(m.group(1), 16)]), raw)
        self.pos = i
        return Name(raw.decode("latin-1"))

    def _parse_literal_string(self) -> bytes:
        buf, i = self.buf, self.pos + 1
        out = bytearray()
        depth = 1
        while i < len(buf):
            c = buf[i]
            if c == 0x5C:  # backslash
                i += 1
                e = buf[i:i + 1]
                esc = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
                       b"f": b"\x0c", b"(": b"(", b")": b")",
                       b"\\": b"\\"}
                if e in esc:
                    out += esc[e]
                    i += 1
                elif e.isdigit():
                    oct_ = e
                    i += 1
                    while len(oct_) < 3 and buf[i:i + 1].isdigit():
                        oct_ += buf[i:i + 1]
                        i += 1
                    out.append(int(oct_, 8) & 0xFF)
                elif e in (b"\n", b"\r"):  # line continuation
                    i += 1
                    if e == b"\r" and buf[i:i + 1] == b"\n":
                        i += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                i += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    i += 1
                    break
                out.append(c)
                i += 1
            else:
                out.append(c)
                i += 1
        self.pos = i
        return bytes(out)

    def _parse_hex_string(self) -> bytes:
        end = self.buf.index(b">", self.pos)
        hx = re.sub(rb"\s", b"", self.buf[self.pos + 1:end])
        if len(hx) % 2:
            hx += b"0"
        self.pos = end + 1
        return bytes.fromhex(hx.decode("ascii"))

    def _parse_dict(self):
        self.pos += 2
        d = {}
        while True:
            self._skip_ws()
            if self.buf[self.pos:self.pos + 2] == b">>":
                self.pos += 2
                break
            key = self._parse_name()
            d[str(key)] = self.parse_object()
        # stream?
        save = self.pos
        self._skip_ws()
        if self.buf[self.pos:self.pos + 6] == b"stream":
            i = self.pos + 6
            if self.buf[i:i + 2] == b"\r\n":
                i += 2
            elif self.buf[i:i + 1] in (b"\n", b"\r"):
                i += 1
            length = d.get("Length")
            if isinstance(length, int):
                raw = self.buf[i:i + length]
                self.pos = i + length
                # consume endstream
                j = self.buf.find(b"endstream", self.pos)
                self.pos = (j + 9) if j >= 0 else self.pos
            else:  # unresolved /Length ref: scan for endstream
                j = self.buf.find(b"endstream", i)
                raw = self.buf[i:j].rstrip(b"\r\n")
                self.pos = j + 9
            return StreamObj(d, raw)
        self.pos = save
        return d

    def _parse_array(self):
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self.buf[self.pos:self.pos + 1] == b"]":
                self.pos += 1
                break
            out.append(self.parse_object())
        return out

    def _parse_number_or_ref(self):
        buf, i = self.buf, self.pos
        m = re.match(rb"[+-]?(?:\d+\.\d*|\.\d+|\d+)", buf[i:i + 64])
        if not m:
            raise ValueError(f"bad token at {i}: {buf[i:i+16]!r}")
        tok = m.group(0)
        self.pos = i + len(tok)
        if b"." in tok:
            return float(tok)
        val = int(tok)
        # indirect reference: "N G R"
        save = self.pos
        self._skip_ws()
        m2 = re.match(rb"(\d+)\s+R(?![\w])", buf[self.pos:self.pos + 32])
        if m2:
            self.pos += m2.end()
            return Ref(val, int(m2.group(1)))
        self.pos = save
        return val


# ---------------------------------------------------------------------------
# document
# ---------------------------------------------------------------------------


@dataclass
class PdfPageData:
    page_number: int
    raw_text: str = ""
    images: list = field(default_factory=list)
    links: list = field(default_factory=list)
    layout: list = field(default_factory=list)


class PdfDocument:
    """Parsed classic-subset PDF. Objects are located by a full-file scan
    for ``N G obj`` (immune to broken xref tables — the common corruption
    in crawled PDFs); the trailer dict is taken from the last ``trailer``
    occurrence, falling back to any object with /Root."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.objects: dict[int, object] = {}
        self.trailer: dict = {}
        self._parse()

    # -- low-level ----------------------------------------------------------

    def _parse(self) -> None:
        for m in re.finditer(rb"(\d+)\s+(\d+)\s+obj\b", self.buf):
            num = int(m.group(1))
            lex = _Lexer(self.buf, m.end())
            try:
                self.objects[num] = lex.parse_object()
            except Exception:
                continue
        ti = self.buf.rfind(b"trailer")
        if ti >= 0:
            lex = _Lexer(self.buf, ti + 7)
            try:
                self.trailer = lex.parse_object()
            except Exception:
                self.trailer = {}
        if not self.trailer:
            for obj in self.objects.values():
                if isinstance(obj, dict) and "Root" in obj:
                    self.trailer = obj
                    break

    def resolve(self, obj):
        seen = 0
        while isinstance(obj, Ref) and seen < 32:
            obj = self.objects.get(obj.num)
            seen += 1
        return obj

    # -- metadata -----------------------------------------------------------

    @property
    def encrypted(self) -> bool:
        return "Encrypt" in self.trailer

    def info(self) -> dict:
        info = self.resolve(self.trailer.get("Info")) or {}
        out = {}
        for k in ("Title", "Author", "Producer"):
            v = self.resolve(info.get(k))
            if isinstance(v, bytes):
                v = _pdf_text(v)
            out[k.lower()] = v
        out["created"] = parse_pdf_date(_as_text(
            self.resolve(info.get("CreationDate"))))
        out["modified"] = parse_pdf_date(_as_text(
            self.resolve(info.get("ModDate"))))
        return out

    # -- page tree ----------------------------------------------------------

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer.get("Root")) or {}
        tree = self.resolve(root.get("Pages"))
        out: list[dict] = []

        def walk(node, depth=0):
            node = self.resolve(node)
            if not isinstance(node, dict) or depth > 64:
                return
            if node.get("Type") == "Pages" or "Kids" in node:
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid, depth + 1)
            elif node.get("Type") == "Page" or "Contents" in node:
                out.append(node)

        if tree is not None:
            walk(tree)
        else:  # damaged tree: any object that looks like a page
            for obj in self.objects.values():
                obj = self.resolve(obj)
                if isinstance(obj, dict) and obj.get("Type") == "Page":
                    out.append(obj)
        return out

    # -- content ------------------------------------------------------------

    def page_text(self, page: dict) -> tuple[str, list]:
        """Text + layout ops of one page. Each show op appends its string;
        a vertical move (Td/TD/T*/Tm with y change, ' , ") emits a newline
        — PyPDF2's visitor behaviour the reference builds on
        (processor.py:206-218)."""
        contents = self.resolve(page.get("Contents"))
        streams = contents if isinstance(contents, list) else [contents]
        data = b"".join(
            s.data() for s in (self.resolve(c) for c in streams)
            if isinstance(s, StreamObj)
        )
        text_parts: list[str] = []
        layout: list[dict] = []
        x = y = 0.0
        lex = _Lexer(data)
        stack: list = []

        def show(s: bytes):
            t = _pdf_text(s)
            text_parts.append(t)
            layout.append({"type": "text", "text": t, "x": x, "y": y})

        while True:
            lex._skip_ws()
            if lex.pos >= len(data):
                break
            c = data[lex.pos:lex.pos + 1]
            if c in b"/([<" or c.isdigit() or c in b"+-." \
                    or data[lex.pos:lex.pos + 2] == b"<<":
                try:
                    stack.append(lex.parse_object())
                except Exception:
                    lex.pos += 1
                continue
            m = re.match(rb"[A-Za-z'\"*]+", data[lex.pos:lex.pos + 8])
            if not m:
                lex.pos += 1
                continue
            op = m.group(0)
            lex.pos += len(op)
            if op == b"Tj" and stack:
                show(stack[-1] if isinstance(stack[-1], bytes) else b"")
            elif op == b"TJ" and stack and isinstance(stack[-1], list):
                for el in stack[-1]:
                    if isinstance(el, bytes):
                        show(el)
            elif op in (b"'", b'"'):
                if text_parts:
                    text_parts.append("\n")
                y -= 14.0
                s = next((v for v in reversed(stack)
                          if isinstance(v, bytes)), b"")
                show(s)
            elif op in (b"Td", b"TD") and len(stack) >= 2:
                tx, ty = stack[-2], stack[-1]
                if isinstance(ty, (int, float)):
                    if ty != 0 and text_parts:
                        text_parts.append("\n")
                    x += float(tx) if isinstance(tx, (int, float)) else 0.0
                    y += float(ty)
            elif op == b"T*":
                if text_parts:
                    text_parts.append("\n")
                y -= 14.0
            elif op == b"Tm" and len(stack) >= 6:
                ny = stack[-1]
                if isinstance(ny, (int, float)):
                    if text_parts and float(ny) != y:
                        text_parts.append("\n")
                    x = float(stack[-2]) if isinstance(
                        stack[-2], (int, float)) else x
                    y = float(ny)
            if op in (b"Tj", b"TJ", b"Td", b"TD", b"T*", b"Tm", b"'",
                      b'"', b"BT", b"ET"):
                stack.clear()
        return "".join(text_parts), layout

    def page_links(self, page: dict) -> list[str]:
        links = []
        for annot in self.resolve(page.get("Annots")) or []:
            a = self.resolve(annot)
            if isinstance(a, dict):
                act = self.resolve(a.get("A"))
                if isinstance(act, dict) and "URI" in act:
                    uri = self.resolve(act["URI"])
                    links.append(_as_text(uri))
        return links

    def page_images(self, page: dict) -> list[dict]:
        """Image XObjects → the reference's image-info dicts
        (processor.py:233-399): Flate→PNG (built-in encoder), DCT→jpeg /
        CCITT→tiff / JPX→jpeg2000 raw passthrough, else 'bin'."""
        import base64

        res = self.resolve(page.get("Resources")) or {}
        xobjects = self.resolve(res.get("XObject")) or {}
        out = []
        for _name, ref in xobjects.items():
            xobj = self.resolve(ref)
            if not isinstance(xobj, StreamObj) or \
                    xobj.meta.get("Subtype") != "Image":
                continue
            filters = xobj.meta.get("Filter", [])
            if not isinstance(filters, list):
                filters = [filters]
            width = int(self.resolve(xobj.meta.get("Width", 0)) or 0)
            height = int(self.resolve(xobj.meta.get("Height", 0)) or 0)
            cs = self.resolve(xobj.meta.get("ColorSpace", "DeviceRGB"))
            bits = int(self.resolve(
                xobj.meta.get("BitsPerComponent", 8)) or 8)
            fmt, payload = "bin", xobj.raw
            try:
                if "FlateDecode" in filters:
                    mode = "RGB" if str(cs) == "DeviceRGB" else "L"
                    payload = png_encode(xobj.data(), width, height, mode)
                    fmt = "png"
                elif "DCTDecode" in filters:
                    fmt = "jpeg"
                elif "CCITTFaxDecode" in filters:
                    fmt = "tiff"
                elif "JPXDecode" in filters:
                    fmt = "jpeg2000"
            except Exception:
                fmt, payload = "bin", xobj.raw
            out.append({
                "format": fmt,
                "width": width,
                "height": height,
                "color_space": f"/{cs}" if not str(cs).startswith("/")
                else str(cs),
                "bits_per_component": bits,
                "data": base64.b64encode(payload).decode("ascii"),
            })
        return out


def _pdf_text(b: bytes) -> str:
    """PDF string bytes → text: UTF-16BE with BOM, else PDFDocEncoding
    approximated as latin-1."""
    if b[:2] == b"\xfe\xff":
        return b[2:].decode("utf-16-be", "replace")
    return b.decode("latin-1")


def _as_text(v) -> str:
    if isinstance(v, bytes):
        return _pdf_text(v)
    return v if isinstance(v, str) else ""


def parse_pdf_date(s: str | None):
    """'D:YYYYMMDDHHMMSS...' → ISO string (processor.py:446-460 law;
    string output keeps the Arrow schema simple)."""
    if not s:
        return None
    m = re.match(r"D:(\d{4})(\d{2})(\d{2})(\d{2})(\d{2})(\d{2})", s)
    if not m:
        return None
    try:
        return (f"{m[1]}-{m[2]}-{m[3]} {m[4]}:{m[5]}:{m[6]}"
                if 1 <= int(m[2]) <= 12 and 1 <= int(m[3]) <= 31
                and int(m[4]) < 24 and int(m[5]) < 60 and int(m[6]) < 60
                else None)
    except ValueError:
        return None


# ---------------------------------------------------------------------------
# minimal PNG encoder (replaces the reference's PIL round-trip)
# ---------------------------------------------------------------------------


def png_encode(raw: bytes, width: int, height: int,
               mode: str = "RGB") -> bytes:
    """RGB8 / L8 raster → PNG bytes (filter 0 per scanline)."""
    channels = 3 if mode == "RGB" else 1
    color_type = 2 if mode == "RGB" else 0
    stride = width * channels
    if len(raw) < stride * height:
        raise ValueError("raster too small for dimensions")

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + \
            struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    scan = b"".join(
        b"\x00" + raw[i * stride:(i + 1) * stride] for i in range(height)
    )
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan))
            + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# page-text cleanup laws (utils.py:71-350 behavioral ports)
# ---------------------------------------------------------------------------

_EMAIL_RE = re.compile(r"\{.*?\}")
_AFFIL_RE = re.compile(r"^†")
_QUOTE_RE = re.compile(r'^["“]')
_AUTHOR_RE = re.compile(
    r"^\s*[A-Z][a-zA-Z]+(?:\s+[A-Z][a-zA-Z]+)*\s*(?:[†*0-9]+)?"
    r"(?:,\s*[A-Z][a-zA-Z]+(?:\s+[A-Z][a-zA-Z]+)*\s*(?:[†*0-9]+)?)*"
    r"(?:,\s*(?:and|&)\s+[A-Z][a-zA-Z]+(?:\s+[A-Z][a-zA-Z]+)*\s*"
    r"(?:[†*0-9]+)?)?\s*$"
)
_NUM_HEADER_RE = re.compile(r"^(\d+(?:\.\d+)*)\s+(.+)$")
_SECTION_RE = re.compile(
    r"^(Abstract|\d+\s+[A-Z]|References|Appendix|Figure|Table)")
_CITE_RE = re.compile(r"\(([A-Z][a-z]+ et al\. \d{4})\)")


def _decode_escapes(text: str) -> str:
    try:
        d = text.encode("latin-1").decode("unicode-escape")
        return d.encode("utf-16", "surrogatepass").decode("utf-16")
    except Exception:
        return text


def _classify_lines(decoded: str, page_number: int,
                    md_quirk: bool = False):
    """Shared line walk of both cleanup laws. Yields (kind, payload)
    events: title / header(level,text) / authors / affiliation / email /
    section / quote / flush / word(text).

    ``md_quirk`` replicates clean_pdf_text's numbered-header guard
    (utils.py:267): it reads ``lines[i-1]`` without an ``i > 0`` check, so
    at i == 0 it consults the LAST line (negative indexing) — the HTML
    variant (utils.py:146) has the ``i > 0`` guard."""
    lines = decoded.split("\n")
    title_done = False
    in_header = False
    for i, line in enumerate(lines):
        line = line.strip()
        if not line:
            yield ("flush", None)
            continue
        if (not title_done and i == 0 and 3 <= len(line.split()) <= 8
                and len(lines) > 1):
            yield ("title", line)
            title_done = True
            continue
        nh = _NUM_HEADER_RE.match(line)
        prev_blank = (not lines[i - 1].strip()) if (md_quirk or i > 0) \
            else False
        if prev_blank and nh:
            level = nh.group(1).count(".") + 1
            yield ("header", (min(level + 1, 6), nh.group(2)))
            in_header = True
            continue
        if page_number == 1 and _AUTHOR_RE.match(line):
            yield ("authors", line)
            continue
        if _AFFIL_RE.match(line):
            yield ("affiliation", line)
            continue
        if _EMAIL_RE.match(line):
            yield ("email", line)
            continue
        if _SECTION_RE.match(line):
            yield ("section", line)
            in_header = True
            continue
        if _QUOTE_RE.match(line):
            yield ("quote", line)
            continue
        yield ("word", line[:-1].strip() if line.endswith("-") else line)
        if in_header and not line.endswith((".", "!", "?")):
            yield ("flush", None)
            in_header = False


def _postprocess(text: str, cite_repl: str) -> str:
    text = _CITE_RE.sub(cite_repl, text)
    text = text.replace("\\ud835", "").replace("\\u2020", "†")
    text = re.sub(r"\s+-\s+", "", text)
    return re.sub(r"\s+([.,!?)])", r"\1", text)


def pdf_text_to_markdown(page_number: int, text: str) -> str:
    """clean_pdf_text (utils.py:213-350) behavioral port."""
    decoded = re.sub(r"\.\n", ".\n\n", _decode_escapes(text))
    out: list[str] = []
    para: list[str] = []

    def flush():
        if para:
            p = re.sub(r"\s+", " ", " ".join(para)).strip()
            if p:
                out.append(p)
            para.clear()

    for kind, payload in _classify_lines(decoded, page_number,
                                         md_quirk=True):
        if kind == "flush":
            flush()
        elif kind == "title":
            flush()
            out.append(f"## {payload}")
        elif kind == "header":
            flush()
            level, txt = payload
            out.append(f"{'#' * level} {txt}")
        elif kind == "authors":
            out.append(_format_authors_md(payload))
        elif kind == "affiliation":
            out.append(f"*{payload}*")
        elif kind == "email":
            out.append(f"`{payload}`")
        elif kind == "section":
            flush()
            out.append(f"_[{payload}]_")
        elif kind == "quote":
            flush()
            out.append(f"> {payload}")
        else:
            para.append(payload)
    flush()
    return _postprocess("\n\n".join(out), r"[\1]")


def _format_authors_md(line: str) -> str:
    authors = re.sub(r"[†â€]", "", line)
    parts = [a for a in re.split(r", | and ", authors) if a.strip()]
    formatted = [f"**{' '.join(p for p in a.strip().split() if p)}**"
                 for a in parts]
    if len(formatted) > 1:
        return ", ".join(formatted[:-1]) + " and " + formatted[-1]
    return formatted[0]


def _format_authors_html(line: str) -> str:
    authors = re.sub(r"[†â€]", "", line)
    parts = [a for a in re.split(r", | and ", authors) if a.strip()]
    formatted = [
        "<strong>"
        + _html.escape(" ".join(p for p in a.strip().split() if p))
        + "</strong>"
        for a in parts
    ]
    if len(formatted) > 1:
        return ", ".join(formatted[:-1]) + " and " + formatted[-1]
    return formatted[0]


def pdf_text_to_html(page_number: int, text: str) -> str:
    """clean_pdf_text_to_html (utils.py:71-211) behavioral port."""
    decoded = _decode_escapes(text)
    out: list[str] = []
    para: list[str] = []

    def flush():
        if para:
            p = re.sub(r"\s+", " ", " ".join(para)).strip()
            if p:
                parts = [f"<p>{seg}</p>" for seg in p.split(".\n\n")]
                out.append(
                    f'<div class="paragraph">{"".join(parts)}</div><hr/>')
            para.clear()

    for kind, payload in _classify_lines(decoded, page_number):
        if kind == "flush":
            flush()
        elif kind == "title":
            flush()
            out.append(f"<h2>{_html.escape(payload)}</h2>")
        elif kind == "header":
            flush()
            level, txt = payload
            out.append(f"<h{level}>{_html.escape(txt)}</h{level}>")
        elif kind == "authors":
            out.append(f"<p>{_format_authors_html(payload)}</p>")
        elif kind == "affiliation":
            out.append(f"<p><em>{_html.escape(payload)}</em></p>")
        elif kind == "email":
            out.append(f"<p><code>{_html.escape(payload)}</code></p>")
        elif kind == "section":
            flush()
            out.append(
                '<h2 class="section-header"><em>'
                f"{_html.escape(payload)}</em></h2>")
        elif kind == "quote":
            flush()
            out.append(
                f"<blockquote><p>{_html.escape(payload)}</p></blockquote>")
        else:
            para.append(payload)
    flush()
    return _postprocess("\n".join(out), r"<cite>\1</cite>")
