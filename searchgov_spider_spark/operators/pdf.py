"""PDF span extraction — the PDF half of L4 (SURVEY.md §2.3).

Reference semantics (convert_pdf_i14y.py):
- per-page text in reading order, pages concatenated
  (``get_pdf_text``, convert_pdf_i14y.py:143-159);
- links = visible links found in page text via the reference's regex
  ``https?://\\S+|www\\.\\S+`` plus hidden links from /Annots → /A → /URI
  annotation objects (``get_links_set``, convert_pdf_i14y.py:36-74);
- document metadata from the Info dictionary: Title, CreationDate,
  ModDate, SourceModified, Lang (``get_pdf_meta``, :162-180); encrypted
  PDFs yield nothing (:82-84).

Span mapping (the BASELINE interleaved input_hint): per page, one
``text`` span holding the page's text, followed by that page's link
spans — visible links in order of appearance, then annotation links in
annotation order — with document-order ``offset``. Link spans are
classified ``media`` when the target extension is in FILTER_EXTENSIONS,
mirroring the HTML extractor, so a PDF and an HTML page produce the
same span vocabulary.

Execution: if ``pypdf`` is importable we use it (the reference's
library). The sandbox has no pypdf, so ``_parse_pdf_minimal`` is a
deterministic fallback for uncompressed PDF 1.4 files (the synthetic
corpus, and any real PDF whose content streams are plain): objects are
scanned once, page order follows the /Kids arrays, text-showing
operators (Tj / TJ) are decoded with PDF string-escape rules. Both
paths return the same structure; parse never raises.
"""

from __future__ import annotations

import re

from ..config import FILTER_EXTENSIONS

try:  # the reference's PDF library — absent in the sandbox
    import pypdf  # type: ignore

    _HAVE_PYPDF = True
except ImportError:  # pragma: no cover - depends on environment
    pypdf = None
    _HAVE_PYPDF = False

# the reference's visible-link pattern (convert_pdf_i14y.py:53)
VISIBLE_LINK_RE = re.compile(r"https?://\S+|www\.\S+")

_FILTER_EXT_SET = frozenset(FILTER_EXTENSIONS)

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_TJ_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*Tj")
_TJARR_RE = re.compile(rb"\[((?:[^\]\\]|\\.)*)\]\s*TJ")
_STR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)")
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")
_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
            b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape_pdf_string(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i:i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            m = re.match(rb"\\([0-7]{1,3})", raw[i:])
            if m:
                out.append(int(m.group(1), 8))
                i += 1 + len(m.group(1))
                continue
            i += 1  # line continuation / unknown escape: drop the backslash
            continue
        out += c
        i += 1
    return out.decode("utf-8", errors="replace")


def _dict_entry(body: bytes, key: bytes) -> bytes | None:
    """Value bytes following /Key in a (flat) PDF dictionary body."""
    m = re.search(rb"/" + key + rb"\s*(\((?:[^()\\]|\\.)*\)|\S+)", body)
    return m.group(1) if m else None


def _entry_str(body: bytes, key: bytes) -> str | None:
    v = _dict_entry(body, key)
    if v is None:
        return None
    if v.startswith(b"("):
        return _unescape_pdf_string(v[1:-1])
    return v.decode("latin-1", errors="replace")


def _entry_ref(body: bytes, key: bytes) -> int | None:
    m = re.search(rb"/" + key + rb"\s+(\d+)\s+0\s+R", body)
    return int(m.group(1)) if m else None


def _refs_in_array(body: bytes, key: bytes) -> list[int]:
    m = re.search(rb"/" + key + rb"\s*\[(.*?)\]", body, re.DOTALL)
    if not m:
        return []
    return [int(x) for x in _REF_RE.findall(m.group(1))]


def _page_text_from_stream(data: bytes) -> str:
    """Decode text-showing operators in content-stream order; one line
    per operator (pypdf-like layout for simple single-column streams)."""
    chunks: list[tuple[int, str]] = []
    for m in _TJ_RE.finditer(data):
        chunks.append((m.start(), _unescape_pdf_string(m.group(1))))
    for m in _TJARR_RE.finditer(data):
        parts = [_unescape_pdf_string(s.group(1)) for s in _STR_RE.finditer(m.group(1))]
        chunks.append((m.start(), "".join(parts)))
    chunks.sort()
    return "\n".join(t for _, t in chunks if t)


def _parse_pdf_minimal(body: bytes) -> dict | None:
    """Uncompressed-PDF structural parse: {pages, title, lang, meta}."""
    if not body.startswith(b"%PDF"):
        return None
    if b"/Encrypt" in body:
        return None  # reference: encrypted PDFs are skipped
    objs: dict[int, bytes] = {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(body)}

    catalog = None
    for b in objs.values():
        if re.search(rb"/Type\s*/Catalog\b", b):
            catalog = b
            break
    lang = None
    page_ids: list[int] = []
    if catalog is not None:
        lang = _entry_str(catalog, b"Lang")
        root_ref = _entry_ref(catalog, b"Pages")

        def walk(ref: int, depth: int = 0):
            if depth > 16 or ref not in objs:
                return
            node = objs[ref]
            if re.search(rb"/Type\s*/Pages\b", node):
                for kid in _refs_in_array(node, b"Kids"):
                    walk(kid, depth + 1)
            elif re.search(rb"/Type\s*/Page\b", node):
                page_ids.append(ref)

        if root_ref is not None:
            walk(root_ref)
    if not page_ids:  # degenerate layout: take /Type /Page objects in id order
        page_ids = sorted(
            i for i, b in objs.items()
            if re.search(rb"/Type\s*/Page\b", b) and not re.search(rb"/Type\s*/Pages\b", b)
        )

    pages = []
    for pid in page_ids:
        node = objs[pid]
        text = ""
        cref = _entry_ref(node, b"Contents")
        if cref is not None and cref in objs:
            sm = _STREAM_RE.search(objs[cref])
            if sm:
                text = _page_text_from_stream(sm.group(1))
        annot_links = []
        for aref in _refs_in_array(node, b"Annots"):
            if aref in objs and re.search(rb"/Subtype\s*/Link\b", objs[aref]):
                # /URI must take a literal-string operand (the bare /S /URI
                # action name would otherwise shadow it)
                um = re.search(rb"/URI\s*\(((?:[^()\\]|\\.)*)\)", objs[aref])
                if um:
                    annot_links.append(_unescape_pdf_string(um.group(1)))
        pages.append({"text": text, "annot_links": annot_links})

    # Info dictionary (trailer /Info ref; fall back to any obj with /Title + dates)
    meta: dict[str, str] = {}
    info_ref = None
    tm = re.search(rb"trailer(.*?)(?:startxref|$)", body, re.DOTALL)
    if tm:
        info_ref = _entry_ref(tm.group(1), b"Info")
    info = objs.get(info_ref) if info_ref is not None else None
    if info is not None:
        for key in ("Title", "CreationDate", "ModDate", "SourceModified", "Lang"):
            v = _entry_str(info, key.encode())
            if v:
                meta[key] = v
    if lang and "Lang" not in meta:
        meta["Lang"] = lang
    return {"pages": pages, "meta": meta}


def _parse_pdf_pypdf(body: bytes) -> dict | None:  # pragma: no cover - needs pypdf
    """Real-library path: identical structure via pypdf, mirroring
    get_pdf_text / get_links_set / get_pdf_meta."""
    from io import BytesIO

    reader = pypdf.PdfReader(BytesIO(body))
    if reader.is_encrypted:
        return None
    pages = []
    for page in reader.pages:
        text = page.extract_text() or ""
        annot_links = []
        obj = page.get_object()
        for a in obj.get("/Annots") or []:
            u = a.get_object()
            try:
                if "/A" in u and "/URI" in u["/A"]:
                    link = u["/A"]["/URI"]
                    if isinstance(link, bytes):
                        link = link.decode("utf-8")
                    annot_links.append(str(link))
            except ValueError:
                pass
        pages.append({"text": text, "annot_links": annot_links})
    meta = {}
    md = reader.metadata or {}
    for key in ("/Title", "/CreationDate", "/ModDate", "/SourceModified", "/Lang"):
        if md.get(key):
            meta[key.lstrip("/")] = str(md[key])
    lang = (reader.trailer.get("/Root") or {}).get("/Lang")
    if lang and "Lang" not in meta:
        meta["Lang"] = str(lang)
    return {"pages": pages, "meta": meta}


def _link_kind(ref: str) -> str:
    path = ref.split("#", 1)[0].split("?", 1)[0]
    last = path.rsplit("/", 1)[-1]
    if last.lower().endswith(".tar.gz"):
        return "media"
    ext = last.rsplit(".", 1)[-1].lower() if "." in last else ""
    return "media" if ext in _FILTER_EXT_SET else "link"


def parse_pdf(url: str, body: bytes | None) -> dict:
    """Parse one PDF into the EXTRACTED_FIELDS shape (same contract as
    extraction.parse_page); never raises. Per page: a ``text`` span, then
    visible-link spans (reference regex, in order), then annotation-link
    spans. ``out_links`` dedups link-kind refs preserving first
    occurrence (the reference collects them into a set —
    convert_pdf_i14y.py:50 — document order is our deterministic twin)."""
    empty = {"spans": [], "out_links": [], "title": None, "html_lang": None, "meta": {}}
    if body is None:
        return empty
    try:
        raw = bytes(body)
        parsed = _parse_pdf_pypdf(raw) if _HAVE_PYPDF else _parse_pdf_minimal(raw)
    except Exception:  # noqa: BLE001 — malformed PDFs must not kill the batch
        parsed = None
    if parsed is None:
        return empty

    spans: list[dict] = []
    out_links: list[str] = []
    seen: set[str] = set()

    def add(kind, text=None, ref=None):
        spans.append({"kind": kind, "text": text, "media_ref": ref, "offset": len(spans)})

    for page in parsed["pages"]:
        text = page["text"]
        if text.strip():
            add("text", text=text)
        links = list(VISIBLE_LINK_RE.findall(text)) + list(page["annot_links"])
        for ref in links:
            kind = _link_kind(ref)
            add(kind, ref=ref)
            if kind == "link" and ref not in seen:
                seen.add(ref)
                out_links.append(ref)

    meta = parsed["meta"]
    lang = meta.get("Lang")
    return {
        "spans": spans,
        "out_links": out_links,
        "title": meta.get("Title") or None,
        "html_lang": lang[:2].lower() if lang else None,
        "meta": {k: v for k, v in meta.items() if k != "Title"},
    }
