"""Minimal deterministic PDF 1.4 writer for the synthetic corpus.

Renders golden PDF page structures (text + link annotations) into a
valid uncompressed PDF that the extraction kernel (operators/pdf.py)
— and, where installed, pypdf itself — must round-trip back to the
exact span sequence. Mirrors how testing/graph.py renders HTML bodies
from golden spans: the spans come first, the bytes derive from them.
"""

from __future__ import annotations


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def render_pdf(
    pages: list[dict],
    title: str | None = None,
    lang: str | None = None,
    creation_date: str | None = None,
    mod_date: str | None = None,
) -> bytes:
    """pages: [{"text": str, "annot_links": [url, ...]}, ...].

    Each page's text is emitted as one Tj operator per line (the parser
    joins text operators with newlines), annotation links as /Link
    annotations with /A → /URI actions.
    """
    objs: list[bytes] = []  # 1-indexed object bodies, in object-number order

    def add(body: str) -> int:
        objs.append(body.encode("latin-1", errors="replace"))
        return len(objs)

    catalog_id = add("placeholder")  # patched after Pages exists
    pages_id = add("placeholder")

    kid_ids: list[int] = []
    for page in pages:
        lines = page["text"].split("\n") if page["text"] else []
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        for i, line in enumerate(lines):
            if i:
                ops.append("0 -14 Td")
            ops.append(f"({_esc(line)}) Tj")
        ops.append("ET")
        stream = "\n".join(ops)
        content_id = add(f"<< /Length {len(stream)} >>\nstream\n{stream}\nendstream")
        annot_ids = []
        for j, link in enumerate(page.get("annot_links") or []):
            annot_ids.append(
                add(
                    f"<< /Type /Annot /Subtype /Link /Rect [72 {700 - 20 * j} 300 "
                    f"{712 - 20 * j}] /Border [0 0 0] "
                    f"/A << /Type /Action /S /URI /URI ({_esc(link)}) >> >>"
                )
            )
        annots = f" /Annots [{' '.join(f'{a} 0 R' for a in annot_ids)}]" if annot_ids else ""
        kid_ids.append(
            add(
                f"<< /Type /Page /Parent {pages_id} 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 << /Type /Font /Subtype /Type1 "
                f"/BaseFont /Helvetica >> >> >> /Contents {content_id} 0 R{annots} >>"
            )
        )

    info_parts = []
    if title:
        info_parts.append(f"/Title ({_esc(title)})")
    if creation_date:
        info_parts.append(f"/CreationDate ({_esc(creation_date)})")
    if mod_date:
        info_parts.append(f"/ModDate ({_esc(mod_date)})")
    info_id = add(f"<< {' '.join(info_parts)} >>") if info_parts else None

    lang_part = f" /Lang ({_esc(lang)})" if lang else ""
    objs[catalog_id - 1] = f"<< /Type /Catalog /Pages {pages_id} 0 R{lang_part} >>".encode()
    kids = " ".join(f"{k} 0 R" for k in kid_ids)
    objs[pages_id - 1] = f"<< /Type /Pages /Kids [{kids}] /Count {len(kid_ids)} >>".encode()

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]  # object 0 is the free head
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    trailer = f"<< /Size {len(objs) + 1} /Root {catalog_id} 0 R"
    if info_id:
        trailer += f" /Info {info_id} 0 R"
    trailer += " >>"
    out += f"trailer\n{trailer}\nstartxref\n{xref_at}\n%%EOF\n".encode()
    return bytes(out)
