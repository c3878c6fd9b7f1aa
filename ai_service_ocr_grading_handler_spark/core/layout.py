"""Layout-aware text segmentation for paginated documents (the PDF half of
the north star's extraction kernel).

The CODEC runs for real in every runtime: `parse_pdf_bytes` uses pypdf
when importable, else the stdlib content-stream interpreter `core.pdfx`
(exotic PDFs — object streams, CMap fonts — raise there). The LAYOUT
ANALYSIS is codec-agnostic and operates on a deterministic binary
container of positioned text boxes (`pack_layout`/`unpack_layout`), the
same shape any codec emits: (page, x0, y0, x1, y1, font_size, text).

Algorithms (standard published techniques, implemented from scratch):
- **column clustering**: per page, boxes whose x-intervals overlap
  transitively form a column (connected components); columns read
  left-to-right, boxes top-to-bottom within a column (XY-cut reading order);
- **running-head / page-number removal**: boxes whose digit-normalized text
  recurs at the same vertical band on >= 2 pages are page furniture;
- **block scoring**: font size relative to the document's body font labels
  heading vs body; furniture is dropped, headings and body are emitted in
  reading order with per-block confidence.

Like htmlx, this module is the pure-Python oracle; the Spark side applies
it inside mapInPandas (operators/layout_extract.py) so byte-identity holds
by construction.
"""

from __future__ import annotations

import re
import struct
from dataclasses import dataclass

MAGIC = b"FAKEPDF1"
_DOC_HDR = ">8sH"  # magic, n_pages
_PAGE_HDR = ">H"  # n_boxes
_BOX_HDR = ">fffffH"  # x0, y0, x1, y1, font, text_len

_DIGITS_RE = re.compile(r"\d+")
_Y_BAND = 8.0  # vertical tolerance for furniture recurrence (pt)


@dataclass(slots=True)
class Box:
    page: int
    x0: float
    y0: float
    x1: float
    y1: float
    font: float
    text: str
    label: str = "body"  # body | heading | furniture
    confidence: float = 0.0


def pack_layout(pages: list[list[tuple[float, float, float, float, float, str]]]) -> bytes:
    """pages -> binary container; each box = (x0, y0, x1, y1, font, text)."""
    out = [struct.pack(_DOC_HDR, MAGIC, len(pages))]
    for boxes in pages:
        out.append(struct.pack(_PAGE_HDR, len(boxes)))
        for (x0, y0, x1, y1, font, text) in boxes:
            raw = text.encode("utf-8")
            out.append(struct.pack(_BOX_HDR, x0, y0, x1, y1, font, len(raw)))
            out.append(raw)
    return b"".join(out)


def unpack_layout(blob: bytes) -> list[Box]:
    magic, n_pages = struct.unpack_from(_DOC_HDR, blob)
    if magic != MAGIC:
        raise ValueError("bad magic")
    off = struct.calcsize(_DOC_HDR)
    boxes: list[Box] = []
    for p in range(n_pages):
        (n_boxes,) = struct.unpack_from(_PAGE_HDR, blob, off)
        off += struct.calcsize(_PAGE_HDR)
        for _ in range(n_boxes):
            x0, y0, x1, y1, font, tlen = struct.unpack_from(_BOX_HDR, blob, off)
            off += struct.calcsize(_BOX_HDR)
            text = blob[off : off + tlen].decode("utf-8")
            off += tlen
            boxes.append(Box(p, x0, y0, x1, y1, font, text))
    return boxes


def parse_pdf_bytes(blob: bytes) -> list[Box]:
    """REAL PDF codec: parses PDF bytes into positioned text Boxes
    (text-matrix x/y through the CTM, font size; PDF y-up flipped to the
    layout kernel's y-down), feeding the same codec-agnostic XY-cut
    analysis as the box container.

    Codec resolution: pypdf when importable (full format coverage);
    otherwise the pure-stdlib content-stream interpreter (`core.pdfx`) —
    classic-xref PDFs with raw/FlateDecode streams — so this branch runs
    FOR REAL in runtimes with no PDF library (this sandbox). Both branches
    apply identical Box math; exotic PDFs (object streams, CMap fonts)
    raise from pdfx and need a library."""
    try:
        from pypdf import PdfReader
    except ImportError:
        from ai_service_ocr_grading_handler_spark.core import pdfx

        boxes: list[Box] = []
        for pno, x, y, fs, text, page_h in pdfx.extract_text_boxes(blob):
            t = text.strip()
            if not t:
                continue
            fsz = float(fs or 10.0)
            boxes.append(
                Box(
                    pno, x, page_h - y - fsz, x + 0.5 * fsz * len(t),
                    page_h - y, int(round(fsz)), t,
                )
            )
        return boxes
    import io

    boxes: list[Box] = []
    reader = PdfReader(io.BytesIO(blob))
    for pno, page in enumerate(reader.pages):
        page_h = float(page.mediabox.height)
        # mediabox lower-left is not always (0,0); page coords are relative
        # to it
        mb_x0 = float(page.mediabox.left)
        mb_y0 = float(page.mediabox.bottom)

        def visit(
            text, cm, tm, font_dict, font_size,
            pno=pno, page_h=page_h, mb_x0=mb_x0, mb_y0=mb_y0,
        ):
            t = text.strip()
            if not t:
                return
            # text origin = (tm[4], tm[5]) mapped through the CURRENT
            # TRANSFORMATION MATRIX — using the text matrix alone places
            # cm-translated/scaled content (generated PDFs, XObjects) at
            # text-space coordinates and corrupts the XY-cut clustering
            # (found by review)
            tx, ty = float(tm[4]), float(tm[5])
            x = float(cm[0]) * tx + float(cm[2]) * ty + float(cm[4]) - mb_x0
            y = float(cm[1]) * tx + float(cm[3]) * ty + float(cm[5]) - mb_y0
            fs = float(font_size or 10.0)
            # PDF user space is y-up; the layout kernel is y-down. Width is
            # an em-box estimate — XY-cut needs band separations, not glyph
            # metrics.
            boxes.append(
                Box(pno, x, page_h - y - fs, x + 0.5 * fs * len(t), page_h - y,
                    int(round(fs)), t)
            )

        page.extract_text(visitor_text=visit)
    return boxes


# --- layout analysis -----------------------------------------------------------


def _xy_cut(boxes: list[Box]) -> list[Box]:
    """XY-cut reading order: split at horizontal whitespace bands first
    (title band above a multi-column body), then at vertical bands
    (columns); leaves sort top-to-bottom, left-to-right.

    Iterative (explicit LIFO worklist), NOT recursive: a page of n
    vertically separated line boxes splits 1-vs-rest n times, so the
    recursive form's depth is O(n) and a ~1000-line page (n_boxes is u16)
    raised RecursionError — outside extract_layout's codec guard, killing
    the Spark task for one dense page (found by review; pinned by test).
    Segments are processed depth-first in order, so the emitted sequence is
    identical to the recursion's."""
    out: list[Box] = []
    stack: list[list[Box]] = [list(boxes)]
    while stack:
        seg = stack.pop()
        if len(seg) <= 1:
            out.extend(seg)
            continue
        split = None
        byy = sorted(seg, key=lambda b: b.y0)
        reach = byy[0].y1
        for i in range(1, len(byy)):
            if byy[i].y0 > reach + 1e-6:
                split = (byy[:i], byy[i:])
                break
            reach = max(reach, byy[i].y1)
        if split is None:
            byx = sorted(seg, key=lambda b: b.x0)
            reach = byx[0].x1
            for i in range(1, len(byx)):
                if byx[i].x0 > reach + 1e-6:
                    split = (byx[:i], byx[i:])
                    break
                reach = max(reach, byx[i].x1)
        if split is None:
            out.extend(sorted(seg, key=lambda b: (b.y0, b.x0)))
        else:
            stack.append(split[1])  # LIFO: first part processed first
            stack.append(split[0])
    return out


def _normalize_for_recurrence(text: str) -> str:
    return _DIGITS_RE.sub("#", text.strip())


def mark_furniture(boxes: list[Box]) -> None:
    """Running heads / page numbers: digit-normalized text recurring in the
    same vertical band on >= 2 distinct pages."""
    seen: dict[tuple[str, int], set[int]] = {}
    for b in boxes:
        key = (_normalize_for_recurrence(b.text), int(b.y0 / _Y_BAND))
        seen.setdefault(key, set()).add(b.page)
    for b in boxes:
        key = (_normalize_for_recurrence(b.text), int(b.y0 / _Y_BAND))
        if len(seen[key]) >= 2:
            b.label = "furniture"


def classify_fonts(boxes: list[Box]) -> None:
    """Body font = modal font size among non-furniture boxes; larger fonts
    are headings. Confidence: body 1.0, heading 0.9 (structural certainty),
    furniture 0."""
    sizes: dict[float, int] = {}
    for b in boxes:
        if b.label != "furniture":
            sizes[b.font] = sizes.get(b.font, 0) + 1
    if not sizes:
        return
    body_font = max(sizes.items(), key=lambda kv: (kv[1], -kv[0]))[0]
    for b in boxes:
        if b.label == "furniture":
            b.confidence = 0.0
        elif b.font > body_font * 1.2:
            b.label = "heading"
            b.confidence = 0.9
        else:
            b.label = "body"
            b.confidence = 1.0


def reading_order(boxes: list[Box]) -> list[Box]:
    """Pages in order; recursive XY-cut within each page."""
    ordered: list[Box] = []
    n_pages = max((b.page for b in boxes), default=-1) + 1
    for p in range(n_pages):
        ordered.extend(_xy_cut([b for b in boxes if b.page == p]))
    return ordered


@dataclass(slots=True)
class LayoutResult:
    text: str
    blocks: list[Box]
    n_pages: int
    n_boxes: int


def extract_layout(blob: bytes | None) -> LayoutResult:
    """Container bytes -> reading-ordered content text + labeled blocks.

    TOTAL function like htmlx.extract_doc: corrupt/truncated/foreign bytes
    yield an empty result instead of raising — one poisoned row must never
    kill a task (and its retries) on a real crawl."""
    if blob is None:
        return LayoutResult("", [], 0, 0)
    try:
        boxes = unpack_layout(bytes(blob))
    except Exception:
        return LayoutResult("", [], 0, 0)
    mark_furniture(boxes)
    classify_fonts(boxes)
    ordered = reading_order(boxes)
    content = [b for b in ordered if b.label != "furniture"]
    text = "\n\n".join(b.text for b in content)
    n_pages = max((b.page for b in boxes), default=-1) + 1
    return LayoutResult(text, ordered, n_pages, len(boxes))
