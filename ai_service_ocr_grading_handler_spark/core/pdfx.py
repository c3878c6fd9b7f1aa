"""Pure-stdlib minimal PDF text extractor for the layout tier.

Why this exists: `layout.parse_pdf_bytes` occupies the reference's
document-parse position, but this runtime has no PDF library, so the real
branch never executed here. A *minimal* PDF is parseable with stdlib only:
objects are plain text, content streams are zlib (FlateDecode) or raw, and
positioned text is a small operator language (BT/ET, Tf, Td/TD/Tm/T*,
Tj/'/TJ, cm, q/Q). This module implements exactly that subset and emits
(page, x, y, font_size, text) tuples in *PDF user space* (y-up); the
caller applies the same y-flip/em-box math as the pypdf branch so both
codecs feed the XY-cut kernel identically.

Scope (documented contract, ValueError/NotImplementedError beyond it):
- top-level objects `N 0 obj ... endobj` scannable (classic-xref layout,
  and PDF 1.5+ xref-STREAM layouts, whose top-level objects are scannable
  the same way — the xref table itself is never needed because objects
  are found by scanning); objects packed into object streams (/ObjStm,
  the other PDF 1.5 compression) are unpacked via `_expand_object_streams`;
- stream filters: FlateDecode, LZWDecode (9->12-bit PDF variant with
  /EarlyChange), ASCIIHexDecode, ASCII85Decode, RunLengthDecode — as a
  /Filter CHAIN with per-filter /DecodeParms, including PNG predictors
  10-15 (/Predictor, /Columns, /Colors, /BitsPerComponent) on Flate/LZW
  output. Crypt and image-only filters (DCT/JBIG2/JPX/CCITT) raise
  NotImplementedError;
- literal `(...)` strings with escapes and hex `<...>` strings, Latin-1
  bytes (no CMap/TrueType cmap decoding — fixture-grade text);
- text ops BT ET Tf Td TD Tm T* Tj ' TJ, graphics ops cm q Q. TJ emits
  each string element at the current text matrix (no glyph-advance
  simulation) — XY-cut needs band positions, not kerning.
"""

from __future__ import annotations

import base64
import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)


def _find_objects(blob: bytes) -> dict[int, bytes]:
    return {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(blob)}


def _ref(body: bytes, name: bytes) -> int | None:
    m = re.search(rb"/" + name + rb"\s+(\d+)\s+\d+\s+R", body)
    return int(m.group(1)) if m else None


def _refs_array(body: bytes, name: bytes) -> list[int]:
    m = re.search(rb"/" + name + rb"\s*\[(.*?)\]", body, re.DOTALL)
    if m:
        return [int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))]
    single = _ref(body, name)
    return [single] if single is not None else []


def _media_box(body: bytes) -> tuple[float, float, float, float] | None:
    m = re.search(rb"/MediaBox\s*\[\s*([-\d.\s]+?)\s*\]", body)
    if not m:
        return None
    vals = [float(v) for v in m.group(1).split()]
    if len(vals) != 4:
        return None
    return tuple(vals)  # type: ignore[return-value]


def _page_objects(objs: dict[int, bytes]) -> list[tuple[bytes, tuple]]:
    """Pages in document order via the /Root -> /Pages -> /Kids tree, with
    MediaBox inheritance. Returns (page_body, mediabox) pairs."""
    root_num = None
    for body in objs.values():
        if b"/Type" in body and b"/Catalog" in body:
            root_num = _ref(body, b"Pages")
            break
    pages: list[tuple[bytes, tuple]] = []
    path: set[int] = set()  # objects on the CURRENT descent only

    def walk(num: int, inherited_mb, depth: int = 0) -> None:
        # cycle = revisit on the current path; a DAG (the same subtree
        # referenced from two /Kids arrays, malformed but terminating)
        # re-walks and emits its pages again — what a Kids-following
        # reader does — instead of misdiagnosing a cycle (review finding)
        if num in path:
            raise ValueError(f"cyclic page-tree reference to object {num}")
        if depth > 256:
            raise ValueError("page tree nested deeper than 256 levels")
        body = objs.get(num)
        if body is None:
            return
        mb = _media_box(body) or inherited_mb
        if b"/Kids" in body:
            path.add(num)
            try:
                for kid in _refs_array(body, b"Kids"):
                    walk(kid, mb, depth + 1)
            finally:
                path.discard(num)
        else:
            pages.append((body, mb or (0.0, 0.0, 612.0, 792.0)))

    if root_num is not None:
        walk(root_num, None)
    if not pages:  # degenerate: no catalog — take any /Type /Page objects
        for num in sorted(objs):
            body = objs[num]
            if b"/Type" in body and b"/Page" in body and b"/Pages" not in body:
                pages.append((body, _media_box(body) or (0.0, 0.0, 612.0, 792.0)))
    return pages


# --- stream filters ----------------------------------------------------------

_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")
_PARMS_RE = re.compile(rb"/(?:DecodeParms|DP)\s*(\[.*?\]|<<.*?>>|null)", re.DOTALL)
_PARM_DICT_RE = re.compile(rb"<<.*?>>|null", re.DOTALL)
_INT_KEY_RE = re.compile(rb"/(Predictor|Columns|Colors|BitsPerComponent|EarlyChange)\s+(\d+)")


def _asciihex_decode(data: bytes) -> bytes:
    end = data.find(b">")
    if end >= 0:
        data = data[:end]
    hexs = re.sub(rb"\s", b"", data)
    if len(hexs) % 2:
        hexs += b"0"
    try:
        return bytes.fromhex(hexs.decode("ascii"))
    except (ValueError, UnicodeDecodeError) as e:
        raise ValueError(f"corrupt ASCIIHexDecode stream: {e}") from e


def _ascii85_decode(data: bytes) -> bytes:
    data = re.sub(rb"\s", b"", data)
    if data.endswith(b"~>"):
        data = data[:-2]
    # normalize to Adobe framing so base64 handles the 'z' shortcut and
    # final-group padding per the PDF (Adobe) variant
    try:
        return base64.a85decode(b"<~" + data + b"~>", adobe=True)
    except ValueError as e:
        raise ValueError(f"corrupt ASCII85Decode stream: {e}") from e


# Bomb guard for every expanding filter (LZW table growth is O(n²) in
# input bytes; Flate can expand ~1000x) — same threat class and policy as
# pngx._MAX_RAW_BYTES, which caps the inflater BEFORE allocation.
_MAX_STREAM_BYTES = 1 << 26


def _bounded_inflate(data: bytes) -> bytes:
    d = zlib.decompressobj()
    try:
        out = d.decompress(data, _MAX_STREAM_BYTES + 1)
    except zlib.error as e:
        raise ValueError(f"corrupt FlateDecode stream: {e}") from e
    if len(out) > _MAX_STREAM_BYTES:
        raise ValueError(
            f"FlateDecode output exceeds the {_MAX_STREAM_BYTES}-byte bound"
        )
    if not d.eof:
        raise ValueError("FlateDecode stream truncated (not terminated)")
    return out


def _runlength_decode(data: bytes) -> bytes:
    """PDF RunLengthDecode: length byte n<128 -> copy n+1 literals;
    n>128 -> repeat next byte 257-n times; n==128 -> EOD (mandatory —
    running off the end without it is truncation, not success)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        ln = data[i]
        if ln == 128:
            return bytes(out)
        if ln < 128:
            end = i + 1 + ln + 1
            if end > n:
                raise ValueError("truncated RunLengthDecode literal run")
            out += data[i + 1 : end]
            i = end
        else:
            if i + 1 >= n:
                raise ValueError("truncated RunLengthDecode repeat run")
            out += data[i + 1 : i + 2] * (257 - ln)
            i += 2
    raise ValueError("RunLengthDecode stream missing EOD marker")


def _lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """PDF LZWDecode: variable 9->12-bit codes, Clear=256, EOD=257, code
    width grows one code early unless /EarlyChange 0."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    bitbuf = 0
    nbits = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:  # clear table
                del table[258:]
                width = 9
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("corrupt LZW stream: first code out of range")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt LZW stream: code beyond table")
            # /EarlyChange 1 (default): the code width grows one code
            # earlier than the table strictly requires
            if len(table) + early_change >= (1 << width) and width < 12:
                width += 1
            out += entry
            prev = entry
            if len(out) > _MAX_STREAM_BYTES:
                raise ValueError(
                    f"LZWDecode output exceeds the {_MAX_STREAM_BYTES}-byte"
                    " bound (decompression bomb)"
                )
    return bytes(out)


def _png_predictor(data: bytes, colors: int, bpc: int, columns: int) -> bytes:
    """Reverse PNG row predictors 10-15 (each row: one filter byte + raw
    row; xref streams almost always use /Predictor 12, Up). Delegates to
    pngx._unfilter_image so ONE implementation of Sub/Up/Average/Paeth
    exists in the repo (review finding: this was a third copy of Paeth)."""
    from ai_service_ocr_grading_handler_spark.core.pngx import _unfilter_image

    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    if rowlen <= 0:
        raise ValueError("PNG predictor with non-positive row length")
    if len(data) % (rowlen + 1):
        raise ValueError("PNG-predicted stream is not a whole number of rows")
    if rowlen % bpp:
        raise NotImplementedError(
            "PNG predictor over sub-byte-packed rows unsupported"
        )
    out, _ = _unfilter_image(data, 0, rowlen // bpp, len(data) // (rowlen + 1), bpp)
    return bytes(out)


_STREAM_KW_RE = re.compile(rb"stream\r?\n")


def _stream_dict(body: bytes) -> bytes:
    """The stream-DICT prefix of an object body: everything before the
    `stream` keyword. Dict-key regexes must search THIS, never the whole
    body — raw stream payload bytes can legally contain b'/Filter',
    b'/DecodeParms', or b'/Type /ObjStm' and would spoof dict entries,
    failing or mis-decoding an otherwise valid document (review
    finding)."""
    m = _STREAM_KW_RE.search(body)
    return body[: m.start()] if m else body


def _decode_parms(body: bytes, n_filters: int) -> list[dict[str, int]]:
    """Per-filter parameter dicts (ints only: Predictor/Columns/Colors/
    BitsPerComponent/EarlyChange), aligned with the /Filter chain."""
    m = _PARMS_RE.search(body)
    if not m:
        return [{} for _ in range(n_filters)]
    section = m.group(1)
    if section.startswith(b"["):
        dicts = _PARM_DICT_RE.findall(section)
    else:
        dicts = [section]
    parms = [
        {k.decode(): int(v) for k, v in _INT_KEY_RE.findall(d)} for d in dicts
    ]
    parms += [{} for _ in range(n_filters - len(parms))]
    return parms[:n_filters]


def decode_stream(body: bytes, data: bytes) -> bytes:
    """Apply the stream dict's full /Filter chain (with /DecodeParms) to
    raw stream bytes. Raw (no /Filter) streams pass through. Only the
    dict prefix of `body` is consulted (`_stream_dict`)."""
    body = _stream_dict(body)
    m = _FILTER_RE.search(body)
    if not m:
        if re.search(rb"/Filter\b", body):
            # e.g. an indirect reference `/Filter 5 0 R` — refusing keeps
            # the typed-error contract; silently returning raw bytes here
            # would feed compressed garbage to the interpreter (review
            # finding: the old any-/Filter NotImplementedError was lost in
            # the filter-chain rewrite)
            raise NotImplementedError("unresolvable /Filter entry (indirect?)")
        return data
    names = re.findall(rb"/([A-Za-z0-9]+)", m.group(1))
    parms = _decode_parms(body, len(names))
    for name, parm in zip(names, parms):
        if name == b"FlateDecode" or name == b"Fl":
            data = _bounded_inflate(data)
        elif name == b"LZWDecode" or name == b"LZW":
            data = _lzw_decode(data, parm.get("EarlyChange", 1))
        elif name == b"ASCIIHexDecode" or name == b"AHx":
            data = _asciihex_decode(data)
        elif name == b"ASCII85Decode" or name == b"A85":
            data = _ascii85_decode(data)
        elif name == b"RunLengthDecode" or name == b"RL":
            data = _runlength_decode(data)
        else:
            raise NotImplementedError(f"PDF filter {name.decode()} unsupported")
        pred = parm.get("Predictor", 1)
        if pred >= 10 and name in (b"FlateDecode", b"Fl", b"LZWDecode", b"LZW"):
            data = _png_predictor(
                data,
                parm.get("Colors", 1),
                parm.get("BitsPerComponent", 8),
                parm.get("Columns", 1),
            )
        elif pred not in (0, 1):
            raise NotImplementedError(f"TIFF predictor {pred} unsupported")
    return data


def _expand_object_streams(objs: dict[int, bytes]) -> dict[int, bytes]:
    """Unpack /Type /ObjStm objects (PDF 1.5 compressed object streams):
    the stream holds /N (objnum, offset) integer pairs in its first /First
    bytes, then the object bodies back-to-back. Contained objects are
    added to the object map (never overwriting a scanned top-level object
    of the same number); per spec they cannot themselves hold streams, so
    downstream body parsing is unchanged."""
    for body in list(objs.values()):
        head = _stream_dict(body)
        if b"/ObjStm" not in head or b"/Type" not in head:
            continue
        m = _STREAM_RE.search(body)
        if not m:
            continue
        data = decode_stream(body, m.group(1))
        n_m = re.search(rb"/N\s+(\d+)", head)
        first_m = re.search(rb"/First\s+(\d+)", head)
        if not n_m or not first_m:
            raise ValueError("object stream missing /N or /First")
        n, first = int(n_m.group(1)), int(first_m.group(1))
        header = data[:first].split()
        if len(header) < 2 * n:
            raise ValueError("object stream header shorter than /N pairs")
        nums = [int(x) for x in header[0 : 2 * n : 2]]
        offs = [int(x) for x in header[1 : 2 * n : 2]]
        for k in range(n):
            end = first + offs[k + 1] if k + 1 < n else len(data)
            objs.setdefault(nums[k], data[first + offs[k] : end])
    return objs


def _content_bytes(page_body: bytes, objs: dict[int, bytes]) -> bytes:
    out = []
    for num in _refs_array(page_body, b"Contents"):
        body = objs.get(num, b"")
        m = _STREAM_RE.search(body)
        if not m:
            continue
        out.append(decode_stream(body, m.group(1)))
    return b"\n".join(out)


_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


_WS = b"\x00\t\n\x0c\r "
# EI delimited by whitespace on both sides (or stream end) — the standard
# recovery scan real parsers use when the image dict gives no exact length
_EI_RE = re.compile(rb"[\x00\t\n\x0c\r ]EI(?=[\x00\t\n\x0c\r ]|$)")
# channel count per inline-image colour space (abbreviated + full names;
# /I(ndexed) is 1 component per sample by definition)
_CS_CHANNELS = {
    "/G": 1, "/DeviceGray": 1, "/CalGray": 1,
    "/RGB": 3, "/DeviceRGB": 3, "/CalRGB": 3,
    "/CMYK": 4, "/DeviceCMYK": 4,
    "/I": 1, "/Indexed": 1,
}


def _skip_inline_image(data: bytes, i: int) -> int:
    """`data[i:]` starts just after a BI operator. Skip the inline image
    (PDF 32000-1 §8.9.7) and return the index after its EI terminator.

    Text extraction never needs the pixels, but the binary payload MUST
    be stepped over exactly — garbage-tokenizing it corrupts the rest of
    the page (the pre-round-5 behavior was to refuse the whole stream).
    The data length is resolved in spec order:
      1. /L (PDF 2.0 /Length) — exact;
      2. unfiltered images — computed from /W /H /BPC /CS
         (ceil(W*channels*BPC/8) * H; rows are byte-aligned);
      3. otherwise — the whitespace-delimited EI scan every real parser
         falls back to (filtered data without /L is inherently
         heuristic; a payload byte run that embeds ' EI ' is
         vanishingly rare in compressed data and unrepresentable in
         the exact paths above).
    Raises ValueError when no EI terminates the image (truncation)."""
    n = len(data)
    keys: dict[str, object] = {}
    pending_key: str | None = None

    def _store(val):
        nonlocal pending_key
        if pending_key is not None:
            keys[pending_key] = val
            pending_key = None

    while i < n:
        c = data[i : i + 1]
        if c in (b"\x00", b"\t", b"\n", b"\x0c", b"\r", b" "):
            i += 1
            continue
        if c == b"(":
            _, i = _read_literal_string(data, i)
            _store(None)
            continue
        if c == b"[":  # array value (e.g. /D decode or /F filter lists)
            depth = 0
            while i < n:
                ch = data[i : i + 1]
                if ch == b"(":
                    _, i = _read_literal_string(data, i)
                    continue
                if ch == b"[":
                    depth += 1
                elif ch == b"]":
                    depth -= 1
                    if depth == 0:
                        i += 1
                        break
                i += 1
            _store(None)
            continue
        if data[i : i + 2] == b"<<":  # dict value — nesting-aware skip
            depth = 0
            while i < n - 1:
                pair = data[i : i + 2]
                if pair == b"<<":
                    depth += 1
                    i += 2
                elif pair == b">>":
                    depth -= 1
                    i += 2
                    if depth == 0:
                        break
                elif data[i : i + 1] == b"(":
                    _, i = _read_literal_string(data, i)
                else:
                    i += 1
            _store(None)
            continue
        if c == b"<":  # hex string value
            j = data.index(b">", i)
            i = j + 1
            _store(None)
            continue
        m = re.match(rb"[-+.\d][-+.\d]*|/[^\s/\[\]()<>{}]*|[A-Za-z]+", data[i:])
        if not m:
            i += 1
            continue
        tok = m.group(0).decode("latin-1")
        i += len(tok)
        if tok == "ID":
            break
        if tok[0] == "/":
            if pending_key is None:
                pending_key = tok
            else:
                _store(tok)
        elif tok[0] in "-+.0123456789":
            _store(float(tok))
        else:  # keyword value — keep the token: /IM true must be
            # distinguishable from /IM false (review finding: storing
            # None made the image-mask length path dead code)
            _store(tok)
    else:
        raise ValueError("inline image missing ID operator")
    # exactly one whitespace byte separates ID from the binary data (spec),
    # but real writers emit CRLF — consume the LF too, as pdf.js/mupdf do
    if data[i : i + 1] == b"\r" and data[i + 1 : i + 2] == b"\n":
        i += 2
    elif data[i : i + 1] in (b"\x00", b"\t", b"\n", b"\x0c", b"\r", b" "):
        i += 1

    def _int_key(*names) -> int | None:
        for k in names:
            v = keys.get(k)
            if isinstance(v, float):
                return int(v)
        return None

    length = _int_key("/L", "/Length")
    if length is None and "/F" not in keys and "/Filter" not in keys:
        w = _int_key("/W", "/Width")
        h = _int_key("/H", "/Height")
        bpc = _int_key("/BPC", "/BitsPerComponent") or 8
        cs = keys.get("/CS", keys.get("/ColorSpace"))
        ch = _CS_CHANNELS.get(cs) if isinstance(cs, str) else None
        if "true" in (keys.get("/IM"), keys.get("/ImageMask")):
            ch, bpc = 1, 1  # image masks are 1-bit single-channel
        if w is not None and h is not None and ch is not None:
            length = ((w * ch * bpc + 7) // 8) * h
    if length is not None:
        end = i + length
        if end > n:
            raise ValueError("inline image data truncated")
        m2 = re.compile(rb"[\x00\t\n\x0c\r ]*EI").match(data, end)
        if m2:  # exact length confirmed by its terminator
            return m2.end()
        # declared length disagrees with the stream — fall through to scan
    m3 = _EI_RE.search(data, i)
    if not m3:
        raise ValueError("inline image missing EI terminator")
    return m3.end()


def _read_literal_string(data: bytes, i: int) -> tuple[str, int]:
    """data[i] == '(' — parse a PDF literal string, return (text, next_i)."""
    depth = 1
    out = bytearray()
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i : i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = data[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt in b"01234567":  # octal (up to 3 OCTAL digits — \8/\9
                # are unknown escapes whose backslash is dropped, per spec)
                j = i + 1
                while j < min(i + 4, n) and data[j] in b"01234567":
                    j += 1
                out.append(int(data[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            if nxt in (b"\r", b"\n"):  # line continuation: drop both
                i += 2
                if nxt == b"\r" and data[i : i + 1] == b"\n":
                    i += 1
            else:  # unknown escape (\8, \9, ...): drop backslash, KEEP char
                i += 1
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if not depth:
                i += 1
                break
        out += c
        i += 1
    return out.decode("latin-1"), i


def _mat_mul(a, b):
    """3x3 affine (as 6-tuple) product a×b (PDF row-vector convention)."""
    return (
        a[0] * b[0] + a[1] * b[2],
        a[0] * b[1] + a[1] * b[3],
        a[2] * b[0] + a[3] * b[2],
        a[2] * b[1] + a[3] * b[3],
        a[4] * b[0] + a[5] * b[2] + b[4],
        a[4] * b[1] + a[5] * b[3] + b[5],
    )


_ID = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _num(v) -> float:
    """Numeric operand coercion with a TYPED failure: a malformed stream
    can leave a list/array operand where a number belongs — that must be
    ValueError (the codec's error contract), not TypeError."""
    try:
        return float(v)
    except (TypeError, ValueError) as e:
        raise ValueError(f"malformed content-stream operand: {v!r}") from e


def _run_content(data: bytes):
    """Interpret a content stream; yield (x, y, font_size, text) in user
    space — text origin mapped through tm × CTM, exactly the transform the
    pypdf visitor branch applies."""
    ctm = _ID
    stack: list[tuple] = []
    tm = tlm = _ID
    fs = 10.0
    leading = 0.0
    operands: list = []

    def emit(s: str):
        tx, ty = tm[4], tm[5]
        x = ctm[0] * tx + ctm[2] * ty + ctm[4]
        y = ctm[1] * tx + ctm[3] * ty + ctm[5]
        return (x, y, fs, s)

    i, n = 0, len(data)
    while i < n:
        c = data[i : i + 1]
        if c.isspace():
            i += 1
            continue
        if c == b"(":
            s, i = _read_literal_string(data, i)
            operands.append(s)
            continue
        if c == b"<" and data[i + 1 : i + 2] != b"<":
            j = data.index(b">", i)
            hexs = re.sub(rb"\s", b"", data[i + 1 : j])
            if len(hexs) % 2:
                hexs += b"0"
            operands.append(bytes.fromhex(hexs.decode()).decode("latin-1"))
            i = j + 1
            continue
        if c == b"<":  # inline dict <<...>> — skip with nesting depth
            depth = 0
            j = i
            while j < n - 1:
                pair = data[j : j + 2]
                if pair == b"<<":
                    depth += 1
                    j += 2
                elif pair == b">>":
                    depth -= 1
                    j += 2
                    if depth == 0:
                        break
                elif data[j : j + 1] == b"(":
                    _, j = _read_literal_string(data, j)  # strings may hold << >>
                else:
                    j += 1
            i = j
            continue
        if c == b"[":
            operands.append("[")
            i += 1
            continue
        if c == b"]":
            # collapse array contents into one list operand
            arr = []
            while operands and operands[-1] != "[":
                arr.append(operands.pop())
            if operands:
                operands.pop()
            operands.append(list(reversed(arr)))
            i += 1
            continue
        m = re.match(rb"[-+.\d][-+.\d]*|/[^\s/\[\]()<>{}]*|[A-Za-z'\"*]+", data[i:])
        if not m:
            i += 1
            continue
        tok = m.group(0)
        i += len(tok)
        t = tok.decode("latin-1")
        if t[0] in "-+.0123456789":
            operands.append(float(t))
            continue
        if t[0] == "/":
            operands.append(t)
            continue
        # operator
        if t == "BI":
            # inline image: step over the dict + binary payload exactly
            # (length-resolved; see _skip_inline_image) — pixels are not
            # text, but garbage-tokenizing them would corrupt the page
            i = _skip_inline_image(data, i)
            operands.clear()
            continue
        if t == "BT":
            tm = tlm = _ID
        elif t == "ET":
            pass
        elif t == "Tf" and len(operands) >= 2:
            fs = _num(operands[-1])
        elif t in ("Td", "TD") and len(operands) >= 2:
            ty = _num(operands[-1])
            tx = _num(operands[-2])
            if t == "TD":
                leading = -ty
            tlm = _mat_mul((1, 0, 0, 1, tx, ty), tlm)
            tm = tlm
        elif t == "TL" and operands:
            leading = _num(operands[-1])
        elif t == "Tm" and len(operands) >= 6:
            tm = tlm = tuple(_num(v) for v in operands[-6:])
        elif t == "T*":
            tlm = _mat_mul((1, 0, 0, 1, 0, -leading), tlm)
            tm = tlm
        elif t == "Tj" and operands:
            yield emit(str(operands[-1]))
        elif t == "'" and operands:
            tlm = _mat_mul((1, 0, 0, 1, 0, -leading), tlm)
            tm = tlm
            yield emit(str(operands[-1]))
        elif t == "TJ" and operands and isinstance(operands[-1], list):
            for el in operands[-1]:
                if isinstance(el, str) and el:
                    yield emit(el)
        elif t == "cm" and len(operands) >= 6:
            ctm = _mat_mul(tuple(_num(v) for v in operands[-6:]), ctm)
        elif t == "q":
            stack.append(ctm)
        elif t == "Q" and stack:
            ctm = stack.pop()
        operands.clear()


def extract_text_boxes(blob: bytes):
    """PDF bytes -> list of (page_no, x, y, font_size, text, page_height)
    tuples. x/y are MediaBox-relative PDF user-space coordinates (y-up,
    origin shifted so the page's lower-left is (0,0)); the caller flips to
    the layout kernel's y-down space using page_height."""
    blob = bytes(blob)
    if not blob.startswith(b"%PDF"):
        raise ValueError("not a PDF (missing %PDF header)")
    objs = _expand_object_streams(_find_objects(blob))
    if not objs:
        raise ValueError("no parseable PDF objects")
    out = []
    for pno, (page_body, mb) in enumerate(_page_objects(objs)):
        data = _content_bytes(page_body, objs)
        page_h = mb[3] - mb[1]
        for x, y, fs, text in _run_content(data):
            out.append((pno, x - mb[0], y - mb[1], fs, text, page_h))
    return out
