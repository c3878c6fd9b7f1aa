"""Pure-stdlib PNG codec: decode (and a minimal encode for fixtures).

Why this exists: the multimodal tier's `decode_pixels` occupies the
reference's real image-decode position (`cv2.imdecode`,
/root/reference/engine/core/llm_number_prediction.py:39-55), but this
runtime ships no image library — PIL/cv2 probes always skipped. PNG,
however, is decodable with nothing but `zlib` + `struct`: IDAT is a zlib
stream and the per-scanline filters (None/Sub/Up/Average/Paeth) are
arithmetic over the previous row/pixel. This module implements exactly
that (PNG spec, RFC 2083), so the capability probe runs FOR REAL here.

Scope: 8- and 16-bit depth (16-bit samples keep their high byte, PIL
convert-style), color types 0 (gray), 2 (RGB), 3 (palette), 4
(gray+alpha), 6 (RGBA), non-interlaced AND Adam7-interlaced (seven
sub-images unfiltered independently, pixels scattered to the grid).
Bit depths 1/2/4 raise NotImplementedError (the caller's codec-gate
contract). Output is raw RGB24, alpha dropped (matching PIL's
``convert("RGB")`` channel-drop semantics for RGBA input).

Performance note: unfiltering is per-byte Python — fine for the kernel's
capability-probe position and tests; a production pixel pipeline would
vectorize with numpy per row (documented, not needed for the contract).
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

# samples per pixel by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# hard bound on the unfiltered scanline buffer (~64 MB ≈ a 4600x4600 RGB
# image) — the per-byte Python unfilter loop and the kernel's memory
# budget both want a ceiling; larger images need a real image library
_MAX_RAW_BYTES = 1 << 26


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == _SIG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


# Adam7 pass layout: (x_start, y_start, x_step, y_step) — PNG spec 8.5.2;
# the seven passes tile the pixel grid exactly once (tested by decoding a
# hand-interlaced image back to its row-major original)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _unfilter_image(raw: bytes, off: int, w: int, h: int, bpp: int):
    """Unfilter one (sub-)image of w x h pixels at `bpp` bytes/pixel
    starting at `raw[off]`; returns (sample bytes, next offset)."""
    stride = w * bpp
    out = bytearray(stride * h)
    prev_start = -1
    for y in range(h):
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        off += 1 + stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            if prev_start >= 0:
                for i in range(stride):
                    line[i] = (line[i] + out[prev_start + i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                up = out[prev_start + i] if prev_start >= 0 else 0
                line[i] = (line[i] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                up = out[prev_start + i] if prev_start >= 0 else 0
                ul = out[prev_start + i - bpp] if (prev_start >= 0 and i >= bpp) else 0
                line[i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        start = y * stride
        out[start : start + stride] = line
        prev_start = start
    return out, off


def decode_png(data: bytes) -> tuple[int, int, str, bytes]:
    """PNG bytes -> (width, height, "RGB", raw RGB24 bytes)."""
    data = bytes(data)
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    palette = b""
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc (crc not verified)
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth not in (8, 16):
        raise NotImplementedError(f"PNG bit depth {bit_depth} (8/16 supported)")
    if bit_depth == 16 and color_type == 3:
        raise ValueError("16-bit palette PNG is not a legal combination")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    if color_type not in _CHANNELS:
        raise NotImplementedError(f"PNG color type {color_type}")
    ch = _CHANNELS[color_type]
    sample_bytes = bit_depth // 8
    bpp = ch * sample_bytes
    stride = width * ch
    if interlace == 0:
        passes = [(0, 0, 1, 1, width, height)]
    else:
        passes = [
            (
                x0, y0, dx, dy,
                (width - x0 + dx - 1) // dx if width > x0 else 0,
                (height - y0 + dy - 1) // dy if height > y0 else 0,
            )
            for x0, y0, dx, dy in _ADAM7
        ]
    expected = sum((pw * bpp + 1) * ph for _, _, _, _, pw, ph in passes if pw and ph)
    # decompression-bomb guard (review finding): the expected raw size is
    # known from IHDR before inflating — refuse absurd dimensions, and cap
    # the inflater at expected bytes so a crafted IDAT can never allocate
    # past the header's own claim.
    if expected > _MAX_RAW_BYTES:
        raise ValueError(
            f"PNG raw size {expected} exceeds the stdlib decoder's"
            f" {_MAX_RAW_BYTES}-byte bound ({width}x{height}x{ch})"
        )
    d = zlib.decompressobj()
    # ask for one byte beyond expected: a stream inflating past the
    # header's claim returns expected+1 bytes and trips the mismatch
    raw = d.decompress(bytes(idat), expected + 1)
    if len(raw) != expected:
        raise ValueError("PNG IDAT length mismatch")
    if not d.eof:
        # exactly-expected bytes but the deflate stream never terminated:
        # a truncated IDAT (trailer stripped) must fail like the plain
        # zlib.decompress it replaced, not return pixels from a corrupt
        # file (review finding)
        raise ValueError("PNG IDAT truncated (deflate stream not terminated)")

    # unfilter, then reduce to 8-bit samples in image order
    if interlace == 0 and sample_bytes == 1:
        # fast path: the unfiltered buffer IS the sample grid
        out, _ = _unfilter_image(raw, 0, width, height, bpp)
    else:
        out = bytearray(stride * height)
        off = 0
        for x0, y0, dx, dy, pw, ph in passes:
            if not pw or not ph:
                continue
            sub, off = _unfilter_image(raw, off, pw, ph, bpp)
            # scatter sub-image pixels into the full grid, keeping the
            # high byte of each (big-endian) sample — PIL convert style
            for py in range(ph):
                srow = py * pw * bpp
                drow = (y0 + py * dy) * stride
                for px in range(pw):
                    s = srow + px * bpp
                    d = drow + (x0 + px * dx) * ch
                    for c in range(ch):
                        out[d + c] = sub[s + c * sample_bytes]

    # channel conversion -> RGB24 (alpha dropped, PIL convert("RGB") style)
    if color_type == 2:
        rgb = bytes(out)
    elif color_type == 0:
        rgb = bytes(v for v in out for _ in (0, 1, 2))
    elif color_type == 4:
        rgb = bytes(
            out[i] for i in range(0, len(out), 2) for _ in (0, 1, 2)
        )
    elif color_type == 6:
        rgb = bytearray()
        for i in range(0, len(out), 4):
            rgb += out[i : i + 3]
        rgb = bytes(rgb)
    else:  # palette
        if not palette:
            raise ValueError("palette PNG missing PLTE")
        n_entries = len(palette) // 3
        rgb = bytearray()
        for v in out:
            if v >= n_entries:
                # a silent short slice would misalign every later pixel;
                # fail at the decode boundary instead (review finding)
                raise ValueError(
                    f"palette index {v} out of range (PLTE has {n_entries})"
                )
            rgb += palette[3 * v : 3 * v + 3]
        rgb = bytes(rgb)
    return width, height, "RGB", rgb


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal RGB24 -> PNG encoder (filter 0 everywhere) for fixtures and
    round-trip tests; real sinks would use an image library."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = width * 3
    scan = b"".join(
        b"\x00" + rgb[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan, 6))
        + chunk(b"IEND", b"")
    )
