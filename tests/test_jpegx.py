"""Baseline JPEG decoder (core/jpegx.py) correctness.

The decoder is verified against an INDEPENDENT test-only encoder written
here (forward DCT + quantize + Huffman, the opposite transform direction —
a shared misunderstanding would have to cancel exactly), plus closed-form
flat-field documents and typed-error/fuzz contracts.
"""

from __future__ import annotations

import math
import struct

import pytest

from ai_service_ocr_grading_handler_spark.core import jpegx

# --- tiny test-only encoder ---------------------------------------------------

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16.0) for x in range(8)] for u in range(8)
]
_C = [1.0 / math.sqrt(2.0)] + [1.0] * 7


def _fdct(block):  # block: 64 ints (raster), level-shifted inside
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (block[x * 8 + y] - 128) * _COS[u][x] * _COS[v][y]
            out[u * 8 + v] = 0.25 * _C[u] * _C[v] * s
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value, n):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        while self.nbits:
            self.write(1, 1)  # pad with 1s per spec


# fixed-length canonical tables (valid JPEG DHT payloads): 12 DC categories
# as 4-bit codes, all 256 run/size bytes as... 256 would overflow 8 bits, so
# emit only the 162 standard AC symbols actually produced by the encoder.
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = bytes(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_BITS = [0] * 16
_AC_BITS[7] = len(_AC_SYMBOLS)  # all codes length 8
_AC_VALS = bytes(_AC_SYMBOLS)
_DC_CODE = {v: (i, 4) for i, v in enumerate(_DC_VALS)}
_AC_CODE = {v: (i, 8) for i, v in enumerate(_AC_VALS)}


def _cat(v):
    return abs(v).bit_length()


def _encode_block(w, coef_q, pred):
    dc = coef_q[0]
    diff = dc - pred
    t = _cat(diff)
    code, ln = _DC_CODE[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if coef_q[jpegx.ZIGZAG[k]]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = coef_q[jpegx.ZIGZAG[k]]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = _AC_CODE[0xF0]
            w.write(code, ln)
            run -= 16
        s = _cat(v)
        code, ln = _AC_CODE[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = _AC_CODE[0x00]
        w.write(code, ln)
    return dc


def _plane_blocks(plane, pw, ph, x0, y0):
    """8x8 raster block at (x0, y0), edge-replicated."""
    return [
        plane[min(y0 + r, ph - 1) * pw + min(x0 + c, pw - 1)]
        for r in range(8)
        for c in range(8)
    ]


def encode_jpeg(width, height, planes, sampling, restart=0):
    """planes: list of (plane_bytes, pw, ph) in Y[,Cb,Cr]; sampling: list of
    (h, v) per component. Quant table = all ones (near-lossless)."""
    ncomp = len(planes)
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for ci, (h, v) in enumerate(sampling):
        sof += struct.pack(">BBB", ci + 1, (h << 4) | v, 0)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, (bits, vals) in ((0, (_DC_BITS, _DC_VALS)), (1, (_AC_BITS, _AC_VALS))):
        body = bytes([tc << 4]) + bytes(bits) + vals
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    w = _BitWriter()
    preds = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                w.flush()
                out += w.out
                w = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            for ci, ((plane, pw, ph), (h, v)) in enumerate(zip(planes, sampling)):
                for by in range(v):
                    for bx in range(h):
                        block = _plane_blocks(
                            plane, pw, ph, (mx * h + bx) * 8, (my * v + by) * 8
                        )
                        coef = [int(round(c)) for c in _fdct(block)]
                        preds[ci] = _encode_block(w, coef, preds[ci])
            mcu_count += 1
    w.flush()
    out += w.out + b"\xff\xd9"
    return bytes(out)


def _rgb_to_ycbcr(rgb, width, height):
    y = bytearray(width * height)
    cb = bytearray(width * height)
    cr = bytearray(width * height)
    for i in range(width * height):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        y[i] = min(255, max(0, round(0.299 * r + 0.587 * g + 0.114 * b)))
        cb[i] = min(255, max(0, round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128)))
        cr[i] = min(255, max(0, round(0.5 * r - 0.418688 * g - 0.081312 * b + 128)))
    return y, cb, cr


def _subsample(plane, width, height):
    """2x2 average downsample (edge-replicating odd sizes)."""
    w2, h2 = -(-width // 2), -(-height // 2)
    out = bytearray(w2 * h2)
    for yy in range(h2):
        for xx in range(w2):
            vals = [
                plane[min(2 * yy + dy, height - 1) * width + min(2 * xx + dx, width - 1)]
                for dy in (0, 1)
                for dx in (0, 1)
            ]
            out[yy * w2 + xx] = sum(vals) // 4
    return out, w2, h2


def _gradient_rgb(width, height):
    rgb = bytearray()
    for y in range(height):
        for x in range(width):
            rgb += bytes((
                (x * 7 + y * 3) % 256 // 2 + 40,
                (x * 2 + y * 11) % 256 // 2 + 60,
                (x * 5 + y * 5) % 256 // 2 + 20,
            ))
    return bytes(rgb)


# --- test-only PROGRESSIVE encoder -------------------------------------------
# Emits a real SOF2 scan script: interleaved DC first (Al), per-component
# AC-first band scans (Al), then DC and AC refinement scans down to bit 0 —
# exercising spectral selection, successive approximation, EOB runs and
# (optionally) restart markers. Independent transform direction, like the
# baseline encoder above.

# extended AC table for progressive: all EOBRUN symbols (r<<4)|0 plus the
# standard run/size pairs, every code 8 bits (176 <= 256 capacity)
_ACP_SYMBOLS = [(r << 4) for r in range(16)] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_ACP_BITS = [0] * 16
_ACP_BITS[7] = len(_ACP_SYMBOLS)
_ACP_VALS = bytes(_ACP_SYMBOLS)
_ACP_CODE = {v: (i, 8) for i, v in enumerate(_ACP_SYMBOLS)}


class _ProgScanWriter:
    """BitWriter + EOB-run and buffered-correction-bit state for one scan."""

    def __init__(self, out):
        self.out = out
        self.w = _BitWriter()
        self.eobrun = 0
        self.corr = []  # correction bits pending behind the next symbol
        self.rst = 0

    def sym(self, rs):
        code, ln = _ACP_CODE[rs]
        self.w.write(code, ln)

    def flush_eobrun(self):
        if self.eobrun:
            n = self.eobrun
            r = n.bit_length() - 1
            self.sym(r << 4)
            if r:
                self.w.write(n - (1 << r), r)
            self.eobrun = 0
        for b in self.corr:
            self.w.write(b, 1)
        self.corr.clear()

    def restart(self):
        self.flush_eobrun()
        self.w.flush()
        self.out += self.w.out
        self.out += bytes([0xFF, 0xD0 + self.rst])
        self.rst = (self.rst + 1) % 8
        self.w = _BitWriter()

    def finish(self):
        self.flush_eobrun()
        self.w.flush()
        self.out += self.w.out


def _comp_span(width, height, h, v, hmax, vmax):
    cw, ch = -(-width * h // hmax), -(-height * v // vmax)
    return -(-cw // 8), -(-ch // 8)


def _ac_first_block(sw, vals, ss, se, al):
    """vals: zigzag-order full coefficients for one block."""
    band = [(abs(vals[k]) >> al) * (1 if vals[k] >= 0 else -1)
            for k in range(ss, se + 1)]
    last = -1
    for idx, t in enumerate(band):
        if t:
            last = idx
    if last < 0:
        sw.eobrun += 1
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()
        return
    sw.flush_eobrun()
    run = 0
    for idx in range(last + 1):
        t = band[idx]
        if t == 0:
            run += 1
            continue
        while run >= 16:
            sw.sym(0xF0)
            run -= 16
        s = abs(t).bit_length()
        sw.sym((run << 4) | s)
        sw.w.write(t if t >= 0 else t + (1 << s) - 1, s)
        run = 0
    if last < se - ss:
        sw.eobrun += 1


def _ac_refine_block(sw, vals, ss, se, al):
    # mirrors libjpeg jcphuff encode_mcu_AC_refine exactly (the decoder
    # mirrors jdphuff): ZRLs are emitted at ANY nonzero coefficient while
    # r > 15 within the EOB span — including history-nonzero ones — and
    # each emitted symbol flushes only the correction bits buffered since
    # the previous symbol
    band = [abs(vals[k]) >> al for k in range(ss, se + 1)]
    eob_idx = -1  # last newly-nonzero (magnitude exactly 1) position
    for idx, t in enumerate(band):
        if t == 1:
            eob_idx = idx
    r = 0
    pend = []  # correction bits since the last emitted symbol in THIS block
    for idx in range(len(band)):
        t = band[idx]
        if t == 0:
            r += 1
            continue
        while r > 15 and idx <= eob_idx:
            sw.flush_eobrun()
            sw.sym(0xF0)
            r -= 16
            for b in pend:
                sw.w.write(b, 1)
            pend = []
        if t > 1:  # history-nonzero: correction bit, run untouched
            pend.append(t & 1)
            continue
        # newly nonzero (t == 1)
        sw.flush_eobrun()
        sw.sym((r << 4) | 1)
        sw.w.write(1 if vals[ss + idx] >= 0 else 0, 1)
        for b in pend:
            sw.w.write(b, 1)
        pend = []
        r = 0
    if r > 0 or pend:
        sw.eobrun += 1
        sw.corr.extend(pend)
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()


def encode_jpeg_progressive(width, height, planes, sampling, restart=0, split=6):
    """Progressive (SOF2) encoder over the same q=1 coefficients the
    baseline encoder produces. Scan script: DC first (Al=1, interleaved) ->
    AC first per comp in bands [1, split], [split+1, 63] (Al=1) -> DC
    refine (Al=0) -> AC refine per comp, same bands (Ah=1, Al=0)."""
    ncomp = len(planes)
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    # per-comp zigzag coefficients over the MCU-padded block grid
    coefs = []
    for (plane, pw, ph), (h, v) in zip(planes, sampling):
        blocks = []
        for by in range(mcus_y * v):
            for bx in range(mcus_x * h):
                raster = [
                    int(round(c))
                    for c in _fdct(_plane_blocks(plane, pw, ph, bx * 8, by * 8))
                ]
                blocks.append([raster[jpegx.ZIGZAG[k]] for k in range(64)])
        coefs.append(blocks)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for ci, (h, v) in enumerate(sampling):
        sof += struct.pack(">BBB", ci + 1, (h << 4) | v, 0)
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, (bits, vals) in ((0, (_DC_BITS, _DC_VALS)), (1, (_ACP_BITS, _ACP_VALS))):
        body = bytes([tc << 4]) + bytes(bits) + vals
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)

    def sos_header(comp_ids, ss, se, ah, al):
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            sos += bytes([cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # --- DC first: interleaved, Al=1
    out += sos_header(list(range(1, ncomp + 1)), 0, 0, 0, 1)
    sw = _ProgScanWriter(out)
    preds = [0] * ncomp
    unit = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and unit and unit % restart == 0:
                sw.restart()
                preds = [0] * ncomp
            for ci, (h, v) in enumerate(sampling):
                for by in range(v):
                    for bx in range(h):
                        blk = (my * v + by) * mcus_x * h + mx * h + bx
                        t = coefs[ci][blk][0] >> 1  # arithmetic, Al=1
                        diff = t - preds[ci]
                        preds[ci] = t
                        s = abs(diff).bit_length()
                        code, ln = _DC_CODE[s]
                        sw.w.write(code, ln)
                        if s:
                            sw.w.write(
                                diff if diff >= 0 else diff + (1 << s) - 1, s
                            )
            unit += 1
    sw.finish()

    # --- AC first scans: per comp, two bands, Al=1
    for ss, se in ((1, split), (split + 1, 63)):
        for ci, (h, v) in enumerate(sampling):
            out += sos_header([ci + 1], ss, se, 0, 1)
            sw = _ProgScanWriter(out)
            bw, bh = _comp_span(width, height, h, v, hmax, vmax)
            unit = 0
            for by in range(bh):
                for bx in range(bw):
                    if restart and unit and unit % restart == 0:
                        sw.restart()
                    unit += 1
                    _ac_first_block(
                        sw, coefs[ci][by * mcus_x * h + bx], ss, se, 1
                    )
            sw.finish()

    # --- DC refine: interleaved, Al=0
    out += sos_header(list(range(1, ncomp + 1)), 0, 0, 1, 0)
    sw = _ProgScanWriter(out)
    unit = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and unit and unit % restart == 0:
                sw.restart()
            for ci, (h, v) in enumerate(sampling):
                for by in range(v):
                    for bx in range(h):
                        blk = (my * v + by) * mcus_x * h + mx * h + bx
                        sw.w.write(coefs[ci][blk][0] & 1, 1)
            unit += 1
    sw.finish()

    # --- AC refine scans: per comp, same bands, Ah=1 -> Al=0
    for ss, se in ((1, split), (split + 1, 63)):
        for ci, (h, v) in enumerate(sampling):
            out += sos_header([ci + 1], ss, se, 1, 0)
            sw = _ProgScanWriter(out)
            bw, bh = _comp_span(width, height, h, v, hmax, vmax)
            unit = 0
            for by in range(bh):
                for bx in range(bw):
                    if restart and unit and unit % restart == 0:
                        sw.restart()
                    unit += 1
                    _ac_refine_block(
                        sw, coefs[ci][by * mcus_x * h + bx], ss, se, 0
                    )
            sw.finish()

    out += b"\xff\xd9"
    return bytes(out)


# --- tests --------------------------------------------------------------------


def test_flat_gray_closed_form():
    """A flat 8x8 grayscale field decodes to exactly itself: only the DC
    coefficient is nonzero and IDCT of a DC-only block is constant."""
    for val in (0, 128, 200, 255):
        plane = bytes([val] * 64)
        data = encode_jpeg(8, 8, [(plane, 8, 8)], [(1, 1)])
        w, h, mode, rgb = jpegx.decode_jpeg(data)
        assert (w, h, mode) == (8, 8, "RGB")
        assert max(abs(p - val) for p in rgb) <= 1


def test_grayscale_roundtrip_near_lossless():
    """Structured 24x16 grayscale at quant=1 round-trips within +/-2
    through the independent encoder (fDCT) and the decoder (iDCT)."""
    width, height = 24, 16
    plane = bytes(
        ((x * 13 + y * 29) % 211 + (x * y) % 37) % 256
        for y in range(height)
        for x in range(width)
    )
    data = encode_jpeg(width, height, [(plane, width, height)], [(1, 1)])
    w, h, mode, rgb = jpegx.decode_jpeg(data)
    assert (w, h) == (width, height)
    for i in range(width * height):
        g = rgb[3 * i]
        assert rgb[3 * i + 1] == g and rgb[3 * i + 2] == g
        assert abs(g - plane[i]) <= 2, (i, g, plane[i])


def test_color_444_roundtrip():
    width, height = 16, 16
    rgb_in = _gradient_rgb(width, height)
    y, cb, cr = _rgb_to_ycbcr(rgb_in, width, height)
    data = encode_jpeg(
        width, height,
        [(y, width, height), (cb, width, height), (cr, width, height)],
        [(1, 1), (1, 1), (1, 1)],
    )
    w, h, mode, rgb = jpegx.decode_jpeg(data)
    assert (w, h, mode) == (16, 16, "RGB")
    worst = max(abs(a - b) for a, b in zip(rgb, rgb_in))
    assert worst <= 4, worst


def test_color_420_subsampled_flat():
    """4:2:0: a flat color field survives chroma subsampling exactly (the
    generic h/v MCU path, 4 luma blocks + 1 of each chroma per MCU)."""
    width, height = 32, 16
    rgb_in = bytes((180, 90, 40)) * (width * height)
    y, cb, cr = _rgb_to_ycbcr(rgb_in, width, height)
    cb2, cw, ch = _subsample(cb, width, height)
    cr2, _, _ = _subsample(cr, width, height)
    data = encode_jpeg(
        width, height,
        [(y, width, height), (cb2, cw, ch), (cr2, cw, ch)],
        [(2, 2), (1, 1), (1, 1)],
    )
    w, h, _, rgb = jpegx.decode_jpeg(data)
    assert (w, h) == (width, height)
    worst = max(abs(a - b) for a, b in zip(rgb, rgb_in))
    assert worst <= 3, worst


def test_odd_dimensions_edge_padding():
    """Non-multiple-of-8 frames decode at the declared size (MCU padding
    cropped)."""
    width, height = 13, 11
    plane = bytes((x * 17 + y * 23) % 256 for y in range(height) for x in range(width))
    data = encode_jpeg(width, height, [(plane, width, height)], [(1, 1)])
    w, h, _, rgb = jpegx.decode_jpeg(data)
    assert (w, h) == (width, height) and len(rgb) == width * height * 3
    for i in range(width * height):
        assert abs(rgb[3 * i] - plane[i]) <= 2


def test_restart_intervals_decode_identically():
    width, height = 32, 8
    plane = bytes((x * 31 + y * 7) % 256 for y in range(height) for x in range(width))
    plain = encode_jpeg(width, height, [(plane, width, height)], [(1, 1)])
    rst = encode_jpeg(width, height, [(plane, width, height)], [(1, 1)], restart=1)
    assert b"\xff\xd0" in rst or b"\xff\xd1" in rst
    assert jpegx.decode_jpeg(plain) == jpegx.decode_jpeg(rst)


def test_fill_bytes_before_markers_decode_identically():
    """JPEG permits runs of 0xFF fill bytes before ANY marker (including
    RSTn and EOI). The old scan-splitter classified 0xFF 0xFF as
    end-of-scan and truncated mid-stream (round-4 advice)."""
    width, height = 32, 8
    plane = bytes((x * 31 + y * 7) % 256 for y in range(height) for x in range(width))
    rst = encode_jpeg(width, height, [(plane, width, height)], [(1, 1)], restart=1)
    # pad every restart marker and the EOI with fill bytes
    padded = rst
    for m in (b"\xff\xd0", b"\xff\xd1", b"\xff\xd2", b"\xff\xd9"):
        padded = padded.replace(m, b"\xff\xff\xff" + m)
    assert padded != rst
    assert jpegx.decode_jpeg(padded) == jpegx.decode_jpeg(rst)


def test_progressive_and_garbage_are_typed():
    width, height = 8, 8
    plane = bytes(range(64))
    good = encode_jpeg(width, height, [(plane, width, height)], [(1, 1)])
    # flipping SOF0 -> SOF2 leaves a BASELINE scan header (Ss=0, Se=63):
    # as a progressive stream that is a malformed DC scan — typed
    # ValueError, no longer NotImplementedError (SOF2 is now decoded)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        jpegx.decode_jpeg(prog)
    arith = good.replace(b"\xff\xc0", b"\xff\xc9", 1)  # SOF9 arithmetic
    with pytest.raises(NotImplementedError):
        jpegx.decode_jpeg(arith)
    with pytest.raises(ValueError):
        jpegx.decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        jpegx.decode_jpeg(good[:40])  # truncated mid-segment
    assert jpegx.is_jpeg(good) and not jpegx.is_jpeg(b"\x89PNG")


def test_jpeg_fuzz_fails_cleanly():
    """Garbage and mutated-valid bytes raise typed errors or decode —
    never hang or escape with arbitrary exceptions (same contract as the
    PNG/PDF/WAV codecs)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    plane = bytes(range(64))
    good = encode_jpeg(8, 8, [(plane, 8, 8)], [(1, 1)])
    # struct.error deliberately NOT allowed: the module contract is
    # ValueError/NotImplementedError only (review finding: the old
    # allowlist encoded the contract violation instead of fixing it)
    allowed = (ValueError, NotImplementedError)

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=300), st.integers(0, len(good) - 1), st.integers(0, 255))
    def run(b, pos, byte):
        try:
            jpegx.decode_jpeg(b)
        except allowed:
            pass
        try:
            jpegx.decode_jpeg(b"\xff\xd8\xff" + b)
        except allowed:
            pass
        mutated = good[:pos] + bytes([byte]) + good[pos + 1 :]
        try:
            jpegx.decode_jpeg(mutated)
        except allowed:
            pass

    run()


def test_luma_subsampled_below_chroma():
    """Legal but unusual: Y sampled 1x1 while chroma is 2x2 (luma BELOW
    vmax/hmax) — every plane's row AND column index must scale by its own
    ratio (review finding: the Y row index was never scaled, so y >= h/2
    crashed with IndexError)."""
    width, height = 16, 16
    rgb_in = bytes((120, 200, 64)) * (width * height)
    y, cb, cr = _rgb_to_ycbcr(rgb_in, width, height)
    y2, yw, yh = _subsample(y, width, height)
    data = encode_jpeg(
        width, height,
        [(y2, yw, yh), (cb, width, height), (cr, width, height)],
        [(1, 1), (2, 2), (2, 2)],
    )
    w, h, _, rgb = jpegx.decode_jpeg(data)
    assert (w, h) == (width, height)
    worst = max(abs(a - b) for a, b in zip(rgb, rgb_in))
    assert worst <= 3, worst


def test_truncated_segments_raise_value_error():
    """Truncated SOF/SOS/DRI/DQT bodies raise ValueError, never
    struct.error/IndexError."""
    plane = bytes(range(64))
    good = encode_jpeg(8, 8, [(plane, 8, 8)], [(1, 1)])
    sof_at = good.index(b"\xff\xc0")
    # shrink the SOF length to 2 (empty body follows per the new length)
    bad_sof = good[: sof_at + 2] + b"\x00\x02" + good[sof_at + 4 :]
    with pytest.raises(ValueError):
        jpegx.decode_jpeg(bad_sof)
    sos_at = good.index(b"\xff\xda")
    bad_sos = good[: sos_at + 2] + b"\x00\x02" + good[sos_at + 4 :]
    with pytest.raises((ValueError, NotImplementedError)):
        jpegx.decode_jpeg(bad_sos)


def test_progressive_grayscale_matches_baseline():
    """SOF2 spectral selection + successive approximation: the progressive
    scan script encodes the SAME q=1 coefficients as the baseline encoder,
    so decoded pixels must be IDENTICAL to the baseline decode."""
    width, height = 24, 17
    plane = bytes((x * 13 + y * 5) % 256 for y in range(height) for x in range(width))
    base = encode_jpeg(width, height, [(plane, width, height)], [(1, 1)])
    prog = encode_jpeg_progressive(width, height, [(plane, width, height)], [(1, 1)])
    assert prog[2:4] != base[2:4] or b"\xff\xc2" in prog  # really SOF2
    assert jpegx.decode_jpeg(prog) == jpegx.decode_jpeg(base)


def test_progressive_color_420_matches_baseline():
    width, height = 19, 14
    rgb = _gradient_rgb(width, height)
    y, cb, cr = _rgb_to_ycbcr(rgb, width, height)
    cbs, cw, ch = _subsample(cb, width, height)
    crs, _, _ = _subsample(cr, width, height)
    planes = [(y, width, height), (cbs, cw, ch), (crs, cw, ch)]
    sampling = [(2, 2), (1, 1), (1, 1)]
    base = encode_jpeg(width, height, planes, sampling)
    prog = encode_jpeg_progressive(width, height, planes, sampling)
    assert jpegx.decode_jpeg(prog) == jpegx.decode_jpeg(base)


def test_progressive_restart_intervals_match():
    width, height = 32, 16
    plane = bytes((x * 7 + y * 11) % 256 for y in range(height) for x in range(width))
    plain = encode_jpeg_progressive(
        width, height, [(plane, width, height)], [(1, 1)]
    )
    rst = encode_jpeg_progressive(
        width, height, [(plane, width, height)], [(1, 1)], restart=1
    )
    assert any(bytes([0xFF, 0xD0 + i]) in rst for i in range(8))
    assert jpegx.decode_jpeg(rst) == jpegx.decode_jpeg(plain)


def test_progressive_flat_block_eob_runs():
    """A mostly-flat image makes every AC band empty -> long EOB runs
    across blocks (the r>0 EOBRUN path) must decode correctly."""
    width, height = 64, 24
    plane = bytearray([200] * (width * height))
    plane[0] = 10  # one perturbed pixel so scan 1 is not fully empty
    plane = bytes(plane)
    base = encode_jpeg(width, height, [(plane, width, height)], [(1, 1)])
    prog = encode_jpeg_progressive(width, height, [(plane, width, height)], [(1, 1)])
    assert jpegx.decode_jpeg(prog) == jpegx.decode_jpeg(base)


def test_progressive_scan_work_bomb_is_bounded():
    """A crafted SOF2 file repeating full-coverage scans indefinitely is
    an asymmetric CPU bomb: each one-EOB-byte scan costs O(blocks x band)
    decode work. The decoder budgets 24 full passes over every stored
    coefficient and raises ValueError beyond it — while spec-shaped
    files (up to ~14 successive-approximation passes) stay well inside."""
    import pytest as _pytest

    def bomb(n_scans):
        out = bytearray(b"\xff\xd8")
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
        sof = struct.pack(">BHHB", 8, 8, 8, 1) + struct.pack(">BBB", 1, 0x11, 0)
        out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
        # one-code tables: DC value 0 and AC value 0x00 (EOB) at length 1
        for tc in (0, 1):
            body = bytes([tc << 4]) + bytes([1] + [0] * 15) + b"\x00"
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
        # DC first scan: category 0 -> single 0 bit
        out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 0, 0x00])
        out += b"\x00"
        # repeated AC-first full-band scans: single EOB symbol each
        for _ in range(n_scans):
            out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 1, 63, 0x00])
            out += b"\x00"
        out += b"\xff\xd9"
        return bytes(out)

    # 8x8 gray = 1 block; budget = 24*64 visits; 63 visits per AC scan:
    # 20 scans (1260 + 1 DC) decode fine, 30 scans (1890) must be refused
    w, h, mode, _ = jpegx.decode_jpeg(bomb(20))
    assert (w, h, mode) == (8, 8, "RGB")
    with _pytest.raises(ValueError, match="scan work"):
        jpegx.decode_jpeg(bomb(30))


def test_second_sof_rejected_with_value_error():
    """A crafted stream with a second SOF between segments must fail with
    the contracted ValueError, not an IndexError from scan state sized for
    the first frame (round-5 ADVICE: T.81 allows one frame per image)."""
    plane = bytes(range(64))
    good = encode_jpeg(8, 8, [(plane, 8, 8)], [(1, 1)])
    sof_at = good.index(b"\xff\xc0")
    sof_len = 2 + int.from_bytes(good[sof_at + 2 : sof_at + 4], "big")
    sof_seg = good[sof_at : sof_at + sof_len]
    doubled = good[: sof_at + sof_len] + sof_seg + good[sof_at + sof_len :]
    with pytest.raises(ValueError, match="multiple SOF"):
        jpegx.decode_jpeg(doubled)
