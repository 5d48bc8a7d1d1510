"""Baseline JPEG codec in pure Python (SURVEY.md §2.11 L5 — the last leg
of the media-decode surface).

Scope (honest): spec-true baseline sequential JFIF, 8-bit, 4:4:4, one scan
— real marker parsing, real DQT/DHT tables (the spec's Annex K examples),
real Huffman entropy decode with bit-unstuffing (0xFF00), zigzag,
dequantization, and a separable 2-D IDCT. Progressive JPEG, subsampled
chroma, and restart markers raise ``NotImplementedError``.

Determinism: the general IDCT rounds floats, so arbitrary photographic
JPEGs decode correctly but not bit-provably against a SQL oracle. The
declared query therefore synthesizes FLAT-BLOCK images (every 8x8 block
one color): the encoder emits real Huffman-coded DC deltas + EOBs, and
for DC-only blocks the IDCT is exactly ``round(dc/8) + 128`` — integer-
exact, so the oracle recomputes pixels closed-form while the decoder
still exercises the full marker walk, Huffman tree, bit-unstuffing, and
dequantization paths. Chroma planes are encoded neutral (Cb=Cr=128), and
the integer YCbCr->RGB conversion is exact at neutral chroma (R=G=B=Y).
Non-flat round-trips are property-tested against a float reference with
tolerance in tests/test_llm_ops.py.

Reference parity: the reference repo has no media path at all (its whole
surface is airflow/dags/weather_etl.py); this module exists for the
brief's multimodal-columns mandate.
"""

from __future__ import annotations

import math
import struct

# ---------------------------------------------------------------------------
# Annex K example tables (public JPEG spec, ITU T.81)

# Luminance quantization (quality ~50), in zigzag order when written.
# We use a DC step of 8 (see module docstring: makes flat blocks exact)
# and keep the spec's AC steps.
QTAB_LUMA = [
    8, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QTAB_CHROMA = [
    8, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Huffman table specs: (bits[1..16], values). Annex K.3.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical JPEG code assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, for the decoder."""
    return {(l, c): v for v, (c, l) in _huff_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self) -> bytes:
        if self.n:
            pad = self.acc << (8 - self.n) | ((1 << (8 - self.n)) - 1)
            self.buf.append(pad)
            if pad == 0xFF:
                self.buf.append(0x00)
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker inside entropy data")
                self.pos += 1  # skip stuffed 0x00
            self.acc, self.n = b, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _category(v: int) -> tuple[int, int]:
    """JPEG magnitude category + the appended bits for value v."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):
        return bits - (1 << cat) + 1
    return bits


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes((0xFF, marker)) + struct.pack(">H", len(payload) + 2) + payload


def encode_coef_jpeg(
    width: int, height: int, luma_coefs: list[list[list[int]]]
) -> bytes:
    """Real baseline JFIF encoder over arbitrary QUANTIZED luma
    coefficient blocks: ``luma_coefs[by][bx]`` is a 64-entry list in
    natural (row-major) order; chroma is neutral (all-zero blocks). Runs
    the full entropy path — DC delta categories, AC run/size symbols, ZRL
    for 16+ zero runs, EOB — so the decoder's Huffman/zigzag/dequant
    layers are exercised by arbitrary spectra, not just flat blocks."""
    if width % 8 or height % 8:
        raise ValueError("fixture dims must be multiples of 8")
    bw, bh = width // 8, height // 8
    if len(luma_coefs) != bh or any(len(r) != bw for r in luma_coefs):
        raise ValueError("block grid does not match dims")

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT: table 0 (luma), table 1 (chroma) — written in zigzag order
    zz_l = bytes(QTAB_LUMA[ZIGZAG[i]] for i in range(64))
    zz_c = bytes(QTAB_CHROMA[ZIGZAG[i]] for i in range(64))
    out += _seg(0xDB, b"\x00" + zz_l + b"\x01" + zz_c)
    # SOF0: 8-bit, 3 components, 4:4:4
    sof = struct.pack(">BHHB", 8, height, width, 3)
    sof += bytes((1, 0x11, 0)) + bytes((2, 0x11, 1)) + bytes((3, 0x11, 1))
    out += _seg(0xC0, sof)
    # DHT: four tables
    def dht(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([tc_th]) + bytes(bits) + bytes(vals)

    out += _seg(
        0xC4,
        dht(0x00, DC_LUMA_BITS, DC_LUMA_VALS)
        + dht(0x10, AC_LUMA_BITS, AC_LUMA_VALS)
        + dht(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + dht(0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
    )
    # SOS
    out += _seg(0xDA, bytes((3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0)))

    dc_l = _huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    w = _BitWriter()
    prev = [0, 0, 0]  # DC predictors per component
    zero_block = [0] * 64

    def put_block(coefs: list[int], comp: int, dct, act) -> None:
        zz = [coefs[ZIGZAG[i]] for i in range(64)]
        diff = zz[0] - prev[comp]
        prev[comp] = zz[0]
        cat, bits_v = _category(diff)
        if cat > 11:
            raise ValueError(f"DC delta too large for baseline JPEG: {diff}")
        code, ln = dct[cat]
        w.put(code, ln)
        if cat:
            w.put(bits_v, cat)
        k = 1
        run = 0
        last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
        while k <= last_nz:
            if zz[k] == 0:
                run += 1
                k += 1
                continue
            while run >= 16:
                code, ln = act[0xF0]  # ZRL
                w.put(code, ln)
                run -= 16
            cat, bits_v = _category(zz[k])
            if cat > 10:
                raise ValueError(f"AC coefficient too large: {zz[k]}")
            code, ln = act[(run << 4) | cat]
            w.put(code, ln)
            w.put(bits_v, cat)
            run = 0
            k += 1
        if last_nz < 63:
            code, ln = act[0x00]  # EOB
            w.put(code, ln)

    for by in range(bh):
        for bx in range(bw):
            put_block(luma_coefs[by][bx], 0, dc_l, ac_l)
            put_block(zero_block, 1, dc_c, ac_c)
            put_block(zero_block, 2, dc_c, ac_c)
    out += w.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_flat_jpeg(width: int, height: int, block_y: list[list[int]]) -> bytes:
    """FLAT-BLOCK fixture encoder: ``block_y[by][bx]`` is the luma
    (0..255) of the 8x8 block at (bx, by); chroma neutral. Every block is
    DC-only with the coefficient chosen so dequant = 8*(y-128), making
    the decode integer-exact (module docstring) while the entropy layer
    stays real."""
    bw, bh = width // 8, height // 8
    qdc_l = QTAB_LUMA[0]
    coef_blocks = []
    for by in range(bh):
        row = []
        for bx in range(bw):
            y = block_y[by][bx]
            if not 0 <= y <= 255:
                raise ValueError(f"luma out of range: {y}")
            want = 8 * (y - 128)
            if want % qdc_l:
                raise ValueError("luma DC step must divide 8*(y-128)")
            coefs = [0] * 64
            coefs[0] = want // qdc_l
            row.append(coefs)
        coef_blocks.append(row)
    return encode_coef_jpeg(width, height, coef_blocks)


def decode_jpeg_pixels(payload: bytes) -> tuple[int, int, bytes]:
    """Real baseline JPEG decoder: marker walk, DQT/DHT/SOF0/SOS parse,
    Huffman entropy decode with bit-unstuffing, zigzag + dequant, 2-D
    IDCT, YCbCr->RGB. Supports baseline 8-bit 4:4:4 (and grayscale), one
    scan, no restart markers — the declared scope; anything else raises
    ``NotImplementedError``. Returns ``(width, height, rgb)``."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = None
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qtab)
    scan: list[tuple[int, int, int]] = []   # (comp_idx, dc_table, ac_table)
    entropy_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = body[p + 1 : p + 65]
                tab = [0] * 64
                for i in range(64):
                    tab[ZIGZAG[i]] = zz[i]
                qtabs[tq] = tab
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                huff[(tc, th)] = _huff_decode_map(bits, vals)
                p += 17 + n
        elif marker == 0xC0:
            precision, height, width, nc = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise NotImplementedError("non-8-bit precision")
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                if samp != 0x11:
                    raise NotImplementedError("subsampled chroma (not 4:4:4)")
                comps.append((cid, samp, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise NotImplementedError("non-baseline JPEG (progressive/extended)")
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals")
        elif marker == 0xDA:
            ns = body[0]
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                idx = next(j for j, c in enumerate(comps) if c[0] == cs)
                scan.append((idx, tt >> 4, tt & 0xF))
            entropy_start = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if width is None or entropy_start is None:
        raise ValueError("JPEG missing SOF/SOS")
    end = payload.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("JPEG missing EOI")
    reader = _BitReader(payload[entropy_start:end])

    def read_huff(table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | reader.bit()
            length += 1
            v = table.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code")

    bw, bh = (width + 7) // 8, (height + 7) // 8
    planes = [
        [[0] * (bw * 8) for _ in range(bh * 8)] for _ in range(len(comps))
    ]
    pred = [0] * len(comps)
    inv_cos = [
        [
            (math.sqrt(0.125) if u == 0 else 0.5)
            * math.cos((2 * x + 1) * u * math.pi / 16)
            for u in range(8)
        ]
        for x in range(8)
    ]
    for by in range(bh):
        for bx in range(bw):
            for comp_idx, dc_t, ac_t in scan:
                q = qtabs[comps[comp_idx][2]]
                zz = [0] * 64
                cat = read_huff(huff[(0, dc_t)])
                diff = _extend(reader.bits(cat), cat)
                pred[comp_idx] += diff
                zz[0] = pred[comp_idx]
                k = 1
                while k < 64:
                    rs = read_huff(huff[(1, ac_t)])
                    r, s = rs >> 4, rs & 0xF
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += r
                    if k > 63:
                        raise ValueError("AC run past block end")
                    zz[k] = _extend(reader.bits(s), s)
                    k += 1
                coefs = [0] * 64
                for i in range(64):
                    coefs[ZIGZAG[i]] = zz[i] * q[ZIGZAG[i]]
                # separable IDCT; DC-only fast path is EXACT by design
                if not any(coefs[1:]):
                    val = round(coefs[0] / 8) + 128
                    val = 0 if val < 0 else 255 if val > 255 else val
                    block = [[val] * 8 for _ in range(8)]
                else:
                    tmp = [
                        [
                            sum(coefs[v * 8 + u] * inv_cos[x][u] for u in range(8))
                            for x in range(8)
                        ]
                        for v in range(8)
                    ]
                    block = []
                    for y in range(8):
                        row = []
                        for x in range(8):
                            s_val = sum(tmp[v][x] * inv_cos[y][v] for v in range(8))
                            val = round(s_val) + 128
                            row.append(0 if val < 0 else 255 if val > 255 else val)
                        block.append(row)
                plane = planes[comp_idx]
                for y in range(8):
                    for x in range(8):
                        plane[by * 8 + y][bx * 8 + x] = block[y][x]
    rgb = bytearray()
    gray = len(comps) == 1
    for y in range(height):
        for x in range(width):
            if gray:
                v = planes[0][y][x]
                rgb += bytes((v, v, v))
            else:
                Y, cb, cr = (planes[c][y][x] for c in range(3))
                r = Y + 1.402 * (cr - 128)
                g = Y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
                b = Y + 1.772 * (cb - 128)
                rgb += bytes(
                    0 if v < 0 else 255 if v > 255 else int(round(v))
                    for v in (r, g, b)
                )
    return width, height, bytes(rgb)
