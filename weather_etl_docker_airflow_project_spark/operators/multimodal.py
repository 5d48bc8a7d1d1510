"""Multimodal columns: binary payloads + typed metadata (SURVEY.md §2.11 L5).

Design: media travels as an opaque ``binary`` column beside a typed
metadata struct (format tag, byte length). All Python work runs through
``mapInPandas`` — Arrow-batched, one Python worker per partition, never
row-at-a-time — and projects the payload away as early as possible so big
blobs never ride a shuffle.

``decode_media`` parses real container headers (PNG IHDR, JPEG SOF
markers, GIF logical screen descriptor) in pure Python. FULL pixel decode
is also real and pure-Python for all three image formats: PNG (stdlib
zlib inflate + scanline unfilter, CRC-checked), GIF (LZW string-table
decode + palette), baseline JPEG (Huffman entropy decode + dequant +
IDCT, operators/jpeg.py — progressive/subsampled variants raise
``NotImplementedError`` with the scope stated). The byte featurizer uses
a deterministic byte-level feature set, so the Spark-side plumbing —
schema, batch shape, partitioning — is fully real and oracle-checkable.

Scale notes (100 TB): payload columns dominate scan bytes — the plans keep
them in their own projection, filter on metadata FIRST (predicate pushdown
on the scalar columns), and only then touch bytes. ``binaryFile`` reads or
parquet binary columns both fit this shape.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("checksum", T.LongType()),       # sum(bytes) % 997
        T.StructField("first_byte", T.LongType()),
        T.StructField("last_byte", T.LongType()),
    ]
)


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Simulate a multimodal table: UTF-8 payload bytes + metadata struct.
    In production the payload column arrives from parquet binary columns or
    ``spark.read.format('binaryFile')``; the shape is identical."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("text/utf-8").alias("format"),
            F.length(payload).alias("byte_len"),
        ).alias("meta"),
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG start-of-frame markers that carry dimensions (SOF0..SOF15 minus
# DHT/JPG/DAC which share the 0xC0 nibble but are not frames)
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


def encode_png_header(width: int, height: int) -> bytes:
    """Minimal structurally-valid PNG prefix: signature + IHDR chunk
    (8-bit RGB). CRC is zeroed — header sniffers don't verify it."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return _PNG_SIG + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + b"\x00" * 4


def encode_jpeg_header(width: int, height: int) -> bytes:
    """Minimal JPEG prefix: SOI, an APP0/JFIF segment (so the parser must
    actually walk segments), then a baseline SOF0 with the dimensions."""
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, height, width, 3) + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
    )


def encode_gif_header(width: int, height: int) -> bytes:
    """GIF89a header + logical screen descriptor (little-endian dims)."""
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00"


def decode_media(payload: bytes, fmt: str | None = None) -> dict:
    """Sniff a media payload's container format and dimensions from its
    header bytes — pure Python, no codec libraries. Returns
    ``{"format", "width", "height"}``.

    PNG: IHDR big-endian dims at a fixed offset. JPEG: walk marker
    segments to the first SOF frame. GIF: little-endian dims in the
    logical screen descriptor. Raises ``ValueError`` on bytes matching no
    known container. ``fmt='pixels'`` requests a full pixel decode — REAL
    for all three formats: PNG (stdlib zlib inflate + scanline unfilter),
    GIF (pure-Python LZW + palette), baseline JPEG (Huffman + dequant +
    IDCT, operators/jpeg.py)."""
    if fmt == "pixels":
        if payload[:8] == _PNG_SIG:
            w, h, rgb = decode_png_pixels(payload)
            return {"format": "image/png", "width": w, "height": h, "pixels": rgb}
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            w, h, rgb = decode_gif_pixels(payload)
            return {"format": "image/gif", "width": w, "height": h, "pixels": rgb}
        if payload[:2] == b"\xff\xd8":
            from .jpeg import decode_jpeg_pixels

            w, h, rgb = decode_jpeg_pixels(payload)
            return {"format": "image/jpeg", "width": w, "height": h, "pixels": rgb}
        raise ValueError("pixel decode: unrecognized image container")
    if payload[:8] == _PNG_SIG and payload[12:16] == b"IHDR" and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return {"format": "image/png", "width": w, "height": h}
    if payload[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= len(payload) and payload[pos] == 0xFF:
            marker, seg_len = payload[pos + 1], struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
            if marker in _JPEG_SOF:
                if pos + 9 > len(payload):  # SOF present but dims truncated
                    raise ValueError("truncated JPEG SOF segment")
                h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
                return {"format": "image/jpeg", "width": w, "height": h}
            pos += 2 + seg_len
        raise ValueError("JPEG with no SOF frame marker")
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return {"format": "image/gif", "width": w, "height": h}
    raise ValueError(f"unrecognized media container (fmt hint: {fmt!r})")


_PNG_BPP = 3  # 8-bit RGB (color type 2)


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): pick the neighbor (left, up,
    upper-left) closest to the linear estimate a + b - c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Full, real PNG encoder for 8-bit RGB: signature, IHDR, one
    deflate-compressed IDAT of filtered scanlines, IEND — with correct
    CRCs. Scanline ``y`` uses filter type ``y % 5``, so every filter
    (None/Sub/Up/Average/Paeth) appears in any image taller than 4 rows —
    the decoder must invert all five or the pixel round-trip fails."""
    if len(rgb) != width * height * _PNG_BPP:
        raise ValueError(f"need {width * height * _PNG_BPP} bytes, got {len(rgb)}")
    stride = width * _PNG_BPP
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = rgb[y * stride : (y + 1) * stride]
        ft = y % 5
        raw.append(ft)
        if ft == 0:
            raw += line
        elif ft == 1:  # Sub
            raw += bytes(
                (line[i] - (line[i - _PNG_BPP] if i >= _PNG_BPP else 0)) & 0xFF
                for i in range(stride)
            )
        elif ft == 2:  # Up
            raw += bytes((line[i] - prev[i]) & 0xFF for i in range(stride))
        elif ft == 3:  # Average
            raw += bytes(
                (line[i] - (((line[i - _PNG_BPP] if i >= _PNG_BPP else 0) + prev[i]) >> 1))
                & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (
                    line[i]
                    - _paeth(
                        line[i - _PNG_BPP] if i >= _PNG_BPP else 0,
                        prev[i],
                        prev[i - _PNG_BPP] if i >= _PNG_BPP else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_pixels(payload: bytes) -> tuple[int, int, bytes]:
    """Full, real PNG pixel decode in pure Python + stdlib zlib: chunk
    walk with CRC verification, IDAT concatenation, inflate, then scanline
    unfiltering for all five PNG filter types. Supports 8-bit RGB
    non-interlaced (color type 2) — the declared scope; anything else
    raises ``NotImplementedError``. Returns ``(width, height, rgb)`` with
    ``rgb`` row-major RGBRGB... This closes the round-2 pixel-decode stub:
    encoder (forward filters) and decoder (inverse filters) are
    independent transforms, cross-checked against an arithmetic oracle in
    the ``l5_pixel_features`` query."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, width, height = 8, None, None
    idat = bytearray()
    while pos + 12 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG {tag!r} chunk CRC mismatch")
        if tag == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color != 2 or interlace != 0:
                raise NotImplementedError(
                    f"only 8-bit RGB non-interlaced PNG supported "
                    f"(depth={depth}, color_type={color}, interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG with no IHDR chunk")
    raw = zlib.decompress(bytes(idat))
    stride = width * _PNG_BPP
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline data length mismatch")
    out = bytearray()
    prev = bytes(stride)
    p = 0
    for _y in range(height):
        ft = raw[p]
        p += 1
        line = bytearray(raw[p : p + stride])
        p += stride
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(stride):
                if i >= _PNG_BPP:
                    line[i] = (line[i] + line[i - _PNG_BPP]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = line[i - _PNG_BPP] if i >= _PNG_BPP else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                left = line[i - _PNG_BPP] if i >= _PNG_BPP else 0
                ul = prev[i - _PNG_BPP] if i >= _PNG_BPP else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out += line
        prev = bytes(line)
    return width, height, bytes(out)


# ---------------------------------------------------------------------------
# GIF pixel codec: real LZW (string table, growing code widths, clear-code
# reset) in pure Python. Encoder and decoder are independent implementations
# of the two sides of the algorithm — the encoder builds its table keyed by
# byte strings, the decoder rebuilds its table positionally from the code
# stream — cross-checked by the arithmetic oracle in ``l5_gif_pixel_features``
# and a round-trip property test.

_GIF_MAX_CODE_WIDTH = 12


def _lzw_encode(data: bytes, mcs: int) -> bytes:
    """GIF-flavor LZW: LSB-first bit packing, initial width mcs+1, width
    grows when the next table code would not fit, clear-code reset when the
    table reaches 4096 entries."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = n_bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << mcs)}
    next_code, width = end + 1, mcs + 1
    emit(clear, width)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) - 1 and width < _GIF_MAX_CODE_WIDTH:
            width += 1
        elif next_code == (1 << _GIF_MAX_CODE_WIDTH):
            emit(clear, width)
            table = {bytes([i]): i for i in range(1 << mcs)}
            next_code, width = end + 1, mcs + 1
        w = wk[-1:]
    if w:
        emit(table[w], width)
    # Decoder symmetry at stream end: the decoder bumps its code width
    # EARLY (when its table reaches 2^width - 1, anticipating the add that
    # normally precedes the next code). No add precedes END, so when the
    # table lands exactly on that boundary the encoder must emit END at
    # the width the decoder will already be reading with (found by the
    # hypothesis round-trip property at a 6-symbol boundary input).
    if next_code == (1 << width) - 1 and width < _GIF_MAX_CODE_WIDTH:
        width += 1
    emit(end, width)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int) -> bytes:
    """Inverse of ``_lzw_encode``, built positionally from the code stream
    (including the KwKwK just-added-code case)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    pos = acc = n_bits = 0
    width = mcs + 1
    base = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]  # clear, end slots
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    while True:
        while n_bits < width:
            if pos >= len(data):
                raise ValueError("LZW stream ended without an end-of-information code")
            acc |= data[pos] << n_bits
            pos += 1
            n_bits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_bits -= width
        if code == clear:
            table = list(base)
            width, prev = mcs + 1, None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError(f"LZW first code {code} outside initial table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK: the code being defined right now
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table size {len(table)}")
        out += entry
        prev = entry
        if len(table) == (1 << width) - 1 and width < _GIF_MAX_CODE_WIDTH:
            width += 1


def encode_gif(
    width: int, height: int, indices: bytes, palette: list[tuple[int, int, int]]
) -> bytes:
    """Full single-frame GIF89a writer: logical screen descriptor, global
    color table (padded to a power of two), image descriptor, real
    LZW-compressed index stream in 255-byte sub-blocks."""
    if len(indices) != width * height:
        raise ValueError(f"need {width * height} indices, got {len(indices)}")
    if not 1 <= len(palette) <= 256:
        raise ValueError(f"palette must have 1..256 colors, got {len(palette)}")
    if max(indices, default=0) >= len(palette):
        raise ValueError("pixel index outside palette")
    bits = max(1, (len(palette) - 1).bit_length())
    entries = 1 << bits
    gct = bytearray()
    for r, g, b in palette:
        gct += bytes((r & 0xFF, g & 0xFF, b & 0xFF))
    gct += b"\x00" * (3 * (entries - len(palette)))
    flags = 0x80 | ((bits - 1) & 7)  # GCT present, size = 2^(bits)
    out = bytearray(b"GIF89a" + struct.pack("<HH", width, height))
    out += bytes((flags, 0, 0)) + gct
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    mcs = max(2, bits)
    out.append(mcs)
    comp = _lzw_encode(indices, mcs)
    for i in range(0, len(comp), 255):
        block = comp[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif_pixels(payload: bytes) -> tuple[int, int, bytes]:
    """Full, real GIF pixel decode in pure Python: logical screen
    descriptor, global color table, extension-block skipping, image
    descriptor, LZW decode, palette mapping. Supports single-frame
    non-interlaced images with a global color table — the declared scope;
    local color tables and interlacing raise ``NotImplementedError``.
    Returns ``(width, height, rgb)`` row-major RGBRGB..."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF logical screen descriptor")
    sw, sh = struct.unpack("<HH", payload[6:10])
    flags = payload[10]
    pos = 13
    palette: bytes | None = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        palette = payload[pos : pos + 3 * n]
        if len(palette) < 3 * n:
            raise ValueError("truncated GIF global color table")
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image data")
        if block == 0x21:  # extension: label byte + sub-blocks
            pos += 1
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, iw, ih = struct.unpack("<HHHH", payload[pos : pos + 8])
        iflags = payload[pos + 8]
        pos += 9
        if iflags & 0x80:
            raise NotImplementedError("GIF local color tables not supported")
        if iflags & 0x40:
            raise NotImplementedError("interlaced GIF not supported")
        if palette is None:
            raise NotImplementedError("GIF without a global color table")
        if (left, top, iw, ih) != (0, 0, sw, sh):
            raise NotImplementedError("GIF sub-rectangle frames not supported")
        mcs = payload[pos]
        pos += 1
        comp = bytearray()
        while pos < len(payload) and payload[pos]:
            size = payload[pos]
            comp += payload[pos + 1 : pos + 1 + size]
            pos += 1 + size
        indices = _lzw_decode(bytes(comp), mcs)
        if len(indices) != iw * ih:
            raise ValueError(
                f"GIF decoded {len(indices)} pixels, expected {iw * ih}"
            )
        n_colors = len(palette) // 3
        if max(indices, default=0) >= n_colors:
            raise ValueError("GIF pixel index outside global color table")
        rgb = bytearray()
        for idx in indices:
            rgb += palette[3 * idx : 3 * idx + 3]
        return iw, ih, bytes(rgb)
    raise ValueError("GIF stream ended without image data")


MEDIA_DIMS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_format", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def media_dimensions(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Header-decode every payload to (format, width, height) via
    mapInPandas — the real decode dataflow: Arrow batches in, the payload
    projected away in the same stage, only scalar metadata shuffled on."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_media(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media_format": [d["format"] for d in decoded],
                    "width": pd.Series([d["width"] for d in decoded], dtype="int64"),
                    "height": pd.Series([d["height"] for d in decoded], dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_decode, MEDIA_DIMS_SCHEMA)


_VID_MAGIC = b"VID0"
VID_FRAME_LEN = 64
VID_MAX_FRAMES = 16


def encode_video(frame_bytes: list[int], frame_len: int = VID_FRAME_LEN) -> bytes:
    """Deterministic fake video container (real codecs are absent from
    this environment — the brief's sanctioned stand-in): magic, frame
    count, frame length, then each frame as one byte value repeated
    ``frame_len`` times. The *container walk* (header parse, per-frame
    offset arithmetic) is the real logic under test."""
    out = _VID_MAGIC + struct.pack(">HH", len(frame_bytes), frame_len)
    for b in frame_bytes:
        out += bytes([b]) * frame_len
    return out


def decode_video_frames(payload: bytes) -> list[bytes]:
    """Walk the container and return raw frame payloads."""
    if payload[:4] != _VID_MAGIC:
        raise ValueError("not a VID0 container")
    n_frames, frame_len = struct.unpack(">HH", payload[4:8])
    return [
        payload[8 + i * frame_len : 8 + (i + 1) * frame_len]
        for i in range(n_frames)
    ]


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_checksum", T.LongType()),  # sum(bytes) % 997
    ]
)


def frame_sample(
    df: DataFrame,
    every_n: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Sample every ``every_n``-th frame of each video payload and emit a
    per-frame feature row (checksum stands in for the absent pixel
    featurizer). One mapInPandas stage: payloads stay inside the Arrow
    batch, only (id, idx, checksum) scalars come out — at 100 TB the video
    bytes never ride a shuffle."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                for i, frame in enumerate(decode_video_frames(payload)):
                    if i % every_n == 0:
                        ids.append(doc_id)
                        idxs.append(i)
                        sums.append(sum(frame) % 997)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_checksum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_sample, FRAME_SAMPLE_SCHEMA)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real raster resize for PNG, GIF, and baseline-JPEG payloads:
    decode pixels (pure-Python inflate+unfilter / LZW / Huffman+IDCT),
    nearest-neighbor sample to the target grid, re-encode — PNG as PNG,
    GIF resamples the index plane (palette preserved exactly), JPEG
    re-encodes lossless as PNG (no double quantization). Unrecognized
    bytes raise ``ValueError``."""
    if width < 1 or height < 1:
        raise ValueError(f"target dims must be positive, got {width}x{height}")
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        src_w, src_h, _rgb = decode_gif_pixels(payload)
        # resample the index plane: re-decode to indices via the palette
        flags = payload[10]
        n = 2 << (flags & 7)
        palette_raw = payload[13 : 13 + 3 * n]
        palette = [
            tuple(palette_raw[3 * j : 3 * j + 3]) for j in range(n)
        ]
        rev = {c: j for j, c in reversed(list(enumerate(palette)))}
        src_idx = bytes(
            rev[tuple(_rgb[3 * p : 3 * p + 3])] for p in range(src_w * src_h)
        )
        out_idx = bytearray()
        for y in range(height):
            sy = y * src_h // height
            for x in range(width):
                sx = x * src_w // width
                out_idx.append(src_idx[sy * src_w + sx])
        return encode_gif(width, height, bytes(out_idx), palette)
    if payload[:2] == b"\xff\xd8":
        # decode via the baseline JPEG codec; re-encode LOSSLESS as PNG
        # (a resize re-encode through a forward DCT would quantize twice —
        # switching to a lossless container at transform time is standard
        # pipeline behavior)
        from .jpeg import decode_jpeg_pixels

        src_w, src_h, rgb = decode_jpeg_pixels(payload)
        out = bytearray()
        for y in range(height):
            sy = y * src_h // height
            row = sy * src_w * _PNG_BPP
            for x in range(width):
                sx = x * src_w // width
                i = row + sx * _PNG_BPP
                out += rgb[i : i + _PNG_BPP]
        return encode_png(width, height, bytes(out))
    if payload[:8] != _PNG_SIG:
        raise ValueError("resize_image: payload is not a recognized image")
    src_w, src_h, rgb = decode_png_pixels(payload)
    out = bytearray()
    for y in range(height):
        sy = y * src_h // height
        row = sy * src_w * _PNG_BPP
        for x in range(width):
            sx = x * src_w // width
            i = row + sx * _PNG_BPP
            out += rgb[i : i + _PNG_BPP]
    return encode_png(width, height, bytes(out))


def synthesize_video(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic video fixture: one frame per character of the text
    (capped at VID_MAX_FRAMES), frame i filled with that character's byte —
    so the oracle can predict every sampled frame checksum arithmetically
    from the source column."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # ord % 256 keeps non-ASCII characters inside a byte; the
            # oracle mirrors with ascii(c) % 256
            payloads = [
                encode_video([ord(c) % 256 for c in text[:VID_MAX_FRAMES]])
                for text in pdf[text_col]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(_synth, schema)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic media fixture: per document, build a real PNG / JPEG /
    GIF header (format = id % 3) whose dimensions derive from the text
    (width = n_chars % 640 + 16, height = n_tokens % 480 + 16). Encoder
    (struct.pack writers above) and decoder (marker parsers) are
    independent code paths, and the oracle recomputes the dimensions
    arithmetically from the text — a wrong endianness or offset on either
    side fails the round-trip."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        encoders = [encode_png_header, encode_jpeg_header, encode_gif_header]
        for pdf in batches:
            widths = pdf[text_col].str.len() % 640 + 16
            heights = pdf[text_col].str.split(" ").map(len) % 480 + 16
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": [
                        encoders[i % 3](w, h)
                        for i, w, h in zip(pdf[id_col], widths, heights)
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(_synth, schema)


def synthesize_png(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic full-PNG fixture: per document a real compressed PNG
    (width = n_chars % 16 + 4, height = doc_id % 12 + 4) whose pixel
    (x, y) channel c equals ``(doc_id*7 + x*3 + y*5 + c*11) % 256`` — a
    closed-form the SQL oracle recomputes without touching bytes. The
    payload goes through deflate + per-row filters, so nothing about the
    pixel values survives in plaintext: only a correct full decode
    (inflate, CRC, unfilter) can reproduce the oracle's numbers."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                w = len(text) % 16 + 4
                h = int(doc_id) % 12 + 4
                rgb = bytes(
                    (int(doc_id) * 7 + x * 3 + y * 5 + c * 11) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(_PNG_BPP)
                )
                payloads.append(encode_png(w, h, rgb))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(_synth, schema)


def decode_image_pixels(payload: bytes) -> tuple[int, int, bytes]:
    """Format-dispatching full pixel decode: PNG (inflate + unfilter),
    GIF (LZW + palette), baseline JPEG (Huffman + dequant + IDCT,
    operators/jpeg.py). Lets one featurization stage run over a
    mixed-format corpus."""
    if payload[:8] == _PNG_SIG:
        return decode_png_pixels(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_pixels(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg_pixels

        return decode_jpeg_pixels(payload)
    raise ValueError("unrecognized image payload")


_GIF_FIX_COLORS = 8  # synthesize_gif palette size (3-bit indices)


def synthesize_gif(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic full-GIF fixture: per document a real LZW-compressed
    GIF89a (width = n_chars % 16 + 4, height = doc_id % 12 + 4) over an
    8-color palette where ``palette[j] = ((j*37)%256, (j*37+85)%256,
    (j*37+170)%256)`` and ``index(x, y) = (doc_id + 2x + 3y) % 8`` — a
    closed form the SQL oracle recomputes without touching bytes. The
    index plane goes through the real LZW encoder (string table, growing
    code widths), so only a correct LZW decode + palette mapping can
    reproduce the oracle's numbers."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        palette = [
            ((j * 37) % 256, (j * 37 + 85) % 256, (j * 37 + 170) % 256)
            for j in range(_GIF_FIX_COLORS)
        ]
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                d = int(doc_id)
                w = len(text) % 16 + 4
                h = d % 12 + 4
                idx = bytes(
                    (d + 2 * x + 3 * y) % _GIF_FIX_COLORS
                    for y in range(h)
                    for x in range(w)
                )
                payloads.append(encode_gif(w, h, idx, palette))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(_synth, schema)


def synthesize_jpeg(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic full-JPEG fixture: per document a real baseline JFIF
    (width = 8*(n_chars % 3 + 1), height = 8*(doc_id % 2 + 1)) whose 8x8
    block (bx, by) has flat luma ``(doc_id*5 + bx*11 + by*17) % 200 + 28``
    with neutral chroma — a closed form the SQL oracle recomputes without
    touching bytes. The payload goes through real Huffman entropy coding
    (DC delta categories + EOBs), so only a correct marker walk + Huffman
    decode + dequant + IDCT can reproduce the oracle's numbers
    (operators/jpeg.py docstring: flat blocks make the IDCT integer-
    exact while the entropy layer stays spec-true)."""
    from .jpeg import encode_flat_jpeg

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                d = int(doc_id)
                bw = len(text) % 3 + 1
                bh = d % 2 + 1
                blocks = [
                    [(d * 5 + bx * 11 + by * 17) % 200 + 28 for bx in range(bw)]
                    for by in range(bh)
                ]
                payloads.append(encode_flat_jpeg(bw * 8, bh * 8, blocks))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(_synth, schema)


PIXEL_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)


def pixel_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Real pixel featurization over PNG/GIF/baseline-JPEG payloads
    (``decode_image_pixels`` dispatches on the magic): full decode inside
    mapInPandas (Arrow batches; payloads never leave the stage), then
    integer per-channel sums — exact in any engine, so the arithmetic
    oracle hash-checks the entire codec path. At 100 TB this is the
    standard multimodal shape: decode+featurize map-side, shuffle only the
    tiny scalar features."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "width", "height", "n_pixels",
                                    "sum_r", "sum_g", "sum_b")}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                w, h, rgb = decode_image_pixels(bytes(payload))
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(w * h)
                rows["sum_r"].append(sum(rgb[0::3]))
                rows["sum_g"].append(sum(rgb[1::3]))
                rows["sum_b"].append(sum(rgb[2::3]))
            yield pd.DataFrame({k: pd.Series(v, dtype="int64") for k, v in rows.items()})

    return df.select(id_col, "payload").mapInPandas(_feat, PIXEL_FEATURE_SCHEMA)


def ahash_bits(df: DataFrame, id_col: str = "doc_id", grid: int = 4) -> DataFrame:
    """Perceptual average-hash over DECODED pixels — the image twin of the
    text near-dup signatures (simhash/minhash): full codec decode
    (``decode_image_pixels``) inside mapInPandas, integer per-pixel
    intensity (r+g+b, no division), block-downsample to a ``grid × grid``
    cell mean, and one bit per cell: is the cell's mean intensity at or
    above the image mean. Resolution-invariant by construction (the cell
    mapping is ``floor(coord * grid / dim)``), so re-encoded or resized
    variants of the same picture bucket together.

    Everything is exact BIGINT cross-multiplication —
    ``cell_sum * n_total >= total_sum * n_cell`` avoids any division —
    so an arithmetic SQL oracle over closed-form fixture pixels verifies
    the ENTIRE decode+hash path bit for bit. Returns ``(id, ahash_bits)``
    with the hash as a row-major '0'/'1' string (scalar declared output
    per the repo invariant). Images narrower than the grid in either
    dimension leave some cells empty — those hash as '0' (the hash is
    always ``grid²`` chars); the declared fixture corpus guarantees
    ``w, h >= grid`` so the oracle never meets this branch.

    Scale: decode + hash are map-side (payloads never shuffle); grouping
    by the hash string is the dedup bucket join — same hot-bucket
    discipline as simhash applies downstream."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                w, h, rgb = decode_image_pixels(bytes(payload))
                arr = np.frombuffer(rgb, dtype=np.uint8).astype(np.int64)
                inten = arr.reshape(h, w, 3).sum(axis=2)
                cx = (np.arange(w) * grid) // w
                cy = (np.arange(h) * grid) // h
                cell_sum = np.zeros((grid, grid), dtype=np.int64)
                cell_cnt = np.zeros((grid, grid), dtype=np.int64)
                np.add.at(cell_sum, (cy[:, None], cx[None, :]), inten)
                np.add.at(
                    cell_cnt,
                    (cy[:, None], cx[None, :]),
                    np.ones((h, w), dtype=np.int64),
                )
                # empty cells (possible only when width or height < grid)
                # hash as '0': without the cnt>0 guard, 0*total >= total*0
                # would force '1' bits that over-collide structurally
                # different tiny images
                bits = (cell_cnt > 0) & (
                    cell_sum * (w * h) >= int(inten.sum()) * cell_cnt
                )
                ids.append(int(doc_id))
                hashes.append("".join("1" if b else "0" for b in bits.ravel()))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "ahash_bits": pd.Series(hashes, dtype="object")}
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ahash_bits", T.StringType()),
        ]
    )
    return df.select(id_col, "payload").mapInPandas(_hash, schema)


def byte_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic byte-level feature extraction over the binary payload
    via mapInPandas (Arrow batches; pandas vectorized inside). Stands in
    for decode+featurize; identical dataflow shape."""

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": payloads.map(len).astype("int64"),
                    "checksum": payloads.map(lambda b: sum(b) % 997).astype("int64"),
                    "first_byte": payloads.map(lambda b: b[0] if b else -1).astype("int64"),
                    "last_byte": payloads.map(lambda b: b[-1] if b else -1).astype("int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(_featurize, FEATURE_SCHEMA)


SCENE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_mean", T.LongType()),  # mean byte (uniform frames)
    ]
)


def frame_means(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Per-frame brightness series for scene-cut detection: one
    mapInPandas walk emits (id, idx, mean byte) scalars — the temporal
    logic (lag, threshold, aggregation) then runs as JVM window/agg ops
    on the scalar series, NOT in Python. Same no-payload-shuffle shape as
    frame_sample."""

    def _means(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, means = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                for i, frame in enumerate(decode_video_frames(payload)):
                    ids.append(doc_id)
                    idxs.append(i)
                    means.append(sum(frame) // max(len(frame), 1))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_mean": means}
            )

    return df.select(id_col, payload_col).mapInPandas(_means, SCENE_STATS_SCHEMA)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Batch raster resize: one mapInPandas stage applies
    :func:`resize_image` (decode → nearest-neighbor sample → re-encode)
    to every payload. Same no-shuffle discipline as the other media ops:
    bytes in, bytes out, all within the map stage — at 100 TB the
    thumbnail pass is embarrassingly parallel and the full-size payload
    never leaves the stage that read it."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    payload_col: [
                        resize_image(p, width, height) for p in pdf[payload_col]
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(payload_col, T.BinaryType()),
        ]
    )
    return df.select(id_col, payload_col).mapInPandas(_resize, schema)
