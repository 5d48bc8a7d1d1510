"""Audio columns: real WAV/PCM codec + feature extraction (SURVEY.md §2.11
L5 extension — the audio leg of the multimodal surface).

Same design as operators/multimodal.py: audio travels as an opaque
``binary`` column, all Python work is Arrow-batched ``mapInPandas``, and
the payload is projected away before anything shuffles — only tiny scalar
features leave the decode stage.

Unlike the image leg (where JPEG entropy decode genuinely needs a codec
library), WAV is fully decodable in pure Python: RIFF chunk walk +
little-endian int16 PCM. ``encode_wav`` (struct.pack writer) and
``decode_wav`` (manual chunk parser) are independent code paths, and the
synthesized fixtures use closed-form sample values the SQL oracle
recomputes arithmetically — a wrong endianness, offset, or chunk-size
calculation on either side fails the round-trip hash.

Scale notes (100 TB): audio features (RMS/energy, zero-crossing rate,
peak, duration) are per-row map work — zero Exchange in the plan; the
standard shape is decode+featurize map-side and shuffle only scalars. A
real corpus would read payloads from parquet binary columns or
``binaryFile``; both land in the same mapInPandas stage.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# codec


def encode_wav(samples: list[int], sample_rate: int) -> bytes:
    """Minimal canonical WAV writer: RIFF header, ``fmt `` chunk (PCM,
    mono, 16-bit), ``data`` chunk. Samples are clamped int16."""
    n = len(samples)
    data = struct.pack(f"<{n}h", *[max(-32768, min(32767, s)) for s in samples])
    byte_rate = sample_rate * 2  # mono * 16-bit
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Independent WAV reader: validates the RIFF/WAVE magic, walks chunks
    (skipping unknown ones, honoring the word-alignment pad byte), and
    decodes mono 16-bit PCM. Returns ``(sample_rate, samples)``.

    Raises ``ValueError`` on malformed containers or unsupported PCM
    shapes — corrupt corpus rows should fail loudly, not feature as
    garbage (same policy as multimodal.decode_media).
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos = 12
    sample_rate = None
    bits = None
    channels = None
    samples: list[int] | None = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {tag!r} chunk: {len(body)} < {size}")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            audio_fmt, channels, sample_rate, _rate, _align, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAV encoding {audio_fmt} (want PCM=1)")
        elif tag == b"data":
            if sample_rate is None:
                raise ValueError("data chunk before fmt chunk")
            if bits != 16 or channels != 1:
                raise ValueError(f"unsupported PCM shape: {bits}-bit x{channels}")
            if size % 2:
                raise ValueError("odd data chunk length for 16-bit PCM")
            samples = list(struct.unpack(f"<{size // 2}h", body))
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if samples is None:
        raise ValueError("no data chunk")
    return sample_rate, samples


# ---------------------------------------------------------------------------
# fixtures


def synthesize_audio(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic audio fixture: per document a real mono 16-bit WAV
    with ``n = len(text) % 256 + 16`` samples at
    ``rate = 8000 + (doc_id % 3) * 4000`` Hz, where
    ``sample[i] = ((doc_id*31 + i*17) % 4096) - 2048`` — a closed form the
    SQL oracle recomputes without touching bytes. The payload goes through
    the full RIFF writer, so only a correct chunk walk + PCM decode can
    reproduce the oracle's numbers."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                d = int(doc_id)
                n = len(text) % 256 + 16
                rate = 8000 + (d % 3) * 4000
                samples = [((d * 31 + i * 17) % 4096) - 2048 for i in range(n)]
                payloads.append(encode_wav(samples, rate))
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


# ---------------------------------------------------------------------------
# features

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),   # n*1000 // rate
        T.StructField("sum_abs", T.LongType()),       # integer L1 energy
        T.StructField("peak", T.LongType()),          # max |sample|
        T.StructField("zero_crossings", T.LongType()),  # strict sign flips
    ]
)


def audio_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Real audio featurization over WAV payloads: full RIFF+PCM decode
    inside mapInPandas, then integer features — L1 energy, peak amplitude,
    strict zero-crossing count (``s[i-1]*s[i] < 0``), duration. All
    integer-exact, so the arithmetic oracle hash-checks the entire codec
    path. Zero-Exchange map work at any scale."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list[int]] = {
                k: [] for k in (
                    "doc_id", "sample_rate", "n_samples", "duration_ms",
                    "sum_abs", "peak", "zero_crossings",
                )
            }
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                rate, samples = decode_wav(bytes(payload))
                n = len(samples)
                rows["doc_id"].append(int(doc_id))
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["duration_ms"].append(n * 1000 // rate)
                rows["sum_abs"].append(sum(abs(s) for s in samples))
                rows["peak"].append(max((abs(s) for s in samples), default=0))
                rows["zero_crossings"].append(
                    sum(1 for a, b in zip(samples, samples[1:]) if a * b < 0)
                )
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in rows.items()}
            )

    return df.select(id_col, "payload").mapInPandas(_feat, AUDIO_FEATURE_SCHEMA)
