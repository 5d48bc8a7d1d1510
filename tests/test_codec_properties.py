"""Property-based round-trip tests for the pure-Python media codecs
(PNG / GIF-LZW / WAV / baseline JPEG) — random inputs catch the carry,
boundary, and table-reset edges that fixed fixtures miss. All local
(no Spark session): the Spark dataflow around these codecs is covered in
test_llm_ops.py."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from weather_etl_docker_airflow_project_spark.operators import jpeg, multimodal


@settings(max_examples=40, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=4000).map(
        lambda b: bytes(x % 8 for x in b)
    ),
    mcs=st.integers(min_value=3, max_value=8),
)
def test_lzw_roundtrip_property(data: bytes, mcs: int) -> None:
    assert multimodal._lzw_decode(multimodal._lzw_encode(data, mcs), mcs) == data


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=23),
    h=st.integers(min_value=1, max_value=17),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_gif_roundtrip_property(w: int, h: int, seed: int) -> None:
    palette = [((j * 37) % 256, (j * 37 + 85) % 256, (j * 37 + 170) % 256)
               for j in range(8)]
    idx = bytes((seed + 3 * i) % 8 for i in range(w * h))
    gw, gh, rgb = multimodal.decode_gif_pixels(
        multimodal.encode_gif(w, h, idx, palette)
    )
    assert (gw, gh) == (w, h)
    assert rgb == b"".join(bytes(palette[i]) for i in idx)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_png_roundtrip_property(w: int, h: int, seed: int) -> None:
    rgb = bytes((seed + 7 * i) % 256 for i in range(w * h * 3))
    gw, gh, got = multimodal.decode_png_pixels(multimodal.encode_png(w, h, rgb))
    assert (gw, gh, got) == (w, h, rgb)


@settings(max_examples=40, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-(2**15), max_value=2**15 - 1),
        min_size=0,
        max_size=300,
    ),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_property(samples: list[int], rate: int) -> None:
    from weather_etl_docker_airflow_project_spark.operators import audio

    got_rate, got = audio.decode_wav(audio.encode_wav(samples, rate))
    assert got_rate == rate
    assert got == samples


@settings(max_examples=25, deadline=None)
@given(
    bw=st.integers(min_value=1, max_value=4),
    bh=st.integers(min_value=1, max_value=3),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_jpeg_flat_roundtrip_property(bw: int, bh: int, seed: int) -> None:
    blocks = [[(seed + 11 * bx + 17 * by) % 200 + 28 for bx in range(bw)]
              for by in range(bh)]
    w, h, rgb = jpeg.decode_jpeg_pixels(
        jpeg.encode_flat_jpeg(bw * 8, bh * 8, blocks)
    )
    assert (w, h) == (bw * 8, bh * 8)
    for by in range(bh):
        for bx in range(bw):
            v = blocks[by][bx]
            p = ((by * 8) * w + bx * 8) * 3
            assert rgb[p:p + 3] == bytes((v, v, v))
