"""Property-based tests (SURVEY.md §5.3): upsert idempotence, dedup-key
uniqueness, and timestamp round-trip over hypothesis-generated inputs.

Spark actions are expensive, so properties run BATCHED: hypothesis
generates whole record lists, one Spark job verifies the property for the
entire list (max_examples kept small, deadline disabled)."""

from __future__ import annotations

from datetime import datetime, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from weather_etl_docker_airflow_project_spark.functions.weather import transform_weather
from weather_etl_docker_airflow_project_spark.operators.upsert import dedup_new_rows
from weather_etl_docker_airflow_project_spark.sources.rest import records_to_df

CITIES = ["Tunis", "Sfax", "Mumbai", "Lima", "Oslo"]

records = st.lists(
    st.fixed_dictionaries(
        {
            "name": st.sampled_from(CITIES),
            "dt": st.integers(min_value=0, max_value=2_000_000_000),
            "timezone": st.integers(min_value=-50400, max_value=50400),
            "main": st.fixed_dictionaries(
                {
                    "temp": st.floats(-90, 60, allow_nan=False, width=32),
                    "humidity": st.integers(0, 100),
                    "pressure": st.integers(850, 1100),
                }
            ),
            "weather": st.lists(
                st.fixed_dictionaries(
                    {"description": st.sampled_from(["clear", "rain", "mist"]),
                     "main": st.just("X")}
                ),
                min_size=1,
                max_size=2,
            ),
            "wind": st.fixed_dictionaries(
                {"speed": st.floats(0, 120, allow_nan=False, width=32)}
            ),
        }
    ),
    min_size=1,
    max_size=8,
)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(recs=records)
@SLOW
def test_transform_total_and_key_complete(spark, recs):
    """transform never drops rows, and every output row has a complete
    (city, utc) dedup key."""
    flat = transform_weather(records_to_df(spark, recs)).collect()
    assert len(flat) == len(recs)
    assert all(r["city"] is not None and r["utc"] is not None for r in flat)


@given(recs=records)
@SLOW
def test_dedup_against_self_is_empty(spark, recs):
    """load . load == load: a batch anti-joined against its own key set
    yields nothing (the idempotence that makes redelivery safe)."""
    flat = transform_weather(records_to_df(spark, recs))
    again = dedup_new_rows(flat, flat.select("city", "utc"), ["city", "utc"])
    assert again.count() == 0


@given(recs=records)
@SLOW
def test_dedup_key_unique_after_batch_dedup(spark, recs):
    """dedup_new_rows against an empty sink never emits two rows with the
    same (city, utc) — intra-batch duplicates collapse."""
    flat = transform_weather(records_to_df(spark, recs))
    empty = flat.select("city", "utc").limit(0)
    out = dedup_new_rows(flat, empty, ["city", "utc"])
    assert out.count() == out.select("city", "utc").distinct().count()


@given(
    dims=st.lists(
        st.tuples(st.integers(1, 65535), st.integers(1, 65535)),
        min_size=1,
        max_size=32,
    )
)
@settings(max_examples=30, deadline=None)
def test_media_header_codec_roundtrip_property(dims):
    """Pure-Python property (no Spark job): every (width, height) survives
    the encode->decode round trip for all three containers — catches
    endianness, offset, and segment-walk bugs across the whole dimension
    range, including the 2-byte JPEG/GIF boundary values."""
    from weather_etl_docker_airflow_project_spark.operators import multimodal

    for w, h in dims:
        for enc, fmt in [
            (multimodal.encode_png_header, "image/png"),
            (multimodal.encode_jpeg_header, "image/jpeg"),
            (multimodal.encode_gif_header, "image/gif"),
        ]:
            assert multimodal.decode_media(enc(w, h)) == {
                "format": fmt,
                "width": w,
                "height": h,
            }


@given(
    frames=st.lists(st.integers(0, 255), min_size=0, max_size=40),
    stride=st.integers(1, 8),
)
@settings(max_examples=30, deadline=None)
def test_frame_sample_stride_property(frames, stride):
    """Container walk + stride arithmetic: sampling every n-th frame of an
    encoded video yields exactly the frames at indices 0, n, 2n, ..."""
    from weather_etl_docker_airflow_project_spark.operators import multimodal

    payload = multimodal.encode_video(frames)
    decoded = multimodal.decode_video_frames(payload)
    assert len(decoded) == len(frames)
    sampled = [f for i, f in enumerate(decoded) if i % stride == 0]
    assert all(
        f == bytes([b]) * multimodal.VID_FRAME_LEN
        for f, b in zip(sampled, frames[::stride])
    )


@given(dts=st.lists(st.integers(0, 2_000_000_000), min_size=1, max_size=16))
@SLOW
def test_timestamp_roundtrip(spark, dts):
    """The stored 'yyyy-MM-dd HH:mm:ss' string renders the exact UTC
    instant: parsing it back yields the original epoch (F1/F3 inverse,
    weather_etl.py:119,130)."""
    recs = [
        {"name": "X", "dt": d, "timezone": 0,
         "main": {"temp": 1.0, "humidity": 1, "pressure": 1000},
         "weather": [{"description": "clear", "main": "C"}],
         "wind": {"speed": 1.0}}
        for d in set(dts)
    ]
    flat = transform_weather(records_to_df(spark, recs)).collect()
    back = {
        int(datetime.strptime(r["utc"], "%Y-%m-%d %H:%M:%S")
            .replace(tzinfo=timezone.utc).timestamp())
        for r in flat
    }
    assert back == set(dts)


@given(
    keys=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=40),
    width=st.sampled_from([1, 2, 16, 64]),
)
@SLOW
def test_countmin_never_undercounts_property(spark, keys, width):
    """CMS law on arbitrary multisets (negative keys, heavy dups, tiny
    widths that force collisions): est(k) >= true count for every key,
    with equality at collision-free widths; total cell mass per row
    equals the input size times one."""
    from collections import Counter

    from weather_etl_docker_airflow_project_spark.operators.heavyhitters import (
        countmin_estimate,
        countmin_sketch,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    exact = Counter(keys)
    sk = countmin_sketch(df, "k", depth=4, width=width)
    est = {
        r["k"]: r["n_est"]
        for r in countmin_estimate(
            sk, df.select("k").distinct(), "k", depth=4, width=width
        ).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    mass = {r["row"]: 0 for r in sk.select("row").distinct().collect()}
    for r in sk.collect():
        mass[r["row"]] += r["c"]
    assert all(m == len(keys) for m in mass.values())
