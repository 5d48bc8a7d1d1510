"""Boundary-pinning tests for the stream-stream outer-join emission rules
that t11/t12's oracles hard-code.

The declared oracles encode Spark's watermark-eviction behavior
(empirically validated): with a 1h join window and 1h watermark delay on
both sides, wm_base = min(max click ts, max error ts), an unmatched click
emits iff c_ts + 2h < wm_base and an unmatched error (full outer only)
emits iff e_ts + 1h < wm_base — both STRICT. That couples the oracles to
a version-specific internal rule (no-data micro-batches, strict
inequality at the boundary), so this fixture places rows EXACTLY on both
boundaries: if a Spark upgrade shifts the semantics, these asserts fail
loudly with a named rule instead of an opaque driver hash mismatch."""

from __future__ import annotations

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.streaming import windows


def _ts(minutes: int) -> str:
    t0 = datetime.datetime(2024, 1, 1)
    return (t0 + datetime.timedelta(minutes=minutes)).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


# anchors pin max_c = max_e = t+600min -> wm_base = 600
_ROWS = [
    dict(event_id=900, ts=_ts(600), user_id=99, event_type="click"),
    dict(event_id=901, ts=_ts(600), user_id=98, event_type="error"),
    # click exactly AT the boundary: c_ts + 120min == wm_base
    dict(event_id=1, ts=_ts(480), user_id=1, event_type="click"),
    # click one minute inside: c_ts + 120min < wm_base
    dict(event_id=2, ts=_ts(479), user_id=2, event_type="click"),
    # error exactly AT the boundary: e_ts + 60min == wm_base
    dict(event_id=3, ts=_ts(540), user_id=3, event_type="error"),
    # error one minute inside: e_ts + 60min < wm_base
    dict(event_id=4, ts=_ts(539), user_id=4, event_type="error"),
    # matched pair (both within the 1h window)
    dict(event_id=5, ts=_ts(100), user_id=5, event_type="click"),
    dict(event_id=6, ts=_ts(130), user_id=5, event_type="error"),
]


def _outer_join(spark, landing: str, join_type: str):
    stream = (
        spark.readStream.schema(
            "event_id long, ts string, user_id long, event_type string"
        )
        .json(landing)
        .withColumn("ts", F.to_timestamp("ts", "yyyy-MM-dd HH:mm:ss"))
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    errors = (
        stream.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", "1 hour")
    )
    joined = clicks.join(
        errors,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("c_ts"))
        & (F.col("e_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        join_type,
    )
    return windows.run_available_now(joined).collect()


@pytest.fixture(scope="module")
def landing(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("outer_boundary"))
    with open(os.path.join(d, "events.json"), "w", encoding="utf-8") as f:
        for r in _ROWS:
            f.write(json.dumps(r) + "\n")
    return d


def test_left_outer_click_boundary_is_strict(spark, landing):
    out = _outer_join(spark, landing, "left_outer")
    unmatched = {r["click_id"] for r in out if r["error_id"] is None}
    matched = {(r["click_id"], r["error_id"]) for r in out if r["error_id"]}
    assert matched == {(5, 6)}
    # STRICT boundary: click 1 sits exactly at c_ts + 2h == wm_base and
    # must NOT emit; click 2 (one minute inside) must. If a Spark upgrade
    # makes the rule inclusive, click 1 appears here and t11's oracle
    # needs `<=` — fix BOTH together.
    assert unmatched == {2}, (
        "left-outer unmatched-click emission rule changed: expected only "
        f"click 2 (strictly inside), got {unmatched}"
    )


def test_full_outer_both_boundaries_are_strict(spark, landing):
    out = _outer_join(spark, landing, "full_outer")
    un_clicks = {
        r["click_id"] for r in out
        if r["error_id"] is None and r["click_id"] is not None
    }
    un_errors = {
        r["error_id"] for r in out
        if r["click_id"] is None and r["error_id"] is not None
    }
    matched = {
        (r["click_id"], r["error_id"]) for r in out
        if r["click_id"] and r["error_id"]
    }
    assert matched == {(5, 6)}
    assert un_clicks == {2}, (
        "full-outer unmatched-click rule changed (strict c_ts + 2h < "
        f"wm_base expected): {un_clicks}"
    )
    # STRICT error boundary: error 3 sits exactly at e_ts + 1h == wm_base
    # and must NOT emit; error 4 must. On failure fix t12's oracle too.
    assert un_errors == {4}, (
        "full-outer unmatched-error rule changed (strict e_ts + 1h < "
        f"wm_base expected): {un_errors}"
    )
