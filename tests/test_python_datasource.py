"""Gates for the Python DataSource surface (sources/pyds.py): source-side
partition pruning under pushed filters, closed-form feed fidelity, and the
writer commit/abort contract."""

from __future__ import annotations

import os

from pyspark.sql import Row

from weather_etl_docker_airflow_project_spark.io import scratch_dir
from weather_etl_docker_airflow_project_spark.sources import pyds


def _feed(spark, **opts):
    pyds.register(spark)
    r = spark.read.format("weather_feed")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_feed_matches_closed_form(spark):
    got = {tuple(r) for r in _feed(spark, stations=3, obs_per_station=10).collect()}
    want = {pyds.feed_row(s, q) for s in range(3) for q in range(10)}
    assert got == want


def test_pushed_station_filter_prunes_partitions(spark):
    df = _feed(spark, stations=8, obs_per_station=5)
    # unfiltered: one partition per station
    assert df.rdd.getNumPartitions() == 8
    # pushed equality: planning-time pruning to a single partition
    one = df.filter("station_id = 3")
    assert one.rdd.getNumPartitions() == 1
    assert one.count() == 5
    # pushed range: two partitions survive
    rng = df.filter("station_id >= 6")
    assert rng.rdd.getNumPartitions() == 2
    assert {r["station_id"] for r in rng.collect()} == {6, 7}


def test_unpushable_filter_stays_spark_side_and_correct(spark):
    df = _feed(spark, stations=2, obs_per_station=50)
    got = df.filter("humidity_pct >= 50 AND station_id = 1").count()
    want = sum(
        1 for q in range(50) if pyds.feed_row(1, q)[3] >= 50
    )
    assert got == want


def test_sink_commit_publishes_only_committed_files(spark):
    pyds.register(spark)
    dst = scratch_dir("pysink-test")
    df = spark.createDataFrame(
        [(i, "A" if i % 2 else "B") for i in range(100)], "k long, tag string"
    ).repartition(4)
    df.write.format("scratch_jsonl").option("path", dst).mode("append").save()
    files = pyds.manifest_files(dst)
    assert len(files) == 4  # one committed file per task
    back = spark.read.schema("k long, tag string").json(files)
    assert back.count() == 100
    assert {r["k"] for r in back.collect()} == set(range(100))
    # an orphan file in the dir is NOT visible through the manifest
    orphan = os.path.join(dst, "part-orphan.jsonl")
    with open(orphan, "w") as fh:
        fh.write('{"k": 999, "tag": "X"}\n')
    assert orphan not in pyds.manifest_files(dst)


def test_writer_abort_removes_partials(tmp_path):
    w = pyds.ScratchJsonWriter({"path": str(tmp_path)})
    msg = w.write(iter([Row(k=1, tag="A"), Row(k=2, tag="B")]))
    assert os.path.exists(msg.path) and msg.rows == 2
    w.abort([msg, None])  # failed tasks may report None
    assert not os.path.exists(msg.path)


def test_stream_reader_offset_protocol_and_replay():
    r = pyds.FeedStreamReader({"stations": 2, "obs_per_station": 10, "chunk": 7})
    off = r.initialOffset()
    seen, offsets = [], [off]
    while True:
        rows, nxt = r.read(off)
        rows = list(rows)
        if not rows:
            assert nxt == off  # caught up: offset must not advance
            break
        seen.extend(rows)
        offsets.append(nxt)
        off = nxt
    assert len(seen) == 20 and len(set(seen)) == 20
    # crash-replay: regenerating any committed range is byte-identical
    for a, b in zip(offsets, offsets[1:]):
        replay = list(r.readBetweenOffsets(a, b))
        assert replay == seen[a["i"]: b["i"]]


def test_stream_source_available_now_drains_all(spark):
    pyds.register(spark)
    got = (
        spark.readStream.format("weather_feed_stream")
        .option("stations", "2").option("obs_per_station", "30")
        .load()
    )
    from weather_etl_docker_airflow_project_spark.streaming.windows import run_available_now

    out = run_available_now(got.groupBy().count(), output_mode="complete")
    assert out.collect()[0]["count"] == 60


def test_pushed_filter_pruning_everything_yields_empty(spark):
    df = _feed(spark, stations=4, obs_per_station=5)
    # contradictory / out-of-range pushed predicates prune ALL partitions;
    # must return zero rows, not crash on the [None] sentinel
    assert df.filter("station_id > 10").count() == 0
    assert df.filter("station_id = 99").count() == 0
    assert df.filter("station_id > 2 AND station_id < 2").count() == 0
