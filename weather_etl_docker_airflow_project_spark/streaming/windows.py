"""Event-time streaming operators (SURVEY.md §2.9 T4-T8).

Every operator here runs as a real Structured Streaming query — file
source, event-time watermark, stateful operator, memory sink — driven to
completion with ``trigger(availableNow=True)`` so results are
deterministic and batch-comparable.

Determinism contract (validated empirically): with availableNow + append
mode, the final watermark is ``max(event_time) - delay``, and exactly the
windows/sessions whose END is <= that watermark are emitted. The DuckDB
oracles in ``plans/streaming_q.py`` mirror that emission rule with a
``HAVING end <= max(ts) - delay`` clause — the watermark semantics are
part of what the oracle checks, not noise to be worked around.

Scale notes (100 TB): state size is bounded by the watermark (Spark evicts
windows/sessions/dedup keys older than it); the shuffle is on the group
keys; ``maxFilesPerTrigger`` bounds per-batch input. These are the same
knobs a production cluster tunes — nothing below is test-only shape.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


# Kept for callers that build their own fixture streams: the normalized
# post-read schema (ts already a session timestamp).
EVENTS_SCHEMA = _events_schema(T.TimestampType())


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table.

    A streaming source needs a fixed schema, but ``events.ts`` has shipped
    as TIMESTAMP(NANOS) and as timestamp[us]/NTZ across testdata
    generations — so sniff the footer once with a batch read and build the
    matching stream schema, normalizing ``ts`` to session TIMESTAMP with
    the same conversion as io.load_table (batch oracle and stream agree to
    the microsecond)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sniffed = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema[
        "ts"
    ].dataType
    raw = (
        spark.readStream.schema(_events_schema(sniffed))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(sniffed, T.LongType):
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if isinstance(sniffed, T.TimestampNTZType):
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def run_available_now(
    stream: DataFrame,
    output_mode: str = "append",
    state_partitions: int | None = None,
) -> DataFrame:
    """Drain a streaming DataFrame to a memory sink with availableNow and
    return the result as a batch DataFrame. Checkpoint + sink name are
    throwaway uniques (each call is an independent query).

    ``state_partitions`` sizes the query's shuffle — and therefore its
    STATE-STORE instance count, pinned at first start via the checkpoint
    — to the stream's keyed-state cardinality. Every micro-batch commits
    one state-store delta per partition per stateful operator, so a
    5-key aggregation under core-count partitions pays ~cores x batches
    tiny-file commits for state that fits in one; this is a property of
    the KEY SPACE, not the cluster size (guide §2.2: fewer, larger
    partitions — the same dial a production job sets per stream). None
    keeps the session default (wide keyed state wants the session's
    scale-out width).

    Concurrency note (r16, ADVICE): ``state_partitions`` is applied by
    mutating the session conf around ``start()``. Spark clones the
    session conf synchronously inside ``start()`` (StreamExecution runs
    on a cloned session), so the conf is restored as soon as ``start()``
    returns — the mutation is no longer held across the whole drain.
    The remaining window is the set→start gap itself: two THREADS calling this
    helper concurrently on one session could still plan under each
    other's value, so concurrent callers must serialize query STARTS
    (every in-repo caller drains sequentially)."""
    name = f"msink_{uuid.uuid4().hex}"
    ckpt = os.path.join(tempfile.mkdtemp(prefix="ckpt_"), "ck")
    spark = stream.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        # restore immediately: the query's conf snapshot was taken inside
        # start(); holding the session-global mutation for the whole
        # drain (the old shape) widened the cross-thread race for nothing
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "availableNow drain did not finish within 300s — refusing to "
            "read a partially-written sink"
        )
    return spark.table(name)


def tumbling_counts(
    events: DataFrame,
    window: str = "1 day",
    delay: str = "1 hour",
) -> DataFrame:
    """T4+T5: watermarked tumbling-window counts per event_type. Append
    mode => only watermark-finalized windows are emitted."""
    return (
        events.withWatermark("ts", delay)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 day",
    slide: str = "12 hours",
    delay: str = "1 hour",
) -> DataFrame:
    """T5: sliding-window variant — every event lands in window/slide
    overlapping windows."""
    return (
        events.withWatermark("ts", delay)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "2 hours",
    delay: str = "1 hour",
) -> DataFrame:
    """T6: session windows per user (gap-based; session end = last event +
    gap). Emitted when the watermark passes the session end."""
    return (
        events.withWatermark("ts", delay)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame, keys: list[str], delay: str = "1 hour"
) -> DataFrame:
    """T7: stateful streaming dedup with watermark-bounded state (keys
    older than the watermark are evicted — the TTL that makes dedup state
    finite on an unbounded stream)."""
    return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(keys)


def land_events_json(events: DataFrame, landing_dir: str, copies: int = 2) -> None:
    """Write the same event rows as N separate JSON files (driver-side
    collect of a small subset) — a deterministic redelivery fixture for the
    cross-batch dedup path (with maxFilesPerTrigger=1 each file is its own
    micro-batch)."""
    os.makedirs(landing_dir, exist_ok=True)
    rows = events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
    ).collect()
    import json

    for c in range(copies):
        tmp = os.path.join(landing_dir, f".copy{c}.json.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            for r in rows:
                f.write(json.dumps(r.asDict()) + "\n")
        os.rename(tmp, os.path.join(landing_dir, f"copy{c}.json"))


def stateful_user_stats(events: DataFrame) -> DataFrame:
    """T8: arbitrary stateful processing via applyInPandasWithState — a
    per-user running (count, max) kept in explicit state and emitted every
    batch. Arrow-batched; state is a plain tuple."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("max_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("mx", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, mx = state.get if state.exists else (0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, mx))
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def transform_with_state_available() -> bool:
    """Feature probe: the transformWithState Python state-server protocol
    serializes state over protobuf — absent runtime, absent feature. Any
    standard Spark 4 deployment ships it (`pip install pyspark` pulls it
    in); this container deliberately doesn't, and installs are disallowed."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def transform_with_state_stats(events: DataFrame) -> DataFrame:
    """Arbitrary stateful processing on the transformWithStateInPandas
    API (Spark 4's successor to applyInPandasWithState, backed by the
    RocksDB-ready multi-state runtime): per-user running
    (count, id-checksum, max) kept in a typed ValueState and emitted each
    batch. The stats are chosen order-free (BIGINT count/sum + double max)
    so the emitted values are bit-deterministic under any partitioning.
    At scale this is the API for serving-grade streaming state: state rows
    live in the state store keyed by user, not in executor heap.

    ENV-BOUNDED (not in the driver contract): the transformWithState
    state-server protocol needs the ``protobuf`` Python package, absent
    from this container (and installs are disallowed) — the same policy
    as the MySQL JDBC execution gap. The builder probes the dependency
    (:func:`transform_with_state_available`) and fails FAST with the fix
    named, instead of letting the stream die later inside the state
    server; tests/test_transform_with_state.py asserts whichever branch
    the environment offers (real-run parity where protobuf exists, the
    loud error contract here — zero skipped tests either way). T8's
    applyInPandasWithState query covers arbitrary stateful processing in
    the driver window."""
    if not transform_with_state_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf runtime for its "
            "state-server protocol; install 'protobuf' (any standard Spark 4 "
            "deployment has it). applyInPandasWithState "
            "(stateful_user_stats, T8) covers arbitrary stateful "
            "processing without it."
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    # CALLER CONTRACT: transformWithState runs only on the RocksDB state
    # store — set `spark.sql.streaming.stateStore.providerClass` to
    # RocksDBStateStoreProvider BEFORE starting the stream (the conf is
    # read at stream start, after this builder returns, so setting it
    # here would either leak session-wide or get restored too early;
    # tests/test_transform_with_state.py shows the save/restore pattern).

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("id_checksum", T.LongType()),
            T.StructField("max_value", T.DoubleType()),
        ]
    )

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "stats", "n BIGINT, chk BIGINT, mx DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, chk, mx = (
                self._state.get() if self._state.exists() else (0, 0, float("-inf"))
            )
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    chk += int(pdf["event_id"].sum())
                    mx = max(mx, float(pdf["value"].max()))
            self._state.update((n, chk, mx))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "id_checksum": [chk],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.groupBy("user_id")
        .transformWithStateInPandas(
            UserStats(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )


def multibatch_event_agg(spark: SparkSession, sf_dir: str, user_cap: int = 100):
    """T17's builder, shared with its pytest gate so the gate exercises
    the REGISTERED construction (not a parallel copy): land the filtered
    events as 5 parquet files, then a file stream rate-limited to ONE
    file per trigger — availableNow must drain it in ~5 micro-batches of
    real cross-batch state accumulation. Returns the streaming aggregate
    (caller drains it: the query via run_available_now, the test via its
    own sink so it can count batches)."""
    from ..io import load_table, scratch_dir

    src = os.path.join(scratch_dir("multibatch"), "files")
    load_table(spark, sf_dir, "events").filter(
        F.col("user_id") < user_cap
    ).repartition(5).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    return stream.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("event_id").cast("long").alias("id_checksum"),
    )


def stream_countmin_cells(
    spark: SparkSession,
    sf_dir: str,
    user_cap: int = 100,
    depth: int = 4,
    width: int = 256,
    base_dir: str | None = None,
):
    """T19's builder: maintain a Count-Min sketch of the user feed UNDER A
    STREAM. The filtered events land as 5 parquet files; a file stream
    rate-limited to one file per trigger drains in ~5 micro-batches, and
    ``foreachBatch`` appends each batch's PARTIAL sketch
    (operators/heavyhitters.countmin_sketch — ≤ depth×width rows however
    large the batch) to a cell sink. The merged sketch is the cell-wise
    SUM at read time — CMS merge is exactly addition, so the streamed
    sketch is row-identical to one built over the whole feed in a single
    batch, REGARDLESS of how the stream was batched. That batching
    independence is the mergeable-summary property the sketch exists for
    (per-batch state is bounded; the sink grows by ≤ depth×width rows per
    micro-batch and compacts on read).

    Returns the merged ``(row, bucket, c)`` sketch as a batch DataFrame.
    ``base_dir`` overrides the scratch location (the pytest gate passes
    its tmp dir so it can inspect the raw per-batch cell appends and
    assert the drain really ran multiple micro-batches).
    """
    from ..io import load_table, scratch_dir
    from ..operators.heavyhitters import countmin_sketch

    base = base_dir or scratch_dir("cmstream")
    if os.path.exists(os.path.join(base, "cells")):
        # a reused base_dir would silently DOUBLE-COUNT: the source
        # rewrite mints new part-file names the checkpoint has never
        # seen, so a second drain appends a full extra set of partial
        # sketches on top of the first — refuse instead
        raise ValueError(
            f"cells sink already exists under {base!r} — "
            "stream_countmin_cells needs a fresh base_dir per run"
        )
    src = os.path.join(base, "files")
    load_table(spark, sf_dir, "events").filter(
        F.col("user_id") < user_cap
    ).repartition(5).write.mode("overwrite").parquet(src)
    cells = os.path.join(base, "cells")

    def _append_partial(batch_df, _batch_id):
        # the partial sketch is ≤ depth x width rows BY CONSTRUCTION
        # (bounded state is the operator's whole point), so it lands as
        # ONE file per micro-batch — at the session's shuffle width each
        # batch wrote ~cores tiny files and the merged read paid
        # batches x cores file opens (guide §6 output sizing; true at
        # any scale because the sketch, not the batch, bounds the rows)
        countmin_sketch(batch_df.select("user_id"), "user_id", depth, width)\
            .coalesce(1).write.mode("append").parquet(cells)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    ckpt = os.path.join(base, "ckpt")
    q = (
        stream.writeStream.foreachBatch(_append_partial)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "countmin stream drain did not finish within 300s — refusing "
            "to read a partially-appended cell sink"
        )
    return (
        spark.read.parquet(cells)
        .groupBy("row", "bucket")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def stream_versioned_commits(
    spark: SparkSession,
    sf_dir: str,
    user_cap: int = 80,
    base_dir: str | None = None,
):
    """T20's builder: a rate-limited multi-micro-batch file stream lands
    each NON-EMPTY micro-batch as one append COMMIT of a
    :class:`~..operators.versioned.VersionedTable` — the
    streaming-ingest-into-lakehouse shape: every batch becomes an
    atomic, time-travelable snapshot (manifest published last, so a
    crash mid-batch leaves the table at the previous version), and
    downstream readers pin a version instead of racing the stream.
    Empty trailing batches mint no version. Returns the table handle
    after the drain (latest version = the whole feed, regardless of how
    the stream was batched — append-commit union is batching-independent
    exactly like the t19 sketch merge).
    """
    from ..io import load_table, scratch_dir
    from ..operators.versioned import VersionedTable

    base = base_dir or scratch_dir("vstream")
    if os.path.exists(os.path.join(base, "table")):
        raise ValueError(
            f"versioned table already exists under {base!r} — "
            "stream_versioned_commits needs a fresh base_dir per run"
        )
    src = os.path.join(base, "files")
    load_table(spark, sf_dir, "events").filter(
        F.col("user_id") < user_cap
    ).select("event_id", "user_id", "event_type").repartition(5).write.mode(
        "overwrite"
    ).parquet(src)
    table = VersionedTable(spark, os.path.join(base, "table"))

    def _commit_batch(batch_df, _batch_id):
        if batch_df.isEmpty():
            return
        table.commit(batch_df, mode="append")

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(_commit_batch)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "versioned-commit stream drain did not finish within 300s"
        )
    return table


def stream_merge_upserts(
    spark: SparkSession,
    sf_dir: str,
    user_cap: int = 60,
    base_dir: str | None = None,
):
    """T21's builder: streaming MERGE — each micro-batch of an event
    feed is reduced to its per-user LATEST record (greatest event_id)
    and merged into a :class:`~..operators.versioned.VersionedTable`
    with the conditional rule ``WHEN MATCHED AND s.event_id >
    t.event_id THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT *`` —
    the standard CDC keep-the-latest sink (Delta's streaming
    foreachBatch-MERGE recipe). The conditional merge makes the final
    state BATCHING-INDEPENDENT by construction: whatever order the
    files land in, a key's row can only ever be replaced by a larger
    event_id, so the drained table holds exactly each user's global
    maximum — restatable by a plain SQL oracle, no ordering assumption
    on the file stream at all. Each replayed batch commits through the
    expected-base-version pin, so the sink also inherits the
    read-modify-write conflict guard per micro-batch."""
    from pyspark.sql import Window

    from ..io import load_table, scratch_dir
    from ..operators.versioned import VersionedTable, merge_upsert

    base = base_dir or scratch_dir("vmerge_stream")
    if os.path.exists(os.path.join(base, "table")):
        raise ValueError(
            f"versioned table already exists under {base!r} — "
            "stream_merge_upserts needs a fresh base_dir per run"
        )
    src = os.path.join(base, "files")
    feed = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < user_cap)
        .select("event_id", "user_id", "event_type")
    )
    feed.repartition(5).write.mode("overwrite").parquet(src)
    table = VersionedTable(spark, os.path.join(base, "table"))
    # seed commit: the merge needs a base version; an empty slice of the
    # feed's schema is the clean zero state (limit(0) keeps types exact)
    table.commit(feed.limit(0))

    def _merge_batch(batch_df, _batch_id):
        if batch_df.isEmpty():
            return
        w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
        latest = (
            batch_df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        merge_upsert(
            table,
            latest,
            keys=["user_id"],
            when_matched_condition="s.event_id > t.event_id",
        )

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("merge-upsert stream drain did not finish in 300s")
    return table


def drain_versioned_source(
    spark: SparkSession,
    table,
    per_batch: int = 1,
    starting_version: int = 0,
    ignore_changes: bool = False,
    timeout: float = 300.0,
    source_format: str = "versioned_table_stream",
    max_files_per_batch: int = 0,
) -> tuple[DataFrame, int]:
    """Drain a `versioned_table_stream` source (sources/versioned_stream
    — the read half of the lakehouse streaming loop) to a memory sink,
    PACED at ``per_batch`` commits per micro-batch so the run exercises
    real multi-batch offset-range replay, and return ``(result,
    n_batches)``. availableNow falls back to single-batch execution for
    Python stream sources (engine-reported), so completion is detected
    the way a real consumer would: watch the reported source endOffset
    until it reaches the table's latest committed version, then stop.
    Every triggered batch is committed before lastProgress reports it,
    so the sink is complete at stop time."""
    import json as _json
    import time as _time

    from ..sources import versioned_stream

    versioned_stream.register(spark)
    target = table.versions()[-1]
    name = f"vsrc_{uuid.uuid4().hex}"
    ckpt = os.path.join(tempfile.mkdtemp(prefix="ckpt_"), "ck")
    stream = (
        spark.readStream.format(source_format)
        .option("tableDir", table.dir)
        .option("startingVersion", str(starting_version))
        .option("ignoreChanges", "true" if ignore_changes else "false")
        .option("maxVersionsPerBatch", str(per_batch))
        .option("maxFilesPerBatch", str(max_files_per_batch))
        # pacing floor rides the checkpoint so even a restarted drain
        # could never step its offset backward (source contract)
        .option("paceStateDir", os.path.join(ckpt, "pace"))
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = _time.time() + timeout
        while _time.time() < deadline:
            lp = q.lastProgress
            if lp and lp.get("sources"):
                eo = lp["sources"][0].get("endOffset")
                if eo is not None:
                    if isinstance(eo, str):
                        # Python stream sources report the offset dict's
                        # repr (single quotes), not JSON
                        try:
                            eo = _json.loads(eo)
                        except ValueError:
                            import ast as _ast

                            eo = _ast.literal_eval(eo)
                    done = eo["version"] > target or (
                        eo["version"] == target
                        and eo.get("files", 0) == 0
                    )  # a file-paced offset can sit MID-commit at target
                    if done:
                        break
            if q.exception() is not None:
                raise q.exception()
            # 50ms poll: the loop only detects COMPLETION (batches run
            # back-to-back under the 0s trigger); 200ms added up to a
            # fifth of a 4-batch drain's wall in pure wait
            _time.sleep(0.05)
        else:
            raise TimeoutError(
                f"versioned stream did not reach version {target} in "
                f"{timeout}s"
            )
        n_batches = sum(
            1 for p in q.recentProgress if p.get("numInputRows", 0) > 0
        )
    finally:
        q.stop()
    if not q.awaitTermination(60):
        raise TimeoutError("versioned stream did not stop in 60s")
    return spark.table(name), n_batches


def drain_versioned_cdf(
    spark: SparkSession,
    table,
    per_batch: int = 1,
    starting_version: int = 0,
    timeout: float = 300.0,
    max_files_per_batch: int = 0,
) -> tuple[DataFrame, int]:
    """Drain the ROW-LEVEL streaming change feed (t23,
    `sources/versioned_stream.VersionedCDFStreamSource` — Delta's
    streaming ``readChangeFeed``) to a memory sink, paced at
    ``per_batch`` commits per micro-batch; returns ``(feed_rows,
    n_nonempty_batches)``. Same completion protocol as
    :func:`drain_versioned_source` (watch endOffset to the latest
    committed version — availableNow is single-batch for Python stream
    sources)."""
    return drain_versioned_source(
        spark,
        table,
        per_batch=per_batch,
        starting_version=starting_version,
        timeout=timeout,
        source_format="versioned_cdf_stream",
        max_files_per_batch=max_files_per_batch,
    )


def stream_replicate_cdf(
    spark: SparkSession,
    source,
    target,
    keys: list[str],
    per_batch: int = 1,
    starting_version: int = 0,
    timeout: float = 300.0,
) -> tuple[int, int]:
    """STREAMING CDC REPLICATION — the consumer loop closing the t23
    story (Delta's `readChangeFeed` + `foreachBatch MERGE` idiom, the
    streaming twin of the batch :func:`~..operators.versioned.
    replicate_changes`): follow the source table's change feed and
    apply every micro-batch to the target with MERGE (insert/update
    rows) and DELETE (delete rows), per source commit IN ORDER. At
    100 TB the replica pays O(changed rows) per commit on the wire and
    O(touched buckets) per applied commit (the target's bucket layout
    makes each replayed merge/delete granular) — never a snapshot diff.

    Delivery contract: foreachBatch is at-least-once, and the applies
    CONVERGE under replay — a re-delivered commit's merge re-asserts
    the same full rows (same keys, same payloads → identical snapshot)
    and its delete re-deletes absent keys (no-op), so a crash between
    sink commit and checkpoint advance cannot diverge the replica;
    feed rows carry full payloads precisely so replay needs no
    source-version lookback. Returns ``(final_target_version,
    n_nonempty_batches)``."""
    import json as _json
    import time as _time

    from pyspark.sql import functions as F

    from ..operators.versioned import delete_by_keys, merge_upsert
    from ..sources import versioned_stream

    versioned_stream.register(spark)
    latest = source.versions()[-1]
    ckpt = os.path.join(tempfile.mkdtemp(prefix="ckpt_"), "ck")
    stream = (
        spark.readStream.format("versioned_cdf_stream")
        .option("tableDir", source.dir)
        .option("startingVersion", str(starting_version))
        .option("maxVersionsPerBatch", str(per_batch))
        .option("paceStateDir", os.path.join(ckpt, "pace"))
        .load()
    )
    meta = ["_change_type", "_commit_version"]

    def _apply(batch_df, _batch_id):
        # one aggregation decides which legs each commit has (the
        # replicate_changes probe pattern); rows are then applied per
        # source commit in order — a paced batch holds one commit, an
        # unpaced one may span several
        batch_df = batch_df.localCheckpoint(eager=True)
        legs = {
            (r["_commit_version"], r["_change_type"]): r["n"]
            for r in batch_df.groupBy(*meta)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        for v in sorted({v for v, _t in legs}):
            rows = batch_df.filter(F.col("_commit_version") == v)
            if any(legs.get((v, t)) for t in ("insert", "update")):
                merge_upsert(
                    target,
                    rows.filter(
                        F.col("_change_type").isin("insert", "update")
                    ).drop(*meta),
                    keys=keys,
                )
            if legs.get((v, "delete")):
                delete_by_keys(
                    target,
                    rows.filter(F.col("_change_type") == "delete").select(
                        *keys
                    ),
                    keys=keys,
                )

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = _time.time() + timeout
        while _time.time() < deadline:
            lp = q.lastProgress
            if lp and lp.get("sources"):
                eo = lp["sources"][0].get("endOffset")
                if eo is not None:
                    if isinstance(eo, str):
                        try:
                            eo = _json.loads(eo)
                        except ValueError:
                            import ast as _ast

                            eo = _ast.literal_eval(eo)
                    if eo["version"] >= latest:
                        break
            if q.exception() is not None:
                raise q.exception()
            # 50ms poll: the loop only detects COMPLETION (batches run
            # back-to-back under the 0s trigger); 200ms added up to a
            # fifth of a 4-batch drain's wall in pure wait
            _time.sleep(0.05)
        else:
            raise TimeoutError(
                f"cdf replication did not reach version {latest} in "
                f"{timeout}s"
            )
        n_batches = sum(
            1 for p in q.recentProgress if p.get("numInputRows", 0) > 0
        )
    finally:
        q.stop()
    if not q.awaitTermination(60):
        raise TimeoutError("cdf replication stream did not stop in 60s")
    return target.versions()[-1], n_batches


def stream_versioned_source_replay(
    spark: SparkSession,
    sf_dir: str,
    user_cap: int = 50,
    base_dir: str | None = None,
) -> tuple[DataFrame, int]:
    """T22's builder: commit the capped events feed into a versioned
    table as three APPEND commits with a deletion-vector DELETE wedged
    between them, then stream the table's commit log back through the
    `versioned_table_stream` source paced at one commit per micro-batch.
    With ``ignoreChanges=true`` the DV commit (visible-row change, no
    new dirs) is SKIPPED per Delta's streaming contract, so the drained
    stream is exactly the union of the three appends — batching- and
    delete-independent, which is what lets a plain batch oracle restate
    it. Returns ``(drained_rows, n_nonempty_batches)``."""
    from ..io import load_table, scratch_dir
    from ..operators.versioned import VersionedTable, delete_by_keys

    base = base_dir or scratch_dir("vsrcfeed")
    src = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < user_cap)
        .select("event_id", "user_id", "event_type")
        # the feed is sliced four ways below (3 commits + the delete
        # keys); materialize the filtered projection once instead of
        # re-scanning events per slice
        .localCheckpoint()
    )
    table = VersionedTable(spark, os.path.join(base, "table"))
    for part in range(3):
        table.commit(
            src.filter(F.col("event_id") % 3 == part), mode="append"
        )
        if part == 0:
            # mid-stream merge-on-read DELETE: changes visible rows
            # without adding dirs — the commit the source must skip
            delete_by_keys(
                table,
                src.filter(F.col("event_id") % 3 == 0)
                .orderBy("event_id")
                .limit(10)
                .select("event_id"),
                keys=["event_id"],
                merge_on_read=True,
            )
    return drain_versioned_source(
        spark, table, per_batch=1, ignore_changes=True
    )
