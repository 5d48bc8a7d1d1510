"""The VANILLA lakehouse tour — every step below uses only the standard
Spark API surface (``spark.read/write/readStream/writeStream.format(
"versioned_table")`` plus one ``engine_sql`` call for DML); nothing in
the loop imports the library's operator classes. This is the round-13
"complete surface" demonstration: a user of the reference repo — whose
entire pipeline is poll → transform → idempotent-insert → query
(airflow/dags/weather_etl.py) — runs the same lifecycle here against a
versioned, time-travelable, constraint-enforced table format, from any
plain Spark job.

Run: ``python examples/vanilla_lakehouse_tour.py`` (local[*], ~1 min).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.operators.dml_sql import engine_sql
from weather_etl_docker_airflow_project_spark.session import build_session
from weather_etl_docker_airflow_project_spark.sources import versioned_stream


def main() -> None:
    spark = build_session(app_name="vanilla-lakehouse-tour")
    versioned_stream.register(spark)  # one-time: the format's sources
    root = tempfile.mkdtemp(prefix="lakehouse_tour_")
    table = os.path.join(root, "observations")

    # 1. CREATE + APPEND through the vanilla writer (S49): per-task
    #    staging, manifest-CAS publish, footer-harvested skipping stats.
    obs = spark.range(0, 1000).select(
        F.col("id").alias("obs_id"),
        (F.col("id") % 7).alias("station"),
        (F.col("id") * 0.1).alias("temp_c"),
    )
    obs.write.format("versioned_table").mode("append").option(
        "tableDir", table
    ).save()
    print("v1 committed:", spark.read.format("versioned_table")
          .option("tableDir", table).load().count(), "rows")

    # 2. STREAM more observations in (T24): one atomic commit per
    #    micro-batch, #sbatch exactly-once against redelivery.
    feed_dir = os.path.join(root, "feed")
    os.makedirs(feed_dir)
    for i in range(3):
        with open(os.path.join(feed_dir, f"drop{i}.json"), "w") as f:
            for k in range(1000 + i * 100, 1100 + i * 100):
                f.write('{"obs_id": %d, "station": %d, "temp_c": %f}\n'
                        % (k, k % 7, k * 0.1))
    q = (
        spark.readStream.schema("obs_id bigint, station bigint, temp_c double")
        .option("maxFilesPerTrigger", "1")
        .json(feed_dir)
        .writeStream.format("versioned_table")
        .option("tableDir", table)
        .option("checkpointLocation", os.path.join(root, "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # 3. SQL DML (S53): disjunctive predicate, stats-scoped rewrite
    #    (change feed on first, so step 5 can read row-level history).
    engine_sql(spark, f"ALTER TABLE '{table}' ENABLE CHANGE DATA FEED")
    engine_sql(
        spark,
        f"DELETE FROM '{table}' WHERE temp_c > :hot OR obs_id < :floor",
        {"hot": 125.0, "floor": 10},
    )

    # 4. SQL SELECT surface: register a view through the vanilla reader
    #    (time travel included) and query it with plain spark.sql.
    engine_sql(spark, f"CREATE TEMP VIEW obs AS VERSIONED '{table}'")
    engine_sql(
        spark, f"CREATE TEMP VIEW obs_v1 AS VERSIONED '{table}' VERSION AS OF 1"
    )
    print(spark.sql(
        "SELECT station, count(*) AS n, round(avg(temp_c), 2) AS avg_c "
        "FROM obs GROUP BY station ORDER BY station"
    ).show(8))
    print("v1 had:", spark.sql("SELECT count(*) AS n FROM obs_v1").first().n)

    # 5. Row-level HISTORY through the vanilla reader (S54).
    feed = (
        spark.read.format("versioned_table")
        .option("tableDir", table)
        .option("readChangeFeed", "true")
        .load()
    )
    feed.groupBy("_commit_version", "_change_type").count().orderBy(
        "_commit_version"
    ).show()

    # 6. SQL WRITES (S56, round 14): CTAS a derived table and append a
    #    SELECT — a pure-SQL user never leaves engine_sql.
    hot = os.path.join(root, "hot_obs")
    engine_sql(
        spark,
        f"CREATE VERSIONED TABLE '{hot}' AS "
        "SELECT obs_id, station, temp_c FROM obs WHERE temp_c >= :warm",
        {"warm": 100.0},
    )
    engine_sql(
        spark,
        f"INSERT INTO VERSIONED '{hot}' "
        "SELECT obs_id, station, temp_c FROM obs WHERE station = :s",
        {"s": 3},
    )

    # 7. Maintenance, still SQL: audit, pre-flight, cluster, retention.
    engine_sql(spark, f"DESCRIBE HISTORY '{table}'").show(truncate=False)
    engine_sql(spark, f"VACUUM '{table}' RETAIN 2 VERSIONS DRY RUN").show(
        truncate=False
    )
    engine_sql(spark, f"OPTIMIZE '{table}' ZORDER BY (station, obs_id)")
    engine_sql(spark, f"VACUUM '{table}' RETAIN 2 VERSIONS")
    print("done — table at", table)
    spark.stop()


if __name__ == "__main__":
    main()
