"""Bucketed co-located join (io.write_bucketed_table): same-spec bucketed
tables sort-merge-join with no shuffle exchange on either side."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.io import load_table, write_bucketed_table

SF = "/root/testdata/sf0.001"


def test_cobucketed_join_has_no_exchange(spark):
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    write_bucketed_table(
        orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"]
    )
    write_bucketed_table(
        lineitem, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"]
    )
    # fact-x-fact condition: at scale neither side broadcasts; simulate by
    # disabling the auto-broadcast threshold for this plan
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey).select(
            "o_orderkey", "l_quantity"
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "co-bucketed join must not shuffle"
        # correctness: same row count as the plain join
        plain = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
