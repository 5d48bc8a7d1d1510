"""Round-16 subtree plan dumps.

Several r16-touched operators run behind eager localCheckpoints, so an
end-to-end ``explain`` of the registered query shows only ``Scan
ExistingRDD`` (the r15 verdict called this out on the dedup rewrite).
This tool rebuilds the INTERIOR subtrees the round changed — without
executing the checkpoints — and writes their ``explain("formatted")``
to ``plans/r16/<name>_<label>.txt`` so plan-shape claims are checkable.

Usage: ``python tools/plan_subtrees_r16.py <label>`` (label = before|after;
run it once on the pre-round tree via a git worktree and once on the
current tree).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")

from pyspark.sql import functions as F  # noqa: E402

from weather_etl_docker_airflow_project_spark.io import load_table  # noqa: E402
from weather_etl_docker_airflow_project_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16"
)


def _dump(df, name: str, label: str) -> None:
    jvm = df.sparkSession._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, f"{name}_{label}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print("wrote", path)


def dedup_grouped_subtree(spark, label):
    """The capped jaccard/containment grouped-expansion interior: hot
    pre-filter (r16) feeding the sorted-id-set collect."""
    from weather_etl_docker_airflow_project_spark.operators import dedup

    docs = load_table(spark, SF_DIR, "documents")
    sh = dedup.shingles(docs, "doc_id", "text", 5)
    if label == "before":
        grouped = (
            sh.groupBy("shingle")
            .agg(F.array_sort(F.collect_list(F.col("doc_id"))).alias("ids"))
            .filter(F.size("ids") <= 100)
        )
    else:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > 100)
            .select("shingle")
        )
        grouped = (
            sh.join(hot.hint("shuffle_hash"), "shingle", "left_anti")
            .groupBy("shingle")
            .agg(F.array_sort(F.collect_list(F.col("doc_id"))).alias("ids"))
            .filter(F.size("ids") <= 100)
        )
    _dump(grouped, "dedup_capped_grouped_subtree", label)


def g2_attach_subtree(spark, label):
    """triangle_counts' attach interior on a synthetic edge table: shows
    whether the adjacency aggregate is computed once (checkpointed,
    'after') or once per broadcast build ('before' — no ReusedExchange
    fires across the two renamed projections)."""
    e = spark.range(10000).select(
        (F.col("id") % 97).alias("src"), (F.col("id") % 89).alias("dst")
    )
    adj = e.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
    if label == "after":
        adj = adj.localCheckpoint()  # one materialization, two readers
    adj_u = adj.select(F.col("src"), F.col("nbrs").alias("u_nbrs"))
    adj_v = adj.select(
        F.col("src").alias("dst"), F.col("nbrs").alias("v_nbrs")
    )
    tri = e.join(F.broadcast(adj_u), "src").join(F.broadcast(adj_v), "dst")
    _dump(tri, "g2_adjacency_attach_subtree", label)


def ivf_build_write_subtree(spark, label):
    """The IVF cell write's partitioning operator: fixed-width
    repartition('cell') before r16, AQE REBALANCE after."""
    from weather_etl_docker_airflow_project_spark.operators import similarity

    emb = load_table(spark, SF_DIR, "embeddings")
    cells = similarity.ivf_cells(emb, 125, "vec_id", "embedding")
    shaped = (
        cells.repartition("cell")
        if label == "before"
        else cells.hint("rebalance", "cell")
    )
    _dump(shaped, "ivf_cell_write_subtree", label)


def main():
    label = sys.argv[1] if len(sys.argv) > 1 else "after"
    spark = build_session(app_name=f"plan-subtrees-r16-{label}")
    dedup_grouped_subtree(spark, label)
    g2_attach_subtree(spark, label)
    ivf_build_write_subtree(spark, label)
    spark.stop()


if __name__ == "__main__":
    main()
