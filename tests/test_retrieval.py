"""Semantics gates for lexical retrieval (rational-idf BM25) and the
weight-proportional Bernoulli sampler."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.operators.retrieval import bm25_topk
from weather_etl_docker_airflow_project_spark.operators.sampling import (
    weighted_bernoulli_sample,
)


def test_bm25_ranks_tf_and_rarity(spark):
    docs = spark.createDataFrame(
        [
            (1, "cat cat cat dog"),          # high tf on 'cat'
            (2, "cat dog dog dog"),          # high tf on 'dog' (commoner term)
            (3, "cat"),                      # short doc, one hit
            (4, "fish fish fish fish"),      # no query terms -> excluded
            (5, "cat dog"),                  # both terms, low tf
            (6, "dog"),
            (7, "dog fish"),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, "doc_id", "text", ["cat", "dog"], k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert 4 not in ids, "doc without any query term must not be retrieved"
    # 'cat' (df=4) is rarer than 'dog' (df=5): the all-cat-heavy doc 1
    # must outrank the all-dog-heavy doc 2
    assert ids.index(1) < ids.index(2)
    # two-term docs carry both idf contributions: doc 5 beats single-hit 6
    assert ids.index(5) < ids.index(6)
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[5]["n_hit_terms"] == 2 and by_id[6]["n_hit_terms"] == 1
    # deterministic: same plan twice, identical scores
    again = {r["doc_id"]: r["score"] for r in
             bm25_topk(docs, "doc_id", "text", ["cat", "dog"], k=10).collect()}
    assert all(by_id[i]["score"] == again[i] for i in again)


def test_weighted_sample_monotone_in_weight(spark):
    # max-weight rows are kept with probability 1; inclusion frequency
    # must increase with weight and roughly track w/max_w
    rows = [(i, (i % 10) + 1) for i in range(5000)]
    df = spark.createDataFrame(rows, "k long, w long")
    kept = weighted_bernoulli_sample(df, "k", "w").groupBy("w").count().collect()
    freq = {r["w"]: r["count"] / 500.0 for r in kept}
    assert freq[10] == 1.0, "max-weight rows must always be kept"
    assert all(freq.get(w, 0.0) <= freq.get(w + 1, 0.0) + 0.1 for w in range(1, 10))
    assert abs(freq.get(5, 0.0) - 0.5) < 0.1


def test_weighted_sample_is_reproducible(spark):
    df = spark.createDataFrame([(i, i % 7 + 1) for i in range(300)], "k long, w long")
    a = {r["k"] for r in weighted_bernoulli_sample(df, "k", "w").collect()}
    b = {r["k"] for r in weighted_bernoulli_sample(df, "k", "w").collect()}
    assert a == b
    # different salt -> decorrelated decisions, not identical membership
    c = {r["k"] for r in weighted_bernoulli_sample(df, "k", "w", salt="other").collect()}
    assert a != c
