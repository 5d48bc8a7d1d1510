"""Cross-engine tokenization parity on a DIRTY corpus.

The driver's oracle gate runs on clean single-space testdata, which can
hide Spark-vs-DuckDB tokenization drift (empty documents, multi-space,
tabs, newlines, leading/trailing whitespace). This test rebuilds the
differential check over a crafted dirty `documents` table for every
text-analysis query, so `operators.text.tokens` (split \\s+, drop
empties) and the oracles' ``_TOKS`` fragment can never diverge silently —
the round-2 advice finding.
"""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DIRTY_TEXTS = [
    "",  # zero tokens: fingerprint NULL guard, n_grams=0, division guards
    "   ",  # whitespace-only: still zero tokens
    "a  b",  # double space: string_split(' ') would emit an empty token
    "tab\tseparated tokens here and the of to in is that for more pad",
    "line\nbreak tokens the and of extra words to cross sixteen total words here now yes",
    " leading and trailing spaces around this sentence of many words here today ",
    "normal clean text the and of to in is that for good measure extra",
    "x x x x x x x x x x x x x x x x x x",  # repetitive: dup_gram_pct high
    "der die das und ist nicht ein mit mehr worte bitte jetzt gleich hier",
    "Contact First.Last+tag@Example.co.uk or USER9@MAIL-HOST.org now",
]

# Every registered query whose Spark side tokenizes with text.tokens() (or
# whose oracle embeds the _TOKS twin); l4_redact_pii rides along to pin the
# broadened EMAIL_RE to the oracle on mixed-case/+tag/multi-label addresses.
TOKENIZING_QUERIES = [
    "l4_token_stats",
    "l4_term_stats",
    "l4_quality_score",
    "l4_lang_id",
    "l4_fingerprint",
    "l4_tfidf_top_terms",
    "l4_repetition_stats",
    "l4_gopher_rules",
    "l4_redact_pii",
    "l6_sequence_packing",
]


@pytest.fixture(scope="module")
def dirty_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dirty_sf")
    table = pa.table(
        {
            "doc_id": pa.array(range(len(DIRTY_TEXTS)), type=pa.int64()),
            "text": pa.array(DIRTY_TEXTS, type=pa.string()),
            "lang": pa.array(["en"] * len(DIRTY_TEXTS), type=pa.string()),
            "source": pa.array(
                [f"src{i % 3}" for i in range(len(DIRTY_TEXTS))], type=pa.string()
            ),
            "n_chars": pa.array(
                [len(t) for t in DIRTY_TEXTS], type=pa.int64()
            ),
        }
    )
    pq.write_table(table, str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def dirty_duck(dirty_sf_dir):
    conn = duckdb.connect()
    conn.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{dirty_sf_dir}/documents.parquet')"
    )
    yield conn
    conn.close()


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v + 0.0
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _sort_key(row):
    return tuple((x is None, str(type(x)), str(x)) for x in row)


@pytest.mark.parametrize("name", TOKENIZING_QUERIES)
def test_dirty_corpus_parity(spark, dirty_sf_dir, dirty_duck, name):
    from weather_etl_docker_airflow_project_spark.plans.catalog import REGISTRY

    spec = REGISTRY[name]
    sdf = spec.fn(spark, dirty_sf_dir)
    srows = sorted(
        (tuple(_norm(v) for v in r) for r in sdf.collect()), key=_sort_key
    )
    res = dirty_duck.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = sorted(
        (tuple(_norm(v) for v in r) for r in res.fetchall()), key=_sort_key
    )
    assert sdf.columns == dcols, f"{name}: column drift {sdf.columns} vs {dcols}"
    assert srows == drows, (
        f"{name}: dirty-corpus value drift\n"
        f"spark-only: {[r for r in srows if r not in drows][:5]}\n"
        f"oracle-only: {[r for r in drows if r not in srows][:5]}"
    )


def test_referential_integrity_counts_null_and_missing_fks(spark):
    """Crafted orphans: NULL fk counts as orphan, a missing parent key
    counts, matched rows don't; multi-check output is one row per rule."""
    from weather_etl_docker_airflow_project_spark.operators.dq import (
        referential_integrity,
    )

    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, None), (4, 99)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pk long")
    out = {
        r["rule"]: (r["fk_rows"], r["orphans"], r["passed"])
        for r in referential_integrity(
            [
                ("child_fk_in_parent", child, "fk", parent, "pk"),
                ("parent_pk_in_child", parent, "pk", child, "fk"),
            ]
        ).collect()
    }
    assert out["child_fk_in_parent"] == (4, 2, False)  # NULL + 99
    assert out["parent_pk_in_child"] == (3, 1, False)  # 30 unreferenced
