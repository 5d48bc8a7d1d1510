"""Cross-engine TYPE alignment gate (the round-1 failure class): the
driver hashes values with their Arrow-level types, so a DuckDB HUGEINT or
DOUBLE where Spark emits BIGINT fails the hash even when values are equal.

This compares the Spark result schema against the DuckDB oracle's Arrow
schema for EVERY registered oracle query — the pytest twin of
``tools/type_audit.py`` (LIMIT 0, so the oracle side costs nothing; the
Spark side builds plans only, no jobs)."""

from __future__ import annotations

import duckdb
import pytest

from weather_etl_docker_airflow_project_spark.plans import catalog

SF = "/root/testdata/sf0.01"

COMPAT = {
    "tinyint": {"int8"},
    "smallint": {"int16"},
    "int": {"int32"},
    "bigint": {"int64"},
    "float": {"float"},
    "double": {"double"},
    "string": {"string", "large_string"},
    "boolean": {"bool"},
    "date": {"date32[day]"},
    "binary": {"binary", "large_binary"},
}


def _compat(spark_t: str, arrow_t: str) -> bool:
    if spark_t in COMPAT:
        return arrow_t in COMPAT[spark_t]
    if spark_t.startswith("decimal"):
        # normalize both sides: spark 'decimal(12,2)' vs arrow 'decimal128(12, 2)'
        return arrow_t.startswith("decimal") and spark_t[7:].replace(
            " ", ""
        ) in arrow_t.replace(" ", "")
    if spark_t.startswith("timestamp"):
        return arrow_t.startswith("timestamp")
    if spark_t.startswith("array<"):
        inner_s = spark_t[6:-1]
        # arrow spells the element's FIELD NAME into the type ('item' from
        # Spark, 'l'/'element' from DuckDB list()/list_transform) — strip
        # `list<name: ` generically
        for head in ("list<", "large_list<"):
            if arrow_t.startswith(head) and ": " in arrow_t:
                inner_a = arrow_t[len(head):-1].split(": ", 1)[1]
                return _compat(inner_s, inner_a)
        return False
    return spark_t == arrow_t


@pytest.fixture(scope="module")
def oracle_conn():
    conn = duckdb.connect()
    tables = "region nation customer supplier part orders lineitem events documents embeddings"
    for t in tables.split():
        conn.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return conn


def test_all_oracle_queries_type_aligned(spark, oracle_conn):
    drifts = []
    for name, spec in catalog.REGISTRY.items():
        if spec.oracle is None:
            continue
        sdf = spec.fn(spark, SF)
        stypes = [(f.name, f.dataType.simpleString()) for f in sdf.schema.fields]
        tbl = oracle_conn.execute(f"SELECT * FROM ({spec.oracle}) LIMIT 0").arrow()
        dtypes = [(f.name, str(f.type)) for f in tbl.schema]
        if [n for n, _ in stypes] != [n for n, _ in dtypes]:
            drifts.append(f"{name}: column names {stypes} != {dtypes}")
            continue
        for (cn, st), (_, at) in zip(stypes, dtypes):
            if not _compat(st, at):
                drifts.append(f"{name}.{cn}: spark={st} duckdb={at}")
    assert not drifts, "\n".join(drifts)
