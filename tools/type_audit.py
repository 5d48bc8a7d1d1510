"""Type-representation audit: the round driver hashes values *with* their
types (Arrow-level), so a DuckDB HUGEINT vs Spark BIGINT mismatch fails the
hash gate even when values are equal (round-1 lesson: a6/f5/f7/f9).

This tool compares the Spark result schema against the DuckDB oracle's Arrow
schema for EVERY registered query and flags any column whose physical type
differs. Run before each round so queries entering the driver's check window
are type-aligned.
"""
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
from weather_etl_docker_airflow_project_spark.plans import catalog  # noqa: E402

SF = "/root/testdata/sf0.01"

# Spark simpleString -> acceptable Arrow type strings
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


def compat(spark_t: str, arrow_t: str) -> bool:
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
        # arrow spells the element FIELD NAME into the type ('item' from
        # Spark, 'l'/'element' from DuckDB lambdas) — strip generically
        inner_s = spark_t[6:-1]
        for head in ("list<", "large_list<"):
            if arrow_t.startswith(head) and ": " in arrow_t:
                return compat(inner_s, arrow_t[len(head):-1].split(": ", 1)[1])
        return False
    return spark_t == arrow_t  # conservative


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("type-audit")
        .getOrCreate()
    )
    conn = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        conn.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    def complex_out(name, stypes, bad) -> None:
        # one definition for both branches: the driver's canonicalizer
        # cannot hash complex-typed declared columns (r5 lesson:
        # l3_int8_quantize / l4_feature_hash_embed red rows were pandas
        # "unhashable type: 'list'", not value drift) — rows-only queries
        # face the same canonicalizer, so they are checked too.
        for cn, st in stypes:
            if st.startswith(("array", "map", "struct")):
                bad.append((name, f"COMPLEX-OUT {cn}: {st} — declared outputs must be scalar (render arrays as CSV strings)"))

    bad = []
    for name, spec in catalog.REGISTRY.items():
        # NOTE: spec.fn builds the plan, which for the handful of eager
        # pipelines (BPE training, IVF/PQ fits, rollup replays) runs real
        # jobs at sf0.01 — the audit costs ~1-2 min of execution beyond
        # the schema reads; acceptable for a once-per-round gate.
        try:
            sdf = spec.fn(spark, SF)
            stypes = [(f.name, f.dataType.simpleString()) for f in sdf.schema.fields]
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"ERROR {type(e).__name__}: {str(e)[:100]}"))
            continue
        complex_out(name, stypes, bad)
        if spec.oracle is None:
            continue
        try:
            # LIMIT 0 still carries the full output schema; skips execution cost
            tbl = conn.execute(f"SELECT * FROM ({spec.oracle}) LIMIT 0").arrow()
            dtypes = [(f.name, str(f.type)) for f in tbl.schema]
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"ERROR {type(e).__name__}: {str(e)[:100]}"))
            continue
        if [n for n, _ in stypes] != [n for n, _ in dtypes]:
            bad.append((name, f"column names differ: {stypes} vs {dtypes}"))
            continue
        for (cn, st), (_, at) in zip(stypes, dtypes):
            if not compat(st, at):
                bad.append((name, f"{cn}: spark={st} duckdb={at}"))
            elif st.startswith("decimal"):
                # representation lint, not a failure: the round driver's
                # value canonicalization has mishashed raw DECIMAL outputs
                # whose values carry trailing fractional zeros (r4: q14/
                # q18/s10 — the only red rows ever — all emitted raw
                # DECIMAL; every BIGINT/bit-exact-DOUBLE query passed).
                # Prefer CAST to DOUBLE (exact decimal inside, cast last)
                # or BIGINT/string in DECLARED columns.
                print(f"DECIMAL-OUT {name}: {cn} {st} — prefer DOUBLE/BIGINT/string in declared outputs")
    if bad:
        for name, msg in bad:
            print(f"TYPE-DRIFT {name}: {msg}")
        print(f"\n{len(bad)} drift(s) across {len(set(n for n, _ in bad))} queries")
        return 1
    print(f"all {sum(1 for s in catalog.REGISTRY.values() if s.oracle)} oracle queries type-aligned")
    return 0


if __name__ == "__main__":
    sys.exit(main())
