"""Scalar-function query surface (SURVEY.md §2.8 F5-F13): date/time,
string, math, conditional, JSON, array, map, hash, cast suites.

Cross-engine determinism notes baked into each query:
- double→int casts differ (Spark truncates, DuckDB rounds) — use explicit
  floor/round;
- transcendental fns (ln, pow) may differ by 1 ulp between libm
  implementations — rounded to 6 decimals;
- timestamp→string goes through explicit format strings both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .registry import query


@query(
    "f5_datetime_suite",
    oracle="""
    SELECT CAST(date_part('year', o_orderdate) AS INT) AS yr,
           CAST(date_part('month', o_orderdate) AS INT) AS mth,
           COUNT(*) AS n,
           MIN(strftime(o_orderdate, '%Y-%m-%d')) AS first_day,
           CAST(SUM(date_diff('day', DATE '2000-01-01', CAST(o_orderdate AS DATE))) AS BIGINT)
               AS total_days_since_epoch0
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("F5",),
)
def f5_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month extraction, date formatting, datediff — all exact integer
    or string ops, identical across engines."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mth"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("first_day"),
            F.sum(
                F.datediff(F.col("o_orderdate").cast("date"), F.lit("2000-01-01").cast("date")).cast(
                    "bigint"
                )
            ).alias("total_days_since_epoch0"),
        )
    )


@query(
    "f6_string_suite",
    oracle="""
    SELECT p_partkey,
           lower(p_brand) AS brand_lc,
           upper(p_type) AS type_uc,
           trim(p_name) AS name_trim,
           substring(p_name, 1, 5) AS name_head,
           length(p_name) AS name_len,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           regexp_replace(p_type, '[aeiou]', '_') AS type_devoweled,
           concat_ws('|', p_brand, p_type) AS brand_type
    FROM part
    WHERE p_partkey <= 200
    """,
    tags=("F4", "F6"),
)
def f6_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    return p.select(
        "p_partkey",
        F.lower("p_brand").alias("brand_lc"),
        F.upper("p_type").alias("type_uc"),
        F.trim("p_name").alias("name_trim"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_type", "[aeiou]", "_").alias("type_devoweled"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


@query(
    "f7_math_suite",
    oracle="""
    SELECT s_suppkey,
           round(s_acctbal, 1) AS bal_round,
           abs(s_acctbal) AS bal_abs,
           CAST(ceil(s_acctbal) AS BIGINT) AS bal_ceil,
           CAST(floor(s_acctbal) AS BIGINT) AS bal_floor,
           round(sqrt(abs(s_acctbal)), 6) AS bal_sqrt,
           round(ln(abs(s_acctbal) + 1), 6) AS bal_ln,
           round(power(s_acctbal, 2), 4) AS bal_sq,
           CAST(s_suppkey % 7 AS BIGINT) AS key_mod
    FROM supplier
    """,
    tags=("F7",),
)
def f7_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    bal = F.col("s_acctbal")
    return s.select(
        "s_suppkey",
        F.round(bal, 1).alias("bal_round"),
        F.abs(bal).alias("bal_abs"),
        F.ceil(bal).alias("bal_ceil"),
        F.floor(bal).alias("bal_floor"),
        F.round(F.sqrt(F.abs(bal)), 6).alias("bal_sqrt"),
        F.round(F.log(F.abs(bal) + 1), 6).alias("bal_ln"),
        F.round(F.pow(bal, 2), 4).alias("bal_sq"),
        (F.col("s_suppkey") % 7).cast("bigint").alias("key_mod"),
    )


@query(
    "f8_conditional_suite",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS size_class,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
           GREATEST(o_totalprice, 150000.0) AS floor_price,
           LEAST(o_totalprice, 150000.0) AS cap_price
    FROM orders WHERE o_orderkey <= 2000
    """,
    tags=("F8",),
)
def f8_conditional_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(price > 300000, "big").when(price > 100000, "mid").otherwise("small").alias(
            "size_class"
        ),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.greatest(price, F.lit(150000.0)).alias("floor_price"),
        F.least(price, F.lit(150000.0)).alias("cap_price"),
    )


@query(
    "f9_json_suite",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
           MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("F9",),
    doc="JSON field extraction — generalizes the reference's nested-JSON "
    "consumption (weather_etl.py:105,119-128).",
)
def f9_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "f10_array_suite",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           string_split(text, ' ')[1] AS first_token,
           len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS n_long_tokens,
           array_to_string(list_sort(string_split(text, ' ')[1:4]), '-') AS head_sorted
    FROM documents WHERE doc_id < 100
    """,
    tags=("F10", "P2"),
)
def f10_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops incl. higher-order filter — generalizes the reference's
    array-element access (weather_etl.py:125, weather[0].description)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.element_at(toks, 1).alias("first_token"),
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).cast("long").alias("n_long_tokens"),
        F.array_join(F.sort_array(F.slice(toks, 1, 4)), "-").alias("head_sorted"),
    )


@query(
    "f11_map_suite",
    oracle="""
    SELECT doc_id,
           map_extract(map([lang], [n_chars]), lang)[1] AS chars_by_lang,
           array_to_string(map_keys(map([lang, source], [1, 2])), ',') AS key_list
    FROM documents WHERE doc_id < 50
    """,
    tags=("F11",),
)
def f11_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    m1 = F.create_map(F.col("lang"), F.col("n_chars"))
    m2 = F.create_map(F.col("lang"), F.lit(1), F.col("source"), F.lit(2))
    return d.select(
        "doc_id",
        F.element_at(m1, F.col("lang")).alias("chars_by_lang"),
        F.array_join(F.map_keys(m2), ",").alias("key_list"),
    )


@query(
    "f12_hash_suite",
    oracle="""
    SELECT n_nationkey,
           md5(n_name) AS name_md5,
           sha256(n_name) AS name_sha256,
           md5(concat(n_name, '|', CAST(n_regionkey AS VARCHAR))) AS row_md5
    FROM nation
    """,
    tags=("F12",),
)
def f12_hash_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable hashes only (md5/sha2) — xxhash64/hash are engine-specific
    and never appear in oracle-checked output."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.md5("n_name").alias("name_md5"),
        F.sha2(F.col("n_name"), 256).alias("name_sha256"),
        F.md5(F.concat(F.col("n_name"), F.lit("|"), F.col("n_regionkey").cast("string"))).alias(
            "row_md5"
        ),
    )


@query(
    "f13_cast_suite",
    oracle="""
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS line_big,
           CAST(l_quantity AS INT) AS qty_int,            -- qty is integral-valued
           CAST(CAST(l_partkey AS INT) AS DOUBLE) AS part_dbl,
           strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_str,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor
    FROM lineitem WHERE l_orderkey <= 500
    """,
    tags=("F13",),
)
def f13_cast_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts with identical cross-engine semantics: integral-valued doubles
    to int, explicit floor before double→bigint (Spark truncates, DuckDB
    rounds — never cast fractional doubles to int directly)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("line_big"),
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_partkey").cast("int").cast("double").alias("part_dbl"),
        F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss").alias("ship_str"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
    )


# ---------------------------------------------------------------------------
# §2.10 UDTF surface: Python UDTF (table function) via LATERAL join
# ---------------------------------------------------------------------------


@query(
    "udtf_document_chunks",
    oracle="""
    WITH idx AS (SELECT CAST(i AS BIGINT) AS i
                 FROM generate_series(0, 999) AS t(i))
    SELECT d.doc_id,
           CAST(idx.i AS INTEGER) AS chunk_idx,
           substr(d.text, CAST(idx.i * 120 + 1 AS BIGINT), 120) AS chunk_text,
           CAST(length(substr(d.text, CAST(idx.i * 120 + 1 AS BIGINT), 120))
                AS INTEGER) AS chunk_len
    FROM documents d
    JOIN idx ON idx.i * 120 < length(d.text)
    WHERE d.doc_id < 200
    """,
    tags=("UDTF", "L4"),
)
def udtf_document_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF demo (SURVEY §2.10 — the one UDF quadrant the engine had
    not yet registered; pandas_udf / mapInPandas / applyInPandasWithState
    are covered by the L/T families): fixed-width document chunking for a
    RAG-style pipeline, written as a table function and applied per-row
    with a LATERAL join, so each document expands to ceil(len/120) chunk
    rows map-side — no shuffle, no driver involvement; at 100 TB this is
    embarrassingly parallel row expansion inside the scan stage.

    The same logic is expressible with built-ins (sequence + posexplode +
    substring) — the point here is the UDTF *API surface*; the oracle is
    the pure-SQL twin (DuckDB LATERAL generate_series), so the check is
    exact, not rows-only."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: int, chunk_text: string, chunk_len: int")
    class ChunkDocument:
        def eval(self, text, size):
            if text is None:
                return
            for start in range(0, len(text), size):
                piece = text[start : start + size]
                yield start // size, piece, len(piece)

    spark.udtf.register("chunk_doc_udtf", ChunkDocument)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.chunk_len
        FROM {docs} d, LATERAL chunk_doc_udtf(d.text, 120) c
        """,
        docs=docs,
    )


# ---------------------------------------------------------------------------
# F14: semi-structured VARIANT suite (Spark 4 parse_json / variant_get)
# ---------------------------------------------------------------------------


@query(
    "f14_variant_suite",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status_v,
           o_orderpriority AS priority_v,
           o_totalprice AS total_v,
           CAST(NULL AS INTEGER) AS missing_v
    FROM orders WHERE o_orderkey <= 300
    """,
    tags=("F9", "F14"),
)
def f14_variant_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT round-trip (Spark 4's open-variant type —
    the modern replacement for stringly-typed JSON columns): each order
    serializes to a nested JSON document, parses into a VARIANT, and the
    declared output re-extracts every field with typed `variant_get`
    paths (nested object member, array element, top-level key) plus a
    `try_variant_get` miss that must yield NULL, not an error.  The
    oracle is the ORIGINAL columns — so the check proves the
    JSON -> VARIANT -> typed-extraction pipeline is lossless, including
    the double round-trip (Java's shortest-repr double printing parses
    back bit-exactly).  VARIANT extraction is JVM-side codegen; at scale
    this replaces per-row Python JSON parsing entirely."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    js = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("k"),
            F.struct(
                F.col("o_orderstatus").alias("st"),
                F.col("o_orderpriority").alias("pri"),
            ).alias("meta"),
            F.array(F.col("o_totalprice")).alias("amounts"),
        )
    )
    v = F.parse_json(js)
    return o.select(
        F.variant_get(v, "$.k", "bigint").alias("o_orderkey"),
        F.variant_get(v, "$.meta.st", "string").alias("status_v"),
        F.variant_get(v, "$.meta.pri", "string").alias("priority_v"),
        F.variant_get(v, "$.amounts[0]", "double").alias("total_v"),
        F.try_variant_get(v, "$.nope", "int").alias("missing_v"),
    )


@query(
    "f15_xml_suite",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders WHERE o_orderkey < 200
    """,
    tags=("F9", "S2"),
)
def f15_xml_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML function surface (Spark 4 built-ins): a document built with
    concat is torn back apart with xpath_long/xpath_string, and a
    to_xml(struct) -> from_xml round-trip recovers the priority field.
    The output is exactly the source columns, so the identity oracle
    proves the XML serializer and BOTH parsers (xpath and schema-based
    from_xml) are value-faithful — any escaping or whitespace bug breaks
    the hash. All expressions are JVM codegen (no UDFs); at scale this is
    a pure map stage over the scan."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    xml = F.concat(
        F.lit("<o><k>"), F.col("o_orderkey").cast("string"),
        F.lit("</k><s>"), F.col("o_orderstatus"),
        F.lit("</s></o>"),
    )
    roundtrip = F.from_xml(
        F.to_xml(F.struct(F.col("o_orderpriority").alias("pri"))),
        "pri STRING",
    )
    return o.select(
        F.expr(
            "xpath_long(concat('<o><k>', CAST(o_orderkey AS STRING), "
            "'</k><s>', o_orderstatus, '</s></o>'), '/o/k/text()')"
        ).alias("o_orderkey"),
        F.xpath_string(xml, F.lit("/o/s/text()")).alias("o_orderstatus"),
        roundtrip.getField("pri").alias("o_orderpriority"),
    )


@query(
    "f16_sql_udf_suite",
    oracle="""
    WITH words AS (
      SELECT o_orderkey,
             unnest(list_filter(regexp_split_to_array(o_orderpriority, '-'),
                                w -> w <> '')) AS w
      FROM orders WHERE o_orderkey < 500)
    SELECT o_orderkey, w,
           CAST(CAST(o_orderkey AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(0.05 AS DECIMAL(3,2)))
                AS DOUBLE) AS discounted_key
    FROM words
    """,
    tags=("F4", "F6", "P7"),
)
def f16_sql_udf_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined functions (Spark 4 CREATE FUNCTION ... RETURN): a
    scalar SQL UDF carrying the engine's DECIMAL money convention and a
    SQL TABLE function (RETURNS TABLE + LATERAL) that splits the priority
    code into words. Both are catalog objects whose bodies Catalyst
    INLINES into the calling plan — unlike Python UDFs they stay inside
    whole-stage codegen, so a reused business formula costs nothing at
    100 TB. The oracle restates the inlined expressions directly; a green
    hash proves the UDF indirection is semantically transparent."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION discounted_money(v DOUBLE)
        RETURNS DOUBLE
        RETURN CAST(CAST(v AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(0.05 AS DECIMAL(3,2)))
                    AS DOUBLE)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION priority_words(s STRING)
        RETURNS TABLE(w STRING)
        RETURN SELECT explode(filter(split(s, '-'), w -> w != ''))
        """
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_f16")
    return spark.sql(
        """
        SELECT o.o_orderkey, t.w,
               discounted_money(CAST(o.o_orderkey AS DOUBLE)) AS discounted_key
        FROM orders_f16 o, LATERAL priority_words(o.o_orderpriority) t
        WHERE o.o_orderkey < 500
        """
    )


@query(
    "f17_try_suite",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE CAST(CAST(o_orderkey AS DECIMAL(18,4))
                          / CAST(o_orderkey % 7 AS DECIMAL(18,4)) AS DOUBLE)
           END AS safe_div,
           TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN 'not-a-number'
                         ELSE CAST(o_orderkey AS VARCHAR) END AS BIGINT)
               AS safe_cast,
           TRY_CAST(CASE WHEN o_orderkey % 2 = 0
                         THEN '2024-0' || CAST(o_orderkey % 9 + 1 AS VARCHAR)
                              || '-15 12:00:00'
                         ELSE 'nope' END AS TIMESTAMP) AS safe_ts
    FROM orders WHERE o_orderkey < 300
    """,
    tags=("F8", "F13", "P4"),
)
def f17_try_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe function suite: under Spark 4's default ANSI
    semantics a divide-by-zero or bad cast ABORTS the job, so pipelines
    quarantining dirty values use the try_* family — try_divide,
    try_cast, try_to_timestamp all return NULL-on-error instead of
    failing the stage (the row-level twin of s19's PERMISSIVE file
    ingestion). Decimal division keeps the money convention; the oracle
    states the same NULL islands with CASE/TRY_CAST. Pure codegen map
    stage at any scale."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    num = F.col("o_orderkey").cast("decimal(18,4)")
    den = (F.col("o_orderkey") % 7).cast("decimal(18,4)")
    bad_str = F.when(F.col("o_orderkey") % 3 == 0, "not-a-number").otherwise(
        F.col("o_orderkey").cast("string")
    )
    ts_str = F.when(
        F.col("o_orderkey") % 2 == 0,
        F.concat(
            F.lit("2024-0"),
            (F.col("o_orderkey") % 9 + 1).cast("string"),
            F.lit("-15 12:00:00"),
        ),
    ).otherwise(F.lit("nope"))
    return o.select(
        "o_orderkey",
        F.try_divide(num, den).cast("double").alias("safe_div"),
        bad_str.try_cast("bigint").alias("safe_cast"),
        F.try_to_timestamp(ts_str).alias("safe_ts"),
    )


@query(
    "f18_variant_explode",
    oracle="""
    WITH u AS (
      SELECT o_orderkey, 0 AS pos, o_orderpriority AS v
      FROM orders WHERE o_orderkey < 300
      UNION ALL
      SELECT o_orderkey, 1 AS pos, o_orderstatus AS v
      FROM orders WHERE o_orderkey < 300)
    SELECT o_orderkey, CAST(pos AS INT) AS pos, v
    FROM u
    """,
    tags=("F14", "F9"),
)
def f18_variant_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT table function (variant_explode, Spark 4): each order's
    fields travel as a semi-structured JSON array parsed to VARIANT, and
    the LATERAL variant_explode unnests it back to (pos, value) rows —
    the shredding path for ingesting heterogeneous semi-structured
    feeds without a fixed schema. The identity oracle proves the whole
    parse → variant → explode → cast chain lossless; complements f14's
    scalar variant_get paths with the table-function surface."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    o.createOrReplaceTempView("orders_f18")
    return spark.sql(
        """
        SELECT o.o_orderkey, t.pos, CAST(t.value AS STRING) AS v
        FROM orders_f18 o,
        LATERAL variant_explode(
          parse_json(concat('["', o.o_orderpriority, '","', o.o_orderstatus, '"]'))
        ) t
        """
    )
