"""LLM data-pipeline query surface (SURVEY.md §2.11 L1-L5): dedup,
similarity search, text analysis, multimodal columns — over the driver's
``documents`` and ``embeddings`` tables.

Oracle strategy: every declared output is integers / fixed strings /
booleans — no floats — so the driver's value-hash comparison is exact.
Hashes are md5-derived (``functions.xhash``), the one hash family both
Spark and DuckDB compute identically. The oracle SQL re-implements each
algorithm in DuckDB (list comprehensions mirror Spark's higher-order
functions) — an independent second implementation, not a shared shortcut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.xhash import (
    MINHASH_A,
    h16_sql,
    h32_sql,
    minhash_perm_sql,
    plane_components,
)
from ..io import load_table
from ..operators import audio, dedup, multimodal, similarity, text
from .registry import query

# ---------------------------------------------------------------------------
# Shared oracle SQL fragments (DuckDB dialect)
# ---------------------------------------------------------------------------

# word 3-gram shingles, distinct, exploded — twin of operators.dedup.shingles
_SHINGLES_CTE = """
tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
                 for i in generate_series(1, greatest(len(toks) - 2, 1))])) AS shingle
  FROM tok)
"""

_QUANT_VEC = (
    "[CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) for x in embedding]"
)

# Whitespace tokenization with empty-token cleanup — the exact DuckDB twin
# of ``operators.text.tokens`` (split on \s+, drop empties), so the l4
# oracles agree with Spark on empty / multi-space / tab-separated documents
# too, not just on clean single-space text (tests/test_dirty_corpus.py).
_TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), tk -> tk <> '')"


def _planes_sql(n_planes: int, dim: int) -> str:
    """Literal plane arrays as one DuckDB VALUES list: (plane_j, comps)."""
    rows = ", ".join(
        f"({j}, {plane_components(j, dim)})" for j in range(n_planes)
    )
    return f"(VALUES {rows}) planes(pj, comps)"


def _minhash_sig_sql() -> str:
    mins = ", ".join(
        f"min({minhash_perm_sql('h', k)}) AS mh{k}" for k in range(len(MINHASH_A))
    )
    return f"""
hashes AS (SELECT doc_id, {h32_sql('shingle')} AS h FROM sh),
sig AS (SELECT doc_id, {mins} FROM hashes GROUP BY doc_id)
"""


def _minhash_bands_sql() -> str:
    selects = []
    for b in range(dedup.MINHASH_BANDS):
        cols = [f"mh{b * dedup.MINHASH_ROWS + r}" for r in range(dedup.MINHASH_ROWS)]
        bucket = " || '-' || ".join(cols)
        selects.append(f"SELECT doc_id, {b} AS band, {bucket} AS bucket FROM sig")
    return "bands AS (" + " UNION ALL ".join(selects) + ")"


# ---------------------------------------------------------------------------
# L1 — exact dedup
# ---------------------------------------------------------------------------


@query(
    "l1_exact_dedup",
    oracle="""
    SELECT doc_id,
           md5(text) AS content_hash,
           min(doc_id) OVER w AS canonical_id,
           count(*)   OVER w AS group_size,
           doc_id = min(doc_id) OVER w AS is_canonical
    FROM documents
    WINDOW w AS (PARTITION BY md5(text))
    """,
    tags=("L1",),
)
def l1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup with canonical-id assignment (scale-out J5)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# L2 — near-dup: MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine
# ---------------------------------------------------------------------------


@query(
    "l2_minhash_lsh_pairs",
    oracle=f"""
    WITH {_SHINGLES_CTE}, {_minhash_sig_sql()}, {_minhash_bands_sql()}
    SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
    FROM bands l JOIN bands r
      ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    """,
    tags=("L2",),
)
def l2_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(4x4) candidate near-dup pairs on word 3-grams."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, "doc_id", "text")


@query(
    "l2_incremental_neardup",
    oracle=f"""
    WITH {_SHINGLES_CTE}, {_minhash_sig_sql()}, {_minhash_bands_sql()}
    SELECT DISTINCT CAST(least(l.doc_id, r.doc_id) AS BIGINT) AS id_a,
                    CAST(greatest(l.doc_id, r.doc_id) AS BIGINT) AS id_b
    FROM bands l JOIN bands r
      ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id <> r.doc_id
    WHERE l.doc_id % 2 = 1 OR r.doc_id % 2 = 1
    """,
    tags=("L2", "S8"),
)
def l2_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup dedup (operators/dedup.incremental_neardup_
    pairs): the even-doc_id half of the corpus is the already-indexed
    snapshot (its banded minhash index persisted ONCE at
    band_index_path), the odd half arrives as the increment — only the
    increment is shingled/hashed, then one (band, bucket) equi-join
    against the persisted index yields every candidate pair touching a
    new document. This is the daily-crawl-drop shape at 100 TB: dedup
    cost ∝ |increment|, the indexed corpus's text is never re-read.
    Appending the increment's rows back into the index is
    anti-join-guarded, so a replayed run returns the identical pair set
    (the oracle restates pairs over the FULL corpus restricted to
    ≥1 odd member — equality proves increment-vs-index ≡ one-shot)."""
    import os

    docs = load_table(spark, sf_dir, "documents")
    path = dedup.band_index_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        dedup.build_band_index(
            docs.filter(F.col("doc_id") % 2 == 0), "doc_id", "text", path
        )
    increment = docs.filter(F.col("doc_id") % 2 == 1)
    return dedup.incremental_neardup_pairs(
        spark, path, increment, "doc_id", "text"
    )


@query(
    "l2_span_dedup",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sp AS (
      SELECT doc_id,
             unnest([md5(array_to_string(toks[i:i+7], ' '))
                     for i in generate_series(1, len(toks) - 7)]) AS sh
      FROM tok),
    dup AS (SELECT sh FROM sp GROUP BY sh HAVING count(DISTINCT doc_id) >= 2),
    per AS (
      SELECT sp.doc_id,
             CAST(count(*) AS BIGINT) AS n_spans,
             CAST(count(dup.sh) AS BIGINT) AS n_dup_spans
      FROM sp LEFT JOIN dup USING (sh)
      GROUP BY sp.doc_id)
    SELECT d.doc_id,
           coalesce(n_spans, 0) AS n_spans,
           coalesce(n_dup_spans, 0) AS n_dup_spans,
           CASE WHEN coalesce(n_spans, 0) = 0 THEN 0.0
                ELSE CAST(n_dup_spans AS DOUBLE) / CAST(n_spans AS DOUBLE)
           END AS dup_ratio
    FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    """,
    tags=("L2",),
)
def l2_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication coverage: per document, the fraction of
    its 8-token stride-1 windows whose text also occurs in another
    document (operators/dedup.span_coverage — the Lee et al. ACL'22
    substring-dedup signal; whole-doc dedup misses duplicated passages).
    One explode + one span-hash agg; the join back carries only the
    nd>=2 tail, so the fact-fact join's build side is the rare dup set."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.span_coverage(docs, "doc_id", "text", n=8)


@query(
    "l6_ngram_contamination",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(toks[i:i+4], ' ')
                     for i in generate_series(1, greatest(len(toks) - 4, 1))]))
                 AS shingle
      FROM tok),
    ev AS (
      SELECT DISTINCT s.shingle FROM sh s
      JOIN documents d ON d.doc_id = s.doc_id WHERE d.source = 'src0'),
    tr AS (
      SELECT s.doc_id, s.shingle FROM sh s
      JOIN documents d ON d.doc_id = s.doc_id WHERE d.source <> 'src0')
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN shingle IN (SELECT shingle FROM ev)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           CAST((100 * sum(CASE WHEN shingle IN (SELECT shingle FROM ev)
                                THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
               AS contamination_pct
    FROM tr GROUP BY doc_id
    """,
    tags=("L6", "L2", "L4"),
)
def l6_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded n-gram contamination of the training split (source !=
    'src0') against the eval split (source == 'src0'): per training doc,
    the exact integer percentage of its distinct word 5-grams that occur
    anywhere in the eval set (operators/dedup.contamination_score — the
    GPT-3/PaLM-style n-gram decontamination signal, refining
    l6_decontaminate_against_eval's boolean flag into a thresholdable
    score). Eval grams broadcast; training shingles take one map-side
    indicator join and a single doc-keyed aggregation — one shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    return dedup.contamination_score(train, eval_df, "doc_id", "text", k=5)


@query(
    "l2_simhash_signatures",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
      FROM documents),
    th AS (SELECT doc_id, {h32_sql('token')} AS th FROM tok),
    contrib AS (
      SELECT doc_id, bit,
             CASE WHEN (th >> bit) & 1 = 1 THEN 1 ELSE -1 END AS c
      FROM th, (SELECT unnest(generate_series(0, 31)) AS bit) bits),
    bitsum AS (SELECT doc_id, bit, sum(c) AS s FROM contrib GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END)
                AS BIGINT) AS simhash
    FROM bitsum GROUP BY doc_id
    """,
    tags=("L2",),
)
def l2_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash signature per document."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_signatures(docs, "doc_id", "text")


_SIMHASH_SIG_CTE = """
tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents),
th AS (SELECT doc_id, {h} AS th FROM tok),
contrib AS (
  SELECT doc_id, bit, CASE WHEN (th >> bit) & 1 = 1 THEN 1 ELSE -1 END AS c
  FROM th, (SELECT unnest(generate_series(0, 31)) AS bit) bits),
bitsum AS (SELECT doc_id, bit, sum(c) AS s FROM contrib GROUP BY 1, 2),
sig AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS simhash
  FROM bitsum GROUP BY doc_id)
""".format(h=h32_sql("token"))


SIMHASH_BUCKET_CAP = 100  # hot-bucket cap for the declared query: a band
#                           bucket shared by >100 docs is boilerplate, not a
#                           similarity signal; per-bucket pair volume is
#                           quadratic, so the cap bounds worst-case work
#                           (sf0.01: 94k -> 15k candidate pairs, 267/270
#                           buckets kept). Mirrored in the oracle SQL.


@query(
    "l2_simhash_neardup_pairs",
    oracle=f"""
    WITH {_SIMHASH_SIG_CTE},
    bands AS (
      SELECT doc_id, simhash, band, (simhash >> (band * 8)) & 255 AS bucket
      FROM sig, (SELECT unnest(generate_series(0, 3)) AS band) bs),
    keep AS (
      SELECT band, bucket FROM bands
      GROUP BY band, bucket HAVING count(*) <= {SIMHASH_BUCKET_CAP}),
    kept AS (
      SELECT b.doc_id, b.simhash, b.band, b.bucket
      FROM bands b JOIN keep k ON b.band = k.band AND b.bucket = k.bucket),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
                      l.simhash AS sh_a, r.simhash AS sh_b
      FROM kept l JOIN kept r
        ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id)
    SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
    """,
    tags=("L2",),
)
def l2_simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 3) with 4x8-bit band blocking
    (pigeonhole: <=3 differing bits leave >=1 band equal — exact recall
    among surviving buckets) and the hot-bucket cap that bounds the
    per-bucket quadratic pair volume on skewed corpora. Pairs whose ONLY
    collision is a dropped hot bucket are the (documented) recall cost."""
    docs = load_table(spark, sf_dir, "documents")
    sig = dedup.simhash_signatures(docs, "doc_id", "text")
    return dedup.simhash_neardup_pairs(
        sig, "doc_id", max_hamming=3, max_bucket_size=SIMHASH_BUCKET_CAP
    )


NGRAM_SHINGLE_DF_CAP = 100  # document-frequency cap for the exact-Jaccard
#                             shingle self-join: a 3-gram in d docs yields
#                             d*(d-1)/2 join rows, so one boilerplate gram
#                             in 10k docs would dominate the whole job at
#                             scale. Shingles above the cap leave the
#                             UNIVERSE (intersection AND sizes), mirrored
#                             exactly in the oracle SQL below.


@query(
    "l2_ngram_jaccard_pairs",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    keep AS (
      SELECT shingle FROM sh
      GROUP BY shingle HAVING count(*) <= {NGRAM_SHINGLE_DF_CAP}),
    shc AS (SELECT s.doc_id, s.shingle FROM sh s
            JOIN keep k ON s.shingle = k.shingle),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
    inter AS (
      SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS inter
      FROM shc l JOIN shc r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b, inter, sa.n_sh + sb.n_sh - inter AS uni
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE 100 * inter >= 60 * (sa.n_sh + sb.n_sh - inter)
    """,
    tags=("L2",),
)
def l2_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard >= 0.60 pairs (integer threshold) over the
    non-boilerplate shingle universe: shingles in more than
    NGRAM_SHINGLE_DF_CAP documents are dropped before the self-join,
    bounding the per-shingle quadratic pair fan-out that is otherwise the
    engine's one scale-killer at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold_pct=60,
        max_shingle_df=NGRAM_SHINGLE_DF_CAP,
    )


@query(
    "l2_embedding_neardup_pairs",
    oracle=f"""
    WITH c AS (SELECT vec_id, {_QUANT_VEC} AS qv FROM embeddings),
    buck AS (
      SELECT vec_id, qv, pj // {similarity.EMB_BAND_BITS} AS band,
             CAST(sum(CASE WHEN list_dot_product(qv::DOUBLE[], comps::DOUBLE[]) > 0
                      THEN (CAST(1 AS BIGINT) << (pj % {similarity.EMB_BAND_BITS}))
                      ELSE 0 END) AS BIGINT) AS bucket
      FROM c, {_planes_sql(similarity.EMB_BANDS * similarity.EMB_BAND_BITS, 64)}
      GROUP BY vec_id, qv, pj // {similarity.EMB_BAND_BITS})
    SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b,
           CAST(list_dot_product(l.qv::DOUBLE[], r.qv::DOUBLE[]) AS BIGINT) AS dot_q
    FROM buck l JOIN buck r
      ON l.band = r.band AND l.bucket = r.bucket AND l.vec_id < r.vec_id
    WHERE CAST(list_dot_product(l.qv::DOUBLE[], r.qv::DOUBLE[]) AS BIGINT)
          >= {int(0.40 * similarity.QUANT * similarity.QUANT)}
    """,
    tags=("L2", "L3"),
)
def l2_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup (quantized dot >= 0.40) via banded
    hyperplane-LSH candidates + exact integer-dot verify — the 100 TB
    shape: work is per-(band, bucket), never the O(n^2) all-pairs kernel
    (which survives as the recall oracle in tests/test_llm_ops.py).
    Integer dot products are exact in both engines (products sum to
    < 2^53, so even DuckDB's double path is exact)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_neardup_pairs_bucketed(emb, threshold=0.40)


@query(
    "l2_semantic_neardup_cells",
    oracle="""
    WITH c AS (SELECT vec_id, {QV} AS qv FROM embeddings),
    seeds AS (SELECT vec_id AS sid, qv AS sv FROM c WHERE vec_id % 125 = 0),
    assign AS (
      SELECT c.vec_id, c.qv, s.sid,
             row_number() OVER (
               PARTITION BY c.vec_id
               ORDER BY {DOT_CS} DESC, s.sid ASC) AS rn
      FROM c, seeds s),
    cells AS (SELECT vec_id, qv, sid AS cell FROM assign WHERE rn = 1)
    SELECT l.vec_id AS id_a, r.vec_id AS id_b,
           {DOT_LR} AS dot_q, l.cell AS cell
    FROM cells l JOIN cells r ON l.cell = r.cell AND l.vec_id < r.vec_id
    WHERE {DOT_LR} >= {THR}
    """.format(
        QV=_QUANT_VEC,
        DOT_CS="CAST(list_dot_product(c.qv::DOUBLE[], s.sv::DOUBLE[]) "
        "AS BIGINT)",
        DOT_LR="CAST(list_dot_product(l.qv::DOUBLE[], r.qv::DOUBLE[]) "
        "AS BIGINT)",
        THR=int(0.40 * similarity.QUANT * similarity.QUANT),
    ),
    tags=("L2", "L3"),
)
def l2_semantic_neardup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CELL-SCOPED semantic near-dup (operators/similarity.
    semantic_neardup_cells) — the SemDeDup-style 100 TB shape the decade
    run prescribes for low-threshold embedding dedup: deterministic IVF
    cell assignment (seeds = every 125th id, exact max-dot, smallest-sid
    ties — the same quantizer every l3_ivf query oracles), then EXACT
    within-cell pairs at dot >= 0.40 via the shared block-matmul kernel.
    Cell-boundary pairs are out of scope BY DECLARED SEMANTICS (the
    linear-work trade; the banded l2_embedding_neardup_pairs covers the
    global-scope need), so the oracle is exact: restate the assignment
    and the within-cell self-join. Expected cell size stays ~125 as the
    corpus grows — total pair work ~N x 125, linear."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.semantic_neardup_cells(
        emb, threshold=0.40, seed_modulus=125
    )


@query(
    "l2_semantic_dedup_keep",
    oracle="""
    WITH RECURSIVE c AS (SELECT vec_id, {QV} AS qv FROM embeddings),
    seeds AS (SELECT vec_id AS sid, qv AS sv FROM c WHERE vec_id % 125 = 0),
    assign AS (
      SELECT c.vec_id, c.qv, s.sid,
             row_number() OVER (
               PARTITION BY c.vec_id
               ORDER BY {DOT_CS} DESC, s.sid ASC) AS rn
      FROM c, seeds s),
    cells AS (SELECT vec_id, qv, sid AS cell FROM assign WHERE rn = 1),
    pairs AS (
      SELECT l.vec_id AS id_a, r.vec_id AS id_b
      FROM cells l JOIN cells r ON l.cell = r.cell AND l.vec_id < r.vec_id
      WHERE {DOT_LR} >= {THR}),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(node, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON r.node = e.src),
    cc AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node)
    SELECT e.vec_id,
           COALESCE(cc.cluster_id, e.vec_id) AS cluster_id,
           COALESCE(cc.cluster_id, e.vec_id) = e.vec_id AS kept
    FROM embeddings e LEFT JOIN cc ON e.vec_id = cc.node
    """.format(
        QV=_QUANT_VEC,
        DOT_CS="CAST(list_dot_product(c.qv::DOUBLE[], s.sv::DOUBLE[]) "
        "AS BIGINT)",
        DOT_LR="CAST(list_dot_product(l.qv::DOUBLE[], r.qv::DOUBLE[]) "
        "AS BIGINT)",
        THR=int(0.40 * similarity.QUANT * similarity.QUANT),
    ),
    tags=("L2", "L6"),
)
def l2_semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup end-to-end: the full KEEP decision for every corpus
    vector, not just the near-dup pair list — cell-scoped semantic pairs
    (similarity.semantic_neardup_cells, the linear-work r9 shape), then
    connected components via alternating star contraction (O(log^2 n)
    rounds, operators/components.py) pick one canonical survivor per
    duplicate cluster (the minimum id — deterministic, oracle-able), and
    a left join against the id column marks every vector kept/dropped.
    Singletons keep themselves (cluster_id = own id). This is the row a
    training-data pipeline actually consumes: filter kept, join back to
    payloads. Scale: pairs ~N x modulus (linear), CC rounds log-bounded,
    final join one shuffle on id. The oracle recomputes the same
    fixpoint with a recursive CTE over the same within-cell pairs."""
    from ..operators.components import connected_components_star

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.semantic_neardup_cells(
        emb, threshold=0.40, seed_modulus=125
    ).select("id_a", "id_b")
    cc = connected_components_star(pairs).withColumnRenamed("doc_id", "vec_id")
    return (
        emb.select("vec_id")
        .join(cc, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("cluster_id", "vec_id").alias("cluster_id"),
            (F.coalesce("cluster_id", "vec_id") == F.col("vec_id")).alias(
                "kept"
            ),
        )
    )


@query(
    "l2_neardup_pipeline",
    oracle=f"""
    WITH {_SHINGLES_CTE}, {_minhash_sig_sql()}, {_minhash_bands_sql()},
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r
        ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
    sets AS (SELECT doc_id, list(shingle) AS ls, count(*) AS n_sh
             FROM sh GROUP BY doc_id)
    SELECT c.id_a, c.id_b,
           len(list_intersect(a.ls, b.ls)) AS inter,
           a.n_sh + b.n_sh - len(list_intersect(a.ls, b.ls)) AS uni
    FROM cand c
    JOIN sets a ON a.doc_id = c.id_a
    JOIN sets b ON b.doc_id = c.id_b
    WHERE 100 * len(list_intersect(a.ls, b.ls))
          >= 60 * (a.n_sh + b.n_sh - len(list_intersect(a.ls, b.ls)))
    """,
    tags=("L2",),
)
def l2_neardup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production near-dup shape end-to-end: MinHash-LSH generates
    candidates (sub-quadratic), then exact Jaccard verifies ONLY the
    candidate pairs via per-doc shingle sets — work proportional to
    candidates, never to n^2. This is the composition the full-corpus
    ``l2_ngram_jaccard_pairs`` stands in for at small scale."""
    docs = load_table(spark, sf_dir, "documents")
    cand = dedup.minhash_lsh_pairs(docs, "doc_id", "text")
    sh = dedup.shingles(docs, "doc_id", "text")
    # Verify wire shape (r10 rework — the sf10 decade's worst
    # non-quadratic tail at 21.6 s): the old verify collect_set'd every
    # doc's FULL shingle array and shipped BOTH corpus-sized array
    # tables through the candidate joins — fat rows for every doc, not
    # just candidates, and array_intersect over long arrays outside any
    # vectorized path. Now the corpus leaves the plan FIRST: one
    # map-side LEFT SEMI (candidate doc-id set broadcast) restricts the
    # shingle table to candidate docs, after which everything —
    # intersection as a narrow (id_b, shingle) equi-join (matches ARE
    # the intersection because shingles() emits distinct shingles per
    # doc), map-side partial counts, and the size joins (n_sh from the
    # restricted table is exact: the semi filter is per-doc) — is
    # proportional to |candidates|, never to the corpus. No join hints:
    # every post-restriction side carries runtime sizes AQE can see, so
    # small candidate sets get broadcast joins and a dup-heavy corpus
    # (|cand| ~ N) degrades to plain hash shuffles on the same plan.
    cand = cand.localCheckpoint()  # cut the LSH lineage: 3 consumers below
    cand_docs = (
        cand.select(F.col("id_a").alias("doc_id"))
        .union(cand.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    shc = sh.join(F.broadcast(cand_docs), "doc_id", "left_semi")
    sizes = shc.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        cand.join(shc.select(F.col("doc_id").alias("id_a"), "shingle"), "id_a")
        .join(
            shc.select(F.col("doc_id").alias("id_b"), "shingle"),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "inter",
            (F.col("n_a") + F.col("n_b") - F.col("inter")).alias("uni"),
        )
        .filter(F.lit(100) * F.col("inter") >= F.lit(60) * F.col("uni"))
    )


# ---------------------------------------------------------------------------
# L3 — similarity search
# ---------------------------------------------------------------------------


@query(
    "l3_knn_bruteforce",
    oracle=f"""
    WITH c AS (SELECT vec_id, {_QUANT_VEC} AS qv FROM embeddings),
    q AS (SELECT qv FROM c WHERE vec_id = 0)
    SELECT c.vec_id,
           CAST(list_dot_product(c.qv::DOUBLE[], q.qv::DOUBLE[]) AS BIGINT) AS dot_q
    FROM c, q
    ORDER BY dot_q DESC, vec_id ASC
    LIMIT 20
    """,
    tags=("L3",),
)
def l3_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-20 nearest neighbors of vec_id=0 by quantized cosine;
    TakeOrderedAndProject (per-partition heap, no global sort)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    return similarity.knn_bruteforce(emb, q, k=20)


@query(
    "l3_ann_lsh_bucketed",
    oracle=f"""
    WITH c AS (SELECT vec_id, {_QUANT_VEC} AS qv FROM embeddings),
    buck AS (
      SELECT vec_id, qv,
             sum(CASE WHEN list_dot_product(qv::DOUBLE[], comps::DOUBLE[]) > 0
                      THEN (CAST(1 AS BIGINT) << pj) ELSE 0 END) AS bucket
      FROM c, {_planes_sql(8, 64)}
      GROUP BY vec_id, qv),
    q AS (SELECT qv, bucket FROM buck WHERE vec_id = 0)
    SELECT b.vec_id,
           CAST(list_dot_product(b.qv::DOUBLE[], q.qv::DOUBLE[]) AS BIGINT) AS dot_q
    FROM buck b, q WHERE b.bucket = q.bucket
    ORDER BY dot_q DESC, vec_id ASC
    LIMIT 20
    """,
    tags=("L3",),
)
def l3_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-20 via 8-plane hyperplane-LSH bucketing: score only
    the query's bucket. Recall vs brute force is measured in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    return similarity.ann_lsh_bucketed(emb, q, k=20, n_planes=8, dim=64)


_PROBE_LIST = "[bucket, " + ", ".join(f"xor(bucket, {1 << j})" for j in range(8)) + "]"


@query(
    "l3_ann_lsh_multiprobe",
    oracle=f"""
    WITH c AS (SELECT vec_id, {_QUANT_VEC} AS qv FROM embeddings),
    buck AS (
      SELECT vec_id, qv,
             sum(CASE WHEN list_dot_product(qv::DOUBLE[], comps::DOUBLE[]) > 0
                      THEN (CAST(1 AS BIGINT) << pj) ELSE 0 END) AS bucket
      FROM c, {_planes_sql(8, 64)}
      GROUP BY vec_id, qv),
    q AS (SELECT qv, bucket FROM buck WHERE vec_id = 0),
    probes AS (SELECT qv, unnest({_PROBE_LIST}) AS bucket FROM q)
    SELECT b.vec_id,
           CAST(list_dot_product(b.qv::DOUBLE[], p.qv::DOUBLE[]) AS BIGINT) AS dot_q
    FROM buck b JOIN probes p ON b.bucket = p.bucket
    ORDER BY dot_q DESC, vec_id ASC
    LIMIT 20
    """,
    tags=("L3",),
)
def l3_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe ANN: the query's bucket plus all 8 hamming-1 neighbors
    (one sign bit flipped) — the recall/cost dial for vectors that fall
    near a separating hyperplane. Each corpus vector lives in exactly one
    bucket, so probes never duplicate candidates."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    return similarity.ann_lsh_bucketed(
        emb, q, k=20, n_planes=8, dim=64, multiprobe=8
    )


@query(
    "l3_knn_multiquery",
    oracle=f"""
    WITH c AS (SELECT vec_id, {_QUANT_VEC} AS qv FROM embeddings),
    q AS (SELECT vec_id AS query_id, qv AS qqv FROM c WHERE vec_id % 100 = 0),
    s AS (
      SELECT q.query_id, c.vec_id,
             CAST(list_dot_product(c.qv::DOUBLE[], q.qqv::DOUBLE[]) AS BIGINT)
                 AS dot_q
      FROM c, q),
    r AS (
      SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY dot_q DESC, vec_id ASC) AS rn
      FROM s)
    SELECT query_id, vec_id, dot_q, rn FROM r WHERE rn <= 10
    """,
    tags=("L3",),
)
def l3_knn_multiquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 per query for a query TABLE (every 100th vector) in one
    pass: broadcast query set, map-side scoring, partition-local top-k
    prune, one tiny grouped-top-k shuffle (operators/similarity.py
    ``knn_multiquery``). The batched production shape of
    ``l3_knn_bruteforce``."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return similarity.knn_multiquery(emb, queries, k=10)


@query(
    "l3_radius_search",
    oracle=f"""
    WITH c AS (SELECT vec_id, {_QUANT_VEC} AS qv FROM embeddings),
    q AS (SELECT vec_id AS query_id, qv AS qqv FROM c WHERE vec_id % 100 = 0)
    SELECT q.query_id, c.vec_id,
           CAST(list_dot_product(c.qv::DOUBLE[], q.qqv::DOUBLE[]) AS BIGINT)
               AS dot_q
    FROM c, q
    WHERE list_dot_product(c.qv::DOUBLE[], q.qqv::DOUBLE[]) >= 250000000000
    """,
    tags=("L3",),
)
def l3_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact radius (threshold) search: ALL corpus vectors within a cosine
    radius of each query — quantized dot >= 2.5e11 (~cos 0.25), the
    retrieval-with-threshold primitive top-k can't express (dense
    neighborhoods truncate, sparse ones pad). recall=1 map-only scan:
    query matrix in the scoring closure, per-batch int64 matmul + in-batch
    filter (operators/similarity.radius_search_multiquery); only real
    matches leave the map stage. Self-matches included by contract."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return similarity.radius_search_multiquery(
        emb, queries, min_dot=250_000_000_000
    )


@query(
    "l3_ann_lsh_multiquery",
    oracle=f"""
    WITH c AS (SELECT vec_id, {_QUANT_VEC} AS qv FROM embeddings),
    buck AS (
      SELECT vec_id, qv,
             sum(CASE WHEN list_dot_product(qv::DOUBLE[], comps::DOUBLE[]) > 0
                      THEN (CAST(1 AS BIGINT) << pj) ELSE 0 END) AS bucket
      FROM c, {_planes_sql(8, 64)}
      GROUP BY vec_id, qv),
    q AS (SELECT vec_id AS query_id, qv AS qqv, bucket
          FROM buck WHERE vec_id % 100 = 0),
    s AS (
      SELECT q.query_id, b.vec_id,
             CAST(list_dot_product(b.qv::DOUBLE[], q.qqv::DOUBLE[]) AS BIGINT)
                 AS dot_q
      FROM buck b JOIN q ON b.bucket = q.bucket),
    r AS (
      SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY dot_q DESC, vec_id ASC) AS rn
      FROM s)
    SELECT query_id, vec_id, dot_q, rn FROM r WHERE rn <= 10
    """,
    tags=("L3",),
)
def l3_ann_lsh_multiquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched LSH ANN: the corpus is bucketed once (8 shared deterministic
    hyperplanes), the query table joins on bucket, top-10 per query via
    grouped top-k — per-query probe cost stays one bucket even with a
    thousand queries in flight."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return similarity.ann_lsh_multiquery(emb, queries, k=10)


_DOT = "CAST(list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) AS BIGINT)"


@query(
    "l3_ivf_persisted_probe",
    oracle=f"""
    WITH c AS (SELECT vec_id, {_QUANT_VEC} AS qv FROM embeddings),
    seeds AS (SELECT vec_id AS sid, qv AS sv FROM c WHERE vec_id % 125 = 0),
    assign AS (
      SELECT c.vec_id, c.qv, s.sid,
             row_number() OVER (
               PARTITION BY c.vec_id
               ORDER BY {_DOT.format(a="c.qv", b="s.sv")} DESC, s.sid ASC) AS rn
      FROM c, seeds s),
    cells AS (SELECT vec_id, qv, sid AS cell FROM assign WHERE rn = 1),
    q AS (SELECT qv AS query_qv FROM c WHERE vec_id = 0),
    qrank AS (
      SELECT s.sid AS cell, q.query_qv,
             row_number() OVER (
               ORDER BY {_DOT.format(a="q.query_qv", b="s.sv")} DESC, s.sid ASC) AS rn
      FROM q, seeds s),
    probe AS (SELECT cell, query_qv FROM qrank WHERE rn <= 2)
    SELECT cl.vec_id, {_DOT.format(a="cl.qv", b="p.query_qv")} AS dot_q
    FROM cells cl JOIN probe p ON cl.cell = p.cell
    ORDER BY dot_q DESC, vec_id ASC
    LIMIT 20
    """,
    tags=("L3", "S8"),
)
def l3_ivf_persisted_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-IVF probe (operators/similarity.build_ivf_index /
    ivf_probe_persisted): the celled corpus is written partitioned BY CELL
    once (with the seed table beside it), registered in the catalog, and
    the probe ranks the broadcast seed table then partition-prunes to its
    two nearest cell directories — the same index-once/prune-per-probe
    shape as the LSH index, closing the loop l3_ivf_search's docstring
    promises. Identical oracle to l3_ivf_search: the persisted layout must
    not change a single result."""
    import os

    emb = load_table(spark, sf_dir, "embeddings")
    path = similarity.ivf_index_path(sf_dir)
    if not os.path.exists(os.path.join(path, "cells", "_SUCCESS")):
        similarity.build_ivf_index(emb, path)
    q = emb.filter(F.col("vec_id") == 0)
    return similarity.ivf_probe_persisted(spark, path, q, k=20, n_probe=2)


@query(
    "l3_ivf_add",
    oracle=f"""
    WITH c AS (SELECT vec_id, {_QUANT_VEC} AS qv FROM embeddings),
    seeds AS (SELECT vec_id AS sid, qv AS sv FROM c WHERE vec_id % 125 = 0),
    assign AS (
      SELECT c.vec_id, c.qv, s.sid,
             row_number() OVER (
               PARTITION BY c.vec_id
               ORDER BY {_DOT.format(a="c.qv", b="s.sv")} DESC, s.sid ASC) AS rn
      FROM c, seeds s),
    cells AS (SELECT vec_id, qv, sid AS cell FROM assign WHERE rn = 1),
    q AS (SELECT qv AS query_qv FROM c WHERE vec_id = 0),
    qrank AS (
      SELECT s.sid AS cell, q.query_qv,
             row_number() OVER (
               ORDER BY {_DOT.format(a="q.query_qv", b="s.sv")} DESC, s.sid ASC) AS rn
      FROM q, seeds s),
    probe AS (SELECT cell, query_qv FROM qrank WHERE rn <= 2)
    SELECT cl.vec_id, {_DOT.format(a="cl.qv", b="p.query_qv")} AS dot_q
    FROM cells cl JOIN probe p ON cl.cell = p.cell
    ORDER BY dot_q DESC, vec_id ASC
    LIMIT 20
    """,
    tags=("L3", "S8"),
)
def l3_ivf_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index growth (operators/similarity.ivf_add): the
    index is built from HALF the corpus (all seed ids included — the
    frozen-quantizer precondition), the other half is ADDED as an
    increment (assign-to-frozen-seeds + per-cell append; existing cell
    files untouched), and the probe over the grown index must be
    row-identical to the one-shot full-corpus oracle — proving index
    maintenance costs the increment, never a rebuild. The oracle is
    l3_ivf_persisted_probe's full-corpus SQL verbatim: growth must not
    change a single result."""
    import os as _os

    from ..io import scratch_dir

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter((F.col("vec_id") % 2 == 0) | (F.col("vec_id") % 125 == 0))
    delta = emb.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") % 125 != 0))
    path = _os.path.join(scratch_dir("ivf_add_"), "index")
    similarity.build_ivf_index(base, path)
    similarity.ivf_add(spark, path, delta)
    q = emb.filter(F.col("vec_id") == 0)
    return similarity.ivf_probe_persisted(spark, path, q, k=20, n_probe=2)


@query(
    "l3_ivf_delete",
    oracle=f"""
    WITH c AS (SELECT vec_id, {_QUANT_VEC} AS qv FROM embeddings),
    seeds AS (SELECT vec_id AS sid, qv AS sv FROM c WHERE vec_id % 125 = 0),
    assign AS (
      SELECT c.vec_id, c.qv, s.sid,
             row_number() OVER (
               PARTITION BY c.vec_id
               ORDER BY {_DOT.format(a="c.qv", b="s.sv")} DESC, s.sid ASC) AS rn
      FROM c, seeds s),
    cells AS (SELECT vec_id, qv, sid AS cell FROM assign
              WHERE rn = 1 AND vec_id % 7 <> 3),
    q AS (SELECT qv AS query_qv FROM c WHERE vec_id = 0),
    qrank AS (
      SELECT s.sid AS cell, q.query_qv,
             row_number() OVER (
               ORDER BY {_DOT.format(a="q.query_qv", b="s.sv")} DESC, s.sid ASC) AS rn
      FROM q, seeds s),
    probe AS (SELECT cell, query_qv FROM qrank WHERE rn <= 2)
    SELECT cl.vec_id, {_DOT.format(a="cl.qv", b="p.query_qv")} AS dot_q
    FROM cells cl JOIN probe p ON cl.cell = p.cell
    ORDER BY dot_q DESC, vec_id ASC
    LIMIT 20
    """,
    tags=("L3", "S18"),
)
def l3_ivf_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF deletion (operators/similarity.ivf_delete — the
    third leg of the index lifecycle after build and ivf_add): the full
    corpus is indexed, every ``vec_id % 7 == 3`` vector is deleted, and
    the probe over the maintained index must be row-identical to the
    one-shot oracle over the surviving corpus. Only the cell partitions
    holding deleted ids are rewritten (dynamic partition overwrite;
    fully-emptied cells' stale dirs are dropped) — a deletion costs the
    affected cells, never a rebuild. The quantizer stays frozen, so
    deleting a seed's VECTOR does not un-seed its cell."""
    import os as _os

    from ..io import scratch_dir

    emb = load_table(spark, sf_dir, "embeddings")
    path = _os.path.join(scratch_dir("ivf_del_"), "index")
    similarity.build_ivf_index(emb, path)
    similarity.ivf_delete(
        spark, path, emb.filter(F.col("vec_id") % 7 == 3).select("vec_id")
    )
    q = emb.filter(F.col("vec_id") == 0)
    return similarity.ivf_probe_persisted(spark, path, q, k=20, n_probe=2)


@query(
    "l3_ivf_persisted_multiquery",
    oracle=f"""
    WITH c AS (SELECT vec_id, {_QUANT_VEC} AS qv FROM embeddings),
    seeds AS (SELECT vec_id AS sid, qv AS sv FROM c WHERE vec_id % 125 = 0),
    assign AS (
      SELECT c.vec_id, c.qv, s.sid,
             row_number() OVER (
               PARTITION BY c.vec_id
               ORDER BY {_DOT.format(a="c.qv", b="s.sv")} DESC, s.sid ASC) AS rn
      FROM c, seeds s),
    cells AS (SELECT vec_id, qv, sid AS cell FROM assign WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, qv AS qqv FROM c WHERE vec_id % 100 = 0),
    qrank AS (
      SELECT q.query_id, q.qqv, s.sid AS cell,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY {_DOT.format(a="q.qqv", b="s.sv")} DESC, s.sid ASC) AS rn
      FROM q, seeds s),
    probe AS (SELECT query_id, qqv, cell FROM qrank WHERE rn <= 2),
    scored AS (
      SELECT p.query_id, cl.vec_id,
             {_DOT.format(a="cl.qv", b="p.qqv")} AS dot_q
      FROM cells cl JOIN probe p ON cl.cell = p.cell),
    r AS (
      SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY dot_q DESC, vec_id ASC) AS rn
      FROM scored)
    SELECT query_id, vec_id, dot_q, rn FROM r WHERE rn <= 10
    """,
    tags=("L3", "S8"),
)
def l3_ivf_persisted_multiquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched persisted-IVF probe (operators/similarity.py
    ``ivf_probe_persisted_multiquery``) — the IVF serving twin of
    l3_ann_persisted_multiquery: a query TABLE ranks the broadcast seed
    table per query, keeps its 2 nearest cells, and partition-prunes the
    catalog-registered celled corpus to the union of probed cells.
    Per-query candidate volume stays n_probe cells however large the
    batch; the index build amortizes across every batch."""
    import os

    emb = load_table(spark, sf_dir, "embeddings")
    path = similarity.ivf_index_path(sf_dir)
    if not os.path.exists(os.path.join(path, "cells", "_SUCCESS")):
        similarity.build_ivf_index(emb, path)
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return similarity.ivf_probe_persisted_multiquery(
        spark, path, queries, k=10, n_probe=2
    )


@query(
    "l3_ivf_kmeans_search",
    oracle=None,  # learned quantizer: KMeans fit is iterative + RNG-seeded,
    #               not SQL-expressible — rows-only check by design; the
    #               recall gate vs brute force lives in tests/test_llm_ops.py
    tags=("L3",),
)
def l3_ivf_kmeans_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search with a learned (Spark ML KMeans) coarse quantizer —
    better cell balance than the seed-centroid ``l3_ivf_search`` at the
    cost of oracle-checkability. Same probe contract: top-20 by exact
    quantized dot inside the query's 3 nearest cells (measured recall@20
    ~0.67 at a 3-of-8-cell scan on sf0.01)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    return similarity.ivf_kmeans_search(emb, q, k=20, n_cells=8, n_probe=3)


@query(
    "l3_ann_persisted_probe",
    oracle=f"""
    WITH c AS (SELECT vec_id, {_QUANT_VEC} AS qv FROM embeddings),
    buck AS (
      SELECT vec_id, qv,
             sum(CASE WHEN list_dot_product(qv::DOUBLE[], comps::DOUBLE[]) > 0
                      THEN (CAST(1 AS BIGINT) << pj) ELSE 0 END) AS bucket
      FROM c, {_planes_sql(8, 64)}
      GROUP BY vec_id, qv),
    q AS (SELECT qv, bucket FROM buck WHERE vec_id = 0)
    SELECT b.vec_id,
           CAST(list_dot_product(b.qv::DOUBLE[], q.qv::DOUBLE[]) AS BIGINT) AS dot_q
    FROM buck b, q WHERE b.bucket = q.bucket
    ORDER BY dot_q DESC, vec_id ASC
    LIMIT 20
    """,
    tags=("L3", "S8"),
)
def l3_ann_persisted_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN shape: the LSH index (bucketed corpus) is BUILT
    ONCE and written partitioned by bucket; the search reads the index and
    dynamic partition pruning confines the scan to the query's bucket
    directory. Same results as ``l3_ann_lsh_bucketed`` (identical planes),
    but probe cost is one bucket instead of re-bucketing the corpus per
    query — the index build amortizes across every later search."""
    import os

    emb = load_table(spark, sf_dir, "embeddings")
    path = similarity.ann_index_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        similarity.build_ann_index(emb, path)
    q = emb.filter(F.col("vec_id") == 0)
    return similarity.ann_probe_persisted(spark, path, q, k=20)


@query(
    "l3_ann_persisted_multiquery",
    oracle=f"""
    WITH c AS (SELECT vec_id, {_QUANT_VEC} AS qv FROM embeddings),
    buck AS (
      SELECT vec_id, qv,
             sum(CASE WHEN list_dot_product(qv::DOUBLE[], comps::DOUBLE[]) > 0
                      THEN (CAST(1 AS BIGINT) << pj) ELSE 0 END) AS bucket
      FROM c, {_planes_sql(8, 64)}
      GROUP BY vec_id, qv),
    q AS (SELECT vec_id AS query_id, qv AS qqv, bucket
          FROM buck WHERE vec_id % 100 = 0),
    s AS (
      SELECT q.query_id, b.vec_id,
             CAST(list_dot_product(b.qv::DOUBLE[], q.qqv::DOUBLE[]) AS BIGINT)
                 AS dot_q
      FROM buck b JOIN q ON b.bucket = q.bucket),
    r AS (
      SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY dot_q DESC, vec_id ASC) AS rn
      FROM s)
    SELECT query_id, vec_id, dot_q, rn FROM r WHERE rn <= 10
    """,
    tags=("L3", "S8"),
)
def l3_ann_persisted_multiquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batched persisted-index probe — the serving shape a 100 TB ANN
    deployment actually runs: a query TABLE (every 100th vector)
    partition-prunes the catalog-registered LSH index to the union of its
    bucket directories, top-10 per query
    (operators/similarity.ann_probe_persisted_multiquery). Identical
    oracle to l3_ann_lsh_multiquery: the persisted layout must not change
    a single result vs inline bucketing."""
    import os

    emb = load_table(spark, sf_dir, "embeddings")
    path = similarity.ann_index_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        similarity.build_ann_index(emb, path)
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return similarity.ann_probe_persisted_multiquery(spark, path, queries, k=10)


@query(
    "l2_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE}, {_minhash_sig_sql()}, {_minhash_bands_sql()},
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r
        ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
    sets AS (SELECT doc_id, list(shingle) AS ls, count(*) AS n_sh
             FROM sh GROUP BY doc_id),
    verified AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN sets a ON a.doc_id = c.id_a
                  JOIN sets b ON b.doc_id = c.id_b
      WHERE 100 * len(list_intersect(a.ls, b.ls))
            >= 60 * (a.n_sh + b.n_sh - len(list_intersect(a.ls, b.ls)))),
    edges AS (SELECT id_a AS src, id_b AS dst FROM verified
              UNION SELECT id_b, id_a FROM verified),
    reach(node, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON r.node = e.src),
    cc AS (SELECT node AS doc_id, min(lbl) AS cluster_id
           FROM reach GROUP BY node)
    SELECT doc_id, cluster_id, doc_id = cluster_id AS is_canonical FROM cc
    """,
    tags=("L2",),
)
def l2_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup chain: LSH candidates -> exact-Jaccard verify ->
    connected components -> canonical-per-cluster. Components via
    alternating large-star/small-star contraction (O(log^2 n) rounds,
    diameter-independent — the 100 TB default; operators/components.py);
    the oracle computes the same fixpoint with a recursive CTE, and the
    simpler label-propagation twin must agree (tests/test_llm_ops.py)."""
    from ..operators.components import canonical_members, connected_components_star

    verified = l2_neardup_pipeline(spark, sf_dir).select("id_a", "id_b")
    return canonical_members(connected_components_star(verified))



@query(
    "l3_ivf_search",
    oracle=f"""
    WITH c AS (SELECT vec_id, {_QUANT_VEC} AS qv FROM embeddings),
    seeds AS (SELECT vec_id AS sid, qv AS sv FROM c WHERE vec_id % 125 = 0),
    assign AS (
      SELECT c.vec_id, c.qv, s.sid,
             row_number() OVER (
               PARTITION BY c.vec_id
               ORDER BY {_DOT.format(a="c.qv", b="s.sv")} DESC, s.sid ASC) AS rn
      FROM c, seeds s),
    cells AS (SELECT vec_id, qv, sid AS cell FROM assign WHERE rn = 1),
    q AS (SELECT qv AS query_qv FROM c WHERE vec_id = 0),
    qrank AS (
      SELECT s.sid AS cell, q.query_qv,
             row_number() OVER (
               ORDER BY {_DOT.format(a="q.query_qv", b="s.sv")} DESC, s.sid ASC) AS rn
      FROM q, seeds s),
    probe AS (SELECT cell, query_qv FROM qrank WHERE rn <= 2)
    SELECT cl.vec_id, {_DOT.format(a="cl.qv", b="p.query_qv")} AS dot_q
    FROM cells cl JOIN probe p ON cl.cell = p.cell
    ORDER BY dot_q DESC, vec_id ASC
    LIMIT 20
    """,
    tags=("L3",),
)
def l3_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF similarity search: deterministic seed centroids (vec_id % 125),
    corpus assigned to max-dot cells, query probes its 2 nearest cells.
    At scale the celled corpus is a partitioned table and the probe is
    partition pruning; here the whole index build + probe is one plan."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    return similarity.ivf_search(emb, q, k=20, n_probe=2, seed_modulus=125)


# ---------------------------------------------------------------------------
# L4 — text analysis
# ---------------------------------------------------------------------------


@query(
    "l4_token_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           len(text) AS n_chars,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct_tokens,
           len(toks) + len(regexp_extract_all(text, '[a-z][0-9]|[0-9][a-z]'))
               AS n_tokens_bpe,
           CAST(coalesce(list_sum([len(tk) for tk in toks]), 0) AS BIGINT)
               AS sum_token_len
    FROM t
    """,
    tags=("L4",),
)
def l4_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics (all-integer output)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.token_stats(docs, "doc_id", "text")


@query(
    "l4_bpe_pretokens",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\r]') AS toks
      FROM documents),
    c AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_pretokens,
             CAST(len(list_filter(toks,
                 tk -> regexp_matches(tk, '^[A-Za-z]+$'))) AS BIGINT)
                 AS n_alpha_runs,
             CAST(len(list_filter(toks,
                 tk -> regexp_matches(tk, '^[0-9]$'))) AS BIGINT) AS n_digits
      FROM t)
    SELECT doc_id, n_pretokens, n_alpha_runs, n_digits,
           n_pretokens - n_alpha_runs - n_digits AS n_marks
    FROM c
    """,
    tags=("L4",),
)
def l4_bpe_pretokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-2-style BPE pretokenization counts (operators/text.bpe_pretokens):
    letter runs whole, digits individual, marks individual — the standard
    token-budget estimator for a corpus when the merge table isn't in the
    engine. The class regex is lookaround-free and whitespace-explicit so
    Java regex and RE2 split identically."""
    docs = load_table(spark, sf_dir, "documents")
    return text.bpe_pretokens(docs, "doc_id", "text")


@query(
    "l4_term_stats",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS token FROM documents)
    SELECT token, count(DISTINCT doc_id) AS doc_freq, count(*) AS coll_freq
    FROM tok GROUP BY token
    """,
    tags=("L4",),
)
def l4_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term statistics: document + collection frequency."""
    docs = load_table(spark, sf_dir, "documents")
    return text.term_stats(docs, "doc_id", "text")


@query(
    "l4_ngram_lm",
    oracle=f"""
    WITH tok AS (
      SELECT {_TOKS} AS toks FROM documents),
    bg AS (
      SELECT toks[i] AS l, toks[i + 1] AS r,
             CAST(count(*) AS BIGINT) AS cnt
      FROM tok, unnest(generate_series(1, len(toks) - 1)) AS u(i)
      GROUP BY toks[i], toks[i + 1]),
    wt AS (
      SELECT l, r, cnt,
             CAST(sum(cnt) OVER (PARTITION BY l) AS BIGINT) AS left_total
      FROM bg)
    SELECT l, r, cnt, left_total,
           CAST((1000000 * cnt) // left_total AS BIGINT) AS prob_micros
    FROM wt ORDER BY cnt DESC, l, r LIMIT 100
    """,
    tags=("L4", "A2", "W3"),
)
def l4_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based bigram LM table (operators/text.ngram_counts): the
    top-100 bigrams with exact counts, left-continuation mass, and
    P(r|l) in integer micro-units — the statistic behind perplexity-ish
    quality scoring and n-gram contamination probes over a training
    corpus. One corpus-scale shuffle (map-side-combinable bigram count),
    then vocabulary-sized work only; integer division keeps both engines
    bit-identical (no float reaches the output)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.ngram_counts(docs, "doc_id", "text", top_k=100)


# bigram-LM familiarity CTE chain, shared by the l4_lm_familiarity oracle
# and the curriculum-ordering oracle built on top of it
_LM_FAM_CTES = f"""
    tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    db AS (
      SELECT doc_id, toks[i] AS l, toks[i + 1] AS r
      FROM tok, unnest(generate_series(1, len(toks) - 1)) AS u(i)
      WHERE len(toks) >= 2),
    lm0 AS (
      SELECT l, r, CAST(count(*) AS BIGINT) AS cnt
      FROM db WHERE doc_id % 2 = 0 GROUP BY l, r),
    lm AS (
      SELECT l, r,
             (1000000 * cnt) // CAST(sum(cnt) OVER (PARTITION BY l) AS BIGINT)
                 AS prob_micros
      FROM lm0),
    sc AS (
      SELECT db.doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(CASE WHEN lm.prob_micros IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_unseen,
             CAST(sum(COALESCE(lm.prob_micros, 0)) AS BIGINT) AS sp
      FROM db LEFT JOIN lm ON lm.l = db.l AND lm.r = db.r
      GROUP BY db.doc_id),
    fam AS (
      SELECT d.doc_id,
             CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
             CAST(COALESCE(sc.n_unseen, 0) AS BIGINT) AS n_unseen,
             CAST(CASE WHEN sc.n_bigrams > 0 THEN sc.sp // sc.n_bigrams END
                  AS BIGINT) AS familiarity_micros
      FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id)"""


@query(
    "l4_lm_familiarity",
    oracle=f"""
    WITH {_LM_FAM_CTES}
    SELECT doc_id, n_bigrams, n_unseen, familiarity_micros FROM fam
    """,
    tags=("L4", "A2", "J2"),
)
def l4_lm_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style document scoring under a bigram LM trained on
    the even-doc_id half of the corpus (operators/text.lm_familiarity):
    per document the bigram count, the count of LM-unseen bigrams (the
    novelty/contamination counter), and the mean bigram probability in
    exact integer micro-units — the quality signal that ranks documents
    for training-mix curation without a single float (integer division
    both engines, so hash-exact). One corpus bigram count for the fit,
    one (l, r) equi-join + per-doc aggregate for the scoring."""
    docs = load_table(spark, sf_dir, "documents")
    return text.lm_familiarity(docs, "doc_id", "text", train_mod=2)


@query(
    "l6_curriculum_order",
    oracle=f"""
    WITH {_LM_FAM_CTES},
    tiers AS (
      SELECT doc_id,
             CASE WHEN familiarity_micros IS NULL THEN 3
                  WHEN familiarity_micros >= 200000 THEN 0
                  WHEN familiarity_micros >= 100000 THEN 1
                  WHEN familiarity_micros >= 50000 THEN 2
                  ELSE 3 END AS tier,
             ('0x' || substr(md5('curriculum:' || CAST(doc_id AS VARCHAR)),
                             1, 8))::BIGINT AS hv
      FROM fam)
    SELECT doc_id, CAST(tier AS INTEGER) AS tier,
           CAST(row_number() OVER (ORDER BY tier, hv, doc_id) AS BIGINT)
               AS train_pos
    FROM tiers
    """,
    tags=("L6", "L4", "W1"),
)
def l6_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering for the training mix: documents sort
    easy-to-hard by their bigram-LM familiarity TIER (fixed integer
    thresholds on l4_lm_familiarity's micro-units; unscored/too-short
    docs train last), with a salted-md5 shuffle INSIDE each tier so the
    curriculum doesn't impose a spurious within-tier order — the same
    no-rand() reproducibility discipline as l6_deterministic_shuffle:
    identical order across engines, reruns, and cluster sizes.

    Scale: the global train_pos comes from the two-pass distributed
    prefix (operators/sweep.bucketed_row_number) — bucket = tier‖(high 6
    hash bits), a monotone prefix of the (tier, hv, doc_id) order, so
    the full-data ranking window runs PARALLEL across tier×64 buckets
    and only the bucket-count-sized offset table crosses one task. The
    oracle keeps the textbook single-window row_number; the hash match
    certifies the decomposition is exact (same theorem as
    w8_max_concurrency)."""
    bucketed, ranked = _curriculum_plan(spark, sf_dir)
    try:
        # localCheckpoint (eager) pins the RESULT, so the per-invocation
        # cache can be released before returning — same pattern as
        # embedding_neardup_pairs_bucketed: leaving it pinned for the
        # session would evict longer-lived persisted tables
        return ranked.localCheckpoint()
    finally:
        bucketed.unpersist()


def _curriculum_plan(spark: SparkSession, sf_dir: str):
    """The lazy curriculum plan, pre-checkpoint: returns (the persisted
    bucketed intermediate, the ranked result) so the plan-shape gate can
    inspect the real two-pass-prefix plan (a localCheckpoint would
    truncate it to a Scan ExistingRDD)."""
    from ..operators.sweep import bucketed_row_number

    docs = load_table(spark, sf_dir, "documents")
    fam = text.lm_familiarity(docs, "doc_id", "text", train_mod=2)
    f = F.col("familiarity_micros")
    tiered = fam.select(
        "doc_id",
        F.when(f.isNull(), 3)
        .when(f >= 200000, 0)
        .when(f >= 100000, 1)
        .when(f >= 50000, 2)
        .otherwise(3)
        .cast("int")
        .alias("tier"),
        F.expr(
            "CAST(conv(substr(md5(concat('curriculum:', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        ).alias("hv"),
    )
    # hv is a 32-bit uniform: its high 6 bits are an order-preserving
    # 64-way bucketing; tier*64 + that prefix is monotone in (tier, hv).
    # persist: the two-pass prefix reads its input twice (bucket-local
    # window + bucket-net aggregate), and without the cache each branch
    # re-runs the whole LM-familiarity fit upstream (measured 17x
    # normalized at sf1 vs l4_lm_familiarity's ~3x). The cached table is
    # (doc_id, tier, hv) — manifest-sized, and CacheManager dedupes
    # repeated invocations by canonicalized plan.
    bucketed = tiered.withColumn(
        "bkt",
        (F.col("tier").cast("long") * 64 + F.shiftright(F.col("hv"), 26)).cast("int"),
    ).localCheckpoint()  # eager per-invocation materialization (was a
    # session-pinned persist — see tpch_q15's cache-hygiene note)
    pos = bucketed_row_number(bucketed, "bkt", ["hv", "doc_id"], out_col="train_pos")
    return bucketed, pos.select("doc_id", "tier", "train_pos")


_EN = ", ".join(f"'{w}'" for w in text.LANG_STOPWORDS["en"])


@query(
    "l4_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents),
    m AS (
      SELECT doc_id,
             len(toks) AS n,
             len(list_distinct(toks)) AS nd,
             len(list_intersect(list_distinct(toks), [{_EN}])) AS nstop
      FROM t)
    SELECT doc_id,
           n AS n_tokens,
           CAST(CASE WHEN n > 0 THEN floor(100.0 * nd / n) END AS BIGINT)
               AS ttr_pct,
           CAST(nstop AS BIGINT) AS n_en_stopwords,
           CAST((CASE WHEN n >= 64 THEN 40 WHEN n >= 32 THEN 30
                      WHEN n >= 16 THEN 20 ELSE 5 END)
              + (CASE WHEN n > 0 AND floor(100.0 * nd / n) >= 60 THEN 40
                      WHEN n > 0 AND floor(100.0 * nd / n) >= 30 THEN 25
                      ELSE 10 END)
              + (CASE WHEN nstop >= 2 THEN 20 WHEN nstop >= 1 THEN 10
                      ELSE 0 END) AS BIGINT) AS quality
    FROM m
    """,
    tags=("L4",),
)
def l4_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-banded heuristic quality score."""
    docs = load_table(spark, sf_dir, "documents")
    return text.quality_score(docs, "doc_id", "text")


def _langs_overlap_sql() -> str:
    cols = []
    for lang, ws in sorted(text.LANG_STOPWORDS.items()):
        lst = ", ".join(f"'{w}'" for w in ws)
        cols.append(
            f"len(list_intersect(list_distinct(toks), [{lst}])) AS ov_{lang}"
        )
    return ", ".join(cols)


@query(
    "l4_lang_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    ov AS (SELECT doc_id, {_langs_overlap_sql()} FROM t),
    g AS (SELECT *, greatest(ov_de, ov_en, ov_es, ov_fr) AS best FROM ov)
    SELECT doc_id,
           CASE WHEN best = 0 THEN 'und'
                WHEN ov_de = best THEN 'de'
                WHEN ov_en = best THEN 'en'
                WHEN ov_es = best THEN 'es'
                ELSE 'fr' END AS pred_lang,
           CAST(best AS BIGINT) AS lang_score
    FROM g
    """,
    tags=("L4",),
)
def l4_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language ID with deterministic lang-asc tie-break
    (the SQL CASE tests languages in ascending order, matching the Spark
    argmax's neg-rank tie-break)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.lang_id(docs, "doc_id", "text")


@query(
    "l4_fingerprint",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    h AS (SELECT doc_id, len(toks) AS n,
                 [{h16_sql('tk')} for tk in toks] AS hs,
                 least(8, len(toks)) AS win
          FROM t)
    SELECT doc_id,
           n AS n_tokens,
           CASE WHEN n > 0 THEN list_min([
             CAST(list_sum([hs[s + i] * CAST(power(31, win - 1 - i) AS BIGINT)
                            for i in generate_series(0, win - 1)]) AS BIGINT)
             for s in generate_series(1, n - win + 1)]) END AS fingerprint
    FROM h
    """,
    tags=("L4",),
)
def l4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style rolling-hash fingerprint (min 8-token window
    polynomial hash, 16-bit token hashes)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.fingerprint(docs, "doc_id", "text")


@query(
    "l4_tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT token, count(DISTINCT doc_id) AS doc_freq FROM tok GROUP BY 1),
    ranked AS (
      SELECT tf.doc_id, tf.token, tf.tf, df.doc_freq,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf DESC, df.doc_freq ASC,
                                         tf.token ASC) AS rn
      FROM tf JOIN df ON tf.token = df.token)
    SELECT doc_id, token, tf, doc_freq, rn FROM ranked WHERE rn <= 3
    """,
    tags=("L4",),
)
def l4_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-shaped top terms: per-doc term frequency joined to the
    (tiny, broadcast) document-frequency table, top-3 per doc ranked by
    (tf desc, rarity asc, token asc) — integer ranking, no float idf, so
    the oracle hash is exact."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(text.tokens(F.col("text"))).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("doc_freq"))
    ranked = tf.join(F.broadcast(df_), "token").withColumn(
        "rn",
        F.row_number()
        .over(
            Window.partitionBy("doc_id").orderBy(
                F.col("tf").desc(), F.col("doc_freq").asc(), F.col("token").asc()
            )
        )
        .cast("long"),
    )
    return ranked.filter(F.col("rn") <= 3).select(
        "doc_id", "token", "tf", "doc_freq", "rn"
    )


_BUCKET_SQL = "(('0x' || substr(md5('{salt}:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)"


@query(
    "l6_train_val_test_split",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN {_BUCKET_SQL.format(salt="split")} < 80 THEN 'train'
                WHEN {_BUCKET_SQL.format(salt="split")} < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    tags=("L4", "L1"),
)
def l6_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split by key hash (operators/sampling):
    the same document lands in the same split on any engine or rerun —
    reproducible, joinable, leakage-auditable."""
    from ..operators.sampling import train_val_test_split

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return train_val_test_split(docs, "doc_id", train_pct=80, val_pct=10)


@query(
    "l6_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang FROM documents
    WHERE {_BUCKET_SQL.format(salt="sample")} <
          CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 20 WHEN 'fr' THEN 20
                    WHEN 'es' THEN 20 WHEN 'zh' THEN 20 ELSE 0 END
    """,
    tags=("L4", "L1"),
)
def l6_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: 50% of English docs, 20% of
    each other language — selection a pure function of (doc, stratum),
    so backfills reproduce the identical sample."""
    from ..operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(
        docs, "doc_id",
        fractions={"en": 50, "de": 20, "fr": 20, "es": 20, "zh": 20},
        strata_col="lang",
    )


@query(
    "l6_oversample_mix",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang,
             CASE lang WHEN 'en' THEN 250 WHEN 'de' THEN 100 WHEN 'fr' THEN 50
                       WHEN 'es' THEN 125 WHEN 'zh' THEN 200 ELSE 0 END AS wt,
             {_BUCKET_SQL.format(salt="mix")} AS b
      FROM documents),
    n AS (
      SELECT doc_id, lang,
             (wt // 100) + CASE WHEN b < wt % 100 THEN 1 ELSE 0 END AS n_copies
      FROM w)
    SELECT doc_id, lang,
           CAST(unnest(generate_series(0, n_copies - 1)) AS BIGINT) AS copy_id
    FROM n WHERE n_copies > 0
    """,
    tags=("L4", "L1"),
)
def l6_oversample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix with fractional EPOCH weights — en 2.5x, zh 2.0x,
    es 1.25x, de 1.0x, fr 0.5x (operators/sampling.oversample_mix): every
    row gets floor(w) copies and carries the fractional epoch iff its
    salted hash bucket < frac(w), so the realized mix is exact in
    expectation and bit-reproducible. The op subsumption test: weights
    below 1 reduce to stratified subsampling, above 1 to deterministic
    repetition with distinct copy_ids."""
    from ..operators.sampling import oversample_mix

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return oversample_mix(
        docs, "doc_id",
        weights_pct={"en": 250, "de": 100, "fr": 50, "es": 125, "zh": 200},
        strata_col="lang",
    )


@query(
    "l6_decontaminate_against_eval",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    eval_sh AS (
      SELECT DISTINCT s.shingle FROM sh s
      JOIN documents d ON d.doc_id = s.doc_id WHERE d.source = 'src0'),
    contaminated AS (
      SELECT DISTINCT s.doc_id FROM sh s
      JOIN eval_sh e ON s.shingle = e.shingle
      JOIN documents d ON d.doc_id = s.doc_id WHERE d.source <> 'src0')
    SELECT d.doc_id, d.source,
           d.doc_id IN (SELECT doc_id FROM contaminated) AS is_contaminated
    FROM documents d WHERE d.source <> 'src0'
    """,
    tags=("L2", "L4"),
)
def l6_decontaminate_against_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents (source !=
    'src0') sharing any word 3-gram with the eval set (source == 'src0').
    The eval shingle set is the broadcast side of a semi-join against the
    training shingles — at 100 TB the training side streams through it
    map-side."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.shingles(docs, "doc_id", "text")
    eval_ids = docs.filter(F.col("source") == "src0").select("doc_id")
    train = docs.filter(F.col("source") != "src0")
    eval_sh = sh.join(eval_ids, "doc_id", "left_semi").select("shingle").distinct()
    contaminated = (
        sh.join(train.select("doc_id"), "doc_id", "left_semi")
        .join(F.broadcast(eval_sh), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_contaminated", F.lit(True))
    )
    return (
        train.select("doc_id", "source")
        .join(contaminated, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("is_contaminated", F.lit(False)).alias("is_contaminated"),
        )
    )


@query(
    "l6_sequence_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len({_TOKS}) AS n_tokens FROM documents)
    SELECT doc_id, n_tokens,
           CAST(floor((sum(n_tokens) OVER (ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) - n_tokens) / 2048.0)
                AS BIGINT) AS bin_id
    FROM t
    """,
    tags=("L4",),
)
def l6_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into 2048-token training bins by contiguous fill
    (operators/sampling.sequence_packing_bins): one cumsum window, fully
    deterministic — the distributed stand-in for sequential first-fit."""
    from ..operators.sampling import sequence_packing_bins

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", F.size(text.tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    return sequence_packing_bins(sized, "doc_id", "n_tokens", capacity=2048)


@query(
    "l6_exact_stratified_take",
    oracle="""
    WITH h AS (
      SELECT doc_id, source,
             ('0x' || substr(md5('take:' || CAST(doc_id AS VARCHAR)),
                             1, 8))::BIGINT AS hv
      FROM documents),
    r AS (
      SELECT doc_id, source,
             CAST(row_number() OVER (PARTITION BY source
                                     ORDER BY hv, doc_id) AS BIGINT)
                 AS take_rank
      FROM h)
    SELECT doc_id, source, take_rank FROM r WHERE take_rank <= 15
    """,
    tags=("L6", "W1"),
)
def l6_exact_stratified_take(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified sampling: EXACTLY 15 documents per source
    (or all of them when a stratum is smaller), chosen by salted-hash
    rank so the quota sample is a pure function of the keys —
    reproducible on any engine, unlike fraction-based sampleBy which
    only hits the quota in expectation. This is the eval-set / ablation
    carve-out primitive (fixed-size per-domain samples).

    Scale: per-stratum ranking is the classic low-cardinality-key trap
    (20 sources would serialize the corpus through 20 tasks); the rank
    comes from operators/sweep.bucketed_row_number instead — hash-prefix
    buckets inside each stratum run the ranking window parallel across
    source×64 buckets, with only the tiny bucket-count table crossing
    one task. The oracle states the textbook per-stratum row_number; the
    hash match certifies the decomposition."""
    from ..operators.sweep import bucketed_row_number

    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id",
        "source",
        F.expr(
            "CAST(conv(substr(md5(concat('take:', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        ).alias("hv"),
    ).withColumn("bkt", F.shiftright(F.col("hv"), 26).cast("int"))
    ranked = bucketed_row_number(
        hashed, "bkt", ["hv", "doc_id"], out_col="take_rank", part_cols=("source",)
    )
    return ranked.filter(F.col("take_rank") <= 15).select(
        "doc_id", "source", "take_rank"
    )


@query(
    "l6_chunk_and_pack",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len({_TOKS}) AS n FROM documents),
    c AS (
      SELECT doc_id, i AS chunk_id,
             greatest(least(64, n - i * 64), 0) AS chunk_tokens
      FROM t, unnest(generate_series(0, greatest((n + 63) // 64, 1) - 1))
               AS u(i)),
    p AS (
      SELECT doc_id, chunk_id, CAST(chunk_tokens AS BIGINT) AS chunk_tokens,
             sum(chunk_tokens) OVER (ORDER BY doc_id, chunk_id
                                     ROWS UNBOUNDED PRECEDING) AS cum
      FROM c)
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, chunk_tokens,
           CAST(floor((cum - chunk_tokens) / 256.0) AS BIGINT) AS bin_id
    FROM p
    """,
    tags=("L6", "L4", "F10"),
)
def l6_chunk_and_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-then-pack: documents longer than the 64-token chunk cap
    split into consecutive ≤64-token chunks (the upstream chunking step
    sequence_packing's contract assumes), then every chunk packs into
    256-token training bins by distributed contiguous fill. Closes the
    oversize-document spill hole: after chunking, NO bin can exceed
    capacity + cap − 1 tokens, and a document's chunks stay adjacent in
    bin order (addressed by doc_id‖chunk_id), so attention-mask
    reconstruction downstream stays contiguous.

    Scale: the chunk explode is map-side (sequence + posexplode, bounded
    by ceil(len/cap) per doc); packing is the two-pass distributed
    prefix, never a global cumsum window. Zero-token documents keep one
    empty chunk so corpus row accounting stays exact."""
    from ..operators.sampling import sequence_packing_bins

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", F.size(text.tokens(F.col("text"))).cast("long").alias("n")
    )
    chunks = sized.select(
        "doc_id",
        F.posexplode(
            F.sequence(
                F.lit(0).cast("long"),
                F.expr("greatest((n + 63) div 64, 1)") - 1,
            )
        ).alias("chunk_id", "_i"),
        "n",
    ).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.greatest(
            F.least(F.lit(64), F.col("n") - F.col("chunk_id") * 64), F.lit(0)
        )
        .cast("long")
        .alias("chunk_tokens"),
    )
    # composite numeric key preserving (doc_id, chunk_id) order: chunk
    # count per doc is bounded by ceil(max_len/64) << 1024
    keyed = chunks.withColumn(
        "pack_key", F.col("doc_id") * 1024 + F.col("chunk_id")
    )
    packed = sequence_packing_bins(keyed, "pack_key", "chunk_tokens", capacity=256)
    return (
        packed.withColumn("doc_id", F.expr("pack_key div 1024"))
        .withColumn("chunk_id", F.col("pack_key") % 1024)
        .select("doc_id", "chunk_id", "chunk_tokens", "bin_id")
    )


# First-fit oracle plumbing: the 1-BASED index of the first bin with room
# for the incoming document, else one past the end (open a new bin). Used
# three times in the recursive step, so built once here.
_FF_CAP = 2048
_FF_SHARDS = 8
_FF_CHOSEN = (
    "coalesce(list_min([i for i in generate_series(1, len(ff.loads)) "
    f"if ff.loads[i] + o.n_tokens <= {_FF_CAP}]), len(ff.loads) + 1)"
)


@query(
    "l6_sequence_packing_firstfit",
    oracle=f"""
    WITH RECURSIVE t AS (
      SELECT doc_id, len({_TOKS}) AS n_tokens, doc_id % {_FF_SHARDS} AS shard
      FROM documents),
    o AS (
      SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      FROM t),
    ff(shard, rn, doc_id, n_tokens, bin_id, loads) AS (
      SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT), [n_tokens]
      FROM o WHERE rn = 1
      UNION ALL
      SELECT o.shard, o.rn, o.doc_id, o.n_tokens,
             CAST({_FF_CHOSEN} - 1 AS BIGINT),
             CASE WHEN {_FF_CHOSEN} <= len(ff.loads)
                  THEN list_transform(generate_series(1, len(ff.loads)),
                         i -> CASE WHEN i = {_FF_CHOSEN}
                                   THEN ff.loads[i] + o.n_tokens
                                   ELSE ff.loads[i] END)
                  ELSE list_append(ff.loads, o.n_tokens) END
      FROM ff JOIN o ON o.shard = ff.shard AND o.rn = ff.rn + 1)
    SELECT doc_id, n_tokens, CAST(shard AS BIGINT) AS shard, bin_id FROM ff
    """,
    tags=("L4",),
)
def l6_sequence_packing_firstfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit packing into 2048-token bins, sharded 8 ways by doc_id
    (operators/sampling.sequence_packing_firstfit): bins respect capacity
    and later small docs back-fill earlier bins — tighter than the
    contiguous cut of ``l6_sequence_packing``. The oracle replays the
    EXACT sequential first-fit decision process per shard with a recursive
    CTE carrying the bin-load list as state, so every placement (not just
    aggregate utilization) is hash-checked."""
    from ..operators.sampling import sequence_packing_firstfit

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", F.size(text.tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    return sequence_packing_firstfit(
        sized, "doc_id", "n_tokens", capacity=_FF_CAP, n_shards=_FF_SHARDS
    )


@query(
    "l7_training_corpus_pipeline",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE}, {_minhash_sig_sql()}, {_minhash_bands_sql()},
    -- stage 1: quality gate (>= 16 tokens)
    quality AS (
      SELECT doc_id FROM documents WHERE len({_TOKS}) >= 16),
    -- stage 2: exact dedup (keep min doc_id per content hash)
    exact_kept AS (
      SELECT doc_id FROM (
        SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS canon
        FROM documents) WHERE doc_id = canon),
    -- stage 3: near-dup clusters -> keep canonical members only
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r
        ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
    sets AS (SELECT doc_id, list(shingle) AS ls, count(*) AS n_sh
             FROM sh GROUP BY doc_id),
    verified AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN sets a ON a.doc_id = c.id_a
                  JOIN sets b ON b.doc_id = c.id_b
      WHERE 100 * len(list_intersect(a.ls, b.ls))
            >= 60 * (a.n_sh + b.n_sh - len(list_intersect(a.ls, b.ls)))),
    edg AS (SELECT id_a AS src, id_b AS dst FROM verified
            UNION SELECT id_b, id_a FROM verified),
    reach(node, lbl) AS (
      SELECT src, src FROM edg
      UNION SELECT e.dst, r.lbl FROM reach r JOIN edg e ON r.node = e.src),
    noncanon AS (
      SELECT node AS doc_id FROM reach GROUP BY node
      HAVING node <> min(lbl)),
    -- stage 4: decontamination against the eval split (source = 'src0')
    eval_sh AS (
      SELECT DISTINCT s.shingle FROM sh s
      JOIN documents d ON d.doc_id = s.doc_id WHERE d.source = 'src0'),
    contaminated AS (
      SELECT DISTINCT s.doc_id FROM sh s JOIN eval_sh e ON s.shingle = e.shingle),
    -- stage 5: surviving training docs get the deterministic split
    survivors AS (
      SELECT d.doc_id, d.lang FROM documents d
      WHERE d.source <> 'src0'
        AND d.doc_id IN (SELECT doc_id FROM quality)
        AND d.doc_id IN (SELECT doc_id FROM exact_kept)
        AND d.doc_id NOT IN (SELECT doc_id FROM noncanon)
        AND d.doc_id NOT IN (SELECT doc_id FROM contaminated))
    SELECT doc_id, lang,
           CASE WHEN {_BUCKET_SQL.format(salt="split")} < 80 THEN 'train'
                WHEN {_BUCKET_SQL.format(salt="split")} < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM survivors
    """,
    tags=("L1", "L2", "L4"),
)
def l7_training_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data pipeline composed end-to-end: quality gate
    -> exact dedup -> near-dup clustering (keep canonical) -> benchmark
    decontamination -> deterministic split. Each stage is the operator
    already verified in isolation; this query proves they compose (the
    oracle recomputes all five stages in one SQL statement)."""
    from ..operators.components import connected_components
    from ..operators.sampling import train_val_test_split

    docs = load_table(spark, sf_dir, "documents")
    quality = text.quality_score(docs, "doc_id", "text").filter(
        F.col("n_tokens") >= 16
    ).select("doc_id")
    exact_kept = (
        dedup.exact_dedup(docs, "doc_id", "text")
        .filter(F.col("is_canonical"))
        .select("doc_id")
    )
    verified = l2_neardup_pipeline(spark, sf_dir).select("id_a", "id_b")
    noncanon = (
        connected_components(verified)
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    sh = dedup.shingles(docs, "doc_id", "text")
    eval_sh = (
        sh.join(
            docs.filter(F.col("source") == "src0").select("doc_id"),
            "doc_id",
            "left_semi",
        )
        .select("shingle")
        .distinct()
    )
    contaminated = (
        sh.join(F.broadcast(eval_sh), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
    )
    survivors = (
        docs.filter(F.col("source") != "src0")
        .join(quality, "doc_id", "left_semi")
        .join(exact_kept, "doc_id", "left_semi")
        .join(noncanon, "doc_id", "left_anti")
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "lang")
    )
    return train_val_test_split(survivors, "doc_id", train_pct=80, val_pct=10)


# ---------------------------------------------------------------------------
# L5 — multimodal columns
# ---------------------------------------------------------------------------


@query(
    "l5_multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS byte_len,
           CAST(list_sum([ascii(substr(text, i, 1))
                          for i in generate_series(1, strlen(text))]) % 997
               AS BIGINT) AS checksum,
           CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
           CAST(ascii(substr(text, strlen(text), 1)) AS BIGINT) AS last_byte
    FROM documents
    """,
    tags=("L5",),
)
def l5_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction through the real mapInPandas
    plumbing (Arrow batches); payload = UTF-8 bytes of ascii text, so the
    oracle recomputes the byte stats from the source column."""
    docs = load_table(spark, sf_dir, "documents")
    mm = multimodal.attach_payload(docs, "doc_id", "text")
    return multimodal.byte_features(mm, "doc_id")


@query(
    "l4_repetition_stats",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g AS (
      SELECT doc_id, len(toks) AS n,
             [array_to_string(toks[i:i+2], ' ')
              for i in generate_series(1, greatest(len(toks) - 2, 1))] AS grams
      FROM tok)
    SELECT doc_id,
           CAST(greatest(n - 2, least(n, 1)) AS BIGINT) AS n_grams,
           CAST(CASE WHEN n > 0 THEN len(list_distinct(grams)) ELSE 0 END
                AS BIGINT) AS n_distinct_grams,
           CAST(CASE WHEN n > 0 THEN floor(
                  100 * (greatest(n - 2, least(n, 1)) - len(list_distinct(grams)))
                      / greatest(n - 2, least(n, 1)))
                ELSE 0 END AS BIGINT) AS dup_gram_pct
    FROM g
    """,
    tags=("L4",),
)
def l4_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition (duplicate word-3-gram percentage) — the
    standard signal for boilerplate/spam/generation-loop documents in LLM
    corpus filtering. Map-only; integer outputs."""
    docs = load_table(spark, sf_dir, "documents")
    return text.repetition_stats(docs, "doc_id", "text")


def _gopher_oracle() -> str:
    t = text
    return f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    s AS (
      SELECT doc_id, len(toks) AS n,
             coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS sum_len,
             len(list_filter(toks, x -> regexp_full_match(x, '[^a-zA-Z0-9]+'))) AS n_sym
      FROM tok)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_words,
           CAST(CASE WHEN n > 0 THEN floor(sum_len / n) ELSE 0 END AS BIGINT)
               AS mean_word_len,
           CAST(n_sym AS BIGINT) AS n_symbol_tokens,
           (n >= {t.GOPHER_MIN_WORDS} AND n <= {t.GOPHER_MAX_WORDS}) AS ok_word_count,
           (CASE WHEN n > 0 THEN floor(sum_len / n) ELSE 0 END
              BETWEEN {t.GOPHER_MIN_MEAN_WORD_LEN} AND {t.GOPHER_MAX_MEAN_WORD_LEN})
               AS ok_mean_word_len,
           (100 * n_sym <= {t.GOPHER_MAX_SYMBOL_PCT} * n) AS ok_symbol_ratio,
           ((n >= {t.GOPHER_MIN_WORDS} AND n <= {t.GOPHER_MAX_WORDS})
            AND (CASE WHEN n > 0 THEN floor(sum_len / n) ELSE 0 END
                   BETWEEN {t.GOPHER_MIN_MEAN_WORD_LEN} AND {t.GOPHER_MAX_MEAN_WORD_LEN})
            AND (100 * n_sym <= {t.GOPHER_MAX_SYMBOL_PCT} * n)) AS keep
    FROM s
    """


@query(
    "l4_gopher_rules",
    oracle=_gopher_oracle(),
    tags=("L4",),
)
def l4_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite rule-based quality filter (Gopher/MassiveText heuristics
    class): word-count window, mean-word-length window, symbol-token cap —
    per-rule booleans plus the combined keep flag for auditability."""
    docs = load_table(spark, sf_dir, "documents")
    return text.gopher_rules(docs, "doc_id", "text")


@query(
    "l4_boilerplate_shingles",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    with_group AS (
      SELECT s.doc_id, s.shingle, d.source
      FROM sh s JOIN documents d ON d.doc_id = s.doc_id)
    SELECT source, shingle, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM with_group
    GROUP BY source, shingle
    HAVING count(DISTINCT doc_id) >= 2
    """,
    tags=("L4", "L2"),
)
def l4_boilerplate_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate detection: word 3-grams repeated across >=2
    documents of the same source are template chrome (site navigation,
    footers) — the standard web-corpus cleanup stage before dedup. One
    explode + one hash aggregation; callers anti-join to strip."""
    docs = load_table(spark, sf_dir, "documents")
    return text.boilerplate_shingles(docs, "doc_id", "text", "source", min_docs=2)


@query(
    "l4_redact_pii",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             'contact user' || CAST(doc_id AS VARCHAR) || '@example.com ' || text
               AS text
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{text.EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           substr(regexp_replace(text, '{text.EMAIL_RE}', '[EMAIL]', 'g'), 1, 60)
               AS redacted_head
    FROM t
    """,
    tags=("L4",),
)
def l4_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails as the representative class): inject one
    deterministic address per document — the corpus has none — then mask
    and count with the same RE2-compatible regex in both engines. At
    100 TB this is a pure map stage, no shuffle at all."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com "),
            F.col("text"),
        ).alias("text"),
    )
    red = text.redact_pii(docs, "doc_id", "text")
    return red.select(
        "doc_id", "n_emails", F.substring("redacted", 1, 60).alias("redacted_head")
    )


def _l5_frame_sample_oracle() -> str:
    fl = multimodal.VID_FRAME_LEN
    mf = multimodal.VID_MAX_FRAMES
    return f"""
    SELECT doc_id,
           CAST(i - 1 AS BIGINT) AS frame_idx,
           CAST(({fl} * (ascii(substr(text, i, 1)) % 256)) % 997 AS BIGINT)
               AS frame_checksum
    FROM documents, generate_series(1, {mf}) t(i)
    WHERE i <= least(length(text), {mf}) AND (i - 1) % 4 = 0
    """


@query(
    "l5_frame_sample",
    oracle=_l5_frame_sample_oracle(),
    tags=("L5",),
)
def l5_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling through the real mapInPandas plumbing: walk a
    frame container (deterministic fake — real codecs absent, see
    operators/multimodal.encode_video), keep every 4th frame, emit
    per-frame checksums. The oracle predicts each sampled checksum
    arithmetically from the text the fixture frames were built from, so a
    wrong frame offset or stride hash-fails."""
    docs = load_table(spark, sf_dir, "documents")
    video = multimodal.synthesize_video(docs, "doc_id", "text")
    return multimodal.frame_sample(video, every_n=4)


@query(
    "l5_media_decode",
    oracle="""
    WITH t AS (
      SELECT doc_id, length(text) AS n_chars,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents)
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image/png'
                           WHEN 1 THEN 'image/jpeg'
                           ELSE 'image/gif' END AS media_format,
           CAST(n_chars % 640 + 16 AS BIGINT) AS width,
           CAST(n_tokens % 480 + 16 AS BIGINT) AS height
    FROM t
    """,
    tags=("L5",),
)
def l5_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real media header decode end-to-end: synthesize structurally valid
    PNG/JPEG/GIF payloads (dimensions derived from the text), then parse
    format + width + height back out of the raw bytes with the pure-Python
    header parsers (operators/multimodal.decode_media) inside mapInPandas.
    Encoder and parser are independent code paths and the oracle predicts
    the dimensions arithmetically, so a wrong endianness, marker walk, or
    offset on either side hash-fails."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.synthesize_media(docs, "doc_id", "text")
    return multimodal.media_dimensions(media, "doc_id")


@query(
    "l5_pixel_features",
    oracle="""
    WITH dims AS (
      SELECT doc_id, length(text) % 16 + 4 AS w, doc_id % 12 + 4 AS h
      FROM documents),
    px AS (
      SELECT d.doc_id, d.w, d.h,
             (d.doc_id * 7 + x.x * 3 + y.y * 5) % 256 AS r,
             (d.doc_id * 7 + x.x * 3 + y.y * 5 + 11) % 256 AS g,
             (d.doc_id * 7 + x.x * 3 + y.y * 5 + 22) % 256 AS b
      FROM dims d
      JOIN generate_series(0, 19) x(x) ON x.x < d.w
      JOIN generate_series(0, 15) y(y) ON y.y < d.h)
    SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(sum(r) AS BIGINT) AS sum_r,
           CAST(sum(g) AS BIGINT) AS sum_g,
           CAST(sum(b) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id, w, h
    """,
    tags=("L5",),
)
def l5_pixel_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode end-to-end (the round-2 stub, closed): synthesize
    a genuine compressed PNG per document — deflate-compressed IDAT,
    CRC'd chunks, all five scanline filters — with pixel (x,y,c) =
    (doc_id*7 + x*3 + y*5 + c*11) % 256, then recover per-channel integer
    sums by FULL decode (inflate + CRC verify + unfilter) inside
    mapInPandas (operators/multimodal.decode_png_pixels). The oracle
    recomputes the sums arithmetically from the closed form without
    touching bytes, so any codec defect — wrong filter inverse, row
    offset, channel order — hash-fails. Encoder applies forward filters,
    decoder inverts them: independent transforms, not a shared shortcut."""
    docs = load_table(spark, sf_dir, "documents")
    png = multimodal.synthesize_png(docs, "doc_id", "text")
    return multimodal.pixel_features(png, "doc_id")


@query(
    "l5_ahash_buckets",
    oracle="""
    WITH dims AS (
      SELECT doc_id, length(text) % 16 + 4 AS w, doc_id % 12 + 4 AS h
      FROM documents),
    px AS (
      SELECT d.doc_id,
             (d.doc_id * 7 + x.x * 3 + y.y * 5) % 256
           + (d.doc_id * 7 + x.x * 3 + y.y * 5 + 11) % 256
           + (d.doc_id * 7 + x.x * 3 + y.y * 5 + 22) % 256 AS inten,
             (x.x * 4) // d.w AS cx,
             (y.y * 4) // d.h AS cy
      FROM dims d
      JOIN generate_series(0, 19) x(x) ON x.x < d.w
      JOIN generate_series(0, 15) y(y) ON y.y < d.h),
    tot AS (
      SELECT doc_id, CAST(sum(inten) AS BIGINT) AS ts,
             CAST(count(*) AS BIGINT) AS tn
      FROM px GROUP BY doc_id),
    cell AS (
      SELECT doc_id, cy, cx, CAST(sum(inten) AS BIGINT) AS cs,
             CAST(count(*) AS BIGINT) AS cn
      FROM px GROUP BY doc_id, cy, cx),
    bits AS (
      SELECT c.doc_id, c.cy, c.cx,
             CASE WHEN c.cs * t.tn >= t.ts * c.cn THEN '1' ELSE '0' END AS b
      FROM cell c JOIN tot t USING (doc_id)),
    hashes AS (
      SELECT doc_id, string_agg(b, '' ORDER BY cy, cx) AS ahash_bits
      FROM bits GROUP BY doc_id)
    SELECT ahash_bits, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id
    FROM hashes GROUP BY ahash_bits
    ORDER BY n_docs DESC, ahash_bits LIMIT 20
    """,
    tags=("L5", "L2"),
)
def l5_ahash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal near-dup grouping: perceptual average-hash over REAL
    decoded PNG pixels (operators/multimodal.ahash_bits — inflate + CRC +
    unfilter, then integer block-mean thresholding), bucketed by hash,
    top-20 buckets. The image twin of the text dedup signatures: a
    re-encoded/resized copy of the same picture lands in the same bucket
    because the hash block-normalizes resolution and the threshold is a
    division-free BIGINT cross-multiplication. The oracle recomputes the
    identical hash arithmetically from the fixture's closed-form pixels
    (never touching bytes), so a single wrong filter inverse, row
    offset, or rounding choice anywhere in codec or hash hash-fails.
    Scale: decode+hash are map-side over the payload column; only the
    16-char hash shuffles for the bucket count."""
    docs = load_table(spark, sf_dir, "documents")
    png = multimodal.synthesize_png(docs, "doc_id", "text")
    hashes = multimodal.ahash_bits(png, "doc_id")
    return (
        hashes.groupBy("ahash_bits")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
        )
        .orderBy(F.desc("n_docs"), "ahash_bits")
        .limit(20)
    )


@query(
    "l5_gif_pixel_features",
    oracle="""
    WITH dims AS (
      SELECT doc_id, length(text) % 16 + 4 AS w, doc_id % 12 + 4 AS h
      FROM documents),
    px AS (
      SELECT d.doc_id, d.w, d.h,
             (((d.doc_id + 2*x.x + 3*y.y) % 8) * 37) % 256 AS r,
             (((d.doc_id + 2*x.x + 3*y.y) % 8) * 37 + 85) % 256 AS g,
             (((d.doc_id + 2*x.x + 3*y.y) % 8) * 37 + 170) % 256 AS b
      FROM dims d
      JOIN generate_series(0, 19) x(x) ON x.x < d.w
      JOIN generate_series(0, 15) y(y) ON y.y < d.h)
    SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(sum(r) AS BIGINT) AS sum_r,
           CAST(sum(g) AS BIGINT) AS sum_g,
           CAST(sum(b) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id, w, h
    """,
    tags=("L5",),
)
def l5_gif_pixel_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF pixel decode end-to-end (closes the GIF leg of the codec
    gap): synthesize a genuine LZW-compressed GIF89a per document — global
    color table, growing code widths, sub-block framing — with
    index(x,y) = (doc_id + 2x + 3y) % 8 over palette[j] = ((j*37)%256,
    (j*37+85)%256, (j*37+170)%256), then recover per-channel integer sums
    by FULL decode (LZW string-table rebuild + palette mapping) inside
    mapInPandas (operators/multimodal.decode_gif_pixels). The oracle
    recomputes the sums arithmetically from the closed form; a wrong code
    width, table reset, or palette offset hash-fails. Encoder builds its
    LZW table by string, decoder rebuilds it positionally: independent
    transforms, not a shared shortcut."""
    docs = load_table(spark, sf_dir, "documents")
    gif = multimodal.synthesize_gif(docs, "doc_id", "text")
    return multimodal.pixel_features(gif, "doc_id")


@query(
    "l5_jpeg_pixel_features",
    oracle="""
    WITH dims AS (
      SELECT doc_id, length(text) % 3 + 1 AS bw, doc_id % 2 + 1 AS bh
      FROM documents),
    blk AS (
      SELECT d.doc_id, d.bw, d.bh,
             (d.doc_id * 5 + bx.bx * 11 + by.by * 17) % 200 + 28 AS y
      FROM dims d
      JOIN generate_series(0, 2) bx(bx) ON bx.bx < d.bw
      JOIN generate_series(0, 1) by(by) ON by.by < d.bh)
    SELECT doc_id,
           CAST(bw * 8 AS BIGINT) AS width,
           CAST(bh * 8 AS BIGINT) AS height,
           CAST(bw * bh * 64 AS BIGINT) AS n_pixels,
           CAST(sum(y) * 64 AS BIGINT) AS sum_r,
           CAST(sum(y) * 64 AS BIGINT) AS sum_g,
           CAST(sum(y) * 64 AS BIGINT) AS sum_b
    FROM blk GROUP BY doc_id, bw, bh
    """,
    tags=("L5",),
)
def l5_jpeg_pixel_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode end-to-end (closes the LAST codec gap):
    synthesize a genuine JFIF per document — DQT/DHT/SOF0/SOS markers,
    Huffman-coded DC deltas with byte stuffing, EOBs — with flat 8x8
    block luma (doc_id*5 + bx*11 + by*17) % 200 + 28 and neutral chroma,
    then recover per-channel integer sums by FULL decode (marker walk,
    Huffman tree, bit-unstuffing, zigzag, dequant, IDCT, YCbCr->RGB)
    inside mapInPandas (operators/jpeg.decode_jpeg_pixels). Flat blocks
    make the IDCT integer-exact so the oracle recomputes the sums closed-
    form; the general AC/IDCT path is property-tested against a reference
    IDCT in tests. A wrong Huffman table, zigzag index, predictor reset,
    or quant step hash-fails."""
    docs = load_table(spark, sf_dir, "documents")
    jp = multimodal.synthesize_jpeg(docs, "doc_id", "text")
    return multimodal.pixel_features(jp, "doc_id")


@query(
    "l5_mixed_pixel_features",
    oracle="""
    WITH raster AS (
      SELECT doc_id, length(text) % 16 + 4 AS w, doc_id % 12 + 4 AS h,
             doc_id % 3 = 0 AS is_png
      FROM documents WHERE doc_id % 3 < 2),
    px AS (
      SELECT d.doc_id, d.w, d.h,
             CASE WHEN d.is_png THEN (d.doc_id * 7 + x.x * 3 + y.y * 5) % 256
                  ELSE (((d.doc_id + 2*x.x + 3*y.y) % 8) * 37) % 256 END AS r,
             CASE WHEN d.is_png THEN (d.doc_id * 7 + x.x * 3 + y.y * 5 + 11) % 256
                  ELSE (((d.doc_id + 2*x.x + 3*y.y) % 8) * 37 + 85) % 256 END AS g,
             CASE WHEN d.is_png THEN (d.doc_id * 7 + x.x * 3 + y.y * 5 + 22) % 256
                  ELSE (((d.doc_id + 2*x.x + 3*y.y) % 8) * 37 + 170) % 256 END AS b
      FROM raster d
      JOIN generate_series(0, 19) x(x) ON x.x < d.w
      JOIN generate_series(0, 15) y(y) ON y.y < d.h),
    raster_feats AS (
      SELECT doc_id,
             CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
             CAST(w * h AS BIGINT) AS n_pixels,
             CAST(sum(r) AS BIGINT) AS sum_r,
             CAST(sum(g) AS BIGINT) AS sum_g,
             CAST(sum(b) AS BIGINT) AS sum_b
      FROM px GROUP BY doc_id, w, h),
    jdims AS (
      SELECT doc_id, length(text) % 3 + 1 AS bw, doc_id % 2 + 1 AS bh
      FROM documents WHERE doc_id % 3 = 2),
    jblk AS (
      SELECT d.doc_id, d.bw, d.bh,
             (d.doc_id * 5 + bx.bx * 11 + by.by * 17) % 200 + 28 AS y
      FROM jdims d
      JOIN generate_series(0, 2) bx(bx) ON bx.bx < d.bw
      JOIN generate_series(0, 1) by(by) ON by.by < d.bh),
    jpeg_feats AS (
      SELECT doc_id,
             CAST(bw * 8 AS BIGINT) AS width, CAST(bh * 8 AS BIGINT) AS height,
             CAST(bw * bh * 64 AS BIGINT) AS n_pixels,
             CAST(sum(y) * 64 AS BIGINT) AS sum_r,
             CAST(sum(y) * 64 AS BIGINT) AS sum_g,
             CAST(sum(y) * 64 AS BIGINT) AS sum_b
      FROM jblk GROUP BY doc_id, bw, bh)
    SELECT * FROM raster_feats UNION ALL SELECT * FROM jpeg_feats
    """,
    tags=("L5",),
)
def l5_mixed_pixel_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-format corpus through ONE featurization stage: doc_id % 3
    routes documents to compressed PNG, LZW GIF, or baseline JPEG;
    ``decode_image_pixels`` dispatches on the payload magic inside the
    same mapInPandas batch — the real-corpus shape where formats
    interleave arbitrarily and per-format jobs would triple the scan. The
    oracle recomputes all three closed forms branch-by-modulus."""
    docs = load_table(spark, sf_dir, "documents")
    png = multimodal.synthesize_png(
        docs.filter(F.col("doc_id") % 3 == 0), "doc_id", "text"
    )
    gif = multimodal.synthesize_gif(
        docs.filter(F.col("doc_id") % 3 == 1), "doc_id", "text"
    )
    jp = multimodal.synthesize_jpeg(
        docs.filter(F.col("doc_id") % 3 == 2), "doc_id", "text"
    )
    return multimodal.pixel_features(png.unionByName(gif).unionByName(jp), "doc_id")


@query(
    "l5_audio_features",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             length(text) % 256 + 16 AS n,
             8000 + (doc_id % 3) * 4000 AS rate
      FROM documents)
    SELECT doc_id,
           CAST(rate AS BIGINT) AS sample_rate,
           CAST(n AS BIGINT) AS n_samples,
           CAST(n * 1000 // rate AS BIGINT) AS duration_ms,
           CAST(list_sum(list_transform(range(0, n), i ->
               abs(((doc_id*31 + i*17) % 4096) - 2048))) AS BIGINT) AS sum_abs,
           CAST(list_max(list_transform(range(0, n), i ->
               abs(((doc_id*31 + i*17) % 4096) - 2048))) AS BIGINT) AS peak,
           CAST(list_sum(list_transform(range(1, n), i ->
               CASE WHEN (((doc_id*31 + (i-1)*17) % 4096) - 2048)
                         * (((doc_id*31 + i*17) % 4096) - 2048) < 0
                    THEN 1 ELSE 0 END)) AS BIGINT) AS zero_crossings
    FROM f
    """,
    tags=("L5",),
)
def l5_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end (the audio leg of the multimodal
    surface): synthesize a genuine RIFF/WAVE payload per document — mono
    16-bit PCM, sample[i] = ((doc_id*31 + i*17) % 4096) - 2048 — then
    recover integer features (L1 energy, peak, strict zero-crossings,
    duration) by a full independent chunk-walk + PCM decode inside
    mapInPandas (operators/audio.decode_wav). The oracle recomputes every
    feature arithmetically from the closed form without touching bytes, so
    a wrong endianness, chunk offset, or sign convention hash-fails."""
    docs = load_table(spark, sf_dir, "documents")
    wav = audio.synthesize_audio(docs, "doc_id", "text")
    return audio.audio_features(wav, "doc_id")


@query(
    "l6_deterministic_shuffle",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             ('0x' || substr(md5('shuffle:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                 AS hv
      FROM documents)
    SELECT doc_id,
           CAST(hv % 8 AS INTEGER) AS shard,
           CAST(row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id)
                AS BIGINT) AS shard_pos
    FROM h
    """,
    tags=("L6", "W1"),
)
def l6_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle (operators/sampling.deterministic_
    shuffle): the pre-training epoch permutation — every document gets a
    reproducible (shard, shard_pos) address from a salted md5, so the
    training order is identical across engines, reruns, and cluster
    sizes.  One uniform hash shuffle + per-shard sort; no global sort, no
    rand()."""
    from ..operators.sampling import deterministic_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return deterministic_shuffle(docs, "doc_id", n_shards=8)


@query(
    "l3_pq_search",
    oracle=None,  # PQ codebooks come from an RNG-seeded iterative k-means
    #               fit — not SQL-expressible; rows-only check by design,
    #               recall gate vs brute force in tests/test_llm_ops.py
    #               (same policy as l3_ivf_kmeans_search)
    tags=("L3",),
)
def l3_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/similarity.pq_search): corpus
    vectors compress to m=8 codebook indices, the query scans the
    compressed codes with an ADC lookup table, and the top candidates
    rerank by exact integer dot — compressed-domain scan, exact returned
    scores. Completes the ANN triad (LSH buckets, IVF cells, PQ codes).
    The codebook fit uses an EXPLICIT deterministic thinning (fit_mod=4)
    under a hard max_fit_rows cap — the declared query demonstrates the
    bounded-fit posture, never a whole-corpus collect."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    return similarity.pq_search(
        emb, q, k=20, m=8, ksub=16, refine=4, fit_mod=4, max_fit_rows=50_000
    )


_BM25_TERMS = ["spark", "join", "window", "vector"]

from ..operators.retrieval import bm25_oracle_sql as _bm25_oracle  # noqa: E402


@query(
    "l4_bm25_topk",
    oracle=_bm25_oracle(_BM25_TERMS, k=20, toks_sql=_TOKS),
    tags=("L4", "L3"),
)
def l4_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical retrieval: rational-idf BM25 top-20 for the query
    {spark, join, window, vector} (operators/retrieval.py — the log is
    dropped from idf because libm ln is not bit-deterministic across
    engines; every remaining op is exactly-rounded scalar IEEE arithmetic
    and the per-document score adds per-term contributions in a FIXED
    written order via pivot columns, never a float SUM aggregate). The
    oracle SQL is GENERATED from the same term list so both engines state
    the identical expression tree. Scale: the corpus token stream is
    filtered to the query vocabulary BEFORE any shuffle; doc-frequency
    and corpus stats are broadcast single-row sides; top-k compiles to
    TakeOrderedAndProject."""
    from ..operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, "doc_id", "text", _BM25_TERMS, k=20)


@query(
    "l6_weighted_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    CROSS JOIN (SELECT max(n_chars) AS max_w FROM documents)
    WHERE {{u}} * max_w < n_chars * 4294967296
    """.format(u="(('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)"),
    tags=("L6", "F12"),
)
def l6_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional Bernoulli sampling by document length
    (operators/sampling.weighted_bernoulli_sample): each doc kept with
    probability n_chars/max(n_chars), decided by integer
    cross-multiplication of the md5-derived 32-bit uniform — exact on
    both engines, no float division, no RNG. The sampler the corpus-mix
    stage uses to upweight long documents without a shuffle: the
    predicate is per-row codegen against one broadcast scalar."""
    from ..operators.sampling import weighted_bernoulli_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return weighted_bernoulli_sample(docs, "doc_id", "n_chars")


@query(
    "l4_inverted_probe",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
    hits AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      FROM tok WHERE token IN ('spark', 'vector', 'merge')
      GROUP BY 1, 2)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum(tf) AS BIGINT) AS total_tf
    FROM hits GROUP BY doc_id
    ORDER BY n_terms DESC, total_tf DESC, doc_id LIMIT 20
    """,
    tags=("L4", "S8"),
)
def l4_inverted_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted inverted-index lookup (operators/retrieval.py — the
    lexical twin of l3_ann_persisted_probe): the corpus is tokenized and
    bucketed ONCE into a token-hash-partitioned postings table registered
    in the catalog; the probe computes the query terms' buckets
    driver-side with the Python twin of the bucketing hash and pushes
    them as LITERAL partition predicates, so the scan touches only those
    bucket directories no matter how large the corpus. The oracle states
    the same exact (n_terms, total_tf) ranking from the raw documents —
    a green hash proves build+probe end-to-end. Partition pruning is
    plan-asserted in tests/test_plan_shapes.py."""
    import os

    from ..operators import retrieval

    docs = load_table(spark, sf_dir, "documents")
    path = retrieval.inverted_index_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        retrieval.build_inverted_index(docs, path)
    return retrieval.inverted_probe_persisted(
        spark, path, ["spark", "vector", "merge"], k=20
    )


@query(
    "l3_int8_quantize",
    oracle="""
    WITH m AS (
      SELECT vec_id,
             COALESCE(list_max(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE)))), 0.0) AS max_abs,
             embedding
      FROM embeddings)
    SELECT vec_id, max_abs,
           array_to_string(
             CASE WHEN max_abs = 0.0
                  THEN list_transform(embedding, x -> 0)
                  ELSE list_transform(embedding, x ->
                       CAST(floor(CAST(x AS DOUBLE) * 127.0 / max_abs + 0.5)
                            AS INT))
             END, ',') AS q_csv
    FROM m
    """,
    tags=("L3", "F10"),
)
def l3_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding corpus via
    ``mapInArrow`` (operators/quantize.py) — the Arrow-native batch path:
    the list column quantizes as vectorized numpy ops over the zero-copy
    flat buffer, no pandas, no per-row Python, no shuffle. The oracle
    restates the same fixed-order IEEE arithmetic with DuckDB list
    lambdas; `floor(x + 0.5)` half-up rounding is used on BOTH sides
    because numpy round() is half-to-even while SQL round() is half-away
    (module docstring). Hash-green proves the Arrow path bit-faithful.
    The DECLARED vector is the CSV rendering of the int8 array (both
    engines) — the r5 driver canonicalizer cannot sort/hash list-typed
    columns (repo invariant: scalar-only declared outputs; the operator
    itself stays array-native for downstream use).
    """
    from ..operators.quantize import int8_quantize

    emb = load_table(spark, sf_dir, "embeddings")
    q = int8_quantize(emb, "vec_id", "embedding")
    return q.select(
        "vec_id",
        "max_abs",
        F.array_join(F.transform(F.col("q"), lambda x: x.cast("string")), ",").alias("q_csv"),
    )


@query(
    "l6_leakage_safe_split",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE}, {_minhash_sig_sql()}, {_minhash_bands_sql()},
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r
        ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
    sets AS (SELECT doc_id, list(shingle) AS ls, count(*) AS n_sh
             FROM sh GROUP BY doc_id),
    verified AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN sets a ON a.doc_id = c.id_a
                  JOIN sets b ON b.doc_id = c.id_b
      WHERE 100 * len(list_intersect(a.ls, b.ls))
            >= 60 * (a.n_sh + b.n_sh - len(list_intersect(a.ls, b.ls)))),
    edges AS (SELECT id_a AS src, id_b AS dst FROM verified
              UNION SELECT id_b, id_a FROM verified),
    reach(node, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON r.node = e.src),
    cc AS (SELECT node AS doc_id, min(lbl) AS cluster_id
           FROM reach GROUP BY node),
    asg AS (
      SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id),
    b AS (
      SELECT doc_id, cluster_id,
             CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 2))
                  AS BIGINT) % 10 AS bkt
      FROM asg)
    SELECT doc_id, cluster_id,
           CASE WHEN bkt < 8 THEN 'train' WHEN bkt = 8 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
    tags=("L6", "L2"),
)
def l6_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: near-duplicate documents MUST
    land in the same split (else eval leaks training text), so the split
    key is the doc's dedup CLUSTER id (LSH → verify → connected
    components, the full l2 chain), not the doc id — singletons fall back
    to their own id, and the 80/10/10 assignment hashes the cluster id
    through md5 (engine-portable). By construction no cluster straddles a
    split boundary (asserted in tests/test_llm_ops.py). Scale: one hash
    on a |docs|-sized table after the dedup chain the pipeline already
    ran; at 100 TB the cluster map is the dedup output you persisted
    anyway."""
    from ..operators.components import connected_components_star

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    verified = l2_neardup_pipeline(spark, sf_dir).select("id_a", "id_b")
    cc = connected_components_star(verified)
    asg = docs.join(cc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
    )
    bkt = (
        F.expr("CAST(conv(substr(md5(CAST(cluster_id AS STRING)), 1, 2), 16, 10) AS BIGINT)")
        % 10
    )
    return asg.select(
        "doc_id",
        "cluster_id",
        F.when(bkt < 8, "train").when(bkt == 8, "val").otherwise("test").alias("split"),
    )


def _mmr_oracle(k: int = 4, pool: int = 8) -> str:
    head = f"""
    WITH c AS (SELECT vec_id, {_QUANT_VEC} AS qv FROM embeddings),
    q AS (SELECT qv AS qqv FROM c WHERE vec_id = 0),
    pool AS (
      SELECT c.vec_id AS id, c.qv AS v,
             {_DOT.format(a="q.qqv", b="c.qv")} AS rel
      FROM c, q WHERE c.vec_id <> 0
      ORDER BY rel DESC, id LIMIT {pool}),
    s1 AS (SELECT 1 AS pick_rank, id, v, rel FROM pool
           ORDER BY rel DESC, id LIMIT 1),
    sel1 AS (SELECT * FROM s1)"""
    parts = [head]
    for step in range(2, k + 1):
        p = step - 1
        parts.append(f"""
    r{step} AS (
      SELECT p.id, any_value(p.v) AS v, any_value(p.rel) AS rel,
             max({_DOT.format(a="p.v", b="s.v")}) AS maxdiv
      FROM pool p, sel{p} s
      WHERE p.id NOT IN (SELECT id FROM sel{p})
      GROUP BY p.id),
    s{step} AS (SELECT {step} AS pick_rank, id, v, rel FROM r{step}
           ORDER BY (2 * rel - maxdiv) DESC, id LIMIT 1),
    sel{step} AS (SELECT * FROM sel{p} UNION ALL SELECT * FROM s{step})""")
    return (
        ",".join(parts)
        + f"""
    SELECT pick_rank, id AS vec_id, rel FROM sel{k}
    """
    )


@query(
    "l3_mmr_rerank",
    oracle=_mmr_oracle(),
    tags=("L3", "O3"),
)
def l3_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware serving re-rank: Maximal Marginal Relevance over
    the top-8 ANN pool for query vec 0 — greedy picks maximize
    ``2*relevance - max similarity to already-picked`` so the 4 returned
    neighbors cover the query's neighborhood instead of echoing one dense
    clump (the standard retrieval-augmentation dedup step between ANN and
    the consumer). Exact int64 arithmetic over micro-quantized vectors
    end to end (operators/similarity.py mmr_rerank), so the greedy
    argmax chain is bit-deterministic and the oracle unrolls it as CTE
    rounds. The corpus-scale work is the upstream kNN; MMR itself is
    O(k·pool) on a checkpointed pool — rank the pool from the persisted
    ANN index in production."""
    from ..operators.similarity import int_dot, mmr_rerank, quantize

    emb = load_table(spark, sf_dir, "embeddings")
    c = emb.select("vec_id", quantize(F.col("embedding")).alias("qv"))
    qv = c.filter(F.col("vec_id") == 0).select(F.col("qv").alias("qqv"))
    pool = (
        c.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qv))
        .select(
            "vec_id", "qv", int_dot(F.col("qqv"), F.col("qv")).alias("rel")
        )
        .orderBy(F.desc("rel"), "vec_id")
        .limit(8)
    )
    out = mmr_rerank(pool, k=4, id_col="vec_id", qv_col="qv", rel_col="rel")
    return out.select("pick_rank", F.col("id").alias("vec_id"), "rel")


@query(
    "l4_feature_hash_embed",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    b AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tok), 1, 2)) AS BIGINT) % 32 AS bucket
      FROM t),
    c AS (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt
          FROM b GROUP BY doc_id, bucket),
    g AS (SELECT doc_id, list(struct_pack(k := bucket, v := cnt)) AS pairs
          FROM c GROUP BY doc_id)
    SELECT d.doc_id,
           array_to_string(
             CASE WHEN g.doc_id IS NULL
                  THEN list_transform(generate_series(0, 31), i -> CAST(0 AS BIGINT))
                  ELSE list_transform(generate_series(0, 31), i ->
                       CAST(coalesce(list_sum(list_transform(pairs,
                            p -> CASE WHEN p.k = i THEN p.v ELSE 0 END)), 0)
                            AS BIGINT))
             END, ',') AS fvec_csv
    FROM documents d LEFT JOIN g ON g.doc_id = d.doc_id
    """,
    tags=("L4", "F10", "F12"),
)
def l4_feature_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing vectorizer (the 'hashing trick'): every document
    becomes a dense 32-dim bag-of-words count vector, token→dimension
    assignment via md5 (engine-portable, no vocabulary to build or ship —
    THE property that makes this the streaming/100 TB-safe vectorizer:
    embed any shard independently, no global dictionary shuffle).
    Pipeline: tokenize→hash→per-(doc,bucket) count (one shuffle,
    map-side combinable)→densify through a map lookup over a static
    0..31 sequence. Empty documents embed as explicit zero vectors. All
    integer — hash-exact against the oracle's list-lambda twin. The
    DECLARED vector is the CSV rendering (both engines) — r5 driver
    canonicalizer cannot hash list columns (scalar-only invariant)."""
    from ..operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    bucket = F.expr("CAST(conv(substr(md5(tok), 1, 2), 16, 10) AS BIGINT) % 32")
    c = (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    g = c.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "cnt"))).alias("m")
    )
    dense = F.transform(
        F.sequence(F.lit(0).cast("long"), F.lit(31).cast("long")),
        lambda i: F.coalesce(F.element_at(F.col("m"), i), F.lit(0).cast("long")),
    )
    zeros = F.expr("array_repeat(CAST(0 AS BIGINT), 32)")
    fvec = F.when(F.col("m").isNull(), zeros).otherwise(dense)
    return (
        docs.select("doc_id")
        .join(g, "doc_id", "left")
        .select(
            "doc_id",
            F.array_join(
                F.transform(fvec, lambda x: x.cast("string")), ","
            ).alias("fvec_csv"),
        )
    )


def _l5_scene_cut_oracle() -> str:
    mf = multimodal.VID_MAX_FRAMES
    return f"""
    WITH f AS (
      SELECT doc_id, CAST(i - 1 AS BIGINT) AS idx,
             ascii(substr(text, i, 1)) % 256 AS b
      FROM documents, generate_series(1, {mf}) t(i)
      WHERE i <= least(length(text), {mf})),
    d AS (
      SELECT doc_id, idx, b,
             lag(b) OVER (PARTITION BY doc_id ORDER BY idx) AS pb
      FROM f),
    c AS (SELECT doc_id, idx FROM d
          WHERE pb IS NOT NULL AND abs(b - pb) >= 32)
    SELECT f.doc_id,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(coalesce(any_value(nc.n_cuts), 0) AS BIGINT) AS n_cuts,
           CAST(any_value(nc.first_cut) AS BIGINT) AS first_cut
    FROM f
    LEFT JOIN (SELECT doc_id, count(*) AS n_cuts, min(idx) AS first_cut
               FROM c GROUP BY doc_id) nc ON nc.doc_id = f.doc_id
    GROUP BY f.doc_id
    """


@query(
    "l5_scene_cuts",
    oracle=_l5_scene_cut_oracle(),
    tags=("L5", "W2"),
)
def l5_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video scene-cut detection: walk each container once in mapInPandas
    emitting the per-frame brightness series (payload never shuffles),
    then detect cuts as |mean_i - mean_{i-1}| >= 32 with a JVM lag window
    over the scalar series and aggregate (frames, cuts, first cut) per
    video — the decode/temporal split a 100 TB video pipeline wants:
    Python touches bytes exactly once, all sequence logic is codegen.
    The fixture's frames are built from the text bytes, so the oracle
    predicts every cut arithmetically; empty videos report zero frames
    via the source-side left join."""
    docs = load_table(spark, sf_dir, "documents")
    video = multimodal.synthesize_video(docs, "doc_id", "text")
    means = multimodal.frame_means(video)
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    d = means.withColumn("pb", F.lag("frame_mean").over(w))
    cuts = d.filter(
        F.col("pb").isNotNull() & (F.abs(F.col("frame_mean") - F.col("pb")) >= 32)
    ).groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_cuts"),
        F.min("frame_idx").alias("first_cut"),
    )
    per_doc = means.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames")
    )
    return per_doc.join(cuts, "doc_id", "left").select(
        "doc_id",
        "n_frames",
        F.coalesce(F.col("n_cuts"), F.lit(0).cast("long")).alias("n_cuts"),
        F.col("first_cut").cast("long").alias("first_cut"),
    )


@query(
    "l2_containment_pairs",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    keep AS (
      SELECT shingle FROM sh
      GROUP BY shingle HAVING count(*) <= {NGRAM_SHINGLE_DF_CAP}),
    shc AS (SELECT s.doc_id, s.shingle FROM sh s
            JOIN keep k ON s.shingle = k.shingle),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
    inter AS (
      SELECT l.doc_id AS id_sub, r.doc_id AS id_sup,
             CAST(count(*) AS BIGINT) AS inter
      FROM shc l JOIN shc r ON l.shingle = r.shingle
                           AND l.doc_id <> r.doc_id
      GROUP BY 1, 2)
    SELECT i.id_sub, i.id_sup, i.inter, CAST(s.n_sh AS BIGINT) AS n_sub
    FROM inter i JOIN sizes s ON s.doc_id = i.id_sub
    WHERE s.n_sh >= 5 AND 100 * i.inter >= 80 * s.n_sh
    """,
    tags=("L2",),
)
def l2_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed shingle-CONTAINMENT pairs (>= 80% of the sub-document's
    3-gram set inside the super-document): the asymmetric dedup relation
    symmetric Jaccard misses — quote expansions and template-plus-content
    duplicates. Hot-shingle DF cap declared as in l2_ngram_jaccard
    (operators/dedup.py containment_pairs); all-integer threshold math."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.containment_pairs(
        docs, "doc_id", "text", threshold_pct=80, min_shingles=5,
        max_shingle_df=NGRAM_SHINGLE_DF_CAP,
    )


_MIX_TARGET = {"en": 40, "zh": 20, "de": 15, "es": 15, "fr": 10}


@query(
    "l7_mixture_rebalance",
    oracle=f"""
    WITH lt AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                      tk -> tk <> ''))) AS BIGINT) AS lang_tokens
      FROM documents GROUP BY lang),
    tot AS (SELECT sum(lang_tokens) AS total_tokens FROM lt),
    tgt AS (SELECT * FROM (VALUES {", ".join(f"('{k}', {v})" for k, v in _MIX_TARGET.items())})
            AS t(lang, target_pct))
    SELECT lt.lang, lt.n_docs, lt.lang_tokens,
           CAST(tgt.target_pct AS BIGINT) AS target_pct,
           CAST(tgt.target_pct * tot.total_tokens AS DOUBLE)
               / CAST(100 * lt.lang_tokens AS DOUBLE) AS sample_weight
    FROM lt JOIN tgt ON tgt.lang = lt.lang CROSS JOIN tot
    """,
    tags=("L6", "L7", "A2"),
)
def l7_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture rebalancing: given a DECLARED target language mix,
    compute each language's sampling weight ``target_share /
    current_share`` (in token space, the unit training mixes are
    specified in). weight > 1 => oversample (pair with
    l6_oversample_mix's fractional epochs), < 1 => downsample. The
    division is a single double op over exact integer token counts —
    bit-deterministic. One token-count aggregate over the corpus (the
    same scan l4_token_stats runs), then a 5-row broadcast join; free at
    any scale."""
    from ..operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    lt = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).cast("long").alias("lang_tokens"),
    )
    total = lt.agg(F.sum("lang_tokens").alias("total_tokens"))
    tgt = F.broadcast(
        docs.sparkSession.createDataFrame(
            list(_MIX_TARGET.items()), "lang string, target_pct long"
        )
    )
    return (
        lt.join(tgt, "lang")
        .crossJoin(F.broadcast(total))
        .select(
            "lang",
            "n_docs",
            "lang_tokens",
            "target_pct",
            (
                (F.col("target_pct") * F.col("total_tokens")).cast("double")
                / (100 * F.col("lang_tokens")).cast("double")
            ).alias("sample_weight"),
        )
    )


@query(
    "l3_knn_filtered",
    oracle=f"""
    WITH c AS (SELECT vec_id, label, {_QUANT_VEC} AS qv FROM embeddings),
    q AS (SELECT qv FROM c WHERE vec_id = 0)
    SELECT c.vec_id, c.label,
           CAST(list_dot_product(c.qv::DOUBLE[], q.qv::DOUBLE[]) AS BIGINT)
               AS dot_q
    FROM c, q
    WHERE c.label = 1 AND c.vec_id <> 0
    ORDER BY dot_q DESC, vec_id ASC
    LIMIT 15
    """,
    tags=("L3", "P5"),
)
def l3_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search (the serving feature every vector DB
    exposes): top-15 neighbors of vec 0 AMONG label=1 vectors only —
    pre-filtering, so the metadata predicate prunes BEFORE any scoring
    (pushed to the parquet scan; at 100 TB with a label-partitioned or
    bucketed corpus the filter prunes files, not rows). Post-filtering
    (score then filter) under-fills k when the label is selective —
    declaring the pre-filter semantics in the oracle pins the correct
    variant. Plan is otherwise knn_bruteforce's: broadcast 1-row query,
    TakeOrderedAndProject."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        similarity.quantize(F.col("embedding")).alias("qvec")
    )
    cand = emb.filter((F.col("label") == 1) & (F.col("vec_id") != 0))
    scored = cand.crossJoin(F.broadcast(q)).select(
        "vec_id",
        "label",
        similarity.int_dot(
            similarity.quantize(F.col("embedding")), F.col("qvec")
        ).alias("dot_q"),
    )
    return scored.orderBy(F.desc("dot_q"), "vec_id").limit(15)


@query(
    "l6_target_encode",
    oracle="""
    WITH seg AS (
      SELECT c.c_mktsegment,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(28,2)) AS seg_sum
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_mktsegment),
    tot AS (SELECT CAST(sum(seg_sum) AS DECIMAL(28,2)) AS g_sum,
                   CAST(sum(n) AS BIGINT) AS g_n
            FROM seg)
    SELECT seg.c_mktsegment, seg.n,
           (CAST(seg.seg_sum AS DOUBLE)
            + 20.0 * (CAST(tot.g_sum AS DOUBLE) / CAST(tot.g_n AS DOUBLE)))
           / (CAST(seg.n AS DOUBLE) + 20.0) AS encoded
    FROM seg CROSS JOIN tot
    """,
    tags=("L6", "A2"),
)
def l6_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding (the m-estimate categorical encoder a
    feature pipeline applies before gradient models): each segment's code
    is its mean order value shrunk toward the global mean with m=20
    pseudo-observations — rare categories collapse to the prior instead
    of memorizing noise. Float discipline: all sums ride DECIMAL
    (order-free); the encoding is a fixed-order chain of scalar double
    ops, so both engines produce bit-identical codes. One aggregate
    shuffle; the grand totals ride an empty-partition window over the
    5-row aggregate (no second fact scan), and the encoder table is
    dimension-sized — broadcast it back onto the fact table to apply at
    any scale."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    seg = (
        o.join(c, c["c_custkey"] == o["o_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(28,2)")
            .alias("seg_sum"),
        )
    )
    # grand totals via an empty-partition window over the 5-row aggregate —
    # ONE pass over the fact join (a separate seg.agg() + crossJoin would
    # re-evaluate the whole uncached lineage twice); decimal window sums
    # are exact, so summation order cannot matter
    from pyspark.sql import Window as W

    g = W.partitionBy()
    seg2 = seg.select(
        "c_mktsegment",
        "n",
        "seg_sum",
        F.sum("seg_sum").over(g).cast("decimal(28,2)").alias("g_sum"),
        F.sum("n").over(g).cast("long").alias("g_n"),
    )
    enc = (
        F.col("seg_sum").cast("double")
        + F.lit(20.0) * (F.col("g_sum").cast("double") / F.col("g_n").cast("double"))
    ) / (F.col("n").cast("double") + F.lit(20.0))
    return seg2.select("c_mktsegment", "n", enc.alias("encoded"))


@query(
    "l5_resize_pixels",
    oracle="""
    WITH dims AS (
      SELECT doc_id, length(text) % 16 + 4 AS w, doc_id % 12 + 4 AS h
      FROM documents),
    px AS (
      SELECT d.doc_id,
             (d.doc_id * 7 + ((x.x * d.w) // 8) * 3
              + ((y.y * d.h) // 6) * 5) % 256 AS r,
             (d.doc_id * 7 + ((x.x * d.w) // 8) * 3
              + ((y.y * d.h) // 6) * 5 + 11) % 256 AS g,
             (d.doc_id * 7 + ((x.x * d.w) // 8) * 3
              + ((y.y * d.h) // 6) * 5 + 22) % 256 AS b
      FROM dims d, generate_series(0, 7) x(x), generate_series(0, 5) y(y))
    SELECT doc_id,
           CAST(8 AS BIGINT) AS width,
           CAST(6 AS BIGINT) AS height,
           CAST(48 AS BIGINT) AS n_pixels,
           CAST(sum(r) AS BIGINT) AS sum_r,
           CAST(sum(g) AS BIGINT) AS sum_g,
           CAST(sum(b) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id
    """,
    tags=("L5",),
)
def l5_resize_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE end-to-end (the brief's decode/resize/feature chain):
    every synthesized PNG is thumbnailed to 8×6 by real decode →
    nearest-neighbor sample → re-ENCODE (operators/multimodal.resize_image,
    applied batch-wise in one mapInPandas stage), then the resized
    payload is decoded AGAIN by the independent pixel_features pass. The
    oracle predicts the thumbnail's channel sums purely arithmetically
    (source index = target·src // dst, the NN mapping), so an off-by-one
    in the sampling grid, a filter bug in the re-encode, or a stale
    dimension header all hash-fail. Two Python map stages, zero
    shuffles of pixel data."""
    docs = load_table(spark, sf_dir, "documents")
    png = multimodal.synthesize_png(docs, "doc_id", "text")
    small = multimodal.resize_images(png, 8, 6)
    return multimodal.pixel_features(small, "doc_id")


@query(
    "l4_bpe_train",
    oracle=None,  # iterative leftmost-merge semantics are not
    # SQL-expressible (same rows-only policy as l3_ivf_kmeans);
    # tests/test_bpe_train.py pins the merge table against a pure-Python
    # reference implementation byte for byte
    tags=("L4",),
)
def l4_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING at corpus scale (operators/bpe.py): learn a
    12-entry merge table from the documents table. The corpus collapses
    to deduplicated (word, freq) after ONE shuffle — the classic BPE fit
    trick — so every round costs a vocabulary-sized pair count (map-side
    combinable) plus an Arrow-batched merge rewrite; the per-round argmax
    is a driver-side top-1. Deterministic: exact integer pair counts with
    (left, right) tie-breaks. Rows-only by design; the pytest gate
    replays the identical corpus through a pure-Python BPE and requires
    the identical merge table."""
    from ..operators.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    merges = bpe_train(docs, "text", n_merges=12)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_freq long"
    )


@query(
    "l4_bpe_encode",
    oracle=None,  # the rank-order merge loop is inherently sequential —
    # same rows-only policy as l4_bpe_train; parity vs a pure-Python
    # reference ENCODER is pytest-gated (tests/test_bpe_train.py), and
    # n_tokens/token_fp are deterministic integers
    tags=("L4",),
)
def l4_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING at corpus scale — the inference half completing the
    tokenizer story (pretokenize → train → encode): learn the same
    12-entry merge table as l4_bpe_train, then encode EVERY document
    under it (operators/bpe.bpe_encode). The merge table is
    vocabulary-sized and rides the closure (broadcast-vocab pattern), so
    encoding is a pure map stage with a per-word memo cache per Arrow
    batch — a word repeated a million times encodes once, and a 100 TB
    corpus encodes with zero shuffles. Output per document: token count
    under the learned vocab and an order-sensitive md5-derived
    fingerprint of the token sequence (any wrong merge, rank inversion,
    or word-boundary bug changes it)."""
    from ..operators.bpe import bpe_encode, bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(
        docs.filter(F.col("doc_id") < 200), "text", n_merges=12
    )
    return bpe_encode(docs, "text", merges, id_col="doc_id")


@query(
    "l6_importance_sampling",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, source = 'src0' AS is_t, unnest({_TOKS}) AS tok
      FROM documents),
    bk AS (
      SELECT doc_id, is_t,
             CAST(('0x' || substr(md5(tok), 1, 2)) AS BIGINT) AS b
      FROM tk),
    cnt AS (
      SELECT b,
             CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
             CAST(sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS c_g
      FROM bk GROUP BY b),
    w AS (SELECT b, (c_t * 1000000) // (c_t + c_g + 1) AS w FROM cnt),
    sc AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_toks,
             CAST(sum(w.w) AS BIGINT) AS score
      FROM bk JOIN w USING (b) WHERE NOT is_t GROUP BY doc_id)
    SELECT doc_id, n_toks, score,
           CAST((score * 1000) // n_toks AS BIGINT) AS per_tok
    FROM sc ORDER BY per_tok DESC, doc_id LIMIT 100
    """,
    tags=("L6", "L4", "F12"),
)
def l6_importance_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance-weighted DATA SELECTION
    (operators/sampling.importance_select): rank the background corpus
    by hashed-unigram affinity to the `source='src0'` target domain and
    keep the top 100 — the pretraining-pipeline primitive for "select
    web documents that look like my high-quality domain" (Xie et al.
    2023). The whole learned state is a 256-row bucket-weight table
    (md5-prefix hashing — no vocabulary built or shipped, any shard
    scores independently): one map-side-combinable count aggregation
    fits it, a broadcast join + one doc-keyed shuffle applies it —
    100 TB-safe by construction. The weight ``(c_target * 10^6) DIV
    (c_target + c_background + 1)`` is an integer-exact monotone
    surrogate of DSIR's log-likelihood-ratio, which is what lets the
    full selection — weights, scores, tokens-normalized ranking,
    deterministic tie-break — hash-match a SQL oracle where the float
    LLR could not."""
    from ..operators.sampling import importance_select

    docs = load_table(spark, sf_dir, "documents")
    return importance_select(
        docs, F.col("source") == "src0", top_k=100
    ).select("doc_id", "n_toks", "score", "per_tok")
