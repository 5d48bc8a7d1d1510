"""Deterministic sampling and dataset splitting for training pipelines
(SURVEY.md §2.11 extensions — the selection stage between dedup and
training).

Everything here derives selection decisions from md5-based hashes of the
row's own key (``functions.xhash.h32``), never from RNG state: the same
row lands in the same split on any cluster, any engine, any day — the
property that makes splits reproducible, joinable, and oracle-checkable.
``df.sample``/``sampleBy`` trade that stability for statistical
randomness; use them when reproducibility-by-key doesn't matter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.xhash import h32

SPLIT_BUCKETS = 100


def split_bucket(key: Column, salt: str = "split") -> Column:
    """Stable bucket in [0, 100) from the key (salted so different splits
    of the same table decorrelate)."""
    return h32(F.concat(F.lit(salt + ":"), key.cast("string"))) % SPLIT_BUCKETS


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Assign every row a deterministic 'train'/'val'/'test' label by key
    hash: bucket < train_pct -> train, < train_pct+val_pct -> val, else
    test. Percentages are integers so the thresholds are exact."""
    b = split_bucket(F.col(key_col), salt)
    return df.withColumn(
        "split",
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def sequence_packing_bins(
    df: DataFrame,
    key_col: str,
    length_col: str,
    capacity: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Contiguous-fill sequence packing: order documents by key, then cut
    the running token total into capacity-sized bins (bin_id =
    floor((cumsum - len) / capacity) — the bin the document STARTS in).
    Deterministic; documents longer than the capacity occupy their
    starting bin and spill (callers chunk those upstream).

    Contiguous fill is the distributed-friendly packing: true first-fit
    bin packing is inherently sequential (that variant is
    :func:`sequence_packing_firstfit`), while this is a running total —
    computed via the two-pass distributed prefix
    (operators/sweep.two_pass_prefix), NOT one global cumsum window:
    the numeric key range (per-corpus min/max, one broadcast scalar
    aggregate) splits into ``n_buckets`` equal-width, order-preserving
    buckets; bucket-local cumsums run in parallel and only the
    bucket-count-sized offset table crosses a single task. Identical
    output to the textbook ``SUM() OVER (ORDER BY key)`` cut (prefix
    sums decompose associatively; the l6_sequence_packing oracle states
    the single-window form and hash-matches). Keys must be numeric and
    unique (they address documents)."""
    from .sweep import two_pass_prefix

    rng = df.agg(
        F.min(F.col(key_col)).cast("double").alias("_mn"),
        F.max(F.col(key_col)).cast("double").alias("_mx"),
    )
    bucketed = df.crossJoin(F.broadcast(rng)).withColumn(
        "_bkt",
        F.least(
            F.lit(n_buckets - 1),
            F.floor(
                (F.col(key_col).cast("double") - F.col("_mn"))
                * n_buckets
                / F.greatest(F.col("_mx") - F.col("_mn"), F.lit(1e-9))
            ),
        ).cast("int"),
    )
    cum = two_pass_prefix(
        bucketed, "_bkt", [key_col], F.col(length_col).cast("long"), "_cum"
    )
    return cum.select(
        F.col(key_col),
        F.col(length_col),
        F.floor((F.col("_cum") - F.col(length_col)) / capacity)
        .cast("long")
        .alias("bin_id"),
    )


def sequence_packing_firstfit(
    df: DataFrame,
    key_col: str,
    length_col: str,
    capacity: int,
    n_shards: int = 32,
) -> DataFrame:
    """Per-shard FIRST-FIT sequence packing (the refinement over
    :func:`sequence_packing_bins` named in NOTES.md): documents shard by
    ``key % n_shards``, and within a shard are placed in deterministic key
    order into the LOWEST-numbered bin with room, opening a new bin when
    none fits. Unlike contiguous fill, bins never exceed ``capacity``
    (except a single oversize document, which gets a bin of its own), and
    the remainder a large document would strand is back-filled by later
    small documents — strictly tighter packing than any sequential cut.

    True first-fit is inherently sequential, so it runs as
    ``applyInPandas`` per shard: shards pack INDEPENDENTLY and in
    parallel — at 100 TB parallelism is ``n_shards`` (dial it to the
    cluster), each shard's state is just its bin-load list, and the output
    bin id is (shard, bin_in_shard) so ids never collide across shards.
    The inner scan is O(bins) per doc (fine at training-shard sizes;
    a segment tree over bin loads is the classical escalation).

    Returns (key, length, shard, bin_id) with bin_id LOCAL to the shard."""
    from pyspark.sql.types import LongType, StructField, StructType

    key_field = df.schema[key_col]
    out_schema = StructType(
        [
            StructField(key_col, key_field.dataType, key_field.nullable),
            StructField(length_col, LongType(), True),
            StructField("shard", LongType(), False),
            StructField("bin_id", LongType(), False),
        ]
    )

    def pack(pdf):
        import pandas as pd  # noqa: F811 — executor-side import

        pdf = pdf.sort_values(key_col, kind="mergesort")
        loads: list[int] = []
        bins: list[int] = []
        for length in pdf[length_col].astype("int64"):
            for i, ld in enumerate(loads):
                if ld + length <= capacity:
                    loads[i] = ld + length
                    bins.append(i)
                    break
            else:
                bins.append(len(loads))
                loads.append(int(length))
        return pd.DataFrame(
            {
                key_col: pdf[key_col].to_numpy(),
                length_col: pdf[length_col].astype("int64").to_numpy(),
                "shard": pdf["_shard"].astype("int64").to_numpy(),
                "bin_id": bins,
            }
        )

    sharded = df.select(
        F.col(key_col),
        F.col(length_col).cast("long").alias(length_col),
        (F.col(key_col) % n_shards).cast("long").alias("_shard"),
    )
    return sharded.groupBy("_shard").applyInPandas(pack, out_schema)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, int],
    strata_col: str,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its hash bucket
    falls below its stratum's integer percentage. Rows in strata absent
    from ``fractions`` are dropped. Unlike ``df.sampleBy`` the selection
    is a pure function of (key, stratum), so reruns and backfills pick
    the identical sample."""
    b = split_bucket(F.col(key_col), salt)
    pct = None
    for stratum, p in sorted(fractions.items()):
        cond = F.col(strata_col) == stratum
        pct = F.when(cond, F.lit(p)) if pct is None else pct.when(cond, F.lit(p))
    pct = F.lit(0) if pct is None else pct.otherwise(F.lit(0))
    return df.filter(b < pct)


def oversample_mix(
    df: DataFrame,
    key_col: str,
    weights_pct: dict[str, int],
    strata_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Epoch-aware corpus mixing with fractional repeat factors — the
    training-mix primitive where a domain's weight can EXCEED 1 (repeat
    high-quality data) or sit below 1 (subsample): weight is an integer
    percentage (250 = 2.5 epochs). Every row gets ``weight // 100`` full
    copies plus one more iff its hash bucket falls below ``weight % 100``
    — so the expected epoch count is exact per stratum and the choice of
    which rows carry the fractional epoch is a pure function of (key,
    stratum), reproducible on any engine. Output carries ``copy_id`` so
    downstream shuffles see distinct rows.

    Scale: the explode multiplies rows BEFORE any shuffle, but weights are
    small constants (<= a few epochs), and the explode is map-side — the
    right order is mix -> tokenize -> pack, never pack -> mix. Strata
    absent from ``weights_pct`` are dropped (weight 0)."""
    b = split_bucket(F.col(key_col), salt)
    w = None
    for stratum, p in sorted(weights_pct.items()):
        if p < 0:
            raise ValueError(f"negative weight for stratum {stratum!r}: {p}")
        cond = F.col(strata_col) == stratum
        w = F.when(cond, F.lit(p)) if w is None else w.when(cond, F.lit(p))
    w = F.lit(0) if w is None else w.otherwise(F.lit(0))
    n_copies = (w / 100).cast("long") + (b < w % 100).cast("long")
    return (
        df.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") > 0)  # Spark sequence(0,-1) counts DOWN
        .withColumn(
            "copy_id",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("_n_copies") - 1)),
        )
        .drop("_n_copies")
    )


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic global permutation for training-corpus order: every
    row gets a (shard, shard_pos) address where shard = key-hash mod
    n_shards and shard_pos ranks the hash within the shard (key as
    tie-break, so equal 32-bit hashes still order totally).  Reading
    shards 0..n-1 each in shard_pos order replays the identical
    pseudo-random document order on any engine, any rerun, any cluster
    size — the property epoch shuffling needs that ``orderBy(rand())``
    cannot give.

    Scale: ONE hash shuffle on the uniform shard key + an in-partition
    sort — never a global sort.  Pick n_shards >= the cluster's write
    parallelism; the hash is uniform so shards stay balanced."""
    hv = h32(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    out = df.withColumn("_hv", hv).withColumn(
        "shard", (F.col("_hv") % n_shards).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("_hv", key_col)
    return (
        out.withColumn("shard_pos", F.row_number().over(w).cast("long"))
        .drop("_hv")
    )


def weighted_bernoulli_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    salt: str = "wsample",
) -> DataFrame:
    """Weight-proportional Bernoulli sampling, EXACT and deterministic:
    row kept iff ``u * max_w < w * 2^32`` where ``u`` is the md5-derived
    32-bit uniform of the row's key and ``max_w`` the corpus max weight —
    i.e. inclusion probability w/max_w, decided by integer
    cross-multiplication so no float division can disagree at a boundary
    between engines. This is the quality-weighted document sampling stage
    of a corpus pipeline (longer / higher-scoring documents kept
    proportionally more often), reproducible by key like every sampler in
    this module.

    Scale: the decision is a pure per-row codegen predicate against one
    broadcast scalar (max_w) — no shuffle, no RNG state, restart-safe.
    Weights must be non-negative integers (raises otherwise at plan
    level via the cast contract; floats would reintroduce rounding)."""
    u = h32(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    mx = df.agg(F.max(F.col(weight_col)).cast("long").alias("_max_w"))
    return (
        df.crossJoin(F.broadcast(mx))
        .filter(u * F.col("_max_w") < F.col(weight_col).cast("long") * F.lit(2**32))
        .drop("_max_w")
    )


def importance_select(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 100,
    scale: int = 1_000_000,
    n_buckets_hex: int = 2,
) -> DataFrame:
    """DSIR-style importance-weighted data selection (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    rank a raw corpus by its hashed-n-gram affinity to a TARGET domain
    and keep the top-k — the "pick the web pages that look like my
    high-quality domain" primitive of every pretraining-data pipeline.

    Shape: (1) hash every token to one of 16^n_buckets_hex buckets
    (md5-prefix — engine-portable, no vocabulary to build or ship, the
    same property that makes the hashing-trick vectorizer shard-safe);
    (2) ONE map-side-combinable aggregation counts each bucket's target
    vs background occurrences — the whole "model" is a 256-row weight
    table, broadcast everywhere, so the method scales to 100 TB by
    construction; (3) each background document scores the sum of its
    tokens' weights, one shuffle keyed by document. The weight is an
    integer-exact surrogate of DSIR's log-likelihood ratio:
    ``w[b] = (c_target[b] * scale) DIV (c_target[b] + c_background[b]
    + 1)`` — monotone in the target's share of the bucket, +1-smoothed
    against never-seen buckets, and (unlike the float LLR) bit-identical
    across engines, so the whole selection is ORACLE-HASHABLE. Ranking
    is tokens-normalized (``per_tok = (score * 1000) DIV n_toks``) with
    doc-id tie-break — a deterministic total order. Documents with no
    tokens carry no evidence and are not selected."""
    from .text import tokens

    toks = docs.select(
        F.col(id_col),
        target_pred.alias("_is_target"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    n_hex = n_buckets_hex
    bucket = F.expr(
        f"CAST(conv(substr(md5(tok), 1, {n_hex}), 16, 10) AS BIGINT)"
    )
    counts = toks.select(F.col("_is_target"), bucket.alias("b")).groupBy("b").agg(
        F.sum(F.col("_is_target").cast("long")).alias("c_t"),
        F.sum((~F.col("_is_target")).cast("long")).alias("c_g"),
    )
    weights = counts.select(
        "b", F.expr(f"(c_t * {scale}L) DIV (c_t + c_g + 1L)").alias("w")
    )
    scored = (
        toks.filter(~F.col("_is_target"))
        .select(id_col, bucket.alias("b"))
        # every background bucket exists in the count table by
        # construction, so this broadcast join is effectively inner
        .join(F.broadcast(weights), "b", "inner")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.sum("w").cast("long").alias("score"),
        )
    )
    return (
        scored.withColumn(
            "per_tok", F.expr("(score * 1000L) DIV n_toks").cast("long")
        )
        .orderBy(F.desc("per_tok"), id_col)
        .limit(top_k)
    )
