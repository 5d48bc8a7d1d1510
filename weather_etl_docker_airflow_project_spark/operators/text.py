"""Text-analysis operators for LLM data pipelines (SURVEY.md §2.11 L4).

All pure column expressions (whole-stage codegen, zero Python in the hot
path): token/character statistics, a quality score, n-gram-overlap language
ID, and a winnowing-style rolling-hash document fingerprint. Each has an
exact DuckDB-SQL twin in ``plans/llm_q.py`` for the driver's hash gate —
outputs are integers or fixed-literal strings wherever possible so the
comparison is exact, not float-tolerant.

Scale notes (100 TB posture): everything here is embarrassingly parallel
per document — no shuffle at all until a later aggregation; the only
explode is bounded by tokens-per-doc. The language-ID stopword tables are
tiny fixed literals (broadcast by construction, they live inside the
expression).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.xhash import h16

# Tiny per-language stopword lists for the n-gram-heuristic language ID.
# Deliberately small fixed literals: the operator is the heuristic itself,
# not a model. Order matters only via the deterministic argmax tie-break.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "and", "of", "to", "in", "is", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por"),
    "fr": ("le", "la", "et", "les", "des", "un", "que", "pour"),
}

FINGERPRINT_WINDOW = 8       # tokens per rolling window
FINGERPRINT_BASE = 31        # polynomial base; 31^7 * 2^16 * 8 < 2^63


def tokens(text: Column) -> Column:
    """Whitespace tokenization with empty-token cleanup.

    ``split`` on one-or-more whitespace plus a filter keeps parity with SQL
    engines that drop empties differently; on already-clean single-space
    text it is the identity split."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != F.lit(""))


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token statistics — all integers, all exact.

    ``n_tokens_bpe`` approximates BPE token count: whitespace tokens plus
    one extra split per letter<->digit transition, counted with a
    lookaround-free pattern so RE2-based engines (the DuckDB oracle)
    compute the identical value."""
    toks = tokens(F.col(text_col))
    transitions = F.size(
        F.regexp_extract_all(
            F.col(text_col), F.lit("[a-z][0-9]|[0-9][a-z]"), F.lit(0)
        )
    )
    return df.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        (F.size(toks) + transitions).cast("long").alias("n_tokens_bpe"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("sum_token_len"),
    )


def term_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus term statistics: per-token document frequency + collection
    frequency. One explode + one hash aggregation (map-side partial agg
    combines within partitions before the single shuffle)."""
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    return tok.groupBy("token").agg(
        F.countDistinct(id_col).alias("doc_freq"),
        F.count("*").alias("coll_freq"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic document quality: length band + type-token ratio band +
    English-stopword presence, summed to an integer 0-100 score.

    Integer bands (not float ratios) keep the oracle hash exact."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    en = F.array([F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), en))
    length_pts = (
        F.when(n >= 64, 40).when(n >= 32, 30).when(n >= 16, 20).otherwise(5)
    )
    # type-token ratio in integer percent; floor (not cast) so the oracle
    # can mirror it exactly — DuckDB's double->int cast rounds, Spark's
    # truncates, floor agrees everywhere. NULL for zero-token docs (ANSI
    # mode raises DIVIDE_BY_ZERO without the guard).
    ttr_pct = F.when(n > 0, F.floor(F.lit(100) * n_distinct / n)).cast("long")
    diversity_pts = (
        F.when(ttr_pct >= 60, 40).when(ttr_pct >= 30, 25).otherwise(10)
    )
    stop_pts = F.when(n_stop >= 2, 20).when(n_stop >= 1, 10).otherwise(0)
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        ttr_pct.alias("ttr_pct"),
        n_stop.cast("long").alias("n_en_stopwords"),
        (length_pts + diversity_pts + stop_pts).cast("long").alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """N-gram-heuristic language ID: count distinct-token overlap with each
    language's stopword list; argmax with deterministic (count desc, lang
    asc) tie-break; 'und' when nothing matches."""
    distinct_toks = F.array_distinct(tokens(F.col(text_col)))
    overlaps = [
        F.size(
            F.array_intersect(distinct_toks, F.array([F.lit(w) for w in ws]))
        ).alias(f"ov_{lang}")
        for lang, ws in sorted(LANG_STOPWORDS.items())
    ]
    scored = df.select(F.col(id_col), *overlaps)
    # argmax via struct max: (count, -rank) so ties resolve to the
    # lexicographically SMALLEST language (rank = position in sorted order)
    pairs = F.array(
        *[
            F.struct(
                F.col(f"ov_{lang}").alias("cnt"),
                F.lit(-rank).alias("neg_rank"),
                F.lit(lang).alias("lang"),
            )
            for rank, lang in enumerate(sorted(LANG_STOPWORDS))
        ]
    )
    best = F.array_max(pairs)  # struct compare: cnt first, then neg_rank
    return scored.select(
        F.col(id_col),
        F.when(best["cnt"] > 0, best["lang"]).otherwise("und").alias("pred_lang"),
        best["cnt"].cast("long").alias("lang_score"),
    )


def boilerplate_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    min_docs: int = 2,
) -> DataFrame:
    """Per-group boilerplate detection: word 3-gram shingles appearing in
    >= min_docs documents of the SAME group (source/site) are template
    chrome, not content — the standard pre-dedup cleanup in web-corpus
    pipelines (site navigation, footers, legal banners repeat within a
    site, not across sites).

    One explode + one (group, shingle) hash aggregation; map-side partial
    counts combine before the single shuffle. Callers anti-join a doc's
    shingles against this table to strip boilerplate."""
    from ..operators.dedup import shingles

    # group_col rides THROUGH the explode (r15): the old join-back
    # attached it by shuffling the corpus-sized EXPLODED shingle table
    # on id — carrying one small column per row removes that
    # join/shuffle outright (guide §3.3: explode before a join
    # multiplies the shuffle)
    sh = shingles(
        df.select(id_col, group_col, text_col),
        id_col,
        text_col,
        carry_cols=[group_col],
    )
    return (
        sh.groupBy(group_col, "shingle")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Within-document repetition (a standard LLM quality signal: highly
    repetitive documents are boilerplate/spam/generation loops): the
    fraction of word 3-grams that are duplicates of an earlier 3-gram in
    the same document. Integer outputs only — counts plus a floor'd
    percentage — so the oracle hash is exact."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    k = 3
    n_grams = F.greatest(n - k + 1, F.least(n, F.lit(1)))  # 0 only if no tokens
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i.cast("int"), k)),
    )
    n_distinct = F.size(F.array_distinct(grams))
    return df.select(
        F.col(id_col),
        n_grams.cast("long").alias("n_grams"),
        F.when(n > 0, n_distinct).otherwise(0).cast("long").alias("n_distinct_grams"),
        F.when(
            n > 0, F.floor(F.lit(100) * (n_grams - n_distinct) / n_grams)
        )
        .otherwise(0)
        .cast("long")
        .alias("dup_gram_pct"),
    )


# Gopher-style document filter bounds (public MassiveText heuristics class:
# word-count window, mean-word-length window, max symbol ratio)
GOPHER_MIN_WORDS = 16
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 2   # inclusive lower bound, integer floor'd
GOPHER_MAX_MEAN_WORD_LEN = 12
GOPHER_MAX_SYMBOL_PCT = 10     # % of tokens that are symbols (#, ...)


def gopher_rules(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Composite rule-based document filter in the Gopher/MassiveText
    style: word-count window, mean-word-length window, symbol-token ratio
    cap. Emits the per-rule booleans plus the combined keep flag so a
    pipeline can both filter and audit WHY documents fell out. All
    integer/boolean arithmetic — exact in any engine."""
    toks = tokens(F.col(text_col))
    n = F.size(toks).cast("long")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    # mean word length floor'd to an integer: engine-exact, no float division
    mean_len = F.when(n > 0, F.floor(sum_len / n)).otherwise(0).cast("long")
    n_symbols = F.size(
        F.filter(toks, lambda t: t.rlike("^[^a-zA-Z0-9]+$"))
    ).cast("long")
    ok_words = (n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS)
    ok_mean = (mean_len >= GOPHER_MIN_MEAN_WORD_LEN) & (
        mean_len <= GOPHER_MAX_MEAN_WORD_LEN
    )
    ok_symbols = F.lit(100) * n_symbols <= F.lit(GOPHER_MAX_SYMBOL_PCT) * n
    return df.select(
        F.col(id_col),
        n.alias("n_words"),
        mean_len.alias("mean_word_len"),
        n_symbols.alias("n_symbol_tokens"),
        ok_words.alias("ok_word_count"),
        ok_mean.alias("ok_mean_word_len"),
        ok_symbols.alias("ok_symbol_ratio"),
        (ok_words & ok_mean & ok_symbols).alias("keep"),
    )


# Case-insensitive classes, +tags, hyphenated and multi-label domains
# (user@mail.co.uk, First.Last+tag@Example.com) — RE2-compatible (no
# lookaround) so the DuckDB oracle computes the identical match set.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\\.[A-Za-z0-9-]+)*\\.[A-Za-z]{2,}"


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Mask email addresses (the representative PII class — same pattern
    extends to phones/SSNs) and report the redaction count per document.
    Pure column expressions; the regex is RE2-compatible so the DuckDB
    oracle computes the identical result."""
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.regexp_replace(F.col(text_col), EMAIL_RE, "[EMAIL]").alias("redacted"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Winnowing-style document fingerprint: polynomial rolling hash over
    every FINGERPRINT_WINDOW-token window (16-bit token hashes keep the
    polynomial inside int64), fingerprint = min window hash. Robust to
    appends far from the matching region, unlike a whole-doc hash."""
    toks = tokens(F.col(text_col))
    th = F.transform(toks, lambda t: h16(t))
    w = FINGERPRINT_WINDOW
    n = F.size(th)
    win = F.least(F.lit(w), n)
    # window start positions 1..n-win+1 (1-based element_at)
    starts = F.sequence(F.lit(1), n - win + 1)
    window_hash = lambda s: F.aggregate(  # noqa: E731
        F.sequence(F.lit(0), win - 1),
        F.lit(0).cast("long"),
        lambda acc, i: acc * FINGERPRINT_BASE + F.element_at(th, (s + i).cast("int")),
    )
    # guard: zero-token docs make win=0, so sequence(0, win-1) would be the
    # descending [0,-1] and element_at(th, 0) raises — emit NULL instead
    fp = F.array_min(F.transform(starts, window_hash))
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.when(n > 0, fp).alias("fingerprint"),
    )


# GPT-2-style pretokenizer classes, lookaround-free and whitespace-explicit
# so Java regex (Spark) and RE2 (DuckDB) compute the identical split:
# letter runs | single digits | single non-alnum-non-space marks.
BPE_PRETOKEN_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\r]"


def bpe_pretokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """BPE pretokenization statistics: the split a byte-pair tokenizer
    applies BEFORE merges — letter runs stay whole, every digit is its own
    token (GPT-2 convention), punctuation marks split individually. The
    pretoken count upper-bounds the real BPE token count and is the
    standard corpus-budget estimator when the merge table isn't in the
    engine. Pure per-row map: zero Exchange at any scale."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_RE), F.lit(0))
    alpha = F.filter(toks, lambda t: t.rlike("^[A-Za-z]+$"))
    digit = F.filter(toks, lambda t: t.rlike("^[0-9]$"))
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_pretokens"),
        F.size(alpha).cast("long").alias("n_alpha_runs"),
        F.size(digit).cast("long").alias("n_digits"),
        (F.size(toks) - F.size(alpha) - F.size(digit))
        .cast("long")
        .alias("n_marks"),
    )


def ngram_counts(
    df: DataFrame, id_col: str, text_col: str, top_k: int = 100
) -> DataFrame:
    """Count-based bigram language-model table — the classic corpus
    statistic behind perplexity-style quality scoring and contamination
    probes: for the ``top_k`` most frequent bigrams, the bigram count,
    the left-token continuation mass, and the conditional probability
    P(r|l) in exact integer micro-units (``(10^6 * cnt) div left_total``
    — integer division, so both engines agree bit-for-bit; no float ever
    appears).

    Scale shape: one explode of per-document token arrays into bigram
    structs (map-side; documents with <2 tokens are filtered before the
    explode), ONE corpus-scale shuffle for the (l, r) count (map-side
    combinable), then a vocabulary²-sized window over l for the
    continuation mass — the base corpus is read exactly once, and the
    final top-k is a TakeOrderedAndProject, never a global sort. This is
    the word-frequency-collapse trick again (cf. operators/bpe.py): the
    expensive aggregate happens at corpus scale once, every derived
    statistic is computed on the collapsed table."""
    from pyspark.sql import Window

    bg = (
        df.select(tokens(F.col(text_col)).alias("_toks"))
        .filter(F.size("_toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(slice(_toks, 1, size(_toks) - 1), "
                    "(t, i) -> struct(t AS l, _toks[i + 1] AS r))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy("l")
    return (
        bg.withColumn("left_total", F.sum("cnt").over(w).cast("long"))
        .withColumn(
            "prob_micros", F.expr("(1000000 * cnt) div left_total").cast("long")
        )
        .orderBy(F.desc("cnt"), "l", "r")
        .limit(top_k)
    )


def lm_familiarity(
    df: DataFrame, id_col: str, text_col: str, train_mod: int = 2
) -> DataFrame:
    """Score every document under a bigram LM trained on a held-in slice
    of the corpus (``id % train_mod == 0``) — the perplexity-style
    quality signal a training pipeline uses to rank/filter documents,
    kept hash-exact by staying in integer micro-probability units
    (``P(r|l)`` as ``(10^6 * cnt) div left_total``; averaging by integer
    division) instead of log-space floats.

    Per document: ``n_bigrams`` (token bigram occurrences), ``n_unseen``
    (bigrams absent from the LM — the contamination/novelty counter),
    and ``familiarity_micros`` = mean micro-probability of its bigrams
    (unseen bigrams contribute 0; NULL for documents with <2 tokens).

    Scale shape: the LM fit is one corpus-scale map-side-combinable
    bigram count over the train slice plus a vocabulary-sized window for
    the left-continuation mass; scoring is ONE equi-join of per-doc
    bigram occurrences against the vocab²-bounded LM table on ``(l, r)``
    followed by a per-doc aggregate — the corpus is read once, nothing
    is quadratic, and the join key is the natural bucketing for a
    persisted LM table at 100 TB.
    """
    bg_doc = (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .filter(F.size("_toks") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    "transform(slice(_toks, 1, size(_toks) - 1), "
                    "(t, i) -> struct(t AS l, _toks[i + 1] AS r))"
                )
            ).alias("p"),
        )
        .select(F.col(id_col), F.col("p.l").alias("l"), F.col("p.r").alias("r"))
    )
    from pyspark.sql import Window

    lm = (
        bg_doc.filter(F.col(id_col) % train_mod == 0)
        .groupBy("l", "r")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy("l")
    lm = lm.withColumn("left_total", F.sum("cnt").over(w)).select(
        "l", "r", F.expr("(1000000 * cnt) div left_total").cast("long").alias("prob_micros")
    )
    sc = (
        bg_doc.join(lm, ["l", "r"], "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(F.when(F.col("prob_micros").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_unseen"),
            F.sum(F.coalesce(F.col("prob_micros"), F.lit(0))).cast("long").alias("_sp"),
        )
    )
    return (
        df.select(id_col)
        .join(sc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce(F.col("n_unseen"), F.lit(0)).cast("long").alias("n_unseen"),
            F.expr("CAST(CASE WHEN n_bigrams > 0 THEN _sp div n_bigrams END AS BIGINT)").alias(
                "familiarity_micros"
            ),
        )
    )
