"""Distributed BPE tokenizer TRAINING (the corpus-scale half of the l4
tokenizer surface — l4_bpe_pretokens applies a pretokenizer; this LEARNS
the merge table).

Classic byte-pair-encoding fit: words start as character sequences, and
each round (1) counts adjacent symbol pairs across the whole corpus
weighted by word frequency, (2) picks the most frequent pair
(deterministic tie-break on the pair itself), (3) merges that pair —
left-to-right, non-overlapping, the standard BPE merge rule — in every
word. The learned merge table IS the tokenizer.

Scale shape (100 TB corpus): the expensive part of every round is the
pair count — one explode over (word, freq) rows into (pair, freq) and a
map-side-combinable sum; the argmax is a tiny driver-side top-1. The
merge rewrite is an Arrow-batched mapInPandas over the DEDUPLICATED word
table (vocabulary-sized, not corpus-sized — the classic BPE trick: fit on
word frequencies, so a trillion-token corpus costs one initial word-count
shuffle and then |vocab|-sized rounds). Each round localCheckpoints the
word table to cut lineage, same per-round policy as PageRank/components.

Why no SQL oracle (rows-only + pytest vs a pure-Python reference,
tests/test_bpe_train.py): the merge rule is inherently sequential within
a word (leftmost non-overlapping), which SQL string/list functions cannot
express faithfully — the same policy as the other iterative operators
(l3_ivf_kmeans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def merge_word(symbols: list[str], left: str, right: str) -> list[str]:
    """Apply one BPE merge to one word: leftmost, non-overlapping."""
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == left and symbols[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def bpe_train(docs: DataFrame, text_col: str, n_merges: int) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges from a document corpus.

    Returns the merge table as ``[(rank, left, right, pair_freq), ...]``
    — deterministic: pair counts are exact integers and ties break on
    (left, right).
    """
    from ..operators.text import tokens

    spark = docs.sparkSession
    # corpus -> deduplicated (word, freq): everything after this is
    # vocabulary-sized
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .select(F.expr("transform(split(w, ''), c -> c)").alias("syms"), "freq")
    ).localCheckpoint()

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs = (
            words.select(
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, size(syms) - 1), "
                        "(s, i) -> struct(s AS l, syms[i + 1] AS r))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), "l", "r").limit(1).collect()
        if not top:
            break
        left, right, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
        merges.append((rank, left, right, n))

        def apply_merge(batches, _l=left, _r=right):
            import pandas as pd

            for pdf in batches:
                pdf["syms"] = [
                    merge_word(list(s), _l, _r) for s in pdf["syms"]
                ]
                yield pdf

        words = words.mapInPandas(
            apply_merge, "syms array<string>, freq long"
        ).localCheckpoint()
    return merges
