"""Gate for distributed BPE training (operators/bpe.py): the learned
merge table must equal a pure-Python reference BPE byte for byte on the
same corpus — counts, picks, tie-breaks, and the leftmost non-overlapping
merge rule all included."""

from __future__ import annotations

import re
from collections import Counter

from weather_etl_docker_airflow_project_spark.operators.bpe import bpe_train, merge_word


def _py_bpe(texts: list[str], n_merges: int):
    words = Counter()
    for t in texts:
        for w in re.split(r"\s+", t):
            if w:
                words[w] += 1
    vocab = {tuple(w): f for w, f in words.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # max count, ties broken on (left, right) ascending
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, n))
        vocab = {
            tuple(merge_word(list(s), l, r)): f for s, f in vocab.items()
        }
    return merges


def test_spark_bpe_matches_python_reference(spark):
    texts = [
        "the theme of the thesis is thin threads",
        "in the thin inn the innkeeper thinks",
        "theory of the thermal thread in the theme",
        "a b a b a b ababab",   # overlap-heavy: exercises leftmost rule
        "zzzz zzz zz z",        # same-symbol runs
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = bpe_train(docs, "text", n_merges=8)
    want = _py_bpe(texts, 8)
    assert got == want


def test_merge_word_leftmost_non_overlapping():
    assert merge_word(list("aaa"), "a", "a") == ["aa", "a"]
    assert merge_word(list("abab"), "a", "b") == ["ab", "ab"]
    assert merge_word(["x"], "a", "b") == ["x"]
    assert merge_word([], "a", "b") == []
