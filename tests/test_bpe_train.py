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
    want = _py_bpe(texts, 8)
    # driver-local fit (vocab under the cap)
    assert bpe_train(docs, "text", n_merges=8) == want
    # distributed rounds (cap 0 forces the cluster loop)
    assert bpe_train(docs, "text", n_merges=8, max_driver_vocab=0) == want


def test_merge_word_leftmost_non_overlapping():
    assert merge_word(list("aaa"), "a", "a") == ["aa", "a"]
    assert merge_word(list("abab"), "a", "b") == ["ab", "ab"]
    assert merge_word(["x"], "a", "b") == ["x"]
    assert merge_word([], "a", "b") == []


def test_safe_merge_batch_prefix_rule():
    """Unit gates for the multi-merge batch selector: prefix stops at the
    FIRST conflict (not skip-and-continue), the boundary count filter is
    strict, and an all-tied head degrades to the sequential top-1."""
    from weather_etl_docker_airflow_project_spark.operators.bpe import _safe_merge_batch

    # disjoint prefix, conflict at rank 3 (shares 'b'): batch = first two,
    # both counts above the conflict's 5
    assert _safe_merge_batch(
        [("a", "b", 10), ("c", "d", 8), ("b", "e", 5), ("f", "g", 4)], 0
    ) == [("a", "b", 10), ("c", "d", 8)]
    # conflict count TIES an accepted pair -> strict filter drops it
    assert _safe_merge_batch(
        [("a", "b", 10), ("c", "d", 8), ("b", "e", 8)], 0
    ) == [("a", "b", 10)]
    # conflict ties the TOP pair -> fallback to sequential top-1
    assert _safe_merge_batch([("a", "b", 10), ("a", "c", 10)], 0) == [
        ("a", "b", 10)
    ]
    # no conflict but window exhausted: unseen boundary filters the tail
    assert _safe_merge_batch(
        [("a", "b", 10), ("c", "d", 6)], 6
    ) == [("a", "b", 10)]
    # self-pair occupies its symbol
    assert _safe_merge_batch([("z", "z", 9), ("z", "y", 7), ("w", "x", 6)], 0) == [
        ("z", "z", 9)
    ]
    # self-pair is a conflict BOUNDARY even against disjoint later pairs:
    # merging (z,z)->zz creates (zz,z) with count 7 > 6, which sequential
    # BPE merges before (c,d) — so (c,d) must NOT commit in this round
    assert _safe_merge_batch([("z", "z", 14), ("c", "d", 6)], 0) == [
        ("z", "z", 14)
    ]
    # pairs ranked ABOVE a self-pair still batch (strictly above its count)
    assert _safe_merge_batch([("a", "b", 20), ("z", "z", 14), ("c", "d", 6)], 0) == [
        ("a", "b", 20)
    ]


def test_multi_merge_parity_self_pair_regression(spark):
    """End-to-end repro from the round-5 advice: {'zzz' x7, 'cd' x6}.
    Sequential merge order is (z,z,14),(zz,z,7),(c,d,6); a batch that
    commits (c,d) beside (z,z) reorders it. Must be byte-exact at every
    batch width."""
    texts = ["zzz"] * 7 + ["cd"] * 6
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want = _py_bpe(texts, 3)
    assert [m[1:3] for m in want] == [("z", "z"), ("zz", "z"), ("c", "d")]
    for width in (1, 2, 4, 8, 32):
        got = bpe_train(
            docs, "text", n_merges=3, max_merges_per_round=width,
            max_driver_vocab=0,  # force the distributed batching rule
        )
        assert got == want, f"width={width}"


def test_multi_merge_parity_randomized(spark):
    """Randomized adversarial parity: tiny alphabets make nearly every
    pair share symbols (worst case for batching), larger ones let real
    multi-pair batches form; both must stay byte-identical to the
    sequential pure-Python reference, at several batch widths."""
    import random

    for seed, alphabet in [(1, "ab"), (2, "abc"), (3, "abcdef"), (4, "abcdefgh")]:
        rng = random.Random(seed)
        texts = [
            " ".join(
                "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9)))
                for _ in range(rng.randint(3, 12))
            )
            for _ in range(25)
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        want = _py_bpe(texts, 10)
        for width in (1, 4, 8, 32):
            # max_driver_vocab=0 forces the DISTRIBUTED multi-merge loop
            # (the driver-local fit would otherwise absorb these tiny
            # corpora and leave the batching rule untested)
            got = bpe_train(
                docs, "text", n_merges=10, max_merges_per_round=width,
                max_driver_vocab=0,
            )
            assert got == want, f"seed={seed} width={width}"


def test_bpe_encode_matches_python_reference(spark):
    """The Spark encoder (broadcast merge table + per-word memo) must
    reproduce a pure-Python rank-order reference encoder exactly:
    per-doc token counts AND the order-sensitive sequence fingerprint;
    and encoding the training corpus must yield tokens consistent with
    the learned vocab (no un-merged adjacent pair that the table
    covers)."""
    import hashlib

    from weather_etl_docker_airflow_project_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
        encode_word,
    )

    texts = [
        "the theme of the thesis is thin threads",
        "in the thin inn the innkeeper thinks",
        "theory of the thermal thread in the theme",
        "unseen wordage arrives here",   # contains chars outside training
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_train(docs.filter("doc_id < 3"), "text", n_merges=8)
    ranks = {(l, r): rank for rank, l, r, _ in merges}

    def py_encode(text):
        toks = []
        for w in text.split():
            toks.extend(encode_word(list(w), ranks))
        return toks

    got = {
        r["doc_id"]: (r["n_tokens"], r["token_fp"])
        for r in bpe_encode(docs, "text", merges).collect()
    }
    for i, t in enumerate(texts):
        toks = py_encode(t)
        fp = 0
        for j, tok in enumerate(toks):
            h = int.from_bytes(hashlib.md5(f"{j}:{tok}".encode()).digest()[:7], "big")
            fp = (fp + h) % (1 << 61)
        assert got[i] == (len(toks), fp), i
    # vocab-consistency on single words: after encoding, no WITHIN-word
    # adjacent pair remains that the merge table covers (saturation)
    for w in ("the", "theme", "thin", "threads"):
        enc = encode_word(list(w), ranks)
        assert all((a, b) not in ranks for a, b in zip(enc, enc[1:])), w
