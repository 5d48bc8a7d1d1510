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


def _safe_merge_batch(
    ranked: list[tuple[str, str, int]], boundary_n: int
) -> list[tuple[str, str, int]]:
    """Largest PREFIX of the round's global pair ranking that sequential
    BPE provably performs in exactly this order (so multi-merge rounds
    stay byte-exact vs the one-merge-per-round reference):

    1. Accept ranked pairs while pairwise symbol-DISJOINT; stop at the
       first conflict (skipping a conflict and continuing would diverge:
       a rejected-but-unaffected pair can outrank the next accepted one).
       Disjointness makes every accepted pair's count invariant under the
       earlier accepted merges, and destroyed pairs only lose count.
       A SELF-pair (left == right) is itself a conflict boundary: merging
       (z,z)->zz creates (zz,z)/(z,zz) whose counts are bounded by the
       self-pair's OWN count — not by the stop boundary — so a created
       pair can outrank (or lexicographically beat at a tie) anything
       accepted after it; nothing at or after a self-pair commits in the
       same round (repro: {'zzz'x7,'cd'x6} — sequential merges
       (z,z),(zz,z),(c,d); committing (c,d) beside (z,z) diverges).
    2. Truncate to counts STRICTLY above the stop boundary: the first
       conflicting pair's count, or ``boundary_n`` — the count of the
       first rank BEYOND the fetch window (0 when the window held the
       entire ranking). Pairs CREATED by an accepted merge (l,r)->lr are
       bounded by existing pairs sharing l or r — all conflicting, hence
       all at-or-below the boundary — so nothing created can outrank (or
       lexicographically tie) any accepted pair mid-batch. If the whole
       ranking fit with no conflict, nothing shares a symbol with any
       accepted pair, created-pair counts are zero, and the full prefix
       is safe.

    Falls back to the single globally-top-ranked pair (= plain
    sequential BPE) when the filter empties the batch — progress is
    always made, and a top-ranked self-pair merges alone.
    """
    batch: list[tuple[str, str, int]] = []
    used: set[str] = set()
    stop_n = boundary_n
    for left, right, n in ranked:
        if left == right or left in used or right in used:
            stop_n = n
            break
        batch.append((left, right, n))
        used.add(left)
        used.add(right)
    return [p for p in batch if p[2] > stop_n] or ranked[:1]


def _train_local(
    vocab: list[tuple[list[str], int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Sequential BPE over a driver-resident (symbols, freq) vocabulary —
    byte-identical to the distributed loop by definition (one merge at a
    time, exact counts, (left, right) tie-break): the distributed
    multi-merge batching is PROVEN equal to this (``_safe_merge_batch``),
    so equality is transitive."""
    merges: list[tuple[int, str, str, int]] = []
    from collections import Counter

    for rank in range(1, n_merges + 1):
        cnt: Counter = Counter()
        for syms, freq in vocab:
            for pair in zip(syms, syms[1:]):
                cnt[pair] += freq
        if not cnt:
            break
        (left, right), n = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((rank, left, right, int(n)))
        vocab = [
            (merge_word(s, left, right) if left in s else s, f)
            for s, f in vocab
        ]
    return merges


def bpe_train(
    docs: DataFrame,
    text_col: str,
    n_merges: int,
    max_merges_per_round: int = 32,
    max_driver_vocab: int = 100_000,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges from a document corpus.

    Returns the merge table as ``[(rank, left, right, pair_freq), ...]``
    — deterministic: pair counts are exact integers and ties break on
    (left, right), byte-identical to sequential single-merge BPE.

    Multi-merge rounds: each Spark round counts pairs ONCE and then
    commits the provably-safe prefix of the ranking (see
    :func:`_safe_merge_batch`) — up to ``max_merges_per_round`` merges
    per count job, cutting the driver round-trips a 32k-vocab training
    run needs by ~the batch factor while keeping the merge table
    byte-exact (tests/test_bpe_train.py gates parity, including an
    overlap-heavy corpus that forces 1-merge batches).

    Job-count envelope (the known BPE bottleneck — see SCALE.md §Text):
    each round is one Spark job over the vocabulary-sized word table
    plus a driver top-(window+1) collect; a 32k-merge run at the default
    window is ~32k/realized-batch jobs, where the realized batch grows
    toward the window as the symbol inventory grows (disjointness gets
    easier). ANY width is byte-exact — the width dial trades a slightly
    larger (still KB-sized) driver collect for fewer rounds. The
    non-exact escape hatch at larger vocabs is sampled pair counting
    (count pairs on a hash-sampled word subset, merge the argmax) —
    standard in practice but no longer byte-deterministic, so this repo
    ships the exact form.
    """
    from ..operators.text import tokens

    spark = docs.sparkSession
    # corpus -> deduplicated (word, freq): everything after this is
    # vocabulary-sized
    # eager=False: lineage still truncates (the requirement — plans must
    # not accrete across rounds) but materialization rides the NEXT
    # action (each round's pair-count collect) instead of a dedicated
    # job — halves the per-round job count of the driver-paced loop
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .select(F.expr("transform(split(w, ''), c -> c)").alias("syms"), "freq")
    ).localCheckpoint(eager=False)

    # DRIVER-LOCAL fit when the deduplicated vocabulary fits (r15): the
    # corpus pass above is the distributed work — everything after is
    # |vocab|-sized, and a vocabulary under the cap trains in
    # milliseconds on the driver vs ~0.3s of job latency PER MERGE ROUND
    # in the cluster loop (a driver-paced loop is round-trip-bound, not
    # data-bound; the broadcast-join small-side principle applied to the
    # fit). limit(cap+1) bounds the probe: an over-cap vocabulary
    # collects at most cap+1 rows and falls through to the distributed
    # rounds. Byte-exact either way (pytest parity gate).
    probe = words.limit(max_driver_vocab + 1).collect()
    if len(probe) <= max_driver_vocab:
        return _train_local(
            [(list(r["syms"]), int(r["freq"])) for r in probe], n_merges
        )

    merges: list[tuple[int, str, str, int]] = []
    window = max(1, max_merges_per_round)
    while len(merges) < n_merges:
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
        top = pairs.orderBy(F.desc("n"), "l", "r").limit(window + 1).collect()
        if not top:
            break
        ranked = [(r["l"], r["r"], int(r["n"])) for r in top[:window]]
        boundary_n = int(top[window]["n"]) if len(top) > window else 0
        batch = _safe_merge_batch(ranked, boundary_n)
        batch = batch[: n_merges - len(merges)]
        for left, right, n in batch:
            merges.append((len(merges) + 1, left, right, n))

        def apply_merges(batches, _ms=tuple(batch)):
            for pdf in batches:
                out = []
                for s in pdf["syms"]:
                    syms = list(s)
                    for left, right, _ in _ms:  # rank order within a word
                        syms = merge_word(syms, left, right)
                    out.append(syms)
                pdf["syms"] = out
                yield pdf

        words = words.mapInPandas(
            apply_merges, "syms array<string>, freq long"
        ).localCheckpoint(eager=False)  # materializes under next collect
    return merges


def encode_word(symbols: list[str], ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE word under a learned merge table: repeatedly apply the
    LOWEST-rank applicable merge (the standard BPE inference rule — rank
    order, not greedy-position order), until no merge applies."""
    while len(symbols) > 1:
        best = None
        for pair in zip(symbols, symbols[1:]):
            r = ranks.get(pair)
            if r is not None and (best is None or r < best[0]):
                best = (r, pair)
        if best is None:
            break
        symbols = merge_word(symbols, best[1][0], best[1][1])
    return symbols


def bpe_encode(
    docs: DataFrame,
    text_col: str,
    merges: list[tuple[int, str, str, int]],
    id_col: str = "doc_id",
) -> DataFrame:
    """ENCODE a corpus under a learned merge table — the inference half
    of the tokenizer (bpe_train learns it): per document, the token
    count after all applicable merges and an order-sensitive md5-derived
    fingerprint of the token sequence.

    Scale shape: the merge table is vocabulary-sized and rides the
    closure (the broadcast-vocab pattern — encoding shards
    independently, no shuffle at all until the caller aggregates), and
    each Arrow batch keeps a per-WORD memo cache, so a word repeated
    10^6 times across a batch encodes once (the word-frequency collapse
    applied at inference). Pure map stage: cost ∝ corpus tokens.

    No SQL oracle by design (the rank-order merge loop is inherently
    sequential — same policy as bpe_train); parity vs a pure-Python
    reference encoder is pytest-gated (tests/test_bpe_train.py).
    """
    import hashlib

    ranks = {(left, right): rank for rank, left, right, _ in merges}

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            memo: dict[str, list[str]] = {}
            ids, n_tokens, fps = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks: list[str] = []
                for w in str(text).split():
                    if w not in memo:
                        memo[w] = encode_word(list(w), ranks)
                    toks.extend(memo[w])
                fp = 0
                for i, t in enumerate(toks):
                    h = int.from_bytes(
                        hashlib.md5(f"{i}:{t}".encode()).digest()[:7], "big"
                    )
                    fp = (fp + h) % (1 << 61)
                ids.append(int(doc_id))
                n_tokens.append(len(toks))
                fps.append(fp)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "n_tokens": pd.Series(n_tokens, dtype="int64"),
                    "token_fp": pd.Series(fps, dtype="int64"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        enc, f"{id_col} long, n_tokens long, token_fp long"
    )
