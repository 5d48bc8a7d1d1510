"""Unit + property tests for the LLM-pipeline operators (SURVEY.md §2.11).

The driver's oracle gate covers engine-vs-DuckDB agreement; these tests
cover the *semantics* on crafted inputs: dedup correctness, LSH recall
properties, fingerprint monotonicity, and the multimodal plumbing."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.operators import (
    dedup,
    multimodal,
    similarity,
    text,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),        # exact dup of 1
    (3, "the quick brown fox jumps over the sleepy dog"),      # near dup of 1
    (4, "completely different words appear here entirely now"),
    (5, "el rapido zorro marron salta sobre el perro"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup(docs):
    out = {r["doc_id"]: r for r in dedup.exact_dedup(docs, "doc_id", "text").collect()}
    assert out[1]["is_canonical"] and out[1]["group_size"] == 2
    assert not out[2]["is_canonical"] and out[2]["canonical_id"] == 1
    assert all(out[i]["is_canonical"] for i in (3, 4, 5))


def test_minhash_identical_docs_always_pair(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_pairs(docs, "doc_id", "text").collect()}
    assert (1, 2) in pairs          # identical shingle sets -> identical bands
    assert (1, 4) not in pairs      # disjoint shingles share no bucket
    assert (1, 5) not in pairs


def test_simhash_identity_and_separation(spark, docs):
    sig = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(docs, "doc_id", "text").collect()}
    assert sig[1] == sig[2]
    assert 0 <= sig[1] < 2**32
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_neardup_pairs(
            spark.createDataFrame(
                [(k, v) for k, v in sig.items()], ["doc_id", "simhash"]
            ),
            "doc_id",
            max_hamming=3,
        ).collect()
    }
    assert pairs[(1, 2)] == 0


def test_ngram_jaccard_exact_values(docs):
    rows = {
        (r["id_a"], r["id_b"]): (r["inter"], r["uni"])
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold_pct=50).collect()
    }
    assert rows[(1, 2)][0] == rows[(1, 2)][1]           # identical: inter == union
    # docs 1 & 3 differ in one word => 7 shingles each, 5 shared 3-grams
    assert rows[(3, 1) if (3, 1) in rows else (1, 3)] == (5, 9)
    assert not any({a, b} == {1, 4} for a, b in rows)


def test_knn_self_is_top1(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 7)
    top = similarity.knn_bruteforce(emb, q, k=5).collect()
    assert top[0]["vec_id"] == 7                        # self-similarity is max
    dots = [r["dot_q"] for r in top]
    assert dots == sorted(dots, reverse=True)
    assert abs(dots[0] - similarity.QUANT**2) < 0.01 * similarity.QUANT**2


def test_ann_results_are_exact_scores_from_query_bucket(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 7)
    ann = similarity.ann_lsh_bucketed(emb, q, k=10, n_planes=8, dim=64).collect()
    brute = {r["vec_id"]: r["dot_q"] for r in similarity.knn_bruteforce(emb, q, k=10**6).collect()}
    ids = [r["vec_id"] for r in ann]
    assert 7 in ids                                     # query shares its own bucket
    for r in ann:                                       # ANN never fabricates scores
        assert brute[r["vec_id"]] == r["dot_q"]


def test_connected_components_multihop_chain(spark):
    """A 5-node chain (10-11-12-13-14) plus a separate pair and an
    isolated star: labels propagate across hops to the component min."""
    from weather_etl_docker_airflow_project_spark.operators.components import (
        canonical_members,
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (13, 12), (13, 14),   # chain, shuffled edges
         (2, 7),                                    # separate pair
         (20, 21), (20, 22), (20, 23)],             # star
        ["id_a", "id_b"],
    )
    cc = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert {cc[n] for n in (10, 11, 12, 13, 14)} == {10}
    assert cc[2] == cc[7] == 2
    assert {cc[n] for n in (20, 21, 22, 23)} == {20}
    canon = {
        r["doc_id"]
        for r in canonical_members(connected_components(pairs))
        .filter(F.col("is_canonical"))
        .collect()
    }
    assert canon == {10, 2, 20}


def test_connected_components_raises_when_not_converged(spark):
    """A label needs one round per hop to reach the component minimum; a
    budget smaller than the chain diameter must raise, never return
    silently-split clusters."""
    from weather_etl_docker_airflow_project_spark.operators.components import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10, 18)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iterations=2)
    ok = {
        r["cluster_id"]
        for r in connected_components(chain, max_iterations=20).collect()
    }
    assert ok == {10}


def test_hot_bucket_cap_bounds_pair_volume(spark):
    """max_bucket_size drops over-popular buckets: identical docs in a
    small group still pair, while a hot 20-doc bucket is excluded."""
    docs = spark.createDataFrame(
        [(i, "the same boilerplate text repeated everywhere") for i in range(20)]
        + [(100, "rare unique document pair alpha"), (101, "rare unique document pair alpha")],
        ["doc_id", "text"],
    )
    sig = dedup.minhash_signatures(dedup.shingles(docs, "doc_id", "text"), "doc_id")
    capped = dedup.lsh_candidate_pairs(sig, "doc_id", max_bucket_size=5)
    pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in pairs
    assert not any(a < 20 and b < 20 for a, b in pairs)
    uncapped = dedup.lsh_candidate_pairs(sig, "doc_id")
    assert len({(r["id_a"], r["id_b"]) for r in uncapped.collect()}) == 190 + 1


def test_ann_multiprobe_improves_recall(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 7)
    brute = [r["vec_id"] for r in similarity.knn_bruteforce(emb, q, k=20).collect()]
    single = {r["vec_id"] for r in similarity.ann_lsh_bucketed(emb, q, k=20).collect()}
    multi = {
        r["vec_id"]
        for r in similarity.ann_lsh_bucketed(emb, q, k=20, multiprobe=8).collect()
    }
    assert single <= multi                      # probes only add candidates
    recall_s = len(single & set(brute)) / 20
    recall_m = len(multi & set(brute)) / 20
    assert recall_m >= recall_s                 # more probes never hurt
    assert 7 in multi                           # self always retrieved
    assert recall_m > 0


def test_ivf_cells_partition_corpus_and_search_recall(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cells = similarity.ivf_cells(emb, seed_modulus=125)
    n = emb.count()
    assert cells.count() == n                       # total partition, no loss
    assert cells.select("vec_id").distinct().count() == n
    seeds = {r["cell"] for r in cells.select("cell").distinct().collect()}
    assert seeds <= {r["vec_id"] for r in emb.filter(F.col("vec_id") % 125 == 0).collect()}
    # every seed assigns to its own cell (self-dot is max)
    own = cells.filter(F.col("vec_id") % 125 == 0)
    assert all(r["vec_id"] == r["cell"] for r in own.collect())

    q = emb.filter(F.col("vec_id") == 7)
    found = similarity.ivf_search(emb, q, k=10, n_probe=2, seed_modulus=125)
    rows = found.collect()
    assert rows[0]["vec_id"] == 7                   # query in its own cell
    brute = {r["vec_id"]: r["dot_q"] for r in similarity.knn_bruteforce(emb, q, k=10**6).collect()}
    assert all(brute[r["vec_id"]] == r["dot_q"] for r in rows)  # exact scores


def test_embedding_bucketed_neardup_subset_and_recall(spark):
    """The declared banded-LSH near-dup never fabricates pairs (subset of
    the exact kernel, identical dots) and holds recall at the declared
    threshold; the plan is band-bucketed — no cartesian product."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = {
        (r["id_a"], r["id_b"]): r["dot_q"]
        for r in similarity.embedding_neardup_pairs(emb, threshold=0.40).collect()
    }
    bucketed_df = similarity.embedding_neardup_pairs_bucketed(emb, threshold=0.40)
    plan = bucketed_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    bucketed = {(r["id_a"], r["id_b"]): r["dot_q"] for r in bucketed_df.collect()}
    assert set(bucketed) <= set(exact)              # verify stage: no false pairs
    for k, v in bucketed.items():
        assert exact[k] == v                        # identical exact dots
    assert len(bucketed) / len(exact) >= 0.6        # 8x4 banding recall floor


def test_simhash_declared_cap_drops_only_hot_buckets(spark, docs):
    """With a cap far above every bucket's population, capped == uncapped."""
    sig = dedup.simhash_signatures(docs, "doc_id", "text")
    uncapped = {(r["id_a"], r["id_b"]) for r in dedup.simhash_neardup_pairs(sig, "doc_id").collect()}
    capped = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_neardup_pairs(sig, "doc_id", max_bucket_size=1000).collect()
    }
    assert capped == uncapped


def test_ann_recall_gates(spark):
    """Numeric recall@20 floors vs brute force at sf0.01, averaged over
    queries. IVF is the strong path on this corpus (directional clusters
    align with cells; measured 0.55-1.0 per query) and gates at 0.5.
    Hyperplane-LSH multiprobe is structurally recall-limited here — top-20
    neighbors sit at cos ~0.5, i.e. per-plane collision ~0.67 vs 0.5
    background, weak contrast — so its gate is the measured floor (~0.10-
    0.20), asserting the dial works, not that LSH fits this geometry."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    ivf_recalls, multi_recalls = [], []
    for qid in (0, 7, 42):
        q = emb.filter(F.col("vec_id") == qid)
        brute = {r["vec_id"] for r in similarity.knn_bruteforce(emb, q, k=20).collect()}
        ivf = {
            r["vec_id"]
            for r in similarity.ivf_search(emb, q, k=20, n_probe=2, seed_modulus=125).collect()
        }
        multi = {
            r["vec_id"]
            for r in similarity.ann_lsh_bucketed(emb, q, k=20, multiprobe=8).collect()
        }
        ivf_recalls.append(len(ivf & brute) / 20)
        multi_recalls.append(len(multi & brute) / 20)
    assert sum(ivf_recalls) / len(ivf_recalls) >= 0.5
    assert sum(multi_recalls) / len(multi_recalls) >= 0.10


def test_ivf_kmeans_recall_gate(spark):
    """Learned-quantizer IVF (no SQL oracle possible) earns its place with
    a numeric recall floor vs brute force: avg recall@20 >= 0.5 probing 3
    of 8 KMeans cells at sf0.01 (measured ~0.67)."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    recalls = []
    for qid in (0, 7, 42):
        q = emb.filter(F.col("vec_id") == qid)
        brute = {r["vec_id"] for r in similarity.knn_bruteforce(emb, q, k=20).collect()}
        got = {
            r["vec_id"]
            for r in similarity.ivf_kmeans_search(
                emb, q, k=20, n_cells=8, n_probe=3
            ).collect()
        }
        assert len(got) == 20
        recalls.append(len(got & brute) / 20)
    assert sum(recalls) / len(recalls) >= 0.5


def test_fingerprint_empty_doc_is_null_not_error(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one two three")], ["doc_id", "text"]
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(df, "doc_id", "text").collect()}
    assert fp[1] is None and fp[2] is None
    assert fp[3] is not None


def test_fingerprint_append_monotone(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, base), (2, base + " lambda mu nu xi omicron")], ["doc_id", "text"]
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(df, "doc_id", "text").collect()}
    # appending only adds windows: the min can only stay or decrease
    assert fp[2] <= fp[1]


def test_boilerplate_shingles_per_group(spark):
    """A 3-gram repeated across docs of the same source is flagged; the
    same 3-gram split across different sources is not."""
    df = spark.createDataFrame(
        [
            (1, "srcA", "all rights reserved unique alpha words here"),
            (2, "srcA", "all rights reserved other beta content words"),
            (3, "srcB", "all rights reserved but only one doc here"),
        ],
        ["doc_id", "source", "text"],
    )
    flagged = {
        (r["source"], r["shingle"]): r["n_docs"]
        for r in text.boilerplate_shingles(df, "doc_id", "text", "source").collect()
    }
    assert flagged[("srcA", "all rights reserved")] == 2
    assert not any(src == "srcB" for src, _ in flagged)


def test_redact_pii_masks_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b@test.com or c@x.org now"),
            (2, "no addresses at all"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in text.redact_pii(df, "doc_id", "text").collect()}
    assert out[1]["n_emails"] == 2
    assert out[1]["redacted"] == "mail me at [EMAIL] or [EMAIL] now"
    assert out[2]["n_emails"] == 0 and out[2]["redacted"] == "no addresses at all"


def test_repetition_stats_detects_loops(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c a b c"),     # 12 tokens, 10 grams, 3 distinct
            (2, "all twelve tokens here are totally distinct from one another yes ok"),
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in text.repetition_stats(df, "doc_id", "text").collect()}
    assert out[1]["n_grams"] == 10 and out[1]["n_distinct_grams"] == 3
    assert out[1]["dup_gram_pct"] == 70
    assert out[2]["dup_gram_pct"] == 0
    assert out[3]["n_grams"] == 0 and out[3]["dup_gram_pct"] == 0


def test_gopher_rules_flags(spark):
    long_ok = " ".join(["word"] * 20)                    # 20 words, mean 4
    short = "too short"                                  # fails word count
    symbols = " ".join(["ok"] * 16 + ["###"] * 4)        # 20% symbol tokens
    df = spark.createDataFrame(
        [(1, long_ok), (2, short), (3, symbols)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in text.gopher_rules(df, "doc_id", "text").collect()}
    assert out[1]["keep"] and out[1]["mean_word_len"] == 4
    assert not out[2]["keep"] and not out[2]["ok_word_count"]
    assert not out[3]["keep"] and not out[3]["ok_symbol_ratio"]
    assert out[3]["n_symbol_tokens"] == 4 and out[3]["ok_word_count"]


def test_lang_id_real_stopwords(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "le chat et les chiens pour la maison"),
            (3, "zzz qqq www"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["pred_lang"] for r in text.lang_id(df, "doc_id", "text").collect()}
    assert out[1] == "en" and out[2] == "fr" and out[3] == "und"


def test_split_stable_partitioned_and_proportional(spark):
    from weather_etl_docker_airflow_project_spark.operators.sampling import (
        stratified_sample,
        train_val_test_split,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    s1 = train_val_test_split(docs, "doc_id")
    s2 = train_val_test_split(docs.repartition(7), "doc_id")  # layout-proof
    a = {(r["doc_id"], r["split"]) for r in s1.select("doc_id", "split").collect()}
    b = {(r["doc_id"], r["split"]) for r in s2.select("doc_id", "split").collect()}
    assert a == b                                   # identical on any layout
    counts = {r["split"]: r["count"] for r in s1.groupBy("split").count().collect()}
    n = sum(counts.values())
    assert n == docs.count()
    assert 0.7 < counts["train"] / n < 0.9          # ~80/10/10
    assert counts["val"] + counts["test"] == n - counts["train"]

    samp = stratified_sample(docs, "doc_id", {"en": 100}, "lang")
    assert samp.count() == docs.filter(F.col("lang") == "en").count()  # pct=100 keeps all
    assert stratified_sample(docs, "doc_id", {}, "lang").count() == 0


def test_multimodal_features_and_stub(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "a b")], ["doc_id", "text"])
    mm = multimodal.attach_payload(df, "doc_id", "text")
    meta = {r["doc_id"]: r["meta"] for r in mm.collect()}
    assert meta[1]["format"] == "text/utf-8" and meta[1]["byte_len"] == 3
    feats = {r["doc_id"]: r for r in multimodal.byte_features(mm).collect()}
    assert feats[1]["byte_len"] == 3
    assert feats[1]["checksum"] == (97 + 98 + 99) % 997
    assert feats[2]["first_byte"] == 97 and feats[2]["last_byte"] == 98
    with pytest.raises(ValueError):
        multimodal.decode_media(b"\x00")                 # no known container
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\x00", fmt="pixels")   # full decode: stub


def test_video_container_roundtrip_and_frame_sample(spark):
    payload = multimodal.encode_video([10, 20, 30, 40, 50])
    frames = multimodal.decode_video_frames(payload)
    assert len(frames) == 5
    assert frames[2] == bytes([30]) * multimodal.VID_FRAME_LEN
    with pytest.raises(ValueError):
        multimodal.decode_video_frames(b"nope")
    with pytest.raises(NotImplementedError):
        multimodal.resize_image(payload, 32, 32)

    df = spark.createDataFrame([(1, "abcdef")], ["doc_id", "text"])
    video = multimodal.synthesize_video(df, "doc_id", "text")
    sampled = multimodal.frame_sample(video, every_n=2).collect()
    # 6 frames, stride 2 -> indices 0, 2, 4 with checksum 64*byte % 997
    got = {(r["frame_idx"], r["frame_checksum"]) for r in sampled}
    assert got == {
        (i, (multimodal.VID_FRAME_LEN * ord("abcdef"[i])) % 997) for i in (0, 2, 4)
    }


def test_media_header_roundtrip_local():
    """Encoder and parser agree for every container, including dimension
    values whose bytes would betray an endianness mix-up (258 = 0x0102)."""
    for enc, fmt in [
        (multimodal.encode_png_header, "image/png"),
        (multimodal.encode_jpeg_header, "image/jpeg"),
        (multimodal.encode_gif_header, "image/gif"),
    ]:
        out = multimodal.decode_media(enc(258, 513))
        assert out == {"format": fmt, "width": 258, "height": 513}, fmt


def test_media_decode_dataflow(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "ab cd"), (2, "x" * 700)], ["doc_id", "text"]
    )
    media = multimodal.synthesize_media(df, "doc_id", "text")
    dims = {r["doc_id"]: r for r in multimodal.media_dimensions(media).collect()}
    assert dims[0]["media_format"] == "image/png"
    assert dims[1]["media_format"] == "image/jpeg"
    assert dims[2]["media_format"] == "image/gif"
    assert dims[0]["width"] == 5 % 640 + 16 and dims[0]["height"] == 3 % 480 + 16
    assert dims[2]["width"] == 700 % 640 + 16 and dims[2]["height"] == 1 % 480 + 16
