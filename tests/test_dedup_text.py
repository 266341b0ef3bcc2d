"""Dedup + text-analysis operator tests, including the LSH properties."""
from __future__ import annotations

from pyspark.sql import functions as F

from mgo_liveagent_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash_dedup,
)
from mgo_liveagent_data_pipeline_spark.operators.textops import (
    fingerprint,
    language_id,
    quality_score,
    token_counts,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog", "en", "web"),
    (2, "the quick brown fox jumps over the lazy dog", "en", "web"),  # exact dup
    (3, "the quick brown fox jumps over a lazy dog", "en", "web"),  # near dup
    (4, "completely different text with other words entirely", "en", "web"),
    (5, "lorem ipsum dolor sit amet consectetur adipiscing", "la", "book"),
]


def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "lang", "source"])


def test_exact_dedup_groups_identical(spark):
    out = {
        r["content_hash"]: (r["keep_id"], r["n_copies"])
        for r in exact_dedup(docs_df(spark)).collect()
    }
    assert sorted(n for _, n in out.values()) == [1, 1, 1, 2]
    dup = [v for v in out.values() if v[1] == 2][0]
    assert dup[0] == 1  # lowest key kept


def test_minhash_signature_shape_and_determinism(spark):
    df = docs_df(spark)
    s1 = minhash_signature(df, num_hashes=8).collect()
    s2 = minhash_signature(df.repartition(4), num_hashes=8).collect()
    m1 = {r["key"]: r["sig"] for r in s1}
    m2 = {r["key"]: r["sig"] for r in s2}
    assert m1 == m2  # parallelism-invariant
    assert all(len(sig) == 8 for sig in m1.values())
    assert m1[1] == m1[2]  # identical docs → identical signatures


def test_lsh_finds_exact_and_near_dups(spark):
    # bands=8 (r=2): collision probability ≈0.97 at J≈0.6 — near-dup pair
    # reliably surfaces; default r=4 is tuned for larger corpora
    pairs = minhash_lsh_dedup(
        docs_df(spark), num_hashes=16, bands=8, shingle_k=2, threshold=0.3
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard_sim"] for r in pairs}
    assert got[(1, 2)] == 1.0
    assert (1, 3) in got and 0.3 <= got[(1, 3)] < 1.0
    # canonical ordering property: every pair has id_a < id_b
    assert all(a < b for a, b in got)


def test_simhash_clusters_identical_docs(spark):
    out = simhash_dedup(docs_df(spark)).collect()
    assert len(out) == 1
    assert out[0]["keep_id"] == 1 and out[0]["n_docs"] == 2


def test_ngram_pairs_respect_blocks(spark):
    pairs = ngram_jaccard_pairs(
        docs_df(spark), block_cols=("lang", "source"), shingle_k=2, threshold=0.3
    ).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in ids
    # doc 5 is in another block — never compared
    assert not any(5 in p for p in ids)


def test_language_id(spark):
    out = {r["doc_id"]: r["lang_pred"] for r in language_id(docs_df(spark)).collect()}
    assert out[1] == "en"
    assert out[5] == "other"


def test_quality_score_features(spark):
    row = {
        r["doc_id"]: r for r in quality_score(docs_df(spark)).collect()
    }[1]
    assert row["n_tokens"] == 9
    assert row["quality"] == 0.0  # < 10 tokens fails the length gate


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "ab cd, ef 12!")], ["doc_id", "text"])
    r = token_counts(df).collect()[0]
    assert r["ws_tokens"] == 4
    # bpe-ish: ab, cd, ',', ef, 12, '!'
    assert r["bpe_tokens"] == 6
    assert r["approx_llm_tokens"] == len("ab cd, ef 12!") // 4


def test_fingerprint_word_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "b a c"), (2, "c b a"), (3, "a b d")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_frame_sample_reassembles(spark):
    from mgo_liveagent_data_pipeline_spark.operators.multimodal import (
        frame_sample,
        to_media_column,
    )

    df = spark.createDataFrame([(1, "a" * 100), (2, "xy")], ["doc_id", "text"])
    out = frame_sample(to_media_column(df), frame_len=64).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 2  # 100 bytes → 64 + 36
    assert sorted(r["frame_bytes"] for r in by_doc[1]) == [36, 64]
    assert len(by_doc[2]) == 1 and by_doc[2][0]["frame_bytes"] == 2
    assert all(r["frame_md5"] for r in out)


def test_stratified_hash_sample_is_deterministic_and_rate_accurate(spark):
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        stratified_hash_sample,
    )

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr") for i in range(2000)],
        ["doc_id", "lang"],
    )
    kept = stratified_hash_sample(df, "lang", {"en": 0.25}, "doc_id")
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").count()
              .withColumnRenamed("count", "n").collect()}
    assert counts["fr"] == 1000  # unlisted stratum kept in full
    assert 150 < counts["en"] < 350  # ~25% of 1000, hash-binomial spread
    # same input → identical survivor set (no RNG state)
    again = stratified_hash_sample(df, "lang", {"en": 0.25}, "doc_id")
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_tfidf_ranks_distinctive_terms_first(spark):
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        tfidf_top_terms,
    )

    df = spark.createDataFrame(
        [
            (1, "common zebra zebra"),
            (2, "common yak yak"),
            (3, "common common common"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in tfidf_top_terms(df, k=1).collect()}
    # the doc-unique term beats the everywhere-term
    assert out[1]["term"] == "zebra"
    assert out[2]["term"] == "yak"
    assert out[3]["term"] == "common"
    # rational idf: tf * (N+1)/(df+1) = 2 * 4/2 = 4.0 for the unique terms
    assert out[1]["tfidf"] == 4.0


def test_chunk_documents_windows_and_overlap(spark):
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        chunk_documents,
    )

    words = " ".join(f"w{i}" for i in range(95))
    df = spark.createDataFrame([(1, words), (2, "short text")], ["doc_id", "text"])
    out = chunk_documents(df, chunk_tokens=50, overlap=10).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_no"]] = r
    # 95 tokens, stride 40 → ceil(85/40) = 3 chunks: 50, 50, 15 tokens
    assert sorted(by_doc[1]) == [0, 1, 2]
    assert [by_doc[1][i]["n_chunk_tokens"] for i in (0, 1, 2)] == [50, 50, 15]
    # consecutive chunks share the 10-token overlap
    c0 = by_doc[1][0]["chunk_text"].split()
    c1 = by_doc[1][1]["chunk_text"].split()
    assert c0[-10:] == c1[:10]
    # short docs yield exactly one whole-doc chunk
    assert list(by_doc[2]) == [0] and by_doc[2][0]["chunk_text"] == "short text"


def test_winnow_fingerprint_selects_window_minima(spark):
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        winnow_fingerprint,
    )

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "pack my box with five dozen liquor jugs now"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["fingerprint"] for r in winnow_fingerprint(df).collect()}
    assert out[1] == out[2]  # identical content → identical print
    # disjoint content → disjoint gram hashes → different print (NB: a
    # small *edit* may legitimately evade — winnowing only guarantees
    # shared prints for shared substrings of length ≥ w + k − 1)
    assert out[1] != out[3]
    assert out[4]  # empty text still yields a (degenerate-gram) print


def test_winnow_overlap_pairs_finds_planted_passage(spark):
    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        winnow_overlap_pairs,
    )

    passage = (
        "a distinctive shared passage that is long enough to survive "
        "winnow selection across documents"
    )
    df = spark.createDataFrame(
        [
            (1, "intro text before the quote. " + passage + " and a tail."),
            (2, "completely different framing here; " + passage),
            (3, "no shared material whatsoever in this one, nothing at all"),
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnow_overlap_pairs(df, min_shared=3).collect()
    }
    assert (1, 2) in pairs  # shifted copy still collides (position-free)
    assert all(3 not in p for p in pairs)


def test_resize_and_audio_features_deterministic(spark):
    import hashlib

    from mgo_liveagent_data_pipeline_spark.operators.multimodal import (
        audio_features,
        resize_image,
        to_media_column,
    )

    df = to_media_column(
        spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    )
    r = resize_image(df, width=640, height=480).collect()[0]
    assert r["n_bytes"] == 11
    assert r["width"] == 640 and r["height"] == 480
    assert (
        r["resized_md5"]
        == hashlib.md5(b"hello world" + b"640x480").hexdigest()
    )
    a = audio_features(df, sample_rate=16000).collect()[0]
    assert a["n_bytes"] == 11
    assert a["sample_rate"] == 16000
    assert a["duration_ms"] == 11 * 1000 // 16000


def test_rh_lsh_buckets_identical_vectors(spark):
    from mgo_liveagent_data_pipeline_spark.operators.annsearch import rh_lsh_topk

    vec = [float(i % 7 - 3) for i in range(64)]
    other = [float((i * 3) % 11 - 5) for i in range(64)]
    corpus = spark.createDataFrame(
        [(1, vec), (2, vec), (3, other)],
        "vec_id long, embedding array<double>",
    )
    queries = corpus.where("vec_id = 1").selectExpr(
        "vec_id as query_id", "embedding"
    )
    out = rh_lsh_topk(corpus, queries, k=5, num_planes=8, dim=64).collect()
    ids = {r["corpus_id"] for r in out}
    assert 2 in ids  # identical vector shares every sign bit
    top = [r for r in out if r["rank"] == 1][0]
    assert top["corpus_id"] == 2 and top["cosine_sim"] == 1.0


def test_rh_multiprobe_recall_superset_of_single_probe(spark):
    from mgo_liveagent_data_pipeline_spark.operators.annsearch import (
        rh_lsh_topk,
        rh_multiprobe_topk,
    )

    # deterministic corpus: 40 distinct vectors, queries are the first 3
    rows = [
        (i, [float(((i * 7 + d * 13) % 19) - 9) for d in range(64)])
        for i in range(40)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.where("vec_id < 3").selectExpr(
        "vec_id as query_id", "embedding"
    )
    single = rh_lsh_topk(corpus, queries, k=5, num_planes=8, dim=64).collect()
    multi = rh_multiprobe_topk(corpus, queries, k=5, num_planes=8, dim=64).collect()
    s_pairs = {(r["query_id"], r["corpus_id"]) for r in single}
    m_cands = {(r["query_id"], r["corpus_id"]) for r in multi}
    # every single-probe candidate that ranked is reachable by multi-probe
    # (identical bucket is probe 0), and multi-probe never finds fewer
    assert len(multi) >= len(single)
    # single-probe results may be displaced from the top-k by better
    # multi-probe candidates, but recall never drops below single-probe
    # when k is not binding
    if len(multi) < 3 * 5:
        assert s_pairs <= m_cands


def test_repetition_metrics_known_fractions(spark):
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        repetition_metrics,
    )

    df = spark.createDataFrame(
        [
            # "a b a b a b": 6 tokens, 2 distinct -> dup_token 4/6;
            # 4 positional 3-grams: "a b a","b a b","a b a","b a b"
            # -> 2 distinct -> dup_shingle 2/4
            (1, "a b a b a b"),
            (2, "all words here are unique tokens"),  # no repeats
            (3, "x y"),  # shorter than the 3-gram window
            (4, ""),  # empty doc
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    assert rows[1]["n_tokens"] == 6 and rows[1]["n_shingles"] == 4
    assert rows[1]["dup_token_frac"] == round(4 / 6, 6)
    assert rows[1]["dup_shingle_frac"] == 0.5
    assert rows[2]["dup_token_frac"] == 0.0
    assert rows[2]["dup_shingle_frac"] == 0.0
    assert rows[3]["n_shingles"] == 0 and rows[3]["dup_shingle_frac"] == 0.0
    assert rows[4]["n_tokens"] == 0 and rows[4]["dup_token_frac"] == 0.0


def test_pii_scrub_redacts_and_counts(spark):
    from mgo_liveagent_data_pipeline_spark.operators.textops import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "mail a.user+tag@example.co.uk or call 25-989-741-2988 now"),
            (2, "server at 10.0.255.7 responded"),
            (3, "nothing sensitive here 123-45"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert rows[1]["n_email"] == 1 and rows[1]["n_phone"] == 1
    assert rows[1]["text_redacted"] == "mail <EMAIL> or call <PHONE> now"
    assert rows[2]["n_ipv4"] == 1
    assert rows[2]["text_redacted"] == "server at <IP> responded"
    assert rows[3]["n_email"] == rows[3]["n_phone"] == rows[3]["n_ipv4"] == 0
    assert rows[3]["text_redacted"] == "nothing sensitive here 123-45"


def test_pii_scrub_phone_formats(spark):
    """Round-4 mandate: the phone pattern covers the common PH/intl
    free-form shapes, while ISO dates stay unredacted."""
    from mgo_liveagent_data_pipeline_spark.operators.textops import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "reach me at +639171234567 today"),
            (2, "landline (02) 8888-8888 after 5pm"),
            (3, "mobile 0917-123-4567 or 0917 123 4567"),
            (4, "meeting on 2024-01-15 at 10:30 sharp"),
            (5, "ref 12345678901234567 is an id, not a phone"),
            (6, "(02)8888-8888 works without the space"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert rows[1]["n_phone"] == 1
    assert rows[1]["text_redacted"] == "reach me at <PHONE> today"
    assert rows[2]["n_phone"] == 1
    assert rows[2]["text_redacted"] == "landline <PHONE> after 5pm"
    assert rows[3]["n_phone"] == 2
    assert rows[3]["text_redacted"] == "mobile <PHONE> or <PHONE>"
    # dates and long opaque ids are NOT phone numbers
    assert rows[4]["n_phone"] == 0
    assert rows[4]["text_redacted"] == "meeting on 2024-01-15 at 10:30 sharp"
    assert rows[5]["n_phone"] == 0
    assert rows[6]["n_phone"] == 1
    assert rows[6]["text_redacted"] == "<PHONE> works without the space"


def test_ivf_kmeans_centroids_balance_and_determinism(spark):
    """One Lloyd iteration from the deterministic seeds: posting lists stay
    non-degenerate (no empty cluster, no mega-cluster), the refinement is
    bit-reproducible run-to-run, and ivf_topk accepts the refined centroids
    with identical output shape."""
    from mgo_liveagent_data_pipeline_spark.operators.annsearch import (
        assign_nearest,
        ivf_centroids_kmeans,
        ivf_topk,
    )
    from mgo_liveagent_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = ivf_centroids_kmeans(emb, iterations=1)
    got = {
        r["cluster_id"]: r["centroid"] for r in cents.collect()
    }
    assert len(got) == 10  # one refined centroid per seed label
    assert all(len(v) == 64 for v in got.values())
    # determinism: a second computation reproduces the centroids exactly
    again = {
        r["cluster_id"]: r["centroid"]
        for r in ivf_centroids_kmeans(emb, iterations=1).collect()
    }
    assert got == again

    # posting-list balance: every cluster keeps members, and the largest
    # stays within 3x the ideal share (500/10 = 50) — the production
    # credibility the raw first-vector pick can't promise
    sizes = {
        r["cluster_id"]: r["n"]
        for r in assign_nearest(emb, cents)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(sizes) == 10 and min(sizes.values()) >= 1
    assert max(sizes.values()) <= 3 * (500 / 10)

    # the probe path accepts refined centroids: same schema, k rows/query
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(emb, queries, k=5, query_key="query_id", centroids=cents)
    rows = out.collect()
    assert out.columns == ["query_id", "corpus_id", "cosine_sim", "rank"]
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_q) == {0, 1, 2}
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_lsh_mega_bucket_cap_drops_boilerplate_but_keeps_true_dups(spark):
    """Docs sharing only a boilerplate pool collide on band buckets; the
    cap drops those candidates while a true duplicate pair (identical
    text) still surfaces through its uncapped bands."""
    boiler = "shared header footer legal disclaimer contact us terms"
    rows = [(i, boiler, "en", "web") for i in range(100)]
    rows += [
        (200, "a genuinely unique duplicated document body here", "en", "web"),
        (201, "a genuinely unique duplicated document body here", "en", "web"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    capped = minhash_lsh_dedup(
        df, num_hashes=16, bands=8, shingle_k=2, threshold=0.3,
        max_bucket_size=10,
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in capped}
    assert (200, 201) in pairs  # true dup survives (its own buckets are size 2)
    assert not any(a < 100 and b < 100 for a, b in pairs)  # boilerplate capped
    # uncapped run DOES enumerate the boilerplate cluster — the cap is
    # what changed, not the corpus
    uncapped = minhash_lsh_dedup(
        df, num_hashes=16, bands=8, shingle_k=2, threshold=0.3,
        max_bucket_size=None,
    )
    assert uncapped.count() > len(capped)


def test_simhash_near_dup_hamming_radius(spark):
    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        simhash_fingerprint,
        simhash_near_dup,
    )

    out = simhash_near_dup(docs_df(spark), radius=1).collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming_dist"] for r in out}
    assert pairs[(1, 2)] == 0  # identical docs → identical fingerprints
    # every reported pair is within the radius, and the distances agree
    # with a direct fingerprint comparison
    fps = {
        r["key"]: r["simhash"]
        for r in simhash_fingerprint(docs_df(spark)).collect()
    }
    for (a, b), d in pairs.items():
        true_d = sum(x != y for x, y in zip(fps[a], fps[b]))
        assert d == true_d <= 1


def test_real_audio_decode_matches_independent_reference(spark):
    """The stdlib-wave decode path must reproduce the fixture's expected
    features, which are computed from the raw sample arrays by pure
    integer math (writer and reader are independent implementations)."""
    from pyspark.sql import types as T

    from mgo_liveagent_data_pipeline_spark.operators.multimodal import (
        real_audio_features,
        wav_fixture_clips,
    )

    clips = wav_fixture_clips()
    df = spark.createDataFrame(
        [(c["clip_id"], bytearray(c["payload"])) for c in clips],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("media", T.BinaryType()),
            ]
        ),
    )
    got = {r["doc_id"]: r.asDict() for r in real_audio_features(df).collect()}
    assert len(got) == len(clips)
    for c in clips:
        g = got[c["clip_id"]]
        for k in (
            "n_bytes", "content_md5", "sample_rate", "n_channels",
            "n_frames", "duration_ms", "rms", "peak",
        ):
            assert g[k] == c[k], (c["clip_id"], k, g[k], c[k])


def test_real_audio_decode_rejects_non_pcm16():
    """Sample widths other than 16-bit still need external codecs — the
    NotImplementedError contract survives for genuinely-undecodable
    formats."""
    import io
    import struct
    import wave

    import pytest

    from mgo_liveagent_data_pipeline_spark.operators.multimodal import (
        real_audio_decode,
    )

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)  # 8-bit PCM
        w.setframerate(8000)
        w.writeframes(struct.pack("<4B", 1, 2, 3, 4))
    with pytest.raises(NotImplementedError):
        real_audio_decode(buf.getvalue())


def test_dedup_apply_min_key_and_quality_winner(spark):
    """dedup_apply keeps exactly one survivor per cluster plus all
    singletons; default rule picks the cluster-min key, quality mode
    picks the score argmax (ties → lowest key)."""
    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        connected_components,
        dedup_apply,
        exact_star_edges,
    )

    docs = spark.createDataFrame(
        [
            (1, "same text", 0.2),
            (2, "same text", 0.9),
            (3, "same text", 0.9),
            (4, "unique a", 0.5),
            (5, "other dup", 0.1),
            (6, "other dup", 0.1),
        ],
        ["doc_id", "text", "quality"],
    )
    clusters = connected_components(exact_star_edges(docs))

    kept = dedup_apply(docs, clusters, "doc_id")
    got = {r["doc_id"]: r["n_merged"] for r in kept.collect()}
    # 2 clusters + 1 singleton = 3 survivors
    assert got == {1: 3, 4: 1, 5: 2}

    kept_q = dedup_apply(docs, clusters, "doc_id", quality_col="quality")
    got_q = {r["doc_id"]: r["n_merged"] for r in kept_q.collect()}
    # cluster {1,2,3}: max quality 0.9 tie between 2 and 3 → lowest key 2
    # cluster {5,6}: tie at 0.1 → lowest key 5
    assert got_q == {2: 3, 4: 1, 5: 2}


def test_real_image_decode_matches_independent_reference(spark):
    """The struct-parsed BMP decode reproduces the fixtures' expected
    dims/means, computed from the raw pixel arrays (writer and reader
    independent; odd widths exercise row padding)."""
    from pyspark.sql import types as T

    from mgo_liveagent_data_pipeline_spark.operators.multimodal import (
        bmp_fixture_images,
        real_image_features,
    )

    imgs = bmp_fixture_images()
    df = spark.createDataFrame(
        [(c["img_id"], bytearray(c["payload"])) for c in imgs],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("media", T.BinaryType()),
            ]
        ),
    )
    got = {r["doc_id"]: r.asDict() for r in real_image_features(df).collect()}
    assert len(got) == len(imgs)
    for c in imgs:
        g = got[c["img_id"]]
        for k in ("n_bytes", "content_md5", "width", "height", "n_pixels",
                  "mean_rgb"):
            assert g[k] == c[k], (c["img_id"], k, g[k], c[k])


def test_image_phash_dedup_pairs_content_duplicates(spark):
    """pHash image dedup: a byte-level re-encode, a brightness-shifted
    copy, and a cropped copy all cluster with their original (content-
    level duplicates the md5/key dedup can't see), distinct base images
    never pair, and the minimum id survives keep-one."""
    from pyspark.sql import types as T

    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        release_intermediates,
    )
    from mgo_liveagent_data_pipeline_spark.operators.multimodal import (
        dhash_from_rows,
        image_phash_dedup,
        phash_fixture_images,
    )

    imgs = phash_fixture_images()
    df = spark.createDataFrame(
        [(c["img_id"], bytearray(c["payload"])) for c in imgs],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("media", T.BinaryType()),
            ]
        ),
    )
    got = {r["key"]: r.asDict() for r in image_phash_dedup(df).collect()}
    release_intermediates()
    # decode→hash round trip matches the pre-pack expected hashes
    for c in imgs:
        assert got[c["img_id"]]["dhash"] == c["dhash"], c["img_id"]
    # re-encode (10), brightness (11), crop-col (12) cluster with base 0
    for dup in (10, 11, 12):
        assert got[dup]["keep_id"] == 0 and got[dup]["is_dup"] == 1, dup
    assert got[0]["keep_id"] == 0 and got[0]["is_dup"] == 0
    # crop-row (13) pairs with base 1 at a NONZERO Hamming distance —
    # the banding actually recovered a near (not exact) duplicate
    h13 = sum(
        a != b for a, b in zip(got[13]["dhash"], got[1]["dhash"])
    )
    assert 0 < h13 <= 7
    assert got[13]["keep_id"] == 1 and got[13]["is_dup"] == 1
    # CROSS-FORMAT: the PNG re-pack of base 0 (14) and the GIF re-pack
    # of base 2 (15) hash to the same pixels and cluster with their BMP
    # originals — content identity across containers
    assert got[14]["dhash"] == got[0]["dhash"]
    assert got[14]["keep_id"] == 0 and got[14]["is_dup"] == 1
    assert got[15]["dhash"] == got[2]["dhash"]
    assert got[15]["keep_id"] == 2 and got[15]["is_dup"] == 1
    assert got[2]["keep_id"] == 2 and got[2]["is_dup"] == 0
    # distinct bases stay singletons
    for base in (3, 4):
        assert got[base]["keep_id"] == base and got[base]["is_dup"] == 0
    # brightness invariance is exact by construction (shift cancels)
    rows = [[(20, 30, 40), (200, 90, 10)], [(5, 250, 125), (99, 98, 97)]]
    shifted = [[(r + 4, g + 4, b + 4) for (r, g, b) in row] for row in rows]
    assert dhash_from_rows(rows, 2) == dhash_from_rows(shifted, 2)


def test_audio_fp_dedup_pairs_content_duplicates(spark):
    """Audio fingerprint dedup: re-headered, volume-scaled, truncated,
    and stereo-duplicated copies cluster with their originals; distinct
    clips never pair; min-id survives."""
    from pyspark.sql import types as T

    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        release_intermediates,
    )
    from mgo_liveagent_data_pipeline_spark.operators.multimodal import (
        audio_fingerprint_from_samples,
        audio_fp_dedup,
        audio_fp_fixture_clips,
    )

    clips = audio_fp_fixture_clips()
    df = spark.createDataFrame(
        [(c["clip_id"], bytearray(c["payload"])) for c in clips],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("media", T.BinaryType()),
            ]
        ),
    )
    got = {r["key"]: r.asDict() for r in audio_fp_dedup(df).collect()}
    release_intermediates()
    for c in clips:  # decode→fingerprint round trip == pre-pack expected
        assert got[c["clip_id"]]["fp"] == c["fp"], c["clip_id"]
    # re-header (10), 2x volume (11) are Hamming 0 with base 0
    for dup in (10, 11):
        assert got[dup]["fp"] == got[0]["fp"]
        assert got[dup]["keep_id"] == 0 and got[dup]["is_dup"] == 1, dup
    # stereo duplicate (13) is Hamming 0 with base 2 (mono mix = exact 2x)
    assert got[13]["fp"] == got[2]["fp"]
    assert got[13]["keep_id"] == 2 and got[13]["is_dup"] == 1
    # 4-frame truncation (12) pairs with base 1 at NONZERO distance
    h12 = sum(a != b for a, b in zip(got[12]["fp"], got[1]["fp"]))
    assert 0 < h12 <= 7
    assert got[12]["keep_id"] == 1 and got[12]["is_dup"] == 1
    for base in (0, 1, 2):
        assert got[base]["keep_id"] == base and got[base]["is_dup"] == 0
    for base in (3, 4):  # distinct clips stay singletons
        assert got[base]["keep_id"] == base and got[base]["is_dup"] == 0
    # volume invariance is exact for ANY integer scale (cross-multiplied
    # comparisons), including a scale that changes floor-mean rounding
    s = [7, -3, 12, 5, -9, 4, 8, -2, 6, 11, -1, 3]
    assert audio_fingerprint_from_samples(
        s, 1, 5
    ) == audio_fingerprint_from_samples([x * 3 for x in s], 1, 5)


def test_video_phash_dedup_matches_reencode_and_trim(spark):
    """Video dedup over animated GIFs: a byte-distinct re-encode (all
    frames match) and a head-trimmed copy (7/8 frames match at SHIFTED
    positions) cluster with their originals; unrelated videos never
    pair; the multi-frame decode round-trips the pre-pack hashes; and
    the single-frame decoder still honestly refuses animations."""
    import pytest
    from pyspark.sql import types as T

    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        release_intermediates,
    )
    from mgo_liveagent_data_pipeline_spark.operators.multimodal import (
        real_gif_decode,
        real_gif_frames,
        video_fixture_clips,
        video_phash_dedup,
    )

    clips = video_fixture_clips()
    # decode round trip + the honest single-frame refusal
    d = real_gif_frames(clips[0]["payload"])
    assert d["n_frames"] == 8 and d["width"] == 20 and d["height"] == 16
    with pytest.raises(NotImplementedError, match="multi-frame"):
        real_gif_decode(clips[0]["payload"])
    df = spark.createDataFrame(
        [(c["video_id"], bytearray(c["payload"])) for c in clips],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("media", T.BinaryType()),
            ]
        ),
    )
    got = {r["key"]: r.asDict() for r in video_phash_dedup(df).collect()}
    release_intermediates()
    assert got[10]["keep_id"] == 0 and got[10]["is_dup"] == 1
    assert got[11]["keep_id"] == 1 and got[11]["is_dup"] == 1
    assert got[11]["n_frames"] == 7
    for base in (0, 1, 2, 3):
        assert got[base]["keep_id"] == base and got[base]["is_dup"] == 0
    # raising the frame-match bar past the trim's 7 splits that pair
    strict = {
        r["key"]: r.asDict()
        for r in video_phash_dedup(df, min_matching_frames=8).collect()
    }
    release_intermediates()
    assert strict[11]["is_dup"] == 0 and strict[10]["is_dup"] == 1


def test_incremental_hamming_pairs_matches_batch_restriction(spark):
    """The incremental perceptual path equals the batch pairs restricted
    to delta-involved endpoints: corpus-corpus evidence (13-1, present
    in the batch run) must NOT be re-emitted by an ingest."""
    from pyspark.sql import types as T

    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        hamming_banded_pairs,
        incremental_hamming_pairs,
        release_intermediates,
    )
    from mgo_liveagent_data_pipeline_spark.operators.multimodal import (
        phash_fixture_images,
        real_image_dhash,
    )
    from pyspark.sql import functions as F

    delta_ids = {10, 11, 12, 14, 15}
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media", T.BinaryType()),
        ]
    )

    def fps(rows):
        df = spark.createDataFrame(
            [(c["img_id"], bytearray(c["payload"])) for c in rows], schema
        )
        return real_image_dhash(df).select("key", F.col("dhash").alias("fp"))

    imgs = phash_fixture_images()
    corpus = [c for c in imgs if c["img_id"] not in delta_ids]
    delta = [c for c in imgs if c["img_id"] in delta_ids]
    inc = {
        (r["id_a"], r["id_b"]): r["hamming_dist"]
        for r in incremental_hamming_pairs(fps(corpus), fps(delta)).collect()
    }
    batch = {
        (r["id_a"], r["id_b"]): r["hamming_dist"]
        for r in hamming_banded_pairs(fps(imgs)).collect()
    }
    release_intermediates()
    want = {
        k: v
        for k, v in batch.items()
        if k[0] in delta_ids or k[1] in delta_ids
    }
    assert inc == want
    assert (1, 13) in batch and (1, 13) not in inc  # corpus-corpus excluded
    assert (0, 10) in inc and inc[(0, 10)] == 0  # delta-vs-corpus found


def test_real_decode_dispatches_all_codecs_and_rejects_unknown():
    import pytest

    from mgo_liveagent_data_pipeline_spark.operators.multimodal import (
        bmp_fixture_images,
        gif_fixture_images,
        jpeg_fixture_images,
        png_fixture_images,
        real_decode,
    )

    for fixtures in (bmp_fixture_images, png_fixture_images,
                     jpeg_fixture_images, gif_fixture_images):
        c = fixtures(1)[0]
        assert real_decode(c["payload"]) == (c["width"], c["height"])
    # unknown container magic (WebP) → the honest refusal
    with pytest.raises(NotImplementedError):
        real_decode(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
    # known magic but torn structure → corruption error, not a mis-decode
    with pytest.raises(ValueError):
        real_decode(b"\x89PNG\r\n\x1a\nfakedata")


def test_lsh_salvage_bounds_capped_and_uncapped(spark):
    """Oversized-bucket salvage recovers pairs the whole-bucket refusal
    drops, without inventing any: on a near-dup-heavy corpus whose
    buckets all bust an adversarially low cap,
      pairs(capped) ⊆ pairs(salvage) ⊆ pairs(uncapped),
    and salvage strictly improves on refusal here (the capped run loses
    every hot-bucket pair)."""
    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        minhash_lsh_dedup,
        release_intermediates,
    )

    # Hash-engineered corpus (salvage only helps when a bucket glues
    # DISSIMILAR-signature docs — identical-signature cohorts never
    # split, by design). Four docs "b0..b9 <tail>" whose tails were
    # selected by replaying the operator's Carter-Wegman hash in Python
    # (md5 halves of the one tail shingle "b8 b9 t" vs the shared-
    # shingle floor):
    #   t0/t48  lose families 0-4 → both collide in band 0 AND share
    #           the depth-1 extension value sig[4]; their band 1-3 keys
    #           all differ, so no OTHER band ever pairs them
    #   t83/t98 lose families 0-3 (collide in band 0) but WIN family 4
    #           with distinct values → depth-1 split peels them off
    # Band-0 bucket = all four docs (> cap 2): the capped run refuses it
    # whole and the (t0, t48) near-dup pair (J = 0.8) is LOST; salvage
    # splits at depth 1 into {t0, t48} | {t83} | {t98} and recovers it.
    boiler = " ".join(f"b{i}" for i in range(10))
    rows = [(k, f"{boiler} {t}")
            for k, t in enumerate(["t0", "t48", "t83", "t98"])]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def pairs(**kw):
        out = minhash_lsh_dedup(
            df, "text", "doc_id", num_hashes=16, bands=4, shingle_k=3,
            threshold=0.4, **kw,
        )
        got = {(r["id_a"], r["id_b"]) for r in out.collect()}
        release_intermediates()
        return got

    capped = pairs(max_bucket_size=2)
    salvaged = pairs(max_bucket_size=2, salvage_depth=4)
    uncapped = pairs(max_bucket_size=None)
    assert capped <= salvaged, "salvage must not lose capped pairs"
    assert salvaged <= uncapped, "salvage must not invent pairs"
    assert (0, 1) not in capped, "cap must drop the glued band-0 pair"
    assert (0, 1) in salvaged, "salvage must recover the glued pair"


# ------------------------------------------------------- semantic dedup
SEM_ROWS = [
    # label-0 island near e1: ids 1-3 are a near-identical triple
    # (pairwise cos > 0.999), id 4 is a same-cluster singleton
    # (cos ~0.939 to the triple — below the 0.98 threshold)
    (1, [1.0, 0.0, 0.2], 0),
    (2, [1.0, 0.01, 0.2], 0),
    (3, [1.0, 0.02, 0.2], 0),
    (4, [1.0, 0.3, 0.0], 0),
    # label-1 island near e2: two distinct vectors (cos ~0.976 < 0.98)
    (5, [0.0, 1.0, 0.2], 1),
    (6, [0.1, 1.0, 0.0], 1),
]


def sem_df(spark):
    return spark.createDataFrame(
        SEM_ROWS, "vec_id long, embedding array<double>, label int"
    )


def test_semantic_dedup_keeps_low_centroid_sim_survivor(spark):
    """The engineered corpus pins the full SemDeDup contract: the
    near-identical triple collapses to ONE survivor — the member LEAST
    similar to its cluster centroid (id 3: the centroid is id 1's own
    vector, so id 1 scores sim 1.0 and ranks LAST) — while the
    below-threshold singleton and the distinct label-1 pair survive."""
    from mgo_liveagent_data_pipeline_spark.operators.dedup import semantic_dedup

    out = semantic_dedup(sem_df(spark), threshold=0.98).collect()
    verdicts = {r["vec_id"]: r for r in out}
    assert len(verdicts) == 6  # one verdict row per input vector
    # nearest-centroid assignment reproduces the label islands
    assert {k: v["cluster_id"] for k, v in verdicts.items()} == {
        1: 0, 2: 0, 3: 0, 4: 0, 5: 1, 6: 1,
    }
    kept = {k for k, v in verdicts.items() if v["kept"] == 1}
    assert kept == {3, 4, 5, 6}
    # the survivor of the triple is the peripheral copy, not the seed
    assert verdicts[1]["centroid_sim"] == 1.0 and verdicts[1]["kept"] == 0


def test_semantic_dedup_invariants_on_corpus(spark):
    """On the real embeddings table: dropped ⟺ an earlier-ranked member
    of the same cluster is ≥ threshold-similar (recomputed brute-force
    from the verdict rows + raw vectors), and raising the threshold only
    grows the kept set (the EXISTS is monotone in τ)."""
    import math

    from mgo_liveagent_data_pipeline_spark.operators.dedup import semantic_dedup
    from mgo_liveagent_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    thr = 0.3
    out = semantic_dedup(emb, threshold=thr).collect()
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb.collect()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 6) if na > 0 and nb > 0 else 0.0

    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    n_dropped = 0
    for members in by_cluster.values():
        members.sort(key=lambda r: (r["centroid_sim"], r["vec_id"]))
        for i, r in enumerate(members):
            earlier_hit = any(
                cos(vecs[q["vec_id"]], vecs[r["vec_id"]]) >= thr
                for q in members[:i]
            )
            assert (r["kept"] == 0) == earlier_hit, r
            n_dropped += r["kept"] == 0
    assert n_dropped > 0, "threshold 0.3 must exercise the drop path"

    kept_hi = {
        r["vec_id"]
        for r in semantic_dedup(emb, threshold=0.45).collect()
        if r["kept"] == 1
    }
    kept_lo = {r["vec_id"] for r in out if r["kept"] == 1}
    assert kept_lo <= kept_hi


def test_semantic_dedup_cluster_cap_degrades_to_kept(spark):
    """A cluster over max_cluster_size is refused from pair generation:
    its members all surface kept=1 (no duplicate evidence — same degrade
    contract as the LSH bucket cap), while clusters within the cap are
    still probed."""
    from mgo_liveagent_data_pipeline_spark.operators.dedup import semantic_dedup

    rows = SEM_ROWS + [(7, [0.1, 1.0, 0.001], 1)]  # near-dup of id 6
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {r["vec_id"]: r["kept"] for r in
           semantic_dedup(df, threshold=0.98, max_cluster_size=3).collect()}
    # cluster 0 (size 4 > 3) refused -> all kept despite the triple
    assert all(out[i] == 1 for i in (1, 2, 3, 4))
    # cluster 1 (size 3 <= 3) still probed -> the 6/7 near-dup collapses
    assert sorted(out[i] for i in (5, 6, 7)) == [0, 1, 1]


# ------------------------------------------------- exact-substring dedup
def test_exact_substring_dedup_span_surgery(spark):
    """Lee et al. ExactSubstr semantics on an engineered corpus (k=4):
    a 5-token span shared by two docs survives ONLY at its canonical
    (lowest doc_id, pos) occurrence — the other doc loses the whole
    overlapping-gram union, not just one gram; a within-doc repeat loses
    its second occurrence; sub-k docs pass through untouched."""
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        exact_substring_dedup,
    )

    rows = [
        (1, "a b s1 s2 s3 s4 s5 c"),
        (2, "q s1 s2 s3 s4 s5 r t"),
        (3, "u v w"),
        (4, "m1 m2 m3 m4 z m1 m2 m3 m4"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in exact_substring_dedup(
            df, "text", "doc_id", k=4, emit_text=True
        ).collect()
    }
    # doc 1 holds the canonical occurrences -> untouched
    assert out[1]["n_removed"] == 0 and out[1]["text"] == rows[0][1]
    # doc 2 loses the union of both duplicated grams (tokens 1-5)
    assert out[2]["n_removed"] == 5 and out[2]["text"] == "q r t"
    # doc 3 is shorter than k -> no grams, untouched
    assert out[3]["n_removed"] == 0 and out[3]["text"] == "u v w"
    # doc 4's internal repeat: second occurrence removed
    assert out[4]["n_removed"] == 4 and out[4]["text"] == "m1 m2 m3 m4 z"
    assert all(r["n_tokens"] == len(t.split()) for (i, t), r in
               zip(rows, (out[1], out[2], out[3], out[4])))


def test_exact_substring_dedup_corpus_invariants(spark):
    """On the real documents table: exactly one occurrence of every
    duplicated k-gram survives corpus-wide (re-derived brute-force from
    the emitted texts), removals touch a meaningful doc subset at k=8,
    and total tokens are conserved (kept + removed = input)."""
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        exact_substring_dedup,
    )
    from mgo_liveagent_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    k = 8
    out = exact_substring_dedup(docs, "text", "doc_id", k=k,
                                emit_text=True).collect()
    raw = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    n_touched = sum(1 for r in out if r["n_removed"] > 0)
    assert n_touched > 0, "k=8 must exercise removal on this corpus"
    for r in out:
        toks = raw[r["doc_id"]].strip().split()
        assert r["n_tokens"] == max(len(toks), 1)
        assert r["n_tokens"] == r["n_removed"] + (
            len(r["text"].split()) if r["text"] else 0
        )
    # every duplicated gram of the INPUT survives somewhere (its
    # canonical home is never removed): count surviving occurrences of a
    # sample of duplicated grams in the OUTPUT texts
    from collections import Counter

    gram_count: Counter = Counter()
    for t in raw.values():
        toks = t.strip().split()
        for i in range(len(toks) - k + 1):
            gram_count[" ".join(toks[i : i + k])] += 1
    dups = [g for g, c in gram_count.items() if c >= 2]
    assert dups, "fixture must contain duplicated grams"
    out_text = "  ".join(r["text"] for r in out)
    for g in dups[:20]:
        assert g in out_text, f"canonical occurrence of {g!r} was removed"


def test_incremental_semantic_dedup_matches_full_restriction(spark):
    """The exactness contract on real data: incremental delta verdicts
    equal semantic_dedup over the union restricted to delta keys — for
    two different splits (sparse and dense deltas)."""
    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        incremental_semantic_dedup,
        semantic_dedup,
    )
    from mgo_liveagent_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    full = {
        r["vec_id"]: (r["cluster_id"], r["centroid_sim"], r["kept"])
        for r in semantic_dedup(emb, threshold=0.3).collect()
    }
    for mod in (5, 2):
        delta = emb.where(F.col("vec_id") % mod == 0)
        corpus = emb.where(F.col("vec_id") % mod != 0)
        inc = {
            r["vec_id"]: (r["cluster_id"], r["centroid_sim"], r["kept"])
            for r in incremental_semantic_dedup(
                corpus, delta, threshold=0.3
            ).collect()
        }
        expect = {k: v for k, v in full.items() if k % mod == 0}
        assert inc == expect, f"split %{mod} diverged from the restriction"


def test_incremental_semantic_dedup_reingest_supersedes(spark):
    """A key present in both inputs is a re-ingest: the delta's vector
    replaces the corpus row. The corpus version of key 2 is a
    near-identical copy of key 1 (would be dropped); the delta re-ingests
    key 2 with a distinct vector, so its verdict must be kept=1 — and the
    stale corpus copy must not generate a pair against anything."""
    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        incremental_semantic_dedup,
    )

    schema = "vec_id long, embedding array<double>, label int"
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.2], 0),
            (2, [1.0, 0.01, 0.2], 0),  # stale: near-dup of key 1
            (5, [0.0, 1.0, 0.2], 1),
        ],
        schema,
    )
    delta = spark.createDataFrame(
        [
            (2, [1.0, 0.6, 0.0], 0),  # re-ingest: now distinct
            # exact copy of corpus key 1: ties on centroid_sim (1.0) and
            # loses the key tiebreak, so it MUST drop. (A merely-similar
            # delta vector that is MORE peripheral than its corpus twin
            # would be kept instead — the keep-low policy admits it and
            # the full dedup would drop the corpus copy; see the
            # operator docstring.)
            (3, [1.0, 0.0, 0.2], 0),
        ],
        schema,
    )
    out = {
        r["vec_id"]: r["kept"]
        for r in incremental_semantic_dedup(
            corpus, delta, threshold=0.98
        ).collect()
    }
    assert set(out) == {2, 3}, "verdicts must cover delta keys only"
    assert out[2] == 1, "re-ingested distinct vector must be kept"
    assert out[3] == 0, "exact copy of a corpus vector must drop"


def test_semantic_dedup_routed_agreement_and_degrade(spark):
    """LSH-routed assignment on the real table: the bits-vs-quality
    tradeoff is monotone and measured (this near-isotropic synthetic
    corpus is the documented RH-LSH worst case — see the rh_lsh recall
    notes: b=2 agrees ~83% with flat, b=4 ~44%; real clustered
    embeddings route far better), routed vectors that agree on the
    cluster agree exactly on centroid_sim, and an engineered
    every-bit-flipped vector exercises the unrouted kept=1 degrade."""
    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        semantic_dedup,
    )
    from mgo_liveagent_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    flat = {r["vec_id"]: r for r in semantic_dedup(emb, threshold=0.3).collect()}

    def agreement(bits):
        routed = {
            r["vec_id"]: r
            for r in semantic_dedup(
                emb, threshold=0.3, route_bits=bits, dim=64
            ).collect()
        }
        assert set(routed) == set(flat)  # one verdict per vector either way
        same = [
            k
            for k, r in routed.items()
            if r["cluster_id"] is not None
            and r["cluster_id"] == flat[k]["cluster_id"]
        ]
        for k in same:
            assert routed[k]["centroid_sim"] == flat[k]["centroid_sim"]
        return len(same) / len(flat)

    a2, a4 = agreement(2), agreement(4)
    assert a2 >= 0.8 and a4 >= 0.4
    assert a2 > a4  # fewer buckets -> more candidates -> closer to flat

    # unrouted degrade: v2 = -v1 flips the sign bit on EVERY plane whose
    # dot is nonzero (all of them here), so at b=8 it sits Hamming-8 from
    # the only centroid's bucket — no candidate, NULL cluster, kept=1
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0], 0), (2, [-1.0, 0.0, 0.0], 0)],
        "vec_id long, embedding array<double>, label int",
    )
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            df, threshold=0.3, route_bits=8, dim=3
        ).collect()
    }
    assert out[2]["cluster_id"] is None
    assert out[2]["kept"] == 1 and out[2]["centroid_sim"] is None
    assert out[1]["cluster_id"] == 0 and out[1]["kept"] == 1


def test_semantic_assign_adaptive_probing(spark):
    """Round-9 probing knobs: Hamming-2 widening strictly reduces probe
    misses, and route_rescue drives the unrouted rate to ZERO while
    giving every rescued vector the EXACT flat assignment (probe-until-
    hit = flat argmax on the residual misses)."""
    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        release_intermediates,
        semantic_assign,
    )
    from mgo_liveagent_data_pipeline_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        "label",
    )
    b = 6  # high enough that Hamming-1 misses on this isotropic fixture

    def assign(**kw):
        return {
            r["key"]: (r["cluster_id"], r["centroid_sim"])
            for r in semantic_assign(emb, route_bits=b, **kw)
            .select("key", "cluster_id", "centroid_sim")
            .collect()
        }

    flat = {
        r["key"]: (r["cluster_id"], r["centroid_sim"])
        for r in semantic_assign(emb)
        .select("key", "cluster_id", "centroid_sim")
        .collect()
    }
    h1 = assign(route_hamming=1)
    h2 = assign(route_hamming=2)
    rescued = assign(route_hamming=1, route_rescue=True)
    release_intermediates()
    miss1 = {k for k, v in h1.items() if v[0] is None}
    miss2 = {k for k, v in h2.items() if v[0] is None}
    assert miss1, "fixture must actually exercise probe misses at this b"
    assert miss2 < miss1  # widening only adds probes — misses shrink
    # rescue: zero unrouted, and rescued vectors get the exact flat row
    assert all(v[0] is not None for v in rescued.values())
    for k in miss1:
        assert rescued[k] == flat[k], k
    # hits are untouched by the rescue path
    for k, v in h1.items():
        if v[0] is not None:
            assert rescued[k] == v, k


def test_incremental_semantic_dedup_corpus_index_path(spark):
    """The production path: with a prebuilt assignment index and frozen
    centroids, the incremental verdicts equal the recompute path run
    against the same centroid set — only the delta is assigned."""
    from mgo_liveagent_data_pipeline_spark.operators.annsearch import (
        ivf_centroids,
    )
    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        incremental_semantic_dedup,
        semantic_assign,
    )
    from mgo_liveagent_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    delta = emb.where(F.col("vec_id") % 7 == 0)
    corpus = emb.where(F.col("vec_id") % 7 != 0)
    # frozen centroids from the FULL key space so both paths share them
    cents = ivf_centroids(emb)
    index = semantic_assign(corpus, cents)
    via_index = {
        r["vec_id"]: (r["cluster_id"], r["centroid_sim"], r["kept"])
        for r in incremental_semantic_dedup(
            corpus, delta, threshold=0.3, corpus_index=index, centroids=cents
        ).collect()
    }
    recompute = {
        r["vec_id"]: (r["cluster_id"], r["centroid_sim"], r["kept"])
        for r in incremental_semantic_dedup(
            corpus, delta, threshold=0.3, centroids=cents
        ).collect()
    }
    assert via_index == recompute
    # index path demands its frozen centroids
    import pytest

    with pytest.raises(ValueError):
        incremental_semantic_dedup(corpus, delta, corpus_index=index)


def test_leakage_safe_split_invariants(spark):
    """Clusters move as units; a per-document draw WOULD straddle one;
    eval_pct 0/100 degenerate ends; singleton clusters keep their key."""
    from pyspark.sql import functions as F

    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        leakage_safe_split,
    )

    # a chain cluster {1,2,3} plus two singletons; pairs come from the
    # near-dup evidence directly so the test controls the topology
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 20)], ["doc_id"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    out = leakage_safe_split(docs, pairs, "doc_id", eval_pct=40).collect()
    by_key = {r["doc_id"]: (r["cluster_id"], r["split"]) for r in out}
    assert len(by_key) == 5
    # the whole chain shares cluster id 1 and ONE split decision
    assert {by_key[k][0] for k in (1, 2, 3)} == {1}
    assert len({by_key[k][1] for k in (1, 2, 3)}) == 1
    # singletons are their own cluster
    assert by_key[10][0] == 10 and by_key[20][0] == 20
    # every split value is one of the two labels
    assert {s for _, s in by_key.values()} <= {"train", "eval"}

    # the leakage the operator prevents: scan eval fractions until a
    # per-DOCUMENT md5 draw splits the {1,2,3} cluster across the
    # boundary while the cluster draw (by construction) cannot
    def doc_bucket(k):
        import hashlib

        return int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)

    straddled = False
    for pct in range(5, 100, 5):
        cut = (pct * 16**8) // 100
        naive = {k: "eval" if doc_bucket(k) < cut else "train" for k in (1, 2, 3)}
        if len(set(naive.values())) > 1:
            straddled = True
            break
    assert straddled, "fixture should demonstrate per-doc straddle"

    # degenerate ends
    all_train = leakage_safe_split(docs, pairs, "doc_id", eval_pct=0).collect()
    assert {r["split"] for r in all_train} == {"train"}
    all_eval = leakage_safe_split(docs, pairs, "doc_id", eval_pct=100).collect()
    assert {r["split"] for r in all_eval} == {"eval"}

    import pytest

    with pytest.raises(ValueError):
        leakage_safe_split(docs, pairs, "doc_id", eval_pct=101)

    # clusters= reuse path returns the identical assignment
    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    cc = connected_components(pairs)
    reused = {
        r["doc_id"]: (r["cluster_id"], r["split"])
        for r in leakage_safe_split(
            docs, pairs, "doc_id", eval_pct=40, clusters=cc
        ).collect()
    }
    assert reused == by_key
