"""Round-5 corpus operators: connected-component clustering, CCNet-style
paragraph dedup, benchmark decontamination, and token-budget shard packing."""
from __future__ import annotations

from pyspark.sql import functions as F

from mgo_liveagent_data_pipeline_spark.operators.dedup import (
    connected_components,
    release_intermediates,
)
from mgo_liveagent_data_pipeline_spark.operators.textops import (
    decontaminate,
    pack_shards,
    paragraph_dedup,
)


# ------------------------------------------------------- connected components
def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    out = {r["node"]: (r["cluster_id"], r["cluster_size"])
           for r in connected_components(df, **kw).collect()}
    release_intermediates()
    return out


# every unit case runs BOTH paths: the default driver union-find AND the
# distributed pointer-jumping loop (driver_threshold=None) — small edge
# lists would otherwise silently stop covering the distributed code
import pytest as _pytest

_CC_PATHS = ({}, {"driver_threshold": None})


@_pytest.mark.parametrize("cckw", _CC_PATHS)
def test_cc_chain_converges_to_min_label(spark, cckw):
    # a 5-node path: transitive closure must label everything with node 1
    out = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], **cckw)
    assert out == {n: (1, 5) for n in (1, 2, 3, 4, 5)}


def test_cc_durable_checkpoint_path(spark, tmp_path):
    """checkpoint_dir= swaps every lineage cut (edge materialization +
    each pointer-jumping round) to reliable checkpoint(): the labels are
    identical to the local default AND checkpoint files actually landed
    under the durable dir — the cluster-run contract
    (operators/dedup.py:lineage_cut)."""
    import os

    ckpt = str(tmp_path / "ckpt")
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)]
    # force the distributed loop so the per-round cuts run durably too
    out = _cc(
        spark, edges, driver_threshold=None, checkpoint_dir=ckpt
    )
    assert out == {
        **{n: (1, 5) for n in (1, 2, 3, 4, 5)},
        10: (10, 2), 11: (10, 2),
    }
    rdd_dirs = [
        d
        for root, dirs, _files in os.walk(ckpt)
        for d in dirs
        if d.startswith("rdd-")
    ]
    # edge cut + label seed + >=1 round: several durable snapshots
    assert len(rdd_dirs) >= 3, rdd_dirs


@_pytest.mark.parametrize("cckw", _CC_PATHS)
def test_cc_separate_components_and_sizes(spark, cckw):
    out = _cc(
        spark, [(10, 11), (11, 12), (20, 21), (30, 31), (31, 30)], **cckw
    )
    assert out[10] == (10, 3) and out[12] == (10, 3)
    assert out[20] == (20, 2) and out[21] == (20, 2)
    assert out[30] == (30, 2) and out[31] == (30, 2)


@_pytest.mark.parametrize("cckw", _CC_PATHS)
def test_cc_edge_direction_irrelevant(spark, cckw):
    # edges given high->low must still propagate the minimum
    out = _cc(spark, [(5, 4), (4, 3), (3, 2), (2, 1)], **cckw)
    assert set(v[0] for v in out.values()) == {1}


def test_cc_parallelism_invariant(spark):
    # force the DISTRIBUTED loop on both sides: the invariant under
    # repartitioning is about the pointer-jumping rounds, which the
    # driver fast path never runs (a fast-path comparison is vacuous)
    edges = [(i, i + 1) for i in range(1, 30)] + [(100, 101), (102, 101)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    a = sorted(map(tuple,
                   connected_components(df, driver_threshold=None).collect()))
    release_intermediates()
    b = sorted(map(tuple,
                   connected_components(df.repartition(7),
                                        driver_threshold=None).collect()))
    release_intermediates()
    assert a == b


def test_cc_null_endpoint_pairs_dropped_both_paths(spark):
    # a NULL endpoint is not duplicate evidence: both paths drop the pair
    df = spark.createDataFrame(
        [(1, 2), (None, 3)], "id_a long, id_b long"
    )
    for kw in _CC_PATHS:
        got = {r["node"] for r in connected_components(df, **kw).collect()}
        release_intermediates()
        assert got == {1, 2}


# --------------------------------------------------------- incremental dedup
def test_incremental_dedup_restricts_full_pairs_to_delta(spark):
    """incremental(corpus, delta) == full-corpus LSH pairs filtered to
    pairs involving a delta doc — the operator's exactness contract."""
    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_lsh_dedup,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight again"),
        (2, "the quick brown fox jumps over the lazy dog tonight again"),
        (3, "completely different text with other words entirely here now"),
        (10, "the quick brown fox jumps over the lazy dog tonight again"),
        (11, "completely different text with other words entirely here now"),
        (12, "the quick brown fox leaps over the lazy dog tonight again"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    delta = docs.where(F.col("doc_id") >= 10)
    corpus = docs.where(F.col("doc_id") < 10)
    full = {
        (r["id_a"], r["id_b"]): r["jaccard_sim"]
        for r in minhash_lsh_dedup(docs).collect()
    }
    release_intermediates()
    incr = {
        (r["id_a"], r["id_b"]): (r["jaccard_sim"], r["pair_type"])
        for r in incremental_minhash_dedup(corpus, delta).collect()
    }
    release_intermediates()
    expected = {
        p: s for p, s in full.items() if p[0] >= 10 or p[1] >= 10
    }
    assert {p: v[0] for p, v in incr.items()} == expected
    assert incr  # non-vacuous: the fixture guarantees delta pairs
    for (a, b), (_s, ptype) in incr.items():
        assert ptype == (
            "delta_delta" if a >= 10 and b >= 10 else "delta_corpus"
        )
    # corpus-only pairs (e.g. exact dups 1-2) must NOT appear
    assert all(a >= 10 or b >= 10 for a, b in incr)
    assert (1, 2) in full  # the restriction actually excluded something


def test_incremental_dedup_delta_supersedes_corpus_on_key_collision(spark):
    """A key in both inputs is a re-ingest: the delta's text wins, no
    chimera signature, no duplicate pairs."""
    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        incremental_minhash_dedup,
    )

    match = "the quick brown fox jumps over the lazy dog tonight again"
    corpus = spark.createDataFrame(
        [(7, "old version text that matched nothing in particular here"),
         (1, match)],
        ["doc_id", "text"])
    delta = spark.createDataFrame([(7, match)], ["doc_id", "text"])
    out = incremental_minhash_dedup(corpus, delta).collect()
    release_intermediates()
    pairs = {(r["id_a"], r["id_b"]): r["pair_type"] for r in out}
    # the delta's v2 text pairs with corpus doc 1; exactly once
    assert pairs == {(1, 7): "delta_corpus"}
    assert len(out) == 1


# ---------------------------------------------------------- paragraph dedup
def _pdocs(spark):
    boiler = "subscribe to our newsletter for updates every single day now"
    rows = [
        (1, boiler + " unique alpha text one two three four five six seven"),
        (2, boiler + " other beta content eight nine ten eleven twelve more"),
        (3, "totally original document with no shared segment at all here"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_paragraph_dedup_drops_shared_segment(spark):
    out = {r["key"]: r for r in
           paragraph_dedup(_pdocs(spark), seg_words=10, min_docs=2).collect()}
    # docs 1 and 2 share their first 10-word segment (the boilerplate)
    assert out[1]["n_dropped"] == 1 and out[2]["n_dropped"] == 1
    assert out[3]["n_dropped"] == 0
    assert out[1]["n_segments"] == 2 and out[3]["n_segments"] == 1


def test_paragraph_dedup_hash_is_surviving_text(spark):
    import hashlib

    out = {r["key"]: r["dedup_hash"] for r in
           paragraph_dedup(_pdocs(spark), seg_words=10, min_docs=2).collect()}
    survivor = "unique alpha text one two three four five six seven"
    assert out[1] == hashlib.md5(survivor.encode()).hexdigest()
    # untouched doc hashes to its full (re-joined) text
    full3 = "totally original document with no shared segment at all here"
    assert out[3] == hashlib.md5(full3.encode()).hexdigest()


def test_paragraph_dedup_all_dropped_yields_empty_hash(spark):
    import hashlib

    rows = [(1, "same ten words here padding out to exactly ten okay"),
            (2, "same ten words here padding out to exactly ten okay")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["key"]: r for r in paragraph_dedup(df, seg_words=10).collect()}
    assert out[1]["n_dropped"] == 1
    assert out[1]["dedup_hash"] == hashlib.md5(b"").hexdigest()


# ----------------------------------------------------------- decontamination
def test_decontaminate_flags_overlapping_docs(spark):
    ev = spark.createDataFrame(
        [(100, "held out benchmark question about spark shuffle partitions")],
        ["doc_id", "text"])
    train = spark.createDataFrame(
        [(1, "leaked copy benchmark question about spark shuffle partitions"),
         (2, "an unrelated training document with fresh vocabulary words")],
        ["doc_id", "text"])
    out = {r["key"]: r for r in
           decontaminate(train, ev, ngram_k=5).collect()}
    assert 1 in out and 2 not in out  # only the leaked doc is emitted
    assert out[1]["n_hit_grams"] >= 1
    assert 0 < out[1]["hit_frac"] <= 1.0


def test_decontaminate_counts_distinct_hits(spark):
    text = "alpha beta gamma delta epsilon zeta"
    ev = spark.createDataFrame([(9, text)], ["doc_id", "text"])
    train = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = decontaminate(train, ev, ngram_k=5).collect()[0]
    # 6 tokens -> 2 distinct 5-grams, both hit
    assert out["n_grams"] == 2 and out["n_hit_grams"] == 2
    assert out["hit_frac"] == 1.0


# ----------------------------------------------------------------- asof join
def test_asof_join_semantics(spark):
    """Inclusive equal-ts bound, carry-forward across gaps, NULL before
    the first quote, and max-id tiebreak at identical (key, ts)."""
    import datetime as dt

    from mgo_liveagent_data_pipeline_spark.operators.joins import asof_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    trades = spark.createDataFrame(
        [(101, 1, at(5), 9.0),   # before any quote -> NULL match
         (103, 1, at(10), 9.5),  # equal ts as quote 2 -> inclusive match
         (105, 1, at(40), 9.9),  # after both quotes -> latest carried
         (107, 2, at(10), 1.0)], # other user, ties: two quotes same ts
        ["event_id", "user_id", "ts", "value"])
    quotes = spark.createDataFrame(
        [(2, 1, at(10), 100.0),
         (4, 1, at(20), 200.0),
         (6, 2, at(10), 300.0),
         (8, 2, at(10), 400.0)],  # same (user, ts) as id 6 -> max id wins
        ["event_id", "user_id", "ts", "value"])
    out = {
        r["event_id"]: (r["quote_event_id"], r["quote_value"])
        for r in asof_join(
            trades, quotes, right_cols=("event_id", "value"),
            prefix="quote_",
        ).collect()
    }
    assert out[101] == (None, None)
    assert out[103] == (2, 100.0)
    assert out[105] == (4, 200.0)
    assert out[107] == (8, 400.0)


def test_asof_join_parallelism_invariant(spark):
    import datetime as dt

    from mgo_liveagent_data_pipeline_spark.operators.joins import asof_join

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, i % 7, t0 + dt.timedelta(seconds=i * 3), float(i))
            for i in range(200)]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    tr, qt = ev.where("event_id % 2 = 1"), ev.where("event_id % 2 = 0")
    a = sorted(map(tuple, asof_join(tr, qt).collect()))
    b = sorted(map(tuple,
                   asof_join(tr.repartition(13), qt.repartition(3)).collect()))
    assert a == b


# ------------------------------------------------------------------ KMV sketch
def test_kmv_estimate_tracks_exact_distinct(spark):
    from mgo_liveagent_data_pipeline_spark.operators.aggregations import (
        kmv_distinct,
    )

    rows = [(("g%d" % (i % 2)), i % 500) for i in range(4000)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r["g"]: r for r in kmv_distinct(df, ("g",), "v", k=64).collect()}
    for g in ("g0", "g1"):
        exact = 250  # each group sees 250 distinct v values
        est = out[g]["est_distinct"]
        # standard error ~ 1/sqrt(k-2) ~ 12.7%; allow 3 sigma
        assert abs(est - exact) / exact < 0.4, (g, est)
        assert out[g]["n_kept"] == 64


def test_kmv_small_group_is_exact(spark):
    from mgo_liveagent_data_pipeline_spark.operators.aggregations import (
        kmv_distinct,
    )

    df = spark.createDataFrame([("a", i % 7) for i in range(100)], ["g", "v"])
    row = kmv_distinct(df, ("g",), "v", k=64).collect()[0]
    assert row["n_kept"] == 7 and row["est_distinct"] == 7.0


def test_kmv_sketches_merge_to_whole_data_sketch(spark):
    """Union of two halves' kept rows, re-bottom-k'd, equals the sketch
    of the whole data — the property that lets per-partition/per-day
    sketches combine without rescanning."""
    from pyspark.sql.window import Window

    from mgo_liveagent_data_pipeline_spark.operators.aggregations import (
        kmv_estimate,
        kmv_sketch_rows,
    )

    rows = [("g", i * 37 % 1000) for i in range(3000)]
    df = spark.createDataFrame(rows, ["g", "v"])
    half1 = df.where(F.col("v") % 2 == 0)
    half2 = df.where(F.col("v") % 2 == 1)
    merged_rows = (
        kmv_sketch_rows(half1, ("g",), "v", k=32)
        .unionByName(kmv_sketch_rows(half2, ("g",), "v", k=32))
        .select("g", "h")
        .distinct()
        .withColumn("rn", F.row_number().over(Window.partitionBy("g").orderBy("h")))
        .where(F.col("rn") <= 32)
    )
    whole = kmv_estimate(
        kmv_sketch_rows(df, ("g",), "v", k=32), ("g",), k=32
    ).collect()[0]
    merged = kmv_estimate(merged_rows, ("g",), k=32).collect()[0]
    assert merged["kth_frac"] == whole["kth_frac"]
    assert merged["est_distinct"] == whole["est_distinct"]


# ---------------------------------------------------------- hypertable rollup
def test_hypertable_rollup_levels_are_consistent(spark):
    """Coarser levels re-aggregate from finer ones: each day's
    (n_events, total) must equal the sum of its hours, and month the sum
    of its days — exactly, because sums stay decimal between levels."""
    import datetime as dt

    from mgo_liveagent_data_pipeline_spark.operators.aggregations import (
        hypertable_rollup,
    )

    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (t0 + dt.timedelta(hours=h, minutes=m), 0.1 + h + m)
        for h in range(50)
        for m in (0, 17, 43)
    ]
    df = spark.createDataFrame(rows, ["ts", "value"])
    out = hypertable_rollup(df, "ts", "value").collect()
    by_level = {}
    for r in out:
        by_level.setdefault(r["level"], {})[r["bucket_ts"]] = (
            r["n_events"], round(r["total_value"], 2)
        )
    assert len(by_level["hour"]) == 50
    assert len(by_level["day"]) == 3  # 50 hours span 3 calendar days
    assert len(by_level["month"]) == 1
    for day, (n, tot) in by_level["day"].items():
        hrs = [v for ts, v in by_level["hour"].items()
               if ts.date() == day.date()]
        assert n == sum(h[0] for h in hrs)
        assert tot == round(sum(h[1] for h in hrs), 2)
    (mn, mtot), = by_level["month"].values()
    assert mn == sum(v[0] for v in by_level["day"].values())
    assert mtot == round(sum(v[1] for v in by_level["day"].values()), 2)


# ---------------------------------------------------------------- range join
def test_range_join_equals_theta_join(spark):
    """The banded equi-join + BETWEEN filter must equal the naive theta
    join at any bucket width, including intervals spanning many buckets
    and points on interval boundaries."""
    import random

    from mgo_liveagent_data_pipeline_spark.operators.joins import range_join

    rng = random.Random(11)
    pts = [(i, rng.randint(0, 100)) for i in range(80)]
    ivs = []
    for j in range(12):
        s = rng.randint(0, 90)
        ivs.append((100 + j, s, s + rng.randint(0, 40)))
    p = spark.createDataFrame(pts, ["pid", "x"])
    iv = spark.createDataFrame(ivs, ["iid", "s", "e"])
    naive = {
        (a, b)
        for a, ax in pts
        for b, s, e in ivs
        if s <= ax <= e
    }
    for width in (1, 7, 50):
        got = {
            (r["pid"], r["iid"])
            for r in range_join(p, iv, "x", "s", "e", bucket_width=width)
            .collect()
        }
        assert got == naive, width


def test_range_join_with_key_cols(spark):
    from mgo_liveagent_data_pipeline_spark.operators.joins import range_join

    p = spark.createDataFrame(
        [(1, "u", 5), (2, "v", 5)], ["pid", "k", "x"]
    )
    iv = spark.createDataFrame([(9, "u", 0, 10)], ["iid", "k", "s", "e"])
    got = range_join(p, iv, "x", "s", "e", bucket_width=4,
                     key_cols=("k",)).collect()
    assert [(r["pid"], r["iid"]) for r in got] == [(1, 9)]


# ------------------------------------------------------------- shard packing
def test_pack_shards_sequential_fill(spark):
    rows = [(i, " ".join(["w"] * 40)) for i in range(10)]  # 40 tokens each
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["key"]: r["shard_id"] for r in
           pack_shards(df, shard_tokens=100, block_size=3).collect()}
    # exclusive cumsum: docs 0,1,2 (0..80) -> shard 0; 3,4 (120..160) -> 1 ...
    assert out == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 2, 8: 3, 9: 3}


def test_pack_shards_matches_single_partition_cumsum(spark):
    import random

    rng = random.Random(7)
    rows = [(i, " ".join(["t"] * rng.randint(1, 50))) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fast = {r["key"]: (r["n_tokens"], r["shard_id"]) for r in
            pack_shards(df, shard_tokens=300, block_size=17).collect()}
    # reference: plain python exclusive cumsum in key order
    cum, ref = 0, {}
    for i, t in sorted((i, len(t.split())) for i, t in rows):
        ref[i] = (t, cum // 300)
        cum += t
    assert fast == ref


def test_pack_shards_block_size_invariant(spark):
    rows = [(i, " ".join(["x"] * (i % 13 + 1))) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(map(tuple, pack_shards(df, shard_tokens=50, block_size=7).collect()))
    b = sorted(map(tuple, pack_shards(df, shard_tokens=50, block_size=100).collect()))
    assert a == b


# ------------------------------------------------------------ Bloom filter
def test_bloom_no_false_negatives_and_low_fp_rate(spark):
    from pyspark.sql import functions as F

    from mgo_liveagent_data_pipeline_spark.operators.aggregations import (
        bloom_build,
        bloom_membership,
    )

    members = spark.range(0, 1000).select(F.col("id").alias("v"))
    bloom = bloom_build(members, "v", m_bits=8192, n_hashes=4)
    # the word relation is tiny and bounded by construction
    assert bloom.count() <= 8192 // 64

    got = {
        r["v"]: r["might_contain"]
        for r in bloom_membership(members, "v", bloom, 8192, 4).collect()
    }
    assert len(got) == 1000 and all(got.values()), "false negative!"

    outsiders = spark.range(1000, 3000).select(F.col("id").alias("v"))
    fp = bloom_membership(outsiders, "v", bloom, 8192, 4)
    fp_rate = fp.where(F.col("might_contain")).count() / 2000
    # theoretical (1-e^(-kn/m))^k ~ 0.022 at n=1000, m=8192, k=4
    assert fp_rate < 0.1, fp_rate


def test_bloom_merge_equals_whole(spark):
    from pyspark.sql import functions as F

    from mgo_liveagent_data_pipeline_spark.operators.aggregations import (
        bloom_build,
        bloom_merge,
    )

    a = spark.range(0, 500).select(F.col("id").alias("v"))
    b = spark.range(400, 900).select(F.col("id").alias("v"))
    merged = bloom_merge(
        bloom_build(a, "v", 4096, 3), bloom_build(b, "v", 4096, 3)
    )
    whole = bloom_build(a.unionByName(b), "v", 4096, 3)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_bloom_prunes_incremental_antijoin(spark):
    """The 100 TB use: a broadcastable filter over the standing corpus
    keys routes a delta batch — guaranteed-new rows skip the exact
    anti-join entirely, possible-members alone get verified."""
    from pyspark.sql import functions as F

    from mgo_liveagent_data_pipeline_spark.operators.aggregations import (
        bloom_build,
        bloom_membership,
    )

    corpus = spark.range(0, 2000).select(F.col("id").alias("k"))
    delta = spark.range(1900, 2200).select(F.col("id").alias("k"))  # 100 old
    bloom = bloom_build(corpus, "k", 8192, 4)
    routed = bloom_membership(delta, "k", bloom, 8192, 4)
    maybe_old = delta.join(
        routed.where(F.col("might_contain")), "k", "left_semi"
    )
    surely_new = delta.join(
        routed.where(F.col("might_contain")), "k", "left_anti"
    )
    # no false negatives: every actually-old key is in maybe_old
    assert maybe_old.join(corpus, "k", "left_semi").count() == 100
    # surely_new contains no corpus keys at all
    assert surely_new.join(corpus, "k", "left_semi").count() == 0
    # and the prune is real: most of the 200 new keys skip verification
    assert surely_new.count() >= 150


# ------------------------------------------------- histogram quantile sketch
def test_histogram_quantiles_within_bin_error(spark):
    from pyspark.sql import functions as F

    from mgo_liveagent_data_pipeline_spark.operators.aggregations import (
        histogram_quantiles,
        value_histogram,
    )

    # two groups with known distributions over [0, 10000)
    df = spark.range(0, 10000).select(
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("g"),
        F.col("id").cast("double").alias("v"),
    )
    hist = value_histogram(df, ("g",), "v", num_bins=100)
    est = {
        (r["g"], r["q"]): r["est"]
        for r in histogram_quantiles(hist, ("g",), (0.5, 0.95), 100).collect()
    }
    # exact quantiles per group ~5000 / ~9500; bin width = ~100
    for g in ("even", "odd"):
        assert abs(est[(g, 0.5)] - 5000) <= 110, est
        assert abs(est[(g, 0.95)] - 9500) <= 110, est


def test_histogram_merge_equals_whole(spark):
    from pyspark.sql import functions as F

    from mgo_liveagent_data_pipeline_spark.operators.aggregations import (
        histogram_quantiles,
        value_histogram,
    )

    df = spark.range(0, 5000).select(
        F.lit("g").alias("g"),
        F.pmod(F.xxhash64("id"), F.lit(100000)).cast("double").alias("v"),
    )
    edges = df.groupBy("g").agg(
        F.min("v").alias("mn"), F.max("v").alias("mx")
    )
    a = df.where(F.col("v") < 40000)
    b = df.where(F.col("v") >= 40000)
    # merge = union of same-edge histograms, counts re-summed per bin
    merged = (
        value_histogram(a, ("g",), "v", 64, edges=edges)
        .unionByName(value_histogram(b, ("g",), "v", 64, edges=edges))
        .groupBy("g", "mn", "mx", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = value_histogram(df, ("g",), "v", 64, edges=edges)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    qm = histogram_quantiles(merged, ("g",), (0.5,), 64).collect()
    qw = histogram_quantiles(whole, ("g",), (0.5,), 64).collect()
    assert sorted(map(tuple, qm)) == sorted(map(tuple, qw))


def test_histogram_constant_column(spark):
    from pyspark.sql import functions as F

    from mgo_liveagent_data_pipeline_spark.operators.aggregations import (
        histogram_quantiles,
        value_histogram,
    )

    df = spark.range(0, 10).select(
        F.lit("g").alias("g"), F.lit(7.5).alias("v")
    )
    hist = value_histogram(df, ("g",), "v", 16)
    got = histogram_quantiles(hist, ("g",), (0.5, 0.95), 16).collect()
    assert {r["est"] for r in got} == {7.5}


def test_cms_never_undercounts_and_exact_on_light_load(spark):
    from pyspark.sql import functions as F

    from mgo_liveagent_data_pipeline_spark.operators.aggregations import (
        cms_build,
        cms_estimate,
    )

    # 20 distinct values, skewed counts: value v appears v+1 times
    rows = [(v,) for v in range(20) for _ in range(v + 1)]
    df = spark.createDataFrame(rows, ["v"])
    sketch = cms_build(df, "v", width=256, depth=4)
    # sketch size bound holds regardless of input size
    assert sketch.count() <= 256 * 4
    est = {
        r["v"]: r["est_count"]
        for r in cms_estimate(df, "v", sketch, width=256, depth=4).collect()
    }
    true = {v: v + 1 for v in range(20)}
    for v, t in true.items():
        assert est[v] >= t, (v, est[v], t)  # CMS never undercounts
    # 20 values into 256 columns: collisions unlikely across ALL 4 rows,
    # so the min-estimate is exact here
    assert est == true


def test_cms_merge_equals_whole_and_heavy_hitters(spark):
    from pyspark.sql import functions as F

    from mgo_liveagent_data_pipeline_spark.operators.aggregations import (
        cms_build,
        cms_heavy_hitters,
        cms_merge,
    )

    a = spark.createDataFrame([("hot",)] * 50 + [("a",), ("b",)], ["v"])
    b = spark.createDataFrame([("hot",)] * 30 + [("c",)] * 5, ["v"])
    merged = cms_merge(
        cms_build(a, "v", 128, 3), cms_build(b, "v", 128, 3)
    )
    whole = cms_build(a.unionByName(b), "v", 128, 3)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )

    hh = cms_heavy_hitters(
        a.unionByName(b), "v", threshold=10, width=128, depth=3
    ).collect()
    assert [(r["v"], r["n_true"]) for r in hh] == [("hot", 80)]
    assert hh[0]["est_count"] >= 80


def test_bm25_ranks_matching_docs_and_prunes_candidates(spark):
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        bm25_topk,
        inverted_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark join"),   # high tf for 'spark'
            (2, "spark join"),               # both terms, short doc
            (3, "join join join join join"), # only the common term
            (4, "table scan filter"),        # no query term
        ],
        ["doc_id", "text"],
    )
    out = bm25_topk(docs, ["spark", "join"], "text", "doc_id", k=10).collect()
    keys = [r["doc_id"] for r in out]
    # doc 4 matches nothing -> pruned before scoring, absent from results
    assert 4 not in keys and set(keys) == {1, 2, 3}
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["n_matched"] == 2 and by_id[3]["n_matched"] == 1
    # 'spark' is rarer (df 2/4) than 'join' (df 3/4): docs carrying it
    # outrank the join-only doc
    assert keys.index(1) < keys.index(3)
    assert keys.index(2) < keys.index(3)
    # scores strictly ordered (desc) with doc_id tiebreak
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)

    idx = inverted_index(docs, "text", "doc_id")
    row = idx.where("key = 1 and term = 'spark'").collect()[0]
    assert row["tf"] == 3 and row["dl"] == 4


def test_gap_fill_locf_fills_missing_buckets(spark):
    from datetime import datetime

    from mgo_liveagent_data_pipeline_spark.operators.aggregations import (
        gap_fill_locf,
    )

    rows = [
        ("a", datetime(2024, 1, 1, 0, 15), 1.0),
        ("a", datetime(2024, 1, 1, 0, 45), 2.0),   # hour 0: sum 3.0
        # hours 1-2 silent -> gaps carrying 3.0
        ("a", datetime(2024, 1, 1, 3, 10), 7.0),   # hour 3: 7.0
        ("b", datetime(2024, 1, 1, 5, 0), 9.0),    # single bucket, no gaps
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "value"])
    out = gap_fill_locf(df, ("k",), "ts", 3600, "value").collect()
    a = sorted(
        [(r["bucket_ts"].hour, r["is_gap"], r["total_value"])
         for r in out if r["k"] == "a"]
    )
    assert a == [
        (0, False, 3.0),
        (1, True, 3.0),
        (2, True, 3.0),
        (3, False, 7.0),
    ]
    b = [(r["is_gap"], r["total_value"]) for r in out if r["k"] == "b"]
    assert b == [(False, 9.0)]


def test_quality_filter_reasons_and_keep(spark):
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        quality_filter,
    )

    good = "the and of " + " ".join(f"word{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, good),                            # passes every rule
            (2, "short text"),                    # too_short (+stopword: 0 hits? 'text'... no) 
            (3, ("spam " * 60).strip()),          # rep_token + stopword
            (4, good.upper()),                    # upper (caps-heavy)
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in quality_filter(docs).collect()}
    assert out[1]["keep"] and out[1]["reasons"] == ""
    assert not out[2]["keep"] and "too_short" in out[2]["reasons"]
    r3 = out[3]["reasons"]
    assert not out[3]["keep"] and "rep_token" in r3 and "stopword" in r3
    # fixed rule order in the reasons string
    assert r3.index("rep_token") < r3.index("stopword")
    assert not out[4]["keep"] and "upper" in out[4]["reasons"]
    # decision column is narrow: only key, n_tokens, keep, reasons
    assert quality_filter(docs).columns == [
        "doc_id", "n_tokens", "keep", "reasons"
    ]


def test_extract_urls_normalizes_hosts_and_domains(spark):
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        domain_stats,
        extract_urls,
    )

    docs = spark.createDataFrame(
        [
            (1, "read https://WWW.Blog.Example.com/a?x=1 and "
                "http://cdn.example.com/img.png"),
            (2, "plain text, no links here"),
            (3, "dup https://blog.example.com/b https://other.org/"),
            (4, "tricky https://user:pw@Evil.example.com:8443/x "
                "http://example.com:8080/y"),
        ],
        ["doc_id", "text"],
    )
    u = extract_urls(docs).collect()
    got = {(r["doc_id"], r["host"], r["registered_domain"]) for r in u}
    assert (1, "blog.example.com", "example.com") in got   # www+case stripped
    assert (1, "cdn.example.com", "example.com") in got
    assert (3, "other.org", "other.org") in got
    assert all(r["doc_id"] != 2 for r in u)                # no URLs -> no rows
    # userinfo@ and :port must not leak into the rollup key — a
    # blocklist on example.com would otherwise be bypassable
    assert (4, "evil.example.com", "example.com") in got
    assert (4, "example.com", "example.com") in got

    s = {r["registered_domain"]: (r["n_urls"], r["n_docs"])
         for r in domain_stats(docs).collect()}
    assert s["example.com"] == (5, 3)   # 5 urls across docs 1, 3, 4
    assert s["other.org"] == (1, 1)


def test_group_sample_k_quota_and_determinism(spark):
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        group_sample_k,
    )

    rows = [(i, "en" if i % 3 else "fr") for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = group_sample_k(df, "lang", k=5).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append((r["sample_rank"], r["doc_id"]))
    # exactly 5 per group, ranks 1..5
    assert sorted(x[0] for x in by_lang["en"]) == [1, 2, 3, 4, 5]
    assert sorted(x[0] for x in by_lang["fr"]) == [1, 2, 3, 4, 5]
    # partitioning-invariant: same keys chosen at different parallelism
    out2 = group_sample_k(df.repartition(7), "lang", k=5).collect()
    assert sorted((r["lang"], r["doc_id"]) for r in out) == sorted(
        (r["lang"], r["doc_id"]) for r in out2
    )
    # quota smaller than the group: min(k, |group|)
    tiny = spark.createDataFrame([(1, "x"), (2, "x")], ["doc_id", "lang"])
    assert group_sample_k(tiny, "lang", k=9).count() == 2


def test_standardize_zscore_properties(spark):
    from pyspark.sql import functions as F

    from mgo_liveagent_data_pipeline_spark.operators.aggregations import (
        standardize,
    )

    rows = [("a", float(v)) for v in (1, 2, 3, 4, 5)] + [("b", 7.0), ("b", 7.0)]
    df = spark.createDataFrame(rows, ["g", "x"])
    out = standardize(df, ("g",), "x")
    a = out.where("g = 'a'")
    # z-scores of 1..5: mean 3, std sqrt(2) -> symmetric around 0
    stats = a.agg(
        F.round(F.sum("zscore"), 6).alias("s"),
        F.max("zscore").alias("mx"),
    ).collect()[0]
    assert stats["s"] == 0.0
    assert abs(stats["mx"] - 1.414214) < 1e-6
    # constant group: sigma 0 -> NULL zscores, rows preserved
    b = out.where("g = 'b'").collect()
    assert len(b) == 2 and all(r["zscore"] is None for r in b)
    # partitioning-invariant (decimal-exact moments)
    z1 = sorted((r["g"], r["x"], r["zscore"]) for r in out.collect())
    z2 = sorted(
        (r["g"], r["x"], r["zscore"])
        for r in standardize(df.repartition(5), ("g",), "x").collect()
    )
    assert z1 == z2


def test_quality_filter_null_text_fails_closed(spark):
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        quality_filter,
    )

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ])
    df = spark.createDataFrame([(1, None)], schema)
    r = quality_filter(df).collect()[0]
    assert not r["keep"] and r["reasons"] == "null_text"


def test_standardize_preserves_null_group_and_quantized_constants(spark):
    from pyspark.sql.types import (
        DoubleType, StringType, StructField, StructType,
    )

    from mgo_liveagent_data_pipeline_spark.operators.aggregations import (
        standardize,
    )

    schema = StructType([
        StructField("g", StringType()),
        StructField("x", DoubleType()),
    ])
    rows = [("a", 1.0), ("a", 2.0), (None, 5.0),
            # constant group whose value does not fit in 6 decimals:
            # quantized moments give var > 0, min=max must still win
            ("c", 0.1234567), ("c", 0.1234567)]
    df = spark.createDataFrame(rows, schema)
    rows_out = standardize(df, ("g",), "x").collect()
    out = {(r["g"], r["x"]): r["zscore"] for r in rows_out}
    assert len(rows_out) == 5                 # NULL-group row preserved
    assert out[(None, 5.0)] is None
    assert out[("c", 0.1234567)] is None      # constant group -> NULL
    assert out[("a", 1.0)] == -1.0 and out[("a", 2.0)] == 1.0


def test_mixture_sample_rates_cap_and_unweighted_drop(spark):
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        mixture_sample,
    )

    # domain a: 10 docs x 10 tokens = 100; domain b: 1 doc x 10 = 10;
    # domain c unweighted -> dropped entirely
    rows = []
    for i in range(10):
        rows.append((i, "a", " ".join(["w"] * 10)))
    rows.append((100, "b", " ".join(["w"] * 10)))
    rows.append((200, "c", " ".join(["w"] * 10)))
    df = spark.createDataFrame(rows, ["doc_id", "domain", "text"])
    # budget 60, weights 5/1: a target 50/100 -> rate 0.5; b target
    # 10/10 -> rate caps at 1.0 (under-represented keeps everything)
    out = mixture_sample(
        df, "domain", {"a": 5.0, "b": 1.0}, 60, "text", "doc_id"
    )
    got = out.collect()
    rates = {r["domain"]: r["accept_rate"] for r in got}
    assert rates.get("b") == 1.0
    assert all(r["domain"] != "c" for r in got)
    # md5-bucket fractions of "0".."9": only ids 6 (0.09), 9 (0.27)
    # fall under 0.5 — the deterministic half-rate subset
    kept_a = sorted(r["doc_id"] for r in got if r["domain"] == "a")
    assert kept_a == [6, 9]
    # kept rows carry the already-computed token counts
    assert all(r["n_tokens"] == 10 for r in got)

    # a weighted domain with ZERO corpus tokens must rate 1.0, not
    # raise DIVIDE_BY_ZERO under the ANSI session
    empty = spark.createDataFrame(
        [(1, "e", "   "), (2, "e", "")], ["doc_id", "domain", "text"]
    )
    out2 = mixture_sample(empty, "domain", {"e": 1.0}, 100).collect()
    assert {r["doc_id"] for r in out2} == {1, 2}
    assert all(r["accept_rate"] == 1.0 for r in out2)


def test_hashed_linear_score_exact_and_empty_doc(spark):
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        hashed_linear_score,
    )

    weights = spark.range(64).selectExpr(
        "id AS bucket", "CAST(id * 10 AS BIGINT) AS weight"
    )
    df = spark.createDataFrame(
        [(1, "x y x"), (2, "   ")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in hashed_linear_score(
        df, weights, 64, "text", "doc_id"
    ).collect()}
    assert out[1]["n_tokens"] == 3
    # recompute expected: bucket = first-8-hex md5 % 64, weight b*10
    import hashlib
    def b(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 64
    expected = (b("x") * 10 * 2 + b("y") * 10) / (3 * 1000)
    assert abs(out[1]["score"] - expected) < 1e-12
    # whitespace-only doc: kept, zero tokens, NULL score
    assert out[2]["n_tokens"] == 0 and out[2]["score"] is None


def test_hashed_linear_score_plan_broadcasts_model(spark):
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        hashed_linear_score,
    )

    weights = spark.range(64).selectExpr(
        "id AS bucket", "CAST(id AS BIGINT) AS weight"
    )
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    plan = (
        hashed_linear_score(df, weights, 64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the model join must be broadcast (no corpus shuffle before the
    # per-doc aggregation)
    assert "BroadcastHashJoin" in plan, plan


def test_extract_urls_psl_registered_domains(spark):
    """With the public-suffix dim, multi-label-suffix hosts keep three
    labels; plain TLD hosts keep two; without it the two-label
    approximation applies everywhere."""
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        extract_urls,
        psl_dim,
    )

    df = spark.createDataFrame(
        [
            (1, "a http://shop.acme.co.uk/x b"),
            (2, "c https://www.portal.metro.com.ph/y d"),
            (3, "e http://cdn.example.org/z f"),
        ],
        ["doc_id", "text"],
    )
    with_psl = {
        r["doc_id"]: r["registered_domain"]
        for r in extract_urls(df, psl=psl_dim(spark)).collect()
    }
    assert with_psl == {
        1: "acme.co.uk", 2: "metro.com.ph", 3: "example.org",
    }
    without = {
        r["doc_id"]: r["registered_domain"]
        for r in extract_urls(df).collect()
    }
    assert without == {1: "co.uk", 2: "com.ph", 3: "example.org"}


def test_png_pack_decode_round_trip_and_guards():
    """The PNG codec decodes its fixture payloads back to the
    pixel-array-derived expectations (all five filter types exercised —
    heights ≥5 with the packer cycling 0..4), and refuses what it cannot
    genuinely decode (bad magic, unsupported color type, torn CRC)."""
    import struct

    import pytest

    from mgo_liveagent_data_pipeline_spark.operators.multimodal import (
        _pack_png,
        png_fixture_images,
        real_png_decode,
    )

    for c in png_fixture_images():
        d = real_png_decode(c["payload"])
        assert (d["width"], d["height"]) == (c["width"], c["height"])
        assert d["n_pixels"] == c["n_pixels"]
        assert d["mean_rgb"] == c["mean_rgb"]
    with pytest.raises(NotImplementedError):
        real_png_decode(b"BM not a png")
    # sub-byte depth (4-bit) must refuse, not mis-decode
    deep = bytearray(_pack_png(2, 2, [[(1, 1, 1)] * 2] * 2))
    # IHDR data starts at 8 (sig) + 8 (len+type); bit depth is byte 8 of IHDR
    ihdr_off = 16
    deep[ihdr_off + 8] = 4
    # fix the CRC so the guard hit is the depth, not the checksum
    import zlib

    crc = zlib.crc32(bytes(deep[12:16]) + bytes(deep[16 : 16 + 13])) & 0xFFFFFFFF
    deep[16 + 13 : 16 + 17] = struct.pack(">I", crc)
    with pytest.raises(NotImplementedError):
        real_png_decode(bytes(deep))
    # 16-bit decodes: means use each sample's HIGH byte, so a 16-bit
    # packing of v<<8 matches the 8-bit packing of v exactly
    w16, h16 = 5, 4
    r8 = [[((x * 11 + y) % 256, (x + y * 13) % 256, (x * 5 + y * 9) % 256)
           for x in range(w16)] for y in range(h16)]
    r16 = [[(p[0] << 8, p[1] << 8, p[2] << 8) for p in row] for row in r8]
    d16 = real_png_decode(_pack_png(w16, h16, r16, depth=16))
    d8 = real_png_decode(_pack_png(w16, h16, r8))
    assert d16["mean_rgb"] == d8["mean_rgb"]
    # 16-bit palette is spec-invalid -> refuse
    with pytest.raises(NotImplementedError):
        real_png_decode(
            _pack_png(2, 1, [[0, 0]], ctype=3, palette=[(1, 2, 3)], depth=16)
        )
    # sub-byte: 2-bit gray Adam7 round-trips pixel-exactly against the
    # sequential packing, and the gray scale is exact (85 = 255/3)
    w2, h2 = 9, 7
    g2 = [[(x + y) % 4 for x in range(w2)] for y in range(h2)]
    d2i = real_png_decode(
        _pack_png(w2, h2, g2, ctype=0, interlace=True, depth=2),
        with_pixels=True,
    )
    d2s = real_png_decode(
        _pack_png(w2, h2, g2, ctype=0, depth=2), with_pixels=True
    )
    assert d2i["pixels"] == d2s["pixels"] == bytes(
        v for row in g2 for v in row
    )
    flat2 = [v * 85 for row in g2 for v in row]
    m = sum(flat2) // len(flat2)
    assert d2s["mean_rgb"] == m * 65536 + m * 256 + m
    # alpha variants genuinely decode; alpha is excluded from the means
    # but participates in the defiltering stride — compare against the
    # same color data packed WITHOUT alpha
    w, h = 6, 5
    rgb = [[((x * 11 + y) % 256, (x + y * 13) % 256, (x * 5 + y * 9) % 256)
            for x in range(w)] for y in range(h)]
    rgba_rows = [[(*rgb[y][x], (x * 7 + y * 3) % 256) for x in range(w)]
                 for y in range(h)]
    ga_rows = [[(rgb[y][x][0], (x + y) % 256) for x in range(w)]
               for y in range(h)]
    gray_rows = [[rgb[y][x][0] for x in range(w)] for y in range(h)]
    d_rgba = real_png_decode(_pack_png(w, h, rgba_rows, ctype=6))
    d_rgb = real_png_decode(_pack_png(w, h, rgb))
    assert d_rgba["mean_rgb"] == d_rgb["mean_rgb"]
    d_ga = real_png_decode(_pack_png(w, h, ga_rows, ctype=4))
    d_g = real_png_decode(_pack_png(w, h, gray_rows, ctype=0))
    assert d_ga["mean_rgb"] == d_g["mean_rgb"]
    # a palette image whose PLTE chunk is stripped must refuse
    pal_payload = bytearray(
        _pack_png(2, 2, [[0, 1], [1, 0]], ctype=3,
                  palette=[(9, 9, 9), (200, 100, 50)])
    )
    # chunks: sig(8) IHDR(25) PLTE(12+6) IDAT ... — splice PLTE out
    no_plte = bytes(pal_payload[:33]) + bytes(pal_payload[33 + 18:])
    with pytest.raises(ValueError, match="PLTE"):
        real_png_decode(no_plte)
    # out-of-range palette index: 1-entry palette, index 1 used
    bad_idx = _pack_png(2, 1, [[0, 1]], ctype=3, palette=[(1, 2, 3)])
    with pytest.raises(ValueError, match="index"):
        real_png_decode(bad_idx)
    # Adam7: means are permutation-invariant, so certify the per-pass
    # scatter with the exact row-major channel bytes vs the sequential
    # packing of the same image (odd size -> partially-empty passes)
    w, h = 11, 7
    rows = [
        [((x * 17 + y) % 256, (x + y * 29) % 256, (x * 7 + y * 3) % 256)
         for x in range(w)]
        for y in range(h)
    ]
    di = real_png_decode(_pack_png(w, h, rows, interlace=True),
                         with_pixels=True)
    ds = real_png_decode(_pack_png(w, h, rows), with_pixels=True)
    assert di["pixels"] == ds["pixels"]
    assert (di["width"], di["height"], di["mean_rgb"]) == (
        ds["width"], ds["height"], ds["mean_rgb"])
    # torn payload: flip one IDAT byte -> CRC mismatch must raise
    torn = bytearray(png_fixture_images()[0]["payload"])
    torn[40] ^= 0xFF
    with pytest.raises(ValueError):
        real_png_decode(bytes(torn))


def test_jpeg_fixture_round_trip_and_guards():
    """Baseline JPEG codec: fixtures decode back to the component-value-
    derived expectations (exact by construction — block-constant values
    whose DC quantizes without remainder), and out-of-scope streams
    refuse rather than mis-decode."""
    import pytest

    from mgo_liveagent_data_pipeline_spark.operators.multimodal import (
        jpeg_fixture_images,
        real_jpeg_decode,
    )

    for c in jpeg_fixture_images():
        d = real_jpeg_decode(c["payload"])
        assert (d["width"], d["height"]) == (c["width"], c["height"])
        assert d["n_pixels"] == c["n_pixels"]
        assert d["mean_rgb"] == c["mean_rgb"]
    with pytest.raises(NotImplementedError):
        real_jpeg_decode(b"\x89PNG not a jpeg")
    # progressive (SOF2) must refuse: flip the frame marker in a fixture
    prog = bytearray(jpeg_fixture_images()[0]["payload"])
    prog[prog.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        real_jpeg_decode(bytes(prog))


def test_jpeg_zigzag_matches_spec_prefix():
    """The DC-only fixtures never exercise the zigzag map, so pin it
    against the T.81 scan order directly (first 16 positions)."""
    from mgo_liveagent_data_pipeline_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
    )

    assert _JPEG_ZIGZAG[:16] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
        (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    ]
    assert len(_JPEG_ZIGZAG) == 64 and len(set(_JPEG_ZIGZAG)) == 64


def test_jpeg_ac_coefficient_stream_matches_direct_idct():
    """Hand-craft a single-block grayscale stream carrying one AC
    coefficient (run 0 / size 1 at zigzag index 1) and check the decoded
    mean against a direct evaluation of the T.81 IDCT formula written
    here — exercising the AC run-length decode, the zigzag placement,
    dequantization, and the 2-D IDCT on a path no fixture reaches."""
    import math
    import struct

    from mgo_liveagent_data_pipeline_spark.operators.multimodal import (
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _JpegBitWriter,
        _jpeg_huff_codes,
        real_jpeg_decode,
    )

    ac_bits = [0, 2] + [0] * 14  # '00' -> EOB, '01' -> (run 0, size 1)
    ac_vals = [0x00, 0x01]
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + bytes([16] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + struct.pack(">BBB", 1, 0x11, 0)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for cls, bits, vals in (
        (0x00, _JPEG_DC_BITS, _JPEG_DC_VALS),
        (0x10, ac_bits, ac_vals),
    ):
        payload = bytes([cls]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    dc_codes = _jpeg_huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_huff_codes(ac_bits, ac_vals)
    w = _JpegBitWriter()
    code, ln = dc_codes[2]  # DC diff +2 (category 2)
    w.put(code, ln)
    w.put(2, 2)
    code, ln = ac_codes[0x01]  # one AC coef, size 1, value +1
    w.put(code, ln)
    w.put(1, 1)
    code, ln = ac_codes[0x00]  # EOB
    w.put(code, ln)
    w.flush()
    out += w.buf + b"\xff\xd9"

    got = real_jpeg_decode(bytes(out))
    # direct IDCT: F[v][u] natural order, DC=2*16, AC at (v=0, u=1)=1*16
    F = [[0.0] * 8 for _ in range(8)]
    F[0][0] = 32.0
    F[0][1] = 16.0
    c = [1 / math.sqrt(2)] + [1.0] * 7
    total = 0
    for y in range(8):
        for x in range(8):
            acc = 0.0
            for v in range(8):
                for u in range(8):
                    acc += (
                        c[u] * c[v] * F[v][u]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            val = int(round(acc / 4 + 128))
            total += max(0, min(255, val))
    mean = total // 64
    assert got["mean_rgb"] == mean * 65536 + mean * 256 + mean
    assert (got["width"], got["height"]) == (8, 8)


def test_jpeg_420_mcu_block_placement():
    """Hand-craft a single-MCU 4:2:0 stream whose FOUR Y blocks carry
    different values (the packer's fixtures use identical Y blocks, so
    they cannot catch a wrong block-to-quadrant mapping): per-quadrant
    means pin the interleaved MCU ordering (Y left→right, top→bottom,
    then Cb, Cr) and the 2×2 chroma upsample."""
    import struct

    from mgo_liveagent_data_pipeline_spark.operators.multimodal import (
        _JPEG_AC_BITS,
        _JPEG_AC_VALS,
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _JpegBitWriter,
        _jpeg_huff_codes,
        real_jpeg_decode,
    )

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + bytes([16] * 64)
    # 12×10 inside one 16×16 MCU: the crop gives each Y quadrant a
    # DISTINCT pixel weight (64/32/16/8), so any block-to-quadrant
    # permutation shifts the mean — a 16×16 frame could not detect one
    sof = struct.pack(">BHHB", 8, 10, 12, 3)
    sof += struct.pack(">BBB", 1, 0x22, 0)  # Y 2x2
    sof += struct.pack(">BBB", 2, 0x11, 0)
    sof += struct.pack(">BBB", 3, 0x11, 0)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for cls, bits, vals in (
        (0x00, _JPEG_DC_BITS, _JPEG_DC_VALS),
        (0x10, _JPEG_AC_BITS, _JPEG_AC_VALS),
    ):
        payload = bytes([cls]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    dc = _jpeg_huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac = _jpeg_huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    w = _JpegBitWriter()
    ys = [132, 140, 150, 160]  # TL, TR, BL, BR quadrant values
    pred = 0
    for y in ys:
        dcq = (y - 128) // 2
        diff = dcq - pred
        pred = dcq
        s = abs(diff).bit_length()
        code, ln = dc[s]
        w.put(code, ln)
        if s:
            w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
        code, ln = ac[0x00]
        w.put(code, ln)
    for _ in range(2):  # Cb, Cr at 128 (DC diff 0 from fresh predictors)
        code, ln = dc[0]
        w.put(code, ln)
        code, ln = ac[0x00]
        w.put(code, ln)
    w.flush()
    out += w.buf + b"\xff\xd9"

    got = real_jpeg_decode(bytes(out))
    assert (got["width"], got["height"]) == (12, 10)
    # neutral chroma -> r=g=b=y per pixel; quadrant pixel counts inside
    # the 12×10 crop: TL 8×8, TR 8 rows × 4 cols, BL 2×8, BR 2×4
    sr = 64 * ys[0] + 32 * ys[1] + 16 * ys[2] + 8 * ys[3]
    mean = sr // 120
    assert got["mean_rgb"] == mean * 65536 + mean * 256 + mean


def test_jpeg_restart_structure_guards():
    """Malformed restart structure fails with a TYPED error, not an
    IndexError deep in the bit reader: RST markers without a DRI
    declaration, and an entropy stream truncated mid-MCU."""
    import pytest

    from mgo_liveagent_data_pipeline_spark.operators.multimodal import (
        jpeg_fixture_images,
        real_jpeg_decode,
    )

    rst_payload = jpeg_fixture_images()[8]["payload"]
    # strip the 6-byte DRI segment (FFDD 0004 interval)
    i = rst_payload.index(b"\xff\xdd")
    no_dri = rst_payload[:i] + rst_payload[i + 6 :]
    with pytest.raises(ValueError, match="no DRI"):
        real_jpeg_decode(no_dri)
    # truncate the scan: drop the last entropy bytes before EOI
    plain = jpeg_fixture_images()[0]["payload"]
    truncated = plain[:-6] + b"\xff\xd9"
    with pytest.raises(ValueError, match="exhausted|Huffman"):
        real_jpeg_decode(truncated)


def test_temperature_sample_alpha_limits(spark):
    """α = 1 ⇔ proportional sampling: every domain gets the SAME
    acceptance rate min(1, budget/Σtokens); α = 0 targets a uniform
    budget/n_domains per domain regardless of its natural share (small
    domains keep everything, big ones downsample hardest)."""
    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        release_intermediates,
    )
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        temperature_sample,
    )

    rows = []
    k = 0
    for dom, n_docs, words in (("big", 40, 20), ("mid", 10, 20), ("small", 2, 20)):
        for _ in range(n_docs):
            rows.append((k, " ".join(f"w{k}x{j}" for j in range(words)), dom))
            k += 1
    df = spark.createDataFrame(rows, ["doc_id", "text", "dom"])
    total = 52 * 20

    r1 = {
        r["dom"]: r["accept_rate"]
        for r in temperature_sample(df, "dom", 1.0, total // 2)
        .select("dom", "accept_rate").distinct().collect()
    }
    release_intermediates()
    assert len(set(r1.values())) == 1  # proportional: one shared rate
    assert abs(next(iter(r1.values())) - 0.5) < 1e-6

    r0 = {
        r["dom"]: r["accept_rate"]
        for r in temperature_sample(df, "dom", 0.0, total // 2)
        .select("dom", "accept_rate").distinct().collect()
    }
    release_intermediates()
    # uniform targets: budget/3 ≈ 173 tokens per domain -> the small
    # domain (40 tokens) keeps all, the big one (800) keeps ~22%
    assert r0["small"] == 1.0
    assert r0["big"] < r0["mid"] < 1.0


def test_fuzzy_decontaminate_catches_paraphrase_exact_misses(spark):
    """A near-verbatim eval leak (one word changed, shared n-grams broken
    only locally) is caught by the fuzzy LSH check; an unrelated train
    doc is not; and key overlap between train and eval spaces is safe
    (eval keys are negative-mapped internally)."""
    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        release_intermediates,
    )
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        fuzzy_decontaminate,
    )

    ev_text = "the quick brown fox jumps over the lazy dog tonight again"
    train = spark.createDataFrame(
        [
            (1, ev_text + " extra"),  # near-dup of the eval item
            (2, "completely unrelated training text about other things"),
        ],
        ["doc_id", "text"],
    )
    # eval doc shares key 1 with a train doc — must NOT collide
    ev = spark.createDataFrame([(1, ev_text)], ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["n_eval_matches"], r["max_jaccard"])
        for r in fuzzy_decontaminate(train, ev).collect()
    }
    release_intermediates()
    assert set(out) == {1}
    assert out[1][0] == 1 and out[1][1] >= 0.4


def test_fuzzy_decontaminate_rejects_negative_keys(spark):
    import pytest

    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        release_intermediates,
    )
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        fuzzy_decontaminate,
    )

    txt = "the quick brown fox jumps over the lazy dog tonight again"
    train = spark.createDataFrame([(-3, txt)], ["doc_id", "text"])
    ev = spark.createDataFrame([(1, txt)], ["doc_id", "text"])
    with pytest.raises(Exception, match="nonnegative"):
        fuzzy_decontaminate(train, ev).collect()
    release_intermediates()
    train2 = spark.createDataFrame([(3, txt)], ["doc_id", "text"])
    ev2 = spark.createDataFrame([(-1, txt)], ["doc_id", "text"])
    with pytest.raises(Exception, match="nonnegative"):
        fuzzy_decontaminate(train2, ev2).collect()
    release_intermediates()


def test_lm_perplexity_prefers_reference_like_text(spark):
    """The CCNet contract: text drawn from the reference distribution
    scores LOWER avg_nll (head) than out-of-distribution text (tail);
    a <2-token doc is 'unscored' with NULL avg_nll."""
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        lm_perplexity_score,
    )

    ref_sent = "the cat sat on the mat and the dog sat on the rug"
    ref = spark.createDataFrame(
        [(100 + i, ref_sent) for i in range(5)], ["doc_id", "text"]
    )
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),       # in-distribution
            (2, "zq xv bnm qwerty plok mzx"),    # OOV everywhere
            (3, "solo"),                         # <2 tokens -> unscored
        ],
        ["doc_id", "text"],
    )
    # V = 64: small enough that add-one smoothing doesn't flatten the
    # tiny fixture counts (p(seen) ≈ 6/84 vs p(unseen-context) = 1/64)
    out = {
        r["doc_id"]: r
        for r in lm_perplexity_score(df, ref, 64, head_nll=3.5).collect()
    }
    assert out[1]["avg_nll"] < out[2]["avg_nll"]
    assert out[1]["ppl_bucket"] == "head"
    assert out[2]["ppl_bucket"] != "head"
    assert out[3]["ppl_bucket"] == "unscored"
    assert out[3]["avg_nll"] is None and out[3]["n_bigrams"] == 0
    # case-folding: scoring is over lowercased tokens
    up = spark.createDataFrame([(9, "THE CAT SAT ON THE MAT")],
                               ["doc_id", "text"])
    same = lm_perplexity_score(up, ref, 64, head_nll=3.5).collect()[0]
    assert same["avg_nll"] == out[1]["avg_nll"]
    # inverted thresholds fail loudly: a head cut above the tail cut
    # would relabel (tail, head] docs 'head' and sneak them past a
    # != 'tail' gate (the stream_scored_ingest hazard)
    with _pytest.raises(ValueError, match="head_nll"):
        lm_perplexity_score(df, ref, 64, head_nll=9.0, tail_nll=7.0)


def test_dsir_weight_discriminates_target(spark):
    """DSIR's selection signal: docs resembling the TARGET distribution
    get higher log ratios than docs resembling only the raw corpus; the
    weight is an exact integer milli-nat sum (milli_weight) with one
    double division (avg_log_ratio)."""
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        dsir_importance_weight,
    )

    raw = spark.createDataFrame(
        [(1, "alpha beta alpha beta gamma")]
        + [(i, "noise filler junk padding text") for i in range(2, 8)],
        ["doc_id", "text"],
    )
    target = spark.createDataFrame(
        [(50 + i, "alpha beta alpha beta") for i in range(4)],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r for r in dsir_importance_weight(raw, target, 256).collect()
    }
    assert out[1]["avg_log_ratio"] > out[2]["avg_log_ratio"]
    # unigrams + bigrams: n tokens -> 2n-1 features
    assert out[1]["n_feats"] == 5 + 4
    assert out[1]["milli_weight"] == round(
        out[1]["avg_log_ratio"] * out[1]["n_feats"] * 1000
    )


def test_gif_fixture_round_trip_and_guards():
    """The GIF codec decodes its fixture payloads back to the
    palette-resolved expectations (LZW data from an INDEPENDENT encoder,
    extension blocks and a local color table both exercised), and
    refuses what it cannot genuinely decode."""
    import pytest

    from mgo_liveagent_data_pipeline_spark.operators.multimodal import (
        _pack_gif,
        gif_fixture_images,
        real_gif_decode,
    )

    for c in gif_fixture_images():
        d = real_gif_decode(c["payload"])
        assert (d["width"], d["height"]) == (c["width"], c["height"])
        assert d["n_pixels"] == c["n_pixels"]
        assert d["mean_rgb"] == c["mean_rgb"]
    with pytest.raises(NotImplementedError):
        real_gif_decode(b"\x89PNG not a gif")
    base = _pack_gif(4, 3, [(1, 2, 3), (4, 5, 6)], [[0, 1] * 2] * 3)
    # truncated mid-sub-block -> structural error, not a mis-decode
    with pytest.raises(ValueError):
        real_gif_decode(base[:-8])
    # interlaced: means are permutation-invariant, so certify the
    # DEINTERLACE with the exact row-major pixel layout — every row
    # distinct across 9 rows (all four passes populated)
    iw, ih = 5, 9
    ipal = [(k, k, k) for k in range(16)]
    irows = [[(y * 3 + x) % 16 for x in range(iw)] for y in range(ih)]
    ip = _pack_gif(iw, ih, ipal, irows, interlaced=True)
    d = real_gif_decode(ip, with_pixels=True)
    assert d["pixels"] == bytes(i for row in irows for i in row)
    # and the same image packed straight decodes to the same layout
    straight = real_gif_decode(
        _pack_gif(iw, ih, ipal, irows), with_pixels=True
    )
    assert straight["pixels"] == d["pixels"]
    # LZW width growth + dictionary reset: an image large and varied
    # enough that codes pass 4095 entries round-trips exactly
    import random

    rnd = random.Random(11)
    w, h = 160, 90
    pal = [(k, (k * 3) % 256, (k * 7) % 256) for k in range(256)]
    rows = [[rnd.randrange(256) for _ in range(w)] for _ in range(h)]
    flat = [pal[i] for r in rows for i in r]
    n = len(flat)
    exp = (
        (sum(p[0] for p in flat) // n) * 65536
        + (sum(p[1] for p in flat) // n) * 256
        + sum(p[2] for p in flat) // n
    )
    d = real_gif_decode(_pack_gif(w, h, pal, rows))
    assert (d["n_pixels"], d["mean_rgb"]) == (w * h, exp)


def test_dsir_gumbel_topk_selection(spark):
    """Gumbel-top-k selection: temperature 0 degenerates to exact top-k
    by weight; k ≥ n ranks everything; the perturbation is a pure
    function of the key, so two invocations agree row-for-row."""
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        dsir_gumbel_topk,
    )

    rows = [(i, 1000 * (10 - i)) for i in range(10)] + [(99, None)]
    scored = spark.createDataFrame(rows, ["doc_id", "milli_weight"])

    t0 = dsir_gumbel_topk(scored, 3, temperature=0.0).collect()
    assert [r["doc_id"] for r in t0] == [0, 1, 2]
    assert [r["sel_rank"] for r in t0] == [1, 2, 3]
    assert all(r["sel_milli"] == r["milli_weight"] for r in t0)

    full = dsir_gumbel_topk(scored, 100).collect()
    assert len(full) == 10  # NULL-weight row excluded, everything ranked
    again = dsir_gumbel_topk(scored, 100).collect()
    assert full == again
    # the Gumbel genuinely perturbs: with weights this close (1000 milli
    # = 1 nat apart), at least one rank differs from pure weight order
    close = spark.createDataFrame(
        [(i, 100 - i) for i in range(20)], ["doc_id", "milli_weight"]
    )
    sel = dsir_gumbel_topk(close, 20).collect()
    assert [r["doc_id"] for r in sel] != list(range(20))


def test_lm_scorers_partition_invariant(spark):
    """The integer milli-nat design claim: per-doc sums are
    order-independent, so scores are bit-identical at any parallelism.
    Rerun both scorers on 1-partition and 13-partition layouts of the
    same corpus and require row-for-row equality."""
    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        release_intermediates,
    )
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        dsir_importance_weight,
        lm_perplexity_score,
    )

    rows = [
        (i, " ".join(f"w{(i * 13 + j) % 37}" for j in range(30 + i % 7)),
         "en" if i % 2 == 0 else "de")
        for i in range(60)
    ]
    df1 = spark.createDataFrame(rows, ["doc_id", "text", "lang"]).coalesce(1)
    df13 = spark.createDataFrame(rows, ["doc_id", "text", "lang"]).repartition(13)

    def snap(df, fn):
        out = sorted(
            tuple(r) for r in fn(df, df.where("lang = 'en'"), 256).collect()
        )
        release_intermediates()
        return out

    assert snap(df1, lm_perplexity_score) == snap(df13, lm_perplexity_score)
    assert snap(df1, dsir_importance_weight) == snap(df13, dsir_importance_weight)


def test_codec_fuzz_failure_surface():
    """Corrupt media bytes must fail CLEANLY: every decoder raises
    ValueError or NotImplementedError on fuzzed input — never a parser
    internal (struct.error, IndexError, KeyError, wave.Error...) that
    executor-side error routing can't key on. 1000 seeded
    flip/truncate/insert mutations per codec over the real fixtures."""
    import random

    from mgo_liveagent_data_pipeline_spark.operators.multimodal import (
        bmp_fixture_images,
        gif_fixture_images,
        jpeg_fixture_images,
        png_fixture_images,
        real_audio_decode,
        real_gif_decode,
        real_image_decode,
        real_jpeg_decode,
        real_png_decode,
        wav_fixture_clips,
    )

    rnd = random.Random(42)
    cases = [
        (real_png_decode, [c["payload"] for c in png_fixture_images()]),
        (real_gif_decode, [c["payload"] for c in gif_fixture_images()]),
        (real_jpeg_decode, [c["payload"] for c in jpeg_fixture_images()]),
        (real_image_decode, [c["payload"] for c in bmp_fixture_images()]),
        (real_audio_decode, [c["payload"] for c in wav_fixture_clips()]),
    ]
    for fn, payloads in cases:
        for _trial in range(1000):
            p = bytearray(rnd.choice(payloads))
            for _ in range(rnd.randrange(1, 4)):
                op = rnd.randrange(3)
                if op == 0 and p:
                    p[rnd.randrange(len(p))] = rnd.randrange(256)
                elif op == 1 and len(p) > 4:
                    del p[rnd.randrange(len(p)):]
                else:
                    p[rnd.randrange(len(p) + 1):0] = bytes(
                        [rnd.randrange(256)]
                    )
            try:
                fn(bytes(p))
            except (ValueError, NotImplementedError):
                pass  # the clean failure surface — or a lucky decode


def test_bpe_train_matches_published_walkthrough(spark):
    """bpe_train reproduces the Sennrich et al. 2016 walk-through on
    the paper's corpus: (e,s) then (es,t) learned first (deterministic
    lexicographic tie-break at count 9), and bpe_apply_word segments
    with the learned table exactly."""
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        bpe_apply_word,
        bpe_encode,
        bpe_train,
    )

    corpus = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    df = spark.createDataFrame([(1, corpus)], ["doc_id", "text"])
    merges = bpe_train(df, 4)
    assert [(a, b) for a, b, _ in merges] == [
        ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")
    ]
    assert merges[0][2] == 9 and merges[1][2] == 9

    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    assert bpe_apply_word("newest", ranks) == ["n", "e", "w", "est"]
    assert bpe_apply_word("low", ranks) == ["low"]
    assert bpe_apply_word("x", ranks) == ["x"]
    # overlap semantics: leftmost-first, non-overlapping
    assert bpe_apply_word("aaa", {("a", "a"): 0}) == ["aa", "a"]

    # encode over the trained table: 5*1 + 2*3 + 6*4 + 3*4 = 47 subwords
    out = bpe_encode(df, tuple((a, b) for a, b, _ in merges)).collect()
    assert (out[0]["n_words"], out[0]["n_bpe_tokens"]) == (16, 47)
    # empty / NULL text rows survive with zero counts
    edge = spark.createDataFrame(
        [(2, ""), (3, None)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in bpe_encode(edge).collect()}
    assert rows[2]["n_bpe_tokens"] == 0 and rows[3]["n_words"] == 0


def test_bpe_train_batched_equals_sequential(spark):
    """The round-10 batched merge learning is EXACT: merges_per_round>1
    returns the identical merge table (order and counts included) as
    the one-per-round reference, while finishing in fewer rounds — the
    driver-round-trip collapse that makes a 32k-merge vocab trainable.
    An all-tied adversarial corpus degrades to one merge per round,
    never to a wrong table."""
    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        bpe_train,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    seq_stats: dict = {}
    bat_stats: dict = {}
    seq = bpe_train(docs, 24, merges_per_round=1, stats=seq_stats)
    bat = bpe_train(docs, 24, merges_per_round=8, stats=bat_stats)
    assert bat == seq
    assert seq_stats["rounds"] == 24
    # early merges are tie-heavy (the strict-dominance rule defers on
    # ties), so the collapse here is modest; the scale smoke shows the
    # larger-vocab regime where counts separate and rounds ≪ merges
    assert bat_stats["rounds"] < seq_stats["rounds"] * 0.75

    # disjoint ties are SAFE to batch: four token-disjoint pairs all
    # tied at 3 collapse into one round, exactly in sequential order
    corpus = " ".join(["ab", "cd", "ef", "gh"] * 3)
    df = spark.createDataFrame([(1, corpus)], ["doc_id", "text"])
    tied_seq = bpe_train(df, 4, merges_per_round=1)
    tied_bat_stats: dict = {}
    tied_bat = bpe_train(df, 4, merges_per_round=4, stats=tied_bat_stats)
    assert tied_bat == tied_seq
    assert tied_bat_stats["rounds"] == 1

    # SHARING ties are the adversarial case: (a,b) and (b,c) tied —
    # the strict-dominance rule defers (b,c) to the recount (where the
    # sequential pick is really (ab,c)), degrading to one merge per
    # round, never to a wrong table
    corpus2 = " ".join(["abc"] * 3)
    df2 = spark.createDataFrame([(1, corpus2)], ["doc_id", "text"])
    adv_seq = bpe_train(df2, 2, merges_per_round=1)
    adv_bat_stats: dict = {}
    adv_bat = bpe_train(df2, 2, merges_per_round=4, stats=adv_bat_stats)
    assert adv_bat == adv_seq == [("a", "b", 3), ("ab", "c", 3)]
    assert adv_bat_stats["rounds"] == 2


def test_bpe_train_approximate_mode_collapses_rounds(spark):
    """exact=False is the production-throughput batching: rounds
    collapse toward merges ÷ merges_per_round, the result is fully
    deterministic (two runs identical), and the learned table is a
    well-formed merge chain (every non-initial token is producible by
    an earlier merge)."""
    from pyspark.sql import functions as F

    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        bpe_train,
    )

    word = F.substring(F.md5(F.col("id").cast("string")), 1, 6)
    zipf = spark.range(1, 200).select(
        F.explode(
            F.array_repeat(word, (F.lit(600) / F.col("id")).cast("int") + 1)
        ).alias("text"),
        F.col("id").alias("doc_id"),
    )
    st1: dict = {}
    m1 = bpe_train(zipf, 32, merges_per_round=8, exact=False, stats=st1)
    m2 = bpe_train(zipf, 32, merges_per_round=8, exact=False)
    assert m1 == m2 and len(m1) == 32
    assert st1["rounds"] <= 10  # ~32/8 with tie-deferral slack
    # chain validity: every merged token decomposes into earlier tokens
    known = set("0123456789abcdef")
    for a, b, n in m1:
        assert a in known and b in known and n >= 2
        known.add(a + b)


# ---------------------------------------------------- optional codec adapters


def test_adapter_refusals_unchanged_when_libs_absent():
    """With Pillow/soundfile absent (this container), the opt-in
    adapter flag changes NOTHING: every refusal raises exactly as
    before, including with allow_adapter=True — the adapter is
    feature-detected, never assumed. (Skipped if the libs ARE
    installed; the positive tests below take over there.)"""
    import pytest

    from mgo_liveagent_data_pipeline_spark.operators.multimodal import (
        _pillow,
        _soundfile,
        audio_decode,
        real_decode,
        real_resize,
    )

    if _pillow() is not None or _soundfile() is not None:
        pytest.skip("codec libs installed — refusal-path test not applicable")
    webp = b"RIFF\x00\x00\x00\x00WEBPVP8 "
    with pytest.raises(NotImplementedError):
        real_decode(webp)
    with pytest.raises(NotImplementedError):
        real_decode(webp, allow_adapter=True)
    with pytest.raises(NotImplementedError):
        real_resize(b"BM....", 4, 4, allow_adapter=True)
    with pytest.raises((NotImplementedError, ValueError)):
        audio_decode(b"ID3\x04\x00\x00\x00\x00\x00\x00", allow_adapter=True)


def test_pillow_adapter_decodes_what_stdlib_refuses():
    """With Pillow installed: payloads the stdlib decoders refuse
    (alpha PNG, progressive JPEG) decode through the opt-in adapter,
    stdlib-decodable payloads are untouched by the flag (stdlib runs
    first), and the default allow_adapter=False still refuses."""
    import io

    import pytest

    PIL_Image = pytest.importorskip("PIL.Image")

    from mgo_liveagent_data_pipeline_spark.operators.multimodal import (
        pillow_resize,
        real_decode,
    )

    # alpha (RGBA) PNG — stdlib real_png_decode refuses color type 6
    buf = io.BytesIO()
    PIL_Image.new("RGBA", (7, 5), (1, 2, 3, 4)).save(buf, format="PNG")
    alpha_png = buf.getvalue()
    with pytest.raises(NotImplementedError):
        real_decode(alpha_png)
    assert real_decode(alpha_png, allow_adapter=True) == (7, 5)

    # progressive JPEG — stdlib real_jpeg_decode refuses SOF2
    buf = io.BytesIO()
    PIL_Image.new("RGB", (9, 4), (10, 20, 30)).save(
        buf, format="JPEG", progressive=True
    )
    prog_jpeg = buf.getvalue()
    with pytest.raises(NotImplementedError):
        real_decode(prog_jpeg)
    assert real_decode(prog_jpeg, allow_adapter=True) == (9, 4)

    # the resize slot: real bytes out, decodable back to the new dims
    out = pillow_resize(alpha_png, 3, 2)
    assert real_decode(out, allow_adapter=True) == (3, 2)

    # the '~5 lines inside a UDF' claim: the adapter runs inside an
    # Arrow-batched mapInPandas crossing on the real plumbing
    import pandas as pd

    from mgo_liveagent_data_pipeline_spark.session import get_spark

    spark = get_spark(
        "adapter_udf", master="local[2]", shuffle_partitions=2
    )
    df = spark.createDataFrame(
        [(1, bytearray(alpha_png)), (2, bytearray(prog_jpeg))],
        "doc_id long, media binary",
    )

    def dims(batches):
        from mgo_liveagent_data_pipeline_spark.operators.multimodal import (
            real_decode as rd,
        )

        for b in batches:
            w, h = zip(*(rd(bytes(p), allow_adapter=True) for p in b["media"]))
            yield pd.DataFrame(
                {"doc_id": b["doc_id"], "width": w, "height": h}
            )

    got = {
        r["doc_id"]: (r["width"], r["height"])
        for r in df.mapInPandas(
            dims, "doc_id long, width long, height long"
        ).collect()
    }
    assert got == {1: (7, 5), 2: (9, 4)}


def test_soundfile_adapter_decodes_what_wave_refuses():
    """With soundfile installed: float-PCM WAV (stdlib wave refuses
    non-16-bit) decodes through the opt-in audio adapter with the same
    header contract."""
    import pytest

    sf = pytest.importorskip("soundfile")

    import io

    import numpy as np

    from mgo_liveagent_data_pipeline_spark.operators.multimodal import (
        audio_decode,
    )

    buf = io.BytesIO()
    sf.write(
        buf, np.zeros(800, dtype="float32"), 8000,
        format="WAV", subtype="FLOAT",
    )
    payload = buf.getvalue()
    with pytest.raises((NotImplementedError, ValueError)):
        audio_decode(payload)
    got = audio_decode(payload, allow_adapter=True)
    assert got["sample_rate"] == 8000 and got["n_frames"] == 800
    assert got["duration_ms"] == 100
