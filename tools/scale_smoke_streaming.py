"""64x streaming smoke: per-batch ingest wall vs standing-corpus size.

The streaming modes (incdedup, scored_ingest, incsem) are oracle-exact at
sf0.001 but were never scale-gated. The production question is different
from the batch smokes': not "how does the operator scale with corpus
size" but "what does ONE fixed-size micro-batch cost against a standing
corpus N× bigger" — the stored-index claim, now under the real streaming
harness (availableNow + checkpoint + foreachBatch MERGEs).

Per mode and scale the harness:
  1. pre-populates the stream's state tables with the standing corpus
     (corpus table for the MinHash modes; assignment index + frozen
     centroid artifact for incsem — the versioned-artifact model);
  2. stages a FIXED delta (same rows at both scales, ids disjoint from
     every replica range) as one micro-batch;
  3. times the full stream run (checkpoint, trigger, merge, drain);
  4. guards correctness: the stream's delta output must equal the
     direct incremental operator on the same (corpus, delta) — catching
     stream-plumbing bugs without paying a full-corpus batch run at N×.

Writes one JSON line like the other smokes.

Usage: python tools/scale_smoke_streaming.py [factor] [mode ...]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mgo_liveagent_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    only = set(sys.argv[2:])
    spark = get_spark("scale_smoke_streaming")
    from mgo_liveagent_data_pipeline_spark.operators.annsearch import (
        ivf_centroids,
    )
    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        incremental_minhash_dedup,
        incremental_semantic_dedup,
        release_intermediates,
        semantic_assign,
    )
    from mgo_liveagent_data_pipeline_spark.functions.similarity import norm2
    from mgo_liveagent_data_pipeline_spark.sinks.writers import table_path
    from mgo_liveagent_data_pipeline_spark.streaming.windows import (
        stream_incremental_dedup,
        stream_scored_ingest,
        stream_semantic_dedup,
    )
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale_smoke import replicate

    big = tempfile.mkdtemp(prefix="mgo_stream_smoke_")
    docs_1x = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb_1x = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    n_docs_1x = docs_1x.count()
    n_emb_1x = emb_1x.count()
    replicate(spark, SF_DIR, big, "documents", factor, "doc_id", perturb_col="text")
    replicate(spark, SF_DIR, big, "embeddings", factor, "vec_id")
    docs_nx = spark.read.parquet(os.path.join(big, "documents.parquet"))
    emb_nx = spark.read.parquet(os.path.join(big, "embeddings.parquet"))

    def relabel(df):
        # cluster COUNT grows with the corpus (the sizing rule): each
        # replica's labels land in their own band — same as scale_smoke
        rep = F.floor(F.col("vec_id") / F.lit(10 * n_emb_1x))
        return df.withColumn("label", (F.col("label") + rep * 10).cast("int"))

    # the FIXED delta: the 1x table's %37 slice with ids shifted past
    # every replica's key range — identical rows at both scales
    shift = (factor + 2) * 10
    docs_delta = docs_1x.where(F.col("doc_id") % 37 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(shift * n_docs_1x)
    )
    emb_delta = emb_1x.where(F.col("vec_id") % 37 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(shift * n_emb_1x)
    )

    def delta_sf(df, name):
        d = tempfile.mkdtemp(prefix="delta_", dir=big)
        df.write.mode("overwrite").parquet(os.path.join(d, f"{name}.parquet"))
        return d

    docs_delta_sf = delta_sf(docs_delta, "documents")
    emb_delta_sf = delta_sf(emb_delta, "embeddings")

    def prep_minhash(corpus, corpus_name):
        base = tempfile.mkdtemp(prefix="st_", dir=big)
        corpus.select("doc_id", "text").write.mode("overwrite").parquet(
            table_path(base, corpus_name)
        )
        return base

    def run_incdedup(corpus):
        base = prep_minhash(corpus, "st_corpus")
        t0 = time.time()
        pairs_path, _c = stream_incremental_dedup(
            spark, docs_delta_sf, base,
            pairs_name="st_pairs", corpus_name="st_corpus", n_batches=1,
        )
        wall = time.time() - t0
        got = spark.read.parquet(pairs_path)
        want = incremental_minhash_dedup(
            corpus.select("doc_id", "text"), docs_delta.select("doc_id", "text")
        ).select("id_a", "id_b")
        n_got = got.count()
        diff = got.select("id_a", "id_b").exceptAll(want).count() + want.exceptAll(
            got.select("id_a", "id_b")
        ).count()
        release_intermediates()
        return wall, {"pairs": n_got, "diff_vs_direct": diff}

    def run_scored(corpus):
        # stream_scored_ingest writes to its fixed scored_* table names
        base = prep_minhash(corpus, "scored_corpus")
        t0 = time.time()
        pairs_path, corpus_path = stream_scored_ingest(
            spark, docs_delta_sf, base, n_batches=1,
        )
        wall = time.time() - t0
        n_accepted = (
            spark.read.parquet(corpus_path).count() - corpus.count()
        )
        release_intermediates()
        return wall, {"accepted": n_accepted}

    def prep_semantic(corpus):
        base = tempfile.mkdtemp(prefix="st_", dir=big)
        cents = ivf_centroids(corpus).withColumn(
            "cent_n", norm2(F.col("centroid"))
        )
        cents = cents.persist()
        cents.count()
        semantic_assign(corpus, cents).write.mode("overwrite").parquet(
            table_path(base, "st_index")
        )
        return base, cents

    def run_incsem(corpus):
        corpus = relabel(corpus)
        base, cents = prep_semantic(corpus)
        t0 = time.time()
        verdicts_path, index_path = stream_semantic_dedup(
            spark, emb_delta_sf, base,
            verdicts_name="st_verdicts", index_name="st_index",
            n_batches=1, centroids=cents,
        )
        wall = time.time() - t0
        got = spark.read.parquet(verdicts_path)
        delta_keys = emb_delta.select(F.col("vec_id"))
        got_delta = got.join(delta_keys, "vec_id")
        want = incremental_semantic_dedup(
            None,
            emb_delta,
            max_cluster_size=None,  # match the stream's uncapped default
            corpus_index=spark.read.parquet(table_path(base, "st_index"))
            .join(delta_keys.select(F.col("vec_id").alias("key")), "key", "left_anti"),
            centroids=cents,
        ).select("vec_id", "cluster_id", "centroid_sim", "kept")
        diff = got_delta.exceptAll(want).count() + want.exceptAll(got_delta).count()
        n_kept = got_delta.where("kept = 1").count()
        cents.unpersist()
        release_intermediates()
        return wall, {"delta_kept": n_kept, "diff_vs_direct": diff}

    # ---- round 10: the golden-dimension and gated-ingest modes ----
    from mgo_liveagent_data_pipeline_spark.operators.entity import (
        golden_records,
        incremental_resolve_entities,
        resolve_entities,
    )
    from mgo_liveagent_data_pipeline_spark.plans.relational import _er_records
    from mgo_liveagent_data_pipeline_spark.sinks.writers import (
        partitioned_upsert,
        read_partitioned,
    )
    from mgo_liveagent_data_pipeline_spark.streaming.windows import (
        build_er_block_index,
        stream_entity_resolution,
        stream_gated_ingest,
    )
    from scale_smoke_er import replicate_records

    RULES = {"name": "first_by_key", "phone": "min", "address": "longest"}
    er_base = _er_records(spark, SF_DIR)
    er_keys = er_base.agg(F.max("rec_id")).collect()[0][0] + 1
    er_1x = er_base.localCheckpoint(eager=True)
    er_nx = replicate_records(er_1x, factor, er_keys)
    # fixed record delta: the 1x %41 slice, ids shifted past every
    # replica, block keys unchanged (a fixed block neighborhood)
    er_delta = er_1x.where(F.col("rec_id") % 41 == 0).withColumn(
        "rec_id", F.col("rec_id") + F.lit((factor + 2) * 10 * er_keys)
    ).localCheckpoint(eager=True)

    # pointy delta: the same fixed slice CONFINED to two blocks — the
    # trickle-ingest regime where the secondary block index's pruning
    # can actually bite (the full %41 delta inhabits every one of the
    # fixture's 25 blocks, so its rows measure the index's overhead
    # ceiling, not its win case)
    er_delta_pt = er_1x.where(
        (F.col("rec_id") % 41 == 0) & F.col("block_key").isin(3, 7)
    ).withColumn(
        "rec_id", F.col("rec_id") + F.lit((factor + 2) * 10 * er_keys)
    ).localCheckpoint(eager=True)

    def _run_ergold(corpus, state_num_buckets, block_index_buckets=None,
                    delta=None):
        delta = er_delta if delta is None else delta
        corpus = corpus.localCheckpoint(eager=True)
        base = tempfile.mkdtemp(prefix="st_", dir=big)
        # prep (untimed, a table in production): records + assignment +
        # the golden ptable for the standing corpus
        asg = resolve_entities(corpus, max_block=20_000).localCheckpoint(
            eager=True
        )
        if state_num_buckets is None:
            corpus.write.mode("overwrite").parquet(
                table_path(base, "er_records")
            )
            asg.write.mode("overwrite").parquet(
                table_path(base, "er_assignment")
            )
        else:
            partitioned_upsert(
                spark, corpus, base, "er_records", "rec_id",
                num_buckets=state_num_buckets,
            )
            partitioned_upsert(
                spark, asg, base, "er_assignment", "rec_id",
                num_buckets=state_num_buckets,
            )
        if block_index_buckets is not None:
            # bootstrap the secondary block index for the seeded corpus
            # (untimed — the migration cost, paid once, not per ingest)
            build_er_block_index(
                spark, corpus, base, num_buckets=block_index_buckets,
            )
        partitioned_upsert(
            spark,
            golden_records(corpus, asg, rules=RULES),
            base, "er_golden", "entity_id", num_buckets=16,
        )
        t0 = time.time()
        _asgp, _gp = stream_entity_resolution(
            spark, delta, base, n_batches=1, golden_rules=RULES,
            state_num_buckets=state_num_buckets,
            block_index_buckets=block_index_buckets,
        )
        wall = time.time() - t0
        # correctness guard: the stored assignment's recomputed rows
        # equal the direct incremental operator on the same state
        want = incremental_resolve_entities(
            corpus, delta, corpus_assignment=asg,
            max_block=20_000, emit="changed", check_overlap=False,
        ).localCheckpoint(eager=True)
        stored_asg = (
            spark.read.parquet(table_path(base, "er_assignment"))
            if state_num_buckets is None
            else read_partitioned(spark, base, "er_assignment")
        )
        got = stored_asg.join(want.select("rec_id"), "rec_id")
        diff = got.exceptAll(want).count() + want.exceptAll(got).count()
        # and the golden dimension carries every live label the delta's
        # neighborhood produced
        n_golden = read_partitioned(spark, base, "er_golden").count()
        release_intermediates()
        return wall, {"diff_vs_direct": diff, "golden_rows": n_golden}

    def run_ergold(corpus):
        return _run_ergold(corpus, None)

    def run_ergold_ptable(corpus):
        return _run_ergold(corpus, 64)

    def run_ergold_indexed(corpus):
        return _run_ergold(corpus, 64, block_index_buckets=64)

    def run_ergold_ptable_pt(corpus):
        return _run_ergold(corpus, 64, delta=er_delta_pt)

    def run_ergold_indexed_pt(corpus):
        return _run_ergold(corpus, 64, block_index_buckets=64,
                           delta=er_delta_pt)

    # second pointy delta, one more shift unit out (replicas use slots
    # 1..factor-1, the first deltas slot factor+2; this lands in
    # factor+3 — disjoint rec_ids, same two blocks)
    er_delta_pt2 = er_delta_pt.withColumn(
        "rec_id", F.col("rec_id") + F.lit(10 * er_keys)
    ).localCheckpoint(eager=True)

    def run_ergold_auto(corpus):
        """Round-12 auto state layout (state_auto_threshold): seed FLAT
        standing state; the first ingest migrates to ptables iff the
        standing count crossed the threshold (64x: 1.76M >= 100k —
        reported separately as the one-time migration cost), the second
        ingest is the timed steady state on the auto-selected layout.
        Done-criterion: 64x ratio in the ptable band, diff_vs_direct=0,
        flat layout preserved at 1x (27k < 100k)."""
        corpus = corpus.localCheckpoint(eager=True)
        base = tempfile.mkdtemp(prefix="st_", dir=big)
        asg = resolve_entities(corpus, max_block=20_000).localCheckpoint(
            eager=True
        )
        corpus.write.mode("overwrite").parquet(table_path(base, "er_records"))
        asg.write.mode("overwrite").parquet(table_path(base, "er_assignment"))
        partitioned_upsert(
            spark,
            golden_records(corpus, asg, rules=RULES),
            base, "er_golden", "entity_id", num_buckets=16,
        )
        AUTO_T = 100_000
        t0 = time.time()
        stream_entity_resolution(
            spark, er_delta_pt, base, n_batches=1, golden_rules=RULES,
            state_num_buckets=64, state_auto_threshold=AUTO_T,
        )
        t_first = time.time() - t0
        t0 = time.time()
        stream_entity_resolution(
            spark, er_delta_pt2, base, n_batches=1, golden_rules=RULES,
            state_num_buckets=64, state_auto_threshold=AUTO_T,
        )
        wall = time.time() - t0
        # drained-state contract over everything ingested
        all_recs = corpus.unionByName(er_delta_pt).unionByName(er_delta_pt2)
        want = resolve_entities(
            all_recs, max_block=20_000
        ).localCheckpoint(eager=True)
        migrated = os.path.exists(
            os.path.join(base, "er_assignment.ptable", "_MANIFEST")
        )
        stored = (
            read_partitioned(spark, base, "er_assignment")
            if migrated
            else spark.read.parquet(table_path(base, "er_assignment"))
        )
        diff = stored.exceptAll(want).count() + want.exceptAll(stored).count()
        release_intermediates()
        return wall, {
            "diff_vs_direct": diff,
            "first_ingest_wall": round(t_first, 2),
            "layout": "ptable" if migrated else "flat",
        }

    def run_er_compact_overlap(corpus):
        """Round-12 background index fold (guide §2.6): the SAME 4-batch
        pointy ingest with a mid-stream compaction trigger (cadence 3 —
        the fold after batch 3 overlaps batch 4) vs compaction disabled.
        Done-criterion: trigger wall within 1.2x of no-trigger."""
        corpus = corpus.localCheckpoint(eager=True)
        walls = {}
        for tag, cadence in (("trigger", 3), ("notrigger", 0)):
            base = tempfile.mkdtemp(prefix="st_", dir=big)
            asg = resolve_entities(
                corpus, max_block=20_000
            ).localCheckpoint(eager=True)
            partitioned_upsert(
                spark, corpus, base, "er_records", "rec_id", num_buckets=64
            )
            partitioned_upsert(
                spark, asg, base, "er_assignment", "rec_id", num_buckets=64
            )
            build_er_block_index(spark, corpus, base, num_buckets=64)
            partitioned_upsert(
                spark,
                golden_records(corpus, asg, rules=RULES),
                base, "er_golden", "entity_id", num_buckets=16,
            )
            t0 = time.time()
            stream_entity_resolution(
                spark, er_delta_pt, base, n_batches=4, golden_rules=RULES,
                state_num_buckets=64, block_index_buckets=64,
                index_compact_every=cadence,
            )
            walls[tag] = time.time() - t0
            release_intermediates()
        return walls["trigger"], {
            "notrigger_wall": round(walls["notrigger"], 2),
            "trigger_over_notrigger": round(
                walls["trigger"] / max(walls["notrigger"], 1e-9), 2
            ),
        }

    # ---- round 11: streaming MULTI-PASS ER (block_col list) + the
    # bucketed golden dimension at a high bucket count — the 64× row
    # for the round-10 block_col pass-through (pytest-only until now)
    from mgo_liveagent_data_pipeline_spark.plans.relational import (
        _er_multi_records,
    )

    erm_base = _er_multi_records(spark, SF_DIR)
    erm_keys = erm_base.agg(F.max("rec_id")).collect()[0][0] + 1
    erm_1x = erm_base.localCheckpoint(eager=True)
    erm_nx = replicate_records(erm_1x, factor, erm_keys)
    erm_delta = erm_1x.where(F.col("rec_id") % 41 == 0).withColumn(
        "rec_id", F.col("rec_id") + F.lit((factor + 2) * 10 * erm_keys)
    ).localCheckpoint(eager=True)
    ERM_BLOCKS = ["block_key", "block_key2"]

    def run_ermulti(corpus):
        corpus = corpus.localCheckpoint(eager=True)
        base = tempfile.mkdtemp(prefix="st_", dir=big)
        asg = resolve_entities(
            corpus, block_col=ERM_BLOCKS, max_block=20_000
        ).localCheckpoint(eager=True)
        corpus.write.mode("overwrite").parquet(table_path(base, "er_records"))
        asg.write.mode("overwrite").parquet(
            table_path(base, "er_assignment")
        )
        partitioned_upsert(
            spark,
            golden_records(corpus, asg, rules=RULES),
            base, "er_golden", "entity_id", num_buckets=64,
        )
        t0 = time.time()
        stream_entity_resolution(
            spark, erm_delta, base, n_batches=1, golden_rules=RULES,
            golden_num_buckets=64, block_col=ERM_BLOCKS,
        )
        wall = time.time() - t0
        want = incremental_resolve_entities(
            corpus, erm_delta, corpus_assignment=asg,
            block_col=ERM_BLOCKS, max_block=20_000,
            emit="changed", check_overlap=False,
        ).localCheckpoint(eager=True)
        got = spark.read.parquet(table_path(base, "er_assignment")).join(
            want.select("rec_id"), "rec_id"
        )
        diff = got.exceptAll(want).count() + want.exceptAll(got).count()
        n_golden = read_partitioned(spark, base, "er_golden").count()
        release_intermediates()
        return wall, {"diff_vs_direct": diff, "golden_rows": n_golden}

    gate_delta = docs_delta.localCheckpoint(eager=True)

    def _run_gated(corpus, num_buckets):
        corpus = corpus.select("doc_id", "text")
        base = tempfile.mkdtemp(prefix="st_", dir=big)
        if num_buckets is None:
            corpus.write.mode("overwrite").parquet(
                table_path(base, "gated_kept")
            )
        else:
            partitioned_upsert(
                spark, corpus, base, "gated_kept", "doc_id",
                num_buckets=num_buckets,
            )
        t0 = time.time()
        kept_path, _q = stream_gated_ingest(
            spark,
            gate_delta.select("doc_id", "text"),
            base,
            expectations=[("not_null", "text")],
            n_batches=1,
            num_buckets=num_buckets,
        )
        wall = time.time() - t0
        kept = (
            spark.read.parquet(kept_path)
            if num_buckets is None
            else read_partitioned(spark, base, "gated_kept")
        )
        n_new = kept.count() - corpus.count()
        release_intermediates()
        return wall, {"accepted": n_new}

    def run_gated_flat(corpus):
        return _run_gated(corpus, None)

    def run_gated_ptable(corpus):
        return _run_gated(corpus, 64)

    modes = {
        "stream_incdedup": (run_incdedup, docs_1x, docs_nx),
        "stream_scored_ingest": (run_scored, docs_1x, docs_nx),
        "stream_incsem": (run_incsem, emb_1x, emb_nx),
        "stream_ergold": (run_ergold, er_1x, er_nx),
        "stream_ergold_ptable": (run_ergold_ptable, er_1x, er_nx),
        "stream_ergold_indexed": (run_ergold_indexed, er_1x, er_nx),
        "stream_ergold_ptable_pt": (run_ergold_ptable_pt, er_1x, er_nx),
        "stream_ergold_indexed_pt": (run_ergold_indexed_pt, er_1x, er_nx),
        "stream_er_compact_overlap": (run_er_compact_overlap, er_1x, er_nx),
        "stream_ergold_auto": (run_ergold_auto, er_1x, er_nx),
        "stream_ermulti": (run_ermulti, erm_1x, erm_nx),
        "stream_gated_flat": (run_gated_flat, docs_1x, docs_nx),
        "stream_gated_ptable": (run_gated_ptable, docs_1x, docs_nx),
    }
    if only:
        unknown = only - set(modes)
        if unknown:
            raise SystemExit(f"unknown mode(s) {sorted(unknown)}")
        modes = {k: v for k, v in modes.items() if k in only}

    results = {}
    for name, (fn, small, large) in modes.items():
        fn(small)  # warmup: JIT the whole path (stream + state machinery)
        t_small, _ = fn(small)
        t_large, extra = fn(large)
        results[name] = {
            "t_1x": round(t_small, 2),
            f"t_{factor}x": round(t_large, 2),
            "ratio": round(t_large / max(t_small, 1e-9), 1),
            **extra,
        }
    print(json.dumps({"factor": factor, "cases": results}))
    shutil.rmtree(big, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
