"""64× ANN-family scale smoke — IVF/PQ probe behavior under corpus growth.

The pair-operator trio is covered by scale_smoke_pairs.py; this harness
answers the remaining scale question: what happens to IVF posting lists,
the probes needed to hold a recall floor, and PQ's linear ADC scan when
the corpus grows N× (default 64)?

Two IVF sizings are measured against the same scaled corpus:

* ``fixed``  — centroid count kept at the base 10: posting lists grow N×,
  so each probe scans N× more vectors (the mis-sized deployment);
* ``scaled`` — centroid count grown with the corpus (labels per replica →
  10·N lists): posting lists stay ~base-sized, the per-probe cost is flat,
  and recall is recovered by probing more lists — the documented sizing
  rule (grow the index's fan-out with log2/linear corpus growth, never
  the posting list).

Recall@5 is measured against the brute-force cosine top-5 on the SAME
scaled corpus (replica vectors are deterministically perturbed, so true
neighbors exist at every scale). One JSON line out; DESIGN.md records the
table.

Usage: python tools/scale_smoke_ann.py [factor]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mgo_liveagent_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 5
N_QUERIES = 5


def replicated(spark, factor: int, scale_labels: bool):
    """Replica i: keys shifted, vectors element-wise perturbed by a
    deterministic integer pattern (no replica is an exact duplicate, and
    every engine/run computes the identical floats); labels either kept
    (fixed sizing) or shifted per replica (scaled sizing)."""
    df = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    n = df.count()
    n_labels = df.select("label").distinct().count()
    out = df
    def perturb(i: int):
        return lambda x, j: (
            x + ((F.lit(i * 31) + j * 7) % 23 - 11).cast("float") * F.lit(0.003)
        )

    for i in range(1, factor):
        rep = df.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10 * n))
        rep = rep.withColumn("embedding", F.transform("embedding", perturb(i)))
        if scale_labels:
            rep = rep.withColumn("label", F.col("label") + F.lit(i * n_labels))
        out = out.unionByName(rep)
    return out, n, n_labels


def recall_at_k(approx, exact) -> float:
    """Mean per-query |approx top-k ∩ exact top-k| / k."""
    hits = (
        approx.select("query_id", "corpus_id")
        .join(exact.select("query_id", "corpus_id"), ["query_id", "corpus_id"])
        .groupBy("query_id")
        .count()
    )
    rows = hits.collect()
    per_q = {r["query_id"]: r["count"] for r in rows}
    n_q = exact.select("query_id").distinct().count()
    return round(sum(per_q.values()) / (K * max(n_q, 1)), 3)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spark = get_spark("scale_smoke_ann")
    from mgo_liveagent_data_pipeline_spark.operators.annsearch import (
        cosine_topk,
        ivf_topk,
        ivfpq_topk,
        pq_topk,
    )
    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        release_intermediates,
    )

    out: dict = {"metric": "ann_scale_smoke", "factor": factor, "sf_dir": SF_DIR}

    def queries_of(corpus):
        return (
            corpus.where(F.col("vec_id") < N_QUERIES)
            .select(F.col("vec_id").alias("query_id"), "embedding")
        )

    for tag, fac, scale_labels in (
        ("base", 1, False),
        ("fixed", factor, False),
        ("scaled", factor, True),
    ):
        corpus, n_base, n_labels = replicated(spark, fac, scale_labels)
        corpus = corpus.persist()
        n_rows = corpus.count()
        q = queries_of(corpus)
        posting = corpus.groupBy("label").count().agg(
            F.count(F.lit(1)).alias("n_lists"),
            F.max("count").alias("max_list"),
            F.round(F.avg("count"), 1).alias("avg_list"),
        ).collect()[0]
        t0 = time.time()
        exact = cosine_topk(corpus, q, k=K).persist()
        exact.count()
        t_brute = round(time.time() - t0, 2)
        section = {
            "rows": n_rows,
            "n_lists": posting["n_lists"],
            "max_list": posting["max_list"],
            "avg_list": float(posting["avg_list"]),
            "t_brute": t_brute,
            "ivf": {},
        }
        # probe sweep: how many posting lists must be scanned to hold the
        # recall floor at this sizing
        sweep = (1, 2, 4, 8) if posting["n_lists"] <= 16 else (1, 2, 4, 8, 16, 64)
        for p in sweep:
            t0 = time.time()
            approx = ivf_topk(corpus, q, k=K, n_probes=p).persist()
            approx.count()
            t = round(time.time() - t0, 2)
            section["ivf"][f"p{p}"] = {
                "recall": recall_at_k(approx, exact),
                "sec": t,
            }
            approx.unpersist()
        t0 = time.time()
        pq = pq_topk(corpus, q, k=K).persist()
        pq.count()
        section["pq"] = {
            "recall": recall_at_k(pq, exact),
            "sec": round(time.time() - t0, 2),
        }
        pq.unpersist()
        # the composed index: IVF routing prunes rows, PQ codes prune
        # bytes — probe count chosen from the plain-IVF sweep's knee
        ipq_probes = 2 if posting["n_lists"] <= 16 else 8
        t0 = time.time()
        ipq = ivfpq_topk(corpus, q, k=K, n_probes=ipq_probes).persist()
        ipq.count()
        section["ivfpq"] = {
            "n_probes": ipq_probes,
            "recall": recall_at_k(ipq, exact),
            "sec": round(time.time() - t0, 2),
        }
        ipq.unpersist()
        # metadata-filtered probe (round 11): 'pre' prunes posting-list
        # MEMBERS before ranking — cost must DROP with selectivity and
        # the true filtered top-k comes back full; 'post' ranks the
        # unfiltered lists and drops afterwards — the under-fill
        # contract, measured here as returned-row shortfall. Recall
        # baseline is the brute-force top-k of the ELIGIBLE subset.
        pred = "vec_id % 7 = 0"  # ~14% selectivity at every scale
        fprobes = 2 if posting["n_lists"] <= 16 else 8
        t0 = time.time()
        fexact = cosine_topk(corpus.where(pred), q, k=K).persist()
        n_full = fexact.count()
        t_fbrute = round(time.time() - t0, 2)
        t0 = time.time()
        fpre = ivf_topk(
            corpus, q, k=K, n_probes=fprobes,
            predicate=pred, filter_mode="pre",
        ).persist()
        n_pre = fpre.count()
        t_fpre = round(time.time() - t0, 2)
        t0 = time.time()
        fpost = ivf_topk(
            corpus, q, k=K, n_probes=fprobes,
            predicate=pred, filter_mode="post",
        ).persist()
        n_post = fpost.count()
        t_fpost = round(time.time() - t0, 2)
        section["filtered"] = {
            "n_probes": fprobes,
            "t_brute_filtered": t_fbrute,
            "pre": {
                "recall": recall_at_k(fpre, fexact),
                "rows": n_pre,
                "sec": t_fpre,
            },
            "post": {"rows": n_post, "rows_full": n_full, "sec": t_fpost},
        }
        fpre.unpersist()
        fpost.unpersist()
        fexact.unpersist()
        exact.unpersist()
        corpus.unpersist()
        release_intermediates()
        out[tag] = section
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
