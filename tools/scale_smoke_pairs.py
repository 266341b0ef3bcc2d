"""64× pair-operator scale smoke — the super-linear-risk trio only.

The general 8× smoke (tools/scale_smoke.py) showed flat-to-linear ratios
everywhere, but the PAIR-GENERATING operators (MinHash-LSH, incremental
delta-vs-corpus, CC clustering over blocked-Jaccard pairs) are the only
ones whose worst case is quadratic, and 8× is too small to expose
bucket-cap behavior. This harness replicates the documents corpus N×
(default 64, replica sub-corpora perturbed to share no shingles) and for
each operator reports:

* wall time at 1× and N× with the linear-target ratio (t_Nx / t_1x ≤ N
  means at-worst-linear; ``ratio_per_unit`` = ratio / N normalizes it);
* the cap's drop accounting at N× — how many LSH mega-buckets / Jaccard
  blocks exceeded their cap, how many banding rows were dropped, and the
  implied candidate pairs (Σ s·(s−1)/2) the cap refused to generate —
  the "silent cap" the audit rules require to be logged, made loud.

Usage: python tools/scale_smoke_pairs.py [factor]
Writes one JSON line; DESIGN.md records the table.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mgo_liveagent_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate_docs(spark, dst_dir: str, factor: int) -> str:
    """Same key-shift + token-perturb replication as scale_smoke.py —
    replica sub-corpora share no shingles, so pair growth measures corpus
    growth, not N-way duplicate blowup."""
    df = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n = df.count()
    out = df
    for i in range(1, factor):
        out = out.unionByName(
            df.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10 * n))
            .withColumn(
                "text", F.regexp_replace(F.col("text"), r"(\S+)", f"r{i}x$1")
            )
        )
    path = os.path.join(dst_dir, "documents.parquet")
    out.write.mode("overwrite").parquet(path)
    return path


def lsh_drop_stats(df, cap: int = 1000) -> dict:
    """Cap accounting for the LSH band table: buckets over ``cap``, rows
    dropped, implied candidate pairs never generated."""
    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        _banded_signatures,
    )

    sizes = (
        _banded_signatures(df, "text", "doc_id", 16, 4, 3, None)
        .groupBy("band_key")
        .agg(F.count(F.lit(1)).alias("s"))
        .where(F.col("s") > cap)
    )
    row = sizes.agg(
        F.count(F.lit(1)).alias("capped_buckets"),
        F.coalesce(F.sum("s"), F.lit(0)).alias("dropped_rows"),
        F.coalesce(
            F.sum(F.col("s") * (F.col("s") - 1) / 2), F.lit(0.0)
        ).alias("dropped_pairs"),
    ).collect()[0]
    return {
        "capped_buckets": row["capped_buckets"],
        "dropped_rows": int(row["dropped_rows"]),
        "dropped_pairs": int(row["dropped_pairs"]),
    }


def block_drop_stats(df, block_cols=("lang", "source"), cap: int = 10_000) -> dict:
    """Cap accounting for Jaccard blocking: blocks over ``cap`` and the
    implied in-block pairs skipped."""
    sizes = (
        df.groupBy(*block_cols)
        .agg(F.count(F.lit(1)).alias("s"))
        .where(F.col("s") > cap)
    )
    row = sizes.agg(
        F.count(F.lit(1)).alias("capped_blocks"),
        F.coalesce(F.sum("s"), F.lit(0)).alias("dropped_rows"),
        F.coalesce(
            F.sum(F.col("s") * (F.col("s") - 1) / 2), F.lit(0.0)
        ).alias("dropped_pairs"),
    ).collect()[0]
    return {
        "capped_blocks": row["capped_blocks"],
        "dropped_rows": int(row["dropped_rows"]),
        "dropped_pairs": int(row["dropped_pairs"]),
    }


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spark = get_spark("scale_smoke_pairs")
    big = tempfile.mkdtemp(prefix="mgo_scale_pairs_")
    replicate_docs(spark, big, factor)
    docs_1x = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs_nx = spark.read.parquet(os.path.join(big, "documents.parquet"))

    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        connected_components,
        incremental_minhash_dedup,
        minhash_lsh_dedup,
        ngram_jaccard_pairs,
        release_intermediates,
    )

    def minhash(df):
        return minhash_lsh_dedup(df)

    def mh_salvage(df):
        # oversized-bucket salvage engaged by an adversarially low cap
        # (the dedup_minhash_salvage member's parameters): every size-3/4
        # bucket busts cap 2 and goes through depth-extended re-banding,
        # so the 64× run measures the salvage path itself, not the happy
        # path around it
        return minhash_lsh_dedup(df, max_bucket_size=2, salvage_depth=4)

    def incr(df):
        return incremental_minhash_dedup(
            df.where(F.col("doc_id") % 5 != 0),
            df.where(F.col("doc_id") % 5 == 0),
            "text",
            "doc_id",
        )

    def cc(df):
        # CC over the LSH pair generator — the documented scale path.
        # The first 64× attempt ran CC over blocked-Jaccard pairs with
        # the default 10k block cap and FOUND the cap's cliff: at 64×
        # every (lang, source) block sits just UNDER the cap (~8k docs),
        # so Σ|block|² legitimately explodes ~4096× (≈1.3e9 candidate
        # pairs) and the run died spilling >79 GB of shuffle. That is
        # the operator's documented contract working as designed —
        # coarse-metadata blocking is for small-block corpora; LSH
        # buckets (content-derived, size-capped) are the web-scale
        # route — now measured, not just asserted. cc_blocked below
        # keeps a blocked-Jaccard case with a cap that ENGAGES at 64×,
        # with the drop accounting printed.
        pairs = minhash_lsh_dedup(df)
        return connected_components(pairs.select("id_a", "id_b"))

    def cc_blocked(df):
        pairs = ngram_jaccard_pairs(
            df, "text", "doc_id", block_cols=("lang", "source"),
            shingle_k=1, threshold=0.5, max_block_size=1000,
        )
        return connected_components(pairs.select("id_a", "id_b"))

    results = {}
    pair_cases = {
        "minhash_lsh": minhash,
        "minhash_salvage": mh_salvage,
        "incremental": incr,
        "cc_cluster": cc,
        "cc_blocked_capped": cc_blocked,
    }
    only = set(sys.argv[2:])
    if only:
        unknown = only - set(pair_cases)
        if unknown:
            raise SystemExit(f"unknown case(s) {sorted(unknown)}")
        pair_cases = {k: v for k, v in pair_cases.items() if k in only}
    for name, fn in pair_cases.items():
        fn(docs_1x).count()  # warm the code path
        release_intermediates()
        t0 = time.time()
        n_small = fn(docs_1x).count()
        t_small = time.time() - t0
        release_intermediates()
        t0 = time.time()
        n_large = fn(docs_nx).count()
        t_large = time.time() - t0
        release_intermediates()
        ratio = t_large / max(t_small, 1e-9)
        results[name] = {
            "t_1x": round(t_small, 2),
            f"t_{factor}x": round(t_large, 2),
            "rows_1x": n_small,
            f"rows_{factor}x": n_large,
            "ratio": round(ratio, 1),
            "ratio_per_unit": round(ratio / factor, 3),
        }
        # incremental flush so a died-mid-run session still leaves data
        print(json.dumps({name: results[name]}), file=sys.stderr)

    drops = {}
    if not only:  # full runs keep the cap-drop accounting
        drops = {
            "lsh_cap1000_1x": lsh_drop_stats(docs_1x),
            f"lsh_cap1000_{factor}x": lsh_drop_stats(docs_nx),
            "block_cap1000_1x": block_drop_stats(docs_1x, cap=1000),
            f"block_cap1000_{factor}x": block_drop_stats(docs_nx, cap=1000),
            f"block_cap10000_{factor}x": block_drop_stats(docs_nx, cap=10_000),
        }
    print(json.dumps({"factor": factor, "cases": results, "cap_drops": drops}))
    import shutil

    shutil.rmtree(big, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
