"""Characterize LSH-routed SemDeDup assignment vs the flat exact argmax.

Round-8 shipped the routed path with ONE agreement number, measured on the
driver's near-isotropic embeddings fixture — the documented RH-LSH worst
case. This tool measures flat-vs-routed assignment agreement, the unrouted
(probe-miss) rate, and the candidate-expansion cost across:

  * fixture: the driver embeddings table (near-isotropic) AND a clustered
    Gaussian-blob corpus (the realistic case — SemDeDup presumes cluster
    structure, that's why it works);
  * route_bits b;
  * probe width: Hamming-1 (default), Hamming-2 (route_hamming=2), and
    Hamming-1 + flat rescue of the residual misses (route_rescue=True).

Output: one markdown table per fixture (pasted into DESIGN.md round-9).

Usage: python tools/routed_agreement.py [n_clustered] [k_clustered]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from mgo_liveagent_data_pipeline_spark.operators.dedup import (
    release_intermediates,
    semantic_assign,
)
from mgo_liveagent_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
DIM = 64


def clustered_fixture(spark, n: int, k: int, spread: float = 0.05):
    """Gaussian blobs around k unit-norm centers — the shape real
    embedding corpora have (deterministic: fixed seed). ``spread`` is the
    per-dimension noise sigma: 0.05 × √64 ≈ 0.4 noise norm against unit
    centers → within-cluster cosine ≈ 0.93, the tightness SemDeDup's own
    paper presumes (a spread of 0.25 makes noise norm ≈ 2 — the corpus
    degenerates to near-isotropic, which round-8's fixture accidentally
    also was)."""
    rng = np.random.default_rng(20240901)
    centers = rng.normal(size=(k, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, k, size=n)
    vecs = centers[labels] + spread * rng.normal(size=(n, DIM))
    rows = [
        (int(i), [float(x) for x in vecs[i]], int(labels[i]))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def measure(df, b: int, hamming: int, rescue: bool) -> dict:
    flat = {
        r["key"]: r["cluster_id"]
        for r in semantic_assign(df).select("key", "cluster_id").collect()
    }
    routed = {
        r["key"]: r["cluster_id"]
        for r in semantic_assign(
            df, route_bits=b, route_hamming=hamming, route_rescue=rescue
        )
        .select("key", "cluster_id")
        .collect()
    }
    release_intermediates()
    n = len(flat)
    miss = sum(1 for v in routed.values() if v is None)
    agree = sum(1 for k_, v in routed.items() if v is not None and v == flat[k_])
    return {
        "n": n,
        "miss_pct": 100.0 * miss / n,
        "agree_pct": 100.0 * agree / n,
    }


def run_fixture(name: str, df, k: int) -> None:
    df = df.persist()
    df.count()
    print(f"\n### {name} (n={df.count()}, k={k})\n")
    print("| b | probe | unrouted % | agreement vs flat % |")
    print("|---|---|---|---|")
    for b in (2, 3, 4, 5, 6):
        for probe, kw in (
            ("H1", dict(hamming=1, rescue=False)),
            ("H2", dict(hamming=2, rescue=False)),
            ("H1+rescue", dict(hamming=1, rescue=True)),
        ):
            m = measure(df, b, kw["hamming"], kw["rescue"])
            print(
                f"| {b} | {probe} | {m['miss_pct']:.1f} | {m['agree_pct']:.1f} |"
            )
    df.unpersist()


def run_jl(name: str, df, out_dims=(8, 16, 32)) -> None:
    """JL-composition measurement: project the corpus, rerun the SAME
    flat assignment (centroids re-derived in projected space by the
    identical deterministic rule), and report agreement vs the full-dim
    flat assignment plus wall time — quantifies the projected-pipeline
    lever (shuffle bytes ÷ dim ratio) against its assignment drift."""
    import time

    from mgo_liveagent_data_pipeline_spark.operators.annsearch import (
        random_project,
    )

    df = df.persist()
    df.count()
    t0 = time.time()
    flat = {
        r["key"]: r["cluster_id"]
        for r in semantic_assign(df).select("key", "cluster_id").collect()
    }
    t_full = time.time() - t0
    release_intermediates()
    print(f"\n### JL-projected flat assignment — {name}\n")
    print(f"full-dim ({DIM}): {t_full:.1f} s (reference)\n")
    print("| out_dim | bytes ratio | agreement vs full-dim flat % | t (s) |")
    print("|---|---|---|---|")
    for d in out_dims:
        proj = random_project(df, "embedding", out_dim=d, dim=DIM)
        t0 = time.time()
        got = {
            r["key"]: r["cluster_id"]
            for r in semantic_assign(proj)
            .select("key", "cluster_id")
            .collect()
        }
        t = time.time() - t0
        release_intermediates()
        agree = 100.0 * sum(1 for k_, v in got.items() if v == flat[k_]) / len(flat)
        print(f"| {d} | {DIM / d:.0f}× | {agree:.1f} | {t:.1f} |")
    df.unpersist()


def main() -> None:
    n_cl = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    k_cl = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("routed_agreement")
    if "--jl" in sys.argv:
        run_jl(
            f"clustered blobs (n={n_cl}, k={k_cl})",
            clustered_fixture(spark, n_cl, k_cl),
        )
        return
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        "label",
    )
    k_iso = emb.select("label").distinct().count()
    run_fixture("near-isotropic (driver embeddings, sf0.01)", emb, k_iso)
    run_fixture(
        "clustered blobs (per-dim spread 0.05, within-cluster cos ~0.93)",
        clustered_fixture(spark, n_cl, k_cl),
        k_cl,
    )


if __name__ == "__main__":
    main()
