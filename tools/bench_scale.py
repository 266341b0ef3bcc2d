"""Scale probe for the bench's heavy members — the driver-visible scale
axis the round-11 scaling block asked for (8-core ≈ 32-core at sf0.1
means every headline member is latency-bound there; this probe runs the
3-4 members with real data-dependent cost at a REPLICATED input so
parallel-efficiency changes show up in a ground-truth number).

Same contract as bench.py, extended rather than forked:
* base data from ``$SPARK_GRAFT_SF_DIR`` (default sf0.1),
* cores from ``$SPARK_GRAFT_CPUS`` via ``get_spark`` (local[$CPUS]),
* prints ONE JSON line:
  {"metric": "scale_probe_wall_sec", "value": <scaled total>,
   "unit": "sec", "queries": {<member>: <scaled sec>}, "sf": <base*factor>,
   "factor": N, "base_sf": <base>, "base_queries": {...}, "ratio": {...}}

The scaled input is built DETERMINISTICALLY per run from the base
parquet (no cross-run artifacts; the scaled dir is scratch-registered
and purged at exit):

* orders + lineitem: replicated with one shared orderkey shift
  (messages still attach to their tickets — scale_smoke_elt's scheme);
* customer: replicated with a custkey shift AND a per-replica name
  prefix fused into the FIRST name token (``r<i>-Customer#…``), so
  entity_resolution_name's block cardinality keeps growing with N
  (an unperturbed name would grow block SIZES with the factor instead
  — the quadratic regime the member was re-keyed to escape);
* documents: replicated with a doc_id shift, text unchanged — the
  probe measures text_pagerank's per-document extraction scaling; the
  DISTINCT link graph is scale-invariant by fixture construction
  (src = site{doc_id%%17}.com, dst from the unchanged text), so the
  rank loop's cost is constant by design and documented as such;
* embeddings: replicated with a vec_id shift, labels unchanged —
  posting lists grow linearly; queries stay replica-0's (vec_id < 5);
* nation/region: copied unchanged (bounded dimensions in production).

Usage: python tools/bench_scale.py [factor]    (default 10: sf0.1 → ~sf1)
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PROBES = (
    "elt_parity_pipeline",
    "entity_resolution_name",
    "text_pagerank",
    "ann_ivfsq_topk",
)
REPS = int(os.environ.get("SCALE_PROBE_REPS", "2"))


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from pyspark.sql import functions as F

    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        release_intermediates,
    )
    from mgo_liveagent_data_pipeline_spark.plans.registry import (
        ALL_QUERIES as QUERIES,
    )
    from mgo_liveagent_data_pipeline_spark.scratch import (
        purge_scratch,
        scratch_dir,
    )
    from mgo_liveagent_data_pipeline_spark.session import get_spark

    try:
        base_sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        base_sf = -1.0
    spark = get_spark("bench_scale")
    big = scratch_dir("mgo_bench_scale_")

    def read(name: str):
        return spark.read.parquet(os.path.join(SF_DIR, f"{name}.parquet"))

    def write(df, name: str) -> None:
        df.write.mode("overwrite").parquet(os.path.join(big, f"{name}.parquet"))

    orders, li = read("orders"), read("lineitem")
    shift = 10 * orders.count()  # one shift unit shared by both tables

    def replicated(df, key, extra=None):
        out = df
        for i in range(1, factor):
            rep = df.withColumn(key, F.col(key) + F.lit(i * shift))
            if extra is not None:
                rep = extra(rep, i)
            out = out.unionByName(rep)
        return out

    write(replicated(orders, "o_orderkey"), "orders")
    write(replicated(li, "l_orderkey"), "lineitem")
    write(
        replicated(
            read("customer"),
            "c_custkey",
            # fuse the replica tag into the FIRST name token so the
            # er_name blocking key's cardinality keeps growing with N
            extra=lambda df, i: df.withColumn(
                "c_name", F.concat(F.lit(f"r{i}-"), F.col("c_name"))
            ),
        ),
        "customer",
    )
    write(replicated(read("documents"), "doc_id"), "documents")
    write(replicated(read("embeddings"), "vec_id"), "embeddings")
    for t in ("nation", "region"):
        src = os.path.join(SF_DIR, f"{t}.parquet")
        dst = os.path.join(big, f"{t}.parquet")
        (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)

    run = {n: QUERIES[n] for n in PROBES if n in QUERIES}
    sc = spark.sparkContext
    # one untimed warmup per member at base SF (JIT/codegen, bench.py's
    # warmup discipline), then min-of-REPS at base and at the factor
    for name, fn in run.items():
        sc.setJobDescription(f"{name}: warmup")
        fn(spark, SF_DIR).count()
        purge_scratch_sinks(purge_scratch, big)

    def timed(sf_dir: str, tag: str) -> dict[str, float]:
        out: dict[str, float] = {}
        for name, fn in run.items():
            best = float("inf")
            for r in range(REPS):
                sc.setJobDescription(f"{name}: {tag} rep {r}")
                t0 = time.time()
                fn(spark, sf_dir).count()
                best = min(best, time.time() - t0)
                purge_scratch_sinks(purge_scratch, big)
            out[name] = round(best, 3)
        return out

    base_t = timed(SF_DIR, "base")
    scaled_t = timed(big, f"{factor}x")
    sc.setJobDescription(None)
    release_intermediates()
    out = {
        "metric": "scale_probe_wall_sec",
        "value": round(sum(scaled_t.values()), 3),
        "unit": "sec",
        "queries": scaled_t,
        "sf": round(base_sf * factor, 3) if base_sf > 0 else -1.0,
        "factor": factor,
        "base_sf": base_sf,
        "base_queries": base_t,
        "ratio": {
            n: round(scaled_t[n] / max(base_t[n], 1e-9), 2) for n in scaled_t
        },
    }
    print(json.dumps(out))
    purge_scratch()
    spark.stop()


def purge_scratch_sinks(purge_scratch, keep_dir: str) -> None:
    """Purge sink scratch between reps WITHOUT dropping the scaled input
    dir (scratch_dir registered it; re-register after the purge)."""
    from mgo_liveagent_data_pipeline_spark import scratch as _scratch

    kept = keep_dir in _scratch._SCRATCH_DIRS
    if kept:
        _scratch._SCRATCH_DIRS.remove(keep_dir)
    purge_scratch()
    if kept:
        _scratch._SCRATCH_DIRS.append(keep_dir)


if __name__ == "__main__":
    main()
