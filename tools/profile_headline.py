"""Round-11 optimization profiler: per-headline-query wall time with the
noop sink (guide §1.4 — times the computation, not the sink or the
count's column pruning) plus `.count()` for continuity with bench.py,
and `.explain("formatted")` capture into plans/r11/<q>_<tag>.txt.

Usage: python tools/profile_headline.py <tag> [query ...]
  tag: 'before' / 'after' (plan file suffix)
  query: subset of HEADLINE (default: all)

Prints one line per query: name, noop_sec (min of reps), count_sec,
exchange count in the executed plan. Jobs are labelled (guide §1.5).
"""
from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("PROFILE_REPS", "3"))
PLANS_DIR = os.environ.get("PLANS_DIR", "plans/r12")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]
    from bench import HEADLINE
    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        release_intermediates,
    )
    from mgo_liveagent_data_pipeline_spark.plans.registry import (
        ALL_QUERIES as QUERIES,
    )
    from mgo_liveagent_data_pipeline_spark.scratch import purge_scratch
    from mgo_liveagent_data_pipeline_spark.session import get_spark

    names = only or HEADLINE
    spark = get_spark("profile_headline")
    os.makedirs(PLANS_DIR, exist_ok=True)
    # warm the JVM same as bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as F

    warm = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    warm.groupBy("n_regionkey").count().collect()
    warm.join(F.broadcast(warm.select("n_nationkey")), "n_nationkey").count()

    print(f"# sf_dir={SF_DIR} reps={REPS} tag={tag}")
    print(f"{'query':32s} {'noop_s':>8s} {'count_s':>8s} {'exch':>5s}")
    for name in names:
        fn = QUERIES[name]
        sc = spark.sparkContext
        # untimed warmup + plan capture
        sc.setJobDescription(f"{name}: warmup")
        df = fn(spark, SF_DIR)
        df.count()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"{PLANS_DIR}/{name}_{tag}.txt", "w") as f:
            f.write(plan)
        exch = len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))
        purge_scratch()
        noop_times, count_times = [], []
        for r in range(REPS):
            sc.setJobDescription(f"{name}: noop rep {r}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            noop_times.append(time.time() - t0)
            purge_scratch()
            sc.setJobDescription(f"{name}: count rep {r}")
            t0 = time.time()
            fn(spark, SF_DIR).count()
            count_times.append(time.time() - t0)
            purge_scratch()
        sc.setJobDescription(None)
        print(
            f"{name:32s} {min(noop_times):8.3f} {min(count_times):8.3f} "
            f"{exch:5d}"
        )
    release_intermediates()
    purge_scratch()
    spark.stop()


if __name__ == "__main__":
    main()
