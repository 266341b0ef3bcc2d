"""64x scale smoke for the composed reference-lifecycle chain
(plans/parity.py:q_elt_parity_pipeline) — the engine's namesake route.

Replicates orders AND lineitem N× with the SAME per-replica orderkey
shift (messages must still attach to their tickets); nation stays 1×
(it is the agents/gazetteer dimension — bounded in production too).
Records wall ratio, driver-job count (the chain is sink/ledger
job-dominated at benchmark scale), peak scratch disk, and both ledgers
so per-stage selectivity can be read against corpus growth. The chain's
scale story to check: MERGEs shuffle on key only, the recent window
bounds everything downstream, the convo stage is ONE Arrow crossing
per micro-corpus, and the ledger is sixteen 1-row aggregates.

Usage: python tools/scale_smoke_elt.py [factor]
Writes one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class _DiskPeak:
    def __init__(self, interval: float = 0.5):
        self.interval = interval
        self.baseline = shutil.disk_usage("/").used
        self.peak = self.baseline
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._loop, daemon=True)

    def _loop(self):
        while not self._stop.is_set():
            self.peak = max(self.peak, shutil.disk_usage("/").used)
            self._stop.wait(self.interval)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join()

    @property
    def delta_gb(self) -> float:
        return round((self.peak - self.baseline) / 1e9, 2)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from pyspark.sql import functions as F

    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        release_intermediates,
    )
    from mgo_liveagent_data_pipeline_spark.plans.parity import (
        q_elt_parity_pipeline,
    )
    from mgo_liveagent_data_pipeline_spark.scratch import purge_scratch
    from mgo_liveagent_data_pipeline_spark.session import get_spark

    spark = get_spark("scale_smoke_elt")
    big = tempfile.mkdtemp(prefix="mgo_scale_elt_")

    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    n_orders = orders.count()
    shift = 10 * n_orders  # ONE shift unit shared by both tables

    def replicated(df, key):
        out = df
        for i in range(1, factor):
            out = out.unionByName(
                df.withColumn(key, F.col(key) + F.lit(i * shift))
            )
        return out

    replicated(orders, "o_orderkey").write.mode("overwrite").parquet(
        os.path.join(big, "orders.parquet")
    )
    replicated(li, "l_orderkey").write.mode("overwrite").parquet(
        os.path.join(big, "lineitem.parquet")
    )
    # dimensions pass through unchanged (testdata tables are single
    # parquet FILES; replicated tables above are directories)
    for t in ("nation", "region"):
        src = os.path.join(SF_DIR, f"{t}.parquet")
        dst = os.path.join(big, f"{t}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    q_elt_parity_pipeline(spark, SF_DIR).collect()  # warm the code path
    release_intermediates()
    purge_scratch()

    def run(sf_dir: str, tag: str):
        group = f"elt_{tag}"
        sc.setJobGroup(group, "elt_parity")
        t0 = time.time()
        ledger = [
            r.asDict()
            for r in q_elt_parity_pipeline(spark, sf_dir)
            .orderBy("stage_no")
            .collect()
        ]
        dt = time.time() - t0
        sc.setJobGroup("idle", "idle")
        jobs = len(tracker.getJobIdsForGroup(group))
        release_intermediates()
        purge_scratch()
        return dt, jobs, ledger

    t1, jobs1, led1 = run(SF_DIR, "1x")
    with _DiskPeak() as dp:
        tn, jobsn, ledn = run(big, f"{factor}x")
    results = {
        "elt_parity": {
            "t_1x": round(t1, 2),
            f"t_{factor}x": round(tn, 2),
            "ratio": round(tn / max(t1, 1e-9), 1),
            "jobs_1x": jobs1,
            f"jobs_{factor}x": jobsn,
            "peak_disk_gb": dp.delta_gb,
            "ledger_1x": led1,
            f"ledger_{factor}x": ledn,
        }
    }
    print(json.dumps({"factor": factor, "cases": results}))
    shutil.rmtree(big, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
