"""64× scale smoke for the COMPOSED curation chains (rule-based 6-stage
and scored 9-stage): replicate the sf0.1 documents table N×, run each
chain at 1× and N×, and record what the fixed-cost-domination claim needs
checked at scale — wall-time ratio, driver-job count (the chains are
driver-job dominated at benchmark scale: ~40 scheduled jobs of persists,
1-row ledger aggregates, CC gating and sink commits), and peak disk used
during the N× run (the ~80 GB host disk has been filled by a pair smoke
before; the chains route pairs through capped LSH precisely to avoid
that).

Usage: python tools/scale_smoke_curation.py [factor] [chain ...]
Writes one JSON line. Ledger rows for both scales are included so the
per-stage selectivities can be read against corpus growth.
"""
from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class _DiskPeak:
    """Background sampler of root-fs bytes used — peak-during-run minus
    baseline approximates the run's scratch/spill footprint."""

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
    only = set(sys.argv[2:])

    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        release_intermediates,
    )
    from mgo_liveagent_data_pipeline_spark.plans.pipeline import (
        q_curation_pipeline,
        q_curation_scored_pipeline,
        q_curation_semantic_pipeline,
    )
    from mgo_liveagent_data_pipeline_spark.scratch import purge_scratch
    from mgo_liveagent_data_pipeline_spark.session import get_spark

    spark = get_spark("scale_smoke_curation")
    big = tempfile.mkdtemp(prefix="mgo_scale_cur_")

    # Replication rule for GATE-HEADED chains: scale_smoke.replicate's
    # prefix-every-word perturbation zeroes the replicas' stopword ratio,
    # so the quality gate (min_stopword_ratio) drops every replica doc
    # and the chain's stages 2+ silently run on the 1× corpus — the
    # first 64× attempt measured exactly that (identical ledgers at both
    # scales). Prefixing only NON-stopword tokens keeps every gate
    # statistic in range (token count unchanged, stopword count
    # unchanged, mean word length +len('rNx') ≪ the 12-char cap) while
    # replica sub-corpora still share almost no shingles (a 3-word
    # shingle must be all-stopwords to survive across replicas).
    from pyspark.sql import functions as F

    from mgo_liveagent_data_pipeline_spark.operators.textops import (
        EN_STOPWORDS,
    )

    sw = "|".join(EN_STOPWORDS)
    pat = rf"(?<!\S)(?!(?i)(?:{sw})(?!\S))(\S+)"
    df = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n = df.count()
    out = df
    for i in range(1, factor):
        out = out.unionByName(
            df.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10 * n))
            .withColumn(
                "text", F.regexp_replace(F.col("text"), pat, f"r{i}x$1")
            )
        )
    out.write.mode("overwrite").parquet(
        os.path.join(big, "documents.parquet")
    )

    chains = {
        "curation": q_curation_pipeline,
        "curation_scored": q_curation_scored_pipeline,
        # sign-block COUNT must scale with the corpus (the ANN-smoke
        # sizing rule): bits = 6 + log2(growth), else stage-4 pairs
        # grow as block-size^2
        "curation_semantic": lambda sp, sd: q_curation_semantic_pipeline(
            sp, sd, sem_bits=6 + max(0, round(math.log2(factor)))
            if sd != SF_DIR else 6
        ),
    }
    if only:
        chains = {k: v for k, v in chains.items() if k in only}

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    results = {}
    for name, fn in chains.items():
        fn(spark, SF_DIR).collect()  # warm the whole code path once
        release_intermediates()
        purge_scratch()

        def run(sf_dir: str, tag: str):
            group = f"{name}_{tag}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            ledger = [
                r.asDict()
                for r in fn(spark, sf_dir).orderBy("stage_no").collect()
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
        results[name] = {
            "t_1x": round(t1, 2),
            f"t_{factor}x": round(tn, 2),
            "ratio": round(tn / max(t1, 1e-9), 1),
            "jobs_1x": jobs1,
            f"jobs_{factor}x": jobsn,
            "peak_disk_gb": dp.delta_gb,
            "ledger_1x": led1,
            f"ledger_{factor}x": ledn,
        }
    print(json.dumps({"factor": factor, "cases": results}))
    shutil.rmtree(big, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
