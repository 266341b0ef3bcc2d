"""64× entity-resolution scale smoke — batch, incremental, and the
touched-component prune's flat-ingest claim.

Replication follows the grow-block-COUNT rule: each replica of the
dirty-CRM record fixture gets shifted record keys AND shifted block
keys, so per-block sizes stay constant while block count grows N× —
the regime a refined blocking key buys at 100 TB (a replication that
grew block SIZES would instead measure the |block|² wall the max_block
guard exists to refuse).

Cases:
* batch       — resolve_entities over the whole corpus at 1× and N×
                (target: ~linear — per-block pairs constant × N blocks,
                CC linear in edges);
* inc_fixed   — incremental_resolve_entities with a FIXED-size delta
                (replica 0's v1 records) against a 1× vs N× standing
                corpus — the production ingest shape; the
                touched-component prune should hold this near-FLAT
                (the delta's block neighborhood does not grow with the
                corpus);
* inc_changed  — the same fixed delta with ``emit='changed'`` (the
                streaming/MERGE shape): no carry-scan of the stored
                assignment, so this is the pure ingest cost the prune
                is supposed to hold flat.

Usage: python tools/scale_smoke_er.py [factor]
Writes one JSON line; DESIGN.md records the table.
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


def replicate_records(records, factor: int, n_keys: int):
    """Shift record keys and block keys per replica: block count grows
    factor×, per-block composition is identical in every replica. A
    ``block_key2`` column (the multi-pass fixture's phone-prefix pass)
    is shifted too — replicas share phone digits, so an unshifted
    second key would grow pass-2 block SIZES with the factor instead of
    block count (NULLs stay NULL: F.concat propagates them)."""
    out = records
    has_bk2 = "block_key2" in records.columns
    for i in range(1, factor):
        # 10_000 shift clears the multi fixture's +1000 v4 offset for
        # any factor ≤ 10 000 — replica blocks never collide
        rep = records.withColumn(
            "rec_id", F.col("rec_id") + F.lit(i * 10 * n_keys)
        ).withColumn("block_key", F.col("block_key") + F.lit(i * 10_000))
        if has_bk2:
            rep = rep.withColumn(
                "block_key2",
                F.concat(F.lit(f"{i}|"), F.col("block_key2")),
            )
        out = out.unionByName(rep)
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spark = get_spark("scale_smoke_er")

    from mgo_liveagent_data_pipeline_spark.operators.entity import (
        incremental_resolve_entities,
        resolve_entities,
    )
    from mgo_liveagent_data_pipeline_spark.plans.relational import _er_records

    base = _er_records(spark, SF_DIR)
    n_keys = base.agg(F.max("rec_id")).collect()[0][0] + 1
    recs_1x = base.localCheckpoint(eager=True)
    recs_nx = replicate_records(recs_1x, factor, n_keys).localCheckpoint(
        eager=True
    )

    # fixed-size delta: replica 0's v1 records (every %3 customer's
    # lowercased+suffixed variant) — identical bytes at both scales
    is_delta = F.col("rec_id") % 10 == 1
    delta = recs_1x.where(is_delta).localCheckpoint(eager=True)
    corpus_1x = recs_1x.where(~is_delta).localCheckpoint(eager=True)
    # at Nx the corpus keeps every replica >0 intact (their v1 rows are
    # NOT delta — only replica 0 ingests) so the standing corpus grows
    # ~N× while the delta stays fixed
    corpus_nx = recs_nx.where(
        ~(is_delta & (F.col("rec_id") < 10 * n_keys))
    ).localCheckpoint(eager=True)

    results = {}

    def timed(name, fn):
        t0 = time.time()
        n = fn().count()
        results[name] = {"t": round(time.time() - t0, 2), "rows": n}
        print(json.dumps({name: results[name]}), file=sys.stderr)

    # warm the code path once
    resolve_entities(recs_1x).count()

    timed("batch_1x", lambda: resolve_entities(recs_1x))
    timed(f"batch_{factor}x", lambda: resolve_entities(recs_nx, max_block=20_000))
    r = results[f"batch_{factor}x"]["t"] / max(results["batch_1x"]["t"], 1e-9)
    results["batch_ratio"] = {
        "ratio": round(r, 1), "ratio_per_unit": round(r / factor, 3)
    }

    asg_1x = resolve_entities(corpus_1x).localCheckpoint(eager=True)
    asg_nx = resolve_entities(corpus_nx, max_block=20_000).localCheckpoint(
        eager=True
    )
    timed(
        "inc_fixed_1x",
        lambda: incremental_resolve_entities(
            corpus_1x, delta, corpus_assignment=asg_1x
        ),
    )
    timed(
        f"inc_fixed_{factor}x",
        lambda: incremental_resolve_entities(
            corpus_nx, delta, corpus_assignment=asg_nx, max_block=20_000
        ),
    )
    r = results[f"inc_fixed_{factor}x"]["t"] / max(
        results["inc_fixed_1x"]["t"], 1e-9
    )
    results["inc_fixed_ratio"] = {"ratio": round(r, 1)}

    timed(
        "inc_changed_1x",
        lambda: incremental_resolve_entities(
            corpus_1x, delta, corpus_assignment=asg_1x, emit="changed"
        ),
    )
    timed(
        f"inc_changed_{factor}x",
        lambda: incremental_resolve_entities(
            corpus_nx,
            delta,
            corpus_assignment=asg_nx,
            max_block=20_000,
            emit="changed",
        ),
    )
    r = results[f"inc_changed_{factor}x"]["t"] / max(
        results["inc_changed_1x"]["t"], 1e-9
    )
    results["inc_changed_ratio"] = {"ratio": round(r, 1)}

    # ---- multi-pass blocking (round 10): nationkey ∪ phone-prefix ----
    from mgo_liveagent_data_pipeline_spark.plans.relational import (
        _er_multi_records,
    )

    blocks = ["block_key", "block_key2"]
    mbase = _er_multi_records(spark, SF_DIR)
    mn_keys = mbase.agg(F.max("rec_id")).collect()[0][0] + 1
    m_1x = mbase.localCheckpoint(eager=True)
    m_nx = replicate_records(m_1x, factor, mn_keys).localCheckpoint(
        eager=True
    )
    timed("batch_multi_1x", lambda: resolve_entities(m_1x, block_col=blocks))
    timed(
        f"batch_multi_{factor}x",
        lambda: resolve_entities(m_nx, block_col=blocks, max_block=20_000),
    )
    r = results[f"batch_multi_{factor}x"]["t"] / max(
        results["batch_multi_1x"]["t"], 1e-9
    )
    results["batch_multi_ratio"] = {
        "ratio": round(r, 1), "ratio_per_unit": round(r / factor, 3)
    }

    m_delta = m_1x.where(is_delta).localCheckpoint(eager=True)
    m_corpus_1x = m_1x.where(~is_delta).localCheckpoint(eager=True)
    m_corpus_nx = m_nx.where(
        ~(is_delta & (F.col("rec_id") < 10 * mn_keys))
    ).localCheckpoint(eager=True)
    masg_1x = resolve_entities(
        m_corpus_1x, block_col=blocks
    ).localCheckpoint(eager=True)
    masg_nx = resolve_entities(
        m_corpus_nx, block_col=blocks, max_block=20_000
    ).localCheckpoint(eager=True)
    timed(
        "inc_multi_1x",
        lambda: incremental_resolve_entities(
            m_corpus_1x, m_delta, corpus_assignment=masg_1x,
            block_col=blocks, emit="changed",
        ),
    )
    timed(
        f"inc_multi_{factor}x",
        lambda: incremental_resolve_entities(
            m_corpus_nx, m_delta, corpus_assignment=masg_nx,
            block_col=blocks, max_block=20_000, emit="changed",
        ),
    )
    r = results[f"inc_multi_{factor}x"]["t"] / max(
        results["inc_multi_1x"]["t"], 1e-9
    )
    results["inc_multi_ratio"] = {"ratio": round(r, 1)}

    print(json.dumps({"factor": factor, "cases": results}))


if __name__ == "__main__":
    main()
