"""64× graph-operator scale smoke — PageRank and truss communities.

The driver member's citation graph is metadata-scale (32 domains at
every sf — corpus growth multiplies edge MULTIPLICITY, which distinct()
collapses), so graph scaling is measured on a synthetic ring-of-cliques
whose structure follows the grow-COUNT rule: clique SIZE stays fixed
(bounded degree — the regime the ``max_degree`` refusal enforces) while
clique COUNT grows N×. Bridges connect consecutive cliques into a ring,
so the graph stays one connected component for PageRank while truss
communities must still resolve every clique separately (bridges sit in
no triangle).

Expected shapes: PageRank is one join + one (dst, contrib) shuffle per
iteration — linear in |E|; truss support counting is the wedge join —
Σ deg², linear when degree is bounded; the truss CC tail runs on
clique-local labels (diameter 1), so pointer jumping converges in O(1)
rounds at any scale.

Usage: python tools/scale_smoke_graph.py [factor] [clique_size] [cliques_1x]
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


def ring_of_cliques(spark, n_cliques: int, k: int):
    """Edges of n_cliques k-cliques plus one bridge edge between
    consecutive cliques (ring) — string nodes ``n<id>``."""
    ids = spark.range(n_cliques * k * (k - 1) // 2)
    pairs_per = k * (k - 1) // 2

    # enumerate clique-local pairs (i < j) from a flat pair index
    c = (F.col("id") / pairs_per).cast("long")
    p = F.col("id") % pairs_per
    # i = row of the triangular index, j = offset within the row
    # (closed form: find largest i with i*(2k-i-1)/2 <= p)
    i = F.expr(
        f"CAST(floor(({k} * 2 - 1 - sqrt(({k} * 2 - 1) * ({k} * 2 - 1)"
        f" - 8 * (id % {pairs_per}))) / 2) AS BIGINT)"
    )
    j = p - i * (2 * k - i - 1) / 2 + i + 1
    clique_edges = ids.select(
        F.format_string("n%d", c * k + i).alias("src"),
        F.format_string("n%d", (c * k + j).cast("long")).alias("dst"),
    )
    bridges = spark.range(n_cliques).select(
        F.format_string("n%d", F.col("id") * k).alias("src"),
        F.format_string(
            "n%d", ((F.col("id") + 1) % n_cliques) * k + 1
        ).alias("dst"),
    )
    return clique_edges.unionByName(bridges)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n1 = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    spark = get_spark("scale_smoke_graph")

    from mgo_liveagent_data_pipeline_spark.operators.graph import (
        pagerank,
        truss_communities,
    )

    g1 = ring_of_cliques(spark, n1, k).localCheckpoint(eager=True)
    gn = ring_of_cliques(spark, n1 * factor, k).localCheckpoint(eager=True)

    results = {}

    def timed(name, fn):
        t0 = time.time()
        n = fn().count()
        results[name] = {"t": round(time.time() - t0, 2), "rows": n}
        print(json.dumps({name: results[name]}), file=sys.stderr)

    # warm both code paths (JIT/codegen) before any timed run
    pagerank(g1).count()
    truss_communities(g1).count()

    timed("pagerank_1x", lambda: pagerank(g1))
    timed(f"pagerank_{factor}x", lambda: pagerank(gn))
    r = results[f"pagerank_{factor}x"]["t"] / max(
        results["pagerank_1x"]["t"], 1e-9
    )
    results["pagerank_ratio"] = {
        "ratio": round(r, 1), "ratio_per_unit": round(r / factor, 3)
    }

    timed("truss_1x", lambda: truss_communities(g1))
    timed(f"truss_{factor}x", lambda: truss_communities(gn))
    r = results[f"truss_{factor}x"]["t"] / max(results["truss_1x"]["t"], 1e-9)
    results["truss_ratio"] = {
        "ratio": round(r, 1), "ratio_per_unit": round(r / factor, 3)
    }
    # sanity: every clique resolved separately at both scales
    n_comm = (
        truss_communities(g1).select("community").distinct().count()
    )
    results["truss_sanity"] = {"communities_1x": n_comm, "expected": n1}

    # ---- incremental truss (round 10): fixed chord delta vs N× corpus.
    # The corpus additionally carries one BARE 7-ring on fresh nodes;
    # the delta is its distance-2 chords — the old-edge-flip case. The
    # stored support relation is precomputed (a table in production).
    # Expected shape: the gains are delta-sized, the CC runs over the
    # (delta-sized) strong set, but the support-union carry, node
    # distinct, and size join are LINEAR scans of narrow relations —
    # the operator returns the FULL assignment (no emit='changed' yet),
    # so the ratio reflects that carry term honestly.
    from mgo_liveagent_data_pipeline_spark.operators.graph import (
        _sym,
        edge_support,
        incremental_truss_communities,
    )

    def dring(hop):
        return spark.range(7).select(
            F.format_string("d%d", F.col("id")).alias("src"),
            F.format_string("d%d", (F.col("id") + hop) % 7).alias("dst"),
        )

    chords = dring(2).localCheckpoint(eager=True)
    corp1 = g1.unionByName(dring(1)).localCheckpoint(eager=True)
    corpn = gn.unionByName(dring(1)).localCheckpoint(eager=True)
    sup1 = edge_support(_sym(corp1, "src", "dst")).localCheckpoint(eager=True)
    supn = edge_support(_sym(corpn, "src", "dst")).localCheckpoint(eager=True)

    incremental_truss_communities(
        corp1, chords, corpus_support=sup1
    ).count()  # warm
    timed(
        "trussinc_1x",
        lambda: incremental_truss_communities(
            corp1, chords, corpus_support=sup1
        ),
    )
    timed(
        f"trussinc_{factor}x",
        lambda: incremental_truss_communities(
            corpn, chords, corpus_support=supn
        ),
    )
    r = results[f"trussinc_{factor}x"]["t"] / max(
        results["trussinc_1x"]["t"], 1e-9
    )
    results["trussinc_ratio"] = {
        "ratio": round(r, 1), "ratio_per_unit": round(r / factor, 3)
    }

    # the MERGE shape: stored assignment + emit='changed' — recomputed
    # rows only, so the per-ingest cost should hold ~flat (no
    # full-assignment carry, CC pruned to touched communities)
    asg1 = truss_communities(corp1).localCheckpoint(eager=True)
    asgn = truss_communities(corpn).localCheckpoint(eager=True)
    incremental_truss_communities(
        corp1, chords, corpus_support=sup1, corpus_assignment=asg1,
        emit="changed",
    ).count()  # warm
    timed(
        "trussmrg_1x",
        lambda: incremental_truss_communities(
            corp1, chords, corpus_support=sup1, corpus_assignment=asg1,
            emit="changed",
        ),
    )
    timed(
        f"trussmrg_{factor}x",
        lambda: incremental_truss_communities(
            corpn, chords, corpus_support=supn, corpus_assignment=asgn,
            emit="changed",
        ),
    )
    r = results[f"trussmrg_{factor}x"]["t"] / max(
        results["trussmrg_1x"]["t"], 1e-9
    )
    results["trussmrg_ratio"] = {"ratio": round(r, 1)}

    print(json.dumps({"factor": factor, "cases": results}))


if __name__ == "__main__":
    main()
