"""Link-graph operators (operators/graph.py): integer PageRank spec."""
from __future__ import annotations


def py_pagerank(edges, iterations=5, damping_pct=85, base=10**12):
    """Pure-Python reference of the EXACT spec in graph.pagerank's
    docstring — distinct edges, floor divisions, dangling leak."""
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    out_deg = {}
    for s, _ in e:
        out_deg[s] = out_deg.get(s, 0) + 1
    teleport = ((100 - damping_pct) * base) // 100
    rank = {n: base for n in nodes}
    for _ in range(iterations):
        inbound = {n: 0 for n in nodes}
        for s, d in e:
            inbound[d] += rank[s] // out_deg[s]
        rank = {
            n: teleport + (damping_pct * inbound[n]) // 100 for n in nodes
        }
    return rank


def test_pagerank_matches_reference_spec(spark):
    from mgo_liveagent_data_pipeline_spark.operators.graph import pagerank

    # hub (a -> everyone), chain, a self-loop, a dangling sink (e), a
    # source nobody cites (a), and DUPLICATE edges that must collapse
    edges = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("a", "b"),  # dup a->b
        ("b", "c"), ("c", "d"), ("d", "b"),
        ("c", "c"),                                       # self-loop
        ("b", "e"),                                       # e dangles
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: (r["rank"], r["out_deg"], r["in_deg"])
        for r in pagerank(df, iterations=4, checkpoint_every=2).collect()
    }
    want = py_pagerank(edges, iterations=4)
    assert {n: v[0] for n, v in got.items()} == want
    # degrees are distinct-edge degrees
    assert got["a"] == (want["a"], 3, 0)   # dup a->b counted once
    assert got["e"][1:] == (0, 1)          # dangling: out 0, in 1
    assert got["c"][2] == 3                # b->c, a->c, c->c

    # total mass LEAKS through the dangling node (spec choice): after
    # any iteration total < n*base, and every rank >= teleport floor
    teleport = (15 * 10**12) // 100
    assert all(v[0] >= teleport for v in got.values())
    assert sum(v[0] for v in got.values()) < 5 * 10**12

    # fixed-iteration determinism across partitionings (float PR would
    # break this — integer math is partition-order-proof)
    got13 = {
        r["node"]: r["rank"]
        for r in pagerank(df.repartition(13), iterations=4).collect()
    }
    assert got13 == want


def test_pagerank_null_edges_and_validation(spark):
    import pytest

    from mgo_liveagent_data_pipeline_spark.operators.graph import pagerank

    df = spark.createDataFrame(
        [("a", "b"), (None, "b"), ("a", None)], ["src", "dst"]
    )
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=1).collect()}
    assert set(got) == {"a", "b"}  # null endpoints dropped, not nodes
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)
    with pytest.raises(ValueError):
        pagerank(df, damping_pct=101)
