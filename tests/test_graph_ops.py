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


def test_truss_communities_semantics(spark):
    """The truss spec on a hand-checkable graph: two triangles joined
    by a bridge stay separate communities (the bridge sits in no
    triangle), self-loops and duplicate/reversed edges are ignored,
    nodes outside any triangle are singletons, community = the
    lexicographically smallest member, and hub degrees are refused."""
    import pytest

    from mgo_liveagent_data_pipeline_spark.operators.graph import (
        truss_communities,
    )

    edges = spark.createDataFrame(
        [
            # triangle A: a1-a2-a3
            ("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
            # triangle B: b1-b2-b3 (+ a duplicate and a reversed dup)
            ("b1", "b2"), ("b2", "b3"), ("b3", "b1"), ("b1", "b2"),
            ("b2", "b1"),
            # the bridge + a self-loop (dropped)
            ("a1", "b1"), ("a1", "a1"),
            # a triangle-free pair: both singletons
            ("z9", "z2"),
        ],
        ["src", "dst"],
    )
    out = {
        r["node"]: (r["community"], r["community_size"])
        for r in truss_communities(edges).collect()
    }
    assert out["a1"] == out["a2"] == out["a3"] == ("a1", 3)
    assert out["b1"] == out["b2"] == out["b3"] == ("b1", 3)
    # the bridge never merges the triangles
    assert out["a1"][0] != out["b1"][0]
    # triangle-free nodes are their own singleton communities
    assert out["z2"] == ("z2", 1) and out["z9"] == ("z9", 1)

    with pytest.raises(ValueError):
        truss_communities(edges, max_degree=2).collect()


def test_incremental_truss_matches_batch_and_gains(spark):
    """incremental_edge_support's gain algebra (D-E, E-D, D-D wedges)
    and the old-edge-flip case: the triangle's third edge arrives last
    and flips the two standing edges strong; incremental == batch."""
    from mgo_liveagent_data_pipeline_spark.operators.graph import (
        edge_support,
        incremental_edge_support,
        incremental_truss_communities,
        truss_communities,
        _sym,
    )

    corpus = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["src", "dst"]
    )
    delta = spark.createDataFrame(
        # closes the a-b-c triangle; adds a fresh pair; duplicates an
        # existing corpus edge (must be dropped, not double-counted)
        [("c", "a"), ("p", "q"), ("b", "a")],
        ["src", "dst"],
    )
    sup = {
        (r["u"], r["v"]): r["s"]
        for r in incremental_edge_support(
            edge_support(_sym(corpus, "src", "dst")), corpus, delta
        ).collect()
    }
    # every triangle edge now has support 1; non-triangle edges 0
    assert sup[("a", "b")] == 1 and sup[("b", "c")] == 1
    assert sup[("a", "c")] == 1  # the delta edge's own D-E x D-E wedge
    assert sup[("x", "y")] == 0 and sup[("p", "q")] == 0
    assert len(sup) == 5  # the duplicate delta edge was dropped

    inc = {
        r["node"]: (r["community"], r["community_size"])
        for r in incremental_truss_communities(corpus, delta).collect()
    }
    full = {
        r["node"]: (r["community"], r["community_size"])
        for r in truss_communities(
            corpus.unionByName(delta)
        ).collect()
    }
    assert inc == full
    # the triangle emerged from the delta; the pairs stay singletons
    assert inc["a"] == inc["b"] == inc["c"] == ("a", 3)
    assert inc["x"] == ("x", 1) and inc["q"] == ("q", 1)


def py_pagerank_rd(edges, iterations=5, damping_pct=85, base=10**12):
    """Pure-Python reference of the dangling='redistribute' spec:
    per-iteration dangling mass floor-divided equally across ALL nodes
    before damping."""
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    n = len(nodes)
    out_deg = {}
    for s, _ in e:
        out_deg[s] = out_deg.get(s, 0) + 1
    teleport = ((100 - damping_pct) * base) // 100
    rank = {x: base for x in nodes}
    for _ in range(iterations):
        inbound = {x: 0 for x in nodes}
        for s, d in e:
            inbound[d] += rank[s] // out_deg[s]
        sh = sum(rank[x] for x in nodes if x not in out_deg) // n
        rank = {
            x: teleport + (damping_pct * (inbound[x] + sh)) // 100
            for x in nodes
        }
    return rank


def test_pagerank_redistribute_conserves_mass(spark):
    """dangling='redistribute' matches the pure-Python spec bit-for-bit
    and conserves total mass up to bounded floor remainders, while the
    'leak' default visibly loses the dangling mass."""
    import pytest

    from mgo_liveagent_data_pipeline_spark.operators.graph import pagerank

    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"),
        ("b", "e"),  # e dangles
        ("d", "a"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            df, iterations=4, dangling="redistribute", checkpoint_every=2
        ).collect()
    }
    want = py_pagerank_rd(edges, iterations=4)
    assert got == want
    # conservation: total mass stays within bounded floor remainders of
    # n*base (each contrib/share/damping floor loses < 1 unit per site
    # per iteration — parts-per-billion at base=1e12)
    n, base, iters = 5, 10**12, 4
    total = sum(got.values())
    assert n * base - total < iters * (len(edges) + 3 * n) * 100
    assert total <= n * base
    # the leak default really leaks: the dangling node's whole damped
    # mass disappears each round — orders of magnitude more than floors
    leak_total = sum(
        r["rank"] for r in pagerank(df, iterations=4).collect()
    )
    assert n * base - leak_total > 10**11
    with pytest.raises(ValueError):
        pagerank(df, dangling="drop")


def test_cap_degree_policies_and_recall(spark):
    """cap_degree: degree bound guaranteed, under-cap subgraphs pass
    through untouched (the recall contract), md5 policy deterministic,
    top_by_weight keeps the strongest links — and it unblocks
    truss_communities over a hub graph that the loud refusal rejects."""
    import pytest

    from mgo_liveagent_data_pipeline_spark.operators.graph import (
        cap_degree,
        truss_communities,
    )

    # hub h fans out to 8 spokes; a triangle community lives elsewhere
    hub = [("h", f"s{i}") for i in range(8)]
    tri = [("a1", "a2"), ("a2", "a3"), ("a3", "a1")]
    df = spark.createDataFrame(hub + tri, ["src", "dst"])

    with pytest.raises(ValueError, match="cap or sample"):
        truss_communities(df, max_degree=4).collect()

    capped = cap_degree(df, max_degree=4)
    rows = {(r["u"], r["v"]) for r in capped.collect()}
    # degree bound on the capped graph
    deg = {}
    for u, v in rows:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    assert max(deg.values()) <= 4 and deg["h"] == 4
    # recall contract: the under-cap triangle is untouched
    assert {("a1", "a2"), ("a2", "a3"), ("a1", "a3")} <= rows
    # every removed edge touches the over-cap hub
    removed = {("h", f"s{i}") for i in range(8)} - rows
    assert len(removed) == 4 and all(u == "h" for u, _ in removed)
    # deterministic: same result across partitionings
    rows13 = {
        (r["u"], r["v"])
        for r in cap_degree(df.repartition(13), max_degree=4).collect()
    }
    assert rows13 == rows
    # and truss now runs over the capped graph: triangle preserved
    out = {
        r["node"]: r["community"]
        for r in truss_communities(
            capped, src_col="u", dst_col="v", max_degree=4
        ).collect()
    }
    assert out["a1"] == out["a2"] == out["a3"] == "a1"
    assert out["h"] == "h"  # hub edges sit in no triangle

    # top_by_weight: keep the heaviest spokes; max-weight symmetrization
    wdf = spark.createDataFrame(
        [("h", f"s{i}", float(i)) for i in range(8)]
        + [("s7", "h", 99.0)],  # reverse duplicate with a bigger weight
        ["src", "dst", "w"],
    )
    kept = {
        (r["u"], r["v"])
        for r in cap_degree(
            wdf, max_degree=3, policy="top_by_weight", weight_col="w"
        ).collect()
    }
    assert kept == {("h", "s7"), ("h", "s6"), ("h", "s5")}
    with pytest.raises(ValueError):
        cap_degree(wdf, max_degree=3, policy="top_by_weight")
    with pytest.raises(ValueError):
        cap_degree(wdf, max_degree=3, policy="random")


def test_incremental_truss_hub_guard_is_delta_scoped(spark):
    """The incremental path refuses a delta landing ON a hub (mirroring
    the batch contract) but does NOT pay for — or refuse on — corpus
    hubs the delta never touches (they were guarded when built)."""
    import pytest

    from mgo_liveagent_data_pipeline_spark.operators.graph import (
        incremental_truss_communities,
    )

    hub = spark.createDataFrame(
        [("h", f"s{i}") for i in range(8)], ["src", "dst"]
    )
    # delta touching the hub: refused at the batch threshold
    onto_hub = spark.createDataFrame([("h", "z1")], ["src", "dst"])
    with pytest.raises(ValueError, match="cap or sample"):
        incremental_truss_communities(
            hub, onto_hub, max_degree=4
        ).collect()
    # delta elsewhere: the untouched corpus hub does not refuse
    away = spark.createDataFrame([("p", "q")], ["src", "dst"])
    out = incremental_truss_communities(hub, away, max_degree=4)
    assert out.count() > 0


def test_incremental_truss_pruned_and_merge_shape(spark):
    """corpus_assignment prunes the CC to touched communities and
    emit='changed' returns only the recomputed rows — MERGEd over the
    stored assignment they equal the batch truss exactly, including a
    community MERGE caused by a delta edge and untouched communities
    carried verbatim (weak delta edges on them included)."""
    from mgo_liveagent_data_pipeline_spark.operators.graph import (
        _sym,
        edge_support,
        incremental_truss_communities,
        truss_communities,
    )

    corpus = spark.createDataFrame(
        [
            # two triangles (strong) + a bare pair (weak singletons)
            ("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
            ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),
            ("x", "y"),
        ],
        ["src", "dst"],
    )
    delta = spark.createDataFrame(
        [
            # closes triangles over the bridge a1-b1: merges A and B
            ("a1", "b1"), ("a2", "b1"), ("a1", "b2"),
            # a WEAK edge landing on the untouched pair + a new node
            ("x", "z9"),
        ],
        ["src", "dst"],
    )
    stored = truss_communities(corpus).localCheckpoint(eager=True)
    sup = edge_support(_sym(corpus, "src", "dst")).localCheckpoint(
        eager=True
    )
    full = {
        r["node"]: (r["community"], r["community_size"])
        for r in truss_communities(corpus.unionByName(delta)).collect()
    }
    # pruned emit='all' == batch
    pruned_all = {
        r["node"]: (r["community"], r["community_size"])
        for r in incremental_truss_communities(
            corpus, delta, corpus_support=sup, corpus_assignment=stored
        ).collect()
    }
    assert pruned_all == full
    # emit='changed' MERGEd over stored == batch; untouched rows absent
    changed = incremental_truss_communities(
        corpus, delta, corpus_support=sup, corpus_assignment=stored,
        emit="changed",
    ).collect()
    ch = {r["node"]: (r["community"], r["community_size"]) for r in changed}
    merged = {
        r["node"]: (r["community"], r["community_size"])
        for r in stored.collect()
        if r["node"] not in ch
    }
    merged.update(ch)
    assert merged == full
    # the A∪B merge happened and is labelled by the global minimum
    assert full["b2"] == ("a1", 6) and ch["b2"] == ("a1", 6)
    # x/y untouched (weak delta edge): NOT in the changed set
    assert "x" not in ch and "y" not in ch
    # the weak-edge new node z9 IS emitted (a new singleton)
    assert ch["z9"] == ("z9", 1)

    import pytest

    with pytest.raises(ValueError, match="corpus_assignment"):
        incremental_truss_communities(
            corpus, delta, corpus_support=sup, emit="changed"
        )


def test_pagerank_early_stop_exact_and_observable(spark):
    """early_stop is a pure optimization: on a DAG the integer vector
    reaches its exact fixed point in depth+2 rounds, the stop triggers
    there, and the result is bit-identical to the full fixed unroll;
    on a cyclic graph a small cap never triggers it."""
    from mgo_liveagent_data_pipeline_spark.operators.graph import (
        PAGERANK_LAST,
        pagerank,
    )

    # bipartite: 3 sources -> 4 sinks, no cycles
    edges = [
        ("s1", "t1"), ("s1", "t2"), ("s2", "t2"), ("s2", "t3"),
        ("s3", "t3"), ("s3", "t4"), ("s1", "t4"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    full = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=15).collect()
    }
    assert PAGERANK_LAST["iterations_run"] == 15
    es = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=15, early_stop=True).collect()
    }
    # sources quench after round 1, sinks after round 2; round 3
    # reproduces round 2 -> detected and stopped at 3
    assert PAGERANK_LAST["iterations_run"] == 3
    assert es == full

    # asymmetric cyclic graph (a symmetric ring IS the uniform fixed
    # point and legitimately stops at round 1): integer convergence
    # from base=10**12 takes ~170 rounds, so a 5-round cap runs all 5
    ring = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")], ["src", "dst"]
    )
    r_full = {
        r["node"]: r["rank"] for r in pagerank(ring, iterations=5).collect()
    }
    r_es = {
        r["node"]: r["rank"]
        for r in pagerank(ring, iterations=5, early_stop=True).collect()
    }
    assert PAGERANK_LAST["iterations_run"] == 5
    assert r_es == r_full
