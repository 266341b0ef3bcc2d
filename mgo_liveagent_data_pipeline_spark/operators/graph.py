"""Link-graph analytics over extracted-URL edge relations.

Web-corpus curation pipelines rank domains by link structure before
sampling (CommonCrawl publishes harmonic-centrality/PageRank-style
domain ranks exactly for this; RefinedWeb/CCNet-class pipelines consume
them as seed-quality priors). The engine already extracts the edge
relation (``operators/textops.py:extract_urls`` → registered domains);
this module adds the iterative rank over it.

Everything here is ENGINE-EXACT integer arithmetic: ranks are BIGINT
micro-masses (``base`` units per node), each damping step is an integer
multiply + integer (floor) division, so a DuckDB twin that unrolls the
same iterations reproduces the ranks bit-for-bit — the property every
driver oracle in this repo is built on. Floating-point PageRank would
be engine- and even partitioning-dependent (float sums reorder).

Reference tie-in: the reference has no graph operator (its corpus is
helpdesk tickets, `/root/reference/core/extract/Extractor.py`); this is
part of the training-data-pipeline extension surface, same as dedup/ANN.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import lineage_cut


def _string_components(
    strong: DataFrame,
    max_iterations: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Min-label pointer jumping on STRING nodes over an undirected
    (u, v) edge relation (the dedup CC operator is long-keyed; labels
    here are domains). Convergence detected by a changed-row count —
    one bounded action per round. Returns (node, lbl) for every edge
    endpoint; isolated nodes are the caller's singletons."""
    labels = (
        strong.select(F.col("u").alias("node"))
        .unionByName(strong.select(F.col("v").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
    )
    edges2 = strong.select(
        F.col("u").alias("x"), F.col("v").alias("y")
    ).unionByName(strong.select(F.col("v").alias("x"), F.col("u").alias("y")))
    for _ in range(max_iterations):
        nbr_min = (
            edges2.join(labels, edges2["y"] == labels["node"])
            .groupBy("x")
            .agg(F.min("lbl").alias("nl"))
            .select(F.col("x").alias("node"), "nl")
        )
        # label's label — the path-doubling shortcut
        lab2 = labels.select(
            F.col("node").alias("l_node"), F.col("lbl").alias("l_lbl")
        )
        new = (
            labels.join(nbr_min, "node", "left")
            .join(lab2, labels["lbl"] == F.col("l_node"), "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"),
                    F.coalesce("nl", F.col("lbl")),
                    F.coalesce("l_lbl", F.col("lbl")),
                ).alias("lbl"),
            )
        )
        new = lineage_cut(new, checkpoint_dir, eager=True)
        changed = (
            new.join(
                labels.withColumnRenamed("lbl", "old"), "node"
            )
            .where(F.col("lbl") != F.col("old"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"_string_components: no fixpoint in {max_iterations} rounds"
        )
    return labels


def _sym(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """Symmetrized distinct edge set, self-loops and NULLs dropped."""
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .where(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .distinct()
    )
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def cap_degree(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    max_degree: int,
    policy: str = "md5_sample",
    weight_col: str | None = None,
) -> DataFrame:
    """Deterministic hub degree capping — the operator that makes
    ``truss_communities``' "cap or sample hub neighborhoods first"
    instruction satisfiable INSIDE the engine (before round 10 the
    refusal named a preprocessing step the engine didn't ship).

    Each node RANKS its neighbors on the symmetrized distinct graph and
    keeps its ``max_degree`` best; an undirected edge survives iff BOTH
    endpoints keep it, which guarantees every node of the result has
    degree ≤ ``max_degree`` (each endpoint keeps at most that many, and
    removals only shrink degrees). Policies, both total orders so the
    result is engine-exact:

    * ``md5_sample`` — uniform deterministic sample: neighbors ranked
      by md5(src ‖ '|' ‖ dst) ascending (per-edge independent hashing,
      no weight needed);
    * ``top_by_weight`` — keep the strongest links: neighbors ranked by
      ``weight_col`` DESCENDING, ties broken by neighbor ascending; an
      edge seen with several weights (both directions / duplicates)
      counts its MAX, keeping the relation symmetric.

    Recall contract (pinned by test): a node at-or-under the cap loses
    an edge ONLY when its over-cap neighbor trimmed it — subgraphs with
    all degrees ≤ ``max_degree`` pass through untouched, so planted
    communities away from hubs are preserved exactly. Triangles through
    a trimmed hub edge are lost — that is the sampling trade the loud
    refusal in ``truss_communities`` exists to make explicit.

    At 100 TB: one hash shuffle on ``src`` for the per-node window rank
    + one semi-join of the kept set against its own reversal — no
    degree² term anywhere (that is the point).

    Returns the undirected capped edge set (u, v) with u < v — feed it
    straight to ``truss_communities`` / ``pagerank``.
    """
    from pyspark.sql import Window

    if policy not in ("md5_sample", "top_by_weight"):
        raise ValueError(f"unknown cap_degree policy {policy!r}")
    if policy == "top_by_weight":
        if weight_col is None:
            raise ValueError("top_by_weight needs weight_col")
        e = edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.col(weight_col).alias("w"),
        ).where(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        sym = (
            e.unionByName(
                e.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
                )
            )
            .groupBy("src", "dst")
            .agg(F.max("w").alias("w"))
        )
        order = [F.col("w").desc(), F.col("dst").asc()]
    else:
        sym = _sym(edges, src_col, dst_col)
        order = [F.md5(F.concat_ws("|", "src", "dst")).asc()]
    rk = F.row_number().over(Window.partitionBy("src").orderBy(*order))
    kept = (
        sym.withColumn("rk", rk)
        .where(F.col("rk") <= max_degree)
        .select("src", "dst")
    )
    both = kept.join(
        kept.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        ["src", "dst"],
        "left_semi",
    )
    return both.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )


def edge_support(sym: DataFrame) -> DataFrame:
    """Common-neighbor support for every undirected edge (u < v) of a
    SYMMETRIZED edge relation — the wedge join. This is the Σ deg² term
    of truss detection; at scale it is the thing worth maintaining
    INCREMENTALLY (``incremental_edge_support``) instead of recomputing.
    Returns (u, v, s) with s ≥ 0 for every edge."""
    a = sym.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    b = sym.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    wedges = a.join(b, "w").where(F.col("u") < F.col("v"))
    support = wedges.groupBy("u", "v").agg(F.count(F.lit(1)).alias("s"))
    und = sym.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    return und.join(support, ["u", "v"], "left").select(
        "u", "v", F.coalesce("s", F.lit(0)).cast("long").alias("s")
    )


def truss_communities(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    min_support: int = 1,
    max_degree: int = 10_000,
    max_iterations: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Triangle-supported (3-truss) community detection over the same
    edge relation ``pagerank`` ranks: link-farm rings and template
    mirror networks are TRIANGLE-dense, while the bridges connecting a
    community to the open web sit in no triangle — so communities =
    connected components of the edges with ≥ ``min_support`` common
    neighbors (Cohen's k-truss at k=3 for the default), and a bridge
    can never merge two communities no matter how central it is.

    Chosen over classic label propagation deliberately: deterministic
    synchronous LPA needs a tie-break, and ANY order-free tie-break
    (minimum label) floods the lexicographically smallest label across
    bridges in the early all-distinct-labels rounds — measured here to
    converge to plain connected components on triangle+bridge graphs,
    i.e. no community signal at all. Triangle support is order-free BY
    CONSTRUCTION, so it stays engine-exact without sacrificing the
    community structure (the DuckDB twin mirrors it with the recursive
    min-label walk every CC oracle in this repo uses — it works on
    string nodes directly).

    Spec: edges are the symmetrized distinct pair set, self-loops
    dropped; support(u,v) = |N(u) ∩ N(v)| on that undirected graph;
    strong edges (support ≥ min_support) are clustered by min-label
    pointer jumping; every node outside a strong edge is its own
    singleton community. Nodes whose degree exceeds ``max_degree``
    raise — support counting is Σ deg² work and a hub that big needs
    degree-capped sampling, which should be an explicit caller choice,
    not a silent one.

    Returns (node, community, community_size): community = the
    lexicographically smallest member, the same canonical-min
    convention every cluster id in this repo follows.
    """
    from .dedup import _scoped_persist, lineage_cut

    # scoped persist: registered for release_intermediates(), the same
    # lifecycle every multi-consumer cache in the dedup family has
    sym = _scoped_persist(_sym(edges, src_col, dst_col).repartition("src"))
    hub = (
        sym.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .where(F.col("deg") > max_degree)
        .limit(1)
        .collect()
    )
    if hub:
        raise ValueError(
            f"truss_communities: node {hub[0]['src']!r} has degree "
            f"{hub[0]['deg']} (max_degree={max_degree}) — cap or sample "
            "hub neighborhoods before support counting"
        )
    # support(u,v) for undirected pairs u<v that ARE edges: common
    # neighbors via the wedge join (u,w)⋈(v,w) — self-loops are absent,
    # so w ≠ u and w ≠ v automatically
    strong = (
        edge_support(sym)
        .where(F.col("s") >= min_support)
        .select("u", "v")
    )
    strong = lineage_cut(strong, checkpoint_dir, eager=True)

    labels = _string_components(strong, max_iterations, checkpoint_dir)

    nodes = sym.select(F.col("src").alias("node")).distinct()
    assigned = (
        nodes.join(labels, "node", "left")
        .select("node", F.coalesce("lbl", F.col("node")).alias("community"))
    )
    sizes = assigned.groupBy("community").agg(
        F.count(F.lit(1)).alias("community_size")
    )
    return assigned.join(sizes, "community").select(
        "node", "community", "community_size"
    )


def incremental_edge_support(
    corpus_support: DataFrame,
    corpus_edges: DataFrame,
    delta_edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Maintain the stored (u, v, s) support relation under an edge
    ingest WITHOUT re-running the corpus wedge join: support only ever
    GROWS (edges are never removed), and a triangle is NEW exactly when
    at least one of its three edges is a delta edge. For an OLD pair
    that means a wedge with a delta leg; a DELTA pair additionally
    collects its corpus-corpus wedges (the pair itself is the new
    third edge — the case a legs-only decomposition misses, caught by
    the unit test):

        gain(u,v) = |{w: (u,w)∈D, (v,w)∈E}| + |{w: (u,w)∈E, (v,w)∈D}|
                  + |{w: (u,w)∈D, (v,w)∈D}|
                  + [ (u,v)∈D ] · |{w: (u,w)∈E, (v,w)∈E}|

    (terms disjoint because D is deduplicated against E). The first
    three terms are DELTA-sized joins; the fourth is the corpus wedge
    join RESTRICTED to delta pairs before it forms — |D|·deg work, not
    Σ deg² — so the full corpus wedge join never re-runs. New support =
    stored + gain for old edges; gain alone for delta edges.

    A delta edge already present in the corpus (either direction) is
    dropped, mirroring the batch operator's distinct(); the returned
    relation is the complete updated (u, v, s) — the stored index for
    the next ingest.
    """
    esym = _sym(corpus_edges, src_col, dst_col)
    dsym = _sym(delta_edges, src_col, dst_col).join(
        esym, ["src", "dst"], "left_anti"
    )

    def term(left: DataFrame, right: DataFrame) -> DataFrame:
        a = left.select(F.col("src").alias("u"), F.col("dst").alias("w"))
        b = right.select(F.col("src").alias("v"), F.col("dst").alias("w"))
        return (
            a.join(b, "w")
            .where(F.col("u") < F.col("v"))
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("g"))
        )

    d_und = dsym.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    # term 4: corpus-corpus wedges of the DELTA pairs themselves —
    # restricted to d_und before the second corpus leg joins, so the
    # work is |D|·deg, never the full corpus wedge join
    ee = (
        d_und.join(
            esym.select(F.col("src").alias("u"), F.col("dst").alias("w")),
            "u",
        )
        .join(
            esym.select(F.col("src").alias("v"), F.col("dst").alias("w")),
            ["v", "w"],
        )
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("g"))
    )
    gains = (
        term(dsym, esym)
        .unionByName(term(esym, dsym))
        .unionByName(term(dsym, dsym))
        .unionByName(ee)
        .groupBy("u", "v")
        .agg(F.sum("g").alias("gain"))
    )
    all_edges = corpus_support.select("u", "v", "s").unionByName(
        d_und.select("u", "v", F.lit(0).cast("long").alias("s"))
    )
    return (
        all_edges.join(gains, ["u", "v"], "left")
        .select(
            "u",
            "v",
            (F.col("s") + F.coalesce("gain", F.lit(0))).cast("long").alias("s"),
        )
    )


def incremental_truss_communities(
    corpus_edges: DataFrame,
    delta_edges: DataFrame,
    *,
    corpus_support: DataFrame | None = None,
    corpus_assignment: DataFrame | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
    min_support: int = 1,
    max_degree: int = 10_000,
    max_iterations: int = 20,
    checkpoint_dir: str | None = None,
    emit: str = "all",
) -> DataFrame:
    """Delta-vs-corpus truss communities — the incremental member of
    the graph family: the stored support relation absorbs the delta via
    ``incremental_edge_support`` (delta-sized joins only; the corpus
    wedge join never re-runs), the strong set is re-derived from it
    (support ≥ min_support — monotone, so strong edges only appear,
    communities only MERGE), and clustering runs over the strong set —
    which is metadata-scale (strong edges ≪ edges ≪ corpus), so
    recomputing the CC tail is the cheap part by design.

    The subtle case this handles exactly: a delta edge can flip an OLD
    edge strong (the new edge closes a triangle over it) — gains land
    on every affected old pair, not just delta pairs — so arrivals like
    "the ring existed, the chords just landed" produce exactly the
    batch communities (the fixture the driver member runs).

    Result equals ``truss_communities(corpus ∪ delta)`` verbatim — the
    oracle. Returns (node, community, community_size) for every node
    of corpus ∪ delta.

    With ``corpus_assignment`` (the STORED output of a previous
    ``truss_communities`` / this function — it must cover every corpus
    node), the CC is pruned to TOUCHED communities, the same
    star-edge argument the ER family uses: support is monotone (strong
    edges only APPEAR), so only components adjacent to a NEWLY-strong
    edge can change; the newly-strong set is delta-neighborhood-sized,
    the stored assignment's star edges carry exactly the old strong
    connectivity of the touched components, and every other stored row
    rides through verbatim — labels included (community ids are
    component minima; a merge re-labels to the smaller minimum exactly
    as the batch run would). ``emit='changed'`` returns only the
    recomputed rows (the production MERGE shape — upserting them over
    the stored assignment IS the full answer; cost tracks the delta's
    neighborhood, no full-assignment carry scan); ``emit='all'``
    unions the untouched stored rows back. ``emit='changed'``
    requires ``corpus_assignment``.

    Hub refusal mirrors the batch contract but restricted to DELTA
    endpoints: the |D|·deg fourth wedge term blows up exactly when a
    delta edge lands ON a hub, so nodes the delta touches are degree-
    checked over corpus ∪ delta (``max_degree``, same error, same
    ``cap_degree`` escape hatch) while untouched corpus nodes — guarded
    when they were built — cost nothing per ingest.
    """
    dnodes = (
        delta_edges.select(F.col(src_col).alias("node"))
        .unionByName(delta_edges.select(F.col(dst_col).alias("node")))
        .where(F.col("node").isNotNull())
        .distinct()
    )
    allsym = _sym(corpus_edges, src_col, dst_col).unionByName(
        _sym(delta_edges, src_col, dst_col)
    ).distinct()
    hub = (
        allsym.join(
            F.broadcast(dnodes), allsym["src"] == dnodes["node"], "left_semi"
        )
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .where(F.col("deg") > max_degree)
        .limit(1)
        .collect()
    )
    if hub:
        raise ValueError(
            f"incremental_truss_communities: node {hub[0]['src']!r} has "
            f"degree {hub[0]['deg']} (max_degree={max_degree}) — cap or "
            "sample hub neighborhoods before support counting"
        )
    if emit not in ("all", "changed"):
        raise ValueError(f"emit must be 'all' or 'changed', got {emit!r}")
    if emit == "changed" and corpus_assignment is None:
        raise ValueError(
            "emit='changed' needs corpus_assignment (the stored table)"
        )
    sup = (
        corpus_support
        if corpus_support is not None
        else edge_support(_sym(corpus_edges, src_col, dst_col))
    )
    new_sup = incremental_edge_support(
        sup, corpus_edges, delta_edges, src_col, dst_col
    )
    if corpus_assignment is None:
        # full path: CC over the whole strong set, assignment for every
        # node of corpus ∪ delta
        strong = new_sup.where(F.col("s") >= min_support).select("u", "v")
        strong = lineage_cut(strong, checkpoint_dir, eager=True)
        labels = _string_components(strong, max_iterations, checkpoint_dir)
        nodes = (
            new_sup.select(F.col("u").alias("node"))
            .unionByName(new_sup.select(F.col("v").alias("node")))
            .distinct()
        )
        assigned = nodes.join(labels, "node", "left").select(
            "node", F.coalesce("lbl", F.col("node")).alias("community")
        )
        sizes = assigned.groupBy("community").agg(
            F.count(F.lit(1)).alias("community_size")
        )
        return assigned.join(sizes, "community").select(
            "node", "community", "community_size"
        )
    # touched-community prune: only components adjacent to a NEWLY
    # strong edge can change (support is monotone); everything else
    # rides through from the stored assignment verbatim
    old_strong = sup.where(F.col("s") >= min_support).select("u", "v")
    newly = (
        new_sup.where(F.col("s") >= min_support)
        .select("u", "v")
        .join(old_strong, ["u", "v"], "left_anti")
    )
    newly = lineage_cut(newly, checkpoint_dir, eager=True)
    endpoints = (
        newly.select(F.col("u").alias("__n"))
        .unionByName(newly.select(F.col("v").alias("__n")))
        .distinct()
    )
    touched = (
        corpus_assignment.join(
            F.broadcast(endpoints),
            corpus_assignment["node"] == F.col("__n"),
        )
        .select("community")
        .distinct()
    )
    touched_rows = corpus_assignment.join(
        F.broadcast(touched), "community", "left_semi"
    )
    star = touched_rows.where(F.col("node") != F.col("community")).select(
        F.col("node").alias("u"), F.col("community").alias("v")
    )
    labels = _string_components(
        newly.unionByName(star), max_iterations, checkpoint_dir
    )
    # rows that may change: NEW nodes the delta introduces ∪ members of
    # touched components; corpus nodes a merely-WEAK delta edge lands on
    # keep their stored row (weak edges never move communities)
    new_nodes = dnodes.join(
        corpus_assignment.select("node"), "node", "left_anti"
    )
    need = new_nodes.unionByName(
        touched_rows.select("node")
    ).distinct()
    assigned = need.join(F.broadcast(labels), "node", "left").select(
        "node", F.coalesce("lbl", F.col("node")).alias("community")
    )
    sizes = assigned.groupBy("community").agg(
        F.count(F.lit(1)).alias("community_size")
    )
    changed = assigned.join(F.broadcast(sizes), "community").select(
        "node", "community", "community_size"
    )
    if emit == "changed":
        return changed
    untouched = corpus_assignment.join(
        F.broadcast(touched), "community", "left_anti"
    ).select("node", "community", "community_size")
    return changed.unionByName(untouched)


# observability for the early-stop path: how many rounds the last
# pagerank() call actually ran (== the requested unroll unless
# early_stop detected a fixed point). Read by smokes/tests; never part
# of the relational result.
PAGERANK_LAST: dict[str, int | None] = {"iterations_run": None}


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    iterations: int = 5,
    damping_pct: int = 85,
    base: int = 10**12,
    dangling: str = "leak",
    early_stop: bool = False,
    checkpoint_every: int = 3,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a (src, dst) edge relation.

    Spec (chosen for exact cross-engine reproducibility, documented so
    the DuckDB twin and any reimplementation agree to the last unit):

    * edges are DISTINCT (src, dst) pairs — duplicate citations of the
      same domain by the same source count once;
    * nodes = every src ∪ dst; each starts with ``base`` units of rank;
    * one iteration:
        contrib(u→v) = rank(u) DIV out_deg(u)            (floor div)
        rank'(v) = (100-d)·base DIV 100
                 + (d · Σ_{u→v} contrib(u→v)) DIV 100
      with d = ``damping_pct``. ``dangling`` picks what happens to the
      mass of nodes with no out-edges, stated here because
      implementations differ:
        * ``'leak'`` (default) — dangling mass disappears; fine for
          link-farm detection over extracted URLs, where only the
          ordering matters;
        * ``'redistribute'`` — each iteration sums the dangling mass
          and floor-divides it equally across ALL nodes BEFORE damping:
          rank'(v) = teleport + d·(Σ contrib(·→v) + dang DIV N) DIV 100.
          Total mass is then conserved up to bounded floor remainders
          (< N units per division site per iteration — at
          base = 10¹² that is parts-per-billion; the conservation test
          pins the bound), which is the variant to use before anyone
          reads ranks as probabilities. Computed as a 1-row aggregate
          cross-joined back — no per-iteration driver action;
    * ``iterations`` is FIXED, not convergence-tested: a fixed unroll
      is what makes the computation a deterministic relational
      expression both engines can evaluate identically.
      ``early_stop=True`` (opt-in; the fixed unroll stays the default
      for twin reproducibility) adds a DETERMINISTIC early exit that
      cannot change the answer: each iteration is a pure function of
      the integer rank vector, so if one round leaves every rank
      exactly unchanged the vector is a fixed point and every remaining
      round of the unroll would reproduce it bit-for-bit — stopping
      there returns exactly what ``iterations`` rounds would. The check
      is one bounded changed-row probe per round (join on node, filter
      rank ≠ previous, limit 1 — never a data collect), and each round
      is lineage-cut eagerly (the probe materializes it anyway), which
      replaces the ``checkpoint_every`` cadence. Worth it on
      fast-converging graphs (DAG-like link graphs quench in
      longest-path+2 rounds); on cyclic graphs with ``base = 10¹²``
      integer convergence takes ~log₁₀₀⁄₈₅(base) ≈ 170 rounds, so a
      small unroll cap never triggers it. ``PAGERANK_LAST[
      'iterations_run']`` records how many rounds actually ran —
      observability for smokes/tests, not part of the result.

    Scale shape (the part that matters at 100 TB): the edge relation is
    |domains|-keyed, orders of magnitude smaller than the corpus that
    produced it, and is hash-partitioned on ``src`` ONCE before the
    loop — each iteration is then one join on that partitioning plus
    one groupBy(dst) shuffle of (dst, contrib) longs. Rank state is one
    row per node. Lineage grows linearly with iterations, so every
    ``checkpoint_every`` rounds the rank relation is cut with
    ``lineage_cut`` (localCheckpoint locally; pass ``checkpoint_dir``
    for reliable checkpoints on a real cluster — executor loss must not
    recompute the whole unrolled chain).

    Returns (node, rank, out_deg, in_deg): rank BIGINT after the final
    iteration; out_deg/in_deg the distinct-edge degrees (0 when none).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")
    if dangling not in ("leak", "redistribute"):
        raise ValueError(f"dangling must be 'leak' or 'redistribute', got {dangling!r}")
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    from .dedup import _scoped_persist

    # one partitioning, reused by every iteration's build side
    e = _scoped_persist(e.repartition("src"))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    in_deg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("in_deg"))
    nodes = _scoped_persist(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # contribution denominator rides WITH the edge so the loop join is
    # edges⋈ranks only (degree join paid once, not per iteration)
    ed = e.join(out_deg, "src")

    teleport = ((100 - damping_pct) * base) // 100
    nn = nodes.agg(F.count(F.lit(1)).alias("nn"))
    ranks = nodes.select("node", F.lit(base).cast("long").alias("rank"))
    PAGERANK_LAST["iterations_run"] = iterations
    for i in range(iterations):
        prev = ranks
        inbound = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div out_deg").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("m"))
        )
        if dangling == "redistribute":
            # 1-row (dangling mass, node count) relation broadcast onto
            # every node's update — the share is integer floor division,
            # no driver action, no float
            share = (
                ranks.join(out_deg, ranks["node"] == out_deg["src"], "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("dm"))
                .crossJoin(nn)
                .select(F.expr("dm div nn").alias("sh"))
            )
            ranks = (
                nodes.join(inbound, "node", "left")
                .crossJoin(F.broadcast(share))
                .select(
                    "node",
                    (
                        F.lit(teleport)
                        + F.expr(
                            f"({damping_pct} * (coalesce(m, 0) + sh)) div 100"
                        )
                    ).cast("long").alias("rank"),
                )
            )
        else:
            ranks = nodes.join(inbound, "node", "left").select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_pct} * coalesce(m, 0)) div 100"
                    )
                ).cast("long").alias("rank"),
            )
        if early_stop:
            # eager cut first (the probe materializes the round anyway,
            # and it doubles as the per-round lineage cut), then ONE
            # bounded changed-row probe: an exactly-unchanged vector is
            # a fixed point — every remaining unroll round would emit
            # the same bits, so stopping here is a pure optimization
            ranks = lineage_cut(ranks, checkpoint_dir, eager=True)
            changed = (
                ranks.join(
                    prev.select(
                        "node", F.col("rank").alias("__prev")
                    ),
                    "node",
                )
                .where(F.col("rank") != F.col("__prev"))
                .limit(1)
                .collect()
            )
            if not changed:
                PAGERANK_LAST["iterations_run"] = i + 1
                break
        elif (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = lineage_cut(ranks, checkpoint_dir, eager=True)

    out = (
        ranks.join(out_deg, ranks["node"] == out_deg["src"], "left")
        .drop("src")
        .join(in_deg, ranks["node"] == in_deg["dst"], "left")
        .drop("dst")
        .select(
            "node",
            "rank",
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
        )
    )
    return out
