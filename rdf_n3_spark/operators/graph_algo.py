"""Iterative graph algorithms over the materialized entity graph.

:func:`pagerank_quantized` — fixed-iteration PageRank in EXACT integer
arithmetic (ranks are bigint "ppb" units, contributions use integer
division) so the fixpoint is bit-identical on any engine, partitioning,
or cluster size: float PageRank sums are order-nondeterministic, which
would break both the DuckDB oracle and cross-run reproducibility at
100 TB.  Dangling-node mass leaks (no redistribution) — deterministic
and documented; ranking order is what downstream curation consumes.

Scale shape per iteration: the rank table is NODE-sized (≪ edges);
edges ⋈ ranks is a src-keyed equi-join (AQE broadcasts when ranks fit,
else a co-partitioned shuffle the next iteration reuses), and the
dst-keyed contribution sum is map-side combinable, so hub in-degree
skew collapses to one partial per partition.  Lineage is cut with a
per-iteration ``localCheckpoint`` like the reasoner's semi-naive
fixpoint (plans/bgp.py) — without it the plan doubles per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000  # rank unit: parts-per-billion of the init mass


def cooccurrence_edges(df: DataFrame, group: str, node: str) -> DataFrame:
    """(u, v, weight) — undirected co-occurrence edges: u < v appear in
    ``weight`` common groups.  The KG co-mention graph constructor
    (entities sharing a conversation, terms sharing a document, …).

    Per-group self-join emits Σ_g (k_g choose 2) pairs — linear in the
    true output, NOT |df|²; group sizes (distinct nodes per group) are
    naturally small even when a NODE is globally hot, so the join key
    (the group) is skew-benign, and the pair count agg is map-side
    combinable."""
    m = df.select(F.col(group).alias("g"), F.col(node).alias("n")).distinct()
    a, b = m.alias("a"), m.alias("b")
    return (
        a.join(b, "g")
        .where(F.col("a.n") < F.col("b.n"))
        .groupBy(F.col("a.n").alias("u"), F.col("b.n").alias("v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("weight"))
    )


def triangle_counts(edges: DataFrame,
                    max_degree: int | None = None) -> DataFrame:
    """(node, n_triangles) — triangles each node participates in, over
    an undirected edge set given as canonical (u, v) with u < v.

    Degree-ordered orientation (the standard distributed-triangle
    trick): direct every edge from the (degree, id)-smaller endpoint
    to the larger, enumerate wedges src→mid→far, and close them
    against the oriented edge (src, far).  The orientation is acyclic
    and total, so each triangle is enumerated EXACTLY once, and the
    oriented out-degree is O(√m) even for celebrity nodes.
    Both joins are equi-joins on node keys (AQE skew-split eligible).

    ``max_degree`` — the celebrity cap.  O(√m) bounds the WEDGE count
    at O(m^1.5), but on a dense co-mention graph (a hub entity sharing
    conversations with everything, popular entities forming a
    quasi-clique) the triangle OUTPUT itself is the quadratic term: no
    exact algorithm beats enumerating it (measured: the sf0.1 hub
    graph — 21k nodes / 3.7M edges / ~1000-node dense core — costs
    ~190 s where the capped run costs seconds).  With a cap, nodes of
    degree > ``max_degree`` are excluded BEFORE orientation and the
    result is the exact per-node triangle count of the remaining
    subgraph — the curation-relevant answer, since a celebrity node's
    triangle membership measures its hubness, not local community
    density, and downstream density scoring treats capped nodes as
    flagged outliers.  None (default) = exact over the full graph."""
    e = edges.select("u", "v").distinct()
    deg = (
        e.select(F.col("u").alias("n")).unionAll(e.select("v"))
        .groupBy("n").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    if max_degree is not None:
        keep = deg.where(F.col("d") <= max_degree).select("n")
        e = (
            e.join(keep.withColumnRenamed("n", "u"), "u", "semi")
            .join(keep.withColumnRenamed("n", "v"), "v", "semi")
            .select("u", "v")
        )
        # degrees of the REMAINING subgraph (orientation stays optimal
        # for the edges actually enumerated)
        deg = (
            e.select(F.col("u").alias("n")).unionAll(e.select("v"))
            .groupBy("n").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        )
    du, dv = deg.alias("du"), deg.alias("dv")
    # orient by (degree, id): lower endpoint → higher endpoint
    oriented = (
        e.join(du, F.col("u") == F.col("du.n"))
        .join(dv, F.col("v") == F.col("dv.n"))
        .select(
            F.when(
                (F.col("du.d") < F.col("dv.d"))
                | ((F.col("du.d") == F.col("dv.d")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            ).otherwise(
                F.struct(F.col("v").alias("s"), F.col("u").alias("t"))
            ).alias("e")
        )
        .select(F.col("e.s").alias("s"), F.col("e.t").alias("t"))
        .localCheckpoint()
    )
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.t") == F.col("e2.s"))
        .join(e3, (F.col("e3.s") == F.col("e1.s")) & (F.col("e3.t") == F.col("e2.t")))
        .select(
            F.col("e1.s").alias("a"), F.col("e1.t").alias("b"),
            F.col("e2.t").alias("c"),
        )
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )


def pagerank_quantized(edges: DataFrame, iterations: int = 3,
                       scale: int = SCALE) -> DataFrame:
    """(node_id, rank_ppb) after ``iterations`` damped rounds over the
    DISTINCT (src, dst) edge set.

    Update rule (mirrored exactly by the unrolled-CTE oracle):
        contrib(n) = Σ_{src→n} rank(src) div out_deg(src)
        rank'(n)   = 0.15·scale + (85·contrib(n)) div 100
    with every op on bigints — `div` is floor division, values are
    non-negative, and bigint sums are associative, so the result is
    independent of evaluation order.

    AQE: the operator PINS ``spark.sql.adaptive.enabled=false`` for
    its own internal actions (the eager checkpoints) and restores the
    caller's setting on exit.  The single-exchange setup below depends
    on the checkpoint carrying its hash partitioning, which an
    AdaptiveSparkPlan checkpoint loses (UnknownPartitioning →
    ENSURE_REQUIREMENTS re-exchanges the EDGE-sized table every
    iteration).  AQE has nothing to offer inside this loop anyway —
    partition counts are pre-sized, the joins are key-co-partitioned
    by construction, and hub skew lands on the map-side-combinable agg
    — so an AQE-on session (the batch-job default) now gets the same
    pinned plan; tests/test_graph_algo.py::test_pagerank_aqe_session
    certifies result equality + conf restoration under AQE-on."""
    spark = edges.sparkSession
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _pagerank_pinned(edges, iterations, scale)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def _pagerank_pinned(edges: DataFrame, iterations: int,
                     scale: int) -> DataFrame:
    # checkpoint the loop-invariant tables ONCE — each iteration's
    # eager checkpoint is an action, and without that the edge
    # distinct (and whatever upstream pipeline feeds it) would be
    # recomputed per iteration.  ONE edge-sized exchange funds the
    # whole setup: hash-partitioning on src SATISFIES the clustered-
    # distribution requirement of the (src, dst) distinct, the
    # out-degree groupBy(src), AND the src join — Catalyst inserts no
    # further Exchange for any of them (pinned by
    # tests/test_graph_algo.py::test_pagerank_setup_single_edge_exchange);
    # the former shape paid four edge-sized exchanges for the same
    # tables.  Scope: the reuse requires the checkpoint to carry its
    # partitioning, which holds with AQE disabled (the bench / batch-job
    # config — bench.py documents why) but NOT under AQE, where the
    # checkpointed AdaptiveSparkPlan reports UnknownPartitioning and
    # ENSURE_REQUIREMENTS re-exchanges (correct, just one extra shuffle).
    # The src-hash skew of a hub node is no worse than the old explicit
    # repartition("src") carried anyway.
    e = edges.select("src", "dst").repartition("src").distinct().localCheckpoint()
    outd = e.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    # fold the out-degree into the edge table once (loop-invariant);
    # partitioning rides the checkpoint, so each iteration exchanges
    # only the NODE-sized rank/contribution tables
    e2 = e.join(outd, "src").localCheckpoint()
    # src-side distinct reuses the src partitioning (exchange-free);
    # only the dst projection pays an edge-sized exchange, and the
    # final union dedup is node-sized — vs the former union-then-
    # distinct, which exchanged 2×|edges|
    nodes = (
        e.select(F.col("src").alias("node")).distinct()
        .union(e.select(F.col("dst").alias("node")).distinct())
        .distinct()
        .localCheckpoint()
    )
    ranks = nodes.select("node", F.lit(scale).cast("bigint").alias("rank"))
    base = 15 * scale // 100
    for _ in range(iterations):
        contrib = (
            e2.join(ranks, e2["src"] == ranks["node"])
            .select("dst", F.expr("rank div d").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (F.lit(base)
                 + F.expr("(85 * coalesce(contrib, 0)) div 100"))
                .cast("bigint").alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select(F.col("node").alias("node_id"),
                        F.col("rank").alias("rank_ppb"))


def kcore_fixed(edges: DataFrame, k: int = 3, rounds: int = 3) -> DataFrame:
    """(node, in_core) — fixed-round k-core peeling over an undirected
    (u, v) edge set: each round removes every node of current degree
    < ``k`` (and its edges); survivors after ``rounds`` rounds are
    flagged ``in_core`` = 1.  Fixed iteration count keeps the result
    deterministic and oracle-replayable (the true k-core is the
    fixpoint; ``rounds`` bounds how deep a peel cascade propagates per
    call — rerun or raise it for full convergence, exactly like the
    reasoner's bounded fixpoint modes).

    Scale shape per round: degree = one map-side-combinable groupBy
    over the symmetric edge list; the peel is an equi-semi-join of
    edges against the (node-sized, aggregated) survivor table; per-
    round ``localCheckpoint`` cuts lineage like every other iterative
    operator here.  Output covers EVERY input node (peeled nodes with
    in_core = 0)."""
    sym = (
        edges.select("u", "v")
        .union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    all_nodes = sym.select(F.col("u").alias("node")).distinct().localCheckpoint()
    cur = sym
    for _ in range(rounds):
        deg = cur.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.where(F.col("d") >= k).select(F.col("u").alias("node"))
        cur = (
            cur.join(keep.withColumnRenamed("node", "u"), "u")
            .join(keep.select(F.col("node").alias("v")), "v")
            .select("u", "v")
            .localCheckpoint()
        )
    survivors = cur.select(F.col("u").alias("node")).distinct()
    return (
        all_nodes.join(survivors.withColumn("s", F.lit(1)), "node", "left")
        .select("node", F.coalesce("s", F.lit(0)).cast("int").alias("in_core"))
    )


def khop_neighbors(edges: DataFrame, seeds: DataFrame, k: int = 2) -> DataFrame:
    """(seed, node, dist) — BFS min-hop distance from each seed over an
    undirected (u, v) edge set, bounded at ``k`` hops: the neighborhood
    expansion a KG-curation pass runs around entities of interest
    (context harvesting for a seed entity set, blast-radius checks
    before an entity merge).  ``seeds`` is a 1-column ``seed`` frame;
    the seed itself is emitted at dist 0.  BFS level order IS the
    min-hop distance, so no per-node min() re-aggregation is needed:
    a node joins ``known`` exactly once, at its first (= shortest)
    level — the anti-join below enforces it.

    Scale shape: the symmetric edge list is exchanged ONCE (src-keyed
    repartition + localCheckpoint) and every hop's frontier⋈edges
    equi-join reuses that layout; frontiers are `distinct`ed per hop so
    a dense level never re-expands duplicate work, and the growing
    ``known`` set participates only as the anti-join pruning side.
    Hub fan-out makes frontier sizes node-bounded, not edge-bounded.
    Per-hop ``localCheckpoint`` cuts the iterative lineage like every
    other fixpoint operator here."""
    sym = (
        edges.select("u", "v")
        .union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .withColumnRenamed("u", "src")
        .withColumnRenamed("v", "dst")
        .repartition("src")
        .localCheckpoint()
    )
    known = seeds.select(
        F.col("seed"), F.col("seed").alias("node"), F.lit(0).alias("dist")
    ).localCheckpoint()
    frontier = known
    for hop in range(1, k + 1):
        nxt = (
            frontier.select("seed", F.col("node").alias("src"))
            .join(sym, "src")
            .select("seed", F.col("dst").alias("node"),
                    F.lit(hop).alias("dist"))
            .distinct()
        )
        new = nxt.join(
            known.select("seed", "node"), ["seed", "node"], "left_anti"
        ).localCheckpoint()
        known = known.unionByName(new)
        frontier = new
    return known.select("seed", "node", F.col("dist").cast("int").alias("dist"))


def lpa_communities(edges: DataFrame, rounds: int = 2) -> DataFrame:
    """(node, community) — deterministic SYNCHRONOUS label propagation
    (Raghavan et al. 2007, made engine-portable): every node starts
    labeled with its own id; each round it adopts the label with the
    largest edge-weight-summed vote among its neighbors, ties broken
    toward the lexically SMALLEST label (min over the (-weight, label)
    struct — one total order both engines share).  Fixed ``rounds`` +
    total tie order ⇒ bit-identical output on any partitioning, which
    is what classic async/randomized LPA cannot give and what the
    DuckDB oracle (and 100 TB re-runs) require.  Min-tie matters: a
    greater-label tie order lets a bridge endpoint's label invade a
    clique on the all-distinct first round, while min ties seed each
    dense group with its own least id (CC-like locally) and the
    majority vote then keeps the groups apart.

    Complements the min-label connected components in
    operators/canon.py: CC merges everything a weak bridge touches,
    LPA's majority vote keeps densely-knit groups separate — the
    community lens a KG-curation pass wants before entity-merge review.

    Scale shape per round: labels are NODE-sized (≪ edges); the
    symmetric edge list is exchanged ONCE (dst-keyed repartition +
    localCheckpoint) and every round's edges⋈labels equi-join reuses
    that layout; both the vote sum (node, label) and the argmax struct
    max (node) are map-side combinable aggs, so hub in-degree skew
    collapses to one partial per partition — no per-node rank window
    anywhere.  Per-round ``localCheckpoint`` cuts the iterative
    lineage like every other fixpoint operator here."""
    sym = (
        edges.select(F.col("u").alias("src"), F.col("v").alias("dst"), "weight")
        .unionByName(
            edges.select(F.col("v").alias("src"), F.col("u").alias("dst"), "weight")
        )
        .repartition("dst")
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("src").alias("node")).distinct()
        .withColumn("lab", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(rounds):
        votes = (
            sym.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"), "lab")
            .agg(F.sum("weight").alias("w"))
        )
        labels = (
            votes.groupBy("node")
            .agg(F.min(F.struct((-F.col("w")).alias("nw"),
                                F.col("lab"))).alias("m"))
            .select("node", F.col("m.lab").alias("lab"))
            .localCheckpoint()
        )
    return labels.select("node", F.col("lab").alias("community"))


def linkpred_scores(edges: DataFrame,
                    max_degree: int | None = None,
                    min_common: int = 1) -> DataFrame:
    """(u, v, n_common, deg_u, deg_v) — common-neighbor link
    prediction over a canonical undirected edge set (u < v): every
    NON-adjacent pair sharing ≥ ``min_common`` neighbors, with the
    shared-neighbor count and both endpoint degrees.  The KG-completion
    candidate generator: in a co-mention graph, entities with many
    common neighbors but no edge are the pairs a curator (or a
    downstream ranker) inspects first.  All-integer output — Jaccard
    ``n_common/(deg_u+deg_v-n_common)`` and similar normalizations are
    the reader's division, so the operator itself stays engine-exact.

    Scale shape: wedges are enumerated through the MIDDLE node
    (adjacency self-joined on the mid key), so the pair count is
    Σ_mid (deg_mid choose 2) — linear in the true wedge output, never
    |V|².  ``max_degree`` is the celebrity cap, same contract as
    triangle_counts: a hub mid-node contributes quadratically many
    wedges that measure its hubness, not pair affinity; with a cap,
    mids of degree > ``max_degree`` are excluded from WEDGE
    ENUMERATION (endpoints keep their full degrees — only the
    through-the-hub evidence is dropped) and the result is the exact
    common-neighbor count of the remaining wedge set.  The groupBy on
    (u, v) is map-side combinable; the adjacency anti-join removes
    already-linked pairs."""
    e = edges.select("u", "v").distinct()
    # symmetrized adjacency: (n, nbr) both directions
    adj = (
        e.select(F.col("u").alias("n"), F.col("v").alias("nbr"))
        .unionAll(e.select(F.col("v").alias("n"), F.col("u").alias("nbr")))
    )
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    mids = adj
    if max_degree is not None:
        keep = deg.where(F.col("d") <= max_degree).select("n")
        mids = adj.join(keep, "n", "semi")
    a, b = mids.alias("a"), mids.alias("b")
    common = (
        a.join(b, "n")
        .where(F.col("a.nbr") < F.col("b.nbr"))
        .groupBy(F.col("a.nbr").alias("u"), F.col("b.nbr").alias("v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )
    unlinked = common.join(e, ["u", "v"], "anti")
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("deg_u"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("deg_v"))
    return unlinked.join(du, "u").join(dv, "v").select(
        "u", "v", "n_common", "deg_u", "deg_v")


def random_walks(edges: DataFrame, walks_per_node: int = 2,
                 length: int = 3) -> DataFrame:
    """(start, walk_id, step, node) — DeepWalk/node2vec-style walk
    corpus over the undirected (u, v) edge set: ``walks_per_node``
    walks of up to ``length`` steps from every node, the sentence
    stream a KG-embedding trainer consumes.

    Determinism contract (the reason this is oracle-checkable at all):
    there is NO RNG.  Each step moves to the neighbor minimizing
    ``md5(start|walk_id|step|dst)`` — a keyed hash playing the role of
    the random draw, as in any reproducible-sampling pipeline here
    (salted.py's bucket hashing, sampling.py's hash gates).  Same
    input ⇒ same walks on every cluster size, every retry, both
    engines.  Walks hitting a sink node simply end (shorter walk, no
    padding row).

    Scale shape: the symmetrized neighbor table pays ONE edge-sized
    exchange (repartition("src") funds the distinct AND every step's
    join, same single-exchange setup as pagerank) and is checkpointed
    loop-invariant; each step then exchanges only walk-sized frontier
    rows, and the per-step arg-min collapses the frontier×degree join
    output map-side (min_by partials) before it ever shuffles — the
    frontier exchange is |nodes|·walks_per_node rows regardless of
    degree.  Walk hops are hash-keyed, so a hub's huge in-neighborhood
    spreads over the src partitioning instead of concentrating.
    """
    sym = (
        edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(
            edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .repartition("src").distinct().localCheckpoint()
    )
    f0 = (
        sym.select(F.col("src").alias("start")).distinct()
        .select(
            "start",
            F.explode(F.sequence(F.lit(0), F.lit(int(walks_per_node) - 1)))
            .alias("walk_id"))
        .select("start", "walk_id", F.lit(0).alias("step"),
                F.col("start").alias("node"))
    )
    steps, cur = [f0], f0
    for i in range(1, int(length) + 1):
        cur = (
            cur.join(sym, cur["node"] == sym["src"])
            .groupBy("start", "walk_id")
            .agg(F.min_by(
                "dst",
                F.md5(F.concat_ws("|", "start", "walk_id", F.lit(i), "dst")))
                .alias("node"))
            .select("start", "walk_id", F.lit(i).alias("step"), "node")
        )
        steps.append(cur)
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out.select("start", F.col("walk_id").cast("int").alias("walk_id"),
                      F.col("step").cast("int").alias("step"), "node")
