"""Connected components over candidate-pair graphs.

The missing last step of a near-dup dedup pipeline: similarity joins
(MinHash/SimHash/Jaccard/embedding) emit PAIRS, but keep/drop decisions
need CLUSTERS -- every doc transitively connected must agree on one
canonical representative.

Algorithm: iterative minimum-label propagation. Every node starts
labeled with itself; each round every node takes the min label among
itself and its neighbors; converged when no label changes. Rounds ~
O(graph diameter) -- near-dup graphs are overwhelmingly tiny cliques
(diameter 1-2), so 2-4 rounds in practice. Each round is ONE
groupBy(node) over the label-joined edge list: shuffle size |edges|,
map-side partial min, AQE-coalesced. The driver only checks an O(1)
convergence count per round -- labels never collect.

At extreme scale the alternating large-star/small-star formulation
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
2014) halves round counts on high-diameter graphs; the propagation loop
below is the same join/agg shape, so swapping the step function is
local to this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.lineage import release


def connected_components(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the smallest node id reachable from ``node``.

    ``edges`` is undirected input (each pair listed once is enough).
    """
    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # symmetrize once; self-loops are harmless but dropped for size
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).where(F.col("u") != F.col("v")).distinct()
    sym = sym.persist()

    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .persist()
    )
    # Convergence metric: labels only ever DECREASE (min-propagation), so
    # the label sum strictly decreases every non-converged round --
    # fixpoint <=> sum unchanged. One small agg job per round instead of
    # a labels-join-labels diff count. Numeric ids: DECIMAL(38) keeps
    # the sum exact for arbitrary 64-bit ids at any node count. Other id
    # types (string/UUID doc keys) cannot cast -- their fingerprint is
    # the exact decimal sum of xxhash64(node, comp): any label change
    # changes it except on a 64-bit hash-sum collision (~2^-64 per
    # round; the labels themselves stay exact either way).
    comp_type = dict(edges.select(F.col(src).alias("c")).dtypes)["c"]
    numeric = comp_type in ("tinyint", "smallint", "int", "bigint", "decimal")

    def label_sum(df: DataFrame):
        metric = (
            F.col("comp").cast("decimal(38,0)")
            if numeric
            else F.xxhash64("node", "comp").cast("decimal(38,0)")
        )
        return df.agg(F.sum(metric)).first()[0]

    prev_sum = label_sum(labels)  # also materializes the persist

    converged = False
    for i in range(max_iter):
        # candidate labels flowing over edges: node <- neighbor's comp
        flowed = (
            sym.join(labels, sym.v == labels.node)
            .select(F.col("u").alias("node"), "comp")
        )
        new_labels = (
            labels.unionByName(flowed)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # persist caches rows but the LOGICAL plan still grows one
        # union+join+agg layer per round; past ~10 rounds plan
        # canonicalization OOMs the driver. localCheckpoint (eager)
        # truncates lineage too. Cheap persist for the common 2-4 round
        # near-dup case, checkpoint cadence for deep graphs.
        if i % 5 == 4:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist()
        new_sum = label_sum(new_labels)
        # release(), not unpersist(): the checkpoint-cadence rounds
        # store RDD-level blocks the cacheManager cannot drop
        release(labels)
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum

    sym.unpersist()
    if not converged:
        # Unconverged labels are WRONG (some nodes still carry a
        # non-minimal reachable id); never return them silently.
        release(labels)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "the graph diameter exceeds max_iter -- raise max_iter"
        )
    return labels.select("node", "comp")


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    id_col: str = "doc_id",
    algorithm: str = "label",
) -> DataFrame:
    """(doc_id, keep_id, is_kept): canonical-representative assignment
    for EVERY document -- cluster members map to the cluster's min id,
    singletons map to themselves. ``sum(is_kept)`` is the post-dedup
    corpus size.

    ``algorithm``: "label" (min-label propagation, O(diameter) rounds --
    right for near-dup graphs of tiny cliques) or "star"
    (large-star/small-star, O(log n) rounds -- right when chains/hubs
    push the diameter up). Labels are identical either way
    (property-tested in tests/test_components.py)."""
    if algorithm == "label":
        comp = connected_components(pairs, src, dst)
    elif algorithm == "star":
        comp = connected_components_star(pairs, src, dst)
    else:
        raise ValueError(
            f"dedup_clusters: algorithm must be 'label' or 'star', got {algorithm!r}"
        )
    out = all_ids.select(F.col(id_col).alias("doc_id")).join(
        comp.select(F.col("node").alias("doc_id"), F.col("comp").alias("keep_id")),
        "doc_id",
        "left",
    )
    return out.select(
        "doc_id",
        F.coalesce("keep_id", F.col("doc_id")).alias("keep_id"),
    ).withColumn(
        "is_kept", (F.col("doc_id") == F.col("keep_id")).cast("long")
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) -- the high-diameter companion to
    :func:`connected_components`: label propagation needs O(diameter)
    rounds, this needs O(log^2 n) worst / O(log n) in practice, so a
    10,000-link chain converges in a handful of rounds instead of
    10,000.

    Each half-round is the same distributed shape as one propagation
    round: a groupBy(u).min partial agg + an equi-join back on u over
    the edge list (shuffle ~ |edges|); the driver sees only an O(1)
    fingerprint per round for the fixpoint check. Components are
    labeled by their minimum node id, exactly like the propagation
    form (property-tested equal).
    """
    e0 = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
        F.col("u") != F.col("v")
    )

    def large_star(e: DataFrame) -> DataFrame:
        # symmetric neighborhoods; attach m(u) = min({u} U N(u));
        # emit (v, m) for v > u
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        return (
            sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # orient child > parent; m(u) = min(N(u) U {u}) = min(N(u));
        # emit (v, m) for v in N(u) U {u}, v != m
        d = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = d.groupBy("u").agg(F.min("v").alias("m"))
        withm = d.join(m, "u")
        out = withm.where(F.col("v") != F.col("m")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        ).unionByName(m.select(F.col("u"), F.col("m").alias("v")))
        return out.where(F.col("u") != F.col("v")).distinct()

    def fingerprint(e: DataFrame):
        # order-insensitive exact edge-set fingerprint (same trick as
        # label_sum): decimal sum of per-edge 64-bit hashes
        return e.agg(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).first()

    # localCheckpoint (eager) TRUNCATES the lineage each round -- unlike
    # persist, which caches data but leaves the logical plan growing by
    # two unions + two joins + two distincts per round until plan
    # canonicalization OOMs the driver. On a cluster swap in a reliable
    # checkpoint() if executor loss must be survivable mid-computation.
    base = e0.distinct().localCheckpoint(eager=True)
    e = base
    # Fingerprint the initial set too: input that is already a star
    # forest (re-runs, tiny-clique graphs) then converges after ONE
    # round instead of needing a second to confirm.
    prev = fingerprint(e)
    converged = False
    for _ in range(max_iter):
        new_e = small_star(large_star(e)).localCheckpoint(eager=True)
        fp = fingerprint(new_e)
        # new_e's blocks exist (fingerprint ran) -> the prior round's
        # checkpoint can go; unpersist alone would silently leak it.
        # base stays: the post-loop node derivation reads it.
        if e is not base:
            release(e)
        e = new_e
        if fp == prev:
            converged = True
            break
        prev = fp
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    # fixpoint edge set is a star forest child->root (root = min id);
    # roots appear only on the v side, so add their self rows. Derive
    # nodes from the CHECKPOINTED base, not e0 -- e0 would re-execute
    # the (possibly expensive) upstream pair-generation plan twice.
    nodes = (
        base.select(F.col("u").alias("node"))
        .unionByName(base.select(F.col("v").alias("node")))
        .distinct()
    )
    out = nodes.join(
        e.select(F.col("u").alias("node"), F.col("v").alias("comp")),
        "node",
        "left",
    ).select("node", F.coalesce("comp", F.col("node")).alias("comp"))
    return out


def pagerank_fixed_point(
    edges: DataFrame,
    iterations: int = 3,
    one: int = 10**12,
    damping_num: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank (Page et al. 1999) in INTEGER
    arithmetic: ranks are scaled by ``one`` and every update uses exact
    BIGINT sums and floor division, so the result is bit-identical
    across engines, partitionings, merge orders, and reruns.
    Floating-point PageRank sums contributions in shuffle order and
    drifts in the last ULPs -- a nondeterministic result table at
    100 TB. The fixed-point form trades ~1/``one`` of per-step
    precision (the dropped division remainders) for exactness of the
    SPEC, which is what makes the operator oracle-checkable.

    Update rule per round, for damping d = damping_num/100::

        contrib(edge src->dst) = r(src) DIV out_deg(src)
        r'(node) = (15 * one DIV 100) DIV n_nodes
                   + (damping_num * sum(incoming contribs)) DIV 100

    edges: directed (src, dst) pairs, any orderable node type. Dangling
    nodes (no out-edges) leak their rank, the standard simplified
    treatment -- add reverse edges or a sink upstream if that matters
    for the graph at hand.

    Scale: each round is ONE equi-join of the rank table to the static
    (src, dst, deg) edge table on src plus ONE groupBy(dst) -- shuffle
    |edges| rows, map-side combined; the node count rides as a
    broadcast scalar. Lineage is truncated per round with an eager
    localCheckpoint exactly like connected_components' loop (persist
    alone grows the logical plan by a join + agg per round).

    Returns (node, rank_fp, rank): the scaled BIGINT rank and its float
    view rounded to 9 decimals. rank_fp sums to ~one over the graph
    (minus dropped remainders and dangling leakage).
    """
    if iterations < 1:
        raise ValueError(f"pagerank_fixed_point: iterations must be >= 1, got {iterations}")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # static across rounds: join degree once, persist
    edeg = edges.join(deg, "src").persist()
    teleport = (15 * one) // 100
    ranks = (
        nodes.crossJoin(F.broadcast(nn))
        .select("node", F.expr(f"CAST({one} AS BIGINT) DIV n").alias("r"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        contrib = edeg.join(ranks, edeg.src == ranks.node).select(
            "dst", F.expr("r DIV deg").alias("c")
        )
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        new = (
            nodes.join(sums, nodes.node == sums.dst, "left")
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                (
                    F.expr(f"CAST({teleport} AS BIGINT) DIV n")
                    + F.expr(f"({damping_num} * coalesce(s, CAST(0 AS BIGINT))) DIV 100")
                ).alias("r"),
            )
        )
        old = ranks
        ranks = new.localCheckpoint(eager=True)
        release(old)
    nodes.unpersist()
    edeg.unpersist()
    return ranks.select(
        "node",
        F.col("r").alias("rank_fp"),
        F.round(F.col("r") / F.lit(float(one)), 9).alias("rank"),
    )


def _attach_degrees(
    und: DataFrame, dx: DataFrame, dy: DataFrame, broadcast: bool
) -> DataFrame:
    """Label each undirected edge with both endpoints' degrees: two
    equi-joins, hinted broadcast at gate scale, plain shuffle joins past
    the node-count limit (the degree table is O(|V|) -- billions of rows
    on a 100 TB near-dup graph cannot broadcast). Split out so the plan
    audit can pin both shapes pre-checkpoint."""
    if broadcast:
        dx, dy = F.broadcast(dx), F.broadcast(dy)
    return und.join(dx, "x").join(dy, "y")


def _triangle_triples(
    edges: DataFrame,
    a: str,
    b: str,
    broadcast_degrees: bool | None,
    broadcast_node_limit: int,
) -> tuple[DataFrame, DataFrame]:
    """Shared compact-forward triangle enumeration (the count_triangles
    body, factored so adamic_adar_edges can reuse the hub-safe wedge
    discipline): returns (triples, deg) where ``triples`` has one row
    (s, d1, d2) per distinct triangle -- s the (degree, id)-lowest
    pivot -- and ``deg`` is the checkpointed (n, deg) table. See
    count_triangles for the full scale rationale."""
    und = (
        edges.select(F.least(a, b).alias("x"), F.greatest(a, b).alias("y"))
        .where(F.col("x") != F.col("y"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("x").alias("n"))
        .unionByName(und.select(F.col("y").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    # orient each edge from the (deg, id)-lower endpoint to the higher;
    # carry the dst's (deg, id) so the wedge comparison needs no third join
    dx = deg.select(F.col("n").alias("x"), F.col("deg").alias("dgx"))
    dy = deg.select(F.col("n").alias("y"), F.col("deg").alias("dgy"))
    if broadcast_degrees is None:
        broadcast_degrees = deg.count() <= broadcast_node_limit
    lab = _attach_degrees(und, dx, dy, broadcast_degrees)
    x_first = (F.col("dgx") < F.col("dgy")) | (
        (F.col("dgx") == F.col("dgy")) & (F.col("x") < F.col("y"))
    )
    oriented = lab.select(
        F.when(x_first, F.col("x")).otherwise(F.col("y")).alias("src"),
        F.when(x_first, F.col("y")).otherwise(F.col("x")).alias("dst"),
        F.when(x_first, F.col("dgy")).otherwise(F.col("dgx")).alias("dst_deg"),
    ).localCheckpoint(eager=True)
    und.unpersist()
    e1 = oriented.select(
        F.col("src").alias("s"),
        F.col("dst").alias("d1"),
        F.col("dst_deg").alias("dd1"),
    )
    e2 = oriented.select(
        F.col("src").alias("s"),
        F.col("dst").alias("d2"),
        F.col("dst_deg").alias("dd2"),
    )
    wedges = e1.join(e2, "s").where(
        (F.col("dd1") < F.col("dd2"))
        | ((F.col("dd1") == F.col("dd2")) & (F.col("d1") < F.col("d2")))
    )
    closing = oriented.select(
        F.col("src").alias("d1"), F.col("dst").alias("d2")
    )
    tris = wedges.join(closing, ["d1", "d2"]).select("s", "d1", "d2")
    return tris, deg


def count_triangles(
    edges: DataFrame,
    a: str = "u",
    b: str = "v",
    broadcast_degrees: bool | None = None,
    broadcast_node_limit: int = 2_000_000,
) -> DataFrame:
    """Per-node triangle counts over an undirected graph -- the
    local-density signal that separates core members of a near-dup
    clique (every neighbor pair also connected) from chain artifacts
    of transitive candidate generation (star centers with zero
    closures).

    Compact-forward enumeration with DEGREE ordering (Latapy 2008;
    Suri & Vassilvitskii 2011, "Counting Triangles and the Curse of
    the Last Reducer"): each undirected edge orients from its
    (degree, id)-lower endpoint to the higher, so wedges pivot only on
    a node's HIGHER-ranked out-neighbors -- at most O(sqrt(|E|)) of
    them for ANY node. A naive id-ordering enumerates a d^2 wedge set
    at a degree-d hub (the "last reducer" that never finishes on a
    power-law graph); degree ordering is what makes the wedge/closing
    joins safe at any graph skew.

    The degree ATTACH is a separate scale decision: the degree table
    has one row per node, so force-broadcasting it (fast at gate
    scale -- two map-only joins, no edge shuffle) stops being viable
    once |V| outgrows executor memory. ``broadcast_degrees=None``
    (default) decides from the checkpointed degree table's own row
    count against ``broadcast_node_limit`` (the count is a metadata
    read of the eager checkpoint, not a recompute); past the limit the
    attach falls back to two plain shuffle equi-joins on x/y --
    hub-safe too, since a node's degree row joins each of its edges
    once. Pass True/False to pin either plan (both shapes are
    budget-pinned in tests/test_plan_audit.py).

    Shape: canonical-edge distinct + one degree aggregation, map-only
    orientation, then TWO equi-joins (wedge pivot on the source,
    closing edge on the (d1, d2) pair) and one exploded groupBy(node).
    Every triangle is enumerated exactly once (its (degree, id)-lowest
    vertex is the pivot). The static degree and oriented-edge tables
    are EAGER localCheckpoints (the CC/PageRank loop discipline):
    construction runs their jobs up front, each feeds 2-3 downstream
    consumers from blocks instead of re-expanding a possibly-huge
    pair-generation plan per consumer (on a cluster swap in a reliable
    checkpoint() if executor loss must be survivable).

    Returns (node, degree, n_triangles) for every node of the graph
    (zero-triangle nodes included). Self-loops and duplicate/reversed
    edges are dropped.
    """
    tris, deg = _triangle_triples(
        edges, a, b, broadcast_degrees, broadcast_node_limit
    )
    per_node = (
        tris.select(
            F.explode(F.array("s", "d1", "d2")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    out = (
        deg.select(F.col("n").alias("node"), F.col("deg").alias("degree"))
        .join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
        )
    )
    return out


def kcore_peel(
    edges: DataFrame,
    a: str = "u",
    b: str = "v",
    k: int = 2,
    rounds: int = 3,
) -> DataFrame:
    """Bounded k-core peeling: ``rounds`` iterations of "drop every node
    whose degree in the surviving subgraph is < ``k``" -- the density
    filter that separates cohesive near-dup cores (every member keeps
    >= k neighbors even after the fringe peels away) from stars and
    chains that triangle counting flags but cannot rank (a k-core
    survives peeling; a hub with pendant leaves does not).

    FIXED round count, exact integers: like the PageRank/CC loops the
    result is a deterministic function of the graph alone (no float
    tolerance, no convergence race), so an oracle replays the same
    ``rounds`` as unrolled CTEs and matches bit-for-bit. Small graphs
    converge in 2-3 rounds; on a power-law graph the peel converges in
    O(max coreness) rounds -- raise ``rounds`` or loop externally on
    the O(1) per-round survivor count if the true fixpoint is needed.

    Per round: ONE degree aggregation (shuffle |surviving edges|, map-
    side partials) + two plain equi-joins restricting the edge list to
    surviving nodes -- deliberately NOT broadcast: the survivor set is
    O(|V|) (the count_triangles degree-attach rationale). Each round's
    edge list is an eager localCheckpoint, the CC-loop discipline: the
    audited plan stays one round deep and freed blocks bound memory.

    Returns (node, degree, in_core) for EVERY node of the input graph:
    ``degree`` is the node's degree among survivors after the last
    round (0 once peeled), ``in_core`` marks survivors. Self-loops and
    duplicate/reversed edges are dropped first.
    """
    if k < 1 or rounds < 1:
        raise ValueError(f"kcore_peel: need k >= 1 and rounds >= 1, got {k}, {rounds}")
    und = (
        edges.select(F.least(a, b).alias("x"), F.greatest(a, b).alias("y"))
        .where(F.col("x") != F.col("y"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_nodes = (
        und.select(F.col("x").alias("node"))
        .unionByName(und.select(F.col("y").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def degrees(e: DataFrame) -> DataFrame:
        return (
            e.select(F.col("x").alias("n"))
            .unionByName(e.select(F.col("y").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("deg"))
        )

    cur = und
    for _ in range(rounds):
        keep = degrees(cur).where(F.col("deg") >= k).select("n")
        nxt = (
            cur.join(keep.withColumnRenamed("n", "x"), "x")
            .join(keep.withColumnRenamed("n", "y"), "y")
            .select("x", "y")
            .localCheckpoint(eager=True)
        )
        release(cur)
        cur = nxt
    final_deg = degrees(cur)
    return (
        all_nodes.join(
            final_deg.withColumnRenamed("n", "node"), "node", "left"
        )
        .select(
            "node",
            F.coalesce("deg", F.lit(0)).cast("long").alias("degree"),
            # survivors of the LAST peel check: deg >= k in the final
            # subgraph (a node can linger in `cur`'s edges with deg < k
            # only if rounds stopped before the fixpoint -- in_core
            # reports the round-bounded truth either way)
            (F.coalesce("deg", F.lit(0)) >= k).alias("in_core"),
        )
    )


def degree_assortativity(
    edges: DataFrame, a: str = "u", b: str = "v"
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of an undirected
    graph: the Pearson correlation of endpoint degrees over the
    DIRECTED edge list (each undirected edge contributes both
    orientations -- the standard symmetric convention). Positive means
    hubs attach to hubs (a social/core-periphery shape); near-dup
    candidate graphs trend negative (star centers attached to leaves),
    so the sign is a one-number shape audit of the pair generator.

    Scale shape: canonical-edge distinct + ONE degree aggregation
    (O(|V|) rows), both orientations emitted IN-ROW from each
    undirected edge (explode x2, map-side -- never a union rescan of
    the pair-generation subtree), then two PLAIN equi-joins to attach
    endpoint degrees -- deliberately NOT broadcast: the degree table is
    O(|V|) and cannot ship to executors on a 100 TB graph (the
    count_triangles degree-attach lesson; AQE still broadcasts when
    genuinely small). The Pearson moments are exact: degrees are
    BIGINT, every product runs through DECIMAL(18,0)xDECIMAL(18,0) ->
    DECIMAL(37,0) (never a lossy double sum), and the closed form
    evaluates on the single result row.

    Returns one row: (n_nodes, n_edges, assortativity) -- NULL when a
    degree variance is 0 (e.g. a perfect matching or a single clique).
    """
    und = (
        edges.select(F.least(a, b).alias("x"), F.greatest(a, b).alias("y"))
        .where(F.col("x") != F.col("y"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("x").alias("n"))
        .unionByName(und.select(F.col("y").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .localCheckpoint(eager=True)
    )
    directed = (
        und.select(
            F.explode(
                F.array(
                    F.struct(F.col("x").alias("s"), F.col("y").alias("t")),
                    F.struct(F.col("y").alias("s"), F.col("x").alias("t")),
                )
            ).alias("_e")
        )
        .select("_e.s", "_e.t")
        .localCheckpoint(eager=True)
    )
    edge_count = und.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges")
    ).localCheckpoint(eager=True)
    # both consumers of `und` are now materialized (directed /
    # edge_count checkpoints) -- release the cached partitions so a
    # long session or a 234-key battery does not accumulate them
    # (the bfs_levels lifecycle).
    und.unpersist()
    ds = deg.select(F.col("n").alias("s"), F.col("deg").alias("dx"))
    dt = deg.select(F.col("n").alias("t"), F.col("deg").alias("dy"))
    lab = directed.join(ds, "s").join(dt, "t")
    dxd = F.col("dx").cast("decimal(18,0)")
    dyd = F.col("dy").cast("decimal(18,0)")
    mom = lab.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(dxd).alias("_sx"),
        F.sum(dyd).alias("_sy"),
        F.sum(dxd * dyd).alias("_sxy"),
        F.sum(dxd * dxd).alias("_sxx"),
        F.sum(dyd * dyd).alias("_syy"),
    )
    counts = edge_count.crossJoin(
        F.broadcast(deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes")))
    )
    md = F.col("m").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    varx = md * sxx - sx * sx
    vary = md * syy - sy * sy
    out = mom.crossJoin(F.broadcast(counts)).select(
        "n_nodes",
        "n_edges",
        F.round(
            F.when(
                (varx > 0) & (vary > 0),
                (md * sxy - sx * sy) / F.sqrt(varx * vary),
            ),
            9,
        ).alias("assortativity"),
    )
    return out


def bfs_levels(
    edges: DataFrame, a: str = "u", b: str = "v", max_hops: int = 4
) -> DataFrame:
    """Bounded breadth-first search from the (degree, id)-argmax seed:
    per-hop reachable-node counts plus the unreachable remainder -- the
    connectivity/diameter probe behind "how far does this near-dup
    family actually spread" questions, where component SIZE (X33)
    says nothing about SHAPE. Returns (dist, n_nodes) with dist 0..h
    for non-empty levels and a dist = -1 row for graph nodes not
    reached within ``max_hops``.

    Scale shape: the iterative-graph discipline (CC/PageRank/k-core):
    each hop is ONE equi-join of the directed edge list against the
    frontier plus one anti-join against the reached set, both plain
    shuffles (frontier and reached are O(|V|) -- never broadcast), and
    the loop eagerly localCheckpoints so lineage stays bounded; the
    driver sees only O(1) per-round counts. The seed argmax is a
    TakeOrdered (heap, no global sort). Frontier expansion is pure set
    algebra over exact keys, so an unrolled per-hop SQL replay is
    value-identical -- the oracle proves each level.
    """
    und = (
        edges.select(F.least(a, b).alias("x"), F.greatest(a, b).alias("y"))
        .where(F.col("x") != F.col("y"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("x").alias("n"))
        .unionByName(und.select(F.col("y").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .localCheckpoint(eager=True)
    )
    directed = (
        und.select(
            F.explode(
                F.array(
                    F.struct(F.col("x").alias("s"), F.col("y").alias("t")),
                    F.struct(F.col("y").alias("s"), F.col("x").alias("t")),
                )
            ).alias("_e")
        )
        .select("_e.s", "_e.t")
        .localCheckpoint(eager=True)
    )
    und.unpersist()
    seed_row = deg.orderBy(F.col("deg").desc(), "n").limit(1).collect()
    spark = edges.sparkSession
    if not seed_row:
        # Empty canonical edge set: agree with the unrolled SQL oracle's
        # shape, which always emits the unreachable-remainder row --
        # here (dist=-1, n_nodes=0), never a zero-row frame.
        return spark.createDataFrame(
            [(-1, 0)], "dist INT, n_nodes LONG"
        )
    seed = seed_row[0]["n"]
    reached = (
        deg.where(F.col("n") == seed)
        .select(F.col("n").alias("node"), F.lit(0).alias("dist"))
        .localCheckpoint(eager=True)
    )
    frontier = reached
    for hop in range(1, max_hops + 1):
        nxt = (
            directed.join(
                frontier.select(F.col("node").alias("s")), "s"
            )
            .select(F.col("t").alias("node"))
            .distinct()
            .join(reached.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(hop))
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            break
        reached = reached.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    counts = reached.groupBy("dist").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    unreachable = (
        deg.join(
            reached.select(F.col("node").alias("n")), "n", "left_anti"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .select(F.lit(-1).alias("dist"), "n_nodes")
    )
    return counts.unionByName(unreachable).select(
        F.col("dist").cast("int").alias("dist"), "n_nodes"
    )


def local_clustering(
    edges: DataFrame,
    a: str = "u",
    b: str = "v",
    round_digits: int = 9,
    broadcast_degrees: bool | None = None,
    broadcast_node_limit: int = 2_000_000,
) -> DataFrame:
    """Per-node local clustering coefficient (Watts & Strogatz 1998):
    C_v = 2*triangles(v) / (deg(v)*(deg(v)-1)) -- the share of a
    node's neighbor pairs that are themselves connected. On a near-dup
    candidate graph this is the per-node readout the global triangle
    density (X133) and assortativity (X195) summarize away: clique
    members score ~1, transitive-chain artifacts and star centers ~0,
    so the coefficient column is the direct "is this node inside a
    real duplicate clique or just wired to one" signal.

    Pure map over count_triangles' output (same hub-safe compact-
    forward enumeration; see that docstring for the scale argument) --
    the division is the only new work. C is NULL for degree-1 nodes
    (no neighbor pair exists to close; emitting 0 would conflate
    "nothing to measure" with "measured open"), never a
    divide-by-zero. Returns (node, degree, n_triangles, clustering).
    """
    t = count_triangles(
        edges, a, b, broadcast_degrees, broadcast_node_limit
    )
    d = F.col("degree").cast("double")
    return t.select(
        "node",
        "degree",
        "n_triangles",
        F.round(
            F.when(
                F.col("degree") >= 2,
                2.0 * F.col("n_triangles").cast("double") / (d * (d - 1.0)),
            ),
            round_digits,
        ).alias("clustering"),
    )


def adamic_adar_edges(
    edges: DataFrame,
    a: str = "u",
    b: str = "v",
    round_digits: int = 6,
    broadcast_degrees: bool | None = None,
    broadcast_node_limit: int = 2_000_000,
) -> DataFrame:
    """Adamic-Adar structural-support score for every EDGE of the
    graph (Adamic & Adar 2003): sum over the pair's common neighbors
    w of 1/ln(deg(w)) -- the classic link-strength weighting where a
    shared low-degree neighbor is strong evidence (two docs sharing a
    RARE near-dup witness) and a shared hub says little. On the
    candidate graph this ranks which near-dup pairs are corroborated
    by the surrounding structure vs supported by nothing but their own
    similarity score -- the edge-level complement of local_clustering.

    A common neighbor of edge (x, y) IS the third vertex of a triangle
    on that edge, so the score rides the same hub-safe compact-forward
    triangle enumeration as count_triangles (never a neighbor-list
    self-join, whose wedge set is d^2 at a degree-d hub): each
    enumerated triangle credits its three edges with the opposite
    vertex, one plain equi-join attaches deg(w) (O(|V|) table --
    deliberately not forced broadcast), and one groupBy(edge)
    aggregates. deg(w) >= 2 always (w closes a wedge), so ln is never
    0. Per-term weights are ENGINE-rounded to 12 dp and summed in
    DECIMAL (the Markov/ACF convention: double sums are fold-order-
    dependent, rounded-DECIMAL sums are not), the output rounds at
    ``round_digits``. Edges with no common neighbor keep score 0 and
    n_common 0 (left join back from the canonical edge set). Returns
    (a_id, b_id, n_common, adamic_adar).
    """
    tris, deg = _triangle_triples(
        edges, a, b, broadcast_degrees, broadcast_node_limit
    )
    s, d1, d2 = F.col("s"), F.col("d1"), F.col("d2")
    contrib = tris.select(
        F.explode(
            F.array(
                F.struct(
                    F.least(d1, d2).alias("e1"),
                    F.greatest(d1, d2).alias("e2"),
                    s.alias("w"),
                ),
                F.struct(
                    F.least(s, d2).alias("e1"),
                    F.greatest(s, d2).alias("e2"),
                    d1.alias("w"),
                ),
                F.struct(
                    F.least(s, d1).alias("e1"),
                    F.greatest(s, d1).alias("e2"),
                    d2.alias("w"),
                ),
            )
        ).alias("_t")
    ).select("_t.e1", "_t.e2", "_t.w")
    scored = contrib.join(
        deg.select(F.col("n").alias("w"), "deg"), "w"
    ).select(
        "e1",
        "e2",
        F.round(F.lit(1.0) / F.log(F.col("deg").cast("double")), 12)
        .cast("decimal(18,12)")
        .alias("_term"),
    )
    per_edge = scored.groupBy("e1", "e2").agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.sum("_term").alias("_aa"),
    )
    canon = (
        edges.select(F.least(a, b).alias("e1"), F.greatest(a, b).alias("e2"))
        .where(F.col("e1") != F.col("e2"))
        .distinct()
    )
    return (
        canon.join(per_edge, ["e1", "e2"], "left")
        .select(
            F.col("e1").alias("a_id"),
            F.col("e2").alias("b_id"),
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            F.round(
                F.coalesce(F.col("_aa").cast("double"), F.lit(0.0)),
                round_digits,
            ).alias("adamic_adar"),
        )
    )
