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
    for _ in range(max_iter):
        # candidate labels flowing over edges: node <- neighbor's comp
        flowed = (
            sym.join(labels, sym.v == labels.node)
            .select(F.col("u").alias("node"), "comp")
        )
        new_labels = (
            labels.unionByName(flowed)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .persist()
        )
        new_sum = label_sum(new_labels)
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum

    sym.unpersist()
    if not converged:
        # Unconverged labels are WRONG (some nodes still carry a
        # non-minimal reachable id); never return them silently.
        labels.unpersist()
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
) -> DataFrame:
    """(doc_id, keep_id, is_kept): canonical-representative assignment
    for EVERY document -- cluster members map to the cluster's min id,
    singletons map to themselves. ``sum(is_kept)`` is the post-dedup
    corpus size."""
    comp = connected_components(pairs, src, dst)
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
