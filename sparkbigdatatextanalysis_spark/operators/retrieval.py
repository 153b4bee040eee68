"""BM25 keyword retrieval over tokenized corpora.

The standard lexical ranking function (Robertson/Sparck Jones BM25, the
Okapi formulation with the +1-smoothed IDF Lucene uses) -- the retrieval
twin of the TF-IDF cosine operators: where `similarity.py` ranks
document PAIRS, this ranks documents against a QUERY, which is the shape
search/RAG retrieval actually needs.

    score(d, q) = sum over t in q of
        ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        * tf_td * (k1 + 1) / (tf_td + k1 * (1 - b + b * dl_d / avgdl))

Scale shape: the corpus explode is PRUNED to the query's terms before
anything aggregates -- the scored row set is (matching docs x query
terms), not the corpus -- and the document length rides through the
explode so no join back to the full corpus is ever needed. One partial
aggregation builds (doc, term) tfs, a second (term-count-sized) one the
dfs; corpus-level stats (N, avgdl) and the per-term dfs attach as
broadcasts. Top-k goes through a rank window over the small scored set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F



def _check_params(fn: str, k1: float, b: float) -> None:
    if k1 < 0 or not 0 <= b <= 1:
        raise ValueError(f"{fn}: need k1 >= 0 and 0 <= b <= 1, got {k1}, {b}")


def _exploded(tok_df: DataFrame, id_col: str, tokens_col: str) -> DataFrame:
    """(_id, _dl, _t): the corpus explode with the doc length riding
    along (so no join back to the full corpus is ever needed). Callers
    prune to their query terms IMMEDIATELY (isin for a literal list,
    broadcast left_semi for a query table)."""
    return tok_df.select(
        F.col(id_col).alias("_id"),
        F.size(tokens_col).alias("_dl"),
        F.explode(tokens_col).alias("_t"),
    )


def _tf_dfs(ex: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(doc, term) tfs from one partial agg; per-term dfs (document
    frequency = docs containing the term) from a second, term-sized one."""
    tf = ex.groupBy("_id", "_t").agg(
        F.count(F.lit(1)).alias("_tf"), F.first("_dl").alias("_dl")
    )
    dfs = tf.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    return tf, dfs


def _corpus_stats(tok_df: DataFrame, tokens_col: str) -> DataFrame:
    """(_n, _avgdl): N and avgdl over the SAME row set -- F.size(NULL)
    is NULL (or -1 under legacy sizeOfNull) and avg() skips NULLs, so a
    bare avg(size(tokens)) would drop NULL-token rows from avgdl while
    count(*) keeps them in N, skewing IDF vs the documented formula
    (r4 advice). A NULL/empty token array is an empty document: length
    0, counted in both stats."""
    dl = F.when(F.col(tokens_col).isNull(), F.lit(0)).otherwise(
        F.size(tokens_col)
    )
    return tok_df.agg(
        F.count(F.lit(1)).alias("_n"), F.avg(dl).alias("_avgdl")
    )


def _term_score(k1: float, b: float):
    """The Okapi/+1-smoothed-IDF per-(doc, term) score expression over
    the joined (_tf, _dl, _df, _n, _avgdl) columns -- ONE definition
    shared by the single-query and batch forms so the formula cannot
    drift between them (r5 review finding)."""
    idf = F.log(
        (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1.0
    )
    return (
        idf
        * (F.col("_tf") * (k1 + 1.0))
        / (F.col("_tf") + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl")))
    )


def bm25_scores(
    tok_df: DataFrame,
    query_tokens: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """(id, n_matched, score): BM25 score of every document matching at
    least one query term. ``score`` is unrounded (callers round for
    cross-engine comparison: ln and the final sum differ in low-order
    bits between engines); ``n_matched`` counts distinct matched terms.
    Duplicate query terms are deduplicated (scoring a term twice would
    double its contribution)."""
    q = list(dict.fromkeys(query_tokens))
    if not q:
        raise ValueError("bm25_scores: query_tokens must be non-empty")
    _check_params("bm25_scores", k1, b)
    ex = _exploded(tok_df, id_col, tokens_col).where(F.col("_t").isin(q))
    tf, dfs = _tf_dfs(ex)
    stats = _corpus_stats(tok_df, tokens_col)
    return (
        tf.join(F.broadcast(dfs), "_t")
        .crossJoin(F.broadcast(stats))
        .select("_id", _term_score(k1, b).alias("_s"))
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_matched"), F.sum("_s").alias("score"))
        .select(F.col("_id").alias(id_col), "n_matched", "score")
    )


def bm25_topk(
    tok_df: DataFrame,
    query_tokens: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "id",
    tokens_col: str = "tokens",
    round_to: int = 6,
) -> DataFrame:
    """Top-``k`` documents for a query by BM25, deterministically:
    ranked on the ``round_to``-rounded score (engines differ in ln /
    summation low bits; ranking the rounded value keeps the cut
    identical everywhere) with id as the tie-break. Returns
    (id, n_matched, score, rank).

    The cut is ``orderBy().limit()`` -- TakeOrdered, per-partition heads
    merged on the driver -- NOT a global rank window: with a common
    query term the scored set is corpus-sized, and a windowed rank
    would single-partition it. Only the k survivors see a window (to
    materialize the rank), a k-row exchange."""
    scored = bm25_scores(tok_df, query_tokens, k1, b, id_col, tokens_col)
    top = (
        scored.select(id_col, "n_matched", F.round("score", round_to).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w))


def bm25_batch_scores(
    tok_df: DataFrame,
    queries: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "id",
    tokens_col: str = "tokens",
    query_id_col: str = "query_id",
    term_col: str = "term",
) -> DataFrame:
    """Batch form of :func:`bm25_scores`: score N queries in ONE job
    from a small (query_id, term) table -- the retrieval-evaluation /
    online-serving shape, where re-scanning a 100 TB corpus once per
    query is the thing that cannot happen.

    Returns (query_id, id, n_matched, score). Semantics are exactly
    per-query :func:`bm25_scores` (duplicate (query_id, term) rows are
    deduplicated; df/N/avgdl are corpus-level statistics shared across
    queries, NOT per-query).

    Scale shape: the corpus explodes ONCE and is immediately semi-join
    pruned to the UNION of all queries' terms (broadcast -- the query
    table is model-state-sized), so the scored row set is (matching
    docs x matching terms), independent of query count. One partial agg
    builds (doc, term) tfs; the term-count-sized df table and the
    2-value corpus stats attach as broadcasts; fanning out to
    (query_id, doc, term) happens only AFTER the tf aggregation, via a
    broadcast join against the query table, so adding queries adds no
    corpus pass and no extra shuffle -- only post-prune fan-out rows.
    """
    qt = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(term_col).alias("_t")
    ).distinct()
    _check_params("bm25_batch_scores", k1, b)
    # prune against qt's terms directly: left_semi tolerates duplicate
    # build-side keys (no fan-out), so a second distinct would only add
    # a shuffle stage and a broadcast job for nothing
    ex = _exploded(tok_df, id_col, tokens_col).join(
        F.broadcast(qt.select("_t")), "_t", "left_semi"
    )
    # dfs is an aggregate OF tf, so the explode+prune+tf subtree
    # evaluates once per consumer (twice per action: the broadcast df
    # build and the scoring path). r12 measured a lazy localCheckpoint
    # barrier on tf and REVERTED it: interleaved A/B at sf0.1 neutral
    # -- the explode reads the caller's cached token table and the two
    # branch evaluations overlap, while the barrier adds a block-store
    # sync. At 100 TB the caller passes a persisted/bucketed token
    # table and the same overlap argument holds per §2.1 (the df build
    # is term-count-sized and rides the broadcast).
    tf, dfs = _tf_dfs(ex)
    stats = _corpus_stats(tok_df, tokens_col)
    return (
        tf.join(F.broadcast(dfs), "_t")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qt), "_t")
        .select("_qid", "_id", _term_score(k1, b).alias("_s"))
        .groupBy("_qid", "_id")
        .agg(F.count(F.lit(1)).alias("n_matched"), F.sum("_s").alias("score"))
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_id").alias(id_col),
            "n_matched",
            "score",
        )
    )


def bm25_batch_topk(
    tok_df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "id",
    tokens_col: str = "tokens",
    query_id_col: str = "query_id",
    term_col: str = "term",
    round_to: int = 6,
) -> DataFrame:
    """Per-query top-``k`` over :func:`bm25_batch_scores`, ranked on the
    ``round_to``-rounded score with id tie-break (same determinism
    argument as :func:`bm25_topk`). Returns
    (query_id, id, n_matched, score, rank).

    The cut is :func:`relational.grouped_topk`, NOT a bare per-query
    window: with a common query term one query's scored set is
    corpus-sized, and a single PARTITION BY query_id window would
    funnel it through one task -- grouped_topk's two-phase TakeOrdered
    prunes each group to k rows per input partition first, so no task
    ever sees more than max(partition, k * n_partitions) rows.
    """
    from .relational import grouped_topk

    scored = bm25_batch_scores(
        tok_df, queries, k1, b, id_col, tokens_col, query_id_col, term_col
    )
    return grouped_topk(
        scored.select(
            query_id_col,
            id_col,
            "n_matched",
            F.round("score", round_to).alias("score"),
        ),
        group=[query_id_col],
        order=[F.col("score").desc(), F.col(id_col)],
        k=k,
    )
