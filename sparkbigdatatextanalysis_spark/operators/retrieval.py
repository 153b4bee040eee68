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
    if k1 < 0 or not 0 <= b <= 1:
        raise ValueError(f"bm25_scores: need k1 >= 0 and 0 <= b <= 1, got {k1}, {b}")
    ex = tok_df.select(
        F.col(id_col).alias("_id"),
        F.size(tokens_col).alias("_dl"),
        F.explode(tokens_col).alias("_t"),
    ).where(F.col("_t").isin(q))
    tf = ex.groupBy("_id", "_t").agg(
        F.count(F.lit(1)).alias("_tf"), F.first("_dl").alias("_dl")
    )
    dfs = tf.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    # N and avgdl must cover the SAME row set: F.size(NULL) is NULL
    # (or -1 under legacy sizeOfNull) and avg() skips NULLs, so a bare
    # avg(size(tokens)) would drop NULL-token rows from avgdl while
    # count(*) keeps them in N, skewing IDF vs the documented formula
    # (r4 advice). A NULL/empty token array is an empty document:
    # length 0, counted in both stats.
    dl = F.when(F.col(tokens_col).isNull(), F.lit(0)).otherwise(
        F.size(tokens_col)
    )
    stats = tok_df.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg(dl).alias("_avgdl"),
    )
    idf = F.log(
        (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1.0
    )
    term_score = (
        idf
        * (F.col("_tf") * (k1 + 1.0))
        / (F.col("_tf") + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl")))
    )
    return (
        tf.join(F.broadcast(dfs), "_t")
        .crossJoin(F.broadcast(stats))
        .select("_id", term_score.alias("_s"))
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
