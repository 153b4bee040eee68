"""TF-IDF core, fully distributed (no driver-side dictionaries).

The reference computes IDF by collecting doc-frequencies to the driver
(EntityResolution.scala:98-130) and ships TF-IDF vectors around as
broadcast maps (ScalableEntityResolution.scala:59-62) -- the scalability
cliff. Here everything is a DataFrame; the canonical TF-IDF representation
is the exploded relational form ``(id, token, weight)``, which joins,
prunes and pushes down like any other table and survives 100 TB inputs.

Semantic parity notes:
  * IDF is the reference's non-standard ``N / df`` -- NO logarithm, no
    smoothing (EntityResolution.scala:121). MLlib's IDF (log((N+1)/(df+1)))
    intentionally NOT used.
  * TF is the relative in-doc frequency count(t)/len(tokens)
    (EntityResolution.scala:297-315); duplicates after stopword removal
    count, hence the duplicate-preserving tokenizer.
  * Unseen-token behavior: reference calculateTF_IDF throws on tokens
    absent from the IDF dict (EntityResolution.scala:365, closed-world
    corpus); here the inner join simply drops them -- identical results
    whenever the corpus covers the docs (always true in the pipeline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize, remove_stopwords


def tokenized(
    docs: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    keep_stopwords: bool = False,
) -> DataFrame:
    """(id, text) -> (id, tokens ARRAY<STRING>). Reference getTokens
    (EntityResolution.scala:22-34): one narrow projection, no shuffle.
    """
    toks: Column = tokenize(text_col)
    if not keep_stopwords:
        toks = remove_stopwords(toks, stopwords)
    return docs.select(F.col(id_col).alias("id"), toks.alias("tokens"))


def corpus_union(*token_dfs: DataFrame) -> DataFrame:
    """Bag union (no dedup) of tokenized catalogs -- reference createCorpus
    (EntityResolution.scala:86-96)."""
    out = token_dfs[0]
    for df in token_dfs[1:]:
        out = out.unionByName(df)
    return out


def term_frequencies(tok_df: DataFrame) -> DataFrame:
    """(id, tokens) -> (id, token, tf) with tf = count(token)/size(tokens).

    explode -> partial-aggregated groupBy; the map-side combine keeps the
    shuffle at |distinct (id, token)| not |tokens|.
    """
    return (
        tok_df.select("id", F.size("tokens").alias("n_tokens"), F.explode("tokens").alias("token"))
        .groupBy("id", "n_tokens", "token")
        .agg((F.count("*") / F.col("n_tokens")).alias("tf"))
        .select("id", "token", "tf")
    )


def doc_count(corpus: DataFrame) -> DataFrame:
    """One-row DataFrame(n BIGINT) -- kept as a plan node (broadcastable),
    not a driver value, so IDF stays a single declarative plan."""
    return corpus.agg(F.count("*").alias("n_docs"))


def idf_table(corpus_tok: DataFrame) -> DataFrame:
    """(id, tokens)* -> (token, df, idf) with idf = N/df (non-log).

    ``array_distinct`` BEFORE explode pre-aggregates per doc (the
    reference's per-doc ``distinct``, EntityResolution.scala:117), so the
    shuffle carries one row per (doc, distinct token). The corpus size
    joins in as a broadcast single-row cross join -- no collect().
    """
    df_counts = (
        corpus_tok.select(F.explode(F.array_distinct("tokens")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("df"))
    )
    n = doc_count(corpus_tok)
    return df_counts.crossJoin(F.broadcast(n)).select(
        "token", "df", (F.col("n_docs") / F.col("df")).alias("idf")
    )


def tfidf_weights(tok_df: DataFrame, idf_df: DataFrame, broadcast_idf: bool = True) -> DataFrame:
    """(id, tokens) x (token, idf) -> (id, token, weight = tf*idf).

    Replaces reference calculateTF_IDF / calculateTF_IDFBroadcast
    (EntityResolution.scala:340-366, ScalableEntityResolution.scala:264-277;
    the latter is O(|vocab|) per doc -- this join is O(|doc tokens|)).
    Vocabulary is tiny relative to the corpus, so broadcast by default; at
    extreme vocab sizes pass broadcast_idf=False for a shuffle join (AQE
    will still pick broadcast if the stats allow).
    """
    tf = term_frequencies(tok_df)
    idf_side = F.broadcast(idf_df) if broadcast_idf else idf_df
    return tf.join(idf_side, "token").select(
        "id", "token", (F.col("tf") * F.col("idf")).alias("weight")
    )


def norms(weights: DataFrame) -> DataFrame:
    """(id, token, weight) -> (id, norm = sqrt(sum w^2)). Stays distributed
    (the reference collects norms to the driver and re-broadcasts,
    ScalableEntityResolution.scala:32-35)."""
    return weights.groupBy("id").agg(
        F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("norm")
    )


def weights_as_map(weights: DataFrame) -> DataFrame:
    """Convenience view (id, vector MAP<STRING,DOUBLE>) of the canonical
    exploded form, for API parity with the reference's sparse-map vectors."""
    return weights.groupBy("id").agg(
        F.map_from_entries(F.collect_list(F.struct("token", "weight"))).alias("vector")
    )
