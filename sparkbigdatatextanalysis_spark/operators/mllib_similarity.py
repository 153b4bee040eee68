"""MLlib library paths for similarity / dedup at cluster scale.

The expression-level operators (tfidf.py, similarity.py, dedup.py) are
the oracle-checked engine surface with exact reference semantics (incl.
the non-log IDF, SURVEY.md §1). This module exposes the equivalent
**MLlib estimator pipelines** -- the battle-tested library path a 100 TB
deployment would choose when exact value-parity with the reference is
not required:

* TF-IDF via HashingTF + IDF. NB MLlib IDF is log((N+1)/(df+1)) -- NOT
  the reference's N/df -- so this path is deliberately outside the
  DuckDB-oracle surface.
* MinHashLSH.approxSimilarityJoin over shingle count-vectors: the
  library form of dedup.minhash_lsh_pairs (Jaccard distance).
* BucketedRandomProjectionLSH over embeddings: the library form of
  ann.cosine_topk_lsh (euclidean buckets; on L2-normalized vectors
  euclidean and cosine orderings agree).

All three are estimator->transformer pipelines: fit() computes sketch
parameters distributed, transform() is a map-only stage, and the approx
joins are bucket equi-joins -- the same shuffle shape as the hand-built
operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize_no_stopwords


def _require_mllib():
    from pyspark.ml.feature import IDF, HashingTF  # noqa: F401

    return True


def tfidf_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_features: int = 1 << 18,
) -> DataFrame:
    """(id, text) -> (id, features VectorUDT): HashingTF + log-IDF.
    Hashed dimensionality trades exactness for a fixed-width vector (no
    vocabulary build pass -- the property that matters at 100 TB)."""
    from pyspark.ml.feature import IDF, HashingTF

    tok = docs.select(
        F.col(id_col).alias("id"),
        tokenize_no_stopwords(text_col).alias("tokens"),
    )
    tf = HashingTF(
        inputCol="tokens", outputCol="rawFeatures", numFeatures=num_features
    ).transform(tok)
    idf_model = IDF(inputCol="rawFeatures", outputCol="features").fit(tf)
    return idf_model.transform(tf).select("id", "features")


def minhash_lsh_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hash_tables: int = 8,
    max_jaccard_distance: float = 0.6,
    seed: int = 42,
) -> DataFrame:
    """Library-path near-dup candidates: token shingles -> binary
    count-vectors -> MinHashLSH.approxSimilarityJoin. Returns
    (a_id, b_id, jaccard_distance) with a_id < b_id."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    from ..functions.hashing import word_shingles

    sh = docs.select(
        F.col(id_col).alias("id"),
        tokenize_no_stopwords(text_col).alias("tokens"),
    ).select(
        "id", word_shingles("tokens", shingle_n).alias("shingles")
    ).where(F.size("shingles") > 0)
    cv_model = CountVectorizer(
        inputCol="shingles", outputCol="features", binary=True
    ).fit(sh)
    vecs = cv_model.transform(sh).select("id", "features")
    lsh = MinHashLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(vecs)
    joined = lsh.approxSimilarityJoin(
        vecs, vecs, max_jaccard_distance, distCol="jaccard_distance"
    )
    return joined.select(
        F.col("datasetA.id").alias("a_id"),
        F.col("datasetB.id").alias("b_id"),
        "jaccard_distance",
    ).where(F.col("a_id") < F.col("b_id"))


def brp_lsh_neighbors(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bucket_length: float = 1.0,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Library-path ANN: L2-normalize, BucketedRandomProjectionLSH,
    per-query k nearest by euclidean distance (== cosine ordering on
    normalized vectors). ``queries`` is a 1-column id DataFrame.
    Returns (q_id, n_id, dist)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    vecs = emb.select(
        F.col(id_col).alias("id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("raw"),
    )
    normed = Normalizer(inputCol="raw", outputCol="features", p=2.0).transform(
        vecs
    ).select("id", "features")
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(normed)
    qv = normed.join(
        F.broadcast(queries.select(F.col(queries.columns[0]).alias("id"))), "id"
    )
    joined = lsh.approxSimilarityJoin(qv, normed, float("inf"), distCol="dist")
    pairs = joined.select(
        F.col("datasetA.id").alias("q_id"),
        F.col("datasetB.id").alias("n_id"),
        "dist",
    ).where(F.col("q_id") != F.col("n_id"))
    w = Window.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col("n_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "dist", "rank")
    )
