"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps every implemented operator from SURVEY.md §2 to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the DuckDB
equivalent over the same parquet tables. Column names and value rounding
are aligned on both sides so the driver's order-insensitive value hash
matches: exact integer/string columns stay exact, and any float produced
by a SUM (summation order differs between engines) is rounded to 6-9
decimals on both sides. Floats produced by pure scalar arithmetic on
identical inputs (tf = cnt/n, idf = N/df, weight = tf*idf) are
bit-identical across engines and stay unrounded.

Document "catalogs" for the entity-resolution operators: catalog A =
documents with even doc_id, catalog B = odd doc_id; the gold-standard
analog pairs each even doc with its successor (a_id, a_id+1).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkbigdatatextanalysis_spark.functions.text import ENGLISH_STOPWORDS
from sparkbigdatatextanalysis_spark.operators import evaluation as ev
from sparkbigdatatextanalysis_spark.operators import similarity as sim
from sparkbigdatatextanalysis_spark.operators import tfidf as tfidf_ops

SF0001 = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# Spark-side building blocks
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All documents tokenized (stopwords removed): (id=doc_id, tokens)."""
    d = _docs(spark, sf_dir).select(F.col("doc_id").alias("id"), "text")
    return tfidf_ops.tokenized(d)


def _tok_ab(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    tok = _tok(spark, sf_dir)
    return tok.where(F.col("id") % 2 == 0), tok.where(F.col("id") % 2 == 1)


def _idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_ops.idf_table(_tok(spark, sf_dir))


def _weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_ops.tfidf_weights(_tok(spark, sf_dir), _idf(spark, sf_dir))


def _weights_ab(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    w = _weights(spark, sf_dir)
    return w.where(F.col("id") % 2 == 0), w.where(F.col("id") % 2 == 1)


def _sims(spark: SparkSession, sf_dir: str) -> DataFrame:
    wa, wb = _weights_ab(spark, sf_dir)
    return sim.cosine_similarity_join(wa, wb)


def _gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.where(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("a_id"), (F.col("doc_id") + 1).alias("b_id")
    )


def _round6(df: DataFrame, *cols: str) -> DataFrame:
    out = df
    for c in cols:
        out = out.withColumn(c, F.round(F.col(c), 6))
    return out


# ---------------------------------------------------------------------------
# queries()
# ---------------------------------------------------------------------------


def q_scan_concat(spark, sf_dir):
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    return p.select(
        "p_partkey", F.concat_ws(" ", "p_name", "p_brand", "p_type").alias("text")
    )


def q_str_strip_quotes(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", F.regexp_replace(F.col("text"), '"', "").alias("clean_text")
    )


def q_tokenize(spark, sf_dir):
    d = _docs(spark, sf_dir).select(F.col("doc_id").alias("id"), "text")
    t = tfidf_ops.tokenized(d, keep_stopwords=True)
    return t.select(F.col("id").alias("doc_id"), F.explode("tokens").alias("token"))


def q_tokenize_stopwords(spark, sf_dir):
    return _tok(spark, sf_dir).select(
        F.col("id").alias("doc_id"), F.explode("tokens").alias("token")
    )


def q_term_frequencies(spark, sf_dir):
    tf = tfidf_ops.term_frequencies(_tok(spark, sf_dir))
    return tf.select(F.col("id").alias("doc_id"), "token", "tf")


def q_idf_dict(spark, sf_dir):
    return _idf(spark, sf_dir).select("token", "df", "idf")


def q_tfidf_vectors(spark, sf_dir):
    w = _weights(spark, sf_dir)
    return w.select(F.col("id").alias("doc_id"), "token", "weight")


def q_l2_norm(spark, sf_dir):
    n = tfidf_ops.norms(_weights(spark, sf_dir))
    return _round6(n.select(F.col("id").alias("doc_id"), "norm"), "norm")


def q_inverted_index(spark, sf_dir):
    idx = sim.inverted_index(_tok(spark, sf_dir))
    return idx.select("token", F.col("id").alias("doc_id"))


def q_common_token_pairs(spark, sf_dir):
    ta, tb = _tok_ab(spark, sf_dir)
    return sim.common_token_pairs(sim.inverted_index(ta), sim.inverted_index(tb))


def q_fast_cosine_join(spark, sf_dir):
    return _round6(_sims(spark, sf_dir), "sim")


def q_cross_similarity(spark, sf_dir):
    wa, wb = _weights_ab(spark, sf_dir)
    ta, tb = _tok_ab(spark, sf_dir)
    out = sim.cross_cosine_similarity(wa, wb, ids_a=ta.select("id"), ids_b=tb.select("id"))
    return _round6(out, "sim")


def q_filter_pair_lookup(spark, sf_dir):
    return _round6(sim.pair_similarity_lookup(_sims(spark, sf_dir), "2", "3"), "sim")


def q_doc_similarity(spark, sf_dir):
    d = _docs(spark, sf_dir)
    texts = d.where(F.col("doc_id").isin(0, 1)).groupBy().agg(
        F.max(F.when(F.col("doc_id") == 0, F.col("text"))).alias("text_a"),
        F.max(F.when(F.col("doc_id") == 1, F.col("text"))).alias("text_b"),
    )
    idf_map = _idf(spark, sf_dir).agg(
        F.map_from_entries(F.collect_list(F.struct("token", "idf"))).alias("idf_map")
    )
    out = texts.crossJoin(idf_map).select(
        sim.document_similarity(F.col("text_a"), F.col("text_b"), F.col("idf_map")).alias("sim")
    )
    return _round6(out, "sim")


def q_count_tokens(spark, sf_dir):
    return _tok(spark, sf_dir).agg(F.sum(F.size("tokens")).alias("total_tokens"))


def q_top1_by_token_count(spark, sf_dir):
    t = _tok(spark, sf_dir)
    return (
        t.select(F.col("id").alias("doc_id"), F.size("tokens").alias("n_tokens"))
        .orderBy(F.col("n_tokens").desc(), "doc_id")
        .limit(1)
    )


def q_union_corpus(spark, sf_dir):
    ta, tb = _tok_ab(spark, sf_dir)
    corpus = tfidf_ops.corpus_union(ta, tb)
    return corpus.select(F.col("id").alias("doc_id"), F.size("tokens").alias("n_tokens"))


def q_gold_join_eval(spark, sf_dir):
    out = ev.evaluate_gold(_sims(spark, sf_dir), _gold(spark, sf_dir))
    return _round6(out, "avg_sim")


def q_threshold_sweep(spark, sf_dir):
    return ev.threshold_sweep(_sims(spark, sf_dir), _gold(spark, sf_dir))


def q_idf_histogram(spark, sf_dir):
    return ev.idf_histogram(_idf(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "scan_concat": q_scan_concat,
        "str_strip_quotes": q_str_strip_quotes,
        "tokenize": q_tokenize,
        "tokenize_stopwords": q_tokenize_stopwords,
        "term_frequencies": q_term_frequencies,
        "idf_dict": q_idf_dict,
        "tfidf_vectors": q_tfidf_vectors,
        "l2_norm": q_l2_norm,
        "inverted_index": q_inverted_index,
        "common_token_pairs": q_common_token_pairs,
        "fast_cosine_join": q_fast_cosine_join,
        "cross_similarity": q_cross_similarity,
        "filter_pair_lookup": q_filter_pair_lookup,
        "doc_similarity": q_doc_similarity,
        "count_tokens": q_count_tokens,
        "top1_by_token_count": q_top1_by_token_count,
        "union_corpus": q_union_corpus,
        "gold_join_eval": q_gold_join_eval,
        "threshold_sweep": q_threshold_sweep,
        "idf_histogram": q_idf_histogram,
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: token-blocked TF-IDF cosine similarity join between the
    two document catalogs at sf0.001."""
    return q_fast_cosine_join(spark, SF0001)


# ---------------------------------------------------------------------------
# oracle_sql() -- DuckDB dialect, same table views, same column names
# ---------------------------------------------------------------------------

_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS) + "]"

# Tokenization pipeline CTEs shared by most text queries. NB: DuckDB
# regexp_replace needs the 'g' flag to match Spark's replace-all.
_BASE = f"""
tok0 AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '') AS toks
  FROM documents
),
tok AS (
  SELECT doc_id, list_filter(toks, x -> NOT list_contains({_STOP_SQL}, x)) AS toks
  FROM tok0
),
ex AS (
  SELECT doc_id, len(toks) AS n_tokens, unnest(toks) AS token FROM tok
),
tf AS (
  SELECT doc_id, token, count(*) / any_value(n_tokens) AS tf
  FROM ex GROUP BY doc_id, token
),
dfreq AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM ex GROUP BY token
),
ndocs AS (SELECT count(*) AS n_docs FROM tok),
idf AS (SELECT token, df, n_docs / df AS idf FROM dfreq, ndocs),
w AS (
  SELECT tf.doc_id, tf.token, tf.tf * idf.idf AS weight
  FROM tf JOIN idf USING (token)
),
norms AS (SELECT doc_id, sqrt(sum(weight * weight)) AS norm FROM w GROUP BY doc_id)
"""

_SIMS = """
dots AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, sum(a.weight * b.weight) AS dot
  FROM w a JOIN w b USING (token)
  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
  GROUP BY 1, 2
),
sims AS (
  SELECT a_id, b_id, dot / (na.norm * nb.norm) AS sim
  FROM dots
  JOIN norms na ON na.doc_id = a_id
  JOIN norms nb ON nb.doc_id = b_id
)
"""

_GOLD = """
gold AS (
  SELECT doc_id AS a_id, doc_id + 1 AS b_id FROM documents WHERE doc_id % 2 = 0
)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "scan_concat": """
            SELECT p_partkey, concat_ws(' ', p_name, p_brand, p_type) AS text
            FROM part
        """,
        "str_strip_quotes": """
            SELECT doc_id, regexp_replace(text, '"', '', 'g') AS clean_text
            FROM documents
        """,
        "tokenize": """
            WITH tok0 AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '') AS toks
              FROM documents
            )
            SELECT doc_id, unnest(toks) AS token FROM tok0
        """,
        "tokenize_stopwords": f"WITH {_BASE} SELECT doc_id, unnest(toks) AS token FROM tok",
        "term_frequencies": f"WITH {_BASE} SELECT doc_id, token, tf FROM tf",
        "idf_dict": f"WITH {_BASE} SELECT token, df, idf FROM idf",
        "tfidf_vectors": f"WITH {_BASE} SELECT doc_id, token, weight FROM w",
        "l2_norm": f"WITH {_BASE} SELECT doc_id, round(norm, 6) AS norm FROM norms",
        "inverted_index": f"""
            WITH {_BASE}
            SELECT DISTINCT token, doc_id FROM ex
        """,
        "common_token_pairs": f"""
            WITH {_BASE},
            pa AS (SELECT DISTINCT token, doc_id FROM ex WHERE doc_id % 2 = 0),
            pb AS (SELECT DISTINCT token, doc_id FROM ex WHERE doc_id % 2 = 1)
            SELECT pa.doc_id AS a_id, pb.doc_id AS b_id, count(*) AS n_common
            FROM pa JOIN pb USING (token)
            GROUP BY 1, 2
        """,
        "fast_cosine_join": f"""
            WITH {_BASE}, {_SIMS}
            SELECT a_id, b_id, round(sim, 6) AS sim FROM sims
        """,
        "cross_similarity": f"""
            WITH {_BASE}, {_SIMS}
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   round(coalesce(sims.sim, 0.0), 6) AS sim
            FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 0) a
            CROSS JOIN (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) b
            LEFT JOIN sims ON sims.a_id = a.doc_id AND sims.b_id = b.doc_id
        """,
        "filter_pair_lookup": f"""
            WITH {_BASE}, {_SIMS}
            SELECT round(sim, 6) AS sim FROM sims WHERE a_id = 2 AND b_id = 3
        """,
        "doc_similarity": f"""
            WITH {_BASE}, {_SIMS}
            SELECT round(sim, 6) AS sim FROM sims WHERE a_id = 0 AND b_id = 1
        """,
        "count_tokens": f"""
            WITH {_BASE}
            SELECT sum(len(toks))::BIGINT AS total_tokens FROM tok
        """,
        "top1_by_token_count": f"""
            WITH {_BASE}
            SELECT doc_id, len(toks)::INT AS n_tokens FROM tok
            ORDER BY n_tokens DESC, doc_id LIMIT 1
        """,
        "union_corpus": f"""
            WITH {_BASE}
            SELECT doc_id, len(toks)::INT AS n_tokens FROM tok WHERE doc_id % 2 = 0
            UNION ALL
            SELECT doc_id, len(toks)::INT AS n_tokens FROM tok WHERE doc_id % 2 = 1
        """,
        "gold_join_eval": f"""
            WITH {_BASE}, {_SIMS}, {_GOLD}
            SELECT gold.a_id IS NOT NULL AS is_dup,
                   count(*) AS n,
                   round(avg(sim), 6) AS avg_sim
            FROM sims LEFT JOIN gold USING (a_id, b_id)
            GROUP BY 1
        """,
        "threshold_sweep": f"""
            WITH {_BASE}, {_SIMS}, {_GOLD},
            dup_sims AS (
              SELECT gold.a_id, gold.b_id, coalesce(sims.sim, 0.0) AS sim
              FROM gold LEFT JOIN sims USING (a_id, b_id)
            ),
            bins_all AS (
              SELECT least(floor(sim * 100)::BIGINT, 100) AS bin, count(*) AS cnt_all
              FROM sims GROUP BY 1
            ),
            bins_dup AS (
              SELECT least(floor(sim * 100)::BIGINT, 100) AS bin, count(*) AS cnt_dup
              FROM dup_sims GROUP BY 1
            ),
            grid AS (SELECT range AS bin FROM range(0, 101)),
            tot AS (SELECT count(*) AS n_dups FROM dup_sims),
            binned AS (
              SELECT grid.bin,
                     coalesce(cnt_all, 0) AS cnt_all,
                     coalesce(cnt_dup, 0) AS cnt_dup
              FROM grid LEFT JOIN bins_all USING (bin) LEFT JOIN bins_dup USING (bin)
            ),
            cum AS (
              SELECT bin,
                     sum(cnt_all) OVER (ORDER BY bin DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS pred_pos,
                     sum(cnt_dup) OVER (ORDER BY bin DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS tp
              FROM binned
            )
            SELECT bin / 100 AS threshold,
                   tp,
                   pred_pos - tp AS fp,
                   n_dups - tp AS fn,
                   CASE WHEN pred_pos > 0 THEN tp / pred_pos END AS precision,
                   tp / n_dups AS recall,
                   CASE WHEN pred_pos + n_dups > 0
                        THEN 2.0 * tp / (pred_pos + n_dups) END AS fmeasure
            FROM cum, tot
        """,
        "idf_histogram": f"""
            WITH {_BASE},
            stats AS (SELECT min(idf) AS lo, max(idf) AS hi, count(*) AS n FROM idf),
            binned AS (
              SELECT least(floor((idf - lo) / ((hi - lo) / 50))::BIGINT, 49) AS bin, n
              FROM idf, stats
            )
            SELECT bin, count(*) AS cnt, count(*) / any_value(n) AS rel_freq
            FROM binned GROUP BY bin
        """,
    }
