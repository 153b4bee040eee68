"""Degenerate-input robustness: null text, empty text, all-stopword
docs, and single-doc corpora must flow through the text operators
without errors -- real 100 TB corpora contain all of these.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkbigdatatextanalysis_spark.operators import dedup as dd
from sparkbigdatatextanalysis_spark.operators import similarity as sim
from sparkbigdatatextanalysis_spark.operators import textstats as ts
from sparkbigdatatextanalysis_spark.operators import tfidf as tfidf_ops


@pytest.fixture(scope="module")
def degenerate_docs(spark):
    return spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "the and of to a"),  # all stopwords
            (4, "solid normal document text here"),
            (5, "solid normal document text here"),  # exact dup of 4
            (6, "!!! ??? ..."),  # no word chars at all
        ],
        "doc_id BIGINT, text STRING",
    )


def test_tokenize_degenerates(spark, degenerate_docs):
    tok = tfidf_ops.tokenized(
        degenerate_docs.select(F.col("doc_id").alias("id"), "text")
    )
    got = {r["id"]: r["tokens"] for r in tok.collect()}
    assert got[1] is None or got[1] == []  # null text -> null/empty, no crash
    assert got[2] == []
    assert got[3] == []
    assert got[4] == ["solid", "normal", "document", "text"]  # 'here' is a stopword
    assert got[6] == []


def test_tfidf_drops_tokenless_docs_without_error(spark, degenerate_docs):
    tok = tfidf_ops.tokenized(
        degenerate_docs.select(F.col("doc_id").alias("id"), "text")
    ).where(F.col("tokens").isNotNull())
    idf = tfidf_ops.idf_table(tok)
    w = tfidf_ops.tfidf_weights(tok, idf)
    ids = {r["id"] for r in w.select("id").distinct().collect()}
    assert ids == {4, 5}  # only docs with surviving tokens carry weights


def test_similarity_join_on_degenerate_corpus(spark, degenerate_docs):
    tok = tfidf_ops.tokenized(
        degenerate_docs.select(F.col("doc_id").alias("id"), "text")
    ).where(F.col("tokens").isNotNull())
    idf = tfidf_ops.idf_table(tok)
    w = tfidf_ops.tfidf_weights(tok, idf)
    wa = w.where(F.col("id") % 2 == 0)
    wb = w.where(F.col("id") % 2 == 1)
    out = sim.cosine_similarity_join(wa, wb).collect()
    # docs 4 (even) and 5 (odd) are identical -> exactly one pair, sim 1
    assert len(out) == 1
    assert out[0]["a_id"] == 4 and out[0]["b_id"] == 5
    assert abs(out[0]["sim"] - 1.0) < 1e-9


def test_exact_dedup_handles_null_and_empty(spark, degenerate_docs):
    out = dd.exact_dedup(degenerate_docs.where(F.col("text").isNotNull()))
    rows = {r["doc_id"]: r["keep"] for r in out.collect()}
    assert rows[4] is True and rows[5] is False  # min-id wins the dup group
    assert rows[2] is True and rows[3] is True and rows[6] is True


def test_textstats_on_degenerates(spark, degenerate_docs):
    safe = degenerate_docs.where(F.col("text").isNotNull())
    q = ts.text_quality(safe)
    assert q.count() == safe.count()
    lang = ts.language_id(safe)
    assert lang.count() == safe.count()


def test_cross_engine_hash_unicode_parity(spark):
    """string_hash31 must agree between Spark and DuckDB on non-ASCII
    input (both md5 over UTF-8 bytes) -- the synthetic corpora are
    ASCII-only, so this path would otherwise go untested."""
    import duckdb

    from sparkbigdatatextanalysis_spark.functions.hashing import (
        string_hash31,
        string_hash31_sql,
    )

    samples = [
        "hello", "héllo wörld", "日本語テキスト", "emoji 🚀 test",
        "mixed Ω≈ç√", "кириллица",
    ]
    sdf = spark.createDataFrame([(s,) for s in samples], "s STRING").select(
        "s", string_hash31("s").alias("h")
    )
    got = {r["s"]: r["h"] for r in sdf.collect()}
    con = duckdb.connect()
    for s in samples:
        lit = "'" + s.replace("'", "''") + "'"
        (oh,) = con.execute(f"SELECT {string_hash31_sql(lit)}").fetchone()
        assert got[s] == oh, s


def test_minhash_on_degenerates(spark, degenerate_docs):
    safe = degenerate_docs.where(F.col("text").isNotNull())
    pairs = dd.minhash_lsh_pairs(safe)
    got = {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    assert (4, 5) in got  # identical docs must land in the same buckets


def test_threshold_sweep_empty_gold(spark):
    """An empty gold-standard table yields NULL recall (not an ANSI
    divide-by-zero crash)."""
    from sparkbigdatatextanalysis_spark.operators.evaluation import threshold_sweep

    sims = spark.createDataFrame(
        [(1, 2, 0.5), (3, 4, 0.9)], "a_id LONG, b_id LONG, sim DOUBLE"
    )
    gold = spark.createDataFrame([], "a_id LONG, b_id LONG")
    rows = threshold_sweep(sims, gold).collect()
    assert len(rows) == 101
    assert all(r["recall"] is None for r in rows)
    assert all(r["fn"] == 0 for r in rows)
