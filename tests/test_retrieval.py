"""BM25 retrieval (operators/retrieval.py) vs a straight-line Python
reference of the Okapi/+1-smoothed-IDF formula."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from sparkbigdatatextanalysis_spark.operators import retrieval as rt

K1, B = 1.2, 0.75


def _ref_bm25(corpus: dict[int, list[str]], query: list[str]):
    n = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n
    out = {}
    for did, toks in corpus.items():
        score, matched = 0.0, 0
        for t in dict.fromkeys(query):
            tf = toks.count(t)
            if tf == 0:
                continue
            df = sum(1 for ts in corpus.values() if t in ts)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            score += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(toks) / avgdl))
            matched += 1
        if matched:
            out[did] = (matched, score)
    return out


CORPUS = {
    0: ["hash", "join", "hash", "scan"],
    1: ["join", "sort"],
    2: ["dup", "dup", "hash"],
    3: ["sort", "scan", "filter"],
    4: ["hash"],
}


def _tok_df(spark):
    return spark.createDataFrame(
        [Row(id=i, tokens=t) for i, t in CORPUS.items()]
    )


def test_bm25_matches_reference(spark):
    got = {
        r["id"]: (r["n_matched"], r["score"])
        for r in rt.bm25_scores(_tok_df(spark), ["hash", "dup"], K1, B).collect()
    }
    ref = _ref_bm25(CORPUS, ["hash", "dup"])
    assert set(got) == set(ref)
    for did, (m, s) in ref.items():
        assert got[did][0] == m
        assert got[did][1] == pytest.approx(s, rel=1e-12)


def test_bm25_rare_term_outranks_common(spark):
    # idf('dup') >> idf('hash'): the doc holding the rare term must top
    # the ranking even though others match the common term more often
    top = rt.bm25_topk(_tok_df(spark), ["hash", "dup"], k=3)
    rows = sorted(top.collect(), key=lambda r: r["rank"])
    assert rows[0]["id"] == 2
    assert [r["rank"] for r in rows] == [1, 2, 3]


def test_bm25_duplicate_query_terms_count_once(spark):
    once = rt.bm25_scores(_tok_df(spark), ["hash"]).collect()
    twice = rt.bm25_scores(_tok_df(spark), ["hash", "hash"]).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, twice))


def test_bm25_non_matching_docs_absent_and_guards(spark):
    got = {r["id"] for r in rt.bm25_scores(_tok_df(spark), ["dup"]).collect()}
    assert got == {2}
    with pytest.raises(ValueError, match="non-empty"):
        rt.bm25_scores(_tok_df(spark), [])
    with pytest.raises(ValueError, match="k1"):
        rt.bm25_scores(_tok_df(spark), ["hash"], k1=-1)
