"""Property-based invariants (SURVEY.md §5): hypothesis generates
adversarial documents (unicode, punctuation runs, empties, nulls) and the
engine's math invariants must hold on whatever comes out.

Each property collects one generated corpus into ONE DataFrame and
asserts the invariant as an aggregation, so a property costs one Spark
job, not one per example.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sparkbigdatatextanalysis_spark.functions.text import tokenize_no_stopwords
from sparkbigdatatextanalysis_spark.operators import dedup as dd
from sparkbigdatatextanalysis_spark.operators import similarity as sim
from sparkbigdatatextanalysis_spark.operators import tfidf as tfidf_ops

TEXT = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=80,
)
CORPUS = st.lists(st.one_of(TEXT, st.none()), min_size=2, max_size=25)

PROP = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id LONG, text STRING"
    )


@PROP
@given(texts=CORPUS)
def test_tokens_are_word_chars_only(spark, texts):
    toks = _docs_df(spark, texts).select(
        F.explode(tokenize_no_stopwords("text")).alias("t")
    )
    bad = toks.where(
        (F.col("t") == "") | F.col("t").rlike(r"\W") | (F.col("t") != F.lower("t"))
    ).count()
    assert bad == 0


@PROP
@given(texts=CORPUS)
def test_term_frequencies_sum_to_one(spark, texts):
    tok = tfidf_ops.tokenized(_docs_df(spark, texts))
    tf = tfidf_ops.term_frequencies(tok)
    off = (
        tf.groupBy("id")
        .agg(F.abs(F.sum("tf") - 1.0).alias("err"))
        .where(F.col("err") > 1e-9)
        .count()
    )
    assert off == 0


@PROP
@given(texts=CORPUS)
def test_idf_bounds(spark, texts):
    tok = tfidf_ops.tokenized(_docs_df(spark, texts))
    idf = tfidf_ops.idf_table(tok)
    n = tok.count()
    bad = idf.where(
        (F.col("df") < 1) | (F.col("df") > n) | (F.col("idf") < 1.0 - 1e-12)
    ).count()
    assert bad == 0


@PROP
@given(texts=CORPUS)
def test_cosine_in_unit_interval(spark, texts):
    tok = tfidf_ops.tokenized(_docs_df(spark, texts))
    idf = tfidf_ops.idf_table(tok)
    w = tfidf_ops.tfidf_weights(tok, idf)
    wa = w.where(F.col("id") % 2 == 0)
    wb = w.where(F.col("id") % 2 == 1)
    sims = sim.cosine_similarity_join(wa, wb)
    bad = sims.where(
        (F.col("sim") <= 0) | (F.col("sim") > 1.0 + 1e-9) | F.isnan("sim")
    ).count()
    assert bad == 0


@PROP
@given(texts=CORPUS)
def test_exact_dedup_one_representative_per_group(spark, texts):
    docs = _docs_df(spark, texts).where(F.col("text").isNotNull())
    d = dd.exact_dedup(docs, id_col="id")
    per_group = d.groupBy("content_hash").agg(
        F.sum(F.col("keep").cast("int")).alias("kept")
    )
    assert per_group.where(F.col("kept") != 1).count() == 0


@PROP
@given(texts=CORPUS)
def test_jaccard_bounds_and_symmetric_key_order(spark, texts):
    docs = _docs_df(spark, texts).where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    pairs = dd.ngram_jaccard_pairs(docs, id_col="id")
    bad = pairs.where(
        (F.col("jaccard") <= 0)
        | (F.col("jaccard") > 1.0 + 1e-12)
        | (F.col("a_id") >= F.col("b_id"))
    ).count()
    assert bad == 0


@PROP
@given(texts=CORPUS)
def test_dedup_lines_preserves_docs_and_is_idempotent(spark, texts):
    """Line dedup never loses a document (NULL text included) and is a
    fixpoint: survivors' corpus-wide counts only shrink, so a second
    application removes nothing and reproduces the text verbatim."""
    from sparkbigdatatextanalysis_spark.operators import pipeline as pl

    docs = _docs_df(spark, texts)
    once = pl.dedup_lines(docs, id_col="id").collect()
    assert {r["id"] for r in once} == set(range(len(texts)))

    again = pl.dedup_lines(
        spark.createDataFrame(
            [(r["id"], r["text_dedup"]) for r in once], "id LONG, text STRING"
        ),
        id_col="id",
    ).collect()
    got_once = {r["id"]: r["text_dedup"] for r in once}
    for r in again:
        assert r["n_removed"] == 0, (r, got_once[r["id"]])
        assert r["text_dedup"] == got_once[r["id"]]


# --- winnowing guarantee (dedup.duplicate_spans) ---------------------------

_REPEAT = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    min_size=39,  # width + window - 1 with the defaults (25, 15)
    max_size=120,
)
_FILLER = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=60,
)


@PROP
@given(repeat=_REPEAT, pre_a=_FILLER, post_a=_FILLER, pre_b=_FILLER, post_b=_FILLER)
def test_winnowing_guarantee_planted_repeat_always_detected(
    spark, repeat, pre_a, post_a, pre_b, post_b
):
    """The MOSS guarantee, adversarially: ANY substring of length >=
    width + window - 1 planted into two documents at arbitrary offsets
    (hypothesis picks unicode fillers of arbitrary length, so the two
    alignments are unrelated) must produce at least one duplicate span
    in BOTH documents (extra spans from accidental filler repeats are
    legitimate and not constrained here)."""
    docs = spark.createDataFrame(
        [
            (1, pre_a + repeat + post_a),
            (2, pre_b + repeat + post_b),
        ],
        "doc_id LONG, text STRING",
    )
    spans = dd.duplicate_spans(docs).collect()
    got_docs = {r["doc_id"] for r in spans}
    assert got_docs == {1, 2}, (
        f"planted {len(repeat)}-char repeat missed (filler lens "
        f"{len(pre_a)}/{len(pre_b)}); spans={spans}"
    )


# --- round-8 operator invariants --------------------------------------------

INTS = st.lists(
    st.tuples(st.integers(0, 10**6), st.integers(-5, 10**4)),
    min_size=2,
    max_size=40,
    unique_by=lambda t: t[0],
)


@PROP
@given(rows=INTS)
def test_global_rank_is_a_permutation_and_orders_keys(spark, rows):
    """Ranks are exactly 1..n, and a higher-ranked row never carries a
    smaller (key, id) tuple -- on arbitrary integer keys with ties."""
    from sparkbigdatatextanalysis_spark.operators import relational as rel

    df = spark.createDataFrame(rows, "id LONG, k LONG")
    out = rel.global_rank(df, "k", "id", n_buckets=4).collect()
    ranks = sorted(r["global_rank"] for r in out)
    assert ranks == list(range(1, len(rows) + 1))
    by_rank = sorted(out, key=lambda r: r["global_rank"])
    keys = [(r["k"], r["id"]) for r in by_rank]
    assert keys == sorted(keys)


@PROP
@given(rows=INTS)
def test_weighted_sample_keeps_exactly_min_k_n(spark, rows):
    """Global weighted sampling returns exactly min(k, n) rows and the
    kept priorities are the k smallest in the whole pool."""
    from sparkbigdatatextanalysis_spark.operators import pipeline as pl

    df = spark.createDataFrame(rows, "doc_id LONG, w LONG")
    k = 7
    out = pl.weighted_priority_sample(df, "w", k=k).collect()
    assert len(out) == min(k, len(rows))
    # k = pool size, NOT a huge constant: the global branch is a
    # TakeOrdered whose heap is O(k) regardless of input size
    all_pri = {
        r["priority"]
        for r in pl.weighted_priority_sample(df, "w", k=len(rows)).collect()
    }
    kept = {r["priority"] for r in out}
    assert kept == set(sorted(all_pri)[: len(out)])


EDGES = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=1,
    max_size=60,
)


@PROP
@given(pairs=EDGES)
def test_triangle_counts_match_bruteforce_on_random_graphs(spark, pairs):
    """Distributed degree-ordered enumeration equals the O(n^3) python
    count on arbitrary small graphs (self-loops/dupes included)."""
    import itertools

    from sparkbigdatatextanalysis_spark.operators import components as cc

    df = spark.createDataFrame(pairs, "a_id LONG, b_id LONG")
    out = cc.count_triangles(df, "a_id", "b_id").collect()
    adj: dict[int, set[int]] = {}
    for x, y in pairs:
        if x == y:
            continue
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    per_node = {n: 0 for n in adj}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                per_node[n] += 1
    got = {r["node"]: r["n_triangles"] for r in out}
    assert got == per_node
    degs = {r["node"]: r["degree"] for r in out}
    assert degs == {n: len(v) for n, v in adj.items()}


@PROP
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10**6), st.one_of(st.none(), st.text(max_size=5))),
        min_size=1,
        max_size=30,
    )
)
def test_reconcile_identical_tables_always_match(spark, rows):
    """A table reconciled against a row-order permutation of itself
    matches on every bucket -- arbitrary content incl. NULLs."""
    from sparkbigdatatextanalysis_spark.operators import profile as pf

    df = spark.createDataFrame(
        [(f"b{b}", i, v) for b, i, v in rows], "bucket STRING, id LONG, v STRING"
    )
    out = pf.reconcile_tables(
        df, df.repartition(5), "bucket", ["id", "v"]
    ).collect()
    assert all(r["rows_match"] == 1 and r["checksum_match"] == 1 for r in out)
