"""Distributed BPE (byte-pair-encoding) vocabulary induction.

The tokenizer-training step of an LLM data pipeline: learn merge rules
from corpus statistics. The key scale property is that BPE never needs
the corpus after one counting pass -- it operates on the WORD-COUNT
table (one row per distinct word, weighted by frequency), which is
vocabulary-sized: a 100 TB corpus collapses to millions of rows at the
first partial aggregation and every merge round runs on that small
table.

Per merge round:

* adjacent symbol pairs form IN-ROW (``zip_with`` of the symbol array
  with its shift -- same no-self-join shape as bigram mining), weighted
  by word count;
* one partial-agg ``groupBy(pair)`` shuffle over the vocab-sized table;
* the single best pair comes to the driver (one row -- the legitimate
  driver materialization, like the reference's metric tables), chosen
  deterministically: max count, ties broken lexicographically;
* the merge applies map-side via an ``aggregate`` higher-order fold
  that rebuilds each symbol array left-to-right (standard greedy BPE
  application), entirely in codegen-able expressions -- no Python in
  the loop;
* lineage is truncated per round with an eager ``localCheckpoint``
  (same driver-OOM story as iterative connected components).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.arrays import adjacent_pairs

# SentencePiece-style escape for marker characters that occur INSIDE
# corpus words: without it an interior U+2581 is indistinguishable from
# a word boundary (learned rules would cross into it; decode-by-
# replacing-the-marker would strip real content). Words containing the
# literal escape string itself are a documented non-goal (match
# SentencePiece, which has the same caveat for its <0x..> forms).
MARKER_ESCAPE = "<0x2581>"

def _chars(s: Column) -> Column:
    """Per-CODEPOINT character array. Deliberately not a regex split:
    Spark's regex path runs over UTF-16, where a lookahead split lands
    between surrogate halves and destroys every supplementary-plane
    character (emoji, CJK extensions) into invalid fragments.
    ``length``/``substring`` run on UTF8String characters, i.e. whole
    codepoints. The explicit empty guard matters because sequence(1, 0)
    would generate a DESCENDING range, not an empty one."""
    return F.when(
        F.length(s) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(s)),
            lambda i: F.substring(s, i, F.lit(1)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _to_symbols(word: Column, marker: str) -> Column:
    """marker + per-character (codepoint-safe) symbols of ``word``, with
    pre-existing marker characters escaped. One definition shared by
    learn and segment so the symbol alphabet cannot diverge."""
    escaped = F.replace(word, F.lit(marker), F.lit(MARKER_ESCAPE))
    return F.concat(F.array(F.lit(marker)), _chars(escaped))


def words_to_symbols(tok_df: DataFrame, marker: str = "▁") -> DataFrame:
    """(word, n_occurrences, symbols) from a tokenized corpus
    (id, tokens): ONE corpus pass -- the count groupBy -- then a map-only
    split of each distinct word into characters, with ``marker``
    (SentencePiece-style) prepended so merges cannot cross word
    boundaries when vocab entries are later re-applied. NULL and empty
    tokens are dropped (they carry no pairs and would otherwise pollute
    the vocabulary with a bare-marker entry)."""
    words = (
        tok_df.select(F.explode("tokens").alias("word"))
        .where(F.col("word").isNotNull() & (F.col("word") != ""))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    return words.select(
        "word", "n_occ", _to_symbols(F.col("word"), marker).alias("symbols")
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair counts over the symbol arrays, weighted by word
    frequency; pairs form in-row via zip_with against the shifted array."""
    return (
        vocab.select(
            "n_occ", F.explode(adjacent_pairs(F.col("symbols"))).alias("p")
        )
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("n_occ").alias("n"))
    )


def _apply_merge(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) into one
    symbol, as a pure expression fold: walk the array, and when the
    accumulated tail is `left` and the next element is `right`, replace
    the tail with the concatenation."""
    merged = F.lit(left + right)
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(merged),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_learn(
    tok_df: DataFrame,
    n_merges: int,
    min_pair_count: int = 2,
    marker: str = "▁",
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn up to ``n_merges`` BPE merge rules. Returns (merges, vocab)
    where ``merges`` is the ordered rule list [(left, right), ...] and
    ``vocab`` the final (word, n_occ, symbols) table. Stops early when
    no pair reaches ``min_pair_count``.

    Determinism: best pair = max weighted count, ties broken by
    (left, right) lexicographic order -- reproducible on any engine or
    partitioning (counts are exact integers).
    """
    vocab = words_to_symbols(tok_df, marker).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.col("n").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_pair_count:
            break
        left, right = best[0]["left"], best[0]["right"]
        merges.append((left, right))
        vocab = vocab.select(
            "word",
            "n_occ",
            _apply_merge(F.col("symbols"), left, right).alias("symbols"),
        ).localCheckpoint(eager=True)
    return merges, vocab


def bpe_segment(
    tok_df: DataFrame, merges: list[tuple[str, str]], marker: str = "▁"
) -> DataFrame:
    """Apply learned merge rules to a corpus: (id, tokens) ->
    (id, pieces ARRAY<STRING>) where each word is segmented by replaying
    the rules in learned order. Entirely IN-ROW (transform over the
    token array, merges folded per word) -- map-only, order-preserving,
    zero shuffles: at 100 TB this is a scan-speed projection like
    tokenization itself.

    The rule list rides in the plan as nested expressions, so plan depth
    grows with ``len(merges)`` -- fine for the moderate rule counts this
    expression path targets; a production 30k-merge tokenizer would
    replay rules with a trie inside an Arrow ``mapInPandas`` stage
    instead (same contract, Python-side fold).

    NULL and empty tokens are skipped (a single NULL element would
    otherwise null out flatten() and silently drop the whole document's
    pieces; an empty token would fabricate a bare-marker word boundary).
    """

    def seg(t: Column) -> Column:
        symbols = _to_symbols(t, marker)
        for left, right in merges:
            symbols = _apply_merge(symbols, left, right)
        return symbols

    clean = F.filter(
        F.col("tokens"), lambda x: x.isNotNull() & (x != F.lit(""))
    )
    return tok_df.select(
        "id", F.flatten(F.transform(clean, seg)).alias("pieces")
    )


SEGMENT_SCHEMA = "id BIGINT, pieces ARRAY<STRING>"


def bpe_segment_pandas(
    tok_df: DataFrame, merges: list[tuple[str, str]], marker: str = "▁"
) -> DataFrame:
    """Production-scale twin of :func:`bpe_segment`: replays the merge
    rules in Python inside an Arrow ``mapInPandas`` stage instead of
    nested expressions, so rule lists of tokenizer size (30k+) don't
    grow the plan at all -- the rules ride once per worker in the
    closure. Per-word segmentations are memoized within each batch
    (corpus word frequency is Zipfian, so the cache hit rate is high).

    Still map-only and order-preserving; output is EXACTLY
    ``bpe_segment``'s (property-tested), including marker escaping,
    codepoint splitting, and NULL/empty-token skipping.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}

    def _segment_word(word: str, cache: dict) -> list[str]:
        hit = cache.get(word)
        if hit is not None:
            return hit
        syms = [marker] + list(word.replace(marker, MARKER_ESCAPE))
        # Rank-priority iteration (the standard fast BPE apply):
        # repeatedly merge the LOWEST-rank pair present, each
        # application greedy left-to-right over all its occurrences.
        # Cost is O(word_len^2) independent of rule-list size (vs one
        # scan PER RULE for in-order replay -- ruinous at 30k rules).
        # Equivalent to in-order replay because applying rule j can
        # never create a match for an earlier rule i < j: rule j's
        # merged symbol did not exist when rule i was learned, so it
        # cannot be a component of rule i's pair.
        while len(syms) >= 2:
            best = min(
                (
                    r
                    for r in (
                        ranks.get((a, b)) for a, b in zip(syms, syms[1:])
                    )
                    if r is not None
                ),
                default=None,
            )
            if best is None:
                break
            left, right = merges[best]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        cache[word] = syms
        return syms

    def _batches(it):
        import pandas as pd

        cache: dict = {}
        for pdf in it:
            pieces = [
                # a NULL tokens ARRAY stays NULL (parity with the
                # expression path, where flatten propagates it); NULL
                # and empty ELEMENTS are skipped
                None
                if toks is None
                else [
                    p
                    for w in toks
                    if w is not None and w != ""
                    for p in _segment_word(w, cache)
                ]
                for toks in pdf["tokens"]
            ]
            yield pd.DataFrame({"id": pdf["id"].astype("int64"), "pieces": pieces})

    return tok_df.select("id", "tokens").mapInPandas(_batches, SEGMENT_SCHEMA)
