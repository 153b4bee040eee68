from .tfidf import corpus_union, idf_table, norms, term_frequencies, tfidf_weights, tokenized
from .similarity import (
    common_token_pairs,
    cosine_similarity_join,
    cross_cosine_similarity,
    document_similarity,
    inverted_index,
    pair_similarity_lookup,
)

__all__ = [
    "tokenized",
    "corpus_union",
    "term_frequencies",
    "idf_table",
    "tfidf_weights",
    "norms",
    "inverted_index",
    "common_token_pairs",
    "cosine_similarity_join",
    "cross_cosine_similarity",
    "pair_similarity_lookup",
    "document_similarity",
]
