"""Inverted index + conjunctive keyword search over the corpus.

The query capability every corpus store eventually needs: "which
documents contain ALL of these terms, ranked".  Kept deliberately
integer-exact (term frequencies, not floating BM25) so ranking is
bit-identical across engines and shuffle orders; BM25-style weighting
is a downstream projection over the same index rows.

Scale design (100 TB):

* the index is **FLAT** — ``(term, doc_id, tf)`` rows, never
  ``collect_list`` posting arrays: a stopword's posting list is 10^9
  entries, and an array-per-term representation puts all of them in
  one aggregation buffer.  Rows shard naturally; write the index with
  ``.bucketBy(term)`` and search joins are co-located (zero exchange —
  the pattern proven in tests/test_bucketing.py).
* build is ONE explode + ONE groupBy(term, doc_id) with map-side
  partial counts — the hot term combines inside each map task first.
* search filters the index to the query's terms (an IN over a handful
  of literals — pushed to the parquet/bucket scan), then one
  groupBy(doc_id); the conjunction is ``count(distinct term) == n``.
  The final top-k is ``orderBy().limit(k)`` — Spark plans
  TakeOrderedAndProject (per-partition heaps + one k-row merge), never
  a full global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens


def inverted_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(term, doc_id, tf)``: whitespace-token inverted index, flat."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    return toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))


def term_stats(index: DataFrame) -> DataFrame:
    """``(term, df_docs, total_tf)``: per-term document frequency and
    corpus frequency — the IDF inputs, one partial-agg groupBy."""
    return index.groupBy("term").agg(
        F.count("*").alias("df_docs"),
        F.sum("tf").alias("total_tf"),
    )


def keyword_search(
    index: DataFrame, terms: list[str], k: int = 10
) -> DataFrame:
    """Conjunctive (AND) query: docs containing EVERY term in ``terms``,
    ranked by summed term frequency (integer), ties by doc_id.  Returns
    ``(doc_id, n_terms, score)`` — at most ``k`` rows."""
    if not terms:
        raise ValueError("keyword_search needs at least one term")
    hits = index.filter(F.col("term").isin([str(t) for t in terms]))
    scored = (
        hits.groupBy("doc_id")
        .agg(
            F.count_distinct("term").alias("n_terms"),
            F.sum("tf").alias("score"),
        )
        .filter(F.col("n_terms") == len(set(terms)))
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
