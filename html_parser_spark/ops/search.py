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


def doc_lengths(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(doc_id, dl)``: per-doc token length — the BM25 length prior."""
    from .text import token_count

    return docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).cast("long").alias("dl"),
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    scale: int = 10**6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Disjunctive BM25 top-k retrieval, scaled-integer exact.

    Okapi BM25 with the universal defaults k1=1.2, b=0.75, carried as
    the exact rationals 12/10 and 3/4 so every per-term score is ONE
    BIGINT integer division — bit-identical across engines, shuffle
    orders, and re-runs (classic BM25's float log-idf is not: a float
    SUM over a shuffle is order-dependent).  Two substitutions, both
    standard and documented:

    * idf: the RATIONAL Robertson idf argument (N - df + 0.5)/(df + 0.5)
      = (2N - 2df + 1)/(2df + 1), unlogged.  Monotone-decreasing in df
      like the logged form, so rare terms still dominate; scaled by
      ``scale`` and floored (integer div).
    * tf saturation: tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl)) with
      avgdl = total_dl/n_docs, cleared of fractions by multiplying
      num and den by 10*total_dl:
          num = tf * 22 * total_dl * scale
          den = 10*tf*total_dl + 3*total_dl + 9*dl*n_docs

    score(doc) = sum over matched query terms of
    ``(idf_scaled * tfpart_scaled) div scale`` — a BIGINT sum.

    Overflow bound: ``tf * 22 * total_dl * scale < 2^63`` holds for
    corpora up to ~4*10^10 total tokens at tf<=10^4 with scale=10^6;
    a 100 TB corpus needs scale=10^3 or the same expressions on
    DECIMAL(38,0) — the plan is unchanged.  (Production ranking where
    bit-exactness is not required can equally run the classic float
    formula over the same index rows.)

    Plan shape (the part that matters at 100 TB): the index filter is
    an IN over literal terms (pushed into the scan / bucket pruning);
    per-term stats for a handful of query terms are a BROADCAST join;
    the corpus totals are ONE 1-row broadcast; doc lengths join on the
    index's own key; the final top-k is orderBy().limit(k) which Spark
    plans as TakeOrderedAndProject (per-partition heaps, one k-row
    merge) — never a global sort.
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one term")
    from pyspark.sql import functions as _F

    terms = sorted(set(str(t) for t in terms))
    index = inverted_index(docs, text_col=text_col, id_col=id_col)
    dls = doc_lengths(docs, text_col=text_col, id_col=id_col)
    totals = dls.agg(
        _F.count(_F.lit(1)).cast("long").alias("n_docs"),
        _F.sum("dl").cast("long").alias("total_dl"),
    )
    stats = term_stats(index.filter(_F.col("term").isin(terms))).select(
        "term", "df_docs"
    )
    hits = (
        index.filter(_F.col("term").isin(terms))
        .join(_F.broadcast(stats), "term")
        .join(dls, "doc_id")
        .crossJoin(_F.broadcast(totals))
    )
    scored = hits.select(
        "doc_id",
        "term",
        _F.expr(
            f"((2 * n_docs - 2 * df_docs + 1) * {int(scale)}L"
            f"  div (2 * df_docs + 1)) *"
            f" (tf * 22 * total_dl * {int(scale)}L"
            f"  div (10 * tf * total_dl + 3 * total_dl + 9 * dl * n_docs))"
            f" div {int(scale)}L"
        ).alias("_s"),
    )
    agg = scored.groupBy("doc_id").agg(
        _F.count_distinct("term").cast("long").alias("n_terms"),
        _F.sum("_s").cast("long").alias("score"),
    )
    return agg.orderBy(_F.desc("score"), _F.asc("doc_id")).limit(k)
