"""Hashed-feature document classifier for corpus curation (brief §extras).

The quality/language/domain classifiers real pipelines gate training data
with (CCNet's fastText quality model, C4's langdetect pass) share one
shape: hash tokens into a fixed feature space, learn one weight per
bucket from labeled examples, score = Σ weights over a document's tokens.
This module implements that shape Spark-first:

* :func:`hashed_features` — (doc, token-occurrence) → (doc, bucket) rows via
  the repo's 16-bit md5-prefix bucket (pure column expressions, engine- and
  partitioning-independent, reproducible in the DuckDB oracle).
* :func:`train_nb_votes` — per-bucket evidence votes from labeled docs:
  ONE partial-agg groupBy over (bucket, label) counts, then the SIGN of the
  Laplace-smoothed Naive-Bayes log-odds.  The sign needs no logarithms —
  ``log((pos+1)/(P+B)) > log((neg+1)/(N+B))  ⇔  (pos+1)·(N+B) > (neg+1)·(P+B)``
  — so the whole model is integer arithmetic (decimal products: the counts
  are token occurrences, up to ~1e14 at crawl scale, and their cross
  products pass BIGINT).  Real deployments would keep the float log-odds
  magnitudes; the vote (sign) variant trades a little accuracy for
  bit-exact determinism across engines, shuffle orders, and re-runs —
  the same trade ops/linkgraph.py makes with integer PageRank mass.
* :func:`nb_vote_score` — score = Σ votes over a document's token
  occurrences (unseen buckets vote 0): an integer sum, order-independent.
  The model dim (≤ buckets rows) broadcasts; scoring a 10^12-doc corpus is
  explode → broadcast-join → ONE partial-agg groupBy(doc) — no model-side
  shuffle at any scale.

Scale notes (100 TB): training cost is O(total train tokens) with map-side
combine into ≤ buckets×2 cells; scoring is a narrow pipeline over the
corpus with a broadcast model.  Nothing here collects, windows over
unbounded partitions, or shuffles more than (bucket, label) cells and
per-doc partial sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_HEX16 = 65536


def hashed_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    salt: str = "feat",
) -> DataFrame:
    """(id, bucket) per token OCCURRENCE (bag-of-words): lowercase
    whitespace tokens, bucket = 16-bit md5 prefix of salt||token mod
    ``buckets``.  ``buckets`` must divide 65536 so the modulo keeps the
    md5 prefix uniform."""
    if _HEX16 % buckets:
        raise ValueError("buckets must divide 65536")
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), F.col("tok"))), 1, 4), 16, 10
        ).cast("int")
        % buckets
    )
    return tok.select("doc_id", bucket.alias("bucket"))


def train_nb_votes(
    feats: DataFrame, labels: DataFrame, buckets: int = 4096
) -> DataFrame:
    """(bucket, vote) from labeled feature rows: vote = sign of the
    Laplace-smoothed NB log-odds, via exact integer cross-products (see
    module docstring).  ``labels`` is (doc_id, label) with label ∈ {0,1}.

    One equi-join feats⋈labels on doc_id (labels is per-DOC — at training
    scale a modest table; AQE broadcasts it when it fits), one groupBy
    (bucket) with two partial-agg counters, one 1-row broadcast crossJoin
    for the class totals (the dangling-mass pattern — no driver collect)."""
    lab = labels.select("doc_id", F.col("label").cast("long").alias("_y"))
    cells = (
        feats.join(lab, "doc_id")
        .groupBy("bucket")
        .agg(
            F.sum("_y").alias("pos"),
            F.sum(1 - F.col("_y")).alias("neg"),
        )
    )
    totals = cells.agg(
        F.sum("pos").alias("_p_tot"), F.sum("neg").alias("_n_tot")
    )
    b = F.lit(buckets).cast("decimal(20,0)")
    dec = lambda c: c.cast("decimal(20,0)")  # noqa: E731
    lhs = (dec(F.col("pos")) + 1) * (dec(F.col("_n_tot")) + b)
    rhs = (dec(F.col("neg")) + 1) * (dec(F.col("_p_tot")) + b)
    return cells.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.when(lhs > rhs, 1).when(lhs < rhs, -1).otherwise(0).alias("vote"),
    )


def nb_vote_score(feats: DataFrame, votes: DataFrame) -> DataFrame:
    """(doc_id, score, pred): score = Σ votes over the doc's token
    occurrences (buckets unseen in training vote 0), pred = score > 0.
    The model broadcasts (≤ buckets rows); ONE partial-agg groupBy(doc)."""
    scored = feats.join(F.broadcast(votes), "bucket", "left")
    return scored.groupBy("doc_id").agg(
        F.sum(F.coalesce(F.col("vote"), F.lit(0))).cast("long").alias("score")
    ).select(
        "doc_id", "score", (F.col("score") > 0).cast("int").alias("pred")
    )
