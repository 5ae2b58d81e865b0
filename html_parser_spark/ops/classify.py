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


def dsir_bucket_weights(
    feats: DataFrame,
    target_ids: DataFrame,
    buckets: int = 4096,
    scale_bits: int = 20,
) -> DataFrame:
    """DSIR importance weights per hashed feature bucket (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling") — the data-SELECTION complement of the NB quality
    classifier above: instead of a learned decision boundary, every
    bucket carries the log-ratio of its Laplace-smoothed frequency in a
    small TARGET corpus vs the raw pool, and a document's weight is the
    sum over its token occurrences.  Pipelines use it to skew a crawl
    toward a reference distribution (Wikipedia, books, a domain).

    Exactness: the published method sums float logs; a float sum over a
    shuffle is order-dependent, so this variant quantizes each bucket's
    log2-ratio to an INTEGER via bit length —

        ratio_scaled = ((cnt_t+1)·(tot_r+B)·2^scale_bits)
                         div ((cnt_r+1)·(tot_t+B))        (DECIMAL(38,0))
        w = bitlen(clamp(ratio_scaled, 1, 2^62)) - 1 - scale_bits

    i.e. w = floor(log2 ratio), a whole-log2 quantization (the same
    exactness-for-granularity trade ops/linkgraph.py makes with integer
    mass, one step finer than train_nb_votes' sign-only vote).  All
    operands are non-negative, so Spark's `div` and DuckDB's `//` agree
    and the result is bit-identical across engines and shuffle orders.

    Scale shape: ONE feats⋈target_ids LEFT join on doc_id (target set is
    per-DOC and modest — AQE broadcasts it), ONE groupBy(bucket) with
    two partial-agg counters, ONE 1-row broadcast totals crossJoin.
    Returns (bucket, w).
    """
    t = target_ids.select("doc_id", F.lit(1).alias("_t"))
    cells = (
        feats.join(t, "doc_id", "left")
        .groupBy("bucket")
        .agg(
            F.sum(F.coalesce(F.col("_t"), F.lit(0))).alias("cnt_t"),
            F.sum(1 - F.coalesce(F.col("_t"), F.lit(0))).alias("cnt_r"),
        )
    )
    totals = cells.agg(
        F.sum("cnt_t").alias("_tot_t"), F.sum("cnt_r").alias("_tot_r")
    )
    s = 1 << int(scale_bits)
    cap = 1 << 62
    ratio = F.expr(
        f"CAST((CAST(cnt_t AS DECIMAL(38,0)) + 1)"
        f" * (CAST(_tot_r AS DECIMAL(38,0)) + {int(buckets)})"
        f" * {s} div ((CAST(cnt_r AS DECIMAL(38,0)) + 1)"
        f" * (CAST(_tot_t AS DECIMAL(38,0)) + {int(buckets)}))"
        f" AS DECIMAL(38,0))"
    )
    return cells.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.length(
                F.bin(
                    F.greatest(
                        F.least(ratio, F.lit(cap).cast("decimal(38,0)")),
                        F.lit(1).cast("decimal(38,0)"),
                    ).cast("long")
                )
            )
            - 1
            - int(scale_bits)
        )
        .cast("long")
        .alias("w"),
    )


def dsir_doc_weights(feats: DataFrame, weights: DataFrame) -> DataFrame:
    """(doc_id, weight): Σ bucket weights over the document's token
    occurrences (buckets absent from training weigh 0).  The model
    broadcasts (≤ buckets rows); ONE partial-agg groupBy(doc) — an
    integer sum, order-independent."""
    return (
        feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.coalesce(F.col("w"), F.lit(0))).cast("long").alias("weight")
        )
    )


def dsir_select(scored: DataFrame, keep_pct: int = 30) -> DataFrame:
    """Deterministic top-fraction selection over DSIR weights: keep the
    ~keep_pct% highest-weight docs.  The published method adds Gumbel
    noise for diversity; this variant is the reproducible rank cut, the
    same histogram-cumulative device as ops/lm.perplexity_buckets —
    a window only over the bounded (weight → count) histogram, never
    over documents; weight TIES share a fate (the keep set can overshoot
    keep_pct by the tie group, documented), which is what makes the
    selection independent of partitioning.  Returns
    (doc_id, weight, keep)."""
    from pyspark import StorageLevel
    from pyspark.sql import Window

    # scored feeds both the histogram and the final join; persist so the
    # upstream weighting chain executes once
    scored = scored.persist(StorageLevel.MEMORY_AND_DISK)
    hist = scored.groupBy("weight").agg(F.count(F.lit(1)).alias("_n"))
    w = (
        Window.orderBy(F.desc("weight"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    totals = hist.agg(F.sum("_n").alias("_tot"))
    cuts = (
        hist.withColumn(
            "_better", F.coalesce(F.sum("_n").over(w), F.lit(0)).cast("long")
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "weight",
            (F.col("_better") * 100 < F.lit(int(keep_pct)) * F.col("_tot"))
            .cast("int")
            .alias("keep"),
        )
    )
    return scored.join(cuts, "weight").select("doc_id", "weight", "keep")
