"""Round-4 extras: hashed NB-vote classifier, temperature mixing, HTML
table extraction — semantics + plan-shape assertions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------- classifier
def test_nb_votes_learn_separable_vocab(spark):
    """Tokens unique to one class must vote for it, and scoring must
    classify held-out docs made of those tokens correctly."""
    from html_parser_spark.ops.classify import (
        hashed_features,
        nb_vote_score,
        train_nb_votes,
    )

    train = spark.createDataFrame(
        [
            (1, "good clean prose sentence structure", 1),
            (2, "another good readable paragraph here", 1),
            (3, "click now buy cheap pills offer", 0),
            (4, "cheap offer click spam pills now", 0),
        ],
        ["doc_id", "text", "label"],
    )
    feats = hashed_features(train)
    votes = train_nb_votes(feats, train.select("doc_id", "label"))
    test = spark.createDataFrame(
        [(10, "clean readable prose paragraph"), (11, "buy cheap pills now")],
        ["doc_id", "text"],
    )
    scored = {
        r["doc_id"]: r
        for r in nb_vote_score(hashed_features(test), votes).collect()
    }
    assert scored[10]["pred"] == 1 and scored[10]["score"] > 0
    assert scored[11]["pred"] == 0 and scored[11]["score"] < 0


def test_nb_score_integer_and_unseen_bucket_zero(spark):
    """A doc made entirely of unseen tokens scores exactly 0 (votes
    coalesce to 0), and the score column is integer-typed."""
    from html_parser_spark.ops.classify import (
        hashed_features,
        nb_vote_score,
        train_nb_votes,
    )

    train = spark.createDataFrame(
        [(1, "alpha beta", 1), (2, "gamma delta", 0)], ["doc_id", "text", "label"]
    )
    votes = train_nb_votes(hashed_features(train), train.select("doc_id", "label"))
    out = nb_vote_score(
        hashed_features(
            spark.createDataFrame([(9, "zzzqqq wwwvvv")], ["doc_id", "text"])
        ),
        votes,
    ).collect()
    assert out[0]["score"] == 0 and out[0]["pred"] == 0
    schema = {f.name: f.dataType.simpleString() for f in votes.schema.fields}
    assert schema["vote"] == "int"


def test_classifier_plan_broadcasts_model(spark):
    """Scoring must broadcast the model dim — never shuffle it against
    the corpus."""
    from html_parser_spark.ops.classify import (
        hashed_features,
        nb_vote_score,
        train_nb_votes,
    )

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), (F.col("id") % 17).cast("string")).alias("text"),
        (F.col("id") % 2).alias("label"),
    )
    feats = hashed_features(docs)
    votes = train_nb_votes(feats, docs.select("doc_id", "label"))
    plan = (
        nb_vote_score(feats, votes)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_hashed_features_buckets_must_divide(spark):
    from html_parser_spark.ops.classify import hashed_features

    with pytest.raises(ValueError):
        hashed_features(
            spark.createDataFrame([(1, "x")], ["doc_id", "text"]), buckets=1000
        )


# --------------------------------------------------------- temperature mix
def test_temperature_mix_plan_exact_small_case(spark):
    """Closed-form check: strata of 100/400 docs at α=0.5 →
    w=(10,20), S=30, T=500; thresholds floor(65536·500·w/(30·c)):
    head (400): floor(65536·500·20/(30·400)) = 54613; tail (100):
    capped at 65536 (keep everything — α<1 upsamples the tail)."""
    from html_parser_spark.ops.corpus import temperature_mix_plan

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, "tail").otherwise("head").alias("lang"),
    )
    got = {r["stratum"]: r for r in temperature_mix_plan(docs).collect()}
    assert got["tail"]["threshold"] == 65536
    assert got["tail"]["kept"] == 100
    assert got["head"]["threshold"] == (65536 * 500 * 20) // (30 * 400)
    assert 0 < got["head"]["kept"] < 400


def test_temperature_sample_deterministic_and_matches_plan(spark):
    """Sampling twice selects the same ids, and per-stratum counts equal
    the plan's `kept`."""
    from html_parser_spark.ops.corpus import (
        temperature_mix_plan,
        temperature_sample,
    )

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "a").otherwise("b").alias("lang"),
    )
    s1 = sorted(r["doc_id"] for r in temperature_sample(docs).collect())
    s2 = sorted(r["doc_id"] for r in temperature_sample(docs).collect())
    assert s1 == s2
    plan = {r["stratum"]: r["kept"] for r in temperature_mix_plan(docs).collect()}
    got = {
        r["lang"]: r["n"]
        for r in temperature_sample(docs)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == plan


def test_temperature_mix_natural_alpha_keeps_everything(spark):
    """α=1 with T=corpus size is the identity mixture: every threshold is
    65536 and every doc is kept."""
    from html_parser_spark.ops.corpus import temperature_mix_plan

    docs = spark.range(120).select(
        F.col("id").alias("doc_id"), (F.col("id") % 4).cast("string").alias("lang")
    )
    rows = temperature_mix_plan(docs, alpha_pct=100).collect()
    assert all(r["threshold"] == 65536 and r["kept"] == r["n_docs"] for r in rows)


def test_temperature_mix_rejects_other_alpha(spark):
    from html_parser_spark.ops.corpus import temperature_mix_plan

    with pytest.raises(ValueError):
        temperature_mix_plan(
            spark.createDataFrame([(1, "a")], ["doc_id", "lang"]), alpha_pct=30
        )


# ------------------------------------------------------------------ tables
def _rows(html: str):
    from html_parser_spark.ops.tables import extract_page_tables

    return extract_page_tables(html.encode())


def test_tables_kernel_nesting_colspan_header():
    rows = _rows(
        "<html><body>"
        '<table><thead><tr><th colspan="2">H</th></tr></thead>'
        "<tbody><tr><td> a  1 </td><td>b</td></tr></tbody></table>"
        "<table><tr><td>x<table><tr><td>in</td></tr></table></td>"
        "<td>y</td></tr></table></body></html>"
    )
    assert rows == [
        {"table_idx": 0, "row_idx": 0, "is_header": True, "cells": ["H", "H"]},
        {"table_idx": 0, "row_idx": 1, "is_header": False, "cells": ["a 1", "b"]},
        {"table_idx": 1, "row_idx": 0, "is_header": False, "cells": ["xin", "y"]},
        {"table_idx": 2, "row_idx": 0, "is_header": False, "cells": ["in"]},
    ]


def test_tables_kernel_edge_cases():
    # no tables / empty page / malformed colspan / tr outside table
    assert _rows("<html><body><p>no tables</p></body></html>") == []
    assert _rows("") == []
    bad = _rows('<table><tr><td colspan="zz">v</td></tr></table>')
    assert bad[0]["cells"] == ["v"]
    assert _rows("<tr><td>stray</td></tr>") == []
    # colspan cap
    big = _rows('<table><tr><td colspan="99999">v</td></tr></table>')
    assert len(big[0]["cells"]) == 1000


def test_extract_tables_dataframe_no_shuffle(spark):
    from html_parser_spark.ops.tables import extract_tables

    pages = spark.createDataFrame(
        [("u1", b"<table><tr><td>a</td></tr></table>"), ("u2", b"<p>none</p>")],
        ["url", "html"],
    )
    out = extract_tables(pages)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["cells"] == ["a"] and rows[0]["n_cells"] == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_shards_matches_sequential_and_is_partition_independent(spark):
    """The distributed prefix-sum equals the sequential running sum for
    ANY partition count (1, 3, 8) — including a NULL-text doc (0 bytes)."""
    from html_parser_spark.ops.corpus import pack_shards

    rows = [(i, "x" * ((i * 37) % 200)) for i in range(50)]
    rows[7] = (7, None)
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # sequential reference
    sizes = {i: len(t.encode()) if t else 0 for i, t in rows}
    expect, off = {}, 0
    for i in sorted(sizes):
        expect[i] = (sizes[i], off, off // 500)
        off += sizes[i]

    for p in (1, 3, 8):
        got = {
            r["doc_id"]: (r["n_bytes"], r["start_offset"], r["shard_id"])
            for r in pack_shards(df, shard_bytes=500, num_partitions=p).collect()
        }
        assert got == expect, f"num_partitions={p}"


def test_pack_shards_correct_without_exchange_reuse(spark):
    """`_p` (spark_partition_id) feeds both the totals branch and the probe
    join; correctness must come from the shared persisted materialization,
    NOT from Catalyst's exchange-reuse rule unifying two independently
    sampled range exchanges — so the result must hold with reuse disabled."""
    from html_parser_spark.ops.corpus import pack_shards

    rows = [(i, "y" * ((i * 53) % 300)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    sizes = {i: len(t.encode()) for i, t in rows}
    expect, off = {}, 0
    for i in sorted(sizes):
        expect[i] = (sizes[i], off, off // 777)
        off += sizes[i]
    old = spark.conf.get("spark.sql.exchange.reuse", "true")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        got = {
            r["doc_id"]: (r["n_bytes"], r["start_offset"], r["shard_id"])
            for r in pack_shards(df, shard_bytes=777, num_partitions=5).collect()
        }
    finally:
        spark.conf.set("spark.sql.exchange.reuse", old)
    assert got == expect


def test_pack_shards_no_global_single_partition_window(spark):
    """The full-data window must be partitioned (by the range id); the only
    unpartitioned window may run over the P-row offsets frame."""
    from html_parser_spark.ops.corpus import pack_shards

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit("abc").alias("text")
    )
    plan = pack_shards(df, shard_bytes=100, num_partitions=4)
    plan.collect()
    s = plan._jdf.queryExecution().executedPlan().toString()
    import re

    # every Window over n_bytes/doc_id (the full-data cumsum) must carry a
    # partition spec; the offsets window (over _range_bytes) may be global
    for m in re.finditer(r"Window \[(.*?)\]", s):
        spec = m.group(0)
        if "_range_bytes" in spec:
            continue
        assert "partitionBy" in s or "_p" in spec, spec


def test_tables_kernel_survives_deep_nesting():
    """A crawl page with thousands of nested elements must not blow the
    recursion limit (the walker is an explicit stack), and a table at the
    bottom still extracts."""
    from html_parser_spark.ops.tables import extract_page_tables

    depth = 3000
    page = (
        "<html><body>" + "<div>" * depth
        + "<table><tr><td>deep</td></tr></table>"
        + "</div>" * depth + "</body></html>"
    ).encode()
    rows = extract_page_tables(page)
    assert rows == [
        {"table_idx": 0, "row_idx": 0, "is_header": False, "cells": ["deep"]}
    ]


def _sequential_pack(token_counts, L):
    """Pure-Python packing reference: doc tokens + 1 EOD slot concatenated
    in id order, cut every L slots."""
    out, off = [], 0
    for did in sorted(token_counts):
        n_slots = token_counts[did] + 1
        start, end = off, off + n_slots
        s = start // L
        while s * L < end:
            seg_start = max(start, s * L)
            seg_end = min(end, (s + 1) * L)
            out.append(
                (s, did, seg_start - s * L, seg_start - start,
                 seg_end - seg_start, seg_end == end)
            )
            s += 1
        off = end
    return sorted(out)


def test_pack_sequences_hand_example(spark):
    """L=4, docs of 3/4/0 tokens: doc0 fills seq0 exactly (eod at slot 3),
    doc1 (5 slots) spans seq1+seq2, the empty doc is a lone EOD slot."""
    from html_parser_spark.ops.corpus import pack_sequences

    df = spark.createDataFrame(
        [(0, "a b c"), (1, "d e f g"), (2, None)],
        "doc_id long, text string",
    )
    got = sorted(
        (r["seq_id"], r["doc_id"], r["seq_off"], r["doc_off"],
         r["slice_len"], r["eod"])
        for r in pack_sequences(df, seq_len=4, num_partitions=2).collect()
    )
    assert got == [
        (0, 0, 0, 0, 4, True),   # 3 tokens + EOD == one full sequence
        (1, 1, 0, 0, 4, False),  # first 4 of doc1's 5 slots
        (2, 1, 0, 4, 1, True),   # doc1's EOD spills into seq2
        (2, 2, 1, 0, 1, True),   # empty doc == a lone EOD slot
    ]


def test_pack_sequences_matches_sequential_and_partition_independent(spark):
    from html_parser_spark.ops.corpus import pack_sequences

    rows = [(i, " ".join(f"t{j}" for j in range((i * 13) % 40))) for i in range(60)]
    rows[5] = (5, None)
    rows[11] = (11, "   ")
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counts = {i: (len(t.split()) if t else 0) for i, t in rows}
    expect = _sequential_pack(counts, 16)
    for p in (1, 3, 8):
        got = sorted(
            (r["seq_id"], r["doc_id"], r["seq_off"], r["doc_off"],
             r["slice_len"], r["eod"])
            for r in pack_sequences(df, seq_len=16, num_partitions=p).collect()
        )
        assert got == expect, f"num_partitions={p}"


def test_pack_sequences_invariants(spark):
    """Every sequence except the last holds exactly L slots with no gaps;
    each doc's slices cover [0, n_tokens+1) contiguously and flag eod on
    the final slice only."""
    from collections import defaultdict

    from html_parser_spark.ops.corpus import pack_sequences

    rows = [(i, "w " * ((i * 7) % 23)) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    L = 32
    recs = pack_sequences(df, seq_len=L, num_partitions=4).collect()
    per_seq = defaultdict(list)
    per_doc = defaultdict(list)
    for r in recs:
        assert r["slice_len"] > 0
        per_seq[r["seq_id"]].append((r["seq_off"], r["slice_len"]))
        per_doc[r["doc_id"]].append((r["doc_off"], r["slice_len"], r["eod"]))
    last = max(per_seq)
    for sid, segs in per_seq.items():
        segs.sort()
        pos = 0
        for o, ln in segs:
            assert o == pos, (sid, segs)
            pos += ln
        if sid != last:
            assert pos == L, (sid, pos)
    for did, segs in per_doc.items():
        segs.sort()
        n_slots = ((did * 7) % 23) + 1
        pos = 0
        for o, ln, eod in segs:
            assert o == pos
            pos += ln
            assert eod == (pos == n_slots)
        assert pos == n_slots


def test_materialize_sequences_hand_example(spark):
    from html_parser_spark.ops.corpus import materialize_sequences, pack_sequences

    df = spark.createDataFrame(
        [(0, "a b c"), (1, "d e f g"), (2, None)],
        "doc_id long, text string",
    )
    plan = pack_sequences(df, seq_len=4, num_partitions=2)
    got = {
        r["seq_id"]: (r["n_slots"], r["seq_text"])
        for r in materialize_sequences(df, plan).collect()
    }
    assert got == {
        0: (4, "a b c <|eod|>"),
        1: (4, "d e f g"),
        2: (2, "<|eod|> <|eod|>"),  # doc1's EOD then empty doc2's EOD
    }


def test_materialize_sequences_reconstructs_stream(spark):
    """Concatenating all sequences in seq_id order must reproduce the
    sequential token+EOD stream exactly, with every non-final sequence
    packed to exactly L slots."""
    from html_parser_spark.ops.corpus import materialize_sequences, pack_sequences

    rows = [(i, " ".join(f"d{i}t{j}" for j in range((i * 11) % 29))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    L = 16
    plan = pack_sequences(df, seq_len=L, num_partitions=3)
    seqs = sorted(
        (r["seq_id"], r["n_slots"], r["seq_text"])
        for r in materialize_sequences(df, plan).collect()
    )
    expect_stream = []
    for i, t in rows:
        expect_stream.extend(t.split())
        expect_stream.append("<|eod|>")
    got_stream = [tok for _, _, text in seqs for tok in text.split()]
    assert got_stream == expect_stream
    assert [s for s, _, _ in seqs] == list(range(len(seqs)))
    for sid, n, text in seqs[:-1]:
        assert n == L and len(text.split()) == L
    assert seqs[-1][1] == len(expect_stream) - (len(seqs) - 1) * L


# ---------------------------------------------------------------------------
# round-5: adversarial battery for the NB quality gate (verdict item 8) —
# hard-negative fixtures with pinned precision/recall floors, the way the
# soft-404 battery pins its families.
# ---------------------------------------------------------------------------
def test_nb_classifier_hard_negative_battery(spark):
    import hashlib

    from html_parser_spark.ops.classify import (
        hashed_features,
        nb_vote_score,
        train_nb_votes,
    )

    GOOD = (
        "analysis evidence method results study conclusion dataset model "
        "hypothesis measurement"
    ).split()
    SPAM = "casino bonus win free click cheap pills offer lottery prize".split()
    BOILER = (
        "home about contact login menu search privacy terms cookie "
        "subscribe sidebar footer"
    ).split()

    # fixture sanity: the three vocabularies are collision-free under the
    # production bucketing (16-bit md5 prefix mod 4096), so a bucket merge
    # can never silently launder a spam token into a good vote
    def bkt(tok):
        return int(hashlib.md5(("feat" + tok).encode()).hexdigest()[:4], 16) % 4096

    buckets = [bkt(w) for w in GOOD + SPAM + BOILER]
    assert len(set(buckets)) == len(buckets)

    def doc(words, i, n):
        return " ".join(words[(i + j) % len(words)] for j in range(n))

    # training: boilerplate appears with IDENTICAL counts in both classes,
    # so its buckets tie to vote 0 — the gate must learn that nav chrome
    # carries no class signal
    train = []
    for i in range(30):
        train.append((i, doc(GOOD, i, 24) + " " + doc(BOILER, i, 6), 1))
        train.append((100 + i, doc(SPAM, i, 24) + " " + doc(BOILER, i, 6), 0))
    tdf = spark.createDataFrame(train, "doc_id long, text string, label int")
    votes = train_nb_votes(hashed_features(tdf), tdf.select("doc_id", "label"))

    boiler_votes = {
        r["bucket"]: r["vote"]
        for r in votes.where(F.col("bucket").isin([bkt(w) for w in BOILER])).collect()
    }
    assert set(boiler_votes.values()) == {0}

    # adversarial eval: (a) boilerplate-heavy GOOD pages (83% nav chrome),
    # (b) short legit landing pages (3 tokens), (c) spam sprinkled with
    # good words — the three families that break naive keyword gates
    hard = []
    for i in range(10):
        hard.append((1000 + i, doc(BOILER, i, 25) + " " + doc(GOOD, i, 5), 1))
    for i in range(10):
        hard.append((2000 + i, doc(GOOD, i, 3), 1))
    for i in range(10):
        hard.append((3000 + i, doc(SPAM, i, 20) + " " + doc(GOOD, i, 4), 0))
    edf = spark.createDataFrame(hard, "doc_id long, text string, label int")
    pred = {
        r["doc_id"]: r["pred"]
        for r in nb_vote_score(hashed_features(edf), votes).collect()
    }
    truth = {d: y for d, _, y in hard}

    tp = sum(1 for d in truth if truth[d] == 1 and pred[d] == 1)
    fp = sum(1 for d in truth if truth[d] == 0 and pred[d] == 1)
    fn = sum(1 for d in truth if truth[d] == 1 and pred[d] == 0)
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    # pinned floors: this battery is deterministic (collision-free vocab,
    # tied boilerplate) so the gate must be EXACT on it
    assert precision == 1.0
    assert recall == 1.0
