"""Inverted index / conjunctive search (ops/search.py) and the
Bloom-filter seen-set (ops/bloom.py)."""

from pyspark.sql import functions as F


def test_inverted_index_flat_rows(spark):
    from html_parser_spark.ops.search import inverted_index, term_stats

    docs = spark.createDataFrame(
        [(1, "big table scan"), (2, "table table join"), (3, "  ")],
        ["doc_id", "text"],
    )
    idx = {(r["term"], r["doc_id"]): r["tf"] for r in inverted_index(docs).collect()}
    assert idx[("table", 1)] == 1 and idx[("table", 2)] == 2
    assert idx[("big", 1)] == 1
    # blank doc contributes nothing
    assert not any(d == 3 for (_, d) in idx)
    stats = {r["term"]: r for r in term_stats(inverted_index(docs)).collect()}
    assert stats["table"]["df_docs"] == 2 and stats["table"]["total_tf"] == 3


def test_keyword_search_and_semantics_and_ranking(spark):
    from html_parser_spark.ops.search import inverted_index, keyword_search

    docs = spark.createDataFrame(
        [
            (1, "table scan table scan"),     # both terms, score 4
            (2, "table only here"),           # missing 'scan' -> excluded
            (3, "scan table"),                # both, score 2
            (4, "nothing relevant"),
        ],
        ["doc_id", "text"],
    )
    out = keyword_search(inverted_index(docs), ["table", "scan"], k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in out] == [(1, 4), (3, 2)]


def test_keyword_search_plan_take_ordered_not_global_sort(spark):
    from html_parser_spark.ops.search import inverted_index, keyword_search

    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    plan = (
        keyword_search(inverted_index(docs), ["a"], k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_bloom_no_false_negatives(spark):
    from html_parser_spark.ops.bloom import bloom_build, bloom_probe

    seen = spark.createDataFrame(
        [(f"https://h{i}.com/p",) for i in range(50)], ["url"]
    )
    novel = spark.createDataFrame(
        [(f"https://novel{i}.org/x",) for i in range(50)], ["url"]
    )
    bits = bloom_build(seen, m_bits=1 << 14, k_hashes=5)
    out = {
        r["url"]: r["maybe_seen"]
        for r in bloom_probe(bits, seen.union(novel), m_bits=1 << 14, k_hashes=5).collect()
    }
    # the contract: every seen key MUST probe true
    assert all(out[f"https://h{i}.com/p"] for i in range(50))
    # and at 2k set bits / 16k the novel keys overwhelmingly probe false
    novel_hits = sum(out[f"https://novel{i}.org/x"] for i in range(50))
    assert novel_hits <= 2


def test_bloom_words_stay_non_negative(spark):
    """62-bit words keep every word >= 0 in both engines (1<<63 overflows
    DuckDB's signed BIGINT and flips Spark's sign)."""
    from html_parser_spark.ops.bloom import bloom_build

    seen = spark.createDataFrame(
        [(f"k{i}",) for i in range(2000)], ["url"]
    )
    bits = bloom_build(seen, m_bits=620, k_hashes=3)  # dense: all words hit
    rows = bits.collect()
    assert rows and all(r["word"] >= 0 for r in rows)
    assert all(0 <= r["word_idx"] < 10 for r in rows)
