"""Round-5 operators: integer-exact HITS, hreflang translation clusters,
margin-based bitext mining.  Each op's oracle query (q_hits / q_hreflang /
q_bitext_mine) does the cross-engine value-hash check; these tests pin the
hand-checkable semantics and the scale-shape invariants.
"""

from pyspark.sql import functions as F

TOTAL = 10**12


# ---------------------------------------------------------------------------
# HITS hubs/authorities — ops/linkgraph.hits_fixed_point
# ---------------------------------------------------------------------------
def _star_edges(spark):
    # hub 'h' links to three authorities; 'a1' also links back to 'h'
    return spark.createDataFrame(
        [("h", "a1", 1), ("h", "a2", 1), ("h", "a3", 1), ("a1", "h", 1)],
        "src string, dst string, weight long",
    )


def test_hits_star_graph_roles(spark):
    from html_parser_spark.ops.linkgraph import hits_fixed_point

    out = {
        r["node"]: r
        for r in hits_fixed_point(
            _star_edges(spark), iterations=3, checkpoint=False
        ).collect()
    }
    # h is the dominant hub; a1..a3 are the authorities
    assert out["h"]["hub"] > out["a1"]["hub"]
    assert min(out[a]["auth"] for a in ("a1", "a2", "a3")) > out["h"]["auth"] or (
        out["h"]["auth"] > 0  # a1→h gives h some authority, but never the max
        and max(out[a]["auth"] for a in ("a1", "a2", "a3")) > out["h"]["auth"]
    )
    # mass conservation up to floor losses: each rescaled column sums to
    # TOTAL minus at most (n_nodes - 1) floor units
    n = len(out)
    for col in ("auth", "hub"):
        s = sum(r[col] for r in out.values())
        assert TOTAL - (n - 1) <= s <= TOTAL


def test_hits_sink_and_source_zeroes(spark):
    from html_parser_spark.ops.linkgraph import hits_fixed_point

    out = {
        r["node"]: r
        for r in hits_fixed_point(
            spark.createDataFrame(
                [("s", "t", 5)], "src string, dst string, weight long"
            ),
            iterations=2,
            checkpoint=False,
        ).collect()
    }
    # pure source: no in-edges → auth 0; pure sink: no out-edges → hub 0
    assert out["s"]["auth"] == 0 and out["t"]["hub"] == 0
    assert out["s"]["hub"] == TOTAL and out["t"]["auth"] == TOTAL


def test_hits_weight_dominance_and_partition_independence(spark):
    from html_parser_spark.ops.linkgraph import hits_fixed_point

    edges = spark.createDataFrame(
        [("u", "big", 9), ("u", "small", 1), ("v", "big", 3), ("v", "small", 2)],
        "src string, dst string, weight long",
    )
    one = {
        (r["node"]): (r["auth"], r["hub"])
        for r in hits_fixed_point(edges, iterations=3, checkpoint=False).collect()
    }
    assert one["big"][0] > one["small"][0]
    many = {
        (r["node"]): (r["auth"], r["hub"])
        for r in hits_fixed_point(
            edges.repartition(7), iterations=3, checkpoint=False
        ).collect()
    }
    # integer fixed-point: bit-identical across partitionings
    assert one == many


def test_hits_empty_graph(spark):
    from html_parser_spark.ops.linkgraph import hits_fixed_point

    empty = spark.createDataFrame([], "src string, dst string, weight long")
    assert hits_fixed_point(empty, iterations=1, checkpoint=False).count() == 0


# ---------------------------------------------------------------------------
# hreflang extraction + clustering — ops/web.py
# ---------------------------------------------------------------------------
_HTML = (
    "<html><head>"
    '<link rel="alternate" hreflang="en" href="https://e.com/en/1">'
    "<link href='https://e.com/de/1' hreflang='DE' rel='alternate'>"
    "<link rel=alternate hreflang=fr href=https://e.com/fr/1>"
    '<link rel="alternate" hreflang="x-default" href="https://e.com/en/1">'
    '<link rel="alternate stylesheet" href="/s.css">'
    '<link rel="alternate" type="application/rss+xml" href="/feed.xml">'
    '<link rel="stylesheet" href="/m.css">'
    "</head><body>b</body></html>"
)


def _pages(spark):
    return spark.createDataFrame(
        [
            ("https://e.com/en/1", "en", _HTML.encode()),
            ("https://e.com/de/1", "de", _HTML.encode()),
        ],
        "url string, lang string, html binary",
    )


def test_hreflang_links_variants_and_decoys(spark):
    from html_parser_spark.ops.web import hreflang_links

    rows = hreflang_links(_pages(spark)).collect()
    per_page = {}
    for r in rows:
        per_page.setdefault(r["url"], {})[r["hreflang"]] = r["href"]
    # all three quoting/order variants parsed, hreflang lowercased,
    # x-default kept, all three decoy links dropped
    for url in ("https://e.com/en/1", "https://e.com/de/1"):
        assert per_page[url] == {
            "en": "https://e.com/en/1",
            "de": "https://e.com/de/1",
            "fr": "https://e.com/fr/1",
            "x-default": "https://e.com/en/1",
        }


def test_hreflang_clusters_key_and_self_lang(spark):
    from html_parser_spark.ops.web import hreflang_clusters, hreflang_links

    rows = {
        r["url"]: r
        for r in hreflang_clusters(hreflang_links(_pages(spark))).collect()
    }
    # min(href set ∪ {url}) = the /de/ variant for every member
    assert {r["cluster_id"] for r in rows.values()} == {"https://e.com/de/1"}
    assert rows["https://e.com/en/1"]["self_hreflang"] == "en"
    assert rows["https://e.com/de/1"]["self_hreflang"] == "de"
    assert all(r["n_variants"] == 4 for r in rows.values())


def test_hreflang_pairs_drop_self_and_xdefault(spark):
    from html_parser_spark.ops.web import hreflang_links, hreflang_pairs

    pairs = {
        (r["src_url"], r["dst_url"], r["dst_lang"])
        for r in hreflang_pairs(hreflang_links(_pages(spark))).collect()
    }
    assert ("https://e.com/en/1", "https://e.com/de/1", "de") in pairs
    assert ("https://e.com/en/1", "https://e.com/fr/1", "fr") in pairs
    # no self edges, no x-default rows
    assert not any(s == d for s, d, _ in pairs)
    assert not any(l == "x-default" for _, _, l in pairs)


# ---------------------------------------------------------------------------
# margin-based bitext mining — ops/similarity.bitext_margin_mine
# ---------------------------------------------------------------------------
def _emb(spark):
    # 2-D embeddings: src 0/2 align with dst 1/3; dst 5 is a "hub" vector
    # moderately close to BOTH sources — raw cosine would pair it with
    # everything, the margin demotes it below the true translations
    rows = [
        (0, [1.0, 0.05]),
        (2, [0.05, 1.0]),
        (1, [1.0, 0.1]),   # true match of 0
        (3, [0.1, 1.0]),   # true match of 2
        (5, [0.8, 0.8]),   # hub
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_bitext_mutual_best_and_hub_suppression(spark):
    from html_parser_spark.ops.similarity import bitext_margin_mine

    emb = _emb(spark)
    src = emb.filter(F.col("vec_id").isin(0, 2)).select("vec_id")
    dst = emb.filter(F.col("vec_id").isin(1, 3, 5)).select("vec_id")
    mined = {
        (r["src_id"], r["dst_id"])
        for r in bitext_margin_mine(
            emb, src, dst, k=2, margin_threshold_e4=10000
        ).collect()
    }
    assert mined == {(0, 1), (2, 3)}  # the hub (5) mined by neither


def test_bitext_candidates_path_matches_bruteforce(spark):
    from html_parser_spark.ops.similarity import bitext_margin_mine

    emb = _emb(spark)
    src = emb.filter(F.col("vec_id").isin(0, 2)).select("vec_id")
    dst = emb.filter(F.col("vec_id").isin(1, 3, 5)).select("vec_id")
    brute = bitext_margin_mine(emb, src, dst, k=2, margin_threshold_e4=0)
    cands = spark.createDataFrame(
        [(s, d) for s in (0, 2) for d in (1, 3, 5)],
        "src_id long, dst_id long",
    )
    via_cands = bitext_margin_mine(
        emb, src, dst, k=2, margin_threshold_e4=0, candidates=cands
    )
    assert sorted(map(tuple, brute.collect())) == sorted(
        map(tuple, via_cands.collect())
    )


def test_bitext_negative_cosines_excluded(spark):
    from html_parser_spark.ops.similarity import bitext_margin_mine

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    src = emb.filter(F.col("vec_id") == 0).select("vec_id")
    dst = emb.filter(F.col("vec_id") == 1).select("vec_id")
    assert (
        bitext_margin_mine(emb, src, dst, k=2, margin_threshold_e4=0).count()
        == 0
    )


# ---------------------------------------------------------------------------
# incremental LSH dedup against a persisted band index — ops/dedup.py
# ---------------------------------------------------------------------------
_BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill nearby every single morning"
)


def _corpus(spark):
    rows = [
        (0, _BASE),                              # existing
        (1, "completely different text about spark shuffles and joins "
            "partitioned across many executors for scale testing today"),
        # -- new batch --
        (10, _BASE),                             # dup of existing 0
        (11, "an entirely novel document with its own vocabulary chosen "
             "so that no shingle overlaps anything else in this corpus"),
        (12, "repeated batch text lorem alpha beta gamma delta epsilon "
             "zeta eta theta iota kappa lambda mu nu xi omicron pi rho"),
        (13, "repeated batch text lorem alpha beta gamma delta epsilon "
             "zeta eta theta iota kappa lambda mu nu xi omicron pi rho"),
        (14, "tiny"),                            # too short to shingle
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_dedup_elections(spark):
    from html_parser_spark.ops.dedup import band_index, incremental_lsh_dedup

    docs = _corpus(spark)
    idx = band_index(docs.filter(F.col("doc_id") < 10), num_hashes=4, bands=2)
    out = {
        r["doc_id"]: r
        for r in incremental_lsh_dedup(
            docs.filter(F.col("doc_id") >= 10), idx, num_hashes=4, bands=2
        ).collect()
    }
    assert len(out) == 5  # every batch doc gets a row
    # exact dup of existing 0: dropped, dup_of points at the corpus
    assert not out[10]["keep"] and out[10]["matched_existing"]
    assert out[10]["dup_of"] == 0
    # novel doc: kept
    assert out[11]["keep"] and not out[11]["matched_existing"]
    assert out[11]["dup_of"] is None
    # within-batch pair: min id wins
    assert out[12]["keep"] and out[13]["dup_of"] == 12 and not out[13]["keep"]
    assert not out[13]["matched_existing"]
    # unshingleable doc: matches nothing, kept
    assert out[14]["keep"] and out[14]["dup_of"] is None


def test_incremental_dedup_index_append_closes_loop(spark):
    """Appending band_index(kept batch docs) to the store makes a re-run of
    the SAME batch match everything against the corpus — the incremental
    invariant that lets batch N+1 reuse batch N's state."""
    from html_parser_spark.ops.dedup import band_index, incremental_lsh_dedup

    docs = _corpus(spark)
    batch = docs.filter(F.col("doc_id").isin(10, 11, 12, 13))
    idx = band_index(docs.filter(F.col("doc_id") < 10), num_hashes=4, bands=2)
    first = incremental_lsh_dedup(batch, idx, num_hashes=4, bands=2)
    kept_ids = [r["doc_id"] for r in first.collect() if r["keep"]]
    idx2 = idx.unionByName(
        band_index(
            batch.join(
                spark.createDataFrame([(i,) for i in kept_ids], "doc_id long"),
                "doc_id",
            ),
            num_hashes=4,
            bands=2,
        )
    )
    rerun = {
        r["doc_id"]: r
        for r in incremental_lsh_dedup(
            batch, idx2, num_hashes=4, bands=2
        ).collect()
    }
    assert all(r["matched_existing"] for r in rerun.values())
    assert all(not r["keep"] for r in rerun.values())


# ---------------------------------------------------------------------------
# int8 scalar quantization — ops/similarity.quantize_embeddings /
# quantized_topk / quantization_recall.  The oracle queries
# (q_quantized_topk / q_quantization_recall) do the cross-engine value-hash
# check; these pin the hand-checkable semantics.
# ---------------------------------------------------------------------------
def _vecs(spark):
    return spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.5, 0.25, 0.0, 0.0]),   # max 0.5 -> [127, 63, 0, 0]
            (2, [0.0, 0.0, 0.0, 0.0]),    # zero vector -> all-0, max_abs 0
            (3, [-0.4, 0.2, 0.0, 0.1]),   # negative max_abs handling
            (4, [0.9, 0.1, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )


def test_quantize_embeddings_values(spark):
    from html_parser_spark.ops.similarity import quantize_embeddings

    rows = {r["vec_id"]: r for r in quantize_embeddings(_vecs(spark)).collect()}
    # the max element maps to exactly 127 ((127*x)/x is an exact division)
    assert rows[0]["qvec"] == [127, 0, 0, 0]
    assert rows[1]["qvec"] == [127, 63, 0, 0]  # floor(0.25*127/0.5)=floor(63.5)
    assert rows[2]["qvec"] == [0, 0, 0, 0] and rows[2]["max_abs"] == 0.0
    # negative extreme: floor maps -max_abs to exactly -127
    assert rows[3]["qvec"][0] == -127
    assert all(-127 <= v <= 127 for r in rows.values() for v in r["qvec"])


def test_quantized_topk_ranks_by_integer_cosine(spark):
    from html_parser_spark.ops.similarity import quantized_topk

    out = quantized_topk(_vecs(spark), query_ids_below=1, k=4).collect()
    assert [r["neighbor_id"] for r in out] == [4, 1, 2, 3]
    by_n = {r["neighbor_id"]: r for r in out}
    # vec 4 vs query 0: q=[127,14,0,0] (floor(0.1*127/0.9)=14) -> dot 127*127
    assert by_n[4]["qdot"] == 127 * 127
    # the zero vector scores cosine 0.0 (guarded division), not NULL/NaN
    assert by_n[2]["cosine_q"] == 0.0 and by_n[2]["qdot"] == 0


def test_quantization_recall_perfect_and_ppm(spark):
    from html_parser_spark.ops.similarity import quantization_recall

    # no zero vector here: the EXACT baseline (cosine_topk) documents the
    # nonzero-vector assumption of the embeddings table (its oracle divides
    # unguarded too); the quantized path's zero guard is pinned above.
    vecs = _vecs(spark).filter(F.col("vec_id") != 2)
    rows = quantization_recall(vecs, query_ids_below=2, k=2).collect()
    assert sorted(r["query_id"] for r in rows) == [0, 1]
    for r in rows:
        assert 0 <= r["overlap"] <= 2
        assert r["recall_ppm"] == r["overlap"] * 1000000 // 2


# ---------------------------------------------------------------------------
# Blocked edit-distance fuzzy matching — ops/dedup.edit_distance_pairs
# ---------------------------------------------------------------------------
def test_edit_distance_pairs_within_block(spark):
    from html_parser_spark.ops.dedup import edit_distance_pairs

    docs = spark.createDataFrame(
        [(1, "kitten"), (2, "sitten"), (3, "kittens"), (4, "kitchen"),
         (5, "zebra")],
        "doc_id long, title string",
    )
    out = {(r["id_a"], r["id_b"]): r["dist"]
           for r in edit_distance_pairs(docs, max_dist=2).collect()}
    # same first char + same length band: kitten/kittens/kitchen compare
    assert out[(1, 3)] == 1          # kitten -> kittens (insert)
    assert out[(1, 4)] == 2          # kitten -> kitchen (sub+insert)
    assert (3, 4) not in out         # kittens -> kitchen is dist 3: filtered
    # sitten differs in FIRST CHAR: blocked away even though dist 1 —
    # the stated recall heuristic
    assert (1, 2) not in out
    # zebra: different block entirely
    assert all(5 not in p for p in out)


def test_edit_distance_pairs_triangle_and_threshold(spark):
    from html_parser_spark.ops.dedup import edit_distance_pairs

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaab"), (3, "abbb")], "doc_id long, title string"
    )
    rows = edit_distance_pairs(docs, max_dist=1).collect()
    # each unordered pair once, id_a < id_b; dist(aaaa,abbb)=3 filtered
    assert {(r["id_a"], r["id_b"]) for r in rows} == {(1, 2)}
    assert all(r["id_a"] < r["id_b"] for r in rows)


def test_edit_distance_pairs_skips_empty_keys(spark):
    from html_parser_spark.ops.dedup import edit_distance_pairs

    docs = spark.createDataFrame(
        [(1, "abc"), (2, ""), (3, None)], "doc_id long, title string"
    )
    assert edit_distance_pairs(docs, max_dist=2).count() == 0


# ---------------------------------------------------------------------------
# Plain-text URL mining — ops/html_meta.text_outlinks
# ---------------------------------------------------------------------------
def test_text_outlinks_trim_and_floor(spark):
    from html_parser_spark.ops.html_meta import text_outlinks

    docs = spark.createDataFrame(
        [(1, "see https://a.com/x. then (http://b.org/y), done"),
         (2, "bare http://c.io!? end"),
         (3, "no urls here"),
         (4, "scheme only https:// nothing")],
        "doc_id long, text string",
    )
    rows = {(r["doc_id"], r["url"]) for r in text_outlinks(docs).collect()}
    assert (1, "https://a.com/x") in rows       # trailing '.' trimmed
    assert (1, "http://b.org/y") in rows        # ')' excluded by the class
    assert (2, "http://c.io") in rows           # '!?' trimmed
    assert all(d != 3 for d, _ in rows)
    # 'https://' alone is 8 chars: fails the > 8 floor
    assert all(d != 4 for d, _ in rows)


# ---------------------------------------------------------------------------
# Order-insensitive (multiset) dedup — ops/dedup.reordered_duplicates
# ---------------------------------------------------------------------------
def test_reordered_duplicates_groups_shuffled_copies(spark):
    from html_parser_spark.ops.dedup import reordered_duplicates

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "fox brown the quick"),       # same multiset: groups with 1
            (3, "the quick brown foxes"),     # different token: own group
            (4, "the the quick brown fox"),   # different MULTIPLICITY: own group
            (5, "  the   quick brown fox  "), # whitespace runs collapse: with 1
        ],
        "doc_id long, text string",
    )
    groups = {r["canonical_id"]: r["dup_count"]
              for r in reordered_duplicates(docs).collect()}
    assert groups[1] == 3      # docs 1, 2, 5
    assert groups[3] == 1 and groups[4] == 1


def test_reordered_duplicates_empty_and_null(spark):
    from html_parser_spark.ops.dedup import reordered_duplicates

    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "   ")], "doc_id long, text string"
    )
    rows = reordered_duplicates(docs).collect()
    # all three normalize to the empty multiset: one group, canonical 1
    assert len(rows) == 1
    assert rows[0]["dup_count"] == 3 and rows[0]["canonical_id"] == 1


# ---------------------------------------------------------------------------
# Robots compliance audit — ops/robots.compliance_audit
# ---------------------------------------------------------------------------
def test_compliance_audit_per_host_ppm(spark):
    from html_parser_spark.ops.robots import compliance_audit, parse_robots

    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private\n")],
        "host string, body string",
    )
    pages = spark.createDataFrame(
        [("https://a.com/ok",), ("https://a.com/private/1",),
         ("https://a.com/private/2",), ("https://a.com/also-ok",),
         ("https://norules.net/x",)],
        "url string",
    )
    rows = {r["host"]: r for r in
            compliance_audit(pages, parse_robots(robots)).collect()}
    a = rows["a.com"]
    assert (a["crawled_n"], a["disallowed_n"]) == (4, 2)
    assert a["disallowed_ppm"] == 500000
    # host with no robots.txt: everything allowed
    n = rows["norules.net"]
    assert (n["crawled_n"], n["disallowed_n"], n["disallowed_ppm"]) == (1, 0, 0)


# ---------------------------------------------------------------------------
# Partition-independence of the session ops (the 10^12-row invariant: the
# answer must not depend on how the input happens to be partitioned)
# ---------------------------------------------------------------------------
def test_session_ops_partition_independence(spark):
    from html_parser_spark.ops.dedup import reordered_duplicates
    from html_parser_spark.ops.linkgraph import reciprocity
    from html_parser_spark.ops.web import url_survival

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{(i * 3) % 7} tok{(i * 5) % 7}") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, reordered_duplicates(docs).collect()))
    b = sorted(map(tuple, reordered_duplicates(docs.repartition(11)).collect()))
    assert a == b

    caps = spark.createDataFrame(
        [(f"u{i}", s) for i in range(30) for s in range(i % 3, i % 3 + i % 4 + 1)],
        "url string, snap long",
    )
    a = sorted(map(tuple, url_survival(caps).collect()))
    b = sorted(map(tuple, url_survival(caps.repartition(13)).collect()))
    assert a == b

    edges = spark.createDataFrame(
        [(f"h{i % 6}", f"h{(i + 1) % 6}") for i in range(24)]
        + [(f"h{(i + 1) % 6}", f"h{i % 6}") for i in range(0, 24, 2)],
        "src string, dst string",
    )
    a = sorted(map(tuple, reciprocity(edges).collect()))
    b = sorted(map(tuple, reciprocity(edges.repartition(9)).collect()))
    assert a == b


def test_quantized_topk_partition_independence(spark):
    from html_parser_spark.ops.similarity import quantized_topk

    emb = spark.createDataFrame(
        [(i, [((i * 7 + j * 13) % 19 - 9) / 10.0 for j in range(8)])
         for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    a = sorted(map(tuple, quantized_topk(emb, 5, 3).collect()))
    b = sorted(map(tuple, quantized_topk(emb.repartition(7), 5, 3).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# C4-style term blocklist — ops/text.term_blocklist_flags
# ---------------------------------------------------------------------------
def test_term_blocklist_word_boundaries(spark):
    from html_parser_spark.ops.text import term_blocklist_flags

    docs = spark.createDataFrame(
        [(1, "totally clean"), (2, "has badWord. here"),
         (3, "embadwordded is a substring, not a word"),
         (4, "BADWORD2 too"), (5, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            term_blocklist_flags(docs, ["BadWord", "badword2"]).collect()}
    assert rows[1]["blocked"] is False and rows[1]["blocked_term"] == ""
    assert rows[2]["blocked"] is True and rows[2]["blocked_term"] == "badword"
    assert rows[3]["blocked"] is False        # substring must NOT match
    assert rows[4]["blocked"] is True and rows[4]["blocked_term"] == "badword2"
    assert rows[5]["blocked"] is False        # NULL text degrades to clean


def test_term_blocklist_first_hit_deterministic(spark):
    from html_parser_spark.ops.text import term_blocklist_flags

    docs = spark.createDataFrame(
        [(1, "zzz aaa both present")], "doc_id long, text string"
    )
    r = term_blocklist_flags(docs, ["zzz", "aaa"]).collect()[0]
    # sorted intersection: the lexicographically first hit, not list order
    assert r["blocked_term"] == "aaa"
