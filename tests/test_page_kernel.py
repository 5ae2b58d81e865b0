"""Fused page kernel (ops/page_kernel.py): one parse, two walks — pinned
field-for-field against the component kernels."""

from pyspark.sql import functions as F

PAGES = [
    (
        1,
        "https://www.a.com/x/",
        b"<!doctype html><html><head><meta charset=\"utf-8\">"
        b"<title> Fused  Kernel </title>"
        b'<meta name="description" content="a  desc">'
        b'<meta name="robots" content="noindex">'
        b'<link rel="canonical" href="/canon">'
        b"</head><body><header><nav><a href=\"/\">Home</a></nav></header>"
        b"<div id=\"content\"><h2>Section</h2>"
        b"<p>This paragraph is comfortably long enough to count as real "
        b"content for the extractor to keep in the main text.</p>"
        b'<p class="promo">Deal <a href="/x">now</a> <a href="/y">more</a></p>'
        b"</div><footer><p>(c) footer furniture text long enough to look "
        b"like a block but killed by ancestry</p></footer>"
        b'<a href="https://b.example.org/p">out</a>'
        b"<a href=\"mailto:m@e\">m</a></body></html>",
    ),
    (2, "https://b.com/", b"<html><body><p>short</p></body></html>"),
    (3, "https://c.com/", None),
    (4, "https://d.com/", b""),
]


def test_fused_equals_components_field_for_field(spark):
    from html_parser_spark.ops.boilerplate import extract_main_content
    from html_parser_spark.ops.html_meta import extract_page_meta
    from html_parser_spark.ops.page_kernel import extract_page_full

    df = spark.createDataFrame(PAGES, ["doc_id", "url", "html"])
    fused = {r["doc_id"]: r.asDict() for r in extract_page_full(df).collect()}
    mc = {r["doc_id"]: r.asDict() for r in extract_main_content(df).collect()}
    pm = {r["doc_id"]: r.asDict() for r in extract_page_meta(df).collect()}
    for i in fused:
        expect = {**mc[i], **pm[i]}
        assert fused[i] == expect, f"doc {i}"
    # sanity on the interesting page, not just self-consistency
    assert fused[1]["robots"] == "noindex"
    assert fused[1]["canonical"] == "https://www.a.com/canon"
    # relative hrefs absolutized, doc-order dedup, mailto skipped
    assert fused[1]["outlinks"] == [
        "https://www.a.com/",
        "https://www.a.com/x",
        "https://www.a.com/y",
        "https://b.example.org/p",
    ]
    assert "comfortably long enough" in fused[1]["main_text"]
    assert "footer furniture" not in fused[1]["main_text"]
    assert fused[1]["title"] == "Fused Kernel"


def test_fused_oversized_guard_and_single_arrow_stage(spark):
    """Oversized pages route AROUND the UDF (filter+union, NULL fields,
    zeroed counters); the small branch runs exactly ONE ArrowEvalPython."""
    from html_parser_spark.ops.page_kernel import extract_page_full

    big = (1, "https://big.com/", b"<html><body><p>" + b"x" * 4000 + b"</p>")
    df = spark.createDataFrame([PAGES[1], big], ["doc_id", "url", "html"])
    out = {r["doc_id"]: r for r in
           extract_page_full(df, max_html_bytes=1000).collect()}
    assert out[1]["main_text"] is None and out[1]["n_blocks"] == 0
    assert out[1]["outlinks"] is None and out[1]["n_anchors"] == 0
    assert out[2]["n_blocks"] == 1
    plan = (
        extract_page_full(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan
