"""HTML → Markdown conversion: closed-form semantics pinned block by block."""

from html_parser_spark.ops.markdown import page_to_markdown


def md(s: str) -> str:
    return page_to_markdown(s.encode())


def test_headings_paragraphs_inline():
    out = md(
        "<html><head><title>T</title><script>x=1</script></head><body>"
        "<h1>One</h1><h3>Three</h3>"
        "<p>Hello  world <b>bold</b>, <em>it</em> and "
        '<a href="https://x.org/p">a link</a>.</p></body></html>'
    )
    assert out == (
        "# One\n\n### Three\n\n"
        "Hello world **bold**, *it* and [a link](https://x.org/p)."
    )


def test_lists_nested_and_ordered():
    out = md(
        "<ul><li>alpha</li><li>beta <i>two</i>"
        "<ul><li>nested</li><li>deeper <ol><li>ord</li></ol></li></ul>"
        "</li><li>gamma</li></ul>"
        "<ol><li>first</li><li>second</li></ol>"
    )
    assert out == (
        "- alpha\n- beta *two*\n  - nested\n  - deeper\n    1. ord\n- gamma"
        "\n\n1. first\n2. second"
    )


def test_pre_preserves_whitespace_and_code_collapses():
    out = md("<pre>a  b\n  c</pre><p>x <code>d  e</code> y</p>")
    assert out == "```\na  b\n  c\n```\n\nx `d e` y"


def test_blockquote_hr_img_br():
    out = md(
        "<blockquote>wise  words</blockquote><hr>"
        '<p>see <img src="/i.png" alt="pic"> here<br>next line</p>'
    )
    assert out == "> wise words\n\n---\n\nsee ![pic](/i.png) here next line"


def test_table_with_header_separator_and_nested_table():
    out = md(
        "<table><thead><tr><th>k</th><th>v</th></tr></thead><tbody>"
        "<tr><td>1</td><td>one <table><tr><td>inner</td></tr></table></td></tr>"
        "</tbody></table>"
    )
    # nested table text stays in the host cell; its rows are NOT host rows
    assert out == "| k | v |\n| --- | --- |\n| 1 | one inner |"


def test_headerless_table_has_no_separator():
    assert md("<table><tr><td>a</td><td>b</td></tr></table>") == "| a | b |"


def test_anchor_without_href_and_empty_blocks_dropped():
    out = md("<p><a>plain</a></p><p>   </p><h2></h2><ul></ul><pre></pre>")
    assert out == "plain"


def test_skip_subtrees_and_bare_container_text():
    out = md(
        "<div>floating text<style>p{}</style><noscript>no</noscript></div>"
        "<svg><text>vector</text></svg><iframe>fr</iframe>"
    )
    assert out == "floating text"


def test_entities_decode_unescaped():
    assert md("<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"


def test_deep_nesting_does_not_recurse():
    deep = b"<div>" * 5000 + b"<p>deep ok</p>" + b"</div>" * 5000
    assert page_to_markdown(deep) == "deep ok"
    deepl = b"<ul><li>" * 3000 + b"x" + b"</li></ul>" * 3000
    assert page_to_markdown(deepl).endswith("- x")


def test_empty_and_null_input():
    assert page_to_markdown(b"") == ""
    assert page_to_markdown(None) == ""


def test_to_markdown_dataframe(spark):
    from pyspark.sql import functions as F

    from html_parser_spark.ops.markdown import to_markdown

    pages = spark.createDataFrame(
        [("u1", b"<h1>A</h1><p>b c</p>"), ("u2", b"")],
        "url string, html binary",
    )
    rows = {r["url"]: r for r in to_markdown(pages).collect()}
    assert rows["u1"]["markdown"] == "# A\n\nb c"
    assert rows["u1"]["n_blocks"] == 2
    assert rows["u1"]["md_chars"] == len("# A\n\nb c")
    assert rows["u2"]["markdown"] == "" and rows["u2"]["n_blocks"] == 0
