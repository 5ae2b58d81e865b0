"""Property-based tests (hypothesis) for kernel invariants that must hold on
ARBITRARY input — the 10^12-document argument: no input may crash the kernel
or violate structural contracts."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from html_parser_spark.engine.core import (
    create_definition_object,
    extract_tags_from_definition,
    split_to_example_object,
)
from html_parser_spark.formats.format_b import split_numbered_definitions
from html_parser_spark.jsstr import js_trim, js_trim_end, js_trim_start, truthy
from html_parser_spark.kernel import parse_document

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_js_trim_consistency(s):
    assert js_trim(s) == js_trim_start(js_trim_end(s))
    t = js_trim(s)
    assert js_trim(t) == t  # idempotent
    assert len(t) <= len(s)


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_split_numbered_definitions_reassembles(s):
    """The splitter partitions the input: rejoining pieces (modulo the
    trim/newline normalization applied per piece) loses no non-space chars."""
    parts = split_numbered_definitions(s)
    joined = "".join(parts)
    canon = lambda x: "".join(js_trim(x).replace("\n", " ").split())
    assert canon(joined) == canon(s) or joined == ""


def _split_numbered_reference(text):
    """The reference's per-char loop (parser.js:49-69), verbatim port — the
    differential oracle for the vectorized splitter."""
    from html_parser_spark.formats.format_b import js_char_not_nan

    definitions = []
    open_brackets = 0
    curr = ""
    num_and_dot = 0
    n = len(text)
    for i in range(n):
        c = text[i]
        if c == "(":
            open_brackets += 1
        elif c == ")":
            open_brackets -= 1
        is_new_def = (
            js_char_not_nan(c) and i + 1 < n and text[i + 1] == "." and open_brackets == 0
        )
        if is_new_def:
            num_and_dot += 1
        if is_new_def and num_and_dot > 1:
            definitions.append(js_trim(curr).replace("\n", " "))
            curr = c
        else:
            curr += c
    if curr:
        definitions.append(js_trim(curr).replace("\n", " "))
    return definitions


@given(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd", "Zs", "Po", "Ps", "Pe"),
            whitelist_characters="().\n\t 0123456789\xa0﻿",
        ),
        max_size=300,
    )
)
@settings(max_examples=400, deadline=None)
def test_split_numbered_definitions_differential(s):
    assert split_numbered_definitions(s) == _split_numbered_reference(s)


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_extract_tags_total(s):
    tags, d = extract_tags_from_definition(s)
    assert isinstance(tags, list) and isinstance(d, str)
    r = create_definition_object(s)
    assert isinstance(r["value"], str)
    ex = split_to_example_object(s)
    if ex is not None:
        assert ex["raw"] == s
        assert js_trim(s).startswith("{")


@given(st.binary(max_size=2000))
@settings(max_examples=100, deadline=None)
def test_parse_document_never_raises(raw):
    res = parse_document(raw)
    assert res["error"] is None or isinstance(res["error"], str)
    assert isinstance(res["entries"], list)
    assert res["n_entries"] == len(res["entries"])


@given(
    st.lists(
        st.text(alphabet=string.ascii_lowercase + " ", min_size=0, max_size=50),
        max_size=8,
    )
)
@settings(max_examples=100, deadline=None)
def test_html_round_trip_structure(paras):
    html = (
        "<html><body>"
        + "".join(f'<p class="af1"><span class="af">H{i}</span>{p}</p>' for i, p in enumerate(paras))
        + "</body></html>"
    )
    res = parse_document(html.encode())
    assert res["error"] is None
    # every paragraph carries a non-empty headword → one entry each
    assert res["n_entries"] == len(paras)


_PF_DOC = st.lists(
    st.tuples(
        st.sampled_from(["fc0", "fc1", "fc2"]),
        st.text(alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs")), max_size=40),
    ),
    max_size=30,
)


@given(_PF_DOC)
@settings(max_examples=150, deadline=None)
def test_format_d_entries_total(lines):
    """parse_format_d_entries is total on arbitrary pdf2htmlEX-shaped pages
    and every produced entry has non-empty src AND trl."""
    from html_parser_spark.dom import parse_html
    from html_parser_spark.formats.format_d import parse_format_d_entries

    body = "".join(
        f'<div class="t m0 x1 y{i} ff1 fs0 {fc}">{t}</div>' for i, (fc, t) in enumerate(lines)
    )
    html = f'<html><body><div id="page-container"><div id="pf1">{body}</div></div></body></html>'
    entries = parse_format_d_entries(parse_html(html))
    assert all(e["src"] and e["trl"] for e in entries)


html_ish = st.lists(
    st.sampled_from(
        list(string.ascii_letters) + list(" <>/=\"'&;#-\n\t.") +
        ["<p>", "</p>", "<div ", "<a href=", "<nav>", "</nav>", "…"]
    ),
    max_size=120,
).map("".join)


@given(html_ish)
@settings(max_examples=150, deadline=None)
def test_extract_main_total_and_consistent(s):
    """Boilerplate kernel is total on arbitrary tag soup, and its counters
    are internally consistent."""
    from html_parser_spark.ops.boilerplate import extract_main

    r = extract_main(s.encode("utf-8", "surrogatepass"))
    assert r["n_content_blocks"] <= r["n_blocks"]
    assert r["content_chars"] >= 0 and r["boiler_chars"] >= 0
    # joined main_text length == content_chars + newline separators
    joins = max(0, r["n_content_blocks"] - 1)
    assert len(r["main_text"]) == r["content_chars"] + joins


@given(html_ish, st.sampled_from(
    ["https://h.example/dir/page.html", "http://a.b/x", ""]
))
@settings(max_examples=150, deadline=None)
def test_extract_meta_total(s, base):
    """Metadata kernel is total; outlinks are absolute http(s), deduped."""
    from html_parser_spark.ops.html_meta import extract_meta

    m = extract_meta(s.encode("utf-8", "surrogatepass"), base)
    assert len(m["outlinks"]) == len(set(m["outlinks"]))
    for u in m["outlinks"]:
        assert u.startswith(("http://", "https://")) and "#" not in u
    assert m["n_anchors"] >= len(m["outlinks"]) - (1 if base == "" else 0) - 1


def test_parse_robots_total_on_fuzz_corpus(spark):
    """robots parser never crashes on adversarial bodies and only ever
    emits allow/disallow rows with nonempty prefixes (one Spark job over
    a generated fuzz corpus rather than per-example jobs)."""
    import random

    from html_parser_spark.ops.robots import parse_robots

    rng = random.Random(7)
    atoms = ["User-agent", "Disallow", "Allow", ":", "/", "#", "\n", " ",
             "*", "a", "b", "::", "\t", "Crawl-delay", "sitemap"]
    bodies = [
        ("h%d" % i, "".join(rng.choice(atoms) for _ in range(rng.randrange(0, 60))))
        for i in range(200)
    ]
    df = spark.createDataFrame(bodies, ["host", "body"])
    rows = parse_robots(df).collect()
    assert all(r["rule"] in ("allow", "disallow") for r in rows)
    assert all(r["path_prefix"] != "" for r in rows)
    assert all(r["agent"] is not None for r in rows)


def _seq_pack_py(token_counts, L):
    """Sequential reference for pack_sequences' per-(seq,doc) arithmetic."""
    out, off = [], 0
    for did, n in enumerate(token_counts):
        n_slots = n + 1
        start, end = off, off + n_slots
        s = start // L
        while s * L < end:
            a, b = max(start, s * L), min(end, (s + 1) * L)
            out.append((s, did, a - s * L, a - start, b - a, b == end))
            s += 1
        off = end
    return out


@given(
    st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=48),
)
@settings(max_examples=200, deadline=None)
def test_pack_sequences_arithmetic_invariants(counts, L):
    """For ANY doc sizes and ANY L: slices are positive and contiguous per
    doc AND per sequence, every non-final sequence holds exactly L slots,
    total slots = tokens + one EOD per doc, and exactly one slice per doc
    carries the EOD flag."""
    rows = _seq_pack_py(counts, L)
    total = sum(r[4] for r in rows)
    assert total == sum(counts) + len(counts)
    # per-sequence: contiguous from 0; non-final sequences full
    by_seq = {}
    for s, _d, seq_off, _do, ln, _e in rows:
        by_seq.setdefault(s, []).append((seq_off, ln))
    assert sorted(by_seq) == list(range(len(by_seq)))
    for s, segs in by_seq.items():
        segs.sort()
        pos = 0
        for o, ln in segs:
            assert ln > 0 and o == pos
            pos += ln
        assert pos == L or s == max(by_seq)
    # per-doc: contiguous cover of [0, n+1), exactly one EOD slice (the last)
    by_doc = {}
    for s, d, _so, doc_off, ln, eod in rows:
        by_doc.setdefault(d, []).append((doc_off, ln, eod))
    for d, segs in by_doc.items():
        segs.sort()
        pos = 0
        for o, ln, eod in segs:
            assert o == pos
            pos += ln
            assert eod == (pos == counts[d] + 1)
        assert pos == counts[d] + 1


@given(st.lists(st.tuples(
    st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8),
    st.integers(min_value=1, max_value=50)), min_size=0, max_size=20))
@settings(max_examples=150, deadline=None)
def test_train_bpe_total_and_valid(freqs):
    """train_bpe never raises on arbitrary word-frequency tables, and every
    merge's components are buildable from characters + earlier merges (the
    property the oracle's sequential replace chain relies on)."""
    from html_parser_spark.ops.bpe import EOW, train_bpe

    merges = train_bpe(freqs, n_merges=12)
    known = set("abcdefghijklmnopqrstuvwxyz") | {EOW}
    for a, b in merges:
        assert a in known and b in known
        known.add(a + b)


@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, width=32
        ),
        min_size=1,
        max_size=32,
    )
)
@settings(max_examples=300, deadline=None)
def test_int8_quantization_bound_and_range(xs):
    """The SQ8 math property (pure IEEE-double replay of the Spark/DuckDB
    expression): q = floor(x*127/max|x|) stays in [-127, 127] and the
    dequantization error |x - q*max_abs/127| is below one quantization
    step.  Holds for arbitrary float32 vectors — the 10^12-vector
    argument that no input can push a value out of int8 range."""
    import math

    max_abs = max(abs(x) for x in xs)
    if max_abs == 0.0:
        return  # all-zero vectors quantize to all-zero by definition
    step = max_abs / 127.0
    for x in xs:
        q = math.floor(x * 127.0 / max_abs)
        assert -127 <= q <= 127
        assert abs(x - q * step) <= step * (1 + 1e-9)
