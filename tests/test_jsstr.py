"""Unit tests for JS string-semantics helpers (SURVEY.md §7.3 quirks)."""

from html_parser_spark.jsstr import (
    has_leading_ws,
    has_trailing_ws,
    js_trim,
    to_lower_case_lezgi,
    truthy,
)


def test_trim_strips_js_whitespace_set():
    # JS trim strips NBSP and BOM; Python str.strip() would keep the BOM
    assert js_trim("﻿\xa0 x  ") == "x"
    assert js_trim("  абв  ") == "абв"
    assert js_trim("") == ""


def test_leading_trailing_ws_match_js_regex():
    assert has_leading_ws("\xa0a")
    assert has_leading_ws("﻿a")
    assert not has_leading_ws("a ")
    assert has_trailing_ws("a　")
    assert not has_trailing_ws(" a")


def test_truthiness():
    assert not truthy(None)
    assert not truthy("")
    assert truthy("0")  # non-empty string truthy in JS
    assert not truthy(0)
    assert truthy([])  # empty array truthy in JS
    assert truthy({})


def test_to_lower_case_lezgi():
    # utils.ts:47-56 — palochka normalization after к/п/т/ц/ч
    assert to_lower_case_lezgi("КӀВАЛ") == "кIвал"
    assert to_lower_case_lezgi("кl") == "кI"
    assert to_lower_case_lezgi("ч!ал") == "чIал"
    assert to_lower_case_lezgi("абв", capitalize=True) == "Абв"
    # no normalization when not after the trigger consonants
    assert to_lower_case_lezgi("а1") == "а1"
