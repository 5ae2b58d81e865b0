"""Structural parity vs the reference's committed tab-rus output.

``tab_rus_dict_hanmagomedov_shalbuzov.json`` (9,071 entries) is the one real
end-to-end output the reference repo commits — but it passed through MANUAL
editor fixes after parsing (`tab-rus-25k/result/Replace patterns` documents
regex repairs, OCR fixes, and hand-merged page transitions;
``refinement.ts:4`` reads ``dictionary_manual_check.json``).  Exact parity is
therefore impossible by construction; these thresholds pin the measured
match rate of our code-faithful parse so regressions are caught.
"""

import json
import os
import re

import pytest

from html_parser_spark.dom import decode_html_bytes
from html_parser_spark.formats.format_c import postprocess_spans, refine, scan_spans
from html_parser_spark.jsstr import js_trim
from tests.conftest import REFERENCE, fixture_path


@pytest.fixture(scope="module")
def corpus_entries():
    d = fixture_path("tab-rus-25k", "dictionary")
    files = sorted(
        (f for f in os.listdir(d) if re.match(r"^\d+\.html$", f)),
        key=lambda f: int(f.split(".")[0]),
    )
    spans = []
    for f in files:
        with open(os.path.join(d, f), "rb") as fh:
            spans.extend(scan_spans(decode_html_bytes(fh.read())))
    return refine(postprocess_spans(spans))


@pytest.fixture(scope="module")
def reference_entries():
    p = fixture_path("tab-rus-25k", "result", "tab_rus_dict_hanmagomedov_shalbuzov.json")
    with open(p, encoding="utf-8") as f:
        return json.load(f)["dictionary"]


def test_corpus_scale_and_match_rates(corpus_entries, reference_entries):
    assert len(reference_entries) == 9071
    # our parse lands within 5% of the reference entry count
    assert abs(len(corpus_entries) - len(reference_entries)) / len(reference_entries) < 0.05

    def key(e):
        return (js_trim(e["spelling"]), js_trim(" ".join(e.get("definitions", [""]))))

    mine = {key(e) for e in corpus_entries}
    ref = {key(e) for e in reference_entries}
    record_rate = len(mine & ref) / len(ref)
    spell_rate = len(
        {js_trim(e["spelling"]) for e in corpus_entries}
        & {js_trim(e["spelling"]) for e in reference_entries}
    ) / len({js_trim(e["spelling"]) for e in reference_entries})
    # floors measured 2026-08: 37.5% exact records, 66.8% headwords — the
    # remainder is manual-edit drift (see module docstring), not parser drift
    assert record_rate >= 0.35, record_rate
    assert spell_rate >= 0.60, spell_rate
