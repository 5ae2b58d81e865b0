"""Regenerate golden fixtures: per-fixture-page md5 of (extracted_text,
entries-JSON) + full entry dumps for one sample page per format.

Run: ``python tests/make_golden.py``  (writes tests/golden/*.json)

The golden files pin the CURRENT kernel behavior so any semantic drift in
dom/css/format parsers fails ``tests/test_golden.py``.  Structural parity
with the reference is separately asserted by ``tests/test_parity_tab.py``
against the reference's committed output.
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from html_parser_spark.data.pages import fixture_pages_rows
from html_parser_spark.kernel import parse_document

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

SAMPLES = {
    "lez-rus-35k/dictionary/letters/A_Bukva.html",
    "rus-lez-35k/dictionary/BUKVA1.HTM",
    "tab-rus-25k/dictionary/40.html",
    "lez-eng/dictionary/Lezgi-English-Dictionary_cleanup_1-15p.html",
}


def canon(obj) -> str:
    return json.dumps(obj, ensure_ascii=False, sort_keys=True, separators=(",", ":"))


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    index = {}
    samples = {}
    for url, _ts, html, _text, lang in fixture_pages_rows():
        rel = url.replace("file:///", "")
        res = parse_document(bytes(html))
        assert res["error"] is None, (rel, res["error"])
        text = res["extracted_text"] or ""
        entries_json = canon(res["entries"])
        index[rel] = {
            "fmt": res["fmt"],
            "n_entries": res["n_entries"],
            "text_len": len(text),
            "text_md5": hashlib.md5(text.encode("utf-8")).hexdigest(),
            "entries_md5": hashlib.md5(entries_json.encode("utf-8")).hexdigest(),
        }
        if rel in SAMPLES:
            samples[rel] = {
                "extracted_text_head": text[:400],
                "entries_head": res["entries"][:8],
            }
    with open(os.path.join(GOLDEN_DIR, "fixture_index.json"), "w", encoding="utf-8") as f:
        json.dump(index, f, ensure_ascii=False, indent=1, sort_keys=True)
    with open(os.path.join(GOLDEN_DIR, "samples.json"), "w", encoding="utf-8") as f:
        json.dump(samples, f, ensure_ascii=False, indent=1, sort_keys=True)
    print(f"wrote golden for {len(index)} fixture pages")


if __name__ == "__main__":
    main()
