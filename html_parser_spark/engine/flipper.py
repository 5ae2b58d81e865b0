"""M11 — dictionary flipper (the inverted index; the one genuine shuffle).

Reimplements ``/root/reference/v2flipper/flipper.ts:10-125``:

1. every definition value (minus ``см``-tagged ones) becomes a candidate
   flipped expression whose single definition is the original spelling,
   carrying the defDetail+expressionDetails examples;
2. single-word filter (no space/-,/braces, has letters);
3. comma-separated definitions split into parts (parens stripped), each part
   re-filtered;
4. group by flipped spelling, merging ``details`` lists.

Divergence from the reference, documented: flipper.ts:100 shallow-copies the
expression (``{...exp}``) so split parts share ONE details array and the
grouping at :114-123 mutates it — aliasing that makes its output
ill-defined (and its sink is commented out at :136).  We deep-copy per part
and merge into fresh lists.  The reference groups ONLY the comma-split
candidates (:114-125); ``flip_expressions(include_single_words=True)`` also
unions the single-word set — the complete inverted index its TODOs describe.

The Spark version (``flip_dictionary_df``) is the per-row fan-out in an
Arrow batch + one real ``groupBy(flipped_spelling).agg(flatten(collect_list))``
shuffle — uniform keys (headwords), no skew handling needed.
"""

from __future__ import annotations

import re

from html_parser_spark.engine.core import (
    DEFINED_TAGS_REGEX,
    DEFINED_TAGS_REGEX_WITHOUT_END_DOTS,
)
from html_parser_spark.jsstr import js_trim

_WORD_RE = re.compile(r"([А-ЯЁа-яё\-]+)", re.I)


def single_word_filter(s: str) -> bool:
    """flipper.ts:65-72."""
    return (
        s != ""
        and " " not in s
        and "-" not in s
        and "," not in s
        and "{" not in s
        and "}" not in s
        and bool(_WORD_RE.search(s))
    )


def _flip_candidates(expression: dict) -> list[dict]:
    """flipper.ts:10-63 — all flipped candidates of one expression."""
    out = []
    spelling = expression["spelling"]
    if isinstance(spelling, list):  # V2.1 tolerated: use joined variants
        spelling = spelling[0] if spelling else ""
    for detail in expression["details"]:
        exp_examples = detail.get("examples") or []
        for dd in detail["definitionDetails"]:
            dd_examples = dd.get("examples") or []
            for d in dd["definitions"]:
                tags = d.get("tags")
                if tags is not None and len(tags) > 0 and "см" in " ".join(tags):
                    continue
                examples = [e for e in (list(dd_examples) + list(exp_examples)) if e]
                flipped_dd = {
                    "definitions": [{"value": spelling, "tags": d.get("tags")}]
                }
                if examples:
                    flipped_dd["examples"] = examples
                out.append(
                    {
                        "spelling": d["value"],
                        "details": [{"definitionDetails": [flipped_dd]}],
                    }
                )
    return out


def flip_expressions(
    expressions: list[dict], include_single_words: bool = True
) -> tuple[list[dict], dict]:
    """Full flip: returns (grouped flipped expressions, counters)."""
    all_defs: list[dict] = []
    for e in expressions:
        all_defs.extend(_flip_candidates(e))

    single_word = [e for e in all_defs if single_word_filter(e["spelling"])]
    tag_as_definition = [
        e
        for e in single_word
        if DEFINED_TAGS_REGEX.search(e["spelling"])
        or DEFINED_TAGS_REGEX_WITHOUT_END_DOTS.search(e["spelling"])
    ]
    comma_separated = [
        e
        for e in all_defs
        if "," in e["spelling"]
        and e["spelling"] != ""
        and "-" not in e["spelling"]
        and "{" not in e["spelling"]
        and "}" not in e["spelling"]
    ]
    split_comma: list[dict] = []
    for e in comma_separated:
        for part in e["spelling"].split(","):
            cand = {
                "spelling": js_trim(part.replace("(", "").replace(")", "")),
                "details": [dict(d) for d in e["details"]],
            }
            if single_word_filter(cand["spelling"]):
                split_comma.append(cand)

    candidates = split_comma + (single_word if include_single_words else [])
    grouped: dict[str, dict] = {}
    for c in candidates:
        g = grouped.get(c["spelling"])
        if g is not None:
            g["details"] = g["details"] + c["details"]
        else:
            grouped[c["spelling"]] = {
                "spelling": c["spelling"],
                "details": list(c["details"]),
            }
    counters = {
        "tag_as_definition": len(tag_as_definition),
        "single_word_definitions": len(single_word),
        "comma_separated_definitions": len(comma_separated),
        "split_comma_separated_definitions": len(split_comma),
        "grouped_expressions": len(grouped),
    }
    return list(grouped.values()), counters
