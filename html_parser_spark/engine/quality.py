"""M15 — the 11-rule data-quality analyzer.

Reimplements ``/root/reference/v2migration/qualityCheck.ts:64-255``: per
expression, boolean/collector rules → a report record + aggregate counters.

Reference quirks kept:

* ``spellingWithRandomChars`` is overwritten per spelling variant — the LAST
  variant wins (``expression.spelling.forEach`` assignment, :175-178);
* an expression only contributes to the aggregate stats if its analysis
  result is non-empty (:230-247);
* the ``examplesStoredAsDefinitions`` rule reuses M9's regex + ``см``-tag
  carve-out (:219-226).
"""

from __future__ import annotations

import re

_RANDOM_SPELLING_RE = re.compile(r"[^а-яА-ЯёЁI!?\(\)-]")
_RANDOM_SPELLING_NOSPACE_RE = re.compile(r"[^а-яА-ЯёЁI!?\(\) -]")
_RANDOM_INFLECTION_RE = re.compile(r"[^а-яёI\/, -]")
_UPPER_RUN_RE = re.compile(r".*([А-ЯЁ]{2})")
_STARTS_PAREN_RE = re.compile(r"^\(")
_STARTS_RANDOM_RE = re.compile(r"^[^а-яА-ЯёЁ\{\[]")
_STARTS_TAG_RE = re.compile(r"^<")
_ENDS_CURLY_RE = re.compile(r".*\{$")
_EXAMPLE_AS_DEF_RE = re.compile(r'^\{.*\}[^"]+')

RULE_COLUMNS = [
    "spellingWithRandomChars",
    "spellingWithRandomCharsIgnoreSpaces",
    "inflectionsWithRandomChars",
    "definitionsContainingExpressions",
    "definitionsStartingWithParenthesis",
    "definitionsStartingWithRandomChars",
    "examplesContainingExpressions",
    "definitionsStartingWithTags",
    "stringsEndingWithCurlyBraces",
    "examplesStoredAsDefinitions",
    "tagInExpressionDetails",
]


def analyze_expression(expression: dict) -> dict:
    """One V2.1 expression → analysis record (spelling list kept as-is)."""
    ar = {
        "spellingWithRandomChars": False,
        "spellingWithRandomCharsIgnoreSpaces": False,
        "inflectionsWithRandomChars": None,
        "tagInExpressionDetails": False,
        "definitionsContainingExpressions": [],
        "definitionsStartingWithParenthesis": [],
        "definitionsStartingWithRandomChars": [],
        "examplesContainingExpressions": [],
        "definitionsStartingWithTags": [],
        "stringsEndingWithCurlyBraces": [],
        "examplesStoredAsDefinitions": [],
    }
    spellings = expression["spelling"]
    if isinstance(spellings, str):  # V2 shape tolerated
        spellings = [spellings]
    for spelling in spellings:
        # reference overwrites per variant — last one wins
        ar["spellingWithRandomChars"] = bool(_RANDOM_SPELLING_RE.search(spelling))
        ar["spellingWithRandomCharsIgnoreSpaces"] = bool(
            _RANDOM_SPELLING_NOSPACE_RE.search(spelling)
        )
    for details in expression["details"]:
        infl = details.get("inflection")
        if infl and _RANDOM_INFLECTION_RE.search(infl):
            ar["inflectionsWithRandomChars"] = infl
        if details.get("tags") is not None:
            ar["tagInExpressionDetails"] = True
        for example in details.get("examples") or []:
            if example and _UPPER_RUN_RE.match(example.get("raw") or ""):
                ar["examplesContainingExpressions"].append(example["raw"])
        for dd in details["definitionDetails"]:
            for example in dd.get("examples") or []:
                if example and _UPPER_RUN_RE.match(example.get("raw") or ""):
                    ar["examplesContainingExpressions"].append(example["raw"])
            for d in dd["definitions"]:
                v = d["value"]
                if _UPPER_RUN_RE.match(v):
                    ar["definitionsContainingExpressions"].append(v)
                if _STARTS_PAREN_RE.match(v):
                    ar["definitionsStartingWithParenthesis"].append(v)
                if _STARTS_RANDOM_RE.match(v):
                    ar["definitionsStartingWithRandomChars"].append(v)
                if _STARTS_TAG_RE.match(v):
                    ar["definitionsStartingWithTags"].append(v)
                if _ENDS_CURLY_RE.match(v):
                    ar["stringsEndingWithCurlyBraces"].append(v)
                tags = d.get("tags")
                if _EXAMPLE_AS_DEF_RE.match(v) and (
                    tags is None
                    or len(tags) == 0
                    or len([t for t in tags if "см" in t]) == 0
                ):
                    ar["examplesStoredAsDefinitions"].append(v)
    return ar


def is_empty(ar: dict) -> bool:
    return (
        ar["spellingWithRandomChars"] is False
        and ar["spellingWithRandomCharsIgnoreSpaces"] is False
        and ar["inflectionsWithRandomChars"] is None
        and not ar["definitionsContainingExpressions"]
        and not ar["definitionsStartingWithParenthesis"]
        and not ar["definitionsStartingWithRandomChars"]
        and not ar["examplesContainingExpressions"]
        and not ar["definitionsStartingWithTags"]
        and not ar["stringsEndingWithCurlyBraces"]
        and not ar["examplesStoredAsDefinitions"]
        and ar["tagInExpressionDetails"] is False
    )


def split_candidates(expressions: list[dict]) -> tuple[list[tuple], dict]:
    """M16 — postProcessing/definitionSplitter.ts:14-43: definitions that
    contain a comma but no parens/braces and no ``см``-tags are candidates
    for further splitting.  Returns (candidate rows, counters)."""
    amount_of_definitions = 0
    rows: list[tuple] = []
    for expression in expressions:
        for details in expression["details"]:
            for dd in details["definitionDetails"]:
                for d in dd["definitions"]:
                    amount_of_definitions += 1
                    v = d["value"]
                    tags = d.get("tags") or []
                    if (
                        "(" not in v
                        and "{" not in v
                        and "," in v
                        and "см.тж." not in tags
                        and "см." not in tags
                    ):
                        rows.append((expression["spelling"], v))
    return rows, {
        "amountOfExpressions": len(expressions),
        "amountOfDefinitions": amount_of_definitions,
        "splitCandidatesCount": len(rows),
    }


def analyze_dictionary(expressions: list[dict]) -> tuple[dict, list[tuple[str, dict]]]:
    """qualityCheck.ts:153-255 — (aggregate stats, per-expression report rows
    for non-empty results, keyed by joined spelling)."""
    stats = {
        "amountOfExpressions": 0,
        "amountOfSpellings": 0,
        "expressionsWithRandomChars": 0,
        "expressionsWithRandomCharsIgnoreSpaces": 0,
        "inflectionsWithRandomChars": 0,
        "definitionsContainingExpressions": 0,
        "definitionsStartingWithParenthesis": 0,
        "definitionsStartingWithRandomChars": 0,
        "examplesContainingExpressions": 0,
        "definitionsStartingWithTags": 0,
        "stringsEndingWithCurlyBraces": 0,
        "examplesStoredAsDefinitions": 0,
        "tagsInExpressionDetails": 0,
    }
    reports: list[tuple[str, dict]] = []
    for expression in expressions:
        stats["amountOfExpressions"] += 1
        spellings = expression["spelling"]
        if isinstance(spellings, str):
            spellings = [spellings]
        stats["amountOfSpellings"] += len(spellings)
        ar = analyze_expression(expression)
        if not is_empty(ar):
            reports.append((",".join(spellings), ar))
            stats["expressionsWithRandomChars"] += 1 if ar["spellingWithRandomChars"] else 0
            stats["expressionsWithRandomCharsIgnoreSpaces"] += (
                1 if ar["spellingWithRandomCharsIgnoreSpaces"] else 0
            )
            stats["inflectionsWithRandomChars"] += 1 if ar["inflectionsWithRandomChars"] else 0
            for key in (
                "definitionsContainingExpressions",
                "definitionsStartingWithParenthesis",
                "definitionsStartingWithRandomChars",
                "examplesContainingExpressions",
                "definitionsStartingWithTags",
                "stringsEndingWithCurlyBraces",
                "examplesStoredAsDefinitions",
            ):
                stats[key] += len(ar[key])
            stats["tagsInExpressionDetails"] += 1 if ar["tagInExpressionDetails"] else 0
    return stats, reports
