"""Post-processing passes M7-M10 (SURVEY.md §2.5) over V2 dictionaries.

Reimplements, with reference quirks preserved:

* M7 tag standardization + M8 common-tag hoisting —
  /root/reference/v2migration/postProcessing/01_tagsMappingAndGrouping.ts
  (the pending ``tagDefinition`` carries across defDetails within one
  ExpressionDetails; ``mapTags`` runs BEFORE ``checkIsDefinitionTag`` so a
  tag-definition applies from the NEXT definition on);
* M9 example extraction — 02_examplesExtraction.ts (NB the reference checks
  ``example !== null`` against a function that returns ``undefined`` — so a
  value matching ``/^\\{.*\\}[^"]+/`` is ALWAYS moved, pushing a null
  example when the parse fails; replicated with ``None``);
* M10 spelling split (V2 → V2.1) — 03_splitSpelling.ts with the three
  per-dictionary split rules.

All passes are per-expression pure functions → they run inside the same
Arrow-batched UDF stage as the parse (no extra shuffle).
"""

from __future__ import annotations

import re

from html_parser_spark.engine.core import (
    DEFINED_TAGS_REGEX,
    DEFINED_TAGS_REGEX_WITHOUT_END_DOTS,
    split_to_example_object,
)
from html_parser_spark.jsstr import js_trim, truthy
from html_parser_spark.resources import TAGS

STANDARDIZED_TAGS = list(TAGS.keys())
_STANDARDIZED_SET = set(STANDARDIZED_TAGS)
DEFAULT_SEE_ALSO_TAG = "см."
DEFAULT_POSTPOSITION_TAG = "посл."

_TRAILING_DOT_RE = re.compile(r"\.$")
_TAG_CHARS_RE = re.compile(r"(<|>|,)")
_CAND_SPLIT_RE = re.compile(r"[,|.]")


def _matches_tag(s: str) -> bool:
    return bool(DEFINED_TAGS_REGEX.search(s)) or bool(
        DEFINED_TAGS_REGEX_WITHOUT_END_DOTS.search(s)
    )


def candidates_to_tags(tag_candidates: list[str]) -> list[str]:
    """F25 — 01_tagsMappingAndGrouping.ts:33-67: reverse-order re-join of
    split tag fragments until the alternation matches."""
    temp_tag_parts = ""
    processed: list[str] = []
    for tag in reversed(tag_candidates):
        joined = _TRAILING_DOT_RE.sub(
            "", (tag + "." + temp_tag_parts).replace("..", ".")
        )
        if _matches_tag(joined):
            processed.append(joined)
            temp_tag_parts = ""
        elif _matches_tag(tag):
            processed.append(tag)
        else:
            temp_tag_parts = joined
    return processed


def process_missed_tags(def_value: str) -> tuple[list[str], list[str]]:
    """F26 — harvest ``<…>`` groups left inside definition values."""
    if def_value is None:
        return [], []
    tags_strings = [tc for tc in def_value.split(">") if truthy(tc) and "<" in tc]
    candidates = []
    for tc in tags_strings:
        for part in _CAND_SPLIT_RE.split(js_trim(tc.replace("<", ""))):
            if truthy(part) and len(part) > 0:
                candidates.append(part)
    return candidates_to_tags(candidates), [tc + ">" for tc in tags_strings]


_not_matching_tags: list[str] = []  # reference logs these; we collect for metrics


def tag_mapper(tag: str) -> str:
    """F24 — 01_tagsMappingAndGrouping.ts:79-88."""
    clean = js_trim(_TAG_CHARS_RE.sub("", tag))
    if clean not in _STANDARDIZED_SET:
        clean += "."
    if clean not in _STANDARDIZED_SET:
        _not_matching_tags.append(clean)
    return clean


def map_tags(tags: list[str] | None, tag_definition: str | None) -> list[str]:
    """F24 — :90-103."""
    new_tags = [tag_mapper(t) for t in tags] if tags else []
    if truthy(tag_definition) and "см.тж." not in new_tags and "см." not in new_tags:
        new_tags.append(tag_mapper(tag_definition))
    return [
        DEFAULT_SEE_ALSO_TAG
        if t == "см.тж."
        else (DEFAULT_POSTPOSITION_TAG if t == "послелог." else t)
        for t in new_tags
    ]


def check_is_definition_tag(value: str) -> bool:
    """F27 — :105-116."""
    return (
        _matches_tag(value)
        and " " not in value
        and "-" not in value
        and ("." in value or "<" in value or ">" in value or "," in value)
    )


def move_common_tags(def_detail: dict) -> bool:
    """M8 — :123-182.  Returns True when tags were hoisted."""
    defs = def_detail.get("definitions")
    if not defs:
        return False
    without_see = [
        d for d in defs if DEFAULT_SEE_ALSO_TAG not in (d.get("tags") or [])
    ]
    if len(without_see) < 2:
        return False
    common = list(without_see[0].get("tags") or [])
    for d in without_see:
        dtags = d.get("tags") or []
        for i in range(len(common) - 1, -1, -1):
            if common[i] not in dtags:
                common.pop(i)
    if (
        not common
        and len(without_see) > 1
        and without_see[0].get("tags")
        and all(not d.get("tags") for d in without_see[1:])
    ):
        common.extend(without_see[0]["tags"])
    for d in without_see:
        if d.get("tags"):
            d["tags"] = [t for t in d["tags"] if t not in common]
            if not d["tags"]:
                del d["tags"]
    if not common:
        return False
    dd_tags = def_detail.setdefault("tags", [])
    for t in common:
        if t not in dd_tags:
            dd_tags.append(t)
    if not dd_tags:
        del def_detail["tags"]
        return False
    return True


def standardize_expression_tags(expression: dict) -> dict:
    """M7 — the full per-expression sweep (:190-261).  Mutates and returns
    ``expression``; counters are returned on the side via attributes set on
    the function (mirrors the reference's console counters)."""
    for expression_details in expression["details"]:
        tag_definition: str | None = None
        for def_detail in expression_details["definitionDetails"]:
            tag_definition_def_idx: int | None = None
            for i, d in enumerate(def_detail["definitions"]):
                standardize_expression_tags.amount_of_definitions += 1
                processed_tags, tags_strings = process_missed_tags(d.get("value"))
                if processed_tags:
                    if not d.get("tags"):
                        d["tags"] = processed_tags
                    else:
                        d["tags"].extend(processed_tags)
                    value = d["value"]
                    for ts in tags_strings:
                        value = value.replace(ts, "")
                    d["value"] = js_trim(value)
                new_tags = map_tags(d.get("tags"), tag_definition)
                if new_tags:
                    d["tags"] = new_tags
                if check_is_definition_tag(d["value"]):
                    tag_definition = d["value"]
                    tag_definition_def_idx = i
                    standardize_expression_tags.tag_definitions_count += 1
            if tag_definition_def_idx is not None:
                def_detail["definitions"] = [
                    d
                    for i, d in enumerate(def_detail["definitions"])
                    if i != tag_definition_def_idx
                ]
            for example in def_detail.get("examples") or []:
                if example and example.get("tags"):
                    example["tags"] = [tag_mapper(t) for t in example["tags"]]
            if move_common_tags(def_detail):
                standardize_expression_tags.fixed_common_tags_count += 1
        new_dd = [
            dd
            for dd in expression_details["definitionDetails"]
            if len(dd["definitions"]) > 0 or len(dd.get("examples") or []) > 0
        ]
        if len(new_dd) != len(expression_details["definitionDetails"]):
            expression_details["definitionDetails"] = new_dd
        for example in expression_details.get("examples") or []:
            if example and example.get("tags"):
                example["tags"] = [tag_mapper(t) for t in example["tags"]]
    return expression


standardize_expression_tags.tag_definitions_count = 0
standardize_expression_tags.amount_of_definitions = 0
standardize_expression_tags.fixed_common_tags_count = 0


_EXAMPLE_IN_DEF_RE = re.compile(r'^\{.*\}[^"]+')


def extract_examples(expression: dict) -> int:
    """M9 — 02_examplesExtraction.ts:17-51.  Returns extracted count."""
    count = 0
    for expression_details in expression["details"]:
        for def_detail in expression_details["definitionDetails"]:
            found = []
            for d in def_detail["definitions"]:
                tags = d.get("tags")
                if _EXAMPLE_IN_DEF_RE.match(d["value"]) and (
                    tags is None
                    or len(tags) == 0
                    or len([t for t in tags if "см" in t]) == 0
                ):
                    example = split_to_example_object(d["value"])
                    # reference bug kept: `example !== null` is true for
                    # undefined too → the definition is always moved, a failed
                    # parse becomes a null example
                    def_detail["examples"] = (def_detail.get("examples") or []) + [
                        example
                    ]
                    found.append(id(d))
                    count += 1
            if found:
                def_detail["definitions"] = [
                    d for d in def_detail["definitions"] if id(d) not in found
                ]
    return count


_PARENS_CONTENT_RE = re.compile(r"\([^\)]*\)", re.M)
_PARENS_CHARS_RE = re.compile(r"[\(|\)]", re.M)
_EXCL_SPLIT_RE = re.compile(r"(?<=!)")


def split_parentheses_spelling(spelling: str) -> list[str]:
    """F16 — 03_splitSpelling.ts:15-19."""
    return [
        js_trim(_PARENS_CONTENT_RE.sub("", spelling)),
        js_trim(_PARENS_CHARS_RE.sub("", spelling)),
    ]


def split_spelling_babakhanov(spelling: str) -> list[str]:
    if "(" in spelling:
        return split_parentheses_spelling(spelling)
    return [spelling]


def split_spelling_hajiyev(spelling: str) -> list[str]:
    if "," in spelling:
        return [js_trim(s) for s in spelling.split(",")]
    if "! " in spelling:
        parts = _EXCL_SPLIT_RE.split(spelling)
        if parts and parts[-1] == "":
            parts.pop()  # JS split on a zero-width match adds no trailing ''
        return [js_trim(s) for s in parts]
    return [spelling]


def split_spelling_tab(spelling: str) -> list[str]:
    if "/" in spelling:
        out: list[str] = []
        for s in spelling.split("/"):
            if "(" in s:
                out.extend(split_parentheses_spelling(s))
            else:
                out.append(js_trim(s))
        return out
    return [spelling]


SPELLING_SPLITTERS = {
    "lez_rus_babakhanov": split_spelling_babakhanov,
    "rus_lez_hajiyev": split_spelling_hajiyev,
    "tab_rus": split_spelling_tab,
}


def split_spelling(expression: dict, splitter) -> dict:
    """M10 — V2 → V2.1: ``spelling`` becomes ARRAY<STRING>."""
    return {"spelling": splitter(expression["spelling"]), "details": expression["details"]}
