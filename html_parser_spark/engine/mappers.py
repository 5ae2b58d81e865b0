"""Per-dictionary V1→V2 custom mappers (M2-M6 in SURVEY.md §2.5).

Reimplements the three reference mappers with their exact quirks:

* ``map_lez_rus_babakhanov`` — /root/reference/v2migration/lezRusBabakhanov.ts:13-131
* ``map_rus_lez_hajiyev``    — /root/reference/v2migration/rusLezHajiyev.ts:37-189
* ``map_tab_rus``            — /root/reference/v2migration/tabRus.ts:95-228

Quirks kept on purpose (golden = actual reference behavior):

* the bullet branch slices ``definition[1:]`` on the RAW string, so a
  leading space means the bullet glyph is NOT removed (trimmedDefinition is
  only used for the membership check);
* ``см.тж`` carve-out regex has unescaped dots (matches any char there);
* roman-numeral removal replaces the first occurrence in the raw string,
  not an anchored prefix;
* Babakhanov pushes ``{raw: piece}`` even for empty pieces, Hajiyev only for
  non-empty ones; tabRus has no bullet branch at all.
"""

from __future__ import annotations

import re

from html_parser_spark.engine.core import (
    EXAMPLE_START_SYMBOL_SET,
    SEE_ALSO_RE,
    create_definition_object,
    has_one_more_closing_parenthesis,
    merge_tags_with_definitions,
    remove_all_numerals_from_definition_start,
    split_to_example_object,
    DEFINED_TAGS_REGEX,
    DEFINED_TAGS_REGEX_WITHOUT_END_DOTS,
    _match_all,
)
from html_parser_spark.jsstr import js_trim, js_trim_start, truthy
from html_parser_spark.resources import EXAMPLE_START_SYMBOLS


def _split_definitions_with_example_carry(
    definition_without_numeral: str,
    details: dict,
    inflection_hook=None,
) -> None:
    """M3 — the shared ';'-split with previous-example carry, appending the
    resulting DefinitionDetails (or top-level examples) to ``details``."""
    if ";" in definition_without_numeral:
        examples: list[dict] = []
        is_previous_example = False
        definitions: list[dict] = []
        for d in definition_without_numeral.split(";"):
            d = js_trim(d)
            if not (truthy(d) and len(d) > 0):
                continue
            piece = inflection_hook(d) if inflection_hook else d
            definition_result = create_definition_object(piece)
            example_obj = split_to_example_object(definition_result["value"])
            if example_obj:
                if definition_result.get("tags"):
                    example_obj["tags"] = definition_result["tags"]
                examples.append(example_obj)
                is_previous_example = True
                continue
            elif is_previous_example and not SEE_ALSO_RE.match(js_trim(piece)):
                examples[-1]["trl"] = examples[-1].get("trl", "") + f"; {piece}"
                examples[-1]["raw"] = examples[-1].get("raw", "") + f"; {piece}"
                continue
            is_previous_example = False
            definitions.append(definition_result)
        dd = {"definitions": definitions}
        if examples:
            dd["examples"] = examples
        details["definitionDetails"].append(dd)
    else:
        piece = (
            inflection_hook(definition_without_numeral)
            if inflection_hook
            else definition_without_numeral
        )
        definition_result = create_definition_object(piece)
        example_obj = split_to_example_object(definition_result["value"])
        if example_obj:
            if definition_result.get("tags"):
                example_obj["tags"] = definition_result["tags"]
            details["examples"].append(example_obj)
        else:
            details["definitionDetails"].append({"definitions": [definition_result]})


def _bullet_example_block(definition: str, details: dict, push_empty_raw: bool) -> None:
    """M2 — the EXAMPLE_START_SYMBOLS branch (lezRusBabakhanov.ts:24-43 /
    rusLezHajiyev.ts:82-101).  NB: slice(1) on the RAW definition."""
    did_push = False
    for ex_str in js_trim(definition[1:]).split(";"):
        example_obj = split_to_example_object(js_trim(ex_str))
        if example_obj:
            details["examples"].append(example_obj)
            did_push = True
        elif did_push:
            details["examples"][-1]["trl"] = (
                details["examples"][-1].get("trl", "") + f"; {js_trim(ex_str)}"
            )
            details["examples"][-1]["raw"] = (
                details["examples"][-1].get("raw", "") + f"; {js_trim(ex_str)}"
            )
        elif push_empty_raw or len(js_trim(ex_str)) > 0:
            details["examples"].append({"raw": ex_str})


def _finish(entry: dict, details: dict, merge_with_existing: bool):
    if not truthy(details.get("inflection")):
        details.pop("inflection", None)
    if len(details["examples"]) == 0:
        details.pop("examples")
    return (
        {"spelling": entry["spelling"], "details": [details]},
        merge_with_existing,
    )


def _strip_leading_numerals(definition: str, allow_paren: bool) -> tuple[str, bool]:
    return remove_all_numerals_from_definition_start(definition, allow_paren=allow_paren)


def map_lez_rus_babakhanov(entry: dict):
    """lezRusBabakhanov.ts:13-131."""
    merge_with_existing = False
    details = {
        "inflection": entry.get("inflection"),
        "definitionDetails": [],
        "examples": [],
    }
    for definition in entry["definitions"]:
        trimmed = js_trim_start(definition)
        if trimmed[:1] in EXAMPLE_START_SYMBOL_SET and trimmed[:1]:
            _bullet_example_block(definition, details, push_empty_raw=True)
        else:
            stripped, merge = _strip_leading_numerals(definition, allow_paren=False)
            if merge:
                merge_with_existing = True
            _split_definitions_with_example_carry(stripped, details)
    return _finish(entry, details, merge_with_existing)


_NUMBERED_RE_B = re.compile(r"^.+\d\.", re.I | re.ASCII)  # JS \d is ASCII
_NUM_SPLIT_RE_B = re.compile(r"(?=\d\.)", re.I | re.ASCII)
_BULLET_SPLIT_RE = re.compile("(?=" + "|".join(EXAMPLE_START_SYMBOLS) + ")")
_TRAILING_OPEN_PAREN_RE = re.compile(r"\($", re.I)


def _numbered_presplit(definition: str, num_split_re: re.Pattern, allow_paren: bool) -> list[str]:
    """M4 — rusLezHajiyev.ts:50-66 / tabRus.ts:111-127."""
    pieces = []
    for d in num_split_re.split(definition):
        result = js_trim(_TRAILING_OPEN_PAREN_RE.sub("", d))
        if has_one_more_closing_parenthesis(result):
            if result.endswith(")"):
                result = result[:-1]
            elif result.endswith(")."):
                result = result[:-2]
        pieces.append(result)
    return merge_tags_with_definitions(pieces, allow_paren=allow_paren)


def map_rus_lez_hajiyev(entry: dict):
    """rusLezHajiyev.ts:37-189."""
    merge_with_existing = False
    details = {
        "inflection": entry.get("inflection"),
        "definitionDetails": [],
        "examples": [],
    }
    prepared: list[str] = []
    for definition in entry["definitions"]:
        if _NUMBERED_RE_B.match(definition):
            prepared.extend(_numbered_presplit(definition, _NUM_SPLIT_RE_B, allow_paren=False))
        else:
            prepared.append(definition)
    prepared = [d for d in prepared if truthy(d) and len(d) > 0]
    # M5 — bullet pre-split (lookahead keeps the symbol on the next piece)
    split2: list[str] = []
    for d in prepared:
        split2.extend(js_trim(p) for p in _BULLET_SPLIT_RE.split(d))
    definitions = [d for d in split2 if truthy(d) and len(d) > 0]

    for definition in definitions:
        trimmed = js_trim_start(definition)
        if trimmed[:1] in EXAMPLE_START_SYMBOL_SET and trimmed[:1]:
            _bullet_example_block(definition, details, push_empty_raw=False)
        else:
            stripped, merge = _strip_leading_numerals(definition, allow_paren=False)
            if merge:
                merge_with_existing = True
            _split_definitions_with_example_carry(stripped, details)
    return _finish(entry, details, merge_with_existing)


_NUMBERED_RE_C = re.compile(r"^.+\d(\.|\))", re.I | re.ASCII)
_NUM_SPLIT_RE_C = re.compile(r"(?=\d\.)|(?=\d\))", re.I | re.ASCII)
_LEADING_ANGLE_RE = re.compile(r"^<[^>]*>", re.I)


def _extract_inflections(definition: str, details: dict) -> str:
    """F14 — tabRus.ts:68-93: leading <…> groups that are NOT tags become the
    detail inflection (first only)."""
    found = _match_all(_LEADING_ANGLE_RE, definition)
    inflections = [
        w
        for w in found
        if not DEFINED_TAGS_REGEX.search(w)
        and not DEFINED_TAGS_REGEX_WITHOUT_END_DOTS.search(w)
    ]
    if inflections:
        if not truthy(details.get("inflection")):
            details["inflection"] = inflections[0].replace("<", "").replace(">", "")
            without = js_trim(definition.replace(inflections[0], "", 1))
            without, _ = remove_all_numerals_from_definition_start(without, allow_paren=True)
            return without
        # reference logs 'Multiple inflections' and keeps the definition
    return definition


def map_tab_rus(entry: dict):
    """tabRus.ts:95-228."""
    merge_with_existing = False
    details = {
        "inflection": entry.get("inflection"),
        "definitionDetails": [],
        "examples": [],
    }
    # F15 — tilde expansion
    lower_spelling = entry["spelling"].lower().replace("i", "I")
    prepared: list[str] = []
    for definition in entry["definitions"]:
        definition = definition.replace("~", lower_spelling)
        if _NUMBERED_RE_C.match(definition):
            prepared.extend(_numbered_presplit(definition, _NUM_SPLIT_RE_C, allow_paren=True))
        else:
            prepared.append(definition)
    definitions = [d for d in prepared if truthy(d) and len(d) > 0]

    def hook(d: str) -> str:
        return _extract_inflections(d, details)

    for definition in definitions:
        stripped, merge = _strip_leading_numerals(definition, allow_paren=True)
        if merge:
            merge_with_existing = True
        _split_definitions_with_example_carry(stripped, details, inflection_hook=hook)
    return _finish(entry, details, merge_with_existing)


MAPPERS = {
    "lez_rus_babakhanov": map_lez_rus_babakhanov,
    "rus_lez_hajiyev": map_rus_lez_hajiyev,
    "tab_rus": map_tab_rus,
}
