"""V1→V2 conversion engine core (F5-F10, M1 in SURVEY.md §2.4/§2.5).

Reimplements ``/root/reference/v2migration/engine/index.ts`` semantics
exactly, including the JS quirks the outputs depend on:

* ``DEFINED_TAGS_REGEX`` — alternation over the 197 tag keys in INSERTION
  order (first-match-wins ties are order-sensitive), dots escaped, anchored
  ``(<|^)…(>|$)`` (index.ts:12-20);
* ``extractTagsFromDefinition`` — only a LEADING run of tag words is
  harvested (the ``i === tags.length`` check, index.ts:107);
* ``splitToExampleObject`` — returns None unless the string starts ``{``,
  contains ``}`` and does not end ``}`` (index.ts:146-161);
* ``convertDictionaryV1ToV2`` — order-preserving merge-by-spelling with the
  roman-numeral ``mergeWithExisting`` escape hatch (index.ts:182-206).

Everything is per-entry pure Python: inside Spark these run in the Arrow
batch of the postprocess UDF (SURVEY.md §7.0 — exactly one vectorized UDF
family, no per-row Python at the API level).
"""

from __future__ import annotations

import re

from html_parser_spark.jsstr import js_trim, js_trim_start, truthy
from html_parser_spark.resources import EXAMPLE_START_SYMBOLS, ROMAN_NUMERALS, TAGS

_DEFINED_TAGS = list(TAGS.keys())

DEFINED_TAGS_REGEX = re.compile(
    "(<|^)(" + "|".join(t.replace(".", r"\.") for t in _DEFINED_TAGS) + ")(>|$)"
)
DEFINED_TAGS_REGEX_WITHOUT_END_DOTS = re.compile(
    "(<|^)("
    + "|".join((t[:-1] if t.endswith(".") else t) for t in _DEFINED_TAGS)
    + ")(>|>.|$)"
)


def _match_all(regex: re.Pattern, s: str) -> list[str]:
    """JS ``str.match(/re/g)`` → list of full matches, or [] (JS null)."""
    return [m.group(0) for m in regex.finditer(s)]


_GT_NORM_RE = re.compile(r"(>\.|>)")
_MULTISPACE_RE = re.compile(r" +")


def extract_tags_from_definition(definition: str) -> tuple[list[str], str]:
    """F8 — engine/index.ts:97-117: harvest the leading run of tag words."""
    tags: list[str] = []
    kept: list[str] = []
    words = js_trim(
        _MULTISPACE_RE.sub(" ", _GT_NORM_RE.sub("> ", definition))
    ).split(" ")
    for i, word in enumerate(words):
        matches = _match_all(DEFINED_TAGS_REGEX, word) or _match_all(
            DEFINED_TAGS_REGEX_WITHOUT_END_DOTS, word
        )
        if matches and i == len(tags):
            tags.extend(matches)
        else:
            kept.append(word)
    # JS: .filter((word) => !!word).join(' ')
    return tags, " ".join(w for w in kept if truthy(w))


_LEADING_NUM_RE = re.compile(r"^\d(\.|\))", re.I | re.ASCII)  # JS \d is ASCII


def create_definition_object(definition: str) -> dict:
    """F9 — engine/index.ts:126-138."""
    tags, d = extract_tags_from_definition(definition)
    base = d if (len(d) > 0 or len(tags) > 0) else definition
    value = js_trim(_LEADING_NUM_RE.sub("", base, count=1))
    result = {"value": value}
    if tags:
        result["tags"] = tags
    return result


def split_to_example_object(definition: str) -> dict | None:
    """F10 — engine/index.ts:146-161: '{src} trl' → Example, else None."""
    trimmed = js_trim(definition)
    if trimmed.startswith("{") and "}" in trimmed and not trimmed.endswith("}"):
        close = trimmed.index("}")
        src = js_trim(trimmed[1:close])
        trl_with_tags = js_trim(trimmed[close + 1 :])
        tags, trl = extract_tags_from_definition(trl_with_tags)
        ex = {"src": src, "trl": trl, "raw": definition}
        if tags:
            ex["tags"] = tags
        return ex
    return None


def find_roman_numeral_prefix(trimmed_definition: str) -> str | None:
    """Longest-first roman-numeral prefix (engine/index.ts:49-70 + mapper use)."""
    for roman in ROMAN_NUMERALS:
        if trimmed_definition.startswith(roman):
            return roman
    return None


_ARABIC_NUM_RE = re.compile(r"^\d+\.", re.ASCII)
_ARABIC_NUM_OR_PAREN_RE = re.compile(r"^\d+(\.|\))", re.ASCII)


def remove_all_numerals_from_definition_start(
    definition: str, allow_paren: bool = False
) -> tuple[str, bool]:
    """F13 — tabRus.ts:36-57 (allow_paren=True) and the inline copies at
    lezRusBabakhanov.ts:46-62 / rusLezHajiyev.ts:104-120 (allow_paren=False).
    Returns (definition_without_numerals, merge_with_existing)."""
    merge = False
    trimmed = js_trim_start(definition)
    roman = find_roman_numeral_prefix(trimmed)
    if roman:
        merge = True
        # JS .replace(str, '') removes the FIRST occurrence in the RAW string
        definition = definition.replace(roman, "", 1)
        definition = js_trim_start(definition)
    arabic_re = _ARABIC_NUM_OR_PAREN_RE if allow_paren else _ARABIC_NUM_RE
    m = arabic_re.match(definition)
    if m:
        definition = js_trim_start(definition.replace(m.group(0), "", 1))
    return definition, merge


def has_one_more_closing_parenthesis(s: str) -> bool:
    """F11 — rusLezHajiyev.ts:15-17."""
    return s.count(")") - s.count("(") == 1


def merge_tags_with_definitions(arr: list[str], allow_paren: bool = False) -> list[str]:
    """F12 — rusLezHajiyev.ts:19-35 / tabRus.ts:18-34: re-attach fragments
    that don't start with a numeral as prefix of the next numbered one."""
    num_re = re.compile(r"^\d(\.|\))" if allow_paren else r"^\d\.", re.I | re.ASCII)
    result: list[str] = []
    temp_prefix: str | None = None
    for item in arr:
        if num_re.match(item):
            result.append(temp_prefix + " " + item if temp_prefix else item)
            temp_prefix = None
        else:
            temp_prefix = (temp_prefix + " " + item) if temp_prefix else item
    if truthy(temp_prefix):
        result.append(temp_prefix)
    return result


SEE_ALSO_RE = re.compile(r"^(<|)см.тж(\.|)(>|)")  # dots unescaped, as in the ref


def read_dictionary_json(path: str) -> dict:
    """S5 — engine/index.ts:77-90: JSON dictionary reader with envelope
    validation (throws unless name/expressionLanguageId/definitionLanguageId/
    dictionary are all present-and-truthy)."""
    import json

    with open(path, encoding="utf-8") as f:
        content = json.load(f)
    from html_parser_spark.jsstr import truthy as _truthy

    if not (
        _truthy(content.get("name"))
        and _truthy(content.get("expressionLanguageId"))
        and _truthy(content.get("definitionLanguageId"))
        and _truthy(content.get("dictionary"))
    ):
        raise ValueError("The JSON file does not contain a dictionary")
    return content


def convert_dictionary_v1_to_v2(dictionary: list[dict], custom_mapper) -> list[dict]:
    """M1 — engine/index.ts:182-206: order-preserving merge-by-spelling."""
    parsed_spellings: set[str] = set()
    expressions: list[dict] = []
    for old in dictionary:
        expression, merge_with_existing = custom_mapper(old)
        if merge_with_existing or expression["spelling"] in parsed_spellings:
            existing = next(
                (e for e in expressions if e["spelling"] == expression["spelling"]), None
            )
            if existing is not None:
                existing["details"].extend(expression["details"])
            else:
                expressions.append(expression)
        else:
            expressions.append(expression)
        parsed_spellings.add(expression["spelling"])
    return expressions


EXAMPLE_START_SYMBOL_SET = set(EXAMPLE_START_SYMBOLS)
