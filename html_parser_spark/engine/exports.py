"""M12/M13 — parallel-corpus and training-data exports.

* M12 — examples → parallel sentence pairs
  (/root/reference/v2migration/postProcessing/99_pp_examplesToParallelCorpus.ts):
  examples with both src∧trl; the Russian side is split on
  ``/[<]*букв[.]*[>]*|\\d\\)|;/`` with ``см.``-piece filtering and paren strip.
* M13 — spelling × definition cartesian (within one entry) + example pairs,
  cleaned through the F17-F22 chain
  (99_v2DictToJsonL.ts): tag scrub (``см`` poisons the pair), name-description
  strip, see-also heuristic, enumeration strip, comma-list split with
  word-count-consistency test, Lezgi lowercasing.
  The reference's ``randomItem`` question templates use ``Math.random``; our
  JSONL writer picks deterministically by pair index (F23 seeded-rand note in
  SURVEY.md §2.4) — the committed CSV export doesn't use templates at all.
"""

from __future__ import annotations

import re

from html_parser_spark.jsstr import js_trim, to_lower_case_lezgi, truthy
from html_parser_spark.resources import TAGS

_STANDARDIZED_SET = set(TAGS.keys())

# --- M12 ------------------------------------------------------------------

_CORPUS_SPLIT_RE = re.compile(r"[<]*букв[.]*[>]*|\d\)|;")


def map_examples(examples: list[dict] | None, lez_key: str, rus_key: str) -> list[dict]:
    """99_pp_examplesToParallelCorpus.ts:27-52."""
    if not examples:
        return []
    out: list[dict] = []
    for ex in examples:
        if not ex or not (truthy(ex.get("src")) and truthy(ex.get("trl"))):
            continue
        rus = ex[rus_key]
        lez = ex[lez_key]
        if _CORPUS_SPLIT_RE.search(rus):
            for piece in _CORPUS_SPLIT_RE.split(rus):
                if (
                    truthy(piece)
                    and len(js_trim(piece)) > 0
                    and "см." not in piece
                    and "см>" not in piece
                ):
                    out.append(
                        {"lez": lez, "rus": js_trim(piece.replace("(", "").replace(")", ""))}
                    )
        else:
            out.append({"lez": lez, "rus": rus})
    return out


def examples_to_parallel_corpus(expressions: list[dict], lez_key: str, rus_key: str) -> list[dict]:
    """:54-70 — walk expression- and defDetail-level examples."""
    result: list[dict] = []
    for expression in expressions:
        for details in expression["details"]:
            pairs = map_examples(details.get("examples"), lez_key, rus_key)
            for dd in details["definitionDetails"]:
                pairs.extend(map_examples(dd.get("examples"), lez_key, rus_key))
            result.extend(pairs)
    return result


# --- M13 ------------------------------------------------------------------

_TAG_CHARS_RE = re.compile(r"(<|>|,)")


def is_tag(tag: str) -> bool:
    """F17 — 99_v2DictToJsonL.ts:21-32: word is a WRAPPED known tag."""
    clean = js_trim(_TAG_CHARS_RE.sub("", tag))
    return clean != tag and (clean in _STANDARDIZED_SET or (clean + ".") in _STANDARDIZED_SET)


def clean_from_tags(s: str) -> str | None:
    """F17 — :33-44: drop tag words; a ``см`` tag poisons the whole string."""
    kept = []
    for word in s.split(" "):
        if not is_tag(word):
            kept.append(word)
        elif "см" in word:
            return None
    return js_trim(" ".join(kept))


_NAME_DESC_RE = re.compile(r".*прописное имя.*- ", re.M)


def remove_name_description(s: str) -> str:
    """F19 — :147-150."""
    return _NAME_DESC_RE.sub("", s)


_LEZGI_DIGRAPHS = ("гь", "гъ", "къ", "хь", "хъ", "уь")


def is_see_also(s: str, is_russian: bool) -> bool:
    """F20 — :152-166: braces, or Lezgi letters inside a Russian string."""
    s = to_lower_case_lezgi(s)
    return (
        "{" in s
        or "}" in s
        or (is_russian and ("I" in s or any(d in s for d in _LEZGI_DIGRAPHS)))
    )


# re.ASCII: JS \b uses ASCII \w, so \bI\b matches the latin I INSIDE a
# Cyrillic word (e.g. 'чIал' → 'чал') — caught by the executed-reference
# differential; Python's default Unicode \b would not fire there
_ROMAN_WORD_RE = re.compile(r"\b(I|II|III|IV|V|VI|VII|VIII|IX|X)\b", re.ASCII)
_LEADING_ENUM_RE = re.compile(r"^\d[\)|\.][\s|]", re.ASCII)


def remove_enumerations(s: str) -> str:
    """F21 — :168-172."""
    return _LEADING_ENUM_RE.sub("", _ROMAN_WORD_RE.sub("", js_trim(s)))


_COMMA_RE = re.compile(r",")
_SENT_PUNCT_RE = re.compile(r"[.!?]")
_WS_SPLIT_RE = re.compile(r"\s+")


def split_comma_separated_lists(s: str, word_count_deviation_threshold: int = 2) -> list[str]:
    """F22 — :174-207."""
    commas = _COMMA_RE.findall(s)
    sentence_punct = _SENT_PUNCT_RE.findall(s)
    parts = s.split(",")
    has_unmatched = any(p.count("(") != p.count(")") for p in parts)
    word_counts = [len(_WS_SPLIT_RE.split(js_trim(p))) for p in parts]
    avg = sum(word_counts) / len(word_counts)
    consistent = all(abs(c - avg) <= word_count_deviation_threshold for c in word_counts)
    if len(commas) > len(sentence_punct) and not has_unmatched and consistent:
        return [js_trim(p) for p in parts]
    return [s]


def split_semicolons(src_text: str, trl_text: str) -> list[list[str]]:
    """F18 — :135-145."""
    if ";" in src_text:
        return [[p, trl_text] for p in src_text.split(";")]
    if ";" in trl_text:
        return [[src_text, p] for p in trl_text.split(";")]
    return [[src_text, trl_text]]


def create_training_pairs(lezgi_text: str, rus_text: str) -> list[tuple[str, str]]:
    """The F18→F19→F20→F21→F17→F22 chain (:212-260).  NB the reference swaps
    to (rus, lez) order inside, and the output rows are (rus, lez)."""
    pairs = split_semicolons(lezgi_text, rus_text)
    swapped = [(remove_name_description(r), l) for l, r in pairs]
    filtered = [(r, l) for r, l in swapped if not (is_see_also(r, True) or is_see_also(l, False))]
    enum_removed = [(remove_enumerations(r), remove_enumerations(l)) for r, l in filtered]
    tag_removed = []
    for r, l in enum_removed:
        cr, cl = clean_from_tags(r), clean_from_tags(l)
        if cr is not None and cl is not None:
            tag_removed.append((cr, cl))
    combos: list[tuple[str, str]] = []
    for r, l in tag_removed:
        for rp in split_comma_separated_lists(r):
            for lp in split_comma_separated_lists(l):
                combos.append((rp, lp))
    cleaned = [
        (to_lower_case_lezgi(r), to_lower_case_lezgi(l))
        for r, l in combos
    ]
    return [(r, l) for r, l in cleaned if js_trim(r) != "" and js_trim(l) != ""]


def _example_pairs(examples: list[dict] | None, is_src_lezgi: bool) -> list[tuple[str, str]]:
    """:117-131."""
    if not examples:
        return []
    out: list[tuple[str, str]] = []
    for ex in examples:
        if not ex or not (truthy(ex.get("src")) and truthy(ex.get("trl"))):
            continue
        if is_src_lezgi:
            out.extend(create_training_pairs(ex["src"], ex["trl"]))
        else:
            out.extend(create_training_pairs(ex["trl"], ex["src"]))
    return out


def expressions_to_training_pairs(
    expressions: list[dict], is_src_lezgi: bool
) -> list[tuple[str, str]]:
    """M13 — :262-302: example pairs + spelling×definition cartesian (bounded
    per entry; never a Spark crossJoin)."""
    rows: list[tuple[str, str]] = []
    for expression in expressions:
        definition_strings: list[str] = []
        for details in expression["details"]:
            rows.extend(_example_pairs(details.get("examples"), is_src_lezgi))
            for dd in details["definitionDetails"]:
                rows.extend(_example_pairs(dd.get("examples"), is_src_lezgi))
                for d in dd["definitions"]:
                    definition_strings.append(d["value"])
        spellings = expression["spelling"]
        if isinstance(spellings, str):
            spellings = [spellings]
        for spelling in spellings:
            for definition in definition_strings:
                if is_src_lezgi:
                    rows.extend(create_training_pairs(spelling, definition))
                else:
                    rows.extend(create_training_pairs(definition, spelling))
    return rows


QUESTION_TEMPLATES = [
    "How do you say this in Lezgi?",
    "Translate this to Lezgi:",
    "Translate this to Lezgi language:",
    "How to say this in Lezgi?",
    "How to say this in Lezgi language?",
    "What is this in Lezgi?",
    "What is this in Lezgi language?",
    "What is the Lezgi translation of this?",
    "Как сказать это по-лезгински?",
    "Переведи это на лезгинский:",
    "Переведи это на лезгинский язык:",
    "Как сказать это по-лезгински?",
    "Как сказать это на лезгинском языке?",
    "Что это на лезгинском?",
    "Что это на лезгинском языке?",
    "Как переводится это на лезгинский?",
]


def training_pair_to_chat_row(rus: str, lez: str, pair_index: int, use_templates: bool = True) -> dict:
    """F23 — deterministic template pick (pair_index % N instead of
    Math.random; seeded for reproducibility)."""
    content = (
        f"{QUESTION_TEMPLATES[pair_index % len(QUESTION_TEMPLATES)]}: {rus}"
        if use_templates
        else rus
    )
    return {
        "messages": [
            {"role": "user", "content": content},
            {"role": "assistant", "content": lez},
        ]
    }
