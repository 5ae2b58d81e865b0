"""Format A — MS-Word-exported dictionary HTML with CSS classes.

Reimplements (from scratch, browser-free) the parse semantics of
``/root/reference/lez-rus-35k/index.ts`` (P1-P7 in SURVEY.md §2.3):

* P1  entry-line scan:      all ``p.af1`` paragraphs → childNode lists
* P2  sibling coalescing:   merge adjacent childNodes with equal className;
                            later ``af`` spans demoted to plain (index.ts:67-79)
* P3  anchor unwrap:        ``<a>`` flattened to children (index.ts:86-87)
* P4  run classifier:       af→spelling, a1→Tag iff (+'.') in TAGS else Plain,
                            aff0→inflection iff isInflection else Example,
                            #text/other→Plain (index.ts:88-114)
* P5  inflection detector:  parenthesis geometry over (prev, cur, next)
                            (index.ts:37-57)
* P6  line→entry fold       (index.ts:116-139)
* P7  continuation merge:   spelling-less lines append to previous entry
                            (index.ts:142-149)
* postProcessing:           paren-strip inflection + aggregateDefinitions
                            markup serialization (index.ts:154-163, utils.ts:5-29)

Replicated reference quirks (SURVEY.md §7.3 — golden = actual behavior):

* ``isInflection`` receives the PRE-aggregation ``line`` array but the
  POST-aggregation/flatten index ``i`` (index.ts:107) — and the coalescing
  step mutates ``textContent`` of nodes shared with ``line``, so the detector
  sees mutated text.  We reproduce both by mutating the same Node objects.
* The "wrongly parsed inflection" repair branch (index.ts:123-132) tests
  ``obj.inflection`` on an Example object — always undefined — so it is dead
  code; Examples always land in ``definitions``.
* JS truthiness: an empty-string spelling does not start an entry.
"""

from __future__ import annotations

from html_parser_spark.dom import Node, parse_html
from html_parser_spark.jsstr import has_leading_ws, has_trailing_ws, js_trim, truthy
from html_parser_spark.resources import TAGS


def _is_inflection(line: list[Node], i: int, el: Node) -> bool:
    """index.ts:37-57 — note ``line`` is the pre-aggregation childNode list
    while ``i`` indexes the post-aggregation flattened list."""
    trimmed = js_trim(el.text_content)
    cur_starts = trimmed.startswith("(")
    cur_ends = trimmed.endswith(")")
    prev_ends = (
        i > 0 and i - 1 < len(line) and js_trim(line[i - 1].text_content).endswith("(")
    )
    next_starts = i + 1 < len(line) and js_trim(line[i + 1].text_content).startswith(")")
    return (
        (cur_starts and cur_ends)
        or (prev_ends and cur_ends)
        or (cur_starts and next_starts)
        or (prev_ends and next_starts)
    )


def _classify_line(line: list[Node]) -> dict:
    """P2-P6 for one ``p.af1`` paragraph; returns {spelling?, inflection?, definitions}."""
    # P2 — aggregate sibling elements with the same className (mutates nodes,
    # visible through `line`, as in the browser).  `last`/`last_cls` track
    # aggregated[-1] without re-reading the class property each iteration
    # (identical semantics: a merge never changes the survivor's class, and
    # a demoted node's class becomes "").
    last = line[0]
    last_cls = last.class_name
    aggregated = [last]
    for k in range(1, len(line)):
        nxt = line[k]
        ncls = nxt.class_name
        if last_cls == ncls:
            last.text_content = last.text_content + nxt.text_content
        else:
            if ncls == "af":
                # only 'spelling' may carry af; later ones demoted to plain
                nxt.class_name = ""
                ncls = ""
            aggregated.append(nxt)
            last = nxt
            last_cls = ncls

    # P3 — anchor unwrap
    flat: list[Node] = []
    for el in aggregated:
        if el.tag == "a":  # tag is None for text/comment nodes
            flat.extend(el.children)
        else:
            flat.append(el)

    # P4/P5 classify + P6 fold, fused into one pass.  The intermediate objs
    # list of the reference is observationally equivalent to folding inline:
    # an af/aff0 run that survives the emptiness gate always has truthy text
    # (js_trim(text) non-empty ⇒ text non-empty), so {spelling}/{inflection}
    # objects always take their fold branch, and the Example+inflection
    # repair branch (index.ts:123-132) tests obj.inflection on an Example
    # object — always undefined — so it is dead code in the reference too.
    acc: dict = {"definitions": []}
    defs = acc["definitions"]
    for i, el in enumerate(flat):
        text = el.text_content
        if el.kind == "text" or not js_trim(text):
            defs.append({"text": text, "type": "Plain"})
            continue
        cn = el.attrs.get("class", "")
        if cn == "af":
            acc["spelling"] = text
        elif cn == "a1":
            # italic: tag iff (trimmed [+ '.']) is a known abbreviation
            jt = js_trim(text)
            tag_key = jt if text.endswith(".") else jt + "."
            if tag_key in TAGS:
                defs.append({"text": text, "type": "Tag"})
            else:
                defs.append({"text": text, "type": "Plain"})
        elif cn == "aff0":
            if _is_inflection(line, i, el):
                acc["inflection"] = text
            else:
                defs.append({"text": text, "type": "Example"})
        else:
            defs.append({"text": text, "type": "Plain"})
    return acc


def parse_lines(html_text: str) -> list[dict]:
    """P1-P7: html → raw entry list (pre-postProcessing), shape
    ``{spelling?, inflection?, definitions: [{text,type}|{spelling}...]}``."""
    return parse_lines_doc(parse_html(html_text))


def parse_lines_doc(doc: Node, line_elements: list[Node] | None = None) -> list[dict]:
    """P1-P7 over an already-parsed DOM.  NB MUTATES the tree (P2 coalescing
    assigns textContent; P4 demotes af classes) — run read-only passes like
    extract_text first.  ``line_elements`` lets the caller reuse one
    traversal (must be the ``p.af1`` elements in document order)."""
    entries: list[dict] = []
    for p in (
        line_elements if line_elements is not None else doc.query_selector_all("p.af1")
    ):
        line = list(p.child_nodes)
        if not line:
            # an empty <p class=af1></p> would throw in the reference; none
            # exist in the fixtures — skip defensively
            continue
        line_obj = _classify_line(line)
        # P7 — continuation merge
        if truthy(line_obj.get("spelling")):
            entries.append(line_obj)
        elif entries:
            entries[-1]["definitions"].extend(line_obj["definitions"])
    return entries


def add_tags_within_spaces(text: str, left: str, right: str) -> str:
    """utils.ts:5-9 — wrap trimmed text preserving one leading/trailing space."""
    return (
        (" " if has_leading_ws(text) else "")
        + left
        + js_trim(text)
        + right
        + (" " if has_trailing_ws(text) else "")
    )


def aggregate_definitions(definitions: list[dict]) -> list[str]:
    """utils.ts:11-29 — serialize typed runs to ONE markup string:
    Example→{…}, Tag→<…>, Plain/other→raw text ('' if absent, as JS join)."""
    parts = []
    for d in definitions:
        t = d.get("type")
        if t == "Example":
            parts.append(add_tags_within_spaces(d["text"], "{", "}"))
        elif t == "Tag":
            parts.append(add_tags_within_spaces(d["text"], "<", ">"))
        else:
            txt = d.get("text")
            parts.append("" if txt is None else txt)
    return ["".join(parts)]


import re as _re

_PAREN_STRIP_RE = _re.compile(r"^\(|\)$", _re.M)


def post_process(entries: list[dict]) -> list[dict]:
    """index.ts:154-163 — V1 records with markup-serialized definitions."""
    out = []
    for exp in entries:
        rec = {"spelling": exp.get("spelling")}
        infl = exp.get("inflection")
        if infl is not None:
            rec["inflection"] = _PAREN_STRIP_RE.sub("", js_trim(infl))
        else:
            rec["inflection"] = None
        rec["definitions"] = aggregate_definitions(exp["definitions"])
        out.append(rec)
    return out


def parse_format_a(html_text: str) -> list[dict]:
    """Full format-A kernel: html text → list of V1 records
    ``{spelling, inflection|None, definitions: [str]}``."""
    return post_process(parse_lines(html_text))


def parse_format_a_doc(doc: Node, line_elements: list[Node] | None = None) -> list[dict]:
    """Same, over a shared parsed DOM (mutating — see parse_lines_doc)."""
    return post_process(parse_lines_doc(doc, line_elements))
