"""Format D — pdf2htmlEX dictionary/phrasebook pages.

The reference's only format-D code is the column-split prototype
``rus-lez-phrasebook/index.ts:1-36`` (P19): partition each line's child
elements into left/right columns at an x-threshold, scanning pages inside
``#page-container``.  ``parse_format_d`` reproduces that surface browser-free
(``x*`` class rules give each element's x).

``parse_format_d_entries`` EXCEEDS that prototype (the reference never got
further): it pairs each line into a (src, trl) dictionary entry using
pdf2htmlEX's class-token encoding directly — ``ff*``/``fc*`` tokens carry
font/color per run, nested spans override only the tokens they list, and the
headword run style is detected per document as the most frequent line-leading
color class that differs from the dominant body color.  Lines led by body
color merge into the previous entry's translation (continuation lines).
Works on style-stripped "cleanup" exports too (no CSS needed — the tokens
themselves are the signal).
"""

from __future__ import annotations

import re
from collections import Counter

from html_parser_spark.css import StyleResolver
from html_parser_spark.dom import Node, parse_html
from html_parser_spark.formats.layout import partition_elements_by_x
from html_parser_spark.jsstr import js_trim


def _resolved_left(el: Node, styles: StyleResolver) -> float:
    if el.kind != "element":
        return float("nan")
    v = styles.left(el).replace("px", "")
    try:
        return float(v)
    except ValueError:
        return float("nan")


def parse_format_d(html_text: str, threshold: float = 843.0) -> list[dict]:
    """Each text-bearing line div inside #page-container → two column halves."""
    return parse_format_d_doc(parse_html(html_text), threshold)


def parse_format_d_doc(doc: Node, threshold: float = 843.0) -> list[dict]:
    styles = StyleResolver(doc)
    containers = [
        el for el in doc.iter_elements() if el.attrs.get("id") == "page-container"
    ]
    scope = containers[0] if containers else doc
    out = []
    for div in scope.query_selector_all("div"):
        cls = div.class_list
        if not any(c.startswith("t") or c.startswith("ws") for c in cls):
            continue
        if len(js_trim(div.text_content)) <= 1:
            continue
        children = list(div.child_nodes)
        lefts = [_resolved_left(c, styles) for c in children]
        left_col, right_col = partition_elements_by_x(children, lefts, threshold)
        out.append(
            {
                "left": "".join(c.text_content for c in left_col),
                "right": "".join(c.text_content for c in right_col),
            }
        )
    return out


# --- real entry pairing (beyond the reference prototype) -------------------

_WS_COLLAPSE = re.compile(r"\s+")
_HAS_WORD = re.compile(r"[^\W_]", re.UNICODE)  # any letter or digit


def _line_runs(div: Node, base_ff: str | None, base_fc: str | None) -> list[tuple]:
    """Flatten a line div into (text, ff, fc) runs.  pdf2htmlEX nests spans
    whose class tokens override ONLY the font/color they carry; kerning
    spacers (``<span class="_ _1">``) are empty and contribute nothing."""
    runs: list[tuple] = []

    def walk(n: Node, ff, fc):
        if n.kind == "text":
            if n._text:
                runs.append((n._text, ff, fc))
            return
        if n.kind != "element":
            return
        cls = n.attrs.get("class")
        if cls:
            for c in cls.split():
                if c.startswith("ff"):
                    ff = c
                elif c.startswith("fc"):
                    fc = c
        for ch in n.children:
            walk(ch, ff, fc)

    for ch in div.children:
        walk(ch, base_ff, base_fc)
    return runs


def _div_tokens(div: Node) -> tuple[str | None, str | None]:
    ff = fc = None
    cls = div.attrs.get("class") or ""  # valueless class attr -> None
    for c in cls.split():
        if c.startswith("ff"):
            ff = c
        elif c.startswith("fc"):
            fc = c
    return ff, fc


def parse_format_d_entries(doc: Node) -> list[dict]:
    """Line divs → [(src, trl)] dictionary entries.

    1. Collect ``div.t`` line divs in document order (pages are ``div#pf*``).
    2. Dominant body color = the fc token covering the most text characters.
    3. A line whose first non-space run carries a different fc starts an
       entry: src = the leading same-colored runs, trl = the rest of the
       line.  Body-colored lines append to the open entry's trl.
    """
    line_divs = [
        d for d in doc.query_selector_all("div.t")
        if len(js_trim(d.text_content)) > 1  # prototype's innerText filter
    ]
    if not line_divs:
        return []
    lines = []
    color_chars: Counter = Counter()
    for d in line_divs:
        ff, fc = _div_tokens(d)
        runs = _line_runs(d, ff, fc)
        lines.append(runs)
        for txt, _ff, rfc in runs:
            stripped = js_trim(txt)
            if stripped and rfc:
                color_chars[rfc] += len(stripped)
    if not color_chars:
        return []
    body_fc = color_chars.most_common(1)[0][0]
    # discriminator: fc* color tokens when they vary; some pdf2htmlEX exports
    # set one color and distinguish headwords by FONT only — fall back to
    # ff* tokens (same dominant-token rule) when color carries no signal
    token_idx = 2
    head_token: str | None = None
    if len(color_chars) == 1:
        font_chars: Counter = Counter()
        for runs in lines:
            for txt, rff, _rfc in runs:
                stripped = js_trim(txt)
                if stripped and rff:
                    font_chars[rff] += len(stripped)
        if len(font_chars) <= 1:
            return []  # neither color nor font discriminates — no entries
        token_idx = 1
        body_fc = font_chars.most_common(1)[0][0]
        # Fonts carry LESS signal than colors: a page typically has one
        # headword color but several non-body fonts (bold headwords, italic
        # grammar labels, watermark faces).  "any non-body lead" would turn
        # every italic-led continuation line into a bogus entry, so in font
        # mode the headword face is pinned to the most frequent line-leading
        # token that differs from the body face.
        lead_chars: Counter = Counter()
        for runs in lines:
            lead = next((r for r in runs if js_trim(r[0])), None)
            if lead is not None and lead[1] is not None and lead[1] != body_fc:
                lead_chars[lead[1]] += 1
        if not lead_chars:
            return []
        head_token = lead_chars.most_common(1)[0][0]

    entries: list[dict] = []
    cur: dict | None = None
    for runs in lines:
        lead = next((r for r in runs if js_trim(r[0])), None)
        if lead is None:
            continue
        lead_fc = lead[token_idx]
        is_head = (
            lead_fc is not None
            and lead_fc != body_fc
            and (head_token is None or lead_fc == head_token)
        )
        if is_head:
            src_parts: list[str] = []
            trl_parts: list[str] = []
            pending: list[str] = []  # font mode: neutral punctuation buffer
            taking = True
            for run in runs:
                txt, fc = run[0], run[token_idx]
                if taking and (fc == lead_fc or not js_trim(txt)):
                    src_parts.extend(pending)
                    pending.clear()
                    src_parts.append(txt)
                elif (
                    taking
                    and head_token is not None
                    and not _HAS_WORD.search(txt)
                ):
                    # pdf2htmlEX often renders intra-headword hyphens/commas
                    # in the BODY face even when the surrounding headword is
                    # bold — a letterless run is neutral: it joins the src
                    # only if another headword-face run follows it
                    pending.append(txt)
                else:
                    taking = False
                    trl_parts.extend(pending)
                    pending.clear()
                    trl_parts.append(txt)
            trl_parts.extend(pending)
            cur = {"src": js_trim("".join(src_parts)), "trl": "".join(trl_parts)}
            entries.append(cur)
        elif lead_fc is not None and lead_fc != body_fc:
            # font mode: led by a non-body, non-headword face.  Watermarks /
            # running headers render the ENTIRE line in that face; a genuine
            # continuation line merely STARTS with it (an italic grammar
            # label, a collocation in small-caps) and mixes body text after.
            total = sum(len(js_trim(t)) for t, *_ in runs if js_trim(t))
            inface = sum(
                len(js_trim(r[0]))
                for r in runs
                if js_trim(r[0]) and r[token_idx] == lead_fc
            )
            if inface == total:
                continue  # single-face line — noise; keep the entry open
            if cur is not None:
                cur["trl"] += "".join(r[0] for r in runs)
        elif cur is not None:
            cur["trl"] += "".join(r[0] for r in runs)
    for e in entries:
        e["trl"] = js_trim(_WS_COLLAPSE.sub(" ", e["trl"]))
    # running headers/watermarks lead with a non-body color too but pair with
    # no translation — drop them (a real headword always carries a trl)
    return [e for e in entries if e["src"] and e["trl"]]
