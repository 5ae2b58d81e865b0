"""Format D — pdf2htmlEX two-column pages (WIP in the reference too).

The reference's only format-D code is the column-split prototype
``rus-lez-phrasebook/index.ts:1-36`` (P19): partition each line's child
elements into left/right columns at an x-threshold, scanning pages inside
``#page-container``.  We reproduce that surface browser-free: ``x*`` class
rules (pdf2htmlEX emits ``.x12{left:...px}``) give each element's x.

Output mirrors the prototype: per page, a list of (left_column_text,
right_column_text) line pairs — the phrasebook's src/trl halves.
"""

from __future__ import annotations

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
