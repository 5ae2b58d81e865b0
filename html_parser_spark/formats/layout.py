"""Layout-analysis primitives (P18, P19 in SURVEY.md §2.3).

* P18 — column-offset detection (``tab-rus-25k/browserScriptTest.js:25-50``):
  histogram of ``floor(left/10)*10`` over uppercase runs; the top-2 buckets
  are the two text columns; headwords filtered to ±10px of those offsets.
* P19 — two-column page split (``rus-lez-phrasebook/index.ts:1-21``, WIP in
  the reference): partition a line's elements into left/right columns at an
  x-threshold.  The reference reads ``getBoundingClientRect()``; browser-free
  we resolve ``left`` from the pdf2htmlEX ``x*`` / idrviewer ``#id`` CSS rules
  (no layout engine → ``rect.x + rect.width`` approximated by the resolved
  ``left``; widths are not computable statically, documented divergence).
"""

from __future__ import annotations

import math
from collections import Counter


def _left_px(text_obj: dict) -> float:
    v = text_obj["style"]["left"].replace("px", "")
    try:
        return float(v)
    except ValueError:
        return float("nan")


def column_offsets(text_objects: list[dict], top_n: int = 2) -> list[int]:
    """P18 — the ``top_n`` most frequent 10px-rounded left offsets of
    uppercase runs (browserScriptTest.js:30-44)."""
    counts: Counter[int] = Counter()
    for t in text_objects:
        if t.get("isUpperCase"):
            left = _left_px(t)
            if left == left:  # not NaN
                counts[int(math.floor(left / 10.0) * 10)] += 1
    return [off for off, _ in counts.most_common(top_n)]


def filter_headwords_by_offset(text_objects: list[dict], offsets: list[int], tol: int = 10) -> list[dict]:
    """P18 second half (browserScriptTest.js:115-141): uppercase runs within
    ±tol of a detected column offset."""
    out = []
    for t in text_objects:
        if not t.get("isUpperCase"):
            continue
        left = _left_px(t)
        if any(off - tol < left < off + tol for off in offsets):
            out.append(t)
    return out


def partition_elements_by_x(elements: list, lefts: list[float], threshold: float):
    """P19 — split ``elements`` into (list1, list2) at the first element whose
    x reaches ``threshold``; text nodes (left=NaN) never flip the switch,
    mirroring the reference's ``el.nodeType !== 3`` guard."""
    list1, list2 = [], []
    adding_to_1 = True
    for el, left in zip(elements, lefts):
        if adding_to_1 and left == left and left >= threshold:
            adding_to_1 = False
        (list1 if adding_to_1 else list2).append(el)
    return list1, list2
