"""Format detection — a cheap string probe of the document head.

The reference hard-wires one parser per directory; our engine receives a mixed
stream of pages, so we dispatch on DOM fingerprints that uniquely identify
each source format (verified against all 372 fixture pages):

* A — Word-HTML with CSS classes: ``p.af1`` lines (lez-rus-35k/index.ts:59)
* B — Word-HTML with inline styles: ``p.a7``/``p.msonormal`` lines + red
      headwords (rus-lez-35k/parser.js:11-14)
* C — idrviewer PDF→HTML: absolutely-positioned ``span`` with per-id
      ``{left;bottom}`` CSS (tab-rus-25k/index.ts:51-75)
* D — pdf2htmlEX: ``#sidebar``/``#page-container`` + ``ff*/fs*/x*/y*`` classes
      (rus-lez-phrasebook/index.ts)
* generic — anything else → boilerplate-strip text extraction only (P20)
"""

from __future__ import annotations

import re

FORMAT_A = "A"
FORMAT_B = "B"
FORMAT_C = "C"
FORMAT_D = "D"
FORMAT_GENERIC = "generic"


_C_STYLE_RE = re.compile(r"#t\w+\{left:")
_C_SHELL_RE = re.compile(r'<div id="p\d+"')


def detect_format(html_text: str) -> str:
    head = html_text[:8192]
    body_probe = html_text[:200000]
    if (
        "pdf2htmlEX" in head
        or 'id="page-container"' in body_probe
        or 'class="pf ' in head
    ):
        return FORMAT_D
    if "idrviewer" in head or _C_STYLE_RE.search(head) or _C_SHELL_RE.search(head):
        return FORMAT_C
    if 'class="af1"' in html_text or "p.af1" in head:
        return FORMAT_A
    if (
        "p.a7" in head
        or 'class="a7"' in body_probe
        or "class=a7" in body_probe
        or "msonormal" in body_probe.lower()
    ):
        return FORMAT_B
    return FORMAT_GENERIC
