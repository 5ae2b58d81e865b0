"""Shared broadcast-able data tables (pure data, shipped in UDF closures).

* ``TAGS`` — 197 grammatical-abbreviation → expansion entries, insertion order
  preserved (data table transcribed from ``/root/reference/tags.ts:1-208``;
  order matters because the v2 engine builds an alternation regex over the
  keys — ``/root/reference/v2migration/engine/index.ts:12-20``).
* ``EXAMPLE_START_SYMBOLS`` — 19 bullet glyphs that mark example blocks
  (``engine/index.ts:22-42``).
* ``ROMAN_NUMERALS`` — I..XX longest-first (``engine/index.ts:44-70``).
"""

from __future__ import annotations

import importlib.resources as _ir
import json

# zip-safe load: on executors the package may be imported from the
# addPyFile/--py-files zip, where plain open() on a path fails
TAGS: dict[str, str] = json.loads(
    _ir.files("html_parser_spark").joinpath("resources/tags.json").read_text("utf-8")
)

EXAMPLE_START_SYMBOLS = [
    "♦", "☼", "⦿", "▪", "▫", "◊", "○", "●", "■", "□",
    "▲", "▼", "◆", "◇", "★", "☆", "☽", "☾", "�",
]

_ROMAN_ASC = [
    "I", "II", "III", "IV", "V", "VI", "VII", "VIII", "IX", "X",
    "XI", "XII", "XIII", "XIV", "XV", "XVI", "XVII", "XVIII", "XIX", "XX",
]
ROMAN_NUMERALS = list(reversed(_ROMAN_ASC))  # longest/greatest-first prefix match
