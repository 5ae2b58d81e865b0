"""HTML table extraction: pages → one row per ``<tr>``.

Web tables are one of the highest-value structured-data payloads a
Common-Crawl-style corpus carries (WDC Web Table Corpus, WikiTables):
relation extraction, QA-pair mining, and grounding datasets all start
from "give me every table row with its cells as clean text".  The
reference walks dictionary pages only; this is the same DOM machinery
aimed at the generic-table surface.

Semantics (deliberately small and closed-form, so the oracle can state
expected rows exactly):

* tables are numbered in document (pre-)order, nested tables included —
  a table inside a ``<td>`` is its own table with its own rows;
* a ``<tr>`` attaches to the NEAREST open ``<table>`` ancestor (so
  ``thead``/``tbody`` wrappers are transparent and a nested table's rows
  never leak into its host);
* cells are the row's direct ``<td>``/``<th>`` children in order; cell
  text is whitespace-collapsed ``textContent`` (a nested table's text is
  therefore PART of its host cell, and separately its own rows);
* ``colspan=N`` repeats the cell value N times (capped) so downstream
  column alignment works on the cells array; ``is_header`` is true when
  any cell is a ``<th>``.

Scale shape: ONE Arrow-batched pandas UDF over html (pure per-page map,
zero shuffle) followed by a narrow ``explode`` — the same plan as the
anchor/metadata kernels.  Per-page output is bounded by ``max_rows`` so
one pathological page cannot blow an Arrow batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

TABLE_ROWS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("table_idx", T.IntegerType()),
            T.StructField("row_idx", T.IntegerType()),
            T.StructField("is_header", T.BooleanType()),
            T.StructField("cells", T.ArrayType(T.StringType())),
        ]
    )
)

_MAX_COLSPAN = 1000


def extract_page_tables(
    html_bytes: bytes, max_rows: int = 10_000
) -> list[dict]:
    """One page → [{table_idx, row_idx, is_header, cells}] in document
    order (the UDF kernel; unit-testable alone)."""
    from html_parser_spark.dom import decode_html_bytes, parse_html

    root = parse_html(decode_html_bytes(html_bytes if html_bytes else b""))
    out: list[dict] = []
    next_table = 0

    # EXPLICIT stack, not recursion (the same discipline as the dom.py
    # walkers): a crawl page with thousands of nested elements must not
    # blow the interpreter recursion limit inside an executor UDF.
    # Processing at POP time with reversed-children pushes IS the DFS
    # pre-order the table numbering contract requires; ctx is the
    # [table_idx, next_row_idx] of the nearest open table, or None.
    stack: list[tuple] = [(root, None)]
    while stack and len(out) < max_rows:
        el, ctx = stack.pop()
        tag = el.tag if el.kind == "element" else None
        if tag == "table":
            ctx = [next_table, 0]
            next_table += 1
        elif tag == "tr" and ctx is not None:
            cells: list[str] = []
            is_header = False
            for c in el.children:
                if c.kind != "element" or c.tag not in ("td", "th"):
                    continue
                if c.tag == "th":
                    is_header = True
                txt = " ".join(c.text_content.split())
                span = c.attrs.get("colspan")
                try:
                    n = max(1, min(int(span), _MAX_COLSPAN)) if span else 1
                except (TypeError, ValueError):
                    n = 1
                cells.extend([txt] * n)
            out.append(
                {
                    "table_idx": ctx[0],
                    "row_idx": ctx[1],
                    "is_header": is_header,
                    "cells": cells,
                }
            )
            ctx[1] += 1
        stack.extend(
            (ch, ctx)
            for ch in reversed(el.children)
            if ch.kind == "element"
        )
    return out


def extract_tables(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages → (url, table_idx, row_idx, is_header, n_cells, cells): one
    output row per ``<tr>``.  ONE Arrow UDF + a narrow explode — no
    shuffle at any scale."""

    @F.pandas_udf(TABLE_ROWS_TYPE)
    def _udf(html: pd.Series) -> pd.Series:
        from html_parser_spark.ops.tables import extract_page_tables

        return pd.Series([extract_page_tables(b) for b in html])

    rows = pages.select(
        F.col(url_col).alias("url"), F.explode(_udf(F.col(html_col))).alias("r")
    )
    return rows.select(
        "url",
        F.col("r.table_idx").alias("table_idx"),
        F.col("r.row_idx").alias("row_idx"),
        F.col("r.is_header").alias("is_header"),
        F.size("r.cells").alias("n_cells"),
        F.col("r.cells").alias("cells"),
    )
