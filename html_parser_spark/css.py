"""Just-enough CSS cascade: the ``getComputedStyle`` replacement.

The reference reads computed style in two parsers:

* format B (``rus-lez-35k/parser.js:26,39-40``): ``color`` (headword-red
  filter ``rgb(192, 80, 77)``), ``fontStyle === 'italic'``,
  ``fontWeight === '700'``;
* format C (``tab-rus-25k/index.ts:55,66-69``): ``fontFamily``, ``fontSize``,
  ``left``, ``bottom`` of absolutely-positioned idrviewer spans.

All styles in every fixture are declared in the page's own ``<style>`` blocks
(single class/id/tag selectors) plus inline ``style=`` attributes, so a flat
specificity model — (id, class, tag) triples, document order tiebreak,
inline last — reproduces Chromium's answers exactly for these documents
(verified per-fixture in tests).  Supported selector forms: ``tag``,
``.class``, ``tag.class``, ``#id``, comma lists; pseudo-classes and
combinators are skipped (none affect the probed properties in the fixtures).

Quirks mode (no doctype — the rus-lez-35k pages) matches class names
ASCII-case-insensitively, as browsers do.
"""

from __future__ import annotations

import re

from html_parser_spark.dom import Node

INHERITED = ("color", "font-style", "font-weight", "font-family", "font-size")
POSITIONAL = ("left", "bottom")

_NAMED_COLORS = {
    "black": (0, 0, 0), "white": (255, 255, 255), "red": (255, 0, 0),
    "green": (0, 128, 0), "blue": (0, 0, 255), "maroon": (128, 0, 0),
    "purple": (128, 0, 128), "gray": (128, 128, 128), "grey": (128, 128, 128),
    "silver": (192, 192, 192), "yellow": (255, 255, 0), "navy": (0, 0, 128),
    "teal": (0, 128, 128), "olive": (128, 128, 0), "fuchsia": (255, 0, 255),
    "aqua": (0, 255, 255), "lime": (0, 255, 0), "orange": (255, 165, 0),
    "windowtext": (0, 0, 0),  # MS system color — Chromium maps to black
}


import functools


@functools.lru_cache(maxsize=4096)
def normalize_color(value: str) -> str | None:
    """CSS color value → Chromium computed form ``rgb(r, g, b)``.
    Returns None for values Chromium would reject (declaration dropped).
    Cached: stylesheets repeat a handful of colors thousands of times."""
    v = value.strip().lower()
    if v.startswith("#"):
        h = v[1:]
        if len(h) == 3:
            h = "".join(c * 2 for c in h)
        if len(h) == 6 and re.fullmatch(r"[0-9a-f]{6}", h):
            r, g, b = int(h[0:2], 16), int(h[2:4], 16), int(h[4:6], 16)
            return f"rgb({r}, {g}, {b})"
        return None
    if v in _NAMED_COLORS:
        r, g, b = _NAMED_COLORS[v]
        return f"rgb({r}, {g}, {b})"
    m = re.fullmatch(r"rgba?\(([^)]*)\)", v)
    if m:
        parts = [p.strip() for p in m.group(1).split(",")]
        if len(parts) >= 3:
            try:
                r, g, b = (int(float(p)) for p in parts[:3])
                if len(parts) == 4 and float(parts[3]) < 1:
                    a = float(parts[3])
                    return f"rgba({r}, {g}, {b}, {a:g})"
                return f"rgb({r}, {g}, {b})"
            except ValueError:
                return None
    return None


@functools.lru_cache(maxsize=256)
def normalize_font_weight(value: str) -> str | None:
    v = value.strip().lower()
    if v == "bold":
        return "700"
    if v == "normal":
        return "400"
    if v in ("bolder", "lighter"):
        return None  # relative weights unused in fixtures
    if re.fullmatch(r"[1-9]00", v):
        return v
    return None


def parse_declarations(block: str) -> dict[str, str]:
    out = {}
    for decl in block.split(";"):
        prop, sep, val = decl.partition(":")
        if not sep:
            continue
        prop = prop.strip().lower()
        val = val.strip()
        if "!" in val:  # "!important" suffix always carries a '!'
            low = val.lower()
            if low.endswith("!important"):
                val = val[: -len("!important")].strip()
            elif low.endswith("! important"):
                val = val[: -len("! important")].strip()
        if prop:
            out[prop] = val
    return out


_SIMPLE_SEL = re.compile(
    r"^([a-zA-Z][a-zA-Z0-9:_-]*)?(\.[^.#\s]+)?(#[^.#\s]+)?$"
)


class Rule:
    __slots__ = ("tag", "cls", "elid", "specificity", "order", "decls")

    def __init__(self, tag, cls, elid, order, decls):
        self.tag = tag
        self.cls = cls
        self.elid = elid
        self.specificity = (100 if elid else 0) + (10 if cls else 0) + (1 if tag else 0)
        self.order = order
        self.decls = decls


class StyleSheet:
    def __init__(self, quirks: bool):
        self.quirks = quirks
        self.rules: list[Rule] = []
        self.by_id: dict[str, list[Rule]] = {}
        self.by_class: dict[str, list[Rule]] = {}
        self.by_tag: dict[str, list[Rule]] = {}
        self._order = 0

    def add_css(self, css_text: str):
        # strip HTML comment guards and /* */ comments
        text = css_text.replace("<!--", "").replace("-->", "")
        text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
        # brace-aware scan (skips @-blocks incl. nested @supports/@media bodies)
        i, n = 0, len(text)
        while i < n:
            brace = text.find("{", i)
            if brace == -1:
                break
            selector = text[i:brace].strip()
            # find matching close brace; C-speed find for the (ubiquitous)
            # non-nested case, per-char depth tracking only for @-blocks
            close = text.find("}", brace + 1)
            nested = text.find("{", brace + 1)
            if close == -1:
                body = text[brace + 1 : n - 1]  # unterminated: parity with
                i = n                           # the depth-loop's j==n exit
            elif nested == -1 or close < nested:
                body = text[brace + 1 : close]
                i = close + 1
            else:
                depth = 1
                j = brace + 1
                while j < n and depth:
                    c = text[j]
                    if c == "{":
                        depth += 1
                    elif c == "}":
                        depth -= 1
                    j += 1
                body = text[brace + 1 : j - 1]
                i = j
            if selector.startswith("@"):
                continue  # @font-face/@page/@supports — irrelevant to probes
            decls = parse_declarations(body)
            if not decls:
                continue
            for part in selector.split(","):
                part = part.strip()
                if not part or " " in part or ">" in part or "+" in part:
                    continue  # combinators unused in fixtures
                if ":" in part and not part.startswith(":"):
                    continue  # pseudo-class (a:link) — skip
                m = _SIMPLE_SEL.match(part)
                if not m:
                    continue
                tag = m.group(1).lower() if m.group(1) else None
                cls = m.group(2)[1:] if m.group(2) else None
                elid = m.group(3)[1:] if m.group(3) else None
                if cls and self.quirks:
                    cls = cls.lower()
                rule = Rule(tag, cls, elid, self._order, decls)
                self._order += 1
                self.rules.append(rule)
                if elid:
                    self.by_id.setdefault(elid, []).append(rule)
                elif cls:
                    self.by_class.setdefault(cls, []).append(rule)
                elif tag:
                    self.by_tag.setdefault(tag, []).append(rule)

    def matching_rules(self, el: Node) -> list[Rule]:
        cand = self.id_rules(el)
        cand.extend(self.class_tag_rules(el))
        cand.sort(key=lambda r: (r.specificity, r.order))
        return cand

    def id_rules(self, el: Node) -> list[Rule]:
        """Rules whose selector carries an #id (specificity ≥ 100 — they
        always cascade AFTER every class/tag rule, so applying them on top of
        the class/tag base reproduces the full sorted cascade)."""
        elid = el.attrs.get("id")
        if not elid:
            return []
        rules = self.by_id.get(elid)
        if not rules:
            return []
        cand = [
            r
            for r in rules
            if (r.tag is None or r.tag == el.tag) and self._cls_ok(r, el)
        ]
        if len(cand) > 1:
            cand.sort(key=lambda r: (r.specificity, r.order))
        return cand

    def class_tag_rules(self, el: Node) -> list[Rule]:
        cand: list[Rule] = []
        classes = el.class_list
        if self.quirks:
            classes = [c.lower() for c in classes]
        for c in classes:
            for r in self.by_class.get(c, ()):
                if r.tag is None or r.tag == el.tag:
                    cand.append(r)
        for r in self.by_tag.get(el.tag, ()):
            cand.append(r)
        cand.sort(key=lambda r: (r.specificity, r.order))
        return cand

    def _cls_ok(self, r: Rule, el: Node) -> bool:
        if not r.cls:
            return True
        classes = el.class_list
        if self.quirks:
            return r.cls in (c.lower() for c in classes)
        return r.cls in classes


# UA defaults that affect the probed properties
_UA_BOLD = frozenset("b strong th h1 h2 h3 h4 h5 h6".split())
_UA_ITALIC = frozenset("i em cite var dfn address".split())

_ROOT_STYLE = {
    "color": "rgb(0, 0, 0)",
    "font-style": "normal",
    "font-weight": "400",
    "font-family": '"Times New Roman"',
    "font-size": "16px",
    "left": "auto",
    "bottom": "auto",
}


class StyleResolver:
    """Per-document computed-style cache (the getComputedStyle stand-in)."""

    def __init__(self, doc: Node, quirks: bool | None = None):
        if quirks is None:
            quirks = not getattr(doc, "has_doctype", False)
        self.sheet = StyleSheet(quirks)
        for style_el in doc.query_selector_all("style"):
            self.sheet.add_css(style_el.text_content)
        self._memo: dict[int, dict[str, str]] = {}
        # structural memo: computed style is a pure function of
        # (inherited-style identity, tag, class, id, inline style) — generated
        # HTML has millions of elements but only a handful of such shapes, so
        # rule matching + cascade run once per shape, not once per element.
        # (inherited dicts are kept alive by the memos, so id() keys are stable)
        self._shape_memo: dict[tuple, dict[str, str]] = {}

    def computed(self, el: Node) -> dict[str, str]:
        key = id(el)
        hit = self._memo.get(key)
        if hit is not None:
            return hit
        parent = el.parent
        if parent is not None and parent.kind == "element":
            inherited = self.computed(parent)
        else:
            inherited = _ROOT_STYLE
        attrs = el.attrs
        inline = attrs.get("style")
        # idrviewer/pdf2htmlEX give every span a unique #id position rule
        # and/or inline style, so the shape key covers only the SHARED part of
        # the cascade (UA defaults + class/tag rules).  #id rules have
        # specificity ≥ 100 — they always sort after every class/tag rule —
        # so applying them (then inline) on top of the memoized base yields
        # exactly the fully-sorted cascade.
        shape = (id(inherited), el.tag, attrs.get("class"))
        base = self._shape_memo.get(shape)
        if base is None:
            base = {p: inherited[p] for p in INHERITED}
            base["left"] = "auto"
            base["bottom"] = "auto"
            if el.tag in _UA_BOLD:
                base["font-weight"] = "700"
            if el.tag in _UA_ITALIC:
                base["font-style"] = "italic"
            for r in self.sheet.class_tag_rules(el):
                self._apply_decls(base, r.decls)
            self._shape_memo[shape] = base
        # ALIASING: when the element has no #id rules and no inline style the
        # SHARED _shape_memo base dict is returned directly (every same-shape
        # element gets the same object).  Callers must treat computed() output
        # as read-only — mutate a copy, never the returned dict, or every
        # sibling with this shape silently changes style.
        style = base
        id_rules = self.sheet.id_rules(el) if attrs.get("id") else ()
        if id_rules or inline:
            style = base.copy()
            for r in id_rules:
                self._apply_decls(style, r.decls)
            if inline:
                self._apply_decls(style, parse_declarations(inline))
        self._memo[key] = style
        return style

    @staticmethod
    def _apply_decls(style: dict[str, str], decls: dict[str, str]) -> None:
        for prop, raw in decls.items():
            if prop == "color":
                norm = normalize_color(raw)
                if norm:
                    style["color"] = norm
            elif prop == "font-weight":
                norm = normalize_font_weight(raw)
                if norm:
                    style["font-weight"] = norm
            elif prop == "font-style":
                v = raw.strip().lower()
                if v in ("italic", "oblique", "normal"):
                    style["font-style"] = "italic" if v == "oblique" else v
            elif prop in ("font-family", "font-size", "left", "bottom"):
                style[prop] = raw.strip()
            elif prop == "font":  # shorthand — only flags we care about
                v = raw.lower()
                if "italic" in v:
                    style["font-style"] = "italic"
                if "bold" in v:
                    style["font-weight"] = "700"

    # JS-flavored accessors -------------------------------------------------
    def color(self, el: Node) -> str:
        return self.computed(el)["color"]

    def font_style(self, el: Node) -> str:
        return self.computed(el)["font-style"]

    def font_weight(self, el: Node) -> str:
        return self.computed(el)["font-weight"]

    def font_family(self, el: Node) -> str:
        return self.computed(el)["font-family"]

    def font_size(self, el: Node) -> str:
        return self.computed(el)["font-size"]

    def left(self, el: Node) -> str:
        return self.computed(el)["left"]

    def bottom(self, el: Node) -> str:
        return self.computed(el)["bottom"]
