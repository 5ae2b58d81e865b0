"""Minimal browser-faithful DOM on top of stdlib ``html.parser``.

Replaces the reference's headless-Chromium render boundary
(``/root/reference/htmlReader.ts:22-25,41``): the reference loads each HTML
file into a real browser only to walk ``childNodes`` / ``textContent`` /
``className`` — no layout, no JS execution on the page is needed.  This module
reproduces exactly the DOM surface those parsers touch:

* ``child_nodes`` including text nodes and comments, in document order;
* ``text_content`` — concatenated descendant text, and *assignable* (assignment
  replaces children with a single text node, as in the browser — the
  aggregation step at ``lez-rus-35k/index.ts:70-71`` relies on this mutation
  being visible through the original ``line`` array);
* ``class_name`` — ``''`` for classless elements, ``None`` for text/comment
  nodes (models JS ``undefined``: two adjacent text nodes compare equal on
  ``className`` and therefore merge);
* ``query_selector_all('p.af1')``-style tag.class selectors;
* HTML5-ish auto-close of ``<p>`` on block starts, void elements, and
  recovery from stray end tags.

Entities are decoded by html.parser (``&nbsp;`` → U+00A0), matching the
browser's textContent.
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# elements whose start tag implicitly closes an open <p> (HTML5 spec subset
# sufficient for the Word/pdf2htmlEX pages the reference parses)
_P_CLOSERS = frozenset(
    "address article aside blockquote div dl fieldset footer form h1 h2 h3 h4 h5 h6 "
    "header hr main nav ol p pre section table ul".split()
)

TEXT = "#text"
COMMENT = "#comment"


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "_text", "kind", "has_doctype")

    def __init__(self, tag=None, attrs=None, kind="element", text=""):
        self.tag = tag  # lowercase tag name for elements, None otherwise
        self.attrs = dict(attrs) if attrs else {}
        self.children: list[Node] = []
        self.parent = None
        self._text = text  # payload for text/comment nodes
        self.kind = kind  # 'element' | 'text' | 'comment' | 'document'

    # --- JS DOM surface -------------------------------------------------
    @property
    def node_name(self) -> str:
        if self.kind == "text":
            return TEXT
        if self.kind == "comment":
            return COMMENT
        if self.kind == "document":
            return "#document"
        return self.tag.upper()

    @property
    def tag_name(self):
        """JS ``tagName``: upper-case for elements, undefined (None) otherwise."""
        return self.tag.upper() if self.kind == "element" else None

    @property
    def class_name(self):
        """JS ``className``: class attr ('' if absent) for elements, None
        (undefined) for text/comment nodes."""
        if self.kind == "element":
            return self.attrs.get("class", "")
        return None

    @class_name.setter
    def class_name(self, value):
        self.attrs["class"] = value

    @property
    def class_list(self) -> list[str]:
        cn = self.attrs.get("class", "")
        return cn.split() if cn else []

    @property
    def child_nodes(self) -> list["Node"]:
        return self.children

    @property
    def text_content(self) -> str:
        if self.kind in ("text", "comment"):
            return self._text
        out = []
        stack = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if n.kind in ("text", "comment"):
                if n.kind == "text":
                    out.append(n._text)
            else:
                stack.extend(reversed(n.children))
        return "".join(out)

    @text_content.setter
    def text_content(self, value: str):
        if self.kind in ("text", "comment"):
            self._text = value
            return
        t = Node(kind="text", text=value)
        t.parent = self
        self.children = [t]

    # --- querying -------------------------------------------------------
    def iter_elements(self):
        stack = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if n.kind == "element":
                yield n
                stack.extend(reversed(n.children))

    def query_selector_all(self, selector: str) -> list["Node"]:
        """Supports 'tag', '.class', 'tag.class', and comma unions — all the
        reference uses (p.af1 / p.a7 / p.msonormal / span / div)."""
        parts = [s.strip() for s in selector.split(",")]
        preds = []
        for part in parts:
            if "." in part:
                tag, _, cls = part.partition(".")
                preds.append((tag.lower() or None, cls))
            else:
                preds.append((part.lower(), None))
        out = []
        for el in self.iter_elements():
            for tag, cls in preds:
                if tag and el.tag != tag:
                    continue
                if cls and cls not in el.class_list:
                    continue
                out.append(el)
                break
        return out


class _DomBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node(kind="document")
        self.root.has_doctype = False
        self.stack = [self.root]

    def handle_decl(self, decl):
        if decl.lower().startswith("doctype"):
            self.root.has_doctype = True

    # helpers
    def _open(self, node):
        node.parent = self.stack[-1]
        self.stack[-1].children.append(node)

    def handle_starttag(self, tag, attrs):
        if tag in _P_CLOSERS:
            # implicit </p>
            for i in range(len(self.stack) - 1, 0, -1):
                if self.stack[i].tag == "p":
                    del self.stack[i:]
                    break
        node = Node(tag=tag, attrs=attrs, kind="element")
        self._open(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag=tag, attrs=attrs, kind="element")
        self._open(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore (browser recovery)

    def handle_data(self, data):
        if not data:
            return
        parent = self.stack[-1]
        node = Node(kind="text", text=data)
        node.parent = parent
        parent.children.append(node)

    def handle_comment(self, data):
        parent = self.stack[-1]
        node = Node(kind="comment", text=data)
        node.parent = parent
        parent.children.append(node)


def parse_html(text: str) -> Node:
    """Parse an HTML document string into a DOM tree; returns the document node."""
    b = _DomBuilder()
    b.feed(text)
    b.close()
    return b.root


def decode_html_bytes(raw: bytes) -> str:
    """Decode page bytes honoring ``<meta charset=...>`` the way a browser
    would (the rus-lez-35k fixtures are windows-1251 — FIXTURES.md §1)."""
    head = raw[:4096]
    lower = head.lower()
    enc = "utf-8"
    idx = lower.find(b"charset=")
    if idx != -1:
        tail = lower[idx + 8 : idx + 40]
        for q in (b'"', b"'"):
            if tail.startswith(q):
                tail = tail[1:]
        end = 0
        while end < len(tail) and tail[end : end + 1] not in (b'"', b"'", b">", b" ", b"/", b";"):
            end += 1
        cand = tail[:end].decode("ascii", "ignore").strip()
        if cand:
            enc = cand
    try:
        return raw.decode(enc, errors="replace")
    except LookupError:
        return raw.decode("utf-8", errors="replace")
