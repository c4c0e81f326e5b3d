"""DemoHTMLParser-equivalent HTML → (title, body, meta) extraction.

Port of the *semantics* of
``src/Lucene.Net.Benchmark/ByTask/Feeds/DemoHTMLParser.cs:34-257`` (which sits
on the TagSoup SAX parser), structured as two layers:

1. ``_TagSoupish`` — a tolerant HTML event stream built on Python's
   ``html.parser.HTMLParser`` that reproduces the TagSoup behaviors the
   handler depends on: implied ``<head>``/``<body>`` opening, implied end
   tags for block/list/table elements, void-element auto-close, closing all
   open elements at EOF, entity decoding.
2. ``_Handler`` — a rule-for-rule port of the reference's SAX handler
   (DemoHTMLParser.cs:85-203): head/body/title depth counters,
   ``<style>/<script>`` subtree suppression, ``\n`` after every closing
   ENDLINE element (DemoHTMLParser.cs:211-215), ``<img alt="x">`` → ``[x]``
   (:131-139), ``<meta name|http-equiv, content>`` harvested into a
   lowercase-keyed dict (:110-121), framesets rejected (:150-152).

Title is trimmed (DemoHTMLParser.cs:79); body is NOT trimmed.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pyarrow as pa

# DemoHTMLParser.cs:211-215
ENDLINE_ELEMENTS = frozenset(
    "p h1 h2 h3 h4 h5 h6 div ul ol dl pre hr blockquote address fieldset "
    "table form noscript li dt dd noframes br tr select option".split()
)
# DemoHTMLParser.cs:218-220
SUPPRESS_ELEMENTS = frozenset(("style", "script"))

_VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Start tags that belong to the document head (TagSoup routes these into the
# implied <head> before body content begins).
_HEAD_ELEMENTS = frozenset("title meta link base style script noscript".split())

# Implied-end-tag rules: arrival of key closes through the innermost open
# element in `targets`, without crossing an element in `barriers`. Mirrors
# TagSoup's HTML schema closure rules for the elements the handler cares about.
_CLOSES: dict[str, tuple[frozenset[str], frozenset[str]]] = {
    "li": (frozenset({"li"}), frozenset({"ul", "ol", "body"})),
    "dt": (frozenset({"dt", "dd"}), frozenset({"dl", "body"})),
    "dd": (frozenset({"dt", "dd"}), frozenset({"dl", "body"})),
    "tr": (frozenset({"tr"}), frozenset({"table", "thead", "tbody", "tfoot", "body"})),
    "td": (frozenset({"td", "th"}), frozenset({"tr", "table", "body"})),
    "th": (frozenset({"td", "th"}), frozenset({"tr", "table", "body"})),
    "option": (frozenset({"option"}), frozenset({"select", "body"})),
    "p": (frozenset({"p"}), frozenset({"body"})),
}
_BLOCK_CLOSES_P = frozenset(
    "p div ul ol dl pre hr blockquote address fieldset table form h1 h2 h3 h4 "
    "h5 h6 li dt dd".split()
)


class FramesetError(Exception):
    """Raised for frameset documents (DemoHTMLParser.cs:150-152)."""


class _Handler:
    """Direct port of DemoHTMLParser's anonymous DefaultHandler."""

    __slots__ = ("in_body", "in_head", "in_title", "suppressed", "title", "body", "meta")

    def __init__(self) -> None:
        self.in_body = 0
        self.in_head = 0
        self.in_title = 0
        self.suppressed = 0
        self.title: list[str] = []
        self.body: list[str] = []
        self.meta: dict[str, str] = {}

    def start_element(self, name: str, attrs: dict[str, str | None]) -> None:
        if self.in_head > 0:
            if name == "title":
                self.in_title += 1
            elif name == "meta":
                key = attrs.get("name")
                if key is None:
                    key = attrs.get("http-equiv")
                val = attrs.get("content")
                if key is not None and val is not None:
                    self.meta[key.lower()] = val
        elif self.in_body > 0:
            if name in SUPPRESS_ELEMENTS:
                self.suppressed += 1
            elif name == "img":
                alt = attrs.get("alt")
                if alt is not None:
                    self.body.append("[" + alt + "]")
        elif name == "body":
            self.in_body += 1
        elif name == "head":
            self.in_head += 1
        elif name == "frameset":
            raise FramesetError("This parser does not support HTML framesets.")

    def end_element(self, name: str) -> None:
        if self.in_body > 0:
            if name == "body":
                self.in_body -= 1
            elif name in ENDLINE_ELEMENTS:
                self.body.append("\n")
            elif name in SUPPRESS_ELEMENTS:
                self.suppressed -= 1
        elif self.in_head > 0:
            if name == "head":
                self.in_head -= 1
            elif self.in_title > 0 and name == "title":
                self.in_title -= 1

    def characters(self, data: str) -> None:
        if self.in_body > 0 and self.suppressed == 0:
            self.body.append(data)
        elif self.in_title > 0:
            self.title.append(data)


class _TagSoupish(HTMLParser):
    """Tolerant tag-stream recovery feeding SAX-style events to _Handler."""

    def __init__(self, handler: _Handler) -> None:
        super().__init__(convert_charrefs=True)
        self.h = handler
        self.stack: list[str] = []
        # document structure state: 0=before head, 1=in implied/explicit head,
        # 2=in body, 3=after body
        self.phase = 0

    # -- structure recovery ---------------------------------------------------
    def _open(self, name: str, attrs: dict[str, str | None]) -> None:
        self.h.start_element(name, attrs)
        self.stack.append(name)

    def _close_one(self) -> None:
        name = self.stack.pop()
        self.h.end_element(name)

    def _close_through(self, name: str) -> None:
        """Close open elements up to and including the nearest `name`."""
        if name not in self.stack:
            return
        while self.stack:
            top = self.stack[-1]
            self._close_one()
            if top == name:
                break

    def _ensure_head(self) -> None:
        if self.phase == 0:
            self.h.start_element("head", {})
            self.phase = 1

    def _ensure_body(self) -> None:
        if self.phase < 2:
            if self.phase == 1:
                self.h.end_element("head")
            self.phase = 2
            self.h.start_element("body", {})

    # -- HTMLParser callbacks -------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _VOID_ELEMENTS:
            self.handle_startendtag(tag, attrs)
            return
        attrs_d = dict(attrs)
        if tag in ("html",):
            return
        if tag == "head":
            if self.phase == 0:
                self.phase = 1
                self.h.start_element("head", attrs_d)
            return
        if tag == "body":
            if self.phase < 2:
                if self.phase == 1:
                    self.h.end_element("head")
                self.phase = 2
                self.h.start_element("body", attrs_d)
            return
        if tag == "frameset":
            self.h.start_element("frameset", attrs_d)  # raises
            return
        if self.phase <= 1 and tag in _HEAD_ELEMENTS:
            self._ensure_head()
            self._open(tag, attrs_d)
            return
        self._ensure_body()
        # implied end tags
        rule = _CLOSES.get(tag)
        if rule:
            targets, barriers = rule
            for i in range(len(self.stack) - 1, -1, -1):
                el = self.stack[i]
                if el in targets:
                    while len(self.stack) > i:
                        self._close_one()
                    break
                if el in barriers:
                    break
        if tag in _BLOCK_CLOSES_P and "p" in self.stack:
            # <p> is also closed by any block-level start
            for i in range(len(self.stack) - 1, -1, -1):
                if self.stack[i] == "p":
                    while len(self.stack) > i:
                        self._close_one()
                    break
        self._open(tag, attrs_d)

    def handle_startendtag(self, tag: str, attrs) -> None:
        attrs_d = dict(attrs)
        if tag == "meta" or tag == "link" or tag == "base":
            if self.phase <= 1:
                self._ensure_head()
                self.h.start_element(tag, attrs_d)
                self.h.end_element(tag)
                return
        if tag == "frameset":
            self.h.start_element(tag, attrs_d)
            return
        if self.phase <= 1 and tag in _HEAD_ELEMENTS:
            self._ensure_head()
            self.h.start_element(tag, attrs_d)
            self.h.end_element(tag)
            return
        self._ensure_body()
        self.h.start_element(tag, attrs_d)
        self.h.end_element(tag)

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID_ELEMENTS:
            return
        if tag == "html":
            return
        if tag == "head":
            if self.phase == 1:
                while self.stack:
                    self._close_one()
                self.h.end_element("head")
                self.phase = 2
                self.h.start_element("body", {})
            return
        if tag == "body":
            if self.phase == 2:
                while self.stack:
                    self._close_one()
                self.h.end_element("body")
                self.phase = 3
            return
        self._close_through(tag)

    def handle_data(self, data: str) -> None:
        if self.phase <= 1:
            in_captured = any(t in ("title", "style", "script") for t in self.stack)
            if not in_captured:
                if data.strip():
                    # non-whitespace text before <body> implies body start
                    self._ensure_body()
                    self.h.characters(data)
                return
        self.h.characters(data)

    def handle_entityref(self, name: str) -> None:  # pragma: no cover
        self.handle_data(f"&{name};")

    def finish(self) -> None:
        while self.stack:
            self._close_one()
        if self.phase == 1:
            self.h.end_element("head")
        elif self.phase == 2:
            self.h.end_element("body")


def parse_html(html: str | bytes) -> tuple[str, str, dict[str, str], str | None]:
    """Parse one HTML document → (title, body, meta, error).

    ``error`` is None on success; on frameset or parser failure the document
    yields empty outputs and the error string (per-row fault containment —
    SURVEY §4: analyzer errors drop only that doc).
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    handler = _Handler()
    parser = _TagSoupish(handler)
    try:
        parser.feed(html)
        parser.close()
        parser.finish()
    except FramesetError as e:
        return "", "", {}, str(e)
    except Exception as e:  # tolerant: never kill the batch
        return "", "", {}, f"{type(e).__name__}: {e}"
    title = "".join(handler.title).strip()  # DemoHTMLParser.cs:79
    body = "".join(handler.body)
    return title, body, handler.meta, None


class ExtractHTML:
    """map_batches stage: html binary/string column → title/text columns.

    Usage::

        ds.map_batches(ExtractHTML(), batch_format="pyarrow", batch_size=256)

    Stateless per batch; written as a class so a pool can amortize nothing
    today but hold e.g. charset detectors later.
    """

    def __init__(self, html_col: str = "html", out_text: str = "text",
                 out_title: str = "title", keep_html: bool = False) -> None:
        self.html_col = html_col
        self.out_text = out_text
        self.out_title = out_title
        self.keep_html = keep_html

    def __call__(self, batch: pa.Table) -> pa.Table:
        titles: list[str] = []
        bodies: list[str] = []
        errors: list[str | None] = []
        for v in batch.column(self.html_col):
            raw = v.as_py()
            if raw is None:
                titles.append("")
                bodies.append("")
                errors.append("null html")
                continue
            title, body, _meta, err = parse_html(raw)
            titles.append(title)
            bodies.append(body)
            errors.append(err)
        out = batch
        if not self.keep_html:
            out = out.drop_columns([self.html_col])
        for name, arr in (
            (self.out_title, pa.array(titles, type=pa.string())),
            (self.out_text, pa.array(bodies, type=pa.large_string())),
            ("extract_error", pa.array(errors, type=pa.string())),
        ):
            if name in out.column_names:
                out = out.drop_columns([name])
            out = out.append_column(name, arr)
        return out
