"""HTML parsing / visible-text extraction — bs4-``html.parser`` semantics
re-expressed on the stdlib only (bs4 is not available in this environment).

Re-expresses (public semantics; reference cites for parity checking):

* M6 charset-detect + parse — reference `Parser.py:8-11`
  (charset_normalizer best-guess + ``BeautifulSoup(html, "html.parser")``).
  The synthetic corpus is pinned to clean UTF-8 (SURVEY.md §7 hard parts),
  so decode = utf-8 with latin-1 fallback.
* M7 outlink extractor — `Parser.py:13-24`: every ``<a>`` tag with a
  non-empty ``href``; keep ``href.split()[0]``.
* M9 visible-text extractor — `Parser.py:57-72`: all text nodes in document
  order; drop nodes whose parent is one of {style, script, head, title,
  meta, [document]} or that are comments; ``" ".join(t.strip() for t in kept)``
  — note whitespace-only nodes strip to "" and still contribute a join
  separator, exactly as bs4 does. THIS IS THE BYTE-IDENTICAL INVARIANT.
* M10 first-N-words — `Parser.py:48-55`: whitespace ``split()``, first N,
  single-space join.
* Title — ``soup.find('title').string`` (`WorkersPipeline.py:278`): the
  title tag's single text child, or None if absent/compound.

The tree model mirrors bs4's HTMLParserTreeBuilder closely enough for
well-formed documents: a tag stack with void-element handling; each
``handle_data`` run is one text node (one NavigableString in bs4).
"""

from __future__ import annotations

from html.parser import HTMLParser as _StdHTMLParser

EXCLUDED_PARENTS = frozenset(["style", "script", "head", "title", "meta", "[document]"])

# Elements that cannot hold content (bs4 html.parser treats these as empty).
VOID_ELEMENTS = frozenset(
    ["area", "base", "br", "col", "embed", "hr", "img", "input",
     "link", "meta", "param", "source", "track", "wbr"]
)


class _Collector(_StdHTMLParser):
    """One pass over the document collecting text nodes (with parent tag),
    anchor hrefs in document order, and the first <title> text."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._stack: list[str] = []
        self.texts: list[tuple[str, str]] = []  # (parent_tag, data)
        self.hrefs: list[str] = []
        self._title_datas: list[str] | None = None  # datas of FIRST title elt
        self._in_first_title = False
        self._title_seen = False
        self._title_compound = False

    # -- tree building ----------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href":
                    # reference Parser.py:20-22: skip None/blank href, take
                    # the first whitespace token
                    if v is not None and v.strip() != "":
                        self.hrefs.append(v.split()[0])
                    break
        if self._in_first_title:
            # a tag nested inside <title> would make .string compound;
            # html.parser runs title in RCDATA mode so this shouldn't occur,
            # but guard anyway
            self._title_compound = True
        if tag == "title" and not self._title_seen:
            self._title_seen = True
            self._in_first_title = True
            self._title_datas = []
        if tag not in VOID_ELEMENTS:
            self._stack.append(tag)

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in VOID_ELEMENTS and self._stack and self._stack[-1] == tag:
            self._stack.pop()
        if tag == "title":
            self._in_first_title = False

    def handle_endtag(self, tag):
        if tag == "title":
            self._in_first_title = False
        if tag in self._stack:
            while self._stack:
                if self._stack.pop() == tag:
                    break

    # -- node collection --------------------------------------------------
    def handle_data(self, data):
        parent = self._stack[-1] if self._stack else "[document]"
        self.texts.append((parent, data))
        if self._in_first_title and self._title_datas is not None:
            self._title_datas.append(data)

    # comments / declarations / PIs are not text nodes for our purposes:
    # bs4 filters Comment explicitly (Parser.py:70-71); Doctype's parent is
    # [document] which is in the exclusion list either way.
    def handle_comment(self, data):  # excluded (bs4 Comment filter)
        pass

    def handle_decl(self, decl):  # doctype — parent [document], excluded
        pass

    def handle_pi(self, data):
        pass

    # -- results ----------------------------------------------------------
    def title_string(self) -> str | None:
        """bs4 ``soup.find('title').string``: the single text child of the
        first title element, else None."""
        if self._title_datas is None or self._title_compound:
            return None
        if len(self._title_datas) != 1:
            return None
        return self._title_datas[0]


def decode_html(html: bytes | str) -> str:
    """M6 decode: pinned-UTF-8 corpus (SURVEY.md §7); latin-1 never fails."""
    if isinstance(html, str):
        return html
    try:
        return html.decode("utf-8")
    except UnicodeDecodeError:
        return html.decode("latin-1")


class ParsedPage:
    """Result of one parse: visible text, raw hrefs (doc order), title."""

    __slots__ = ("visible_text", "hrefs", "title")

    def __init__(self, visible_text: str, hrefs: list[str], title: str | None):
        self.visible_text = visible_text
        self.hrefs = hrefs
        self.title = title

    def first_n_words(self, n: int = 20) -> str:
        """M10 (`Parser.py:48-55`)."""
        return " ".join(self.visible_text.split()[:n])


def parse_page(html: bytes | str) -> ParsedPage:
    """Parse a page: one pass -> (visible_text, hrefs, title).

    visible_text reproduces `Parser.py:57-72` byte-for-byte on well-formed
    UTF-8 documents (the invariant target).
    """
    text = decode_html(html)
    c = _Collector()
    try:
        c.feed(text)
        c.close()
    except Exception:
        pass  # parse what we could — reference swallows parse errors upstream
    visible = " ".join(d.strip() for (p, d) in c.texts if p not in EXCLUDED_PARENTS)
    return ParsedPage(visible, c.hrefs, c.title_string())


def extract_visible_text(html: bytes | str) -> str:
    """M9 convenience wrapper."""
    return parse_page(html).visible_text
