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

import numpy as np

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


def _decode_pinned(html: bytes) -> str:
    """Default strategy: pinned-UTF-8 corpus (SURVEY.md §7 — the synthetic
    web is clean UTF-8, and pinning avoids detector version-skew between
    the Ray side and the oracle); latin-1 never fails."""
    try:
        return html.decode("utf-8")
    except UnicodeDecodeError:
        return html.decode("latin-1")


_META_CHARSET_RE = None


def detect_decode(html: bytes) -> str:
    """Best-guess charset decode for real-world (non-UTF-8) corpora — the
    behavior slot of the reference's charset_normalizer best-guess
    (`Parser.py:8-9`), reimplemented from public heuristics only:

    1. Unicode BOMs (utf-8-sig / utf-16 / utf-32);
    2. strict UTF-8 (a valid UTF-8 document is almost never mislabeled);
    3. an HTML ``<meta charset=...>`` / ``http-equiv`` declaration in the
       first 1024 bytes (the HTML standard's pre-scan window);
    4. a frequency-scored best guess over the unlabeled-legacy
       candidates (utf-16-le/be when byte length is even, cp1252,
       latin-1): decode with each, rank by (mess, -latin-coherence,
       priority) — the public charset-detection recipe of penalizing
       control/replacement/private-use characters and rewarding
       Latin-script coherence; latin-1 never fails, so the guess is
       total. UTF-16 html wins on real pages because its ASCII markup
       decodes to NUL-ridden text under any 8-bit candidate.
    """
    import codecs
    import re

    global _META_CHARSET_RE
    for bom, enc in ((codecs.BOM_UTF8, "utf-8-sig"),
                     (codecs.BOM_UTF32_LE, "utf-32"),
                     (codecs.BOM_UTF32_BE, "utf-32"),
                     (codecs.BOM_UTF16_LE, "utf-16"),
                     (codecs.BOM_UTF16_BE, "utf-16")):
        if html.startswith(bom):
            try:
                return html.decode(enc)
            except UnicodeDecodeError:
                # malformed payload behind a BOM (truncated UTF-16/32,
                # lone surrogate): fall through to the byte heuristics
                # so the never-fails contract holds
                break
    try:
        return html.decode("utf-8")
    except UnicodeDecodeError:
        pass
    if _META_CHARSET_RE is None:
        _META_CHARSET_RE = re.compile(
            rb"""charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""", re.IGNORECASE)
    m = _META_CHARSET_RE.search(html[:1024])
    if m:
        try:
            return html.decode(m.group(1).decode("ascii").lower())
        except (LookupError, UnicodeDecodeError):
            pass
    return _best_guess_decode(html)


def _mess_and_coherence(text: str) -> tuple[float, float]:
    """(mess, coherence) of a candidate decode over the first 4 KiB —
    the public charset-detection scoring shape (charset_normalizer's
    'mess detector' idea, reimplemented from the published heuristic):

    * mess — fraction of characters a correctly decoded document should
      not contain: C0 controls outside ``\\t\\n\\r``, the C1 block
      (0x7F-0x9F — raw cp1252 bytes decoded as latin-1 land here),
      U+FFFD replacement + FFF0-FFFF specials, private use;
    * coherence — fraction of characters in the Latin web's usual
      repertoire (ASCII printable, NBSP..Latin Extended-B, general
      punctuation, whitespace). Lower mess wins; higher coherence
      breaks mess ties (a wrong utf-16 read of 8-bit Latin text is
      mess-free CJK soup but has near-zero Latin coherence)."""
    if not text:
        return 1.0, 0.0
    s = text[:4096]
    o = np.fromiter(map(ord, s), dtype=np.int64, count=len(s))
    ws = (o == 9) | (o == 10) | (o == 13)
    bad = (((o < 0x20) & ~ws)
           | ((o >= 0x7F) & (o <= 0x9F))
           | ((o >= 0xFFF0) & (o <= 0xFFFD))
           | ((o >= 0xE000) & (o <= 0xF8FF)))
    # kana + CJK punctuation (0x3000-0x30FF) count as coherent so a
    # correct shift_jis read scores like Latin text does — but CJK
    # IDEOGRAPHS deliberately do NOT: a wrong utf-16 read of 8-bit
    # text is mess-free ideograph soup, and keeping ideographs out of
    # 'good' is what lets the 8-bit candidate still win. Real Japanese
    # is kana-heavy, so the kana range alone carries its coherence.
    good = (((o >= 0x20) & (o <= 0x7E))
            | ((o >= 0xA0) & (o <= 0x24F))
            | ((o >= 0x2000) & (o <= 0x206F))
            | ((o >= 0x20A0) & (o <= 0x20CF))
            | ((o >= 0x3000) & (o <= 0x30FF))
            | ws)
    n = len(s)
    return float(bad.sum()) / n, float(good.sum()) / n


def _letter_fraction(text: str) -> float:
    """Fraction of the candidate decode's NON-ASCII characters that are
    alphabetic (first 4 KiB) — the cheap language-coherence proxy that
    splits same-mess same-coherence Latin candidates: Polish bytes read
    as iso-8859-2 yield letters (ą ł ś ż), the same bytes read as
    latin-1/cp1252 yield symbol soup (± ³ ¶ ¿); both land in the
    'good' ranges, but only one is made of letters."""
    na = [c for c in text[:4096] if ord(c) > 0x7E]
    if not na:
        return 1.0  # pure-ASCII decodes tie; later keys decide
    return sum(c.isalpha() for c in na) / len(na)


def _best_guess_decode(html: bytes) -> str:
    """Step 4 of ``detect_decode``: frequency-scored candidate ranking
    for unlabeled non-UTF-8 bytes, over charset_normalizer's common-web
    candidate set (`Parser.py:8-9` behavior slot): utf-16 pair (even
    length only), shift_jis (candidacy by byte pattern: a lead byte in
    0x81-0x9F/0xE0-0xEF must occur, and the strict codec rejects
    non-Japanese byte streams), cp1252, iso-8859-15, iso-8859-2,
    latin-1. Rank by (mess, -coherence, -letter_fraction, priority):
    mess and Latin/kana coherence as before, then the letter fraction
    splits the Latin family (iso-8859-2 letters vs latin-1 symbol soup
    for the same bytes), then priority prefers utf-16 — which only
    survives scoring when the 8-bit reads are NUL-ridden — and the
    web-frequency order cp1252 > iso-8859-15 > iso-8859-2 among
    otherwise-tied candidates. latin-1 never fails, so the guess is
    total."""
    cands = []
    if len(html) % 2 == 0:
        cands += ["utf-16-le", "utf-16-be"]
    # shift_jis candidacy gate: some byte must be a plausible two-byte
    # lead — pure single-byte Latin never qualifies, so French 0xE9 'é'
    # followed by ASCII can't be misread as a lone kanji page unless
    # the codec AND the scorer both prefer it
    if any(0x81 <= b <= 0x9F or 0xE0 <= b <= 0xEF for b in html[:4096]):
        cands += ["shift_jis"]
    cands += ["cp1252", "iso-8859-15", "iso-8859-2", "latin-1"]
    best_key, best_text = None, None
    for pri, enc in enumerate(cands):
        try:
            t = html.decode(enc)
        except UnicodeDecodeError:
            continue
        mess, coh = _mess_and_coherence(t)
        key = (mess, -coh, -_letter_fraction(t), pri)
        if best_key is None or key < best_key:
            best_key, best_text = key, t
    return best_text  # latin-1 never fails -> always set


_DECODERS = {"pinned": _decode_pinned, "detect": detect_decode}
_decode_strategy = "pinned"


def set_decode_strategy(name_or_fn) -> None:
    """Charset-decode hook: ``"pinned"`` (default), ``"detect"`` (the
    best-guess detector above), or any ``bytes -> str`` callable. Both
    the Ray parse stage and the conformance oracle decode through
    ``decode_html``, so the hook keeps them in lockstep."""
    global _decode_strategy
    if callable(name_or_fn):
        _decode_strategy = name_or_fn
    elif name_or_fn in _DECODERS:
        _decode_strategy = name_or_fn
    else:
        raise ValueError(f"unknown decode strategy: {name_or_fn!r} "
                         f"(have {sorted(_DECODERS)} or a callable)")


def decode_html(html: bytes | str, decoder=None) -> str:
    """M6 decode via ``decoder`` (a strategy name or ``bytes -> str``
    callable) or, when None, the module-wide active strategy (see
    ``set_decode_strategy``). The explicit parameter exists for
    distributed stages: a pickled map_batches callable carries its
    decoder with it instead of relying on a driver-process global."""
    if isinstance(html, str):
        return html
    fn = decoder if decoder is not None else _decode_strategy
    if not callable(fn):
        try:
            fn = _DECODERS[fn]
        except KeyError:
            raise ValueError(f"unknown decode strategy: {fn!r} "
                             f"(have {sorted(_DECODERS)} or a callable)")
    return fn(html)


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


def parse_page(html: bytes | str, decoder=None) -> ParsedPage:
    """Parse a page: one pass -> (visible_text, hrefs, title).

    visible_text reproduces `Parser.py:57-72` byte-for-byte on well-formed
    UTF-8 documents (the invariant target). ``decoder`` overrides the
    charset strategy (see ``decode_html``).
    """
    text = decode_html(html, decoder)
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


class _AnchorCollector(_Collector):
    """_Collector plus per-anchor text capture: each ``<a>`` whose href
    survives the reference's skip rule gets the concatenation of the
    text nodes INSIDE it (innermost anchor wins for nested anchors).
    A separate opt-in subclass so the crawl's byte-identical hot path
    stays untouched."""

    def __init__(self) -> None:
        super().__init__()
        self.anchor_datas: list[list[str]] = []   # aligned with hrefs
        self._open_anchors: list[int] = []

    def handle_starttag(self, tag, attrs):
        n_before = len(self.hrefs)
        super().handle_starttag(tag, attrs)
        if tag == "a" and len(self.hrefs) > n_before:
            self.anchor_datas.append([])
            self._open_anchors.append(len(self.anchor_datas) - 1)
        elif tag == "a":
            # href-less/blank anchor still nests: track it so its end
            # tag pops IT, not an outer captured anchor
            self._open_anchors.append(-1)

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag == "a" and self._open_anchors:
            self._open_anchors.pop()
        if tag not in VOID_ELEMENTS and self._stack and \
                self._stack[-1] == tag:
            self._stack.pop()
        if tag == "title":
            self._in_first_title = False

    def handle_endtag(self, tag):
        if tag == "a" and self._open_anchors:
            self._open_anchors.pop()
        super().handle_endtag(tag)

    def handle_data(self, data):
        super().handle_data(data)
        if self._open_anchors and self._open_anchors[-1] >= 0:
            self.anchor_datas[self._open_anchors[-1]].append(data)


def anchor_texts(html: bytes | str, decoder=None) -> list[tuple[str, str]]:
    """[(raw_href_first_token, anchor_text)] in document order — the
    href list is IDENTICAL to ``parse_page(...).hrefs`` (same skip
    rule), each paired with the single-space join of the stripped text
    nodes inside its anchor element."""
    text = decode_html(html, decoder)
    c = _AnchorCollector()
    try:
        c.feed(text)
        c.close()
    except Exception:
        pass
    return [(h, " ".join(d.strip() for d in datas))
            for h, datas in zip(c.hrefs, c.anchor_datas)]
