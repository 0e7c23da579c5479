"""Unit tests for the HTML extractor (M6/M7/M9/M10, Parser.py semantics)."""

from webcrawler_ray.functions.htmlparse import (
    extract_visible_text,
    parse_page,
)

DOC = b"""<!DOCTYPE html>
<html><head><title>My Title</title>
<meta charset="utf-8">
<style>body { color: red; }</style>
<script>var hidden = 1;</script>
</head>
<body>
<h1>Header</h1>
<!-- a comment -->
<p>hello <b>bold</b> world <a href="/p1#s">link one</a> tail</p>
<p>second <a href="https://o.test/x  extra">link two</a></p>
<div>deep <span>nested</span> text</div>
</body></html>
"""


class TestVisibleText:  # M9 (Parser.py:57-72)
    def test_excludes_style_script_title_head_comments(self):
        t = extract_visible_text(DOC)
        assert "My Title" not in t
        assert "color: red" not in t
        assert "hidden" not in t
        assert "a comment" not in t
        assert "Header" in t and "hello" in t and "bold" in t
        assert "nested" in t

    def test_whitespace_only_nodes_contribute_separator(self):
        # bs4: " ".join(t.strip() ...) keeps empty strings from whitespace
        # nodes -> consecutive spaces. Must reproduce byte-for-byte.
        html = b"<html><body><p>a</p>\n<p>b</p></body></html>"
        assert extract_visible_text(html) == "a  b"

    def test_each_node_stripped(self):
        html = b"<html><body><p>  a  </p><p> b</p></body></html>"
        assert extract_visible_text(html) == "a b"

    def test_script_content_cdata_mode(self):
        html = b"<html><body><script>if (a < b) { x(); }</script>vis</body></html>"
        assert extract_visible_text(html) == "vis"

    def test_text_outside_body_visible(self):
        html = b"<html>stray<body>in</body></html>"
        assert extract_visible_text(html) == "stray in"

    def test_bytes_and_str_agree(self):
        assert extract_visible_text(DOC) == extract_visible_text(DOC.decode())

    def test_latin1_fallback(self):
        html = "<html><body>caf\xe9</body></html>".encode("latin-1")
        assert "caf" in extract_visible_text(html)


class TestLinks:  # M7 (Parser.py:13-24)
    def test_collects_hrefs_first_token(self):
        p = parse_page(DOC)
        assert p.hrefs == ["/p1#s", "https://o.test/x"]

    def test_blank_and_missing_href_skipped(self):
        html = b'<body><a href="">x</a><a>y</a><a href="  ">z</a><a href="/ok">w</a></body>'
        assert parse_page(html).hrefs == ["/ok"]

    def test_entity_decoded_href(self):
        html = b'<body><a href="/a&amp;b">x</a></body>'
        assert parse_page(html).hrefs == ["/a&b"]


class TestTitle:  # soup.find('title').string (WorkersPipeline.py:278)
    def test_simple_title(self):
        assert parse_page(DOC).title == "My Title"

    def test_no_title(self):
        assert parse_page(b"<html><body>x</body></html>").title is None

    def test_first_title_wins(self):
        html = b"<head><title>A</title></head><body><title>B</title></body>"
        assert parse_page(html).title == "A"


class TestFirstN:  # M10 (Parser.py:48-55)
    def test_first_n_words(self):
        p = parse_page(b"<body>one two three four five</body>")
        assert p.first_n_words(3) == "one two three"
        assert p.first_n_words(20) == "one two three four five"

    def test_multiple_spaces_collapse_in_split(self):
        p = parse_page(b"<p>a</p>  <p>b</p>")
        assert p.first_n_words(20) == "a b"


class TestRobustness:
    def test_malformed_html_no_crash(self):
        for html in [b"<a href=", b"<<<>>>", b"", b"<body><p>x",
                     b"<html><body></div></p>text"]:
            parse_page(html)  # must not raise

    def test_binary_garbage_no_crash(self):
        parse_page(bytes(range(256)))


class TestCharsetHook:
    """M6 charset strategy hook (reference Parser.py:8-9 best-guess slot)."""

    def test_detect_latin1_page(self):
        from webcrawler_ray.functions.htmlparse import decode_html

        html = "<body>café con açúcar</body>".encode("latin-1")
        assert "café con açúcar" in decode_html(
            html, decoder="detect")

    def test_detect_cp1252_curly_quotes(self):
        from webcrawler_ray.functions.htmlparse import decode_html

        html = b"<p>\x93smart\x94 quotes \x97 dash</p>"  # cp1252-only bytes
        out = decode_html(html, decoder="detect")
        assert "“smart” quotes — dash" in out

    def test_detect_honors_meta_charset(self):
        from webcrawler_ray.functions.htmlparse import decode_html

        body = "preße €".encode("iso-8859-15")
        html = (b'<head><meta charset="iso-8859-15"></head><body>'
                + body + b"</body>")
        assert "preße €" in decode_html(html, decoder="detect")

    def test_detect_never_fails_on_malformed_bom(self):
        from webcrawler_ray.functions.htmlparse import decode_html

        # a UTF-16 BOM followed by an odd byte count / garbage: the BOM
        # branch must fall through to the byte heuristics, not raise
        for junk in (b"\xff\xfe<p>odd", b"\xfe\xff\x00", b"\xef\xbb\xbf\xff"):
            out = decode_html(junk, decoder="detect")
            assert isinstance(out, str)

    def test_detect_bomless_utf16_html(self):
        # real utf-16 web pages carry ASCII markup, so every 8-bit read
        # is NUL-ridden and the scored fallback must pick utf-16
        from webcrawler_ray.functions.htmlparse import decode_html

        doc = "<html><body>naïve café — 中文 test</body></html>"
        for enc in ("utf-16-le", "utf-16-be"):
            out = decode_html(doc.encode(enc), decoder="detect")
            assert "naïve café — 中文 test" in out, enc

    def test_detect_mojibake_corpus_roundtrip(self):
        # mojibake corpus: for each (text, encoding) the scored detect
        # must reproduce the ORIGINAL text — and because the Ray parse
        # stage and the conformance oracle share decode_html, oracle
        # parity on non-UTF-8 pages is parity by construction; assert it
        # anyway through parse_page on both call shapes
        from webcrawler_ray.functions.htmlparse import (decode_html,
                                                        parse_page)

        corpus = [
            ("<p>très élégant, señor</p>", "latin-1"),
            ("<p>“curly” and — em-dash …</p>",
             "cp1252"),
            ("<p>Ärger süß Öl</p>", "cp1252"),
            ("<html><head><title>t</title></head>"
             "<body>utf-16 body — ça va</body></html>", "utf-16-le"),
            ("<body>plain ascii stays ascii</body>", "ascii"),
            # round-5 candidate-set extension: the letter-fraction key
            # splits the Latin family (latin-2 letters vs latin-1
            # symbol soup over the same bytes), kana coherence plus the
            # byte-pattern gate admits shift_jis
            ("<p>Zażółć gęślą jaźń łódź</p>", "iso-8859-2"),
            ("<p>Œuvre cœur Žižka €100</p>", "iso-8859-15"),
            ("<p>こんにちは、世界。テスト</p>", "shift_jis"),
        ]
        for text, enc in corpus:
            raw = text.encode(enc)
            got = decode_html(raw, decoder="detect")
            assert got == text, (enc, got)
            # parse path (the oracle and the Ray stage both call this)
            assert parse_page(raw, decoder="detect").visible_text == \
                parse_page(text).visible_text, enc

    def test_detect_prefers_cp1252_over_wrong_utf16(self):
        # even-length cp1252 text must NOT be misread as utf-16: the
        # wrong utf-16 read is mess-free CJK soup, but has ~zero Latin
        # coherence — the tie-break keeps the 8-bit candidate
        from webcrawler_ray.functions.htmlparse import decode_html

        text = "<p>café “ok”</p>"  # 16 chars
        raw = text.encode("cp1252")
        assert len(raw) % 2 == 0  # utf-16 candidates are in play
        assert decode_html(raw, decoder="detect") == text

    def test_unknown_strategy_name_is_valueerror(self):
        import pytest

        from webcrawler_ray.functions.htmlparse import decode_html
        from webcrawler_ray.stages.parse import ParseHtmlBatch

        with pytest.raises(ValueError, match="unknown decode strategy"):
            decode_html(b"<p>x</p>", decoder="auto")
        with pytest.raises(ValueError, match="unknown decode strategy"):
            ParseHtmlBatch(decode="auto")

    def test_detect_passes_clean_utf8_through(self):
        from webcrawler_ray.functions.htmlparse import decode_html

        s = "<body>élève 你好</body>"
        assert decode_html(s.encode("utf-8"), decoder="detect") == s

    def test_global_strategy_hook_roundtrip(self):
        from webcrawler_ray.functions import htmlparse as hp

        html = "café".encode("latin-1")
        # pinned default: latin-1 fallback happens to match here
        assert hp.decode_html(html) == "café"
        hp.set_decode_strategy("detect")
        try:
            assert hp.decode_html(html) == "café"
            assert hp.parse_page(
                b"<p>\x93q\x94</p>").visible_text == "“q”"
        finally:
            hp.set_decode_strategy("pinned")
        import pytest

        with pytest.raises(ValueError):
            hp.set_decode_strategy("nope")

    def test_parse_stage_carries_decoder(self):
        import pyarrow as pa

        from webcrawler_ray.stages.parse import ParseHtmlBatch

        batch = pa.table({
            "url": ["http://h/a"], "host": ["http://h"],
            "html": [b"<body>\x93x\x94</body>"]})
        out = ParseHtmlBatch(decode="detect")(batch)
        assert out.column("extracted_text")[0].as_py() == "“x”"


class TestAnchorTexts:
    def test_alignment_and_capture(self):
        from webcrawler_ray.functions.htmlparse import (
            anchor_texts,
            parse_page,
        )

        h = (b'<html><body><a href="/x">Click <b>here</b> now</a>'
             b' between <a href=" ">blank skipped</a>'
             b'<a href="/y z">Y link</a><a>no href</a>'
             b'<a href="/empty"></a></body></html>')
        got = anchor_texts(h)
        assert got == [("/x", "Click here now"), ("/y", "Y link"),
                       ("/empty", "")]
        # href list identical to the crawl parser's (same skip rule)
        assert [h for h, _ in got] == parse_page(h).hrefs

    def test_nested_anchor_innermost_wins(self):
        from webcrawler_ray.functions.htmlparse import anchor_texts

        h = b'<a href="/outer">out <a href="/inner">in</a></a> tail'
        got = dict(anchor_texts(h))
        assert got["/inner"] == "in"
        assert got["/outer"] == "out"

    def test_text_outside_anchors_ignored(self):
        from webcrawler_ray.functions.htmlparse import anchor_texts

        h = b'<p>pre</p><a href="/a">A</a><p>post</p>'
        assert anchor_texts(h) == [("/a", "A")]
