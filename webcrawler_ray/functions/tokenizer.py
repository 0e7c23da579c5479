"""THE canonical whitespace tokenizer — one definition for every Python
kernel (textpipe queries, dedup/winnow/span hashing, crawl-time
enrichment) and, via the SQL_* spellings, every DuckDB oracle.

Python str.split()/strip() use ALL of Unicode whitespace while DuckDB
regexes and TRIM do not, so both sides are pinned to this explicit
ASCII class instead (ADVICE r1: texts with tabs/newlines/nbsp would
otherwise diverge — and round-3 review: the dedup kernels using raw
str.split() diverged from their oracles on any \xa0 in the text)."""

from __future__ import annotations

import re

WS_CHARS = " \t\n\r\v\f"
WS_RE = re.compile(r"[ \t\n\r\v\f]+")
# the same class spelled for DuckDB/RE2 (literal in the SQL string)
SQL_WS_CLASS = r"[ \t\n\r\x0b\x0c]"
SQL_TRIM_TEXT = (f"regexp_replace(text, '^{SQL_WS_CLASS}+|"
                 f"{SQL_WS_CLASS}+$', '', 'g')")


def tokenize(t: str) -> list[str]:
    """Whitespace tokenizer over WS_CHARS (M10 split semantics, pinned
    to the SQL-expressible class).

    Fast path: for ASCII text containing none of \\x1c-\\x1f, Python's
    C-level ``str.split()`` splits on EXACTLY the pinned class (its only
    extra split chars are those four ASCII separators plus Unicode
    whitespace), so the ~5x-slower regex split runs only on the rare
    texts where the two semantics could differ."""
    if (t.isascii() and "\x1c" not in t and "\x1d" not in t
            and "\x1e" not in t and "\x1f" not in t):
        return t.split()
    t = t.strip(WS_CHARS)
    return WS_RE.split(t) if t else []
