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
    to the SQL-expressible class)."""
    t = t.strip(WS_CHARS)
    return WS_RE.split(t) if t else []
