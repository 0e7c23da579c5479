"""URL algebra — the identity-defining scalar functions of the crawler.

Re-expresses (from public semantics only):

* M1 normalizer   — reference `utils.py:22-29` (url-normalize 1.4.3 call):
  lowercase scheme+host, default ``https`` scheme, strip default port,
  percent-encoding normalization, dot-segment removal, empty path -> "/".
* M2 splitter     — reference `utils.py:38-49`: *naive* ``link.split("/")``
  host/resource split (NOT urlparse — must reproduce the naive behavior).
* M3 completer    — reference `utils.py:54-56`: ``f"{host}{resource}"``.
* M4 blocklist    — reference `Worker.py:13-30`: suffix match on the last
  3/4 chars against two extension sets.
* M8 href fixup   — reference `Parser.py:26-46`: fragment strip, ``/``-join,
  http->https coercion, silent drop of anything else, then M1 normalize,
  collected into a set (we sort it for determinism, see SURVEY.md §7).

These functions define URL identity for the seen-set and hence the crawl
ordering; the oracle and the Ray pipeline share this exact module.
"""

from __future__ import annotations

import hashlib
from urllib.parse import quote, unquote, urlsplit, urlunsplit

import numpy as np

DEFAULT_SCHEME = "https"
_DEFAULT_PORTS = {"http": 80, "https": 443}

# Safe characters kept verbatim when re-quoting (match url-normalize's
# liberal path/query safe sets closely enough to be stable for http URLs).
_PATH_SAFE = "/%!$&'()*+,;=:@~-._"
_QUERY_SAFE = "%!$&'()*+,;=:@~-._/?"


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    if not path:
        return path
    output: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if output and output[-1] != "":
                output.pop()
                if not output:
                    output = [""]
            continue
        output.append(seg)
    # preserve trailing slash semantics of "." / ".." final segments
    if path.endswith(("/.", "/..")) and (not output or output[-1] != ""):
        output.append("")
    norm = "/".join(output)
    if path.startswith("/") and not norm.startswith("/"):
        norm = "/" + norm
    return norm


def _requote(s: str, safe: str) -> str:
    try:
        return quote(unquote(s), safe=safe)
    except Exception:
        return s


def normalize_url(link: str) -> str:
    """M1: normalize a URL; on any failure return the input unchanged
    (reference `utils.py:22-29` swallows every exception)."""
    try:
        raw = link.strip()
        if not raw:
            return link
        if "://" not in raw:
            # url-normalize provides a default scheme for schemeless input
            raw = f"{DEFAULT_SCHEME}://{raw}"
        parts = urlsplit(raw)
        scheme = parts.scheme.lower()
        host = (parts.hostname or "").lower().rstrip(".")
        if not host:
            return link
        userinfo = ""
        if parts.username:
            userinfo = parts.username
            if parts.password:
                userinfo += f":{parts.password}"
            userinfo += "@"
        port = parts.port
        netloc = f"{userinfo}{host}"
        if port is not None and port != _DEFAULT_PORTS.get(scheme):
            netloc += f":{port}"
        path = _requote(_remove_dot_segments(parts.path), _PATH_SAFE) or "/"
        query = _requote(parts.query, _QUERY_SAFE)
        fragment = _requote(parts.fragment, _QUERY_SAFE)
        return urlunsplit((scheme, netloc, path, query, fragment))
    except Exception:
        return link


def split_host_resource(link: str) -> tuple[str, str]:
    """M2: naive ``split("/")`` host/resource split (`utils.py:38-49`).

    ``https://h/a/b`` -> (``https://h``, ``/a/b``); errors -> ``""`` host.
    """
    try:
        p = link.split("/")
        host_with_schema = f"{p[0]}//{p[2]}"
    except Exception:
        host_with_schema = ""
    resource = "/" + "/".join(link.split("/")[3:])
    return host_with_schema, resource


def normalize_and_split(link: str) -> tuple[str, str]:
    """Reference `utils.py:16-20`: normalize then split."""
    n = normalize_url(link)
    return split_host_resource(n)


def complete_link(host_with_schema: str, resource: str) -> str:
    """M3 (`utils.py:54-56`)."""
    return f"{host_with_schema}{resource}"


# M4 — extension blocklist (`Worker.py:13-30`)
BLOCKED_EXT3 = frozenset(
    ["pdf", "csv", "png", "svg", "jpg", "gif", "raw", "cr2",
     "nef", "orf", "sr2", "bmp", "tif", "ogv"]
)
BLOCKED_EXT4 = frozenset(["tiff", "jpeg"])


def passes_extension_blocklist(url: str) -> bool:
    """M4: suffix match on last 3/4 chars, applied only when len allows."""
    if len(url) > 3 and url[-3:] in BLOCKED_EXT3:
        return False
    if len(url) > 4 and url[-4:] in BLOCKED_EXT4:
        return False
    return True


def passes_extension_blocklist_batch(urls) -> np.ndarray:
    """Vectorized M4 over a sequence of str -> bool ndarray."""
    out = np.ones(len(urls), dtype=bool)
    for i, u in enumerate(urls):
        out[i] = passes_extension_blocklist(u)
    return out


def fixup_href(href: str | None, host_with_schema: str) -> str | None:
    """M8 single-href fixup (`Parser.py:26-46`).

    Returns the normalized absolute URL, or None when the href is dropped
    (fragment-only, relative without leading ``/``, mailto:, javascript:,
    protocol-relative ``//...`` — the reference silently drops all of these;
    note ``//x`` matches the ``url[0] == "/"`` branch and becomes
    ``host//x`` in the reference, which we reproduce).
    """
    if href is None:
        return None
    if href.strip() == "":
        return None
    url = href
    if url[0] == "#":
        return None
    url = url.split("#")[0]
    if url == "":
        return None
    formatted = ""
    if url[0] == "/":
        formatted = f"{host_with_schema}{url}"
    elif len(url) >= 4 and url[:4] == "http" and not (len(url) >= 5 and url[:5] == "https"):
        formatted = "https" + url[4:]
    elif len(url) >= 5 and url[:5] == "https":
        formatted = url
    if formatted == "":
        return None
    return normalize_url(formatted)


def fixup_hrefs(hrefs, host_with_schema: str) -> list[str]:
    """M8 over a page's raw hrefs -> *sorted unique* absolute URLs.

    The reference collects into a Python ``set`` (order lost,
    `Parser.py:26-46`); the canonical deterministic reading sorts the set
    (SURVEY.md §7 ordering note).
    """
    out = set()
    for h in hrefs:
        f = fixup_href(h, host_with_schema)
        if f is not None:
            out.add(f)
    return sorted(out)


def stable_hash64(s: str) -> int:
    """Stable 64-bit hash of a string (blake2b-8); replaces the reference's
    salted builtin ``hash`` (`utils.py:51-52`) which is non-deterministic
    across processes. Returns a Python int in [0, 2**64)."""
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def stable_hash64_batch(strs) -> np.ndarray:
    """Vectorized stable_hash64 -> uint64 ndarray."""
    b = hashlib.blake2b
    return np.fromiter(
        (int.from_bytes(b(s.encode("utf-8"), digest_size=8).digest(), "big") for s in strs),
        dtype=np.uint64,
        count=len(strs),
    )


def shard_of_host(host: str, num_shards: int) -> int:
    """Stable replacement for `utils.py:51-52` ``hash(host) % numWorkers``."""
    return stable_hash64(host) % num_shards


def surt_key(url: str) -> str:
    """SURT (Sort-friendly URI Reordering Transform — the public
    Heritrix / Common Crawl CDX key convention): scheme dropped, host
    labels reversed and comma-joined, ``)`` separator, then the path;
    all lowercased. ``https://News.Example.com/a/B`` ->
    ``com,example,news)/a/b``. Sorting by SURT clusters captures of one
    registrable domain together — the property a capture index needs."""
    u = url.lower()
    for p in ("https://", "http://"):
        if u.startswith(p):
            u = u[len(p):]
            break
    host, _, rest = u.partition("/")
    return ",".join(reversed(host.split("."))) + ")/" + rest
