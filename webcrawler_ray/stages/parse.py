"""Parse stage (M6-M10): html -> visible text, title, first-N words,
fixed-up outlinks. An actor-pool ``map_batches`` stage: per-document
parsing is the CPU-bound hot path of the crawl, so it runs as a callable
class with small batches (wide binary rows — SURVEY.md §4 memory row).

Per-row cost is inherent (an HTML parse); everything around it is
columnar: inputs arrive as zero-copy Arrow binary, outputs are built as
Arrow arrays once per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.htmlparse import parse_page
from ..functions.urls import fixup_hrefs


class ParseHtmlBatch:
    """map_batches callable: adds extracted_text, title, first_n, links,
    n_links. Reproduces Parser.py:8-72 semantics via the shared extractor
    (the byte-identical invariant path).

    ``enrich=True`` additionally computes the crawl-time enrichment a
    training-data corpus wants per page (token count, 16-perm MinHash
    band minimum + SimHash content fingerprints for downstream near-dup
    detection, stopword language score) — one pass over the text while it
    is already hot in cache."""

    def __init__(self, first_n_words: int = 20, keep_html: bool = True,
                 enrich: bool = False, decode=None):
        self.first_n_words = first_n_words
        self.keep_html = keep_html
        self.enrich = enrich
        # charset strategy name ("pinned"/"detect") or bytes->str callable;
        # carried IN the pickled callable so every worker process decodes
        # the same way (a driver-side set_decode_strategy would not
        # propagate to map_batches workers)
        if decode is not None and not callable(decode):
            from ..functions.htmlparse import _DECODERS
            if decode not in _DECODERS:
                # fail at pipeline build, not with a KeyError deep inside
                # the first map_batches task on a worker
                raise ValueError(f"unknown decode strategy: {decode!r} "
                                 f"(have {sorted(_DECODERS)} or a callable)")
        self.decode = decode
        if enrich:
            from ..functions.hashing import TokenHashCache, minhash_perm_params

            self._perm_a, self._perm_b = minhash_perm_params(16)
            # actor-resident memoized token hashing: Zipf vocabulary means
            # almost every token of a batch is already cached, so the
            # per-token md5 pass collapses to one factorize per batch
            self._tok_cache = TokenHashCache()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        hosts = batch.column("host").to_pylist()
        htmls = batch.column("html").to_pylist()
        n = len(urls)
        texts = np.empty(n, dtype=object)
        titles = np.empty(n, dtype=object)
        firsts = np.empty(n, dtype=object)
        links: list[list[str]] = [None] * n  # type: ignore[list-item]
        for i in range(n):
            p = parse_page(htmls[i], decoder=self.decode)
            texts[i] = p.visible_text
            titles[i] = p.title
            firsts[i] = p.first_n_words(self.first_n_words)
            links[i] = fixup_hrefs(p.hrefs, hosts[i])
        out = batch if self.keep_html else batch.drop_columns(["html"])
        out = out.append_column("extracted_text", pa.array(texts, pa.string()))
        out = out.append_column("title", pa.array(titles, pa.string()))
        out = out.append_column("first_n", pa.array(firsts, pa.string()))
        out = out.append_column("links", pa.array(links, pa.list_(pa.string())))
        out = out.append_column(
            "n_links", pa.array([len(l) for l in links], pa.int32()))
        if self.enrich:
            out = self._enrich(out, texts)
        return out

    def _enrich(self, out: pa.Table, texts: np.ndarray) -> pa.Table:
        from ..functions.hashing import (
            minhash_signatures_batch,
            shingle_hashes_from_token_hashes,
            simhash64_batch,
        )
        from ..functions.tokenizer import tokenize

        n = len(texts)
        # ONE memoized md5 pass over the whole batch feeds simhash AND
        # the shingle minhash (values identical to per-doc hash_tokens);
        # simhash reduces batch-wide over the factorized form
        toks_list = [tokenize(t) for t in texts]
        codes, n_tokens, uh = self._tok_cache.encode_token_lists(toks_list)
        # centered int64 encoding (v - 2^63) == flip bit 63 then wrap-cast
        sim = (simhash64_batch(codes, n_tokens, uh)
               ^ np.uint64(1 << 63)).astype(np.int64)
        th_all = uh[codes] if len(codes) else np.zeros(0, np.uint64)
        bounds = np.cumsum(n_tokens)
        # per-doc shingle fold stays (cheap vector op per doc); the
        # permute-and-min — the measured residual hot spot — runs once
        # over the whole batch via the segmented slab kernel
        sh_rows = [shingle_hashes_from_token_hashes(
                       th_all[bounds[i] - n_tokens[i]:bounds[i]])
                   for i in range(n)]
        sig = minhash_signatures_batch(sh_rows, self._perm_a, self._perm_b)
        # uint64 min then center into int64: v - 2^63 == flip bit 63
        # (axis-1 reduction is over n_perm, so n == 0 yields (0,) safely)
        mh = (sig.min(axis=1) ^ np.uint64(1 << 63)).astype(np.int64)
        out = out.append_column("n_tokens", pa.array(n_tokens, pa.int64()))
        out = out.append_column("simhash", pa.array(sim, pa.int64()))
        return out.append_column("minhash_min", pa.array(mh, pa.int64()))


SEQ_SHIFT = 20  # must match oracle/crawler.py


def explode_links(batch: pa.Table) -> pa.Table:
    """Explode the links list column into candidate rows (url, seq) where
    seq = (parent fetch_seq << SEQ_SHIFT) | rank-in-sorted-page-links —
    the canonical discovery key (oracle/crawler.py docstring)."""
    empty = pa.table({"url": pa.array([], pa.string()),
                      "seq": pa.array([], pa.int64())})
    if batch.num_rows == 0:
        return empty
    import pyarrow.compute as pc

    la = batch.column("links").combine_chunks()
    flat = pc.list_flatten(la)
    if len(flat) == 0:
        return empty
    lengths = pc.list_value_length(la).to_numpy(zero_copy_only=False).astype(np.int64)
    parent_idx = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
    # rank within each parent's (already sorted) link list
    starts = np.repeat(np.cumsum(lengths) - lengths, lengths)
    ranks = np.arange(len(flat), dtype=np.int64) - starts
    fseq = batch.column("fetch_seq").to_numpy(zero_copy_only=False).astype(np.int64)
    seq = (fseq[parent_idx] << SEQ_SHIFT) | ranks
    return pa.table({"url": flat, "seq": pa.array(seq, pa.int64())})
