"""Text-analysis operators over the ``documents`` table — the language-ID /
quality-scoring / token-counting / fingerprinting stages a training-data
pipeline runs over crawled text (repo brief: first-class components beside
the crawl engine; they reuse the crawl's extraction conventions, e.g.
whitespace ``split()`` tokenization == `Parser.py:48-55`).

All stages are vectorized ``map_batches`` over pruned column reads; no
driver-side loops. SQL-checkable outputs use only exact types (ints,
strings) so the DuckDB oracle hashes match bit-for-bit.
"""

from __future__ import annotations

from ..io_utils import corpus_cache_dir
from ..io_utils import read_parquet_clean as _rpq

import hashlib
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa

# Canonical whitespace for every SQL-checked text operator: the ASCII
# class both sides can express EXACTLY — the ONE canonical tokenizer
# now lives in functions/tokenizer.py (shared with the dedup/winnow/
# enrichment hashing kernels); re-exported here so every existing
# `textpipe.SQL_TRIM_TEXT` / `textpipe.tokenize` consumer keeps working
from ..functions.tokenizer import (  # noqa: F401
    SQL_TRIM_TEXT,
    SQL_WS_CLASS,
    WS_CHARS,
    WS_RE,
    tokenize,
)


def _docs(ray, sf_dir: str, columns):
    return _rpq(ray, f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------------------
def token_counts(ray, sf_dir: str):
    """(doc_id, n_tokens): whitespace split() token count (M10 tokenizer)."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = np.fromiter((len(tokenize(t)) for t in texts), dtype=np.int64,
                        count=len(texts))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_tokens": pa.array(n, pa.int64())})

    return _docs(ray, sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow").sort("doc_id")


def first_n_words(ray, sf_dir: str, n: int = 20):
    """(doc_id, first20): first-N-words projection (M10, Parser.py:48-55)."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out = [" ".join(tokenize(t)[:n]) for t in texts]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "first20": pa.array(out, pa.string())})

    return _docs(ray, sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow").sort("doc_id")


def lang_counts(ray, sf_dir: str):
    """(lang, n_docs): per-language document counts (groupby-count)."""
    ds = _docs(ray, sf_dir, ["lang"]).groupby("lang").count()
    return ds.map_batches(
        lambda t: pa.table({"lang": t.column("lang"),
                            "n_docs": t.column("count()")}),
        batch_format="pyarrow").sort("lang")


def quality_counts(ray, sf_dir: str):
    """(doc_id, n_chars2, n_alpha, n_digit, n_space, n_tokens2): exact
    integer quality signals (length / char-class counts). Ratio-style
    quality scores derive from these; integers keep the oracle hash exact."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["text"]
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_chars2": s.str.len().astype("int64"),
            "n_alpha": s.str.count(r"[A-Za-z]").astype("int64"),
            "n_digit": s.str.count(r"[0-9]").astype("int64"),
            "n_space": s.str.count(r" ").astype("int64"),
            "n_tokens2": s.map(lambda t: len(tokenize(t))).astype("int64"),
        })

    return _docs(ray, sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pandas").sort("doc_id")


def quality_filter(ray, sf_dir: str):
    """(doc_id, n_tokens): the corpus QUALITY-FILTER operator — keep
    documents passing the classic training-data gates (min length,
    alpha-ratio floor, digit-ratio ceiling). All predicates are integer
    cross-multiplications (n_alpha * 1000 >= n_chars * 810, not a float
    ratio) so the DuckDB oracle matches bit-for-bit. A pure streamed
    map_batches filter: no shuffle, prunes to two output columns."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["text"]
        n_chars = s.str.len().astype("int64")
        n_alpha = s.str.count(r"[A-Za-z]").astype("int64")
        n_digit = s.str.count(r"[0-9]").astype("int64")
        n_tokens = s.map(lambda t: len(tokenize(t))).astype("int64")
        keep = ((n_tokens >= 30)
                & (n_alpha * 1000 >= n_chars * 810)
                & (n_digit * 10 <= n_chars * 2))
        return pd.DataFrame({"doc_id": batch["doc_id"][keep],
                             "n_tokens": n_tokens[keep]})

    return _docs(ray, sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pandas").sort("doc_id")


QUALITY_FILTER_SQL = f"""
WITH q AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
         CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
         CASE WHEN {SQL_TRIM_TEXT} = '' THEN 0
              ELSE CAST(len(regexp_split_to_array({SQL_TRIM_TEXT},
                   '{SQL_WS_CLASS}+')) AS BIGINT)
         END AS n_tokens
  FROM documents)
SELECT doc_id, n_tokens FROM q
WHERE n_tokens >= 30 AND n_alpha * 1000 >= n_chars * 810
  AND n_digit * 10 <= n_chars * 2
ORDER BY doc_id
"""


def md5_fingerprints(ray, sf_dir: str):
    """(doc_id, fp): md5 document fingerprint of the normalized
    (lower+strip) text — the exact-dedup key."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        fps = [hashlib.md5(t.strip(WS_CHARS).lower().encode("utf-8")).hexdigest()
               for t in texts]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "fp": pa.array(fps, pa.string())})

    return _docs(ray, sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow").sort("doc_id")


# --- language-ID heuristic (no SQL oracle: model-style scoring) ------------
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "pt": {"de", "a", "o", "que", "e", "do", "da", "em", "um", "para"},
    "es": {"de", "la", "que", "el", "en", "y", "los", "del", "se", "las"},
}


class LangIdStage:
    """Actor-pool stage: stopword-overlap language scorer (stateful setup:
    tables built once per actor in __init__ — the model-load pattern).
    Tokenization uses the shared ``tokenize`` so the DuckDB oracle can
    reproduce the exact counts; ties resolve to the lexicographically
    first language (strict > while scanning sorted langs)."""

    def __init__(self):
        self.tables = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        preds, scores = [], []
        for t in texts:
            toks = tokenize(t.lower())
            best, best_n = "unk", 0
            for lang, tbl in sorted(self.tables.items()):
                n = sum(1 for w in toks if w in tbl)
                if n > best_n:
                    best, best_n = lang, n
            preds.append(best)
            scores.append(best_n)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "lang_pred": pa.array(preds, pa.string()),
                         "n_stopword_hits": pa.array(scores, pa.int64())})


def langid(ray, sf_dir: str, concurrency: int = 2):
    return _docs(ray, sf_dir, ["doc_id", "text"]).map_batches(
        LangIdStage, batch_format="pyarrow", batch_size=1024,
        concurrency=concurrency).sort("doc_id")


def winnow_fingerprints(ray, sf_dir: str, k: int = 5, w: int = 8):
    """(doc_id, n_fps, min_fp, max_fp): winnowing document fingerprints
    (Schleimer et al., SIGMOD'03): rolling k-gram hashes, window-minimum
    selection; summarized to exact ints per doc."""

    from ..functions.hashing import kgram_hashes_ordered

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_fps, mins, maxs = [], [], []
        for t in texts:
            # vectorized winnow: polynomial k-gram hashes (tokens
            # md5-hashed once) + one sliding-window min — no
            # per-gram string building or per-window python loop
            hs = kgram_hashes_ordered(t, k)
            if len(hs) == 0:
                n_fps.append(0)
                mins.append(0)
                maxs.append(0)
                continue
            if len(hs) <= w:
                sel = np.array([hs.min()], dtype=np.uint64)
            else:
                win = np.lib.stride_tricks.sliding_window_view(hs, w)
                sel = np.unique(win.min(axis=1))
            n_fps.append(len(sel))
            mins.append(int(sel.min()) % (1 << 63))
            maxs.append(int(sel.max()) % (1 << 63))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_fps": pa.array(n_fps, pa.int64()),
                         "min_fp": pa.array(mins, pa.int64()),
                         "max_fp": pa.array(maxs, pa.int64())})

    return _docs(ray, sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow").sort("doc_id")


# --- deterministic sampling (corpus subsetting) ----------------------------
SAMPLE_MULT = 48271     # MINSTD multiplier — stable arithmetic both sides
SAMPLE_MOD = 100
SAMPLE_KEEP = 10        # ~10% deterministic sample


def docs_sample(ray, sf_dir: str):
    """(doc_id, n_chars): seeded deterministic ~10% corpus sample via
    modular arithmetic on doc_id — the reproducible-subsample operator
    (no RNG state, any worker agrees); numpy mask, zero-copy filter."""
    ds = _docs(ray, sf_dir, ["doc_id", "n_chars"])

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = (ids * SAMPLE_MULT) % SAMPLE_MOD < SAMPLE_KEEP
        return batch.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow").sort("doc_id")


DOCS_SAMPLE_SQL = f"""
SELECT doc_id, n_chars FROM documents
WHERE (doc_id * {SAMPLE_MULT}) % {SAMPLE_MOD} < {SAMPLE_KEEP}
ORDER BY doc_id
"""


BOTTOMK_K = 100


def _md5_priorities(ids) -> list[str]:
    """The ONE spelling of the hash-priority used by every sampling
    operator: md5 hex of the DECIMAL doc id — chosen because DuckDB's
    ``md5(CAST(doc_id AS VARCHAR))`` computes the identical string, so
    each sampler's oracle shares it verbatim."""
    return [hashlib.md5(str(i).encode()).hexdigest() for i in ids]


def docs_sample_bottomk(ray, sf_dir: str, k: int = BOTTOMK_K):
    """(doc_id, n_chars): EXACT-k uniform sample without replacement via
    bottom-k by hash priority (md5 of the decimal doc_id — SQL-sharable,
    so this sampler is value-checked against DuckDB). docs_sample's
    Bernoulli filter keeps ~p*n rows; bottom-k keeps exactly k whatever
    the input size, which is what a "give me 100k docs from 100 TB"
    request needs. Scale shape: per-batch LOCAL bottom-k (O(batch)
    priorities, one argsort), then a global sort+limit over the
    O(blocks * k) surviving candidates — the full corpus never moves.
    (The kept priorities also form the classic bottom-k sketch: the
    k-th smallest priority estimates the distinct count as (k-1)/h_k.)"""
    ds = _docs(ray, sf_dir, ["doc_id", "n_chars"])

    def local_bottomk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        pri = np.array(_md5_priorities(ids))
        keep = np.argsort(pri, kind="mergesort")[:k]
        t = batch.take(pa.array(keep, pa.int64()))
        return t.append_column("pri", pa.array(pri[keep], pa.string()))

    out = (ds.map_batches(local_bottomk, batch_format="pyarrow")
             .sort(["pri", "doc_id"]).limit(k)
             .map_batches(lambda t: t.drop_columns(["pri"]),
                          batch_format="pyarrow"))
    return out.sort("doc_id")


DOCS_SAMPLE_BOTTOMK_SQL = f"""
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars FROM documents
  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT {BOTTOMK_K})
ORDER BY doc_id
"""


SOURCE_CAP_K = 10


def docs_per_source_cap(ray, sf_dir: str, k: int = SOURCE_CAP_K):
    """(doc_id, source, rnk): corpus-curation cap — at most ``k`` docs
    per source, chosen uniformly (md5-of-id priority, so the winner set
    is deterministic AND SQL-sharable). This is the anti-domination
    operator a web-scale corpus needs (one mega-host must not swamp the
    training mix). Scale shape: a per-batch LOCAL per-source head-k
    combiner prunes before the exchange (a row outside its batch's own
    per-source bottom-k can never be in the global one), so the shuffle
    moves <= k rows per source per batch; the bucketed merge then does
    one vectorized sort + groupby-head per coarse source bucket."""
    from ..io_utils import parquet_num_rows
    from ..stages.aggregates import buckets_for
    from ..functions.urls import stable_hash64_batch

    n_docs = parquet_num_rows(f"{sf_dir}/documents.parquet")
    n_buckets = buckets_for(n_docs)
    ds = _docs(ray, sf_dir, ["doc_id", "source"])

    def local_prune(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        pri = _md5_priorities(ids)
        df = pd.DataFrame({"doc_id": batch.column("doc_id").to_numpy(
                               zero_copy_only=False).astype("int64"),
                           "source": batch.column("source").to_pylist(),
                           "pri": pri})
        df = df.sort_values(["source", "pri", "doc_id"], kind="mergesort")
        df = df.groupby("source").head(k)
        b = (stable_hash64_batch(df["source"].tolist())
             % n_buckets).astype(np.int64)
        return pa.table({"doc_id": pa.array(df["doc_id"], pa.int64()),
                         "source": pa.array(df["source"], pa.string()),
                         "pri": pa.array(df["pri"], pa.string()),
                         "sbucket": pa.array(b, pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "pri", "doc_id"], kind="mergesort")
        top = g.groupby("source").head(k).copy()
        top["rnk"] = top.groupby("source").cumcount() + 1
        return pd.DataFrame({"doc_id": top["doc_id"].astype("int64"),
                             "source": top["source"],
                             "rnk": top["rnk"].astype("int64")})

    return (ds.map_batches(local_prune, batch_format="pyarrow")
              .groupby("sbucket")
              .map_groups(per_bucket, batch_format="pandas")
              .sort(["source", "rnk"]))


DOCS_PER_SOURCE_CAP_SQL = f"""
SELECT doc_id, source, rnk FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
             PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
  FROM documents)
WHERE rnk <= {SOURCE_CAP_K} ORDER BY source, rnk
"""


# --- normalization (cleaning) ----------------------------------------------
_PUNCT_RE = re.compile(r"[!-/:-@\[-`{-~]")


def doc_normalize(ray, sf_dir: str):
    """(doc_id, norm_text): canonical cleaning transform — lowercase,
    strip ASCII punctuation, collapse whitespace runs, trim. The exact
    regex classes are mirrored in the DuckDB oracle."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out = []
        for t in texts:
            t = _PUNCT_RE.sub("", t.lower())
            t = WS_RE.sub(" ", t).strip(WS_CHARS)
            out.append(t)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "norm_text": pa.array(out, pa.string())})

    return _docs(ray, sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow").sort("doc_id")


DOC_NORMALIZE_SQL = f"""
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(
           lower(text), '[!-/:-@[-`{{-~]', '', 'g'),
           '{SQL_WS_CLASS}+', ' ', 'g'),
           '^ +| +$', '', 'g') AS norm_text
FROM documents ORDER BY doc_id
"""


# --- corpus term frequencies (wordcount) -----------------------------------
def doc_top_terms(ray, sf_dir: str, k: int = 20):
    """(token, n): global top-k corpus term frequencies — the canonical
    wordcount: per-batch Counter partials (one row per distinct token
    per batch), bucketed vectorized merge, then a tiny top-k sort."""
    from collections import Counter

    from ..stages.aggregates import hash_bucket_aggregate

    ds = _docs(ray, sf_dir, ["text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(tokenize(t.lower()))
        return pd.DataFrame({"token": list(c.keys()),
                             "n": pd.Series(list(c.values()),
                                            dtype="int64")})

    from ..io_utils import parquet_column_bytes

    out = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["token"],
        lambda df: df.groupby("token", as_index=False).agg(n=("n", "sum")),
        # the shuffled rows are per-batch (token, n) partials — bounded
        # by token INSTANCES, not document count (which undersizes the
        # fan-out by the tokens-per-doc factor). Token instances <=
        # text bytes / 2 (a token plus its separator is >= 2 bytes);
        # footer-only uncompressed column size gives that bound cheaply.
        n_rows=parquet_column_bytes(f"{sf_dir}/documents.parquet",
                                    "text") // 2)
    return out.sort(["n", "token"], descending=[True, False]).limit(k)


DOC_TOP_TERMS_SQL = f"""
WITH t AS (
  SELECT unnest(str_split_regex(
      regexp_replace(lower(text), '^{SQL_WS_CLASS}+|{SQL_WS_CLASS}+$',
                     '', 'g'),
      '{SQL_WS_CLASS}+')) AS token
  FROM documents)
SELECT token, COUNT(*) AS n FROM t WHERE token != ''
GROUP BY token ORDER BY n DESC, token LIMIT 20
"""


# --- duplicate n-gram analysis (cross-doc repeated substrings) --------------
DUP_NGRAM_N = 5         # token n-gram width
DUP_NGRAM_MIN_DOCS = 2  # "duplicated" = appears in >= 2 distinct docs
DUP_NGRAM_K = 20


def docs_dup_ngrams(ray, sf_dir: str, n: int = DUP_NGRAM_N,
                    k: int = DUP_NGRAM_K):
    """(gram, n_docs): token n-grams shared by >= 2 distinct documents —
    the cross-document repeated-substring signal behind training-data
    dedup / benchmark-contamination audits (Lee et al., ACL'22 "dedup
    training data"). Scale shape: each doc is one row, so a per-batch
    per-doc DISTINCT gram set is globally correct for (doc, gram);
    batches emit (gram, n_docs) partials and the bucketed merge sums
    them — the shuffle moves one row per distinct gram per batch, never
    the text. Fan-out is sized by token bytes (gram count ~ token count),
    not doc count."""
    from ..io_utils import parquet_column_bytes
    from ..stages.aggregates import hash_bucket_aggregate

    ds = _docs(ray, sf_dir, ["text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            toks = tokenize(t)
            if len(toks) < n:
                continue
            c.update({" ".join(toks[i:i + n])
                      for i in range(len(toks) - n + 1)})
        return pd.DataFrame({"gram": list(c.keys()),
                             "n_docs": pd.Series(list(c.values()),
                                                 dtype="int64")})

    tok_bound = parquet_column_bytes(
        f"{sf_dir}/documents.parquet", "text") // 2
    if tok_bound * 32 <= 64 << 20:
        # the per-batch partials are distinct-gram bounded and fit the
        # broadcast budget: fold + filter + top-k on the driver, one
        # corpus pass and zero shuffles (the bucketed merge below is
        # the large-corpus route)
        parts = (ds.map_batches(partial, batch_format="pyarrow")
                   .to_pandas())
        tot = parts.groupby("gram", as_index=False)["n_docs"].sum()
        tot = tot[tot["n_docs"] >= DUP_NGRAM_MIN_DOCS]
        tot = (tot.sort_values(["n_docs", "gram"],
                               ascending=[False, True])
                  .head(k).reset_index(drop=True))
        return pa.table({"gram": pa.array(tot["gram"], pa.string()),
                         "n_docs": pa.array(
                             tot["n_docs"].astype("int64"))})

    out = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["gram"],
        lambda df: df.groupby("gram", as_index=False).agg(
            n_docs=("n_docs", "sum")),
        n_rows=tok_bound)

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t.column("n_docs"),
                                         DUP_NGRAM_MIN_DOCS))

    return (out.map_batches(keep, batch_format="pyarrow")
               .sort(["n_docs", "gram"], descending=[True, False]).limit(k))


DOCS_DUP_NGRAMS_SQL = f"""
WITH toks AS (
  SELECT doc_id, str_split_regex({SQL_TRIM_TEXT}, '{SQL_WS_CLASS}+') AS tk
  FROM documents),
pos AS (
  SELECT doc_id, tk,
         unnest(generate_series(1, len(tk) - {DUP_NGRAM_N - 1})) AS i
  FROM toks WHERE len(tk) >= {DUP_NGRAM_N}),
g AS (
  SELECT DISTINCT doc_id,
         array_to_string(tk[i:i+{DUP_NGRAM_N - 1}], ' ') AS gram
  FROM pos)
SELECT gram, COUNT(*) AS n_docs FROM g
GROUP BY gram HAVING COUNT(*) >= {DUP_NGRAM_MIN_DOCS}
ORDER BY n_docs DESC, gram LIMIT {DUP_NGRAM_K}
"""


# --- duplicated-substring SPANS (exact substring dedup) ----------------------
DUP_SPAN_K = 8          # token k-gram width defining a duplicated run


def docs_dup_spans(ray, sf_dir: str, k: int = DUP_SPAN_K):
    """(doc_id, span_start, span_end, n_grams): MAXIMAL duplicated-
    substring token spans — for every doc, the 1-based inclusive token
    ranges covered by ``k``-grams that occur at >= 2 (doc, position)
    sites anywhere in the corpus, overlapping/adjacent grams merged into
    one span. This is the REMOVAL-MASK half of exact substring dedup
    (Lee et al., ACL'22): `docs_dup_ngrams` answers "which substrings
    repeat", this answers "which bytes of which doc to cut". Value-exact
    vs a DuckDB oracle (the md5/FNV ordered-k-gram machinery of
    ``dedup_oracle`` + gaps-and-islands interval merge).

    Scale shape (the honest suffix-array replacement): occurrences move
    as (hash, doc_id, pos) int64 triples through ONE bucketed exchange
    keyed by hash — ~one row per corpus token, the same order of traffic
    a distributed suffix-array build pays, but in a single groupby
    shape; groups with >= 2 occurrences emit positions back; the island
    merge is a vectorized per-doc pass inside a second doc-keyed
    exchange. The text itself never shuffles."""
    from ..functions.hashing import kgram_hashes_ordered
    from ..io_utils import parquet_column_bytes
    from ..stages.aggregates import hash_bucket_aggregate

    ds = _docs(ray, sf_dir, ["doc_id", "text"])
    # occurrence count ~ token count ~ text bytes / 6
    n_occ = max(1, parquet_column_bytes(f"{sf_dir}/documents.parquet",
                                        "text") // 6)

    def occs(batch: pa.Table) -> pa.Table:
        hs_l, d_l, i_l = [], [], []
        ids = batch.column("doc_id").to_pylist()
        for did, t in zip(ids, batch.column("text").to_pylist()):
            hs = kgram_hashes_ordered(t, k)
            if len(hs) == 0:
                continue
            hs_l.append(hs.view(np.int64))
            d_l.append(np.full(len(hs), did, np.int64))
            i_l.append(np.arange(1, len(hs) + 1, dtype=np.int64))
        if not hs_l:
            return pa.table({"h": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "i": pa.array([], pa.int64())})
        return pa.table({"h": pa.array(np.concatenate(hs_l), pa.int64()),
                         "doc_id": pa.array(np.concatenate(d_l), pa.int64()),
                         "i": pa.array(np.concatenate(i_l), pa.int64())})

    def keep_dup_positions(df: pd.DataFrame) -> pd.DataFrame:
        sz = df.groupby("h")["h"].transform("size")
        return df.loc[sz >= 2, ["doc_id", "i"]]

    # identity partial (a hash's sites span batches — filtering early
    # would drop cross-batch duplicates); the >=2 cut runs at the merge
    dup_pos = hash_bucket_aggregate(
        ds.map_batches(occs, batch_format="pyarrow"),
        ["h"], lambda df: df, merge=keep_dup_positions, n_rows=n_occ)

    def islands(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "span_start": pd.Series([], dtype="int64"),
                "span_end": pd.Series([], dtype="int64"),
                "n_grams": pd.Series([], dtype="int64")})
        df = df.sort_values(["doc_id", "i"], kind="mergesort")
        d = df["doc_id"].to_numpy()
        i = df["i"].to_numpy()
        new = np.empty(len(d), dtype=bool)
        new[0] = True
        # grams at i1 < i2 cover [i1, i1+k-1], [i2, i2+k-1]: they merge
        # (overlap or touch) exactly when i2 - i1 <= k
        new[1:] = (d[1:] != d[:-1]) | (i[1:] - i[:-1] > k)
        g = np.cumsum(new)
        out = (pd.DataFrame({"doc_id": d, "g": g, "i": i})
               .groupby(["doc_id", "g"], as_index=False)
               .agg(span_start=("i", "min"), span_end=("i", "max"),
                    n_grams=("i", "size")))
        out["span_end"] = (out["span_end"] + (k - 1)).astype("int64")
        out["n_grams"] = out["n_grams"].astype("int64")
        return out[["doc_id", "span_start", "span_end", "n_grams"]]

    # identity partial again: islands only merge correctly once a doc's
    # positions are co-located in one bucket
    return (hash_bucket_aggregate(dup_pos, ["doc_id"], lambda df: df,
                                  merge=islands, n_rows=n_occ)
            .sort(["doc_id", "span_start"]))


# --- benchmark-contamination scan --------------------------------------------
# probe phrases a training pipeline checks the corpus against (eval-set
# leakage); tiny fixed list — literal in the oracle SQL, broadcast to the
# scan. Chosen from the synthetic vocabulary so the sf testdata has hits.
CONTAM_PROBES = ("customer stream window", "key scan query",
                 "slow fast table", "table table key")


def docs_contamination(ray, sf_dir: str):
    """(doc_id, probe): documents whose text CONTAINS a probe phrase —
    the eval-set-leak scan. The probe list is tiny and ships in the task
    closure (broadcast, never a shuffle); matching is pyarrow's
    vectorized match_substring per batch, a pure streaming filter with
    no exchange."""
    import pyarrow.compute as pc

    ds = _docs(ray, sf_dir, ["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        ids_out, probes_out = [], []
        for p in CONTAM_PROBES:
            hit = batch.filter(pc.match_substring(batch.column("text"), p))
            if hit.num_rows:
                ids_out.append(hit.column("doc_id"))
                probes_out.extend([p] * hit.num_rows)
        if not ids_out:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "probe": pa.array([], pa.string())})
        return pa.table({
            "doc_id": pa.concat_arrays(
                [c.combine_chunks() for c in ids_out]).cast(pa.int64()),
            "probe": pa.array(probes_out, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow").sort(["doc_id", "probe"])


_PROBE_VALUES = ", ".join(f"('{p}')" for p in CONTAM_PROBES)
DOCS_CONTAMINATION_SQL = f"""
SELECT d.doc_id, p.probe
FROM documents d, (VALUES {_PROBE_VALUES}) p(probe)
WHERE contains(d.text, p.probe)
ORDER BY doc_id, probe
"""


# --- length histogram ---------------------------------------------------------
HIST_BUCKET = 100


def docs_length_histogram(ray, sf_dir: str):
    """(bucket_lo, n_docs): corpus length profile in 100-char buckets —
    per-batch np.unique partial counts (one row per touched bucket per
    batch leaves the scan), merged by a tiny groupby-sum: the histogram
    never moves more than O(batches x buckets) rows."""
    from ray.data.aggregate import Sum

    ds = _docs(ray, sf_dir, ["n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        nc = t.column("n_chars").to_numpy(zero_copy_only=False)
        lo = (nc // HIST_BUCKET) * HIST_BUCKET
        u, c = np.unique(lo, return_counts=True)
        return pa.table({"bucket_lo": pa.array(u.astype(np.int64), pa.int64()),
                         "n_docs": pa.array(c.astype(np.int64), pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("bucket_lo")
              .aggregate(Sum("n_docs", alias_name="n_docs"))
              .sort("bucket_lo"))


DOCS_LENGTH_HISTOGRAM_SQL = f"""
SELECT (n_chars // {HIST_BUCKET}) * {HIST_BUCKET} AS bucket_lo,
       COUNT(*) AS n_docs
FROM documents GROUP BY 1 ORDER BY 1
"""


# --- BPE-ish regex tokenization --------------------------------------------
# letters-run | digits-run | single non-alnum-non-ws — the RE2-safe
# simplification of the GPT-2 pre-tokenizer (no lookaheads, so DuckDB
# runs the IDENTICAL pattern)
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\v\f]"
_BPE_RE = re.compile(BPE_PATTERN)
BPE_PATTERN_SQL = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\x0b\x0c]"


def token_counts_bpe(ray, sf_dir: str):
    """(doc_id, n_bpe_tokens): BPE-style pre-tokenizer counts — the
    token-budget estimate a training pipeline runs before packing."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = np.fromiter((len(_BPE_RE.findall(t)) for t in texts),
                        dtype=np.int64, count=len(texts))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_bpe_tokens": pa.array(n, pa.int64())})

    return _docs(ray, sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow").sort("doc_id")


TOKEN_COUNTS_BPE_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{BPE_PATTERN_SQL}')) AS BIGINT)
           AS n_bpe_tokens
FROM documents ORDER BY doc_id
"""


# --- per-doc distinctive term (integer tf-idf) -------------------------------
def doc_tfidf_top(ray, sf_dir: str):
    """(doc_id, token, score): each document's most DISTINCTIVE term by
    integer tf-idf — score = (tf * n_docs_total) // df, an exact integer
    both engines compute identically (no float log). Scale shape: two
    bucketed exchanges, each keyed so the needed context co-locates:

      1. by TOKEN — every (doc_id, token, tf) row of a token lands in
         one bucket, so df (the token's global row count: (doc, token)
         rows are unique) is computable IN-bucket, with no vocab-sized
         join or driver-built document-frequency table;
      2. by DOC — per-doc argmax (score DESC, token ASC tie-break).

    tf itself is exact after one map_batches: a document is one row, so
    its term counts never split across batches. Docs with no tokens emit
    nothing (inner semantics, mirrored by the oracle)."""
    from ..io_utils import parquet_column_bytes, parquet_num_rows
    from ..stages.aggregates import buckets_for, int_bucket_column
    from ..functions.urls import stable_hash64_batch

    n_docs = parquet_num_rows(f"{sf_dir}/documents.parquet")
    tok_bound = parquet_column_bytes(f"{sf_dir}/documents.parquet",
                                     "text") // 2
    nb_tok = buckets_for(tok_bound)
    nb_doc = buckets_for(n_docs)
    ds = _docs(ray, sf_dir, ["doc_id", "text"])

    def tf_rows(batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids = batch.column("doc_id").to_pylist()
        out_id, out_tok, out_tf = [], [], []
        for i, t in zip(ids, batch.column("text").to_pylist()):
            c = Counter(tokenize(t))
            c.pop("", None)
            out_id.extend([i] * len(c))
            out_tok.extend(c.keys())
            out_tf.extend(c.values())
        tb = (stable_hash64_batch(out_tok) % nb_tok).astype(np.int64)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "token": pa.array(out_tok, pa.string()),
                         "tf": pa.array(out_tf, pa.int64()),
                         "tbucket": pa.array(tb, pa.int64())})

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "token": pd.Series([], dtype=str),
                                 "score": pd.Series([], dtype="int64")})
        df_tok = g.groupby("token")["doc_id"].transform("size").to_numpy()
        score = (g["tf"].to_numpy() * n_docs) // df_tok
        return pd.DataFrame({"doc_id": g["doc_id"].astype("int64"),
                             "token": g["token"],
                             "score": score.astype("int64")})

    scored = (ds.map_batches(tf_rows, batch_format="pyarrow")
                .groupby("tbucket")
                .map_groups(score_bucket, batch_format="pandas"))

    def add_dbucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "token": pa.array([], pa.string()),
                             "score": pa.array([], pa.int64()),
                             "dbucket": pa.array([], pa.int64())})
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        b = int_bucket_column(d, nb_doc)
        return t.append_column("dbucket", pa.array(b, pa.int64()))

    def top1(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "token": pd.Series([], dtype=str),
                                 "score": pd.Series([], dtype="int64")})
        g = g.sort_values(["doc_id", "score", "token"],
                          ascending=[True, False, True], kind="mergesort")
        top = g.groupby("doc_id", as_index=False).head(1)
        return pd.DataFrame({"doc_id": top["doc_id"].astype("int64"),
                             "token": top["token"],
                             "score": top["score"].astype("int64")})

    return (scored.map_batches(add_dbucket, batch_format="pyarrow")
                  .groupby("dbucket")
                  .map_groups(top1, batch_format="pandas")
                  .sort("doc_id"))


DOC_TFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(str_split_regex({SQL_TRIM_TEXT}, '{SQL_WS_CLASS}+')) AS token
  FROM documents),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks WHERE token != ''
  GROUP BY doc_id, token),
df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token,
         CAST(tf.tf * n.n_docs // df.df AS BIGINT) AS score
  FROM tf JOIN df USING (token) CROSS JOIN n)
SELECT doc_id, token, score FROM (
  SELECT doc_id, token, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, token) AS r
  FROM scored)
WHERE r = 1 ORDER BY doc_id
"""


# --- sequence packing (token-budget corpus packing) --------------------------
SEQ_LEN_TOKENS = 4096


def docs_pack_sequences(ray, sf_dir: str):
    """(doc_id, n_tokens, seq_id): greedy sequential packing of documents
    into fixed 4096-token training sequences — seq_id = (EXCLUSIVE prefix
    sum of n_tokens in doc_id order) // 4096, i.e. each doc starts in the
    sequence its running token offset falls into. The prefix sum is
    DISTRIBUTED via the crawl budget-cut idiom (crawl.py ST6): sort by
    doc_id, one O(blocks) block-summary pass, a driver-side exclusive
    scan over the tiny summary (one row PER BLOCK, never per doc), then
    a second pass adds each block's offset to its local cumsum."""
    ds = _docs(ray, sf_dir, ["doc_id", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = np.fromiter((len(tokenize(t)) for t in texts),
                        dtype=np.int64, count=len(texts))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_tokens": pa.array(n, pa.int64())})

    return pack_sequences_over(
        ds.map_batches(counts, batch_format="pyarrow"))


def pack_sequences_over(ds_counts):
    """The distributed exclusive-prefix-sum packer over ANY dataset
    carrying (doc_id, n_tokens, ...extra columns): sort by doc_id,
    one O(blocks) block-summary pass, a driver-side exclusive scan
    over the tiny summary (one row PER BLOCK, never per doc), then a
    second pass adds each block's offset to its local cumsum and
    appends seq_id — extra columns ride through untouched. Shared by
    docs_pack_sequences and corpus_curation."""
    from ..stages.aggregates import block_prefix_bases, first_key

    sorted_ds = ds_counts.sort("doc_id").materialize()
    bases = block_prefix_bases(
        sorted_ds, ["doc_id"], ascending=True,
        weight=lambda t: int(t.column("n_tokens").to_numpy(
            zero_copy_only=False).sum()))

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("seq_id", pa.array([], pa.int64()))
        base = bases[first_key(batch, ["doc_id"])]
        n = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        excl = base + np.cumsum(n) - n
        return batch.append_column(
            "seq_id", pa.array(excl // SEQ_LEN_TOKENS, pa.int64()))

    return (sorted_ds.map_batches(assign, batch_size=None,
                                  batch_format="pyarrow")
                     .sort("doc_id"))


DOCS_PACK_SQL = f"""
WITH c AS (
  SELECT doc_id,
         CASE WHEN {SQL_TRIM_TEXT} = '' THEN 0
              ELSE CAST(len(regexp_split_to_array({SQL_TRIM_TEXT},
                  '{SQL_WS_CLASS}+')) AS BIGINT)
         END AS n_tokens
  FROM documents)
SELECT doc_id, n_tokens,
       CAST((SUM(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - n_tokens) // {SEQ_LEN_TOKENS} AS BIGINT) AS seq_id
FROM c ORDER BY doc_id
"""


# --- compression-ratio quality signal ----------------------------------------
def doc_compression_ratio(ray, sf_dir: str):
    """(doc_id, n_raw, n_comp, ratio_pct): zlib-compressibility quality
    signal — highly repetitive / boilerplate text compresses far better
    than natural prose, so a LOW ratio_pct flags template spam and a
    ~100+ ratio flags high-entropy noise (the classic training-data
    gate alongside docs_quality_filter). ratio_pct is integer
    (n_comp * 100 // n_raw) for determinism. Pure streaming
    map_batches — per-doc zlib at a fixed level, no shuffle. Rows-only
    (no SQL oracle: DuckDB cannot run zlib); invariant-tested instead."""
    import zlib

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_raw = np.empty(len(texts), dtype=np.int64)
        n_comp = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            b = t.encode("utf-8")
            n_raw[i] = len(b)
            n_comp[i] = len(zlib.compress(b, 6))
        ratio = np.where(n_raw > 0, n_comp * 100 // np.maximum(n_raw, 1),
                         np.int64(0))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_raw": pa.array(n_raw, pa.int64()),
                         "n_comp": pa.array(n_comp, pa.int64()),
                         "ratio_pct": pa.array(ratio, pa.int64())})

    return _docs(ray, sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow").sort("doc_id")


# --- per-source language mix (composed: scoring stage -> aggregate) ---------
class LangIdMixStage(LangIdStage):
    """LangIdStage variant that carries the source column and reduces
    each batch to (source, lang_pred, n_docs) partials — the composed
    model-score-then-aggregate pipeline."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        scored = super().__call__(
            pa.table({"doc_id": batch.column("doc_id"),
                      "text": batch.column("text")}))
        df = pd.DataFrame({
            "source": batch.column("source").to_pylist(),
            "lang_pred": scored.column("lang_pred").to_pylist()})
        g = (df.groupby(["source", "lang_pred"], as_index=False)
               .size().rename(columns={"size": "n_docs"}))
        return pa.table({"source": pa.array(g["source"], pa.string()),
                         "lang_pred": pa.array(g["lang_pred"], pa.string()),
                         "n_docs": pa.array(g["n_docs"].astype("int64"),
                                            pa.int64())})


def docs_langid_mix(ray, sf_dir: str, concurrency: int = 2):
    """(source, lang_pred, n_docs): corpus language mix per source —
    the actor-pool language scorer (stopword tables built once per
    actor) CHAINED into a per-batch combiner and a tiny
    (sources x langs)-group merge; the exchange moves partial counts,
    never documents."""
    from ray.data.aggregate import Sum

    ds = _docs(ray, sf_dir, ["doc_id", "text", "source"])
    return (ds.map_batches(LangIdMixStage, batch_format="pyarrow",
                           batch_size=1024, concurrency=concurrency)
              .groupby(["source", "lang_pred"])
              .aggregate(Sum("n_docs", alias_name="n_docs"))
              .sort(["source", "lang_pred"]))


# --- end-to-end corpus curation (the composed flagship text pipeline) --------
CURATION_CAP = 20


def curation_over(ray, ds, n_docs: int):
    """The END-TO-END curation core over ANY (doc_id, source, text)
    dataset — the documents table (corpus_curation) or the live crawl's
    extracted corpus (registry.crawl_curation): same gates, same
    exchanges, one implementation.

    Stages, composed as ONE streaming Dataset pipeline:

      1. QUALITY FILTER — integer-exact gates (min tokens, alpha floor,
         digit ceiling), a pure map_batches filter that also computes
         the content fingerprint in the same pass over the text;
      2. EXACT DEDUP, keep-first — fp-bucketed exchange of the (id,
         source, n_tokens, fp) survivors only (text never shuffles),
         min-doc_id row wins per fingerprint;
      3. PER-SOURCE CAP — anti-domination: <= CURATION_CAP docs per
         source by md5-of-id priority, with a local per-batch head-k
         combiner pruning before the exchange;
      4. SEQUENCE PACKING — greedy 4096-token packing via the shared
         distributed exclusive prefix sum (pack_sequences_over).

    Every stage's exchange is bounded by survivors (ids + small
    columns); the documents themselves stream through stage 1 once."""
    from ..stages.aggregates import buckets_for, hash_bucket_aggregate
    from ..functions.urls import stable_hash64_batch

    def _empty():
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "source": pd.Series([], dtype=str),
                             "n_tokens": pd.Series([], dtype="int64"),
                             "fp": pd.Series([], dtype=str)})

    def stage1(b: pd.DataFrame) -> pd.DataFrame:
        s = b["text"]
        n_chars = s.str.len().astype("int64")
        n_alpha = s.str.count(r"[A-Za-z]").astype("int64")
        n_digit = s.str.count(r"[0-9]").astype("int64")
        n_tokens = s.map(lambda t: len(tokenize(t))).astype("int64")
        keep = ((n_tokens >= 30)
                & (n_alpha * 1000 >= n_chars * 810)
                & (n_digit * 10 <= n_chars * 2))
        if not keep.any():
            return _empty()
        kept = b[keep]
        fps = [hashlib.md5(t.strip(WS_CHARS).lower().encode("utf-8"))
               .hexdigest() for t in kept["text"]]
        return pd.DataFrame({"doc_id": kept["doc_id"].astype("int64"),
                             "source": kept["source"],
                             "n_tokens": n_tokens[keep],
                             "fp": fps})

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["fp", "doc_id"], kind="mergesort")
        return df.groupby("fp", as_index=False).head(1)

    deduped = hash_bucket_aggregate(
        ds.map_batches(stage1, batch_format="pandas"),
        ["fp"], keep_first, n_rows=n_docs)

    nb = buckets_for(n_docs)

    def cap_prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "source": pa.array([], pa.string()),
                             "n_tokens": pa.array([], pa.int64()),
                             "pri": pa.array([], pa.string()),
                             "sbucket": pa.array([], pa.int64())})
        df = t.select(["doc_id", "source", "n_tokens"]).to_pandas()
        df["pri"] = _md5_priorities(df["doc_id"].tolist())
        df = df.sort_values(["source", "pri", "doc_id"], kind="mergesort")
        df = df.groupby("source").head(CURATION_CAP)
        b = (stable_hash64_batch(df["source"].tolist()) % nb).astype(
            np.int64)
        return pa.table({"doc_id": pa.array(df["doc_id"], pa.int64()),
                         "source": pa.array(df["source"], pa.string()),
                         "n_tokens": pa.array(df["n_tokens"], pa.int64()),
                         "pri": pa.array(df["pri"], pa.string()),
                         "sbucket": pa.array(b, pa.int64())})

    def cap_final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "pri", "doc_id"], kind="mergesort")
        top = g.groupby("source").head(CURATION_CAP)
        return pd.DataFrame({"doc_id": top["doc_id"].astype("int64"),
                             "source": top["source"],
                             "n_tokens": top["n_tokens"].astype("int64")})

    capped = (deduped.map_batches(cap_prune, batch_format="pyarrow")
                     .groupby("sbucket")
                     .map_groups(cap_final, batch_format="pandas"))
    return pack_sequences_over(capped)


def corpus_curation(ray, sf_dir: str):
    """(doc_id, source, n_tokens, seq_id): curation_over applied to the
    documents table (the SQL-checked instantiation)."""
    from ..io_utils import parquet_num_rows

    n_docs = parquet_num_rows(f"{sf_dir}/documents.parquet")
    return curation_over(ray, _docs(ray, sf_dir, ["doc_id", "source", "text"]),
                         n_docs)


CORPUS_CURATION_SQL = f"""
WITH q AS (
  SELECT doc_id, source,
         CASE WHEN {SQL_TRIM_TEXT} = '' THEN 0
              ELSE CAST(len(regexp_split_to_array({SQL_TRIM_TEXT},
                   '{SQL_WS_CLASS}+')) AS BIGINT)
         END AS n_tokens,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
         CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
         md5(LOWER({SQL_TRIM_TEXT})) AS fp
  FROM documents),
f AS (
  SELECT doc_id, source, n_tokens, fp FROM q
  WHERE n_tokens >= 30 AND n_alpha * 1000 >= n_chars * 810
    AND n_digit * 10 <= n_chars * 2),
d AS (
  SELECT doc_id, source, n_tokens FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM f) WHERE rn = 1),
c AS (
  SELECT doc_id, source, n_tokens FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY source
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
    FROM d) WHERE rk <= {CURATION_CAP})
SELECT doc_id, source, n_tokens,
       CAST((SUM(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - n_tokens) // {SEQ_LEN_TOKENS} AS BIGINT) AS seq_id
FROM c ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# PII scrubbing: the redaction pass every published web-corpus pipeline
# runs before training (emails / phone numbers / IP addresses -> typed
# placeholder tokens). RE2-safe patterns shared VERBATIM with the DuckDB
# oracle (both engines are RE2-backed, so replacement semantics match).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE_RE = r"\b555-[0-9]{4}\b"


def _pii_augment(ids: pd.Series, texts: pd.Series) -> pd.Series:
    """Deterministic synthetic PII derived from doc_id, appended to the
    text. The test corpus carries no digits at all, so without this the
    scrubber would be a no-op and the oracle check vacuous; BOTH engines
    run the same construction (same SQL expression), so the redaction
    regexes are genuinely exercised row-by-row."""
    s = ids.astype(str)
    return (texts + " mail user" + s + "@mail-" + (ids % 7).astype(str)
            + ".example ip 10." + (ids % 256).astype(str) + "."
            + (ids % 100).astype(str) + "." + (ids % 250).astype(str)
            + " call 555-" + (ids % 10000).astype(str).str.zfill(4)
            + " end")


def docs_pii_scrub(ray, sf_dir: str):
    """(doc_id, n_pii, scrubbed): count then redact emails -> <EMAIL>,
    IPv4s -> <IP>, phone numbers -> <PHONE>. Scale shape: pure
    streaming — one pruned column read, vectorized RE2 kernels
    (pyarrow.compute count/replace_substring_regex, no Python regex
    loop over rows), no shuffle at all except the oracle's ORDER BY."""
    import pyarrow.compute as pc

    def scrub(batch: pa.Table) -> pa.Table:
        ids = pd.Series(batch.column("doc_id").to_numpy())
        texts = pd.Series(batch.column("text").to_pylist())
        out = pa.array(_pii_augment(ids, texts), pa.string())
        # count each class on the text AS THE REPLACER SEES IT (after
        # the previous class's redaction) so n_pii == redactions
        # actually performed — counting all three on the raw text
        # double-counts overlaps (an IP embedded in an email domain)
        n = None
        for pat, tag in ((PII_EMAIL_RE, "<EMAIL>"), (PII_IP_RE, "<IP>"),
                         (PII_PHONE_RE, "<PHONE>")):
            c = pc.count_substring_regex(out, pat)
            n = c if n is None else pc.add(n, c)
            out = pc.replace_substring_regex(out, pat, tag)
        return pa.table({"doc_id": batch.column("doc_id").cast(pa.int64()),
                         "n_pii": n.cast(pa.int64()),
                         "scrubbed": out})

    return _docs(ray, sf_dir, ["doc_id", "text"]).map_batches(
        scrub, batch_format="pyarrow").sort("doc_id")


_PII_AUG_SQL = (
    "text || ' mail user' || CAST(doc_id AS VARCHAR) || '@mail-' || "
    "CAST(doc_id % 7 AS VARCHAR) || '.example ip 10.' || "
    "CAST(doc_id % 256 AS VARCHAR) || '.' || "
    "CAST(doc_id % 100 AS VARCHAR) || '.' || "
    "CAST(doc_id % 250 AS VARCHAR) || ' call 555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' end'"
)

DOCS_PII_SCRUB_SQL = f"""
WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS t2 FROM documents),
s1 AS (SELECT doc_id,
              len(regexp_extract_all(t2, '{PII_EMAIL_RE}')) AS n1,
              regexp_replace(t2, '{PII_EMAIL_RE}', '<EMAIL>', 'g') AS t3
       FROM aug),
s2 AS (SELECT doc_id, n1,
              len(regexp_extract_all(t3, '{PII_IP_RE}')) AS n2,
              regexp_replace(t3, '{PII_IP_RE}', '<IP>', 'g') AS t4
       FROM s1)
SELECT doc_id,
       CAST(n1 + n2 + len(regexp_extract_all(t4, '{PII_PHONE_RE}'))
            AS BIGINT) AS n_pii,
       regexp_replace(t4, '{PII_PHONE_RE}', '<PHONE>', 'g') AS scrubbed
FROM s2 ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
SHUFFLE_SEED = 42


def docs_shuffle_seeded(ray, sf_dir: str, seed: int = SHUFFLE_SEED):
    """(pos, doc_id): DETERMINISTIC global training-data shuffle — every
    epoch of LLM training needs the corpus in a reproducible pseudo-
    random order, which ``random_shuffle()`` can't give (nondeterministic
    across runs/cluster shapes). Order = md5(seed:doc_id) hash priority;
    position = global rank. Scale shape: ONE all-to-all sort by the
    hash (that IS the shuffle — unavoidable data movement), then the
    O(blocks) block-offset prefix scan assigns positions; the driver
    holds one row per block, never per doc."""
    ds = _docs(ray, sf_dir, ["doc_id"])

    def add_pri(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        pri = [hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
               for i in ids]
        return pa.table({"doc_id": batch.column("doc_id").cast(pa.int64()),
                         "pri": pa.array(pri, pa.string())})

    sorted_ds = (ds.map_batches(add_pri, batch_format="pyarrow")
                   .sort(["pri", "doc_id"]).materialize())

    from ..stages.aggregates import block_prefix_bases, first_key

    bases = block_prefix_bases(sorted_ds, ["pri", "doc_id"],
                               ascending=True)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"pos": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        base = bases[first_key(batch, ["pri", "doc_id"])]
        pos = base + np.arange(batch.num_rows, dtype=np.int64) + 1
        return pa.table({"pos": pa.array(pos, pa.int64()),
                         "doc_id": batch.column("doc_id").cast(pa.int64())})

    return (sorted_ds.map_batches(assign, batch_size=None,
                                  batch_format="pyarrow")
                     .sort("pos"))


DOCS_SHUFFLE_SQL = f"""
SELECT ROW_NUMBER() OVER (
           ORDER BY md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)),
                    doc_id) AS pos,
       doc_id
FROM documents ORDER BY pos
"""


# ---------------------------------------------------------------------------
def docs_repetition(ray, sf_dir: str):
    """(doc_id, n_bigrams, top_bigram_n): within-document repetition
    signal — the Gopher-rules quality filter drops docs whose most
    frequent n-gram covers too much of the text (Rae et al. 2021 §A1.1;
    public rule, integerized so the DuckDB oracle hashes bit-for-bit:
    the consumer computes top_bigram_n / n_bigrams itself). Scale
    shape: embarrassingly parallel map_batches over a pruned read, one
    Counter per doc (docs are independent — no shuffle)."""
    from collections import Counter

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        tot = np.zeros(len(texts), dtype=np.int64)
        top = np.zeros(len(texts), dtype=np.int64)
        for j, t in enumerate(texts):
            tk = tokenize(t)
            if len(tk) < 2:
                continue
            c = Counter(zip(tk, tk[1:]))
            tot[j] = len(tk) - 1
            top[j] = max(c.values())
        return pa.table({"doc_id": batch.column("doc_id").cast(pa.int64()),
                         "n_bigrams": pa.array(tot, pa.int64()),
                         "top_bigram_n": pa.array(top, pa.int64())})

    return _docs(ray, sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow").sort("doc_id")


DOCS_REPETITION_SQL = f"""
WITH toks AS (
  SELECT doc_id, str_split_regex({SQL_TRIM_TEXT}, '{SQL_WS_CLASS}+') AS tk
  FROM documents),
pos AS (
  SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
  FROM toks WHERE len(tk) >= 2),
c AS (
  SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS gram,
         COUNT(*) AS cnt
  FROM pos GROUP BY doc_id, gram)
SELECT d.doc_id,
       CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(s.top_bigram_n, 0) AS BIGINT) AS top_bigram_n
FROM documents d LEFT JOIN (
  SELECT doc_id, SUM(cnt) AS n_bigrams, MAX(cnt) AS top_bigram_n
  FROM c GROUP BY doc_id) s USING (doc_id)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
def docs_inverted_index(ray, sf_dir: str):
    """(token, df, postings): the INVERTED INDEX build — token ->
    ordered posting list (comma-joined doc_ids) + document frequency,
    the retrieval-side structure a corpus pipeline materializes for
    contamination lookups / BM25. Scale shape: per-batch per-doc
    DISTINCT explode (a doc contributes each token once, the combiner),
    ONE exchange on a token-hash coarse bucket sized from the token-byte
    bound, then a vectorized sort + groupby-join per bucket; no driver
    state, postings build where the bucket lives."""
    from ..functions.urls import stable_hash64_batch
    from ..io_utils import parquet_column_bytes
    from ..stages.aggregates import buckets_for

    pair_bound = parquet_column_bytes(
        f"{sf_dir}/documents.parquet", "text") // 2
    n_buckets = buckets_for(pair_bound)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        toks, docs = [], []
        for i, t in zip(ids, batch.column("text").to_pylist()):
            for tok in set(tokenize(t)):
                toks.append(tok)
                docs.append(i)
        b = (stable_hash64_batch(toks) % np.uint64(n_buckets)
             ).astype(np.int64) if toks else np.array([], dtype=np.int64)
        return pa.table({"token": pa.array(toks, pa.string()),
                         "doc_id": pa.array(docs, pa.int64()),
                         "tbucket": pa.array(b, pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["token", "doc_id"], kind="mergesort")
        out = g.groupby("token", as_index=False).agg(
            df=("doc_id", "size"),
            postings=("doc_id", lambda s: ",".join(s.astype(str))))
        out["df"] = out["df"].astype("int64")
        return out

    ds = _docs(ray, sf_dir, ["doc_id", "text"])
    return (ds.map_batches(explode, batch_format="pyarrow")
              .groupby("tbucket").map_groups(per_bucket,
                                             batch_format="pandas")
              .sort("token"))


DOCS_INVERTED_INDEX_SQL = f"""
WITH t AS (
  SELECT DISTINCT doc_id,
         unnest(str_split_regex({SQL_TRIM_TEXT}, '{SQL_WS_CLASS}+'))
             AS token
  FROM documents)
SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
           AS postings
FROM t WHERE token != ''
GROUP BY token ORDER BY token
"""


# ---------------------------------------------------------------------------
def docs_lm_score(ray, sf_dir: str):
    """(doc_id, commonness): unigram-LM document score — for each doc,
    sum over its token INSTANCES of the corpus-wide frequency of that
    token (the integerized analogue of a CCNet-style LM quality score:
    high = stock phrasing, low = rare vocabulary; integer so the oracle
    hashes exactly). Scale shape: the vocabulary table is built by the
    wordcount combiner (never driver-held), per-doc tf partials explode
    once, ONE distributed hash join tf x vocab on the token key, then a
    per-doc re-aggregate — explode -> join -> regroup, the canonical
    enrich-by-dimension pattern where BOTH sides are corpus-derived."""
    from collections import Counter

    from ..io_utils import parquet_column_bytes, parquet_num_rows
    from ..stages.aggregates import (
        hash_bucket_aggregate,
        join_partitions_for,
    )

    tok_bound = parquet_column_bytes(
        f"{sf_dir}/documents.parquet", "text") // 2
    n_docs = parquet_num_rows(f"{sf_dir}/documents.parquet")
    ds = _docs(ray, sf_dir, ["doc_id", "text"])

    if tok_bound * 16 <= 64 << 20:
        # vocab fits the broadcast budget: fold per-batch Counter
        # partials on the driver, broadcast ONE token -> n dict, score
        # in a single corpus pass — no explode materialize, no shuffle,
        # no join. The exchange chain below is the 100-TB route.
        def v_partial(batch: pa.Table) -> pa.Table:
            c = Counter()
            for t in batch.column("text").to_pylist():
                c.update(tokenize(t))
            return pa.table({"token": pa.array(list(c), pa.string()),
                             "n": pa.array(list(c.values()), pa.int64())})

        parts = (ds.map_batches(v_partial, batch_format="pyarrow")
                   .to_pandas())
        vb = parts.groupby("token", as_index=False)["n"].sum()
        ref = ray.put(dict(zip(vb["token"], vb["n"].tolist())))

        def score_docs(batch: pa.Table) -> pa.Table:
            lk = ray.get(ref)
            ids, vals = [], []
            for i, t in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
                s = 0
                for tok, cnt in Counter(tokenize(t)).items():
                    s += cnt * lk[tok]
                ids.append(i)
                vals.append(s)
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "commonness": pa.array(vals, pa.int64())})

        return (ds.map_batches(score_docs, batch_format="pyarrow")
                  .sort("doc_id"))

    def tf_explode(batch: pa.Table) -> pa.Table:
        ids_out, toks, tfs = [], [], []
        for i, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            c = Counter(tokenize(t))
            if not c:
                # a doc whose text tokenizes to NOTHING rides the same
                # join as everyone else under the sentinel token "" —
                # the empty string can never be a real token (tokenize
                # only emits non-empty splits), its vocab count is 0,
                # and tf*n = 0 gives the doc its score-0 row with no
                # separate anti-join + union-back pass
                ids_out.append(i)
                toks.append("")
                tfs.append(0)
                continue
            for tok, cnt in c.items():
                ids_out.append(i)
                toks.append(tok)
                tfs.append(cnt)
        return pa.table({"doc_id": pa.array(ids_out, pa.int64()),
                         "token": pa.array(toks, pa.string()),
                         "tf": pa.array(tfs, pa.int64())})

    tf = ds.map_batches(tf_explode, batch_format="pyarrow").materialize()

    vocab = hash_bucket_aggregate(
        tf.map_batches(lambda t: t.select(["token", "tf"])
                       .rename_columns(["token", "n"]),
                       batch_format="pyarrow"),
        ["token"],
        lambda df: df.groupby("token", as_index=False).agg(n=("n", "sum")),
        n_rows=tok_bound).materialize()

    # the vocabulary (one row per DISTINCT token) is the join's small
    # side — size partitions from its real count, not the instance bound
    joined = tf.join(vocab, join_type="inner", on=("token",),
                     num_partitions=join_partitions_for(
                         min(tok_bound, vocab.count())))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "commonness": (b["tf"] * b["n"]).astype("int64")})
        return g.groupby("doc_id", as_index=False).sum()

    scores = hash_bucket_aggregate(
        joined.map_batches(partial, batch_format="pandas",
                           batch_size=65536),
        ["doc_id"],
        lambda df: df.groupby("doc_id", as_index=False).sum(),
        n_rows=n_docs)
    return scores.sort("doc_id")


DOCS_LM_SCORE_SQL = f"""
WITH t AS (
  SELECT doc_id,
         unnest(str_split_regex({SQL_TRIM_TEXT}, '{SQL_WS_CLASS}+'))
             AS token
  FROM documents),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM t
  WHERE token != '' GROUP BY doc_id, token),
vocab AS (
  SELECT token, COUNT(*) AS n FROM t WHERE token != '' GROUP BY token)
SELECT d.doc_id,
       CAST(COALESCE(SUM(tf.tf * v.n), 0) AS BIGINT) AS commonness
FROM documents d
LEFT JOIN tf ON d.doc_id = tf.doc_id
LEFT JOIN vocab v ON tf.token = v.token
GROUP BY d.doc_id ORDER BY d.doc_id
"""


def docs_dsir_weights(ray, sf_dir: str, target_lang: str = "en"):
    """(doc_id, dsir_score_e3): DSIR-style importance weights for data
    selection (Xie et al., NeurIPS'23, "Data Selection for Language
    Models via Importance Resampling") — per doc, the sum over its
    token instances of the add-one-smoothed target-vs-corpus frequency
    ratio ``1000 * (n_target + 1) // (n_corpus + 1)``, where n_target
    counts instances inside the target slice (lang == target_lang) and
    n_corpus across the whole corpus. The published method uses
    hashed-n-gram log-ratios; the integer ratio-sum keeps the score
    deterministic and bit-exact vs the DuckDB oracle. High = looks like
    the target distribution; feed the weights to docs_weighted_sample
    for the resampling step.

    Scale shape (same duality as docs_lm_score): under the broadcast
    budget, one Counter-partials pass folds BOTH count tables on the
    driver and one scoring pass consumes the broadcast token -> ratio
    dict; past it, tf explodes once (with the "" sentinel for
    zero-token docs), the (token, n_t, n_c) table is built by the
    bucketed combiner, and ONE distributed join + per-doc regroup
    scores the corpus."""
    from collections import Counter

    from ..io_utils import parquet_column_bytes, parquet_num_rows
    from ..stages.aggregates import (hash_bucket_aggregate,
                                     join_partitions_for)

    tok_bound = parquet_column_bytes(
        f"{sf_dir}/documents.parquet", "text") // 2
    n_docs = parquet_num_rows(f"{sf_dir}/documents.parquet")
    ds = _docs(ray, sf_dir, ["doc_id", "text", "lang"])

    if tok_bound * 16 <= 64 << 20:
        def v_partial(batch: pa.Table) -> pa.Table:
            ct: Counter = Counter()
            ca: Counter = Counter()
            for t, lg in zip(batch.column("text").to_pylist(),
                             batch.column("lang").to_pylist()):
                toks = tokenize(t)
                ca.update(toks)
                if lg == target_lang:
                    ct.update(toks)
            toks_ = list(ca)
            return pa.table({
                "token": pa.array(toks_, pa.string()),
                "n_t": pa.array([ct.get(k, 0) for k in toks_],
                                pa.int64()),
                "n_c": pa.array([ca[k] for k in toks_], pa.int64())})

        parts = (ds.map_batches(v_partial, batch_format="pyarrow")
                   .to_pandas())
        tot = parts.groupby("token", as_index=False)[["n_t", "n_c"]].sum()
        ratio = ((1000 * (tot["n_t"].to_numpy() + 1))
                 // (tot["n_c"].to_numpy() + 1))
        ref = ray.put(dict(zip(tot["token"], ratio.tolist())))

        def score_docs(batch: pa.Table) -> pa.Table:
            lk = ray.get(ref)
            ids, vals = [], []
            for i, t in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
                s = 0
                for tok, cnt in Counter(tokenize(t)).items():
                    s += cnt * lk[tok]
                ids.append(i)
                vals.append(s)
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "dsir_score_e3": pa.array(vals, pa.int64())})

        return (ds.map_batches(score_docs, batch_format="pyarrow")
                  .sort("doc_id"))

    # exchange route: tf explode (with "" sentinel keeping zero-token
    # docs alive through the join), bucketed (token, n_t, n_c) counts,
    # one distributed join, per-doc regroup
    def tf_explode(batch: pa.Table) -> pa.Table:
        ids_out, toks_out, tfs = [], [], []
        for i, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            c = Counter(tokenize(t))
            if not c:
                ids_out.append(i)
                toks_out.append("")
                tfs.append(0)
                continue
            for tok, cnt in c.items():
                ids_out.append(i)
                toks_out.append(tok)
                tfs.append(cnt)
        return pa.table({"doc_id": pa.array(ids_out, pa.int64()),
                         "token": pa.array(toks_out, pa.string()),
                         "tf": pa.array(tfs, pa.int64())})

    tf = ds.map_batches(tf_explode, batch_format="pyarrow").materialize()

    def cnt_partial(batch: pa.Table) -> pa.Table:
        ct: Counter = Counter()
        ca: Counter = Counter()
        for t, lg in zip(batch.column("text").to_pylist(),
                         batch.column("lang").to_pylist()):
            toks = tokenize(t)
            if not toks:
                ca[""] += 0
            ca.update(toks)
            if lg == target_lang:
                ct.update(toks)
        toks_ = list(ca)
        return pa.table({
            "token": pa.array(toks_, pa.string()),
            "n_t": pa.array([ct.get(k, 0) for k in toks_], pa.int64()),
            "n_c": pa.array([ca[k] for k in toks_], pa.int64())})

    counts = hash_bucket_aggregate(
        ds.map_batches(cnt_partial, batch_format="pyarrow"),
        ["token"],
        lambda df: df.groupby("token", as_index=False)[
            ["n_t", "n_c"]].sum(),
        n_rows=tok_bound).materialize()

    joined = tf.join(counts, join_type="inner", on=("token",),
                     num_partitions=join_partitions_for(
                         max(1, min(tok_bound, counts.count()))))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        r = ((1000 * (b["n_t"].to_numpy() + 1))
             // (b["n_c"].to_numpy() + 1))
        g = pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "dsir_score_e3": (b["tf"].to_numpy() * r).astype("int64")})
        return g.groupby("doc_id", as_index=False).sum()

    return hash_bucket_aggregate(
        joined.map_batches(partial, batch_format="pandas",
                           batch_size=65536),
        ["doc_id"],
        lambda df: df.groupby("doc_id", as_index=False).sum(),
        n_rows=n_docs).sort("doc_id")


_DSIR_CTES = f"""
WITH t AS (
  SELECT doc_id,
         unnest(str_split_regex({SQL_TRIM_TEXT}, '{SQL_WS_CLASS}+'))
             AS token
  FROM documents),
tok2 AS (SELECT doc_id, token FROM t WHERE token != ''),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok2 GROUP BY 1, 2),
ca AS (SELECT token, COUNT(*) AS n_c FROM tok2 GROUP BY 1),
ct AS (SELECT token, COUNT(*) AS n_t
       FROM tok2 JOIN documents USING (doc_id)
       WHERE lang = 'en' GROUP BY 1),
sc AS (SELECT tf.doc_id,
              SUM(tf.tf * ((1000 * (COALESCE(ct.n_t, 0) + 1))
                           // (ca.n_c + 1))) AS s
       FROM tf JOIN ca USING (token) LEFT JOIN ct USING (token)
       GROUP BY tf.doc_id)"""

DOCS_DSIR_SQL = _DSIR_CTES + """
SELECT d.doc_id, CAST(COALESCE(sc.s, 0) AS BIGINT) AS dsir_score_e3
FROM documents d LEFT JOIN sc USING (doc_id)
ORDER BY d.doc_id
"""

DSIR_SAMPLE_K = 100

DOCS_DSIR_RESAMPLE_SQL = _DSIR_CTES + f""",
w AS (SELECT d.doc_id, CAST(COALESCE(sc.s, 0) AS BIGINT)
          AS dsir_score_e3
      FROM documents d LEFT JOIN sc USING (doc_id))
SELECT doc_id, dsir_score_e3 FROM (
  SELECT doc_id, dsir_score_e3 FROM w
  WHERE dsir_score_e3 > 0
  ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
           / CAST(dsir_score_e3 AS DOUBLE),
           doc_id
  LIMIT {DSIR_SAMPLE_K})
ORDER BY doc_id
"""


def docs_dsir_resample(ray, sf_dir: str, k: int = DSIR_SAMPLE_K):
    """(doc_id, dsir_score_e3): the RESAMPLING half of DSIR — an
    exact-k weighted sample without replacement over the importance
    weights, by the same log-free Efraimidis-Spirakis priority rule as
    ``docs_weighted_sample`` (key = 52-bit md5 prefix / weight, keep
    the k smallest; one IEEE division both engines compute
    identically). Composes the two halves into the published
    select-then-sample loop: weights stream out of
    ``docs_dsir_weights``, each batch keeps a LOCAL bottom-k, and only
    the O(blocks x k) survivors meet in the global sort+limit."""
    w = docs_dsir_weights(ray, sf_dir)

    def local_bottomk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        wt = batch.column("dsir_score_e3").to_numpy(
            zero_copy_only=False)
        h = np.array([int(p[:13], 16)
                      for p in _md5_priorities(ids)], dtype=np.float64)
        with np.errstate(divide="ignore"):
            key = h / wt.astype(np.float64)
        ok = wt > 0
        order = np.argsort(key, kind="mergesort")
        keep = order[ok[order]][:k]
        t = batch.take(pa.array(keep, pa.int64()))
        return t.append_column(
            "wkey", pa.array(key[keep], pa.float64()))

    out = (w.map_batches(local_bottomk, batch_format="pyarrow")
            .sort(["wkey", "doc_id"]).limit(k)
            .map_batches(lambda t: t.drop_columns(["wkey"]),
                         batch_format="pyarrow"))
    return out.sort("doc_id")


# ---------------------------------------------------------------------------
# target language mix as integer weights (en-heavy, rest uniform) — the
# data-mixing knob of a training run, integerized so both engines land
# on identical quotas with no float rounding
MIX_WEIGHTS = {"en": 4, "es": 1, "de": 1, "fr": 1, "zh": 1}
MIX_WSUM = sum(MIX_WEIGHTS.values())


def docs_mix_rebalance(ray, sf_dir: str):
    """(doc_id, lang): CORPUS MIX REBALANCING — subsample each language
    down to a target mixture (weights MIX_WEIGHTS), the data-mixing
    step of corpus curation (e.g. the Pile / LLaMA per-source mixture
    tables). Exact integer rule shared with the oracle: S = min over
    langs of floor(avail*W/w) (the largest corpus the target mix
    supports), quota(l) = floor(S*w/W), keep each lang's bottom-quota
    by md5 priority. Scale shape: availability is ONE combiner-backed
    groupby (rows = #langs, tiny by definition), quotas broadcast, then
    the per-source-cap exchange: per-batch local bottom-quota prune,
    one bucketed vectorized merge. For corpus-FRACTION quotas at 100 TB
    (quota ~ corpus size, where candidate merge would be wide), swap
    the exact head-k for a hash-threshold rank-select on the md5
    priority (the events_value_percentiles idiom)."""
    from ray.data.aggregate import Sum

    from ..stages.aggregates import buckets_for
    from ..functions.urls import stable_hash64_batch
    from ..io_utils import parquet_num_rows

    ds = _docs(ray, sf_dir, ["doc_id", "lang"])

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"lang": b["lang"],
                          "n": np.ones(len(b), dtype="int64")})
        return g.groupby("lang", as_index=False).sum()

    avail_df = (ds.map_batches(count_partial, batch_format="pandas")
                  .groupby("lang").aggregate(Sum("n", alias_name="n"))
                  .to_pandas())
    avail = dict(zip(avail_df["lang"], avail_df["n"].astype(int)))
    s_max = min((avail.get(l, 0) * MIX_WSUM) // w
                for l, w in MIX_WEIGHTS.items())
    quota = {l: (s_max * w) // MIX_WSUM for l, w in MIX_WEIGHTS.items()}

    n_docs = parquet_num_rows(f"{sf_dir}/documents.parquet")
    n_buckets = buckets_for(n_docs)

    def local_prune(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        df = pd.DataFrame({
            "doc_id": batch.column("doc_id").to_numpy(
                zero_copy_only=False).astype("int64"),
            "lang": batch.column("lang").to_pylist(),
            "pri": _md5_priorities(ids)})
        df = df[df["lang"].isin(MIX_WEIGHTS)]
        df = df.sort_values(["lang", "pri", "doc_id"], kind="mergesort")
        # local prune: a row past its lang's global quota in ITS OWN
        # batch's priority order can never make the global bottom-quota
        df = df[df.groupby("lang").cumcount()
                < df["lang"].map(quota).to_numpy()]
        b = (stable_hash64_batch(df["lang"].tolist())
             % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({"doc_id": pa.array(df["doc_id"], pa.int64()),
                         "lang": pa.array(df["lang"], pa.string()),
                         "pri": pa.array(df["pri"], pa.string()),
                         "lbucket": pa.array(b, pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "pri", "doc_id"], kind="mergesort")
        g = g[g.groupby("lang").cumcount()
              < g["lang"].map(quota).to_numpy()]
        return pd.DataFrame({"doc_id": g["doc_id"].astype("int64"),
                             "lang": g["lang"]})

    return (ds.map_batches(local_prune, batch_format="pyarrow")
              .groupby("lbucket")
              .map_groups(per_bucket, batch_format="pandas")
              .sort("doc_id"))


_MIX_VALUES = ", ".join(f"('{l}', {w})" for l, w in MIX_WEIGHTS.items())

DOCS_MIX_REBALANCE_SQL = f"""
WITH w(lang, wt) AS (VALUES {_MIX_VALUES}),
avail AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
s AS (SELECT MIN((COALESCE(a.n, 0) * {MIX_WSUM}) // w.wt) AS smax
      FROM w LEFT JOIN avail a USING (lang)),
quota AS (SELECT w.lang, ((SELECT smax FROM s) * w.wt) // {MIX_WSUM} AS q
          FROM w),
ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
             PARTITION BY lang
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents WHERE lang IN (SELECT lang FROM w))
SELECT doc_id, lang FROM ranked JOIN quota USING (lang)
WHERE rn <= q ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
WINNOW_PAIR_MIN_SHARED = 2   # pair reported when >= this many shared fps
WINNOW_PAIR_MAX_DF = 50      # MOSS rule: ignore overly-common fingerprints


def docs_winnow_pairs(ray, sf_dir: str, k: int = 5, w: int = 8,
                      min_shared: int = WINNOW_PAIR_MIN_SHARED,
                      max_df: int = WINNOW_PAIR_MAX_DF):
    """(doc_a, doc_b, n_shared): cross-document WINNOWING MATCH — the
    plagiarism/near-copy detector Schleimer'03's fingerprints exist for
    (MOSS): docs sharing >= ``min_shared`` winnow-selected fingerprints.
    Robust to small edits where exact n-gram matching breaks. Scale
    shape: per-doc fingerprints explode once (O(tokens/w) rows per
    doc), ONE exchange on an fp-hash coarse bucket, pair expansion is a
    bucket-local self-merge BOUNDED by the MOSS common-fp cut
    (fingerprints in > ``max_df`` docs are boilerplate and dropped —
    the hot-key guard), then a pair-keyed bucketed count merge."""
    from ..io_utils import parquet_column_bytes, parquet_num_rows
    from ..functions.hashing import kgram_hashes_ordered
    from ..stages.aggregates import buckets_for, hash_bucket_aggregate

    fp_bound = parquet_column_bytes(
        f"{sf_dir}/documents.parquet", "text") // (2 * max(1, w // 2))
    n_buckets = buckets_for(max(1, fp_bound))
    n_docs = parquet_num_rows(f"{sf_dir}/documents.parquet")

    def explode(batch: pa.Table) -> pa.Table:
        ids, fps = [], []
        for i, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            hs = kgram_hashes_ordered(t, k)
            if len(hs) == 0:
                continue
            if len(hs) <= w:
                sel = np.array([hs.min()], dtype=np.uint64)
            else:
                win = np.lib.stride_tricks.sliding_window_view(hs, w)
                sel = np.unique(win.min(axis=1))
            ids.extend([i] * len(sel))
            fps.extend((sel % np.uint64(1 << 63)).astype(np.int64))
        fp_arr = np.asarray(fps, dtype=np.int64)
        b = (fp_arr.astype(np.uint64) % np.uint64(n_buckets)
             ).astype(np.int64) if len(fp_arr) else fp_arr
        return pa.table({"fp": pa.array(fp_arr, pa.int64()),
                         "doc_id": pa.array(ids, pa.int64()),
                         "fbucket": pa.array(b, pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        df_per_fp = g.groupby("fp")["doc_id"].transform("size")
        g = g[(df_per_fp >= 2) & (df_per_fp <= max_df)]
        if len(g) == 0:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "n_shared": pd.Series([], dtype="int64")})
        m = g.merge(g, on="fp")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = (m.groupby(["doc_id_x", "doc_id_y"], as_index=False)
                .size().rename(columns={"doc_id_x": "doc_a",
                                        "doc_id_y": "doc_b",
                                        "size": "n_shared"}))
        out["n_shared"] = out["n_shared"].astype("int64")
        return out

    pair_partials = (_docs(ray, sf_dir, ["doc_id", "text"])
                     .map_batches(explode, batch_format="pyarrow")
                     .groupby("fbucket")
                     .map_groups(per_bucket, batch_format="pandas"))

    # the same pair can match in several fp buckets: one more bucketed
    # count merge keyed on the pair, bounded by doc count x avg degree
    pairs = hash_bucket_aggregate(
        pair_partials, ["doc_a", "doc_b"],
        lambda df: df.groupby(["doc_a", "doc_b"], as_index=False).sum(),
        n_rows=max(1, n_docs * 8))

    def cut(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.greater_equal(t.column("n_shared"),
                                         min_shared))

    return (pairs.map_batches(cut, batch_format="pyarrow")
                 .sort(["doc_a", "doc_b"]))


# ---------------------------------------------------------------------------
# train/val/test thresholds as md5-hex prefixes: byte-lexicographic
# compare is identical in numpy and DuckDB, so the split is portable
# without hex->int parsing. 'cc'/'e6' = 204/230 of 256 ~ 80/10/10.
SPLIT_TRAIN_HI = "cc"
SPLIT_VAL_HI = "e6"


def docs_split(ray, sf_dir: str):
    """(doc_id, split): DETERMINISTIC train/val/test assignment by
    content-independent hash — md5('split:' + doc_id) bucketed ~80/10/10
    by hex-prefix thresholds. The split every training pipeline needs:
    stable under re-runs, re-shards and cluster shape (unlike
    Dataset.split/random sampling), and joinable back to any derived
    table because it is a pure function of the id. Pure streaming
    map_batches — no shuffle, no state."""
    ds = _docs(ray, sf_dir, ["doc_id"])

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        hx = np.array([hashlib.md5(f"split:{i}".encode()).hexdigest()
                       for i in ids])
        split = np.select(
            [hx < SPLIT_TRAIN_HI, hx < SPLIT_VAL_HI],
            ["train", "val"], default="test")
        return pa.table({"doc_id": batch.column("doc_id").cast(pa.int64()),
                         "split": pa.array(split, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow").sort("doc_id")


DOCS_SPLIT_SQL = f"""
SELECT doc_id,
       CASE WHEN h < '{SPLIT_TRAIN_HI}' THEN 'train'
            WHEN h < '{SPLIT_VAL_HI}' THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id,
             md5('split:' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
def docs_csv_roundtrip(ray, sf_dir: str):
    """(doc_id, lang, source, n_chars) exported through the gzipped-CSV
    byte sink (sinks/csvsink.py) and re-ingested with ray.data.read_csv —
    the third byte format (after WARC and JSONL), VALUE-CHECKED against
    the documents table itself: ints and strings must survive the
    encode/decode byte path exactly, so the oracle is plain SQL over the
    source table. Write: one .csv.gz per batch inside map_batches (no
    driver materialization); read: one task per file."""
    from ..sinks.complete import ensure_complete_set
    from ..sinks.csvsink import read_csv, write_csv

    out = os.path.join(corpus_cache_dir(sf_dir), "docs_csv")
    cols = ["doc_id", "lang", "source", "n_chars"]
    ensure_complete_set(
        out, ".csv.gz",
        lambda: write_csv(_docs(ray, sf_dir, cols), out,
                          cols).materialize())
    return (read_csv(ray, out)
            .map_batches(lambda t: t.select(cols), batch_format="pyarrow")
            .sort("doc_id"))


DOCS_CSV_ROUNDTRIP_SQL = """
SELECT doc_id, lang, source, n_chars FROM documents ORDER BY doc_id
"""


def docs_orc_roundtrip(ray, sf_dir: str):
    """(doc_id, lang, source, n_chars, text) exported through the ORC
    byte sink (sinks/orcsink.py) and re-ingested — the FOURTH byte
    format, VALUE-CHECKED against the documents table itself; unlike the
    CSV path this one round-trips the free-text column too (ORC is
    typed, so no quoting-edge risk)."""
    from ..sinks.complete import ensure_complete_set
    from ..sinks.orcsink import read_orc, write_orc

    out = os.path.join(corpus_cache_dir(sf_dir), "docs_orc")
    cols = ["doc_id", "lang", "source", "n_chars", "text"]
    ensure_complete_set(
        out, ".orc",
        lambda: write_orc(_docs(ray, sf_dir, cols), out,
                          cols).materialize())
    return (read_orc(ray, out)
            .map_batches(lambda t: t.select(cols), batch_format="pyarrow")
            .sort("doc_id"))


DOCS_ORC_ROUNDTRIP_SQL = """
SELECT doc_id, lang, source, n_chars, text FROM documents ORDER BY doc_id
"""


def docs_tfrecord_roundtrip(ray, sf_dir: str):
    """(doc_id, lang, source, n_chars, text) exported through the
    TFRecord byte sink (sinks/tfrecord.py — TF's framed-record wire
    format with CRC32C checksums, implemented from the public spec)
    and re-ingested — the FIFTH byte format, VALUE-CHECKED against the
    documents table itself; every frame's checksums are verified on
    the read side, so the green oracle also proves checksum
    integrity end-to-end."""
    from ..sinks.complete import ensure_complete_set
    from ..sinks.tfrecord import read_tfrecord, write_tfrecord

    out = os.path.join(corpus_cache_dir(sf_dir), "docs_tfrecord")
    cols = ["doc_id", "lang", "source", "n_chars", "text"]
    schema = pa.schema([("doc_id", pa.int64()), ("lang", pa.string()),
                        ("source", pa.string()),
                        ("n_chars", pa.int64()),
                        ("text", pa.string())])
    ensure_complete_set(
        out, ".tfrecord",
        lambda: write_tfrecord(_docs(ray, sf_dir, cols), out,
                               cols).materialize())
    return read_tfrecord(ray, out, schema).sort("doc_id")


DOCS_TFRECORD_ROUNDTRIP_SQL = """
SELECT doc_id, lang, source, n_chars, text FROM documents ORDER BY doc_id
"""


def docs_avro_roundtrip(ray, sf_dir: str):
    """(doc_id, lang, source, n_chars, text) exported through the Avro
    object-container byte sink (sinks/avro.py — the public Avro 1.11
    binary encoding + OCF layout, pure stdlib) and re-ingested — the
    SIXTH byte format, VALUE-CHECKED against the documents table; the
    reader validates magic, embedded schema and every block's sync
    marker, so a green oracle also proves container integrity."""
    from ..sinks.avro import read_avro, write_avro
    from ..sinks.complete import ensure_complete_set

    out = os.path.join(corpus_cache_dir(sf_dir), "docs_avro")
    cols = ["doc_id", "lang", "source", "n_chars", "text"]
    schema = pa.schema([("doc_id", pa.int64()), ("lang", pa.string()),
                        ("source", pa.string()),
                        ("n_chars", pa.int64()),
                        ("text", pa.string())])
    ensure_complete_set(
        out, ".avro",
        lambda: write_avro(_docs(ray, sf_dir, cols), out,
                           cols).materialize())
    return read_avro(ray, out, schema).sort("doc_id")


DOCS_AVRO_ROUNDTRIP_SQL = """
SELECT doc_id, lang, source, n_chars, text FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
FEATURE_HASH_DIM = 64


def docs_feature_hash(ray, sf_dir: str, dim: int = FEATURE_HASH_DIM):
    """(doc_id, bucket, n): the HASHING-TRICK text featurizer — every
    token maps to md5 % dim, giving each document a fixed-width sparse
    count vector with no vocabulary state (Weinberger et al. 2009). The
    stateless featurization an ML pipeline runs where a fitted
    vectorizer's vocab would itself be a 100-TB shuffle.

    Scale shape: pure streaming — each doc's rows complete inside its
    batch (no exchange at all); distinct tokens are hashed once per
    batch through a local memo, the per-(doc, bucket) counts come from
    one vectorized pandas groupby."""
    ds = _docs(ray, sf_dir, ["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        memo: dict[str, int] = {}
        out_d, out_b = [], []
        for did, tx in zip(ids, texts):
            # lowercase BEFORE tokenizing — the conventional feature-hash
            # fold, and what the oracle's lower(text) computes; hashing
            # case-preserved tokens would diverge on any uppercase char
            for tok in tokenize(tx.lower()):
                b = memo.get(tok)
                if b is None:
                    b = int(hashlib.md5(tok.encode()).hexdigest()[:8],
                            16) % dim
                    memo[tok] = b
                out_d.append(did)
                out_b.append(b)
        df = pd.DataFrame({"doc_id": out_d, "bucket": out_b})
        g = df.groupby(["doc_id", "bucket"], as_index=False).size()
        return pa.table({
            "doc_id": pa.array(g["doc_id"], pa.int64()),
            "bucket": pa.array(g["bucket"], pa.int64()),
            "n": pa.array(g["size"], pa.int64())})

    return (ds.map_batches(f, batch_format="pyarrow")
              .sort(["doc_id", "bucket"]))


DOCS_FEATURE_HASH_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest(str_split_regex(
      regexp_replace(lower(text), '^{SQL_WS_CLASS}+|{SQL_WS_CLASS}+$',
                     '', 'g'),
      '{SQL_WS_CLASS}+')) AS token
  FROM documents)
SELECT doc_id,
       ('0x' || substr(md5(token), 1, 8))::BIGINT % {FEATURE_HASH_DIM}
       AS bucket,
       COUNT(*) AS n
FROM t WHERE token != ''
GROUP BY doc_id, bucket ORDER BY doc_id, bucket
"""


# --- BM25 scored retrieval ---------------------------------------------------
# (public design: Robertson-Spärck Jones probabilistic relevance /
# Okapi BM25, k1=1.2 b=0.75 — here in a LOG-FREE integer-exact form so
# the DuckDB oracle matches bit-for-bit: idf_t = (N*1000)//df_t replaces
# ln((N-df+.5)/(df+.5)) the same way doc_tfidf_top replaces ln(N/df),
# and the k1/b length normalization is cleared of fractions by
# multiplying numerator and denominator through by 10*4*avgdl = 40*T/N:
#   term score = idf_t * (22*tf*T) // ((10*tf + 3)*T + 9*dl*N)
# which is floor(idf * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))) up to
# the shared scaling. All BIGINT; sums are order-independent.)

BM25_QUERY_TERMS = ("filter", "hash", "join", "stream", "vector", "column")
BM25_TOPK = 20


def docs_bm25_topk(ray, sf_dir: str, terms=BM25_QUERY_TERMS,
                   k: int = BM25_TOPK):
    """(doc_id, score): top-k documents by integer-exact BM25 against a
    fixed query-term set. Scale shape: pass 1 reduces the corpus to a
    CONSTANT-size statistics table (per-term df, total token count) via
    per-batch partials — no vocabulary shuffle; pass 2 scores each doc
    batch-locally with the broadcast constants and only the global
    top-k sort moves rows."""
    from ..io_utils import parquet_num_rows

    n_docs = parquet_num_rows(f"{sf_dir}/documents.parquet")
    term_set = set(terms)
    ds = _docs(ray, sf_dir, ["doc_id", "text"])

    def stats_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        df_c: dict[str, int] = {t: 0 for t in term_set}
        total = 0
        for txt in batch.column("text").to_pylist():
            toks = tokenize(txt)
            total += len(toks)
            seen = term_set.intersection(toks)
            for t in seen:
                df_c[t] += 1
        keys = sorted(df_c) + ["\x00total"]
        vals = [df_c[t] for t in sorted(df_c)] + [total]
        return pa.table({"key": pa.array(keys, pa.string()),
                         "cnt": pa.array(vals, pa.int64())})

    # O(blocks * |terms|) rows -> driver fold of a constant-size table
    parts = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("key")["cnt"].sum()
    big_t = int(agg["\x00total"])
    df_map = {t: int(agg.get(t, 0)) for t in term_set}
    idf = {t: (n_docs * 1000) // df_map[t] for t in term_set
           if df_map[t] > 0}

    def score(batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids = batch.column("doc_id").to_pylist()
        out_id, out_sc = [], []
        for i, txt in zip(ids, batch.column("text").to_pylist()):
            toks = tokenize(txt)
            dl = len(toks)
            c = Counter(toks)
            s = 0
            hit = False
            for t, w in idf.items():
                tf = c.get(t, 0)
                if tf:
                    hit = True
                    s += w * (22 * tf * big_t) // (
                        (10 * tf + 3) * big_t + 9 * dl * n_docs)
            if hit:
                out_id.append(i)
                out_sc.append(s)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "score": pa.array(out_sc, pa.int64())})

    return (ds.map_batches(score, batch_format="pyarrow")
              .sort(["score", "doc_id"], descending=[True, False])
              .limit(k))


def _bm25_sql(terms=BM25_QUERY_TERMS, k: int = BM25_TOPK) -> str:
    return f"""
WITH {_bm25_scored_ctes(terms)}
SELECT doc_id, CAST(score AS BIGINT) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT {k}
"""


def _bm25_scored_ctes(terms=BM25_QUERY_TERMS) -> str:
    """The BM25 CTE chain up to ``scored(doc_id, score)`` — shared by
    the top-k oracle and the RRF fusion oracle."""
    vals = ", ".join(f"('{t}')" for t in sorted(terms))
    return f"""toks AS (
  SELECT doc_id,
         unnest(str_split_regex({SQL_TRIM_TEXT}, '{SQL_WS_CLASS}+')) AS token
  FROM documents),
tok2 AS (SELECT doc_id, token FROM toks WHERE token != ''),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok2 GROUP BY doc_id),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
tt AS (SELECT COUNT(*) AS total FROM tok2),
q(term) AS (VALUES {vals}),
tf AS (SELECT doc_id, token, COUNT(*) AS tf
       FROM tok2 JOIN q ON token = q.term GROUP BY doc_id, token),
df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
scored AS (
  SELECT tf.doc_id,
         SUM(((n.n_docs * 1000) // df.df) * (22 * tf.tf * tt.total)
             // ((10 * tf.tf + 3) * tt.total + 9 * dl.dl * n.n_docs))
           AS score
  FROM tf JOIN df USING (token) JOIN dl USING (doc_id)
  CROSS JOIN n CROSS JOIN tt
  GROUP BY tf.doc_id)"""


DOCS_BM25_SQL = _bm25_sql()


# --- reciprocal rank fusion ---------------------------------------------------
RRF_K = 60              # the standard RRF damping constant
RRF_RUN_N = 100         # per-run truncation (RRF fuses top-n lists)
RRF_TOP = 20
RRF_SCALE = 1_000_000_000


def docs_rrf_fusion(ray, sf_dir: str, n: int = RRF_RUN_N,
                    k: int = RRF_TOP):
    """(doc_id, rrf_e9): RECIPROCAL RANK FUSION (Cormack/Clarke/Buettcher,
    SIGIR'09) of two retrieval runs — the BM25 query ranking and the
    unigram-LM commonness ranking — each truncated to its top-``n``
    list, fused as sum of floor(1e9 / (60 + rank)) per run, top-``k``
    winners by fused score. Ranks use the deterministic
    (score DESC, doc_id ASC) total order on both engines, so the fusion
    is integer-exact end to end.

    Scale shape: each run reduces to an n-row list through its own
    distributed score + sort + limit (both already value-verified);
    fusing two n-row lists is a driver-side O(n) fold — RRF's inputs
    are top-n lists BY DEFINITION, so the collect is bounded by the
    operator's contract, not the corpus."""
    a = docs_bm25_topk(ray, sf_dir, k=n).to_pandas()
    b = (docs_lm_score(ray, sf_dir)
         .sort(["commonness", "doc_id"], descending=[True, False])
         .limit(n).to_pandas())

    fused: dict[int, int] = {}
    for run_ids in (a["doc_id"], b["doc_id"]):
        for r, did in enumerate(run_ids, start=1):
            did = int(did)
            fused[did] = fused.get(did, 0) + RRF_SCALE // (RRF_K + r)
    out = (pd.DataFrame({"doc_id": list(fused.keys()),
                         "rrf_e9": list(fused.values())})
           .astype({"doc_id": "int64", "rrf_e9": "int64"})
           .sort_values(["rrf_e9", "doc_id"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    return out


DOCS_RRF_FUSION_SQL = f"""
WITH {_bm25_scored_ctes()},
runa AS (SELECT doc_id, r FROM (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
  FROM scored) WHERE r <= {RRF_RUN_N}),
lm AS (
  SELECT d.doc_id,
         CAST(COALESCE(SUM(tf2.tf * v.n), 0) AS BIGINT) AS commonness
  FROM documents d
  LEFT JOIN (SELECT doc_id, token, COUNT(*) AS tf FROM tok2
             GROUP BY doc_id, token) tf2 ON d.doc_id = tf2.doc_id
  LEFT JOIN (SELECT token, COUNT(*) AS n FROM tok2 GROUP BY token) v
         ON tf2.token = v.token
  GROUP BY d.doc_id),
runb AS (SELECT doc_id, r FROM (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY commonness DESC, doc_id) AS r
  FROM lm) WHERE r <= {RRF_RUN_N}),
fused AS (
  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
         COALESCE({RRF_SCALE} // ({RRF_K} + a.r), 0)
         + COALESCE({RRF_SCALE} // ({RRF_K} + b.r), 0) AS rrf_e9
  FROM runa a FULL OUTER JOIN runb b ON a.doc_id = b.doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(rrf_e9 AS BIGINT) AS rrf_e9
FROM fused ORDER BY rrf_e9 DESC, doc_id LIMIT {RRF_TOP}
"""


# --- vocabulary build + corpus id-encoding ------------------------------------
def docs_vocab_encode(ray, sf_dir: str):
    """(doc_id, pos, token_id): the corpus re-encoded as dense integer
    token ids — the vocabulary-build + tokenize-to-ids step every LM
    training pipeline runs before batching. token_id is the token's
    1-based rank by (corpus count DESC, token ASC), so ids are stable,
    frequency-ordered, and exactly reproducible in SQL.

    Scale shape (no driver-held vocabulary anywhere):
      1. explode token instances once (one map pass),
      2. vocab counts via the bucketed wordcount combiner,
      3. dense ranks from ONE sort of the (distinct-token) vocab table +
         an O(blocks) block-offset prefix scan (the events_zorder
         pattern — summaries on the driver, never rows),
      4. ONE distributed join instances x vocab on the token key,
      5. final (doc_id, pos) order restored by the output sort."""
    from ..io_utils import parquet_column_bytes, parquet_num_rows
    from ..stages.aggregates import hash_bucket_aggregate, join_partitions_for

    tok_bound = parquet_column_bytes(
        f"{sf_dir}/documents.parquet", "text") // 2
    ds = _docs(ray, sf_dir, ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        ids_out, poss, toks = [], [], []
        for i, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            tk = tokenize(t)
            ids_out.extend([i] * len(tk))
            poss.extend(range(1, len(tk) + 1))
            toks.extend(tk)
        return pa.table({"doc_id": pa.array(ids_out, pa.int64()),
                         "pos": pa.array(poss, pa.int64()),
                         "token": pa.array(toks, pa.string())})

    inst = ds.map_batches(explode, batch_format="pyarrow").materialize()

    counts = hash_bucket_aggregate(
        inst.map_batches(
            lambda t: pa.table({"token": t.column("token"),
                                "n": pa.array(np.ones(t.num_rows,
                                                      dtype=np.int64))}),
            batch_format="pyarrow"),
        ["token"],
        lambda df: df.groupby("token", as_index=False).agg(n=("n", "sum")),
        n_rows=tok_bound)

    ranked = counts.sort(["n", "token"],
                         descending=[True, False]).materialize()

    from ..stages.aggregates import block_prefix_bases, first_key

    # blocks are in (n desc, token asc) order: scan summaries the same way
    bases = block_prefix_bases(ranked, ["n", "token"],
                               ascending=[False, True])

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "token_id": pa.array([], pa.int64())})
        base = bases[first_key(t, ["n", "token"])]
        ids = np.arange(base + 1, base + 1 + t.num_rows, dtype=np.int64)
        return pa.table({"token": t.column("token"),
                         "token_id": pa.array(ids, pa.int64())})

    vocab_ids = ranked.map_batches(assign, batch_size=None,
                                   batch_format="pyarrow").materialize()

    joined = inst.join(vocab_ids, join_type="inner", on=("token",),
                       num_partitions=join_partitions_for(
                           max(1, vocab_ids.count())))
    return (joined.map_batches(
                lambda t: t.select(["doc_id", "pos", "token_id"]),
                batch_format="pyarrow")
                  .sort(["doc_id", "pos"]))


DOCS_VOCAB_ENCODE_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(str_split_regex({SQL_TRIM_TEXT}, '{SQL_WS_CLASS}+')) AS token,
         unnest(generate_series(
             1, len(str_split_regex({SQL_TRIM_TEXT}, '{SQL_WS_CLASS}+'))))
           AS pos
  FROM documents),
tok2 AS (SELECT doc_id, pos, token FROM toks WHERE token != ''),
vocab AS (
  SELECT token,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS token_id
  FROM (SELECT token, COUNT(*) AS cnt FROM tok2 GROUP BY token))
SELECT t.doc_id, CAST(t.pos AS BIGINT) AS pos,
       CAST(v.token_id AS BIGINT) AS token_id
FROM tok2 t JOIN vocab v USING (token)
ORDER BY doc_id, pos
"""


# --- bigram-LM commonness scoring ---------------------------------------------
def docs_bigram_lm_score(ray, sf_dir: str):
    """(doc_id, bigram_commonness): bigram language-model document score
    — for each bigram instance (w1, w2) the integerized conditional
    commonness C(w1,w2) * 1000 // C(w1), summed over the doc (the
    two-gram upgrade of docs_lm_score: stock PHRASING scores high even
    when individual words are common). All-BIGINT so the oracle hashes
    exactly; docs with < 2 tokens score 0 via the same sentinel-row
    trick (the empty string can never be a real token).

    Scale shape: per-doc bigram tf partials explode once, bigram and
    unigram count tables are built by the bucketed wordcount combiner
    (never driver-held), then TWO distributed hash joins — instances x
    bigram counts on (w1, w2), then x unigram counts on w1 — and a
    per-doc re-aggregate."""
    from collections import Counter

    from ..io_utils import parquet_column_bytes, parquet_num_rows
    from ..stages.aggregates import hash_bucket_aggregate, join_partitions_for

    tok_bound = parquet_column_bytes(
        f"{sf_dir}/documents.parquet", "text") // 2
    n_docs = parquet_num_rows(f"{sf_dir}/documents.parquet")
    ds = _docs(ray, sf_dir, ["doc_id", "text"])

    if tok_bound * 16 <= 64 << 20:
        # both count tables are distinct-key-bounded well below the
        # token-instance bound: fold per-batch Counter partials on the
        # driver and broadcast ONE (w1, w2) -> score dict — two corpus
        # map passes, zero shuffles/joins. The exchange path below is
        # the 100-TB route.
        from collections import Counter as _C

        def cnt_partial(batch: pa.Table) -> pa.Table:
            bc: dict = _C()
            uc: dict = _C()
            for t in batch.column("text").to_pylist():
                toks = tokenize(t)
                uc.update(toks)
                bc.update(zip(toks, toks[1:]))
            w1 = [a for a, _ in bc] + list(uc)
            # a real token is never "" (tokenize drops empties), so
            # w2 == "" safely marks the unigram rows
            w2 = [b for _, b in bc] + [""] * len(uc)
            n = list(bc.values()) + list(uc.values())
            return pa.table({"w1": pa.array(w1, pa.string()),
                             "w2": pa.array(w2, pa.string()),
                             "n": pa.array(n, pa.int64())})

        parts = (ds.map_batches(cnt_partial, batch_format="pyarrow")
                   .to_pandas())
        tot = parts.groupby(["w1", "w2"], as_index=False)["n"].sum()
        uni = tot[tot["w2"] == ""].set_index("w1")["n"]
        big2 = tot[tot["w2"] != ""]
        n1 = np.maximum(uni.loc[big2["w1"]].to_numpy(), 1)
        score = (big2["n"].to_numpy() * 1000) // n1
        ref = ray.put(dict(zip(zip(big2["w1"], big2["w2"]),
                               score.tolist())))

        def score_docs(batch: pa.Table) -> pa.Table:
            lk = ray.get(ref)
            ids, vals = [], []
            for i, t in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
                toks = tokenize(t)
                s = 0
                if len(toks) >= 2:
                    for bg, c in _C(zip(toks, toks[1:])).items():
                        s += c * lk[bg]
                ids.append(i)
                vals.append(s)
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "bigram_commonness": pa.array(vals, pa.int64())})

        return (ds.map_batches(score_docs, batch_format="pyarrow")
                  .sort("doc_id"))

    def explode(batch: pa.Table) -> pa.Table:
        ids_out, w1s, w2s, tfs = [], [], [], []
        for i, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            toks = tokenize(t)
            if len(toks) < 2:
                # sentinel keeps the doc alive through both joins with
                # score 0: ("", "") joins the n2=0 / n1=0 count rows the
                # sentinel itself contributes
                ids_out.append(i)
                w1s.append("")
                w2s.append("")
                tfs.append(0)
                continue
            for (a, b), c in Counter(zip(toks, toks[1:])).items():
                ids_out.append(i)
                w1s.append(a)
                w2s.append(b)
                tfs.append(c)
        return pa.table({"doc_id": pa.array(ids_out, pa.int64()),
                         "w1": pa.array(w1s, pa.string()),
                         "w2": pa.array(w2s, pa.string()),
                         "tf": pa.array(tfs, pa.int64())})

    big = ds.map_batches(explode, batch_format="pyarrow").materialize()

    c2 = hash_bucket_aggregate(
        big.map_batches(lambda t: pa.table({"w1": t.column("w1"),
                                            "w2": t.column("w2"),
                                            "n2": t.column("tf")}),
                        batch_format="pyarrow"),
        ["w1", "w2"],
        lambda df: df.groupby(["w1", "w2"], as_index=False).agg(
            n2=("n2", "sum")),
        n_rows=tok_bound).materialize()

    # unigram counts over ALL token instances, plus the "" sentinel rows
    # (n1 = 0) so the sentinel bigram survives the second join too
    def uni(batch: pa.Table) -> pa.Table:
        w1s, n1s = [], []
        for t in batch.column("text").to_pylist():
            toks = tokenize(t)
            if len(toks) < 2:
                w1s.append("")
                n1s.append(0)
            for tok, c in Counter(toks).items():
                w1s.append(tok)
                n1s.append(c)
        return pa.table({"w1": pa.array(w1s, pa.string()),
                         "n1": pa.array(n1s, pa.int64())})

    c1 = hash_bucket_aggregate(
        ds.map_batches(uni, batch_format="pyarrow"),
        ["w1"],
        lambda df: df.groupby("w1", as_index=False).agg(n1=("n1", "sum")),
        n_rows=tok_bound).materialize()

    j = big.join(c2, join_type="inner", on=("w1", "w2"),
                 num_partitions=join_partitions_for(
                     max(1, min(tok_bound, c2.count()))))
    j = j.join(c1, join_type="inner", on=("w1",),
               num_partitions=join_partitions_for(
                   max(1, min(tok_bound, c1.count()))))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        n1 = np.maximum(b["n1"].to_numpy(), 1)
        s = (b["tf"].to_numpy() * ((b["n2"].to_numpy() * 1000) // n1))
        g = pd.DataFrame({"doc_id": b["doc_id"].astype("int64"),
                          "bigram_commonness": s.astype("int64")})
        return g.groupby("doc_id", as_index=False).sum()

    return hash_bucket_aggregate(
        j.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["doc_id"],
        lambda df: df.groupby("doc_id", as_index=False).sum(),
        n_rows=n_docs).sort("doc_id")


DOCS_BIGRAM_LM_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(str_split_regex({SQL_TRIM_TEXT}, '{SQL_WS_CLASS}+')) AS token,
         unnest(generate_series(
             1, len(str_split_regex({SQL_TRIM_TEXT}, '{SQL_WS_CLASS}+'))))
           AS pos
  FROM documents),
tok2 AS (SELECT doc_id, pos, token FROM toks WHERE token != ''),
big AS (
  SELECT a.doc_id, a.token AS w1, b.token AS w2
  FROM tok2 a JOIN tok2 b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM big GROUP BY w1, w2),
c1 AS (SELECT token AS w1, COUNT(*) AS n1 FROM tok2 GROUP BY token),
scored AS (
  SELECT big.doc_id,
         SUM(c2.n2 * 1000 // GREATEST(c1.n1, 1)) AS s
  FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
  GROUP BY big.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(s.s, 0) AS BIGINT) AS bigram_commonness
FROM documents d LEFT JOIN scored s USING (doc_id)
ORDER BY doc_id
"""


# --- BPE merge training (Sennrich et al., ACL'16) ----------------------------
BPE_N_MERGES = 12


def bpe_apply(word: str, merges: list) -> list:
    """Encode ``word`` with the learned merges IN LEARNED ORDER — the
    canonical BPE apply: per merge one left-to-right non-overlapping
    scan over the current symbol sequence."""
    syms = list(word)
    for a, b in merges:
        if len(syms) < 2:
            break
        out = []
        i = 0
        n = len(syms)
        while i < n:
            if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_merges_local(word_counts: dict, n_merges: int) -> list:
    """Single-process reference BPE trainer over a {word: count} table —
    the exact-equality oracle for ``docs_bpe_merges`` (same rule: max
    pair count, ties to the lexicographically smallest (left, right))."""
    from collections import Counter

    merges: list = []
    out = []
    for _ in range(n_merges):
        c: Counter = Counter()
        for w, n in word_counts.items():
            syms = bpe_apply(w, merges)
            for i in range(len(syms) - 1):
                c[(syms[i], syms[i + 1])] += n
        if not c:
            break
        # deterministic tie rule: max count, then smallest (left, right)
        bn = max(c.values())
        pair = min(p for p, v in c.items() if v == bn)
        merges.append(pair)
        out.append((len(out) + 1, pair[0], pair[1], int(bn)))
    return out


# distinct-word tables at or under this row count train the merge loop
# ON THE DRIVER from the collected table (one bounded collect, zero
# per-round dataset executions); larger vocabularies use the
# distributed per-round loop. BPE training is vocabulary-bounded by
# construction (Sennrich compresses the corpus to distinct words
# first), so this is the auto_join adaptive-placement rationale applied
# to an iterative trainer: 12 merges x 2 dataset executions of fixed
# ~0.2 s scheduling cost is pure waste on a table that fits in one heap.
BPE_LOCAL_WORD_LIMIT = 262_144


def _bpe_train(ray, sf_dir: str, n_merges: int = BPE_N_MERGES,
               local_word_limit: int = BPE_LOCAL_WORD_LIMIT):
    """(merge rows, trained word table (word, syms, n)): the first ``n_merges`` BPE merges learned
    from the corpus (Sennrich et al., ACL'16) — REAL distributed
    tokenizer training, the canonical missing piece between "count
    tokens" and "train on packed sequences". Tie rule: max pair count,
    then lexicographically smallest (left, right) — fully deterministic,
    so the distributed result is EXACTLY equal to the single-process
    reference (``bpe_merges_local``; integer counts are order-free).

    Scale shape (the Sennrich compression): training runs over the
    DISTINCT-WORD frequency table, not the corpus — one distributed
    wordcount builds it (fan-out sized by token bytes). The
    segmentation state is INCREMENTAL: a (syms: list<string>, n) table
    materialized per round, to which only the ROUND'S OWN merge is
    applied (applying merges one at a time to the running segmentation
    composes to exactly ``bpe_apply`` of the full ordered list), so a
    round costs one pair-count pass + one merge pass over the word
    table — not a from-scratch O(rank) re-segmentation. Pair counts
    flow as per-batch partials into a bucketed sum, then an O(blocks)
    per-block top-1 reduce; the driver holds one candidate row per
    block, never a pair table."""
    from collections import Counter

    from ..io_utils import parquet_column_bytes
    from ..stages.aggregates import hash_bucket_aggregate

    ds = _docs(ray, sf_dir, ["text"])
    tok_bound = parquet_column_bytes(
        f"{sf_dir}/documents.parquet", "text") // 2

    def wc_partial(batch: pa.Table) -> pd.DataFrame:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(tokenize(t.lower()))
        return pd.DataFrame({"word": list(c.keys()),
                             "n": pd.Series(list(c.values()),
                                            dtype="int64")})

    def to_syms(t: pa.Table) -> pa.Table:
        return pa.table({
            "word": t.column("word").cast(pa.string()),
            "syms": pa.array([list(w) for w in
                              t.column("word").to_pylist()],
                             pa.list_(pa.string())),
            "n": t.column("n").cast(pa.int64())})

    words = hash_bucket_aggregate(
        ds.map_batches(wc_partial, batch_format="pyarrow"),
        ["word"],
        lambda df: df.groupby("word", as_index=False).agg(n=("n", "sum")),
        n_rows=tok_bound).map_batches(
        to_syms, batch_format="pyarrow").materialize()
    n_words = words.count()

    if n_words <= local_word_limit:
        # vocabulary fits: train locally on the collected word table —
        # identical algorithm and tie rule, so the result is exactly
        # the distributed loop's (applying merges one at a time
        # composes to bpe_apply of the ordered list)
        wt = words.to_pandas()
        wc = {w: int(n) for w, n in zip(wt["word"], wt["n"])}
        rows = bpe_merges_local(wc, n_merges)
        merges = [(le, r) for _, le, r, _ in rows]
        syms = [bpe_apply(w, merges) for w in wt["word"]]
        out_tbl = pa.table({
            "word": pa.array(list(wt["word"]), pa.string()),
            "syms": pa.array(syms, pa.list_(pa.string())),
            "n": pa.array(wt["n"].astype("int64"))})
        return rows, ray.data.from_arrow(out_tbl)

    def pair_partial(t: pa.Table) -> pd.DataFrame:
        c: Counter = Counter()
        for syms, n in zip(t.column("syms").to_pylist(),
                           t.column("n").to_pylist()):
            for i in range(len(syms) - 1):
                c[(syms[i], syms[i + 1])] += n
        ks = list(c.keys())
        return pd.DataFrame({
            "left": [k[0] for k in ks],
            "right": [k[1] for k in ks],
            "n": pd.Series(list(c.values()), dtype="int64")})

    def apply_one(a: str, b: str):
        def f(t: pa.Table) -> pa.Table:
            out = []
            for syms in t.column("syms").to_pylist():
                m = len(syms)
                if m < 2:
                    out.append(syms)
                    continue
                merged = []
                i = 0
                while i < m:
                    if i + 1 < m and syms[i] == a and syms[i + 1] == b:
                        merged.append(a + b)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                out.append(merged)
            return pa.table({"word": t.column("word"),
                             "syms": pa.array(out, pa.list_(pa.string())),
                             "n": t.column("n")})
        return f

    rows = []
    for rank in range(1, n_merges + 1):
        pairs = hash_bucket_aggregate(
            words.map_batches(pair_partial, batch_format="pyarrow"),
            ["left", "right"],
            lambda df: df.groupby(["left", "right"], as_index=False).agg(
                n=("n", "sum")),
            n_rows=n_words * 4)

        def block_top1(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return df
            return (df.sort_values(["n", "left", "right"],
                                   ascending=[False, True, True],
                                   kind="mergesort").head(1))

        cands = pairs.map_batches(block_top1, batch_format="pandas",
                                  batch_size=None).to_pandas()  # O(blocks)
        if len(cands) == 0:
            break
        best = (cands.sort_values(["n", "left", "right"],
                                  ascending=[False, True, True],
                                  kind="mergesort").iloc[0])
        rows.append((rank, best["left"], best["right"], int(best["n"])))
        words = words.map_batches(
            apply_one(best["left"], best["right"]),
            batch_format="pyarrow").materialize()

    return rows, words


def docs_bpe_merges(ray, sf_dir: str, n_merges: int = BPE_N_MERGES):
    """(rank, left, right, n): the learned BPE merge table — see
    ``_bpe_train`` for the algorithm and scale shape."""
    rows, _ = _bpe_train(ray, sf_dir, n_merges)
    out = pd.DataFrame(rows, columns=["rank", "left", "right", "n"])
    return out.astype({"rank": "int64", "n": "int64"})


def docs_bpe_encode(ray, sf_dir: str, n_merges: int = BPE_N_MERGES):
    """(doc_id, n_bpe_tokens): the TRAIN -> APPLY composition — encode
    every document under the merges just learned and report its BPE
    symbol count (the number that actually prices a doc for packing /
    context budgeting, vs the whitespace token count).

    Scale shape: the trained word table already holds each distinct
    word's final segmentation, so encoding is a JOIN, not a re-apply:
    docs explode to (doc_id, word, tf) per-batch partials, one hash
    join against the (word, n_syms) projection, then a per-doc bucketed
    sum. No merge list ships to the encode pass at all."""
    from collections import Counter

    from ..io_utils import parquet_column_bytes, parquet_num_rows
    from ..stages.aggregates import (
        hash_bucket_aggregate,
        join_partitions_for,
        normalize_for_join,
    )

    _, words = _bpe_train(ray, sf_dir, n_merges)
    wsyms = normalize_for_join(
        words.map_batches(
            lambda t: pa.table({
                "word": t.column("word"),
                "n_syms": pa.array(
                    [len(s) for s in t.column("syms").to_pylist()],
                    pa.int64())}),
            batch_format="pyarrow"),
        pa.schema([("word", pa.string()), ("n_syms", pa.int64())])
    ).materialize()

    ds = _docs(ray, sf_dir, ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        ids, ws, tfs = [], [], []
        for i, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            c = Counter(tokenize(t.lower()))
            ids.extend([i] * len(c))
            ws.extend(c.keys())
            tfs.extend(c.values())
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "word": pa.array(ws, pa.string()),
                         "tf": pa.array(tfs, pa.int64())})

    pairs = normalize_for_join(
        ds.map_batches(explode, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("word", pa.string()),
                   ("tf", pa.int64())])).materialize()
    joined = pairs.join(
        wsyms, join_type="inner", on=("word",),
        num_partitions=join_partitions_for(
            max(1, min(pairs.count(), wsyms.count()))))

    def per_doc(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "doc_id": t.column("doc_id").to_numpy(zero_copy_only=False),
            "n_bpe_tokens": (
                t.column("tf").to_numpy(zero_copy_only=False)
                * t.column("n_syms").to_numpy(zero_copy_only=False))})
        return df.groupby("doc_id", as_index=False).agg(
            n_bpe_tokens=("n_bpe_tokens", "sum"))

    counts = hash_bucket_aggregate(
        joined.map_batches(per_doc, batch_format="pyarrow"),
        ["doc_id"],
        lambda df: df.groupby("doc_id", as_index=False).agg(
            n_bpe_tokens=("n_bpe_tokens", "sum")),
        n_rows=parquet_num_rows(f"{sf_dir}/documents.parquet"))
    counts = normalize_for_join(
        counts, pa.schema([("doc_id", pa.int64()),
                           ("n_bpe_tokens", pa.int64())])).materialize()

    # token-less docs encode to 0 symbols: one left join over doc ids
    all_ids = normalize_for_join(
        _docs(ray, sf_dir, ["doc_id"]),
        pa.schema([("doc_id", pa.int64())])).materialize()
    out = all_ids.join(
        counts, join_type="left_outer", on=("doc_id",),
        num_partitions=join_partitions_for(
            max(1, min(all_ids.count(), counts.count()))))

    def fill(t: pa.Table) -> pa.Table:
        v = t.column("n_bpe_tokens").to_numpy(zero_copy_only=False)
        v = np.where(np.isnan(v.astype(np.float64)), 0, v).astype(np.int64)
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_bpe_tokens": pa.array(v, pa.int64())})

    return out.map_batches(fill, batch_format="pyarrow").sort("doc_id")


# --- context-window chunking --------------------------------------------------
CHUNK_W = 128   # tokens per chunk
CHUNK_S = 96    # stride (=> 32-token overlap)


def docs_chunks(ray, sf_dir: str, w: int = CHUNK_W, s: int = CHUNK_S):
    """(doc_id, chunk_id, tok_start, tok_end): fixed-window token
    chunking with overlap — the RAG / context-window chunker: chunk k
    (0-based) covers tokens [1 + k*s, min(1 + k*s + w - 1, n)] and
    chunks are emitted while their start is within the doc, so the last
    chunk may be short and token-less docs emit nothing. Pure per-doc
    arithmetic over the token count — no token materialization, no
    shuffle beyond the output sort.

    Scale shape: one pruned scan, per-batch vectorized expansion (chunk
    counts via integer ceil, np.repeat/arange for the explode)."""
    ds = _docs(ray, sf_dir, ["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = np.fromiter((len(tokenize(t)) for t in
                         batch.column("text").to_pylist()),
                        dtype=np.int64, count=len(ids))
        k = np.where(n > 0, (np.maximum(n - 1, 0) // s) + 1, 0)
        doc = np.repeat(ids, k)
        nn = np.repeat(n, k)
        total = int(k.sum())
        if total == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "chunk_id": pa.array([], pa.int64()),
                             "tok_start": pa.array([], pa.int64()),
                             "tok_end": pa.array([], pa.int64())})
        cid = np.arange(total) - np.repeat(np.cumsum(k) - k, k)
        start = 1 + cid * s
        end = np.minimum(start + w - 1, nn)
        return pa.table({"doc_id": pa.array(doc, pa.int64()),
                         "chunk_id": pa.array(cid, pa.int64()),
                         "tok_start": pa.array(start, pa.int64()),
                         "tok_end": pa.array(end, pa.int64())})

    return (ds.map_batches(f, batch_format="pyarrow")
              .sort(["doc_id", "chunk_id"]))


DOCS_CHUNKS_SQL = f"""
WITH n AS (
  SELECT doc_id,
         CASE WHEN {SQL_TRIM_TEXT} = '' THEN 0 ELSE
           CAST(len(str_split_regex({SQL_TRIM_TEXT}, '{SQL_WS_CLASS}+'))
                AS BIGINT) END AS n
  FROM documents),
c AS (
  SELECT doc_id, n,
         unnest(generate_series(0, (n - 1) // {CHUNK_S})) AS chunk_id
  FROM n WHERE n > 0)
SELECT doc_id, chunk_id,
       1 + chunk_id * {CHUNK_S} AS tok_start,
       LEAST(1 + chunk_id * {CHUNK_S} + {CHUNK_W} - 1, n) AS tok_end
FROM c ORDER BY doc_id, chunk_id
"""


# ---------------------------------------------------------------------------
RENDEZVOUS_SHARDS = 8


def docs_rendezvous_shards(ray, sf_dir: str,
                           n_shards: int = RENDEZVOUS_SHARDS):
    """(doc_id, shard): RENDEZVOUS (highest-random-weight) sharding —
    each doc goes to the shard with the max md5(doc_id # shard) score
    (Thaler-Ravishankar '98). The routing rule a stateful stage uses
    when shards must survive resizing with minimal movement (adding a
    shard only steals 1/(n+1) of keys — unlike mod-N, which remaps
    nearly everything); the crawler's host->shard map is the mod-N
    special case, this is the general tool. Pure per-batch map, no
    exchange; hash-green via the identical SQL argmax."""
    ds = _docs(ray, sf_dir, ["doc_id"])

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        best = np.zeros(len(ids), dtype=np.int64)
        best_score = np.zeros(len(ids), dtype=np.uint64)
        for s in range(n_shards):
            sc = np.fromiter(
                (int(hashlib.md5(f"{d}#{s}".encode()).hexdigest()[:16],
                     16) for d in ids),
                dtype=np.uint64, count=len(ids))
            win = sc > best_score  # strict: equal scores keep the
            best[win] = s          # LOWER shard (the SQL tie rule)
            best_score[win] = sc[win]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "shard": pa.array(best, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow").sort("doc_id")


DOCS_RENDEZVOUS_SQL = f"""
WITH scored AS (
  SELECT doc_id, shard,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#'
                             || CAST(shard AS VARCHAR)), 1, 16))::UBIGINT
             AS score
  FROM documents
  CROSS JOIN (SELECT unnest(generate_series(0,
                  {RENDEZVOUS_SHARDS - 1})) AS shard)),
ranked AS (
  SELECT doc_id, shard,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, shard) AS rn
  FROM scored)
SELECT doc_id, CAST(shard AS BIGINT) AS shard
FROM ranked WHERE rn = 1 ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
def _distinct_source_tokens(ray, sf_dir: str):
    """Distributed distinct (source, token) pairs — per-batch set
    combiner, bucketed distinct merge; the exchange moves one row per
    distinct pair per batch, never the token stream."""
    from ..io_utils import parquet_column_bytes
    from ..stages.aggregates import hash_bucket_aggregate

    ds = _docs(ray, sf_dir, ["source", "text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        seen = set()
        srcs = batch.column("source").to_pylist()
        for src, t in zip(srcs, batch.column("text").to_pylist()):
            for tok in tokenize(t.lower()):
                seen.add((src, tok))
        return pd.DataFrame({"source": [s for s, _ in seen],
                             "token": [t for _, t in seen]})

    return hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source", "token"],
        lambda df: df.drop_duplicates(["source", "token"]),
        n_rows=parquet_column_bytes(f"{sf_dir}/documents.parquet",
                                    "text") // 2)


def sources_token_jaccard(ray, sf_dir: str):
    """(source_a, source_b, n_common, n_a, n_b): corpus-overlap matrix —
    for every source pair, the distinct-token intersection size plus
    each side's vocabulary size (Jaccard = n_common/(n_a+n_b-n_common),
    left to the caller as exact integers). The corpus-similarity audit a
    mixture designer runs before setting sampling weights.

    Scale shape: ONE distinct (source, token) build; intersections come
    from a token-keyed bucket exchange where each bucket emits per-pair
    partial counts (vectorized pandas self-merge per token group), so
    the pair table — |sources|^2 rows — is the only thing that leaves;
    vocab sizes are a per-source count over the same distinct table."""
    from ..stages.aggregates import hash_bucket_aggregate

    st = _distinct_source_tokens(ray, sf_dir).materialize()

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "token" not in df.columns:  # map_groups empties
            return pd.DataFrame({
                "source_a": pd.Series([], dtype=str),
                "source_b": pd.Series([], dtype=str),
                "n_common": pd.Series([], dtype="int64")})
        m = df.merge(df, on="token")
        m = m[m["source_x"] < m["source_y"]]
        g = pd.DataFrame({"source_a": m["source_x"],
                          "source_b": m["source_y"],
                          "n_common": np.ones(len(m), dtype="int64")})
        return g.groupby(["source_a", "source_b"], as_index=False).sum()

    # token-keyed buckets: all sources holding a token meet in one task
    pairs = hash_bucket_aggregate(
        st, ["token"], lambda df: df,
        merge=pair_partial,
        n_rows=max(1, st.count())).to_pandas()
    pairs = (pairs.groupby(["source_a", "source_b"], as_index=False)
                  .agg(n_common=("n_common", "sum")))

    def size_partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "source" not in b.columns:  # map_groups empties
            return pd.DataFrame({"source": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype="int64")})
        return (b.assign(n=np.ones(len(b), dtype="int64"))
                 .groupby("source", as_index=False)[["n"]].sum())

    sizes = st.map_batches(size_partial,
                           batch_format="pandas").to_pandas()
    sizes = dict(sizes.groupby("source")["n"].sum())

    pairs["n_a"] = pairs["source_a"].map(sizes).astype("int64")
    pairs["n_b"] = pairs["source_b"].map(sizes).astype("int64")
    pairs["n_common"] = pairs["n_common"].astype("int64")
    return (pairs.sort_values(["source_a", "source_b"])
                 .reset_index(drop=True))


SOURCES_TOKEN_JACCARD_SQL = f"""
WITH t AS (
  SELECT DISTINCT source, unnest(str_split_regex(
      regexp_replace(lower(text), '^{SQL_WS_CLASS}+|{SQL_WS_CLASS}+$',
                     '', 'g'),
      '{SQL_WS_CLASS}+')) AS token
  FROM documents),
tt AS (SELECT * FROM t WHERE token != ''),
sizes AS (SELECT source, COUNT(*) AS n FROM tt GROUP BY source)
SELECT a.source AS source_a, b.source AS source_b,
       COUNT(*) AS n_common,
       ANY_VALUE(sa.n) AS n_a, ANY_VALUE(sb.n) AS n_b
FROM tt a JOIN tt b ON a.token = b.token AND a.source < b.source
JOIN sizes sa ON sa.source = a.source
JOIN sizes sb ON sb.source = b.source
GROUP BY a.source, b.source
ORDER BY source_a, source_b
"""


# ---------------------------------------------------------------------------
def sources_ttr(ray, sf_dir: str):
    """(source, n_tokens, n_types): per-source lexical diversity — total
    token count and distinct-token (type) count, the type/token-ratio
    inputs corpus QC tracks per domain (the ratio itself is left as two
    exact integers). Token totals are a pure combiner sum; types reuse
    the distributed distinct (source, token) build."""
    from ray.data.aggregate import Sum

    ds = _docs(ray, sf_dir, ["source", "text"])

    def tok_partial(batch: pa.Table) -> pd.DataFrame:
        srcs = batch.column("source").to_pylist()
        n = [len(tokenize(t.lower()))
             for t in batch.column("text").to_pylist()]
        return (pd.DataFrame({"source": srcs,
                              "n_tokens": pd.Series(n, dtype="int64")})
                .groupby("source", as_index=False).sum())

    totals = (ds.map_batches(tok_partial, batch_format="pyarrow")
                .groupby("source")
                .aggregate(Sum("n_tokens", alias_name="n_tokens"))
                .to_pandas())

    st = _distinct_source_tokens(ray, sf_dir)

    def type_partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "source" not in b.columns:  # map_groups empties
            return pd.DataFrame({"source": pd.Series([], dtype=str),
                                 "n_types": pd.Series([], dtype="int64")})
        return (b.assign(n_types=np.ones(len(b), dtype="int64"))
                 .groupby("source", as_index=False)[["n_types"]].sum())

    types = st.map_batches(type_partial,
                           batch_format="pandas").to_pandas()
    types = types.groupby("source", as_index=False).sum()

    out = totals.merge(types, on="source")
    out["n_tokens"] = out["n_tokens"].astype("int64")
    out["n_types"] = out["n_types"].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


SOURCES_TTR_SQL = f"""
WITH t AS (
  SELECT source, unnest(str_split_regex(
      regexp_replace(lower(text), '^{SQL_WS_CLASS}+|{SQL_WS_CLASS}+$',
                     '', 'g'),
      '{SQL_WS_CLASS}+')) AS token
  FROM documents),
tt AS (SELECT * FROM t WHERE token != '')
SELECT source, COUNT(*) AS n_tokens,
       COUNT(DISTINCT token) AS n_types
FROM tt GROUP BY source ORDER BY source
"""


# --- skip-gram co-occurrence (word2vec/PMI table prep) ----------------------
SKIPGRAM_WINDOW = 3


def docs_skipgram_counts(ray, sf_dir: str):
    """(w1, w2, n): corpus skip-gram co-occurrence counts — every
    ORDERED token pair within a forward window of {W} positions (the
    count table word2vec/GloVe/PMI feature pipelines are built from;
    doc_top_terms is its unigram margin, docs_bigram_lm_score its
    W=1 diagonal). Scale shape: per-batch the token stream is
    FLATTENED once (one concatenated array + doc-id run-lengths), the
    {W} window offsets become {W} vectorized shifted-pair selections
    masked by same-doc, and a pandas groupby reduces the batch to
    <= vocab^2 partial rows BEFORE the exchange; the bucketed combine
    then merges partials per (w1, w2) — the token stream itself never
    shuffles. Output is vocab-bounded, not corpus-bounded."""
    from ..io_utils import parquet_column_bytes
    from ..stages.aggregates import hash_bucket_aggregate

    W = SKIPGRAM_WINDOW
    # distinct-pair bound for the fan-out: content volume over token
    # width is an upper bound on distinct pairs a batch can emit
    pair_bound = parquet_column_bytes(
        f"{sf_dir}/documents.parquet", "text") // 4
    ds = _docs(ray, sf_dir, ["text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        texts = batch.column("text").to_pylist()
        toks_per_doc = [tokenize(t) for t in texts]
        lens = np.array([len(x) for x in toks_per_doc], dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"w1": pd.Series([], dtype=str),
                                 "w2": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype="int64")})
        flat = np.array([w for toks in toks_per_doc for w in toks],
                        dtype=object)
        did = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
        w1s, w2s = [], []
        for d in range(1, W + 1):
            if len(flat) <= d:
                break
            same = did[:-d] == did[d:]
            w1s.append(flat[:-d][same])
            w2s.append(flat[d:][same])
        if not w1s:
            return pd.DataFrame({"w1": pd.Series([], dtype=str),
                                 "w2": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype="int64")})
        g = pd.DataFrame({"w1": np.concatenate(w1s),
                          "w2": np.concatenate(w2s)})
        g["n"] = np.ones(len(g), dtype="int64")
        return g.groupby(["w1", "w2"], as_index=False).sum()

    out = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["w1", "w2"],
        lambda df: df.groupby(["w1", "w2"], as_index=False).sum(),
        n_rows=pair_bound)
    return out.sort(["w1", "w2"])


DOCS_SKIPGRAM_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(str_split_regex({SQL_TRIM_TEXT}, '{SQL_WS_CLASS}+')) AS token,
         unnest(generate_series(
             1, len(str_split_regex({SQL_TRIM_TEXT}, '{SQL_WS_CLASS}+'))))
           AS pos
  FROM documents),
tok2 AS (SELECT doc_id, pos, token FROM toks WHERE token != '')
SELECT a.token AS w1, b.token AS w2, CAST(COUNT(*) AS BIGINT) AS n
FROM tok2 a JOIN tok2 b
  ON a.doc_id = b.doc_id
 AND b.pos BETWEEN a.pos + 1 AND a.pos + {SKIPGRAM_WINDOW}
GROUP BY w1, w2 ORDER BY w1, w2
"""


# ---------------------------------------------------------------------------
# A deterministic "trained" linear classifier over hashed features: the
# weight of bucket b is a pure function of b (Knuth multiplicative mix mod
# a small prime, centered), so the SAME model exists in both engines with
# no weight file to ship. The point is the INFERENCE SHAPE a quality-
# classifier pass runs at 100 TB: the weight vector is put in the object
# store ONCE (ray.put) and every scoring actor loads it in __init__ —
# never re-shipped per batch; scoring is a pure streaming map_batches
# (no exchange at all). All-integer arithmetic -> bit-exact oracle.
LOGREG_DIM = FEATURE_HASH_DIM
LOGREG_MOD = 1997            # weight = (b*2654435761) % 1997 - 998
LOGREG_MIX = 2654435761      # Knuth's 2^32 / golden ratio
LOGREG_BIAS = -4200


def logreg_weights(dim: int = LOGREG_DIM) -> np.ndarray:
    b = np.arange(dim, dtype=np.int64)
    return (b * LOGREG_MIX) % LOGREG_MOD - LOGREG_MOD // 2


def docs_logreg_score(ray, sf_dir: str, dim: int = LOGREG_DIM,
                      concurrency: int = 2):
    """(doc_id, score, positive): linear-model document scoring over
    hashing-trick features — score = bias + sum over token instances of
    w[md5(token) % dim], positive = score > 0. The model-inference
    stage of a corpus quality filter, expressed Ray-Data-first:
    broadcast weights + actor pool, one pass, no shuffle (the final
    sort is presentation order only)."""
    w_ref = ray.put(logreg_weights(dim))
    ds = _docs(ray, sf_dir, ["doc_id", "text"])

    class LogregScorer:
        def __init__(self):
            self.w = ray.get(w_ref)  # model fetched ONCE per actor
            self.dim = len(self.w)
            self.memo: dict[str, int] = {}

        def _bucket(self, tok: str) -> int:
            b = self.memo.get(tok)
            if b is None:
                b = int(hashlib.md5(tok.encode()).hexdigest()[:8],
                        16) % self.dim
                self.memo[tok] = b
            return b

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch.column("text").to_pylist()
            scores = np.empty(len(texts), dtype=np.int64)
            for i, tx in enumerate(texts):
                toks = tokenize(tx.lower())
                if toks:
                    idx = np.fromiter((self._bucket(t) for t in toks),
                                      dtype=np.int64, count=len(toks))
                    scores[i] = LOGREG_BIAS + int(self.w[idx].sum())
                else:
                    scores[i] = LOGREG_BIAS
            return pa.table({
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "score": pa.array(scores, pa.int64()),
                "positive": pa.array(scores > 0, pa.bool_())})

    return ds.map_batches(LogregScorer, batch_format="pyarrow",
                          batch_size=1024,
                          concurrency=concurrency).sort("doc_id")


DOCS_LOGREG_SCORE_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest(str_split_regex(
      regexp_replace(lower(text), '^{SQL_WS_CLASS}+|{SQL_WS_CLASS}+$',
                     '', 'g'),
      '{SQL_WS_CLASS}+')) AS token
  FROM documents),
scored AS (
  SELECT doc_id,
         SUM(({LOGREG_MIX} * (('0x' || substr(md5(token), 1, 8))::BIGINT
                              % {LOGREG_DIM})) % {LOGREG_MOD}
             - {LOGREG_MOD} // 2) AS s
  FROM t WHERE token != '' GROUP BY doc_id)
SELECT d.doc_id,
       CAST({LOGREG_BIAS} + COALESCE(s, 0) AS BIGINT) AS score,
       ({LOGREG_BIAS} + COALESCE(s, 0)) > 0 AS positive
FROM documents d LEFT JOIN scored USING (doc_id)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
WSAMPLE_K = 100


def docs_weighted_sample(ray, sf_dir: str, k: int = WSAMPLE_K):
    """(doc_id, n_chars): EXACT-k weighted sample without replacement —
    longer documents proportionally likelier — by the log-free variant
    of Efraimidis-Spirakis priority sampling: key = h(doc_id) / weight
    with h = the first 13 md5 hex digits (52 bits, exactly
    representable in a double) and weight = n_chars; keep the k
    SMALLEST keys. h/w is one IEEE division both engines compute
    identically (no ln(u), whose last-ulp could differ between libm
    and DuckDB and flip a near-tie), ties broken by doc_id. Scale
    shape: per-batch LOCAL bottom-k, then a global sort+limit over the
    O(blocks x k) survivors — the corpus never moves; zero-weight rows
    are excluded on both sides."""
    ds = _docs(ray, sf_dir, ["doc_id", "n_chars"])

    def local_bottomk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        w = batch.column("n_chars").to_numpy(zero_copy_only=False)
        h = np.array([int(p[:13], 16)
                      for p in _md5_priorities(ids)], dtype=np.float64)
        with np.errstate(divide="ignore"):
            key = h / w.astype(np.float64)
        ok = w > 0
        order = np.argsort(key, kind="mergesort")
        keep = order[ok[order]][:k]
        t = batch.take(pa.array(keep, pa.int64()))
        return t.append_column(
            "wkey", pa.array(key[keep], pa.float64()))

    out = (ds.map_batches(local_bottomk, batch_format="pyarrow")
             .sort(["wkey", "doc_id"]).limit(k)
             .map_batches(lambda t: t.drop_columns(["wkey"]),
                          batch_format="pyarrow"))
    return out.sort("doc_id")


DOCS_WEIGHTED_SAMPLE_SQL = f"""
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars FROM documents
  WHERE n_chars > 0
  ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
           / CAST(n_chars AS DOUBLE),
           doc_id
  LIMIT {WSAMPLE_K})
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
RANGE_PARTS = 8


def docs_range_partition(ray, sf_dir: str, k: int = RANGE_PARTS,
                         out_dir: str | None = None):
    """(partition, n_docs, min_chars, max_chars): equi-depth RANGE
    partitioning of documents by (n_chars, doc_id) into ``k`` clustered
    partitions — the sort-free clustered-write primitive. NTILE's
    remainder rule (first n % k partitions get one extra row) so the
    layout is SQL-checkable.

    Scale shape: a global sort is the expensive way to cluster output;
    instead the k-1 boundary rows are found by the iterative
    partition-count rank-select (O(log) streamed passes moving per-bin
    summaries only), then ONE map pass assigns each row its partition
    id by binary search against the k-1 broadcast boundaries, and the
    clustered parquet write is partitioned by that id (resumable: a
    failed run re-does only missing partition dirs). The composite
    (n_chars, doc_id) order is encoded as one int64 key
    (n_chars << 32 | doc_id) — exact while both fit 31 bits; an id
    space past 2^32 would widen the key to two rank-select passes.
    """
    import shutil

    from ..io_utils import parquet_num_rows as _nrows
    from ..stages.aggregates import int_rank_select

    n = _nrows(f"{sf_dir}/documents.parquet")
    ds = _docs(ray, sf_dir, ["doc_id", "n_chars"])

    def keyed(t: pa.Table) -> pa.Table:
        nc = t.column("n_chars").to_numpy(zero_copy_only=False)
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(did.astype(np.int64)),
            "n_chars": pa.array(nc.astype(np.int64)),
            "key": pa.array((nc.astype(np.int64) << 32)
                            | did.astype(np.int64))})

    kds = ds.map_batches(keyed, batch_format="pyarrow")

    # NTILE boundary ranks: first n % k partitions hold q+1 rows
    q, r = divmod(n, k)
    ranks = {i: i * q + min(i, r) for i in range(1, k)
             if i * q + min(i, r) >= 1}
    cuts = int_rank_select(kds, ranks, col="key")
    boundaries = np.array([cuts[i] for i in sorted(cuts)],
                          dtype=np.int64)

    def assign(t: pa.Table) -> pa.Table:
        key = t.column("key").to_numpy(zero_copy_only=False)
        pid = np.searchsorted(boundaries, key, side="left").astype(
            np.int64)
        return pa.table({
            "partition": pa.array(pid),
            "doc_id": t.column("doc_id"),
            "n_chars": t.column("n_chars")})

    parts = kds.map_batches(assign, batch_format="pyarrow")

    # the clustered write: one directory per key-range partition
    if out_dir is None:
        out_dir = os.path.join(corpus_cache_dir(sf_dir), "range_part")
    shutil.rmtree(out_dir, ignore_errors=True)
    parts.write_parquet(out_dir, partition_cols=["partition"])

    from ray.data.aggregate import Max, Min, Sum

    stats = parts.map_batches(
        lambda t: pa.table({
            "partition": t.column("partition"),
            "n_docs": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            "n_chars": t.column("n_chars")}),
        batch_format="pyarrow")
    return (stats.groupby("partition")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Min("n_chars", alias_name="min_chars"),
                       Max("n_chars", alias_name="max_chars"))
            .sort("partition"))


DOCS_RANGE_PARTITION_SQL = f"""
WITH t AS (
  SELECT n_chars,
         NTILE({RANGE_PARTS}) OVER (ORDER BY n_chars, doc_id) - 1
             AS partition
  FROM documents)
SELECT CAST(partition AS BIGINT) AS partition,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM t GROUP BY partition ORDER BY partition
"""


def docs_ipc_roundtrip(ray, sf_dir: str):
    """(doc_id, lang, source, n_chars, text) exported through the Arrow
    IPC stream byte sink (sinks/ipc.py) and re-ingested — the SEVENTH
    byte format, VALUE-CHECKED against the documents table itself; IPC
    is Arrow's own wire format, so the roundtrip is zero-copy on both
    sides and types survive exactly."""
    from ..sinks.complete import ensure_complete_set
    from ..sinks.ipc import read_ipc, write_ipc

    out = os.path.join(corpus_cache_dir(sf_dir), "docs_ipc")
    cols = ["doc_id", "lang", "source", "n_chars", "text"]
    ensure_complete_set(
        out, ".arrows",
        lambda: write_ipc(_docs(ray, sf_dir, cols), out,
                          cols).materialize())
    return (read_ipc(ray, out)
            .map_batches(lambda t: t.select(cols),
                         batch_format="pyarrow")
            .sort("doc_id"))


DOCS_IPC_ROUNDTRIP_SQL = """
SELECT doc_id, lang, source, n_chars, text FROM documents ORDER BY doc_id
"""


def docs_schema_evolution(ray, sf_dir: str):
    """(doc_id, lang, text, source, n_chars): SCHEMA-EVOLUTION read —
    a v1 archive (doc_id, lang, text; written before `source`/`n_chars`
    existed, narrow int32 ids) unions with the current v2 table; v1
    rows NULL-fill the added columns and the id column widens back to
    int64 (UNION ALL BY NAME semantics, the read-side contract every
    long-lived 100-TB corpus needs when old shards predate the schema).

    The two versions derive deterministically from the documents table
    (even doc_ids = v1 era, odd = v2) so the oracle can reproduce the
    split; alignment is one vectorized map per input
    (io_utils.union_by_name) and the union is metadata-only."""
    from ..io_utils import union_by_name

    import pyarrow.compute as pc

    def _parity(t: pa.Table, want: int) -> pa.Table:
        m = pc.equal(pc.bit_wise_and(t.column("doc_id"), 1), want)
        return t.filter(m)

    v1 = (_docs(ray, sf_dir, ["doc_id", "lang", "text"])
          .map_batches(
              lambda t: (lambda s: pa.table({
                  "doc_id": s.column("doc_id").cast(pa.int32()),
                  "lang": s.column("lang"),
                  "text": s.column("text")}))(_parity(t, 0)),
              batch_format="pyarrow"))
    v2 = (_docs(ray, sf_dir,
                ["doc_id", "lang", "text", "source", "n_chars"])
          .map_batches(lambda t: _parity(t, 1),
                       batch_format="pyarrow"))

    sch1 = pa.schema([("doc_id", pa.int32()), ("lang", pa.string()),
                      ("text", pa.string())])
    sch2 = pa.schema([("doc_id", pa.int64()), ("lang", pa.string()),
                      ("text", pa.string()), ("source", pa.string()),
                      ("n_chars", pa.int64())])
    return union_by_name([v1, v2], schemas=[sch1, sch2]).sort("doc_id")


DOCS_SCHEMA_EVOLUTION_SQL = """
SELECT doc_id, lang, text,
       CAST(NULL AS VARCHAR) AS source,
       CAST(NULL AS BIGINT) AS n_chars
FROM documents WHERE doc_id % 2 = 0
UNION ALL
SELECT doc_id, lang, text, source, n_chars
FROM documents WHERE doc_id % 2 = 1
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
KFOLD_K = 5


def docs_kfold(ray, sf_dir: str, k: int = KFOLD_K):
    """(fold, source, n_docs): K-FOLD cross-validation assignment —
    fold = first 8 md5 hex digits of 'fold:<doc_id>' as an integer
    mod k (a pure function of the id: stable under re-runs, re-shards
    and cluster shape), summarized per (fold, source) so the oracle
    checks both the assignment AND its stratification balance. Pure
    streaming combiner + one tiny grouped merge — no shuffle of the
    doc stream."""
    from ray.data.aggregate import Sum

    ds = _docs(ray, sf_dir, ["doc_id", "source"])

    def f(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("doc_id").to_pylist()
        fold = np.array(
            [int(hashlib.md5(f"fold:{i}".encode()).hexdigest()[:8], 16)
             % k for i in ids], dtype=np.int64)
        g = pd.DataFrame({
            "fold": fold,
            "source": batch.column("source").to_pylist(),
            "n_docs": np.ones(len(ids), dtype="int64")})
        return g.groupby(["fold", "source"], as_index=False).sum()

    return (ds.map_batches(f, batch_format="pyarrow")
            .groupby(["fold", "source"])
            .aggregate(Sum("n_docs", alias_name="n_docs"))
            .sort(["fold", "source"]))


DOCS_KFOLD_SQL = f"""
SELECT CAST(CAST(('0x' || SUBSTR(md5('fold:' || CAST(doc_id AS VARCHAR)),
                                 1, 8)) AS BIGINT) % {KFOLD_K}
            AS BIGINT) AS fold,
       source,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY 1, 2
ORDER BY fold, source
"""


# ---------------------------------------------------------------------------
BOOL_QUERY_TERMS = ("hash", "join", "sort")  # conjunctive (AND) query


def docs_boolean_search(ray, sf_dir: str,
                        terms: tuple = BOOL_QUERY_TERMS):
    """(doc_id, n_hits): CONJUNCTIVE BOOLEAN SEARCH — documents whose
    token set contains ALL query terms, with the total occurrence count
    of the terms as a secondary signal (the AND-query primitive under
    every retrieval stack, sharing the repo's ONE canonical tokenizer
    with BM25/tf-idf/the inverted index).

    Scale shape: pure streaming map_batches — each batch tokenizes,
    tests membership and emits only matching ids; no shuffle, no state,
    no index needed for a fixed query (the indexed path is
    docs_inverted_index)."""
    ds = _docs(ray, sf_dir, ["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_n = [], []
        for i, txt in zip(ids, batch.column("text").to_pylist()):
            toks = tokenize(txt)
            counts = [toks.count(t) for t in terms]
            if all(c > 0 for c in counts):
                out_id.append(i)
                out_n.append(sum(counts))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "n_hits": pa.array(out_n, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow").sort("doc_id")


def _bool_sql() -> str:
    toks = (f"regexp_split_to_array({SQL_TRIM_TEXT},"
            f" '{SQL_WS_CLASS}+')")
    conds = " AND ".join(
        f"list_contains({toks}, '{t}')" for t in BOOL_QUERY_TERMS)
    hits = " + ".join(
        f"len(list_filter({toks}, x -> x = '{t}'))"
        for t in BOOL_QUERY_TERMS)
    return f"""
SELECT doc_id, CAST({hits} AS BIGINT) AS n_hits
FROM documents
WHERE {conds}
ORDER BY doc_id
"""


DOCS_BOOLEAN_SEARCH_SQL = _bool_sql()


# ---------------------------------------------------------------------------
CATALOG_TABLES = ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents",
                  "embeddings")


def catalog_tables(ray, sf_dir: str):
    """(table_name, n_rows, n_cols): the CATALOG/DISCOVERY op — inventory
    every table in a dataset directory from parquet FOOTERS ONLY (row
    counts and schemas are metadata; zero data pages are read), the
    first thing any engine does against an unfamiliar 100-TB lake.
    Footer reads are O(tables), so this runs on the driver by design —
    a million-file lake would map the footer reads over a Dataset of
    paths instead (same sums, distributed)."""
    import pyarrow.parquet as pq

    from ..io_utils import parquet_num_rows

    rows = []
    for t in CATALOG_TABLES:
        path = f"{sf_dir}/{t}.parquet"
        rows.append((t, parquet_num_rows(path),
                     len(pq.read_schema(path).names)))
    rows.sort()
    return pd.DataFrame({
        "table_name": pd.Series([r[0] for r in rows], dtype=str),
        "n_rows": pd.Series([r[1] for r in rows], dtype="int64"),
        "n_cols": pd.Series([r[2] for r in rows], dtype="int64")})


CATALOG_TABLES_SQL = "\nUNION ALL\n".join(
    f"SELECT '{t}' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,"
    f" (SELECT CAST(COUNT(*) AS BIGINT) FROM information_schema.columns"
    f" WHERE table_name = '{t}') AS n_cols FROM {t}"
    for t in CATALOG_TABLES) + "\nORDER BY table_name"


# ---------------------------------------------------------------------------
GREEDY_COVER_K = 5
GREEDY_COVER_N = 3        # coverage unit: token 3-grams (unigrams are
                          # too few on a small vocab — one doc covers all)


def docs_greedy_cover(ray, sf_dir: str, k: int = GREEDY_COVER_K,
                      n: int = GREEDY_COVER_N):
    """(rank, doc_id, new_tokens): GREEDY MAX-COVERAGE data selection —
    pick ``k`` documents one at a time, each maximizing the number of
    DISTINCT token ``n``-grams not covered by earlier picks (ties to the
    smaller doc_id; stop early when no document adds a new gram). The
    classical (1 - 1/e) coreset/facility-location selection a training
    mix uses to seed a diverse subset — a greedy TRAJECTORY, so like
    knn_mmr it is value-checked by replaying every selection step in
    unrolled SQL CTEs.

    Scale shape: the distinct (doc_id, token) posting table is built
    ONCE (per-doc distinct explode; a doc lives in one row, so
    per-batch distinct is global) and materialized; each of the <= k
    rounds broadcasts the covered-token set (<= k * tokens-per-doc
    strings via ray.put — never the corpus), counts surviving postings
    per doc with mergeable per-batch partials, and reduces the
    per-bucket argmax rows so the driver only ever sees O(buckets)
    candidates. The winner's token list (one doc) is the only other
    driver transfer per round."""
    import pyarrow.compute as pc

    from ..stages.aggregates import hash_bucket_aggregate

    ds = _docs(ray, sf_dir, ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        toks, docs = [], []
        for i, t in zip(ids, batch.column("text").to_pylist()):
            tk = tokenize(t)
            if len(tk) < n:
                continue
            for g in {" ".join(tk[j:j + n])
                      for j in range(len(tk) - n + 1)}:
                toks.append(g)
                docs.append(i)
        return pa.table({"doc_id": pa.array(docs, pa.int64()),
                         "token": pa.array(toks, pa.string())})

    posts = ds.map_batches(explode,
                           batch_format="pyarrow").materialize()
    n_posts = posts.count()

    def best_row(df: pd.DataFrame) -> pd.DataFrame:
        # per-bucket argmax (count desc, doc_id asc) over merged partials
        g = df.groupby("doc_id", as_index=False)["c"].sum()
        g = g.sort_values(["c", "doc_id"], ascending=[False, True],
                          kind="mergesort")
        return g.head(1)

    covered: set[str] = set()
    picks: list[tuple[int, int, int]] = []
    for r in range(k):
        cov_ref = ray.put(covered)

        def count_new(t: pa.Table, _ref=cov_ref) -> pd.DataFrame:
            cov = ray.get(_ref)
            toks = t.column("token").to_pylist()
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            keep = np.fromiter((tok not in cov for tok in toks),
                               dtype=bool, count=len(toks))
            g = pd.DataFrame({"doc_id": ids[keep].astype("int64"),
                              "c": np.ones(int(keep.sum()),
                                           dtype="int64")})
            return g.groupby("doc_id", as_index=False).sum()

        cands = hash_bucket_aggregate(
            posts.map_batches(count_new, batch_format="pyarrow"),
            ["doc_id"],
            lambda df: df.groupby("doc_id", as_index=False).sum(),
            merge=best_row, n_rows=n_posts).to_pandas()  # O(buckets)
        if len(cands) == 0:
            break
        cands = cands.sort_values(["c", "doc_id"],
                                  ascending=[False, True],
                                  kind="mergesort")
        winner = int(cands["doc_id"].iloc[0])
        gain = int(cands["c"].iloc[0])
        if gain == 0:
            break
        picks.append((r + 1, winner, gain))
        wtoks = posts.map_batches(
            lambda t, w=winner: t.filter(pc.equal(t.column("doc_id"),
                                                  w)),
            batch_format="pyarrow").take_all()  # one doc's tokens
        covered |= {row["token"] for row in wtoks}

    return pd.DataFrame({
        "rank": pd.Series([p[0] for p in picks], dtype="int64"),
        "doc_id": pd.Series([p[1] for p in picks], dtype="int64"),
        "new_tokens": pd.Series([p[2] for p in picks], dtype="int64")})


def _greedy_cover_sql(k: int = GREEDY_COVER_K,
                      n: int = GREEDY_COVER_N) -> str:
    """Unrolled greedy-selection CTE chain (the knn_mmr precedent: the
    oracle replays the trajectory, not just the final set)."""
    parts = [f"""
WITH toks AS (
  SELECT doc_id, str_split_regex({SQL_TRIM_TEXT}, '{SQL_WS_CLASS}+')
             AS tk
  FROM documents),
pos AS (
  SELECT doc_id, tk,
         unnest(generate_series(1, len(tk) - {n - 1})) AS i
  FROM toks WHERE len(tk) >= {n}),
p AS (
  SELECT DISTINCT doc_id,
         array_to_string(tk[i:i+{n - 1}], ' ') AS token
  FROM pos)"""]
    for r in range(1, k + 1):
        not_in = ""
        if r > 1:
            prev = " UNION ".join(
                f"SELECT token FROM cov{j}" for j in range(1, r))
            not_in = f" WHERE token NOT IN ({prev})"
        parts.append(f"""
w{r} AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS c FROM p{not_in}
        GROUP BY doc_id ORDER BY c DESC, doc_id LIMIT 1),
cov{r} AS (SELECT token FROM p
          WHERE doc_id = (SELECT doc_id FROM w{r}))""")
    sel = "\nUNION ALL\n".join(
        f'SELECT CAST({r} AS BIGINT) AS "rank", doc_id,'
        f" c AS new_tokens FROM w{r}"
        for r in range(1, k + 1))
    return (",".join(parts) + "\nSELECT * FROM (\n" + sel
            + "\n) ORDER BY rank")


DOCS_GREEDY_COVER_SQL = _greedy_cover_sql()


# ---------------------------------------------------------------------------
BOILER_N = 5            # gram width defining a boilerplate candidate
BOILER_MIN_SRC = 8      # only sources with >= this many docs
BOILER_MIN_DOCS = 2     # gram must appear in >= 2 docs of the source
BOILER_SHARE = 10       # ... and in >= 1/10 of the source's docs


def docs_boilerplate(ray, sf_dir: str, n: int = BOILER_N):
    """(doc_id, n_grams, n_boiler, boiler_bp): WITHIN-SOURCE BOILERPLATE
    share — a token 5-gram is boilerplate for a source when it repeats
    across >= 1/10 of that source's documents (>= 2 docs, sources with
    >= 8 docs only): the nav-bar / footer signal CCNet-style pipelines
    strip before training. Each doc reports how many of its DISTINCT
    grams are boilerplate, in integer basis points.

    Scale shape: one per-doc distinct gram explode (docs live in one
    row, so per-batch distinct is global) carrying the doc's gram
    total; (source, gram) doc-frequencies by ONE bucketed mergeable
    count; the tiny per-source doc totals are a broadcast dict; the
    boilerplate set joins back against the gram table with one
    two-key hash join; per-doc counts by one more bucketed sum.
    Nothing driver-side but the O(sources) totals."""
    from ..stages.aggregates import (
        hash_bucket_aggregate,
        join_partitions_for,
        normalize_for_join,
    )

    ds = _docs(ray, sf_dir, ["doc_id", "source", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        srcs = batch.column("source").to_pylist()
        docs, sources, grams, gtots = [], [], [], []
        for i, s, t in zip(ids, srcs,
                           batch.column("text").to_pylist()):
            tk = tokenize(t)
            if len(tk) < n:
                continue
            gs = {" ".join(tk[j:j + n])
                  for j in range(len(tk) - n + 1)}
            for g in gs:
                docs.append(i)
                sources.append(s)
                grams.append(g)
                gtots.append(len(gs))
        return pa.table({"doc_id": pa.array(docs, pa.int64()),
                         "source": pa.array(sources, pa.string()),
                         "gram": pa.array(grams, pa.string()),
                         "gtot": pa.array(gtots, pa.int64())})

    _G = pa.schema([("doc_id", pa.int64()), ("source", pa.string()),
                    ("gram", pa.string()), ("gtot", pa.int64())])
    grams = normalize_for_join(
        ds.map_batches(explode, batch_format="pyarrow"), _G).materialize()
    n_gr = grams.count()

    # per-source doc totals: O(sources) — safe to fold on the driver
    src_tot = (_docs(ray, sf_dir, ["source"])
               .map_batches(lambda b: b.groupby("source", as_index=False)
                            .size().rename(columns={"size": "nsd"}),
                            batch_format="pandas", batch_size=65536)
               .to_pandas()
               .groupby("source", as_index=False)["nsd"].sum())
    nsd_map = dict(zip(src_tot["source"], src_tot["nsd"].astype(int)))

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "gram"], as_index=False).size()
        return g.rename(columns={"size": "nd"})

    def df_merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "gram"], as_index=False)["nd"].sum()
        nsd = g["source"].map(nsd_map).fillna(0).astype(int)
        keep = ((g["nd"] >= BOILER_MIN_DOCS)
                & (g["nd"] * BOILER_SHARE >= nsd)
                & (nsd >= BOILER_MIN_SRC))
        return g.loc[keep, ["source", "gram"]]

    _B = pa.schema([("source", pa.string()), ("gram", pa.string())])
    boiler = normalize_for_join(
        hash_bucket_aggregate(
            grams.map_batches(
                lambda t: t.select(["doc_id", "source", "gram"]),
                batch_format="pyarrow"),
            ["source", "gram"], df_partial, merge=df_merge,
            n_rows=n_gr),
        _B).materialize()

    # per-doc totals ride the gram rows (gtot is a doc-level constant)
    def doc_tot(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("doc_id", as_index=False)["gtot"].max()

    totals = normalize_for_join(
        hash_bucket_aggregate(
            grams.map_batches(lambda t: t.select(["doc_id", "gtot"]),
                              batch_format="pyarrow"),
            ["doc_id"], doc_tot, n_rows=n_gr),
        pa.schema([("doc_id", pa.int64()),
                   ("gtot", pa.int64())])).materialize()

    nb = boiler.count()
    if nb == 0:
        def zero(t: pa.Table) -> pa.Table:
            g = t.column("gtot").to_numpy(zero_copy_only=False)
            return pa.table({
                "doc_id": t.column("doc_id"),
                "n_grams": pa.array(g.astype(np.int64)),
                "n_boiler": pa.array(np.zeros(len(g), np.int64)),
                "boiler_bp": pa.array(np.zeros(len(g), np.int64))})

        return totals.map_batches(zero,
                                  batch_format="pyarrow").sort("doc_id")

    nparts = join_partitions_for(max(1, min(n_gr, nb)))
    hits = grams.join(boiler, join_type="inner",
                      on=("source", "gram"), num_partitions=nparts)

    def hit_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False).size()
        return g.rename(columns={"size": "n_boiler"})

    def hit_merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("doc_id", as_index=False)["n_boiler"].sum()

    bcounts = normalize_for_join(
        hash_bucket_aggregate(
            hits.map_batches(lambda t: t.select(["doc_id"]),
                             batch_format="pyarrow"),
            ["doc_id"], hit_partial, merge=hit_merge, n_rows=n_gr),
        pa.schema([("doc_id", pa.int64()),
                   ("n_boiler", pa.int64())])).materialize()

    joined = totals.join(
        bcounts, join_type="left_outer", on=("doc_id",),
        num_partitions=join_partitions_for(
            max(1, min(totals.count(), max(bcounts.count(), 1)))))

    def finish(t: pa.Table) -> pa.Table:
        g = t.column("gtot").to_numpy(zero_copy_only=False) \
             .astype(np.int64)
        b = t.column("n_boiler").to_numpy(zero_copy_only=False)
        b = np.nan_to_num(b.astype(np.float64), nan=0).astype(np.int64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_grams": pa.array(g),
            "n_boiler": pa.array(b),
            "boiler_bp": pa.array(10000 * b // np.maximum(g, 1))})

    return joined.map_batches(finish,
                              batch_format="pyarrow").sort("doc_id")


DOCS_BOILERPLATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, source,
         str_split_regex({SQL_TRIM_TEXT}, '{SQL_WS_CLASS}+') AS tk
  FROM documents),
pos AS (
  SELECT doc_id, source, tk,
         unnest(generate_series(1, len(tk) - {BOILER_N - 1})) AS i
  FROM toks WHERE len(tk) >= {BOILER_N}),
g AS (
  SELECT DISTINCT doc_id, source,
         array_to_string(tk[i:i+{BOILER_N - 1}], ' ') AS gram
  FROM pos),
sdocs AS (SELECT source, COUNT(*) AS nsd FROM documents GROUP BY 1),
sg AS (SELECT source, gram, COUNT(*) AS nd FROM g GROUP BY 1, 2),
boiler AS (
  SELECT sg.source, sg.gram FROM sg JOIN sdocs USING (source)
  WHERE nd >= {BOILER_MIN_DOCS} AND nd * {BOILER_SHARE} >= nsd
        AND nsd >= {BOILER_MIN_SRC}),
tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY 1),
hit AS (SELECT g.doc_id, COUNT(*) AS n_boiler
        FROM g JOIN boiler b ON g.source = b.source AND g.gram = b.gram
        GROUP BY 1)
SELECT tot.doc_id, CAST(tot.n_grams AS BIGINT) AS n_grams,
       CAST(COALESCE(hit.n_boiler, 0) AS BIGINT) AS n_boiler,
       CAST((10000 * COALESCE(hit.n_boiler, 0)) // tot.n_grams
            AS BIGINT) AS boiler_bp
FROM tot LEFT JOIN hit USING (doc_id) ORDER BY tot.doc_id
"""


# ---------------------------------------------------------------------------
def docs_hapax_ratio(ray, sf_dir: str):
    """(vocab_size, n_hapax, hapax_bp): HAPAX LEGOMENA share — how much
    of the corpus vocabulary occurs exactly once (Zipf-tail health: a
    synthetic or deduplicated corpus shows a depressed hapax rate,
    OCR noise an inflated one). Integer basis points.

    Scale shape: per-batch token-count partials (the wordcount
    combiner), ONE bucketed exchange keyed by token, per-bucket fold
    to two integers, O(buckets) Sum."""
    from ray.data.aggregate import Sum

    from ..io_utils import parquet_column_bytes
    from ..stages.aggregates import hash_bucket_aggregate

    ds = _docs(ray, sf_dir, ["text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(tokenize(t))
        return pd.DataFrame({"token": list(c.keys()),
                             "n": pd.Series(list(c.values()),
                                            dtype="int64")})

    def resum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("token", as_index=False).sum()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("token")["n"].sum()
        return pd.DataFrame({
            "vocab": [int(len(tot))],
            "hapax": [int((tot.to_numpy() == 1).sum())]})

    tok_bound = parquet_column_bytes(
        f"{sf_dir}/documents.parquet", "text") // 2
    parts = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["token"], resum, merge=fold, n_rows=tok_bound)
    tot = parts.aggregate(Sum("vocab"), Sum("hapax"))
    v = int(tot["sum(vocab)"] or 0)
    h = int(tot["sum(hapax)"] or 0)
    bp = (10000 * h) // v if v else 0
    return pd.DataFrame({"vocab_size": pd.Series([v], dtype="int64"),
                         "n_hapax": pd.Series([h], dtype="int64"),
                         "hapax_bp": pd.Series([bp], dtype="int64")})


DOCS_HAPAX_SQL = f"""
WITH t AS (
  SELECT unnest(str_split_regex({SQL_TRIM_TEXT}, '{SQL_WS_CLASS}+'))
             AS token
  FROM documents),
c AS (SELECT token, COUNT(*) AS n FROM t WHERE token != ''
      GROUP BY token)
SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hapax,
       CAST(CASE WHEN COUNT(*) = 0 THEN 0
                 ELSE (10000 * SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END))
                      // COUNT(*) END AS BIGINT) AS hapax_bp
FROM c
"""


# ---------------------------------------------------------------------------
COVERAGE_KS = (10, 100, 1000)


def docs_vocab_coverage(ray, sf_dir: str, ks=COVERAGE_KS):
    """(k, share_bp, total_tokens): VOCABULARY COVERAGE CURVE — the
    share of all token OCCURRENCES covered by the k most frequent
    types (ties to the lexicographically smaller token), for k in
    {10, 100, 1000}. The Zipf-concentration summary tokenizer and
    vocab-size decisions start from; integer basis points.

    Scale shape: wordcount combiner partials, ONE bucketed exchange
    keyed by token; each bucket emits its LOCAL top-max(ks) rows plus
    a one-row occurrence total (the global top-k is contained in the
    union of per-bucket top-ks — distinct tokens never split across
    buckets), so the driver merges only O(buckets * max(ks)) rows."""
    from ..io_utils import parquet_column_bytes
    from ..stages.aggregates import hash_bucket_aggregate

    kmax = max(ks)
    ds = _docs(ray, sf_dir, ["text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(tokenize(t))
        return pd.DataFrame({"token": list(c.keys()),
                             "n": pd.Series(list(c.values()),
                                            dtype="int64")})

    def resum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("token", as_index=False).sum()

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", as_index=False)["n"].sum()
        total = int(g["n"].sum())
        g = g.sort_values(["n", "token"], ascending=[False, True],
                          kind="mergesort").head(kmax)
        g = g.assign(total=np.int64(0))
        # one extra row carries the bucket's occurrence total
        return pd.concat(
            [g, pd.DataFrame({"token": [""], "n": [0],
                              "total": pd.Series([total],
                                                 dtype="int64")})],
            ignore_index=True)

    tok_bound = parquet_column_bytes(
        f"{sf_dir}/documents.parquet", "text") // 2
    parts = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["token"], resum, merge=local_top,
        n_rows=tok_bound).to_pandas()  # O(buckets * kmax)
    total = int(parts["total"].sum())
    cand = parts[parts["token"] != ""].sort_values(
        ["n", "token"], ascending=[False, True], kind="mergesort")
    csum = cand["n"].to_numpy().cumsum()
    rows = []
    for k in sorted(ks):
        cov = int(csum[min(k, len(csum)) - 1]) if len(csum) else 0
        rows.append((k, (10000 * cov) // total if total else 0, total))
    return pd.DataFrame({
        "k": pd.Series([r[0] for r in rows], dtype="int64"),
        "share_bp": pd.Series([r[1] for r in rows], dtype="int64"),
        "total_tokens": pd.Series([r[2] for r in rows], dtype="int64")})


DOCS_VOCAB_COVERAGE_SQL = f"""
WITH t AS (
  SELECT unnest(str_split_regex({SQL_TRIM_TEXT}, '{SQL_WS_CLASS}+'))
             AS token
  FROM documents),
c AS (SELECT token, COUNT(*) AS n FROM t WHERE token != ''
      GROUP BY token),
tot AS (SELECT SUM(n) AS s FROM c),
r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rk
      FROM c)
SELECT CAST(ks.k AS BIGINT) AS k,
       CAST((10000 * (SELECT COALESCE(SUM(n), 0) FROM r
                      WHERE rk <= ks.k))
            // (SELECT s FROM tot) AS BIGINT) AS share_bp,
       CAST((SELECT s FROM tot) AS BIGINT) AS total_tokens
FROM (VALUES (10), (100), (1000)) AS ks(k) ORDER BY k
"""


# --- per-document n-gram NOVELTY (streaming-corpus ordering signal) ---------
# gram width = functions.hashing.SHINGLE_K (3) — shared with the
# minhash/simhash kernels and the dedup_oracle SQL CTEs
_PROC_TOKEN_CACHE: dict = {}  # one TokenHashCache per worker process


def docs_ngram_novelty(ray, sf_dir: str):
    """(doc_id, n_grams, n_novel, novelty_bp): per-document 3-gram
    novelty — the share (integer basis points) of a doc's DISTINCT
    word-shingle hashes whose FIRST corpus appearance (minimum doc_id)
    is this doc. The incremental-ingest signal a streaming
    training-data pipeline uses to rank late arrivals: a near-duplicate
    of earlier data scores ~0, genuinely new text scores ~10000.

    Scale shape: grams are the VECTORIZED FNV-fold shingle hashes over
    md5 token hashes (``functions.hashing.shingle_hashes`` — no
    per-gram string building; DuckDB replays the identical arithmetic
    via ``md5_number_upper`` + the staged fold, the minhash-oracle
    precedent, so hash semantics match EXACTLY on both engines).
    Only (sh:int64, doc_id) rows shuffle, bucketed BY HASH so each
    bucket resolves first-appearance locally and emits
    O(docs-in-bucket) partial rows carrying BOTH counts (a doc's
    total grams = sum of its per-bucket row counts, so no second text
    pass exists); a final small doc_id groupby sums partials. Text
    never shuffles."""
    from ..functions.hashing import (TokenHashCache,
                                     shingle_hashes_from_token_hashes)
    from ..io_utils import parquet_column_bytes
    from ..stages.aggregates import buckets_for

    ds = _docs(ray, sf_dir, ["doc_id", "text"])
    tok_bound = parquet_column_bytes(
        f"{sf_dir}/documents.parquet", "text") // 8
    B = buckets_for(tok_bound)

    def explode(batch: pa.Table) -> pa.Table:
        # per-process memoized md5 (Zipf vocabulary: the token-hash
        # pass is one factorize + cache probes, not one md5 per token)
        cache = _PROC_TOKEN_CACHE.setdefault(
            "c", TokenHashCache())
        texts = batch.column("text").to_pylist()
        th_lists = cache.hash_token_lists(
            [tokenize(t) for t in texts])
        ids, shs = [], []
        for i, th in zip(batch.column("doc_id").to_pylist(), th_lists):
            sh = shingle_hashes_from_token_hashes(th)
            if len(sh) == 0:
                continue
            ids.append(np.full(len(sh), i, np.int64))
            shs.append(sh.view(np.int64))
        if not ids:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "sh": pa.array([], pa.int64()),
                             "gbucket": pa.array([], pa.int64())})
        sh_all = np.concatenate(shs)
        bk = (sh_all.view(np.uint64) % np.uint64(B)).astype(np.int64)
        return pa.table({"doc_id": pa.array(np.concatenate(ids)),
                         "sh": pa.array(sh_all),
                         "gbucket": pa.array(bk)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "n_grams": pd.Series([], dtype="int64"),
                "n_novel": pd.Series([], dtype="int64")})
        first = g.groupby("sh")["doc_id"].transform("min")
        novel = (g["doc_id"] == first).astype("int64")
        out = (g.assign(novel=novel)
                .groupby("doc_id", as_index=False)
                .agg(n_grams=("sh", "count"), n_novel=("novel", "sum")))
        return out.astype({"doc_id": "int64", "n_grams": "int64",
                           "n_novel": "int64"})

    # finish: sum the per-bucket partials per doc — VECTORIZED inside
    # doc-bucketed groups (one pandas groupby-sum per group, never one
    # map_groups call per doc: 5k one-row groups cost ~10 s of pure
    # per-group overhead, the vectorized form milliseconds)
    from ..io_utils import parquet_num_rows

    n_docs = parquet_num_rows(f"{sf_dir}/documents.parquet")
    B2 = buckets_for(n_docs)

    def add_dbucket(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.append_column(
            "dbucket", pa.array((d % B2).astype(np.int64), pa.int64()))

    def finish_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "n_grams": pd.Series([], dtype="int64"),
                "n_novel": pd.Series([], dtype="int64"),
                "novelty_bp": pd.Series([], dtype="int64")})
        out = (g.groupby("doc_id", as_index=False)
                [["n_grams", "n_novel"]].sum())
        out["novelty_bp"] = (10_000 * out["n_novel"]) // out["n_grams"]
        return out.astype("int64")

    return (ds.map_batches(explode, batch_format="pyarrow")
              .groupby("gbucket")
              .map_groups(per_bucket, batch_format="pandas")
              .map_batches(add_dbucket, batch_format="pyarrow")
              .groupby("dbucket")
              .map_groups(finish_bucket, batch_format="pandas")
              .sort("doc_id"))


def _novelty_sql() -> str:
    from .dedup_oracle import _shingles_cte, _tokens_cte

    return ("WITH" + _tokens_cte() + "," + _shingles_cte()[2:] + """,
 firsts AS (SELECT sh, MIN(doc_id) AS first_doc
            FROM shingles GROUP BY sh)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(10000 * SUM(CASE WHEN f.first_doc = s.doc_id THEN 1
            ELSE 0 END) // COUNT(*) AS BIGINT) AS novelty_bp
FROM shingles s JOIN firsts f ON f.sh = s.sh
GROUP BY s.doc_id ORDER BY s.doc_id
""")


DOCS_NGRAM_NOVELTY_SQL = _novelty_sql()


# --- readability scoring (classic Flesch reading-ease shape) ----------------
def docs_readability(ray, sf_dir: str):
    """(doc_id, n_words, n_sentences, n_syllables, flesch_x1000):
    classic Flesch reading-ease quality signal (Flesch'48 — the public
    readability formula every text-quality stack ships), with the
    deterministic proxies a byte-exact cross-engine check needs:
    sentences = runs of [.!?], syllables = runs of [aeiouy] in the
    lowercased text, words = the shared tokenizer. The score is exact
    integer arithmetic — F*1000 = trunc((206835*S*W - 1015*W^2
    - 84600*Y*S) / (S*W)) — using TRUNCATING division on both engines
    (DuckDB's ``//`` truncates toward zero; Python's floors, so the Ray
    side truncates explicitly).

    Scale shape: one vectorized regex pass per batch, no shuffle — the
    output is O(docs) scalar rows."""
    sent_re = re.compile(r"[.!?]+")
    syl_re = re.compile(r"[aeiouy]+")

    ds = _docs(ray, sf_dir, ["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        n_w, n_s, n_y, fx = [], [], [], []
        for t in batch.column("text").to_pylist():
            w = len(tokenize(t))
            s = len(sent_re.findall(t))
            y = len(syl_re.findall(t.lower()))
            n_w.append(w)
            n_s.append(s)
            n_y.append(y)
            if w == 0 or s == 0:
                fx.append(0)
                continue
            num = 206_835 * s * w - 1_015 * w * w - 84_600 * y * s
            den = s * w
            q = abs(num) // den
            fx.append(q if num >= 0 else -q)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_words": pa.array(n_w, pa.int64()),
            "n_sentences": pa.array(n_s, pa.int64()),
            "n_syllables": pa.array(n_y, pa.int64()),
            "flesch_x1000": pa.array(fx, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow").sort("doc_id")


DOCS_READABILITY_SQL = f"""
WITH c AS (
  SELECT doc_id,
         CASE WHEN {SQL_TRIM_TEXT} = '' THEN 0
              ELSE len(regexp_split_to_array({SQL_TRIM_TEXT},
                   '{SQL_WS_CLASS}+')) END AS w,
         len(regexp_extract_all(text, '[.!?]+')) AS s,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y
  FROM documents)
SELECT doc_id,
       CAST(w AS BIGINT) AS n_words,
       CAST(s AS BIGINT) AS n_sentences,
       CAST(y AS BIGINT) AS n_syllables,
       CAST(CASE WHEN w = 0 OR s = 0 THEN 0
                 ELSE (206835 * s * w - 1015 * w * w - 84600 * y * s)
                      // (s * w) END AS BIGINT) AS flesch_x1000
FROM c ORDER BY doc_id
"""


# --- Gopher quality rules (Rae et al. 2021, public filter set) --------------
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def docs_gopher_filter(ray, sf_dir: str):
    """(doc_id, n_words, n_word_chars, n_symbols, n_stopwords, passes):
    the public Gopher quality-rule subset expressible byte-exactly in
    BOTH engines (Rae et al. 2021 §A1.1, the standard webtext filter
    stack): word count in [50, 100000]; mean word length in [3, 10]
    (as integer cross-multiplication 3W <= C <= 10W); symbol-to-word
    ratio < 0.1 over '#' and '...' occurrences (10*sym < W); and >= 2
    distinct stopwords from the canonical eight. One vectorized text
    pass, no shuffle — O(docs) scalar rows out."""
    stops = set(GOPHER_STOPS)

    ds = _docs(ray, sf_dir, ["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        W, C, S, ST, P = [], [], [], [], []
        for t in batch.column("text").to_pylist():
            toks = tokenize(t)
            w = len(toks)
            c = sum(len(x) for x in toks)
            sym = t.count("#") + t.count("...")
            st = len({x.lower() for x in toks} & stops)
            ok = (50 <= w <= 100_000
                  and 3 * w <= c <= 10 * w
                  and 10 * sym < w
                  and st >= 2)
            W.append(w)
            C.append(c)
            S.append(sym)
            ST.append(st)
            P.append(ok)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_words": pa.array(W, pa.int64()),
            "n_word_chars": pa.array(C, pa.int64()),
            "n_symbols": pa.array(S, pa.int64()),
            "n_stopwords": pa.array(ST, pa.int64()),
            "passes": pa.array(P, pa.bool_())})

    return ds.map_batches(score, batch_format="pyarrow").sort("doc_id")


DOCS_GOPHER_SQL = f"""
WITH c AS (
  SELECT doc_id,
         CASE WHEN {SQL_TRIM_TEXT} = '' THEN []
              ELSE str_split_regex({SQL_TRIM_TEXT}, '{SQL_WS_CLASS}+')
         END AS tk,
         length(text) - length(replace(text, '#', ''))
           + (length(text) - length(replace(text, '...', ''))) // 3
           AS sym
  FROM documents),
m AS (
  SELECT doc_id, len(tk) AS w,
         COALESCE(list_sum(list_transform(tk, x -> length(x))), 0) AS ch,
         sym,
         len(list_distinct(list_filter(
             list_transform(tk, x -> lower(x)),
             x -> x IN {GOPHER_STOPS!r}))) AS st
  FROM c)
SELECT doc_id,
       CAST(w AS BIGINT) AS n_words,
       CAST(ch AS BIGINT) AS n_word_chars,
       CAST(sym AS BIGINT) AS n_symbols,
       CAST(st AS BIGINT) AS n_stopwords,
       (w BETWEEN 50 AND 100000 AND 3 * w <= ch AND ch <= 10 * w
        AND 10 * sym < w AND st >= 2) AS passes
FROM m ORDER BY doc_id
"""


# --- token frequency-of-frequencies spectrum --------------------------------
def docs_freq_spectrum(ray, sf_dir: str):
    """(freq_bucket, n_types): the frequency-of-frequencies spectrum —
    vocabulary types bucketed by floor(log2(occurrences)) (exact
    integer bit-length arithmetic on BOTH engines, so no float log).
    The Zipf diagnostic behind Good-Turing smoothing and corpus-health
    checks: a deduplicated corpus bends the low buckets, boilerplate
    inflates the high ones.

    Scale shape: wordcount partials -> ONE token-keyed bucketed
    exchange -> per-bucket spectrum fold (a handful of integers) ->
    tiny groupby sum."""
    from ..io_utils import parquet_column_bytes
    from ..stages.aggregates import hash_bucket_aggregate

    ds = _docs(ray, sf_dir, ["text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(tokenize(t))
        return pd.DataFrame({"token": list(c.keys()),
                             "n": pd.Series(list(c.values()),
                                            dtype="int64")})

    def resum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("token", as_index=False).sum()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("token")["n"].sum().to_numpy()
        # floor(log2(n)) == bit_length(n) - 1: exact integer
        # arithmetic, no float log on either engine
        lg = np.array([int(x).bit_length() - 1 for x in tot],
                      dtype=np.int64)
        g = pd.DataFrame({"freq_bucket": lg}).groupby(
            "freq_bucket", as_index=False).size()
        return pd.DataFrame({
            "freq_bucket": g["freq_bucket"].astype("int64"),
            "n_types": g["size"].astype("int64")})

    tok_bound = parquet_column_bytes(
        f"{sf_dir}/documents.parquet", "text") // 2
    parts = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["token"], resum, merge=fold, n_rows=tok_bound)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        total = int(g["n_types"].sum())
        if total == 0:  # SQL GROUP BY omits empty buckets — match it
            return pd.DataFrame({
                "freq_bucket": pd.Series([], dtype="int64"),
                "n_types": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "freq_bucket": pd.Series([g["freq_bucket"].iloc[0]],
                                     dtype="int64"),
            "n_types": pd.Series([total], dtype="int64")})

    return (parts.groupby("freq_bucket")
                 .map_groups(finish, batch_format="pandas")
                 .sort("freq_bucket"))


DOCS_FREQ_SPECTRUM_SQL = f"""
WITH toks AS (
  SELECT unnest(str_split_regex({SQL_TRIM_TEXT},
                                '{SQL_WS_CLASS}+')) AS token
  FROM documents WHERE {SQL_TRIM_TEXT} <> ''),
tc AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY token),
sp AS (SELECT length(bin(CAST(n AS BIGINT))) - 1 AS freq_bucket,
              COUNT(*) AS n_types
       FROM tc GROUP BY 1)
SELECT CAST(freq_bucket AS BIGINT) AS freq_bucket,
       CAST(n_types AS BIGINT) AS n_types
FROM sp ORDER BY freq_bucket
"""
