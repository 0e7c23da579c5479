"""DuckDB oracle SQL for the MinHash/LSH/SimHash/winnowing dedup family.

These oracles replicate the Ray kernels (``functions/hashing.py``)
EXACTLY — bit-for-bit integer arithmetic — directly from the
``documents`` view, with NO dump boundary: token hashing is
md5-first-8-bytes little-endian, which DuckDB computes natively as
``md5_number_upper(token)``; everything downstream (FNV polynomial
shingles, multiply-shift MinHash, band fold + splitmix64 finalizer,
counted-token SimHash, winnowing window minima) is mod-2^64 integer
arithmetic, expressed here over HUGEINT with an inline 32-bit-split
multiply.

Reference parity: the reference engine (Pendulun/WebCrawler) has no
dedup family; these oracles check the ADDED training-data operators
(SURVEY.md "beyond the reference" section) value-exactly.
"""

from __future__ import annotations

from ..functions.hashing import (
    N_BANDS,
    N_PERM,
    SHINGLE_K,
    minhash_perm_params,
)

M64 = "18446744073709551616"          # 2^64
B32 = "4294967296"                    # 2^32
UMAX = "18446744073709551615"         # 2^64 - 1 (empty-signature sentinel)
FNV = "1099511628211"                 # functions/hashing._POLY
SM_ADD = "11400714819323198485"       # 0x9E3779B97F4A7C15
SM_M1 = "13787848793156543929"        # 0xBF58476D1CE4E5B9
SM_M2 = "10723151780598845931"        # 0x94D049BB133111EB

# (j, 2^j) rows for j in 0..63 — exact HUGEINT powers, sidestepping
# DuckDB's BIGINT-domain `<<` overflow at j = 63
_POW2_VALUES = ", ".join(
    f"({j}, CAST({1 << j} AS HUGEINT))" for j in range(64))


def _umul(x: str, y: str) -> str:
    """SQL expr: (x * y) mod 2^64 for HUGEINT exprs in [0, 2^64) —
    32-bit-split schoolbook multiply so no intermediate exceeds
    HUGEINT range. Callers must pass COLUMN REFS or constants (the
    expansion references each operand four times)."""
    xh, xl = f"(({x}) // {B32})", f"(({x}) % {B32})"
    yh, yl = f"(({y}) // {B32})", f"(({y}) % {B32})"
    cross = f"({xh} * {yl} + {xl} * {yh})"
    return f"((({cross} % {B32}) * {B32} + {xl} * {yl}) % {M64})"


def _tokens_cte() -> str:
    """Shared prefix: documents -> per-doc token-hash list (HUGEINT in
    [0,2^64)) + long form (doc_id, i, v). Matches the repo's CANONICAL
    pinned tokenizer (``functions.tokenizer.tokenize`` — the hashing
    kernels use it too, NOT raw str.split(), which splits on Unicode
    whitespace the SQL class does not); whitespace-only docs yield NO
    rows (tokenize -> [])."""
    from .textpipe import SQL_TRIM_TEXT, SQL_WS_CLASS

    return f"""
 toks AS (SELECT doc_id, str_split_regex({SQL_TRIM_TEXT},
                                         '{SQL_WS_CLASS}+') AS tk
          FROM documents WHERE {SQL_TRIM_TEXT} <> ''),
 th AS (SELECT doc_id,
               list_transform(tk, x -> CAST(md5_number_upper(x) AS HUGEINT))
                   AS h,
               len(tk) AS n
        FROM toks),
 tl AS (SELECT doc_id, g.i AS i, h[g.i] AS v, n
        FROM th, LATERAL (SELECT unnest(generate_series(1, n)) AS i) g)"""


def _shingles_cte() -> str:
    """(doc_id, sh) unique word-3-shingle hashes — the staged FNV fold
    of ``shingle_hashes_from_token_hashes`` (k=3: two fold stages; docs
    with 0 < n < 3 collapse to ONE whole-doc fold hash)."""
    assert SHINGLE_K == 3
    return f""",
 sg1 AS (SELECT a.doc_id, a.i, ({_umul('a.v', FNV)} + b.v) % {M64} AS acc
         FROM tl a JOIN tl b ON b.doc_id = a.doc_id AND b.i = a.i + 1
         WHERE a.n >= 3 AND a.i <= a.n - 2),
 sg2 AS (SELECT a.doc_id, ({_umul('a.acc', FNV)} + b.v) % {M64} AS sh
         FROM sg1 a JOIN tl b ON b.doc_id = a.doc_id AND b.i = a.i + 2),
 shshort AS (SELECT doc_id,
                    CASE WHEN n = 1 THEN h[1]
                         ELSE ({_umul('h[1]', FNV)} + h[2]) % {M64}
                    END AS sh
             FROM th WHERE n < 3),
 shingles AS (SELECT DISTINCT doc_id, sh FROM
              (SELECT doc_id, sh FROM sg2
               UNION ALL SELECT doc_id, sh FROM shshort))"""


def _params_values() -> str:
    """The 128 (perm_id, a, b) multiply-shift rows of
    ``minhash_perm_params()`` (seed 1234), inlined as VALUES."""
    a, b = minhash_perm_params()
    return ", ".join(f"({i}, {int(a[i])}, {int(b[i])})"
                     for i in range(len(a)))


def _bands_cte() -> str:
    """(doc_id, band_id, bh): MinHash signatures -> band fold (FNV
    polynomial over the band's 8 signature rows) -> splitmix64
    finalizer -> mod 2^63, exactly ``band_hashes_batch``. Missing docs
    (no shingles) get the all-max sentinel signature."""
    rpb = N_PERM // N_BANDS
    ctes = [f""",
 params(perm_id, pa, pb) AS (VALUES {_params_values()}),
 sigv AS (SELECT s.doc_id, p.perm_id,
                 MIN(({_umul('CAST(p.pa AS HUGEINT)', 's.sh')}
                      + p.pb) % {M64}) AS sg
          FROM shingles s CROSS JOIN params p
          GROUP BY s.doc_id, p.perm_id),
 sig AS (SELECT d.doc_id, p.perm_id,
                COALESCE(v.sg, {UMAX}) AS sg
         FROM (SELECT doc_id FROM documents) d
         CROSS JOIN params p
         LEFT JOIN sigv v ON v.doc_id = d.doc_id
                         AND v.perm_id = p.perm_id),
 sb AS (SELECT doc_id, perm_id // {rpb} AS band_id,
               perm_id % {rpb} AS r, sg FROM sig),
 bf0 AS (SELECT doc_id, band_id, sg AS acc FROM sb WHERE r = 0)"""]
    for r in range(1, rpb):
        ctes.append(f""",
 bf{r} AS (SELECT a.doc_id, a.band_id,
                 ({_umul('a.acc', FNV)} + b.sg) % {M64} AS acc
          FROM bf{r - 1} a JOIN sb b ON b.doc_id = a.doc_id
                                    AND b.band_id = a.band_id
                                    AND b.r = {r})""")
    ctes.append(f""",
 sm0 AS (SELECT doc_id, band_id,
                CAST((acc + {SM_ADD}) % {M64} AS UBIGINT) AS z
         FROM bf{rpb - 1}),
 sm1 AS (SELECT doc_id, band_id, xor(z, z >> 30) AS z FROM sm0),
 sm2 AS (SELECT doc_id, band_id,
                CAST({_umul('CAST(z AS HUGEINT)', SM_M1)} AS UBIGINT) AS z
         FROM sm1),
 sm3 AS (SELECT doc_id, band_id, xor(z, z >> 27) AS z FROM sm2),
 sm4 AS (SELECT doc_id, band_id,
                CAST({_umul('CAST(z AS HUGEINT)', SM_M2)} AS UBIGINT) AS z
         FROM sm3),
 sm5 AS (SELECT doc_id, band_id, xor(z, z >> 31) AS z FROM sm4),
 bands AS (SELECT doc_id, band_id,
                  CAST(z & CAST(9223372036854775807 AS UBIGINT) AS BIGINT)
                      AS bh
           FROM sm5)""")
    return "".join(ctes)


def _verified_pairs_cte(threshold: float) -> str:
    """cand (banding collisions) -> exact shingle-Jaccard filter;
    empty-vs-empty pairs have union 0 and Jaccard defined as 1.0
    (kept), matching ``functions.hashing.jaccard``."""
    return f""",
 cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b ON a.band_id = b.band_id
                                   AND a.bh = b.bh
                                   AND a.doc_id < b.doc_id),
 sizes AS (SELECT doc_id, COUNT(*) AS ns FROM shingles GROUP BY doc_id),
 inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS ni
           FROM cand c
           JOIN shingles x ON x.doc_id = c.doc_a
           JOIN shingles y ON y.doc_id = c.doc_b AND y.sh = x.sh
           GROUP BY c.doc_a, c.doc_b),
 jac AS (SELECT c.doc_a, c.doc_b,
                COALESCE(i.ni, 0) AS ni,
                COALESCE(sa.ns, 0) + COALESCE(sb.ns, 0)
                    - COALESCE(i.ni, 0) AS nu
         FROM cand c
         LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
         LEFT JOIN sizes sa ON sa.doc_id = c.doc_a
         LEFT JOIN sizes sb ON sb.doc_id = c.doc_b),
 pairs AS (SELECT doc_a, doc_b, ni, nu FROM jac
           WHERE nu = 0
              OR (CAST(ni AS DOUBLE) / CAST(nu AS DOUBLE)) >= {threshold})"""


def minhash_lsh_sql(threshold: float = 0.8) -> str:
    """Oracle for ``dedup_minhash_lsh``: (doc_a, doc_b)."""
    return ("WITH" + _tokens_cte() + "," + _shingles_cte()[2:]
            + _bands_cte() + _verified_pairs_cte(threshold) + """
SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b
""")


def ngram_jaccard_sql(threshold: float = 0.5) -> str:
    """Oracle for ``dedup_ngram_jaccard``: (doc_a, doc_b, jaccard_pct)
    with jaccard_pct = trunc(100 * exact float Jaccard) — the same IEEE
    double op order as the Ray side's ``int(jac * 100)``."""
    return ("WITH" + _tokens_cte() + "," + _shingles_cte()[2:]
            + _bands_cte() + _verified_pairs_cte(threshold) + """
SELECT doc_a, doc_b,
       CASE WHEN nu = 0 THEN 100
            ELSE CAST(TRUNC((CAST(ni AS DOUBLE) / CAST(nu AS DOUBLE))
                            * 100) AS BIGINT)
       END AS jaccard_pct
FROM pairs ORDER BY doc_a, doc_b
""")


def clusters_sql(threshold: float = 0.8) -> str:
    """Oracle for ``dedup_clusters``: connected components of the
    verified pair graph via a recursive min-label closure (same shape
    as the link-graph components oracle); cluster_id = component min."""
    return ("WITH RECURSIVE" + _tokens_cte() + "," + _shingles_cte()[2:]
            + _bands_cte() + _verified_pairs_cte(threshold) + """,
 bi AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
 nodes AS (SELECT DISTINCT a AS doc_id FROM bi),
 lab AS (SELECT doc_id AS seq, doc_id AS comp FROM nodes
         UNION
         SELECT bi.b, lab.comp FROM lab JOIN bi ON bi.a = lab.seq
         WHERE lab.comp < bi.b)
SELECT n.doc_id, CAST(MIN(l.comp) AS BIGINT) AS cluster_id
FROM nodes n JOIN lab l ON l.seq = n.doc_id
GROUP BY n.doc_id
ORDER BY n.doc_id
""")


def simhash_sql(max_hamming: int = 3) -> str:
    """Oracle for ``dedup_simhash``: counted-token 64-bit SimHash (bit j
    set iff 2 * ones_j > n_tokens), 4-segment pigeonhole candidates,
    exact popcount(xor) <= max_hamming filter. Empty docs hash to 0."""
    return f"""
WITH{_tokens_cte()},
 tc AS (SELECT doc_id, v, COUNT(*) AS c FROM tl GROUP BY doc_id, v),
 tot AS (SELECT doc_id, n FROM th),
 bitpos(j, pw) AS (VALUES {_POW2_VALUES}),
 ones AS (SELECT t.doc_id, b.j, MAX(b.pw) AS pw,
                 SUM(CASE WHEN (t.v // b.pw) % 2 = 1
                          THEN t.c ELSE 0 END) AS o
          FROM tc t CROSS JOIN bitpos b GROUP BY t.doc_id, b.j),
 simv AS (SELECT o.doc_id,
                 CAST(SUM(CASE WHEN 2 * o.o > t.n
                               THEN o.pw ELSE 0 END) AS HUGEINT) AS hh
          FROM ones o JOIN tot t ON t.doc_id = o.doc_id
          GROUP BY o.doc_id),
 simh AS (SELECT d.doc_id,
                 CAST(COALESCE(v.hh, 0) AS UBIGINT) AS h
          FROM (SELECT doc_id FROM documents) d
          LEFT JOIN simv v ON v.doc_id = d.doc_id),
 segs AS (SELECT doc_id, h, unnest(generate_series(0, 3)) AS sid FROM simh),
 sv AS (SELECT doc_id, h, sid,
               (h >> CAST(16 * sid AS UBIGINT))
                   & CAST(65535 AS UBIGINT) AS val
        FROM segs),
 cp AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                        a.h AS ha, b.h AS hb
        FROM sv a JOIN sv b ON a.sid = b.sid AND a.val = b.val
                           AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b FROM cp
WHERE bit_count(xor(ha, hb)) <= {max_hamming}
ORDER BY doc_a, doc_b
"""


def _kgram_cte(k: int) -> str:
    """Ordered k-gram FNV-fold hashes as k-1 staged folds:
    ``kg{k-1}(doc_id, i, n, acc)`` — one row per 1-based gram start
    position, ``acc`` the uint64 polynomial hash (bit-identical to
    ``kgram_hashes_ordered``). Docs with fewer than k tokens emit no
    rows. Shared by the winnowing and duplicated-span oracles."""
    stages = [f""",
 kg1 AS (SELECT a.doc_id, a.i, a.n,
                ({_umul('a.v', FNV)} + b.v) % {M64} AS acc
         FROM tl a JOIN tl b ON b.doc_id = a.doc_id AND b.i = a.i + 1
         WHERE a.n >= {k} AND a.i <= a.n - {k - 1})"""]
    for j in range(2, k):
        stages.append(f""",
 kg{j} AS (SELECT a.doc_id, a.i, a.n,
                 ({_umul('a.acc', FNV)} + b.v) % {M64} AS acc
          FROM kg{j - 1} a JOIN tl b ON b.doc_id = a.doc_id
                                    AND b.i = a.i + {j})""")
    return "".join(stages)


def _winnow_sel_cte(k: int, w: int) -> str:
    """Shared winnowing chain: ordered k-gram hashes (``_kgram_cte``)
    -> sliding window-of-w minima -> per-doc DISTINCT selected
    fingerprints ``sel(doc_id, m)``. Docs with fewer than k tokens have
    NO fingerprints (Schleimer'03)."""
    stages = [_kgram_cte(k)]
    stages.append(f""",
 wmin AS (SELECT doc_id, i, n,
                 MIN(acc) OVER (PARTITION BY doc_id ORDER BY i
                                ROWS BETWEEN CURRENT ROW
                                AND {w - 1} FOLLOWING) AS m
          FROM kg{k - 1}),
 sel AS (SELECT DISTINCT doc_id, m FROM wmin
         WHERE i <= GREATEST(1, n - {k - 1} - {w - 1}))""")
    return "".join(stages)


def winnow_sql(k: int = 5, w: int = 8) -> str:
    """Oracle for ``doc_winnow``: selected fingerprints summarized to
    exact ints (n distinct minima, min/max mod 2^63)."""
    return ("WITH" + _tokens_cte() + _winnow_sel_cte(k, w) + """,
 agg AS (SELECT doc_id, COUNT(*) AS n_fps,
                CAST(MIN(m) % 9223372036854775808 AS BIGINT) AS min_fp,
                CAST(MAX(m) % 9223372036854775808 AS BIGINT) AS max_fp
         FROM sel GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(a.n_fps, 0) AS n_fps,
       COALESCE(a.min_fp, 0) AS min_fp,
       COALESCE(a.max_fp, 0) AS max_fp
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
ORDER BY d.doc_id
""")


def winnow_pairs_sql(k: int = 5, w: int = 8, min_shared: int = 2,
                     max_df: int = 50) -> str:
    """Oracle for ``docs_winnow_pairs`` (MOSS match): fingerprints are
    the winnow selections mod 2^63 (NOT re-deduped after the mod — a
    post-mod collision inside one doc double-counts, exactly like the
    Ray side's row semantics); fps in fewer than 2 or more than
    ``max_df`` rows are cut, pairs sharing >= ``min_shared`` survive."""
    return ("WITH" + _tokens_cte() + _winnow_sel_cte(k, w) + f""",
 fps AS (SELECT doc_id,
                CAST(m % 9223372036854775808 AS BIGINT) AS fp FROM sel),
 dfc AS (SELECT fp, COUNT(*) AS df FROM fps GROUP BY fp),
 ok AS (SELECT f.doc_id, f.fp FROM fps f JOIN dfc d ON d.fp = f.fp
        WHERE d.df >= 2 AND d.df <= {max_df}),
 prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                COUNT(*) AS n_shared
         FROM ok a JOIN ok b ON a.fp = b.fp AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id)
SELECT doc_a, doc_b, n_shared FROM prs
WHERE n_shared >= {min_shared}
ORDER BY doc_a, doc_b
""")


def dup_spans_sql(k: int = 8) -> str:
    """Oracle for ``docs_dup_spans``: occurrences whose ordered k-gram
    hash repeats at >= 2 (doc, position) sites corpus-wide, merged into
    maximal per-doc token spans via gaps-and-islands (grams at i1 < i2
    merge exactly when i2 - i1 <= k; spans are 1-based inclusive)."""
    return ("WITH" + _tokens_cte() + _kgram_cte(k) + f""",
 dup AS (SELECT acc FROM kg{k - 1} GROUP BY acc HAVING COUNT(*) >= 2),
 pos AS (SELECT o.doc_id, o.i FROM kg{k - 1} o
         JOIN dup d ON d.acc = o.acc),
 brk AS (SELECT doc_id, i,
                CASE WHEN i - LAG(i) OVER (PARTITION BY doc_id ORDER BY i)
                          <= {k} THEN 0 ELSE 1 END AS b
         FROM pos),
 grp AS (SELECT doc_id, i,
                SUM(b) OVER (PARTITION BY doc_id ORDER BY i) AS g
         FROM brk)
SELECT doc_id, MIN(i) AS span_start,
       CAST(MAX(i) + {k - 1} AS BIGINT) AS span_end,
       COUNT(*) AS n_grams
FROM grp GROUP BY doc_id, g
ORDER BY doc_id, span_start
""")


def jaccard_join_sql(threshold_pct: int = 50, k: int = 3) -> str:
    """Oracle for ``dedup_jaccard_join``: the EXACT similarity join —
    all pairs with word-k-gram-set Jaccard >= threshold_pct/100, via
    the full quadratic gram self-join (no prefix filter needed at
    oracle scale). Gram hashes are the same staged-FNV ordered-k-gram
    chain as the Ray kernel (``kgram_hashes_ordered``), so n_common is
    bit-exact; jaccard_pct and the threshold test are pure integer
    arithmetic on both sides."""
    return ("WITH" + _tokens_cte() + _kgram_cte(k) + f""",
 g AS (SELECT DISTINCT doc_id, acc FROM kg{k - 1}),
 sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
 prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                COUNT(*) AS n_common
         FROM g a JOIN g b ON a.acc = b.acc AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id)
SELECT p.doc_a, p.doc_b, p.n_common,
       CAST((100 * p.n_common) // (sa.n + sb.n - p.n_common)
            AS BIGINT) AS jaccard_pct
FROM prs p
JOIN sz sa ON sa.doc_id = p.doc_a
JOIN sz sb ON sb.doc_id = p.doc_b
WHERE 100 * p.n_common >= {threshold_pct} * (sa.n + sb.n - p.n_common)
ORDER BY doc_a, doc_b
""")


def containment_join_sql(threshold_pct: int = 80, k: int = 3) -> str:
    """Oracle for ``dedup_containment_join``: every ORDERED pair
    (doc_a, doc_b) with |A∩B| / |A| >= threshold_pct/100 over the same
    staged-FNV distinct word-k-gram sets, via the full quadratic gram
    self-join (no prefix filter needed at oracle scale). containment_pct
    and the threshold test are pure integer arithmetic on both sides."""
    return ("WITH" + _tokens_cte() + _kgram_cte(k) + f""",
 g AS (SELECT DISTINCT doc_id, acc FROM kg{k - 1}),
 sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
 prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                COUNT(*) AS n_common
         FROM g a JOIN g b ON a.acc = b.acc AND a.doc_id != b.doc_id
         GROUP BY a.doc_id, b.doc_id)
SELECT p.doc_a, p.doc_b, p.n_common,
       CAST((100 * p.n_common) // sa.n AS BIGINT) AS containment_pct
FROM prs p
JOIN sz sa ON sa.doc_id = p.doc_a
WHERE 100 * p.n_common >= {threshold_pct} * sa.n
ORDER BY doc_a, doc_b
""")


def lsh_recall_sql(threshold_pct: int = 50, k: int = 3) -> str:
    """Oracle for ``dedup_lsh_recall``: the LSH-banding pipeline's
    recall against the exact similarity join at the same threshold —
    BOTH chains (minhash/band/verify and the quadratic exact gram
    join) replayed bit-exactly in one statement, compared as pair
    sets. The short-doc fallback can only ADD pairs to the LSH side,
    so recall = |exact ∩ lsh| / |exact| is unaffected by it."""
    return ("WITH" + _tokens_cte() + "," + _shingles_cte()[2:]
            + _bands_cte()
            + _verified_pairs_cte(threshold_pct / 100)
            + _kgram_cte(k) + f""",
 g AS (SELECT DISTINCT doc_id, acc FROM kg{k - 1}),
 sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
 prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                COUNT(*) AS n_common
         FROM g a JOIN g b ON a.acc = b.acc AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id),
 exact AS (SELECT p.doc_a, p.doc_b
           FROM prs p
           JOIN sz sa ON sa.doc_id = p.doc_a
           JOIN sz sb ON sb.doc_id = p.doc_b
           WHERE 100 * p.n_common
                 >= {threshold_pct} * (sa.n + sb.n - p.n_common)),
 agg AS (SELECT (SELECT COUNT(*) FROM exact) AS n_exact,
                (SELECT COUNT(*) FROM exact e
                 JOIN pairs l ON e.doc_a = l.doc_a
                             AND e.doc_b = l.doc_b) AS n_found)
SELECT CAST(n_exact AS BIGINT) AS n_exact,
       CAST(n_found AS BIGINT) AS n_found,
       CAST(n_exact - n_found AS BIGINT) AS n_missed,
       CAST(CASE WHEN n_exact = 0 THEN 10000
                 ELSE (10000 * n_found) // n_exact END AS BIGINT)
           AS recall_bp
FROM agg
""")


def keep_best_sql(threshold: float = 0.8) -> str:
    """Oracle for ``dedup_keep_best``: the clusters closure (see
    clusters_sql) extended with the keep-rule — per cluster keep the
    max-n_chars (min doc_id on ties) member; non-members all survive."""
    return ("WITH RECURSIVE" + _tokens_cte() + "," + _shingles_cte()[2:]
            + _bands_cte() + _verified_pairs_cte(threshold) + """,
 bi AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
 nodes AS (SELECT DISTINCT a AS doc_id FROM bi),
 lab AS (SELECT doc_id AS seq, doc_id AS comp FROM nodes
         UNION
         SELECT bi.b, lab.comp FROM lab JOIN bi ON bi.a = lab.seq
         WHERE lab.comp < bi.b),
 cl AS (SELECT n.doc_id, MIN(l.comp) AS cluster_id
        FROM nodes n JOIN lab l ON l.seq = n.doc_id
        GROUP BY n.doc_id),
 best AS (SELECT cl.doc_id,
                 ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
                                    ORDER BY d.n_chars DESC,
                                             cl.doc_id) AS rn
          FROM cl JOIN documents d ON d.doc_id = cl.doc_id)
SELECT d.doc_id FROM documents d
LEFT JOIN best b ON b.doc_id = d.doc_id
WHERE b.doc_id IS NULL OR b.rn = 1
ORDER BY d.doc_id
""")


def rate_by_source_sql(threshold: float = 0.8) -> str:
    """Oracle for ``dedup_rate_by_source``: the clusters closure rolled
    up per source with an integer basis-point rate."""
    return ("WITH RECURSIVE" + _tokens_cte() + "," + _shingles_cte()[2:]
            + _bands_cte() + _verified_pairs_cte(threshold) + """,
 bi AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
 nodes AS (SELECT DISTINCT a AS doc_id FROM bi),
 mem AS (SELECT d.source, COUNT(*) AS n_dup_members
         FROM nodes n JOIN documents d ON d.doc_id = n.doc_id
         GROUP BY d.source),
 tot AS (SELECT source, COUNT(*) AS n_docs FROM documents
         GROUP BY source)
SELECT tot.source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(COALESCE(n_dup_members, 0) AS BIGINT) AS n_dup_members,
       CAST(COALESCE(n_dup_members, 0) * 10000 // n_docs AS BIGINT)
           AS dup_rate_bp
FROM tot LEFT JOIN mem ON mem.source = tot.source
ORDER BY tot.source
""")
