"""Generated DuckDB oracle SQL for the LSH dedup family.

The MinHash pipeline (`engine.ops.dedup`) is deterministic uint64 ring
arithmetic end-to-end — md5-prefix token hashes, wrapping-multiply shingle
combines, splitmix64 finalizers, (a*x+b) mod 2^64 mod (2^61-1) permutations,
banded keys — so the ENTIRE candidate-generation + verify pipeline is
SQL-expressible: DuckDB's UHUGEINT gives exact mod-2^64 products, xor/>>/&
give the bit ops, and bit_xor gives the positional combines.  These builders
generate that SQL *from the engine's own constants* (`_perm_params`,
`_POS_MULT`, the splitmix constants, the hot-bucket guards) so the oracle
can't drift from the implementation — the same pattern as the generated
langid / rolling-fingerprint oracles in `__ray_entry__.py`.

Reference parity note: the reference crawler's no-revisit set
(SURVEY.md §2.7 D1) is exact-match only; the near-dup oracles cover the
training-data extensions the prompt mandates.
"""

from __future__ import annotations

from .ops import dedup as dd

_M64 = 1 << 64
_MASK61 = (1 << 61) - 1
_MASK63 = (1 << 63) - 1
# splitmix64 finalizer constants (must match dedup._mix64)
_C1 = 0xBF58476D1CE4E5B9
_C2 = 0x94D049BB133111EB
# band-id mix constant (must match dedup._band_keys)
_BANDC = 0x2545F4914F6CDD1D


def _mul64(x: str, c) -> str:
    """SQL for (x * c) mod 2^64 over UBIGINT operands, exact via UHUGEINT."""
    return (f"CAST(((({x})::UHUGEINT * ({c})::UHUGEINT) % {_M64}::UHUGEINT)"
            f" AS UBIGINT)")


def _mix64(col: str) -> str:
    """SQL splitmix64 finalizer over a UBIGINT column reference.

    Mirrors dedup._mix64: x^=x>>30; x*=C1; x^=x>>27; x*=C2; x^=x>>31 —
    all multiplies wrapping mod 2^64.  Inline expansion repeats the column
    reference 8x, so callers should stage the input as a bare column.
    """
    t1 = f"xor({col}, {col} >> 30)"
    t2 = _mul64(t1, _C1)
    t3 = f"xor({t2}, {t2} >> 27)"
    t4 = _mul64(t3, _C2)
    return f"xor({t4}, {t4} >> 31)"


def _pos_mult_case(var: str, k: int, base: int = 0) -> str:
    """CASE mapping var = base..base+k-1 to _POS_MULT[0..k-1]."""
    whens = " ".join(
        f"WHEN {base + j} THEN {int(dd._POS_MULT[j])}::UBIGINT" for j in range(k - 1)
    )
    return (f"CASE ({var}) {whens} ELSE {int(dd._POS_MULT[k - 1])}::UBIGINT END")


def _shingle_ctes(k: int, include_short: bool = True) -> str:
    """CTE chain ending in `sh(doc_id, s)` — the exact DISTINCT k-token-gram
    61-bit shingle-hash set of ``dedup._shingles`` (token md5 -> positional
    splitmix combine), shared by the minhash and decontamination oracles.

    ``include_short=False`` drops the n < k single-combined-shingle branch
    (docs shorter than k tokens emit nothing) — the exact-overlap pair ops'
    convention."""
    win_joins = "\n".join(
        f"              JOIN th t{j} ON t{j}.doc_id = t0.doc_id"
        f" AND t{j}.i = t0.i + {j}" for j in range(1, k)
    )
    g3 = f"{_mul64('t0.h', int(dd._POS_MULT[0]))}"
    for j in range(1, k):
        g3 = f"xor({g3}, {_mul64(f't{j}.h', int(dd._POS_MULT[j]))})"
    if not include_short:
        return rf"""
            tok_arr AS (
              SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                         x -> x <> '') AS toks
              FROM documents
            ), th AS (
              SELECT doc_id, generate_subscripts(toks, 1) AS i,
                     ('0x' || substr(md5(unnest(toks)), 1, 16))::UBIGINT AS h
              FROM tok_arr
            ), g_full AS (      -- k-token windows (docs with n >= k)
              SELECT t0.doc_id, {g3} AS g
              FROM th t0
{win_joins}
            ), sh AS (          -- DISTINCT 61-bit shingle hashes per doc
              SELECT DISTINCT doc_id, ({_mix64('g')} & {_MASK61}::UBIGINT) AS s
              FROM g_full
            )"""
    return rf"""
            tok_arr AS (
              SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                         x -> x <> '') AS toks
              FROM documents
            ), th AS (
              SELECT doc_id, generate_subscripts(toks, 1) AS i,
                     ('0x' || substr(md5(unnest(toks)), 1, 16))::UBIGINT AS h
              FROM tok_arr
            ), nt AS (
              SELECT doc_id, count(*) AS n FROM th GROUP BY doc_id
            ), g_full AS (      -- k-token windows (docs with n >= k)
              SELECT t0.doc_id, {g3} AS g
              FROM th t0
{win_joins}
            ), g_short AS (     -- n < k: one shingle combining all n tokens
              SELECT t.doc_id,
                     bit_xor({_mul64('t.h', _pos_mult_case('t.i - 1', k))}) AS g
              FROM th t JOIN nt ON nt.doc_id = t.doc_id AND nt.n < {k}
              GROUP BY t.doc_id
            ), g_all AS (
              SELECT doc_id, g FROM g_full
              UNION ALL SELECT doc_id, g FROM g_short
            ), sh AS (          -- DISTINCT 61-bit shingle hashes per doc
              SELECT DISTINCT doc_id, ({_mix64('g')} & {_MASK61}::UBIGINT) AS s
              FROM g_all
            )"""


def ngram_overlap_pairs_sql(k: int, threshold_num: int, threshold_den: int,
                            mode: str) -> str:
    """Oracle for dedup.ngram_jaccard_pairs / ngram_containment_pairs on the
    exact engine 61-bit shingle hashes (no short-doc branch: docs with fewer
    than k tokens emit nothing, mirroring the engine op).  Integer
    cross-multiplied predicates keep the output hash float-free:
    jaccard ``(den+num)*c >= num*(n_a+n_b)`` (c/(n_a+n_b-c) >= num/den),
    containment ``den*c >= num*min(n_a, n_b)``."""
    if mode == "containment":
        pred = (f"{threshold_den} * i.n_common >= "
                f"{threshold_num} * LEAST(sa.n, sb.n)")
    else:
        pred = (f"{threshold_den + threshold_num} * i.n_common >= "
                f"{threshold_num} * (sa.n + sb.n)")
    return (f"WITH {_shingle_ctes(k, include_short=False)},\n"
            f"""            sz AS (
              SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
                     count(*) AS n_common
              FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY 1, 2
            )
            SELECT i.doc_a, i.doc_b, i.n_common, sa.n AS n_a, sb.n AS n_b
            FROM inter i
            JOIN sz sa ON sa.doc_id = i.doc_a
            JOIN sz sb ON sb.doc_id = i.doc_b
            WHERE {pred}
            ORDER BY doc_a, doc_b""")


def feature_hash_embed_sql(n_dims: int = 16) -> str:
    """Oracle for text.feature_hash_embed: signed feature-hashing doc
    vectors on the exact engine md5 token-hash ring — dim = h % n_dims,
    sign = +1 if bit 4 set else -1, summed over token OCCURRENCES; empty
    docs embed as the zero vector."""
    sums = ",\n".join(
        f"                     SUM(CASE WHEN dim = {j} THEN s ELSE 0 END)"
        f"::BIGINT AS f{j:02d}" for j in range(n_dims)
    )
    coals = ",\n".join(
        f"                   COALESCE(a.f{j:02d}, 0)::BIGINT AS f{j:02d}"
        for j in range(n_dims)
    )
    return rf"""WITH tok_arr AS (
              SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                         x -> x <> '') AS toks
              FROM documents
            ), th AS (
              SELECT doc_id,
                     ('0x' || substr(md5(unnest(toks)), 1, 16))::UBIGINT AS h
              FROM tok_arr
            ), f AS (
              SELECT doc_id, CAST(h % {n_dims} AS BIGINT) AS dim,
                     CASE WHEN (h >> 4) & 1 = 1 THEN 1 ELSE -1 END AS s
              FROM th
            ), agg AS (
              SELECT doc_id,
{sums}
              FROM f GROUP BY doc_id
            )
            SELECT d.doc_id,
{coals}
            FROM documents d LEFT JOIN agg a USING (doc_id)
            ORDER BY d.doc_id"""


def _minhash_verified_pairs_ctes(threshold_num: int, threshold_den: int,
                                 k: int = 3) -> str:
    """CTE chain ending in `verified(doc_a, doc_b)` — the exact MinHash+LSH
    near-dup pair set of dedup.minhash_lsh_pairs (candidates AND verify)."""
    a_par, b_par = dd._perm_params()
    perm_values = ", ".join(
        f"({i}, {int(a_par[i])}::UBIGINT, {int(b_par[i])}::UBIGINT)"
        for i in range(dd.N_PERM)
    )
    rpb = dd.ROWS_PER_BAND
    return rf"""{_shingle_ctes(k)}, perms AS (
              SELECT * FROM (VALUES {perm_values}) p(i, a, b)
            ), sigs AS (        -- minhash: min((a*s + b) mod 2^64 mod p)
              SELECT sh.doc_id, p.i,
                     min(CAST(((p.a::UHUGEINT * sh.s::UHUGEINT + p.b::UHUGEINT)
                               % {_M64}::UHUGEINT)
                              % {dd._MERSENNE}::UHUGEINT AS UBIGINT)) AS sig
              FROM sh CROSS JOIN perms p
              GROUP BY sh.doc_id, p.i
            ), allsigs AS (     -- shingle-less docs: sig = 2^64-1 (uint64 max)
              SELECT d.doc_id, p.i,
                     COALESCE(s.sig, {_M64 - 1}::UBIGINT) AS sig
              FROM (SELECT doc_id FROM documents) d
              CROSS JOIN perms p
              LEFT JOIN sigs s ON s.doc_id = d.doc_id AND s.i = p.i
            ), bh AS (          -- positional combine of each band's rows
              SELECT doc_id, (i // {rpb}) AS band,
                     bit_xor({_mul64('sig', _pos_mult_case(f'i % {rpb}', rpb))}) AS h0
              FROM allsigs GROUP BY doc_id, band
            ), bh2 AS (
              SELECT doc_id, xor(h0, {_mul64('band', _BANDC)}) AS h1 FROM bh
            ), keys AS (
              SELECT doc_id,
                     CAST(({_mix64('h1')} & {_MASK63}::UBIGINT) AS BIGINT) AS band_key
              FROM bh2
            ), grp AS (
              SELECT band_key, count(DISTINCT doc_id) AS n
              FROM keys GROUP BY band_key
            ), cand AS (        -- LSH candidates, hot-bucket guard, deduped
              SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
              FROM keys x
              JOIN keys y ON y.band_key = x.band_key AND y.doc_id > x.doc_id
              JOIN grp g ON g.band_key = x.band_key
                        AND g.n <= {dd.MINHASH_MAX_BUCKET}
            ), ssz AS (
              SELECT d.doc_id, count(sh.s) AS n
              FROM documents d LEFT JOIN sh ON sh.doc_id = d.doc_id
              GROUP BY d.doc_id
            ), ij AS (          -- shingle-set intersections (inverted index)
              SELECT x.doc_id AS da, y.doc_id AS db, count(*) AS nc
              FROM sh x JOIN sh y ON y.s = x.s AND y.doc_id > x.doc_id
              GROUP BY 1, 2
            ), verified AS (    -- exact Jaccard >= {threshold_num}/{threshold_den},
                                -- integer cross-multiplied (empty union => keep)
              SELECT c.doc_a, c.doc_b
              FROM cand c
              JOIN ssz za ON za.doc_id = c.doc_a
              JOIN ssz zb ON zb.doc_id = c.doc_b
              LEFT JOIN ij ON ij.da = c.doc_a AND ij.db = c.doc_b
              WHERE {threshold_den} * COALESCE(ij.nc, 0)
                    >= {threshold_num} * (za.n + zb.n - COALESCE(ij.nc, 0))
            )"""


def minhash_lsh_pairs_sql(threshold_num: int = 1, threshold_den: int = 2,
                          k: int = 3) -> str:
    """Full-pipeline oracle for dedup.minhash_lsh_pairs (default threshold 1/2)."""
    return (f"WITH {_minhash_verified_pairs_ctes(threshold_num, threshold_den, k)}\n"
            "            SELECT doc_a, doc_b FROM verified"
            " ORDER BY doc_a, doc_b")


def near_dedup_canonical_sql(threshold_num: int = 1, threshold_den: int = 2,
                             k: int = 3) -> str:
    """Transitive closure over the verified MinHash pair set: recursive-CTE
    reachability, min reachable id = canonical (docs in no pair map to
    themselves) — the ground truth for the LSH -> distributed-CC composition.
    """
    return (f"WITH RECURSIVE {_minhash_verified_pairs_ctes(threshold_num, threshold_den, k)},\n"
            """            sym AS (
              SELECT doc_a AS s, doc_b AS d FROM verified
              UNION ALL SELECT doc_b, doc_a FROM verified
            ), reach(node, r) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT sym.d, reach.r FROM reach JOIN sym ON sym.s = reach.node
            )
            SELECT node AS doc_id, min(r) AS canonical_id
            FROM reach GROUP BY node ORDER BY doc_id""")


def dup_ngram_spans_sql(k: int = 5) -> str:
    """Oracle for dedup.dup_ngram_spans: the same md5/splitmix gram hash at
    every position (no distinct), occurrence counts >= 2, and SQL
    gaps-and-islands for the maximal-span merge — integer-only output."""
    win_joins = "\n".join(
        f"              JOIN th t{j} ON t{j}.doc_id = t0.doc_id"
        f" AND t{j}.i = t0.i + {j}" for j in range(1, k)
    )
    g = f"{_mul64('t0.h', int(dd._POS_MULT[0]))}"
    for j in range(1, k):
        g = f"xor({g}, {_mul64(f't{j}.h', int(dd._POS_MULT[j]))})"
    return rf"""
            WITH tok_arr AS (
              SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                         x -> x <> '') AS toks
              FROM documents
            ), th AS (
              SELECT doc_id, generate_subscripts(toks, 1) AS i,
                     ('0x' || substr(md5(unnest(toks)), 1, 16))::UBIGINT AS h
              FROM tok_arr
            ), g_pos AS (       -- gram hash at every k-window position
              SELECT t0.doc_id, t0.i, {g} AS g
              FROM th t0
{win_joins}
            ), s_pos AS (
              SELECT doc_id, i, ({_mix64('g')} & {_MASK61}::UBIGINT) AS s
              FROM g_pos
            ), cnt AS (
              SELECT s, count(*) AS n FROM s_pos GROUP BY s
            ), dup AS (         -- positions whose gram repeats anywhere
              SELECT p.doc_id, p.i
              FROM s_pos p JOIN cnt ON cnt.s = p.s AND cnt.n >= 2
            ), isl AS (         -- gaps-and-islands: windows [i, i+k) merge
                                -- when next_start - prev_start <= k
              SELECT doc_id, i,
                     CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i)
                               <= {k} THEN 0 ELSE 1 END AS brk
              FROM dup
            ), grp AS (
              SELECT doc_id, i,
                     sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS isl_id
              FROM isl
            )
            SELECT doc_id, min(i) AS span_start, max(i) + {k - 1} AS span_end
            FROM grp GROUP BY doc_id, isl_id
            ORDER BY doc_id, span_start"""


def strip_dup_spans_sql(k: int = 5) -> str:
    """Oracle for dedup.strip_dup_spans: the dup_ngram_spans_sql span CTEs
    (original-case tokens, md5(lower(w)) hashes — byte-identical gram ring),
    then covered-position expansion, anti-join, and an ordered string_agg
    rebuild; COALESCE keeps fully-stripped documents as empty strings."""
    win_joins = "\n".join(
        f"              JOIN th t{j} ON t{j}.doc_id = t0.doc_id"
        f" AND t{j}.i = t0.i + {j}" for j in range(1, k)
    )
    g = f"{_mul64('t0.h', int(dd._POS_MULT[0]))}"
    for j in range(1, k):
        g = f"xor({g}, {_mul64(f't{j}.h', int(dd._POS_MULT[j]))})"
    return rf"""
            WITH tok_arr AS (
              SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                         x -> x <> '') AS toks
              FROM documents
            ), tl AS (
              SELECT doc_id, generate_subscripts(toks, 1) AS i, unnest(toks) AS w
              FROM tok_arr
            ), th AS (
              SELECT doc_id, i,
                     ('0x' || substr(md5(lower(w)), 1, 16))::UBIGINT AS h
              FROM tl
            ), g_pos AS (
              SELECT t0.doc_id, t0.i, {g} AS g
              FROM th t0
{win_joins}
            ), s_pos AS (
              SELECT doc_id, i, ({_mix64('g')} & {_MASK61}::UBIGINT) AS s
              FROM g_pos
            ), cnt AS (
              SELECT s, count(*) AS n FROM s_pos GROUP BY s
            ), dup AS (
              SELECT p.doc_id, p.i
              FROM s_pos p JOIN cnt ON cnt.s = p.s AND cnt.n >= 2
            ), isl AS (
              SELECT doc_id, i,
                     CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i)
                               <= {k} THEN 0 ELSE 1 END AS brk
              FROM dup
            ), grp AS (
              SELECT doc_id, i,
                     sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS isl_id
              FROM isl
            ), spans AS (
              SELECT doc_id, min(i) AS s0, max(i) + {k - 1} AS s1
              FROM grp GROUP BY doc_id, isl_id
            ), covered AS (
              SELECT DISTINCT t.doc_id, t.i
              FROM spans s
              JOIN tl t ON t.doc_id = s.doc_id AND t.i BETWEEN s.s0 AND s.s1
            ), kept AS (
              SELECT tl.doc_id, tl.i, tl.w
              FROM tl LEFT JOIN covered c ON c.doc_id = tl.doc_id AND c.i = tl.i
              WHERE c.i IS NULL
            ), agg AS (
              SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS text_clean
              FROM kept GROUP BY doc_id
            ), rem AS (
              SELECT doc_id, count(*)::BIGINT AS n_removed
              FROM covered GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(a.text_clean, '') AS text_clean,
                   COALESCE(r.n_removed, 0)::BIGINT AS n_removed
            FROM documents d
            LEFT JOIN agg a ON a.doc_id = d.doc_id
            LEFT JOIN rem r ON r.doc_id = d.doc_id
            ORDER BY d.doc_id"""


def simhash_near_pairs_sql(max_hamming: int = 3) -> str:
    """Full-pipeline oracle for dedup.simhash_near_pairs: the md5-prefix
    SimHash signature (identical CTEs to the simhash_signatures oracle),
    candidates sharing >= 1 of the 4 16-bit blocks (pigeonhole for
    Hamming <= 3), the per-(blk,key) hot-group guard, and the exact Hamming
    verify via bit_count(xor(...)).
    """
    return rf"""
            WITH toks AS (
              SELECT doc_id, unnest(list_distinct(list_filter(
                       string_split_regex(lower(text), '\s+'),
                       x -> x <> ''))) AS w
              FROM documents
            ), th AS (
              SELECT doc_id, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS h
              FROM toks
            ), bits AS (
              SELECT doc_id, j,
                     SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS acc
              FROM th, range(63) t(j)
              GROUP BY doc_id, j
            ), sg AS (
              SELECT doc_id,
                     SUM(CASE WHEN acc > 0 THEN (1::BIGINT << j::INTEGER)
                              ELSE 0 END)::BIGINT AS simhash
              FROM bits GROUP BY doc_id
            ), sig AS (
              SELECT d.doc_id, COALESCE(sg.simhash, 0)::BIGINT AS simhash
              FROM documents d LEFT JOIN sg USING (doc_id)
            ), blocks AS (
              SELECT doc_id, simhash, r.blk,
                     CAST((CAST(simhash AS UBIGINT) >> (r.blk * 16))
                          & 65535 AS INTEGER) AS key
              FROM sig, range(4) r(blk)
            ), grp AS (
              SELECT blk, key, count(*) AS n FROM blocks GROUP BY blk, key
            ), cand AS (
              SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
                     x.simhash AS ha, y.simhash AS hb
              FROM blocks x
              JOIN blocks y ON y.blk = x.blk AND y.key = x.key
                           AND y.doc_id > x.doc_id
              JOIN grp g ON g.blk = x.blk AND g.key = x.key
                        AND g.n <= {dd.SIMHASH_MAX_BUCKET}
            )
            SELECT doc_a, doc_b FROM cand
            WHERE bit_count(xor(CAST(ha AS UBIGINT), CAST(hb AS UBIGINT)))
                  <= {max_hamming}
            ORDER BY doc_a, doc_b"""


_CANON_CTES = """
            sym AS (
              SELECT doc_a AS s, doc_b AS d FROM verified
              UNION ALL SELECT doc_b, doc_a FROM verified
            ), reach(node, r) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT sym.d, reach.r FROM reach JOIN sym ON sym.s = reach.node
            ), canon AS (
              SELECT node AS doc_id, min(r) AS canonical_id
              FROM reach GROUP BY node
            )"""


def decontaminate_ngrams_sql(k: int = 8, n_eval: int = 20) -> str:
    """Oracle for dedup.decontaminate_ngrams: shared-shingle membership of
    every train doc (doc_id >= n_eval) against the eval slice's distinct
    k-gram set, on the exact engine shingle hashes."""
    return (f"WITH {_shingle_ctes(k)},\n"
            f"""            ev AS (
              SELECT DISTINCT s FROM sh WHERE doc_id < {n_eval}
            ), hits AS (
              SELECT DISTINCT sh.doc_id FROM sh JOIN ev USING (s)
              WHERE sh.doc_id >= {n_eval}
            )
            SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
            FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
            WHERE d.doc_id >= {n_eval} ORDER BY d.doc_id""")


def near_dedup_cluster_stats_sql(threshold_num: int = 1, threshold_den: int = 2,
                                 k: int = 3) -> str:
    """Oracle for dedup.near_dedup_cluster_stats: component sizes via the
    recursive transitive closure, then the size histogram."""
    return (f"WITH RECURSIVE {_minhash_verified_pairs_ctes(threshold_num, threshold_den, k)},"
            f"{_CANON_CTES},\n"
            """            sizes AS (
              SELECT canonical_id, count(*) AS sz FROM canon GROUP BY canonical_id
            )
            SELECT sz AS cluster_size, count(*) AS n_clusters,
                   CAST(sum(sz) AS BIGINT) AS n_docs
            FROM sizes GROUP BY sz ORDER BY cluster_size""")


def dedup_keep_best_sql(threshold_num: int = 1, threshold_den: int = 2,
                        k: int = 3) -> str:
    """Oracle for dedup.dedup_keep_best: per component, the max-token doc
    (ties to the smaller doc_id) plus the component size."""
    return (f"WITH RECURSIVE {_minhash_verified_pairs_ctes(threshold_num, threshold_den, k)},"
            f"{_CANON_CTES},\n"
            """            ntok AS (
              SELECT doc_id, len(toks) AS n_tokens FROM tok_arr
            ), ranked AS (
              SELECT c.canonical_id, c.doc_id, nt.n_tokens,
                     row_number() OVER (PARTITION BY c.canonical_id
                                        ORDER BY nt.n_tokens DESC, c.doc_id) AS rn,
                     count(*) OVER (PARTITION BY c.canonical_id) AS cs
              FROM canon c JOIN ntok nt ON nt.doc_id = c.doc_id
            )
            SELECT canonical_id, doc_id AS keep_doc_id,
                   CAST(cs AS BIGINT) AS cluster_size
            FROM ranked WHERE rn = 1 ORDER BY canonical_id""")


def eval_affinity_counts_sql(k: int = 8, n_eval: int = 20) -> str:
    """Oracle for dedup.eval_affinity_counts: distinct-gram and eval-hit
    counts per train doc on the exact engine shingle hashes."""
    return (f"WITH {_shingle_ctes(k)},\n"
            f"""            ev AS (
              SELECT DISTINCT s FROM sh WHERE doc_id < {n_eval}
            ), tg AS (
              SELECT doc_id, count(*) AS n_grams FROM sh
              WHERE doc_id >= {n_eval} GROUP BY doc_id
            ), hit AS (
              SELECT sh.doc_id, count(*) AS n_eval_hits
              FROM sh JOIN ev USING (s)
              WHERE sh.doc_id >= {n_eval} GROUP BY sh.doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(tg.n_grams, 0) AS BIGINT) AS n_grams,
                   CAST(COALESCE(hit.n_eval_hits, 0) AS BIGINT) AS n_eval_hits
            FROM documents d
            LEFT JOIN tg ON tg.doc_id = d.doc_id
            LEFT JOIN hit ON hit.doc_id = d.doc_id
            WHERE d.doc_id >= {n_eval} ORDER BY d.doc_id""")


def lm_perplexity_bucket_sql() -> str:
    """Oracle for text.lm_perplexity_bucket: identical md5 token hashes,
    add-one-smoothed bigram LM trained on the corpus, integer micro-nat
    contributions rounded BEFORE the per-doc sum (order-independent), floor
    ln_ppl_nano, and tercile thresholds by explicit global rank."""
    return r"""
            WITH tok_arr AS (
              SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                         x -> x <> '') AS toks
              FROM documents
            ), th AS (
              SELECT doc_id, generate_subscripts(toks, 1) AS i,
                     ('0x' || substr(md5(unnest(toks)), 1, 16))::UBIGINT AS h
              FROM tok_arr
            ), vocab AS (
              SELECT count(DISTINCT h) AS v FROM th
            ), bt AS (
              SELECT t0.doc_id, t0.h AS h1, t1.h AS h2, count(*) AS m12
              FROM th t0 JOIN th t1 ON t1.doc_id = t0.doc_id AND t1.i = t0.i + 1
              GROUP BY t0.doc_id, t0.h, t1.h
            ), c12 AS (
              SELECT h1, h2, sum(m12) AS c FROM bt GROUP BY h1, h2
            ), c1 AS (
              SELECT h1, sum(m12) AS c FROM bt GROUP BY h1
            ), contrib AS (
              SELECT bt.doc_id, bt.m12,
                     ROUND(bt.m12 * ln((c12.c + 1)::DOUBLE /
                                       (c1.c + (SELECT v FROM vocab))::DOUBLE)
                           * 1000000)::BIGINT AS cm
              FROM bt
              JOIN c12 ON c12.h1 = bt.h1 AND c12.h2 = bt.h2
              JOIN c1 ON c1.h1 = bt.h1
            ), scored0 AS (
              SELECT doc_id, sum(m12)::BIGINT AS m, (-sum(cm))::BIGINT AS a
              FROM contrib GROUP BY doc_id
            ), scored AS (
              SELECT d.doc_id,
                     COALESCE(s.m, 0)::BIGINT AS n_bigrams,
                     (CASE WHEN COALESCE(s.m, 0) = 0 THEN 0
                           ELSE (s.a * 1000) // s.m END)::BIGINT AS ln_ppl_nano
              FROM documents d LEFT JOIN scored0 s ON s.doc_id = d.doc_id
            ), ranked AS (
              SELECT ln_ppl_nano AS val,
                     row_number() OVER (ORDER BY ln_ppl_nano) - 1 AS rk
              FROM scored
            ), nn AS (SELECT count(*) AS n FROM scored),
            thr AS (
              SELECT
                (SELECT val FROM ranked
                 WHERE rk = (SELECT (n - 1) // 3 FROM nn)) AS q1,
                (SELECT val FROM ranked
                 WHERE rk = (SELECT (2 * (n - 1)) // 3 FROM nn)) AS q2
            )
            SELECT s.doc_id, s.n_bigrams, s.ln_ppl_nano,
                   CASE WHEN s.ln_ppl_nano <= thr.q1 THEN 'head'
                        WHEN s.ln_ppl_nano <= thr.q2 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM scored s, thr ORDER BY s.doc_id"""


def dsir_importance_weights_sql(n_feat: int = 4096,
                                target_lang: str = "en") -> str:
    """Oracle for text.dsir_importance_weights: hashed unigram+bigram
    features (the engine's splitmix ring mod n_feat), add-one-smoothed
    target-vs-raw log ratios rounded to int64 micro-nats per BUCKET (so the
    per-doc sum is order-independent), and a value-threshold selection flag
    at the top-quartile rank."""
    u_b = (f"({_mix64(_mul64('h', int(dd._POS_MULT[0])))}"
           f" % {n_feat}::UBIGINT)::BIGINT")
    g2 = (f"xor({_mul64('t0.h', int(dd._POS_MULT[0]))}, "
          f"{_mul64('t1.h', int(dd._POS_MULT[1]))})")
    b_b = f"({_mix64(g2)} % {n_feat}::UBIGINT)::BIGINT"
    return rf"""
            WITH tok_arr AS (
              SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                         x -> x <> '') AS toks
              FROM documents
            ), th AS (
              SELECT doc_id, generate_subscripts(toks, 1) AS i,
                     ('0x' || substr(md5(unnest(toks)), 1, 16))::UBIGINT AS h
              FROM tok_arr
            ), uni AS (
              SELECT doc_id, {u_b} AS b FROM th
            ), bi AS (
              SELECT t0.doc_id, {b_b} AS b
              FROM th t0 JOIN th t1 ON t1.doc_id = t0.doc_id AND t1.i = t0.i + 1
            ), feats AS (
              SELECT * FROM uni UNION ALL SELECT * FROM bi
            ), fl AS (
              SELECT f.doc_id, f.b, (d.lang = '{target_lang}') AS tgt
              FROM feats f JOIN documents d ON d.doc_id = f.doc_id
            ), cnts AS (
              SELECT b, sum(CASE WHEN tgt THEN 1 ELSE 0 END)::BIGINT AS ct,
                     count(*)::BIGINT AS cr
              FROM fl GROUP BY b
            ), tots AS (
              SELECT sum(ct)::BIGINT AS tt, sum(cr)::BIGINT AS tr FROM cnts
            ), w AS (
              SELECT b,
                     ROUND((ln((ct + 1)::DOUBLE / (tt + {n_feat})::DOUBLE)
                            - ln((cr + 1)::DOUBLE / (tr + {n_feat})::DOUBLE))
                           * 1000000)::BIGINT AS wm
              FROM cnts, tots
            ), doc0 AS (
              SELECT fl.doc_id, count(*)::BIGINT AS n_grams,
                     sum(w.wm)::BIGINT AS logw
              FROM fl JOIN w ON w.b = fl.b GROUP BY fl.doc_id
            ), scored AS (
              SELECT d.doc_id, COALESCE(doc0.n_grams, 0)::BIGINT AS n_grams,
                     COALESCE(doc0.logw, 0)::BIGINT AS logw_micro
              FROM documents d LEFT JOIN doc0 ON doc0.doc_id = d.doc_id
            ), ranked AS (
              SELECT logw_micro AS val,
                     row_number() OVER (ORDER BY logw_micro) - 1 AS rk
              FROM scored
            ), nn AS (SELECT count(*) AS n FROM scored),
            thr AS (
              SELECT (SELECT val FROM ranked
                      WHERE rk = (SELECT (3 * (n - 1)) // 4 FROM nn)) AS q3
            )
            SELECT s.doc_id, s.n_grams, s.logw_micro,
                   s.logw_micro >= thr.q3 AS selected
            FROM scored s, thr ORDER BY s.doc_id"""


def incremental_minhash_dedup_sql(threshold_num: int = 1,
                                  threshold_den: int = 2, k: int = 3,
                                  n_base: int = dd.N_BASE_DOCS) -> str:
    """Oracle for dedup.incremental_minhash_dedup: the verified-pair CTEs
    restricted to batch-touching edges (doc_b >= n_base under a < b
    orientation), recursive reachability seeded from ALL docs (so base ids
    propagate into the batch), output filtered to the batch."""
    return (f"WITH RECURSIVE "
            f"{_minhash_verified_pairs_ctes(threshold_num, threshold_den, k)},\n"
            f"""            vnew AS (
              SELECT doc_a, doc_b FROM verified WHERE doc_b >= {n_base}
            ), sym AS (
              SELECT doc_a AS s, doc_b AS d FROM vnew
              UNION ALL SELECT doc_b, doc_a FROM vnew
            ), reach(node, r) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT sym.d, reach.r FROM reach JOIN sym ON sym.s = reach.node
            )
            SELECT node AS doc_id, min(r) AS canonical_id
            FROM reach WHERE node >= {n_base}
            GROUP BY node ORDER BY doc_id""")


def c4_line_dedup_sql(seg_len: int = 10) -> str:
    """Oracle for dedup.c4_line_dedup: disjoint seg_len-token segments via
    integer-divided token subscripts, global first-occurrence ranking by
    (doc_id, seg_no) over the segment STRING (the engine compares 61-bit
    segment hashes; identical up to negligible collisions), and an ordered
    string_agg rebuild keeping empty/fully-deduped docs via COALESCE."""
    return rf"""
            WITH tok_arr AS (
              SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                         x -> x <> '') AS toks
              FROM documents
            ), tl AS (
              SELECT doc_id, generate_subscripts(toks, 1) AS i, unnest(toks) AS w
              FROM tok_arr
            ), segs AS (
              SELECT doc_id, (i - 1) // {seg_len} AS seg_no,
                     string_agg(w, ' ' ORDER BY i) AS seg
              FROM tl GROUP BY doc_id, (i - 1) // {seg_len}
            ), ranked AS (
              SELECT doc_id, seg_no, seg,
                     row_number() OVER (PARTITION BY seg
                                        ORDER BY doc_id, seg_no) AS rn
              FROM segs
            ), kept AS (
              SELECT doc_id, seg_no, seg FROM ranked WHERE rn = 1
            ), agg AS (
              SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_no) AS text_clean,
                     count(*) AS nk
              FROM kept GROUP BY doc_id
            ), ns AS (
              SELECT doc_id, count(*) AS n FROM segs GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(a.text_clean, '') AS text_clean,
                   (COALESCE(ns.n, 0) - COALESCE(a.nk, 0))::BIGINT
                     AS n_lines_removed
            FROM documents d
            LEFT JOIN agg a ON a.doc_id = d.doc_id
            LEFT JOIN ns ON ns.doc_id = d.doc_id
            ORDER BY d.doc_id"""


def host_boilerplate_strip_sql(seg_len: int = 10, min_docs: int = 2) -> str:
    """Oracle for dedup.host_boilerplate_strip: same disjoint-segment unit
    as c4_line_dedup_sql, but the drop rule is per-SOURCE template
    boilerplate — a segment STRING occurring in >= min_docs DISTINCT
    documents of the same source loses EVERY occurrence in that source
    (no first-kept)."""
    return rf"""
            WITH tok_arr AS (
              SELECT doc_id, source,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ), tl AS (
              SELECT doc_id, source, generate_subscripts(toks, 1) AS i,
                     unnest(toks) AS w
              FROM tok_arr
            ), segs AS (
              SELECT doc_id, source, (i - 1) // {seg_len} AS seg_no,
                     string_agg(w, ' ' ORDER BY i) AS seg
              FROM tl GROUP BY doc_id, source, (i - 1) // {seg_len}
            ), per AS (
              SELECT source, seg, count(DISTINCT doc_id) AS nd
              FROM segs GROUP BY source, seg
            ), kept AS (
              SELECT s.doc_id, s.seg_no, s.seg
              FROM segs s JOIN per p ON p.source = s.source AND p.seg = s.seg
              WHERE p.nd < {min_docs}
            ), agg AS (
              SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_no) AS text_clean,
                     count(*) AS nk
              FROM kept GROUP BY doc_id
            ), ns AS (
              SELECT doc_id, count(*) AS n FROM segs GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(a.text_clean, '') AS text_clean,
                   (COALESCE(ns.n, 0) - COALESCE(a.nk, 0))::BIGINT
                     AS n_lines_removed
            FROM documents d
            LEFT JOIN agg a ON a.doc_id = d.doc_id
            LEFT JOIN ns ON ns.doc_id = d.doc_id
            ORDER BY d.doc_id"""


def bm25_topk_sql(k: int = 10) -> str:
    """Oracle for text.bm25_topk, generated from the engine's own query set
    and constants: per-term contributions ROUND(idf * tfn * 1e6) to BIGINT
    micros BEFORE the per-doc sum (order-independent), (1.2 + 1.0) written as
    a SUM so DuckDB computes the same double the engine's k1+1.0 does (the
    literal 2.2 is one ulp away), idf/tf/dl all from exact integers."""
    from .ops import text as _tx

    qvals = ", ".join(
        f"({qid}, '{w}')"
        for qid, q in enumerate(_tx._BM25_QUERIES) for w in q.split()
    )
    k1, b = _tx._BM25_K1, _tx._BM25_B
    return rf"""
            WITH tok_arr AS (
              SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                         x -> x <> '') AS toks
              FROM documents
            ), tl AS (
              SELECT doc_id, unnest(toks) AS w FROM tok_arr
            ), dl AS (
              SELECT d.doc_id, COALESCE(c.n, 0)::BIGINT AS dl
              FROM documents d
              LEFT JOIN (SELECT doc_id, count(*) AS n FROM tl GROUP BY doc_id) c
                ON c.doc_id = d.doc_id
            ), st AS (
              SELECT count(*)::DOUBLE AS n,
                     (sum(dl)::DOUBLE / count(*)::DOUBLE) AS avgdl
              FROM dl
            ), qt AS (
              SELECT * FROM (VALUES {qvals}) q(query_id, term)
            ), tf AS (
              SELECT q.query_id, q.term, t.doc_id, count(*)::DOUBLE AS tf
              FROM tl t JOIN qt q ON t.w = q.term
              GROUP BY q.query_id, q.term, t.doc_id
            ), dfr AS (
              SELECT query_id, term, count(*)::DOUBLE AS df
              FROM tf GROUP BY query_id, term
            ), contrib AS (
              SELECT tf.query_id, tf.doc_id,
                     ROUND(ln(1.0 + ((SELECT n FROM st) - dfr.df + 0.5)
                                    / (dfr.df + 0.5))
                           * (tf.tf * ({k1!r} + 1.0)
                              / (tf.tf + {k1!r} * ((1.0 - {b!r})
                                 + {b!r} * dl.dl / (SELECT avgdl FROM st))))
                           * 1000000)::BIGINT AS cm
              FROM tf
              JOIN dfr ON dfr.query_id = tf.query_id AND dfr.term = tf.term
              JOIN dl ON dl.doc_id = tf.doc_id
            ), score AS (
              SELECT query_id, doc_id, sum(cm)::BIGINT AS score_micro
              FROM contrib GROUP BY query_id, doc_id
              HAVING sum(cm) > 0
            ), ranked AS (
              SELECT query_id, doc_id, score_micro,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score_micro DESC, doc_id)
                       AS rnk
              FROM score
            )
            SELECT query_id::BIGINT AS query_id, rnk::BIGINT AS rnk,
                   doc_id, score_micro
            FROM ranked WHERE rnk <= {k}
            ORDER BY query_id, rnk"""


def kmv_distinct_tokens_sql(k: int = 16) -> str:
    """Oracle for text.kmv_distinct_tokens: the k smallest DISTINCT 63-bit
    token hashes (md5-prefix-64 >> 1) via ORDER BY/LIMIT; pure-integer
    estimate (UHUGEINT division = the engine's Python // )."""
    return rf"""
            WITH tok_arr AS (
              SELECT list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ), hs AS (
              SELECT DISTINCT
                (('0x' || substr(md5(unnest(toks)), 1, 16))::UBIGINT
                 >> 1)::BIGINT AS h
              FROM tok_arr
            ), topk AS (
              SELECT h FROM hs ORDER BY h LIMIT {k}
            ), agg AS (
              SELECT count(*)::BIGINT AS n_seen,
                     COALESCE(max(h), 0)::BIGINT AS kth
              FROM topk
            ), tot AS (SELECT count(*)::BIGINT AS n FROM hs)
            SELECT {k}::BIGINT AS k, agg.n_seen,
                   agg.kth AS kth_hash,
                   (CASE WHEN tot.n >= {k} THEN
                      (({k - 1}::UHUGEINT * 9223372036854775808::UHUGEINT)
                       / agg.kth::UHUGEINT)::BIGINT
                    ELSE tot.n END)::BIGINT AS estimate
            FROM agg, tot"""


def source_mix_weighted_sql() -> str:
    """Oracle for curate.source_mix_weighted: the engine's splitmix64 SQL
    builder over doc_id, exact-integer thresholds q * 2^61 with
    q = 2*(source_index % 4) + 1."""
    return rf"""
            WITH s AS (
              SELECT source, doc_id::UBIGINT AS x,
                     CAST(substr(source, 4) AS BIGINT) AS idx
              FROM documents
            ), h AS (
              SELECT source, idx, {_mix64('x')} AS hv FROM s
            ), c AS (
              SELECT source, count(*) AS n_total,
                     sum(CASE WHEN hv < ((2 * (idx % 4) + 1)::UBIGINT
                                         * 2305843009213693952::UBIGINT)
                              THEN 1 ELSE 0 END) AS n_sampled
              FROM h GROUP BY source
            )
            SELECT source, n_total::BIGINT AS n_total,
                   n_sampled::BIGINT AS n_sampled
            FROM c ORDER BY source"""


def cms_sketch_tokens_sql(depth: int = 4, width: int = 1024) -> str:
    """Oracle for text.cms_sketch_tokens: the identical md5-prefix token
    hash and splitmix64 row derivation, cell sums grouped exactly."""
    mix = _mix64("hx")
    return f"""
        WITH tok AS (
          SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
          FROM documents
        ), tc AS (
          SELECT w, count(*)::BIGINT AS c FROM tok WHERE w <> '' GROUP BY w
        ), h AS (
          SELECT c, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS h FROM tc
        ), salted AS (
          SELECT c, d, xor(h, (d + 1)::UBIGINT) AS hx
          FROM h, UNNEST(generate_series(0, {depth - 1})) AS t(d)
        ), cells AS (
          SELECT d, CAST(({mix}) % {width}::UBIGINT AS BIGINT) AS col, c
          FROM salted
        )
        SELECT d, col, SUM(c)::BIGINT AS n
        FROM cells GROUP BY d, col ORDER BY d, col
    """


def winnow_fingerprints_sql(k: int = 3, w: int = 4) -> str:
    """Oracle for dedup.winnow_fingerprints: the same positional gram hash
    as dup_ngram_spans, a w-row window min per position, rightmost-tie
    argmax join, plus the short-document (fewer than w grams) rightmost
    global-min rule."""
    win_joins = "\n".join(
        f"              JOIN th t{j} ON t{j}.doc_id = t0.doc_id"
        f" AND t{j}.i = t0.i + {j}" for j in range(1, k)
    )
    g = f"{_mul64('t0.h', int(dd._POS_MULT[0]))}"
    for j in range(1, k):
        g = f"xor({g}, {_mul64(f't{j}.h', int(dd._POS_MULT[j]))})"
    return rf"""
            WITH tok_arr AS (
              SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                         x -> x <> '') AS toks
              FROM documents
            ), th AS (
              SELECT doc_id, generate_subscripts(toks, 1) AS i,
                     ('0x' || substr(md5(unnest(toks)), 1, 16))::UBIGINT AS h
              FROM tok_arr
            ), g_pos AS (
              SELECT t0.doc_id, t0.i, {g} AS g
              FROM th t0
{win_joins}
            ), s_pos AS (
              SELECT doc_id, i, ({_mix64('g')} & {_MASK61}::UBIGINT) AS s
              FROM g_pos
            ), m AS (
              SELECT doc_id, count(*) AS mg, min(s) AS smin
              FROM s_pos GROUP BY doc_id
            ), wmin AS (
              SELECT doc_id, i,
                     min(s) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS wm,
                     count(*) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS wcnt
              FROM s_pos
            ), sel AS (         -- rightmost position achieving the window min
              SELECT v.doc_id, max(p.i) AS sel_i
              FROM (SELECT doc_id, i AS j, wm FROM wmin WHERE wcnt = {w}) v
              JOIN s_pos p ON p.doc_id = v.doc_id
                AND p.i BETWEEN v.j AND v.j + {w - 1} AND p.s = v.wm
              GROUP BY v.doc_id, v.j
            ), short AS (       -- < w grams: rightmost global min
              SELECT p.doc_id, max(p.i) AS sel_i
              FROM s_pos p JOIN m ON m.doc_id = p.doc_id
                AND m.mg < {w} AND p.s = m.smin
              GROUP BY p.doc_id
            ), allsel AS (
              SELECT DISTINCT doc_id, sel_i FROM (
                SELECT doc_id, sel_i FROM sel
                UNION ALL SELECT doc_id, sel_i FROM short)
            )
            SELECT a.doc_id AS doc_id, a.sel_i AS pos, p.s::BIGINT AS fp
            FROM allsel a JOIN s_pos p
              ON p.doc_id = a.doc_id AND p.i = a.sel_i
            ORDER BY a.doc_id, pos"""


def embedding_similarity_histogram_sql(n_pairs: int = 2000,
                                       n_bins: int = 20) -> str:
    """Oracle for ann.embedding_similarity_histogram: the same splitmix64
    pair sample (shared constants), the same per-product micro-rounded
    integer dot products, and the same integer bin arithmetic."""
    mix_a = _mix64("s.i")
    mix_b = _mix64("s.i2")
    return f"""
        WITH nn AS (SELECT count(*)::UBIGINT AS n FROM embeddings),
        s AS (SELECT i::UBIGINT AS i,
                     (i + 4294967296)::UBIGINT AS i2
              FROM (SELECT unnest(range(0, {n_pairs})) AS i)),
        pr AS (SELECT CAST({mix_a} % nn.n AS BIGINT) AS a,
                      CAST({mix_b} % nn.n AS BIGINT) AS b,
                      s.i AS i
               FROM s, nn),
        pp AS (SELECT * FROM pr WHERE a <> b),
        e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                     unnest(range(0, len(embedding))) AS j
              FROM embeddings),
        d AS (SELECT pp.i AS pi,
                     SUM(CAST(ROUND(ea.x * eb.x * 1000000.0) AS BIGINT))
                       AS dot
              FROM pp JOIN e ea ON ea.vec_id = pp.a
                      JOIN e eb ON eb.vec_id = pp.b AND eb.j = ea.j
              GROUP BY 1),
        mm AS (SELECT min(dot) AS mn, max(dot) AS mx,
                      GREATEST(max(dot) - min(dot), 1) AS span FROM d),
        bn AS (SELECT LEAST((dot - mn) * {n_bins} // span, {n_bins - 1})
                        AS bin FROM d, mm),
        c AS (SELECT bin, count(*)::BIGINT AS n FROM bn GROUP BY 1),
        g AS (SELECT unnest(range(0, {n_bins})) AS bin)
        SELECT CAST(g.bin AS BIGINT) AS bin,
               mm.mn + g.bin * mm.span // {n_bins} AS lo_micro,
               mm.mn + (g.bin + 1) * mm.span // {n_bins} AS hi_micro,
               COALESCE(c.n, 0)::BIGINT AS n_pairs
        FROM g CROSS JOIN mm LEFT JOIN c ON c.bin = g.bin
        ORDER BY 1
    """


def global_shuffle_sql(n_shards: int = 16, seed: int = 0) -> str:
    """Oracle for curate.global_shuffle: the shared splitmix64 SQL builder
    over doc_id XOR mix(seed), shard = key mod n_shards, pos = dense rank
    within shard ordered by (key, doc_id)."""
    seed_mix = dd._mix64_int(int(seed))
    return rf"""
            WITH s AS (
              SELECT doc_id, xor(doc_id::UBIGINT, {seed_mix}::UBIGINT) AS x
              FROM documents
            ), h AS (
              SELECT doc_id, {_mix64('x')} AS hv FROM s
            )
            SELECT doc_id,
                   (hv % {n_shards}::UBIGINT)::BIGINT AS shard,
                   (ROW_NUMBER() OVER (
                      PARTITION BY hv % {n_shards}::UBIGINT
                      ORDER BY hv, doc_id) - 1)::BIGINT AS pos
            FROM h
            ORDER BY doc_id"""


def export_shuffled_shards_sql(n_shards: int = 16, seed: int = 0) -> str:
    """Oracle for curate.export_shuffled_shards: the global_shuffle order
    APPLIED to the JSONL publish.  Per shard: doc count, exact byte count
    of the byte-deterministic line format (string-concat twin, ASCII
    corpus), and the ORDER-SENSITIVE signature
    ``bit_xor(splitmix64(doc_id XOR rank1*GOLD)) & (2^63-1)`` over rows in
    written (hv, doc_id) order — xor commutes with the bitwise mask, so
    masking per term equals the engine's mask-after-fold."""
    from .ops.curate import _SIG_GOLD

    seed_mix = dd._mix64_int(int(seed))
    return rf"""
            WITH s AS (
              SELECT doc_id, lang, source, text,
                     xor(doc_id::UBIGINT, {seed_mix}::UBIGINT) AS x
              FROM documents
            ), h AS (
              SELECT doc_id, lang, source, text, {_mix64('x')} AS hv FROM s
            ), r AS (
              SELECT doc_id, lang, source, text,
                     (hv % {n_shards}::UBIGINT)::BIGINT AS shard,
                     ROW_NUMBER() OVER (
                        PARTITION BY hv % {n_shards}::UBIGINT
                        ORDER BY hv, doc_id)::UBIGINT AS rank1
              FROM h
            ), t AS (
              SELECT shard,
                     length('{{"doc_id":' || doc_id || ',"lang":"' || lang ||
                            '","source":"' || source || '","text":"' || text ||
                            '"}}') + 1 AS nb,
                     xor(doc_id::UBIGINT, {_mul64('rank1', _SIG_GOLD)}) AS xs
              FROM r
            ), g AS (
              SELECT shard, nb, {_mix64('xs')} AS sv FROM t
            )
            SELECT shard, count(*)::BIGINT AS n_docs,
                   sum(nb)::BIGINT AS n_bytes,
                   (bit_xor(sv) & {_MASK63}::UBIGINT)::BIGINT AS order_sig
            FROM g GROUP BY shard ORDER BY shard"""


def dataset_split_assign_sql(seed: int = 0) -> str:
    """Oracle for curate.dataset_split_assign: shared splitmix64 builder,
    bucket = h mod 1000, <10 test / <20 valid / else train; per-split doc,
    \\S+ token, and character sums."""
    seed_mix = dd._mix64_int(int(seed))
    return rf"""
            WITH s AS (
              SELECT doc_id, text,
                     xor(doc_id::UBIGINT, {seed_mix}::UBIGINT) AS x
              FROM documents
            ), h AS (
              SELECT doc_id, text,
                     ({_mix64('x')} % (1000)::UBIGINT) AS b FROM s
            ), a AS (
              SELECT CASE WHEN b < 10 THEN 'test'
                          WHEN b < 20 THEN 'valid'
                          ELSE 'train' END AS split,
                     len(regexp_extract_all(text, '\S+'))::BIGINT AS nt,
                     length(text)::BIGINT AS nc
              FROM h
            )
            SELECT split, count(*)::BIGINT AS n_docs,
                   sum(nt)::BIGINT AS n_tokens, sum(nc)::BIGINT AS n_chars
            FROM a GROUP BY split ORDER BY split"""


def cap_per_source_sql(k: int = 10) -> str:
    """Oracle for curate.cap_per_source: the engine's splitmix64 priority
    over doc_id, per-source row_number cap."""
    return rf"""
            WITH s AS (
              SELECT doc_id, source, doc_id::UBIGINT AS x FROM documents
            ), h AS (
              SELECT doc_id, source, {_mix64('x')} AS pr FROM s
            )
            SELECT doc_id, source FROM h
            QUALIFY row_number() OVER (
              PARTITION BY source ORDER BY pr, doc_id) <= {k}
            ORDER BY doc_id"""


def zorder_manifest_sql(bits: int = 8, shard_bits: int = 4) -> str:
    """Oracle for relational.zorder_layout_events: the same monotone scaled
    bins and generated Morton bit-interleave, manifest aggregates grouped by
    the top shard_bits code bits."""
    morton = " + ".join(
        [f"(((ub >> {i}) & 1) * {1 << (2 * i)})" for i in range(bits)]
        + [f"(((tb >> {i}) & 1) * {1 << (2 * i + 1)})" for i in range(bits)]
    )
    return f"""
            WITH e AS (
              SELECT user_id,
                     epoch_us(date_trunc('hour', ts)) // 3600000000 AS hour
              FROM events),
            s AS (SELECT max(user_id) AS mu, min(hour) AS lo, max(hour) AS hi
                  FROM e),
            b AS (
              SELECT user_id, hour,
                     (user_id * {1 << bits}) // (s.mu + 1) AS ub,
                     ((hour - s.lo) * {1 << bits}) // (s.hi - s.lo + 1) AS tb
              FROM e, s),
            m AS (SELECT user_id, hour, ({morton}) AS morton FROM b)
            SELECT (morton >> {2 * bits - shard_bits}) AS shard,
                   count(*) AS n_rows,
                   min(user_id) AS min_user, max(user_id) AS max_user,
                   min(hour) AS min_hour, max(hour) AS max_hour
            FROM m GROUP BY 1 ORDER BY shard"""


def join_size_estimate_sql(depth: int = 4, width: int = 1024) -> str:
    """Oracle for relational.join_size_estimate: both CMS cell matrices
    rebuilt with the engine's splitmix row hashes, the min-over-rows inner
    product, and the exact join count."""
    mix_h = _mix64("kx")
    mix_j = _mix64("hx")

    def cells(table: str, col: str) -> str:
        return f"""(
          WITH kc AS (
            SELECT {col}::UBIGINT AS kx, count(*)::BIGINT AS c
            FROM {table} GROUP BY 1
          ), h AS (
            SELECT c, {mix_h} AS h0 FROM kc
          ), salted AS (
            SELECT c, d, xor(h0, (d + 1)::UBIGINT) AS hx
            FROM h, UNNEST(generate_series(0, {depth - 1})) AS t(d)
          )
          SELECT d, CAST(({mix_j}) % {width}::UBIGINT AS BIGINT) AS col,
                 SUM(c)::BIGINT AS n
          FROM salted GROUP BY d, col
        )"""

    return f"""
        WITH ca AS {cells('orders', 'o_orderkey')},
        cb AS {cells('lineitem', 'l_orderkey')}
        SELECT 'cms_estimate' AS name,
               (SELECT min(s) FROM (
                  SELECT a.d, SUM(a.n * b.n) AS s
                  FROM ca a JOIN cb b ON a.d = b.d AND a.col = b.col
                  GROUP BY a.d)) AS value
        UNION ALL
        SELECT 'exact_rows' AS name,
               (SELECT count(*) FROM orders o
                JOIN lineitem l ON o.o_orderkey = l.l_orderkey)::BIGINT
        ORDER BY name
    """


def weighted_paths_sql(max_hops: int = 4) -> str:
    """Oracle for relational.link_weighted_paths: max_hops unrolled
    Bellman-Ford relaxation CTEs over the generated edge weights
    ``1 + (splitmix64(u*4 + s) % 9)``."""
    mix = _mix64("ux")
    edges = f"""
            e AS (
              SELECT d.doc_id AS u,
                     (d.doc_id * 31 + t.s) % (SELECT c FROM nn) AS v,
                     1 + CAST(({mix.replace('ux',
                        '(d.doc_id * 4 + t.s)::UBIGINT')}) % 9::UBIGINT
                        AS BIGINT) AS w
              FROM documents d,
                   UNNEST(generate_series(1, 3)) AS t(s)
            )"""
    ctes = ["d0 AS (SELECT doc_id AS node, 0 AS dist FROM documents "
            "WHERE doc_id % 100 = 0)"]
    for k in range(1, max_hops + 1):
        ctes.append(f"""d{k} AS (
              SELECT node, min(dist) AS dist FROM (
                SELECT node, dist FROM d{k - 1}
                UNION ALL
                SELECT e.v AS node, d{k - 1}.dist + e.w AS dist
                FROM d{k - 1} JOIN e ON e.u = d{k - 1}.node
              ) GROUP BY node)""")
    return f"""
            WITH nn AS (SELECT count(*) AS c FROM documents),{edges},
            {', '.join(ctes)}
            SELECT node AS doc_id, dist FROM d{max_hops} ORDER BY doc_id"""


def zorder_pruned_count_sql(bits: int = 8, shard_bits: int = 4,
                            u_pct: int = 50, h_pct: int = 50) -> str:
    """Oracle for relational.zorder_pruned_count: the manifest CTE (same
    generated Morton interleave), the derived predicate box, the pruned
    shard counter, and the exact filtered row count."""
    man = zorder_manifest_sql(bits, shard_bits).strip()
    return f"""
            WITH man AS ({man}),
            box AS (
              SELECT (max(max_user) * {u_pct}) // 100 AS u_hi,
                     min(min_hour) + ((max(max_hour) - min(min_hour))
                                      * {h_pct}) // 100 AS h_hi
              FROM man)
            SELECT (SELECT count(*) FROM man) AS n_shards_total,
                   (SELECT count(*) FROM man, box
                    WHERE min_user <= u_hi AND min_hour <= h_hi)
                     AS n_shards_read,
                   (SELECT count(*) FROM events, box
                    WHERE user_id <= u_hi
                      AND epoch_us(date_trunc('hour', ts)) // 3600000000
                          <= h_hi) AS n_rows"""


def _recip_edges_cte() -> str:
    """Shared WITH-body building the planted-partner hash graph's distinct
    directed edge set ``e(src, dst)`` — mirrors
    relational._recip_edge_arrays (three splitmix out-edges
    ``mix64(u*4+j) % n`` plus the pair-gated partner edge ``u <-> xor(u,1)``
    iff ``mix64((u>>1)*4) % 4 == 0``, self-loops dropped)."""
    hmix = _mix64("hin")
    gmix = _mix64("gin")
    return f"""nn AS (SELECT count(*) AS n FROM documents),
            hi AS (
              SELECT doc_id AS u, (doc_id * 4 + v.j)::UBIGINT AS hin
              FROM documents, (VALUES (1), (2), (3)) v(j)),
            he AS (
              SELECT u, CAST(({hmix}) % (SELECT n FROM nn)::UBIGINT
                             AS BIGINT) AS dst
              FROM hi),
            gi AS (
              SELECT doc_id AS u, ((doc_id >> 1) * 4)::UBIGINT AS gin
              FROM documents),
            pe AS (
              SELECT u, CAST(xor(u::UBIGINT, 1::UBIGINT) AS BIGINT) AS dst
              FROM gi, nn
              WHERE ({gmix}) % 4::UBIGINT = 0::UBIGINT
                AND CAST(xor(u::UBIGINT, 1::UBIGINT) AS BIGINT) < nn.n),
            e AS (SELECT DISTINCT u AS src, dst
                  FROM (SELECT * FROM he UNION ALL SELECT * FROM pe)
                  WHERE u <> dst)"""


def reciprocal_links_sql() -> str:
    """Oracle for relational.reciprocal_links: the generated hash graph
    (_recip_edges_cte) and the mutual-pair self-join."""
    return f"""
            WITH {_recip_edges_cte()}
            SELECT x.src AS doc_a, x.dst AS doc_b
            FROM e x JOIN e y ON x.src = y.dst AND x.dst = y.src
            WHERE x.src < x.dst
            ORDER BY doc_a, doc_b"""


def robots_gate_sql() -> str:
    """Oracle for relational.robots_gate: rebuild the generated per-host
    rule table (md5-60 host hash -> four splitmix rules) and resolve each
    doc's longest-prefix match (max depth, ties to disallow via min(allow)),
    defaulting unmatched docs to allow."""
    m1 = _mix64("i1")
    m2 = _mix64("i2")
    mask = (1 << 60) - 1
    return f"""
            WITH src AS (SELECT DISTINCT source FROM documents),
            h AS (SELECT source,
                         ('0x' || substr(md5(source), 1, 16))::UBIGINT
                           & {mask}::UBIGINT AS hv
                  FROM src),
            ri AS (SELECT source, r,
                          (hv * 8::UBIGINT + r::UBIGINT)::UBIGINT AS i1,
                          (hv * 8::UBIGINT + 4::UBIGINT
                             + r::UBIGINT)::UBIGINT AS i2
                   FROM h, (VALUES (0), (1), (2), (3)) v(r)),
            mx AS (SELECT source, r, CAST(({m1}) AS UBIGINT) AS m1,
                          CAST(({m2}) AS UBIGINT) AS m2 FROM ri),
            rules AS (SELECT source,
                             CASE WHEN r >= 2 THEN 2 ELSE 1 END AS depth,
                             CAST(m1 % 7::UBIGINT AS BIGINT) AS s_val,
                             CAST(CASE WHEN r >= 2 THEN m2 % 13::UBIGINT
                                  ELSE 0::UBIGINT END AS BIGINT)
                               - CASE WHEN r >= 2 THEN 0 ELSE 1 END AS t_val,
                             CAST((m1 >> 32) & 1::UBIGINT AS BIGINT) AS allow
                      FROM mx),
            mm AS (SELECT d.doc_id, d.source, ru.depth, ru.allow
                   FROM documents d LEFT JOIN rules ru
                     ON d.source = ru.source
                    AND ru.s_val = d.doc_id % 7
                    AND (ru.depth = 1 OR ru.t_val = d.doc_id % 13)),
            w AS (SELECT doc_id, source, depth, allow,
                         max(depth) OVER (PARTITION BY doc_id) AS md
                  FROM mm),
            dec AS (SELECT doc_id, any_value(source) AS source,
                           COALESCE(min(CASE WHEN depth = md THEN allow END),
                                    1) AS a
                    FROM w GROUP BY doc_id)
            SELECT source, sum(a)::BIGINT AS n_allowed,
                   (count(*) - sum(a))::BIGINT AS n_denied
            FROM dec GROUP BY source ORDER BY source"""


def link_prediction_ra_sql(k: int = 50) -> str:
    """Oracle for relational.link_prediction_ra: undirected-ize the shared
    generated edge set, wedge self-join through each center with the
    all-integer resource-allocation weight ``2^20 // deg(center)``, drop
    adjacent pairs, top-k by (score DESC, doc_a, doc_b)."""
    return f"""
            WITH {_recip_edges_cte()},
            ue AS (SELECT DISTINCT least(src, dst) AS a,
                                   greatest(src, dst) AS b FROM e),
            adj AS (SELECT a AS node, b AS nbr FROM ue
                    UNION ALL SELECT b, a FROM ue),
            deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node),
            w AS (SELECT x.nbr AS u, y.nbr AS v,
                         (1048576 // deg.d)::BIGINT AS sc
                  FROM adj x JOIN adj y ON x.node = y.node AND x.nbr < y.nbr
                  JOIN deg ON deg.node = x.node),
            p AS (SELECT u, v, sum(sc)::BIGINT AS ra_score
                  FROM w GROUP BY u, v),
            np AS (SELECT p.* FROM p
                   ANTI JOIN ue ON p.u = ue.a AND p.v = ue.b)
            SELECT u AS doc_a, v AS doc_b, ra_score FROM np
            ORDER BY ra_score DESC, doc_a, doc_b LIMIT {k}"""


def k_core_sql(k: int = 4, rounds: int = 6) -> str:
    """Oracle for relational.k_core_docs: `rounds` unrolled degree/survivor
    CTE pairs over the generated variable-out-degree + quadratic edge set,
    then the final restricted-degree output with zero-degree survivors."""
    def deg_cte(i: int, prev: str) -> str:
        return f"""d{i} AS MATERIALIZED (
              SELECT node, count(*)::BIGINT AS deg FROM (
                SELECT e.a AS node FROM e
                  JOIN {prev} x ON e.a = x.node JOIN {prev} y ON e.b = y.node
                UNION ALL
                SELECT e.b FROM e
                  JOIN {prev} x ON e.a = x.node JOIN {prev} y ON e.b = y.node
              ) GROUP BY node)"""
    ctes = ["""e0 AS (
              SELECT doc_id AS u,
                     (doc_id * 31 + v.s) % (SELECT n FROM nn) AS w
              FROM documents, (VALUES (1), (2), (3)) v(s)
              WHERE (doc_id % 3) >= v.s - 1
              UNION ALL
              SELECT doc_id, (doc_id * doc_id + 1) % (SELECT n FROM nn)
              FROM documents)""",
            "e AS MATERIALIZED (SELECT DISTINCT least(u, w) AS a, "
            "greatest(u, w) AS b FROM e0 WHERE u <> w)",
            "a0 AS MATERIALIZED (SELECT doc_id AS node FROM documents)"]
    for i in range(1, rounds + 1):
        ctes.append(deg_cte(i, f"a{i-1}"))
        ctes.append(
            f"a{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE deg >= {k})")
    ctes.append(deg_cte(rounds + 1, f"a{rounds}"))
    return f"""
            WITH nn AS (SELECT count(*) AS n FROM documents),
            {', '.join(ctes)}
            SELECT x.node AS doc_id,
                   coalesce(d.deg, 0)::BIGINT AS core_degree
            FROM a{rounds} x LEFT JOIN d{rounds + 1} d ON d.node = x.node
            ORDER BY doc_id"""


def winnow_overlap_pairs_sql(k: int = 3, w: int = 4,
                             min_shared: int = 2) -> str:
    """Oracle for dedup.winnow_overlap_pairs: the winnow_fingerprints query
    nested as a CTE, distinct (doc, fp), fingerprint self-join, count cut."""
    inner = winnow_fingerprints_sql(k, w)
    return f"""
            WITH wf AS ({inner}),
            d AS (SELECT DISTINCT doc_id, fp FROM wf),
            p AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     count(*)::BIGINT AS n_shared
              FROM d a JOIN d b ON a.fp = b.fp AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT doc_a, doc_b, n_shared FROM p
            WHERE n_shared >= {min_shared}
            ORDER BY doc_a, doc_b"""


def kmv_token_overlap_sql(k: int = 16) -> str:
    """Oracle for text.kmv_token_overlap: per-side k-min distinct token
    hashes (lang = 'en' vs the rest), KMV union sketch, and the integer
    Theta-style intersection estimate — every value recomputed exactly."""
    def side_cte(name: str, pred: str) -> str:
        return rf"""{name}h AS (
              SELECT DISTINCT
                (('0x' || substr(md5(unnest(list_filter(
                    string_split_regex(lower(text), '\s+'),
                    x -> x <> ''))), 1, 16))::UBIGINT >> 1)::BIGINT AS h
              FROM documents WHERE {pred}
            ), {name}k AS (SELECT h FROM {name}h ORDER BY h LIMIT {k})"""

    return rf"""
            WITH {side_cte('a', "lang = 'en'")},
            {side_cte('b', "lang <> 'en'")},
            uall AS (SELECT h FROM ak UNION SELECT h FROM bk),
            nu AS (SELECT count(*)::BIGINT AS n FROM uall),
            u AS (SELECT h FROM uall ORDER BY h LIMIT {k}),
            agg AS (SELECT COALESCE(max(h), 0)::BIGINT AS kth FROM u),
            mm AS (SELECT count(*)::BIGINT AS matches FROM u
                   WHERE h IN (SELECT h FROM ak)
                     AND h IN (SELECT h FROM bk)),
            eu AS (SELECT CASE WHEN nu.n >= {k} THEN
                     (({k - 1}::UHUGEINT * 9223372036854775808::UHUGEINT)
                      // agg.kth::UHUGEINT)::BIGINT
                   ELSE nu.n END AS est FROM nu, agg)
            SELECT {k}::BIGINT AS k, agg.kth AS kth_union,
                   eu.est::BIGINT AS est_union, mm.matches,
                   (CASE WHEN nu.n >= {k} THEN
                      ((mm.matches::UHUGEINT * eu.est::UHUGEINT)
                       // {k}::UHUGEINT)::BIGINT
                    ELSE mm.matches END)::BIGINT AS est_intersection
            FROM agg, mm, eu, nu"""
