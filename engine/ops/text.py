"""Text-analysis operators over the ``documents`` table.

Covers the reference's latent text surface (SURVEY.md §2.2): category
classification M11 (``SharePointClient.cs:54-60``), stop-word keywording M12
(``SharePointClient.cs:61-64``), chunking M13 (``RagIngestDocument.cs:42-43``
defaults 1400/300) — plus the large-scale-pipeline text ops: token counting,
quality scoring, language-ID, and document fingerprinting.
"""

from __future__ import annotations

import hashlib
import os
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .io import read_pruned

# The reference's stop-word set, verbatim (SharePointClient.cs:61-64).
STOP_WORDS = (
    "the and for with that this from have will their are was were has had but "
    "not you your about into can shall may might should could been being over "
    "under after before between within upon without including include such "
    "each any other more most some than too very one two three"
).split()

# The reference's category cascade, in declaration order (SharePointClient.cs:54-60):
# first match wins; no match -> "General".
CATEGORY_PATTERNS = (
    (r"(?i)\b(hr|human resources|employee)\b", "HR"),
    (r"(?i)\b(it|information technology|software|system)\b", "IT"),
    (r"(?i)\b(policy|procedure|guideline)\b", "Policy"),
    (r"(?i)\b(form|template)\b", "Form"),
)

CHUNK_SIZE = 1400     # chars; reference default ChunkSize (RagIngestDocument.cs:42)
CHUNK_OVERLAP = 300   # reference default ChunkOverlap (RagIngestDocument.cs:43)
CHUNK_STEP = CHUNK_SIZE - CHUNK_OVERLAP

TOKEN_CHUNK_SIZE = 350   # tokens; the values the app actually passes (MainForm.cs:92)
TOKEN_CHUNK_OVERLAP = 80
TOKEN_CHUNK_STEP = TOKEN_CHUNK_SIZE - TOKEN_CHUNK_OVERLAP


def _docs(sf_dir: str, columns):
    return read_pruned(os.path.join(sf_dir, "documents.parquet"), columns)


def token_count(sf_dir: str) -> pd.DataFrame:
    """doc_id, n_tokens — vectorized regex token count (pc kernel, no Python loop)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    out = (
        ds.map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t["doc_id"],
                    "n_tokens": pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def quality_score(sf_dir: str) -> pd.DataFrame:
    """Per-doc quality signals as exact integers: tokens, stopword hits, chars.

    (Ratios are left to the consumer: integer outputs keep the DuckDB
    value-hash comparison float-free.)
    """
    stop_arr = pa.array(STOP_WORDS, pa.string())
    ds = _docs(sf_dir, ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = pc.list_flatten(toks)
        is_stop = pc.is_in(flat, value_set=stop_arr)
        # per-row stop counts via list offsets
        offsets = np.zeros(len(toks) + 1, dtype=np.int64)
        np.cumsum([len(x) for x in toks.to_pylist()], out=offsets[1:])
        stop_np = is_stop.to_numpy(zero_copy_only=False).astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(stop_np)])
        n_stop = csum[offsets[1:]] - csum[offsets[:-1]]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
                "n_stop": pa.array(n_stop, pa.int64()),
                "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        )

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def classify(sf_dir: str) -> pd.DataFrame:
    """doc_id, category — the reference's first-match regex cascade (M11)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def cat(t: pa.Table) -> pa.Table:
        n = t.num_rows
        result = np.full(n, "General", dtype=object)
        undecided = np.ones(n, dtype=bool)
        for pattern, label in CATEGORY_PATTERNS:
            hit = pc.match_substring_regex(t["text"], pattern).to_numpy(zero_copy_only=False)
            take = undecided & hit
            result[take] = label
            undecided &= ~hit
        return pa.table({"doc_id": t["doc_id"], "category": pa.array(result, pa.string())})

    out = ds.map_batches(cat, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def keywords_topk(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Global top-k non-stopword terms (M12): per-batch partial counts ->
    tiny groupby over partials -> deterministic (n desc, term asc) top-k."""
    stop = set(STOP_WORDS)
    ds = _docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in t["text"].to_pylist():
            for w in txt.lower().split():
                if w and w not in stop:
                    c[w] += 1
        items = sorted(c.items())
        return pa.table(
            {
                "term": pa.array([w for w, _ in items], pa.string()),
                "n": pa.array([n for _, n in items], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    merged = merged.sort_values(["n", "term"], ascending=[False, True], kind="mergesort")
    return merged.head(k).reset_index(drop=True)


def tfidf_topk(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Per-document top-k terms by TF-IDF (whitespace tokens, lowercased).

    Scale shape: (doc_id, term, tf) partials come out of a vectorized
    ``map_batches`` (Arrow split/flatten + one pandas groupby — the text
    column never leaves the batch); ``df`` is computed WITHIN a
    term-hash coarse-bucket shuffle (same term -> same bucket, so the
    per-term distinct-doc count is bucket-local) and attached to the tf
    rows in the same group; the per-doc top-k ranks inside a doc-bucket
    shuffle, vectorized in pandas.  N comes from parquet metadata.  Two
    all-to-alls total, each over narrow (doc_id, term, tf) rows.

    ``score = round(tf * ln(N / df), 6)`` — rounded in BOTH this op and
    the DuckDB oracle so cross-library libm ulp noise cannot flip the
    value hash; ties rank by term ascending.
    """
    import pyarrow.parquet as _pqm

    n_total = _pqm.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    N_BUCKETS = 64
    ds = _docs(sf_dir, ["doc_id", "text"])

    def tf_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        d = pd.DataFrame({
            "doc_id": t["doc_id"].take(parent).to_numpy(zero_copy_only=False),
            "term": flat.to_pandas(),
        })
        d = d[d["term"] != ""]
        tf = d.groupby(["doc_id", "term"], sort=False).size().reset_index(name="tf")
        tbucket = pd.util.hash_array(tf["term"].to_numpy(dtype=object)) % N_BUCKETS
        return pa.table({
            "doc_id": pa.array(tf["doc_id"].to_numpy(), pa.int64()),
            "term": pa.array(tf["term"], pa.string()),
            "tf": pa.array(tf["tf"].to_numpy(), pa.int64()),
            "tbucket": pa.array(tbucket.astype(np.int32), pa.int32()),
        })

    def attach_df(g: pd.DataFrame) -> pa.Table:
        # rows are unique (doc, term) pairs, so df = per-term group size
        dfc = g.groupby("term")["term"].transform("size").to_numpy()
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
            "term": pa.array(g["term"], pa.string()),
            "tf": pa.array(g["tf"].to_numpy(), pa.int64()),
            "df": pa.array(dfc, pa.int64()),
            "dbucket": pa.array(
                (g["doc_id"].to_numpy() % N_BUCKETS).astype(np.int32), pa.int32()),
        })

    def topk_per_doc(g: pd.DataFrame) -> pa.Table:
        score = np.round(
            g["tf"].to_numpy() * np.log(n_total / g["df"].to_numpy()), 6)
        d = g.assign(score=score).sort_values(
            ["doc_id", "score", "term"], ascending=[True, False, True],
            kind="mergesort")
        d = d.groupby("doc_id", sort=False).head(k)
        return pa.table({
            "doc_id": pa.array(d["doc_id"].to_numpy(), pa.int64()),
            "term": pa.array(d["term"], pa.string()),
            "tf": pa.array(d["tf"].to_numpy(), pa.int64()),
            "df": pa.array(d["df"].to_numpy(), pa.int64()),
            "score": pa.array(d["score"].to_numpy(), pa.float64()),
        })

    out = (
        ds.map_batches(tf_partial, batch_format="pyarrow", batch_size=4096)
        .groupby("tbucket")
        .map_groups(attach_df, batch_format="pandas")
        .groupby("dbucket")
        .map_groups(topk_per_doc, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(
        ["doc_id", "score", "term"], ascending=[True, False, True],
        kind="mergesort").reset_index(drop=True)


def lang_counts(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Count

    ds = _docs(sf_dir, ["lang"])
    out = ds.groupby("lang").aggregate(Count(alias_name="n")).to_pandas()
    return out.sort_values("lang").reset_index(drop=True)


# Character-frequency profiles for a tiny n-gram-free language-ID heuristic.
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is"},
    "de": {"der", "die", "und", "das", "ist", "nicht"},
    "fr": {"le", "la", "et", "les", "des", "est"},
    "es": {"el", "la", "de", "que", "los", "una"},
}


def langid_predict(sf_dir: str) -> pd.DataFrame:
    """Heuristic language ID (stop-word profile votes; 'und' = undetermined).

    Deterministic: ties break on profile-name order (strict-greater scan
    over sorted names).  The DuckDB oracle mirrors this exactly — distinct
    word-set intersections per profile + an ordered CASE argmax, generated
    from ``_LANG_PROFILES`` in ``__ray_entry__.oracle_sql``.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    def predict(t: pa.Table) -> pa.Table:
        preds = []
        for txt in t["text"].to_pylist():
            words = set(txt.lower().split())
            best, best_n = "und", 0
            for lang in sorted(_LANG_PROFILES):
                n = len(words & _LANG_PROFILES[lang])
                if n > best_n:
                    best, best_n = lang, n
            preds.append(best)
        return pa.table({"doc_id": t["doc_id"], "lang_pred": pa.array(preds, pa.string())})

    out = ds.map_batches(predict, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def fingerprint_md5(sf_dir: str) -> pd.DataFrame:
    """doc_id, fp — md5 content fingerprint (matches DuckDB md5())."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        digests = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "fp": pa.array(digests, pa.string())})

    out = ds.map_batches(fp, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# Rolling-hash constants: polynomial base B over the natural uint64 ring
# (mod 2^64 — numpy's unsigned wraparound IS the modulus, so every step is a
# plain vectorized op; B is odd, hence invertible mod 2^64).
_ROLL_B = np.uint64(1000003)
_ROLL_INVB = np.uint64(pow(1000003, -1, 1 << 64))
_POW_CACHE: dict = {}


def _roll_pow_tables(n: int):
    """pow[i] = B^i and invpow[i] = B^-i (mod 2^64), grown geometrically and
    cached per worker — the only sequential part, paid once."""
    tbl = _POW_CACHE.get("t")
    if tbl is None or len(tbl[0]) < n:
        m = max(n, 4096, 0 if tbl is None else 2 * len(tbl[0]))
        pw = np.empty(m, np.uint64)
        pw[0] = 1
        np.multiply.accumulate(np.full(m - 1, _ROLL_B, np.uint64), out=pw[1:])
        iv = np.empty(m, np.uint64)
        iv[0] = 1
        np.multiply.accumulate(np.full(m - 1, _ROLL_INVB, np.uint64), out=iv[1:])
        tbl = (pw, iv)
        _POW_CACHE["t"] = tbl
    return tbl


def _roll_fp_one(b: np.ndarray, window: int) -> int:
    """Min of the w-byte rolling polynomial hashes of one doc — fully
    vectorized: h_i = B^{i+w-1} * (T[i+w] - T[i]) where T is the cumulative
    sum of b[t]*B^-t; all arithmetic wraps mod 2^64."""
    n = len(b)
    pw, iv = _roll_pow_tables(max(n, window) + 1)
    if n == 0:
        return 0
    bu = b.astype(np.uint64)
    if n < window:
        h = np.uint64((bu * pw[n - 1 :: -1][:n]).sum(dtype=np.uint64))
        return int(h & np.uint64((1 << 63) - 1))
    contrib = bu * iv[:n]
    T = np.empty(n + 1, np.uint64)
    T[0] = 0
    np.cumsum(contrib, out=T[1:])
    H = (T[window:] - T[:-window]) * pw[window - 1 : n]
    return int(int(H.min()) & ((1 << 63) - 1))


def fingerprint_rolling(sf_dir: str, window: int = 16) -> pd.DataFrame:
    """doc_id, fp — min-of-rolling-polynomial-hash fingerprint (winnowing-style).

    Deterministic; DuckDB-oracle-checked (HUGEINT ring arithmetic over
    hex-extracted bytes, powers generated from _ROLL_B).  The
    hash ring is mod 2^64 so each doc is a handful of numpy kernels, not a
    per-byte Python loop (VERDICT r1 "what's wrong" #4).
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        outs = [
            _roll_fp_one(np.frombuffer(s.encode("utf-8"), dtype=np.uint8), window)
            for s in t["text"].to_pylist()
        ]
        return pa.table({"doc_id": t["doc_id"], "fp": pa.array(outs, pa.int64())})

    out = ds.map_batches(fp, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def chunk_documents(sf_dir: str) -> pd.DataFrame:
    """Sliding-window character chunking (M13; reference defaults 1400/300).

    n_chunks = 1 if len <= SIZE else ceil((len - SIZE) / STEP) + 1;
    chunk i covers [i*STEP, i*STEP + SIZE).  One doc row -> N chunk rows
    (flat-map shape via map_batches).
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    def chunks(t: pa.Table) -> pa.Table:
        ids, idxs, texts = [], [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            n = len(s)
            n_chunks = 1 if n <= CHUNK_SIZE else -(-(n - CHUNK_SIZE) // CHUNK_STEP) + 1
            for i in range(n_chunks):
                ids.append(did)
                idxs.append(i)
                texts.append(s[i * CHUNK_STEP : i * CHUNK_STEP + CHUNK_SIZE])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "chunk_index": pa.array(idxs, pa.int64()),
                "chunk": pa.array(texts, pa.string()),
            }
        )

    out = ds.map_batches(chunks, batch_format="pyarrow").to_pandas()
    return out.sort_values(["doc_id", "chunk_index"]).reset_index(drop=True)


def chunk_tokens(sf_dir: str) -> pd.DataFrame:
    """Token-window chunking with the reference app's 350/80 values
    (``MainForm.cs:92`` -> ``SharePointClient.cs:49-50``).

    Tokens are single-space splits (matching SQL string_split); chunk i
    covers tokens [i*STEP, i*STEP + SIZE); n_chunks mirrors chunk_documents'
    formula in token units.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    def chunks(t: pa.Table) -> pa.Table:
        ids, idxs, texts = [], [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = s.split(" ")
            n = len(toks)
            n_chunks = (
                1 if n <= TOKEN_CHUNK_SIZE
                else -(-(n - TOKEN_CHUNK_SIZE) // TOKEN_CHUNK_STEP) + 1
            )
            for i in range(n_chunks):
                ids.append(did)
                idxs.append(i)
                texts.append(
                    " ".join(toks[i * TOKEN_CHUNK_STEP : i * TOKEN_CHUNK_STEP + TOKEN_CHUNK_SIZE])
                )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "chunk_index": pa.array(idxs, pa.int64()),
                "chunk": pa.array(texts, pa.string()),
            }
        )

    out = ds.map_batches(chunks, batch_format="pyarrow").to_pandas()
    return out.sort_values(["doc_id", "chunk_index"]).reset_index(drop=True)


# GPT-2-style coarse token classes, RE2-compatible (shared verbatim with the
# DuckDB oracle): letter runs, <=3-digit number groups, punctuation runs.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]+"


def token_count_bpe(sf_dir: str) -> pd.DataFrame:
    """doc_id, n_bpe_tokens — BPE-ish subword-class token count (letter runs
    / short digit groups / punctuation runs), vectorized with one Arrow RE2
    kernel per batch; the identical pattern runs in the DuckDB oracle."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    out = (
        ds.map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t["doc_id"],
                    "n_bpe_tokens": pc.cast(
                        pc.count_substring_regex(t["text"], BPE_TOKEN_RE), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (the mergeable-sketch family)
# ---------------------------------------------------------------------------

HLL_P = 12  # 4096 registers; standard error ~ 1.04/sqrt(m) ~ 1.6%


def _hll_partial(tokens_hashes: np.ndarray, m: int = 1 << HLL_P) -> np.ndarray:
    """Register vector (max leading-zero ranks) for a batch of 64-bit hashes."""
    regs = np.zeros(m, dtype=np.uint8)
    if len(tokens_hashes) == 0:
        return regs
    h = tokens_hashes.astype(np.uint64)
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = h << np.uint64(HLL_P)
    # rank = leading zeros of the remaining bits + 1 (capped)
    ranks = np.full(len(h), 64 - HLL_P + 1, dtype=np.uint8)
    nz = rest != 0
    # log2 via float is exact enough for the top bit position of a uint64
    top = np.zeros(len(h), dtype=np.int64)
    top[nz] = 63 - np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64)
    ranks[nz] = (top[nz] + 1).astype(np.uint8)
    np.maximum.at(regs, idx, ranks)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:  # small-range correction (linear counting)
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct_tokens(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct-token count via a mergeable HyperLogLog sketch.

    The sketch shape that survives 100 TB: each batch emits its 4096-byte
    register vector (constant size regardless of rows); the driver merges
    by elementwise max — no shuffle, no token ever leaves its batch.
    Rows-only (approximate by design); the relative-error bound vs the
    exact distinct count is pytest-asserted.
    """
    ds = _docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = set()
        for s in t["text"].to_pylist():
            toks.update(s.lower().split())
        hashes = np.fromiter(
            (
                int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
                for w in toks
            ),
            dtype=np.uint64,
            count=len(toks),
        )
        regs = _hll_partial(hashes)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096).to_pandas()
    merged = np.zeros(1 << HLL_P, dtype=np.uint8)
    for blob in parts["regs"]:
        merged = np.maximum(merged, np.frombuffer(blob, dtype=np.uint8))
    return pd.DataFrame({"estimate": pd.Series([int(round(_hll_estimate(merged)))], dtype="int64")})


# ---------------------------------------------------------------------------
# Gopher-style quality rules (Rae et al. 2021, "Scaling Language Models:
# ... Gopher", repetition/format heuristics subset) — integer-exact so the
# DuckDB value-hash comparison is float-free.
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
# Gopher's paper uses 2; the synthetic corpus vocabulary carries at most one
# stop word per doc, so the shared constant is 1 to keep the flag informative
# (both the engine and the generated oracle read this).
GOPHER_MIN_STOP_DISTINCT = 1


def gopher_quality_flags_ds(sf_dir: str):
    """Per-doc Gopher quality gate: the rule inputs as exact integers plus
    the combined ``passes_gopher`` flag.  Dataset in, Dataset out (map-only)
    — the curate composition consumes this without a driver collect.

    Rules (ratios cross-multiplied to stay integer):
      * word count in [50, 100000]
      * mean word length in [3, 10]:  3*n_words <= n_word_chars <= 10*n_words
      * symbol-to-word ratio <= 0.1:  10*(n_hash + n_ellipsis) <= n_words
      * >= 80% of words contain an [a-z]:  5*n_alpha_words >= 4*n_words
      * >= GOPHER_MIN_STOP_DISTINCT DISTINCT stop words present

    Tokens are ``text.lower().split()`` (the repo-wide convention); ellipsis
    counts are non-overlapping ``...`` occurrences on the raw text.
    """
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        gopher_flags_batch, batch_format="pyarrow")


def gopher_flags_batch(t: pa.Table) -> pa.Table:
    """The Gopher rule kernel over one Arrow batch (doc_id, text) — shared
    by :func:`gopher_quality_flags_ds` and the quality-classifier label pass
    (engine.ops.ml), so the rule can never drift between them."""
    stop_arr = pa.array(STOP_WORDS, pa.string())

    def flags(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = pc.list_flatten(toks)
        nonempty = pc.not_equal(flat, "")
        offsets = np.zeros(len(toks) + 1, dtype=np.int64)
        np.cumsum([len(x) for x in toks.to_pylist()], out=offsets[1:])

        def seg_sum(vals: np.ndarray) -> np.ndarray:
            csum = np.concatenate([[0], np.cumsum(vals)])
            return csum[offsets[1:]] - csum[offsets[:-1]]

        ne = nonempty.to_numpy(zero_copy_only=False).astype(np.int64)
        n_words = seg_sum(ne)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        n_word_chars = seg_sum(lens * ne)
        alpha = pc.match_substring_regex(flat, "[a-z]")
        n_alpha = seg_sum(alpha.to_numpy(zero_copy_only=False).astype(np.int64) * ne)

        # distinct stop words per row: dedupe (row, token) among stop hits
        is_stop = pc.is_in(flat, value_set=stop_arr).to_numpy(zero_copy_only=False)
        row_of = np.repeat(np.arange(len(toks), dtype=np.int64),
                           np.diff(offsets))
        hit_rows = row_of[is_stop]
        hit_toks = np.asarray(flat.to_pylist(), dtype=object)[is_stop]
        n_stop_distinct = np.zeros(len(toks), dtype=np.int64)
        if len(hit_rows):
            dd = pd.DataFrame({"r": hit_rows, "w": hit_toks}).drop_duplicates()
            cnt = dd.groupby("r").size()
            n_stop_distinct[cnt.index.to_numpy()] = cnt.to_numpy()

        n_hash = pc.count_substring(t["text"], "#").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_ellipsis = pc.count_substring(t["text"], "...").to_numpy(
            zero_copy_only=False).astype(np.int64)

        ok = (
            (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
            & (3 * n_words <= n_word_chars) & (n_word_chars <= 10 * n_words)
            & (10 * (n_hash + n_ellipsis) <= n_words)
            & (5 * n_alpha >= 4 * n_words)
            & (n_stop_distinct >= GOPHER_MIN_STOP_DISTINCT)
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pa.array(n_words, pa.int64()),
                "n_word_chars": pa.array(n_word_chars, pa.int64()),
                "n_alpha_words": pa.array(n_alpha, pa.int64()),
                "n_hash": pa.array(n_hash, pa.int64()),
                "n_ellipsis": pa.array(n_ellipsis, pa.int64()),
                "n_stop_distinct": pa.array(n_stop_distinct, pa.int64()),
                "passes_gopher": pa.array(ok, pa.bool_()),
            }
        )

    return flags(t)


def gopher_quality_flags(sf_dir: str) -> pd.DataFrame:
    """Driver-protocol wrapper of :func:`gopher_quality_flags_ds` — same
    columns, collected and doc_id-sorted."""
    out = gopher_quality_flags_ds(sf_dir).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def gram_repetition_stats(sf_dir: str) -> pd.DataFrame:
    """Per-doc most-common-n-gram repetition counts (Gopher repetition rules,
    Rae et al. 2021 §A1.1: "fraction of characters in the most common
    {2,3}-gram") as exact integers — the consumer forms the fraction as
    top{n}_count * top{n}_len / n_chars.

    Tokens are ``text.lower().split()`` (the repo-wide convention); the top
    gram maximizes count with ties broken by the lexicographically smallest
    gram string, so the (count, char-length) pair is deterministic.  Docs
    with fewer than n tokens emit (0, 0).  Map-only: no shuffle — per-doc
    Counter work is the honest kernel for a per-doc string statistic.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    def top_gram(toks: list, n: int) -> tuple:
        if len(toks) < n:
            return 0, 0
        counts = Counter(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        return best[1], len(best[0])

    def stats(t: pa.Table) -> pa.Table:
        rows = {"doc_id": t["doc_id"], "n_tokens": [], "top2_count": [],
                "top2_len": [], "top3_count": [], "top3_len": []}
        for s in t["text"].to_pylist():
            toks = s.lower().split()
            rows["n_tokens"].append(len(toks))
            c2, l2 = top_gram(toks, 2)
            c3, l3 = top_gram(toks, 3)
            rows["top2_count"].append(c2)
            rows["top2_len"].append(l2)
            rows["top3_count"].append(c3)
            rows["top3_len"].append(l3)
        return pa.table(
            {
                "doc_id": rows["doc_id"],
                "n_tokens": pa.array(rows["n_tokens"], pa.int64()),
                "top2_count": pa.array(rows["top2_count"], pa.int64()),
                "top2_len": pa.array(rows["top2_len"], pa.int64()),
                "top3_count": pa.array(rows["top3_count"], pa.int64()),
                "top3_len": pa.array(rows["top3_len"], pa.int64()),
            }
        )

    out = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def top_docs_per_lang(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Top-k documents per language by length (the windowed-rank shape with
    k > 1), deterministic tiebreak on doc_id.

    Per-batch top-k per language first (a batch can contribute at most k
    candidates per group — the pre-aggregable property of top-k), then the
    driver ranks the <= k x |langs| x n_blocks candidate frame.  No
    full-table shuffle: the candidate stream is the only exchange.
    """
    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["lang", "n_chars", "doc_id"], ascending=[True, False, True],
            kind="mergesort",
        )
        return pa.Table.from_pandas(
            df.groupby("lang", sort=False).head(k), preserve_index=False
        ).replace_schema_metadata(None)

    cands = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = cands.sort_values(
        ["lang", "n_chars", "doc_id"], ascending=[True, False, True],
        kind="mergesort",
    ).groupby("lang", sort=False).head(k)
    out = out.copy()
    out["rnk"] = out.groupby("lang").cumcount() + 1
    return out.sort_values(["lang", "rnk"]).reset_index(drop=True)[
        ["lang", "rnk", "doc_id", "n_chars"]
    ]


# ---------------------------------------------------------------------------
# n-gram LM perplexity scoring + DSIR importance weights (CCNet / DSIR style)
# ---------------------------------------------------------------------------

import ray as _ray


@_ray.remote
def _tbl_nrows(t: pa.Table) -> int:
    return t.num_rows


def _values_at_ranks(ds, col: str, ranks) -> list:
    """Exact value at each ascending global rank of ``ds[col]`` — distributed
    rank selection: sort, fetch only per-block ROW COUNTS, and pull the one
    block containing each rank (the zip-with-index idiom; the driver never
    holds more than a block).  Ranks are 0-based; ties share a value so any
    sort tiebreak yields the same answer."""
    refs = ds.sort(col).materialize().to_arrow_refs()
    counts = np.asarray(_ray.get([_tbl_nrows.remote(r) for r in refs]), np.int64)
    starts = np.concatenate([np.zeros(1, np.int64), np.cumsum(counts)])
    out = []
    cache: dict = {}
    for rk in ranks:
        b = int(np.searchsorted(starts, rk, side="right") - 1)
        if b not in cache:
            cache[b] = _ray.get(refs[b])
        out.append(cache[b][col][rk - int(starts[b])].as_py())
    return out


def _md5_token_hashes(uniques) -> np.ndarray:
    from .dedup import _token_hash

    return np.fromiter(
        (_token_hash(w) for w in uniques), dtype=np.uint64, count=len(uniques)
    )


def lm_perplexity_bucket_ds(sf_dir: str):
    """(doc_id, n_bigrams, ln_ppl_nano, bucket) — CCNet-style LM quality
    scoring (Wenzek et al. 2020 §3.3): a bigram language model with add-one
    smoothing is trained ON the corpus itself, every document is scored by
    its per-bigram cross-entropy, and documents are cut into head / middle /
    tail perplexity terciles.

    Integer-exact end to end (hash-safe vs the DuckDB oracle): each bigram
    TYPE's contribution ``round(m12 * ln((c12+1)/(c1+V)) * 1e6)`` is rounded
    to int64 micro-nats BEFORE the per-doc sum, so summation order cannot
    move the result; the per-doc score is ``ln_ppl_nano = (a*1000) // m``
    (floor division of exact integers, a = -sum of contributions, m =
    bigram count).  Tercile thresholds are the exact values at global ranks
    floor((n-1)/3) and floor(2(n-1)/3) via distributed rank selection.

    Scale shape: three narrow all-to-alls over bigram-TYPE rows (doc, key12,
    m12) — global bigram counts c12 resolve inside a key12-bucket shuffle
    (transform-sum, no separate counts table), context counts c1 inside an
    h1-bucket shuffle, per-doc sums inside a doc-bucket shuffle; V is one
    distinct-count pass.  Text never shuffles; per-doc marker rows keep
    bigram-less documents in the output.
    """
    import pyarrow.parquet as _pqm

    from .dedup import _POS_MULT, _mix64

    N_BUCKETS = 64
    n_total = _pqm.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _batch_token_hashes(t: pa.Table):
        ids = t["doc_id"].to_numpy()
        toks_per_doc = [s.lower().split() for s in t["text"].to_pylist()]
        lens = np.array([len(x) for x in toks_per_doc], dtype=np.int64)
        flat = [w for ts in toks_per_doc for w in ts]
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
        th = _md5_token_hashes(uniques)[codes] if len(flat) else np.empty(0, np.uint64)
        return ids, lens, th

    # --- pass 1: vocabulary size (distinct token hashes, exact) -----------
    def vocab_partial(t: pa.Table) -> pa.Table:
        _ids, _lens, th = _batch_token_hashes(t)
        u = np.unique(th)
        return pa.table(
            {"h": pa.array(u.astype(np.int64), pa.int64()),
             "bucket": pa.array((u % N_BUCKETS).astype(np.int32), pa.int32())}
        )

    def vocab_count(g: pd.DataFrame) -> pa.Table:
        return pa.table({"n": pa.array([g["h"].nunique()], pa.int64())})

    vparts = (
        ds.map_batches(vocab_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(vocab_count, batch_format="pandas")
        .to_pandas()
    )
    V = int(vparts["n"].sum())

    _BT_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("key12", pa.int64()), ("h1", pa.int64()),
         ("m12", pa.int64()), ("kbucket", pa.int32())]
    )

    # --- pass 2: bigram-type rows -> c12 -> c1 -> per-doc score -----------
    def bigram_types(t: pa.Table) -> pa.Table:
        ids, lens, th = _batch_token_hashes(t)
        n_starts = len(th) - 1
        doc_rep_all = np.repeat(ids, lens)
        if n_starts > 0:
            doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
            offs = np.concatenate([np.zeros(1, np.int64), np.cumsum(lens)])[:-1]
            s = np.arange(len(th), dtype=np.int64) - offs[doc_idx]
            valid = (s <= np.repeat(lens, lens) - 2)[:n_starts]
            key12 = _mix64(
                th[:-1] * _POS_MULT[0] ^ th[1:] * _POS_MULT[1]
            ).astype(np.int64)[valid]
            h1 = th[:-1].astype(np.int64)[valid]
            d = pd.DataFrame(
                {"doc_id": doc_rep_all[:n_starts][valid],
                 "key12": key12, "h1": h1}
            )
            g = d.groupby(["doc_id", "key12", "h1"], sort=False).size()
            g = g.reset_index(name="m12")
        else:
            g = pd.DataFrame(
                {"doc_id": [], "key12": [], "h1": [], "m12": []}, dtype=np.int64
            )
        # marker row per doc (m12=0): zero-weight everywhere, guarantees the
        # doc reaches the final stage even with < 2 tokens
        mark = pd.DataFrame(
            {"doc_id": ids, "key12": ids, "h1": ids,
             "m12": np.zeros(len(ids), np.int64)}
        )
        g = pd.concat([g, mark], ignore_index=True)
        return pa.table(
            {"doc_id": pa.array(g["doc_id"].to_numpy(np.int64), pa.int64()),
             "key12": pa.array(g["key12"].to_numpy(np.int64), pa.int64()),
             "h1": pa.array(g["h1"].to_numpy(np.int64), pa.int64()),
             "m12": pa.array(g["m12"].to_numpy(np.int64), pa.int64()),
             "kbucket": pa.array(
                 (g["key12"].to_numpy(np.int64).view(np.uint64)
                  % N_BUCKETS).astype(np.int32), pa.int32())},
            schema=_BT_SCHEMA,
        )

    _C12_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("h1", pa.int64()), ("m12", pa.int64()),
         ("c12", pa.int64()), ("ubucket", pa.int32())]
    )

    def attach_c12(g: pd.DataFrame) -> pa.Table:
        c12 = g.groupby("key12", sort=False)["m12"].transform("sum").to_numpy()
        h1 = g["h1"].to_numpy()
        return pa.table(
            {"doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
             "h1": pa.array(h1, pa.int64()),
             "m12": pa.array(g["m12"].to_numpy(), pa.int64()),
             "c12": pa.array(c12, pa.int64()),
             "ubucket": pa.array(
                 (h1.view(np.uint64) % N_BUCKETS).astype(np.int32), pa.int32())},
            schema=_C12_SCHEMA,
        )

    _CONTRIB_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("m12", pa.int64()), ("contrib", pa.int64()),
         ("dbucket", pa.int32())]
    )

    def attach_c1_score(g: pd.DataFrame) -> pa.Table:
        c1 = g.groupby("h1", sort=False)["m12"].transform("sum").to_numpy()
        m12 = g["m12"].to_numpy().astype(np.float64)
        c12 = g["c12"].to_numpy().astype(np.float64)
        contrib = np.round(
            m12 * np.log((c12 + 1.0) / (c1.astype(np.float64) + float(V))) * 1e6
        ).astype(np.int64)
        ids = g["doc_id"].to_numpy()
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "m12": pa.array(g["m12"].to_numpy(), pa.int64()),
             "contrib": pa.array(contrib, pa.int64()),
             "dbucket": pa.array((ids % N_BUCKETS).astype(np.int32), pa.int32())},
            schema=_CONTRIB_SCHEMA,
        )

    _SCORE_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
         ("ln_ppl_nano", pa.int64())]
    )

    def per_doc(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("doc_id", sort=False).agg(
            m=("m12", "sum"), a=("contrib", "sum"))
        m = s["m"].to_numpy()
        a = -s["a"].to_numpy()
        nano = np.where(m > 0, (a * 1000) // np.maximum(m, 1), 0)
        return pa.table(
            {"doc_id": pa.array(s.index.to_numpy(), pa.int64()),
             "n_bigrams": pa.array(m, pa.int64()),
             "ln_ppl_nano": pa.array(nano, pa.int64())},
            schema=_SCORE_SCHEMA,
        )

    scored = (
        ds.map_batches(bigram_types, batch_format="pyarrow")
        .groupby("kbucket")
        .map_groups(attach_c12, batch_format="pandas")
        .groupby("ubucket")
        .map_groups(attach_c1_score, batch_format="pandas")
        .groupby("dbucket")
        .map_groups(per_doc, batch_format="pandas")
        .materialize()
    )
    r1, r2 = (n_total - 1) // 3, (2 * (n_total - 1)) // 3
    q1, q2 = _values_at_ranks(scored, "ln_ppl_nano", [r1, r2])

    def label(t: pa.Table) -> pa.Table:
        v = t["ln_ppl_nano"].to_numpy()
        b = np.where(v <= q1, "head", np.where(v <= q2, "middle", "tail"))
        return t.append_column("bucket", pa.array(b, pa.string()))

    return scored.map_batches(label, batch_format="pyarrow")


def lm_perplexity_bucket(sf_dir: str) -> pd.DataFrame:
    """Driver-protocol wrapper of :func:`lm_perplexity_bucket_ds` — same
    columns, collected and doc_id-sorted."""
    out = lm_perplexity_bucket_ds(sf_dir).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def dsir_importance_weights(sf_dir: str, n_feat: int = 4096,
                            target_lang: str = "en") -> pd.DataFrame:
    """(doc_id, n_grams, logw_micro, selected) — DSIR data selection (Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling"): hashed unigram+bigram features (``n_feat`` buckets),
    add-one-smoothed target-vs-raw bucket distributions (target = the
    ``lang == target_lang`` slice, raw = the whole corpus), per-doc log
    importance weight, and a deterministic top-quartile selection flag.

    Integer-exact (hash-safe vs the DuckDB oracle): the per-BUCKET log ratio
    is rounded to int64 micro-nats once, so each doc's weight is an
    order-independent integer sum over its gram occurrences.

    Scale shape: bucket counts are one map_batches partial (two int64
    vectors of length n_feat per batch) + one tiny ``groupby(bucket)`` over
    n_feat rows; the resulting weight vector (n_feat ints) broadcasts into
    a single scoring pass — no shuffle ever touches the text or the gram
    stream.  ``selected`` compares against the exact value at global rank
    floor(3(n-1)/4) (distributed rank selection), so ties at the threshold
    are all selected — documented, deterministic.
    """
    from .dedup import _POS_MULT, _mix64

    ds = _docs(sf_dir, ["doc_id", "text", "lang"])

    def _feat_buckets(t: pa.Table):
        toks_per_doc = [s.lower().split() for s in t["text"].to_pylist()]
        lens = np.array([len(x) for x in toks_per_doc], dtype=np.int64)
        flat = [w for ts in toks_per_doc for w in ts]
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
        th = _md5_token_hashes(uniques)[codes] if len(flat) else np.empty(0, np.uint64)
        ub = (_mix64(th * _POS_MULT[0]) % np.uint64(n_feat)).astype(np.int64)
        n_starts = len(th) - 1
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        if n_starts > 0:
            offs = np.concatenate([np.zeros(1, np.int64), np.cumsum(lens)])[:-1]
            s = np.arange(len(th), dtype=np.int64) - offs[doc_idx]
            valid = (s <= np.repeat(lens, lens) - 2)[:n_starts]
            bb = (_mix64(th[:-1] * _POS_MULT[0] ^ th[1:] * _POS_MULT[1])
                  % np.uint64(n_feat)).astype(np.int64)[valid]
            bdoc = doc_idx[:n_starts][valid]
        else:
            bb = np.empty(0, np.int64)
            bdoc = np.empty(0, np.int64)
        return lens, doc_idx, ub, bb, bdoc

    def count_partial(t: pa.Table) -> pa.Table:
        lens, doc_idx, ub, bb, bdoc = _feat_buckets(t)
        tgt_doc = pc.equal(t["lang"], target_lang).to_numpy(zero_copy_only=False)
        occ = np.concatenate([ub, bb])
        occ_tgt = occ[np.concatenate([tgt_doc[doc_idx], tgt_doc[bdoc]])]
        cr = np.bincount(occ, minlength=n_feat).astype(np.int64)
        ct = np.bincount(occ_tgt, minlength=n_feat).astype(np.int64)
        return pa.table(
            {"b": pa.array(np.arange(n_feat, dtype=np.int64), pa.int64()),
             "ct": pa.array(ct, pa.int64()),
             "cr": pa.array(cr, pa.int64())}
        )

    cnts = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("b")
        .sum(["ct", "cr"])
        .to_pandas()
        .sort_values("b")
    )
    ct = np.zeros(n_feat, np.int64)
    cr = np.zeros(n_feat, np.int64)
    ct[cnts["b"].to_numpy()] = cnts["sum(ct)"].to_numpy()
    cr[cnts["b"].to_numpy()] = cnts["sum(cr)"].to_numpy()
    tt, tr = int(ct.sum()), int(cr.sum())
    w_micro = np.round(
        (np.log((ct + 1.0) / float(tt + n_feat))
         - np.log((cr + 1.0) / float(tr + n_feat))) * 1e6
    ).astype(np.int64)

    _SCORE_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("n_grams", pa.int64()),
         ("logw_micro", pa.int64())]
    )

    def score(t: pa.Table) -> pa.Table:
        lens, doc_idx, ub, bb, bdoc = _feat_buckets(t)
        n_docs = t.num_rows
        n_grams = lens + np.maximum(lens - 1, 0)
        logw = (
            np.bincount(doc_idx, weights=w_micro[ub].astype(np.float64),
                        minlength=n_docs)
            + np.bincount(bdoc, weights=w_micro[bb].astype(np.float64),
                          minlength=n_docs)
        ).astype(np.int64)
        return pa.table(
            {"doc_id": t["doc_id"],
             "n_grams": pa.array(n_grams, pa.int64()),
             "logw_micro": pa.array(logw, pa.int64())},
            schema=_SCORE_SCHEMA,
        )

    scored = ds.map_batches(score, batch_format="pyarrow").materialize()
    import pyarrow.parquet as _pqm

    n_total = _pqm.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    (q3,) = _values_at_ranks(scored, "logw_micro", [(3 * (n_total - 1)) // 4])

    def label(t: pa.Table) -> pa.Table:
        return t.append_column(
            "selected", pc.greater_equal(t["logw_micro"], q3))

    out = scored.map_batches(label, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# BM25 keyword search (Robertson & Zaragoza 2009) — the retrieval scoring a
# crawl-for-RAG ingestion pipeline feeds (the reference crawls SharePoint
# into a search index; this is the query side over the crawled corpus).
# ---------------------------------------------------------------------------

_BM25_QUERIES = ("hash join", "window sort stream", "spark batch")
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_topk_ds(ds, id_cols: list, qs: tuple, k: int,
                  text_col: str = "text") -> pd.DataFrame:
    """Dataset-generic BM25 core (see ``bm25_topk`` for the full scale-shape
    docstring): rows identified by ``id_cols`` with text in ``text_col``;
    returns (query_id, rnk, *id_cols, score_micro) top-k per query."""
    terms = [(qid, w) for qid, q in enumerate(qs) for w in q.split()]
    T = len(terms)
    n_q = len(qs)

    def tf_rows(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t[text_col]), r"\s+")
        flat_a = pc.list_flatten(toks)
        keep = pc.not_equal(flat_a, "")
        parent = pc.list_parent_indices(toks).filter(keep).to_numpy()
        flat = flat_a.filter(keep).to_pandas().to_numpy(dtype=object)
        n_docs = t.num_rows
        dl = np.bincount(parent, minlength=n_docs).astype(np.int64)
        cols = {c: t[c] for c in id_cols}
        cols["dl"] = pa.array(dl, pa.int64())
        codes, uniques = pd.factorize(flat)
        u_idx = {w: i for i, w in enumerate(uniques)}
        for j, (_, w) in enumerate(terms):
            ci = u_idx.get(w, -1)
            if ci < 0:
                tf = np.zeros(n_docs, np.int64)
            else:
                tf = np.bincount(parent[codes == ci],
                                 minlength=n_docs).astype(np.int64)
            cols[f"tf{j}"] = pa.array(tf, pa.int64())
        return pa.table(cols)

    tf_ds = ds.map_batches(tf_rows, batch_format="pyarrow").materialize()

    def stats_partial(t: pa.Table) -> pa.Table:
        cols = {"n": pa.array([t.num_rows], pa.int64()),
                "sumdl": pa.array([int(pc.sum(t["dl"]).as_py() or 0)],
                                  pa.int64())}
        for j in range(T):
            nz = pc.sum(pc.cast(pc.greater(t[f"tf{j}"], 0), pa.int64()))
            cols[f"df{j}"] = pa.array([int(nz.as_py() or 0)], pa.int64())
        return pa.table(cols)

    st = tf_ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    n_total = int(st["n"].sum())
    empty_cols = {"query_id": pd.Series([], dtype="int64"),
                  "rnk": pd.Series([], dtype="int64")}
    for c in id_cols:
        empty_cols[c] = pd.Series([], dtype="object")
    empty_cols["score_micro"] = pd.Series([], dtype="int64")
    if n_total == 0:
        return pd.DataFrame(empty_cols)
    avgdl = float(st["sumdl"].sum()) / float(n_total)
    idf = np.array(
        [np.log(1.0 + (float(n_total) - float(st[f"df{j}"].sum()) + 0.5)
                / (float(st[f"df{j}"].sum()) + 0.5)) for j in range(T)],
        dtype=np.float64,
    )

    def score_rows(t: pa.Table) -> pa.Table:
        dl = t["dl"].to_numpy().astype(np.float64)
        norm = 1.0 - _BM25_B + _BM25_B * dl / avgdl if avgdl > 0 else dl
        scores = np.zeros((n_q, t.num_rows), dtype=np.int64)
        for j, (qid, _) in enumerate(terms):
            tf = t[f"tf{j}"].to_numpy().astype(np.float64)
            tfn = tf * (_BM25_K1 + 1.0) / (tf + _BM25_K1 * norm)
            scores[qid] += np.round(idf[j] * tfn * 1e6).astype(np.int64)
        # per-batch top-k partial per query (score desc, id_cols asc)
        id_vals = {c: t[c].to_pandas().to_numpy() for c in id_cols}
        parts = []
        for qid in range(n_q):
            s = scores[qid]
            pos = np.flatnonzero(s > 0)
            if len(pos) > k:
                keys = tuple(id_vals[c][pos] for c in reversed(id_cols))
                order = np.lexsort(keys + (-s[pos],))[:k]
                pos = pos[order]
            sel = {c: pa.array(id_vals[c][pos]) for c in id_cols}
            sel["query_id"] = pa.array(np.full(len(pos), qid, np.int64),
                                       pa.int64())
            sel["score_micro"] = pa.array(s[pos], pa.int64())
            parts.append(pa.table(sel))
        return pa.concat_tables(parts)

    def final_topk(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["score_micro"] + id_cols,
                          ascending=[False] + [True] * len(id_cols),
                          kind="mergesort").head(k)
        cols = {"query_id": pa.array(g["query_id"].to_numpy(), pa.int64()),
                "rnk": pa.array(np.arange(1, len(g) + 1, dtype=np.int64),
                                pa.int64())}
        for c in id_cols:
            cols[c] = pa.array(g[c])
        cols["score_micro"] = pa.array(g["score_micro"].to_numpy(), pa.int64())
        return pa.table(cols)

    out = (
        tf_ds.map_batches(score_rows, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pandas")
        .to_pandas()
    )
    if "query_id" not in out.columns:
        return pd.DataFrame(empty_cols)
    return out.sort_values(["query_id", "rnk"]).reset_index(drop=True)


def bm25_topk(sf_dir: str, k: int = 10, queries=None) -> pd.DataFrame:
    """(query_id, rnk, doc_id, score_micro) — per-query BM25 top-k over the
    corpus for the fixed ``_BM25_QUERIES`` set (Okapi BM25, k1=1.2 b=0.75).

    Scale shape: the corpus is tokenized ONCE into a narrow per-doc
    (ids, dl, tf per query-term slot) table — a vectorized ``map_batches``
    (Arrow split + factorize; text never leaves the batch) materialized
    because both the stats reduce and the scoring pass consume it
    (~(2+T)x8 bytes/doc, negligible vs the corpus).  Corpus stats (N, total
    tokens, per-term document frequency) reduce via one-row-per-block
    partials; scoring is a pure broadcast map over the tf table; the final
    top-k flows through per-batch top-k partials into a per-query group —
    no all-to-all ever touches more than T x k rows per block.

    Each term's contribution ``round(idf * tf_norm * 1e6)`` is rounded to
    int64 micros BEFORE the per-doc sum (the lm_perplexity_bucket idiom), so
    neither summation order nor cross-library libm ulp noise can flip the
    value hash.  ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` is the standard
    non-negative BM25+ idf.  DuckDB-oracle-checked
    (engine.oracles.bm25_topk_sql); ties rank by doc_id ascending.
    The Dataset-generic core (``_bm25_topk_ds``) also powers the composed
    crawl -> chunk -> search pipeline (``crawl_search_topk``).
    """
    qs = _BM25_QUERIES if queries is None else tuple(queries)
    out = _bm25_topk_ds(_docs(sf_dir, ["doc_id", "text"]), ["doc_id"], qs, k)
    if len(out) == 0:
        return pd.DataFrame(
            {"query_id": pd.Series([], dtype="int64"),
             "rnk": pd.Series([], dtype="int64"),
             "doc_id": pd.Series([], dtype="int64"),
             "score_micro": pd.Series([], dtype="int64")}
        )
    return out[["query_id", "rnk", "doc_id", "score_micro"]]



def kmv_distinct_tokens(sf_dir: str, k: int = 16) -> pd.DataFrame:
    """(k, n_seen, kth_hash, estimate) — distinct-token count via a KMV
    (k-minimum-values) sketch (Bar-Yossef et al. 2002).  The HLL sister op is
    `no_oracle` by design; KMV is a DETERMINISTIC function of the data — the
    k smallest distinct 63-bit token hashes — so DuckDB can check it exactly
    (ORDER BY hash LIMIT k), closing the one approximate-op correctness gap.

    Estimate: with fewer than k distinct hashes seen, the sketch IS the
    exact count; otherwise ``(k-1) * 2^63 // kth_smallest_hash`` — pure
    integer arithmetic, no float in the output.  Hashes are the md5-prefix-64
    of each lowercased token, right-shifted one bit (order-preserving, fits
    int64/DuckDB BIGINT comparisons without sign wrap).

    Scale shape: each batch emits at most k hashes (its k smallest distinct —
    constant size regardless of rows, like the HLL registers); the driver
    merges n_blocks × k narrow rows.  No shuffle; no token leaves its batch.
    k=16 keeps the sketch path live on the 31-token sf vocabulary —
    production would use k≈1024 with the identical merge law.
    """
    ds = _docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        uniq = pc.unique(flat).to_pylist()
        hashes = _md5_token_hashes(uniq) >> np.uint64(1)
        hashes = np.unique(hashes)
        if len(hashes) > k:
            hashes = np.partition(hashes, k - 1)[:k]
        return pa.table({"h": pa.array(hashes.astype(np.int64), pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096).to_pandas()
    hs = np.unique(parts["h"].to_numpy())
    n_seen = min(len(hs), k)
    if len(hs) >= k:
        kth = int(hs[k - 1])
        est = (k - 1) * (1 << 63) // kth
    else:
        kth = int(hs[-1]) if len(hs) else 0
        est = len(hs)
    return pd.DataFrame(
        {"k": pd.Series([k], dtype="int64"),
         "n_seen": pd.Series([n_seen], dtype="int64"),
         "kth_hash": pd.Series([kth], dtype="int64"),
         "estimate": pd.Series([int(est)], dtype="int64")}
    )

# ---------------------------------------------------------------------------
# PII redaction (the standard pre-training privacy pass: emails, IPs, phones)
# ---------------------------------------------------------------------------

# RE2-compatible patterns (no lookaround/backrefs) so the SAME regex runs in
# Arrow (pc.replace_substring_regex, RE2) and in the DuckDB oracle
# (regexp_replace, also RE2) — byte-identical redaction on both sides.
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\(?\d{3}\)?[ .\-]\d{3}[ .\-]\d{4}"


def _plant_pii(t: pa.Table) -> pa.ChunkedArray:
    """The synthetic corpus carries no PII, so the harness plants a
    deterministic per-doc suffix (every doc an email; doc_id%2==0 an IPv4;
    doc_id%3==0 a phone) — the oracle plants the IDENTICAL suffix in SQL, so
    the redaction pass is exercised on every row with varying counts.  Pure
    Arrow kernels; the int->string casts match SQL ``||`` formatting."""
    ids = t["doc_id"].to_numpy()
    sid = pc.cast(t["doc_id"], pa.string())
    empty = pa.array(np.full(len(ids), "", dtype=object), pa.string())
    email = pc.binary_join_element_wise(" contact u", sid, "@example.com", "")
    ip = pc.if_else(
        pa.array(ids % 2 == 0),
        pc.binary_join_element_wise(
            " ip 10.", pa.array((ids % 256).astype(str), pa.string()),
            ".0.", pa.array((ids % 200).astype(str), pa.string()), ""),
        empty,
    )
    phone = pc.if_else(
        pa.array(ids % 3 == 0),
        pc.binary_join_element_wise(
            " tel (555) ", pa.array((100 + ids % 900).astype(str), pa.string()),
            " ", pa.array((1000 + ids % 9000).astype(str), pa.string()), ""),
        empty,
    )
    return pc.binary_join_element_wise(t["text"], email, ip, phone, "")


def pii_redact(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, text) — regex PII redaction, the
    privacy pass every published web-corpus pipeline runs before training
    (emails / IPv4s / phone numbers replaced by typed tokens).

    Replacement is SEQUENTIAL (email, then IP, then phone) and each
    category's count is taken on the string state at its own replacement
    time, so categories can never double-count bytes an earlier pass
    already redacted; the oracle nests its ``regexp_replace`` calls in the
    same order.

    Scale shape: map-only — one ``map_batches`` pass, zero shuffles; the
    regexes are Arrow RE2 kernels (vectorized across the batch, no Python
    loop, nothing compiled per batch).
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    def redact(t: pa.Table) -> pa.Table:
        s0 = _plant_pii(t)
        n_email = pc.cast(pc.count_substring_regex(s0, PII_EMAIL_RE), pa.int64())
        s1 = pc.replace_substring_regex(
            s0, pattern=PII_EMAIL_RE, replacement="<EMAIL>")
        n_ip = pc.cast(pc.count_substring_regex(s1, PII_IP_RE), pa.int64())
        s2 = pc.replace_substring_regex(
            s1, pattern=PII_IP_RE, replacement="<IP>")
        n_phone = pc.cast(pc.count_substring_regex(s2, PII_PHONE_RE), pa.int64())
        s3 = pc.replace_substring_regex(
            s2, pattern=PII_PHONE_RE, replacement="<PHONE>")
        return pa.table(
            {"doc_id": t["doc_id"], "n_emails": n_email, "n_ips": n_ip,
             "n_phones": n_phone, "text": s3}
        )

    out = ds.map_batches(redact, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Sequence packing (GPT-style concatenate-and-chunk into training windows)
# ---------------------------------------------------------------------------

PACK_CAPACITY = 256       # tokens per training sequence
PACK_BUCKET_DOCS = 64     # doc_ids per cumsum bucket (production: ~4096)


def pack_sequences(sf_dir: str, capacity: int = PACK_CAPACITY,
                   bucket_docs: int = PACK_BUCKET_DOCS) -> pd.DataFrame:
    """(seq_id, doc_id, off_in_seq, n_tokens) — pack the corpus, in doc_id
    order, into fixed-capacity training sequences: documents are concatenated
    into one global token stream and cut every ``capacity`` tokens (the
    GPT-series data layout); a document straddling a boundary contributes a
    row to each sequence it intersects.

    Scale shape: the global running offset is a distributed prefix sum over
    COARSE doc_id buckets — one narrow (doc_id, n_tokens, bucket) table is
    materialized once (16 B/doc; both passes consume it), the per-bucket
    token sums reduce to n_buckets driver rows whose exclusive prefix is
    broadcast back (``ray.put``, n_buckets ints), and each bucket group then
    computes its exact in-group cumsum + window explode vectorized
    (``np.repeat`` over per-doc window counts).  No document text enters the
    exchange at all; the only all-to-all carries the 16-byte token rows.
    ``bucket_docs`` sizes the cumsum granularity: the sf default (64) keeps
    the multi-bucket path exercised on 500-doc tables; the scale smoke
    passes 4096 (the production choice — n_buckets ≈ docs/4096 stays
    driver-small at 10^10 docs while groups stay worker-sized).
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    def tok(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {"doc_id": t["doc_id"],
             "n": pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64()),
             "bucket": pa.array(ids // bucket_docs, pa.int64())}
        )

    narrow = ds.map_batches(tok, batch_format="pyarrow").materialize()

    sums = narrow.groupby("bucket").sum("n").to_pandas().sort_values("bucket")
    b = sums["bucket"].to_numpy()
    csum = np.concatenate([[0], np.cumsum(sums["sum(n)"].to_numpy())[:-1]])
    off_ref = _ray.put(dict(zip(b.tolist(), csum.tolist())))

    _P_SCHEMA = pa.schema(
        [("seq_id", pa.int64()), ("doc_id", pa.int64()),
         ("off_in_seq", pa.int64()), ("n_tokens", pa.int64())]
    )

    def pack_group(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("doc_id")
        n = g["n"].to_numpy()
        keep = n > 0
        base = _ray.get(off_ref)[int(g["bucket"].iloc[0])]
        start = base + np.concatenate([[0], np.cumsum(n)[:-1]])
        ids, n, start = g["doc_id"].to_numpy()[keep], n[keep], start[keep]
        end = start + n
        first_w = start // capacity
        n_win = (end - 1) // capacity - first_w + 1
        rep = np.repeat(np.arange(len(ids)), n_win)
        # window index within each doc's span: 0..n_win-1, vectorized
        w_local = np.arange(len(rep)) - np.repeat(
            np.concatenate([[0], np.cumsum(n_win)[:-1]]), n_win)
        w = first_w[rep] + w_local
        lo = np.maximum(start[rep], w * capacity)
        hi = np.minimum(end[rep], (w + 1) * capacity)
        return pa.table(
            {"seq_id": pa.array(w, pa.int64()),
             "doc_id": pa.array(ids[rep], pa.int64()),
             "off_in_seq": pa.array(lo - w * capacity, pa.int64()),
             "n_tokens": pa.array(hi - lo, pa.int64())},
            schema=_P_SCHEMA,
        )

    out = (
        narrow.groupby("bucket")
        .map_groups(pack_group, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["seq_id", "off_in_seq"]).reset_index(drop=True)

# ---------------------------------------------------------------------------
# BPE merge training (Sennrich et al. 2016) — distributed over the word vocab
# ---------------------------------------------------------------------------

BPE_N_MERGES = 20


def bpe_train_merges(sf_dir: str, n_merges: int = BPE_N_MERGES) -> pd.DataFrame:
    """(rank, left, right, pair_count) — learn the first ``n_merges`` BPE
    merges on the corpus (Sennrich et al. 2016): start from characters,
    repeatedly merge the most frequent adjacent symbol pair (ties: higher
    count first, then lexicographic "left right" ascending — fully
    deterministic).

    Scale shape: the corpus-sized pass happens ONCE — per-batch vectorized
    word counts (``value_counts``) reduce through one ``groupby(word)`` into
    the distinct-word vocabulary, the sufficient statistic for BPE.  Every
    iteration then runs over the VOCAB Dataset (sublinear in corpus size):
    pair counting is vectorized (list-flatten + boundary masks + one Arrow
    join kernel, per-batch ``group_by`` partials, per-block top-1 so the
    driver sees n_blocks candidate rows per round), and the merge is applied
    only to words a vectorized adjacency test marked as containing the pair
    (the per-word rescan is the textbook sequential merge, bounded by
    affected vocab entries, never corpus rows).  Rows-only for the driver
    (iterative, not SQL-expressible); ``test_bpe_train_merges_matches_
    sequential`` locks it against a pure-Python reference.
    """
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["text"])

    def wc(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        v = flat.value_counts()
        return pa.table(
            {"word": v.field("values"), "n": pc.cast(v.field("counts"), pa.int64())}
        )

    def to_syms(t: pa.Table) -> pa.Table:
        words = t["word"].to_pylist()  # vocab rows, not corpus rows
        return pa.table(
            {"word": t["word"], "n": t["n"],
             "syms": pa.array([list(w) for w in words], pa.list_(pa.string()))}
        )

    vocab = (
        ds.map_batches(wc, batch_format="pyarrow", batch_size=4096)
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(to_syms, batch_format="pyarrow")
        .materialize()
    )

    def _flat_masks(t: pa.Table):
        lens = pc.list_value_length(t["syms"]).to_numpy().astype(np.int64)
        flat = pc.list_flatten(t["syms"]).combine_chunks()
        ends = np.cumsum(lens)
        total = int(ends[-1]) if len(ends) else 0
        not_last = np.ones(total, bool)
        not_first = np.ones(total, bool)
        if total:
            not_last[ends - 1] = False
            not_first[ends - lens] = False
        return flat, lens, not_last, not_first

    def pair_partial(t: pa.Table) -> pa.Table:
        flat, lens, not_last, not_first = _flat_masks(t)
        if len(flat) == 0 or not (lens > 1).any():
            return pa.table({"pair": pa.array([], pa.string()),
                             "w": pa.array([], pa.int64())})
        left = flat.filter(pa.array(not_last))
        right = flat.filter(pa.array(not_first))
        pair = pc.binary_join_element_wise(left, right, " ")
        w = np.repeat(t["n"].to_numpy(), lens - 1)
        part = pa.table({"pair": pair, "w": pa.array(w, pa.int64())})
        agg = part.group_by("pair").aggregate([("w", "sum")])
        return agg.rename_columns(["pair", "w"])

    def block_top1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        df = t.to_pandas().sort_values(["w", "pair"], ascending=[False, True],
                                       kind="mergesort")
        return pa.Table.from_pandas(df.head(1), preserve_index=False)

    merges = []
    for rank in range(n_merges):
        tops = (
            vocab.map_batches(pair_partial, batch_format="pyarrow")
            .groupby("pair")
            .aggregate(Sum("w", alias_name="w"))
            .map_batches(block_top1, batch_format="pyarrow")
            .to_pandas()
        )
        if len(tops) == 0:
            break
        tops = tops.sort_values(["w", "pair"], ascending=[False, True],
                                kind="mergesort")
        pair, count = tops.iloc[0]["pair"], int(tops.iloc[0]["w"])
        l, r = pair.split(" ")
        merges.append({"rank": rank, "left": l, "right": r,
                       "pair_count": count})

        def apply_merge(t: pa.Table, l=l, r=r) -> pa.Table:
            flat, lens, not_last, not_first = _flat_masks(t)
            if len(flat) == 0:
                return t
            hit_pos = np.zeros(len(flat), bool)
            fl = flat.to_numpy(zero_copy_only=False)
            adj = (fl[:-1] == l) & (fl[1:] == r) & not_last[:-1]
            hit_pos[:-1] = adj
            starts = np.cumsum(lens) - lens
            hits = np.add.reduceat(hit_pos, starts) > 0 if len(lens) else []
            syms = t["syms"].to_pylist()
            for i in np.nonzero(hits)[0]:  # affected vocab words only
                s, out, j = syms[i], [], 0
                while j < len(s):
                    if j + 1 < len(s) and s[j] == l and s[j + 1] == r:
                        out.append(l + r)
                        j += 2
                    else:
                        out.append(s[j])
                        j += 1
                syms[i] = out
            return pa.table(
                {"word": t["word"], "n": t["n"],
                 "syms": pa.array(syms, pa.list_(pa.string()))}
            )

        vocab = vocab.map_batches(apply_merge, batch_format="pyarrow").materialize()

    return pd.DataFrame(merges, columns=["rank", "left", "right", "pair_count"]).astype(
        {"rank": "int64", "left": "str", "right": "str", "pair_count": "int64"}
    )

_BPE_MERGES_CACHE: dict = {}


def _bpe_merges(sf_dir: str, n_merges: int) -> pd.DataFrame:
    """Session cache of the trained merge table (the _minhash_labels_ds
    idiom): bpe_train_merges and bpe_apply share one training run."""
    p = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(p)
    key = (os.path.abspath(p), st.st_mtime_ns, st.st_size, n_merges)
    if key not in _BPE_MERGES_CACHE:
        _BPE_MERGES_CACHE[key] = bpe_train_merges(sf_dir, n_merges)
    return _BPE_MERGES_CACHE[key]


def bpe_apply(sf_dir: str, n_merges: int = BPE_N_MERGES) -> pd.DataFrame:
    """Driver-protocol wrapper of :func:`bpe_apply_ds` — same columns,
    collected and (doc_id, pos)-sorted.  Collecting is the PROTOCOL's
    granularity; at scale consume the Dataset variant (the smoke counts it
    streaming — the encoded corpus is tokens-sized and never belongs on the
    driver)."""
    out = bpe_apply_ds(sf_dir, n_merges).to_pandas()
    return out.sort_values(["doc_id", "pos"]).reset_index(drop=True)


def bpe_apply_ds(sf_dir: str, n_merges: int = BPE_N_MERGES):
    """(doc_id, pos, token_id, token) — ENCODE the corpus with the trained
    BPE merges: the tokenization step that actually produces model inputs
    (bpe_train_merges learns the merges; this applies them, closing the
    tokenizer loop).  Vocabulary ids are the GPT-2 convention: sorted
    distinct corpus characters first, then merge products in rank order —
    a pure function of the corpus, no RNG.

    Scale shape: merges + vocab broadcast once (tiny); ONE map-only pass
    over documents.  Each batch encodes only its DISTINCT words
    (``pd.factorize`` — the Zipf trade every text op here uses) by replaying
    the merges in rank order over an adjacency-tested subset, then explodes
    back through the code table with ``np.repeat``.  No shuffle; output rows
    stream straight out of the map.

    Rows-only for the driver (the 20-round merge replay is not reasonably
    SQL-expressible); ``tests/test_ops.py::test_bpe_apply_*`` locks it
    against a pure-Python sequential encoder plus a reconstruction
    invariant (concatenating a doc's tokens reproduces its whitespace-
    normalized lowercase text).
    """
    merges = _bpe_merges(sf_dir, n_merges)
    merge_list = list(zip(merges["left"].tolist(), merges["right"].tolist()))

    # distinct corpus characters: constant-size per-block partials
    def chars_partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+"))
        seen = set()
        for w in toks.to_pylist():
            seen.update(w)
        return pa.table({"ch": pa.array(sorted(seen), pa.string())})

    base_chars = sorted(set(
        _docs(sf_dir, ["text"])
        .map_batches(chars_partial, batch_format="pyarrow")
        .to_pandas()["ch"].tolist()
    ))
    vocab = {ch: i for i, ch in enumerate(base_chars)}
    for l, r in merge_list:
        vocab[l + r] = len(vocab)

    def _encode_word(w: str) -> list:
        s = list(w)
        for l, r in merge_list:
            if l not in w or r not in w:  # cheap substring prefilter
                continue
            out, j = [], 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == l and s[j + 1] == r:
                    out.append(l + r)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            s = out
        return s

    _SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("pos", pa.int64()),
         ("token_id", pa.int64()), ("token", pa.string())]
    )

    def encode(t: pa.Table) -> pa.Table:
        toks_per_doc = [s.lower().split() for s in t["text"].to_pylist()]
        lens = np.array([len(x) for x in toks_per_doc], dtype=np.int64)
        flat = np.asarray([w for ts in toks_per_doc for w in ts], dtype=object)
        codes, uniques = pd.factorize(flat)
        enc = [_encode_word(w) for w in uniques]  # distinct words only
        n_syms = np.array([len(e) for e in enc], dtype=np.int64)
        # explode: per word occurrence -> its word's symbol run
        occ_syms = n_syms[codes] if len(codes) else np.empty(0, np.int64)
        doc_of_word = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        doc_of_sym = np.repeat(doc_of_word, occ_syms)
        # flatten symbols in occurrence order via a per-unique offset table
        sym_flat = [s for e in enc for s in e]
        sym_ids = np.array([vocab[s] for s in sym_flat], dtype=np.int64)
        offs = np.concatenate([np.zeros(1, np.int64), np.cumsum(n_syms)])
        idx = (np.repeat(offs[codes], occ_syms)
               + (np.arange(len(doc_of_sym), dtype=np.int64)
                  - np.repeat(np.concatenate([np.zeros(1, np.int64),
                                              np.cumsum(occ_syms)])[:-1],
                              occ_syms)))
        ids = t["doc_id"].to_numpy()
        # pos: running symbol index within each doc
        pos = (np.arange(len(doc_of_sym), dtype=np.int64)
               - np.repeat(np.concatenate(
                   [np.zeros(1, np.int64),
                    np.cumsum(np.bincount(doc_of_sym,
                                          minlength=len(lens)))])[:-1],
                           np.bincount(doc_of_sym, minlength=len(lens))))
        return pa.table(
            {"doc_id": pa.array(ids[doc_of_sym], pa.int64()),
             "pos": pa.array(pos, pa.int64()),
             "token_id": pa.array(sym_ids[idx], pa.int64()),
             "token": pa.array(np.asarray(sym_flat, dtype=object)[idx],
                               pa.string())},
            schema=_SCHEMA,
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        encode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Count-min sketch over tokens (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_sketch_tokens(sf_dir: str, depth: int = CMS_DEPTH,
                      width: int = CMS_WIDTH) -> pd.DataFrame:
    """(d, col, n) — the nonzero cells of a depth×width count-min sketch of
    corpus token frequencies.  Row d's hash is ``splitmix64(md5_64(token) ^
    (d+1)) % width`` — deterministic uint64 ring arithmetic, so unlike a
    classical randomized CMS the sketch CONTENT is an exact function of the
    data and DuckDB checks it cell-for-cell (the KMV treatment applied to
    the frequency-sketch family).  Point queries (min over rows) upper-bound
    true counts by construction; the pytest drives that on a
    collision-forcing vocabulary.

    Scale shape: per-batch ``value_counts`` → depth cells per DISTINCT
    token, per-batch ``group_by`` partial combine; the only shuffle carries
    ≤ depth×width cell rows per block (constant-bounded, like the HLL
    registers).  Counts are additive, so block merge order is irrelevant.
    """
    from ray.data.aggregate import Sum

    from .dedup import _mix64

    ds = _docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        v = flat.value_counts()
        uniq = v.field("values").to_pylist()
        c = v.field("counts").to_numpy().astype(np.int64)
        h = _md5_token_hashes(uniq)
        k = len(uniq)
        cells = np.empty(k * depth, np.int64)
        for d in range(depth):
            col = (_mix64(h ^ np.uint64(d + 1)) % np.uint64(width)).astype(np.int64)
            cells[d * k:(d + 1) * k] = d * width + col
        part = pa.table(
            {"cell": pa.array(cells, pa.int64()),
             "n": pa.array(np.tile(c, depth), pa.int64())}
        ).group_by("cell").aggregate([("n", "sum")])
        return part.rename_columns(["cell", "n"])

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    cell = merged["cell"].to_numpy()
    out = pd.DataFrame(
        {"d": cell // width, "col": cell % width,
         "n": merged["n"].to_numpy()}
    ).astype({"d": "int64", "col": "int64", "n": "int64"})
    return out.sort_values(["d", "col"]).reset_index(drop=True)


def cms_heavy_hitters(sf_dir: str, denom: int = 200) -> pd.DataFrame:
    """(token, n) — every token whose exact corpus frequency is at least
    ``total_tokens // denom`` (0.5% of the stream by default), found via the
    classic CMS heavy-hitter composition: the count-min sketch prunes, an
    exact pass verifies.  Because CMS point queries never underestimate, no
    true heavy hitter can be pruned — the output is EXACT and the DuckDB
    oracle is a plain frequency filter.

    Scale shape: pass 1 is :func:`cms_sketch_tokens` (constant-bounded
    partials); the 32 KB sketch + threshold broadcast once (``ray.put``);
    pass 2 re-reads the corpus and keeps only tokens whose sketch estimate
    clears the threshold, so the exact-count shuffle carries candidate rows
    only — at web scale that is the handful of stopword-class tokens, not
    the billion-token vocabulary.
    """
    from ray.data.aggregate import Sum

    from .dedup import _mix64

    cells = cms_sketch_tokens(sf_dir)
    sketch = np.zeros((CMS_DEPTH, CMS_WIDTH), np.int64)
    sketch[cells["d"].to_numpy(), cells["col"].to_numpy()] = cells["n"].to_numpy()
    total = int(sketch[0].sum())  # every row holds the full token mass
    thresh = max(1, total // denom)
    bc = _ray.put((sketch, thresh))

    ds = _docs(sf_dir, ["text"])

    def candidates(t: pa.Table) -> pa.Table:
        sk, th = _ray.get(bc)
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        v = flat.value_counts()
        uniq = v.field("values")
        c = v.field("counts").to_numpy().astype(np.int64)
        h = _md5_token_hashes(uniq.to_pylist())
        est = np.full(len(c), np.iinfo(np.int64).max)
        for d in range(CMS_DEPTH):
            col = (_mix64(h ^ np.uint64(d + 1)) % np.uint64(CMS_WIDTH)).astype(np.int64)
            est = np.minimum(est, sk[d, col])
        keep = est >= th
        return pa.table(
            {"token": uniq.filter(pa.array(keep)),
             "n": pa.array(c[keep], pa.int64())}
        )

    merged = (
        ds.map_batches(candidates, batch_format="pyarrow", batch_size=4096)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out = merged[merged["n"] >= thresh].astype({"n": "int64"})
    return out.sort_values("token").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Inverted index: the search-index SINK the reference's upload loop feeds
# (SharePointCrawler pushes extracted chunks into an index service; here the
# index itself is a first-class resumable parquet artifact) + bounded-read
# term lookup.
# ---------------------------------------------------------------------------

INV_BUCKETS = 32
_INV_TERMS = ("hash", "join", "stream", "batch")


def build_inverted_index(sf_dir: str, n_buckets: int = INV_BUCKETS) -> str:
    """Write (once, cached) the corpus's token->postings inverted index as
    ``bucket=K/`` hive parquet — rows (token, doc_id, tf), bucket =
    md5-prefix-64(token) % n_buckets (the DuckDB-expressible MinHash token
    ring, so the oracle can address buckets too) — and return the index dir.

    Scale shape: one tokenize pass (per-batch factorize + (doc, token)
    bincount -> tf rows), ONE bucket-keyed all-to-all, and the
    consolidation idiom (groupby(bucket) before the hive write) so each
    bucket is ONE file — term lookups open exactly the touched bucket
    files, never the corpus (the bucketed_copy/IVF lesson: plain
    partition_cols writes block×bucket fragments and lookups drown in
    footer opens).  Cache-keyed on the documents file identity, so a
    rewritten corpus invalidates.
    """
    return _build_postings_segment(sf_dir, n_buckets, lo=None, hi=None)


_POSTINGS_SCHEMA = pa.schema(
    [("token", pa.string()), ("doc_id", pa.int64()), ("tf", pa.int64()),
     ("bucket", pa.int64())]
)


def _postings_batch_fn(n_buckets: int):
    """Per-batch (token, doc_id, tf, bucket) extraction — factorize + fused
    (doc, token) unique-counts; memory O(occurrences), never
    O(docs x batch-vocab)."""
    from .dedup import _token_hash

    def postings(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        toks_per_doc = [s.lower().split() for s in t["text"].to_pylist()]
        lens = np.array([len(x) for x in toks_per_doc], dtype=np.int64)
        flat = [w for ts in toks_per_doc for w in ts]
        if not flat:
            return _POSTINGS_SCHEMA.empty_table()
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        fused = doc_idx * np.int64(len(uniques)) + codes
        keys, tf = np.unique(fused, return_counts=True)
        d_i = keys // len(uniques)
        c_i = keys % len(uniques)
        ub = np.fromiter((_token_hash(w) % n_buckets for w in uniques),
                         dtype=np.int64, count=len(uniques))
        return pa.table(
            {"token": pa.array(uniques[c_i], pa.string()),
             "doc_id": pa.array(ids[d_i], pa.int64()),
             "tf": pa.array(tf.astype(np.int64), pa.int64()),
             "bucket": pa.array(ub[c_i], pa.int64())},
            schema=_POSTINGS_SCHEMA)

    return postings


def _build_postings_segment(sf_dir: str, n_buckets: int,
                            lo: int | None, hi: int | None) -> str:
    """Build (once, cached) a postings SEGMENT over the doc_id slice
    [lo, hi) — None bounds are open — and return its directory.  The full
    index is the lo=hi=None segment; an incremental delta is a bounded
    slice, so the build cost scales with the slice, not the corpus."""
    import hashlib as _hl
    import json as _json

    p = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(p)
    key = _hl.md5(
        f"{os.path.abspath(p)}|{st.st_mtime_ns}|{st.st_size}|{n_buckets}|"
        f"{lo}|{hi}".encode()
    ).hexdigest()[:16]
    dest = os.path.join("/tmp", "engine_inv_index", key)
    marker = os.path.join(dest, "_done.json")
    if os.path.exists(marker):
        return dest
    os.makedirs(dest, exist_ok=True)

    ds = _docs(sf_dir, ["doc_id", "text"])
    if lo is not None or hi is not None:
        # Slice to the segment's docs before tokenizing (in production the
        # new batch arrives as its own file and this filter is the read).
        def in_slice(t: pa.Table) -> pa.Table:
            m = pa.array(np.ones(len(t), bool))
            ids = t["doc_id"]
            if lo is not None:
                m = pc.and_(m, pc.greater_equal(ids, lo))
            if hi is not None:
                m = pc.and_(m, pc.less(ids, hi))
            return t.filter(m)

        ds = ds.map_batches(in_slice, batch_format="pyarrow")

    (
        ds.map_batches(_postings_batch_fn(n_buckets), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda t: t, batch_format="pyarrow")
        .write_parquet(dest, partition_cols=["bucket"])
    )
    with open(marker, "w") as f:
        _json.dump({"source": p, "n_buckets": n_buckets,
                    "lo": lo, "hi": hi}, f)
    return dest


def inverted_postings(sf_dir: str, terms: tuple = _INV_TERMS,
                      n_buckets: int = INV_BUCKETS) -> pd.DataFrame:
    """(token, doc_id, tf) — postings for ``terms`` served from the
    inverted-index artifact: opens ONLY the terms' ``bucket=K/`` files (a
    bounded read — lookup cost scales with the query, not the corpus),
    with an in-bucket token filter.  DuckDB-oracle-checked end to end
    against a full-corpus tokenize (the index build + lookup must agree
    with the definition, not just with itself)."""
    dest = build_inverted_index(sf_dir, n_buckets)
    return _postings_lookup([dest], terms, n_buckets)


def _postings_lookup(segment_dirs, terms, n_buckets: int) -> pd.DataFrame:
    """Bounded postings lookup across index SEGMENTS: opens only the terms'
    ``bucket=K/`` files in each segment (cost scales with |terms| x
    |segments|, never the corpus).  Segments hold disjoint doc ranges, so
    the merge is a concat."""
    import pyarrow.dataset as pads

    from .dedup import _token_hash

    by_bucket: dict = {}
    for w in terms:
        by_bucket.setdefault(_token_hash(w) % n_buckets, []).append(w)
    parts = []
    for dest in segment_dirs:
        for b, want in sorted(by_bucket.items()):
            bdir = os.path.join(dest, f"bucket={b}")
            if not os.path.isdir(bdir):
                continue
            dset = pads.dataset(bdir, format="parquet")
            parts.append(dset.to_table(columns=["token", "doc_id", "tf"],
                                       filter=pads.field("token").isin(want)))
    if not parts:
        return pd.DataFrame({"token": pd.Series([], dtype="object"),
                             "doc_id": pd.Series([], dtype="int64"),
                             "tf": pd.Series([], dtype="int64")})
    out = pa.concat_tables(parts).to_pandas()
    return out.sort_values(["token", "doc_id"]).reset_index(drop=True)


def incremental_inverted_postings(sf_dir: str, terms: tuple = _INV_TERMS,
                                  n_buckets: int = INV_BUCKETS,
                                  n_base: int = 400) -> pd.DataFrame:
    """(token, doc_id, tf) — postings served from a SEGMENTED index after an
    incremental ingest (the Lucene idiom: an immutable base segment plus a
    delta segment per ingest batch; a merge policy compacts segments later).
    Base = doc_id < n_base, the day's batch = doc_id >= n_base; indexing the
    batch costs one pass over the BATCH only — the 100-TB base index is
    never rebuilt or rewritten.  Lookups open the terms' bucket files in
    each segment and concat (doc ranges are disjoint).

    The result must equal a from-scratch full-corpus index, so it shares
    ``inverted_postings``'s full-tokenize DuckDB oracle.
    """
    base = _build_postings_segment(sf_dir, n_buckets, lo=None, hi=n_base)
    delta = _build_postings_segment(sf_dir, n_buckets, lo=n_base, hi=None)
    return _postings_lookup([base, delta], terms, n_buckets)


def term_burstiness(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """(term, df, tf, tf_sq) for the top-k terms by document frequency —
    the exact integer moments behind Church-Gale burstiness (variance-to-
    mean of per-document counts): a bursty term (tf_sq >> tf²/df) clusters
    in few documents, a function word spreads evenly.  The dispersion
    statistic a corpus curation run uses to separate topical vocabulary
    from boilerplate before keyword/dedup weighting.

    Scale shape: each batch computes per-document counts locally (Arrow
    dictionary-encode + int64-key np.unique + bincount — no string groupby)
    and emits per-batch-distinct (term, df, tf, tf_sq) partials; ONE
    term-keyed groupby sums them (all-integer, order-free); the top-k cut
    (df desc, term asc — total order, no ties possible on the unique term
    column) runs on the aggregate.  Text never enters the exchange — on a
    natural-language corpus the partials are vocab-bounded; on a
    hash-token corpus (the 5M-doc smoke) the term shuffle is the honest
    dominant cost, same as the BPE/postings family.
    """
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        # all-integer path: dictionary-encode terms, combine (doc, term)
        # into one int64 key, np.unique for per-doc counts, bincount folds
        # per-term moments — no pandas string groupby in the hot loop
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = pc.list_flatten(toks).combine_chunks()
        parent = pc.list_parent_indices(toks).combine_chunks().to_numpy()
        mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)[mask]
        parent = parent[mask]
        terms = enc.dictionary.to_pylist()
        nv = len(terms)
        key = parent.astype(np.int64) * nv + codes
        uk, cnt = np.unique(key, return_counts=True)
        w_idx = (uk % nv).astype(np.int64)
        df_w = np.bincount(w_idx, minlength=nv)
        tf_w = np.bincount(w_idx, weights=cnt, minlength=nv).astype(np.int64)
        sq_w = np.bincount(w_idx, weights=cnt.astype(np.int64) ** 2,
                           minlength=nv).astype(np.int64)
        return pa.table(
            {"term": pa.array(terms, pa.string()),
             "df": pa.array(df_w.astype(np.int64), pa.int64()),
             "tf": pa.array(tf_w, pa.int64()),
             "tf_sq": pa.array(sq_w, pa.int64())})

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"), Sum("tf", alias_name="tf"),
                   Sum("tf_sq", alias_name="tf_sq"))
        .to_pandas()
    )
    out = (out.sort_values(["df", "term"], ascending=[False, True],
                           kind="mergesort")
           .head(k).reset_index(drop=True))
    return out[["term", "df", "tf", "tf_sq"]].astype(
        {"df": "int64", "tf": "int64", "tf_sq": "int64"})


def token_frequency_spectrum(sf_dir: str) -> pd.DataFrame:
    """(occurrences, n_tokens) — the corpus frequency-of-frequencies
    spectrum (the Zipf/Good-Turing statistic: how many distinct tokens
    occur exactly k times).  The vocabulary-health dashboard row a corpus
    curation run watches (singleton mass, head weight).

    Scale shape: per-batch ``value_counts`` partials -> the ONE token-keyed
    all-to-all (``groupby(word).sum`` — the bpe vocab pass), then each
    block reduces its words to (k, count) partial spectrum rows (bounded by
    distinct k per block) and a tiny ``groupby(occurrences)`` finishes.
    """
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["text"])

    def wc(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        v = flat.value_counts()
        return pa.table(
            {"word": v.field("values"),
             "n": pc.cast(v.field("counts"), pa.int64())}
        )

    def spectrum_partial(t: pa.Table) -> pa.Table:
        v = t["n"].combine_chunks().value_counts()
        return pa.table(
            {"occurrences": pc.cast(v.field("values"), pa.int64()),
             "n_tokens": pc.cast(v.field("counts"), pa.int64())}
        )

    out = (
        ds.map_batches(wc, batch_format="pyarrow", batch_size=4096)
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(spectrum_partial, batch_format="pyarrow")
        .groupby("occurrences")
        .sum("n_tokens")
        .to_pandas()
        .rename(columns={"sum(n_tokens)": "n_tokens"})
    )
    return (out.sort_values("occurrences").reset_index(drop=True)
            .astype({"occurrences": "int64", "n_tokens": "int64"}))


def bigram_pmi_topk(sf_dir: str, min_count: int = 5, k: int = 20) -> pd.DataFrame:
    """(w1, w2, cxy, pmi_micro) — top-k adjacent-token bigrams by pointwise
    mutual information (Church & Hanks 1990), min corpus count
    ``min_count``: the collocation-mining staple (phrase detection for
    tokenizer/embedding pipelines).  pmi_micro =
    round(ln(cxy*N*N / (B*cx*cy)) * 1e6) with the exact float expression
    the DuckDB oracle evaluates (the dsir/bm25 ln-micro discipline); ties
    at the cut rank break by (w1, w2) ascending on both sides.

    Scale shape: bigram and unigram counts each take ONE token-keyed
    groupby with per-batch value_counts combine; the two count attaches are
    md5-bucket joins of narrow (string, int) rows (no broadcast — the
    unigram table is vocabulary-sized); totals are 1-row reduces; each
    block then emits only its local top-k partial.
    """
    from ray.data.aggregate import Sum

    from .dedup import _token_hash

    N_BUCKETS = 64
    ds = _docs(sf_dir, ["doc_id", "text"])

    def bigram_counts(t: pa.Table) -> pa.Table:
        empty = pa.table({"w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "cxy": pa.array([], pa.int64())})
        toks_per_doc = [s.lower().split() for s in t["text"].to_pylist()]
        lens = np.array([len(x) for x in toks_per_doc], dtype=np.int64)
        flat = [w for ts in toks_per_doc for w in ts]
        if len(flat) < 2:
            return empty
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        adj = doc_idx[1:] == doc_idx[:-1]  # pairs never cross a doc
        if not adj.any():
            return empty
        fused = codes[:-1][adj] * np.int64(len(uniques)) + codes[1:][adj]
        keys, cnt = np.unique(fused, return_counts=True)
        return pa.table(
            {"w1": pa.array(uniques[keys // len(uniques)], pa.string()),
             "w2": pa.array(uniques[keys % len(uniques)], pa.string()),
             "cxy": pa.array(cnt.astype(np.int64), pa.int64())})

    def unigram_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        v = flat.value_counts()
        return pa.table({"w": v.field("values"),
                         "c": pc.cast(v.field("counts"), pa.int64())})

    bg = (
        ds.map_batches(bigram_counts, batch_format="pyarrow", batch_size=4096)
        .groupby(["w1", "w2"]).aggregate(Sum("cxy", alias_name="cxy"))
        .materialize()
    )
    ug = (
        ds.map_batches(unigram_counts, batch_format="pyarrow", batch_size=4096)
        .groupby("w").aggregate(Sum("c", alias_name="c"))
        .materialize()
    )
    N = int(ug.sum("c"))
    B = int(bg.sum("cxy"))

    def _wbucket(words) -> np.ndarray:
        codes, uniq = pd.factorize(np.asarray(words, dtype=object))
        ub = np.fromiter((_token_hash(w) % N_BUCKETS for w in uniq),
                         dtype=np.int64, count=len(uniq))
        return ub[codes] if len(codes) else np.zeros(0, np.int64)

    _J = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                    ("cxy", pa.int64()), ("cx", pa.int64()),
                    ("key", pa.string()), ("side", pa.int8()),
                    ("bucket", pa.int64())])

    def _tag(t: pa.Table, keycol: str, side: int, cx=None) -> pa.Table:
        n = t.num_rows
        keys = t[keycol].to_pylist()
        return pa.table(
            {"w1": t["w1"] if "w1" in t.column_names
             else pa.array([""] * n, pa.string()),
             "w2": t["w2"] if "w2" in t.column_names
             else pa.array([""] * n, pa.string()),
             "cxy": t["cxy"] if "cxy" in t.column_names
             else pa.array(np.zeros(n, np.int64), pa.int64()),
             "cx": t[cx] if cx else pa.array(np.zeros(n, np.int64), pa.int64()),
             "key": pa.array(keys, pa.string()),
             "side": pa.array(np.full(n, side, np.int8), pa.int8()),
             "bucket": pa.array(_wbucket(keys), pa.int64())},
            schema=_J)

    def _attach_c1(g: pd.DataFrame) -> pd.DataFrame:
        lut = g[g["side"] == 1].drop_duplicates("key").set_index("key")["cx"]
        rows = g[g["side"] == 0].copy()
        rows["c1"] = rows["key"].map(lut).astype("int64")
        return rows[["w1", "w2", "cxy", "c1"]]

    # attach c(w1): bigram rows and unigram rows meet in the w1 hash bucket
    j1 = (
        bg.map_batches(lambda t: _tag(t, "w1", 0), batch_format="pyarrow")
        .union(ug.map_batches(lambda t: _tag(t, "w", 1, cx="c"),
                              batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(_attach_c1, batch_format="pandas")
    )

    _J2 = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                     ("cxy", pa.int64()), ("c1", pa.int64()),
                     ("key", pa.string()), ("side", pa.int8()),
                     ("bucket", pa.int64())])

    def _tag2(t: pa.Table, side: int) -> pa.Table:
        n = t.num_rows
        if side == 0:
            keys = t["w2"].to_pylist()
            return pa.table(
                {"w1": t["w1"], "w2": t["w2"], "cxy": t["cxy"],
                 "c1": t["c1"],
                 "key": pa.array(keys, pa.string()),
                 "side": pa.array(np.zeros(n, np.int8), pa.int8()),
                 "bucket": pa.array(_wbucket(keys), pa.int64())},
                schema=_J2)
        keys = t["w"].to_pylist()
        return pa.table(
            {"w1": pa.array([""] * n, pa.string()),
             "w2": pa.array([""] * n, pa.string()),
             "cxy": pa.array(np.zeros(n, np.int64), pa.int64()),
             "c1": t["c"],
             "key": pa.array(keys, pa.string()),
             "side": pa.array(np.ones(n, np.int8), pa.int8()),
             "bucket": pa.array(_wbucket(keys), pa.int64())},
            schema=_J2)

    def _attach_c2_topk(g: pd.DataFrame) -> pd.DataFrame:
        lut = g[g["side"] == 1].drop_duplicates("key").set_index("key")["c1"]
        rows = g[g["side"] == 0].copy()
        rows["c2"] = rows["key"].map(lut).astype("int64")
        rows = rows[rows["cxy"] >= min_count]
        if not len(rows):
            return pd.DataFrame({"w1": pd.Series([], dtype="object"),
                                 "w2": pd.Series([], dtype="object"),
                                 "cxy": pd.Series([], dtype="int64"),
                                 "pmi_micro": pd.Series([], dtype="int64")})
        cxy = rows["cxy"].to_numpy().astype(np.float64)
        c1 = rows["c1"].to_numpy().astype(np.float64)
        c2 = rows["c2"].to_numpy().astype(np.float64)
        # the EXACT oracle float expression, same association order
        pmi = np.log(((cxy * float(N)) * float(N)) / ((float(B) * c1) * c2))
        rows["pmi_micro"] = np.round(pmi * 1e6).astype(np.int64)
        rows = rows.sort_values(["pmi_micro", "w1", "w2"],
                                ascending=[False, True, True],
                                kind="mergesort").head(k)
        return rows[["w1", "w2", "cxy", "pmi_micro"]]

    out = (
        j1.map_batches(lambda t: _tag2(t, 0), batch_format="pyarrow")
        .union(ug.map_batches(lambda t: _tag2(t, 1), batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(_attach_c2_topk, batch_format="pandas")
        .to_pandas()
    )
    out = out.sort_values(["pmi_micro", "w1", "w2"],
                          ascending=[False, True, True],
                          kind="mergesort").head(k)
    return out.reset_index(drop=True).astype(
        {"w1": "str", "w2": "str", "cxy": "int64", "pmi_micro": "int64"})


def char_entropy(sf_dir: str) -> pd.DataFrame:
    """(doc_id, entropy_micronats) — per-document character-unigram Shannon
    entropy as exact int64 micro-nats.  A classic cheap quality signal
    (gibberish and template boilerplate both sit at entropy extremes;
    complements the token-level Gopher flags).

    Determinism: each distinct character's contribution
    ``round((c/n) * ln(n/c) * 1e6)`` is rounded to integer micro-nats
    BEFORE the per-doc sum (the lm_perplexity/pmi ln-micro discipline), so
    the result is independent of summation order and the DuckDB oracle
    checks it hash-exactly.  The corpus is pure ASCII (asserted), so the
    engine's byte-level counting equals the oracle's per-character
    ``string_split(text, '')``.

    Scale shape: map-only — per batch, all texts concatenate into ONE byte
    buffer and a single ``np.unique`` over the composite (row, byte) key
    yields every per-doc character count vectorized (no per-row Python
    loop); contributions round and ``np.bincount`` back to docs.  No
    shuffle; output is doc-sized.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    _SCHEMA = pa.schema([("doc_id", pa.int64()), ("entropy_micronats", pa.int64())])

    def ent(t: pa.Table) -> pa.Table:
        col = t["text"].combine_chunks()
        n_rows = len(col)
        # zero-copy byte view of the whole column + per-row offsets
        # (offset-aware: a sliced array's offsets index the shared buffer)
        offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            col.offset: col.offset + n_rows + 1].astype(np.int64)
        buf = np.frombuffer(col.buffers()[2], dtype=np.uint8)[offs[0]: offs[-1]]
        lens = np.diff(offs)
        if buf.size and buf.max() >= 128:
            raise NotImplementedError("char_entropy assumes an ASCII corpus")
        row = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
        # O(bytes) histogram: bincount over (row, byte) composite keys —
        # a sort-based unique at 1 GB/batch was 2x the whole op's wall
        cnt = np.bincount(row * 128 + buf, minlength=n_rows * 128).reshape(
            n_rows, 128)
        nn = np.maximum(lens, 1).astype(np.float64)[:, None]
        c = cnt.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            micro = np.round((c / nn) * np.log(nn / c) * 1e6)
        micro[cnt == 0] = 0.0
        h = micro.sum(axis=1).astype(np.int64)
        return pa.table(
            {"doc_id": t["doc_id"], "entropy_micronats": pa.array(h, pa.int64())},
            schema=_SCHEMA)

    out = ds.map_batches(ent, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True).astype(
        {"doc_id": "int64", "entropy_micronats": "int64"})


def compression_ratio(sf_dir: str) -> pd.DataFrame:
    """(doc_id, raw_bytes, deflate_bytes, ratio_milli) — per-document
    DEFLATE compressibility, the classic cheap redundancy signal (highly
    templated / repetitive pages compress far below prose; random noise
    compresses above it).  Complements char_entropy: entropy sees the
    unigram distribution, DEFLATE sees repeated substrings.

    ratio_milli = 1000 * deflate_bytes // raw_bytes (integer floor — hash
    stable).  zlib level 6 with a fresh compressor per doc: byte-exact
    deterministic for a fixed zlib, which is why this is a rows-only query
    (no SQL oracle can express DEFLATE; the pytest locks monotonicity and
    determinism instead).  Map-only, no shuffle; the per-row loop is honest
    — compression IS the kernel here, same stance as the codec stages.
    """
    import zlib

    ds = _docs(sf_dir, ["doc_id", "text"])

    _SCHEMA = pa.schema([("doc_id", pa.int64()), ("raw_bytes", pa.int64()),
                         ("deflate_bytes", pa.int64()), ("ratio_milli", pa.int64())])

    def comp(t: pa.Table) -> pa.Table:
        raws = [s.encode("utf-8") for s in t["text"].to_pylist()]
        raw_n = np.array([len(b) for b in raws], dtype=np.int64)
        c_n = np.array([len(zlib.compress(b, 6)) for b in raws], dtype=np.int64)
        ratio = np.where(raw_n > 0, (1000 * c_n) // np.maximum(raw_n, 1), 0)
        return pa.table(
            {"doc_id": t["doc_id"], "raw_bytes": pa.array(raw_n, pa.int64()),
             "deflate_bytes": pa.array(c_n, pa.int64()),
             "ratio_milli": pa.array(ratio.astype(np.int64), pa.int64())},
            schema=_SCHEMA)

    out = ds.map_batches(comp, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def readability_score(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_words, n_sentences, n_vowel_groups, flesch_micro) — Flesch
    reading ease (Flesch 1948: 206.835 - 1.015*(words/sentences) -
    84.6*(syllables/word)) with the classic vowel-GROUP syllable heuristic
    (maximal ``[aeiou]+`` runs; no silent-e adjustment — documented, both
    sides count the same thing).  The readability member of the quality
    family next to quality_score's ratio signals and char_entropy's
    distribution signal.

    Determinism: all three counts are integer RE2 match counts and the score
    is pure integer arithmetic — ``206_835_000 - (1_015_000 * words) //
    max(sents, 1) - (84_600_000 * vgroups) // max(words, 1)`` in micro
    points; floor division on non-negative operands matches DuckDB ``//``
    exactly, so the oracle checks it hash-exactly.

    Scale shape: map-only, three vectorized RE2 count kernels per batch, no
    shuffle; output is doc-sized.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    _SCHEMA = pa.schema([("doc_id", pa.int64()), ("n_words", pa.int64()),
                         ("n_sentences", pa.int64()),
                         ("n_vowel_groups", pa.int64()),
                         ("flesch_micro", pa.int64())])

    def score(t: pa.Table) -> pa.Table:
        txt = t["text"]
        w = pc.cast(pc.count_substring_regex(txt, r"[A-Za-z]+"), pa.int64()).to_numpy()
        s = pc.cast(pc.count_substring_regex(txt, r"[.!?]"), pa.int64()).to_numpy()
        v = pc.cast(pc.count_substring_regex(txt, r"[aeiouAEIOU]+"), pa.int64()).to_numpy()
        flesch = (206_835_000
                  - (1_015_000 * w) // np.maximum(s, 1)
                  - (84_600_000 * v) // np.maximum(w, 1))
        return pa.table(
            {"doc_id": t["doc_id"], "n_words": pa.array(w, pa.int64()),
             "n_sentences": pa.array(s, pa.int64()),
             "n_vowel_groups": pa.array(v, pa.int64()),
             "flesch_micro": pa.array(flesch.astype(np.int64), pa.int64())},
            schema=_SCHEMA)

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


FUNNEL_CHAR_LO, FUNNEL_CHAR_HI = 100, 400
FUNNEL_TOK_LO, FUNNEL_TOK_HI = 20, 55


def filter_funnel(sf_dir: str) -> pd.DataFrame:
    """(stage, n_docs) — cumulative survival counts through the standard
    web-corpus filter cascade (the FineWeb/CCNet-style pipeline-health
    report): total -> non-empty -> lang=en -> char-length band ->
    token-count band.

    Scale shape: ONE map-only pass computes every stage's predicate
    vectorized (Arrow RE2 token count, integer bounds) and emits a single
    5-counter partial row per batch; the only exchange is
    batches x 5 int64s, summed in a tiny driver-side combine.  Adding a
    stage is one more column, not another scan — the cascade never
    re-reads the corpus per filter.
    """
    ds = _docs(sf_dir, ["doc_id", "text", "lang", "n_chars"])

    _P = pa.schema([(s, pa.int64())
                    for s in ("total", "nonempty", "lang_en", "char_band",
                              "token_band")])

    def partial(t: pa.Table) -> pa.Table:
        nonempty = pc.greater(pc.utf8_length(t["text"]), 0)
        lang_en = pc.and_(nonempty, pc.equal(t["lang"], "en"))
        nch = t["n_chars"]
        char_band = pc.and_(
            lang_en,
            pc.and_(pc.greater_equal(nch, FUNNEL_CHAR_LO),
                    pc.less_equal(nch, FUNNEL_CHAR_HI)))
        ntok = pc.count_substring_regex(t["text"], r"\S+")
        token_band = pc.and_(
            char_band,
            pc.and_(pc.greater_equal(ntok, FUNNEL_TOK_LO),
                    pc.less_equal(ntok, FUNNEL_TOK_HI)))
        def n(mask):
            return pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
        return pa.table(
            {"total": pa.array([t.num_rows], pa.int64()),
             "nonempty": pa.array([n(nonempty)], pa.int64()),
             "lang_en": pa.array([n(lang_en)], pa.int64()),
             "char_band": pa.array([n(char_band)], pa.int64()),
             "token_band": pa.array([n(token_band)], pa.int64())},
            schema=_P)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536).to_pandas()
    stages = ["total", "nonempty", "lang_en", "char_band", "token_band"]
    return pd.DataFrame({
        "stage": stages,
        "n_docs": [int(parts[s].sum()) for s in stages],
    })


def vocab_growth_curve(sf_dir: str) -> pd.DataFrame:
    """(decile, n_distinct_tokens) — Heaps-law vocabulary growth: the
    distinct-token count among documents with ``doc_id < n*i/10`` for each
    decile i, i.e. how fast new vocabulary accrues as the corpus is
    consumed in doc_id order.  The curve's flattening rate is the
    standard novelty audit for a training corpus (near-linear growth
    flags boilerplate/noise; early saturation flags template collapse).

    Scale shape: a token appears before threshold t iff its FIRST
    occurrence does, so the curve reduces to per-token min-doc_id — one
    vocabulary-sized all-to-all of per-batch-distinct (token, min_doc)
    rows on the crc32 token bucket; each bucket group computes in-group
    minima vectorized and emits a BOUNDED 10-bin histogram partial
    (first decile each token becomes visible), and the driver cumsums 10
    rows.  Exact — DuckDB counts the same distinct-token predicate.
    """
    import zlib

    ds = _docs(sf_dir, ["doc_id", "text"])
    n = ds.count()
    thresholds = np.array([(n * i) // 10 for i in range(1, 11)], np.int64)
    N_SHUFFLE_BUCKETS = 64

    def token_mins(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        out_w: list = []
        out_d: list = []
        for did, tx in zip(ids, t["text"].to_pylist()):
            toks = set(tx.lower().split())
            out_w.extend(toks)
            out_d.extend([int(did)] * len(toks))
        g = pd.DataFrame({"w": out_w, "d": out_d}).groupby(
            "w", as_index=False)["d"].min()
        buckets = np.fromiter(
            (zlib.crc32(s.encode()) % N_SHUFFLE_BUCKETS for s in g["w"]),
            dtype=np.int32, count=len(g))
        return pa.table({"w": pa.array(g["w"], pa.string()),
                         "d": pa.array(g["d"].to_numpy(), pa.int64()),
                         "bucket": pa.array(buckets, pa.int32())})

    _OUT = pa.schema([("bin", pa.int64()), ("cnt", pa.int64())])

    def bin_partial(g: pd.DataFrame) -> pa.Table:
        mins = g.groupby("w")["d"].min().to_numpy()
        # first decile i (1-based) with min_doc < thr_i; tokens whose first
        # occurrence is past the last threshold can't exist (thr_10 = n)
        first_bin = np.searchsorted(thresholds, mins, side="right") + 1
        cnt = np.bincount(first_bin, minlength=11)[1:11]
        return pa.table({"bin": pa.array(np.arange(1, 11), pa.int64()),
                         "cnt": pa.array(cnt, pa.int64())}, schema=_OUT)

    red = (
        ds.map_batches(token_mins, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bin_partial, batch_format="pandas")
        .to_pandas()
    )
    hist = red.groupby("bin", as_index=False)["cnt"].sum().sort_values("bin")
    out = pd.DataFrame({"decile": hist["bin"].to_numpy(),
                        "n_distinct_tokens": hist["cnt"].cumsum().to_numpy()})
    return out.astype({"decile": "int64", "n_distinct_tokens": "int64"})


def distinct_sketch_report(sf_dir: str) -> pd.DataFrame:
    """(sketch, estimate, exact, err_milli) — the distinct-count sketch
    scoreboard: HLL and KMV estimates measured against the EXACT distinct
    token count on the same corpus, error as integer milli-relative
    (the ann_recall_report convention: a deployed pipeline watches its
    sketches against periodic exact audits).

    Exact side: per-batch distinct tokens -> one vocabulary-sized crc32
    bucket exchange -> per-bucket nunique partials summed (tokens appear
    in exactly one bucket).  Rows-only (the components are checked
    elsewhere: KMV is oracled exactly; HLL's envelope is pytest-locked).
    """
    import zlib

    ds = _docs(sf_dir, ["text"])
    N_SHUFFLE_BUCKETS = 64

    def tok_rows(t: pa.Table) -> pa.Table:
        toks = set()
        for s in t["text"].to_pylist():
            toks.update(s.lower().split())
        toks = sorted(toks)
        buckets = np.fromiter(
            (zlib.crc32(w.encode()) % N_SHUFFLE_BUCKETS for w in toks),
            dtype=np.int32, count=len(toks))
        return pa.table({"w": pa.array(toks, pa.string()),
                         "bucket": pa.array(buckets, pa.int32())})

    _OUT = pa.schema([("n", pa.int64())])

    def nuniq(g: pd.DataFrame) -> pa.Table:
        return pa.table({"n": pa.array([g["w"].nunique()], pa.int64())},
                        schema=_OUT)

    exact = int(
        ds.map_batches(tok_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(nuniq, batch_format="pandas")
        .to_pandas()["n"].sum())

    hll = int(hll_distinct_tokens(sf_dir)["estimate"].iloc[0])
    kmv = int(kmv_distinct_tokens(sf_dir)["estimate"].iloc[0])

    rows = []
    for name, est in (("hll", hll), ("kmv", kmv)):
        rows.append({"sketch": name, "estimate": est, "exact": exact,
                     "err_milli": abs(est - exact) * 1000 // max(exact, 1)})
    return pd.DataFrame(rows).astype(
        {"estimate": "int64", "exact": "int64", "err_milli": "int64"})


_PHRASE_QUERIES = ("hash join", "window sort stream", "spark batch")


def phrase_search(sf_dir: str, phrases=None) -> pd.DataFrame:
    """(query_id, doc_id) — documents containing each query PHRASE as
    CONSECUTIVE whitespace tokens (the exact-phrase operator a search
    engine layers over its inverted index; ``bm25_topk`` is the bag-of-
    words ranking half, this is the positional half).

    Scale shape: map-only — ONE corpus pass, no shuffle.  Each batch
    tokenizes once (the shared factorize idiom), maps every phrase's words
    to that batch's token codes, and matches consecutive-code runs with a
    vectorized AND-chain over shifted code arrays (windows crossing
    document boundaries masked out).  Comparison is on token CODES, not
    hashes — exact, no collision exposure.  Output is (query, doc) pairs
    only; at 100 TB this is the candidate-doc stream a ranker consumes.
    """
    qs = _PHRASE_QUERIES if phrases is None else tuple(phrases)
    q_words = [tuple(q.split()) for q in qs]
    ds = _docs(sf_dir, ["doc_id", "text"])

    _OUT = pa.schema([("query_id", pa.int64()), ("doc_id", pa.int64())])

    def match(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        toks_per_doc = [s.split() for s in t["text"].to_pylist()]
        lens = np.array([len(x) for x in toks_per_doc], dtype=np.int64)
        total = int(lens.sum())
        out_q, out_d = [], []
        if total:
            flat = [w for ts in toks_per_doc for w in ts]
            codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
            lookup = {w: i for i, w in enumerate(uniques)}
            doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
            for qi, words in enumerate(q_words):
                pcodes = [lookup.get(w, -1) for w in words]
                L = len(pcodes)
                if min(pcodes) < 0 or total < L:
                    continue
                m = codes[: total - L + 1] == pcodes[0]
                for j in range(1, L):
                    m &= codes[j: total - L + 1 + j] == pcodes[j]
                # window must not cross a document boundary
                m &= doc_idx[: total - L + 1] == doc_idx[L - 1:]
                hit_docs = np.unique(doc_idx[: total - L + 1][m])
                out_q.extend([qi] * len(hit_docs))
                out_d.extend(ids[hit_docs].tolist())
        return pa.table(
            {"query_id": pa.array(out_q, pa.int64()),
             "doc_id": pa.array(out_d, pa.int64())},
            schema=_OUT)

    out = ds.map_batches(match, batch_format="pyarrow").to_pandas()
    return out.sort_values(["query_id", "doc_id"]).reset_index(drop=True)


def feature_hash_embed(sf_dir: str, n_dims: int = 16) -> pd.DataFrame:
    """(doc_id, f00..f{n_dims-1}) — signed feature-hashing doc vectors
    (the hashing trick, Weinberger et al. 2009): every token OCCURRENCE
    lands in dimension ``h % n_dims`` with sign ``+1`` if bit 4 of its
    md5-ring hash is set else ``-1``; the doc vector is the integer sum.
    The text->vector bridge of the pipeline: these vectors feed the ANN /
    dedup embedding family without a model, and integer outputs keep the
    driver value-hash exact.

    Scale shape: map-only, one pass, no shuffle — tokens factorize per
    batch (hash only the distincts), dims accumulate with one bincount
    over ``doc_idx * n_dims + dim``; every doc in the batch gets a row
    (empty docs embed as the zero vector).  The generated DuckDB oracle
    (oracles.feature_hash_embed_sql) reproduces the same md5 ring.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])
    cols = [f"f{j:02d}" for j in range(n_dims)]

    def embed(t: pa.Table) -> pa.Table:
        ids, acc, _lens = feature_hash_batch(t, n_dims)
        data = {"doc_id": pa.array(ids, pa.int64())}
        for j, c in enumerate(cols):
            data[c] = pa.array(acc[:, j], pa.int64())
        return pa.table(data)

    out = ds.map_batches(embed, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def feature_hash_batch(t: pa.Table, n_dims: int):
    """Per-batch hashing-trick kernel shared by feature_hash_embed and
    ml.hash_feature_regression: (doc_ids, n x n_dims signed int64 vectors,
    per-doc whitespace token counts).  Tokens factorize per batch (hash
    only the distincts), dims accumulate with one bincount."""
    ids = t["doc_id"].to_numpy()
    toks_per_doc = [s.lower().split() for s in t["text"].to_pylist()]
    lens = np.array([len(x) for x in toks_per_doc], dtype=np.int64)
    acc = np.zeros((len(ids), n_dims), dtype=np.int64)
    if int(lens.sum()):
        flat = [w for ts in toks_per_doc for w in ts]
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
        uh = _md5_token_hashes(uniques)
        dim = (uh % np.uint64(n_dims)).astype(np.int64)[codes]
        sign = np.where(
            (uh >> np.uint64(4)) & np.uint64(1), 1, -1
        ).astype(np.int64)[codes]
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        acc = np.bincount(
            doc_idx * n_dims + dim, weights=sign,
            minlength=len(ids) * n_dims,
        ).astype(np.int64).reshape(len(ids), n_dims)
    return ids, acc, lens


K_ANON_K = 5


def k_anonymity_report(sf_dir: str, k: int = K_ANON_K) -> pd.DataFrame:
    """(lang, source, n_docs, at_risk) — k-anonymity audit over the
    (lang, source) quasi-identifier pair: groups smaller than ``k`` are
    re-identification risks a release gate must flag (the governance
    sibling of pii_redact — PII is about CONTENT, k-anonymity about
    MEMBERSHIP).  at_risk = 1 iff n_docs < k.

    Scale shape: the quasi-identifier domain is a bounded enum product, so
    one map-only pass emits per-batch (lang, source, count) combined
    partials and the driver sums a |langs| x |sources| frame — no shuffle
    (the event_type_correlations discovery stance).
    """
    ds = _docs(sf_dir, ["lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        d = pd.DataFrame({"lang": t["lang"].to_pandas(),
                          "source": t["source"].to_pandas()})
        g = d.groupby(["lang", "source"], sort=False).size().reset_index(name="n")
        return pa.table({"lang": pa.array(g["lang"], pa.string()),
                         "source": pa.array(g["source"], pa.string()),
                         "n": pa.array(g["n"].to_numpy(), pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby(["lang", "source"], as_index=False)["n"].sum().rename(
        columns={"n": "n_docs"})
    out["at_risk"] = (out["n_docs"] < k).astype("int64")
    return (out.sort_values(["lang", "source"]).reset_index(drop=True)
            .astype({"n_docs": "int64"}))


def langid_confusion_matrix(sf_dir: str) -> pd.DataFrame:
    """(lang, lang_pred, n_docs) — the confusion matrix of the heuristic
    language-ID against the stored labels: the evaluation artifact that
    turns langid_predict from a column into a model you can judge (which
    languages bleed into which, how much lands in 'und').

    Scale shape: prediction is langid_predict's map-only pass with the
    true label carried along; the (|langs|+1)^2-bounded matrix reduces via
    per-batch combined count partials — no shuffle (the k_anonymity
    bounded-enum stance).
    """
    ds = _docs(sf_dir, ["doc_id", "text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        preds = []
        for txt in t["text"].to_pylist():
            words = set(txt.lower().split())
            best, best_n = "und", 0
            for lang in sorted(_LANG_PROFILES):
                n = len(words & _LANG_PROFILES[lang])
                if n > best_n:
                    best, best_n = lang, n
            preds.append(best)
        d = pd.DataFrame({"lang": t["lang"].to_pandas(), "lang_pred": preds})
        g = d.groupby(["lang", "lang_pred"], sort=False).size().reset_index(name="n")
        return pa.table({"lang": pa.array(g["lang"], pa.string()),
                         "lang_pred": pa.array(g["lang_pred"], pa.string()),
                         "n": pa.array(g["n"].to_numpy(), pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (parts.groupby(["lang", "lang_pred"], as_index=False)["n"].sum()
           .rename(columns={"n": "n_docs"}))
    return (out.sort_values(["lang", "lang_pred"]).reset_index(drop=True)
            .astype({"n_docs": "int64"}))


TYPO_TOPK_QUERIES = 500


def _edit_distance_is_1(a: str, b: str) -> bool:
    """Exact distance-1 test without full DP: equal length -> exactly one
    differing position; length diff 1 -> deletion alignment."""
    la, lb = len(a), len(b)
    if la == lb:
        return sum(1 for x, y in zip(a, b) if x != y) == 1
    if abs(la - lb) != 1:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def typo_token_pairs(sf_dir: str, k: int = TYPO_TOPK_QUERIES) -> pd.DataFrame:
    """(tok_a, tok_b) — vocabulary token pairs at edit distance EXACTLY 1
    where at least one side is a top-``k`` frequent token: the typo /
    near-spelling detector (query-correction candidates, OCR noise, scraped
    -text mangling) via SymSpell-style DELETION-NEIGHBORHOOD blocking
    (Garbe 2012): two distance-1 tokens always share a key in
    ``{token} U del1(token)``, so candidates surface from one key-bucket
    exchange and only candidates pay the exact verify — never the vocab
    cross product the DuckDB oracle brute-forces with levenshtein.

    Scale shape: one tokenize pass -> vocabulary count exchange (vocab-
    sized); the top-k query set broadcasts; each vocab token explodes into
    <= len+1 deletion keys; ONE key-hash bucket exchange groups candidates;
    in-group verification is exact (the distance-1 special case is O(len));
    the verified pair set is result-sized and dedups on the driver.
    """
    import hashlib as _hashlib

    ds = _docs(sf_dir, ["text"])

    def tok_counts(t: pa.Table) -> pa.Table:
        c = Counter()
        for s in t["text"].to_pylist():
            c.update(s.lower().split())
        items = sorted(c.items())
        return pa.table({"w": pa.array([w for w, _ in items], pa.string()),
                         "n": pa.array([n for _, n in items], pa.int64()),
                         "bucket": pa.array(
                             [int.from_bytes(_hashlib.md5(w.encode()).digest()[:4],
                                             "big") % 64 for w, _ in items],
                             pa.int32())})

    _V = pa.schema([("w", pa.string()), ("n", pa.int64())])

    def vsum(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("w", as_index=False)["n"].sum()
        return pa.Table.from_pandas(s[["w", "n"]], schema=_V,
                                    preserve_index=False
                                    ).replace_schema_metadata(None)

    vocab = (ds.map_batches(tok_counts, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(vsum, batch_format="pandas")
             .materialize())
    top = (vocab.to_pandas().sort_values(["n", "w"], ascending=[False, True])
           .head(k)["w"])
    import ray as _ray
    q_ref = _ray.put(frozenset(top))

    def explode_keys(t: pa.Table) -> pa.Table:
        ws, keys = [], []
        for w in t["w"].to_pylist():
            for key in {w} | {w[:i] + w[i + 1:] for i in range(len(w))}:
                ws.append(w)
                keys.append(key)
        return pa.table({"w": pa.array(ws, pa.string()),
                         "key": pa.array(keys, pa.string()),
                         "bucket": pa.array(
                             [int.from_bytes(_hashlib.md5(x.encode()).digest()[:4],
                                             "big") % 64 for x in keys],
                             pa.int32())})

    _P = pa.schema([("tok_a", pa.string()), ("tok_b", pa.string())])

    def candidates(g: pd.DataFrame) -> pa.Table:
        qset = _ray.get(q_ref)
        out = set()
        for _, grp in g.groupby("key", sort=False):
            toks = grp["w"].unique()
            if len(toks) < 2:
                continue
            for i in range(len(toks)):
                for j in range(i + 1, len(toks)):
                    a, b = toks[i], toks[j]
                    if (a in qset or b in qset) and _edit_distance_is_1(a, b):
                        out.add((min(a, b), max(a, b)))
        pairs = sorted(out)
        return pa.table({"tok_a": pa.array([p[0] for p in pairs], pa.string()),
                         "tok_b": pa.array([p[1] for p in pairs], pa.string())},
                        schema=_P)

    out = (vocab.map_batches(explode_keys, batch_format="pyarrow")
           .groupby("bucket")
           .map_groups(candidates, batch_format="pandas")
           .to_pandas())
    if "tok_a" not in out.columns:  # no pair anywhere -> typed empty frame
        return pd.DataFrame({"tok_a": pd.Series([], dtype="object"),
                             "tok_b": pd.Series([], dtype="object")})
    out = out.drop_duplicates()  # the same pair can surface via several keys
    return (out.sort_values(["tok_a", "tok_b"]).reset_index(drop=True))


def median_doc_hash(sf_dir: str) -> pd.DataFrame:
    """(n_docs, median_hash) — EXACT lower median (0-based rank (n-1)//2)
    of the 63-bit md5 content fingerprint, found WITHOUT a global sort:
    two map-only 4096-bin histogram passes narrow the median to one
    24-bit prefix bin, then a third pass collects only that bin's values
    (expected n / 2^24 rows — ~60k values even at 10^12 docs) for the
    exact in-bin rank.  The sort-free distributed order-statistic shape
    for UNBOUNDED domains — the complement of the bounded-cents histogram
    quantiles and the sort-based ``_values_at_ranks``: total data moved is
    two 4096-row histograms per block plus one tiny value collect, versus
    a full all-to-all range exchange.

    The hash domain is the DuckDB-expressible md5 prefix (the simhash
    idiom): ``int(md5(text)[:8]) & (2^63 - 1)``.
    """
    ds = _docs(sf_dir, ["text"])

    def hashes(t: pa.Table) -> np.ndarray:
        return np.array(
            [int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")
             & ((1 << 63) - 1) for s in t["text"].to_pylist()],
            dtype=np.int64)

    _H = pa.schema([("b", pa.int64()), ("c", pa.int64())])

    def hist_pass(shift: int, prefix_shift: int | None, prefix: int):
        def f(t: pa.Table) -> pa.Table:
            h = hashes(t)
            if prefix_shift is not None:
                h = h[(h >> prefix_shift) == prefix]
            cnt = np.bincount((h >> shift) & 4095, minlength=4096)
            nz = np.flatnonzero(cnt)
            return pa.table({"b": pa.array(nz, pa.int64()),
                             "c": pa.array(cnt[nz], pa.int64())}, schema=_H)
        return f

    def winning_bin(parts: pd.DataFrame, rank: int) -> tuple[int, int]:
        s = parts.groupby("b")["c"].sum().sort_index()
        cum = s.cumsum().to_numpy()
        i = int(np.searchsorted(cum, rank + 1))
        before = int(cum[i - 1]) if i else 0
        return int(s.index[i]), rank - before

    n = ds.count()
    if n == 0:
        return pd.DataFrame({"n_docs": pd.Series([0], dtype="int64"),
                             "median_hash": pd.Series([0], dtype="int64")})
    rank = (n - 1) // 2
    p1 = ds.map_batches(hist_pass(51, None, 0), batch_format="pyarrow").to_pandas()
    w1, rank = winning_bin(p1, rank)
    p2 = ds.map_batches(hist_pass(39, 51, w1), batch_format="pyarrow").to_pandas()
    w2, rank = winning_bin(p2, rank)
    pref = (w1 << 12) | w2

    def collect(t: pa.Table) -> pa.Table:
        h = hashes(t)
        h = h[(h >> 39) == pref]
        return pa.table({"v": pa.array(h, pa.int64())})

    vals = np.sort(ds.map_batches(collect, batch_format="pyarrow")
                   .to_pandas()["v"].to_numpy())
    return pd.DataFrame({"n_docs": pd.Series([n], dtype="int64"),
                         "median_hash": pd.Series([int(vals[rank])],
                                                  dtype="int64")})


def kmv_token_overlap(sf_dir: str, k: int = 16) -> pd.DataFrame:
    """(k, kth_union, est_union, matches, est_intersection) — KMV sketch
    SET OPERATIONS (the Theta-sketch union/intersection algebra, Dasgupta
    et al. 2016, on the deterministic KMV base kmv_distinct_tokens
    oracles): distinct-token overlap between the 'en' corpus slice and the
    rest.  Union sketch = k smallest of the two side sketches' union;
    intersection estimate = |unionK ∩ A ∩ B| * est_union // k — pure
    integer arithmetic on sketches that are exact functions of the data,
    so DuckDB recomputes every value.  When the union is unsaturated
    (< k distinct hashes total) the sketches ARE the sets and both
    estimates are exact counts.

    Scale shape: one map pass emits per-batch per-side k-min distinct
    hashes (<= 2k rows per batch, no shuffle, no token leaves its batch);
    the driver folds constant-size sketches.
    """
    ds = _docs(sf_dir, ["text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        sides, hs = [], []
        is_en = pc.equal(t["lang"], "en")
        for side, mask in (("a", is_en), ("b", pc.invert(is_en))):
            txt = t.filter(mask)["text"]
            if len(txt) == 0:
                continue
            toks = pc.split_pattern_regex(pc.utf8_lower(txt), r"\s+")
            flat = pc.list_flatten(toks)
            flat = flat.filter(pc.not_equal(flat, ""))
            uniq = pc.unique(flat).to_pylist()
            if not uniq:
                continue
            h = np.unique(_md5_token_hashes(uniq) >> np.uint64(1))
            if len(h) > k:
                h = np.partition(h, k - 1)[:k]
            sides.extend([side] * len(h))
            hs.append(h.astype(np.int64))
        return pa.table({"side": pa.array(sides, pa.string()),
                         "h": pa.array(
                             np.concatenate(hs) if hs
                             else np.array([], np.int64), pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=4096).to_pandas()
    sk = {}
    for side in ("a", "b"):
        h = np.unique(parts[parts["side"] == side]["h"].to_numpy())
        sk[side] = h[:k]  # np.unique sorts: the k smallest distinct
    union_all = np.unique(np.concatenate([sk["a"], sk["b"]]))
    saturated = len(union_all) >= k
    u = union_all[:k]
    kth = int(u[-1]) if len(u) else 0
    est_union = ((k - 1) * (1 << 63) // kth if saturated
                 else int(len(union_all)))
    matches = int(np.isin(u, sk["a"]).__and__(np.isin(u, sk["b"])).sum())
    est_inter = (matches * est_union // k) if saturated else matches
    return pd.DataFrame(
        {"k": pd.Series([k], dtype="int64"),
         "kth_union": pd.Series([kth], dtype="int64"),
         "est_union": pd.Series([int(est_union)], dtype="int64"),
         "matches": pd.Series([matches], dtype="int64"),
         "est_intersection": pd.Series([int(est_inter)], dtype="int64")})


def source_lang_chi2(sf_dir: str) -> pd.DataFrame:
    """(n_cells, dof, chi2_micro) — Pearson chi-square INDEPENDENCE audit
    of the (source, lang) contingency table: is language mix uniform
    across hosts?  (The drift gate a multilingual-corpus curator runs per
    crawl; source_drift_ks is the one-dimensional sibling.)  Each cell
    contributes ``floor(1e6 * (o*n - r*c)^2 / (n * r * c))`` — the
    chi-square term scaled so every value is an exact integer function of
    the counts (per-cell floor BEFORE the sum, the repo's micro-rounding
    idiom); intermediates reach ~n^4 so the driver uses Python ints and
    the oracle HUGEINT.

    Scale shape: MAP-ONLY — per-batch (source, lang) count partials are
    bounded by the enum product, not the batch; the driver folds a
    |sources x langs| frame.  No shuffle.
    """
    ds = _docs(sf_dir, ["source", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        g = (t.group_by(["source", "lang"])
             .aggregate([("source", "count")])
             .rename_columns(["source", "lang", "cnt"]))
        return g.set_column(2, "cnt", pc.cast(g["cnt"], pa.int64()))

    p = ds.map_batches(partial, batch_format="pyarrow",
                       batch_size=262144).to_pandas()
    cells = p.groupby(["source", "lang"], as_index=False)["cnt"].sum()
    n = int(cells["cnt"].sum())
    rows = cells.groupby("source")["cnt"].sum()
    cols = cells.groupby("lang")["cnt"].sum()
    chi2 = 0
    # the full r x c lattice: absent observed cells still contribute
    # (0*n - r*c)^2 / (n*r*c) = r*c/n terms
    obs = {(s, l): int(c) for s, l, c in cells.itertuples(index=False)}
    for s, r in rows.items():
        for l, c in cols.items():
            o = obs.get((s, l), 0)
            num = (o * n - int(r) * int(c)) ** 2 * 1_000_000
            chi2 += num // (n * int(r) * int(c))
    return pd.DataFrame(
        {"n_cells": pd.Series([len(rows) * len(cols)], dtype="int64"),
         "dof": pd.Series([(len(rows) - 1) * (len(cols) - 1)], dtype="int64"),
         "chi2_micro": pd.Series([chi2], dtype="int64")})
