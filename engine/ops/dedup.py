"""Deduplication operators over the ``documents`` table.

The large-scale-pipeline dedup family: exact (hash-partition + per-group
first), MinHash+LSH near-dup, SimHash, and n-gram Jaccard verification.
The exact variant is the distributed generalization of the reference's
implicit no-revisit guarantee (SURVEY.md §2.7 D1); the near-dup variants are
the training-data ops the reference never needed.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .io import read_pruned


def _docs(sf_dir: str, columns):
    return read_pruned(os.path.join(sf_dir, "documents.parquet"), columns)


def _text_hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big") & (
        (1 << 63) - 1
    )


def exact_dedup_ds(sf_dir: str):
    """doc_id -> canonical_id (min doc_id among byte-identical texts).
    Dataset in, Dataset out — the curate composition consumes this without
    a driver collect.

    Hash-partition + per-group-first: a content-hash column added vectorized,
    then ``groupby(hash).map_groups`` assigns each group its min doc_id — the
    shuffle moves (hash, doc_id) pairs, never the text.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    N_BUCKETS = 64  # coarse shuffle key: groupby on the raw hash would invoke
    # the group fn once per DISTINCT text (≈ once per row); bucketing keeps the
    # shuffle exact (same text => same bucket) with O(N_BUCKETS) invocations,
    # each doing one vectorized pandas groupby.

    def add_hash(t: pa.Table) -> pa.Table:
        hashes = [_text_hash64(s) for s in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text_hash": pa.array(hashes, pa.int64()),
                "bucket": pa.array([h % N_BUCKETS for h in hashes], pa.int32()),
            }
        )

    _CANON_SCHEMA = pa.schema([("doc_id", pa.int64()), ("canonical_id", pa.int64())])

    def canonical(g: pd.DataFrame):
        g = g.copy()
        g["canonical_id"] = g.groupby("text_hash")["doc_id"].transform("min")
        return pa.Table.from_pandas(
            g[["doc_id", "canonical_id"]], schema=_CANON_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(canonical, batch_format="pandas")
    )


def exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Driver-protocol wrapper of :func:`exact_dedup_ds` — same columns,
    collected and doc_id-sorted."""
    out = exact_dedup_ds(sf_dir).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

N_PERM = 64
N_BANDS = 16          # 16 bands x 4 rows
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = (1 << 61) - 1


def _perm_params(seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)
    return a, b


_TOKEN_HASH_MEMO: dict = {}

# odd multipliers making the k-gram combine order-sensitive, + splitmix
# finalizer constants (public-domain splitmix64)
_POS_MULT = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
     0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63, 0xFF51AFD7ED558CCD,
     0xC4CEB9FE1A85EC53, 0x9E3779B185EBCA87],  # murmur3 fmix / xxh64 primes
    dtype=np.uint64,
)


def _token_hash(w: str) -> int:
    """md5-prefix-64 of one token, memoized per worker: natural-language token
    frequency is Zipf, so the cache absorbs almost all occurrences — the
    per-SHINGLE digest of rounds 1-2 paid the hash cost V^k times more.

    md5 (not blake2b) so the whole MinHash pipeline is DuckDB-expressible:
    ``('0x' || substr(md5(w),1,16))::UBIGINT`` computes the same 64 bits —
    the same trade ``_token_bits`` made for the SimHash oracle."""
    v = _TOKEN_HASH_MEMO.get(w)
    if v is None:
        v = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
        if len(_TOKEN_HASH_MEMO) < 2_000_000:
            _TOKEN_HASH_MEMO[w] = v
    return v


def _mix64(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _mix64_int(x: int) -> int:
    """Scalar splitmix64 finalizer (exact twin of :func:`_mix64`), for
    driver-side constants (e.g. seed mixing) shared with the SQL oracles."""
    m = (1 << 64) - 1
    x &= m
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & m
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & m
    return x ^ (x >> 31)


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """DISTINCT k-token-gram hashes (uint64 < 2^61), fully vectorized after
    per-token hashing: shingle hash = splitmix-mixed positional combine of
    the k token hashes (order-sensitive), np.unique for the set."""
    toks = text.lower().split()
    n = len(toks)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    th = np.fromiter((_token_hash(w) for w in toks), dtype=np.uint64, count=n)
    if n < k:
        h = np.uint64(0)
        for j in range(n):
            h ^= th[j] * _POS_MULT[j]
        g = np.array([h], dtype=np.uint64)
    else:
        g = np.zeros(n - k + 1, dtype=np.uint64)
        for j in range(k):
            g ^= th[j : n - k + 1 + j] * _POS_MULT[j]
    return np.unique(_mix64(g) & np.uint64((1 << 61) - 1))


def _minhash_sig(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(shingle_hashes) == 0:
        return np.full(N_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    # (a*x + b) mod p for each perm; min over shingles
    vals = (a[None, :] * shingle_hashes[:, None] + b[None, :]) % np.uint64(_MERSENNE)
    return vals.min(axis=0)


def _minhash_sigs_batch(sh_list: list, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Signatures for a whole batch in ONE (S_total, 64) permute-and-min:
    all docs' shingles concatenate, the linear hash evaluates once, and
    ``np.minimum.reduceat`` takes each doc's min over its segment — no
    per-doc Python in the permute step."""
    n = len(sh_list)
    sigs = np.full((n, N_PERM), np.iinfo(np.uint64).max, dtype=np.uint64)
    counts = np.fromiter((len(s) for s in sh_list), dtype=np.int64, count=n)
    nonempty = counts > 0
    if not nonempty.any():
        return sigs
    all_sh = np.concatenate([s for s in sh_list if len(s)])
    offs = np.concatenate([[0], np.cumsum(counts[nonempty])[:-1]])
    # one perm at a time: the working set stays ~len(all_sh)*8 bytes instead
    # of a (S, 64) product matrix — cache-resident and allocation-light
    out = np.empty((N_PERM, len(offs)), dtype=np.uint64)
    m = np.uint64(_MERSENNE)
    for i in range(N_PERM):
        v = (a[i] * all_sh + b[i]) % m
        out[i] = np.minimum.reduceat(v, offs)
    sigs[nonempty] = out.T
    return sigs


def _band_keys(sigs: np.ndarray) -> np.ndarray:
    """(n_docs, N_BANDS) int64 band keys, vectorized: positional combine of
    each band's ROWS_PER_BAND signature values + the band id, splitmix
    finalizer, masked int64-safe (replaces 16 per-doc blake2b calls)."""
    n = sigs.shape[0]
    bands = sigs.reshape(n, N_BANDS, ROWS_PER_BAND)
    h = np.zeros((n, N_BANDS), dtype=np.uint64)
    for j in range(ROWS_PER_BAND):
        h ^= bands[:, :, j] * _POS_MULT[j]
    h ^= np.arange(N_BANDS, dtype=np.uint64)[None, :] * np.uint64(0x2545F4914F6CDD1D)
    return (_mix64(h) & np.uint64((1 << 63) - 1)).astype(np.int64)


N_VERIFY_BUCKETS = 32  # width of the bucketed_copy used by verify reads

# hot-bucket guards (shared with the generated DuckDB oracles so they can't
# drift): a fine LSH group bigger than this is non-discriminative noise and
# produces no pairs.  Standard LSH practice; deterministic.
MINHASH_MAX_BUCKET = 256
SIMHASH_MAX_BUCKET = 512


def _pair_dedup_ds(pairs_ds, cols=("doc_a", "doc_b"), n_buckets: int = 64,
                   min_count: int = 1):
    """Distributed pair-dedup (VERDICT r2 "what's wrong" #5): candidate
    (a, b) pairs found in multiple bands/blocks/tables are deduped INSIDE a
    pair-hash bucket shuffle — identical pairs hash to the same bucket, so a
    per-bucket vectorized drop_duplicates is exact and the candidate list
    never materializes on the driver.

    ``min_count > 1`` turns the dedup into AND-amplification: only pairs
    emitted at least that many times (= collided in that many independent
    tables) survive.  For hyperplane LSH over low-dim embeddings this is
    the difference between a usable candidate set and a quadratic one —
    random 32-dim vector angles concentrate near 90° with std ~1/sqrt(dim),
    so single-table collision rates sit orders of magnitude above the
    uniform-code estimate (measured: 45.8M candidates from 2M vectors at
    n_planes=24), while truly-near pairs collide in MANY tables.
    """
    ca, cb = cols
    schema = pa.schema([(ca, pa.int64()), (cb, pa.int64())])

    def add_pbucket(t: pa.Table) -> pa.Table:
        a = t[ca].to_numpy()
        b = t[cb].to_numpy()
        h = (a * np.int64(1_000_003) + b) % n_buckets
        return t.append_column("pbucket", pa.array(h.astype(np.int32), pa.int32()))

    def dedup_group(g: pd.DataFrame) -> pa.Table:
        if min_count > 1:
            out = g.groupby([ca, cb], sort=False).size().reset_index(name="_n")
            out = out[out["_n"] >= min_count]
        else:
            out = g.drop_duplicates([ca, cb])
        return pa.table(
            {ca: pa.array(out[ca].to_numpy(), pa.int64()),
             cb: pa.array(out[cb].to_numpy(), pa.int64())},
            schema=schema,
        )

    return (
        pairs_ds.map_batches(add_pbucket, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(dedup_group, batch_format="pandas")
    )


def _empty_pairs(cols=("doc_a", "doc_b")) -> pd.DataFrame:
    return pd.DataFrame({cols[0]: pd.Series([], dtype="int64"),
                         cols[1]: pd.Series([], dtype="int64")})


def _pairs_to_pandas(pairs_ds, cols=("doc_a", "doc_b")) -> pd.DataFrame:
    out = pairs_ds.to_pandas()
    if cols[0] not in out.columns:  # all blocks empty
        return _empty_pairs(cols)
    return out.sort_values(list(cols)).reset_index(drop=True)


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.5, k_shingle: int = 3) -> pd.DataFrame:
    """Near-duplicate pairs via MinHash signatures + banded LSH + Jaccard verify.

    Pipeline shape (ray_guide 'Near-dup'): shingle+minhash per batch ->
    explode to (band_id, band_hash, doc_id) rows -> groupby(band) -> candidate
    pairs -> distributed pair-dedup -> exact shingle-Jaccard verification
    against a BUCKETED docs copy -> pairs (a < b) with jaccard >= threshold.
    Output columns: doc_a, doc_b.

    DuckDB-oracle-checked END TO END: the md5/splitmix/ring arithmetic is
    deterministic and SQL-expressible, so `engine.oracles.minhash_lsh_pairs_sql`
    replicates candidates AND verify exactly (generated from these constants).
    """
    return _pairs_to_pandas(_minhash_pairs_ds(sf_dir, threshold, k_shingle))


def _minhash_pairs_ds(sf_dir: str, threshold: float = 0.5, k_shingle: int = 3):
    """Dataset-returning core of minhash_lsh_pairs: verified near-dup pairs
    as a streaming Dataset — consumed by both the query wrapper and the
    connected-components canonicalizer without a driver round-trip."""
    a_par, b_par = _perm_params()
    ds = _docs(sf_dir, ["doc_id", "text"])

    N_SHUFFLE_BUCKETS = 64  # coarse shuffle key (see exact_dedup): the fine
    # (band, band_key) grouping happens vectorized inside each bucket group.
    MAX_BUCKET = MINHASH_MAX_BUCKET  # hot-bucket guard (see constant above)

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        sh_list = [_shingles(tx, k_shingle) for tx in t["text"].to_pylist()]
        sigs = _minhash_sigs_batch(sh_list, a_par, b_par)
        keys = _band_keys(sigs)  # (n, N_BANDS)
        doc_ids = np.repeat(ids, N_BANDS)
        band_keys = keys.reshape(-1)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band_key": pa.array(band_keys, pa.int64()),
                "bucket": pa.array(
                    (band_keys % N_SHUFFLE_BUCKETS).astype(np.int32), pa.int32()
                ),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        # prefilter: at corpus scale almost every band key is a singleton;
        # drop those vectorized BEFORE the per-key Python iteration (5M docs
        # -> ~1M fine keys per shuffle bucket, so iterating size-1 groups
        # would dominate the stage).
        g = g[g.groupby("band_key")["band_key"].transform("size") >= 2]
        out_a, out_b = [], []
        for _, sub in g.groupby("band_key", sort=False):
            # np.unique sorts — same (a < b) pair orientation as before;
            # triu_indices replaces the r3 Python double loop (VERDICT r3
            # "what's wrong" #3, matching simhash's treatment below).
            ids = np.unique(sub["doc_id"].to_numpy())
            n = len(ids)
            if n < 2 or n > MAX_BUCKET:
                continue
            iu, ju = np.triu_indices(n, k=1)
            out_a.append(ids[iu])
            out_b.append(ids[ju])
        a = np.concatenate(out_a) if out_a else np.zeros(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.zeros(0, np.int64)
        return pa.table({"doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(b, pa.int64())}, schema=_PAIR_SCHEMA)

    candidates = _pair_dedup_ds(
        ds.map_batches(band_rows, batch_format="pyarrow", batch_size=1024)
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    # Distributed verify (VERDICT r1 next-round #7): each verify task reads
    # ONLY the texts its chunk references — and only from the touched
    # ``bucket=K/`` partitions of a one-time bucketed docs copy (VERDICT r2
    # "what's wrong" #3: an in-filter against the monolithic parquet re-scans
    # the footer + overlapping row groups per chunk).  Shingles each doc once
    # per chunk, applies exact Jaccard.  Driver never sees the candidates.
    from .io import bucketed_copy, read_bucket_ids

    docs_bucketed = bucketed_copy(
        os.path.join(sf_dir, "documents.parquet"), "doc_id", ["doc_id", "text"],
        N_VERIFY_BUCKETS,
    )

    def verify_chunk(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_pylist()
        b = t["doc_b"].to_pylist()
        if not a:
            return _PAIR_SCHEMA.empty_table()
        need = sorted(set(a) | set(b))
        tex = read_bucket_ids(
            docs_bucketed, "doc_id", ["doc_id", "text"], need, N_VERIFY_BUCKETS
        )
        texts = dict(zip(tex["doc_id"].to_pylist(), tex["text"].to_pylist()))
        sh = {d: set(_shingles(texts[d], k_shingle).tolist()) for d in need}
        keep_a, keep_b = [], []
        for x, y in zip(a, b):
            u = sh[x] | sh[y]
            j = (len(sh[x] & sh[y]) / len(u)) if u else 1.0
            if j >= threshold:
                keep_a.append(x)
                keep_b.append(y)
        return pa.table({"doc_a": pa.array(keep_a, pa.int64()),
                         "doc_b": pa.array(keep_b, pa.int64())}, schema=_PAIR_SCHEMA)

    return candidates.map_batches(verify_chunk, batch_format="pyarrow", batch_size=2048)


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact k-gram Jaccard similarity of two texts (the verify kernel)."""
    sa = set(_shingles(text_a, k).tolist())
    sb = set(_shingles(text_b, k).tolist())
    u = sa | sb
    return (len(sa & sb) / len(u)) if u else 1.0


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

# token -> ±1 bit-vector memo: natural-language token frequency follows Zipf,
# so the per-worker cache hit rate is high and the per-token blake2b+unpack
# cost is paid once per distinct token per worker, not once per occurrence.
_SIMHASH_MEMO: dict = {}


def _token_bits(w: str) -> np.ndarray:
    v = _SIMHASH_MEMO.get(w)
    if v is None:
        # md5 prefix (not blake2b) so the signature is DuckDB-expressible:
        # ('0x' || substr(md5(w),1,16))::UBIGINT computes the same 64 bits.
        h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
        bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        v = np.where(bits == 1, 1, -1).astype(np.int64)
        if len(_SIMHASH_MEMO) < 1_000_000:
            _SIMHASH_MEMO[w] = v
    return v


def _simhash64(text: str) -> int:
    acc = np.zeros(64, dtype=np.int64)
    for w in set(text.lower().split()):
        acc += _token_bits(w)
    bits = (acc > 0).astype(np.uint64)
    out = int((bits << np.arange(64, dtype=np.uint64)).sum())
    return out & ((1 << 63) - 1)  # keep int64-safe


def simhash_signatures(sf_dir: str) -> pd.DataFrame:
    """doc_id, simhash — 64-bit SimHash over the token set. Rows-only."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def sig(t: pa.Table) -> pa.Table:
        out = [_simhash64(s) for s in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(out, pa.int64())})

    out = ds.map_batches(sig, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# byte -> popcount lookup (vectorized Hamming over uint64 views)
_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1).astype(
    np.uint8
)

_PAIR_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])


def _hamming_matrix(hs: np.ndarray) -> np.ndarray:
    """Pairwise Hamming distances of a uint64 signature vector (n x n)."""
    xor = hs[:, None] ^ hs[None, :]
    return _POP8[xor.view(np.uint8).reshape(len(hs), len(hs), 8)].sum(axis=2)


def simhash_near_pairs(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Distributed end-to-end (VERDICT r1 "what's wrong" #2 — signatures never
    touch the driver): each batch emits (doc_id, simhash, blk, key) rows for
    the 4 x 16-bit sub-keys (pigeonhole: a pair within Hamming<=3 agrees
    exactly on >=1 block), a coarse 64-bucket shuffle co-locates fine keys,
    and each bucket group verifies candidates with a vectorized XOR/popcount
    matrix.  Cross-block duplicate pairs are dropped inside a pair-hash
    bucket shuffle (never on the driver); only the final surviving pairs
    reach the driver.  DuckDB-oracle-checked end to end
    (`engine.oracles.simhash_near_pairs_sql`).
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    N_SHUFFLE_BUCKETS = 64
    MAX_BUCKET = SIMHASH_MAX_BUCKET  # hot-bucket guard (see constant above)

    def block_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        hs = np.array([_simhash64(s) for s in t["text"].to_pylist()], dtype=np.uint64)
        out_id = np.tile(ids, 4)
        out_h = np.tile(hs, 4).astype(np.int64)
        blk = np.repeat(np.arange(4, dtype=np.int32), len(ids))
        key = ((np.tile(hs, 4) >> (blk.astype(np.uint64) * np.uint64(16)))
               & np.uint64(0xFFFF)).astype(np.int32)
        bucket = ((blk.astype(np.int64) << 16) | key) % N_SHUFFLE_BUCKETS
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "simhash": pa.array(out_h, pa.int64()),
                "blk": pa.array(blk, pa.int32()),
                "key": pa.array(key, pa.int32()),
                "bucket": pa.array(bucket.astype(np.int32), pa.int32()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        # singleton (blk, key) groups can't produce pairs: drop vectorized
        # before the per-key iteration (see minhash bucket_pairs).
        g = g[g.groupby(["blk", "key"])["key"].transform("size") >= 2]
        out_a: list = []
        out_b: list = []
        for _, sub in g.groupby(["blk", "key"], sort=False):
            n = len(sub)
            if n < 2 or n > MAX_BUCKET:
                continue
            order = np.argsort(sub["doc_id"].to_numpy(), kind="stable")
            ids = sub["doc_id"].to_numpy()[order]
            hs = sub["simhash"].to_numpy()[order].astype(np.uint64)
            dist = _hamming_matrix(hs)
            iu, ju = np.triu_indices(n, k=1)
            ok = dist[iu, ju] <= max_hamming
            out_a.append(ids[iu[ok]])
            out_b.append(ids[ju[ok]])
        a = np.concatenate(out_a) if out_a else np.zeros(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.zeros(0, np.int64)
        return pa.table({"doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(b, pa.int64())}, schema=_PAIR_SCHEMA)

    return _pairs_to_pandas(
        _pair_dedup_ds(
            ds.map_batches(block_rows, batch_format="pyarrow", batch_size=4096)
            .groupby("bucket")
            .map_groups(bucket_pairs, batch_format="pandas")
        )
    )


# ---------------------------------------------------------------------------
# Near-dedup canonicalization (connected components over pair ops)
# ---------------------------------------------------------------------------

_CC_EDGE_SCHEMA = pa.schema(
    [("k", pa.int64()), ("v", pa.int64()), ("side", pa.int8()), ("bucket", pa.int32())]
)
_CC_MSG_SCHEMA = pa.schema(
    [("node", pa.int64()), ("cand", pa.int64()), ("bucket", pa.int32())]
)
_CC_LABEL_SCHEMA = pa.schema([("node", pa.int64()), ("label", pa.int64())])


def connected_components_ds(pairs_ds, n_buckets: int = 64, max_rounds: int = 64):
    """DISTRIBUTED connected components over an edge Dataset (doc_a, doc_b):
    returns a Dataset (node, label) where label = min node id in the
    component — no driver-side union-find (VERDICT r2 "what's wrong" #2).

    Min-label propagation with pointer-jumping, all on the repo's
    coarse-bucket shuffle idiom:

    - round edges = base edges (both directions) UNION the current label
      pointers (both directions) — the pointer edges give label-doubling,
      so chains contract in O(log diameter) rounds, not O(diameter);
    - message step: one bucketed hash join (bucket = src % n_buckets) sends
      label[src] to dst for every round edge, vectorized pandas merge per
      bucket group;
    - combine step: (node, cand) messages + current labels bucket-shuffle on
      node and take the per-node min, vectorized;
    - convergence: labels only ever DECREASE, so sum(label) is a monotone
      witness — two rounds with equal sums means fixpoint.  The sums are
      tiny Sum() aggregates, never a driver collect of the labels.

    Per-round state is (nodes-in-pairs) rows in the object store; the driver
    holds only the scalar sums.
    """
    import ray.data  # noqa: F401  (ensures rd bound in closures)

    def edges_both(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy()
        b = t["doc_b"].to_numpy()
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table(
            {
                "k": pa.array(src, pa.int64()),
                "v": pa.array(dst, pa.int64()),
                "side": pa.array(np.zeros(len(src), np.int8), pa.int8()),
                "bucket": pa.array((src % n_buckets).astype(np.int32), pa.int32()),
            },
            schema=_CC_EDGE_SCHEMA,
        )

    base_edges = pairs_ds.map_batches(edges_both, batch_format="pyarrow").materialize()
    if base_edges.count() == 0:
        return rd.from_arrow(_CC_LABEL_SCHEMA.empty_table())

    # initial labels: label[node] = min(node, min over direct neighbors) —
    # the first propagation round, computed from the edge rows directly.
    def init_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"node": t["k"].to_numpy(), "nbr": t["v"].to_numpy()})
        g = df.groupby("node", as_index=False)["nbr"].min()
        lab = np.minimum(g["node"].to_numpy(), g["nbr"].to_numpy())
        return pa.table(
            {"node": pa.array(g["node"].to_numpy(), pa.int64()),
             "cand": pa.array(lab, pa.int64()),
             "bucket": pa.array((g["node"].to_numpy() % n_buckets).astype(np.int32), pa.int32())},
            schema=_CC_MSG_SCHEMA,
        )

    def min_per_node(g: pd.DataFrame) -> pa.Table:
        m = g.groupby("node", as_index=False)["cand"].min()
        return pa.table(
            {"node": pa.array(m["node"].to_numpy(), pa.int64()),
             "label": pa.array(m["cand"].to_numpy(), pa.int64())},
            schema=_CC_LABEL_SCHEMA,
        )

    labels = (
        base_edges.map_batches(init_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(min_per_node, batch_format="pandas")
        .materialize()
    )

    def label_rows(t: pa.Table) -> pa.Table:
        # labels re-keyed for the join (side=1) PLUS pointer edges both ways
        # (side=0): (node -> label) and (label -> node).
        node = t["node"].to_numpy()
        lab = t["label"].to_numpy()
        ptr = node != lab
        src = np.concatenate([node, node[ptr], lab[ptr]])
        dst = np.concatenate([lab, lab[ptr], node[ptr]])
        side = np.concatenate(
            [np.ones(len(node), np.int8), np.zeros(2 * int(ptr.sum()), np.int8)]
        )
        return pa.table(
            {
                "k": pa.array(src, pa.int64()),
                "v": pa.array(dst, pa.int64()),
                "side": pa.array(side, pa.int8()),
                "bucket": pa.array((src % n_buckets).astype(np.int32), pa.int32()),
            },
            schema=_CC_EDGE_SCHEMA,
        )

    def join_group(g: pd.DataFrame) -> pa.Table:
        # side=1 rows are (node=k, label=v); side=0 rows are edges (src=k,
        # dst=v).  Send label[src] to every dst, vectorized via map.
        lab = g[g["side"] == 1]
        edges = g[g["side"] == 0]
        lookup = pd.Series(lab["v"].to_numpy(), index=lab["k"].to_numpy())
        cand = edges["k"].map(lookup)
        node = edges["v"].to_numpy()
        # labels themselves also survive as messages (node keeps its label)
        node_all = np.concatenate([node, lab["k"].to_numpy()])
        cand_all = np.concatenate([cand.to_numpy(), lab["v"].to_numpy()])
        return pa.table(
            {"node": pa.array(node_all, pa.int64()),
             "cand": pa.array(cand_all, pa.int64()),
             "bucket": pa.array((node_all % n_buckets).astype(np.int32), pa.int32())},
            schema=_CC_MSG_SCHEMA,
        )

    from ray.data.aggregate import Sum

    prev_sum = None
    for _ in range(max_rounds):
        round_rows = base_edges.union(
            labels.map_batches(label_rows, batch_format="pyarrow")
        )
        labels = (
            round_rows.groupby("bucket")
            .map_groups(join_group, batch_format="pandas")
            .groupby("bucket")
            .map_groups(min_per_node, batch_format="pandas")
            .materialize()
        )
        cur = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if prev_sum is not None and cur == prev_sum:
            break
        prev_sum = cur
    else:
        raise RuntimeError("connected_components_ds: no fixpoint in max_rounds")
    return labels


def assign_labels_ds(ids_ds, labels_ds, id_col: str,
                     out_col: str = "canonical_id", n_buckets: int = 64):
    """Streaming canonical assign: ids LEFT JOIN (node, label) with identity
    fallback, as ONE coarse-bucket shuffle — Dataset in, Dataset out.

    Replaces the round-3 driver-held broadcast dict (VERDICT r3 "what's
    wrong" #1): the label set is bounded by the PAIRED-node count, and
    boilerplate-heavy web corpora run 30-50% near-dup, so at 100 TB that
    dict rivals the corpus and must never be collected on one process.
    Here labels and ids both key by ``value % n_buckets`` and each bucket
    group does a vectorized map with identity fallback.
    """

    def id_rows(t: pa.Table) -> pa.Table:
        v = t[id_col].to_numpy()
        return pa.table(
            {"k": pa.array(v, pa.int64()),
             "v": pa.array(v, pa.int64()),
             "side": pa.array(np.ones(len(v), np.int8), pa.int8()),
             "bucket": pa.array((v % n_buckets).astype(np.int32), pa.int32())},
            schema=_CC_EDGE_SCHEMA,
        )

    def label_rows(t: pa.Table) -> pa.Table:
        k = t["node"].to_numpy()
        return pa.table(
            {"k": pa.array(k, pa.int64()),
             "v": pa.array(t["label"].to_numpy(), pa.int64()),
             "side": pa.array(np.zeros(len(k), np.int8), pa.int8()),
             "bucket": pa.array((k % n_buckets).astype(np.int32), pa.int32())},
            schema=_CC_EDGE_SCHEMA,
        )

    def merge_group(g: pd.DataFrame) -> pa.Table:
        lab = g[g["side"] == 0]
        ids = g.loc[g["side"] == 1, "k"].to_numpy()
        lookup = pd.Series(lab["v"].to_numpy(), index=lab["k"].to_numpy())
        mapped = pd.Series(ids).map(lookup)
        canon = mapped.fillna(pd.Series(ids)).astype(np.int64).to_numpy()
        return pa.table(
            {id_col: pa.array(ids, pa.int64()),
             out_col: pa.array(canon, pa.int64())}
        )

    rows = ids_ds.map_batches(id_rows, batch_format="pyarrow").union(
        labels_ds.map_batches(label_rows, batch_format="pyarrow")
    )
    return rows.groupby("bucket").map_groups(merge_group, batch_format="pandas")


_LABELS_CACHE: dict = {}


def _minhash_labels_ds(sf_dir: str, threshold: float = 0.5):
    """Session-scoped cache of the CC label Dataset (materialized, so the
    blocks pin in the object store): the canonical / cluster-stats /
    keep-best queries all consume the same labels, and re-running LSH+CC
    three times per session is pure waste.  Keyed on the documents file's
    identity (path, mtime, size) + threshold so a rewritten corpus
    invalidates."""
    p = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(p)
    key = (os.path.abspath(p), st.st_mtime_ns, st.st_size, threshold)
    if key not in _LABELS_CACHE:
        _LABELS_CACHE[key] = connected_components_ds(
            _minhash_pairs_ds(sf_dir, threshold)
        ).materialize()
    return _LABELS_CACHE[key]


def near_dedup_canonical(sf_dir: str, threshold: float = 0.5) -> pd.DataFrame:
    """doc_id -> canonical_id under TRANSITIVE near-duplication.

    The training-data dedup composition: MinHash+LSH near-dup pairs (which
    subsume exact duplicates — Jaccard 1.0) feed DISTRIBUTED min-label
    connected components (``connected_components_ds``); each component's
    canonical is its min doc_id; docs in no pair map to themselves.

    Scale shape: pairs stream straight from the verify stage into the CC
    iteration without touching the driver; per-round CC state lives in the
    object store; the final assign is a bucketed label join
    (``assign_labels_ds``) — labels are never collected driver-side.
    """
    out = near_dedup_canonical_ds(sf_dir, threshold).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def near_dedup_canonical_ds(sf_dir: str, threshold: float = 0.5):
    """Dataset variant of :func:`near_dedup_canonical` — the bucketed label
    assign's output stream, never collected; the curate composition and the
    pandas wrapper both consume this."""
    labels = _minhash_labels_ds(sf_dir, threshold)
    return assign_labels_ds(_docs(sf_dir, ["doc_id"]), labels, "doc_id")


def near_dup_rate_by_source(sf_dir: str, threshold: float = 0.5) -> pd.DataFrame:
    """(source, n_docs, n_near_dups) — the near-duplication rate per
    PROVENANCE: how much of each source's volume is a transitive MinHash
    near-duplicate of something else (canonical_id != doc_id).  The
    contamination dashboard a corpus acquisition team reads before
    renegotiating a source's weight (dedup x provenance, the composition
    source_quality_stats runs for the full curate verdict).

    Scale shape: the canonical-label stream (near_dedup_canonical_ds —
    never collected) and the narrow (doc_id, source) projection meet in
    ONE doc_id-bucket all-to-all; each group joins vectorized and emits
    per-source count partials bounded by |sources|; the driver folds
    |sources| x |buckets| rows.
    """
    labels = near_dedup_canonical_ds(sf_dir, threshold)
    src = _docs(sf_dir, ["doc_id", "source"])
    N_BUCKETS = 64

    _R = pa.schema([("doc_id", pa.int64()), ("canonical_id", pa.int64()),
                    ("source", pa.string()), ("is_label", pa.int8()),
                    ("bucket", pa.int32())])

    def label_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {"doc_id": t["doc_id"], "canonical_id": t["canonical_id"],
             "source": pa.array([""] * len(ids), pa.string()),
             "is_label": pa.array(np.ones(len(ids), np.int8), pa.int8()),
             "bucket": pa.array((ids % N_BUCKETS).astype(np.int32),
                                pa.int32())}, schema=_R)

    def src_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {"doc_id": t["doc_id"],
             "canonical_id": pa.array(np.zeros(len(ids), np.int64), pa.int64()),
             "source": t["source"],
             "is_label": pa.array(np.zeros(len(ids), np.int8), pa.int8()),
             "bucket": pa.array((ids % N_BUCKETS).astype(np.int32),
                                pa.int32())}, schema=_R)

    _S = pa.schema([("source", pa.string()), ("n_docs", pa.int64()),
                    ("n_near_dups", pa.int64())])

    def count_group(g: pd.DataFrame) -> pa.Table:
        lab = (g[g["is_label"] == 1].drop_duplicates("doc_id")
               .set_index("doc_id")["canonical_id"])
        s = g[g["is_label"] == 0]
        canon = lab.reindex(s["doc_id"]).to_numpy()
        dup = (canon != s["doc_id"].to_numpy()).astype(np.int64)
        out = (pd.DataFrame({"source": s["source"].to_numpy(), "dup": dup})
               .groupby("source", as_index=False)
               .agg(n_docs=("dup", "size"), n_near_dups=("dup", "sum")))
        return pa.Table.from_pandas(out, schema=_S, preserve_index=False
                                    ).replace_schema_metadata(None)

    parts = (labels.map_batches(label_rows, batch_format="pyarrow")
             .union(src.map_batches(src_rows, batch_format="pyarrow"))
             .groupby("bucket").map_groups(count_group, batch_format="pandas")
             .to_pandas())
    out = (parts.groupby("source", as_index=False)[
        ["n_docs", "n_near_dups"]].sum().sort_values("source"))
    return (out.reset_index(drop=True)
            .astype({"n_docs": "int64", "n_near_dups": "int64"}))


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard pairs (the prompt's dedup family, standalone + oracle)
# ---------------------------------------------------------------------------


def _distinct_shingle_rows(t: pa.Table, k: int, n_buckets: int) -> pa.Table:
    """Batch-vectorized distinct-shingle explode shared by the inverted-index
    overlap family and PPJoin: (doc_id, sh, n, bucket=sh % n_buckets) rows,
    one per DISTINCT 61-bit k-gram shingle hash per doc, each carrying the
    doc's distinct-shingle count ``n`` (factorized token hashing, k strided
    XOR passes with doc-boundary masking, lexsort dedup — the shared
    ``_shingles`` md5/splitmix ring, no short-doc branch)."""
    ids = t["doc_id"].to_numpy()
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "sh": pa.array([], pa.int64()),
         "n": pa.array([], pa.int64()), "bucket": pa.array([], pa.int32())}
    )
    if len(ids) == 0:
        return empty
    toks_per_doc = [s.lower().split() for s in t["text"].to_pylist()]
    lens = np.array([len(x) for x in toks_per_doc], dtype=np.int64)
    if int(lens.sum()) == 0:
        return empty
    flat = [w for toks in toks_per_doc for w in toks]
    codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    uh = np.fromiter(
        (_token_hash(w) for w in uniques), dtype=np.uint64, count=len(uniques)
    )
    th = uh[codes]
    n_starts = len(th) - k + 1
    if n_starts <= 0:
        return empty
    g_full = np.zeros(n_starts, dtype=np.uint64)
    for j in range(k):
        g_full ^= th[j : j + n_starts] * _POS_MULT[j]
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    offs = np.concatenate([[0], np.cumsum(lens)])[:-1]
    s_pos = np.arange(len(th), dtype=np.int64) - offs[doc_idx]
    valid = (s_pos <= np.repeat(lens, lens) - k)[:n_starts]
    g = _mix64(g_full[valid]) & np.uint64((1 << 61) - 1)
    didx = doc_idx[:n_starts][valid]
    # per-doc distinct: lexsort + adjacent-diff mask (vectorized set())
    order = np.lexsort((g, didx))
    g_s, d_s = g[order], didx[order]
    keep = np.ones(len(g_s), dtype=bool)
    keep[1:] = (g_s[1:] != g_s[:-1]) | (d_s[1:] != d_s[:-1])
    g_u, d_u = g_s[keep], d_s[keep]
    n_per_doc = np.bincount(d_u, minlength=len(lens)).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(ids[d_u], pa.int64()),
            "sh": pa.array(g_u.astype(np.int64), pa.int64()),
            "n": pa.array(n_per_doc[d_u], pa.int64()),
            "bucket": pa.array(
                (g_u % np.uint64(n_buckets)).astype(np.int32), pa.int32()
            ),
        }
    )


def _ngram_overlap_pairs(sf_dir: str, k: int, threshold_num: int,
                         threshold_den: int, mode: str) -> pd.DataFrame:
    """EXACT token-k-gram Jaccard near-dup pairs via a distributed inverted
    index (no sketching): pairs (doc_a < doc_b) whose distinct-shingle sets
    satisfy ``|A∩B| / |A∪B| >= threshold_num/threshold_den``.

    Shape (the PPJoin-lite inverted-index idiom):

    1. map_batches: doc -> DISTINCT 61-bit k-gram shingle HASHES (the shared
       ``_shingles`` md5/splitmix ring, batch-vectorized: factorize the
       batch's tokens, hash only the distincts, k strided XOR passes over the
       flat token-hash array with doc-boundary masking, lexsort dedup) —
       int64 rows through the exchange instead of k-word strings; every row
       carries the doc's distinct-shingle count ``n`` so pair sizes need no
       second join.
    2. shuffle shingle rows into 64 coarse buckets by shingle hash; within a
       bucket a vectorized self-merge on the shingle emits per-shingle pair
       PARTIALS (doc_a, doc_b, n_a, n_b, c) — combined per bucket before the
       second shuffle.
    3. shuffle partials by pair hash; sum c per pair and keep pairs with
       ``(den+num)*c >= num*(n_a+n_b)`` (integer cross-multiplication of
       c/(n_a+n_b-c) >= num/den — float-free outputs for the oracle hash).

    Exact at 61-bit hash equality (no LSH recall loss; the same stance as
    ``dup_ngram_spans``), DuckDB-oracle-checked via the generated
    ``oracles.ngram_overlap_pairs_sql`` which reproduces the engine hash
    ring in SQL; the cost model is sum(f^2) over shingle document
    frequencies f — boilerplate-heavy corpora need the MinHash path instead
    (this op is the exactness baseline the sketch is judged against).  Docs
    with fewer than k tokens emit no shingles (mirrored in the oracle, which
    omits the short-doc branch of the minhash shingle CTEs).
    """
    ds = _docs(sf_dir, ["doc_id", "text"])
    N_SHUFFLE_BUCKETS = 64

    def shingle_rows(t: pa.Table) -> pa.Table:
        return _distinct_shingle_rows(t, k, N_SHUFFLE_BUCKETS)

    PAIR_PARTIAL_SCHEMA = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()),
         ("n_a", pa.int64()), ("n_b", pa.int64()),
         ("c", pa.int64()), ("pbucket", pa.int32())]
    )

    def bucket_pair_partials(g: pd.DataFrame) -> pa.Table:
        g = g[g.groupby("sh")["sh"].transform("size") >= 2]
        if len(g) == 0:
            return PAIR_PARTIAL_SCHEMA.empty_table()
        m = g.merge(g, on="sh", suffixes=("_x", "_y"))
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        c = (
            m.groupby(["doc_id_x", "doc_id_y", "n_x", "n_y"], sort=False)
            .size().reset_index(name="c")
        )
        a = c["doc_id_x"].to_numpy()
        b = c["doc_id_y"].to_numpy()
        pb = ((a * np.int64(1_000_003) + b) % N_SHUFFLE_BUCKETS).astype(np.int32)
        return pa.table(
            {"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64()),
             "n_a": pa.array(c["n_x"].to_numpy(), pa.int64()),
             "n_b": pa.array(c["n_y"].to_numpy(), pa.int64()),
             "c": pa.array(c["c"].to_numpy(), pa.int64()),
             "pbucket": pa.array(pb, pa.int32())},
            schema=PAIR_PARTIAL_SCHEMA,
        )

    OUT_SCHEMA = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()),
         ("n_common", pa.int64()), ("n_a", pa.int64()), ("n_b", pa.int64())]
    )

    def sum_and_filter(g: pd.DataFrame) -> pa.Table:
        s = (
            g.groupby(["doc_a", "doc_b", "n_a", "n_b"], sort=False)["c"]
            .sum().reset_index()
        )
        if mode == "containment":
            # c / min(n_a, n_b) >= num/den, integer cross-multiplied
            keep = threshold_den * s["c"] >= threshold_num * np.minimum(
                s["n_a"], s["n_b"]
            )
        else:
            keep = (threshold_den + threshold_num) * s["c"] >= threshold_num * (
                s["n_a"] + s["n_b"]
            )
        s = s[keep]
        return pa.table(
            {"doc_a": pa.array(s["doc_a"].to_numpy(), pa.int64()),
             "doc_b": pa.array(s["doc_b"].to_numpy(), pa.int64()),
             "n_common": pa.array(s["c"].to_numpy(), pa.int64()),
             "n_a": pa.array(s["n_a"].to_numpy(), pa.int64()),
             "n_b": pa.array(s["n_b"].to_numpy(), pa.int64())},
            schema=OUT_SCHEMA,
        )

    out = (
        ds.map_batches(shingle_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pair_partials, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(sum_and_filter, batch_format="pandas")
        .to_pandas()
    )
    if "doc_a" not in out.columns:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("doc_a", "doc_b", "n_common", "n_a", "n_b")}
        )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def ngram_jaccard_pairs(sf_dir: str, k: int = 3,
                        threshold_num: int = 1, threshold_den: int = 2) -> pd.DataFrame:
    """EXACT token-k-gram Jaccard near-dup pairs via a distributed inverted
    index (no sketching): pairs (doc_a < doc_b) whose distinct-shingle sets
    satisfy ``|A∩B| / |A∪B| >= threshold_num/threshold_den``.

    Shape, cost model and oracle strategy: see ``_ngram_overlap_pairs``
    (shared distributed inverted-index pipeline over the engine's 61-bit
    shingle hashes; integer cross-multiplied keep rule).
    """
    return _ngram_overlap_pairs(sf_dir, k, threshold_num, threshold_den,
                                "jaccard")


def ngram_containment_pairs(sf_dir: str, k: int = 3,
                            threshold_num: int = 4,
                            threshold_den: int = 5) -> pd.DataFrame:
    """EXACT k-gram CONTAINMENT near-dup pairs: (doc_a < doc_b) where the
    smaller distinct-shingle set is >= num/den contained in the other —
    ``|A∩B| / min(|A|, |B|) >= threshold_num/threshold_den``.

    The asymmetric complement of ``ngram_jaccard_pairs`` (same distributed
    inverted-index pipeline, different integer cross-multiplied keep rule):
    Jaccard misses quote-style duplication where a short doc is swallowed
    whole by a much longer one (the union term drowns the overlap);
    containment is the standard detector for it (Broder's "containment" in
    the resemblance/containment pair).  Cost model and partitioning
    identical to the Jaccard op.
    """
    return _ngram_overlap_pairs(sf_dir, k, threshold_num, threshold_den,
                                "containment")


# ---------------------------------------------------------------------------
# PPJoin: prefix-filtered exact set-similarity join (Xiao et al. 2008)
# ---------------------------------------------------------------------------


def _ppjoin_candidates_ds(sf_dir: str, k: int, threshold_num: int,
                          threshold_den: int):
    """Candidate (doc_a < doc_b) pairs from PREFIX FILTERING (the AllPairs/
    PPJoin principle, Xiao et al. 2008 "Efficient Similarity Joins for
    Near Duplicate Detection"): order every doc's distinct shingles by
    (document frequency asc, hash asc) — one consistent global order — and
    index only each doc's first ``p = n - ceil(t*n) + 1`` shingles.  Any
    pair with Jaccard >= t = num/den shares >= ceil(t*n) shingles, and at
    most ``n - p = ceil(t*n) - 1`` of a doc's shingles lie outside its
    prefix, so every qualifying pair collides on some prefix shingle (no
    false negatives); a df-1 shingle may occupy a prefix slot but generates
    no candidates, which the theorem tolerates.  The length filter
    ``den*n_min >= num*n_max`` prunes further.

    Scale shape — three narrow all-to-alls over int64 rows (text never
    moves), versus the plain inverted index's sum(f^2) pair explosion over
    EVERY shingle:

    1. shingle-bucket exchange: per-shingle document frequency resolves
       in-group (rows are distinct (doc, sh), so df = group size) and rides
       each surviving (df >= 2) row; df-1 rows die here and only their
       per-doc COUNT ``m`` is reconstructed from the carried ``n``.
    2. doc-bucket exchange: each doc sorts its surviving shingles by
       (df, sh) vectorized (lexsort + cumcount) and keeps ranks
       ``< p - m`` (global prefix position = m + rank).
    3. prefix-shingle-bucket exchange: per-shingle np.unique + triu pair
       generation with the integer length filter; prefix shingles are by
       construction the RAREST, so groups stay small.

    Candidates then flow through the shared distributed pair-dedup.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])
    N_SHUFFLE_BUCKETS = 64

    def shingle_rows(t: pa.Table) -> pa.Table:
        return _distinct_shingle_rows(t, k, N_SHUFFLE_BUCKETS)

    _DF_ROW = pa.schema(
        [("doc_id", pa.int64()), ("sh", pa.int64()), ("n", pa.int64()),
         ("df", pa.int64()), ("dbucket", pa.int32())]
    )

    def attach_df(g: pd.DataFrame) -> pa.Table:
        df = g.groupby("sh")["sh"].transform("size")
        g = g[df >= 2]
        df = df[df >= 2]
        d = g["doc_id"].to_numpy()
        return pa.table(
            {"doc_id": pa.array(d, pa.int64()),
             "sh": pa.array(g["sh"].to_numpy(), pa.int64()),
             "n": pa.array(g["n"].to_numpy(), pa.int64()),
             "df": pa.array(df.to_numpy(), pa.int64()),
             "dbucket": pa.array((d % N_SHUFFLE_BUCKETS).astype(np.int32),
                                 pa.int32())},
            schema=_DF_ROW)

    _PREFIX_ROW = pa.schema(
        [("sh", pa.int64()), ("doc_id", pa.int64()), ("n", pa.int64()),
         ("sbucket", pa.int32())]
    )

    def prefix_rows(g: pd.DataFrame) -> pa.Table:
        d = g["doc_id"].to_numpy()
        sh = g["sh"].to_numpy()
        df = g["df"].to_numpy()
        n = g["n"].to_numpy()
        order = np.lexsort((sh, df, d))
        d, sh, df, n = d[order], sh[order], df[order], n[order]
        first = np.concatenate([[True], d[1:] != d[:-1]])
        # rank within doc among surviving (df>=2) shingles, in (df, sh) order
        grp_start = np.flatnonzero(first)
        sizes = np.diff(np.concatenate([grp_start, [len(d)]]))
        rank = np.arange(len(d)) - np.repeat(grp_start, sizes)
        m = n - np.repeat(sizes, sizes)          # per-doc df-1 shingle count
        p = n - (threshold_num * n + threshold_den - 1) // threshold_den + 1
        keep = (m + rank) < p
        sh, d, n = sh[keep], d[keep], n[keep]
        return pa.table(
            {"sh": pa.array(sh, pa.int64()), "doc_id": pa.array(d, pa.int64()),
             "n": pa.array(n, pa.int64()),
             "sbucket": pa.array((sh % N_SHUFFLE_BUCKETS).astype(np.int32),
                                 pa.int32())},
            schema=_PREFIX_ROW)

    def candidate_pairs(g: pd.DataFrame) -> pa.Table:
        g = g[g.groupby("sh")["sh"].transform("size") >= 2]
        out_a, out_b = [], []
        for _, sub in g.groupby("sh", sort=False):
            u = sub.drop_duplicates("doc_id").sort_values("doc_id")
            ids = u["doc_id"].to_numpy()
            ns = u["n"].to_numpy()
            if len(ids) < 2:
                continue
            iu, ju = np.triu_indices(len(ids), k=1)
            na, nb = ns[iu], ns[ju]
            ok = threshold_den * np.minimum(na, nb) >= (
                threshold_num * np.maximum(na, nb))
            out_a.append(ids[iu][ok])
            out_b.append(ids[ju][ok])
        a = np.concatenate(out_a) if out_a else np.zeros(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.zeros(0, np.int64)
        return pa.table({"doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(b, pa.int64())}, schema=_PAIR_SCHEMA)

    cands = (
        ds.map_batches(shingle_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(attach_df, batch_format="pandas")
        .groupby("dbucket")
        .map_groups(prefix_rows, batch_format="pandas")
        .groupby("sbucket")
        .map_groups(candidate_pairs, batch_format="pandas")
    )
    return _pair_dedup_ds(cands)


def ppjoin_pairs(sf_dir: str, k: int = 3, threshold_num: int = 1,
                 threshold_den: int = 2) -> pd.DataFrame:
    """EXACT token-k-gram Jaccard near-dup pairs via PREFIX-FILTERED
    candidate generation (PPJoin) + exact shingle-set verification — the
    same result set as ``ngram_jaccard_pairs`` (it shares that op's
    generated DuckDB oracle) from a candidate set bounded by prefix
    collisions on the corpus's RAREST shingles instead of the inverted
    index's sum(f^2) over all shingles.  Columns: (doc_a, doc_b, n_common,
    n_a, n_b), integer-only.

    Verify reads each candidate chunk's texts from the shared one-time
    ``bucket=K/`` docs copy (the minhash verify idiom), recomputes both
    distinct-shingle sets, and applies the integer cross-multiplied rule
    ``(den+num)*c >= num*(n_a+n_b)``.  Equivalence to the inverted-index
    op is additionally pytest-locked (same pairs at sf0.001, plus a
    planted-near-dup corpus where the prefix filter provably prunes).
    """
    from .io import bucketed_copy, read_bucket_ids

    cands = _ppjoin_candidates_ds(sf_dir, k, threshold_num, threshold_den)
    docs_bucketed = bucketed_copy(
        os.path.join(sf_dir, "documents.parquet"), "doc_id",
        ["doc_id", "text"], N_VERIFY_BUCKETS,
    )

    OUT_SCHEMA = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()),
         ("n_common", pa.int64()), ("n_a", pa.int64()), ("n_b", pa.int64())]
    )

    def verify_chunk(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_pylist()
        b = t["doc_b"].to_pylist()
        if not a:
            return OUT_SCHEMA.empty_table()
        need = sorted(set(a) | set(b))
        tex = read_bucket_ids(
            docs_bucketed, "doc_id", ["doc_id", "text"], need, N_VERIFY_BUCKETS
        )
        texts = dict(zip(tex["doc_id"].to_pylist(), tex["text"].to_pylist()))
        sh = {d: set(np.unique(_gram_hashes_positional(texts[d], k)).tolist())
              for d in need}
        rows = {c: [] for c in ("doc_a", "doc_b", "n_common", "n_a", "n_b")}
        for x, y in zip(a, b):
            c = len(sh[x] & sh[y])
            na, nb = len(sh[x]), len(sh[y])
            if (threshold_den + threshold_num) * c >= threshold_num * (na + nb):
                rows["doc_a"].append(x)
                rows["doc_b"].append(y)
                rows["n_common"].append(c)
                rows["n_a"].append(na)
                rows["n_b"].append(nb)
        return pa.table({c: pa.array(v, pa.int64()) for c, v in rows.items()},
                        schema=OUT_SCHEMA)

    out = cands.map_batches(verify_chunk, batch_format="pyarrow",
                            batch_size=2048).to_pandas()
    if "doc_a" not in out.columns:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("doc_a", "doc_b", "n_common", "n_a", "n_b")}
        )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Duplicated-substring span detection (Lee et al. 2022-style, token level)
# ---------------------------------------------------------------------------


def _gram_hashes_positional(text: str, k: int) -> np.ndarray:
    """61-bit hashes of ALL k-token-gram positions (1-based start positions
    implied by array index) — the _shingles combine WITHOUT the distinct and
    WITHOUT the short-doc special case (docs with n < k emit nothing)."""
    toks = text.lower().split()
    n = len(toks)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    th = np.fromiter((_token_hash(w) for w in toks), dtype=np.uint64, count=n)
    g = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        g ^= th[j : n - k + 1 + j] * _POS_MULT[j]
    return _mix64(g) & np.uint64((1 << 61) - 1)


_SPAN_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("span_start", pa.int64()), ("span_end", pa.int64())]
)


def dup_ngram_spans(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """(doc_id, span_start, span_end) — maximal 1-based token spans covered
    by k-grams occurring >= 2 times ANYWHERE in the corpus (including twice
    in the same doc): the exact-substring-dedup primitive of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"), at token
    granularity, without the suffix array.

    Scale shape (three narrow all-to-alls, text never shuffles):

    1. map_batches: (gram_hash, doc_id, pos) rows for every k-gram position;
       coarse bucket = gram_hash % 64, so every occurrence of a gram lands in
       ONE bucket and per-bucket occurrence counts are global.
    2. groupby(gram bucket): drop grams with < 2 occurrences (vectorized
       transform-size prefilter — at corpus scale almost every gram is
       unique); survivors re-key by doc bucket.
    3. groupby(doc bucket): merge each doc's duplicated [pos, pos+k) windows
       into maximal spans — adjacent-or-overlapping (next_start <= prev_start
       + k) merge — with vectorized gaps-and-islands over a per-bucket sort.

    DuckDB-oracle-checked end to end (engine.oracles.dup_ngram_spans_sql):
    the gram hash is the same md5/splitmix ring as MinHash, and the output
    is integer-only.  doc_id is int64; pos is the 1-based token index.
    """
    out = _dup_spans_ds(sf_dir, k).to_pandas()
    if "doc_id" not in out.columns:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("doc_id", "span_start", "span_end")}
        )
    return out.sort_values(["doc_id", "span_start"]).reset_index(drop=True)


def _dup_spans_ds(sf_dir: str, k: int = 5):
    """The ``dup_ngram_spans`` pipeline as a Dataset of span rows (shared by
    the span-report query and the ``strip_dup_spans`` rewrite)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    N_SHUFFLE_BUCKETS = 64

    def gram_rows(t: pa.Table) -> pa.Table:
        # batch-vectorized gram explode (equivalence to the per-doc
        # _gram_hashes_positional is pytest-locked): hash only the batch's
        # DISTINCT tokens (pd.factorize + per-worker memo), compute every
        # flat window hash in k strided XOR passes, and mask out the windows
        # that cross a doc boundary — no per-doc allocations.
        ids = t["doc_id"].to_numpy()
        toks_per_doc = [s.lower().split() for s in t["text"].to_pylist()]
        lens = np.array([len(x) for x in toks_per_doc], dtype=np.int64)
        empty = pa.table(
            {"gram": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64()),
             "pos": pa.array([], pa.int64()), "bucket": pa.array([], pa.int32())}
        )
        if int(lens.sum()) == 0:
            return empty
        flat = [w for toks in toks_per_doc for w in toks]
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
        uh = np.fromiter(
            (_token_hash(w) for w in uniques), dtype=np.uint64, count=len(uniques)
        )
        th = uh[codes]
        n_starts = len(th) - k + 1
        if n_starts <= 0:
            return empty
        g_full = np.zeros(n_starts, dtype=np.uint64)
        for j in range(k):
            g_full ^= th[j : j + n_starts] * _POS_MULT[j]
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        offs = np.concatenate([[0], np.cumsum(lens)])[:-1]
        s = np.arange(len(th), dtype=np.int64) - offs[doc_idx]
        valid = (s <= np.repeat(lens, lens) - k)[:n_starts]
        g = (_mix64(g_full[valid]) & np.uint64((1 << 61) - 1)).astype(np.int64)
        return pa.table(
            {
                "gram": pa.array(g, pa.int64()),
                "doc_id": pa.array(np.repeat(ids, lens)[:n_starts][valid], pa.int64()),
                "pos": pa.array((s + 1)[:n_starts][valid], pa.int64()),
                "bucket": pa.array((g % N_SHUFFLE_BUCKETS).astype(np.int32), pa.int32()),
            }
        )

    _DUP_POS_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("pos", pa.int64()), ("dbucket", pa.int32())]
    )

    def dup_positions(g: pd.DataFrame) -> pa.Table:
        g = g[g.groupby("gram")["gram"].transform("size") >= 2]
        ids = g["doc_id"].to_numpy()
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "pos": pa.array(g["pos"].to_numpy(), pa.int64()),
             "dbucket": pa.array((ids % N_SHUFFLE_BUCKETS).astype(np.int32), pa.int32())},
            schema=_DUP_POS_SCHEMA,
        )

    def merge_spans(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["doc_id", "pos"])
        ids = g["doc_id"].to_numpy()
        pos = g["pos"].to_numpy()
        brk = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            same_doc = ids[1:] == ids[:-1]
            near = pos[1:] - pos[:-1] <= k
            brk[1:] = (~(same_doc & near)).astype(np.int64)
        isl = np.cumsum(brk)
        df = pd.DataFrame({"doc_id": ids, "pos": pos, "isl": isl})
        s = df.groupby("isl", sort=False).agg(
            doc_id=("doc_id", "first"), span_start=("pos", "min"), span_end=("pos", "max")
        )
        return pa.table(
            {"doc_id": pa.array(s["doc_id"].to_numpy(), pa.int64()),
             "span_start": pa.array(s["span_start"].to_numpy(), pa.int64()),
             "span_end": pa.array(s["span_end"].to_numpy() + (k - 1), pa.int64())},
            schema=_SPAN_SCHEMA,
        )

    # NOTE: Ray's sort-based groupby can produce EMPTY output partitions
    # (duplicate quantile boundaries over the narrow 64-value bucket key);
    # those emit schema-less bundles, which logs Ray's one-per-operator
    # bundle-schema-divergence warning.  Cosmetic and data-dependent —
    # results are unaffected (verified vs the DuckDB oracle either way).
    return (
        ds.map_batches(gram_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(dup_positions, batch_format="pandas")
        .groupby("dbucket")
        .map_groups(merge_spans, batch_format="pandas")
    )


_STRIP_UNION_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("pos", pa.int64()), ("end", pa.int64()),
     ("tok", pa.string()), ("dbucket", pa.int32())]
)

_STRIP_OUT_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("text_clean", pa.string()),
     ("n_removed", pa.int64())]
)


def strip_dup_spans(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """(doc_id, text_clean, n_removed) — each document rewritten with every
    token covered by a duplicated-k-gram span REMOVED: the deletion step of
    Lee et al. 2022 §4 ("we remove one span from each cluster of duplicate
    text"), applied corpus-wide at token granularity on top of
    ``dup_ngram_spans``'s maximal spans.

    Scale shape: the span pipeline's three narrow all-to-alls plus ONE
    all-to-all of the token rows — a Dataset ``union`` of (doc_id, pos, tok)
    rows with the span rows, co-located by doc bucket so a single group fn
    marks covered positions (vectorized ``merge_asof`` against the disjoint,
    maximal spans) and reassembles the kept tokens in position order.  Text
    tokens shuffle exactly once; a per-doc marker row keeps token-less and
    fully-stripped documents in the output.  DuckDB-oracle-checked
    (engine.oracles.strip_dup_spans_sql); n_removed is the count of removed
    token positions.
    """
    N_SHUFFLE_BUCKETS = 64

    def span_to_union(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {"doc_id": t["doc_id"],
             "pos": t["span_start"],
             "end": t["span_end"],
             "tok": pa.nulls(t.num_rows, pa.string()),
             "dbucket": pa.array(
                 (ids % N_SHUFFLE_BUCKETS).astype(np.int32), pa.int32())},
            schema=_STRIP_UNION_SCHEMA,
        )

    def token_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        toks_per_doc = [s.split() for s in t["text"].to_pylist()]
        lens = np.array([len(x) for x in toks_per_doc], dtype=np.int64)
        total = int(lens.sum())
        flat = [w for ts in toks_per_doc for w in ts]
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        offs = np.concatenate([np.zeros(1, np.int64), np.cumsum(lens)])[:-1]
        pos = np.arange(total, dtype=np.int64) - offs[doc_idx] + 1
        doc_rep = np.repeat(ids, lens)
        tok_t = pa.table(
            {"doc_id": pa.array(doc_rep, pa.int64()),
             "pos": pa.array(pos, pa.int64()),
             "end": pa.array(np.full(total, -1, np.int64), pa.int64()),
             "tok": pa.array(flat, pa.string()),
             "dbucket": pa.array(
                 (doc_rep % N_SHUFFLE_BUCKETS).astype(np.int32), pa.int32())},
            schema=_STRIP_UNION_SCHEMA,
        )
        # marker row per doc: keeps token-less / fully-stripped docs present
        mark_t = pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "pos": pa.array(np.zeros(len(ids), np.int64), pa.int64()),
             "end": pa.array(np.full(len(ids), -2, np.int64), pa.int64()),
             "tok": pa.nulls(len(ids), pa.string()),
             "dbucket": pa.array(
                 (ids % N_SHUFFLE_BUCKETS).astype(np.int32), pa.int32())},
            schema=_STRIP_UNION_SCHEMA,
        )
        return pa.concat_tables([tok_t, mark_t])

    def rebuild(g: pd.DataFrame) -> pa.Table:
        end = g["end"].to_numpy()
        toks = g[end == -1].sort_values("pos", kind="mergesort")
        spans = g[end >= 0]
        all_ids = np.unique(g.loc[end == -2, "doc_id"].to_numpy())
        if len(spans) and len(toks):
            sp = spans[["doc_id", "pos", "end"]].rename(
                columns={"pos": "sstart"}).sort_values("sstart", kind="mergesort")
            m = pd.merge_asof(
                toks[["doc_id", "pos"]], sp,
                left_on="pos", right_on="sstart", by="doc_id",
                direction="backward",
            )
            covered = (m["end"].notna() & (m["pos"] <= m["end"])).to_numpy()
        else:
            covered = np.zeros(len(toks), dtype=bool)
        kept = toks[~covered].sort_values(["doc_id", "pos"], kind="mergesort")
        txt = kept.groupby("doc_id", sort=False)["tok"].agg(" ".join)
        rem = (
            toks.assign(c=covered.astype(np.int64))
            .groupby("doc_id", sort=False)["c"].sum()
        )
        out = pd.DataFrame({"doc_id": all_ids})
        out["text_clean"] = out["doc_id"].map(txt).fillna("")
        out["n_removed"] = out["doc_id"].map(rem).fillna(0).astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
             "text_clean": pa.array(out["text_clean"], pa.string()),
             "n_removed": pa.array(out["n_removed"].to_numpy(), pa.int64())},
            schema=_STRIP_OUT_SCHEMA,
        )

    spans_union = _dup_spans_ds(sf_dir, k).map_batches(
        span_to_union, batch_format="pyarrow"
    )
    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(token_rows, batch_format="pyarrow")
        .union(spans_union)
        .groupby("dbucket")
        .map_groups(rebuild, batch_format="pandas")
        .to_pandas()
    )
    if "doc_id" not in out.columns:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "text_clean": pd.Series([], dtype="object"),
            "n_removed": pd.Series([], dtype="int64"),
        })
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Benchmark decontamination + dedup-policy compositions
# ---------------------------------------------------------------------------

N_EVAL_DOCS = 20  # the deterministic "benchmark" slice: doc_id < N_EVAL_DOCS


def decontaminate_ngrams(sf_dir: str, k: int = 8,
                         n_eval: int = N_EVAL_DOCS) -> pd.DataFrame:
    """Benchmark decontamination (the GPT-3 appendix-C / Gopher-style n-gram
    overlap filter): flag every training document sharing ANY distinct
    k-token-gram with the eval set (here: the docs with doc_id < n_eval).

    Scale shape: the eval side is tiny by definition, so its distinct gram
    hashes collect once and broadcast (``ray.put`` of a SORTED uint64
    array); the corpus side is one map_batches with a vectorized
    searchsorted membership test per doc — NO shuffle at all.  This is the
    canonical broadcast-small-side pattern: at 100 TB the train side streams
    and only the benchmark grams (a few MB) ever move twice.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    def eval_grams(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.less(t["doc_id"], pa.scalar(n_eval, pa.int64())))
        gs = [_shingles(x, k) for x in sub["text"].to_pylist()]
        u = (np.unique(np.concatenate(gs)) if gs else np.empty(0, np.uint64))
        return pa.table({"s": pa.array(u, pa.uint64())})

    ev = ds.map_batches(eval_grams, batch_format="pyarrow").to_pandas()
    eval_arr = np.unique(ev["s"].to_numpy().astype(np.uint64)) if len(ev) else np.empty(0, np.uint64)
    ref = ray.put(eval_arr)  # sorted by construction (np.unique)

    def flag(t: pa.Table) -> pa.Table:
        grams = ray.get(ref)
        sub = t.filter(pc.greater_equal(t["doc_id"], pa.scalar(n_eval, pa.int64())))
        ids = sub["doc_id"].to_numpy()
        hit = np.zeros(len(ids), bool)
        if len(grams):
            for i, x in enumerate(sub["text"].to_pylist()):
                g = _shingles(x, k)
                if len(g):
                    pos = np.searchsorted(grams, g).clip(max=len(grams) - 1)
                    hit[i] = bool((grams[pos] == g).any())
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "contaminated": pa.array(hit, pa.bool_())})

    out = ds.map_batches(flag, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def near_dedup_cluster_stats(sf_dir: str, threshold: float = 0.5) -> pd.DataFrame:
    """Cluster-size histogram of the transitive near-dup components:
    (cluster_size, n_clusters, n_docs) — the dedup-rate report every corpus
    curation run ends with.  Fully distributed: canonical assign is the
    bucketed label join, per-canonical sizes one groupby, and the histogram
    itself a value-counts partial + tiny groupby (the driver sees only
    |distinct sizes| rows)."""
    labels = _minhash_labels_ds(sf_dir, threshold)
    assigned = assign_labels_ds(_docs(sf_dir, ["doc_id"]), labels, "doc_id")
    sizes = assigned.groupby("canonical_id").count()

    def hist_partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t["count()"])
        return pa.table(
            {"cluster_size": vc.field("values").cast(pa.int64()),
             "n_clusters": pc.cast(vc.field("counts"), pa.int64())}
        )

    from ray.data.aggregate import Sum

    out = (
        sizes.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("cluster_size")
        .aggregate(Sum("n_clusters", alias_name="n_clusters"))
        .to_pandas()
    )
    out["n_docs"] = out["cluster_size"] * out["n_clusters"]
    return out.sort_values("cluster_size").reset_index(drop=True)


_KEEP_SCHEMA = pa.schema(
    [("k", pa.int64()), ("v", pa.int64()), ("side", pa.int8()),
     ("bucket", pa.int32())]
)


def dedup_keep_best(sf_dir: str, threshold: float = 0.5,
                    n_buckets: int = 64) -> pd.DataFrame:
    """Per near-dup cluster keep the BEST document — max whitespace-token
    count, ties to the smaller doc_id (the keep-longest policy of web-corpus
    curation, cf. RefinedWeb/C4): (canonical_id, keep_doc_id, cluster_size).

    Two coarse-bucket shuffles after CC: token counts join canonical labels
    on doc_id, then per-canonical argmax inside a canonical-keyed bucket —
    text never shuffles (counts do)."""
    labels = _minhash_labels_ds(sf_dir, threshold)
    assigned = assign_labels_ds(_docs(sf_dir, ["doc_id"]), labels, "doc_id")

    def tok_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        n = np.fromiter(
            (len(x.split()) for x in t["text"].to_pylist()), np.int64, len(ids)
        )
        return pa.table(
            {"k": pa.array(ids, pa.int64()), "v": pa.array(n, pa.int64()),
             "side": pa.array(np.zeros(len(ids), np.int8), pa.int8()),
             "bucket": pa.array((ids % n_buckets).astype(np.int32), pa.int32())},
            schema=_KEEP_SCHEMA,
        )

    def asg_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {"k": pa.array(ids, pa.int64()),
             "v": pa.array(t["canonical_id"].to_numpy(), pa.int64()),
             "side": pa.array(np.ones(len(ids), np.int8), pa.int8()),
             "bucket": pa.array((ids % n_buckets).astype(np.int32), pa.int32())},
            schema=_KEEP_SCHEMA,
        )

    def join_group(g: pd.DataFrame) -> pa.Table:
        tok = g[g["side"] == 0]
        asg = g[g["side"] == 1]
        m = asg[["k", "v"]].merge(tok[["k", "v"]], on="k", suffixes=("_c", "_n"))
        canon = m["v_c"].to_numpy()
        return pa.table(
            {"canonical_id": pa.array(canon, pa.int64()),
             "doc_id": pa.array(m["k"].to_numpy(), pa.int64()),
             "n_tokens": pa.array(m["v_n"].to_numpy(), pa.int64()),
             "bucket": pa.array((canon % n_buckets).astype(np.int32), pa.int32())},
        )

    def best_group(g: pd.DataFrame) -> pa.Table:
        s = g.sort_values(["canonical_id", "n_tokens", "doc_id"],
                          ascending=[True, False, True])
        first = s.groupby("canonical_id", as_index=False).first()
        sz = g.groupby("canonical_id", as_index=False).size()
        m = first.merge(sz, on="canonical_id")
        return pa.table(
            {"canonical_id": pa.array(m["canonical_id"].to_numpy(), pa.int64()),
             "keep_doc_id": pa.array(m["doc_id"].to_numpy(), pa.int64()),
             "cluster_size": pa.array(m["size"].to_numpy(), pa.int64())}
        )

    joined = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(tok_rows, batch_format="pyarrow")
        .union(assigned.map_batches(asg_rows, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(join_group, batch_format="pandas")
    )
    out = (
        joined.groupby("bucket")
        .map_groups(best_group, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("canonical_id").reset_index(drop=True)


def eval_affinity_counts(sf_dir: str, k: int = 8,
                         n_eval: int = N_EVAL_DOCS) -> pd.DataFrame:
    """DSIR-flavored data-selection signal: per train doc, how many of its
    DISTINCT k-token-grams appear in the eval slice's gram set —
    (doc_id, n_grams, n_eval_hits); n_eval_hits/n_grams is the importance
    score (integers keep the oracle value-hash float-free, the
    quality_score convention).  Same broadcast-small-side, shuffle-free
    shape as ``decontaminate_ngrams``."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def eval_grams(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.less(t["doc_id"], pa.scalar(n_eval, pa.int64())))
        gs = [_shingles(x, k) for x in sub["text"].to_pylist()]
        u = (np.unique(np.concatenate(gs)) if gs else np.empty(0, np.uint64))
        return pa.table({"s": pa.array(u, pa.uint64())})

    ev = ds.map_batches(eval_grams, batch_format="pyarrow").to_pandas()
    eval_arr = (np.unique(ev["s"].to_numpy().astype(np.uint64))
                if len(ev) else np.empty(0, np.uint64))
    ref = ray.put(eval_arr)

    def count_hits(t: pa.Table) -> pa.Table:
        grams = ray.get(ref)
        sub = t.filter(pc.greater_equal(t["doc_id"], pa.scalar(n_eval, pa.int64())))
        ids = sub["doc_id"].to_numpy()
        n_g = np.zeros(len(ids), np.int64)
        n_h = np.zeros(len(ids), np.int64)
        for i, x in enumerate(sub["text"].to_pylist()):
            g = _shingles(x, k)
            n_g[i] = len(g)
            if len(g) and len(grams):
                pos = np.searchsorted(grams, g).clip(max=len(grams) - 1)
                n_h[i] = int((grams[pos] == g).sum())
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_grams": pa.array(n_g, pa.int64()),
                         "n_eval_hits": pa.array(n_h, pa.int64())})

    out = ds.map_batches(count_hits, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


N_BASE_DOCS = 400  # incremental dedup: doc_id < N_BASE_DOCS is the "corpus",
# the rest is the incoming batch (deterministic split for the driver check)


def incremental_exact_dedup(sf_dir: str, n_base: int = N_BASE_DOCS,
                            n_buckets: int = 64) -> pd.DataFrame:
    """Incremental-ingest dedup: canonicalize a NEW batch of documents
    against an EXISTING corpus (the production shape: the base is 100 TB
    and immutable, only the day's batch needs assignments).

    For each new doc (doc_id >= n_base): canonical_id = the min doc_id of
    any byte-identical text in base ∪ batch, else itself.  One content-hash
    bucket shuffle carrying only (doc_id, text_hash, side) — the text never
    moves, the base is never collected, and the output is |batch| rows.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    _INC_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("text_hash", pa.int64()),
         ("side", pa.int8()), ("bucket", pa.int32())]
    )

    def add_hash(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        hashes = np.fromiter(
            (_text_hash64(s) for s in t["text"].to_pylist()), np.int64, len(ids)
        )
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "text_hash": pa.array(hashes, pa.int64()),
             "side": pa.array((ids >= n_base).astype(np.int8), pa.int8()),
             "bucket": pa.array((hashes % n_buckets).astype(np.int32), pa.int32())},
            schema=_INC_SCHEMA,
        )

    def assign_group(g: pd.DataFrame) -> pa.Table:
        # min doc_id per hash over base ∪ batch; emit only batch rows
        canon = g.groupby("text_hash")["doc_id"].transform("min")
        new = g["side"] == 1
        return pa.table(
            {"doc_id": pa.array(g.loc[new, "doc_id"].to_numpy(), pa.int64()),
             "canonical_id": pa.array(
                 np.minimum(canon[new].to_numpy(), g.loc[new, "doc_id"].to_numpy()),
                 pa.int64())}
        )

    out = (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(assign_group, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def incremental_minhash_dedup(sf_dir: str, threshold: float = 0.5,
                              n_base: int = N_BASE_DOCS) -> pd.DataFrame:
    """Incremental-ingest NEAR-dedup: canonicalize a NEW batch of documents
    (doc_id >= n_base) against an immutable base corpus under transitive
    MinHash near-duplication, considering only edges that TOUCH the batch —
    base×base pairs are skipped (the base is already deduped; at production
    scale its band keys would be a stored index, and the only shuffle is the
    batch's band rows against it).

    canonical_id = min node id reachable from the new doc through
    batch-touching verified pairs (so a new doc matching an existing base
    doc inherits the BASE id; a cluster of mutually-near new docs collapses
    to its min new id).  Output is |batch| rows.  DuckDB-oracle-checked
    (engine.oracles.incremental_minhash_dedup_sql: the same verified-pair
    CTEs + an edge-filtered recursive closure).
    """
    pairs = _minhash_pairs_ds(sf_dir, threshold).map_batches(
        # pair orientation is doc_a < doc_b, so "touches the batch" is
        # exactly doc_b >= n_base
        lambda t: t.filter(pc.greater_equal(t["doc_b"], n_base)),
        batch_format="pyarrow",
    )
    labels = connected_components_ds(pairs)
    new_ids = _docs(sf_dir, ["doc_id"]).map_batches(
        lambda t: t.filter(pc.greater_equal(t["doc_id"], n_base)),
        batch_format="pyarrow",
    )
    out = assign_labels_ds(new_ids, labels, "doc_id").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# C4-style corpus-wide duplicate-line removal (Raffel et al. 2020 §2.2)
# ---------------------------------------------------------------------------

_C4_UNION_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("seg_no", pa.int64()),
     ("text", pa.string()), ("dbucket", pa.int32())]
)

_C4_OUT_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("text_clean", pa.string()),
     ("n_lines_removed", pa.int64())]
)

# odd positional multipliers for in-segment token positions (segments are
# longer than the 8-slot _POS_MULT gram ring, so derive a 64-slot ring from
# the same splitmix finalizer; odd => invertible mod 2^64)
_SEG_MULTS = _mix64(
    np.arange(64, dtype=np.uint64) + np.uint64(0xC4C4C4C4C4C4C4C4)
) | np.uint64(1)


def c4_line_dedup(sf_dir: str, seg_len: int = 10) -> pd.DataFrame:
    """(doc_id, text_clean, n_lines_removed) — corpus-wide duplicate-LINE
    removal in the C4 style (Raffel et al. 2020 §2.2 deduplicate repeated
    spans, keeping one occurrence).  The synthetic corpus is an unpunctuated
    single-line token stream, so a "line" here is a fixed NON-overlapping run
    of ``seg_len`` tokens; every line whose exact text occurred EARLIER in
    corpus order (doc_id, then line position) is dropped, and each document
    is rebuilt from its surviving lines.

    Semantics differ from ``strip_dup_spans`` (Lee et al.): the FIRST
    occurrence is kept (first-wins like ``exact_dedup``, at line rather than
    document granularity), and the unit is disjoint segments, not
    overlapping-k-gram coverage.

    Scale shape: one narrow all-to-all of (line_hash, doc_id, seg_no) rows
    bucketed by line hash picks each hash's global first occurrence and
    emits only the LOSERS; a second doc-bucket all-to-all co-locates those
    drop rows with the document text (which shuffles exactly once) for the
    rebuild.  Line identity is the in-segment positional-multiplier XOR of
    per-token md5 hashes (the ``gram_rows`` idiom), batch-vectorized via
    ``pd.factorize`` — no per-row hashing in the hot stage.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])
    NB = 64

    _SEG_SCHEMA = pa.schema(
        [("h", pa.int64()), ("doc_id", pa.int64()),
         ("seg_no", pa.int64()), ("bucket", pa.int32())]
    )

    def seg_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        toks_per_doc = [s.split() for s in t["text"].to_pylist()]
        lens = np.array([len(x) for x in toks_per_doc], dtype=np.int64)
        total = int(lens.sum())
        if total == 0:
            return pa.table(
                {"h": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64()),
                 "seg_no": pa.array([], pa.int64()), "bucket": pa.array([], pa.int32())},
                schema=_SEG_SCHEMA,
            )
        flat = [w for ts in toks_per_doc for w in ts]
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
        uh = np.fromiter(
            (_token_hash(w) for w in uniques), dtype=np.uint64, count=len(uniques)
        )
        th = uh[codes]
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        offs = np.concatenate([np.zeros(1, np.int64), np.cumsum(lens)])[:-1]
        pos_in_doc = np.arange(total, dtype=np.int64) - offs[doc_idx]
        pos_in_seg = pos_in_doc % seg_len
        contrib = th * _SEG_MULTS[pos_in_seg]
        starts = np.flatnonzero(pos_in_seg == 0)
        h = np.bitwise_xor.reduceat(contrib, starts)
        h = (_mix64(h) & np.uint64((1 << 61) - 1)).astype(np.int64)
        return pa.table(
            {"h": pa.array(h, pa.int64()),
             "doc_id": pa.array(np.repeat(ids, lens)[starts], pa.int64()),
             "seg_no": pa.array((pos_in_doc // seg_len)[starts], pa.int64()),
             "bucket": pa.array((h % NB).astype(np.int32), pa.int32())},
            schema=_SEG_SCHEMA,
        )

    def drops(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["h", "doc_id", "seg_no"], kind="mergesort")
        h = g["h"].to_numpy()
        first = np.ones(len(g), dtype=bool)
        first[1:] = h[1:] != h[:-1]
        lose = g[~first]
        ids = lose["doc_id"].to_numpy()
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "seg_no": pa.array(lose["seg_no"].to_numpy(), pa.int64()),
             "text": pa.nulls(len(lose), pa.string()),
             "dbucket": pa.array((ids % NB).astype(np.int32), pa.int32())},
            schema=_C4_UNION_SCHEMA,
        )

    def doc_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {"doc_id": t["doc_id"],
             "seg_no": pa.array(np.full(len(ids), -1, np.int64), pa.int64()),
             "text": t["text"],
             "dbucket": pa.array((ids % NB).astype(np.int32), pa.int32())},
            schema=_C4_UNION_SCHEMA,
        )

    def rebuild(g: pd.DataFrame) -> pa.Table:
        seg_no = g["seg_no"].to_numpy()
        dr = g[seg_no >= 0]
        drop_map: dict = {}
        for did, sn in zip(dr["doc_id"].to_numpy(), dr["seg_no"].to_numpy()):
            drop_map.setdefault(int(did), set()).add(int(sn))
        docs_g = g[seg_no == -1]
        out_id, out_txt, out_n = [], [], []
        for did, txt in zip(docs_g["doc_id"].to_numpy(), docs_g["text"]):
            toks = txt.split()
            segs = [" ".join(toks[i:i + seg_len])
                    for i in range(0, len(toks), seg_len)]
            dset = drop_map.get(int(did), ())
            kept = [s for j, s in enumerate(segs) if j not in dset]
            out_id.append(int(did))
            out_txt.append(" ".join(kept))
            out_n.append(len(segs) - len(kept))
        return pa.table(
            {"doc_id": pa.array(out_id, pa.int64()),
             "text_clean": pa.array(out_txt, pa.string()),
             "n_lines_removed": pa.array(out_n, pa.int64())},
            schema=_C4_OUT_SCHEMA,
        )

    drops_ds = (
        ds.map_batches(seg_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(drops, batch_format="pandas")
    )
    out = (
        ds.map_batches(doc_rows, batch_format="pyarrow")
        .union(drops_ds)
        .groupby("dbucket")
        .map_groups(rebuild, batch_format="pandas")
        .to_pandas()
    )
    if "doc_id" not in out.columns:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "text_clean": pd.Series([], dtype="object"),
             "n_lines_removed": pd.Series([], dtype="int64")}
        )
    return out.sort_values("doc_id").reset_index(drop=True)


def winnow_fingerprints(sf_dir: str, k: int = 3, w: int = 4) -> pd.DataFrame:
    """Driver-protocol wrapper of :func:`winnow_fingerprints_ds` — same
    columns, collected and (doc_id, pos)-sorted.  At scale consume the
    Dataset variant (the fingerprint set is ~2/(w+1) of gram positions —
    corpus-sized, not driver-sized)."""
    out = winnow_fingerprints_ds(sf_dir, k, w).to_pandas()
    return out.sort_values(["doc_id", "pos"]).reset_index(drop=True)


def winnow_fingerprints_ds(sf_dir: str, k: int = 3, w: int = 4):
    """(doc_id, pos, fp) — winnowing document fingerprints (Schleimer,
    Wilkerson & Aiken 2003, the MOSS algorithm): per document, hash every
    k-token gram (the MinHash md5/splitmix ring, positions 1-based), slide
    a window of ``w`` consecutive gram hashes, and select each window's
    minimum — ties to the RIGHTMOST position; documents with fewer than
    ``w`` grams contribute their rightmost global minimum.  The selected
    set is the classic plagiarism/near-copy fingerprint sketch with the
    guarantee that any shared substring of length >= w + k - 1 tokens
    yields a shared fingerprint.

    Scale shape: map-only — the whole computation is doc-local (no
    shuffle); the batch kernel hashes only DISTINCT tokens (factorize), 
    builds every window hash in k strided XOR passes, and winnows ALL
    docs' windows in one ``sliding_window_view`` argmin with doc-boundary
    masks.  Output is the (small) fingerprint set, ~m/((w+1)/2) rows per
    doc in expectation.

    DuckDB-oracle-checked (window-function min + rightmost-tie argmax join
    over the same gram CTEs as dup_ngram_spans).
    """
    from numpy.lib.stride_tricks import sliding_window_view

    ds = _docs(sf_dir, ["doc_id", "text"])
    _SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("pos", pa.int64()), ("fp", pa.int64())]
    )

    def winnow(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        toks_per_doc = [s.lower().split() for s in t["text"].to_pylist()]
        lens = np.array([len(x) for x in toks_per_doc], dtype=np.int64)
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int64()),
                          "fp": pa.array([], pa.int64())}, schema=_SCHEMA)
        if int(lens.sum()) == 0:
            return empty
        flat = [wd for toks in toks_per_doc for wd in toks]
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
        uh = np.fromiter((_token_hash(x) for x in uniques), dtype=np.uint64,
                         count=len(uniques))
        th = uh[codes]
        n_starts = len(th) - k + 1
        if n_starts <= 0:
            return empty
        g_full = np.zeros(n_starts, dtype=np.uint64)
        for j in range(k):
            g_full ^= th[j: j + n_starts] * _POS_MULT[j]
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        offs = np.concatenate([[0], np.cumsum(lens)])[:-1]
        s = np.arange(len(th), dtype=np.int64) - offs[doc_idx]
        valid = (s <= np.repeat(lens, lens) - k)[:n_starts]
        g = _mix64(g_full[valid]) & np.uint64((1 << 61) - 1)
        gdoc = doc_idx[:n_starts][valid]
        gpos = (s + 1)[:n_starts][valid]  # 1-based gram position
        mg = np.bincount(gdoc, minlength=len(lens))  # grams per doc
        gofs = np.concatenate([[0], np.cumsum(mg)])[:-1]

        sel: list = []
        if len(g) >= w:
            sw = sliding_window_view(g, w)
            starts = np.arange(len(sw))
            # window fully inside one doc: start and end share the doc
            ok = gdoc[starts] == gdoc[starts + w - 1]
            am = (w - 1) - np.argmin(sw[ok][:, ::-1], axis=1)
            sel.append(starts[ok] + am)
        shorts = np.flatnonzero((mg > 0) & (mg < w))
        for d in shorts:  # rare: docs with fewer than w grams
            seg = g[gofs[d]: gofs[d] + mg[d]]
            am = len(seg) - 1 - int(np.argmin(seg[::-1]))
            sel.append(np.array([gofs[d] + am], dtype=np.int64))
        if not sel:
            return empty
        chosen = np.unique(np.concatenate(sel))
        return pa.table(
            {"doc_id": pa.array(ids[gdoc[chosen]], pa.int64()),
             "pos": pa.array(gpos[chosen], pa.int64()),
             "fp": pa.array(g[chosen].astype(np.int64), pa.int64())},
            schema=_SCHEMA,
        )

    return ds.map_batches(winnow, batch_format="pyarrow")


def dedup_recall_report(sf_dir: str) -> pd.DataFrame:
    """(method, n_pairs, n_truth, n_hit, recall_milli, precision_milli) —
    the near-dup twin of ann_recall_report: every SKETCH-based pair finder
    scored against the EXACT token-3-gram Jaccard >= 1/2 pair set
    (ngram_jaccard_pairs, the no-recall-loss baseline this module documents
    the sketches are judged against).  The self-validating quality gauge a
    deployed dedup service watches: a recall drop after retuning bands /
    hamming radius shows up here before it shows up in the corpus.

    minhash targets the SAME similarity notion (estimated Jaccard at the
    same threshold), so its row reads as sketch quality; simhash targets
    Hamming distance over hashed token features — its recall against the
    Jaccard truth is honestly lower and that gap IS the documented
    difference between the two families, not a bug.  Integer milli ratios
    (floor division) keep the report hash-stable.

    Pair frames are dup-pair-sized (bounded by corpus dup rate), so the
    driver-side merges here are report-arithmetic, not data movement — the
    heavy lifting stayed in the three distributed pipelines.
    """
    truth = ngram_jaccard_pairs(sf_dir)
    methods = {
        "minhash_lsh": minhash_lsh_pairs(sf_dir),
        "simhash_h3": simhash_near_pairs(sf_dir),
    }
    n_truth = len(truth)
    rows = []
    for name, df in sorted(methods.items()):
        hit = len(df.merge(truth, on=["doc_a", "doc_b"]))
        rows.append({
            "method": name,
            "n_pairs": len(df),
            "n_truth": n_truth,
            "n_hit": hit,
            "recall_milli": (1000 * hit) // n_truth if n_truth else 0,
            "precision_milli": (1000 * hit) // len(df) if len(df) else 0,
        })
    return pd.DataFrame(rows).astype(
        {"method": "str", "n_pairs": "int64", "n_truth": "int64",
         "n_hit": "int64", "recall_milli": "int64", "precision_milli": "int64"})


def host_boilerplate_strip(sf_dir: str, seg_len: int = 10,
                           min_docs: int = 2) -> pd.DataFrame:
    """(doc_id, text_clean, n_lines_removed) — per-SOURCE boilerplate line
    removal in the RefinedWeb/CCNet style: a line (disjoint run of
    ``seg_len`` tokens, the c4_line_dedup unit) whose exact text occurs in
    at least ``min_docs`` DISTINCT documents of the SAME source is template
    boilerplate (nav bars, footers, legal blurbs the same host stamps on
    every page) and ALL its occurrences in that source are removed —
    unlike :func:`c4_line_dedup`, which keeps the global first occurrence
    of a cross-corpus duplicate.

    Scale shape: identical cost model to c4_line_dedup — one narrow
    all-to-all of (line_hash, source, doc_id, seg_no) rows bucketed by
    line hash (same line text always co-locates, so the per-(hash, source)
    distinct-doc count is exact in-group); only the LOSER rows go through
    the second doc-bucket all-to-all where the text (shuffled once) is
    rebuilt.  The boilerplate decision never touches text — hashes only.
    """
    ds = _docs(sf_dir, ["doc_id", "text", "source"])
    NB = 64

    _SEG_SCHEMA = pa.schema(
        [("h", pa.int64()), ("source", pa.string()), ("doc_id", pa.int64()),
         ("seg_no", pa.int64()), ("bucket", pa.int32())]
    )

    def seg_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        srcs = t["source"].to_pylist()
        toks_per_doc = [s.split() for s in t["text"].to_pylist()]
        lens = np.array([len(x) for x in toks_per_doc], dtype=np.int64)
        total = int(lens.sum())
        if total == 0:
            return _SEG_SCHEMA.empty_table()
        flat = [w for ts in toks_per_doc for w in ts]
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
        uh = np.fromiter(
            (_token_hash(w) for w in uniques), dtype=np.uint64, count=len(uniques)
        )
        th = uh[codes]
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        offs = np.concatenate([np.zeros(1, np.int64), np.cumsum(lens)])[:-1]
        pos_in_doc = np.arange(total, dtype=np.int64) - offs[doc_idx]
        pos_in_seg = pos_in_doc % seg_len
        contrib = th * _SEG_MULTS[pos_in_seg]
        starts = np.flatnonzero(pos_in_seg == 0)
        h = np.bitwise_xor.reduceat(contrib, starts)
        h = (_mix64(h) & np.uint64((1 << 61) - 1)).astype(np.int64)
        seg_doc_idx = doc_idx[starts]
        return pa.table(
            {"h": pa.array(h, pa.int64()),
             "source": pa.array([srcs[i] for i in seg_doc_idx], pa.string()),
             "doc_id": pa.array(np.repeat(ids, lens)[starts], pa.int64()),
             "seg_no": pa.array((pos_in_doc // seg_len)[starts], pa.int64()),
             "bucket": pa.array((h % NB).astype(np.int32), pa.int32())},
            schema=_SEG_SCHEMA,
        )

    def drops(g: pd.DataFrame) -> pa.Table:
        # distinct docs per (h, source) via a drop_duplicates count, then
        # flag EVERY occurrence row of qualifying (h, source) pairs
        per = (g.drop_duplicates(["h", "source", "doc_id"])
               .groupby(["h", "source"], as_index=False)
               .agg(nd=("doc_id", "size")))
        bad = per[per["nd"] >= min_docs][["h", "source"]]
        lose = g.merge(bad, on=["h", "source"], how="inner")
        ids = lose["doc_id"].to_numpy()
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "seg_no": pa.array(lose["seg_no"].to_numpy(), pa.int64()),
             "text": pa.nulls(len(lose), pa.string()),
             "dbucket": pa.array((ids % NB).astype(np.int32), pa.int32())},
            schema=_C4_UNION_SCHEMA,
        )

    def doc_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {"doc_id": t["doc_id"],
             "seg_no": pa.array(np.full(len(ids), -1, np.int64), pa.int64()),
             "text": t["text"],
             "dbucket": pa.array((ids % NB).astype(np.int32), pa.int32())},
            schema=_C4_UNION_SCHEMA,
        )

    def rebuild(g: pd.DataFrame) -> pa.Table:
        seg_no = g["seg_no"].to_numpy()
        dr = g[seg_no >= 0]
        drop_map: dict = {}
        for did, sn in zip(dr["doc_id"].to_numpy(), dr["seg_no"].to_numpy()):
            drop_map.setdefault(int(did), set()).add(int(sn))
        docs_g = g[seg_no == -1]
        out_id, out_txt, out_n = [], [], []
        for did, txt in zip(docs_g["doc_id"].to_numpy(), docs_g["text"]):
            toks = txt.split()
            segs = [" ".join(toks[i:i + seg_len])
                    for i in range(0, len(toks), seg_len)]
            dset = drop_map.get(int(did), ())
            kept = [s for j, s in enumerate(segs) if j not in dset]
            out_id.append(int(did))
            out_txt.append(" ".join(kept))
            out_n.append(len(segs) - len(kept))
        return pa.table(
            {"doc_id": pa.array(out_id, pa.int64()),
             "text_clean": pa.array(out_txt, pa.string()),
             "n_lines_removed": pa.array(out_n, pa.int64())},
            schema=_C4_OUT_SCHEMA,
        )

    drops_ds = (
        ds.map_batches(seg_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(drops, batch_format="pandas")
    )
    out = (
        ds.select_columns(["doc_id", "text"])
        .map_batches(doc_rows, batch_format="pyarrow")
        .union(drops_ds)
        .groupby("dbucket")
        .map_groups(rebuild, batch_format="pandas")
        .to_pandas()
    )
    if "doc_id" not in out.columns:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "text_clean": pd.Series([], dtype="object"),
             "n_lines_removed": pd.Series([], dtype="int64")}
        )
    return out.sort_values("doc_id").reset_index(drop=True)


def chunk_exact_dedup(sf_dir: str) -> pd.DataFrame:
    """(doc_id, chunk_index, canonical_doc_id, canonical_chunk_index) —
    exact dedup at the CHUNK level: every 350/80-token window (the
    reference app's RAG ingest unit, ``MainForm.cs:92``) canonicalized to
    the lexicographically smallest (doc_id, chunk_index) owning an
    identical chunk string.  Doc-level dedup misses this entirely — two
    distinct documents sharing one boilerplate section collide only at the
    chunk grain, and a RAG index that embeds both pays twice and retrieves
    duplicates.

    Scale shape: one map-only explode pass computes each chunk's 63-bit
    blake2b hash IN the task and emits only (doc_id, chunk_index, hash)
    rows — chunk text never enters the exchange (the exact_dedup stance:
    128->63-bit hash equality treated as content identity).  One coarse
    ``hash % 64`` bucket shuffle co-locates equal chunks; each bucket
    resolves its canonicals in one vectorized pandas pass.  Output is
    chunk-sized.
    """
    from .text import TOKEN_CHUNK_SIZE, TOKEN_CHUNK_STEP

    ds = _docs(sf_dir, ["doc_id", "text"])
    N_BUCKETS = 64

    def explode_hash(t: pa.Table) -> pa.Table:
        ids, idxs, hashes = [], [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = s.split(" ")
            n = len(toks)
            n_chunks = (
                1 if n <= TOKEN_CHUNK_SIZE
                else -(-(n - TOKEN_CHUNK_SIZE) // TOKEN_CHUNK_STEP) + 1
            )
            for i in range(n_chunks):
                chunk = " ".join(
                    toks[i * TOKEN_CHUNK_STEP: i * TOKEN_CHUNK_STEP + TOKEN_CHUNK_SIZE])
                ids.append(did)
                idxs.append(i)
                hashes.append(_text_hash64(chunk))
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "chunk_index": pa.array(idxs, pa.int64()),
             "h": pa.array(hashes, pa.int64()),
             "bucket": pa.array([h % N_BUCKETS for h in hashes], pa.int32())})

    _SCHEMA = pa.schema([("doc_id", pa.int64()), ("chunk_index", pa.int64()),
                         ("canonical_doc_id", pa.int64()),
                         ("canonical_chunk_index", pa.int64())])

    def canonical(g: pd.DataFrame) -> pa.Table:
        gs = g.sort_values(["h", "doc_id", "chunk_index"], kind="mergesort")
        first = gs.groupby("h", sort=False)[["doc_id", "chunk_index"]].transform("first")
        gs["canonical_doc_id"] = first["doc_id"].to_numpy()
        gs["canonical_chunk_index"] = first["chunk_index"].to_numpy()
        return pa.Table.from_pandas(
            gs[["doc_id", "chunk_index", "canonical_doc_id",
                "canonical_chunk_index"]],
            schema=_SCHEMA, preserve_index=False).replace_schema_metadata(None)

    out = (
        ds.map_batches(explode_hash, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(canonical, batch_format="pandas")
        .to_pandas()
    )
    return (out.sort_values(["doc_id", "chunk_index"])
            .reset_index(drop=True))


def winnow_overlap_pairs(sf_dir: str, k: int = 3, w: int = 4,
                         min_shared: int = 2) -> pd.DataFrame:
    """(doc_a, doc_b, n_shared) — the MOSS REPORT step over the winnowing
    sketch: document pairs sharing at least ``min_shared`` distinct
    winnowed fingerprints, with the shared-fingerprint count (Schleimer et
    al. 2003 §5 — MOSS ranks submission pairs by exactly this).  Winnowing
    guarantees any shared run of >= w + k - 1 tokens contributes a shared
    fingerprint, so this is the cheap near-copy screen: the sketch is
    ~2/(w+1) of gram positions, so both exchanges move that fraction of
    dup_ngram_spans' gram volume.

    Scale shape: the map-only winnow sketch feeds a fingerprint-bucket
    exchange (global per-(doc, fp) dedup + per-fingerprint np.unique/triu
    pair partials — the inverted-index idiom) and a pair-bucket exchange
    sums partials and applies the min_shared cut.  Cost model is
    sum(f^2) over WINNOWED fingerprint frequencies — the boilerplate
    caveat of ngram_jaccard_pairs applies at w+k-1-token granularity.

    Oracle: the winnow_fingerprints SQL nested as a CTE + self-join
    (oracles.winnow_overlap_pairs_sql), exact at both sf scales.
    """
    rows = winnow_fingerprints_ds(sf_dir, k, w)
    N_SHUFFLE_BUCKETS = 64

    _ROW = pa.schema([("doc_id", pa.int64()), ("fp", pa.int64()),
                      ("bucket", pa.int32())])

    def prep(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"doc_id": t["doc_id"].to_numpy(),
                           "fp": t["fp"].to_numpy()}).drop_duplicates()
        f = df["fp"].to_numpy()
        return pa.table(
            {"doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
             "fp": pa.array(f, pa.int64()),
             "bucket": pa.array((f % N_SHUFFLE_BUCKETS).astype(np.int32),
                                pa.int32())},
            schema=_ROW)

    _P = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                    ("c", pa.int64()), ("pbucket", pa.int32())])

    def fp_pair_partials(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(["doc_id", "fp"])
        g = g[g.groupby("fp")["fp"].transform("size") >= 2]
        if len(g) == 0:
            return _P.empty_table()
        m = g.merge(g, on="fp")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        c = (m.groupby(["doc_id_x", "doc_id_y"], as_index=False)
             .size().rename(columns={"size": "c"}))
        a = c["doc_id_x"].to_numpy()
        b = c["doc_id_y"].to_numpy()
        return pa.table(
            {"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64()),
             "c": pa.array(c["c"].to_numpy(), pa.int64()),
             "pbucket": pa.array(
                 ((a * np.int64(1_000_003) + b) % N_SHUFFLE_BUCKETS)
                 .astype(np.int32), pa.int32())},
            schema=_P)

    _OUT = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                      ("n_shared", pa.int64())])

    def sum_and_cut(g: pd.DataFrame) -> pa.Table:
        s = g.groupby(["doc_a", "doc_b"], as_index=False)["c"].sum()
        s = s[s["c"] >= min_shared]
        return pa.table(
            {"doc_a": pa.array(s["doc_a"].to_numpy(), pa.int64()),
             "doc_b": pa.array(s["doc_b"].to_numpy(), pa.int64()),
             "n_shared": pa.array(s["c"].to_numpy(), pa.int64())},
            schema=_OUT)

    out = (
        rows.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fp_pair_partials, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(sum_and_cut, batch_format="pandas")
        .to_pandas()
    )
    if "doc_a" not in out.columns:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("doc_a", "doc_b", "n_shared")})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
