"""Similarity search over the ``embeddings`` table (list<float> column).

Brute-force cosine top-k is the exactness baseline (numpy matmul per batch
against a broadcast query matrix — no shuffle); the LSH-bucketed variant is
the sub-linear scale path (random-hyperplane buckets, search within bucket).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _emb(sf_dir: str):
    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                           columns=["vec_id", "embedding"])


def _to_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = t["vec_id"].to_numpy()
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, mat


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def ann_topk_bruteforce(sf_dir: str, n_queries: int = 5, k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k: (query_id, vec_id) for each of the first n_queries vectors.

    The query matrix is broadcast once (``ray.put``); each batch computes one
    fp64 matmul and emits only its local top-(k) candidates per query — the
    driver merges ≤ k * n_blocks rows.  Scores are ranks only in the output
    (ids, not floats), with ties broken by vec_id ascending.
    """
    import pyarrow.parquet as pq

    qt = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).slice(0, n_queries)
    q_ids, q_mat = _to_matrix(qt)
    q_ref = ray.put((q_ids, _normalize(q_mat)))

    def local_topk(t: pa.Table) -> pa.Table:
        qids, qn = ray.get(q_ref)
        ids, mat = _to_matrix(t)
        sims = _normalize(mat) @ qn.T  # (batch, n_queries)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(qids):
            col = sims[:, qi]
            mask = ids != qid
            cand_ids, cand_sims = ids[mask], col[mask]
            if len(cand_ids) > k:
                part = np.argpartition(-cand_sims, k)[:k]
                cand_ids, cand_sims = cand_ids[part], cand_sims[part]
            out_q.extend([qid] * len(cand_ids))
            out_v.extend(cand_ids.tolist())
            out_s.extend(cand_sims.tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    cands = _emb(sf_dir).map_batches(local_topk, batch_format="pyarrow",
                                     batch_size=4096).to_pandas()
    cands = cands.sort_values(["query_id", "sim", "vec_id"],
                              ascending=[True, False, True], kind="mergesort")
    out = cands.groupby("query_id", sort=True).head(k)
    return out[["query_id", "vec_id"]].reset_index(drop=True)


def ann_topk_lsh(sf_dir: str, n_queries: int = 5, k: int = 10, n_planes: int = 4,
                 n_tables: int = 8, seed: int = 42) -> pd.DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH (the scale path).

    n_tables independent sign-hash tables of n_planes bits; a vector is a
    candidate if it shares a bucket with the query in ANY table; exact cosine
    re-ranking over candidates.  Recall < 1 by design — quality is measured in
    pytest against the brute-force baseline, so this op is rows-only for the
    driver.
    """
    import pyarrow.parquet as pq

    full = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    dim = len(full["embedding"][0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    qt = full.slice(0, n_queries)
    q_ids, q_mat = _to_matrix(qt)
    qn = _normalize(q_mat)
    q_codes = [(qn @ planes[t].T > 0) for t in range(n_tables)]  # (nq, n_planes)
    bc = ray.put((q_ids, qn, planes, q_codes))

    def local_candidates(t: pa.Table) -> pa.Table:
        qids, qn_, planes_, qcodes_ = ray.get(bc)
        ids, mat = _to_matrix(t)
        mn = _normalize(mat)
        out_q, out_v, out_s = [], [], []
        codes = [(mn @ planes_[tt].T > 0) for tt in range(len(planes_))]
        for qi, qid in enumerate(qids):
            cand_mask = np.zeros(len(ids), dtype=bool)
            for tt in range(len(planes_)):
                cand_mask |= (codes[tt] == qcodes_[tt][qi]).all(axis=1)
            cand_mask &= ids != qid
            cand_ids = ids[cand_mask]
            if len(cand_ids) == 0:
                continue
            sims = mn[cand_mask] @ qn_[qi]
            if len(cand_ids) > k:
                part = np.argpartition(-sims, k)[:k]
                cand_ids, sims = cand_ids[part], sims[part]
            out_q.extend([qid] * len(cand_ids))
            out_v.extend(cand_ids.tolist())
            out_s.extend(sims.tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    cands = _emb(sf_dir).map_batches(local_candidates, batch_format="pyarrow",
                                     batch_size=4096).to_pandas()
    if len(cands) == 0:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "vec_id": pd.Series([], dtype="int64")})
    cands = cands.sort_values(["query_id", "sim", "vec_id"],
                              ascending=[True, False, True], kind="mergesort")
    out = cands.groupby("query_id", sort=True).head(k)
    return out[["query_id", "vec_id"]].reset_index(drop=True)


def ann_topk_ivf(sf_dir: str, n_queries: int = 5, k: int = 10, n_cells: int = 16,
                 n_probe: int = 4, seed: int = 42, kmeans_iters: int = 5) -> pd.DataFrame:
    """IVF (inverted-file) approximate top-k — the coarse-quantizer scale path.

    Train a small k-means codebook on a deterministic sample (driver-side,
    tiny), broadcast the centroids, assign each batch's vectors to cells, and
    search only the n_probe cells nearest to each query.  At 10^9 vectors the
    cell assignment becomes a partitioned layout (write vectors bucketed by
    cell id) and queries touch n_probe/n_cells of the data; here the
    assignment happens per batch against the broadcast codebook.

    Rows-only for the driver (approximate by design); recall vs brute force
    is asserted in pytest.
    """
    import pyarrow.parquet as pq

    full = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    all_ids, all_mat = _to_matrix(full)
    mn = _normalize(all_mat)

    # deterministic mini k-means on a fixed sample (driver; codebook is tiny)
    rng = np.random.default_rng(seed)
    sample = mn[rng.choice(len(mn), size=min(len(mn), 1024), replace=False)]
    centroids = sample[rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)]
    for _ in range(kmeans_iters):
        assign = (sample @ centroids.T).argmax(axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    centroids[c] = v / norm
    cb = ray.put(centroids)

    qn = mn[:n_queries]
    q_ids = all_ids[:n_queries]
    q_cells = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]
    qref = ray.put((q_ids, qn, q_cells))

    def probe(t: pa.Table) -> pa.Table:
        cents = ray.get(cb)
        qids, qn_, qcells_ = ray.get(qref)
        ids, mat = _to_matrix(t)
        m = _normalize(mat)
        cells = (m @ cents.T).argmax(axis=1)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(qids):
            mask = np.isin(cells, qcells_[qi]) & (ids != qid)
            cand_ids = ids[mask]
            if not len(cand_ids):
                continue
            sims = m[mask] @ qn_[qi]
            if len(cand_ids) > k:
                part = np.argpartition(-sims, k)[:k]
                cand_ids, sims = cand_ids[part], sims[part]
            out_q.extend([qid] * len(cand_ids))
            out_v.extend(cand_ids.tolist())
            out_s.extend(sims.tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    cands = _emb(sf_dir).map_batches(probe, batch_format="pyarrow", batch_size=4096).to_pandas()
    if len(cands) == 0:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "vec_id": pd.Series([], dtype="int64")})
    cands = cands.sort_values(["query_id", "sim", "vec_id"],
                              ascending=[True, False, True], kind="mergesort")
    out = cands.groupby("query_id", sort=True).head(k)
    return out[["query_id", "vec_id"]].reset_index(drop=True)


def embedding_near_pairs(sf_dir: str, threshold: float = 0.95) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine >= threshold).

    Each batch matmuls against the broadcast full (normalized) matrix; only
    the upper triangle is emitted.  At 10^9 vectors this becomes
    LSH-bucket-then-verify (see ann_topk_lsh); the batch x broadcast matmul is
    the exactness baseline.
    """
    import pyarrow.parquet as pq

    full = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    all_ids, all_mat = _to_matrix(full)
    ref = ray.put((all_ids, _normalize(all_mat)))

    def pairs(t: pa.Table) -> pa.Table:
        ids_all, mn_all = ray.get(ref)
        ids, mat = _to_matrix(t)
        sims = _normalize(mat) @ mn_all.T
        a, b = [], []
        for i, vid in enumerate(ids):
            hit = np.flatnonzero(sims[i] >= threshold)
            for j in hit:
                other = ids_all[j]
                if vid < other:
                    a.append(int(vid))
                    b.append(int(other))
        return pa.table({"vec_a": pa.array(a, pa.int64()), "vec_b": pa.array(b, pa.int64())})

    out = _emb(sf_dir).map_batches(pairs, batch_format="pyarrow", batch_size=2048).to_pandas()
    if "vec_a" not in out.columns:  # no pairs above threshold anywhere
        return pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                             "vec_b": pd.Series([], dtype="int64")})
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
