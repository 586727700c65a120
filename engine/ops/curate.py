"""Composed training-data curation pipeline over the ``documents`` table.

The flagship "what a 100-TB pretraining-data job actually runs" composition:
Gopher quality gate -> exact dedup -> transitive near-dup canonicalization
-> CCNet perplexity cut, with per-document attribution of the FIRST stage
that drops it.  Each signal is computed corpus-wide by its own distributed
component pipeline (the per-stage shuffle shapes are documented on the
components); the composition itself is a per-doc column merge at the driver
protocol's own output granularity (one row per document — the same scale as
every per-doc query's return value).  The DuckDB oracle is assembled from
the component oracles as subqueries (see __ray_entry__.oracle_sql), so the
composition cannot drift from its already-checked parts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def curate_training_data(sf_dir: str) -> pd.DataFrame:
    """(doc_id, status, ln_ppl_nano) — status is 'kept' or the first failing
    stage in fixed order: 'quality' (fails the Gopher gate), 'exact_dup'
    (not its byte-identical group's canonical), 'near_dup' (not its
    transitive MinHash cluster's canonical), 'perplexity' (tail tercile of
    the corpus-trained bigram LM).  Signals are computed over the FULL
    corpus (CCNet-style corpus-wide statistics), then attributed in order —
    so counts per stage are deterministic and order-documented."""
    from .dedup import exact_dedup, near_dedup_canonical
    from .text import gopher_quality_flags, lm_perplexity_bucket

    g = gopher_quality_flags(sf_dir)[["doc_id", "passes_gopher"]]
    e = exact_dedup(sf_dir).rename(columns={"canonical_id": "exact_canon"})
    n = near_dedup_canonical(sf_dir).rename(columns={"canonical_id": "near_canon"})
    p = lm_perplexity_bucket(sf_dir)[["doc_id", "ln_ppl_nano", "bucket"]]
    df = g.merge(e, on="doc_id").merge(n, on="doc_id").merge(p, on="doc_id")
    ids = df["doc_id"].to_numpy()
    status = np.select(
        [
            ~df["passes_gopher"].to_numpy(),
            df["exact_canon"].to_numpy() != ids,
            df["near_canon"].to_numpy() != ids,
            (df["bucket"] == "tail").to_numpy(),
        ],
        ["quality", "exact_dup", "near_dup", "perplexity"],
        default="kept",
    )
    out = pd.DataFrame(
        {"doc_id": ids, "status": status,
         "ln_ppl_nano": df["ln_ppl_nano"].to_numpy()}
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def source_mix_weighted(sf_dir: str) -> pd.DataFrame:
    """(source, n_total, n_sampled) — deterministic weighted source mixing
    (the execution step of a DoReMi/DSIR-style mixture: each source gets a
    sampling weight; membership is a pure hash test, so any worker, any
    rerun, and the oracle all pick the IDENTICAL subset — no RNG state).

    weight(srcI) = (2*(I%4)+1)/8 (i.e. 1/8, 3/8, 5/8, 7/8 cycling); a doc
    is sampled iff splitmix64(doc_id) < weight * 2^64, computed in exact
    uint64 arithmetic (threshold q * 2^61).  Scale shape: shuffle-free —
    one vectorized map emits per-batch (source, n_total, n_sampled)
    partials; the driver sums |sources| x |blocks| tiny rows.  DuckDB
    oracle reuses the engine's own splitmix64 SQL builder.
    """
    import os as _os

    import pyarrow as pa
    import pyarrow.compute as pc

    from .dedup import _mix64
    from .io import read_pruned

    ds = read_pruned(_os.path.join(sf_dir, "documents.parquet"),
                     ["doc_id", "source"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.uint64)
        h = _mix64(ids)
        idx = pc.cast(pc.utf8_slice_codeunits(t["source"], 3),
                      pa.int64()).to_numpy()
        q = (2 * (idx % 4) + 1).astype(np.uint64)
        sampled = h < q * np.uint64(1 << 61)
        d = pd.DataFrame({"source": t["source"].to_pandas(),
                          "sampled": sampled.astype(np.int64)})
        c = d.groupby("source", sort=True).agg(
            n_total=("sampled", "size"), n_sampled=("sampled", "sum")
        ).reset_index()
        return pa.table(
            {"source": pa.array(c["source"], pa.string()),
             "n_total": pa.array(c["n_total"].to_numpy(), pa.int64()),
             "n_sampled": pa.array(c["n_sampled"].to_numpy(), pa.int64())}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("source", as_index=False)[["n_total", "n_sampled"]].sum()
    return out.sort_values("source").reset_index(drop=True)


def export_training_shards(sf_dir: str, out_dir: str | None = None,
                           n_shards: int = 16) -> pd.DataFrame:
    """(shard, n_docs, n_chars) — materialize the curated corpus (the docs
    ``curate_training_data`` keeps) as RESUMABLE partitioned parquet: one
    consolidated file per ``shard=K/`` (shard = doc_id % n_shards), each
    written atomically (tmp + rename) with a per-shard manifest row, so a
    failed or re-run export SKIPS every finished shard — the brief's
    resumable-output contract, applied to the curation sink.

    Scale shape: kept-id rows (narrow) union the document rows and meet in
    ONE shard-keyed all-to-all (the c4 rebuild idiom — text moves once);
    each shard group sorts by doc_id (byte-stable files), writes its own
    file, and emits its manifest row.  On resume a finished shard's group
    reads only its existing parquet FOOTER metadata (row count + stored
    char count) — no rewrite, no data read.  The query's return value is
    the manifest; the DuckDB oracle recomputes it from the composed curate
    oracle (rows AND total chars, so payload — not just membership — is
    checked).
    """
    import hashlib
    import json
    import os as _os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as _pq
    import ray.data as rd

    from .io import read_pruned

    src = _os.path.join(sf_dir, "documents.parquet")
    if out_dir is None:
        st = _os.stat(src)
        key = hashlib.md5(
            f"{_os.path.abspath(src)}|{st.st_mtime_ns}|{st.st_size}|"
            f"{n_shards}".encode()
        ).hexdigest()[:16]
        out_dir = _os.path.join("/tmp", "engine_training_shards", key)
    _os.makedirs(out_dir, exist_ok=True)

    cur = curate_training_data(sf_dir)
    kept = cur.loc[cur["status"] == "kept", "doc_id"].to_numpy()

    _U_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()),
         ("is_kept", pa.int8()), ("shard", pa.int64())]
    )

    def doc_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {"doc_id": t["doc_id"], "text": t["text"],
             "is_kept": pa.array(np.zeros(len(ids), np.int8), pa.int8()),
             "shard": pa.array(ids % n_shards, pa.int64())},
            schema=_U_SCHEMA,
        )

    kept_t = pa.table(
        {"doc_id": pa.array(kept, pa.int64()),
         "text": pa.nulls(len(kept), pa.string()),
         "is_kept": pa.array(np.ones(len(kept), np.int8), pa.int8()),
         "shard": pa.array(kept % n_shards, pa.int64())},
        schema=_U_SCHEMA,
    )

    _M_SCHEMA = pa.schema(
        [("shard", pa.int64()), ("n_docs", pa.int64()), ("n_chars", pa.int64())]
    )

    def write_shard(g: pd.DataFrame) -> pa.Table:
        sh = int(g["shard"].iloc[0])
        final = _os.path.join(out_dir, f"shard={sh}")
        fpath = _os.path.join(final, "part.parquet")
        mpath = _os.path.join(final, "manifest.json")
        if _os.path.exists(mpath):            # finished shard: footer-only resume
            with open(mpath) as f:
                m = json.load(f)
            n = _pq.ParquetFile(fpath).metadata.num_rows
            if n == m["n_docs"]:
                return pa.table(
                    {"shard": [sh], "n_docs": [m["n_docs"]],
                     "n_chars": [m["n_chars"]]}, schema=_M_SCHEMA)
        k = g[g["is_kept"] == 1]["doc_id"]
        d = g[(g["is_kept"] == 0) & g["doc_id"].isin(k)].sort_values("doc_id")
        tbl = pa.table(
            {"doc_id": pa.array(d["doc_id"].to_numpy(), pa.int64()),
             "text": pa.array(d["text"], pa.string())}
        )
        n_chars = int(d["text"].str.len().sum()) if len(d) else 0
        _os.makedirs(final, exist_ok=True)
        tmp = fpath + ".tmp"
        _pq.write_table(tbl, tmp)
        _os.replace(tmp, fpath)
        with open(mpath + ".tmp", "w") as f:
            json.dump({"shard": sh, "n_docs": len(d), "n_chars": n_chars}, f)
        _os.replace(mpath + ".tmp", mpath)
        return pa.table(
            {"shard": [sh], "n_docs": [len(d)], "n_chars": [n_chars]},
            schema=_M_SCHEMA,
        )

    docs = read_pruned(src, ["doc_id", "text"]).map_batches(
        doc_rows, batch_format="pyarrow")
    out = (
        docs.union(rd.from_arrow(kept_t))
        .groupby("shard")
        .map_groups(write_shard, batch_format="pandas")
        .to_pandas()
    )
    out = out[out["n_docs"] > 0]
    return out.sort_values("shard").reset_index(drop=True)
