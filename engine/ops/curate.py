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
