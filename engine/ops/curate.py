"""Composed training-data curation pipeline over the ``documents`` table.

The flagship "what a 100-TB pretraining-data job actually runs" composition:
Gopher quality gate -> exact dedup -> transitive near-dup canonicalization
-> CCNet perplexity cut, with per-document attribution of the FIRST stage
that drops it.  Each signal is computed corpus-wide by its own distributed
component pipeline (the per-stage shuffle shapes are documented on the
components); the composition itself is fully Dataset-side — the four signal
streams union into ONE doc_id-bucket all-to-all whose groups pivot and
attribute vectorized, so no per-doc signal ever collects on the driver
(the pandas query wrapper collects only the FINAL per-doc verdict, the
driver protocol's own granularity).  The DuckDB oracle is assembled from
the component oracles as subqueries (see __ray_entry__.oracle_sql), so the
composition cannot drift from its already-checked parts.
"""

from __future__ import annotations

import os as _os

import numpy as np
import pandas as pd
import pyarrow as pa

_SIG_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("side", pa.int8()), ("v", pa.int64()),
     ("bucket", pa.int32())]
)
# side ids in the signal union (one row per doc per side, ppl emits two)
_S_GOPHER, _S_EXACT, _S_NEAR, _S_PPL, _S_TAIL = 0, 1, 2, 3, 4
_N_SIG_BUCKETS = 64

_CURATE_CACHE: dict = {}


def _sig_rows(side: int, col: str):
    """Tag a component Dataset's (doc_id, <col>) as union rows."""

    def tag(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "side": pa.array(np.full(len(ids), side, np.int8), pa.int8()),
             "v": pa.array(v, pa.int64()),
             "bucket": pa.array((ids % _N_SIG_BUCKETS).astype(np.int32),
                                pa.int32())},
            schema=_SIG_SCHEMA,
        )

    return tag


def curate_training_data_ds(sf_dir: str):
    """Dataset variant of :func:`curate_training_data`: the four signal
    pipelines stream their narrow per-doc outputs into one doc_id-bucket
    shuffle; each group pivots (doc x side) and attributes the first
    failing stage vectorized.  Cached (materialized) per documents-file
    identity — the driver query and the shard export share one run of the
    expensive LSH+CC / bigram-LM components."""
    from .dedup import exact_dedup_ds, near_dedup_canonical_ds
    from .text import gopher_quality_flags_ds, lm_perplexity_bucket_ds

    p = _os.path.join(sf_dir, "documents.parquet")
    st = _os.stat(p)
    key = (_os.path.abspath(p), st.st_mtime_ns, st.st_size)
    if key in _CURATE_CACHE:
        return _CURATE_CACHE[key]

    g = gopher_quality_flags_ds(sf_dir).map_batches(
        _sig_rows(_S_GOPHER, "passes_gopher"), batch_format="pyarrow")
    e = exact_dedup_ds(sf_dir).map_batches(
        _sig_rows(_S_EXACT, "canonical_id"), batch_format="pyarrow")
    n = near_dedup_canonical_ds(sf_dir).map_batches(
        _sig_rows(_S_NEAR, "canonical_id"), batch_format="pyarrow")

    def ppl_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        nano = t["ln_ppl_nano"].to_numpy()
        tail = (t["bucket"].to_numpy(zero_copy_only=False) == "tail")
        two = np.concatenate([ids, ids])
        return pa.table(
            {"doc_id": pa.array(two, pa.int64()),
             "side": pa.array(
                 np.concatenate([np.full(len(ids), _S_PPL, np.int8),
                                 np.full(len(ids), _S_TAIL, np.int8)]),
                 pa.int8()),
             "v": pa.array(
                 np.concatenate([nano, tail.astype(np.int64)]), pa.int64()),
             "bucket": pa.array((two % _N_SIG_BUCKETS).astype(np.int32),
                                pa.int32())},
            schema=_SIG_SCHEMA,
        )

    ppl = lm_perplexity_bucket_ds(sf_dir).map_batches(
        ppl_rows, batch_format="pyarrow")

    _OUT_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("status", pa.string()),
         ("ln_ppl_nano", pa.int64())]
    )

    def attribute(grp: pd.DataFrame) -> pa.Table:
        piv = grp.pivot(index="doc_id", columns="side", values="v")
        ids = piv.index.to_numpy()
        status = np.select(
            [
                piv[_S_GOPHER].to_numpy() == 0,
                piv[_S_EXACT].to_numpy() != ids,
                piv[_S_NEAR].to_numpy() != ids,
                piv[_S_TAIL].to_numpy() == 1,
            ],
            ["quality", "exact_dup", "near_dup", "perplexity"],
            default="kept",
        )
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "status": pa.array(status, pa.string()),
             "ln_ppl_nano": pa.array(
                 piv[_S_PPL].to_numpy().astype(np.int64), pa.int64())},
            schema=_OUT_SCHEMA,
        )

    out = (
        g.union(e).union(n).union(ppl)
        .groupby("bucket")
        .map_groups(attribute, batch_format="pandas")
        .materialize()
    )
    _CURATE_CACHE[key] = out
    return out


def curate_training_data(sf_dir: str) -> pd.DataFrame:
    """(doc_id, status, ln_ppl_nano) — status is 'kept' or the first failing
    stage in fixed order: 'quality' (fails the Gopher gate), 'exact_dup'
    (not its byte-identical group's canonical), 'near_dup' (not its
    transitive MinHash cluster's canonical), 'perplexity' (tail tercile of
    the corpus-trained bigram LM).  Signals are computed over the FULL
    corpus (CCNet-style corpus-wide statistics), then attributed in order —
    so counts per stage are deterministic and order-documented.  Driver
    wrapper of :func:`curate_training_data_ds`."""
    out = curate_training_data_ds(sf_dir).to_pandas()
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

    Scale shape: kept-id rows stream straight off the curate composition's
    Dataset (``curate_training_data_ds`` — never collected on the driver),
    union the document rows and meet in ONE shard-keyed all-to-all (the c4
    rebuild idiom — text moves once);
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

    import pyarrow.compute as pc
    import pyarrow.parquet as _pq

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

    # Completed-export fast path: a top-level marker (written only after a
    # full run) lists the manifest; if every listed shard's parquet FOOTER
    # still matches, return it without replaying the curate pipeline.  A
    # stale/partial marker (e.g. a shard rewritten underneath us) falls
    # through to the per-shard resumable path below.
    done_marker = _os.path.join(out_dir, "_export_done.json")
    if _os.path.exists(done_marker):
        with open(done_marker) as f:
            rows = json.load(f)
        ok = True
        for m in rows:
            fpath = _os.path.join(out_dir, f"shard={m['shard']}", "part.parquet")
            try:
                if _pq.ParquetFile(fpath).metadata.num_rows != m["n_docs"]:
                    ok = False
                    break
            except (OSError, pa.ArrowInvalid):
                ok = False
                break
        if ok:
            return pd.DataFrame(
                rows, columns=["shard", "n_docs", "n_chars"]
            ).astype({"shard": "int64", "n_docs": "int64",
                      "n_chars": "int64"})

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

    def kept_rows(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.equal(t["status"], "kept"))["doc_id"].to_numpy()
        return pa.table(
            {"doc_id": pa.array(kept, pa.int64()),
             "text": pa.nulls(len(kept), pa.string()),
             "is_kept": pa.array(np.ones(len(kept), np.int8), pa.int8()),
             "shard": pa.array(kept % n_shards, pa.int64())},
            schema=_U_SCHEMA,
        )

    kept_ds = curate_training_data_ds(sf_dir).map_batches(
        kept_rows, batch_format="pyarrow")

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
        docs.union(kept_ds)
        .groupby("shard")
        .map_groups(write_shard, batch_format="pandas")
        .to_pandas()
    )
    out = out[out["n_docs"] > 0]
    out = out.sort_values("shard").reset_index(drop=True)
    with open(done_marker + ".tmp", "w") as f:
        json.dump(out.to_dict(orient="records"), f)
    _os.replace(done_marker + ".tmp", done_marker)
    return out


# Deterministic stand-in for a right-to-be-forgotten request list: the docs
# with doc_id % _FORGET_MOD == _FORGET_REM (SQL-expressible so the manifest
# stays DuckDB-checkable end to end).
_FORGET_MOD, _FORGET_REM = 331, 7


def forget_documents(sf_dir: str, out_dir: str | None = None,
                     n_shards: int = 16) -> pd.DataFrame:
    """(shard, n_docs, n_chars) — targeted deletion (right-to-be-forgotten /
    takedown) propagated into the exported training shards WITHOUT a corpus
    rebuild: the deletion set maps to its ``shard=K/`` partitions and ONLY
    those files are read, filtered, and atomically rewritten (tmp + rename,
    manifest updated); every other shard is never even opened.  At 100 TB
    this is the difference between an hours-long full re-export and touching
    a handful of partition files.

    Scale shape: phase 1 reuses ``export_training_shards``'s resumable build
    (into a forget-private dir, so the plain export artifact stays
    pristine).  Phase 2 collects the deletion set on the driver — deletion
    REQUESTS are driver-small by nature (the detect_corpus_delta
    assumption), here the deterministic ``doc_id % 331 == 7`` stand-in —
    broadcasts it once, and rewrites the affected shards as one distributed
    map (one task per shard, each a bounded single-file read).  Re-running
    is a no-op: already-clean shards contain no forgotten ids and are left
    untouched (content-level idempotence, no marker files).

    Returns the post-forget manifest; the DuckDB oracle recomputes it from
    the composed curate oracle minus the forgotten ids (counts AND chars, so
    payload is checked).
    """
    import hashlib
    import json

    import pyarrow.parquet as _pq
    import ray as _ray
    import ray.data as _rd

    from .io import read_pruned

    src = _os.path.join(sf_dir, "documents.parquet")
    if out_dir is None:
        st = _os.stat(src)
        key = hashlib.md5(
            f"{_os.path.abspath(src)}|{st.st_mtime_ns}|{st.st_size}|"
            f"{n_shards}|forget".encode()
        ).hexdigest()[:16]
        out_dir = _os.path.join("/tmp", "engine_forget_shards", key)
    export_training_shards(sf_dir, out_dir=out_dir, n_shards=n_shards)

    def matches(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table({"doc_id": pa.array(
            ids[ids % _FORGET_MOD == _FORGET_REM], pa.int64())})

    forget_ids = np.sort(
        read_pruned(src, ["doc_id"])
        .map_batches(matches, batch_format="pyarrow")
        .to_pandas()["doc_id"].to_numpy()
    )
    affected = sorted({int(i) % n_shards for i in forget_ids})
    fref = _ray.put(forget_ids)

    _M_SCHEMA = pa.schema(
        [("shard", pa.int64()), ("rewritten", pa.int8())]
    )

    def rewrite(t: pa.Table) -> pa.Table:
        fids = _ray.get(fref)
        out = {"shard": [], "rewritten": []}
        for sh in t["shard"].to_pylist():
            final = _os.path.join(out_dir, f"shard={sh}")
            fpath = _os.path.join(final, "part.parquet")
            mpath = _os.path.join(final, "manifest.json")
            if not _os.path.exists(fpath):
                continue
            tbl = _pq.read_table(fpath)
            keep = ~np.isin(tbl["doc_id"].to_numpy(), fids)
            out["shard"].append(sh)
            if keep.all():                      # already clean: untouched
                out["rewritten"].append(0)
                continue
            clean = tbl.filter(pa.array(keep))
            tmp = fpath + ".tmp"
            _pq.write_table(clean, tmp)
            _os.replace(tmp, fpath)
            n_chars = int(pa.compute.sum(
                pa.compute.utf8_length(clean["text"])).as_py() or 0)
            with open(mpath + ".tmp", "w") as f:
                json.dump({"shard": int(sh), "n_docs": clean.num_rows,
                           "n_chars": n_chars}, f)
            _os.replace(mpath + ".tmp", mpath)
            out["rewritten"].append(1)
        return pa.table(
            {"shard": pa.array(out["shard"], pa.int64()),
             "rewritten": pa.array(out["rewritten"], pa.int8())},
            schema=_M_SCHEMA)

    if affected:
        (_rd.from_items([{"shard": s} for s in affected])
         .map_batches(rewrite, batch_format="pyarrow", batch_size=1)
         .materialize())

    rows = []
    for sh in range(n_shards):
        mpath = _os.path.join(out_dir, f"shard={sh}", "manifest.json")
        if not _os.path.exists(mpath):
            continue
        with open(mpath) as f:
            m = json.load(f)
        if m["n_docs"] > 0:
            rows.append({"shard": sh, "n_docs": m["n_docs"],
                         "n_chars": m["n_chars"]})
    # Refresh the export's top-level marker with the post-forget manifest so
    # a re-run's export_training_shards call fast-paths instead of replaying
    # the curate pipeline against already-clean shards.
    done_marker = _os.path.join(out_dir, "_export_done.json")
    with open(done_marker + ".tmp", "w") as f:
        json.dump(rows, f)
    _os.replace(done_marker + ".tmp", done_marker)
    return pd.DataFrame(rows, columns=["shard", "n_docs", "n_chars"]).astype(
        {"shard": "int64", "n_docs": "int64", "n_chars": "int64"})


def source_quality_stats(sf_dir: str) -> pd.DataFrame:
    """(source, n_docs, n_quality, n_exact_dup, n_near_dup, n_perplexity,
    n_kept, sum_tokens) — per-source curation scoreboard: how each source
    (the web-pipeline analog of a DOMAIN) fares through the curate stages,
    plus its token mass.  This is the RefinedWeb/CCNet domain-level
    filtering signal: a source whose docs are mostly near-dups or
    perplexity-tail is a candidate for domain-level exclusion or
    down-weighting, decided on aggregates rather than per-doc rules.

    Scale shape: the per-doc verdicts stream straight off the cached curate
    composition Dataset (never collected); they meet the narrow
    (doc_id, source, n_tokens) doc rows in ONE doc_id-bucket all-to-all,
    each group merges vectorized and pre-aggregates to per-source partials,
    and the final ``groupby(source)`` sums |sources| x |buckets| tiny rows.
    The DuckDB oracle joins the composed curate oracle against the token
    counts, so this op cannot drift from its checked parts.
    """
    import pyarrow.compute as pc

    from .io import read_pruned

    _U_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("bucket", pa.int32()),
         ("source", pa.string()), ("status", pa.string()),
         ("n_tokens", pa.int64())]
    )

    def cur_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {"doc_id": t["doc_id"],
             "bucket": pa.array((ids % _N_SIG_BUCKETS).astype(np.int32), pa.int32()),
             "source": pa.nulls(len(ids), pa.string()),
             "status": t["status"],
             "n_tokens": pa.nulls(len(ids), pa.int64())},
            schema=_U_SCHEMA,
        )

    def doc_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {"doc_id": t["doc_id"],
             "bucket": pa.array((ids % _N_SIG_BUCKETS).astype(np.int32), pa.int32()),
             "source": t["source"],
             "status": pa.nulls(len(ids), pa.string()),
             "n_tokens": pc.cast(
                 pc.count_substring_regex(t["text"], r"\S+"), pa.int64())},
            schema=_U_SCHEMA,
        )

    cur = curate_training_data_ds(sf_dir).map_batches(
        cur_rows, batch_format="pyarrow")
    docs = read_pruned(
        _os.path.join(sf_dir, "documents.parquet"), ["doc_id", "source", "text"]
    ).map_batches(doc_rows, batch_format="pyarrow")

    _STATUSES = ("quality", "exact_dup", "near_dup", "perplexity", "kept")

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["status"].isna()][["doc_id", "source", "n_tokens"]]
        right = g[g["source"].isna()][["doc_id", "status"]]
        m = left.merge(right, on="doc_id")
        agg = m.groupby("source", sort=True)
        out = pd.DataFrame({"n_docs": agg.size(),
                            "sum_tokens": agg["n_tokens"].sum()})
        for s in _STATUSES:
            out["n_" + s] = agg["status"].apply(lambda v, s=s: int((v == s).sum()))
        return out.reset_index()

    # final reduce on the driver: the per-bucket partials are BOUNDED
    # (|sources| x |buckets| rows) — a second Dataset aggregate here paid
    # ~4 s of all-to-all fixed overhead at sf0.1 for 1,280 rows
    stats = (
        cur.union(docs)
        .groupby("bucket")
        .map_groups(partial, batch_format="pandas")
        .to_pandas()
        .groupby("source", as_index=False)
        .sum()
    )
    cols = ["source", "n_docs", "n_quality", "n_exact_dup", "n_near_dup",
            "n_perplexity", "n_kept", "sum_tokens"]
    stats = stats[cols].astype({c: "int64" for c in cols[1:]})
    return stats.sort_values("source").reset_index(drop=True)


def export_jsonl_shards(sf_dir: str, out_dir: str | None = None,
                        n_shards: int = 16) -> pd.DataFrame:
    """(shard, n_docs, n_bytes) — publish the corpus as partitioned JSONL
    (one ``shard=K/part.jsonl`` per ``doc_id % n_shards``), the interchange
    format LLM training stacks actually consume; same resumable-sink
    contract as :func:`export_training_shards` (atomic tmp+rename writes,
    per-shard manifest, finished shards skipped on re-run by a
    size+count manifest check — no data reread).

    Line format is byte-deterministic: keys in fixed order
    ``doc_id,lang,source,text``, compact separators, one ``\\n`` per line,
    rows ordered by doc_id within a shard — so the manifest's byte count
    is an exact function of the data and the DuckDB oracle recomputes it
    with a string-concat twin (the corpus is plain ASCII, so JSON string
    encoding is quote-wrapping — asserted per batch).

    Scale shape: ONE shard-keyed all-to-all of full doc rows (text moves
    once, the export is the point); manifest partials are shard-count
    rows.
    """
    import hashlib
    import json

    import pyarrow.parquet as _pq

    from .io import read_pruned

    src = _os.path.join(sf_dir, "documents.parquet")
    if out_dir is None:
        st = _os.stat(src)
        key = hashlib.md5(
            f"{_os.path.abspath(src)}|{st.st_mtime_ns}|{st.st_size}|"
            f"jsonl|{n_shards}".encode()
        ).hexdigest()[:16]
        out_dir = _os.path.join("/tmp", "engine_jsonl_shards", key)
    _os.makedirs(out_dir, exist_ok=True)

    _U_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("lang", pa.string()), ("source", pa.string()),
         ("text", pa.string()), ("shard", pa.int64())]
    )

    def doc_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {"doc_id": t["doc_id"], "lang": t["lang"], "source": t["source"],
             "text": t["text"],
             "shard": pa.array(ids % n_shards, pa.int64())},
            schema=_U_SCHEMA,
        )

    _M_SCHEMA = pa.schema(
        [("shard", pa.int64()), ("n_docs", pa.int64()), ("n_bytes", pa.int64())]
    )

    def write_shard(g: pd.DataFrame) -> pa.Table:
        sh = int(g["shard"].iloc[0])
        final = _os.path.join(out_dir, f"shard={sh}")
        fpath = _os.path.join(final, "part.jsonl")
        mpath = _os.path.join(final, "manifest.json")
        if _os.path.exists(mpath):           # finished shard: stat-only resume
            with open(mpath) as f:
                m = json.load(f)
            try:
                if _os.stat(fpath).st_size == m["n_bytes"]:
                    return pa.table(
                        {"shard": [sh], "n_docs": [m["n_docs"]],
                         "n_bytes": [m["n_bytes"]]}, schema=_M_SCHEMA)
            except OSError:
                pass
        g = g.sort_values("doc_id")
        lines = []
        for did, lang, srcv, txt in zip(
                g["doc_id"].to_numpy(), g["lang"], g["source"], g["text"]):
            # plain-ASCII corpus => JSON string encoding is quote-wrapping;
            # assert so a future corpus with escapes fails loudly, not subtly
            assert json.dumps(txt) == f'"{txt}"', "non-trivial JSON escape"
            lines.append(
                f'{{"doc_id":{int(did)},"lang":"{lang}",'
                f'"source":"{srcv}","text":"{txt}"}}\n')
        payload = "".join(lines).encode()
        _os.makedirs(final, exist_ok=True)
        tmp = fpath + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        _os.replace(tmp, fpath)
        m = {"shard": sh, "n_docs": len(g), "n_bytes": len(payload)}
        with open(mpath + ".tmp", "w") as f:
            json.dump(m, f)
        _os.replace(mpath + ".tmp", mpath)
        return pa.table(
            {"shard": [sh], "n_docs": [m["n_docs"]], "n_bytes": [m["n_bytes"]]},
            schema=_M_SCHEMA,
        )

    out = (
        read_pruned(src, ["doc_id", "lang", "source", "text"])
        .map_batches(doc_rows, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(write_shard, batch_format="pandas")
        .to_pandas()
    )
    out = out[out["n_docs"] > 0]
    return (out.sort_values("shard").reset_index(drop=True)
            .astype({"shard": "int64", "n_docs": "int64", "n_bytes": "int64"}))


def global_shuffle(sf_dir: str, n_shards: int = 16, seed: int = 0) -> pd.DataFrame:
    """(doc_id, shard, pos) — the deterministic seeded GLOBAL SHUFFLE that
    fixes a training run's data order (the step between curation and the
    shard export): every document gets a shard and a dense 0-based position
    within it by rank of ``key = splitmix64(doc_id XOR mix(seed))``.  Pure
    hash, no RNG state — the same seed yields the identical permutation on
    any worker count, rerun, or the DuckDB oracle; a different seed is a
    fresh permutation (locked by pytest).

    Scale shape: doc_id is the ONLY column read; one vectorized map emits
    (doc_id, shard, key) rows and ONE shard-keyed all-to-all ranks each
    shard in-group (np.lexsort on (key, doc_id) — doc_id breaks the
    ~2^-64 hash-collision tie deterministically).  Shard groups carry ids
    only (~24 B/row); at cluster scale n_shards is chosen a few x the
    worker count — the same knob the training job's shard count already is
    — so each group fits one worker.  Composing the actual text movement is
    ``export_jsonl_shards``'s one text all-to-all with ``pos`` as the
    in-shard sort key instead of doc_id.
    """
    from .dedup import _mix64, _mix64_int
    from .io import read_pruned

    seed_mix = np.uint64(_mix64_int(int(seed)))

    _K_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("shard", pa.int64()), ("k", pa.int64())]
    )

    def keyed(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        h = _mix64(ids.astype(np.uint64) ^ seed_mix)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "shard": pa.array((h % np.uint64(n_shards)).astype(np.int64),
                               pa.int64()),
             # uint64 key bit-cast for transport; rank() restores the view
             "k": pa.array(h.view(np.int64), pa.int64())},
            schema=_K_SCHEMA,
        )

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        h = g["k"].to_numpy().view(np.uint64)
        ids = g["doc_id"].to_numpy()
        order = np.lexsort((ids, h))
        pos = np.empty(len(ids), np.int64)
        pos[order] = np.arange(len(ids), dtype=np.int64)
        return pd.DataFrame({"doc_id": ids, "shard": g["shard"].to_numpy(),
                             "pos": pos})

    out = (
        read_pruned(_os.path.join(sf_dir, "documents.parquet"), ["doc_id"])
        .map_batches(keyed, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(rank, batch_format="pandas")
        .to_pandas()
    )
    return (out.sort_values("doc_id").reset_index(drop=True)
            [["doc_id", "shard", "pos"]]
            .astype({"doc_id": "int64", "shard": "int64", "pos": "int64"}))


# golden-ratio constant for the order-sensitive export signature
_SIG_GOLD = 0x9E3779B97F4A7C15
_SIG_MASK63 = (1 << 63) - 1


def export_shuffled_shards(sf_dir: str, out_dir: str | None = None,
                           n_shards: int = 16, seed: int = 0) -> pd.DataFrame:
    """(shard, n_docs, n_bytes, order_sig) — :func:`global_shuffle` APPLIED:
    publish the corpus as partitioned JSONL in the seeded global-shuffle
    order (shard = key % n_shards, lines ordered by in-shard key rank), the
    exact artifact a training run streams.  Same resumable-sink contract as
    :func:`export_jsonl_shards` (atomic tmp+rename, per-shard manifest,
    finished shards skipped by a size+count check).

    ``order_sig`` makes the manifest ORDER-SENSITIVE where byte count alone
    is not: xor-fold of ``splitmix64(doc_id XOR (rank+1)*GOLD) & (2^63-1)``
    over the shard's rows in written order — any reordering, drop, or swap
    changes it, and the DuckDB oracle recomputes it exactly (ROW_NUMBER +
    the shared splitmix64/mul64 SQL builders).

    Scale shape: ONE shard-keyed all-to-all of full doc rows (text moves
    once — the shuffle IS the export); the key is computed in the same
    vectorized map that tags the shard, so no join back to the order op.
    """
    import hashlib
    import json

    from .dedup import _mix64, _mix64_int
    from .io import read_pruned

    src = _os.path.join(sf_dir, "documents.parquet")
    if out_dir is None:
        st = _os.stat(src)
        key = hashlib.md5(
            f"{_os.path.abspath(src)}|{st.st_mtime_ns}|{st.st_size}|"
            f"shuffled|{n_shards}|{seed}".encode()
        ).hexdigest()[:16]
        out_dir = _os.path.join("/tmp", "engine_shuffled_shards", key)
    _os.makedirs(out_dir, exist_ok=True)

    seed_mix = np.uint64(_mix64_int(int(seed)))

    _U_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("lang", pa.string()), ("source", pa.string()),
         ("text", pa.string()), ("shard", pa.int64()), ("k", pa.int64())]
    )

    def doc_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        h = _mix64(ids.astype(np.uint64) ^ seed_mix)
        return pa.table(
            {"doc_id": t["doc_id"], "lang": t["lang"], "source": t["source"],
             "text": t["text"],
             "shard": pa.array((h % np.uint64(n_shards)).astype(np.int64),
                               pa.int64()),
             "k": pa.array(h.view(np.int64), pa.int64())},
            schema=_U_SCHEMA,
        )

    _M_SCHEMA = pa.schema(
        [("shard", pa.int64()), ("n_docs", pa.int64()),
         ("n_bytes", pa.int64()), ("order_sig", pa.int64())]
    )

    def write_shard(g: pd.DataFrame) -> pa.Table:
        sh = int(g["shard"].iloc[0])
        final = _os.path.join(out_dir, f"shard={sh}")
        fpath = _os.path.join(final, "part.jsonl")
        mpath = _os.path.join(final, "manifest.json")
        if _os.path.exists(mpath):           # finished shard: stat-only resume
            with open(mpath) as f:
                m = json.load(f)
            try:
                if _os.stat(fpath).st_size == m["n_bytes"]:
                    return pa.table(
                        {"shard": [sh], "n_docs": [m["n_docs"]],
                         "n_bytes": [m["n_bytes"]],
                         "order_sig": [m["order_sig"]]}, schema=_M_SCHEMA)
            except OSError:
                pass
        h = g["k"].to_numpy().view(np.uint64)
        order = np.lexsort((g["doc_id"].to_numpy(), h))
        g = g.iloc[order]
        ids = g["doc_id"].to_numpy().astype(np.uint64)
        rank1 = np.arange(1, len(g) + 1, dtype=np.uint64)
        sig = int(np.bitwise_xor.reduce(
            _mix64(ids ^ (rank1 * np.uint64(_SIG_GOLD))))
            & np.uint64(_SIG_MASK63)) if len(g) else 0
        lines = []
        for did, lang, srcv, txt in zip(
                g["doc_id"].to_numpy(), g["lang"], g["source"], g["text"]):
            assert json.dumps(txt) == f'"{txt}"', "non-trivial JSON escape"
            lines.append(
                f'{{"doc_id":{int(did)},"lang":"{lang}",'
                f'"source":"{srcv}","text":"{txt}"}}\n')
        payload = "".join(lines).encode()
        _os.makedirs(final, exist_ok=True)
        tmp = fpath + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        _os.replace(tmp, fpath)
        m = {"shard": sh, "n_docs": len(g), "n_bytes": len(payload),
             "order_sig": sig}
        with open(mpath + ".tmp", "w") as f:
            json.dump(m, f)
        _os.replace(mpath + ".tmp", mpath)
        return pa.table(
            {"shard": [sh], "n_docs": [m["n_docs"]],
             "n_bytes": [m["n_bytes"]], "order_sig": [sig]},
            schema=_M_SCHEMA,
        )

    out = (
        read_pruned(src, ["doc_id", "lang", "source", "text"])
        .map_batches(doc_rows, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(write_shard, batch_format="pandas")
        .to_pandas()
    )
    out = out[out["n_docs"] > 0]
    return (out.sort_values("shard").reset_index(drop=True)
            .astype({"shard": "int64", "n_docs": "int64",
                     "n_bytes": "int64", "order_sig": "int64"}))


def dataset_split_assign_ds(sf_dir: str, seed: int = 0):
    """Per-doc (doc_id, split) assignment Dataset for composition — see
    :func:`dataset_split_assign` for the split rule."""
    from .dedup import _mix64, _mix64_int
    from .io import read_pruned

    seed_mix = np.uint64(_mix64_int(int(seed)))
    _S = pa.schema([("doc_id", pa.int64()), ("split", pa.string())])
    names = np.array(["test", "valid", "train"])

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        b = (_mix64(ids.astype(np.uint64) ^ seed_mix)
             % np.uint64(1000)).astype(np.int64)
        code = np.where(b < 10, 0, np.where(b < 20, 1, 2))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "split": pa.array(names[code], pa.string())},
                        schema=_S)

    return (read_pruned(sf_dir if sf_dir.endswith(".parquet")
                        else _os.path.join(sf_dir, "documents.parquet"),
                        ["doc_id"])
            .map_batches(assign, batch_format="pyarrow"))


def dataset_split_assign(sf_dir: str, seed: int = 0) -> pd.DataFrame:
    """(split, n_docs, n_tokens, n_chars) — the deterministic hash-based
    train/valid/test partition every training pipeline needs before export:
    ``bucket = splitmix64(doc_id XOR mix(seed)) mod 1000``; bucket < 10 →
    test (1%), < 20 → valid (1%), else train.  Pure hash, no RNG state —
    the same seed yields the identical partition at any worker count,
    on any rerun, and in the DuckDB oracle (shared splitmix64 SQL builder);
    a new seed is a fresh partition.  Unlike row-number splits, membership
    is stable under corpus growth: an existing doc never migrates when new
    docs arrive (the property that keeps eval sets honest across recrawls).

    Scale shape: map-only — each block reduces to <= 3 integer partial
    rows (doc / token / char sums per split), driver reduce is 3-row.
    The per-doc assignment composes via :func:`dataset_split_assign_ds`.
    """
    import pyarrow.compute as pc

    from .dedup import _mix64, _mix64_int
    from .io import read_pruned

    seed_mix = np.uint64(_mix64_int(int(seed)))
    _P = pa.schema([("code", pa.int64()), ("n_docs", pa.int64()),
                    ("n_tokens", pa.int64()), ("n_chars", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        if not len(ids):
            return pa.table({"code": pa.array([], pa.int64()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "n_chars": pa.array([], pa.int64())}, schema=_P)
        b = (_mix64(ids.astype(np.uint64) ^ seed_mix)
             % np.uint64(1000)).astype(np.int64)
        code = np.where(b < 10, 0, np.where(b < 20, 1, 2))
        ntok = pc.cast(pc.count_substring_regex(t["text"], r"\S+"),
                       pa.int64()).to_numpy()
        nchr = pc.cast(pc.utf8_length(t["text"]), pa.int64()).to_numpy()
        st = np.zeros(3, np.int64)
        sc = np.zeros(3, np.int64)
        np.add.at(st, code, ntok)  # pure int64 sums (no float weights)
        np.add.at(sc, code, nchr)
        return pa.table(
            {"code": pa.array(np.arange(3, dtype=np.int64)),
             "n_docs": pa.array(np.bincount(code, minlength=3)
                                .astype(np.int64)),
             "n_tokens": pa.array(st),
             "n_chars": pa.array(sc)}, schema=_P)

    red = (read_pruned(_os.path.join(sf_dir, "documents.parquet"),
                       ["doc_id", "text"])
           .map_batches(partial, batch_format="pyarrow")
           .to_pandas()
           .groupby("code", as_index=False)[["n_docs", "n_tokens", "n_chars"]]
           .sum())
    names = {0: "test", 1: "valid", 2: "train"}
    red["split"] = red["code"].map(names)
    red = red[red["n_docs"] > 0]
    return (red[["split", "n_docs", "n_tokens", "n_chars"]]
            .sort_values("split").reset_index(drop=True)
            .astype({"n_docs": "int64", "n_tokens": "int64",
                     "n_chars": "int64"}))


CAP_PER_SOURCE_K = 10


def cap_per_source(sf_dir: str, k: int = CAP_PER_SOURCE_K) -> pd.DataFrame:
    """(doc_id, source) — at most ``k`` documents KEPT per source, chosen by
    deterministic hash priority (smallest ``splitmix64(doc_id)`` wins, ties
    to the lower doc_id): the C4/RefinedWeb-style per-domain cap that stops
    one boilerplate-heavy domain from dominating the training mix.  A pure
    hash test, so any worker, any rerun, and the oracle keep the IDENTICAL
    subset, and a grown corpus only ever evicts by priority — never
    reshuffles survivors randomly.

    Scale shape: each batch first reduces ITSELF to its local top-k per
    source (a combinable partial — the event_path_counts idiom), so the one
    coarse source-hash bucket exchange carries <= k rows per (block,
    source), never the corpus; each bucket group re-ranks its sources'
    survivors vectorized.  Works at web scale where sources are unbounded
    domains (no driver-side source table).
    """
    import hashlib as _hashlib

    import pyarrow.compute as pc

    from .dedup import _mix64
    from .io import read_pruned

    ds = read_pruned(_os.path.join(sf_dir, "documents.parquet"),
                     ["doc_id", "source"])
    N_BUCKETS = 64

    _ROW = pa.schema([("doc_id", pa.int64()), ("source", pa.string()),
                      ("pr", pa.uint64()), ("bucket", pa.int32())])

    def local_topk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        pr = _mix64(ids.astype(np.uint64))
        d = pd.DataFrame({"doc_id": ids, "source": t["source"].to_pandas(),
                          "pr": pr})
        d = (d.sort_values(["source", "pr", "doc_id"], kind="mergesort")
             .groupby("source", sort=False).head(k))
        bucket = np.array(
            [int.from_bytes(_hashlib.md5(s.encode()).digest()[:4], "big")
             % N_BUCKETS for s in d["source"]], dtype=np.int32)
        return pa.table({"doc_id": pa.array(d["doc_id"].to_numpy(), pa.int64()),
                         "source": pa.array(d["source"], pa.string()),
                         "pr": pa.array(d["pr"].to_numpy(), pa.uint64()),
                         "bucket": pa.array(bucket, pa.int32())},
                        schema=_ROW)

    _OUT = pa.schema([("doc_id", pa.int64()), ("source", pa.string())])

    def resolve(g: pd.DataFrame) -> pa.Table:
        d = (g.sort_values(["source", "pr", "doc_id"], kind="mergesort")
             .groupby("source", sort=False).head(k))
        return pa.Table.from_pandas(
            d[["doc_id", "source"]], schema=_OUT,
            preserve_index=False).replace_schema_metadata(None)

    out = (ds.map_batches(local_topk, batch_format="pyarrow")
           .groupby("bucket")
           .map_groups(resolve, batch_format="pandas")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)
