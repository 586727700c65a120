"""Sequential reference-semantics crawl oracle (SURVEY.md §5.2).

A single-process, dict-and-loop implementation of EXACTLY the crawl spec in
``engine.crawl``'s docstring — the conformance baseline the distributed
engine must match on (a) crawl order, (b) final URL-seen set, (c) per-url
extracted text, (d) counters.  It is the analog of the reference's strictly
sequential traversal (``SharePointClient.cs:201-342``): no Ray, no
partitioning, no batching; any divergence between engine and oracle is a
parallelism bug by construction.

Per-round order of operations (both sides, in this order):
robots gate -> seen filter (retry bypass) -> in-round dedup (winner = min
(depth, priority, discovery_seq), winner inherits max retry) -> per-host
politeness top-k -> global order (host, depth, priority, discovery_seq) ->
global-budget truncation -> fetch (miss => one retry next round) -> link
expansion (depth-gated) -> seen += attempted.
"""

from __future__ import annotations

import os
from glob import glob

import pyarrow.parquet as pq

from .canonicalize import canonicalize, host_of, path_of, url_hash64
from .checkpoint import COUNTER_KEYS
from .extract import extract_document
from .frontier import SEQ_STRIDE, child_discovery_seq
from .politeness import RobotsRules, UrlGate
from .synth import default_budget


def load_pages(corpus_dir: str) -> dict:
    """url -> html bytes for the whole corpus (oracle scale only)."""
    pages = {}
    for f in sorted(glob(os.path.join(corpus_dir, "pages", "bucket=*", "*.parquet"))):
        t = pq.read_table(f, columns=["url", "html"])
        for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            pages[u] = h
    return pages


def _order_key(c: dict):
    return (c["depth"], c["priority"], c["discovery_seq"])


def _global_key(c: dict):
    return (c["host"], c["depth"], c["priority"], c["discovery_seq"])


def crawl_oracle(
    corpus_dir: str, budget: dict | None = None, filters: dict | None = None
) -> dict:
    """Corpus-directory entry: load pages/robots/seeds, then run the spec."""
    pages = load_pages(corpus_dir)
    robots = RobotsRules.from_parquet(os.path.join(corpus_dir, "robots.parquet"))
    seeds_t = pq.read_table(os.path.join(corpus_dir, "seeds.parquet"))
    seeds = list(zip(seeds_t["url"].to_pylist(), seeds_t["priority"].to_pylist()))
    return crawl_oracle_from_state(pages, seeds, robots, budget, filters)


def crawl_oracle_from_state(
    pages: dict,
    seeds: list,
    robots: RobotsRules,
    budget: dict | None = None,
    filters: dict | None = None,
) -> dict:
    """State-level entry (pages: url->html bytes; seeds: [(url, priority)]).

    Used directly by property-based tests that generate random link graphs
    without materializing a corpus directory.
    """
    budget = dict(budget or default_budget())
    gate = UrlGate.from_config(filters)
    k = int(budget["max_per_host_per_round"])
    max_rounds = int(budget["max_rounds"])
    max_total = int(budget["max_urls_total"])
    max_depth = int(budget["max_depth"])

    frontier = []
    for i, (u, p) in enumerate(seeds):
        cu = canonicalize(u)
        if cu is None:
            continue
        frontier.append(
            {
                "url": cu,
                "host": host_of(cu),
                "path": path_of(cu),
                "depth": 0,
                "priority": int(p),
                "discovery_seq": i,
                "retry": 0,
            }
        )

    seen: set = set()
    order_rows: list = []
    docs: dict = {}
    round_counters: list = []
    cumulative = {key: 0 for key in COUNTER_KEYS}

    r = 0
    while r < max_rounds:
        if not frontier or cumulative["attempted"] >= max_total:
            break
        counters = {key: 0 for key in COUNTER_KEYS}

        # robots gate, then allow/deny/extension gate (same precedence as engine)
        survivors = []
        for c in frontier:
            if robots.blocked(c["host"], c["path"]):
                counters["robots_blocked"] += 1
            elif gate.filtered(c["url"], c["path"]):
                counters["filtered"] += 1
            else:
                survivors.append(c)

        # seen filter (retry bypass)
        unseen = []
        for c in survivors:
            if c["retry"] == 0 and url_hash64(c["url"]) in seen:
                counters["deduped"] += 1
            else:
                unseen.append(c)

        # in-round dedup: winner = min order key; winner inherits max retry
        by_url: dict = {}
        for c in unseen:
            prev = by_url.get(c["url"])
            if prev is None:
                by_url[c["url"]] = dict(c)
            else:
                counters["deduped"] += 1
                if _order_key(c) < _order_key(prev):
                    merged = dict(c)
                    merged["retry"] = max(c["retry"], prev["retry"])
                    by_url[c["url"]] = merged
                else:
                    prev["retry"] = max(c["retry"], prev["retry"])

        # per-host politeness top-k
        by_host: dict = {}
        for c in by_url.values():
            by_host.setdefault(c["host"], []).append(c)
        selected, deferred = [], []
        for host, items in by_host.items():
            items.sort(key=_order_key)
            selected.extend(items[:k])
            deferred.extend(items[k:])

        # global order + budget truncation
        selected.sort(key=_global_key)
        remaining = max_total - cumulative["attempted"]
        if len(selected) > remaining:
            deferred.extend(selected[remaining:])
            selected = selected[:remaining]

        counters["attempted"] = len(selected)
        counters["deferred"] = len(deferred)

        # fetch + extract + expand
        children, retries = [], []
        offset = cumulative["attempted"]
        for i, c in enumerate(selected):
            fetch_seq = offset + i
            html = pages.get(c["url"])
            status = "hit" if html is not None else "miss"
            order_rows.append(
                {
                    "fetch_seq": fetch_seq,
                    "url": c["url"],
                    "host": c["host"],
                    "depth": c["depth"],
                    "priority": c["priority"],
                    "discovery_seq": c["discovery_seq"],
                    "retry": c["retry"],
                    "round": r,
                    "status": status,
                }
            )
            if html is None:
                if c["retry"] == 0:
                    counters["retried"] += 1
                    rc = dict(c)
                    rc["retry"] = 1
                    retries.append(rc)
                else:
                    counters["failed"] += 1
                continue
            counters["fetched"] += 1
            d = extract_document(html, c["url"])
            docs[c["url"]] = d["markdown"]
            if c["depth"] < max_depth:
                # j counts CANONICALIZED links (matching the engine's links
                # list position) and truncates at SEQ_STRIDE per page, so
                # child discovery_seq values are unique and the total order
                # is free of scheduling-dependent ties.
                j = 0
                for href in d["hrefs"]:
                    if j >= SEQ_STRIDE:
                        break
                    cu = canonicalize(href, base=c["url"])
                    if cu is None:
                        continue
                    children.append(
                        {
                            "url": cu,
                            "host": host_of(cu),
                            "path": path_of(cu),
                            "depth": c["depth"] + 1,
                            "priority": c["priority"],
                            "discovery_seq": child_discovery_seq(fetch_seq, j),
                            "retry": 0,
                        }
                    )
                    j += 1

        for c in selected:
            seen.add(url_hash64(c["url"]))

        for key in COUNTER_KEYS:
            if key != "deferred":
                cumulative[key] += counters[key]
        cumulative["deferred"] = counters["deferred"]
        round_counters.append(counters)

        frontier = children + deferred + retries
        r += 1

    return {
        "order": order_rows,
        "seen_hashes": set(seen),
        "docs": docs,
        "round_counters": round_counters,
        "cumulative": cumulative,
        "rounds": r,
    }
