"""Property-based crawl-spec tests (SURVEY.md §5.3).

Random link graphs (cycles, duplicate links, cross-host edges, dead links)
checked against INDEPENDENT graph-theory invariants — not just
engine-vs-oracle agreement:

- with an unconstrained budget, the fetched set == the BFS-reachable set
  within max_depth (computed by a plain set/queue BFS, no crawl machinery);
- fetched ⊆ reachable always, at any politeness budget;
- fetch_seq is a permutation of 0..n-1 and rounds are monotone;
- counters are self-consistent (attempted == fetched+retried+failed, etc.).
"""

from collections import deque

from hypothesis import given, settings, strategies as st

from engine.canonicalize import canonicalize, url_hash64
from engine.oracle import crawl_oracle_from_state
from engine.politeness import RobotsRules


def _url(h: int, i: int) -> str:
    return f"https://h{h}.t/p{i}.html"


@st.composite
def link_graphs(draw):
    n_hosts = draw(st.integers(2, 4))
    n_pages = draw(st.integers(3, 25))
    hosts = draw(st.lists(st.integers(0, n_hosts - 1), min_size=n_pages, max_size=n_pages))
    edges = {}
    for i in range(n_pages):
        deg = draw(st.integers(0, 4))
        targets = draw(st.lists(st.integers(0, n_pages + 3), min_size=deg, max_size=deg))
        edges[i] = targets  # targets >= n_pages are dead links
    n_seeds = draw(st.integers(1, min(3, n_pages)))
    seed_ids = draw(
        st.lists(st.integers(0, n_pages - 1), min_size=n_seeds, max_size=n_seeds, unique=True)
    )
    return hosts, edges, seed_ids, n_pages


def _build_pages(hosts, edges, n_pages):
    pages = {}
    for i in range(n_pages):
        links = "".join(
            f'<a href="{_url(hosts[t] if t < n_pages else 0, t)}">x</a>\n'
            for t in edges[i]
        )
        html = f"<html><body><nav>\n{links}</nav></body></html>".encode()
        pages[_url(hosts[i], i)] = html
    return pages


def _bfs_reachable(hosts, edges, seed_ids, n_pages, max_depth):
    seen = set()
    q = deque((s, 0) for s in seed_ids)
    while q:
        node, d = q.popleft()
        if node in seen or node >= n_pages:
            continue
        seen.add(node)
        if d < max_depth:
            for t in edges[node]:
                if t not in seen:
                    q.append((t, d + 1))
    return {_url(hosts[i], i) for i in seen}


@settings(max_examples=40, deadline=None)
@given(link_graphs())
def test_unconstrained_crawl_fetches_exactly_reachable(graph):
    hosts, edges, seed_ids, n_pages = graph
    pages = _build_pages(hosts, edges, n_pages)
    seeds = [(_url(hosts[s], s), 0) for s in seed_ids]
    budget = {
        "max_urls_total": 10_000,
        "max_per_host_per_round": 10_000,
        "max_depth": 6,
        "max_rounds": 64,
    }
    res = crawl_oracle_from_state(pages, seeds, RobotsRules({}), budget)
    fetched = set(res["docs"].keys())
    assert fetched == _bfs_reachable(hosts, edges, seed_ids, n_pages, 6)


@settings(max_examples=40, deadline=None)
@given(link_graphs(), st.integers(1, 3), st.integers(2, 6))
def test_budgeted_crawl_subset_and_consistent(graph, k, rounds):
    hosts, edges, seed_ids, n_pages = graph
    pages = _build_pages(hosts, edges, n_pages)
    seeds = [(_url(hosts[s], s), 0) for s in seed_ids]
    budget = {
        "max_urls_total": 12,
        "max_per_host_per_round": k,
        "max_depth": 4,
        "max_rounds": rounds,
    }
    res = crawl_oracle_from_state(pages, seeds, RobotsRules({}), budget)
    fetched = set(res["docs"].keys())
    assert fetched <= _bfs_reachable(hosts, edges, seed_ids, n_pages, 4)
    cum = res["cumulative"]
    assert cum["attempted"] == cum["fetched"] + cum["retried"] + cum["failed"]
    assert cum["attempted"] <= 12
    seqs = [r["fetch_seq"] for r in res["order"]]
    assert seqs == list(range(len(seqs)))  # dense, monotone fetch order
    rounds_seen = [r["round"] for r in res["order"]]
    assert rounds_seen == sorted(rounds_seen)
    # a retried url is attempted twice but seen once — unless the crawl ends
    # before the queued re-attempt runs, so seen is bounded, not exact:
    assert cum["attempted"] - cum["retried"] <= len(res["seen_hashes"]) <= cum["attempted"]
    # every fetched url's hash is in the seen set
    for u in fetched:
        assert url_hash64(canonicalize(u)) in res["seen_hashes"]


@settings(max_examples=20, deadline=None)
@given(link_graphs())
def test_robots_full_disallow_blocks_host(graph):
    hosts, edges, seed_ids, n_pages = graph
    pages = _build_pages(hosts, edges, n_pages)
    seeds = [(_url(hosts[s], s), 0) for s in seed_ids]
    robots = RobotsRules({"h0.t": ["/"]})
    budget = {
        "max_urls_total": 10_000,
        "max_per_host_per_round": 10_000,
        "max_depth": 6,
        "max_rounds": 64,
    }
    res = crawl_oracle_from_state(pages, seeds, robots, budget)
    assert not any(u.startswith("https://h0.t/") for u in res["docs"])
