"""Conformance: distributed engine == sequential oracle (SURVEY.md §5.2-§5.4).

The three north-star invariants on the same seed list + politeness budget:
(a) crawl ordering, (b) final URL-seen set, (c) byte-identical extracted text
per url — plus counters and deterministic resume from checkpoint.
"""

import json
import os
import shutil
from glob import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

BUDGET = {"max_urls_total": 400, "max_per_host_per_round": 6, "max_depth": 6, "max_rounds": 10}


@pytest.fixture(scope="module")
def crawl_pair(small_corpus, tmp_path_factory):
    """Run oracle + engine once on the shared corpus; reuse across asserts."""
    from engine.crawl import crawl
    from engine.oracle import crawl_oracle

    corpus_dir, _cfg = small_corpus
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    oracle = crawl_oracle(corpus_dir, BUDGET)
    engine = crawl(corpus_dir, ckpt, BUDGET)
    return corpus_dir, oracle, engine


def test_crawl_order_matches(crawl_pair):
    _c, oracle, engine = crawl_pair
    got = engine.order_table().to_pylist()
    want = oracle["order"]
    assert len(got) == len(want) and len(got) > 50
    for a, b in zip(got, want):
        assert (a["fetch_seq"], a["url"]) == (b["fetch_seq"], b["url"])
        assert (a["depth"], a["priority"], a["discovery_seq"]) == (
            b["depth"], b["priority"], b["discovery_seq"],
        )


def test_seen_set_matches(crawl_pair):
    _c, oracle, engine = crawl_pair
    assert set(engine.seen_hashes().tolist()) == oracle["seen_hashes"]


def test_counters_match_per_round(crawl_pair):
    _c, oracle, engine = crawl_pair
    assert engine.cumulative == oracle["cumulative"]
    for r, want in enumerate(oracle["round_counters"]):
        with open(os.path.join(engine.ckpt_dir, f"round={r}", "counters.json")) as f:
            meta = json.load(f)
        assert meta["counters"] == want, f"round {r}"
        assert meta["parent_round"] == r - 1


def test_extracted_text_byte_identical(crawl_pair):
    corpus_dir, oracle, engine = crawl_pair
    golden = {}
    for f in glob(os.path.join(corpus_dir, "pages", "bucket=*", "*.parquet")):
        t = pq.read_table(f, columns=["url", "text"])
        golden.update(zip(t["url"].to_pylist(), t["text"].to_pylist()))
    docs = engine.docs_dataset().to_pandas()
    hits = docs[docs.status == "hit"]
    assert len(hits) == engine.cumulative["fetched"]
    for u, m in zip(hits.url, hits.markdown):
        assert golden[u] == m, u
        assert oracle["docs"][u] == m, u


def test_retry_and_failure_coverage(crawl_pair):
    """Dead links exist in the corpus, so the retry path must actually run."""
    _c, oracle, _e = crawl_pair
    assert oracle["cumulative"]["retried"] > 0
    assert oracle["cumulative"]["failed"] >= 0
    assert oracle["cumulative"]["deduped"] > 0


def test_robots_blocking_fires(small_corpus, tmp_path):
    """A seed pointing into a disallowed host must be robots-blocked, not fetched."""
    from engine.crawl import crawl
    from engine.oracle import crawl_oracle

    corpus_dir, _cfg = small_corpus
    variant = tmp_path / "corpus_robots"
    variant.mkdir()
    os.symlink(os.path.join(corpus_dir, "pages"), variant / "pages")
    for f in ("robots.parquet", "budget.parquet", "_corpus.json"):
        shutil.copy(os.path.join(corpus_dir, f), variant / f)
    pq.write_table(
        pa.table({
            "url": pa.array([
                "https://h13.example.test/d0/p1.html",   # fully disallowed host
                "https://h7.example.test/d3/p2.html",    # disallowed prefix
                "https://h7.example.test/d2/p3.html",    # allowed (may 404)
            ]),
            "priority": pa.array([0, 0, 0], pa.int32()),
        }),
        variant / "seeds.parquet",
    )
    budget = {"max_urls_total": 10, "max_per_host_per_round": 4, "max_depth": 1, "max_rounds": 2}
    oracle = crawl_oracle(str(variant), budget)
    engine = crawl(str(variant), str(tmp_path / "ckpt"), budget)
    assert oracle["cumulative"]["robots_blocked"] == 2
    assert engine.cumulative == oracle["cumulative"]


def test_distributed_selection_path_matches_oracle(small_corpus, tmp_path, monkeypatch):
    """Force the salted distributed selection branch and re-check conformance.

    (The driver-side branch handles budget-bounded small rounds; this pins the
    large-frontier path to the same oracle.)
    """
    import engine.crawl as crawl_mod
    from engine.oracle import crawl_oracle

    monkeypatch.setattr(crawl_mod, "SMALL_FRONTIER_ROWS", 0)
    corpus_dir, _cfg = small_corpus
    budget = {"max_urls_total": 150, "max_per_host_per_round": 5, "max_depth": 5, "max_rounds": 6}
    oracle = crawl_oracle(corpus_dir, budget)
    engine = crawl_mod.crawl(corpus_dir, str(tmp_path / "ckpt_dist"), budget)
    assert engine.cumulative == oracle["cumulative"]
    got = engine.order_table().to_pylist()
    assert [(r["fetch_seq"], r["url"]) for r in got] == [
        (r["fetch_seq"], r["url"]) for r in oracle["order"]
    ]
    assert set(engine.seen_hashes().tolist()) == oracle["seen_hashes"]


def test_hot_host_skew_distributed_path(tmp_path, ray_session, monkeypatch):
    """Extreme host skew (4 hosts, ~40% on the hot one) through the salted
    distributed selection; engine == oracle on order + counters."""
    import engine.crawl as crawl_mod
    from engine.oracle import crawl_oracle
    from engine.synth import CorpusConfig, generate_corpus

    monkeypatch.setattr(crawl_mod, "SMALL_FRONTIER_ROWS", 0)
    corpus = str(tmp_path / "skew_corpus")
    generate_corpus(corpus, CorpusConfig(n_pages=300, n_hosts=4, n_buckets=4, with_golden=False), use_ray=False)
    budget = {"max_urls_total": 200, "max_per_host_per_round": 4, "max_depth": 5, "max_rounds": 8}
    oracle = crawl_oracle(corpus, budget)
    engine = crawl_mod.crawl(corpus, str(tmp_path / "ckpt_skew"), budget)
    assert engine.cumulative == oracle["cumulative"]
    got = engine.order_table().to_pylist()
    assert [(x["fetch_seq"], x["url"]) for x in got] == [
        (x["fetch_seq"], x["url"]) for x in oracle["order"]
    ]


def test_resume_reproduces_uninterrupted_run(small_corpus, tmp_path):
    from engine.crawl import crawl

    corpus_dir, _cfg = small_corpus
    a = str(tmp_path / "ckpt_a")
    b = str(tmp_path / "ckpt_b")
    full = crawl(corpus_dir, a, BUDGET)
    crawl(corpus_dir, b, BUDGET, stop_after_round=2)     # simulated kill
    resumed = crawl(corpus_dir, b, BUDGET)               # resume from round 3
    assert resumed.cumulative == full.cumulative
    x = full.order_table().to_pylist()
    y = resumed.order_table().to_pylist()
    assert [(r["fetch_seq"], r["url"]) for r in x] == [(r["fetch_seq"], r["url"]) for r in y]
    assert set(full.seen_hashes().tolist()) == set(resumed.seen_hashes().tolist())


def test_resume_refuses_config_mismatch(small_corpus, tmp_path):
    from engine.crawl import crawl

    corpus_dir, _cfg = small_corpus
    ck = str(tmp_path / "ckpt")
    crawl(corpus_dir, ck, BUDGET, stop_after_round=1)
    with pytest.raises(ValueError, match="different config"):
        crawl(corpus_dir, ck, {**BUDGET, "max_urls_total": 999})


def _write_mini_corpus(root, pages: dict, seeds: list, n_buckets: int = 4):
    """Hand-built corpus dir (pages: url -> html str; seeds: [(url, prio)])."""
    from engine.canonicalize import url_hash64
    from engine.synth import PAGES_SCHEMA

    os.makedirs(os.path.join(root, "pages"), exist_ok=True)
    per_bucket = {b: [] for b in range(n_buckets)}
    for u, h in pages.items():
        per_bucket[url_hash64(u) % n_buckets].append((u, h))
    for b in range(n_buckets):
        bdir = os.path.join(root, "pages", f"bucket={b}")
        os.makedirs(bdir, exist_ok=True)
        rows = per_bucket[b]
        t = pa.table(
            {
                "url": pa.array([u for u, _ in rows], pa.string()),
                "warc_ts": pa.array([0] * len(rows), pa.timestamp("us")),
                "html": pa.array([h.encode() for _, h in rows], pa.binary()),
                "text": pa.array([""] * len(rows), pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
            },
            schema=PAGES_SCHEMA,
        )
        pq.write_table(t, os.path.join(bdir, "part-0.parquet"))
    pq.write_table(
        pa.table(
            {
                "url": pa.array([u for u, _ in seeds], pa.string()),
                "priority": pa.array([p for _, p in seeds], pa.int32()),
            }
        ),
        os.path.join(root, "seeds.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "host": pa.array([], pa.string()),
                "disallow_prefixes": pa.array([], pa.list_(pa.string())),
                "crawl_delay_ms": pa.array([], pa.int64()),
            }
        ),
        os.path.join(root, "robots.parquet"),
    )
    with open(os.path.join(root, "_corpus.json"), "w") as f:
        json.dump({"cache_key": "mini", "cfg": {"n_buckets": n_buckets}}, f)
    return root


def test_over_stride_links_conformance(tmp_path, ray_session, monkeypatch):
    """A page with more links than SEQ_STRIDE: the spec truncates at STRIDE
    canonicalized links per page (engine AND oracle), so child discovery_seq
    values stay unique and the distributed selection has no partition-order
    ties.  (ADVICE r1: links past #1023 used to share one seq.)"""
    import engine.crawl as crawl_mod
    from engine.frontier import SEQ_STRIDE
    from engine.oracle import crawl_oracle

    n_links = SEQ_STRIDE + 476  # 1500
    targets = [f"https://h{1 + (i % 2)}.bigfan.test/d0/p{i}.html" for i in range(n_links)]
    seed_url = "https://h0.bigfan.test/d0/seed.html"
    html = (
        "<html><body><nav>"
        + "".join(f'<a href="{t}">l</a>' for t in targets)
        + "</nav></body></html>"
    )
    pages = {seed_url: html}
    for t in targets[:1200]:  # some targets past the stride exist: they must
        pages[t] = "<html><body></body></html>"  # still never be crawled
    corpus = _write_mini_corpus(str(tmp_path / "corpus"), pages, [(seed_url, 0)])

    monkeypatch.setattr(crawl_mod, "SMALL_FRONTIER_ROWS", 0)  # distributed branch
    budget = {
        "max_urls_total": 2000,
        "max_per_host_per_round": 600,
        "max_depth": 2,
        "max_rounds": 4,
    }
    oracle = crawl_oracle(corpus, budget)
    engine = crawl_mod.crawl(corpus, str(tmp_path / "ckpt"), budget)

    got = engine.order_table().to_pylist()
    want = oracle["order"]
    assert [(x["fetch_seq"], x["url"]) for x in got] == [
        (x["fetch_seq"], x["url"]) for x in want
    ]
    assert engine.cumulative == oracle["cumulative"]
    assert set(engine.seen_hashes().tolist()) == oracle["seen_hashes"]
    # truncation actually engaged: exactly SEQ_STRIDE children admitted
    crawled = {x["url"] for x in got}
    assert not crawled & set(targets[SEQ_STRIDE:])
    assert set(targets[:SEQ_STRIDE]) <= crawled
    # and every discovery_seq in the order is unique (the determinism invariant)
    seqs = [(x["host"], x["depth"], x["priority"], x["discovery_seq"]) for x in got]
    assert len(seqs) == len(set(seqs))


def test_lazy_frontier_handoff_engages_and_matches(small_corpus, tmp_path, monkeypatch):
    """Past SMALL_FRONTIER_ROWS the per-round handoff must be the LAZY
    read_parquet handle — the driver never materializes the frontier
    (VERDICT r3 "what's wrong" #2) — and a kill+resume THROUGH a lazy
    handoff reproduces the uninterrupted run bit-identically."""
    import engine.crawl as crawl_mod
    from engine.oracle import crawl_oracle

    monkeypatch.setattr(crawl_mod, "SMALL_FRONTIER_ROWS", 0)
    corpus_dir, _cfg = small_corpus
    budget = {"max_urls_total": 150, "max_per_host_per_round": 5, "max_depth": 5, "max_rounds": 6}

    kinds = []
    orig = crawl_mod._frontier_handle

    def spy(cm, r):
        h = orig(cm, r)
        kinds.append(type(h).__name__)
        return h

    monkeypatch.setattr(crawl_mod, "_frontier_handle", spy)

    full = crawl_mod.crawl(corpus_dir, str(tmp_path / "a"), budget)
    assert "_LazyFrontier" in kinds  # the lazy path actually carried rounds
    oracle = crawl_oracle(corpus_dir, budget)
    assert full.cumulative == oracle["cumulative"]

    b = str(tmp_path / "b")
    crawl_mod.crawl(corpus_dir, b, budget, stop_after_round=1)  # simulated kill
    resumed = crawl_mod.crawl(corpus_dir, b, budget)  # resume enters via lazy handle
    assert resumed.cumulative == full.cumulative
    assert resumed.order_table().to_pylist() == full.order_table().to_pylist()
    assert set(resumed.seen_hashes().tolist()) == set(full.seen_hashes().tolist())


def test_distributed_schedule_finalize_matches_oracle(small_corpus, tmp_path, monkeypatch):
    """Force the DISTRIBUTED schedule finalize (sorted blocks + prefix-sum
    rank offsets) on every round and re-check full conformance: the driver
    never holds the candidate set, yet fetch_seq numbering, the seen set,
    per-round counters and the extracted text are bit-identical to the
    sequential oracle.  Also proves the layout actually switched (schedule
    parts in round=R/selected/, no driver-written selected.parquet) and that
    a kill+resume THROUGH a distributed round reproduces the full run."""
    import engine.crawl as crawl_mod
    from engine.oracle import crawl_oracle

    monkeypatch.setattr(crawl_mod, "SMALL_FRONTIER_ROWS", 0)
    monkeypatch.setattr(crawl_mod, "SMALL_SELECT_ROWS", 0)
    corpus_dir, _cfg = small_corpus
    budget = {"max_urls_total": 150, "max_per_host_per_round": 5, "max_depth": 5, "max_rounds": 6}
    oracle = crawl_oracle(corpus_dir, budget)
    a = str(tmp_path / "ckpt_dsf")
    engine = crawl_mod.crawl(corpus_dir, a, budget)
    assert engine.cumulative == oracle["cumulative"]
    got = engine.order_table().to_pylist()
    assert [(x["fetch_seq"], x["url"]) for x in got] == [
        (x["fetch_seq"], x["url"]) for x in oracle["order"]
    ]
    assert set(engine.seen_hashes().tolist()) == oracle["seen_hashes"]
    # the distributed layout engaged: schedule parts, not a driver table
    dist_rounds = [
        r for r in range(engine.rounds)
        if os.path.isdir(os.path.join(a, f"round={r}", "selected"))
    ]
    assert dist_rounds, "distributed finalize never engaged"
    for r in dist_rounds:
        assert not os.path.exists(os.path.join(a, f"round={r}", "selected.parquet"))
        assert not os.path.exists(os.path.join(a, f"round={r}", "seen_delta.parquet"))
    # tight budget: truncation fires mid-round, overflow rows spill into the
    # round's deferred parquet parts (never a driver table) and the oracle
    # still matches exactly
    tight = dict(budget, max_urls_total=25)
    t_oracle = crawl_oracle(corpus_dir, tight)
    t_dir = str(tmp_path / "ckpt_dsf_tight")
    t_engine = crawl_mod.crawl(corpus_dir, t_dir, tight)
    assert t_engine.cumulative == t_oracle["cumulative"]
    assert t_engine.cumulative["attempted"] == 25
    assert [(x["fetch_seq"], x["url"]) for x in t_engine.order_table().to_pylist()] == [
        (x["fetch_seq"], x["url"]) for x in t_oracle["order"]
    ]
    overflow_parts = glob(os.path.join(t_dir, "round=*", "frontier_deferred", "overflow_*.parquet"))
    assert overflow_parts, "budget overflow never spilled distributed"

    # kill after round 1, resume through distributed rounds: bit-identical
    b = str(tmp_path / "ckpt_dsf_resume")
    crawl_mod.crawl(corpus_dir, b, budget, stop_after_round=1)
    resumed = crawl_mod.crawl(corpus_dir, b, budget)
    assert resumed.cumulative == engine.cumulative
    assert resumed.order_table().to_pylist() == engine.order_table().to_pylist()
    assert set(resumed.seen_hashes().tolist()) == set(engine.seen_hashes().tolist())
