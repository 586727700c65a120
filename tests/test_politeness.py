"""Robots matching + token-bucket rate limiter tests (SURVEY.md §2.1/§4.2)."""

import numpy as np
import pytest

from engine.politeness import RobotsRules, TokenBucket


def test_robots_prefix_match():
    r = RobotsRules({"a.test": ["/d3", "/d4"], "b.test": ["/"], "c.test": []})
    assert r.blocked("a.test", "/d3/p1.html")
    assert r.blocked("a.test", "/d4/x")
    assert not r.blocked("a.test", "/d2/p1.html")
    assert r.blocked("b.test", "/anything")
    assert not r.blocked("c.test", "/d3/p1.html")
    assert not r.blocked("unknown.test", "/d3/p1.html")


def test_robots_batch():
    r = RobotsRules({"a.test": ["/d3"]})
    out = r.blocked_many(["a.test", "a.test", "b.test"], ["/d3/x", "/d1/x", "/d3/x"])
    assert out.tolist() == [True, False, False]


def test_robots_from_parquet(small_corpus):
    import os

    corpus_dir, cfg = small_corpus
    r = RobotsRules.from_parquet(os.path.join(corpus_dir, "robots.parquet"))
    assert r.blocked("h13.example.test", "/d0/p1.html")   # full disallow
    assert r.blocked("h7.example.test", "/d3/p1.html")    # d3+ prefixes
    assert not r.blocked("h7.example.test", "/d2/p1.html")
    assert not r.blocked("h0.example.test", "/d3/p1.html")


def test_token_bucket_deterministic():
    tb = TokenBucket(delay_ms=100, burst=1)
    assert tb.try_acquire(0.0)
    assert not tb.try_acquire(0.05)   # only 50ms elapsed
    assert tb.try_acquire(0.101)      # refilled
    assert not tb.try_acquire(0.102)


def test_token_bucket_zero_delay():
    tb = TokenBucket(delay_ms=0)
    assert all(tb.try_acquire(t) for t in np.linspace(0, 1, 50))


def test_token_bucket_reserve():
    tb = TokenBucket(delay_ms=100, burst=1)
    assert tb.reserve(1, 0.0) == 0.0            # first request free (burst)
    assert tb.reserve(2, 0.0) == pytest.approx(0.2)  # two more: 200ms debt
    assert tb.reserve(1, 0.25) == pytest.approx(0.05)  # debt partially repaid


def test_rate_limited_crawl_slower_but_identical(small_corpus, tmp_path):
    """enforce_delays=True: same results, wall clock respects crawl_delay_ms."""
    import time

    from engine.crawl import crawl

    corpus_dir, _cfg = small_corpus
    budget = {"max_urls_total": 40, "max_per_host_per_round": 8, "max_depth": 3, "max_rounds": 3}
    fast = crawl(corpus_dir, str(tmp_path / "fast"), budget)
    t0 = time.time()
    slow = crawl(corpus_dir, str(tmp_path / "slow"), budget, enforce_delays=True)
    elapsed = time.time() - t0
    assert slow.cumulative == fast.cumulative
    a = [(r["fetch_seq"], r["url"]) for r in fast.order_table().to_pylist()]
    b = [(r["fetch_seq"], r["url"]) for r in slow.order_table().to_pylist()]
    assert a == b
    # the corpus assigns every host >=100ms crawl delay; with ~8 fetches on
    # the busiest host the enforced run must have slept a noticeable amount
    assert elapsed > 0.5
