"""Robots matching + token-bucket rate limiter tests (SURVEY.md §2.1/§4.2)."""

import numpy as np

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
