"""SeenShard / SeenSet actor tests (SURVEY.md §2.7 D1, §7.4)."""

import numpy as np
import pytest


@pytest.fixture()
def seen_set(ray_session):
    import uuid

    from engine.seen import SeenSet

    s = SeenSet(3, name_prefix=f"seen_test_{uuid.uuid4().hex[:6]}", bloom_bits=1 << 16)
    yield s
    import ray

    for sh in s.shards:
        ray.kill(sh)


def test_no_false_negatives_and_exactness(seen_set):
    rng = np.random.default_rng(7)
    added = rng.integers(0, 2**62, size=5000, dtype=np.int64)
    other = rng.integers(0, 2**62, size=5000, dtype=np.int64)
    other = np.setdiff1d(other, added)
    seen_set.add_many(added)
    assert seen_set.check_many(added).all()          # no false negatives
    assert not seen_set.check_many(other).any()      # exact (bloom FPs confirmed away)


def test_add_idempotent(seen_set):
    h = np.arange(100, dtype=np.int64)
    seen_set.add_many(h)
    seen_set.add_many(h)  # retry-safe
    stats = seen_set.stats()
    assert sum(s["n_exact"] for s in stats) == 100


def test_empty_batch(seen_set):
    assert seen_set.check_many(np.zeros(0, dtype=np.int64)).shape == (0,)


def test_sharding_partitions_by_hash(seen_set):
    h = np.arange(300, dtype=np.int64)
    seen_set.add_many(h)
    stats = seen_set.stats()
    assert len(stats) == 3
    assert all(s["n_exact"] == 100 for s in stats)


def test_dump_roundtrip(seen_set):
    h = np.array([5, 17, 92], dtype=np.int64)
    seen_set.add_many(h)
    assert set(seen_set.dump_all().tolist()) == {5, 17, 92}
