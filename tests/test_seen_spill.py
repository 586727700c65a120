"""SpillSeenShard tests: exactness with forced spills/compaction, bounded
resident state at 10^7 hashes, and crawl conformance with the backend live
(VERDICT r1 next-round #6)."""

import uuid

import numpy as np
import pytest


@pytest.fixture()
def shard(ray_session, tmp_path):
    import ray

    from engine.seen import SpillSeenShard

    s = SpillSeenShard.options(name=f"spill_{uuid.uuid4().hex[:6]}").remote(
        0, str(tmp_path / "spill"), spill_threshold=500, max_runs=3
    )
    yield s
    ray.kill(s)


def test_exact_across_spills_and_compaction(shard, ray_session):
    """Adds crossing many spill boundaries + compactions stay exact."""
    import ray

    rng = np.random.default_rng(5)
    added = np.unique(rng.integers(1, 2**62, size=6000, dtype=np.int64))
    other = np.setdiff1d(rng.integers(1, 2**62, size=6000, dtype=np.int64), added)
    for i in range(0, len(added), 700):  # 700 > threshold/2: several spills
        ray.get(shard.add_many.remote(added[i : i + 700]))
    st = ray.get(shard.stats.remote())
    assert st["n_runs"] >= 1 and st["n_runs"] <= 3  # spilled AND compacted
    assert st["n_delta"] < 500
    assert ray.get(shard.check_many.remote(added)).all()
    assert not ray.get(shard.check_many.remote(other)).any()
    # dump returns the exact unique key set
    assert np.array_equal(ray.get(shard.dump.remote()), np.sort(added))


def test_add_idempotent_under_retry(shard, ray_session):
    import ray

    keys = np.arange(1, 1001, dtype=np.int64)
    ray.get(shard.add_many.remote(keys))
    ray.get(shard.add_many.remote(keys))  # simulated task retry
    assert ray.get(shard.check_many.remote(keys)).all()
    assert np.array_equal(ray.get(shard.dump.remote()), keys)


def test_bounded_state_at_1e7(ray_session, tmp_path):
    """10^7 hashes through one shard: the in-memory delta never exceeds the
    spill threshold and runs stay compacted — the structural memory bound
    (resident ~= bloom + threshold int64s, the rest on disk)."""
    import ray

    from engine.seen import SpillSeenShard

    thr = 1 << 20
    s = SpillSeenShard.options(name=f"spill_{uuid.uuid4().hex[:6]}").remote(
        0, str(tmp_path / "big"), spill_threshold=thr, max_runs=4
    )
    try:
        rng = np.random.default_rng(7)
        sample = None
        for i in range(10):
            batch = rng.integers(1, 2**62, size=1_000_000, dtype=np.int64)
            if sample is None:
                sample = batch[:1000].copy()
            ray.get(s.add_many.remote(batch))
            st = ray.get(s.stats.remote())
            assert st["n_delta"] < thr
            assert st["n_runs"] <= 4
        st = ray.get(s.stats.remote())
        assert st["n_added"] == 10_000_000
        assert st["run_bytes"] >= 8 * (10_000_000 - thr)  # bulk lives on disk
        assert ray.get(s.check_many.remote(sample)).all()
        absent = rng.integers(2**62, 2**63 - 1, size=10_000, dtype=np.int64)
        assert not ray.get(s.check_many.remote(absent)).any()
    finally:
        ray.kill(s)


def test_crawl_with_spill_backend_matches_oracle(small_corpus, tmp_path, ray_session):
    """The spill backend is a drop-in for the crawl loop (forced tiny
    threshold so spills happen during the run)."""
    import engine.seen as seen_mod
    from engine.crawl import crawl
    from engine.oracle import crawl_oracle

    corpus_dir, _cfg = small_corpus
    budget = {"max_urls_total": 250, "max_per_host_per_round": 6, "max_depth": 5, "max_rounds": 8}
    oracle = crawl_oracle(corpus_dir, budget)
    engine = crawl(
        corpus_dir, str(tmp_path / "ckpt_spill"), budget, seen_backend="spill"
    )
    assert engine.cumulative == oracle["cumulative"]
    got = engine.order_table().to_pylist()
    assert [(x["fetch_seq"], x["url"]) for x in got] == [
        (x["fetch_seq"], x["url"]) for x in oracle["order"]
    ]
    assert set(engine.seen_hashes().tolist()) == oracle["seen_hashes"]


def test_merge_sorted_runs_kernel(tmp_path):
    """The chunked k-way merge == plain concatenate+sort, with tiny chunks."""
    from engine.seen import _merge_sorted_runs

    rng = np.random.default_rng(9)
    paths = []
    alls = []
    for i in range(5):
        arr = np.sort(rng.integers(0, 10_000, size=rng.integers(0, 700), dtype=np.int64))
        p = str(tmp_path / f"run-{i}.npy")
        np.save(p, arr)
        paths.append(p)
        alls.append(arr)
    out = str(tmp_path / "merged.npy")
    n = _merge_sorted_runs(paths, out, chunk=64)
    merged = np.load(out)
    want = np.sort(np.concatenate(alls))
    assert n == len(want)
    assert np.array_equal(merged, want)
