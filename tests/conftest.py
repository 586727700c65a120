"""Shared fixtures. Ray is initialised ONCE per pytest session (driver contract)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory, ray_session):
    """A cached tiny corpus (400 pages, golden text) shared across tests."""
    from engine.synth import CorpusConfig, generate_corpus

    out = str(tmp_path_factory.mktemp("corpus"))
    cfg = CorpusConfig(n_pages=400, n_hosts=20, n_buckets=8)
    generate_corpus(out, cfg, use_ray=False)
    return out, cfg
