"""Per-host politeness: robots gating + rate limiting (SURVEY.md §0, §2.1 S7).

The reference's politeness is emergent — strictly sequential requests, one in
flight (``SharePointClient.cs:201-342``); its only gate is the title
allow-list semi-join (``SharePointClient.cs:272-275``).  The engine makes both
explicit:

- ``RobotsRules``: per-host disallow-prefix matching (broadcast once via
  ``ray.put``, evaluated vectorized-per-batch inside ``map_batches`` — the
  same broadcast-small-side pattern as the reference's allow-list).
- per-host round budget ``max_per_host_per_round`` — the BSP analog of
  one-request-at-a-time (enforced in ``engine.frontier``).
- ``TokenBucket``: a wall-clock per-host rate limiter honouring
  ``crawl_delay_ms`` for real deployments; disabled in tests/bench (the
  sandbox "fetch" is a parquet lookup, so sleeping would only measure sleep).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow.parquet as pq


class RobotsRules:
    """Host -> disallowed path prefixes. A '/' prefix disallows the host entirely."""

    def __init__(self, rules: dict):
        self.rules = {h: tuple(p) for h, p in rules.items()}

    @classmethod
    def from_parquet(cls, path: str) -> "RobotsRules":
        t = pq.read_table(path, columns=["host", "disallow_prefixes"])
        return cls(
            {
                h: list(p)
                for h, p in zip(t["host"].to_pylist(), t["disallow_prefixes"].to_pylist())
            }
        )

    def blocked(self, host: str, path: str) -> bool:
        for prefix in self.rules.get(host, ()):
            if path.startswith(prefix):
                return True
        return False

    def blocked_many(self, hosts, paths) -> np.ndarray:
        """Batch evaluation; rules dict lookups amortized across the batch."""
        out = np.zeros(len(hosts), dtype=bool)
        rules = self.rules
        for i, (h, p) in enumerate(zip(hosts, paths)):
            for prefix in rules.get(h, ()):
                if p.startswith(prefix):
                    out[i] = True
                    break
        return out


class TokenBucket:
    """Per-host token bucket honouring crawl_delay_ms (1 token per delay).

    Held inside a fetcher actor (state survives across batches); ``acquire``
    blocks until a token is available.  Deterministic tests use
    ``now=`` injection instead of wall clock.
    """

    def __init__(self, delay_ms: int, burst: int = 1):
        self.interval = max(delay_ms, 0) / 1000.0
        self.burst = max(1, burst)
        self.tokens = float(self.burst)
        self.last = None

    def _refill(self, now: float):
        if self.last is None:
            self.last = now
            return
        if self.interval > 0:
            self.tokens = min(self.burst, self.tokens + (now - self.last) / self.interval)
        else:
            self.tokens = self.burst
        self.last = now

    def try_acquire(self, now: float) -> bool:
        self._refill(now)
        if self.tokens >= 1.0:
            self.tokens -= 1.0
            return True
        return False

    def acquire(self, now_fn=time.monotonic, sleep_fn=time.sleep):
        while not self.try_acquire(now_fn()):
            wait = (1.0 - self.tokens) * self.interval
            sleep_fn(min(wait, 0.05))
