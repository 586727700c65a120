"""Per-round crawl checkpoints: lineage, counters, deterministic resume.

The reference has NO checkpointing — a restart is a full recrawl
(SURVEY.md §4.1).  The engine checkpoints every BSP round so a killed run
resumes from the last complete round with identical results (north-rule
requirement: "resumable from checkpoint with per-partition lineage +
metrics").

Layout (all writes atomic: files first, ``_SUCCESS`` marker last)::

    ckpt_dir/
      round=R/
        selected.parquet       # the round's fetch schedule (order table rows)
        frontier_next.parquet  # candidates entering round R+1
        seen_delta.parquet     # url hashes attempted in round R (seen-set delta)
        counters.json          # round + cumulative counters, lineage
        _SUCCESS

The seen set is persisted as per-round *deltas*: resume rebuilds shard state
as the union of deltas of rounds <= R (O(total urls) read once, instead of
O(total) rewritten every round).  ``counters.json`` carries lineage
(``parent_round``, ``config_hash``) so a resume against a different corpus or
budget is refused instead of silently diverging.
"""

from __future__ import annotations

import hashlib
import json
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

COUNTER_KEYS = (
    "attempted",
    "fetched",
    "deduped",
    "robots_blocked",
    "filtered",
    "retried",
    "failed",
    "deferred",
)


def config_hash(cfg: dict) -> str:
    return hashlib.blake2b(
        json.dumps(cfg, sort_keys=True).encode(), digest_size=8
    ).hexdigest()


def selected_files(ckpt_dir: str, r: int) -> list:
    """Parquet files holding round r's fetch schedule, whichever layout the
    round used: a single driver-written ``selected.parquet`` (budget-small
    rounds) or the ``selected/`` part directory written by the distributed
    schedule finalize (the driver never held those rows)."""
    rd_ = os.path.join(ckpt_dir, f"round={r}")
    p = os.path.join(rd_, "selected.parquet")
    if os.path.exists(p):
        return [p]
    d = os.path.join(rd_, "selected")
    if os.path.isdir(d):
        return sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        )
    return []


class CheckpointManager:
    def __init__(self, ckpt_dir: str, cfg: dict):
        self.dir = ckpt_dir
        self.cfg_hash = config_hash(cfg)
        os.makedirs(ckpt_dir, exist_ok=True)

    def _round_dir(self, r: int) -> str:
        return os.path.join(self.dir, f"round={r}")

    def latest_complete_round(self) -> int:
        """Highest round with a _SUCCESS marker and matching lineage, else -1."""
        best = -1
        if not os.path.isdir(self.dir):
            return best
        for name in os.listdir(self.dir):
            m = re.fullmatch(r"round=(\d+)", name)
            if not m:
                continue
            r = int(m.group(1))
            rd = self._round_dir(r)
            if not os.path.exists(os.path.join(rd, "_SUCCESS")):
                continue
            with open(os.path.join(rd, "counters.json")) as f:
                meta = json.load(f)
            if meta.get("config_hash") != self.cfg_hash:
                raise ValueError(
                    f"checkpoint round {r} was written by a different config "
                    f"({meta.get('config_hash')} != {self.cfg_hash}); refusing to resume"
                )
            best = max(best, r)
        return best

    def write_round(
        self,
        r: int,
        selected: pa.Table | None,
        frontier_next: pa.Table,
        seen_delta: np.ndarray | None,
        counters: dict,
        cumulative: dict,
        phases: dict | None = None,
        errors: pa.Table | None = None,
        rss_mb: float | None = None,
    ):
        """``selected=None`` means the round used the DISTRIBUTED schedule
        finalize: the schedule parts are already on disk in
        ``round=R/selected/`` and the seen delta IS their url_hash column —
        the driver never held either, so nothing is (re)written here."""
        rd = self._round_dir(r)
        os.makedirs(rd, exist_ok=True)
        success = os.path.join(rd, "_SUCCESS")
        if os.path.exists(success):  # idempotent rewrite of a complete round
            os.remove(success)
        sel_dir = os.path.join(rd, "selected")
        if selected is not None:
            if os.path.isdir(sel_dir):  # stale distributed layout from a rerun
                import shutil

                shutil.rmtree(sel_dir)
            pq.write_table(selected, os.path.join(rd, "selected.parquet"))
            pq.write_table(
                pa.table(
                    {
                        "url_hash": pa.array(
                            np.asarray(seen_delta, dtype=np.int64), pa.int64()
                        )
                    }
                ),
                os.path.join(rd, "seen_delta.parquet"),
            )
        else:
            if not os.path.isdir(sel_dir):
                raise ValueError(
                    f"write_round(selected=None) but no schedule parts at {sel_dir}"
                )
            for stale in ("selected.parquet", "seen_delta.parquet"):
                p = os.path.join(rd, stale)
                if os.path.exists(p):
                    os.remove(p)
        pq.write_table(frontier_next, os.path.join(rd, "frontier_next.parquet"))
        if errors is not None and errors.num_rows:
            # Errors are rows, never side effects (SURVEY.md §2.1 S5 — the
            # engine analog of ErrorLogger.cs's TSV, queryable per round).
            pq.write_table(errors, os.path.join(rd, "errors.parquet"))
        with open(os.path.join(rd, "counters.json"), "w") as f:
            json.dump(
                {
                    "round": r,
                    "parent_round": r - 1,
                    "config_hash": self.cfg_hash,
                    "counters": counters,
                    "cumulative": cumulative,
                    "phase_sec": phases or {},
                    "driver_rss_mb": rss_mb,
                },
                f,
            )
        with open(success, "w") as f:
            f.write("ok")

    def read_counters(self, r: int) -> dict:
        with open(os.path.join(self._round_dir(r), "counters.json")) as f:
            return json.load(f)

    def frontier_files(self, r: int) -> list:
        """Parquet files holding round r's next frontier: the extras file
        (budget-overflow + retries) plus the distributed children and
        deferred parts (written by the explode / selection stages directly
        into the round dir — those rows never pass through the driver)."""
        rd = self._round_dir(r)
        files = []
        p = os.path.join(rd, "frontier_next.parquet")
        if os.path.exists(p):
            files.append(p)
        for sub in ("frontier_children", "frontier_deferred"):
            cdir = os.path.join(rd, sub)
            if os.path.isdir(cdir):
                files.extend(
                    sorted(
                        os.path.join(cdir, f)
                        for f in os.listdir(cdir)
                        if f.endswith(".parquet")
                    )
                )
        return files

    def frontier_next_rows(self, r: int) -> int:
        """Row count of round r's next frontier from parquet FOOTERS only —
        the large-round handoff decision must not read the data (the whole
        point is that at 10^10 rows the driver never materializes it)."""
        return sum(pq.ParquetFile(f).metadata.num_rows for f in self.frontier_files(r))

    def read_frontier_next(self, r: int) -> pa.Table:
        files = self.frontier_files(r)
        if not files:
            from .frontier import FRONTIER_SCHEMA

            return FRONTIER_SCHEMA.empty_table()
        # strip any writer metadata: downstream from_arrow blocks must carry
        # hashable (metadata-free) schemas or Ray's schema dedup logs a
        # warning per task
        return pa.concat_tables(
            [pq.read_table(f).replace_schema_metadata(None) for f in files],
            promote_options="default",
        )

    def read_selected(self, r: int) -> pa.Table:
        files = selected_files(self.dir, r)
        if not files:
            raise FileNotFoundError(f"no schedule for round {r} in {self.dir}")
        return pa.concat_tables([pq.read_table(f) for f in files])

    def seen_hashes_through(self, r: int) -> np.ndarray:
        parts = []
        for i in range(r + 1):
            p = os.path.join(self._round_dir(i), "seen_delta.parquet")
            if os.path.exists(p):
                parts.append(pq.read_table(p)["url_hash"].to_numpy())
            else:  # distributed round: the schedule's url_hash IS the delta
                for f in selected_files(self.dir, i):
                    parts.append(
                        pq.read_table(f, columns=["url_hash"])["url_hash"].to_numpy()
                    )
        return np.concatenate(parts) if parts else np.zeros(0, dtype=np.int64)

    def order_table_through(self, r: int) -> pa.Table:
        tables = [self.read_selected(i) for i in range(r + 1)]
        return pa.concat_tables(tables) if tables else None


def _schema_fingerprint(schema: pa.Schema) -> str:
    return hashlib.blake2b(
        schema.remove_metadata().serialize().to_pybytes(), digest_size=8
    ).hexdigest()


def write_docs_manifest(round_docs_dir: str, expected_rows: int) -> dict:
    """Per-round docs-sink manifest — the ``UploadResponse`` validation
    analog (``SharePointClient.cs:473-476``, ``UploadResponse.cs:8-19``):
    instead of trusting the write, record per-file row counts + a schema
    fingerprint (footer-metadata reads only) and check the total against
    the round's fetch schedule."""
    files = sorted(
        f for f in os.listdir(round_docs_dir) if f.endswith(".parquet")
    )
    per_file = {}
    schemas = set()
    total = 0
    for f in files:
        pf = pq.ParquetFile(os.path.join(round_docs_dir, f))
        per_file[f] = pf.metadata.num_rows
        total += pf.metadata.num_rows
        schemas.add(_schema_fingerprint(pf.schema_arrow))
    manifest = {
        "files": per_file,
        "total_rows": total,
        "expected_rows": expected_rows,
        "schema_fingerprints": sorted(schemas),
        "ok": total == expected_rows and len(schemas) <= 1,
    }
    with open(os.path.join(round_docs_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f)
    if not manifest["ok"]:
        raise ValueError(
            f"docs sink validation failed for {round_docs_dir}: "
            f"{total} rows written, {expected_rows} scheduled, "
            f"{len(schemas)} distinct schemas"
        )
    return manifest


def validate_docs_output(docs_dir: str) -> dict:
    """Re-validate every round's docs directory against its manifest
    (row counts from parquet footers + schema fingerprint + _SUCCESS-style
    ok flag).  Returns {round_dir: status}; raises on any mismatch."""
    results = {}
    for name in sorted(os.listdir(docs_dir)):
        rd = os.path.join(docs_dir, name)
        mp = os.path.join(rd, "_manifest.json")
        if not os.path.isdir(rd) or not os.path.exists(mp):
            continue
        with open(mp) as f:
            manifest = json.load(f)
        for fname, want_rows in manifest["files"].items():
            p = os.path.join(rd, fname)
            if not os.path.exists(p):
                raise ValueError(f"manifest file missing on disk: {p}")
            pf = pq.ParquetFile(p)
            if pf.metadata.num_rows != want_rows:
                raise ValueError(
                    f"row-count mismatch in {p}: {pf.metadata.num_rows} != {want_rows}"
                )
            if _schema_fingerprint(pf.schema_arrow) not in manifest["schema_fingerprints"]:
                raise ValueError(f"schema drift in {p}")
        extra = [
            f for f in os.listdir(rd)
            if f.endswith(".parquet") and f not in manifest["files"]
        ]
        if extra:
            raise ValueError(f"unmanifested parquet parts in {rd}: {extra}")
        results[name] = {"rows": manifest["total_rows"], "ok": True}
    return results


def metrics_summary(ckpt_dir: str):
    """Per-round metrics table from a checkpoint directory (the engine's
    analog of the reference's progress/metrics panes, SURVEY.md §2.1 S8 /
    §2.4 A3: processed counts and seconds-per-unit, but as queryable rows).
    """
    import pandas as pd

    rows = []
    for name in sorted(os.listdir(ckpt_dir)):
        m = re.fullmatch(r"round=(\d+)", name)
        if not m:
            continue
        p = os.path.join(ckpt_dir, name, "counters.json")
        if not os.path.exists(p):
            continue
        with open(p) as f:
            meta = json.load(f)
        total_sec = sum(meta.get("phase_sec", {}).values()) or None
        row = {"round": int(m.group(1)), **meta["counters"]}
        row["round_sec"] = round(total_sec, 3) if total_sec else None
        row["urls_per_sec"] = (
            round((row["attempted"] + row["deduped"]) / total_sec, 1) if total_sec else None
        )
        row["driver_rss_mb"] = meta.get("driver_rss_mb")
        rows.append(row)
    return pd.DataFrame(sorted(rows, key=lambda r: r["round"]))
