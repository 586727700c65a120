"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are treated as opaque ``binary`` columns with a
typed metadata struct, processed by actor-pool ``map_batches`` stages (the
decode libraries are loaded once per actor in ``__init__``).  The decode
libraries (PIL / torchaudio / ffmpeg) are NOT in this container, so the
codec step is stubbed: ``DecodeStage`` raises ``NotImplementedError`` unless
a library import succeeds, and ``FakeDecodeStage`` substitutes a
deterministic metadata derivation so the Ray-side plumbing — schema, batch
sizing for large payloads, actor signature, output layout — is real and
tested end-to-end.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("payload", pa.binary()),       # opaque encoded bytes
        pa.field("media_type", pa.string()),    # image | audio | video
        pa.field("n_bytes", pa.int64()),
    ]
)

FEATURES_DIM = 16


class DecodeStage:
    """Real decode stage (actor pool): import-gated, stubbed in this container.

    Usage at scale::

        ds.map_batches(DecodeStage, concurrency=(2, 8), batch_size=32,
                       num_cpus=1, batch_format="pyarrow")

    Small ``batch_size`` on purpose: payload rows are large, and batch x
    concurrency must fit the worker heap (ray_guide 'Memory-aware').
    """

    def __init__(self):
        try:
            import PIL.Image  # noqa: F401  (not present in this container)

            self._pil = PIL.Image
        except ImportError:
            self._pil = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._pil is None:
            raise NotImplementedError(
                "image codec not available in this environment; "
                "use FakeDecodeStage for plumbing tests"
            )
        raise NotImplementedError("real decode path requires PIL; see FakeDecodeStage")


class FakeDecodeStage:
    """Deterministic decode stand-in: metadata derived from payload bytes.

    width/height/duration are pure functions of the payload so results are
    identical across runs, partitionings and retries — the invariant the real
    decode stage must also satisfy.
    """

    def __init__(self):
        pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, durations = [], [], []
        for payload in batch["payload"].to_pylist():
            h = hashlib.blake2b(payload, digest_size=8).digest()
            widths.append(64 + (int.from_bytes(h[:2], "big") % 1024))
            heights.append(64 + (int.from_bytes(h[2:4], "big") % 1024))
            durations.append(int.from_bytes(h[4:6], "big") % 600)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "n_bytes": batch["n_bytes"],
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "duration_s": pa.array(durations, pa.int32()),
            }
        )


class FeatureStage:
    """Deterministic feature extraction: payload bytes -> FEATURES_DIM floats.

    Stands in for batched model inference (model load would live in
    ``__init__``, once per actor)."""

    def __init__(self, dim: int = FEATURES_DIM):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            h = hashlib.blake2b(payload, digest_size=2 * self.dim).digest()
            vec = np.frombuffer(h, dtype=np.uint16).astype(np.float32) / 65535.0
            feats.append(vec.tolist())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def media_table_from_documents(sf_dir: str):
    """Synthesize a media table from documents (payload = utf-8 text bytes).

    Gives the multimodal stages a deterministic binary payload column without
    external data; media_type cycles deterministically by doc_id.
    """
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])

    types = ("image", "audio", "video")

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = [s.encode("utf-8") for s in t["text"].to_pylist()]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "media_type": pa.array([types[i % 3] for i in ids], pa.string()),
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            }
        )

    return ds.map_batches(build, batch_format="pyarrow")


def media_metadata(sf_dir: str) -> pd.DataFrame:
    """media_id, media_type, n_bytes, width, height, duration_s via FakeDecodeStage.

    Actor-pool stage with small batches (large-payload discipline); rows-only
    for the driver except the SQL-expressible columns (n_bytes = octet_length).
    """
    ds = media_table_from_documents(sf_dir)
    out = (
        ds.map_batches(
            FakeDecodeStage,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=2,
        )
        .to_pandas()
    )
    return out.sort_values("media_id").reset_index(drop=True)


def media_sizes(sf_dir: str) -> pd.DataFrame:
    """media_id, media_type, n_bytes — the SQL-checkable slice of the media table."""
    out = (
        media_table_from_documents(sf_dir)
        .map_batches(
            lambda t: t.select(["media_id", "media_type", "n_bytes"]),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    return out.sort_values("media_id").reset_index(drop=True)


def media_features(sf_dir: str) -> pd.DataFrame:
    """media_id + 16-dim deterministic feature vector (model-inference stand-in)."""
    ds = media_table_from_documents(sf_dir)
    out = (
        ds.map_batches(
            FeatureStage,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=2,
        )
        .to_pandas()
    )
    return out.sort_values("media_id").reset_index(drop=True)
