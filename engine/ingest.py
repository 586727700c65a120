"""Crawl -> ingest-chunk composition (S4 / ``RagIngestDocument`` analog).

The reference uploads each document as an ``IngestChunk`` payload carrying
Title, Category, Keywords, heading breadcrumbs, AllowedGroups and an
open-schema ExtraFields map (``Foundation/Models/IngestChunk.cs:12-65``;
category/keywords come back from the ingest service,
``IngestUploadResponse.cs:20-23``).  This module composes the engine's
standalone classify (M11) and stop-word keywording (M12) operators into the
crawl->chunks pipeline so each chunk row carries the full field surface:

    url, chunk_index, chunk, title, category, keywords(list<string>),
    breadcrumb, allowed_groups(list<string>), metadata(map<string,string>)

Chunking is the reference app's 350/80 token window (``MainForm.cs:92``);
category is the first-match regex cascade over the doc markdown
(``SharePointClient.cs:54-60``); keywords are the doc's top-k non-stopword
tokens (count desc, token asc — deterministic); the breadcrumb is the
"title > latest ## heading" trail at the chunk's first token (the heading
path the §6 state machine emitted into the markdown).
"""

from __future__ import annotations

import re
from bisect import bisect_right
from collections import Counter

import pyarrow as pa

from .ops.text import (
    CATEGORY_PATTERNS,
    STOP_WORDS,
    TOKEN_CHUNK_SIZE,
    TOKEN_CHUNK_STEP,
)

CHUNKS_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("chunk_index", pa.int64()),
        pa.field("chunk", pa.string()),
        pa.field("title", pa.string()),
        pa.field("category", pa.string()),
        pa.field("keywords", pa.list_(pa.string())),
        pa.field("breadcrumb", pa.string()),
        pa.field("allowed_groups", pa.list_(pa.string())),
        pa.field("metadata", pa.map_(pa.string(), pa.string())),
    ]
)

_CAT_COMPILED = tuple((re.compile(p), label) for p, label in CATEGORY_PATTERNS)
_STOP = frozenset(STOP_WORDS)

# The reference defaults AllowedGroups to a single catch-all group when the
# library carries no ACL metadata (IngestChunk.cs: AllowedGroups).
DEFAULT_ALLOWED_GROUPS = ("all",)

N_DOC_KEYWORDS = 5


def doc_category(markdown: str) -> str:
    """First-match category cascade (M11) applied to the doc markdown."""
    for rx, label in _CAT_COMPILED:
        if rx.search(markdown):
            return label
    return "General"


def doc_keywords(markdown: str, k: int = N_DOC_KEYWORDS) -> list:
    """Per-doc top-k non-stopword tokens, (count desc, token asc) — the
    per-document keywording the reference attaches to each ingest payload."""
    c = Counter(w for w in markdown.lower().split() if w and w not in _STOP)
    return [w for w, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]]


def _line_breadcrumbs(markdown: str):
    """(token_start_offsets, breadcrumbs) per markdown line.

    ``# `` lines set the title level; ``## `` lines set the section level;
    the breadcrumb at a token is "title > section" as of that line.
    """
    starts, crumbs = [], []
    pos = 0
    h1 = None
    h2 = None
    for line in markdown.split("\n"):
        if line.startswith("## "):
            h2 = line[3:].strip()
        elif line.startswith("# "):
            h1 = line[2:].strip()
            h2 = None
        starts.append(pos)
        crumbs.append(" > ".join(c for c in (h1, h2) if c))
        pos += len(line.split())
    return starts, crumbs


def chunk_doc(url: str, markdown: str, title, metadata_pairs) -> list:
    """All chunk rows (dicts matching CHUNKS_SCHEMA) for one crawled doc."""
    toks = markdown.split()
    n = len(toks)
    n_chunks = (
        1 if n <= TOKEN_CHUNK_SIZE
        else -(-(n - TOKEN_CHUNK_SIZE) // TOKEN_CHUNK_STEP) + 1
    )
    category = doc_category(markdown)
    keywords = doc_keywords(markdown)
    starts, crumbs = _line_breadcrumbs(markdown)
    rows = []
    for i in range(n_chunks):
        s = i * TOKEN_CHUNK_STEP
        crumb = crumbs[bisect_right(starts, s) - 1] if starts else ""
        rows.append(
            {
                "url": url,
                "chunk_index": i,
                "chunk": " ".join(toks[s : s + TOKEN_CHUNK_SIZE]),
                "title": title,
                "category": category,
                "keywords": keywords,
                "breadcrumb": crumb,
                "allowed_groups": list(DEFAULT_ALLOWED_GROUPS),
                "metadata": list(metadata_pairs or []),
            }
        )
    return rows


def chunk_batch(t: pa.Table) -> pa.Table:
    """map_batches stage: crawled docs block -> ingest-chunk rows block."""
    rows = []
    meta_col = t["metadata"].to_pylist() if "metadata" in t.schema.names else [None] * t.num_rows
    for url, status, md, title, meta in zip(
        t["url"].to_pylist(),
        t["status"].to_pylist(),
        t["markdown"].to_pylist(),
        t["title"].to_pylist(),
        meta_col,
    ):
        if status != "hit" or md is None:
            continue
        rows.extend(chunk_doc(url, md, title, meta))
    return pa.Table.from_pylist(rows, schema=CHUNKS_SCHEMA)


def chunks_dataset(docs_dir: str):
    """Lazy Dataset of ingest chunks over a crawl's docs directory."""
    import ray.data as rd

    ds = rd.read_parquet(
        docs_dir, columns=["url", "status", "markdown", "title", "metadata"]
    )
    return ds.map_batches(chunk_batch, batch_format="pyarrow", batch_size=256)
