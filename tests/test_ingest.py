"""Ingest-chunk composition tests: the IngestChunk field surface over a real
crawl (VERDICT r1 next-round #5)."""

import re

import numpy as np
import pytest


@pytest.fixture(scope="module")
def chunks_and_docs(small_corpus, tmp_path_factory):
    from engine.crawl import crawl
    from engine.ingest import chunks_dataset

    corpus_dir, _cfg = small_corpus
    budget = {"max_urls_total": 120, "max_per_host_per_round": 6, "max_depth": 4, "max_rounds": 6}
    res = crawl(corpus_dir, str(tmp_path_factory.mktemp("ckpt_ingest")), budget)
    docs = res.docs_dataset().to_pandas()
    chunks = chunks_dataset(res.docs_dir).to_pandas()
    return docs, chunks


def test_chunk_rows_cover_every_hit_doc(chunks_and_docs):
    docs, chunks = chunks_and_docs
    hits = docs[docs.status == "hit"]
    assert set(chunks["url"]) == set(hits["url"])
    # chunk_index contiguous from 0 per url
    for _url, g in chunks.groupby("url"):
        idx = sorted(g["chunk_index"])
        assert idx == list(range(len(idx)))


def test_chunk_category_and_keywords_match_standalone_ops(chunks_and_docs):
    """Per-chunk category/keywords == the standalone M11/M12 logic applied
    to the parent doc's markdown."""
    from engine.ingest import doc_category, doc_keywords
    from engine.ops.text import CATEGORY_PATTERNS, STOP_WORDS

    docs, chunks = chunks_and_docs
    hits = docs[docs.status == "hit"].set_index("url")
    seen_nondefault_cat = False
    for url, g in chunks.groupby("url"):
        md = hits.loc[url, "markdown"]
        # category: independent first-match evaluation
        want_cat = "General"
        for pat, label in CATEGORY_PATTERNS:
            if re.search(pat, md):
                want_cat = label
                break
        assert (g["category"] == want_cat).all(), url
        seen_nondefault_cat |= want_cat != "General"
        # keywords: independent counter
        from collections import Counter

        stop = set(STOP_WORDS)
        c = Counter(w for w in md.lower().split() if w and w not in stop)
        want_kw = [w for w, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]]
        for kws in g["keywords"]:
            assert list(kws) == want_kw, url
        assert doc_category(md) == want_cat
        assert doc_keywords(md) == want_kw
    assert seen_nondefault_cat  # the cascade actually fires on this corpus


def test_chunk_metadata_matches_doc_header(chunks_and_docs):
    """The open metadata map rides every chunk and mirrors the doc's parsed
    header fields (M3: promoted title/header_doc + open map)."""
    docs, chunks = chunks_and_docs
    hits = docs[docs.status == "hit"].set_index("url")
    any_meta = False
    for url, g in chunks.groupby("url"):
        want = hits.loc[url, "metadata"]
        want_pairs = [tuple(p) if not isinstance(p, tuple) else p for p in want]
        for got in g["metadata"]:
            got_pairs = [tuple(p) for p in got]
            assert got_pairs == want_pairs, url
        any_meta |= len(want_pairs) > 0
        if want_pairs:
            keys = [k for k, _ in want_pairs]
            assert set(keys) <= {"doc", "eff", "rev", "org", "appr", "src"}
            assert hits.loc[url, "header_doc"] == dict(want_pairs).get("doc")
    assert any_meta  # SOP headers exist in the corpus, so maps are non-empty


def test_breadcrumb_tracks_headings():
    """On a handcrafted multi-chunk doc, each chunk's breadcrumb is the
    "title > latest ## heading" trail at its start token."""
    from engine.ingest import chunk_doc
    from engine.ops.text import TOKEN_CHUNK_SIZE, TOKEN_CHUNK_STEP

    filler_a = " ".join(f"a{i}" for i in range(300))
    filler_b = " ".join(f"b{i}" for i in range(300))
    filler_c = " ".join(f"c{i}" for i in range(300))
    md = "\n".join(
        [
            "# My Title",
            "## 1.0 First Section",
            filler_a,
            "## 2.0 Second Section",
            filler_b,
            "## 3.0 Third Section",
            filler_c,
        ]
    )
    rows = chunk_doc("https://x/y.html", md, "My Title", [("doc", "D-1")])
    assert len(rows) > 2
    toks = md.split()
    # reconstruct the expected crumb at each chunk start
    section_of = []
    cur = None
    pos_heads = []
    pos = 0
    for line in md.split("\n"):
        if line.startswith("## "):
            cur = line[3:].strip()
        pos_heads.append((pos, cur))
        pos += len(line.split())
    for r in rows:
        s = r["chunk_index"] * TOKEN_CHUNK_STEP
        want_sec = None
        for p, c in pos_heads:
            if p <= s:
                want_sec = c
        want = "My Title" + (f" > {want_sec}" if want_sec else "")
        assert r["breadcrumb"] == want, (r["chunk_index"], r["breadcrumb"], want)
        assert r["chunk"] == " ".join(toks[s : s + TOKEN_CHUNK_SIZE])
        assert r["metadata"] == [("doc", "D-1")]
    # later chunks actually advanced past the first section
    assert rows[-1]["breadcrumb"].endswith("3.0 Third Section")
