"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1-§4).

Generates the ``pages`` table with EXACTLY the ``input_hint`` schema
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)`` plus the hash-bucket layout the fetch join relies on, and the
``seeds`` / ``robots`` / ``budget`` side tables.

Everything is a pure function of ``(seed, row_id)`` — page content, link
targets and layout never depend on generation order or partitioning, so the
corpus is identical whether generated serially or via Ray ``map_batches``.

The embedded link graph (FIXTURES.md §1): Zipf-skewed out-degree 0-8, ~70%
same-host / ~30% cross-host edges, cycles, duplicate links, dead links, and
href spellings that exercise canonicalization (relative, protocol-relative,
uppercase host, utm-noise + fragments).

The page bodies exercise every extractor path from SURVEY.md §2.3: repeated
per-page banners (P3), noise lines (P4), four SOP header-grid variants (P5 —
fold, inline, full-grid-with-title, org/approver name-split), numbered
headings (P8), Step/Responsibility/Action tables with wrapped rows (P9-P15),
and lowercase-continuation paragraph merging (P16).
"""

from __future__ import annotations

import json
import os
import random
from dataclasses import dataclass, asdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .extract import CHAR_WIDTH, _escape_html, extract_document
from .canonicalize import url_hash64

PAGE_HEIGHT = 792.0
LINE_STEP = 14.0
LEFT_MARGIN = 72.0
TABLE_ANCHORS = (72.0, 160.0, 300.0)

VOCAB = (
    "system process valve sensor gauge record operator ensure verify daily "
    "log report module panel safety check inspect pressure reading calibrate "
    "unit shift review manual status update control output input cycle limit "
    "batch sample result archive submit notify complete start stop reset hold"
).split()

_RESP = ("Operator", "Supervisor", "Technician")
_NOISE_POOL = (
    "This document contains proprietary information of Acme",
    "Uncontrolled if printed",
    "CUI//SP-PRIV basic",
    "Privacy Act data enclosed",
    "All rights reserved by Acme",
    "Page: {p} of {n}",
)

PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)


@dataclass(frozen=True)
class CorpusConfig:
    n_pages: int
    n_hosts: int = 50
    seed: int = 42
    n_buckets: int = 16
    max_path_depth: int = 6
    with_golden: bool = True  # compute the `text` golden column via extract()
    content_scale: int = 1    # multiplies sections/paragraphs per page; real
    #                           Common-Crawl pages are tens of KB, so benches
    #                           use >1 to get realistic per-page weight
    n_seed_hosts: int = 4     # seeds = first page of this many hosts (+1 dup)
    encoding: str = "html"    # page payload encoding: "html" | "pdf" |
    #                           "pdf_flate" (FlateDecode content streams) |
    #                           "pdf_xrefstream" (PDF 1.5 ObjStm + xref
    #                           stream layout) | "pdf_encrypted" (standard
    #                           security handler, rc4-40/rc4-128/aes-128
    #                           cycling per row) — same content either way
    #                           (build_page_content); extraction output is
    #                           byte-identical

    def cache_key(self) -> str:
        enc = "" if self.encoding == "html" else f"_e{self.encoding}"
        return (
            f"n{self.n_pages}_h{self.n_hosts}_s{self.seed}_b{self.n_buckets}"
            f"_d{self.max_path_depth}_g{int(self.with_golden)}_c{self.content_scale}"
            f"_sd{self.n_seed_hosts}{enc}"
        )


def host_name(k: int) -> str:
    return f"h{k}.example.test"


def build_assignment(cfg: CorpusConfig) -> dict:
    """Global per-row host/depth/lang assignment (seeded numpy; O(n) small arrays).

    Host popularity is Zipf(1.2) with host 0 forced to ~30% of pages (the hot
    host that must exercise the skew path, FIXTURES.md §1).
    """
    rng = np.random.default_rng(cfg.seed)
    k = np.arange(1, cfg.n_hosts, dtype=np.float64)
    w = 1.0 / np.power(k, 1.2)
    w = w / w.sum() * 0.70
    probs = np.concatenate([[0.30], w])
    probs = probs / probs.sum()
    host_idx = rng.choice(cfg.n_hosts, size=cfg.n_pages, p=probs).astype(np.int32)
    pdepth = rng.choice(
        cfg.max_path_depth + 1,
        size=cfg.n_pages,
        p=_depth_probs(cfg.max_path_depth),
    ).astype(np.int8)
    lang_draw = rng.random(cfg.n_pages)
    lang_idx = np.where(lang_draw < 0.95, 0, np.where(lang_draw < 0.975, 1, 2)).astype(np.int8)
    host_rows = [np.flatnonzero(host_idx == h).astype(np.int64) for h in range(cfg.n_hosts)]
    return {"host_idx": host_idx, "pdepth": pdepth, "lang_idx": lang_idx, "host_rows": host_rows}


def _depth_probs(max_depth: int) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, max_depth + 2, dtype=np.float64), 0.8)
    return w / w.sum()


_LANGS = ("en", "de", "fr")


def url_of(row_id: int, assign: dict) -> str:
    h = host_name(int(assign["host_idx"][row_id]))
    d = int(assign["pdepth"][row_id])
    return f"https://{h}/d{d}/p{row_id}.html"


# ---------------------------------------------------------------------------
# Per-page generation (pure in (seed, row_id))
# ---------------------------------------------------------------------------

def _pick_out_degree(rng: random.Random) -> int:
    # Zipf-skewed 0..8
    r = rng.random()
    for deg, cum in enumerate((0.18, 0.40, 0.58, 0.72, 0.82, 0.90, 0.95, 0.98, 1.01)):
        if r < cum:
            return deg
    return 8


def _link_targets(row_id: int, cfg: CorpusConfig, assign: dict, rng: random.Random) -> list:
    """Deterministic link targets: ~70% same-host, ~30% cross-host, some dead."""
    deg = _pick_out_degree(rng)
    my_host = int(assign["host_idx"][row_id])
    out = []
    for _ in range(deg):
        r = rng.random()
        if r < 0.08:  # dead link (404 analog)
            out.append(("dead", cfg.n_pages + rng.randrange(1000)))
        elif r < 0.78:
            rows = assign["host_rows"][my_host]
            out.append(("row", int(rows[rng.randrange(len(rows))])))
        else:
            out.append(("row", rng.randrange(cfg.n_pages)))
    if deg >= 2 and rng.random() < 0.25:  # duplicate link on one page
        out.append(out[0])
    return out


def _href_spelling(target_url: str, page_url: str, rng: random.Random) -> str:
    """Vary the href form to exercise canonicalization (M1/M2/M9/M10 analogs)."""
    form = rng.randrange(6)
    if form == 0:
        return target_url
    if form == 1:  # absolute-path relative href (same host only)
        t_host, _, t_path = target_url.split("//", 1)[1].partition("/")
        p_host = page_url.split("//", 1)[1].partition("/")[0]
        return "/" + t_path if t_host == p_host else target_url
    if form == 2:  # protocol-relative
        return "//" + target_url.split("//", 1)[1]
    if form == 3:  # tracking noise + fragment
        return target_url + "?utm_source=syn&utm_medium=x#frag"
    if form == 4:  # uppercase host
        scheme, rest = target_url.split("//", 1)
        host, _, path = rest.partition("/")
        return f"{scheme}//{host.upper()}/{path}"
    return target_url + "#section-2"


def _sentence(rng: random.Random, n: int, capitalize: bool, period: bool) -> str:
    ws = [VOCAB[rng.randrange(len(VOCAB))] for _ in range(n)]
    if capitalize:
        ws[0] = ws[0].capitalize()
    s = " ".join(ws)
    return s + "." if period else s


def _paragraph_lines(rng: random.Random) -> list:
    """1-3 line paragraph; continuation lines start lowercase (P16 merge path)."""
    n_lines = 1 + rng.randrange(3)
    lines = []
    for i in range(n_lines):
        last = i == n_lines - 1
        lines.append(_sentence(rng, 4 + rng.randrange(5), capitalize=(i == 0), period=last))
    return lines


def _sop_grid(variant: str, docno: str, title_words: str, rng: random.Random) -> list:
    """The four SOP header-grid variants (reference P5 paths, cs:406-633)."""
    if variant == "A":  # key-only rows folded with value rows; no title found
        return [
            "Standard Operating Procedure",
            "Document No.:",
            docno,
            title_words,
            "Effective Date:",
            "06/08/2023 G",
            "Accountable Organization: Engineering Team",
            "Management Approval:",
            "Jane Doe",
            "Source: Internal",
        ]
    if variant == "B":  # all inline key:value rows
        return [
            "Standard Operating Procedure",
            f"Document No.: {docno}",
            f"Effective Date: 11/02/2024",
            "Revision: C",
            "Accountable Organization: Quality Group",
            "Management Approval: Alan Turing",
            "Source: Intranet",
        ]
    if variant == "D":  # multi-key grid rows + combo values + title block
        return [
            "Standard Operating Procedure",
            "Document No.: Page:",
            f"{docno} 1 of 3",
            title_words,
            "Effective Date: Revision:",
            "06/08/2023 G",
            "Accountable Organization:",
            "Engineering Team John Smith",
            "Management Approval:",
            "Jane Doe",
            "Source: Internal",
        ]
    # variant F: org value row with trailing approver name (cs:576-582 split)
    return [
        "Standard Operating Procedure",
        "Document No.: Page:",
        f"{docno} 1 of 2",
        title_words,
        "Effective Date: Revision:",
        "03/04/2024 C",
        "Accountable Organization: Page:",
        "Engineering Team John Smith",
        "Management Approval:",
    ]


def _table_block(rng: random.Random) -> list:
    """A Step/Responsibility/Action table as positioned lines (P9-P15).

    Step ids are alphabetic: the reference's table-block consumer stops at any
    line matching the numbered-heading regex (cs:707), so numeric step cells
    would terminate the block — a faithful quirk of the reference.
    Returns a list of 'table lines': each is a list of (anchor_index, word).
    """
    lines = []
    hdr = [(0, "Step"), (1, "Responsibility"), (2, "Action")]
    lines.append(hdr)
    n_rows = 2 + rng.randrange(3)
    for r in range(n_rows):
        step = chr(ord("A") + r)
        resp = _RESP[rng.randrange(len(_RESP))]
        action = [VOCAB[rng.randrange(len(VOCAB))] for _ in range(3 + rng.randrange(3))]
        row = [(0, step), (1, resp)] + [(2, w) for w in action]
        lines.append(row)
        if r == 1 and rng.random() < 0.6:  # wrapped continuation row
            cont = [(2, w) for w in ("and", "log", "the", "result")]
            lines.append(cont)
    return lines


def build_page_content(row_id: int, cfg: CorpusConfig, assign: dict) -> tuple:
    """Encoding-independent page content: (title_words, doc_pages, hrefs).

    Pure in (seed, row_id); the rng draw ORDER is part of the corpus
    contract (title -> page-count -> sop -> table -> per-page lines -> link
    targets -> href spellings), so HTML and PDF renderings of the same row
    carry identical content.
    """
    rng = random.Random(f"{cfg.seed}:{row_id}")
    host = host_name(int(assign["host_idx"][row_id]))
    page_url = url_of(row_id, assign)
    docno = f"CLG-EN-PR-{row_id % 10000:04d}"
    title_words = " ".join(
        w.capitalize() for w in (VOCAB[rng.randrange(len(VOCAB))] for _ in range(3))
    )

    n_doc_pages = 1 if rng.random() < 0.6 else (2 if rng.random() < 0.75 else 3)
    sop = None
    r = rng.random()
    if r < 0.20:
        sop = ("A", "B", "D", "F")[rng.randrange(4)]
    has_table = rng.random() < 0.10

    banner = f"Acme Industrial {host}"
    footer = f"Doc {docno} Internal Use"

    # Build logical lines per document page.
    doc_pages = []
    heading_major = 1
    for p in range(n_doc_pages):
        lines: list = [("text", banner)]
        if p == 0 and sop is not None:
            for s in _sop_grid(sop, docno, title_words, rng):
                lines.append(("text", s))
        n_sections = (1 + rng.randrange(2)) * cfg.content_scale
        for _ in range(n_sections):
            sub = f"{heading_major}.0"
            lines.append(("text", f"{sub} {_sentence(rng, 2, True, False)}"))
            heading_major += 1
            for _ in range(1 + rng.randrange(2)):
                for ln in _paragraph_lines(rng):
                    lines.append(("text", ln))
            if rng.random() < 0.30:
                noise = _NOISE_POOL[rng.randrange(len(_NOISE_POOL))]
                lines.append(("text", noise.format(p=p + 1, n=n_doc_pages)))
        if p == n_doc_pages - 1 and has_table:
            lines.append(("text", "6.0 Procedure"))
            for tl in _table_block(rng):
                lines.append(("table", tl))
            lines.append(("text", f"{max(7, heading_major)}.0 Records"))
            for ln in _paragraph_lines(rng):
                lines.append(("text", ln))
        lines.append(("text", footer))
        doc_pages.append(lines)

    hrefs = []
    for kind, target in _link_targets(row_id, cfg, assign, rng):
        if kind == "dead":
            target_url = f"https://{host}/d9/p{target}.html"
        else:
            target_url = url_of(target, assign)
        hrefs.append(_href_spelling(target_url, page_url, rng))
    return title_words, doc_pages, hrefs


def layout_word_boxes(doc_pages: list) -> list:
    """Shared geometry: logical lines -> [(page_no, height, [(x, y, word)])].

    One definition of word coordinates for BOTH encodings: text lines flow
    from LEFT_MARGIN with the fixed CHAR_WIDTH metric + 4pt gaps; table
    lines place words at their column anchors; y starts 32pt below the top
    and steps by LINE_STEP.
    """
    out = []
    for p, lines in enumerate(doc_pages):
        y = PAGE_HEIGHT - 32.0
        boxes = []
        for kind, payload in lines:
            if kind == "text":
                x = LEFT_MARGIN
                for w in str(payload).split():
                    boxes.append((x, y, w))
                    x += CHAR_WIDTH * len(w) + 4.0
            else:  # table line: words at column anchors
                for anchor_i, w in payload:
                    boxes.append((TABLE_ANCHORS[anchor_i], y, w))
            y -= LINE_STEP
        out.append((p + 1, PAGE_HEIGHT, boxes))
    return out


def build_page_html(row_id: int, cfg: CorpusConfig, assign: dict) -> str:
    """Full deterministic page, HTML layout encoding. Pure in (seed, row_id)."""
    title_words, doc_pages, hrefs = build_page_content(row_id, cfg, assign)
    parts = [
        "<!DOCTYPE html><html><head><title>",
        _escape_html(title_words),
        "</title></head><body>\n",
    ]
    for page_no, height, boxes in layout_word_boxes(doc_pages):
        parts.append(f'<div class="page" data-page="{page_no}" data-height="{height}">\n')
        for x, y, w in boxes:
            parts.append(
                f'<span class="w" style="left:{x:.1f}pt;top:{y:.1f}pt">{_escape_html(w)}</span>\n'
            )
        parts.append("</div>\n")
    parts.append("<nav>\n")
    for href in hrefs:
        parts.append(f'<a href="{_escape_html(href)}">l</a>\n')
    parts.append("</nav>\n</body></html>\n")
    return "".join(parts)


def build_page_pdf(row_id: int, cfg: CorpusConfig, assign: dict,
                   compress: bool = False, xref_stream: bool = False,
                   encrypt: str | None = None) -> bytes:
    """The SAME page as build_page_html, encoded as a real PDF (content
    streams + link annotations; ``engine.pdf``); ``compress=True`` emits
    FlateDecode streams, ``xref_stream=True`` the PDF 1.5 ObjStm + xref
    stream layout, ``encrypt`` the standard-security-handler modes.
    Extraction output is byte-identical across all encodings."""
    from .pdf import render_pdf_page_bytes

    _title, doc_pages, hrefs = build_page_content(row_id, cfg, assign)
    return render_pdf_page_bytes(
        layout_word_boxes(doc_pages), hrefs, compress=compress,
        xref_stream=xref_stream, encrypt=encrypt,
    )


_ENCRYPT_MODES = ("rc4-40", "rc4-128", "aes-128", "aes-256")


def build_page_pdf_encrypted(row_id: int, cfg: CorpusConfig, assign: dict) -> bytes:
    """Encrypted-corpus variant: the mode cycles rc4-40 / rc4-128 / aes-128
    / aes-256(R6) and the layout alternates classic-Flate / xref-stream per
    row id, so one corpus exercises every (cipher x layout) decrypt path —
    the protected-but-readable files PdfPig opens silently
    (PdfToMarkdownConverter.cs:81-113)."""
    return build_page_pdf(
        row_id, cfg, assign,
        compress=(row_id % 2 == 0),
        xref_stream=(row_id % 2 == 1),
        encrypt=_ENCRYPT_MODES[row_id % 4],
    )


# ---------------------------------------------------------------------------
# Table-valued batch generation (shared by the serial and Ray paths)
# ---------------------------------------------------------------------------

_EPOCH_US = 1735689600000000  # 2025-01-01T00:00:00Z in microseconds


def gen_rows(ids, cfg: CorpusConfig, assign: dict) -> pa.Table:
    """Generate pages rows for the given row ids; adds the `bucket` column."""
    urls, htmls, texts, langs, ts, buckets = [], [], [], [], [], []
    for rid in ids:
        rid = int(rid)
        u = url_of(rid, assign)
        if cfg.encoding == "pdf":
            html = build_page_pdf(rid, cfg, assign)
        elif cfg.encoding == "pdf_flate":
            html = build_page_pdf(rid, cfg, assign, compress=True)
        elif cfg.encoding == "pdf_xrefstream":
            html = build_page_pdf(rid, cfg, assign, xref_stream=True)
        elif cfg.encoding == "pdf_encrypted":
            html = build_page_pdf_encrypted(rid, cfg, assign)
        else:
            html = build_page_html(rid, cfg, assign).encode("utf-8")
        urls.append(u)
        htmls.append(html)
        if cfg.with_golden:
            texts.append(extract_document(html, u)["markdown"])
        else:
            texts.append("")
        langs.append(_LANGS[int(assign["lang_idx"][rid])])
        ts.append(_EPOCH_US + rid * 1_000_000)
        buckets.append(url_hash64(u) % cfg.n_buckets)
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "bucket": pa.array(buckets, pa.int32()),
        }
    )
    return t


def generate_corpus(out_dir: str, cfg: CorpusConfig, use_ray: bool | None = None) -> str:
    """Write the corpus under ``out_dir``: pages/bucket=K/part-*.parquet + side tables.

    The hash-bucketed layout (bucket = url_hash64(url) % n_buckets) is the
    partitioning contract the fetch join relies on (SURVEY.md §7.5): a crawl
    round only opens the bucket files its frontier URLs hash into.

    use_ray=None auto-selects: Ray path for large corpora when a Ray session
    exists (never initialises one — session ownership stays with the caller).
    """
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_corpus.json")
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f).get("cache_key") == cfg.cache_key():
                return out_dir

    assign = build_assignment(cfg)
    pages_dir = os.path.join(out_dir, "pages")
    os.makedirs(pages_dir, exist_ok=True)

    if use_ray is None:
        import ray

        use_ray = cfg.n_pages >= 20_000 and ray.is_initialized()

    if use_ray:
        _generate_with_ray(pages_dir, cfg, assign)
    else:
        per_bucket: dict = {b: [] for b in range(cfg.n_buckets)}
        chunk = 2000
        for start in range(0, cfg.n_pages, chunk):
            t = gen_rows(range(start, min(cfg.n_pages, start + chunk)), cfg, assign)
            for b in range(cfg.n_buckets):
                sub = t.filter(pa.compute.equal(t["bucket"], b))
                if sub.num_rows:
                    per_bucket[b].append(sub.drop_columns(["bucket"]))
        for b, tables in per_bucket.items():
            bdir = os.path.join(pages_dir, f"bucket={b}")
            os.makedirs(bdir, exist_ok=True)
            out = (
                pa.concat_tables(tables)
                if tables
                else PAGES_SCHEMA.empty_table()
            )
            pq.write_table(out, os.path.join(bdir, "part-0.parquet"))

    _write_side_tables(out_dir, cfg, assign)
    with open(marker, "w") as f:
        json.dump({"cache_key": cfg.cache_key(), "cfg": asdict(cfg)}, f)
    return out_dir


def _generate_with_ray(pages_dir: str, cfg: CorpusConfig, assign: dict):
    """Parallel generation: deterministic row-range chunks, each task writing
    its rows straight into the hash-bucket layout — no shuffle.

    gen_rows is pure in (seed, row_id), so chunk boundaries don't affect
    content; part filenames are keyed by chunk id, so a rerun overwrites
    identically (idempotent).  A groupby(bucket) exchange here would move the
    whole html payload through the object store just to co-locate writes.
    """
    import ray

    assign_ref = ray.put(assign)
    # adaptive chunking: big corpora keep the 10k write granularity, small
    # ones still fan out ~64 tasks (a 400-page ENCRYPTED corpus is dominated
    # by per-page crypto, and one 10k chunk would serialize it)
    chunk = min(10_000, max(32, -(-cfg.n_pages // 64)))
    n_chunks = -(-cfg.n_pages // chunk)

    @ray.remote(num_cpus=2)  # allocation-heavy; see crawl.py extract stage note
    def gen_write(ci: int) -> int:
        a = ray.get(assign_ref)
        lo, hi = ci * chunk, min(cfg.n_pages, (ci + 1) * chunk)
        t = gen_rows(range(lo, hi), cfg, a)
        for b in pa.compute.unique(t["bucket"]).to_pylist():
            bdir = os.path.join(pages_dir, f"bucket={b}")
            os.makedirs(bdir, exist_ok=True)
            sub = t.filter(pa.compute.equal(t["bucket"], b)).drop_columns(["bucket"])
            pq.write_table(sub, os.path.join(bdir, f"part-{ci:05d}.parquet"))
        return hi - lo

    ray.get([gen_write.remote(ci) for ci in range(n_chunks)])
    for b in range(cfg.n_buckets):
        bdir = os.path.join(pages_dir, f"bucket={b}")
        if not os.path.isdir(bdir):
            os.makedirs(bdir, exist_ok=True)
            pq.write_table(PAGES_SCHEMA.empty_table(), os.path.join(bdir, "part-empty.parquet"))


def _write_side_tables(out_dir: str, cfg: CorpusConfig, assign: dict):
    """seeds / robots / budget tables (FIXTURES.md §2-§4)."""
    # seeds: lowest-row page of 4 distinct hosts + 1 duplicate-after-canonicalization
    hosts_with_rows = [h for h in range(cfg.n_hosts) if len(assign["host_rows"][h])]
    chosen = hosts_with_rows[: cfg.n_seed_hosts]
    seed_urls, prios = [], []
    for i, h in enumerate(chosen):
        rid = int(assign["host_rows"][h][0])
        seed_urls.append(url_of(rid, assign))
        prios.append(i)
    if seed_urls:
        scheme, rest = seed_urls[0].split("//", 1)
        host, _, path = rest.partition("/")
        seed_urls.append(f"{scheme}//{host.upper()}/{path}?utm_source=seed#top")
        prios.append(0)
    pq.write_table(
        pa.table({"url": pa.array(seed_urls, pa.string()), "priority": pa.array(prios, pa.int32())}),
        os.path.join(out_dir, "seeds.parquet"),
    )

    hosts, dis, delays = [], [], []
    for k in range(cfg.n_hosts):
        hosts.append(host_name(k))
        if k == 13:
            dis.append(["/"])
        elif k % 10 == 7:
            dis.append(["/d3", "/d4", "/d5", "/d6"])
        else:
            dis.append([])
        delays.append(100 + (k * 37) % 400)
    pq.write_table(
        pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "disallow_prefixes": pa.array(dis, pa.list_(pa.string())),
                "crawl_delay_ms": pa.array(delays, pa.int64()),
            }
        ),
        os.path.join(out_dir, "robots.parquet"),
    )

    budget = default_budget()
    pq.write_table(
        pa.table({k: pa.array([v], pa.int64() if k == "max_urls_total" else pa.int32()) for k, v in budget.items()}),
        os.path.join(out_dir, "budget.parquet"),
    )


def default_budget() -> dict:
    # FIXTURES.md §4 (t1 values)
    return {
        "max_urls_total": 1000,
        "max_per_host_per_round": 8,
        "max_depth": 6,
        "max_rounds": 16,
    }


def modify_pages(corpus_dir: str, dest_dir: str, urls: list,
                 marker: bytes = b"\n<!-- rev2 -->",
                 delete_urls: list | None = None) -> str:
    """Copy a corpus and append ``marker`` to the html bytes of the given
    urls — the 'site changed since last crawl' fixture for the etag
    change-detection recrawl path (``engine.crawl.detect_changed_urls``).
    Only the bucket files containing a target url are rewritten; everything
    else (seeds, robots, _corpus.json lineage key) is copied verbatim so a
    checkpoint resumed against the modified copy passes the config-hash
    lineage check."""
    import shutil

    if os.path.exists(dest_dir):
        shutil.rmtree(dest_dir)
    shutil.copytree(corpus_dir, dest_dir)
    targets = set(urls)
    deletions = set(delete_urls or ())
    for f in sorted(
        os.path.join(dp, fn)
        for dp, _dns, fns in os.walk(os.path.join(dest_dir, "pages"))
        for fn in fns
        if fn.endswith(".parquet")
    ):
        t = pq.read_table(f)
        u = t["url"].to_pylist()
        if not targets.intersection(u) and not deletions.intersection(u):
            continue
        if deletions:
            keep = [url not in deletions for url in u]
            t = t.filter(pa.array(keep, pa.bool_()))
            u = t["url"].to_pylist()
        html = t["html"].to_pylist()
        changed = [
            (h + marker if url in targets else h) for url, h in zip(u, html)
        ]
        t = t.set_column(
            t.schema.get_field_index("html"), "html", pa.array(changed, pa.binary())
        )
        pq.write_table(t, f)
    return dest_dir
