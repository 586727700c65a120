"""WARC/1.0 source and sink — the web-archive interchange format a real
crawl ingests from and publishes to (ISO 28500; the reference's SharePoint
wire payloads play this role, ``DocumentPayload.cs:10-25``).

Writer twin + reader pair, same contract as the PDF corpus encodings:
``write_warc_shards`` serializes the pages table into ``shard-K.warc`` (or
per-record-gzip ``.warc.gz``, the Common-Crawl layout) files, and
``read_warc`` parses them back distributed — one Ray task per shard file
(WARC has no mid-file split points without an external index, so the
parallelism unit is the shard file; size shards accordingly at scale).

Both sides are byte-deterministic: record order within a shard is url
order, WARC-Date is the page's ``warc_ts``, and the HTTP response payload
carries the html bytes verbatim — so a read-back is checkable record for
record against the source table (``warc_golden_check``).
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

_CRLF = "\r\n"


def _chunked(body: bytes, size: int = 1024) -> bytes:
    """HTTP/1.1 chunked transfer encoding of ``body`` (hex size lines,
    terminal 0-chunk)."""
    parts = []
    for lo in range(0, len(body), size):
        c = body[lo: lo + size]
        parts.append(f"{len(c):x}".encode() + _CRLF.encode() + c + _CRLF.encode())
    parts.append(b"0" + _CRLF.encode() * 2)
    return b"".join(parts)


def _warc_record(url: str, ts_us: int, html: bytes,
                 http_encoding: str = "identity") -> bytes:
    """One WARC/1.0 response record with an HTTP/1.1 payload.

    ``http_encoding`` writes the payload the three ways real crawls see it:
    ``identity`` (Content-Length), ``chunked`` (Transfer-Encoding), and
    ``gzip`` (Content-Encoding + Content-Length of the compressed bytes).
    The reader decodes all three back to the identical html.
    """
    ts = pd.Timestamp(ts_us, unit="us").strftime("%Y-%m-%dT%H:%M:%SZ")
    rid = hashlib.sha256(url.encode()).hexdigest()[:32]
    if http_encoding == "chunked":
        payload = _chunked(html)
        plines = f"Transfer-Encoding: chunked{_CRLF}{_CRLF}"
    elif http_encoding == "gzip":
        payload = gzip.compress(html, 6, mtime=0)
        plines = (f"Content-Encoding: gzip{_CRLF}"
                  f"Content-Length: {len(payload)}{_CRLF}{_CRLF}")
    else:
        payload = html
        plines = f"Content-Length: {len(html)}{_CRLF}{_CRLF}"
    http = (
        f"HTTP/1.1 200 OK{_CRLF}"
        f"Content-Type: text/html{_CRLF}"
        + plines
    ).encode() + payload
    head = (
        f"WARC/1.0{_CRLF}"
        f"WARC-Type: response{_CRLF}"
        f"WARC-Target-URI: {url}{_CRLF}"
        f"WARC-Date: {ts}{_CRLF}"
        f"WARC-Record-ID: <urn:sha256:{rid}>{_CRLF}"
        f"Content-Type: application/http; msgtype=response{_CRLF}"
        f"Content-Length: {len(http)}{_CRLF}{_CRLF}"
    ).encode()
    return head + http + _CRLF.encode() * 2


def write_warc_shards(corpus_dir: str, out_dir: str | None = None,
                      n_shards: int = 8, gz: bool = False) -> str:
    """Serialize ``corpus_dir/pages`` into ``out_dir/shard-K.warc[.gz]``
    (K = url-hash % n_shards, records url-ordered within a shard; the gz
    variant is ONE gzip member PER RECORD — the Common Crawl convention
    that lets a reader seek to member boundaries).  Distributed: one
    shard-keyed all-to-all, each group writes its own file atomically.
    Cached via a marker keyed on the pages files' (path, mtime, size).
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    files = []
    for root, _dirs, names in os.walk(os.path.join(corpus_dir, "pages")):
        for n in sorted(names):
            if n.endswith(".parquet"):
                p = os.path.join(root, n)
                st = os.stat(p)
                files.append((p, st.st_mtime_ns, st.st_size))
    key = hashlib.md5(
        json.dumps([files, n_shards, gz]).encode()).hexdigest()[:16]
    if out_dir is None:
        out_dir = os.path.join("/tmp", "engine_warc", key)
    marker = os.path.join(out_dir, "_warc_done.json")
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f).get("key") == key:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)

    _U = pa.schema([("url", pa.string()), ("ts_us", pa.int64()),
                    ("html", pa.binary()), ("shard", pa.int64())])

    def rows(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        sh = np.array(
            [int(hashlib.md5(u.encode()).hexdigest()[:8], 16) % n_shards
             for u in urls], np.int64)
        import pyarrow.compute as pc
        return pa.table(
            {"url": t["url"], "ts_us": pc.cast(t["warc_ts"], pa.int64()),
             "html": t["html"], "shard": pa.array(sh, pa.int64())},
            schema=_U)

    ext = ".warc.gz" if gz else ".warc"

    def write_shard(g: pd.DataFrame) -> pa.Table:
        sh = int(g["shard"].iloc[0])
        g = g.sort_values("url")
        chunks = []
        for u, ts, h in zip(g["url"], g["ts_us"].to_numpy(), g["html"]):
            rec = _warc_record(u, int(ts), bytes(h))
            chunks.append(gzip.compress(rec, 6, mtime=0) if gz else rec)
        path = os.path.join(out_dir, f"shard-{sh}{ext}")
        with open(path + ".tmp", "wb") as f:
            f.write(b"".join(chunks))
        os.replace(path + ".tmp", path)
        return pa.table({"shard": pa.array([sh], pa.int64()),
                         "n": pa.array([len(g)], pa.int64())})

    (rd.read_parquet(os.path.join(corpus_dir, "pages"),
                     columns=["url", "warc_ts", "html"])
     .map_batches(rows, batch_format="pyarrow")
     .groupby("shard")
     .map_groups(write_shard, batch_format="pandas")
     .materialize())
    with open(marker + ".tmp", "w") as f:
        json.dump({"key": key}, f)
    os.replace(marker + ".tmp", marker)
    return out_dir


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse one WARC file's bytes (plain, or per-record gzip members —
    detected by magic) into [{url, ts_us, html}] for response records."""
    if data[:2] == b"\x1f\x8b":
        parts = []
        pos = 0
        while pos < len(data):
            d = zlib.decompressobj(wbits=31)
            parts.append(d.decompress(data[pos:]))
            rest = d.unused_data
            pos = len(data) - len(rest) if rest else len(data)
        data = b"".join(parts)

    out = []
    pos = 0
    n = len(data)
    while pos < n:
        nxt = data.find(b"WARC/1.0\r\n", pos)
        if nxt < 0:
            break
        hdr_end = data.find(b"\r\n\r\n", nxt)
        if hdr_end < 0:
            break
        headers = {}
        for line in data[nxt + 10: hdr_end].split(b"\r\n"):
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        clen = int(headers[b"content-length"])
        body = data[hdr_end + 4: hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        if headers.get(b"warc-type") != b"response":
            continue
        url = headers[b"warc-target-uri"].decode()
        ts_us = int(pd.Timestamp(
            headers[b"warc-date"].decode().rstrip("Z")).value // 1000)
        p_end = body.find(b"\r\n\r\n")
        plen = None
        chunked = False
        gzipped = False
        for line in body[:p_end].split(b"\r\n"):
            low = line.lower()
            if low.startswith(b"content-length:"):
                plen = int(line.split(b":")[1])
            elif (low.startswith(b"transfer-encoding:")
                  and b"chunked" in low):
                chunked = True
            elif low.startswith(b"content-encoding:") and b"gzip" in low:
                gzipped = True
        payload = body[p_end + 4:]
        if chunked:
            # de-chunk: hex size lines until the terminal 0-chunk
            html_parts = []
            q = 0
            while True:
                eol = payload.find(b"\r\n", q)
                size = int(payload[q:eol], 16)
                if size == 0:
                    break
                html_parts.append(payload[eol + 2: eol + 2 + size])
                q = eol + 2 + size + 2
            html = b"".join(html_parts)
        else:
            html = payload[:plen] if plen is not None else payload
        if gzipped:
            html = gzip.decompress(html)
        out.append({"url": url, "ts_us": ts_us, "html": html})
    return out


def read_warc(paths: list[str]):
    """Distributed WARC read: one parse task per shard file (records can't
    be split without an index), yielding (url, warc_ts, html) rows."""
    import ray.data as rd

    _OUT = pa.schema([("url", pa.string()), ("warc_ts", pa.timestamp("us")),
                      ("html", pa.binary())])

    def parse(batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch["path"].to_pylist():
            with open(p, "rb") as f:
                rows.extend(parse_warc_bytes(f.read()))
        return pa.table(
            {"url": pa.array([r["url"] for r in rows], pa.string()),
             "warc_ts": pa.array([r["ts_us"] for r in rows],
                                 pa.timestamp("us")),
             "html": pa.array([r["html"] for r in rows], pa.binary())},
            schema=_OUT)

    items = rd.from_items([{"path": p} for p in sorted(paths)])
    # one file per task: WARC's parallelism unit is the shard file
    return items.repartition(len(paths)).map_batches(
        parse, batch_format="pyarrow", batch_size=1)


def ingest_warc_corpus(warc_dir: str, out_dir: str, n_buckets: int = 8,
                       robots_from: str | None = None,
                       seeds_from: str | None = None) -> str:
    """Materialize WARC shards as a crawlable corpus: the hash-bucketed
    ``pages/bucket=K/`` layout (bucket = url_hash64 % n_buckets — the
    partitioning contract the crawl's fetch join relies on) plus the
    seeds / robots / budget side tables, so a Common-Crawl-style WARC drop
    feeds the SAME crawl pipeline as the synthetic corpus.

    Scale shape: one distributed parse (a task per WARC shard file) into
    ONE bucket-keyed all-to-all; each bucket group writes one consolidated
    parquet file (the IVF consolidation lesson — no per-input-block
    fragment explosion).  Side tables: copied from ``robots_from`` /
    ``seeds_from`` when given (a recrawl of a known corpus); otherwise
    robots is permissive over the observed hosts and seeds are each
    host's lexicographically-first url — both derived with bounded
    driver state (hosts are the bounded catalog, not urls).
    """
    import glob as _glob
    import shutil

    import pyarrow.parquet as pq
    import ray.data as rd

    from .canonicalize import url_hash64
    from .synth import PAGES_SCHEMA, default_budget

    paths = sorted(_glob.glob(os.path.join(warc_dir, "shard-*.warc*")))
    if not paths:
        raise FileNotFoundError(f"no WARC shards under {warc_dir}")
    pages_dir = os.path.join(out_dir, "pages")
    os.makedirs(pages_dir, exist_ok=True)

    _B = pa.schema(
        [("url", pa.string()), ("warc_ts", pa.timestamp("us")),
         ("html", pa.binary()), ("bucket", pa.int64())]
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        b = np.array([url_hash64(u) % n_buckets for u in urls], np.int64)
        return pa.table(
            {"url": t["url"], "warc_ts": t["warc_ts"], "html": t["html"],
             "bucket": pa.array(b, pa.int64())}, schema=_B)

    _M = pa.schema([("bucket", pa.int64()), ("n", pa.int64()),
                    ("hosts", pa.list_(pa.string())),
                    ("first_urls", pa.list_(pa.string()))])

    def write_bucket(g: pd.DataFrame) -> pa.Table:
        b = int(g["bucket"].iloc[0])
        g = g.sort_values("url")
        tbl = pa.table(
            {"url": pa.array(g["url"], pa.string()),
             "warc_ts": pa.array(g["warc_ts"], pa.timestamp("us")),
             "html": pa.array([bytes(x) for x in g["html"]], pa.binary()),
             "text": pa.array([""] * len(g), pa.string()),
             "lang": pa.array([""] * len(g), pa.string())},
            schema=PAGES_SCHEMA)
        bdir = os.path.join(pages_dir, f"bucket={b}")
        os.makedirs(bdir, exist_ok=True)
        fp = os.path.join(bdir, "part-0.parquet")
        pq.write_table(tbl, fp + ".tmp")
        os.replace(fp + ".tmp", fp)
        # bounded per-bucket host catalog + first-url-per-host for seeds
        hosts = g["url"].str.split("/").str[2]
        firsts = g.groupby(hosts, sort=True)["url"].min()
        return pa.table(
            {"bucket": pa.array([b], pa.int64()),
             "n": pa.array([len(g)], pa.int64()),
             "hosts": pa.array([sorted(set(hosts))], pa.list_(pa.string())),
             "first_urls": pa.array([firsts.tolist()], pa.list_(pa.string()))},
            schema=_M)

    manifest = (
        read_warc(paths)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(write_bucket, batch_format="pandas")
        .to_pandas()
    )
    # empty buckets still need a (schema-bearing) file for the fetch join
    present = set(manifest["bucket"].astype(int))
    for b in range(n_buckets):
        if b not in present:
            bdir = os.path.join(pages_dir, f"bucket={b}")
            os.makedirs(bdir, exist_ok=True)
            pq.write_table(PAGES_SCHEMA.empty_table(),
                           os.path.join(bdir, "part-empty.parquet"))

    if robots_from:
        shutil.copy(os.path.join(robots_from, "robots.parquet"),
                    os.path.join(out_dir, "robots.parquet"))
    else:
        hosts = sorted({h for hs in manifest["hosts"] for h in hs})
        pq.write_table(
            pa.table({"host": pa.array(hosts, pa.string()),
                      "disallow_prefixes": pa.array([[]] * len(hosts),
                                                    pa.list_(pa.string())),
                      "crawl_delay_ms": pa.array([0] * len(hosts), pa.int64())}),
            os.path.join(out_dir, "robots.parquet"))
    if seeds_from:
        shutil.copy(os.path.join(seeds_from, "seeds.parquet"),
                    os.path.join(out_dir, "seeds.parquet"))
    else:
        per_host: dict = {}
        for urls in manifest["first_urls"]:
            for u in urls:
                h = u.split("/")[2]
                per_host[h] = min(per_host.get(h, u), u)
        seeds = [per_host[h] for h in sorted(per_host)]
        pq.write_table(
            pa.table({"url": pa.array(seeds, pa.string()),
                      "priority": pa.array(list(range(len(seeds))), pa.int32())}),
            os.path.join(out_dir, "seeds.parquet"))

    budget = default_budget()
    pq.write_table(
        pa.table({k: pa.array([v], pa.int64() if k == "max_urls_total"
                              else pa.int32())
                  for k, v in budget.items()}),
        os.path.join(out_dir, "budget.parquet"))

    key = hashlib.md5(json.dumps(sorted(
        (os.path.basename(p), os.stat(p).st_size) for p in paths
    )).encode()).hexdigest()[:16]
    with open(os.path.join(out_dir, "_corpus.json"), "w") as f:
        json.dump({"cache_key": f"warc:{key}",
                   "cfg": {"n_buckets": n_buckets}}, f)
    return out_dir
