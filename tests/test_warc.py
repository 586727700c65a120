"""WARC source/sink: record serialization, per-record-gzip members,
distributed read-back equivalence, and parser edge cases."""

import os
import sys

import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_warc_record_roundtrip_unit():
    from engine.warc import _warc_record, parse_warc_bytes

    html = b"<html><body>hi \xe2\x82\xac</body></html>"
    rec = _warc_record("https://a.test/x", 1_700_000_000_000_000, html)
    got = parse_warc_bytes(rec)
    assert len(got) == 1
    assert got[0]["url"] == "https://a.test/x"
    assert got[0]["html"] == html
    assert got[0]["ts_us"] == 1_700_000_000_000_000

    # concatenated records parse in order; a non-response record is skipped
    rec2 = _warc_record("https://a.test/y", 1_700_000_001_000_000, b"<p>2</p>")
    warcinfo = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
                b"Content-Length: 4\r\n\r\nabcd\r\n\r\n")
    got = parse_warc_bytes(warcinfo + rec + rec2)
    assert [r["url"] for r in got] == ["https://a.test/x", "https://a.test/y"]

    # html containing WARC-like bytes must not confuse the parser (the
    # Content-Length jump skips the payload, no re-sync inside it)
    tricky = b"x WARC/1.0\r\n\r\n y"
    rec3 = _warc_record("https://a.test/z", 1_700_000_002_000_000, tricky)
    got = parse_warc_bytes(rec3 + rec2)
    assert got[0]["html"] == tricky
    assert got[1]["url"] == "https://a.test/y"


def test_warc_gzip_members_roundtrip_unit():
    import gzip

    from engine.warc import _warc_record, parse_warc_bytes

    recs = [
        _warc_record(f"https://a.test/{i}", 1_700_000_000_000_000 + i,
                     f"<p>{i}</p>".encode())
        for i in range(5)
    ]
    blob = b"".join(gzip.compress(r, 6, mtime=0) for r in recs)
    got = parse_warc_bytes(blob)
    assert [r["url"] for r in got] == [f"https://a.test/{i}" for i in range(5)]
    assert [r["html"] for r in got] == [f"<p>{i}</p>".encode() for i in range(5)]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_shards_distributed_roundtrip(ray_session, tmp_path, gz):
    """pages -> write_warc_shards -> read_warc == pages, byte for byte."""
    import glob

    import ray.data as rd

    from engine.synth import CorpusConfig, generate_corpus
    from engine.warc import read_warc, write_warc_shards

    corpus = generate_corpus(
        str(tmp_path / "corpus"), CorpusConfig(n_pages=300, n_hosts=10,
                                               n_buckets=4))
    out = write_warc_shards(corpus, out_dir=str(tmp_path / f"warc{gz}"),
                            n_shards=4, gz=gz)
    paths = sorted(glob.glob(os.path.join(out, "shard-*.warc*")))
    assert len(paths) == 4
    got = read_warc(paths).to_pandas().sort_values("url").reset_index(drop=True)
    want = (rd.read_parquet(os.path.join(corpus, "pages"),
                            columns=["url", "warc_ts", "html"])
            .to_pandas().sort_values("url").reset_index(drop=True))
    assert len(got) == len(want) == 300
    assert got["url"].tolist() == want["url"].tolist()
    assert got["warc_ts"].tolist() == want["warc_ts"].tolist()
    assert all(bytes(a) == bytes(b) for a, b in zip(got["html"], want["html"]))


def test_warc_ingest_feeds_identical_crawl(ray_session, tmp_path):
    """WARC as a first-class crawl source: corpus -> WARC shards ->
    ingest_warc_corpus -> crawl reproduces the original crawl's order
    table and counters exactly (same seeds/robots/budget)."""
    import glob

    from engine.crawl import crawl
    from engine.synth import CorpusConfig, generate_corpus
    from engine.warc import ingest_warc_corpus, write_warc_shards

    corpus = generate_corpus(
        str(tmp_path / "corpus"), CorpusConfig(n_pages=300, n_hosts=10,
                                               n_buckets=4))
    warc_dir = write_warc_shards(corpus, out_dir=str(tmp_path / "warc"),
                                 n_shards=4, gz=True)
    ingested = ingest_warc_corpus(
        warc_dir, str(tmp_path / "corpus2"), n_buckets=4,
        robots_from=corpus, seeds_from=corpus)

    budget = {"max_urls_total": 200, "max_per_host_per_round": 6,
              "max_depth": 4, "max_rounds": 12}
    a = crawl(corpus, str(tmp_path / "ck_a"), budget)
    b = crawl(ingested, str(tmp_path / "ck_b"), budget)
    assert a.cumulative == b.cumulative
    ta = a.order_table().to_pylist()
    tb = b.order_table().to_pylist()
    assert ta == tb


def test_http_payload_encodings_roundtrip():
    """Real crawls serve all three HTTP payload framings — identity
    Content-Length, chunked Transfer-Encoding, gzip Content-Encoding —
    and the reader must decode each back to the identical html, including
    a body that embeds a fake chunk-size line and CRLFs."""
    from engine.warc import _warc_record, parse_warc_bytes

    html = (b"<html>trap\r\n0\r\n\r\nContent-Length: 7\r\n" + b"x" * 3000
            + b"</html>")
    ts = 1_700_000_000_000_000
    for enc in ("identity", "chunked", "gzip"):
        rec = _warc_record("http://h/x", ts, html, http_encoding=enc)
        got = parse_warc_bytes(rec)
        assert len(got) == 1, enc
        assert got[0]["html"] == html, enc
        assert got[0]["url"] == "http://h/x" and got[0]["ts_us"] == ts

    # a mixed-encoding FILE: three records, one per framing
    data = b"".join(_warc_record(f"http://h/{i}", ts + i, html,
                                 http_encoding=e)
                    for i, e in enumerate(("identity", "chunked", "gzip")))
    got = parse_warc_bytes(data)
    assert [g["url"] for g in got] == [f"http://h/{i}" for i in range(3)]
    assert all(g["html"] == html for g in got)
