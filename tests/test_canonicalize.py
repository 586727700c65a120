"""Tests for URL canonicalization + stable hashing (SURVEY.md §2.2 M1/M2/M9/M10)."""

from engine.canonicalize import canonicalize, canonicalize_batch, host_of, path_of, url_hash64


BASE = "https://h0.example.test/d2/p5.html"


def test_absolute_passthrough():
    assert canonicalize("https://h1.example.test/a/b.html") == "https://h1.example.test/a/b.html"


def test_relative_resolution():
    assert canonicalize("/d1/p9.html", BASE) == "https://h0.example.test/d1/p9.html"
    assert canonicalize("../d1/p9.html", BASE) == "https://h0.example.test/d1/p9.html"
    assert canonicalize("p7.html", BASE) == "https://h0.example.test/d2/p7.html"


def test_protocol_relative():
    assert canonicalize("//h2.example.test/x.html", BASE) == "https://h2.example.test/x.html"


def test_fragment_stripped():
    assert canonicalize("https://h.x/a.html#frag") == "https://h.x/a.html"


def test_tracking_params_stripped_and_sorted():
    assert (
        canonicalize("https://h.x/a.html?utm_source=s&b=2&a=1&utm_medium=m")
        == "https://h.x/a.html?a=1&b=2"
    )
    assert canonicalize("https://h.x/a.html?utm_source=s") == "https://h.x/a.html"


def test_host_case_and_default_port():
    assert canonicalize("HTTPS://H0.EXAMPLE.TEST:443/d1/P.html") == "https://h0.example.test/d1/P.html"
    assert canonicalize("http://h.x:80/a") == "http://h.x/a"
    assert canonicalize("http://h.x:8080/a") == "http://h.x:8080/a"


def test_empty_path_becomes_root():
    assert canonicalize("https://h.x") == "https://h.x/"


def test_rejects_non_http():
    assert canonicalize("mailto:a@b.c") is None
    assert canonicalize("javascript:void(0)", BASE) is None
    assert canonicalize("ftp://h.x/a") is None
    assert canonicalize("") is None


def test_seed_duplicate_variant_canonicalizes_same():
    a = canonicalize("https://h0.example.test/d0/p1.html")
    b = canonicalize("https://H0.EXAMPLE.TEST/d0/p1.html?utm_source=seed#top")
    assert a == b


def test_host_and_path():
    assert host_of(BASE) == "h0.example.test"
    assert path_of(BASE) == "/d2/p5.html"


def test_hash_stable_and_63bit():
    h = url_hash64(BASE)
    assert h == url_hash64(BASE)
    assert 0 <= h < 2**63
    assert url_hash64("https://h.x/a") != url_hash64("https://h.x/b")


def test_batch():
    out = canonicalize_batch(["/a.html", "mailto:x"], [BASE, BASE])
    assert out == ["https://h0.example.test/a.html", None]
