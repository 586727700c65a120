"""URL canonicalization, host extraction, and stable URL hashing.

The web analog of the reference's URL handling:

- strip/normalize before use      -> ``SharePointClient.cs:207-208`` (leading
  '/' strip + query suffix handling) and ``SharePointClient.cs:138-139``;
- quote escaping of URL literals  -> ``SharePointClient.cs:387``;
- absolute source-URL construction-> ``SharePointClient.cs:92-94,432``
  (``scheme://host`` + server-relative URL == our ``urljoin(base, href)``).

Canonical form (the engine's ONE partitioning key is ``hash64(canonical_url)``):

1. resolve relative/protocol-relative hrefs against the fetching page's URL;
2. lowercase scheme + host; drop default ports (``:80`` http / ``:443`` https);
3. drop the fragment;
4. drop tracking params (``utm_*``); sort surviving query params bytewise;
5. resolve dot-segments (via ``urllib.parse.urljoin``); empty path -> ``/``.

These rules are shared verbatim by the sequential oracle and the distributed
pipeline, so crawl-order / seen-set conformance does not depend on them being
"right" — only on them being one function.
"""

from __future__ import annotations

import hashlib
from urllib.parse import urljoin, urlsplit, urlunsplit, parse_qsl, urlencode

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize(href: str, base: str | None = None) -> str | None:
    """Canonicalize ``href`` (optionally relative to ``base``). None if unusable."""
    href = href.strip()
    if not href or href.startswith(("javascript:", "mailto:", "data:")):
        return None
    absolute = urljoin(base, href) if base else href
    try:
        parts = urlsplit(absolute)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = (parts.hostname or "").lower()
    if not host:
        return None
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    query = ""
    if parts.query:
        kept = sorted(
            (k, v) for k, v in parse_qsl(parts.query, keep_blank_values=True)
            if not k.lower().startswith("utm_")
        )
        query = urlencode(kept)
    return urlunsplit((scheme, netloc, path, query, ""))


def host_of(url: str) -> str:
    return urlsplit(url).hostname or ""


def path_of(url: str) -> str:
    return urlsplit(url).path or "/"


def url_hash64(url: str) -> int:
    """Stable 63-bit hash of a canonical URL (fits signed int64 / parquet).

    blake2b is stable across processes and Python versions (unlike ``hash()``),
    which the sharded seen-set and hash-bucketed pages layout both require.
    """
    d = hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(d, "big") & 0x7FFF_FFFF_FFFF_FFFF


def canonicalize_batch(hrefs, bases=None):
    """Canonicalize a batch (list/ndarray of str). Returns list[str|None].

    Canonicalization is irreducibly per-string (urljoin + query-param sort);
    this loop runs inside ``map_batches`` over a whole Arrow batch, not per-row
    tasks — the per-call Python overhead is amortized across the batch.
    """
    if bases is None:
        return [canonicalize(h) for h in hrefs]
    return [canonicalize(h, b) for h, b in zip(hrefs, bases)]
