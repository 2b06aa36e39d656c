"""Deterministic HTML → text extraction (the C6 byte-identical invariant).

The reference's extraction is ``normalize_string(" ".join(node.xpath(".//text()")))``
(reference ``scripts/make_texts.py:377,392`` — strip markup, join text nodes,
collapse whitespace). This module is the new engine's equivalent: a **pure
function of the html bytes** — no locale, no library-version dependence, no
randomness — so that extracted text is byte-identical per url across workers,
runs and cluster sizes (BASELINE.json ``input_hint``).

Do not edit the regexes or entity table without bumping EXTRACT_VERSION: the
generator stamps `text = extract_text(html)` at generation time and check C6
re-derives it, so both sides must agree forever.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

EXTRACT_VERSION = 3

# v2: ONE fused pass removes script/style blocks (with content), comments and
# tags — alternation order resolves overlaps (script-block, then comment,
# then bare tag at the same position). ~2.6x faster than the v1 sequential
# passes. Fixture caches are keyed by EXTRACT_VERSION.
# v3: the pass runs at the BYTES level (the hot path hands in zero-copy
# memoryviews of the Arrow buffer — no bytes-object allocation, no full-
# document utf-8 decode; only the extracted text is decoded at the end).
# Byte-visible semantic change vs v2: whitespace collapse is ASCII
# (bytes.split) rather than unicode (str.split) — hence the version bump.
_STRIP = re.compile(
    rb"<(script|style)\b[^>]*>.*?</\1\s*>|<!--.*?-->|<[^>]*>", re.I | re.S)
# _TAG/_WS remain for anchor-text cleanup in extract_links.
_TAG = re.compile(r"<[^>]*>")
_WS = re.compile(r"\s+")

# Minimal, fixed entity table (deterministic — deliberately NOT html.unescape,
# whose table can grow across Python versions).
_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}
_ENTITIES_B = {k.encode(): v.encode() for k, v in _ENTITIES.items()}
_ENTITY_RE = re.compile(b"|".join(re.escape(k) for k in _ENTITIES_B))

# href + anchor extraction for the links child table.
_A_RE = re.compile(
    r"""<a\b[^>]*\bhref\s*=\s*["']([^"']*)["'][^>]*>(.*?)</a\s*>""", re.I | re.S
)


def extract_core_bytes(html_bytes) -> bytes:
    """Bytes-level extraction core: accepts bytes / memoryview (zero-copy
    Arrow buffer slice), returns the extracted text as raw utf-8 bytes —
    no decode at all (the C6 equality check compares these directly against
    the text column's utf-8 buffer)."""
    s = _STRIP.sub(b" ", html_bytes)
    # entity pass only when an ampersand survives the strip (memchr-fast;
    # most documents carry no entities, saving a full regex scan)
    if b"&" in s:
        s = _ENTITY_RE.sub(lambda m: _ENTITIES_B[m.group(0)], s)
    return b" ".join(s.split())


def extract_text_bytes(html_bytes) -> str:
    """Bytes-level extraction, decoded (only the extracted text decodes)."""
    return extract_core_bytes(html_bytes).decode("utf-8", errors="replace")


def extract_text(html) -> str | None:
    """Pure, deterministic text extraction. None in → None out."""
    if html is None:
        return None
    if isinstance(html, str):
        html = html.encode("utf-8", errors="surrogatepass")
    return extract_text_bytes(html)


def binary_views(arr) -> list:
    """Zero-copy per-row memoryviews of an Arrow binary array (None for null
    rows). Avoids ``to_pylist``'s per-row bytes allocation — measured at
    ~1/3 of the row-phase cost on cold buffers."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return []
    bufs = arr.buffers()
    off_t = (np.int64 if (pa.types.is_large_binary(arr.type)
                          or pa.types.is_large_string(arr.type))
             else np.int32)
    offs = np.frombuffer(bufs[1], dtype=off_t, count=n + 1,
                         offset=arr.offset * off_t().itemsize)
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    if arr.null_count == 0:
        return [data[offs[i]:offs[i + 1]] for i in range(n)]
    valid = arr.is_valid().to_numpy(zero_copy_only=False)
    return [data[offs[i]:offs[i + 1]] if valid[i] else None
            for i in range(n)]


def extract_links(html) -> list[tuple[str, str]]:
    """All (href, normalized anchor text) pairs in document order.

    Ordinals assigned by the caller are within-document positions — stable and
    content-derived, unlike the reference's iteration-order ordinals
    (``scripts/make_texts.py:375,393``).
    """
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray, memoryview)):
        s = bytes(html).decode("utf-8", errors="replace")
    else:
        s = html
    out = []
    for m in _A_RE.finditer(s):
        href = m.group(1)
        anchor = _WS.sub(" ", _TAG.sub(" ", m.group(2))).strip()
        out.append((href, anchor))
    return out
