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

EXTRACT_VERSION = 2

# v2: ONE fused pass removes script/style blocks (with content), comments and
# tags — alternation order resolves overlaps (script-block, then comment,
# then bare tag at the same position). ~2.6x faster than the v1 sequential
# passes; byte-identical on well-formed html (v1 differed only on the
# pathological "<script> inside a comment" overlap, where v1 left a dangling
# "<!--" in the output). Fixture caches are keyed by EXTRACT_VERSION.
_STRIP = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>|<!--.*?-->|<[^>]*>", re.I | re.S)
# Whitespace collapse (≙ normalize_string's whitespace semantics) is
# str.split()/join — same unicode whitespace class as regex \s, fewer copies.
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
_ENTITY_RE = re.compile("|".join(re.escape(k) for k in _ENTITIES))

# href + anchor extraction for the links child table.
_A_RE = re.compile(
    r"""<a\b[^>]*\bhref\s*=\s*["']([^"']*)["'][^>]*>(.*?)</a\s*>""", re.I | re.S
)


def extract_text(html) -> str | None:
    """Pure, deterministic text extraction. None in → None out."""
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray, memoryview)):
        s = bytes(html).decode("utf-8", errors="replace")
    else:
        s = html
    s = _STRIP.sub(" ", s)
    s = _ENTITY_RE.sub(lambda m: _ENTITIES[m.group(0)], s)
    return " ".join(s.split())


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
