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

EXTRACT_VERSION = 1

# Remove <script>/<style> elements including their content (non-greedy, dotall).
_SCRIPT_STYLE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.I | re.S)
# Remove comments.
_COMMENT = re.compile(r"<!--.*?-->", re.S)
# Any remaining tag.
_TAG = re.compile(r"<[^>]*>")
# Whitespace collapse (≙ normalize_string's whitespace semantics).
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
    s = _SCRIPT_STYLE.sub(" ", s)
    s = _COMMENT.sub(" ", s)
    s = _TAG.sub(" ", s)
    s = _ENTITY_RE.sub(lambda m: _ENTITIES[m.group(0)], s)
    s = _WS.sub(" ", s).strip()
    return s


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
