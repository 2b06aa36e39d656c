"""PII / URL redaction for webtext curation (vectorized RE2 kernels).

A standard pre-training scrub step the reference lacks: mask emails,
URLs and IPv4 addresses before a corpus ships. Every kernel is an Arrow
RE2 call over the whole column — no per-row Python — and RE2 is also
DuckDB's regex engine, so the driver oracle (``pages_redact``) matches
byte-for-byte by construction.

Patterns apply IN ORDER, each counting matches on the output of the
previous replacement (so an address inside a URL is counted once, as a
URL) — the SQL mirror nests ``regexp_replace`` the same way.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) — order matters (see module docstring)
PATTERNS: list[tuple[str, str, str]] = [
    ("url", r'https?://[^"<\s]+', "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def redact(col: pa.Array | pa.ChunkedArray):
    """Redact every pattern from a string column.

    Returns ``(redacted, counts)`` where counts maps pattern name →
    int64 array of per-row match counts (null rows stay null).
    """
    counts: dict[str, pa.ChunkedArray] = {}
    out = col
    for name, pat, repl in PATTERNS:
        counts[name] = pc.cast(
            pc.count_substring_regex(out, pat), pa.int64())
        out = pc.replace_substring_regex(out, pat, repl)
    return out, counts
