"""Deterministic line-structured text fixture (the C4-filter input shape).

The testdata ``documents.text`` carries no newlines or punctuation, so the
line-level cleaning operators (``td_c4_line_filters``) synthesize their own
corpus here — same convention as the pages/payload fixtures: seeded numpy
generation, idempotent cache under ``/tmp/lk_lines``, parquet output the
DuckDB oracle reads by absolute path.

Injected structure (all rates deterministic under the seed):
  * per-line: ~55% end in a terminal punctuation mark ``. ! ? "``; word
    counts 1-12 (so the ≥3-words rule bites); ~4% of lines contain the
    word "javascript" (C4 drops those lines);
  * per-doc: 4-24 lines; ~6% of docs contain a ``{`` line and ~4% a
    "lorem ipsum" line (C4 drops those whole pages);
  * ~12% of docs embed one of three shared 3-line boilerplate blocks
    (cookie banner / nav footer / subscribe plea) at a random position —
    the cross-document duplicate spans C4's three-sentence-span dedup
    (``dd_c4_spans``) exists to remove.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LINES_VERSION = 2

_BOILERPLATE = [
    ["This site uses cookies to improve your experience.",
     "By continuing you accept our cookie policy.",
     "Click here to manage your preferences."],
    ["Home News Sports Opinion Contact.",
     "Copyright all rights reserved worldwide.",
     "Terms of service and privacy policy apply."],
    ["Subscribe to our newsletter today!",
     "Get the latest stories in your inbox.",
     "No spam ever, unsubscribe any time."],
]

_WORDS = (
    "the quick brown fox jumps over lazy dog data table stream batch "
    "window merge sort scan join filter shard token corpus model layer "
    "crawl index fetch parse render cache proxy queue worker node block"
).split()

_PUNCT = [".", "!", "?", '"']


def _gen_doc(rng: np.random.Generator) -> str:
    n_lines = int(rng.integers(4, 25))
    lines = []
    for _ in range(n_lines):
        n_words = int(rng.integers(1, 13))
        words = [_WORDS[i] for i in rng.integers(0, len(_WORDS), n_words)]
        if rng.random() < 0.04:
            words[int(rng.integers(0, n_words))] = "JavaScript"
        line = " ".join(words)
        if rng.random() < 0.55:
            line += _PUNCT[int(rng.integers(0, len(_PUNCT)))]
        if rng.random() < 0.10:  # leading/trailing spaces exercise the trim
            line = " " + line + " "
        lines.append(line)
    if rng.random() < 0.12:
        block = _BOILERPLATE[int(rng.integers(0, len(_BOILERPLATE)))]
        at = int(rng.integers(0, len(lines) + 1))
        lines[at:at] = block
    r = rng.random()
    if r < 0.06:
        lines.append("function f() { return 1; }")
    elif r < 0.10:
        lines.append("lorem ipsum dolor sit amet.")
    return "\n".join(lines)


def generate_lines(out_dir: str, n_docs: int, seed: int = 42,
                   n_files: int = 4) -> None:
    """Generate the line corpus into ``out_dir`` (atomic: tmp + rename)."""
    rng = np.random.default_rng(seed)
    texts = [_gen_doc(rng) for _ in range(n_docs)]
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    bounds = np.linspace(0, n_docs, n_files + 1).astype(int)
    for f in range(n_files):
        lo, hi = int(bounds[f]), int(bounds[f + 1])
        tbl = pa.table({
            "doc_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
            "text": pa.array(texts[lo:hi], pa.string()),
        })
        pq.write_table(tbl, os.path.join(tmp, f"lines-{f:03d}.parquet"))
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)


def ensure_lines(n_docs: int, seed: int = 42,
                 base: str = "/tmp/lk_lines") -> str:
    """Idempotent cached generation; returns the fixture dir."""
    out = os.path.join(base, f"n{n_docs}_s{seed}_v{LINES_VERSION}")
    if not os.path.isdir(out) or not os.listdir(out):
        generate_lines(out, n_docs, seed=seed)
    return out


def lines_ndocs_for_sf(sf_dir: str) -> int:
    """Fixture size scaled to the testdata sf (sf0.01 → 1,500 docs)."""
    from .pages import pages_nrows_for_sf

    return max(500, pages_nrows_for_sf(sf_dir) // 40)
