"""Deterministic multi-capture (recrawl) fixture — the CDX/wayback shape.

A web archive holds MANY captures of the same url at different timestamps;
the churn profile (how often a page's content actually changes between
captures) drives recrawl scheduling and snapshot-dedup policy. The pages
fixture is capture-unique by construction (its url duplicates are C1
violations, ~0.05%), so the recrawl-delta operator synthesizes its own
corpus here — same convention as the pages/lines fixtures: seeded numpy
generation, idempotent cache under ``/tmp/lk_recrawl``, parquet the DuckDB
oracle reads by absolute path.

Injected structure (all deterministic under the seed):
  * per-url capture counts 1–5 (P(1)=.35, P(2)=.25, P(3)=.2, P(4)=.12,
    P(5)=.08) — most pages crawled once or twice, a tail recrawled often;
  * strictly increasing capture timestamps per url (1h–30d gaps);
  * between consecutive captures the text CHANGES with p=0.4 (a fresh
    body), else is byte-identical to the previous capture — so both the
    "changed" and "unchanged" lag branches carry real mass;
  * rows are globally shuffled across files, so one url's captures span
    input fragments and the per-url regroup is a genuine exchange.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

RECRAWL_VERSION = 1

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu "
    "news sport weather market finance travel health science culture tech"
).split()


def generate_recrawl(out_dir: str, n_urls: int, seed: int = 42,
                     n_files: int = 4) -> None:
    """Generate the capture table into ``out_dir`` (atomic: tmp + rename)."""
    rng = np.random.default_rng(seed)
    n_caps = rng.choice([1, 2, 3, 4, 5], size=n_urls,
                        p=[0.35, 0.25, 0.20, 0.12, 0.08])
    urls, tss, texts = [], [], []
    base = np.datetime64("2025-01-01T00:00:00", "us")

    def body(uid: int, version: int) -> str:
        w = [_WORDS[i] for i in rng.integers(0, len(_WORDS), 12)]
        return f"page {uid} v{version} " + " ".join(w)

    for u in range(n_urls):
        url = f"https://h{u % 257:04d}.example-{u % 7}.org/r/{u:08d}"
        ts = base + np.timedelta64(int(rng.integers(0, 86_400_000)), "ms")
        text, ver = body(u, 0), 0
        for _ in range(int(n_caps[u])):
            urls.append(url)
            tss.append(ts)
            texts.append(text)
            ts = ts + np.timedelta64(
                int(rng.integers(3_600_000, 2_592_000_000)), "ms")
            if rng.random() < 0.4:
                ver += 1
                text = body(u, ver)
    order = rng.permutation(len(urls))
    tbl = pa.table({
        "url": pa.array(np.array(urls, dtype=object)[order], pa.string()),
        "capture_ts": pa.array(np.array(tss)[order].astype("datetime64[us]"),
                               pa.timestamp("us")),
        "text": pa.array(np.array(texts, dtype=object)[order], pa.string()),
    })
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    bounds = np.linspace(0, tbl.num_rows, n_files + 1).astype(int)
    for f in range(n_files):
        pq.write_table(tbl.slice(bounds[f], bounds[f + 1] - bounds[f]),
                       os.path.join(tmp, f"captures-{f:03d}.parquet"))
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)


def ensure_recrawl(n_urls: int, seed: int = 42,
                   base: str = "/tmp/lk_recrawl") -> str:
    """Idempotent cached generation; returns the fixture dir."""
    out = os.path.join(base, f"n{n_urls}_s{seed}_v{RECRAWL_VERSION}")
    if not os.path.isdir(out) or not os.listdir(out):
        generate_recrawl(out, n_urls, seed=seed)
    return out


def recrawl_nurls_for_sf(sf_dir: str) -> int:
    """Fixture size scaled to the testdata sf (sf0.01 → 1,500 urls)."""
    from .pages import pages_nrows_for_sf

    return max(500, pages_nrows_for_sf(sf_dir) // 40)
