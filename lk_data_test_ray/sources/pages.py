"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md F1-F5).

Pure function of ``(seed, n_rows)``: same inputs → byte-identical parquet
content. Violations are injected at known rows and recorded in a golden
``expected_violations.parquet`` (≙ the reference's frozen review artifacts,
e.g. ``AmbiguousFackelReferences.txt`` and ``rdf/fackel_quotes_counter.json``,
reference ``curation/check_fackel_references.py:36-37,74-76``).

Outputs under ``out_dir``:
    pages/part-{i:05d}.parquet      the fact table, 16 uniform files (= resume
                                    partitions), row groups of 4096 rows
    links.parquet                   outbound-link child table (F4)
    lang_hist.parquet               true lang mixture (F2, drift baseline)
    expected_violations.parquet     golden violations (F5)
    meta.json                       exact stats (url cardinality, lang counts,
                                    text length quantiles, injection counts)
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.extract import EXTRACT_VERSION, extract_text
from ..schema import LANG_HIST_SCHEMA, LINKS_SCHEMA, PAGES_SCHEMA

# Head-heavy lang mixture (FIXTURES.md F1; mirrors web-corpus skew).
LANG_MIX: list[tuple[str, float]] = [
    ("en", 0.55), ("de", 0.15), ("fr", 0.08), ("es", 0.07), ("ru", 0.05),
    ("zh", 0.04), ("it", 0.02), ("pt", 0.02), ("nl", 0.01), ("ja", 0.01),
]

N_FILES = 16
TS_LO_US = np.datetime64("2013-01-01", "us").astype("int64")
TS_HI_US = np.datetime64("2025-01-01", "us").astype("int64")

_SYL = ["ba", "re", "mo", "ti", "ka", "lu", "sen", "dor", "vi", "na",
        "pel", "gra", "shu", "mi", "tor", "el", "an", "qui", "zo", "fa"]


def _word_pool(rng: np.random.Generator, size: int = 4096) -> np.ndarray:
    n_syl = rng.integers(2, 5, size=size)
    idx = rng.integers(0, len(_SYL), size=(size, 4))
    return np.array(
        ["".join(_SYL[idx[i, j]] for j in range(n_syl[i])) for i in range(size)],
        dtype=object,
    )


def _assemble_vectorized(pool, n_words, flat, offs, n_links, link_offs,
                         dst_all):
    """Arrow-kernel html/text assembly: word-pool dictionary ``take`` + list
    ``binary_join`` + element-wise concat. Pure function of the pre-drawn
    arrays; byte-identical to ``_build_chunk`` (asserted by the caller).
    Returns Arrow arrays (html large_binary, text large_string, per-link
    anchor large_string)."""
    n = len(n_words)
    L = len(dst_all)
    S = lambda s: pa.scalar(s, pa.large_string())  # noqa: E731
    pool_pa = pa.array(pool.tolist(), pa.large_string())
    words = pool_pa.take(pa.array(flat, pa.int64()))
    body = pc.binary_join(
        pa.LargeListArray.from_arrays(pa.array(offs, pa.int64()), words), S(" "))
    # titles: first min(4, n_words) words of each row
    tcnt = np.minimum(n_words, 4)
    toffs = np.concatenate([[0], np.cumsum(tcnt)])
    tseg = np.arange(int(toffs[-1])) - np.repeat(toffs[:-1], tcnt)
    tidx = np.repeat(offs[:-1], tcnt) + tseg
    twords = pool_pa.take(pa.array(flat[tidx], pa.int64()))
    title = pc.binary_join(
        pa.LargeListArray.from_arrays(pa.array(toffs, pa.int64()), twords),
        S(" "))
    loffs64 = pa.array(link_offs, pa.int64())
    if L:
        # anchors: words[start : start+cnt] with start = ordinal % max(1,
        # len-2), cnt = min(2, len-start) — same slice the row loop takes
        row = np.repeat(np.arange(n), n_links)
        ordinal = np.arange(L) - np.repeat(link_offs[:-1], n_links)
        wl = n_words[row]
        start = ordinal % np.maximum(1, wl - 2)
        cnt = np.minimum(2, wl - start)
        aoffs = np.concatenate([[0], np.cumsum(cnt)])
        aseg = np.arange(int(aoffs[-1])) - np.repeat(aoffs[:-1], cnt)
        aidx = np.repeat(offs[row], cnt) + np.repeat(start, cnt) + aseg
        awords = pool_pa.take(pa.array(flat[aidx], pa.int64()))
        anchor = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(aoffs, pa.int64()),
                                          awords), S(" "))
        dst_pa = pa.array(dst_all.tolist(), pa.large_string())
        li = pc.binary_join_element_wise(
            S('<li><a href="'), dst_pa, S('">'), anchor, S("</a></li>"),
            S(""))
        links_joined = pc.binary_join(
            pa.LargeListArray.from_arrays(loffs64, li), S(""))
        anchors_row = pc.binary_join(
            pa.LargeListArray.from_arrays(loffs64, anchor), S(" "))
    else:
        links_joined = anchors_row = pa.array([""] * n, pa.large_string())
        anchor = pa.array([], pa.large_string())
    i_str = pc.cast(pa.array(np.arange(n, dtype=np.int64)),
                    pa.large_string())
    html_str = pc.binary_join_element_wise(
        S("<html><head><title>"), title,
        S("</title><style>.c{margin:0;color:#222}</style></head><body><h1>"),
        title, S("</h1>\n<p>"), body, S("</p>\n<ul>"), links_joined,
        S("</ul><script>var t="), i_str, S(";</script></body></html>"),
        S(""))
    # text == what extract_text(html) yields: title appears in <title> and
    # <h1>, then the body paragraph, then the anchor texts, single-spaced
    base = pc.binary_join_element_wise(title, title, body, S(" "))
    text_pa = pc.if_else(
        pc.equal(anchors_row, S("")), base,
        pc.binary_join_element_wise(base, anchors_row, S(" ")))
    # stays Arrow end-to-end: object-array round-trips cost ~2 s per M rows
    if isinstance(anchor, pa.ChunkedArray):
        anchor = anchor.combine_chunks()
    return html_str.cast(pa.large_binary()), text_pa, anchor


def _build_chunk(args):
    """Assemble html/text/link rows for rows [lo, hi) — pure function of the
    pre-drawn arrays (no rng): output is byte-identical to the sequential
    loop regardless of chunking."""
    lo, hi, pool, n_words, flat, n_links, dst = args
    offs = np.concatenate([[0], np.cumsum(n_words)])
    loffs = np.concatenate([[0], np.cumsum(n_links)])
    html = np.empty(hi - lo, dtype=object)
    text = np.empty(hi - lo, dtype=object)
    link_rows: list[tuple[int, str, str]] = []
    for i in range(hi - lo):
        words = pool[flat[offs[i]:offs[i + 1]]]
        title = " ".join(words[:4])
        body = " ".join(words)
        parts = [
            f"<html><head><title>{title}</title>"
            "<style>.c{margin:0;color:#222}</style></head>"
            f"<body><h1>{title}</h1>\n<p>{body}</p>\n<ul>"
        ]
        for j in range(loffs[i], loffs[i + 1]):
            ordinal = j - loffs[i]
            anchor = " ".join(
                words[ordinal % max(1, len(words) - 2):][:2])
            parts.append(f'<li><a href="{dst[j]}">{anchor}</a></li>')
            link_rows.append((ordinal, dst[j], anchor))
        parts.append(f"</ul><script>var t={lo + i};</script></body></html>")
        html[i] = "".join(parts).encode("utf-8")
        text[i] = extract_text(html[i])
    return html, text, link_rows


def pages_nrows_for_sf(sf_dir: str) -> int:
    """Map a testdata sf dir name to a pages row count (mirrors TESTDATA.md)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    sf = float(name.replace("sf", "")) if name.startswith("sf") else 0.001
    return max(1000, int(round(sf * 6_000_000)))


def generate_pages(out_dir: str, n_rows: int, seed: int = 42,
                   lang_mix=None, n_files: int = N_FILES) -> dict:
    """Generate the pages fixture set into ``out_dir`` (atomic: tmp + rename)."""
    lang_mix = lang_mix or LANG_MIX
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "pages"))
    rng = np.random.default_rng(seed)
    n = n_rows

    # --- urls: Zipf-skewed hosts (hot-host skew), unique counter paths -------
    n_hosts = 1000
    host_w = 1.0 / np.power(np.arange(1, n_hosts + 1), 1.1)
    host_w /= host_w.sum()
    hosts = np.array([f"h{i:04d}.example-{i % 7}.org" for i in range(n_hosts)], dtype=object)
    host_idx = rng.choice(n_hosts, size=n, p=host_w)
    urls = np.array(
        [f"https://{hosts[host_idx[i]]}/p/{i:09d}" for i in range(n)], dtype=object
    )

    # --- pick all injection rows up front (disjoint sets) --------------------
    n_dup_pairs = max(1, n // 2000)
    n_oor = max(1, n // 2000)
    n_html_null = max(1, n // 5000)
    n_text_null = max(1, n // 2000)
    n_mut = max(1, n // 5000)
    n_bad_lang = max(1, n // 1000)
    total = 2 * n_dup_pairs + n_oor + n_html_null + n_text_null + n_mut + n_bad_lang
    pick = rng.choice(n, size=total, replace=False)
    k = 0
    dup_a, dup_b = pick[k:k + n_dup_pairs], pick[k + n_dup_pairs:k + 2 * n_dup_pairs]
    k += 2 * n_dup_pairs
    oor = pick[k:k + n_oor]; k += n_oor
    html_null = pick[k:k + n_html_null]; k += n_html_null
    text_null = pick[k:k + n_text_null]; k += n_text_null
    mut = pick[k:k + n_mut]; k += n_mut
    bad_lang = pick[k:k + n_bad_lang]; k += n_bad_lang

    # url dups injected BEFORE link generation so link targets stay resolvable
    urls[dup_b] = urls[dup_a]

    # --- timestamps ----------------------------------------------------------
    ts = rng.integers(TS_LO_US, TS_HI_US, size=n, dtype=np.int64)

    # --- langs ---------------------------------------------------------------
    lang_vals = np.array([c for c, _ in lang_mix], dtype=object)
    lang_p = np.array([p for _, p in lang_mix])
    lang_p = lang_p / lang_p.sum()
    lang_idx = rng.choice(len(lang_vals), size=n, p=lang_p)
    langs = lang_vals[lang_idx]

    # --- text + html ---------------------------------------------------------
    pool = _word_pool(rng)
    n_words = np.clip(
        np.exp(rng.normal(np.log(60.0), 0.6, size=n)).astype(np.int64), 5, 400
    )
    flat = rng.integers(0, len(pool), size=int(n_words.sum()))
    offs = np.concatenate([[0], np.cumsum(n_words)])
    n_links = rng.integers(0, 4, size=n)
    link_dst_row = rng.integers(0, n, size=int(n_links.sum()))
    link_offs = np.concatenate([[0], np.cumsum(n_links)])
    dangling_mask = rng.random(int(n_links.sum())) < 0.01

    # link destinations resolved up front (vectorized) so assembly chunks
    # never need the full url array
    dst_all = urls[link_dst_row].copy() if len(link_dst_row) else \
        np.empty(0, dtype=object)
    for j in np.flatnonzero(dangling_mask):
        dst_all[j] = f"https://dangling.example/x{j:07d}"

    # fully vectorized assembly on Arrow kernels (dictionary take + list
    # binary_join): ~20× the per-row Python loop, byte-identical — asserted
    # against the reference row loop (_build_chunk) on a sample every run.
    # (A multiprocessing pool was measured SLOWER than the serial loop on
    # this host — result unpickling + per-process first-touch stalls.)
    html_arr, text_arr, anchor_arr = _assemble_vectorized(
        pool, n_words, flat, offs, n_links, link_offs, dst_all)
    ordinals = ((np.arange(len(dst_all))
                 - np.repeat(link_offs[:-1], n_links))
                if len(dst_all) else np.empty(0, dtype=np.int64))
    sample = min(n, 2000)
    if sample:
        ref_h, ref_t, ref_l = _build_chunk(
            (0, sample, pool, n_words[:sample], flat[:offs[sample]],
             n_links[:sample], dst_all[:link_offs[sample]]))
        ls = int(link_offs[sample])
        assert (html_arr.slice(0, sample).to_pylist() == list(ref_h)
                and text_arr.slice(0, sample).to_pylist() == list(ref_t)
                and [(int(o), d, a) for o, d, a in zip(
                    ordinals[:ls], dst_all[:ls],
                    anchor_arr.slice(0, ls).to_pylist())] == ref_l), \
            "vectorized assembly diverged from the reference row loop"

    # --- apply remaining injections ------------------------------------------
    half = n_oor // 2
    ts[oor[:half]] = 0  # epoch 0 (1970)
    ts[oor[half:]] = np.datetime64("2038-01-19T03:14:07", "us").astype("int64")

    # null html + null text is NOT a violation; html non-null + null text
    # (the text_null set) IS a C2 violation. Nulling via vectorized if_else.
    hmask = np.zeros(n, dtype=bool)
    hmask[html_null] = True
    html_arr = pc.if_else(pa.array(hmask),
                          pa.scalar(None, pa.large_binary()), html_arr)
    tmask = hmask.copy()
    tmask[text_null] = True
    text_arr = pc.if_else(pa.array(tmask),
                          pa.scalar(None, pa.large_string()), text_arr)

    # C6 mutation (" ZMUTATED" suffix) scattered back via concat + take —
    # mut rows are disjoint from the null sets, so they are never null here
    if len(mut):
        mut_rows = pc.binary_join_element_wise(
            text_arr.take(pa.array(mut, pa.int64())),
            pa.scalar(" ZMUTATED", pa.large_string()),
            pa.scalar("", pa.large_string()))
        combined = pa.concat_arrays(
            [text_arr, mut_rows.combine_chunks()
             if isinstance(mut_rows, pa.ChunkedArray) else mut_rows])
        idx = np.arange(n, dtype=np.int64)
        idx[mut] = n + np.arange(len(mut))
        text_arr = combined.take(pa.array(idx))

    bad_vals = np.array(["xx", "q1", ""], dtype=object)
    langs[bad_lang] = bad_vals[np.arange(n_bad_lang) % 3]

    # --- expected violations golden (F5) -------------------------------------
    ev_check, ev_url, ev_detail = [], [], []

    def _ev(cid, us, details):
        ev_check.extend([cid] * len(us))
        ev_url.extend(us)
        ev_detail.extend(details)

    _ev("c1_url_unique", list(urls[dup_a]), ["count=2"] * n_dup_pairs)
    _ev("c4_ts_range", list(urls[oor]),
        [str(np.int64(t).astype("datetime64[us]")) for t in ts[oor]])
    _ev("c2_nonnull", list(urls[text_null]),
        ["html non-null but text null/empty"] * n_text_null)
    _ev("c6_extract_match", list(urls[mut]),
        ["extract_text(html) != text"] * n_mut)
    _ev("c3_lang_vocab", list(urls[bad_lang]),
        [f"lang={v!r}" for v in langs[bad_lang]])

    expected = pa.table({
        "check_id": pa.array(ev_check, pa.string()),
        "url": pa.array(ev_url, pa.string()),
        "detail": pa.array(ev_detail, pa.string()),
    })
    pq.write_table(expected, os.path.join(tmp, "expected_violations.parquet"))

    # --- links child table (src filled with final urls) ----------------------
    src = np.repeat(urls, n_links)
    links = pa.table({
        "src_url": pa.array(src, pa.string()),
        "ordinal": pa.array(ordinals.astype(np.int32), pa.int32()),
        "dst_url": pa.array(dst_all, pa.string()),
        "anchor": anchor_arr.cast(pa.string()),
    }, schema=LINKS_SCHEMA)
    pq.write_table(links, os.path.join(tmp, "links.parquet"))

    # --- lang hist (F2) ------------------------------------------------------
    pq.write_table(
        pa.table({"lang": lang_vals, "expected_fraction": lang_p},
                 schema=LANG_HIST_SCHEMA),
        os.path.join(tmp, "lang_hist.parquet"),
    )

    # --- pages files (16 uniform partitions; row groups of 4096) -------------
    # html/text stay large_binary/large_string in memory (a single regular
    # array would overflow 2^31 bytes at volume). The parquet physical type
    # (BYTE_ARRAY) is identical; ``store_schema=False`` drops the arrow
    # schema blob so read-back infers the declared regular binary/string of
    # PAGES_SCHEMA (and the schema stays hashable for Ray — see
    # BASELINE.md's schema-hash warning note).
    url_pa = pa.array(urls, pa.string())
    ts_pa = pa.array(ts, pa.timestamp("us"))
    lang_pa = pa.array(langs, pa.string())
    per = -(-n // n_files)
    for f in range(n_files):
        lo, hi = f * per, min(n, (f + 1) * per)
        if hi <= lo:
            break
        part = pa.table({
            "url": url_pa.slice(lo, hi - lo),
            "warc_ts": ts_pa.slice(lo, hi - lo),
            "html": html_arr.slice(lo, hi - lo),
            "text": text_arr.slice(lo, hi - lo),
            "lang": lang_pa.slice(lo, hi - lo),
        })
        pq.write_table(part, os.path.join(tmp, "pages", f"part-{f:05d}.parquet"),
                       row_group_size=4096, store_schema=False)

    # --- exact stats for oracle tests (F5) -----------------------------------
    tl = pc.utf8_length(text_arr)
    langs_nonnull, counts = np.unique(np.asarray(langs, dtype=object), return_counts=True)
    meta = {
        "n_rows": n,
        "seed": seed,
        "url_cardinality": len(set(urls.tolist())),
        "lang_counts": {str(a): int(b) for a, b in zip(langs_nonnull, counts)},
        "text_null_count": int(pc.sum(pc.is_null(text_arr).cast(pa.int32())).as_py()),
        "text_len_quantiles": {
            str(q): float(np.quantile(
                np.asarray(tl.drop_null()), q)) for q in (0.1, 0.5, 0.9, 0.99)
        },
        "injected": {
            "dup_pairs": n_dup_pairs, "ts_oor": n_oor, "html_null": n_html_null,
            "text_null": n_text_null, "text_mutated": n_mut, "bad_lang": n_bad_lang,
        },
        "extract_version": EXTRACT_VERSION,
    }
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)

    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)
    return meta


def ensure_pages(n_rows: int, seed: int = 42, base: str = "/tmp/lk_pages",
                 lang_mix=None, tag: str = "") -> str:
    """Idempotent cached generation; returns the fixture dir.

    Cache key includes EXTRACT_VERSION: the generator stamps
    ``text = extract_text(html)``, so a new extraction version invalidates
    cached fixtures (C6 re-derives with the same function)."""
    out = os.path.join(base, f"n{n_rows}_s{seed}_x{EXTRACT_VERSION}{tag}")
    if not os.path.exists(os.path.join(out, "meta.json")):
        generate_pages(out, n_rows, seed=seed, lang_mix=lang_mix)
    return out
