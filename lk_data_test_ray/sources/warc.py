"""WARC-style web-archive record source: parse raw archive bytes into rows.

Common-Crawl-shaped ingestion (the `input_hint` corpus is "Common-Crawl-style
web pages"): the raw unit of web-scale text acquisition is a WARC segment —
a flat file of concatenated records, each a small header block plus a binary
payload. This module

  * serializes the deterministic pages fixture into ``*.warc`` segment files
    (one segment per parquet row-group range, written distributedly), and
  * ``read_warc``: parses segments back into an Arrow table of
    (url, warc_ts, html) — ONE task per segment file, the same unit real
    WARC processing uses (a 100 TB crawl = ~90k independent segment tasks).

Record format (simplified WARC/1.0 — fixed header order, CRLF delimited):

    WARC/1.0\r\n
    WARC-Target-URI: <url>\r\n
    WARC-Date: <iso8601, microseconds, Z>\r\n
    WARC-Payload-Missing: <0|1>\r\n
    Content-Length: <payload bytes>\r\n
    \r\n
    <payload>\r\n\r\n

``WARC-Payload-Missing: 1`` distinguishes a NULL html payload from an empty
one so the round trip is lossless. Parsing walks Content-Length cursors —
never a regex over payload bytes (payloads may contain header-like text).

Reference analog: S1/S2 file ingestion (``scripts/make_texts.py:230-232``
glob-per-file reads); the segment-per-task layout is its distributed form.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import ray
import ray.data as rd

_HDR_END = b"\r\n\r\n"


def _record_bytes(url: str, ts_iso: str, payload: bytes | None) -> bytes:
    missing = payload is None
    body = b"" if missing else payload
    head = (f"WARC/1.0\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts_iso}\r\n"
            f"WARC-Payload-Missing: {int(missing)}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode()
    return head + body + b"\r\n\r\n"


def segment_table(tbl: pa.Table, url_col: str = "url",
                  ts_col: str = "warc_ts",
                  payload_col: str = "html") -> bytes:
    """One segment's bytes from an Arrow slab (record order = row order)."""
    urls = tbl[url_col].to_pylist()
    # isoformat with forced microseconds so parse→format round-trips exactly
    tss = [t.strftime("%Y-%m-%dT%H:%M:%S.%fZ")
           for t in tbl[ts_col].to_pylist()]
    payloads = tbl[payload_col].to_pylist()
    return b"".join(_record_bytes(u, t, p)
                    for u, t, p in zip(urls, tss, payloads))


def segment_table_gz(tbl: pa.Table, url_col: str = "url",
                     ts_col: str = "warc_ts",
                     payload_col: str = "html") -> bytes:
    """One ``.warc.gz`` segment: each record compressed as its OWN gzip
    member and the members concatenated — the actual Common-Crawl layout
    (member-per-record is what makes byte-range random access into a 1 GB
    segment possible once an index records member offsets)."""
    import zlib

    urls = tbl[url_col].to_pylist()
    tss = [t.strftime("%Y-%m-%dT%H:%M:%S.%fZ")
           for t in tbl[ts_col].to_pylist()]
    payloads = tbl[payload_col].to_pylist()
    parts = []
    for u, t, p in zip(urls, tss, payloads):
        co = zlib.compressobj(6, zlib.DEFLATED, 31)  # wbits=31: gzip member
        parts.append(co.compress(_record_bytes(u, t, p)) + co.flush())
    return b"".join(parts)


def _iter_gzip_members(data: bytes):
    """Walk concatenated gzip members, yielding ``(offset, consumed_len,
    inflated_bytes)`` per member. Input is fed to zlib in bounded chunks
    from a memoryview, so the per-member tail copy (``unused_data``) is
    ≤ one chunk — O(total) over the segment, where the naive
    re-slice-the-remainder walk copies O(members²) bytes at the 1 GB
    member-per-record segment scale. Pure stdlib; raises on truncation."""
    import zlib

    mv = memoryview(data)
    n = len(mv)
    chunk_size = 1 << 18
    pos = 0
    while pos < n:
        d = zlib.decompressobj(31)
        parts = []
        fed = 0
        while not d.eof:
            if pos + fed >= n:
                raise ValueError("truncated gzip member in WARC segment")
            chunk = mv[pos + fed:pos + fed + chunk_size]
            parts.append(d.decompress(chunk))
            fed += len(chunk)
        consumed = fed - len(d.unused_data)
        yield pos, consumed, b"".join(parts)
        pos += consumed


def split_gzip_members(data: bytes) -> list[bytes]:
    """Decompress a stream of concatenated gzip members → one bytes per
    member (chunked ``decompressobj`` walk, zero-copy slicing)."""
    return [rec for _, _, rec in _iter_gzip_members(data)]


def build_gz_index(data: bytes, segment: str) -> pa.Table:
    """CDX-style member index of a ``.warc.gz`` segment: one row per record
    with the member's byte offset + compressed length, keyed by url — the
    structure that makes a 1 GB segment randomly accessible (Common Crawl
    publishes exactly this as its cdx index). Built in the same pass that
    inflates the members, so indexing a segment costs one read."""
    urls, offs, lens = [], [], []
    for pos, consumed, rec in _iter_gzip_members(data):
        hdr_end = rec.find(_HDR_END)
        fields = dict(ln.split(": ", 1)
                      for ln in rec[:hdr_end].decode().split("\r\n")[1:])
        urls.append(fields["WARC-Target-URI"])
        offs.append(pos)
        lens.append(consumed)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "segment": pa.array([segment] * len(urls), pa.string()),
        "offset": pa.array(offs, pa.int64()),
        "length": pa.array(lens, pa.int64()),
    })


def ensure_gz_index(warc_gz_dir: str) -> str:
    """Idempotent: build ``index.parquet`` over every ``*.warc.gz`` segment
    in the directory — one indexing task per segment, results unioned and
    written once (at 100 TB: ~90k segment tasks → one partitioned index)."""
    idx_path = os.path.join(warc_gz_dir, "index.parquet")
    if os.path.exists(idx_path):
        return idx_path
    segs = sorted(glob.glob(os.path.join(warc_gz_dir, "*.warc.gz")))
    if not segs:
        raise FileNotFoundError(f"no .warc.gz segments under {warc_gz_dir}")

    @ray.remote
    def _index_one(p: str) -> pa.Table:
        with open(p, "rb") as fh:
            return build_gz_index(fh.read(), os.path.basename(p))

    parts = ray.get([_index_one.remote(p) for p in segs])
    tmp = idx_path + ".tmp"
    import pyarrow.parquet as _pq

    _pq.write_table(pa.concat_tables(parts), tmp)
    os.replace(tmp, idx_path)
    return idx_path


def fetch_records(warc_gz_dir: str, urls: list[str]) -> pa.Table:
    """Random access: fetch ONLY the requested urls' records by byte range
    — the index maps url → (segment, offset, length); each fetch reads and
    inflates exactly one gzip member, never the segment. This is the shape
    a 100 TB archive is served in production (range request per member)."""
    import zlib

    import pyarrow.compute as pc
    import pyarrow.parquet as _pq

    idx = _pq.read_table(ensure_gz_index(warc_gz_dir))
    want = pa.array(urls, pa.string())
    hits = idx.filter(pc.is_in(idx["url"], value_set=want))
    out = []
    for seg, off, ln in zip(hits["segment"].to_pylist(),
                            hits["offset"].to_pylist(),
                            hits["length"].to_pylist()):
        with open(os.path.join(warc_gz_dir, seg), "rb") as fh:
            fh.seek(off)
            member = fh.read(ln)
        out.append(parse_segment(zlib.decompress(member, 31)))
    if not out:
        return parse_segment(b"")
    return pa.concat_tables(out)


def parse_segment(data: bytes) -> pa.Table:
    """Parse one segment's bytes → (url, warc_ts, html) Arrow table."""
    urls, tss, payloads = [], [], []
    pos, n = 0, len(data)
    while pos < n:
        hdr_end = data.find(_HDR_END, pos)
        if hdr_end < 0:
            raise ValueError(f"truncated record header at byte {pos}")
        lines = data[pos:hdr_end].decode().split("\r\n")
        if lines[0] != "WARC/1.0":
            raise ValueError(f"bad record magic at byte {pos}: {lines[0]!r}")
        fields = dict(ln.split(": ", 1) for ln in lines[1:])
        clen = int(fields["Content-Length"])
        body_start = hdr_end + len(_HDR_END)
        body = data[body_start:body_start + clen]
        if len(body) != clen:
            raise ValueError(f"truncated payload at byte {body_start}")
        urls.append(fields["WARC-Target-URI"])
        tss.append(fields["WARC-Date"])
        payloads.append(None if fields.get("WARC-Payload-Missing") == "1"
                        else body)
        pos = body_start + clen + len(_HDR_END)
    import pyarrow.compute as pc

    # fixture warc_ts is tz-naive timestamp[us]; the trailing Z is literal.
    # Arrow strptime has no %f — the format is fixed-width (%f always six
    # digits), so parse seconds and micros as two vectorized slices.
    s = pa.array(tss, pa.string())
    secs = pc.strptime(pc.utf8_slice_codeunits(s, 0, 19),
                       "%Y-%m-%dT%H:%M:%S", "us")
    micros = pc.utf8_slice_codeunits(s, 20, 26).cast(pa.int64())
    ts = pc.add(secs.cast(pa.int64()), micros).cast(pa.timestamp("us"))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": ts,
        "html": pa.array(payloads, pa.binary()),
    })


def ensure_warc_segments(pages_fixture_dir: str,
                         compress: bool = False,
                         payload: str = "html") -> str:
    """Idempotent: serialize the fixture's pages into ``warc/*.warc``
    (or ``warc_gz/*.warc.gz`` member-per-record gzip when ``compress``).

    ``payload="text"`` writes WET-style conversion segments instead
    (``wet/*.warc.wet.gz``, always member-per-record gzip): the EXTRACTED
    text as each record's payload — the Common-Crawl WET product shape,
    and the sink a 100-TB text-extraction job actually emits.

    ``payload="wat"`` writes WAT-style metadata segments
    (``wat/*.warc.wat.gz``): a small deterministic JSON document per
    record — content_length of the raw html (JSON null when the fetch
    had no payload), extracted-text length, and lang — the third member
    of the Common-Crawl WARC/WAT/WET product trio. The JSON is built
    VECTORIZED inside the write task (one binary_join_element_wise per
    slab, no per-row Python), and payload bytes never cross the object
    store.

    Distributed: one segment per (parquet file, row-group range) scan item,
    named after its item so the layout is deterministic and a rerun
    overwrites in place (S7's idempotent-reload contract).
    """
    from .scan import fused_parquet_map

    if payload == "text":
        compress = True
        out_dir = os.path.join(pages_fixture_dir, "wet")
    elif payload == "wat":
        compress = True
        out_dir = os.path.join(pages_fixture_dir, "wat")
    else:
        out_dir = os.path.join(pages_fixture_dir,
                               "warc_gz" if compress else "warc")
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    pages = os.path.join(pages_fixture_dir, "pages")

    # fn must carry its item identity for the segment name: wrap the scan
    # manually here (fused_parquet_map hides the item), writing inside the
    # read task so payload bytes never cross the object store.
    import pyarrow.parquet as pq

    from ..checks.row import plan_scan_items

    files = sorted(glob.glob(os.path.join(pages, "*.parquet")))
    items = plan_scan_items(files, {f: i for i, f in enumerate(files)})

    def write_item(batch: pa.Table) -> pa.Table:
        names = []
        for p, lo, hi in zip(batch["path"].to_pylist(),
                             batch["rg_lo"].to_pylist(),
                             batch["rg_hi"].to_pylist()):
            pf = pq.ParquetFile(p)
            cols = (["url", "warc_ts", "html", "text", "lang"]
                    if payload == "wat"
                    else ["url", "warc_ts", payload])
            tbl = (pf.read_row_groups(list(range(lo, hi)), columns=cols)
                   if hi > lo else None)
            if tbl is not None and payload == "text":
                # WET conversion records: utf-8 text bytes as payload
                tbl = tbl.set_column(tbl.schema.get_field_index("text"),
                                     "text", tbl["text"].cast(pa.binary()))
            if tbl is not None and payload == "wat":
                import pyarrow.compute as _pc
                cl = _pc.fill_null(_pc.cast(_pc.binary_length(
                    tbl["html"]), pa.string()), "null")
                tl = _pc.fill_null(_pc.cast(_pc.utf8_length(
                    tbl["text"]), pa.string()), "null")
                lg = _pc.fill_null(_pc.binary_join_element_wise(
                    pa.array(['"'] * tbl.num_rows),
                    _pc.cast(tbl["lang"], pa.string()),
                    pa.array(['"'] * tbl.num_rows), ""), "null")
                doc = _pc.binary_join_element_wise(
                    pa.array(['{"content_length":'] * tbl.num_rows),
                    cl, pa.array([',"text_len":'] * tbl.num_rows), tl,
                    pa.array([',"lang":'] * tbl.num_rows), lg,
                    pa.array(["}"] * tbl.num_rows), "")
                tbl = pa.table({"url": tbl["url"],
                                "warc_ts": tbl["warc_ts"],
                                "wat": doc.cast(pa.binary())})
            stem = os.path.splitext(os.path.basename(p))[0]
            ext = (".warc.wet.gz" if payload == "text"
                   else ".warc.wat.gz" if payload == "wat"
                   else ".warc.gz" if compress else ".warc")
            name = os.path.join(out_dir, f"{stem}_rg{lo:05d}-{hi:05d}{ext}")
            tmp = name + ".tmp"
            with open(tmp, "wb") as fh:
                if tbl is not None:
                    fh.write(segment_table_gz(tbl, payload_col=payload)
                             if compress
                             else segment_table(tbl, payload_col=payload))
            os.replace(tmp, name)
            names.append(name)
        return pa.table({"segment": pa.array(names, pa.string())})

    ds = rd.from_arrow_refs([
        ray.put(pa.table({k: [it[k]] for k in ("path", "rg_lo", "rg_hi")}))
        for it in items])
    ds.map_batches(write_item, batch_format="pyarrow",
                   batch_size=1).materialize()
    with open(done, "w") as fh:
        fh.write("ok")
    return out_dir


def read_warc(warc_dir: str) -> rd.Dataset:
    """Dataset of (url, warc_ts, html) parsed from ``*.warc`` /
    ``*.warc.gz`` segments — one task per segment file (payload bytes are
    read, inflated, parsed and projected inside that task when downstream
    maps fuse). Gzip segments are member-per-record streams (the
    Common-Crawl layout); each member inflates independently, so the plain
    parser runs on the rejoined record stream."""
    segs = sorted(glob.glob(os.path.join(warc_dir, "*.warc"))
                  + glob.glob(os.path.join(warc_dir, "*.warc.gz"))
                  + glob.glob(os.path.join(warc_dir, "*.warc.wet.gz"))
                  + glob.glob(os.path.join(warc_dir, "*.warc.wat.gz")))
    if not segs:
        raise FileNotFoundError(f"no .warc[.gz] segments under {warc_dir}")

    def parse(batch: pa.Table) -> pa.Table:
        out = []
        for p in batch["segment"].to_pylist():
            with open(p, "rb") as fh:
                raw = fh.read()
            if p.endswith(".gz"):
                raw = b"".join(split_gzip_members(raw))
            out.append(parse_segment(raw))
        return pa.concat_tables(out)

    ds = rd.from_arrow_refs([
        ray.put(pa.table({"segment": [s]})) for s in segs])
    return ds.map_batches(parse, batch_format="pyarrow", batch_size=1)
