"""WARC-style segment serialization / parsing round-trip."""
import datetime as dt

import pyarrow as pa

from lk_data_test_ray.sources.warc import parse_segment, segment_table


def _tbl(rows):
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "html": pa.array([r[2] for r in rows], pa.binary()),
    })


def test_warc_round_trip_lossless():
    ts = dt.datetime(2021, 3, 4, 5, 6, 7, 890123)
    rows = [
        ("http://a.example/x", ts, b"<html>hello</html>"),
        ("http://b.example/y", ts.replace(microsecond=0), b""),  # empty
        ("http://c.example/z", ts, None),                        # NULL
        # adversarial payload containing record-header-like bytes: the
        # parser walks Content-Length cursors, never regexes payloads
        ("http://d.example/w", ts,
         b"WARC/1.0\r\nContent-Length: 999\r\n\r\nfake\r\n\r\n"),
    ]
    tbl = _tbl(rows)
    out = parse_segment(segment_table(tbl))
    assert out.equals(tbl)


def test_warc_truncated_raises():
    import pytest

    tbl = _tbl([("u", dt.datetime(2020, 1, 1), b"abcdef")])
    data = segment_table(tbl)
    with pytest.raises(ValueError):
        parse_segment(data[:-10])  # payload cut short


def test_warc_gz_member_per_record_roundtrip():
    """.warc.gz: every record is its own gzip member (the Common-Crawl
    layout); splitting members and re-parsing must be byte-lossless,
    including empty/NULL payloads."""
    from lk_data_test_ray.sources.warc import (segment_table_gz,
                                               split_gzip_members)

    ts = dt.datetime(2021, 3, 4, 5, 6, 7, 890123)
    rows = [
        ("http://a.example/x", ts, b"<html>hello</html>" * 100),
        ("http://b.example/y", ts.replace(microsecond=0), b""),
        ("http://c.example/z", ts, None),
    ]
    tbl = _tbl(rows)
    gz = segment_table_gz(tbl)
    members = split_gzip_members(gz)
    assert len(members) == 3  # one member per record, not one stream
    out = parse_segment(b"".join(members))
    assert out.equals(tbl)
    # each member independently inflatable (the random-access property)
    import zlib

    d = zlib.decompressobj(31)
    first = d.decompress(gz)
    assert first.startswith(b"WARC/1.0\r\n")
    assert parse_segment(first).num_rows == 1


def test_warc_gz_index_and_byte_range_fetch(tmp_path):
    """The CDX-style member index must locate every record, and a byte-range
    fetch (seek + read exactly `length` bytes + single-member inflate) must
    reproduce the record bytes — including a duplicate url returning BOTH
    copies."""
    from lk_data_test_ray.sources.warc import (build_gz_index, fetch_records,
                                               segment_table_gz)

    ts = dt.datetime(2021, 3, 4, 5, 6, 7, 890123)
    rows = [("http://a/x", ts, b"payload-a" * 30),
            ("http://b/y", ts, None),
            ("http://a/x", ts, b"payload-a-copy2"),  # duplicate url
            ("http://c/z", ts, b"payload-c")]
    tbl = _tbl(rows)
    gz = segment_table_gz(tbl)
    d = tmp_path / "warc_gz"
    d.mkdir()
    (d / "seg_rg00000-00004.warc.gz").write_bytes(gz)
    idx = build_gz_index(gz, "seg_rg00000-00004.warc.gz")
    assert idx.num_rows == 4
    assert sum(idx["length"].to_pylist()) == len(gz)  # members tile the file
    got = fetch_records(str(d), ["http://a/x", "http://c/z"])
    assert got.num_rows == 3  # both copies of the dup url + one of c
    by_payload = sorted([None if v is None else bytes(v)
                         for v in got["html"].to_pylist()],
                        key=lambda b: b or b"")
    assert b"payload-a-copy2" in by_payload and b"payload-c" in by_payload
    # the index is cached as index.parquet and reused
    assert (d / "index.parquet").exists()
    assert fetch_records(str(d), ["http://b/y"])["html"].to_pylist() == [None]


def test_warc_gz_truncated_member_raises():
    import pytest

    from lk_data_test_ray.sources.warc import (segment_table_gz,
                                               split_gzip_members)

    tbl = _tbl([("u", dt.datetime(2020, 1, 1), b"abcdef" * 50)])
    gz = segment_table_gz(tbl)
    with pytest.raises(ValueError):
        split_gzip_members(gz[:-8])


def test_zone_map_pruning_skips_row_groups(sf_dir):
    """plan_pruned_items must read strictly fewer row groups than a full
    scan on ts-clustered storage, and pruned_range_scan must equal the
    full-scan + filter result exactly."""
    import datetime as pydt
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from lk_data_test_ray.pipelines.queries import _events_ts_clustered
    from lk_data_test_ray.sources.scan import (plan_pruned_items,
                                               pruned_range_scan)

    d = _events_ts_clustered(sf_dir)
    f = os.path.join(d, "events.parquet")
    lo = pydt.datetime(2024, 1, 10)
    hi = pydt.datetime(2024, 1, 17)
    items, kept, total = plan_pruned_items([f], "ts", lo, hi)
    assert total > 1, "sidecar must have multiple row groups for this test"
    assert 0 < kept < total  # pruning actually happened

    got = pruned_range_scan(f, "ts", lo, hi,
                            columns=["event_id", "ts"]).to_pandas()
    full = pq.read_table(f, columns=["event_id", "ts"])
    mask = pc.and_(pc.greater_equal(full["ts"], lo),
                   pc.less_equal(full["ts"], hi))
    ref = full.filter(mask).to_pandas()
    got = got.sort_values("event_id").reset_index(drop=True)
    ref = ref.sort_values("event_id").reset_index(drop=True)
    assert got.equals(ref)

    # a range before all data plans zero items and returns an empty,
    # correctly-typed dataset
    items0, kept0, _ = plan_pruned_items([f], "ts",
                                         pydt.datetime(1990, 1, 1),
                                         pydt.datetime(1990, 1, 2))
    assert items0 == [] and kept0 == 0
    empty = pruned_range_scan(f, "ts", pydt.datetime(1990, 1, 1),
                              pydt.datetime(1990, 1, 2),
                              columns=["event_id", "ts"])
    assert empty.count() == 0


def test_wet_segments_roundtrip_with_null_text(ray_session, tmp_path):
    """WET conversion segments: text payloads (incl. NULL for
    unextractable pages) survive the member-per-record gzip container."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lk_data_test_ray.sources.warc import (ensure_warc_segments,
                                               read_warc)

    fix = tmp_path / "fix"
    (fix / "pages").mkdir(parents=True)
    tbl = pa.table({
        "url": pa.array([f"https://x.org/{i}" for i in range(7)]),
        "warc_ts": pa.array(
            np.datetime64("2025-01-01T00:00:00.123456", "us")
            + np.arange(7) * np.timedelta64(1, "us"), pa.timestamp("us")),
        "text": pa.array(["hello", None, "wörld ünïcode", "", "a" * 5000,
                          "tab\tnl\n", "emoji \U0001F600"], pa.string()),
    })
    pq.write_table(tbl, str(fix / "pages" / "pages-000.parquet"))
    wet = ensure_warc_segments(str(fix), payload="text")
    assert all(f.endswith((".warc.wet.gz", "_SUCCESS"))
               for f in os.listdir(wet))
    back = read_warc(wet).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    orig = tbl.to_pandas().sort_values("url").reset_index(drop=True)
    got_text = back["html"].map(
        lambda b: None if b is None else b.decode("utf-8"))
    assert got_text.tolist() == orig["text"].tolist()
    assert back["warc_ts"].tolist() == orig["warc_ts"].tolist()
