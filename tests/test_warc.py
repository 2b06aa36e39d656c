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
