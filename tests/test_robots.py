"""robots.txt parser + pages_robots longest-match filter."""
import numpy as np
import pyarrow.parquet as pq

from lk_data_test_ray.sources.robots import (ensure_robots, host_rules,
                                             parse_robots, render_robots)


def test_parser_roundtrips_every_rendered_host():
    # the rendered file carries noise (comments, BadBot group, empty
    # Disallow, Crawl-delay, case soup) — the parser must recover exactly
    # the rules the fixture's rules table declares
    for i in range(64):
        body = render_robots(i)
        want = host_rules(i)
        if body is None:
            assert want == []
            continue
        assert parse_robots(body) == want, f"host {i}"


def test_parser_ignores_other_agent_groups():
    txt = (b"User-agent: BadBot\nDisallow: /\n\n"
           b"User-agent: *\nDisallow: /x\n")
    assert parse_robots(txt) == [("/x", False)]


def test_parser_multi_agent_group_head():
    txt = b"User-agent: A\nUser-agent: *\nDisallow: /y\n"
    assert parse_robots(txt) == [("/y", False)]


def test_parser_empty_disallow_is_no_rule():
    assert parse_robots(b"User-agent: *\nDisallow:\n") == []


def test_parser_rules_after_non_group_line_still_in_group():
    # Crawl-delay doesn't end the group's rule scope
    txt = b"User-agent: *\nCrawl-delay: 5\nDisallow: /z\n"
    assert parse_robots(txt) == [("/z", False)]


def test_fixture_rules_parquet_matches_parser(tmp_path):
    fix = ensure_robots(base=str(tmp_path))
    robots = pq.read_table(fix + "/robots.parquet")
    rules = pq.read_table(fix + "/rules.parquet")
    by_host: dict = {}
    for h, p, a in zip(rules["host"].to_pylist(),
                       rules["rule_path"].to_pylist(),
                       rules["allow"].to_pylist()):
        by_host.setdefault(h, []).append((p, a))
    for h, b in zip(robots["host"].to_pylist(),
                    robots["robots_txt"].to_pylist()):
        assert parse_robots(b) == by_host[h]


def test_pages_robots_matches_duckdb(ray_session, tmp_path):
    import duckdb

    from lk_data_test_ray.pipelines import queries as q

    res = q.pages_robots("/root/testdata/sf0.001").to_pandas()
    import __ray_entry__ as e

    sql = e.oracle_sql()["pages_robots"].replace(
        e._pages_fixture_glob(),
        q._pages_fixture("/root/testdata/sf0.001") + "/pages/*.parquet")
    want = duckdb.sql(sql).df()
    a = res.sort_values(["url", "lang"]).reset_index(drop=True)
    b = want.sort_values(["url", "lang"]).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    assert (a["url"].to_numpy() == b["url"].to_numpy()).all()
    assert (a["lang"].to_numpy() == b["lang"].to_numpy()).all()
    # both match kinds bite: some pages dropped, some kept
    n_pages = sum(
        pq.read_metadata(f).num_rows for f in __import__("glob").glob(
            q._pages_fixture("/root/testdata/sf0.001") + "/pages/*.parquet"))
    assert 0 < len(a) < n_pages


def test_longest_match_tie_allow_wins():
    # g==1 hosts carry Allow:/p/00002 AND Disallow:/p/00002 (same length):
    # RFC 9309 says Allow wins — rows 2xxxx on those hosts stay crawlable
    rs = host_rules(1)
    path = "/p/000020042"
    best = 0
    for rp, allow in rs:
        if path.startswith(rp):
            best = max(best, 2 * len(rp) + int(allow))
    assert best % 2 == 1  # allowed
    # and a plain 0xxxx row on the same host is blocked
    best = 0
    for rp, allow in rs:
        if "/p/000000042".startswith(rp):
            best = max(best, 2 * len(rp) + int(allow))
    assert best > 0 and best % 2 == 0
