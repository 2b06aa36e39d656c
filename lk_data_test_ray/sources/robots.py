"""Deterministic robots.txt corpus + RFC-9309 subset parser.

The crawl-politeness side of web-corpus hygiene (every large crawl —
Common Crawl included — honors robots exclusion before a page may enter
the corpus at all; the reference's closest analog is the data-driven rule
table ``curation/work_type_mapping.py:1-23`` applied per record). This
module renders one robots.txt per fixture host alongside a *rules parquet*
holding exactly the ``User-agent: *`` rules the file encodes — the engine
parses the raw bytes, the DuckDB oracle reads the rules table, so an
oracle match proves the parser AND the longest-match decision end to end.

Rule scheme (host index ``i``, deterministic):
  * ``i % 4 == 0`` — no robots.txt at all (crawl allowed by default);
  * ``i % 4 == 1`` — ``Disallow: /p/0000`` + ``Allow: /p/00002`` +
    ``Disallow: /p/00002`` (the Allow/Disallow same-length TIE, which
    RFC 9309 resolves in favor of Allow);
  * ``i % 4 == 2`` — ``Disallow: /`` + ``Allow: /p/00001`` (blanket block
    with a carve-out);
  * ``i % 4 == 3`` — ``Disallow: /private/`` (matches nothing — the
    common harmless-rules case).

Every rendered file also carries parser noise the rules table does NOT
contain: comments, blank lines, mixed-case field names, a ``Crawl-delay``
directive, an empty ``Disallow:`` (RFC: no restriction — must be ignored),
a ``User-agent: BadBot`` group with ``Disallow: /`` that must not apply to
``*``, and (every third file) a two-line agent list where ``*`` shares a
group with a named agent.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

ROBOTS_VERSION = 1
N_HOSTS = 1000  # mirrors sources/pages.py host universe


def host_rules(i: int) -> list[tuple[str, bool]]:
    """The ``User-agent: *`` rules for host index ``i`` as
    (path_prefix, allow) pairs; empty list = no robots.txt."""
    g = i % 4
    if g == 0:
        return []
    if g == 1:
        return [("/p/0000", False), ("/p/00002", True), ("/p/00002", False)]
    if g == 2:
        return [("/", False), ("/p/00001", True)]
    return [("/private/", False)]


def render_robots(i: int) -> bytes | None:
    """Render host ``i``'s robots.txt bytes (None = file absent)."""
    rules = host_rules(i)
    if not rules:
        return None
    lines = [f"# robots for host {i}", ""]
    if i % 3 == 0:
        lines += ["User-agent: *", "User-agent: GoodBot"]
    else:
        lines += ["user-agent: *"]
    for path, allow in rules:
        field = ("Allow" if allow else "Disallow")
        if i % 2 == 0:
            field = field.upper()
        lines.append(f"{field}: {path}  # rule")
    lines += ["Crawl-delay: 2", "Disallow:", "",
              "User-agent: BadBot", "Disallow: /"]
    return ("\n".join(lines) + "\n").encode("ascii")


def parse_robots(txt: bytes, agent: str = "*") -> list[tuple[str, bool]]:
    """Parse the ``agent`` group's (path_prefix, allow) rules.

    RFC 9309 subset: ``#`` comments stripped, field names case-insensitive,
    consecutive ``User-agent`` lines form one group whose rules apply to
    every listed agent, empty rule paths carry no restriction. Groups for
    other agents are skipped entirely."""
    rules: list[tuple[str, bool]] = []
    active = False       # current group contains `agent`
    in_agent_run = False  # inside a run of consecutive User-agent lines
    for raw in txt.decode("utf-8", errors="replace").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:   # a new group starts
                active = False
                in_agent_run = True
            if value == agent:
                active = True
            continue
        in_agent_run = False
        if field in ("allow", "disallow") and active and value:
            rules.append((value, field == "allow"))
    return rules


def generate_robots(out_dir: str) -> None:
    """Render the corpus + rules tables into ``out_dir`` (tmp + rename)."""
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    hosts, bodies = [], []
    r_hosts, r_paths, r_allow = [], [], []
    for i in range(N_HOSTS):
        body = render_robots(i)
        if body is None:
            continue
        host = f"h{i:04d}.example-{i % 7}.org"
        hosts.append(host)
        bodies.append(body)
        for path, allow in host_rules(i):
            r_hosts.append(host)
            r_paths.append(path)
            r_allow.append(allow)
    pq.write_table(pa.table({
        "host": pa.array(hosts, pa.string()),
        "robots_txt": pa.array(bodies, pa.binary()),
    }), os.path.join(tmp, "robots.parquet"))
    pq.write_table(pa.table({
        "host": pa.array(r_hosts, pa.string()),
        "rule_path": pa.array(r_paths, pa.string()),
        "allow": pa.array(r_allow, pa.bool_()),
    }), os.path.join(tmp, "rules.parquet"))
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)


def ensure_robots(base: str = "/tmp/lk_robots") -> str:
    """Idempotent cached generation; returns the fixture dir."""
    out = os.path.join(base, f"v{ROBOTS_VERSION}")
    if not os.path.isdir(out) or not os.listdir(out):
        generate_robots(out)
    return out
