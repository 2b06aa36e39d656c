"""Static report sink + atomic snapshot publish (SURVEY.md §2.1 S6/S7).

S6 — the reference renders a template-substituted ``html/index.html`` from
build outputs (``scripts/make_index.py:6-12``, ``create_pages.sh:1-10``).
Here: ``render_report(out_dir)`` turns a validation run's ``summary.json``
+ per-partition manifests into a self-contained ``index.html`` — a pure
driver-side post-step over already-reduced data (never the row stream).

S7 — the reference publishes by deleting named graphs then re-POSTing the
whole build (``update_graph.sh:3-26``): consumers always see a complete
snapshot. Here: ``publish_snapshot(out_dir, publish_root)`` atomically
repoints a ``current`` symlink at an immutable, content-complete snapshot
directory — same all-or-nothing contract without the delete window, and a
rerun republishes idempotently.
"""

from __future__ import annotations

import html as _html
import json
import os
import tempfile

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>validation report</title>
<style>
body{{font-family:sans-serif;margin:2em;max-width:60em}}
table{{border-collapse:collapse}}td,th{{border:1px solid #999;padding:.3em .6em;text-align:right}}
th:first-child,td:first-child{{text-align:left}}
.pass{{color:#060}}.fail{{color:#a00}}
</style></head><body>
<h1>Validation report</h1>
<p>verdict: <b class="{cls}">{verdict}</b> &middot; {n_rows} rows &middot;
{n_partitions} partitions &middot; {violations_total} violations &middot;
{rows_per_sec} rows/s</p>
<h2>Per-check violations</h2>
<table><tr><th>check</th><th>violations</th></tr>{check_rows}</table>
<h2>Partitions</h2>
<table><tr><th>partition</th><th>rows</th><th>violations</th><th>verdict</th></tr>
{part_rows}</table>
</body></html>
"""


def render_report(out_dir: str) -> str:
    """Render ``out_dir/index.html`` from summary.json + manifests; returns
    the path. Pure function of the committed artifacts (re-runnable)."""
    with open(os.path.join(out_dir, "summary.json")) as f:
        s = json.load(f)
    man_dir = os.path.join(out_dir, "manifests")
    parts = []
    for name in sorted(os.listdir(man_dir)):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        with open(os.path.join(man_dir, name)) as f:
            parts.append(json.load(f))

    def _key(p):
        pid = p["partition_id"]
        return (1, 0) if pid == "global" else (0, int(pid))

    parts.sort(key=_key)
    check_rows = "".join(
        f"<tr><td>{_html.escape(c)}</td><td>{n}</td></tr>"
        for c, n in sorted(s["per_check_violations"].items()))
    part_rows = "".join(
        "<tr><td>{}</td><td>{}</td><td>{}</td>"
        "<td class=\"{}\">{}</td></tr>".format(
            _html.escape(str(p["partition_id"])), p.get("n_rows", ""),
            p.get("violation_count", 0),
            "pass" if p.get("passed") else "fail",
            "pass" if p.get("passed") else "FAIL")
        for p in parts)
    page = _PAGE.format(
        cls="pass" if s["passed"] else "fail",
        verdict="PASS" if s["passed"] else "FAIL",
        n_rows=s["n_rows"], n_partitions=s["n_partitions"],
        violations_total=s["violations_total"],
        rows_per_sec=s.get("rows_per_sec"),
        check_rows=check_rows, part_rows=part_rows)
    path = os.path.join(out_dir, "index.html")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(page)
    os.replace(tmp, path)
    return path


def publish_snapshot(out_dir: str, publish_root: str,
                     name: str = "current") -> str:
    """Atomically point ``publish_root/name`` at ``out_dir`` and append the
    publish to a version log.

    Readers following the symlink always see a complete snapshot — the
    reference's delete-graphs-then-reload publish contract
    (``update_graph.sh:3-7``) without the empty window. Idempotent: a
    republish of the same out_dir is a no-op swap (and is NOT logged as a
    new version). Every distinct publish appends ``{version, target,
    published_at}`` to ``snapshots.json`` (atomic rewrite), giving readers
    time travel: ``resolve_snapshot(root, version=N)`` returns the N-th
    published tree as long as it still exists on disk — the table-format
    snapshot-log idea (Iceberg/Delta) reduced to its filesystem core."""
    import datetime as _dt
    import fcntl

    os.makedirs(publish_root, exist_ok=True)
    target = os.path.abspath(out_dir)
    link = os.path.join(publish_root, name)
    # One exclusive lock serializes concurrent publishers (the log append is
    # a read-modify-write: unguarded it can lose entries or duplicate
    # version numbers), and the log entry is appended only AFTER the
    # symlink swap succeeds — a failed swap must not leave a phantom
    # version that resolve_snapshot would happily return.
    with open(os.path.join(publish_root, ".snapshots.lock"), "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        # symlink swap must be atomic: create under a temp name, then rename
        fd, tmp = tempfile.mkstemp(dir=publish_root)
        os.close(fd)
        os.remove(tmp)
        os.symlink(target, tmp)
        os.replace(tmp, link)
        log = _read_log(publish_root)
        if not log or log[-1]["target"] != target:
            log.append({
                "version": (log[-1]["version"] + 1) if log else 1,
                "target": target,
                "published_at": _dt.datetime.now(
                    _dt.timezone.utc).isoformat(timespec="seconds"),
            })
            _write_log(publish_root, log)
    return link


def _read_log(publish_root: str) -> list:
    p = os.path.join(publish_root, "snapshots.json")
    if not os.path.exists(p):
        return []
    import json as _json

    with open(p) as f:
        return _json.load(f)


def _write_log(publish_root: str, log: list) -> None:
    import json as _json

    p = os.path.join(publish_root, "snapshots.json")
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(log, f, indent=1)
    os.replace(tmp, p)


def resolve_snapshot(publish_root: str, version: int | None = None,
                     name: str = "current") -> str:
    """Time travel: the published tree for ``version`` (1-based; None =
    follow the live symlink). Raises KeyError for an unknown version and
    FileNotFoundError if that version's tree has since been deleted —
    snapshot logs promise resolvability, not retention."""
    if version is None:
        return os.path.realpath(os.path.join(publish_root, name))
    for rec in _read_log(publish_root):
        if rec["version"] == version:
            if not os.path.isdir(rec["target"]):
                raise FileNotFoundError(
                    f"snapshot v{version} target {rec['target']} is gone")
            return rec["target"]
    raise KeyError(f"no snapshot version {version} in {publish_root}")
