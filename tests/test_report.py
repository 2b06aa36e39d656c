"""S6 static report sink + S7 atomic snapshot publish (report.py).

Reference parity: template-substituted index.html (scripts/make_index.py:6-12)
and delete-then-reload publish (update_graph.sh:3-26) → symlink-swap snapshot.
"""

import json
import os

from lk_data_test_ray.report import publish_snapshot, render_report


def _fake_out_dir(tmp_path, passed=False):
    out = tmp_path / "vout"
    (out / "manifests").mkdir(parents=True)
    (out / "summary.json").write_text(json.dumps({
        "n_rows": 100, "n_partitions": 2, "violations_total": 3,
        "per_check_violations": {"c1_url_unique": 2, "c3_lang_vocab": 1},
        "passed": passed, "rows_per_sec": 12345.6,
    }))
    for pid, nviol in ((0, 3), (1, 0), ("global", 0)):
        (out / "manifests" / f"part-{pid}.json").write_text(json.dumps({
            "partition_id": pid, "n_rows": 50, "violation_count": nviol,
            "passed": nviol == 0,
        }))
    return str(out)


def test_render_report(tmp_path):
    out = _fake_out_dir(tmp_path)
    path = render_report(out)
    page = open(path).read()
    assert "FAIL" in page and "c1_url_unique" in page and "12345.6" in page
    # idempotent re-render
    assert render_report(out) == path


def test_publish_snapshot_atomic_swap(tmp_path):
    out1 = _fake_out_dir(tmp_path / "a")
    out2 = _fake_out_dir(tmp_path / "b", passed=True)
    root = str(tmp_path / "pub")
    link = publish_snapshot(out1, root)
    assert os.path.realpath(link) == os.path.realpath(out1)
    # republish repoints atomically; old snapshot dir is untouched
    link2 = publish_snapshot(out2, root)
    assert link2 == link
    assert os.path.realpath(link) == os.path.realpath(out2)
    assert os.path.exists(os.path.join(out1, "summary.json"))


def test_snapshot_version_log_time_travel(tmp_path):
    """Every distinct publish appends a version; resolve_snapshot reads any
    past version while the live symlink tracks the newest; a republish of
    the same tree is NOT a new version; deleted targets raise."""
    import shutil

    from lk_data_test_ray.report import resolve_snapshot

    out1 = _fake_out_dir(tmp_path / "a")
    out2 = _fake_out_dir(tmp_path / "b", passed=True)
    root = str(tmp_path / "pub")
    publish_snapshot(out1, root)
    publish_snapshot(out1, root)  # idempotent republish: still v1
    publish_snapshot(out2, root)
    assert resolve_snapshot(root, 1) == os.path.realpath(out1)
    assert resolve_snapshot(root, 2) == os.path.realpath(out2)
    assert resolve_snapshot(root) == os.path.realpath(out2)  # live
    import pytest

    with pytest.raises(KeyError):
        resolve_snapshot(root, 3)
    shutil.rmtree(out1)
    with pytest.raises(FileNotFoundError):
        resolve_snapshot(root, 1)  # resolvability, not retention


def test_report_cli(tmp_path):
    from lk_data_test_ray.__main__ import main

    out = _fake_out_dir(tmp_path)
    rc = main(["report", out, "--publish-root", str(tmp_path / "pub")])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "index.html"))
    assert os.path.realpath(
        str(tmp_path / "pub" / "current")) == os.path.realpath(out)


def test_publish_failed_swap_leaves_no_phantom_version(tmp_path):
    """A publish whose symlink swap fails must not append a version-log
    entry (resolve_snapshot would otherwise time-travel to a snapshot that
    was never live)."""
    import json
    import os

    import pytest

    from lk_data_test_ray.report import publish_snapshot

    out1 = tmp_path / "snap1"
    out1.mkdir()
    root = str(tmp_path / "pub")
    publish_snapshot(str(out1), root)
    # force the swap to fail: a non-empty DIRECTORY at the link name makes
    # os.replace raise
    os.symlink(str(out1), os.path.join(root, "other"))  # sanity: root ok
    bad = tmp_path / "snap2"
    bad.mkdir()
    os.remove(os.path.join(root, "current"))
    os.makedirs(os.path.join(root, "current", "sub"))
    with pytest.raises(OSError):
        publish_snapshot(str(bad), root)
    log = json.load(open(os.path.join(root, "snapshots.json")))
    assert [e["target"] for e in log] == [str(out1)]


def test_publish_concurrent_versions_unique(tmp_path):
    """Concurrent publishers never lose log entries or duplicate version
    numbers (exclusive-lock guard on the read-modify-write)."""
    import json
    import multiprocessing as mp
    import os

    from lk_data_test_ray.report import publish_snapshot

    root = str(tmp_path / "pub")
    outs = []
    for i in range(6):
        d = tmp_path / f"s{i}"
        d.mkdir()
        outs.append(str(d))

    def pub(d):
        publish_snapshot(d, root)

    ctx = mp.get_context("fork")
    procs = [ctx.Process(target=pub, args=(d,)) for d in outs]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    assert all(p.exitcode == 0 for p in procs)
    log = json.load(open(os.path.join(root, "snapshots.json")))
    assert sorted(e["version"] for e in log) == list(
        range(1, len(log) + 1))
    assert len({e["target"] for e in log}) == len(log)
