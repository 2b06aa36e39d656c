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
