"""Resume-equals-fresh property (SURVEY.md §5.4): kill a run after k committed
partitions, resume, and the final outputs are identical to an uninterrupted
run."""

import os
import shutil

import pyarrow.parquet as pq

from lk_data_test_ray.pipelines.validate import load_violations, run_validation


def _run(fix, out):
    return run_validation(
        os.path.join(fix, "pages"), out,
        lang_hist_path=os.path.join(fix, "lang_hist.parquet"),
        wave_size=8,
    )


def test_kill_after_k_partitions_then_resume(pages_fixture, tmp_path):
    fresh_dir = str(tmp_path / "fresh")
    killed_dir = str(tmp_path / "killed")

    s_fresh = _run(pages_fixture, fresh_dir)

    # simulate a run killed after 6 committed partitions: run fully, then
    # delete everything past partition 5 (manifests AND data — as if never
    # written) plus the global outputs
    _run(pages_fixture, killed_dir)
    mdir = os.path.join(killed_dir, "manifests")
    vdir = os.path.join(killed_dir, "violations")
    for pid in range(6, 16):
        os.remove(os.path.join(mdir, f"part-{pid}.json"))
        os.remove(os.path.join(mdir, f"stats-{pid}.pkl"))
        os.remove(os.path.join(vdir, f"part-{pid:05d}.parquet"))
    os.remove(os.path.join(mdir, "part-global.json"))
    os.remove(os.path.join(vdir, "global.parquet"))
    os.remove(os.path.join(killed_dir, "summary.json"))

    s_resumed = _run(pages_fixture, killed_dir)

    assert s_resumed["per_check_violations"] == s_fresh["per_check_violations"]
    assert s_resumed["n_rows"] == s_fresh["n_rows"]

    va = load_violations(fresh_dir).sort_by([("check_id", "ascending"),
                                             ("url", "ascending")])
    vb = load_violations(killed_dir).sort_by([("check_id", "ascending"),
                                              ("url", "ascending")])
    assert va.equals(vb)

    # byte-identical per-partition violation files for untouched partitions
    for pid in range(0, 16):
        fa = os.path.join(fresh_dir, "violations", f"part-{pid:05d}.parquet")
        fb = os.path.join(killed_dir, "violations", f"part-{pid:05d}.parquet")
        assert pq.read_table(fa).equals(pq.read_table(fb))


def test_generator_is_pure(tmp_path):
    """Same (seed, n) → byte-identical parquet content (permutation-invariant
    inputs to the engine are guaranteed by generation determinism)."""
    from lk_data_test_ray.sources.pages import generate_pages

    d1, d2 = str(tmp_path / "g1"), str(tmp_path / "g2")
    generate_pages(d1, 2000, seed=9)
    generate_pages(d2, 2000, seed=9)
    t1 = pq.read_table(os.path.join(d1, "pages"))
    t2 = pq.read_table(os.path.join(d2, "pages"))
    assert t1.equals(t2)
    shutil.rmtree(d1)
    shutil.rmtree(d2)


def test_midstream_kill_then_resume(pages_fixture, tmp_path):
    """Kill DURING the streaming row phase (a commit raises after 5
    partitions land) — the partitions already committed must survive and a
    resume must converge to exactly the uninterrupted run's outputs. This
    exercises the single-execution iter_batches commit path directly."""
    from lk_data_test_ray.state.manifest import ManifestStore

    fresh_dir = str(tmp_path / "fresh2")
    killed_dir = str(tmp_path / "killed2")
    s_fresh = _run(pages_fixture, fresh_dir)

    real_commit = ManifestStore.commit
    state = {"n": 0}

    def dying_commit(self, pid, record, stats=None):
        if pid != "global" and state["n"] >= 5:
            raise RuntimeError("simulated driver death mid-stream")
        state["n"] += 1
        return real_commit(self, pid, record, stats=stats)

    ManifestStore.commit = dying_commit
    try:
        try:
            _run(pages_fixture, killed_dir)
            raise AssertionError("expected the simulated death to surface")
        except RuntimeError:
            pass
    finally:
        ManifestStore.commit = real_commit

    committed = ManifestStore(os.path.join(killed_dir, "manifests")).completed()
    assert 1 <= len(committed) <= 6  # partial progress survived, no global

    s_resumed = _run(pages_fixture, killed_dir)
    assert s_resumed["per_check_violations"] == s_fresh["per_check_violations"]
    assert s_resumed["n_rows"] == s_fresh["n_rows"]
    got = load_violations(killed_dir)
    want = load_violations(fresh_dir)

    def key_set(t):
        return sorted(zip(t["check_id"].to_pylist(), t["url"].to_pylist()))

    assert key_set(got) == key_set(want)


def test_resume_feeds_c1_from_sidecars(pages_fixture, tmp_path, monkeypatch):
    """A resume run must feed committed partitions' C1 hashes from the
    persisted .npz sidecars (no parquet re-read): poison the url-read
    fallback and assert the resumed verdicts still match a fresh run."""
    import glob

    import lk_data_test_ray.checks.uniqueness as u
    from lk_data_test_ray.pipelines import validate as v

    fresh_dir = str(tmp_path / "fresh")
    resumed_dir = str(tmp_path / "resumed")
    s_fresh = _run(pages_fixture, fresh_dir)

    _run(pages_fixture, resumed_dir)
    assert glob.glob(os.path.join(resumed_dir, "c1", "*.npz"))
    # drop the global manifest so the run re-executes ONLY the global phase,
    # with every partition already committed → the feed covers all of them
    for p in glob.glob(os.path.join(resumed_dir, "manifests", "*global*")):
        os.remove(p)

    def _boom(*a, **k):
        raise AssertionError("resume fed C1 by re-reading parquet urls — "
                             "sidecars were expected to cover it")

    monkeypatch.setattr(v._feed_collector, "remote", _boom)
    s_resumed = _run(pages_fixture, resumed_dir)
    assert (s_resumed["per_check_violations"]
            == s_fresh["per_check_violations"])


def test_committed_sidecars_tiling(tmp_path):
    """Sidecar discovery globs what the scan wrote and accepts ONLY an
    exact row-group tiling — mixed splits resolve greedily, gaps reject."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lk_data_test_ray.checks.row import committed_sidecars

    f = str(tmp_path / "part.parquet")
    # 8 row groups of 2 rows
    t = pa.table({"x": pa.array(range(16))})
    pq.write_table(t, f, row_group_size=2)
    c1 = tmp_path / "c1"
    c1.mkdir()

    def touch(pid, lo, hi):
        np.savez(str(c1 / f"item-{pid:05d}-{lo:05d}-{hi:05d}.npz"), z=1)

    # incomplete coverage → None
    touch(3, 0, 4)
    assert committed_sidecars(str(c1), 3, f) is None
    # exact tiling → chosen, in range order
    touch(3, 4, 8)
    got = committed_sidecars(str(c1), 3, f)
    assert [os.path.basename(g) for g in got] == [
        "item-00003-00000-00004.npz", "item-00003-00004-00008.npz"]
    # a different run's coarser split mixes in → greedy picks the max-hi walk
    touch(3, 0, 8)
    got = committed_sidecars(str(c1), 3, f)
    assert [os.path.basename(g) for g in got] == ["item-00003-00000-00008.npz"]
    # other pid's sidecars are invisible
    assert committed_sidecars(str(c1), 4, f) is None


def test_incremental_append_sorts_first(pages_fixture, tmp_path, ray_session):
    """Incremental (daily-append) correctness: a NEW input file that sorts
    BEFORE the committed ones must be validated — under positional
    partition ids it would inherit a committed id and be silently
    skipped while the shifted file is re-scanned and double-counted.
    Resume keys on the manifest's input_fragment, so (a) the second run
    scans ONLY the new file (old manifests byte-untouched), and (b) the
    merged summary equals a fresh full-directory run."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from lk_data_test_ray.pipelines.validate import (load_violations,
                                                     run_validation)

    src = os.path.join(pages_fixture, "pages")
    parts = sorted(os.listdir(src))
    inc_in = tmp_path / "inc_in"
    inc_in.mkdir()
    # day 1: every file except the first; name them so the day-2 arrival
    # sorts FIRST in the directory listing
    for p in parts[1:]:
        shutil.copy(os.path.join(src, p), inc_in / p)
    out1 = str(tmp_path / "out_inc")
    run_validation(str(inc_in), out1)
    man_dir = os.path.join(out1, "manifests")
    before = {f: os.path.getmtime(os.path.join(man_dir, f))
              for f in os.listdir(man_dir) if f != "part-global.json"
              and not f.startswith("stats-")}

    # day 2: the append that sorts before everything already committed
    shutil.copy(os.path.join(src, parts[0]), inc_in / "00-new.parquet")
    s2 = run_validation(str(inc_in), out1)

    # fresh full run over the same final directory
    out_f = str(tmp_path / "out_fresh")
    sf = run_validation(str(inc_in), out_f)

    assert s2["n_rows"] == sf["n_rows"]
    assert s2["per_check_violations"] == sf["per_check_violations"]
    inc_v = load_violations(out1).to_pandas()
    fre_v = load_violations(out_f).to_pandas()
    key = ["check_id", "url", "detail"]
    assert (inc_v[key].sort_values(key).reset_index(drop=True)
            .equals(fre_v[key].sort_values(key).reset_index(drop=True)))
    # committed day-1 manifests were not rewritten (no re-scan, no
    # double count)
    after = {f: os.path.getmtime(os.path.join(man_dir, f))
             for f in before}
    assert after == before
    # the new file got a FRESH id and its manifest records its fragment
    import json as _json

    recs = []
    for f in os.listdir(man_dir):
        if f.startswith("part-") and f.endswith(".json") \
                and f != "part-global.json":
            with open(os.path.join(man_dir, f)) as fh:
                recs.append(_json.load(fh))
    frags = {os.path.basename(r["input_fragment"]) for r in recs}
    assert "00-new.parquet" in frags
    n_new = pq.read_metadata(str(inc_in / "00-new.parquet")).num_rows
    new_rec = [r for r in recs
               if r["input_fragment"].endswith("00-new.parquet")][0]
    assert new_rec["n_rows"] == n_new


def test_incremental_delete_shrinks_summary(pages_fixture, tmp_path,
                                            ray_session):
    """Deleting an input file and re-running must shrink the summary to
    the surviving files — a stale manifest (or its violations parquet)
    must not inflate totals or leak into load_violations."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from lk_data_test_ray.pipelines.validate import (load_violations,
                                                     run_validation)

    src = os.path.join(pages_fixture, "pages")
    parts = sorted(os.listdir(src))[:3]
    inc_in = tmp_path / "del_in"
    inc_in.mkdir()
    for p in parts:
        shutil.copy(os.path.join(src, p), inc_in / p)
    out = str(tmp_path / "out_del")
    run_validation(str(inc_in), out)

    os.remove(inc_in / parts[0])
    s2 = run_validation(str(inc_in), out)

    out_f = str(tmp_path / "out_del_fresh")
    sf = run_validation(str(inc_in), out_f)
    assert s2["n_rows"] == sf["n_rows"] == sum(
        pq.read_metadata(str(inc_in / p)).num_rows for p in parts[1:])
    assert s2["per_check_violations"] == sf["per_check_violations"]
    key = ["check_id", "url", "detail"]
    a = load_violations(out).to_pandas()
    b = load_violations(out_f).to_pandas()
    assert (a[key].sort_values(key).reset_index(drop=True)
            .equals(b[key].sort_values(key).reset_index(drop=True)))
