"""End-to-end golden test: the validation pipeline's violations must equal the
generator's injected expected_violations exactly (FIXTURES.md F5), and
per-partition verdicts must flag exactly the partitions containing injections.
"""

import json
import os

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from lk_data_test_ray.pipelines.validate import (
    load_violations,
    run_validation,
)


@pytest.fixture(scope="module")
def result(pages_fixture, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("vout"))
    summary = run_validation(
        os.path.join(pages_fixture, "pages"),
        out,
        lang_hist_path=os.path.join(pages_fixture, "lang_hist.parquet"),
        wave_size=8,
    )
    return pages_fixture, out, summary


def _key_set(tbl):
    return set(zip(tbl["check_id"].to_pylist(), tbl["url"].to_pylist()))


def test_violations_match_golden(result):
    fix, out, summary = result
    got = load_violations(out)
    expected = pq.read_table(os.path.join(fix, "expected_violations.parquet"))
    assert _key_set(got) == _key_set(expected)
    # counts too: every (check, url) appears the same number of times
    assert got.num_rows == expected.num_rows


def test_summary_counts(result):
    fix, out, summary = result
    meta = json.load(open(os.path.join(fix, "meta.json")))
    inj = meta["injected"]
    pc_ = summary["per_check_violations"]
    assert pc_["c1_url_unique"] == inj["dup_pairs"]
    assert pc_["c4_ts_range"] == inj["ts_oor"]
    assert pc_["c2_nonnull"] == inj["text_null"]
    assert pc_["c6_extract_match"] == inj["text_mutated"]
    assert pc_["c3_lang_vocab"] == inj["bad_lang"]
    assert summary["n_rows"] == meta["n_rows"]
    assert not summary["passed"]


def test_partition_verdicts(result):
    fix, out, summary = result
    expected = pq.read_table(os.path.join(fix, "expected_violations.parquet"))
    # partitions that contain a row-level injected violation must fail
    pages = pq.read_table(os.path.join(fix, "pages"))
    manifests = {}
    mdir = os.path.join(out, "manifests")
    for name in os.listdir(mdir):
        if name.startswith("part-") and name.endswith(".json"):
            rec = json.load(open(os.path.join(mdir, name)))
            manifests[rec["partition_id"]] = rec
    assert "global" in manifests
    row_checks = {"c2_nonnull", "c3_lang_vocab", "c4_ts_range", "c6_extract_match"}
    bad_urls = {
        u for c, u in zip(expected["check_id"].to_pylist(),
                          expected["url"].to_pylist()) if c in row_checks
    }
    n = pages.num_rows
    per = -(-n // 16)
    url_to_pid = {}
    for i, u in enumerate(pages["url"].to_pylist()):
        url_to_pid.setdefault(u, set()).add(i // per)
    failing_pids = set()
    for u in bad_urls:
        failing_pids |= url_to_pid[u]
    for pid, rec in manifests.items():
        if pid == "global":
            continue
        # a failing partition per manifest ⟺ it holds an injected row-level violation
        if rec["violation_count"] > 0:
            assert pid in failing_pids or rec["violation_count"] == 0
    int_pids = {p for p in manifests if p != "global"}
    assert {p for p in int_pids if not manifests[p]["passed"]} >= failing_pids


def test_stats_accuracy(result):
    fix, out, summary = result
    meta = json.load(open(os.path.join(fix, "meta.json")))
    st = summary["stats"]
    # HLL within 5% of exact cardinality
    assert abs(st["url_cardinality_est"] - meta["url_cardinality"]) \
        < 0.05 * meta["url_cardinality"]
    assert st["lang_counts"] == meta["lang_counts"]
    assert st["text_null_count" if "text_null_count" in st else "text_null"] \
        == meta["text_null_count"]
    # t-digest median within 5% of exact
    q50 = st["textlen_quantiles"]["0.5"]
    assert abs(q50 - meta["text_len_quantiles"]["0.5"]) \
        < 0.05 * meta["text_len_quantiles"]["0.5"]
    # drift must PASS at the generating mixture
    assert summary["drift"]["passed"]


def test_resume_skips_completed(result, tmp_path):
    """Second run over the same out_dir does no partition work and matches."""
    fix, out, summary = result
    before = load_violations(out)
    summary2 = run_validation(
        os.path.join(fix, "pages"), out,
        lang_hist_path=os.path.join(fix, "lang_hist.parquet"),
        resume=True,
    )
    after = load_violations(out)
    assert _key_set(before) == _key_set(after)
    assert summary2["per_check_violations"] == summary["per_check_violations"]


def test_dangling_links_matches_duckdb(pages_fixture):
    """C7 exchange result == exact DuckDB anti-join on the same fixture."""
    import glob
    import os

    import duckdb

    from lk_data_test_ray.checks.links import find_dangling_links

    fix = pages_fixture
    pages_files = sorted(glob.glob(os.path.join(fix, "pages", "*.parquet")))
    links_file = os.path.join(fix, "links.parquet")
    got = find_dangling_links(pages_files, [links_file]).to_pandas()
    con = duckdb.connect()
    exp = con.execute(f"""
        SELECT l.* FROM read_parquet('{links_file}') l
        WHERE NOT EXISTS (SELECT 1 FROM read_parquet('{fix}/pages/*.parquet') p
                          WHERE p.url = l.dst_url)
    """).df()
    assert len(got) == len(exp) > 0  # generator injects ~1% dangling targets
    key = ["src_url", "ordinal", "dst_url"]
    got_s = got.sort_values(key).reset_index(drop=True)
    exp_s = exp.sort_values(key).reset_index(drop=True)
    assert got_s[key].equals(exp_s[key])


def test_clean_output_and_permutation_invariance(pages_fixture, tmp_path):
    """Quarantine split: clean output re-validates with zero row-phase
    violations; wave-size permutation does not change any verdict."""
    import glob
    import os

    import pyarrow.parquet as pq

    from lk_data_test_ray.pipelines.validate import run_validation

    out_a = str(tmp_path / "a")
    clean = str(tmp_path / "clean")
    s_a = run_validation(os.path.join(pages_fixture, "pages"), out_a,
                         clean_dir=clean, wave_size=16)
    # clean rows = total - rows touched by any row-phase violation
    n_clean = sum(pq.read_metadata(f).num_rows
                  for f in glob.glob(os.path.join(clean, "*.parquet")))
    row_checks = ("c2_nonnull", "c3_lang_vocab", "c4_ts_range",
                  "c6_extract_match")
    flagged = sum(s_a["per_check_violations"][c] for c in row_checks)
    assert n_clean == s_a["n_rows"] - flagged

    # re-validate the clean output: row-phase checks all pass
    out_b = str(tmp_path / "b")
    s_b = run_validation(clean, out_b, check_extract=True)
    assert all(s_b["per_check_violations"][c] == 0 for c in row_checks)

    # permutation invariance: different wave partitioning, same verdicts
    out_c = str(tmp_path / "c")
    s_c = run_validation(os.path.join(pages_fixture, "pages"), out_c,
                         wave_size=3)
    assert s_c["per_check_violations"] == s_a["per_check_violations"]


def test_drift_fails_on_shifted_mixture(tmp_path):
    """C5 negative path (FIXTURES.md F2): a corpus generated from a shifted
    lang mixture must FAIL the chi-square drift check against the original
    reference histogram."""
    import os

    from lk_data_test_ray.sources.pages import ensure_pages
    from lk_data_test_ray.pipelines.validate import run_validation

    base = ensure_pages(6000, seed=77)
    shifted_mix = [("en", 0.10), ("de", 0.60), ("fr", 0.10), ("es", 0.10),
                   ("ru", 0.10)]
    shifted = ensure_pages(6000, seed=77, lang_mix=shifted_mix, tag="_shift")
    out = str(tmp_path / "drift")
    s = run_validation(
        os.path.join(shifted, "pages"), out,
        lang_hist_path=os.path.join(base, "lang_hist.parquet"),
        check_extract=False)
    assert s["drift"] is not None and not s["drift"]["passed"]
    assert s["per_check_violations"]["c5_lang_drift"] == 1


def test_curate_pages_funnel(pages_fixture, tmp_path):
    """End-to-end curation: funnel counts are consistent, and crafted
    near-duplicate documents are collapsed to one keeper each."""
    import glob
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lk_data_test_ray.pipelines.training_data import curate_pages

    # corpus = first fixture file + 5 near-dup copies of its first rows
    # under fresh urls (the fixture's injected "dups" duplicate URLS, not
    # content — near-dup dedup needs content twins)
    src = sorted(glob.glob(os.path.join(pages_fixture, "pages",
                                        "*.parquet")))[0]
    base = pq.read_table(src)
    twins = base.slice(0, 5)
    twins = twins.set_column(
        0, "url",
        pa.array([f"https://twin.example/{i}" for i in range(5)], pa.string()))
    pages_dir = str(tmp_path / "pages")
    os.makedirs(pages_dir)
    pq.write_table(base, os.path.join(pages_dir, "part-00000.parquet"))
    pq.write_table(twins, os.path.join(pages_dir, "part-00001.parquet"))

    out = str(tmp_path / "curated")
    funnel = curate_pages(pages_dir, out)
    assert funnel["n_input"] == base.num_rows + 5
    assert funnel["n_clean"] <= funnel["n_input"]
    # each twin shares its source's text → identical shingle sets →
    # identical MinHash signatures → same cluster; one of each pair dropped
    assert funnel["n_near_dup_dropped"] >= 5
    assert (funnel["n_curated"] <= funnel["n_after_dedup"]
            <= funnel["n_clean"])
    assert funnel["n_curated"] > 0.8 * funnel["n_input"] - 10


def test_actor_pool_mode_same_verdicts(pages_fixture, tmp_path):
    """The actor-pool scan form produces identical verdicts to the
    stateless-task default."""
    import os

    from lk_data_test_ray.pipelines.validate import run_validation

    a = run_validation(os.path.join(pages_fixture, "pages"),
                       str(tmp_path / "tasks"), check_extract=False)
    b = run_validation(os.path.join(pages_fixture, "pages"),
                       str(tmp_path / "actors"), check_extract=False,
                       use_actor_pool=True, concurrency=3)
    assert a["per_check_violations"] == b["per_check_violations"]


def test_c0_schema_violation_direct():
    """C0 fires on a wrong-schema batch (missing/extra/retyped columns)."""
    import pyarrow as pa

    from lk_data_test_ray.checks.row import RowChecker

    rc = RowChecker(check_extract=False)
    bad = pa.table({"url": pa.array(["u"], pa.string()),
                    "warc_ts": pa.array([0], pa.int64()),  # wrong type
                    "html": pa.array([b"x"], pa.binary()),
                    "text": pa.array(["x"], pa.string()),
                    "lang": pa.array(["en"], pa.string())})
    out = rc._process(bad, 3)
    viol = out.filter(__import__("pyarrow.compute", fromlist=["x"]).equal(
        out["kind"], "violation"))
    assert viol["check_id"].to_pylist() == ["c0_schema"]
    assert viol["partition_id"].to_pylist() == [3]


def test_empty_partition_commits_and_resumes(pages_fixture, tmp_path):
    """A parquet file with zero row groups must still commit a manifest (one
    empty scan item) so resume converges instead of re-scanning forever."""
    import glob
    import shutil

    from lk_data_test_ray.schema import PAGES_SCHEMA
    from lk_data_test_ray.state.manifest import ManifestStore

    dst = str(tmp_path / "pages")
    shutil.copytree(os.path.join(pages_fixture, "pages"), dst)
    pq.write_table(PAGES_SCHEMA.empty_table(),
                   os.path.join(dst, "part-99999.parquet"))
    out = str(tmp_path / "out")
    s = run_validation(dst, out,
                       lang_hist_path=os.path.join(pages_fixture,
                                                   "lang_hist.parquet"))
    done = ManifestStore(os.path.join(out, "manifests")).completed()
    n_files = len(glob.glob(os.path.join(dst, "*.parquet")))
    assert len([k for k in done if k != "global"]) == n_files
    # resume over a fully-committed run: identical verdicts, nothing re-runs
    s2 = run_validation(dst, out,
                        lang_hist_path=os.path.join(pages_fixture,
                                                    "lang_hist.parquet"))
    assert s2["per_check_violations"] == s["per_check_violations"]
    assert s2["n_rows"] == s["n_rows"]
