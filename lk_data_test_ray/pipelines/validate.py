"""The flagship validation job: full constraint suite over a pages table.

Lifecycle (SURVEY.md §3.4): read_parquet(pages) → fused row-phase actor stage
(C0/C2/C3/C4/C6 + sketch partials, ONE streaming pass over the heavy columns)
→ per-partition violations + lineage manifests (resume unit) → global phase:
C1 uniqueness via a hash-compacted url-only shuffle + C5 drift from merged
partials → union of violation streams + summary verdict.

Execution/resume model:
  * partition = one input parquet file; partition_id = index in the sorted
    file list (stable across runs).
  * the whole row phase is ONE streaming Dataset execution: results are
    consumed incrementally with ``iter_batches`` and every partition's
    violations + manifest commit atomically as soon as all of its scan items
    have arrived (each item contributes exactly one stats partial, so
    completion is a per-partition item count). A killed run re-runs only
    uncommitted partitions (resume-equals-fresh is property-tested). One
    execution — not one per wave — matters because the streaming executor
    has a ~1s fixed floor per execution, which at 32 CPUs was a third of the
    whole job's wall time.
  * the global phase runs after all partitions commit and writes its own
    manifest; its inputs are column-pruned re-reads (url only), not the heavy
    html/text columns.
"""

from __future__ import annotations

import glob
import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..checks.drift import chi_square_drift
from ..checks.row import (make_scan_check_fn, merge_stats, plan_scan_items,
                          split_combined)
from ..checks.uniqueness import duplicates_to_violations, find_duplicate_urls
from ..schema import VIOLATIONS_SCHEMA
from ..state.manifest import ManifestStore

ENGINE_VERSION = "0.1.0"

CHECK_IDS = ["c0_schema", "c1_url_unique", "c2_nonnull", "c3_lang_vocab",
             "c4_ts_range", "c5_lang_drift", "c6_extract_match"]


def _pages_files(pages_path: str) -> list[str]:
    if os.path.isdir(pages_path):
        files = sorted(glob.glob(os.path.join(pages_path, "*.parquet")))
    else:
        files = [pages_path]
    if not files:
        raise FileNotFoundError(f"no parquet files under {pages_path}")
    return files


def run_validation(
    pages_path: str,
    out_dir: str,
    lang_hist_path: str | None = None,
    resume: bool = True,
    wave_size: int = 8,
    batch_size: int | None = None,
    concurrency: int | tuple | None = None,
    check_extract: bool = True,
    drift_alpha: float = 1e-3,
    clean_dir: str | None = None,
    use_actor_pool: bool = False,
    scan_target_rows: int | None = None,
    collect_ray_stats: bool = False,
) -> dict:
    """Run the full suite; returns the summary dict (also written as JSON)."""
    import threading

    t0 = time.time()
    files = _pages_files(pages_path)
    partition_of = {f: i for i, f in enumerate(files)}
    viol_dir = os.path.join(out_dir, "violations")
    os.makedirs(viol_dir, exist_ok=True)
    store = ManifestStore(os.path.join(out_dir, "manifests"))
    done = store.completed() if resume else {}

    todo = [f for f in files if partition_of[f] not in done]
    ray_stats = None

    # ---- global C1 uniqueness runs CONCURRENTLY with the row phase ----------
    # (independent datasets: C1 re-reads only the url column; Ray Data
    # schedules both pipelines side by side, hiding the shuffle latency)
    c1_result: dict = {}

    def _c1():
        try:
            c1_result["dups"] = find_duplicate_urls(files)
        except Exception as ex:  # surface after the row phase
            c1_result["error"] = ex

    c1_thread = threading.Thread(target=_c1, daemon=True)
    c1_thread.start()

    # ---------------- row phase: ONE streaming execution ---------------------
    # fused read+check over a Dataset of (file, row-group range) scan items:
    # html/text bytes never enter the object store; only violations + stats
    # partials (KBs) flow out of each task (see make_scan_check_fn). Results
    # stream back via iter_batches; a partition commits the moment its last
    # scan item lands, so a mid-run kill keeps all finished partitions.
    # (wave_size is retained for CLI/test compat; commits are per-partition
    # and no longer batched into wave-sized executions.)
    del wave_size
    if clean_dir is not None:
        os.makedirs(clean_dir, exist_ok=True)
    items = plan_scan_items(todo, partition_of, target_rows=scan_target_rows)
    if items:
        from collections import Counter

        expected = Counter(it["pid"] for it in items)
        file_of_pid = {partition_of[f]: f for f in todo}
        # (an rd.range-based lazy fan-out was measured SLOWER than these
        # driver-side puts — 3.53s vs 3.25s at 32 CPUs/2.4M rows — the range
        # op adds a task layer that doesn't fuse with batch_size=1 rebatching)
        # Pre-put one single-row block per item: from_items mints its blocks
        # serially through one producing task (~4.4ms/block = a 20% serial
        # fraction at 32 CPUs); from_arrow_refs hands the scheduler every
        # block immediately, so the scan goes full-width from t=0 (measured
        # +13% row-phase throughput at 32 CPUs / 4.8M rows).
        import ray as _ray

        ds = rd.from_arrow_refs([
            _ray.put(pa.table({k: [it[k]]
                               for k in ("path", "rg_lo", "rg_hi", "pid")}))
            for it in items])
        kwargs = dict(batch_format="pyarrow", batch_size=1)
        if concurrency is not None:
            # never ask for more concurrent tasks than there are scan items
            # (small inputs would warn and reserve slots that cannot fill)
            kwargs["concurrency"] = (min(concurrency, len(items))
                                     if isinstance(concurrency, int)
                                     else concurrency)
        if use_actor_pool:
            # actor-pool mode for heavy per-actor state (model scorers):
            # setup once per actor in __init__, work per batch in __call__
            from ..checks.row import ScanCheckActor

            kwargs.setdefault("concurrency", 8)
            combined = ds.map_batches(
                ScanCheckActor,
                fn_constructor_kwargs=dict(check_extract=check_extract,
                                           clean_dir=clean_dir), **kwargs)
        else:
            combined = ds.map_batches(
                make_scan_check_fn(check_extract=check_extract,
                                   clean_dir=clean_dir), **kwargs)

        pend_viol: dict[int, list[pa.Table]] = {}
        pend_stats: dict[int, list[dict]] = {}
        seen: Counter = Counter()

        def _commit(pid: int) -> None:
            pv = (pa.concat_tables(pend_viol.pop(pid))
                  if pid in pend_viol else VIOLATIONS_SCHEMA.empty_table())
            vp = os.path.join(viol_dir, f"part-{pid:05d}.parquet")
            tmp = vp + ".tmp"
            pq.write_table(pv, tmp)
            os.replace(tmp, vp)
            stats = merge_stats(pend_stats.pop(pid, []))
            store.commit(
                pid,
                {
                    "input_fragment": file_of_pid[pid],
                    "n_rows": stats["n_rows"],
                    "violation_count": int(pv.num_rows),
                    "per_check_violations": _per_check_counts(pv),
                    "passed": pv.num_rows == 0,
                    "engine_version": ENGINE_VERSION,
                },
                stats=stats,
            )

        # commits run on background threads so parquet/manifest writes
        # overlap the stream instead of stalling consumption (safe: a pid is
        # submitted exactly once, and commits touch disjoint files/buffers)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=4) as commit_ex:
            futs = []
            submitted: set = set()
            for tbl in combined.iter_batches(batch_format="pyarrow",
                                             batch_size=None):
                viol, partials = split_combined([tbl])
                done_pids = []
                for pid, p in partials:
                    pend_stats.setdefault(pid, []).append(p)
                    seen[pid] += 1
                    if seen[pid] == expected[pid]:
                        done_pids.append(pid)
                if viol.num_rows:
                    for pid in pc.unique(viol["partition_id"]).to_pylist():
                        pend_viol.setdefault(pid, []).append(
                            viol.filter(pc.equal(viol["partition_id"], pid)))
                futs += [commit_ex.submit(_commit, pid) for pid in done_pids]
                submitted.update(done_pids)
            # partitions that somehow missed an expected-count trigger (a
            # defensive sweep; NOT pids merely pending on the commit thread —
            # re-submitting those would overwrite their manifest with empty
            # stats after the real commit pops the buffers)
            futs += [commit_ex.submit(_commit, pid)
                     for pid in list(pend_stats) if pid not in submitted]
            for f in futs:
                f.result()  # surface commit errors
        if collect_ray_stats:
            # the executor's own per-operator wall/cpu breakdown — the
            # measure-don't-guess surface (``validate --stats`` CLI flag)
            ray_stats = combined.stats()

    # ---------------- merge committed partition stats ------------------------
    done = store.completed()
    all_stats = [store.load_stats(pid) for pid in sorted(done, key=str)
                 if pid != "global"]
    all_stats = [s for s in all_stats if s is not None]
    global_stats = merge_stats(all_stats)

    # ---------------- global phase: C1 uniqueness ----------------------------
    c1_thread.join()
    if "error" in c1_result:
        raise c1_result["error"]
    c1_viol = duplicates_to_violations(c1_result["dups"])

    # ---------------- global phase: C5 drift ---------------------------------
    drift = None
    c5_viol = VIOLATIONS_SCHEMA.empty_table()
    if lang_hist_path and os.path.exists(lang_hist_path):
        hist = pq.read_table(lang_hist_path)
        expected = dict(zip(hist["lang"].to_pylist(),
                            hist["expected_fraction"].to_pylist()))
        drift = chi_square_drift(global_stats["lang_counts"], expected,
                                 alpha=drift_alpha)
        if not drift["passed"]:
            worst = sorted(drift["per_lang"].items(),
                           key=lambda kv: -kv[1]["chi2_contrib"])[:3]
            c5_viol = pa.table(
                {
                    "check_id": ["c5_lang_drift"],
                    "url": [""],
                    "partition_id": [-1],
                    "severity": ["warn"],
                    "detail": [json.dumps({"chi2": drift["chi2"],
                                           "p_value": drift["p_value"],
                                           "worst": dict(worst)})],
                },
                schema=VIOLATIONS_SCHEMA,
            )

    global_viol = pa.concat_tables([c1_viol, c5_viol])
    gp = os.path.join(viol_dir, "global.parquet")
    tmp = gp + ".tmp"
    pq.write_table(global_viol, tmp)
    os.replace(tmp, gp)
    store.commit(
        "global",
        {
            "input_fragment": pages_path,
            "n_rows": global_stats["n_rows"],
            "violation_count": int(global_viol.num_rows),
            "per_check_violations": _per_check_counts(global_viol),
            "passed": global_viol.num_rows == 0,
            "engine_version": ENGINE_VERSION,
        },
    )

    # ---------------- summary ------------------------------------------------
    per_check = {c: 0 for c in CHECK_IDS}
    for rec in store.completed().values():
        for c, n in rec.get("per_check_violations", {}).items():
            per_check[c] = per_check.get(c, 0) + n
    wall = time.time() - t0
    summary = {
        "n_rows": global_stats["n_rows"],
        "n_partitions": len(files),
        "violations_total": int(sum(per_check.values())),
        "per_check_violations": per_check,
        "passed": sum(per_check.values()) == 0,
        "stats": {k: v for k, v in global_stats.items()
                  if not isinstance(v, (bytes, bytearray))},
        "drift": drift,
        "wall_sec": round(wall, 3),
        "rows_per_sec": round(global_stats["n_rows"] / wall, 1) if wall else None,
        "engine_version": ENGINE_VERSION,
    }
    if collect_ray_stats and ray_stats is not None:
        summary["ray_stats"] = ray_stats
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1, default=str)
    return summary


def load_violations(out_dir: str) -> pa.Table:
    files = sorted(glob.glob(os.path.join(out_dir, "violations", "*.parquet")))
    tables = [pq.read_table(f) for f in files]
    return pa.concat_tables(tables) if tables else VIOLATIONS_SCHEMA.empty_table()


def _per_check_counts(viol: pa.Table) -> dict[str, int]:
    if viol.num_rows == 0:
        return {}
    vals, counts = (
        viol.group_by("check_id").aggregate([("check_id", "count")])
    ), None
    return {
        vals["check_id"][i].as_py(): vals["check_id_count"][i].as_py()
        for i in range(vals.num_rows)
    }


