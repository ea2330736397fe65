"""Compute-skew exposure audit (VERDICT r7 #4).

AQE's skew-join splitting triggers on SHUFFLE BYTES, so a
low-cardinality join key feeding a compute-heavy, byte-light stage can
put minutes of work on one core with no runtime mitigation — exactly
how r7's dedup_embedding straggler burned 645 s in one task. This tool
measures that exposure class directly: for each key it runs the query
once at the given SF and reads per-stage task-duration quantiles from
the Spark UI REST API (/api/v1/.../stages), then reports the stage with
the largest max-task/median-task ratio weighted by how much of the
key's wall time that stage is.

A ratio near 1 means the work is balanced; max/median > 4 on a stage
that dominates wall time means one straggler core is the critical path
and the key needs salting (or a finer bucket key).

Usage:
    python tools/skew_audit.py --keys a,b,c \
        [--dir benchdata/sf1] [--cpus 32]

Output: one JSON line per key on stdout + a summary table on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def _stage_rows(api: str, app: str, seen: set[int]) -> list[dict]:
    """Completed stages not in `seen`, with task-duration quantiles."""
    out = []
    for st in _get(f"{api}/applications/{app}/stages?status=complete"):
        sid = st["stageId"]
        if sid in seen:
            continue
        seen.add(sid)
        try:
            q = _get(f"{api}/applications/{app}/stages/{sid}/"
                     f"{st['attemptId']}/taskSummary"
                     f"?quantiles=0.0,0.5,1.0")
            dur = q.get("duration") or q.get("executorRunTime")
        except Exception:
            dur = None
        out.append({
            "stage": sid,
            "name": (st.get("name") or "")[:60],
            "n_tasks": st.get("numCompleteTasks", 0),
            "stage_sec": round((st.get("executorRunTime", 0)) / 1000.0, 2),
            "task_med_sec": round(dur[1] / 1000.0, 3) if dur else None,
            "task_max_sec": round(dur[2] / 1000.0, 3) if dur else None,
        })
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", required=True)
    ap.add_argument("--dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchdata", "sf1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    a = ap.parse_args()
    keys = [k for k in a.keys.split(",") if k]

    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (SparkSession.builder.master(f"local[{a.cpus}]")
             .appName("skew-audit")
             .config("spark.sql.shuffle.partitions", a.cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "true")     # the metrics source
             .config("spark.ui.retainedStages", "2000")
             .config("spark.driver.memory", "24g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        print("no UI URL — cannot read task metrics", file=sys.stderr)
        return 1
    api = f"{ui}/api/v1"
    app = spark.sparkContext.applicationId

    from excel_to_db_spark.tables import TABLE_NAMES, load_table
    for t in TABLE_NAMES:
        try:
            load_table(spark, a.dir, t).count()
        except Exception:
            pass
    try:
        spark.range(2).mapInPandas(lambda it: it, "id bigint").count()
    except Exception:
        pass

    seen: set[int] = set()
    _stage_rows(api, app, seen)           # swallow warmup stages

    rows = []
    for k in keys:
        fn = qs.get(k)
        if fn is None:
            print(f"?? {k}", file=sys.stderr)
            continue
        t0 = time.perf_counter()
        try:
            fn(spark, a.dir).count()
        except Exception as exc:
            print(f"!! {k}: {exc!r}"[:200], file=sys.stderr)
            _stage_rows(api, app, seen)
            continue
        wall = round(time.perf_counter() - t0, 2)
        stages = _stage_rows(api, app, seen)
        # the skew-relevant stage: the one whose MAX task is largest
        # (the critical-path candidate), among stages with >= 4 tasks
        # (single-task stages are scalar fetches, not skew)
        cand = [s for s in stages
                if s["n_tasks"] >= 4 and s["task_max_sec"]]
        worst = max(cand, key=lambda s: s["task_max_sec"], default=None)
        rec = {"key": k, "wall_sec": wall, "n_stages": len(stages)}
        if worst:
            med = worst["task_med_sec"] or 0.001
            rec["worst_stage"] = {
                **worst,
                "max_over_median": round(worst["task_max_sec"] / med, 1),
                "max_share_of_wall": round(
                    worst["task_max_sec"] / wall, 2) if wall else None,
            }
        print(json.dumps(rec), flush=True)
        rows.append(rec)
        spark.catalog.clearCache()

    print("\nkey                          wall_s  maxtask_s  med_s  "
          "max/med  share", file=sys.stderr)
    for r in rows:
        w = r.get("worst_stage")
        if w:
            print(f"{r['key']:28s} {r['wall_sec']:6.1f} "
                  f"{w['task_max_sec']:9.2f} {w['task_med_sec'] or 0:6.2f} "
                  f"{w['max_over_median']:8.1f} "
                  f"{w['max_share_of_wall']:6.2f}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
