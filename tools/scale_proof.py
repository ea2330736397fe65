"""Plan-stability proof at a bigger scale factor (VERDICT r6 #4).

For each key, runs the query at two SF dirs in the same JVM and
records: wall time, and a summary of the FINAL executed plan (post-AQE,
captured after the count() action) — joins by strategy, exchanges, AQE
shuffle reads, scans. Local benches hide exactly the things this
surfaces: a broadcast join whose build side outgrows the threshold and
flips to SortMergeJoin, a skew split appearing, a CartesianProduct
sneaking in past a size check.

Output: one JSON line per key on stdout +a summary table on stderr.

Usage:
    python tools/scale_proof.py --keys a,b,c \
        --small /root/testdata/sf0.1 --big benchdata/sf1 [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# operators worth counting in an executed plan, by scale relevance
_OPS = (
    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct",
    "Exchange", "AQEShuffleRead", "BroadcastExchange",
    "Scan parquet", "WholeStageCodegen",
)


def _summarize(plan: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for op in _OPS:
        n = len(re.findall(re.escape(op), plan))
        if n:
            out[op] = n
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", required=True)
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchdata", "sf1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    a = ap.parse_args()
    keys = [k for k in a.keys.split(",") if k]

    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (SparkSession.builder.master(f"local[{a.cpus}]")
             .appName("scale-proof")
             .config("spark.sql.shuffle.partitions", a.cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "24g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    # session warmup (same discipline as bench.py)
    from excel_to_db_spark.tables import TABLE_NAMES, load_table
    for sf_dir in (a.small, a.big):
        for t in TABLE_NAMES:
            try:
                load_table(spark, sf_dir, t).count()
            except Exception:
                pass
    try:
        spark.range(2).mapInPandas(lambda it: it, "id bigint").count()
    except Exception:
        pass

    rows = []
    for k in keys:
        fn = qs.get(k)
        if fn is None:
            print(f"?? {k}", file=sys.stderr)
            continue
        rec: dict = {"key": k}
        for tag, sf_dir in (("small", a.small), ("big", a.big)):
            try:
                # Time fn() + one full execution, same spirit as
                # bench.py — iterative keys do eager work
                # (localCheckpoint rounds) INSIDE fn(), so starting the
                # clock after it would drop most of their cost.
                #
                # Execution MUST go through df's OWN QueryExecution:
                # df.count() builds a separate groupBy().count() QE, so
                # df's executedPlan would be planned but never executed
                # and AdaptiveSparkPlan would print isFinalPlan=false —
                # AQEShuffleRead, runtime skew splits, and AQE
                # broadcast<->SMJ flips (the very things this tool
                # audits) could never appear (ADVICE r7). Running
                # executedPlan().execute().count() materializes that
                # same plan, after which toString() shows the FINAL
                # adaptively-replanned tree.
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                jplan = df._jdf.queryExecution().executedPlan()
                jplan.execute().count()
                dt = round(time.perf_counter() - t0, 3)
                plan = jplan.toString()
                final = ("AdaptiveSparkPlan" not in plan
                         or "isFinalPlan=true" in plan)
                rec[tag] = {"sec": dt, "ops": _summarize(plan),
                            "final_plan": final}
                if not final:
                    print(f"!! {k} [{tag}]: captured plan is not final "
                          f"(isFinalPlan=false)", file=sys.stderr)
            except Exception as exc:
                rec[tag] = {"error": repr(exc)[:200]}
            spark.catalog.clearCache()
        if "sec" in rec.get("small", {}) and "sec" in rec.get("big", {}):
            s, b = rec["small"]["sec"], rec["big"]["sec"]
            rec["ratio"] = round(b / s, 2) if s > 0 else None
            so, bo = rec["small"]["ops"], rec["big"]["ops"]
            rec["plan_diff"] = {
                op: [so.get(op, 0), bo.get(op, 0)]
                for op in sorted(set(so) | set(bo))
                if so.get(op, 0) != bo.get(op, 0)
            }
        print(json.dumps(rec), flush=True)
        rows.append(rec)

    print("\nkey                          small_s  big_s  ratio  plan_diff",
          file=sys.stderr)
    for r in rows:
        if "ratio" in r:
            print(f"{r['key']:28s} {r['small']['sec']:7.2f} "
                  f"{r['big']['sec']:6.2f} {r['ratio']:6.2f}  "
                  f"{r['plan_diff'] or 'stable'}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
