"""Round-6 optimization profiler — per-bench-query min/median timing + job
counts + formatted plans.

Mirrors bench.py's methodology (same queries, same noop-sink force, same
warm-up) but reports the MIN over N reps (robust against the sandbox's
noisy-host windows), the per-rep Spark job count (fixed job overhead is a
first-order cost at sf0.1), and writes .explain("formatted") to
plans/r06/<query>_<tag>.txt so plan claims are checkable.

    python BENCH/r6_profile.py [tag] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

    import bench  # the frozen harness owns the query list

    from geospatial_store_siting_spark.operators import dedup
    from geospatial_store_siting_spark.session import get_spark
    from geospatial_store_siting_spark.sources import tables

    plan_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(plan_dir, exist_ok=True)

    spark = get_spark(app_name=f"r6-profile-{tag}", cores=CPUS)
    tables.load_all(spark, SF_DIR)
    for t in ("sites", "hex_grid", "competitors", "poi"):
        spark.table(t).count()

    import tempfile

    feat_path = tempfile.mkdtemp(prefix="bench_feat_") + "/features"
    bench.BENCH_QUERIES["hex_feature_join"](spark).write.mode("overwrite").parquet(feat_path)
    spark.read.parquet(feat_path).createOrReplaceTempView("bench_features")
    dedup.minhash_lsh_pairs(spark, sf_dir=SF_DIR).write.mode("overwrite").format("noop").save()
    for idx in dedup.ingest_probe_index(spark, SF_DIR):
        idx.count()

    sc = spark.sparkContext
    out: dict[str, dict] = {}
    for name, fn in bench.BENCH_QUERIES.items():
        if only and name not in only:
            continue
        sc.setJobDescription(f"r6:{name}")
        builds, execs, jobs = [], [], None
        for i in range(reps):
            group = f"r6_{name}_{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = fn(spark)
            t1 = time.perf_counter()
            bench.force(df)
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            if i == 0:
                with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as fh:
                    fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
        sc.setJobGroup("", "")
        out[name] = {
            "build_min": round(min(builds), 3),
            "build_med": round(statistics.median(builds), 3),
            "exec_min": round(min(execs), 3),
            "exec_med": round(statistics.median(execs), 3),
            "total_min": round(min(b + e for b, e in zip(builds, execs)), 3),
            "total_med": round(statistics.median(b + e for b, e in zip(builds, execs)), 3),
            "jobs": jobs,
        }
        print(json.dumps({name: out[name]}), flush=True)
    total_min = round(sum(v["total_min"] for v in out.values()), 3)
    total_med = round(sum(v["total_med"] for v in out.values()), 3)
    print(json.dumps({"tag": tag, "reps": reps, "sum_of_min": total_min,
                      "sum_of_med": total_med}))
    spark.stop()


if __name__ == "__main__":
    main()
