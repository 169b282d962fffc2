"""Event-log stage profiler for scaling diagnosis.

Runs dedup.dedup_incremental over the replicated corpus once at a given
core count with spark.eventLog enabled, then reports per-stage wall
span, summed task time, and effective parallelism (task-time / span) —
the direct way to see WHICH stage stops scaling between local[4] and
local[16] instead of guessing from totals.

    python BENCH/stage_profile.py 16
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    logdir = "/tmp/spark-events"
    os.makedirs(logdir, exist_ok=True)
    import shutil

    for f in glob.glob(f"{logdir}/*"):
        shutil.rmtree(f) if os.path.isdir(f) else os.remove(f)

    from geospatial_store_siting_spark.operators import dedup
    from geospatial_store_siting_spark.session import get_spark
    from geospatial_store_siting_spark.sources import tables

    spark = get_spark(
        app_name=f"stage-profile-{cores}", cores=cores, shuffle_partitions=32,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": logdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    tables.register_tables(spark, "/root/testdata/sf0.1")
    big_path = "/root/repo/.snapshots/dedup_scale_docs_x512"
    spark.read.parquet(big_path).createOrReplaceTempView("documents")
    spark.table("documents").count()

    def run():
        t0 = time.perf_counter()
        dedup.dedup_incremental(spark, sf_dir=big_path).write.mode(
            "overwrite"
        ).format("noop").save()
        return time.perf_counter() - t0

    run()  # warm
    marker_job = spark.sparkContext.statusTracker().getJobIdsForGroup() or []
    wall = run()
    print(f"wall {wall:.2f}s at local[{cores}]", flush=True)
    spark.stop()

    stages = {}
    paths = [p for p in glob.glob(f"{logdir}/**/*", recursive=True) if os.path.isfile(p)]
    for path in paths:
        for line in open(path):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                scopes = []
                for rdd in si.get("RDD Info", []):
                    sc = rdd.get("Scope")
                    if sc:
                        try:
                            scopes.append(json.loads(sc).get("name", ""))
                        except json.JSONDecodeError:
                            pass
                st = stages.setdefault(sid, {})
                st.update(
                    {
                        "name": " ".join(dict.fromkeys(scopes))[:90],
                        "tasks": si["Number of Tasks"],
                        "span_s": round((comp - sub) / 1000.0, 2) if sub and comp else None,
                        "sub": sub,
                    }
                )
            if ev.get("Event") == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                rt = cpu = gc = 0
                for acc in (ev.get("Task Info") or {}).get("Accumulables", []):
                    if acc.get("Name") == "internal.metrics.executorRunTime":
                        rt = acc.get("Update", 0)
                    elif acc.get("Name") == "internal.metrics.executorCpuTime":
                        cpu = acc.get("Update", 0) / 1e6
                    elif acc.get("Name") == "internal.metrics.jvmGCTime":
                        gc = acc.get("Update", 0)
                st = stages.setdefault(sid, {})
                st["task_ms"] = st.get("task_ms", 0) + rt
                st["cpu_ms"] = st.get("cpu_ms", 0) + cpu
                st["gc_ms"] = st.get("gc_ms", 0) + gc

    # report the LAST run's stages (second half of the timeline)
    ordered = sorted((s for s in stages.values() if s.get("sub")), key=lambda s: s["sub"])
    half = len(ordered) // 2
    print(f"{'span_s':>7} {'task_s':>8} {'cpu_s':>7} {'gc_s':>6} {'par':>5} {'tasks':>5}  name")
    for s in ordered[half:]:
        task_s = round(s.get("task_ms", 0) / 1000.0, 2)
        cpu_s = round(s.get("cpu_ms", 0) / 1000.0, 2)
        gc_s = round(s.get("gc_ms", 0) / 1000.0, 2)
        par = round(task_s / s["span_s"], 1) if s.get("span_s") else None
        print(
            f"{s.get('span_s', '?'):>7} {task_s:>8} {cpu_s:>7} {gc_s:>6} {par!s:>5}"
            f" {s.get('tasks','?'):>5}  {s.get('name','?')}"
        )


if __name__ == "__main__":
    main()
