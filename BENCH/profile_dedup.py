"""Phase-level profile of the MinHash-LSH scaling workload.

Splits the dedup_scale.py timed region into driver-side plan build,
signature compute+checkpoint, and LSH join+refine execution, at two
parallelism levels — to locate the serial fraction behind a scaling
efficiency drop (Amdahl: S + P/c fits from two core counts).

Usage: python BENCH/profile_dedup.py [repl]   (default repl=32)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from geospatial_store_siting_spark.session import get_spark
from geospatial_store_siting_spark.operators import dedup
from geospatial_store_siting_spark.sources import tables

cores = int(sys.argv[1]); repl = int(sys.argv[2]); sf_dir = sys.argv[3]
spark = get_spark(app_name=f"dedup-prof-{cores}", cores=cores,
                  shuffle_partitions=32,
                  extra_conf={"spark.sql.adaptive.coalescePartitions.enabled": "false"})
tables.register_tables(spark, sf_dir)
big_path = os.path.join("/root/repo/.snapshots", f"dedup_scale_docs_x{repl}")
if not os.path.exists(os.path.join(big_path, "_SUCCESS")):
    reps = spark.range(repl).select(F.col("id").alias("rep"))
    (spark.table("documents").crossJoin(reps)
        .withColumn("doc_id", F.concat_ws("_", "doc_id", "rep"))
        .withColumn(
            "text",
            F.expr("concat_ws(' ', transform(split(text, ' '), "
                   "x -> concat(x, '_', rep)))"),
        )
        .drop("rep")
        .repartition(32, "doc_id")
        .write.mode("overwrite").parquet(big_path))
spark.read.parquet(big_path).createOrReplaceTempView("documents")
n_docs = spark.table("documents").count()

def phases():
    out = {}
    t0 = time.perf_counter()
    sig_plan = dedup.minhash_signatures(spark)
    out["build_sig_plan"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    sig = sig_plan.localCheckpoint(eager=True)
    out["exec_sig_checkpoint"] = time.perf_counter() - t0

    # rebuild the pairs plan over the checkpointed signature by calling the
    # public API with a monkeypatched signature source
    t0 = time.perf_counter()
    orig = dedup.minhash_signatures
    dedup.minhash_signatures = lambda s: sig
    try:
        pairs = dedup.minhash_lsh_pairs(spark)
    finally:
        dedup.minhash_signatures = orig
    out["build_pairs_plan"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    pairs.write.mode("overwrite").format("noop").save()
    out["exec_pairs"] = time.perf_counter() - t0
    out["total"] = sum(out.values())
    return {k: round(v, 3) for k, v in out.items()}

phases()  # warm: JIT + codegen
best = min((phases() for _ in range(2)), key=lambda p: p["total"])
print(json.dumps({"cores": cores, "docs": n_docs, **best}))
spark.stop()
""" % {"repo": REPO}


def run(cores: int, repl: int, sf_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), str(repl), sf_dir],
        capture_output=True, text=True, timeout=1800, check=False,
    )
    import time as _t

    _t.sleep(15)
    for line in out.stdout.strip().splitlines()[::-1]:
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"worker failed: {out.stderr[-3000:]}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    for cores in (4, 16):
        print(json.dumps(run(cores, repl, sf_dir)))


if __name__ == "__main__":
    main()
