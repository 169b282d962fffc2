"""Skewed-grid hot-groupBy evidence: per-cell top-k over a grid where ONE
urban-core cell carries ~95% of all rows, across four plans.

The AQE plan test (tests/test_round3_ops.py) proves runtime skew-splitting
on the JOIN side; this harness evidences the WINDOW side, which AQE does
not rebalance.  Findings it records (and the design rule they support):

1. A plain ``row_number() OVER (PARTITION BY cell) ... WHERE rank <= k``
   is ALREADY skew-resistant on Spark 3.5+/4.x: Catalyst's
   ``InferWindowGroupLimit`` inserts map-side group limits, so the hot
   cell never reaches one reducer at full size.  Verified here by timing
   with the rule on vs excluded (~24x gap at a 40M-row hot cell).
2. When the group limit is NOT inferable (the rank feeds later operators
   instead of an immediate filter, percentile-style frames, engines
   without the rule), the hot cell IS a single-reducer straggler —
   operators/skew.salted_topk's two-phase plan cuts it ~4x while
   producing identical rows (asserted here, oracle-checked at sf0.01 via
   salted_topk_docs).

So: write top-k windows in the filter-inferable form when possible; reach
for salted_topk when the limit cannot be inferred.  Appends the measured
table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from geospatial_store_siting_spark.operators import skew  # noqa: E402
from geospatial_store_siting_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_CELLS = 10_000
UNIFORM_ROWS = 2_000_000  # ~200 per cell
HOT_ROWS = 40_000_000  # ONE cell carrying ~95% of all rows (urban core)
K = 5
WGL_RULE = "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit"


def build_input(spark):
    path = os.path.join(REPO, ".snapshots", "skew_ring_entities")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        uniform = spark.range(UNIFORM_ROWS).select(
            F.pmod(F.xxhash64("id"), F.lit(N_CELLS)).alias("cell_id"),
            F.col("id").alias("entity_id"),
            F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1_000_000)).alias("score"),
        )
        hot = spark.range(HOT_ROWS).select(
            F.lit(0).cast("long").alias("cell_id"),  # the urban-core cell
            (F.col("id") + UNIFORM_ROWS).alias("entity_id"),
            F.pmod(F.xxhash64("id", F.lit(13)), F.lit(1_000_000)).alias("score"),
        )
        uniform.unionByName(hot).repartition(64).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def main() -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="skew-ring", cores=cores, shuffle_partitions=64)
    ent = build_input(spark)
    n_rows = ent.count()
    order = [F.desc("score"), F.asc("entity_id")]

    def naive():
        w = Window.partitionBy("cell_id").orderBy(*order)
        return ent.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= K)

    def salted():
        return skew.salted_topk(
            ent, key="cell_id", order_cols=order, k=K, salt_source=F.col("entity_id")
        )

    # exactness: identical MULTISETS, both directions (one-sided exceptAll
    # would pass if salted emitted extras/duplicates)
    nv = naive().select("cell_id", "entity_id", "rank")
    sv = salted().select("cell_id", "entity_id", "rank")
    missing, extra = nv.exceptAll(sv).count(), sv.exceptAll(nv).count()
    assert missing == 0 and extra == 0, f"salted top-k diverged: -{missing}/+{extra} rows"
    assert "WindowGroupLimit" in naive()._jdf.queryExecution().executedPlan().toString()

    def timed(fn):  # one timed run per variant (the rule-off run is minutes)
        t0 = time.perf_counter()
        fn().write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 2)

    timed(naive)  # warm: JIT + codegen + page cache
    t_naive_wgl = timed(naive)
    t_salted_wgl = timed(salted)
    spark.conf.set("spark.sql.optimizer.excludedRules", WGL_RULE)
    try:
        t_naive_raw = timed(naive)
        t_salted_raw = timed(salted)
    finally:
        spark.conf.unset("spark.sql.optimizer.excludedRules")

    result = {
        "rows": n_rows,
        "hot_cell_rows": HOT_ROWS,
        "k": K,
        "naive_window_group_limit_sec": t_naive_wgl,
        "salted_topk_sec": t_salted_wgl,
        "naive_no_inferable_limit_sec": t_naive_raw,
        "salted_no_inferable_limit_sec": t_salted_raw,
        "straggler_mitigation": round(t_naive_raw / t_salted_raw, 2),
        "cores": cores,
    }
    print(json.dumps(result))
    # replace this harness's own section on rerun (blind append would
    # accumulate contradictory measurements that scaling.py's
    # section-preserving rewrite then keeps forever)
    from _md import replace_section

    replace_section(
        os.path.join(REPO, "BENCH", "BASELINE.md"),
        "\n## Skewed-grid hot-cell top-k",
        (
            f"\n## Skewed-grid hot-cell top-k — {n_rows} rows, 1 cell at "
            f"{HOT_ROWS} rows (~95% of corpus), local[{cores}]\n\n"
            f"| plan | wall | note |\n|---|---|---|\n"
            f"| window + rank<=k filter (Catalyst InferWindowGroupLimit) | {t_naive_wgl} s | map-side group limits — already skew-resistant |\n"
            f"| salted_topk (rule available) | {t_salted_wgl} s | identical output, asserted |\n"
            f"| window, group limit NOT inferable (rule excluded) | {t_naive_raw} s | one reducer sorts the 40M-row hot cell — the straggler |\n"
            f"| salted_topk under the same constraint | {t_salted_raw} s | **{result['straggler_mitigation']}x** straggler mitigation |\n\n"
            f"Design rule: prefer the filter-inferable window form (Catalyst handles the\n"
            f"hot cell); use operators/skew.salted_topk when the per-key limit cannot be\n"
            f"inferred (rank consumed downstream, percentile frames, other engines).\n"
        ),
    )
    spark.stop()


if __name__ == "__main__":
    main()
