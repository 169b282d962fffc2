"""Physical-plan audit: for each headline query, report the properties
that matter at 100 TB — exchange (shuffle) count, broadcast joins vs
sort-merge joins, whole-stage-codegen coverage, parquet pushdown.

Usage: python tools/explain_audit.py [name ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from geospatial_store_siting_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

DEFAULT = [
    "hex_feature_join",
    "huff_features",
    "score_candidates",
    "knn_competitors",
    "competition_distance",
    "dedup_minhash_lsh",
    "ann_lsh_topk",
    "zonal_stats",
    "events_sessionize",
    "tpch_q3_top_orders",
]


def audit(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "nested_loop_joins": len(re.findall(r"NestedLoopJoin", plan)),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "pushed_filters": len(re.findall(r"PushedFilters: \[[^\]]*Is", plan)),
        "scans": len(re.findall(r"FileScan|InMemoryTableScan", plan)),
        "python_udfs": len(re.findall(r"(ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas|MapInPandas)", plan)),
    }


def main(names: list[str]) -> None:
    spark = get_spark(cores=8)
    qs = entry_mod.queries()
    for name in names or DEFAULT:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        a = audit(plan)
        flags = []
        if a["nested_loop_joins"]:
            flags.append("NESTED_LOOP!")
        if a["sortmerge_joins"] > a["broadcast_joins"] and "dedup" not in name:
            flags.append("SMJ-heavy")
        print(f"{name:28s} {a}  {' '.join(flags)}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
