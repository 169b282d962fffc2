"""Z-order layout evidence: bbox scans over a Morton-clustered table vs a
hash-scattered and a single-axis-sorted layout.

What this measures (and the design rule it supports): at 100 TB the
dominant cost of a bbox query is WHICH row groups the scan must read —
min/max stats prune the rest for free. Interleaving both axial coords
(``sources/layout.write_zordered``) bounds every row group in BOTH q and
r; sorting by one axis only bounds that axis (a thin-slab layout: tight
in q, full-extent in r), and hash scatter bounds neither. The harness
replicates the sf0.1 sites table ×REPL, writes all three layouts with
identical file counts, and counts stats-surviving row groups for a
metro-core bbox battery (plus end-to-end Spark scan times — same
pushdown decision, through the real reader).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from geospatial_store_siting_spark.session import get_spark  # noqa: E402
from geospatial_store_siting_spark.sources import layout, tables  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPL = 1024
N_FILES = 256
ROW_GROUP_BYTES = 1 << 20  # fine-grained stats, Iceberg row-group-size knob


def metro_bboxes(spark) -> dict[str, list[tuple[tuple[int, int], tuple[int, int]]]]:
    """Two bbox batteries per metro: a center-quarter box (the urban-core
    query shape, constrained in both axes) and a latitude-band box (full
    q extent, quarter r) — the shape a single-axis q-sort cannot prune."""
    rows = (
        spark.table("sites")
        .groupBy("metro")
        .agg(
            F.min("q").alias("q0"), F.max("q").alias("q1"),
            F.min("r").alias("r0"), F.max("r").alias("r1"),
        )
        .collect()
    )
    core, band = [], []
    for m in rows:
        qs, rs = m["q1"] - m["q0"], m["r1"] - m["r0"]
        qq = (m["q0"] + 3 * qs // 8, m["q0"] + 5 * qs // 8)
        rr = (m["r0"] + 3 * rs // 8, m["r0"] + 5 * rs // 8)
        core.append((qq, rr))
        band.append(((m["q0"], m["q1"]), rr))
    return {"metro-core quarter": core, "latitude band (full q)": band}


def main() -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="zorder-scale", cores=cores, shuffle_partitions=64)
    tables.load_all(spark, SF_DIR)

    big = (
        spark.table("sites")
        .select("site_id", "q", "r", "metro", "annual_sales")
        .crossJoin(spark.range(REPL).select(F.col("id").alias("rep")))
        .select(
            (F.col("site_id") * REPL + F.col("rep")).alias("site_id"),
            "q", "r", "metro", "annual_sales",
        )
    )
    n_rows = big.count()

    root = os.path.join(REPO, ".snapshots", "zorder_bench")
    paths = {k: os.path.join(root, k) for k in ("zord", "qsort", "rand")}
    layout.write_zordered(big, paths["zord"], N_FILES, row_group_bytes=ROW_GROUP_BYTES)
    (
        big.repartitionByRange(N_FILES, "q")
        .sortWithinPartitions("q", "r")
        .write.mode("overwrite")
        .option("parquet.block.size", str(ROW_GROUP_BYTES))
        .parquet(paths["qsort"])
    )
    (
        big.repartition(N_FILES, "site_id")
        .write.mode("overwrite")
        .option("parquet.block.size", str(ROW_GROUP_BYTES))
        .parquet(paths["rand"])
    )

    batteries = metro_bboxes(spark)
    touched = {b: {k: 0 for k in paths} for b in batteries}
    total = {k: 0 for k in paths}
    for bname, boxes in batteries.items():
        for qr, rr in boxes:
            for k, p in paths.items():
                t, tot = layout.row_groups_touched(p, qr, rr)
                touched[bname][k] += t
                total[k] = tot  # identical per layout across bboxes

    def scan_time(path: str, boxes) -> float:
        df = spark.read.parquet(path)
        t0 = time.perf_counter()
        for qr, rr in boxes:
            df.filter(
                F.col("q").between(*qr) & F.col("r").between(*rr)
            ).agg(F.sum("annual_sales")).collect()
        return round(time.perf_counter() - t0, 2)

    times = {}
    for bname, boxes in batteries.items():
        for p in paths.values():
            scan_time(p, boxes)  # warm: codegen + page cache
        times[bname] = {k: scan_time(p, boxes) for k, p in paths.items()}

    n_boxes = {b: len(v) for b, v in batteries.items()}

    def pct(b, k):
        return round(100 * (1 - touched[b][k] / (total[k] * n_boxes[b])), 1)

    result = {
        "rows": n_rows,
        "files": N_FILES,
        "row_groups_total": total,
        "row_groups_touched": touched,
        "scan_sec": times,
        "skip_pct": {b: {k: pct(b, k) for k in paths} for b in batteries},
        "cores": cores,
    }
    print(json.dumps(result))

    from _md import replace_section

    lines = []
    for b in batteries:
        for k, label in (
            ("zord", "Z-order (Morton q,r)"),
            ("qsort", "sort by q only"),
            ("rand", "hash scatter"),
        ):
            lines.append(
                f"| {b} | {label} | {touched[b][k]} | {pct(b, k)}% | {times[b][k]} s |"
            )
    replace_section(
        os.path.join(REPO, "BENCH", "BASELINE.md"),
        "\n## Z-order layout",
        (
            f"\n## Z-order layout — sites x{REPL} = {n_rows} rows, {N_FILES} files "
            f"(1 row group each), 5 bboxes per battery, local[{cores}]\n\n"
            f"| bbox battery | layout | row groups touched (of {total['zord']} x 5) | skipped | scan |\n"
            f"|---|---|---|---|---|\n" + "\n".join(lines) + "\n\n"
            f"Multi-dimensional clustering is what makes stats pruning robust to the\n"
            f"PREDICATE shape: the Morton layout bounds every row group in BOTH axes\n"
            f"(sources/layout.write_zordered — range shuffle + in-partition sort, the\n"
            f"Iceberg ZORDER sort-order twin) and prunes both batteries; the q-sort\n"
            f"prunes q-constrained boxes (metros are disjoint in q, so it inherits\n"
            f"metro partitioning for free) but collapses to a near-full scan on\n"
            f"latitude bands; hash scatter prunes nothing anywhere. At 100 TB the\n"
            f"touched-row-group ratio IS the scan cost ratio for bbox-shaped reads.\n"
        ),
    )
    spark.stop()


if __name__ == "__main__":
    main()
