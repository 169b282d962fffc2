"""PIP at scale: mapInPandas bucketed ray-cast vs the shuffle-free JVM
broadcast cover join, on the sites table replicated REPL× (~1M points at
sf0.1 with the default 256, ~3.8M points).

Both plans produce the identical assignment (oracle-checked at sf0.01 by
``pip_cover_assignments`` / ``pip_index_assignments``); this harness
measures the cost of keeping PIP membership inside whole-stage codegen
(cell equi-join + half-plane refinement of the boundary ring) vs routing
every point through an Arrow/Python kernel.  The cover join is the
100-TB path: per-point work is O(candidates-in-cell), the polygon layer
is a broadcast dim, and the plan has no Exchange at all.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from geospatial_store_siting_spark.operators import pip  # noqa: E402
from geospatial_store_siting_spark.session import get_spark  # noqa: E402
from geospatial_store_siting_spark.sources import tables  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repl = int(os.environ.get("PIP_SCALE_REPL", "256"))  # ~3.8M points at sf0.1
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="pip-scale", cores=cores, shuffle_partitions=64)

    tables.load_all(spark, sf_dir)
    big_path = os.path.join(REPO, ".snapshots", f"pip_scale_sites_x{repl}")
    if not os.path.exists(os.path.join(big_path, "_SUCCESS")):
        reps = spark.range(repl).select(F.col("id").alias("rep"))
        (
            spark.table("sites")
            .select("site_id", "lat", "lon", "h3_res8")
            .crossJoin(reps)
            .withColumn("site_id", F.col("site_id") * repl + F.col("rep"))
            .drop("rep")
            .repartition(64)
            .write.mode("overwrite")
            .parquet(big_path)
        )
    pts = spark.read.parquet(big_path)
    n_pts = pts.count()

    def run(fn):
        fn().write.mode("overwrite").format("noop").save()  # warm
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            d = time.perf_counter() - t0
            best = d if best is None else min(best, d)
        return best

    t_cover = run(lambda: pip.pip_cover_join(spark, points=pts))
    t_hybrid = run(lambda: pip.pip_join_hybrid(spark, points=pts))
    t_kernel = run(
        lambda: pip.pip_join(spark, points=pts).select("site_id", "poly_id", "poly_zone")
    )

    # --- big-layer regime: a polygon layer too big to broadcast.  The
    # synthetic 30-zone layer replicated POLY_REPL× with shifted longitudes
    # (new geography, constant density), points shifted identically — the
    # regime pip_cover_join_distributed exists for: distributed polyfill +
    # SHUFFLE_HASH cover join, no driver geometry, no broadcast.
    poly_repl = int(os.environ.get("PIP_SCALE_POLY_REPL", "512"))
    base_polys = pip.synthetic_polygons()
    big_layer = [
        dict(p, poly_id=p["poly_id"] + 100 * k,
             verts=[(la, lo + 0.7 * k) for la, lo in p["verts"]])
        for k in range(poly_repl)
        for p in base_polys
    ]
    layer_df = pip.polygons_df(spark, big_layer).repartition(64)
    big_pts = (
        pts.withColumn("shift", F.pmod(F.col("site_id"), F.lit(poly_repl)))
        .withColumn("lon", F.col("lon") + F.col("shift") * F.lit(0.7))
        .drop("shift")
    )
    from geospatial_store_siting_spark.operators.knn import _with_coarse_qr  # noqa: E402
    from geospatial_store_siting_spark.operators.rings import neighbor_cell_col  # noqa: E402

    big_pts = _with_coarse_qr(big_pts.drop("h3_res8"), res=8)
    big_pts = big_pts.withColumn(
        "h3_res8", neighbor_cell_col(F.col("cq"), F.col("cr"), 8)
    ).drop("cq", "cr")
    n_polys = layer_df.count()
    t0 = time.perf_counter()
    pip.pip_cover_join_distributed(spark, points=big_pts, polys=layer_df) \
        .write.mode("overwrite").format("noop").save()
    t_dist = time.perf_counter() - t0

    result = {
        "points": n_pts,
        "cover_join_sec": round(t_cover, 2),
        "cover_join_rows_per_sec": round(n_pts / t_cover, 1),
        "hybrid_join_sec": round(t_hybrid, 2),
        "hybrid_join_rows_per_sec": round(n_pts / t_hybrid, 1),
        "kernel_join_sec": round(t_kernel, 2),
        "kernel_join_rows_per_sec": round(n_pts / t_kernel, 1),
        "speedup": round(t_kernel / t_cover, 2),
        "big_layer": {
            "polygons": n_polys,
            "distributed_join_sec": round(t_dist, 2),
            "distributed_rows_per_sec": round(n_pts / t_dist, 1),
        },
        "cores": cores,
    }
    print(json.dumps(result))

    from _md import replace_section

    replace_section(
        os.path.join(REPO, "BENCH", "BASELINE.md"),
        "\n## PIP at scale",
        (
            f"\n## PIP at scale — cover join vs Python kernel, {n_pts:,} points, "
            f"local[{cores}]\n\n"
            f"| plan | wall | rows/s | note |\n|---|---|---|---|\n"
            f"| JVM broadcast cover join (`pip_cover_join`) | {result['cover_join_sec']} s "
            f"| {result['cover_join_rows_per_sec']:,.0f} | Scan→BroadcastHashJoin→Project, "
            f"zero Exchange, zero Python; boundary ring refined by half-plane SQL |\n"
            f"| hybrid: interior JVM, boundary rim via kernel (`pip_join_hybrid`, "
            f"general polygons) | {result['hybrid_join_sec']} s "
            f"| {result['hybrid_join_rows_per_sec']:,.0f} | only points whose first "
            f"cover candidate is a boundary cell cross into Python (~10% of cover cells) |\n"
            f"| mapInPandas bucketed ray-cast (`pip_join`) | {result['kernel_join_sec']} s "
            f"| {result['kernel_join_rows_per_sec']:,.0f} | every point crosses the "
            f"Arrow boundary into the numpy kernel |\n\n"
            f"**{result['speedup']}×** for keeping PIP membership JVM-side. All three\n"
            f"plans are value-identical (one oracle, `pip_assignments_oracle_sql`).\n"
            f"The cover join is the 100-TB default for convex layers (half-plane\n"
            f"refinement is exact); the hybrid is the default for arbitrary simple\n"
            f"polygons — interior hits stay in codegen, only the rim pays Arrow.\n\n"
            f"**Big-layer regime** ({result['big_layer']['polygons']:,} polygons — the\n"
            f"layer no longer broadcasts): `pip_cover_join_distributed` (distributed\n"
            f"polyfill + SHUFFLE_HASH cover join + boundary-only Arrow refine) assigns\n"
            f"the same {n_pts:,} points in {result['big_layer']['distributed_join_sec']} s\n"
            f"({result['big_layer']['distributed_rows_per_sec']:,.0f} rows/s) with zero\n"
            f"broadcast and zero driver-side geometry — the plan that survives a\n"
            f"census-scale boundary table.\n"
        ),
    )
    spark.stop()


if __name__ == "__main__":
    main()
