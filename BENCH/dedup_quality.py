"""MinHash LSH width + durable-CC evidence harness.

Measures, at $SPARK_GRAFT_SF_DIR (default sf0.1):
1. LSH candidate-pair counts at the old toy shape (8 seeds / 4 bands of
   2 rows) vs the production shape (64 / 16 bands of 4 rows) — the
   verdict's acceptance evidence that wider bands collapse the
   false-candidate flood the refine join would otherwise pay.
2. Connected-components wall time COLD (cc_* stage dirs removed; edge
   pair stages left warm, so the number isolates the CC loop) vs WARM
   (every per-round label stage committed — the resume path reads them).

Replaces its own section in BENCH/BASELINE.md, preserving any sections
that follow (the dedup_scale.py protocol).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geospatial_store_siting_spark.operators import dedup  # noqa: E402
from geospatial_store_siting_spark.session import get_spark  # noqa: E402
from geospatial_store_siting_spark.sources import snapshots, tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def candidate_pairs(spark, seeds: int, bands: int) -> int:
    """Distinct band-bucket collision pairs at the given LSH shape —
    computed with the operator's own signature/banding code (constants
    monkeypatched), WITHOUT the refine filter."""
    from pyspark.sql import functions as F

    old = dedup.MINHASH_SEEDS, dedup.LSH_BANDS
    dedup.MINHASH_SEEDS, dedup.LSH_BANDS = seeds, bands
    try:
        sig = dedup.minhash_signatures(spark)
        per_band = seeds // bands
        packed = sig.select(
            "doc_id", F.array(*[F.col(f"mh{i}") for i in range(seeds)]).alias("sig")
        )
        band_structs = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        "|",
                        F.transform(
                            F.slice("sig", b * per_band + 1, per_band),
                            lambda x: x.cast("string"),
                        ),
                    ).alias("bucket"),
                )
                for b in range(bands)
            ]
        )
        buckets = packed.select("doc_id", F.explode(band_structs).alias("bb")).select(
            "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
        )
        return (
            buckets.alias("x")
            .join(buckets.alias("y"), ["band", "bucket"])
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .select("x.doc_id", "y.doc_id")
            .distinct()
            .count()
        )
    finally:
        dedup.MINHASH_SEEDS, dedup.LSH_BANDS = old


def main() -> None:
    spark = get_spark(app_name="dedup-quality", cores=CPUS)
    tables.load_all(spark, SF_DIR)
    n_docs = spark.table("documents").count()

    cand_old = candidate_pairs(spark, 8, 4)
    cand_new = candidate_pairs(spark, 64, 16)
    final_pairs = dedup.minhash_lsh_pairs(spark, sf_dir=SF_DIR).count()

    # CC loop: cold (cc stages removed, edge-pair stages warm) vs warm
    sf_tag = os.path.basename(SF_DIR.rstrip("/"))
    # warm the edge-pair stages untimed so cold isolates the CC loop
    dedup.ngram_jaccard_pairs(spark, sf_dir=SF_DIR).count()
    dedup.simhash_pairs(spark, sf_dir=SF_DIR).count()
    for d in glob.glob(os.path.join(snapshots.DEFAULT_ROOT, f"{sf_tag}_cc_*")):
        shutil.rmtree(d, ignore_errors=True)
    t0 = time.perf_counter()
    n_comp = dedup.near_dup_components(spark, sf_dir=SF_DIR).count()
    t_cold = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    dedup.near_dup_components(spark, sf_dir=SF_DIR).count()
    t_warm = round(time.perf_counter() - t0, 2)

    result = {
        "sf_dir": SF_DIR,
        "n_docs": n_docs,
        "candidate_pairs_8x4": cand_old,
        "candidate_pairs_64x16": cand_new,
        "final_pairs_64x16": final_pairs,
        "cc_cold_sec": t_cold,
        "cc_warm_sec": t_warm,
        "cc_rows": n_comp,
    }
    print(json.dumps(result))

    from _md import replace_section

    replace_section(
        os.path.join(REPO, "BENCH", "BASELINE.md"),
        "\n## MinHash LSH width + durable CC",
        (
            f"\n## MinHash LSH width + durable CC — {n_docs} docs at {SF_DIR}, local[{CPUS}]\n\n"
            f"| measure | value |\n|---|---|\n"
            f"| LSH candidate pairs, toy 8 seeds / 4×2-row bands | {cand_old} |\n"
            f"| LSH candidate pairs, production 64 seeds / 16×4-row bands | {cand_new} |\n"
            f"| refine-stage survivors (est_jaccard ≥ 0.5) at 64×16 | {final_pairs} |\n"
            f"| near-dup connected components, COLD CC loop (label stages removed) | {t_cold} s |\n"
            f"| near-dup connected components, WARM (per-round stages committed) | {t_warm} s |\n\n"
            f"The 4-row bands collapse low-similarity collisions "
            f"(P(candidate|s)=1-(1-s^r)^b: s=0.2 goes 0.15 → <0.03) while keeping "
            f"threshold-0.5 recall — the refine join's input shrinks accordingly. "
            f"The CC loop commits every round's label table as a content-keyed "
            f"stage: executor loss/resume replays from committed rounds (tested in "
            f"tests/test_round5_ops.py), and warm re-runs read parquet instead of "
            f"re-propagating.\n"
        ),
    )
    spark.stop()


if __name__ == "__main__":
    main()
