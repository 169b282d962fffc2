"""Z-order (Morton) data layout: multi-dimensional clustering for scan
pruning — the Iceberg/Delta ``ZORDER BY`` twin for the parquet fallback.

Why this matters at 100 TB: a spatial engine's hottest predicate is a
bbox (`app_heatmap`'s BETWEEN pair, the PIP cover joins, tile reads). A
table laid out by ingest order scatters every bbox across ALL files, so
min/max stats prune nothing and the scan reads the full table. Sorting
by ONE coordinate only prunes that coordinate. Interleaving the bits of
both axial coordinates (the Morton curve) gives every file/row-group a
tight bounding box in BOTH q and r, so a bbox predicate touches
O(area/file_area) row groups instead of all of them — the standard
Iceberg ``sort_order(zorder(lat, lon))`` / Delta ``OPTIMIZE ZORDER BY``
technique, implemented here as a pure-SQL key + ``repartitionByRange``
(a range shuffle on the key, then a per-partition sort: exactly two
passes, no driver involvement, AQE-safe).

The key is portable integer arithmetic (no bit operators — ``&``/``>>``
spellings differ across engines): bit b of x is
``(x % 2^(b+1) − x % 2^b) / 2^b``, so interleaving is a sum of modular
differences scaled by powers of two. Axial coords are offset to
non-negative (``AXIS_OFFSET`` = 2^24) and 25 bits per axis keeps the key
< 2^50, inside float64's exact range — the same packing discipline as
the cell id itself (`config.py`).
"""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import AXIS_OFFSET
from ..functions import hex_sql

ZBITS = 25  # per-axis; q+AXIS_OFFSET < 2^25 by the packing contract


def zkey_sql(q: str, r: str, bits: int = ZBITS) -> str:
    """Morton key of axial coords as a shared Spark/DuckDB SQL text.

    zkey = Σ_b bit_b(q+OFF)·2^(2b+1) + bit_b(r+OFF)·2^(2b) — q in the odd
    bit positions, r in the even ones. Pure integer %, −, ×: exact and
    identical in any engine (all intermediates < 2^53)."""
    qo = f"(CAST({q} AS BIGINT) + {AXIS_OFFSET})"
    ro = f"(CAST({r} AS BIGINT) + {AXIS_OFFSET})"
    terms = []
    for b in range(bits):
        p, p2 = 1 << b, 1 << (b + 1)
        terms.append(f"({qo} % {p2} - {qo} % {p}) * {p2}")
        terms.append(f"({ro} % {p2} - {ro} % {p}) * {p}")
    return "(" + " + ".join(terms) + ")"


def zkey_py(q: int, r: int, bits: int = ZBITS) -> int:
    """Python twin of ``zkey_sql`` (tests recompute with bit ops)."""
    qo, ro = q + AXIS_OFFSET, r + AXIS_OFFSET
    out = 0
    for b in range(bits):
        out |= ((qo >> b) & 1) << (2 * b + 1)
        out |= ((ro >> b) & 1) << (2 * b)
    return out


def _zorder_keys_sql(sites_src: str) -> str:
    return f"""
SELECT site_id, h3_res8 AS cell_id, q, r,
       {zkey_sql("q", "r")} AS zkey
FROM ({sites_src}) __s"""


def zorder_keys(spark: SparkSession) -> DataFrame:
    """(site_id, cell_id, q, r, zkey) — the layout key surface."""
    return spark.sql(_zorder_keys_sql("SELECT site_id, h3_res8, q, r FROM sites"))


def zorder_keys_oracle_sql() -> str:
    return _zorder_keys_sql(hex_sql.sites_sql())


def write_zordered(
    df: DataFrame,
    path: str,
    n_files: int,
    q: str = "q",
    r: str = "r",
    row_group_bytes: int | None = None,
) -> None:
    """Write ``df`` parquet in Z-order: range-shuffle on the Morton key,
    sort within each partition, drop the key. ``repartitionByRange``
    samples the key distribution (no driver collect), so skewed urban
    cores spread across files by data volume, not by key arithmetic —
    the same salting-free skew handling a range shuffle always gives.

    ``row_group_bytes`` caps parquet row-group size so min/max pruning
    granularity is finer than one file (Iceberg's write.parquet
    row-group-size-bytes knob)."""
    keyed = df.withColumn("__zkey", F.expr(zkey_sql(q, r)))
    w = (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
    )
    if row_group_bytes is not None:
        w = w.option("parquet.block.size", str(row_group_bytes))
    w.parquet(path)


def row_groups_touched(
    path: str, q_range: tuple[int, int], r_range: tuple[int, int],
    q: str = "q", r: str = "r",
) -> tuple[int, int]:
    """(matching, total) parquet row groups whose column stats intersect
    the bbox — the exact skip decision a stats-aware reader (Spark
    parquet filter pushdown, Iceberg manifests) makes, counted from file
    metadata only (no data read)."""
    import glob as _glob

    total = touched = 0
    for f in sorted(_glob.glob(f"{path}/*.parquet")):
        meta = pq.ParquetFile(f).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            total += 1
            sq = rg.column(idx[q]).statistics
            sr = rg.column(idx[r]).statistics
            if sq is None or sr is None:
                # stats disabled (or an all-null chunk): a stats-aware
                # reader cannot prune this group, so count it touched
                touched += 1
                continue
            if (
                sq.min <= q_range[1] and sq.max >= q_range[0]
                and sr.min <= r_range[1] and sr.max >= r_range[0]
            ):
                touched += 1
    return touched, total
