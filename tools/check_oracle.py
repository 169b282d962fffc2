"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf=0.01, compares row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted,
floats rounded to 9 significant-ish decimals).

Usage: python tools/check_oracle.py [name ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from geospatial_store_siting_spark.session import get_spark  # noqa: E402
from geospatial_store_siting_spark.sources.tables import BASE_TABLES  # noqa: E402

# One source of truth for the strict (kind-sensitive) compare protocol —
# testing.normalize/value_hash reproduce the driver's gate: a DuckDB
# HUGEINT landing as float64 (un-cast SUM over integers) hashes UNEQUAL
# to Spark's int64 even when every value is integral; int widths (i4 vs
# i8) still compare equal.
from geospatial_store_siting_spark.testing import (  # noqa: E402
    normalize as norm,
    value_hash,
)

SF_DIR = "/root/testdata/sf0.01"


def main(names: list[str]) -> int:
    import os

    # no console progress bars: the \r-rewritten stage lines interleave
    # with (and garble) the one-line-per-query verdict output
    spark = get_spark(
        cores=8, extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    con = duckdb.connect()
    for t in BASE_TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = names or list(qs)
    failures = 0
    for name in names:
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {str(e)[:500]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {str(e)[:500]}")
            failures += 1
            continue
        ok_rows = len(sdf) == len(ddf)
        ok_cols = sorted(sdf.columns) == sorted(ddf.columns)
        if not ok_cols:
            print(f"FAIL {name}: columns spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
            failures += 1
            continue
        ns, nd = norm(sdf), norm(ddf)
        ok_hash = value_hash(ns) == value_hash(nd)
        if ok_rows and ok_hash:
            print(f"OK   {name}: {len(sdf)} rows")
        else:
            failures += 1
            print(f"FAIL {name}: rows {len(sdf)} vs {len(ddf)}, hash_match={ok_hash}")
            if ok_rows:
                diff = (ns != nd) & ~(ns.isna() & nd.isna())
                bad_cols = [c for c in ns.columns if diff[c].any()]
                print(f"  mismatched cols: {bad_cols[:8]}")
                for c in bad_cols[:3]:
                    idx = diff[c].idxmax()
                    print(f"  e.g. {c}[{idx}]: spark={ns[c][idx]!r} duck={nd[c][idx]!r}")
    spark.stop()
    return failures


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
