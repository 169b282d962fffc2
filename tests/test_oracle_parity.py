"""End-to-end oracle tests: every ``queries()`` entry vs its DuckDB oracle
at sf0.001 — the same compare the driver's correctness gate performs."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from geospatial_store_siting_spark.testing import frames_match
from tests.conftest import SF_DIR

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, geo, duck):
    sdf = QUERIES[name](geo, SF_DIR).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only check
        return
    ddf = duck.execute(ORACLES[name]).df()
    ok, msg = frames_match(sdf, ddf)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(geo):
    df = entry_mod.entry(geo)
    assert df.count() > 0
    assert len(df.schema.fields) > 10
