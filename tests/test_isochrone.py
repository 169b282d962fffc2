"""Isochrone invariants: the distributed Bellman-Ford rounds must equal an
independent Python DP recomputation exactly (integer costs), and the plan
must keep the congestion dim broadcast."""

from __future__ import annotations

from geospatial_store_siting_spark.config import (
    AXIS_OFFSET,
    AXIS_SHIFT,
    RES_CODE_SHIFT,
)
from geospatial_store_siting_spark.operators import isochrone


def _cell_id(q: int, r: int, res: int = 8) -> int:
    return (res - 6) * RES_CODE_SHIFT + (q + AXIS_OFFSET) * AXIS_SHIFT + (
        r + AXIS_OFFSET
    )


def test_catchment_matches_python_dp(geo):
    inhabited = {
        (row.q, row.r) for row in geo.table("hex_grid").select("q", "r").collect()
    }
    sites = geo.table("sites").select("site_id", "q", "r").collect()
    hops, budget = isochrone.ISO_HOPS, isochrone.ISO_BUDGET

    def entry_cost(q: int, r: int) -> int:
        base = 1 + _cell_id(q, r) % 5
        return base + (2 if (q, r) in inhabited else 0)

    expected: dict[tuple[int, int], int] = {}
    for s in sites:
        labels = {(s.q, s.r): 0}
        for _ in range(hops):
            new = dict(labels)
            for (q, r), c in labels.items():
                for dq, dr in isochrone.NEIGHBOR_OFFSETS:
                    nq, nr = q + dq, r + dr
                    nc = c + entry_cost(nq, nr)
                    if nc <= budget and nc < new.get((nq, nr), budget + 1):
                        new[(nq, nr)] = nc
            labels = new
        for (q, r), c in labels.items():
            key = (s.site_id, _cell_id(q, r))
            # sites can share a cell id only with themselves; keys are
            # (site, cell) so no cross-site collisions
            expected[key] = min(c, expected.get(key, budget + 1))
    got = {
        (row.site_id, row.cell_id): row.cost_min
        for row in isochrone.catchment_reach(geo).collect()
    }
    assert got == expected


def test_catchment_population_consistent_with_reach(geo):
    reach = isochrone.catchment_reach(geo).collect()
    per_site: dict[int, int] = {}
    for row in reach:
        per_site[row.site_id] = per_site.get(row.site_id, 0) + 1
    rolled = isochrone.catchment_population(geo).collect()
    assert {r.site_id for r in rolled} == set(per_site)
    for r in rolled:
        assert r.n_cells == per_site[r.site_id]
        assert 0 <= r.n_inhabited <= r.n_cells
        # closed-form population is ≥500 per cell
        assert r.catchment_pop >= 500.0 * r.n_cells


def test_greedy_selection_matches_python_greedy(geo):
    """Recompute the greedy maximal-coverage selection in plain Python
    from the (already DP-verified) reach table and require pick-for-pick
    equality, including gains."""
    cand = {
        r.site_id
        for r in geo.table("sites")
        .filter("site_type = 'candidate'")
        .select("site_id")
        .collect()
    }
    reach: dict[int, set[int]] = {}
    for row in isochrone.catchment_reach(geo).collect():
        if row.site_id in cand:
            reach.setdefault(row.site_id, set()).add(row.cell_id)

    def pop(cell: int) -> float:
        return 500.0 + (cell % 9973) % 5000

    covered: set[int] = set()
    expected = []
    for rank in range(1, isochrone.K_SELECT + 1):
        best = min(
            (
                (-sum(pop(c) for c in cells - covered), sid)
                for sid, cells in reach.items()
            ),
        )
        expected.append((rank, best[1], -best[0]))
        covered |= reach[best[1]]
    got = [
        (r.pick_rank, r.site_id, r.gain)
        for r in isochrone.greedy_site_selection(geo)
        .orderBy("pick_rank")
        .collect()
    ]
    assert got == expected
    # marginal gains must be non-increasing (submodularity of coverage)
    gains = [g for _, _, g in got]
    assert gains == sorted(gains, reverse=True)


def test_flat_and_iterative_plans_agree(geo):
    """The one-shuffle flat plan and the per-round min-agg loop are two
    physical strategies for the same operator — identical output."""
    flat = {
        (r.site_id, r.cell_id): r.cost_min
        for r in isochrone.catchment_reach(geo).collect()
    }
    old = isochrone.FLAT_HOPS_LIMIT
    isochrone.FLAT_HOPS_LIMIT = 0  # force the Bellman-Ford loop
    try:
        iterative = {
            (r.site_id, r.cell_id): r.cost_min
            for r in isochrone.catchment_reach(geo).collect()
        }
    finally:
        isochrone.FLAT_HOPS_LIMIT = old
    assert flat == iterative


def test_catchment_plan_keeps_dim_broadcast(geo):
    plan = (
        isochrone.catchment_reach(geo)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # the congestion join must never sort-merge
    assert "SortMergeJoin" not in plan
    # flat plan: the ONLY shuffle is the final (site, cell) min-agg —
    # every expansion round is a map-side generator + broadcast join, and
    # partial aggregation collapses per-site paths before the exchange
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected one shuffle, got {n_exchanges}:\n{plan}"


def test_huff_isochrone_shares_partition_unity(geo):
    """Cost-impedance Huff invariants: per cell the store shares must sum
    to 1e6 within floor loss (< n_stores_reaching micros), and per-store
    demand must equal the Python recomputation from the reach table."""
    stores = geo.table("sites").filter("site_type = 'store'")
    reach = isochrone.catchment_reach(geo, sites_df=stores).collect()
    by_cell = {}
    for r in reach:
        g = int(1_000_000 // (1 + r.cost_min) ** 2)
        by_cell.setdefault(r.cell_id, []).append((r.site_id, g))
    import math

    expected = {}
    for cell, pairs in by_cell.items():
        den = sum(g for _, g in pairs)
        pop = 500 + (cell % 9973) % 5000
        total_share = 0
        for sid, g in pairs:
            share = int(math.floor(g * 1_000_000.0 / den))
            total_share += share
            agg = expected.setdefault(sid, [0, 0, 0])
            agg[0] += 1
            agg[1] += share
            agg[2] += share * pop
        assert 1_000_000 - len(pairs) < total_share <= 1_000_000, cell
    got = {r.site_id: r for r in isochrone.huff_isochrone(geo).collect()}
    assert set(got) == set(expected)
    for sid, (n, s, d) in expected.items():
        r = got[sid]
        assert (r.n_cells, r.sum_share_micros) == (n, s), sid
        assert r.huff_demand == d / 1_000_000.0, sid


def test_recursive_cte_text_runs_on_spark_too(geo):
    """Spark 4 executes the oracle's WITH RECURSIVE text directly — one
    SQL string, three agreeing plans (flat DataFrame, Bellman-Ford loop,
    recursive CTE on either engine)."""
    rec = {
        (r.site_id, r.cell_id): r.cost_min
        for r in geo.sql(isochrone.catchment_reach_oracle_sql()).collect()
    }
    flat = {
        (r.site_id, r.cell_id): r.cost_min
        for r in isochrone.catchment_reach(geo).collect()
    }
    assert rec == flat
