"""Hotspot layer tests: Gi* numpy exactness + crafted cluster fixture."""

from __future__ import annotations

import numpy as np
import pandas as pd

from geospatial_store_siting_spark.config import (
    AXIS_OFFSET,
    AXIS_SHIFT,
    RES_CODE_SHIFT,
)
from geospatial_store_siting_spark.functions import hex_sql
from geospatial_store_siting_spark.operators import hotspots


def _cell(q: int, r: int, res: int = 8) -> int:
    return (res - 6) * RES_CODE_SHIFT + (q + AXIS_OFFSET) * AXIS_SHIFT + (r + AXIS_OFFSET)


class TestHotspotGi:
    def test_numpy_recomputation(self, geo):
        """Gi* z-scores match an independent numpy recomputation of the
        textbook formula (binary weights, k=1 disk incl. center) on the
        same grid: exact BIGINT neighborhood sums, z within one floor-
        rounding step, tier consistent with the rounded z."""
        grid = geo.sql(
            "SELECT cell_id, q, r, CAST(population AS BIGINT) AS pop FROM hex_grid"
        ).toPandas()
        out = hotspots.hotspot_gi(geo).toPandas().set_index("cell_id")
        assert len(out) == len(grid)

        pop = dict(zip(grid["cell_id"], grid["pop"]))
        by_qr = {(q, r): c for c, q, r in zip(grid["cell_id"], grid["q"], grid["r"])}
        n = len(grid)
        sx = int(grid["pop"].sum())
        sxx = int((grid["pop"].astype(object) ** 2).sum())
        xbar = sx / n
        s = np.sqrt(sxx / n - xbar * xbar)

        offs = hex_sql.ring_offsets(1)
        rng = np.random.default_rng(7)
        sample = rng.choice(len(grid), size=min(300, len(grid)), replace=False)
        for i in sample:
            c, q, r = grid.loc[i, ["cell_id", "q", "r"]]
            nbrs = [by_qr.get((q + dq, r + dr)) for dq, dr in offs]
            present = [x for x in nbrs if x is not None]
            m = len(present)
            wsum = sum(pop[x] for x in present)
            row = out.loc[c]
            assert row["n_present"] == m
            assert row["ring_pop"] == wsum
            z = (wsum - xbar * m) / (s * np.sqrt((n * m - m * m) / (n - 1)))
            zr = np.floor(z * 1e6 + 0.5) / 1e6
            assert abs(row["gi_z"] - zr) <= 1e-6
            # tier is a pure function of the rounded z
            gz = row["gi_z"]
            tier = (
                "hot99" if gz >= 2.576 else "hot95" if gz >= 1.645
                else "cold99" if gz <= -2.576 else "cold95" if gz <= -1.645
                else "ns"
            )
            assert row["tier"] == tier

    def test_tiers_partition(self, geo):
        out = hotspots.hotspot_gi(geo).toPandas()
        assert set(out["tier"]).issubset({"hot99", "hot95", "cold99", "cold95", "ns"})
        # interior cells see the full 7-cell disk at most
        assert out["n_present"].between(1, 7).all()


class TestMoranI:
    def test_numpy_recomputation(self, geo):
        """Per-metro I matches the textbook formula computed directly in
        Python integers (exact num/den, ratio assembled the same way)."""
        grid = geo.sql(
            "SELECT metro, cell_id, q, r, CAST(population AS BIGINT) AS pop FROM hex_grid"
        ).toPandas()
        out = hotspots.moran_i(geo).toPandas().set_index("metro")
        offs = [o for o in hex_sql.ring_offsets(1) if o != (0, 0)]
        for metro, sub in grid.groupby("metro"):
            n = len(sub)
            sx = int(sub["pop"].sum())
            cv = {
                (q, r): n * int(p) - sx
                for q, r, p in sub[["q", "r", "pop"]].itertuples(index=False)
            }
            num = w = 0
            for (q, r), ci in cv.items():
                for dq, dr in offs:
                    cj = cv.get((q + dq, r + dr))
                    if cj is not None:
                        num += ci * cj
                        w += 1
            den = sum(c * c for c in cv.values())
            want = 0.0 if (den == 0 or w == 0) else (n / w) * (num / den)
            wr = np.floor(want * 1e6 + 0.5) / 1e6
            row = out.loc[metro]
            assert row["n_cells"] == n
            assert row["w_pairs"] == w
            assert abs(row["moran_i"] - wr) <= 1e-6
            er = np.floor((-1.0 / (n - 1)) * 1e6 + 0.5) / 1e6
            assert abs(row["expected_i"] - er) <= 1e-6


class TestEmergingHotspots:
    def test_mann_kendall_recomputation(self, geo):
        """S, the pair count, and the tie-corrected continuity-corrected z
        match a from-scratch pandas/numpy recomputation of the space-time
        cube (bins → ring-1 sums → MK over each cell's series)."""
        ev = geo.sql(
            """SELECT s.h3_res8 AS cell_id, s.q, s.r,
                      CAST(FLOOR(unix_timestamp(e.ts) / 86400.0) AS BIGINT) AS day
               FROM events e JOIN sites s ON e.user_id = s.site_id"""
        ).toPandas()
        out = hotspots.emerging_hotspots(geo).toPandas().set_index("cell_id")

        cells = ev[["cell_id", "q", "r"]].drop_duplicates()
        days = sorted(ev["day"].unique())
        t = len(days)
        counts = ev.groupby(["cell_id", "day"]).size().to_dict()
        by_qr = {(q, r): c for c, q, r in cells.itertuples(index=False)}
        offs = hex_sql.ring_offsets(1)

        assert len(out) == len(cells)
        for c, q, r in cells.itertuples(index=False):
            nbrs = [by_qr.get((q + dq, r + dr)) for dq, dr in offs]
            series = [
                sum(counts.get((n, d), 0) for n in nbrs if n is not None)
                for d in days
            ]
            s_mk = sum(
                (series[b] > series[a]) - (series[b] < series[a])
                for a in range(t)
                for b in range(a + 1, t)
            )
            row = out.loc[c]
            assert row["s_mk"] == s_mk
            assert row["n_pairs"] == t * (t - 1) // 2
            g = pd.Series(series).value_counts()
            tie = int((g * (g - 1) * (2 * g + 5)).sum())
            var = (t * (t - 1) * (2 * t + 5) - tie) / 18.0
            if var <= 0 or s_mk == 0:
                z = 0.0
            else:
                z = (s_mk - 1) / np.sqrt(var) if s_mk > 0 else (s_mk + 1) / np.sqrt(var)
            zr = np.floor(z * 1e6 + 0.5) / 1e6
            assert abs(row["z_mk"] - zr) <= 1e-6
            want = (
                "rising" if row["z_mk"] >= 1.645
                else "falling" if row["z_mk"] <= -1.645 else "flat"
            )
            assert row["trend"] == want

    def test_signal_exists(self, geo):
        out = hotspots.emerging_hotspots(geo).toPandas()
        # the MK machinery must actually discriminate: some non-zero S
        assert (out["s_mk"] != 0).any()

    def test_event_corpus_scanned_once(self, geo):
        """Catalyst inlines deterministic CTEs, so the bins/series must be
        materialized: the final MK plan reads only checkpointed frames
        (zero events relations), and the one corpus pass is the binning
        stage (exactly one events relation in its own plan)."""
        final = (
            hotspots.emerging_hotspots(geo)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert final.count("Relation [event_id#") == 0
        bins = (
            geo.sql(
                hotspots._bins_sql(
                    "SELECT site_id, h3_res8, q, r FROM sites", dialect="spark"
                )
            )
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert bins.count("Relation [event_id#") == 1


class TestHotspotGiDocs:
    def test_same_statistic_different_surface(self, geo):
        """The doc-density variant runs the identical Gi* text over span
        counts: schema matches hotspot_gi and the neighborhood sums are
        consistent with the density input."""
        out = hotspots.hotspot_gi_docs(geo).toPandas()
        base = hotspots.hotspot_gi(geo).toPandas()
        assert list(out.columns) == list(base.columns)
        assert (out["ring_pop"] >= 1).all()  # every cell has ≥1 span (its own)
        assert out["n_present"].between(1, 7).all()


class TestHotspotClusters:
    def _grid(self, spark, cells: dict[tuple[int, int], int]):
        rows = [
            (float(_cell(q, r)), int(q), int(r), float(p))
            for (q, r), p in cells.items()
        ]
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["cell_id", "q", "r", "population"])
        )

    def test_l_shape_and_singleton(self, spark):
        """An L-shaped dense blob is ONE cluster labeled by its min cell
        id; an isolated dense cell is a singleton; sub-threshold cells —
        even ones bridging the blob and the singleton — never appear."""
        dense = hotspots.DENSE_POP + 100
        cells = {
            (0, 0): dense,
            (1, 0): dense,
            (2, 0): dense,
            (2, 1): dense,  # adjacent to (2,0) via the (0,1) offset
            (10, 10): dense,  # isolated singleton
            (3, 0): hotspots.DENSE_POP - 1,  # sub-threshold: invisible
            (9, 10): hotspots.DENSE_POP - 1,
        }
        out = (
            hotspots.hotspot_clusters(spark, grid_df=self._grid(spark, cells))
            .toPandas()
            .set_index("cell_id")
        )
        blob = [_cell(0, 0), _cell(1, 0), _cell(2, 0), _cell(2, 1)]
        single = _cell(10, 10)
        assert set(out.index) == set(blob) | {single}
        assert (out.loc[blob, "cluster_id"] == min(blob)).all()
        assert (out.loc[blob, "cluster_size"] == 4).all()
        assert out.loc[single, "cluster_id"] == single
        assert out.loc[single, "cluster_size"] == 1

    def test_diagonal_is_not_adjacent(self, spark):
        """(0,0) and (1,1) are hex-distance 2 (the (1,1) offset is not in
        the ring-1 disk) — they must land in different clusters."""
        dense = hotspots.DENSE_POP
        out = (
            hotspots.hotspot_clusters(
                spark, grid_df=self._grid(spark, {(0, 0): dense, (1, 1): dense})
            )
            .toPandas()
            .set_index("cell_id")
        )
        assert out.loc[_cell(0, 0), "cluster_id"] != out.loc[_cell(1, 1), "cluster_id"]
        assert (out["cluster_size"] == 1).all()


class TestIdwSurface:
    def test_numpy_recomputation(self, geo):
        """IDW values match an exact integer recomputation: micros-snapped
        Shepard weights x cents-snapped sales, BIGINT sums, one division,
        floor-round 2 dp — every compared digit is deterministic."""
        from geospatial_store_siting_spark.operators import zonal

        stores = geo.sql(
            "SELECT site_id, q, r, lat, lon, annual_sales FROM sites"
            " WHERE annual_sales IS NOT NULL"
        ).toPandas()
        grid = geo.sql("SELECT cell_id, q, r FROM hex_grid").toPandas()
        out = zonal.idw_sales_surface(geo).toPandas().set_index("cell_id")

        s8 = 0.0045
        sqrt3 = float(hex_sql.SQRT3)
        cent = {
            c: (r * 1.5 * s8, (q + r / 2.0) * sqrt3 * s8)
            for c, q, r in grid.itertuples(index=False)
        }
        acc: dict[int, list[int]] = {}
        offs = hex_sql.ring_offsets(zonal.IDW_RING)
        for s in stores.itertuples(index=False):
            cents_val = int(np.floor(s.annual_sales * 100.0 + 0.5))
            for dq, dr in offs:
                cell = _cell(s.q + dq, s.r + dr)
                if cell not in cent:
                    continue
                la, lo = cent[cell]
                d2 = ((la - s.lat) * 69.0) ** 2 + ((lo - s.lon) * 54.6) ** 2
                w = 1.0 / max(d2, 0.0025)
                wm = int(np.floor(w * 1e6 + 0.5))
                num, den, n = acc.get(cell, (0, 0, 0))
                acc[cell] = (num + wm * cents_val, den + wm, n + 1)

        want = {
            c: (n, np.floor((num / den / 100.0) * 100.0 + 0.5) / 100.0)
            for c, (num, den, n) in acc.items()
            if den > 0
        }
        assert set(out.index) == set(want)
        for c, (n, v) in want.items():
            assert out.loc[c, "n_samples"] == n
            assert abs(out.loc[c, "idw_sales"] - v) <= 0.01


class TestLisaClusters:
    def test_python_integer_recomputation(self, geo):
        """LISA I and the quadrant labels match a direct Python-integer
        recomputation (c_i, ring sums, product/denominator ratio)."""
        from geospatial_store_siting_spark.operators import hotspots as hs

        grid = geo.sql(
            "SELECT cell_id, q, r, CAST(population AS BIGINT) AS pop FROM hex_grid"
        ).toPandas()
        out = hs.lisa_clusters(geo).toPandas().set_index("cell_id")
        n = len(grid)
        sx = int(grid["pop"].sum())
        cv = {
            (q, r): (c, n * int(p) - sx)
            for c, q, r, p in grid.itertuples(index=False)
        }
        den = sum(v * v for _, v in cv.values())
        offs = [o for o in hex_sql.ring_offsets(1) if o != (0, 0)]
        seen = 0
        for (q, r), (c, ci) in cv.items():
            ring = [cv.get((q + dq, r + dr)) for dq, dr in offs]
            ring = [v for v in ring if v is not None]
            if not ring:
                assert c not in out.index
                continue
            seen += 1
            rs = sum(v for _, v in ring)
            want_i = 0.0 if den == 0 else n * ((ci * rs) / den)
            wr = np.floor(want_i * 1e6 + 0.5) / 1e6
            row = out.loc[c]
            assert row["n_ring"] == len(ring)
            assert abs(row["lisa_i"] - wr) <= 1e-6
            quad = (
                "HH" if ci > 0 and rs > 0 else "LL" if ci < 0 and rs < 0
                else "HL" if ci > 0 and rs < 0 else "LH" if ci < 0 and rs > 0
                else "zero"
            )
            assert row["quadrant"] == quad
        assert seen == len(out)
        assert set(out["quadrant"]) <= {"HH", "LL", "HL", "LH", "zero"}

    def test_crafted_quadrants(self, spark):
        """A hand-built lattice with a known high core, low basin, and one
        spatial outlier produces exactly the expected quadrant labels."""
        from geospatial_store_siting_spark.operators import hotspots as hs

        cells = {
            # high cluster: a hex pair surrounded by highs
            (0, 0): 9000, (1, 0): 9000, (0, 1): 9000,
            # low basin, far away, mutually adjacent
            (40, 40): 100, (41, 40): 100, (40, 41): 100,
            # spatial outlier: one high cell inside the low basin
            (41, 41): 9000,
            # a low cell adjacent ONLY to the high outlier (the LH case)
            (42, 41): 100,
        }
        rows = [
            (float(_cell(q, r)), int(q), int(r), float(p))
            for (q, r), p in cells.items()
        ]
        grid = spark.createDataFrame(
            pd.DataFrame(rows, columns=["cell_id", "q", "r", "population"])
        )
        out = hs.lisa_clusters(spark, grid_df=grid).toPandas().set_index("cell_id")
        assert out.loc[_cell(0, 0), "quadrant"] == "HH"
        assert out.loc[_cell(1, 0), "quadrant"] == "HH"
        assert out.loc[_cell(40, 40), "quadrant"] == "LL"
        # the high cell inside the basin is a high-low outlier; its two
        # low basin neighbors stay LL (the basin outweighs the outlier);
        # the low cell adjacent ONLY to the outlier is the LH case
        assert out.loc[_cell(41, 41), "quadrant"] == "HL"
        assert out.loc[_cell(41, 40), "quadrant"] == "LL"
        assert out.loc[_cell(40, 41), "quadrant"] == "LL"
        assert out.loc[_cell(42, 41), "quadrant"] == "LH"


class TestSpaceTimeGi:
    def test_numpy_recomputation_sample(self, geo):
        """Space-time Gi* on sampled bins matches the textbook formula
        over the 7-cell x 3-day neighborhood with dense-cube moments."""
        from geospatial_store_siting_spark.operators import hotspots as hs

        bins = geo.sql(
            hs._bins_sql("SELECT site_id, h3_res8, q, r FROM sites", dialect="spark")
        ).toPandas()
        out = hs.st_gi_bins(geo).toPandas().set_index(["cell_id", "day"])

        cells = bins[["cell_id", "q", "r"]].drop_duplicates()
        days = sorted(bins["day"].unique())
        t = len(days)
        nn = len(cells) * t
        counts = bins.set_index(["cell_id", "day"])["n"].to_dict()
        by_qr = {(q, r): c for c, q, r in cells.itertuples(index=False)}
        sx = int(bins["n"].sum())
        sxx = int((bins["n"].astype(object) ** 2).sum())  # zeros add nothing
        xbar, s = sx / nn, np.sqrt(sxx / nn - (sx / nn) ** 2)
        offs = [
            (dq, dr, dd)
            for dq, dr in hex_sql.ring_offsets(1)
            for dd in (-1, 0, 1)
        ]
        assert len(out) == nn
        rng = np.random.default_rng(11)
        pick = rng.choice(len(cells), size=min(40, len(cells)), replace=False)
        dayset = set(days)
        for i in pick:
            c, q, r = cells.iloc[i]
            for d in (days[0], days[t // 2], days[-1]):
                pres = [
                    (by_qr[(q + dq, r + dr)], d + dd)
                    for dq, dr, dd in offs
                    if (q + dq, r + dr) in by_qr and (d + dd) in dayset
                ]
                m = len(pres)
                wsum = sum(counts.get(p, 0) for p in pres)
                z = (wsum - xbar * m) / (s * np.sqrt((nn * m - m * m) / (nn - 1)))
                zr = np.floor(z * 1e6 + 0.5) / 1e6
                row = out.loc[(c, d)]
                assert row["n_present"] == m
                assert row["nbhd_events"] == wsum
                assert abs(row["gi_z"] - zr) <= 1e-6


class TestMoranBivariate:
    def test_python_integer_recomputation(self, geo):
        """Bivariate I (population x pedestrian traffic) matches the exact
        Python-integer assembly of the same ratio per metro."""
        from geospatial_store_siting_spark.operators import hotspots as hs

        grid = geo.sql(
            "SELECT metro, cell_id, q, r, CAST(population AS BIGINT) AS xv,"
            " CAST(pedestrian_traffic AS BIGINT) AS yv FROM hex_grid"
        ).toPandas()
        out = hs.moran_bivariate(geo).toPandas().set_index("metro")
        offs = [o for o in hex_sql.ring_offsets(1) if o != (0, 0)]
        for metro, sub in grid.groupby("metro"):
            n = len(sub)
            sx, sy = int(sub["xv"].sum()), int(sub["yv"].sum())
            cm = {
                (q, r): (n * int(xv) - sx, n * int(yv) - sy)
                for q, r, xv, yv in sub[["q", "r", "xv", "yv"]].itertuples(index=False)
            }
            num = w = 0
            for (q, r), (cx, _) in cm.items():
                for dq, dr in offs:
                    o = cm.get((q + dq, r + dr))
                    if o is not None:
                        num += cx * o[1]
                        w += 1
            dx = sum(cx * cx for cx, _ in cm.values())
            dy = sum(cy * cy for _, cy in cm.values())
            want = (
                0.0
                if (dx == 0 or dy == 0 or w == 0)
                else (n / w) * (num / np.sqrt(dx * dy))
            )
            wr = np.floor(want * 1e6 + 0.5) / 1e6
            row = out.loc[metro]
            assert row["n_cells"] == n
            assert row["w_pairs"] == w
            assert abs(row["moran_xy"] - wr) <= 1e-6


class TestLocalRegression:
    def test_python_integer_recomputation(self, geo):
        """Per-cell local OLS (slope/intercept over the ring-2 disk)
        matches the closed form assembled from exact Python integers."""
        from geospatial_store_siting_spark.operators import hotspots as hs

        grid = geo.sql(
            "SELECT cell_id, q, r, CAST(population AS BIGINT) AS xv,"
            " CAST(foot_traffic AS BIGINT) AS yv FROM hex_grid"
        ).toPandas()
        out = hs.local_regression(geo).toPandas().set_index("cell_id")
        assert len(out) == len(grid)
        vals = {
            (q, r): (c, int(xv), int(yv))
            for c, q, r, xv, yv in grid.itertuples(index=False)
        }
        offs = hex_sql.ring_offsets(hs._LR_RING)
        rng = np.random.default_rng(3)
        pick = rng.choice(len(grid), size=min(200, len(grid)), replace=False)
        for i in pick:
            c, q, r = grid.loc[i, ["cell_id", "q", "r"]]
            disk = [vals.get((q + dq, r + dr)) for dq, dr in offs]
            disk = [d for d in disk if d is not None]
            m = len(disk)
            sx = sum(x for _, x, _ in disk)
            sy = sum(y for _, _, y in disk)
            sxy = sum(x * y for _, x, y in disk)
            sxx = sum(x * x for _, x, _ in disk)
            det = m * sxx - sx * sx
            slope = 0.0 if det == 0 else (m * sxy - sx * sy) / det
            intercept = (sy - slope * sx) / m
            row = out.loc[c]
            assert row["n_disk"] == m
            assert abs(row["slope"] - np.floor(slope * 1e6 + 0.5) / 1e6) <= 1e-6
            assert (
                abs(row["intercept"] - np.floor(intercept * 1e6 + 0.5) / 1e6)
                <= 1e-6
            )
