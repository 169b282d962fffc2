"""Z-order layout tests: key correctness + measured row-group pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from geospatial_store_siting_spark.sources import layout


class TestZKey:
    def test_sql_matches_python_bitops(self, geo):
        """The portable modular-arithmetic key equals a direct bit
        interleave for every site (the SQL text avoids &/>> only because
        their spellings differ across engines — values must not)."""
        rows = layout.zorder_keys(geo).collect()
        assert len(rows) > 0
        for row in rows:
            assert row["zkey"] == layout.zkey_py(row["q"], row["r"])

    def test_key_preserves_locality_order(self):
        """Sibling property: within an aligned 2x2 block the Morton order
        is (q0,r0),(q0,r1),(q1,r0),(q1,r1) — r owns the low bit."""
        base = layout.zkey_py(10, 20)
        assert layout.zkey_py(10, 21) == base + 1
        assert layout.zkey_py(11, 20) == base + 2
        assert layout.zkey_py(11, 21) == base + 3


class TestZOrderPruning:
    def test_bbox_touches_fewer_row_groups(self, geo, tmp_path):
        """A metro-sized bbox over the Z-ordered layout must touch
        strictly fewer row groups than the same query over a hash-scattered
        layout, and at most half of them — the stats-pruning win the
        layout exists for."""
        sites = geo.table("sites").select("site_id", "q", "r", "metro")
        bounds = (
            sites.filter(F.col("metro") == "Chicago")
            .agg(
                F.min("q").alias("q0"), F.max("q").alias("q1"),
                F.min("r").alias("r0"), F.max("r").alias("r1"),
            )
            .first()
        )
        zpath, rpath = str(tmp_path / "zord"), str(tmp_path / "rand")
        layout.write_zordered(sites, zpath, n_files=16)
        sites.repartition(16, "site_id").write.mode("overwrite").parquet(rpath)

        qr = ((bounds["q0"], bounds["q1"]), (bounds["r0"], bounds["r1"]))
        z_hit, z_tot = layout.row_groups_touched(zpath, *qr)
        r_hit, r_tot = layout.row_groups_touched(rpath, *qr)
        assert z_tot >= 8 and r_tot >= 8
        assert z_hit < r_hit
        assert z_hit <= z_tot // 2
        # the pruned scan still returns every in-bbox row (read-back check)
        got = (
            geo.read.parquet(zpath)
            .filter(
                F.col("q").between(*qr[0]) & F.col("r").between(*qr[1])
            )
            .count()
        )
        want = sites.filter(
            F.col("q").between(*qr[0]) & F.col("r").between(*qr[1])
        ).count()
        assert got == want
