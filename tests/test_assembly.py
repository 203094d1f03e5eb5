"""Split per-tile ring assembly (operators/assembly.py): equivalence
with the distributed global assembly on real coverages, plus direct
synthetic-ring probes of the rare protocol paths (deferred on-gridline
visitors, local-shell winner patches, the global-residue fallback
gate)."""

import numpy as np
import pytest
from pyspark.sql import functions as F, types as T

from geo_polygonize_spark.operators.assembly import assemble_rings_split
from geo_polygonize_spark.operators.chain_stitch import chain_stitched_polygonize
from geo_polygonize_spark.operators.polygonize_op import polygonize
from geo_polygonize_spark.operators.stitch import (
    assemble_rings_distributed,
    stitched_polygonize,
)
from geo_polygonize_spark.sources.fixtures import fixture, grid_lines, random_lines

from .conftest import lines_to_df
from .test_stitch import keyset


def canon(rows):
    """Bit-exact polygon set: shell coords + sorted hole coord sets."""
    out = []
    for r in rows:
        holes = sorted(
            (tuple(hx), tuple(hy)) for hx, hy in zip(r["hole_xs"], r["hole_ys"])
        )
        out.append(
            (
                round(r["area"], 9),
                r["n_holes"],
                tuple(r["shell_xs"]),
                tuple(r["shell_ys"]),
                tuple(holes),
            )
        )
    return sorted(out)


RING_FIELDS = (
    "rid long, xs array<double>, ys array<double>, area double, "
    "bx1 double, by1 double, bx2 double, by2 double, cx double, cy double"
)


def ring_row(rid, x1, y1, x2, y2, cw=False, cx=None, cy=None):
    """Closed axis-aligned rectangle ring row. ``cx``/``cy`` override
    the centroid — the assembly trusts ring-stat columns, so synthetic
    centroids let tests steer routing/PIP deterministically (a concave
    ring's true centroid can sit anywhere inside its bbox, including
    inside an unrelated shell — this emulates that without drawing the
    concave geometry)."""
    xs = [x1, x2, x2, x1, x1]
    ys = [y1, y1, y2, y2, y1]
    if cw:
        xs, ys = xs[::-1], ys[::-1]
    area = (x2 - x1) * (y2 - y1) * (-1.0 if cw else 1.0)
    return (
        rid, [float(v) for v in xs], [float(v) for v in ys], float(area),
        float(x1), float(y1), float(x2), float(y2),
        float((x1 + x2) / 2 if cx is None else cx),
        float((y1 + y2) / 2 if cy is None else cy),
    )


class TestSplitEquivalence:
    def test_grid_both_strategies_both_modes(self, spark):
        n = 20
        xs, ys = grid_lines(n)
        df = lines_to_df(spark, xs, ys)
        bbox = (0.0, 0.0, float(n), float(n))
        for dc in (False, True):
            a = canon(
                chain_stitched_polygonize(
                    df, tile_size=5.0, bbox=bbox, drop_collapsed=dc,
                    assembly="distributed",
                ).collect()
            )
            b = canon(
                chain_stitched_polygonize(
                    df, tile_size=5.0, bbox=bbox, drop_collapsed=dc,
                    assembly="split",
                ).collect()
            )
            c = canon(
                stitched_polygonize(
                    df, tile_size=5.0, bbox=bbox, drop_collapsed=dc,
                    assembly="split",
                ).collect()
            )
            assert a == b == c

    def test_random_lines(self, spark):
        xs, ys = random_lines(60)
        df = lines_to_df(spark, xs, ys)
        bbox = (0.0, 0.0, 100.0, 100.0)
        a = canon(
            chain_stitched_polygonize(
                df, tile_size=25.0, buffer=10.0, bbox=bbox,
                drop_collapsed=True, assembly="distributed",
            ).collect()
        )
        b = canon(
            chain_stitched_polygonize(
                df, tile_size=25.0, buffer=10.0, bbox=bbox,
                drop_collapsed=True, assembly="split",
            ).collect()
        )
        assert a == b

    def test_nested_holes_vs_global(self, spark):
        """Cross-tile shells (100/60/20 rings vs tile 10) land in the
        global residue and must still assign their holes exactly."""
        xs, ys, node, snap = fixture("nested_holes")
        df = lines_to_df(spark, xs, ys)
        got = chain_stitched_polygonize(
            df, tile_size=10.0, buffer=2.0, bbox=(0.0, 0.0, 100.0, 100.0),
            assembly="split",
        ).collect()
        want = polygonize(df, node_input=node, snap_grid=snap).collect()
        assert keyset(got) == keyset(want)


class TestAutoStrategy:
    def test_auto_matches_global_both_regimes(self, spark):
        """r5 (VERDICT r4 item 3): strategy='auto' keys on the presplit
        trigger ((l_max/tile)² ≥ 32 → level, else chain) and stays
        exact in both regimes."""
        n = 24
        xs, ys = grid_lines(n)
        df = lines_to_df(spark, xs, ys)
        bb = (0.0, 0.0, float(n), float(n))
        want = keyset(polygonize(df, node_input=True, drop_collapsed=True).collect())
        # tile 8 → (24/8)² = 9 < 32 → chain regime
        a = stitched_polygonize(df, tile_size=8.0, bbox=bb, drop_collapsed=True)
        assert keyset(a.collect()) == want
        # tile 4 → (24/4)² = 36 ≥ 32 → level regime
        b = stitched_polygonize(df, tile_size=4.0, bbox=bb, drop_collapsed=True)
        assert keyset(b.collect()) == want

    def test_explicit_strategies_still_accepted(self, spark):
        xs, ys = grid_lines(8)
        df = lines_to_df(spark, xs, ys)
        bb = (0.0, 0.0, 8.0, 8.0)
        for strat in ("level", "chain", "auto"):
            got = stitched_polygonize(
                df, tile_size=4.0, bbox=bb, drop_collapsed=True, strategy=strat
            ).count()
            assert got == 64
        with pytest.raises(ValueError, match="strategy"):
            stitched_polygonize(df, tile_size=4.0, bbox=bb, strategy="bogus").count()


class TestSplitProtocol:
    """Direct probes of assemble_rings_split over synthetic ring rows —
    the ground truth is assemble_rings_distributed on the SAME rows."""

    def _both(self, spark, rows, ts, drop_collapsed=False):
        rings = spark.createDataFrame(rows, RING_FIELDS).persist()
        split = canon(
            assemble_rings_split(
                rings, 0.0, 0.0, ts, drop_collapsed=drop_collapsed
            ).collect()
        )
        dist = canon(
            assemble_rings_distributed(
                rings, drop_collapsed=drop_collapsed
            ).collect()
        )
        rings.unpersist()
        return split, dist

    def test_deferred_on_gridline_visitor(self, spark):
        """A CW hole straddling the x=10 gridline with centroid exactly
        ON it is routed to both touching tiles and resolved by the
        finish min — winner is the enclosing global shell."""
        rows = [
            ring_row(1, 0, 0, 20, 12),             # global shell (spans tiles)
            ring_row(2, 9, 4, 11, 6, cw=True),     # hole, centroid (10.0, 5.0)
            ring_row(3, 1, 1, 5, 5),               # unrelated local shell
        ]
        assert rows[1][8] == 10.0  # centroid IS on the ts=10 gridline
        split, dist = self._both(spark, rows, 10.0)
        assert split == dist
        by_holes = {r[1]: r for r in split}
        assert by_holes[1][0] == pytest.approx(240.0 - 4.0)  # hole assigned

    def test_local_shell_wins_visitor_hole(self, spark):
        """Concave-emulating case: a global-class CW ring whose centroid
        lies inside a LOCAL shell strictly smaller than the global
        container — the local shell must win and the already-emitted
        per-tile polygon is patched."""
        rows = [
            ring_row(1, 0, 0, 24, 24),                      # global shell, 576
            ring_row(2, 2, 2, 8, 8),                        # local shell, 36
            # CW ring crossing x=10 but with (synthetic, concave-style)
            # centroid (5,5) inside local shell 2
            ring_row(3, 9, 20, 12, 22, cw=True, cx=5.0, cy=5.0),
        ]
        split, dist = self._both(spark, rows, 10.0)
        assert split == dist
        patched = [r for r in split if r[0] == pytest.approx(36.0 - 6.0)]
        assert len(patched) == 1 and patched[0][1] == 1  # shell 2 got it

    def test_promoted_ring_is_also_a_hole(self, spark):
        """A CW ring with no CCW twin is promoted to a shell AND still
        absorbed as a hole by its smallest strictly-larger container
        (how a filled grid's hull nets to zero)."""
        rows = [
            ring_row(1, 0, 0, 30, 30),              # big shell
            ring_row(2, 2, 2, 6, 6, cw=True),       # twinless CW: promoted + hole
        ]
        for dc in (False, True):
            split, dist = self._both(spark, rows, 10.0, drop_collapsed=dc)
            assert split == dist
        split, _ = self._both(spark, rows, 10.0)
        areas = sorted(r[0] for r in split)
        assert areas == [pytest.approx(16.0), pytest.approx(900.0 - 16.0)]

    def test_tile_edge_touching_rings_stay_local(self, spark):
        """Closure-fitting classification: rings whose bbox TOUCHES a
        gridline are still local (the lattice fast path); only true
        crossers go global. Checked indirectly: results exact on an
        aligned grid where every tile-edge cell touches."""
        rows = [ring_row(i * 100 + j, i * 5, j * 5, i * 5 + 5, j * 5 + 5)
                for i in range(4) for j in range(4)]
        rows.append(ring_row(99999, 0, 0, 20, 20, cw=True))  # hull
        split, dist = self._both(spark, rows, 10.0, drop_collapsed=True)
        assert split == dist
        # 16 CCW cells + the promoted hull (CCW cells are shells, not
        # holes — nothing absorbs into the hull in this construction,
        # so its net stays 400 and it survives drop_collapsed)
        assert len(split) == 17

    def test_fallback_gate_delegates_to_distributed(self, spark):
        """Above the global-residue gate the split path must hand the
        WHOLE set to the distributed assembly, losslessly."""
        rows = [
            ring_row(1, 0, 0, 20, 12),
            ring_row(2, 9, 4, 11, 6, cw=True),
        ]
        rings = spark.createDataFrame(rows, RING_FIELDS)
        a = canon(
            assemble_rings_split(
                rings, 0.0, 0.0, 10.0, global_rows_gate=0
            ).collect()
        )
        b = canon(assemble_rings_distributed(rings).collect())
        assert a == b


class TestIdFilter:
    def test_large_list_semi_join_equals_isin(self, spark):
        """_id_filter (r5): above 512 ids the literal isin is replaced
        by a broadcast semi-join — the results must be identical, and
        the small-list path must keep using the literal expression."""
        from geo_polygonize_spark.operators.assembly import _id_filter

        df = spark.range(0, 5000).select(F.col("id").alias("cand_rid"))
        big = [int(v) for v in range(0, 5000, 3)]  # 1667 ids > 512
        small = big[:100]
        got_big = sorted(
            r["cand_rid"] for r in _id_filter(spark, df, "cand_rid", big).collect()
        )
        assert got_big == sorted(set(big))
        got_small = sorted(
            r["cand_rid"]
            for r in _id_filter(spark, df, "cand_rid", small).collect()
        )
        assert got_small == sorted(set(small))
        # ids absent from the frame simply don't match
        got_miss = _id_filter(
            spark, df, "cand_rid", [999999 + i for i in range(600)]
        ).count()
        assert got_miss == 0
