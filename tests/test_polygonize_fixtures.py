"""Golden fixture tests for the local polygonize kernel — every exact
assertion from the reference suite (FIXTURES.md §2; reference
src/polygonizer_tests.rs, tests/integration_tests.rs, tests/robustness.rs)."""

import numpy as np
import pytest

from geo_polygonize_spark.kernels.polygonize import polygonize_lines
from geo_polygonize_spark.sources.fixtures import fixture, grid_lines


def run(name, drop_collapsed=False):
    xs, ys, node, snap = fixture(name)
    return polygonize_lines(
        xs, ys, node_input=node, snap_grid=snap, drop_collapsed=drop_collapsed
    )


def areas(polys):
    return sorted(p.area for p in polys)


def test_triangle_open_segments():
    # polygonizer_tests.rs:8-18 — area in (49, 51)
    polys = run("triangle_open_segments")
    assert len(polys) >= 1
    assert any(49 < p.area < 51 for p in polys)


def test_square_with_inner_square():
    # polygonizer_tests.rs:21-42 — donut 64 with 1 hole + island 36
    polys = run("square_with_inner_square")
    assert len(polys) == 2
    donut = next(p for p in polys if abs(p.area - 64.0) < 1e-6)
    island = next(p for p in polys if abs(p.area - 36.0) < 1e-6)
    assert len(donut.holes) == 1
    assert len(island.holes) == 0


def test_frame_with_diagonals():
    # polygonizer_tests.rs:45-80 — 5 polys; 4 triangles of area 25;
    # the 5th is the frame: net area 0 with 4 triangle holes
    # (requires keep-collapsed semantics; see rings.assemble_polygons)
    polys = run("frame_with_diagonals")
    assert len(polys) == 5
    triangles = [p for p in polys if abs(p.area - 25.0) < 1e-6]
    assert len(triangles) == 4
    frame = next(p for p in polys if abs(p.area) < 1e-6)
    assert len(frame.holes) == 4


def test_collinear_overlap():
    # polygonizer_tests.rs:83-115 — contains rectangle area 50
    polys = run("collinear_overlap")
    assert any(abs(p.area - 50.0) < 1e-6 for p in polys)


def test_nested_holes():
    # integration_tests.rs:7-42 — exactly 3: 6400, 3200, 400
    polys = run("nested_holes")
    assert len(polys) == 3
    got = areas(polys)
    assert got == pytest.approx([400.0, 3200.0, 6400.0], abs=1e-6)


def test_touching_squares():
    # integration_tests.rs:45-71 — ≥2 polys; exactly 2 of area 2500;
    # golden examples/output/touching_polys.geojson has 3 features
    # (the net-0 hull with 2 square holes is kept)
    polys = run("touching_squares")
    assert len(polys) == 3
    assert sum(1 for p in polys if abs(p.area - 2500.0) < 1e-6) == 2


def test_square_with_tail_dangle():
    # integration_tests.rs:74-89 — exactly 1 poly area 100 (dangle removed)
    polys = run("square_with_tail_dangle")
    assert len(polys) == 1
    assert polys[0].area == pytest.approx(100.0, abs=1e-6)


def test_bowtie():
    # integration_tests.rs:92-113 — 2 triangles of area 25
    polys = run("bowtie")
    assert len(polys) >= 2
    assert sum(1 for p in polys if abs(p.area - 25.0) < 1e-6) == 2


def test_bowtie_snap1e6():
    # robustness.rs:6-30 — exactly 2 polys. This assertion encodes the
    # reference's shipped collapsed-polygon filter (the hull net-0 poly
    # is dropped) — drop_collapsed=True reproduces it. The unfiltered
    # default yields 3 (matching complex_bowtie's golden for the same
    # topology).
    assert len(run("bowtie_snap1e6", drop_collapsed=True)) == 2
    assert len(run("bowtie_snap1e6")) == 3


def test_duplicate_edge():
    # robustness.rs:33-62 — exactly 1 poly (either semantics)
    assert len(run("duplicate_edge")) == 1
    assert len(run("duplicate_edge", drop_collapsed=True)) == 1


def test_overlapping_circles():
    # integration_tests.rs:129-145 — exactly 8 polys
    assert len(run("overlapping_circles")) == 8


def test_curved_holes():
    # integration_tests.rs:148-169 — ≥5 polys (golden: exactly 5)
    polys = run("curved_holes")
    assert len(polys) == 5


def test_complex_bowtie():
    # golden examples/output/complex_bowtie.geojson — 3 polys
    assert len(run("complex_bowtie")) == 3


@pytest.mark.parametrize("n,expected", [(5, 25), (10, 100), (20, 400)])
def test_grid_counts(n, expected):
    # benches/polygonize_bench.rs:7-22 — grid N → N² unit polygons
    xs, ys = grid_lines(n)
    # GEOS-comparable faces-only counts (python_bench_output.txt) need
    # the collapsed filter: the outer hull (net 0 after hole
    # assignment) is excluded, leaving the N² unit cells.
    polys = polygonize_lines(xs, ys, node_input=True, drop_collapsed=True)
    assert len(polys) == expected
    assert all(abs(p.area - 1.0) < 1e-9 for p in polys)
