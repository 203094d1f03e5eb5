"""SVG rendering of polygon coverages — the dev-tooling analog of the
reference's ``scripts/visualize.py`` (matplotlib there; plain-text
SVG here, so it needs no plotting library and works in any container).

``polygons_to_svg`` draws a POLYGON_SCHEMA DataFrame (or pre-collected
rows) as filled paths with even-odd holes; colors are a deterministic
hash of (tile_i, tile_j, poly_id) so re-renders are stable and
adjacent tiles are visually distinct. Driver-side by design: a
rendering is a debugging artifact of a SMALL coverage (the collect is
the point), not a data-path operator.
"""

from __future__ import annotations

import numpy as np


def _color(tile_i: int, tile_j: int, poly_id: int) -> str:
    h = (tile_i * 73856093) ^ (tile_j * 19349663) ^ (poly_id * 83492791)
    h &= 0xFFFFFF
    # keep it light so strokes stay visible
    r = 128 + ((h >> 16) & 0x7F)
    g = 128 + ((h >> 8) & 0x7F)
    b = 128 + (h & 0x7F)
    return f"#{r:02x}{g:02x}{b:02x}"


def _path(shell_xs, shell_ys, hole_xs, hole_ys, sx, sy, ox, oy) -> str:
    def ring(xs, ys):
        pts = [f"{(x - ox) * sx:.2f},{(oy - y) * sy:.2f}" for x, y in zip(xs, ys)]
        return "M" + " L".join(pts) + " Z"

    d = ring(shell_xs, shell_ys)
    for hx, hy in zip(hole_xs or [], hole_ys or []):
        d += " " + ring(hx, hy)
    return d


def polygons_to_svg(
    polygons,
    width: int = 800,
    stroke: str = "#333333",
    stroke_width: float = 0.5,
) -> str:
    """DataFrame (POLYGON_SCHEMA) or iterable of row dicts → SVG text.
    Y is flipped (SVG's y grows downward); viewport fits the coverage
    bbox with a 2% margin."""
    if hasattr(polygons, "collect"):
        rows = [r.asDict() for r in polygons.collect()]
    else:
        rows = [dict(r) for r in polygons]
    if not rows:
        return f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{width}"/>'

    x1 = min(min(r["shell_xs"]) for r in rows)
    x2 = max(max(r["shell_xs"]) for r in rows)
    y1 = min(min(r["shell_ys"]) for r in rows)
    y2 = max(max(r["shell_ys"]) for r in rows)
    span_x = max(x2 - x1, 1e-300)
    span_y = max(y2 - y1, 1e-300)
    m = 0.02 * max(span_x, span_y)
    x1, x2, y1, y2 = x1 - m, x2 + m, y1 - m, y2 + m
    height = int(round(width * (y2 - y1) / (x2 - x1))) or 1
    sx = width / (x2 - x1)
    sy = height / (y2 - y1)

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}">'
    ]
    # big polygons first so small ones stay visible on top
    rows.sort(key=lambda r: -abs(float(r.get("area", 0.0))))
    for r in rows:
        d = _path(
            np.asarray(r["shell_xs"], float),
            np.asarray(r["shell_ys"], float),
            r.get("hole_xs"),
            r.get("hole_ys"),
            sx,
            sy,
            x1,
            y2,
        )
        c = _color(int(r.get("tile_i", 0)), int(r.get("tile_j", 0)), int(r.get("poly_id", 0)))
        parts.append(
            f'<path d="{d}" fill="{c}" fill-rule="evenodd" '
            f'stroke="{stroke}" stroke-width="{stroke_width}"/>'
        )
    parts.append("</svg>")
    return "\n".join(parts)


def write_svg(polygons, path: str, **kwargs) -> None:
    with open(path, "w") as f:
        f.write(polygons_to_svg(polygons, **kwargs))
