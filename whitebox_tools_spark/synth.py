"""Deterministic synthetic geometry derived from the driver's parquet tables.

The correctness gate compares our Spark pipelines against DuckDB running
oracle SQL over the same parquet files. Geometry therefore has to be
*derivable by identical arithmetic on both engines*:

  - points  <- integer-hash arithmetic on table keys (exact: all intermediate
               integers < 2^53, and both engines evaluate the same IEEE-754
               double expression),
  - polygons <- a fixed seeded set generated here once and embedded into the
               oracle SQL as a VALUES edge list (coords snapped to 1/64 so the
               decimal literals round-trip to the exact same doubles),
  - rasters / zones <- modular arithmetic on keys.

This keeps the oracle fully independent of our Spark code paths while pinning
bit-identical inputs.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from whitebox_tools_spark import geometry as G

WORLD = 1000.0  # world square [0, 1000)^2

# hash-point constants (all products < 2^53 for keys < 2^31)
_AX, _MX = 48271, 1_000_000
_AY, _BY, _MY = 69621, 12345, 1_000_000


# ---------------------------------------------------------------------------
# Points derived from a table key column
# ---------------------------------------------------------------------------
def point_exprs(key):
    """Spark Column expressions (x, y) for a BIGINT key column."""
    from pyspark.sql import functions as F

    x = ((key * F.lit(_AX)) % F.lit(_MX)).cast("double") / F.lit(1000.0)
    y = ((key * F.lit(_AY) + F.lit(_BY)) % F.lit(_MY)).cast("double") / F.lit(1000.0)
    return x, y


def point_sql(key: str) -> tuple[str, str]:
    """DuckDB SQL mirror of point_exprs — identical arithmetic."""
    x = f"(CAST(({key} * {_AX}) % {_MX} AS DOUBLE) / 1000.0)"
    y = f"(CAST(({key} * {_AY} + {_BY}) % {_MY} AS DOUBLE) / 1000.0)"
    return x, y


def point_np(key):
    key = np.asarray(key, dtype=np.int64)
    x = ((key * _AX) % _MX).astype(np.float64) / 1000.0
    y = ((key * _AY + _BY) % _MY).astype(np.float64) / 1000.0
    return x, y


# ---------------------------------------------------------------------------
# Fixed polygon set (seeded; embedded in oracle SQL as VALUES)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class Part:
    xs: tuple  # closed ring: first == last
    ys: tuple
    is_hole: bool


@dataclass(frozen=True)
class Poly:
    poly_id: int
    parts: tuple  # tuple[Part] in part order (later parts win, clip.rs:317-321)

    def bbox(self):
        xs = np.concatenate([np.asarray(p.xs) for p in self.parts])
        ys = np.concatenate([np.asarray(p.ys) for p in self.parts])
        return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())


def _snap(v: np.ndarray) -> np.ndarray:
    """Snap to 1/64 so decimal repr round-trips exactly through SQL."""
    return np.round(np.asarray(v, dtype=np.float64) * 64.0) / 64.0


def _star_ring(rng: np.random.Generator, cx: float, cy: float, rmax: float, nv: int, cw: bool):
    """Simple star-shaped ring around (cx, cy); cw=True gives shapefile shell
    winding (clockwise), cw=False gives hole winding (CCW),
    whitebox-vector/src/shapefile/geometry.rs:307-340."""
    ang = np.sort(rng.uniform(0.0, 2 * np.pi, nv))
    rad = rng.uniform(0.35 * rmax, rmax, nv)
    xs = _snap(cx + rad * np.cos(ang))
    ys = _snap(cy + rad * np.sin(ang))
    # sorted-angle order is CCW; reverse for CW
    if cw:
        xs, ys = xs[::-1], ys[::-1]
    xs = np.append(xs, xs[0])
    ys = np.append(ys, ys[0])
    return xs, ys


def make_polygons(n: int = 24, seed: int = 7) -> list[Poly]:
    """Deterministic polygon set: rectangles, convex/concave star shells,
    a few with holes. Coordinates in [0, WORLD), snapped to 1/64."""
    rng = np.random.default_rng(seed)
    polys: list[Poly] = []
    for pid in range(n):
        kind = pid % 6
        cx, cy = rng.uniform(60.0, WORLD - 60.0, 2)
        if kind == 0:  # rectangle (CW ring)
            w, h = rng.uniform(20.0, 120.0, 2)
            x0, y0 = _snap(cx - w / 2), _snap(cy - h / 2)
            x1, y1 = _snap(cx + w / 2), _snap(cy + h / 2)
            xs = np.array([x0, x0, x1, x1, x0])
            ys = np.array([y0, y1, y1, y0, y0])
            parts = (Part(tuple(xs), tuple(ys), False),)
        elif kind in (1, 2, 3):  # star shell
            nv = int(rng.integers(5, 14))
            xs, ys = _star_ring(rng, cx, cy, rng.uniform(25.0, 90.0), nv, cw=True)
            parts = (Part(tuple(xs), tuple(ys), False),)
        elif kind == 4:  # shell + one hole
            r = rng.uniform(40.0, 90.0)
            xs, ys = _star_ring(rng, cx, cy, r, int(rng.integers(6, 12)), cw=True)
            hx, hy = _star_ring(rng, cx, cy, r * 0.3, int(rng.integers(4, 7)), cw=False)
            parts = (
                Part(tuple(xs), tuple(ys), False),
                Part(tuple(hx), tuple(hy), True),
            )
        else:  # concave-ish: star with spiky radii
            nv = int(rng.integers(8, 16))
            ang = np.sort(rng.uniform(0.0, 2 * np.pi, nv))
            rad = rng.uniform(10.0, 80.0, nv)
            xs = _snap(cx + rad * np.cos(ang))[::-1]
            ys = _snap(cy + rad * np.sin(ang))[::-1]
            xs = np.append(xs, xs[0])
            ys = np.append(ys, ys[0])
            parts = (Part(tuple(xs), tuple(ys), False),)
        # sanity: pin winding convention with the engine's own kernel
        for p in parts:
            assert G.is_hole(p.xs, p.ys) == p.is_hole, f"winding mismatch poly {pid}"
        polys.append(Poly(pid, parts))
    return polys


def polygons_as_parts(polys: list[Poly]):
    """[(poly_id, [(xs, ys, is_hole), ...]), ...] for the numpy kernels."""
    return [
        (p.poly_id, [(np.asarray(pt.xs), np.asarray(pt.ys), pt.is_hole) for pt in p.parts])
        for p in polys
    ]


def edges_sql_values(polys: list[Poly]) -> str:
    """VALUES list of directed edges:
    (poly_id, part_idx, is_hole, x0, y0, x1, y1)."""
    rows = []
    for p in polys:
        for k, part in enumerate(p.parts):
            xs, ys = part.xs, part.ys
            for i in range(len(xs) - 1):
                rows.append(
                    f"({p.poly_id},{k},{str(part.is_hole).lower()},"
                    f"{xs[i]!r},{ys[i]!r},{xs[i + 1]!r},{ys[i + 1]!r})"
                )
    return ",\n".join(rows)


EDGES_SQL_COLS = "t(poly_id, part_idx, is_hole, x0, y0, x1, y1)"


def pip_oracle_sql(points_cte: str, polys: list[Poly]) -> str:
    """Oracle for the even-odd winding PIP with clip.rs part resolution.

    points_cte must define pts(point_id, x, y). Returns (point_id, poly_id)
    pairs. Mirrors poly_ops.rs:41-72 (crossing rules), :33 (odd winding) and
    clip.rs:317-321 (later containing part wins; hole -> dropped).
    """
    return f"""
WITH pts AS ({points_cte}),
edges AS (SELECT * FROM (VALUES
{edges_sql_values(polys)}
) AS {EDGES_SQL_COLS}),
wn AS (
  SELECT p.point_id, e.poly_id, e.part_idx,
         any_value(e.is_hole) AS is_hole,
         SUM(CASE
              WHEN e.y0 <= p.y AND e.y1 > p.y
                   AND ((e.x1-e.x0)*(p.y-e.y0) - (p.x-e.x0)*(e.y1-e.y0)) > 0 THEN 1
              WHEN e.y0 > p.y AND e.y1 <= p.y
                   AND ((e.x1-e.x0)*(p.y-e.y0) - (p.x-e.x0)*(e.y1-e.y0)) < 0 THEN -1
              ELSE 0 END) AS wn
  FROM pts p CROSS JOIN edges e
  GROUP BY p.point_id, e.poly_id, e.part_idx
),
inside_parts AS (
  SELECT point_id, poly_id, part_idx, is_hole
  FROM wn WHERE (wn % 2) <> 0
),
winner AS (
  SELECT point_id, poly_id, arg_max(is_hole, part_idx) AS hole
  FROM inside_parts GROUP BY point_id, poly_id
)
SELECT point_id, CAST(poly_id AS BIGINT) AS poly_id FROM winner WHERE NOT hole
ORDER BY point_id, poly_id
"""
