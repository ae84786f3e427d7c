"""Geometry predicates — the Milvus 2.6 GEOMETRY field surface.

Milvus 2.6 adds a GEOMETRY field type (WKT input) with spatial filter
functions (st_within / st_contains / st_dwithin / st_intersects,
milvus.io Geometry docs) backed by an R-tree index. The engine mirrors
the POINT-data subset — the overwhelmingly common case for entity
data — as pure column algebra: WKT parse via regexp, bounding-box and
radius predicates as arithmetic, polygon containment as an UNROLLED
even-odd ray cast over the query polygon's literal vertices (a filter
polygon is query-side data, so its edges compile into the plan the
same way a literal IN-list does).

Everything is engine-portable double arithmetic (no GIS library), so a
DuckDB oracle reproduces each predicate bit-for-bit. At 100 TB each
predicate is a scan-level filter (pushdown-eligible once the x/y pair
is materialized as columns — the parquet zone-map analog of the
R-tree); the polygon cast is O(vertices) per row inside whole-stage
codegen.

Production swap: great-circle metrics (haversine) and arbitrary
geometry types plug in behind the same call sites; the predicates here
use planar coordinates, which is also what Milvus' R-tree filters
before exact refinement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_WKT_POINT_RE = r"POINT\s*\(\s*(-?\d+(?:\.\d+)?)\s+(-?\d+(?:\.\d+)?)\s*\)"


def wkt_point(x: Column, y: Column) -> Column:
    """Render a POINT WKT string (the Milvus insert format)."""
    return F.concat(
        F.lit("POINT ("),
        x.cast("string"),
        F.lit(" "),
        y.cast("string"),
        F.lit(")"),
    )


def parse_wkt_point_x(wkt: Column) -> Column:
    return F.regexp_extract(wkt, _WKT_POINT_RE, 1).cast("double")


def parse_wkt_point_y(wkt: Column) -> Column:
    return F.regexp_extract(wkt, _WKT_POINT_RE, 2).cast("double")


def st_within_bbox(
    x: Column, y: Column, xmin: float, ymin: float, xmax: float, ymax: float
) -> Column:
    """Point within an axis-aligned box (closed bounds)."""
    return (x >= xmin) & (x <= xmax) & (y >= ymin) & (y <= ymax)


def st_dwithin(x: Column, y: Column, cx: float, cy: float, radius: float) -> Column:
    """Point within ``radius`` of (cx, cy) — squared-distance compare,
    no sqrt, closed bound."""
    dx, dy = x - F.lit(cx), y - F.lit(cy)
    return (dx * dx + dy * dy) <= F.lit(radius * radius)


def st_contains_polygon(
    x: Column, y: Column, vertices: list[tuple[float, float]]
) -> Column:
    """Even-odd ray cast: point strictly inside the polygon given by
    ``vertices`` (closed implicitly). Unrolled — one crossing term per
    edge, XOR-folded; boundary points follow the standard half-open
    edge rule, so shared edges never double-count.
    """
    if len(vertices) < 3:
        raise ValueError("polygon needs at least 3 vertices")
    inside: Column | None = None
    n = len(vertices)
    for i in range(n):
        x1, y1 = vertices[i]
        x2, y2 = vertices[(i + 1) % n]
        if y1 == y2:
            continue  # horizontal edge: never crossed by a horizontal ray
        crosses = ((F.lit(y1) > y) != (F.lit(y2) > y)) & (
            x
            < (F.lit(x2) - F.lit(x1)) * (y - F.lit(y1)) / (F.lit(y2) - F.lit(y1))
            + F.lit(x1)
        )
        # boolean XOR: `^` maps to integral bitwiseXOR in Spark, so fold with !=
        inside = crosses if inside is None else inside != crosses
    assert inside is not None
    return inside


def sql_contains_polygon(
    x: str, y: str, vertices: list[tuple[float, float]]
) -> str:
    """DuckDB expression mirroring :func:`st_contains_polygon`."""
    terms = []
    n = len(vertices)
    for i in range(n):
        x1, y1 = vertices[i]
        x2, y2 = vertices[(i + 1) % n]
        if y1 == y2:
            continue
        terms.append(
            f"((({y1} > {y}) != ({y2} > {y})) AND "
            f"({x} < ({x2} - {x1}) * ({y} - {y1}) / ({y2} - {y1}) + {x1}))"
        )
    return "(" + " != ".join(f"({t})" for t in terms) + ")"
