"""Spatial functions: POINT / point.distance / point.withinbbox (SURVEY §2.9,
§2.11).

Reference: Point2d/Point3d values with four CRSs (src/storage/v2/point.hpp:
WGS84_2d=4326, WGS84_3d=4979, Cartesian_2d=7203, Cartesian_3d=9157);
point() construction rules in awesome_memgraph_functions.cpp `Point`;
distance/withinbbox in point_functions.hpp. Spark re-expression: a point is
a STRUCT<x DOUBLE, y DOUBLE, z DOUBLE, srid INT> (z null for 2d points);
distance and bbox predicates are pure column expressions, so Catalyst pushes
them into the scan — the reference's R-tree point index becomes partition
pruning on quantized coordinates at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SRID_WGS84 = 4326          # 2d (back-compat alias)
SRID_WGS84_3D = 4979
SRID_CARTESIAN = 7203      # 2d (back-compat alias)
SRID_CARTESIAN_3D = 9157
WGS_SRIDS = (SRID_WGS84, SRID_WGS84_3D)
CRS_NAMES = {
    "cartesian": SRID_CARTESIAN, "cartesian-3d": SRID_CARTESIAN_3D,
    "wgs-84": SRID_WGS84, "wgs-84-3d": SRID_WGS84_3D,
}
SRID_TO_CRS = {v: k for k, v in CRS_NAMES.items()}
EARTH_RADIUS_M = 6371009.0


def make_point(x: Column, y: Column, srid: int = SRID_CARTESIAN,
               z: Column | None = None) -> Column:
    return F.struct(
        x.cast("double").alias("x"), y.cast("double").alias("y"),
        (z.cast("double") if z is not None
         else F.lit(None).cast("double")).alias("z"),
        F.lit(srid).alias("srid"))


def is_point_type(t) -> bool:
    from pyspark.sql import types as T
    return isinstance(t, T.StructType) and "srid" in t.names \
        and "x" in t.names


def crs_name(p: Column) -> Column:
    """point.crs accessor string for the srid slot. The -3d names are
    constructor-input aliases only; the accessor prints the base CRS
    ('wgs-84' for srid 4979 — spatial.feature Point3d lookups)."""
    base = {SRID_WGS84: "wgs-84", SRID_WGS84_3D: "wgs-84",
            SRID_CARTESIAN: "cartesian", SRID_CARTESIAN_3D: "cartesian"}
    out = None
    for srid, name in base.items():
        c = F.when(p["srid"] == srid, F.lit(name))
        out = c if out is None else out.when(p["srid"] == srid, F.lit(name))
    return out


WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563


def _hav2d(a: Column, b: Column) -> Column:
    """Geodesic distance on the WGS84 spheroid via Andoyer's closed-form
    approximation — what boost::geometry::distance (the reference's
    Haversine(), point_functions.cpp:26) computes by default."""
    lat1, lon1 = F.radians(a["y"]), F.radians(a["x"])
    lat2, lon2 = F.radians(b["y"]), F.radians(b["x"])
    Fm = (lat1 + lat2) / 2
    G = (lat1 - lat2) / 2
    L = (lon1 - lon2) / 2
    S = F.sin(G) ** 2 * F.cos(L) ** 2 + F.cos(Fm) ** 2 * F.sin(L) ** 2
    C = F.cos(G) ** 2 * F.cos(L) ** 2 + F.sin(Fm) ** 2 * F.sin(L) ** 2
    w = F.atan(F.sqrt(S / C))
    R = F.sqrt(S * C) / w
    D = 2 * w * WGS84_A
    H1 = (3 * R - 1) / (2 * C)
    H2 = (3 * R + 1) / (2 * S)
    full = D * (1 + WGS84_F * (H1 * F.sin(Fm) ** 2 * F.cos(G) ** 2
                               - H2 * F.cos(Fm) ** 2 * F.sin(G) ** 2))
    return F.when(S < 1e-30, F.lit(0.0)).otherwise(full)


def _euclid2d(a: Column, b: Column) -> Column:
    return F.sqrt((a["x"] - b["x"]) ** 2 + (a["y"] - b["y"]) ** 2)


def _euclid3d(a: Column, b: Column) -> Column:
    return F.sqrt((a["x"] - b["x"]) ** 2 + (a["y"] - b["y"]) ** 2
                  + (a["z"] - b["z"]) ** 2)


def point_distance(a: Column, b: Column) -> Column:
    """point.distance: haversine meters for WGS84 (3d adds the height delta
    in quadrature), euclidean for cartesian. Mismatched CRSs yield null
    (point_functions.hpp Distance: requires identical CRS)."""
    same = a["srid"] == b["srid"]
    d = (F.when(same & (a["srid"] == SRID_WGS84), _hav2d(a, b))
         .when(same & (a["srid"] == SRID_WGS84_3D),
               F.sqrt(_hav2d(a, b) ** 2 + (a["z"] - b["z"]) ** 2))
         .when(same & (a["srid"] == SRID_CARTESIAN), _euclid2d(a, b))
         .when(same & (a["srid"] == SRID_CARTESIAN_3D), _euclid3d(a, b)))
    return F.when(a.isNull() | b.isNull(), F.lit(None).cast("double")) \
            .otherwise(d)


def point_withinbbox(p: Column, lower_left: Column,
                     upper_right: Column) -> Column:
    """point.withinbbox: inclusive containment. For WGS84, a lower-left
    longitude greater than the upper-right wraps the box across the
    antimeridian (point_functions.hpp WithinBBox); latitude never wraps."""
    wgs = p["srid"].isin(*WGS_SRIDS)
    lon_plain = p["x"].between(lower_left["x"], upper_right["x"])
    lon_wrap = (p["x"] >= lower_left["x"]) | (p["x"] <= upper_right["x"])
    x_ok = F.when(wgs & (lower_left["x"] > upper_right["x"]), lon_wrap) \
            .otherwise(lon_plain)
    y_ok = p["y"].between(lower_left["y"], upper_right["y"])
    z_ok = F.when(p["srid"].isin(SRID_WGS84_3D, SRID_CARTESIAN_3D),
                  p["z"].between(lower_left["z"], upper_right["z"])) \
            .otherwise(F.lit(True))
    same = (p["srid"] == lower_left["srid"]) & (p["srid"] == upper_right["srid"])
    nul = p.isNull() | lower_left.isNull() | upper_right.isNull()
    return F.when(nul, F.lit(None).cast("boolean")) \
            .when(~same, F.lit(None).cast("boolean")) \
            .otherwise(x_ok & y_ok & z_ok)
