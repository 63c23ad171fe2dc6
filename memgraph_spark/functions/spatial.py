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


def _point_distance_cols(a: Column, b: Column) -> Column:
    """Column-op construction of point.distance (fallback when no active
    session can host the SQL UDF; the SQL body below mirrors this tree
    op-for-op and tests pin bitwise equality)."""
    same = a["srid"] == b["srid"]
    d = (F.when(same & (a["srid"] == SRID_WGS84), _hav2d(a, b))
         .when(same & (a["srid"] == SRID_WGS84_3D),
               F.sqrt(_hav2d(a, b) ** 2 + (a["z"] - b["z"]) ** 2))
         .when(same & (a["srid"] == SRID_CARTESIAN), _euclid2d(a, b))
         .when(same & (a["srid"] == SRID_CARTESIAN_3D), _euclid3d(a, b)))
    return F.when(a.isNull() | b.isNull(), F.lit(None).cast("double")) \
            .otherwise(d)


def _point_withinbbox_cols(p: Column, lower_left: Column,
                           upper_right: Column) -> Column:
    """Column-op construction of point.withinbbox (see above)."""
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


# --- SQL scalar UDF registration (driver-latency optimization) -----------
#
# Building the Andoyer tree through pyspark Column ops costs one py4j round
# trip PER OPERATOR (~1-4 ms each in this environment; point_distance is
# ~150 ops, so each compile-time use paid seconds of pure driver latency).
# A session-registered SQL scalar UDF (CREATE OR REPLACE TEMPORARY FUNCTION
# ... RETURN <expr>) builds the identical tree JVM-side from ONE parsed SQL
# string, and Catalyst inlines the body at analysis time — the executed
# plan, and therefore the results, are identical to the Column build (the
# SQL text below is a 1:1 transcription; tests/test_search.py pins bitwise
# equality of the two paths over an adversarial point grid).

_POINT_STRUCT = "STRUCT<x: DOUBLE, y: DOUBLE, z: DOUBLE, srid: INT>"


def _hav_sql(a: str, b: str) -> str:
    """SQL text for _hav2d(a, b), mirroring the Column ops exactly
    (power() is what Column.__pow__ emits; D suffixes keep float literals
    DOUBLE — bare 0.0 would parse as DECIMAL)."""
    lat1, lon1 = f"radians({a}.y)", f"radians({a}.x)"
    lat2, lon2 = f"radians({b}.y)", f"radians({b}.x)"
    fm = f"(({lat1} + {lat2}) / 2)"
    g = f"(({lat1} - {lat2}) / 2)"
    ll = f"(({lon1} - {lon2}) / 2)"
    s = (f"((power(sin({g}), 2) * power(cos({ll}), 2)) + "
         f"(power(cos({fm}), 2) * power(sin({ll}), 2)))")
    c = (f"((power(cos({g}), 2) * power(cos({ll}), 2)) + "
         f"(power(sin({fm}), 2) * power(sin({ll}), 2)))")
    w = f"atan(sqrt(({s} / {c})))"
    r = f"(sqrt(({s} * {c})) / {w})"
    d = f"((2 * {w}) * {WGS84_A!r}D)"
    h1 = f"(((3 * {r}) - 1) / (2 * {c}))"
    h2 = f"(((3 * {r}) + 1) / (2 * {s}))"
    full = (f"({d} * (1 + ({WGS84_F!r}D * "
            f"((({h1} * power(sin({fm}), 2)) * power(cos({g}), 2)) - "
            f"(({h2} * power(cos({fm}), 2)) * power(sin({g}), 2))))))")
    return f"CASE WHEN ({s} < 1.0E-30D) THEN 0.0D ELSE {full} END"


def _distance_sql_body() -> str:
    hav = _hav_sql("a", "b")
    e2 = "sqrt((power((a.x - b.x), 2) + power((a.y - b.y), 2)))"
    e3 = ("sqrt(((power((a.x - b.x), 2) + power((a.y - b.y), 2)) + "
          "power((a.z - b.z), 2)))")
    return f"""
CASE WHEN ((a IS NULL) OR (b IS NULL)) THEN CAST(NULL AS DOUBLE)
ELSE CASE
  WHEN ((a.srid = b.srid) AND (a.srid = {SRID_WGS84})) THEN {hav}
  WHEN ((a.srid = b.srid) AND (a.srid = {SRID_WGS84_3D}))
    THEN sqrt((power({hav}, 2) + power((a.z - b.z), 2)))
  WHEN ((a.srid = b.srid) AND (a.srid = {SRID_CARTESIAN})) THEN {e2}
  WHEN ((a.srid = b.srid) AND (a.srid = {SRID_CARTESIAN_3D})) THEN {e3}
END END"""


def _withinbbox_sql_body() -> str:
    wgs = f"(p.srid IN ({SRID_WGS84}, {SRID_WGS84_3D}))"
    x_ok = (f"CASE WHEN ({wgs} AND (ll.x > ur.x)) "
            f"THEN ((p.x >= ll.x) OR (p.x <= ur.x)) "
            f"ELSE (p.x BETWEEN ll.x AND ur.x) END")
    y_ok = "(p.y BETWEEN ll.y AND ur.y)"
    z_ok = (f"CASE WHEN (p.srid IN ({SRID_WGS84_3D}, {SRID_CARTESIAN_3D})) "
            f"THEN (p.z BETWEEN ll.z AND ur.z) ELSE true END")
    same = "((p.srid = ll.srid) AND (p.srid = ur.srid))"
    return f"""
CASE WHEN ((p IS NULL) OR (ll IS NULL) OR (ur IS NULL))
       THEN CAST(NULL AS BOOLEAN)
     WHEN (NOT {same}) THEN CAST(NULL AS BOOLEAN)
     ELSE (({x_ok} AND {y_ok}) AND {z_ok}) END"""


_SQL_UDF_FLAG = "_mg_spatial_sql_udfs"


def _sql_udf_session():
    """Active session with the spatial SQL UDFs registered, else None
    (fall back to the Column build). Registration is once per session
    object; CREATE OR REPLACE makes a re-register harmless."""
    from pyspark.sql import SparkSession
    s = SparkSession.getActiveSession()
    if s is None:
        return None
    state = s.__dict__.get(_SQL_UDF_FLAG)
    if state is None:
        try:
            s.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION mg_point_distance"
                  f"(a {_POINT_STRUCT}, b {_POINT_STRUCT}) RETURNS DOUBLE "
                  f"RETURN {_distance_sql_body()}")
            s.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION mg_point_withinbbox"
                  f"(p {_POINT_STRUCT}, ll {_POINT_STRUCT}, "
                  f"ur {_POINT_STRUCT}) RETURNS BOOLEAN "
                  f"RETURN {_withinbbox_sql_body()}")
            state = True
        except Exception:  # pragma: no cover - SQL UDF unsupported
            state = False
        s.__dict__[_SQL_UDF_FLAG] = state
    return s if state else None


def point_distance(a: Column, b: Column) -> Column:
    """point.distance: haversine meters for WGS84 (3d adds the height delta
    in quadrature), euclidean for cartesian. Mismatched CRSs yield null
    (point_functions.hpp Distance: requires identical CRS)."""
    if _sql_udf_session() is not None:
        return F.call_function("mg_point_distance", a, b)
    return _point_distance_cols(a, b)


def point_withinbbox(p: Column, lower_left: Column,
                     upper_right: Column) -> Column:
    """point.withinbbox: inclusive containment. For WGS84, a lower-left
    longitude greater than the upper-right wraps the box across the
    antimeridian (point_functions.hpp WithinBBox); latitude never wraps."""
    if _sql_udf_session() is not None:
        return F.call_function("mg_point_withinbbox", p, lower_left,
                               upper_right)
    return _point_withinbbox_cols(p, lower_left, upper_right)
