"""Spatial functions: POINT / point.distance / point.withinbbox (SURVEY §2.9,
§2.11).

Reference: Point2d/Point3d values with WGS84 & cartesian SRIDs
(src/storage/v2/point.hpp); distance/withinbbox predicates power the
point-index scans (ScanAllByPointDistance, operator.hpp:973;
point_distance_condition.hpp). Spark re-expression: a point is a
STRUCT<x DOUBLE, y DOUBLE, srid INT>; distance is a pure column expression
(haversine for WGS84 srid 4326, euclidean for cartesian srid 7203), so
Catalyst pushes bbox predicates into the scan — the R-tree's job is done by
partition pruning on quantized coordinates at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SRID_WGS84 = 4326
SRID_CARTESIAN = 7203
EARTH_RADIUS_M = 6371009.0


def make_point(x: Column, y: Column, srid: int = SRID_CARTESIAN) -> Column:
    return F.struct(x.cast("double").alias("x"), y.cast("double").alias("y"),
                    F.lit(srid).alias("srid"))


def _haversine(a: Column, b: Column) -> Column:
    la1, la2 = F.radians(a["y"]), F.radians(b["y"])
    dlat = F.radians(b["y"] - a["y"]) / 2
    dlon = F.radians(b["x"] - a["x"]) / 2
    h = F.sin(dlat) ** 2 + F.cos(la1) * F.cos(la2) * F.sin(dlon) ** 2
    return 2 * EARTH_RADIUS_M * F.asin(F.sqrt(h))


def _euclidean(a: Column, b: Column) -> Column:
    return F.sqrt((a["x"] - b["x"]) ** 2 + (a["y"] - b["y"]) ** 2)


def point_distance(a: Column, b: Column) -> Column:
    """point.distance: haversine meters for WGS84 points, euclidean for
    cartesian (mirrors the reference's SRID dispatch)."""
    return F.when(a["srid"] == SRID_WGS84, _haversine(a, b)) \
            .otherwise(_euclidean(a, b))


def point_withinbbox(p: Column, lower_left: Column, upper_right: Column) -> Column:
    """point.withinbbox: inclusive containment (ScanAllByPointWithinbbox,
    operator.hpp:997)."""
    return (p["x"].between(lower_left["x"], upper_right["x"])
            & p["y"].between(lower_left["y"], upper_right["y"]))
