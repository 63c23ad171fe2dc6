"""Text/vector/point search tests (SURVEY §2.11)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memgraph_spark.catalog import graph_for
from memgraph_spark.plans import GraphSession
from memgraph_spark.search import (
    bm25_search,
    build_text_index,
    fuzzy_search,
    regex_search,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return graph_for(spark, SF_SMOKE).tables["documents"]


@pytest.fixture(scope="module")
def gs(spark):
    return GraphSession(graph_for(spark, SF_SMOKE))


def test_inverted_index_shape(docs):
    idx = build_text_index(docs)
    assert idx.columns == ["token", "doc_id", "doc_len", "tf"]
    # every (token, doc) pair appears once
    assert idx.groupBy("token", "doc_id").count().filter("count > 1").count() == 0


def test_bm25_relevance(docs):
    top = bm25_search(docs, "vector hash join", k=5).collect()
    assert len(top) == 5
    # scores sorted descending, all positive
    scores = [r.score for r in top]
    assert scores == sorted(scores, reverse=True) and scores[-1] > 0
    # the top hit actually contains at least one query term
    top_doc = docs.filter(F.col("doc_id") == top[0].doc_id).collect()[0]
    assert any(t in top_doc.text for t in ("vector", "hash", "join"))


def test_bm25_prebuilt_index(docs):
    idx = build_text_index(docs).persist()
    a = bm25_search(docs, "stream filter", k=3).collect()
    b = bm25_search(docs, "stream filter", k=3, index=idx).collect()
    assert [(r.doc_id, r.score) for r in a] == [(r.doc_id, r.score) for r in b]
    idx.unpersist()


def test_regex_search(docs):
    hits = regex_search(docs, "vector.*stream")
    direct = docs.filter(F.col("text").rlike("vector.*stream"))
    assert hits.count() == direct.count()


def test_fuzzy_search_tolerates_typo(docs):
    exact = fuzzy_search(docs, "vector", max_edits=0).count()
    fuzzy = fuzzy_search(docs, "vectro", max_edits=2).count()
    assert exact > 0 and fuzzy >= exact


def test_point_distance_cypher(gs):
    # Berlin -> Paris great-circle ≈ 878 km
    r = gs.execute(
        "RETURN round(point.distance("
        "point({longitude: 13.405, latitude: 52.52}), "
        "point({longitude: 2.3522, latitude: 48.8566})) / 1000, 0) AS km"
    ).collect()[0]
    assert 870 <= r.km <= 890


def test_point_cartesian_distance(gs):
    r = gs.execute(
        "RETURN point.distance(point({x: 0, y: 0}), point({x: 3, y: 4})) AS d"
    ).collect()[0]
    assert r.d == 5.0


def test_point_withinbbox(gs):
    rows = gs.execute(
        "UNWIND [[1.0, 1.0], [9.0, 9.0]] AS c "
        "RETURN point.withinbbox(point({x: c[0], y: c[1]}), "
        "point({x: 0.0, y: 0.0}), point({x: 5.0, y: 5.0})) AS inside "
        "ORDER BY inside").collect()
    assert [r.inside for r in rows] == [False, True]


def test_spatial_sql_udf_bitwise_equals_column_build(spark):
    """The SQL-scalar-UDF spatial kernels must produce BITWISE-identical
    doubles/booleans to the Column-op build they replaced (the UDF body is
    a 1:1 transcription that Catalyst inlines). Grid includes identical
    points (the S < 1e-30 branch), poles, antimeridian wrap, 3d srids,
    mismatched srids, and null points."""
    import itertools
    import struct as _struct

    from memgraph_spark.functions import spatial as S

    coords = [(13.4, 52.52), (0.0, 0.0), (179.99, 0.01), (-179.99, -0.01),
              (0.0, 90.0), (1e-15, 1e-15), (123.456789, -67.891)]
    rows, rid = [], 0
    for (x1, y1), (x2, y2) in itertools.product(coords, coords):
        for s1, s2, z1, z2 in [(4326, 4326, None, None),
                               (4979, 4979, 12.5, -3.25),
                               (7203, 7203, None, None),
                               (9157, 9157, 5.5, 2.25),
                               (4326, 7203, None, None)]:
            rows.append((rid, x1, y1, z1, s1, x2, y2, z2, s2))
            rid += 1
    rows.append((rid, None, None, None, None, 1.0, 2.0, None, 4326))
    df = spark.createDataFrame(
        rows, "id long, ax double, ay double, az double, asrid int, "
              "bx double, by double, bz double, bsrid int")

    def mk(px, py, pz, ps):
        return F.struct(F.col(px).alias("x"), F.col(py).alias("y"),
                        F.col(pz).alias("z"),
                        F.col(ps).cast("int").alias("srid"))

    a = F.when(F.col("asrid").isNotNull(), mk("ax", "ay", "az", "asrid"))
    b = mk("bx", "by", "bz", "bsrid")
    assert S._sql_udf_session() is not None  # the UDF path is active
    # separate selects: one projection holding BOTH giant inlined trees
    # trips janino's 64KB method limit into (slow) interpreted fallback
    new = df.select("id", S.point_distance(a, b).alias("d"),
                    S.point_withinbbox(a, b, mk("ax", "ay", "az", "asrid"))
                    .alias("w")).collect()
    old = df.select("id", S._point_distance_cols(a, b).alias("d"),
                    S._point_withinbbox_cols(
                        a, b, mk("ax", "ay", "az", "asrid"))
                    .alias("w")).collect()
    for rn, ro in zip(sorted(new), sorted(old)):
        assert (rn["d"] is None) == (ro["d"] is None)
        if rn["d"] is not None:
            assert _struct.pack("<d", rn["d"]) == _struct.pack("<d", ro["d"])
        assert rn["w"] == ro["w"]
