"""Byte-string / uniformSample functions + AST cache
(awesome_memgraph_functions.cpp:1085,1514-1567; frontend/stripped.cpp)."""

from memgraph_spark.catalog import graph_for
from memgraph_spark.plans import GraphSession
from memgraph_spark.plans.parser import _parse_cached, parse
from tests.conftest import SF_SMOKE


def _gs(spark):
    return GraphSession(graph_for(spark, SF_SMOKE))


def test_to_byte_string(spark):
    rows = _gs(spark).execute(
        "RETURN toByteString('0xdeadBEEF') AS b, toByteString('0xabc') AS odd"
    ).collect()
    assert rows[0].b == bytearray.fromhex("deadbeef")
    assert rows[0].odd == bytearray.fromhex("0abc")


def test_from_byte_string_roundtrip(spark):
    rows = _gs(spark).execute(
        "RETURN fromByteString(toByteString('0xdeadbeef')) AS s, "
        "fromByteString(toByteString('0xff'), 4) AS padded").collect()
    assert rows[0].s == "0xdeadbeef"
    assert rows[0].padded == "0x000000ff"  # zero-padded to 4 bytes


def test_uniform_sample(spark):
    rows = _gs(spark).execute(
        "RETURN uniformSample([1, 2, 3], 8) AS s, "
        "uniformSample([], 3) AS empty, uniformSample(null, 3) AS n").collect()
    assert len(rows[0].s) == 8 and set(rows[0].s) <= {1, 2, 3}
    assert rows[0].empty is None and rows[0].n is None


def test_ast_cache_hits(spark):
    _parse_cached.cache_clear()
    q = "MATCH (r:Region) RETURN r.name AS name ORDER BY name"
    gs = _gs(spark)
    a1, a2 = parse(q), parse(q)
    assert a1 is a2  # same cached AST object
    assert _parse_cached.cache_info().hits >= 1
    # and a cached AST still compiles correctly on reuse
    assert len(gs.execute(q).collect()) == len(gs.execute(q).collect()) == 5


def test_collections_split(spark):
    r = _gs(spark).execute(
        "RETURN collections.split([1, 2, 0, 3, 0, 4], 0) AS s").collect()
    assert r[0].s == [[1, 2], [3], [4]]


def test_map_flatten(spark):
    r = _gs(spark).execute(
        "RETURN map.flatten(map.from_lists(['a'], "
        "[map.from_lists(['x', 'y'], [1, 2])])) AS m").collect()
    assert r[0].m == {"a.x": 1, "a.y": 2}


def test_temporal_format(spark):
    r = _gs(spark).execute(
        "RETURN temporal.format(datetime('2024-03-05 10:20:30'), "
        "'%Y/%m/%d %H:%M') AS s").collect()
    assert r[0].s == "2024/03/05 10:20"
