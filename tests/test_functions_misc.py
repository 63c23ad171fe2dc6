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


def test_value_type(spark):
    """valueType (awesome_memgraph_functions.cpp:774): openCypher names."""
    rows = _gs(spark).execute(
        "RETURN valueType(1) AS i, valueType(1.5) AS f, valueType('x') AS s, "
        "valueType(true) AS b, valueType([1]) AS l, valueType(null) AS n"
    ).collect()
    r = rows[0]
    assert (r.i, r.f, r.s, r.b, r.l, r.n) == (
        "INTEGER", "FLOAT", "STRING", "BOOLEAN", "LIST", "NULL")


def test_value_type_graph_entities(spark):
    rows = _gs(spark).execute(
        "MATCH (n:Nation)-[e:IN_REGION]->(m) "
        "RETURN valueType(n) AS vn, valueType(e) AS ve LIMIT 1").collect()
    assert rows[0].vn == "NODE" and rows[0].ve == "RELATIONSHIP"


def test_to_string_or_null(spark):
    rows = _gs(spark).execute(
        "RETURN toStringOrNull(42) AS i, toStringOrNull([1,2]) AS l"
    ).collect()
    assert rows[0].i == "42" and rows[0].l is None


def test_property_size(spark):
    """propertySize (awesome_memgraph_functions.cpp:547): PropertyStore-style
    encoded size — metadata byte + id byte + magnitude-dependent payload."""
    rows = _gs(spark).execute(
        "MATCH (r:Region) WHERE r.key = 0 "
        "RETURN propertySize(r, 'key') AS pk, propertySize(r, 'name') AS pn, "
        "propertySize(r, 'nope') AS absent").collect()
    assert rows[0].pk == 3          # key=0: 1 meta + 1 id + 1 payload
    assert rows[0].pn == len("AFRICA") + 3
    assert rows[0].absent == 0


def test_username_roles(spark):
    rows = _gs(spark).execute(
        "RETURN username() AS u, roles() AS r").collect()
    assert rows[0].u is None and rows[0].r == []


def test_to_enum(spark):
    gs = _gs(spark)
    gs.execute("CREATE ENUM FnStatus VALUES { Good, Bad }")
    rows = gs.execute(
        "RETURN toEnum('FnStatus::Good') AS e1, "
        "toEnum('FnStatus', 'Bad') AS e2").collect()
    # enum values are typed structs since the enum-struct change (they
    # print as Type::Member at the display layer)
    assert rows[0].e1["__value"] == "FnStatus::Good"
    assert rows[0].e2["__value"] == "FnStatus::Bad"
    import pytest as _pytest
    with _pytest.raises(Exception, match="[Ii]nvalid enum"):
        gs.execute("RETURN toEnum('FnStatus::Nope')")
