"""Round-3 semantic pins: per-value numeric typing (numeric variant
properties — functions.feature Abs test 03) and MERGE pull-visibility
interleaving (merge.feature issue #1333)."""

import pytest

from memgraph_spark.catalog import PropertyGraph
from memgraph_spark.plans import GraphSession


@pytest.fixture()
def gs(spark):
    return GraphSession(PropertyGraph(spark, nodes={}, edges={}))


@pytest.fixture()
def mixed(gs):
    gs.execute("CREATE (a{x: 1}), (c{x: -12}), (d{x: null}), "
               "(e{x: -2.3}), (f{x: 1.9})").collect()
    return gs


def _variant(v):
    """Unwrap a collected variant Row into its python value."""
    if v is None:
        return None
    d = v.asDict()
    for slot in ("vb", "vi", "vd", "vs"):
        if d.get(slot) is not None:
            return d[slot]
    return d.get("va") if d.get("va") is not None else d.get("vj")


def test_abs_keeps_int(mixed):
    vals = sorted(
        (_variant(r[0]) for r in mixed.execute(
            "MATCH (a) RETURN abs(a.x) AS n").collect()
         if r[0] is not None),
        key=lambda x: (isinstance(x, float), x))
    assert vals == [1, 12, 1.9, 2.3]
    assert [type(v) for v in vals] == [int, int, float, float]


def test_variant_arith_per_row_type(mixed):
    vals = {_variant(r[0]) for r in mixed.execute(
        "MATCH (a) WHERE a.x IS NOT NULL RETURN a.x * 2 AS n").collect()}
    assert vals == {2, -24, -4.6, 3.8}
    ints = [v for v in vals if isinstance(v, int)]
    assert sorted(ints) == [-24, 2]


def test_variant_sum_promotes_to_float(mixed):
    [(s,)] = mixed.execute("MATCH (a) RETURN sum(a.x) AS s").collect()
    v = _variant(s)
    assert isinstance(v, float) and abs(v - (-11.4)) < 1e-9


def test_variant_sum_all_ints_stays_int(gs):
    gs.execute("CREATE ({x: 1}), ({x: 7}), ({x: null})").collect()
    [(s,)] = gs.execute("MATCH (a) RETURN sum(a.x) AS s").collect()
    # ints only -> long sum (no variant conflict arises at all)
    assert s == 8


def test_variant_min_max_return_element(mixed):
    [(lo, hi)] = mixed.execute(
        "MATCH (a) RETURN min(a.x) AS lo, max(a.x) AS hi").collect()
    assert _variant(lo) == -12 and isinstance(_variant(lo), int)
    assert _variant(hi) == 1.9 and isinstance(_variant(hi), float)


def test_variant_agg_mixed_nonnumeric_raises(gs):
    gs.execute("CREATE ({x: 1}), ({x: 'x'})").collect()
    with pytest.raises(Exception):
        gs.execute("MATCH (a) RETURN sum(a.x) AS s").collect()
    with pytest.raises(Exception):
        gs.execute("MATCH (a) RETURN min(a.x) AS s").collect()


def test_variant_string_concat_plus(gs):
    gs.execute("CREATE ({x: 1}), ({x: 'a'}), ({x: 2.5})").collect()
    vals = {_variant(r[0]) for r in gs.execute(
        "MATCH (n) RETURN n.x + 1 AS v").collect()}
    # TypedValue operator+: string operand concatenates, numerics add
    assert vals == {2, "a1", 3.5}


def test_merge_interleaved_create_visibility(gs):
    # issue #1333 (merge.feature): MERGE re-scans per pulled row, so the
    # second outer row's inner MERGE sees the first row's CREATEs
    gs.execute("CREATE (), ()").collect()
    gs.execute("MERGE (n0) MERGE (n1) CREATE (c0)").collect()
    [(c,)] = gs.execute("MATCH (n) RETURN count(n) AS c").collect()
    assert c == 8


def test_merge_batch_path_unaffected(gs):
    # constrained MERGE keeps the distributed batch path: per-key merge
    # over UNWIND stays one batch (no interleave trigger), result exact
    gs.execute("UNWIND range(1, 5) AS i MERGE (n:K {id: i})").collect()
    gs.execute("UNWIND range(1, 5) AS i MERGE (n:K {id: i})").collect()
    [(c,)] = gs.execute("MATCH (n:K) RETURN count(n) AS c").collect()
    assert c == 5


def test_string_op_null_short_circuits_type_error(gs):
    gs.execute("CREATE ({name: 1}), ({name: 2}), ({name: null})").collect()
    assert gs.execute("MATCH (n) WHERE n.name STARTS WITH null "
                      "RETURN n.name").collect() == []


def test_keys_map_literal_keeps_null_entries(gs):
    [(ks,)] = gs.execute(
        "RETURN KEYS({true: 123, a: null, b: 'x', null: null}) AS a"
    ).collect()
    assert list(ks) == ["true", "a", "b", "null"]


def test_unbounded_expansion_reaches_depth_21(gs):
    gs.execute(
        "CREATE (a {prop: 'start'}), (b {prop: 'end'}) WITH * "
        "UNWIND range(1, 20) AS i CREATE (n {prop: i}) "
        "WITH [a] + collect(n) + [b] AS nodeList "
        "UNWIND range(0, size(nodeList) - 2, 1) AS i "
        "WITH nodeList[i] AS n1, nodeList[i+1] AS n2 "
        "CREATE (n1)-[:T]->(n2)").collect()
    rows = gs.execute("MATCH (n {prop: 'start'})-[:T*]->"
                      "(m {prop: 'end'}) RETURN m").collect()
    assert len(rows) == 1


def test_bound_edge_list_var_length(gs):
    gs.execute("CREATE (a:A), (b:B), (c:C) "
               "CREATE (a)-[:Y]->(b), (b)-[:Y]->(c)").collect()
    rows = gs.execute(
        "MATCH ()-[r1]->()-[r2]->() WITH [r1, r2] AS rs LIMIT 1 "
        "MATCH (first)-[rs*]->(second) "
        "RETURN labels(first) AS f, labels(second) AS s").collect()
    assert [tuple(r) for r in rows] == [(["A"], ["C"])]


def test_scan_union_conflicting_prop_types(gs):
    gs.execute("CREATE (:TextNode {id: 'text'}), (:IntNode {id: 0})"
               ).collect()
    rows = gs.execute("MATCH (i) WHERE exists(i.id) OR i.id > 'te' "
                      "RETURN labels(i) AS l").collect()
    assert sorted(r[0] for r in rows) == [["IntNode"], ["TextNode"]]


def test_mixed_numeric_edge_weights(gs):
    gs.execute("CREATE (n:One), (o:Two), (m:Three), "
               "(n)-[:TYPE {cost: 0.3}]->(o), (o)-[:TYPE {cost: 40}]->(m),"
               " (o)-[:TYPE {cost: 20}]->(m)").collect()
    [(w,)] = gs.execute(
        "MATCH p=(h:One)-[r*allshortest ..5 (e, v | e.cost) total_cost]->"
        "(k:Three) RETURN total_cost").collect()
    assert abs(w - 20.3) < 1e-9


def test_nested_pattern_comprehension_triple(gs):
    gs.execute(
        "CREATE (a:A {id: 1})<-[:R1]-(:B)<-[:R2]-(:C)<-[:R3]-"
        "(:D {id: 1})").collect()
    rows = gs.execute(
        "MATCH (a:A) WHERE single(b IN [(a)<-[:R1]-(b:B) WHERE "
        "single(c IN [(b)<-[:R2]-(c:C) WHERE single(d IN "
        "[(c)<-[:R3]-(d:D) WHERE d.id = 1 | 1] WHERE true) | 1] "
        "WHERE true) | 1] WHERE true) RETURN a.id AS id").collect()
    assert [tuple(r) for r in rows] == [(1,)]


def test_keys_on_map_value(gs):
    s = gs
    out = s.execute("WITH {a: 1, b: 2} AS m RETURN keys(m) AS k").collect()
    assert sorted(out[0]["k"]) == ["a", "b"]


def test_regex_null_pattern_is_null(gs):
    s = gs
    row = s.execute("RETURN 'None' =~ null AS a, 'x' =~ null AS b").first()
    assert row["a"] is None and row["b"] is None


def test_optional_match_startnode_is_node(gs):
    s = gs
    s.execute("CREATE (:A {n: 1})-[:T]->(:B {n: 2})")
    row = s.execute("MATCH (a:A) OPTIONAL MATCH (a)-[r]->(b) "
                    "RETURN startNode(r) AS sn").first()
    assert row["sn"] is not None and row["sn"]["labels"] == ["A"]


def test_null_node_rebind_with_label(gs):
    s = gs
    s.execute("CREATE (:Person {name: 'x'})")
    out = s.execute("WITH null AS a OPTIONAL MATCH (a:Person)-->(b) "
                    "RETURN b").collect()
    assert len(out) == 1 and out[0]["b"] is None


def test_map_projection_with_aggregate(gs):
    s = gs
    s.execute("CREATE (:Q {name: 'ana'}), (:Q {name: 'ana'}), "
              "(:Q {name: 'bo'})")
    out = s.execute("MATCH (n:Q) RETURN n {.name, c: count(*)} AS m").collect()
    # the subject is a non-aggregate sub-expression: grouping is per node
    assert sorted((r["m"]["name"], r["m"]["c"]) for r in out) == \
        [("ana", 1), ("ana", 1), ("bo", 1)]
