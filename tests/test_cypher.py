"""Cypher frontend tests: full pipeline (lexer -> parser -> clause compiler ->
DataFrame) against DuckDB oracles at sf0.001, modeled on the reference's
gql_behave corpus (SURVEY §5)."""

from __future__ import annotations

import pytest

from memgraph_spark.catalog import graph_for
from memgraph_spark.plans import GraphSession
from tests.conftest import SF_SMOKE
from tests.oracle import compare, duckdb_conn


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_SMOKE)
    yield c
    c.close()


@pytest.fixture(scope="module")
def gs(spark):
    return GraphSession(graph_for(spark, SF_SMOKE))


CASES = [
    ("scan_all_label", "MATCH (r:Region) RETURN r.name AS name",
     "SELECT r_name AS name FROM region"),
    ("filter_orderby_limit",
     "MATCH (p:Part) WHERE p.size > 40 "
     "RETURN p.key AS k, p.size AS size ORDER BY size DESC, k LIMIT 10",
     "SELECT p_partkey AS k, p_size AS size FROM part WHERE p_size > 40 "
     "ORDER BY size DESC, k LIMIT 10"),
    ("skip_limit",
     "MATCH (r:Region) RETURN r.name AS name ORDER BY name SKIP 2 LIMIT 2",
     "SELECT r_name AS name FROM region ORDER BY name LIMIT 2 OFFSET 2"),
    ("prop_map_filter",
     "MATCH (n:Nation {name: 'NATION_3'}) RETURN n.key AS k",
     "SELECT n_nationkey AS k FROM nation WHERE n_name = 'NATION_3'"),
    ("expand_out",
     "MATCH (c:Customer)-[:FROM_NATION]->(n:Nation) "
     "RETURN n.name AS nation, count(*) AS cnt",
     "SELECT n_name AS nation, count(*) AS cnt FROM customer "
     "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"),
    ("expand_in",
     "MATCH (n:Nation)<-[:FROM_NATION]-(c:Customer) WHERE n.name = 'NATION_1' "
     "RETURN count(*) AS cnt",
     "SELECT count(*) AS cnt FROM customer JOIN nation "
     "ON c_nationkey = n_nationkey WHERE n_name = 'NATION_1'"),
    ("expand_both",
     "MATCH (n:Nation {name: 'NATION_1'})-[:IN_REGION]-(x) RETURN count(*) AS cnt",
     # undirected: out to region + in from nothing (nation only has out IN_REGION)
     "SELECT count(*) AS cnt FROM nation WHERE n_name = 'NATION_1'"),
    ("three_hop",
     "MATCH (c:Customer)-[:FROM_NATION]->(:Nation)-[:IN_REGION]->(r:Region) "
     "WHERE r.name = 'ASIA' RETURN count(*) AS cnt",
     "SELECT count(*) AS cnt FROM customer "
     "JOIN nation ON c_nationkey = n_nationkey "
     "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'"),
    ("edge_property_filter",
     "MATCH (o:Order)-[l:CONTAINS]->(:Part) WHERE l.quantity >= 45 "
     "RETURN count(*) AS cnt",
     "SELECT count(*) AS cnt FROM lineitem WHERE l_quantity >= 45"),
    ("rel_type_union",
     "MATCH (o:Order)-[l:CONTAINS|SUPPLIED_BY]->(x) RETURN count(*) AS cnt",
     "SELECT 2 * count(*) AS cnt FROM lineitem"),
    ("optional_match",
     "MATCH (n:Nation) OPTIONAL MATCH (c:Customer)-[:FROM_NATION]->(n) "
     "RETURN n.name AS nation, count(c.key) AS cust",
     "SELECT n_name AS nation, count(c_custkey) AS cust FROM nation "
     "LEFT JOIN customer ON c_nationkey = n_nationkey GROUP BY n_name"),
    ("pattern_semi",
     "MATCH (s:Supplier) WHERE (s)-[:BASED_IN]->(:Nation {name: 'NATION_3'}) "
     "RETURN s.key AS k",
     "SELECT s_suppkey AS k FROM supplier WHERE s_nationkey IN "
     "(SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3')"),
    ("pattern_anti",
     "MATCH (n:Nation) WHERE NOT (:Supplier)-[:BASED_IN]->(n) "
     "RETURN n.name AS name",
     "SELECT n_name AS name FROM nation WHERE n_nationkey NOT IN "
     "(SELECT s_nationkey FROM supplier)"),
    ("with_aggregate_where",
     "MATCH (c:Customer)-[:PLACED]->(o:Order) "
     "WITH c, count(o) AS n_orders WHERE n_orders >= 12 "
     "RETURN count(*) AS heavy",
     "SELECT count(*) AS heavy FROM (SELECT o_custkey FROM orders "
     "GROUP BY o_custkey HAVING count(*) >= 12)"),
    ("with_carry_node",
     "MATCH (c:Customer) WITH c ORDER BY c.acctbal DESC LIMIT 5 "
     "MATCH (c)-[:PLACED]->(o:Order) RETURN count(*) AS cnt",
     "SELECT count(*) AS cnt FROM orders WHERE o_custkey IN "
     "(SELECT c_custkey FROM customer ORDER BY c_acctbal DESC LIMIT 5)"),
    ("cyclic_join",
     "MATCH (c:Customer)-[:FROM_NATION]->(n:Nation), "
     "(s:Supplier)-[:BASED_IN]->(n) RETURN count(*) AS pairs",
     "SELECT count(*) AS pairs FROM customer JOIN supplier "
     "ON c_nationkey = s_nationkey"),
    ("distinct_rows",
     "MATCH (c:Customer)-[:PLACED]->(:Order) "
     "RETURN DISTINCT c.mktsegment AS seg",
     "SELECT DISTINCT c_mktsegment AS seg FROM customer "
     "JOIN orders ON o_custkey = c_custkey"),
    ("union_all",
     "MATCH (r:Region) RETURN r.name AS name "
     "UNION ALL MATCH (n:Nation) RETURN n.name AS name",
     "SELECT r_name AS name FROM region UNION ALL SELECT n_name FROM nation"),
    ("union_distinct",
     "MATCH (c:Customer) RETURN c.mktsegment AS seg "
     "UNION MATCH (c:Customer) RETURN c.mktsegment AS seg",
     "SELECT DISTINCT c_mktsegment AS seg FROM customer"),
    ("unwind_arith",
     "UNWIND [7, -7, 10] AS x RETURN x AS x, x / 2 AS half, x * 2.5 AS scaled",
     "SELECT x, CAST(trunc(x / 2.0) AS BIGINT) AS half, x * 2.5 AS scaled "
     "FROM (VALUES (7), (-7), (10)) t(x)"),
    ("case_expr",
     "MATCH (p:Part) RETURN CASE WHEN p.size > 25 THEN 'big' "
     "WHEN p.size > 10 THEN 'mid' ELSE 'small' END AS bucket, count(*) AS cnt",
     "SELECT CASE WHEN p_size > 25 THEN 'big' WHEN p_size > 10 THEN 'mid' "
     "ELSE 'small' END AS bucket, count(*) AS cnt FROM part GROUP BY 1"),
    ("string_predicates",
     "MATCH (c:Customer) WHERE c.name STARTS WITH 'Customer' "
     "AND c.name ENDS WITH '1' AND c.name CONTAINS '00' "
     "RETURN c.name AS name",
     "SELECT c_name AS name FROM customer WHERE c_name LIKE 'Customer%' "
     "AND c_name LIKE '%1' AND c_name LIKE '%00%'"),
    ("regex_match",
     "MATCH (r:Region) WHERE r.name =~ 'A.*A' RETURN r.name AS name",
     "SELECT r_name AS name FROM region WHERE regexp_full_match(r_name, 'A.*A')"),
    ("in_list",
     "MATCH (n:Nation) WHERE n.name IN ['NATION_1', 'NATION_5'] "
     "RETURN n.key AS k",
     "SELECT n_nationkey AS k FROM nation WHERE n_name IN ('NATION_1', 'NATION_5')"),
    ("is_null_coalesce",
     "MATCH (n:Nation) OPTIONAL MATCH (n)<-[:BASED_IN]-(s:Supplier) "
     "WITH n, s WHERE s IS NULL "
     "RETURN n.name AS name, coalesce(s.key, -1) AS k",
     "SELECT n_name AS name, -1 AS k FROM nation "
     "WHERE n_nationkey NOT IN (SELECT s_nationkey FROM supplier)"),
    ("list_comprehension",
     "RETURN [x IN range(0, 6) WHERE x % 2 = 0 | x * x] AS sq",
     "SELECT list_transform(list_filter(range(0, 7), x -> x % 2 = 0), "
     "x -> x * x) AS sq"),
    ("quantifiers",
     "UNWIND [[1, 2], [3, 9], [5]] AS l "
     "RETURN all(x IN l WHERE x < 6) AS a, any(x IN l WHERE x > 8) AS b, "
     "none(x IN l WHERE x = 5) AS c, single(x IN l WHERE x % 2 = 0) AS d",
     "SELECT len(list_filter(l, x -> x < 6)) = len(l) AS a, "
     "len(list_filter(l, x -> x > 8)) > 0 AS b, "
     "len(list_filter(l, x -> x = 5)) = 0 AS c, "
     "len(list_filter(l, x -> x % 2 = 0)) = 1 AS d "
     "FROM (VALUES ([1, 2]), ([3, 9]), ([5])) t(l)"),
    ("list_index_slice",
     "UNWIND [[10, 20, 30, 40]] AS l "
     "RETURN l[0] AS first, l[-1] AS lst, l[1..3] AS mid, size(l) AS n",
     "SELECT l[1] AS first, l[-1] AS lst, l[2:3] AS mid, len(l) AS n "
     "FROM (VALUES ([10, 20, 30, 40])) t(l)"),
    ("functions_math",
     "UNWIND [1.44, 2.89] AS x RETURN round(sqrt(x), 1) AS r, abs(-3) AS a, "
     "sign(-2.5) AS s, floor(x) AS f, ceil(x) AS c",
     "SELECT round(sqrt(x), 1) AS r, 3 AS a, -1 AS s, floor(x) AS f, "
     "ceil(x) AS c FROM (VALUES (1.44), (2.89)) t(x)"),
    ("functions_string",
     "MATCH (r:Region) RETURN toLower(r.name) AS lo, substring(r.name, 0, 2) "
     "AS pre, size(r.name) AS n, replace(r.name, 'A', 'X') AS rep",
     "SELECT lower(r_name) AS lo, substr(r_name, 1, 2) AS pre, "
     "length(r_name) AS n, replace(r_name, 'A', 'X') AS rep FROM region"),
    ("var_length_paths",
     "MATCH (c:Customer {key: 1})-[*1..2]->(x) RETURN count(*) AS paths",
     "SELECT 2 + (SELECT count(*) FROM orders WHERE o_custkey = 1) "
     "+ 2 * (SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = "
     "o_orderkey WHERE o_custkey = 1) AS paths"),
    ("named_path_length",
     "MATCH p = (c:Customer {key: 1})-[:FROM_NATION]->(:Nation) "
     "RETURN length(p) AS len",
     "SELECT 1 AS len"),
    ("map_projection",
     "MATCH (r:Region) WITH r {.name, k: r.key * 10} AS m "
     "RETURN m.name AS nm, m.k AS k",
     "SELECT r_name AS nm, r_regionkey * 10 AS k FROM region"),
    ("map_projection_all",
     "MATCH (n:Nation {key: 3}) RETURN n {.*}.name AS nm",
     "SELECT n_name AS nm FROM nation WHERE n_nationkey = 3"),
    ("path_nodes_rels",
     "MATCH p = (c:Customer {key: 1})-[:FROM_NATION]->(n:Nation) "
     "RETURN size(nodes(p)) AS nn, size(relationships(p)) AS nr, "
     "nodes(p)[1].key AS nkey, nodes(p)[0].key AS ckey",
     "SELECT 2 AS nn, 1 AS nr, (SELECT c_nationkey FROM customer "
     "WHERE c_custkey = 1) AS nkey, 1 AS ckey"),
    ("path_varlen_consistency",
     "MATCH p = (c:Customer {key: 1})-[*1..2]->(x) "
     "RETURN count(*) AS paths, sum(size(nodes(p))) - sum(length(p)) AS nchk, "
     "sum(size(relationships(p))) - sum(length(p)) AS rchk",
     "SELECT paths, paths AS nchk, 0 AS rchk FROM (SELECT 2 + (SELECT "
     "count(*) FROM orders WHERE o_custkey = 1) + 2 * (SELECT count(*) FROM "
     "lineitem JOIN orders ON l_orderkey = o_orderkey WHERE o_custkey = 1) "
     "AS paths) t"),
    ("xor_logic",
     "UNWIND [true, false] AS a UNWIND [true, false] AS b "
     "RETURN a AS a, b AS b, a XOR b AS x",
     "SELECT a, b, (a AND NOT b) OR (NOT a AND b) AS x FROM "
     "(VALUES (true), (false)) t(a), (VALUES (true), (false)) u(b)"),
    ("order_on_keyword_label",
     "MATCH (o:Order) WHERE o.orderstatus = 'F' RETURN count(*) AS cnt",
     "SELECT count(*) AS cnt FROM orders WHERE o_orderstatus = 'F'"),
    ("date_compare",
     "MATCH (o:Order) WHERE o.orderdate >= date('1997-01-01') "
     "RETURN count(*) AS cnt",
     "SELECT count(*) AS cnt FROM orders WHERE o_orderdate >= DATE '1997-01-01'"),
    ("agg_minmax_avg",
     "MATCH (p:Part) RETURN min(p.size) AS mn, max(p.size) AS mx, "
     "round(avg(p.size), 4) AS av, count(DISTINCT p.brand) AS brands",
     "SELECT min(p_size) AS mn, max(p_size) AS mx, round(avg(p_size), 4) AS av, "
     "count(DISTINCT p_brand) AS brands FROM part"),
    ("labels_and_id_functions",
     "MATCH (r:Region) RETURN labels(r)[0] AS lbl, r.key AS k",
     "SELECT 'Region' AS lbl, r_regionkey AS k FROM region"),
    ("pattern_comprehension",
     "MATCH (n:Nation) RETURN n.name AS nation, "
     "size([(c:Customer)-[:FROM_NATION]->(n) | c.key]) AS custs",
     "SELECT n_name AS nation, (SELECT count(*) FROM customer "
     "WHERE c_nationkey = n_nationkey) AS custs FROM nation"),
    ("pattern_comprehension_filtered",
     "MATCH (n:Nation) RETURN n.name AS nation, "
     "size([(c:Customer)-[:FROM_NATION]->(n) WHERE c.acctbal > 5000 | c.key]) "
     "AS rich",
     "SELECT n_name AS nation, (SELECT count(*) FROM customer WHERE "
     "c_nationkey = n_nationkey AND c_acctbal > 5000) AS rich FROM nation"),
    ("call_subquery_correlated",
     "MATCH (n:Nation) CALL { WITH n "
     "MATCH (c:Customer)-[:FROM_NATION]->(n) RETURN count(c) AS nc } "
     "RETURN n.name AS nation, nc",
     "SELECT n_name AS nation, cnt AS nc FROM nation JOIN (SELECT "
     "c_nationkey, count(*) AS cnt FROM customer GROUP BY 1) "
     "ON c_nationkey = n_nationkey"),
    ("call_subquery_uncorrelated",
     "CALL { MATCH (r:Region) RETURN count(*) AS regions } "
     "MATCH (n:Nation) RETURN regions, count(*) AS nations",
     "SELECT (SELECT count(*) FROM region) AS regions, "
     "count(*) AS nations FROM nation"),
    ("temporal_accessors",
     "MATCH (o:Order) RETURN o.orderdate.year AS y, "
     "o.orderdate.month AS m, count(*) AS n",
     "SELECT CAST(year(o_orderdate) AS BIGINT) AS y, "
     "CAST(month(o_orderdate) AS BIGINT) AS m, count(*) AS n "
     "FROM orders GROUP BY 1, 2"),
]


@pytest.mark.parametrize("name,cypher,sql", CASES, ids=[c[0] for c in CASES])
def test_cypher_vs_oracle(gs, con, name, cypher, sql):
    problems = compare(gs.execute(cypher), con, sql)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_parameters(gs, con):
    df = gs.execute(
        "MATCH (p:Part) WHERE p.size > $minsize RETURN count(*) AS n",
        {"minsize": 40})
    problems = compare(df, con, "SELECT count(*) AS n FROM part WHERE p_size > 40")
    assert not problems, problems


def test_edge_uniqueness(gs):
    """Cypher edge-isomorphism: the same edge may not match twice in one
    MATCH (operator.hpp:1768). Two :IN_REGION hops from one nation would
    reuse the single outgoing edge -> zero rows."""
    n = gs.execute(
        "MATCH (a:Nation)-[r1:IN_REGION]->(x), (a)-[r2:IN_REGION]->(y) "
        "RETURN count(*) AS cnt").collect()[0][0]
    assert n == 0


def test_return_node_struct(gs):
    rows = gs.execute(
        "MATCH (r:Region) WHERE r.name = 'ASIA' RETURN r").collect()
    assert len(rows) == 1
    node = rows[0][0]
    assert node.labels == ["Region"] and node.name == "ASIA"


def test_syntax_error():
    from memgraph_spark.plans.parser import parse
    with pytest.raises(SyntaxError):
        parse("MATCH (n RETURN n")
