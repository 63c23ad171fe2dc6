"""Driver-facing queries expressed in openCypher TEXT, run through the full
frontend (lexer -> parser -> clause compiler -> DataFrame) with ANSI-SQL
oracles. These prove the Cypher surface end-to-end, not just the operator API.

Reference parity: each query shape maps to gql_behave corpus features
(tests/gql_behave/tests/memgraph_V1/features/*.feature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from memgraph_spark.catalog import graph_for
from memgraph_spark.plans import GraphSession


def _run(cypher: str, params: dict | None = None, json_cols: tuple = ()):
    """Execute Cypher text through the full frontend.

    json_cols: columns holding list/map values that the driver's pandas
    canonicalizer cannot hash — re-emit them as canonical JSON text
    (the oracle SQL does the same, so values still compare exactly).
    """
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        out = GraphSession(graph_for(spark, sf_dir)).execute(cypher, params)
        for c in json_cols:
            out = out.withColumn(c, F.to_json(F.col(c)))
        return out
    q.__doc__ = cypher
    return q


CYPHER_QUERIES = {
    # ScanAllByLabel + Filter + OrderBy + Limit (pushdown + top-k)
    "cy_scan_topk": _run(
        "MATCH (p:Part) WHERE p.size > 40 "
        "RETURN p.key AS partkey, p.name AS name, p.size AS size "
        "ORDER BY size DESC, partkey ASC LIMIT 20"),
    # Expand + implicit-group aggregation
    "cy_expand_agg": _run(
        "MATCH (c:Customer)-[:FROM_NATION]->(n:Nation) "
        "RETURN n.name AS nation, count(*) AS cnt, "
        "round(sum(c.acctbal), 2) AS total_bal"),
    # 2-hop expand + filter on far end
    "cy_two_hop": _run(
        "MATCH (c:Customer)-[:FROM_NATION]->(:Nation)-[:IN_REGION]->(r:Region) "
        "RETURN r.name AS region, count(*) AS customers"),
    # edge properties + filter on the relationship
    "cy_edge_props": _run(
        "MATCH (o:Order)-[l:CONTAINS]->(p:Part) WHERE l.quantity >= 45 "
        "RETURN p.brand AS brand, count(*) AS heavy_lines, "
        "round(sum(l.extendedprice), 2) AS volume"),
    # OPTIONAL MATCH (left-outer) + count(expr) null-skipping
    # + coalesce over the null side + per-aggregate DISTINCT
    "cy_optional": _run(
        "MATCH (n:Nation) OPTIONAL MATCH (c:Customer)-[:FROM_NATION]->(n) "
        "RETURN n.name AS nation, count(c.key) AS customers, "
        "count(DISTINCT coalesce(c.mktsegment, 'none')) AS kinds"),
    # pattern predicate -> semi join
    "cy_exists": _run(
        "MATCH (s:Supplier) WHERE (s)-[:BASED_IN]->(:Nation {name: 'NATION_3'}) "
        "RETURN s.key AS suppkey, s.name AS name"),
    # negated pattern predicate -> anti join
    "cy_not_exists": _run(
        "MATCH (n:Nation) WHERE NOT (:Supplier)-[:BASED_IN]->(n) "
        "RETURN n.name AS nation"),
    # WITH pipeline: aggregate then filter then re-aggregate
    "cy_with_having": _run(
        "MATCH (c:Customer)-[:PLACED]->(o:Order) "
        "WITH c, count(o) AS n_orders, round(sum(o.totalprice), 2) AS spend "
        "WHERE n_orders >= 12 "
        "RETURN count(*) AS heavy_customers, round(sum(spend), 2) AS heavy_spend"),
    # disconnected patterns sharing a node (cyclic join)
    "cy_cyclic": _run(
        "MATCH (c:Customer)-[:FROM_NATION]->(n:Nation), "
        "(s:Supplier)-[:BASED_IN]->(n) "
        "RETURN n.name AS nation, count(*) AS pairs"),
    # UNION ALL of two label scans
    "cy_union": _run(
        "MATCH (r:Region) RETURN r.name AS name "
        "UNION ALL MATCH (n:Nation) RETURN n.name AS name"),
    # UNWIND + expression arithmetic (int division truncates toward zero)
    "cy_unwind": _run(
        "UNWIND [7, -7, 10, 3] AS x RETURN x AS x, x / 2 AS half, x % 3 AS rem"),
    # CASE expression + DISTINCT
    "cy_case_distinct": _run(
        "MATCH (p:Part) RETURN DISTINCT "
        "CASE WHEN p.size > 25 THEN 'big' ELSE 'small' END AS bucket, "
        "p.brand AS brand"),
    # quantifiers + list comprehension (pure expression layer); the list
    # column is emitted as canonical JSON so the driver's pandas-based
    # canonicalizer can hash it (lists are unhashable in pandas sort).
    "cy_list_exprs": _run(
        "UNWIND [1, 2, 3, 4, 5, 6] AS x "
        "WITH x WHERE x % 2 = 0 "
        "RETURN x AS x, [y IN range(0, x) WHERE y % 2 = 0 | y * y] AS squares, "
        "all(y IN range(1, x) WHERE y > 0) AS allpos",
        json_cols=("squares",)),
    # string predicates
    "cy_strings": _run(
        "MATCH (c:Customer) WHERE c.name ENDS WITH '1' AND c.name CONTAINS '0' "
        "RETURN c.name AS name"),
    # parameterized query
    "cy_params": _run(
        "MATCH (p:Part) WHERE p.size > $minsize AND p.brand = $brand "
        "RETURN count(*) AS n",
        {"minsize": 20, "brand": "Brand#1"}),
    # BM25 full-text search over the documents table (CALL procedure surface)
    "cy_text_bm25": _run(
        "CALL text_search.search('vector hash join', 10) YIELD doc_id, score "
        "RETURN doc_id, score"),
    # regex search (tantivy regex_search parity -> rlike scan)
    "cy_text_regex": _run(
        "CALL text_search.regex_search('vector.*stream') YIELD doc_id "
        "RETURN count(*) AS n"),
    # temporal component accessors on a date property (temporal.hpp parity)
    "cy_date_parts": _run(
        "MATCH (o:Order) RETURN o.orderdate.year AS y, "
        "o.orderdate.month AS m, count(*) AS n"),
    # collect() into a list, reduce() over it (Reduce ast.hpp:1322),
    # plus all()/any() quantifiers over the same list (ast.hpp:1460-1619)
    "cy_collect_reduce": _run(
        "MATCH (o:Order)-[l:CONTAINS]->(:Part) WITH o, "
        "collect(l.quantity) AS qs "
        "RETURN o.key AS orderkey, size(qs) AS n_items, "
        "reduce(acc = 0.0, q IN qs | acc + q) AS total_qty, "
        "all(q IN qs WHERE q > 0) AS allpos, "
        "any(q IN qs WHERE q >= 49) AS hasbig"),
    # geo: haversine distance + bbox predicate as pure column expressions
    "cy_point_geo": _run(
        "UNWIND [[13.4, 52.52], [2.35, 48.86], [-0.13, 51.51]] AS c "
        "WITH point({longitude: c[0], latitude: c[1]}) AS p "
        "RETURN round(point.distance(p, point({longitude: 0.0, latitude: 0.0})) "
        "/ 1000, 1) AS dist_km, "
        "point.withinbbox(p, point({longitude: -1.0, latitude: 45.0}), "
        "point({longitude: 5.0, latitude: 55.0})) AS in_box"),
}


CYPHER_ORACLES = {
    "cy_scan_topk": """
SELECT p_partkey AS partkey, p_name AS name, p_size AS size
FROM part WHERE p_size > 40
ORDER BY size DESC, partkey ASC LIMIT 20
""",
    "cy_expand_agg": """
SELECT n_name AS nation, count(*) AS cnt, round(sum(c_acctbal), 2) AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    "cy_two_hop": """
SELECT r_name AS region, count(*) AS customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    "cy_edge_props": """
SELECT p_brand AS brand, count(*) AS heavy_lines,
       round(sum(l_extendedprice), 2) AS volume
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_quantity >= 45
GROUP BY p_brand
""",
    "cy_optional": """
SELECT n_name AS nation, count(c_custkey) AS customers,
       count(DISTINCT coalesce(c_mktsegment, 'none')) AS kinds
FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    "cy_exists": """
SELECT s_suppkey AS suppkey, s_name AS name
FROM supplier
WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3')
""",
    "cy_not_exists": """
SELECT n_name AS nation FROM nation
WHERE n_nationkey NOT IN (SELECT s_nationkey FROM supplier)
""",
    "cy_with_having": """
SELECT count(*) AS heavy_customers, round(sum(spend), 2) AS heavy_spend
FROM (
  SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
  FROM orders GROUP BY o_custkey HAVING count(*) >= 12
)
""",
    "cy_cyclic": """
SELECT n_name AS nation, count(*) AS pairs
FROM customer
JOIN supplier ON c_nationkey = s_nationkey
JOIN nation ON n_nationkey = c_nationkey
GROUP BY n_name
""",
    "cy_union": """
SELECT r_name AS name FROM region
UNION ALL SELECT n_name AS name FROM nation
""",
    "cy_unwind": """
SELECT x, CAST(trunc(x / 2.0) AS BIGINT) AS half,
       CAST(x - 3 * trunc(x / 3.0) AS BIGINT) AS rem
FROM (VALUES (7), (-7), (10), (3)) t(x)
""",
    "cy_case_distinct": """
SELECT DISTINCT CASE WHEN p_size > 25 THEN 'big' ELSE 'small' END AS bucket,
       p_brand AS brand
FROM part
""",
    "cy_list_exprs": """
SELECT x,
       CAST(to_json(list_transform(list_filter(range(0, x + 1),
                                               y -> y % 2 = 0),
                    y -> y * y)) AS VARCHAR) AS squares,
       len(list_filter(range(1, x + 1), y -> y > 0)) = x AS allpos
FROM (VALUES (2), (4), (6)) t(x)
""",
    "cy_strings": """
SELECT c_name AS name FROM customer
WHERE c_name LIKE '%1' AND c_name LIKE '%0%'
""",
    "cy_params": """
SELECT count(*) AS n FROM part WHERE p_size > 20 AND p_brand = 'Brand#1'
""",
    "cy_text_bm25": """
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
),
exploded AS (
  SELECT doc_id, len(toks) AS doc_len, unnest(toks) AS token FROM tok
),
idx AS (
  SELECT token, doc_id, doc_len, count(*) AS tf
  FROM exploded GROUP BY 1, 2, 3
),
stats AS (SELECT count(*) AS n FROM documents),
avgl AS (SELECT avg(doc_len) AS al
         FROM (SELECT DISTINCT doc_id, doc_len FROM idx)),
terms AS (SELECT unnest(['hash', 'join', 'vector']) AS token),
hits AS (SELECT i.* FROM idx i JOIN terms USING (token)),
dfreq AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM hits GROUP BY 1),
scored AS (
  SELECT doc_id,
         round(sum(ln(1 + (n - df_t + 0.5) / (df_t + 0.5))
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * doc_len / al))), 4) AS score
  FROM hits JOIN dfreq USING (token), stats, avgl
  GROUP BY doc_id, n, al
)
SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 10
""",
    "cy_text_regex": """
SELECT count(*) AS n FROM documents WHERE regexp_matches(text, 'vector.*stream')
""",
    "cy_date_parts": """
SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS y,
       CAST(extract(month FROM o_orderdate) AS BIGINT) AS m, count(*) AS n
FROM orders GROUP BY 1, 2
""",
    "cy_collect_reduce": """
SELECT o_orderkey AS orderkey, count(*) AS n_items,
       sum(CAST(l_quantity AS DOUBLE)) AS total_qty,
       bool_and(l_quantity > 0) AS allpos,
       bool_or(l_quantity >= 49) AS hasbig
FROM orders JOIN lineitem ON l_orderkey = o_orderkey GROUP BY 1
""",
    # Andoyer geodesic on the WGS84 spheroid against (0, 0) — the same
    # closed form the engine compiles (boost::geometry's default strategy)
    "cy_point_geo": """
WITH pts(lon, lat) AS (VALUES (13.4, 52.52), (2.35, 48.86), (-0.13, 51.51)),
c1 AS (SELECT lon, lat, radians(lat) / 2 AS f, radians(lat) / 2 AS g,
              radians(lon) / 2 AS l FROM pts),
c2 AS (SELECT lon, lat, f, g, l,
              sin(g)^2 * cos(l)^2 + cos(f)^2 * sin(l)^2 AS s,
              cos(g)^2 * cos(l)^2 + sin(f)^2 * sin(l)^2 AS c FROM c1),
c3 AS (SELECT *, atan(sqrt(s / c)) AS w FROM c2),
c4 AS (SELECT *, sqrt(s * c) / w AS r, 2 * w * 6378137 AS d FROM c3)
SELECT round(d * (1 + (1 / 298.257223563) *
             (((3 * r - 1) / (2 * c)) * sin(f)^2 * cos(g)^2
              - ((3 * r + 1) / (2 * s)) * cos(f)^2 * sin(g)^2)) / 1000,
             1) AS dist_km,
       (lon BETWEEN -1.0 AND 5.0) AND (lat BETWEEN 45.0 AND 55.0) AS in_box
FROM c4
""",
}
