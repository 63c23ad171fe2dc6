"""Co-located scan fusion (catalog.co_scan): the single-scan edge+node view
must be value-identical to the separate edge and node tables it replaces —
eids included — and must be invalidated by writes to either side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memgraph_spark.catalog import graph_for, load_tpch_graph
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def g(spark):
    return graph_for(spark, SF_SMOKE)


def test_co_scan_edge_columns_match_edge_table(g):
    """src/dst/eid of every co-scan equal the real edge table's exactly —
    eid drift would silently break edge identity under fusion."""
    assert g.co_scan, "tpch graph registers co-scans"
    for (etype, _end), (_lbl, codf) in g.co_scan.items():
        a = _rows(codf.select("src", "dst", "eid"))
        b = _rows(g.edge(etype).select("src", "dst", "eid"))
        assert a == b, etype


def test_co_scan_node_columns_match_node_table(g):
    """(end id, __n_*) of every co-scan reproduce the node table rows."""
    for (etype, end), (lbl, codf) in g.co_scan.items():
        nprops = [c[4:] for c in codf.columns if c.startswith("__n_")]
        a = _rows(codf.select(F.col(end).alias("id"),
                              *[F.col(f"__n_{p}").alias(p) for p in nprops])
                  .dropDuplicates(["id"]))
        b = _rows(g.node(lbl).select("id", *nprops))
        assert a == b, (etype, lbl)


def test_fused_expand_equals_unfused(spark):
    """A Cypher hop over a co-scanned edge returns byte-identical rows with
    fusion on (co_scan populated) and off (co_scan cleared)."""
    from memgraph_spark.plans import GraphSession
    q = ("MATCH (c:Customer)-[l:PLACED]->(o:Order) "
         "WHERE o.totalprice > 100000 "
         "RETURN o.key AS k, o.orderstatus AS st, "
         "round(o.totalprice, 2) AS tp, l.orderdate AS d "
         "ORDER BY k LIMIT 50")
    g1 = load_tpch_graph(spark, SF_SMOKE)
    fused = GraphSession(g1).execute(q).collect()
    g2 = load_tpch_graph(spark, SF_SMOKE)
    g2.co_scan.clear()
    plain = GraphSession(g2).execute(q).collect()
    assert fused == plain and len(fused) == 50


def test_fused_expand_in_direction(spark):
    """Fusion on the src end fires for in-direction hops and matches."""
    from memgraph_spark.plans import GraphSession
    q = ("MATCH (n:Nation)<-[:FROM_NATION]-(c:Customer) "
         "RETURN n.name AS nation, count(c.key) AS n_c, "
         "round(sum(c.acctbal), 2) AS bal ORDER BY nation")
    g1 = load_tpch_graph(spark, SF_SMOKE)
    fused = GraphSession(g1).execute(q).collect()
    g2 = load_tpch_graph(spark, SF_SMOKE)
    g2.co_scan.clear()
    plain = GraphSession(g2).execute(q).collect()
    assert fused == plain and len(fused) > 0


def test_co_scan_invalidated_on_writes(spark):
    g = load_tpch_graph(spark, SF_SMOKE)
    assert ("PLACED", "dst") in g.co_scan
    g.set_edge_version("PLACED", g.edge("PLACED"))
    assert ("PLACED", "dst") not in g.co_scan
    assert ("FROM_NATION", "src") in g.co_scan
    g.set_node_version("Customer", g.node("Customer"))
    assert ("FROM_NATION", "src") not in g.co_scan
    # remaining entries untouched
    assert ("BASED_IN", "src") in g.co_scan


def test_no_fusion_for_wrong_label(spark):
    """(c)-[:PLACED]->(p:Part) must stay an (empty) attach join, not a
    mis-fused Order scan."""
    from memgraph_spark.plans import GraphSession
    g = load_tpch_graph(spark, SF_SMOKE)
    out = GraphSession(g).execute(
        "MATCH (c:Customer)-[:PLACED]->(p:Part) RETURN count(*) AS n")
    assert out.collect()[0]["n"] == 0
