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
