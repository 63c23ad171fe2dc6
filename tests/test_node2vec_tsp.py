"""node2vec walks/embeddings and TSP (reference node2vec_module, tsp.py)."""

import numpy as np
from pyspark.sql import functions as F

from memgraph_spark.algos import node2vec_embeddings, node2vec_walks, tsp_solve
from memgraph_spark.algos.tsp import create_distance_matrix, solve_greedy
from memgraph_spark.catalog import load_tpch_graph
from tests.conftest import SF_SMOKE


def _two_cliques(spark):
    # two triangles joined by one bridge: 1-2-3 and 4-5-6, bridge 3-4
    g = load_tpch_graph(spark, SF_SMOKE)
    tri = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    g.edges = {"E": spark.createDataFrame(tri, "src long, dst long")}
    g._adj_cache.clear()
    return g


def test_walks_shape_and_validity(spark):
    g = _two_cliques(spark)
    walks = node2vec_walks(g, num_walks=3, walk_length=4, etype="E", seed=7)
    rows = walks.collect()
    # every (start, rep) begins at its start node with step 0
    starts = {(r.start, r.rep) for r in rows if r.step == 0}
    assert len(starts) == 6 * 3
    assert all(r.node == r.start for r in rows if r.step == 0)
    # consecutive steps are graph edges (undirected)
    edges = {(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)}
    edges |= {(b, a) for a, b in edges}
    bywalk = {}
    for r in rows:
        bywalk.setdefault((r.start, r.rep), {})[r.step] = r.node
    for seq in bywalk.values():
        for s in range(1, max(seq) + 1):
            assert (seq[s - 1], seq[s]) in edges


def test_embeddings_cluster_structure(spark):
    g = _two_cliques(spark)
    emb = node2vec_embeddings(g, num_walks=8, walk_length=6, vector_size=8,
                              window=3, epochs=10, seed=3, etype="E")
    vecs = {r.node: np.array(r.embedding) for r in emb.collect()}
    assert set(vecs) == {1, 2, 3, 4, 5, 6}
    assert all(v.shape == (8,) and np.isfinite(v).all() for v in vecs.values())

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    intra = np.mean([cos(vecs[1], vecs[2]), cos(vecs[2], vecs[3]),
                     cos(vecs[4], vecs[5]), cos(vecs[5], vecs[6])])
    inter = np.mean([cos(vecs[1], vecs[5]), cos(vecs[1], vecs[6]),
                     cos(vecs[2], vecs[6])])
    assert intra > inter  # clique-mates embed closer than cross-clique pairs


def test_embeddings_distributed_parity(spark):
    # force the model-averaging path on the same graph: it must produce the
    # full vocabulary, finite vectors, the same cluster structure, and be
    # deterministic run-over-run (fixed partitioning + per-partition rng).
    g = _two_cliques(spark)
    kw = dict(num_walks=8, walk_length=6, vector_size=8, window=3,
              epochs=10, seed=3, etype="E", distributed=True)
    emb = node2vec_embeddings(g, **kw)
    vecs = {r.node: np.array(r.embedding) for r in emb.collect()}
    assert set(vecs) == {1, 2, 3, 4, 5, 6}
    assert all(v.shape == (8,) and np.isfinite(v).all() for v in vecs.values())

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    intra = np.mean([cos(vecs[1], vecs[2]), cos(vecs[2], vecs[3]),
                     cos(vecs[4], vecs[5]), cos(vecs[5], vecs[6])])
    inter = np.mean([cos(vecs[1], vecs[5]), cos(vecs[1], vecs[6]),
                     cos(vecs[2], vecs[6])])
    assert intra > inter

    rerun = {r.node: np.array(r.embedding)
             for r in node2vec_embeddings(g, **kw).collect()}
    assert all(np.allclose(vecs[n], rerun[n]) for n in vecs)


def test_tsp_square(spark):
    g = load_tpch_graph(spark, SF_SMOKE)
    # four points on a ~1-degree square; optimal tour is the perimeter
    g.nodes = {"Place": spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.0, 1.0), (3, 1.0, 1.0), (4, 1.0, 0.0)],
        "id long, lat double, lng double")}
    srcs, dsts = tsp_solve(g, label="Place", method="1.5_approx")
    assert len(srcs) == 4 and srcs[0] == dsts[-1]  # closed tour, 4 legs
    assert sorted(set(srcs)) == [1, 2, 3, 4]
    # perimeter tour never uses a diagonal
    diag = {(1, 3), (3, 1), (2, 4), (4, 2)}
    assert all((a, b) not in diag for a, b in zip(srcs, dsts))


def test_distance_matrix_and_greedy():
    pts = [{"lat": 0.0, "lng": 0.0}, {"lat": 0.0, "lng": 1.0},
           {"lat": 1.0, "lng": 1.0}]
    dm = create_distance_matrix(pts)
    assert dm.shape == (3, 3) and abs(dm[0][1] - 111.19) < 1.0
    tour = solve_greedy(dm)
    assert tour[0] == tour[-1] == 0 and len(tour) == 4
