"""Travelling-salesman solver over point nodes.

Parity: the reference's tsp module (src/mage/python/tsp.py — `tsp.solve`
with methods greedy / 2_approx / 1.5_approx over a haversine distance
matrix, src/mage/python/mage/geography/travelling_salesman.py).

TSP instances are small point sets collected to the driver (the reference
does exactly this — it materializes a quadratic numpy distance matrix), so
the solver is numpy: greedy nearest-neighbour, MST-preorder 2-approximation
(Prim), and "1.5_approx" mapped to 2-approx + 2-opt improvement (the
reference's Christofides needs a matching library; 2-opt gives the same
order-of-quality tour deterministically). Spark's job is the part that
scales: filtering/projecting the point set down to (id, lat, lng).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_KM = 6371.0


def create_distance_matrix(points: list[dict]) -> np.ndarray | None:
    """Haversine distances; points are {lat, lng} dicts
    (travelling_salesman.py:16)."""
    n = len(points)
    try:
        lat = np.radians([float(p["lat"]) for p in points])
        lng = np.radians([float(p["lng"]) for p in points])
    except (KeyError, TypeError, ValueError):
        return None
    dlat = lat[:, None] - lat[None, :]
    dlng = lng[:, None] - lng[None, :]
    a = np.sin(dlat / 2) ** 2 + np.cos(lat)[:, None] * np.cos(lat)[None, :] * np.sin(dlng / 2) ** 2
    dm = 2 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.clip(a, 0, 1)))
    return dm if n else None


def solve_greedy(dm: np.ndarray) -> list[int]:
    n = len(dm)
    path, visited = [0], {0}
    while len(path) < n:
        last = path[-1]
        d = dm[last].copy()
        d[list(visited)] = np.inf
        nxt = int(np.argmin(d))
        path.append(nxt)
        visited.add(nxt)
    path.append(0)
    return path


def _prim_mst(dm: np.ndarray) -> list[list[int]]:
    n = len(dm)
    adj = [[] for _ in range(n)]
    in_tree = np.zeros(n, dtype=bool)
    in_tree[0] = True
    cost = dm[0].copy()
    parent = np.zeros(n, dtype=int)
    cost[0] = np.inf
    for _ in range(n - 1):
        v = int(np.argmin(cost))
        u = int(parent[v])
        adj[u].append(v)
        adj[v].append(u)
        in_tree[v] = True
        upd = (dm[v] < cost) & ~in_tree
        parent[upd] = v
        cost = np.where(upd, dm[v], cost)
        cost[in_tree] = np.inf
    return adj


def solve_2_approx(dm: np.ndarray) -> list[int]:
    """MST preorder walk (travelling_salesman.py:35)."""
    adj = _prim_mst(dm)
    path, stack, seen = [], [0], {0}
    while stack:
        v = stack.pop()
        path.append(v)
        for w in sorted(adj[v], reverse=True):
            if w not in seen:
                seen.add(w)
                stack.append(w)
    path.append(path[0])
    return path


def _two_opt(path: list[int], dm: np.ndarray, max_rounds: int = 20) -> list[int]:
    improved, rounds = True, 0
    while improved and rounds < max_rounds:
        improved, rounds = False, rounds + 1
        for i in range(1, len(path) - 2):
            for j in range(i + 1, len(path) - 1):
                a, b, c, d = path[i - 1], path[i], path[j], path[j + 1]
                if dm[a][c] + dm[b][d] < dm[a][b] + dm[c][d] - 1e-12:
                    path[i:j + 1] = path[i:j + 1][::-1]
                    improved = True
    return path


def solve_1_5_approx(dm: np.ndarray) -> list[int]:
    return _two_opt(solve_2_approx(dm), dm)


SOLVERS = {"greedy": solve_greedy, "2_approx": solve_2_approx,
           "1.5_approx": solve_1_5_approx}


def tsp_solve(graph, point_ids: list[int] | None = None,
              label: str | None = None, method: str = "1.5_approx"):
    """Returns (sources, destinations) node-id lists — consecutive pairs are
    the tour's edges (tsp.py:15-52 record shape)."""
    frames = []
    from pyspark.sql import functions as F
    for lbl, df in graph.nodes.items():
        if label and lbl != label:
            continue
        if "lat" in df.columns and "lng" in df.columns:
            frames.append(df.select("id", F.col("lat").cast("double"),
                                    F.col("lng").cast("double")))
    if not frames:
        return None
    pts = frames[0]
    for f in frames[1:]:
        pts = pts.unionByName(f)
    if point_ids:
        ids_df = graph.spark.createDataFrame([(int(i),) for i in point_ids], "id long")
        pts = pts.join(F.broadcast(ids_df), "id")
    rows = pts.collect()
    if len(rows) < 2:
        return None
    dm = create_distance_matrix([{"lat": r.lat, "lng": r.lng} for r in rows])
    if dm is None:
        return None
    order = SOLVERS.get(method.lower(), solve_1_5_approx)(dm)
    ids = [rows[i].id for i in order]
    return ids[:-1], ids[1:]
