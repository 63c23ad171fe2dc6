"""Similarity search over embedding columns (ARRAY<FLOAT>).

Parity surface: the reference's usearch-HNSW vector index
(src/storage/v2/indices/vector_index.cpp, query_modules/
vector_search_module.cpp) exposed as `vector_search.search(k, query)`.

Spark-first re-expression: exact brute-force top-k (zip_with dot product +
TakeOrdered) as the baseline; random-hyperplane LSH bucketing as the scale
path (candidates from matching buckets only — the HNSW role). All vector math
is JVM higher-order functions, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector: one scan, one
    TakeOrdered — the correctness baseline every ANN variant is judged by."""
    q = F.array(*[F.lit(float(v)) for v in query_vec]).cast("array<double>")
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), 4).alias("sim"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return scored.orderBy(F.col("sim").desc(), F.col(id_col).asc()).limit(k)


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: all (a < b) with cosine >= threshold.
    Exact all-pairs — use lsh_bucket_topk's banding for the 100 TB path."""
    from memgraph_spark.llm.dedup import _guard_all_pairs
    _guard_all_pairs(df, "cosine_pairs", "lsh_bucket_topk / ivf_topk")
    # hoist the per-vector norm out of the O(n^2) pair loop: cosine(a, b)
    # = dot(a,b)/(norm(a)*norm(b)), and norm is per-row, so computing it
    # once per vector is float-identical to computing it once per pair —
    # each pair then costs ONE higher-order aggregate instead of three.
    # The single-file embeddings scan also arrives as 1 partition, which
    # would run the whole quadratic stage on one core: spread the streamed
    # side first (the other side is the broadcast build of the loop join).
    v = df.select(F.col(id_col).alias("id"),
                  F.col(vec_col).cast("array<double>").alias("v"))
    v = v.withColumn("nrm", norm(F.col("v")))
    a = (v.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"),
                  F.col("nrm").alias("n_a"))
         .repartition(df.sparkSession.sparkContext.defaultParallelism))
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"),
                 F.col("nrm").alias("n_b"))
    return (
        a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(dot(F.col("v_a"), F.col("v_b"))
                                   / (F.col("n_a") * F.col("n_b")), 4))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane (hash-derived, no RNG
    state — reproducible across engines and runs)."""
    import math
    vals = []
    for i in range(dim):
        # splitmix64-style integer scramble -> [-1, 1)
        x = (seed * 0x9E3779B97F4A7C15 + i * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
        x = (x * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        vals.append((x / 2**63) - 1.0)
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def lsh_signature(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """Random-hyperplane signature: bit i = sign(<v, h_i>) packed to a long.

    Arrow-batched: one numpy matmul per batch replaces n_planes interpreted
    higher-order dot products per row (the signature step dominated the LSH
    pipeline — ~10x on the 2000x128 bench corpus, and the same vectorized
    kernel shape a 100 TB corpus wants)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    planes = np.array([_hyperplane(dim, i + 1) for i in range(n_planes)],
                      dtype=np.float64)           # n_planes x dim
    weights = np.left_shift(np.uint64(1),
                            np.arange(n_planes, dtype=np.uint64))

    @pandas_udf("long")
    def _sig(v):
        import pandas as pd
        rows = [(x if x is not None and len(x) == dim else [0.0] * dim)
                for x in v]
        m = np.asarray(rows, dtype=np.float64)    # batch x dim
        bits = (m @ planes.T) > 0                 # batch x n_planes
        packed = (bits.astype(np.uint64) * weights).sum(
            axis=1, dtype=np.uint64).astype(np.int64)
        return pd.Series(packed)

    return _sig(vec)


def lsh_signature_jvm(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """JVM-only signature (no Arrow round-trip) — kept for environments
    where python workers are undesirable; bit-identical up to float
    summation order."""
    sig = F.lit(0).cast("long")
    for i in range(n_planes):
        h = F.array(*[F.lit(v) for v in _hyperplane(dim, i + 1)])
        # shiftleft survives bit 63 (a python literal 1 << 63 overflows
        # the JVM long); OR-packing keeps the sign bit exact
        bit = F.shiftleft(F.lit(1).cast("long"), i)
        sig = sig.bitwiseOR(
            F.when(dot(vec, h) > 0, bit).otherwise(F.lit(0).cast("long")))
    return sig


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
    n_rows: int | None = None,
) -> DataFrame:
    """Bucketed near-duplicate candidates: pairs sharing >= 1 signature
    band (bands x (n_planes/bands)-bit chunks). The O(n x bands)
    bucket self-join that replaces exact all-pairs at corpus scale;
    callers re-rank candidates with the exact metric.

    Pass `n_rows` (corpus size, if the caller already knows it) to make
    the band width SCALE-ADAPTIVE: bits/band grows with log2(n/8) so the
    per-band bucket count tracks n and expected bucket occupancy stays at
    the fixed tuning's design point (~8 rows/bucket) — candidate volume
    stays O(n x occupancy) instead of O(n^2 / 2^bits). The hyperplane
    family is seeded per plane index, so widening only APPENDS planes:
    at or below the design size (n <= 8 * 2^(n_planes/bands)) the
    signature, buckets and output are byte-identical to the fixed
    tuning. Width is capped at 16 bits/band (a 4-band signature must
    pack into one long); past ~500k rows the next step is per-band
    signature words — documented, not yet needed at bench scale."""
    first = df.select(vec_col).first()
    if first is None:
        return df.sparkSession.createDataFrame(
            [], "id_a long, id_b long")
    dim = len(first[0])
    rows = n_planes // bands
    if n_rows is not None:
        import math
        rows = min(max(rows, math.ceil(math.log2(max(2, int(n_rows)) / 8))),
                   64 // bands)
        n_planes = rows * bands
    mask = (1 << rows) - 1
    v = df.select(F.col(id_col).alias("id"),
                  F.col(vec_col).cast("array<double>").alias("v"))
    v = v.withColumn("sig", lsh_signature(F.col("v"), dim, n_planes))
    # bands via explode, not a per-band union: a union would re-evaluate
    # the ArrowEvalPython signature once PER BAND (Spark does not merge
    # common Python-UDF subtrees across union branches); explode keeps one
    # signature pass and one scan (guide §4.1 — control how often columns
    # cross the Python boundary)
    bandrows = v.select(
        "id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.shiftrightunsigned("sig", b * rows)
                     .bitwiseAND(F.lit(mask)).alias("bucket"))
            for b in range(bands)])).alias("bb")
    ).select("id", "bb.band", "bb.bucket")
    a = bandrows.select("band", "bucket", F.col("id").alias("id_a"))
    b_ = bandrows.select("band", "bucket", F.col("id").alias("id_b"))
    return (a.join(b_, on=["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").dropDuplicates())


def lsh_bucket_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing >= 1 signature band
    with the query (bands x (n_planes/bands)-bit chunks), then exact cosine
    on candidates only. At scale the bucket join replaces the full scan."""
    dim = len(query_vec)
    rows = n_planes // bands
    mask = (1 << rows) - 1
    v = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    v = v.withColumn("sig", lsh_signature(F.col("v"), dim, n_planes))

    import math
    qsig = 0
    for i in range(n_planes):
        h = _hyperplane(dim, i + 1)
        if sum(a * b for a, b in zip(query_vec, h)) > 0:
            qsig |= 1 << i
    cond = None
    for b in range(bands):
        c = (F.shiftrightunsigned("sig", b * rows).bitwiseAND(F.lit(mask))
             == F.lit((qsig >> (b * rows)) & mask))
        cond = c if cond is None else (cond | c)
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    return (
        v.filter(cond)
        .select(F.col(id_col), F.round(cosine(F.col("v"), q), 4).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """IVF approximate top-k: kmeans coarse quantizer (algos/kmeans — fully
    JVM-side Lloyd's) partitions vectors into n_lists inverted lists; the
    query probes its n_probe nearest centroids and brute-forces only those
    lists. The 100 TB path: lists are disjoint partitions, so the probe scan
    touches ~n_probe/n_lists of the data; the assignment is a one-off
    offline job reused across queries."""
    from memgraph_spark.algos.kmeans import kmeans

    assigned, centroids = kmeans(
        df.select(F.col(id_col).alias("id"), vec_col), n_lists,
        seed=seed, vec_col=vec_col, return_model=True)
    import numpy as np
    q = np.asarray(query_vec, dtype=float)
    cents = np.asarray(centroids, dtype=float)
    d2 = ((cents - q) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d2)[:n_probe]]
    cand_ids = assigned.filter(F.col("cluster_id").isin(probe)).select("id")
    cand = df.join(cand_ids.withColumnRenamed("id", id_col), id_col)
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)
