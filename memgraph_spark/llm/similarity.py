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


def lsh_band_buckets(vec: Column, dim: int, rows: int, bands: int) -> Column:
    """array<long> of per-band LSH bucket values: band b packs the sign
    bits of hyperplanes [b*rows, (b+1)*rows) LSB-first. Identical values
    to slicing the packed `lsh_signature` long when rows*bands <= 64,
    but with no 64-plane cap — wide adaptive tunings (rows*bands > 64)
    carry one word per band instead of one packed long. One numpy matmul
    per Arrow batch, same kernel shape as lsh_signature."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    n_planes = rows * bands
    planes = np.array([_hyperplane(dim, i + 1) for i in range(n_planes)],
                      dtype=np.float64)           # n_planes x dim
    weights = np.left_shift(np.uint64(1), np.arange(rows, dtype=np.uint64))
    n_bands, n_rows_band = bands, rows

    @pandas_udf("array<long>")
    def _buckets(v):
        import pandas as pd
        rws = [(x if x is not None and len(x) == dim else [0.0] * dim)
               for x in v]
        m = np.asarray(rws, dtype=np.float64)     # batch x dim
        bits = (m @ planes.T) > 0                 # batch x n_planes
        bb = bits.reshape(len(rws), n_bands, n_rows_band).astype(np.uint64)
        packed = (bb * weights).sum(axis=2, dtype=np.uint64).astype(np.int64)
        return pd.Series(list(packed))            # batch x bands

    return _buckets(vec)


# The similarity level the adaptive tuning is designed to keep catching:
# a pair at cosine angle-match probability p* per plane. The base tuning's
# recall at p* is the anchor the band count preserves as bits/band widen.
LSH_DESIGN_P = 0.9


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
    the tuning SCALE-ADAPTIVE along BOTH axes:

    - bits/band grows with log2(n/8) so the per-band bucket count tracks
      n and expected bucket occupancy stays at the fixed tuning's design
      point (~8 rows/bucket) — candidate volume stays O(n x occupancy)
      instead of O(n^2 / 2^bits);
    - the band count grows alongside so the per-PAIR match probability
      does not collapse as bands get more selective: with q = p*^rows the
      band count is the smallest B with 1-(1-q)^B >= the base tuning's
      recall at p* = LSH_DESIGN_P (widening bits alone would drop a
      p=0.9 pair's recall from 1-(1-p^8)^4 ≈ 0.90 to 1-(1-p^12)^4 ≈ 0.73
      by 20k rows).

    The hyperplane family is seeded per plane index and bands are packed
    per-band words (lsh_band_buckets), so at or below the design size
    (n <= 8 * 2^(n_planes/bands)) buckets and output pairs are
    byte-identical to the fixed tuning. bits/band caps at 24 (16M
    buckets/band), bands at 16 — past that design point (~134M rows)
    occupancy grows linearly again and the honest next step is IVF/graph
    indexes, not more planes."""
    first = df.select(vec_col).first()
    if first is None:
        return df.sparkSession.createDataFrame(
            [], "id_a long, id_b long")
    dim = len(first[0])
    rows = n_planes // bands
    if n_rows is not None:
        import math
        rows0 = rows
        rows = min(max(rows, math.ceil(math.log2(max(2, int(n_rows)) / 8))),
                   24)
        if rows > rows0:
            q0 = LSH_DESIGN_P ** rows0
            target = 1.0 - (1.0 - q0) ** bands   # base recall at p*
            q = LSH_DESIGN_P ** rows
            bands = min(max(bands, math.ceil(math.log(1.0 - target)
                                             / math.log(1.0 - q))), 16)
    v = df.select(F.col(id_col).alias("id"),
                  F.col(vec_col).cast("array<double>").alias("v"))
    # one Arrow pass emits every band's bucket word (posexplode unrolls
    # them JVM-side), so the signature crosses the Python boundary once
    # regardless of band count (guide §4.1) and the tuning is free to
    # exceed 64 total planes
    v = v.withColumn("bk", lsh_band_buckets(F.col("v"), dim, rows, bands))
    bandrows = v.select("id", F.posexplode("bk").alias("band", "bucket"))
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
    n_rows: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: kmeans coarse quantizer (algos/kmeans — fully
    JVM-side Lloyd's) partitions vectors into n_lists inverted lists; the
    query probes its n_probe nearest centroids and brute-forces only those
    lists. The 100 TB path: lists are disjoint partitions, so the probe scan
    touches ~n_probe/n_lists of the data; the assignment is a one-off
    offline job reused across queries.

    Pass `n_rows` (corpus size, if the caller knows it) to make the list
    count SCALE-ADAPTIVE: n_lists grows to ~sqrt(n) (the standard IVF
    sizing) so the probed fraction n_probe/n_lists SHRINKS with the corpus
    instead of staying a constant 3/8 of it — at 100 TB a fixed-list probe
    is a 37% table scan per query. Below the design size
    (sqrt(n) <= n_lists) the parameter is a no-op, output identical. The
    quantizer cost stays bounded: Lloyd trains on a deterministic
    256*n_lists-row sample (kmeans train_rows — O(k^2 d) per iteration,
    independent of n); the full-corpus assignment remains one O(n k d)
    pass, the offline amortized-across-queries part of any IVF index."""
    from memgraph_spark.algos.kmeans import kmeans

    train_rows = None
    if n_rows is not None:
        import math
        adaptive = min(math.isqrt(max(1, int(n_rows))), 1024)
        if adaptive > n_lists:
            n_lists = adaptive
            # probe ~ sqrt(n_lists) (the usual IVF heuristic): recall
            # degrades if the probe count stays fixed while lists
            # multiply; the probed FRACTION n_probe/n_lists still
            # shrinks as ~n^(-1/4)
            n_probe = max(n_probe, math.isqrt(n_lists))
            cap = 256 * n_lists
            if int(n_rows) > cap:
                train_rows = cap
    assigned, centroids = kmeans(
        df.select(F.col(id_col).alias("id"), vec_col), n_lists,
        seed=seed, vec_col=vec_col, return_model=True,
        train_rows=train_rows)
    import numpy as np
    q = np.asarray(query_vec, dtype=float)
    cents = np.asarray(centroids, dtype=float)
    d2 = ((cents - q) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d2)[:n_probe]]
    cand_ids = assigned.filter(F.col("cluster_id").isin(probe)).select("id")
    cand = df.join(cand_ids.withColumnRenamed("id", id_col), id_col)
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)
