"""Identity check: prefix-filtered ngram_jaccard_pairs vs the naive
crossJoin semantics, at sf0.1 (md5 of sorted rows) + candidate volume.

Usage: python tools_r07_ngram_check.py [sf_dir]
"""
from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from memgraph_spark.session import get_spark  # noqa: E402
from memgraph_spark.queries import graph_for  # noqa: E402
from memgraph_spark.llm.dedup import ngram_jaccard_pairs, word_ngrams  # noqa: E402


def naive_pairs(df, n=3, threshold=0.5):
    docs = df.select(F.col("doc_id").alias("id"),
                     word_ngrams(F.col("text"), n).alias("ng")) \
             .withColumn("sz", F.size("ng")).filter(F.col("sz") > 0) \
             .repartition(df.sparkSession.sparkContext.defaultParallelism, "id")
    a = docs.select(F.col("id").alias("id_a"), F.col("ng").alias("ng_a"),
                    F.col("sz").alias("sz_a"))
    b = docs.select(F.col("id").alias("id_b"), F.col("ng").alias("ng_b"),
                    F.col("sz").alias("sz_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter((F.col("sz_a") >= threshold * F.col("sz_b"))
                & (F.col("sz_b") >= threshold * F.col("sz_a")))
        .withColumn("inter", F.size(F.array_intersect("ng_a", "ng_b")))
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def md5_rows(df):
    rows = sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect())
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return h, len(rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    docs = graph_for(spark, sf_dir).tables["documents"]

    t0 = time.time()
    new_h, new_n = md5_rows(ngram_jaccard_pairs(docs, n=3, threshold=0.5))
    t_new = time.time() - t0
    t0 = time.time()
    old_h, old_n = md5_rows(naive_pairs(docs))
    t_old = time.time() - t0
    print(f"new: {new_n} rows md5={new_h} ({t_new:.1f}s)")
    print(f"old: {old_n} rows md5={old_h} ({t_old:.1f}s)")
    print("IDENTICAL" if new_h == old_h else "MISMATCH")

    # also 0.5 at n=2 and threshold 0.7 for edge coverage
    for n, t in ((2, 0.5), (3, 0.7), (3, 0.3)):
        nh, nn = md5_rows(ngram_jaccard_pairs(docs, n=n, threshold=t))
        oh, on = md5_rows(naive_pairs(docs, n=n, threshold=t))
        print(f"n={n} t={t}: new {nn} old {on} "
              + ("IDENTICAL" if nh == oh else "MISMATCH"))


if __name__ == "__main__":
    main()
