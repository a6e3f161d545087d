"""Similarity search over embedding columns (north-star, SURVEY.md §2.10).

Two paths:

- brute-force top-k: broadcast the (small) query set against the
  corpus; per-row cosine via array expressions; per-query top-k via
  a rank window partitioned by query. Exact; O(Q x N) compute but
  embarrassingly parallel and shuffle-light (only Q x k rows move
  after the window). The baseline and the verifier.

- LSH-bucketed (random hyperplane signs): corpus and queries hashed
  to sign-pattern buckets; candidates = same bucket (multi-probe via
  several independent tables); exact re-rank on candidates only.
  At 100 TB the bucket join replaces the Q x N scan with
  O(docs-per-bucket) work — the PAPERS.md top-k literature shape
  (LSH prune + exact re-rank).

Hyperplanes are generated deterministically from xxhash64(dim, table,
plane) — no driver-side RNG state to ship, reproducible across runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot, dot_exact, norm_exact
from ._util import spread


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    deterministic: bool = True,
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    ``queries`` is expected to be small -> broadcast, so the cross
    join is a map-side nested loop with no shuffle of the corpus.
    Ranking rounds the score to 3 decimals then tiebreaks on id so
    the selected set is stable across engines/partitionings.
    """
    norm_fn = norm_exact if deterministic else (lambda c: F.sqrt(dot(c, c)))
    dot_fn = dot_exact if deterministic else dot
    # norms are precomputed per side (not per pair): cosine per pair
    # then costs one dot instead of three.
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            norm_fn(F.col(vec_col)).alias("q_norm"),
        )
    )
    c = spread(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            norm_fn(F.col(vec_col)).alias("c_norm"),
        )
    )
    scored = (
        c.crossJoin(q)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_fn("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")), 3
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    max_iter: int = 10,
    sample_cap: int = 4096,
) -> DataFrame:
    """IVF-style ANN: k-means coarse quantizer + nprobe search.

    Train ``n_lists`` centroids on a deterministic sample with a
    driver-side seeded k-means (the quantizer is trained on a sample
    at any scale — at 100 TB you never k-means the full corpus), then
    assign each corpus vector to its nearest centroid (the inverted
    lists) via a constant-folded centroid-distance expression, and for
    each query probe the ``n_probe`` nearest lists and exact-rank only
    those candidates. The corpus is written partitioned/bucketed by
    list id at scale, so a query touches n_probe/n_lists of the data —
    the classic IVF trade (recall vs fraction scanned). The sample is
    hash-ordered (xxhash64 of the id), so training is reproducible and
    needs one TakeOrdered pass, no count, no ML pipeline jobs.
    """
    import numpy as np

    corpus_v = spread(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        )
    )
    sample = (
        corpus_v.select("c_vec", F.xxhash64("neighbor_id").alias("h"))
        .orderBy("h")
        .limit(sample_cap)
        .collect()
    )
    X = np.array([r.c_vec for r in sample], dtype=np.float64)
    n_lists = min(n_lists, len(X))
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), n_lists, replace=False)].copy()
    for _ in range(max_iter):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        lab = d2.argmin(1)
        for j in range(n_lists):
            pts = X[lab == j]
            if len(pts):
                cents[j] = pts.mean(0)
    centroids = [list(map(float, c)) for c in cents]

    def _centroid_arr(i: int) -> str:
        return "array(" + ",".join(f"{v!r}D" for v in centroids[i]) + ")"

    def _dist_structs(vec: str) -> str:
        # per-vector distances to each centroid, as sortable structs
        return ", ".join(
            f"struct({i} AS list_id, aggregate(zip_with({vec}, {_centroid_arr(i)}, "
            f"(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), 0D, (a, b) -> a + b) AS d)"
            for i in range(len(centroids))
        )

    _cmp = (
        "(l, r) -> CASE WHEN l.d < r.d THEN -1 WHEN l.d > r.d THEN 1 ELSE 0 END"
    )
    # corpus assignment = nearest centroid (n_probe=1 of the same expr)
    assigned = corpus_v.select(
        "neighbor_id",
        "c_vec",
        F.expr(
            f"array_sort(array({_dist_structs('c_vec')}), {_cmp})[0].list_id"
        ).alias("list_id"),
    )

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    q_probed = q.select(
        "query_id",
        "q_vec",
        F.explode(
            F.expr(
                f"slice(array_sort(array({_dist_structs('q_vec')}), {_cmp}), 1, {n_probe})"
            )
        ).alias("probe"),
    ).select("query_id", "q_vec", F.col("probe.list_id").alias("list_id"))

    cands = assigned.join(F.broadcast(q_probed), "list_id").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        F.round(cosine("q_vec", "c_vec"), 3).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _hyperplane(dim: int, table: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane (host-side,
    tiny). Uses a splitmix-style integer mix -> [-1, 1)."""
    out = []
    for d in range(dim):
        x = (d * 0x9E3779B97F4A7C15 + table * 0xBF58476D1CE4E5B9 + plane * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 27
        out.append((x % 2_000_000) / 1_000_000.0 - 1.0)
    return out


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_tables: int = 8,
    n_planes: int = 4,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH prune + exact re-rank.

    Each table hashes a vector to an ``n_planes``-bit sign pattern;
    a query's candidates are corpus vectors sharing a bucket in any
    table. Candidate generation is an equi-join on (table, bucket) —
    broadcastable for small query sets, shuffle-on-bucket otherwise.

    Tuning: per-table collision probability for angle θ is
    (1-θ/π)^n_planes, union over n_tables. 8x4 keeps ~90%+ recall at
    θ<=45° while pruning ~15/16 of the corpus per table; raise
    n_planes as the corpus grows (planes ~ log(corpus/target
    candidates)).
    """

    # Build the bucket expressions ONCE as SQL strings: per-element
    # F.lit() is a py4j round-trip each, and 4x8x64 literals twice
    # (corpus+queries) measured ~7s of pure plan-construction time.
    # The literal arrays constant-fold before codegen, so execution
    # cost is unchanged.
    def _plane_sql(t: int, p: int) -> str:
        hp = _hyperplane(dim, t, p)
        arr = ",".join(f"{v!r}D" for v in hp)
        return (
            f"CASE WHEN aggregate(zip_with({vec_col}, array({arr}), "
            f"(x, y) -> CAST(x AS DOUBLE) * y), 0D, (a, b) -> a + b) >= 0 "
            f"THEN {2**p} ELSE 0 END"
        )

    sig_structs = ", ".join(
        "struct({t} AS table, ({bits}) AS bucket)".format(
            t=t, bits=" + ".join(_plane_sql(t, p) for p in range(n_planes))
        )
        for t in range(n_tables)
    )
    tb_expr = F.explode(F.expr(f"array({sig_structs})")).alias("tb")

    def bucketed(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(out_vec),
            tb_expr,
        ).select(out_id, out_vec, "tb.table", "tb.bucket")

    cb = bucketed(spread(corpus), "neighbor_id", "c_vec")
    qb = bucketed(queries, "query_id", "q_vec")
    cands = (
        cb.join(F.broadcast(qb), ["table", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "q_vec", "c_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        F.round(cosine("q_vec", "c_vec"), 3).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
