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

import pandas as pd  # module-scope: pandas_udf type hints resolve here
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot, dot_exact, norm_exact
from ._util import spread


# Lesson encoded in the kernels below: constant-vector math (centroid
# distances, hyperplane dots, codebook scans) belongs in ONE Arrow
# matmul per batch, not in per-constant expression trees. SQL text
# with inlined arrays costs a 10-30s cold ANTLR lex (observed via
# jstack: LexerATNSimulator dominating); per-element F.lit is a py4j
# round trip per number; even one zip_with/aggregate tree per constant
# is ~0.1s of plan construction each and interprets element-wise at
# runtime. BLAS beats all three by orders of magnitude.


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


def lsh_topk_portable(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_tables: int = 8,
    n_planes: int = 4,
) -> DataFrame:
    """ANN top-k via hyperplane LSH, HASH-CHECKABLE end to end: md5
    integer planes + floor(x*2^20) quantization make bucket assignment
    AND candidate scores bit-identical in any engine (same portability
    kit as ``embedding_lsh_dedup_pairs``; contrast ``lsh_bucket_topk``,
    whose splitmix planes are JVM-fast but not SQL-reproducible).

    Plan shape: candidate generation is an equi-join of corpus buckets
    against broadcast query buckets (ids only); vectors are re-fetched
    for candidates; scoring is one int64 einsum per Arrow batch; the
    per-query top-k is a rank window over candidates only.
    """
    from .dedup import filter_valid_vectors, portable_bucket_udf, portable_qcos_udf

    # r13 shared-kit hardening: both relations pass the shared
    # validity gate so dirty vectors degrade to exclusion in both
    # engines (see filter_valid_vectors for the four failure modes)
    corpus = filter_valid_vectors(corpus, vec_col, dim)
    queries = filter_valid_vectors(queries, vec_col, dim)
    _buckets = portable_bucket_udf(dim, n_tables, n_planes)
    _qcos = portable_qcos_udf()

    cb = spread(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode(_buckets(vec_col)).alias("table", "bucket"),
    )
    qb = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.posexplode(_buckets(vec_col)).alias("table", "bucket"),
        )
    )
    cands = (
        cb.join(qb, ["table", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        cands.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select("query_id", "neighbor_id", _qcos("q_vec", "c_vec").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def lsh_archive_topk(
    queries: DataFrame,
    postings_path: str,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k served FROM the incrementally-maintained posting
    archive (operators/dedup.incremental_embedding_near_dup /
    stream_embeddings_curation): queries bucket under the archive's
    FROZEN plane config, probe the persisted (table, bucket, id)
    postings, and exact-rerank the recalled candidates — the query
    half of the build-incrementally/search-many lifecycle (FAISS
    add-then-search, Spark-shaped).

    The corpus table supplies candidate vectors by id (the postings
    hold ids only); at scale that is the curated corpus the archive
    indexes. Candidate generation joins broadcast query buckets
    against a postings SCAN — no signature recompute for any archived
    vector, and adding batches to the archive never touches past
    postings. Scoring/ranking matches lsh_topk_portable (exact
    quantized-int cosine, rank window over candidates only).
    """
    from .dedup import (
        embedding_bucket_postings,
        load_embedding_index_config,
        portable_qcos_udf,
    )

    spark = queries.sparkSession
    cfg = load_embedding_index_config(spark, postings_path)
    if cfg is None:
        raise ValueError(f"no index config beside {postings_path}")
    qb = F.broadcast(
        embedding_bucket_postings(
            queries, cfg["dim"], cfg["n_tables"], cfg["n_planes"],
            id_col=id_col, vec_col=vec_col,
        ).select(
            F.col(id_col).alias("query_id"), "table", "bucket"
        )
    )
    postings = spark.read.parquet(postings_path).select(
        F.col(id_col).alias("neighbor_id"), "table", "bucket"
    )
    cands = (
        postings.join(qb, ["table", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    _qcos = portable_qcos_udf()
    qv = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        cands.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select("query_id", "neighbor_id", _qcos("q_vec", "c_vec").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


class IVFIndex:
    """A trained IVF coarse quantizer: the (n_lists, dim) centroid
    matrix. Persistable as a tiny parquet dataset so the
    train-once/search-many lifecycle works on any cluster filesystem
    (HDFS/S3/local) — at 100 TB the quantizer is trained once on a
    sample, saved beside the partitioned corpus, and every query job
    loads it instead of retraining.
    """

    def __init__(self, centroids) -> None:
        import numpy as np

        self.centroids = np.asarray(centroids, dtype=np.float64)

    def save(self, spark, path: str) -> None:
        rows = [
            (i, [float(v) for v in c]) for i, c in enumerate(self.centroids)
        ]
        (
            spark.createDataFrame(rows, "list_id int, centroid array<double>")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(path)
        )

    @classmethod
    def load(cls, spark, path: str) -> "IVFIndex":
        rows = spark.read.parquet(path).orderBy("list_id").collect()
        return cls([r.centroid for r in rows])


def _sample_vectors(corpus_v: DataFrame, vec_col: str, id_col: str, cap: int):
    """Deterministic training sample: hash-ordered TakeOrdered pass —
    reproducible at any scale, no count job, no ML pipeline."""
    import numpy as np

    sample = (
        corpus_v.select(vec_col, F.xxhash64(id_col).alias("h"))
        .orderBy("h")
        .limit(cap)
        .collect()
    )
    return np.array([r[0] for r in sample], dtype=np.float64)


def _kmeans(X, k: int, seed: int, max_iter: int):
    """Seeded driver-side Lloyd's iterations on a sample. A coarse
    quantizer needs balanced-ish lists, not convergence."""
    import numpy as np

    k = min(k, len(X))
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), k, replace=False)].copy()
    for _ in range(max_iter):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        lab = d2.argmin(1)
        for j in range(k):
            pts = X[lab == j]
            if len(pts):
                cents[j] = pts.mean(0)
    return cents


def train_ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    seed: int = 42,
    max_iter: int = 10,
    sample_cap: int = 4096,
) -> IVFIndex:
    """Train the IVF quantizer on a deterministic corpus sample."""
    X = _sample_vectors(corpus.select(id_col, vec_col), vec_col, id_col, sample_cap)
    return IVFIndex(_kmeans(X, n_lists, seed, max_iter))


def _ivf_kernels(C, n_probe: int):
    """The two IVF assignment kernels over a centroid matrix C: nearest
    list per vector, and the n_probe nearest lists per query — each ONE
    Arrow matmul per batch (argmin ||x-c||² == argmax x·c − ||c||²/2)."""
    import numpy as np

    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    c_half = 0.5 * (C * C).sum(1)
    n_probe_eff = min(n_probe, len(C))

    @pandas_udf(IntegerType())
    def _nearest(vecs: pd.Series) -> pd.Series:
        X = np.array(vecs.tolist(), dtype=np.float64)
        return pd.Series((X @ C.T - c_half).argmax(1).astype("int32"))

    @pandas_udf(ArrayType(IntegerType()))
    def _probes(vecs: pd.Series) -> pd.Series:
        X = np.array(vecs.tolist(), dtype=np.float64)
        scores = X @ C.T - c_half
        order = np.argsort(-scores, axis=1)[:, :n_probe_eff].astype("int32")
        return pd.Series(list(order))

    return _nearest, _probes


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
    index: IVFIndex | None = None,
) -> DataFrame:
    """IVF-style ANN: k-means coarse quantizer + nprobe search.

    Train ``n_lists`` centroids on a deterministic sample with a
    driver-side seeded k-means (the quantizer is trained on a sample
    at any scale — at 100 TB you never k-means the full corpus), then
    assign each corpus vector to its nearest centroid (the inverted
    lists) via one Arrow matmul kernel per batch (a per-centroid
    expression tree costs ~0.15s of py4j plan construction per
    centroid and interprets the distance element-wise; BLAS does the
    whole batch at once), and for each query probe the ``n_probe``
    nearest lists and exact-rank only those candidates. The corpus is
    written partitioned/bucketed by list id at scale, so a query
    touches n_probe/n_lists of the data — the classic IVF trade
    (recall vs fraction scanned).

    Pass a pre-trained/loaded ``index`` (see ``train_ivf_index`` /
    ``IVFIndex.save``/``load``) to skip training — the
    train-once/search-many path.
    """
    import numpy as np

    corpus_v = spread(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        )
    )
    if index is None:
        X = _sample_vectors(corpus_v, "c_vec", "neighbor_id", sample_cap)
        index = IVFIndex(_kmeans(X, n_lists, seed, max_iter))
    _nearest, _probes = _ivf_kernels(index.centroids, n_probe)

    # corpus assignment = nearest centroid (n_probe=1 of the same kernel)
    assigned = corpus_v.select(
        "neighbor_id", "c_vec", _nearest("c_vec").alias("list_id")
    )

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    q_probed = q.select(
        "query_id", "q_vec", F.explode(_probes("q_vec")).alias("list_id")
    )

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


def ivf_write_partitioned(
    corpus: DataFrame,
    index: IVFIndex,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF inverted lists as the AT-REST layout: corpus
    assigned to its nearest list and written ``partitionBy(list_id)``.
    At 100 TB this is how the index actually lives — each list is a
    hive partition, so an n_probe search becomes a partition-pruned
    scan touching n_probe/n_lists of the files (asserted via
    PartitionFilters in the search plan), instead of assigning the
    whole corpus per query job."""
    nearest, _ = _ivf_kernels(index.centroids, 1)
    assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        nearest(F.col(vec_col)).alias("list_id"),
    )
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(path)


def ivf_search_partitioned(
    spark,
    path: str,
    queries: DataFrame,
    index: IVFIndex,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a list-partitioned IVF corpus (``ivf_write_partitioned``)
    with partition pruning: the union of the query batch's probe lists
    becomes a LITERAL ``isin`` filter on the partition column, so the
    scan reads only those hive partitions (``PartitionFilters`` in the
    plan — the batch-query twin of FAISS's per-list seek). The probe
    union is collected driver-side: the query batch is the small side
    by definition (the corpus is the 100 TB side). Results are
    identical to ``ivf_topk`` with the same index."""
    _, probes = _ivf_kernels(index.centroids, n_probe)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    q_probed = q.select(
        "query_id", "q_vec", F.explode(probes("q_vec")).alias("list_id")
    )
    probe_ids = sorted(
        r.list_id for r in q_probed.select("list_id").distinct().collect()
    )
    corpus = spark.read.parquet(path).where(F.col("list_id").isin(probe_ids))
    cands = corpus.join(F.broadcast(q_probed), "list_id").where(
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


class PQIndex:
    """Trained product-quantization codebooks: one (K, dim/M) centroid
    matrix per subspace. Persisted as a tiny parquet dataset (one row
    per (subspace, code) centroid) exactly like ``IVFIndex`` — at
    100 TB the codebooks are trained once on a sample, saved beside
    the encoded corpus, and every scoring job loads them instead of
    retraining (retraining would also silently invalidate previously
    encoded codes)."""

    def __init__(self, books) -> None:
        import numpy as np

        self.books = [np.asarray(b, dtype=np.float64) for b in books]

    def save(self, spark, path: str) -> None:
        rows = [
            (m, k, [float(v) for v in c])
            for m, B in enumerate(self.books)
            for k, c in enumerate(B)
        ]
        (
            spark.createDataFrame(
                rows, "subspace int, code int, centroid array<double>"
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(path)
        )

    @classmethod
    def load(cls, spark, path: str) -> "PQIndex":
        rows = spark.read.parquet(path).orderBy("subspace", "code").collect()
        books: dict[int, list] = {}
        for r in rows:
            books.setdefault(r.subspace, []).append(r.centroid)
        return cls([books[m] for m in sorted(books)])


def train_pq_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_subspaces: int = 16,
    n_centroids: int = 16,
    seed: int = 42,
    max_iter: int = 10,
    sample_cap: int = 4096,
) -> PQIndex:
    """Train PQ codebooks on a deterministic corpus sample (seeded
    per-subspace k-means, same regime as ``train_ivf_index``)."""
    X = _sample_vectors(corpus.select(id_col, vec_col), vec_col, id_col, sample_cap)
    dim = X.shape[1]
    assert dim % n_subspaces == 0, "dim must divide into subspaces"
    sub = dim // n_subspaces
    return PQIndex(
        [
            _kmeans(X[:, m * sub : (m + 1) * sub], n_centroids, seed + m, max_iter)
            for m in range(n_subspaces)
        ]
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_subspaces: int = 16,
    n_centroids: int = 16,
    seed: int = 42,
    max_iter: int = 10,
    sample_cap: int = 4096,
    rerank: int = 4,
    index: PQIndex | None = None,
) -> DataFrame:
    """Product-quantization ANN: the memory-bound-corpus path.

    Train ``n_subspaces`` independent codebooks (seeded k-means per
    dim-slice, driver-side on a hash-ordered sample — same training
    regime as ``ivf_topk``), encode each corpus vector as M small
    codes (one byte each at K<=256: a 64-dim float32 vector compresses
    256B -> 8B, so a 100 TB corpus' index fits in cluster memory), and
    score queries against codes with asymmetric distance computation:
    per query, an M x K lookup table of subspace dot products; a
    candidate's score is the sum of M table lookups — no float vector
    is ever touched in the scan.

    The quantized scan over-fetches ``k * rerank`` candidates per
    query, then an exact-cosine rerank over just those candidates
    picks the final top-k (FAISS's IVFPQ+refine pattern): the wide
    corpus scan stays code-only, and the float vectors are read for
    only nq*k*rerank rows via a broadcast semi-join of the candidate
    ids. Returned scores are therefore EXACT cosines; only the
    candidate set is approximate — recall asserted vs brute force in
    tests. ``rerank=1`` degrades to pure-ADC ranking.

    Encode (argmin over K centroids per subspace) and LUT build (M x K
    dots per query) are vectorized Arrow kernels — as DSL expressions
    they'd be M*K zip_with/aggregate trees, which measured ~21s of
    driver-side plan construction (py4j round trips) before a single
    task ran, same pathology as the minhash signature kernel. ADC
    scoring stays a codegen zip_with over the two small arrays, and
    ranking reuses the row_number top-k.
    """
    import numpy as np

    # PQ codebooks quantize the RAW vectors; cosine comes from dividing
    # the quantized dot by the true norms (corpus norm stored beside the
    # codes — one extra double per row; query norm folded in at scoring).
    # Normalizing the vectors element-wise instead would re-evaluate the
    # norm per element under CollapseProject.
    corpus_v = spread(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        )
    )
    if index is None:
        X = _sample_vectors(corpus_v, "c_vec", "neighbor_id", sample_cap)
        dim = X.shape[1]
        assert dim % n_subspaces == 0, "dim must divide into subspaces"
        sub = dim // n_subspaces
        # per subspace: (K, sub) centroids over that dim-slice
        books = [
            _kmeans(X[:, m * sub : (m + 1) * sub], n_centroids, seed + m, max_iter)
            for m in range(n_subspaces)
        ]
    else:
        books = index.books
        n_subspaces = len(books)
        sub = books[0].shape[1]

    # encode: per subspace, argmin_k ||slice - centroid_k||^2 — one
    # Arrow batch at a time, ||x-c||^2 = ||x||^2 - 2x.c + ||c||^2 with
    # the x^2 term dropped (constant per argmin), so it's one matmul
    # per subspace over the whole batch.
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType, IntegerType

    books_np = [np.asarray(b, dtype=np.float64) for b in books]

    @pandas_udf(ArrayType(IntegerType()))
    def _encode(vecs: pd.Series) -> pd.Series:
        X = np.array(vecs.tolist(), dtype=np.float64)
        out = np.empty((len(X), n_subspaces), dtype=np.int32)
        for m, B in enumerate(books_np):
            Xm = X[:, m * sub : (m + 1) * sub]
            scores = Xm @ B.T - 0.5 * (B * B).sum(1)  # argmax == argmin d2
            out[:, m] = scores.argmax(1)
        return pd.Series(list(out))

    encoded = corpus_v.select(
        "neighbor_id",
        _encode("c_vec").alias("codes"),
        F.sqrt(dot("c_vec", "c_vec")).alias("c_norm"),
    )

    # ADC lookup tables: per query, for each subspace an array of
    # dot(query_slice, centroid_k) — score(doc) = sum_m lut[m][code_m]
    @pandas_udf(ArrayType(ArrayType(DoubleType())))
    def _luts(vecs: pd.Series) -> pd.Series:
        X = np.array(vecs.tolist(), dtype=np.float64)
        luts = np.stack(
            [X[:, m * sub : (m + 1) * sub] @ B.T for m, B in enumerate(books_np)],
            axis=1,
        )  # (n, M, K)
        return pd.Series([[list(r) for r in row] for row in luts])

    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        ).select(
            "query_id",
            _luts("q_vec").alias("luts"),
            F.sqrt(dot("q_vec", "q_vec")).alias("q_norm"),
        )
    )
    adc = F.aggregate(
        F.zip_with("luts", "codes", lambda lut, c: F.element_at(lut, c + 1)),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    scored = (
        encoded.crossJoin(q)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(adc / (F.col("c_norm") * F.col("q_norm")), 3).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    cand = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k * max(1, rerank))
        .select("query_id", "neighbor_id", "score", "rank")
    )
    if rerank <= 1:
        return cand.where(F.col("rank") <= k)

    # exact rerank: candidates are nq*k*rerank rows -> broadcast them
    # into the corpus join, so float vectors are read only for hits.
    q_exact = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            norm_exact(F.col(vec_col)).alias("q_norm"),
        )
    )
    refined = (
        corpus_v.join(F.broadcast(cand.select("query_id", "neighbor_id")), "neighbor_id")
        .join(q_exact, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_exact("q_vec", "c_vec")
                / (F.col("q_norm") * norm_exact(F.col("c_vec"))),
                3,
            ).alias("score"),
        )
    )
    return (
        refined.withColumn("rank", F.row_number().over(w))
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

    # All T*P hyperplane dots as ONE Arrow matmul per batch. Earlier
    # shapes — SQL text with inlined arrays (10-30s cold ANTLR lex),
    # then one DSL zip_with tree per plane (~0.1s py4j plan build per
    # plane, interpreted per-element at runtime) — both lose to a
    # single (batch, dim) @ (dim, T*P) BLAS call followed by a packed
    # sign->bits reduction.
    import numpy as np

    H = np.array(
        [_hyperplane(dim, t, p) for t in range(n_tables) for p in range(n_planes)],
        dtype=np.float64,
    )  # (T*P, dim)
    bits = np.tile(np.fromiter((2**p for p in range(n_planes)), dtype=np.int64), n_tables)

    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    @pandas_udf(ArrayType(IntegerType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        X = np.array(vecs.tolist(), dtype=np.float64)
        signs = (X @ H.T >= 0).astype(np.int64)  # (batch, T*P)
        packed = (signs * bits).reshape(len(X), n_tables, n_planes).sum(2)
        return pd.Series(list(packed.astype("int32")))

    def bucketed(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        return (
            df.select(
                F.col(id_col).alias(out_id),
                F.col(vec_col).alias(out_vec),
                F.posexplode(_buckets(vec_col)).alias("table", "bucket"),
            )
        )

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


def embedding_contamination(
    corpus: DataFrame,
    evals: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str | None = None,
    use_arrow: bool = False,
) -> DataFrame:
    """Embedding-level eval decontamination: every (corpus, eval) pair
    whose exact cosine clears ``threshold`` — the modern semantic
    complement to the n-gram ``contamination_eval_overlap`` (paraphrased
    or reformatted eval leakage survives n-gram matching but not an
    embedding match). The threshold compares against the UNROUNDED
    exact scaled-int cosine (ADVICE r7: no round-to-3 boundary slop);
    only the reported ``score`` column is rounded to 3 decimals, like
    brute_force_topk's, so the pair set stays engine-portable and
    partitioning-invariant (integer sums + correctly-rounded IEEE
    sqrt/divide give bit-identical doubles in any engine).

    Scale shape: the EVAL side is bounded by construction (benchmark
    suites are thousands of rows, not corpus-sized), so it broadcasts
    and the scan is one map-side nested loop over the corpus — no
    shuffle at all; the threshold filter collapses output to the
    (rare) contaminated pairs. For eval sets too large to broadcast,
    route through the LSH bucket join (``lsh_bucket_topk``'s candidate
    stage) instead — same verdict semantics, candidate-bounded.
    """
    from ..functions.vectors import dot_exact_arrow

    # use_arrow swaps the interpreted zip_with dot fold for the
    # bit-identical signed-round Arrow kernel (vectors.dot_exact_arrow)
    # — same output, removes the per-element interpreter tax on the
    # corpus x evals pair scan
    dot_fn = dot_exact_arrow if use_arrow else dot_exact
    eid = eval_id_col or id_col
    q = F.broadcast(
        evals.select(
            F.col(eid).alias("eval_id"),
            F.col(vec_col).alias("q_vec"),
            norm_exact(F.col(vec_col)).alias("q_norm"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("c_vec"),
        norm_exact(F.col(vec_col)).alias("c_norm"),
    )
    return (
        c.crossJoin(q)
        .select(
            "corpus_id",
            "eval_id",
            (
                dot_fn("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm"))
            ).alias("__exact"),
        )
        .where(F.col("__exact") >= F.lit(threshold))
        .select(
            "corpus_id",
            "eval_id",
            F.round(F.col("__exact"), 3).alias("score"),
        )
    )


def matryoshka_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    prefix_dim: int = 16,
    overfetch: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage ANN with Matryoshka prefixes (Kusupati et al. 2022's
    adaptive-retrieval recipe): a COARSE pass ranks by cosine over the
    first ``prefix_dim`` dims (reading 1/4 of the vector bytes at
    dim 64/prefix 16), keeps ``overfetch`` candidates per query, then
    an exact FULL-dimension cosine reranks the candidates to the
    final top-``k`` — the serving pattern that makes one stored
    embedding work at several cost tiers.

    Determinism: both stages use the exact scaled-int cosine with
    3-decimal rounding + id tiebreaks for their cuts (the repo's knn
    kit), so the selected sets are engine-portable. Scale shape:
    coarse = broadcast query PREFIXES x corpus map-side scan that
    projects only (ids, prefix slice, prefix norm) — full vectors
    never enter the cross join or the per-query TopK window shuffle
    (ADVICE r9) — then the Q x overfetch candidate ids broadcast back
    against the corpus for the exact full-dimension rerank. Recall
    floor vs brute force is test-pinned; prefix quality is the
    model's MRL property, not the operator's."""
    from ..functions.vectors import dot_exact, norm_exact

    if not 0 < prefix_dim:
        raise ValueError(f"prefix_dim must be positive, got {prefix_dim}")
    if overfetch < k:
        raise ValueError(f"overfetch {overfetch} must be >= k {k}")
    pfx = lambda c: F.slice(F.col(c), 1, prefix_dim)  # noqa: E731
    # Coarse pass carries ONLY ids + prefix data through the corpus x
    # queries cross join and the per-query TopK window — the full
    # vectors rejoin below for the Q x overfetch rerank rows (ADVICE
    # r9: the previous shape hauled q_vec/c_vec through both, so the
    # "1/4 of the vector bytes" claim held for compute but not for
    # shuffle volume).
    q_coarse = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            pfx(vec_col).alias("q_pfx"),
            norm_exact(pfx(vec_col)).alias("q_pnorm"),
        )
    )
    # r14 optimization (guide §2.5 input skew): the prefix-norm fold
    # and the per-pair coarse dot are interpreted HOF work that
    # inherited the scan's few skewed splits on a small single-file
    # corpus — spread() the corpus rows so the coarse pass runs at
    # full parallelism (measured 2.39 s -> 1.54 s isolated at sf0.1).
    c_coarse = spread(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("neighbor_id"),
        pfx(vec_col).alias("c_pfx"),
        norm_exact(pfx(vec_col)).alias("c_pnorm"),
    )
    coarse = (
        c_coarse.crossJoin(q_coarse)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_exact("q_pfx", "c_pfx") / (F.col("q_pnorm") * F.col("c_pnorm")),
                3,
            ).alias("coarse_score"),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("coarse_score").desc(), F.col("neighbor_id")
    )
    cands = (
        coarse.withColumn("__r", F.row_number().over(w1))
        .where(F.col("__r") <= overfetch)
        .select("query_id", "neighbor_id", "coarse_score")
    )
    # rerank: broadcast the Q x overfetch candidate ids into a map-side
    # join against the corpus (full vectors read for candidates only),
    # then the broadcast query vectors complete the scoring pair
    q_full = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            norm_exact(F.col(vec_col)).alias("q_norm"),
        )
    )
    c_full = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm_exact(F.col(vec_col)).alias("c_norm"),
    )
    rescored = (
        c_full.join(F.broadcast(cands), "neighbor_id")
        .join(q_full, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "coarse_score",
            F.round(
                dot_exact("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")), 3
            ).alias("score"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "score", "coarse_score",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def mmr_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    pool: int = 20,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_every: int = 5,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) — the diversity pass a RAG retriever runs AFTER similarity
    search: greedily pick ``k`` results maximizing
    ``lam * sim(q, d) - (1 - lam) * max_{s in selected} sim(d, s)``,
    so near-duplicate hits can't crowd the context window. The greedy
    loop is inherently sequential in ``k`` (each pick changes the
    next pick's diversity penalty) but ``k`` is context-window-sized
    by definition, so the loop UNROLLS into the plan: ``k`` chained
    TakeOrderedAndProject(1) steps over the ``pool``-row candidate
    relation — no collect, no driver round-trips beyond plan
    construction.

    Determinism (the repo's knn kit): every pairwise quantity is the
    exact scaled-int cosine rounded to 3 decimals with id tiebreaks;
    the MMR combination is then two IEEE multiplies + a subtract over
    identical doubles, so the selected set and every reported score
    are engine-portable. Scale shape: the cosine pool cut is the
    brute/IVF/LSH stage (broadcast queries x corpus map-side scan);
    everything after runs on pool^2 rows per query. Returns
    (query_id, rank, neighbor_id, relevance, mmr_score).

    Unroll limit: pick ``i``'s plan embeds pick ``i-1`` TWICE (the
    remaining-set anti-join and the penalty join), so the uncut
    lineage grows ~2^k — the connected_components exponential-tree
    lesson (r9) at a different operator. ``checkpoint_every`` eagerly
    localCheckpoints the latest pick and the remaining relation every
    N picks (both are Q-row/Q*pool-row bounded relations, so the cut
    is cheap), bounding the largest plan subtree to ~2^N and total
    plan size to O(k/N * 2^N) — at context-window k (~50) the default
    cadence keeps plan construction flat instead of exponential. The
    cut never fires for k <= checkpoint_every, so small-k plans (the
    catalog's k=3 entry) are byte-identical to the uncut shape."""
    if k < 1 or pool < k:
        raise ValueError(f"need 1 <= k <= pool, got k={k} pool={pool}")
    if not 0.0 < lam <= 1.0:
        raise ValueError(f"lam must be in (0, 1], got {lam}")
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    # materialize the pool cut ONCE (eager localCheckpoint, Q x pool
    # rows — driver-bounded like the kmeans/logreg state): the greedy
    # chain references the pool relation from every pick AND every
    # remaining-set anti-join, so an uncut lineage re-runs the corpus
    # scan per reference and the plan tree grows with 2^k (the
    # connected_components exponential-lineage lesson, r9)
    cand = (
        brute_force_topk(corpus, queries, k=pool, id_col=id_col, vec_col=vec_col)
        .select("query_id", "neighbor_id", F.col("score").alias("relevance"))
        .localCheckpoint(eager=True)
    )
    # pairwise sims WITHIN the pool, per query: pool^2 rows/query
    emb = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        norm_exact(F.col(vec_col)).alias("__n"),
    )
    ca = cand.select("query_id", F.col("neighbor_id").alias("a"))
    cb = cand.select("query_id", F.col("neighbor_id").alias("b"))
    sims = (
        ca.join(cb, "query_id")
        .where(F.col("a") != F.col("b"))
        .join(emb.select(F.col("__id").alias("a"),
                         F.col("__v").alias("va"),
                         F.col("__n").alias("na")), "a")
        .join(emb.select(F.col("__id").alias("b"),
                         F.col("__v").alias("vb"),
                         F.col("__n").alias("nb")), "b")
        .select(
            "query_id", "a", "b",
            F.round(
                dot_exact("va", "vb") / (F.col("na") * F.col("nb")), 3
            ).alias("s"),
        )
        # second lineage cut (Q x pool^2 rows, bounded): sims is
        # referenced from every pick's penalty join — uncut, each
        # reference re-runs the corpus vector-fetch joins; with both
        # cand and sims materialized the whole greedy chain operates
        # on two in-memory pool-sized relations and the corpus is
        # scanned exactly twice total (pool cut + sims build)
        .localCheckpoint(eager=True)
    )
    picks = []
    remaining = cand
    for i in range(k):
        if not picks:
            scored = remaining.select(
                "query_id",
                "neighbor_id",
                "relevance",
                (F.lit(lam) * F.col("relevance")).alias("mmr_score"),
            )
        else:
            pen = None
            cur = remaining
            for j, p in enumerate(picks):
                pj = p.select(
                    "query_id", F.col("neighbor_id").alias(f"__p{j}")
                )
                sj = sims.select(
                    "query_id",
                    F.col("a").alias("neighbor_id"),
                    F.col("b").alias(f"__p{j}"),
                    F.col("s").alias(f"__s{j}"),
                )
                cur = cur.join(F.broadcast(pj), "query_id").join(
                    sj, ["query_id", "neighbor_id", f"__p{j}"]
                )
                pen = (
                    F.col(f"__s{j}")
                    if pen is None
                    else F.greatest(pen, F.col(f"__s{j}"))
                )
            scored = cur.select(
                "query_id",
                "neighbor_id",
                "relevance",
                (
                    F.lit(lam) * F.col("relevance") - F.lit(1.0 - lam) * pen
                ).alias("mmr_score"),
            )
        w = Window.partitionBy("query_id").orderBy(
            F.col("mmr_score").desc(), F.col("neighbor_id")
        )
        pick = (
            scored.withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") == 1)
            .select("query_id", "neighbor_id", "relevance", "mmr_score")
        )
        picks.append(pick)
        remaining = remaining.join(
            pick.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_anti",
        )
        # lineage cadence (see docstring): cut the two relations every
        # future step builds on; skip after the final pick (nothing
        # downstream). Replacing picks[-1] matters — later penalty
        # joins reference the stored pick, not the local variable.
        if (i + 1) % checkpoint_every == 0 and i + 1 < k:
            picks[-1] = pick.localCheckpoint(eager=True)
            remaining = remaining.localCheckpoint(eager=True)
    out = None
    for i, p in enumerate(picks):
        row = p.select(
            "query_id",
            F.lit(i + 1).cast("int").alias("rank"),
            "neighbor_id",
            "relevance",
            "mmr_score",
        )
        out = row if out is None else out.unionByName(row)
    return out


def _all_pairs_topk_arrow(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs exact-cosine top-k edge list, Arrow-kernel scored —
    the BIT-IDENTICAL fast twin of ``brute_force_topk(emb, emb, k)``:
    same per-side expression norms, same ROUND(dot/(qn*cn), 3), same
    (score DESC, id ASC) rank window; only the pair dot product runs
    through the signed-round Arrow kernel (one numpy broadcast per
    batch instead of ~dim interpreted lambda evals per pair — the
    exactness argument lives on vectors.dot_exact_arrow). Equality
    over every fixture pair is pinned in tests/test_winnow_snm.py.
    """
    from ..functions.vectors import dot_exact_arrow

    q = F.broadcast(
        emb.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            norm_exact(F.col(vec_col)).alias("q_norm"),
        )
    )
    c = spread(
        emb.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            norm_exact(F.col(vec_col)).alias("c_norm"),
        )
    )
    scored = (
        c.crossJoin(q)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_exact_arrow("q_vec", "c_vec")
                / (F.col("q_norm") * F.col("c_norm")),
                3,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def mutual_knn_edges(
    emb: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_arrow: bool = True,
) -> DataFrame:
    """Mutual-kNN graph over an embedding corpus: the directed exact-
    cosine top-``k`` edge list, filtered to edges whose REVERSE edge
    also exists — i is kept as a neighbor of q only when q is
    simultaneously in i's own top-k. Mutuality is the standard
    symmetrization that turns a kNN digraph into the graph consistency
    filters, spectral methods and outlier detectors want: asymmetric
    edges are exactly the hub/outlier artifacts of high-dimensional
    cosine (a hub appears in everyone's top-k while reciprocating
    almost nobody).

    Returns BOTH directions of every mutual edge:
    ``(query_id, neighbor_id, score, rank, rank_back)`` — ``rank`` is
    the edge's position in query_id's top-k, ``rank_back`` the reverse
    edge's position in neighbor_id's list. Scores are the
    engine-portable rounded exact cosine of :func:`brute_force_topk`
    (scaled-int dots, ROUND(.,3), id tiebreak), so the selected edge
    set is bit-stable across engines and partitionings.
    ``use_arrow=True`` (default) swaps the interpreted zip_with dot
    fold for the bit-identical signed-round Arrow kernel
    (:func:`_all_pairs_topk_arrow`; equality pinned by
    tests/test_winnow_snm.py::test_mutual_knn_arrow_bit_identical) —
    on the n^2 pair relation the interpreter tax dominates (the same
    trade as semdedup's use_arrow, measured ~4x at sf0.1 here).

    Scale shape: the kNN build is the pluggable quadratic baseline
    (broadcast queries x corpus — swap in the IVF/LSH tiers for a
    100 TB corpus; the mutual step does not care where edges came
    from). The mutuality filter itself is LINEAR in edges: the n·k
    edge list self-joins ONCE on the reversed (query, neighbor) key —
    no corpus data moves, only id/rank tuples.
    """
    if k < 1:
        raise ValueError(f"need k >= 1: {k}")
    # MATERIALIZE the edge list before the self-join: the kNN subtree
    # sits above spread()'s round-robin exchange, and Spark never
    # ReusedExchanges across nondeterministic projections (the
    # global_rank lesson) — without the checkpoint the O(n^2) scoring
    # pass executes TWICE, once per join side (measured: two parallel
    # BroadcastNestedLoopJoin stages, zero ReusedExchange). The edge
    # list itself is only n*k rows.
    edges = (
        _all_pairs_topk_arrow(emb, k=k, id_col=id_col, vec_col=vec_col)
        if use_arrow
        else brute_force_topk(emb, emb, k=k, id_col=id_col, vec_col=vec_col)
    ).localCheckpoint(eager=True)
    return mutual_filter(edges)


def lsh_self_topk_portable(
    corpus: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_tables: int = 8,
    n_planes: int | None = None,
    target_bucket: int = 16,
    max_bucket_size: int | None = None,
    observation=None,
) -> DataFrame:
    """Corpus self-kNN via portable hyperplane LSH — the edge SOURCE
    that makes the mutual-kNN 100 TB story literal (VERDICT r11 item
    4): where :func:`lsh_topk_portable` broadcasts a small query set,
    here every corpus vector is a query, so the candidate join is a
    shuffle EQUI-JOIN of the bucket relation against itself on
    (table, bucket) — id-only rows move, never vector payloads, and
    nothing is broadcast. Hash-checkable end to end on the shared
    portability kit (md5 integer planes, floor(x*2^20) quantization,
    int64 einsum cosine).

    ``n_planes=None`` auto-scales bucket width to the corpus
    (:func:`~..operators.dedup.auto_n_planes`), keeping expected
    occupancy ~``target_bucket`` at any scale — the self-join's cost
    is sum(bucket^2) per table, so occupancy control IS the scale
    knob. ``max_bucket_size`` (default None: off, oracle-exact) drops
    over-cap (table, bucket) groups COUNT-FIRST before pairing — the
    same silent-recall-guarded pre-cap as the MinHash/pHash tiers for
    corpora with mass near-dup floods; pass ``observation`` (a
    ``pyspark.sql.Observation``, r13 — API symmetry with
    ``embedding_lsh_dedup_pairs``) to get ``capped_buckets`` /
    ``max_bucket_size_seen`` riding the bucket-size job, the guard
    that keeps a binding cap from silently costing recall
    (BENCH_SCALE_R13_MUTUAL_LSH pins what a binding cap trades: the
    flood's own pairs dropped, ~99.9% of organic pairs kept).

    Returns ``(query_id, neighbor_id, score, rank)`` — the
    :func:`mutual_filter` input contract.
    """
    from .dedup import (
        auto_n_planes,
        filter_valid_vectors,
        portable_bucket_udf,
        portable_qcos_udf,
    )

    if k < 1:
        raise ValueError(f"need k >= 1: {k}")
    # contract: only vectors in the kit's exactness domain participate
    # — the r12 NULL/ragged filter, widened r13 to the SHARED gate
    # (element-level NULL/NaN, |x| >= 32, zero quantized norm) so a
    # dirty corpus degrades to exclusion in both engines; see
    # dedup.filter_valid_vectors for the four failure modes.
    corpus = filter_valid_vectors(corpus, vec_col, dim)
    if n_planes is None:
        n_planes = auto_n_planes(corpus.count(), target_bucket=target_bucket)
    _buckets = portable_bucket_udf(dim, n_tables, n_planes)
    _qcos = portable_qcos_udf()

    # Materialize the bucket relation: both sides of the self-join
    # read it, and the round-robin spread() exchange below the bucket
    # kernel blocks ReusedExchange (the mutual_knn_edges lesson) — the
    # n x n_tables id/bucket relation is cheap to pin, the bucket
    # einsum is not cheap to run twice.
    bucketed = (
        spread(corpus.select(id_col, vec_col))
        .select(
            F.col(id_col).alias("__id"),
            F.posexplode(_buckets(vec_col)).alias("table", "bucket"),
        )
        .localCheckpoint(eager=True)
    )
    if max_bucket_size is not None or observation is not None:
        sizes = bucketed.groupBy("table", "bucket").agg(
            F.count("*").alias("__bsz")
        )
        if observation is not None:
            over = (
                F.col("__bsz") > max_bucket_size
                if max_bucket_size is not None
                else F.lit(False)
            )
            sizes = sizes.observe(
                observation,
                F.count(F.when(over, 1)).alias("capped_buckets"),
                F.max("__bsz").alias("max_bucket_size_seen"),
            )
        if max_bucket_size is not None:
            sizes = sizes.where(F.col("__bsz") <= max_bucket_size)
        bucketed = bucketed.join(sizes.drop("__bsz"), ["table", "bucket"])
        if observation is not None:
            # CollectMetrics must execute exactly once per action, but
            # the candidate stage reads this relation on BOTH sides of
            # the self-join (two instances of the observed subtree ->
            # Observation.get hard-errors on the duplicate metrics
            # row). Materialize the capped relation so the observed
            # subtree runs once — the metrics are then also available
            # immediately, before any downstream action.
            bucketed = bucketed.localCheckpoint(eager=True)
    cands = (
        bucketed.select(F.col("__id").alias("query_id"), "table", "bucket")
        .join(
            bucketed.select(F.col("__id").alias("neighbor_id"), "table", "bucket"),
            ["table", "bucket"],
        )
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = corpus.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        cands.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select("query_id", "neighbor_id", _qcos("q_vec", "c_vec").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def mutual_filter(edges: DataFrame) -> DataFrame:
    """The mutuality step alone, over ANY directed kNN edge list
    ``(query_id, neighbor_id, score, rank)`` — this is where the
    "swap in the IVF/LSH tiers at 100 TB" claim is made literal: the
    filter does not care where edges came from (brute force,
    lsh_topk_portable, ivf_topk, the posting-archive ANN), it is one
    self-join of the edge list on the reversed key, LINEAR in edges
    (alpha 0.869 through 64x, BENCH_SCALE_R11_MUTUAL_STEP). Callers
    should hand it a MATERIALIZED edge list (persist/localCheckpoint)
    when the kNN build is expensive — both join sides read it.
    Cross-tier equality on any edge set where the approximate tier's
    edges match brute force is pinned in tests."""
    back = edges.select(
        F.col("neighbor_id").alias("query_id"),
        F.col("query_id").alias("neighbor_id"),
        F.col("rank").alias("rank_back"),
    )
    return edges.join(back, ["query_id", "neighbor_id"]).select(
        "query_id", "neighbor_id", "score", "rank", "rank_back"
    )


def knn_isolation(
    emb: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector mutual-kNN degree and isolation flag: how many of a
    vector's top-``k`` neighbors reciprocate, and whether NONE do —
    the mutual-degree-zero rule that flags embedding-space outliers
    (mislabeled, off-distribution, or near-empty documents) without
    any density threshold to tune. Returns one row per corpus vector:
    ``(vec_id, mutual_degree BIGINT, is_isolated BOOLEAN)``.

    Scale shape: one groupBy over the mutual edge list (n·k rows at
    most) left-joined back to the corpus ids — the corpus relation is
    touched once for ids only (column-pruned scan).
    """
    deg = (
        mutual_knn_edges(emb, k=k, id_col=id_col, vec_col=vec_col)
        .groupBy(F.col("query_id").alias(id_col))
        .agg(F.count("*").cast("bigint").alias("mutual_degree"))
    )
    return (
        emb.select(id_col)
        .join(deg, id_col, "left")
        .select(
            id_col,
            F.coalesce("mutual_degree", F.lit(0).cast("bigint")).alias(
                "mutual_degree"
            ),
            (F.coalesce("mutual_degree", F.lit(0)) == 0).alias("is_isolated"),
        )
    )
