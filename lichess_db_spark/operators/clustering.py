"""Distributed Lloyd k-means over an embedding column (staged r7 ->
r8 catalog entry).

Semantic clustering is a first-class curation op (cluster-balanced
sampling, topic discovery, near-dup cluster analysis); the IVF
quantizer in operators/similarity.py trains driver-side on a bounded
sample — right for a coarse quantizer, wrong for clustering the
corpus. This operator runs textbook Lloyd iterations with the
CORPUS-scale layout:

- **assignment** is per-row math on EXACT scaled-int distances
  (per-dim ROUND(d^2 * 1e12) BIGINTs, order-free integer sums), argmin
  via ``array_position(d, array_min(d))`` — first occurrence, so ties
  break on the LOWEST cluster index deterministically. No shuffle; the
  centroid matrix rides the plan as a literal (k x d doubles —
  kilobytes). Two bit-identical implementations: a zip_with/aggregate
  expression fold and a numpy Arrow kernel (``use_arrow=True``, 3.5x
  at sf0.1/k=8).
- **update** shuffles (cluster, dim) partial sums once per iteration
  — the only exchange — with the sums accumulated as
  ``round(x * 1e12)`` BIGINTs: integer addition is order-independent,
  so the new centroids are bit-identical under ANY partitioning (a
  float mean would drift with partition order and the drift COMPOUNDS
  through iterations; determinism here is what makes runs
  reproducible and the reference test exact).
- driver state is the k x d centroid matrix only; the corpus is
  scanned once per iteration and never collected.

Init is deterministic: the k vectors with the smallest
``xxhash64(id)`` (the same seeded-sample trick the IVF index uses) —
no RNG state, stable across sessions.

Verified in tests/test_clustering.py against a pure-numpy reference
replicating the exact arithmetic (same init, same tiebreak, same
scaled-int means); invariance under repartitioning and monotone
non-increasing inertia are pinned separately.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCALE = 1e12


def init_centroids(
    emb: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """Deterministic seeding: the k vectors with smallest xxhash64(id)."""
    rows = (
        emb.select(vec_col, F.xxhash64(F.col(id_col)).alias("__h"))
        .orderBy("__h")
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(rows)}")
    return [[float(x) for x in r[0]] for r in rows]


def assign_clusters(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_arrow: bool = False,
) -> DataFrame:
    """Map-only nearest-centroid assignment: (id, vec, cluster, dist2).

    Distances are the EXACT scaled integers of :func:`_sq_dist_scaled`
    (reported back as ``dist2`` in squared-L2 units, one division), so
    the argmin — and therefore every downstream centroid — can never
    flip with partitioning or evaluation order, and the expression
    path and the Arrow kernel (``use_arrow=True``, 3.5x at sf0.1/k=8)
    are BIT-IDENTICAL twins (pinned in tests)."""
    if use_arrow:
        # canonical 4-column schema, matching the expression path
        # (the exact d2s column is an assign_clusters_arrow extra)
        return assign_clusters_arrow(emb, centroids, id_col, vec_col).drop("d2s")
    dists = F.array(*[_sq_dist_scaled(F.col(vec_col), c) for c in centroids])
    return emb.select(
        F.col(id_col),
        F.col(vec_col),
        (F.array_position(dists, F.array_min(dists)) - 1)
        .cast("int")
        .alias("cluster"),
        (F.array_min(dists) / F.lit(_SCALE)).alias("dist2"),
    )


def _sq_dist_scaled(vec_col: Column, centroid: list[float]) -> Column:
    """Squared L2 distance as an EXACT scaled integer: each per-dim
    term is ROUND((a-b)^2 * 1e12) as BIGINT, summed by a fold —
    integer addition is order-free, so the distance (and every argmin
    on it) is identical under any evaluation order AND reproducible in
    SQL (the same trick as the KNN oracle's scaled-int cosine)."""
    c = F.array(*[F.lit(float(x)).cast("double") for x in centroid])
    terms = F.zip_with(
        vec_col,
        c,
        lambda a, b: F.round(
            (a.cast("double") - b) * (a.cast("double") - b) * F.lit(_SCALE)
        ).cast("bigint"),
    )
    return F.aggregate(terms, F.lit(0).cast("bigint"), lambda acc, x: acc + x)


def portable_init_centroids(
    emb: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """Engine-portable deterministic seeding: the k vectors with the
    smallest (md5(id), id) — md5 of the decimal id string reproduces
    bit-for-bit in DuckDB, unlike xxhash64."""
    rows = (
        emb.select(vec_col, F.md5(F.col(id_col).cast("string")).alias("__h"), id_col)
        .orderBy("__h", id_col)
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(rows)}")
    return [[float(x) for x in r[0]] for r in rows]


def assign_clusters_arrow(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-kernel twin of the scaled-int assignment — BIT-IDENTICAL
    to :func:`_sq_dist_scaled`'s argmin, ~vectorized-numpy fast.

    The interpreted fold costs ~1.5us per element-eval (n_vecs x k x
    dim lambda evals — the same interpreter tax _minhash_sig's kernel
    removed, 7x there); this kernel does the whole Arrow batch as one
    numpy broadcast — measured 3.5x at sf0.1/k=8 (0.36s vs 1.29s),
    widening with k and corpus size. Exactness argument: the per-dim term is
    ROUND(d^2 * 1e12) where d^2 >= 0, and for non-negative values
    Spark's HALF_UP round equals floor(x + 0.5) — computed here on the
    SAME IEEE double, so every scaled term matches the expression path
    bit-for-bit; the dim-sum accumulates int64 (order-free), and
    ``np.argmin`` takes the FIRST minimum exactly like
    array_position(d, array_min(d)). Equality is pinned in
    tests/test_clustering.py (every vector, both paths).
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)  # (k, d)

    @pandas_udf("struct<cluster:int, dist2:double, d2s:bigint>")
    def _assign(vecs: pd.Series) -> pd.DataFrame:
        # chunked through REUSED buffers: the obvious whole-batch
        # (n, k, d) temporary is k*d-proportional (at k=128/d=64 it is
        # ~0.65 GB float64 per 10k-row batch), and fresh GB-scale
        # allocations in every concurrent worker serialize on kernel
        # page zeroing — the same concurrency collapse measured and
        # fixed in dedup._sig_udf (see BENCH_SCALE.json finding).
        # Chunk rows so the float64 + int64 buffers stay ~64 MB each;
        # per-element arithmetic is unchanged (floor(d*d*SCALE + 0.5)
        # on the same IEEE doubles, truncating int64 cast, int64 dim
        # sum), so assignments stay BIT-IDENTICAL to the expression
        # path at any chunk boundary.
        X = np.asarray(list(vecs), dtype=np.float64)  # (n, d)
        n, k, d = X.shape[0], C.shape[0], C.shape[1]
        cl = np.empty(n, dtype=np.int32)
        d2 = np.empty(n, dtype=np.float64)
        d2s = np.empty(n, dtype=np.int64)
        ch = max(1, (8 << 20) // (k * d))  # rows per ~64MB buffer
        fbuf = np.empty((min(ch, n), k, d), dtype=np.float64)
        ibuf = np.empty((min(ch, n), k, d), dtype=np.int64)
        for s in range(0, n, ch):
            xb = X[s : s + ch]
            m = xb.shape[0]
            fb, ib = fbuf[:m], ibuf[:m]
            np.subtract(xb[:, None, :], C[None, :, :], out=fb)
            np.multiply(fb, fb, out=fb)
            np.multiply(fb, _SCALE, out=fb)
            np.add(fb, 0.5, out=fb)
            np.floor(fb, out=fb)
            np.copyto(ib, fb, casting="unsafe")  # == astype(int64)
            sums = ib.sum(axis=2)  # (m, k) int64
            cl[s : s + m] = sums.argmin(axis=1).astype(np.int32)
            mins = sums.min(axis=1)
            d2s[s : s + m] = mins
            d2[s : s + m] = mins / _SCALE
        # d2s is the EXACT int64 scaled distance — consumers whose
        # tiebreaks compare distances (semdedup centroid_far) must use
        # it, not a dist2*SCALE round-trip: dist2 is a double and two
        # distinct bigints beyond ~2^53-magnitude arithmetic can
        # collapse after the /SCALE division
        return pd.DataFrame({"cluster": cl, "dist2": d2, "d2s": d2s})

    # two-step projection: CollapseProject will not inline a Python
    # UDF into two field references, so the kernel runs once per row
    return emb.select(
        F.col(id_col), F.col(vec_col), _assign(F.col(vec_col)).alias("__a")
    ).select(
        id_col,
        vec_col,
        F.col("__a.cluster").alias("cluster"),
        F.col("__a.dist2").alias("dist2"),
        F.col("__a.d2s").alias("d2s"),
    )


def portable_kmeans_step(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ONE fully hash-checkable Lloyd step: portable init -> exact
    scaled-int nearest-centroid assignment -> scaled-int centroid
    update. Returns long-form (cluster, dim, centroid_scaled_sum,
    n_vectors, centroid) — every column either an exact integer or a
    single IEEE division of exact integers, so a DuckDB oracle
    reproduces the whole step bit-for-bit (catalog:
    kmeans_portable_embeddings). The production multi-iteration path
    is :func:`lloyd_kmeans` (same arithmetic, xxhash64 init, k x d
    driver state); this entry exists to pin the per-iteration
    semantics under the driver's hash gate.
    """
    # r15 (guide §4.2): the assignment runs the numpy Arrow kernel —
    # BIT-IDENTICAL to the _portable_cluster_col expression fold
    # (same md5-seeded centroids, same scaled-int argmin; equality
    # re-verified over every fixture vector in the r15 A/B) — the
    # interpreted zip_with/aggregate fold paid ~1.5us per element
    # eval (n x k x dim) and measured ~2x slower at sf0.1/k=4.
    assigned = assign_clusters_arrow(
        emb, portable_init_centroids(emb, k, id_col, vec_col), id_col, vec_col
    ).select(F.col(vec_col), F.col("cluster"))
    return (
        assigned.select(
            "cluster", F.posexplode(vec_col).alias("pos", "x")
        )
        .groupBy("cluster", (F.col("pos") + 1).cast("int").alias("dim"))
        .agg(
            F.sum(
                F.round(F.col("x").cast("double") * F.lit(_SCALE)).cast("bigint")
            ).alias("centroid_scaled_sum"),
            F.count("*").cast("bigint").alias("n_vectors"),
        )
        .select(
            "cluster",
            "dim",
            "centroid_scaled_sum",
            "n_vectors",
            (
                (F.col("centroid_scaled_sum") / F.lit(_SCALE)) / F.col("n_vectors")
            ).alias("centroid"),
        )
    )


def _portable_dists_col(
    emb: DataFrame, k: int, id_col: str, vec_col: str
) -> Column:
    """The shared scaled-int distance ARRAY under md5-seeded init —
    the single source every portable consumer derives from (argmin
    for assignment; array_min for distance-to-centroid, e.g.
    semdedup's keep-farthest-from-centroid rule)."""
    cents = portable_init_centroids(emb, k, id_col, vec_col)
    return F.array(*[_sq_dist_scaled(F.col(vec_col), c) for c in cents])


def _portable_cluster_col(
    emb: DataFrame, k: int, id_col: str, vec_col: str
) -> Column:
    """The ONE portable assignment expression (md5-seeded init + exact
    scaled-int argmin, first minimum on ties — DuckDB mirrors with
    ORDER BY dist, c), shared by :func:`portable_kmeans_step` and
    :func:`portable_assign` so their arithmetic can never drift."""
    dists = _portable_dists_col(emb, k, id_col, vec_col)
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def portable_assign(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster) under the engine-portable single Lloyd step —
    the assignment half of :func:`portable_kmeans_step` (same shared
    expression), exposed so downstream hash-checkable compositions
    (cluster-balanced sampling, per-cluster stats) can reuse it;
    map-only — the k x d centroid matrix rides into the Arrow worker.
    r15 (guide §4.2): runs the numpy Arrow kernel, BIT-IDENTICAL to
    the _portable_cluster_col expression fold (pinned in tests and
    re-verified over every fixture vector in the r15 A/B)."""
    return assign_clusters_arrow(
        emb, portable_init_centroids(emb, k, id_col, vec_col), id_col, vec_col
    ).select(F.col(id_col), F.col("cluster"))


def lloyd_kmeans(
    emb: DataFrame,
    k: int,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_arrow: bool = False,
) -> tuple[DataFrame, list[list[float]], list[float]]:
    """Run ``n_iter`` Lloyd iterations; returns (assignments,
    final centroids, per-iteration inertia).

    Assignments is the lazy (id, cluster, dist2) frame under the FINAL
    centroids. An empty cluster keeps its previous centroid (the
    standard Lloyd convention that avoids NaN centroids).
    """
    if k <= 0 or n_iter <= 0:
        raise ValueError(f"k and n_iter must be positive, got k={k}, n_iter={n_iter}")
    cents = init_centroids(emb, k, id_col, vec_col)
    inertia: list[float] = []
    for _ in range(n_iter):
        assigned = assign_clusters(emb, cents, id_col, vec_col, use_arrow)
        # one exchange: (cluster, dim) scaled-int partial sums + counts
        upd = (
            assigned.select(
                "cluster",
                F.posexplode(vec_col).alias("dim", "x"),
                F.col("dist2"),
            )
            .groupBy("cluster", "dim")
            .agg(
                F.sum(
                    F.round(F.col("x").cast("double") * F.lit(_SCALE)).cast("bigint")
                ).alias("s"),
                F.count("*").alias("n"),
                F.sum(F.when(F.col("dim") == 0, F.col("dist2"))).alias("d2"),
            )
            .collect()
        )
        new = [list(c) for c in cents]
        it_inertia = 0.0
        for r in upd:
            new[r["cluster"]][r["dim"]] = (r["s"] / _SCALE) / r["n"]
            if r["dim"] == 0 and r["d2"] is not None:
                it_inertia += r["d2"]
        inertia.append(it_inertia)
        cents = new
    return assign_clusters(emb, cents, id_col, vec_col, use_arrow), cents, inertia


def gramian_exact_arrow(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    chunk_rows: int = 1024,
) -> DataFrame:
    """Arrow-kernel twin of the expression-path Gramian (the
    embedding_top_pc entry's one corpus pass) — BIT-IDENTICAL,
    vectorized-numpy fast: returns ``(i, j, gv)`` with 1-based dims and
    ``gv = SUM(ROUND(x_i * x_j * 1e12))`` as exact int64, the same
    integers the ``posexplode x posexplode -> groupBy`` shape produces.

    Why: the expression path explodes n x dim^2 pair rows per corpus
    pass — the honest oracle-exact shape, but at 100 TB the explode
    volume is the bottleneck the entry's docstring promised a kernel
    swap for. This kernel emits dim^2 PARTIAL rows per Arrow batch
    (outer products accumulated batch-side), so the exchange carries
    batches x dim^2 rows instead of n x dim^2 — the two-level
    aggregation pattern at the vector level.

    Exactness argument (the dot_exact_arrow signed variant): the
    per-element term is ROUND(x_i*x_j*1e12) where the product may be
    NEGATIVE and Spark's HALF_UP round is away-from-zero — computed as
    ``copysign(floor(abs(v) + 0.5), v)`` on the SAME IEEE double
    product; int64 sums are order-free, so any batching/partitioning
    gives the same integers. Memory discipline (the r8 page-zeroing
    lesson): the (chunk, dim, dim) outer-product temporary streams
    through ONE reused buffer (chunk_rows*dim^2*8 bytes, ~33 MB at the
    defaults) instead of a fresh n-proportional allocation per batch.

    Rows with NULL / ragged / NaN vectors raise — the Gramian is a
    corpus statistic and silently skipping rows would bias it; filter
    upstream (the catalog fixture has none)."""
    import numpy as np
    from pyspark.sql import functions as F

    out_schema = "i int, j int, gv long"

    def fold(batches):
        import pandas as pd

        buf = np.empty((chunk_rows, dim, dim), dtype=np.float64)
        abuf = np.empty((chunk_rows, dim, dim), dtype=np.float64)
        ibuf = np.empty((chunk_rows, dim, dim), dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            if X.ndim != 2 or X.shape[1] != dim or np.isnan(X).any():
                raise ValueError(
                    f"gramian_exact_arrow: expected clean (n, {dim}) batch, "
                    f"got shape {X.shape}"
                )
            G = np.zeros((dim, dim), dtype=np.int64)
            for s in range(0, len(X), chunk_rows):
                c = X[s : s + chunk_rows]
                P, A, I = buf[: len(c)], abuf[: len(c)], ibuf[: len(c)]
                np.multiply(c[:, :, None], c[:, None, :], out=P)
                np.multiply(P, 1e12, out=P)
                np.abs(P, out=A)
                np.add(A, 0.5, out=A)
                np.floor(A, out=A)
                np.copysign(A, P, out=A)
                # int64 per-element cast into the reused buffer, THEN
                # the chunk fold — a float64 axis-sum here would round
                # (terms reach ~1e12, chunk sums ~1e15) and break the
                # bit-identity contract with the expression path
                np.copyto(I, A, casting="unsafe")
                G += I.sum(axis=0)
            ii, jj = np.indices((dim, dim))
            yield pd.DataFrame(
                {
                    "i": (ii + 1).ravel().astype("int32"),
                    "j": (jj + 1).ravel().astype("int32"),
                    "gv": G.ravel(),
                }
            )

    return (
        emb.select(vec_col)
        .mapInPandas(fold, schema=out_schema)
        .groupBy("i", "j")
        .agg(F.sum("gv").cast("bigint").alias("gv"))
    )


def k_core(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Synchronous k-core peeling (Seidman 1983), ``rounds`` rounds
    unrolled: each round simultaneously drops every node whose degree
    in the CURRENT subgraph is below ``k``, then drops edges touching
    a dropped node — removal cascades, which is the whole point (a
    node can clear ``k`` in the raw graph yet die once its loose
    neighbors go). The density tier of the graph family: CC says
    which nodes TOUCH, LPA says which cluster, k-core says which
    survive inside a dense backbone — the curation rule that keeps a
    near-dup community's core and strips its loose periphery before
    electing representatives. Deterministic by construction (a pure
    function of the graph, ``k`` and ``rounds``), so a SQL oracle
    unrolls the identical rounds.

    ``edges`` is an undirected edge list, one row per edge in either
    orientation; both directions are derived internally. Returns one
    row per node of the INPUT graph: ``(node, core_degree BIGINT,
    in_core BOOLEAN)`` — ``in_core`` = survived all ``rounds``,
    ``core_degree`` = the node's degree among surviving edges after
    the final round (0 when dropped). Fixed ``rounds`` is the
    LPA/oracle contract; full convergence needs at most
    max-degeneracy rounds.

    Scale shape: per round, ONE map-side-combinable degree aggregate
    + two semi-joins of the edge relation against the (node)-survivor
    set — Pregel as a driver loop whose state is the shrinking edge
    relation itself; no driver-side graph, survivor sets are id-only
    rows. The state is read TWICE per round (degree aggregate + the
    semi-join base), so unlike LPA's linear frontier lineage the
    uncut plan re-executes the edge derivation ~2^rounds times — the
    CC exponential-lineage class. The edge relation is therefore
    eagerly localCheckpointed EVERY round (id-pair rows, cheap to
    pin; measured on the sf0.1 co-purchase graph: 19.3 s uncut ->
    ~3 s with the per-round cut at rounds=3).
    """
    if k < 1:
        raise ValueError(f"need k >= 1: {k}")
    if rounds < 1:
        raise ValueError(f"need rounds >= 1: {rounds}")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    # r15 optimization (guide §2.4): derive BOTH orientations with one
    # explode instead of union(e, swap(e)) — the union's two branches
    # each embedded the full upstream edge derivation (no ReusedExchange
    # across the differing final projections: the co-purchase wedge
    # join + DISTINCT appeared twice, 8 parquet scans in the static
    # plan), so materializing sym paid the derivation twice. The
    # explode preserves the input multiset exactly (each input row ->
    # its two orientations, same as the union).
    sym = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    ),
                )
            ).alias("__p")
        )
        .select("__p.src", "__p.dst")
        .persist()
    )
    # r15 optimization (guide §2.4): the round-1 degree aggregate IS
    # the node census — checkpoint it once (id-sized rows) and read
    # all_nodes (its keys) and the round-1 survivors (its >= k filter)
    # from the same relation, instead of the old separate
    # sym.distinct() checkpoint that paid one more full shuffle of the
    # symmetrized relation plus its own blocking job. Checkpointing
    # also materializes sym's cache in the same job. Interleaved
    # min-of-3 at sf0.1 for the combined restructure: 6.41 -> 4.79 s,
    # outputs frame-equal (SHUFFLE_HASH hints on the semi-joins and a
    # sparser checkpoint cadence both MEASURED slower and were not
    # taken — see OPTIMIZATION_r15.md).
    deg0 = (
        sym.groupBy("src")
        .agg(F.count("*").alias("__deg"))
        .localCheckpoint(eager=True)
    )
    all_nodes = deg0.select(F.col("src").alias("node"))
    cur = sym
    survivors = all_nodes
    for i in range(rounds):
        d_i = (
            deg0
            if i == 0
            else cur.groupBy("src").agg(F.count("*").alias("__deg"))
        )
        survivors = d_i.where(F.col("__deg") >= k).select(
            F.col("src").alias("node")
        )
        cur = cur.join(
            survivors.select(F.col("node").alias("src")), "src", "semi"
        ).join(survivors.select(F.col("node").alias("dst")), "dst", "semi")
        if i < rounds - 1:
            # per-round lineage cut (INTERMEDIATE rounds only): the
            # next round reads this relation TWICE (degree agg +
            # semi-join base), so the uncut plan re-executes every
            # prior round's joins exponentially (the CC lesson); the
            # state is id-pair rows, cheap to pin. The FINAL round's
            # relation is read exactly once (the core_degree
            # aggregate), so its checkpoint bought nothing but one
            # extra materialization job (r14 optimization, guide §5).
            cur = cur.localCheckpoint(eager=True)
        if i == 0 and rounds > 1:
            # ADVICE r13: both sym readers (the deg0 census above, the
            # round-1 semi-joins just checkpointed) are now
            # materialized — unpersist so repeated invocations in one
            # session (bench loops, drifter's 5 iterations) don't pin
            # one copy each for session lifetime. ADVICE r14 guard:
            # when rounds == 1 the final (uncheckpointed) cur still
            # reads sym, so the early unpersist would force the
            # closing degree/survivor actions to recompute the
            # symmetrized relation — keep it pinned instead (no
            # catalog caller uses rounds=1; one lazily-dropped cached
            # copy is the accepted cost of that path).
            sym.unpersist()
    deg = (
        cur.groupBy("src")
        .agg(F.count("*").cast("bigint").alias("core_degree"))
        .select(F.col("src").alias("node"), "core_degree")
    )
    return (
        all_nodes.join(
            survivors.select("node", F.lit(True).alias("in_core")), "node", "left"
        )
        .join(deg, "node", "left")
        .select(
            "node",
            F.coalesce("core_degree", F.lit(0).cast("bigint")).alias(
                "core_degree"
            ),
            F.coalesce("in_core", F.lit(False)).alias("in_core"),
        )
    )


def label_propagation(
    edges: DataFrame,
    steps: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007), the
    DETERMINISTIC variant: every node starts labeled as itself; each
    superstep every node simultaneously adopts the most frequent label
    among its neighbors, ties broken by the smallest label. The
    paper's asynchronous random-order walk is irreproducible by
    design; min-tie synchronous LPA is a pure function of the graph
    (and of ``steps``), which is what an oracle-checked pipeline
    needs. Complements :func:`~.dedup.connected_components`: CC says
    WHICH nodes touch, LPA says which nodes cluster densely.

    ``edges`` is an undirected edge list given one row per edge in
    either orientation; both directions are derived internally.
    Returns ``(node, label)`` for every node with >= 1 edge after
    ``steps`` supersteps.

    Scale shape: per superstep, ONE edge-sized equi-join against the
    (node, label) frontier, one map-side-combinable (node, label)
    count, one per-node rank window — Pregel as a driver loop with
    2-column state, no driver-side graph. The symmetrized edge
    relation is persisted once and reused every superstep. Lineage
    grows linearly in ``steps``; past ~10 supersteps adopt the CC
    operator's localCheckpoint cadence (typical LPA converges in a
    handful of sweeps; community quality, not convergence, is the
    stopping rule here).
    """
    from pyspark.sql import Window

    if steps < 1:
        raise ValueError(f"need steps >= 1: {steps}")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    # r15: explode-derived symmetrization (same fix as k_core above) —
    # union(e, swap(e)) embedded the upstream edge derivation in both
    # branches, so materializing the persisted sym paid it twice; the
    # explode preserves the input multiset exactly.
    sym = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    ),
                )
            ).alias("__p")
        )
        .select("__p.src", "__p.dst")
        .persist()
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    # r14 optimization note (guide §1.2 — measured, then kept): the
    # row_number window was A/B'd against a min(struct(-c, label))
    # hash aggregate (no sort, map-side partials). The aggregate
    # MEASURED 2.4x SLOWER isolated at sf0.1 (drifter median 9.3 s vs
    # 3.8 s; struct-buffer ObjectHashAggregate constants dominate the
    # narrow sort), so the window stays.
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(steps):
        cnt = (
            sym.join(labels, sym["src"] == labels["node"])
            .select(F.col("dst").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count("*").alias("c"))
        )
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("node", "label")
        )
    return labels
