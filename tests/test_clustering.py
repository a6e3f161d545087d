"""Distributed Lloyd k-means vs an exact-arithmetic Python reference.

The reference replicates the operator's arithmetic bit-for-bit:
scaled-integer distances (per-dim floor(d^2*1e12+0.5), order-free int
sums), first-occurrence argmin tiebreak, and scaled-integer centroid
means — so the comparison is exact equality, not tolerance.
Determinism under repartitioning, Lloyd's monotone inertia, and the
Arrow-kernel/expression interchangeability are pinned separately. The
single-step portable twin is the hash-green driver row
(kmeans_portable_embeddings); a multi-iteration r8 entry would be
rows-only with this exact twin (iterative — same pattern as BPE
learning / HLL / GK).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lichess_db_spark.io import load_table
from lichess_db_spark.operators.clustering import (
    assign_clusters,
    init_centroids,
    lloyd_kmeans,
)

from .conftest import SF_SMALL

SCALE = 1e12


def _ref_assign(vecs, cents):
    # scaled-int distances, exactly as _sq_dist_scaled computes them:
    # per-dim floor(d^2 * 1e12 + 0.5) int terms (HALF_UP == floor(x+.5)
    # for non-negative values), order-free integer sum
    import math

    out = []
    for v in vecs:
        dists = []
        for c in cents:
            acc = 0
            for a, b in zip(v, c):
                d = float(a) - b
                acc += int(math.floor(d * d * SCALE + 0.5))
            dists.append(acc)
        m = min(dists)
        out.append((dists.index(m), m / SCALE))
    return out


def _ref_lloyd(ids, vecs, cents, n_iter):
    cents = [list(c) for c in cents]
    inertia = []
    d = len(vecs[0])
    for _ in range(n_iter):
        lab = _ref_assign(vecs, cents)
        inertia.append(sum(m for _, m in lab))
        sums = {}
        for (cl, _), v in zip(lab, vecs):
            s, n = sums.setdefault(cl, ([0] * d, 0))
            for i, x in enumerate(v):
                s[i] += round(float(x) * SCALE)
            sums[cl] = (s, n + 1)
        for cl, (s, n) in sums.items():
            cents[cl] = [(si / SCALE) / n for si in s]
    return cents, [c for c, _ in _ref_assign(vecs, cents)], inertia


def test_kmeans_matches_exact_reference(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    vecs = [r["embedding"] for r in rows]
    cents0 = init_centroids(emb, 4)
    want_cents, want_lab, want_inertia = _ref_lloyd(ids, vecs, cents0, 3)

    assigned, got_cents, got_inertia = lloyd_kmeans(emb, 4, 3)
    assert got_cents == want_cents  # exact: scaled-int means
    got_lab = {
        r["vec_id"]: r["cluster"] for r in assigned.collect()
    }
    assert [got_lab[i] for i in ids] == want_lab
    # inertia is a diagnostic double sum (order-dependent last bits):
    # compare with tolerance, and require Lloyd's monotone descent
    assert len(got_inertia) == 3
    for g, w in zip(got_inertia, want_inertia):
        assert abs(g - w) <= 1e-6 * max(1.0, abs(w))
    assert all(
        got_inertia[i + 1] <= got_inertia[i] + 1e-9
        for i in range(len(got_inertia) - 1)
    )


def test_kmeans_partitioning_invariant(spark):
    """Scaled-int centroid sums make every iteration's state identical
    under any partitioning — the property float means do not have."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    _, c1, _ = lloyd_kmeans(emb, 3, 2)
    _, c2, _ = lloyd_kmeans(emb.repartition(13), 3, 2)
    assert c1 == c2


def test_assign_is_map_only(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    cents = init_centroids(emb, 4)
    a = assign_clusters(emb, cents)
    plan = a._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        a._jdf.queryExecution(), "simple"
    )
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_kmeans_validation(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    with pytest.raises(ValueError, match="positive"):
        lloyd_kmeans(emb, 0, 1)
    with pytest.raises(ValueError, match="exceeds corpus"):
        init_centroids(emb.limit(2), 5)


def test_cluster_balanced_sampling_composition(spark):
    """r8-staged composition: priority_sample_grouped over learned
    k-means clusters — equal-depth weighted samples per semantic
    cluster, the cluster-balanced curation draw. Verifies the two
    operators compose: every cluster contributes exactly min(k,
    cluster_size) docs and the draw is deterministic."""
    from lichess_db_spark.operators.sampling import priority_sample_grouped

    emb = load_table(spark, SF_SMALL, "embeddings")
    assigned, _, _ = lloyd_kmeans(emb, 3, 2)
    weighted = assigned.select(
        "vec_id", "cluster", (F.lit(1.0) + F.col("dist2")).alias("w")
    )
    s1 = priority_sample_grouped(
        weighted, k=10, group_col="cluster", weight_col="w", id_col="vec_id"
    )
    sizes = {
        r["cluster"]: r["n"]
        for r in s1.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    }
    cluster_sizes = {
        r["cluster"]: r["n"]
        for r in assigned.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {c: min(10, n) for c, n in cluster_sizes.items()}
    # determinism: same draw under a different partitioning
    s2 = priority_sample_grouped(
        weighted.repartition(7), k=10, group_col="cluster", weight_col="w",
        id_col="vec_id",
    )
    assert sorted(r["vec_id"] for r in s1.collect()) == sorted(
        r["vec_id"] for r in s2.collect()
    )


def test_arrow_assignment_bit_identical_and_faster_shape(spark):
    """The Arrow assignment kernel must agree with the scaled-int
    expression path on EVERY vector (same argmin, including ties —
    np.argmin and array_position both take the first minimum)."""
    from lichess_db_spark.operators.clustering import (
        assign_clusters_arrow,
        portable_init_centroids,
        _sq_dist_scaled,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    cents = portable_init_centroids(emb, 6)
    dists = F.array(*[_sq_dist_scaled(F.col("embedding"), c) for c in cents])
    expr = {
        r["vec_id"]: r["c"]
        for r in emb.select(
            "vec_id",
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias("c"),
        ).collect()
    }
    arrow = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters_arrow(emb, cents).collect()
    }
    assert arrow == expr
    # exact tie: duplicated centroid -> both paths must pick the
    # LOWER cluster index for vectors nearest the duplicated centroid
    dup = [cents[0], cents[0], cents[1]]
    d2 = F.array(*[_sq_dist_scaled(F.col("embedding"), c) for c in dup])
    e2 = {
        r["vec_id"]: r["c"]
        for r in emb.select(
            "vec_id",
            (F.array_position(d2, F.array_min(d2)) - 1).cast("int").alias("c"),
        ).collect()
    }
    a2 = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters_arrow(emb, dup).collect()
    }
    assert a2 == e2
    assert 1 not in set(a2.values())  # index 1 never wins a tie with 0


def test_lloyd_arrow_path_bit_identical(spark):
    """use_arrow=True is an implementation toggle, not a semantics
    change: centroids, assignments, and inertia match the expression
    path exactly across iterations."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    a_assigned, a_cents, a_inertia = lloyd_kmeans(emb, 3, 2, use_arrow=False)
    b_assigned, b_cents, b_inertia = lloyd_kmeans(emb, 3, 2, use_arrow=True)
    assert a_cents == b_cents
    assert a_inertia == b_inertia
    a_map = {r["vec_id"]: (r["cluster"], r["dist2"]) for r in a_assigned.collect()}
    b_map = {r["vec_id"]: (r["cluster"], r["dist2"]) for r in b_assigned.collect()}
    assert a_map == b_map


def test_gramian_arrow_bit_identical_to_expression(spark):
    """gramian_exact_arrow must reproduce the expression-path Gramian
    (posexplode x posexplode -> ROUND(x_i*x_j*1e12) bigint sums)
    cell-for-cell — the contract that lets embedding_top_pc ride the
    kernel while its oracle stays hash-green. Checked on the fixture
    corpus AND an engineered signed batch that exercises the
    away-from-zero rounding on negative products and chunk boundaries
    (chunk_rows smaller than the batch)."""
    from pyspark.sql import functions as F

    from lichess_db_spark.io import load_table
    from lichess_db_spark.operators.clustering import gramian_exact_arrow

    from .conftest import SF_SMALL

    def expr_gram(emb):
        pairs = emb.select(
            F.posexplode("embedding").alias("i0", "xi"), "embedding"
        ).select("i0", "xi", F.posexplode("embedding").alias("j0", "xj"))
        return pairs.groupBy(
            (F.col("i0") + 1).alias("i"), (F.col("j0") + 1).alias("j")
        ).agg(
            F.sum(
                F.round(
                    F.col("xi").cast("double")
                    * F.col("xj").cast("double")
                    * F.lit(1e12)
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("gv")
        )

    emb = load_table(spark, SF_SMALL, "embeddings")
    want = {(r.i, r.j): r.gv for r in expr_gram(emb).collect()}
    got = {(r.i, r.j): r.gv for r in gramian_exact_arrow(emb).collect()}
    assert got == want and len(got) == 64 * 64

    # signed + tie-ish values, chunk boundary crossing (5 rows, chunk 2)
    rows = [
        (i, [((-1) ** (i + d)) * (0.25 + 0.5 * ((i * 7 + d) % 9) / 9.0)
             for d in range(64)])
        for i in range(5)
    ]
    se = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    want2 = {(r.i, r.j): r.gv for r in expr_gram(se).collect()}
    got2 = {
        (r.i, r.j): r.gv
        for r in gramian_exact_arrow(se, chunk_rows=2).collect()
    }
    assert got2 == want2
    assert any(v < 0 for v in want2.values())  # negatives exercised

    import pytest as _pytest

    with _pytest.raises(Exception, match="clean"):
        bad = spark.createDataFrame(
            [(0, [1.0] * 8)], "vec_id long, embedding array<double>"
        )
        gramian_exact_arrow(bad).collect()
