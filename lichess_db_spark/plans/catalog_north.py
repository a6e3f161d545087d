"""North-star extension queries (SURVEY.md §2.10, BASELINE.json):
dedup, similarity search, text analysis, multimodal plumbing,
event-time windows, as-of join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import dedup as dd
from ..operators.sampling import PRIORITY_KEY_SQL
from ..operators.similarity import brute_force_topk, lsh_bucket_topk
from ..functions import text as T
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# deduplication
# --------------------------------------------------------------------------


@register(
    "dedup_exact_groups",
    """
    SELECT md5(text) AS digest, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    "Exact dedup: group on a content digest, keep min-id. The shuffle "
    "moves 16-byte digests, not documents — the only sane exact-dedup "
    "shape at 100 TB.",
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.exact_dedup_groups(_t(spark, sf_dir, "documents"))


@register(
    "dedup_stats",
    """
    SELECT COUNT(*) AS n_rows, CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique
    FROM documents
    """,
    "Dedup summary: corpus rows vs distinct contents.",
)
def dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
    )


@register(
    "dedup_ngram_jaccard",
    """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, ts[g.i] || ' ' || ts[g.i+1] || ' ' || ts[g.i+2]
               || ' ' || ts[g.i+3] || ' ' || ts[g.i+4] AS shingle
        FROM toks, range(1, 100001) AS g(i)
        WHERE g.i <= len(ts) - 4
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.2
    """,
    "Near-dup via exact 5-gram-shingle Jaccard (inverted-index self-join). "
    "Oracle-checkable (no engine-specific hashing). Quadratic worst case: "
    "at scale this is the *verifier* run on MinHash-LSH candidates only "
    "(dedup_minhash_pairs).",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), shingle_n=5, threshold=0.2
    )


@register(
    "dedup_ngram_jaccard_capped",
    """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    sh0 AS (
        SELECT DISTINCT doc_id, ts[g.i] || ' ' || ts[g.i+1] || ' ' || ts[g.i+2]
               || ' ' || ts[g.i+3] || ' ' || ts[g.i+4] AS shingle
        FROM toks, range(1, 100001) AS g(i)
        WHERE g.i <= len(ts) - 4
    ),
    freq_ok AS (
        SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= 20
    ),
    sh AS (SELECT sh0.* FROM sh0 JOIN freq_ok USING (shingle)),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.2
    """,
    "Web-scale mitigation for hot shingles: posting lists longer than "
    "20 docs (site boilerplate, license headers) are dropped BEFORE "
    "the pairing self-join, killing the d^2 blowup; Jaccard is then "
    "computed over the capped shingle universe on both sides "
    "(consistent estimate). Oracle applies the identical cap in SQL, "
    "so the approximation itself is hash-verified.",
)
def dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"),
        shingle_n=5,
        threshold=0.2,
        max_shingle_doc_freq=20,
    )


_CLUSTER_ORACLE = """
WITH RECURSIVE toks AS (
    SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
sh AS (
    SELECT DISTINCT doc_id, ts[g.i] || ' ' || ts[g.i+1] || ' ' || ts[g.i+2]
           || ' ' || ts[g.i+3] || ' ' || ts[g.i+4] AS shingle
    FROM toks, range(1, 100001) AS g(i)
    WHERE g.i <= len(ts) - 4
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
pairs AS (
    SELECT doc_a, doc_b FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.2
),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION SELECT doc_b, doc_a FROM pairs
),
walk AS (
    SELECT src AS node, src AS label FROM edges
    UNION
    SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
)
SELECT node AS doc_id, MIN(label) AS cluster_id FROM walk GROUP BY node
"""


@register(
    "dedup_cluster_assignment",
    _CLUSTER_ORACLE,
    "Connected-components clustering of near-dup pairs: doc -> "
    "canonical cluster id (min reachable doc_id). Spark side is "
    "iterative min-label propagation (one join+groupBy per round, "
    "O(diameter) rounds); oracle is a recursive CTE over the same "
    "exact-Jaccard edge set. This is the keep-one-per-cluster decision "
    "step of a production dedup pipeline.",
)
def dedup_cluster_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dd.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), shingle_n=5, threshold=0.2
    )
    return dd.connected_components(pairs)


_KEEP_REPS_ORACLE = _CLUSTER_ORACLE.replace(
    "SELECT node AS doc_id, MIN(label) AS cluster_id FROM walk GROUP BY node",
    """, assign AS (
    SELECT node AS doc_id, MIN(label) AS cluster_id FROM walk GROUP BY node
)
SELECT d.doc_id FROM documents d
LEFT JOIN assign a ON a.doc_id = d.doc_id
WHERE a.doc_id IS NULL OR a.cluster_id = a.doc_id""",
)


@register(
    "dedup_keep_representatives",
    _KEEP_REPS_ORACLE,
    "The dedup decision APPLIED — the operator a corpus pipeline "
    "actually runs: every document survives except non-representative "
    "cluster members (representative = min doc_id per near-dup "
    "cluster). Spark side: cluster assignment -> anti-join of the "
    "corpus against non-representatives; at 100 TB the anti-join "
    "shuffles only (doc_id) keys, never text.",
)
def dedup_keep_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(docs, shingle_n=5, threshold=0.2)
    labels = dd.connected_components(pairs)
    drop = labels.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return docs.select("doc_id").join(drop, "doc_id", "left_anti")


_SPLIT_LEAKFREE_ORACLE = _CLUSTER_ORACLE.replace(
    "SELECT node AS doc_id, MIN(label) AS cluster_id FROM walk GROUP BY node",
    """, assign AS (
    SELECT node AS doc_id, MIN(label) AS cluster_id FROM walk GROUP BY node
),
alldocs AS (
    SELECT d.doc_id, COALESCE(a.cluster_id, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN assign a ON a.doc_id = d.doc_id
)
SELECT doc_id, cluster_id,
       CASE WHEN b < 80 THEN 'train'
            WHEN b < 90 THEN 'val'
            ELSE 'test' END AS split
FROM (
    SELECT *,
           ('0x' || substr(md5(CAST(cluster_id AS VARCHAR) || '-split'),
                           1, 8))::BIGINT % 100 AS b
    FROM alldocs
)""",
)


@register(
    "dedup_split_leakfree",
    _SPLIT_LEAKFREE_ORACLE,
    "LEAKAGE-FREE train/val/test assignment: the split is a pure "
    "function of the near-dup CLUSTER id, not the doc id — so two "
    "near-duplicate documents can never land on opposite sides of "
    "the train/eval boundary (doc-level hashing leaks: a paraphrase "
    "of a test doc in train is memorization fuel the doc-level "
    "splitter can't see; dataset_split_counts is that doc-level "
    "twin). Composes three verified kits unchanged: the exact-Jaccard "
    "pair graph, connected_components (min-label, the r9 lineage-cut "
    "fix), and dataset_split's md5 percent-buckets applied to "
    "cluster_id (singletons: cluster_id = doc_id, so their behavior "
    "matches the doc-level splitter exactly). Assignment is stable "
    "as the corpus grows AND under recluster-merges that keep the "
    "min-id representative. Scale shape: the CC supersteps dominate; "
    "the split tag itself is map-only. Full oracle (recursive-CTE "
    "closure + the same md5 bucket arithmetic).",
)
def dedup_split_leakfree(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import dataset_split

    docs = _t(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(docs, shingle_n=5, threshold=0.2)
    cc = dd.connected_components(pairs)
    clustered = (
        docs.select("doc_id")
        .join(cc.withColumnRenamed("doc_id", "node"),
              F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id")
        )
    )
    return dataset_split(clustered, id_col="cluster_id").select(
        "doc_id", "cluster_id", "split"
    )


_KEEP_LONGEST_ORACLE = _CLUSTER_ORACLE.replace(
    "SELECT node AS doc_id, MIN(label) AS cluster_id FROM walk GROUP BY node",
    """, assign AS (
    SELECT node AS doc_id, MIN(label) AS cluster_id FROM walk GROUP BY node
),
alldocs AS (
    SELECT d.doc_id, d.n_chars, COALESCE(a.cluster_id, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN assign a ON a.doc_id = d.doc_id
)
SELECT doc_id, cluster_id, n_chars,
       rn = 1 AS keep
FROM (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY cluster_id
                              ORDER BY n_chars DESC, doc_id) AS rn
    FROM alldocs
)""",
)


@register(
    "dedup_keep_best",
    _KEEP_LONGEST_ORACLE,
    "Quality-aware cluster representative: per near-dup cluster keep "
    "the member with the MOST CONTENT (max n_chars, ties broken by "
    "min doc_id) instead of the min-id member — what production "
    "dedup actually ships: near-dup groups usually contain one full "
    "document plus truncated/boilerplate-stripped copies, and keep-"
    "min-id throws the full one away whenever a fragment has the "
    "smaller id (dedup_keep_representatives is that min-id twin). "
    "Same cluster relation (exact-Jaccard pairs -> "
    "connected_components), then ONE cluster-keyed row_number window "
    "over (n_chars DESC, doc_id) — the ranking column is free to be "
    "any deterministic quality score; n_chars makes the oracle "
    "exact-integer. Scale shape: CC supersteps + one |V|-row window "
    "shuffle. Full oracle.",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(docs, shingle_n=5, threshold=0.2)
    cc = dd.connected_components(pairs)
    alldocs = (
        docs.select("doc_id", "n_chars")
        .join(cc.withColumnRenamed("doc_id", "node"),
              F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id",
            "n_chars",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return alldocs.withColumn("rn", F.row_number().over(w)).select(
        "doc_id", "cluster_id", "n_chars", (F.col("rn") == 1).alias("keep")
    )


@register(
    "dedup_minhash_pairs",
    None,  # xxhash64-based signatures: not reproducible in the oracle
    "MinHash(128 perms)+LSH(32 bands x 4 rows) near-dup candidates, "
    "verified by exact shingle Jaccard >= 0.2. Shuffle volume is "
    "O(docs x bands) — the 100 TB-scale path; signature computation is "
    "one codegen'd array expression, no UDF; hot buckets are capped at "
    "256 members (d² bomb guard — never binds on the test corpora, "
    "whose buckets max out at 4). Rows-only check (xxhash64 has no "
    "DuckDB twin); tests assert it finds the same pairs as "
    "dedup_ngram_jaccard at high thresholds.",
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.minhash_dedup_pairs(
        _t(spark, sf_dir, "documents"),
        num_perms=128,
        shingle_n=5,
        bands=32,
        threshold=0.2,
        max_bucket_size=dd.DEFAULT_MAX_BUCKET_SIZE,
    )


# shared oracle CTE prefix: shingles -> portable md5 minhash signatures
# -> banded LSH candidate pairs (+ per-doc shingle-set sizes). Consumed
# verbatim by dedup_minhash_pairs_portable AND lsh_candidate_recall so
# the candidate definition can never drift between the pipeline and its
# evaluation harness.
# the prefix reads from a caller-defined `mh_corpus(doc_id, text)` CTE
# so the evaluation harness can grade synthetic near-dups through the
# SAME candidate definition the production twin verifies on raw docs
_MINHASH_CAND_CTES = """toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM mh_corpus
        WHERE doc_id IS NOT NULL
    ),
    sh AS (
        SELECT DISTINCT doc_id, ts[g.i] || ' ' || ts[g.i+1] || ' ' || ts[g.i+2]
               || ' ' || ts[g.i+3] || ' ' || ts[g.i+4] AS shingle
        FROM toks, range(1, 100001) AS g(i)
        WHERE g.i <= len(ts) - 4
    ),
    base AS (
        SELECT doc_id, shingle,
               (('0x' || substr(md5(shingle), 1, 8))::BIGINT) % 2147483647 AS h
        FROM sh
    ),
    perms AS (
        SELECT i,
               (i * 2654435761) % 2147483646 + 1 AS a,
               (i * 1013904223 + 12345) % 2147483647 AS b
        FROM range(0, 128) AS r(i)
    ),
    sigs AS (
        SELECT doc_id, p.i, MIN((p.a * base.h + p.b) % 2147483647) AS m
        FROM base CROSS JOIN perms p
        GROUP BY doc_id, p.i
    ),
    banded AS (
        SELECT doc_id, (i // 4) AS band_idx,
               string_agg(m::VARCHAR, '-' ORDER BY i) AS band_key
        FROM sigs GROUP BY doc_id, (i // 4)
    ),
    bucket_sizes AS (
        SELECT band_idx, band_key, COUNT(*) AS n
        FROM banded GROUP BY band_idx, band_key
    ),
    cands AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM banded x
        JOIN banded y ON x.band_idx = y.band_idx AND x.band_key = y.band_key
             AND x.doc_id < y.doc_id
        JOIN bucket_sizes s ON s.band_idx = x.band_idx AND s.band_key = x.band_key
        WHERE s.n <= 256
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id)"""


@register(
    "dedup_minhash_pairs_portable",
    f"""
    WITH mh_corpus AS (SELECT doc_id, text FROM documents),
    {_MINHASH_CAND_CTES},
    inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
        FROM cands c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b2 ON b2.doc_id = c.doc_b AND b2.shingle = a.shingle
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter) >= 0.2
    """,
    "Hash-checked MinHash+LSH twin: base hash = first 8 md5 hex digits, "
    "affine coefficients derived arithmetically — every stage "
    "(signatures, banding, bucket cap, Jaccard verify) reproduced in "
    "DuckDB SQL, so the FULL pipeline is value-verified, not rows-only. "
    "The xxhash64 production path (dedup_minhash_pairs) keeps the "
    "cheaper JVM hash; band bucketing needs no cross-engine parity "
    "because pairs emerge from signature equality alone.",
)
def dedup_minhash_pairs_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.minhash_dedup_pairs(
        _t(spark, sf_dir, "documents"),
        num_perms=128,
        shingle_n=5,
        bands=32,
        threshold=0.2,
        max_bucket_size=dd.DEFAULT_MAX_BUCKET_SIZE,
        portable=True,
    )


@register(
    "dedup_simhash",
    None,  # xxhash64-based
    "SimHash-64 signature groups (identical-signature docs). Cheapest "
    "near-dup tier; rows-only check — the md5 twin below is the "
    "hash-checked witness for the algorithm.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = dd.simhash64(_t(spark, sf_dir, "documents"))
    return sigs.select("doc_id", "simhash")


@register(
    "dedup_simhash_portable",
    """
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
        FROM documents WHERE doc_id IS NOT NULL
    ),
    h AS (
        SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM toks
    ),
    votes AS (
        SELECT doc_id, b.i,
               SUM(CASE WHEN (h >> CAST(b.i AS INT)) & 1 = 1
                        THEN 1 ELSE -1 END) AS v
        FROM h, range(0, 60) AS b(i)
        GROUP BY doc_id, b.i
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << CAST(i AS INT))
                         ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
    """,
    "Hash-checked SimHash twin: 60-bit signature from the first 15 md5 "
    "hex digits per token — bit-vote aggregation reproduced exactly in "
    "DuckDB, same portability pattern as dedup_minhash_pairs_portable. "
    "Signature build is one codegen lambda pass per doc, no shuffle "
    "until the (absent here) group stage.",
)
def dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = dd.simhash_portable(_t(spark, sf_dir, "documents"))
    return sigs.select("doc_id", "simhash")


# --------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------

_KNN_ORACLE = """
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           q.embedding AS qe, c.embedding AS ce
    FROM embeddings c, q WHERE c.vec_id != q.vec_id
),
dots AS (
    SELECT query_id, neighbor_id,
           CAST(SUM(CAST(ROUND(CAST(qe[g.i] AS DOUBLE) * CAST(ce[g.i] AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT) AS dot_i,
           CAST(SUM(CAST(ROUND(CAST(qe[g.i] AS DOUBLE) * CAST(qe[g.i] AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT) AS qq_i,
           CAST(SUM(CAST(ROUND(CAST(ce[g.i] AS DOUBLE) * CAST(ce[g.i] AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT) AS cc_i
    FROM pairs, generate_series(1, 64) AS g(i)
    GROUP BY query_id, neighbor_id
),
scored AS (
    SELECT query_id, neighbor_id,
           ROUND((dot_i / 1e12) / (sqrt(qq_i / 1e12) * sqrt(cc_i / 1e12)), 3) AS score
    FROM dots
)
SELECT query_id, neighbor_id, score, CAST(rank AS INT) AS rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, neighbor_id) AS rank
    FROM scored
) WHERE rank <= 5
"""


@register(
    "knn_bruteforce_cosine",
    _KNN_ORACLE,
    "Exact cosine top-5 for 10 query vectors: broadcast queries x corpus, "
    "array-expression cosine (scaled-int exact accumulation -> engine-"
    "portable), per-query rank window. The baseline/verifier for ANN.",
)
def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, emb.where(F.col("vec_id") < 10), k=5)


@register(
    "knn_ivf_cosine",
    None,  # approximate (k-means assignment); recall tested vs brute force
    "ANN top-5 via IVF: sample-trained seeded k-means quantizer (16 lists), "
    "probe the 4 nearest lists per query, exact re-rank on candidates. "
    "The partition-the-corpus scale path complementing hyperplane LSH; "
    "at 100 TB the corpus is bucketed by list id so each query scans "
    "n_probe/n_lists of the data.",
)
def knn_ivf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.where(F.col("vec_id") < 10), k=5)


@register(
    "knn_pq_cosine",
    None,  # quantized scores; recall tested vs brute force
    "ANN top-5 via product quantization: 16 sub-space codebooks (16 "
    "centroids each, sample-trained seeded k-means), corpus encoded as "
    "16 one-byte codes + its norm (a 64-dim float vector compresses "
    "256B -> 24B), queries scored by ADC lookup-table sums, then an "
    "exact-cosine rerank over the 4x-over-fetched candidates (FAISS "
    "IVFPQ+refine) — the memory-bound-corpus path where the whole "
    "index fits in RAM at 100 TB. Encode/score are constant-folded "
    "array expressions.",
)
def knn_pq_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    return pq_topk(emb, emb.where(F.col("vec_id") < 10), k=5)


@register(
    "knn_lsh_cosine",
    None,  # approximate; recall asserted against brute force in tests
    "ANN top-5 via random-hyperplane LSH (4 tables x 8 planes) + exact "
    "re-rank on bucket candidates. At 100 TB the bucket equi-join "
    "replaces the Q x N scan; hyperplanes are derived deterministically "
    "from integer mixing (no RNG state).",
)
def knn_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return lsh_bucket_topk(emb, emb.where(F.col("vec_id") < 10), k=5)


@register(
    "knn_lsh_cosine_portable",
    f"""
    WITH vcorpus AS (
        -- shared kit validity gate (operators/dedup.
        -- filter_valid_vectors + its single-source SQL twin
        -- VECTOR_VALIDITY_WHERE_SQL, r13 hardening): non-NULL 64-dim,
        -- no NULL/NaN/|x|>=32 element, non-zero quantized norm —
        -- dirty vectors degrade to exclusion in BOTH engines
        SELECT vec_id, embedding FROM embeddings
        {dd.VECTOR_VALIDITY_WHERE_SQL}
    ),
    planes AS (
        SELECT t.t AS t, p.p AS p, d.d AS d,
               (('0x' || substr(md5(CAST(t.t AS VARCHAR) || '-' ||
                    CAST(p.p AS VARCHAR) || '-' || CAST(d.d AS VARCHAR)),
                    1, 8))::BIGINT % 2000000) - 1000000 AS c
        FROM range(0, 8) t(t), range(0, 4) p(p), range(0, 64) d(d)
    ),
    v AS (
        SELECT vec_id, g.i - 1 AS d,
               CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * 1048576) AS BIGINT) AS x
        FROM vcorpus, range(1, 65) AS g(i)
    ),
    dots AS (
        SELECT v.vec_id, pl.t, pl.p, SUM(v.x * pl.c) AS dot
        FROM v JOIN planes pl ON pl.d = v.d
        GROUP BY v.vec_id, pl.t, pl.p
    ),
    buckets AS (
        SELECT vec_id, t,
               SUM(CASE WHEN dot >= 0 THEN (1::BIGINT << p) ELSE 0 END) AS bucket
        FROM dots GROUP BY vec_id, t
    ),
    cands AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM buckets q
        JOIN buckets c ON q.t = c.t AND q.bucket = c.bucket
             AND c.vec_id != q.vec_id
        WHERE q.vec_id < 10
    ),
    norms AS (
        SELECT vec_id, SUM(x * x) AS q FROM v GROUP BY vec_id
    ),
    cdots AS (
        SELECT c.query_id, c.neighbor_id, SUM(va.x * vb.x) AS d
        FROM cands c
        JOIN v va ON va.vec_id = c.query_id
        JOIN v vb ON vb.vec_id = c.neighbor_id AND vb.d = va.d
        GROUP BY c.query_id, c.neighbor_id
    ),
    scored AS (
        SELECT cd.query_id, cd.neighbor_id,
               CAST(cd.d AS DOUBLE)
                 / (sqrt(CAST(nq.q AS DOUBLE)) * sqrt(CAST(nn.q AS DOUBLE))) AS score
        FROM cdots cd
        JOIN norms nq ON nq.vec_id = cd.query_id
        JOIN norms nn ON nn.vec_id = cd.neighbor_id
    )
    SELECT query_id, neighbor_id, score, CAST(rank AS INT) AS rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
    "HASH-CHECKED ANN: hyperplane-LSH top-5 whose bucket assignment "
    "and candidate cosines are bit-reproduced in DuckDB (md5 integer "
    "planes, floor(x*2^20) quantization, int64 einsum scoring) — the "
    "approximation structure itself is oracle-verified, upgrading the "
    "ANN family from rows-only checks. Same plan shape as "
    "knn_lsh_cosine: broadcast query buckets, id-only candidate join, "
    "rank window over candidates only.",
)
def knn_lsh_cosine_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import lsh_topk_portable

    emb = _t(spark, sf_dir, "embeddings")
    return lsh_topk_portable(emb, emb.where(F.col("vec_id") < 10), k=5)


# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------


@register(
    "text_stats",
    """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*) AS type_token_ratio,
           CAST(SUM(LENGTH(tok)) AS DOUBLE) / COUNT(*) AS mean_token_len
    FROM tok GROUP BY doc_id
    """,
    "Per-document token stats: count, type-token ratio (repetition "
    "signal), mean token length. Spark side is pure array expressions — "
    "no explode, no shuffle: each doc computes its stats in place.",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # pre-project the token array: five references below share ONE
    # materialization per row (CollapseProject keeps non-cheap
    # multi-referenced aliases as their own Project) instead of five
    # re-splits — the HOF re-evaluation lesson (ROADMAP)
    pre = d.select("doc_id", F.split("text", " ").alias("__ts"))
    ts = F.col("__ts")
    total_len = F.aggregate(ts, F.lit(0), lambda acc, t: acc + F.length(t))
    return pre.select(
        "doc_id",
        F.size(ts).cast("bigint").alias("n_tokens"),
        (F.size(F.array_distinct(ts)).cast("double") / F.size(ts)).alias("type_token_ratio"),
        (total_len.cast("double") / F.size(ts)).alias("mean_token_len"),
    )


@register(
    "text_quality_score",
    """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    stats AS (
        SELECT t.doc_id,
               LENGTH(MIN(d.text)) AS n_chars_t,
               COUNT(*) AS n_tok,
               CAST(COUNT(DISTINCT t.tok) AS DOUBLE) / COUNT(*) AS ttr,
               CAST(COUNT(*) FILTER (WHERE t.tok IN ('the','a','of','and','to','in','is')) AS DOUBLE)
                   / COUNT(*) AS sw
        FROM tok t JOIN documents d USING (doc_id) GROUP BY t.doc_id
    )
    SELECT doc_id,
           (LEAST(n_chars_t / 500.0, 1.0) + ttr
            + GREATEST(1.0 - ABS(sw - 0.4) / 0.4, 0.0)) / 3.0 AS quality
    FROM stats
    """,
    "Composite [0,1] quality score: length saturation + type-token ratio "
    "+ stopword-density window — the cheap pre-training quality gate. "
    "All ratios are exact-integer divisions -> engine-portable.",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # pre-projected token array shared by the TTR and stopword
    # components (one split per row, not three — ROADMAP HOF lesson)
    pre = d.select("doc_id", "text", F.split("text", " ").alias("__ts"))
    return pre.select(
        "doc_id", T.quality_score("text", ts=F.col("__ts")).alias("quality")
    )


_LANG_LISTS_SQL = {
    "en": "['the','a','of','and','to','in','is']",
    "de": "['der','die','das','und','ist','ein']",
    "fr": "['le','la','les','et','est','un']",
    "es": "['el','la','los','y','es','un']",
}

_LANG_ORACLE = f"""
WITH counts AS (
    SELECT doc_id, lang,
           len(list_filter(string_split(lower(text), ' '),
               x -> list_contains({_LANG_LISTS_SQL["en"]}, x))) AS n_en,
           len(list_filter(string_split(lower(text), ' '),
               x -> list_contains({_LANG_LISTS_SQL["de"]}, x))) AS n_de,
           len(list_filter(string_split(lower(text), ' '),
               x -> list_contains({_LANG_LISTS_SQL["fr"]}, x))) AS n_fr,
           len(list_filter(string_split(lower(text), ' '),
               x -> list_contains({_LANG_LISTS_SQL["es"]}, x))) AS n_es
    FROM documents
),
guessed AS (
    SELECT doc_id, lang,
           CASE WHEN GREATEST(n_en, n_de, n_fr, n_es) = 0 THEN 'und'
                WHEN n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
                WHEN n_de >= n_fr AND n_de >= n_es THEN 'de'
                WHEN n_fr >= n_es THEN 'fr'
                ELSE 'es' END AS guess
    FROM counts
)
SELECT lang, guess, COUNT(*) AS n FROM guessed GROUP BY lang, guess
"""


@register(
    "text_lang_id",
    _LANG_ORACLE,
    "Language-ID heuristic: stopword-list vote (first-max-wins) compared "
    "against the labeled lang — output is the confusion matrix. Pure "
    "array ops, JVM-side.",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # pre-project the lowercased token array: all 4 vote counts share
    # one materialization (CollapseProject multi-reference rule)
    pre = d.select("lang", F.split(F.lower("text"), " ").alias("__lts"))
    return (
        pre.select("lang", T.lang_guess("text", ts=F.col("__lts")).alias("guess"))
        .groupBy("lang", "guess")
        .agg(F.count("*").alias("n"))
    )


@register(
    "text_token_count_regex",
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INT) AS n_word_tokens
    FROM documents
    """,
    "BPE-ish token counting: regex word/number pieces per document "
    "(whitespace twin lives in text_stats).",
)
def text_token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", T.regex_token_count("text", "[a-z]+|[0-9]+").cast("int").alias("n_word_tokens")
    )


@register(
    "text_fingerprint",
    """
    SELECT doc_id, substr(md5(lower(trim(text))), 1, 16) AS fingerprint
    FROM documents
    """,
    "Document fingerprinting: md5 of normalized text (md5 is engine-"
    "portable, unlike xxhash64 -> oracle-checkable).",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", T.md5_fingerprint("text").alias("fingerprint"))


@register(
    "text_vocab_stats",
    """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    )
    SELECT token,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq,
           COUNT(*) AS total_count
    FROM tok GROUP BY token
    """,
    "Vocabulary / inverted-index stats (the IDF building block of a "
    "training-data pipeline): explode tokens -> per-token document "
    "frequency and corpus count. One shuffle keyed by token.",
)
def text_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    return tok.groupBy("token").agg(
        F.countDistinct("doc_id").alias("doc_freq"),
        F.count("*").alias("total_count"),
    )


@register(
    "text_repetition_stats",
    """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    g2 AS (
        SELECT doc_id, COUNT(*) AS n2,
               COUNT(DISTINCT ts[g.i] || ' ' || ts[g.i+1]) AS d2
        FROM toks, range(1, 100001) AS g(i)
        WHERE g.i <= len(ts) - 1
        GROUP BY doc_id
    ),
    g5 AS (
        SELECT doc_id, COUNT(*) AS n5,
               COUNT(DISTINCT ts[g.i] || ' ' || ts[g.i+1] || ' ' || ts[g.i+2]
                     || ' ' || ts[g.i+3] || ' ' || ts[g.i+4]) AS d5
        FROM toks, range(1, 100001) AS g(i)
        WHERE g.i <= len(ts) - 4
        GROUP BY doc_id
    ),
    words AS (
        SELECT doc_id, unnest(ts) AS w FROM toks
    ),
    wc AS (
        SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w
    ),
    hap AS (
        SELECT doc_id,
               COUNT(*) FILTER (WHERE c = 1) AS hapax,
               COUNT(*) AS uniq
        FROM wc GROUP BY doc_id
    )
    SELECT t.doc_id,
           1 - CAST(g2.d2 AS DOUBLE) / g2.n2 AS dup_2gram_frac,
           1 - CAST(g5.d5 AS DOUBLE) / g5.n5 AS dup_5gram_frac,
           CAST(hap.hapax AS DOUBLE) / hap.uniq AS hapax_ratio
    FROM toks t
    LEFT JOIN g2 ON g2.doc_id = t.doc_id
    LEFT JOIN g5 ON g5.doc_id = t.doc_id
    LEFT JOIN hap ON hap.doc_id = t.doc_id
    """,
    "Repetition quality filters (C4/Gopher family): duplicate word-2gram "
    "and word-5gram fractions plus hapax ratio (once-occurring words / "
    "vocabulary) per document. Spark side is pure array expressions — "
    "map-only, ZERO shuffle: each doc computes its own stats in place, "
    "where the oracle needs three grouped subqueries. Raw IEEE "
    "divisions, no rounding (cross-engine bit-identical).",
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import word_shingles

    d = _t(spark, sf_dir, "documents")

    # Pre-project the token/shingle arrays into named columns: each is
    # referenced several times downstream, and CollapseProject keeps a
    # multi-referenced non-cheap alias as its own Project inside the
    # same codegen stage — so every array materializes ONCE per row
    # instead of once per reference (measured 1.8x at sf0.1 on top of
    # the word_shingles zip_with rewrite).
    pre = d.select(
        "doc_id",
        F.split("text", " ").alias("__ts"),
        word_shingles("text", 2).alias("__g2"),
        word_shingles("text", 5).alias("__g5"),
    )

    def dup_frac(gc: str) -> F.Column:
        g = F.col(gc)
        return F.when(
            F.size(g) > 0,
            F.lit(1) - F.size(F.array_distinct(g)).cast("double") / F.size(g),
        )

    # hapax via sorted-neighbor compare: a token occurs once iff it
    # differs from both neighbors in the sorted array. The naive
    # filter-inside-filter shape is O(uniq x tokens) AND re-evaluates
    # the split per lambda element (the HOF re-evaluation trap — see
    # functions/text.word_shingles); this is O(n log n) with every
    # lambda touching lambda variables only.
    uniq = F.array_distinct("__ts")
    srt = F.array_sort("__ts")
    m = F.size(srt)
    nxt = F.concat(F.slice(srt, 2, m - 1), F.array(F.lit(None).cast("string")))
    eq_next = F.zip_with(srt, nxt, lambda a, b: a.eqNullSafe(b))
    eq_prev = F.concat(F.array(F.lit(False)), F.slice(eq_next, 1, m - 1))
    dup_flags = F.zip_with(eq_next, eq_prev, lambda a, b: a | b)
    hapax = F.size(F.filter(dup_flags, lambda x: ~x))
    return pre.select(
        "doc_id",
        dup_frac("__g2").alias("dup_2gram_frac"),
        dup_frac("__g5").alias("dup_5gram_frac"),
        F.when(
            F.size(uniq) > 0, hapax.cast("double") / F.size(uniq)
        ).alias("hapax_ratio"),
    )


@register(
    "split_train_test",
    """
    WITH tagged AS (
        SELECT doc_id, lang,
               CASE WHEN (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)
                         % 100 < 90
                    THEN 'train' ELSE 'test' END AS split
        FROM documents
    )
    SELECT lang, split, COUNT(*) AS n_docs
    FROM tagged GROUP BY lang, split
    """,
    "Deterministic train/test split — the op every training pipeline "
    "runs last: assignment by md5 of the stable id (engine-portable, "
    "reshuffle-proof: a document's split never changes when the corpus "
    "grows, unlike sample() or rand()). Output is the per-(lang, split) "
    "accounting table; the assignment expression itself is the "
    "reusable piece. Map-only + one small aggregate.",
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        ),
        F.lit(100),
    )
    tagged = d.select(
        "doc_id",
        "lang",
        F.when(bucket < 90, "train").otherwise("test").alias("split"),
    )
    return tagged.groupBy("lang", "split").agg(F.count("*").alias("n_docs"))


@register(
    "mix_sample_sources",
    """
    WITH tagged AS (
        SELECT source,
               9000 - 400 * CAST(substr(source, 4) AS INT) AS rate_bp
        FROM documents
        WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)
              % 10000 < 9000 - 400 * CAST(substr(source, 4) AS INT)
    )
    SELECT source, CAST(rate_bp AS INT) AS rate_bp, COUNT(*) AS n_kept
    FROM tagged GROUP BY source, rate_bp
    """,
    "Domain mixing: downsample each source to an explicit target rate "
    "(config-table broadcast join, not a when-chain) with md5-of-id "
    "selection — deterministic, reshuffle-proof, engine-portable, "
    "unlike sample()/rand(). Map-only after the broadcast; the oracle "
    "derives the same rates arithmetically from the source suffix.",
)
def mix_sample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import sample_to_rates

    d = _t(spark, sf_dir, "documents")
    rates = {f"src{n}": (9000 - 400 * n) / 10000 for n in range(20)}
    kept = sample_to_rates(d, rates, key_col="source", id_col="doc_id")
    return kept.groupBy("source", "rate_bp").agg(F.count("*").alias("n_kept"))


@register(
    "stratified_sample_langs",
    """
    SELECT lang, doc_id, CAST(rank AS INT) AS sample_rank FROM (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY (('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                             1, 8))::BIGINT) % 4294967296, doc_id) AS rank
        FROM documents
    ) WHERE rank <= 20
    """,
    "Fixed-size stratified sample: first 20 docs per lang in md5-of-id "
    "order — deterministic 'random without an RNG', rerun-stable, with "
    "bounded churn as groups grow (a re-rolled rand() sample has "
    "neither property). One rank window per group key, single hash "
    "shuffle.",
)
def stratified_sample_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import stratified_sample_n

    d = _t(spark, sf_dir, "documents")
    return stratified_sample_n(d, 20).select("lang", "doc_id", "sample_rank")


@register(
    "contamination_eval_overlap",
    """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               ts[g.i] || ' ' || ts[g.i+1] || ' ' || ts[g.i+2] || ' ' ||
               ts[g.i+3] || ' ' || ts[g.i+4] || ' ' || ts[g.i+5] || ' ' ||
               ts[g.i+6] || ' ' || ts[g.i+7] AS shingle
        FROM toks, range(1, 100001) AS g(i)
        WHERE g.i <= len(ts) - 7
    )
    SELECT t.doc_id AS train_id, e.doc_id AS eval_id, COUNT(*) AS n_shared
    FROM sh t
    JOIN sh e ON e.shingle = t.shingle
    WHERE t.doc_id % 11 != 0 AND e.doc_id % 11 = 0
    GROUP BY t.doc_id, e.doc_id
    """,
    "Benchmark contamination scan: (train, eval) doc pairs sharing any "
    "distinct word 8-gram. Inverted-index equi-join on the shingle "
    "with a broadcast semi-join prune (only train shingles present in "
    "the eval set reach the shuffle) — scans the corpus once, bounded "
    "by eval-set size, never quadratic in train size. The prune "
    "broadcasts int64 xxhash64 fingerprints instead of shingle "
    "strings (r6: 6x smaller driver broadcast, long-compare probe, "
    "1.2x end-to-end); a fingerprint collision only admits a row the "
    "exact string pairing join then rejects, so results are "
    "bit-identical to this string-join oracle.",
)
def contamination_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import contamination_pairs

    d = _t(spark, sf_dir, "documents")
    return contamination_pairs(
        d.where(F.col("doc_id") % 11 != 0),
        d.where(F.col("doc_id") % 11 == 0),
        shingle_n=8,
    )


@register(
    "embedding_contamination",
    """
    WITH q AS (SELECT vec_id AS eval_id, embedding AS qe
               FROM embeddings WHERE vec_id < 5),
    prs AS (
        SELECT c.vec_id AS corpus_id, q.eval_id, q.qe, c.embedding AS ce
        FROM embeddings c, q
    ),
    dots AS (
        SELECT corpus_id, eval_id,
            CAST(SUM(CAST(ROUND(CAST(qe[g.i] AS DOUBLE) * CAST(ce[g.i] AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT) AS dot_i,
            CAST(SUM(CAST(ROUND(CAST(qe[g.i] AS DOUBLE) * CAST(qe[g.i] AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT) AS qq_i,
            CAST(SUM(CAST(ROUND(CAST(ce[g.i] AS DOUBLE) * CAST(ce[g.i] AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT) AS cc_i
        FROM prs, generate_series(1, 64) AS g(i)
        GROUP BY corpus_id, eval_id
    )
    SELECT corpus_id, eval_id, ROUND(exact, 3) AS score FROM (
        SELECT corpus_id, eval_id,
               (dot_i / 1e12) / (sqrt(qq_i / 1e12) * sqrt(cc_i / 1e12)) AS exact
        FROM dots
    ) WHERE exact >= 0.5
    """,
    "EMBEDDING-level eval decontamination (VERDICT r7 #1): every "
    "(corpus, eval) pair whose exact cosine clears the threshold — "
    "the semantic complement to contamination_eval_overlap "
    "(paraphrased/reformatted eval leakage survives n-gram matching "
    "but not an embedding match). The threshold compares the "
    "UNROUNDED exact cosine (scaled-int dot/norm sums + correctly-"
    "rounded IEEE sqrt/divide -> bit-identical in any engine; only "
    "the reported score is rounded to 3). Scale shape: the eval side "
    "is bounded by construction (benchmark suites, not corpora), so "
    "it broadcasts and the scan is ONE map-side pass over the corpus "
    "— no shuffle at all; the threshold collapses output to the rare "
    "contaminated pairs. Self-pairs are kept deliberately (an eval "
    "row leaked verbatim is the worst case). For eval sets too large "
    "to broadcast, route candidates through the LSH bucket join "
    "(operators/similarity.py:lsh_bucket_topk) — same verdict "
    "semantics, candidate-bounded.",
)
def embedding_contamination_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import embedding_contamination

    emb = _t(spark, sf_dir, "embeddings")
    evals = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("eval_id"), "embedding"
    )
    return embedding_contamination(
        emb, evals, threshold=0.5, eval_id_col="eval_id", use_arrow=True
    )


@register(
    "pack_sequences_lang",
    """
    WITH t AS (
        SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok
        FROM documents
    ),
    c AS (
        SELECT lang, n_tok,
               SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum_end
        FROM t
    )
    SELECT lang, CAST((cum_end - n_tok) // 2048 AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM c GROUP BY lang, seq_id
    """,
    "Greedy sequence packing for training shards: concatenate docs in "
    "stable id order per lang stream, cut every 2048 tokens; a doc's "
    "sequence is its starting offset // 2048. ONE running-sum window "
    "per stream key (single hash shuffle, no global sort); per-"
    "(stream, seq) accounting in exact integers.",
)
def pack_sequences_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import pack_sequences

    return pack_sequences(_t(spark, sf_dir, "documents"), seq_len=2048)


@register(
    "pack_efficiency_profile",
    """
    WITH t AS (
        SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok
        FROM documents
    ),
    c AS (
        SELECT lang, n_tok,
               SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum_end
        FROM t
    ),
    seqs AS (
        SELECT lang, CAST((cum_end - n_tok) // 2048 AS BIGINT) AS seq_id,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        FROM c GROUP BY lang, seq_id
    )
    SELECT lang,
           COUNT(*) AS n_seqs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN n_tokens >= 2048 THEN 1 ELSE 0 END) AS BIGINT)
               AS full_seqs,
           CAST(SUM(n_tokens) AS DOUBLE) / (COUNT(*) * 2048) AS utilization
    FROM seqs GROUP BY lang
    """,
    "Packing-efficiency profile per stream: sequences produced, token "
    "utilization vs 2048-capacity, full-sequence count — the padding-"
    "waste metric a training-prep job watches (low utilization = "
    "wasted step compute downstream). Same single-window packing plan "
    "as pack_sequences_lang plus one tiny per-stream aggregate; "
    "utilization is one IEEE division of exact bigints.",
)
def pack_efficiency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import pack_sequences

    seqs = pack_sequences(_t(spark, sf_dir, "documents"), seq_len=2048)
    return seqs.groupBy("lang").agg(
        F.count("*").alias("n_seqs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(F.when(F.col("n_tokens") >= 2048, 1).otherwise(0)).alias(
            "full_seqs"
        ),
    ).select(
        "lang",
        "n_seqs",
        "total_tokens",
        "full_seqs",
        (
            F.col("total_tokens").cast("double")
            / (F.col("n_seqs") * F.lit(2048))
        ).alias("utilization"),
    )


@register(
    "dedup_rate_by_source",
    """
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_distinct,
           CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*)
               AS dup_rate
    FROM documents GROUP BY source
    """,
    "Exact-duplicate rate per source — the first number a curation "
    "run reports (which domain is flooding the corpus with copies). "
    "Distinct-count on the 16-byte digest, never the document; one "
    "IEEE division of exact counts.",
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct(F.md5("text")).alias("n_distinct"),
    ).select(
        "source",
        "n_docs",
        "n_distinct",
        (
            (F.col("n_docs") - F.col("n_distinct")).cast("double")
            / F.col("n_docs")
        ).alias("dup_rate"),
    )


@register(
    "corpus_assembly_pipeline",
    """
    WITH keep AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ),
    base AS (
        SELECT d.doc_id, d.text, d.source FROM documents d
        JOIN keep k ON k.doc_id = d.doc_id
    ),
    mixed AS (
        SELECT doc_id, text, source FROM base
        WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)
              % 10000 < 9000 - 400 * CAST(substr(source, 4) AS INT)
    ),
    tagged AS (
        SELECT source, text,
               CASE WHEN (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-split'),
                          1, 8))::BIGINT) % 100 < 90
                    THEN 'train' ELSE 'test' END AS split
        FROM mixed
    )
    SELECT source, split, COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM tagged GROUP BY source, split
    """,
    "End-to-end corpus assembly — the composed flagship of the "
    "curation layer: exact dedup (keep min-id per content digest) -> "
    "domain mixing (config-table rates, md5-of-id selection) -> "
    "train/test split (salted md5 so the split hash is independent of "
    "the mixing hash) -> per-(source, split) doc/token accounting. "
    "Three hash shuffles total (digest group, mixing broadcast is "
    "map-side, final agg); every stage reshuffle-proof and "
    "engine-portable, hash-verified END TO END by one oracle.",
)
def corpus_assembly_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import sample_to_rates

    d = _t(spark, sf_dir, "documents")
    keep = d.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id"))
    base = d.select("doc_id", "text", "source").join(
        keep.select("doc_id"), "doc_id"
    )
    rates = {f"src{n}": (9000 - 400 * n) / 10000 for n in range(20)}
    mixed = sample_to_rates(base, rates, key_col="source", id_col="doc_id")
    split_bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("-split"))), 1, 8),
            16,
            10,
        ).cast("bigint"),
        F.lit(100),
    )
    tagged = mixed.select(
        "source",
        "text",
        F.when(split_bucket < 90, "train").otherwise("test").alias("split"),
    )
    return tagged.groupBy("source", "split").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )


@register(
    "salted_join_event_segments",
    """
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY c.c_mktsegment
    """,
    "Skew-mitigation salted join, driver-verified: the events fact "
    "joins the small customer dim through operators.skew.salted_join "
    "(dim replicated salt x, fact rows sprayed across replicas — a hot "
    "user's rows land on salt tasks instead of one). Salting must be "
    "result-invisible, so the oracle is the PLAIN join: a hash match "
    "proves the mitigation changes the physical plan, not the answer. "
    "Decimal-exact sum for order independence.",
)
def salted_join_event_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import decimal_sum
    from ..operators.skew import salted_join

    ev = _t(spark, sf_dir, "events").select("user_id", "value")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, cust, on="user_id", salt=8)
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_events"),
        decimal_sum("value", 6, "value_sum"),
    )


# --------------------------------------------------------------------------
# multimodal plumbing
# --------------------------------------------------------------------------


@register(
    "mm_binary_meta",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           lower(hex(encode(substr(text, 1, 4)))) AS magic_hex
    FROM documents
    """,
    "Multimodal columns: treat content as opaque binary + typed metadata "
    "(byte length, magic-header hex). The real decode path is the "
    "mapInPandas stub in multimodal.media (mm_decode_stub).",
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 4), "UTF-8"))).alias("magic_hex"),
    )


@register(
    "mm_decode_stub",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           CAST(64 * (1 + doc_id % 16) AS INT) AS width,
           CAST(64 * (1 + (doc_id // 16) % 16) AS INT) AS height,
           CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
    FROM documents
    """,
    "Multimodal decode pipeline: binary -> (bytes, width, height, format) "
    "via an Arrow-batched mapInPandas 'decoder'. Pinned to the "
    "deterministic stub (use_real=False) so the oracle arithmetic holds "
    "in any environment; decode_images defaults to the REAL PIL decoder "
    "when pillow is importable (same schema, NULL metadata for corrupt "
    "blobs) — the PIL-gated twin of the protobuf-gated TWS operator.",
)
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.media import decode_images

    d = _t(spark, sf_dir, "documents")
    binary = d.select("doc_id", F.encode("text", "UTF-8").alias("data"))
    return decode_images(binary, use_real=False)


@register(
    "mm_frame_sample",
    """
    WITH b AS (
        SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents
    ),
    f AS (
        SELECT doc_id, n_bytes,
               LEAST(4, 1 + n_bytes // 256) AS n_frames
        FROM b
    )
    SELECT doc_id,
           CAST(g.i AS INT) AS frame_idx,
           n_bytes,
           CAST(g.i * (n_bytes // n_frames) AS BIGINT) AS byte_offset
    FROM f, range(0, 4) AS g(i)
    WHERE g.i < n_frames
    """,
    "Multimodal frame sampling: each blob fans out to "
    "min(4, 1 + bytes/256) evenly-spaced (frame_idx, byte_offset) rows "
    "— the seek plan a video decoder consumes. explode(sequence) is "
    "map-only codegen: row fan-out without byte fan-out, no shuffle.",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.media import frame_sample

    d = _t(spark, sf_dir, "documents")
    binary = d.select("doc_id", F.encode("text", "UTF-8").alias("data"))
    return frame_sample(binary, max_frames=4, stride_bytes=256)


@register(
    "mm_feature_extract",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(length(regexp_replace(text, '[^ -~]', '', 'g')) AS BIGINT)
               AS n_printable,
           CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
               AS n_digits,
           CAST(length(text) - length(regexp_replace(text, '\\n', '', 'g'))
               AS BIGINT) AS n_newlines
    FROM documents
    """,
    "Multimodal feature extraction, codec-free tier: numpy byte-class "
    "counts (printable / digit / newline) over opaque blobs in one "
    "Arrow-batched mapInPandas — the text-vs-binary sniffing stage of a "
    "media pipeline. Counts (exact ints), never ratios, so the oracle "
    "holds bit-for-bit; the UTF-8 byte-vs-codepoint equivalence for "
    "ASCII classes is what lets SQL over decoded text check a kernel "
    "that only ever sees raw bytes.",
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.media import extract_byte_features

    d = _t(spark, sf_dir, "documents")
    binary = d.select("doc_id", F.encode("text", "UTF-8").alias("data"))
    return extract_byte_features(binary)


@register(
    "embedding_centroids",
    """
    WITH scaled AS (
        SELECT label, g.i AS dim,
               CAST(ROUND(CAST(embedding[g.i] AS DOUBLE) * 1e12) AS BIGINT) AS v
        FROM embeddings, range(1, 65) AS g(i)
    )
    SELECT label, CAST(dim AS INT) AS dim,
           CAST(SUM(v) AS BIGINT) / 1e12 / COUNT(*) AS centroid
    FROM scaled GROUP BY label, dim
    """,
    "Per-label embedding centroids (the clustering/IVF building block): "
    "posexplode dims -> exact scaled-int mean per (label, dim). One "
    "shuffle keyed (label, dim); output long-form (label, dim, value).",
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("pos", "e")
    ).select(
        "label",
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.round(F.col("e").cast("double") * F.lit(1e12)).cast("bigint").alias("v"),
    )
    return exploded.groupBy("label", "dim").agg(
        (F.sum("v").cast("bigint") / F.lit(1e12) / F.count("*")).alias("centroid")
    )


@register(
    "tfidf_top_terms",
    """
    WITH tok AS (
        SELECT doc_id, tok, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY doc_id, tok
    ),
    df AS (SELECT tok, COUNT(*) AS df FROM tok GROUP BY tok),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    weights AS (
        SELECT t.doc_id, t.tok AS token,
               t.tf * (CAST(n.n_docs AS DOUBLE) / d.df) AS weight
        FROM tok t JOIN df d ON t.tok = d.tok CROSS JOIN n
    )
    SELECT doc_id, token, weight, CAST(rnk AS INT) AS rnk FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY weight DESC, token) AS rnk
        FROM weights
    ) WHERE rnk <= 3
    """,
    "TF-IDF top-3 terms per document. idf is the rational N/df (not "
    "ln(N/df): transcendental libm results are not bit-portable across "
    "engines; the ranking is identical). Corpus size is a 1-row "
    "aggregate cross-joined in (no plan-build job); the token-df join "
    "is unhinted so it can shuffle on token at scale (the vocabulary is "
    "unbounded) while AQE may still broadcast small measured sizes.",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # Corpus size as a 1-row aggregate cross-joined in (broadcast of one
    # row), not a driver-side d.count(): no job runs at plan-build and
    # the plan stays a single lazy DAG at any corpus size.
    n = d.agg(F.count("*").alias("n_docs"))
    tok = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    # No broadcast hint on the token->df table: the vocabulary grows with
    # the corpus (billions of tokens at 100 TB), so the join must be free
    # to shuffle on token; AQE may still choose broadcast when the
    # measured size is small.
    df_tbl = tok.groupBy("token").agg(F.count("*").alias("df"))
    weights = tok.join(df_tbl, "token").crossJoin(F.broadcast(n)).select(
        "doc_id",
        "token",
        (F.col("tf") * (F.col("n_docs").cast("double") / F.col("df"))).alias("weight"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("weight"), F.asc("token"))
    return (
        weights.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "token", "weight", "rnk")
    )


@register(
    "token_rarity_score",
    """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    freq AS (SELECT tok, COUNT(*) AS tf FROM tok GROUP BY tok)
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(f.tf) AS BIGINT) AS sum_tf,
           CAST(SUM(f.tf) AS DOUBLE) / COUNT(*) AS avg_tok_freq
    FROM tok t JOIN freq f USING (tok)
    GROUP BY t.doc_id
    """,
    "Corpus-frequency rarity score: build a unigram frequency table "
    "over the whole corpus, then score each document by the mean "
    "corpus frequency of its tokens — the 2-pass vocab-build + "
    "score-join skeleton of every n-gram-LM quality filter (low score "
    "= rare-token/gibberish-heavy doc). Exact throughout: counts are "
    "bigint, one IEEE division at the end. The token join shuffles on "
    "the token (vocabulary is unbounded at 100 TB — never broadcast); "
    "per-doc recombination shuffles on doc_id.",
)
def token_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count("*").alias("tf"))
    return (
        toks.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("tf").alias("sum_tf"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "sum_tf",
            (F.col("sum_tf").cast("double") / F.col("n_tokens")).alias(
                "avg_tok_freq"
            ),
        )
    )


@register(
    "bigram_lift_topk",
    """
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    uni AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
    n AS (SELECT COUNT(*) AS total FROM tok),
    bg AS (
        -- list_zip of the two shifted slices: exact for ANY document
        -- length (a fixed range(1, N) bound would silently drop
        -- bigrams past position N on long docs)
        SELECT p[1] || ' ' || p[2] AS bigram, COUNT(*) AS cxy FROM (
            SELECT unnest(list_zip(ts[1:len(ts) - 1], ts[2:len(ts)])) AS p
            FROM (SELECT string_split(text, ' ') AS ts FROM documents)
        ) GROUP BY p[1] || ' ' || p[2]
    )
    SELECT bigram, cxy,
           CAST(cxy * n.total AS DOUBLE) / (u1.c * u2.c) AS lift
    FROM bg
    JOIN uni u1 ON u1.tok = split_part(bigram, ' ', 1)
    JOIN uni u2 ON u2.tok = split_part(bigram, ' ', 2)
    CROSS JOIN n
    WHERE cxy >= 5
    ORDER BY lift DESC, bigram LIMIT 20
    """,
    "Collocation extraction: top-20 bigrams by lift "
    "P(xy)/(P(x)P(y)) — the association score behind phrase mining "
    "and tokenizer-merge candidates. Lift is the exact rational "
    "(cxy * N) / (cx * cy) — one IEEE division of exact bigints (no "
    "transcendental PMI log: same ranking, bit-portable). Bigrams "
    "come from the zip_with shingle fold (no per-element re-split); "
    "the two unigram joins shuffle on the token; top-k is "
    "TakeOrderedAndProject, never a global sort.",
)
def bigram_lift_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
    uni = toks.groupBy("tok").agg(F.count("*").alias("c"))
    n = toks.agg(F.count("*").alias("total"))
    bg = (
        d.select(F.explode(T.word_shingles("text", 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cxy"))
        .where(F.col("cxy") >= 5)
    )
    u1 = uni.select(F.col("tok").alias("__t1"), F.col("c").alias("__c1"))
    u2 = uni.select(F.col("tok").alias("__t2"), F.col("c").alias("__c2"))
    scored = (
        bg.join(u1, F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)) == F.col("__t1"))
        .join(u2, F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)) == F.col("__t2"))
        .crossJoin(F.broadcast(n))
        .select(
            "bigram",
            "cxy",
            (
                (F.col("cxy") * F.col("total")).cast("double")
                / (F.col("__c1") * F.col("__c2"))
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), F.asc("bigram")).limit(20)


@register(
    "vocab_overlap_sources",
    """
    WITH v AS (
        SELECT DISTINCT source, tok FROM (
            SELECT source, unnest(string_split(text, ' ')) AS tok
            FROM documents
        )
    ),
    sizes AS (SELECT source, COUNT(*) AS nv FROM v GROUP BY source),
    inter AS (
        SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS ni
        FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT i.source_a, i.source_b, i.ni AS n_shared,
           CAST(i.ni AS DOUBLE) / (sa.nv + sb.nv - i.ni) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.source_a
    JOIN sizes sb ON sb.source = i.source_b
    """,
    "Pairwise source-vocabulary Jaccard — the domain-similarity "
    "matrix a mixture designer reads before setting sampling rates "
    "(near-duplicate domains waste mixture weight). Per-source "
    "vocabularies come from one distinct aggregate (shuffle on "
    "(source, token)); the intersection self-join shuffles token "
    "keys only; Jaccard is one IEEE division of exact bigints. "
    "Output rows = source-pairs — tiny at any corpus size.",
)
def vocab_overlap_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    v = (
        d.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
    )
    sizes = v.groupBy("source").agg(F.count("*").alias("nv"))
    a = v.select(F.col("source").alias("source_a"), "tok")
    b = v.select(F.col("source").alias("source_b"), "tok")
    inter = (
        a.join(b, "tok")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("ni"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("nv").alias("__na"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("nv").alias("__nb"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("ni").alias("n_shared"),
            (
                F.col("ni").cast("double")
                / (F.col("__na") + F.col("__nb") - F.col("ni"))
            ).alias("jaccard"),
        )
    )


_PASSAGE_CHUNKS_ORACLE = """
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    par AS (
        SELECT doc_id, ts,
               GREATEST(CAST(CEIL((len(ts) - 100) / 50.0) AS BIGINT), 0)
                   AS smax
        FROM t
    ),
    chunks AS (
        SELECT doc_id, ts, unnest(range(0, smax + 1)) AS chunk_idx
        FROM par
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           array_to_string(ts[chunk_idx * 50 + 1 : chunk_idx * 50 + 100], ' ')
               AS chunk,
           CAST(len(ts[chunk_idx * 50 + 1 : chunk_idx * 50 + 100]) AS INT)
               AS n_tokens
    FROM chunks
    """


@register(
    "text_passage_chunks",
    _PASSAGE_CHUNKS_ORACLE,
    "RAG-style passage chunking: overlapping 100-word windows at "
    "stride 50 per document, with chunk index and token count — the "
    "retrieval-corpus preparation step between curation and embedding. "
    "Pure array expressions: ONE split per row (pre-projected __ts), "
    "chunk starts from a sequence, slices inside the transform touch "
    "only cheap column refs (the HOF re-evaluation rule), one "
    "posexplode — map-only, no shuffle. The oracle builds the same "
    "starts with DuckDB's list-valued range (no fixed positional "
    "bound: exact for any document length).",
)
def text_passage_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    pre = d.select("doc_id", F.split("text", " ").alias("__ts"))
    ts = F.col("__ts")
    smax = F.greatest(
        F.ceil((F.size(ts) - F.lit(100)) / F.lit(50.0)).cast("bigint"),
        F.lit(0).cast("bigint"),
    )
    chunks = pre.select(
        "doc_id",
        "__ts",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0).cast("bigint"), smax),
                lambda s: F.slice(ts, (s * 50 + 1).cast("int"), 100),
            )
        ).alias("chunk_idx", "__chunk"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.concat_ws(" ", F.col("__chunk")).alias("chunk"),
        F.size("__chunk").alias("n_tokens"),
    )


@register(
    "text_passage_chunks_udtf",
    _PASSAGE_CHUNKS_ORACLE,
    "The SAME passage chunker as a Python UDTF (SURVEY §2.10 D2 — the "
    "table-valued escape hatch, Spark 3.5+/4 API), hash-checked "
    "against the identical oracle: the one catalog pair proving the "
    "UDTF surface end-to-end. Like the znorm applyInPandas/codegen "
    "pair, the array-expression twin (text_passage_chunks) is the "
    "production path — this one pays a Python worker round trip per "
    "partition and exists to pin the API's exactness, not to win.",
)
def text_passage_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_idx int, chunk string, n_tokens int")
    class _PassageChunker:
        def eval(self, doc_id, text):
            words = text.split(" ")
            smax = int(max(math.ceil((len(words) - 100) / 50.0), 0))
            for s in range(smax + 1):
                w = words[s * 50 : s * 50 + 100]
                yield doc_id, s, " ".join(w), len(w)

    spark.udtf.register("__passage_chunker", _PassageChunker)
    _t(spark, sf_dir, "documents").select("doc_id", "text").createOrReplaceTempView(
        "__docs_for_chunks"
    )
    return spark.sql(
        "SELECT c.doc_id, c.chunk_idx, c.chunk, c.n_tokens "
        "FROM __docs_for_chunks d, LATERAL __passage_chunker(d.doc_id, d.text) c"
    )


@register(
    "json_variant_agg",
    """
    SELECT event_type,
           COUNT(CAST(props ->> '$.k' AS BIGINT)) AS n_with_k,
           CAST(SUM(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS k_sum
    FROM events GROUP BY event_type
    """,
    "Semi-structured extraction via Spark 4's VARIANT type: "
    "parse_json once into a binary-encoded variant column, "
    "variant_get typed paths out — the modern replacement for "
    "repeated get_json_object string parsing (one parse per row "
    "regardless of how many fields are read; the existing "
    "json_extract_props entry keeps the classic JSON-path twin). "
    "Exact bigint aggregate; nulls where the key is absent, matching "
    "the oracle's JSON extraction.",
)
def json_variant_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'long')").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("k_sum"),
    )


@register(
    "classifier_margin_select",
    """
    WITH w AS (
        SELECT d.d AS d,
               (('0x' || substr(md5('w-' || CAST(d.d AS VARCHAR)), 1, 8))::BIGINT
                    % 2000000) - 1000000 AS wv
        FROM range(0, 64) d(d)
    ),
    v AS (
        SELECT vec_id, g.i - 1 AS d,
               CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * 1048576) AS BIGINT) AS x
        FROM embeddings, range(1, 65) AS g(i)
    ),
    margins AS (
        SELECT v.vec_id, CAST(SUM(v.x * w.wv) AS BIGINT) AS margin
        FROM v JOIN w ON w.d = v.d GROUP BY v.vec_id
    )
    SELECT vec_id, margin,
           CASE WHEN margin >= 0 THEN true ELSE false END AS selected
    FROM margins
    """,
    "Broadcast linear-classifier inference over the embedding corpus — "
    "the quality-classifier scoring pass (FastText-style) of a "
    "training-data pipeline, HASH-CHECKED: md5-derived integer weights "
    "+ floor(x*2^20) quantization make the margin an exact int64 "
    "reproduced bit-for-bit by the oracle. Margin, not sigmoid: exp() "
    "is not bit-portable, and selection thresholds/rankings on the "
    "margin are order-equivalent. Map-only scan, one einsum per Arrow "
    "batch; weights ride the UDF closure (at cluster scale, one "
    "broadcast of a dim-sized array).",
)
def classifier_margin_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import linear_margin_udf

    emb = _t(spark, sf_dir, "embeddings")
    _margin = linear_margin_udf(64)
    return emb.select(
        "vec_id",
        _margin("embedding").alias("margin"),
    ).select(
        "vec_id",
        "margin",
        (F.col("margin") >= 0).alias("selected"),
    )


_EMB_COSINE_ORACLE = """
WITH pairs AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           a.embedding AS ea, b.embedding AS eb
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
),
dots AS (
    SELECT vec_a, vec_b,
           CAST(SUM(CAST(ROUND(CAST(ea[g.i] AS DOUBLE) * CAST(eb[g.i] AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT) AS d,
           CAST(SUM(CAST(ROUND(CAST(ea[g.i] AS DOUBLE) * CAST(ea[g.i] AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT) AS qa,
           CAST(SUM(CAST(ROUND(CAST(eb[g.i] AS DOUBLE) * CAST(eb[g.i] AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT) AS qb
    FROM pairs, range(1, 65) AS g(i) GROUP BY vec_a, vec_b
)
SELECT vec_a, vec_b,
       (d / 1e12) / (sqrt(qa / 1e12) * sqrt(qb / 1e12)) AS cosine
FROM dots
WHERE (d / 1e12) / (sqrt(qa / 1e12) * sqrt(qb / 1e12)) >= 0.4
"""


@register(
    "dedup_embedding_cosine",
    _EMB_COSINE_ORACLE,
    "Embedding-cosine near-dup (exact all-pairs variant): vector pairs "
    "with cosine >= 0.4 via upper-triangle nested-loop join + exact "
    "scaled-int cosine. Quadratic by construction — the oracle-checkable "
    "verifier; at 100 TB candidates come from the LSH buckets "
    "(knn_lsh_cosine's bucketing) and only candidates are verified.",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import dot_exact, norm_exact
    from ..operators._util import spread

    emb = _t(spark, sf_dir, "embeddings")
    a = spread(
        emb.select(
            F.col("vec_id").alias("vec_a"),
            F.col("embedding").alias("ea"),
            norm_exact("embedding").alias("na"),
        )
    )
    b = F.broadcast(
        emb.select(
            F.col("vec_id").alias("vec_b"),
            F.col("embedding").alias("eb"),
            norm_exact("embedding").alias("nb"),
        )
    )
    cos = dot_exact("ea", "eb") / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .where(F.col("cosine") >= 0.4)
    )


@register(
    "dedup_embedding_lsh",
    f"""
    WITH vcorpus AS (
        -- shared kit validity gate (operators/dedup.
        -- filter_valid_vectors + its single-source SQL twin
        -- VECTOR_VALIDITY_WHERE_SQL, r13 hardening): dirty vectors
        -- degrade to exclusion in BOTH engines, and the auto-plane
        -- count below sizes to the same filtered population the
        -- builder counts
        SELECT vec_id, embedding FROM embeddings
        {dd.VECTOR_VALIDITY_WHERE_SQL}
    ),
    params AS (
        -- auto-scaled plane count: smallest p with 16 * 2^p >= n,
        -- clamped to [4, 24] — integer-for-integer the same derivation
        -- as operators.dedup.auto_n_planes
        SELECT LEAST(24, GREATEST(4, COALESCE(
            (SELECT MIN(p.p) FROM range(0, 25) p(p)
             WHERE 16 * (1::BIGINT << p.p)
                   >= (SELECT COUNT(*) FROM vcorpus)), 24))) AS np
    ),
    planes AS (
        SELECT t.t AS t, p.p AS p, d.d AS d,
               (('0x' || substr(md5(CAST(t.t AS VARCHAR) || '-' ||
                    CAST(p.p AS VARCHAR) || '-' || CAST(d.d AS VARCHAR)),
                    1, 8))::BIGINT % 2000000) - 1000000 AS c
        FROM range(0, 8) t(t), range(0, 24) p(p), range(0, 64) d(d)
        WHERE p.p < (SELECT np FROM params)
    ),
    v AS (
        SELECT vec_id, g.i - 1 AS d,
               CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * 1048576) AS BIGINT) AS x
        FROM vcorpus, range(1, 65) AS g(i)
    ),
    dots AS (
        SELECT v.vec_id, pl.t, pl.p, SUM(v.x * pl.c) AS dot
        FROM v JOIN planes pl ON pl.d = v.d
        GROUP BY v.vec_id, pl.t, pl.p
    ),
    buckets AS (
        SELECT vec_id, t,
               SUM(CASE WHEN dot >= 0 THEN (1::BIGINT << p) ELSE 0 END) AS bucket
        FROM dots GROUP BY vec_id, t
    ),
    cands AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM buckets a
        JOIN buckets b ON a.t = b.t AND a.bucket = b.bucket
             AND a.vec_id < b.vec_id
    ),
    norms AS (
        SELECT vec_id, SUM(x * x) AS q FROM v GROUP BY vec_id
    ),
    cdots AS (
        SELECT c.vec_a, c.vec_b, SUM(va.x * vb.x) AS d
        FROM cands c
        JOIN v va ON va.vec_id = c.vec_a
        JOIN v vb ON vb.vec_id = c.vec_b AND vb.d = va.d
        GROUP BY c.vec_a, c.vec_b
    )
    SELECT cd.vec_a, cd.vec_b,
           CAST(cd.d AS DOUBLE)
             / (sqrt(CAST(na.q AS DOUBLE)) * sqrt(CAST(nb.q AS DOUBLE))) AS cosine
    FROM cdots cd
    JOIN norms na ON na.vec_id = cd.vec_a
    JOIN norms nb ON nb.vec_id = cd.vec_b
    WHERE CAST(cd.d AS DOUBLE)
             / (sqrt(CAST(na.q AS DOUBLE)) * sqrt(CAST(nb.q AS DOUBLE))) >= 0.4
    """,
    "Embedding near-dup via random-hyperplane LSH buckets + quantized "
    "integer cosine verify — the scale path for dedup_embedding_cosine's "
    "quadratic verifier, and HASH-CHECKED: md5-derived integer planes "
    "+ floor(x*2^20) quantization (power-of-two scale = exact double "
    "product) make buckets AND verify cosines bit-identical in any "
    "engine, so the approximation itself is oracle-verified, not just "
    "rows-only. Candidates are an id-only equi-join on (table, bucket): "
    "O(docs x 8) shuffle rows; bucket signatures and the pair verify "
    "are each one int64 matmul/einsum per Arrow batch. Plane count "
    "auto-scales to the corpus (auto_n_planes: smallest p with "
    "16*2^p >= n, clamped [4,24]) so buckets stay ~16-occupant at any "
    "scale; the oracle derives the identical width in SQL.",
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.embedding_lsh_dedup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.4, n_planes=None
    )


@register(
    "range_join_recent_clicks",
    """
    SELECT e.event_id, COUNT(c.event_id) AS n_recent_clicks
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = e.user_id
      AND c.ts >= e.ts - INTERVAL 5 MINUTE
      AND c.ts < e.ts
    GROUP BY e.event_id
    """,
    "Range (interval) join: clicks by the same user in the 5 minutes "
    "before each error. Equi key (user_id) drives the shuffle; the time "
    "range is a post-join residual. At scale: bucket both sides by "
    "(user_id, time_bin) so ranges only probe adjacent bins.",
)
def range_join_recent_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    e = ev.where(F.col("event_type") == "error").select(
        F.col("event_id"), F.col("user_id"), F.col("ts")
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
    )
    joined = e.join(
        c,
        (F.col("c_user_id") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("ts") - F.expr("INTERVAL 5 MINUTES"))
        & (F.col("c_ts") < F.col("ts")),
        "left",
    )
    return joined.groupBy("event_id").agg(
        F.count("c_event_id").alias("n_recent_clicks")
    )


@register(
    "znorm_user_values",
    """
    WITH m AS (
        SELECT user_id, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(value * value AS DECIMAL(30,4))) AS DOUBLE) AS s2
        FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id,
           (e.value - m.s1 / m.n)
             / sqrt((m.n * m.s2 - m.s1 * m.s1) / (m.n * (m.n - 1))) AS z
    FROM events e JOIN m USING (user_id)
    WHERE m.n > 1
    """,
    "Per-user z-score normalization via Arrow-batched applyInPandas — "
    "the documented Pandas-UDF escape hatch (SURVEY §2.10 D1/D3) "
    "exercised WITH an exact oracle: moments are computed as exact "
    "integer cents inside the UDF, mirroring the SQL decimal moments, "
    "so even the Python path is bit-reproducible. One shuffle on the "
    "group key; batch shape = one user timeline.",
)
def znorm_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("z", DoubleType()),
        ]
    )
    # r14 optimization (guide §4.1): groupBy().applyInPandas ships one
    # Arrow batch PER GROUP — ~1 user's rows per batch, thousands of
    # tiny batches through the worker pipe. Same shuffle key, same
    # per-group arithmetic, but mapInPandas over the hash-repartitioned
    # rows moves whole partitions as large Arrow batches and loops
    # groups in pandas — measured 4.28 s -> 2.99 s isolated at sf0.1
    # with toPandas() outputs verified frame-equal.
    # r15 (VERDICT r14 item 8 — bound the hot key): rows are
    # additionally SORTED by user_id within each partition, so the
    # Python side streams Arrow batches and buffers only the one user
    # whose timeline spans the current batch boundary. Peak pandas
    # memory per task is now max(hottest user's rows, one Arrow batch)
    # x ~24 B/row — NOT the whole shuffle partition — and a skewed key
    # degrades to one large (but single-user) buffer instead of an
    # unsplittable whole-partition materialization
    # (tests/test_north_star.py::test_znorm_stream_hot_user pins the
    # bound and the arithmetic). The escape-hatch exactness contract
    # (integer-cents moments) is unchanged.
    return (
        ev.repartition("user_id")
        .sortWithinPartitions("user_id")
        .mapInPandas(_znorm_stream, schema=schema)
    )


def _znorm_group(pdf):
    """Exact integer-cents z-scores for ONE user's rows (the r13
    kernel, unchanged): moments as exact int64 cents mirror the SQL
    decimal moments, so the Python path is bit-reproducible."""
    import pandas as pd

    n = len(pdf)
    if n < 2:
        return pdf.iloc[0:0][["event_id", "user_id"]].assign(z=[])
    cents = (pdf["value"] * 100).round().astype("int64")
    s1 = float(cents.sum()) / 100.0
    s2 = float((cents * cents).sum()) / 10000.0
    mean = s1 / n
    std = ((n * s2 - s1 * s1) / (n * (n - 1))) ** 0.5
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "user_id": pdf["user_id"],
            "z": (pdf["value"] - mean) / std,
        }
    )


def _znorm_stream(batches):
    """Streaming per-user z-normalization over user_id-SORTED
    partition batches: emit every user fully contained in the seen
    prefix, carry the (single) trailing user across the batch
    boundary. Buffered state is bounded by the hottest user's
    timeline plus one Arrow batch."""
    import pandas as pd

    buf = None
    for b in batches:
        if buf is not None and len(buf):
            b = pd.concat([buf, b], ignore_index=True)
            buf = None
        if not len(b):
            continue
        last = b["user_id"].iloc[-1]
        # input is sorted by user_id, so the trailing user's rows are
        # the contiguous tail; everything before it is complete
        head = b[b["user_id"] != last]
        buf = b[b["user_id"] == last]
        for _, g in head.groupby("user_id", sort=False):
            out = _znorm_group(g)
            if len(out):
                yield out
    if buf is not None and len(buf):
        out = _znorm_group(buf)
        if len(out):
            yield out


@register(
    "znorm_user_values_expr",
    """
    WITH m AS (
        SELECT user_id, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(value * value AS DECIMAL(30,4))) AS DOUBLE) AS s2
        FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id,
           (e.value - m.s1 / m.n)
             / sqrt((m.n * m.s2 - m.s1 * m.s1) / (m.n * (m.n - 1))) AS z
    FROM events e JOIN m USING (user_id)
    WHERE m.n > 1
    """,
    "Per-user z-score, pure-codegen twin of znorm_user_values: decimal "
    "moments as window aggregates over partitionBy(user_id) — ONE "
    "shuffle, no join, no Python. Same oracle as the pandas variant; "
    "the measured gap between the two (bench) is the UDF-escape-hatch "
    "tax quantified. This is the production path; the applyInPandas "
    "twin demonstrates D1 for logic SQL genuinely can't express.",
)
def znorm_user_values_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    w = Window.partitionBy("user_id")
    n = F.count("*").over(w)
    s1 = F.sum(F.col("value").cast("decimal(30,2)")).over(w).cast("double")
    s2 = (
        F.sum((F.col("value") * F.col("value")).cast("decimal(30,4)"))
        .over(w)
        .cast("double")
    )
    z = (F.col("value") - s1 / n) / F.sqrt(
        (n * s2 - s1 * s1) / (n * (n - F.lit(1)))
    )
    return (
        ev.select("event_id", "user_id", "value", n.alias("_n"), z.alias("z"))
        .where(F.col("_n") > 1)
        .select("event_id", "user_id", "z")
    )


# --------------------------------------------------------------------------
# event-time windows & as-of join
# --------------------------------------------------------------------------


@register(
    "events_hourly_tumbling",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS value_sum
    FROM events GROUP BY date_trunc('hour', ts)
    """,
    "T7 parity-plus: tumbling 1-hour event-time window aggregation via "
    "F.window — the batch twin of the Structured Streaming pipeline in "
    "streaming.ingest (same plan shape readStream-side).",
)
def events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(30,2)")).cast("double").alias("value_sum"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "value_sum")
    )


@register(
    "events_session_windows",
    """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL 30 MINUTE OR
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
    """,
    "T7 parity-plus: session windows (30-min gap) via F.session_window; "
    "oracle is the classic gaps-and-islands rewrite. Streaming twin uses "
    "the same expression after readStream.",
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


@register(
    "events_trailing_rate",
    """
    SELECT event_id,
           COUNT(*) OVER (PARTITION BY event_type ORDER BY epoch_us(ts)
                          RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
               AS n_trailing_10min
    FROM events
    """,
    "Time-RANGE window frame (a distinct frame capability from the "
    "ROWS-frame W family): per event, how many same-type events "
    "arrived in the trailing 10 minutes — the rolling-rate signal "
    "behind alerting and rate limiting. The frame bound is epoch "
    "MICROSECONDS on both engines; RANGE includes all equal-timestamp "
    "peers per the SQL standard, so ties need no ordering tiebreak. "
    "One shuffle on event_type.",
)
def events_trailing_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # unix_micros needs an instant; the NTZ->TIMESTAMP cast shifts by a
    # CONSTANT session offset, and a range frame depends only on
    # DIFFERENCES, so the count is session-timezone-independent
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-600_000_000, 0)
    )
    return ev.select(
        "event_id", F.count("*").over(w).alias("n_trailing_10min")
    )


@register(
    "retention_cohorts",
    """
    WITH first AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort
        FROM events GROUP BY user_id
    ),
    act AS (
        SELECT DISTINCT e.user_id, f.cohort,
               date_diff('day', f.cohort, CAST(e.ts AS DATE)) AS day_offset
        FROM events e JOIN first f USING (user_id)
    )
    SELECT CAST(cohort AS VARCHAR) AS cohort_day,
           CAST(day_offset AS INT) AS day_offset,
           COUNT(*) AS n_users
    FROM act GROUP BY cohort, day_offset
    """,
    "Retention cohort matrix: users grouped by first-seen day, counted "
    "on each later activity-day offset — the classic product-analytics "
    "triangle. Two aggregates and one join on user_id (the cohort "
    "table is per-user — broadcastable at dim scale, free to shuffle "
    "at 100 TB); date keys emitted as strings per the determinism "
    "rules.",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort")
    )
    act = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort",
            F.datediff(F.col("ts").cast("date"), F.col("cohort")).alias(
                "day_offset"
            ),
        )
        .distinct()
    )
    return act.groupBy("cohort", "day_offset").agg(
        F.count("*").alias("n_users")
    ).select(
        F.col("cohort").cast("string").alias("cohort_day"),
        F.col("day_offset").cast("int").alias("day_offset"),
        "n_users",
    )


@register(
    "session_top_paths",
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         >= INTERVAL 30 MINUTE OR
                         LAG(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(new_session) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM flagged
    ),
    paths AS (
        SELECT user_id, session_id,
               string_agg(event_type, '->' ORDER BY ts, event_id) AS path
        FROM numbered GROUP BY user_id, session_id
    )
    SELECT path, COUNT(*) AS n
    FROM paths GROUP BY path
    ORDER BY n DESC, path LIMIT 10
    """,
    "Funnel mining: top-10 within-session event-type paths (30-min "
    "gap sessions). Gaps-and-islands numbering (lag + running sum, "
    "fully tiebroken on (ts, event_id)), per-session path via "
    "sort_array(collect_list(struct)) -> transform -> array_join — "
    "order comes from the struct sort, not from any window "
    "accumulation order — then a count and TakeOrderedAndProject.",
)
def session_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        # micro-resolution gap: a seconds-floor cast would disagree
        # with the oracle's exact INTERVAL comparison on sub-second
        # timestamps (constant session-tz offset cancels in the diff)
        F.when(
            F.lag("ts").over(wo).isNull()
            | (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.lag("ts").over(wo).cast("timestamp"))
                >= 1_800_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = numbered.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            "->",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(10)
    )


@register(
    "funnel_conversion",
    """
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_buy
        FROM events e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_full_funnel
    """,
    "Ordered funnel conversion (view -> click -> purchase): each step "
    "counts users whose step event STRICTLY FOLLOWS their first "
    "completion of the previous step — the sequence-matching shape "
    "behind every conversion dashboard. Three filtered per-user "
    "aggregates chained by user-key joins (each stage's survivor set "
    "only shrinks; the filters push to the scan), then three 1-row "
    "counts cross-joined — no window, no self-join blow-up.",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(F.broadcast(c.agg(F.count("*").alias("n_view_click"))))
        .crossJoin(F.broadcast(p.agg(F.count("*").alias("n_full_funnel"))))
    )


@register(
    "asof_join_latest_order",
    """
    WITH orders_daily AS (
        SELECT o_custkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS day_total
        FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, o.o_orderdate AS last_order_date, o.day_total
    FROM events e ASOF JOIN orders_daily o
        ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    "As-of join (custom operator — Spark lacks it natively): each event "
    "matched to the user's latest order on-or-before the event time. "
    "union_window strategy: both sides union into one stream, a single "
    "running last(ignorenulls) window per key carries the latest order "
    "forward — ONE shuffle on the key, no join, and no |events| x "
    "orders-per-user intermediate blow-up (both sides are fact-sized, "
    "so the old broadcast form was a driver OOM at scale). DuckDB "
    "oracle uses its native ASOF JOIN (pre-aggregated to a unique "
    "(key, time) grid so the match is unambiguous).",
)
def asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy("o_custkey", "o_orderdate").agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,2)")).cast("double").alias("day_total")
    )
    out = asof_join(
        ev.select("event_id", "user_id", "ts"),
        daily,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("o_orderdate").alias("last_order_date"),
        "day_total",
    )


@register(
    "lang_temperature_resample",
    """
    WITH counts AS (
        SELECT lang, COUNT(*) AS n_g FROM documents GROUP BY lang
    ),
    rated AS (
        SELECT lang, n_g,
               CAST(FLOOR(SQRT((SELECT MIN(n_g) FROM counts) / n_g) * 10000)
                    AS INT) AS rate_bp
        FROM counts
    )
    SELECT d.lang, r.n_g, r.rate_bp, COUNT(*) AS n_kept
    FROM documents d JOIN rated r ON d.lang = r.lang
    WHERE (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT)
          % 10000 < r.rate_bp
    GROUP BY d.lang, r.n_g, r.rate_bp
    """,
    "Temperature-based language rebalancing (post-sample sizes ∝ "
    "n_lang^0.5 — the multilingual-corpus flattening rule): per-lang "
    "keep rate (min_n/n_g)^0.5 derived from two broadcast aggregates "
    "of the corpus itself (no driver collect), md5-of-id selection in "
    "basis points. alpha=0.5 keeps the rate inside sqrt(), which IEEE "
    "rounds identically in both engines (pow() is only 1-ulp-faithful).",
)
def lang_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import temperature_resample

    d = _t(spark, sf_dir, "documents")
    kept = temperature_resample(d, alpha=0.5, key_col="lang", id_col="doc_id")
    return kept.groupBy("lang", "n_g", "rate_bp").agg(
        F.count("*").alias("n_kept")
    )


@register(
    "repeated_passages",
    """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    chunks AS (
        SELECT doc_id,
               array_to_string(ts[(g.i-1)*5+1:(g.i-1)*5+5], ' ') AS passage
        FROM toks, range(1, 100001) AS g(i)
        WHERE (g.i-1)*5+5 <= len(ts)
    )
    SELECT passage, COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_occurrences
    FROM chunks GROUP BY passage
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
    "Passage-level duplication scan (the sub-document complement of "
    "whole-doc dedup — boilerplate / licence-header / template "
    "detector): non-overlapping 5-word chunks, chunks appearing in 2+ "
    "distinct docs. One shuffle on the chunk; group sizes bounded by "
    "chunk frequency, which is exactly the quantity being measured.",
)
def repeated_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import repeated_passages as rp

    return rp(_t(spark, sf_dir, "documents"), chunk_words=5, min_docs=2)


@register(
    "corpus_shuffle_rank",
    """
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '-shuffle'), doc_id
           ) AS BIGINT) AS shuffle_pos
    FROM documents
    """,
    "Deterministic global training-order shuffle: every epoch-0 data "
    "loader needs a reproducible permutation of the corpus. Sort key "
    "is md5(id || salt) — reshuffle-proof and engine-portable; the "
    "global position comes from the distributed rank operator "
    "(repartitionByRange on the hash + per-partition offsets), NOT a "
    "single-partition ROW_NUMBER window, so it scales to 100 TB the "
    "same way o1_global_rank_scalable does.",
)
def corpus_shuffle_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import global_rank

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("-shuffle"))).alias(
            "__shuffle_key"
        ),
    )
    ranked = global_rank(
        d, F.col("__shuffle_key"), F.col("doc_id"), rank_col="shuffle_pos"
    )
    return ranked.select("doc_id", "shuffle_pos")


@register(
    "quality_filter_pipeline",
    """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    stats AS (
        SELECT t.doc_id,
               LENGTH(MIN(d.text)) AS n_chars_t,
               CAST(COUNT(DISTINCT t.tok) AS DOUBLE) / COUNT(*) AS ttr,
               CAST(COUNT(*) FILTER (WHERE t.tok IN ('the','a','of','and','to','in','is')) AS DOUBLE)
                   / COUNT(*) AS sw
        FROM tok t JOIN documents d USING (doc_id) GROUP BY t.doc_id
    ),
    qual AS (
        SELECT doc_id,
               (LEAST(n_chars_t / 500.0, 1.0) + ttr
                + GREATEST(1.0 - ABS(sw - 0.4) / 0.4, 0.0)) / 3.0 AS quality
        FROM stats
    ),
    toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    g2 AS (
        SELECT doc_id, COUNT(*) AS n2,
               COUNT(DISTINCT ts[g.i] || ' ' || ts[g.i+1]) AS d2
        FROM toks, range(1, 100001) AS g(i)
        WHERE g.i <= len(ts) - 1
        GROUP BY doc_id
    ),
    verdicts AS (
        SELECT d.source,
               CASE WHEN (1 - CAST(g2.d2 AS DOUBLE) / g2.n2) > 0.05
                      THEN 'drop_repetition'
                    WHEN q.quality < 0.40 THEN 'drop_quality'
                    ELSE 'keep' END AS verdict
        FROM documents d
        LEFT JOIN qual q ON q.doc_id = d.doc_id
        LEFT JOIN g2 ON g2.doc_id = d.doc_id
    )
    SELECT source, verdict, COUNT(*) AS n_docs
    FROM verdicts GROUP BY source, verdict
    """,
    "Composed quality gate — the filter stage a pre-training pipeline "
    "runs between dedup and mixing: repetition kill-rule first "
    "(dup-2gram fraction > 0.05, the C4/Gopher family), then the "
    "composite quality floor (0.40), per-source verdict accounting. "
    "Spark side is MAP-ONLY per doc (array expressions compute both "
    "signals in place, zero shuffle before the final tiny agg) where "
    "the oracle needs four grouped subqueries — the point of "
    "expression-level fusion at 100 TB.",
)
def quality_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import curation_projection, quality_verdict

    d = _t(spark, sf_dir, "documents")
    # curation_projection pre-projects the arrays so each materializes
    # once per row (the CollapseProject multi-reference rule — see
    # text_repetition_stats); the verdict column is shared with the
    # streaming curation sink (streaming/ingest.stream_documents_curation)
    # so both paths apply bit-identical rules.
    pre = curation_projection(d.select("source", "text"))
    return (
        pre.select("source", quality_verdict().alias("verdict"))
        .groupBy("source", "verdict")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "profile_documents",
    """
    SELECT 'doc_id' AS col_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(doc_id) AS n_null,
           COUNT(DISTINCT doc_id) AS n_distinct FROM documents
    UNION ALL
    SELECT 'text', COUNT(*), COUNT(*) - COUNT(text),
           COUNT(DISTINCT text) FROM documents
    UNION ALL
    SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang),
           COUNT(DISTINCT lang) FROM documents
    UNION ALL
    SELECT 'source', COUNT(*), COUNT(*) - COUNT(source),
           COUNT(DISTINCT source) FROM documents
    UNION ALL
    SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars),
           COUNT(DISTINCT n_chars) FROM documents
    """,
    "Dataset profile (the EDA first-look: reference eda.ipynb opens "
    "with exactly these null/distinct scans): one row per column with "
    "row/null/exact-distinct counts, computed in ONE pass + unpivoted "
    "via stack(). The oracle needs five scans. At 100 TB swap the "
    "exact distincts for approx_count_distinct (same plan minus the "
    "Expand).",
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import profile_table

    return profile_table(_t(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# curation: blocklist / PII / search / event compaction (r5 continuation)
# --------------------------------------------------------------------------

_BLOCKLIST_TERMS = ("slow", "error", "big")
_BLOCKLIST_MIN_HITS = 3


@register(
    "blocklist_filter_docs",
    """
    WITH hits AS (
        SELECT source,
               len(list_filter(string_split(text, ' '),
                               t -> t IN ('slow', 'error', 'big'))) AS n_hits
        FROM documents
    )
    SELECT source,
           CASE WHEN n_hits >= 3 THEN 'drop_blocklist' ELSE 'keep' END AS verdict,
           COUNT(*) AS n_docs,
           CAST(SUM(n_hits) AS BIGINT) AS total_hits
    FROM hits GROUP BY source, verdict
    """,
    "Dictionary blocklist gate (the C4-style banned-term filter every "
    "web-corpus pipeline runs before training): count occurrences of a "
    "broadcast term list per document, drop docs over the hit "
    "threshold, account per source. Spark side is MAP-ONLY — the term "
    "list is a literal IN inside an array filter lambda (no join, no "
    "shuffle before the tiny verdict agg), which is exactly how a "
    "~10k-term list should ship to 1000 executors: as task-closure "
    "bytes, never as a join side.",
)
def blocklist_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    n_hits = F.size(
        F.filter(
            F.split("text", " "), lambda t: t.isin(*_BLOCKLIST_TERMS)
        )
    )
    return (
        d.select("source", n_hits.alias("n_hits"))
        .select(
            "source",
            F.when(F.col("n_hits") >= _BLOCKLIST_MIN_HITS, "drop_blocklist")
            .otherwise("keep")
            .alias("verdict"),
            "n_hits",
        )
        .groupBy("source", "verdict")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_hits").alias("total_hits"),
        )
    )


_PII_EMAIL_RE = r"[A-Za-z0-9_.]+@[A-Za-z0-9.]+\.[a-z][a-z]+"
_PII_PHONE_RE = r"\d\d\d-\d\d\d\d"


@register(
    "pii_redact_scan",
    r"""
    WITH seeded AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0
                    THEN text || ' contact user' || doc_id
                         || '@mail.example.com or 555-0'
                         || CAST(100 + doc_id % 900 AS VARCHAR)
                    ELSE text END AS t2
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t2,
               '[A-Za-z0-9_.]+@[A-Za-z0-9.]+\.[a-z][a-z]+')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(t2, '\d\d\d-\d\d\d\d')) AS INT) AS n_phones,
           md5(regexp_replace(
               regexp_replace(t2,
                   '[A-Za-z0-9_.]+@[A-Za-z0-9.]+\.[a-z][a-z]+', '<EMAIL>', 'g'),
               '\d\d\d-\d\d\d\d', '<PHONE>', 'g')) AS redacted_md5
    FROM seeded
    WHERE len(regexp_extract_all(t2,
              '[A-Za-z0-9_.]+@[A-Za-z0-9.]+\.[a-z][a-z]+'))
          + len(regexp_extract_all(t2, '\d\d\d-\d\d\d\d')) > 0
    """,
    "PII scrub kernel: regex detection counts + redaction "
    "(email/phone -> placeholder tokens), emitting only documents that "
    "contained PII, with an md5 of the redacted text so the oracle "
    "checks the full rewritten string. The fixture corpus is synthetic "
    "word-salad with no organic PII, so the query deterministically "
    "seeds one email + one phone into every 7th document BEFORE "
    "scanning (mirrored in the oracle) — the redaction path is "
    "exercised on real matches, not vacuously green. Map-only "
    "codegen (regexp_extract_all / regexp_replace are JVM "
    "expressions); patterns are restricted to the regex subset with "
    "identical semantics in Java regex and DuckDB's RE2.",
)
def pii_redact_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    seeded = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example.com or 555-0"),
                (F.lit(100) + F.col("doc_id") % 900).cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("t2"),
    )
    n_emails = F.size(F.regexp_extract_all("t2", F.lit(_PII_EMAIL_RE), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all("t2", F.lit(_PII_PHONE_RE), F.lit(0)))
    redacted = F.regexp_replace(
        F.regexp_replace("t2", _PII_EMAIL_RE, "<EMAIL>"),
        _PII_PHONE_RE,
        "<PHONE>",
    )
    return (
        seeded.select(
            "doc_id",
            n_emails.cast("int").alias("n_emails"),
            n_phones.cast("int").alias("n_phones"),
            F.md5(redacted).alias("redacted_md5"),
        )
        .where(F.col("n_emails") + F.col("n_phones") > 0)
    )


_BM25_QUERY_TERMS = ("spark", "merge", "vector")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20


@register(
    "bm25_keyword_search",
    """
    WITH dl AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
        FROM documents
    ),
    corpus AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl
    ),
    tf AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents)
        WHERE tok IN ('spark', 'merge', 'vector')
        GROUP BY doc_id, tok
    ),
    dfreq AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
    contrib AS (
        SELECT t.doc_id,
               CAST(ROUND(((c.n_docs - f.df + 0.5) / (f.df + 0.5))
                    * ((t.tf * 2.2)
                       / (t.tf + 1.2 * (0.25 + 0.75 * (d.dl / c.avgdl))))
                    * 1e12) AS BIGINT) AS sc
        FROM tf t
        JOIN dfreq f USING (tok)
        JOIN dl d USING (doc_id)
        CROSS JOIN corpus c
    )
    SELECT doc_id, score_scaled,
           CAST(score_scaled AS DOUBLE) / 1e12 AS score,
           rnk
    FROM (
        SELECT doc_id, CAST(SUM(sc) AS BIGINT) AS score_scaled,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY CAST(SUM(sc) AS BIGINT) DESC, doc_id) AS INT) AS rnk
        FROM contrib GROUP BY doc_id
    ) WHERE rnk <= 20
    """,
    "BM25 keyword retrieval (k1=1.2, b=0.75) over the corpus for a "
    "fixed query-term set: per-term contributions use the rational "
    "Lucene-style idf (N - df + 0.5)/(df + 0.5) — no transcendental "
    "log, so every intermediate is bit-portable IEEE arithmetic — and "
    "per-doc totals are summed as ROUND(x*1e12) BIGINTs so the "
    "cross-term addition is order-free (double += is not associative; "
    "a distributed sum must not depend on term arrival order). "
    "avgdl sums integer-valued doubles (exact at any partitioning). "
    "Scale shape: tf is filtered to the query terms BEFORE the "
    "groupBy (the explode never shuffles non-query tokens), df and "
    "the corpus constants are 1-row/3-row broadcasts, and the only "
    "corpus-wide shuffle is the per-doc tf agg. Top-k via "
    "rank-with-tiebreak on the exact scaled score.",
)
def bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    dl = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("double").alias("dl")
    )
    corpus = dl.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok").isin(*_BM25_QUERY_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").cast("double").alias("df"))
    k1 = F.lit(_BM25_K1)
    contrib = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            F.round(
                ((F.col("n_docs") - F.col("df") + F.lit(0.5))
                 / (F.col("df") + F.lit(0.5)))
                * ((F.col("tf") * F.lit(_BM25_K1 + 1.0))
                   / (F.col("tf")
                      + k1 * (F.lit(1.0 - _BM25_B)
                              + F.lit(_BM25_B) * (F.col("dl") / F.col("avgdl")))))
                * F.lit(1e12)
            )
            .cast("bigint")
            .alias("sc"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.sum("sc").cast("bigint").alias("score_scaled")
    )
    # Global top-k via TakeOrderedAndProject (per-partition k-row heaps,
    # k rows per partition cross the wire) — never a corpus-wide
    # single-partition row_number window.  The rank column is attached
    # AFTER the limit, so its window sorts exactly k rows.
    from ..operators.topk import top_k

    w = Window.orderBy(F.desc("score_scaled"), F.asc("doc_id"))
    return (
        top_k(scored, _BM25_TOPK, F.desc("score_scaled"), F.asc("doc_id"))
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .select(
            "doc_id",
            "score_scaled",
            (F.col("score_scaled").cast("double") / F.lit(1e12)).alias("score"),
            "rnk",
        )
    )


@register(
    "dedup_consecutive_events",
    """
    WITH ordered AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_total,
           CAST(COUNT(*) FILTER (WHERE prev IS NULL OR prev <> event_type)
                AS BIGINT) AS n_kept
    FROM ordered GROUP BY event_type
    """,
    "Consecutive-duplicate compaction (stream change-detection): per "
    "user, an event is kept only when its type differs from the "
    "previous event's — the standard signal-compression pass before "
    "sessionized modeling, with per-type kept/total accounting. One "
    "hash-partitioned window on user_id (no global sort; ties broken "
    "by event_id so the result is total-order deterministic), then a "
    "tiny agg. At 100 TB the lag window shuffles once on user_id and "
    "each partition sorts locally — the same shape Kafka-compaction "
    "jobs use.",
)
def dedup_consecutive_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    )
    kept = F.when(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type")), 1
    ).otherwise(0)
    return ordered.groupBy("event_type").agg(
        F.count("*").alias("n_total"),
        F.sum(kept).cast("bigint").alias("n_kept"),
    )


# --------------------------------------------------------------------------
# Spark-4 sketch aggregates: mergeable HLL + top-k sketch
# --------------------------------------------------------------------------


@register(
    "hll_sketch_union_estimate",
    None,
    "Mergeable distinct-count rollup via Apache DataSketches HLL "
    "(Spark 3.5+ hll_sketch_agg / hll_union_agg): per-type user "
    "sketches, then a sketch UNION for the global row — the estimate "
    "comes from merging the per-group sketches, never from rescanning "
    "rows. This is the 100 TB distinct-count pattern the plain "
    "approx_count_distinct (a2) can't give you: persist per-day/ "
    "per-source sketch tables (a few KB each) and answer any "
    "cross-slice distinct question by sketch union alone. Rows-only "
    "by design: the HLL register layout is engine-specific, so DuckDB "
    "cannot reproduce the bytes; tests/test_north_star.py pins the "
    "semantics instead (±2% of exact, and union-of-groups == "
    "direct whole-corpus sketch, which also proves merge "
    "order-insensitivity across partitionings).",
)
def hll_sketch_union_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    per_est = per.select(
        "event_type", F.hll_sketch_estimate("sk").alias("approx_users")
    )
    total = (
        per.agg(F.hll_union_agg("sk").alias("sk"))
        .select(
            F.lit("ALL").alias("event_type"),
            F.hll_sketch_estimate("sk").alias("approx_users"),
        )
    )
    return per_est.unionByName(total)


_APPROX_TOPK_CAPACITY = 100
_APPROX_TOPK_K = 10


@register(
    "approx_topk_terms",
    """
    SELECT term, n, rnk FROM (
        SELECT tok AS term, COUNT(*) AS n,
               CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS INT)
                   AS rnk
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY tok
    ) WHERE rnk <= 10
    """,
    "Heavy-hitter terms via the Spark 4 approx_top_k sketch. The "
    "sketch is requested with capacity 100 >> the fixture vocabulary, "
    "and within capacity its counts are EXACT — so the entry is fully "
    "hash-checkable against the exact top-10 oracle (the same "
    "capacity-exactness argument as the portable MinHash twins). The "
    "deterministic rank/tiebreak is applied by re-sorting the "
    "returned (item,count) pairs, never trusting the sketch's "
    "internal tie order. At 100 TB vocabulary the same plan stays "
    "one partial-sketch-per-partition + single merge — no shuffle of "
    "token rows at all, unlike the exact groupBy twin — at the price "
    "of approximation once items exceed capacity. The post-sketch "
    "window sorts <= capacity rows (bounded by construction).",
)
def approx_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
    sketch = toks.agg(
        F.expr(f"approx_top_k(tok, {_APPROX_TOPK_CAPACITY})").alias("tk")
    )
    pairs = sketch.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("term"), F.col("e.count").alias("n")
    )
    w = Window.orderBy(F.desc("n"), F.asc("term"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= _APPROX_TOPK_K)
    )


@register(
    "events_hourly_gapfill",
    """
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi FROM events
    ),
    spine AS (
        SELECT t.et AS event_type, g.ts AS bucket
        FROM (SELECT DISTINCT event_type AS et FROM events) t,
             bounds b,
             LATERAL (SELECT unnest(generate_series(b.lo, b.hi,
                                    INTERVAL 1 HOUR)) AS ts) g
    ),
    agg AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_scaled
        FROM events GROUP BY 1, 2
    )
    SELECT s.event_type, CAST(s.bucket AS VARCHAR) AS bucket_key,
           COALESCE(a.n, 0) AS n,
           COALESCE(a.sum_scaled, 0) AS sum_scaled,
           CAST(last_value(a.sum_scaled IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS locf_sum_scaled
    FROM spine s LEFT JOIN agg a USING (event_type, bucket)
    """,
    "Time-series gap fill (TimescaleDB time_bucket_gapfill parity): "
    "a dense hourly spine per event type — generated with sequence() "
    "from a 1-row bounds aggregate, never collected to the driver — "
    "left-joined to the bucketed aggregates; empty buckets zero-fill "
    "counts and last-observation-carry-forward the value via "
    "last(ignorenulls) over the time window. Values accumulate as "
    "per-row scaled bigints (ROUND(value*100) per ROW, then an exact "
    "integer sum) so the grouped sum is partitioning-order-free. "
    "Scale: spine cardinality grows with TIME x type, not data volume "
    "(10 years of hours = 87.6k rows/type), so the LOCF window's "
    "per-type sequential scan is bounded by the calendar; the only "
    "data-sized shuffle is the bucket aggregation, which map-side "
    "combines to one row per (type, hour) before the exchange.",
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    types = ev.select(F.col("event_type")).distinct()
    spine = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket"),
        )
    )
    agg = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("sum_scaled"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = spine.join(agg, ["event_type", "bucket"], "left")
    return joined.select(
        "event_type",
        F.col("bucket").cast("string").alias("bucket_key"),
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("sum_scaled", F.lit(0)).alias("sum_scaled"),
        F.last("sum_scaled", ignorenulls=True)
        .over(w)
        .cast("double")
        .alias("locf_sum_scaled"),
    )


@register(
    "running_distinct_users",
    """
    SELECT event_type, event_id,
           CAST(COUNT(DISTINCT user_id) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS run_distinct
    FROM events
    """,
    "Running distinct-user count per event type (audience-growth "
    "curve). Spark has no DISTINCT aggregate over a window frame, and "
    "the naive composition size(collect_set() OVER w) materializes "
    "the full set ARRAY for every row — O(rows x distinct) work and "
    "memory (measured 6x slower at sf0.1). The scalable identity: a "
    "row adds to the running distinct count iff it is its user's "
    "FIRST row in the partition, so run_distinct = running SUM of a "
    "first-occurrence flag — two O(n) windows (flag: partition by "
    "(type, user); cumsum: partition by type), both plain codegen "
    "aggregates, no per-row set. Both windows shuffle once each with "
    "(ts, event_id) total-order tiebreaks.",
)
def running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w_first = Window.partitionBy("event_type", "user_id").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "event_type",
        "event_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("__f"),
    )
    return flagged.select(
        "event_type",
        "event_id",
        F.sum("__f").over(w_run).cast("bigint").alias("run_distinct"),
    )


# --------------------------------------------------------------------------
# data-quality expectations
# --------------------------------------------------------------------------


@register(
    "dq_expectations_report",
    """
    SELECT 'orders.pk_unique' AS rule,
           (SELECT COUNT(*) FROM orders) AS n_checked,
           (SELECT COUNT(*) FROM (
                SELECT o_orderkey FROM orders
                GROUP BY o_orderkey HAVING COUNT(*) > 1)) AS n_violations
    UNION ALL
    SELECT 'lineitem.fk_orders',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'lineitem.qty_range',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
            FROM lineitem)
    UNION ALL
    SELECT 'lineitem.discount_range',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1)
            FROM lineitem)
    UNION ALL
    SELECT 'customer.name_not_null',
           (SELECT COUNT(*) FROM customer),
           (SELECT COUNT(*) - COUNT(c_name) FROM customer)
    """,
    "Declarative data-quality gate (the Great Expectations / dbt-test "
    "/ Delta-constraint role): a rule set — primary-key uniqueness, "
    "referential integrity, value ranges, null "
    "contract — evaluated into one (rule, n_checked, n_violations) "
    "report. Execution shape: all row-local rules on one table fuse "
    "into a SINGLE scan of conditional aggregates (the oracle spells "
    "them as separate subqueries; Spark computes lineitem's three "
    "rules in one pass), the pk rule is a digest-style groupBy on the "
    "key only, and the fk rule is a left-anti join that AQE can "
    "broadcast when the dimension fits. At 100 TB this is the nightly "
    "contract job: one scan per fact table + one join per fk, nothing "
    "quadratic, report size = number of rules.",
)
def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")

    def row(rule: str, n_checked, n_violations) -> DataFrame:
        return n_checked.crossJoin(n_violations).select(
            F.lit(rule).alias("rule"), "n_checked", "n_violations"
        )

    o_n = orders.agg(F.count("*").alias("n_checked"))
    pk_dupes = (
        orders.groupBy("o_orderkey")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") > 1)
        .agg(F.count("*").alias("n_violations"))
    )

    li_stats = li.agg(
        F.count("*").alias("n_checked"),
        F.sum(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
            .otherwise(0)
        ).alias("v_qty"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1)
            .otherwise(0)
        ).alias("v_disc"),
    ).persist()
    li_n = li_stats.select("n_checked")
    fk_orphans = (
        li.join(orders.select("o_orderkey"),
                li["l_orderkey"] == F.col("o_orderkey"), "left_anti")
        .agg(F.count("*").alias("n_violations"))
    )

    c_stats = cust.agg(
        F.count("*").alias("n_checked"),
        (F.count("*") - F.count("c_name")).alias("n_violations"),
    )

    return (
        row("orders.pk_unique", o_n, pk_dupes)
        .unionByName(row("lineitem.fk_orders", li_n, fk_orphans))
        .unionByName(
            li_stats.select(
                F.lit("lineitem.qty_range").alias("rule"),
                "n_checked",
                F.col("v_qty").alias("n_violations"),
            )
        )
        .unionByName(
            li_stats.select(
                F.lit("lineitem.discount_range").alias("rule"),
                "n_checked",
                F.col("v_disc").alias("n_violations"),
            )
        )
        .unionByName(
            c_stats.select(F.lit("customer.name_not_null").alias("rule"),
                           "n_checked", "n_violations")
        )
    )


# --------------------------------------------------------------------------
# iterative graph: co-purchase PageRank
# --------------------------------------------------------------------------

_PR_SCALE = 1_000_000_000_000_000  # 1e15 as an exact integer
_PR_ITERS = 3
_PR_TOPK = 20


@register(
    "pagerank_part_affinity",
    """
    WITH pairs AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM pairs GROUP BY src),
    n AS (SELECT COUNT(*) AS n_nodes FROM deg),
    base AS (SELECT ((1000000000000000 // n_nodes) * 15) // 100 AS b FROM n),
    pr0 AS (SELECT src AS node, 1000000000000000 // n.n_nodes AS pr
            FROM deg, n),
    it1 AS (
        SELECT p.dst AS node,
               b.b + (85 * CAST(SUM(pr0.pr // deg.d) AS BIGINT)) // 100 AS pr
        FROM pairs p JOIN pr0 ON pr0.node = p.src
        JOIN deg ON deg.src = p.src CROSS JOIN base b
        GROUP BY p.dst, b.b
    ),
    it2 AS (
        SELECT p.dst AS node,
               b.b + (85 * CAST(SUM(it1.pr // deg.d) AS BIGINT)) // 100 AS pr
        FROM pairs p JOIN it1 ON it1.node = p.src
        JOIN deg ON deg.src = p.src CROSS JOIN base b
        GROUP BY p.dst, b.b
    ),
    it3 AS (
        SELECT p.dst AS node,
               b.b + (85 * CAST(SUM(it2.pr // deg.d) AS BIGINT)) // 100 AS pr
        FROM pairs p JOIN it2 ON it2.node = p.src
        JOIN deg ON deg.src = p.src CROSS JOIN base b
        GROUP BY p.dst, b.b
    )
    SELECT partkey, pr_scaled, CAST(pr_scaled AS DOUBLE) / 1e15 AS pr, rnk
    FROM (
        SELECT node AS partkey, pr AS pr_scaled,
               CAST(ROW_NUMBER() OVER (ORDER BY pr DESC, node) AS INT) AS rnk
        FROM it3
    ) WHERE rnk <= 20
    """,
    "Iterative PageRank (3 damped iterations, d=0.85) over the "
    "co-purchase part graph — the canonical iterative-algorithm shape "
    "Spark's DataFrame API handles with a driver-side LOOP over a "
    "distributed plan. Every quantity is exact integer arithmetic at "
    "scale 1e15 (init mass, damping as *85//100, contributions as "
    "pr//degree): a float PageRank would accumulate neighbor "
    "contributions in partition order and never hash-match across "
    "engines; integer truncation makes each iteration a pure function "
    "of the previous one. Scale shape: edges build from an "
    "order-key-partitioned self-join (per-order fanout is bounded by "
    "order size), the static per-node degree is folded INTO the "
    "persisted edge list up front (src, dst, d) so each superstep is "
    "ONE join (edges x rank) + one shuffle on dst instead of the "
    "textbook two joins — measured 2.2x cold at sf0.1 — the same "
    "per-superstep cost as Pregel. For "
    "100+ iterations, checkpoint every ~10 to cut lineage; 3 "
    "iterations keep the DAG shallow enough not to need it. Nodes "
    "are parts with at least one co-purchase edge (isolated parts "
    "carry no rank mass to move).",
)
def pagerank_part_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.topk import top_k

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )
    deg = pairs.groupBy("src").agg(F.count("*").alias("d"))
    # degree is static across supersteps: fold it into the persisted
    # edge list once so the loop body joins a single relation
    pairs_w = pairs.join(deg, "src").persist()
    n = pairs_w.agg(F.countDistinct("src").alias("n_nodes"))
    base = n.select(
        F.expr(
            f"((CAST({_PR_SCALE} AS BIGINT) div n_nodes) * 15) div 100"
        ).alias("b")
    )
    # integer division: expr("x div y") (Column./ is double division)
    pr = pairs_w.select("src").distinct().crossJoin(F.broadcast(n)).select(
        F.col("src").alias("node"),
        F.expr(f"CAST({_PR_SCALE} AS BIGINT) div n_nodes").alias("pr"),
    )
    for _ in range(_PR_ITERS):
        contrib = (
            pairs_w.join(pr, pairs_w["src"] == pr["node"])
            .select("dst", F.expr("pr div d").alias("c"))
        )
        pr = (
            contrib.groupBy("dst")
            .agg(F.sum("c").cast("bigint").alias("sc"))
            .crossJoin(F.broadcast(base))
            .select(
                F.col("dst").alias("node"),
                (F.col("b") + F.expr("(85 * sc) div 100")).alias("pr"),
            )
        )
    final = pr.select(F.col("node").alias("partkey"), F.col("pr").alias("pr_scaled"))
    w = Window.orderBy(F.desc("pr_scaled"), F.asc("partkey"))
    return (
        top_k(final, _PR_TOPK, F.desc("pr_scaled"), F.asc("partkey"))
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .select(
            "partkey",
            "pr_scaled",
            (F.col("pr_scaled").cast("double") / F.lit(1e15)).alias("pr"),
            "rnk",
        )
    )


@register(
    "scd2_user_state_history",
    """
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events
    ),
    changes AS (
        SELECT user_id, event_type AS state, ts, event_id
        FROM ordered WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, state,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               AS is_current
    FROM changes
    """,
    "Slowly-changing-dimension type-2 build: compress each user's "
    "event-type stream into state intervals — change detection via "
    "lag (a row opens an interval iff its state differs from the "
    "previous row's), validity bounds via lead over the surviving "
    "change rows, open intervals flagged is_current. The standard "
    "dimension-history derivation every warehouse runs nightly, as "
    "two windows over ONE hash partitioning on user_id (the second "
    "window reuses the first's exchange — no extra shuffle), fully "
    "tiebroken on (ts, event_id).",
)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev"),
    )
    changes = ordered.where(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    ).select("user_id", F.col("event_type").alias("state"), "ts", "event_id")
    return changes.select(
        "user_id",
        "state",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


# --------------------------------------------------------------------------
# weighted sampling (priority / DLT sampling) over the corpus
# --------------------------------------------------------------------------

_PS_K = 100

# DuckDB mirror of operators/sampling.py's exact-integer priority key:
# same md5-derived u, same 16^15 (= 2^60) scale, same integer division,
# so the key — and therefore the sample — is bit-for-bit identical.
_PS_KEY = PRIORITY_KEY_SQL.format(w="n_chars", id="doc_id", scale=16**15)


@register(
    "priority_sample_docs",
    f"""
    WITH scored AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
               CAST({_PS_KEY} AS HUGEINT) AS pri
        FROM documents
        WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    top AS (
        SELECT doc_id, weight, pri,
               ROW_NUMBER() OVER (ORDER BY pri DESC, doc_id) AS rn
        FROM scored
        ORDER BY pri DESC, doc_id
        LIMIT {_PS_K + 1}
    ),
    tau AS (
        SELECT CASE WHEN COUNT(*) > {_PS_K} THEN MIN(pri)
                    ELSE CAST(0 AS HUGEINT) END AS tau
        FROM top
    )
    SELECT doc_id, weight,
           CAST(pri AS VARCHAR) AS priority,
           GREATEST(CAST(weight AS DOUBLE), CAST(tau AS DOUBLE)) AS est_weight
    FROM top CROSS JOIN tau
    WHERE rn <= {_PS_K}
    """,
    "Deterministic weighted sampling without replacement (priority "
    "sampling, Duffield-Lund-Thorup JACM'07) of documents by n_chars: "
    "the curation layer's importance-sampling primitive (sample big/"
    "high-quality docs preferentially while keeping ANY subset sum "
    "unbiasedly estimable via est_weight = max(w, tau)). u derives "
    "from md5(doc_id) so the sample is a pure function of the data — "
    "identical under any partitioning, re-run, or engine — and the "
    "priority key w*2^60 div (u+1) is exact DECIMAL(38,0) integer "
    "arithmetic mirrored bit-for-bit in the DuckDB oracle "
    "(PRIORITY_KEY_SQL). Scale shape: ONE TakeOrderedAndProject "
    "(per-partition k+1 heaps, no global sort, no shuffle of the "
    "corpus) then a SinglePartition window over the surviving k+1 "
    "rows derives tau and the k-row cut in the same pass — the corpus "
    "is scanned exactly once (plan-pinned in tests/test_sampling.py).",
)
def priority_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import priority_sample

    docs = _t(spark, sf_dir, "documents")
    # priority rides as a STRING: the exact integer exceeds 2^53 for
    # large keys, and DuckDB lowers DECIMAL(38,0) to lossy float64 in
    # pandas — digits-as-text is the portable exact representation
    return priority_sample(docs, "doc_id", "n_chars", _PS_K).withColumn(
        "priority", F.col("priority").cast("string")
    )


_PSG_K = 20


@register(
    "priority_sample_by_lang",
    f"""
    WITH scored AS (
        SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS weight,
               CAST({_PS_KEY} AS HUGEINT) AS pri
        FROM documents
        WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                     ORDER BY pri DESC, doc_id) AS rn
        FROM scored
    ),
    tau AS (
        SELECT lang, MAX(CASE WHEN rn = {_PSG_K + 1} THEN pri END) AS tau_raw
        FROM ranked GROUP BY lang
    )
    SELECT r.lang, doc_id, weight,
           CAST(pri AS VARCHAR) AS priority,
           GREATEST(CAST(weight AS DOUBLE),
                    CAST(COALESCE(tau_raw, 0) AS DOUBLE)) AS est_weight
    FROM ranked r JOIN tau t ON r.lang = t.lang
    WHERE rn <= {_PSG_K}
    """,
    "Per-stratum DLT weighted sampling: an independent 20-doc "
    "priority sample (and threshold tau) per language — the "
    "per-domain budget allocator of a training mix, with per-group "
    "subset sums still unbiasedly estimable from est_weight. Scale "
    "shape (operators/sampling.py priority_sample_grouped): a naive "
    "PARTITION BY lang window sorts one straggler partition per hot "
    "language; instead window 1 keys on (lang, input-partition-id) so "
    "hot groups spread over every partition and contribute local "
    "top-(k+1)s, and window 2 ranks only the pruned (k+1) x P rows "
    "per group — provably identical output (a group's global "
    "top-(k+1) row survives any local prune; pinned against the "
    "naive window in tests). Same exact-integer md5 priority key as "
    "priority_sample_docs, mirrored bit-for-bit in this oracle.",
)
def priority_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import priority_sample_grouped

    docs = _t(spark, sf_dir, "documents")
    return priority_sample_grouped(
        docs, "doc_id", "n_chars", _PSG_K, "lang"
    ).withColumn("priority", F.col("priority").cast("string"))


_TB_BUDGET = 100_000


@register(
    "sample_token_budget_docs",
    f"""
    WITH scored AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
               CAST({_PS_KEY} AS HUGEINT) AS pri
        FROM documents
        WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    c AS (
        SELECT doc_id, w, pri,
               SUM(w) OVER (ORDER BY pri DESC, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum_end
        FROM scored
    )
    SELECT doc_id, w AS n_tokens, CAST(cum_end - w AS BIGINT) AS cum_start
    FROM c WHERE cum_end - w < {_TB_BUDGET}
    """,
    "Token-budget corpus fill: take documents in DLT-priority order "
    "(weight-biased, deterministic in the data) until their "
    "cumulative token count reaches the budget — the 'fill a "
    "10B-token training mix' primitive; a doc is kept iff the budget "
    "was not exhausted when its turn came, so the set overshoots by "
    "at most one document and is identical under any partitioning, "
    "re-run, or engine. Scale shape (operators/sampling.py "
    "sample_token_budget): the oracle's global running-sum window "
    "would execute on ONE partition in Spark; the builder instead "
    "runs a DISTRIBUTED PREFIX SUM — TeraSort-style range exchange "
    "on (priority desc, id), per-partition local running sums, and a "
    "P-row offset relation (running sum of per-partition totals) "
    "broadcast back — exact bigint arithmetic end to end, invariant "
    "to the sampled range boundaries (only range disjointness is "
    "used, which repartitionByRange guarantees).",
)
def sample_token_budget_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import sample_token_budget

    docs = _t(spark, sf_dir, "documents")
    return sample_token_budget(docs, "doc_id", "n_chars", _TB_BUDGET)


@register(
    "text_metrics_arrow",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_exact,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
    """,
    "mapInArrow surface demo (completes the Python-UDF API family "
    "next to the applyInPandas escape hatch `znorm_user_values` and "
    "the UDTF `text_passage_chunks_udtf`): per-doc char/token counts "
    "computed by Arrow COMPUTE KERNELS (utf8_length, count_substring) "
    "directly on the record batches — no pandas materialization, no "
    "per-row Python, zero-copy in and out; the fastest Python-side "
    "path when a kernel exists for the transform. Token rule matches "
    "split-on-space exactly (count_substring(' ')+1 == "
    "len(string_split)), NULL text propagates NULL through both "
    "engines. Like every escape-hatch demo in this catalog, the "
    "production advice stays: the pure-codegen twin (`text_stats`) "
    "is the hot-path shape; this entry exists so the mapInArrow "
    "plumbing (schema contract, batch iteration, Arrow-only types) "
    "is exercised and hash-verified. Measured at sf0.1 (median of 5, "
    "local[32]): codegen twin 0.10s, this mapInArrow 0.44s, a "
    "mapInPandas twin 0.29s — at this scale BOTH Python paths are "
    "dominated by the worker round-trip, so arrow-vs-pandas only "
    "separates on wide/large batches where the pandas conversion "
    "costs; the 4x codegen gap is the number to remember.",
)
def text_metrics_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def batches(it):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in it:
            text = b.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(
                        pc.add(pc.count_substring(text, pattern=" "), 1),
                        pa.int64(),
                    ),
                ],
                ["doc_id", "n_chars_exact", "n_tokens"],
            )

    return docs.mapInArrow(
        batches, "doc_id bigint, n_chars_exact bigint, n_tokens bigint"
    )


@register(
    "latest_event_per_user",
    """
    WITH ranked AS (
        SELECT user_id, event_id, event_type, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id, event_id, event_type, ts FROM ranked WHERE rn = 1
    """,
    "Keep-latest dedup (CDC/log-compaction semantics): one row per "
    "key, the newest by (ts, event_id) — what a Kafka-compacted topic "
    "or an upsert-materialization read does on every poll. ONE window "
    "on one user_id exchange with a rn=1 cut; the (ts, event_id) "
    "total order makes the survivor deterministic under ties, and no "
    "self-join/groupBy-max-then-join-back shape is needed (the "
    "classic 2-shuffle anti-pattern this entry exists to replace). "
    "At 100 TB the exchange partitions by key and AQE handles hot "
    "keys; for repeated reads the MERGE path (merge_upsert) "
    "materializes the same result incrementally instead.",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.select("user_id", "event_id", "event_type", "ts",
                  F.row_number().over(w).alias("__rn"))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


# --------------------------------------------------------------------------
# tokenizer statistics + hybrid retrieval (r7)
# --------------------------------------------------------------------------


@register(
    "bpe_pair_counts",
    """
    WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    wf AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM words WHERE len(w) >= 2 GROUP BY w
    ),
    pairs AS (
        SELECT substr(w, CAST(i AS INT), 2) AS pair, cnt FROM (
            SELECT w, cnt, unnest(range(1, len(w))) AS i FROM wf
        )
    )
    SELECT pair, pair_count, rnk FROM (
        SELECT pair, CAST(SUM(cnt) AS BIGINT) AS pair_count,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY SUM(cnt) DESC, pair) AS INT) AS rnk
        FROM pairs GROUP BY pair
    ) WHERE rnk <= 50
    """,
    "BPE tokenizer training, first merge step: corpus-weighted counts "
    "of adjacent symbol pairs (character bigrams inside whitespace "
    "words), top-50 by frequency — the argmax of this relation is the "
    "pair a BPE trainer would merge first. The scale trick is the one "
    "real BPE trainers use: aggregate the corpus to a word-frequency "
    "VOCAB first (one corpus-wide shuffle of bare tokens; Heaps' law "
    "makes the vocab sublinear in corpus size), then explode each "
    "DISTINCT word into its pairs weighted by cnt — pair counting "
    "never touches corpus-sized data again, and further BPE "
    "iterations would rewrite only the vocab relation. Pair domain is "
    "bounded by alphabet^2, so the final rank window orders a "
    "constant-size relation. Exact integer counts end to end.",
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    wf = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    pairs = wf.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "cnt",
    )
    agg = pairs.groupBy("pair").agg(F.sum("cnt").alias("pair_count"))
    w = Window.orderBy(F.desc("pair_count"), F.asc("pair"))
    return (
        agg.select(
            "pair",
            "pair_count",
            F.row_number().over(w).cast("int").alias("rnk"),
        )
        .where(F.col("rnk") <= 50)
    )


@register(
    "hybrid_search_rrf",
    """
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id = 0),
    prs AS (
        SELECT c.vec_id AS neighbor_id, q.embedding AS qe, c.embedding AS ce
        FROM embeddings c, q WHERE c.vec_id != q.vec_id
    ),
    dots AS (
        SELECT neighbor_id,
               CAST(SUM(CAST(ROUND(CAST(qe[g.i] AS DOUBLE) * CAST(ce[g.i] AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT) AS dot_i,
               CAST(SUM(CAST(ROUND(CAST(qe[g.i] AS DOUBLE) * CAST(qe[g.i] AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT) AS qq_i,
               CAST(SUM(CAST(ROUND(CAST(ce[g.i] AS DOUBLE) * CAST(ce[g.i] AS DOUBLE) * 1e12) AS BIGINT)) AS BIGINT) AS cc_i
        FROM prs, generate_series(1, 64) AS g(i)
        GROUP BY neighbor_id
    ),
    dense AS (
        SELECT neighbor_id AS doc_id, CAST(rank AS INT) AS dense_rank FROM (
            SELECT neighbor_id,
                   ROW_NUMBER() OVER (
                       ORDER BY ROUND((dot_i / 1e12)
                           / (sqrt(qq_i / 1e12) * sqrt(cc_i / 1e12)), 3) DESC,
                           neighbor_id) AS rank
            FROM dots
        ) WHERE rank <= 20
    ),
    dl AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
        FROM documents
    ),
    corpus AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl
    ),
    tf AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents)
        WHERE tok IN ('spark', 'merge', 'vector')
        GROUP BY doc_id, tok
    ),
    dfreq AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
    contrib AS (
        SELECT t.doc_id,
               CAST(ROUND(((c.n_docs - f.df + 0.5) / (f.df + 0.5))
                    * ((t.tf * 2.2)
                       / (t.tf + 1.2 * (0.25 + 0.75 * (d.dl / c.avgdl))))
                    * 1e12) AS BIGINT) AS sc
        FROM tf t
        JOIN dfreq f USING (tok)
        JOIN dl d USING (doc_id)
        CROSS JOIN corpus c
    ),
    sparse AS (
        SELECT doc_id, rnk AS sparse_rank FROM (
            SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (
                       ORDER BY CAST(SUM(sc) AS BIGINT) DESC, doc_id) AS INT) AS rnk
            FROM contrib GROUP BY doc_id
        ) WHERE rnk <= 20
    ),
    fused AS (
        SELECT COALESCE(d.doc_id, s.doc_id) AS doc_id,
               CAST(COALESCE(CAST(ROUND(1e12 / (60 + d.dense_rank)) AS BIGINT), 0)
                  + COALESCE(CAST(ROUND(1e12 / (60 + s.sparse_rank)) AS BIGINT), 0)
                    AS BIGINT) AS rrf_scaled,
               CAST(COALESCE(d.dense_rank, 0) AS INT) AS dense_rank,
               CAST(COALESCE(s.sparse_rank, 0) AS INT) AS sparse_rank
        FROM dense d FULL OUTER JOIN sparse s ON d.doc_id = s.doc_id
    )
    SELECT doc_id, rrf_scaled, dense_rank, sparse_rank, rnk FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            ORDER BY rrf_scaled DESC, doc_id) AS INT) AS rnk
        FROM fused
    ) WHERE rnk <= 10
    """,
    "Hybrid retrieval via reciprocal-rank fusion (k=60): the dense leg "
    "is exact cosine top-20 for query vector 0 (brute_force_topk — the "
    "same scaled-int portable cosine as knn_bruteforce_cosine), the "
    "sparse leg is the BM25 top-20 of bm25_keyword_search, and fusion "
    "scores sum ROUND(1e12/(60+rank)) per leg as exact BIGINTs "
    "(doc absent from a leg contributes 0; absent ranks surface as 0). "
    "Both legs end in top-k reductions, so the full-outer fusion join "
    "sees two <=k-row relations — broadcast-sized no matter how big "
    "the corpus or index is; at 100 TB each leg scales independently "
    "(IVF/LSH for dense, posting-list pruning for sparse) and the "
    "fusion cost stays O(k). This is the standard RAG retrieval "
    "front-end (dense + keyword + RRF) as one declarative plan.",
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    dense = brute_force_topk(emb, emb.where(F.col("vec_id") == 0), k=20).select(
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("dense_rank"),
    )
    sparse = bm25_keyword_search(spark, sf_dir).select(
        "doc_id", F.col("rnk").alias("sparse_rank")
    )
    fused = dense.join(sparse, "doc_id", "full_outer")

    def contrib(c: str) -> F.Column:
        return F.coalesce(
            F.round(F.lit(1e12) / (F.lit(60) + F.col(c))).cast("bigint"),
            F.lit(0).cast("bigint"),
        )

    scored = fused.select(
        "doc_id",
        (contrib("dense_rank") + contrib("sparse_rank")).alias("rrf_scaled"),
        F.coalesce(F.col("dense_rank"), F.lit(0)).cast("int").alias("dense_rank"),
        F.coalesce(F.col("sparse_rank"), F.lit(0)).cast("int").alias("sparse_rank"),
    )
    w = Window.orderBy(F.desc("rrf_scaled"), F.asc("doc_id"))
    return (
        scored.select("*", F.row_number().over(w).cast("int").alias("rnk"))
        .where(F.col("rnk") <= 10)
    )


@register(
    "bpe_encode_tokens",
    """
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    t AS (
        SELECT doc_id,
               CAST(SUM(len(w) - (len(w) - len(replace(w, 'er', ''))) / 2)
                    AS BIGINT) AS n_tokens
        FROM words WHERE len(w) >= 1 GROUP BY doc_id
    )
    SELECT d.doc_id, CAST(COALESCE(t.n_tokens, 0) AS BIGINT) AS n_tokens
    FROM documents d LEFT JOIN t USING (doc_id)
    WHERE d.text IS NOT NULL
    """,
    "BPE ENCODE (corpus side of tokenizer training): token count per "
    "document after applying the learned merge ('e','r') — the corpus's "
    "most frequent pair per bpe_pair_counts — via "
    "operators/tokenizer.bpe_encode_counts: the greedy left-to-right "
    "fusion fold runs once per DISTINCT word (the Heaps-sublinear "
    "vocab relation — higher-order array functions are interpreted, "
    "~1.4us/char, so re-encoding repeated words is the scale killer; "
    "the naive per-corpus-char bpe_encode measured 2.2s at sf0.1, "
    "this shape 10x less fold work), then per-word token counts "
    "broadcast-join back to (doc, word) occurrence counts and "
    "aggregate: n_tokens = sum k(doc,w)*t(w), with empty docs "
    "restored as 0 by a left join. The oracle "
    "exploits that for a merge (a,b) with a != b the greedy fold fires "
    "exactly once per leftmost non-overlapping occurrence of the "
    "2-char string ab, i.e. n_tokens = n_chars - occurrences(ab), with "
    "occurrences computed by DuckDB's (equally leftmost-greedy) "
    "replace(). Multi-merge encodes lose this closed form (the second "
    "merge operates on the fused sequence) — they are exact-twin "
    "tested against a Python reference in tests/test_tokenizer.py "
    "instead. n_tokens is the REAL token-count column a packing/"
    "token-budget pipeline consumes, vs text_stats' whitespace proxy.",
)
def bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.tokenizer import bpe_encode_counts

    d = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return bpe_encode_counts(d, [("e", "r")])


@register(
    "pack_sequences_bpe",
    """
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    t AS (
        SELECT doc_id,
               CAST(SUM(len(w) - (len(w) - len(replace(w, 'er', ''))) / 2)
                    AS BIGINT) AS n_tok
        FROM words WHERE len(w) >= 1 GROUP BY doc_id
    ),
    base AS (
        SELECT d.lang, d.doc_id, CAST(COALESCE(t.n_tok, 0) AS BIGINT) AS n_tok
        FROM documents d LEFT JOIN t USING (doc_id)
        WHERE d.text IS NOT NULL
    ),
    c AS (
        SELECT lang, n_tok,
               SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum_end
        FROM base
    )
    SELECT lang, CAST((cum_end - n_tok) // 2048 AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM c GROUP BY lang, seq_id
    """,
    "Sequence packing driven by REAL tokenizer counts (ROADMAP r8 / "
    "VERDICT r7 #3): the same greedy per-lang-stream packing window "
    "as pack_sequences_lang, but each document's length is its BPE "
    "token count from tokenizer.bpe_encode_counts (merge ('e','r'), "
    "the corpus's top pair per bpe_pair_counts) instead of the "
    "whitespace proxy — curation.pack_sequences(tokens_col=...) swaps "
    "only the per-doc length input, the packing plan is unchanged. "
    "Pipeline shape at 100 TB: the vocab-memoized encode (fold once "
    "per DISTINCT word, AQE-decided count join) + one doc_id join to "
    "carry the stream key + ONE running-sum window per lang stream. "
    "Oracle reuses bpe_encode_tokens' closed form (single merge a!=b "
    "fires once per leftmost non-overlapping 'er': n_tok = n_chars - "
    "occurrences) composed with the packing window SQL.",
)
def pack_sequences_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import pack_sequences
    from ..operators.tokenizer import bpe_encode_counts

    d = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    counts = bpe_encode_counts(d, [("e", "r")])
    base = d.select("lang", "doc_id").join(counts, "doc_id")
    return pack_sequences(base, seq_len=2048, tokens_col="n_tokens")


@register(
    "kmeans_portable_embeddings",
    """
    WITH ranked AS (
        SELECT vec_id, embedding,
               ROW_NUMBER() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM embeddings
    ),
    cent0 AS (SELECT CAST(rn - 1 AS INT) AS c, embedding AS ce
              FROM ranked WHERE rn <= 4),
    d AS (
        SELECT v.vec_id, c.c,
               CAST(SUM(CAST(ROUND(
                   (CAST(v.embedding[g.i] AS DOUBLE) - CAST(c.ce[g.i] AS DOUBLE))
                 * (CAST(v.embedding[g.i] AS DOUBLE) - CAST(c.ce[g.i] AS DOUBLE))
                 * 1e12) AS BIGINT)) AS BIGINT) AS dist_i
        FROM embeddings v, cent0 c, generate_series(1, 64) AS g(i)
        GROUP BY v.vec_id, c.c
    ),
    a0 AS (
        SELECT vec_id, c AS cluster FROM (
            SELECT vec_id, c,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dist_i, c) AS rn
            FROM d
        ) WHERE rn = 1
    )
    SELECT cluster, dim, centroid_scaled_sum, n_vectors,
           (centroid_scaled_sum / 1e12) / n_vectors AS centroid
    FROM (
        SELECT a0.cluster AS cluster, CAST(g.i AS INT) AS dim,
               CAST(SUM(CAST(ROUND(CAST(v.embedding[g.i] AS DOUBLE) * 1e12)
                    AS BIGINT)) AS BIGINT) AS centroid_scaled_sum,
               CAST(COUNT(*) AS BIGINT) AS n_vectors
        FROM a0 JOIN embeddings v USING (vec_id),
             generate_series(1, 64) AS g(i)
        GROUP BY a0.cluster, g.i
    )
    """,
    "Distributed k-means, HASH-CHECKABLE end to end (one Lloyd step, "
    "k=4): portable md5 seeding, nearest-centroid assignment on EXACT "
    "scaled-integer distances (per-dim ROUND((a-b)^2 * 1e12) BIGINTs "
    "summed order-free — the argmin can never flip with partitioning "
    "or evaluation order, and DuckDB reproduces it bit-for-bit, the "
    "same portability kit as knn_lsh_cosine_portable), then a "
    "scaled-int centroid update emitted long-form (cluster, dim, "
    "exact sum, count, one IEEE division). Plan shape: assignment is "
    "MAP-ONLY (the k x d centroid literal rides the plan — kilobytes "
    "at any corpus size), the update is ONE (cluster, dim) exchange — "
    "per-iteration cost at 100 TB is one scan + one shuffle of "
    "(k x d) partials. The production multi-iteration twin is "
    "operators/clustering.lloyd_kmeans (same arithmetic, xxhash64 "
    "seeding), exact-reference- and invariance-tested; this entry "
    "pins the per-iteration semantics under the driver's hash gate.",
)
def kmeans_portable_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import portable_kmeans_step

    return portable_kmeans_step(_t(spark, sf_dir, "embeddings"), k=4)


@register(
    "kmeans_cluster_sample",
    f"""
    WITH ranked AS (
        SELECT vec_id, embedding,
               ROW_NUMBER() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM embeddings
    ),
    cent0 AS (SELECT CAST(rn - 1 AS INT) AS c, embedding AS ce
              FROM ranked WHERE rn <= 4),
    dst AS (
        SELECT v.vec_id, c.c,
               CAST(SUM(CAST(ROUND(
                   (CAST(v.embedding[g.i] AS DOUBLE) - CAST(c.ce[g.i] AS DOUBLE))
                 * (CAST(v.embedding[g.i] AS DOUBLE) - CAST(c.ce[g.i] AS DOUBLE))
                 * 1e12) AS BIGINT)) AS BIGINT) AS dist_i
        FROM embeddings v, cent0 c, generate_series(1, 64) AS g(i)
        GROUP BY v.vec_id, c.c
    ),
    a0 AS (
        SELECT vec_id, c AS cluster FROM (
            SELECT vec_id, c,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dist_i, c) AS rn
            FROM dst
        ) WHERE rn = 1
    ),
    scored AS (
        SELECT a0.cluster, d2.doc_id, CAST(d2.n_chars AS BIGINT) AS weight,
               CAST({_PS_KEY} AS HUGEINT) AS pri
        FROM a0 JOIN documents d2 ON d2.doc_id = a0.vec_id
        WHERE d2.n_chars IS NOT NULL AND d2.n_chars > 0
    ),
    rk AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster
                                     ORDER BY pri DESC, doc_id) AS rn
        FROM scored
    ),
    tau AS (
        SELECT cluster, MAX(CASE WHEN rn = 6 THEN pri END) AS tau_raw
        FROM rk GROUP BY cluster
    )
    SELECT r.cluster, doc_id, weight, CAST(pri AS VARCHAR) AS priority,
           GREATEST(CAST(weight AS DOUBLE),
                    CAST(COALESCE(tau_raw, 0) AS DOUBLE)) AS est_weight
    FROM rk r JOIN tau t ON r.cluster = t.cluster
    WHERE rn <= 5
    """,
    "CLUSTER-BALANCED sampling (VERDICT r7 #5): an independent 5-doc "
    "DLT priority sample per LEARNED k-means cluster — the "
    "composition a curation pipeline runs to keep every region of "
    "embedding space represented in a training mix (per-topic budget "
    "instead of per-language). Composes two verified operators, "
    "FULLY hash-checked end to end: clustering.portable_assign "
    "(md5-seeded init + exact scaled-int argmin, the "
    "kmeans_portable_embeddings assignment) feeds "
    "sampling.priority_sample_grouped (exact-integer DLT keys from "
    "md5-of-id, skew-resistant two-window prune) grouped by cluster "
    "with n_chars weights. Plan at 100 TB: assignment is map-only "
    "(k x d literal), one id-keyed join carries the weight, and the "
    "grouped sampler's local top-(k+1) prune means only <= "
    "(k+1) x partitions rows per cluster reach the rank window. "
    "Oracle = the kmeans_portable assignment CTEs composed with the "
    "priority_sample_by_lang sample SQL, group swapped to cluster.",
)
def kmeans_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import portable_assign
    from ..operators.sampling import priority_sample_grouped

    emb = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents")
    assigned = portable_assign(emb, k=4)
    base = docs.join(assigned, docs.doc_id == assigned.vec_id).select(
        "cluster", "doc_id", "n_chars"
    )
    return priority_sample_grouped(
        base, "doc_id", "n_chars", 5, "cluster"
    ).withColumn("priority", F.col("priority").cast("string"))


@register(
    "lloyd_kmeans_clusters",
    None,  # multi-iteration Lloyd: init is xxhash64-seeded (not
    # DuckDB-expressible) and the iterated centroids depend on the
    # previous iteration's driver state; exactness of the iterated
    # path is pinned against a Python reference implementation and
    # partitioning-invariance tests in tests/test_clustering.py, and
    # the per-iteration semantics are hash-checked by the
    # kmeans_portable_embeddings / kmeans_cluster_sample twins.
    "Multi-iteration distributed Lloyd k-means under the driver gate "
    "(VERDICT r7 #5): 2 full iterations at k=4 over the embeddings "
    "corpus via clustering.lloyd_kmeans, reporting per-cluster sizes "
    "and EXACT scaled-int inertia (sum of round(dist2 * 1e12) BIGINTs "
    "— order-free, so the row set is deterministic under any "
    "partitioning even though no SQL oracle can replay the iterated "
    "driver state). Per iteration: one map-only assignment against "
    "broadcast centroid literals + ONE (cluster, dim) exchange of "
    "scaled-int partials; driver state is k x d floats. Rows-only by "
    "design, like mv_hll_maintenance_orders.",
)
def lloyd_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import lloyd_kmeans

    emb = _t(spark, sf_dir, "embeddings")
    # use_arrow: the numpy assignment kernel, BIT-IDENTICAL to the
    # expression fold (pinned in tests/test_clustering.py) and 3.5x
    # at sf0.1 — determinism of this rows-only entry is unchanged
    assigned, _cents, _inertia = lloyd_kmeans(emb, k=4, n_iter=2, use_arrow=True)
    return (
        assigned.select(
            "cluster",
            F.round(F.col("dist2") * F.lit(1e12)).cast("bigint").alias("__d"),
        )
        .groupBy("cluster")
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            F.sum("__d").alias("inertia_scaled"),
        )
    )


@register(
    "bpe_learned_merges",
    """
    WITH words AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ) WHERE len(w) >= 2 GROUP BY w
    ),
    p1 AS (
        SELECT substr(w, CAST(i AS INT), 1) AS a,
               substr(w, CAST(i AS INT) + 1, 1) AS b, cnt
        FROM (SELECT w, cnt, unnest(range(1, len(w))) AS i FROM words)
    ),
    t1 AS (
        SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS c FROM p1 GROUP BY a, b
        ORDER BY SUM(cnt) DESC, a, b LIMIT 1
    ),
    w1 AS (
        SELECT replace(w, (SELECT a || b FROM t1), chr(1)) AS w, cnt FROM words
    ),
    p2 AS (
        SELECT substr(w, CAST(i AS INT), 1) AS ca,
               substr(w, CAST(i AS INT) + 1, 1) AS cb, cnt
        FROM (SELECT w, cnt, unnest(range(1, len(w))) AS i FROM w1)
    ),
    e2 AS (
        SELECT CASE WHEN ca = chr(1) THEN (SELECT a || b FROM t1) ELSE ca END AS a,
               CASE WHEN cb = chr(1) THEN (SELECT a || b FROM t1) ELSE cb END AS b,
               cnt
        FROM p2
    ),
    t2 AS (
        SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS c FROM e2 GROUP BY a, b
        ORDER BY SUM(cnt) DESC, a, b LIMIT 1
    ),
    w2 AS (
        SELECT replace(w, (
            SELECT (CASE WHEN a = (SELECT a || b FROM t1) THEN chr(1) ELSE a END)
                || (CASE WHEN b = (SELECT a || b FROM t1) THEN chr(1) ELSE b END)
            FROM t2), chr(2)) AS w, cnt
        FROM w1
    ),
    p3 AS (
        SELECT substr(w, CAST(i AS INT), 1) AS ca,
               substr(w, CAST(i AS INT) + 1, 1) AS cb, cnt
        FROM (SELECT w, cnt, unnest(range(1, len(w))) AS i FROM w2)
    ),
    e3 AS (
        SELECT CASE WHEN ca = chr(1) THEN (SELECT a || b FROM t1)
                    WHEN ca = chr(2) THEN (SELECT a || b FROM t2)
                    ELSE ca END AS a,
               CASE WHEN cb = chr(1) THEN (SELECT a || b FROM t1)
                    WHEN cb = chr(2) THEN (SELECT a || b FROM t2)
                    ELSE cb END AS b,
               cnt
        FROM p3
    ),
    t3 AS (
        SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS c FROM e3 GROUP BY a, b
        ORDER BY SUM(cnt) DESC, a, b LIMIT 1
    )
    SELECT CAST(1 AS INT) AS step, a AS lhs, b AS rhs, c AS pair_count FROM t1
    UNION ALL SELECT CAST(2 AS INT), a, b, c FROM t2
    UNION ALL SELECT CAST(3 AS INT), a, b, c FROM t3
    """,
    "BPE LEARNING under the hash gate: the first THREE learned merges "
    "(lhs, rhs, weighted pair count) from operators/tokenizer."
    "bpe_learn_merges — the iterative tokenizer-training loop itself, "
    "not just step-1 statistics (bpe_pair_counts) or a fixed-merge "
    "encode (bpe_encode_tokens). Spark runs the real loop: corpus -> "
    "word-frequency vocab ONCE, then per merge a vocab-sized pair "
    "count, a 1-row argmax (ties broken on count DESC, lhs, rhs), and "
    "a map-only greedy fold rewrite. The oracle unrolls the same three "
    "iterations in SQL by keeping the vocab in string-land: each "
    "learned merge's token is rewritten into a single PLACEHOLDER "
    "char (chr(1), chr(2)) via leftmost-nonoverlapping replace() — "
    "exactly the greedy fold's semantics — and pair extraction stays "
    "substr()-based, with CASE mappings expanding placeholders back "
    "to token strings so counts and tiebreaks compare the REAL "
    "tokens. Contract: corpus text must not contain chr(1)/chr(2) "
    "(printable-text corpora; the fixture is ASCII). Deeper merge "
    "lists stay exact-twin tested (tests/test_tokenizer.py) — the "
    "unrolled-oracle pattern is bfs_copurchase_hops', demonstrated "
    "here to depth 3.",
)
def bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.tokenizer import bpe_merge_table

    return bpe_merge_table(spark, _t(spark, sf_dir, "documents"), 3)


# --------------------------------------------------------------------------
# r8 breadth: training-mix assembly (splits, epoch upsampling), tokenizer
# evaluation, bigram LM scoring, embedding quantization
# --------------------------------------------------------------------------


@register(
    "dataset_split_counts",
    """
    WITH tagged AS (
        SELECT lang, n_chars,
               CASE WHEN b < 80 THEN 'train'
                    WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT *,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-split'),
                                   1, 8))::BIGINT % 100 AS b
            FROM documents
        )
    )
    SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
    FROM tagged GROUP BY split, lang
    """,
    "Deterministic train/val/test assignment (curation.dataset_split, "
    "80/10/10): each doc's split is a pure function of md5(id || "
    "salt) percent-buckets — reshuffle-proof and STABLE AS THE CORPUS "
    "GROWS (a doc never migrates splits when new data arrives, the "
    "property eval hygiene depends on; contrast randomSplit, which "
    "reassigns everything on every re-run). Map-only tag + one "
    "(split, lang) aggregate; the salt draws independent assignments "
    "for ablations. The per-(split, lang) doc/char accounting is what "
    "a mix designer actually reads off this step.",
)
def dataset_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import dataset_split

    d = _t(spark, sf_dir, "documents")
    return dataset_split(d).groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("n_chars_total"),
    )


@register(
    "upsample_epochs_docs",
    """
    WITH spec AS (
        SELECT * FROM (VALUES ('src0', 3, 0), ('src1', 2, 5000),
                              ('src2', 0, 0)) s(source, fl, fb)
    ),
    base AS (
        SELECT d.doc_id, d.source,
               COALESCE(s.fl, 1) +
               CASE WHEN (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)
                               || '-ep'), 1, 8))::BIGINT % 10000)
                         < COALESCE(s.fb, 0) THEN 1 ELSE 0 END AS n_ep
        FROM documents d LEFT JOIN spec s USING (source)
    )
    SELECT source, doc_id, CAST(g.e AS INT) AS epoch
    FROM base, range(1, 5) AS g(e)
    WHERE g.e <= n_ep
    """,
    "Per-source EPOCH upsampling for a training mix "
    "(curation.upsample_epochs): src0 is seen 3 times, src1 2.5 times "
    "(two full passes plus a deterministic md5-selected half — "
    "fractional epochs pick a STABLE id subset, so reruns and engines "
    "agree), src2 is dropped, everything else defaults to 1 — the "
    "small-high-quality-source repetition every LLM data mix applies. "
    "Map-only: one when-chain over the dims-sized spec + explode of a "
    "row-local sequence(1, n_ep); no shuffle, output = sum of rates x "
    "rows, and the 1-based epoch index is what shard writers "
    "interleave on downstream.",
)
def upsample_epochs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import upsample_epochs

    d = _t(spark, sf_dir, "documents")
    return upsample_epochs(
        d, {"src0": 3.0, "src1": 2.5, "src2": 0.0}
    ).select("source", "doc_id", "epoch")


@register(
    "tokenizer_fertility_by_lang",
    """
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    per AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(len(w) - (len(w) - len(replace(w, 'er', ''))) / 2)
                    AS BIGINT) AS n_tokens
        FROM words WHERE len(w) >= 1 GROUP BY doc_id
    )
    SELECT d.lang,
           CAST(SUM(p.n_words) AS BIGINT) AS n_words,
           CAST(SUM(p.n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(p.n_tokens) AS DOUBLE) / SUM(p.n_words) AS fertility
    FROM documents d JOIN per p USING (doc_id)
    GROUP BY d.lang
    """,
    "Tokenizer FERTILITY by language (tokens per word — the standard "
    "multilingual tokenizer-evaluation metric: a tokenizer trained on "
    "English-heavy data fragments other languages into more tokens "
    "per word, inflating their effective sequence cost): BPE token "
    "counts from tokenizer.bpe_encode_counts (merge ('e','r'), the "
    "vocab-memoized scale path — fold once per DISTINCT word) joined "
    "to per-doc whitespace word counts, aggregated per lang; "
    "fertility is one IEEE division of exact bigints. Oracle reuses "
    "bpe_encode_tokens' leftmost-nonoverlapping closed form. Docs "
    "with no words drop out via the inner join (0/0 is undefined in "
    "both engines).",
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.tokenizer import bpe_encode_counts

    d = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    words = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split("text", " "), lambda w: F.length(w) >= 1)
        ).alias("w"),
    )
    per_words = words.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_words")
    )
    counts = bpe_encode_counts(d, [("e", "r")])
    j = per_words.join(counts, "doc_id").join(d.select("doc_id", "lang"), "doc_id")
    return j.groupBy("lang").agg(
        F.sum("n_words").alias("n_words"),
        F.sum("n_tokens").alias("n_tokens"),
        (
            F.sum("n_tokens").cast("double") / F.sum("n_words")
        ).alias("fertility"),
    )


# Shared bigram-LM per-doc score CTE block — ONE text consumed by
# bigram_lm_score and the CCNet perplexity-bucket gate, so the model
# and the gate can never drift (the _SEMDEDUP_CTES discipline).
_BIGRAM_LM_CTES = """ts AS (
        SELECT doc_id, string_split(text, ' ') AS t
        FROM documents WHERE text IS NOT NULL
    ),
    prs AS (
        SELECT doc_id, t[g.i] AS a, t[g.i+1] AS b
        FROM ts, range(1, 100001) AS g(i)
        WHERE g.i <= len(t) - 1
    ),
    c2 AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cab FROM prs GROUP BY a, b),
    c1 AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS ca FROM prs GROUP BY a),
    docscore AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(CAST(ROUND(1e12 * cab / ca) AS BIGINT)) AS BIGINT)
                   AS score_scaled
        FROM prs JOIN c2 USING (a, b) JOIN c1 USING (a)
        GROUP BY doc_id
    )"""


@register(
    "bigram_lm_score",
    f"""
    WITH {_BIGRAM_LM_CTES}
    SELECT doc_id, n_bigrams, score_scaled FROM docscore
    """,
    "Bigram language-model likelihood scoring — the KenLM-shaped "
    "quality signal (docs whose word transitions are typical of the "
    "corpus score high; gibberish and boilerplate-mangled text score "
    "low): corpus-trained MLE bigram model p(b|a) = c(a,b)/c(a) with "
    "history counts taken over bigram positions (so p sums to 1 per "
    "history), then each doc's per-occurrence probabilities "
    "accumulate as EXACT scaled integers round(1e12 * p) — "
    "order-free, engine-portable (the rrf/knn kit), no log() (libm "
    "last-bit divergence). The unigram twin is token_rarity_score; "
    "the model tables here are vocab- and bigram-vocab-sized (Heaps-"
    "sublinear), the scoring join is the inverted-index shape: at "
    "100 TB the model broadcasts or bucket-joins on the word, never "
    "corpus x corpus. Oracle-only bound: the DuckDB side enumerates "
    "bigram positions via range(1, 100001) (the contamination-oracle "
    "idiom — DuckDB ranges can't take lateral args), so docs beyond "
    "100k whitespace tokens would truncate in the ORACLE only; the "
    "Spark side is unbounded and the fixtures are far below the cap.",
)
def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bigram_doc_scores(spark, sf_dir)


def _bigram_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared per-doc bigram-LM score relation (doc_id, n_bigrams,
    score_scaled) — the Spark twin of the _BIGRAM_LM_CTES docscore
    block, consumed by bigram_lm_score and ccnet_ppl_buckets."""
    d = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    ts = d.select("doc_id", F.split("text", " ").alias("t")).where(
        F.size("t") >= 2
    )
    pairs = ts.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("t"), i).alias("a"),
                    F.element_at(F.col("t"), i + 1).alias("b"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    c2 = pairs.groupBy("a", "b").agg(F.count("*").cast("bigint").alias("cab"))
    c1 = pairs.groupBy("a").agg(F.count("*").cast("bigint").alias("ca"))
    # assemble the model FIRST (bigram-vocab x vocab join — both
    # Heaps-sublinear relations), so the corpus-sized pairs relation
    # is shuffled ONCE against the finished model instead of twice
    model = c2.join(c1, "a")
    scored = pairs.join(model, ["a", "b"])
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.sum(
            F.round(F.lit(1e12) * F.col("cab") / F.col("ca")).cast("bigint")
        ).alias("score_scaled"),
    )


@register(
    "ccnet_ppl_buckets",
    f"""
    WITH {_BIGRAM_LM_CTES},
    ranked AS (
        SELECT doc_id, n_bigrams, score_scaled,
               ROW_NUMBER() OVER (
                   ORDER BY CAST(score_scaled AS DOUBLE) / n_bigrams DESC,
                            doc_id) AS rn,
               COUNT(*) OVER () AS N
        FROM docscore
    )
    SELECT doc_id, n_bigrams, score_scaled,
           CASE ((rn - 1) * 3) // N WHEN 0 THEN 'head'
                WHEN 1 THEN 'middle' ELSE 'tail' END AS ppl_bucket,
           ((rn - 1) * 3) // N <= 1 AS keep
    FROM ranked
    """,
    "The CCNet perplexity gate (Wenzek et al. 2020): bucket every "
    "document into head/middle/tail thirds of the corpus LM-score "
    "distribution and keep head+middle — THE quality filter behind "
    "CCNet/LLaMA's crawl curation, composed end to end from two "
    "verified kits: the shared bigram-LM docscore relation "
    "(_BIGRAM_LM_CTES — likelihood HIGH = perplexity LOW = head, no "
    "log() so the rank key is the exact IEEE division of two "
    "bigints) and the DISTRIBUTED global_rank operator (range "
    "exchange + prefix-sum offsets, the r9 localCheckpoint fix) "
    "instead of a single-partition NTILE window — at 100 TB an "
    "ORDER-BY-everything window is the straggler the rank operator "
    "exists to avoid. Tiles follow NTILE semantics exactly via "
    "integer cross-multiply ((rn-1)*3) // N — no percentile "
    "estimation, no float thresholds. Scale: production CCNet "
    "broadcasts sampled thresholds instead of exact ranks; the exact "
    "rank keeps the oracle bit-checkable and costs one extra "
    "kilobyte-state exchange.",
)
def ccnet_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import global_rank

    scores = _bigram_doc_scores(spark, sf_dir).withColumn(
        "__avg", F.col("score_scaled").cast("double") / F.col("n_bigrams")
    )
    ranked = global_rank(
        scores, F.col("__avg").desc(), F.col("doc_id"), rank_col="rn"
    )
    n = ranked.agg(F.count("*").cast("bigint").alias("N"))
    tile = F.expr("((rn - 1) * 3) div N")
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "n_bigrams",
            "score_scaled",
            F.when(tile == 0, "head")
            .when(tile == 1, "middle")
            .otherwise("tail")
            .alias("ppl_bucket"),
            (tile <= 1).alias("keep"),
        )
    )


@register(
    "embedding_int8_quantize",
    """
    WITH mx AS (
        SELECT vec_id, embedding,
               list_max(list_transform(embedding,
                        x -> abs(CAST(x AS DOUBLE)))) AS scale
        FROM embeddings
    )
    SELECT vec_id, CAST(g.i AS INT) AS dim,
           CAST(ROUND(127 * CAST(embedding[g.i] AS DOUBLE) / scale) AS INT)
               AS q,
           scale
    FROM mx, generate_series(1, 64) AS g(i)
    WHERE scale > 0
    """,
    "Per-vector symmetric INT8 quantization of the embedding column — "
    "the storage/serving compression step an embedding pipeline runs "
    "before indexing (4x smaller than float32; PQ's cheaper cousin, "
    "complementing knn_pq_cosine's codebook path): scale = max|x| per "
    "vector (exact IEEE max over float->double casts), q_i = "
    "round(127 * x_i / scale) — every q is an exact integer and the "
    "one division per element is IEEE, so the quantized corpus is "
    "bit-identical across engines and partitionings. Map-only at any "
    "scale; emitted long-form (vec_id, dim, q, scale) for the hash "
    "gate. All-zero vectors are dropped (0/0 undefined in both "
    "engines).",
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    mx = emb.select(
        "vec_id",
        "embedding",
        F.array_max(
            F.transform("embedding", lambda x: F.abs(x.cast("double")))
        ).alias("scale"),
    ).where(F.col("scale") > 0)
    return mx.select(
        "vec_id",
        F.posexplode("embedding").alias("pos", "x"),
        "scale",
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.round(F.lit(127) * F.col("x").cast("double") / F.col("scale"))
        .cast("int")
        .alias("q"),
        "scale",
    )


@register(
    "logreg_quality_filter",
    None,  # the trained weights pass through sigmoid (np.exp) — not
    # SQL-expressible; exactness is pinned the lloyd_kmeans way:
    # tests/test_classifier.py proves the distributed trainer
    # BIT-EQUAL to a single-machine numpy reference and invariant
    # under 1/3/17 partitions, and the inference margin is the exact
    # scaled-int dot of classifier_margin_select.
    "Quality-classifier TRAINING on the cluster (the missing half of "
    "classifier_margin_select's broadcast inference): 3 full-batch "
    "gradient-descent steps of logistic regression over the embedding "
    "corpus (label: fixture class 0 vs rest), then map-only scoring "
    "of every vector with the learned weights — the CCNet/GPT-style "
    "'wiki-like vs crawl' quality gate, trained and applied in one "
    "declarative pipeline. Per iteration: ONE Arrow map-only pass "
    "(each batch emits d+1 scaled-int64 gradient partials — per-ROW "
    "rounding + order-free int64 sums make the learned weights "
    "bit-identical under any partitioning) + one (dim)-keyed exchange "
    "of kilobyte partials; driver state is d+1 floats "
    "(operators/classifier.py). At 100 TB: n_iter corpus scans at "
    "Arrow bandwidth, nothing else grows.",
)
def logreg_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classifier import logreg_predict, logreg_train

    emb = _t(spark, sf_dir, "embeddings")
    df = emb.select(
        "vec_id", "embedding", (F.col("label") == 0).cast("int").alias("y")
    )
    w, _trace = logreg_train(df, n_iter=3, lr=0.5)
    return logreg_predict(df, w).select("vec_id", "y", "margin", "pred")


def _text_gate_oracle() -> str:
    """Closed-form oracle for the 1-iteration text gate (VERDICT r14
    item 1 — the logreg_margin_gate trick ported to the five text
    features): ONE gradient step from w = 0 has sigmoid(0) = 1/2
    EXACTLY and a vanishing L2 term (l2 * w0 = 0), so the learned
    weights are a closed form with no exp() anywhere — per-row
    gradient x_j * (0.5 - y) rounded half-away to the 1e9 grid (the
    trainer's exact int64 kernel), order-free bigint sums, one IEEE
    division chain and a *0.5 per weight, every op reproduced
    verbatim in DuckDB. Inference is the dot_exact 1e12 grid + one
    IEEE bias add."""
    from ..functions.text import EN_STOPWORDS

    sw = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return f"""
    WITH t0 AS (
        SELECT doc_id,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               n_chars, text,
               list_filter(string_split(text, ' '),
                           w -> length(w) >= 1) AS words
        FROM documents
        WHERE text IS NOT NULL AND n_chars > 0
    ),
    base AS (
        SELECT doc_id, y,
               [CAST(n_chars AS DOUBLE) / 1000.0,
                CAST(len(words) AS DOUBLE) / 100.0,
                CAST(list_sum(list_transform(words, w -> length(w)))
                     AS DOUBLE) / CAST(len(words) AS DOUBLE),
                CAST(len(list_filter(words,
                         w -> list_contains([{sw}], w)))
                     AS DOUBLE) / CAST(len(words) AS DOUBLE),
                CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                     AS DOUBLE) / CAST(n_chars AS DOUBLE)
               ] AS features
        FROM t0 WHERE len(words) >= 1
    ),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM base),
    gsum AS (
        SELECT g.i - 1 AS d,
               CAST(SUM(CAST(ROUND(
                   features[g.i] * (0.5 - y) * 1e9
               ) AS BIGINT)) AS BIGINT) AS gs
        FROM base, range(1, 6) AS g(i)
        GROUP BY g.i - 1
    ),
    gbias AS (
        SELECT CAST(SUM(CAST(ROUND((0.5 - y) * 1e9) AS BIGINT))
                    AS BIGINT) AS gs
        FROM base
    ),
    w AS (
        SELECT d, 0.0 - 0.5 * ((CAST(gs AS DOUBLE) / 1e9) / nn.n) AS wv
        FROM gsum, nn
    ),
    b AS (
        SELECT 0.0 - 0.5 * ((CAST(gs AS DOUBLE) / 1e9) / nn.n) AS bv
        FROM gbias, nn
    ),
    margins AS (
        SELECT v.doc_id, v.y,
               CAST(SUM(CAST(ROUND(
                   v.features[g.i] * w.wv * 1e12
               ) AS BIGINT)) AS BIGINT) AS s
        FROM base v, range(1, 6) AS g(i)
        JOIN w ON w.d = g.i - 1
        GROUP BY v.doc_id, v.y
    )
    SELECT m.doc_id, m.y,
           CAST(m.s AS DOUBLE) / 1e12 + b.bv AS margin,
           CAST(CASE WHEN CAST(m.s AS DOUBLE) / 1e12 + b.bv > 0
                THEN 1 ELSE 0 END AS INT) AS pred
    FROM margins m CROSS JOIN b
    """


@register(
    "logreg_text_quality_gate",
    _text_gate_oracle(),
    "The literal CCNet-style quality gate: a logistic classifier "
    "trained ON TEXT-DERIVED features (not embeddings) — char count, "
    "word count, mean word length, English-stopword ratio, digit "
    "ratio — with label 'is this the high-resource reference "
    "language' (en vs rest), then map-only scoring of every doc with "
    "the learned margin. This is the wiki-like-vs-crawl filter "
    "pipeline as the production systems actually run it: cheap "
    "codegen feature extraction (no tokenizer model), distributed "
    "training via the scaled-int gradient kernel (L2 0.01), "
    "broadcast-literal inference. ONE closed-form gradient step "
    "(VERDICT r14 item 1): sigmoid(0) = 1/2 exactly and the L2 "
    "gradient vanishes at w = 0, so the whole train-then-gate "
    "pipeline is hash-verified against the DuckDB oracle — the "
    "logreg_margin_gate trick on text features; deeper training "
    "stays covered by the reference/invariance tests of "
    "tests/test_classifier.py. Features are exact-integer ratios, "
    "so the whole pipeline is deterministic under any partitioning; "
    "at 100 TB the feature pass fuses into the training scan and "
    "per-iteration cost is one Arrow map pass + a (dim)-keyed "
    "kilobyte exchange (operators/classifier.py).",
)
def logreg_text_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import EN_STOPWORDS
    from ..operators.classifier import logreg_predict, logreg_train

    d = _t(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (F.col("n_chars") > 0)
    )
    words = F.filter(F.split("text", " "), lambda w: F.length(w) >= 1)
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_words = F.size(words)
    total_wlen = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    n_digit = F.length(F.regexp_replace(F.col("text"), "[^0-9]", ""))
    feats = F.array(
        (F.col("n_chars") / F.lit(1000.0)),
        (n_words / F.lit(100.0)),
        (total_wlen / n_words),
        (n_stop / n_words),
        (n_digit / F.col("n_chars")),
    )
    from ..operators._util import spread

    # r14 optimization (guide §2.5 + §5): the feature block is
    # interpreted HOF work (stopword filter = array_contains per
    # word) recomputed by EVERY training action — dim probe + 3
    # gradient scans + predict = 5 evaluations, all on the scan's few
    # skewed splits. spread() the doc rows so one parallel pass
    # computes features, then cut with an eager localCheckpoint so
    # the training actions re-read narrow (id, 5 doubles, y) rows
    # instead of re-deriving them. Feature VALUES are unchanged, so
    # weights and predictions are bit-identical.
    base = (
        spread(d.select("doc_id", "text", "n_chars", "lang"))
        .where(n_words >= 1)
        .select(
            "doc_id",
            feats.cast("array<double>").alias("features"),
            (F.col("lang") == "en").cast("int").alias("y"),
        )
        .localCheckpoint(eager=True)
    )
    # n_iter=1 (VERDICT r14 item 1): one gradient step from w = 0 is
    # the closed form the oracle replays exactly — see
    # _text_gate_oracle above. l2 stays declared (its gradient
    # vanishes at w = 0, so the oracle needs no ridge term).
    w, _trace = logreg_train(
        base,
        n_iter=1,
        lr=0.5,
        vec_col="features",
        label_col="y",
        l2=0.01,
        dim=5,  # the five text features — skips the dim-probe job
    )
    return logreg_predict(base, w, vec_col="features").select(
        "doc_id", "y", "margin", "pred"
    )


@register(
    "logreg_margin_gate",
    """
    WITH base AS (
        SELECT vec_id, embedding,
               CASE WHEN label = 0 THEN 1 ELSE 0 END AS y
        FROM embeddings
    ),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM base),
    gsum AS (
        SELECT g.i - 1 AS d,
               CAST(SUM(CAST(ROUND(
                   CAST(embedding[g.i] AS DOUBLE) * (0.5 - y) * 1e9
               ) AS BIGINT)) AS BIGINT) AS gs
        FROM base, range(1, 65) AS g(i)
        GROUP BY g.i - 1
    ),
    gbias AS (
        SELECT CAST(SUM(CAST(ROUND((0.5 - y) * 1e9) AS BIGINT)) AS BIGINT) AS gs
        FROM base
    ),
    w AS (
        SELECT d, 0.0 - 0.5 * ((CAST(gs AS DOUBLE) / 1e9) / nn.n) AS wv
        FROM gsum, nn
    ),
    b AS (
        SELECT 0.0 - 0.5 * ((CAST(gs AS DOUBLE) / 1e9) / nn.n) AS bv
        FROM gbias, nn
    ),
    margins AS (
        SELECT v.vec_id, v.y,
               CAST(SUM(CAST(ROUND(
                   CAST(v.embedding[g.i] AS DOUBLE) * w.wv * 1e12
               ) AS BIGINT)) AS BIGINT) AS s
        FROM base v, range(1, 65) AS g(i)
        JOIN w ON w.d = g.i - 1
        GROUP BY v.vec_id, v.y
    )
    SELECT m.vec_id, m.y,
           CAST(m.s AS DOUBLE) / 1e12 + b.bv AS margin,
           CAST(CASE WHEN CAST(m.s AS DOUBLE) / 1e12 + b.bv > 0
                THEN 1 ELSE 0 END AS INT) AS pred
    FROM margins m CROSS JOIN b
    """,
    "The classifier path HASH-CHECKED end to end (VERDICT r9 item 3: "
    "the logreg twins are rows-only because their 3-iteration weights "
    "pass through sigmoid; this entry makes the same train-then-gate "
    "pipeline value-verified). The trick: ONE gradient step from w=0 "
    "has sigmoid(0) = 1/2 EXACTLY, so the learned weights are a "
    "closed form with no exp() anywhere — per-row gradient x_j*(0.5-y)"
    " rounded half-away to the 1e9 grid (the trainer's exact int64 "
    "kernel, operators/classifier.py), order-free bigint sums, two "
    "IEEE divisions and a *0.5 (exponent shift, exact) per weight — "
    "every op reproduced verbatim in DuckDB. Inference margin is the "
    "dot_exact scaled-int kit (1e12 grid) + one IEEE add of the bias; "
    "emitted as margin + decision, never a probability (sigmoid is "
    "the one non-portable op, and thresholds/rankings are margin-"
    "order-equivalent). Scale shape: training = ONE Arrow map pass + "
    "one (dim)-keyed kilobyte exchange; scoring = map-only broadcast-"
    "literal dot. The 3-iteration production twins "
    "(logreg_quality_filter, logreg_text_quality_gate) keep their "
    "bit-equality reference tests; this entry puts the shared kernel "
    "arithmetic under the driver's value hash.",
)
def logreg_margin_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classifier import logreg_predict, logreg_train

    emb = _t(spark, sf_dir, "embeddings")
    df = emb.select(
        "vec_id", "embedding", (F.col("label") == 0).cast("int").alias("y")
    )
    # dim=64 (r15, guide §5): the embeddings fixture width is pinned
    # corpus-wide (the oracle's range(1, 65)); skipping the 1-row dim
    # probe saves one driver action per build
    w, _trace = logreg_train(df, n_iter=1, lr=0.5, dim=64)
    return logreg_predict(df, w).select("vec_id", "y", "margin", "pred")


@register(
    "lsh_candidate_recall",
    f"""
    WITH mh_corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               array_to_string(list_slice(string_split(text, ' '), 1,
                   GREATEST(9, (len(string_split(text, ' '))
                       * ((doc_id % 8) + 2)) // 10)), ' ') AS text
        FROM documents WHERE doc_id % 20 = 0
    ),
    {_MINHASH_CAND_CTES},
    truth AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    tj AS (
        SELECT t.doc_a, t.doc_b,
               CAST(t.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - t.inter) AS j
        FROM truth t
        JOIN sizes sa ON sa.doc_id = t.doc_a
        JOIN sizes sb ON sb.doc_id = t.doc_b
    ),
    lab AS (
        SELECT CAST(FLOOR(tj.j * 10) AS INT) AS j_decile,
               CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit
        FROM tj LEFT JOIN cands c
            ON c.doc_a = tj.doc_a AND c.doc_b = tj.doc_b
        WHERE tj.j >= 0.1
    )
    SELECT j_decile,
           CAST(COUNT(*) AS BIGINT) AS n_truth_pairs,
           CAST(SUM(hit) AS BIGINT) AS n_captured,
           CAST(SUM(hit) AS DOUBLE) / COUNT(*) AS capture_rate
    FROM lab GROUP BY j_decile
    """,
    "The LSH S-CURVE measured on the corpus instead of assumed from "
    "theory: for each exact-Jaccard decile (0.1 steps), the fraction "
    "of true near-dup pairs the banded MinHash (b=32, r=4, threshold "
    "~(1/32)^(1/4) = 0.42) actually captures as candidates — the "
    "evaluation harness a dedup deployment reads before trusting its "
    "recall at a given threshold (low deciles SHOULD be near 0, high "
    "deciles near 1; a flat curve means the banding is mis-tuned). "
    "Composes the SHARED _MINHASH_CAND_CTES candidate text (the same "
    "bytes as dedup_minhash_pairs_portable's oracle — pipeline and "
    "harness cannot drift) with the exact shingle-Jaccard truth "
    "relation; deciles via FLOOR(j*10) on the bit-identical IEEE "
    "ratio, capture counts exact integers. Scale shape: the truth "
    "side is the quadratic exact verifier (this is an EVALUATION "
    "query, run on a sample at 100 TB — the docstringed contract of "
    "dedup_ngram_jaccard); the candidate side is the production "
    "one-exchange LSH path.",
)
def lsh_candidate_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as dd
    from ..operators.dedup import _minhash_sig, _shingled, minhash_lsh_candidates

    raw = _t(spark, sf_dir, "documents")
    # graded near-dups: every 20th doc gets a prefix-truncated copy
    # whose kept fraction cycles with doc_id, spreading exact Jaccard
    # across the deciles — the raw fixture's truth pairs all sit at
    # j >= 0.8, leaving the S-curve's interesting region unmeasured
    # (the duplicated-media-corpus precedent from the pHash entries)
    ts = F.split("text", " ")
    k = F.greatest(
        F.lit(9),
        F.expr("(size(split(text, ' ')) * ((doc_id % 8) + 2)) div 10"),
    )
    copies = raw.where(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.array_join(F.slice(ts, F.lit(1), k), " ").alias("text"),
    )
    docs = raw.select("doc_id", "text").unionByName(copies)
    truth = dd.ngram_jaccard_pairs(docs, shingle_n=5, threshold=0.1).select(
        "doc_a", "doc_b", F.col("jaccard").alias("j")
    )
    shingled = _shingled(docs, "text", "doc_id", 5)
    sigs = shingled.select(
        F.col("doc_id"),
        _minhash_sig(F.col("_sh"), 128, portable=True).alias("signature"),
    )
    cands = minhash_lsh_candidates(sigs, "doc_id", 32, 4).select(
        F.col("doc_a").alias("ca"), F.col("doc_b").alias("cb"), F.lit(1).alias("hit")
    )
    lab = truth.join(
        cands,
        (F.col("doc_a") == F.col("ca")) & (F.col("doc_b") == F.col("cb")),
        "left",
    ).select(
        F.floor(F.col("j") * 10).cast("int").alias("j_decile"),
        F.coalesce(F.col("hit"), F.lit(0)).alias("hit"),
    )
    return lab.groupBy("j_decile").agg(
        F.count("*").cast("bigint").alias("n_truth_pairs"),
        F.sum("hit").cast("bigint").alias("n_captured"),
        (F.sum("hit").cast("double") / F.count("*")).alias("capture_rate"),
    )
