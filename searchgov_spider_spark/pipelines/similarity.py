"""Similarity search over an embedding column (array<float>).

Two paths:

- ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query
  set against the corpus; dot products are native ``F.aggregate`` over
  ``F.zip_with`` (sequential left-to-right fold → bit-identical to the
  DuckDB oracle's list_reduce). At 100 TB the corpus side stays
  partitioned; only queries are broadcast, so the scan is
  embarrassingly parallel with no shuffle until the per-query top-k
  aggregate (a window over |Q| x k rows).

- ``lsh_ann_topk`` — the scale path: random-hyperplane LSH. P
  deterministic hyperplanes (generated from the portable md5 hash
  family, inlined as literals on both engines) sign-hash every vector
  into a 2^P-bucket code; candidates = same-bucket rows; exact cosine
  re-ranks within the bucket. One shuffle keyed on the bucket code.
  An IVF variant would swap the hash for k-means centroids; the
  plumbing (bucket column + co-partitioned join + re-rank) is the same.

Also ``cosine_topk_pandas`` — the identical brute-force computation as
an Arrow-batched pandas UDF over numpy (the practical hot path when k
and Q are large); tested for equality with the native-expression plan.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash32

ANN_PLANES = 8


def dot_col(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (matches DuckDB list_reduce order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def dot_sql(a: str, b: str) -> str:
    # list_zip instead of generate_series + a[i]/b[i]: indexing an inline
    # literal list re-materializes the literal per ELEMENT (O(d^2) with an
    # allocation per probe — measured 3.9 s for 500 rows x 8 planes at
    # d=64); zipping materializes each side once per row. The multiply
    # and left-to-right fold order are unchanged, so results stay
    # bit-identical (verified pairwise on the embeddings table).
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(list_zip({a}, {b}), s -> s[1] * s[2])), (x, y) -> x + y)"
    )


def norm_sql(a: str) -> str:
    return f"sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform({a}, x -> x * x)), (x, y) -> x + y))"


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"


def cosine_topk(
    emb: DataFrame, n_queries: int = 10, k: int = 5, id_col: str = "vec_id"
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.

    Output: (query_id, neighbor_id, rank, cos_sim) with deterministic
    (cos desc, neighbor asc) ordering.
    """
    e = emb.select(F.col(id_col).alias("id"), F.col("embedding").cast("array<double>").alias("v"))
    queries = e.filter(F.col("id") < n_queries).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        e.crossJoin(F.broadcast(queries))
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(cosine_col(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def cosine_topk_sql(table: str = "embeddings", n_queries: int = 10, k: int = 5) -> str:
    cos = cosine_sql("q.v", "c.v")
    return f"""
        WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM {table}),
        q AS (SELECT id AS query_id, v FROM e WHERE id < {n_queries}),
        scored AS (
          SELECT q.query_id, c.id AS neighbor_id, round({cos}, 6) AS cos_sim
          FROM q JOIN e c ON c.id <> q.query_id
        ), ranked AS (
          SELECT query_id, neighbor_id, cos_sim,
                 row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, neighbor_id, rank, cos_sim FROM ranked WHERE rank <= {k}
        ORDER BY query_id, rank
    """


def cosine_topk_pandas(
    emb: DataFrame, n_queries: int = 10, k: int = 5, id_col: str = "vec_id"
) -> DataFrame:
    """Same result as ``cosine_topk`` via one numpy matmul per Arrow batch
    (mapInPandas): the practical path when |corpus-batch| x |Q| is large.
    Queries are collected (small, bounded) and closed over — the corpus
    never leaves its partitions; the final exact top-k is a window over
    the per-batch prefilter (each batch keeps its own top-k, a safe
    superset of the global top-k)."""
    import numpy as np
    import pandas as pd

    e = emb.select(F.col(id_col).alias("id"), F.col("embedding").cast("array<double>").alias("v"))
    qrows = e.filter(F.col("id") < n_queries).collect()
    q_ids = np.array([r["id"] for r in qrows])
    q_mat = np.array([r["v"] for r in qrows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)

    def score_batches(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf["v"].to_numpy())
            norms = np.linalg.norm(mat, axis=1)
            sims = (mat @ q_mat.T) / np.outer(norms, q_norm)
            out = []
            for qi, qid in enumerate(q_ids):
                col = sims[:, qi]
                mask = pdf["id"].to_numpy() != qid
                ids = pdf["id"].to_numpy()[mask]
                vals = col[mask]
                take = min(k, len(vals))
                idx = np.argsort(-vals, kind="stable")[:take]
                out.append(
                    pd.DataFrame(
                        {"query_id": qid, "neighbor_id": ids[idx], "cos_sim": np.round(vals[idx], 6)}
                    )
                )
            if out:
                yield pd.concat(out)

    scored = e.mapInPandas(score_batches, "query_id long, neighbor_id long, cos_sim double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def quantize_embeddings(emb: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Symmetric int8 quantization of the embedding column (the storage
    path for billion-vector ANN indexes: 4x smaller than float32, 8x
    smaller than the double working type): q_i = floor(x_i * 127 /
    max|x| + 0.5), scale reported as integer parts-per-billion.

    Engine-proof by construction: floor(y + 0.5) instead of round()
    (round's half-tie handling differs across engines/builds — the
    round-2 lesson), and the only emitted double-derived column is an
    integer. Zero vectors quantize to zeros with scale_ppb = 0. Pure
    projection — no shuffle, scales linearly.
    """
    v = F.col("embedding").cast("array<double>")
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.when(
        max_abs > 0,
        F.transform(v, lambda x: F.floor(x * 127.0 / max_abs + 0.5).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    scale_ppb = (
        F.when(max_abs > 0, F.floor(max_abs / 127.0 * 1e9 + 0.5)).otherwise(F.lit(0))
    ).cast("long")
    return emb.select(
        F.col(id_col).alias("vec_id"), scale_ppb.alias("scale_ppb"), q.alias("q")
    )


def quantize_embeddings_sql(table: str = "embeddings") -> str:
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM {table}),
        m AS (
          SELECT vec_id, v, list_aggregate(list_transform(v, x -> abs(x)), 'max') AS ma
          FROM e
        )
        SELECT vec_id,
               (CASE WHEN ma > 0 THEN floor(ma / 127.0 * 1e9 + 0.5) ELSE 0 END)::BIGINT AS scale_ppb,
               array_to_string(CASE WHEN ma > 0
                    THEN list_transform(v, x -> (floor(x * 127.0 / ma + 0.5))::INT)
                    ELSE list_transform(v, x -> 0) END, ',') AS q
        FROM m
        ORDER BY vec_id
    """


# ---------------------------------------------------------------------------
# LSH (random hyperplane) ANN
# ---------------------------------------------------------------------------

def hyperplanes(dim: int, planes: int = ANN_PLANES) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1): weight[p][d] =
    h32(f"{p},{d}") / 2^31 - 1. Same constants are inlined into the
    DuckDB oracle, so bucket codes agree exactly."""
    return [
        [portable_hash32(f"{p},{d}") / 2147483648.0 - 1.0 for d in range(dim)]
        for p in range(planes)
    ]


def _bucket_udf(planes: list[list[float]]):
    """Arrow-vectorized sign-hash bucket coder. One pandas UDF replaces
    a P x d-literal Catalyst tree of interpreted higher-order folds
    (which cost ~7 s in analysis+eval even on 500 rows). The inner loop
    accumulates acc = acc + x_d * w_d in index order, so every double op
    matches ``dot_col``'s sequential fold (and the DuckDB oracle)
    bit-for-bit — numpy and the JVM share IEEE-754 double semantics."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    W = np.array(planes, dtype=np.float64)

    @pandas_udf("long")
    def bucket(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype="int64")
        M = np.stack(v.to_numpy()).astype(np.float64)
        code = np.zeros(M.shape[0], dtype=np.int64)
        for p in range(W.shape[0]):
            acc = np.zeros(M.shape[0], dtype=np.float64)
            wp = W[p]
            for d in range(min(M.shape[1], wp.shape[0])):
                acc = acc + M[:, d] * wp[d]
            code |= np.where(acc > 0, np.int64(1) << p, np.int64(0))
        return pd.Series(code)

    return bucket


def lsh_ann_topk(
    emb: DataFrame,
    dim: int = 64,
    planes: int = ANN_PLANES,
    n_queries: int = 10,
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k: same-bucket candidates re-ranked by exact cosine.

    Output (query_id, neighbor_id, rank, cos_sim); rank over candidates
    only — approximate recall vs ``cosine_topk``, one bucket-keyed
    shuffle instead of a full scan per query at scale.
    """
    hp = hyperplanes(dim, planes)
    e = emb.select(F.col(id_col).alias("id"), F.col("embedding").cast("array<double>").alias("v"))
    coded = e.withColumn("bucket", _bucket_udf(hp)(F.col("v")))
    queries = coded.filter(F.col("id") < n_queries).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), "bucket"
    )
    cands = (
        coded.join(F.broadcast(queries), "bucket")
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(cosine_col(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def lsh_ann_topk_sql(
    table: str = "embeddings", dim: int = 64, planes: int = ANN_PLANES, n_queries: int = 10, k: int = 5
) -> str:
    hp = hyperplanes(dim, planes)
    plane_terms = " + ".join(
        f"(CASE WHEN {dot_sql('v', '([' + ', '.join(repr(x) for x in w) + ']::DOUBLE[])')} > 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p, w in enumerate(hp)
    )
    cos = cosine_sql("q.qv", "c.v")
    return f"""
        WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM {table}),
        coded AS (SELECT id, v, {plane_terms} AS bucket FROM e),
        q AS (SELECT id AS query_id, v AS qv, bucket FROM coded WHERE id < {n_queries}),
        cands AS (
          SELECT q.query_id, c.id AS neighbor_id, round({cos}, 6) AS cos_sim
          FROM q JOIN coded c ON c.bucket = q.bucket AND c.id <> q.query_id
        ), ranked AS (
          SELECT query_id, neighbor_id, cos_sim,
                 row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
          FROM cands
        )
        SELECT query_id, neighbor_id, rank, cos_sim FROM ranked WHERE rank <= {k}
        ORDER BY query_id, rank
    """


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------

def train_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    sample_n: int = 4096,
) -> list[list[float]]:
    """Deterministic k-means codebook: Lloyd iterations in numpy over a
    bounded, order-deterministic sample (the ``sample_n`` lowest-id
    vectors). At 100 TB this is the standard IVF recipe — train on a
    driver-side sample, broadcast the tiny codebook, assign the corpus
    in one narrow Arrow pass (see ``_assign_centroids``). The previous
    all-native-expression trainer expanded 16 centroids x 64 dims into
    thousands of nested folds and stalled Catalyst analysis.
    """
    import numpy as np

    e = emb.select(F.col(id_col).alias("id"), F.col("embedding").cast("array<double>").alias("v"))
    rows = e.orderBy("id").limit(max(sample_n, n_centroids)).collect()
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    C = X[:n_centroids].copy()
    for _ in range(iters):
        a = _argmin_sqdist(X, C)
        for i in range(n_centroids):
            members = X[a == i]
            if len(members):
                C[i] = members.mean(axis=0)
    return C.tolist()


def _argmin_sqdist(X, C):
    """Row-wise argmin of squared distance (first-match tie-break, same
    as a strict `<` fold)."""
    import numpy as np

    d = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
    return np.argmin(d, axis=1)


def _assign_centroids(e: DataFrame, cents: list[list[float]]) -> DataFrame:
    """(id, v) -> (id, v, cid): nearest-centroid assignment as one numpy
    matmul per Arrow batch. The codebook is closed over (broadcast with
    the task closure — n_centroids x dim doubles, a few KB)."""
    import numpy as np

    C = np.asarray(cents, dtype=np.float64)

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            out = pdf.copy()
            out["cid"] = _argmin_sqdist(X, C).astype("int32")
            yield out

    return e.mapInPandas(kernel, "id long, v array<double>, cid int")


def ivf_topk(
    emb: DataFrame,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_queries: int = 10,
    k: int = 5,
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF ANN top-k: corpus bucketed by nearest centroid; each query
    probes its ``n_probe`` nearest centroid lists and re-ranks candidates
    by exact cosine. One bucket-keyed equi-join — the IVF scale shape.
    Corpus assignment is a single mapInPandas numpy kernel; query probe
    lists (tiny, <= n_queries rows) are computed driver-side.
    """
    import numpy as np

    cents = centroids if centroids is not None else train_centroids(emb, n_centroids, id_col=id_col)
    C = np.asarray(cents, dtype=np.float64)
    e = emb.select(F.col(id_col).alias("id"), F.col("embedding").cast("array<double>").alias("v"))
    coded = _assign_centroids(e, cents)

    # query probe lists: n_probe nearest centroids per query — the query
    # set is bounded (n_queries), so collect + numpy argsort driver-side.
    qrows = e.filter(F.col("id") < n_queries).collect()
    qX = np.array([r["v"] for r in qrows], dtype=np.float64)
    qd = (qX * qX).sum(axis=1)[:, None] - 2.0 * (qX @ C.T) + (C * C).sum(axis=1)[None, :]
    probe_rows = [
        (int(r["id"]), list(r["v"]), int(cid))
        for r, drow in zip(qrows, qd)
        for cid in np.argsort(drow, kind="stable")[:n_probe]
    ]
    probes = emb.sparkSession.createDataFrame(
        probe_rows, "query_id long, qv array<double>, cid int"
    )
    cands = (
        coded.join(F.broadcast(probes), "cid")
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(cosine_col(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def knn_classify(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """k-NN majority-vote classification over the embedding table's
    ``label`` column: the exact top-k cosine neighborhood of each query
    vector votes; ties break by cosine-weight sum, then smaller label.

    Output: (query_id, true_label, pred_label, votes, weight).

    Plan: the (n_queries x k)-row neighbor table broadcasts against the
    label column (never the reverse — labels are corpus-sized), one
    hash-agg of votes, one window over the per-query vote table. The
    vote ordering key uses integer votes then label (never the float
    weight) so engine ulps can't flip the prediction.
    """
    nn = cosine_topk(emb, n_queries=n_queries, k=k)
    labels = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").cast("long").alias("label")
    )
    votes = (
        labels.join(F.broadcast(nn), "neighbor_id")
        .groupBy("query_id", "label")
        .agg(
            F.count("*").cast("long").alias("votes"),
            F.round(F.sum("cos_sim"), 6).alias("weight"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("label"))
    truth = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("label").cast("long").alias("true_label")
    )
    return (
        votes.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .join(F.broadcast(truth), "query_id")
        .select(
            "query_id", "true_label", F.col("label").alias("pred_label"),
            "votes", "weight",
        )
    )


def knn_classify_sql(table: str = "embeddings", n_queries: int = 10, k: int = 5) -> str:
    nn = cosine_topk_sql(table=table, n_queries=n_queries, k=k)
    return f"""
        WITH nn AS ({nn}),
        votes AS (
          SELECT nn.query_id, e.label::BIGINT AS label,
                 count(*)::BIGINT AS votes, round(sum(nn.cos_sim), 6) AS weight
          FROM nn JOIN {table} e ON e.vec_id = nn.neighbor_id
          GROUP BY nn.query_id, e.label
        ), ranked AS (
          SELECT query_id, label, votes, weight,
                 row_number() OVER (
                   PARTITION BY query_id ORDER BY votes DESC, label ASC
                 ) AS r
          FROM votes
        )
        SELECT r.query_id, q.label::BIGINT AS true_label, r.label AS pred_label,
               r.votes, r.weight
        FROM ranked r JOIN {table} q ON q.vec_id = r.query_id
        WHERE r.r = 1
        ORDER BY query_id
    """


# ---------------------------------------------------------------------------
# SemDeDup: semantic deduplication via cluster-then-prune
# ---------------------------------------------------------------------------


def semdedup(
    emb: DataFrame,
    n_centroids: int = 8,
    threshold: float = 0.85,
    max_cluster_size: int = 4096,
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space, then
    drop documents that are semantically duplicated WITHIN their
    cluster — pairwise cosine is only ever computed inside a cluster,
    never across the corpus. Kept = a document with no LOWER-ID
    in-cluster neighbor at cos >= ``threshold`` (the greedy
    keep-first-seen rule, deterministic); dropped rows carry ``dup_of``
    = their lowest-id such neighbor.

    Centroids are the ``n_centroids`` lowest-id vectors (a deterministic
    codebook so the SQL oracle can replay assignment exactly; swap in
    ``train_centroids`` for a real k-means codebook at production
    scale — assignment and pruning are unchanged).

    Output: (vec_id, cluster_id, dup_of, is_kept) — integers + boolean
    only; no float column reaches the gate hash (the cos comparison
    happens against raw IEEE doubles identically in both engines).

    Scale shape: assignment is a broadcast of k centroid vectors +
    one window over n*k scored rows (shuffle on vec_id); the prune
    self-join shuffles on cluster_id with per-cluster work bounded by
    ``max_cluster_size``^2 (clusters are rank-truncated like
    dedup._cap_blocks — at 100 TB you raise n_centroids so E[cluster]
    stays ~10^3-10^4, which is exactly how the paper runs: k scales
    with n, per-cluster pairwise stays constant).
    """
    e = emb.select(
        F.col(id_col).alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    cents = e.filter(F.col("id") < n_centroids).select(
        F.col("id").alias("cid"), F.col("v").alias("cv")
    )
    scored = e.crossJoin(F.broadcast(cents)).select(
        "id", "v", "cid", cosine_col(F.col("v"), F.col("cv")).alias("cc")
    )
    aw = Window.partitionBy("id").orderBy(F.desc("cc"), F.asc("cid"))
    # materialize the assignment once: it feeds three branches (both pair
    # sides + the final left join); without this, Spark replays the n*k
    # centroid scoring per branch (same idiom as search.triangle_count)
    assigned = (
        scored.withColumn("_rn", F.row_number().over(aw))
        .filter(F.col("_rn") == 1)
        .select("id", F.col("cid").alias("cluster_id"), "v")
        .localCheckpoint(eager=True)
    )
    cw = Window.partitionBy("cluster_id").orderBy(F.asc("id"))
    capped = (
        assigned.withColumn("_cr", F.row_number().over(cw))
        .filter(F.col("_cr") <= max_cluster_size)
        .drop("_cr")
    )
    x = capped.select(F.col("cluster_id"), F.col("id").alias("id_a"), F.col("v").alias("va"))
    y = capped.select(F.col("cluster_id"), F.col("id").alias("id_b"), F.col("v").alias("vb"))
    dup_of = (
        x.join(y, "cluster_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine_col(F.col("va"), F.col("vb")) >= threshold)
        .groupBy(F.col("id_b").alias("id"))
        .agg(F.min("id_a").alias("dup_of"))
    )
    return (
        assigned.join(dup_of, "id", "left")
        .select(
            F.col("id").alias("vec_id"),
            F.col("cluster_id").cast("long").alias("cluster_id"),
            F.col("dup_of").cast("long").alias("dup_of"),
            F.col("dup_of").isNull().alias("is_kept"),
        )
    )


def semdedup_sql(
    table: str = "embeddings",
    n_centroids: int = 8,
    threshold: float = 0.85,
    max_cluster_size: int = 4096,
) -> str:
    cos_assign = cosine_sql("e.v", "c.cv")
    cos_pair = cosine_sql("x.va", "y.vb")
    return f"""
        WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM {table}),
        c AS (SELECT id AS cid, v AS cv FROM e WHERE id < {n_centroids}),
        scored AS (
          SELECT e.id, e.v, c.cid, {cos_assign} AS cc
          FROM e CROSS JOIN c
        ),
        assigned AS (
          SELECT id, cid AS cluster_id, v FROM (
            SELECT *, row_number() OVER (PARTITION BY id ORDER BY cc DESC, cid ASC) AS rn
            FROM scored
          ) WHERE rn = 1
        ),
        capped AS (
          SELECT id, cluster_id, v FROM (
            SELECT *, row_number() OVER (PARTITION BY cluster_id ORDER BY id ASC) AS cr
            FROM assigned
          ) WHERE cr <= {max_cluster_size}
        ),
        dup AS (
          SELECT y.id_b AS id, min(x.id_a) AS dup_of
          FROM (SELECT cluster_id, id AS id_a, v AS va FROM capped) x
          JOIN (SELECT cluster_id, id AS id_b, v AS vb FROM capped) y
            ON x.cluster_id = y.cluster_id AND x.id_a < y.id_b
          WHERE {cos_pair} >= {threshold}
          GROUP BY y.id_b
        )
        SELECT a.id AS vec_id,
               a.cluster_id::BIGINT AS cluster_id,
               d.dup_of::BIGINT AS dup_of,
               (d.dup_of IS NULL) AS is_kept
        FROM assigned a LEFT JOIN dup d ON a.id = d.id
        ORDER BY vec_id
    """


# --- margin-based bitext mining ----------------------------------------------

BITEXT_K = 4
BITEXT_MARGIN_PPM = 1_020_000  # accept pairs whose ratio margin >= 1.02


def bitext_mine(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = BITEXT_K,
    margin_ppm: int = BITEXT_MARGIN_PPM,
    id_col: str = "vec_id",
) -> DataFrame:
    """Margin-based parallel-pair mining between two embedding "sides"
    (Artetxe & Schwenk ratio margin — the CCMatrix/LASER alignment
    criterion for mining translation pairs from comparable corpora).

    Sides are the deterministic parity split of the id (even = source
    side A, odd = target side B — in production this is the language
    column). For each of the first ``n_queries`` A-vectors:

      margin(a, b) = cos(a, b) / ((avgNN_a + avgNN_b) / 2)

    where avgNN_x is the mean cosine of x to its k nearest neighbors on
    the OTHER side — a pair scores high only if a and b are closer to
    each other than to their respective neighborhoods, which suppresses
    hub vectors that are near everything. Pairs with integer
    ``margin_ppm`` >= the threshold are emitted with their per-query
    margin rank.

    Numerics are the module's engine-proof idiom taken one step
    further: cosines are rounded to 6 (cosine_topk precedent) and the
    neighborhood aggregate is the SUM of those cosines in integer
    micros — integer addition is order-independent, so no engine's
    float summation order can flip a rounded average on a half
    boundary — and the margin is a pure integer floor division
    (2k * cos_micros * 1e6) DIV (sum_a + sum_b). Denominator <= 0
    (possible on adversarial vectors) is filtered identically in both
    engines.

    Scale shape: two broadcast-queries passes, mirror images of
    cosine_topk's — (1) broadcast the bounded query set against side B
    for the forward top-k, (2) broadcast the candidate set (<= nq * k
    rows, distinct forward neighbors) against side A for the backward
    neighborhoods. The corpus sides never shuffle; at 100 TB both passes
    swap in the LSH/IVF bucketed kernels (lsh_ann_topk / ivf_ann) as
    the candidate generators, same as the ANN family.
    """
    e = emb.select(F.col(id_col).alias("id"), F.col("embedding").cast("array<double>").alias("v"))
    a_side = e.filter(F.col("id") % 2 == 0)
    b_side = e.filter(F.col("id") % 2 == 1)
    queries = a_side.filter(F.col("id") < 2 * n_queries).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv")
    )

    fwd = (
        b_side.crossJoin(F.broadcast(queries))
        .select(
            "query_id",
            F.col("id").alias("pair_id"),
            F.round(cosine_col(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    w_f = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("pair_id"))
    fwd_k = fwd.withColumn("rank_f", F.row_number().over(w_f)).filter(F.col("rank_f") <= k)
    # sum the 6-rounded cosines as integer MICROS: integer addition is
    # order-independent, so the neighborhood aggregate (and the margin
    # below) cannot drift with engine summation order — round(avg(float))
    # could flip by 1e-6 on a half boundary (review finding)
    micros = F.round(F.col("cos_sim") * 1_000_000).cast("long")
    avg_a = fwd_k.groupBy("query_id").agg(F.sum(micros).alias("sum_nn_a"))

    cand = fwd_k.select(F.col("pair_id").alias("id")).distinct().join(b_side, "id").select(
        F.col("id").alias("cand_id"), F.col("v").alias("cv")
    )
    bwd = (
        a_side.crossJoin(F.broadcast(cand))
        .select(
            "cand_id",
            F.col("id").alias("nbr_id"),
            F.round(cosine_col(F.col("cv"), F.col("v")), 6).alias("cos_nb"),
        )
    )
    w_b = Window.partitionBy("cand_id").orderBy(F.desc("cos_nb"), F.asc("nbr_id"))
    avg_b = (
        bwd.withColumn("rank_b", F.row_number().over(w_b))
        .filter(F.col("rank_b") <= k)
        .groupBy("cand_id")
        .agg(F.sum(F.round(F.col("cos_nb") * 1_000_000).cast("long")).alias("sum_nn_b"))
    )

    scored = (
        fwd_k.join(avg_a, "query_id")
        .join(avg_b, fwd_k["pair_id"] == avg_b["cand_id"])
        .filter(F.col("sum_nn_a") + F.col("sum_nn_b") > 0)
        .select(
            "query_id",
            "pair_id",
            "cos_sim",
            # margin = cos / ((avg_a + avg_b) / 2) = 2k*cos / (sum_a + sum_b),
            # all-integer in micros: floor division, no float ratio
            F.expr(
                f"(2 * {k} * 1000000 * CAST(round(cos_sim * 1000000) AS BIGINT))"
                f" DIV (sum_nn_a + sum_nn_b)"
            ).alias("margin_ppm"),
        )
        .filter(F.col("margin_ppm") >= margin_ppm)
    )
    w_m = Window.partitionBy("query_id").orderBy(F.desc("margin_ppm"), F.asc("pair_id"))
    return scored.withColumn("rank", F.row_number().over(w_m))


def bitext_mine_sql(
    table: str = "embeddings",
    n_queries: int = 10,
    k: int = BITEXT_K,
    margin_ppm: int = BITEXT_MARGIN_PPM,
) -> str:
    """DuckDB twin with the identical split / rounding / ppm arithmetic."""
    cos_f = cosine_sql("q.qv", "b.v")
    cos_b = cosine_sql("c.cv", "a.v")
    return f"""
        WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM {table}),
        a_side AS (SELECT * FROM e WHERE id % 2 = 0),
        b_side AS (SELECT * FROM e WHERE id % 2 = 1),
        q AS (SELECT id AS query_id, v AS qv FROM a_side WHERE id < {2 * n_queries}),
        fwd AS (
          SELECT q.query_id, b.id AS pair_id, round({cos_f}, 6) AS cos_sim
          FROM q JOIN b_side b ON true
        ),
        fwd_k AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY cos_sim DESC, pair_id ASC) AS rank_f
            FROM fwd
          ) WHERE rank_f <= {k}
        ),
        avg_a AS (
          SELECT query_id,
                 sum(CAST(round(cos_sim * 1000000) AS BIGINT)) AS sum_nn_a
          FROM fwd_k GROUP BY query_id
        ),
        cand AS (
          SELECT b.id AS cand_id, b.v AS cv
          FROM (SELECT DISTINCT pair_id FROM fwd_k) p JOIN b_side b ON b.id = p.pair_id
        ),
        bwd AS (
          SELECT c.cand_id, a.id AS nbr_id, round({cos_b}, 6) AS cos_nb
          FROM cand c JOIN a_side a ON true
        ),
        avg_b AS (
          SELECT cand_id,
                 sum(CAST(round(cos_nb * 1000000) AS BIGINT)) AS sum_nn_b FROM (
            SELECT *, row_number() OVER (
              PARTITION BY cand_id ORDER BY cos_nb DESC, nbr_id ASC) AS rank_b
            FROM bwd
          ) WHERE rank_b <= {k} GROUP BY cand_id
        ),
        scored AS (
          SELECT f.query_id, f.pair_id, f.cos_sim,
                 (2 * {k} * 1000000 * CAST(round(f.cos_sim * 1000000) AS BIGINT))
                   // (aa.sum_nn_a + ab.sum_nn_b) AS margin_ppm
          FROM fwd_k f
          JOIN avg_a aa ON f.query_id = aa.query_id
          JOIN avg_b ab ON f.pair_id = ab.cand_id
          WHERE aa.sum_nn_a + ab.sum_nn_b > 0
        )
        SELECT query_id, pair_id, cos_sim, margin_ppm::BIGINT AS margin_ppm,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY margin_ppm DESC, pair_id ASC) AS rank
        FROM scored WHERE margin_ppm >= {margin_ppm}
        ORDER BY query_id, rank
    """
