"""Similarity search over embedding columns (array<float>).

Three tiers, all returning (query_id, neighbor_id, score, rank):

- **Brute-force cosine top-k** — the exactness baseline. Broadcast the
  query set, one pass over the corpus, per-query top-k window. Linear
  in corpus size; the right choice whenever |queries| is small enough
  to broadcast (the common re-ranking / eval case).
- **IVF (inverted-file) top-k** — the 100 TB path with a SQL-exact
  contract: centroids are a deterministic subset of the corpus (ids
  < n_centroids), every vector is assigned to its nearest centroid
  (one broadcast join, no shuffle of the corpus), and a query probes
  only its `nprobe` nearest cells. Corpus scan cost drops to
  ~nprobe/n_centroids of brute force; the assignment table is the
  partition key so cells co-locate.
- **Random-hyperplane LSH top-k** — sign-bit sketches via a seeded
  NumPy projection in an Arrow-batched pandas UDF; candidates collide
  on the bucket key, exact cosine re-rank on candidates only.

All arithmetic is an in-order left fold over the array
(aggregate ∘ zip_with), so a DuckDB oracle that folds in the same
order reproduces scores bit-for-bit; output scores are rounded to 6 dp
and ordering uses (rounded score DESC, id ASC) to stay engine-stable.

Dot products use built-in higher-order functions (JVM codegen). For
very wide vectors a Pandas-UDF BLAS path would win; at d≈64-1024 the
codegen'd fold is within noise and keeps the plan fully JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

# ---------------------------------------------------------------------------
# Vector kernels (pure column expressions)
# ---------------------------------------------------------------------------


def dot(a: Column, b: Column) -> Column:
    """In-order fold: sum_i a[i]*b[i] as double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_rounded(a: Column, b: Column, digits: int = 6) -> Column:
    return F.round(cosine(a, b), digits)


# ---------------------------------------------------------------------------
# Brute-force top-k
# ---------------------------------------------------------------------------


def brute_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query (self-matches excluded).

    Output: (query_id, neighbor_id, score, rank). The query side is
    broadcast — the corpus never shuffles; the only wide op is the
    per-query top-k, which AQE folds into a partial/final TakeOrdered.
    """
    # norms precomputed ONCE per row before the pair join — the per-
    # pair expression then folds a single dot instead of three (dot +
    # both norms), 3× less HOF work with bit-identical output: the
    # per-row norm is the same expression tree, so the division sees
    # the same IEEE operands
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


# ---------------------------------------------------------------------------
# Embedding near-duplicate pairs
# ---------------------------------------------------------------------------


def matryoshka_recall(
    corpus: DataFrame,
    queries: DataFrame,
    dims: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka truncation eval (Kusupati et al. 2022): recall@k of
    exact cosine search over the FIRST-d prefix of each embedding vs
    the full-dimension ranking — the dimension/quality trade-off card
    for MRL-style embeddings (serve the short prefix, re-rank with the
    tail). One row per d: (dim, n_full, n_common, recall).

    Scale shape: each dim runs the brute_topk plan (queries broadcast,
    corpus never shuffles); the recall joins are top-k-list-sized.
    len(dims) is a handful, so the union stays metadata-scale."""
    full = brute_topk(
        corpus, queries, k=k, id_col=id_col, vec_col=vec_col
    ).select("query_id", "neighbor_id")
    out: DataFrame | None = None
    for d in sorted(int(d) for d in dims):
        t_c = corpus.select(
            F.col(id_col), F.slice(vec_col, 1, d).alias(vec_col)
        )
        t_q = queries.select(
            F.col(id_col), F.slice(vec_col, 1, d).alias(vec_col)
        )
        tr = brute_topk(t_c, t_q, k=k, id_col=id_col, vec_col=vec_col).select(
            "query_id", "neighbor_id"
        )
        row = (
            full.agg(F.count("*").alias("n_full"))
            .crossJoin(
                full.join(tr, ["query_id", "neighbor_id"]).agg(
                    F.count("*").alias("n_common")
                )
            )
            .select(
                F.lit(d).alias("dim"),
                "n_full",
                "n_common",
                F.round(F.col("n_common") / F.col("n_full"), 4).alias(
                    "recall"
                ),
            )
        )
        out = row if out is None else out.unionByName(row)
    assert out is not None, "dims must be non-empty"
    return out


def cosine_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold, id_a < id_b.

    This is the O(N²) exactness baseline used for evaluation and as the
    verify stage after blocking; at corpus scale run it only on LSH/IVF
    candidate pairs (compose with lsh buckets or ivf cells).
    """
    a = corpus.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm(F.col(vec_col)).alias("na"),
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm(F.col(vec_col)).alias("nb"),
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF: deterministic centroids, cell-probed search
# ---------------------------------------------------------------------------


def ivf_centroids(corpus: DataFrame, n_centroids: int, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Centroids = the corpus rows with id < n_centroids. Deterministic
    'training' so any engine rebuilds the identical index; swap in
    k-means centroids in production without changing the query path."""
    return corpus.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
    )


def _nearest_cells(
    vecs: DataFrame, cents: DataFrame, n: int, id_alias: str, vec_alias: str
) -> DataFrame:
    """Per vector: its n nearest centroids by (rounded cosine DESC,
    centroid_id ASC). Norms hoisted per side (bit-identical scores:
    same expression trees into the same division)."""
    scored = (
        vecs.withColumn("_vn", norm(F.col(vec_alias)))
        .join(F.broadcast(cents.withColumn("_cn", norm(F.col("centroid_vec")))))
        .select(
            F.col(id_alias),
            F.col(vec_alias),
            F.col("centroid_id"),
            F.round(
                dot(F.col(vec_alias), F.col("centroid_vec"))
                / (F.col("_vn") * F.col("_cn")),
                6,
            ).alias("_cs"),
        )
    )
    w = Window.partitionBy(id_alias).orderBy(F.desc("_cs"), F.asc("centroid_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_cs", "_rn")
    )


def ivf_assign(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, embedding, centroid_id): each corpus vector in its
    single nearest cell. At scale this DataFrame is written
    partitioned by centroid_id so a probe reads only its cells.
    Pass ``centroids`` (e.g. kmeans_centroids output) to assign
    against a trained codebook instead of the deterministic seed."""
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(corpus, n_centroids, id_col, vec_col)
    )
    vecs = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    return _nearest_cells(vecs, cents, 1, "vec_id", "embedding")


def ivf_write_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF index: the assignment table written PARTITIONED
    BY centroid_id — the concrete 100 TB ANN layout. A probe then scans
    only its nprobe cells (partition pruning), i.e. ~nprobe/n_centroids
    of the corpus bytes, and cells re-cluster for free on read."""
    ivf_assign(corpus, n_centroids, id_col, vec_col).write.mode(
        "overwrite"
    ).partitionBy("centroid_id").parquet(path)


def _probe_cells(
    corpus: DataFrame,
    queries: DataFrame,
    n_centroids: int,
    nprobe: int,
    id_col: str,
    vec_col: str,
    centroids: DataFrame | None = None,
) -> DataFrame:
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(corpus, n_centroids, id_col, vec_col)
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    return _nearest_cells(q, cents, nprobe, "query_id", "qv")


def _rank_probed(probes: DataFrame, assigned: DataFrame, k: int) -> DataFrame:
    scored = (
        probes.withColumn("_qn", norm(F.col("qv")))
        .join(assigned.withColumn("_en", norm(F.col("embedding"))), "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot(F.col("qv"), F.col("embedding"))
                / (F.col("_qn") * F.col("_en")),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_path: str | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: probe the nprobe nearest cells per query,
    exact cosine within the probed cells. Output as brute_topk.

    With ``index_path`` the assignment comes from the PERSISTED
    centroid_id-partitioned index (ivf_write_index) and the probe join
    partition-prunes: the tiny probe side broadcasts and dynamic
    partition pruning restricts the parquet scan to the probed cells —
    the plan a 100 TB corpus needs (verified by a plan-shape test).
    ``centroids`` injects a trained codebook (kmeans_centroids) for
    both assignment and probing."""
    assigned = (
        corpus.sparkSession.read.parquet(index_path)
        if index_path is not None
        else ivf_assign(corpus, n_centroids, id_col, vec_col, centroids)
    )
    probes = _probe_cells(
        corpus, queries, n_centroids, nprobe, id_col, vec_col, centroids
    )
    if index_path is not None:
        probes = F.broadcast(probes)
    return _rank_probed(probes, assigned, k)


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (sign sketches)
# ---------------------------------------------------------------------------


def rademacher_planes(dim: int, n_planes: int):
    """±1 hyperplane matrix whose entry (i, j) is the low bit of
    md5('{j}#{i}') — a fixed pseudo-random projection any engine can
    rebuild exactly (the DuckDB oracles recompute it in SQL), unlike a
    seeded Gaussian RNG. Rademacher projections satisfy the same
    Johnson-Lindenstrauss/SimHash guarantees as Gaussian ones
    (Achlioptas 2003), so LSH quality is unchanged."""
    import hashlib

    import numpy as np

    m = np.empty((dim, n_planes), dtype=np.float64)
    for j in range(n_planes):
        for i in range(dim):
            bit = int(hashlib.md5(f"{j}#{i}".encode()).hexdigest()[0], 16) & 1
            m[i, j] = 1.0 if bit else -1.0
    return m


def _clean_matrix(vecs, dim: int):
    """(matrix, ok_row_indices) from an Arrow batch of embeddings,
    skipping NULL or wrong-dimension rows so one bad row gets a NULL
    key (joins nothing — the same null-propagation the SQL cosine
    kernels give) instead of aborting the whole task in np.stack."""
    import numpy as np

    ok_idx, clean = [], []
    for i, v in enumerate(vecs):
        if v is None:
            continue
        a = np.asarray(v, dtype=np.float64)
        if a.shape != (dim,):
            continue
        ok_idx.append(i)
        clean.append(a)
    if not clean:
        return None, ok_idx
    return np.stack(clean), ok_idx


def lsh_bucket_udf(dim: int, n_planes: int = 16, seed: int = 42, planes=None):
    """Pandas UDF: embedding → bucket key (int of n_planes sign bits)
    from a fixed projection (seeded Gaussian by default; pass
    ``planes=rademacher_planes(...)`` for the oracle-reproducible
    variant). Arrow-batched matmul — one BLAS call per ~10k vectors."""
    import numpy as np

    if planes is None:
        planes = np.random.default_rng(seed).standard_normal((dim, n_planes))

    @F.pandas_udf(LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        mat, ok = _clean_matrix(vecs, planes.shape[0])
        out = [None] * len(vecs)
        if mat is not None:
            bits = (mat @ planes) > 0
            keys = bits @ (1 << np.arange(planes.shape[1], dtype=np.int64))
            for i, kv in zip(ok, keys):
                out[i] = int(kv)
        return pd.Series(out, dtype="object")

    return bucket


def banded_keys_udf(planes, bands: int):
    """Pandas UDF: embedding → array of `bands` bucket keys, band b
    keyed by the sign bits of planes [b·p, (b+1)·p). The banded SimHash
    trick (same pigeonhole as MinHash banding): a pair collides if ANY
    band agrees, so recall rises with bands while each bucket join
    stays tiny."""
    import numpy as np

    n_planes = planes.shape[1]
    p = n_planes // bands
    weights = 1 << np.arange(p, dtype=np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def keys(vecs: pd.Series) -> pd.Series:
        mat, ok = _clean_matrix(vecs, planes.shape[0])
        out = [None] * len(vecs)
        if mat is not None:
            bits = (mat @ planes) > 0
            kk = np.stack(
                [bits[:, b * p : (b + 1) * p] @ weights for b in range(bands)], axis=1
            )
            for i, row in zip(ok, kk):
                out[i] = [int(x) for x in row]
        return pd.Series(out, dtype="object")

    return keys


def blocked_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    bands: int = 4,
    planes_per_band: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs at scale: banded sign-LSH blocking →
    exact cosine verify on candidate pairs only. Never materializes the
    O(N²) cross join — candidates come from equi-joins on (band, key),
    and the verify stage re-joins vectors by id. Plan shape survives
    10^10 rows: the widest shuffle is the bucket self-join, whose
    per-key fanout is bounded by bucket occupancy (2^planes_per_band
    keys per band), not by N².

    The projection is the md5-derived Rademacher matrix, so a SQL
    oracle reproduces the exact candidate set and scores; semantics =
    "pairs that share ≥1 LSH band AND cosine ≥ threshold" (recall vs
    the exact form is the standard banding curve; raise `bands` for
    more recall). `cosine_dup_pairs` stays as the eval-only exact form.
    """
    kfn = banded_keys_udf(rademacher_planes(dim, bands * planes_per_band), bands)
    keyed = corpus.select(
        F.col(id_col).alias("id"), F.posexplode(kfn(F.col(vec_col))).alias("band", "key")
    )
    a = keyed.select(F.col("id").alias("id_a"), "band", "key")
    b = keyed.select(F.col("id").alias("id_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = corpus.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm(F.col(vec_col)).alias("na"),
    )
    vb = corpus.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm(F.col(vec_col)).alias("nb"),
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes=None,
) -> DataFrame:
    """Approximate top-k: exact cosine only among same-bucket
    collisions. Fewer planes → bigger buckets → better recall, more
    compute; 8 planes ≈ 1/256 of the corpus per probe. Pass
    ``planes=rademacher_planes(dim, n_planes)`` for the
    oracle-reproducible projection."""
    b = lsh_bucket_udf(dim, n_planes, seed, planes=planes)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        b(F.col(vec_col)).alias("bucket"), norm(F.col(vec_col)).alias("cn"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        b(F.col(vec_col)).alias("bucket"), norm(F.col(vec_col)).alias("qn"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (the compression half of IVF-PQ)
# ---------------------------------------------------------------------------


def _l2sq(a: Column, b: Column) -> Column:
    """In-order fold: Σ (a[i]-b[i])² as double."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    ksub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Deterministic codebooks: entry c of subspace s = that subspace's
    dims of corpus row c (ids < ksub) — the same swap-in-kmeans-later
    contract as ivf_centroids, so any engine rebuilds the identical
    index. Returns [m][ksub][dim/m] floats — index METADATA (m·ksub·W
    values), collected once and shipped into plans as literals, the
    way a real PQ index broadcasts its codebooks."""
    rows = {
        r[id_col]: list(r[vec_col])
        for r in corpus.filter(F.col(id_col) < ksub).collect()
    }
    dim = len(next(iter(rows.values())))
    w = dim // m
    return [
        [[float(rows[c][s * w + i]) for i in range(w)] for c in range(ksub)]
        for s in range(m)
    ]


def pq_encode(
    corpus: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes array<int>): per subspace the nearest codebook
    entry by (rounded L2² ASC, entry ASC). 64 float dims → m small
    ints — the scan-compression that makes 100 TB ANN affordable.
    Pure codegen'd expressions: struct array_min implements the
    deterministic argmin, no UDF, no shuffle."""
    m, ksub = len(codebooks), len(codebooks[0])
    w = len(codebooks[0][0])
    vec = F.col(vec_col)
    codes = []
    for s in range(m):
        sub = F.slice(vec, s * w + 1, w)
        cands = [
            F.struct(
                F.round(
                    _l2sq(sub, F.array(*[F.lit(x) for x in codebooks[s][c]])), 6
                ).alias("d"),
                F.lit(c).alias("c"),
            )
            for c in range(ksub)
        ]
        codes.append(F.array_min(F.array(*cands)).getField("c"))
    return corpus.select(F.col(id_col).alias("vec_id"), F.array(*codes).alias("codes"))


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: approx L2²(q, doc) =
    Σ_s dtable_s[code_s], with dtable_s[c] = rounded L2² between the
    query's subspace-s slice and codebook entry c. The scan touches
    only the m-int codes — never the document vectors; each query
    carries its (m × ksub)-double distance table on the broadcast
    side. Output (query_id, neighbor_id, score, rank), score = approx
    distance ASC (smaller = closer), ties neighbor_id ASC."""
    m, ksub = len(codebooks), len(codebooks[0])
    w = len(codebooks[0][0])
    codes = pq_encode(corpus, codebooks, id_col=id_col, vec_col=vec_col)
    qv = F.col("qv")
    dtab = F.array(
        *[
            F.array(
                *[
                    F.round(
                        _l2sq(
                            F.slice(qv, s * w + 1, w),
                            F.array(*[F.lit(x) for x in codebooks[s][c]]),
                        ),
                        6,
                    )
                    for c in range(ksub)
                ]
            )
            for s in range(m)
        ]
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    qd = q.select("query_id", dtab.alias("dt"))
    joined = (
        codes.withColumnRenamed("vec_id", "neighbor_id")
        .join(F.broadcast(qd))
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    dist = F.lit(0.0)
    for s in range(m):
        dist = dist + F.element_at(
            F.col("dt").getItem(s), F.col("codes").getItem(s) + 1
        )
    scored = joined.select(
        "query_id", "neighbor_id", F.round(dist, 6).alias("score")
    )
    wnd = Window.partitionBy("query_id").orderBy(F.asc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wnd))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def ivfpq_write_index(
    corpus: DataFrame,
    path: str,
    codebooks: list,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF-PQ index: (vec_id, codes) written PARTITIONED BY
    centroid_id — the at-rest layout of a production billion-scale ANN
    store: a probe reads only its nprobe cell directories, and each
    row is m small ints instead of the vector. The codebooks travel
    separately (they're metadata — regenerate with pq_codebooks or
    persist the list yourself)."""
    cells = ivf_assign(corpus, n_centroids, id_col, vec_col).select(
        "vec_id", "centroid_id"
    )
    codes = pq_encode(corpus, codebooks, id_col=id_col, vec_col=vec_col)
    cells.join(codes, "vec_id").write.mode("overwrite").partitionBy(
        "centroid_id"
    ).parquet(path)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_path: str | None = None,
) -> DataFrame:
    """IVF-PQ: the canonical billion-scale ANN plan — coarse cells
    prune the scan (only `nprobe`/`n_centroids` of the corpus is
    read), PQ codes compress what remains (the scan carries m ints
    per vector, not the vectors). Composition of ivf_assign and
    pq_encode; with ``index_path`` the codes come from the PERSISTED
    centroid_id-partitioned table (ivfpq_write_index) and the
    broadcast probe side partition-prunes the scan to the probed
    cells, like ivf_topk's persisted path.
    Output (query_id, neighbor_id, score, rank) — ADC distance ASC."""
    m, ksub = len(codebooks), len(codebooks[0])
    w = len(codebooks[0][0])
    if index_path is not None:
        index = corpus.sparkSession.read.parquet(index_path).select(
            F.col("vec_id").alias("neighbor_id"), "centroid_id", "codes"
        )
    else:
        cells = ivf_assign(corpus, n_centroids, id_col, vec_col).select(
            "vec_id", "centroid_id"
        )
        codes = pq_encode(corpus, codebooks, id_col=id_col, vec_col=vec_col)
        index = cells.join(codes, "vec_id").select(
            F.col("vec_id").alias("neighbor_id"), "centroid_id", "codes"
        )
    probes = _probe_cells(corpus, queries, n_centroids, nprobe, id_col, vec_col)
    qv = F.col("qv")
    dtab = F.array(
        *[
            F.array(
                *[
                    F.round(
                        _l2sq(
                            F.slice(qv, s * w + 1, w),
                            F.array(*[F.lit(x) for x in codebooks[s][c]]),
                        ),
                        6,
                    )
                    for c in range(ksub)
                ]
            )
            for s in range(m)
        ]
    )
    qd = F.broadcast(probes.select("query_id", "centroid_id", dtab.alias("dt")))
    joined = index.join(qd, "centroid_id").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    dist = F.lit(0.0)
    for s in range(m):
        dist = dist + F.element_at(
            F.col("dt").getItem(s), F.col("codes").getItem(s) + 1
        )
    scored = joined.select("query_id", "neighbor_id", F.round(dist, 6).alias("score"))
    wnd = Window.partitionBy("query_id").orderBy(F.asc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wnd))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


# ---------------------------------------------------------------------------
# Distributed k-means (deterministic spherical Lloyd sweeps)
# ---------------------------------------------------------------------------


def kmeans_centroids(
    corpus: DataFrame,
    k: int,
    dim: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train IVF/SemDeDup centroids with deterministic spherical-Lloyd
    sweeps: init = corpus rows with id < k (the ivf_centroids seed), then
    ``iters`` rounds of [assign every vector to its nearest centroid by
    rounded cosine] → [new centroid = per-cell elementwise mean].

    Everything is engine-replayable: assignment ties break on
    centroid_id, means round to 6 dp, and a cell that loses all members
    keeps its previous centroid. Per sweep the corpus is scanned once;
    the mean is ``dim`` codegen'd avg aggregates (one shuffle on
    centroid_id, map-side partial agg — no position explode), and the
    k×dim centroid matrix is collected to the driver (O(k·dim) bytes,
    metadata-sized) to keep lineage flat across sweeps.

    Returns (centroid_id, centroid_vec) — drop-in for the centroid
    table consumed by ivf_assign/ivf_topk/semdedup.
    """
    spark = corpus.sparkSession
    cents = ivf_centroids(corpus, k, id_col, vec_col)
    vecs = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    for _ in range(iters):
        assigned = _nearest_cells(vecs, cents, 1, "vec_id", "embedding")
        means = assigned.groupBy("centroid_id").agg(
            *[
                F.round(F.avg(F.col("embedding").getItem(i).cast("double")), 6).alias(
                    f"_m{i}"
                )
                for i in range(dim)
            ]
        )
        new = cents.join(means, "centroid_id", "left").select(
            "centroid_id",
            F.when(
                F.col("_m0").isNotNull(),
                F.array(*[F.col(f"_m{i}") for i in range(dim)]),
            )
            .otherwise(F.col("centroid_vec").cast("array<double>"))
            .alias("centroid_vec"),
        )
        rows = new.collect()  # O(k·dim) — metadata, not data scale
        cents = spark.createDataFrame(
            [(r["centroid_id"], [float(x) for x in r["centroid_vec"]]) for r in rows],
            "centroid_id long, centroid_vec array<double>",
        )
    return cents


# ---------------------------------------------------------------------------
# SemDeDup: cluster-blocked semantic deduplication
# ---------------------------------------------------------------------------


def semdedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_path: str | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): prune semantic
    near-duplicates by clustering embeddings and comparing pairs only
    WITHIN each cluster — the quadratic pairwise work is bounded by the
    largest cell, never O(N²) over the corpus.

    1. Assign every vector to its nearest centroid (the IVF assignment;
       pass ``index_path`` to reuse the persisted centroid_id-
       partitioned index so this stage is a pruned scan, not a
       recompute).
    2. Within a cell, a vector is pruned when some higher-priority
       vector in the same cell has cosine ≥ ``threshold`` with it.
       Priority follows the paper: KEEP the item with the LOWEST
       cosine to its centroid (the cluster outlier carries the most
       marginal information); ties break on ascending id.

    The keep decision is greedy pairwise (one EXISTS semi-join), not a
    transitive closure — deterministic at any parallelism, and each
    cell's work ships as one shuffle partition keyed on centroid_id.
    For transitive-closure cluster semantics compose the pair output
    with dedup.connected_components.

    Returns (vec_id, centroid_id, centroid_sim, keep).
    """
    if index_path is not None:
        assigned = corpus.sparkSession.read.parquet(index_path)
    else:
        assigned = ivf_assign(corpus, n_centroids, id_col, vec_col, centroids)
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(corpus, n_centroids, id_col, vec_col)
    )
    scored = (
        assigned.withColumn("_n", norm(F.col("embedding")))
        .join(
            F.broadcast(cents.withColumn("_cn", norm(F.col("centroid_vec")))),
            "centroid_id",
        )
        .select(
            "vec_id",
            "embedding",
            "_n",
            "centroid_id",
            F.round(
                dot(F.col("embedding"), F.col("centroid_vec"))
                / (F.col("_n") * F.col("_cn")),
                6,
            ).alias("centroid_sim"),
        )
    )
    x = scored.select(
        F.col("centroid_id"),
        F.col("vec_id"),
        F.col("embedding").alias("vx"),
        F.col("_n").alias("nx"),
        F.col("centroid_sim").alias("sx"),
    )
    y = scored.select(
        F.col("centroid_id"),
        F.col("vec_id").alias("y_id"),
        F.col("embedding").alias("vy"),
        F.col("_n").alias("ny"),
        F.col("centroid_sim").alias("sy"),
    )
    # y dominates x: same cell, y farther from the centroid (or tied and
    # smaller id), and the pair is a semantic dup. Norms ride the cell
    # rows, so the quadratic in-cell check folds one dot per pair.
    dominated = (
        x.join(y, "centroid_id")
        .filter(
            (F.col("sy") < F.col("sx"))
            | ((F.col("sy") == F.col("sx")) & (F.col("y_id") < F.col("vec_id")))
        )
        .filter(
            F.round(
                dot(F.col("vx"), F.col("vy")) / (F.col("nx") * F.col("ny")), 6
            )
            >= threshold
        )
        .select("vec_id")
        .distinct()
        .withColumn("_pruned", F.lit(True))
    )
    return (
        scored.join(dominated, "vec_id", "left")
        .select(
            "vec_id",
            "centroid_id",
            "centroid_sim",
            F.coalesce(~F.col("_pruned"), F.lit(True)).alias("keep"),
        )
    )


__all__ = [
    "dot", "norm", "cosine", "cosine_rounded",
    "brute_topk", "cosine_dup_pairs", "blocked_dup_pairs",
    "matryoshka_recall",
    "ivf_centroids", "ivf_assign", "ivf_topk", "ivf_write_index",
    "lsh_bucket_udf", "lsh_topk", "rademacher_planes", "banded_keys_udf",
    "pq_codebooks", "pq_encode", "pq_topk", "ivfpq_topk", "ivfpq_write_index",
    "semdedup", "kmeans_centroids", "project_embeddings",
    "sq_stats", "sq_encode", "sq_reconstruct", "sq_topk",
]


def project_embeddings(
    df: DataFrame,
    out_dim: int,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction with the
    md5-Rademacher projection (rademacher_planes — the same
    oracle-reproducible scheme the sign-LSH family pins):
    proj[j] = <vec, plane_j> / sqrt(out_dim), each component rounded
    to 6 dp. Achlioptas 2003: ±1 projections carry the same JL
    distance-preservation guarantee as Gaussian ones.

    Returns (id, proj array<double>). The dot products are built as
    codegen'd zip_with/aggregate folds over LITERAL plane arrays —
    strictly left-to-right IEEE summation, so any engine folding the
    same way reproduces the values bit-for-bit (the DuckDB twin
    inlines the same literals); no UDF, no shuffle, work O(rows ×
    dim × out_dim) in the scan."""
    planes = rademacher_planes(dim, out_dim)
    scale = 1.0 / float(out_dim) ** 0.5
    vec = F.col(vec_col)

    def dot_j(j: int):
        plane = F.array(*[F.lit(float(planes[i, j])) for i in range(dim)])
        prods = F.zip_with(vec, plane, lambda x, w: x.cast("double") * w)
        s = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
        return F.round(s * F.lit(scale), 6)

    return df.select(
        F.col(id_col).alias("id"),
        F.array(*[dot_j(j) for j in range(out_dim)]).alias("proj"),
    )


# ---------------------------------------------------------------------------
# Scalar quantization (int8 codes — the memory-bound compression between
# full floats and PQ: 4x smaller than float32, one code per dimension)
# ---------------------------------------------------------------------------


def sq_stats(
    corpus: DataFrame, vec_col: str = "embedding"
) -> "list[tuple[float, float]]":
    """Per-dimension (vmin, vmax) training statistics for uniform
    scalar quantization (FAISS ScalarQuantizer QT_8bit's train step).
    Returns a 0-based python list — dim-sized METADATA (the one
    driver collect this family makes, same O(dim) budget as the
    k-means centroid collect); the scan folds map-side to
    partitions×dim rows before the single tiny shuffle."""
    rows = (
        corpus.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("vmin"), F.max("x").alias("vmax"))
        .collect()
    )
    out = [None] * len(rows)
    for r in rows:
        out[r["pos"]] = (float(r["vmin"]), float(r["vmax"]))
    return out


def _sq_lits(stats):
    mn = F.array(*[F.lit(a) for a, _ in stats])
    mx = F.array(*[F.lit(b) for _, b in stats])
    return mn, mx


def sq_encode(
    corpus: DataFrame,
    stats,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes array<int>): uniform int8 quantization
    code_i = clamp(floor((x - vmin_i) * 255 / (vmax_i - vmin_i) + .5),
    0, 255); a degenerate dimension (vmax = vmin) codes to 0. The
    clamp makes encode total over OUT-OF-RANGE inputs (queries from a
    different distribution), not just the training corpus.

    Codes are integers, so the quantized index is engine/partitioning
    bit-exact; the float grid arithmetic is pinned left-to-right
    (sub, mul, div, add-0.5) so both engines floor the same double.
    Pure codegen'd transform in the scan — no shuffle, no UDF; 4x
    smaller index bytes is the point at 100 TB."""
    mn, mx = _sq_lits(stats)
    vec = F.col(vec_col)
    codes = F.transform(
        vec,
        lambda x, i: F.when(
            F.element_at(mx, i + 1) == F.element_at(mn, i + 1), F.lit(0)
        )
        .otherwise(
            F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (x.cast("double") - F.element_at(mn, i + 1))
                        * F.lit(255.0)
                        / (F.element_at(mx, i + 1) - F.element_at(mn, i + 1))
                        + F.lit(0.5)
                    ),
                ),
            )
        )
        .cast("int"),
    )
    return corpus.select(F.col(id_col).alias("vec_id"), codes.alias("codes"))


def sq_reconstruct(codes_col, stats):
    """x̂_i = vmin_i + code_i * (vmax_i - vmin_i) / 255 — the
    asymmetric-distance decode (query stays float)."""
    mn, mx = _sq_lits(stats)
    return F.transform(
        codes_col,
        lambda c, i: F.element_at(mn, i + 1)
        + c.cast("double")
        * (F.element_at(mx, i + 1) - F.element_at(mn, i + 1))
        / F.lit(255.0),
    )


def sq_topk(
    codes: DataFrame,
    stats,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric SQ top-k (FAISS SQ search): float queries scored by
    cosine against RECONSTRUCTED corpus vectors — the standard
    accuracy/memory trade (codes are 1/4 the bytes; the query never
    quantizes, so only the corpus side pays quantization error).

    Output (query_id, neighbor_id, score, rank) — brute_topk's shape,
    same broadcast-queries / corpus-never-shuffles plan; score is the
    6-dp-rounded cosine of the reconstruction, and rank ties break on
    neighbor_id so the list is deterministic."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    c = codes.select(
        F.col("vec_id").alias("neighbor_id"),
        sq_reconstruct(F.col("codes"), stats).alias("rv"),
    ).withColumn("rn", norm(F.col("rv")))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("rv")) / (F.col("qn") * F.col("rn")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


# ---------------------------------------------------------------------------
# Margin-based bitext mining (cross-lingual parallel-pair discovery)
# ---------------------------------------------------------------------------


def mine_bitext(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    margin_threshold: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Ratio-margin bitext mining (Artetxe & Schwenk, ACL'19 — the
    LASER/CCMatrix recipe): a (src, tgt) sentence/doc pair is accepted
    when the two embeddings are MUTUAL nearest neighbors and their
    cosine stands out against each side's local neighborhood density:

        margin(x, y) = cos(x, y) / ((avg_kNN(x→tgt) + avg_kNN(y→src)) / 2)

    This is the standard mining step that turns a multilingual crawl
    (e.g. the hreflang-clustered page variants) into parallel training
    corpus, robust to hubness in a way raw-cosine thresholds are not.

    Output: (src_id, tgt_id, score, margin), mutual-top-1 pairs with
    margin ≥ threshold. Determinism: cosines rounded to 6; the k-NN
    average folds a SORTED score list sequentially (IEEE order fixed
    across engines/parallelism) then rounds to 6.

    Scale shape: WITHOUT ``candidates`` this is the EXACT twin — the
    candidate pair table is the full cross product (src side
    broadcast, norms precomputed per row), scored ONCE and persisted;
    both directions' top-1/avg-k reduce from it as windows — half the
    cosine work of a two-pass fwd/bwd spelling, bit-identical output
    (dot and the norm product are IEEE-commutative). The broadcast and
    the O(|src|·|tgt|) pair table make the exact form an EVAL-ONLY
    path past ~10^6 rows per side.

    ``candidates`` is the production path at 10^8+ rows per side: a
    (src_id, tgt_id) pair DataFrame from any blocked generator —
    banded sign-LSH collisions (:func:`blocked_dup_pairs` across the
    two halves), IVF probes (:func:`ivf_topk`) — joined back to the
    vectors by ID (equi-joins only, no full-side broadcast, no
    nested-loop join: the plan contract in
    tests/test_pipeline_ops.py). The same scoring tail runs over the
    much smaller candidate table; margins then average each side's
    AVAILABLE candidate neighbors (÷ actual count ≤ k, not ÷ k — a
    side with fewer than k candidates would otherwise understate its
    neighborhood density and inflate every margin), the standard
    approximate-margin trade: pairs whose true neighbors were never
    candidates can score optimistic margins, which the recall query
    (emb_bitext_recall) makes visible against the exact twin.

    Candidate-path determinism: with variable neighbor counts the
    margin is computed as a RATIONAL over exact integers — scores
    lift to micro-units (round(score·10⁶), exact in int64), and
    margin = 2·s·n_f·n_b / (sum_f·n_b + sum_b·n_f): one double
    division of two exact integers, bit-equal across engines and
    parallelism (the repo-wide probability-column scheme). The exact
    path keeps its sorted-IEEE-fold ÷k spelling unchanged.
    """
    s = src.select(
        F.col(id_col).alias("src_id"),
        F.col(vec_col).alias("sv"),
        norm(F.col(vec_col)).alias("sn"),
    )
    t = tgt.select(
        F.col(id_col).alias("tgt_id"),
        F.col(vec_col).alias("tv"),
        norm(F.col(vec_col)).alias("tn"),
    )
    if candidates is None:
        scored_src = t.join(F.broadcast(s))
    else:
        cand = candidates.select("src_id", "tgt_id").distinct()
        scored_src = cand.join(s, "src_id").join(t, "tgt_id")
    pairs = (
        scored_src.filter(F.col("tgt_id") != F.col("src_id"))
        .select(
            "src_id",
            "tgt_id",
            F.round(
                dot(F.col("sv"), F.col("tv")) / (F.col("sn") * F.col("tn")), 6
            ).alias("score"),
        )
        .persist()
    )
    w_f = Window.partitionBy("src_id").orderBy(
        F.desc("score"), F.asc("tgt_id")
    )
    w_b = Window.partitionBy("tgt_id").orderBy(
        F.desc("score"), F.asc("src_id")
    )
    fwd = pairs.withColumn("rank", F.row_number().over(w_f)).filter(
        F.col("rank") <= k
    )
    bwd = pairs.withColumn("rank", F.row_number().over(w_b)).filter(
        F.col("rank") <= k
    )

    def _avg(nn: DataFrame, key: str, out: str) -> DataFrame:
        fold = F.aggregate(
            F.array_sort(F.collect_list("score")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return nn.groupBy(key).agg(
            F.round(fold / F.lit(float(k)), 6).alias(out)
        )

    f1 = fwd.filter(F.col("rank") == 1).select("src_id", "tgt_id", "score")
    b1 = bwd.filter(F.col("rank") == 1).select("src_id", "tgt_id")
    mutual = f1.join(b1, ["src_id", "tgt_id"], "left_semi")
    if candidates is None:
        out = (
            mutual.join(_avg(fwd, "src_id", "avg_f"), "src_id")
            .join(_avg(bwd, "tgt_id", "avg_b"), "tgt_id")
            .withColumn(
                "margin",
                F.round(
                    F.col("score")
                    / ((F.col("avg_f") + F.col("avg_b")) / F.lit(2.0)),
                    6,
                ),
            )
        )
        return out.filter(F.col("margin") >= F.lit(margin_threshold)).select(
            "src_id", "tgt_id", "score", "margin"
        )
    # candidate path: integer-rational margin (see docstring) —
    # scores in micro-units, exact long sums/counts per side, one
    # double division of two exact integers
    si = F.round(F.col("score") * F.lit(1_000_000.0)).cast("long")
    f_agg = fwd.groupBy("src_id").agg(
        F.sum(si).alias("sum_f"), F.count(F.lit(1)).alias("n_f")
    )
    b_agg = bwd.groupBy("tgt_id").agg(
        F.sum(si).alias("sum_b"), F.count(F.lit(1)).alias("n_b")
    )
    out = (
        mutual.join(f_agg, "src_id")
        .join(b_agg, "tgt_id")
        .withColumn(
            "margin",
            F.round(
                (F.lit(2) * si * F.col("n_f") * F.col("n_b")).cast("double")
                / (
                    F.col("sum_f") * F.col("n_b")
                    + F.col("sum_b") * F.col("n_f")
                ).cast("double"),
                6,
            ),
        )
    )
    return out.filter(F.col("margin") >= F.lit(margin_threshold)).select(
        "src_id", "tgt_id", "score", "margin"
    )


# ---------------------------------------------------------------------------
# PCA: distributed integer moments → power-iteration top component
# ---------------------------------------------------------------------------
#
# Embedding-table dimensionality reduction with LEARNED axes (the
# variance-optimal complement to project_embeddings' data-oblivious JL
# projection). The decomposition follows the same scale split as
# k-means/sq_stats: the corpus-sized work (second moments) is one
# map-side-combining aggregation whose shuffle is O(dim²) rows per
# task regardless of corpus size; the dim×dim eigen step is
# metadata-sized and runs as tiny Spark jobs over the moment matrix
# (power iteration with per-sweep ITER_DIGITS rounding, the
# graphrank determinism scheme, so the component is bit-equal across
# engines and parallelism levels).
#
# All corpus-touching arithmetic is INTEGER: vectors quantize to a
# fixed grid (floor(x·scale + 0.5), the sq_encode convention) and the
# covariance NUMERATOR n·Σqᵢqⱼ − Σqᵢ·Σqⱼ is exact LONG math — no
# float summation order to pin. scale=10⁴ holds 64-dim unit-norm
# embeddings up to ~10⁹ rows inside int64; drop to 10² for a
# trillion-row corpus (documented trade: 2 fewer grid digits).

PCA_SCALE = 10_000


def pca_quantize(vec: Column, scale: int = PCA_SCALE) -> Column:
    """array<long>: the integer grid the moment math runs on
    (floor(x·scale + 0.5) — sq_encode's engine-exact rounding)."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long")
    )


def pca_moments(
    corpus: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    scale: int = PCA_SCALE,
) -> DataFrame:
    """Exact integer covariance numerators, one row per (i, j) with
    j ≥ i: (i, j, cov_num, n) where cov_num = n·Σqᵢqⱼ − Σqᵢ·Σqⱼ over
    the quantized vectors (the covariance matrix times n², exactly).

    ONE pass over the corpus: each row expands to its dim·(dim+1)/2
    upper-triangle products; the groupBy on (i, j) partial-aggregates
    map-side, so every task ships ≤ dim² rows no matter how many
    vectors it scanned. The first moments ride along as j = i rows'
    companions (s_i), aggregated in the same shuffle."""
    q = pca_quantize(F.col(vec_col), scale)
    tri = F.flatten(
        F.transform(
            q,
            lambda xi, i: F.transform(
                # upper triangle only: slice the tail from position i
                F.slice(q, i + 1, F.size(q) - i),
                lambda xj, j: F.struct(
                    i.alias("i"),
                    (i + j).alias("j"),
                    (xi * xj).alias("p"),
                    # first moment of the ROW coordinate rides along;
                    # only the diagonal's copy is used downstream
                    xi.alias("x"),
                ),
            ),
        )
    )
    mom = (
        corpus.select(F.explode(tri).alias("t"))
        .groupBy(F.col("t.i").alias("i"), F.col("t.j").alias("j"))
        .agg(
            F.sum("t.p").alias("sxy"),
            F.sum("t.x").alias("sx"),
            F.count("*").alias("n"),
        )
    )
    # s_i per coordinate = the diagonal's sx; join it back to both
    # ends of every (i, j) cell — a dim²-row broadcast join
    diag = mom.filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("_k"), F.col("sx").alias("_s")
    )
    out = (
        mom.join(F.broadcast(diag.withColumnRenamed("_k", "i").withColumnRenamed("_s", "_si")), "i")
        .join(F.broadcast(diag.withColumnRenamed("_k", "j").withColumnRenamed("_s", "_sj")), "j")
        .select(
            "i",
            "j",
            (F.col("n") * F.col("sxy") - F.col("_si") * F.col("_sj")).alias(
                "cov_num"
            ),
            "n",
        )
    )
    return out


def pca_covariance(
    corpus: DataFrame,
    vec_col: str = "embedding",
    scale: int = PCA_SCALE,
) -> DataFrame:
    """Full symmetric (i, j, cov_num, n) matrix — the upper triangle
    mirrored. dim² rows of LONGs: metadata-sized, engine-exact."""
    tri = pca_moments(corpus, vec_col, scale=scale)
    lower = tri.filter(F.col("i") != F.col("j")).select(
        F.col("j").alias("i"), F.col("i").alias("j"), "cov_num", "n"
    )
    return tri.unionByName(lower)


def pca_power_component(
    cov: DataFrame, sweeps: int = 6, digits: int = 9
) -> list[float]:
    """Top principal axis of the (i, j, cov_num) matrix by power
    iteration: v₀ = 1⃗; each sweep computes w = C·v with a j-sorted
    sequential fold per row (engine-replayable order), normalizes by
    max|w| (an order-free pick, never an L1/L2 float sum), and rounds
    to ``digits`` (graphrank's ITER_DIGITS scheme). The returned axis
    is sign-fixed: the first coordinate with |v| = 1 is made positive,
    so the component is unique, not just unique-up-to-sign.

    Each sweep is two tiny Spark jobs over the dim²-row matrix (the
    k-means-style O(dim) driver collect); nothing corpus-sized is
    touched. Returns a python list — axis METADATA for
    :func:`pca_project`."""
    rows_df = cov.groupBy("i").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("j"), F.col("cov_num")))
        ).alias("row")
    )
    rows_df = rows_df.localCheckpoint(eager=True)
    dim = rows_df.count()
    v = [1.0] * dim
    for _ in range(sweeps):
        varr = F.array(*[F.lit(float(x)) for x in v])
        w = rows_df.select(
            "i",
            F.aggregate(
                F.col("row"),
                F.lit(0.0),
                lambda acc, s: acc
                + s.cov_num.cast("double") * F.element_at(varr, s.j + 1),
            ).alias("w"),
        )
        w = w.localCheckpoint(eager=True)
        m = w.agg(F.max(F.abs(F.col("w")))).collect()[0][0]
        got = w.select(
            "i", F.round(F.col("w") / F.lit(float(m)), digits).alias("v")
        ).collect()
        nxt = [0.0] * dim
        for r in got:
            nxt[r["i"]] = float(r["v"])
        v = nxt
    # sign fix: exact comparisons only (no float arithmetic)
    mx = max(abs(x) for x in v)
    for x in v:
        if abs(x) == mx:
            if x < 0:
                v = [-y for y in v]
            break
    return v


def pca_project(
    corpus: DataFrame,
    axis: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = PCA_SCALE,
    digits: int = 6,
) -> DataFrame:
    """(vec_id, pc1): each vector's coordinate along the learned axis —
    Σᵢ qᵢ·vᵢ folded in coordinate order over the same integer grid the
    axis was trained on, rounded to ``digits``. Pure codegen'd
    expressions in the scan (the axis is a broadcast literal): no
    shuffle, no UDF — project_embeddings' cost shape with a learned
    axis instead of JL signs."""
    varr = F.array(*[F.lit(float(x)) for x in axis])
    q = pca_quantize(F.col(vec_col), scale)
    score = F.aggregate(
        F.zip_with(q, varr, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return corpus.select(
        F.col(id_col).alias("vec_id"), F.round(score, digits).alias("pc1")
    )


def prototype_select(
    corpus: DataFrame,
    n: int,
    n_centroids: int = 16,
    mode: str = "hard",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    index_path: str | None = None,
) -> DataFrame:
    """SSL-prototypes data pruning (Sorscher et al. 2022, "Beyond
    neural scaling laws"): rank every vector by cosine to its cluster
    prototype and keep ``n`` — ``mode="hard"`` keeps the FARTHEST from
    their prototypes (the informative tail, the right prune when data
    is abundant), ``mode="easy"`` the closest (when data is scarce).
    Selection is cluster-BALANCED: the global pick order is
    (within-cell rank, centroid_sim, vec_id), a round-robin across
    cells, so one dense cluster cannot monopolize the budget.

    Returns (vec_id, centroid_id, centroid_sim, pick_rank ≤ n).

    Scale shape: the assignment is the IVF machinery (pass
    ``index_path`` to reuse the persisted centroid_id-partitioned
    index — a pruned scan, not a recompute; or ``centroids`` from
    kmeans_centroids); the within-cell rank is a sort-based window
    keyed on centroid_id, and the global cut is a distributed
    top-n sort — no pairwise work anywhere, unlike semdedup this
    never compares vectors to each other. Every float is the rounded
    cosine, so the selection is engine- and parallelism-exact."""
    if mode not in ("hard", "easy"):
        raise ValueError(f"mode must be hard|easy, got {mode!r}")
    if index_path is not None:
        assigned = corpus.sparkSession.read.parquet(index_path)
    else:
        assigned = ivf_assign(corpus, n_centroids, id_col, vec_col, centroids)
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(corpus, n_centroids, id_col, vec_col)
    )
    scored = assigned.join(F.broadcast(cents), "centroid_id").select(
        "vec_id",
        "centroid_id",
        cosine_rounded(F.col("embedding"), F.col("centroid_vec")).alias(
            "centroid_sim"
        ),
    )
    sim_order = (
        F.asc("centroid_sim") if mode == "hard" else F.desc("centroid_sim")
    )
    w = Window.partitionBy("centroid_id").orderBy(sim_order, F.asc("vec_id"))
    ranked = scored.withColumn("_r", F.row_number().over(w))
    top = ranked.orderBy(F.asc("_r"), sim_order, F.asc("vec_id")).limit(n)
    wg = Window.orderBy(F.asc("_r"), sim_order, F.asc("vec_id"))
    return top.withColumn("pick_rank", F.row_number().over(wg)).select(
        "vec_id", "centroid_id", "centroid_sim", "pick_rank"
    )
