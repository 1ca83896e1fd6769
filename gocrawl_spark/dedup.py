"""Deduplication operators for web-scale training corpora.

Five families, each a standard public technique, each built Spark-first:

- **Exact** — md5-of-normalized-text groupBy; one shuffle on the hash,
  map-side combine; the canonical survivor is the min doc_id.
- **MinHash + LSH** — k-shingles → H md5-based minhashes → B banded
  keys → bucket self-join for candidates → signature-agreement
  estimate. The signature build ships as an Arrow-batched pandas UDF
  (minhash_signature_udf) — Spark's nested higher-order functions run
  interpreted, so the expression twin (minhash_signature, kept as the
  executable spec that the DuckDB oracle mirrors) is ~100× slower.
  The only shuffles are the band-bucket join (keys are ~unique, so
  tiny) and the signature re-join for scoring.
- **n-gram Jaccard** — exact set Jaccard via an inverted-index join on
  shingles (never a cross join): candidates are pairs sharing ≥1
  shingle, then array_intersect/array_union on distinct shingle sets.
- **SimHash** — 64-bit md5-derived simhash in an Arrow-batched pandas
  UDF; near-dup candidates via the 4×16-bit band trick (Manku et al.,
  WWW'07), verified by Hamming distance.
- **Embedding cosine** — see gocrawl_spark.similarity (shared kernel).

Scale notes (10^10 docs): every op here shuffles on high-cardinality
keys (md5 / band key / shingle), so partitions stay balanced without
salting; hot shingles (stop-shingles) are the one skew source and
`ngram_jaccard_pairs` drops shingles with document-frequency > max_df
before the join — the standard inverted-index stopword cut.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from gocrawl_spark.textstats import norm_words as _norm_words
from gocrawl_spark.textstats import shingles as _shingles
from gocrawl_spark.textstats import shingles_of_words as _shingles_of_words

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def text_key(col: Column | str, normalize: bool = True) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    if normalize:
        c = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    return F.md5(c)


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(text_key, n_docs, canonical_id=min id) for groups with dups."""
    return (
        df.select(F.col(id_col), text_key(text_col).alias("text_key"))
        .groupBy("text_key")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("canonical_id"))
        .filter(F.col("n_docs") > 1)
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id row per normalized-text key. Aggregate-based
    (min_by), not window-based: partial aggregation halves the shuffle
    versus row_number() over a window."""
    key = text_key(text_col).alias("_tk")
    return (
        df.withColumn("_tk", key)
        .groupBy("_tk")
        .agg(F.min_by(F.struct(*df.columns), F.col(id_col)).alias("_row"))
        .select("_row.*")
    )


# ---------------------------------------------------------------------------
# MinHash signatures + LSH banding
# ---------------------------------------------------------------------------


def minhash_signature(col: Column | str, num_hashes: int = 16, k: int = 5) -> Column:
    """array<string> of H minhashes: sig[h] = min over shingles of
    md5('<h>#'<shingle>). md5-per-seed keeps the estimator unbiased
    enough at H=16 and makes the signature reproducible in any engine
    (the DuckDB oracle recomputes it bit-for-bit).

    NOTE: Spark evaluates nested higher-order functions interpreted
    (no codegen) and re-derives the shingle subexpression per seed, so
    this pure-expression form costs ~30 ms/doc. minhash_signature_udf
    computes the identical signature ~100× faster via Arrow; use this
    form only as the executable spec."""
    sh = _shingles(col, k)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda h: F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(h.cast("string"), F.lit("#"), s)))
        ),
    )


def _py_shingles(text: str | None, k: int) -> list[str]:
    """Python twin of textstats.norm_words+shingles (ASCII corpus:
    Java/RE2/Python regex classes agree)."""
    import re

    words = re.sub(r"[^a-z0-9\s]", " ", (text or "").lower()).split()
    if len(words) >= k:
        return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return [" ".join(words)]


def minhash_signature_udf(num_hashes: int = 16, k: int = 5):
    """Arrow-batched twin of minhash_signature: identical strings, one
    hashlib pass per (seed, shingle). This is the production path — the
    signature build is embarrassingly parallel and never shuffles."""
    import hashlib

    from pyspark.sql.types import ArrayType, StringType

    prefixes = [f"{h}#".encode() for h in range(num_hashes)]

    @F.pandas_udf(ArrayType(StringType()))
    def sig(text: pd.Series) -> pd.Series:
        md5 = hashlib.md5

        def one(t: str | None) -> list[str]:
            # encode each shingle once (not once per seed) and take the
            # min over raw digests — hex is base16 of the digest, so the
            # order is identical and only the winner pays the hex step
            enc = [s.encode("utf-8") for s in _py_shingles(t, k)]
            return [min(md5(p + b).digest() for b in enc).hex() for p in prefixes]

        return text.map(one)

    return sig


def band_keys(sig: Column, bands: int, rows: int) -> Column:
    """array<struct<band:int, key:string>> — one md5 bucket key per band
    of `rows` consecutive signature slots."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.md5(F.array_join(F.slice(sig, b * rows + 1, rows), "|")).alias("key"),
        ),
    )


def minhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    k: int = 5,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH candidate pairs with estimated Jaccard ≥ threshold.

    Output: (id_a, id_b, est_jaccard) with id_a < id_b. est_jaccard =
    fraction of agreeing signature slots. The band self-join only ever
    compares documents that collide in ≥1 band — at corpus scale the
    bucket sizes are O(dup-cluster size), not O(N).
    """
    rows = num_hashes // bands
    assert bands * rows == num_hashes
    # persist: the signature table is referenced three times (band
    # explode + both sides of the scoring join); without it Catalyst
    # re-derives every signature per reference. At corpus scale this
    # materializes as a signatures table, exactly like here.
    sigs = df.select(
        F.col(id_col).alias("id"),
        minhash_signature_udf(num_hashes, k)(F.col(text_col)).alias("sig"),
    ).persist()
    exploded = sigs.select("id", F.explode(band_keys(F.col("sig"), bands, rows)).alias("bk")).select(
        "id", "bk.band", "bk.key"
    )
    cand = (
        exploded.alias("a")
        .join(exploded.alias("b"), ["band", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    )
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", agree.cast("double") / F.lit(float(num_hashes)))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard via inverted-index join
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 1,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard over distinct k-gram sets for every pair sharing at
    least one k-gram. (id_a, id_b, jaccard), id_a < id_b.

    max_df drops k-grams appearing in more than max_df docs before the
    pair join — the stop-shingle cut that keeps the inverted index from
    exploding on common n-grams at corpus scale.
    """
    sets = df.select(
        F.col(id_col).alias("id"), F.array_distinct(_shingles(text_col, k)).alias("sh")
    )
    # one shuffle-heavy structure: distinct (id, |set|, gram) triples;
    # |A ∩ B| falls straight out of the inverted-index self-join as a
    # pair count — no exploded-pair distinct, no per-pair array ops,
    # and the set sizes ride along so J needs no second join
    inv = sets.select("id", F.size("sh").alias("n"), F.explode("sh").alias("g")).persist()
    if max_df is not None:
        # stop-shingle cut: boilerplate grams shared by >max_df docs are
        # exactly the quadratic blowup of the self-join at corpus scale;
        # dropping them makes `inter` (and so J) a documented undercount
        keep = inv.groupBy("g").agg(F.count("*").alias("_df")).filter(F.col("_df") <= max_df)
        inv = inv.join(keep.select("g"), "g")
    inter = (
        inv.alias("a")
        .join(inv.alias("b"), "g")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("inter")
    ).cast("double")
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Asymmetric near-containment (Broder 1997's containment score):

        c(A ⊆ B) = |sh(A) ∩ sh(B)| / |sh(A)|

    over distinct k-gram shingle sets — the aggregator/quotation case
    symmetric Jaccard misses: a short document wholly quoted inside a
    long one has c ≈ 1 while J ≈ |A|/|B| ≈ 0. Returns
    (contained_id, container_id, containment) for every ORDERED pair
    at or above the threshold (both directions of a pair can appear —
    two same-length near-dups contain each other).

    Scale shape: identical to ngram_jaccard_pairs — ONE inverted-index
    self-join produces |A ∩ B| as a pair count with both set sizes
    riding along; both directions then fall out of the same counted
    row, so asymmetry costs zero extra shuffles. ``max_df`` is the
    same stop-shingle cut against hot-gram blowup (a documented
    undercount when applied)."""
    sets = df.select(
        F.col(id_col).alias("id"), F.array_distinct(_shingles(text_col, k)).alias("sh")
    )
    inv = sets.select("id", F.size("sh").alias("n"), F.explode("sh").alias("g"))
    if max_df is not None:
        keep = (
            inv.groupBy("g").agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_df)
        )
        inv = inv.join(keep.select("g"), "g")
    inter = (
        inv.alias("a")
        .join(inv.alias("b"), "g")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    d1 = inter.select(
        F.col("id_a").alias("contained_id"),
        F.col("id_b").alias("container_id"),
        (F.col("inter").cast("double") / F.col("n_a").cast("double")).alias(
            "containment"
        ),
    )
    d2 = inter.select(
        F.col("id_b").alias("contained_id"),
        F.col("id_a").alias("container_id"),
        (F.col("inter").cast("double") / F.col("n_b").cast("double")).alias(
            "containment"
        ),
    )
    return d1.unionByName(d2).filter(F.col("containment") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64


def _simhash_of_words(words: list[str]) -> int:
    """64-bit simhash from md5-derived word hashes (two's-complement
    signed to fit Spark's long)."""
    import hashlib

    acc = [0] * SIMHASH_BITS
    for w in words:
        h = int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[:8], "big")
        for j in range(SIMHASH_BITS):
            acc[j] += 1 if (h >> j) & 1 else -1
    v = 0
    for j in range(SIMHASH_BITS):
        if acc[j] > 0:
            v |= 1 << j
    return v - (1 << 64) if v >= 1 << 63 else v


def simhash_udf():
    @F.pandas_udf(LongType())
    def simhash(text: pd.Series) -> pd.Series:
        import re

        def one(t: str | None) -> int:
            words = re.sub(r"[^a-z0-9\s]", " ", (t or "").lower()).split()
            return _simhash_of_words(words)

        return text.map(one)

    return simhash


def simhash_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by simhash: 4×16-bit band blocking (any pair
    within Hamming distance ≤3 of 64 bits must agree on ≥1 of 4
    16-bit chunks — pigeonhole), then exact Hamming verify via
    bit_count(xor). (id_a, id_b, hamming)."""
    sh = df.select(F.col(id_col).alias("id"), simhash_udf()(F.col(text_col)).alias("sh"))
    chunks = sh.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("sh"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("c"),
    ).select("id", "sh", "c.band", "c.chunk")
    cand = (
        chunks.alias("a")
        .join(chunks.alias("b"), ["band", "chunk"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Duplicate clusters: connected components over near-dup pairs
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """Min-label propagation over an undirected edge list →
    (id, cluster_id = min node id in the component).

    The dedup end-game: pairwise near-dup evidence (MinHash / SimHash /
    embedding pairs) must become DISJOINT clusters before survivors can
    be chosen — A~B and B~C must collapse into one cluster even when
    A~C was never a candidate pair. Pure DataFrame ops: each sweep
    joins the symmetrized edges to the current labels and takes the
    per-node min; converges in O(cluster diameter) sweeps (near-dup
    clusters are near-cliques, so 2-4 in practice), each sweep one
    shuffle keyed on the node id (high cardinality, balanced). Lineage
    is truncated per sweep (localCheckpoint) so the plan stays O(1)
    deep instead of O(iterations) nested joins. For adversarial
    diameters the large-star/small-star variant (Kiveris et al.,
    SoCC'14) drops the bound to O(log n) sweeps; unnecessary at
    dup-cluster shapes. min is order-free, so output is deterministic
    at any parallelism."""
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .unionByName(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .distinct()
        .persist()
    )
    labels = edges.select("u").distinct().withColumn("label", F.col("u"))
    for _ in range(max_iter):
        nbr = edges.join(
            labels.select(F.col("u").alias("v"), "label"), "v"
        ).select("u", "label")
        new = (
            labels.unionByName(nbr).groupBy("u").agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=True)
        changed = (
            new.join(labels.select("u", F.col("label").alias("_old")), "u")
            .filter(F.col("label") != F.col("_old"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("u").alias("id"), F.col("label").alias("cluster_id"))


def connected_components_star(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b", max_iter: int = 50
) -> DataFrame:
    """Alternating large-star/small-star connected components
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the O(log n)-round variant for ADVERSARIAL component
    diameters, where min-label propagation
    (:func:`connected_components`) needs O(diameter) sweeps. Same
    contract: (id, cluster_id = min node id of the component).

    Each round:
      large-star: every node u links its LARGER neighbors to
        m = min(Γ(u) ∪ {u}) — long chains contract exponentially;
      small-star: every node u links its smaller-or-self closure to
        its local min — stars flatten onto the component min.
    Edges are re-canonicalized to (min, max) pairs between halves;
    convergence = the canonical edge set reaches a fixpoint (checked
    with two anti-joins, no collect). Each half-round is one
    node-keyed shuffle; min is order-free so the labels are
    deterministic at any parallelism. Use when pair evidence can
    chain (e.g. ExactSubstr span links across a corpus); near-dup
    clusters are near-cliques where the simple propagation wins on
    constants."""
    canon = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )

    def _sym(c: DataFrame) -> DataFrame:
        return c.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            c.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )

    for _ in range(max_iter):
        e = _sym(canon)
        mins = e.groupBy("u").agg(F.min("v").alias("_mn"))
        mins = mins.select("u", F.least("_mn", F.col("u")).alias("_m"))
        large = (
            e.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias(a_col), F.col("_m").alias(b_col))
        )
        c1 = (
            large.select(
                F.least(F.col(a_col), F.col(b_col)).alias("a"),
                F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        e1 = _sym(c1)
        mins_le = (
            e1.filter(F.col("v") < F.col("u"))
            .groupBy("u")
            .agg(F.min("v").alias("_m"))
        )
        small = (
            e1.filter(F.col("v") < F.col("u"))
            .join(mins_le, "u")
            .select(F.col("v").alias(a_col), F.col("_m").alias(b_col))
            .unionByName(
                mins_le.select(F.col("u").alias(a_col), F.col("_m").alias(b_col))
            )
        )
        nxt = (
            small.select(
                F.least(F.col(a_col), F.col(b_col)).alias("a"),
                F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        unchanged = (
            nxt.join(canon, ["a", "b"], "left_anti").limit(1).count() == 0
            and canon.join(nxt, ["a", "b"], "left_anti").limit(1).count() == 0
        )
        canon.unpersist()
        canon = nxt.persist()
        if unchanged:
            break
    e = _sym(canon)
    labels = e.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("label"))
    # nodes that appeared in the input but lost every edge to
    # contraction (they became component mins) label themselves
    all_nodes = (
        pairs.select(F.col(a_col).alias("u"))
        .unionByName(pairs.select(F.col(b_col).alias("u")))
        .distinct()
    )
    out = (
        all_nodes.join(labels, "u", "left")
        .select(
            F.col("u").alias("id"),
            F.coalesce("label", F.col("u")).alias("cluster_id"),
        )
    )
    canon.unpersist()
    return out


def dup_clusters(pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, cluster_id, cluster_size, is_canonical) for every
    document carrying near-dup evidence. cluster_id = min doc_id of
    the component; the canonical member (doc_id == cluster_id) is the
    survivor the curation pipeline keeps, everything else is dropped —
    one row per document, so the downstream anti-join against the
    corpus is a plain equi-join on the id."""
    cc = connected_components(pairs)
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return cc.join(sizes, "cluster_id").select(
        F.col("id").alias(id_col),
        "cluster_id",
        "cluster_size",
        (F.col("id") == F.col("cluster_id")).alias("is_canonical"),
    )


def cluster_representatives(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Quality-elected survivor per near-dup cluster: instead of
    `dup_clusters`' min-id canonical, keep the member with the highest
    score (longest/cleanest copy — the RefinedWeb keep rule), ties to
    the smaller id. Input: `clusters` from :func:`dup_clusters`,
    `scores` = (id, score) e.g. textstats.quality_score rounded to
    6 dp. Returns (doc_id, cluster_id, cluster_size, score, is_kept).

    Scale shape: clusters hold only documents carrying dup evidence —
    a small fraction of the corpus — so the per-cluster window's
    cluster_id shuffle moves little; the score attach is an id
    equi-join. Degenerate giant clusters (boilerplate storms) are the
    skew risk; their rows all share one cluster_id — AQE skew-split
    applies, and the upstream banding already caps candidate fan-out.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        clusters.join(scores, id_col)
        .withColumn("is_kept", F.row_number().over(w) == 1)
        .select(id_col, "cluster_id", "cluster_size", score_col, "is_kept")
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 8,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "bench_text",
) -> DataFrame:
    """Test-set decontamination: (doc_id, bench_id, n_hits) for every
    document sharing ≥ min_hits distinct k-gram shingles with a
    benchmark item — the published n-gram-overlap contamination check
    (verbatim k-gram collision, the GPT-3/C4 decontamination rule).

    Scale shape: both sides explode to distinct (id, shingle) rows and
    meet in ONE equi-join on the shingle string. The benchmark side is
    eval-suite-sized (thousands of items), so its exploded index
    broadcasts; the corpus side streams through map-side — at 100 TB
    the plan is a broadcast-hash-join in the scan, no corpus shuffle.
    The hit count per (doc, bench) pair falls out of the join as a
    row count, exactly like ngram_jaccard_pairs' intersection."""
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(_shingles(text_col, k))).alias("g"),
    )
    b = benchmark.select(
        F.col(bench_id_col).alias("bench_id"),
        F.explode(F.array_distinct(_shingles(bench_text_col, k))).alias("g"),
    )
    return (
        d.join(F.broadcast(b), "g")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )


def line_key(line: Column) -> Column:
    """Normalized line identity: md5 of the lowercased, whitespace-
    squeezed, trimmed line — the CCNet paragraph-hash normalization."""
    return F.md5(F.trim(F.regexp_replace(F.lower(line), r"\s+", " ")))


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document line-level dedup (the CCNet/RefinedWeb
    boilerplate cut): drop every line whose normalized form appears in
    ≥ `min_docs` distinct documents — nav bars, footers, cookie
    banners repeat across a site; body prose does not. Returns
    (doc_id, text, n_lines, n_kept) with surviving lines rejoined in
    original order; a document whose every line is boilerplate keeps
    an empty text.

    Scale shape (10^10 docs): lines explode once; the duplicate-line
    table is built by one partial-agged shuffle on the line hash
    (high cardinality, balanced) and is tiny relative to the corpus —
    only hashes crossing the threshold survive the HAVING — so the
    back-join is broadcastable (AQE decides). Reassembly shuffles
    (id, pos, line) rows once on doc_id. No driver hop, no UDF.
    """
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("_h", line_key(F.col("line")))
    boiler = (
        lines.groupBy("_h")
        .agg(F.count_distinct("doc_id").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_h")
    )
    kept = lines.join(boiler, "_h", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("text"),
        F.count("*").alias("n_kept"),
    )
    totals = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), "\n")).alias("n_lines"),
    )
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce("text", F.lit("")).alias("text"),
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
    )


# Sentence-boundary separator inserted by the span splitter. \x1e never
# occurs in the corpus text (record-separator control char).
_SENT_SEP = "\x1e"


def split_sentences(col: Column | str) -> Column:
    """Deterministic sentence array: a separator is injected AFTER
    every terminal-punctuation + whitespace boundary, then the text
    splits on it — capture-group replacement instead of a lookbehind
    so the IDENTICAL transform runs on RE2 engines (the DuckDB oracle).
    Sentences are trimmed; empties drop."""
    marked = F.regexp_replace(F.col(col) if isinstance(col, str) else col,
                              r"([.!?])\s+", "$1" + _SENT_SEP)
    return F.filter(
        F.transform(F.split(marked, _SENT_SEP), F.trim),
        lambda s: s != "",
    )


def span_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """C4's cross-corpus span dedup (Raffel et al. 2020 §2.2: "we
    discarded all but one of any three-sentence span occurring more
    than once in the data set"): every sliding window of ``n``
    consecutive sentences is keyed by the md5 of its normalized
    (lowercased, space-joined) text; for each key occurring more than
    once corpus-wide, the FIRST occurrence by (doc_id, start) is kept
    and the sentences of every other occurrence are removed — the
    deterministic stand-in for the reference pipeline's
    arbitrary-winner election. Documents with fewer than ``n``
    sentences contribute no spans and pass through unchanged. Returns
    (doc_id, text, n_sentences, n_kept) with survivors rejoined by a
    single space.

    Scale shape (10^10 docs): sentences explode once; span keys are
    codegen'd md5s over array slices (no UDF); duplicate election is
    ONE window shuffle on the span hash (high cardinality, balanced —
    a hot boilerplate span concentrates its own key only, and its
    partition holds occurrence tuples, not text); removal positions
    rejoin the sentence table on (doc_id, pos) and documents
    reassemble with one doc_id-keyed shuffle, exactly line_dedup's
    plan. No driver hop."""
    sarr = docs.select(
        F.col(id_col).alias("doc_id"),
        split_sentences(text_col).alias("sents"),
    )
    # (doc_id, start, key) for every n-window; start is 1-based
    spans = sarr.filter(F.size("sents") >= n).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("sents") - (n - 1)),
                lambda i: F.struct(
                    i.alias("start"),
                    F.md5(
                        F.lower(F.concat_ws(" ", F.slice("sents", i, n)))
                    ).alias("key"),
                ),
            )
        ).alias("sp"),
    ).select("doc_id", F.col("sp.start").alias("start"), F.col("sp.key").alias("key"))
    w = Window.partitionBy("key").orderBy("doc_id", "start")
    marked = spans.select(
        "doc_id",
        "start",
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(
            Window.partitionBy("key").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_cnt"),
    )
    removals = (
        marked.filter((F.col("_cnt") >= 2) & (F.col("_rn") > 1))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (n - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    sents = sarr.select(
        "doc_id", F.posexplode("sents").alias("pos0", "sent")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "sent")
    kept = sents.join(removals, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "sent"))),
                lambda s: s["sent"],
            ),
        ).alias("text"),
        F.count("*").alias("n_kept"),
    )
    totals = sarr.select("doc_id", F.size("sents").alias("n_sentences"))
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce("text", F.lit("")).alias("text"),
        "n_sentences",
        F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
    )


def line_dedup_host(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    host_col: str = "source",
    min_docs: int = 2,
    min_frac: float = 0.25,
) -> DataFrame:
    """HOST-scoped boilerplate cut (the CCNet per-shard / RefinedWeb
    per-site variant of `line_dedup`): a line is boilerplate only when
    its normalized form appears in ≥ `min_docs` AND ≥
    ceil(min_frac · n_docs(host)) distinct documents OF THE SAME HOST.
    A sentence shared by two documents on different hosts (a quoted
    headline, a common disclaimer phrase) survives — unlike the
    corpus-global `line_dedup`, which drops it. This is the politer
    production default: nav bars and footers repeat *within* a site;
    prose that happens to repeat *across* sites is usually content.

    Returns (doc_id, text, n_lines, n_kept) with surviving lines
    rejoined in original order, exactly like `line_dedup`.

    Scale shape (10^10 docs): per-host doc totals are one map-side-
    combined groupBy on the host (output ≈ #hosts rows, broadcastable);
    the boilerplate table aggregates on (host, line-hash) — higher
    cardinality and better balanced than the global line hash, since a
    hot line on one giant host no longer collides with every other
    host's copy — and only threshold-crossers survive the HAVING, so
    the anti-join back is broadcast-sized per AQE. Reassembly shuffles
    (id, pos, line) once on doc_id. No driver hop, no UDF.
    """
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(host_col).alias("_host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("_h", line_key(F.col("line")))
    host_totals = docs.groupBy(F.col(host_col).alias("_host")).agg(
        F.count_distinct(F.col(id_col)).alias("_n_host")
    )
    boiler = (
        lines.groupBy("_host", "_h")
        .agg(F.count_distinct("doc_id").alias("_nd"))
        .join(host_totals, "_host")
        .filter(
            (F.col("_nd") >= min_docs)
            & (F.col("_nd") >= F.ceil(F.lit(float(min_frac)) * F.col("_n_host")))
        )
        .select("_host", "_h")
    )
    kept = lines.join(boiler, ["_host", "_h"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("text"),
        F.count("*").alias("n_kept"),
    )
    totals = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), "\n")).alias("n_lines"),
    )
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce("text", F.lit("")).alias("text"),
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
    )


def substring_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    within_doc: bool = False,
) -> DataFrame:
    """ExactSubstr-style duplicated-span detection (the window-hash
    form of Lee et al. 2021's suffix-array ExactSubstr, word-granular):
    a window position is DUPLICATED when its k-word window occurs in
    another document (`within_doc=True` also counts repeats inside the
    same document, the paper's semantics). Consecutive duplicated
    positions merge into spans — a duplicated substring of m > k words
    shows up as a run of m-k+1 duplicated windows.

    Returns one row per input document:
      (doc_id, total_windows, dup_windows, dup_runs, max_span_words)
    where max_span_words = longest duplicated span ≈ longest run
    + k - 1 words (0 when nothing is duplicated). Documents shorter
    than k words emit no windows (total_windows = 0).

    Scale shape (100 TB): windows ≈ one row per corpus token; the
    duplicate-hash table is ONE partial-agged shuffle on the md5 key
    (high cardinality, balanced — boilerplate hot windows each still
    aggregate to a single row), the mark-back is a semi equi-join on
    the same key, and run/span stats shuffle only the duplicated
    positions, partitioned by doc. Never a doc×doc join, no UDF, no
    driver hop.
    """
    from pyspark.sql.window import Window

    wdf = df.select(F.col(id_col).alias("id"), _norm_words(text_col).alias("w"))
    win = wdf.filter(F.size("w") >= k).select(
        "id",
        F.posexplode(
            F.transform(_shingles_of_words(F.col("w"), k), F.md5)
        ).alias("pos", "h"),
    )
    occ = win.groupBy("h").agg(
        F.count("*").alias("occ"), F.count_distinct("id").alias("docs")
    )
    dup = occ.filter(
        (F.col("occ") >= 2) if within_doc else (F.col("docs") >= 2)
    ).select("h")
    marked = win.join(dup, "h", "left_semi")
    # runs of consecutive duplicated positions: pos - row_number is
    # constant within a run (the classic gaps-and-islands grouping)
    seq = Window.partitionBy("id").orderBy("pos")
    per_run = (
        marked.withColumn("grp", F.col("pos") - F.row_number().over(seq))
        .groupBy("id", "grp")
        .agg(F.count("*").alias("run_len"))
    )
    stats = per_run.groupBy("id").agg(
        F.sum("run_len").alias("dup_windows"),
        F.count("*").alias("dup_runs"),
        (F.max("run_len") + F.lit(k - 1)).alias("max_span_words"),
    )
    totals = df.select(
        F.col(id_col).alias("id"),
        F.greatest(
            F.size(_norm_words(text_col)) - F.lit(k - 1), F.lit(0)
        ).alias("total_windows"),
    )
    return totals.join(stats, "id", "left").select(
        F.col("id").alias(id_col),
        F.col("total_windows").cast("long").alias("total_windows"),
        F.coalesce("dup_windows", F.lit(0)).cast("long").alias("dup_windows"),
        F.coalesce("dup_runs", F.lit(0)).cast("long").alias("dup_runs"),
        F.coalesce("max_span_words", F.lit(0)).cast("long").alias("max_span_words"),
    )


class MinHashIndex:
    """Incremental MinHash-LSH near-dup index for a GROWING corpus —
    the recurring-crawl shape: each generation ingests only its new or
    changed documents (curation.diff_corpus's added/changed feed)
    instead of re-signing the whole corpus.

    ``ingest(new_docs)``:
    - signatures are computed ONLY for the new documents (the Arrow
      UDF pass is O(new), not O(corpus));
    - candidate pairs = new×old ∪ new×new via the banded equi-join of
      the new band keys against the persisted band table (bucket
      collisions only — never all-pairs);
    - returns the verified pairs (estimated Jaccard ≥ threshold, same
      scoring as :func:`minhash_pairs`);
    - appends the new signatures + band keys as parquet deltas.

    Invariant (tested + oracle-checked): because the md5 minhash is
    deterministic, the UNION of pairs over any ingest partitioning
    equals :func:`minhash_pairs` over the whole corpus in one shot —
    old×old pairs were emitted when their later member arrived, and
    old×old is never re-joined, so nothing is duplicated or missed.

    Scale shape: per ingest, one signature pass over the new docs, one
    equi-join of O(new × bands) keys against the band table, one
    verify join against the signature table. State is append-only
    deltas (the crawl's seen-delta pattern); params are pinned in
    META.json and validated on open."""

    def __init__(
        self,
        spark,
        path: str,
        num_hashes: int = 16,
        k: int = 5,
        bands: int = 4,
        threshold: float = 0.5,
    ):
        import json
        import os

        assert num_hashes % bands == 0
        self.spark, self.path = spark, path
        self.num_hashes, self.k = num_hashes, k
        self.bands, self.threshold = bands, threshold
        self._meta_path = os.path.join(path, "META.json")
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                meta = json.load(f)
            want = {"num_hashes": num_hashes, "k": k, "bands": bands}
            if meta != want:
                raise ValueError(
                    f"MinHashIndex at {path} was built with {meta}, "
                    f"opened with {want} — signatures are not comparable"
                )

    def _deltas(self, sub: str) -> list[str]:
        import os

        d = os.path.join(self.path, sub)
        if not os.path.isdir(d):
            return []
        return sorted(
            os.path.join(d, x) for x in os.listdir(d) if x.startswith("delta=")
        )

    def _read(self, sub: str):
        parts = self._deltas(sub)
        return self.spark.read.parquet(*parts) if parts else None

    def ingest(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> DataFrame:
        import json
        import os

        rows = self.num_hashes // self.bands
        sigs = docs.select(
            F.col(id_col).alias("id"),
            minhash_signature_udf(self.num_hashes, self.k)(F.col(text_col)).alias("sig"),
        ).persist()
        new_bands = sigs.select(
            "id", F.explode(band_keys(F.col("sig"), self.bands, rows)).alias("bk")
        ).select("id", "bk.band", "bk.key").persist()

        old_bands = self._read("bands")
        nn = (
            new_bands.alias("a")
            .join(new_bands.alias("b"), ["band", "key"])
            .filter(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        )
        cand = nn
        if old_bands is not None:
            no = (
                new_bands.alias("a")
                .join(old_bands.alias("b"), ["band", "key"])
                .select(
                    F.least("a.id", "b.id").alias("id_a"),
                    F.greatest("a.id", "b.id").alias("id_b"),
                )
            )
            cand = cand.unionByName(no)
        cand = cand.distinct()

        old_sigs = self._read("sigs")
        all_sigs = sigs if old_sigs is None else sigs.unionByName(old_sigs)
        sa = all_sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
        sb = all_sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
        agree = F.size(
            F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
        )
        pairs = (
            cand.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn(
                "est_jaccard", agree.cast("double") / F.lit(float(self.num_hashes))
            )
            .filter(F.col("est_jaccard") >= self.threshold)
            .select("id_a", "id_b", "est_jaccard")
        )

        n = len(self._deltas("sigs"))
        sigs.write.parquet(os.path.join(self.path, "sigs", f"delta={n:04d}"))
        new_bands.write.parquet(os.path.join(self.path, "bands", f"delta={n:04d}"))
        if not os.path.exists(self._meta_path):
            os.makedirs(self.path, exist_ok=True)
            tmp = self._meta_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {"num_hashes": self.num_hashes, "k": self.k, "bands": self.bands},
                    f,
                )
            os.replace(tmp, self._meta_path)
        return pairs


def mirror_hosts(
    pages: DataFrame,
    host_col: str = "host",
    fp_col: str = "fp",
    threshold: float = 0.5,
    max_fp_hosts: int | None = 64,
) -> DataFrame:
    """Cross-host mirror detection (Bharat & Broder, "Mirror, mirror on
    the web", WWW 1999): host pairs whose content-fingerprint sets
    overlap — (host_a, host_b, shared, n_a, n_b, jaccard) with
    host_a < host_b and jaccard ≥ threshold. A crawler that detects
    mirrors skips re-fetching the replica and folds its link mass into
    the canonical host; gocrawl has no host-level dedup at all (its
    seen-filter is URL-exact), so this is the corpus-scale complement.

    Plan shape: exactly the doc-level inverted-index Jaccard
    (ngram_jaccard_pairs) lifted to host granularity — distinct
    (host, fp) pairs, a df cut dropping fingerprints shared by more
    than `max_fp_hosts` hosts (boilerplate/empty-page digests are the
    quadratic blowup at corpus scale; set sizes are post-cut, so the
    reported jaccard is over the informative-fingerprint universe),
    then one fp-keyed self-join whose pair count IS |A ∩ B|. Hosts-row
    output; no doc×doc or host×host cartesian anywhere.
    """
    hfp = pages.select(
        F.col(host_col).alias("h"), F.col(fp_col).alias("g")
    ).distinct()
    if max_fp_hosts is not None:
        keep = (
            hfp.groupBy("g")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_fp_hosts)
        )
        hfp = hfp.join(keep.select("g"), "g")
    sizes = hfp.groupBy("h").agg(F.count("*").alias("n"))
    inv = hfp.join(sizes, "h")
    inter = (
        inv.alias("a")
        .join(inv.alias("b"), "g")
        .filter(F.col("a.h") < F.col("b.h"))
        .groupBy(
            F.col("a.h").alias("host_a"),
            F.col("b.h").alias("host_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .agg(F.count("*").alias("shared"))
    )
    jac = F.col("shared").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("shared")
    ).cast("double")
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("host_a", "host_b", "shared", "n_a", "n_b", "jaccard")
    )


__all__ = [
    "text_key", "exact_dup_groups", "exact_dedup",
    "minhash_signature", "minhash_signature_udf", "band_keys", "minhash_pairs",
    "ngram_jaccard_pairs", "containment_pairs", "contamination",
    "simhash_udf", "simhash_pairs", "SIMHASH_BITS",
    "connected_components", "dup_clusters", "cluster_representatives",
    "line_key", "line_dedup", "line_dedup_host", "span_dedup",
    "split_sentences", "substring_spans",
    "MinHashIndex", "mirror_hosts",
]


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) dedup — archive-storage block dedup
# ---------------------------------------------------------------------------


def cdc_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    boundary_hex: str = "0",
):
    """Content-defined chunking (the rsync/LBFS/restic family): a
    position ends a chunk when the hash of the trailing `window`-char
    context lands in the boundary class — here, md5's last hex char ==
    `boundary_hex` (P=1/16, mean chunk ~16 chars) — so chunk
    boundaries survive insertions/deletions that shift byte offsets,
    unlike fixed-size blocks. The storage layer this feeds is
    warc.py's digest-dedup (whole-payload revisit records); CDC
    extends that to PARTIAL overlap: boilerplate headers/footers
    shared across a host's pages dedup at chunk level even when no two
    payloads are byte-identical.

    Output: (doc_id, chunk_idx, start, length, chunk_md5), 1-based
    start. Pure codegen — the boundary scan is one array expression
    per row (no UDF, no shuffle); the only wide op downstream is the
    digest rollup in :func:`cdc_dedup_stats`. (A gear-hash Arrow UDF
    is the constant-factor upgrade at 100 TB; the md5-window rule is
    the engine-portable contract both engines can verify.)
    """
    c = F.col(text_col)
    bnds = F.filter(
        F.sequence(F.lit(window), F.length(c)),
        lambda i: F.substring(F.md5(F.substr(c, i - window + 1, F.lit(window))), 32, 1)
        == boundary_hex,
    ).cast("array<long>")
    prevs = F.concat(F.array(F.lit(0).cast("long")), bnds)
    ex = docs.select(
        F.col(id_col).alias("doc_id"),
        c.alias("_t"),
        F.length(c).cast("long").alias("_n"),
        bnds.alias("_bnds"),
        F.posexplode(prevs).alias("chunk_idx", "prev"),
    )
    end = F.coalesce(F.get(F.col("_bnds"), F.col("chunk_idx")), F.col("_n"))
    return (
        ex.select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            (F.col("prev") + 1).alias("start"),
            (end - F.col("prev")).alias("length"),
            F.md5(
                F.substr(F.col("_t"), F.col("prev") + 1, end - F.col("prev"))
            ).alias("chunk_md5"),
        )
        .filter(F.col("length") > 0)
    )


def cdc_dedup_stats(chunks) -> "DataFrame":
    """One-row archive dedup report over a cdc_chunks table:
    (n_chunks, n_distinct, total_bytes, unique_bytes, dedup_bp) with
    dedup_bp = unique_bytes * 10000 DIV total_bytes — the storage
    ratio a chunk-addressed archive achieves. One digest-keyed rollup
    (map-side combined) + one global fold."""
    per = chunks.groupBy("chunk_md5").agg(
        F.count("*").cast("long").alias("refs"),
        F.max("length").cast("long").alias("length"),
    )
    return per.agg(
        F.sum("refs").cast("long").alias("n_chunks"),
        F.count("*").cast("long").alias("n_distinct"),
        F.sum(F.col("refs") * F.col("length")).cast("long").alias("total_bytes"),
        F.sum("length").cast("long").alias("unique_bytes"),
    ).select(
        "n_chunks", "n_distinct", "total_bytes", "unique_bytes",
        F.expr("unique_bytes * 10000 DIV total_bytes").alias("dedup_bp"),
    )


def prefix_filter_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 1,
    threshold: float = 0.5,
) -> DataFrame:
    """AllPairs/PPJoin prefix filtering (Bayardo et al. WWW'07; Xiao et
    al. WWW'08) for the exact-Jaccard similarity join: documents are
    indexed on only the FIRST p = |d| - ⌈t·|d|⌉ + 1 grams in a global
    rare-first order (df ASC, gram ASC) — any pair with J ≥ t provably
    shares a prefix gram, so the candidate set shrinks from
    "every co-occurring gram" (ngram_jaccard_pairs' full inverted
    index) to the rare-prefix collisions, typically orders of
    magnitude fewer pairs on boilerplate-heavy web text. Candidates
    verify with one exact array_intersect. Same output contract as
    ngram_jaccard_pairs: (id_a, id_b, jaccard), id_a < id_b — the
    equivalence is test-pinned.

    ⌈t·|d|⌉ is computed in EXACT integer arithmetic (t as
    round(t·1000)/1000, ceil = (tn·n + 999) DIV 1000), so the prefix
    bound is engine-identical — a float ceil at representation
    boundaries (0.7·10) silently shortens the prefix and drops pairs.

    Scale shape: one df rollup (gram-keyed, map-side combined), one
    row_number window per doc (sort-based, O(1) state), a prefix-only
    self-join, and a verify join that touches candidate pairs only.
    """
    tn = round(float(threshold) * 1000)
    sets = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(_shingles(text_col, k)).alias("sh"),
    )
    ex = sets.select(
        "id", F.size("sh").alias("n"), F.explode("sh").alias("g")
    )
    dfreq = ex.groupBy("g").agg(F.count("*").alias("_df"))
    w = Window.partitionBy("id").orderBy(F.asc("_df"), F.asc("g"))
    ranked = (
        ex.join(dfreq, "g")
        .withColumn("_r", F.row_number().over(w))
        .withColumn(
            "_p", F.col("n") - F.expr(f"({tn} * n + 999) DIV 1000") + 1
        )
    )
    pref = ranked.filter(F.col("_r") <= F.col("_p")).select("id", "g", "n", "_r")
    # positional filter (PPJoin): a shared prefix gram at positions
    # (r_a, r_b) bounds the overlap by 1 + min(n_a-r_a, n_b-r_b); the
    # pair survives only if some collision's bound reaches the minimal
    # overlap ⌈t(n_a+n_b)/(1+t)⌉ — again exact integer arithmetic,
    # again lossless (Xiao et al. WWW'08, Lemma 1)
    collide = (
        pref.alias("a")
        .join(pref.alias("b"), "g")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n").alias("_na"),
            F.col("b.n").alias("_nb"),
            (
                1
                + F.least(
                    F.col("a.n") - F.col("a._r"), F.col("b.n") - F.col("b._r")
                )
            ).alias("_ub"),
        )
    )
    minov = F.expr(f"({tn} * (_na + _nb) + {1000 + tn} - 1) DIV {1000 + tn}")
    cand = (
        collide.groupBy("id_a", "id_b", "_na", "_nb")
        .agg(F.max("_ub").alias("_ubmax"))
        .filter(F.col("_ubmax") >= minov)
        .select("id_a", "id_b")
    )
    va = sets.select(F.col("id").alias("id_a"), F.col("sh").alias("_sha"))
    vb = sets.select(F.col("id").alias("id_b"), F.col("sh").alias("_shb"))
    verified = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("_inter", F.size(F.array_intersect("_sha", "_shb")))
        .withColumn(
            "jaccard",
            F.col("_inter").cast("double")
            / (F.size("_sha") + F.size("_shb") - F.col("_inter")).cast(
                "double"
            ),
        )
    )
    return verified.filter(
        F.col("jaccard") >= F.lit(float(threshold))
    ).select("id_a", "id_b", "jaccard")


def contamination_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 8,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "bench_text",
    n_shards: int = 16,
    m_bits: int = 1 << 20,
    probe_acc=None,
) -> DataFrame:
    """:func:`contamination` for heldout suites too large to broadcast
    — the 100 TB-decon plan. The benchmark's distinct shingles build a
    SHARDED Bloom filter (the frontier's (shard, bits) machinery over
    sha256(shingle)); the corpus shingle stream probes it cogrouped
    per shard (O(1-shard) memory per task, never the whole filter),
    and only Bloom-POSITIVE rows pay the exact shingle equi-join that
    removes false positives. Bloom filters have no false negatives, so
    the result is EXACTLY :func:`contamination`'s (test-pinned): what
    changes is the plan — the corpus side shuffles only its hit
    residue (≈ true contamination rate + <1% FP) instead of every
    shingle, and no executor ever holds the benchmark index.

    ``probe_acc``: optional accumulator recording per-task merged-
    bitset bytes (the same O(1-shard) instrumentation contract as
    :func:`gocrawl_spark.frontier.filter_unseen_sharded`)."""
    from gocrawl_spark import frontier

    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(_shingles(text_col, k))).alias("g"),
    ).withColumn("_h", F.sha2(F.col("g"), 256))
    b = benchmark.select(
        F.col(bench_id_col).alias("bench_id"),
        F.explode(F.array_distinct(_shingles(bench_text_col, k))).alias("g"),
    )
    bloom_df = frontier.build_bloom_df(
        b.select(F.sha2(F.col("g"), 256).alias("_h")).distinct(),
        hash_col="_h", n_shards=n_shards, m_bits=m_bits,
    )
    tagged = frontier.tag_maybe_seen_sharded(
        d, bloom_df, hash_col="_h", n_shards=n_shards, probe_acc=probe_acc
    )
    hits = tagged.filter(F.col("_maybe_seen")).select("doc_id", "g")
    return (
        hits.join(b, "g")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )
