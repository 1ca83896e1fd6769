"""Link-graph ranking for frontier prioritization (P3 adjunct).

gocrawl pops by a static per-source priority (internal/common/types.go
Source.Priority; frontier ordering rounds.py:23-26). At open-web scale
the standard refinement is a link-graph score — rank hubs before leaf
pages so the politeness-limited fetch budget goes to high-yield URLs
first. This module adds that as a batch operator over the crawl's own
link structure: damped PageRank with a FIXED iteration count, suitable
as an extra priority column for `frontier.pop_batch`.

Scale shape: each iteration is ONE shuffle (groupBy dst) over the edge
list plus a broadcast-sized join against out-degrees when the graph is
wide; nodes/ranks tables are O(pages). That is the canonical
distributed PageRank plan — no driver-side graph, no per-row Python.
Determinism: every iteration rounds to ``ITER_DIGITS`` decimals, so
float summation order (Spark vs DuckDB vs parallelism level) cannot
drift the fixpoint; the final rank is rounded to 6.

In production the edge list comes from the extraction output (url →
out-links, udfs.extract_pages); tests and the oracle use the synthetic
corpus' formula-derived doc-id graph (synth.link_targets), which the
extraction goldens pin as byte-identical to what extraction recovers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ITER_DIGITS = 9


def doc_edges(docs: DataFrame, n: int, id_col: str = "doc_id") -> DataFrame:
    """The synthetic corpus link graph as (src, dst) — the pure-expr
    twin of synth.link_targets (fanout 3 + id%3, target
    (id*31 + 7*(j+1) + 1) % n), exactly what extraction recovers from
    the built HTML minus junk links."""
    j = F.explode(F.sequence(F.lit(0), F.lit(5))).alias("j")
    e = docs.select(F.col(id_col).alias("src"), j)
    return e.filter(F.col("j") < 3 + F.col("src") % 3).select(
        "src", ((F.col("src") * 31 + 7 * (F.col("j") + 1) + 1) % n).alias("dst")
    )


def link_rank(
    edges: DataFrame, iters: int = 3, damping: float = 0.85
) -> DataFrame:
    """(node, rank) after `iters` damped PageRank sweeps.

    r0 = 1/N; r_{t+1}(v) = round((1-d)/N + d * Σ_{u→v} r_t(u)/outdeg(u),
    ITER_DIGITS). Nodes with no out-edges leak their mass (no dangling
    redistribution — documented choice, matched by the oracle; the
    synthetic graph has min out-degree 3 so none exist there). Output
    rank is rounded to 6 — engine- and parallelism-independent.
    """
    edges = edges.select("src", "dst")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()  # O(nodes) count; PageRank needs N
    if n_nodes == 0:
        # empty admissible-link graph (every link junk/off-domain):
        # an empty rank table, not a ZeroDivisionError on the driver
        return edges.sparkSession.createDataFrame([], "node string, rank double")
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    base = (1.0 - damping) / n_nodes
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(iters):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("c"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .withColumn(
                "rank",
                F.round(
                    F.lit(base) + damping * F.coalesce(F.col("c"), F.lit(0.0)),
                    ITER_DIGITS,
                ),
            )
            .select("node", "rank")
        )
        # each sweep is one shuffle; snapshot the small rank table so
        # the next sweep's plan doesn't re-derive every prior sweep
        ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def trust_rank(
    edges: DataFrame,
    trusted: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """(node, trust) after `iters` personalized-PageRank sweeps
    seeded on a trusted whitelist (TrustRank, Gyöngyi et al. VLDB'04)
    — the anti-spam complement to link_rank: teleport mass goes ONLY
    to the `trusted` nodes (one column, `node`), so pages reachable
    from the whitelist accumulate trust and link-farm islands get
    none. A frontier can gate admission or demote priority on low
    trust.

    Same determinism scheme as link_rank: per-sweep rounding to
    ITER_DIGITS, per-node fan-in sums only, no global float
    reductions. Dangling mass leaks (documented link_rank choice).
    One shuffle per sweep + a broadcast of the seed set; the seed
    table is tiny (a curated whitelist) so the teleport join is a
    broadcast-hash join at any corpus scale."""
    edges = edges.select("src", "dst")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    seeds = F.broadcast(
        nodes.join(trusted.select("node"), "node").select(
            "node", F.lit(True).alias("_t")
        )
    )
    n_seeds = seeds.count()
    if n_seeds == 0:
        return edges.sparkSession.createDataFrame(
            [], "node long, trust double"
        )
    base = (1.0 - damping) / n_seeds
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    seeded = nodes.join(seeds, "node", "left")
    ranks = seeded.select(
        "node",
        F.when(F.col("_t"), F.lit(1.0 / n_seeds))
        .otherwise(F.lit(0.0))
        .alias("trust"),
    )
    for _ in range(iters):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("trust") / F.col("outdeg")).alias("c"))
        )
        ranks = (
            seeded.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                F.round(
                    F.when(F.col("_t"), F.lit(base)).otherwise(F.lit(0.0))
                    + damping * F.coalesce(F.col("c"), F.lit(0.0)),
                    ITER_DIGITS,
                ).alias("trust"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.round("trust", 6).alias("trust"))


def host_graph(
    edges: DataFrame,
    src_host: F.Column | str = "src_host",
    dst_host: F.Column | str = "dst_host",
) -> DataFrame:
    """Contract a URL-level link graph to the host level:
    (src_host, dst_host, weight=#url-edges, n_src_pages=#distinct
    linking pages), self-loops (intra-host links) dropped — the graph
    link_rank/trust_rank run on when ranking DOMAINS for crawl budget
    rather than pages. One groupBy on the host pair; at 10^10 edges
    the host graph is ~10^4× smaller than the page graph, so every
    downstream sweep runs on the contraction."""
    s = F.col(src_host) if isinstance(src_host, str) else src_host
    d = F.col(dst_host) if isinstance(dst_host, str) else dst_host
    return (
        edges.select(s.alias("src_host"), d.alias("dst_host"), "src")
        .filter(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(
            F.count("*").alias("weight"),
            F.countDistinct("src").alias("n_src_pages"),
        )
    )


def focused_priorities(
    pairs: DataFrame,
    topic_terms: list[str],
    base: int = 5,
    url_col: str = "url",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Focused-crawl frontier priorities (Shark-Search lineage,
    Hersovici et al. 1998): a candidate URL whose INBOUND anchor texts
    mention the topic is crawled first — the classic topical-crawl
    signal, computed from the same (src, url, anchor) stream
    anchor_index rolls up.

    relevance(url) = Σ over inbound anchors of topic-term occurrences
    (whitespace tokens, exact LONG sum — order-free), then the
    rank_priorities mean-normalized fixed-threshold bucketing into
    the reference's int priority scale; rows at `base` drop (the
    default already is base). Output (url_hash, priority) plugs into
    CrawlRun(rank_priority=...). One url-keyed shuffle + one O(urls)
    agg for the mean."""
    from gocrawl_spark import udfs

    toks = F.split(F.lower(F.col(anchor_col)), " ")
    hit = None
    for t in topic_terms:
        n_t = F.size(F.filter(toks, _eq_lit(t)))
        hit = n_t if hit is None else hit + n_t
    rel = (
        pairs.select(F.col(url_col).alias("url"), hit.alias("_h"))
        .groupBy("url")
        .agg(F.sum("_h").cast("long").alias("relevance"))
    )
    stats = rel.agg(
        F.count("*").alias("n"), F.sum("relevance").alias("s")
    ).collect()[0]
    if not stats["n"] or not stats["s"]:
        return rel.sparkSession.createDataFrame(
            [], "url_hash string, priority int"
        )
    mean = round(stats["s"] / stats["n"], ITER_DIGITS)
    x = F.round(F.col("relevance") / F.lit(mean), 6)
    pri = (
        F.when(x >= 4.0, base + 3)
        .when(x >= 2.0, base + 2)
        .when(x >= 1.2, base + 1)
        .otherwise(base)
    )
    out = udfs.with_url_identity(rel.select("url", pri.alias("priority")))
    return out.filter(F.col("priority") != base).select("url_hash", "priority")


def _eq_lit(t: str):
    lit = F.lit(t)
    return lambda x: x == lit


def opic_sweep(
    edges: DataFrame, cash: DataFrame, popped: DataFrame
) -> DataFrame:
    """One OPIC accounting sweep (Abiteboul/Preda/Cobena 2003) as pure
    DataFrame algebra — the arithmetic CrawlRun's online cash ledger
    applies per round (rounds._opic_round_delta), exposed standalone
    so the ledger semantics are oracle-checkable:

    - each `popped` node's cash splits equally (integer DIV of LONG
      micro-units — dust truncates) over its out-edges and credits the
      targets; the popped node resets to 0
    - un-popped nodes keep their cash; popped nodes with no out-edges
      leak theirs (the link_rank dangling choice)

    Inputs: edges(src, dst); cash(node, cash_u LONG); popped(node).
    Returns the updated (node, cash_u). All integer arithmetic — the
    ledger is bit-equal at any partitioning."""
    pop_cash = cash.join(popped.select("node"), "node").filter(
        F.col("cash_u") != 0
    )
    k = edges.groupBy("src").agg(F.count("*").alias("_k"))
    contrib = (
        edges.join(pop_cash.withColumnRenamed("node", "src"), "src")
        .join(k, "src")
        .select(
            F.col("dst").alias("node"),
            F.expr("cash_u DIV _k").alias("delta_u"),
        )
        .groupBy("node")
        .agg(F.sum("delta_u").alias("delta_u"))
    )
    kept = cash.join(popped.select("node"), "node", "left_anti").select(
        "node", F.col("cash_u").alias("delta_u")
    )
    return (
        contrib.unionByName(kept)
        .groupBy("node")
        .agg(F.sum("delta_u").alias("cash_u"))
    )


def hits(edges: DataFrame, iters: int = 3) -> DataFrame:
    """(node, hub, auth) after `iters` HITS sweeps (Kleinberg 1999) —
    the classic hub/authority complement to PageRank for seed-list
    curation: high-hub pages are directory/feed pages worth
    re-crawling for discovery, high-authority pages are link-endorsed
    content worth indexing first.

    a_{t+1}(v) = round(Σ_{u→v} h_t(u), ITER_DIGITS), then
    MAX-normalized (a / max(a), rounded) — max, unlike the textbook L2
    norm, is exactly order-independent, so the fixpoint is bit-equal
    across engines and parallelism; h_{t+1} symmetric over a_{t+1}.
    One shuffle per half-sweep + a broadcast one-row max; per-sweep
    localCheckpoint truncates the growing plan like link_rank."""
    edges = edges.select("src", "dst")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    hubs = nodes.withColumn("hub", F.lit(1.0))
    auths = nodes.withColumn("auth", F.lit(0.0))

    def _norm(scored: DataFrame, col: str) -> DataFrame:
        m = scored.agg(F.max(col).alias("_m"))
        return scored.crossJoin(F.broadcast(m)).select(
            "node",
            F.when(F.col("_m") == 0.0, F.lit(0.0))
            .otherwise(F.round(F.col(col) / F.col("_m"), ITER_DIGITS))
            .alias(col),
        )

    for _ in range(iters):
        a_raw = (
            edges.join(hubs.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.round(F.sum("hub"), ITER_DIGITS).alias("auth"))
        )
        auths = _norm(
            nodes.join(a_raw.withColumnRenamed("dst", "node"), "node", "left")
            .withColumn("auth", F.coalesce(F.col("auth"), F.lit(0.0))),
            "auth",
        ).localCheckpoint(eager=False)
        h_raw = (
            edges.join(auths.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.round(F.sum("auth"), ITER_DIGITS).alias("hub"))
        )
        hubs = _norm(
            nodes.join(h_raw.withColumnRenamed("src", "node"), "node", "left")
            .withColumn("hub", F.coalesce(F.col("hub"), F.lit(0.0))),
            "hub",
        ).localCheckpoint(eager=False)
    return (
        hubs.join(auths, "node")
        .select(
            "node",
            F.round("hub", 6).alias("hub"),
            F.round("auth", 6).alias("auth"),
        )
    )


def label_propagation(
    graph: DataFrame,
    iters: int = 4,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    weight_col: str = "weight",
) -> DataFrame:
    """Synchronous weighted label propagation (Raghavan et al. 2007)
    — community detection over the host graph: link farms, mirror
    networks, and topical site clusters surface as communities, the
    domain-level complement to trust_rank's spam scoring. Returns
    (node, community).

    label_0(u) = u; each sweep every node adopts the label with the
    LARGEST summed edge weight among its neighbors' current labels —
    argmax decided by (Σweight DESC, label ASC), so unlike the
    textbook's random tie-break the fixpoint is deterministic at any
    parallelism. Edges vote symmetrically (u→v weight counts for both
    endpoints; a pair present in both directions votes with both
    weights). Fixed ``iters`` sweeps — LPA on short-diameter web
    communities saturates in a handful.

    Scale shape: one label-keyed equi-join + one (node, label)
    groupBy per sweep, votes summed map-side in exact LONGs (no float
    order anywhere); row_number is a sort-based window keyed by node.
    localCheckpoint truncates the growing plan like the other sweeps.
    At 10^10 URLs this runs on the host CONTRACTION (host_graph), ~4
    orders smaller."""
    from pyspark.sql import Window

    e = graph.select(
        F.col(src_col).alias("u"),
        F.col(dst_col).alias("v"),
        F.col(weight_col).cast("long").alias("w"),
    )
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    )
    nodes = sym.select("u").distinct()
    labels = nodes.select("u", F.col("u").alias("label"))
    for _i in range(iters):
        if _i:
            # truncate lineage BETWEEN sweeps (not after the last one:
            # the returned plan keeps the final sweep inspectable for
            # the plan contract, and one checkpoint is saved)
            labels = labels.localCheckpoint(eager=False)
        votes = (
            sym.join(
                labels.select(F.col("u").alias("v"), "label"), "v"
            )
            .groupBy("u", "label")
            .agg(F.sum("w").alias("s"))
        )
        w = Window.partitionBy("u").orderBy(F.desc("s"), F.asc("label"))
        new = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("u", "label")
        )
        labels = nodes.join(new, "u", "left").select(
            "u", F.coalesce("label", F.col("u")).alias("label")
        )
    return labels.select(
        F.col("u").alias("node"), F.col("label").alias("community")
    )


def rank_from_extracted(
    extracted: DataFrame, iters: int = 3, damping: float = 0.85
) -> DataFrame:
    """(url, rank) from a finished crawl's extraction output — the
    offline between-generations pass: generation G's link graph ranks
    generation G+1's frontier (scheduler re-crawl loop, P5). Links are
    resolved through the same F2-F4 pipeline the frontier expansion
    uses, so the graph is exactly the crawl's admissible-URL graph."""
    from gocrawl_spark import udfs

    edges = extracted.select(
        F.col("url").alias("src"),
        F.explode(udfs.resolve_links_udf("url", "links")).alias("dst"),
    )
    return link_rank(edges, iters=iters, damping=damping).select(
        F.col("node").alias("url"), "rank"
    )


def rank_priorities(ranks: DataFrame, base: int = 5) -> DataFrame:
    """(url_hash, priority) overrides for CrawlRun(rank_priority=...).

    Buckets mean-normalized rank (rank / mean(rank); 1.0 = average
    page) into the reference's int priority scale with fixed
    thresholds — one O(pages) agg for the mean, then a pure map-side
    expression (no global sort/quantile), so it is deterministic and
    O(pages) at any scale: >=4x average -> base+3, >=2x -> base+2,
    >=1.2x -> base+1, else base (dropped — the default already is
    `base`). Normalizing by the OBSERVED mean, not 1/N, keeps the
    thresholds meaningful on crawl graphs where dangling final-tier
    pages leak PageRank mass (link_rank's documented no-redistribution
    choice)."""
    from gocrawl_spark import udfs

    stats = ranks.agg(
        F.count("*").alias("n"), F.sum("rank").alias("s")
    ).collect()[0]
    if not stats["n"]:
        # empty rank table (empty link graph): no overrides
        return ranks.sparkSession.createDataFrame([], "url_hash string, priority int")
    mean = round(stats["s"] / stats["n"], ITER_DIGITS)
    x = F.round(F.col("rank") / F.lit(mean), 6)
    pri = (
        F.when(x >= 4.0, base + 3)
        .when(x >= 2.0, base + 2)
        .when(x >= 1.2, base + 1)
        .otherwise(base)
    )
    out = udfs.with_url_identity(ranks.select("url", pri.alias("priority")))
    return out.filter(F.col("priority") != base).select("url_hash", "priority")


def anchor_pairs(
    corpus: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src, url, anchor): one row per resolvable <a href> in the
    corpus — the inbound-anchor evidence stream. The href is
    canonicalized exactly like the crawl's candidate pipeline
    (link_handler.go:33-58 semantics: junk-scheme cut → absolutize
    against the page URL → URL validity), so `url` here equals the
    frontier's candidate URL for the same link.

    Scale shape: one ``mapInPandas`` pass over the corpus scan —
    embarrassingly parallel like the extract kernel, no shuffle; the
    parse is shared per page across all of its anchors.
    """
    import pandas as pd

    from gocrawl_spark import canonicalize as canon
    from gocrawl_spark.extract import extract_anchor_texts
    from gocrawl_spark.htmlmini import parse

    def gen(batches):
        for pdf in batches:
            srcs: list[str] = []
            urls: list[str] = []
            anchors: list[str] = []
            for src, html in zip(pdf[url_col], pdf[html_col]):
                raw = (
                    html.decode("utf-8", "replace")
                    if isinstance(html, (bytes, bytearray))
                    else html
                )
                for href, text in extract_anchor_texts(parse(raw)):
                    if canon.is_junk_link(href):
                        continue
                    absu = canon.absolutize(src, href)
                    if absu and canon.is_valid_url(absu):
                        srcs.append(src)
                        urls.append(absu)
                        anchors.append(text)
            yield pd.DataFrame({"src": srcs, "url": urls, "anchor": anchors})

    return corpus.mapInPandas(gen, schema="src string, url string, anchor string")


def anchor_index(pairs: DataFrame, max_anchors: int = 16) -> DataFrame:
    """Inbound anchor-text index per target URL — the classic search /
    link-spam signal (how the web describes a page):

      (url, in_degree, n_src_hosts, anchors)

    anchors = the first `max_anchors` DISTINCT anchor texts in sorted
    order.

    Scale shape: the anchor list is cut to `max_anchors` rows per url
    BEFORE the rollup (distinct → row_number ≤ cap), so aggregation
    state for a hot target — a homepage with millions of distinct
    anchors — is bounded by the cap, not by the in-link count; the
    row_number itself is a sort-based window (O(1) state per task).
    Counts fold map-side in a url-keyed shuffle; both aggregates hash
    on url, so AQE reuses the partitioning for the final equi-join.
    """
    from pyspark.sql import Window

    from gocrawl_spark.udfs import host_col

    counts = (
        pairs.withColumn("_h", host_col("src"))
        .groupBy("url")
        .agg(
            F.count("*").alias("in_degree"),
            F.count_distinct("_h").alias("n_src_hosts"),
        )
    )
    w = Window.partitionBy("url").orderBy("anchor")
    capped = (
        pairs.select("url", "anchor")
        .filter(F.col("anchor").isNotNull())
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_anchors)
        .groupBy("url")
        .agg(F.array_sort(F.collect_list("anchor")).alias("anchors"))
    )
    # left join + empty-array fill: a url whose anchors are all NULL
    # still gets a row (matching the single-agg formulation it replaces)
    return counts.join(capped, "url", "left").withColumn(
        "anchors", F.coalesce("anchors", F.array().cast("array<string>"))
    )


def resolve_redirects(edges: DataFrame, max_hops: int = 16) -> DataFrame:
    """Batch redirect-map resolution: (url, final_url, hops, resolved)
    for every redirect source in `edges` (src, dst; ≤1 out-edge per
    src — a redirect map, not a link graph).

    gocrawl follows redirect chains inline per request (colly's
    http.Client transport, /root/reference/internal/crawler/
    crawler.go:223-228 passes through net/http's 10-hop default); a
    batch crawler instead resolves the whole round's redirect map at
    once so the frontier can dedup and schedule on TERMINAL urls.

    Plan: pointer doubling (path halving) — each sweep left-joins the
    state to itself on ptr=url, replacing every pointer with the
    pointer of its pointer and summing the hop distances, so k sweeps
    cover 2**k hops in k equi-join shuffles. At a 10^10-URL frontier
    that is O(log max_hops) shuffle rounds total, vs O(chain length)
    for a step-by-step walk; no driver-side state.

    Contract: a source is `resolved` iff its terminal lies within
    `max_hops` hops, where max_hops is rounded UP to the next power of
    two by the sweep count; unresolved rows (cycles, longer chains)
    carry final_url='' and hops=-1. Deterministic at every parallelism
    level (pure function of the edge set).
    """
    import math

    edges = edges.select("src", "dst")
    state = edges.select(
        F.col("src").alias("url"),
        F.col("dst").alias("ptr"),
        F.lit(1).cast("long").alias("dist"),
    )
    sweeps = max(1, math.ceil(math.log2(max(2, max_hops))))
    for _ in range(sweeps):
        nxt = state.select(
            F.col("url").alias("_u"), F.col("ptr").alias("_p"),
            F.col("dist").alias("_d"),
        )
        state = state.join(nxt, state["ptr"] == nxt["_u"], "left").select(
            "url",
            F.coalesce("_p", "ptr").alias("ptr"),
            (F.col("dist") + F.coalesce("_d", F.lit(0))).alias("dist"),
        )
    srcs = edges.select(F.col("src").alias("_s")).distinct()
    ok = F.col("_s").isNull() & (F.col("dist") <= max_hops)
    return state.join(srcs, state["ptr"] == F.col("_s"), "left").select(
        "url",
        F.when(ok, F.col("ptr")).otherwise(F.lit("")).alias("final_url"),
        F.when(ok, F.col("dist")).otherwise(F.lit(-1)).cast("long").alias("hops"),
        ok.alias("resolved"),
    )


def cocitation_seeds(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    host_col: str = "dst_host",
    seed_col: str = "host",
    max_out: int = 32,
    top_k: int = 0,
) -> DataFrame:
    """Seed-set expansion by co-citation: hosts that pages cite
    ALONGSIDE known-good seed hosts are the best candidates for new
    crawl seeds — co-citation similarity (Small, JASIS 1973) applied
    to the web's link graph the way Dean & Henzinger's "related
    pages" algorithm does (WWW8 1999, the co-citation half). The
    reference's seed list is static YAML (internal/sources); this is
    the feedback loop that grows it from crawl evidence, the
    focused-crawl sibling of `focused_priorities` (anchor-text
    relevance) working off link STRUCTURE instead of anchor WORDS.

    `edges` is page-level (src page id/url, dst host); `seeds` a
    1-column host table. Seed citations are detected on the UNCAPPED
    distinct host set (a page that cites a seed is a seed-citing page
    no matter how farm-y it is — that side is bounded by the seed
    list anyway); the CANDIDATE hosts per page are capped at
    `max_out` (row_number by host ASC — deterministic), so a
    link-farm page contributes a bounded candidate set. A page citing
    ≥1 seed host contributes each of its capped candidate hosts one
    co-citation. Returns
    (host, n_pages = distinct co-citing pages,
     n_seed_hosts = distinct seed hosts it was co-cited with),
    seed hosts themselves excluded; `top_k > 0` cuts to the k best by
    (n_pages DESC, n_seed_hosts DESC, host ASC).

    Scale shape (10^10 edges): one (src, host) distinct + one
    src-keyed window for the candidate cap; the seed table is
    seed-list-sized — broadcast to tag rows in the scan; the
    co-citation pairing is a src-keyed join of capped candidates ×
    per-page seed hits (≤ max_out·|seeds| pairs per page, a
    constant), then one host-keyed groupBy. No uncapped fan-out
    anywhere; the candidate table is #hosts-sized.
    """
    from pyspark.sql import Window as W

    per_page = edges.select(
        F.col(src_col).alias("src"), F.col(host_col).alias("host")
    ).distinct()
    seed_tbl = F.broadcast(
        seeds.select(F.col(seed_col).alias("host")).distinct()
    )
    tagged = per_page.join(
        seed_tbl.withColumn("_is_seed", F.lit(True)), "host", "left"
    ).withColumn("_is_seed", F.coalesce(F.col("_is_seed"), F.lit(False)))
    seed_cites = tagged.filter(F.col("_is_seed")).select(
        "src", F.col("host").alias("_seed_host")
    )
    cands = (
        tagged.filter(~F.col("_is_seed"))
        .withColumn(
            "_rn", F.row_number().over(W.partitionBy("src").orderBy(F.asc("host")))
        )
        .filter(F.col("_rn") <= max_out)
        .select("src", "host")
    )
    out = (
        cands.join(seed_cites, "src")
        .groupBy("host")
        .agg(
            F.countDistinct("src").alias("n_pages"),
            F.countDistinct("_seed_host").alias("n_seed_hosts"),
        )
    )
    if top_k > 0:
        w = W.orderBy(
            F.desc("n_pages"), F.desc("n_seed_hosts"), F.asc("host")
        )
        out = (
            out.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= top_k)
            .drop("_rk")
        )
    return out


__all__ = [
    "doc_edges",
    "link_rank",
    "cocitation_seeds",
    "resolve_redirects",
    "rank_from_extracted",
    "rank_priorities",
    "anchor_pairs",
    "anchor_index",
    "label_propagation",
    "hyperball",
    "harmonic_centrality",
    "core_numbers",
    "ITER_DIGITS",
]


# ---------------------------------------------------------------------------
# hreflang language-variant clustering + return-link audit
# ---------------------------------------------------------------------------


def hreflang_alternates(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, lang, href) rows from ``<link rel="alternate"
    hreflang=…>`` tags — the multilingual-variant declarations a crawl
    uses to avoid re-fetching translations as independent discoveries
    and to group language editions for corpus balancing.

    Codegen regexp extraction (attribute order-independent: hreflang
    and href matched within the tag separately); rows with either
    attribute missing are dropped. One projection pass, no UDF — the
    htmlmini-kernel path extracts the same tags when full DOM parsing
    is wanted; this is the expression twin the oracle can mirror.
    """
    c = F.col(html_col)
    tags = F.regexp_extract_all(
        c, F.lit(r'(<link[^>]*rel="alternate"[^>]*>)'), 1
    )
    ex = pages.select(
        F.col(url_col).alias("url"), F.explode(tags).alias("tag")
    )
    return (
        ex.select(
            "url",
            F.regexp_extract("tag", r'hreflang="([^"]*)"', 1).alias("lang"),
            F.regexp_extract("tag", r'href="([^"]*)"', 1).alias("href"),
        )
        .filter((F.col("lang") != "") & (F.col("href") != ""))
    )


def hreflang_clusters(alternates: DataFrame) -> DataFrame:
    """Group language variants into clusters keyed by the
    lexicographically-least member URL. Correct under the hreflang
    contract that every member declares the full set including itself
    (Google rejects sets without return links, and
    :func:`hreflang_audit` surfaces the violations); under partial
    declarations the cluster id stays consistent as long as members
    agree on the least URL they can see. Output: (cluster_id, url,
    lang) — lang from the page's self-referencing declaration ('' when
    it declares no self link).

    One groupBy(url) aggregate — no iteration, no driver state; at
    10^10 URLs this is a single shuffle on url.
    """
    self_lang = F.max(
        F.when(F.col("href") == F.col("url"), F.col("lang"))
    )
    return (
        alternates.groupBy("url")
        .agg(
            F.least(F.min("href"), F.first("url")).alias("cluster_id"),
            F.coalesce(self_lang, F.lit("")).alias("lang"),
        )
        .select("cluster_id", "url", "lang")
    )


def hreflang_audit(alternates: DataFrame) -> DataFrame:
    """Missing-return-link audit: (src, dst) pairs where src declares
    dst as an alternate but dst does not declare src back — the
    validation search consoles run, and the precondition check for
    trusting :func:`hreflang_clusters` groupings. Self-references are
    exempt. One left_anti equi-join on the reversed edge."""
    fwd = alternates.filter(F.col("href") != F.col("url")).select(
        F.col("url").alias("src"), F.col("href").alias("dst")
    )
    rev = fwd.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return fwd.join(rev, ["src", "dst"], "left_anti").select("src", "dst")


def link_reciprocity(host_edges: DataFrame) -> DataFrame:
    """Per-host nepotistic-linking signals over the host graph: of a
    host's distinct out-neighbors, how many link straight back?
    Organic hosts reciprocate a little; link farms reciprocate almost
    everything (the TrustRank-era mutual-admiration signature this
    feeds into trust_rank seed selection as a cheap pre-filter).

    Input: (src_host, dst_host) edges (duplicates fine). Output:
    (host, n_out, n_recip, reciprocity_bp) with basis points as exact
    integer DIV. Self-loops are ignored. One distinct + one left_semi
    equi-join on the reversed edge + one host rollup — no pairwise
    host comparison, #hosts output rows.
    """
    e = (
        host_edges.select(
            F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi").groupBy("src").agg(
        F.count("*").cast("long").alias("n_recip")
    )
    out = e.groupBy("src").agg(F.count("*").cast("long").alias("n_out"))
    return (
        out.join(recip, "src", "left")
        .withColumn("n_recip", F.coalesce(F.col("n_recip"), F.lit(0).cast("long")))
        .select(
            F.col("src").alias("host"), "n_out", "n_recip",
            F.expr("n_recip * 10000 DIV n_out").alias("reciprocity_bp"),
        )
    )


def hyperball(
    edges: DataFrame, radius: int = 3, p: int = 8
) -> DataFrame:
    """Approximate neighborhood function by HyperBall (Boldi & Vigna
    2013): per node, an HLL counter of the ball {u : dist(v,u) ≤ r}
    following OUT-edges, grown one hop per sweep by max-merging each
    node's registers with its successors'. Output one row per
    (node, r) for r = 0..``radius``:

      (node, r, n_buckets, estimate)

    where estimate is the HLL cardinality of the r-ball (r=0 is always
    ≈1: the node itself). This is the web-graph centrality workhorse —
    ball growth curves feed :func:`harmonic_centrality`, spam balls
    (balls that explode faster than organic hosts') feed frontier
    deny-lists.

    Scale shape: state is the register table — ≤ nodes × 2^p rows of
    LONGs, in practice nodes × min(ball, 2^p) — and each sweep is ONE
    (node, bucket)-keyed shuffle of (edges ⋈ registers); nothing is
    ever collected and no N² structure exists, which is exactly why
    HyperBall runs on 10^10-node graphs. Registers use the
    :func:`gocrawl_spark.corpusstats.hll_registers` md5/bit-length
    integer scheme and :func:`~gocrawl_spark.corpusstats.hll_estimate`'s
    exact DECIMAL harmonic sum, so every (node, r, estimate) row is
    bit-equal across engines and parallelism levels. Lineage is
    truncated per sweep (localCheckpoint), the pagerank convention.
    """
    from gocrawl_spark import corpusstats

    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    seed = nodes.select("node", F.col("node").cast("string").alias("_v"))
    regs = corpusstats.hll_registers(seed, "_v", ["node"], p=p)
    regs = regs.localCheckpoint(eager=True)
    frames = [
        corpusstats.hll_estimate(regs, ["node"], p=p).select(
            "node", F.lit(0).alias("r"), "n_buckets", "estimate"
        )
    ]
    for r in range(1, radius + 1):
        succ = (
            e.join(regs.withColumnRenamed("node", "dst"), "dst")
            .select(F.col("src").alias("node"), "bucket", "rho")
        )
        regs = (
            regs.unionByName(succ)
            .groupBy("node", "bucket")
            .agg(F.max("rho").alias("rho"))
        )
        regs = regs.localCheckpoint(eager=True)
        frames.append(
            corpusstats.hll_estimate(regs, ["node"], p=p).select(
                "node", F.lit(r).alias("r"), "n_buckets", "estimate"
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def harmonic_centrality(anf: DataFrame, radius: int) -> DataFrame:
    """(node, harmonic_micro): HyperBall's harmonic-centrality
    estimate H(v) = Σ_{r=1..R} (N(v,r) − N(v,r−1)) / r from a
    :func:`hyperball` neighborhood-function table — each hop's
    newly-reached mass discounted by its distance (Boldi & Vigna's
    centrality of choice for web graphs: finite under disconnection,
    no dangling-mass hacks). Emitted in integer MICRO-units
    (floor(H·10⁶)), the repo's cross-engine convention: the 6dp
    estimates lift exactly onto the 10⁶ grid, each 1/r discount
    becomes an exact lcm(1..R)-weighted LONG sum, and one truncating
    DIV lands the result — no float fold whose half-way roundings an
    engine could disagree on (a /2 of 6dp deltas sits exactly on the
    7th-digit tie). One node-keyed rollup of the (R+1)-row groups —
    output is O(nodes)."""
    lcm = 1
    for r in range(2, radius + 1):
        g, a, b = 1, lcm, r
        while b:
            a, b = b, a % b
        g = a
        lcm = lcm * r // g
    arr = anf.groupBy("node").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("r"), F.col("estimate")))
        ).alias("a")
    )

    def _micro(r):
        return F.round(
            F.element_at(F.col("a"), r).estimate * F.lit(1_000_000.0), 0
        ).cast("long")

    coeffs = F.array(
        *[F.lit(lcm // k).cast("long") for k in range(1, radius + 1)]
    )
    fold = F.aggregate(
        F.sequence(F.lit(1), F.lit(radius)),
        F.lit(0).cast("long"),
        lambda acc, r: acc
        + F.element_at(coeffs, r) * (_micro(r + 1) - _micro(r)),
    )
    return arr.select("node", fold.alias("_h")).select(
        "node", F.expr(f"_h DIV {lcm}").alias("harmonic_micro")
    )


def core_numbers(
    edges: DataFrame, sweeps: int = 8, until_stable: bool = False
) -> DataFrame:
    """(node, core): k-core decomposition of the UNDIRECTED simple
    graph under ``edges`` by h-index iteration (Lü, Zhou, Zhang,
    Stanley 2016): c₀(v) = degree(v); c_{t+1}(v) = H-index of
    {c_t(u) : u ∼ v} — the largest h with ≥ h neighbors at value ≥ h.
    The sequence is monotone non-increasing and its fixpoint is
    exactly the coreness, the classic dense-subgraph / link-farm
    signal (a mutual-admiration clique of size k+1 pins a k-core
    however it disguises per-page degree).

    All-integer, so cross-engine equality is exact. Each sweep is one
    edge⋈values join + one sort-based window (row_number per node over
    value DESC — O(1) state per task; max(min(rank, value)) is
    invariant to tie order) + one node rollup: one shuffle per sweep,
    no collected state. With ``until_stable`` the loop adds an O(1)
    driver count per sweep and stops at the fixpoint (guaranteed:
    values are non-increasing non-negative integers); with the default
    fixed count the op is a pure ``sweeps``-job pipeline whose oracle
    unrolls identically — tests assert the fixture reaches its
    fixpoint well inside the default.
    """
    from pyspark.sql import Window

    fwd = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    und = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    und = und.localCheckpoint(eager=True)
    cur = und.groupBy("src").agg(F.count("*").cast("long").alias("c"))
    cur = cur.localCheckpoint(eager=True)
    w = Window.partitionBy("src").orderBy(F.desc("c"))
    done = 0
    while True:
        nb = und.join(
            cur.select(F.col("src").alias("dst"), "c"), "dst"
        ).select("src", "c")
        nxt = (
            nb.withColumn("_rn", F.row_number().over(w))
            .select(
                "src",
                F.least(F.col("_rn").cast("long"), F.col("c")).alias("_h"),
            )
            .groupBy("src")
            .agg(F.max("_h").alias("c"))
        )
        nxt = nxt.localCheckpoint(eager=True)
        done += 1
        if until_stable:
            changed = (
                nxt.withColumnRenamed("c", "_n")
                .join(cur, "src")
                .filter(F.col("_n") != F.col("c"))
                .count()
            )
            cur = nxt
            if changed == 0:
                break
        else:
            cur = nxt
            if done >= sweeps:
                break
    return cur.select(F.col("src").alias("node"), F.col("c").alias("core"))
