"""Text analysis for large-scale training-data pipelines.

Column-expression builders over a `documents`-shaped table
(doc_id, text, lang, source, n_chars). Everything here is pure
`pyspark.sql.functions` — JVM-side, whole-stage-codegen'd, no Python in
the hot path — so the same op runs unchanged on a 1000-executor scan of
100 TB: one narrow projection per document, zero shuffles.

Ops (each has a `queries()` + DuckDB-oracle entry in __spark_entry__):
- tokenization + token counting (whitespace and BPE-ish regex)
- quality scoring (length / punctuation / stopword-ratio heuristics)
- language identification (marker-token n-gram heuristic)
- document fingerprinting (k-shingle min-hash fingerprint, md5-based
  so any engine reproduces it bit-for-bit)

The one exception to "zero shuffles" here is the bigram-LM family at
the bottom (lm_bigram_counts / lm_perplexity / lm_buckets*): training
the LM is inherently an aggregation, so those ops shuffle — their
docstrings spell out the exact exchange budget.

The extraction-side text contract (clean_text, word_count) lives in
gocrawl_spark.extract / validate; these ops consume *already
extracted* text downstream of the crawl.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Tokenization
# ---------------------------------------------------------------------------


def tokens(col: Column | str) -> Column:
    """Whitespace tokens, empties dropped (mirrors Go strings.Fields,
    the reference's word splitter — validator.go:365-402)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda x: x != F.lit(""))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


# BPE-ish subword pieces: letter runs, digit runs, single punctuation —
# the GPT-2 pre-tokenizer shape without the learned merges.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpeish_count(col: Column | str) -> Column:
    """Proxy token count for budget estimation at corpus scale."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(f"({BPE_ISH_PATTERN})"), 1))


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------

STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "that",
    "for", "it", "on", "with", "as", "was", "at", "by", "be", "this",
]
_STOP_RE = r"\b(" + "|".join(STOPWORDS) + r")\b"
_PUNCT_RE = r"([.,;:!?])"


def stopword_hits(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(_STOP_RE), 1))


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(_PUNCT_RE), 1))


def quality_score(col: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic (C4/Gopher-style gates,
    reduced to public-rule arithmetic):

        0.5 * min(1, chars/500)            -- enough content
      + 0.3 * min(1, stop_ratio/0.4)       -- natural-language-ness
      + 0.2 * (1 - min(1, punct_ratio*5))  -- not symbol soup

    Pure integer counts + one division each → bit-stable across
    engines; rounded to 6 dp at the query layer.
    """
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    n_tok = token_count(c).cast("double")
    stop_ratio = F.when(n_tok > 0, stopword_hits(c) / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct_count(c) / n_chars).otherwise(F.lit(0.0))
    return (
        0.5 * F.least(F.lit(1.0), n_chars / F.lit(500.0))
        + 0.3 * F.least(F.lit(1.0), stop_ratio / F.lit(0.4))
        + 0.2 * (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * 5.0))
    )


# ---------------------------------------------------------------------------
# Language identification (marker n-gram heuristic)
# ---------------------------------------------------------------------------

# Top function words per language — the classic n-gram/stopword LID
# heuristic (Cavnar-Trenkle reduced to unigram markers). Deterministic
# argmax with fixed tie-break order.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "que", "pour", "dans"],
    "es": ["el", "los", "las", "es", "que", "para", "por", "una"],
    "zh": ["de", "shi", "le", "zai", "he", "you", "wo", "ta"],
}
LANG_ORDER = ["en", "de", "fr", "es", "zh"]


def lang_hits(col: Column | str, lang: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    pat = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(pat), 1))


def predict_lang(col: Column | str) -> Column:
    """First language (in LANG_ORDER) whose marker-hit count equals the
    max; 'und' when no marker fires at all."""
    hits = {la: lang_hits(col, la) for la in LANG_ORDER}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    for la in reversed(LANG_ORDER):
        expr = F.when(hits[la] == best, F.lit(la)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


# ---------------------------------------------------------------------------
# Fingerprinting (k-shingle min-hash fingerprint)
# ---------------------------------------------------------------------------


def norm_words(col: Column | str) -> Column:
    """Lowercase word stream with punctuation stripped — the shingle
    alphabet for fingerprints and MinHash (dedup.py)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", " ")), r"\s+"),
        lambda x: x != F.lit(""),
    )


def shingles_of_words(w: Column, k: int) -> Column:
    """k-word shingles from an already-materialized words array."""
    n = F.size(w)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.array_join(F.slice(w, i + 1, k), " "),
        ),
    ).otherwise(F.array(F.array_join(w, " ")))


def shingles(col: Column | str, k: int = 5) -> Column:
    """k-word shingles (array<string>); whole doc as one shingle when it
    has fewer than k words. Built with sequence+transform+slice — all
    codegen'd, no UDF. norm_words is lambda-bound via a length-1 array
    so the regex+split run once per doc, not once per shingle (Catalyst
    does not CSE the subtree into the per-element lambda otherwise —
    measured 4× slower without the binding)."""
    return F.transform(
        F.array(norm_words(col)), lambda w: shingles_of_words(w, k)
    ).getItem(0)


def fingerprint(col: Column | str, k: int = 5) -> Column:
    """Rolling-window document fingerprint: min md5 over k-shingles.
    Engine-portable (md5 of UTF-8 text) and robust to small edits —
    the winnowing-lite fingerprint used for fast doc identity at scale."""
    return F.array_min(F.transform(shingles(col, k), F.md5))


# ---------------------------------------------------------------------------
# PII redaction (training-data scrubbing)
# ---------------------------------------------------------------------------

# RE2-safe patterns (no lookaround) so the SAME regex runs in Spark
# (java.util.regex), DuckDB (RE2), and any downstream engine. Applied
# in this order — email first so the phone pattern can't eat digits
# out of an address, IP before phone for the same reason.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE_RE = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"
PII_PATTERNS = [
    ("email", PII_EMAIL_RE, "<EMAIL>"),
    ("ip", PII_IPV4_RE, "<IP>"),
    ("phone", PII_PHONE_RE, "<PHONE>"),
]


def pii_counts(col: Column | str) -> dict[str, Column]:
    """{kind: match count} BEFORE redaction — the scrub audit trail."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        kind: F.size(F.regexp_extract_all(c, F.lit(f"({pat})"), 1))
        for kind, pat, _ in PII_PATTERNS
    }


def redact_pii(col: Column | str) -> Column:
    """Text with emails / IPv4s / phone numbers replaced by typed
    placeholder tokens — the standard pre-training scrub pass. Pure
    chained regexp_replace: codegen'd in the scan, no shuffle, no UDF,
    and byte-identical across engines (patterns are RE2-safe)."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


# ---------------------------------------------------------------------------
# Gopher/C4-style repetition & shape gates
# ---------------------------------------------------------------------------


def gopher_stats(col: Column | str) -> dict[str, Column]:
    """Per-document shape metrics behind the public Gopher/C4 filter
    rules, as pure codegen'd expressions over the word array (bound
    once via the same length-1-array trick as shingles()):

      mean_word_len   -- avg chars per whitespace word
      frac_alpha      -- fraction of words containing a letter
      symbol_ratio    -- punctuation marks per word

    All integer counts + one division each → bit-stable across
    engines (round at the query layer)."""
    c = F.col(col) if isinstance(col, str) else col
    out: dict[str, Column] = {}
    w = F.array(tokens(c))  # length-1 wrapper: tokenize once, use thrice
    n = F.size(w.getItem(0))
    nn = F.when(n > 0, n.cast("double"))  # NULL-safe denominator
    out["n_words"] = n
    out["mean_word_len"] = F.transform(
        w, lambda ws: F.aggregate(ws, F.lit(0), lambda a, x: a + F.length(x))
    ).getItem(0) / nn
    out["frac_alpha"] = F.transform(
        w, lambda ws: F.size(F.filter(ws, lambda x: x.rlike("[A-Za-z]")))
    ).getItem(0) / nn
    out["symbol_ratio"] = punct_count(c) / nn
    return out


def repetition_stats(
    docs, id_col: str = "doc_id", text_col: str = "text", k: int = 2
):
    """Gopher's repetition rule, the n-gram half: per document, the
    fraction of k-gram mass taken by the single most frequent k-gram
    (`top_ngram_frac` — boilerplate/spam pages spike it) and the
    distinct-gram fraction (`distinct_frac` — low = loopy text).

    Plan: explode k-grams → two keyed aggregations, first on the
    high-cardinality (doc, gram) pair, then on doc — both with
    map-side partial agg, no window over the whole corpus, no UDF.
    At 100 TB the gram strings the shuffle carries are k words each,
    not the documents."""
    from pyspark.sql import functions as _F

    grams = docs.select(_F.col(id_col), _F.explode(shingles(text_col, k)).alias("g"))
    per = grams.groupBy(id_col, "g").agg(_F.count("*").alias("c"))
    agg = per.groupBy(id_col).agg(
        _F.max("c").alias("top_c"),
        _F.sum("c").alias("total"),
        _F.count("*").alias("n_distinct"),
    )
    return agg.select(
        _F.col(id_col),
        _F.round(_F.col("top_c") / _F.col("total"), 6).alias("top_ngram_frac"),
        _F.round(_F.col("n_distinct") / _F.col("total"), 6).alias("distinct_frac"),
    )


def compression_ratio_udf():
    """Arrow-batched pandas UDF: len(zlib(text)) / len(text) — the
    compression-ratio quality signal (boilerplate/repetitive spam
    compresses far below prose; the published web-corpus filters cut
    both extremes). No SQL twin exists (zlib), so this ships with
    tests instead of a DuckDB oracle; it is deterministic (zlib level
    6 is bit-stable across platforms for a given input). Empty text →
    NULL. Rounded to 6 dp."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            if not t:
                out.append(None)
                continue
            raw = t.encode("utf-8")
            out.append(round(len(zlib.compress(raw, 6)) / len(raw), 6))
        return pd.Series(out, dtype="float64")

    return _ratio


def compression_keep(
    ratio: Column, lo: float = 0.25, hi: float = 0.95
) -> Column:
    """The two-sided compression gate: below ``lo`` = machine-repeated
    boilerplate, above ``hi`` = high-entropy noise (base64 blobs,
    minified code); prose sits between."""
    return ratio.between(lo, hi)


def gopher_keep(
    stats: dict[str, Column],
    min_words: int = 50,
    word_len: tuple[float, float] = (3.0, 10.0),
    min_alpha: float = 0.8,
    max_symbol: float = 0.1,
) -> Column:
    """The Gopher repetition/shape gate as one boolean expression over
    gopher_stats() — published-rule thresholds as defaults."""
    return (
        (stats["n_words"] >= min_words)
        & stats["mean_word_len"].between(*word_len)
        & (stats["frac_alpha"] >= min_alpha)
        & (stats["symbol_ratio"] <= max_symbol)
    )


# ---------------------------------------------------------------------------
# C4 line/page cleaning (Raffel et al. 2020, the published C4 recipe)
# ---------------------------------------------------------------------------

# a line survives C4 when it ends in terminal punctuation, carries at
# least `min_words` whitespace words, and does not mention javascript
C4_TERMINAL_RE = r'[.!?"]$'


def c4_line_keep(line: Column, min_words: int = 5) -> Column:
    """The published C4 per-line rule as one boolean expression:
    terminal punctuation, ≥ min_words words, no 'javascript'."""
    t = F.trim(line)
    # word count via regexp, not a nested filter() lambda — a HOF
    # inside another HOF's lambda drops the outer filter out of
    # codegen into the interpreted path
    n_words = F.size(F.regexp_extract_all(t, F.lit(r"(\S+)"), 1))
    return (
        t.rlike(C4_TERMINAL_RE)
        & (n_words >= min_words)
        & ~F.lower(t).contains("javascript")
    )


def c4_clean(col: Column | str, min_words: int = 5) -> dict[str, Column]:
    """C4 cleaning over a multi-line document, pure codegen'd
    expressions (no shuffle, no UDF — the line filter runs inside the
    scan projection):

      text     -- surviving lines rejoined in order
      n_lines  -- lines before the cut
      n_kept   -- lines after the cut

    Compose with c4_page_keep() for the page-level verdict."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, "\n")
    kept = F.filter(lines, lambda x: c4_line_keep(x, min_words=min_words))
    return {
        "text": F.concat_ws("\n", kept),
        "n_lines": F.size(lines),
        "n_kept": F.size(kept),
    }


def c4_page_keep(raw: Column | str, cleaned: Column, min_sentences: int = 3) -> Column:
    """The C4 page gate: drop pages mentioning 'lorem ipsum' or
    containing a curly brace (code), or whose cleaned text has fewer
    than `min_sentences` sentence-terminal marks."""
    r = F.col(raw) if isinstance(raw, str) else raw
    n_sent = F.size(F.regexp_extract_all(cleaned, F.lit(r"([.!?])"), 1))
    return (
        ~F.lower(r).contains("lorem ipsum")
        & ~r.contains("{")
        & (n_sent >= min_sentences)
    )


# ---------------------------------------------------------------------------
# n-gram LM perplexity scoring (the CCNet quality signal)
# ---------------------------------------------------------------------------


def lm_bigram_counts(train: DataFrame, text_col: str = "text"):
    """Train an add-α-smoothable bigram LM distributively: returns
    (unigrams, bigrams, vocab_size) where unigrams = (w1, c1) over
    every normalized word, bigrams = (bg, c2) over 'w1 w2' joined
    windows (documents shorter than 2 words contribute unigrams only).
    Both tables are ONE partial-agged shuffle each over high-
    cardinality string keys; vocab_size is an O(1) driver scalar."""
    w = train.select(norm_words(text_col).alias("w"))
    unigrams = (
        w.select(F.explode("w").alias("w1")).groupBy("w1").agg(F.count("*").alias("c1"))
    )
    bigrams = (
        w.filter(F.size("w") >= 2)
        .select(F.explode(shingles_of_words(F.col("w"), 2)).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").alias("c2"))
    )
    # vocab_size is an eager action; persist so the scoring join reuses
    # the aggregated (vocab-sized) table instead of re-scanning the
    # training corpus a second time
    unigrams = unigrams.persist()
    return unigrams, bigrams, unigrams.count()


def lm_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train: DataFrame | None = None,
    alpha: float = 1.0,
) -> DataFrame:
    """CCNet-style LM quality signal: score every document by the
    perplexity of its word stream under an add-α-smoothed bigram LM
    trained (distributively, `lm_bigram_counts`) on `train` —
    defaulting to the corpus itself. Boilerplate-ish, repetitive text
    scores low perplexity; lexical soup scores high; CCNet buckets the
    corpus into head/middle/tail on exactly this number.

        p(w_i | w_{i-1}) = (c2(w_{i-1} w_i) + α) / (c1(w_{i-1}) + α·V)

    Returns (doc_id, n_trans, sum_logp, ppl) with ppl =
    exp(-sum_logp / n_trans); documents with fewer than 2 normalized
    words get n_trans = 0 and NULL-free sentinel ppl = 0.0.

    Determinism across engines/parallelism: the per-document log-prob
    fold runs POSITION-ORDERED (array_sort over collected (pos, logp)
    structs, then a sequential F.aggregate), so the floating sum is
    bit-stable — the DuckDB oracle reproduces it with an ORDER BY pos
    list aggregate, no tolerance needed.

    Scale shape: transitions = one row per corpus token; two equi-
    joins against the count tables (vocab-sized — far smaller than the
    corpus, AQE broadcasts when they fit); one doc-partitioned shuffle
    folds per-doc scores. Per-doc state is bounded by document length.
    """
    if train is None:
        train = df
    unigrams, bigrams, vocab = lm_bigram_counts(train, text_col)
    docs = df.select(F.col(id_col).alias("id"), norm_words(text_col).alias("w"))
    trans = docs.filter(F.size("w") >= 2).select(
        "id",
        F.posexplode(shingles_of_words(F.col("w"), 2)).alias("pos", "bg"),
    ).withColumn("w1", F.split("bg", " ").getItem(0))
    a = float(alpha)
    j = trans.join(bigrams, "bg", "left").join(unigrams, "w1", "left")
    logp = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(a))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(a * vocab))
    )
    scored = j.groupBy("id").agg(
        F.count("*").alias("n_trans"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", logp.alias("lp")))),
            F.lit(0.0),
            lambda acc, x: acc + x["lp"],
        ).alias("sum_lp"),
    )
    base = df.select(F.col(id_col).alias("id"))
    return base.join(scored, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_trans", F.lit(0)).cast("long").alias("n_trans"),
        F.round(F.coalesce("sum_lp", F.lit(0.0)), 6).alias("sum_logp"),
        F.round(
            F.when(
                F.col("n_trans") > 0,
                F.exp(-F.col("sum_lp") / F.col("n_trans")),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("ppl"),
    )


def lm_kn_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train: DataFrame | None = None,
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram perplexity — the KenLM-family
    smoothing CCNet actually ships (5-gram there, bigram here; same
    estimator shape), alongside the add-α `lm_perplexity` twin:

        p(w2|w1) = max(c(w1 w2) − D, 0)/c(w1 •)
                   + (D · N1+(w1 •)/c(w1 •)) · p_cont(w2)
        p_cont(w2) = (N1+(• w2) + 1) / (T + V)     [add-1 so OOV > 0]
        unseen context w1 → p(w2|w1) = p_cont(w2)

    where c(w1 •) sums bigram counts for the context (NOT the raw
    unigram count — the last token of a document is no context),
    N1+(w1 •)/N1+(• w2) are distinct-continuation/-predecessor type
    counts, T the number of distinct bigram types, V the unigram
    vocabulary. Continuation probability ranks words by how many
    contexts they follow, not how often — the KN insight that demotes
    burst-frequency words like "Francisco".

    Returns (id, n_trans, sum_logp, ppl) like `lm_perplexity`, with
    the same position-ordered per-document float fold (bit-stable
    across engines and parallelism).

    Scale shape: one transitions row per corpus token; every join is
    against a VOCAB-sized aggregate of the bigram-type table (context
    stats on w1, continuation stats on w2, c2 on the bigram itself) —
    AQE broadcasts them when they fit; T and V are O(1) driver
    scalars. No collect beyond those two counts.
    """
    if train is None:
        train = df
    d = float(discount)
    tw = train.select(norm_words(text_col).alias("w"))
    vocab = tw.select(F.explode("w").alias("u")).agg(
        F.countDistinct("u").alias("v")
    ).first()["v"]
    bigrams = (
        tw.filter(F.size("w") >= 2)
        .select(F.explode(shingles_of_words(F.col("w"), 2)).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").alias("c2"))
        .withColumn("w1", F.split("bg", " ").getItem(0))
        .withColumn("w2", F.split("bg", " ").getItem(1))
        .persist()
    )
    n_types = bigrams.count()  # T — also materializes the persist
    ctx = bigrams.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.count("*").alias("n1f")
    )
    cont = bigrams.groupBy("w2").agg(F.count("*").alias("n1b"))
    denom = float(n_types + vocab)

    docs = df.select(F.col(id_col).alias("id"), norm_words(text_col).alias("w"))
    trans = docs.filter(F.size("w") >= 2).select(
        "id",
        F.posexplode(shingles_of_words(F.col("w"), 2)).alias("pos", "bg"),
    ).withColumn("w1", F.split("bg", " ").getItem(0)).withColumn(
        "w2", F.split("bg", " ").getItem(1)
    )
    j = (
        trans.join(bigrams.select("bg", "c2"), "bg", "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
    )
    pc = (F.coalesce(F.col("n1b"), F.lit(0)) + F.lit(1.0)) / F.lit(denom)
    seen = (
        F.greatest(F.coalesce(F.col("c2"), F.lit(0)) - F.lit(d), F.lit(0.0))
        / F.col("c1")
        + (F.lit(d) * F.col("n1f")) / F.col("c1") * pc
    )
    logp = F.log(F.when(F.col("c1").isNotNull(), seen).otherwise(pc))
    scored = j.groupBy("id").agg(
        F.count("*").alias("n_trans"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", logp.alias("lp")))),
            F.lit(0.0),
            lambda acc, x: acc + x["lp"],
        ).alias("sum_lp"),
    )
    base = df.select(F.col(id_col).alias("id"))
    return base.join(scored, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_trans", F.lit(0)).cast("long").alias("n_trans"),
        F.round(F.coalesce("sum_lp", F.lit(0.0)), 6).alias("sum_logp"),
        F.round(
            F.when(
                F.col("n_trans") > 0,
                F.exp(-F.col("sum_lp") / F.col("n_trans")),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("ppl"),
    )


def lm_kn3_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train: DataFrame | None = None,
    discount: float = 0.75,
) -> DataFrame:
    """Trigram interpolated Kneser-Ney — the full Chen & Goodman
    recursion KenLM implements (CCNet runs the 5-gram variant; the
    estimator shape is identical at every order):

      p(w3|w1w2) = max(c(w1w2w3)−D, 0)/c(w1w2•)
                   + (D·N1+(w1w2•)/c(w1w2•)) · p(w3|w2)
      p(w3|w2)   = max(N1+(•w2w3)−D, 0)/N1+(•w2•)
                   + (D·N1+(w2•)ᶜ/N1+(•w2•)) · p_cont(w3)
      p_cont(w3) = (N1+(•w3) + 1)/(T₂ + V)

    Middle-order counts are CONTINUATION counts (distinct preceding
    words), not raw frequencies — the KN correction applied at every
    backoff level. Unseen trigram context → back off to the bigram
    estimate; unseen bigram context → to p_cont; add-1 continuation
    keeps OOV finite. Documents with < 3 normalized words get the
    0-sentinel row (n_trans counts TRIGRAM transitions, len−2).

    Scale shape: one trigram-transitions pass (one row per corpus
    token); every join is a vocab-/type-table-sized aggregate of the
    trigram- or bigram-TYPE tables (c3 on the trigram, context stats
    on (w1,w2), continuation stats on (w2,w3) / w2 / w3); T₂ and V
    are O(1) driver scalars; same position-ordered bit-stable
    per-document float fold as the bigram estimators.
    """
    if train is None:
        train = df
    d = float(discount)
    tw = train.select(norm_words(text_col).alias("w"))
    vocab = tw.select(F.explode("w").alias("u")).agg(
        F.countDistinct("u").alias("v")
    ).first()["v"]
    tb2 = (
        tw.filter(F.size("w") >= 2)
        .select(F.explode(shingles_of_words(F.col("w"), 2)).alias("bg"))
        .groupBy("bg").agg(F.count("*").alias("c2"))
        .withColumn("w3", F.split("bg", " ").getItem(1))
    )
    tb2 = tb2.persist()
    t2 = tb2.count()
    cont = tb2.groupBy("w3").agg(F.count("*").alias("n1b"))
    tb3 = (
        tw.filter(F.size("w") >= 3)
        .select(F.explode(shingles_of_words(F.col("w"), 3)).alias("tg"))
        .groupBy("tg").agg(F.count("*").alias("c3"))
        .withColumn("_p", F.split("tg", " "))
        .select(
            "tg", "c3",
            F.concat_ws(" ", F.col("_p")[0], F.col("_p")[1]).alias("w12"),
            F.concat_ws(" ", F.col("_p")[1], F.col("_p")[2]).alias("w23"),
            F.col("_p")[1].alias("w2"),
        )
        .persist()
    )
    tb3.count()
    ctx3 = tb3.groupBy("w12").agg(
        F.sum("c3").alias("c12"), F.count("*").alias("n1f12")
    )
    # continuation-count chain: N1+(•w2w3) per bigram, then per-w2
    # k_mid = N1+(w2•)ᶜ (distinct continuations) and s_mid =
    # N1+(•w2•) = Σ_w3 N1+(•w2w3) — both from ONE rollup of cb
    cb = tb3.groupBy("w23").agg(
        F.count("*").alias("n_mid"), F.first("w2").alias("w2")
    ).persist()
    ctx2 = cb.groupBy("w2").agg(
        F.count("*").alias("k_mid"), F.sum("n_mid").alias("s_mid")
    )
    denom = float(t2 + vocab)

    docs = df.select(F.col(id_col).alias("id"), norm_words(text_col).alias("w"))
    trans = docs.filter(F.size("w") >= 3).select(
        "id",
        F.posexplode(shingles_of_words(F.col("w"), 3)).alias("pos", "tg"),
    ).withColumn("_p", F.split("tg", " ")).select(
        "id", "pos", "tg",
        F.concat_ws(" ", F.col("_p")[0], F.col("_p")[1]).alias("w12"),
        F.concat_ws(" ", F.col("_p")[1], F.col("_p")[2]).alias("w23"),
        F.col("_p")[1].alias("w2"),
        F.col("_p")[2].alias("w3"),
    )
    j = (
        trans.join(tb3.select("tg", "c3"), "tg", "left")
        .join(ctx3, "w12", "left")
        .join(cb.select("w23", "n_mid"), "w23", "left")
        .join(ctx2, "w2", "left")
        .join(cont, "w3", "left")
    )
    pc = (F.coalesce(F.col("n1b"), F.lit(0)) + F.lit(1.0)) / F.lit(denom)
    p2_seen = (
        F.greatest(
            F.coalesce(F.col("n_mid"), F.lit(0)) - F.lit(d), F.lit(0.0)
        )
        / F.col("s_mid")
        + (F.lit(d) * F.col("k_mid")) / F.col("s_mid") * pc
    )
    p2 = F.when(F.col("s_mid").isNotNull(), p2_seen).otherwise(pc)
    p3_seen = (
        F.greatest(
            F.coalesce(F.col("c3"), F.lit(0)) - F.lit(d), F.lit(0.0)
        )
        / F.col("c12")
        + (F.lit(d) * F.col("n1f12")) / F.col("c12") * p2
    )
    logp = F.log(F.when(F.col("c12").isNotNull(), p3_seen).otherwise(p2))
    scored = j.groupBy("id").agg(
        F.count("*").alias("n_trans"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", logp.alias("lp")))),
            F.lit(0.0),
            lambda acc, x: acc + x["lp"],
        ).alias("sum_lp"),
    )
    base = df.select(F.col(id_col).alias("id"))
    return base.join(scored, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_trans", F.lit(0)).cast("long").alias("n_trans"),
        F.round(F.coalesce("sum_lp", F.lit(0.0)), 6).alias("sum_logp"),
        F.round(
            F.when(
                F.col("n_trans") > 0,
                F.exp(-F.col("sum_lp") / F.col("n_trans")),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("ppl"),
    )


def lm_moore_lewis(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_train: DataFrame | None = None,
    discount: float = 0.75,
) -> DataFrame:
    """Moore-Lewis cross-entropy-difference data selection (Moore &
    Lewis 2010; the ancestor of DSIR): score every document by

        ml_score = H_in(d) − H_out(d)

    where H_in is the per-transition cross-entropy (nats) under a
    Kneser-Ney bigram LM trained on the IN-DOMAIN ``target`` slice
    and H_out under one trained on ``out_train`` (default: the corpus
    itself). Lower = more in-domain-like relative to its general
    likelihood — thresholding ml_score selects target-like training
    data without the frequency bias of scoring H_in alone (a doc of
    globally common words is cheap under BOTH models and cancels).

    Returns (id, n_trans, ce_in, ce_out, ml_score), all rounded to
    6 dp; documents with no transitions get the 0.0 sentinel triple.

    Scale shape: exactly two :func:`lm_kn_perplexity` pipelines (one
    corpus-token transitions pass each, vocab-sized joins) plus ONE
    doc_id equi-join of their two #docs-row outputs. Out-of-domain
    contexts exercise the KN backoff branch — continuation mass keeps
    every probability finite, so no OOV clamping is needed.
    """
    inn = lm_kn_perplexity(
        df, id_col, text_col, train=target, discount=discount
    ).select(
        F.col(id_col), F.col("n_trans"), F.col("sum_logp").alias("_lp_in")
    )
    out = lm_kn_perplexity(
        df, id_col, text_col,
        train=out_train if out_train is not None else df,
        discount=discount,
    ).select(F.col(id_col), F.col("sum_logp").alias("_lp_out"))
    j = inn.join(out, id_col)
    ce_in = -F.col("_lp_in") / F.col("n_trans")
    ce_out = -F.col("_lp_out") / F.col("n_trans")
    has = F.col("n_trans") > 0
    return j.select(
        F.col(id_col),
        F.col("n_trans"),
        F.round(F.when(has, ce_in).otherwise(0.0), 6).alias("ce_in"),
        F.round(F.when(has, ce_out).otherwise(0.0), 6).alias("ce_out"),
        F.round(F.when(has, ce_in - ce_out).otherwise(0.0), 6).alias(
            "ml_score"
        ),
    )


def lm_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str = "lang",
    train: DataFrame | None = None,
    alpha: float = 1.0,
) -> DataFrame:
    """CCNet's head/middle/tail split: rank every document by LM
    perplexity WITHIN its `by` group (language, in CCNet) and cut the
    group into equal thirds — head = most-fluent third (lowest ppl).
    Returns (doc_id, <by>, ppl, bucket). The rank orders by
    (ppl, doc_id) so ties are deterministic; ntile(3) follows the
    standard larger-buckets-first rule in every engine.

    Scale note: exact ntile hash-partitions by group, so ONE TASK
    sorts each language — exact and oracle-checkable, but not the
    10^10-docs-per-language plan. At that scale use
    `lm_buckets_approx`: same split via per-group quantile THRESHOLDS
    (one agg + a broadcast join, no per-group sort)."""
    from pyspark.sql.window import Window

    ppl = lm_perplexity(df, id_col, text_col, train, alpha)
    w = Window.partitionBy(by).orderBy("ppl", id_col)
    nt = F.ntile(3).over(w)
    return (
        df.select(F.col(id_col), F.col(by))
        .join(ppl.select(id_col, "ppl"), id_col)
        .select(
            F.col(id_col),
            F.col(by),
            "ppl",
            F.when(nt == 1, "head")
            .when(nt == 2, "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    )


def lm_buckets_approx(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str = "lang",
    train: DataFrame | None = None,
    alpha: float = 1.0,
    accuracy: int = 10000,
) -> DataFrame:
    """The 100 TB form of `lm_buckets`: per-group head/middle/tail by
    ppl THRESHOLDS (approx tertile cutpoints) instead of an exact
    rank. One groupBy computes both cutpoints per group
    (percentile_approx, error ≤ 1/accuracy of the group), the
    (group, t1, t2) table is broadcast back, and bucketing is a pure
    comparison in the scan — no per-group sort anywhere, so a
    language with 10^10 documents costs the same plan as one with
    10^3. Bucket sizes are equal to within the sketch error; the
    exact form remains the oracle-checkable twin."""
    ppl = lm_perplexity(df, id_col, text_col, train, alpha)
    # the scored table feeds BOTH the threshold agg and the final
    # bucket join; persist it (O(docs) thin rows) so the whole LM
    # train+score pipeline runs once, not twice
    joined = df.select(F.col(id_col), F.col(by)).join(
        ppl.select(id_col, "ppl"), id_col
    ).persist()
    th = joined.groupBy(by).agg(
        F.percentile_approx("ppl", [1.0 / 3.0, 2.0 / 3.0], accuracy).alias("_th")
    )
    return joined.join(F.broadcast(th), by).select(
        F.col(id_col),
        F.col(by),
        "ppl",
        F.when(F.col("ppl") <= F.col("_th")[0], "head")
        .when(F.col("ppl") <= F.col("_th")[1], "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction
# ---------------------------------------------------------------------------


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing (Schleimer, Wilkerson, Aiken 2003, SIGMOD): the
    guarantee-bearing local fingerprint — from the k-shingle hash
    stream, every window of ``window`` consecutive hashes selects its
    MINIMUM (rightmost occurrence on ties), and the distinct selected
    (position, hash) pairs are the document's fingerprints. Any shared
    substring of ≥ window+k-1 words between two documents is guaranteed
    to share a fingerprint — the property `fingerprint` (single global
    min) cannot give.

    Documents shorter than one window keep their single minimum. Pure
    codegen'd higher-order functions over md5 strings: per-doc work,
    no shuffle until the final distinct, engine-reproducible
    bit-for-bit. Returns exploded (doc_id, pos, hash) rows — join two
    documents' outputs on hash to locate shared passages."""
    h0 = F.transform(shingles(text_col, k), F.md5)

    def select_fps(hh):
        n = F.size(hh)
        we = F.least(F.lit(window), n)
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), n - we),
                lambda i: F.transform(
                    F.array(F.array_min(F.slice(hh, i + 1, we))),
                    lambda m: F.struct(
                        F.array_max(
                            F.filter(
                                F.sequence(i, i + we - 1),
                                lambda j: F.element_at(hh, j + 1) == m,
                            )
                        ).alias("pos"),
                        m.alias("hash"),
                    ),
                ).getItem(0),
            )
        )

    fps = F.transform(F.array(h0), select_fps).getItem(0)  # bind h once
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(fps).alias("fp"))
        .select("doc_id", F.col("fp.pos").alias("pos"), F.col("fp.hash").alias("hash"))
    )


def winnow_pairs(
    docs: DataFrame,
    min_shared: int = 2,
    k: int = 5,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowing fingerprints —
    plagiarism/shared-passage detection with the winnowing guarantee
    (every common run of ≥ window+k-1 words contributes at least one
    shared hash). The join is an inverted-index equi-join on the hash
    (id_a < id_b), never doc×doc; hot hashes (boilerplate shared by
    thousands of docs) are the skew risk — cut them with a df filter
    upstream if needed. Returns (id_a, id_b, n_shared)."""
    fp = winnow_fingerprints(docs, k, window, id_col, text_col).select(
        "doc_id", "hash"
    ).distinct()
    a = fp.select(F.col("doc_id").alias("id_a"), "hash")
    b = fp.select(F.col("doc_id").alias("id_b"), "hash")
    return (
        a.join(b, "hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def tfidf_keywords(
    docs: DataFrame,
    top_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 3,
) -> DataFrame:
    """Top-``top_k`` keywords per document by TF-IDF — the corpus-side
    analogue of the reference's per-page ``keywords`` field
    (internal/domain/article.go:12-62 keywords; meta-tag extraction
    E7): tf = in-doc term count, idf = ln(N / df) over documents
    containing the term, stopwords and terms shorter than ``min_len``
    dropped. Scores round to 6 dp, rank ties break on the term, so
    output is engine- and parallelism-deterministic.

    Scale shape: one explode → (doc, term) count shuffle; the df table
    aggregates map-side to vocabulary size and joins back on term
    (high-cardinality balanced key); top-k is a per-doc window over
    each doc's own terms. Returns (doc_id, term, tfidf, rank)."""
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(norm_words(text_col)).alias("term"),
    ).filter(
        (F.length("term") >= min_len) & ~F.col("term").isin(sorted(STOPWORDS))
    )
    tf = words.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    n_docs = docs.select(F.countDistinct(id_col).alias("n")).collect()[0]["n"]
    df_t = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(df_t, "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias(
            "tfidf"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("doc_id", "term", "tfidf", "rank")
    )


def lm_para_prune(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train: DataFrame | None = None,
    alpha: float = 1.0,
    max_ppl: float = 10000.0,
) -> DataFrame:
    """Paragraph-granularity perplexity surgery: instead of dropping a
    whole document whose LM score is poor (`lm_perplexity` +
    `lm_buckets`, the CCNet document decision), score each PARAGRAPH
    (newline-delimited, the WET-extract convention CCNet itself works
    in) under the same add-α bigram LM and remove only the paragraphs
    above `max_ppl` — navigation soup and template debris die, the
    prose around them survives. The LM trains on `train` (default:
    the full `df` text stream, word stream uninterrupted by paragraph
    boundaries); each paragraph is scored independently.

    Keep rule: a paragraph survives iff n_trans == 0 (too short to
    score — never punished) or its 6-dp-rounded ppl ≤ `max_ppl`.
    Returns one row per INPUT document — (doc_id, n_paras, n_kept,
    text) with `text` the kept paragraphs re-joined by '\\n' IN
    ORIGINAL ORDER (empty string if everything died);
    blank/whitespace-only paragraphs are not paragraphs (line_dedup's
    convention) and are dropped before counting, and a doc with no
    non-blank paragraphs at all still folds to (0, 0, ''). Per-paragraph log-probs fold position-ordered (the
    lm_perplexity bit-stability contract), so output text is
    byte-identical at any parallelism.

    Scale shape (10^10 docs): paragraphs explode to (doc, pidx) rows
    — one row per corpus paragraph; transitions one row per token,
    joined against the two vocab-sized count tables (AQE broadcasts
    them when they fit); ONE (doc, pidx)-keyed fold scores
    paragraphs, ONE doc-keyed fold reassembles text. Per-task state
    is bounded by a single document's length, exactly like
    line_dedup's reassembly.
    """
    if train is None:
        train = df
    unigrams, bigrams, vocab = lm_bigram_counts(train, text_col)
    paras = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pidx", "para"),
    ).filter(F.trim("para") != "")
    trans = (
        paras.select("id", "pidx", norm_words("para").alias("w"))
        .filter(F.size("w") >= 2)
        .select(
            "id",
            "pidx",
            F.posexplode(shingles_of_words(F.col("w"), 2)).alias("pos", "bg"),
        )
        .withColumn("w1", F.split("bg", " ").getItem(0))
    )
    a = float(alpha)
    j = trans.join(bigrams, "bg", "left").join(unigrams, "w1", "left")
    logp = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(a))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(a * vocab))
    )
    scored = j.groupBy("id", "pidx").agg(
        F.count("*").alias("n_trans"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", logp.alias("lp")))),
            F.lit(0.0),
            lambda acc, x: acc + x["lp"],
        ).alias("sum_lp"),
    )
    ppl = F.round(F.exp(-F.col("sum_lp") / F.col("n_trans")), 6)
    flagged = paras.join(scored, ["id", "pidx"], "left").withColumn(
        "_keep",
        F.col("n_trans").isNull() | (ppl <= F.lit(float(max_ppl))),
    )
    folded = flagged.groupBy("id").agg(
        F.count("*").cast("long").alias("n_paras"),
        F.sum(F.when(F.col("_keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "pidx",
                                F.col("para").alias("para"),
                                F.col("_keep").alias("keep"),
                            )
                        )
                    ),
                    lambda x: x["keep"],
                ),
                lambda x: x["para"],
            ),
            "\n",
        ).alias("text"),
    )
    # every input doc gets an output row — a doc with no non-blank
    # paragraphs folds to (0, 0, ''), the line_dedup cardinality rule
    base = df.select(F.col(id_col).alias("id"))
    return base.join(folded, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_paras", F.lit(0)).cast("long").alias("n_paras"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("text", F.lit("")).alias("text"),
    )


__all__ = [
    "tokens", "token_count", "bpeish_count", "BPE_ISH_PATTERN",
    "STOPWORDS", "stopword_hits", "punct_count", "quality_score",
    "LANG_MARKERS", "LANG_ORDER", "lang_hits", "predict_lang",
    "norm_words", "shingles", "fingerprint",
    "PII_PATTERNS", "pii_counts", "redact_pii",
    "gopher_stats", "gopher_keep", "repetition_stats",
    "compression_ratio_udf", "compression_keep",
    "c4_line_keep", "c4_clean", "c4_page_keep",
    "lm_bigram_counts", "lm_perplexity", "lm_para_prune",
    "lm_buckets", "lm_buckets_approx",
    "tfidf_keywords", "winnow_fingerprints", "winnow_pairs",
    "char_entropy",
]


# ---------------------------------------------------------------------------
# Readability (Flesch) and encoding-damage (mojibake) scoring — web-corpus
# quality gates alongside quality_score/gopher_stats. The reference's
# validation layer gates on length/word-count only (validator.go:365-402);
# these extend it with the standard curation-pipeline signals.
# ---------------------------------------------------------------------------


def readability_stats(col: Column | str) -> dict[str, Column]:
    """Flesch reading ease + Flesch-Kincaid grade level with a
    deterministic vowel-group syllable heuristic: syllables(word) =
    max(1, #runs of [aeiouy] in the lowercased word). Sentences =
    max(1, #runs of [.!?]); words = whitespace tokens (strings.Fields
    semantics, same splitter as word_count_v6).

    All-codegen expressions over one scan — a projection at 10^10 docs,
    no shuffle, no UDF. Float op order is fixed (two subtractions left
    to right) so results are bit-equal across engines and parallelism.
    """
    c = F.col(col) if isinstance(col, str) else col
    w = tokens(c)
    n_words = F.greatest(F.lit(1), F.size(w)).cast("long")
    n_sents = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all(c, F.lit(r"([.!?]+)"), 1))
    ).cast("long")
    n_syll = F.aggregate(
        F.transform(
            w,
            lambda x: F.greatest(
                F.lit(1),
                F.size(F.regexp_extract_all(F.lower(x), F.lit("([aeiouy]+)"), 1)),
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    wps = n_words.cast("double") / n_sents.cast("double")
    spw = n_syll.cast("double") / n_words.cast("double")
    return {
        "n_words": n_words,
        "n_sentences": n_sents,
        "n_syllables": n_syll,
        "flesch": F.round(
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 6
        ),
        "fk_grade": F.round(
            F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 6
        ),
    }


# single codepoints that are near-certain UTF-8-as-latin1/cp1252 damage
# in web text: the lead bytes of double-encoded sequences (Ã, Â, â€…)
# and the replacement character
MOJIBAKE_CHAR_RE = "([ÃÂ€�])"
CTRL_CHAR_RE = "([\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f])"


def mojibake_stats(
    col: Column | str, ppm_threshold: int = 500
) -> dict[str, Column]:
    """Encoding-damage signals: counts of mojibake marker codepoints
    (UTF-8 read as latin-1/cp1252 leaves Ã/Â/€ lead bytes; decoder
    failures leave U+FFFD) and of stray C0 control characters, plus an
    integer parts-per-million rate and a keep/flag gate. Integer DIV
    ppm so the gate is bit-equal across engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.greatest(F.lit(1), F.length(c)).cast("long")
    n_marks = F.size(F.regexp_extract_all(c, F.lit(MOJIBAKE_CHAR_RE), 1)).cast("long")
    n_ctrl = F.size(F.regexp_extract_all(c, F.lit(CTRL_CHAR_RE), 1)).cast("long")
    # exact long floor-division (num - num % den is exactly divisible, so
    # the double divide is exact below 2^53): ≡ DuckDB `//` on BIGINTs
    num = (n_marks + n_ctrl) * F.lit(1000000).cast("long")
    ppm = ((num - num % n_chars) / n_chars).cast("long")
    return {
        "n_chars": n_chars,
        "n_mojibake": n_marks,
        "n_ctrl": n_ctrl,
        "mojibake_ppm": ppm,
        "is_clean": ppm <= F.lit(ppm_threshold),
    }


# ---------------------------------------------------------------------------
# Unicode-script profile — multilingual routing / mixed-script spam gate
# ---------------------------------------------------------------------------

SCRIPTS = (
    "Latin", "Cyrillic", "Greek", "Arabic", "Hebrew",
    "Han", "Hiragana", "Katakana", "Hangul", "Devanagari",
)


def script_counts(col: Column | str) -> dict[str, Column]:
    """Per-Unicode-script codepoint counts (one LONG per script in
    :data:`SCRIPTS`): length of the text with everything outside the
    script stripped. Java's ``\\p{IsX}`` and RE2's ``\\p{X}`` agree on
    script classes (checked codepoint-for-codepoint in the oracle), so
    the counts are engine-exact. All codegen'd regexp expressions —
    one scan, no shuffle."""
    t = F.col(col) if isinstance(col, str) else col
    return {
        s.lower(): F.length(
            F.regexp_replace(t, f"[^\\p{{Is{s}}}]", "")
        ).cast("long")
        for s in SCRIPTS
    }


def script_profile(col: Column | str) -> dict[str, Column]:
    """:func:`script_counts` plus the routing decision: ``dominant``
    (the max-count script, name-ascending tie-break, 'none' when no
    scripted codepoint occurs) and ``dominant_bp`` (the dominant's
    share of all scripted codepoints in exact integer basis points) —
    the signals multilingual pipelines branch on: per-script tokenizer
    routing, and mixed-script spam (keyword-stuffed pages interleaving
    scripts score a low dominant_bp however plausible each slice
    looks). Integer DIV, so every column is engine-exact."""
    counts = script_counts(col)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    ranked = F.array_sort(
        F.array(
            *[
                F.struct((-c).alias("_n"), F.lit(s).alias("_s"))
                for s, c in counts.items()
            ]
        )
    )
    top = F.element_at(ranked, 1)
    out = dict(counts)
    out["dominant"] = F.when(total == 0, F.lit("none")).otherwise(top["_s"])
    # exact integer DIV on composed columns: a DIV b ≡ (a − a mod b)/b
    # — the float division of an exact multiple is exact, so this
    # matches DuckDB's // bit-for-bit (all values ≪ 2^53)
    a = (-top["_n"]) * F.lit(10000).cast("long")
    out["dominant_bp"] = F.when(total == 0, F.lit(0).cast("long")).otherwise(
        ((a - F.pmod(a, total)) / total).cast("long")
    )
    return out


def collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` bigram collocations by pointwise mutual information —
    the corpus-analysis workhorse (multi-word entities, template
    phrases, boilerplate n-grams worth a stoplist):

        pmi(x, y) = ln( c₂(x,y)·N₁² / (N₂·c₁(x)·c₁(y)) )

    over normalized words, with a ``min_count`` support floor (raw PMI
    promotes hapax pairs; the floor is the standard fix). Output
    (w1, w2, c2, pmi) ordered (pmi DESC, w1, w2), limit k.

    Engine-exact: both products are exact DECIMAL(38,0)/HUGEINT LONGs
    (c₂·N₁² ≤ 10³⁶ at a 10¹²-token corpus), then ONE double division
    and one ln, rounded to 6. Scale shape: two partial-agged shuffles
    (unigrams, bigrams), two broadcast joins of the vocab-sized count
    tables onto the bigram table, 1-row total frames cross-joined —
    the corpus is scanned once."""
    w = docs.select(norm_words(text_col).alias("w"))
    uni = (
        w.select(F.explode("w").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").cast("long").alias("c1"))
    )
    bi = (
        w.filter(F.size("w") >= 2)
        .select(F.explode(shingles_of_words(F.col("w"), 2)).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").cast("long").alias("c2"))
        .select(
            F.split("bg", " ").getItem(0).alias("w1"),
            F.split("bg", " ").getItem(1).alias("w2"),
            "c2",
        )
    )
    n1 = uni.agg(F.sum("c1").alias("n1"))
    n2 = bi.agg(F.sum("c2").alias("n2"))
    dec = "decimal(38,0)"
    num = (
        F.col("c2").cast(dec) * F.col("n1").cast(dec) * F.col("n1").cast(dec)
    )
    den = (
        F.col("n2").cast(dec) * F.col("cx").cast(dec) * F.col("cy").cast(dec)
    )
    return (
        bi.filter(F.col("c2") >= min_count)
        .join(F.broadcast(uni.select(F.col("w1"), F.col("c1").alias("cx"))), "w1")
        .join(
            F.broadcast(
                uni.select(F.col("w1").alias("w2"), F.col("c1").alias("cy"))
            ),
            "w2",
        )
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "w1", "w2", "c2",
            F.round(
                F.log(num.cast("double") / den.cast("double")), 6
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )


def char_entropy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document Shannon character entropy in bits — the pure-SQL
    twin of the zlib `compression_ratio_udf` gate (RefinedWeb /
    MassiveText filter family): near-zero entropy flags single-char /
    repeated-pattern spam, abnormally high entropy flags binary junk
    or encrypted blobs that survived content-type sniffing. Unlike the
    zlib gate this version is oracle-checkable and never leaves
    codegen.

    Returns (id, n_chars, n_distinct_chars, entropy_bits) with

      H = log2(n) − (Σ_c cnt_c·log2(cnt_c)) / n

    folded over the doc's distinct characters in SORTED order, so the
    float op sequence is identical at any parallelism and across
    engines; rounded to 6 dp. Empty docs get the 0.0 sentinel.

    Scale shape: zero shuffle — the char histogram is a higher-order
    array expression per row (O(distinct_chars × len), distinct chars
    are alphabet-bounded), not an explode+groupBy; the whole operator
    is a projection that pipelines with any surrounding scan.
    """
    chars = F.split(F.col(text_col), "")
    dist = F.array_sort(F.array_distinct(chars))
    n = F.length(F.col(text_col))
    sum_clogc = F.aggregate(
        dist,
        F.lit(0.0),
        lambda acc, ch: acc
        + F.size(F.filter(chars, lambda c: c == ch)).cast("double")
        * F.log2(F.size(F.filter(chars, lambda c: c == ch)).cast("double")),
    )
    h = F.when(
        n > 0,
        F.round(F.log2(n.cast("double")) - sum_clogc / n.cast("double"), 6),
    ).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col).alias("id"),
        n.cast("long").alias("n_chars"),
        F.when(n > 0, F.size(dist)).otherwise(F.lit(0)).cast("long").alias(
            "n_distinct_chars"
        ),
        h.alias("entropy_bits"),
    )
