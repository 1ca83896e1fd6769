"""Structured Streaming façade over the extraction pipeline (§2.10).

The reference is not a streaming system (no watermarks/event-time; its
continuous behaviors are a 1-minute reschedule ticker,
internal/job/scheduler.go:78, and in-process channels) and the north
rule mandates a BATCH-iterative frontier scheduler — so the crawl loop
itself stays batch (rounds.py). What Structured Streaming adds on top
is the ingestion face: corpus files land continuously (the Common-Crawl
WARC-drop pattern) and are extracted incrementally with exactly-once
semantics from the stream checkpoint.

- :func:`stream_extract` — file-source readStream over a corpus
  directory → the same fused extraction UDF → parquet sink with
  checkpointed progress. Restart-safe: already-processed files are
  never re-extracted (checkpoint file log).
- :func:`stream_seeds` — readStream over a seed-list drop directory,
  foreachBatch-appending new URLs into a CrawlRun's frontier seed
  table; each micro-batch is deduped against the frontier the same way
  round candidates are.
- :func:`stream_fetch_metrics` — the A8 metrics rollup as an
  EVENT-TIME windowed aggregation with a WATERMARK: fetch-log events
  (url, host, status, fetched_at) land continuously and possibly out
  of order; per-host per-window fetch/error counts are emitted exactly
  once per finalized window (append mode), late events inside the
  watermark are merged into their window's state, later-than-watermark
  events are dropped — the bounded-state late-data contract.
- :func:`stream_dedup_urls` — the F7 URL-seen filter as a CUSTOM
  STATEFUL operator (``applyInPandasWithState``): candidate URLs
  stream in, first-seen URLs stream out, and the seen set lives in
  sharded group state that survives micro-batches AND restarts (state
  store in the checkpoint). State is keyed by the url_hash prefix
  shard — the same sharding as the batch Bloom filter — so state rows
  stay bounded per key and scale horizontally with shards. Both state
  layouts are implemented (``state_mode``): the exact per-shard hash
  set (assertable semantics baseline) and the 10^10-URL path — a Bloom
  BITSET in the same state slot (binary column, constant bytes per
  shard regardless of URL count, false-positive rate traded per the
  standard sizing curve).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gocrawl_spark import udfs
from gocrawl_spark.schema import PAGES_CORPUS


def stream_extract(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    sel_map: dict | None = None,
    available_now: bool = True,
):
    """Incrementally extract newly-landed corpus parquet files.

    Returns the StreamingQuery; with available_now=True it drains
    whatever is currently unprocessed and stops (the batch-friendly
    trigger), otherwise it runs continuously per micro-batch.
    """
    src = (
        spark.readStream.schema(PAGES_CORPUS)
        .option("maxFilesPerTrigger", 64)
        .parquet(corpus_dir)
    )
    extracted = udfs.extract_pages(src, sel_map=sel_map)
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_seeds(
    spark: SparkSession,
    seeds_dir: str,
    frontier_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Drip-feed seed URLs (text files, one URL per line) into a
    frontier seed table, deduped per micro-batch against what's already
    enqueued. The crawl driver picks the table up as its round-0
    frontier (rounds.init_frontier_df)."""
    from gocrawl_spark.rounds import init_frontier_df

    src = spark.readStream.format("text").load(seeds_dir)

    def absorb(batch_df: DataFrame, batch_id: int) -> None:
        urls = batch_df.select(F.trim("value").alias("url")).filter(F.col("url") != "")
        rows = init_frontier_df(urls)
        if os.path.isdir(frontier_dir) and any(
            f.endswith(".parquet") for f in os.listdir(frontier_dir)
        ):
            existing = batch_df.sparkSession.read.parquet(frontier_dir)
            rows = rows.join(existing.select("url_hash"), "url_hash", "left_anti")
        rows.write.mode("append").parquet(frontier_dir)

    writer = src.writeStream.foreachBatch(absorb).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# fetch-log event schema (what rounds.py's fetch stage would emit
# continuously on a cluster; synthesized in tests)
FETCH_EVENTS = "url string, host string, status int, fetched_at timestamp"


def stream_fetch_metrics(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    available_now: bool = True,
):
    """Per-host fetch metrics over event-time windows with late-data
    handling (A8 as a streaming rollup).

    Fetch-log parquet drops under ``events_dir`` (schema
    :data:`FETCH_EVENTS`) → append-mode parquet of
    ``(window_start, window_end, host, n_fetched, n_errors)``, one row
    per (window, host) emitted exactly once — when the watermark
    (max event time seen minus ``watermark``) passes the window end.
    Events arriving later than the watermark are dropped; events late
    but within it are merged into their window's state. State is
    bounded: windows older than the watermark are evicted, so state
    size is O(hosts x windows-in-flight) regardless of stream length.
    Pure built-in exprs — no Python in the stream. Returns the
    StreamingQuery.
    """
    src = (
        spark.readStream.schema(FETCH_EVENTS)
        .option("maxFilesPerTrigger", 64)
        .parquet(events_dir)
    )
    agg = (
        src.withWatermark("fetched_at", watermark)
        .groupBy(F.window("fetched_at", window).alias("w"), "host")
        .agg(
            F.count("*").alias("n_fetched"),
            # status 0 is the engine's network/timeout encoding
            # (fetch.py) — an all-timeouts host must not read as healthy
            F.count(
                F.when((F.col("status") >= 400) | (F.col("status") == 0), 1)
            ).alias("n_errors"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_fetched",
            "n_errors",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_urls(
    spark: SparkSession,
    urls_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    n_shards: int = 16,
    available_now: bool = True,
    state_mode: str = "bloom",
    m_bits: int = 1 << 20,
):
    """Streaming URL-seen filter (F7 as a stateful streaming operator).

    Text-file drops of candidate URLs → parquet of FIRST-SEEN URLs
    only, deduped across micro-batches and restarts via per-shard
    group state. Returns the StreamingQuery.

    ``state_mode``:

    - ``"bloom"`` (default) — per-shard Bloom BITSET state (binary
      column, ``m_bits`` bits, same k=4/sha256-slice scheme as the
      batch filter in frontier.py) — CONSTANT state size per shard,
      the 10^10-URL path and therefore the default. Trade: a false
      positive suppresses a genuinely new URL (rate follows the
      standard (1-e^{-kn/m})^k curve; size m_bits ≥ ~10 bits per
      expected distinct URL per shard to keep it <1%).
    - ``"exact"`` — per-shard hash set (array<string> state). Grows
      with distinct URLs; the assertable semantics baseline kept as
      the bloom path's test twin. Emission stays at-most-once per URL
      in both modes.
    """
    import pandas as pd

    from gocrawl_spark.frontier import BLOOM_K, _bloom_positions

    if state_mode not in ("exact", "bloom"):
        raise ValueError(f"state_mode must be exact|bloom, got {state_mode!r}")

    def dedup_exact(key, pdfs, state):
        seen = set(state.get[0]) if state.exists else set()
        urls, hashes = [], []
        for pdf in pdfs:
            for url, h in zip(pdf["url"], pdf["url_hash"]):
                if h not in seen:
                    seen.add(h)
                    urls.append(url)
                    hashes.append(h)
        state.update((list(seen),))
        if urls:
            yield pd.DataFrame(
                {"shard": [int(key[0])] * len(urls), "url": urls, "url_hash": hashes}
            )

    def dedup_bloom(key, pdfs, state):
        buf = bytearray(state.get[0]) if state.exists else bytearray(m_bits // 8)
        urls, hashes = [], []
        for pdf in pdfs:
            for url, h in zip(pdf["url"], pdf["url_hash"]):
                # _bloom_positions returns exactly BLOOM_K entries by
                # construction — the membership test needs no length guard
                pos = _bloom_positions(h, m_bits)
                if all(buf[p >> 3] & (1 << (p & 7)) for p in pos):
                    continue  # maybe-seen: suppressed (FP = lost URL)
                for p in pos:
                    buf[p >> 3] |= 1 << (p & 7)
                urls.append(url)
                hashes.append(h)
        state.update((bytes(buf),))
        if urls:
            yield pd.DataFrame(
                {"shard": [int(key[0])] * len(urls), "url": urls, "url_hash": hashes}
            )

    src = (
        spark.readStream.format("text")
        .load(urls_dir)
        .select(F.trim("value").alias("url"))
        .filter(F.col("url") != "")
        .withColumn("url_hash", F.sha2("url", 256))
        .withColumn(
            "shard",
            F.pmod(F.conv(F.substring("url_hash", 1, 8), 16, 10).cast("long"),
                   F.lit(n_shards)).cast("int"),
        )
    )
    deduped = src.groupBy("shard").applyInPandasWithState(
        dedup_bloom if state_mode == "bloom" else dedup_exact,
        outputStructType="shard int, url string, url_hash string",
        stateStructType=(
            "bits binary" if state_mode == "bloom" else "hashes array<string>"
        ),
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# documents-table schema for the curation stream (driver testdata shape)
DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def stream_curate(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    langs: tuple = ("en",),
    min_quality: float = 0.5,
    clf_weights=None,
    clf_threshold: float = 0.5,
    available_now: bool = True,
):
    """Continuous curation: the per-shard training-data pass as a
    stream (curation.curate's streaming analogue).

    Language-ID and quality are stateless codegen'd filters evaluated
    inside each micro-batch's scan; exact-dedup state is a persistent
    content-hash table under ``out_dir/_seen_hashes`` — each batch
    anti-joins it (cross-batch: FIRST ARRIVAL WINS, the streaming
    analogue of curate's lowest-id canonical), dedups within itself by
    lowest doc_id, appends survivors to ``out_dir/kept`` and its new
    hashes to the state table. foreachBatch keeps both writes in one
    batch-scoped unit; re-running a batch after a crash re-derives the
    same deterministic survivor set (appends are idempotent at the
    row level because hashes dedupe on read).

    ``clf_weights`` (a (bucket, weight) DataFrame — trained weights in
    production, curation.hash_weights in tests) adds the
    fasttext-architecture classifier gate (curation.clf_score ≥
    ``clf_threshold``) to each micro-batch: the weight table is tiny
    and broadcast per batch, so the gate is one broadcast join + one
    batch-local doc_id agg — stateless across batches, same plan as
    the batch pipeline."""
    import os as _os

    from pyspark.sql import Window as _W

    from gocrawl_spark import textstats as _ts
    from gocrawl_spark.dedup import text_key as _text_key

    src = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(docs_dir)
    )
    kept_dir = _os.path.join(out_dir, "kept")
    seen_dir = _os.path.join(out_dir, "_seen_hashes")

    def absorb(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        feat = batch_df.select(
            "doc_id",
            _text_key("text").alias("_h"),
            _ts.predict_lang("text").alias("pred_lang"),
            F.round(_ts.quality_score("text"), 6).alias("quality"),
            _ts.token_count("text").alias("n_tokens"),
        ).filter(
            F.col("pred_lang").isin(list(langs))
            & (F.col("quality") >= F.lit(min_quality))
        )
        if clf_weights is not None:
            from gocrawl_spark.curation import clf_score

            ok = clf_score(
                batch_df, clf_weights, threshold=clf_threshold
            ).filter("keep").select("doc_id")
            feat = feat.join(ok, "doc_id", "left_semi")
        # within-batch canonical: lowest doc_id per content hash
        w = _W.partitionBy("_h").orderBy("doc_id")
        feat = (
            feat.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if _os.path.isdir(seen_dir) and any(
            f.startswith("batch=") for f in _os.listdir(seen_dir)
        ):
            seen = s.read.parquet(seen_dir).select("_h").distinct()
            feat = feat.join(seen, "_h", "left_anti")
        feat.persist()
        # batch-id-keyed OVERWRITE, not append: foreachBatch replays a
        # batch after a crash between the two writes with the SAME
        # batch_id, so each write lands in its own idempotent dir and a
        # replay overwrites rather than duplicating survivors
        feat.select("doc_id", "pred_lang", "quality", "n_tokens").write.mode(
            "overwrite"
        ).parquet(_os.path.join(kept_dir, f"batch={batch_id:08d}"))
        feat.select("_h").write.mode("overwrite").parquet(
            _os.path.join(seen_dir, f"batch={batch_id:08d}")
        )
        feat.unpersist()

    writer = src.writeStream.foreachBatch(absorb).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_pack_tokens(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    seqlen: int = 128,
    n_shards: int = 8,
    vocab_size: int = 32768,
    available_now: bool = True,
):
    """Continuous training feed: token-level sequence packing
    (curation.pack_token_sequences) as a STATEFUL streaming operator —
    crawl output lands as parquet drops, fixed-``seqlen`` id windows
    come out, across micro-batches and restarts.

    Per-shard group state is (next_seq, carry): the sequence counter
    and the <seqlen-token partial window — CONSTANT O(seqlen) bytes
    per shard regardless of stream length, so state never grows like
    the exact streaming-dedup set does. Tokenization (hashed-vocab
    ids) and the shard contract are shared with the batch op via
    curation.tokenize_ids / shuffle_key / shard_col.

    Ordering semantics: within a micro-batch each shard packs in
    (shuffle_key, doc_id) order — the batch op's order — and batches
    append in arrival order, so a single-drop availableNow run is
    bit-identical to the batch op's full windows (the trailing
    partial stays in state; a stream has no end to flush at).
    Restarting against the same checkpoint continues seq numbering
    exactly where the carry left off."""
    import pandas as pd

    from gocrawl_spark import curation as _cur

    src = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(docs_dir)
    )
    toks = _cur.tokenize_ids(src, vocab_size)
    keyed = (
        toks.withColumn("_key", _cur.shuffle_key("doc_id"))
        .withColumn("shard", _cur.shard_col(F.col("_key"), n_shards))
        .filter(F.size("ids") > 0)
        .select("shard", "_key", "doc_id", "ids")
    )
    L = int(seqlen)

    def pack(key, pdfs, state):
        if state.exists:
            next_seq, carry = state.get
            carry = list(carry)
        else:
            next_seq, carry = 0, []
        rows = []
        for pdf in pdfs:
            rows.extend(zip(pdf["_key"], pdf["doc_id"], pdf["ids"]))
        rows.sort(key=lambda r: (r[0], r[1]))
        out_seq, out_ids = [], []
        for _, _, ids in rows:
            carry.extend(int(x) for x in ids)
            while len(carry) >= L:
                out_seq.append(next_seq)
                out_ids.append(carry[:L])
                carry = carry[L:]
                next_seq += 1
        state.update((int(next_seq), [int(x) for x in carry]))
        if out_seq:
            yield pd.DataFrame(
                {
                    "shard": [int(key[0])] * len(out_seq),
                    "seq": out_seq,
                    "ids": out_ids,
                }
            )

    packed = keyed.groupBy("shard").applyInPandasWithState(
        pack,
        outputStructType="shard int, seq long, ids array<int>",
        stateStructType="next_seq long, carry array<int>",
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    writer = (
        packed.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_events_rollup(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window_duration: str = "10 minutes",
    watermark_delay: str = "20 minutes",
    available_now: bool = True,
):
    """Watermarked event-time tumbling-window rollup — the canonical
    Structured Streaming aggregation over the events telemetry stream
    (the A1/A3/A8 counts family as a stream; reference metrics rollup
    internal/metrics + api.go search counts).

    Semantics (append mode): a (window, event_type) row is emitted
    EXACTLY ONCE, when the watermark — max event time seen minus
    ``watermark_delay`` — passes the window end. Events arriving late
    but within the delay still amend their window's in-flight state;
    events later than the delay are dropped (the documented loss
    bound). State per shard is O(open windows × event types): the
    watermark closes windows monotonically, so state is CONSTANT for
    a steady stream — this is the bounded-state discipline every
    stateful op here follows (cf. stream_dedup_urls bloom mode).

    Determinism contract: aggregates are count / exact LONG sum /
    min / max only — no float accumulation order — so the finalized
    rows are bit-equal to the batch groupBy over the same (non-late)
    events at ANY parallelism, which is exactly what the test pins.

    One-shot (``available_now``) runs process the directory's current
    files and emit every window whose end precedes the final
    watermark; unfinalized windows stay in checkpointed state and
    emit on the next run — tests drive two drops to pin the
    cross-restart continuation.
    """
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(events_dir)
    )
    agg = (
        src.withWatermark("ts", watermark_delay)
        .groupBy(
            F.window("ts", window_duration).alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("event_id").alias("sum_event_id"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_event_id",
            "min_value",
            "max_value",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q


def sessionize_events(
    df,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
):
    """Session windows over the events table (batch form — the
    assertion twin of :func:`stream_sessionize`): events of one user
    chain into a session while consecutive gaps stay within ``gap``;
    session start = first event time, end = last event time + gap
    (Spark's session_window contract). Aggregates are count + exact
    LONG sum only, and window bounds are emitted as epoch MICROSECOND
    longs — no float accumulation, no timestamp-formatting ambiguity,
    so the output is bit-equal across engines and parallelism.

    Scale shape: ONE shuffle on the user key; per-user session
    merging is Spark's native session_window aggregation (sorted
    merge within partition), state bounded by events-per-user."""
    # parquet may surface TIMESTAMP_NTZ; normalize (UTC session) so
    # session_window bounds stay unix_micros-able
    df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    w = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(F.col(user_col), w.alias("s"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("event_id").alias("sum_event_id"),
        )
        .select(
            user_col,
            F.unix_micros(F.col("s.start")).alias("session_start_us"),
            F.unix_micros(F.col("s.end")).alias("session_end_us"),
            "n_events",
            "sum_event_id",
        )
    )


def stream_sessionize(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark_delay: str = "30 minutes",
    available_now: bool = True,
):
    """Streaming session windows with late-data handling: the
    canonical stateful-session op (user activity sessionization) —
    sessions grow across micro-batches while events keep arriving
    within ``gap``, merge when a bridging event connects two open
    sessions, and emit EXACTLY ONCE when the watermark passes the
    session end (last event + gap). State per shard is O(open
    sessions) and the watermark retires them monotonically — bounded
    for a steady stream, same discipline as stream_events_rollup.

    Single-drop one-shot runs emit exactly the batch
    :func:`sessionize_events` rows whose session end precedes the
    final watermark — the test pins that equivalence."""
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(events_dir)
    )
    agg = (
        src.withWatermark("ts", watermark_delay)
        .groupBy(F.session_window(F.col("ts"), gap).alias("s"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("event_id").alias("sum_event_id"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("s.start")).alias("session_start_us"),
            F.unix_micros(F.col("s.end")).alias("session_end_us"),
            "n_events",
            "sum_event_id",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
