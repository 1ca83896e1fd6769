"""Streaming façade: incremental exactly-once extraction + seed drip."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from gocrawl_spark import streaming, synth


def _write_corpus_slice(spark, sf_dir, lo, hi, out):
    corpus = synth.corpus_from_documents(spark, sf_dir)
    corpus.filter(
        F.regexp_extract("url", r"/(\d+)$", 1).cast("int").between(lo, hi - 1)
    ).coalesce(1).write.mode("overwrite").parquet(out)


def test_stream_extract_incremental(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="stream_ex_")
    corpus_dir = os.path.join(base, "corpus")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(corpus_dir)

    # drop 1: docs 0..99
    _write_corpus_slice(spark, sf_dir, 0, 100, os.path.join(corpus_dir, "drop1"))
    # file source reads a flat dir; move parquet parts up
    for i, d in enumerate(["drop1"]):
        src = os.path.join(corpus_dir, d)
        for f in os.listdir(src):
            if f.endswith(".parquet"):
                os.rename(os.path.join(src, f), os.path.join(corpus_dir, f"{d}_{f}"))

    q = streaming.stream_extract(spark, corpus_dir, out_dir, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == 100

    # drop 2: docs 100..149 land later; restart drains ONLY the delta
    _write_corpus_slice(spark, sf_dir, 100, 150, os.path.join(corpus_dir, "drop2"))
    src = os.path.join(corpus_dir, "drop2")
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            os.rename(os.path.join(src, f), os.path.join(corpus_dir, f"drop2_{f}"))

    q2 = streaming.stream_extract(spark, corpus_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    out = spark.read.parquet(out_dir)
    assert out.count() == 150
    # exactly-once: no url extracted twice across restarts
    assert out.select("url").distinct().count() == 150


def test_stream_fetch_metrics_watermark_late_data(spark):
    """Event-time windowed rollup with watermark: windows are emitted
    exactly once when the watermark passes them; a late event within
    the watermark merges into its window; an event LATER than the
    watermark is dropped and never surfaces — across restarts, from
    the checkpointed watermark, not driver memory."""
    import datetime as dt

    base = tempfile.mkdtemp(prefix="stream_fm_")
    events_dir = os.path.join(base, "events")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(events_dir)

    t = lambda m, s=0: dt.datetime(2024, 1, 1, 10, m, s)

    def drop(name, rows):
        spark.createDataFrame(rows, streaming.FETCH_EVENTS).coalesce(1).write.parquet(
            os.path.join(base, name)
        )
        src = os.path.join(base, name)
        for f in os.listdir(src):
            if f.endswith(".parquet"):
                os.rename(os.path.join(src, f), os.path.join(events_dir, f"{name}_{f}"))

    def run():
        q = streaming.stream_fetch_metrics(
            spark, events_dir, out_dir, ckpt, window="1 minute", watermark="2 minutes"
        )
        q.awaitTermination(120)

    # drop 1: two fetches in window 10:00, one error at 10:05 (advances
    # event time to 10:05 → watermark 10:03 for the NEXT batch)
    drop("d1", [
        ("https://a/1", "a", 200, t(0, 10)),
        ("https://a/2", "a", 200, t(0, 20)),
        ("https://a/3", "a", 503, t(5, 0)),
    ])
    run()

    # drop 2: a LATE event at 10:00:30 (behind the 10:03 watermark →
    # dropped) + a fresh event at 10:10
    drop("d2", [
        ("https://b/1", "b", 200, t(0, 30)),
        ("https://a/4", "a", 200, t(10, 0)),
    ])
    run()
    rows = {
        (r["window_start"].minute, r["host"]): (r["n_fetched"], r["n_errors"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert rows[(0, "a")] == (2, 0)  # 10:00 window finalized once, b's late row dropped
    assert (0, "b") not in rows

    # drop 3: event at 10:20 pushes the watermark past 10:05 and 10:10
    drop("d3", [("https://a/5", "a", 200, t(20, 0))])
    run()
    rows = {
        (r["window_start"].minute, r["host"]): (r["n_fetched"], r["n_errors"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert rows[(5, "a")] == (1, 1) and rows[(10, "a")] == (1, 0)
    assert all(h != "b" for _, h in rows)  # the late row never surfaces
    # exactly-once: one row per (window, host) across all restarts
    out = spark.read.parquet(out_dir)
    assert out.count() == out.select("window_start", "host").distinct().count()


def test_stream_dedup_urls_stateful(spark):
    """Custom stateful operator (applyInPandasWithState): the URL-seen
    state must survive micro-batches AND stream restarts — a URL from
    drop 1 re-arriving in drop 2 is suppressed by the state store, not
    by any external table. Drives the DEFAULT path (state_mode=bloom),
    whose per-shard state must stay constant m_bits/8 bytes."""
    base = tempfile.mkdtemp(prefix="stream_dedup_")
    urls_dir = os.path.join(base, "urls")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(urls_dir)

    with open(os.path.join(urls_dir, "a.txt"), "w") as f:
        f.write("https://a.example.com/1\nhttps://a.example.com/2\nhttps://a.example.com/1\n")
    q = streaming.stream_dedup_urls(spark, urls_dir, out_dir, ckpt, n_shards=4)
    q.awaitTermination(120)
    out1 = spark.read.parquet(out_dir)
    assert sorted(r.url for r in out1.collect()) == [
        "https://a.example.com/1", "https://a.example.com/2",
    ]

    # restart with a drop overlapping drop 1: only the new URL emits
    with open(os.path.join(urls_dir, "b.txt"), "w") as f:
        f.write("https://a.example.com/2\nhttps://a.example.com/3\n")
    q2 = streaming.stream_dedup_urls(spark, urls_dir, out_dir, ckpt, n_shards=4)
    q2.awaitTermination(120)
    out2 = spark.read.parquet(out_dir)
    assert sorted(r.url for r in out2.collect()) == [
        "https://a.example.com/1", "https://a.example.com/2", "https://a.example.com/3",
    ]
    # shards route by url_hash prefix, matching the batch bloom sharding
    assert out2.select("shard").distinct().count() >= 1
    # default mode is bloom: state is a FIXED-SIZE bitset per shard —
    # constant bytes across restarts regardless of distinct-URL count
    st = spark.read.format("statestore").load(ckpt)
    sizes = {len(bytes(r["value"]["groupState"]["bits"])) for r in st.collect()}
    assert sizes == {(1 << 20) // 8}


def test_stream_seeds_dedup(spark):
    base = tempfile.mkdtemp(prefix="stream_seed_")
    seeds_dir = os.path.join(base, "seeds")
    frontier_dir = os.path.join(base, "frontier")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(seeds_dir)

    with open(os.path.join(seeds_dir, "a.txt"), "w") as f:
        f.write("https://site00.example.com/article/1\nhttps://site00.example.com/article/2\n")
    q = streaming.stream_seeds(spark, seeds_dir, frontier_dir, ckpt)
    q.awaitTermination(60)
    assert spark.read.parquet(frontier_dir).count() == 2

    # second drop repeats one URL and adds one — only the new one lands
    with open(os.path.join(seeds_dir, "b.txt"), "w") as f:
        f.write("https://site00.example.com/article/2\nhttps://site00.example.com/article/3\n")
    q2 = streaming.stream_seeds(spark, seeds_dir, frontier_dir, ckpt)
    q2.awaitTermination(60)
    fr = spark.read.parquet(frontier_dir)
    assert fr.count() == 3
    assert fr.select("url_hash").distinct().count() == 3
    assert {r.depth for r in fr.collect()} == {0}


def test_stream_dedup_bloom_state_constant_and_equal(spark):
    """state_mode='bloom': output ≡ exact mode on the same drops
    (sized so no false positive fires), state survives restarts, and
    the per-shard state stays CONSTANT bytes while exact-mode state
    grows with distinct URLs."""
    base = tempfile.mkdtemp(prefix="stream_dedup_bloom_")
    drops = [
        [f"https://a.example.com/{i}" for i in range(40)] + ["https://a.example.com/1"],
        [f"https://a.example.com/{i}" for i in range(20, 60)],  # 20 overlap
    ]
    dirs = {}
    for mode in ("exact", "bloom"):
        urls_dir = os.path.join(base, mode, "urls")
        out_dir = os.path.join(base, mode, "out")
        ckpt = os.path.join(base, mode, "ckpt")
        os.makedirs(urls_dir)
        dirs[mode] = (urls_dir, out_dir, ckpt)
        for i, drop in enumerate(drops):
            with open(os.path.join(urls_dir, f"{i}.txt"), "w") as f:
                f.write("\n".join(drop) + "\n")
            # each drop is its own restart (fresh query, same checkpoint)
            q = streaming.stream_dedup_urls(
                spark, urls_dir, out_dir, ckpt, n_shards=4,
                state_mode=mode, m_bits=1 << 14,
            )
            q.awaitTermination(120)
    exact = sorted(r.url for r in spark.read.parquet(dirs["exact"][1]).collect())
    bloom = sorted(r.url for r in spark.read.parquet(dirs["bloom"][1]).collect())
    assert exact == bloom and len(exact) == 60
    # state-store introspection: bloom state is fixed m_bits/8 bytes
    st = spark.read.format("statestore").load(dirs["bloom"][2])
    sizes = {len(bytes(r["value"]["groupState"]["bits"])) for r in st.collect()}
    assert sizes == {(1 << 14) // 8}


def test_stream_curate_first_arrival_wins(spark, tmp_path):
    """Continuous curation: langid/quality filters per micro-batch,
    exact-dedup state persists across restarts — a duplicate arriving
    in a later drop is dropped (first arrival wins)."""
    import shutil

    base = str(tmp_path / "sc")
    docs_dir, out_dir, ckpt = f"{base}/docs", f"{base}/out", f"{base}/ckpt"
    os.makedirs(docs_dir)
    en = ("the data pipeline is that a report for it on the table "
          "with the analysis and the second sentence that is for it " * 3)
    de = "der hund und die katze sind nicht mit dem vogel ein team da"

    def drop(name, rows):
        tmp = f"{base}/{name}_stage"
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                shutil.move(os.path.join(tmp, f), os.path.join(docs_dir, f"{name}_{f}"))

    def drain():
        q = streaming.stream_curate(spark, docs_dir, out_dir, ckpt)
        q.awaitTermination(120)

    # drop 1: 1 keeps; 2 is an in-batch dup of 1 (lowest id wins);
    # 3 fails language-ID; 4 fails quality (short)
    drop("d1", [(1, en, "en", "s", len(en)), (2, en, "en", "s", len(en)),
                (3, de, "de", "s", len(de)), (4, "too short", "en", "s", 9)])
    drain()
    kept1 = {r["doc_id"] for r in spark.read.parquet(f"{out_dir}/kept").collect()}
    assert kept1 == {1}

    # drop 2 (fresh query, same state): 5 is a cross-drop dup of 1 →
    # dropped; 6 is new prose → kept
    en2 = en.replace("pipeline", "warehouse")
    drop("d2", [(5, en, "en", "s", len(en)), (6, en2, "en", "s", len(en2))])
    drain()
    kept2 = {r["doc_id"] for r in spark.read.parquet(f"{out_dir}/kept").collect()}
    assert kept2 == {1, 6}


def test_stream_curate_clf_gate_matches_batch(spark, tmp_path):
    """The optional classifier gate drops exactly the docs the batch
    clf_score would reject — the streaming pass composes the same
    broadcast-weight inference per micro-batch."""
    import shutil

    from gocrawl_spark import curation

    base = str(tmp_path / "scc")
    docs_dir, out_dir, ckpt = f"{base}/docs", f"{base}/out", f"{base}/ckpt"
    os.makedirs(docs_dir)
    en = ("the data pipeline is that a report for it on the table "
          "with the analysis and the second sentence that is for it " * 3)
    rows = [(i, en.replace("pipeline", f"topic{i}"), "en", "s", len(en))
            for i in range(1, 9)]
    tmp = f"{base}/stage"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(tmp)
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            shutil.move(os.path.join(tmp, f), os.path.join(docs_dir, f))

    w = curation.hash_weights(spark, 1024, seed="stream-clf")
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    scores = sorted(
        r["score"] for r in curation.clf_score(docs, w).collect()
    )
    # a threshold strictly between the median neighbours guarantees
    # the gate splits this set
    thr = (scores[3] + scores[4]) / 2
    expected = {
        r["doc_id"]
        for r in curation.clf_score(docs, w, threshold=thr)
        .filter("keep").collect()
    }
    assert 0 < len(expected) < 8

    q = streaming.stream_curate(
        spark, docs_dir, out_dir, ckpt, clf_weights=w, clf_threshold=thr
    )
    q.awaitTermination(120)
    kept = {r["doc_id"] for r in spark.read.parquet(f"{out_dir}/kept").collect()}
    assert kept == expected


def test_stream_pack_tokens_matches_batch_and_survives_restart(spark):
    """Stateful streaming packing: a single availableNow drop must be
    bit-identical to the batch op's full windows; a second drop after
    a restart continues seq numbering from the checkpointed carry."""
    import hashlib

    from gocrawl_spark import curation

    base = tempfile.mkdtemp(prefix="stream_pack_")
    docs_dir = os.path.join(base, "docs")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    L, S = 64, 4

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(80)
    docs.write.parquet(docs_dir)
    q = streaming.stream_pack_tokens(
        spark, docs_dir, out_dir, ckpt, seqlen=L, n_shards=S
    )
    q.awaitTermination(120)
    got = {(r["shard"], r["seq"]): list(r["ids"])
           for r in spark.read.parquet(out_dir).collect()}
    batch_full = {(r["shard"], r["seq"]): list(r["ids"])
                  for r in curation.pack_token_sequences(
                      docs, seqlen=L, n_shards=S).collect()
                  if len(r["ids"]) == L}
    assert got == batch_full

    # restart with a second drop: replay per shard in Python to check
    # the carry/seq state picked up exactly where drop 1 stopped
    docs2 = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).orderBy("doc_id").limit(120).subtract(docs)
    docs2.write.mode("append").parquet(docs_dir)
    q2 = streaming.stream_pack_tokens(
        spark, docs_dir, out_dir, ckpt, seqlen=L, n_shards=S
    )
    q2.awaitTermination(120)
    got2 = {(r["shard"], r["seq"]): list(r["ids"])
            for r in spark.read.parquet(out_dir).collect()}

    ids_of = {r["doc_id"]: list(r["ids"])
              for r in curation.tokenize_ids(
                  docs.unionByName(docs2), 32768).collect()}
    drop1 = {r["doc_id"] for r in docs.select("doc_id").collect()}
    expect = {}
    for sh in range(S):
        stream = []
        for batch_ids in (drop1, set(ids_of) - drop1):
            members = []
            for d in batch_ids:
                key = hashlib.md5(f"{d}:gocrawl".encode()).hexdigest()
                if int(key[:8], 16) % S == sh:
                    members.append((key, d))
            for _, d in sorted(members):
                stream.extend(ids_of[d])
        for s in range(len(stream) // L):
            expect[(sh, s)] = stream[s * L:(s + 1) * L]
    assert got2 == expect


def test_stream_events_rollup_watermark_late_data(spark, tmp_path):
    """Watermarked tumbling-window rollup: exactly-once append
    emission, in-delay late events amend their window, beyond-delay
    events drop, and finalized rows are bit-equal to the batch
    groupBy over the surviving events."""
    import datetime as dt

    from pyspark.sql import functions as F

    ev_dir = str(tmp_path / "events")
    out = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    T = lambda m: dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=m)

    rows1 = [
        (1, T(1), 10, "a", 1.5, ""), (2, T(5), 11, "a", 2.5, ""),
        (3, T(7), 12, "b", 0.5, ""), (4, T(12), 13, "a", 3.0, ""),
        (5, T(35), 14, "b", 9.0, ""),
    ]
    spark.createDataFrame(rows1, streaming.EVENTS_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(ev_dir)
    streaming.stream_events_rollup(spark, ev_dir, out, ckpt)
    got1 = {(r["win_start"].minute, r["event_type"]):
            (r["n_events"], r["sum_event_id"])
            for r in spark.read.parquet(out).collect()}
    # watermark = 00:35 − 20m = 00:15 → only [00:00, 00:10) finalized
    assert got1 == {(0, "a"): (2, 3), (0, "b"): (1, 3)}

    rows2 = [
        (6, T(12), 15, "a", 4.0, ""),   # late, within delay → amends [10,20)
        (7, T(3), 16, "a", 8.0, ""),    # beyond delay (wm 00:15) → dropped
        (8, T(60), 17, "b", 1.0, ""),   # advances watermark to 00:40
    ]
    spark.createDataFrame(rows2, streaming.EVENTS_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(ev_dir)
    streaming.stream_events_rollup(spark, ev_dir, out, ckpt)
    m = {(r["win_start"].minute, r["event_type"]):
         (r["n_events"], r["sum_event_id"])
         for r in spark.read.parquet(out).collect()}
    assert m[(10, "a")] == (2, 10)      # event 4 + late event 6
    assert m[(30, "b")] == (1, 5)
    assert m[(0, "a")] == (2, 3)        # too-late event 7 never lands
    assert not [k for k in m if k[0] == 60]  # [60,70) still open in state

    # stream ≡ batch over the surviving (non-dropped) events for every
    # finalized window — identical aggregates, exactly once
    batch = (
        spark.read.parquet(ev_dir).filter("event_id <> 7")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("event_id").alias("s"))
        .filter(F.col("w.end") <= F.lit(T(40)))
    )
    want = {(r["w"]["start"].minute, r["event_type"]): (r["n"], r["s"])
            for r in batch.collect()}
    assert m == want


def test_stream_sessionize_matches_batch_and_merges(spark, tmp_path):
    """Session windows as a stream: sessions emit exactly once when
    the watermark passes last-event+gap; a later event within the gap
    MERGES into the open session across micro-batches; single-drop
    emission equals the batch sessionize rows for finalized sessions.
    Also pins the boundary rule: an exact-gap event EXTENDS."""
    import datetime as dt

    ev_dir = str(tmp_path / "events")
    out = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")
    T = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)

    rows1 = [
        (1, T(0, 0), 10, "a", 0.0, ""), (2, T(0, 10), 10, "a", 0.0, ""),
        (3, T(0, 5), 11, "a", 0.0, ""),
        (4, T(0, 35), 11, "a", 0.0, ""),   # exact 30-min gap → extends
        (5, T(3, 0), 12, "a", 0.0, ""),    # advances watermark to 2:30
    ]
    spark.createDataFrame(rows1, streaming.EVENTS_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(ev_dir)
    streaming.stream_sessionize(spark, ev_dir, out, ckpt)
    got1 = {(r["user_id"], r["session_start_us"]):
            (r["n_events"], r["session_end_us"])
            for r in spark.read.parquet(out).collect()}
    batch = {(r["user_id"], r["session_start_us"]):
             (r["n_events"], r["session_end_us"])
             for r in streaming.sessionize_events(
                 spark.createDataFrame(rows1, streaming.EVENTS_SCHEMA)
             ).collect()
             if r["user_id"] in (10, 11)}  # finalized before wm 2:30
    assert got1 == batch and len(got1) == 2
    us = lambda d: int(d.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
    # exact-gap user-11 session spans both events: end = 0:35 + 30m
    assert got1[(11, us(T(0, 5)))] == (2, us(T(1, 5)))

    rows2 = [
        (6, T(3, 10), 12, "a", 0.0, ""),   # within gap → merges into 3:00
        (7, T(6, 0), 13, "a", 0.0, ""),    # watermark → 5:30
    ]
    spark.createDataFrame(rows2, streaming.EVENTS_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(ev_dir)
    streaming.stream_sessionize(spark, ev_dir, out, ckpt)
    got2 = {(r["user_id"], r["session_start_us"]):
            (r["n_events"], r["session_end_us"])
            for r in spark.read.parquet(out).collect()}
    # the merged user-12 session emitted ONCE with both events
    assert got2[(12, us(T(3, 0)))] == (2, us(T(3, 40)))
    assert len(got2) == 3  # user 13's session still open in state
