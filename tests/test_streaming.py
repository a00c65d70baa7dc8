"""Streaming-vs-batch parity (SURVEY.md §2.9 X6): the batch window operators
are the oracle for the Structured Streaming twins, over the same events
parquet driven through a file-source stream with availableNow."""

import shutil

import pytest
from pyspark.sql import functions as F

from openapc_olap_spark import streaming
from openapc_olap_spark.operators import windows
from openapc_olap_spark.session import load_tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF}/events.parquet", d / "part-000.parquet")
    return str(d)


def _rows(df, key_cols):
    return {tuple(r[c] for c in key_cols): (r["n_events"], r["value_sum"])
            for r in df.collect()}


def test_streaming_tumbling_matches_batch(spark, stream_dir):
    ev = streaming.read_event_stream(spark, stream_dir)
    agg = streaming.windowed_aggregate(ev, duration="1 day",
                                       group_cols=["event_type"])
    streaming.run_to_memory(streaming.finalize_windows(agg, ["event_type"]),
                            "t_tumbling")
    got = _rows(spark.table("t_tumbling"), ["window_start", "event_type"])

    batch = windows.tumbling(load_tables(spark, SF, ["events"])["events"],
                             duration="1 day", group_cols=["event_type"])
    want = _rows(batch, ["window_start", "event_type"])
    assert got == want and len(got) > 0


def test_streaming_sessions_match_batch(spark, stream_dir):
    ev = streaming.read_event_stream(spark, stream_dir)
    sess = streaming.sessionized(ev, gap="6 hours")
    streaming.run_to_memory(
        sess.select(F.col("user_id"),
                    F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("session_start"), "n_events", "value_sum"),
        "t_sessions")
    got = _rows(spark.table("t_sessions"), ["user_id", "session_start"])

    batch = windows.sessionize(load_tables(spark, SF, ["events"])["events"],
                               gap="6 hours")
    want = _rows(batch, ["user_id", "session_start"])
    assert got == want and len(got) > 0


def test_append_mode_emits_closed_windows(spark, stream_dir, tmp_path):
    """Watermark + append: availableNow emits only windows the final
    watermark has sealed — the state-eviction behavior that bounds memory."""
    ev = streaming.read_event_stream(spark, stream_dir)
    agg = streaming.windowed_aggregate(ev, duration="1 day",
                                       watermark="1 hour")
    q = (streaming.finalize_windows(agg).writeStream.format("memory")
         .queryName("t_append").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    emitted = spark.table("t_append").count()
    total = windows.tumbling(
        load_tables(spark, SF, ["events"])["events"], duration="1 day").count()
    # all but the last open window(s) must be sealed and emitted
    assert 0 < emitted <= total
    assert emitted >= total - 2


def test_stateful_sessionize_matches_batch_closed_sessions(spark, stream_dir):
    """applyInPandasWithState sessionizer: its closed sessions must equal the
    batch session_window result minus each user's final (still-open)
    session."""
    from openapc_olap_spark.streaming.stateful import stateful_sessionize

    ev = streaming.read_event_stream(spark, stream_dir)
    out = stateful_sessionize(ev, gap="6 hours")
    q = (out.withColumn("session_start",
                        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss"))
         .writeStream.format("memory").queryName("t_stateful")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["user_id"], r["session_start"]): (r["n_events"], r["value_sum"])
           for r in spark.table("t_stateful").collect()}

    batch = windows.sessionize(load_tables(spark, SF, ["events"])["events"],
                               gap="6 hours").collect()
    last_start = {}
    for r in batch:
        last_start[r["user_id"]] = max(last_start.get(r["user_id"], ""),
                                       r["session_start"])
    want = {(r["user_id"], r["session_start"]): (r["n_events"], r["value_sum"])
            for r in batch if r["session_start"] != last_start[r["user_id"]]}
    assert got == want and len(got) > 0


def test_streaming_dedup_drops_redelivered_events(spark, tmp_path):
    """dropDuplicatesWithinWatermark ingest guard: the same file delivered
    in two microbatches (at-least-once redelivery) must come out once."""
    import shutil as _sh
    d = tmp_path / "dup_stream"
    d.mkdir()
    _sh.copy(f"{SF}/events.parquet", d / "part-000.parquet")
    _sh.copy(f"{SF}/events.parquet", d / "part-001.parquet")

    ev = streaming.read_event_stream(spark, str(d), max_files_per_trigger=1)
    deduped = streaming.deduplicated(ev, ["event_id"], watermark="1 hour")
    q = (deduped.writeStream.format("memory").queryName("t_dedup")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()

    distinct = (load_tables(spark, SF, ["events"])["events"]
                .select("event_id").distinct().count())
    out = spark.table("t_dedup")
    assert out.count() == distinct
    assert out.select("event_id").distinct().count() == distinct


def test_streaming_stateless_text_transforms_match_batch(spark, tmp_path):
    """Stateless text operators (PII redaction, quality scoring) run
    unchanged inside a streaming query — the same Column expressions are
    the transformation in both engines, so the batch result is the oracle
    (append mode, no state, no watermark needed)."""
    import shutil as _sh

    from openapc_olap_spark.operators import text

    d = tmp_path / "docs_stream"
    d.mkdir()
    _sh.copy(f"{SF}/documents.parquet", d / "part-000.parquet")

    batch_docs = spark.read.parquet(f"{SF}/documents.parquet")
    stream_docs = (spark.readStream.schema(batch_docs.schema)
                   .parquet(str(d)))

    def transform(df):
        return df.select(
            "doc_id",
            text.redact_pii("text").alias("red"),
            F.round(text.quality_score("text"), 6).alias("q"))

    q = (transform(stream_docs).writeStream.format("memory")
         .queryName("t_redact").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination()

    got = {r["doc_id"]: (r["red"], r["q"])
           for r in spark.table("t_redact").collect()}
    want = {r["doc_id"]: (r["red"], r["q"])
            for r in transform(batch_docs).collect()}
    assert got == want and len(got) > 0


def test_parquet_sink_checkpoint_exactly_once(spark, stream_dir, tmp_path):
    """write_stream_parquet (the production sink shape): output matches the
    batch twin, and a RESTART against the same checkpoint with unchanged
    input writes nothing new — the checkpoint gives exactly-once across
    job restarts, which is what makes periodic availableNow rollups safe
    to re-run at 100 TB."""
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    ev = streaming.read_event_stream(spark, stream_dir)
    agg = streaming.windowed_aggregate(ev, duration="1 day",
                                       watermark="1 hour")
    q = streaming.write_stream_parquet(
        streaming.finalize_windows(agg), out, ckpt)
    q.awaitTermination()
    first = spark.read.parquet(out).collect()
    assert len(first) > 0
    # restart: same source, same checkpoint -> no new input, no new rows
    ev2 = streaming.read_event_stream(spark, stream_dir)
    agg2 = streaming.windowed_aggregate(ev2, duration="1 day",
                                        watermark="1 hour")
    q2 = streaming.write_stream_parquet(
        streaming.finalize_windows(agg2), out, ckpt)
    q2.awaitTermination()
    second = spark.read.parquet(out).collect()
    assert sorted(map(tuple, second)) == sorted(map(tuple, first))


def test_stateful_sessionize_group_spanning_arrow_chunks(spark, tmp_path):
    """A group larger than arrow.maxRecordsPerBatch arrives as multiple
    pandas chunks in shuffle order; the sessionizer must globally
    time-sort the group (concat before sort) or it fabricates session
    splits. Forced here with a 7-row batch limit against a 60-event
    user."""
    import pandas as pd

    from openapc_olap_spark.streaming import stateful

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch",
                          "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        base = pd.Timestamp("2024-01-01")
        rows = []
        # two true sessions per user: 30 events 1 min apart, a 7h gap,
        # then 30 more; row order scrambled so chunk-local sorting fails
        for uid in (1, 2):
            ts = ([base + pd.Timedelta(minutes=i) for i in range(30)]
                  + [base + pd.Timedelta(hours=8, minutes=i)
                     for i in range(30)])
            rows += [(uid * 1000 + i, t.to_pydatetime(), uid, "c", 1.0,
                      "{}") for i, t in enumerate(ts)]
        import random
        random.Random(3).shuffle(rows)
        src = str(tmp_path / "ev")
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double, props string"
        ).coalesce(1).write.parquet(src)
        ev = streaming.read_event_stream(spark, src)
        sess = stateful.stateful_sessionize(ev, gap="6 hours")
        q = (sess.writeStream.format("memory").queryName("t_chunks")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        got = spark.table("t_chunks").collect()
        # only the FIRST session per user closes (the second stays open)
        assert len(got) == 2
        for r in got:
            assert r["n_events"] == 30 and r["value_sum"] == 30.0
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_streaming_cms_windows_merge_to_batch_sketch(spark, stream_dir):
    """Per-window streaming CMS grids summed over all windows must equal
    the sketch built directly over the whole events table — the
    mergeability contract, bit-exact."""
    from openapc_olap_spark.operators import sketches
    from openapc_olap_spark.streaming import sketches as ssk

    ev = streaming.read_event_stream(spark, stream_dir)
    grids = ssk.windowed_cms(ev, key_col="event_type", duration="1 day",
                             width=128, depth=3)
    streaming.run_to_memory(ssk.finalize_cms_windows(grids), "t_cms")
    merged = (spark.table("t_cms")
              .groupBy("row", "pos").agg(F.sum("cnt").alias("cnt")))

    events = load_tables(spark, SF, ["events"])["events"]
    direct = sketches.cms_build(events.select(F.col("event_type").alias("t")),
                                "t", width=128, depth=3)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))
    # and the per-window grids are genuinely windowed (more than one day)
    assert spark.table("t_cms").select("window_start").distinct().count() > 1


def test_stream_stream_interval_join_matches_batch(spark, stream_dir):
    """The watermarked stream-stream join equals the batch interval join
    over the same (fully available) input — row-for-row, including
    payloads from both sides."""
    from openapc_olap_spark.streaming import joins as sj

    def sides(df):
        clicks = (df.filter(F.col("event_type") == "click")
                  .select("user_id", "ts", "event_id"))
        buys = (df.filter(F.col("event_type") == "purchase")
                .select("user_id", "ts", "event_id", "value"))
        return clicks, buys

    sc, sp = sides(streaming.read_event_stream(spark, stream_dir))
    joined = sj.interval_join_streams(sc, sp, keys=["user_id"],
                                      within="1 hour", watermark="2 hours")
    assert joined.isStreaming
    streaming.run_to_memory(joined, "t_ssjoin", output_mode="append")
    got = {(r["user_id"], r["event_id"], r["event_id_r"])
           for r in spark.table("t_ssjoin").collect()}

    ev = load_tables(spark, SF, ["events"])["events"]
    bc, bp = sides(ev)
    batch = sj.interval_join_streams(bc, bp, keys=["user_id"],
                                     within="1 hour", watermark="2 hours")
    want = {(r["user_id"], r["event_id"], r["event_id_r"])
            for r in batch.collect()}
    assert got == want and len(got) > 0
    # schema carries both payloads, right side suffixed
    assert {"user_id", "ts", "event_id", "ts_r", "event_id_r", "value_r"} \
        == set(spark.table("t_ssjoin").columns)


def test_stream_stream_left_outer_join_matches_batch(spark, stream_dir):
    """left_outer emits unmatched clicks with NULL right payload. Matched
    pairs equal the batch left join exactly; NULL emissions equal it for
    every click OUTSIDE the final watermark+interval horizon (rows inside
    it are still buffered when a bounded run stops — the documented
    streaming outer-join semantics)."""
    from openapc_olap_spark.streaming import joins as sj

    def sides(df):
        clicks = (df.filter(F.col("event_type") == "click")
                  .select("user_id", "ts", "event_id"))
        buys = (df.filter(F.col("event_type") == "purchase")
                .select("user_id", "ts", "event_id", "value"))
        return clicks, buys

    sc, sp = sides(streaming.read_event_stream(spark, stream_dir))
    joined = sj.interval_join_streams(sc, sp, keys=["user_id"],
                                      within="1 hour", watermark="2 hours",
                                      how="left_outer")
    streaming.run_to_memory(joined, "t_ssjoin_lo", output_mode="append")
    got = {(r["user_id"], r["event_id"], r["event_id_r"])
           for r in spark.table("t_ssjoin_lo").collect()}

    ev = load_tables(spark, SF, ["events"])["events"]
    bc, bp = sides(ev)
    batch = sj.interval_join_streams(bc, bp, keys=["user_id"],
                                     within="1 hour", watermark="2 hours",
                                     how="left_outer")
    want = {(r["user_id"], r["event_id"], r["event_id_r"])
            for r in batch.collect()}
    assert got <= want                   # streaming never invents rows
    # matched pairs are complete
    assert {t for t in got if t[2] is not None} == \
        {t for t in want if t[2] is not None}
    # withheld rows are all NULL-side and sit in the stream's final
    # eviction horizon (watermark + interval, plus a microbatch of state-
    # cleanup lag — use 2x as the conservative bound on the engine's
    # internals)
    import datetime

    ev = load_tables(spark, SF, ["events"])["events"]
    max_ts = ev.agg(F.max("ts")).first()[0]
    horizon = max_ts - datetime.timedelta(hours=6)   # 2 * (2h wm + 1h)
    late_ids = {r["event_id"] for r in
                ev.filter(F.col("ts") > horizon).collect()}
    withheld = want - got
    assert withheld                                   # the case is real
    assert all(t[2] is None and t[1] in late_ids for t in withheld)
    unmatched = {t for t in got if t[2] is None}
    assert unmatched and len(got) > len(unmatched)   # both kinds present

    with pytest.raises(ValueError):
        sj.interval_join_streams(sc, sp, keys=["user_id"], within="1 hour",
                                 watermark="2 hours", how="full_outer")


def test_drain_sentinel_flushes_withheld_nulls(spark, tmp_path):
    """VERDICT r05 item 8: a bounded left-outer run withholds NULLs for
    clicks inside the final watermark+interval horizon; writing a
    drain_sentinel batch beyond the horizon and re-running flushes every
    real click's NULL, and the sentinel rows themselves never surface."""
    import datetime

    from openapc_olap_spark.streaming import joins as sj

    d = tmp_path / "drain_src"
    d.mkdir()
    shutil.copy(f"{SF}/events.parquet", d / "part-000.parquet")

    def sides(df):
        clicks = (df.filter(F.col("event_type") == "click")
                  .select("user_id", "ts", "event_id"))
        buys = (df.filter(F.col("event_type") == "purchase")
                .select("user_id", "ts", "event_id", "value"))
        return clicks, buys

    def run(name):
        sc, sp = sides(streaming.read_event_stream(spark, str(d)))
        j = sj.interval_join_streams(sc, sp, keys=["user_id"],
                                     within="1 hour", watermark="2 hours",
                                     how="left_outer")
        streaming.run_to_memory(j, name, output_mode="append")
        return {(r["user_id"], r["event_id"], r["event_id_r"])
                for r in spark.table(name).collect()
                if r["user_id"] != -1}

    ev = load_tables(spark, SF, ["events"])["events"]
    bc, bp = sides(ev)
    want = {(r["user_id"], r["event_id"], r["event_id_r"])
            for r in sj.interval_join_streams(
                bc, bp, keys=["user_id"], within="1 hour",
                watermark="2 hours", how="left_outer").collect()}

    before = run("t_drain_before")
    assert before < want                          # NULLs withheld

    max_ts = ev.agg(F.max("ts")).first()[0]
    fmt = "%Y-%m-%d %H:%M:%S"
    # right-type sentinel first, left-type later by > within (module
    # docstring ordering rule), both far beyond watermark + within
    sj.drain_sentinel(spark, str(d), [
        ("purchase", (max_ts + datetime.timedelta(hours=10)).strftime(fmt)),
        ("click", (max_ts + datetime.timedelta(hours=13)).strftime(fmt)),
    ])
    after = run("t_drain_after")
    assert after == want                          # every NULL flushed


def test_x60_gate_restores_shuffle_partitions(spark):
    """The x60 gate sizes state-store partitions for the streaming query
    (SCALING.md streaming section) but must hand the session back with
    the caller's shuffle-partition setting intact."""
    import __spark_entry__ as entrymod

    before = spark.conf.get("spark.sql.shuffle.partitions")
    out = entrymod.queries()["x60_stream_stream_join"](spark, SF)
    assert out.count() >= 0
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_stream_dedup_commit_exactly_once_effects(spark, tmp_path):
    """streaming/incremental.py: per-batch dedup against the
    transactional fp store with BOTH effects as upserts — second
    (duplicate) file contributes nothing, in-batch dups resolve to the
    min id, and replaying the ENTIRE stream with a fresh checkpoint
    (the at-least-once worst case) leaves both stores' contents
    bitwise unchanged."""
    from openapc_olap_spark.sources import txn
    from openapc_olap_spark.streaming import incremental as inc

    docs = [(1, "alpha text"), (2, "beta text"),
            (3, "ALPHA text"),           # in-batch dup of 1 (normalized)
            (9, "seen before")]          # historical dup
    src = str(tmp_path / "src")
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.coalesce(1).write.parquet(src)
    import glob
    import shutil
    part = glob.glob(f"{src}/part-*.parquet")[0]
    shutil.copy(part, f"{src}/part-dup-copy.parquet")  # redelivery

    hist = spark.createDataFrame([("seen before",)], "text string")
    seen = (hist.select(inc.fingerprint("text").alias("fp"))
            .withColumn("seq", F.lit(0).cast("long")))
    fp_store = txn.TxnTable.create(
        spark, str(tmp_path / "fps"), txn.add_bucket(seen, ["fp"], 4),
        "bucket", meta={"n_buckets": 4})
    empty_out = spark.createDataFrame(
        [], "doc_id long, text string, seq long, bucket bigint")
    out_store = txn.TxnTable.create(
        spark, str(tmp_path / "out"), empty_out, "bucket",
        meta={"n_buckets": 4})

    def run(ckpt):
        stream = inc.read_document_stream(spark, src)
        inc.stream_dedup_commit(stream, fp_store, out_store,
                                checkpoint=str(tmp_path / ckpt),
                                bloom_bits=1 << 10)

    run("ck1")
    got = {(r["doc_id"], r["text"]) for r in
           out_store.read().select("doc_id", "text").collect()}
    assert got == {(1, "alpha text"), (2, "beta text")}
    v_fp, v_out = fp_store.version(), out_store.version()
    assert v_fp >= 2 and v_out >= 2          # one commit per batch
    # full at-least-once replay: fresh checkpoint, same source
    run("ck2")
    got2 = {(r["doc_id"], r["text"]) for r in
            out_store.read().select("doc_id", "text").collect()}
    assert got2 == got
    fps = {r["fp"] for r in fp_store.read().select("fp").collect()}
    assert len(fps) == 3                     # alpha, beta, seen-before


def test_stream_vector_index_commit_replay_idempotent(spark, tmp_path):
    """streaming.vectors (round 11): per-batch transactional PQ-index
    commits. Two micro-batches (redelivered file) must leave the codes
    store CONTENT at the single-commit state (content-keyed last-wins),
    advance one version per batch per store, and a full at-least-once
    replay (fresh checkpoint) must change nothing; a served query must
    see the streamed vectors."""
    from pyspark.sql import functions as F

    from openapc_olap_spark.operators import pq
    from openapc_olap_spark.sources.txn import TxnTable
    from openapc_olap_spark.streaming import vectors as sv

    def vec(i):
        return [float((i * 7 + j) % 11 - 5) for j in range(8)]

    base = spark.createDataFrame(
        [(i, vec(i)) for i in range(16)],
        "vec_id long, embedding array<double>")
    corpus = pq._clean(base, 8, "vec_id", "embedding")
    coarse = pq.first_n_vectors(corpus, 4)
    cents = pq.train_pq_cents(pq.first_n_vectors(corpus, 4), coarse, 4)
    idx = str(tmp_path / "idx")
    pq.create_pq_txn_index(spark, idx, base, coarse, cents)

    new = spark.createDataFrame(
        [(i, vec(i)) for i in range(16, 24)],
        "vec_id long, embedding array<double>")
    src = str(tmp_path / "src")
    import os
    import shutil
    new.coalesce(1).write.parquet(str(tmp_path / "stage"))
    part = [f for f in os.listdir(str(tmp_path / "stage"))
            if f.endswith(".parquet")][0]
    os.makedirs(src)
    for i in range(2):                       # redelivered copy
        shutil.copy(str(tmp_path / "stage" / part),
                    f"{src}/part-{i:03d}.parquet")

    def run(ck):
        sv.stream_vector_index_commit(
            sv.read_vector_stream(spark, src), idx,
            checkpoint=str(tmp_path / ck))

    run("ck1")
    ct = TxnTable(spark, f"{idx}/codes", "list_id")
    vt = TxnTable(spark, f"{idx}/vectors", "list_id")
    assert ct.version() == 2 and vt.version() == 2   # one commit/batch
    got = {(r["id"], r["seq"]) for r in
           ct.read().select("id", "seq").collect()}
    assert {i for i, _ in got} == set(range(24))
    # streamed rows carry the REPLAY batch's seq (last-wins), base seq 0
    assert all(s == (1 if i >= 16 else 0) for i, s in got)
    # full replay: fresh checkpoint, content unchanged
    run("ck2")
    assert {(r["id"], r["seq"]) for r in
            ct.read().select("id", "seq").collect()} == got
    # serving sees a streamed vector's neighbors
    top = pq.pq_txn_topk(spark, idx, vec(20), k=3, n_probe=4,
                         rerank=24, exclude_id=20)
    assert len(top.collect()) == 3
    # the index must exist before the stream starts
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        sv.stream_vector_index_commit(
            sv.read_vector_stream(spark, src),
            str(tmp_path / "nope"), checkpoint=str(tmp_path / "ck3"))
