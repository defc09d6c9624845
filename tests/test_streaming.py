"""Streaming: the batch/stream unified expressions must agree — the
streaming result (availableNow over a file source) equals the batch result
of the same operator, and session_window equals gaps-and-islands."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_cube_spark.functions import epoch_seconds

from data_cube_spark.streaming import (
    session_windows,
    sessionize_batch,
    tumbling_agg,
)

from tests.conftest import SF_DIR


def test_session_window_equals_gaps_and_islands(spark, tables):
    ev = tables["events"]
    a = session_windows(ev).orderBy("user_id", "session_start").collect()
    b = sessionize_batch(ev).orderBy("user_id", "session_start").collect()
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra["user_id"] == rb["user_id"]
        assert ra["session_start"] == rb["session_start"]
        assert ra["n_events"] == rb["n_events"]


def test_streaming_tumbling_equals_batch(spark, tables, tmp_path):
    """readStream(availableNow) over the events parquet == batch result."""
    ev = tables["events"]
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in tumbling_agg(ev, keys=["event_type"]).collect()
    }

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    agg = tumbling_agg(stream, keys=["event_type"])
    q = (
        agg.writeStream.format("memory")
        .queryName("t_stream_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from t_stream_agg").collect()
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in out
    }
    assert streamed == batch


def test_streaming_cube_foreachbatch_upsert(spark, tables, tmp_path):
    """foreachBatch incremental cube maintenance writes a queryable target
    partitioned by window date."""
    from data_cube_spark.streaming import streaming_cube

    ev = tables["events"]
    src = str(tmp_path / "src2")
    ev.write.mode("overwrite").parquet(src)
    target = str(tmp_path / "target")
    writer = streaming_cube(
        spark, src, ev.schema, str(tmp_path / "ckpt2"), target,
        keys=["event_type"],
    )
    q = writer.start()
    q.awaitTermination(120)
    out = spark.read.parquet(target)
    batch = tumbling_agg(ev, keys=["event_type"])
    assert out.count() == batch.count()
    total_stream = out.agg(F.sum("n_events")).collect()[0][0]
    assert total_stream == ev.count()


def test_streaming_cube_multibatch_no_window_loss(spark, tables, tmp_path):
    """The ADVICE r1 data-loss scenario: multiple micro-batches, each
    touching only SOME (window, key) rows — previously-materialized rows a
    later batch doesn't touch must survive the upsert. Feeding 4 time-
    ordered file chunks one per trigger (the watermark's arrival-order
    contract; windows spanning a chunk cut still update across batches),
    the final target must equal the batch twin row-for-row (every window,
    every key)."""
    import time as _time

    from data_cube_spark.streaming.cube_stream import make_window_upsert

    ev = tables["events"]
    src = str(tmp_path / "src_mb")
    os.makedirs(src, exist_ok=True)
    tsd = epoch_seconds("ts")
    cuts = ev.select(tsd.alias("t")).approxQuantile("t", [0.25, 0.5, 0.75], 0.001)
    bounds = [None, *cuts, None]
    for i in range(4):
        p = ev
        if bounds[i] is not None:
            p = p.where(tsd > bounds[i])
        if bounds[i + 1] is not None:
            p = p.where(tsd <= bounds[i + 1])
        p.coalesce(1).write.mode("overwrite").parquet(f"{src}/chunk={i}")
        _time.sleep(1.1)
    target = str(tmp_path / "target_mb")
    # one file per micro-batch => several update-mode batches, each emitting
    # only the (window, key) pairs that file touched
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk=*")
    )
    agg = tumbling_agg(stream, keys=["event_type"])
    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(make_window_upsert(spark, target, ["event_type"]))
        .option("checkpointLocation", str(tmp_path / "ckpt_mb"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.read.parquet(target).collect()
    }
    truth = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in tumbling_agg(ev, keys=["event_type"]).collect()
    }
    assert got == truth

    # close the loop (VERDICT r1 #10): the multi-batch-maintained cube is
    # queryable through the cube API and equals the batch truth
    from data_cube_spark.selectors import Collapse
    from data_cube_spark.streaming import cube_from_materialized

    dc = cube_from_materialized(spark, target, keys=["event_type"])
    by_type = {r["event_type"]: (r["n_events"], round(r["sum_value"], 6))
               for r in dc.q(window=Collapse()).fact.df.collect()}
    batch_truth = {r["event_type"]: (r["n_events"], round(r["sum_value"], 6))
                   for r in ev.groupBy("event_type").agg(
                       F.count(F.lit(1)).alias("n_events"),
                       F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                       .alias("sum_value")).collect()}
    assert by_type == batch_truth


def test_stateful_user_totals_multibatch(spark, tables, tmp_path):
    """applyInPandasWithState carries per-user state across micro-batches:
    3 file chunks x maxFilesPerTrigger=1 => 3 batches; the final emitted
    state per user equals the batch group-by."""
    from data_cube_spark.streaming import stateful_user_totals, user_totals_batch

    ev = tables["events"]
    src = str(tmp_path / "src3")
    ev.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful_user_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from t_stateful").collect()
    assert len(rows) > len(ev.select("user_id").distinct().collect()) - 1, \
        "expected at least one emission per user"
    # final state per user = the emission with the largest n_events
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["sum_value"])
    batch = {r["user_id"]: (r["n_events"], r["sum_value"])
             for r in user_totals_batch(ev).collect()}
    assert set(final) == set(batch)
    for uid, (n, s) in batch.items():
        fn, fs = final[uid]
        assert fn == n, f"user {uid}: {fn} != {n}"
        assert abs(fs - s) < 1e-6 * max(1.0, abs(s)), f"user {uid}: {fs} != {s}"


def test_stateful_sessionize_multibatch(spark, tables, tmp_path):
    """Custom sessionization state machine: events split into 3 time-range
    files fed one per micro-batch; final emissions per (user, session_start)
    must equal the batch gaps-and-islands oracle."""
    import time as _time

    from data_cube_spark.streaming import sessionize_batch, stateful_sessionize

    ev = tables["events"]
    src = str(tmp_path / "src_sess")
    os.makedirs(src, exist_ok=True)
    # three time-ordered chunks written sequentially (mtime order == file
    # discovery order for FileStreamSource)
    cuts = ev.select(epoch_seconds("ts").alias("t")).approxQuantile(
        "t", [0.33, 0.66], 0.001)
    tsd = epoch_seconds("ts")
    parts = [
        ev.where(tsd <= cuts[0]),
        ev.where((tsd > cuts[0]) & (tsd <= cuts[1])),
        ev.where(tsd > cuts[1]),
    ]
    for i, p in enumerate(parts):
        p.coalesce(1).write.mode("overwrite").parquet(f"{src}/chunk={i}")
        _time.sleep(1.1)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk=*")
    )
    out = stateful_sessionize(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_sessionize")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .start()
    )
    q.awaitTermination(240)
    rows = spark.sql("select * from t_sessionize").collect()
    final = {}
    for r in rows:
        k = (r["user_id"], r["session_start"])
        cur = final.get(k)
        if cur is None or r["n_events"] > cur:
            final[k] = r["n_events"]
    batch = {(r["user_id"], r["session_start"]): r["n_events"]
             for r in sessionize_batch(ev).collect()}
    assert final == batch


def test_streaming_maintained_cube_is_queryable(spark, tables, tmp_path):
    """End-to-end loop: stream maintains the materialized cube, the cube
    API queries it (collapse over pre-aggregated partials == batch truth)."""
    from data_cube_spark.selectors import Collapse
    from data_cube_spark.streaming import cube_from_materialized, streaming_cube

    ev = tables["events"]
    src = str(tmp_path / "src_mat")
    ev.write.mode("overwrite").parquet(src)
    target = str(tmp_path / "target_mat")
    q = streaming_cube(spark, src, ev.schema, str(tmp_path / "ckpt_mat"),
                       target, keys=["event_type"]).start()
    q.awaitTermination(120)

    dc = cube_from_materialized(spark, target, keys=["event_type"])
    got = {r["event_type"]: (r["n_events"], round(r["sum_value"], 6))
           for r in dc.q(window=Collapse()).fact.df.collect()}
    truth = {r["event_type"]: (r["n_events"], round(r["sum_value"], 6))
             for r in ev.groupBy("event_type").agg(
                 F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                 .alias("sum_value")).collect()}
    assert got == truth


def test_streaming_dedup_across_batches(spark, tables, tmp_path):
    """Redeliveries landing in a LATER micro-batch are still dropped:
    dedup state is keyed on event_id and carried across batches
    (maxFilesPerTrigger=1 forces each delivery into its own batch)."""
    from data_cube_spark.streaming.cube_stream import streaming_dedup

    ev = tables["events"].where(F.col("event_id") < 500)
    src = str(tmp_path / "src")
    ev.write.mode("overwrite").parquet(src)
    ev.write.mode("append").parquet(src)  # full redelivery, separate files
    q = streaming_dedup(
        spark, src, ev.schema, str(tmp_path / "ckpt"), str(tmp_path / "tgt"),
        id_cols=["event_id"], watermark="3650 days", max_files_per_trigger=1,
    ).start()
    q.awaitTermination(300)
    out = spark.read.parquet(str(tmp_path / "tgt"))
    assert out.count() == ev.count()
    assert out.select("event_id").distinct().count() == ev.count()


def test_streaming_dedup_preserves_row_content(spark, tables, tmp_path):
    from data_cube_spark.streaming.cube_stream import streaming_dedup

    ev = tables["events"].where(F.col("event_id") < 100)
    src = str(tmp_path / "src")
    ev.write.mode("overwrite").parquet(src)
    ev.write.mode("append").parquet(src)
    q = streaming_dedup(
        spark, src, ev.schema, str(tmp_path / "ckpt"), str(tmp_path / "tgt"),
        id_cols=["event_id"], watermark="3650 days",
    ).start()
    q.awaitTermination(300)
    out = spark.read.parquet(str(tmp_path / "tgt"))
    got = {r["event_id"]: (r["user_id"], r["event_type"], r["value"])
           for r in out.collect()}
    want = {r["event_id"]: (r["user_id"], r["event_type"], r["value"])
            for r in ev.collect()}
    assert got == want


def test_streaming_corpus_ingest_suppresses_near_dups(spark, tables, tmp_path):
    """Two micro-batches of documents stream in; docs that near-duplicate
    the standing corpus index are suppressed, everything else appends —
    and the result equals the batch incremental_dedup_keep on the same
    data."""
    from data_cube_spark.operators import dedup
    from data_cube_spark.streaming.cube_stream import streaming_corpus_ingest

    docs = tables["documents"].limit(40)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    # one guaranteed near-dup: a copy of a corpus doc with a new id
    clone = corpus.limit(1).select(
        (F.lit(10_000_000) + F.col("doc_id")).alias("doc_id"), "text")
    incoming = batch.unionByName(clone)

    src = str(tmp_path / "src")
    incoming.where(F.col("doc_id") < 100).coalesce(1).write.mode("overwrite").parquet(src)
    incoming.where(F.col("doc_id") >= 100).coalesce(1).write.mode("append").parquet(src)

    sigs = dedup.minhash_signatures(corpus).persist()
    q = streaming_corpus_ingest(
        spark, src, incoming.schema,
        str(tmp_path / "ckpt"), str(tmp_path / "out"),
        sigs, threshold=0.7, max_files_per_trigger=1,
    ).start()
    q.awaitTermination(120)

    got = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    expect = {r["doc_id"] for r in dedup.incremental_dedup_keep(
        incoming, corpus, threshold=0.7,
    ).collect()}
    # batch twin uses exact jaccard; LSH threshold 0.7 on the clone (j=1.0)
    # must agree on suppression, and no original batch doc may be lost
    assert (10_000_000 + corpus.limit(1).collect()[0]["doc_id"]) not in got
    batch_ids = {r["doc_id"] for r in batch.collect()}
    assert batch_ids - got == batch_ids - expect  # same suppressed originals


# -- restart / recovery (VERDICT r3 next-round #5) --------------------------


def _run_until_n_batches(query, n, timeout_s=120):
    """Let a running stream commit at least ``n`` micro-batches, then hard
    stop it (the kill half of kill-and-resume)."""
    import time

    deadline = time.time() + timeout_s
    while time.time() < deadline:
        done = [p for p in query.recentProgress if p is not None]
        if len(done) >= n:
            break
        time.sleep(0.3)
    query.stop()
    query.awaitTermination(60)


def test_streaming_cube_restart_exactly_once(spark, tables, tmp_path):
    """Kill-and-resume for the materialized-cube maintainer: the stream is
    hard-stopped after the first committed micro-batch, resumed from the
    checkpoint, fed MORE data, resumed again, and finally replayed with no
    new data. The target must equal the batch twin after each recovery —
    the read-merge-write upsert is idempotent under at-least-once
    foreachBatch replay (cube_stream.make_window_upsert)."""
    from data_cube_spark.streaming.cube_stream import (
        make_window_upsert, tumbling_agg,
    )

    ev = tables["events"].where(F.col("event_id") < 2000)
    half1 = ev.where(F.col("event_id") < 1000)
    half2 = ev.where(F.col("event_id") >= 1000)
    src, ckpt, target = (str(tmp_path / d) for d in ("src", "ckpt", "tgt"))
    # 4 files => 4 micro-batches at maxFilesPerTrigger=1
    for i in range(4):
        half1.where(F.col("event_id") % 4 == i).coalesce(1) \
            .write.mode("append").parquet(src)

    def start():
        stream = spark.readStream.schema(ev.schema) \
            .option("maxFilesPerTrigger", 1).format("parquet").load(src)
        # the slices interleave event TIME across micro-batches, so a real
        # watermark would drop them as late — this test pins the RESTART
        # contract, not the late-data policy (covered elsewhere)
        agg = tumbling_agg(stream, keys=["event_type"], watermark="3650 days")
        return (agg.writeStream.outputMode("update")
                .foreachBatch(make_window_upsert(spark, target, ["event_type"]))
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True).start())

    def materialized():
        out = spark.read.parquet(target)
        return {(r["window_start"], r["event_type"]):
                (r["n_events"], round(r["sum_value"], 6))
                for r in out.drop("window_key").collect()}

    def truth(df):
        return {(r["window_start"], r["event_type"]):
                (r["n_events"], round(r["sum_value"], 6))
                for r in tumbling_agg(df, keys=["event_type"]).collect()}

    # kill after >=1 committed batch, resume to completion
    _run_until_n_batches(start(), 1)
    q = start()
    q.awaitTermination(120)
    assert materialized() == truth(half1)

    # more data arrives; resume from the same checkpoint
    half2.coalesce(2).write.mode("append").parquet(src)
    q = start()
    q.awaitTermination(120)
    assert materialized() == truth(ev)

    # replay with nothing new: output unchanged (idempotent recovery)
    q = start()
    q.awaitTermination(120)
    assert materialized() == truth(ev)


def test_streaming_corpus_ingest_restart_exactly_once(spark, tables, tmp_path):
    """Kill-and-resume for the corpus ingester: hard stop after the first
    committed micro-batch, resume, extend the source, resume again, then a
    no-new-data replay. Epoch-keyed overwrite makes batch replays
    idempotent, so the survivor set must equal the batch
    incremental_dedup_keep twin at every recovery point and never contain
    duplicates."""
    from data_cube_spark.operators import dedup
    from data_cube_spark.streaming.cube_stream import streaming_corpus_ingest

    docs = tables["documents"].limit(60)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    incoming = docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    src, ckpt, target = (str(tmp_path / d) for d in ("src", "ckpt", "tgt"))
    for i in range(3):
        incoming.where(F.col("doc_id") % 3 == i).coalesce(1) \
            .write.mode("append").parquet(src)
    sigs = dedup.minhash_signatures(corpus).localCheckpoint()

    def start():
        return streaming_corpus_ingest(
            spark, src, incoming.schema, ckpt, target, sigs,
            threshold=0.7, max_files_per_trigger=1).start()

    def survivors():
        rows = spark.read.parquet(target).select("doc_id").collect()
        ids = [r["doc_id"] for r in rows]
        assert len(ids) == len(set(ids)), "duplicate survivors after replay"
        return set(ids)

    _run_until_n_batches(start(), 1)
    q = start()
    q.awaitTermination(120)
    expect = {r["doc_id"] for r in dedup.incremental_dedup_keep(
        incoming, corpus, threshold=0.7).collect()}
    lsh = {r["batch_id"] for r in dedup.incremental_minhash_pairs(
        incoming, sigs, threshold=0.7).collect()}
    got = survivors()
    # exact-jaccard twin and LSH agree on the test corpus (asserted in
    # the single-run test); here the contract is: resume never loses a
    # batch doc nor duplicates one
    assert got == {r["doc_id"] for r in incoming.collect()} - lsh == expect

    # late documents arrive; resume from checkpoint
    late = incoming.limit(5).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"), "text")
    late.coalesce(1).write.mode("append").parquet(src)
    q = start()
    q.awaitTermination(120)
    all_in = incoming.unionByName(late)
    lsh2 = {r["batch_id"] for r in dedup.incremental_minhash_pairs(
        all_in, sigs, threshold=0.7).collect()}
    assert survivors() == {r["doc_id"] for r in all_in.collect()} - lsh2

    # no-new-data replay: unchanged
    q = start()
    q.awaitTermination(120)
    assert survivors() == {r["doc_id"] for r in all_in.collect()} - lsh2


def _scd_changelog_df(spark):
    from datetime import datetime
    rows = []
    for k in range(40):
        rows.append((k, datetime(2020, 1, 1 + k % 20), "seg-a", k * 10))
        if k % 2 == 0:
            rows.append((k, datetime(2021, 3, 1 + k % 20), "seg-b", k * 10 + 1))
        if k % 5 == 0:
            rows.append((k, datetime(2022, 6, 1 + k % 20), "seg-c", k * 10 + 2))
    return spark.createDataFrame(
        rows, "k int, eff_ts timestamp, segment string, score int")


def test_streaming_scd2_dimension_equals_full_rebuild(spark, tmp_path):
    """Streaming SCD2 maintenance: change rows arriving across
    micro-batches must yield the SAME version table as one batch build
    from the full log, and only touched buckets are rewritten."""
    from data_cube_spark.operators.scd import scd2_from_changelog
    from data_cube_spark.streaming import streaming_scd2_dimension

    log = _scd_changelog_df(spark)
    src = str(tmp_path / "chg")
    # three arrival waves as separate files; maxFilesPerTrigger=1 on the
    # writer keeps them separate micro-batches
    log.where(F.col("eff_ts") < F.lit("2021-01-01")) \
       .coalesce(1).write.parquet(src + "/w1")
    log.where((F.col("eff_ts") >= F.lit("2021-01-01"))
              & (F.col("eff_ts") < F.lit("2022-01-01"))) \
       .coalesce(1).write.mode("append").parquet(src)
    # move the first wave into the same source dir
    import glob
    import shutil
    for f in glob.glob(src + "/w1/*.parquet"):
        shutil.move(f, src + "/" + f.split("/")[-1])
    shutil.rmtree(src + "/w1")
    log.where(F.col("eff_ts") >= F.lit("2022-01-01")) \
       .coalesce(1).write.mode("append").parquet(src)

    target = str(tmp_path / "dim")
    writer = streaming_scd2_dimension(
        spark, src, log.schema, str(tmp_path / "ck"), target,
        key="k", ts_col="eff_ts", n_buckets=8, max_files_per_trigger=1)
    q = writer.start()
    assert q.awaitTermination(120)

    got = spark.read.parquet(target).drop("dim_bucket")
    want = scd2_from_changelog(log, "k", "eff_ts")
    assert sorted(map(tuple, got.select(*want.columns).collect())) \
        == sorted(map(tuple, want.collect()))

    # replay idempotency: re-merging an already-applied batch converges
    from data_cube_spark.operators.scd import scd2_merge_changes
    last = log.where(F.col("eff_ts") >= F.lit("2022-01-01"))
    again = scd2_merge_changes(got, last, "k", "eff_ts")
    assert sorted(map(tuple, again.select(*want.columns).collect())) \
        == sorted(map(tuple, want.collect()))


def test_streaming_scd2_restart_resumes_from_checkpoint(spark, tmp_path):
    """Kill-and-resume: a second start() with the same checkpoint picks
    up only NEW change files and the final dimension still equals the
    batch build."""
    from data_cube_spark.operators.scd import scd2_from_changelog
    from data_cube_spark.streaming import streaming_scd2_dimension

    log = _scd_changelog_df(spark)
    early = log.where(F.col("eff_ts") < F.lit("2022-01-01"))
    late = log.where(F.col("eff_ts") >= F.lit("2022-01-01"))
    src = str(tmp_path / "chg")
    early.coalesce(1).write.parquet(src)
    target = str(tmp_path / "dim")
    ck = str(tmp_path / "ck")

    def run():
        w = streaming_scd2_dimension(
            spark, src, log.schema, ck, target,
            key="k", ts_col="eff_ts", n_buckets=8)
        q = w.start()
        assert q.awaitTermination(120)

    run()  # first run: early waves only
    late.coalesce(1).write.mode("append").parquet(src)
    run()  # restart from checkpoint: only the late file is new

    got = spark.read.parquet(target).drop("dim_bucket")
    want = scd2_from_changelog(log, "k", "eff_ts")
    assert sorted(map(tuple, got.select(*want.columns).collect())) \
        == sorted(map(tuple, want.collect()))


def test_stream_stream_attribution_join_equals_batch(spark, tables, tmp_path):
    """Stateful stream-stream interval join (purchases attributed to
    views within 30 min, per user) must emit exactly the batch twin's
    pairs; both sides watermarked so join state stays bounded."""
    from data_cube_spark.streaming.stream_join import interval_attribution_join

    ev = tables["events"]
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"))
    buys = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("buy_id"), "value")
    vdir, bdir = str(tmp_path / "views"), str(tmp_path / "buys")
    views.write.parquet(vdir)
    buys.write.parquet(bdir)

    vs = spark.readStream.schema(views.schema).parquet(vdir)
    bs = spark.readStream.schema(buys.schema).parquet(bdir)
    joined = interval_attribution_join(
        vs, bs, "user_id", "view_ts", "buy_ts", within="30 minutes")
    q = (joined.writeStream.format("memory").queryName("ssj_attr")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    assert q.awaitTermination(120)

    got = spark.table("ssj_attr").select(
        "user_id", "view_id", "buy_id", "value")
    want = interval_attribution_join(
        views, buys, "user_id", "view_ts", "buy_ts", within="30 minutes"
    ).select("user_id", "view_id", "buy_id", "value")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert want.count() > 0  # non-vacuous


def test_attribution_join_same_ts_name_both_sides(spark, tables):
    """ADVICE r4: both sides naming their timestamp column 'ts' (the
    natural event-table case) must yield a clash-prefixed r_ts, not two
    identically named columns that break every downstream select."""
    from data_cube_spark.streaming.stream_join import interval_attribution_join

    ev = tables["events"]
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id"))
    buys = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("buy_id"))
    out = interval_attribution_join(
        views, buys, "user_id", "ts", "ts", within="30 minutes")
    assert out.columns.count("ts") == 1
    assert "r_ts" in out.columns
    # downstream select on every column must not be ambiguous
    n = out.select("user_id", "ts", "r_ts", "view_id", "buy_id").count()
    assert n > 0
    for r in out.select("ts", "r_ts").limit(50).collect():
        assert r["r_ts"] >= r["ts"]


def test_streaming_scd2_failed_target_read_fails_batch(spark, tables, tmp_path):
    """ADVICE r4 (medium): a target directory that EXISTS but cannot be
    read must FAIL the micro-batch (so foreachBatch retries) instead of
    being treated as 'first batch' — which would silently replace the
    touched keys' full version history with batch-only history."""
    import os

    from data_cube_spark.streaming.cube_stream import streaming_scd2_dimension

    changes = (
        tables["events"].limit(40)
        .select(F.col("user_id").alias("k"), F.col("ts").alias("eff_ts"),
                F.col("event_type").alias("segment"))
    )
    src = str(tmp_path / "src")
    changes.coalesce(1).write.parquet(src)
    target = str(tmp_path / "target")
    # target exists and holds a data-looking file with garbage bytes:
    # parquet footer read fails -> the batch must propagate the error
    os.makedirs(target)
    with open(os.path.join(target, "part-00000.parquet"), "wb") as f:
        f.write(b"this is not a parquet file")

    q = streaming_scd2_dimension(
        spark, src, changes.schema, str(tmp_path / "ckpt"), target,
        key="k", ts_col="eff_ts").start()
    with pytest.raises(Exception) as ei:
        if q.awaitTermination(120):
            # stream "finished": only acceptable if it actually failed
            if q.exception() is not None:
                raise q.exception()
    assert "PARQUET" in str(ei.value).upper() or "not a parquet" in str(
        ei.value).lower() or "FAILED_READ_FILE" in str(ei.value)
    # and the corrupt target was NOT silently overwritten with
    # batch-only history
    assert open(os.path.join(target, "part-00000.parquet"), "rb").read() \
        == b"this is not a parquet file"


def test_streaming_cube_failed_target_read_fails_batch(spark, tables, tmp_path):
    """VERDICT r5 #2: the window-upsert twin of the SCD2 guarantee — a
    target that EXISTS but cannot be read must FAIL the micro-batch (the
    exact condition foreachBatch retries exist for) instead of being
    treated as 'first batch', which would dynamic-overwrite the touched
    windows with batch-only aggregates and silently drop previously
    merged keys."""
    import os

    from data_cube_spark.streaming import streaming_cube

    ev = tables["events"].limit(100)
    src = str(tmp_path / "src")
    ev.coalesce(1).write.parquet(src)
    target = str(tmp_path / "target")
    # target exists and holds a data-looking file with garbage bytes:
    # parquet footer read fails -> the batch must propagate the error
    os.makedirs(target)
    with open(os.path.join(target, "part-00000.parquet"), "wb") as f:
        f.write(b"this is not a parquet file")

    q = streaming_cube(
        spark, src, ev.schema, str(tmp_path / "ckpt"), target,
        keys=["event_type"]).start()
    with pytest.raises(Exception) as ei:
        if q.awaitTermination(120):
            if q.exception() is not None:
                raise q.exception()
    assert "PARQUET" in str(ei.value).upper() or "not a parquet" in str(
        ei.value).lower() or "FAILED_READ_FILE" in str(ei.value)
    # the corrupt target was NOT replaced by batch-only window state
    assert open(os.path.join(target, "part-00000.parquet"), "rb").read() \
        == b"this is not a parquet file"


def test_streaming_corpus_ingest_with_persisted_index(spark, tables, tmp_path):
    """The production index shape: streaming ingest suppressing against a
    write_minhash_index bucketed catalog index must keep exactly the same
    docs as the in-session signature frame path."""
    from data_cube_spark.operators import dedup
    from data_cube_spark.streaming.cube_stream import streaming_corpus_ingest

    docs = tables["documents"].limit(40)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    clone = corpus.limit(1).select(
        (F.lit(10_000_000) + F.col("doc_id")).alias("doc_id"), "text")
    incoming = batch.unionByName(clone)
    src = str(tmp_path / "src")
    incoming.coalesce(1).write.parquet(src)
    try:
        dedup.write_minhash_index(corpus, "t_stream_idx", n_buckets=4,
                                  path=str(tmp_path / "idx"))
        q = streaming_corpus_ingest(
            spark, src, incoming.schema,
            str(tmp_path / "ckpt"), str(tmp_path / "out"),
            index_table="t_stream_idx", threshold=0.7,
        ).start()
        assert q.awaitTermination(120)
        got = {r["doc_id"]
               for r in spark.read.parquet(str(tmp_path / "out")).collect()}
        sigs = dedup.minhash_signatures(corpus).localCheckpoint()
        q2 = streaming_corpus_ingest(
            spark, src, incoming.schema,
            str(tmp_path / "ckpt2"), str(tmp_path / "out2"),
            corpus_signatures=sigs, threshold=0.7,
        ).start()
        assert q2.awaitTermination(120)
        want = {r["doc_id"]
                for r in spark.read.parquet(str(tmp_path / "out2")).collect()}
        assert got == want
        assert (10_000_000 + corpus.limit(1).collect()[0]["doc_id"]) not in got

        with pytest.raises(ValueError, match="exactly one"):
            streaming_corpus_ingest(
                spark, src, incoming.schema, "x", "y",
                corpus_signatures=sigs, index_table="t_stream_idx")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_stream_idx_bands")
        spark.sql("DROP TABLE IF EXISTS t_stream_idx_sig")


def test_streaming_corpus_ingest_append_survivors_cross_batch(
        spark, tables, tmp_path):
    """append_survivors=True makes the persisted index SELF-MAINTAINING:
    a later micro-batch's clone of an EARLIER batch's survivor is
    suppressed (without the flag it sails through — cross-batch dups are
    otherwise only caught at the index refresh cadence), and the index
    tables grow by the survivors."""
    from data_cube_spark.operators import dedup
    from data_cube_spark.streaming.cube_stream import streaming_corpus_ingest

    import time as _time

    docs = tables["documents"].limit(40)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    b1 = docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text")

    # ground truth (batch operators): b1's survivors against the corpus
    sigs = dedup.minhash_signatures(corpus).localCheckpoint()
    dropped = {r["batch_id"]
               for r in dedup.incremental_minhash_pairs(
                   b1, sigs, threshold=0.7).collect()}
    surv = [r for r in b1.collect() if r["doc_id"] not in dropped]
    assert surv, "need at least one surviving b1 doc"

    # two micro-batches: b1, then a text-identical clone of a b1
    # SURVIVOR under a new doc_id (mtime-spaced so the file source
    # processes them in this order; maxFilesPerTrigger=1)
    src = str(tmp_path / "src")
    b1.coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.1)
    clone = spark.createDataFrame(
        [(9_000_001, surv[0]["text"])], "doc_id long, text string")
    clone.coalesce(1).write.mode("append").parquet(src)

    def run(tag, append):
        dedup.write_minhash_index(corpus, tag, n_buckets=4,
                                  path=str(tmp_path / f"idx_{tag}"))
        q = streaming_corpus_ingest(
            spark, src, b1.schema, str(tmp_path / f"ck_{tag}"),
            str(tmp_path / f"out_{tag}"), index_table=tag,
            threshold=0.7, max_files_per_trigger=1,
            append_survivors=append).start()
        assert q.awaitTermination(120)
        return {r["doc_id"] for r in
                spark.read.parquet(str(tmp_path / f"out_{tag}")).collect()}

    try:
        got = run("t_app_on", True)
        assert 9_000_001 not in got, "cross-batch clone must be suppressed"
        # the index grew by the survivors (b1 survivors appended; the
        # clone was suppressed so never appended)
        n_sig = spark.table("t_app_on_sig").count()
        assert n_sig == corpus.count() + len(got)

        got_off = run("t_app_off", False)
        assert 9_000_001 in got_off, (
            "without append_survivors the cross-batch clone survives")
        assert got_off - {9_000_001} == got

        with pytest.raises(ValueError, match="append_survivors requires"):
            streaming_corpus_ingest(
                spark, src, b1.schema, "x", "y",
                corpus_signatures=dedup.minhash_signatures(corpus),
                append_survivors=True)
    finally:
        for tag in ("t_app_on", "t_app_off"):
            spark.sql(f"DROP TABLE IF EXISTS {tag}_bands")
            spark.sql(f"DROP TABLE IF EXISTS {tag}_sig")


def test_streaming_ingest_stable_id_redelivery_suppressed(
        spark, tables, tmp_path):
    """ADVICE r6 (medium): with append_survivors, a re-delivered document
    whose STABLE id already exists in the standing corpus index (e.g. a
    re-crawl) must still be suppressed against the original corpus row —
    the replay-idempotence exclusion is scoped to the epoch's own
    previously written survivors, not the whole batch id set (which
    cannot tell a replayed self-append from a pre-existing corpus
    row)."""
    from data_cube_spark.operators import dedup
    from data_cube_spark.streaming.cube_stream import streaming_corpus_ingest

    docs = tables["documents"].limit(40)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    # the incoming batch re-delivers corpus docs under their ORIGINAL ids
    redelivery = corpus.limit(5).select("doc_id", "text")
    src = str(tmp_path / "src")
    redelivery.coalesce(1).write.mode("append").parquet(src)
    tag = "t_stable_id"
    try:
        dedup.write_minhash_index(corpus, tag, n_buckets=4,
                                  path=str(tmp_path / "idx_stable"))
        q = streaming_corpus_ingest(
            spark, src, redelivery.schema, str(tmp_path / "ck"),
            str(tmp_path / "out"), index_table=tag, threshold=0.7,
            append_survivors=True).start()
        assert q.awaitTermination(120)
        import glob
        files = glob.glob(str(tmp_path / "out" / "**" / "*.parquet"),
                          recursive=True)
        got = ({r["doc_id"]
                for r in spark.read.parquet(str(tmp_path / "out")).collect()}
               if files else set())
        assert got == set(), (
            f"stable-id re-deliveries must be suppressed, got {got}")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tag}_bands")
        spark.sql(f"DROP TABLE IF EXISTS {tag}_sig")


def test_streaming_corpus_ingest_append_survivors_restart(
        spark, tables, tmp_path):
    """Kill-and-resume for the self-maintaining index: hard stop after
    the first committed micro-batch (whose survivors are already in the
    index), resume — the replayed/remaining batches must produce no
    duplicate survivors and the same survivor set as an uninterrupted
    run (the corpus_id-in-batch exclusion makes the replay compute the
    identical survivor set even though its own rows are indexed)."""
    from data_cube_spark.operators import dedup
    from data_cube_spark.streaming.cube_stream import streaming_corpus_ingest

    docs = tables["documents"].limit(60)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    incoming = docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    src = str(tmp_path / "src")
    for i in range(3):
        incoming.where(F.col("doc_id") % 3 == i).coalesce(1) \
            .write.mode("append").parquet(src)
    try:
        for tag, interrupt in (("t_rst_a", True), ("t_rst_b", False)):
            dedup.write_minhash_index(corpus, tag, n_buckets=4,
                                      path=str(tmp_path / f"idx_{tag}"))

            def start():
                return streaming_corpus_ingest(
                    spark, src, incoming.schema,
                    str(tmp_path / f"ck_{tag}"),
                    str(tmp_path / f"out_{tag}"), index_table=tag,
                    threshold=0.7, max_files_per_trigger=1,
                    append_survivors=True).start()

            if interrupt:
                _run_until_n_batches(start(), 1)
            q = start()
            q.awaitTermination(120)
        a = [r["doc_id"] for r in
             spark.read.parquet(str(tmp_path / "out_t_rst_a")).collect()]
        b = [r["doc_id"] for r in
             spark.read.parquet(str(tmp_path / "out_t_rst_b")).collect()]
        assert len(a) == len(set(a)), "duplicate survivors after replay"
        assert sorted(a) == sorted(b), "interrupted run diverged"
        # compaction cleans any replay-duplicated index rows in place
        dedup.compact_minhash_index(spark, "t_rst_a")
        sig = spark.table("t_rst_a_sig")
        assert sig.count() == sig.dropDuplicates().count()
    finally:
        for tag in ("t_rst_a", "t_rst_b"):
            spark.sql(f"DROP TABLE IF EXISTS {tag}_bands")
            spark.sql(f"DROP TABLE IF EXISTS {tag}_sig")


def test_streaming_corpus_ingest_indexed_restart_exactly_once(
        spark, tables, tmp_path):
    """Kill-and-resume for the PERSISTED-INDEX ingest path: hard stop
    after the first committed micro-batch, resume, and the survivor set
    equals the batch twin with no duplicates — the epoch-keyed overwrite
    idempotence is index-source-independent."""
    from data_cube_spark.operators import dedup
    from data_cube_spark.streaming.cube_stream import streaming_corpus_ingest

    docs = tables["documents"].limit(60)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    incoming = docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    src, ckpt, target = (str(tmp_path / d) for d in ("src", "ckpt", "tgt"))
    for i in range(3):
        incoming.where(F.col("doc_id") % 3 == i).coalesce(1) \
            .write.mode("append").parquet(src)
    try:
        dedup.write_minhash_index(corpus, "t_restart_idx", n_buckets=4,
                                  path=str(tmp_path / "idx"))

        def start():
            return streaming_corpus_ingest(
                spark, src, incoming.schema, ckpt, target,
                index_table="t_restart_idx",
                threshold=0.7, max_files_per_trigger=1).start()

        _run_until_n_batches(start(), 1)
        q = start()
        q.awaitTermination(120)
        rows = spark.read.parquet(target).select("doc_id").collect()
        ids = [r["doc_id"] for r in rows]
        assert len(ids) == len(set(ids)), "duplicate survivors after replay"
        dropped = {r["batch_id"] for r in dedup.incremental_minhash_pairs_indexed(
            incoming, "t_restart_idx", threshold=0.7).collect()}
        assert set(ids) == {r["doc_id"] for r in incoming.collect()} - dropped
    finally:
        spark.sql("DROP TABLE IF EXISTS t_restart_idx_bands")
        spark.sql("DROP TABLE IF EXISTS t_restart_idx_sig")


def test_streaming_embedding_ingest_self_maintaining(spark, tables, tmp_path):
    """The SEMANTIC streaming ingest (embedding twin of
    streaming_corpus_ingest): micro-batches of vectors suppress against
    the persisted embedding index; the survivor set equals the batch
    twin's; with append_survivors a later batch's exact clone of an
    EARLIER batch's survivor is suppressed (without the flag it sails
    through, since the clone's corpus cosines are the survivor's — all
    below threshold by definition of survivor); the index grows by the
    survivors."""
    import time as _time

    from data_cube_spark.operators import similarity
    from data_cube_spark.streaming.cube_stream import (
        streaming_embedding_ingest,
    )

    emb = tables["embeddings"]
    corpus = emb.where(F.col("vec_id") % 2 == 0)
    b1 = emb.where(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")

    # two micro-batches: b1, then an exact clone of a b1 SURVIVOR under a
    # new vec_id (mtime-spaced; maxFilesPerTrigger=1 keeps the order)
    src = str(tmp_path / "src")
    b1.coalesce(1).write.mode("append").parquet(src)

    # ground truth via the (numpy-verified) batch operator on a throwaway
    # index: b1's survivors against the standing corpus
    similarity.write_embedding_index(corpus, "t_emb_truth", n_buckets=4,
                                     path=str(tmp_path / "idx_truth"))
    try:
        dropped = {r["batch_id"]
                   for r in similarity.incremental_embedding_pairs_indexed(
                       b1, "t_emb_truth", threshold=0.85).collect()}
    finally:
        for s in ("buckets", "vec"):
            spark.sql(f"DROP TABLE IF EXISTS t_emb_truth_{s}")
    surv = [r for r in b1.collect() if r["vec_id"] not in dropped]
    assert surv, "need at least one surviving b1 vector"

    _time.sleep(1.1)
    clone = spark.createDataFrame(
        [(9_000_001, surv[0]["embedding"])], b1.schema)
    clone.coalesce(1).write.mode("append").parquet(src)

    def run(tag, append):
        similarity.write_embedding_index(corpus, tag, n_buckets=4,
                                         path=str(tmp_path / f"idx_{tag}"))
        q = streaming_embedding_ingest(
            spark, src, b1.schema, str(tmp_path / f"ck_{tag}"),
            str(tmp_path / f"out_{tag}"), index_table=tag,
            threshold=0.85, max_files_per_trigger=1,
            append_survivors=append).start()
        assert q.awaitTermination(120)
        return {r["vec_id"] for r in
                spark.read.parquet(str(tmp_path / f"out_{tag}")).collect()}

    try:
        got = run("t_semb_on", True)
        assert 9_000_001 not in got, "cross-batch clone must be suppressed"
        assert got == {r["vec_id"] for r in surv}
        # the index grew by exactly the survivors (the clone never appended)
        n_vec = spark.table("t_semb_on_vec").count()
        assert n_vec == corpus.count() + len(got)

        got_off = run("t_semb_off", False)
        assert 9_000_001 in got_off, (
            "without append_survivors the cross-batch clone survives")
        assert got_off - {9_000_001} == got
    finally:
        for tag in ("t_semb_on", "t_semb_off"):
            for s in ("buckets", "vec"):
                spark.sql(f"DROP TABLE IF EXISTS {tag}_{s}")


def test_streaming_embedding_ingest_restart_exactly_once(
        spark, tables, tmp_path):
    """Kill-and-resume for the self-maintaining SEMANTIC ingest: hard
    stop after the first committed micro-batch (whose survivors are
    already in the index), resume — same survivor set as an
    uninterrupted run, no duplicates, and compaction cleans the
    replay-duplicated index rows in place."""
    from data_cube_spark.operators import similarity
    from data_cube_spark.streaming.cube_stream import (
        streaming_embedding_ingest,
    )

    emb = tables["embeddings"]
    corpus = emb.where(F.col("vec_id") % 2 == 0)
    incoming = emb.where(F.col("vec_id") % 2 == 1).select(
        "vec_id", "embedding")
    src = str(tmp_path / "src")
    for i in range(3):
        incoming.where(F.col("vec_id") % 3 == i).coalesce(1) \
            .write.mode("append").parquet(src)
    try:
        for tag, interrupt in (("t_erst_a", True), ("t_erst_b", False)):
            similarity.write_embedding_index(
                corpus, tag, n_buckets=4, path=str(tmp_path / f"idx_{tag}"))

            def start():
                return streaming_embedding_ingest(
                    spark, src, incoming.schema,
                    str(tmp_path / f"ck_{tag}"),
                    str(tmp_path / f"out_{tag}"), index_table=tag,
                    threshold=0.85, max_files_per_trigger=1,
                    append_survivors=True).start()

            if interrupt:
                _run_until_n_batches(start(), 1)
            q = start()
            q.awaitTermination(120)
        a = [r["vec_id"] for r in
             spark.read.parquet(str(tmp_path / "out_t_erst_a")).collect()]
        b = [r["vec_id"] for r in
             spark.read.parquet(str(tmp_path / "out_t_erst_b")).collect()]
        assert len(a) == len(set(a)), "duplicate survivors after replay"
        assert sorted(a) == sorted(b), "interrupted run diverged"
        assert similarity.compact_embedding_index(spark, "t_erst_a") >= 0
        vec = spark.table("t_erst_a_vec")
        assert vec.count() == vec.dropDuplicates(["corpus_id"]).count()
    finally:
        for tag in ("t_erst_a", "t_erst_b"):
            for s in ("buckets", "vec"):
                spark.sql(f"DROP TABLE IF EXISTS {tag}_{s}")


def test_streaming_dual_index_ingest_restart_exactly_once(
        spark, tables, tmp_path):
    """VERDICT r8 #5 kill-and-resume: the single-epoch DUAL-index ingest
    is hard-stopped after the first committed micro-batch (whose
    survivors are already folded into BOTH indexes), resumed — the
    survivor set must equal an uninterrupted run's with no duplicates,
    and after the nightly compact sweep BOTH indexes must be row-equal
    to indexes rebuilt from corpus + survivors (exactly-once index
    maintenance up to compaction)."""
    from data_cube_spark.operators import dedup
    from data_cube_spark.operators.index_maintenance import compact_all
    from data_cube_spark.streaming.cube_stream import (
        streaming_dual_index_ingest,
    )

    docs = tables["documents"].limit(60)
    corpus = docs.where(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    odd = docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    # clones of corpus docs exercise the exact stage; clones of other
    # odd docs exercise cross-batch near-dup suppression on resume
    incoming = odd.unionByName(
        corpus.limit(5).select((F.col("doc_id") + 900_000).alias("doc_id"),
                               "text"))
    src = str(tmp_path / "src")
    import time as _time

    for i in range(3):
        incoming.where(F.col("doc_id") % 3 == i).coalesce(1) \
            .write.mode("append").parquet(src)
        _time.sleep(1.05)
    drops = []
    try:
        results = {}
        for tag, interrupt in (("t_dual_a", True), ("t_dual_b", False)):
            drops += [f"{tag}_f_fp", f"{tag}_m_sig", f"{tag}_m_bands",
                      f"{tag}_rf_fp", f"{tag}_rm_sig", f"{tag}_rm_bands"]
            dedup.write_fingerprint_index(
                corpus, f"{tag}_f", n_buckets=4,
                path=str(tmp_path / f"fp_{tag}"))
            dedup.write_minhash_index(
                corpus, f"{tag}_m", n_buckets=4,
                path=str(tmp_path / f"mh_{tag}"))

            def start():
                return streaming_dual_index_ingest(
                    spark, src, incoming.schema,
                    str(tmp_path / f"ck_{tag}"),
                    str(tmp_path / f"out_{tag}"),
                    f"{tag}_f", f"{tag}_m",
                    threshold=0.5, max_files_per_trigger=1).start()

            if interrupt:
                _run_until_n_batches(start(), 1)
            q = start()
            q.awaitTermination(180)
            results[tag] = [
                r["doc_id"] for r in
                spark.read.parquet(str(tmp_path / f"out_{tag}")).collect()]
        a, b = results["t_dual_a"], results["t_dual_b"]
        assert len(a) == len(set(a)), "duplicate survivors after replay"
        assert sorted(a) == sorted(b), "interrupted run diverged"
        # corpus-clone redelivery was suppressed by the exact stage
        assert all(i < 900_000 for i in a)

        # after the nightly sweep, both indexes == rebuilt-from-scratch
        swept = compact_all(spark, prefix="t_dual_a_")
        assert set(swept["removed"]) == {"t_dual_a_f", "t_dual_a_m"}
        survivors = spark.read.parquet(
            str(tmp_path / "out_t_dual_a")).select("doc_id", "text")
        grown = corpus.unionByName(survivors)
        dedup.write_fingerprint_index(grown, "t_dual_a_rf", n_buckets=4,
                                      path=str(tmp_path / "rf"))
        dedup.write_minhash_index(grown, "t_dual_a_rm", n_buckets=4,
                                  path=str(tmp_path / "rm"))
        for got, want in (("t_dual_a_f_fp", "t_dual_a_rf_fp"),
                          ("t_dual_a_m_sig", "t_dual_a_rm_sig"),
                          ("t_dual_a_m_bands", "t_dual_a_rm_bands")):
            ga, wa = spark.table(got), spark.table(want)
            assert ga.exceptAll(wa).count() == 0, got
            assert wa.exceptAll(ga).count() == 0, got
    finally:
        for t in drops:
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_streaming_prefix_ingest_self_maintaining_restart(
        spark, tables, tmp_path):
    """The prefix-index streaming twin (composes r9's O(batch)
    append_prefix_index): micro-batches suppress on EXACT Jaccard
    against the persisted postings, survivors fold in under the frozen
    order, so a later batch's clone of an earlier survivor is
    suppressed. Kill-and-resume: interrupted == uninterrupted with no
    duplicate survivors, and after the nightly sweep the indexed read
    equals a read over an index REBUILT from corpus + survivors."""
    import time as _time

    from data_cube_spark.operators import dedup
    from data_cube_spark.operators.index_maintenance import compact_all
    from data_cube_spark.streaming.cube_stream import streaming_prefix_ingest

    docs = tables["documents"].limit(60)
    corpus = docs.where(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    odd = docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    half = odd.approxQuantile("doc_id", [0.5], 0.01)[0]
    w1 = odd.where(F.col("doc_id") <= half)
    # wave 2 includes exact clones of wave-1 docs under fresh ids: any
    # that SURVIVE wave 1 must suppress their clones cross-batch
    w2 = (odd.where(F.col("doc_id") > half)
          .unionByName(w1.limit(5).select(
              (F.col("doc_id") + 700_000).alias("doc_id"), "text")))
    src = str(tmp_path / "src")
    w1.coalesce(1).write.mode("overwrite").parquet(src)
    _time.sleep(1.05)
    w2.coalesce(1).write.mode("append").parquet(src)
    drops = []
    try:
        results = {}
        for tag, interrupt in (("t_spfx_a", True), ("t_spfx_b", False)):
            drops += [f"{tag}{s}" for s in
                      ("_prefix", "_df", "_sets",
                       "_rb_prefix", "_rb_df", "_rb_sets")]
            dedup.write_prefix_index(corpus, tag, n_buckets=4,
                                     threshold=0.5,
                                     path=str(tmp_path / f"ix_{tag}"))

            def start():
                return streaming_prefix_ingest(
                    spark, src, w1.schema, str(tmp_path / f"ck_{tag}"),
                    str(tmp_path / f"out_{tag}"), tag,
                    max_files_per_trigger=1).start()

            if interrupt:
                _run_until_n_batches(start(), 1)
            q = start()
            q.awaitTermination(180)
            results[tag] = [
                r["doc_id"] for r in
                spark.read.parquet(str(tmp_path / f"out_{tag}")).collect()]
        a, b = results["t_spfx_a"], results["t_spfx_b"]
        assert len(a) == len(set(a)), "duplicate survivors after replay"
        assert sorted(a) == sorted(b), "interrupted run diverged"
        # cross-batch: clones of wave-1 SURVIVORS died (jaccard 1.0)
        w1_survivors = {i for i in a if i <= half}
        cloned = {r["doc_id"] for r in w1.limit(5).collect()}
        assert all(i + 700_000 not in a
                   for i in cloned & w1_survivors)
        # sweep compacts replay-duplicated rows, then the read equals a
        # full rebuild over corpus + survivors (exactness preserved)
        sweep = compact_all(spark, prefix="t_spfx_a")
        assert "t_spfx_a" in sweep["removed"]
        survivors = spark.read.parquet(
            str(tmp_path / "out_t_spfx_a")).select("doc_id", "text")
        dedup.write_prefix_index(corpus.unionByName(survivors),
                                 "t_spfx_a_rb", n_buckets=4, threshold=0.5,
                                 path=str(tmp_path / "rb"))
        probe = odd.limit(20)
        got = sorted(map(tuple, dedup.incremental_prefix_pairs_indexed(
            probe, "t_spfx_a", threshold=0.5).collect()))
        want = sorted(map(tuple, dedup.incremental_prefix_pairs_indexed(
            probe, "t_spfx_a_rb", threshold=0.5).collect()))
        assert got == want
        dedup.check_prefix_consistency(spark, "t_spfx_a")
    finally:
        for t in drops:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
